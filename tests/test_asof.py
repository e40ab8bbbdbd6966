"""As-of join operator tests."""

import datetime as dt

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0, 1),
            ("A", _ts("2024-01-01 10:05:00"), 101.0, 2),
            ("A", _ts("2024-01-01 10:10:00"), 102.0, 3),
            ("B", _ts("2024-01-01 10:02:00"), 50.0, 4),
        ],
        "sym string, qts timestamp, price double, qid int",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:03:00"), 1),  # → quote 10:00 (100.0)
            ("A", _ts("2024-01-01 10:05:00"), 2),  # → quote 10:05 (<= ties: 101.0)
            ("A", _ts("2024-01-01 09:59:00"), 3),  # → no quote yet (NULL)
            ("B", _ts("2024-01-01 11:00:00"), 4),  # → 50.0
        ],
        "sym string, tts timestamp, trade_id int",
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        payload_cols=["price", "qid"], tiebreak="qid",
    )
    got = {r["trade_id"]: (r["price"], r["qid"]) for r in out.collect()}
    assert got[1] == (100.0, 1)
    assert got[2] == (101.0, 2)   # equal timestamps: right row wins (<=)
    assert got[3] == (None, None)
    assert got[4] == (50.0, 4)
    assert out.count() == trades.count()  # left-preserving


def test_asof_join_tiebreak_among_right_rows(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1.0, 1),
            ("A", _ts("2024-01-01 10:00:00"), 2.0, 2),  # same ts, higher id wins
        ],
        "sym string, qts timestamp, price double, qid int",
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:01:00"), 1)],
        "sym string, tts timestamp, trade_id int",
    )
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["price", "qid"], tiebreak="qid")
    r = out.first()
    assert (r["price"], r["qid"]) == (2.0, 2)


def test_asof_join_no_blowup_plan(spark):
    """The plan must be union+window — one shuffle — not a theta join."""
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 1.0, 1)] * 5,
        "sym string, qts timestamp, price double, qid int",
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:01:00"), 1)],
        "sym string, tts timestamp, trade_id int",
    )
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["price"], tiebreak="qid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all: union + window
    assert "Window" in plan
