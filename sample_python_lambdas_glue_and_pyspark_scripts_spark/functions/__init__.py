"""Scalar column functions (SURVEY.md §2.7, X1-X14).

Every row-at-a-time Python lambda in the reference is re-expressed as a
native Spark column function so it stays inside whole-stage codegen
(reference anti-pattern: pandas ``.apply`` at
/root/reference/src/pa/pa_etl_script.py:253-257).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_timestamp_lenient(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """X5/F7: parse a timestamp string; NULL (not error) on failure, and
    trailing fractional seconds are ignored.

    The reference runs Spark 2.4, whose legacy parser ignores unparsed
    trailing text ('2020-08-06 00:00:00.000000' parses with format
    'yyyy-MM-dd HH:mm:ss') and returns NULL on bad input — the NULL is the
    validation signal (validator.py:82-90). Spark 4's ANSI mode errors on
    both, so we strip the fraction and use try_to_timestamp.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = F.substring_index(c, ".", 1) if "S" not in fmt else c
    return F.try_to_timestamp(base, F.lit(fmt))


def nanos_to_timestamp(col: Column | str) -> Column:
    """events.ts arrives as nanos-since-epoch long (session.py nanosAsLong);
    convert to a microsecond timestamp for output/windowing.

    Exact integer arithmetic: ``c / 1000`` in double would lose precision
    for any epoch-nanos beyond 2^53 (~Apr 1970) — off-by-1µs at window/
    session-gap boundaries. Decimal division + floor is exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    micros = F.floor(c.cast("decimal(25,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def event_time(df: DataFrame, col: str = "ts") -> Column:
    """Type-adaptive event-time column — works on EVERY physical encoding
    the synthetic ``events.ts`` has shipped as.

    The testdata generator has emitted ``ts`` both as parquet
    TIMESTAMP(NANOS) (no Spark type; read as epoch-nanos BIGINT under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read natively as TIMESTAMP_NTZ). Hard-coding
    either assumption breaks on the other generation, so branch on the
    dtype actually read:

    - ``bigint``            → exact decimal nanos→micros conversion
      (:func:`nanos_to_timestamp`);
    - ``timestamp_ntz``     → cast to TIMESTAMP. The engine pins the
      session timezone to UTC (session.ensure_runtime_confs), so the cast
      is value-preserving and downstream code (``unix_micros`` in the
      range join, window functions, ``date_format``) sees the exact same
      instants the nanos path produced;
    - ``timestamp``         → pass-through.
    """
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"column {col!r} not found in {df.columns}")
    if dt == "bigint":
        return nanos_to_timestamp(col)
    if dt.startswith("timestamp"):
        return F.col(col).cast("timestamp")
    raise TypeError(f"unsupported event-time dtype {dt!r} for column {col!r}")


def split_part(col: Column | str, sep: str, index: int) -> Column:
    """X6: ``"019-5".split('-')[i]`` → vectorized.

    Reference: pa_etl_script.py:256-257 (PRICE_ZONE_ID → opco_id / price_zone_id).
    """
    return F.split(F.col(col) if isinstance(col, str) else col, sep).getItem(index)


def date_part_to_date(col: Column | str) -> Column:
    """X7: parse the date part of 'yyyy-MM-dd[ HH:mm:ss]' strings.

    Reference: pa_etl_script.py:253-254 (strptime of ``x.split()[0]``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(F.substring_index(c, " ", 1), F.lit("yyyy-MM-dd")).cast(
        "date"
    )


def datetime_to_epoch(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """X8: 'yyyy-MM-dd HH:mm:ss' string → epoch seconds (long).

    Reference: pa_etl_script.py:255 (strptime(...).timestamp()).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(parse_timestamp_lenient(c, fmt))


def partition_key_from_path(path_col: Column | str, key: str = "opco_id") -> Column:
    """X9: extract a hive partition key from a file path.

    Reference: FetchFileListLambda/index.py:100-102 (regex on S3 keys).
    Spark-side this is usually free via partition discovery; this column
    form exists for raw-path inputs (use with ``F.input_file_name()``).
    """
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.regexp_extract(c, rf"{key}=(\d+)", 1)


def classify_file_type(
    name_col: Column | str,
    partial_prefixes: tuple[str, ...] = ("ctt", "itt"),
    full_prefixes: tuple[str, ...] = ("wtp",),
) -> Column:
    """X10: case-insensitive filename-prefix routing → 'partial'/'full'/'unknown'.

    Reference: src/price_zone/s3_trigger_lambda.py:32-42, pinned by
    test/price_zone/test_etl_trigger_lambda.py:7-37. 'unknown' falls back
    to the size heuristic in the reference (s3_trigger_lambda.py:79-90).
    """
    c = F.lower(F.col(name_col) if isinstance(name_col, str) else name_col)
    expr = F.lit("unknown")
    for p in full_prefixes:
        expr = F.when(c.startswith(p.lower()), F.lit("full")).otherwise(expr)
    for p in partial_prefixes:
        expr = F.when(c.startswith(p.lower()), F.lit("partial")).otherwise(expr)
    return expr


def format_timestamp(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """X11: timestamp → formatted string (reference: load_job.py:216)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def str_to_bool(col: Column | str) -> Column:
    """Boolean-as-string decode ('true'/'1'/'yes' → true).

    Reference: load_job.py:277-282; AnalyzeEtlWaitStatusLambda/index.py:67-73.
    """
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return c.isin("true", "1", "yes", "y", "t")
