"""Extended TPC-H-shaped analytical suite (adapted to the testdata schema).

The synthetic tables (TESTDATA.md) have no ``partsupp`` and omit a few
TPC-H columns (commit/receipt dates, ship modes, comments, phones), so
these queries keep each canonical query's *operator shape* — the part the
engine must prove — while substituting available columns:

- q2   correlated min-over-group subquery (min-cost supplier per part)
- q4   EXISTS semi-join with a non-equi condition (late shipments)
- q7   two-sided nation volume (multi-dim join + year rollup)
- q8   market-share ratio (conditional aggregate / aggregate)
- q9   product-profit rollup (LIKE filter + 4-way join)
- q11  global-scalar HAVING (group value > fraction of grand total)
- q12  CASE-bucketed counts per group
- q13  count-of-counts distribution (left join + double aggregation)
- q14  promo revenue ratio over a date window
- q15  argmax vs a windowed aggregate (top supplier by revenue)
- q16  distinct-count with NOT-IN supplier exclusion
- q17  correlated per-group average threshold (small-quantity revenue)
- q19  disjunction of conjunctive join predicates
- q20  nested semi-join chain (suppliers of heavily-shipped small parts)
- q21  EXISTS + NOT-EXISTS self-joins (only-failing-supplier count)
- q22  global-average filter + anti-join (idle rich customers)

Scale notes: dimension sides (part 2k/supplier 100/nation/region rows at
sf1-ish ratios) are broadcast; fact-fact joins shuffle on their keys and
pre-aggregate before joining where the shape allows (q13, q15, q17, q20).
Scalar aggregates reach the plan as 1-row broadcast cross-joins, never
driver-side ``collect``. Reference has no joins at all (SURVEY §2.5) —
this suite is the beyond-reference analytical surface.

Cross-engine determinism: every ranking/threshold cut happens on values
ROUNDED identically on both sides (see CLAUDE.md parity kit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (correlated scalar subquery shape).

    unit cost proxy = min(l_extendedprice / l_quantity) per (part, supp)
    in integer CENTS; keep (part, supp) pairs hitting the per-part
    minimum. The correlated ``cost = (SELECT MIN(cost) ...)`` becomes a
    window-min — one shuffle, no subquery re-scan.

    Why cents: ROUND(x, 2) of a double is engine-dependent at half-cent
    boundaries (Spark rounds the shortest decimal representation HALF_UP,
    DuckDB rounds the binary value — found as real mismatches at sf0.1),
    while ROUND(x*100) to the nearest INTEGER of the same binary double
    agrees everywhere (.5 is binary-representable; both round it away
    from zero).
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100.0).cast(
                "bigint"
            )
        ).alias("cost_cents")
    )
    # prune to surviving parts BEFORE the window (partition pruning analogue)
    ps = ps.join(broadcast(p.select("p_partkey")), ps.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("min_cost", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("min_cost")
    )
    return (
        best.join(broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "cost_cents",
        )
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking: EXISTS semi-join with non-equi condition
    (a lineitem shipped >90 days after the order date)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations, by direction and year."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share: NATION_5-supplied fraction of ASIA's ECONOMY revenue
    per order year (conditional-aggregate ratio)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    joined = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n_c), c.c_nationkey == F.col("c_nk"))
        .join(broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n_s), s.s_nationkey == F.col("s_nk"))
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", _rev()).otherwise(F.lit(0.0)))
            / F.sum(_rev()),
            6,
        ).alias("mkt_share")
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product profit by supplier nation and order year ('%red%' parts)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    joined = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.round(F.sum(_rev()), 2).alias("profit"))


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape: per-part inventory value from NATION_3's
    suppliers, kept where value > 0.001 x grand total. The global scalar
    enters the plan as a 1-row broadcast cross-join (never collect())."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_li = li.join(
        broadcast(s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
    )
    per_part = nat_li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("value")
    )
    total = per_part.agg(
        F.round(F.sum("value") * 0.001, 2).alias("threshold")
    )
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-bucketed counts per return flag (CASE aggregation)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (left join + double aggregation).
    Orders pre-aggregate to (custkey, n) BEFORE joining customers: the
    second aggregation then shuffles only 1 row per customer."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("c_count")
    )
    counts = c.join(per_cust, "c_custkey", "left").select(
        F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count")
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-revenue percentage over one ship month."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                6,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue — argmax against a windowed
    max on ROUNDED revenue (deterministic cross-engine cut)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(broadcast(s), "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier count per (brand, type, size) with NOT-IN exclusion of
    negative-balance suppliers (complaints stand-in)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    kept = li.join(
        broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti"
    ).join(broadcast(p), li.l_partkey == p.p_partkey)
    return kept.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue: rows under 20% of their part's average
    quantity (correlated-average threshold, rounded 6dp on both engines
    so the cut is identical). Threshold joins back pre-aggregated."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_p = li.join(broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    thr = li_p.groupBy("l_partkey").agg(
        F.round(F.avg("l_quantity") * 0.2, 6).alias("qty_thr")
    ).withColumnRenamed("l_partkey", "t_partkey")
    small = li_p.join(
        broadcast(thr), li_p.l_partkey == F.col("t_partkey")
    ).filter(F.col("l_quantity") < F.col("qty_thr"))
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive conjunction predicates across the li-part join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in NATION_4 who shipped >50 units of any 'small%' part
    (nested semi-join chain, pre-aggregated inner)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    shipped = (
        li.join(broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nat_s = s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
    # the aggregated supplier set is bounded by |supplier| — broadcast it
    # (statically Catalyst can't size an aggregate and would sort-merge)
    return nat_s.join(
        broadcast(shipped), nat_s.s_suppkey == shipped.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only-returning-supplier count (EXISTS + NOT EXISTS self-joins):
    per supplier, failed orders where it returned items, another supplier
    participated, and no other supplier returned. Top-20 by count."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = _t(spark, sf_dir, "supplier")
    # EXISTS/NOT-EXISTS via one aggregation of lineitem at (order,
    # supplier) grain instead of two non-equi self-joins: lineitem is
    # scanned and shuffled ONCE; both the per-order supplier stats and
    # the candidate (returning) pairs derive from the pre-aggregated
    # relation, whose shared exchange Spark reuses (ReusedExchange).
    # EXISTS another supplier ⇔ n_supps >= 2; NOT EXISTS another
    # RETURNING supplier ⇔ n_ret_supps == 1 (the candidate's supplier
    # returned, so the single returning supplier must be it). Catalyst
    # cannot derive this rewrite from the subquery form — it requires
    # reasoning over both predicates jointly.
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "__has_ret"
        )
    )
    stats = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supps"),
        F.sum("__has_ret").alias("__n_ret_supps"),
    )
    l1 = (
        per_os.filter(F.col("__has_ret") == 1)
        .join(o, per_os.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey")
    )
    only_returner = (
        l1.join(stats, "l_orderkey")
        .filter((F.col("__n_supps") >= 2) & (F.col("__n_ret_supps") == 1))
    )
    counted = (
        only_returner.join(broadcast(s), only_returner.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return counted.orderBy(F.col("numwait").desc(), "s_name").limit(20)


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle rich customers: balance above the global positive average
    (rounded 6dp both engines) and no OPEN orders; rollup per nation.
    (The synthetic data gives every customer some order, so the canonical
    no-orders-at-all form returns 0 rows — restricting the NOT EXISTS to
    status 'O' keeps the anti-join shape and a non-vacuous result.)"""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    rich = c.crossJoin(broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, "c_custkey", "left_anti")
    return idle.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
}


ORACLES = {
    "tpch_q2": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   MIN(CAST(ROUND(l_extendedprice / l_quantity * 100.0) AS BIGINT))
                       AS cost_cents
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_size BETWEEN 10 AND 20
                                  AND p_type = 'STANDARD')
            GROUP BY 1, 2)
        SELECT ps.l_partkey AS p_partkey, s.s_name, ps.cost_cents
        FROM ps
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        WHERE ps.cost_cents = (SELECT MIN(ps2.cost_cents) FROM ps ps2
                               WHERE ps2.l_partkey = ps.l_partkey)
    """,
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
    "tpch_q7": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "tpch_q8": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(CASE WHEN n2.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        GROUP BY 1
    """,
    "tpch_q9": """
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "tpch_q11": """
        WITH per_part AS (
            SELECT l_partkey,
                   ROUND(SUM(l_extendedprice * l_quantity), 2) AS value
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                JOIN nation ON s_nationkey = n_nationkey
                                WHERE n_name = 'NATION_3')
            GROUP BY 1)
        SELECT l_partkey AS p_partkey, value
        FROM per_part
        WHERE value > (SELECT ROUND(SUM(value) * 0.001, 2) FROM per_part)
    """,
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                              AND o.o_orderstatus <> 'P'
            GROUP BY c.c_custkey) t
        GROUP BY c_count
    """,
    "tpch_q14": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    "tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey AS s_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY 1)
        SELECT r.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "tpch_q17": """
        WITH li_p AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')),
        thr AS (
            SELECT l_partkey AS t_partkey,
                   ROUND(AVG(l_quantity) * 0.2, 6) AS qty_thr
            FROM li_p GROUP BY 1)
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_rows
        FROM li_p JOIN thr ON l_partkey = t_partkey
        WHERE l_quantity < qty_thr
    """,
    "tpch_q19": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20": """
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_4'
          AND s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(l_quantity) > 50)
    """,
    "tpch_q21": """
        WITH l1 AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R' AND o_orderstatus = 'F')
        SELECT s_name, numwait FROM (
            SELECT s.s_name, COUNT(*) AS numwait
            FROM l1
            JOIN supplier s ON l1.l_suppkey = s.s_suppkey
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s.s_name) t
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "tpch_q22": """
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 6) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'O')
        GROUP BY c_nationkey
    """,
}
