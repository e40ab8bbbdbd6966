"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
against the synthetic tables (TESTDATA.md) and has a DuckDB-equivalent
``oracle_sql()`` entry unless genuinely non-SQL-expressible.

Mapping convention (FIXTURES.md §5): ``l_partkey`` stands in for the
reference's ``opco_id`` quarantine group; the price/quantity rules stand
in for the price_zone constraint suite; nation/region are the routing
dimensions; ``events`` is the run ledger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sample_python_lambdas_glue_and_pyspark_scripts_spark.functions import (
    classify_file_type,
    split_part,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    ledger as ldg,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    routing as rt,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    validation as V,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Quarantine stand-ins (FIXTURES.md §5): group = l_partkey, rules below.
_PRICE_CAP = 104000.0
_QUARANTINE_RULES = [
    V.Rule("qty_range", "l_quantity", "in_range", {"lo": 1.0, "hi": 50.0}),
    V.Rule("price_cap", "l_extendedprice", "greater_than", {"value": _PRICE_CAP}),
]


# --- SURVEY §2.3/§2.4: validation + quarantine -------------------------------


def q_pz_quarantine_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8 flagship: single-pass validate, quarantine whole groups, roll up."""
    li = _t(spark, sf_dir, "lineitem")
    clean, _matrix = V.validate_distributed(li, _QUARANTINE_RULES, group_col="l_partkey")
    return clean.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_pz_validation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-group violation matrix itself (one aggregation pass)."""
    li = _t(spark, sf_dir, "lineitem")
    flagged = V.flag_columns(li, _QUARANTINE_RULES)
    return flagged.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.coalesce(F.col("__viol_qty_range"), F.lit(False)).cast("int")).alias(
            "viol_qty"
        ),
        F.max(F.coalesce(F.col("__viol_price_cap"), F.lit(False)).cast("int")).alias(
            "viol_price"
        ),
    )


# --- SURVEY §2.2/§2.7: projections, casts, scalar functions ------------------


def q_transform_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P5/X5/X8/X11: timestamp format/epoch/int derivations on orders."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts_str"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.floor("o_totalprice").alias("total_floor"),
    )


def q_pa_brand_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: the PA PRICE_ZONE_ID split ('Brand#13' → prefix/code)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        split_part("p_brand", "#", 0).alias("brand_prefix"),
        split_part("p_brand", "#", 1).alias("brand_code"),
    )


def q_classify_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: case-insensitive prefix routing (partial/full/unknown)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        classify_file_type(
            "event_type", partial_prefixes=("click", "view"), full_prefixes=("purchase",)
        ).alias("file_type"),
    )


# --- SURVEY §2.5: joins -------------------------------------------------------


def q_route_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast routing join with invalid-bucket fallback."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") != 0)
    dim = n.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cluster_id")
    )
    return rt.route_to_clusters(
        c.select("c_custkey", "c_nationkey"), dim, on="c_nationkey"
    ).select("c_custkey", "cluster_id")


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: membership as a left-semi join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return rt.semi_join_members(c, o, "c_custkey").select("c_custkey")


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: quarantine-shaped left-anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return rt.anti_join_quarantine(c, o, "c_custkey").select("c_custkey")


def q_nation_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: set difference (supplier nations without customers)."""
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return rt.set_difference(s, c, "nationkey")


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A8: two broadcast joins + aggregate (customer→nation→region)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# --- SURVEY §2.6: windows / top-k --------------------------------------------


def q_admission_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank-by-start-time admission (row_number <= k per user)."""
    e = _t(spark, sf_dir, "events")
    ranked = ldg.admission_rank_partitioned(
        e, k=3, partition_col="user_id", start_col="ts", id_col="event_id"
    )
    return ranked.select("user_id", "event_id", "rnk")


def q_latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-latest (row_number=1 per key, reference retry dedup)."""
    e = _t(spark, sf_dir, "events")
    return ldg.idempotent_latest(
        e, keys=["user_id", "event_type"], ts_col="ts", tiebreak_col="event_id"
    ).select("user_id", "event_type", F.col("event_id").alias("latest_event_id"))


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate (W2/W3 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    return (
        rev.orderBy(F.col("__rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("__rev", 2).alias("revenue"))
    )


# --- SURVEY §2.4: aggregations / distinct ------------------------------------


def q_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: distinct projection."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


def q_min_orderdate_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+X11: min timestamp per group, formatted."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("min_orderdate")
    )


def q_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: run-status accounting + terminal-status decision."""
    e = _t(spark, sf_dir, "events")
    mapped = e.select(
        (F.col("user_id") % 10).alias("run_id"),
        F.col("user_id").alias("opco_id"),
        F.when(F.col("event_type") == "error", "FAILED")
        .when(F.col("event_type") == "signup", "RUNNING")
        .otherwise("SUCCEEDED")
        .alias("status"),
    )
    return ldg.status_rollup(mapped, run_col="run_id")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline aggregation (TPC-H Q1 shape) — the bench anchor."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pz_quarantine_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pz_quarantine_rollup": q_pz_quarantine_rollup,
        "pz_validation_matrix": q_pz_validation_matrix,
        "transform_typed": q_transform_typed,
        "pa_brand_split": q_pa_brand_split,
        "classify_events": q_classify_events,
        "route_clusters": q_route_clusters,
        "customers_with_orders": q_customers_with_orders,
        "customers_without_orders": q_customers_without_orders,
        "nation_set_difference": q_nation_set_difference,
        "region_rollup": q_region_rollup,
        "admission_topk": q_admission_topk,
        "latest_event_per_user_type": q_latest_event_per_user_type,
        "top_revenue_orders": q_top_revenue_orders,
        "distinct_event_types": q_distinct_event_types,
        "min_orderdate_per_priority": q_min_orderdate_per_priority,
        "status_rollup": q_status_rollup,
        "tpch_q1": q_tpch_q1,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pz_quarantine_rollup": f"""
            WITH bad AS (SELECT DISTINCT l_partkey FROM lineitem
                         WHERE l_extendedprice > {_PRICE_CAP}
                            OR l_quantity < 1.0 OR l_quantity > 50.0)
            SELECT l_returnflag, COUNT(*) AS n_rows,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_partkey NOT IN (SELECT l_partkey FROM bad)
            GROUP BY l_returnflag
        """,
        "pz_validation_matrix": f"""
            SELECT l_partkey, COUNT(*) AS n_rows,
                   MAX(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS viol_qty,
                   MAX(CASE WHEN l_extendedprice > {_PRICE_CAP} THEN 1 ELSE 0 END) AS viol_price
            FROM lineitem GROUP BY l_partkey
        """,
        "transform_typed": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts_str,
                   CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
                   CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor
            FROM orders
        """,
        "pa_brand_split": """
            SELECT p_partkey,
                   split_part(p_brand, '#', 1) AS brand_prefix,
                   split_part(p_brand, '#', 2) AS brand_code
            FROM part
        """,
        "classify_events": """
            SELECT event_id,
                   CASE WHEN lower(event_type) LIKE 'click%' OR lower(event_type) LIKE 'view%' THEN 'partial'
                        WHEN lower(event_type) LIKE 'purchase%' THEN 'full'
                        ELSE 'unknown' END AS file_type
            FROM events
        """,
        "route_clusters": """
            SELECT c_custkey, COALESCE(n.n_name, 'invalid') AS cluster_id
            FROM customer c
            LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <> 0) n
              ON c.c_nationkey = n.n_nationkey
        """,
        "customers_with_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "nation_set_difference": """
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
            WHERE s_nationkey NOT IN (SELECT c_nationkey FROM customer)
        """,
        "region_rollup": """
            SELECT r_name, COUNT(*) AS n_customers,
                   ROUND(SUM(c_acctbal), 2) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "admission_topk": """
            SELECT user_id, event_id, CAST(rnk AS INTEGER) AS rnk FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
                FROM events) t
            WHERE rnk <= 3
        """,
        "latest_event_per_user_type": """
            SELECT user_id, event_type, event_id AS latest_event_id FROM (
                SELECT user_id, event_type, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
            WHERE rn = 1
        """,
        "top_revenue_orders": """
            SELECT o_orderkey, ROUND(rev, 2) AS revenue FROM (
                SELECT l_orderkey AS o_orderkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS rev
                FROM lineitem GROUP BY l_orderkey) t
            ORDER BY rev DESC, o_orderkey
            LIMIT 10
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "min_orderdate_per_priority": """
            SELECT o_orderpriority,
                   strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_orderdate
            FROM orders GROUP BY o_orderpriority
        """,
        "status_rollup": """
            WITH mapped AS (
                SELECT user_id % 10 AS run_id, user_id AS opco_id,
                       CASE WHEN event_type = 'error' THEN 'FAILED'
                            WHEN event_type = 'signup' THEN 'RUNNING'
                            ELSE 'SUCCEEDED' END AS status
                FROM events)
            SELECT run_id,
                   COUNT(DISTINCT opco_id) AS total_opco_count,
                   COUNT(DISTINCT CASE WHEN status = 'SUCCEEDED' THEN opco_id END) AS success_count,
                   COUNT(DISTINCT CASE WHEN status = 'FAILED' THEN opco_id END) AS failed_count,
                   CASE WHEN MAX(CASE WHEN status = 'RUNNING' THEN 1 ELSE 0 END) = 1 THEN 'RUNNING'
                        WHEN MAX(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) = 1 THEN 'FAILED'
                        ELSE 'SUCCEEDED' END AS terminal_status
            FROM mapped GROUP BY run_id
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
    }
