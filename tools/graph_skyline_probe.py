"""Round-5 scale probes: PageRank under hub skew, skyline at 16x.

1. **PageRank hub skew** — a node holding 75% of edges is the web-graph
   reality (portal hosts). Two graphs, same size (50k nodes, 3.2M
   edges): uniform vs hub (75% of edges point AT one node, and 25% of
   those also originate from it). Timed under two postures:
     default      ranks/nodes are node-sized -> Spark broadcasts them;
                  the edge table never shuffles on the skewed key
     no_broadcast autoBroadcastJoinThreshold=-1 simulates the
                  billion-node regime where the rank vector outgrows
                  the broadcast budget; AQE skew-join is the lever
   The dst-side hub is absorbed by map-side partial aggregation
   regardless (combiners emit one row per partition per key).

2. **Skyline 16x** — global skyline over 3.2M rows (correlated dims:
   tiny front), grouped skyline over 320k rows x 1k groups, and the
   adversarial ALL-INCOMPARABLE diagonal at 1.6M rows, which must hit
   the SkylineFrontTooLargeError circuit breaker instead of scheduling
   a 1.6M-row single merge task.

Prints one JSON line; numbers land in BASELINE.md. SOLO run required
(concurrent JVMs inflate timings 1.3-3x).
Run: python tools/graph_skyline_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.graph import pagerank
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.skyline import (
    SkylineFrontTooLargeError,
    skyline,
    skyline_grouped,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

N_NODES = 50_000
N_EDGES = 3_200_000
HUB = 7
WORK = "/tmp/graph_skyline_probe"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_graphs(spark):
    shutil.rmtree(WORK, ignore_errors=True)
    base = spark.range(N_EDGES)
    uniform = base.select(
        F.pmod(F.xxhash64("id"), F.lit(N_NODES)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_NODES)).alias("dst"),
    )
    hub = base.select(
        F.when(F.pmod("id", F.lit(100)) < 19, F.lit(HUB))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_NODES)))
        .alias("src"),
        F.when(F.pmod("id", F.lit(100)) < 75, F.lit(HUB))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_NODES)))
        .alias("dst"),
    )
    uniform.repartition(16).write.parquet(f"{WORK}/uniform")
    hub.repartition(16).write.parquet(f"{WORK}/hub")


def time_pagerank(spark, path: str) -> float:
    edges = spark.read.parquet(path)
    t0 = time.perf_counter()
    force(pagerank(edges, n_iter=3))
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="graph-skyline-probe")
    out: dict = {"n_nodes": N_NODES, "n_edges": N_EDGES}

    build_graphs(spark)
    # warm both inputs
    for g in ("uniform", "hub"):
        force(spark.read.parquet(f"{WORK}/{g}"))

    for g in ("uniform", "hub"):
        out[f"pagerank_{g}_default_sec"] = time_pagerank(spark, f"{WORK}/{g}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for g in ("uniform", "hub"):
            out[f"pagerank_{g}_nobroadcast_sec"] = time_pagerank(
                spark, f"{WORK}/{g}"
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # --- skyline: global 16x, correlated dims (realistic tiny front) ---
    big = spark.range(N_EDGES).select(
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1000.0).alias("x"),
    ).select(
        "rid", "x",
        # y anti-correlates with x only weakly: front stays small
        (F.col("x") * 0.1 + F.pmod(F.xxhash64("rid", F.lit(2)), F.lit(1000))
         .cast("double")).alias("y"),
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{WORK}/sky")
    sky = spark.read.parquet(f"{WORK}/sky")
    force(sky)
    t0 = time.perf_counter()
    n_front = skyline(sky, {"x": "min", "y": "min"}).count()
    out["skyline_global_16x_sec"] = round(time.perf_counter() - t0, 2)
    out["skyline_global_16x_front"] = n_front

    # --- grouped skyline: 320k rows over 1k groups -----------------------
    grouped = spark.range(320_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("g"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)) / 100.0).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100_000)) / 100.0).alias("y"),
    )
    grouped.repartition(32).write.mode("overwrite").parquet(f"{WORK}/skyg")
    skyg = spark.read.parquet(f"{WORK}/skyg")
    force(skyg)
    t0 = time.perf_counter()
    n_g = skyline_grouped(skyg, ["g"], {"x": "min", "y": "max"}).count()
    out["skyline_grouped_16x_sec"] = round(time.perf_counter() - t0, 2)
    out["skyline_grouped_16x_front"] = n_g

    # --- adversarial all-incomparable: guard must refuse, fast -----------
    diag = spark.range(1_600_000).select(
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("x"),
        (-F.col("id")).cast("double").alias("y"),
    ).repartition(32)
    t0 = time.perf_counter()
    try:
        skyline(diag, {"x": "min", "y": "min"})
        out["skyline_adversarial_guard"] = "DID NOT FIRE"
    except SkylineFrontTooLargeError:
        out["skyline_adversarial_guard"] = "fired"
    out["skyline_adversarial_refusal_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
