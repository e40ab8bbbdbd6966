"""The PA (Price Advisor) pipeline, Spark-first (SURVEY.md §3.2).

The reference runs this single-node in pandas
(/root/reference/src/pa/pa_etl_script.py:224-314). Same logical plan,
Spark execution: transform is one lazy projection; price validation is a
count; routing is a broadcast join; the per-opco serial loop becomes a
partitioned write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import transform as T
from ..operators.routing import route_to_clusters


@dataclass
class PAResult:
    output: DataFrame  # transformed + cluster-routed
    invalid_price_count: int


def run_pa_transform(raw: DataFrame, opco_cluster: DataFrame) -> PAResult:
    """raw pipe-CSV staging → transformed, price-validated, cluster-routed.

    F11 price rule: invalid iff numeric price <= 0; NULLs pass (the
    reference's ``dropna()`` lets null prices through,
    pa_etl_script.py:202-209 — SURVEY.md §7.2 NULL fidelity).
    """
    out = T.pa_transform(raw)
    invalid = out.filter(F.col("price") <= 0).count()
    routed = route_to_clusters(out, opco_cluster)
    return PAResult(output=routed, invalid_price_count=invalid)
