"""Connected components over a pair list — dedup *clustering*.

Pairwise near-dup detection (MinHash-LSH, SimHash, Jaccard — see
``operators.dedup``) yields edges; curation needs CLUSTERS: every doc
labeled with its duplicate-group id so one representative per group can
be kept. That grouping is connected components on the pair graph.

Algorithm: iterative min-label propagation (the MapReduce-CC / Pregel
formulation). Each vertex starts labeled with its own id; every round
each vertex takes the min of its label and its neighbors' labels; stop
when a round changes nothing. Rounds = graph diameter, and near-dup
components are small and dense (duplicate families), so 3-5 rounds
cover real corpora; ``max_iter`` bounds the pathological chain case.

Scale design:
- each round is one join (edges ⨝ labels, shuffle keyed on vertex id)
  + one min-aggregation — all partial-aggregated, nothing collects to
  the driver; the convergence check is a 1-row count per round (a
  driver-side *decision*, not driver-side data).
- ``localCheckpoint`` truncates lineage each round so plans don't grow
  exponentially across iterations (the standard iterative-Spark trap).
- at trillion-edge scale swap in the large-star/small-star variant
  (Kiveris et al., "Connected Components in MapReduce and Beyond") —
  same join primitive, fewer rounds; out of scope here.

The result is oracle-checked against a DuckDB recursive CTE computing
min-reachable-id per vertex (__spark_entry__ `dedup_clusters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with the minimum
    vertex id reachable from it. Returns (id, cluster_id).

    ``pairs`` is an edge list; direction and duplicates don't matter.
    """
    # symmetrize via explode, not union-of-two-selects: a union consumes
    # the ``pairs`` subtree twice, and when pairs come straight off the
    # MinHash-LSH pipeline that re-runs its (expensive) verify stage —
    # explode duplicates each row map-side in a single evaluation
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.u == labels.id)
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        merged = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("new_cluster_id"),
                "cluster_id",
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("new_cluster_id") != F.col("cluster_id")).count()
        labels = merged.select("id", F.col("new_cluster_id").alias("cluster_id"))
        if changed == 0:
            break
    if changed != 0:
        # silently returning intermediate labels would surface downstream
        # as an inscrutable data diff — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); raise max_iter (components "
            f"with diameter > max_iter exist)"
        )
    return labels


def cluster_members(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster id for EVERY row of ``all_ids`` (singletons label
    themselves): the curation-facing wrapper around
    ``connected_components``. Returns (id_col, cluster_id)."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    return (
        all_ids.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )


def cluster_representatives(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """One keeper per duplicate cluster (the min id — deterministic).
    Anti-joining the corpus against this is 'drop near-duplicates'."""
    members = cluster_members(all_ids, pairs, id_col=id_col, **kwargs)
    return members.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
