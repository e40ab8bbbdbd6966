"""Streaming per-key EWMA state: the fixed-point recursion of
``operators/timeseries.ewma_last`` maintained across micro-batches —
the recency-weighted level a drift monitor reads live instead of
re-folding history.

State layout (the established per-epoch discipline): each micro-batch
writes ``ewma/batch_id=N/`` holding the UPDATED ``(key, s, n_points)``
rows for the keys it saw — a DELTA snapshot, so state on disk grows
with touched keys per epoch, not with |keys| × epochs. Reads take the
LATEST row per key over ``batch_id < N`` (max-epoch wins); a replayed
batch overwrites its own dir and never reads itself — the
minhash_dedup exactly-once contract.

Parity contract (pinned by test): because resuming the integer fold
from a stored state IS the same computation as folding the
concatenated history (``timeseries.ewma_fold``), the streaming state
after any batch sequence equals ``ewma_last`` over the union of those
batches — PROVIDED each key's ``order_col`` values arrive
non-decreasing across batches (the event-time-monotonic intake
assumption; within a batch any order is fine, the fold sorts). With
out-of-order arrival the result is the EWMA in arrival-batch order —
a documented, still-deterministic semantic, not an error.

Scale: per batch ONE keyed shuffle over the batch's keys + a
broadcast-sized join against the latest state of THOSE keys only
(state is read filtered by the batch's key set — the corpus-index
probe discipline); compaction of old epochs = keep the latest row per
key (maintenance, same promote pattern as compact_claimed).

Domain caveat (same as ``ewma_last``): values must be NON-NEGATIVE —
the half-up integer division identity assumes it, and a stored state
of exactly -1 would collide with the no-state sentinel. Enforced: a
negative value raises at fold time (``timeseries.ewma_scaled_value``);
filter or shift the input before the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.timeseries import ewma_fold, ewma_scaled_value
from .incremental import run_incremental


def _read_latest_state(
    spark: SparkSession,
    work_dir: str,
    before_batch: int,
    key_col: str,
    only_keys: DataFrame | None = None,
) -> DataFrame | None:
    """Latest ``(key, s, n_points)`` per key from epochs strictly before
    ``before_batch``; None when no state exists yet. ``only_keys``
    (the batch's distinct keys) filters the state rows BEFORE the
    latest-wins aggregate, so the per-batch cost is sized by the
    touched keys' history, never the whole key universe."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{work_dir}/ewma")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    raw = (
        spark.read.parquet(f"{work_dir}/ewma")
        .filter(F.col("batch_id").cast("bigint") < before_batch)
    )
    if only_keys is not None:
        raw = raw.join(only_keys.select(key_col), key_col, "left_semi")
    return raw.groupBy(key_col).agg(
        F.max_by(
            F.struct("s", "n_points"), F.col("batch_id").cast("bigint")
        ).alias("_st")
    ).select(key_col, F.col("_st.s").alias("s"),
             F.col("_st.n_points").alias("n_points"))


def ewma_update(
    batch: DataFrame,
    prior: DataFrame | None,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 2,
) -> DataFrame:
    """One round: fold the batch's values (per key, ``order_col``
    order) onto the prior integer state. Returns the UPDATED
    ``(key, s, n_points)`` rows for keys seen in this batch only."""
    mult = 10 ** int(scale)
    xi = ewma_scaled_value(value_col, mult)
    grouped = (
        batch.filter(
            F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(key_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(order_col).alias("o"), xi.alias("x"))
                    )
                ),
                lambda st: st["x"],
            ).alias("_vals"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    if prior is not None:
        grouped = grouped.join(
            prior.select(
                key_col,
                F.col("s").alias("_ps"),
                F.col("n_points").alias("_pn"),
            ),
            key_col,
            "left",
        )
    else:
        grouped = grouped.withColumn(
            "_ps", F.lit(None).cast("bigint")
        ).withColumn("_pn", F.lit(None).cast("bigint"))
    init = F.coalesce(F.col("_ps"), F.lit(-1).cast("bigint"))
    return grouped.select(
        key_col,
        ewma_fold(F.col("_vals"), init, alpha_num, alpha_den).alias("s"),
        (F.coalesce(F.col("_pn"), F.lit(0)) + F.col("_n")).cast(
            "bigint"
        ).alias("n_points"),
    )


def make_ewma_batch_fn(
    work_dir: str,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 2,
):
    """Per-micro-batch state-update callback (idempotent per-epoch
    overwrite)."""

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_keys = batch_df.filter(
            F.col(key_col).isNotNull()
        ).select(key_col).distinct().localCheckpoint(eager=False)
        prior = _read_latest_state(
            spark, work_dir, batch_id, key_col, only_keys=batch_keys
        )
        updated = ewma_update(
            batch_df, prior, key_col, order_col, value_col,
            alpha_num, alpha_den, scale,
        )
        updated.write.mode("overwrite").parquet(
            f"{work_dir}/ewma/batch_id={batch_id}"
        )

    return batch_fn


def read_ewma(
    spark: SparkSession, work_dir: str, key_col: str, scale: int = 2,
    key_type: str = "BIGINT",
) -> DataFrame:
    """The live per-key level: latest state descaled —
    ``(key, n_points, ewma)`` with ``ewma`` rounded to 6dp. Empty-but-
    valid before the first commit; ``key_type`` sets the key dtype of
    that empty frame (DDL type name, e.g. ``STRING``) so a stream keyed
    on a non-BIGINT column returns the SAME schema before and after the
    first commit — downstream unions/joins see one dtype."""
    latest = _read_latest_state(spark, work_dir, 2**62, key_col)
    if latest is None:
        return spark.createDataFrame(
            [], f"{key_col} {key_type}, n_points BIGINT, ewma DOUBLE"
        )
    mult = 10 ** int(scale)
    return latest.select(
        key_col,
        "n_points",
        F.round(F.col("s").cast("double") / F.lit(float(mult)), 6).alias(
            "ewma"
        ),
    )


def streaming_ewma(
    stream_df: DataFrame,
    work_dir: str,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 2,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous per-key EWMA maintenance over a document/metric
    stream."""
    batch_fn = make_ewma_batch_fn(
        work_dir, key_col, order_col, value_col, alpha_num, alpha_den,
        scale,
    )
    return run_incremental(
        stream_df, batch_fn, f"{work_dir}/ckpt", available_now=available_now
    )


def compact_ewma_state(
    spark: SparkSession, work_dir: str, key_col: str, upto_batch: int
) -> tuple[int, int]:
    """Offline maintenance: fold every ``ewma/batch_id < upto_batch``
    delta snapshot into ONE latest-per-key partition named
    ``batch_id=<upto_batch - 1>`` (so later batches' ``batch_id < N``
    reads still cover it — the compact_claimed naming rule). MUST run
    while the stream is stopped, with ``upto_batch`` = last committed
    batch + 1 (a replayed batch overwrites its own dir; compacting an
    unsealed epoch would let the replay wipe merged history).

    Latest-wins is preserved exactly: the merged partition carries each
    key's max-epoch row, and any LATER epoch still out-ranks it in the
    read's max_by. Uses the checked-rename promote with dot-prefixed
    names (orphan recovery at entry via ``recover_backup``). Returns
    ``(rows_before, rows_after)``."""
    from ..sources.promote import hadoop_fs, promote_swap, recover_backup

    state_dir = f"{work_dir}/ewma"
    fs, hpath = hadoop_fs(spark, state_dir)
    if not fs.exists(hpath(state_dir)):
        return 0, 0
    target_epoch = upto_batch - 1
    target = f"{state_dir}/batch_id={target_epoch}"
    recover_backup(
        spark, target, f"{state_dir}/.compact_bak_{target_epoch}"
    )
    epochs = []
    for st in fs.listStatus(hpath(state_dir)):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            try:
                e = int(name[len("batch_id="):])
            except ValueError:
                continue
            if e < upto_batch:
                epochs.append(e)
    if not epochs:
        return 0, 0
    # batch_id is a partition column only when read through the parent
    # dir; explicit per-dir reads drop it, so re-attach epoch via a
    # union with literals to keep max_by exact
    parts = None
    for e in sorted(epochs):
        p = spark.read.parquet(f"{state_dir}/batch_id={e}").withColumn(
            "_e", F.lit(e)
        )
        parts = p if parts is None else parts.unionByName(p)
    rows_before = parts.count()
    merged = (
        parts.groupBy(key_col)
        .agg(F.max_by(F.struct("s", "n_points"), F.col("_e")).alias("_st"))
        .select(key_col, F.col("_st.s").alias("s"),
                F.col("_st.n_points").alias("n_points"))
        .localCheckpoint(eager=True)
    )
    rows_after = merged.count()

    def _write(tmp_path: str) -> None:
        merged.write.mode("overwrite").parquet(tmp_path)

    promote_swap(
        spark,
        target,
        _write,
        tmp=f"{state_dir}/.compact_tmp_{target_epoch}",
        backup=f"{state_dir}/.compact_bak_{target_epoch}",
    )
    for e in sorted(epochs):
        if e != target_epoch:
            fs.delete(hpath(f"{state_dir}/batch_id={e}"), True)
    return rows_before, rows_after
