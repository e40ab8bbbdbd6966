"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.8 mapping; the brief's custom-stateful-operator slot).

Two canonical shapes:
- ``streaming_dedup``: exact first-occurrence dedup across micro-batches —
  state is one boolean per key (fingerprint), so the state store scales
  with distinct-key cardinality, partitioned by key hash across executors.
- ``streaming_running_counts``: per-key running aggregates that survive
  across micro-batches (the reference's run-status accumulators done
  properly in-stream).

State-store scale notes: keys partition across executors by hash (same
shuffle as a groupBy); use RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) for state larger than
heap, and state TTL (GroupStateTimeout) to bound unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream_df: DataFrame,
    key_col: str,
    output_schema: str,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Emit only the FIRST row seen per key across all micro-batches.

    ``output_schema`` must be a DDL string covering ``key_col`` +
    ``carry_cols``. Later occurrences (same batch or later batches) are
    dropped — exact streaming dedup keyed on a precomputed fingerprint.
    """
    carry = carry_cols or []

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if state.exists or first is None:
            return
        state.update((True,))
        yield first[[key_col] + carry]

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_counts(
    stream_df: DataFrame,
    key_col: str,
    key_type: str = "bigint",
) -> DataFrame:
    """Per-key running row count, updated each micro-batch the key appears in."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        count += batch
        state.update((count,))
        yield pd.DataFrame({key_col: [key[0]], "running_count": [count]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} {key_type}, running_count bigint",
        stateStructType="count bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
