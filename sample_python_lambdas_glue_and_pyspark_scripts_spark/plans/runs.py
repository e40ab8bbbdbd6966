"""Run-control utilities (SURVEY.md §2.7 X12-X13, §2.9 O1/O3).

The reference's trigger Lambda builds unique run-scoped output paths and
sizes the Glue fleet from the input size
(/root/reference/src/price_zone/s3_trigger_lambda.py:66-127). The engine
keeps the *decision semantics* as pure functions; Spark's dynamic
allocation + AQE replace the worker-count mechanics at execution time.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass


def new_run_id(prefix: str = "etl_output", ts: int | None = None) -> str:
    """X12: unique run-scoped identifier '<prefix>_<epoch>_<uuid4>'
    (reference: s3_trigger_lambda.py:93-94)."""
    ts = int(time.time()) if ts is None else ts
    return f"{prefix}_{ts}_{uuid.uuid4()}"


GB = 10**9


def bytes_to_gb(n_bytes: int) -> float:
    """X13: the reference's byte→GB arithmetic (s3_trigger_lambda.py:66-70
    uses size * 9.31e-10, i.e. GiB expressed in decimal form)."""
    return n_bytes * 9.31 / 10**10


@dataclass(frozen=True)
class RunSizing:
    mode: str  # 'partial' | 'full'
    worker_count: int
    shuffle_partitions: int


def plan_run_sizing(
    input_bytes: int,
    partial_upper_bound_gb: float,
    min_workers: int = 2,
    max_workers: int = 10,
    cores_per_worker: int = 4,
) -> RunSizing:
    """O3: elastic sizing by input size (s3_trigger_lambda.py:72-117).

    <= bound → partial load with MIN workers; above → full with MAX.
    shuffle_partitions is derived at 2x total cores — a static ceiling
    that AQE coalesces down at runtime.
    """
    gb = bytes_to_gb(input_bytes)
    if gb <= partial_upper_bound_gb:
        workers = min_workers
        mode = "partial"
    else:
        workers = max_workers
        mode = "full"
    return RunSizing(
        mode=mode,
        worker_count=workers,
        shuffle_partitions=workers * cores_per_worker * 2,
    )
