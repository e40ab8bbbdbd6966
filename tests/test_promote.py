"""Shared checked-rename promote helper (sources/promote.py): normal
swap, rollback on failure at the most dangerous instant, and recovery
from a hard crash between the two renames — the lifecycle every
persisted artifact (versioned catalog, claimed-fingerprint history,
HLL registers) now goes through."""

import os
import shutil
import tempfile

import pytest

from sample_python_lambdas_glue_and_pyspark_scripts_spark.sources.promote import (
    promote_swap,
    recover_backup,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="promote-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_df(spark, payload):
    def w(path):
        spark.createDataFrame([(payload,)], "v string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    return w


def _read_v(spark, path):
    return spark.read.parquet(path).first()["v"]


def test_promote_fresh_and_replace(spark, root):
    target = f"{root}/idx"
    promote_swap(spark, target, _write_df(spark, "v1"))
    assert _read_v(spark, target) == "v1"
    promote_swap(spark, target, _write_df(spark, "v2"))
    assert _read_v(spark, target) == "v2"
    # no debris: tmp and backup both cleaned up
    assert sorted(os.listdir(root)) == ["idx"]


def test_promote_rollback_on_failure_between_renames(spark, root):
    """An exception at the instant the target is moved aside must
    restore the old content — the artifact is never lost, the promote
    is rolled back."""
    target = f"{root}/idx"
    promote_swap(spark, target, _write_df(spark, "old"))

    def boom():
        raise RuntimeError("injected crash")

    with pytest.raises(RuntimeError):
        promote_swap(
            spark, target, _write_df(spark, "new"), _crash_hook=boom
        )
    assert _read_v(spark, target) == "old"


def test_promote_recovers_hard_crash_state(spark, root):
    """Hard crash (process death) between the renames leaves the backup
    as the ONLY copy and no live target. Both recover_backup and the
    next promote_swap must restore it rather than treat the backup as
    stale debris."""
    target = f"{root}/idx"
    promote_swap(spark, target, _write_df(spark, "v1"))
    # simulate the crashed instant: target moved aside, process died
    os.rename(target, f"{target}__old")
    assert not os.path.exists(target)

    # a reader path recovers explicitly...
    assert recover_backup(spark, target) is True
    assert _read_v(spark, target) == "v1"

    # ...and a writer path recovers implicitly inside promote_swap:
    os.rename(target, f"{target}__old")
    seen = {}

    def write_after_recovery(path):
        # by write time the live target must already be restored, so a
        # compaction-style reader would see the old content
        seen["restored"] = _read_v(spark, target)
        _write_df(spark, "v2")(path)

    promote_swap(spark, target, write_after_recovery)
    assert seen["restored"] == "v1"
    assert _read_v(spark, target) == "v2"
    assert sorted(os.listdir(root)) == ["idx"]


def test_stale_backup_with_live_target_is_deleted(spark, root):
    target = f"{root}/idx"
    promote_swap(spark, target, _write_df(spark, "live"))
    os.makedirs(f"{target}__old")  # cleanup debris, target is complete
    assert recover_backup(spark, target) is False
    assert not os.path.exists(f"{target}__old")
    assert _read_v(spark, target) == "live"
