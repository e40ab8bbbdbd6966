"""Streaming connected-components state (streaming/cc_state.py):
batch↔stream label parity via the extend ≡ rebuild law, replay
idempotence by determinism, and bridge-vertex retraction with forward
snapshot rebuild (routed through retract_doc_ids)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.clustering import (
    connected_components,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.streaming import (
    cc_state as CC,
)

EDGES = "a BIGINT, b BIGINT"


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="ccstate-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, EDGES)


def _labels(df):
    return sorted((r["id"], r["cluster_id"]) for r in df.collect())


EPOCHS = [
    [(1, 2), (3, 4), (5, 6)],
    [(2, 7), (8, 9)],          # 7 joins {1,2}; new component {8,9}
    [(4, 5), (10, 10)],        # bridges {3,4} and {5,6}; self-loop vertex
]


def test_batch_stream_label_parity(spark, workdir):
    fn = CC.make_cc_batch_fn(workdir)
    seen = []
    for i, rows in enumerate(EPOCHS):
        fn(_pairs(spark, rows), i)
        seen += rows
        live = CC.read_cc_state(spark, workdir)
        rebuilt = connected_components(_pairs(spark, seen), src="a", dst="b")
        assert _labels(live) == _labels(rebuilt), f"epoch {i}"


def test_empty_before_first_commit(spark, workdir):
    assert CC.read_cc_state(spark, workdir).count() == 0


def test_replay_is_noop(spark, workdir):
    fn = CC.make_cc_batch_fn(workdir)
    for i, rows in enumerate(EPOCHS):
        fn(_pairs(spark, rows), i)
    before = _labels(CC.read_cc_state(spark, workdir))
    ep0 = _labels(CC._labels_at(spark, workdir, 0))
    # replay older epochs under a newer head: each re-derives from the
    # snapshot strictly below its own id and rewrites identical content
    fn(_pairs(spark, EPOCHS[0]), 0)
    fn(_pairs(spark, EPOCHS[1]), 1)
    assert _labels(CC._labels_at(spark, workdir, 0)) == ep0
    assert _labels(CC.read_cc_state(spark, workdir)) == before


def test_bridge_retraction_rebuilds_forward(spark, workdir):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
        retraction as R,
    )

    fn = CC.make_cc_batch_fn(workdir)
    fn(_pairs(spark, [(1, 2), (3, 4)]), 0)
    fn(_pairs(spark, [(2, 99), (99, 3)]), 1)   # 99 bridges {1,2} and {3,4}
    fn(_pairs(spark, [(10, 11)]), 2)
    merged = {r["id"]: r["cluster_id"] for r in CC.read_cc_state(spark, workdir).collect()}
    assert merged[4] == 1  # bridged through 99

    out = R.retract_doc_ids(
        spark.createDataFrame([(99,)], "doc_id BIGINT"), cc_state=workdir
    )
    assert out["state_counts"]["cc_state"] == {
        "edges_removed": 2,
        "label_epochs_rebuilt": 2,
    }
    assert any("cc_state" in c for c in out["caveats"])

    live = CC.read_cc_state(spark, workdir)
    rebuilt = connected_components(
        _pairs(spark, [(1, 2), (3, 4), (10, 11)]), src="a", dst="b"
    )
    assert _labels(live) == _labels(rebuilt)  # components split back
    assert 99 not in {r["id"] for r in live.collect()}
    # epoch 0 predates the hit: never rewritten
    assert _labels(CC._labels_at(spark, workdir, 0)) == _labels(
        connected_components(_pairs(spark, [(1, 2), (3, 4)]), src="a", dst="b")
    )
