import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Fast tier (r14, VERDICT r13 item 2): the full suite outgrew the
# driver's verification window (~33 min), so a plain `pytest tests/`
# run deselects the slowest tests listed in tests/slow_manifest.txt
# (node-id prefixes, regenerated from `--durations=0` output by
# tools/make_slow_manifest.py). Set SPARK_GRAFT_FULL_TESTS=1 for the
# full suite — REQUIRED for record runs and before claiming the round
# green (the deselected tests still gate correctness there).
# ---------------------------------------------------------------------------
_SLOW_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "slow_manifest.txt")


def _slow_prefixes() -> list[str]:
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return []
    try:
        with open(_SLOW_MANIFEST) as fh:
            return [
                ln.split("#")[0].strip() for ln in fh
                if ln.split("#")[0].strip()
            ]
    except OSError:
        return []


def pytest_collection_modifyitems(config, items):
    prefixes = _slow_prefixes()
    if not prefixes:
        return
    keep, drop = [], []
    for item in items:
        rel = item.nodeid  # e.g. tests/test_kll.py::test_merge_law
        short = rel.split("/")[-1]
        if any(rel.startswith(p) or short.startswith(p) for p in prefixes):
            drop.append(item)
        else:
            keep.append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
