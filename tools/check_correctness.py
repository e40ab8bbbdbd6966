"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares with oracle_sql() via DuckDB: row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
values normalized). Prints one line per query + a summary.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sample_python_lambdas_glue_and_pyspark_scripts_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and fp noise
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(rows) >= 0 else "?"
            print(f"{status} {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(rows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(rows)} vs oracle {len(orows)}")
        if sorted(cols) != sorted(ocols):
            ok = False
            msgs.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if ok:
            a, b = canon(rows, cols), canon(orows, ocols)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
