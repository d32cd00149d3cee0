"""Local replica of the driver's correctness check.

Runs every ``queries()`` entry against its ``oracle_sql()`` SQL at a given
scale factor and compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified).  Usage::

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

# Ray 2.49 logs a spurious core_worker.cc ERROR ("constructor arguments in
# the object store and max_restarts > 0", ray-project/ray#53727) for EVERY
# Ray Data actor pool — actor-creation args are always promoted to the
# object store, and Ray Data defaults max_restarts=-1 for fault tolerance.
# The args here are driver-owned (the driver outlives every pool), so the
# restart-failure scenario the warning describes cannot occur in this
# deployment.  Silence C++-level logs in the sweep: genuine failures still
# surface as Python exceptions / FAIL lines, never as C++ stderr only.
os.environ.setdefault("RAY_BACKEND_LOG_LEVEL", "fatal")

import duckdb
import pandas as pd
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # single-file testdata tables read as ONE task whose 2-block streaming
    # generator buffer throttles deep chains (see bench.py for the
    # measurement); the sweep's blocks are small at sf0.01/0.1
    if hasattr(ctx, "_max_num_blocks_in_streaming_gen_buffer"):
        ctx._max_num_blocks_in_streaming_gen_buffer = 16

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok(rows-only) {name}: {len(mine)} rows, cols={sorted(mine.columns)}")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        probs = []
        if len(mine) != len(want):
            probs.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            probs.append(f"cols {sorted(mine.columns)} != {sorted(want.columns)}")
        if not probs:
            a, b = canon(mine), canon(want)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                probs.append(f"values differ in {int(diff.sum())} rows; first:\n{a[diff].head(3)}\nvs\n{b[diff].head(3)}")
        if probs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(probs))
        else:
            print(f"OK   {name}: {len(mine)} rows")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
