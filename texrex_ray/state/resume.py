"""Resumable partitioned output for batch pipelines.

The crawl engine already checkpoints per partition; this is the same
write-then-commit-marker layout for *batch* pipelines (SURVEY.md §7.4,
"write-then-commit-marker"): the input file list is split into shards,
each shard's output goes to ``out_dir/shard=XXXX/`` written atomically
(temp dir + rename) with a ``_COMMIT`` marker, and a re-run skips every
committed shard.  A killed run therefore loses at most one shard of work,
and output readers only see complete shards.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


def shard_paths(paths: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic round-robin file sharding."""
    return [paths[i::n_shards] for i in range(n_shards) if paths[i::n_shards]]


def resumable_write(
    paths: list[str],
    pipeline: Callable[[list[str]], ray.data.Dataset],
    out_dir: str,
    n_shards: int = 8,
) -> dict:
    """Run ``pipeline(shard_files) → Dataset`` per shard, atomically.

    Returns {"written": [...], "skipped": [...]} shard names.  A shard is
    complete iff ``out_dir/shard=XXXX/_COMMIT`` exists; incomplete shard
    directories are discarded and rewritten.
    """
    os.makedirs(out_dir, exist_ok=True)
    written, skipped = [], []
    for i, files in enumerate(shard_paths(paths, n_shards)):
        name = f"shard={i:04d}"
        final = os.path.join(out_dir, name)
        marker = os.path.join(final, "_COMMIT")
        if os.path.exists(marker):
            skipped.append(name)
            continue
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        ds = pipeline(files)
        ds.write_parquet(tmp)
        os.replace(tmp, final)
        with open(marker, "w") as f:
            f.write("ok")
        written.append(name)
    return {"written": written, "skipped": skipped}


def read_committed(out_dir: str) -> ray.data.Dataset:
    """Dataset over all COMMITTED shards only."""
    dirs = [
        os.path.join(out_dir, d)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("shard=")
        and os.path.exists(os.path.join(out_dir, d, "_COMMIT"))
    ]
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)


def write_partitioned_by_key(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    n_partitions: int = 16,
) -> dict:
    """Resumable KEY-partitioned sink: one directory per key-hash range.

    The input-shard variant above resumes by input file; this one resumes
    by OUTPUT partition, for pipelines whose input isn't file-addressable
    (a crawl stream, a join result).  Rows hash-route on ``key_col`` with
    the version-stable blake2b hash (the partition a key lands in must
    survive library upgrades — same argument as host→frontier routing),
    committed partitions are pruned BEFORE the shuffle (their rows never
    leave the scan), and each partition directory is written by one
    ``map_groups`` task: temp dir → ``os.replace`` → ``_COMMIT`` marker,
    so readers only ever see whole partitions and a killed run loses at
    most the in-flight partitions.

    Returns {"written": [...], "skipped": [...]} partition names.
    """
    from texrex_ray.functions.hashing import stable_hash64

    os.makedirs(out_dir, exist_ok=True)
    name_of = lambda p: f"part={p:04d}"
    skipped = sorted(
        p
        for p in range(n_partitions)
        if os.path.exists(os.path.join(out_dir, name_of(p), "_COMMIT"))
    )
    todo = ray.put(np.array([p for p in range(n_partitions) if p not in set(skipped)]))

    def route(df):
        h = stable_hash64([str(v) for v in df[key_col]])
        df = df.assign(__part=(h % np.uint64(n_partitions)).astype(np.int64))
        return df[df["__part"].isin(ray.get(todo))]

    def write_one(g):
        part = int(g["__part"].iloc[0])
        final = os.path.join(out_dir, name_of(part))
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(tmp)
        body = g.drop(columns="__part")
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False),
            os.path.join(tmp, "data.parquet"),
        )
        os.replace(tmp, final)
        with open(os.path.join(final, "_COMMIT"), "w") as f:
            f.write("ok")
        return pd.DataFrame({"part": [part], "rows": [len(body)]})

    manifest = (
        ds.map_batches(route, batch_format="pandas")
        .groupby("__part")
        .map_groups(write_one, batch_format="pandas")
        .to_pandas()
    )
    return {
        "written": sorted(name_of(p) for p in manifest["part"]),
        "skipped": [name_of(p) for p in skipped],
    }


def read_committed_parts(out_dir: str) -> ray.data.Dataset:
    """Dataset over all COMMITTED key partitions only."""
    files = [
        os.path.join(out_dir, d, f)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_COMMIT"))
        for f in sorted(os.listdir(os.path.join(out_dir, d)))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
