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
