"""Persistent corpus hash index → incremental dedup against an EXISTING corpus.

The continuous-ingest problem at 100 TB: yesterday's corpus is already
deduped and sitting in cold storage; today's crawl shard must be checked
against it WITHOUT re-shuffling yesterday's data (an anti-join would
re-exchange the whole historical corpus on every increment).

Build once, probe forever:

- ``build_hash_index`` shuffles ONLY the 8-byte content hashes (not the
  documents) into ``n_shards`` hash-partitioned, sorted, uniqued parquet
  shards + an atomic manifest.  One groupby over uint64s; per-task
  memory is ``index_size / n_shards``.
- ``HashIndexProbe`` is an actor-pool ``map_batches`` stage: each actor
  lazily loads (and caches across batches) only the shards its batches
  touch, and membership is a vectorized ``searchsorted`` per shard
  slice.  Zero shuffle on the probe side — new data is flagged where it
  lands.

For indexes larger than a node's memory, pre-partition the probe input
by ``h % n_shards`` (the same key) so each actor touches one shard; at
the sizes this sandbox tests, per-actor lazy caching is the right
default and the partitioned variant is the documented scale path.

The reference's DuplicateDetector (trduplicatedetector.pas) holds its
fingerprint memory in-process and forgets it between runs; this module
is the distributed, persistent replacement.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

MANIFEST = "_MANIFEST.json"
LOCKFILE = "_LOCK"


@contextlib.contextmanager
def _index_lock(index_dir: str, *, timeout_s: float = 120.0, stale_s: float = 600.0):
    """Exclusive advisory lock for index WRITERS (O_CREAT|O_EXCL file).

    Two concurrent ``update_hash_index`` runs would otherwise race on the
    manifest read-modify-write: both read the old manifest, each writes
    its own merge LAST, and the loser's shard counts (and, for shards
    only one of them touched, the knowledge those shards grew) vanish
    from the manifest — last-writer-wins data loss.  The lock serializes
    writers; probes stay lock-free (they only read, and the manifest is
    swapped atomically).  A lock older than ``stale_s`` is assumed
    abandoned (crashed writer) and broken loudly.
    """
    path = os.path.join(index_dir, LOCKFILE)
    deadline = time.monotonic() + timeout_s
    token = f"{os.getpid()}.{time.monotonic_ns()}"
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, token.encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                continue  # holder just released; retry immediately
            if age > stale_s:
                # Break the stale lock by renaming it aside to a unique
                # name, then RE-STAT the renamed file.  Two waiters can
                # both observe the same stale lock; a plain unlink would
                # let the loser (acting on its earlier stat) unlink the
                # winner's FRESH lock and acquire too, putting two
                # writers inside the manifest RMW.  Rename makes the
                # break exclusive per inode, and the post-rename stat
                # catches the remaining hole — the observed-stale file
                # was replaced by a fresh lock between stat and rename —
                # in which case the fresh lock is restored via link(2)
                # (which fails, correctly, if a third waiter claimed the
                # path meanwhile — the token-checked release below keeps
                # any mis-stolen holder from unlinking that claim).
                grave = f"{path}.stale.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(path, grave)
                except OSError:
                    time.sleep(0.05)
                    continue  # someone else broke it (or holder released)
                try:
                    fresh = (time.time() - os.path.getmtime(grave)) <= stale_s
                except OSError:
                    fresh = False
                if fresh:
                    with contextlib.suppress(OSError):
                        os.link(grave, path)
                with contextlib.suppress(OSError):
                    os.unlink(grave)
                if fresh:
                    # that lock was live after all — keep waiting (under
                    # the same deadline as the ordinary held-lock path)
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"index lock {path} is held by a live writer"
                        )
                    time.sleep(0.05)
                    continue
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"index lock {path} held for {age:.0f}s; another writer "
                    "is running (or crashed within the stale window)"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        # release only OUR lock: if a staleness misjudgment let another
        # waiter replace the file, unlinking it here would free a lock a
        # live writer believes it holds (token check narrows the blast
        # radius of every residual race above to "the stolen writer's
        # release is a no-op")
        with contextlib.suppress(OSError):
            with open(path) as f:
                if f.read() == token:
                    os.unlink(path)


def _shard_rows(hash_col: str, n_shards: int):
    """map_batches fn: (h uint64, shard = h % n_shards) — the ONE routing
    key shared by build and update (diverging keys would silently route
    updated hashes to different shards than the build)."""

    def add_shard(t: pa.Table) -> pa.Table:
        h = np.asarray(t[hash_col].to_numpy(zero_copy_only=False)).astype(np.uint64)
        return pa.table(
            {"h": pa.array(h, pa.uint64()),
             "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64))}
        )

    return add_shard


def _write_shard_file(index_dir: str, shard: int, h: np.ndarray) -> None:
    path = os.path.join(index_dir, f"shard_{shard:05d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"h": pa.array(h, pa.uint64())}), tmp)
    os.replace(tmp, path)


def _write_manifest(index_dir: str, n_shards: int, manifest: pd.DataFrame) -> None:
    meta = {"n_shards": n_shards, "shards": manifest.to_dict("records")}
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))


def build_hash_index(
    ds: ray.data.Dataset, index_dir: str, hash_col: str = "h", n_shards: int = 64
) -> pd.DataFrame:
    """Write a sorted, uniqued, hash-partitioned membership index.

    ``ds`` needs one uint64-compatible column ``hash_col``.  Returns the
    manifest (shard, n_hashes).  Shard files land via tmp+rename and the
    manifest is written LAST, so a crashed build is invisible to probes.
    """
    os.makedirs(index_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        shard = int(df["shard"].iloc[0])
        h = np.unique(df["h"].to_numpy().astype(np.uint64))
        _write_shard_file(index_dir, shard, h)
        return pd.DataFrame({"shard": [shard], "n_hashes": [len(h)]})

    manifest = (
        ds.map_batches(_shard_rows(hash_col, n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    _write_manifest(index_dir, n_shards, manifest)
    return manifest


class HashIndexProbe:
    """Actor-pool stage: append ``flag_col`` (1 = hash present in index).

    Construct via ``map_batches(HashIndexProbe, fn_constructor_kwargs=...,
    concurrency=N)``; shards load lazily per actor and stay cached.

    Restart safety: the constructor takes PATHS and plain strings — never
    ObjectRefs — so a restarted actor rebuilds its state from disk alone.
    (Ray still logs the blanket core_worker restart warning for every
    Ray Data actor pool, ray-project/ray#53727; it does not apply to the
    arguments here.)
    """

    def __init__(self, index_dir: str, hash_col: str = "h", flag_col: str = "known"):
        with open(os.path.join(index_dir, MANIFEST)) as f:
            meta = json.load(f)
        self.index_dir = index_dir
        self.n_shards = int(meta["n_shards"])
        self.have = {int(s["shard"]) for s in meta["shards"]}
        self.hash_col = hash_col
        self.flag_col = flag_col
        self.cache: dict[int, np.ndarray] = {}

    def _shard(self, s: int) -> np.ndarray:
        arr = self.cache.get(s)
        if arr is None:
            if s in self.have:
                arr = (
                    pq.read_table(os.path.join(self.index_dir, f"shard_{s:05d}.parquet"))
                    .column("h")
                    .to_numpy()
                    .astype(np.uint64)
                )
            else:
                arr = np.empty(0, np.uint64)
            self.cache[s] = arr
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = np.asarray(batch[self.hash_col].to_numpy(zero_copy_only=False)).astype(np.uint64)
        shard = (h % np.uint64(self.n_shards)).astype(np.int64)
        known = np.zeros(len(h), dtype=np.int64)
        for s in np.unique(shard):
            arr = self._shard(int(s))
            m = shard == s
            if len(arr):
                v = h[m]
                idx = np.searchsorted(arr, v).clip(max=len(arr) - 1)
                known[m] = (arr[idx] == v).astype(np.int64)
        return batch.append_column(self.flag_col, pa.array(known))


def update_hash_index(
    ds: ray.data.Dataset, index_dir: str, hash_col: str = "h"
) -> pd.DataFrame:
    """Merge a new shard's hashes INTO an existing index (no rebuild).

    The ingest loop's final step: probe → keep novel docs → append them
    to the corpus → ``update_hash_index`` with their hashes.  Each
    affected index shard is read, unioned, sorted and atomically
    replaced inside the same ``groupby(shard)`` task layout as the
    build; the manifest is rewritten LAST with updated counts.  The
    update is idempotent (a union), so a crash mid-update is repaired by
    re-running it; a probe racing a crashed update can at worst miss
    hashes of shards the OLD manifest did not list — never a false
    positive.  CONCURRENT updaters serialize on ``_index_lock`` (the
    manifest read happens inside the lock), so no updater's shards or
    counts are lost to a manifest race.
    """
    with _index_lock(index_dir):
        with open(os.path.join(index_dir, MANIFEST)) as f:
            meta = json.load(f)
        n_shards = int(meta["n_shards"])
        counts = {int(s["shard"]): int(s["n_hashes"]) for s in meta["shards"]}

        def merge_shard(df: pd.DataFrame) -> pd.DataFrame:
            shard = int(df["shard"].iloc[0])
            new = df["h"].to_numpy().astype(np.uint64)
            path = os.path.join(index_dir, f"shard_{shard:05d}.parquet")
            if os.path.exists(path):
                old = pq.read_table(path).column("h").to_numpy().astype(np.uint64)
                h = np.union1d(old, new)
            else:
                h = np.unique(new)
            _write_shard_file(index_dir, shard, h)
            return pd.DataFrame({"shard": [shard], "n_hashes": [len(h)]})

        updated = (
            ds.map_batches(_shard_rows(hash_col, n_shards), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(merge_shard, batch_format="pandas")
            .to_pandas()
        )
        for _, row in updated.iterrows():
            counts[int(row["shard"])] = int(row["n_hashes"])
        manifest = pd.DataFrame(
            sorted(counts.items()), columns=["shard", "n_hashes"]
        )
        _write_manifest(index_dir, n_shards, manifest)
        return manifest
