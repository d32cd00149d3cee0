"""The >N fallback branches and writer-concurrency guards: these are the
paths a 100 TB run relies on but sf-scale runs never enter on their own
(round-2 VERDICT items #5/#7/#8) — forced here."""

import os
import threading
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def test_count_pairs_groupby_fallback_matches_single(ray_session):
    """expected_pairs > 5M flips count_pairs to the keyed groupby
    exchange; rows must be identical to the single-combine default."""
    from texrex_ray.dedup.tender import count_pairs, gram_shingles, shingle_pairs

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sh = gram_shingles(docs, id_col="doc_id", text_col="text", size_col=None, n=5)
    key = lambda d: sorted(zip(d["id_small"], d["id_big"], d["n_shared"]))
    single = count_pairs(shingle_pairs(sh), pair_threshold=5).to_pandas()
    grouped = count_pairs(
        shingle_pairs(sh), pair_threshold=5, expected_pairs=10_000_001
    ).to_pandas()
    assert key(single) == key(grouped)
    assert len(single) > 0


def test_minhash_lsh_candidate_cap_is_loud(ray_session):
    """A candidate list above max_candidates must raise with guidance,
    never stream corpus-sized data through the driver silently."""
    from texrex_ray.dedup.lsh import minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    with pytest.raises(ValueError, match="max_candidates"):
        minhash_lsh_pairs(docs, max_candidates=3)


def _hash_ds(values):
    return ray.data.from_arrow(
        pa.table({"h": pa.array(np.asarray(values, dtype=np.uint64))})
    )


def test_concurrent_index_updates_union(ray_session, tmp_path):
    """Two interleaved update_hash_index runs must both survive: the
    probe sees the UNION (the unlocked manifest read-modify-write lost
    the loser's shards)."""
    from texrex_ray.state.corpus_index import HashIndexProbe, build_hash_index, update_hash_index

    d = str(tmp_path / "idx")
    base = np.arange(0, 1000, dtype=np.uint64)
    b = np.arange(100_000, 101_000, dtype=np.uint64)
    c = np.arange(200_000, 201_000, dtype=np.uint64)
    build_hash_index(_hash_ds(base), d, n_shards=8)

    errs = []

    def upd(vals):
        try:
            update_hash_index(_hash_ds(vals), d)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    t1 = threading.Thread(target=upd, args=(b,))
    t2 = threading.Thread(target=upd, args=(c,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs

    probe = HashIndexProbe(d)
    allv = np.concatenate([base, b, c])
    out = probe(pa.table({"h": pa.array(allv)}))
    assert out["known"].to_numpy().sum() == len(allv)
    # manifest counts match the true union sizes
    import json

    with open(os.path.join(d, "_MANIFEST.json")) as f:
        meta = json.load(f)
    assert sum(s["n_hashes"] for s in meta["shards"]) == len(allv)


def test_index_lock_stale_break_and_timeout(tmp_path):
    from texrex_ray.state.corpus_index import LOCKFILE, _index_lock

    d = str(tmp_path)
    lock = os.path.join(d, LOCKFILE)
    # a fresh foreign lock blocks until timeout
    with open(lock, "w") as f:
        f.write("999999")
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        with _index_lock(d, timeout_s=0.3):
            pass
    assert time.monotonic() - t0 < 5
    # a stale lock is broken and the writer proceeds
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))
    with _index_lock(d, timeout_s=1.0, stale_s=600.0):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)


def test_ann_precombine_matches_driver_reduce(ray_session):
    """precombine=True (the extreme-block-count distributed pre-combine)
    must be row-identical to the driver-side reduce for all three ANN
    entry points."""
    import pandas as pd

    from texrex_ray.dedup.embed import ivf_ann, knn_bruteforce, lsh_ann

    emb = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).repartition(9)
    q = [0, 5, 7]
    for fn, kw in (
        (knn_bruteforce, {}),
        (ivf_ann, {"nlist": 4, "nprobe": 4}),
        (lsh_ann, {"n_planes": 3}),
    ):
        a = fn(emb, query_ids=q, k=8, **kw)
        b = fn(emb, query_ids=q, k=8, precombine=True, **kw)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


def test_index_lock_stale_break_is_race_safe(tmp_path, monkeypatch):
    """ADVICE r3 (TOCTTOU): a waiter whose staleness judgment was based
    on an EARLIER stat must not destroy a fresh lock that replaced the
    stale one in between.  Simulated by lying about the lock's mtime for
    the lock path only: the break renames the (actually fresh) file
    aside, the re-stat of the renamed file exposes the lie, the lock is
    restored, and the waiter goes back to waiting."""
    from texrex_ray.state.corpus_index import LOCKFILE, _index_lock

    d = str(tmp_path)
    lock = os.path.join(d, LOCKFILE)
    with open(lock, "w") as f:
        f.write("foreign-holder")

    real_getmtime = os.path.getmtime

    def lying_getmtime(p):
        if p == lock:
            return time.time() - 10_000  # stale, per the racer's old stat
        return real_getmtime(p)  # the renamed file re-stats honestly

    monkeypatch.setattr(os.path, "getmtime", lying_getmtime)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        with _index_lock(d, timeout_s=0.5, stale_s=600.0):
            pass
    assert time.monotonic() - t0 < 5
    # the fresh lock survived the attempted break, content intact
    with open(lock) as f:
        assert f.read() == "foreign-holder"
    # and no grave residue is left behind
    assert [p for p in os.listdir(d) if ".stale." in p] == []


def test_index_lock_release_is_token_checked(tmp_path):
    """A holder whose lockfile was replaced (mis-broken + re-acquired by
    someone else) must NOT unlink the new owner's lock on release."""
    from texrex_ray.state.corpus_index import LOCKFILE, _index_lock

    d = str(tmp_path)
    lock = os.path.join(d, LOCKFILE)
    with _index_lock(d, timeout_s=1.0):
        os.unlink(lock)
        with open(lock, "w") as f:
            f.write("someone-else")
    with open(lock) as f:
        assert f.read() == "someone-else"
    os.unlink(lock)
    # normal path still releases
    with _index_lock(d, timeout_s=1.0):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)


def test_tender_forwards_expected_pairs(ray_session, monkeypatch):
    """VERDICT r3 #2: tender() must pass a pair-volume hint down to
    count_pairs so the >5M keyed-groupby plan is actually reachable from
    the flagship entry point (a missing hint pinned it to the
    single-combine count forever, corpus size notwithstanding)."""
    import texrex_ray.dedup.tender as T

    captured = {}
    orig = T.count_pairs

    def spy(pairs, pair_threshold=5, expected_pairs=None):
        captured["ep"] = expected_pairs
        return orig(pairs, pair_threshold)

    monkeypatch.setattr(T, "count_pairs", spy)
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.count()
    out = T.tender(docs, size_col=None).to_pandas()
    assert captured["ep"] == n * 100 // 10  # k=100 minhash default
    assert len(out) > 0
