"""Scaling Bloom filter tests (ref semantics: trbloom.pas)."""

import math

import numpy as np

from texrex_ray.state.bloom import ScalingBloom, bloom_bits


def test_sizing_math():
    # bits = ceil(-n ln p / ln^2 2) + 1  (ref: trbloom.pas:289-294)
    n, p = 20_000_000, 1e-6
    bits = bloom_bits(n, p)
    assert bits == math.ceil(-n * math.log(p) / math.log(2) ** 2) + 1
    # one static segment for 20M @ 1e-6 is ~69 MB; the manual's "~100 MB per
    # 20 M adds" (manual:234-236) includes the scaling chain's smaller
    # predecessors, so the same order of magnitude
    assert 50 < bits / 8 / 1024 / 1024 < 110


def test_first_wins_and_membership():
    b = ScalingBloom(initial_capacity=1000, error_rate=1e-9)
    new = b.add_if_new(["a", "b", "a", "c"])
    assert new.tolist() == [True, True, False, True]
    assert b.contains_many(["a", "b", "c", "d"]).tolist() == [True, True, True, False]
    assert b.add_if_new(["b", "d"]).tolist() == [False, True]


def test_scaling_growth():
    b = ScalingBloom(initial_capacity=100, error_rate=1e-4)
    items = [f"u{i}" for i in range(1000)]
    res = b.add_if_new(items)
    assert res.all()
    assert len(b.segments) > 1
    assert b.contains_many(items).all()


def test_snapshot_restore():
    b = ScalingBloom(initial_capacity=100, error_rate=1e-6)
    b.add_if_new([f"x{i}" for i in range(500)])
    b2 = ScalingBloom.restore(b.snapshot())
    assert b2.contains_many([f"x{i}" for i in range(500)]).all()
    assert not b2.contains_many(["nope"]).any()
    assert b2.add_if_new(["x1", "fresh"]).tolist() == [False, True]


def test_false_positive_rate():
    b = ScalingBloom(initial_capacity=10_000, error_rate=1e-6)
    b.add_if_new([f"in{i}" for i in range(10_000)])
    probes = [f"out{i}" for i in range(20_000)]
    fp = int(b.contains_many(probes).sum())
    assert fp <= 2  # 1e-6 nominal; allow slack


def test_out_of_memory_refuses_adds():
    b = ScalingBloom(initial_capacity=64, error_rate=0.01, max_memory_mb=0)
    # cap segment fits (pre-allocated); growth beyond memory cap refuses
    res = b.add_if_new([f"a{i}" for i in range(200)])
    assert not res[100:].any() or b.out_of_memory


def test_corpus_index_build_and_probe(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from texrex_ray.state.corpus_index import HashIndexProbe, build_hash_index

    rng = np.random.default_rng(7)
    corpus = np.unique(rng.integers(0, 2**63, size=5200, dtype=np.uint64))[:5000]
    d = str(tmp_path / "idx")
    ds = ray.data.from_arrow(pa.table({"h": pa.array(corpus, pa.uint64())}))
    manifest = build_hash_index(ds, d, n_shards=8)
    assert manifest["n_hashes"].sum() == 5000  # uniqued, all present

    # probe a mix of members and strangers
    strangers = (corpus[:100] + np.uint64(1)) % np.uint64(2**63)
    probe = np.concatenate([corpus[:200], strangers])
    p = HashIndexProbe(d)
    out = p(pa.table({"h": pa.array(probe, pa.uint64())}))
    known = np.array(out["known"].to_pylist())
    assert known[:200].all()
    # strangers: none known (offset by 1 from members; collisions impossible
    # here because every corpus value is even-spaced random draws)
    assert known[200:].sum() == (np.isin(strangers, corpus)).sum()


def test_corpus_index_manifest_is_commit_marker(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pytest
    import ray.data

    from texrex_ray.state.corpus_index import MANIFEST, HashIndexProbe, build_hash_index

    d = str(tmp_path / "idx2")
    ds = ray.data.from_arrow(pa.table({"h": pa.array([1, 2, 3], pa.uint64())}))
    build_hash_index(ds, d, n_shards=2)
    os.remove(os.path.join(d, MANIFEST))  # simulate crash before commit
    with pytest.raises(FileNotFoundError):
        HashIndexProbe(d)
    # rebuild over the half-written dir self-heals (tmp+rename overwrite)
    build_hash_index(ds, d, n_shards=2)
    p = HashIndexProbe(d)
    out = p(pa.table({"h": pa.array([2, 9], pa.uint64())}))
    assert out["known"].to_pylist() == [1, 0]


def test_corpus_index_incremental_update(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from texrex_ray.state.corpus_index import (
        HashIndexProbe,
        build_hash_index,
        update_hash_index,
    )

    rng = np.random.default_rng(11)
    a = np.unique(rng.integers(0, 2**63, size=3000, dtype=np.uint64))
    b = np.unique(rng.integers(2**63, 2**64 - 1, size=2000, dtype=np.uint64))
    d = str(tmp_path / "idx")
    build_hash_index(ray.data.from_arrow(pa.table({"h": pa.array(a, pa.uint64())})), d, n_shards=8)
    m = update_hash_index(ray.data.from_arrow(pa.table({"h": pa.array(b, pa.uint64())})), d)
    assert m["n_hashes"].sum() == len(a) + len(b)  # disjoint ranges: pure union

    p = HashIndexProbe(d)
    both = np.concatenate([a[:50], b[:50]])
    out = p(pa.table({"h": pa.array(both, pa.uint64())}))
    assert all(out["known"].to_pylist())
    # idempotent: re-applying the same update changes nothing
    m2 = update_hash_index(
        ray.data.from_arrow(pa.table({"h": pa.array(b, pa.uint64())})), d
    )
    assert m2["n_hashes"].sum() == len(a) + len(b)
