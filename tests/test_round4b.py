"""Round-4b operators: k-core peeling, BPE training, host-graph math."""

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.ops.graph import core_numbers, core_numbers_sequential


def test_core_numbers_matches_sequential(ray_session):
    rng = np.random.default_rng(13)
    nodes = [f"n{i}" for i in range(60)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(60)
        for j in range(60)
        if i != j and rng.random() < 0.07
    ]
    edges += edges[:8] + [(b, a) for a, b in edges[:8]]  # dups + reversed
    edges.append(("n0", "n0"))  # self loop ignored
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = core_numbers(ds, expected_edges=len(edges))
    core = core_numbers_sequential(edges)
    want = (
        pd.DataFrame(sorted(core.items()), columns=["node", "core"])
        .astype({"core": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_core_numbers_clique_plus_tail(ray_session):
    # K5 (core 4) with a pendant path (core 1)
    clique = [
        (f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)
    ]
    tail = [("k0", "t1"), ("t1", "t2")]
    ds = ray.data.from_items(
        [{"src": a, "dst": b} for a, b in clique + tail]
    )
    got = core_numbers(ds, expected_edges=12).set_index("node")["core"]
    assert (got.loc[[f"k{i}" for i in range(5)]] == 4).all()
    assert got.loc["t1"] == 1 and got.loc["t2"] == 1


def test_bpe_train_matches_sequential(ray_session):
    from collections import Counter

    from texrex_ray.functions.bpe import _TOKEN_RE, bpe_train, bpe_train_sequential

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "lower lowest newer newest wider widest",
        "lower lower lower newest newest",
    ] * 3
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(3)
    got = bpe_train(ds, n_merges=10)

    wc: Counter[str] = Counter()
    for t in texts:
        wc.update(_TOKEN_RE.findall(t.lower()))
    want_rows = bpe_train_sequential(dict(wc), 10)
    want = pd.DataFrame(
        [
            {"rank": i, "left": l, "right": r, "pair_count": n}
            for i, (l, r, n) in enumerate(want_rows)
        ]
    ).astype({"rank": "int64", "pair_count": "int64"})
    pd.testing.assert_frame_equal(got, want)
    # merges compound: some later merge must consume an earlier fusion
    fused = {l + r for l, r, _ in want_rows}
    assert any(l in fused or r in fused for l, r, _ in want_rows[1:])


def test_bpe_empty_corpus(ray_session):
    from texrex_ray.functions.bpe import bpe_train

    ds = ray.data.from_items([{"text": ""}, {"text": "   "}])
    out = bpe_train(ds, n_merges=4)
    assert out.empty
    assert list(out.columns) == ["rank", "left", "right", "pair_count"]


def test_hrw_minimal_disruption(ray_session):
    """HRW guarantee: growing the shard set moves keys ONLY onto the
    added shards — survivors never trade keys among themselves."""
    from texrex_ray.functions.hashing import md5_lower64

    keys = [f"http://h{i}.tld/p{j}" for i in range(20) for j in range(25)]
    shards16 = [f"s{i:02d}" for i in range(16)]
    shards20 = [f"s{i:02d}" for i in range(20)]

    def owner(shards, k):
        hs = md5_lower64([k + "|" + s for s in shards])
        return shards[int(np.argmax(hs))]

    moved_to = {
        owner(shards20, k)
        for k in keys
        if owner(shards16, k) != owner(shards20, k)
    }
    assert moved_to  # growth must move something
    assert moved_to <= set(shards20[16:])  # ...and only onto new shards
    # expected move fraction ≈ 4/20
    n_moved = sum(
        1 for k in keys if owner(shards16, k) != owner(shards20, k)
    )
    assert 0.10 < n_moved / len(keys) < 0.30


def test_neighborhood_function_matches_sequential(ray_session):
    from texrex_ray.ops.graph import (
        neighborhood_function,
        neighborhood_function_sequential,
    )

    rng = np.random.default_rng(21)
    nodes = [f"p{i}" for i in range(50)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(50)
        for j in range(50)
        if i != j and rng.random() < 0.05
    ]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = neighborhood_function(ds, t_max=6)
    want = pd.DataFrame(
        neighborhood_function_sequential(edges, 6), columns=["t", "nf_c"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_neighborhood_function_tracks_exact_reachability(ray_session):
    """On a directed chain the exact NF is known in closed form; the
    64-register sketch must stay within HLL error (~13%) of it."""
    from texrex_ray.ops.graph import neighborhood_function

    N = 30
    ds = ray.data.from_items(
        [{"src": f"c{i:02d}", "dst": f"c{i+1:02d}"} for i in range(N - 1)]
    )
    got = neighborhood_function(ds, t_max=4).set_index("t")["nf_c"]
    for t in range(5):
        exact = sum(min(t, N - 1 - i) + 1 for i in range(N))
        assert abs(got.loc[t] / 100 - exact) / exact < 0.15
