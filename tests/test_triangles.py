"""Triangle counting: oriented-wedge plan vs brute force."""

import itertools

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.ops.graph import triangle_counts


def _brute(edges: list[tuple[str, str]]) -> pd.DataFrame:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts: dict[str, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return pd.DataFrame(
        sorted(counts.items()), columns=["node", "n_triangles"]
    ).astype({"n_triangles": "int64"})


def test_triangle_counts_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    nodes = [f"n{i}" for i in range(40)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(40)
        for j in range(40)
        if i != j and rng.random() < 0.08
    ]
    # duplicate + reversed edges must collapse to one undirected edge
    edges += edges[:10] + [(b, a) for a, b in edges[:10]]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = triangle_counts(ds, expected_edges=len(edges))
    want = _brute(edges)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_triangle_counts_no_triangles(ray_session):
    # a path graph has zero triangles -> stable empty frame
    ds = ray.data.from_items(
        [{"src": f"p{i}", "dst": f"p{i+1}"} for i in range(20)]
    )
    got = triangle_counts(ds, expected_edges=20)
    assert got.empty and list(got.columns) == ["node", "n_triangles"]


def test_triangle_counts_self_loops_ignored(ray_session):
    ds = ray.data.from_items(
        [
            {"src": "a", "dst": "b"},
            {"src": "b", "dst": "c"},
            {"src": "c", "dst": "a"},
            {"src": "a", "dst": "a"},  # self loop
        ]
    )
    got = triangle_counts(ds, expected_edges=4)
    assert got["n_triangles"].tolist() == [1, 1, 1]
    assert got["node"].tolist() == ["a", "b", "c"]


# --------------------------------------------------------------------------
# HITS hubs & authorities: integer iteration vs a sequential recompute
# --------------------------------------------------------------------------


def _hits_brute(edges, iters=2, scale=1_000_000):
    nodes = sorted({n for e in edges for n in e})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = [scale] * n
    a = [0] * n

    def norm(raw):
        m = max(raw) if raw else 0
        if m <= 0:
            return [0] * len(raw)
        return [v * scale // m for v in raw]

    for _ in range(iters):
        raw = [0] * n
        for s, d in edges:
            raw[ix[d]] += h[ix[s]]
        a = norm(raw)
        raw = [0] * n
        for s, d in edges:
            raw[ix[s]] += a[ix[d]]
        h = norm(raw)
    return pd.DataFrame({"page": nodes, "hub_c": h, "auth_c": a}).astype(
        {"hub_c": "int64", "auth_c": "int64"}
    )


def test_hits_matches_bruteforce(ray_session):
    from texrex_ray.ops.graph import hits_int

    rng = np.random.default_rng(11)
    nodes = [f"p{i}" for i in range(30)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(30)
        for j in range(30)
        if i != j and rng.random() < 0.1
    ]
    edges += edges[:5]  # duplicate edges count twice (multiset semantics)
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = hits_int(ds, iters=2)
    want = _hits_brute(edges, iters=2)
    pd.testing.assert_frame_equal(got, want)


def test_hits_pure_hub_and_authority(ray_session):
    from texrex_ray.ops.graph import hits_int

    # star: h -> a1..a3; h is the only hub, a* are pure authorities
    ds = ray.data.from_items(
        [{"src": "h", "dst": f"a{i}"} for i in range(3)]
    )
    got = hits_int(ds, iters=2).set_index("page")
    assert got.loc["h", "hub_c"] == 1_000_000
    assert got.loc["h", "auth_c"] == 0
    assert (got.loc[["a0", "a1", "a2"], "auth_c"] == 1_000_000).all()
    assert (got.loc[["a0", "a1", "a2"], "hub_c"] == 0).all()


def test_hits_shuffle_plan_matches_broadcast(ray_session):
    """The distributed-score-state plan (shuffle_join + keyed sum per
    half-step, only the max scalar on the driver) must be bit-identical
    to the broadcast plan."""
    from texrex_ray.ops.graph import hits_int

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 400, 5_000
    srcs = [f"h{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    dsts = [f"h{int(i)}" for i in rng.integers(0, n_nodes + 30, n_edges)]
    ds = ray.data.from_items(
        [{"src": a, "dst": b} for a, b in zip(srcs, dsts)]
    ).repartition(4)
    a = hits_int(ds, iters=2)
    b = hits_int(ds, iters=2, plan="shuffle")
    pd.testing.assert_frame_equal(a, b)


def _ppr_brute(edges, seeds, iters=3, scale=1_000_000, damping_pm=850):
    nodes = sorted({n for e in edges for n in e})
    base = scale * (1000 - damping_pm) // 1000
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        total = {n: 0 for n in nodes}
        contrib = {n: rank[n] // deg[n] if deg[n] else 0 for n in nodes}
        for s, d in edges:
            total[d] += contrib[s]
        rank = {
            n: (base if n in seeds else 0) + damping_pm * total[n] // 1000
            for n in nodes
        }
    return (
        pd.DataFrame({"page": nodes, "rank": [rank[n] for n in nodes]})
        .sort_values(["rank", "page"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"rank": "int64"})
    )


def test_personalized_pagerank_matches_bruteforce_and_plans(ray_session):
    from texrex_ray.ops.graph import pagerank_int

    rng = np.random.default_rng(5)
    nodes = [f"p{i}" for i in range(60)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(60)
        for j in range(60)
        if i != j and rng.random() < 0.06
    ]
    seeds = {"p0", "p7", "p13"}
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = pagerank_int(ds, iters=3, seeds=seeds)
    want = _ppr_brute(edges, seeds, iters=3)
    pd.testing.assert_frame_equal(got, want)
    shuf = pagerank_int(ds, iters=3, seeds=seeds, plan="shuffle")
    pd.testing.assert_frame_equal(shuf, want)
    # mass flows FROM seeds: every page NOT reachable from the seed set
    # must end at exactly 0 (the reachable side may still floor to 0 in
    # integer arithmetic, so only the converse is an invariant)
    reach = set(seeds)
    frontier = set(seeds)
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    while frontier:
        frontier = {
            y for x in frontier for y in adj.get(x, ()) if y not in reach
        }
        reach |= frontier
    by_page = want.set_index("page")["rank"]
    unreachable = [p for p in by_page.index if p not in reach]
    assert len(unreachable) > 0  # the fixture graph must exercise this
    assert (by_page.loc[unreachable] == 0).all()
    assert (by_page.loc[sorted(seeds)] > 0).all()


def test_bfs_depths_matches_bruteforce(ray_session):
    from texrex_ray.ops.graph import bfs_depths

    rng = np.random.default_rng(9)
    nodes = [f"p{i}" for i in range(50)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(50)
        for j in range(50)
        if i != j and rng.random() < 0.05
    ]
    seeds = {"p0", "p3", "p99"}  # p99 is isolated (not in the graph)
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = bfs_depths(ds, seeds, max_depth=20)

    # brute BFS
    adj: dict[str, list] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    d = 0
    while frontier and d < 20:
        d += 1
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.add(v)
        frontier = nxt
    want = (
        pd.DataFrame(sorted(depth.items()), columns=["page", "depth"])
        .astype({"depth": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # isolated seed is present at depth 0
    assert got.set_index("page").loc["p99", "depth"] == 0


def test_bfs_depths_max_depth_truncates(ray_session):
    from texrex_ray.ops.graph import bfs_depths

    chain = [{"src": f"c{i}", "dst": f"c{i+1}"} for i in range(10)]
    ds = ray.data.from_items(chain)
    got = bfs_depths(ds, {"c0"}, max_depth=3)
    assert got["depth"].max() == 3 and len(got) == 4
