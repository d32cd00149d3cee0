"""Round-4 batch XX2: max flow, bipartite matching, Selinger join order."""

import sys

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q310

def test_maxflow_known_and_ek_equals_dinic(ray_session):
    import random

    import ray.data

    from texrex_ray.ops.graph import maxflow_dinic, maxflow_int

    sys.setrecursionlimit(100_000)
    # two edge-disjoint s-t paths, third path reuses an edge
    edges = [("s", "a"), ("a", "t"), ("s", "b"), ("b", "t"),
             ("s", "c"), ("c", "a")]
    assert maxflow_dinic(edges, "s", "t") == 2
    # complete graph K5: edge connectivity between any pair = 4
    k5 = [(f"v{i}", f"v{j}") for i in range(5) for j in range(i + 1, 5)]
    assert maxflow_dinic(k5, "v0", "v4") == 4
    random.seed(33)
    for _ in range(10):
        nodes = [f"n{i}" for i in range(14)]
        edges = list({tuple(sorted(random.sample(nodes, 2)))
                      for _ in range(30)})
        ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
        assert maxflow_int(ds, "n0", "n9") == maxflow_dinic(edges, "n0", "n9")


def test_maxflow_query_matches_fixture(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q310_maxflow"](SF).iloc[0]
    fx = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/maxflow_fixture.parquet").iloc[0]
    assert got.to_dict() == fx.to_dict()
    # flow is bounded by the min of the two endpoint degrees
    e = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet")
    und = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
    und = und[und["src"] != und["dst"]].drop_duplicates()
    deg = und.groupby("src").size()
    assert int(fx["max_flow"]) <= min(deg[fx["s_node"]], deg[fx["t_node"]])


# ------------------------------------------------------------------- q311

def test_matching_known_cases(ray_session):
    from texrex_ray.ops.graph import hopcroft_karp, kuhn_matching

    # perfect matching exists
    assert hopcroft_karp([("a", "x"), ("b", "y"), ("c", "z")]) == 3
    # bottleneck: both a,b only reach x
    assert hopcroft_karp([("a", "x"), ("b", "x")]) == 1
    # augmenting-path case: a-x, b-x|y -> 2 (a takes x, b takes y)
    assert hopcroft_karp([("a", "x"), ("b", "x"), ("b", "y")]) == 2
    assert kuhn_matching([("a", "x"), ("b", "x"), ("b", "y")]) == 2
    assert hopcroft_karp([]) == 0


def test_matching_query_matches_twin(ray_session):
    from texrex_ray.ops.graph import kuhn_matching
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q311_bipartite_matching"](SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    pairs = sorted({(f"s{int(s)}", f"p{int(p)}")
                    for s, p in zip(li["l_suppkey"], li["l_partkey"])})
    sys.setrecursionlimit(max(10_000, 4 * len(pairs)))
    m = kuhn_matching(pairs)
    assert int(got["matching"]) == m
    assert int(got["n_edges"]) == len(pairs)
    # matching bounded by both side cardinalities (Koenig feasibility)
    assert m <= min(int(got["n_suppliers"]), int(got["n_parts"]))


# ------------------------------------------------------------------- q312

def test_selinger_query_matches_permutation_twin(ray_session):
    from itertools import permutations

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q312_selinger_join_order"](SF).iloc[0]
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    cdf = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    odf = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    odf2 = orders.merge(cdf, left_on="o_custkey", right_on="c_custkey")
    card = {
        frozenset("co"): len(odf),
        frozenset("ol"): len(li.merge(orders, left_on="l_orderkey",
                                      right_on="o_orderkey")),
        frozenset("cn"): len(cdf),
        frozenset("col"): len(li.merge(odf, left_on="l_orderkey",
                                       right_on="o_orderkey")),
        frozenset("con"): len(odf2),
        frozenset("coln"): len(li.merge(odf2, left_on="l_orderkey",
                                        right_on="o_orderkey")),
    }
    preds = {frozenset("co"), frozenset("ol"), frozenset("cn")}
    cands = []
    for perm in permutations("clno"):
        cur: set = set()
        ok = True
        cost = 0
        for t in perm:
            if cur and not any(frozenset((t, s)) in preds for s in cur):
                ok = False
                break
            cur.add(t)
            if len(cur) >= 2:
                cost += card[frozenset(cur)]
        if ok:
            cands.append((cost, "".join(perm)))
    best = min(cands)
    worst = max(cands)
    assert (got["best_order"], int(got["best_cost"])) == (best[1], best[0])
    assert (got["worst_order"], int(got["worst_cost"])) == (worst[1], worst[0])
    assert int(got["n_valid_orders"]) == len(cands) == 8
    # the DP must never beat the exhaustive minimum or lose to the max
    assert best[0] <= worst[0]
    # sanity: nation-first plan dominates lineitem-first (small before big)
    assert got["best_order"].index("n") < got["best_order"].index("l")
