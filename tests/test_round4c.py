"""Round-4 late-batch operators: OPIC importance and friends."""

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.ops.graph import opic_int, opic_sequential


def test_opic_matches_sequential(ray_session):
    rng = np.random.default_rng(11)
    nodes = [f"n{i}" for i in range(60)]
    edges = [
        (nodes[i], nodes[j])
        for i in range(60)
        for j in range(60)
        if i != j and rng.random() < 0.05
    ]
    # guarantee dangling nodes (appear only as dst) so the virtual-root
    # pot path is exercised
    edges += [(nodes[0], "sink_a"), (nodes[1], "sink_b")]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = opic_int(ds, rounds=4)
    want = opic_sequential(edges, rounds=4)
    assert dict(zip(got["page"], got["importance"])) == want


def test_opic_star_graph_analytic(ray_session):
    # hub -> k leaves: leaves are dangling, their cash cycles through the
    # virtual root.  Round algebra is small enough to check by hand for
    # rounds=1: C1(leaf) = scale//k + pot//n with pot = k*scale (leaves)
    # ... hub is NOT dangling, so pot = k*scale only if leaves held cash.
    k, scale = 4, 1_000_000
    edges = [("hub", f"leaf{i}") for i in range(k)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = opic_int(ds, rounds=1, scale=scale)
    n = k + 1
    pot = k * scale  # every leaf is dangling with C0 = scale
    c1_leaf = scale // k + pot // n
    c1_hub = pot // n
    want = {f"leaf{i}": scale + c1_leaf for i in range(k)}
    want["hub"] = scale + c1_hub
    assert dict(zip(got["page"], got["importance"])) == want


def test_opic_cash_conservation_bound(ray_session):
    # total importance <= (rounds+1) * n * scale (floor losses only shrink)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = opic_int(ds, rounds=5)
    n, scale = 4, 1_000_000
    total = int(got["importance"].sum())
    assert total <= 6 * n * scale
    assert total >= 5 * n * scale  # floors lose < n per division
