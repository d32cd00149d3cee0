"""Shortest-path centralities over the crawl link graph.

Stress centrality (the INTEGER cousin of betweenness: the number of
shortest s->t paths passing through v, summed over all ordered pairs)
and harmonic closeness (sum of 1/d as PPM-scaled floor divisions) —
both exact in integer arithmetic so the DuckDB/fixture hash compare is
precision-safe, unlike float betweenness whose value depends on
summation order.

Distributed shape: the adjacency (CSR) is broadcast ONCE via ray.put
(node+edge-sized — the same plan as ops/graph.py::pagerank_int's rank
table; for page-scale graphs the documented swap is a bulk-synchronous
frontier exchange, level by level, keyed on node hash).  Sources fan
out as a Dataset of node ids; each map_batches task runs a
level-synchronous vectorized BFS per source (numpy gather/scatter, no
per-edge Python), emits per-node partial sums, and ONE node-keyed
groupby folds the partials.  Per-task memory is O(V) arrays, never
O(V^2).

Reference analogue: ClaraX's host-graph diagnostics consume degree and
reachability summaries (trwalkers.pas seed weighting); stress/harmonic
are the standard next diagnostics a crawl operator reads before
trusting hub sampling.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

PPM = 1_000_000


# --------------------------------------------------------------------------
# CSR construction
# --------------------------------------------------------------------------

def build_csr(edges: pd.DataFrame, src: str = "src", dst: str = "dst"):
    """Sorted-node CSR of the directed graph. Returns (nodes, indptr,
    indices); parallel edges are kept (they multiply path counts the
    same way on every twin, so the compare stays exact) — dedupe
    upstream if the semantics call for simple edges."""
    nodes = np.unique(
        np.concatenate([edges[src].to_numpy(), edges[dst].to_numpy()])
    )
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges[src].map(idx).to_numpy(dtype=np.int64)
    d = edges[dst].map(idx).to_numpy(dtype=np.int64)
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    indptr = np.zeros(len(nodes) + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    return nodes, indptr, d


def _gather_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated [start, start+count) ranges (small arrays only)."""
    if len(starts) == 0 or counts.sum() == 0:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(
        [np.arange(a, a + c, dtype=np.int64) for a, c in zip(starts, counts) if c]
    )


def _bfs_sigma(indptr, indices, n: int, s: int):
    """Level-synchronous BFS from s: distances, path counts, and the
    frontier list per level (vectorized neighbor gather per level)."""
    dist = np.full(n, -1, dtype=np.int32)
    sigma = np.zeros(n, dtype=np.int64)
    dist[s] = 0
    sigma[s] = 1
    frontier = np.array([s], dtype=np.int64)
    levels = [frontier]
    lvl = 0
    while frontier.size:
        starts = indptr[frontier]
        counts = indptr[frontier + 1] - starts
        gidx = _gather_ranges(starts, counts)
        if gidx.size == 0:
            break
        nb = indices[gidx]
        src_rep = np.repeat(frontier, counts)
        fresh = dist[nb] == -1
        if fresh.any():
            dist[np.unique(nb[fresh])] = lvl + 1
        nxt_mask = dist[nb] == lvl + 1
        np.add.at(sigma, nb[nxt_mask], sigma[src_rep[nxt_mask]])
        frontier = np.unique(nb[nxt_mask])
        if frontier.size:
            levels.append(frontier)
        lvl += 1
    return dist, sigma, levels


def _stress_from_source(indptr, indices, n: int, s: int, acc: np.ndarray):
    """Add source s's stress contributions sigma_sv * g(v) into acc,
    where g(v) = sum over BFS-DAG successors w of (1 + g(w))."""
    dist, sigma, levels = _bfs_sigma(indptr, indices, n, s)
    g = np.zeros(n, dtype=np.int64)
    for frontier in reversed(levels):
        starts = indptr[frontier]
        counts = indptr[frontier + 1] - starts
        gidx = _gather_ranges(starts, counts)
        if gidx.size == 0:
            continue
        nb = indices[gidx]
        src_rep = np.repeat(frontier, counts)
        succ = dist[nb] == dist[src_rep] + 1
        if succ.any():
            np.add.at(g, src_rep[succ], 1 + g[nb[succ]])
    contrib = sigma * g
    contrib[s] = 0
    acc += contrib


# --------------------------------------------------------------------------
# Distributed fan-outs
# --------------------------------------------------------------------------

def stress_centrality(edges: pd.DataFrame) -> pd.DataFrame:
    """Distributed stress centrality: per-source Brandes-style integer
    accumulation fanned out over a Dataset of source ids against the
    broadcast CSR; partials fold on one node-keyed groupby."""
    nodes, indptr, indices = build_csr(edges)
    n = len(nodes)
    ref = ray.put((indptr, indices))

    def batch_fn(t: pa.Table) -> pa.Table:
        ip, ix = ray.get(ref)
        acc = np.zeros(n, dtype=np.int64)
        for s in t["id"].to_numpy():
            _stress_from_source(ip, ix, n, int(s), acc)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "node_id": pa.array(nz, pa.int64()),
                "stress": pa.array(acc[nz], pa.int64()),
            }
        )

    parts = (
        ray.data.range(n)
        .map_batches(batch_fn, batch_format="pyarrow", batch_size=128)
        .groupby("node_id")
        .sum("stress")
        .to_pandas()
    )
    out = pd.DataFrame({"node": nodes, "stress": np.zeros(n, dtype=np.int64)})
    col = "sum(stress)" if "sum(stress)" in parts.columns else "stress"
    out.loc[parts["node_id"].to_numpy(), "stress"] = parts[col].to_numpy(
        dtype=np.int64
    )
    return out.sort_values("node").reset_index(drop=True)


def harmonic_centrality(edges: pd.DataFrame) -> pd.DataFrame:
    """Distributed harmonic closeness on out-distances: per source,
    sum(PPM // d(s, v)) over reached v != s, plus reach count and total
    distance — one row per source, no fold needed beyond the map."""
    nodes, indptr, indices = build_csr(edges)
    n = len(nodes)
    ref = ray.put((indptr, indices))

    def batch_fn(t: pa.Table) -> pa.Table:
        ip, ix = ray.get(ref)
        ids, harm, reach, sdist = [], [], [], []
        for s in t["id"].to_numpy():
            dist, _, _ = _bfs_sigma(ip, ix, n, int(s))
            d = dist[(dist > 0)]
            ids.append(int(s))
            harm.append(int((PPM // d.astype(np.int64)).sum()))
            reach.append(int(len(d)))
            sdist.append(int(d.astype(np.int64).sum()))
        return pa.table(
            {
                "node_id": pa.array(ids, pa.int64()),
                "harmonic_ppm": pa.array(harm, pa.int64()),
                "n_reached": pa.array(reach, pa.int64()),
                "sum_dist": pa.array(sdist, pa.int64()),
            }
        )

    parts = (
        ray.data.range(n)
        .map_batches(batch_fn, batch_format="pyarrow", batch_size=128)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    parts["node"] = nodes[parts["node_id"].to_numpy()]
    return parts[["node", "harmonic_ppm", "n_reached", "sum_dist"]]


# --------------------------------------------------------------------------
# Independent sequential twins (fixture generators / test oracles)
# --------------------------------------------------------------------------

def stress_matrix_twin(edges: pd.DataFrame) -> pd.DataFrame:
    """Stress by the PAIR identity sigma_st(v) = sigma_sv * sigma_vt
    when d(s,v) + d(v,t) = d(s,t) — matrix formulation, a genuinely
    different computation from the Brandes accumulation above."""
    nodes, indptr, indices = build_csr(edges)
    n = len(nodes)
    INF = np.int32(1 << 20)
    D = np.full((n, n), INF, dtype=np.int32)
    S = np.zeros((n, n), dtype=np.int64)
    for s in range(n):
        dist, sigma, _ = _bfs_sigma(indptr, indices, n, s)
        row = dist.astype(np.int32)
        row[row < 0] = INF
        D[s] = row
        S[s] = sigma
    stress = np.zeros(n, dtype=np.int64)
    for v in range(n):
        through = D[:, v][:, None] + D[v][None, :]
        on_sp = (through == D) & (D < INF)
        on_sp[v, :] = False
        on_sp[:, v] = False
        np.fill_diagonal(on_sp, False)
        contrib = S[:, v][:, None] * S[v][None, :]
        stress[v] = int(contrib[on_sp].sum())
    return (
        pd.DataFrame({"node": nodes, "stress": stress})
        .sort_values("node")
        .reset_index(drop=True)
    )


def harmonic_sequential_twin(edges: pd.DataFrame) -> pd.DataFrame:
    """Harmonic closeness via plain deque BFS (no numpy in the walk)."""
    nodes = sorted(
        set(edges["src"].tolist()) | set(edges["dst"].tolist())
    )
    adj: dict[str, list[str]] = {u: [] for u in nodes}
    for u, v in zip(edges["src"], edges["dst"]):
        adj[u].append(v)
    rows = []
    for s in nodes:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        ds = [d for v, d in dist.items() if v != s]
        rows.append(
            (
                s,
                sum(PPM // d for d in ds),
                len(ds),
                sum(ds),
            )
        )
    return pd.DataFrame(
        rows, columns=["node", "harmonic_ppm", "n_reached", "sum_dist"]
    )


def eccentricity(edges: pd.DataFrame) -> pd.DataFrame:
    """Distributed out-eccentricity: per source, the max BFS distance
    over reached nodes (0 when nothing is reached) plus the reach
    count — the radius/diameter diagnostic that bounds crawl frontier
    depth.  Same broadcast-CSR fan-out as harmonic_centrality."""
    nodes, indptr, indices = build_csr(edges)
    n = len(nodes)
    ref = ray.put((indptr, indices))

    def batch_fn(t: pa.Table) -> pa.Table:
        ip, ix = ray.get(ref)
        ids, ecc, reach = [], [], []
        for s in t["id"].to_numpy():
            dist, _, _ = _bfs_sigma(ip, ix, n, int(s))
            d = dist[dist > 0]
            ids.append(int(s))
            ecc.append(int(d.max()) if d.size else 0)
            reach.append(int(d.size))
        return pa.table(
            {
                "node_id": pa.array(ids, pa.int64()),
                "ecc": pa.array(ecc, pa.int64()),
                "n_reached": pa.array(reach, pa.int64()),
            }
        )

    parts = (
        ray.data.range(n)
        .map_batches(batch_fn, batch_format="pyarrow", batch_size=128)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    parts["node"] = nodes[parts["node_id"].to_numpy()]
    return parts[["node", "ecc", "n_reached"]]


def eccentricity_sequential_twin(edges: pd.DataFrame) -> pd.DataFrame:
    """Eccentricity via plain deque BFS (independent of the vectorized
    level-BFS)."""
    nodes = sorted(set(edges["src"].tolist()) | set(edges["dst"].tolist()))
    adj: dict[str, list[str]] = {u: [] for u in nodes}
    for u, v in zip(edges["src"], edges["dst"]):
        adj[u].append(v)
    rows = []
    for s in nodes:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        ds = [d for v, d in dist.items() if v != s]
        rows.append((s, max(ds) if ds else 0, len(ds)))
    return pd.DataFrame(rows, columns=["node", "ecc", "n_reached"])


def edge_stress(edges: pd.DataFrame) -> pd.DataFrame:
    """Distributed edge stress: number of shortest s->t paths crossing
    each edge, summed over all ordered pairs — the bridge-EDGE ranking
    (cut candidates) that complements node stress.  Per source, a DAG
    edge (u, w) carries sigma_su * (1 + g(w)); contributions accumulate
    per CSR position (parallel edges keep separate positions and are
    summed at the end), fanned out and folded exactly like
    stress_centrality."""
    nodes, indptr, indices = build_csr(edges)
    n = len(nodes)
    ref = ray.put((indptr, indices))

    def batch_fn(t: pa.Table) -> pa.Table:
        ip, ix = ray.get(ref)
        acc = np.zeros(len(ix), dtype=np.int64)
        for s in t["id"].to_numpy():
            dist, sigma, levels = _bfs_sigma(ip, ix, n, int(s))
            g = np.zeros(n, dtype=np.int64)
            for frontier in reversed(levels):
                starts = ip[frontier]
                counts = ip[frontier + 1] - starts
                gidx = _gather_ranges(starts, counts)
                if gidx.size == 0:
                    continue
                nb = ix[gidx]
                src_rep = np.repeat(frontier, counts)
                succ = dist[nb] == dist[src_rep] + 1
                if succ.any():
                    np.add.at(g, src_rep[succ], 1 + g[nb[succ]])
                    np.add.at(
                        acc, gidx[succ], sigma[src_rep[succ]] * (1 + g[nb[succ]])
                    )
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "pos": pa.array(nz, pa.int64()),
                "stress": pa.array(acc[nz], pa.int64()),
            }
        )

    parts = (
        ray.data.range(n)
        .map_batches(batch_fn, batch_format="pyarrow", batch_size=128)
        .groupby("pos")
        .sum("stress")
        .to_pandas()
    )
    col = "sum(stress)" if "sum(stress)" in parts.columns else "stress"
    acc = np.zeros(len(indices), dtype=np.int64)
    acc[parts["pos"].to_numpy(dtype=np.int64)] = parts[col].to_numpy(
        dtype=np.int64
    )
    pos_src = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(indptr)
    )
    out = (
        pd.DataFrame(
            {
                "src": nodes[pos_src],
                "dst": nodes[indices],
                "stress": acc,
            }
        )
        .groupby(["src", "dst"], as_index=False)["stress"]
        .sum()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    return out


def edge_stress_sequential_twin(edges: pd.DataFrame) -> pd.DataFrame:
    """Edge stress via classic predecessor-list Brandes (deque BFS,
    dict structures, reverse-order stack) — an independent
    implementation path from the vectorized level accumulation."""
    nodes = sorted(set(edges["src"].tolist()) | set(edges["dst"].tolist()))
    adj: dict[str, list[str]] = {u: [] for u in nodes}
    for u, v in zip(edges["src"], edges["dst"]):
        adj[u].append(v)
    acc: dict[tuple[str, str], int] = {}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1}
        preds: dict[str, list[str]] = {}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        g = {u: 0 for u in order}
        for w in reversed(order):
            # preds[w] holds one entry PER EDGE COPY (the BFS loop walks
            # every parallel edge), so no extra multiplicity factor here
            for u in preds.get(w, []):
                acc[(u, w)] = acc.get((u, w), 0) + sigma[u] * (1 + g[w])
                g[u] += 1 + g[w]
    rows = [(u, w, c) for (u, w), c in acc.items()]
    return (
        pd.DataFrame(rows, columns=["src", "dst", "stress"])
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
