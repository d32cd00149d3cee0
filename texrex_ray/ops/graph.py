"""Integer-exact PageRank over an edge Dataset (crawl-graph ranking).

The crawl-side ranking op: given the link graph a crawl discovers,
rank pages/hosts for recrawl priority or seed scoring (the reference
ranks hosts only implicitly through degree-biased sampling,
trwalkers.pas; an explicit PageRank is what a production frontier
scheduler feeds on).

All arithmetic is scaled-integer so results are bit-identical across
engines and batch orders (the driver oracle recomputes the same
iterations in SQL):

    contrib(u)   = r_t(u) // out_deg(u)
    r_{t+1}(v)   = base + (damping_pm * Σ_{u→v} contrib(u)) // 1000
    base         = scale * (1000 - damping_pm) // 1000,  r_0 = scale

Execution shape: edges stream through ``map_batches`` (never
materialized on the driver); each iteration broadcasts the rank+degree
table once via ``ray.put`` and reduces per-batch (dst, partial-sum)
tables.  Driver state is NODE-sized (the rank vector), fine up to ~10⁷
nodes (a host graph); for page-scale graphs swap the broadcast for a
rank-table shuffle join (``ops/join.py``) keyed on src — the iteration
algebra is unchanged.  Dangling nodes (out-degree 0) contribute
nothing, the standard simplification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pagerank_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_pm: int = 850,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """(page, rank) for every node, after ``iters`` exact-integer steps."""
    # pin the edge list: the input lineage (e.g. crawl -> link extraction)
    # must not re-execute on every iteration pass (same reason as
    # dedup/clusters.py), and a nondeterministic lineage would otherwise
    # let the degree table and contribution passes see different edges
    edges = edges.materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[src].to_pylist()).value_counts()
        d = pd.unique(pd.Series(t[dst].to_pylist()))
        return pa.table(
            {
                "node": pa.array(list(s.index) + list(d), pa.string()),
                "d": pa.array(list(s.to_numpy()) + [0] * len(d), pa.int64()),
            }
        )

    degs = edges.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    deg = degs.groupby("node")["d"].sum()  # node-sized driver state (documented)
    nodes = deg.index.to_numpy()
    base = scale * (1000 - damping_pm) // 1000
    rank = pd.Series(scale, index=nodes, dtype=np.int64)

    for _ in range(iters):
        ref = ray.put((rank.to_dict(), deg.to_dict()))

        def contrib(t: pa.Table) -> pa.Table:
            r, dg = ray.get(ref)
            s = t[src].to_pylist()
            c = np.fromiter((r[u] // dg[u] for u in s), dtype=np.int64, count=len(s))
            g = pd.DataFrame({"dst": t[dst].to_pylist(), "c": c}).groupby(
                "dst", sort=False
            )["c"].sum()
            return pa.table(
                {
                    "dst": pa.array(g.index.tolist(), pa.string()),
                    "c": pa.array(g.to_numpy(), pa.int64()),
                }
            )

        parts = edges.map_batches(contrib, batch_format="pyarrow").to_pandas()
        sums = parts.groupby("dst")["c"].sum()
        rank = pd.Series(base, index=nodes, dtype=np.int64)
        got = sums.index.to_numpy()
        rank.loc[got] = base + (damping_pm * sums.to_numpy()) // 1000

    return pd.DataFrame({"page": nodes, "rank": rank.to_numpy()}).sort_values(
        ["rank", "page"], ascending=[False, True]
    ).reset_index(drop=True)
