"""Integer-exact PageRank over an edge Dataset (crawl-graph ranking).

The crawl-side ranking op: given the link graph a crawl discovers,
rank pages/hosts for recrawl priority or seed scoring (the reference
ranks hosts only implicitly through degree-biased sampling,
trwalkers.pas; an explicit PageRank is what a production frontier
scheduler feeds on).

All arithmetic is scaled-integer so results are bit-identical across
engines, batch orders and plans (the driver oracle recomputes the same
iterations in SQL):

    contrib(u)   = r_t(u) // out_deg(u)
    r_{t+1}(v)   = base + (damping_pm * Σ_{u→v} contrib(u)) // 1000
    base         = scale * (1000 - damping_pm) // 1000,  r_0 = scale

Two plans, identical results:

- ``plan="broadcast"`` (default): each iteration precomputes the
  node-sized contribution table ONCE on the driver (rank // deg) and
  broadcasts it via ``ray.put``; edge batches do one vectorized
  ``Series.map`` hash gather + grouped sum — no per-edge Python.
  Driver state is node-sized: fine up to ~10⁷ nodes (a host graph).
- ``plan="shuffle"``: rank state stays a DATASET; each iteration is a
  bucketed ``shuffle_join`` of edges with the rank table on src, a
  vectorized per-batch contrib pass, a ``bucketed_groupby`` sum per
  dst, and a left join back onto the node table — nothing node-sized
  ever lands on the driver until the final node-sized result.  The
  page-scale plan (2 exchanges per iteration).

Dangling nodes (out-degree 0) contribute nothing, the standard
simplification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _degrees(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    """(node, deg) for every node appearing as src or dst (deg = out-degree)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    def deg_partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[src].to_pandas()).value_counts()
        d = pd.unique(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {
                "node": pa.array(list(s.index) + list(d), pa.string()),
                "d": pa.array(list(s.to_numpy()) + [0] * len(d), pa.int64()),
            }
        )

    return bucketed_groupby(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        "node",
        lambda g: g.groupby("node", as_index=False)["d"].sum(),
    )


def pagerank_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_pm: int = 850,
    src: str = "src",
    dst: str = "dst",
    plan: str = "broadcast",
    seeds: set[str] | frozenset[str] | None = None,
    init_ranks: dict[str, int] | pd.DataFrame | ray.data.Dataset | None = None,
) -> pd.DataFrame:
    """(page, rank) for every node, after ``iters`` exact-integer steps.

    ``seeds`` switches on the PERSONALIZED variant (TrustRank, Gyöngyi
    et al. 2004 — spam-resistant frontier scoring from a trusted seed
    list): the teleport mass lands ONLY on seed nodes —
    ``r_0(v) = scale·[v∈S]``, ``base_v = base·[v∈S]`` — so rank flows
    outward from the seeds; pages unreachable from S stay at 0.  The
    seed set is crawl-config-sized (a curated list), broadcast once.

    ``init_ranks`` WARM-STARTS the iteration from a prior (page, rank)
    state — the checkpointed-rank-maintenance path between crawl
    rounds: running k iterations then ``init_ranks=`` the result for
    j more is bit-identical to k+j straight iterations over the same
    graph, so rank state can persist per round instead of recomputing
    from scratch.  Nodes absent from the prior state start at the
    cold-start value (``scale``, seed-masked when ``seeds`` is set).
    Accepts a dict / (page, rank) DataFrame (node-sized driver state —
    the broadcast plan's contract) or a Dataset (checkpoint table;
    the shuffle plan joins it in without driver materialization).
    """
    # pin the edge list: the input lineage (e.g. crawl -> link extraction)
    # must not re-execute on every iteration pass (same reason as
    # dedup/clusters.py), and a nondeterministic lineage would otherwise
    # let the degree table and contribution passes see different edges
    edges = edges.materialize()
    base = scale * (1000 - damping_pm) // 1000

    if plan == "shuffle":
        return _pagerank_shuffle(
            edges, iters=iters, scale=scale, damping_pm=damping_pm,
            base=base, src=src, dst=dst, seeds=seeds, init_ranks=init_ranks,
        )
    if plan != "broadcast":
        raise ValueError(f"unknown plan={plan!r}")

    degs = _degrees(edges, src, dst).to_pandas()
    deg = degs.set_index("node")["d"].sort_index()  # node-sized driver state
    nodes = deg.index.to_numpy()
    n = len(nodes)
    deg_arr = deg.to_numpy()

    # integer-encode the edge list ONCE (one vectorized hash gather per
    # batch); every iteration after this touches only int64 arrays —
    # zero-copy from Arrow, no per-iteration string materialization.
    # The encoded edges are narrower than the string edges, so the
    # materialization SHRINKS the working set.
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()
    if seeds is None:
        rank_arr = np.full(n, scale, dtype=np.int64)
        base_arr = np.full(n, base, dtype=np.int64)
    else:
        seed_mask = np.isin(nodes, np.array(sorted(seeds), dtype=object))
        rank_arr = np.where(seed_mask, np.int64(scale), np.int64(0))
        base_arr = np.where(seed_mask, np.int64(base), np.int64(0))
    if init_ranks is not None:
        init_map = _init_rank_map(init_ranks)
        rank_arr = np.array(
            [int(init_map.get(v, rank_arr[i])) for i, v in enumerate(nodes)],
            dtype=np.int64,
        )

    for _ in range(iters):
        # contribution per SOURCE node, computed once (r // deg, dense by
        # node code); edge batches do one fancy-index gather + bincount
        contrib_arr = np.zeros(n, dtype=np.int64)
        senders = deg_arr > 0
        contrib_arr[senders] = rank_arr[senders] // deg_arr[senders]
        ref = ray.put(contrib_arr)

        def contrib(t: pa.Table) -> pa.Table:
            ca = ray.get(ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            # float64 bincount of int weights is exact while a per-batch
            # per-dst sum stays < 2^53 — at scale=1e6 that allows 1e9
            # edges into one dst per batch, far past any block size
            sums = np.bincount(d, weights=ca[s])
            nz = np.flatnonzero(sums)
            return pa.table(
                {
                    "d": pa.array(nz.astype(np.int64)),
                    "c": pa.array(sums[nz].astype(np.int64)),
                }
            )

        parts = enc.map_batches(contrib, batch_format="pyarrow").to_pandas()
        total = np.zeros(n, dtype=np.int64)
        np.add.at(total, parts["d"].to_numpy(), parts["c"].to_numpy())
        rank_arr = base_arr + (damping_pm * total) // 1000

    return pd.DataFrame({"page": nodes, "rank": rank_arr}).sort_values(
        ["rank", "page"], ascending=[False, True]
    ).reset_index(drop=True)


def _init_rank_map(init_ranks) -> dict:
    """Normalize a warm-start state (dict / DataFrame / Dataset) to a
    page->rank dict.  Driver-side by design: callers on the broadcast
    plan already hold node-sized state; the shuffle plan never calls
    this for Dataset inputs."""
    if isinstance(init_ranks, dict):
        return init_ranks
    if isinstance(init_ranks, pd.DataFrame):
        return dict(zip(init_ranks["page"], init_ranks["rank"]))
    return dict(
        zip(*(lambda d: (d["page"], d["rank"]))(init_ranks.to_pandas()))
    )


def _pagerank_shuffle(
    edges: ray.data.Dataset,
    *,
    iters: int,
    scale: int,
    damping_pm: int,
    base: int,
    src: str,
    dst: str,
    seeds: set[str] | frozenset[str] | None = None,
    init_ranks=None,
) -> pd.DataFrame:
    """Distributed-rank-state plan: the rank table is a Dataset keyed by
    node and every iteration exchanges it with the edges via bucketed
    joins.  Per-dst sums pass through a float column in the left join
    (pandas NaN semantics); exact below 2^53 — rescale ``scale`` down for
    graphs whose inbound sums would exceed that.

    ``seeds`` = personalized teleport set (config-sized, broadcast once);
    init and base masks mirror the broadcast plan bit-for-bit.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.join import shuffle_join

    n_edges = edges.count()
    nodes_ds = _degrees(edges, src, dst).materialize()
    n_nodes = nodes_ds.count()
    seeds_ref = ray.put(frozenset(seeds) if seeds is not None else None)

    def init_rank(t: pa.Table) -> pa.Table:
        s = ray.get(seeds_ref)
        if s is None:
            r = np.full(t.num_rows, scale, np.int64)
        else:
            mask = np.array([v in s for v in t["node"].to_pylist()])
            r = np.where(mask, np.int64(scale), np.int64(0))
        return t.append_column("rank", pa.array(r))

    rank_ds = nodes_ds.map_batches(init_rank, batch_format="pyarrow")

    if init_ranks is not None:
        # warm start: join the prior (page, rank) state onto the node
        # table; nodes absent from the prior keep the cold-start value.
        # A Dataset prior joins WITHOUT driver materialization (the
        # checkpoint table stays distributed); small priors ship as one.
        from texrex_ray.ops.join import shuffle_join

        if isinstance(init_ranks, ray.data.Dataset):
            prior_ds = init_ranks.select_columns(["page", "rank"])
        else:
            pm = _init_rank_map(init_ranks)
            prior_ds = ray.data.from_arrow(
                pa.table(
                    {
                        "page": pa.array(list(pm.keys()), pa.string()),
                        "rank": pa.array(
                            [int(v) for v in pm.values()], pa.int64()
                        ),
                    }
                )
            )
        prior_ds = prior_ds.map_batches(
            lambda t: t.rename_columns(["node", "prio_r"]),
            batch_format="pyarrow",
        )
        joined0 = shuffle_join(
            rank_ds, prior_ds, on="node", how="left", expected_rows=n_nodes
        )

        def pick_init(df: pd.DataFrame) -> pd.DataFrame:
            warm = df["prio_r"].to_numpy(dtype="float64")
            cold = df["rank"].to_numpy(dtype=np.int64)
            r = np.where(np.isnan(warm), cold, warm).astype(np.int64)
            return pd.DataFrame({"node": df["node"], "d": df["d"], "rank": r})

        rank_ds = joined0.map_batches(pick_init, batch_format="pandas")

    rank_ds = rank_ds.materialize()

    for _ in range(iters):
        joined = shuffle_join(
            edges.select_columns([src, dst]),
            rank_ds.filter(expr="d > 0"),
            on=src,
            right_on="node",
            how="inner",
            expected_rows=n_edges,
        )

        def contrib_rows(df: pd.DataFrame) -> pd.DataFrame:
            c = df["rank"].to_numpy(dtype=np.int64) // df["d"].to_numpy(dtype=np.int64)
            return (
                pd.DataFrame({"dst": df[dst], "c": c})
                .groupby("dst", sort=False, as_index=False)["c"]
                .sum()
            )

        sums = bucketed_groupby(
            joined.map_batches(contrib_rows, batch_format="pandas"),
            "dst",
            lambda g: g.groupby("dst", as_index=False)["c"].sum(),
            expected_rows=n_nodes,
        )
        nxt = shuffle_join(
            nodes_ds,
            sums,
            on="node",
            right_on="dst",
            how="left",
            expected_rows=n_nodes,
        )

        def upd(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(seeds_ref)
            c = df["c"].fillna(0).to_numpy(dtype=np.int64)
            if s is None:
                b = np.full(len(df), base, np.int64)
            else:
                mask = df["node"].isin(s).to_numpy()
                b = np.where(mask, np.int64(base), np.int64(0))
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "d": df["d"].to_numpy(dtype=np.int64),
                    "rank": b + (damping_pm * c) // 1000,
                }
            )

        rank_ds = nxt.map_batches(upd, batch_format="pandas").materialize()

    out = rank_ds.to_pandas()  # node-sized final result only
    return (
        out.rename(columns={"node": "page"})[["page", "rank"]]
        .sort_values(["rank", "page"], ascending=[False, True])
        .reset_index(drop=True)
    )


def opic_int(
    edges: ray.data.Dataset,
    *,
    rounds: int = 3,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """OPIC on-line page importance (Abiteboul, Preda & Cobéna, WWW 2003)
    — the frontier-priority signal a crawler can maintain INCREMENTALLY,
    without waiting for PageRank convergence: each page holds ``cash``;
    every round each page distributes its cash equally to its
    out-neighbors (dangling pages pay a virtual root that redistributes
    ``pot // n`` to everyone in the same round) and banks the round's
    opening balance into ``history``.  Importance after T rounds is
    ``history + cash`` (total cash is conserved, so importances stay
    bounded by ``(T+1)·n·scale``).

    Synchronous-rounds variant, integer-exact (``//`` floors) so the
    distributed run is bit-identical to the SQL oracle's unrolled CTEs:

        C_{t+1}(v) = Σ_{u→v} C_t(u)//deg(u)  +  (Σ_{deg(u)=0} C_t(u))//n
        H_{t+1}(v) = H_t(v) + C_t(v),   C_0 = scale, H_0 = 0

    Distribution = the pagerank_int broadcast contract: edges
    int-encoded once (the encoded table is NARROWER than the strings),
    one node-sized cash vector broadcast per round, each edge batch
    does a fancy-index gather + bincount — no per-edge Python, driver
    state strictly node-sized.  For page-scale graphs the same
    shuffle-plan swap as ``pagerank_int(plan="shuffle")`` applies
    (cash stays a Dataset; one bucketed join + keyed sum per round).
    """
    edges = edges.materialize()  # pin lineage across the round passes
    degs = _degrees(edges, src, dst).to_pandas()
    deg = degs.set_index("node")["d"].sort_index()
    nodes = deg.index.to_numpy()
    n = len(nodes)
    deg_arr = deg.to_numpy()
    if n == 0:
        return pd.DataFrame({"page": [], "importance": []}).astype(
            {"page": "object", "importance": "int64"}
        )

    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()
    cash = np.full(n, scale, dtype=np.int64)
    hist = np.zeros(n, dtype=np.int64)
    senders = deg_arr > 0

    for _ in range(rounds):
        contrib_arr = np.zeros(n, dtype=np.int64)
        contrib_arr[senders] = cash[senders] // deg_arr[senders]
        pot = int(cash[~senders].sum())  # dangling cash -> virtual root
        ref = ray.put(contrib_arr)

        def paid(t: pa.Table) -> pa.Table:
            ca = ray.get(ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            # exact while per-batch per-dst sums < 2^53 (see pagerank_int)
            sums = np.bincount(d, weights=ca[s])
            nz = np.flatnonzero(sums)
            return pa.table(
                {
                    "d": pa.array(nz.astype(np.int64)),
                    "c": pa.array(sums[nz].astype(np.int64)),
                }
            )

        parts = enc.map_batches(paid, batch_format="pyarrow").to_pandas()
        total = np.zeros(n, dtype=np.int64)
        np.add.at(total, parts["d"].to_numpy(), parts["c"].to_numpy())
        hist += cash
        cash = total + pot // n

    return (
        pd.DataFrame({"page": nodes, "importance": hist + cash})
        .sort_values(["importance", "page"], ascending=[False, True])
        .reset_index(drop=True)
    )


def ppr_push_int(
    edges: ray.data.Dataset,
    seed: str,
    *,
    alpha_pm: int = 150,
    eps_ppm: int = 100,
    scale: int = 1_000_000,
    max_rounds: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Local-cluster personalized PageRank by SYNCHRONOUS push sweeps
    (Andersen, Chung & Lang 2006, batched Jacobi-style): mass starts on
    one seed page and pushes outward only where residual is large, so
    the work — and the non-zero support — stays proportional to the
    seed's NEIGHBORHOOD, not the graph.  The crawl use: carve the local
    community around a known-good (or known-spam) page without ranking
    the whole web.

    Undirected semantics (edges canonicalized both ways, self-loops
    dropped).  Integer algebra, all floors, bit-identical to the
    sequential twin:

        active u:  r(u)·10⁶ >= eps_ppm·scale·deg(u)
        push:      p(u) += α·r(u)//1000 ;  rem = r(u) − α·r(u)//1000
                   stay = rem//2 ;  share = (rem − stay)//deg(u)
        r'(u) = stay (+ incoming shares);  inactive nodes keep r.

    Distribution = the opic/pagerank broadcast contract: one node-sized
    share vector per round, edge batches gather+bincount; rounds stop
    when no node is active (≤ ``max_rounds``).  Returns non-zero
    (page, p, r) sorted by p desc, page asc.
    """
    edges = edges.materialize()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].astype(str)
        b = df[dst].astype(str)
        keep = a != b
        out = pd.DataFrame(
            {
                "u": pd.concat([a[keep], b[keep]], ignore_index=True),
                "v": pd.concat([b[keep], a[keep]], ignore_index=True),
            }
        )
        return out.drop_duplicates()

    und = edges.map_batches(canon, batch_format="pandas")
    from texrex_ray.ops.aggregate import bucketed_groupby

    # cross-batch duplicate edges must collapse once, globally
    und = bucketed_groupby(
        und, ["u", "v"], lambda g: g.drop_duplicates(["u", "v"])
    ).materialize()

    deg_df = bucketed_groupby(
        und.map_batches(
            lambda df: df.groupby("u", as_index=False).size(),
            batch_format="pandas",
        ),
        "u",
        lambda g: g.groupby("u", as_index=False)["size"].sum(),
    ).to_pandas()
    deg = deg_df.set_index("u")["size"].sort_index()
    nodes = deg.index.to_numpy()
    if seed not in set(nodes):
        # isolated or unknown seed: all mass absorbs at the seed
        return pd.DataFrame(
            {"page": [seed], "p": [scale], "r": [0]}
        ).astype({"p": "int64", "r": "int64"})
    n = len(nodes)
    deg_arr = deg.to_numpy().astype(np.int64)
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ix = ray.get(idx_ref)
        return pd.DataFrame(
            {
                "s": ix.get_indexer(df["u"]).astype(np.int64),
                "d": ix.get_indexer(df["v"]).astype(np.int64),
            }
        )

    enc = und.map_batches(encode, batch_format="pandas").materialize()
    r = np.zeros(n, dtype=np.int64)
    p = np.zeros(n, dtype=np.int64)
    r[node_index.get_loc(seed)] = scale

    for _ in range(max_rounds):
        # int64-safe: r <= scale (mass conserved) so r·10⁶ <= 10¹²,
        # and eps_ppm·scale·deg <= 10⁸·deg — far from 2⁶³
        active = (r * 1_000_000) >= (eps_ppm * scale) * deg_arr
        if not active.any():
            break
        push_r = np.where(active, r, 0)
        p = p + alpha_pm * push_r // 1000
        rem = push_r - alpha_pm * push_r // 1000
        stay = rem // 2
        share = np.zeros(n, dtype=np.int64)
        share[active] = (rem[active] - stay[active]) // deg_arr[active]
        ref = ray.put(share)

        def flow(df: pd.DataFrame) -> pd.DataFrame:
            sh = ray.get(ref)
            s = df["s"].to_numpy()
            d = df["d"].to_numpy()
            sums = np.bincount(d, weights=sh[s])
            nz = np.flatnonzero(sums)
            return pd.DataFrame({"d": nz.astype(np.int64), "c": sums[nz].astype(np.int64)})

        parts = enc.map_batches(flow, batch_format="pandas").to_pandas()
        inc = np.zeros(n, dtype=np.int64)
        if len(parts):
            np.add.at(inc, parts["d"].to_numpy(), parts["c"].to_numpy())
        r = np.where(active, stay, r) + inc

    keep = (p > 0) | (r > 0)
    out = pd.DataFrame({"page": nodes[keep], "p": p[keep], "r": r[keep]})
    return out.sort_values(["p", "page"], ascending=[False, True]).reset_index(
        drop=True
    )


def ppr_push_sequential(
    edges: list[tuple[str, str]],
    seed: str,
    *,
    alpha_pm: int = 150,
    eps_ppm: int = 100,
    scale: int = 1_000_000,
    max_rounds: int = 30,
) -> dict[str, tuple[int, int]]:
    """Independent per-edge sequential twin of ``ppr_push_int`` (test /
    fixture oracle): page -> (p, r) for non-zero pages."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if seed not in adj:
        return {seed: (scale, 0)}
    nodes = sorted(adj)
    r = {v: 0 for v in nodes}
    p = {v: 0 for v in nodes}
    r[seed] = scale
    for _ in range(max_rounds):
        active = [
            u
            for u in nodes
            if r[u] * 1_000_000 >= eps_ppm * scale * len(adj[u])
        ]
        if not active:
            break
        inc = {v: 0 for v in nodes}
        stays = {}
        for u in active:
            p[u] += alpha_pm * r[u] // 1000
            rem = r[u] - alpha_pm * r[u] // 1000
            stay = rem // 2
            share = (rem - stay) // len(adj[u])
            stays[u] = stay
            for v in adj[u]:
                inc[v] += share
        for u in nodes:
            base = stays[u] if u in stays else r[u]
            r[u] = base + inc[u]
    return {
        v: (p[v], r[v]) for v in nodes if p[v] > 0 or r[v] > 0
    }


def greedy_seed_cover(
    edges: ray.data.Dataset,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Greedy maximum-coverage seed selection: pick ``k`` source pages,
    each round the one whose OUT-NEIGHBORS add the most not-yet-covered
    pages (ties to the smaller src).  The classic (1-1/e)-approximate
    seed-list constructor — which k entry pages reach the most of the
    web in one hop — and the submodular-greedy pattern that generalizes
    to influence maximization.

    Distribution: k rounds; each round broadcasts the covered set
    (bounded by the picked seeds' total out-degree, k·max_deg — seed
    lists are small) and one edge pass emits per-src uncovered-count
    partials (src-bounded); the driver argmax is one row.  Dedup of
    (src, dst) multi-edges happens inside the count (nunique).

    Returns (rank, seed, n_new) — n_new = pages newly covered.
    """
    edges = edges.materialize()

    picks: list[dict] = []
    covered: set[str] = set()
    for rank in range(k):
        cov_ref = ray.put(covered)

        def gain_partial(df: pd.DataFrame) -> pd.DataFrame:
            cov = ray.get(cov_ref)
            d = df[[src, dst]].drop_duplicates()
            d = d[~d[dst].isin(cov)]
            if d.empty:  # an all-covered batch loses its groupby columns
                return pd.DataFrame({"s": pd.Series([], dtype="object"),
                                     "cands": pd.Series([], dtype="object")})
            g = d.groupby(src, as_index=False)[dst].agg(lambda s: set(s))
            return pd.DataFrame({"s": g[src], "cands": g[dst].map(sorted)})

        # per-batch partial neighbor SETS (uncovered only), merged per src
        # in one bucketed exchange — multi-edges and cross-batch dups
        # collapse in the set union
        from texrex_ray.ops.aggregate import bucketed_groupby

        def merge_sets(g: pd.DataFrame) -> pd.DataFrame:
            out = (
                g.groupby("s")["cands"]
                .agg(lambda lists: len({x for lst in lists for x in lst}))
                .rename("gain")
                .reset_index()
            )
            return out

        gains = bucketed_groupby(
            edges.map_batches(gain_partial, batch_format="pandas"),
            "s",
            merge_sets,
        ).to_pandas()
        gains = gains[gains["gain"] > 0]
        if gains.empty:
            break
        gains = gains.sort_values(["gain", "s"], ascending=[False, True])
        best = str(gains.iloc[0]["s"])

        # fetch the winner's uncovered neighbors (one filtered edge pass)
        best_ref = ray.put((best, covered))

        def neigh(df: pd.DataFrame) -> pd.DataFrame:
            b, cov = ray.get(best_ref)
            d = df[df[src] == b]
            return pd.DataFrame({"v": d[dst][~d[dst].isin(cov)].unique()})

        new = set(
            edges.map_batches(neigh, batch_format="pandas").to_pandas()["v"]
        )
        picks.append({"rank": rank, "seed": best, "n_new": len(new)})
        covered |= new

    out = pd.DataFrame(picks, columns=["rank", "seed", "n_new"])
    for c in ("rank", "n_new"):
        out[c] = out[c].astype("int64")
    return out


def greedy_seed_cover_sequential(
    edges: list[tuple[str, str]], k: int
) -> list[tuple[int, str, int]]:
    """Independent dict-based twin of ``greedy_seed_cover``."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    covered: set[str] = set()
    out = []
    for rank in range(k):
        best, best_gain = None, 0
        for s in sorted(adj):
            gain = len(adj[s] - covered)
            if gain > best_gain:
                best, best_gain = s, gain
        if best is None:
            break
        new = adj[best] - covered
        out.append((rank, best, len(new)))
        covered |= new
    return out


def opic_sequential(
    edges: list[tuple[str, str]], *, rounds: int = 3, scale: int = 1_000_000
) -> dict[str, int]:
    """Independent per-edge sequential twin of ``opic_int`` (test oracle)."""
    nodes = sorted({x for e in edges for x in e})
    out_adj: dict[str, list[str]] = {v: [] for v in nodes}
    for a, b in edges:
        out_adj[a].append(b)
    n = len(nodes)
    cash = {v: scale for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(rounds):
        nxt = {v: 0 for v in nodes}
        pot = 0
        for u in nodes:
            if out_adj[u]:
                share = cash[u] // len(out_adj[u])
                for v in out_adj[u]:
                    nxt[v] += share
            else:
                pot += cash[u]
        for v in nodes:
            hist[v] += cash[v]
            cash[v] = nxt[v] + pot // n
    return {v: hist[v] + cash[v] for v in nodes}


def _max_norm(raw: np.ndarray, scale: int, m: int | None = None) -> np.ndarray:
    """``raw * scale // max(raw)``, exact at any magnitude.

    Vectorized divmod split while ``max < 2^43`` (``(raw % m) * scale``
    stays < 2^63 at scale=1e6); object-dtype Python ints above — exact,
    node-sized driver cost.  ``m`` lets distributed callers pass the
    GLOBAL max so per-batch normalization stays bit-identical.
    """
    if m is None:
        m = int(raw.max()) if len(raw) else 0
    if m <= 0:
        return np.zeros_like(raw)
    if m < (1 << 43):
        q, r = np.divmod(raw, m)
        return q * scale + (r * scale) // m
    obj = raw.astype(object)
    return np.array([int(v) * scale // m for v in obj], dtype=object)


def hits_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 2,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    plan: str = "broadcast",
) -> pd.DataFrame:
    """Integer-exact HITS hubs & authorities (Kleinberg 1999) over an
    edge Dataset — the other classic link-analysis score a frontier
    scheduler feeds on (PageRank finds endorsed pages; HITS separates
    directories/link hubs from content authorities, which is what a
    harvest crawl prioritizing *image-bearing* pages wants).

    Max-normalized integer iteration, bit-identical across engines and
    plans (the oracle unrolls the same steps in SQL):

        a_t(v) = (Σ_{u→v} h_{t-1}(u)) * scale // max_v Σ h
        h_t(u) = (Σ_{u→v} a_t(v))     * scale // max_u Σ a
        h_0    = scale everywhere

    Sums are over the edge MULTISET (duplicate edges count twice, like
    ``pagerank_int``).  Distribution contract = the pagerank
    ``plan="broadcast"`` shape: edges are integer-encoded ONCE, each
    half-iteration broadcasts the node-sized score vector via
    ``ray.put`` and edge batches do one fancy-index gather + float64
    ``bincount`` (exact while a per-batch per-node sum < 2^53, i.e.
    ~1e9 same-target edges per batch at scale=1e6).  Driver state is
    node-sized — the ≤1e7-node regime; ``plan="shuffle"`` keeps the
    score table a DATASET (bucketed join + keyed sum per half-step,
    only the global max — one scalar — touches the driver), the
    page-scale path, bit-identical results.

    The normalization multiply ``raw * scale`` is computed with a
    divmod split while ``max_raw < 2^43`` (vectorized int64-safe) and
    falls back to object-dtype Python ints above (exact, node-sized
    driver cost).
    """
    if iters < 1:
        raise ValueError("hits_int requires iters >= 1")
    edges = edges.materialize()  # one lineage execution for encode+iters
    if plan == "shuffle":
        return _hits_shuffle(edges, iters=iters, scale=scale, src=src, dst=dst)
    if plan != "broadcast":
        raise ValueError(f"unknown plan={plan!r}")

    # node universe + integer encoding, once (pagerank encode contract)
    def node_partial(t: pa.Table) -> pa.Table:
        vals = pd.unique(
            pd.concat(
                [pd.Series(t[src].to_pandas()), pd.Series(t[dst].to_pandas())]
            )
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    nodes = np.sort(
        pd.unique(
            edges.map_batches(node_partial, batch_format="pyarrow")
            .to_pandas()["node"]
        )
    )
    n = len(nodes)
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()

    def _push(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """Σ over edges of vec[from] grouped by to — one broadcast pass."""
        ref = ray.put(np.asarray(vec, dtype=np.int64))

        def part(t: pa.Table) -> pa.Table:
            v = ray.get(ref)
            f = t[from_col].to_numpy(zero_copy_only=False)
            g = t[to_col].to_numpy(zero_copy_only=False)
            sums = np.bincount(g, weights=v[f].astype(np.float64))
            nz = np.flatnonzero(sums)
            return pa.table(
                {
                    "i": pa.array(nz.astype(np.int64)),
                    "c": pa.array(sums[nz].astype(np.int64)),
                }
            )

        parts = enc.map_batches(part, batch_format="pyarrow").to_pandas()
        total = np.zeros(n, dtype=np.int64)
        np.add.at(total, parts["i"].to_numpy(), parts["c"].to_numpy())
        return total

    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a = _max_norm(_push(h, "s", "d"), scale)  # authorities gather hub mass
        h = _max_norm(_push(a, "d", "s"), scale)  # hubs gather authority mass

    return pd.DataFrame(
        {
            "page": nodes,
            "hub_c": np.asarray(h, dtype=np.int64),
            "auth_c": np.asarray(a, dtype=np.int64),
        }
    ).sort_values("page").reset_index(drop=True)


def bfs_depths(
    edges: ray.data.Dataset,
    seeds: set[str] | frozenset[str],
    *,
    max_depth: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Min-hop distance from a seed set along directed edges — the
    crawl-depth map (depth-scoped crawling, seed-proximity scoring;
    ClaraX bounds walks by steps, a production frontier bounds them by
    DEPTH, which needs exactly this).

    Broadcast-frontier rounds (the CC / pagerank plan="broadcast"
    contract): the node-sized depth vector lives on the driver; each
    round broadcasts the CURRENT frontier's codes via ``ray.put`` and
    one edge pass emits the distinct dst codes reached (per-batch
    ``np.unique`` partials — result-bounded, never edge-sized).
    Terminates at the first empty frontier or ``max_depth``, i.e. ≤
    diameter rounds.  Page-scale graphs swap the broadcast for the
    keyed-join treatment as in ``_pagerank_shuffle``; the iteration
    algebra is identical.

    Returns (page, depth) for every node reachable within
    ``max_depth`` (seeds at depth 0 — included even if isolated),
    sorted by page.
    """
    edges = edges.materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        vals = pd.unique(
            pd.concat(
                [pd.Series(t[src].to_pandas()), pd.Series(t[dst].to_pandas())]
            )
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    graph_nodes = pd.unique(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .to_pandas()["node"]
    )
    nodes = np.sort(
        pd.unique(
            np.concatenate(
                [graph_nodes, np.array(sorted(seeds), dtype=object)]
            )
        )
    )
    n = len(nodes)
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()

    depth = np.full(n, -1, dtype=np.int64)
    depth[node_index.get_indexer(pd.Index(sorted(seeds)))] = 0
    frontier = np.flatnonzero(depth == 0)

    for round_no in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        mask = np.zeros(n, dtype=bool)
        mask[frontier] = True
        ref = ray.put(mask)

        def reached(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            return pa.table({"d": pa.array(np.unique(d[m[s]]))})

        hit = enc.map_batches(reached, batch_format="pyarrow").to_pandas()
        cand = pd.unique(hit["d"]) if len(hit) else np.array([], np.int64)
        new = cand[depth[cand] < 0] if len(cand) else cand
        depth[new] = round_no
        frontier = new

    keep = depth >= 0
    return pd.DataFrame(
        {"page": nodes[keep], "depth": depth[keep]}
    ).sort_values("page").reset_index(drop=True)


def _hits_shuffle(
    edges: ray.data.Dataset,
    *,
    iters: int,
    scale: int,
    src: str,
    dst: str,
) -> pd.DataFrame:
    """Distributed-score-state HITS: hub/authority tables stay Datasets;
    each half-step is one bucketed ``shuffle_join`` (edges ⋈ scores on
    the from-side), one keyed sum, and one left join back onto the node
    table.  Only the normalization max — a single scalar — reaches the
    driver per half-step; the node-sized result lands once at the end.
    Score sums cross the left join as float64 (pandas NaN semantics):
    exact below 2^53, i.e. ~9e9 nodes at scale=1e6 — rescale down past
    that.  Bit-identical to ``plan="broadcast"``.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.join import shuffle_join

    n_edges = edges.count()

    def node_partial(t: pa.Table) -> pa.Table:
        vals = pd.unique(
            pd.concat(
                [pd.Series(t[src].to_pandas()), pd.Series(t[dst].to_pandas())]
            )
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    nodes_ds = bucketed_groupby(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        "node",
        lambda g: g.drop_duplicates("node"),
        expected_rows=n_edges,
    ).materialize()
    n_nodes = nodes_ds.count()

    def init_scale(t: pa.Table) -> pa.Table:
        return t.append_column(
            "v", pa.array(np.full(t.num_rows, scale, np.int64))
        )

    h_ds = nodes_ds.map_batches(init_scale, batch_format="pyarrow").materialize()

    def norm_push(score_ds, from_col: str, to_col: str):
        joined = shuffle_join(
            edges.select_columns([src, dst]),
            score_ds,
            on=from_col,
            right_on="node",
            how="inner",
            expected_rows=n_edges,
        )

        def part(df: pd.DataFrame) -> pd.DataFrame:
            return (
                pd.DataFrame(
                    {"nd": df[to_col], "c": df["v"].to_numpy(np.int64)}
                )
                .groupby("nd", sort=False, as_index=False)["c"]
                .sum()
            )

        sums = bucketed_groupby(
            joined.map_batches(part, batch_format="pandas"),
            "nd",
            lambda g: g.groupby("nd", as_index=False)["c"].sum(),
            expected_rows=n_nodes,
        ).materialize()
        m = int(sums.max("c")) if sums.count() else 0  # ONE driver scalar

        back = shuffle_join(
            nodes_ds, sums, on="node", right_on="nd", how="left",
            expected_rows=n_nodes,
        )

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            raw = df["c"].fillna(0).to_numpy(dtype=np.int64)
            v = np.asarray(_max_norm(raw, scale, m), dtype=np.int64)
            return pd.DataFrame({"node": df["node"], "v": v})

        return back.map_batches(norm, batch_format="pandas").materialize()

    a_ds = None
    for _ in range(iters):
        a_ds = norm_push(h_ds, src, dst)  # authorities gather hub mass
        h_ds = norm_push(a_ds, dst, src)  # hubs gather authority mass

    hub = h_ds.to_pandas().rename(columns={"v": "hub_c"})  # node-sized
    auth = a_ds.to_pandas().rename(columns={"v": "auth_c"})
    out = hub.merge(auth, on="node").rename(columns={"node": "page"})
    out["hub_c"] = out["hub_c"].astype("int64")
    out["auth_c"] = out["auth_c"].astype("int64")
    return (
        out[["page", "hub_c", "auth_c"]]
        .sort_values("page")
        .reset_index(drop=True)
    )


def core_numbers(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    expected_edges: int | None = None,
) -> pd.DataFrame:
    """Per-node k-core number of the UNDIRECTED simple graph — the
    density-peeling statistic (link-farm cores are high-k; pages that
    survive k-core pruning anchor the crawl's authority structure).

    Matula–Beck peeling lifted to broadcast rounds: dedup to canonical
    undirected edges (one hash-keyed exchange, triangle_counts' step),
    integer-encode once; the driver holds the node-sized alive/degree
    vectors and each round broadcasts the victim mask — ONE edge pass
    returns per-node counts of edges lost to victims (``bincount``
    partials, result-bounded).  Rounds = peeling depth (≤ degeneracy
    levels, typically O(√m) rounds on web graphs).  Self-loops are
    ignored; duplicate/reversed edges collapse.

    Returns (node, core) sorted by node; isolated-after-dedup nodes
    (only self-loops) get core 0.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src].astype(str), df[dst].astype(str)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    und = bucketed_groupby(
        edges.map_batches(canon, batch_format="pandas"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        expected_rows=expected_edges,
    ).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        vals = pd.unique(
            pd.concat([pd.Series(t["a"].to_pandas()), pd.Series(t["b"].to_pandas())])
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    nodes = np.sort(
        pd.unique(
            und.map_batches(node_partial, batch_format="pyarrow")
            .to_pandas()["node"]
        )
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame(
            {"node": pd.Series(dtype=str), "core": pd.Series(dtype="int64")}
        )
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        a = ix.get_indexer(pd.Series(t["a"].to_pandas()))
        b = ix.get_indexer(pd.Series(t["b"].to_pandas()))
        return pa.table(
            {"ac": pa.array(a.astype(np.int64)), "bc": pa.array(b.astype(np.int64))}
        )

    enc = und.map_batches(encode, batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t["ac"].to_numpy(zero_copy_only=False),
                t["bc"].to_numpy(zero_copy_only=False),
            ]
        )
        c = np.bincount(both)
        nz = np.flatnonzero(c)
        return pa.table(
            {"i": pa.array(nz.astype(np.int64)), "c": pa.array(c[nz].astype(np.int64))}
        )

    parts = enc.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, parts["i"].to_numpy(), parts["c"].to_numpy())

    alive = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    k = 0
    while alive.any():
        k = max(k, int(deg[alive].min()))
        victims = alive & (deg <= k)
        core[victims] = k
        alive = alive & ~victims
        if not alive.any():
            break
        vic_ref = ray.put(victims)
        alive_ref = ray.put(alive)

        def lost(t: pa.Table) -> pa.Table:
            v = ray.get(vic_ref)
            al = ray.get(alive_ref)
            a = t["ac"].to_numpy(zero_copy_only=False)
            b = t["bc"].to_numpy(zero_copy_only=False)
            hits = np.concatenate([b[v[a] & al[b]], a[v[b] & al[a]]])
            c = np.bincount(hits, minlength=0)
            nz = np.flatnonzero(c)
            return pa.table(
                {
                    "i": pa.array(nz.astype(np.int64)),
                    "c": pa.array(c[nz].astype(np.int64)),
                }
            )

        parts = enc.map_batches(lost, batch_format="pyarrow").to_pandas()
        if len(parts):
            np.subtract.at(deg, parts["i"].to_numpy(), parts["c"].to_numpy())

    return pd.DataFrame({"node": nodes, "core": core}).sort_values(
        "node"
    ).reset_index(drop=True)


_HLL_M = 64  # registers per node counter (HyperBall b=6)


def _hll_init(nodes: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 register matrix seeded with each node's own hash
    (md5 low-64: deterministic, engine-independent)."""
    from texrex_ray.functions.hashing import md5_lower64

    h = md5_lower64(list(nodes))
    regs = np.zeros((len(nodes), _HLL_M), dtype=np.uint8)
    idx = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
    w = (h >> np.uint64(6)).astype(object)
    rank = np.array(
        [(58 - int(v).bit_length()) + 1 if int(v) else 59 for v in w],
        dtype=np.uint8,
    )
    regs[np.arange(len(nodes)), idx] = rank
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate for one 64-register counter (with the
    linear-counting small-range correction)."""
    m = float(_HLL_M)
    alpha = 0.709  # alpha_64
    e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        import math

        e = m * math.log(m / zeros)
    return e


def neighborhood_function(
    edges: ray.data.Dataset,
    *,
    t_max: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Approximate neighborhood function N(t) = Σ_v |{u reachable from v
    in ≤ t hops}| via HyperBall (Boldi & Vigna 2013; ANF, Palmer et al.
    2002) — the effective-diameter curve of the crawl graph, computable
    at web scale where per-node BFS is hopeless.

    Each node carries a 64-register HLL counter seeded with its own
    hash; round t replaces every counter with the register-wise MAX of
    itself and its out-neighbors' counters — after t rounds the counter
    sketches the t-hop forward-reachable set.  Register max-merge is
    ORDER-INVARIANT, so the distributed result is bit-identical to a
    sequential run (unlike mergesum sketches); the float estimate is
    then taken once per node on the driver in sorted node order, making
    the whole output deterministic.

    Distribution contract = the pagerank broadcast shape: edges
    int-encoded once; each round broadcasts the (n × 64)-byte register
    matrix and edge batches emit per-src register maxima
    (``np.maximum.at`` partials — result-bounded).  Driver state is
    n × 64 bytes (the ≤1e7-node regime; page-scale swaps in a keyed
    max-merge exchange, same registers).

    Returns (t, nf_c) for t = 0..t_max with nf scaled ×100, plus the
    per-t estimate stopping early once no register changes (diameter
    reached).
    """
    edges = edges.materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        vals = pd.unique(
            pd.concat(
                [pd.Series(t[src].to_pandas()), pd.Series(t[dst].to_pandas())]
            )
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    nodes = np.sort(
        pd.unique(
            edges.map_batches(node_partial, batch_format="pyarrow")
            .to_pandas()["node"]
        )
    )
    n = len(nodes)
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()

    regs = _hll_init(nodes)

    def nf_of(r: np.ndarray) -> int:
        total = 0.0
        for i in range(n):  # sorted node order: deterministic float sum
            total += _hll_estimate(r[i])
        return int(round(total * 100))

    out = [{"t": 0, "nf_c": nf_of(regs)}]
    for t in range(1, t_max + 1):
        ref = ray.put(regs)

        def gather(tb: pa.Table) -> pa.Table:
            r = ray.get(ref)
            s = tb["s"].to_numpy(zero_copy_only=False)
            d = tb["d"].to_numpy(zero_copy_only=False)
            # accumulate per DISTINCT src in this batch — the partial is
            # batch-bounded, never node-bounded
            us, inv = np.unique(s, return_inverse=True)
            acc = np.zeros((len(us), _HLL_M), dtype=np.uint8)
            np.maximum.at(acc, inv, r[d])  # src absorbs dst counters
            return pa.table(
                {
                    "i": pa.array(us.astype(np.int64)),
                    "regs": pa.array(list(acc), pa.list_(pa.uint8(), _HLL_M)),
                }
            )

        parts = enc.map_batches(gather, batch_format="pyarrow").to_pandas()
        nxt = regs.copy()
        if len(parts):
            ii = parts["i"].to_numpy()
            mats = np.stack(parts["regs"].to_numpy())
            np.maximum.at(nxt, ii, mats.astype(np.uint8))
        if np.array_equal(nxt, regs):
            break  # diameter reached
        regs = nxt
        out.append({"t": t, "nf_c": nf_of(regs)})

    df = pd.DataFrame(out)
    for c in ("t", "nf_c"):
        df[c] = df[c].astype("int64")
    return df[["t", "nf_c"]]


def neighborhood_function_sequential(
    edges: list[tuple[str, str]], t_max: int = 8
) -> list[tuple[int, int]]:
    """Independent per-edge Python twin (same sketch, loop-based merge)
    — the oracle for tests and the q128 committed fixture."""
    nodes = np.sort(pd.unique(np.array([x for e in edges for x in e], dtype=object)))
    ix = {v: i for i, v in enumerate(nodes)}
    regs = _hll_init(nodes)

    def nf(r):
        total = 0.0
        for i in range(len(nodes)):
            total += _hll_estimate(r[i])
        return int(round(total * 100))

    out = [(0, nf(regs))]
    for t in range(1, t_max + 1):
        nxt = regs.copy()
        for a, b in edges:
            ia, ib = ix[a], ix[b]
            nxt[ia] = np.maximum(nxt[ia], regs[ib])
        if np.array_equal(nxt, regs):
            break
        regs = nxt
        out.append((t, nf(regs)))
    return out


def core_numbers_sequential(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Independent per-edge Python twin (Matula–Beck bucket peeling) —
    the oracle used by tests and the q119 committed fixture."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[str, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[str, int] = {}
    k = 0
    remaining = set(adj)
    while remaining:
        k = max(k, min(deg[v] for v in remaining))
        stack = [v for v in remaining if deg[v] <= k]
        while stack:
            v = stack.pop()
            if v not in remaining:
                continue
            core[v] = k
            remaining.discard(v)
            for u in adj[v]:
                if u in remaining:
                    deg[u] -= 1
                    if deg[u] <= k:
                        stack.append(u)
    return core


def triangle_counts(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    expected_edges: int | None = None,
) -> pd.DataFrame:
    """Per-node triangle counts of the UNDIRECTED simple graph under
    ``edges`` — the clustering-structure statistic (link-farm / mutual-
    citation detection on a crawl graph; the reference has no analogue,
    this is frontier-scheduler instrumentation).

    Degree-ordered orientation (the standard distributed-triangle
    trick, cf. Suri & Vassilvitskii 2011 "Counting Triangles and the
    Curse of the Last Reducer"): orient every undirected edge from the
    endpoint of lower (degree, node) rank to the higher, so each
    triangle is generated as exactly ONE wedge at its lowest-rank
    corner and out-degrees — hence the per-group quadratic wedge step —
    are bounded by O(√m) instead of the raw max degree (the hub that
    curses the naive reducer).

    Exchanges: edge dedup (edge-sized, hash-keyed), degree count
    (node-sized), wedge↔edge intersection (wedge+edge-sized, the only
    super-linear volume — Σ C(d_out,2) ≤ O(m^1.5) by orientation), and
    the final per-node count (3·triangles rows).  The degree table is
    broadcast once via ``ray.put`` for the orientation pass (node-sized
    driver state, the pagerank plan="broadcast" contract — swap in a
    shuffle_join on src/dst for page-scale graphs, same results).
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    # 1. canonical undirected edge set, dedup'd on a hash-keyed exchange
    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src].astype(str), df[dst].astype(str)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    und = bucketed_groupby(
        edges.map_batches(canon, batch_format="pandas"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        expected_rows=expected_edges,
    ).materialize()  # edge-sized; consumed by BOTH the wedge and the
    # closing branch — pinning runs the dedup exchange once (q78 pattern)

    # 2. degrees (node-keyed exchange), then broadcast for orientation
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["a"], df["b"]]).value_counts()
        return pd.DataFrame({"node": c.index, "pd_": c.to_numpy(np.int64)})

    deg = bucketed_groupby(
        und.map_batches(deg_partial, batch_format="pandas"),
        "node",
        lambda g: g.groupby("node", as_index=False)["pd_"].sum(),
        expected_rows=expected_edges and expected_edges * 2,
    ).to_pandas()  # node-sized
    deg_ref = ray.put(dict(zip(deg["node"], (int(v) for v in deg["pd_"]))))

    # 3. orient lower rank -> higher rank; (degree, node) is a total order
    def orient(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(deg_ref)
        da = df["a"].map(d).to_numpy(np.int64)
        db = df["b"].map(d).to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (df["a"] < df["b"]).to_numpy())
        return pd.DataFrame(
            {
                "u": np.where(a_first, df["a"], df["b"]),
                "v": np.where(a_first, df["b"], df["a"]),
            }
        )

    oriented = und.map_batches(orient, batch_format="pandas")

    # 4. wedges at each lowest-rank corner: per-u sorted out-neighbor pairs
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        us, xs, ys = [], [], []
        for u, grp in g.groupby("u", sort=False):
            nb = sorted(grp["v"].tolist())
            for i in range(len(nb) - 1):
                x = nb[i]
                for y in nb[i + 1 :]:
                    us.append(u)
                    xs.append(x)
                    ys.append(y)
        # key by VALUE-canonical pair to meet the undirected edge set
        xa, ya = np.asarray(xs, dtype=object), np.asarray(ys, dtype=object)
        return pd.DataFrame(
            {"a": np.minimum(xa, ya), "b": np.maximum(xa, ya), "u": us}
        )

    wedge_ds = bucketed_groupby(
        oriented, "u", wedges, expected_rows=expected_edges
    )

    # 5. wedge ∩ edge on (a, b): tagged union, one keyed exchange
    closing = und.map_batches(
        lambda df: df.assign(u=pd.NA), batch_format="pandas"
    )

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["u"].isna()
        ek = set(zip(g.loc[is_edge, "a"], g.loc[is_edge, "b"]))
        w = g[~is_edge]
        hit = [key in ek for key in zip(w["a"], w["b"])]
        return w.loc[hit, ["u", "a", "b"]]

    tris = bucketed_groupby(
        wedge_ds.union(closing),
        ["a", "b"],
        intersect,
        expected_rows=expected_edges and expected_edges * 4,
    )

    # 6. per-node counts: explode corners, one node-keyed count exchange
    def corner_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["u"], df["a"], df["b"]]).value_counts()
        return pd.DataFrame({"node": c.index, "pt": c.to_numpy(np.int64)})

    out = bucketed_groupby(
        tris.map_batches(corner_partial, batch_format="pandas"),
        "node",
        lambda g: g.groupby("node", as_index=False)["pt"].sum(),
        expected_rows=expected_edges,
    ).to_pandas()
    if out.empty:  # zero triangles -> zero blocks -> column-less frame
        return pd.DataFrame(
            {"node": pd.Series(dtype=str), "n_triangles": pd.Series(dtype="int64")}
        )
    out = (
        out.rename(columns={"pt": "n_triangles"})
        .sort_values("node")
        .reset_index(drop=True)
    )
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out[["node", "n_triangles"]]


def label_propagation(
    edges: ray.data.Dataset,
    *,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected view of ``edges``: every node starts labelled with its
    own id and, each round, adopts the most frequent label among its
    neighbors (ties -> lexicographically smallest label) — all updates
    computed from the PREVIOUS round's labels, so the result is
    deterministic and layout-invariant.  Community detection for crawl
    graphs: link farms and mirror rings collapse onto one label within
    a few rounds.

    Plan mirrors ``pagerank_int``: nodes are integer-encoded ONCE
    (sorted, so code order == lexicographic label order and the int
    argmin tie-break IS the string tie-break); each round broadcasts
    the node-sized label array (``ray.put``), edge batches emit
    (node, neighbor_label) count partials in both directions, ONE
    (node, label)-keyed exchange sums them, and the node-sized argmax
    runs on the result.  At page scale the label table outgrows the
    driver — swap the broadcast for the join plan exactly as
    ``_pagerank_shuffle`` does (same state shape, same exchange)."""
    edges = edges.materialize()
    degs = _degrees(edges, src, dst).to_pandas()
    nodes = np.sort(degs["node"].to_numpy())
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas()))
        d = ix.get_indexer(pd.Series(t[dst].to_pandas()))
        return pa.table(
            {"s": pa.array(s.astype(np.int64)), "d": pa.array(d.astype(np.int64))}
        )

    enc = edges.map_batches(encode, batch_format="pyarrow").materialize()
    n = len(nodes)
    labels = np.arange(n, dtype=np.int64)

    from ray.data.aggregate import Sum

    for _ in range(iters):
        ref = ray.put(labels)

        def partial(t: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            s = t["s"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            node = np.concatenate([d, s])
            lbl = lab[np.concatenate([s, d])]
            df = pd.DataFrame({"node": node, "lbl": lbl})
            g = df.groupby(["node", "lbl"], as_index=False).size().rename(
                columns={"size": "pn"}
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = (
            enc.map_batches(partial, batch_format="pyarrow")
            .groupby(["node", "lbl"])
            .aggregate(Sum("pn", alias_name="cnt"))
            .to_pandas()  # at most one row per (node, neighbor-label)
        )
        win = (
            counts.sort_values(
                ["node", "cnt", "lbl"], ascending=[True, False, True]
            )
            .drop_duplicates("node")
            .set_index("node")["lbl"]
        )
        new = labels.copy()
        new[win.index.to_numpy()] = win.to_numpy()
        labels = new

    return pd.DataFrame(
        {"page": nodes, "label": nodes[labels]}
    ).sort_values("page").reset_index(drop=True)


def label_propagation_sequential(
    edges: list[tuple[str, str]], iters: int = 4
) -> dict[str, str]:
    """Independent dict/Counter implementation of the SAME synchronous
    LPA semantics (fixture twin for ``label_propagation`` — per-edge
    Python, no Dataset machinery)."""
    from collections import Counter, defaultdict

    nbrs: dict[str, list[str]] = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {v: v for v in nbrs}
    for _ in range(iters):
        new = {}
        for v, ns in nbrs.items():
            c = Counter(labels[u] for u in ns)
            # tie-break: highest count, then lexicographically smallest
            top = max(c.values())
            new[v] = min(k for k, cnt in c.items() if cnt == top)
        labels = new
    return labels


def ktruss_sizes(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    expected_edges: int | None = None,
) -> pd.DataFrame:
    """k-truss ladder of the UNDIRECTED simple graph: for each k >= 3,
    the size of the maximal subgraph whose every edge closes >= k-2
    triangles inside it.  Trusses are the cohesion statistic between
    triangles (q109) and cores (q119): a k-truss is always inside the
    (k-1)-core but demands TRIANGLE support, so link farms that inflate
    degree without closure fall out — the community-pruning gate a
    template-farm detector runs after the cheap core filter.

    Plan: dedup to canonical undirected edges (one hash-keyed exchange),
    integer-encode; each peeling round broadcasts the surviving
    adjacency as a CSR (sorted-neighbor arrays) via ``ray.put`` and ONE
    ``map_batches`` pass over the edge partition computes per-edge
    support with vectorized two-pointer intersections, dropping
    under-supported edges.  Rounds repeat to fixpoint per k, then k
    advances on the survivors (monotone: the (k+1)-truss is inside the
    k-truss, so work only shrinks).  The broadcast CSR bounds this plan
    at edge sets that fit one worker (~10^9 edges at 16 bytes); past
    that the documented swap is hash-partitioned wedge enumeration
    (each triangle counted at its lowest-degree apex) with support
    deltas shuffled per round — same rounds, no broadcast.

    Returns (k, n_edges) for every k >= 3 with a nonempty truss.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src].astype(str), df[dst].astype(str)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    und = bucketed_groupby(
        edges.map_batches(canon, batch_format="pandas"),
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        expected_rows=expected_edges,
    ).to_pandas()
    if not len(und):
        return pd.DataFrame(
            {"k": pd.Series(dtype="int64"), "n_edges": pd.Series(dtype="int64")}
        )

    nodes = pd.Index(np.sort(pd.unique(np.concatenate([und["a"], und["b"]]))))
    ea = nodes.get_indexer(und["a"]).astype(np.int64)
    eb = nodes.get_indexer(und["b"]).astype(np.int64)

    def csr_of(a: np.ndarray, b: np.ndarray, n: int):
        heads = np.concatenate([a, b])
        tails = np.concatenate([b, a])
        order = np.lexsort((tails, heads))
        heads, tails = heads[order], tails[order]
        offsets = np.searchsorted(heads, np.arange(n + 1))
        return offsets, tails

    n = len(nodes)
    rows: list[tuple[int, int]] = []
    k = 3
    while len(ea):
        while True:
            csr_ref = ray.put(csr_of(ea, eb, n))
            cur = ray.data.from_arrow(
                pa.table({"ai": pa.array(ea), "bi": pa.array(eb)})
            ).repartition(max(1, len(ea) // 4096))

            def support_filter(t: pa.Table, need: int = k - 2) -> pa.Table:
                offs, tails = ray.get(csr_ref)
                ai = t["ai"].to_numpy()
                bi = t["bi"].to_numpy()
                keep = np.zeros(len(ai), dtype=bool)
                for i, (x, y) in enumerate(zip(ai, bi)):
                    nx = tails[offs[x]:offs[x + 1]]
                    ny = tails[offs[y]:offs[y + 1]]
                    # sorted two-pointer via searchsorted membership
                    sup = np.count_nonzero(
                        np.isin(nx, ny, assume_unique=True)
                    )
                    if sup >= need:
                        keep[i] = True
                return pa.table(
                    {"ai": pa.array(ai[keep]), "bi": pa.array(bi[keep])}
                )

            out = cur.map_batches(support_filter, batch_format="pyarrow").to_pandas()
            if len(out) == len(ea):
                break
            if not len(out):
                ea = eb = np.array([], dtype=np.int64)
                break
            ea = out["ai"].to_numpy()
            eb = out["bi"].to_numpy()
        if len(ea):
            rows.append((k, len(ea)))
        k += 1

    return pd.DataFrame(rows, columns=["k", "n_edges"]).astype("int64")


def ktruss_sequential(edges: list[tuple[str, str]]) -> dict[int, int]:
    """Independent per-edge Python twin (dict-of-sets, stack-driven
    incremental peeling) — the oracle used by tests and the q266
    committed fixture."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    sizes: dict[int, int] = {}
    k = 3
    cur = set(und)
    while cur:
        adj: dict[str, set] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        stack = [e for e in cur if len(adj[e[0]] & adj[e[1]]) < k - 2]
        while stack:
            a, b = stack.pop()
            if (a, b) not in cur:
                continue
            cur.discard((a, b))
            adj[a].discard(b)
            adj[b].discard(a)
            for c in adj[a] & adj[b]:
                for e in ((a, c), (b, c)):
                    e = tuple(sorted(e))
                    if e in cur and len(adj[e[0]] & adj[e[1]]) < k - 2:
                        stack.append(e)
        if cur:
            sizes[k] = len(cur)
        k += 1
    return sizes


def kcore_int(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 200,
) -> pd.DataFrame:
    """Core number of every node in the undirected simple view of
    ``edges`` (self-loops dropped, parallel/reciprocal edges collapse)
    via the h-index fixpoint (Lu, Zhou, Zhang, Stanley 2016): start
    c(v) = deg(v); each round set c(v) to the H-index of its neighbors'
    c values; the unique fixpoint IS the coreness — deterministic, no
    peeling order to pin.  Coreness grades crawl-graph density the way
    k-truss grades cohesion: link farms sit in deep cores, genuine
    content in shallow ones.

    Plan mirrors ``label_propagation``: integer-encode nodes ONCE,
    build a node-partitioned CSR adjacency (one exchange), then each
    round broadcasts the node-sized c array (``ray.put``) and the
    per-node H-index runs vectorized inside map_batches — only changed
    counts aggregate back.  At page scale swap the broadcast for the
    (node, c)-keyed join plan exactly as ``_pagerank_shuffle`` does.
    Converges in O(peeling depth) rounds (tens, even on web graphs).
    """
    edges = edges.materialize()
    degs = _degrees(edges, src, dst).to_pandas()
    nodes = np.sort(degs["node"].to_numpy())
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas())).astype(np.int64)
        d = ix.get_indexer(pd.Series(t[dst].to_pandas())).astype(np.int64)
        keep = s != d
        return pa.table({"s": pa.array(s[keep]), "d": pa.array(d[keep])})

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        a = np.concatenate([df["s"].to_numpy(), df["d"].to_numpy()])
        b = np.concatenate([df["d"].to_numpy(), df["s"].to_numpy()])
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    def neigh_lists(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.drop_duplicates()
        return pd.DataFrame(
            {
                "node": [int(g2["a"].iloc[0])],
                "nbrs": [np.unique(g2["b"].to_numpy()).tolist()],
            }
        )

    adj = (
        edges.map_batches(encode, batch_format="pyarrow")
        .map_batches(undirect, batch_format="pandas")
        .groupby("a")
        .map_groups(neigh_lists, batch_format="pandas")
        .materialize()
    )
    n = len(nodes)
    c = np.zeros(n, dtype=np.int64)
    deg = adj.to_pandas()
    c[deg["node"].to_numpy()] = deg["nbrs"].map(len).to_numpy()

    for _ in range(max_iters):
        ref = ray.put(c)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            cur = ray.get(ref)
            outs = np.empty(len(df), dtype=np.int64)
            for i, nb in enumerate(df["nbrs"]):
                vals = np.sort(cur[np.asarray(nb, dtype=np.int64)])[::-1]
                outs[i] = int(
                    np.max(np.minimum(vals, np.arange(1, len(vals) + 1)))
                )
            return pd.DataFrame({"node": df["node"].to_numpy(), "h": outs})

        upd = adj.map_batches(step, batch_format="pandas").to_pandas()
        new = c.copy()
        new[upd["node"].to_numpy()] = upd["h"].to_numpy()
        if np.array_equal(new, c):
            break
        c = new
    else:
        raise RuntimeError("kcore_int: no fixpoint within max_iters")

    return pd.DataFrame({"node": nodes, "core": c}).sort_values(
        "node"
    ).reset_index(drop=True)


def kcore_sequential(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Independent twin: Batagelj-Zaversnik bucket peeling (repeatedly
    remove a minimum-degree node; its degree AT REMOVAL is its core
    number, monotonically maxed) — a completely different route to the
    same unique coreness, used by tests and the q287 fixture."""
    adj: dict[str, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[str, int] = {}
    live = dict(adj)
    k = 0
    import heapq

    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set = set()
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        removed.add(v)
        k = max(k, d)
        core[v] = k
        for u in live[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def double_sweep(
    edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst"
) -> dict:
    """Double-sweep BFS diameter lower bound on the undirected simple
    view of ``edges``: BFS from the lexicographically smallest node;
    take the farthest node (max dist, ties -> lex-min); BFS again from
    it.  ``ecc_peak`` lower-bounds the diameter (exact on trees,
    empirically tight on web graphs — Magnien/Latapy/Habib 2009).

    Plan: adjacency built once exactly as ``kcore_int``; each BFS
    level is ONE map over adjacency batches with the integer frontier
    mask broadcast (``ray.put``), unioning discovered nodes on a
    node-sized driver bitmap — level count = eccentricity.  Only nodes
    REACHABLE from the start are swept (n_reached reported next to
    n_nodes)."""
    edges = edges.materialize()
    degs = _degrees(edges, src, dst).to_pandas()
    nodes = np.sort(degs["node"].to_numpy())
    node_index = pd.Index(nodes)
    idx_ref = ray.put(node_index)

    def encode(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        s = ix.get_indexer(pd.Series(t[src].to_pandas())).astype(np.int64)
        d = ix.get_indexer(pd.Series(t[dst].to_pandas())).astype(np.int64)
        keep = s != d
        return pa.table({"s": pa.array(s[keep]), "d": pa.array(d[keep])})

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        a = np.concatenate([df["s"].to_numpy(), df["d"].to_numpy()])
        b = np.concatenate([df["d"].to_numpy(), df["s"].to_numpy()])
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    enc = (
        edges.map_batches(encode, batch_format="pyarrow")
        .map_batches(undirect, batch_format="pandas")
        .materialize()
    )
    n = len(nodes)

    def bfs(root: int) -> np.ndarray:
        dist = np.full(n, -1, dtype=np.int64)
        dist[root] = 0
        frontier = np.array([root], dtype=np.int64)
        level = 0
        while len(frontier):
            fmask = np.zeros(n, dtype=bool)
            fmask[frontier] = True
            fref = ray.put(fmask)

            def expand(df: pd.DataFrame) -> pd.DataFrame:
                fm = ray.get(fref)
                a = df["a"].to_numpy()
                hit = fm[a]
                return pd.DataFrame({"nb": np.unique(df["b"].to_numpy()[hit])})

            nb = enc.map_batches(expand, batch_format="pandas").to_pandas()
            cand = np.unique(nb["nb"].to_numpy()) if len(nb) else np.array([], dtype=np.int64)
            fresh = cand[dist[cand] < 0] if len(cand) else cand
            level += 1
            dist[fresh] = level
            frontier = fresh
        return dist

    d0 = bfs(0)  # nodes sorted => index 0 IS the lex-min node
    ecc_start = int(d0.max())
    peak = int(np.flatnonzero(d0 == ecc_start)[0])  # lex-min among ties
    d1 = bfs(peak)
    return {
        "start_node": str(nodes[0]),
        "ecc_start": ecc_start,
        "peak_node": str(nodes[peak]),
        "ecc_peak": int(d1.max()),
        "n_reached": int((d0 >= 0).sum()),
        "n_nodes": n,
    }


def double_sweep_sequential(edges: list[tuple[str, str]]) -> dict:
    """Independent twin: deque BFS over dict-of-sets adjacency."""
    from collections import deque

    adj: dict[str, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)

    def bfs(root: str) -> dict[str, int]:
        dist = {root: 0}
        q = deque([root])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        return dist

    d0 = bfs(nodes[0])
    ecc_start = max(d0.values())
    peak = min(v for v, d in d0.items() if d == ecc_start)
    d1 = bfs(peak)
    return {
        "start_node": nodes[0],
        "ecc_start": ecc_start,
        "peak_node": peak,
        "ecc_peak": max(d1.values()),
        "n_reached": len(d0),
        "n_nodes": len(nodes),
    }


def maxflow_int(
    edges: ray.data.Dataset,
    src_node: str,
    dst_node: str,
    *,
    src: str = "src",
    dst: str = "dst",
) -> int:
    """Max s-t flow on the undirected simple view with UNIT capacities
    (= number of edge-disjoint s-t paths = s-t edge connectivity, by
    Menger) via Edmonds-Karp BFS augmentation — the crawl-redundancy
    audit: how many edge-independent routes reach t if links die.

    The flow VALUE is unique (max-flow/min-cut), so any correct
    algorithm must agree — the q310 fixture twin runs Dinic instead.
    Plan: edge canonicalization/dedup is distributed; the augmentation
    loop runs on the driver over the edge-sized CSR (inherently
    sequential — at page scale cap the subgraph by ego-radius first,
    like the ktruss driver plan)."""
    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_pylist()
        b = t[dst].to_pylist()
        pairs = {(x, y) if x < y else (y, x) for x, y in zip(a, b) if x != y}
        return pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.string()),
                "b": pa.array([p[1] for p in pairs], pa.string()),
            }
        )

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    # residual capacities as dict-of-dicts (unit caps both directions)
    cap: dict[str, dict[str, int]] = {}
    for a, b in zip(und["a"], und["b"]):
        cap.setdefault(a, {})[b] = 1
        cap.setdefault(b, {})[a] = 1
    if src_node not in cap or dst_node not in cap:
        return 0
    from collections import deque

    flow = 0
    while True:
        parent = {src_node: None}
        q = deque([src_node])
        while q and dst_node not in parent:
            v = q.popleft()
            for u in sorted(cap[v]):  # sorted => deterministic BFS tree
                if cap[v][u] > 0 and u not in parent:
                    parent[u] = v
                    q.append(u)
        if dst_node not in parent:
            return flow
        v = dst_node
        while parent[v] is not None:
            p = parent[v]
            cap[p][v] -= 1
            cap[v][p] = cap[v].get(p, 0) + 1
            v = p
        flow += 1


def maxflow_dinic(edges: list[tuple[str, str]], s: str, t: str) -> int:
    """Independent twin: Dinic's algorithm (level graph + blocking
    flow) on the same unit-capacity undirected view."""
    from collections import deque

    cap: dict[str, dict[str, int]] = {}
    for a, b in edges:
        if a == b:
            continue
        cap.setdefault(a, {})[b] = 1
        cap.setdefault(b, {})[a] = 1
    if s not in cap or t not in cap:
        return 0
    flow = 0
    while True:
        level = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for u, c in cap[v].items():
                if c > 0 and u not in level:
                    level[u] = level[v] + 1
                    q.append(u)
        if t not in level:
            return flow
        it = {v: iter(sorted(cap[v])) for v in cap}

        def dfs(v: str, pushed: int) -> int:
            if v == t:
                return pushed
            for u in it[v]:
                if cap[v].get(u, 0) > 0 and level.get(u, -1) == level[v] + 1:
                    got = dfs(u, min(pushed, cap[v][u]))
                    if got:
                        cap[v][u] -= got
                        cap[u][v] = cap[u].get(v, 0) + got
                        return got
            return 0

        while True:
            pushed = dfs(s, 1 << 30)
            if not pushed:
                break
            flow += pushed


def hopcroft_karp(pairs: list[tuple[str, str]]) -> int:
    """Maximum bipartite matching size via Hopcroft-Karp (left = first
    element, right = second).  The matching SIZE is unique (König), so
    the q311 fixture twin runs simple Kuhn augmentation instead."""
    from collections import deque

    adj: dict[str, list] = {}
    rights: set = set()
    for l, r in pairs:
        adj.setdefault(l, []).append(r)
        rights.add(r)
    for l in adj:
        adj[l] = sorted(set(adj[l]))
    INF = 1 << 60
    match_l: dict[str, str | None] = {l: None for l in adj}
    match_r: dict[str, str | None] = {r: None for r in rights}
    size = 0
    while True:
        dist = {}
        q = deque()
        for l, m in match_l.items():
            if m is None:
                dist[l] = 0
                q.append(l)
        found = False
        while q:
            l = q.popleft()
            for r in adj[l]:
                nl = match_r[r]
                if nl is None:
                    found = True
                elif nl not in dist:
                    dist[nl] = dist[l] + 1
                    q.append(nl)
        if not found:
            return size

        def try_aug(l: str) -> bool:
            for r in adj[l]:
                nl = match_r[r]
                if nl is None or (dist.get(nl) == dist[l] + 1 and try_aug(nl)):
                    match_l[l] = r
                    match_r[r] = l
                    return True
            dist[l] = INF
            return False

        for l in list(match_l):
            if match_l[l] is None and try_aug(l):
                size += 1


def kuhn_matching(pairs: list[tuple[str, str]]) -> int:
    """Independent twin: one-augmenting-path-at-a-time Kuhn."""
    adj: dict[str, list] = {}
    for l, r in pairs:
        adj.setdefault(l, []).append(r)
    for l in adj:
        adj[l] = sorted(set(adj[l]))
    match_r: dict[str, str] = {}

    def aug(l: str, seen: set) -> bool:
        for r in adj[l]:
            if r in seen:
                continue
            seen.add(r)
            if r not in match_r or aug(match_r[r], seen):
                match_r[r] = l
                return True
        return False

    size = 0
    for l in sorted(adj):
        if aug(l, set()):
            size += 1
    return size


def bridges_articulation(edges: ray.data.Dataset, *, src: str = "src",
                         dst: str = "dst") -> dict:
    """Bridges and articulation points of the undirected simple view
    (Tarjan/Hopcroft low-link, ITERATIVE dfs — web-graph depths
    overflow Python recursion) — the single-point-of-failure census
    complementing q173's hub robustness: a bridge is a link whose loss
    disconnects, an articulation a page whose loss does.  Both SETS
    are unique properties of the graph (independent of DFS order).
    Edge canonicalization is distributed; the linear-time DFS runs on
    the edge-sized adjacency (ktruss-style driver plan)."""
    def canon(t: pa.Table) -> pa.Table:
        a = t[src].to_pylist()
        b = t[dst].to_pylist()
        pairs = {(x, y) if x < y else (y, x) for x, y in zip(a, b) if x != y}
        return pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.string()),
                "b": pa.array([p[1] for p in pairs], pa.string()),
            }
        )

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    adj: dict[str, list] = {}
    for a, b in zip(und["a"], und["b"]):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for v in adj:
        adj[v].sort()
    disc: dict[str, int] = {}
    low: dict[str, int] = {}
    bridges = 0
    artic: set = set()
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        # iterative DFS: stack of (node, parent, neighbor-iterator)
        disc[root] = low[root] = timer
        timer += 1
        root_children = 0
        stack = [(root, None, iter(adj[root]))]
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for u in it:
                if u == parent:
                    # skip ONE parent edge occurrence (simple graph)
                    parent = None
                    stack[-1] = (v, parent, it)
                    continue
                if u not in disc:
                    disc[u] = low[u] = timer
                    timer += 1
                    if v == root:
                        root_children += 1
                    stack.append((u, v, iter(adj[u])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[u])
            if not advanced:
                stack.pop()
                if stack:
                    pv = stack[-1][0]
                    low[pv] = min(low[pv], low[v])
                    if low[v] > disc[pv]:
                        bridges += 1
                    if pv != root and low[v] >= disc[pv]:
                        artic.add(pv)
        if root_children >= 2:
            artic.add(root)
    return {
        "n_nodes": len(adj),
        "n_edges_und": len(und),
        "n_bridges": bridges,
        "n_articulation": len(artic),
    }


def bridges_articulation_brute(edges: list[tuple[str, str]]) -> dict:
    """Independent twin: remove each edge/node, recount components."""
    from collections import deque

    adj: dict[str, set] = {}
    und = set()
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        und.add((a, b) if a < b else (b, a))

    def n_comp(skip_edge=None, skip_node=None) -> int:
        seen: set = set()
        comps = 0
        for s in adj:
            if s == skip_node or s in seen:
                continue
            comps += 1
            q = deque([s])
            seen.add(s)
            while q:
                v = q.popleft()
                for u in adj[v]:
                    if u == skip_node or u in seen:
                        continue
                    e = (v, u) if v < u else (u, v)
                    if e == skip_edge:
                        continue
                    seen.add(u)
                    q.append(u)
        return comps

    base = n_comp()
    n_bridges = sum(1 for e in und if n_comp(skip_edge=e) > base)
    n_art = 0
    for v in adj:
        # removing v drops it from the count; more pieces than before
        # (excluding v itself) means articulation
        if n_comp(skip_node=v) > base - (1 if len(adj[v]) == 0 else 0):
            n_art += 1
    return {
        "n_nodes": len(adj),
        "n_edges_und": len(und),
        "n_bridges": n_bridges,
        "n_articulation": n_art,
    }


# --------------------------------------------------------------------------
# Bipartite butterfly (2x2 biclique) fold
# --------------------------------------------------------------------------

def butterfly_fold(
    edges: ray.data.Dataset,
    *,
    n_left: int | None = None,
    expected_edges: int | None = None,
    plan: str = "auto",
    matrix_max_left: int = 10_000,
    hot_degree: int = 4096,
    chunk_target: int = 2048,
) -> tuple[int, int]:
    """Exact (n_wedges, n_butterflies) of a DISTINCT bipartite edge set.

    ``edges`` must hold distinct (s:int64 left, p:int64 right) rows.
    Butterflies fold from per-left-pair co-neighbourhood counts m(s1,s2)
    as Σ C(m,2); wedges are Σ m = Σ_p d(p)·(d(p)−1)/2.

    Two plans, identical results (tests force both):

    - ``plan="matrix"`` — small LEFT side: each p-complete bucket builds
      a local 0/1 incidence B over its parts and emits triu(B @ B^T);
      partial matrices SUM across buckets (parts partition cleanly), so
      the only exchange is a bucket-count driver reduce of
      L·(L−1)/2-entry vectors.  Dot products are integers < 2^24, exact
      in float32 BLAS.  Per-bucket AND driver memory is O(L²) —
      ``matrix_max_left`` defaults to 10k (≈400 MB of float32 per
      bucket task + one int64 partial vector on the driver; 30k would
      be 3.6 GB per task, which this host's slow first-touch pages
      turn into minutes before it OOMs).
    - ``plan="shuffle"`` — the page-scale wedge-pair shuffle: a part of
      degree d emits its d·(d−1)/2 supplier pairs inside a p-bucketed
      combine, pairs exchange hashed on (s1,s2), and each pair bucket
      folds Σ m and Σ C(m,2) locally so only bucket-count partials reach
      the driver.  HOT parts (d > ``hot_degree``) are salted first:
      their edges split into K = ceil(d / ``chunk_target``) hashed
      chunks and replicate K× to the chunk-pair groups (a,b) a≤b —
      within-chunk pairs fold in (r,r), cross-chunk pairs in (a,b) a<b,
      so every pair is produced EXACTLY once while the per-task
      explosion shrinks from O(d²) to O(chunk_target·d).

    ``plan="auto"`` picks matrix while n_left ≤ ``matrix_max_left``,
    else shuffle.  (Reference analogue: texrex has no graph ops; this
    serves the crawl-graph analytics the frontier scheduler feeds on,
    same role as pagerank_int above.)
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    if expected_edges is None:
        expected_edges = edges.count()
    if expected_edges == 0:
        return 0, 0

    if n_left is None:
        n_left = bucketed_groupby(
            edges, "s", lambda df: df[["s"]].drop_duplicates(),
            expected_rows=expected_edges,
        ).count()

    if plan == "auto":
        plan = "matrix" if n_left <= matrix_max_left else "shuffle"
    if plan == "matrix":
        if n_left > matrix_max_left:
            raise ValueError(
                f"butterfly_fold: {n_left} left nodes exceeds "
                f"matrix_max_left={matrix_max_left}; use plan='shuffle'"
            )
        return _butterfly_matrix(edges, expected_edges)
    if plan == "shuffle":
        return _butterfly_shuffle(
            edges, expected_edges, hot_degree=hot_degree,
            chunk_target=chunk_target,
        )
    raise ValueError(f"butterfly_fold: unknown plan {plan!r}")


def _butterfly_matrix(
    edges: ray.data.Dataset, expected_edges: int
) -> tuple[int, int]:
    from texrex_ray.ops.aggregate import bucketed_groupby

    batches = [
        b.to_pandas()
        for b in bucketed_groupby(
            edges, "s", lambda df: df[["s"]].drop_duplicates(),
            expected_rows=expected_edges,
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    if not batches:
        return 0, 0
    s_ids = np.sort(pd.concat(batches)["s"].to_numpy(np.int64))
    pos = {int(v): i for i, v in enumerate(s_ids)}
    pos_ref = ray.put(pos)
    # L from the distinct set actually built — a caller-supplied n_left
    # hint smaller than the truth would make comat index out of bounds
    L = len(s_ids)

    def comat(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket = a p-COMPLETE slice (bucketed_groupby hashes on p),
        # so every part's full supplier set co-locates here — a plain
        # map_batches split would tear parts across blocks and silently
        # undercount cross-block pairs
        pm = ray.get(pos_ref)
        si = df["s"].map(pm).to_numpy(np.int64)
        p_codes, uniq_p = pd.factorize(df["p"], sort=False)
        B = np.zeros((L, len(uniq_p)), np.float32)
        B[si, p_codes] = 1.0
        M = B @ B.T
        i, j = np.triu_indices(L, 1)
        return pd.DataFrame({"m_flat": [M[i, j].astype(np.int64).tobytes()]})

    m = np.zeros(L * (L - 1) // 2, np.int64)
    for row in bucketed_groupby(
        edges, "p", comat, expected_rows=expected_edges
    ).iter_rows():
        m += np.frombuffer(row["m_flat"], np.int64)
    return int(m.sum()), int((m * (m - 1) // 2).sum())


def _butterfly_shuffle(
    edges: ray.data.Dataset,
    expected_edges: int,
    *,
    hot_degree: int,
    chunk_target: int,
) -> tuple[int, int]:
    from texrex_ray.ops.aggregate import bucketed_groupby

    # -- degrees per right node; the hot set (d > hot_degree) is tiny by
    # definition (Σd = |E| bounds it to |E|/hot_degree entries), so it
    # broadcasts; the full degree table never leaves the cluster.
    deg = bucketed_groupby(
        edges, "p",
        lambda df: df.groupby("p", sort=False).size().reset_index(name="d"),
        expected_rows=expected_edges,
    ).materialize()

    def wedge_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy(np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    total_wedges = int(
        sum(
            r["w"]
            for r in deg.map_batches(
                wedge_partial, batch_format="pandas"
            ).iter_rows()
        )
    )

    def hot_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["d"] > hot_degree]

    hot = deg.map_batches(hot_partial, batch_format="pandas").to_pandas()
    # an all-cold graph yields a columnless empty frame — no hot parts
    hot_k = (
        {}
        if hot.empty
        else {
            int(p): max(2, -(-int(d) // chunk_target))
            for p, d in zip(hot["p"], hot["d"])
        }
    )
    hot_ref = ray.put(hot_k)

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def salt(df: pd.DataFrame) -> pd.DataFrame:
        """Emit (p, a, b, r, s): non-hot parts once under (0,0,0); a hot
        part's edges replicate to every chunk-pair containing their
        hashed chunk r."""
        hk = ray.get(hot_ref)
        p = df["p"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        hot_mask = np.isin(p, np.fromiter(hk.keys(), np.int64, len(hk))) \
            if hk else np.zeros(len(p), bool)
        cold = df[~hot_mask]
        out = [
            pd.DataFrame({
                "p": cold["p"].to_numpy(np.int64),
                "a": 0, "b": 0, "r": 0,
                "s": cold["s"].to_numpy(np.int64),
            })
        ]
        if hot_mask.any():
            hp, hs = p[hot_mask], s[hot_mask]
            for part in np.unique(hp):
                k = hk[int(part)]
                m = hp == part
                sv = hs[m]
                r = ((sv.astype(np.uint64) * _MIX) % np.uint64(k)).astype(np.int64)
                # replicate each edge to chunk-pairs (i, r) ∀ i: the pair
                # group is (min(i,r), max(i,r)), so (r,r) holds the
                # within-chunk pairs and (a,b) a<b the cross pairs
                i = np.tile(np.arange(k, dtype=np.int64), len(sv))
                rr = np.repeat(r, k)
                out.append(pd.DataFrame({
                    "p": part,
                    "a": np.minimum(i, rr),
                    "b": np.maximum(i, rr),
                    "r": rr,
                    "s": np.repeat(sv, k),
                }))
        return pd.concat(out, ignore_index=True)

    salted = edges.map_batches(salt, batch_format="pandas")
    n_rep = max(hot_k.values(), default=1)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket of (p,a,b)-complete groups → (s1,s2,m_part) wedge
        pair partials, pre-aggregated before the pair exchange."""
        outs: list[pd.DataFrame] = []
        for (_, a, b), grp in g.groupby(["p", "a", "b"], sort=False):
            sv = grp["s"].to_numpy(np.int64)
            if a == b:
                if len(sv) < 2:
                    continue
                sv = np.sort(sv)
                i, j = np.triu_indices(len(sv), 1)
                s1, s2 = sv[i], sv[j]
            else:
                r = grp["r"].to_numpy(np.int64)
                x, y = sv[r == a], sv[r == b]
                if not len(x) or not len(y):
                    continue
                xr = np.repeat(x, len(y))
                yr = np.tile(y, len(x))
                s1, s2 = np.minimum(xr, yr), np.maximum(xr, yr)
            outs.append(pd.DataFrame({"s1": s1, "s2": s2}))
        if not outs:
            return pd.DataFrame({
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
                "m_part": pd.Series([], dtype=np.int64),
            })
        allp = pd.concat(outs, ignore_index=True)
        agg = allp.groupby(["s1", "s2"], sort=False).size().reset_index(name="m_part")
        agg["m_part"] = agg["m_part"].astype(np.int64)
        return agg

    pair_parts = bucketed_groupby(
        salted, ["p", "a", "b"], pairs,
        expected_rows=expected_edges * n_rep,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["s1", "s2"], sort=False)["m_part"].sum().to_numpy(np.int64)
        return pd.DataFrame({
            "w_part": [int(m.sum())],
            "b_part": [int((m * (m - 1) // 2).sum())],
        })

    folded = bucketed_groupby(
        pair_parts, ["s1", "s2"], fold, expected_rows=total_wedges
    ).to_pandas()
    if folded.empty:  # no wedges at all (e.g. every part has degree 1)
        folded = pd.DataFrame({"w_part": [0], "b_part": [0]})
    n_wedges = int(folded["w_part"].sum())
    n_butterflies = int(folded["b_part"].sum())
    assert n_wedges == total_wedges, (
        f"butterfly_fold shuffle plan wedge mismatch: folded {n_wedges} "
        f"vs degree-derived {total_wedges}"
    )
    return n_wedges, n_butterflies
