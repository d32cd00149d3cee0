"""Stable matching (Gale-Shapley deferred acceptance).

Matching markets show up in data engineering as assignment problems —
canonical-replica election, shard→node placement with two-sided
preferences, crawl-budget allocation between hosts and fetcher pools.
The proposer-optimal stable matching is UNIQUE under strict preferences,
which makes it oracle-checkable: any two correct implementations agree
row for row, and stability itself ("no blocking pair") is a complete
certificate verifiable in O(N²) without trusting either implementation.

Plan shape: preference RANKING is the data-sized work and runs
distributed (each proposer ranks the broadcast acceptor table inside
``map_batches``); the deferred-acceptance pointer loop is O(N²) pointer
chasing over the domain-sized rank matrix and runs on the driver —
same plan split as dedup/clusters.py (driver plan for domain-sized
state, with the round-synchronous exchange variant documented for
web-scale N: each round is one proposal exchange keyed by acceptor,
pointers advance monotonically, ≤N rounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def rank_preferences(
    proposers: ray.data.Dataset,
    acceptors: pd.DataFrame,
    p_id: str,
    p_bal: str,
    a_id: str,
    a_bal: str,
) -> pd.DataFrame:
    """Distributed preference ranking: each proposer orders all acceptors
    by (|balance gap| in cents, acceptor id) — strict, so the stable
    matching is unique.  Returns the N×N rank matrix as long rows
    (p, rank, a); the N-sized acceptor table is broadcast via closure
    capture (ray.put once per task batch)."""
    a_ids = acceptors[a_id].to_numpy().astype(np.int64)
    a_cents = np.rint(acceptors[a_bal].to_numpy() * 100).astype(np.int64)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p, bal in zip(df[p_id].astype(int), df[p_bal]):
            pc = int(round(float(bal) * 100))
            gap = np.abs(a_cents - pc)
            order = np.lexsort((a_ids, gap))
            out.append(pd.DataFrame({
                "p": p,
                "rank": np.arange(len(order), dtype=np.int64),
                "a": a_ids[order],
            }))
        return pd.concat(out, ignore_index=True)

    return proposers.map_batches(rank, batch_format="pandas").to_pandas()


def gale_shapley(
    prefs_p: pd.DataFrame, prefs_a: pd.DataFrame
) -> pd.DataFrame:
    """Deferred acceptance over long-form rank matrices.

    ``prefs_p``: (p, rank, a) — proposer p's rank-th choice is a.
    ``prefs_a``: (a, rank, p) — acceptor a's rank-th choice is p.
    Returns (p, a, p_rank, a_rank) for the proposer-optimal matching.
    """
    p_lists: dict[int, list[int]] = {
        int(p): g.sort_values("rank")["a"].astype(int).tolist()
        for p, g in prefs_p.groupby("p")
    }
    a_rank: dict[int, dict[int, int]] = {
        int(a): dict(zip(g["p"].astype(int), g["rank"].astype(int)))
        for a, g in prefs_a.groupby("a")
    }
    ptr = {p: 0 for p in p_lists}
    held: dict[int, int] = {}  # acceptor -> proposer
    free = list(p_lists)
    while free:
        nxt = []
        for p in free:
            a = p_lists[p][ptr[p]]
            cur = held.get(a)
            if cur is None:
                held[a] = p
            elif a_rank[a][p] < a_rank[a][cur]:
                held[a] = p
                ptr[cur] += 1
                nxt.append(cur)
            else:
                ptr[p] += 1
                nxt.append(p)
        free = nxt
    rows = []
    for a, p in held.items():
        rows.append((p, a, ptr[p], a_rank[a][p]))
    out = pd.DataFrame(rows, columns=["p", "a", "p_rank", "a_rank"])
    return out.sort_values("p").reset_index(drop=True)


def is_stable(
    match: pd.DataFrame, prefs_p: pd.DataFrame, prefs_a: pd.DataFrame
) -> bool:
    """Certificate check: perfect matching with NO blocking pair —
    no (p, a) who each prefer the other over their assigned partners."""
    p_rank = {
        (int(r["p"]), int(r["a"])): int(r["rank"])
        for _, r in prefs_p.iterrows()
    }
    a_rank = {
        (int(r["a"]), int(r["p"])): int(r["rank"])
        for _, r in prefs_a.iterrows()
    }
    my_a = dict(zip(match["p"].astype(int), match["a"].astype(int)))
    my_p = dict(zip(match["a"].astype(int), match["p"].astype(int)))
    ps = {p for p, _ in p_rank}
    if set(my_a) != ps or len(my_p) != len(ps):
        return False
    for p in my_a:
        for a in my_p:
            if a == my_a[p]:
                continue
            if (p_rank[(p, a)] < p_rank[(p, my_a[p])]
                    and a_rank[(a, p)] < a_rank[(a, my_p[a])]):
                return False
    return True
