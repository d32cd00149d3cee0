"""2-D skyline (Pareto frontier): maximize one column, minimize another.

The multi-objective "best" operator (Börzsönyi et al., "The Skyline
Operator", ICDE 2001): a row survives iff no other row is at least as
good in BOTH dimensions and strictly better in one.  Canonical uses:
highest-value earliest order, best quality-per-cost document, largest
image at the smallest byte size.

Distributed shape — the skyline's own algebra does the work: the global
skyline is a subset of the union of per-block skylines (a global
dominator of x also dominates x inside whatever block it shares with x,
or survives its own block's skyline).  So each block prunes locally to
its skyline (vectorized sort + prefix-max, O(n log n)) and only the
result-sized survivors reach the driver, where the SAME exact filter
runs once more.  No shuffle at all; ties in both dimensions are kept on
both sides (SQL NOT EXISTS semantics — neither strictly dominates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _skyline_filter(df: pd.DataFrame, max_col: str, min_col: str) -> pd.DataFrame:
    """Exact skyline of one in-memory frame (sort + prefix-max)."""
    if df.empty:
        return df
    d = df.sort_values([min_col, max_col], ascending=[True, False],
                       kind="mergesort").reset_index(drop=True)
    p = d[max_col].to_numpy()
    m = d[min_col].to_numpy()
    keep = np.zeros(len(d), dtype=bool)
    best = None  # max of p over rows with strictly smaller min_col
    i = 0
    while i < len(d):
        j = i
        while j < len(d) and m[j] == m[i]:
            j += 1
        group_best = p[i]  # p desc within the min_col group
        for t in range(i, j):
            # survives iff top of its group (ties kept) and not dominated
            # by a strictly-smaller-min row with >= max value
            if p[t] == group_best and (best is None or p[t] > best):
                keep[t] = True
        best = group_best if best is None else max(best, group_best)
        i = j
    return d[keep]


def skyline2d(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    max_col: str,
    min_col: str,
) -> pd.DataFrame:
    """Skyline rows (id, max_col, min_col), sorted by id.

    Maximizes ``max_col`` while minimizing ``min_col``; both must be
    integer-valued (scale floats first).
    """

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return _skyline_filter(
            df[[id_col, max_col, min_col]], max_col, min_col
        )

    survivors = ds.map_batches(prune, batch_format="pandas").to_pandas()
    out = _skyline_filter(survivors, max_col, min_col)
    for c in (id_col, max_col, min_col):
        out[c] = out[c].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
