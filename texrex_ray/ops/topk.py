"""Distributed grouped top-k.

Two-level combiner: each batch keeps its local top-k per key (so the
exchange carries ≤ k rows per (key, block), not the corpus), then one
coarse-bucket combine (``bucketed_groupby``) finishes — per-key
``map_groups`` would pay ~0.4 ms × |keys| of per-group overhead
(BENCH/BASELINE.md).  Correct because top-k of a union is the top-k of
the parts' top-k's.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def grouped_topk(
    ds: ray.data.Dataset,
    keys: str | list[str],
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tiebreak: str | list[str] | None = None,
    rank_col: str = "rk",
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """Top ``k`` rows per key by ``order_col`` with a 1-based rank column.

    ``tiebreak`` columns (ascending) make the result deterministic when
    ``order_col`` ties.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    sort_cols = keys + [order_col] + tb
    asc = [True] * len(keys) + [ascending] + [True] * len(tb)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=asc)
            .groupby(keys, sort=False)
            .head(k)
        )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = local_topk(df).reset_index(drop=True)
        out[rank_col] = out.groupby(keys).cumcount() + 1
        return out

    partials = ds.map_batches(local_topk, batch_format="pandas")
    return bucketed_groupby(partials, keys, final_topk, expected_rows=expected_rows)
