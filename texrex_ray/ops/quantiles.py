"""Distributed EXACT quantiles via value-count compression.

Quality-filter calibration ("what score is p90 of the corpus?") needs
exact percentiles over billions of rows.  Sorting the corpus for one
scalar per group is the wrong plan; instead:

1. inside ``map_batches``, compress each batch to (group, value, count)
   partials — a batch of millions of rows becomes at most its distinct
   (group, value) pairs (combiner pattern, zero exchange);
2. ONE coarse-bucket exchange on the group key sums the partials and
   selects the requested quantiles per group with a sorted cumulative
   count + ``searchsorted`` (``PERCENTILE_DISC`` semantics: the element
   at 1-indexed position ``ceil(q*n)`` — DuckDB ``quantile_disc``,
   probed on ties/singletons/edge fractions).

Exact for any distribution; the exchange is distinct-value-sized, so
metric-like columns (scores, scaled cents, lengths) compress by orders
of magnitude.  For a column with ~no repeated values the partials
degenerate to the input — swap to a distributed sort-selection there
(the plan note the docstring of ``grouped_exact_quantiles`` carries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def grouped_exact_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
    *,
    expected_groups: int | None = None,
) -> ray.data.Dataset:
    """(group, q_<name>, ...) exact discrete quantiles per group.

    ``value_col`` should be integer (scale floats to cents first — the
    repo-wide integer-exactness discipline).  Output columns are
    ``p<q*100 with _ for .>`` e.g. p50, p99, p99_9.  At ~unique-valued
    columns prefer a sort-based selection; this plan is for metric-like
    columns whose (group, value) partials compress well.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        return c.astype({"cnt": "int64"})

    def name_of(q: float) -> str:
        s = f"{q * 100:.10g}".replace(".", "_")
        return f"p{s}"

    def select(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            agg = sub.groupby(value_col, sort=True)["cnt"].sum()
            vals = agg.index.to_numpy()
            cum = agg.to_numpy().cumsum()
            n = int(cum[-1])
            row = {group_col: g}
            for q in qs:
                pos = max(int(np.ceil(q * n)), 1)  # 1-indexed PERCENTILE_DISC
                row[name_of(q)] = int(vals[np.searchsorted(cum, pos, side="left")])
            rows.append(row)
        return pd.DataFrame(rows)

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        group_col,
        select,
        expected_rows=expected_groups,
    )
