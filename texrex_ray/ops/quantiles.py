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


def histogram_state(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    expected_groups: int | None = None,
) -> pd.DataFrame:
    """Mergeable (group, value, cnt) counting-histogram of a corpus —
    the PERSISTABLE state behind exact quantiles: histograms add, so a
    corpus ingested in shards keeps exact quantiles WITHOUT ever
    re-scanning history (q91's mergeable-monoid contract, here for
    order statistics).  Domain-sized, one keyed exchange."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        return c.astype({"cnt": "int64"})

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, value_col],
        lambda g: g.groupby([group_col, value_col], as_index=False)["cnt"].sum(),
        expected_rows=expected_groups,
    ).to_pandas()


def quantiles_from_states(
    states: list[pd.DataFrame],
    group_col: str,
    value_col: str,
    qs: list[float],
) -> pd.DataFrame:
    """Exact PERCENTILE_DISC quantiles from merged histogram states.

    ``sum(states)`` is the only work — history histograms merge with the
    increment's by keyed addition; the discrete-quantile pick is
    identical to ``grouped_exact_quantiles``'s finish."""

    def name_of(q: float) -> str:
        s = f"{q * 100:.10g}".replace(".", "_")
        return f"p{s}"

    merged = (
        pd.concat(states, ignore_index=True)
        .groupby([group_col, value_col], as_index=False)["cnt"]
        .sum()
    )
    rows = []
    for g, sub in merged.groupby(group_col, sort=True):
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
