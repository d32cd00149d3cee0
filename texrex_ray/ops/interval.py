"""Interval and as-of joins: ordered-key lookups Ray Data lacks natively.

Both operators broadcast a SMALL sorted side once (``ray.put``) and
resolve every probe batch with one vectorized ``np.searchsorted`` — the
probe side streams and never shuffles.  This is the geolocator's
IP-interval lookup shape (ref: trgeolocator.pas:131-171) and the temporal
checkpoint lookup of q43:

- ``range_join``: value → enclosing interval from a non-overlapping
  interval table (quantity bands, IP blocks, size classes).
- ``asof_join``: timestamp → most recent right row at-or-before it
  (rate checkpoints, config epochs, model versions).

The broadcast-small assumption is structural for these workloads: an
interval/checkpoint table is the *summary* side (bands, windows, epochs)
— KBs to MBs at any corpus scale.  A genuinely big-big as-of needs a
time-bucketed shuffle plan with a per-bucket "latest predecessor"
pre-pass; none of the reference's pipelines require it, so it is out of
scope here (documented, not silently wrong: this function materializes
a Dataset right side and will be slow if misused on one that isn't
summary-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _small_side_df(right, sort_by: str) -> pd.DataFrame:
    if isinstance(right, ray.data.Dataset):
        right = right.to_pandas()  # summary-sized by contract (see module doc)
    elif isinstance(right, pa.Table):
        right = right.to_pandas()
    return right.sort_values(sort_by).reset_index(drop=True)


def _attach_names(
    left: ray.data.Dataset, attach: list[str], suffix: str
) -> dict[str, str]:
    """Output name per attach column: suffix ANY collision with the left
    schema (mirroring ops/join.py::_resolve_names) — an un-renamed clash
    would append_column a silent duplicate column name."""
    lcols = set(left.schema().names)
    out: dict[str, str] = {}
    for c in attach:
        # keep appending the suffix until the name clears the left schema
        # AND the names already resolved — left owning both 'x' and 'x_r'
        # while attaching 'x' must yield 'x_r_r', not a duplicate column
        name = c
        while name in lcols or (name != c and name in out.values()):
            name = name + suffix
        if name in out.values() or (name != c and name in attach):
            raise ValueError(
                f"attach column {c!r} still collides after suffix {suffix!r}"
            )
        out[c] = name
    return out


def range_join(
    left: ray.data.Dataset,
    intervals,
    value_col: str,
    *,
    lo_col: str = "lo",
    attach: list[str] | None = None,
    keep: str = "all",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Attach interval attributes to each row whose ``value_col`` falls in
    [lo_i, lo_{i+1}) of the sorted, non-overlapping interval table.

    ``intervals`` needs ``lo_col`` (ascending lower bounds; an interval
    runs to the next lower bound, the last one to +∞) plus the ``attach``
    columns to copy onto matches.  Rows below the first bound are dropped
    (``keep="matched"``) or passed through with nulls (``keep="all"``).
    Attach columns colliding with left columns gain ``suffix``.
    """
    iv = _small_side_df(intervals, lo_col)
    attach = attach or [c for c in iv.columns if c != lo_col]
    out_names = _attach_names(left, attach, suffix)
    ref = ray.put((iv[lo_col].to_numpy(), {c: iv[c].to_numpy() for c in attach}))

    def classify(t: pa.Table) -> pa.Table:
        los, cols = ray.get(ref)
        v = t[value_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, side="right") - 1
        ok = idx >= 0
        safe = np.maximum(idx, 0)
        out = t
        for c, arr in cols.items():
            vals = pa.array(arr[safe]) if ok.all() else pa.array(
                [arr[i] if o else None for i, o in zip(safe, ok)]
            )
            out = out.append_column(out_names[c], vals)
        if keep == "matched" and not ok.all():
            out = out.filter(pa.array(ok))
        return out

    return left.map_batches(classify, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right,
    on: str,
    *,
    right_on: str | None = None,
    attach: list[str] | None = None,
    keep: str = "matched",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """For each left row, attach the right row with the greatest
    ``right_on`` ≤ the left row's ``on`` (backward as-of; DuckDB
    ``ASOF JOIN`` / pandas ``merge_asof`` semantics).

    The right side sorts once, broadcasts once; each probe batch is one
    ``searchsorted``.  ``keep="matched"`` drops left rows before the
    first checkpoint (inner ASOF); ``keep="all"`` nulls them (left ASOF).
    """
    right_on = right_on or on
    r = _small_side_df(right, right_on)
    attach = attach or [c for c in r.columns if c != right_on]
    out_names = _attach_names(left, attach, suffix)
    ref = ray.put((r[right_on].to_numpy(), {c: r[c].to_numpy() for c in attach}))

    def asof(t: pa.Table) -> pa.Table:
        ts, cols = ray.get(ref)
        v = t[on].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ts, v, side="right") - 1
        ok = idx >= 0
        safe = np.maximum(idx, 0)
        out = t
        for c, arr in cols.items():
            vals = pa.array(arr[safe]) if ok.all() else pa.array(
                [arr[i] if o else None for i, o in zip(safe, ok)]
            )
            out = out.append_column(out_names[c], vals)
        if keep == "matched" and not ok.all():
            out = out.filter(pa.array(ok))
        return out

    return left.map_batches(asof, batch_format="pyarrow")


def asof_join_by(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str,
    *,
    attach: list[str] | None = None,
    suffix: str = "_r",
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """PER-KEY backward as-of join: for each left row, the right row with
    the greatest ``on`` ≤ the left's ``on`` WITHIN the same ``by`` key —
    pandas ``merge_asof(by=...)`` / DuckDB ``ASOF JOIN ... AND l.k = r.k``
    semantics, but BIG-BIG: neither side broadcasts.

    This is the temporal join `asof_join` (broadcast summary side) cannot
    express: attributing each event to the same entity's most recent
    preceding event (last click before a purchase, config epoch per
    host, latest checkpoint per shard).  Plan: both sides union into ONE
    bucketed exchange on ``by`` (every key's rows co-locate), each bucket
    runs one vectorized ``pd.merge_asof`` across all its keys.  Ties on
    equal ``on`` within a key resolve to the LAST right row in
    (on, input-order) — pre-dedupe the right side per (by, on) when that
    matters for cross-engine parity.  Unmatched left rows keep nulls
    (left-asof).  Partitioning assumption (as session_count): one key's
    rows fit a bucket.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    attach = attach or [
        c for c in right.schema().names if c not in (on, by)
    ]
    out_names = _attach_names(left, attach, suffix)
    lcols = list(left.schema().names)
    l_types = dict(zip(left.schema().names, left.schema().types))
    r_types = dict(zip(right.schema().names, right.schema().types))
    _SIDE = "__asof_side"
    # superset layout both sides emit (the shuffle_join pattern): left
    # columns, then the RENAMED attach columns; the absent side's columns
    # are typed nulls so the union has one schema
    super_cols = lcols + [out_names[c] for c in attach]
    col_type = {**{c: l_types[c] for c in lcols},
                **{out_names[c]: r_types[c] for c in attach}}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in lcols}
        for c in attach:
            cols[out_names[c]] = pa.nulls(t.num_rows, col_type[out_names[c]])
        cols[_SIDE] = pa.array(np.full(t.num_rows, 0, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            if c in (by, on):
                cols[c] = pc.cast(t[c], col_type[c])
            else:
                cols[c] = pa.nulls(t.num_rows, col_type[c])
        for c in attach:
            cols[out_names[c]] = t[c]
        cols[_SIDE] = pa.array(np.full(t.num_rows, 1, np.int8))
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    ratt = [out_names[c] for c in attach]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g[_SIDE] == 0, lcols].sort_values(on, kind="mergesort")
        r = g.loc[g[_SIDE] == 1, [by, on] + ratt].sort_values(
            on, kind="mergesort"
        )
        if len(l) == 0:
            return pd.DataFrame(columns=super_cols)
        return pd.merge_asof(l, r, on=on, by=by, direction="backward")

    return bucketed_groupby(both, by, merge, expected_rows=expected_rows)
