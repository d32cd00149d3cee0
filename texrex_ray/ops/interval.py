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
        name = c + suffix if c in lcols else c
        if name in lcols and name != c + suffix:
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
