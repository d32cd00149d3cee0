"""Streaming-style window operators over event Datasets.

``hop_window``  — expand each row into its covering sliding windows
(size/step), vectorized per batch; downstream aggregation is an ordinary
(keys, window_start) groupby.  This is exactly what a streaming engine's
hop-window operator lowers to in batch form.

``session_count`` — gap-based session windows per key: events sort
within their key, a gap > ``gap_s`` starts a new session.  Runs as a
coarse-bucket combine vectorized across ALL keys in a bucket
(``groupby(key).diff()``), not per-key ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def hop_window(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    size_s: int,
    step_s: int,
    out_col: str = "window_start",
) -> ray.data.Dataset:
    """Add ``out_col`` (epoch seconds) by replicating each row into every
    window of length ``size_s`` advancing by ``step_s`` that covers it.

    ``size_s`` must be a multiple of ``step_s`` (the hop count is
    ``size_s // step_s``).  Row payloads are repeated via one vectorized
    take per batch — the fan-out factor is the hop count, independent of
    data volume.
    """
    if size_s % step_s:
        raise ValueError("size_s must be a multiple of step_s")
    hops = size_s // step_s

    _PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}

    def expand(t: pa.Table) -> pa.Table:
        unit = t[ts_col].type.unit  # timestamps arrive in whatever unit the block carries
        raw = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        # numpy // FLOORS, matching the window arithmetic below and SQL
        # date_trunc; pc.divide truncates toward zero and would misassign
        # pre-1970 timestamps to the window one step late
        es = raw // _PER_S[unit]
        base = (es // step_s) * step_s
        n = len(base)
        idx = np.tile(np.arange(n), hops)
        starts = np.concatenate([base - k * step_s for k in range(hops)])
        out = t.take(pa.array(idx))
        return out.append_column(out_col, pa.array(starts, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def session_count(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    *,
    gap_s: float,
    tiebreak: str | None = None,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """(key, n_sessions, n_events): gap-based session windows per key.

    Partitioning assumption: one key's events fit one bucket group (holds
    at any realistic per-user volume; a pathologically hot key would be
    salted by day first).  The combine is vectorized across every key in
    the bucket: one sort + ``groupby(key).diff()``.
    """
    tb = [tiebreak] if tiebreak else []

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col] + tb)
        gap = df.groupby(key, sort=False)[ts_col].diff().dt.total_seconds()
        new_sess = (gap.isna() | (gap > gap_s)).astype("int64")
        out = df.assign(__ns=new_sess).groupby(key, sort=False).agg(
            n_sessions=("__ns", "sum"), n_events=("__ns", "size")
        )
        return out.reset_index()

    return bucketed_groupby(ds, key, combine, expected_rows=expected_rows)


def running_totals(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: list[str],
    value_col: str,
    *,
    out_n: str = "cum_n",
    out_sum: str = "cum_sum",
    expected_rows: int | None = None,
) -> "ray.data.Dataset":
    """Per-key running count + running sum in event order — the ordered
    windowed aggregate (SQL ``ROWS UNBOUNDED PRECEDING``) Ray Data has no
    native operator for.

    Partitioning assumption (same as ``session_count``): one key's rows
    fit one bucket group — per-user/per-host event volumes satisfy this
    at any realistic scale, and a pathologically hot key would be
    time-salted first with per-salt offsets chained afterwards.  Each
    bucket runs ONE vectorized sort + grouped cumsum/cumcount across all
    its keys; this host's cumsum pathology applies to huge flat arrays,
    not these bucket-sized ones.  ``value_col`` must already be integer
    (scale your floats first) so running sums are exact.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        g = df.groupby(key, sort=False)
        df[out_n] = g.cumcount() + 1
        df[out_sum] = g[value_col].cumsum()
        return df

    return bucketed_groupby(ds, key, combine, expected_rows=expected_rows)


def prefix_scan_max(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    *,
    out: str = "prev_max",
    n_buckets: int = 64,
    sentinel: int = -(2**62),
) -> ray.data.Dataset:
    """EXCLUSIVE global running maximum of ``value_col`` in
    ``order_col`` order — the watermark primitive (`MAX(...) OVER
    (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`) that
    Ray Data has no native operator for, built WITHOUT a global sort:

    1. range-partition rows into ``n_buckets`` contiguous ``order_col``
       slices (one hash-free map pass; slice width from the column's
       min/max, so bucket order == order order),
    2. per-bucket max via an ordinary groupby (bucket-count-sized
       result on the driver),
    3. exclusive prefix-max across the bucket maxima (driver-side,
       n_buckets values), broadcast as each bucket's carry-in,
    4. one bucketed combine per slice: sort within the slice, shifted
       cummax seeded with the carry.

    Two narrow exchanges total, both on integer keys; no stage ever
    holds more than one slice.  The globally-first row gets
    ``sentinel`` (no earlier value exists).  ``value_col`` and
    ``order_col`` must be integers; ties in ``order_col`` are broken
    by treating equal-order rows in ``value_col`` order inside the
    slice (deterministic, but give rows a unique order key — e.g. an
    arrival id — if tie semantics matter)."""
    lo = ds.min(order_col)
    hi = ds.max(order_col)
    if lo is None:  # empty input: emit the schema, no rows

        def add_empty(t: pa.Table) -> pa.Table:
            return t.append_column(
                out, pa.array([0] * t.num_rows, pa.int64())
            )

        return ds.map_batches(add_empty, batch_format="pyarrow")
    width = max((int(hi) - int(lo)) // n_buckets + 1, 1)

    def assign(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (o - int(lo)) // width
        return t.append_column("_psm_bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max

    bmax = (
        bucketed.groupby("_psm_bucket")
        .aggregate(Max(value_col, alias_name="_m"))
        .to_pandas()
        .sort_values("_psm_bucket")
    )
    # exclusive prefix over the (at most n_buckets) bucket maxima
    carry: dict[int, int] = {}
    run = sentinel
    for b, m in zip(bmax["_psm_bucket"], bmax["_m"]):
        carry[int(b)] = run
        run = max(run, int(m))
    carry_ref = ray.put(carry)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        parts = []
        for b, sub in df.groupby("_psm_bucket", sort=False):
            sub = sub.sort_values([order_col, value_col], kind="mergesort")
            v = sub[value_col].to_numpy().astype(np.int64)
            prev = np.empty(len(v), dtype=np.int64)
            seed = c.get(int(b), sentinel)
            if len(v):
                prev[0] = seed
                if len(v) > 1:
                    prev[1:] = np.maximum.accumulate(
                        np.maximum(v[:-1], seed)
                    )
            sub = sub.copy()
            sub[out] = prev
            parts.append(sub)
        res = pd.concat(parts) if parts else df.assign(**{out: []})
        return res.drop(columns=["_psm_bucket"])

    return bucketed_groupby(
        bucketed, "_psm_bucket", combine, n_buckets=n_buckets
    )


def prefix_scan_sum(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    *,
    out: str = "prev_sum",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col``
    order — `SUM(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND
    1 PRECEDING)` with the same no-global-sort plan as
    ``prefix_scan_max``: contiguous range slices → bucket sums to the
    driver → exclusive carry broadcast → one in-slice vectorized
    cumsum.  Integer-exact (int64 — caller guarantees the global total
    fits).  The budget-cut primitive: "take rows in priority order
    until a budget is spent" is ``prev_sum + cost <= budget`` on this
    output, with no driver-side corpus materialization."""
    lo = ds.min(order_col)
    hi = ds.max(order_col)
    if lo is None:  # empty input: emit the schema, no rows

        def add_empty(t: pa.Table) -> pa.Table:
            return t.append_column(
                out, pa.array([0] * t.num_rows, pa.int64())
            )

        return ds.map_batches(add_empty, batch_format="pyarrow")
    width = max((int(hi) - int(lo)) // n_buckets + 1, 1)

    def assign(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (o - int(lo)) // width
        return t.append_column("_pss_bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Sum

    bsum = (
        bucketed.groupby("_pss_bucket")
        .aggregate(Sum(value_col, alias_name="_s"))
        .to_pandas()
        .sort_values("_pss_bucket")
    )
    carry: dict[int, int] = {}
    run = 0
    for b, m in zip(bsum["_pss_bucket"], bsum["_s"]):
        carry[int(b)] = run
        run += int(m)
    carry_ref = ray.put(carry)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        parts = []
        for b, sub in df.groupby("_pss_bucket", sort=False):
            sub = sub.sort_values([order_col, value_col], kind="mergesort")
            v = sub[value_col].to_numpy().astype(np.int64)
            prev = np.empty(len(v), dtype=np.int64)
            seed = c.get(int(b), 0)
            if len(v):
                prev[0] = seed
                if len(v) > 1:
                    prev[1:] = seed + np.cumsum(v[:-1])
            sub = sub.copy()
            sub[out] = prev
            parts.append(sub)
        res = pd.concat(parts) if parts else df.assign(**{out: []})
        return res.drop(columns=["_pss_bucket"])

    return bucketed_groupby(
        bucketed, "_pss_bucket", combine, n_buckets=n_buckets
    )


def windowed_min(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    *,
    window: int,
    out: str = "win_min",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Global rolling minimum over the ``window`` rows ending at each
    row in ``order_col`` order — ``MIN(value) OVER (ORDER BY order
    ROWS window-1 PRECEDING)`` — via contiguous range slices plus a
    HALO exchange: each slice needs only the last ``window - 1`` rows
    of its predecessor slices, so the cross-slice traffic is
    (window-1) x n_buckets rows through the driver, never a global
    sort.  Ties in ``order_col`` are broken by ``value_col`` (give
    rows a unique order key when tie semantics matter — the callers
    here pack one).  Integer columns only."""
    lo = ds.min(order_col)
    hi = ds.max(order_col)
    if lo is None:

        def add_empty(t: pa.Table) -> pa.Table:
            return t.append_column(
                out, pa.array([0] * t.num_rows, pa.int64())
            )

        return ds.map_batches(add_empty, batch_format="pyarrow")
    width = max((int(hi) - int(lo)) // n_buckets + 1, 1)

    def assign(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (o - int(lo)) // width
        return t.append_column("_wm_bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(assign, batch_format="pyarrow").materialize()

    # per-bucket TAILS (last window-1 rows) -> driver -> per-bucket halo
    def tails(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for b, sub in df.groupby("_wm_bucket", sort=False):
            sub = sub.sort_values([order_col, value_col], kind="mergesort")
            parts.append(sub.tail(window - 1))
        return pd.concat(parts) if parts else df

    from texrex_ray.ops.aggregate import bucketed_groupby

    tail_df = (
        bucketed_groupby(bucketed, "_wm_bucket", tails, n_buckets=n_buckets)
        .to_pandas()
        .sort_values(["_wm_bucket", order_col, value_col], kind="mergesort")
    )
    halos: dict[int, pd.DataFrame] = {}
    seen: list[pd.DataFrame] = []
    for b in sorted(tail_df["_wm_bucket"].unique()):
        prev = pd.concat(seen).tail(window - 1) if seen else tail_df.iloc[:0]
        halos[int(b)] = prev
        seen.append(tail_df[tail_df["_wm_bucket"] == b])
    halo_ref = ray.put(halos)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(halo_ref)
        parts = []
        for b, sub in df.groupby("_wm_bucket", sort=False):
            halo = h.get(int(b), sub.iloc[:0])
            n_h = len(halo)
            full = pd.concat([halo, sub]).sort_values(
                [order_col, value_col], kind="mergesort"
            )
            mins = (
                full[value_col].rolling(window, min_periods=1).min()
                .to_numpy(np.int64)
            )
            res = full.iloc[n_h:].copy()
            res[out] = mins[n_h:]
            parts.append(res)
        res = pd.concat(parts) if parts else df.assign(**{out: []})
        return res.drop(columns=["_wm_bucket"])

    return bucketed_groupby(bucketed, "_wm_bucket", combine,
                            n_buckets=n_buckets)
