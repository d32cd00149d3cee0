"""Band self-join: all pairs within a value distance delta.

The inequality-join sibling of `ops/interval.py`'s range/as-of joins:
``|v_a - v_b| <= delta`` over a numeric column (price matching, near-
timestamp reconciliation, sensor alignment).  A hash join cannot express
it and a sort-merge needs the whole sorted axis in one place; the
distributed shape is VALUE BUCKETING at width delta — a pair within
delta spans at most two ADJACENT buckets, so each point is exchanged to
its own bucket plus (as a ghost) the next one, and every qualifying pair
meets exactly once:

- same-bucket pairs form among a bucket's own points;
- cross-bucket pairs form between a bucket's own points and its ghosts
  (the previous bucket's points); ghost–ghost pairs are never formed.

ONE bucketed exchange of (bucket, id, value) rows, ~2x replication;
within a bucket the join is a vectorized sorted two-pointer window, so
per-task cost is O(bucket rows x average band occupancy), never the
global cross product.  Integer values in, integer distances out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def band_join_self(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    value_col: str,
    delta: int,
    expected_rows: int | None = None,
) -> pd.DataFrame:
    """Pairs (id_a < id_b, dist = |v_a - v_b| <= delta), exact.

    ``value_col`` must be integer-valued (scale floats to cents first —
    the repo-wide exact-arithmetic contract).
    """
    if delta < 0:
        raise ValueError("delta must be >= 0")
    width = max(delta, 1)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype("int64")
        g = v // width  # floor division: negatives bucket correctly
        own = pd.DataFrame({"g": g, "id": df[id_col], "v": v, "ghost": 0})
        gh = pd.DataFrame({"g": g + 1, "id": df[id_col], "v": v, "ghost": 1})
        return pd.concat([own, gh], ignore_index=True)

    def _window_pairs(cnt, lo):
        """Indices for per-row windows [lo[i], lo[i]+cnt[i]) — the
        repeat/cumsum trick, no Python loop."""
        total = int(cnt.sum())
        src = np.repeat(np.arange(len(cnt)), cnt)
        dst = (np.arange(total)
               - np.repeat(cnt.cumsum() - cnt, cnt)
               + np.repeat(lo, cnt))
        return src, dst

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # sorting by v sorts by (g, v) since g = v // width, so each
        # key's rows form one contiguous segment — window bounds are
        # global searchsorted results clipped to the segment, with NO
        # per-key Python loop (distinct keys ≈ value domain / width)
        outs = []
        own = df[df["ghost"] == 0].sort_values("v", kind="mergesort")
        gho = df[df["ghost"] == 1]
        ov = own["v"].to_numpy()
        oi = own["id"].to_numpy()
        og = own["g"].to_numpy()
        if len(ov):
            seg_end = np.searchsorted(og, og, side="right")
            hi = np.minimum(
                np.searchsorted(ov, ov + delta, side="right"), seg_end
            )
            idx = np.arange(len(ov))
            cnt = hi - idx - 1
            if cnt.sum() > 0:
                ia, jb = _window_pairs(cnt, idx + 1)
                outs.append((oi[ia], oi[jb], ov[jb] - ov[ia]))
            if len(gho):
                gv = gho["v"].to_numpy()
                gi = gho["id"].to_numpy()
                gk = gho["g"].to_numpy()  # routing key = own g to probe
                s0 = np.searchsorted(og, gk, side="left")
                s1 = np.searchsorted(og, gk, side="right")
                lo = np.maximum(
                    np.searchsorted(ov, gv - delta, side="left"), s0
                )
                hi2 = np.minimum(
                    np.searchsorted(ov, gv + delta, side="right"), s1
                )
                cnt2 = np.maximum(hi2 - lo, 0)
                if cnt2.sum() > 0:
                    ka, jb2 = _window_pairs(cnt2, lo)
                    outs.append(
                        (gi[ka], oi[jb2], np.abs(ov[jb2] - gv[ka]))
                    )
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        a = np.concatenate([t[0] for t in outs]).astype(np.int64)
        b = np.concatenate([t[1] for t in outs]).astype(np.int64)
        d = np.concatenate([t[2] for t in outs]).astype(np.int64)
        lo_, hi_ = np.minimum(a, b), np.maximum(a, b)
        keep = a != b
        return pd.DataFrame(
            {"id_a": lo_[keep], "id_b": hi_[keep], "dist": d[keep]}
        )

    out = bucketed_groupby(
        ds.map_batches(emit, batch_format="pandas"),
        "g", pairs, expected_rows=expected_rows,
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "dist": pd.Series([], dtype="int64")})
    out = out.drop_duplicates(["id_a", "id_b"])
    for c in ("id_a", "id_b", "dist"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
