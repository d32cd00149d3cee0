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

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in df.groupby("g", sort=False):
            own = sub[sub["ghost"] == 0]
            gho = sub[sub["ghost"] == 1]
            ov = own["v"].to_numpy()
            oi = own["id"].to_numpy()
            order = np.argsort(ov, kind="stable")
            ov, oi = ov[order], oi[order]
            # own-own: sorted window two-pointer
            hi = np.searchsorted(ov, ov + delta, side="right")
            for i in range(len(ov)):
                for j in range(i + 1, hi[i]):
                    outs.append((oi[i], oi[j], ov[j] - ov[i]))
            # ghost-own: ghosts are the PREVIOUS bucket's points
            if len(gho) and len(ov):
                gv = gho["v"].to_numpy()
                gi = gho["id"].to_numpy()
                lo = np.searchsorted(ov, gv - delta, side="left")
                hi2 = np.searchsorted(ov, gv + delta, side="right")
                for k in range(len(gv)):
                    for j in range(lo[k], hi2[k]):
                        outs.append((gi[k], oi[j], abs(int(ov[j]) - int(gv[k]))))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        a = np.array([t[0] for t in outs], dtype=np.int64)
        b = np.array([t[1] for t in outs], dtype=np.int64)
        d = np.array([t[2] for t in outs], dtype=np.int64)
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
