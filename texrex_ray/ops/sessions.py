"""Sessionization: gap-based event sessions per user.

The canonical user-behavior operator for event streams (and the shape of
per-source "crawl sessions" over fetch logs): events of one user, ordered
by time, belong to one session until a gap longer than ``gap_us`` opens.

Scale shape: ONE coarse-bucket exchange on the user key
(``bucketed_groupby`` — per-task memory is a bucket of users, not a
user), then per-bucket assignment is three vectorized pandas passes
(sort, per-user diff, cumsum).  No driver materialization; output is
session-sized.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def sessionize(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_cols: tuple[str, ...] = (),
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """Per-session rows: (user, session_idx, n_events, start_us, end_us).

    ``session_idx`` is 0-based in time order per user; a new session
    starts when the gap since the previous event exceeds ``gap_us``
    (strictly greater — SQL ``ts - lag(ts) > gap`` semantics).
    ``order_cols`` break ts ties deterministically (gaps are computed on
    ts alone, so tie order never changes session membership)."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, *order_cols], kind="mergesort")
        us = df[ts_col].astype("int64")
        new_sess = us.groupby(df[user_col], sort=False).diff().gt(gap_us)
        # first event of each user starts session 0 (diff -> NaN -> False,
        # so cumsum starts at 0 without special-casing)
        sidx = new_sess.astype("int64").groupby(df[user_col], sort=False).cumsum()
        g = pd.DataFrame(
            {user_col: df[user_col], "session_idx": sidx, "_us": us}
        ).groupby([user_col, "session_idx"], sort=False, as_index=False)
        out = g.agg(n_events=("_us", "size"), start_us=("_us", "min"),
                    end_us=("_us", "max"))
        return out.astype({"n_events": "int64"})

    return bucketed_groupby(ds, user_col, combine, expected_rows=expected_rows)
