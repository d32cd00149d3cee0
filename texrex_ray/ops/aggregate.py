"""High-cardinality grouped aggregation.

Ray Data's native ``groupby().aggregate()`` reduces each group with
per-group Python overhead (measured ~0.1–2 ms/group on this host); at a
million distinct keys that is minutes for an exchange whose data volume
is trivial (q14's 1.27M pair rows → 1.13M groups: 484 s native, ~2 s
this way).  ``bucketed_groupby`` instead shuffles on a COARSE hash of
the key (tens of buckets, not millions of groups) and lets ONE
vectorized pandas combine handle each bucket's groups — exact, because
every row of a key lands in the same bucket.

Use the native aggregate for low-cardinality keys (≲ 50k groups, where
it is simpler and fine); use this when groups ≈ rows.  Memory per task
is one bucket ≈ ``rows / n_buckets``; ``auto_buckets`` scales the count
with the input like dedup/tender.py.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.dedup.tender import auto_buckets
from texrex_ray.ops.join import _finalize_arrow, _row_hash

_GB = "__gbucket"


def bucketed_groupby(
    ds: ray.data.Dataset,
    keys: str | list[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    n_buckets: int | None = None,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """Exact grouped aggregation for high-cardinality keys.

    ``combine`` receives one bucket's rows (all rows of every key hashed
    there) as a pandas DataFrame and must return the aggregated frame —
    typically ``df.groupby(keys).agg(...).reset_index()``.  It must be a
    pure per-key aggregation (no cross-key state), which is what makes
    coarse bucketing exact.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if n_buckets is None:
        n_buckets = auto_buckets(expected_rows, target_bucket_rows=100_000)
    shuffle_blocks = (
        max(8, min(256, int(np.ceil(expected_rows / 50_000)))) if expected_rows else 16
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = (_row_hash(df, keys) % np.uint64(n_buckets)).astype(np.int64)
        return df.assign(**{_GB: b})

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = combine(g.drop(columns=[_GB]))
        return _finalize_arrow(out)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .repartition(shuffle_blocks)
        .groupby(_GB)
        .map_groups(run, batch_format="pandas")
    )
