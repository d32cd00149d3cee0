"""Exact deduplication.

Reference semantics: DuplicateDetector adds a 64-byte stride fingerprint of
each document to a global scaling Bloom filter; the first document wins and
later identical ones are killed (ref: trduplicatedetector.pas:114-122,
trdata.pas:1195-1211).  Two Ray-native variants:

- batch variant (here): content-hash column → ``groupby(hash).min(id)`` —
  deterministic keep-first-by-id, an exact shuffle-based dedup;
- streaming variant: the sharded Bloom actor pool in
  ``texrex_ray.state.bloom`` (first-wins in arrival order), used by the
  crawler where Bloom semantics are required.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from texrex_ray.functions.hashing import md5_hex


def with_md5(ds: ray.data.Dataset, text_col: str = "text", out_col: str = "text_md5") -> ray.data.Dataset:
    def add(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_col, pa.array([md5_hex(s or "") for s in t[text_col].to_pylist()], pa.string())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def exact_dedup_keep_ids(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Ids that survive exact dedup (min id per content hash).

    The groupby shuffle moves only (hash, id) pairs — the text column is
    projected away before the exchange.
    """
    hashed = with_md5(ds, text_col=text_col).select_columns(["text_md5", id_col])
    return (
        hashed.groupby("text_md5")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def exact_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Full-row dedup: keep the min-id row per content hash.

    Keeps rows (not just ids) by shuffling on the hash and taking the
    min-id row per group.
    """
    import pandas as pd

    hashed = with_md5(ds, text_col=text_col)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("text_md5").map_groups(first, batch_format="pandas")
