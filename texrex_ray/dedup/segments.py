"""Cross-document segment-level exact dedup (CCNet-style keep-first).

Paragraph/segment dedup is the workhorse of web-corpus cleaning: the same
boilerplate sentence appears in thousands of documents, and only the
globally FIRST occurrence (by corpus order) should survive.  The
reference's DuplicateDetector (§2.2#1) and DivDeduplicator (§2.2#14)
dedup whole documents / within-document divs; this operator closes the
cross-document sub-document gap.

Scale shape (the only part that matters at 100 TB):

- documents are exploded into fixed-width token segments where they sit
  (``map_batches``, no shuffle);
- the ONE exchange is a ``bucketed_groupby`` on a 128-bit content hash
  of the segment (two independent keyed siphash64 columns) — a coarse
  hash shuffle whose per-task memory is a bucket, not a key, and whose
  rows carry 20 bytes instead of the segment text (Ray's native
  per-group reduce would pay ~ms per distinct segment).  The birthday
  bound at 10^12 distinct segments is ~1.5e-15; a byte-length witness
  travels with each row and any same-hash/different-length pair raises
  loudly (``key_mode="text"`` keeps the exact text exchange);
- winners (global-min occurrence key per segment) reduce to per-doc
  counts via a second, RESULT-sized bucketed sum — no join, the totals
  and kept partial rows are unioned and summed under the same key.

The occurrence key packs (doc_id, segment_index) as ``doc_id * 2^20 +
idx`` so "first by doc order, then by position" is a single int64 min —
documents longer than 2^20 segments are rejected loudly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby

SEG_SHIFT = 20
SEG_MOD = 1 << SEG_SHIFT

# Two independent 16-byte siphash keys -> a 128-bit composite content
# hash.  Exchange-only (never persisted), so cross-version stability is
# not required — same contract as ops.join._row_hash.
_HK1 = "texrex-seg-h1-k!"
_HK2 = "texrex-seg-h2-k!"


def hash128(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 128-bit content hash of a string Series (two keyed
    siphash64 halves, viewed int64 for Arrow friendliness)."""
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_HK1)
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_HK2)
    return h1.to_numpy().view(np.int64), h2.to_numpy().view(np.int64)


def guard_collisions(g: pd.DataFrame, by: list[str], witness: str) -> None:
    """Raise loudly when two different-length texts share a 128-bit hash.

    Cheap per-bucket check: one vectorized transform("min") + compare.
    (Same-length collisions stay covered only by the 2^-128 birthday
    bound — the witness costs 4 bytes/row, the text would cost the
    corpus.)"""
    if (g.groupby(by, sort=False)[witness].transform("min") != g[witness]).any():
        raise ValueError(
            "128-bit content-hash collision: one hash key covers texts of "
            "different lengths — rerun with key_mode='text'"
        )


def segment_rows(
    ds: ray.data.Dataset, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Explode docs into non-overlapping full ``n``-token segments.

    Rows: (s = the segment text, key = doc_id * 2^20 + segment_index).
    """

    def explode(t: pa.Table) -> pa.Table:
        segs: list[str] = []
        keys: list[int] = []
        for i, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = (s or "").split(" ")
            k = len(toks) // n
            if k >= SEG_MOD:
                raise ValueError(f"doc {i}: {k} segments >= 2^{SEG_SHIFT}")
            base = int(i) << SEG_SHIFT
            for j in range(k):
                segs.append(" ".join(toks[j * n : (j + 1) * n]))
                keys.append(base + j)
        return pa.table({"s": pa.array(segs, pa.string()), "key": pa.array(keys, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def segment_dedup_counts(
    ds: ray.data.Dataset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    expected_rows: int | None = None,
    key_mode: str = "hash128",
) -> ray.data.Dataset:
    """Per-doc (doc_id, n_segs, n_kept): segments surviving global keep-first.

    A segment instance is KEPT iff it is the minimal (doc_id, position)
    occurrence of its text corpus-wide.  Docs with no full segment are
    omitted (they carry nothing to dedup).  ``key_mode="hash128"``
    (default) exchanges a 128-bit content hash + length witness instead
    of the segment text — see the module docstring; ``"text"`` keeps the
    exact-text exchange.
    """
    if key_mode not in ("hash128", "text"):
        raise ValueError(f"unknown key_mode={key_mode!r}")
    segs = segment_rows(ds, n=n, id_col=id_col, text_col=text_col)

    if key_mode == "hash128":
        # fuses into the explode task: the exchange never sees the text
        def to_hash(df: pd.DataFrame) -> pd.DataFrame:
            h1, h2 = hash128(df["s"])
            return pd.DataFrame(
                {
                    "h1": h1,
                    "h2": h2,
                    "slen": df["s"].str.len().to_numpy().astype(np.int32),
                    "key": df["key"].to_numpy(),
                }
            )

        segs = segs.map_batches(to_hash, batch_format="pandas")
        gkeys = ["h1", "h2"]

        def min_key(df: pd.DataFrame) -> pd.DataFrame:
            guard_collisions(df, gkeys, "slen")
            return df.groupby(gkeys, sort=False)["key"].min().reset_index()

    else:
        gkeys = ["s"]

        def min_key(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("s", sort=False)["key"].min().reset_index()

    winners = bucketed_groupby(segs, gkeys, min_key, expected_rows=expected_rows)

    def kept_partial(t: pa.Table) -> pa.Table:
        doc = np.asarray(t["key"].to_numpy(zero_copy_only=False)) >> SEG_SHIFT
        u, c = np.unique(doc, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(u, pa.int64()),
                "n_segs": pa.array(np.zeros(len(u), np.int64)),
                "n_kept": pa.array(c.astype(np.int64)),
            }
        )

    def totals(t: pa.Table) -> pa.Table:
        ids, ns = [], []
        for i, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            k = len((s or "").split(" ")) // n
            if k:
                ids.append(int(i))
                ns.append(k)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_segs": pa.array(ns, pa.int64()),
                "n_kept": pa.array([0] * len(ids), pa.int64()),
            }
        )

    both = winners.map_batches(kept_partial, batch_format="pyarrow").union(
        ds.map_batches(totals, batch_format="pyarrow")
    )

    def sum_counts(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(id_col, sort=False)[["n_segs", "n_kept"]].sum().reset_index()

    return bucketed_groupby(both, id_col, sum_counts, expected_rows=expected_rows)
