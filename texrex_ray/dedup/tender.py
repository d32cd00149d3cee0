"""tender — near-duplicate detection via shingle pair counting.

Ray-Data re-expression of the reference's three external-sort phases (ref:
trtenderapplication.pas:340-632; pair generation trshinglehelpers.pas:
430-548): the manual sort-run/merge machinery collapses into
``groupby(shingle) → C(n,2) pairs → groupby(pair).count() → filter ≥ t``.

Semantics kept from the reference:
- shingle groups of ``max_redundancy`` (default 200) or more docs are
  skipped — the reference requires strictly ``Length(AShinglePacks) <
  FMaximalRedundancy`` (the hot-shingle skew cap,
  trshinglehelpers.pas:436-437), so a group of exactly 200 emits nothing;
- each pair is ordered smaller-document-first, "smaller" = (doc_size,
  doc_id) lexicographic (trshinglehelpers.pas:445-452);
- pairs sharing ≥ ``pair_threshold`` (default 5) shingles blacklist the
  SMALLER document (trtenderapplication.pas:549-632).

Scale note: the shuffle key is the shingle value.  The production path
feeds 64-bit minhashes (``minhash_shingles``), so the exchange moves
(uint64, id, size) rows; the exact-n-gram variant (``gram_shingles``) is
for oracle parity and small corpora — hash grams to uint64 first at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from texrex_ray.functions.hashing import hash64, minhash_signatures
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE


def gram_shingles(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    n: int = 5,
    size_from_grams: bool = False,
) -> ray.data.Dataset:
    """Explode documents into DISTINCT space-joined token n-gram rows.

    Output schema: (doc_id, shingle: string, doc_size: int64).
    ``size_from_grams=True`` sets doc_size to the DISTINCT-gram count (the
    Jaccard set size) so downstream pair math needs no extra sizes shuffle.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids, grams, sizes = [], [], []
        texts = t[text_col].to_pylist()
        id_vals = t[id_col].to_pylist()
        size_vals = (
            t[size_col].to_pylist()
            if (size_col and not size_from_grams)
            else [len(s or "") for s in texts]
        )
        for did, s, sz in zip(id_vals, texts, size_vals):
            toks = LATIN_TOKEN_RE.findall((s or "").lower())
            seen = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            if size_from_grams:
                sz = len(seen)
            for g in seen:
                ids.append(did)
                grams.append(g)
                sizes.append(sz)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shingle": pa.array(grams, pa.string()),
                "doc_size": pa.array(sizes, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def minhash_shingles(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    k: int = 100,
    n: int = 5,
    scheme: str = "rabin",
) -> ray.data.Dataset:
    """Explode documents into k minhash rows (the reference's shingle file).

    Output schema: (doc_id, shingle: uint64, doc_size: int64) — k rows per
    document, exactly the writer layout of trwritetools.pas:419-441 minus
    the fixed-width text encoding.

    ``scheme="rabin"`` (default) is the reference-faithful fingerprint:
    Rabin64 under the first k polynomials of the ported trpoly64 table over
    UPPER-cased space-padded 5-grams (trshingler.pas:97-150) — values are
    interchangeable with reference-produced shingle files, and documents
    with fewer than n tokens emit NO rows (the reference skips them).
    ``scheme="fast"`` is the xxhash+affine-permutation construction (same
    minhash family, cheaper, NOT value-compatible).
    """

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in texts]
        id_vals = t[id_col].to_pylist()
        size_vals = (
            t[size_col].to_pylist() if size_col else [len(s or "") for s in texts]
        )
        if scheme == "rabin":
            from texrex_ray.functions.rabin import rabin_minhash_signatures

            sig, has_fp = rabin_minhash_signatures(toks, k=k, n=n)
            keep = np.flatnonzero(has_fp)
            sig = sig[keep]
            id_vals = [id_vals[i] for i in keep]
            size_vals = [size_vals[i] for i in keep]
        else:
            sig = minhash_signatures(toks, k=k, n=n)
        ids = [d for d in id_vals for _ in range(k)]
        sizes = [s for s in size_vals for _ in range(k)]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shingle": pa.array(sig.reshape(-1)),
                "doc_size": pa.array(sizes, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def auto_buckets(
    expected_rows: int | None,
    target_bucket_rows: int = 250_000,
    lo: int = 64,
    hi: int = 1 << 16,
) -> int:
    """Bucket count ∝ input size so one bucket ≈ one in-memory group.

    A FIXED bucket count makes each bucket ~corpus/N — terabytes at the
    100 TB design point.  Scaling buckets with the shingle row count keeps
    every ``map_groups`` group near ``target_bucket_rows`` rows regardless
    of corpus size (the shuffle fan-out grows instead, which Ray handles).
    """
    if not expected_rows:
        return lo
    return max(lo, min(hi, int(np.ceil(expected_rows / target_bucket_rows))))


def shingle_pairs(
    shingles: ray.data.Dataset,
    max_redundancy: int = 200,
    order_by_size: bool = True,
    n_buckets: int | None = None,
    carry_sizes: bool = False,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """Phase 2: per-shingle C(n,2) pair generation, smaller doc first.

    ``order_by_size=True`` orders pairs by (doc_size, doc_id) per the
    reference; ``False`` orders by doc_id alone (the Jaccard variant).
    ``carry_sizes=True`` adds (size_small, size_big) columns so consumers
    that need per-doc set sizes (Jaccard union math) get them through the
    pair groupby instead of a driver-broadcast size dict.

    Implementation: a bucketed hash self-join, NOT per-group UDF calls —
    shingles hash into ``n_buckets`` coarse partitions (the only shuffle),
    and each bucket computes all its groups' pairs with one vectorized
    pandas self-merge.  The ``max_redundancy`` cap (ref:
    trshinglehelpers.pas:436-437) drops hot shingles before the merge, so
    skewed shingles cannot blow up a bucket.

    ``n_buckets=None`` sizes the bucket count from ``expected_rows`` (pass
    n_docs × k for minhash shingles) via ``auto_buckets`` so per-bucket
    memory stays flat as the corpus grows; pair membership is independent
    of the bucket count (same-shingle rows always co-bucket), tested.
    """
    if n_buckets is None:
        n_buckets = auto_buckets(expected_rows)
    # Coalesce before the exchange: the sort shuffle's fixed cost grows
    # with map-blocks × reduce-slices, and the upstream minhash stage runs
    # wide (one block per read split) for CPU parallelism.  ~50k rows per
    # shuffle block keeps the exchange overhead-free at small scale and
    # harmless at large scale (blocks are already bigger than this).
    shuffle_blocks = (
        max(8, min(256, int(np.ceil(expected_rows / 50_000)))) if expected_rows else 16
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t["shingle"]
        if pa.types.is_unsigned_integer(col.type) or pa.types.is_integer(col.type):
            h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            h = hash64(col.to_pylist())
        return t.append_column("bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        counts = g["shingle"].value_counts()
        # strict < per the reference (trshinglehelpers.pas:436-437)
        ok = counts[(counts >= 2) & (counts < max_redundancy)].index
        id_dtype = g["doc_id"].dtype
        g = g[g["shingle"].isin(ok)][["shingle", "doc_id", "doc_size"]]
        if g.empty:
            cols = {
                "id_small": pd.Series([], dtype=id_dtype),
                "id_big": pd.Series([], dtype=id_dtype),
            }
            if carry_sizes:
                cols["size_small"] = pd.Series([], dtype="int64")
                cols["size_big"] = pd.Series([], dtype="int64")
            return pd.DataFrame(cols)
        m = g.merge(g, on="shingle", suffixes=("_x", "_y"))
        if order_by_size:
            keep = (m["doc_size_x"] < m["doc_size_y"]) | (
                (m["doc_size_x"] == m["doc_size_y"]) & (m["doc_id_x"] < m["doc_id_y"])
            )
        else:
            keep = m["doc_id_x"] < m["doc_id_y"]
        m = m[keep]
        cols = {"id_small": m["doc_id_x"].to_numpy(), "id_big": m["doc_id_y"].to_numpy()}
        if carry_sizes:
            cols["size_small"] = m["doc_size_x"].to_numpy()
            cols["size_big"] = m["doc_size_y"].to_numpy()
        return pd.DataFrame(cols)

    return (
        shingles.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(shuffle_blocks)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def count_pairs(
    pairs: ray.data.Dataset,
    pair_threshold: int = 5,
    expected_pairs: int | None = None,
) -> ray.data.Dataset:
    """Phase 3: count identical pairs, keep those sharing ≥ threshold.

    Exchange choice: the pair stream is orders of magnitude smaller than
    the shingle stream (only co-bucketed near-duplicates emit rows), so by
    default the count runs as ONE combine task over the coalesced pairs —
    no second sort shuffle (measured 5× faster at sf0.1, identical rows).
    When the caller expects a pair volume beyond a single block
    (``expected_pairs`` > ~5M — the 100 TB path), the count falls back to
    the keyed ``groupby`` exchange.
    """
    if expected_pairs is not None and expected_pairs > 5_000_000:
        counted = pairs.groupby(["id_small", "id_big"]).aggregate(
            Count(alias_name="n_shared")
        )
        return counted.filter(expr=f"n_shared >= {int(pair_threshold)}")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["id_small", "id_big"], sort=False)
            .size()
            .reset_index(name="n_shared")
        )
        return c[c["n_shared"] >= int(pair_threshold)]

    return pairs.repartition(1).map_batches(
        combine, batch_format="pandas", batch_size=None
    )


def blacklist(near_dup_pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct smaller-doc ids from the surviving pairs (the blacklist)."""
    return (
        near_dup_pairs.select_columns(["id_small"])
        .groupby("id_small")
        .count()
        .select_columns(["id_small"])
    )


def tender(
    ds: ray.data.Dataset,
    *,
    use_minhash: bool = True,
    pair_threshold: int = 5,
    max_redundancy: int = 200,
    k: int = 100,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    scheme: str = "rabin",
) -> ray.data.Dataset:
    """Full tender: documents → near-dup pairs (id_small, id_big, n_shared)."""
    mk = minhash_shingles if use_minhash else gram_shingles
    kw = {"k": k, "n": n, "scheme": scheme} if use_minhash else {"n": n}
    # deliberately LAZY: the bucket sort exchange samples + shuffles its
    # input, re-running the shingle explode — but recomputing Rabin
    # fingerprints is CHEAPER than pinning the stream through the object
    # store (A/B at sf0.1: lazy 2.96 s vs materialized 3.32 s best-of-3).
    # Contrast q87, whose expensive window explode IS worth pinning.
    sh = mk(ds, id_col=id_col, text_col=text_col, size_col=size_col, **kw)
    try:
        n_docs = ds.count()  # metadata-only on parquet reads
    except Exception:  # noqa: BLE001 — sizing hint only
        n_docs = None
    expected = n_docs * (k if use_minhash else 256) if n_docs else None
    # pair-volume hint: in the dedup regime ~10% of docs sit in a dup
    # cluster and each contributes ≤ k pair rows, so n_docs·k/10 is the
    # right order of magnitude — small corpora keep the measured-faster
    # single-combine count, while a corpus past ~500M docs·k actually
    # reaches count_pairs' >5M keyed-groupby plan (which a missing hint
    # used to make unreachable from this entry point)
    expected_pairs = (
        n_docs * (k if use_minhash else 256) // 10 if n_docs else None
    )
    return count_pairs(
        shingle_pairs(sh, max_redundancy, expected_rows=expected),
        pair_threshold,
        expected_pairs=expected_pairs,
    )
