"""MinHash-LSH and SimHash near-duplicate detection (training-data ops).

Beyond the reference's tender pipeline: banded MinHash-LSH (shingle →
minhash → band → bucket groupby → candidate pairs → exact-Jaccard verify)
and SimHash with block-LSH candidate generation.

Both are Dataset-native end to end: candidate generation is a bucket
``groupby().map_groups`` with vectorized within-bucket pair merges (the
pattern proven in ``dedup/tender.py``), and verification runs inside the
pair groupby — no corpus-sized structure is ever materialized on the
driver.  Document ids keep their native dtype (int64 test ids and the
crawl corpus' 32-hex md5 string ids both compose).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

from texrex_ray.functions.hashing import hash64, minhash_signatures, simhash64
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE


def popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR); input uint64, output int64."""
    v = v.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    v -= (v >> np.uint64(1)) & m1
    v = (v & m2) + ((v >> np.uint64(2)) & m2)
    v = (v + (v >> np.uint64(4))) & m4
    return ((v * h01) >> np.uint64(56)).astype(np.int64)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 96,
    bands: int = 48,
    n: int = 5,
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """Near-dup pairs via banded LSH, verified with exact n-gram Jaccard.

    k/bands rows per band; a doc becomes a candidate when any band hashes
    identically with any other doc.  All pairs among candidate documents
    are then verified EXACTLY with the distributed tender pair machinery
    (shingle self-join restricted to candidate docs, set sizes carried
    through the pair groupby), so the output has no false positives and
    integer-exact threshold arithmetic (2·|∩| ≥ |∪| for J ≥ 0.5).

    Returns a Dataset (id_a, id_b, n_inter, n_union).

    Recall: with the default rows-per-band = 2 (k=96, bands=48) a true
    pair at J = 0.5 is missed with probability (1 − 0.25)^48 ≈ 1e-6; the
    only driver-side state is the candidate id list (small in the dedup
    regime), broadcast once for the corpus-scan filter — the tecl
    broadcast-small-side pattern, not a per-candidate gram map.
    """
    from texrex_ray.dedup.tender import gram_shingles, shingle_pairs

    rows_per_band = k // bands
    assert rows_per_band * bands == k

    def band_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in texts]
        sig = minhash_signatures(toks, k=k, n=n)
        ids, band_ids, band_hash = [], [], []
        id_vals = t[id_col].to_pylist()
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            keys = hash64([" ".join(map(str, row)) for row in seg], seed=b)
            ids.extend(id_vals)
            band_ids.extend([b] * len(id_vals))
            band_hash.extend(keys.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, t[id_col].type),
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(np.array(band_hash, dtype=np.uint64)),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        b = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array((b % np.uint64(64)).astype(np.int64)))

    def bucket_ids(g: pd.DataFrame) -> pd.DataFrame:
        """Distinct doc ids that share a (band, band_hash) with another doc."""
        counts = g.groupby(["band", "band_hash"])["doc_id"].transform("size")
        hit = g.loc[(counts >= 2), "doc_id"].drop_duplicates()
        return pd.DataFrame({"doc_id": hit.to_numpy()})

    cand_ids_ds = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pyarrow")
        # coalesce before the exchange: band rows are narrow (3 cols), and
        # the sort shuffle's fixed cost scales with block count (see
        # tender.shingle_pairs)
        .repartition(16)
        .groupby("bucket")
        .map_groups(bucket_ids, batch_format="pandas")
    )
    # candidate id list: the SMALL side (dedup regime) — broadcast once
    cand_ids = cand_ids_ds.to_pandas()["doc_id"].unique()
    if len(cand_ids) < 2:
        # empty result with the input's id dtype
        sample = pa.array([ds.take(1)[0][id_col]]).slice(0, 0)
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": sample,
                    "id_b": sample,
                    "n_inter": pa.array([], pa.int64()),
                    "n_union": pa.array([], pa.int64()),
                }
            )
        )
    cand_ref = ray.put(pa.array(cand_ids))

    def only_candidates(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=ray.get(cand_ref))
        return t.filter(mask)

    sh = gram_shingles(
        ds.map_batches(only_candidates, batch_format="pyarrow"),
        id_col=id_col,
        text_col=text_col,
        size_col=None,
        n=n,
        size_from_grams=True,
    )
    # nearly every pair row is its own group — Ray's native aggregate pays
    # per-group Python overhead there (q17 measured 215 s at sf0.1); the
    # coarse-bucket pandas combine is exact and seconds (see
    # ops/aggregate.py and BENCH/BASELINE.md)
    from texrex_ray.ops.aggregate import bucketed_groupby

    pairs = bucketed_groupby(
        shingle_pairs(
            sh,
            max_redundancy=10**9,
            order_by_size=False,
            carry_sizes=True,
            expected_rows=len(cand_ids) * 60,
        ),
        ["id_small", "id_big"],
        lambda g: g.groupby(["id_small", "id_big"], sort=False)
        .agg(
            n_inter=("size_small", "size"),
            sz_a=("size_small", "max"),
            sz_b=("size_big", "max"),
        )
        .reset_index(),
        expected_rows=len(cand_ids) * 250,
    )
    # integer-exact threshold: J >= t  ⇔  i * denom >= t_num * union
    t_num, t_den = (
        int(round(jaccard_threshold * 1000)),
        1000,
    )

    def verify(t: pa.Table) -> pa.Table:
        ni = pc.cast(t["n_inter"], pa.int64())
        nu = pc.cast(pc.subtract(pc.add(t["sz_a"], t["sz_b"]), ni), pa.int64())
        out = pa.table(
            {"id_a": t["id_small"], "id_b": t["id_big"], "n_inter": ni, "n_union": nu}
        )
        keep = pc.greater_equal(
            pc.multiply(ni, pa.scalar(t_den, pa.int64())),
            pc.multiply(nu, pa.scalar(t_num, pa.int64())),
        )
        return out.filter(keep)

    return pairs.map_batches(verify, batch_format="pyarrow")


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 12,
    shingle_n: int = 3,
    max_bucket: int = 100_000,
) -> ray.data.Dataset:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Signatures are computed over token ``shingle_n``-grams (word-order
    sensitive — a bag-of-words simhash confuses documents that merely
    share vocabulary), then ``hamming_pairs`` does the distributed
    radius search.  Returns a Dataset (id_a, id_b, hamming).
    """

    def sig_rows(t: pa.Table) -> pa.Table:
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in t[text_col].to_pylist()]
        grams = [
            [" ".join(tk[i : i + shingle_n]) for i in range(max(0, len(tk) - shingle_n + 1))]
            for tk in toks
        ]
        sh = simhash64(grams)
        return pa.table({"doc_id": t[id_col], "simhash": pa.array(sh)})

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow")
    return hamming_pairs(
        sigs,
        id_col="doc_id",
        sig_col="simhash",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def hamming_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 12,
    max_bucket: int = 100_000,
) -> ray.data.Dataset:
    """All pairs with Hamming(sig) ≤ max_hamming over ANY precomputed
    64-bit signature column (SimHash, image pHash, audio fingerprints).

    Candidate generation uses ``max_hamming + 1`` disjoint bit blocks:
    two signatures within Hamming ≤ d differ in at most d blocks, so with
    d+1 blocks at least one block matches exactly (pigeonhole) —
    candidate generation is COMPLETE for the advertised radius, fixing
    the 4-block scheme that only guaranteed d ≤ 3.  Wider radii mean
    narrower blocks (64 // (d+1) bits) and thus coarser buckets; at
    corpus scale prefer d ≤ 7 (8-bit blocks).  Exact Hamming
    verification runs vectorized inside each bucket group; everything is
    a Dataset — nothing corpus-sized touches the driver.

    Returns a Dataset (id_a, id_b, hamming).
    """
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    assert width >= 1, "max_hamming must be < 64"
    wmask = np.uint64((1 << width) - 1)

    if id_col != "doc_id" or sig_col != "simhash":
        ds = ds.map_batches(
            lambda t: t.select([id_col, sig_col]).rename_columns(
                ["doc_id", "simhash"]
            ),
            batch_format="pyarrow",
        )

    def block_rows(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for blk in range(n_blocks):
            val = (sig >> np.uint64(width * blk)) & wmask
            key = (np.int64(blk) << np.int64(width)) | val.astype(np.int64)
            parts.append(
                pa.table(
                    {"bkey": pa.array(key), "doc_id": t["doc_id"], "simhash": t["simhash"]}
                )
            )
        return pa.concat_tables(parts)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        id_dtype = g["doc_id"].dtype
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=id_dtype),
                "id_b": pd.Series([], dtype=id_dtype),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        g = g.drop_duplicates("doc_id")
        m = len(g)
        if m < 2 or m > max_bucket:
            return empty
        sig = g["simhash"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy()
        i, j = np.triu_indices(m, k=1)
        d = popcount64(sig[i] ^ sig[j])
        keep = d <= max_hamming
        if not keep.any():
            return empty
        a, b = ids[i[keep]], ids[j[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"id_a": a2, "id_b": b2, "hamming": d[keep]})

    pairs = (
        ds.map_batches(block_rows, batch_format="pyarrow")
        .repartition(16)  # coalesce narrow block rows before the exchange
        .groupby("bkey")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a pair can surface from several blocks: reduce to one row.  The pair
    # stream is result-sized (near-dups only), so one combine task beats a
    # second sort shuffle; a corpus expecting >~5M raw pair rows would use
    # groupby(["id_a","id_b"]).aggregate(Min) here (see tender.count_pairs).
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["id_a", "id_b"], sort=False, as_index=False)["hamming"]
            .min()
        )

    return pairs.repartition(1).map_batches(
        dedup_pairs, batch_format="pandas", batch_size=None
    )
