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

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

from texrex_ray.functions.hashing import hash64, minhash_signatures, simhash64
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

_LOG = logging.getLogger("texrex_ray.dedup.lsh")


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
    max_candidates: int = 50_000_000,
    expected_rows: int | None = None,
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

    # Candidate-stage bucket count scales with docs × bands (the row count
    # entering the exchange): a FIXED modulus makes each map_groups group
    # ~rows/64 — a per-task OOM at the 100 TB design point, not merely a
    # slow stage.  Same auto_buckets policy as tender's shingle self-join.
    # Result-invariant: rows sharing a band_hash land in one bucket under
    # ANY modulus, and the per-bucket hit sets are deduped downstream.
    from texrex_ray.dedup.tender import auto_buckets

    n_coarse = auto_buckets(expected_rows * bands if expected_rows else None)

    def coarse(t: pa.Table) -> pa.Table:
        b = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array((b % np.uint64(n_coarse)).astype(np.int64))
        )

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
        # tender.shingle_pairs); block count scales with docs × bands
        .repartition(
            max(8, min(256, int(np.ceil(expected_rows * bands / 50_000))))
            if expected_rows
            else 16
        )
        .groupby("bucket")
        .map_groups(bucket_ids, batch_format="pandas")
    )
    # candidate id list: the SMALL side (dedup regime) — broadcast once.
    # Guarded loudly: candidates ≈ near-dup docs, so this is result-sized
    # by construction, but a pathological corpus (one shared band value
    # everywhere) would otherwise stream a corpus-sized list through the
    # driver and die obscurely.  Above the cap, raise with the fix: drop
    # the broadcast and anti-join the corpus against cand_ids_ds instead
    # (ops/join.py shuffle semi-join — same result, one more exchange).
    cand_ids_ds = cand_ids_ds.materialize()  # count + collect: one execution
    n_cand = cand_ids_ds.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"minhash_lsh_pairs: {n_cand} candidate docs exceed "
            f"max_candidates={max_candidates}; the candidate list would "
            "swamp the driver.  Raise max_candidates, or switch the "
            "candidate filter to a shuffle semi-join (ops/join.py) for "
            "this corpus."
        )
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
    max_bucket: int = 8192,
    expected_rows: int | None = None,
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
        expected_rows=expected_rows,
    )


def _gather_bits(sig: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Pack the signature bits at ``positions`` into one small int per row."""
    out = np.zeros(len(sig), dtype=np.int64)
    one = np.uint64(1)
    for i, p in enumerate(positions):
        out |= (((sig >> np.uint64(int(p))) & one).astype(np.int64) << i)
    return out


def _emit_close_pairs(
    sig: np.ndarray,
    ids: np.ndarray,
    max_hamming: int,
    out: list,
    *,
    chunk_a: int = 512,
    chunk_b: int = 4096,
) -> None:
    """Append all (id_a, id_b, hamming) with hamming ≤ radius to ``out``.

    Chunked block-vs-tail sweep: memory stays ≤ chunk_a × chunk_b uint64
    temporaries regardless of bucket size (a triu over the whole bucket
    would allocate O(m²) index arrays — 537 MB at m = 8192)."""
    m = len(sig)
    for s in range(0, m, chunk_a):
        e = min(s + chunk_a, m)
        blk_sig, blk_ids = sig[s:e], ids[s:e]
        # pairs (i < j) with i in [s, e) and j in [i+1, m), j chunked
        for s2 in range(s, m, chunk_b):
            e2 = min(s2 + chunk_b, m)
            d = popcount64(blk_sig[:, None] ^ sig[None, s2:e2])
            ii, jj = np.nonzero(d <= max_hamming)
            jj_abs = jj + s2
            keep = (s + ii) < jj_abs  # strict upper triangle in global index
            if keep.any():
                a, b = blk_ids[ii[keep]], ids[jj_abs[keep]]
                swap = a > b
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": np.where(swap, b, a),
                            "id_b": np.where(swap, a, b),
                            "hamming": d[ii[keep], jj[keep]].astype(np.int64),
                        }
                    )
                )


def hamming_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 12,
    max_bucket: int = 8192,
    combine: str = "auto",
    expected_pairs: int | None = None,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """All pairs with Hamming(sig) ≤ max_hamming over ANY precomputed
    64-bit signature column (SimHash, image pHash, audio fingerprints).

    Candidate generation is a COMPLETE multi-index Hamming search
    (pigeonhole: signatures within Hamming ≤ d agree exactly on at least
    one of any d+1 disjoint bit blocks).  The corpus first buckets on
    ``d+1`` top-level blocks covering all 64 bits; a bucket larger than
    ``max_bucket`` is then RECURSIVELY split inside its group task by
    re-applying the pigeonhole over the still-unmatched bit positions —
    constant positions (where every member agrees) are eliminated first,
    which both guarantees progress (every retained position splits the
    bucket) and terminates cleanly: once fewer than d+1 unmatched
    positions remain, every pair in the bucket is within radius by
    construction and is emitted directly.  Nothing is ever silently
    dropped, and no bucket pays an all-pairs scan larger than
    ``max_bucket`` unless its members are GENUINELY mutual near-dups
    (output-sized work; a warning with the bucket size is logged).  Each
    split is counted and logged per group task.

    Wider radii still cost more (each recursion level fans a doc into
    d+1 sub-buckets); prefer d ≤ 15 at corpus scale.

    ``combine`` picks the final pair-dedup exchange: ``"single"`` is one
    combine task over the coalesced result-sized pair stream (default for
    small expectations, measured 5× faster than a keyed shuffle at
    sf0.1 — see tender.count_pairs); ``"groupby"`` is the keyed
    ``groupby().map_groups`` exchange for pair volumes beyond one block
    (``"auto"`` switches on ``expected_pairs`` > 5M).

    Returns a Dataset (id_a, id_b, hamming).
    """
    assert 0 <= max_hamming < 64
    n_blocks = max_hamming + 1

    if id_col != "doc_id" or sig_col != "simhash":
        ds = ds.map_batches(
            lambda t: t.select([id_col, sig_col]).rename_columns(
                ["doc_id", "simhash"]
            ),
            batch_format="pyarrow",
        )

    # top-level blocks: contiguous, covering all 64 bits (widths w or w+1)
    base_w, extra = divmod(64, n_blocks)
    offsets, widths = [], []
    off = 0
    for blk in range(n_blocks):
        w = base_w + (1 if blk < extra else 0)
        offsets.append(off)
        widths.append(w)
        off += w

    def block_rows(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for blk in range(n_blocks):
            val = (sig >> np.uint64(offsets[blk])) & np.uint64((1 << widths[blk]) - 1)
            if n_blocks >= 2:
                # exact (blk, value) key: value < 2^33 << 2^58
                key = (np.int64(blk) << np.int64(58)) | val.astype(np.int64)
            else:
                # d = 0: the single "block" is the whole signature
                key = val.view(np.int64)
            parts.append(
                pa.table(
                    {"bkey": pa.array(key), "blk": pa.array(np.full(len(sig), blk, np.int8)),
                     "doc_id": t["doc_id"], "simhash": t["simhash"]}
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
        if m < 2:
            return empty
        sig = g["simhash"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy()
        blk = int(g["blk"].iloc[0])
        # unmatched positions = everything outside the block this bucket
        # was keyed on
        positions = np.concatenate(
            (
                np.arange(0, offsets[blk]),
                np.arange(offsets[blk] + widths[blk], 64),
            )
        )
        out: list = []
        n_splits = 0

        def recurse(sig_: np.ndarray, ids_: np.ndarray, pos: np.ndarray) -> None:
            nonlocal n_splits
            m_ = len(sig_)
            if m_ < 2:
                return
            if m_ > max_bucket and len(pos):
                # eliminate positions where every member agrees (they can
                # never split the bucket; removing them is what makes the
                # recursion terminate on near-identical clusters)
                varying = np.fromiter(
                    (
                        not (
                            ((sig_ >> np.uint64(int(p))) & np.uint64(1))
                            == ((sig_[0] >> np.uint64(int(p))) & np.uint64(1))
                        ).all()
                        for p in pos
                    ),
                    dtype=bool,
                    count=len(pos),
                )
                pos = pos[varying]
            if m_ <= max_bucket or len(pos) < n_blocks:
                if m_ > max_bucket:
                    # every pair here IS within radius (≤ len(pos) < d+1
                    # unmatched bits): output-sized quadratic work, loudly
                    _LOG.warning(
                        "hamming_pairs: mutual near-dup cluster of %d docs "
                        "(> max_bucket=%d) — emitting all C(m,2) pairs",
                        m_,
                        max_bucket,
                    )
                _emit_close_pairs(sig_, ids_, max_hamming, out)
                return
            # candidate split: d+1 sub-blocks over the unmatched positions
            r = len(pos)
            w_, e_ = divmod(r, n_blocks)
            plans = []
            child_work = 0
            start = 0
            for b in range(n_blocks):
                bw = w_ + (1 if b < e_ else 0)
                sub = pos[start : start + bw]
                rest = np.concatenate((pos[:start], pos[start + bw :]))
                start += bw
                val = _gather_bits(sig_, sub)
                order = np.argsort(val, kind="stable")
                sv = val[order]
                cuts = np.flatnonzero(sv[1:] != sv[:-1]) + 1
                bounds = np.concatenate(([0], cuts, [m_]))
                segs = [
                    order[a_:b_]
                    for a_, b_ in zip(bounds[:-1], bounds[1:])
                    if b_ - a_ >= 2
                ]
                child_work += sum(len(s) * len(s) for s in segs)
                plans.append((segs, rest))
            # cost guard: descend only when the children's combined
            # all-pairs bound is strictly cheaper than scanning this bucket
            # now.  Uniformly-spread buckets shrink geometrically (ratio
            # ~(d+1)/2^w → near-linear total); dense clusters whose split
            # does not pay emit here — their pairs are mostly real, so the
            # quadratic scan is output-sized work.  This bound is what
            # prevents the exponential fan-out of blind recursion on
            # clusters sitting just above max_bucket.
            if child_work >= int(0.95 * m_ * m_):
                if m_ > max_bucket:
                    _LOG.warning(
                        "hamming_pairs: dense bucket of %d docs resists "
                        "splitting (child work %d ≥ %d) — all-pairs scan",
                        m_,
                        child_work,
                        m_ * m_,
                    )
                _emit_close_pairs(sig_, ids_, max_hamming, out)
                return
            n_splits += 1
            for segs, rest in plans:
                for idx in segs:
                    recurse(sig_[idx], ids_[idx], rest)

        recurse(sig, ids, positions)
        if n_splits:
            _LOG.info(
                "hamming_pairs: bucket of %d docs split %d times "
                "(max_bucket=%d, radius=%d)",
                m,
                n_splits,
                max_bucket,
                max_hamming,
            )
        if not out:
            return empty
        df = pd.concat(out, ignore_index=True)
        # splits re-discover the same pair along several block paths
        return df.groupby(["id_a", "id_b"], sort=False, as_index=False)[
            "hamming"
        ].min()

    # coalesce narrow block rows before the exchange; block count scales
    # with the exploded volume (rows × (d+1)) like tender.shingle_pairs —
    # a fixed 16 would bottleneck the sort at corpus scale
    shuffle_blocks = (
        max(8, min(256, int(np.ceil(expected_rows * n_blocks / 50_000))))
        if expected_rows
        else 16
    )
    pairs = (
        ds.map_batches(block_rows, batch_format="pyarrow")
        .repartition(shuffle_blocks)
        .groupby("bkey")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pairs = pairs.select_columns(["id_a", "id_b", "hamming"])

    # a pair can surface from several top-level blocks: reduce to one row.
    use_groupby = combine == "groupby" or (
        combine == "auto" and expected_pairs is not None and expected_pairs > 5_000_000
    )
    if use_groupby:
        # pair volume beyond one block: keyed exchange, same result
        def min_hamming(gg: pd.DataFrame) -> pd.DataFrame:
            return gg.groupby(
                ["id_a", "id_b"], sort=False, as_index=False
            )["hamming"].min()

        return (
            pairs.groupby("id_a").map_groups(min_hamming, batch_format="pandas")
        )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["id_a", "id_b"], sort=False, as_index=False)["hamming"]
            .min()
        )

    return pairs.repartition(1).map_batches(
        dedup_pairs, batch_format="pandas", batch_size=None
    )
