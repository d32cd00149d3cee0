"""MinHash-LSH and SimHash near-duplicate detection (training-data ops).

Beyond the reference's tender pipeline: banded MinHash-LSH (shingle →
minhash → band → bucket groupby → candidate pairs → exact-Jaccard verify)
and SimHash with block-LSH candidate generation.  Both shuffle only small
(bucket_key, doc_id) rows; verification re-reads only candidate documents'
shingle sets via broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from texrex_ray.functions.hashing import hash64, minhash_signatures, simhash64
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE


def _token_sets(texts: list[str], n: int) -> list[set[str]]:
    out = []
    for s in texts:
        toks = LATIN_TOKEN_RE.findall((s or "").lower())
        out.append({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
    return out


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 96,
    bands: int = 24,
    n: int = 5,
    jaccard_threshold: float = 0.5,
) -> pd.DataFrame:
    """Near-dup pairs via banded LSH, verified with exact n-gram Jaccard.

    k/bands rows per band; two docs become candidates when any band hashes
    identically.  Candidates are verified exactly (gram-set Jaccard ≥
    threshold) so the output has no false positives; recall is the standard
    LSH S-curve at (bands, rows).  Returns (id_a, id_b, jaccard_pct).

    Partitioning: the bucket groupby shuffles only (band, band_hash, id)
    rows.  Verification broadcasts the candidate ids' gram sets — valid
    while the candidate set is small relative to the corpus (dedup regime);
    a pair-join variant replaces it when candidates explode.
    """
    rows_per_band = k // bands
    assert rows_per_band * bands == k

    def band_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in texts]
        sig = minhash_signatures(toks, k=k, n=n)
        # hash each band's row-slice to one uint64 bucket key
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
                "doc_id": pa.array(ids),
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(np.array(band_hash, dtype=np.uint64)),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        b = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array((b % np.uint64(64)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the coarse bucket: one self-merge over the full
        # (band, band_hash) key, hot buckets (>200 docs) capped like tender
        counts = g.groupby(["band", "band_hash"])["doc_id"].transform("size")
        g = g[(counts >= 2) & (counts <= 200)]
        if g.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")})
        m = g.merge(g, on=["band", "band_hash"], suffixes=("_x", "_y"))
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {"id_a": m["doc_id_x"].to_numpy(), "id_b": m["doc_id_y"].to_numpy()}
        ).drop_duplicates()

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_df = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    if cand_df.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_pct": []}).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard_pct": "int64"}
        )

    # exact verification of the (small) candidate set
    need = set(cand_df["id_a"]) | set(cand_df["id_b"])
    need_ref = ray.put(need)

    def collect_sets(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = [i in wanted for i in t[id_col].to_pylist()]
        t = t.filter(pa.array(mask))
        sets = _token_sets(t[text_col].to_pylist(), n)
        return pa.table(
            {
                "doc_id": t[id_col],
                "grams": pa.array([sorted(s) for s in sets], pa.list_(pa.string())),
            }
        )

    gram_df = ds.map_batches(collect_sets, batch_format="pyarrow").to_pandas()
    gram_map = {r.doc_id: set(r.grams) for r in gram_df.itertuples()}
    keep_a, keep_b, jpct = [], [], []
    for r in cand_df.itertuples():
        sa, sb = gram_map.get(r.id_a, set()), gram_map.get(r.id_b, set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= jaccard_threshold:
            keep_a.append(r.id_a)
            keep_b.append(r.id_b)
            jpct.append(int(round(j * 100)))
    return pd.DataFrame({"id_a": keep_a, "id_b": keep_b, "jaccard_pct": jpct}).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard_pct": "int64"}
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 12,
    shingle_n: int = 3,
) -> pd.DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Signatures are computed over token ``shingle_n``-grams (word-order
    sensitive — a bag-of-words simhash confuses documents that merely share
    vocabulary).  Candidate generation via 4×16-bit block LSH (two
    signatures within Hamming ≤ 3 must agree on ≥1 of 4 blocks; wider radii
    raise the block count); candidates verified exactly.
    Returns (id_a, id_b, hamming).
    """

    def sig_rows(t: pa.Table) -> pa.Table:
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in t[text_col].to_pylist()]
        grams = [
            [" ".join(tk[i : i + shingle_n]) for i in range(max(0, len(tk) - shingle_n + 1))]
            for tk in toks
        ]
        sh = simhash64(grams)
        return pa.table({"doc_id": t[id_col], "simhash": pa.array(sh)})

    df = ds.map_batches(sig_rows, batch_format="pyarrow").to_pandas()
    sig = df["simhash"].to_numpy(dtype=np.uint64)
    ids = df["doc_id"].to_numpy()
    # block LSH: bucket by each 16-bit block
    cand: set[tuple[int, int]] = set()
    for blk in range(4):
        keys = (sig >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
        buckets: dict[int, list[int]] = {}
        for i, kv in enumerate(keys.tolist()):
            buckets.setdefault(kv, []).append(i)
        for members in buckets.values():
            if len(members) < 2 or len(members) > 500:
                continue
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    i, j = members[x], members[y]
                    pa_, pb_ = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                    cand.add((int(pa_), int(pb_), i, j))
    out_a, out_b, ham = [], [], []
    for ia, ib, i, j in cand:
        d = bin(int(sig[i]) ^ int(sig[j])).count("1")
        if d <= max_hamming:
            out_a.append(ia)
            out_b.append(ib)
            ham.append(d)
    return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": ham}).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
    )
