"""Incremental NEAR-dup: flag new docs against a persisted corpus LSH index.

The continuous-ingest counterpart of ``dedup/lsh.py``: the historical
corpus's minhash BAND hashes live in a ``state/corpus_index.py`` index on
disk; each new shard computes its own band hashes and probes — zero
shuffle over the historical corpus, zero shuffle on the probe path.  A
new doc sharing ANY band with any historical doc is a near-dup
candidate (the standard LSH guarantee: with k=32, bands=8, r=4, a true
Jaccard-0.7 pair collides in ≥1 band with p ≈ 1-(1-0.7⁴)⁸ ≈ 0.90).

Hash choices are deliberately version-stable for a PERSISTED index:
signatures are the reference-faithful Rabin64 minhash
(``functions/rabin.py`` — fixed trpoly64 table, stable forever), and the
band key is ``md5_lower64`` over the digit string — never the transient
polars hash (see functions/hashing.py::hash64 caveat).

Candidates can be verified exactly by fetching the flagged docs' shingle
sets and running the tender pair machinery against the (few) matching
historical docs; the candidate stage here is the part that must NOT
touch the historical corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from texrex_ray.functions.hashing import md5_lower64
from texrex_ray.functions.rabin import rabin_minhash_signatures
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE
from texrex_ray.state.corpus_index import HashIndexProbe, build_hash_index


def band_hash_rows(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 5,
) -> pa.Table:
    """Per doc: ``bands`` rows of (id, stable uint64 band hash).

    Docs with no n-gram (too short) emit nothing.
    """
    r = k // bands
    assert r * bands == k
    toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in batch[text_col].to_pylist()]
    sig, has_fp = rabin_minhash_signatures(toks, k=k, n=n)
    ids = batch[id_col].to_pylist()
    out_ids: list = []
    keys: list[str] = []
    for b in range(bands):
        seg = sig[:, b * r : (b + 1) * r]
        for i, ok in enumerate(has_fp):
            if ok:
                out_ids.append(ids[i])
                keys.append(f"{b}:" + ",".join(map(str, seg[i])))
    return pa.table(
        {
            id_col: pa.array(out_ids, batch[id_col].type),
            "h": pa.array(md5_lower64(keys), pa.uint64()),
        }
    )


def build_neardup_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 5,
    n_shards: int = 16,
) -> pd.DataFrame:
    """Index the corpus's band hashes (only 8-byte hashes ever shuffle)."""
    rows = ds.map_batches(
        lambda t: band_hash_rows(t, id_col, text_col, k, bands, n),
        batch_format="pyarrow",
    )
    return build_hash_index(rows, index_dir, hash_col="h", n_shards=n_shards)


def neardup_candidates(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 5,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Per new doc with ≥1 known band: (id, n_hits).  Result-sized output."""
    probed = ds.map_batches(
        lambda t: band_hash_rows(t, id_col, text_col, k, bands, n),
        batch_format="pyarrow",
    ).map_batches(
        HashIndexProbe,
        fn_constructor_kwargs={"index_dir": index_dir, "hash_col": "h"},
        # (1, N): autoscale from one actor so small-CPU sessions (the 4-cpu
        # test fixture) never starve upstream tasks of CPU slots
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )

    def per_doc(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                id_col: t[id_col].to_pylist(),
                "known": t["known"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(id_col, sort=False)["known"].sum().reset_index(name="n_hits")
        g = g[g["n_hits"] > 0]
        # explicit schema: an all-miss batch must not degrade string ids (or
        # an empty frame) to a null-typed column
        return pa.table(
            {
                id_col: pa.array(g[id_col].tolist(), t.schema.field(id_col).type),
                "n_hits": pa.array(g["n_hits"].to_numpy(dtype=np.int64)),
            }
        )

    # band rows of one doc can straddle batches only if a doc's bands split
    # across blocks — they never do (band_hash_rows emits per input batch),
    # but partial sums are safe regardless: merge with a result-sized groupby.
    from texrex_ray.ops.aggregate import bucketed_groupby

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(id_col, sort=False)["n_hits"].sum().reset_index()

    return bucketed_groupby(
        probed.map_batches(per_doc, batch_format="pyarrow"), id_col, merge
    )
