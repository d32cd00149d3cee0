"""Content-defined chunking: vectorized plan vs sequential twin, CDC
locality property, and the per-source dedup stats."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from texrex_ray.dedup.cdc import (
    _chunk_batch,
    boundary_mask,
    cdc_dedup_stats,
    chunk_doc_sequential,
    gear_chunks,
)

MASK = boundary_mask(6)


def _seq_chunks(text: str):
    b = text.encode("utf-8")
    return [
        (ci, hashlib.md5(b[o : o + l]).hexdigest(), l)
        for ci, (o, l) in enumerate(chunk_doc_sequential(b, MASK))
    ]


def test_vectorized_chunker_matches_sequential():
    rng = np.random.default_rng(1)
    texts = [
        "".join(chr(int(c)) for c in rng.integers(32, 1000, int(n)))
        for n in rng.integers(0, 500, 30)
    ] + ["", "x"]
    ids, idxs, hashes, lens = _chunk_batch(texts, list(range(len(texts))), MASK)
    got: dict[int, list] = {}
    for i, ix, hh, ln in zip(ids, idxs, hashes, lens):
        got.setdefault(i, []).append((ix, hh, ln))
    for j, t in enumerate(texts):
        want = _seq_chunks(t)
        assert got.get(j, []) == want


def test_chunks_tile_the_document():
    text = "the quick brown fox " * 40
    b = text.encode()
    chunks = chunk_doc_sequential(b, MASK)
    assert chunks[0][0] == 0
    assert sum(l for _, l in chunks) == len(b)
    for (o1, l1), (o2, _) in zip(chunks, chunks[1:]):
        assert o1 + l1 == o2


def test_cdc_locality_after_insertion():
    """The CDC property: prepending bytes shifts ONLY nearby boundaries —
    chunk content hashes far from the edit are unchanged (a fixed-size
    chunker would lose every chunk after the insertion point)."""
    rng = np.random.default_rng(2)
    base = bytes(rng.integers(97, 123, 4000, dtype=np.uint8))
    edited = b"INSERTED!" + base
    h0 = {
        hashlib.md5(base[o : o + l]).hexdigest()
        for o, l in chunk_doc_sequential(base, MASK)
    }
    h1 = {
        hashlib.md5(edited[o : o + l]).hexdigest()
        for o, l in chunk_doc_sequential(edited, MASK)
    }
    shared = len(h0 & h1)
    assert shared >= len(h0) - 3  # only the head chunk(s) may change


def test_cdc_dedup_stats_matches_pure_python(ray_session):
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    got = cdc_dedup_stats(ds, avg_bits=6, expected_chunks=2000)

    df = (
        pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text", "source"]]
        .sort_values("doc_id")
    )
    rows = []
    for _, r in df.iterrows():
        b = str(r["text"]).encode()
        for ci, (o, l) in enumerate(chunk_doc_sequential(b, MASK)):
            rows.append(
                (int(r["doc_id"]), ci, hashlib.md5(b[o : o + l]).hexdigest(),
                 l, r["source"])
            )
    owner: dict[str, tuple[int, int]] = {}
    for did, ci, hh, ln, _s in rows:
        if hh not in owner or (did, ci) < owner[hh]:
            owner[hh] = (did, ci)
    stats: dict[str, list[int]] = {}
    for did, ci, hh, ln, s in rows:
        st = stats.setdefault(s, [0, 0, 0, 0])
        st[0] += 1
        st[1] += ln
        if owner[hh] != (did, ci):
            st[2] += 1
            st[3] += ln
    want = pd.DataFrame(
        [
            {"source": s, "n_chunks": v[0], "n_bytes": v[1],
             "n_dup_chunks": v[2], "dup_bytes": v[3]}
            for s, v in sorted(stats.items())
        ]
    ).astype({c: "int64" for c in ("n_chunks", "n_bytes", "n_dup_chunks", "dup_bytes")})
    pd.testing.assert_frame_equal(got, want)


def test_gear_chunks_schema_and_coverage(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "hello world " * 30}, {"doc_id": 2, "text": ""}]
    )
    out = gear_chunks(ds).to_pandas()
    assert list(out.columns) == ["doc_id", "chunk_idx", "chunk_hash", "chunk_len"]
    assert set(out["doc_id"]) == {1}  # empty doc yields no chunks
    assert out["chunk_len"].sum() == len("hello world " * 30)


def test_cdc_fixture_is_fresh():
    """The committed q117 oracle fixture must match a live sequential
    recompute over the driver's sf0.01 table (guards against testdata or
    chunker drift)."""
    import pyarrow.parquet as pq

    fx = pq.read_table(
        "/root/repo/tests/fixtures/oracle/cdc_stats_sf0.01.parquet"
    ).to_pandas()
    df = (
        pd.read_parquet("/root/testdata/sf0.01/documents.parquet")[
            ["doc_id", "text", "source"]
        ]
        .sort_values("doc_id")
    )
    # spot-check: totals per source derived from the sequential chunker
    rows = []
    for _, r in df.iterrows():
        b = str(r["text"]).encode()
        for ci, (o, l) in enumerate(chunk_doc_sequential(b, MASK)):
            rows.append((r["source"], l))
    agg = (
        pd.DataFrame(rows, columns=["source", "l"])
        .groupby("source")
        .agg(n_chunks=("l", "size"), n_bytes=("l", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fx[["source", "n_chunks", "n_bytes"]],
        agg.astype({"n_chunks": "int64", "n_bytes": "int64"}),
    )
