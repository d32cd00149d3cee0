"""Content-defined chunking (CDC) dedup — gear-hash chunker + chunk-level
corpus dedup stats.

Storage-level dedup (backup systems, CommonCrawl WARC stores, training-
data lakes) splits byte streams at CONTENT-defined boundaries so an
insertion early in a document shifts chunk boundaries only locally and
every untouched span still dedups.  The boundary rule is the gear hash
(Xia et al. 2016, "FastCDC", USENIX ATC — the rolling hash, without
FastCDC's min/max clamps and bit-spread tweak, a documented
simplification that keeps the chunker a pure function of content):

    h_i = Σ_{k=0..63} gear[b_{i-k}] << k   (mod 2^64)
    boundary after position i  iff  h_i & mask == 0

The mask sits in the HIGH bits (``avg_bits`` ones at the top of the
word): every tap k ≤ 63 reaches bits ≥ 58, so the decision depends on
the whole 64-byte window — a low mask would see only the newest bytes
(tap k contributes nothing below bit k).

The 64-tap window sum is computed VECTORIZED: each batch's documents are
concatenated with 64 sentinel symbols between them whose gear value is 0,
which makes the big-array computation bit-identical to per-document
computation (a missing tap contributes exactly 0 — the natural warm-up of
the first 63 positions), in 64 numpy passes per batch instead of a
per-byte Python loop.  Chunk content hashes are md5 (C-speed per chunk —
the per-chunk loop is the kernel, like tokenization).

The gear table itself derives from md5 ("gear:<byte>"), so any engine can
regenerate it — nothing is seeded from runtime state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WINDOW = 64
_SEP = 256  # sentinel symbol between docs; gear[_SEP] = 0


def gear_table() -> np.ndarray:
    """257-entry uint64 gear table: md5-derived per byte value, 0 for the
    separator symbol.  Deterministic and version-stable."""
    vals = [
        int.from_bytes(hashlib.md5(f"gear:{b}".encode()).digest()[8:], "little")
        for b in range(256)
    ]
    return np.array(vals + [0], dtype=np.uint64)


_GEAR = gear_table()

# per-tap pre-shifted gear tables (257 × uint64 each, L1-resident): the
# big-array pass is then gather+add only — elementwise uint64 shifts on
# large arrays are 50-100× slow on this host (BENCH/BASELINE.md)
_GEAR_SHIFTED = [
    (_GEAR << np.uint64(k)).astype(np.uint64) for k in range(_WINDOW)
]


def boundary_mask(avg_bits: int) -> int:
    """``avg_bits`` ones at the TOP of the 64-bit word (see module doc)."""
    return ((1 << avg_bits) - 1) << (64 - avg_bits)


def chunk_doc_sequential(data: bytes, mask: int) -> list[tuple[int, int]]:
    """Reference chunker: per-byte Python loop (independent of the
    vectorized path — this is the ORACLE twin used by tests/fixtures).
    Returns (offset, length) per chunk."""
    h = 0
    bounds = []
    window = []
    for i, b in enumerate(data):
        window.append(int(_GEAR[b]))
        if len(window) > _WINDOW:
            window.pop(0)
        h = 0
        for k, g in enumerate(reversed(window)):
            h = (h + (g << k)) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            bounds.append(i + 1)
    if not bounds or bounds[-1] != len(data):
        bounds.append(len(data))
    out = []
    prev = 0
    for b in bounds:
        if b > prev:
            out.append((prev, b - prev))
        prev = b
    return out


def _chunk_batch(
    texts: list[str], ids: list, mask: int
) -> tuple[list, list[int], list[str], list[int]]:
    """Vectorized gear boundaries for one batch; returns parallel lists
    (doc_id, chunk_idx, chunk_hash_hex, chunk_len)."""
    blobs = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    if int(lens.sum()) == 0:
        return [], [], [], []

    # one symbol array: doc bytes + 64 separators each (gear = 0)
    total = int(lens.sum()) + _WINDOW * len(blobs)
    sym = np.full(total, _SEP, dtype=np.int64)
    starts = np.zeros(len(blobs), dtype=np.int64)
    pos = 0
    for j, b in enumerate(blobs):
        starts[j] = pos
        sym[pos : pos + len(b)] = np.frombuffer(b, dtype=np.uint8)
        pos += len(b) + _WINDOW

    h = np.zeros(total, dtype=np.uint64)
    for k in range(_WINDOW):
        # h[i] += gear[sym[i-k]] << k via the pre-shifted table (gather
        # + add only); sentinel taps contribute 0, so this equals the
        # per-document warm-up computation exactly
        h[k:] += _GEAR_SHIFTED[k][sym[: total - k]]
    is_boundary = (h & np.uint64(mask)) == 0

    out_ids: list = []
    out_idx: list[int] = []
    out_hash: list[str] = []
    out_len: list[int] = []
    for j, b in enumerate(blobs):
        L = len(b)
        if L == 0:
            continue
        s = starts[j]
        cuts = np.flatnonzero(is_boundary[s : s + L]) + 1  # split AFTER i
        if len(cuts) == 0 or cuts[-1] != L:
            cuts = np.append(cuts, L)
        prev = 0
        ci = 0
        for c in cuts:
            if c > prev:
                out_ids.append(ids[j])
                out_idx.append(ci)
                out_hash.append(hashlib.md5(b[prev:c]).hexdigest())
                out_len.append(int(c - prev))
                ci += 1
                prev = int(c)
    return out_ids, out_idx, out_hash, out_len


def gear_chunks(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_bits: int = 6,
) -> ray.data.Dataset:
    """Explode documents into content-defined chunks.

    Output schema: (doc_id, chunk_idx, chunk_hash: string, chunk_len).
    ``avg_bits`` sets the boundary mask (expected chunk ≈ 2^avg_bits
    bytes).  Stateless map_batches — zero exchange; the chunk table is
    ~bytes/2^avg_bits rows.
    """
    mask = boundary_mask(avg_bits)

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, hashes, lens = _chunk_batch(
            t[text_col].to_pylist(), t[id_col].to_pylist(), mask
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, t[id_col].type),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.string()),
                "chunk_len": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def cdc_dedup_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    avg_bits: int = 6,
    expected_chunks: int | None = None,
) -> pd.DataFrame:
    """Per-source CDC dedup report: chunk/byte totals and how many of
    them are duplicate occurrences (an identical-content chunk with a
    smaller (doc_id, chunk_idx) owner anywhere in the corpus).

    Plan: chunker (zero exchange) → ONE chunk-hash-keyed bucketed
    exchange electing the min-(doc_id, idx) owner per distinct chunk and
    emitting per-source partials → source-sized final sum.  Chunk hashes
    (16 B) are the only thing that shuffles — never document bytes.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def explode(t: pa.Table) -> pa.Table:
        mask = boundary_mask(avg_bits)
        ids, idxs, hashes, lens = _chunk_batch(
            t[text_col].to_pylist(), t[id_col].to_pylist(), mask
        )
        src_of = dict(zip(t[id_col].to_pylist(), t[source_col].to_pylist()))
        return pa.table(
            {
                "chunk_hash": pa.array(hashes, pa.string()),
                "doc_id": pa.array(ids, t[id_col].type),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_len": pa.array(lens, pa.int64()),
                "source": pa.array([src_of[i] for i in ids], pa.string()),
            }
        )

    chunks = ds.map_batches(explode, batch_format="pyarrow")

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        # owner = min (doc_id, chunk_idx) per chunk_hash; every other
        # occurrence of that hash is a duplicate
        g = g.sort_values(["chunk_hash", "doc_id", "chunk_idx"], kind="stable")
        first = ~g["chunk_hash"].duplicated()
        dup = ~first
        part = pd.DataFrame(
            {
                "source": g["source"],
                "n_chunks": 1,
                "n_bytes": g["chunk_len"],
                "n_dup_chunks": dup.astype(np.int64),
                "dup_bytes": g["chunk_len"].where(dup, 0),
            }
        )
        return part.groupby("source", as_index=False).sum()

    partials = bucketed_groupby(
        chunks, "chunk_hash", per_source, expected_rows=expected_chunks
    ).to_pandas()  # ≤ sources × buckets rows
    out = (
        partials.groupby("source", as_index=False)
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ("n_chunks", "n_bytes", "n_dup_chunks", "dup_bytes"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_chunks", "n_bytes", "n_dup_chunks", "dup_bytes"]]
