"""Rabin64 fingerprinting over the reference's fixed polynomial table.

Faithful port of the reference's Rabin hashing (ref: trrabinhash.pas:
111-268, itself based on Sean Owen's public rabinhash implementation) and
its 1,000 irreducible degree-64 polynomials (ref: trpoly64.pas — extracted
verbatim into ``texrex_ray/data/poly64.npy``; they are published constants,
not code).  The deterministic hash provider uses the FIRST k polynomials
(ref: trrabinhash.pas TTrHashProvider.Create with ADeterministic=true), so
fingerprints here are value-compatible with reference-produced shingle
files.

Algorithm (per polynomial P of degree 64):
- ``LMods[i] = x^(64+i) mod P`` built by shift-and-reduce;
- eight 256-entry tables ``T[p][c] = XOR of LMods[8p + j] for set bits j
  of c`` fold one byte per position;
- a string hashes big-endian, 8 bytes per step:
  ``W = ComputeShifted(W) XOR next_8_bytes`` with the leading
  ``len mod 8`` bytes accumulated as ``W = (W << 8) XOR byte``.

Left-zero-padding a message to a multiple of 8 bytes is a no-op for this
scheme (tables map 0 → 0 and ``(0 << 8) ^ 0 = 0``), which is what lets the
vectorized path process a whole batch of variable-length n-grams as one
zero-padded byte matrix.

Shingle construction for the minhash fingerprint follows trshingler.pas:
97-150 exactly: tokens are the UPPER-cased type sequence, n consecutive
tokens concatenate with NO separator, shingles shorter than 9 chars are
left-padded with SPACES, and documents with fewer than n tokens produce no
fingerprint at all.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "data", "poly64.npy")
DEFAULT_POLY = 0xE5FE94D7ABBF88A1  # ref: trrabinhash.pas DefaultPoly


def load_polys(k: int | None = None) -> np.ndarray:
    """The reference's fixed polynomial table (first k entries)."""
    arr = np.load(_POLY_PATH)
    return arr if k is None else arr[:k]


# -- scalar reference path (literal transcription, used for goldens) -------

def rabin64_scalar(data: bytes, poly: int = DEFAULT_POLY) -> int:
    """Pure-Python Rabin64 of a byte string — the audit/golden path."""
    lmods = [poly]
    for _ in range(63):
        last = lmods[-1]
        nxt = (last << 1) & 0xFFFFFFFFFFFFFFFF
        if last >> 63:
            nxt ^= poly
        lmods.append(nxt)
    tables = [[0] * 256 for _ in range(8)]
    for c in range(256):
        for j in range(8):
            if (c >> j) & 1:
                for p in range(8):
                    tables[p][c] ^= lmods[j + 8 * p]

    def shifted(w: int) -> int:
        r = 0
        for p in range(8):
            r ^= tables[p][(w >> (8 * p)) & 0xFF]
        return r

    w = 0
    nb = len(data) % 8
    for b in data[:nb]:
        w = ((w << 8) ^ b) & 0xFFFFFFFFFFFFFFFF
    for s in range(nb, len(data), 8):
        w = shifted(w) ^ int.from_bytes(data[s : s + 8], "big")
    return w


# -- vectorized path --------------------------------------------------------

@lru_cache(maxsize=4)
def _tables(k: int) -> np.ndarray:
    """(8, 256, k) byte-fold tables for the first k polynomials."""
    polys = load_polys(k)
    lmods = np.empty((64, k), dtype=np.uint64)
    lmods[0] = polys
    for i in range(1, 64):
        prev = lmods[i - 1]
        shifted = prev << U64(1)
        red = (prev >> U64(63)).astype(bool)
        lmods[i] = np.where(red, shifted ^ polys, shifted)
    t = np.zeros((8, 256, k), dtype=np.uint64)
    for c in range(256):
        for j in range(8):
            if (c >> j) & 1:
                t[:, c] ^= lmods[j::8][: 8]  # rows j, j+8, …, j+56 → p=0..7
    return t


@lru_cache(maxsize=4)
def _tables_flat(k: int) -> np.ndarray:
    """(8, k*256) poly-major layout: row ``j*256 + byte`` for column j.

    Each column's 256-entry sub-table is 2 KiB — L1-resident across the
    whole slab, where the byte-major (8, 256, k) layout misses cache on
    every gather (measured ~1.5× end-to-end on this host)."""
    t = _tables(k)
    return np.ascontiguousarray(t.transpose(0, 2, 1)).reshape(8, k * 256)


def rabin_hash_many(grams: list[bytes], k: int, slab_rows: int = 2048) -> np.ndarray:
    """(n_grams, k) Rabin64 hashes under the first k reference polynomials.

    One zero-padded byte matrix per slab; per 8-byte block the table fold
    is one flat ``np.take`` per byte position from the poly-major tables,
    with the state bytes read zero-copy via a uint8 view (little-endian
    byte p of w IS ``(w >> 8p) & 0xFF``) — all bounded, reused-size
    allocations (this host punishes large fresh pages).
    """
    t_flat = _tables_flat(k)
    n = len(grams)
    out = np.empty((n, k), dtype=np.uint64)
    row_off = (np.arange(k) << 8).astype(np.intp)[None, :]
    for s0 in range(0, n, slab_rows):
        chunk = grams[s0 : s0 + slab_rows]
        m = len(chunk)
        maxlen = max((len(g) for g in chunk), default=0)
        L = ((maxlen + 7) // 8) * 8
        if L == 0:
            out[s0 : s0 + m] = 0
            continue
        buf = np.zeros((m, L), dtype=np.uint8)
        for i, g in enumerate(chunk):
            if g:
                buf[i, L - len(g) :] = np.frombuffer(g, dtype=np.uint8)
        blocks = buf.view(">u8").astype(np.uint64)  # (m, L//8) big-endian words
        w = np.zeros((m, k), dtype=np.uint64)
        idx = np.empty((m, k), dtype=np.intp)
        for b in range(L // 8):
            if b > 0:
                wb = w.view(np.uint8).reshape(m, k, 8)
                np.add(wb[:, :, 0], row_off, out=idx)
                acc = np.take(t_flat[0], idx)
                for p in range(1, 8):
                    np.add(wb[:, :, p], row_off, out=idx)
                    acc ^= np.take(t_flat[p], idx)
                w = acc
            w ^= blocks[:, b][:, None]
        out[s0 : s0 + m] = w
    return out


def reference_shingles(tokens: list[str], n: int = 5) -> list[bytes]:
    """trshingler.pas:105-130 n-grams: UPPER-cased tokens concatenated with
    no separator, left-padded with spaces to ≥9 chars; fewer than n tokens
    → no shingles at all (the reference Exits before fingerprinting)."""
    ups = [t.upper() for t in tokens]
    m = len(ups) - n + 1
    if m < 1:
        return []
    out = []
    for i in range(m):
        g = "".join(ups[i : i + n])
        if len(g) < 9:
            g = g.rjust(9, " ")
        out.append(g.encode("utf-8"))
    return out


def rabin_minhash_signatures(
    token_lists: list[list[str]], k: int = 100, n: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Reference-faithful minhash: (num_docs, k) signatures + has-fp mask.

    Per document: min over all n-gram Rabin64 hashes for each of the first
    k polynomials (ref: trshingler.pas:136-150).  Documents without enough
    tokens get ``has_fp=False`` and an all-ones row (no fingerprint in the
    reference; callers emit no shingle rows for them).
    """
    grams: list[bytes] = []
    offsets = [0]
    for toks in token_lists:
        grams.extend(reference_shingles(toks, n=n))
        offsets.append(len(grams))
    sig = np.full((len(token_lists), k), _MASK64, dtype=np.uint64)
    has_fp = np.zeros(len(token_lists), dtype=bool)
    if not grams:
        return sig, has_fp
    h = rabin_hash_many(grams, k)
    for d in range(len(token_lists)):
        lo, hi = offsets[d], offsets[d + 1]
        if hi > lo:
            sig[d] = h[lo:hi].min(axis=0)
            has_fp[d] = True
    return sig, has_fp
