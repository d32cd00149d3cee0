"""Exact integer convolution via the number-theoretic transform.

NTT over GF(p) for NTT-friendly primes (p = c·2^k + 1): the
EXACT-arithmetic FFT — convolutions of count histograms come out as
exact integers with no float rounding, the primitive large-scale pair
statistics (sum/difference distributions) need.  All butterflies are
whole-array numpy int64 (values < 2^30, products < 2^60).

Scale path: a single prime only holds convolution values < ~1e9, which
a 10x histogram already exceeds — ``convolve_exact`` therefore switches
automatically to a THREE-PRIME run with Chinese-remainder
reconstruction (exact to ~7.8e25), keeping the cheap single-prime path
when the direct value bound allows it.

Reference analogue: none in texrex (new large-scale extension); the
classic competitive-programming iterative Cooley-Tukey shape.
"""

from __future__ import annotations

import numpy as np

# NTT-friendly primes with primitive root 3, all < 2^30 so int64
# butterfly products stay < 2^60
P = 998244353          # 119·2^23 + 1
G = 3
_P2 = 167772161        # 5·2^25 + 1
_P3 = 469762049        # 7·2^26 + 1
_CRT_PRIMES = (P, _P2, _P3)
_CRT_BOUND = P * _P2 * _P3  # ≈ 7.87e25


def _bit_reverse(a: np.ndarray) -> np.ndarray:
    n = len(a)
    j = 0
    order = np.zeros(n, np.int64)
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        order[i] = j
    return a[order]


def ntt(a: np.ndarray, invert: bool = False, p: int = P, g: int = G) -> np.ndarray:
    """In-place-style iterative NTT mod ``p``; len(a) must be a power of
    two dividing the prime's 2-adic order (2^23 for the default)."""
    a = _bit_reverse(a.astype(np.int64) % p)
    n = len(a)
    ln = 2
    while ln <= n:
        w = pow(g, (p - 1) // ln, p)
        if invert:
            w = pow(w, p - 2, p)
        half = ln // 2
        # twiddle vector for one block
        ws = np.empty(half, np.int64)
        cur = 1
        for i in range(half):
            ws[i] = cur
            cur = cur * w % p
        blocks = a.reshape(n // ln, ln)
        u = blocks[:, :half].copy()  # copy: the next write aliases it
        v = blocks[:, half:] * ws % p
        blocks[:, :half] = (u + v) % p
        blocks[:, half:] = (u - v) % p
        a = blocks.reshape(n)
        ln <<= 1
    if invert:
        n_inv = pow(n, p - 2, p)
        a = a * n_inv % p
    return a


def _convolve_mod(x: np.ndarray, y: np.ndarray, need: int, p: int) -> np.ndarray:
    n = 1
    while n < need:
        n <<= 1
    fa = np.zeros(n, np.int64)
    fb = np.zeros(n, np.int64)
    fa[: len(x)] = x
    fb[: len(y)] = y
    ra = ntt(fa, p=p)
    rb = ntt(fb, p=p)
    return ntt(ra * rb % p, invert=True, p=p)[:need]


def convolve_exact(x: list[int], y: list[int]) -> list[int]:
    """Exact nonnegative-integer convolution.

    Single-prime fast path while the direct value bound
    max(x)·max(y)·min(len) stays below the modulus; beyond it, three
    NTT primes + CRT reconstruct values exactly up to ~7.8e25 (asserted
    loudly — nothing histogram-shaped gets near that)."""
    if not x or not y:
        return []
    need = len(x) + len(y) - 1
    xa = np.asarray(x, np.int64)
    ya = np.asarray(y, np.int64)
    bound = int(xa.max()) * int(ya.max()) * min(len(x), len(y))
    if bound < P:
        return [int(v) for v in _convolve_mod(xa, ya, need, P)]
    assert bound < _CRT_BOUND, (
        "convolution values may exceed the 3-prime CRT range"
    )
    r1, r2, r3 = (_convolve_mod(xa % p, ya % p, need, p) for p in _CRT_PRIMES)
    # CRT: x = r1 + P1·t2 + P1·P2·t3 (Garner's form); P1·P2 ≈ 1.7e17
    # fits int64, the final term combines in Python ints
    inv_p1_p2 = pow(P, _P2 - 2, _P2)
    inv_p12_p3 = pow(P * _P2 % _P3, _P3 - 2, _P3)
    t2 = (r2 - r1) * inv_p1_p2 % _P2
    x12 = r1 + np.int64(P) * t2                      # < P·P2, exact int64
    t3 = (r3 - x12 % _P3) * inv_p12_p3 % _P3
    p12 = P * _P2
    return [int(a) + p12 * int(b) for a, b in zip(x12, t3)]
