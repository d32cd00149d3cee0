"""Exact integer convolution via the number-theoretic transform.

NTT over GF(p), p = 998244353 = 119·2^23 + 1 (primitive root 3): the
EXACT-arithmetic FFT — convolutions of count histograms come out as
exact integers with no float rounding, the primitive large-scale pair
statistics (sum/difference distributions) need.  All butterflies are
whole-array numpy int64 (values < 2^30, products < 2^60).

Reference analogue: none in texrex (new large-scale extension); the
classic competitive-programming iterative Cooley-Tukey shape.
"""

from __future__ import annotations

import numpy as np

P = 998244353
G = 3


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


def ntt(a: np.ndarray, invert: bool = False) -> np.ndarray:
    """In-place-style iterative NTT; len(a) must be a power of two."""
    a = _bit_reverse(a.astype(np.int64) % P)
    n = len(a)
    ln = 2
    while ln <= n:
        w = pow(G, (P - 1) // ln, P)
        if invert:
            w = pow(w, P - 2, P)
        half = ln // 2
        # twiddle vector for one block
        ws = np.empty(half, np.int64)
        cur = 1
        for i in range(half):
            ws[i] = cur
            cur = cur * w % P
        blocks = a.reshape(n // ln, ln)
        u = blocks[:, :half].copy()  # copy: the next write aliases it
        v = blocks[:, half:] * ws % P
        blocks[:, :half] = (u + v) % P
        blocks[:, half:] = (u - v) % P
        a = blocks.reshape(n)
        ln <<= 1
    if invert:
        n_inv = pow(n, P - 2, P)
        a = a * n_inv % P
    return a


def convolve_exact(x: list[int], y: list[int]) -> list[int]:
    """Exact nonnegative-integer convolution (results must stay < P;
    callers with larger counts should CRT two primes — asserted)."""
    need = len(x) + len(y) - 1
    n = 1
    while n < need:
        n <<= 1
    fa = np.zeros(n, np.int64)
    fb = np.zeros(n, np.int64)
    fa[: len(x)] = x
    fb[: len(y)] = y
    ra = ntt(fa)
    rb = ntt(fb)
    out = ntt(ra * rb % P, invert=True)[:need]
    # overflow guard: direct bound on the true values
    bound = max(x, default=0) * max(y, default=0) * min(len(x), len(y))
    assert bound < P, "convolution values may exceed the NTT modulus"
    return [int(v) for v in out]
