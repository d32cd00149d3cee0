"""Deterministic KLL-style quantile sketch (mergeable, content-stable).

The KLL compactor (Karnin-Lang-Liberty 2016) summarizes n values into
O(k log(n/k)) items with rank error O(n log(n/k) / k); the classic
version flips a coin per compaction to stay unbiased.  This variant
replaces the coin with a FIXED choice (promote the odd indices of each
sorted, even-length compaction window) so the sketch is a pure function
of its input MULTISET — reproducible across runs, machines and Ray
layouts — at the cost of a deterministic (bounded, one item per
compaction per level) rank bias, which stays inside the same
O(n log(n/k)/k) envelope.  Reproducibility is what makes the sketch
oracle-checkable, the same trade the repo makes for ids (SURVEY §7.4).

Layout invariance: a sketch built from Ray blocks would depend on block
boundaries.  Instead rows are bucketed by a CONTENT hash (the exchange
the caller already does), each bucket builds its sketch from its SORTED
values (a sorted feed is order-free), and bucket sketches merge in
bucket-id order — every step a function of content only.

Total weight is conserved exactly (each compaction turns 2m items of
weight w into m items of weight 2w), so quantile queries address real
ranks: quantile(q) = smallest value whose cumulative weight reaches
ceil(q * n).
"""

from __future__ import annotations

import numpy as np

K_DEFAULT = 64


def build_sketch(sorted_vals: np.ndarray, k: int = K_DEFAULT) -> list[np.ndarray]:
    """Sketch of a SORTED int64 array: levels[i] = sorted buffer of
    weight 2^i items.  Level 0 consumes the stream in k-sized chunks;
    a full chunk promotes its odd indices (k//2 items, weight doubled)
    and the final partial chunk stays in the buffer.  Higher levels
    compact the same way whenever they reach k."""
    vals = np.asarray(sorted_vals, dtype=np.int64)
    levels: list[np.ndarray] = []
    n_full = len(vals) // k
    levels.append(vals[n_full * k:].copy())
    carry = [vals[i * k: (i + 1) * k][1::2] for i in range(n_full)]
    lvl = 1
    while carry:
        # carry: list of sorted k//2-sized promotions into level `lvl`
        buf = np.concatenate(carry) if carry else np.empty(0, np.int64)
        buf.sort(kind="stable")
        n_full = len(buf) // k
        levels.append(buf[n_full * k:].copy())
        carry = [buf[i * k: (i + 1) * k][1::2] for i in range(n_full)]
        lvl += 1
    return levels


def merge_sketches(
    a: list[np.ndarray], b: list[np.ndarray], k: int = K_DEFAULT
) -> list[np.ndarray]:
    """Merge two sketches: concatenate level-wise, then cascade any
    over-capacity buffer upward — if a buffer exceeds k, its largest
    item is set aside when the length is odd, the even-length remainder
    promotes its odd indices, and the buffer keeps only the set-aside.
    Deterministic; associative up to the documented bias envelope."""
    n = max(len(a), len(b))
    out: list[np.ndarray] = []
    carry = np.empty(0, np.int64)
    i = 0
    while i < n or len(carry):
        parts = [carry]
        if i < len(a):
            parts.append(np.asarray(a[i], np.int64))
        if i < len(b):
            parts.append(np.asarray(b[i], np.int64))
        buf = np.concatenate(parts)
        buf.sort(kind="stable")
        if len(buf) > k:
            if len(buf) % 2:
                keep, body = buf[-1:], buf[:-1]
            else:
                keep, body = buf[:0], buf
            out.append(keep.copy())
            carry = body[1::2].copy()
        else:
            out.append(buf.copy())
            carry = np.empty(0, np.int64)
        i += 1
    return out


def sketch_weight(levels: list[np.ndarray]) -> int:
    return sum((1 << i) * len(buf) for i, buf in enumerate(levels))


def sketch_to_rows(levels: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Flatten to (value, weight) arrays — the serialization that rides
    the exchange (O(k log(n/k)) rows per bucket)."""
    vals, wts = [], []
    for i, buf in enumerate(levels):
        vals.append(np.asarray(buf, np.int64))
        wts.append(np.full(len(buf), 1 << i, np.int64))
    return np.concatenate(vals), np.concatenate(wts)


def rows_to_sketch(vals: np.ndarray, wts: np.ndarray) -> list[np.ndarray]:
    levels: list[np.ndarray] = []
    wts = np.asarray(wts, np.int64)
    vals = np.asarray(vals, np.int64)
    lvl = 0
    while (1 << lvl) <= (wts.max() if len(wts) else 0):
        sel = np.sort(vals[wts == (1 << lvl)])
        levels.append(sel)
        lvl += 1
    return levels


def quantile(levels: list[np.ndarray], q_num: int, q_den: int) -> int:
    """Smallest sketch value whose cumulative weight >= ceil(q * W)."""
    vals, wts = sketch_to_rows(levels)
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    w = sketch_weight(levels)
    target = max(1, -(-q_num * w // q_den))  # ceil
    cum = np.cumsum(wts)
    idx = int(np.searchsorted(cum, target, side="left"))
    return int(vals[min(idx, len(vals) - 1)])


def rank_error_bound(n: int, k: int = K_DEFAULT) -> int:
    """Conservative worst-case rank drift: each compaction at level l
    moves any rank by at most 2^l, and level l sees at most
    n / (k 2^l) compactions -> n/k per level, summed over levels."""
    import math

    if n <= k:
        return 0
    lvls = max(1, math.ceil(math.log2(n / k)) + 1)
    return (n // k + 1) * lvls
