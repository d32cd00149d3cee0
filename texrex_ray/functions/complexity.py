"""Lempel-Ziv (1976) sequence complexity — the compressibility signal.

c(S) = number of phrases in the exhaustive production parse of S: each
phrase is the shortest prefix of the remaining text that does NOT occur
earlier (occurrences may start before the phrase and overlap into it —
the classic LZ76 reproduction rule).  Low c(S)/len ratio flags
template/boilerplate text; random text approaches n/log n phrases.
A pure-integer, deterministic quality feature for curation — unlike a
real compressor it has no window/dictionary tuning.

Two independent implementations live in this repo: this one (prefix
search via C-level ``str.find``) and the Kaspar-Schuster index-walk
twin in tests / tools/gen_oracle_fixtures.py.
"""

from __future__ import annotations


def lz76_complexity(s: str) -> int:
    """Number of LZ76 production phrases in ``s`` (0 for empty)."""
    n = len(s)
    i = 0
    c = 0
    while i < n:
        k = 1
        # grow the phrase while s[i:i+k] occurs starting before i
        # (search window s[0:i+k-1] => occurrence start <= i-1)
        while i + k <= n and s.find(s[i:i + k], 0, i + k - 1) != -1:
            k += 1
        i += k  # phrase = matched run + 1 innovation char (end-clipped)
        c += 1
    return c


def lz76_kaspar_schuster(s: str) -> int:
    """Independent twin: the Kaspar-Schuster (1987) pointer walk —
    char-by-char comparisons, no substring search primitive."""
    n = len(s)
    if n == 0:
        return 0
    c = 1
    l = 1
    while l < n:
        kmax = 0
        for start in range(l):  # candidate earlier occurrence starts
            k = 0
            while l + k < n and s[start + k] == s[l + k]:
                k += 1
            kmax = max(kmax, k)
            if l + kmax >= n:
                break
        c += 1
        l += kmax + 1
    return c


def smallest_period(s: str) -> int:
    """Minimal p >= 1 with s[i] == s[i+p] for all 0 <= i < n-p
    (= n - longest proper border, via the KMP failure function).
    Empty string -> 0.  p == n means aperiodic (no self-overlap)."""
    n = len(s)
    if n == 0:
        return 0
    fail = [0] * (n + 1)
    k = 0
    for i in range(1, n):
        while k and s[i] != s[k]:
            k = fail[k]
        if s[i] == s[k]:
            k += 1
        fail[i + 1] = k
    return n - fail[n]


def smallest_period_brute(s: str) -> int:
    """Independent twin: try each shift p ascending, scalar compare."""
    n = len(s)
    if n == 0:
        return 0
    for p in range(1, n):
        if all(s[i] == s[i + p] for i in range(n - p)):
            return p
    return n
