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

import numpy as np


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


def _suffix_array_lcps(s: str) -> list[int]:
    """Adjacent-suffix longest-common-prefix lengths in suffix-sorted
    order (O(n^2 log n) naive sort — doc-sized strings only)."""
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])
    lcps = []
    for a, b in zip(sa, sa[1:]):
        l = 0
        while a + l < n and b + l < n and s[a + l] == s[b + l]:
            l += 1
        lcps.append(l)
    return lcps


def longest_repeated_substring(s: str) -> int:
    """Length of the longest substring occurring >= 2 times (possibly
    overlapping) = max adjacent LCP over the suffix array.  0 if all
    characters are distinct (or len < 2)."""
    if len(s) < 2:
        return 0
    lcps = _suffix_array_lcps(s)
    return max(lcps) if lcps else 0


def longest_repeated_substring_brute(s: str) -> int:
    """Independent twin: binary-search the answer length; at each
    length l scan a rolling set of all l-grams for a duplicate."""
    n = len(s)

    def has_repeat(l: int) -> bool:
        seen: set[str] = set()
        for i in range(n - l + 1):
            g = s[i:i + l]
            if g in seen:
                return True
            seen.add(g)
        return False

    lo, hi = 0, n - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_repeat(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def distinct_substrings(s: str) -> int:
    """Number of distinct non-empty substrings via a suffix automaton
    (Blumer et al. 1985): sum over non-initial states of
    len(state) - len(link(state)).  Linear construction."""
    # suffix automaton over arbitrary unicode chars (dict transitions)
    MAXLEN: list[int] = [0]
    LINK: list[int] = [-1]
    TRANS: list[dict] = [{}]
    last = 0
    for ch in s:
        cur = len(MAXLEN)
        MAXLEN.append(MAXLEN[last] + 1)
        LINK.append(-1)
        TRANS.append({})
        p = last
        while p != -1 and ch not in TRANS[p]:
            TRANS[p][ch] = cur
            p = LINK[p]
        if p == -1:
            LINK[cur] = 0
        else:
            q = TRANS[p][ch]
            if MAXLEN[p] + 1 == MAXLEN[q]:
                LINK[cur] = q
            else:
                clone = len(MAXLEN)
                MAXLEN.append(MAXLEN[p] + 1)
                LINK.append(LINK[q])
                TRANS.append(dict(TRANS[q]))
                while p != -1 and TRANS[p].get(ch) == q:
                    TRANS[p][ch] = clone
                    p = LINK[p]
                LINK[q] = clone
                LINK[cur] = clone
        last = cur
    return sum(MAXLEN[v] - MAXLEN[LINK[v]] for v in range(1, len(MAXLEN)))


def distinct_substrings_suffixarray(s: str) -> int:
    """Independent twin: n(n+1)/2 minus the sum of adjacent suffix-
    array LCPs (each LCP position is a substring counted twice)."""
    n = len(s)
    if n == 0:
        return 0
    return n * (n + 1) // 2 - sum(_suffix_array_lcps(s))


def bwt_runs(s: str) -> tuple[int, int]:
    """(length, run count) of the Burrows-Wheeler transform of
    ``s + sentinel`` — the run count is the bzip2-style compressibility
    proxy (repetitive text clusters identical characters in the BWT).

    The suffix array comes from numpy PREFIX DOUBLING (O(n log^2 n)
    lexsort rounds, no per-character Python) — with a unique smallest
    sentinel, suffix order equals rotation order, so
    ``bwt[i] = s2[(sa[i] - 1) % n]``.  The independent twin
    (``bwt_runs_rotations``) sorts the explicit rotations instead."""
    s2 = s.replace("\x00", "") + "\x00"
    n = len(s2)
    if n == 1:
        return 1, 1
    rank = np.fromiter(map(ord, s2), np.int64, n)
    k = 1
    while True:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        diff = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        new = np.empty(n, np.int64)
        new[order] = np.concatenate([[0], np.cumsum(diff)])
        rank = new
        if rank[order[-1]] == n - 1:
            sa = order
            break
        k *= 2
    bwt = rank  # reuse buffer shape: gather previous characters
    codes = np.fromiter(map(ord, s2), np.int64, n)
    bwt = codes[(sa - 1) % n]
    return n, 1 + int((bwt[1:] != bwt[:-1]).sum())


def bwt_runs_rotations(s: str) -> tuple[int, int]:
    """Independent twin: sort the explicit rotations of
    ``s + sentinel``, read the last column, count runs."""
    s2 = s.replace("\x00", "") + "\x00"
    n = len(s2)
    d = s2 + s2
    order = sorted(range(n), key=lambda i: d[i : i + n])
    bwt = [s2[(i - 1) % n] for i in order]
    runs = 1 + sum(1 for a, b in zip(bwt, bwt[1:]) if a != b)
    return n, runs
