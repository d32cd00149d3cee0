"""Aho-Corasick multi-pattern matcher — the blocklist / term-census engine.

The reference scans documents against fixed term lists one regex at a
time (trrofl.pas word-list passes; trtexprofil.pas profile terms); at
100 TB a per-pattern pass is O(patterns x corpus).  Aho-Corasick builds
ONE automaton over all patterns and counts every (possibly overlapping,
possibly nested) occurrence of every pattern in a single left-to-right
scan — O(corpus + matches) regardless of pattern count.

Deployment shape: the automaton is built once per actor in ``__init__``
(stateful map_batches stage); only pattern-sized count rows leave each
task.  The scan itself is per-character Python over doc-sized strings —
the same inherently-sequential-per-string regime as tokenize/regex
explode stages, with the state machine in flat dicts.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class AhoCorasick:
    """Automaton over a fixed pattern list; counts ALL occurrences.

    Matches are counted at every end position, so overlapping ("aa" in
    "aaa" -> 2) and nested ("a" inside "table") occurrences all count —
    the exact semantics of a position-scan `substr(text, i, len(p)) = p`
    SQL twin.
    """

    def __init__(self, patterns: list[str]) -> None:
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns")
        self.patterns = list(patterns)
        # goto trie: state -> {char: state}; state 0 is the root
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for pi, pat in enumerate(self.patterns):
            if not pat:
                raise ValueError("empty pattern")
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(pi)
        # BFS failure links; merge output sets along fail chains so a
        # single state lookup yields every pattern ending here
        fail = [0] * len(goto)
        q: deque[int] = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
                out[s] = out[s] + out[fail[s]]
        self._goto = goto
        self._fail = fail
        self._out = out

    def count(self, text: str) -> np.ndarray:
        """Occurrence count per pattern (int64, len == len(patterns))."""
        goto, fail, out = self._goto, self._fail, self._out
        counts = np.zeros(len(self.patterns), dtype=np.int64)
        s = 0
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            o = out[s]
            if o:
                for pi in o:
                    counts[pi] += 1
        return counts
