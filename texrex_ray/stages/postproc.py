"""Post-processing tools: hydra (de-hyphenation) and rofl (run-together
sentence fixing).

hydra semantics (ref: trhydraapplication.pas:400-568): for a token pair
``xxx- yyy`` compare unigram probabilities (add-one smoothed, from a
``freq\\tword`` model, ref :146-207) of three candidates — keep the parts
(``xxx``/``yyy`` separate), the merged form (``xxxyyy``), or the
concatenated hyphen form (``xxx-yyy``) — and rewrite to the most probable;
non-destructive mode wraps replacements in ``<normalized from="...">``.

rofl semantics (ref: trroflapplication.pas:380-493): candidate regex
``(L{2,})([!?:.]+)(L{2,})`` — split into two sentences iff both sides are
in the word list and neither side is in the prefix/suffix ignore lists;
``:emoticon:`` spans are pre-washed; at most ``limit`` splits per line.

Both are stateless ``map_batches`` stages with the (small) models
broadcast once.
"""

from __future__ import annotations

import re

import pyarrow as pa

HYPH_RE = re.compile(r"(\w+)- (\w+)", re.UNICODE)
ROFL_RE = re.compile(r"([^\W\d_]{2,})([!?:.]+)([^\W\d_]{2,})", re.UNICODE)
EMOTICON_RE = re.compile(r":[a-z_]+:")

LEAVE, MERGE, CONCATENATE = "leavealone", "merge", "concatenate"


class UnigramLM:
    """Add-one-smoothed unigram model (ref: trhydraapplication.pas:146-207)."""

    def __init__(self, freqs: dict[str, int]):
        self.freqs = {k.lower(): int(v) for k, v in freqs.items()}
        self.total = sum(self.freqs.values()) + len(self.freqs) + 1

    def count(self, w: str) -> int:
        return self.freqs.get(w.lower(), 0)

    def p(self, w: str) -> float:
        return (self.count(w) + 1) / self.total


def hydra_decision(lm: UnigramLM, left: str, right: str) -> str:
    """Most probable of parts / merged / hyphenated, merged-first on ties.

    The probability comparisons are cross-multiplied into INTEGER
    arithmetic (p_merged ≥ p_parts ⇔ (c_m+1)·T ≥ (c_l+1)·(c_r+1)), so the
    decision is exact and reproducible by an integer SQL oracle — no float
    rounding at the tie boundaries."""
    cl, cr = lm.count(left), lm.count(right)
    cm, ch = lm.count(left + right), lm.count(left + "-" + right)
    pp = (cl + 1) * (cr + 1)
    if (cm + 1) * lm.total >= pp and cm >= ch:
        return MERGE
    if (ch + 1) * lm.total >= pp:
        return CONCATENATE
    return LEAVE


def dehyphenate(line: str, lm: UnigramLM, non_destructive: bool = False) -> str:
    def repl(m: re.Match) -> str:
        left, right = m.group(1), m.group(2)
        d = hydra_decision(lm, left, right)
        if d == MERGE:
            new = left + right
        elif d == CONCATENATE:
            new = left + "-" + right
        else:
            return m.group(0)
        if non_destructive:
            return f'<normalized from="{m.group(0)}">{new}</normalized>'
        return new

    return HYPH_RE.sub(repl, line)


def hydra_stage(lm: UnigramLM, col: str = "text", non_destructive: bool = False):
    def fn(batch: pa.Table) -> pa.Table:
        texts = [dehyphenate(s or "", lm, non_destructive) for s in batch[col].to_pylist()]
        return batch.set_column(
            batch.schema.get_field_index(col), col, pa.array(texts, pa.string())
        )

    return fn


def fix_runtogether(
    line: str,
    words: set[str],
    prefix_ignore: set[str] = frozenset(),
    suffix_ignore: set[str] = frozenset(),
    limit: int = 3,
    with_count: bool = False,
) -> str | tuple[str, int]:
    # pre-wash phpBB emoticons so ":lol:" doesn't trigger a split
    protected = {}

    def protect(m: re.Match) -> str:
        key = f"\x00{len(protected)}\x00"
        protected[key] = m.group(0)
        return key

    line = EMOTICON_RE.sub(protect, line)
    n = 0

    def repl(m: re.Match) -> str:
        nonlocal n
        a, punct, b = m.group(1), m.group(2), m.group(3)
        if n >= limit:
            return m.group(0)
        if (
            a.lower() in words
            and b.lower() in words
            and a.lower() not in prefix_ignore
            and b.lower() not in suffix_ignore
        ):
            n += 1
            return f"{a}{punct} {b[0].upper()}{b[1:]}"
        return m.group(0)

    line = ROFL_RE.sub(repl, line)
    for key, val in protected.items():
        line = line.replace(key, val)
    return (line, n) if with_count else line


def rofl_stage(
    words: set[str],
    col: str = "text",
    prefix_ignore: set[str] = frozenset(),
    suffix_ignore: set[str] = frozenset(),
    limit: int = 3,
):
    def fn(batch: pa.Table) -> pa.Table:
        texts = [
            fix_runtogether(s or "", words, prefix_ignore, suffix_ignore, limit)
            for s in batch[col].to_pylist()
        ]
        return batch.set_column(
            batch.schema.get_field_index(col), col, pa.array(texts, pa.string())
        )

    return fn
