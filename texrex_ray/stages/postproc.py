"""Post-processing tools: hydra (de-hyphenation) and rofl (run-together
sentence fixing).

hydra semantics (ref: trhydraapplication.pas:400-568): scan token pairs;
when the left token matches ``^[-\\p{L}]{2,}-$`` and the right
``^([-\\p{L}]{2,})(\\P{L}|)$``, compare unigram probabilities (add-one
smoothed, ref :146-207) of the prefix (hyphen included), the suffix, the
concatenated form (hyphen kept: ``unter-werfen``) and the merged form
(hyphen dropped: ``unterwerfen``); rewrite to concat/merge only when it
STRICTLY beats all alternatives; otherwise the optional German NN-compound
rule (``^[upper][lower]+-$`` + ``^[upper][lower]+$`` → concatenate, ref
:474-481) applies; non-destructive mode wraps replacements in
``<normalized from="...">``.  All probability comparisons share the same
denominator, so they reduce to exact integer count comparisons
(reproducible by the SQL oracle).

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

_L = "A-Za-zÀ-ÖØ-öø-ʸḀ-ỿ"  # the tokenizer's Latin letter ranges
HYPH_RE = re.compile(r"(\w+)- (\w+)", re.UNICODE)
# candidate patterns (ref: trhydraapplication.pas:136-139)
CAND_LEFT_RE = re.compile(rf"^[-{_L}]{{2,}}-$")
CAND_RIGHT_RE = re.compile(rf"^([-{_L}]{{2,}})([^{_L}]|)$")
GERMAN_LEFT_RE = re.compile(r"^[A-ZÀ-Þ][a-zß-ÿ]+-$")
GERMAN_RIGHT_RE = re.compile(r"^[A-ZÀ-Þ][a-zß-ÿ]+$")
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


def hydra_decision(
    lm: UnigramLM, prefix: str, suffix: str, german: bool = False
) -> str:
    """Decision for a candidate pair (ref: trhydraapplication.pas:444-481).

    ``prefix`` carries its trailing hyphen (the reference looks up the raw
    token).  Since all four probabilities share the LM total as
    denominator, the strict > comparisons reduce to exact integer count
    comparisons — no float arithmetic, SQL-reproducible."""
    concat = prefix + suffix          # unter-werfen (hyphen kept)
    merger = prefix[:-1] + suffix     # unterwerfen
    cp, cs = lm.count(prefix), lm.count(suffix)
    cc, cm = lm.count(concat), lm.count(merger)
    if cc > cp and cc > cs and cc > cm:
        return CONCATENATE
    if cm > cp and cm > cs and cm > cc:
        return MERGE
    if german and GERMAN_LEFT_RE.match(prefix) and GERMAN_RIGHT_RE.match(suffix):
        return CONCATENATE
    return LEAVE


def dehyphenate(
    line: str,
    lm: UnigramLM,
    non_destructive: bool = False,
    german: bool = False,
    with_count: bool = False,
) -> str | tuple[str, int]:
    """Token-pair scan per the reference's DoHydra loop: a rewrite consumes
    BOTH tokens (i += 2); a leave/non-candidate advances one so the right
    token may start the next candidate."""
    toks = line.split(" ")
    out: list[str] = []
    n_rewrites = 0
    i = 0
    while i < len(toks):
        if i == len(toks) - 1:
            out.append(toks[i])
            break
        m_r = CAND_RIGHT_RE.match(toks[i + 1]) if CAND_LEFT_RE.match(toks[i]) else None
        if m_r:
            prefix, suffix, after = toks[i], m_r.group(1), m_r.group(2)
            d = hydra_decision(lm, prefix, suffix, german=german)
            if d != LEAVE:
                new = (prefix + suffix if d == CONCATENATE else prefix[:-1] + suffix) + after
                orig = f"{prefix} {suffix}{after}"
                out.append(
                    f'<normalized from="{orig}">{new}</normalized>'
                    if non_destructive
                    else new
                )
                n_rewrites += 1
                i += 2
                continue
        out.append(toks[i])
        i += 1
    joined = " ".join(out)
    return (joined, n_rewrites) if with_count else joined


def hydra_stage(
    lm: UnigramLM, col: str = "text", non_destructive: bool = False, german: bool = False
):
    def fn(batch: pa.Table) -> pa.Table:
        texts = [
            dehyphenate(s or "", lm, non_destructive, german=german)
            for s in batch[col].to_pylist()
        ]
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
