"""Phonetic keys for record linkage (American Soundex).

Reference analogue: the reference's normalizer/assessment stack has no
phonetic pass; this is a training-data-pipeline extension (fuzzy entity
matching / name deduplication) in the spirit of q202 record linkage and
q277 SymSpell.  Spec = classic American Soundex: first letter kept;
remaining letters mapped b f p v→1, c g j k q s x z→2, d t→3, l→4,
m n→5, r→6; h and w are transparent (a run of equal codes separated
only by h/w collapses); vowels a e i o u y break runs and emit nothing;
the first letter's own code group is consumed; pad/truncate to
letter + 3 digits.

Two implementations on purpose:

- ``soundex_series`` — vectorized pandas path (str.translate with h/w
  deletion, regex run-collapse) used by the query;
- tests / the oracle fixture re-derive keys with an explicit per-letter
  state machine, so the two must agree key-for-key.
"""

from __future__ import annotations

import pandas as pd

_CODE = {}
for _letters, _digit in (
    ("bfpv", "1"), ("cgjkqszx", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6"), ("aeiouy", "0"),
):
    for _ch in _letters:
        _CODE[_ch] = _digit

# translate table: letters -> digit codes, h/w deleted entirely
_TRANS = {ord(c): d for c, d in _CODE.items()}
_TRANS[ord("h")] = None
_TRANS[ord("w")] = None


def soundex_series(tokens: pd.Series) -> pd.Series:
    """Vectorized Soundex over a Series of lowercase [a-z]+ tokens."""
    s = tokens.astype(str)
    first = s.str[0]
    # the first letter's code leads the string so its group is consumed
    # uniformly by the slice(1) below; h/w get the no-op code "7" (they
    # are transparent, nothing collapses into them)
    first_code = first.map(_CODE).fillna("7")
    codes = first_code + s.str.slice(1).str.translate(_TRANS)
    collapsed = codes.str.replace(r"(.)\1+", r"\1", regex=True)
    digits = collapsed.str.slice(1).str.replace("0", "", regex=False)
    return first + digits.str.pad(3, "right", "0").str.slice(0, 3)


def soundex_one(token: str) -> str:
    """Scalar state-machine twin (used by tests and oracle fixtures)."""
    first = token[0]
    prev = _CODE.get(first, "7")
    out = []
    for ch in token[1:]:
        if ch in "hw":
            continue
        c = _CODE[ch]
        if c == "0":
            prev = "0"
            continue
        if c != prev:
            out.append(c)
        prev = c
    return first + ("".join(out) + "000")[:3]
