"""Unicode-letter-range tokenizer + type/token statistics.

Semantics follow the reference's UnicodeLetterRangeTokenizer (ref:
trunicodeletterrangetokenizer.pas:117-211: tokens are maximal runs of
codepoints inside configured letter ranges, default Latin blocks) and
TTrTypeTokenData (ref: trdata.pas:69-121, 734-817: upper-cased types with
counts and relative frequencies).

The default range set covers Basic Latin letters, Latin-1 letters and the
Latin Extended blocks, mirroring the reference's default configuration.
"""

from __future__ import annotations

import re
from collections import Counter

# Latin letter runs (Basic + Latin-1 supplement letters + Extended-A/B +
# Extended Additional), the reference's default range set.
LATIN_TOKEN_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ʸḀ-ỿ]+")
# Any-letter alternative (all Unicode letters) for multilingual corpora.
ANY_LETTER_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenize(s: str, pattern: re.Pattern[str] = LATIN_TOKEN_RE) -> list[str]:
    """Maximal letter runs in ``s`` under the configured ranges."""
    return pattern.findall(s)


def type_counts(tokens: list[str]) -> Counter[str]:
    """Upper-cased type→count map (ref: trdata.pas:734-759 uses ICU upper)."""
    return Counter(t.upper() for t in tokens)


def rel_freqs(counts: Counter[str]) -> dict[str, float]:
    """Relative frequency per type (ref: trdata.pas:803-817)."""
    total = sum(counts.values())
    if total == 0:
        return {}
    inv = 1.0 / total
    return {t: c * inv for t, c in counts.items()}
