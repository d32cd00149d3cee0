"""Built-in synthetic language profiles.

Profile format mirrors the reference's ``data/*.prof`` files
(``WORD|mean_log10_relfreq|sd|limit``, stopwords prefixed ``!`` — ref:
trtextassessment.pas:285-327).  These are OUR deterministic synthetic
profiles (the reference's shipped profiles are data we neither need nor
copy): one English-function-word profile and one "query-English" profile
matching the driver ``documents`` vocabulary, so assessment over the test
tables produces a meaningful spread.
"""

from __future__ import annotations

import math

_EN_WORDS = [
    ("the", 0.045), ("and", 0.030), ("of", 0.028), ("to", 0.026), ("a", 0.023),
    ("in", 0.021), ("is", 0.011), ("it", 0.010), ("for", 0.009), ("on", 0.0085),
    ("that", 0.008), ("with", 0.007), ("as", 0.006), ("at", 0.005), ("this", 0.0045),
    ("by", 0.004), ("from", 0.0035), ("or", 0.003), ("an", 0.0028), ("be", 0.0025),
]

_QUERYISH_WORDS = [
    ("the", 0.03), ("join", 0.02), ("scan", 0.02), ("sort", 0.02), ("table", 0.02),
    ("row", 0.02), ("key", 0.02), ("order", 0.02), ("group", 0.02), ("filter", 0.02),
    ("merge", 0.015), ("hash", 0.015), ("query", 0.015), ("data", 0.015),
    ("fast", 0.015), ("slow", 0.01), ("small", 0.01), ("column", 0.01),
    ("window", 0.01), ("stream", 0.01),
]


def _fmt(words: list[tuple[str, float]], sd: float = 0.6, limit: float = 4.0) -> str:
    lines = []
    for w, f in words:
        lines.append(f"{w.upper()}|{math.log10(f):.4f}|{sd}|{limit}")
    return "\n".join(lines)


def default_profiles() -> list[tuple[str, str]]:
    """[(name, profile_text)] for the Assessor stage."""
    return [
        ("en", _fmt(_EN_WORDS)),
        ("queryish", _fmt(_QUERYISH_WORDS)),
    ]
