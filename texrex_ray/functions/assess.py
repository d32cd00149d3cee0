"""Text quality assessment (badness) + profile-based language ID.

Semantics follow the reference's TextAssessment (ref:
trtextassessment.pas:210-333): a language profile is a list of frequent
words, each with the mean and standard deviation of the log10 relative
frequency observed in clean corpora plus a per-word penalty ``limit``.  For
a document, each profile word contributes the clamped standardized negative
deviation of its observed log10 relative frequency; a profile word missing
from the document contributes its full ``limit``.  Badness above a threshold
kills the document.  The Multi variant (ref: trtextassessment.pas:127-165)
evaluates profiles in sequence, takes the argmin as the document language
and can early-break below ``break_threshold``.

Profile text format mirrors ``data/*.prof``: ``WORD|mean|sd|limit`` lines,
stopword lines prefixed ``!`` (ref: trtextassessment.pas:285-327).
Badness here is the *mean* per-profile-word contribution (the reference
accumulates a sum over its fixed-size profile; mean makes thresholds
profile-size independent — documented deviation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class LanguageProfile:
    name: str
    # word -> (mean_log10_relfreq, sd, limit)
    words: dict[str, tuple[float, float, float]]
    stopwords: set[str] = field(default_factory=set)

    @classmethod
    def parse(cls, name: str, text: str) -> "LanguageProfile":
        words: dict[str, tuple[float, float, float]] = {}
        stop: set[str] = set()
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("!"):
                stop.add(line[1:].strip().upper())
                continue
            parts = line.split("|")
            if len(parts) != 4:
                continue
            w, mean, sd, limit = parts
            words[w.upper()] = (float(mean), float(sd), float(limit))
        return cls(name=name, words=words, stopwords=stop)


def badness(rel_freq: dict[str, float], profile: LanguageProfile) -> float:
    """Mean clamped negative deviation over the profile words.

    (ref: trtextassessment.pas:210-260)
    """
    if not profile.words:
        return 0.0
    total = 0.0
    for w, (mean, sd, limit) in profile.words.items():
        rf = rel_freq.get(w)
        if rf is None or rf <= 0.0:
            total += limit
            continue
        dev = (math.log10(rf) - mean) / sd if sd > 0 else 0.0
        # only deviations BELOW the mean count (word rarer than expected)
        total += min(max(-dev, 0.0), limit)
    return total / len(profile.words)


def assess_multi(
    rel_freq: dict[str, float],
    profiles: list[LanguageProfile],
    break_threshold: float = 0.0,
) -> tuple[str, float]:
    """(language, min badness) over profiles, optional early break.

    (ref: trtextassessment.pas:127-165)
    """
    best_lang, best = "unknown", math.inf
    for p in profiles:
        b = badness(rel_freq, p)
        if b < best:
            best_lang, best = p.name, b
            if break_threshold > 0 and b <= break_threshold:
                break
    return best_lang, best
