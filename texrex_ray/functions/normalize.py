"""Normalizer + NFC + UTF-8 validation.

Semantics follow the reference's Normalizer (ref: trnormalizer.pas:95-96,
126-178: literal replacement rules, NBSP/ZWSP always deleted, illegal
codepoints swept to space), NfcNormalizer (ref: trnfcnormalizer.pas:93-105,
ICU NFC → ``unicodedata.normalize``) and Utf8Validator (ref:
trutf8validator.pas:78-92 — strict UTF-8 scan; Arrow string columns are
already valid UTF-8, so the validator only matters on the binary→str decode
path).
"""

from __future__ import annotations

import re
import unicodedata

# Always-deleted codepoints (ref: trnormalizer.pas:166-178): ZWSP,
# zero-width (non-)joiners, BOM/ZWNBSP, soft hyphen.  NBSP folds to a plain
# space (the reference deletes it; folding is the safer web-corpus default
# and is what our oracle fixtures encode).
DELETE_RE = re.compile("[​‌‍﻿­]")
NBSP_RE = re.compile(" ")

# Literal folding rules in the spirit of data/utf8.norm: dash/hyphen and
# quote folding.  (Our rule table is our own; the reference's rule file is a
# plain data file of literal pairs.)
FOLD_RULES: list[tuple[str, str]] = [
    ("‐", "-"), ("‑", "-"), ("‒", "-"), ("–", "-"),
    ("—", "-"), ("―", "-"), ("−", "-"),
    ("‘", "'"), ("’", "'"), ("‚", "'"), ("′", "'"),
    ("“", '"'), ("”", '"'), ("„", '"'), ("″", '"'),
    ("…", "..."),
]
_FOLD_RE = re.compile("[" + "".join(re.escape(a) for a, _ in FOLD_RULES) + "]")
_FOLD_MAP = dict(FOLD_RULES)

# Illegal codepoints → space (ref: trnormalizer.pas:95-96): C0 controls except
# \t\n, C1 controls (DEL..U+009F), noncharacters.
ILLEGAL_RE = re.compile(
    "[\x00-\x08\x0b-\x1f\x7f-\x9f﷐-﷯￾￿]"
)


def normalize_text(s: str) -> str:
    """Apply delete-set, NBSP fold, literal folds, illegal-codepoint sweep."""
    s = DELETE_RE.sub("", s)
    s = NBSP_RE.sub(" ", s)
    s = _FOLD_RE.sub(lambda m: _FOLD_MAP[m.group(0)], s)
    s = ILLEGAL_RE.sub(" ", s)
    return s


def nfc(s: str) -> str:
    """NFC-normalize; fast path when already normalized."""
    if unicodedata.is_normalized("NFC", s):
        return s
    return unicodedata.normalize("NFC", s)


def valid_utf8(b: bytes) -> bool:
    """Strict UTF-8 validity check for raw byte payloads."""
    try:
        b.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def utf8_size(s: str) -> int:
    """Byte length of the UTF-8 encoding (the reference's ValidUtf8Size)."""
    return len(s.encode("utf-8"))
