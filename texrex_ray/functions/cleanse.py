"""SecondPass-equivalent text cleansing.

Semantics follow the reference's second pass (ref: trsecondpass.pas:135-282
and trentityconverters.pas:71-85): decode HTML entities (named + numeric,
"double-washed" so that already-escaped entities like ``&amp;acirc;`` decode
fully), then blank leftover markup tags, e-mail addresses, URIs and
hashtags/mentions, counting each replacement class, and collapse runs of
whitespace.  The named-entity table is Python's public ``html`` module table
rather than the reference's 253-entry list (a superset).

Pure string functions; the batch stage wrapper lives in
``texrex_ray.stages.secondpass``.
"""

from __future__ import annotations

import html
import re

# Leftover markup after stripping: "<" followed by a non-space, up to ">".
TAG_RE = re.compile(r"<[^>\s<][^>]*>")
EMAIL_RE = re.compile(r"[\w.+-]+@[\w-]+(?:\.[\w-]+)+")
URI_RE = re.compile(r"(?:https?|ftp)://[^\s<>\"]+|\bwww\.[^\s<>\"]+", re.IGNORECASE)
HASHTAG_RE = re.compile(r"(?<![\w&])[#@]\w{2,}")
MULTISPACE_RE = re.compile(r"[ \t\r\f\v]+")

BLANK = " "


def decode_entities(s: str) -> str:
    """Entity decode with a double wash (ref: trentityconverters.pas:71-85).

    ``&amp;acirc;`` → ``&acirc;`` → ``â``; strings without ``&`` return
    unchanged at near-zero cost.
    """
    if "&" not in s:
        return s
    s = html.unescape(s)
    if "&" in s:
        s = html.unescape(s)
    return s


def cleanse(s: str) -> tuple[str, int, int, int, int]:
    """Blank tags / emails / URIs / hashtags; return (text, n_tag, n_email, n_uri, n_hashtag).

    Replacement counts mirror the per-div metrics the reference records
    (ref: trsecondpass.pas:135-141 CleansedTags/Emails/Uris/HashTags).
    URIs are blanked before e-mails so ``http://a@b.c`` counts once as a URI.
    """
    n_tag = n_email = n_uri = n_hash = 0
    if "<" in s:
        s, n_tag = TAG_RE.subn(BLANK, s)
    s, n_uri = URI_RE.subn(BLANK, s)
    if "@" in s:
        s, n_email = EMAIL_RE.subn(BLANK, s)
        s, n_hash = HASHTAG_RE.subn(BLANK, s)
    elif "#" in s:
        s, n_hash = HASHTAG_RE.subn(BLANK, s)
    return s, n_tag, n_email, n_uri, n_hash


def collapse_whitespace(s: str) -> str:
    """Collapse horizontal whitespace runs to one space and trim."""
    return MULTISPACE_RE.sub(" ", s).strip()


def cleanse_full(s: str) -> tuple[str, int, int, int, int]:
    """decode entities → blank junk → collapse whitespace."""
    s = decode_entities(s)
    s, a, b, c, d = cleanse(s)
    return collapse_whitespace(s), a, b, c, d
