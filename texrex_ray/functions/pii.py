"""PII redaction: scrub e-mails, phone numbers and IPv4 addresses from text.

A training-data release pass the reference does not have but every
large-scale corpus pipeline needs (the reference's SecondPass merely
*blanks* e-mails inside divs, ref: trsecondpass.pas:190-196; this
operator replaces each class with a typed placeholder and reports
per-class counts so downstream filters can threshold on PII density).

All matching runs on RE2 via ``pyarrow.compute`` — fully vectorized,
zero-copy in, and (deliberately) the same regex engine DuckDB uses, so
the driver oracle can share the exact pattern strings (q61).  Patterns
avoid lookarounds, which RE2 lacks, and are applied in a fixed order
(e-mail → phone → IPv4) with counts taken on the progressively redacted
string: an e-mail's host part can never double-count as a phone/IP hit.

Scale shape: stateless ``map_batches`` stage, no shuffle, output is the
input plus four int64 columns — safe at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (no lookaround), shared verbatim with the DuckDB oracle.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Alternatives ordered longest-first (RE2 alternation is leftmost-first):
# a word boundary cannot precede "+"/"(", so those variants anchor inside.
PHONE_PATTERN = (
    r"(?:\+\d{1,2}[ -])?\(\d{3}\)[ -]?\d{3}[ -]\d{4}\b"
    r"|\b\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}\b"
    r"|\b\d{3}[ -]\d{3}[ -]\d{4}\b"
    r"|\b\d{3}[ -]\d{4}\b"
)
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# (column suffix, pattern, placeholder) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ip", IPV4_PATTERN, "<IP>"),
)


def redact_pii(
    batch: pa.Table,
    col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> pa.Table:
    """Replace each PII class with its placeholder; add ``n_<class>`` counts.

    The text column is rewritten in place; one int64 count column per
    pattern is appended.  Null text rows count 0 and stay null.
    """
    arr = batch.column(col)
    for name, pat, repl in patterns:
        n = pc.fill_null(pc.count_substring_regex(arr, pat), 0)
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
        batch = batch.append_column(f"n_{name}", pc.cast(n, pa.int64()))
    return batch.set_column(batch.schema.get_field_index(col), col, arr)
