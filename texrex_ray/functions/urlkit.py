"""URL scalar functions: host/tld extraction, link scoping, IP↔int.

Semantics follow the reference's utilities (ref: trutilities.pas:393-405
host/tld extraction; :420-471 link relation classing; :481-517 IP↔int) and
the walker's link scoping (ref: trwalkers.pas:774-823).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_SCHEMES = ("http", "https")


def host_of(url: str) -> str:
    """Lower-cased hostname, '' when unparseable."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def tld_of(host: str) -> str:
    """Suffix after the last dot (ref: trutilities.pas:393-405)."""
    i = host.rfind(".")
    return host[i + 1 :] if i >= 0 else ""


def nonvirtual_host(host: str) -> str:
    """Host without its first label when it has ≥3 labels (www.a.b → a.b)."""
    parts = host.split(".")
    return ".".join(parts[1:]) if len(parts) >= 3 else host


# Link relation classes (ref: trutilities.pas:420-471)
SAME_FULL_HOST = 0
SAME_VIRTUAL_HOST = 1
DIFFERENT_HOST = 2


def link_relation(src_host: str, dst_host: str) -> int:
    if dst_host == src_host:
        return SAME_FULL_HOST
    if nonvirtual_host(dst_host) == nonvirtual_host(src_host):
        return SAME_VIRTUAL_HOST
    return DIFFERENT_HOST


def resolve_link(base_url: str, href: str) -> str | None:
    """Absolute URL for an href, http(s) only, fragments dropped."""
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "#", "data:")):
        return None
    try:
        absu = urljoin(base_url, href)
    except ValueError:
        return None
    sp = absu.split("#", 1)[0]
    try:
        scheme = urlsplit(sp).scheme
    except ValueError:
        return None
    if scheme not in _SCHEMES:
        return None
    return sp


DEFAULT_BLOCK_FILE_RE = re.compile(
    r"\.(?:jpe?g|png|gif|webp|bmp|ico|svg|pdf|zip|gz|tar|rar|7z|exe|dmg|iso|"
    r"mp3|mp4|avi|mov|mkv|wmv|flv|ogg|wav|css|js|woff2?|ttf|eot)(?:$|\?)",
    re.IGNORECASE,
)


def scope_links(
    src_url: str,
    hrefs: list[str],
    use_same_host: bool = True,
    use_same_virtual_host: bool = True,
    use_external: bool = True,
    host_scope_re: re.Pattern[str] | None = None,
    block_file_re: re.Pattern[str] = DEFAULT_BLOCK_FILE_RE,
) -> list[str]:
    """Resolve + filter out-links per the walker's scoping rules.

    (ref: trwalkers.pas:774-823).  De-duplicates while preserving first-seen
    order, like the reference's TTrWalkStep link list.
    """
    src_host = host_of(src_url)
    out: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        u = resolve_link(src_url, href)
        if u is None or u in seen:
            continue
        h = host_of(u)
        if not h:
            continue
        rel = link_relation(src_host, h)
        if rel == SAME_FULL_HOST and not use_same_host:
            continue
        if rel == SAME_VIRTUAL_HOST and not use_same_virtual_host:
            continue
        if rel == DIFFERENT_HOST and not use_external:
            continue
        if host_scope_re is not None and not host_scope_re.search(h):
            continue
        if block_file_re.search(u):
            continue
        seen.add(u)
        out.append(u)
    return out


def ip_to_int(ip: str) -> int:
    """Dotted-quad IPv4 → uint32 (ref: trutilities.pas:481-517)."""
    parts = ip.split(".")
    if len(parts) != 4:
        return 0
    try:
        a, b, c, d = (int(p) for p in parts)
    except ValueError:
        return 0
    if not all(0 <= x <= 255 for x in (a, b, c, d)):
        return 0
    return (a << 24) | (b << 16) | (c << 8) | d


# --- URL canonicalization (frontier dedup) ---------------------------------
# Ordered RE2-safe rewrite chain applied to the part AFTER the scheme://host
# prefix; the prefix itself is lowercased and stripped of an explicit :80.
# The SAME pattern strings drive both the vectorized pandas path here and
# the DuckDB oracle (generated in pipelines/queries.py), so canonical forms
# are bit-identical across engines.  Order matters: fragment first, then
# tracking params (mid-list, list-head, lone), then empty-query cleanup.
URL_HEAD_RE = r"^[A-Za-z]+://[^/?#]*"
URL_CANON_TAIL_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                 # drop fragment
    (r"&utm_[^&]*", ""),           # tracking param after another param
    (r"\?utm_[^&]*&", "?"),        # tracking param at list head
    (r"\?utm_[^&]*$", ""),         # tracking param alone
    (r"\?$", ""),                  # empty query leftover
)


def canonical_urls(urls) -> "pd.Series":
    """Vectorized canonical form: lowercase scheme://host, drop :80,
    strip fragments and utm_* tracking params (pandas str ops; the regex
    subset used is identical under Python re and RE2)."""
    import pandas as pd

    s = pd.Series(urls, dtype="object").fillna("")
    head = s.str.extract(f"({URL_HEAD_RE})", expand=False).fillna("")
    tail = s.str.replace(URL_HEAD_RE, "", regex=True)
    head = head.str.lower().str.replace(r":80$", "", regex=True)
    for pat, repl in URL_CANON_TAIL_STEPS:
        tail = tail.str.replace(pat, repl, regex=True)
    return head + tail
