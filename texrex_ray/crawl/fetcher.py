"""Synthetic fetcher: serve pages from the deterministic web graph.

Stands in for the reference's HTTP client (ref: trwalkers.pas:609-697:
records status, final URL after redirects with a ``redirect-from`` meta,
content-type charset; client restarted every 20 requests — irrelevant
here).  The fetch also runs the HTML stripper and link scoping so a fetch
result carries everything the walker (links) and the corpus (divs, title)
need — mirroring ClaraX processing its page inline (ref :700-771).

Charset handling mirrors the CharsetConverter (ref:
trcharsetconverter.pas:93-147): a declared charset wins when it names a
known codec; otherwise the first 32 KiB are sniffed (the reference's ICU
detection window, ref :96-113 — here ``charset_normalizer``, pure Python,
with a strict-UTF-8 fast path); ISO-8859-1 is always upgraded to
Windows-1252 (ref :121-129, the web-reality override).
"""

from __future__ import annotations

import codecs
from dataclasses import dataclass, field

from functools import lru_cache

from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.functions.striphtml import strip_html
from texrex_ray.functions.urlkit import DEFAULT_BLOCK_FILE_RE, scope_links


@lru_cache(maxsize=32)
def _compile_pattern(pattern: str):
    import re

    return re.compile(pattern)


def _compiled(pattern: str | None):
    return _compile_pattern(pattern) if pattern else None

DETECT_WINDOW = 32 * 1024  # ref: trcharsetconverter.pas:96-113

# ISO-8859-1 → Windows-1252 override (ref: trcharsetconverter.pas:121-129)
_LATIN1_ALIASES = {
    "iso-8859-1", "iso8859-1", "latin-1", "latin1", "l1",
    "windows-1252", "cp1252", "ansi",
}


def _codec_for(declared: str) -> str | None:
    """Python codec for a declared charset name, or None if unusable."""
    cs = (declared or "").strip().lower().replace("_", "-")
    if not cs:
        return None
    if cs in _LATIN1_ALIASES:
        return "cp1252"
    try:
        codecs.lookup(cs)
        return cs
    except LookupError:
        return None


def detect_charset(head: bytes) -> str:
    """Sniff an encoding from the leading bytes (≤ DETECT_WINDOW).

    Strict UTF-8 validity first (covers the vast majority and is cheap),
    then charset_normalizer for the long tail (Shift-JIS, KOI8, ISO-8859-x,
    Windows-125x, …), with the ISO-8859-1→Windows-1252 override applied to
    the detector's answer too."""
    if head.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if head.startswith((codecs.BOM_UTF16_LE, codecs.BOM_UTF16_BE)):
        return "utf-16"
    try:
        head.decode("utf-8")
        # ISO-2022-* is pure 7-bit, so it passes strict-UTF-8 validation
        # (and charset_normalizer itself mis-ranks long samples — see
        # tools/charset_audit.py); its ESC shift sequences are definitive,
        # so decode-verify the family directly before claiming utf-8
        if b"\x1b$" in head or b"\x1b(" in head:
            for codec in ("iso2022_jp", "iso2022_jp_2", "iso2022_kr"):
                dec = head.decode(codec, errors="replace")
                if dec.count("�") <= len(dec) // 500:
                    return codec
        return "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(head).best()
        if best is not None:
            cs = best.encoding.lower().replace("_", "-")
            return "cp1252" if cs in _LATIN1_ALIASES else cs
    except ImportError:  # pragma: no cover — lib is present in this env
        pass
    return "cp1252"


def charset_name(codec: str) -> str:
    """Canonical output name (q27 charset column): python codec name with
    the web-facing spellings for the two most common cases."""
    name = codecs.lookup(codec).name
    return {"cp1252": "windows-1252", "utf-8-sig": "utf-8"}.get(name, name)


@dataclass
class FetchResult:
    url: str
    ok: bool
    status: int
    final_url: str
    charset: str
    title: str = ""
    divs: list[str] = field(default_factory=list)
    links: list[str] = field(default_factory=list)
    raw_len: int = 0
    redirect_from: str = ""
    images: list[tuple[str, str]] = field(default_factory=list)  # (src, caption)


def decode_content(content: bytes, declared: str) -> tuple[str, str]:
    """(text, charset) per the charset-converter rules: declared charset
    (if it names a known codec) > 32 KiB sniff > cp1252 fallback."""
    codec = _codec_for(declared)
    if codec is None:
        codec = detect_charset(content[:DETECT_WINDOW])
    try:
        return content.decode(codec, errors="replace"), charset_name(codec)
    except LookupError:  # defensive: detector returned an unknown name
        return content.decode("cp1252", errors="replace"), "windows-1252"


def plain_pages(graph) -> dict[str, tuple[int, bytes, str, str | None]]:
    """Flatten Page dataclasses to tuples (status, content, charset,
    redirect_to) — ~10× cheaper to (de)serialize when broadcast."""
    return {
        u: (p.status, p.content, p.charset, p.redirect_to)
        for u, p in graph.pages.items()
    }


# ---------------------------------------------------------------------------
# Transport protocol: the seam between the walk engine and the network.
#
# ``fetch_parse`` duck-types its first argument through ONE method,
# ``get(url) -> (status, content, declared_charset, redirect_to) | None``
# (a plain dict satisfies it — the synthetic graph path).  A real cluster
# swaps in ``HttpTransport`` via ``CrawlEngine(..., transport=...)`` —
# everything above the transport (politeness, robots, Bloom URL-seen,
# visit ordering, charset pipeline) is transport-agnostic and already
# pinned by the oracle-fidelity tests.
# ---------------------------------------------------------------------------


class DictTransport:
    """Synthetic transport over a ``plain_pages``-shaped dict (the sandbox
    default, made explicit)."""

    def __init__(self, pages: dict):
        self.pages = pages

    def get(self, url: str):
        return self.pages.get(url)


class ArrowKeyedStore:
    """Base for zero-copy broadcast stores: ONE Arrow table keyed by a
    ``url`` column.  A broadcast Python dict is re-deserialized O(size)
    in EVERY actor that attaches it; an Arrow table rides ``ray.put`` as
    out-of-band plasma buffers, so actors attach zero-copy and only pay
    a lazily built url→row index (which never travels — it rebuilds per
    process).  Subclasses define what a row lookup returns."""

    key_col = "url"

    def __init__(self, table):
        self._tbl = table.combine_chunks()
        self._idx: dict | None = None

    def __getstate__(self):
        return {"_tbl": self._tbl}  # the index rebuilds lazily per process

    def __setstate__(self, state):
        self._tbl = state["_tbl"]
        self._idx = None

    def _row(self, key: str) -> int | None:
        if self._idx is None:
            self._idx = {
                u: i for i, u in enumerate(self._tbl[self.key_col].to_pylist())
            }
        return self._idx.get(key)


class ArrowPagesTransport(ArrowKeyedStore):
    """Zero-copy synthetic transport: the page corpus as ONE Arrow table.

    A broadcast ``plain_pages`` dict cost 3.2 s of first-round latency on
    the 232k-page 10x bench graph (the whole leg's nonlinearity); the
    Arrow table attaches per actor in ~0.2 s, and page bytes are copied
    out only for pages actually fetched.  This is also the 100-TB shape:
    a replay corpus lives in Arrow/Parquet, not in a Python dict."""

    @classmethod
    def from_graph(cls, graph) -> "ArrowPagesTransport":
        import pyarrow as pa

        pages = graph.pages.values()
        t = pa.table(
            {
                "url": pa.array([p.url for p in pages], pa.string()),
                "status": pa.array([p.status for p in pages], pa.int32()),
                "content": pa.array([p.content for p in pages], pa.large_binary()),
                "charset": pa.array([p.charset for p in pages], pa.string()),
                "redirect_to": pa.array(
                    [p.redirect_to for p in pages], pa.string()
                ),
            }
        )
        return cls(t)

    def get(self, url: str):
        i = self._row(url)
        if i is None:
            return None
        t = self._tbl
        return (
            t["status"][i].as_py(),
            t["content"][i].as_py(),
            t["charset"][i].as_py(),
            t["redirect_to"][i].as_py(),
        )


class HttpTransport:
    """Real-HTTP transport (stdlib urllib; no extra deps on a cluster).

    Semantics match the synthetic tuples the engine already understands
    (ref client behavior: trwalkers.pas:609-697):

    - 2xx → ``(status, body[:max_bytes], declared charset from
      Content-Type, None)``;
    - any 3xx with a Location → ``(301, b"", "", absolute_location)`` so
      the WALKER follows the redirect (and counts it) exactly as it does
      on the synthetic graph — the client itself never auto-follows;
    - other HTTP errors → ``(code, b"", "", None)``; connection/timeout
      failures → ``None`` (a failed fetch).

    The opener is built lazily PER PROCESS so the transport pickles into
    ``ray.put`` cleanly; ``opener_factory`` injects a fake opener for
    no-network tests.  Exercised over REAL sockets against a localhost
    http.server in tests/test_transport.py (3xx, charsets, truncation,
    live robots fetch + refresh, politeness gaps); no external egress
    exists in this sandbox — FIXTURES.md §2 documents the seam.
    """

    # the engine fetches /robots.txt for unknown hosts over any transport
    # advertising this (ref: trpoliteness.pas:164-285 — live robots HTTP
    # fetch on the politeness refresh clock); the synthetic DictTransport
    # keeps robots in the broadcast map instead.
    fetches_robots = True

    def __init__(
        self,
        timeout_s: float = 10.0,
        max_bytes: int = 4 * 1024 * 1024,
        user_agent: str = "texrex-ray/0.3 (+crawler)",
        opener_factory=None,
    ):
        self.timeout_s = timeout_s
        self.max_bytes = max_bytes
        self.user_agent = user_agent
        self.opener_factory = opener_factory
        self._opener_obj = None

    def _opener(self):
        if self._opener_obj is None:
            if self.opener_factory is not None:
                self._opener_obj = self.opener_factory()
            else:
                import urllib.request

                class NoRedirect(urllib.request.HTTPRedirectHandler):
                    def redirect_request(self, *a, **k):  # surface 3xx as errors
                        return None

                self._opener_obj = urllib.request.build_opener(NoRedirect())
        return self._opener_obj

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_opener_obj"] = None  # openers hold sockets; rebuild per process
        return d

    def get(self, url: str):
        import urllib.error
        import urllib.parse
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
        try:
            with self._opener().open(req, timeout=self.timeout_s) as resp:
                ctype = resp.headers.get("Content-Type", "") or ""
                charset = ""
                for part in ctype.split(";")[1:]:
                    k, _, v = part.strip().partition("=")
                    if k.lower() == "charset":
                        charset = v.strip().strip('"')
                return (
                    int(getattr(resp, "status", 200) or 200),
                    resp.read(self.max_bytes),
                    charset,
                    None,
                )
        except urllib.error.HTTPError as e:
            loc = e.headers.get("Location") if e.headers else None
            if e.code in (301, 302, 303, 307, 308) and loc:
                return (301, b"", "", urllib.parse.urljoin(url, loc))
            return (int(e.code), b"", "", None)
        except (urllib.error.URLError, TimeoutError, OSError, ValueError):
            return None


def fetch_parse(pages, url: str, cfg: CrawlConfig) -> FetchResult:
    """One fetch (following ≤3 redirects) + strip + link scoping.

    ``pages`` is anything with ``get(url) -> (status, content, charset,
    redirect_to) | None`` — a ``plain_pages`` dict, ``DictTransport``, or
    ``HttpTransport`` on a real cluster.
    """
    requested = url
    redirect_from = ""
    page = None
    for _hop in range(4):
        page = pages.get(url)
        if page is None:
            return FetchResult(url=requested, ok=False, status=0, final_url=url, charset="")
        status, content, charset_decl, redirect_to = page
        if status == 301 and redirect_to:
            redirect_from = url
            url = redirect_to
            continue
        break
    if page is None or page[0] != 200:
        return FetchResult(
            url=requested, ok=False, status=page[0] if page else 0,
            final_url=url, charset="", redirect_from=redirect_from,
        )
    _status, content, charset_decl, _r = page
    text, charset = decode_content(content, charset_decl)
    sr = strip_html(text)
    if sr.meta_charset and sr.meta_charset != charset:
        text, charset = decode_content(content, sr.meta_charset)
        sr = strip_html(text)
    links = scope_links(
        url,
        sr.links,
        use_same_host=cfg.use_same_host_links,
        use_same_virtual_host=cfg.use_same_virtual_host_links,
        use_external=cfg.use_external_links,
        host_scope_re=_compiled(cfg.host_scope_regex),
        block_file_re=_compiled(cfg.block_file_regex) or DEFAULT_BLOCK_FILE_RE,
    )
    images: list[tuple[str, str]] = []
    if cfg.collect_images:
        from texrex_ray.functions.striphtml import extract_images
        from texrex_ray.functions.urlkit import resolve_link

        for src, caption in extract_images(text):
            absu = resolve_link(url, src)
            if absu:
                images.append((absu, caption))
    return FetchResult(
        url=requested,
        ok=True,
        status=200,
        final_url=url,
        charset=charset,
        title=sr.title,
        divs=sr.divs,
        links=links,
        raw_len=len(content),
        redirect_from=redirect_from,
        images=images,
    )
