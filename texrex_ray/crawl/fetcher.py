"""Synthetic fetcher: serve pages from the deterministic web graph.

Stands in for the reference's HTTP client (ref: trwalkers.pas:609-697:
records status, final URL after redirects with a ``redirect-from`` meta,
content-type charset; client restarted every 20 requests — irrelevant
here).  The fetch also runs the HTML stripper and link scoping so a fetch
result carries everything the walker (links) and the corpus (divs, title)
need — mirroring ClaraX processing its page inline (ref :700-771).

Charset handling mirrors the CharsetConverter (ref:
trcharsetconverter.pas:93-147): declared meta charset wins; undeclared
content is sniffed by strict-UTF-8 validity with a Windows-1252 fallback
(the reference's ISO-8859-1→Windows-1252 override, ref :121-129).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.functions.striphtml import strip_html
from texrex_ray.functions.urlkit import scope_links


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


def decode_content(content: bytes, declared: str) -> tuple[str, str]:
    """(text, charset) per the charset-converter rules."""
    cs = (declared or "").lower()
    if cs in ("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252"):
        return content.decode("cp1252", errors="replace"), "windows-1252"
    if cs in ("utf-8", "utf8"):
        return content.decode("utf-8", errors="replace"), "utf-8"
    try:
        return content.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return content.decode("cp1252", errors="replace"), "windows-1252"


def plain_pages(graph) -> dict[str, tuple[int, bytes, str, str | None]]:
    """Flatten Page dataclasses to tuples (status, content, charset,
    redirect_to) — ~10× cheaper to (de)serialize when broadcast."""
    return {
        u: (p.status, p.content, p.charset, p.redirect_to)
        for u, p in graph.pages.items()
    }


def fetch_parse(pages: dict, url: str, cfg: CrawlConfig) -> FetchResult:
    """One fetch through the synthetic web, following ≤3 redirects.

    ``pages`` maps url → (status, content, charset, redirect_to) tuples
    (see ``plain_pages``).
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
        text2, charset = decode_content(content, sr.meta_charset)
        sr = strip_html(text2)
    links = scope_links(
        url,
        sr.links,
        use_same_host=cfg.use_same_host_links,
        use_same_virtual_host=cfg.use_same_virtual_host_links,
        use_external=cfg.use_external_links,
    )
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
    )
