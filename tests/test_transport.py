"""The network seam (round-2 VERDICT item #9): fetch_parse and the crawl
engine duck-type their page source through Transport.get(url), so a real
cluster swaps HttpTransport in without touching politeness/robots/
ordering.  No-network dry runs: HttpTransport is exercised through an
injected fake opener (the sandbox has no egress)."""

import io
import urllib.error

import pytest

from texrex_ray.crawl.engine import CrawlEngine
from texrex_ray.crawl.fetcher import DictTransport, HttpTransport, fetch_parse, plain_pages
from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.sources.webgraph import make_webgraph


class _FakeResponse:
    def __init__(self, body: bytes, ctype: str, status: int = 200):
        self._body = body
        self.status = status
        self.headers = {"Content-Type": ctype}

    def read(self, n=-1):
        return self._body if n < 0 else self._body[:n]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeOpener:
    """Serves the deterministic web graph over the urllib opener API."""

    def __init__(self, pages):
        self.pages = pages

    def open(self, req, timeout=None):
        url = req.full_url
        page = self.pages.get(url)
        if page is None:
            raise urllib.error.URLError("no route")
        status, content, charset, redirect_to = page
        if status == 301 and redirect_to:
            raise urllib.error.HTTPError(
                url, 301, "Moved", {"Location": redirect_to}, io.BytesIO()
            )
        if status != 200:
            raise urllib.error.HTTPError(url, status, "err", {}, io.BytesIO())
        ctype = f"text/html; charset={charset}" if charset else "text/html"
        return _FakeResponse(content, ctype)


@pytest.fixture(scope="module")
def graph():
    return make_webgraph(n_hosts=6, pages_per_host_base=8, n_seeds=4, seed=11)


def test_http_transport_tuple_semantics(graph):
    pages = plain_pages(graph)
    t = HttpTransport(opener_factory=lambda: _FakeOpener(pages))
    # a 200 page round-trips body + declared charset
    url = next(u for u, p in pages.items() if p[0] == 200 and p[2])
    status, body, charset, redir = t.get(url)
    assert (status, body, redir) == (200, pages[url][1], None)
    assert charset == pages[url][2]
    # a redirect surfaces as (301, location), never auto-followed
    rurl = next((u for u, p in pages.items() if p[0] == 301 and p[3]), None)
    if rurl is not None:
        status, body, charset, redir = t.get(rurl)
        assert (status, body) == (301, b"")
        assert redir == pages[rurl][3]
    # unreachable -> None (failed fetch)
    assert t.get("http://nonexistent.example/") is None


def test_http_transport_relative_location_resolved():
    def opener():
        class O:
            def open(self, req, timeout=None):
                raise urllib.error.HTTPError(
                    req.full_url, 302, "Found", {"Location": "/next"}, io.BytesIO()
                )

        return O()

    t = HttpTransport(opener_factory=opener)
    assert t.get("http://h.example/a/b") == (301, b"", "", "http://h.example/next")


def test_fetch_parse_identical_over_dict_and_http(graph):
    """The whole parse pipeline (charset, strip, scoping, redirects) must
    not care which transport produced the bytes."""
    pages = plain_pages(graph)
    cfg = CrawlConfig()
    http = HttpTransport(opener_factory=lambda: _FakeOpener(pages))
    checked = 0
    for url in list(pages)[:40]:
        a = fetch_parse(pages, url, cfg)
        b = fetch_parse(DictTransport(pages), url, cfg)
        c = fetch_parse(http, url, cfg)
        assert a == b == c
        checked += 1
    assert checked == 40


def test_engine_visit_order_transport_agnostic(ray_session, graph):
    """CrawlEngine(transport=...) is the cluster seam: swapping the
    explicit DictTransport for the broadcast dict must not move a single
    visit (the north-rule ordering invariant)."""
    cfg = CrawlConfig()
    a = CrawlEngine(graph, n_walkers=2, n_partitions=4, seed=42, config=cfg)
    a.run(max_steps=80)
    order_a, seen_a = a.visit_order(), a.url_seen()
    a.shutdown()
    b = CrawlEngine(
        graph, n_walkers=2, n_partitions=4, seed=42, config=cfg,
        transport=DictTransport(plain_pages(graph)),
    )
    b.run(max_steps=80)
    assert b.visit_order() == order_a
    assert b.url_seen() == seen_a
    b.shutdown()
