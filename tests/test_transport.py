"""The network seam (round-2 VERDICT item #9): fetch_parse and the crawl
engine duck-type their page source through Transport.get(url), so a real
cluster swaps HttpTransport in without touching politeness/robots/
ordering.  No-network dry runs: HttpTransport is exercised through an
injected fake opener (the sandbox has no egress)."""

import io
import urllib.error

import pytest

from texrex_ray.crawl.engine import CrawlEngine
from texrex_ray.crawl.fetcher import (
    ArrowPagesTransport,
    DictTransport,
    HttpTransport,
    fetch_parse,
    plain_pages,
)
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
    arrow = ArrowPagesTransport.from_graph(graph)
    checked = 0
    for url in list(pages)[:40]:
        a = fetch_parse(pages, url, cfg)
        b = fetch_parse(DictTransport(pages), url, cfg)
        c = fetch_parse(http, url, cfg)
        d = fetch_parse(arrow, url, cfg)
        assert a == b == c == d
        checked += 1
    assert checked == 40


def test_arrow_transports_pickle_roundtrip_parity(graph):
    """ArrowPagesTransport (zero-copy pages) and ArrowBytesStore (zero-copy
    image CDN) must return byte-identical tuples to the dicts they replace,
    across a pickle round-trip (the ray.put path) with the lazy index
    dropped and rebuilt."""
    import pickle

    pages = plain_pages(graph)
    t = pickle.loads(pickle.dumps(ArrowPagesTransport.from_graph(graph)))
    assert t._idx is None  # the index never travels
    for u, want in pages.items():
        assert t.get(u) == want
    assert t.get("http://missing.example/x") is None

    from texrex_ray.pipelines.harvest import ArrowBytesStore

    g = make_webgraph(n_hosts=4, pages_per_host_base=6, n_seeds=2, seed=7,
                      with_images=True)
    store = pickle.loads(pickle.dumps(ArrowBytesStore.from_dict(g.images)))
    assert store._idx is None
    for u, want in g.images.items():
        assert store.get(u) == want
    assert store.get("http://missing.example/i.png") is None


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


# ---------------------------------------------------------------------------
# Live sockets (VERDICT r3 #5): a localhost http.server drives the REAL
# urllib opener through 200/charset, 3xx, 404, truncation, robots refresh
# and per-host politeness gaps — the sandbox-feasible stand-in for the
# reference's live client (trwalkers.pas:609-697, trpoliteness.pas:164-285).
# ---------------------------------------------------------------------------

import collections
import http.server
import threading

from texrex_ray.sources.webgraph import WebGraph

_SITE = {
    "/": (
        200,
        b"<html><head><title>Home</title></head><body>"
        b"<a href='/a'>a</a> <a href='/redir'>r</a> "
        b"<a href='/private/x'>p</a> <a href='/latin'>l</a></body></html>",
        "utf-8",
    ),
    "/a": (
        200,
        b"<html><body><div>alpha beta gamma</div><a href='/b'>b</a>"
        b"<a href='/'>home</a></body></html>",
        "utf-8",
    ),
    "/b": (
        200,
        b"<html><body><div>bee content</div><a href='/'>home</a>"
        b"<a href='/a'>a</a></body></html>",
        "utf-8",
    ),
    "/latin": (
        200,
        "<html><body><div>caf\xe9 au lait</div><a href='/'>home</a>"
        "</body></html>".encode("cp1252"),
        "iso-8859-1",
    ),
    "/meta": (
        200,
        "<html><head><meta charset='windows-1252'></head>"
        "<body><div>na\xefve r\xe9sum\xe9</div></body></html>".encode("cp1252"),
        "",
    ),
    "/private/x": (200, b"<html><body><div>secret</div></body></html>", "utf-8"),
}
_REDIRECTS = {"/redir": "/a"}


@pytest.fixture()
def live_site():
    hits: collections.Counter = collections.Counter()
    state = {"robots": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"}

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _send(self, status, body=b"", ctype=None, extra=()):
            self.send_response(status)
            if ctype:
                self.send_header("Content-Type", ctype)
            for k, v in extra:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            hits[self.path] += 1
            if self.path == "/robots.txt":
                self._send(200, state["robots"].encode(), "text/plain")
            elif self.path in _REDIRECTS:
                self._send(302, extra=[("Location", _REDIRECTS[self.path])])
            elif self.path in _SITE:
                status, body, cs = _SITE[self.path]
                ct = "text/html" + (f"; charset={cs}" if cs else "")
                self._send(status, body, ct)
            else:
                self._send(404)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", hits, state
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_transport_live_sockets(live_site):
    base, hits, _ = live_site
    t = HttpTransport(timeout_s=5.0)
    status, body, charset, redir = t.get(f"{base}/latin")
    assert (status, redir) == (200, None)
    assert body == _SITE["/latin"][1]
    assert charset == "iso-8859-1"
    # 3xx surfaces as (301, location) with the relative Location absolutized
    assert t.get(f"{base}/redir") == (301, b"", "", f"{base}/a")
    # other HTTP errors keep their code
    assert t.get(f"{base}/gone") == (404, b"", "", None)
    # connection refused -> None (failed fetch): a port nothing listens on
    assert t.get("http://127.0.0.1:9/never") is None
    # size clamp truncates the body, not the fetch
    small = HttpTransport(timeout_s=5.0, max_bytes=16)
    assert small.get(f"{base}/a")[1] == _SITE["/a"][1][:16]
    assert hits["/latin"] == 1


def test_fetch_parse_live_redirect_and_charsets(live_site):
    base, _, _ = live_site
    cfg = CrawlConfig()
    t = HttpTransport(timeout_s=5.0)
    r = fetch_parse(t, f"{base}/redir", cfg)
    assert r.ok and r.status == 200
    assert r.final_url == f"{base}/a"
    assert r.redirect_from == f"{base}/redir"
    assert f"{base}/b" in r.links
    # declared header charset decodes cp1252 content
    lat = fetch_parse(t, f"{base}/latin", cfg)
    assert lat.charset == "windows-1252"
    assert any("café au lait" in d for d in lat.divs)
    # meta-charset override path (no header charset)
    meta = fetch_parse(t, f"{base}/meta", cfg)
    assert meta.charset == "windows-1252"
    assert any("naïve résumé" in d for d in meta.divs)


def test_engine_live_http_robots_refresh_and_gaps(ray_session, live_site):
    """CrawlEngine over real sockets: robots fetched + refreshed over the
    transport (no broadcast robots map), the Disallow honored, and ok
    fetches per host spaced >= Crawl-delay rounds (the q83 invariant)."""
    base, hits, _ = live_site
    graph = WebGraph(
        pages={}, robots={}, seeds=[f"{base}/", f"{base}/a"], hosts=["127.0.0.1"]
    )
    cfg = CrawlConfig(robots_refresh_interval=6, random_jump_probability=0.2)
    eng = CrawlEngine(
        graph, n_walkers=2, n_partitions=2, seed=7, config=cfg,
        transport=HttpTransport(timeout_s=5.0),
    )
    eng.run(max_steps=25)
    try:
        order = eng.visit_order()
        assert len(order) >= 10
        # the disallowed path is linked from / but never fetched
        assert not any("/private/" in u for _, u, _, _ in order)
        assert hits["/private/x"] == 0
        # robots.txt was fetched live and REFRESHED on the interval clock
        assert hits["/robots.txt"] >= 2
        # per-host REAL-fetch gaps respect Crawl-delay: 2 (> min_politeness);
        # cache hits (cached=True) legitimately bypass politeness — no
        # network access happens (row: round, walker, url, host, action,
        # cached; all URLs share host 127.0.0.1 here)
        rounds = sorted(row[0] for row in eng.visit_rows if not row[5])
        assert len(rounds) >= 5
        assert all(b - a >= 2 for a, b in zip(rounds, rounds[1:]))
        m = eng.metrics_table().to_pydict()
        assert sum(m.get("robots_fetches", [0])) >= 2
    finally:
        eng.shutdown()
