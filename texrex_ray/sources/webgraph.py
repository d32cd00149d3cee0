"""Deterministic synthetic web graph — the hermetic crawl universe.

Replaces live HTTP for the ClaraX-equivalent crawler (FIXTURES.md §2):
~``n_hosts`` hosts with Zipf-skewed page counts (the top host holds a
large share of pages → exercises hot-host handling), synthetic HTML with
break-tag paragraphs, drop-containers, entities and anchors whose targets
follow a seeded preferential-attachment draw (skewed host in-degree →
degree-biased sampling observable), per-host robots.txt bodies with mixed
sections, and a fixed ordered seed list.

Everything derives from one integer seed; no wall clock, no network.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Page:
    url: str
    host: str
    status: int
    content: bytes
    charset: str
    redirect_to: str | None
    out_links: list[str]


@dataclass
class WebGraph:
    pages: dict[str, Page]
    robots: dict[str, str | None]
    seeds: list[str]
    hosts: list[str]
    seed: int = 42
    # img_url → encoded synthetic-container bytes (with_images graphs only);
    # the stand-in for the image CDN the ImageFetcher actor pool would hit
    images: dict[str, bytes] = field(default_factory=dict)

    @property
    def n_pages(self) -> int:
        return len(self.pages)


_PARA_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam"
).split()


def _local_rng(seed: int, tag: str) -> np.random.Generator:
    """Seeded generator keyed off (seed, tag) — image content/placement use
    these LOCAL streams so ``with_images=True`` leaves every draw of the
    shared graph RNG untouched (crawl visit-order fixtures stay valid)."""
    h = hashlib.blake2b(f"{seed}|{tag}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def _attr_escape(s: str) -> str:
    """Minimal attribute escaping (real-web style: '&' is usually left raw,
    which is exactly the entity dirt the caption cleanser must handle)."""
    return s.replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")


def _image_elements(images: list[tuple[str, str, str]]) -> list[str]:
    parts = []
    for src, caption, style in images:
        if style == "figure":
            parts.append(
                f'<figure><img src="{src}"><figcaption>{caption}</figcaption></figure>'
            )
        else:
            parts.append(f'<img src="{src}" alt="{_attr_escape(caption)}">')
    return parts


def _page_html(
    url: str,
    paras: list[str],
    hrefs: list[str],
    charset: str,
    images: list[tuple[str, str, str]] | None = None,
) -> bytes:
    body_parts = ["<html><head>"]
    if charset != "utf-8":
        body_parts.append(f'<meta http-equiv="Content-Type" content="text/html; charset={charset}">')
    body_parts.append(f"<title>Page {url}</title></head><body>")
    body_parts.append("<script>var junk = 'dropped subtree';</script>")
    img_parts = _image_elements(images) if images else []
    for i, p in enumerate(paras):
        href = f' <a href="{hrefs[i]}">link {i}</a>' if i < len(hrefs) else ""
        img = img_parts[i] if i < len(img_parts) else ""
        body_parts.append(f"<p>{p}{href}</p>{img}")
    for href in hrefs[len(paras):]:
        body_parts.append(f'<div><a href="{href}">more</a></div>')
    body_parts.extend(img_parts[len(paras):])
    body_parts.append("</body></html>")
    html = "".join(body_parts)
    enc = "latin-1" if charset == "iso-8859-1" else "utf-8"
    return html.encode(enc, errors="replace")


IMG_FMTS = ("png", "jpeg", "webp")
IMG_SIZES = (16, 32, 48)


def _host_image_pool(
    host: str, n_pages: int, seed: int
) -> tuple[list[tuple[str, str]], dict[str, bytes]]:
    """Deterministic per-host image CDN: [(img_url, fmt)], url → bytes.

    Content is keyed off (seed, host, k) only — independent of the shared
    graph RNG and of which pages end up referencing each image."""
    from texrex_ray.sources.images import _make_pixels, encode_image

    rng = _local_rng(seed, f"imgpool|{host}")
    n_img = max(2, n_pages // 2)
    urls: list[tuple[str, str]] = []
    store: dict[str, bytes] = {}
    for k in range(n_img):
        fmt = IMG_FMTS[int(rng.integers(0, 3))]
        w = IMG_SIZES[int(rng.integers(0, 3))]
        h = IMG_SIZES[int(rng.integers(0, 3))]
        enc = encode_image(_make_pixels(rng, w, h), fmt)
        u = f"http://{host}/img{k}.{fmt}"
        urls.append((u, fmt))
        store[u] = enc
    return urls, store


def _page_images(
    url: str,
    host_idx: int,
    pools: list[list[tuple[str, str]]],
    hosts: list[str],
    seed: int,
) -> list[tuple[str, str, str]]:
    """Deterministic (src, caption, style) refs for one page — 0–3 images,
    ~15% cross-host (duplicate references across hosts exercise the
    first-wins harvest dedup), same-host srcs sometimes relative."""
    from texrex_ray.sources.images import _make_caption

    rng = _local_rng(seed, f"pimg|{url}")
    n = int(rng.integers(0, 4))
    out: list[tuple[str, str, str]] = []
    for _ in range(n):
        th = int(rng.integers(0, len(hosts))) if rng.random() < 0.15 else host_idx
        pool = pools[th]
        src, _fmt = pool[int(rng.integers(0, len(pool)))]
        if th == host_idx and rng.random() < 0.5:
            src = "/" + src.rsplit("/", 1)[1]  # relative → resolve_link path
        style = "figure" if rng.random() < 0.4 else "alt"
        out.append((src, _make_caption(rng), style))
    return out


def make_webgraph(
    n_hosts: int = 20,
    pages_per_host_base: int = 20,
    n_seeds: int = 8,
    seed: int = 42,
    mean_links: int = 6,
    p_external: float = 0.3,
    max_pages_per_host: int | None = None,
    with_images: bool = False,
) -> WebGraph:
    """Deterministic web graph; Zipf page counts, preferential-attachment links.

    ``max_pages_per_host`` caps the Zipf head (hot hosts) — use it for
    throughput benches where host diversity, not one mega-host, should
    bound politeness parallelism.

    ``with_images=True`` embeds ``<img>`` / ``<figure><figcaption>``
    elements (the graft's image+caption payload) drawn from per-host image
    pools.  Placement and pixels use LOCAL hash-seeded RNG streams, so the
    link graph, page text and every shared-RNG draw are byte-identical to
    the ``with_images=False`` graph — crawl visit-order fixtures remain
    valid for both."""
    rng = np.random.default_rng(seed)
    hosts = [f"host{h}.tld{h % 3}" for h in range(n_hosts)]
    # Zipf-ish page counts: host h gets base * n_hosts / (h+1), min 3
    page_counts = np.maximum(
        (pages_per_host_base * n_hosts / (np.arange(n_hosts) + 1)).astype(int), 3
    )
    if max_pages_per_host is not None:
        page_counts = np.minimum(page_counts, max_pages_per_host)
    urls_by_host: list[list[str]] = [
        [f"http://{hosts[h]}/p{k}" for k in range(page_counts[h])] for h in range(n_hosts)
    ]
    all_urls = [u for us in urls_by_host for u in us]
    # host attachment weights ∝ page count (preferential attachment proxy)
    host_w = page_counts / page_counts.sum()

    img_pools: list[list[tuple[str, str]]] = []
    image_store: dict[str, bytes] = {}
    if with_images:
        for h, host in enumerate(hosts):
            pool, store = _host_image_pool(host, len(urls_by_host[h]), seed)
            img_pools.append(pool)
            image_store.update(store)

    pages: dict[str, Page] = {}
    for h, host in enumerate(hosts):
        n_h = len(urls_by_host[h])
        # one ISO-8859-1-declared page per host
        latin_idx = int(rng.integers(0, n_h))
        for k, url in enumerate(urls_by_host[h]):
            r = rng.random()
            status, redirect_to = 200, None
            if r > 0.93:
                if r > 0.98:
                    status = 301
                    redirect_to = all_urls[int(rng.integers(0, len(all_urls)))]
                elif r > 0.955:
                    status = 500
                else:
                    status = 404
            n_links = int(rng.poisson(mean_links))
            hrefs: list[str] = []
            for _ in range(n_links):
                if rng.random() < p_external:
                    th = int(rng.choice(n_hosts, p=host_w))
                else:
                    th = h
                t_urls = urls_by_host[th]
                target = t_urls[int(rng.integers(0, len(t_urls)))]
                # same-host links sometimes relative
                if th == h and rng.random() < 0.5:
                    hrefs.append("/" + target.rsplit("/", 1)[1])
                else:
                    hrefs.append(target)
            n_paras = 2 + int(rng.integers(0, 4))
            paras = [
                " ".join(
                    rng.choice(_PARA_WORDS, size=12 + int(rng.integers(0, 20)))
                )
                + (" &amp; more" if rng.random() < 0.3 else "")
                for _ in range(n_paras)
            ]
            charset = "iso-8859-1" if k == latin_idx else "utf-8"
            imgs = (
                _page_images(url, h, img_pools, hosts, seed)
                if with_images and status == 200
                else None
            )
            content = (
                b"" if status != 200 else _page_html(url, paras, hrefs, charset, imgs)
            )
            pages[url] = Page(
                url=url,
                host=host,
                status=status,
                content=content,
                charset=charset,
                redirect_to=redirect_to,
                out_links=hrefs if status == 200 else [],
            )

    robots: dict[str, str | None] = {}
    for h, host in enumerate(hosts):
        r = rng.random()
        if r < 0.3:
            robots[host] = None
        elif r < 0.6:
            robots[host] = "User-agent: *\nDisallow: /p1\n"
        elif r < 0.8:
            robots[host] = (
                "User-agent: othercrawler\nDisallow: /\n\n"
                f"User-agent: *\nCrawl-delay: {1 + int(rng.integers(0, 3))}\n"
            )
        else:
            robots[host] = (
                "User-agent: texrex\nDisallow: /p2\nCrawl-delay: 1\n\n"
                "User-agent: *\nDisallow: /\n"
            )

    # fixed ordered seed list: first page of the n_seeds highest-degree hosts
    seeds = [urls_by_host[h][0] for h in range(min(n_seeds, n_hosts))]
    return WebGraph(
        pages=pages, robots=robots, seeds=seeds, hosts=hosts, seed=seed,
        images=image_store,
    )


def link_edges(g: WebGraph) -> list[tuple[str, str]]:
    """(src, dst) edge list of the graph as the CRAWLER sees it: per-page
    out-links resolved/scoped with the same ``scope_links`` the walk uses
    (relative hrefs absolutized, per-page dedup, file links dropped).
    Deterministic given the graph — the PageRank fixture and q70 both
    derive their edges here."""
    from texrex_ray.functions.urlkit import scope_links

    edges: list[tuple[str, str]] = []
    for url in sorted(g.pages):
        p = g.pages[url]
        if p.status != 200:
            continue
        for t in scope_links(url, p.out_links):
            edges.append((url, t))
    return edges
