"""Sequential ClaraX walk oracle — the reference behavior, replayed in pure
Python with no Ray, no rounds, no actors.

This is an INDEPENDENT implementation of the walk loop (ref:
trwalkers.pas:858-997) against which the distributed engine's
single-walker projection is tested (SURVEY.md §5.2): same policy RNG
sequence (via the shared ``Walker`` policy object), but its own inline
politeness clock, robots handling and output gating.  If the engine's
actor partitioning, batching or gating changed semantics, the orders
would diverge.

Outputs the two golden fixtures of FIXTURES.md §2:
``visit_order`` rows (seq, url, host, action) and the ``url_seen`` set.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from texrex_ray.crawl.fetcher import fetch_parse, plain_pages
from texrex_ray.crawl.policy import CrawlConfig, Walker
from texrex_ray.functions.urlkit import host_of
from texrex_ray.sources.webgraph import WebGraph
from texrex_ray.state.urlseen import make_url_seen
from texrex_ray.state.politeness import parse_robots


@dataclass
class OracleResult:
    visit_order: list[tuple[int, str, str, str]]  # (seq, url, host, action)
    url_seen: set[str]
    outputs: list[str] = field(default_factory=list)  # urls that produced corpus docs
    steps: int = 0
    now: int = 0


def clarax_walk(
    graph: WebGraph,
    max_steps: int,
    seed: int = 42,
    config: CrawlConfig | None = None,
) -> OracleResult:
    cfg = config or CrawlConfig()
    pages = plain_pages(graph)
    walker = Walker(0, graph.seeds, seed, cfg)
    bloom = make_url_seen(cfg)
    robots_rules: dict[str, object] = {}
    last_access: dict[str, int] = {}
    visit_order: list[tuple[int, str, str, str]] = []
    outputs: list[str] = []
    now = 0
    steps = 0
    while steps < max_steps:
        prop = walker.propose()
        if prop is None:
            break
        url, action = prop
        host = host_of(url)
        cached = walker.cached_links(url)
        if cached is not None:
            # cache hit: step without fetch/process (ref: trwalkers.pas:882-894)
            walker.deliver(True, cached)
            steps += 1
            visit_order.append((steps, url, host, action))
            continue
        # robots (fetched out-of-band, no politeness cost)
        rules = robots_rules.get(host)
        if rules is None:
            body = graph.robots.get(host)
            rules = parse_robots(body, cfg.agent) if body else parse_robots("", cfg.agent)
            robots_rules[host] = rules
        from urllib.parse import urlsplit

        if not rules.allows(urlsplit(url).path or "/"):
            walker.deliver(False, None)  # skipped, no step
            continue
        la = last_access.get(host)
        if la is not None:
            wait = max(max(rules.crawl_delay, cfg.min_politeness) - (now - la), 0)
            now += wait  # the reference walker sleeps (ref: trpoliteness.pas:320-373)
        fr = fetch_parse(pages, url, cfg)
        last_access[host] = now
        now += 1
        if not fr.ok:
            walker.deliver(False, None)
            continue
        walker.deliver(True, fr.links)
        steps += 1
        visit_order.append((steps, url, host, action))
        if bloom.add_if_new([url])[0]:
            outputs.append(url)
    return OracleResult(
        visit_order=visit_order,
        url_seen=set(outputs),
        outputs=outputs,
        steps=steps,
        now=now,
    )
