"""Priority-frontier crawler — the north-star's degree-biased scheduler.

A second scheduling mode beside the ClaraX-faithful random walk
(``crawl/engine.py``): each frontier partition (hash(host) % P) holds a
priority queue of discovered URLs, keyed by

    (-host_in_degree_at_discovery, discovered_round, url)

so hosts observed more often as link targets are crawled first
(degree-biased host sampling), with FIFO/URL tie-breaks for determinism.
Because every link to a host routes to the host's partition, the degree
counters are exact without any cross-partition traffic.

A round:
1. every partition ``peek``s its politeness-eligible top candidates
   (≤ one per host, robots-gated);
2. the driver merges candidates GLOBALLY and selects the top ``budget`` —
   this makes the schedule independent of the partition count (tested);
3. selected URLs are fetched inside their partitions (pages resident,
   Bloom first-wins output, corpus buffering) and extracted links are
   routed back by host-partition and enqueued.

URL-seen here gates *enqueueing* (a priority crawler visits each URL at
most once), unlike the walker where the Bloom gates output only.
"""

from __future__ import annotations

import heapq
import time
from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa
import ray

from texrex_ray.crawl.fetcher import ArrowPagesTransport, fetch_parse
from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.functions.urlkit import host_of
from texrex_ray.sources.webgraph import WebGraph
from texrex_ray.state.urlseen import make_url_seen
from texrex_ray.state.politeness import PolitenessManager

from texrex_ray.crawl.engine import partition_of


@dataclass
class PriorityStats:
    rounds: int = 0
    fetched: int = 0
    failed: int = 0
    enqueued: int = 0
    elapsed_sec: float = 0.0
    urls_per_sec: float = 0.0
    partition_metrics: dict = field(default_factory=dict)


@ray.remote
class PriorityFrontierActor:
    def __init__(
        self,
        part_id: int,
        robots_map: dict,
        pages: dict,
        cfg: CrawlConfig,
        host_scores: dict | None = None,
    ):
        self.part_id = part_id
        self.cfg = cfg
        self.robots_map = robots_map
        self.pages = pages
        # static external priority bias per host (e.g. PageRank from a prior
        # crawl); added to the live in-degree so rank dominates when large
        self.host_bias = host_scores or {}
        self.pm = PolitenessManager(
            min_politeness=cfg.min_politeness,
            robots_refresh_interval=cfg.robots_refresh_interval,
            agent=cfg.agent,
        )
        self.seen = make_url_seen(cfg)
        self.heap: list[tuple[int, int, str]] = []  # (-degree, round, url)
        self.host_degree: Counter = Counter()
        self.metrics: Counter = Counter()
        self.corpus_buf: list[dict] = []

    def enqueue(self, links: list[tuple[str, int]]) -> int:
        """(url, discovered_round) → frontier; returns #accepted.

        Degree counts every observation; the URL enters the heap only on
        first sight (Bloom-gated — the 'seen' set covers enqueued+fetched).
        """
        added = 0
        urls = [u for u, _ in links]
        for h in (host_of(u) for u in urls):
            self.host_degree[h] += 1
        fresh = self.seen.add_if_new(urls)
        for (url, rnd), new in zip(links, fresh):
            if new:
                h = host_of(url)
                heapq.heappush(
                    self.heap,
                    (-(self.host_bias.get(h, 0) + self.host_degree[h]), rnd, url),
                )
                added += 1
        self.metrics["enqueued"] += added
        return added

    def peek(self, n: int, now: int) -> list[tuple[int, int, str]]:
        """Up to n politeness-eligible candidates (≤1 per host), WITHOUT
        removing them; robots-disallowed URLs are dropped permanently."""
        out: list[tuple[int, int, str]] = []
        skipped: list[tuple[int, int, str]] = []
        hosts_used: set[str] = set()
        while self.heap and len(out) < n:
            item = heapq.heappop(self.heap)
            _negd, _rnd, url = item
            host = host_of(url)
            if self.pm.needs_robots(host, now):
                self.pm.set_robots(host, self.robots_map.get(host), now)
                self.metrics["robots_fetches"] += 1
            w = self.pm.seconds_until_retrieval(url, now)
            if w < 0:
                self.metrics["disallowed"] += 1
                continue
            if w > 0 or host in hosts_used:
                skipped.append(item)
                continue
            hosts_used.add(host)
            out.append(item)
        for item in out + skipped:
            heapq.heappush(self.heap, item)
        return out

    def fetch_selected(self, items: list[tuple[int, int, str]], now: int) -> list[dict]:
        """Remove+fetch the driver-selected items; returns results with links."""
        chosen = set(items)
        self.heap = [it for it in self.heap if tuple(it) not in chosen]
        heapq.heapify(self.heap)
        results = []
        for _negd, rnd, url in sorted(items, key=lambda it: (it[0], it[1], it[2])):
            host = host_of(url)
            self.pm.retrieved(url, now)
            fr = fetch_parse(self.pages, url, self.cfg)
            if fr.ok:
                self.metrics["fetched"] += 1
                self.corpus_buf.append(
                    {
                        "url": url, "final_url": fr.final_url, "host": host,
                        "status": fr.status, "charset": fr.charset,
                        "title": fr.title, "text": "\n".join(fr.divs),
                        "n_divs": len(fr.divs), "links": fr.links,
                        "round": now, "walker_id": -1, "action": "priority",
                        "raw_len": fr.raw_len,
                    }
                )
            else:
                self.metrics["failed"] += 1
            results.append(
                {"url": url, "ok": fr.ok, "links": fr.links if fr.ok else []}
            )
        return results

    def frontier_size(self) -> int:
        return len(self.heap)

    def drain_corpus(self) -> list[dict]:
        rows, self.corpus_buf = self.corpus_buf, []
        return rows

    def get_metrics(self) -> dict:
        return dict(self.metrics)


class PriorityCrawlEngine:
    """Round-based degree-biased BFS-style crawler over the priority frontier."""

    def __init__(
        self,
        graph: WebGraph,
        *,
        n_partitions: int = 4,
        budget_per_round: int = 64,
        config: CrawlConfig | None = None,
        host_scores: dict | None = None,
    ):
        self.graph = graph
        self.cfg = config or CrawlConfig()
        self.n_partitions = n_partitions
        self.budget = budget_per_round
        pages_ref = ray.put(ArrowPagesTransport.from_graph(graph))
        self.parts = [
            PriorityFrontierActor.remote(
                p, graph.robots, pages_ref, self.cfg, host_scores
            )
            for p in range(n_partitions)
        ]
        self.round = 0
        self.visit_log: list[tuple[int, str, str]] = []  # (round, url, host)
        self._route_enqueue([(u, 0) for u in graph.seeds])

    def _route_enqueue(self, links: list[tuple[str, int]]) -> int:
        if not links:
            return 0
        hosts = [host_of(u) for u, _ in links]
        parts = partition_of(hosts, self.n_partitions)
        by_part: dict[int, list[tuple[str, int]]] = {}
        for (u, r), p in zip(links, parts.tolist()):
            by_part.setdefault(p, []).append((u, r))
        # deterministic enqueue order within each partition
        futs = [
            self.parts[p].enqueue.remote(sorted(items))
            for p, items in by_part.items()
        ]
        return sum(ray.get(futs))

    def run(self, max_fetches: int, max_rounds: int | None = None) -> PriorityStats:
        stats = PriorityStats()
        t0 = time.perf_counter()
        while stats.fetched < max_fetches:
            if max_rounds is not None and self.round >= max_rounds:
                break
            now = self.round
            self.round += 1
            peeks = ray.get([p.peek.remote(self.budget, now) for p in self.parts])
            merged: list[tuple[int, tuple[int, int, str]]] = []
            for pid, items in enumerate(peeks):
                merged.extend((pid, tuple(it)) for it in items)
            if not merged:
                sizes = ray.get([p.frontier_size.remote() for p in self.parts])
                if sum(sizes) == 0:
                    break
                continue  # everything politeness-deferred this round
            merged.sort(key=lambda x: x[1])  # global priority order
            selected = merged[: self.budget]
            by_part: dict[int, list[tuple[int, int, str]]] = {}
            for pid, item in selected:
                by_part.setdefault(pid, []).append(item)
            res_futs = {
                p: self.parts[p].fetch_selected.remote(items, now)
                for p, items in by_part.items()
            }
            new_links: list[tuple[str, int]] = []
            for p in sorted(by_part):
                for r in ray.get(res_futs[p]):
                    if r["ok"]:
                        stats.fetched += 1
                        self.visit_log.append((now, r["url"], host_of(r["url"])))
                    else:
                        stats.failed += 1
                    new_links.extend((u, self.round) for u in r["links"])
            stats.enqueued += self._route_enqueue(sorted(set(new_links)))
        stats.rounds = self.round
        stats.elapsed_sec = time.perf_counter() - t0
        stats.urls_per_sec = stats.fetched / stats.elapsed_sec if stats.elapsed_sec else 0.0
        stats.partition_metrics = {
            p: m for p, m in enumerate(ray.get([a.get_metrics.remote() for a in self.parts]))
        }
        return stats

    def visit_order(self) -> list[tuple[int, str, str]]:
        return sorted(self.visit_log)

    def collect_corpus(self) -> list[dict]:
        out: list[dict] = []
        for rows in ray.get([p.drain_corpus.remote() for p in self.parts]):
            out.extend(rows)
        return out

    def shutdown(self) -> None:
        for a in self.parts:
            ray.kill(a)
        self.parts = []
