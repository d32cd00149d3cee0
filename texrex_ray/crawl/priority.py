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
import json
import os
import pickle
import time
from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from texrex_ray.crawl.fetcher import ArrowPagesTransport, fetch_parse
from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.functions.urlkit import host_of
from texrex_ray.sources.webgraph import WebGraph
from texrex_ray.state.urlseen import make_url_seen, restore_url_seen
from texrex_ray.state.politeness import PolitenessManager

from texrex_ray.crawl.engine import (
    CrawlEngine,
    latest_committed_checkpoint,
    partition_of,
    prune_committed_checkpoints,
)


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

    def host_frontier_load(self) -> dict:
        """host → #frontier entries (the heap-memory skew signal)."""
        c: Counter = Counter(host_of(u) for _, _, u in self.heap)
        return dict(c)

    def export_hosts(self, hosts: list[str]) -> bytes:
        """Extract (and drop) everything this partition owns for the given
        hosts: frontier heap entries, in-degree counters, bias, politeness
        state.  URL-seen bits cannot be extracted per host — the caller
        chains a frozen snapshot instead (``attach_seen_base``)."""
        hs = set(hosts)
        mine = [it for it in self.heap if host_of(it[2]) in hs]
        self.heap = [it for it in self.heap if host_of(it[2]) not in hs]
        heapq.heapify(self.heap)
        deg = {h: self.host_degree.pop(h) for h in hosts if h in self.host_degree}
        bias = {h: self.host_bias[h] for h in hosts if h in self.host_bias}
        pol = {}
        for h in hosts:
            st = self.pm.hosts.pop(h, None)
            if st is not None:
                pol[h] = (
                    st.last_access,
                    st.robots_fetched_at,
                    st.robots.disallows if st.robots else None,
                    st.robots.crawl_delay if st.robots else 0,
                )
        return pickle.dumps({"heap": mine, "deg": deg, "bias": bias, "pol": pol})

    def import_hosts(self, blob: bytes) -> None:
        from texrex_ray.state.politeness import HostState, RobotsRules

        snap = pickle.loads(blob)
        for it in snap["heap"]:
            heapq.heappush(self.heap, tuple(it))
        self.host_degree.update(snap["deg"])
        self.host_bias.update(snap["bias"])
        for h, (la, rf, dis, cd) in snap["pol"].items():
            st = HostState(last_access=la, robots_fetched_at=rf)
            if dis is not None:
                st.robots = RobotsRules(disallows=list(dis), crawl_delay=cd)
            self.pm.hosts[h] = st

    def export_seen(self) -> bytes:
        return pickle.dumps(self.seen.snapshot())

    def attach_seen_base(self, blob: bytes) -> None:
        """Chain another partition's URL-seen segments as frozen read-only
        history (no false negatives for migrated hosts; small extra
        false-positive rate — same trade as the walk engine's
        ``attach_bloom_base``)."""
        base = restore_url_seen(pickle.loads(blob))
        base.freeze()
        self.seen.chain_base(base)

    def drain_corpus(self) -> list[dict]:
        rows, self.corpus_buf = self.corpus_buf, []
        return rows

    def get_metrics(self) -> dict:
        return dict(self.metrics)

    def flush_corpus(self, out_dir: str, upto_round: int) -> int:
        """Buffered corpus rows → per-partition round-stamped parquet
        (same resumable layout + tmp→rename discipline as the walk
        engine's FrontierPartActor.flush_corpus)."""
        if not self.corpus_buf:
            return 0
        d = os.path.join(out_dir, "corpus", f"part={self.part_id:04d}")
        os.makedirs(d, exist_ok=True)
        rows = self.corpus_buf
        ltypes = {"links": pa.list_(pa.string())}
        t = pa.table(
            {k: pa.array([r[k] for r in rows], type=ltypes.get(k)) for k in rows[0]}
        )
        path = os.path.join(d, f"corpus-r{upto_round:08d}.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        n = len(rows)
        self.corpus_buf = []
        return n

    def snapshot(self) -> bytes:
        """Full frontier-partition state: priority heap, in-degree
        counters, politeness clocks, URL-seen filter, metrics, and any
        still-buffered corpus rows (empty when the engine flushed before
        snapshotting, the checkpoint contract)."""
        return pickle.dumps(
            {
                "politeness": self.pm.snapshot(),
                "seen": self.seen.snapshot(),
                "heap": list(self.heap),
                "host_degree": dict(self.host_degree),
                "host_bias": dict(self.host_bias),
                "metrics": dict(self.metrics),
                "corpus_buf": self.corpus_buf,
            }
        )

    def restore(self, blob: bytes) -> None:
        snap = pickle.loads(blob)
        self.pm = PolitenessManager.restore(snap["politeness"])
        self.seen = restore_url_seen(snap["seen"])
        self.heap = [tuple(it) for it in snap["heap"]]
        heapq.heapify(self.heap)
        self.host_degree = Counter(snap["host_degree"])
        self.host_bias = dict(snap.get("host_bias", {}))
        self.metrics = Counter(snap["metrics"])
        self.corpus_buf = list(snap.get("corpus_buf", []))


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
        out_dir: str | None = None,
    ):
        self.graph = graph
        self.cfg = config or CrawlConfig()
        self.n_partitions = n_partitions
        self.budget = budget_per_round
        self.out_dir = out_dir
        pages_ref = ray.put(ArrowPagesTransport.from_graph(graph))
        self.parts = [
            PriorityFrontierActor.remote(
                p, graph.robots, pages_ref, self.cfg, host_scores
            )
            for p in range(n_partitions)
        ]
        self.round = 0
        self.fetched = 0  # cumulative across resume (the max_fetches budget)
        self.salt: dict[str, int] = {}  # host → partition overrides
        # UNFLUSHED visit rows only; with out_dir set, checkpoints flush
        # and truncate (driver memory O(checkpoint window), same contract
        # as CrawlEngine)
        self.visit_log: list[tuple[int, str, str]] = []  # (round, url, host)
        self._visits_flushed_rows = 0
        self._route_enqueue([(u, 0) for u in graph.seeds])

    def _route_enqueue(self, links: list[tuple[str, int]]) -> int:
        if not links:
            return 0
        hosts = [host_of(u) for u, _ in links]
        parts = partition_of(hosts, self.n_partitions, self.salt)
        by_part: dict[int, list[tuple[str, int]]] = {}
        for (u, r), p in zip(links, parts.tolist()):
            by_part.setdefault(p, []).append((u, r))
        # deterministic enqueue order within each partition
        futs = [
            self.parts[p].enqueue.remote(sorted(items))
            for p, items in by_part.items()
        ]
        return sum(ray.get(futs))

    def run(
        self,
        max_fetches: int,
        max_rounds: int | None = None,
        checkpoint_every: int | None = None,
        keep_checkpoints: int | None = None,
    ) -> PriorityStats:
        """``max_fetches`` is the TOTAL budget including pre-resume fetches
        (the CrawlEngine ``max_steps`` convention), so a resumed run
        finishes the same crawl."""
        stats = PriorityStats()
        start_fetched = self.fetched
        start_round = self.round
        t0 = time.perf_counter()
        while self.fetched < max_fetches:
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
                # everything politeness-deferred this round — still fall
                # through to the checkpoint-cadence check below (a streak
                # of deferred rounds must not stretch the commit window)
            else:
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
                            self.fetched += 1
                            self.visit_log.append((now, r["url"], host_of(r["url"])))
                        else:
                            stats.failed += 1
                        new_links.extend((u, self.round) for u in r["links"])
                stats.enqueued += self._route_enqueue(sorted(set(new_links)))
            if checkpoint_every and self.out_dir and self.round % checkpoint_every == 0:
                self.checkpoint()
                if keep_checkpoints:
                    prune_committed_checkpoints(self.out_dir, keep_checkpoints)
        stats.fetched = self.fetched - start_fetched
        stats.rounds = self.round - start_round
        stats.elapsed_sec = time.perf_counter() - t0
        stats.urls_per_sec = stats.fetched / stats.elapsed_sec if stats.elapsed_sec else 0.0
        stats.partition_metrics = {
            p: m for p, m in enumerate(ray.get([a.get_metrics.remote() for a in self.parts]))
        }
        if self.out_dir:
            self._flush_outputs()
        return stats

    def rebalance_hot_partitions(
        self, hot_ratio: float = 2.0, max_hosts: int = 8
    ) -> dict[str, int]:
        """Split hot frontier partitions (heap size > ``hot_ratio`` × mean)
        by rerouting their heaviest hosts to the currently lightest
        partition: heap entries, in-degree counters and politeness state
        migrate, the source's URL-seen history is chained into the target
        (frozen, read-only), and future links follow the salt map (north
        rule: skewed hot-host shards split via salted repartition).  The
        SCHEDULE is invariant: candidate selection is a global merge with
        per-host dedup, and hosts live in exactly one partition, so where
        a host's frontier sits affects memory and fetch placement, never
        visit order (tested).  Returns {host: new_partition}."""
        sizes = ray.get([p.frontier_size.remote() for p in self.parts])
        mean = sum(sizes) / max(1, len(sizes))
        moved: dict[str, int] = {}
        if mean <= 0:
            return moved
        for src in sorted(range(self.n_partitions), key=lambda p: -sizes[p]):
            if sizes[src] <= hot_ratio * mean:
                continue
            dst = min(range(self.n_partitions), key=lambda p: sizes[p])
            if dst == src:
                continue
            load = ray.get(self.parts[src].host_frontier_load.remote())
            excess = sizes[src] - int(mean)
            hosts: list[str] = []
            for h, cnt in sorted(load.items(), key=lambda kv: (-kv[1], kv[0])):
                if excess <= 0 or len(hosts) >= max_hosts:
                    break
                hosts.append(h)
                excess -= cnt
            if not hosts:
                continue
            blob = ray.get(self.parts[src].export_hosts.remote(hosts))
            seen_blob = ray.get(self.parts[src].export_seen.remote())
            ray.get(self.parts[dst].import_hosts.remote(blob))
            ray.get(self.parts[dst].attach_seen_base.remote(seen_blob))
            n_moved = sum(load[h] for h in hosts)
            sizes[src] -= n_moved
            sizes[dst] += n_moved
            for h in hosts:
                self.salt[h] = dst
                moved[h] = dst
        return moved

    # -- checkpoint / resume ------------------------------------------------

    def _flush_outputs(self) -> None:
        assert self.out_dir
        vd = os.path.join(self.out_dir, "visits")
        os.makedirs(vd, exist_ok=True)
        if self.visit_log:
            rows = sorted(self.visit_log)
            t = pa.table(
                {
                    "round": pa.array([r[0] for r in rows], pa.int64()),
                    "url": pa.array([r[1] for r in rows], pa.string()),
                    "host": pa.array([r[2] for r in rows], pa.string()),
                }
            )
            path = os.path.join(
                vd, f"visits-r{self.round:08d}-{self._visits_flushed_rows:010d}.parquet"
            )
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
            self._visits_flushed_rows += len(rows)
            self.visit_log = []
        ray.get([p.flush_corpus.remote(self.out_dir, self.round) for p in self.parts])

    def checkpoint(self) -> str:
        """Per-partition checkpoint: frontier heap + degree counters +
        politeness + URL-seen snapshots, flushed outputs, a lineage
        manifest and a COMMIT marker — the north rule's resumable
        priority frontier (same directory contract as CrawlEngine)."""
        assert self.out_dir
        ck = os.path.join(self.out_dir, "ckpt", f"round={self.round:08d}")
        os.makedirs(ck, exist_ok=True)
        # flush BEFORE snapshotting so restored corpus buffers are empty
        self._flush_outputs()
        blobs = ray.get([p.snapshot.remote() for p in self.parts])
        metrics = ray.get([p.get_metrics.remote() for p in self.parts])
        sizes = ray.get([p.frontier_size.remote() for p in self.parts])
        for i, b in enumerate(blobs):
            with open(os.path.join(ck, f"part-{i}.pkl"), "wb") as f:
                f.write(b)
        meta = {
            "round": self.round, "fetched": self.fetched,
            "n_partitions": self.n_partitions, "budget": self.budget,
            "salt": self.salt,
        }
        with open(os.path.join(ck, "meta.json"), "w") as f:
            json.dump(meta, f)

        def _files(d: str) -> list[str]:
            try:
                return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            except FileNotFoundError:
                return []

        lineage = {
            "round": self.round,
            "visits_files": _files(os.path.join(self.out_dir, "visits")),
            "partitions": [
                {
                    "part_id": i,
                    "metrics": dict(metrics[i]),
                    "frontier_size": sizes[i],
                    "corpus_files": _files(
                        os.path.join(self.out_dir, "corpus", f"part={i:04d}")
                    ),
                    "state_bytes": len(blobs[i]),
                }
                for i in range(self.n_partitions)
            ],
        }
        with open(os.path.join(ck, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        with open(os.path.join(ck, "COMMIT"), "w") as f:
            f.write("ok")
        return ck

    @classmethod
    def resume(cls, graph: WebGraph, out_dir: str, **kw) -> "PriorityCrawlEngine":
        """Resume from the last COMMITTED checkpoint: orphaned post-commit
        output files are removed, partition state restored, and a
        subsequent ``run(max_fetches=N)`` completes the identical crawl
        (pinned by tests incl. an abrupt actor-kill drill).  Pass the same
        ``config``/``host_scores`` the original engine used."""
        ck = latest_committed_checkpoint(out_dir)
        with open(os.path.join(ck, "meta.json")) as f:
            meta = json.load(f)
        CrawlEngine._remove_orphan_outputs(out_dir, meta["round"])
        eng = cls(
            graph,
            n_partitions=meta["n_partitions"],
            budget_per_round=meta["budget"],
            out_dir=out_dir,
            **kw,
        )
        futs = []
        for i, p in enumerate(eng.parts):
            with open(os.path.join(ck, f"part-{i}.pkl"), "rb") as f:
                futs.append(p.restore.remote(f.read()))
        ray.get(futs)  # batched: restores deserialize in parallel
        eng.round = meta["round"]
        eng.fetched = meta["fetched"]
        eng.salt = dict(meta.get("salt", {}))
        eng._visits_flushed_rows = eng._count_flushed_visits()
        return eng

    def _count_flushed_visits(self) -> int:
        vd = os.path.join(self.out_dir, "visits") if self.out_dir else None
        if not vd or not os.path.isdir(vd):
            return 0
        return sum(
            pq.read_metadata(os.path.join(vd, f)).num_rows
            for f in os.listdir(vd)
            if f.endswith(".parquet")
        )

    def _flushed_visit_rows(self) -> list[tuple[int, str, str]]:
        if not self.out_dir:
            return []
        vd = os.path.join(self.out_dir, "visits")
        if not os.path.isdir(vd):
            return []
        rows: list[tuple[int, str, str]] = []
        for f in sorted(os.listdir(vd)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(vd, f))
            rows.extend(zip(*(t[c].to_pylist() for c in ("round", "url", "host"))))
        return rows

    def visit_order(self) -> list[tuple[int, str, str]]:
        return sorted(self._flushed_visit_rows() + self.visit_log)

    def collect_corpus(self) -> list[dict]:
        out: list[dict] = []
        for rows in ray.get([p.drain_corpus.remote() for p in self.parts]):
            out.extend(rows)
        return out

    def shutdown(self) -> None:
        for a in self.parts:
            ray.kill(a)
        self.parts = []
