"""The distributed crawl engine: ClaraX semantics on sharded Ray actors.

Re-architecture of the reference's single-threaded walker (ref:
trwalkers.pas:858-997, SURVEY.md §3.2) per the north rule:

- **Walker shards** (actor pool): each holds a group of walkers' stacks,
  RNGs and document caches — the walk state.  K walkers is the *logical*
  parallelism and is fixed; shard/partition counts are physical and can
  change without changing any decision (determinism across cluster sizes).
- **Frontier partitions** (actor pool): partition = ``hash(host) % P``;
  each holds the per-host politeness + robots state and its Bloom URL-seen
  segment, so first-wins races never span actors.  Gate decisions within a
  partition process proposals in walker-id order → deterministic under any
  physical layout.
- **Fetch** runs as Ray tasks over URL batches against the broadcast
  (``ray.put``) synthetic web graph; fetch+strip+scope per URL.
- The round loop: propose → gate (politeness/robots) → fetch → deliver
  links / record output (Bloom first-wins) → next round.  One round ≡ one
  virtual second.  The single-walker projection reproduces the sequential
  oracle's visit order and URL-seen set exactly (tested).
- **Checkpoint/resume**: every ``checkpoint_every`` rounds each state
  holder snapshots (walker stacks+RNG, politeness, Bloom bits, metrics)
  under ``ckpt/round=R/`` with a commit marker; corpus and visit-log rows
  flush to parquet per checkpoint window (resumable output layout).

At real-web scale the fetch stage becomes an HTTP actor pool with
sessions (same interface); everything else is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import pickle
import time
from collections import Counter
from dataclasses import asdict, dataclass, field
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from texrex_ray.crawl.fetcher import fetch_parse
from texrex_ray.crawl.policy import CrawlConfig, Walker, split_seeds
from texrex_ray.functions.hashing import stable_hash64
from texrex_ray.functions.urlkit import host_of
from texrex_ray.sources.webgraph import WebGraph
from texrex_ray.state.urlseen import make_url_seen, restore_url_seen
from texrex_ray.state.politeness import PolitenessManager


@dataclass
class CrawlStats:
    steps: int = 0
    outputs: int = 0
    rounds: int = 0
    fetches: int = 0
    cache_hits: int = 0
    waits: int = 0
    disallowed: int = 0
    failed: int = 0
    elapsed_sec: float = 0.0
    urls_per_sec: float = 0.0
    partition_metrics: dict = field(default_factory=dict)


@ray.remote
class WalkerShardActor:
    """A group of walkers; propose/deliver in walker-id order."""

    def __init__(self, walker_ids: list[int], seeds_by_walker: dict[int, list[str]],
                 seed: int, cfg: CrawlConfig):
        self.cfg = cfg
        self.walkers = {
            wid: Walker(wid, seeds_by_walker[wid], seed, cfg) for wid in walker_ids
        }

    def propose_all(self) -> list[tuple[int, str, str, bool]]:
        """[(walker_id, url, action, is_cache_hit)] for live walkers.

        Cache hits (ref: trwalkers.pas:882-894 — cache hit = MakeStep only,
        no fetch) are only FLAGGED here; the step is applied when the driver
        acks with verdict "cache" in resolve(), so walker state never runs
        ahead of driver-recorded rounds (checkpoint consistency).
        """
        out = []
        for wid in sorted(self.walkers):
            w = self.walkers[wid]
            prop = w.propose()
            if prop is None:
                continue
            url, action = prop
            out.append((wid, url, action, w.cached_links(url) is not None))
        return out

    def resolve(
        self,
        results: list[tuple[int, str]],
        link_payloads: list | None = None,
    ) -> None:
        """results: (walker_id, verdict) — verdict ∈ ok|fail|wait|cache.

        Fetch verdicts + link lists arrive via ``link_payloads`` — the
        per-shard ``(wid, verdict, links)`` outputs of ``gate_fetch``,
        shipped actor→actor through the object store so the driver never
        serializes (or even waits on) them: the engine dispatches this
        call BEFORE consuming its own meta copy, which takes the whole
        verdict-routing hop off the round's critical path.  ``results``
        carries only the driver-acked cache hits (invariant: cache steps
        are recorded by the driver).  Per-walker deliveries are
        independent (one verdict per walker per round; each walker owns
        its RNG), so the order payloads apply in cannot affect the walk.
        """
        for payload in link_payloads or []:
            if isinstance(payload, ray.ObjectRef):
                # refs nested in a list are not auto-resolved; fetch from
                # the LOCAL object store (plasma), not through the driver
                payload = ray.get(payload)
            for wid, verdict, links in payload:
                w = self.walkers[wid]
                if verdict == "ok":
                    w.deliver(True, links)
                elif verdict == "fail":
                    w.deliver(False, None)
                # "wait": leave pending
        for wid, verdict in results:
            # the driver routes ONLY cache acks here (fetch verdicts come
            # through the payloads above); anything else would risk a
            # double delivery, so reject it loudly
            if verdict != "cache":
                raise ValueError(
                    f"resolve(): unexpected driver verdict {verdict!r} for "
                    f"walker {wid} — fetch verdicts must ride gate_fetch's "
                    "per-shard payloads"
                )
            w = self.walkers[wid]
            w.deliver(True, w.cached_links(w.pending[0]))

    def resolve_and_propose(
        self,
        results: list[tuple[int, str]],
        link_payloads: list[list[tuple[int, list[str]]]] | None = None,
    ) -> list[tuple[int, str, str, bool]]:
        """Fused resolve + next-round propose: one barrier per shard per
        round instead of two."""
        self.resolve(results, link_payloads)
        return self.propose_all()

    def alive(self) -> int:
        return sum(0 if w.exhausted else 1 for w in self.walkers.values())

    # -- texcomm control verbs (ref: trtexrex.pas:548-798) ----------------

    def add_walkers(self, seeds_by_walker: dict[int, list[str]], seed: int) -> int:
        """Runtime walker addition (texcomm thread-add analogue): new
        walkers join this shard and start proposing next round."""
        for wid, seeds in seeds_by_walker.items():
            self.walkers[wid] = Walker(wid, seeds, seed, self.cfg)
        return len(self.walkers)

    def remove_walkers(self, walker_ids: list[int]) -> int:
        """Runtime walker removal (thread-remove): the walker is marked
        exhausted — it stops proposing but its history stays snapshotable."""
        n = 0
        for wid in walker_ids:
            w = self.walkers.get(wid)
            if w is not None and not w.exhausted:
                w.exhausted = True
                w.pending = None
                n += 1
        return n

    def reconfigure(self, changes: dict) -> None:
        """Apply config updates to future decisions (texcomm queue-resize
        analogue: e.g. max_links_per_step, max_cache, jump probability)."""
        for k, v in changes.items():
            setattr(self.cfg, k, v)

    def snapshot(self) -> bytes:
        return pickle.dumps({wid: w.snapshot() for wid, w in self.walkers.items()})

    def restore(self, blob: bytes) -> None:
        snaps = pickle.loads(blob)
        self.walkers = {
            wid: Walker.restore(s, self.cfg) for wid, s in snaps.items()
        }


@ray.remote
class FrontierPartActor:
    """Politeness + robots + Bloom segment + fetch for one host-hash
    partition.

    The whole per-URL sequence — robots refresh, politeness gate, fetch,
    Bloom first-wins output gating, corpus-row buffering — runs inside ONE
    actor call per partition per round (``gate_fetch``), so a round costs
    two driver barriers total (propose + gate_fetch) instead of five.
    Items are processed in (walker_id, url) order → identical decisions
    under any physical layout.  Corpus rows stay in the actor and are
    written as per-partition parquet files (resumable output layout).
    """

    def __init__(self, part_id: int, robots_map: dict[str, str | None],
                 pages: dict, cfg: CrawlConfig):
        self.part_id = part_id
        self.cfg = cfg
        self.robots_map = robots_map
        self.pages = pages
        self.pm = PolitenessManager(
            min_politeness=cfg.min_politeness,
            robots_refresh_interval=cfg.robots_refresh_interval,
            agent=cfg.agent,
        )
        self.bloom = make_url_seen(cfg)  # bloom or cuckoo per config
        self.metrics: Counter = Counter()
        self.corpus_buf: list[dict] = []
        self.host_fetches: Counter = Counter()

    # -- hot-shard rebalancing (salted repartition, host granularity) ------

    def host_load(self) -> dict[str, int]:
        return dict(self.host_fetches)

    def export_host_states(self, hosts: list[str]) -> bytes:
        """Extract (and drop) per-host politeness state for migration."""
        out = {}
        for h in hosts:
            st = self.pm.hosts.pop(h, None)
            if st is not None:
                out[h] = {
                    "last_access": st.last_access,
                    "robots_fetched_at": st.robots_fetched_at,
                    "disallows": st.robots.disallows if st.robots else None,
                    "crawl_delay": st.robots.crawl_delay if st.robots else 0,
                }
            self.host_fetches.pop(h, None)
        return pickle.dumps(out)

    def import_host_states(self, blob: bytes) -> None:
        from texrex_ray.state.politeness import HostState, RobotsRules

        for h, s in pickle.loads(blob).items():
            st = HostState(
                last_access=s["last_access"], robots_fetched_at=s["robots_fetched_at"]
            )
            if s["disallows"] is not None:
                st.robots = RobotsRules(
                    disallows=list(s["disallows"]), crawl_delay=s["crawl_delay"]
                )
            self.pm.hosts[h] = st

    def export_bloom(self) -> bytes:
        return pickle.dumps(self.bloom.snapshot())

    def attach_bloom_base(self, blob: bytes) -> None:
        """Chain another partition's Bloom segments as read-only history.

        Migrated hosts' already-seen URLs live in the source partition's
        segments; chaining them preserves no-false-negatives (first-wins)
        at a small false-positive cost — per-host bits cannot be extracted
        from a Bloom filter.
        """
        base = restore_url_seen(pickle.loads(blob))
        # older segments/tables become read-only history; adds keep going
        # to the CURRENT tail
        base.freeze()
        self.bloom.chain_base(base)

    def _robots_body(self, url: str, host: str) -> str | None:
        """robots.txt body for ``host``: the broadcast map first (synthetic
        graphs ship all robots up front), else fetched over the live
        transport when one is attached — the reference fetches robots over
        HTTP on the same refresh clock (ref: trpoliteness.pas:164-285).
        Non-200 (incl. redirect-without-follow) ⇒ no rules, like the
        reference's missing-robots default."""
        if host in self.robots_map:
            return self.robots_map[host]
        if getattr(self.pages, "fetches_robots", False):
            sp = urlsplit(url)
            res = self.pages.get(f"{sp.scheme}://{sp.netloc}/robots.txt")
            if res is not None and res[0] == 200:
                return res[1].decode("utf-8", "replace")
        return None

    def gate_fetch(self, items: list[tuple[int, str, str]], now: int,
                   n_shards: int = 1):
        """Per (walker_id, url, action), in walker-id order: gate through
        politeness + robots, fetch, Bloom-dedup, buffer corpus rows.

        Returns ``1 + n_shards`` values (call with
        ``.options(num_returns=1 + n_shards)``): a meta list
        ``(walker_id, verdict ok|fail|wait, is_new_output)`` for the
        driver, then per-walker-shard link payloads
        ``[(walker_id, links)]`` that flow directly to the shard actors
        through the object store — link lists are ~95% of the result bytes
        and the driver never needs them."""
        t0 = time.perf_counter()
        meta: list[tuple[int, str, bool]] = []
        shard_links: list[list[tuple[int, list[str]]]] = [[] for _ in range(n_shards)]
        for wid, url, action in sorted(items):
            host = host_of(url)
            if self.pm.needs_robots(host, now):
                self.pm.set_robots(host, self._robots_body(url, host), now)
                self.metrics["robots_fetches"] += 1
            w = self.pm.seconds_until_retrieval(url, now)
            if w < 0:
                self.metrics["disallowed"] += 1
                meta.append((wid, "fail", False))
                shard_links[wid % n_shards].append((wid, "fail", None))
                continue
            if w > 0:
                self.metrics["waits"] += 1
                meta.append((wid, "wait", False))
                shard_links[wid % n_shards].append((wid, "wait", None))
                continue
            if self.cfg.add_random_wait_up_to > 0:
                # extra politeness jitter (ref: AddRandomWaitUpTo at
                # trwalkers.pas:630-644) — deterministic per (url, round) so
                # decisions are identical under any physical layout
                extra = int(
                    stable_hash64([f"{url}|{now}"], seed=13)[0]
                    % np.uint64(self.cfg.add_random_wait_up_to + 1)
                )
                if extra > 0:
                    self.metrics["jitter_waits"] += 1
                    meta.append((wid, "wait", False))
                    shard_links[wid % n_shards].append((wid, "wait", None))
                    continue
            self.pm.retrieved(url, now)
            self.metrics["gated_fetches"] += 1
            self.host_fetches[host] += 1
            fr = fetch_parse(self.pages, url, self.cfg)
            if not fr.ok:
                self.metrics["failed_fetches"] += 1
                meta.append((wid, "fail", False))
                shard_links[wid % n_shards].append((wid, "fail", None))
                continue
            is_new = bool(self.bloom.add_if_new([url])[0])
            if is_new:
                self.metrics["outputs"] += 1
                row = {
                    "url": url, "final_url": fr.final_url, "host": host,
                    "status": fr.status, "charset": fr.charset,
                    "title": fr.title, "text": "\n".join(fr.divs),
                    "n_divs": len(fr.divs), "links": fr.links,
                    "round": now, "walker_id": wid, "action": action,
                    "raw_len": fr.raw_len,
                }
                if self.cfg.collect_images:
                    # image+caption harvest channel (parallel list columns;
                    # resolved absolute srcs, document order preserved so
                    # downstream first-wins dedup is position-deterministic)
                    row["img_srcs"] = [s for s, _ in fr.images]
                    row["img_caps"] = [c for _, c in fr.images]
                self.corpus_buf.append(row)
            meta.append((wid, "ok", is_new))
            shard_links[wid % n_shards].append((wid, "ok", fr.links))
        self.metrics["gate_ms"] += int((time.perf_counter() - t0) * 1000)
        self.metrics["gate_calls"] += 1
        if n_shards == 1:
            return meta, shard_links[0]
        return (meta, *shard_links)

    def flush_corpus(self, out_dir: str, upto_round: int) -> int:
        """Write buffered corpus rows to a per-partition parquet file."""
        if not self.corpus_buf:
            return 0
        d = os.path.join(out_dir, "corpus", f"part={self.part_id:04d}")
        os.makedirs(d, exist_ok=True)
        rows = self.corpus_buf
        # pin list-column types: a partition whose rows all have empty lists
        # would otherwise infer list<null> and break cross-file unification
        ltypes = {
            "links": pa.list_(pa.string()),
            "img_srcs": pa.list_(pa.string()),
            "img_caps": pa.list_(pa.string()),
        }
        t = pa.table(
            {k: pa.array([r[k] for r in rows], type=ltypes.get(k)) for k in rows[0]}
        )
        path = os.path.join(d, f"corpus-r{upto_round:08d}.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        n = len(rows)
        self.corpus_buf = []
        return n

    def drain_corpus(self) -> list[dict]:
        rows, self.corpus_buf = self.corpus_buf, []
        return rows

    def buffered_urls(self) -> list[str]:
        return [r["url"] for r in self.corpus_buf]

    def get_metrics(self) -> dict:
        return dict(self.metrics)

    def peek_corpus(self, n: int = 1) -> list[dict]:
        """Last n BUFFERED (not yet flushed) processed docs — the texcomm
        `peek` verb (ref: trtexrex.pas:739-763).  Text clipped to 400 chars
        so peeking never ships a full document to the driver."""
        out = []
        for r in self.corpus_buf[-n:]:
            r = dict(r)
            r["text"] = (r.get("text") or "")[:400]
            r.pop("links", None)
            out.append(r)
        return out

    def reconfigure(self, changes: dict) -> None:
        for k, v in changes.items():
            setattr(self.cfg, k, v)

    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "politeness": self.pm.snapshot(),
                "bloom": self.bloom.snapshot(),
                "metrics": dict(self.metrics),
                "corpus_buf": self.corpus_buf,
            }
        )

    def restore(self, blob: bytes) -> None:
        snap = pickle.loads(blob)
        self.pm = PolitenessManager.restore(snap["politeness"])
        self.bloom = restore_url_seen(snap["bloom"])
        self.metrics = Counter(snap["metrics"])
        self.corpus_buf = list(snap.get("corpus_buf", []))


def prune_committed_checkpoints(out_dir: str, keep_last: int) -> list[str]:
    """Shared retention helper (see ``CrawlEngine.prune_checkpoints`` for
    the contract); used by both crawl engines."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    ckroot = os.path.join(out_dir, "ckpt")
    try:
        committed = sorted(
            d for d in os.listdir(ckroot)
            if os.path.exists(os.path.join(ckroot, d, "COMMIT"))
        )
    except FileNotFoundError:
        return []
    pruned = []
    for d in committed[:-keep_last]:
        path = os.path.join(ckroot, d)
        os.remove(os.path.join(path, "COMMIT"))  # invisible to resume now
        shutil.rmtree(path, ignore_errors=True)
        pruned.append(path)
    # Torn checkpoints (a crash between the state writes and the COMMIT
    # marker) are invisible to resume but would otherwise leak their
    # per-partition state blobs forever: rounds are monotonic, so a torn
    # round=N directory is never rewritten once a NEWER round committed.
    # An uncommitted dir >= the newest committed round is left alone — it
    # may belong to a checkpoint() in flight right now.
    if committed:
        newest = committed[-1]
        for d in os.listdir(ckroot):
            if d.startswith("round=") and d < newest and d not in committed:
                path = os.path.join(ckroot, d)
                shutil.rmtree(path, ignore_errors=True)
                pruned.append(path)
    return pruned


def latest_committed_checkpoint(out_dir: str) -> str:
    """Path of the newest COMMITTED checkpoint under ``out_dir``/ckpt;
    raises FileNotFoundError when none exists (shared by both engines)."""
    ckroot = os.path.join(out_dir, "ckpt")
    try:
        rounds = sorted(
            d for d in os.listdir(ckroot)
            if os.path.exists(os.path.join(ckroot, d, "COMMIT"))
        )
    except FileNotFoundError:
        rounds = []
    if not rounds:
        raise FileNotFoundError(f"no committed checkpoint under {ckroot}")
    return os.path.join(ckroot, rounds[-1])


def partition_of(
    hosts: list[str], n_partitions: int, salt: dict[str, int] | None = None
) -> np.ndarray:
    """hash(host) % P, with explicit per-host overrides (the salt map used
    to split/relocate hot shards — north-rule skew handling).

    The hash is blake2b-based (``stable_hash64``): routing must survive a
    resume across library upgrades, or per-host politeness state and Bloom
    segments silently end up on the wrong partition."""
    parts = (stable_hash64(hosts, seed=7) % np.uint64(n_partitions)).astype(np.int64)
    if salt:
        for i, h in enumerate(hosts):
            ov = salt.get(h)
            if ov is not None:
                parts[i] = ov
    return parts


class CrawlEngine:
    """Round-based distributed crawl over a synthetic web graph."""

    def __init__(
        self,
        graph: WebGraph,
        *,
        n_walkers: int = 1,
        n_partitions: int = 4,
        n_walker_shards: int | None = None,
        seed: int = 42,
        config: CrawlConfig | None = None,
        out_dir: str | None = None,
        transport=None,
    ):
        from texrex_ray.crawl.fetcher import ArrowPagesTransport

        self.graph = graph
        self.cfg = config or CrawlConfig()
        self.seed = seed
        self.n_walkers = n_walkers
        self.n_partitions = n_partitions
        self.n_walker_shards = n_walker_shards or min(n_walkers, 8)
        self.out_dir = out_dir
        # the network seam: anything with get(url) -> page tuple | None
        # (crawl/fetcher.py Transport protocol).  Default stays the
        # broadcast synthetic-graph dict; a real cluster passes
        # HttpTransport() and the whole engine above this line is
        # unchanged (politeness, robots, Bloom, ordering all pinned by
        # the oracle-fidelity tests).
        self.pages_ref = ray.put(
            transport
            if transport is not None
            else ArrowPagesTransport.from_graph(graph)
        )

        seeds_split = split_seeds(graph.seeds, n_walkers)
        shard_members: dict[int, list[int]] = {s: [] for s in range(self.n_walker_shards)}
        for wid in range(n_walkers):
            shard_members[wid % self.n_walker_shards].append(wid)
        self.shards = [
            WalkerShardActor.remote(
                shard_members[s],
                {wid: seeds_split[wid] for wid in shard_members[s]},
                seed,
                self.cfg,
            )
            for s in range(self.n_walker_shards)
        ]
        # robots maps are small; every partition gets the full dict (a real
        # deployment would slice by host-hash — the lookup key is the same).
        # pages go once via the broadcast ref (deserialized once per actor).
        self.parts = [
            FrontierPartActor.remote(p, graph.robots, self.pages_ref, self.cfg)
            for p in range(self.n_partitions)
        ]
        self.round = 0
        self.steps = 0
        # UNFLUSHED visit rows only: (round, walker, url, host, action,
        # cached).  With out_dir set, _flush_outputs truncates this list at
        # every checkpoint, so driver memory is O(checkpoint window), not
        # O(crawl) — the 10^10-URL north rule's design point.  The URL-seen
        # set lives in the partition actors (Bloom + corpus buffers) and on
        # disk (corpus parquet); the driver holds no per-URL state.
        self.visit_rows: list[tuple] = []
        self.salt: dict[str, int] = {}      # host → partition overrides
        self.stats = CrawlStats()
        self._visits_flushed_rows = 0       # rows already in visits parquet

    def walk_stack_dump(self) -> "pa.Table":
        """Dump remaining walker stacks (ref: trwalkers.pas:984-996 — the
        `.walk` file: url, id, host, epoch, n_links per stack entry)."""
        from texrex_ray.functions.hashing import doc_id_for_url

        rows = []
        for blob in ray.get([s.snapshot.remote() for s in self.shards]):
            for wid, snap in pickle.loads(blob).items():
                for depth, (url, links) in enumerate(snap["stack"]):
                    rows.append((wid, depth, url, doc_id_for_url(url),
                                 host_of(url), self.round, len(links)))
        return pa.table(
            {
                "walker_id": pa.array([r[0] for r in rows], pa.int64()),
                "depth": pa.array([r[1] for r in rows], pa.int64()),
                "url": pa.array([r[2] for r in rows], pa.string()),
                "doc_id": pa.array([r[3] for r in rows], pa.string()),
                "host": pa.array([r[4] for r in rows], pa.string()),
                "round": pa.array([r[5] for r in rows], pa.int64()),
                "n_links": pa.array([r[6] for r in rows], pa.int64()),
            }
        )

    def metrics_table(self) -> "pa.Table":
        """Per-partition crawl metrics (the texcomm/Dash surface, ref:
        trtexrex.pas:801-873) as an Arrow table."""
        ms = ray.get([p.get_metrics.remote() for p in self.parts])
        keys = sorted({k for m in ms for k in m})
        cols = {"partition": pa.array(range(len(ms)), pa.int64())}
        for k in keys:
            cols[k] = pa.array([int(m.get(k, 0)) for m in ms], pa.int64())
        return pa.table(cols)

    # -- texcomm control surface (ref: src/programs/texcomm.pas, server
    # side trtexrex.pas:548-798: dashboard / thread add+remove / queue
    # resize / peek).  The IPC socket becomes plain method calls on the
    # driver-held engine; a remote client would wrap these in a named Ray
    # actor, the transport texcomm's INET socket maps to.

    def control_status(self) -> dict:
        """One dashboard snapshot: progress counters + per-partition and
        walker liveness (texcomm's periodic status line)."""
        alive = sum(ray.get([s.alive.remote() for s in self.shards]))
        ms = ray.get([p.get_metrics.remote() for p in self.parts])
        totals: Counter = Counter()
        for m in ms:
            totals.update(m)
        return {
            "round": self.round,
            "steps": self.steps,
            "walkers_alive": alive,
            "n_partitions": self.n_partitions,
            "n_walker_shards": self.n_walker_shards,
            "outputs": int(totals.get("outputs", 0)),
            "gated_fetches": int(totals.get("gated_fetches", 0)),
            "waits": int(totals.get("waits", 0)),
            "disallowed": int(totals.get("disallowed", 0)),
            "salted_hosts": len(self.salt),
        }

    def peek(self, n: int = 1) -> list[dict]:
        """Most recent processed documents (clipped), newest last."""
        rows: list[dict] = []
        for part_rows in ray.get([p.peek_corpus.remote(n) for p in self.parts]):
            rows.extend(part_rows)
        rows.sort(key=lambda r: (r.get("round", 0), r.get("url", "")))
        return rows[-n:]

    def add_walkers(self, seeds_per_walker: list[list[str]]) -> list[int]:
        """Spawn len(seeds_per_walker) new walkers at runtime, round-robin
        across existing shards; returns their walker ids."""
        new_ids = list(range(self.n_walkers, self.n_walkers + len(seeds_per_walker)))
        by_shard: dict[int, dict[int, list[str]]] = {}
        for wid, seeds in zip(new_ids, seeds_per_walker):
            by_shard.setdefault(wid % self.n_walker_shards, {})[wid] = list(seeds)
        ray.get(
            [
                self.shards[s].add_walkers.remote(m, self.seed)
                for s, m in by_shard.items()
            ]
        )
        self.n_walkers += len(new_ids)
        return new_ids

    def remove_walkers(self, walker_ids: list[int]) -> int:
        """Stop the given walkers after their current round."""
        by_shard: dict[int, list[int]] = {}
        for wid in walker_ids:
            by_shard.setdefault(wid % self.n_walker_shards, []).append(wid)
        return sum(
            ray.get(
                [self.shards[s].remove_walkers.remote(ids) for s, ids in by_shard.items()]
            )
        )

    def reconfigure(self, **changes) -> None:
        """Broadcast config updates to every actor and the driver copy.
        Affects future decisions only (no retroactive state rewrite), like
        texcomm's live queue-resize."""
        for k, v in changes.items():
            if not hasattr(self.cfg, k):
                raise AttributeError(f"unknown CrawlConfig field: {k}")
            setattr(self.cfg, k, v)
        ray.get(
            [a.reconfigure.remote(changes) for a in list(self.shards) + list(self.parts)]
        )

    def shutdown(self) -> None:
        """Kill the engine's actors, releasing their CPU reservations.

        Each actor reserves one CPU; a finished crawl would otherwise starve
        subsequent Dataset stages in the same session."""
        for a in self.shards + self.parts:
            ray.kill(a)
        self.shards, self.parts = [], []

    # -- skew handling -----------------------------------------------------

    def rebalance_hot_partitions(self, hot_ratio: float = 2.0) -> dict[str, int]:
        """Salted repartition of hot frontier shards (host granularity).

        Measures per-host fetch load, finds partitions above ``hot_ratio``×
        the mean, and migrates their heaviest hosts to the least-loaded
        partitions: politeness state moves exactly; the source partition's
        Bloom segments are chained read-only into the destination (first-
        wins preserved; per-host bits can't leave a Bloom).  Decisions are
        per-host/per-URL, so visit order is unaffected (tested).  Returns
        the applied salt map.
        """
        loads = ray.get([p.host_load.remote() for p in self.parts])
        totals = np.array([sum(l.values()) for l in loads], dtype=np.float64)
        mean = max(1.0, totals.mean())
        new_salt: dict[str, int] = {}
        for p_hot in np.argsort(-totals):
            if totals[p_hot] <= hot_ratio * mean:
                break
            excess = totals[p_hot] - mean
            hosts_sorted = sorted(loads[p_hot].items(), key=lambda kv: -kv[1])
            moved_bloom = False
            for host, load in hosts_sorted:
                if excess <= 0:
                    break
                p_cold = int(np.argmin(totals))
                if p_cold == p_hot:
                    break
                blob = ray.get(self.parts[p_hot].export_host_states.remote([host]))
                ray.get(self.parts[p_cold].import_host_states.remote(blob))
                if not moved_bloom:
                    bloom_blob = ray.get(self.parts[p_hot].export_bloom.remote())
                    ray.get(self.parts[p_cold].attach_bloom_base.remote(bloom_blob))
                    moved_bloom = True
                new_salt[host] = p_cold
                totals[p_hot] -= load
                totals[p_cold] += load
                excess -= load
        self.salt.update(new_salt)
        return new_salt

    # -- round loop --------------------------------------------------------

    def run(self, max_steps: int, checkpoint_every: int | None = None,
            max_rounds: int | None = None,
            keep_checkpoints: int | None = None) -> CrawlStats:
        t0 = time.perf_counter()
        # prime the first round's proposals (subsequent rounds get theirs
        # from the fused resolve_and_propose call)
        prop_futs = [s.propose_all.remote() for s in self.shards]
        while self.steps < max_steps:
            if max_rounds is not None and self.round >= max_rounds:
                break
            prop_futs, made_progress = self._run_round(prop_futs)
            if checkpoint_every and self.out_dir and self.round % checkpoint_every == 0:
                self.checkpoint()
                if keep_checkpoints:
                    self.prune_checkpoints(keep_checkpoints)
            if not made_progress:
                alive = sum(ray.get([s.alive.remote() for s in self.shards]))
                if alive == 0:
                    break
        self.stats.steps = self.steps
        self.stats.rounds = self.round
        self.stats.elapsed_sec = time.perf_counter() - t0
        self.stats.urls_per_sec = (
            self.steps / self.stats.elapsed_sec if self.stats.elapsed_sec > 0 else 0.0
        )
        self.stats.partition_metrics = {
            p: m for p, m in enumerate(ray.get([a.get_metrics.remote() for a in self.parts]))
        }
        if self.out_dir:
            self._flush_outputs()
        return self.stats

    def _run_round(self, prop_futs: list) -> tuple[list, bool]:
        now = self.round
        self.round += 1
        proposals = []
        for res in ray.get(prop_futs):
            proposals.extend(res)
        if not proposals:
            return [s.propose_all.remote() for s in self.shards], False
        # cache hits: record the step now; the walker applies it on ack
        cache_acks: dict[int, list[tuple[int, str, None]]] = {}
        for wid, url, action, cached in proposals:
            if cached:
                self.steps += 1
                self.stats.cache_hits += 1
                self.visit_rows.append((now, wid, url, host_of(url), action, True))
                cache_acks.setdefault(wid % self.n_walker_shards, []).append(
                    (wid, "cache")
                )
        pending = [(wid, url, action) for wid, url, action, c in proposals if not c]
        if not pending:
            next_futs = [
                self.shards[s].resolve_and_propose.remote(cache_acks.get(s, []))
                for s in range(self.n_walker_shards)
            ]
            return next_futs, True
        hosts = [host_of(u) for _, u, _ in pending]
        parts = partition_of(hosts, self.n_partitions, self.salt)
        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(parts.tolist()):
            by_part.setdefault(p, []).append(i)
        # ONE actor call per partition: gate + fetch + bloom + corpus
        # buffer.  The call returns 1 meta object (small, driver-bound) +
        # one link payload PER WALKER SHARD: the driver ray.gets only the
        # metas, and passes the link-payload refs straight into the shard
        # actors — link lists (~95% of result bytes) move object-store →
        # shard without ever being serialized through the driver.
        S = self.n_walker_shards
        part_ids = list(by_part)
        meta_refs, link_refs = [], []
        for p in part_ids:
            refs = self.parts[p].gate_fetch.options(num_returns=1 + S).remote(
                [pending[i] for i in by_part[p]], now, S
            )
            meta_refs.append(refs[0])
            link_refs.append(refs[1:])
        # PIPELINE: fetch verdicts ride the per-shard payload refs, so the
        # next round's fused resolve+propose dispatches IMMEDIATELY — each
        # shard pulls its verdicts+links straight from the object store as
        # its partitions finish, and the driver's meta read below runs in
        # PARALLEL with that work instead of gating it (measured: the
        # verdict-routing hop was ~40% of round latency).  Cache acks stay
        # driver-routed (invariant: cache steps are driver-recorded).
        next_futs = [
            self.shards[s].resolve_and_propose.remote(
                cache_acks.get(s, []),
                [link_refs[j][s] for j in range(len(part_ids))],
            )
            for s in range(S)
        ]
        # driver-side accounting (stats + visit rows), off the critical path
        res_all = ray.get(meta_refs)
        by_wid = {wid: (i, url, action) for i, (wid, url, action) in enumerate(pending)}
        for p, res in zip(part_ids, res_all):
            for wid, verdict, is_new in res:
                i, url, action = by_wid[wid]
                if verdict == "ok":
                    self.steps += 1
                    self.stats.fetches += 1
                    self.visit_rows.append((now, wid, url, hosts[i], action, False))
                    if is_new:
                        self.stats.outputs += 1
                elif verdict == "wait":
                    self.stats.waits += 1
                else:
                    self.stats.failed += 1
        return next_futs, True

    # -- fixtures ----------------------------------------------------------

    def visit_order(self) -> list[tuple[int, str, str, str]]:
        """(seq, url, host, action) ordered by (round, walker_id).

        Reconstructed from the flushed visits parquet plus the in-memory
        unflushed tail — the driver never holds the whole log."""
        rows = self._flushed_visit_rows() + self.visit_rows
        rows.sort(key=lambda r: (r[0], r[1]))
        return [(i + 1, r[2], r[3], r[4]) for i, r in enumerate(rows)]

    def _flushed_visit_rows(self) -> list[tuple]:
        if not self.out_dir:
            return []
        vd = os.path.join(self.out_dir, "visits")
        if not os.path.isdir(vd):
            return []
        rows: list[tuple] = []
        for f in sorted(os.listdir(vd)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(vd, f))
            rows.extend(
                zip(*(t[c].to_pylist() for c in
                      ("round", "walker_id", "url", "host", "action", "cached")))
            )
        return rows

    def url_seen(self) -> set[str]:
        """The Bloom-accepted output set = persisted corpus ∪ actor buffers.

        Derived, not driver-held: the authoritative first-wins state is the
        sharded Bloom; every accepted URL has exactly one corpus row, either
        already flushed to parquet or still buffered in its partition actor
        (or drained to ``_corpus_local`` by ``collect_corpus``)."""
        seen = self._persisted_seen()
        if self.parts:
            for urls in ray.get([p.buffered_urls.remote() for p in self.parts]):
                seen.update(urls)
        seen.update(r["url"] for r in getattr(self, "_corpus_local", []))
        return seen

    def collect_corpus(self) -> list[dict]:
        """Drain corpus rows buffered in the partition actors (accumulates
        driver-side across calls; for tests/small runs — large runs use
        ``flush_corpus`` → per-partition parquet instead)."""
        if not hasattr(self, "_corpus_local"):
            self._corpus_local: list[dict] = []
        for rows in ray.get([p.drain_corpus.remote() for p in self.parts]):
            self._corpus_local.extend(rows)
        return self._corpus_local

    def _persisted_seen(self) -> set[str]:
        if not self.out_dir:
            return set()
        d = os.path.join(self.out_dir, "corpus")
        if not os.path.isdir(d):
            return set()
        seen = set()
        for part in os.listdir(d):
            pd_ = os.path.join(d, part)
            if not os.path.isdir(pd_):
                continue
            for f in os.listdir(pd_):
                if f.endswith(".parquet"):
                    seen.update(
                        pq.read_table(os.path.join(pd_, f), columns=["url"])["url"].to_pylist()
                    )
        return seen

    # -- checkpoint / resume ----------------------------------------------

    def checkpoint(self) -> str:
        assert self.out_dir
        r = self.round
        ck = os.path.join(self.out_dir, "ckpt", f"round={r:08d}")
        os.makedirs(ck, exist_ok=True)
        # flush BEFORE snapshotting so restored corpus buffers are empty
        # (no double-write after resume)
        self._flush_outputs()
        shard_blobs = ray.get([s.snapshot.remote() for s in self.shards])
        part_blobs = ray.get([p.snapshot.remote() for p in self.parts])
        part_metrics = ray.get([p.get_metrics.remote() for p in self.parts])
        for i, b in enumerate(shard_blobs):
            with open(os.path.join(ck, f"shard-{i}.pkl"), "wb") as f:
                f.write(b)
        for i, b in enumerate(part_blobs):
            with open(os.path.join(ck, f"part-{i}.pkl"), "wb") as f:
                f.write(b)
        meta = {
            "round": self.round, "steps": self.steps,
            "outputs": self.stats.outputs, "n_walkers": self.n_walkers,
            "n_partitions": self.n_partitions, "n_walker_shards": self.n_walker_shards,
            "seed": self.seed, "salt": self.salt,
        }
        with open(os.path.join(ck, "meta.json"), "w") as f:
            json.dump(meta, f)
        # lineage manifest: which output files each partition owns as of
        # this checkpoint, plus its live metrics and state-blob sizes —
        # the audit trail that lets a resumed run (or an operator) account
        # for every persisted row per partition without opening the blobs
        # (north-rule: per-partition checkpoints carry frontier snapshots,
        # bloom segments, and lineage/metrics).
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
                    "metrics": dict(part_metrics[i]),
                    "corpus_files": _files(
                        os.path.join(self.out_dir, "corpus", f"part={i:04d}")
                    ),
                    "state_bytes": len(part_blobs[i]),
                }
                for i in range(self.n_partitions)
            ],
            "shards": [
                {"shard_id": i, "state_bytes": len(b)}
                for i, b in enumerate(shard_blobs)
            ],
        }
        with open(os.path.join(ck, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        with open(os.path.join(ck, "COMMIT"), "w") as f:
            f.write("ok")
        return ck

    def prune_checkpoints(self, keep_last: int) -> list[str]:
        """Delete all but the newest ``keep_last`` COMMITTED checkpoints.

        At frontier scale each checkpoint carries the Bloom/cuckoo
        segments and frontier snapshots of every partition — retention
        must be bounded or the checkpoint directory outgrows the corpus.
        Only committed rounds are counted and only committed rounds are
        deleted (an in-flight directory without ``COMMIT`` is never
        touched: it belongs to a concurrent ``checkpoint()``), and the
        COMMIT marker is removed FIRST so a crash mid-delete leaves a
        directory that ``resume`` already ignores.  Returns the pruned
        checkpoint paths.
        """
        assert self.out_dir
        return prune_committed_checkpoints(self.out_dir, keep_last)

    def _flush_outputs(self) -> None:
        assert self.out_dir
        vd = os.path.join(self.out_dir, "visits")
        cd = os.path.join(self.out_dir, "corpus")
        os.makedirs(vd, exist_ok=True)
        os.makedirs(cd, exist_ok=True)
        if self.visit_rows:
            rows = self.visit_rows
            t = pa.table(
                {
                    "round": pa.array([r[0] for r in rows], pa.int64()),
                    "walker_id": pa.array([r[1] for r in rows], pa.int64()),
                    "url": pa.array([r[2] for r in rows], pa.string()),
                    "host": pa.array([r[3] for r in rows], pa.string()),
                    "action": pa.array([r[4] for r in rows], pa.string()),
                    "cached": pa.array([r[5] for r in rows], pa.bool_()),
                }
            )
            # tmp + os.replace like the corpus path: a crash mid-write never
            # leaves a torn parquet file behind
            path = os.path.join(
                vd, f"visits-r{self.round:08d}-{self._visits_flushed_rows:010d}.parquet"
            )
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
            self._visits_flushed_rows += len(rows)
            self.visit_rows = []  # truncate: driver memory stays O(window)
        ray.get([p.flush_corpus.remote(self.out_dir, self.round) for p in self.parts])

    @classmethod
    def resume(cls, graph: WebGraph, out_dir: str, **kw) -> "CrawlEngine":
        ck = latest_committed_checkpoint(out_dir)
        with open(os.path.join(ck, "meta.json")) as f:
            meta = json.load(f)
        # Remove output files from rounds BEYOND the restored checkpoint
        # (a crash between a later flush and its COMMIT leaves orphans that
        # would otherwise double-count after the resumed run re-produces
        # them under different flush boundaries).
        cls._remove_orphan_outputs(out_dir, meta["round"])
        eng = cls(
            graph,
            n_walkers=meta["n_walkers"],
            n_partitions=meta["n_partitions"],
            n_walker_shards=meta["n_walker_shards"],
            seed=meta["seed"],
            out_dir=out_dir,
            **kw,
        )
        futs = []
        for i, s in enumerate(eng.shards):
            with open(os.path.join(ck, f"shard-{i}.pkl"), "rb") as f:
                futs.append(s.restore.remote(f.read()))
        for i, p in enumerate(eng.parts):
            with open(os.path.join(ck, f"part-{i}.pkl"), "rb") as f:
                futs.append(p.restore.remote(f.read()))
        ray.get(futs)  # batched: all restores deserialize in parallel
        eng.round = meta["round"]
        eng.steps = meta["steps"]
        eng.stats.outputs = meta["outputs"]
        eng.salt = dict(meta.get("salt", {}))
        eng._visits_flushed_rows = eng._count_flushed_visits()
        return eng

    @staticmethod
    def _remove_orphan_outputs(out_dir: str, upto_round: int) -> None:
        import re as _re

        rx = _re.compile(r"-r(\d{8})")
        vd = os.path.join(out_dir, "visits")
        if os.path.isdir(vd):
            for f in os.listdir(vd):
                m = rx.search(f)
                if f.endswith((".parquet", ".tmp")) and (
                    f.endswith(".tmp") or (m and int(m.group(1)) > upto_round)
                ):
                    os.remove(os.path.join(vd, f))
        cd = os.path.join(out_dir, "corpus")
        if os.path.isdir(cd):
            for part in os.listdir(cd):
                pd_ = os.path.join(cd, part)
                if not os.path.isdir(pd_):
                    continue
                for f in os.listdir(pd_):
                    m = rx.search(f)
                    if f.endswith((".parquet", ".tmp")) and (
                        f.endswith(".tmp") or (m and int(m.group(1)) > upto_round)
                    ):
                        os.remove(os.path.join(pd_, f))

    def _count_flushed_visits(self) -> int:
        vd = os.path.join(self.out_dir, "visits") if self.out_dir else None
        if not vd or not os.path.isdir(vd):
            return 0
        n = 0
        for f in os.listdir(vd):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(vd, f)).num_rows
        return n
