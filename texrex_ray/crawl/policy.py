"""Walk policy — ClaraX's stack-based random walk, deterministic per walker.

Semantics follow the reference walker (ref: trwalkers.pas:858-997):

- with probability ``random_jump_probability`` jump to a fresh seed
  (uniform-random pop from the walker's seed list, ref :595-606);
- otherwise pop a uniform-random untaken link of the stack-top step;
- on dead end (top has no links left): forced jump if configured and seeds
  remain, else backtrack-pop the stack, else the walker is exhausted;
- each successful step (fetch or cache hit) pushes a new step whose link
  list is the page's scoped out-links (ref :774-823);
- an LRU-ish document cache (drop index 0 when full, ref :87-97,346-396)
  lets cyclic walk segments step without re-fetching.

RNG call order is part of the spec (the fidelity fixture depends on it):
(1) the jump draw happens only when the stack is non-empty; (2) seed pops
draw ``randrange(len(seeds))``; (3) link pops draw ``randrange(len(links))``.
The engine and the sequential oracle must preserve this order exactly.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    random_jump_probability: float = 0.05
    jump_on_dead_end: bool = True
    backtrack_on_dead_end: bool = True
    min_politeness: int = 1
    robots_refresh_interval: int = 100_000
    agent: str = "texrex"
    bloom_error_rate: float = 1e-6
    bloom_initial_capacity: int = 1 << 14
    bloom_max_memory_mb: int = 1024
    # URL-seen filter implementation: "bloom" (reference-faithful scaling
    # Bloom chain) or "cuckoo" (deletion-capable; north rule names both).
    # Both are false-negative-free, so crawl decisions are identical
    # wherever neither false-positives (tests prove it at fixture scale).
    url_seen_backend: str = "bloom"
    max_cache: int = 512
    max_links_per_step: int = 256
    use_same_host_links: bool = True
    use_same_virtual_host_links: bool = True
    use_external_links: bool = True
    # link scoping filters (ref: trwalkers.pas:774-823 HostScopeRegex /
    # BlockFileRegex): hosts must match host_scope_regex (when set); URLs
    # matching block_file_regex are dropped (None → the built-in binary-
    # extension default).
    host_scope_regex: str | None = None
    block_file_regex: str | None = None
    # extra politeness jitter (ref: trpoliteness AddRandomWaitUpTo, used at
    # trwalkers.pas:630-644): an allowed fetch is deferred by a
    # deterministic pseudo-random 0..N extra rounds.  0 disables (the
    # oracle-fidelity configuration).
    add_random_wait_up_to: int = 0
    # harvest <img>/<figcaption> (src, caption) pairs from fetched pages into
    # the corpus (the graft's image+caption payload channel); off for the
    # oracle-fidelity configuration (it never affects the walk itself).
    collect_images: bool = False


@dataclass
class Step:
    url: str
    links: list[str] = field(default_factory=list)


# proposal actions (mirror the reference's .walk/log vocabulary,
# ref: trwalkers.pas:940-979)
SEED, STEP, RANDOMJUMP, FORCEDJUMP, BACKTRACK = (
    "seed", "step", "randomjump", "forcedjump", "backtrack",
)


class Walker:
    """One walker's stack + RNG + cache.  ``propose`` picks the next URL
    (consuming RNG); ``deliver`` reports the outcome.  A proposal deferred
    by politeness stays pending and is re-proposed without RNG use."""

    def __init__(self, walker_id: int, seeds: list[str], seed: int, config: CrawlConfig):
        self.walker_id = walker_id
        self.seeds = list(seeds)
        self.rng = random.Random(seed * 1_000_003 + walker_id)
        self.cfg = config
        self.stack: list[Step] = []
        self.pending: tuple[str, str] | None = None
        self.cache: dict[str, list[str]] = {}
        self.exhausted = False

    # -- policy ------------------------------------------------------------

    def _pop_seed(self) -> str:
        i = self.rng.randrange(len(self.seeds))
        return self.seeds.pop(i)

    def _choose(self) -> tuple[str, str] | None:
        if not self.stack:
            if not self.seeds:
                return None
            return (self._pop_seed(), SEED)
        if self.rng.random() < self.cfg.random_jump_probability and self.seeds:
            return (self._pop_seed(), RANDOMJUMP)
        action = STEP
        while True:
            top = self.stack[-1]
            if top.links:
                i = self.rng.randrange(len(top.links))
                return (top.links.pop(i), action)
            if self.cfg.jump_on_dead_end and self.seeds:
                return (self._pop_seed(), FORCEDJUMP)
            if self.cfg.backtrack_on_dead_end and len(self.stack) > 1:
                self.stack.pop()
                action = BACKTRACK
                continue
            return None

    def propose(self) -> tuple[str, str] | None:
        """(url, action) to visit next, or None when exhausted."""
        if self.exhausted:
            return None
        if self.pending is None:
            nxt = self._choose()
            if nxt is None:
                self.exhausted = True
                return None
            self.pending = nxt
        return self.pending

    # -- outcomes ----------------------------------------------------------

    def defer(self) -> None:
        """Politeness wait: keep the proposal pending for a later round."""

    def deliver(self, ok: bool, links: list[str] | None) -> None:
        """Fetch (or cache) outcome for the pending proposal."""
        url, _action = self.pending
        self.pending = None
        if not ok:
            return
        links = list(links or [])[: self.cfg.max_links_per_step]
        self.stack.append(Step(url=url, links=list(links)))
        if len(self.cache) >= self.cfg.max_cache:
            # drop the oldest entry (index 0), ref: trwalkers.pas:87-97
            self.cache.pop(next(iter(self.cache)))
        self.cache[url] = links

    def cached_links(self, url: str) -> list[str] | None:
        return self.cache.get(url)

    # -- checkpointing -----------------------------------------------------

    def snapshot(self) -> dict:
        import pickle

        return {
            "walker_id": self.walker_id,
            "seeds": list(self.seeds),
            "rng_state": pickle.dumps(self.rng.getstate()),
            "stack": [(s.url, list(s.links)) for s in self.stack],
            "pending": self.pending,
            "cache": {k: list(v) for k, v in self.cache.items()},
            "exhausted": self.exhausted,
        }

    @classmethod
    def restore(cls, snap: dict, config: CrawlConfig) -> "Walker":
        import pickle

        w = cls(snap["walker_id"], [], 0, config)
        w.seeds = list(snap["seeds"])
        w.rng.setstate(pickle.loads(snap["rng_state"]))
        w.stack = [Step(url=u, links=list(ls)) for u, ls in snap["stack"]]
        w.pending = tuple(snap["pending"]) if snap["pending"] else None
        w.cache = {k: list(v) for k, v in snap["cache"].items()}
        w.exhausted = snap["exhausted"]
        return w


def split_seeds(seeds: list[str], n_walkers: int) -> list[list[str]]:
    """Deterministic round-robin seed assignment (walker k gets seeds
    k, k+n, k+2n, …).  With one walker this is the full ordered list, so
    the single-walker projection matches the reference exactly."""
    return [seeds[k::n_walkers] for k in range(n_walkers)]
