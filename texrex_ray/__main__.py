"""Command-line entry points mirroring the reference's programs.

The reference ships standalone binaries (ref: src/programs/ — texrex,
clarax, tender, tecl, hydra, rofl, cowsplit, cowinterleave); this module
maps each verb onto the corresponding Ray pipeline so a reference user
can run the same jobs::

    python -m texrex_ray texrex  IN.parquet OUT_DIR [--minhash-k 64]
    python -m texrex_ray clarax  OUT_DIR [--steps 2000] [--walkers 64]
    python -m texrex_ray tender  IN.parquet OUT_DIR [--threshold 5]
    python -m texrex_ray tecl    IN.parquet BLACKLIST.parquet OUT_DIR
    python -m texrex_ray hydra   IN.parquet OUT_DIR [--column text]
    python -m texrex_ray rofl    IN.parquet OUT_DIR [--column text]

This is the ONE module (besides bench.py and the test fixture) that may
own a Ray session: it initialises Ray if and only if no session exists.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_texrex(args) -> dict:
    """Cleaning chain over a parquet corpus with a `text` column
    (ref program: src/programs/texrex.pas)."""
    ray = _ray()
    import ray.data

    from texrex_ray.pipelines.clean_documents import clean_documents

    ds = ray.data.read_parquet(args.input)
    out = clean_documents(ds, minhash_k=args.minhash_k)
    out.write_parquet(args.out)
    return {"rows": out.count(), "out": args.out}


def cmd_clarax(args) -> dict:
    """Random-walk crawl over the deterministic synthetic web graph
    (ref program: ClaraX, trwalkers.pas)."""
    _ray()
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.sources.webgraph import make_webgraph

    g = make_webgraph(
        n_hosts=args.hosts, pages_per_host_base=8, n_seeds=args.walkers, seed=args.seed
    )
    eng = CrawlEngine(
        g, n_walkers=args.walkers, n_partitions=args.partitions,
        seed=args.seed, config=CrawlConfig(), out_dir=args.out,
    )
    stats = eng.run(max_steps=args.steps, checkpoint_every=args.checkpoint_every)
    eng.checkpoint()
    eng.shutdown()
    return {
        "steps": stats.steps, "outputs": stats.outputs,
        "urls_per_sec": round(stats.urls_per_sec, 1), "out": args.out,
    }


def cmd_tender(args) -> dict:
    """Near-duplicate pair detection (ref program: tender)."""
    ray = _ray()
    import ray.data

    from texrex_ray.dedup.tender import tender

    ds = ray.data.read_parquet(args.input)
    pairs = tender(ds, pair_threshold=args.threshold, k=args.minhash_k)
    pairs.write_parquet(args.out)
    return {"pairs": pairs.count(), "out": args.out}


def cmd_tecl(args) -> dict:
    """Blacklist anti-join: drop documents whose id is blacklisted
    (ref program: tecl --black)."""
    ray = _ray()
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    bl = pq.read_table(args.blacklist)
    ids = bl[bl.column_names[0]]
    ref = ray.put(ids.combine_chunks())

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t[args.id_col], value_set=ray.get(ref)))
        )

    ds = ray.data.read_parquet(args.input).map_batches(drop, batch_format="pyarrow")
    ds.write_parquet(args.out)
    return {"rows": ds.count(), "out": args.out}


def _unigrams(ray, input_path: str, column: str) -> dict[str, int]:
    """Corpus unigram counts (the wordlist the reference programs take as
    a file argument), computed with one combiner-style pass."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for s in t[column].to_pylist():
            c.update(LATIN_TOKEN_RE.findall((s or "").lower()))
        return pa.table(
            {"token": list(c.keys()), "pn": pa.array(list(c.values()), pa.int64())}
        )

    agg = (
        ray.data.read_parquet(input_path, columns=[column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
    )
    return dict(zip(agg["token"], agg["n"]))


def _load_wordlist(path: str | None):
    if path is None:
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    cols = t.column_names
    if "n" in cols:
        return dict(zip(t["token"].to_pylist(), t["n"].to_pylist()))
    return {w: 1 for w in t[cols[0]].to_pylist()}


def cmd_hydra(args) -> dict:
    """Hyphenation repair (ref program: hydra; unigram list from
    --wordlist or derived from the input corpus)."""
    ray = _ray()
    import ray.data

    from texrex_ray.stages.postproc import UnigramLM, hydra_stage

    counts = _load_wordlist(args.wordlist) or _unigrams(ray, args.input, args.column)
    stage = hydra_stage(UnigramLM(counts), col=args.column, german=args.german)
    ds = ray.data.read_parquet(args.input).map_batches(stage, batch_format="pyarrow")
    ds.write_parquet(args.out)
    return {"rows": ds.count(), "out": args.out}


def cmd_rofl(args) -> dict:
    """Run-together-line repair (ref program: rofl)."""
    ray = _ray()
    import ray.data

    from texrex_ray.stages.postproc import rofl_stage

    counts = _load_wordlist(args.wordlist) or _unigrams(ray, args.input, args.column)
    stage = rofl_stage(set(counts), col=args.column, limit=args.limit)
    ds = ray.data.read_parquet(args.input).map_batches(stage, batch_format="pyarrow")
    ds.write_parquet(args.out)
    return {"rows": ds.count(), "out": args.out}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="texrex_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("texrex", help="cleaning chain over a parquet corpus")
    s.add_argument("input"); s.add_argument("out")
    s.add_argument("--minhash-k", type=int, default=64)
    s.set_defaults(fn=cmd_texrex)

    s = sub.add_parser("clarax", help="random-walk crawl (synthetic web)")
    s.add_argument("out")
    s.add_argument("--steps", type=int, default=2000)
    s.add_argument("--walkers", type=int, default=64)
    s.add_argument("--hosts", type=int, default=200)
    s.add_argument("--partitions", type=int, default=4)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--checkpoint-every", type=int, default=None)
    s.set_defaults(fn=cmd_clarax)

    s = sub.add_parser("tender", help="near-duplicate pair detection")
    s.add_argument("input"); s.add_argument("out")
    s.add_argument("--threshold", type=int, default=5)
    s.add_argument("--minhash-k", type=int, default=100)
    s.set_defaults(fn=cmd_tender)

    s = sub.add_parser("tecl", help="blacklist anti-join")
    s.add_argument("input"); s.add_argument("blacklist"); s.add_argument("out")
    s.add_argument("--id-col", default="doc_id")
    s.set_defaults(fn=cmd_tecl)

    for name, fn in (("hydra", cmd_hydra), ("rofl", cmd_rofl)):
        s = sub.add_parser(name, help=f"{name} post-processing")
        s.add_argument("input"); s.add_argument("out")
        s.add_argument("--column", default="text")
        s.add_argument("--wordlist", default=None,
                       help="parquet wordlist (token[, n]); default: derive from input")
        if name == "hydra":
            s.add_argument("--german", action="store_true")
        else:
            s.add_argument("--limit", type=int, default=3)
        s.set_defaults(fn=fn)

    args = p.parse_args(argv)
    print(json.dumps(args.fn(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
