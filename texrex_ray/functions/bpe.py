"""Distributed BPE vocabulary training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

BPE learns a tokenizer vocabulary by repeatedly merging the most
frequent adjacent symbol pair.  The classic formulation operates on the
WORD-TYPE table (distinct words + corpus frequencies) — the corpus text
is touched exactly once (the word-count exchange); every merge round
then runs over the vocab-sized type table:

    round r:  count adjacent symbol pairs weighted by word frequency
              (combiner partials -> one pair-vocab-sized keyed sum)
              -> driver argmax (ONE row: the winning pair)
              -> broadcast the pair, apply the merge in place, pin.

Determinism: ties on pair count break to the lexicographically smallest
(left, right).  Pair counting includes overlaps (``zip(s, s[1:])`` —
"aaa" counts (a,a) twice); merge application is greedy left-to-right —
both exactly the reference semantics, mirrored by the independent
sequential twin used as the oracle.

Scale shape: the corpus-sized work is one tokenize+count pass; each of
the ``n_merges`` rounds exchanges pair partials bounded by the symbol-
pair vocabulary (≪ corpus) and re-materializes the type table
(vocab-sized).  The end-of-word marker ``</w>`` is a distinct symbol so
word-final merges stay separate from word-internal ones.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_EOW = "</w>"
_TOKEN_RE = re.compile(r"[a-z]+")


def bpe_train(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    n_merges: int = 12,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus under ``ds``.

    Returns (rank, left, right, pair_count) — rank 0 is the first merge
    learned.  Stops early if no pair remains.
    """
    from ray.data.aggregate import Sum
    from texrex_ray.ops.aggregate import bucketed_groupby

    # 1. ONE corpus pass: word-type counts (combiner partials -> keyed sum)
    def word_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for s in t[text_col].to_pylist():
            c.update(_TOKEN_RE.findall((s or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "pc": pa.array(list(c.values()), pa.int64()),
            }
        )

    types = bucketed_groupby(
        ds.map_batches(word_partial, batch_format="pyarrow"),
        "word",
        lambda g: g.groupby("word", as_index=False)["pc"].sum(),
    )

    # 2. seed symbol sequences: characters + the end-of-word marker
    def seed(t: pa.Table) -> pa.Table:
        syms = [list(w) + [_EOW] for w in t["word"].to_pylist()]
        return pa.table(
            {
                "cnt": pc_cast_int64(t["pc"]),
                "syms": pa.array(syms, pa.list_(pa.string())),
            }
        )

    def pc_cast_int64(col):
        import pyarrow.compute as pc

        return pc.cast(col, pa.int64())

    table = types.map_batches(seed, batch_format="pyarrow").materialize()

    merges: list[dict] = []
    for rank in range(n_merges):

        def pair_partial(t: pa.Table) -> pa.Table:
            from collections import Counter

            c: Counter[tuple[str, str]] = Counter()
            cnts = t["cnt"].to_pylist()
            for syms, n in zip(t["syms"].to_pylist(), cnts):
                for p in zip(syms, syms[1:]):
                    c[p] += n
            return pa.table(
                {
                    "l": pa.array([k[0] for k in c], pa.string()),
                    "r": pa.array([k[1] for k in c], pa.string()),
                    "pc": pa.array(list(c.values()), pa.int64()),
                }
            )

        pairs = (
            table.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("pc", alias_name="n"))
            .to_pandas()  # pair-vocab-sized
        )
        if pairs.empty:
            break
        # max count, ties to lexicographically smallest (left, right)
        pairs = pairs.sort_values(
            ["n", "l", "r"], ascending=[False, True, True], kind="stable"
        )
        best = pairs.iloc[0]
        left, right, n_best = str(best["l"]), str(best["r"]), int(best["n"])
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_count": n_best}
        )
        pair_ref = ray.put((left, right))

        def apply_merge(t: pa.Table) -> pa.Table:
            lft, rgt = ray.get(pair_ref)
            fused = lft + rgt
            out = []
            for syms in t["syms"].to_pylist():
                res = []
                i = 0
                L = len(syms)
                while i < L:  # greedy left-to-right
                    if i + 1 < L and syms[i] == lft and syms[i + 1] == rgt:
                        res.append(fused)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.table(
                {
                    "cnt": t["cnt"],
                    "syms": pa.array(out, pa.list_(pa.string())),
                }
            )

        table = table.map_batches(apply_merge, batch_format="pyarrow").materialize()

    out = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
    for c in ("rank", "pair_count"):
        out[c] = out[c].astype("int64")
    return out


def bpe_train_sequential(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Independent dict-based twin (oracle for tests and the q120
    fixture) — same semantics, no Dataset machinery."""
    from collections import Counter

    seqs = {w: list(w) + [_EOW] for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter[tuple[str, str]] = Counter()
        for w, syms in seqs.items():
            n = word_counts[w]
            for p in zip(syms, syms[1:]):
                pc[p] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (lft, rgt), n_best = best
        merges.append((lft, rgt, n_best))
        fused = lft + rgt
        for w, syms in seqs.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                    res.append(fused)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            seqs[w] = res
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to ONE word, lowest-rank-first (the reference
    BPE apply rule: at each step fuse the best-ranked pair present,
    leftmost occurrence first via the greedy scan)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        lft, rgt = best_pair
        fused = lft + rgt
        res, i = [], 0
        while i < len(syms):  # greedy left-to-right for THIS pair
            if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                res.append(fused)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode_sequential(
    texts: dict, merges: list[tuple[str, str]]
) -> dict:
    """Independent per-doc twin of ``bpe_encode`` (test/fixture oracle):
    (doc_id -> (n_words, n_subwords, n_distinct_subwords))."""
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    out = {}
    for did, s in texts.items():
        words = _TOKEN_RE.findall((s or "").lower())
        subs: list[str] = []
        for w in words:
            subs.extend(_encode_word(w, ranks))
        out[did] = (len(words), len(subs), len(set(subs)))
    return out


def bpe_encode(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Distributed BPE ENCODING — the serving path of ``bpe_train``:
    tokenize every document with a learned merge table.

    Returns (doc_id, n_words, n_subwords, n_distinct_subwords) — the
    token-budget accounting a packing/mixture stage consumes (q101's
    input at subword granularity).

    Scale shape: the merge table is tokenizer-sized (30-100k rows in
    production) and rides the closure ONCE per task; each batch encodes
    only its DISTINCT words (Zipf: distinct ≪ occurrences) through a
    per-call memo, then maps occurrences through the memo — no shuffle,
    no driver state, embarrassingly parallel.  Stateful variant (merge
    table in actor ``__init__``) is a one-line swap via
    ``map_batches(EncoderCls, concurrency=)`` when the table is too big
    to ride the closure.
    """
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    ranks_ref = ray.put(ranks)

    def encode_batch(t: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        memo: dict[str, list[str]] = {}
        ids, nw, ns, nd = [], [], [], []
        for did, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            words = _TOKEN_RE.findall((s or "").lower())
            subs: list[str] = []
            for w in words:
                enc = memo.get(w)
                if enc is None:
                    enc = _encode_word(w, rk)
                    memo[w] = enc
                subs.extend(enc)
            ids.append(did)
            nw.append(len(words))
            ns.append(len(subs))
            nd.append(len(set(subs)))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_words": pa.array(nw, pa.int64()),
                "n_subwords": pa.array(ns, pa.int64()),
                "n_distinct_subwords": pa.array(nd, pa.int64()),
            }
        )

    return ds.map_batches(encode_batch, batch_format="pyarrow")
