"""Prefix-filtering set-similarity self-join (AllPairs / PPJoin family).

The candidate-pruning complement of q14's all-grams exchange: instead of
shuffling EVERY set element, each record exchanges only its *prefix* —
the first ``|x| - ceil(t*|x|) + 1`` elements under a global total order
(Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW 2007;
Xiao et al., "Efficient Similarity Joins for Near Duplicate Detection",
WWW 2008).  Completeness theorem: if Jaccard(A, B) >= t, the two
prefixes must share at least one element, so candidate generation keyed
on prefix elements alone misses nothing.

Reference analogue: tender's shingle self-join (trtenderapplication.pas
phase 2) exchanges every shingle; this operator is the modern
candidate-bounded alternative for explicit-threshold joins.

Scale shape:
- element order is ascending document frequency (rare first — smallest
  groups carry the candidates), built from a combiner df pass whose
  exchange is vocabulary-sized.  The order table is broadcast once via
  ``ray.put``; for corpora whose gram vocabulary outgrows a broadcast,
  ``order="hash"`` keeps completeness with ZERO broadcast (any
  consistent total order is valid — df ordering only shrinks candidate
  volume, never correctness).
- prefixes are doc-local (each row's set lives in one batch), so the
  ONLY corpus exchange is prefix rows keyed on the element — a
  ``bucketed_groupby`` whose per-task memory is a bucket, not a key.
- candidate volume is cut by the two standard PPJoin prunes before any
  pair leaves its group (length filter + positional overlap bound, both
  provably lossless), then pairs deduplicate through a second
  (pair-keyed) bucketed exchange;
- verification checks the exact integer threshold
  ``den*|∩| >= num*|∪|`` (no float compare anywhere) under a
  size-switched plan: candidate lists ≤ ``verify_broadcast_limit`` ship
  the candidate-doc sets once via ``ray.put`` (the cheap path); larger
  lists verify through two bucketed hash joins that attach each side's
  set to the pair rows — no candidate list or set dict ever lands on
  the driver.

Loud guards: an element whose prefix group exceeds ``max_group`` raises
(the df order makes this the hot-key signal), as does a candidate list
beyond ``max_candidates`` — nothing is silently dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from texrex_ray.ops.aggregate import bucketed_groupby


def prefix_length(size: int, num: int, den: int) -> int:
    """Prefix size for a set of ``size`` elements at threshold num/den:
    ``size - ceil(t*size) + 1`` (AllPairs self-join bound)."""
    return size - (num * size + den - 1) // den + 1


def prefix_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    set_col: str = "toks",
    threshold: tuple[int, int] = (1, 2),
    order: str = "df",
    max_group: int = 100_000,
    max_candidates: int = 50_000_000,
    verify_broadcast_limit: int = 200_000,
    expected_rows: int | None = None,
) -> pd.DataFrame:
    """Exact Jaccard >= num/den pairs over per-row element sets.

    ``ds`` holds one row per record with ``set_col`` a list column of
    DISTINCT elements (dedup them upstream; sizes are taken from the
    list length).  Returns (id_a, id_b, n_inter, n_union) with
    id_a < id_b, exact under integer threshold arithmetic.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0,1]: {num}/{den}")

    # ---- pass 1: element document frequencies (combiner -> vocab-sized
    # exchange).  Skipped entirely under order="hash".
    if order == "df":
        def df_partial(t: pa.Table) -> pa.Table:
            from collections import Counter
            cnt: Counter = Counter()
            for toks in t[set_col].to_pylist():
                cnt.update(toks)
            ks = list(cnt.keys())
            return pa.table({
                "el": pa.array(ks, pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            })

        df_tab = bucketed_groupby(
            ds.map_batches(df_partial, batch_format="pyarrow"),
            "el",
            lambda g: g.groupby("el", sort=False)["n"].sum().reset_index(),
            expected_rows=expected_rows,
        ).to_pandas()
        # total order: (df asc, element asc) -> dense integer rank
        df_tab = df_tab.sort_values(["n", "el"], kind="mergesort").reset_index(drop=True)
        order_ref = ray.put(dict(zip(df_tab["el"], range(len(df_tab)))))
    elif order == "hash":
        order_ref = None
    else:
        raise ValueError(f"order must be 'df' or 'hash': {order!r}")

    # ---- pass 2: per-record prefix rows (doc-local sort + slice)
    def prefix_rows(t: pa.Table) -> pa.Table:
        rank = ray.get(order_ref) if order_ref is not None else None
        els, ids, szs, poss = [], [], [], []
        for rid, toks in zip(t[id_col].to_pylist(), t[set_col].to_pylist()):
            if not toks:
                continue
            if rank is not None:
                # unseen elements (cannot happen for a self-join, but keep
                # the probe-side contract) sort last by (inf, element)
                srt = sorted(toks, key=lambda e: (rank.get(e, 1 << 60), e))
            else:
                import hashlib
                srt = sorted(
                    toks,
                    key=lambda e: hashlib.md5(e.encode()).digest(),
                )
            p = prefix_length(len(toks), num, den)
            for pos, e in enumerate(srt[:p]):
                els.append(e)
                ids.append(rid)
                szs.append(len(toks))
                poss.append(pos)
        return pa.table({
            "el": pa.array(els, pa.string()),
            "rid": pa.array(ids, pa.int64()),
            "sz": pa.array(szs, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
        })

    prefixes = ds.map_batches(prefix_rows, batch_format="pyarrow")

    # ---- candidate generation: pairs within each element's prefix group,
    # pruned by the two standard PPJoin filters (both provably safe):
    #  - length: J >= t needs den*min(|A|,|B|) >= num*max(|A|,|B|)
    #  - position: sharing e at positions (pa, pb) bounds the overlap by
    #    min(pa,pb) + min(|A|-pa, |B|-pb); J >= t needs
    #    (num+den)*overlap >= num*(|A|+|B|)
    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for el, sub in g.groupby("el", sort=False):
            n = len(sub)
            if n < 2:
                continue
            if n > max_group:
                raise RuntimeError(
                    f"prefix group for element {el!r} holds {n} records "
                    f"(> max_group={max_group}); salt or raise the cap"
                )
            order = np.argsort(sub["rid"].to_numpy())
            rid = sub["rid"].to_numpy()[order]
            sz = sub["sz"].to_numpy()[order]
            pos = sub["pos"].to_numpy()[order]
            ia, ib = np.triu_indices(n, k=1)
            sa, sb = sz[ia], sz[ib]
            lo = np.minimum(sa, sb)
            hi = np.maximum(sa, sb)
            keep = den * lo >= num * hi
            ub = np.minimum(pos[ia], pos[ib]) + np.minimum(
                sa - pos[ia], sb - pos[ib]
            )
            keep &= (num + den) * ub >= num * (sa + sb)
            outs.append(
                pd.DataFrame({"id_a": rid[ia][keep], "id_b": rid[ib][keep]})
            )
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(outs).drop_duplicates()

    cand = bucketed_groupby(
        prefixes, "el", group_pairs, expected_rows=expected_rows
    )
    # global pair dedup (prefixes overlap across elements) — pair-keyed
    # bucketed exchange, result-bounded
    cand = bucketed_groupby(
        cand, ["id_a", "id_b"], lambda g: g.drop_duplicates(),
        expected_rows=expected_rows,
    )
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise RuntimeError(
            f"{n_cand} candidate pairs (> max_candidates="
            f"{max_candidates}); raise the threshold or the cap"
        )
    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "n_inter": pd.Series([], dtype="int64"),
        "n_union": pd.Series([], dtype="int64"),
    })
    if n_cand == 0:
        return empty

    if n_cand <= verify_broadcast_limit:
        # ---- broadcast verify: ship candidate-doc sets once
        cand_df = cand.to_pandas()
        need = set(cand_df["id_a"]) | set(cand_df["id_b"])
        need_arr = pa.array(sorted(need), pa.int64())

        def keep_sets(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[id_col], value_set=need_arr)).select(
                [id_col, set_col]
            )

        sets_df = ds.map_batches(keep_sets, batch_format="pyarrow").to_pandas()
        sets_ref = ray.put({
            int(r): frozenset(t)
            for r, t in zip(sets_df[id_col], sets_df[set_col])
        })

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            sets = ray.get(sets_ref)
            inters, unions = [], []
            for a, b in zip(df["id_a"], df["id_b"]):
                sa, sb = sets[int(a)], sets[int(b)]
                i = len(sa & sb)
                inters.append(i)
                unions.append(len(sa) + len(sb) - i)
            out = df.assign(n_inter=inters, n_union=unions)
            keep = den * out["n_inter"] >= num * out["n_union"]
            return out[keep]

        verified = ray.data.from_pandas(cand_df).map_batches(
            verify, batch_format="pandas"
        )
    else:
        # ---- shuffle verify (the scale plan): join each side's token
        # set onto the candidate pairs through two bucketed hash joins —
        # no candidate list and no set dict ever lands on the driver.
        from texrex_ray.ops.join import shuffle_join

        SEP = "\x1f"  # never appears in set elements (loudly checked)

        def pack(t: pa.Table) -> pa.Table:
            packed = []
            for toks in t[set_col].to_pylist():
                if any(SEP in e for e in toks):
                    raise ValueError("set element contains the pack separator")
                packed.append(SEP.join(toks))
            return pa.table({id_col: t[id_col], "toks": pa.array(packed)})

        # list columns do not survive Ray's pandas block concat inside the
        # join; a separator-packed string does, and unpacks per batch
        sets_ds = ds.map_batches(pack, batch_format="pyarrow")
        j1 = shuffle_join(
            cand,
            sets_ds.map_batches(
                lambda t: t.rename_columns(["id_a", "toks_a"]),
                batch_format="pyarrow",
            ),
            on="id_a", expected_rows=n_cand,
        )
        j2 = shuffle_join(
            j1,
            sets_ds.map_batches(
                lambda t: t.rename_columns(["id_b", "toks_b"]),
                batch_format="pyarrow",
            ),
            on="id_b", expected_rows=n_cand,
        )

        def verify_pairs(df: pd.DataFrame) -> pd.DataFrame:
            inters, unions = [], []
            for ta, tb in zip(df["toks_a"], df["toks_b"]):
                sa = set(ta.split(SEP)) if ta else set()
                sb = set(tb.split(SEP)) if tb else set()
                i = len(sa & sb)
                inters.append(i)
                unions.append(len(sa) + len(sb) - i)
            out = df.assign(n_inter=inters, n_union=unions)
            keep = den * out["n_inter"] >= num * out["n_union"]
            return out.loc[keep, ["id_a", "id_b", "n_inter", "n_union"]]

        verified = j2.map_batches(verify_pairs, batch_format="pandas")

    out = verified.to_pandas()
    if out.empty:
        return empty
    for c in ("id_a", "id_b", "n_inter", "n_union"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
