"""Heavy hitters via mergeable top-m + residual-bound summaries.

The deterministic cousin of q56's count-min pass: each batch folds its
EXACT local counts into a fixed-size summary — the top-``m`` items plus
one scalar ``resid`` = the largest DISCARDED count.  For any item x and
block i,

    c_i(x)  <=  summary_i[x]   if x kept   (equality — counts are exact)
    c_i(x)  <=  resid_i        if x cut    (it lost to the kept top-m)

so ``upper(x) = Σ_kept c_i(x) + Σ_cut resid_i`` NEVER underestimates
any OBSERVED item.  An item cut in EVERY block is invisible to the
merge, and its count can reach ``Σ resid_i`` — so the candidate set is
a guaranteed superset of the true heavy hitters iff
``threshold > Σ resid_i`` (the classic SpaceSaving N/m precondition in
mergeable form).  The op CHECKS that condition at runtime: when the
summaries cannot certify completeness it falls back LOUDLY to an exact
keyed count (no silent caps contract) — undersized ``m`` costs a
shuffle, never a wrong answer.  Summaries merge by concatenation, so
the driver reduces ``n_blocks · (m+1)`` rows, never the stream.  An
exact ``pc.is_in``-prefiltered count pass then verifies candidates —
sketch error cannot reach the output.

Why both sketches exist: CMS (ops/… q56) is O(1)-sized regardless of m
but needs hashing and over-counts by collision; top-m+residual is
collision-free, deterministic, and keeps the actual item strings —
the right shape when the candidate report itself must be readable.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def topm_summary(counts: Counter, m: int) -> tuple[list[tuple[str, int]], int]:
    """(kept (item, count) list, resid) — top-m by (count desc, item asc);
    resid = max discarded count (0 when nothing was discarded)."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = ranked[:m]
    resid = ranked[m][1] if len(ranked) > m else 0
    return kept, resid


def heavy_hitters(
    ds: ray.data.Dataset,
    items_of: Callable[[pa.Table], list[str]],
    *,
    threshold: int,
    m: int = 1024,
) -> pd.DataFrame:
    """(item, n) with exact n >= threshold, candidates via summaries.

    ``items_of`` extracts the item stream from a batch (one entry per
    occurrence).  Three passes: summary partials -> driver candidate
    reduce (n_blocks·(m+1) rows) -> exact prefiltered count.
    """

    def summarize(t: pa.Table) -> pa.Table:
        c = Counter(items_of(t))
        kept, resid = topm_summary(c, m)
        items = [k for k, _ in kept]
        cnts = [v for _, v in kept]
        return pa.table(
            {
                "item": pa.array(items + [""], pa.string()),
                "c": pa.array(cnts + [0], pa.int64()),
                # per-block resid rides every row; the "" sentinel row
                # carries it even for blocks whose kept list is empty
                "r": pa.array([resid] * (len(items) + 1), pa.int64()),
                "blk": pa.array([1] * len(items) + [0], pa.int8()),
            }
        )

    ds = ds.materialize()  # both passes reuse the input
    parts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    sent = parts[parts["blk"] == 0]
    total_resid = int(sent["r"].sum())
    if total_resid >= threshold:
        # an everywhere-cut item could still reach the threshold: the
        # sketch cannot certify completeness -> LOUD exact fallback
        import logging

        logging.getLogger(__name__).warning(
            "topm summaries cannot certify threshold=%d (sum of residuals "
            "%d >= threshold); falling back to an exact keyed count — "
            "raise m to re-enable the sketch path", threshold, total_resid,
        )
        return _exact_heavy_hitters(ds, items_of, threshold)
    kept = parts[parts["blk"] == 1]
    agg = kept.groupby("item").agg(c=("c", "sum"), rp=("r", "sum"))
    agg["upper"] = agg["c"] + (total_resid - agg["rp"])
    cand = sorted(agg.index[agg["upper"] >= threshold])
    if not cand:
        return pd.DataFrame(
            {"item": pd.Series([], dtype="object"), "n": pd.Series([], dtype="int64")}
        )

    cand_ref = ray.put(set(cand))

    def exact_partial(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        c = Counter(x for x in items_of(t) if x in cs)
        return pa.table(
            {
                "item": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .to_pandas()  # result-sized: |candidates| × n_blocks rows max
        .groupby("item", as_index=False)["n"]
        .sum()
    )
    out = exact[exact["n"] >= threshold].sort_values(
        ["n", "item"], ascending=[False, True]
    )
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def _exact_heavy_hitters(
    ds: ray.data.Dataset,
    items_of: Callable[[pa.Table], list[str]],
    threshold: int,
) -> pd.DataFrame:
    """Exact keyed count (the fallback): combiner partials -> one
    item-keyed bucketed exchange -> threshold filter."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    def count_partial(t: pa.Table) -> pa.Table:
        c = Counter(items_of(t))
        return pa.table(
            {
                "item": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    total = bucketed_groupby(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        "item",
        lambda g: g.groupby("item", as_index=False)["n"].sum(),
    ).to_pandas()
    out = total[total["n"] >= threshold].sort_values(
        ["n", "item"], ascending=[False, True]
    )
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)
