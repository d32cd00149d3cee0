"""Edit-distance-1 string near-dup join via deletion-neighborhood blocking.

The data-cleaning dedup class the token/shingle family cannot express:
typo-level variants ("hot gear" / "hot bear") share almost no shingles
yet are one edit apart.  Candidate generation is the SymSpell /
FastSS deletion-neighborhood trick (public algorithm, Bocek et al.
2007 "Fast Similarity Search in Large Dictionaries"): two strings are
within edit distance 1 iff they are equal, one is the other's 1-char
deletion, or they share a 1-char deletion — so blocking on
{s} ∪ del1(s) finds every true pair, and an exact verifier prunes the
false candidates (e.g. transpositions: "ab"/"ba" share deletions but
are distance 2).

Scale shape: ONE vocab-count exchange (combiner partials, the q02
pattern), then the deletion keys explode |s|+1 rows per DISTINCT value
and exchange as 64-bit HASHES (the hash-not-text discipline —
``dedup/segments.py``); each blocking group holds only the strings
sharing one deletion variant (alphabet-bounded, tiny), verified pairs
dedup on a result-sized second exchange.  Nothing all-pairs, nothing
driver-side beyond the result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from texrex_ray.functions.hashing import stable_hash64
from texrex_ray.ops.aggregate import bucketed_groupby

# blocking groups are alphabet-bounded in honest data; a group this big
# means a degenerate key (e.g. millions of equal-length serial IDs) and
# the quadratic verify inside it would be the real bug — fail loudly.
MAX_GROUP = 10_000


def edit_distance_is_1(a: str, b: str) -> bool:
    """Exact check d(a,b) == 1 without the O(nm) DP (threshold-1 walk)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by one: allow exactly one gap in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _del1_keys(s: str) -> list[str]:
    """{s} ∪ all 1-character deletions of s (the blocking keys)."""
    return [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]


def ed1_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    min_count: int = 1,
    expected_rows: int | None = None,
) -> pd.DataFrame:
    """All DISTINCT-value pairs of ``col`` at edit distance exactly 1.

    Returns (a, b, n_a, n_b) with a < b lexicographically, sorted —
    n_* are occurrence counts (≥ ``min_count``).  SQL twin: self-join
    of the vocab on ``levenshtein(a,b) = 1`` (q103's oracle).
    """

    # stage 1: vocab with counts — combiner partials, one keyed exchange
    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[col].to_pylist()).value_counts()
        return pa.table(
            {"s": pa.array(vc.index.astype(str)), "pn": pa.array(vc.to_numpy(np.int64))}
        )

    vocab = bucketed_groupby(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        "s",
        lambda g: g.groupby("s", as_index=False)["pn"].sum().rename(columns={"pn": "n"}),
        expected_rows=expected_rows,
    )
    if min_count > 1:
        vocab = vocab.filter(lambda r: r["n"] >= min_count)

    # stage 2: explode deletion keys per distinct value, exchange hashes
    def explode_keys(t: pa.Table) -> pa.Table:
        ss, ns, keys = [], [], []
        for s, n in zip(t["s"].to_pylist(), t["n"].to_pylist()):
            for k in _del1_keys(s):
                ss.append(s)
                ns.append(int(n))
                keys.append(k)
        kh = stable_hash64(keys, seed=29).astype(np.uint64)
        return pa.table(
            {
                "kh": pa.array(kh, pa.uint64()),
                "s": pa.array(ss, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        # one blocking group = strings sharing one deletion variant
        out_a, out_b, out_na, out_nb = [], [], [], []
        for _, grp in g.groupby("kh", sort=False):
            u = grp.drop_duplicates("s")
            if len(u) > MAX_GROUP:
                raise ValueError(
                    f"degenerate ed1 blocking group: {len(u)} strings share "
                    f"one deletion key (> {MAX_GROUP}); the column is not "
                    "typo-style data"
                )
            vals = list(zip(u["s"].tolist(), u["n"].tolist()))
            vals.sort()
            for i in range(len(vals)):
                a, na = vals[i]
                for j in range(i + 1, len(vals)):
                    b, nb = vals[j]
                    if edit_distance_is_1(a, b):
                        out_a.append(a)
                        out_b.append(b)
                        out_na.append(int(na))
                        out_nb.append(int(nb))
        return pd.DataFrame({"a": out_a, "b": out_b, "n_a": out_na, "n_b": out_nb})

    # keys-explode volume ≈ distinct values × (avg_len + 1)
    key_rows = (expected_rows or 0) * 16 or None
    pairs = bucketed_groupby(
        vocab.map_batches(explode_keys, batch_format="pyarrow"),
        "kh",
        verify_group,
        expected_rows=key_rows,
    )

    # stage 3: a true pair surfaces under every shared key — dedup on a
    # result-sized exchange, then sort for the deterministic contract
    out = (
        bucketed_groupby(
            pairs, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"])
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    if out.empty:  # stable empty schema for the driver contract
        return pd.DataFrame(
            {
                "a": pd.Series(dtype=str),
                "b": pd.Series(dtype=str),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
            }
        )
    for c in ("n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out[["a", "b", "n_a", "n_b"]]
