"""Round-4 batch D: outer join, KMV sketch, sorted-neighborhood dedup,
and the sorted_positions rank helper."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from texrex_ray.ops.shuffle import sorted_positions

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ sorted_positions

def test_sorted_positions_matches_argsort(ray_session):
    rng = np.random.default_rng(7)
    keys = [f"k{int(v):06d}" for v in rng.permutation(500)]
    ds = ray.data.from_items([{"k": k} for k in keys]).repartition(7)
    out = sorted_positions(ds, "k", pos_col="rn").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["rn"].tolist() == list(range(1, 501))


def test_sorted_positions_layout_invariant(ray_session):
    keys = [f"x{i:04d}" for i in range(200)]
    a = sorted_positions(
        ray.data.from_items([{"k": k} for k in reversed(keys)]).repartition(3), "k"
    ).to_pandas()
    b = sorted_positions(
        ray.data.from_items([{"k": k} for k in keys]).repartition(11), "k"
    ).to_pandas()
    am = dict(zip(a["k"], a["rn"]))
    bm = dict(zip(b["k"], b["rn"]))
    assert am == bm


def test_sorted_positions_rejects_duplicate_keys(ray_session):
    # duplicates straddling block boundaries make ranks ambiguous — the
    # two-phase pass must refuse, not renumber silently
    ds = ray.data.from_items([{"k": "same"} for _ in range(100)]).repartition(4)
    with pytest.raises(Exception, match="overlap|share|duplicate"):
        sorted_positions(ds, "k").to_pandas()


# ------------------------------------------------------------------- q143

def test_outer_join_matches_pandas(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q143_outer_join"](SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    l = (
        orders[orders["o_orderstatus"] == "O"]
        .groupby("o_custkey")
        .agg(n_open=("o_totalprice", "size"), tot=("o_totalprice", "sum"))
        .reset_index()
        .rename(columns={"o_custkey": "custkey"})
    )
    l["open_total_c"] = (l["tot"] * 100).round().astype("int64")
    r = cust[cust["c_acctbal"] > 5000.0][["c_custkey", "c_acctbal"]].rename(
        columns={"c_custkey": "custkey"}
    )
    r["acctbal_c"] = (r["c_acctbal"] * 100).round().astype("int64")
    m = l[["custkey", "n_open", "open_total_c"]].merge(
        r[["custkey", "acctbal_c"]], on="custkey", how="outer"
    )
    m["n_open"] = m["n_open"].fillna(0).astype("int64")
    m["open_total_c"] = m["open_total_c"].fillna(0).astype("int64")
    m["acctbal_c"] = m["acctbal_c"].fillna(-1).astype("int64")
    m = m.sort_values("custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, m.astype({"custkey": "int64"}))
    # both sides must contribute unmatched rows or the test is vacuous
    assert (got["acctbal_c"] == -1).any()
    assert (got["n_open"] == 0).any()


# ------------------------------------------------------------------- q144

def test_kmv_matches_serial_recompute(ray_session):
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.pipelines.queries import KMV_K, QUERIES, _TOKEN_RE

    got = QUERIES["q144_kmv_distinct"](SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for src, grp in docs.groupby("source"):
        grams = set()
        for txt in grp["text"]:
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams |= {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        hk = np.sort(md5_lower64(sorted(grams)))
        est = (
            ((KMV_K - 1) << 64) // int(hk[KMV_K - 1])
            if len(hk) >= KMV_K
            else len(hk)
        )
        want[src] = (len(grams), est)
    for _, row in got.iterrows():
        assert want[row["source"]] == (row["n_exact"], row["kmv_est"])
    # the sketch path (not the exact fallback) must be exercised
    assert (got["n_exact"] >= KMV_K).any()
    assert (got["kmv_est"] != got["n_exact"]).any()


# ------------------------------------------------------------------- q145

def _snm_serial(docs: pd.DataFrame, w: int) -> set[tuple]:
    import re

    keyed = sorted(
        (re.sub(r"[^a-z]+", " ", (t or "").lower())[:24], i)
        for i, t in zip(docs["doc_id"], docs["text"])
    )
    gram_sets = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        toks = re.findall(r"[a-z]+", (t or "").lower())
        gram_sets[i] = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    out = set()
    ids = [i for _, i in keyed]
    for a in range(len(ids)):
        for b in range(a + 1, min(a + w + 1, len(ids))):
            ga, gb = gram_sets[ids[a]], gram_sets[ids[b]]
            inter = len(ga & gb)
            union = len(ga) + len(gb) - inter
            if inter * 2 >= union and inter > 0:
                lo, hi = sorted((ids[a], ids[b]))
                out.add((lo, hi, inter, union))
    return out


def test_sorted_neighborhood_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import QUERIES, SNM_W

    got = QUERIES["q145_sorted_neighborhood"](SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _snm_serial(docs, SNM_W)
    have = set(map(tuple, got.to_numpy()))
    assert have == want
    assert len(have) > 0
