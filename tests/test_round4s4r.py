"""Round-4 session-5 batch R: the last three TPC-H shapes (Q2/Q13/Q20)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _li(cols):
    return pd.read_parquet(f"{SF}/lineitem.parquet", columns=cols)


# ------------------------------------------------------------------- q388

def test_mincost_supplier_matches_pandas_twin(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q388_mincost_supplier"](SF)

    li = _li(["l_partkey", "l_suppkey", "l_extendedprice"])
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False)[
        "l_extendedprice"].min()
    ps["supplycost_c"] = (ps["l_extendedprice"] * 100).round().astype(np.int64)
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    e = (
        ps.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(reg[reg["r_name"] == "EUROPE"],
               left_on="n_regionkey", right_on="r_regionkey")
    )
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_size", "p_type"])
    sl = part[(part["p_size"] % 10 == 0) & (part["p_type"] == "STANDARD")]
    e = e.merge(sl, left_on="l_partkey", right_on="p_partkey")
    pmin = e.groupby("p_partkey")["supplycost_c"].transform("min")
    e = e[e["supplycost_c"] == pmin].copy()
    e["s_acctbal_c"] = (e["s_acctbal"] * 100).round().astype(np.int64)
    want = (
        e.sort_values(["s_acctbal_c", "n_name", "s_name", "p_partkey"],
                      ascending=[False, True, True, True])
        .head(20)
        .reset_index(drop=True)
    )[["s_acctbal_c", "s_name", "n_name", "p_partkey", "supplycost_c"]]

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype(
            {"s_acctbal_c": "int64", "p_partkey": "int64",
             "supplycost_c": "int64"}),
        want.astype({"s_acctbal_c": "int64", "p_partkey": "int64",
                     "supplycost_c": "int64"}),
    )
    # Q2 semantics: every returned row achieves its part's min cost,
    # and ALL ties for a returned part that fit in the limit are kept.
    by_part = e.groupby("p_partkey")["supplycost_c"].min()
    for r in got.itertuples():
        assert int(r.supplycost_c) == int(by_part[r.p_partkey])


# ------------------------------------------------------------------- q389

def test_custdist_matches_left_join_twin(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q389_custdist"](SF)

    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    o = o[o["o_orderpriority"] != "4-NOT SPECIFIED"]
    merged = cust.merge(o, left_on="c_custkey", right_on="o_custkey",
                        how="left")
    c_count = merged.groupby("c_custkey")["o_custkey"].count()
    want = (
        c_count.value_counts().rename_axis("c_count")
        .reset_index(name="custdist")
        .astype({"c_count": "int64", "custdist": "int64"})
        .sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # conservation: the distribution covers every customer exactly once
    assert int(got["custdist"].sum()) == len(cust)


# ------------------------------------------------------------------- q390

def test_excess_recency_matches_exists_twin(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q390_excess_recency"](SF)

    li = _li(["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    li = li.assign(
        qty_1998=li["l_quantity"].where(li["l_shipdate"].dt.year == 1998, 0.0)
    )
    pair = li.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
        qty_total=("l_quantity", "sum"), qty_1998=("qty_1998", "sum")
    )
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
    small = set(part.loc[part["p_name"].str.startswith("small"), "p_partkey"])
    pair = pair[pair["l_partkey"].isin(small)]
    qt = (pair["qty_total"] * 100).round().astype(np.int64)
    q8 = (pair["qty_1998"] * 100).round().astype(np.int64)
    qual = set(pair.loc[q8 * 2 > qt, "l_suppkey"].astype(int))

    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    nk = int(nat.loc[nat["n_name"] == "NATION_3", "n_nationkey"].iloc[0])
    want = sorted(sup.loc[(sup["s_nationkey"] == nk)
                          & sup["s_suppkey"].isin(qual), "s_name"])
    assert got["s_name"].tolist() == want
    assert (got["n_name"] == "NATION_3").all()
    # semi-join property: one row per qualifying supplier, no dups
    assert got["s_name"].is_unique
