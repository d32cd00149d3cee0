"""Round-4 session-4 batch G: interpolation rank, residual bound, t-closeness."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q355

def test_interpolation_rank_matches_numpy(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q355_interpolation_rank"](SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice"])
    x = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    xs = np.sort(x)
    n = len(x)
    lo, hi = int(xs[0]), int(xs[-1])
    # true RANK (ties share): 1 + count strictly smaller
    uniq, counts = np.unique(xs, return_counts=True)
    smaller = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rnk = smaller + 1
    pred = (uniq - lo) * (n - 1) // (hi - lo) + 1
    err = np.abs(rnk - pred)
    assert int(got["n_rows"]) == n
    assert int(got["n_distinct"]) == len(uniq)
    assert int(got["max_abs_err"]) == int(err.max())
    assert int(got["sum_abs_err"]) == int((err * counts).sum())


# ------------------------------------------------------------------- q356

def test_huffman_twins_and_conventions():
    from texrex_ray.stages.images import (huffman_bits_heap,
                                          huffman_bits_twoqueue)

    rng = np.random.default_rng(9)
    for _ in range(200):
        h = rng.integers(0, 100, rng.integers(1, 30))
        assert huffman_bits_heap(h) == huffman_bits_twoqueue(h)
    assert huffman_bits_heap(np.array([0, 0])) == 0
    assert huffman_bits_heap(np.array([7])) == 7          # 1 bit/symbol
    assert huffman_bits_heap(np.array([3, 5])) == 8       # 1 bit each
    assert huffman_bits_heap(np.array([1, 1, 2])) == 6    # 2+2+2


def test_residual_bound_query_shape(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q356_residual_coding_bound"](SF)
    assert int(got["n_images"].sum()) == 300
    # prediction must help: bound strictly below 8 bits/px
    assert (got["sum_huff_bits"] < got["sum_raw_bits"]).all()
    assert (got["ratio_ppm"] < 1_000_000).all()
    assert (got["ratio_ppm"] > 0).all()


# ------------------------------------------------------------------- q357

def test_t_closeness_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q357_t_closeness"](SF)
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    band = (
        np.round(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
        + 100_000
    ) // 100_000
    df = pd.DataFrame({"grp": cust["c_nationkey"].astype(np.int64),
                       "band": band})
    bands = sorted(df["band"].unique())
    m = len(bands)
    nn = len(df)
    glob = df["band"].value_counts().reindex(bands, fill_value=0)
    ca = glob.cumsum().tolist()
    rows = []
    for g in sorted(df["grp"].unique()):
        sub = df[df["grp"] == g]["band"].value_counts().reindex(
            bands, fill_value=0)
        cg = sub.cumsum().tolist()
        n_g = int(sub.sum())
        num = sum(abs(int(a) * nn - int(b) * n_g)
                  for a, b in zip(cg, ca))
        rows.append((int(g), n_g, num * 1_000_000 // (n_g * nn * (m - 1))))
    want = pd.DataFrame(rows, columns=["grp", "n_g", "t_ppm"]).astype(
        "int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # sanity: t in [0, 1e6]
    assert (want["t_ppm"] >= 0).all() and (want["t_ppm"] <= 1_000_000).all()
