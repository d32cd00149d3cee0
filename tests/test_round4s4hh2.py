"""Round-4 session-5 batch HH: Walsh compaction, relational division, GOP."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q436

def test_walsh_compaction_closed_forms():
    from texrex_ray.stages.av import WalshCompaction

    wc = WalshCompaction()
    # constant signal: all energy in ONE coefficient -> top8 == total
    n, t8, tt = wc._census(np.full(128, 500, np.int16))
    assert n == 2 and t8 == tt > 0
    # random noise never fully compacts
    rng = np.random.RandomState(1)
    n, t8, tt = wc._census(rng.randint(-5000, 5000, 640).astype(np.int16))
    assert 0 < t8 < tt
    # Parseval on the total side: total == 64 * sum(x^2)
    pcm = rng.randint(-3000, 3000, 192).astype(np.int16)
    _, _, tt = wc._census(pcm)
    x = pcm[:192].astype(np.int64)
    assert tt == 64 * int((x * x).sum())


def test_walsh_compaction_matches_sorted_twin():
    from texrex_ray.stages.av import WalshCompaction

    H = np.array([[1]], dtype=np.int64)
    while H.shape[0] < 64:
        H = np.block([[H, H], [H, -H]])
    wc = WalshCompaction()
    rng = np.random.RandomState(2)
    for _ in range(4):
        pcm = rng.randint(-20000, 20000,
                          rng.randint(64, 600)).astype(np.int16)
        n, t8, tt = wc._census(pcm)
        fr = pcm[: n * 64].astype(np.int64).reshape(n, 64)
        e = (fr @ H.T) ** 2
        exp_t8 = sum(sum(sorted(row)[-8:]) for row in e.tolist())
        assert (t8, tt) == (exp_t8, int(e.sum()))


# ------------------------------------------------------------------- q437

def test_relational_division_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q437_relational_division"](SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]
                           ).to_pandas()
    region = pq.read_table(f"{SF}/region.parquet",
                           columns=["r_regionkey"]).to_pandas()
    df = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
          .merge(cust, left_on="o_custkey", right_on="c_custkey")
          .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    cov = df.groupby("l_suppkey")["n_regionkey"].nunique()
    winners = sorted(cov[cov == len(region)].index)
    assert got["s_suppkey"].tolist() == winners
    assert (got["n_regions"] == len(region)).all()


def test_relational_division_synthetic_partial_coverage(ray_session):
    """A supplier missing one region must be excluded."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    with tempfile.TemporaryDirectory() as td:
        def w(name, df):
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           os.path.join(td, f"{name}.parquet"))

        w("region", pd.DataFrame({"r_regionkey": [0, 1]}))
        w("nation", pd.DataFrame({"n_nationkey": [0, 1],
                                  "n_regionkey": [0, 1]}))
        w("customer", pd.DataFrame({"c_custkey": [10, 11],
                                    "c_nationkey": [0, 1]}))
        w("orders", pd.DataFrame({"o_orderkey": [100, 101],
                                  "o_custkey": [10, 11]}))
        # supplier 1 ships to both regions, supplier 2 only region 0
        w("lineitem", pd.DataFrame({
            "l_orderkey": [100, 101, 100],
            "l_suppkey": [1, 1, 2],
        }))
        got = QUERIES["q437_relational_division"](td)
    assert got["s_suppkey"].tolist() == [1]


# ------------------------------------------------------------------- q438

def test_gop_delta_closed_forms():
    from texrex_ray.stages.av import GopDeltaBound

    gd = GopDeltaBound()
    # static clip: zero delta
    fr = np.stack([np.full((8, 8, 3), 9, np.uint8)] * 4)
    assert gd._census(fr) == (64, 0, 4)
    # one pixel flips on then off: 2 delta pixels
    fr = np.stack([np.zeros((8, 8, 3), np.uint8)] * 3)
    fr[1, 2, 2] = 9
    assert gd._census(fr) == (64, 2, 3)
    # full-frame cut: every pixel changes once
    a = np.zeros((4, 4, 3), np.uint8)
    b = np.full((4, 4, 3), 200, np.uint8)
    assert gd._census(np.stack([a, b])) == (16, 16, 2)
    # single frame: keyframe only
    assert gd._census(np.zeros((1, 4, 4, 3), np.uint8)) == (16, 0, 1)


def test_gop_delta_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q438_gop_delta_bound"](SF)
    assert got["n_clips"].sum() == 30
    # delta cannot exceed px * (frames - clips) (every pixel changing
    # every non-key frame)
    assert (got["sum_delta_px"] <= (got["sum_frames"] - got["n_clips"])
            * (got["sum_key_px"] / got["n_clips"])).all()
