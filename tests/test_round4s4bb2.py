"""Round-4 session-5 batch BB: grouped top-k, ordered dither, silence trim."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q418

def test_group_topk_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q418_group_topk"](SF).reset_index(drop=True)
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"]).to_pandas()
    orders["price_c"] = np.round(
        orders["o_totalprice"] * 100).astype("int64")
    exp = (
        orders.sort_values(["price_c", "o_orderkey"],
                           ascending=[False, True])
        .groupby("o_custkey", sort=False).head(2)
        .sort_values(["o_custkey", "price_c", "o_orderkey"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp["rnk"] = exp.groupby("o_custkey").cumcount() + 1
    exp = exp[["o_custkey", "rnk", "o_orderkey", "price_c"]].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # lossless truncation invariant: every customer with >=2 orders
    # contributes exactly 2 rows
    multi = orders.groupby("o_custkey").size()
    assert (got.groupby("o_custkey").size()
            == multi.clip(upper=2)).all()


def test_group_topk_combiner_truncation_is_lossless():
    """Local per-batch top-2 never drops a global top-2 row, whatever
    the partitioning: verify on an adversarial split where a group's
    global best rows land in different batches."""
    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 1],
        "o_orderkey": [10, 11, 12, 13],
        "price_c": [100, 90, 95, 85],
    })
    # split so batch A holds ranks 1,4 and batch B holds ranks 3,2
    batches = [df.iloc[[0, 3]], df.iloc[[2, 1]]]

    def topk(d):
        d = d.sort_values(["price_c", "o_orderkey"],
                          ascending=[False, True])
        return d.groupby("o_custkey", sort=False).head(2)

    survivors = pd.concat([topk(b) for b in batches])
    final = topk(survivors)
    assert sorted(final["o_orderkey"]) == [10, 12]  # the true top-2


# ------------------------------------------------------------------- q419

def test_ordered_dither_closed_forms():
    from texrex_ray.stages.images import OrderedDither, bayer_matrix

    b = bayer_matrix(8)
    assert sorted(b.ravel().tolist()) == list(range(64))
    od = OrderedDither()
    # black & white: no flips at the extremes
    assert od._census(np.zeros((8, 8, 3), np.uint8)) == (64, 0, 0)
    assert od._census(np.full((8, 8, 3), 255, np.uint8)) == (64, 64, 0)
    # uniform quarter-gray (lum=192, 2*192*64=24576): bits on where
    # (2b+1)*765 < 24576 <=> b <= 15 -> exactly 16 of 64 cells per tile
    img = np.full((8, 8, 3), 64, np.uint8)
    n, on, flips = od._census(img)
    assert (n, on) == (64, 16)
    # flat threshold is off everywhere (2*192 < 765) -> flips == n_on
    assert flips == 16


def test_ordered_dither_matches_closed_form_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import OrderedDither

    def bayer_closed(y: int, x: int) -> int:
        v = 0
        for i in range(3):
            v = (v << 2) | ((((x ^ y) >> i) & 1) << 1) | ((y >> i) & 1)
        return v

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    od = OrderedDither()
    for raw in imgs["bytes"][:4]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2).tolist()
        n = on = fl = 0
        for y, row in enumerate(lum):
            for x, v in enumerate(row):
                bb = bayer_closed(y % 8, x % 8)
                o = 2 * v * 64 > (2 * bb + 1) * 765
                f = 2 * v > 765
                n += 1
                on += o
                fl += o != f
        assert od._census(px) == (n, on, fl)


# ------------------------------------------------------------------- q420

def test_silence_trim_closed_forms():
    from texrex_ray.stages.av import SilenceTrim

    st = SilenceTrim()
    pcm = np.zeros(100, np.int16)
    pcm[30:70] = 1000
    assert st._census(pcm) == (100, 30, 30, 40)
    # fully silent: lead takes everything, trail zero (no double count)
    assert st._census(np.zeros(50, np.int16)) == (50, 50, 0, 0)
    # fully loud
    assert st._census(np.full(50, 5000, np.int16)) == (50, 0, 0, 50)
    # threshold boundary: |x| == 64 is still silent, 65 is not
    pcm = np.full(10, 64, np.int16)
    assert st._census(pcm)[1] == 10
    pcm[5] = 65
    assert st._census(pcm) == (10, 5, 4, 1)


def test_silence_trim_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q420_silence_trim"](SF)
    assert got["n_clips"].sum() == 40
    assert ((got["sum_lead"] + got["sum_trail"] + got["sum_active"])
            == got["n_samples"]).all()
