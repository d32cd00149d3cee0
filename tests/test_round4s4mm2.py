"""Round-4 session-5 batch MM: order velocity, saturation, ZC intervals."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q451

def test_order_velocity_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q451_order_velocity"](SF)
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    cd = orders.groupby(["o_custkey", "o_orderdate"]).size()
    assert got["n_cust_days"].iloc[0] == len(cd)
    assert got["n_multi_days"].iloc[0] == int((cd > 1).sum())
    assert got["max_per_day"].iloc[0] == int(cd.max())
    assert got["n_orders"].iloc[0] == len(orders)


def test_order_velocity_detects_planted_burst(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 2, 3],
        "o_orderdate": pd.to_datetime(
            ["2024-01-01"] * 3 + ["2024-01-01", "2024-01-02"]
        ).astype("datetime64[us]"),
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(td, "orders.parquet"))
        got = QUERIES["q451_order_velocity"](td)
    assert got["n_cust_days"].iloc[0] == 3
    assert got["n_multi_days"].iloc[0] == 1
    assert got["max_per_day"].iloc[0] == 3


# ------------------------------------------------------------------- q452

def test_saturation_closed_forms():
    from texrex_ray.stages.images import SaturationCensus

    sc = SaturationCensus()
    # grayscale: zero spread, all near-gray
    assert sc._census(np.full((5, 5, 3), 80, np.uint8)) == (25, 0, 0, 25)
    # pure red: spread 200 everywhere
    red = np.zeros((5, 5, 3), np.uint8)
    red[:, :, 0] = 200
    assert sc._census(red) == (25, 25 * 200, 25 * 200 * 200, 0)
    # near-gray threshold boundary: spread exactly 8 counts as gray
    px = np.zeros((1, 2, 3), np.uint8)
    px[0, 0] = (100, 100, 108)
    px[0, 1] = (100, 100, 109)
    n, s, s2, g = sc._census(px)
    assert (s, g) == (8 + 9, 1)


def test_saturation_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import SaturationCensus

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    sc = SaturationCensus()
    for raw in imgs["bytes"][:4]:
        px = decode_image(raw)
        n = s = s2 = g = 0
        for row in px.astype(np.int64).tolist():
            for r, gg, b in row:
                sat = max(r, gg, b) - min(r, gg, b)
                n += 1
                s += sat
                s2 += sat * sat
                g += sat <= 8
        assert sc._census(px) == (n, s, s2, g)


# ------------------------------------------------------------------- q453

def test_zc_intervals_closed_forms():
    from texrex_ray.stages.av import ZeroCrossIntervals

    zc = ZeroCrossIntervals()
    # square wave period 8: all gaps are 4
    pcm = np.tile(np.array([1] * 4 + [-1] * 4, np.int16) * 100, 10)
    n, modal, mn, mx = zc._census(pcm)
    assert (modal, mx) == (4, 4) and mn == n
    # constant positive: no crossings
    assert zc._census(np.full(100, 50, np.int16)) == (0, 0, 0, 0)
    # one crossing only: no interval
    pcm = np.array([100] * 10 + [-100] * 10, np.int16)
    assert zc._census(pcm) == (0, 0, 0, 0)
    # zeros count as positive (spec): +,0,- has ONE crossing at the -
    pcm = np.array([100, 0, -100, 100], np.int16)
    n, modal, mn, mx = zc._census(pcm)
    assert n == 1  # crossings at index 2 and 3 -> one gap of 1
    assert (modal, mx) == (1, 1)


def test_zc_intervals_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.sources.av import decode_audio, fixture_path
    from texrex_ray.stages.av import ZeroCrossIntervals

    d = fixture_path(n=40, seed=42)
    aud = pq.read_table(os.path.join(d, "audio.parquet"),
                        columns=["bytes"]).to_pandas()
    zc = ZeroCrossIntervals()
    for raw in aud["bytes"][:4]:
        pcm = decode_audio(raw)[0]
        xs = pcm.tolist()
        cross = [i for i in range(1, len(xs))
                 if (xs[i] >= 0) != (xs[i - 1] >= 0)]
        if len(cross) < 2:
            assert zc._census(pcm) == (0, 0, 0, 0)
            continue
        gaps: dict[int, int] = {}
        for a, b in zip(cross, cross[1:]):
            g = b - a
            gaps[g] = gaps.get(g, 0) + 1
        modal = min(gaps, key=lambda k: (-gaps[k], k))
        assert zc._census(pcm) == (len(cross) - 1, modal, gaps[modal],
                                   max(gaps))
