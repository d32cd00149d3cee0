"""Round-4 session-5 batch EE: Canny hysteresis, Walsh onsets, ALL-quantifier."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q427

def test_canny_hysteresis_closed_forms():
    from texrex_ray.stages.images import CannyHysteresis

    ch = CannyHysteresis()
    # flat image: nothing
    assert ch._census(np.full((12, 12, 3), 80, np.uint8)) == (0, 0, 0, 1)
    # hard vertical edge: strong everywhere along it -> kept == weak
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255
    ns, nw, nk, _ = ch._census(img)
    assert ns > 0 and nk == nw >= ns
    # faint isolated edge (weak but not strong, no strong seed): dies
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 60  # Sobel |gx| = 4*180 = 720 -> mag2 518400 in LO..HI
    ns, nw, nk, _ = ch._census(img)
    assert ns == 0 and nw == 0  # 518400 < LO: fully sub-threshold
    img[:, 8:] = 90  # |gx| = 4*270 = 1080 -> 1.17e6: weak, not strong
    ns, nw, nk, _ = ch._census(img)
    assert ns == 0 and nw > 0 and nk == 0  # no seeds -> all dropped


def test_canny_matches_bfs_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import CannyHysteresis

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    ch = CannyHysteresis()
    for raw in imgs["bytes"][:3]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2).tolist()
        h, w = len(lum), len(lum[0])
        strong, weak = set(), set()
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (lum[y - 1][x + 1] + 2 * lum[y][x + 1]
                      + lum[y + 1][x + 1] - lum[y - 1][x - 1]
                      - 2 * lum[y][x - 1] - lum[y + 1][x - 1])
                gy = (lum[y + 1][x - 1] + 2 * lum[y + 1][x]
                      + lum[y + 1][x + 1] - lum[y - 1][x - 1]
                      - 2 * lum[y - 1][x] - lum[y - 1][x + 1])
                m2 = gx * gx + gy * gy
                if m2 > ch.HI:
                    strong.add((y, x))
                if m2 > ch.LO:
                    weak.add((y, x))
        kept = set(strong)
        stack = list(strong)
        while stack:
            y, x = stack.pop()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    q = (y + dy, x + dx)
                    if q in weak and q not in kept:
                        kept.add(q)
                        stack.append(q)
        got = ch._census(px)
        assert got[:3] == (len(strong), len(weak), len(kept))


# ------------------------------------------------------------------- q428

def test_walsh_onsets_closed_forms():
    from texrex_ray.stages.av import WalshOnsets

    wo = WalshOnsets()
    # constant signal: zero flux everywhere -> no onsets (0 > 2*0 false)
    assert wo._census(np.full(320, 500, np.int16)) == (5, 0, 0)
    # one loud frame among quiet ones -> entering and leaving spikes
    pcm = np.zeros(64 * 6, np.int16)
    pcm[2 * 64:3 * 64] = 8000
    nf, on, mx = wo._census(pcm)
    assert nf == 6 and on == 2 and mx > 0
    # fewer than 2 frames: no flux
    assert wo._census(np.zeros(64, np.int16)) == (1, 0, 0)


def test_walsh_onsets_median_spec():
    """Median is the LOWER middle of the sorted flux list — verify the
    threshold bites exactly at flux > 2*median."""
    from texrex_ray.stages.av import WalshOnsets

    wo = WalshOnsets()
    rng = np.random.RandomState(4)
    pcm = rng.randint(-2000, 2000, 64 * 9).astype(np.int16)
    nf, on, mx = wo._census(pcm)
    # recompute via the spec
    H = np.array([[1]], dtype=np.int64)
    while H.shape[0] < 64:
        H = np.block([[H, H], [H, -H]])
    H = H[np.argsort([int((np.diff(r) != 0).sum()) for r in H])]
    fr = pcm[: nf * 64].astype(np.int64).reshape(nf, 64)
    e = (fr @ H.T) ** 2
    flux = [int(np.abs(e[i + 1] - e[i]).sum()) for i in range(nf - 1)]
    med = sorted(flux)[(len(flux) - 1) // 2]
    assert on == sum(1 for f in flux if f > 2 * med)
    assert mx == max(flux)


# ------------------------------------------------------------------- q429

def test_all_quantifier_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q429_all_quantifier"](SF)
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df["pc"] = np.round(df["o_totalprice"] * 100).astype("int64")
    for _, row in got.iterrows():
        sub = df[df["c_nationkey"] == row["nationkey"]]
        prices = sorted(sub["pc"])
        med = prices[(len(prices) + 1) // 2 - 1]
        assert row["median_c"] == med
        mins = sub.groupby("o_custkey")["pc"].min()
        assert row["n_customers"] == len(mins)
        assert row["n_all_above"] == int((mins > med).sum())
    # sanity: quantifier is restrictive
    assert (got["n_all_above"] < got["n_customers"]).all()
