"""Round-4 session-5 batch FF: crack perimeter, Kendall tau, keyword chroma."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q430

def test_crack_perimeter_closed_forms():
    from texrex_ray.stages.images import CrackPerimeter

    cp = CrackPerimeter()
    # solid 8x8 square: A=64, P=32, compactness exactly 16e6
    img = np.zeros((20, 20, 3), np.uint8)
    img[4:12, 4:12] = 255
    assert cp._census(img) == (64, 32, 16_000_000)
    # 1px x 10 line: A=10, P=22 (filament: far above 16e6)
    img = np.zeros((20, 20, 3), np.uint8)
    img[5, 3:13] = 255
    a, p, c = cp._census(img)
    assert (a, p) == (10, 22) and c > 16_000_000
    # border-touching blob counts its border cracks
    img = np.zeros((6, 6, 3), np.uint8)
    img[0:2, 0:2] = 255
    assert cp._census(img) == (4, 8, 16_000_000)
    # only the LARGEST component is measured
    img = np.zeros((20, 20, 3), np.uint8)
    img[2:10, 2:10] = 255      # 64 px
    img[15, 15] = 255          # 1 px speck
    assert cp._census(img)[0] == 64
    # empty
    assert cp._census(np.zeros((5, 5, 3), np.uint8)) == (0, 0, 0)


def test_crack_perimeter_matches_bfs_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import CrackPerimeter

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    cp = CrackPerimeter()
    for raw in imgs["bytes"][:3]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        fg = {(y, x) for y in range(h) for x in range(w)
              if lum[y, x] >= 383}
        if not fg:
            assert cp._census(px) == (0, 0, 0)
            continue
        comps = []
        rest = set(fg)
        while rest:
            seed = min(rest)
            comp = {seed}
            stack = [seed]
            while stack:
                y, x = stack.pop()
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    q = (y + dy, x + dx)
                    if q in fg and q not in comp:
                        comp.add(q)
                        stack.append(q)
            comps.append(comp)
            rest -= comp
        best = max(comps, key=lambda c: (len(c), [-v for v in min(c)]))
        perim = sum(
            1
            for (y, x) in best
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
            if (y + dy, x + dx) not in best
        )
        a = len(best)
        assert cp._census(px) == (a, perim,
                                  perim * perim * 1_000_000 // a)


# ------------------------------------------------------------------- q431

def test_kendall_tau_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q431_kendall_tau"](SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    ev["d"] = ev["ts"].astype("datetime64[us]").dt.normalize()
    ev["v"] = np.round(ev["value"] * 100).astype("int64")
    daily = ev.groupby("d").agg(x=("v", "sum"), y=("v", "size"))
    xs = daily["x"].tolist()
    ys = daily["y"].tolist()
    n = len(xs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            conc += s > 0
            disc += s < 0
    assert got["n_days"].iloc[0] == n
    assert got["n_conc"].iloc[0] == conc
    assert got["n_disc"].iloc[0] == disc
    pairs = n * (n - 1) // 2
    assert got["n_ties"].iloc[0] == pairs - conc - disc
    # tau in [-1e6, 1e6]
    assert -1_000_000 <= got["tau_a_ppm"].iloc[0] <= 1_000_000


def test_kendall_tau_perfect_orders():
    """Sanity of the pair-count statistic on planted series."""
    def tau(xs, ys):
        n = len(xs)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (xs[i] - xs[j]) * (ys[i] - ys[j])
                conc += s > 0
                disc += s < 0
        return conc, disc

    # perfectly concordant
    assert tau([1, 2, 3, 4], [10, 20, 30, 40]) == (6, 0)
    # perfectly discordant
    assert tau([1, 2, 3, 4], [40, 30, 20, 10]) == (0, 6)
    # ties drop out
    assert tau([1, 1, 2], [5, 7, 9]) == (2, 0)


# ------------------------------------------------------------------- q432

def test_keyword_chroma_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q432_keyword_chroma"](SF)
    assert len(got) == 20
    assert got["token"].str.len().min() >= 3
    # ordering: n_images desc, token asc
    o = got[["n_images", "token"]].values.tolist()
    assert o == sorted(o, key=lambda r: (-r[0], r[1]))
    # chroma energy is bounded by 255^2 per pixel
    assert (got["sum_rg2"] <= got["sum_px"] * 255 * 255).all()
