"""Round-4 session-5 batch Z: skeleton census, colorfulness, Pareto ABC."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q412

def test_skeleton_thins_bar_to_line():
    from texrex_ray.stages.images import SkeletonCensus

    sc = SkeletonCensus()
    # thick horizontal bar thins to a ~1px line: skeleton far smaller
    # than the foreground but spanning its length
    img = np.zeros((20, 30, 3), np.uint8)
    img[8:13, 4:26] = 255
    n_fg, n_skel, it = sc._census(img)
    assert n_fg == 5 * 22
    assert 0 < n_skel <= 22
    assert it >= 2
    # an already-1px line is (almost) its own skeleton
    img = np.zeros((20, 30, 3), np.uint8)
    img[10, 4:26] = 255
    n_fg, n_skel, _ = sc._census(img)
    assert n_fg == 22 and n_skel >= 20
    # flat image: no valid Otsu split -> empty foreground
    assert sc._census(np.full((10, 10, 3), 90, np.uint8))[:2] == (0, 0)


def test_skeleton_matches_sparse_set_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import SkeletonCensus

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    sc = SkeletonCensus()
    OFFS = ((-1, 0), (-1, 1), (0, 1), (1, 1),
            (1, 0), (1, -1), (0, -1), (-1, -1))
    for raw in imgs["bytes"][:3]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        t = sc._otsu(lum)
        fg = {(y, x) for y in range(h) for x in range(w) if lum[y, x] > t}
        if len(fg) * 2 > h * w:
            fg = {(y, x) for y in range(h) for x in range(w)} - fg
        n_fg = len(fg)
        it = 0
        while it < 256:
            changed = False
            for phase in (0, 1):
                kill = []
                for (y, x) in fg:
                    nb = [1 if (y + dy, x + dx) in fg else 0
                          for dy, dx in OFFS]
                    b = sum(nb)
                    if not (2 <= b <= 6):
                        continue
                    ring = nb + [nb[0]]
                    a = sum(1 for i in range(8)
                            if ring[i] == 0 and ring[i + 1] == 1)
                    if a != 1:
                        continue
                    if phase == 0:
                        ok = (nb[0] * nb[2] * nb[4] == 0
                              and nb[2] * nb[4] * nb[6] == 0)
                    else:
                        ok = (nb[0] * nb[2] * nb[6] == 0
                              and nb[0] * nb[4] * nb[6] == 0)
                    if ok:
                        kill.append((y, x))
                if kill:
                    fg -= set(kill)
                    changed = True
            it += 1
            if not changed:
                break
        assert sc._census(px) == (n_fg, len(fg), it)


# ------------------------------------------------------------------- q413

def test_colorfulness_closed_forms():
    from texrex_ray.stages.images import Colorfulness

    cf = Colorfulness()
    # any grayscale image: rg = 0 and yb = 0 or -0.5-floor artifacts?
    # R=G=B=v: rg=0, yb = v - v = 0 exactly (floor((v+v)/2)=v)
    g = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
    n, srg, srg2, syb, syb2 = cf._census(np.stack([g] * 3, axis=2))
    assert (srg, srg2, syb, syb2) == (0, 0, 0, 0)
    # saturated red: rg = 255, yb = 127 per pixel
    red = np.zeros((5, 5, 3), np.uint8)
    red[:, :, 0] = 255
    n, srg, srg2, syb, syb2 = cf._census(red)
    assert (n, srg, srg2) == (25, 25 * 255, 25 * 255 * 255)
    assert (syb, syb2) == (25 * 127, 25 * 127 * 127)


# ------------------------------------------------------------------- q414

def test_pareto_revenue_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q414_pareto_revenue"](SF)
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    orders["r"] = np.round(orders["o_totalprice"] * 100).astype("int64")
    cust = orders.groupby("o_custkey")["r"].sum().reset_index()
    cust = cust.sort_values(["r", "o_custkey"], ascending=[False, True])
    r = [int(v) for v in cust["r"]]
    total = sum(r)
    cum = 0
    marks = {}
    for i, v in enumerate(r, start=1):
        cum += v
        for pct in (50, 80, 95):
            if pct not in marks and cum * 100 >= pct * total:
                marks[pct] = i
    assert got["n_customers"].iloc[0] == len(r)
    assert got["total_c"].iloc[0] == total
    assert got["n50"].iloc[0] == marks[50]
    assert got["n80"].iloc[0] == marks[80]
    assert got["n95"].iloc[0] == marks[95]
    assert got["top_share_ppm"].iloc[0] == r[0] * 1_000_000 // total
    # coverage thresholds are ordered
    assert marks[50] <= marks[80] <= marks[95] <= len(r)
