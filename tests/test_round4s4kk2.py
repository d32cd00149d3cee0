"""Round-4 session-5 batch KK: loudness range, heavy change, quadtree."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q445

def test_loudness_range_closed_forms():
    from texrex_ray.stages.av import LoudnessRange

    lr = LoudnessRange()
    # constant signal: every frame equal -> zero range
    nf, p10, p95, lra = lr._census(np.full(1000, 500, np.int16), 1000)
    assert nf == 50 and lra == 0 and p10 == p95
    # burst in the middle: p10 silent, p95 loud
    pcm = np.zeros(1000, np.int16)
    pcm[400:600] = 1000
    nf, p10, p95, lra = lr._census(pcm, 1000)
    assert (p10, p95) == (0, 20 * 1000 * 1000)
    assert lra == p95
    # fewer samples than a frame
    assert lr._census(np.zeros(10, np.int16), 1000) == (0, 0, 0, 0)


def test_loudness_range_matches_sorted_twin():
    from texrex_ray.stages.av import LoudnessRange

    lr = LoudnessRange()
    rng = np.random.RandomState(6)
    for _ in range(4):
        sr = 16000
        pcm = rng.randint(-20000, 20000,
                          rng.randint(400, 4000)).astype(np.int16)
        nf, p10, p95, lra = lr._census(pcm, sr)
        flen = sr * 20 // 1000
        x = pcm[: nf * flen].astype(np.int64)
        es = sorted((x * x).reshape(nf, flen).sum(axis=1).tolist())
        assert p10 == es[(10 * (nf - 1)) // 100]
        assert p95 == es[(95 * (nf - 1)) // 100]
        assert lra == p95 - p10


# ------------------------------------------------------------------- q446

def test_heavy_change_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q446_heavy_change"](SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["d"] = ev["ts"].astype("datetime64[us]").dt.normalize()
    for _, row in got.iterrows():
        sub = (ev[ev["event_type"] == row["event_type"]]
               .groupby("d").size().sort_index())
        days = sub.index.astype("datetime64[us]").astype("int64")
        c = sub.to_numpy()
        best = None
        for i in range(1, len(c)):
            chg = int(c[i] - c[i - 1])
            key = (-abs(chg), int(days[i]))
            if best is None or key < best[0]:
                best = (key, int(days[i]), chg, int(c[i]))
        assert (row["day_us"], row["chg"], row["day_count"]) == best[1:]


# ------------------------------------------------------------------- q447

def test_quadtree_closed_forms():
    from texrex_ray.stages.images import QuadtreeLeaves

    qt = QuadtreeLeaves()
    # flat image: one root leaf
    assert qt._census(np.full((32, 32, 3), 70, np.uint8)) == (1, 0, 1024)
    # vertical half-split: root splits once, 4 homogeneous quadrants
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    assert qt._census(img) == (4, 1, 1024)
    # pure noise shatters to 1x1 leaves
    rng = np.random.RandomState(0)
    n, d, npx = qt._census(rng.randint(0, 256, (32, 32, 3)
                                       ).astype(np.uint8))
    assert (n, d, npx) == (1024, 5, 1024)
    # odd dimension: root cannot split
    assert qt._census(rng.randint(0, 256, (31, 32, 3)
                                  ).astype(np.uint8)) == (1, 0, 31 * 32)


def test_quadtree_matches_recursive_twin():
    import sys

    from texrex_ray.stages.images import QuadtreeLeaves

    sys.setrecursionlimit(100000)
    qt = QuadtreeLeaves()
    T = qt.T

    def leaves(lum, y0, x0, h, w, depth):
        sub = [row[x0:x0 + w] for row in lum[y0:y0 + h]]
        mn = min(min(r) for r in sub)
        mx = max(max(r) for r in sub)
        if mx - mn <= T or h % 2 or w % 2 or h == 1 or w == 1:
            return 1, depth
        n = 0
        md = 0
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            c, d2 = leaves(lum, y0 + dy * (h // 2),
                           x0 + dx * (w // 2), h // 2, w // 2,
                           depth + 1)
            n += c
            md = max(md, d2)
        return n, md

    rng = np.random.RandomState(3)
    # includes NON-SQUARE shapes — the aspect-preserving tiling is the
    # spec (square 2x2-pixel pyramids diverge here)
    for shape in ((128, 32), (32, 64), (64, 64), (48, 32), (30, 20)):
        # mix flat regions and noise so the tree has structure
        px = np.full((*shape, 3), 100, np.uint8)
        px[: shape[0] // 2, : shape[1] // 2] = rng.randint(
            0, 256, (shape[0] // 2, shape[1] // 2, 3))
        lum = px.astype(np.int64).sum(axis=2)
        got = qt._census(px)
        exp = leaves(lum.tolist(), 0, 0, *shape, 0)
        assert (got[0], got[1]) == exp, shape
