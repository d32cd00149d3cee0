"""Round-4 session-5 batch Y: Haar features, grouped mode, exposure flicker."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q409

def test_haar_closed_forms():
    from texrex_ray.stages.images import HaarFeatures

    hf = HaarFeatures()
    # flat image: every rectangle pair balances
    n2, m2, n3, m3 = hf._census(np.full((32, 32, 3), 90, np.uint8))
    assert (n2, n3) == (25 * 17, 9 * 25)
    assert (m2, m3) == (0, 0)
    # vertical half-split: max 2-rect response = one full dark block
    # against one full bright block = 8*8*765
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    _, m2, _, m3 = hf._census(img)
    assert m2 == 8 * 8 * 765
    assert m3 == 0  # columns are uniform -> 3-rect vertical balances
    # letterbox bands: strong 3-rect vertical, zero 2-rect horizontal.
    # Any 24-row window covers exactly ONE dark band (bands are 8 rows
    # at the extremes, 16 bright rows apart), so the best response is
    # |dark + bright - 2*bright| = one full block = 8*8*600
    lb = np.full((32, 32, 3), 200, np.uint8)
    lb[:8] = 0
    lb[-8:] = 0
    _, m2, _, m3 = hf._census(lb)
    assert m2 == 0 and m3 == 8 * 8 * 600
    # true 8-8-8 sandwich: dark-bright-dark maximizes the 3-rect
    sw = np.zeros((24, 32, 3), np.uint8)
    sw[8:16] = 200
    _, _, _, m3 = hf._census(sw)
    assert m3 == 2 * 8 * 8 * 600
    # smaller than one block
    assert hf._census(np.zeros((4, 4, 3), np.uint8)) == (0, 0, 0, 0)


def test_haar_matches_direct_window_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import HaarFeatures

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    hf = HaarFeatures()
    B = 8
    for raw in imgs["bytes"][:4]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        n2 = m2 = n3 = m3 = 0
        for y in range(h - B + 1):
            for x in range(w - 2 * B + 1):
                left = int(lum[y:y + B, x:x + B].sum())
                right = int(lum[y:y + B, x + B:x + 2 * B].sum())
                n2 += 1
                m2 = max(m2, abs(right - left))
        for y in range(h - 3 * B + 1):
            for x in range(w - B + 1):
                top = int(lum[y:y + B, x:x + B].sum())
                mid = int(lum[y + B:y + 2 * B, x:x + B].sum())
                bot = int(lum[y + 2 * B:y + 3 * B, x:x + B].sum())
                n3 += 1
                m3 = max(m3, abs(top + bot - 2 * mid))
        assert hf._census(px) == (n2, m2, n3, m3)


# ------------------------------------------------------------------- q410

def test_grouped_mode_matches_pandas_twin(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q410_grouped_mode"](SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for _, row in got.iterrows():
        sub = ev[ev["event_type"] == row["event_type"]]
        counts = sub.groupby("user_id").size()
        top_n = counts.max()
        top_user = counts[counts == top_n].index.min()
        assert row["n_events"] == len(sub)
        assert row["n_users"] == sub["user_id"].nunique()
        assert row["top_n"] == top_n
        assert row["top_user"] == top_user


# ------------------------------------------------------------------- q411

def test_exposure_flicker_closed_forms():
    from texrex_ray.stages.av import ExposureFlicker

    ef = ExposureFlicker()
    # static clip: no jumps, no monotone run, zero range
    frames = np.stack([np.full((8, 8, 3), 50, np.uint8)] * 4)
    assert ef._census(frames) == (4, 0, 0, 0)
    # linear fade-in: every delta positive and above threshold
    frames = np.stack([np.full((8, 8, 3), 10 * i, np.uint8)
                       for i in range(6)])
    n, j, r, rng_s = ef._census(frames)
    assert (n, j, r) == (6, 5, 5)
    assert rng_s == 50 * 3 * 64
    # strobe: every pair jumps but runs never chain
    frames = np.stack([np.full((8, 8, 3), 200 * (i % 2), np.uint8)
                       for i in range(6)])
    assert ef._census(frames) == (6, 5, 1, 200 * 3 * 64)
    # sub-threshold wobble (+-1 gray level) never counts as flicker
    frames = np.stack([np.full((8, 8, 3), 50 + (i % 2), np.uint8)
                       for i in range(6)])
    n, j, r, _ = ef._census(frames)
    assert j == 0 and r == 1


def test_exposure_flicker_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q411_exposure_flicker"](SF)
    assert got["n_clips"].sum() == 30
    assert (got["n_jumps"] <= got["n_frames"]).all()
    assert (got["max_mono_run"] < got["n_frames"]).all()
