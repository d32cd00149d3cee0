"""Round-4 session-5 batch GG: static tiles, hapax census, temporal SSIM."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q433

def test_static_tiles_closed_forms():
    from texrex_ray.stages.av import StaticTiles

    st = StaticTiles()
    # fully static clip
    fr = np.stack([np.full((8, 8, 3), 50, np.uint8)] * 4)
    assert st._census(fr) == (4, 4, 0)
    # one tile flashes once: 3 of 4 tiles stay static
    fr = np.stack([np.full((8, 8, 3), 50, np.uint8) for _ in range(4)])
    fr[2, :4, :4] = 200
    n, s, mx = st._census(fr)
    assert (n, s) == (4, 3)
    assert mx == (200 - 50) * 3 * 16  # summed-channel delta x tile px
    # jitter below threshold still counts as static
    fr = np.stack([np.full((4, 4, 3), 50, np.uint8),
                   np.full((4, 4, 3), 51, np.uint8)])
    n, s, mx = st._census(fr)
    assert s == 1 and mx == 3 * 16  # 3 channels x 16 px x 1 level
    # single-frame clip: everything static by definition
    assert st._census(np.zeros((1, 8, 8, 3), np.uint8)) == (4, 4, 0)


def test_static_tiles_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.sources.av import decode_video, fixture_path
    from texrex_ray.stages.av import StaticTiles

    d = fixture_path(n=30, seed=42)
    vid = pq.read_table(os.path.join(d, "video.parquet"),
                        columns=["bytes"]).to_pandas()
    st = StaticTiles()
    T = st.T
    for raw in vid["bytes"][:3]:
        frames, _ = decode_video(raw)
        n, h, w, _ = frames.shape
        th, tw = h // T, w // T
        lum = frames.astype(np.int64).sum(axis=3)
        n_static = 0
        mx = 0
        for by in range(th):
            for bx in range(tw):
                sums = [int(lum[f, by * T:by * T + T,
                              bx * T:bx * T + T].sum())
                        for f in range(n)]
                rng = max(sums) - min(sums)
                if rng <= st.JITTER * T * T:
                    n_static += 1
                mx = max(mx, rng)
        assert st._census(frames) == (th * tw, n_static, mx)


# ------------------------------------------------------------------- q434

def test_hapax_census_matches_pandas_twin(ray_session):
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q434_hapax_census"](SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    tok_re = re.compile(r"[a-z]+")
    for _, row in got.iterrows():
        sub = docs[docs["source"] == row["source"]]
        c: Counter = Counter()
        for t in sub["text"]:
            c.update(tok_re.findall((t or "").lower()))
        assert row["n_types"] == len(c)
        assert row["n_tokens"] == sum(c.values())
        assert row["n_hapax"] == sum(1 for v in c.values() if v == 1)
    # invariant: hapax <= types <= tokens
    assert (got["n_hapax"] <= got["n_types"]).all()
    assert (got["n_types"] <= got["n_tokens"]).all()


# ------------------------------------------------------------------- q435

def test_temporal_ssim_closed_forms():
    from texrex_ray.stages.av import TemporalSsim

    ts = TemporalSsim()
    # identical textured frames: SSIM exactly 1e6 per tile
    base = np.tile(np.arange(16, dtype=np.uint8) * 15, (16, 1))
    fr = np.stack([np.stack([base] * 3, axis=2)] * 3)
    n_pairs, n_tiles, tot, mn = ts._census(fr)
    assert (n_pairs, n_tiles) == (2, 8)
    assert tot == 8 * 1_000_000 and mn == 1_000_000
    # a hard cut between uncorrelated noise frames: SSIM ~ 0
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    _, _, tot, mn = ts._census(np.stack([a, b]))
    assert abs(tot) < 1_000_000  # far below the 4e6 of identity
    # clips with < 2 frames report the neutral minimum
    assert ts._census(np.zeros((1, 16, 16, 3), np.uint8)) == (
        0, 0, 0, 1_000_000)


def test_temporal_ssim_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.sources.av import decode_video, fixture_path
    from texrex_ray.stages.av import TemporalSsim

    d = fixture_path(n=30, seed=42)
    vid = pq.read_table(os.path.join(d, "video.parquet"),
                        columns=["bytes"]).to_pandas()
    ts = TemporalSsim()
    C1, C2, T = ts.C1, ts.C2, ts.T
    for raw in vid["bytes"][:2]:
        frames, _ = decode_video(raw)
        n, h, w, _ = frames.shape
        th, tw = h // T, w // T
        lum = (frames.astype(np.int64).sum(axis=3) // 3).tolist()
        npix, nn = T * T, (T * T) ** 2
        tot, mn = 0, None
        for p in range(n - 1):
            for by in range(th):
                for bx in range(tw):
                    a = b = aa = bb = ab = 0
                    for y in range(by * T, by * T + T):
                        for x in range(bx * T, bx * T + T):
                            u, v = lum[p][y][x], lum[p + 1][y][x]
                            a += u
                            b += v
                            aa += u * u
                            bb += v * v
                            ab += u * v
                    a1 = 2 * a * b + C1 * nn
                    a2 = 2 * (npix * ab - a * b) + C2 * nn
                    b1 = a * a + b * b + C1 * nn
                    b2 = (npix * aa - a * a) + (npix * bb - b * b) + C2 * nn
                    v2 = (a1 * a2 * 1_000_000) // (b1 * b2)
                    tot += v2
                    mn = v2 if mn is None else min(mn, v2)
        got = ts._census(frames)
        assert got == (n - 1, (n - 1) * th * tw, tot,
                       1_000_000 if mn is None else mn)
