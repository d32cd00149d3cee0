"""Round-4 session-5 batch CC: ADPCM audit, shape moments, byte uniformity."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q421

def test_adpcm_closed_forms():
    from texrex_ray.stages.av import AdpcmAudit

    aa = AdpcmAudit()
    # constant signal: diff 0, step 7>>3 == 0 -> perfect round-trip
    assert aa._census(np.full(128, 1000, np.int16)) == (2, 0, 0)
    # slope-4 ramp: code 3 reconstructs delta 3+1 = 4 exactly at step 7
    pcm = (np.arange(128) * 4).astype(np.int16)
    assert aa._census(pcm) == (2, 0, 0)
    # tail shorter than a block is dropped
    assert aa._census(np.zeros(63, np.int16)) == (0, 0, 0)
    # noise cannot round-trip: nonzero error
    rng = np.random.RandomState(0)
    n, sse, mx = aa._census(rng.randint(-30000, 30000, 256
                                        ).astype(np.int16))
    assert n == 4 and sse > 0 and mx > 0


def test_adpcm_matches_scalar_state_machine():
    from texrex_ray.stages.av import _IMA_INDEX, _IMA_STEPS, AdpcmAudit

    def block_roundtrip(block):
        pred, index = block[0], 0
        sse = mx = 0
        for j in range(1, len(block)):
            step = _IMA_STEPS[index]
            diff = block[j] - pred
            sign = diff < 0
            mag = -diff if sign else diff
            code = 0
            if mag >= step:
                code |= 4
                mag -= step
            if mag >= step >> 1:
                code |= 2
                mag -= step >> 1
            if mag >= step >> 2:
                code |= 1
            delta = step >> 3
            if code & 4:
                delta += step
            if code & 2:
                delta += step >> 1
            if code & 1:
                delta += step >> 2
            pred = pred - delta if sign else pred + delta
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + _IMA_INDEX[code]))
            e = pred - block[j]
            sse += e * e
            mx = max(mx, abs(e))
        return sse, mx

    aa = AdpcmAudit()
    rng = np.random.RandomState(7)
    for amp in (300, 5000, 30000):
        pcm = rng.randint(-amp, amp, 320).astype(np.int16)
        n, sse, mx = aa._census(pcm)
        exp_sse = exp_mx = 0
        for i in range(n):
            s, m = block_roundtrip(pcm[i * 64:(i + 1) * 64].tolist())
            exp_sse += s
            exp_mx = max(exp_mx, m)
        assert (sse, mx) == (exp_sse, exp_mx)


# ------------------------------------------------------------------- q422

def test_shape_moments_closed_forms():
    from texrex_ray.stages.images import ShapeMoments

    sm = ShapeMoments()
    # horizontal bar: x-spread dominates, zero xy correlation
    img = np.zeros((20, 30, 3), np.uint8)
    img[9:12, 5:25] = 255
    n, m20, m02, m11 = sm._census(img)
    assert n == 60 and m20 > m02 and m11 == 0
    # perfect diagonal: full positive correlation, m20 == m02 == m11
    img = np.zeros((20, 20, 3), np.uint8)
    for i in range(16):
        img[i + 2, i + 2] = 255
    n, m20, m02, m11 = sm._census(img)
    assert m20 == m02 == m11 > 0
    # anti-diagonal: negative correlation
    img = np.zeros((20, 20, 3), np.uint8)
    for i in range(16):
        img[i + 2, 17 - i] = 255
    assert sm._census(img)[3] < 0
    # symmetric square: isotropic
    img = np.zeros((20, 20, 3), np.uint8)
    img[6:14, 6:14] = 255
    n, m20, m02, m11 = sm._census(img)
    assert m20 == m02 and m11 == 0


def test_shape_moments_match_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import ShapeMoments, SkeletonCensus

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    sm = ShapeMoments()
    for raw in imgs["bytes"][:4]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        t = SkeletonCensus._otsu(lum)
        pts = [(y, x) for y in range(h) for x in range(w)
               if lum[y, x] > t]
        if len(pts) * 2 > h * w:
            pts = [(y, x) for y in range(h) for x in range(w)
                   if lum[y, x] <= t]
        n = len(pts)
        s10 = sum(x for _, x in pts)
        s01 = sum(y for y, _ in pts)
        s20 = sum(x * x for _, x in pts)
        s02 = sum(y * y for y, _ in pts)
        s11 = sum(x * y for y, x in pts)
        assert sm._census(px) == (
            n, n * s20 - s10 ** 2, n * s02 - s01 ** 2, n * s11 - s10 * s01)


# ------------------------------------------------------------------- q423

def test_byte_uniformity_closed_forms():
    from texrex_ray.stages.images import ByteUniformity

    bu = ByteUniformity()
    # perfectly uniform: chi2*N = 256*sum_o2 - N^2 == 0
    raw = bytes(range(256)) * 4
    n, o2, d = bu._census(raw)
    assert (n, d) == (1024, 256)
    assert 256 * o2 - n * n == 0
    # constant byte: maximal concentration
    n, o2, d = bu._census(b"\x00" * 100)
    assert (n, o2, d) == (100, 10000, 1)
    assert bu._census(b"") == (0, 0, 0)


def test_byte_uniformity_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q423_byte_uniformity"](SF)
    assert got["n_images"].sum() == 300
    # chi2 >= 0 always: 256*sum_o2 >= (sum of per-image N)^2 only
    # per-image, but distinct counts are bounded
    assert (got["sum_distinct"] <= got["n_images"] * 256).all()
    assert (got["sum_o2"] > 0).all()
