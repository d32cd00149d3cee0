"""Round-4 session-5 batch U: SSIM audit, template match, LBP texture."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q397

def test_ssim_flat_image_is_perfect():
    from texrex_ray.stages.images import SsimAudit

    sa = SsimAudit()
    # flat image: box-downsample -> nearest-upsample reproduces it
    # exactly, so every tile's SSIM is exactly 1.0 = 1e6 ppm
    flat = np.full((16, 16, 3), 123, np.uint8)
    nt, sm, mn = sa._census(flat)
    assert (nt, sm, mn) == (4, 4_000_000, 1_000_000)
    # 1-px checkerboard is destroyed by the 2x box filter: the
    # reconstruction is flat (zero variance) while the original has
    # full variance -> structure term collapses, SSIM far below 1
    cb = np.zeros((16, 16, 3), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    nt, sm, mn = sa._census(cb)
    assert nt == 4 and mn < 100_000
    # tiny image: no full tile — min stays the NEUTRAL SSIM identity so a
    # tileless image can never drag the per-format Min aggregate to 0
    assert sa._census(np.zeros((4, 4, 3), np.uint8)) == (0, 0, 1_000_000)


def test_ssim_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import SsimAudit

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    sa = SsimAudit()
    C1, C2, T = sa.C1, sa.C2, sa.T
    for raw in imgs["bytes"][:6]:
        px = decode_image(raw)
        lum = (px.astype(np.int64).sum(axis=2) // 3).tolist()
        h2, w2 = (len(lum) // 2) * 2, (len(lum[0]) // 2) * 2
        rec = [[0] * w2 for _ in range(h2)]
        for y in range(0, h2, 2):
            for x in range(0, w2, 2):
                m = (lum[y][x] + lum[y][x + 1]
                     + lum[y + 1][x] + lum[y + 1][x + 1]) // 4
                rec[y][x] = rec[y][x + 1] = rec[y + 1][x] = rec[y + 1][x + 1] = m
        th, tw = h2 // T, w2 // T
        n, nn = T * T, T * T * T * T
        total, mn = 0, None
        for by in range(th):
            for bx in range(tw):
                sx = sy = sxx = syy = sxy = 0
                for yy in range(by * T, by * T + T):
                    for xx in range(bx * T, bx * T + T):
                        a, b = lum[yy][xx], rec[yy][xx]
                        sx, sy = sx + a, sy + b
                        sxx, syy, sxy = sxx + a * a, syy + b * b, sxy + a * b
                a1 = 2 * sx * sy + C1 * nn
                a2 = 2 * (n * sxy - sx * sy) + C2 * nn
                b1 = sx * sx + sy * sy + C1 * nn
                b2 = (n * sxx - sx * sx) + (n * syy - sy * sy) + C2 * nn
                v = (a1 * a2 * 1_000_000) // (b1 * b2)
                total += v
                mn = v if mn is None else min(mn, v)
        assert sa._census(px) == (th * tw, total, mn)


# ------------------------------------------------------------------- q398

def test_template_match_finds_planted_template():
    from texrex_ray.stages.images import TemplateMatch

    tm = TemplateMatch()
    rng = np.random.RandomState(9)
    lum_val = rng.randint(0, 80, (32, 32)).astype(np.uint8)
    px = np.stack([lum_val] * 3, axis=2)
    # plant the exact template at a stride-aligned position (12, 20):
    # luminance (r+g+b)//3 of a replicated plane returns the plane
    tpl = tm.tmpl.astype(np.uint8)
    px[12:20, 20:28, 0] = tpl
    px[12:20, 20:28, 1] = tpl
    px[12:20, 20:28, 2] = tpl
    by, bx, ssd = tm._census(px)
    assert (by, bx, ssd) == (12, 20, 0)
    # image smaller than the template
    assert tm._census(np.zeros((4, 4, 3), np.uint8)) == (-1, -1, -1)
    # ties break to the first grid position row-major: constant image
    # has equal SSD everywhere
    flat = np.full((16, 16, 3), 50, np.uint8)
    by, bx, _ = tm._census(flat)
    assert (by, bx) == (0, 0)


def test_template_match_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import TemplateMatch

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    tm = TemplateMatch()
    T, S = tm.t, tm.stride
    for raw in imgs["bytes"][:6]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2) // 3
        h, w = lum.shape
        best, by, bx = None, -1, -1
        for y in range(0, h - T + 1, S):
            for x in range(0, w - T + 1, S):
                ssd = int(((lum[y:y + T, x:x + T] - tm.tmpl) ** 2).sum())
                if best is None or ssd < best:
                    best, by, bx = ssd, y, x
        assert tm._census(px) == (by, bx, best)


# ------------------------------------------------------------------- q399

def test_lbp_closed_forms():
    from texrex_ray.stages.images import LbpTexture

    lt = LbpTexture()
    # flat image: every neighbor >= center -> code 255 everywhere;
    # 255 has 0 circular transitions -> uniform
    flat = np.full((6, 6, 3), 99, np.uint8)
    n, u, hist = lt._census(flat)
    assert (n, u) == (16, 16)
    assert hist[255] == 16 and hist.sum() == 16
    # horizontal ramp: left neighbors below, right neighbors >=.
    # bits (tl,t,tr,r,br,b,bl,l) -> tr|r|br and t|b set:
    # code = 0b00111110 = 62, two circular transitions -> uniform
    ramp = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1))
    ramp = np.stack([ramp] * 3, axis=2)
    n, u, hist = lt._census(ramp)
    assert hist[0b00111110] == n and u == n
    # tiny image: no interior
    assert lt._census(np.zeros((2, 5, 3), np.uint8))[0] == 0


def test_lbp_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import LbpTexture

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    lt = LbpTexture()
    offs = ((-1, -1), (-1, 0), (-1, 1), (0, 1),
            (1, 1), (1, 0), (1, -1), (0, -1))

    def uniform(code: int) -> bool:
        bits = [(code >> i) & 1 for i in range(8)]
        return sum(bits[i] != bits[(i + 1) % 8] for i in range(8)) <= 2

    for raw in imgs["bytes"][:4]:
        px = decode_image(raw)
        lum = (px.astype(np.int64).sum(axis=2) // 3).tolist()
        h, w = len(lum), len(lum[0])
        hist = [0] * 256
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                c = lum[y][x]
                code = 0
                for i, (dy, dx) in enumerate(offs):
                    if lum[y + dy][x + dx] >= c:
                        code |= 1 << i
                hist[code] += 1
        n, u, got_hist = lt._census(px)
        assert n == (h - 2) * (w - 2)
        assert got_hist.tolist() == hist
        assert u == sum(hist[c] for c in range(256) if uniform(c))


def test_lbp_query_shape(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q399_lbp_texture"](SF)
    assert list(got.columns) == ["fmt", "n_images", "n_px", "n_uniform",
                                 "top_code", "top_count"]
    assert got["n_images"].sum() == 300
    assert (got["n_uniform"] <= got["n_px"]).all()
    assert got["top_code"].between(0, 255).all()
