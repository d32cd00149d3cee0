"""Round-4 session-5 batch T: Harris corners, voice activity, motion blocks."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q394

def test_harris_flat_and_corner_closed_forms():
    from texrex_ray.stages.images import HarrisCorners

    hc = HarrisCorners(thresh=1)
    # flat image: zero gradients everywhere -> no corners, resp 0
    flat = np.full((12, 12, 3), 77, np.uint8)
    n, m = hc._census(flat)
    assert (n, m) == (0, 0)
    # a straight vertical edge has rank-1 structure tensor:
    # det = 0 -> response = -trace^2 <= 0, never a corner
    edge = np.zeros((12, 12, 3), np.uint8)
    edge[:, 6:] = 255
    n, m = hc._census(edge)
    assert n == 0 and m <= 0
    # an isolated bright square corner produces positive responses
    sq = np.zeros((16, 16, 3), np.uint8)
    sq[6:, 6:] = 255
    n, m = hc._census(sq)
    assert n > 0 and m > 0


def test_harris_matches_scalar_twin():
    from texrex_ray.sources.images import decode_image
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.stages.images import HarrisCorners
    import pyarrow.parquet as pq
    import os

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    hc = HarrisCorners()
    for raw in imgs["bytes"][:8]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        # independent scalar recomputation on a fresh path
        gx = np.zeros((h, w), np.int64)
        gy = np.zeros((h, w), np.int64)
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx[y, x] = (lum[y - 1, x + 1] + 2 * lum[y, x + 1]
                            + lum[y + 1, x + 1] - lum[y - 1, x - 1]
                            - 2 * lum[y, x - 1] - lum[y + 1, x - 1])
                gy[y, x] = (lum[y + 1, x - 1] + 2 * lum[y + 1, x]
                            + lum[y + 1, x + 1] - lum[y - 1, x - 1]
                            - 2 * lum[y - 1, x] - lum[y - 1, x + 1])
        n_c, m_r, first = 0, 0, True
        for y in range(2, h - 2):
            for x in range(2, w - 2):
                sxx = int((gx[y-1:y+2, x-1:x+2] ** 2).sum())
                syy = int((gy[y-1:y+2, x-1:x+2] ** 2).sum())
                sxy = int((gx[y-1:y+2, x-1:x+2]
                           * gy[y-1:y+2, x-1:x+2]).sum())
                r = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                if r > hc.thresh:
                    n_c += 1
                m_r = r if first else max(m_r, r)
                first = False
        assert hc._census(px) == (n_c, m_r)


# ------------------------------------------------------------------- q395

def test_voice_activity_closed_forms():
    from texrex_ray.stages.av import VoiceActivity

    va = VoiceActivity()
    sr = 1000  # 20 ms frame = 20 samples
    # constant amplitude: every frame equals the mean -> nothing active
    pcm = np.full(100, 50, np.int16)
    assert va._segments(pcm, sr) == (5, 0, 0)
    # one loud burst in frame 2 -> single active frame, run 1
    pcm = np.zeros(100, np.int16)
    pcm[40:60] = 1000
    assert va._segments(pcm, sr) == (5, 1, 1)
    # two adjacent loud frames -> run 2
    pcm = np.zeros(120, np.int16)
    pcm[40:80] = 1000
    nf, na, mr = va._segments(pcm, sr)
    assert (nf, na, mr) == (6, 2, 2)
    # tail shorter than a frame is dropped
    assert va._segments(np.zeros(19, np.int16), sr) == (0, 0, 0)


def test_voice_activity_query_fmt_split(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q395_voice_activity"](SF)
    # sf0.001 -> 40 clips, every third ogg
    assert got["n_clips"].sum() == 40
    assert set(got["fmt"]) == {"ogg", "wav"}
    assert (got["sum_active"] <= got["sum_frames"]).all()
    assert (got["max_run"] >= 1).all()


# ------------------------------------------------------------------- q396

def test_motion_blocks_detects_planted_pan():
    from texrex_ray.sources.av import encode_video
    from texrex_ray.stages.av import MotionBlocks

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    # frame 2 = frame 1 rolled right by 1 -> every block moves
    frames = np.stack([base, np.roll(base, 1, axis=1)])
    mb = MotionBlocks()
    n_pairs, n_blocks, n_moving, sum_sad = mb._census(frames)
    assert (n_pairs, n_blocks) == (1, 9)
    assert n_moving == 9
    assert sum_sad == 0  # the true offset matches exactly
    # static pair: zero offset is a perfect match and (0,0) SAD is 0;
    # ties break lexicographically but only a 0-SAD nonzero offset of
    # a constant image could tie — use a textured image so no tie
    frames = np.stack([base, base])
    n_pairs, n_blocks, n_moving, sum_sad = mb._census(frames)
    assert (n_moving, sum_sad) == (0, 0)
    # roundtrip through the container codec
    from texrex_ray.sources.av import decode_video
    dec, fps = decode_video(encode_video(frames, 10))
    assert fps == 10 and np.array_equal(dec, frames)


def test_motion_blocks_matches_scalar_twin():
    from texrex_ray.sources.av import decode_video, fixture_path
    from texrex_ray.stages.av import MotionBlocks
    import pyarrow.parquet as pq
    import os

    d = fixture_path(n=30, seed=42)
    vid = pq.read_table(os.path.join(d, "video.parquet"),
                        columns=["bytes"]).to_pandas()
    mb = MotionBlocks()
    M, BS = 2, 4
    for raw in vid["bytes"][:3]:
        frames, _ = decode_video(raw)
        n, h, w, _ = frames.shape
        lum = frames.astype(np.int64).sum(axis=3)
        bh, bw = (h - 2 * M) // BS, (w - 2 * M) // BS
        n_moving = 0
        sum_sad = 0
        for f in range(n - 1):
            for by in range(bh):
                for bx in range(bw):
                    best, best_off = None, None
                    for dy in range(-M, M + 1):
                        for dx in range(-M, M + 1):
                            y0, x0 = M + by * BS, M + bx * BS
                            sad = int(np.abs(
                                lum[f, y0:y0 + BS, x0:x0 + BS]
                                - lum[f + 1, y0 + dy:y0 + dy + BS,
                                      x0 + dx:x0 + dx + BS]).sum())
                            if best is None or sad < best:
                                best, best_off = sad, (dy, dx)
                    if best_off != (0, 0):
                        n_moving += 1
                    sum_sad += best
        got = mb._census(frames)
        assert got == (n - 1, (n - 1) * bh * bw, n_moving, sum_sad)
