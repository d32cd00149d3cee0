"""Round-4 session-5 batch JJ: cross-modal tau, crest factor, byte bigrams."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q442

def test_crossmodal_tau_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q442_crossmodal_tau"]("/root/testdata/sf0.001")
    n = got["n_images"].iloc[0]
    assert n == 300
    pairs = n * (n - 1) // 2
    assert got["n_conc"].iloc[0] + got["n_disc"].iloc[0] <= pairs
    assert -1_000_000 <= got["tau_a_ppm"].iloc[0] <= 1_000_000
    # the synthetic captions are size-independent: |tau| is small
    assert abs(got["tau_a_ppm"].iloc[0]) < 200_000


# ------------------------------------------------------------------- q443

def test_crest_factor_closed_forms():
    from texrex_ray.stages.av import CrestFactor

    cf = CrestFactor()
    # constant amplitude: inverse crest exactly 1e6
    assert cf._census(np.full(100, 1000, np.int16)) == (
        100, 1000, 100 * 1000 * 1000, 1_000_000)
    # all-zero clip
    assert cf._census(np.zeros(10, np.int16)) == (10, 0, 0, 0)
    # square wave +-a: also 1e6 (peak == rms)
    sq = np.tile(np.array([700, -700], np.int16), 50)
    assert cf._census(sq)[3] == 1_000_000
    # single spike in silence: heavy peak, tiny average
    pcm = np.zeros(1000, np.int16)
    pcm[500] = 30000
    n, peak, energy, crest = cf._census(pcm)
    assert peak == 30000 and crest == energy * 1_000_000 // (
        n * peak * peak) == 1000


def test_crest_factor_matches_scalar_twin():
    from texrex_ray.stages.av import CrestFactor

    cf = CrestFactor()
    rng = np.random.RandomState(8)
    for _ in range(4):
        pcm = rng.randint(-30000, 30000,
                          rng.randint(10, 500)).astype(np.int16)
        n = len(pcm)
        peak = max(abs(int(v)) for v in pcm)
        energy = sum(int(v) * int(v) for v in pcm)
        crest = energy * 1_000_000 // (n * peak * peak) if peak else 0
        assert cf._census(pcm) == (n, peak, energy, crest)


# ------------------------------------------------------------------- q444

def test_byte_bigrams_closed_forms():
    from texrex_ray.stages.images import ByteBigrams

    bb = ByteBigrams()
    # run of one byte: a single pair code dominates
    assert bb._census(b"aaaa") == (3, 1, 0x6161, 3)
    # alternating two bytes: two codes
    n, d, top, tc = bb._census(b"ababab")
    assert (n, d) == (5, 2)
    assert top == ord("a") * 256 + ord("b") and tc == 3
    # boundary: empty and 1-byte payloads
    assert bb._census(b"") == (0, 0, -1, 0)
    assert bb._census(b"x") == (0, 0, -1, 0)
    # modal tie breaks to the smallest packed code (argmax contract)
    n, d, top, tc = bb._census(b"abcab")  # ab:2, bc:1, ca:1
    assert top == ord("a") * 256 + ord("b") and tc == 2


def test_byte_bigrams_matches_dict_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.stages.images import ByteBigrams

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    bb = ByteBigrams()
    for raw in imgs["bytes"][:4]:
        counts: dict[int, int] = {}
        bs = list(raw)
        for i in range(len(bs) - 1):
            c = bs[i] * 256 + bs[i + 1]
            counts[c] = counts.get(c, 0) + 1
        best = min(counts, key=lambda k: (-counts[k], k))
        assert bb._census(raw) == (len(bs) - 1, len(counts), best,
                                   counts[best])
