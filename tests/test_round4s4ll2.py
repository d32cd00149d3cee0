"""Round-4 session-5 batch LL: NTT pair sums, round-number bias, exposure."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q448

def test_ntt_matches_direct_convolution():
    from texrex_ray.ops.ntt import convolve_exact

    rng = np.random.RandomState(0)
    for _ in range(20):
        x = rng.randint(0, 1000, rng.randint(1, 120)).tolist()
        y = rng.randint(0, 1000, rng.randint(1, 120)).tolist()
        assert convolve_exact(x, y) == np.convolve(x, y).astype(
            int).tolist()
    # non-power-of-two lengths and deltas
    assert convolve_exact([1], [5, 6, 7]) == [5, 6, 7]
    assert convolve_exact([0, 1], [0, 1]) == [0, 0, 1]


def test_ntt_crt_path_beyond_single_prime():
    """Values past one modulus (the r5 10x-leg failure mode) now resolve
    exactly via the 3-prime CRT path; only the ~7.8e25 CRT range raises."""
    import numpy as np
    import pytest

    from texrex_ray.ops.ntt import _CRT_BOUND, convolve_exact

    big = [60_000] * 300  # 60000^2 * 300 >> P — used to raise, now exact
    direct = [int(v) for v in np.convolve(np.array(big, object),
                                          np.array(big, object))]
    assert convolve_exact(big, big) == direct
    # mixed magnitudes across the modulus boundary, random spot check
    rng = np.random.default_rng(7)
    x = rng.integers(0, 10**9, 50).tolist()
    y = rng.integers(0, 10**9, 37).tolist()
    direct = [int(v) for v in np.convolve(np.array(x, object),
                                          np.array(y, object))]
    assert convolve_exact(x, y) == direct
    # the CRT range itself still guards loudly
    over = int((_CRT_BOUND // 2) ** 0.5) + 1
    with pytest.raises(AssertionError):
        convolve_exact([over, over], [over, over])


def test_pair_sum_query_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q448_pair_sum_ntt"](SF)
    q = np.round(pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_quantity"]
    ).to_pandas()["l_quantity"].to_numpy()).astype(int)
    from collections import Counter

    h = Counter(q.tolist())
    sums: Counter = Counter()
    for u, nu in h.items():
        for v, nv in h.items():
            sums[u + v] += nu * nv - (nu if u == v else 0)
    exp = sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["s"], got["n_pairs"])) == exp


# ------------------------------------------------------------------- q449

def test_round_number_bias_matches_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q449_round_number_bias"](SF)
    c = np.round(pq.read_table(
        f"{SF}/events.parquet", columns=["value"]
    ).to_pandas()["value"].to_numpy() * 100).astype("int64")
    assert got["n_values"].iloc[0] == len(c)
    assert got["n_whole"].iloc[0] == int((c % 100 == 0).sum())
    assert got["n_half"].iloc[0] == int((c % 50 == 0).sum())
    assert got["n_dime"].iloc[0] == int((c % 10 == 0).sum())
    assert got["n_psych"].iloc[0] == int((c % 100 == 99).sum())
    # nesting: whole => half => dime
    assert (got["n_whole"].iloc[0] <= got["n_half"].iloc[0]
            <= got["n_dime"].iloc[0])


# ------------------------------------------------------------------- q450

def test_exposure_closed_forms():
    from texrex_ray.stages.images import ExposureClipping

    ec = ExposureClipping()
    # flat mid-gray: nothing clips, zero range
    assert ec._census(np.full((10, 10, 3), 100, np.uint8)) == (
        100, 0, 0, 0)
    # half black / half white: both tails clip, full range used
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, 5:] = 255
    assert ec._census(img) == (100, 50, 50, 765)


def test_exposure_matches_sorted_percentile_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import ExposureClipping

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    ec = ExposureClipping()
    for raw in imgs["bytes"][:5]:
        px = decode_image(raw)
        lum = sorted(px.astype(np.int64).sum(axis=2).ravel().tolist())
        n = len(lum)
        exp = (
            n,
            sum(1 for v in lum if v <= 15),
            sum(1 for v in lum if v >= 750),
            lum[(99 * (n - 1)) // 100] - lum[(1 * (n - 1)) // 100],
        )
        assert ec._census(px) == exp
