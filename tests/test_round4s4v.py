"""Round-4 session-5 batch V: GLCM texture, exact OLS, Walsh spectrum."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q400

def test_glcm_closed_forms():
    from texrex_ray.stages.images import GlcmTexture

    g = GlcmTexture()
    # flat image: one level pairs with itself -> contrast 0,
    # homogeneity exactly n_pairs * 1e6, energy n_pairs^2
    flat = np.full((8, 8, 3), 40, np.uint8)
    np_, ct, en, hg = g._census(flat)
    assert (np_, ct, en, hg) == (112, 0, 112 * 112, 112_000_000)
    # two half-planes 8 levels apart: vertical seam pairs cost 64 each
    half = np.zeros((8, 8, 3), np.uint8)
    half[:, 4:] = 128  # level 0 vs level 8
    np_, ct, en, hg = g._census(half)
    # horizontal pairs crossing the seam: 8 rows x 1 = 8 pairs of (0,8)
    assert ct == 8 * 64
    assert np_ == 112


def test_glcm_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import GlcmTexture

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    g = GlcmTexture()
    for raw in imgs["bytes"][:6]:
        px = decode_image(raw)
        lum = (px.astype(np.int64).sum(axis=2) // 3).tolist()
        h, w = len(lum), len(lum[0])
        counts: dict[tuple[int, int], int] = {}
        for y in range(h):
            for x in range(w):
                a = lum[y][x] // 16
                if x + 1 < w:
                    b = lum[y][x + 1] // 16
                    counts[(a, b)] = counts.get((a, b), 0) + 1
                if y + 1 < h:
                    b = lum[y + 1][x] // 16
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        exp = (
            sum(counts.values()),
            sum(c * (a - b) ** 2 for (a, b), c in counts.items()),
            sum(c * c for c in counts.values()),
            sum((c * 1_000_000) // (1 + (a - b) ** 2)
                for (a, b), c in counts.items()),
        )
        assert g._census(px) == exp


# ------------------------------------------------------------------- q401

def test_ols_recovers_planted_exact_fit(ray_session):
    """On an exactly-linear synthetic table both solvers must return
    the planted coefficients exactly (residual zero => unique exact
    rational solution)."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    rng = np.random.RandomState(7)
    n = 500
    qty = rng.randint(1, 51, n)
    disc = rng.randint(0, 11, n)
    tax = rng.randint(0, 9, n)
    # y_c = 1234 + 567*qty + 89*disc - 21*tax  (exact in cents)
    y_c = 1234 + 567 * qty + 89 * disc - 21 * tax
    df = pd.DataFrame({
        "l_quantity": qty.astype(float),
        "l_extendedprice": y_c / 100.0,
        "l_discount": disc / 100.0,
        "l_tax": tax / 100.0,
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(td, "lineitem.parquet"))
        got = QUERIES["q401_ols_normal_eq"](td)
    assert got["n"].iloc[0] == n
    assert got["b0_e9"].iloc[0] == 1234 * 10**9
    assert got["b1_e9"].iloc[0] == 567 * 10**9
    assert got["b2_e9"].iloc[0] == 89 * 10**9
    assert got["b3_e9"].iloc[0] == -21 * 10**9


def test_ols_matches_cramer_twin(ray_session):
    """Distributed Gaussian-elimination path == one-pass Cramer twin
    on the real sf0.001 lineitem."""
    import math
    from fractions import Fraction

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_extendedprice",
                                "l_discount", "l_tax"]).to_pandas()
    y = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    x1 = np.round(li["l_quantity"].to_numpy()).astype(np.int64)
    x2 = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    x3 = np.round(li["l_tax"].to_numpy() * 100).astype(np.int64)
    X = np.stack([np.ones_like(x1), x1, x2, x3], axis=1)
    A = [[int(v) for v in row] for row in (X.T @ X)]
    b = [int(v) for v in (X.T @ y)]

    def det(m):
        k = len(m)
        if k == 1:
            return Fraction(m[0][0])
        return sum((-1) ** j * Fraction(m[0][j])
                   * det([row[:j] + row[j + 1:] for row in m[1:]])
                   for j in range(k))

    dA = det(A)
    exp = []
    for i in range(4):
        Ai = [row[:i] + [b[r]] + row[i + 1:] for r, row in enumerate(A)]
        exp.append(math.floor(det(Ai) / dA * 10**9))

    got = QUERIES["q401_ols_normal_eq"](SF)
    assert [got[f"b{i}_e9"].iloc[0] for i in range(4)] == exp
    assert got["n"].iloc[0] == len(y)


# ------------------------------------------------------------------- q402

def test_walsh_closed_forms():
    from texrex_ray.stages.av import WalshSpectrum

    ws = WalshSpectrum()
    # constant clip: only the DC coefficient survives
    pcm = np.full(128, 100, np.int16)
    nf, lo, hi, tt = ws._census(pcm)
    assert (nf, lo, hi) == (2, 2 * (64 * 100) ** 2, 0)
    assert tt == lo
    # fastest alternation +a,-a,...: only the full-sequency Walsh
    # function correlates -> all energy lands in one high coefficient
    pcm = np.tile(np.array([50, -50], np.int16), 32)
    nf, lo, hi, tt = ws._census(pcm)
    assert (nf, lo) == (1, 0)
    assert hi == tt == (64 * 50) ** 2
    # tail shorter than a frame is dropped
    assert ws._census(np.zeros(63, np.int16)) == (0, 0, 0, 0)


def test_walsh_parseval_and_matrix_twin():
    from texrex_ray.stages.av import WalshSpectrum

    ws = WalshSpectrum()
    H = np.array([[1]], dtype=np.int64)
    while H.shape[0] < 64:
        H = np.block([[H, H], [H, -H]])
    # independent sequency ordering: count each row's sign changes
    H = H[np.argsort([int((np.diff(r) != 0).sum()) for r in H])]
    rng = np.random.RandomState(11)
    for _ in range(5):
        pcm = rng.randint(-32768, 32768, rng.randint(64, 900)).astype(np.int16)
        nf, lo, hi, tt = ws._census(pcm)
        fr = pcm[: nf * 64].astype(np.int64).reshape(nf, 64)
        w = fr @ H
        e = w * w
        assert (lo, hi, tt) == (int(e[:, :8].sum()), int(e[:, 32:].sum()),
                                int(e.sum()))
        assert tt == 64 * int((fr * fr).sum())  # Parseval


def test_walsh_query_shape(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q402_walsh_spectrum"](SF)
    assert got["n_clips"].sum() == 40
    assert (got["low_energy"] + got["high_energy"]
            <= got["total_energy"]).all()
