"""Round-4 session-5 batch II: periodicity, token dispersion, lineno audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q439

def test_periodicity_closed_forms():
    from texrex_ray.stages.images import TexturePeriodicity

    tp = TexturePeriodicity()
    # period-4 vertical stripes: lag (0,4) correlation equals the
    # overlap's zero-lag energy (perfect periodicity)
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, ::4] = 200
    n_px, sx2, h4, v4, d4, h8, v8 = tp._census(img)
    lum = img.astype(np.int64).sum(axis=2)
    assert h4 == int((lum[:, :12] ** 2).sum())
    assert h8 == int((lum[:, :8] ** 2).sum())
    # vertical lag on horizontal stripes sees identical columns too
    assert v4 == int((lum[:12, :] ** 2).sum())
    # image smaller than the lag: zero contribution
    r = tp._census(np.full((3, 3, 3), 10, np.uint8))
    assert r[2:] == (0, 0, 0, 0, 0)


def test_periodicity_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import TexturePeriodicity

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    tp = TexturePeriodicity()
    for raw in imgs["bytes"][:3]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2).tolist()
        h, w = len(lum), len(lum[0])
        exp = [h * w, sum(v * v for row in lum for v in row)]
        for dy, dx in tp.LAGS:
            tot = 0
            for y in range(h - dy):
                for x in range(w - dx):
                    tot += lum[y][x] * lum[y + dy][x + dx]
            exp.append(tot)
        assert tp._census(px) == tuple(exp)


# ------------------------------------------------------------------- q440

def test_token_dispersion_matches_counter_twin(ray_session):
    import re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q440_token_dispersion"](SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tok_re = re.compile(r"[a-z]+")
    per_tok: dict = defaultdict(Counter)
    for did, t in zip(docs["doc_id"], docs["text"]):
        for tok in tok_re.findall((t or "").lower()):
            per_tok[tok][did] += 1
    D = len(docs)
    rows = []
    for tok, c in per_tok.items():
        tn = sum(c.values())
        sq = sum(v * v for v in c.values())
        rows.append((tok, len(c), tn, sq,
                     (D * sq - tn * tn) * 1_000_000 // (D * tn)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    exp = pd.DataFrame(rows[:10], columns=["token", "n_docs", "total_n",
                                           "sum_sq", "fano_ppm"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.astype({c: "int64" for c in exp.columns[1:]}))
    # Fano is nonnegative (Cauchy-Schwarz)
    assert (got["fano_ppm"] >= 0).all()


# ------------------------------------------------------------------- q441

def test_lineno_integrity_matches_pandas_twin(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q441_lineno_integrity"](SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber"]).to_pandas()
    g = li.groupby("l_orderkey")["l_linenumber"]
    ok = ((g.min() == 1) & (g.max() == g.size()) & (g.nunique() == g.size()))
    assert got["n_orders"].iloc[0] == li["l_orderkey"].nunique()
    assert got["n_contiguous"].iloc[0] == int(ok.sum())
    assert got["max_lines"].iloc[0] == int(g.size().max())
    assert got["n_lines"].iloc[0] == len(li)


def test_lineno_integrity_detects_gaps(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from texrex_ray.pipelines.queries import QUERIES

    df = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 2, 3, 3],
        "l_linenumber": [1, 2, 3, 1, 3, 2, 2],  # 2: gap, 3: dup + no 1
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(td, "lineitem.parquet"))
        got = QUERIES["q441_lineno_integrity"](td)
    assert got["n_orders"].iloc[0] == 3
    assert got["n_contiguous"].iloc[0] == 1  # only order 1
