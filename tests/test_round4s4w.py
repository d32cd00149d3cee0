"""Round-4 session-5 batch W: Hough lines, CUBE rollup, Soundex census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q403

def test_hough_closed_forms():
    from texrex_ray.stages.images import HoughLines

    hl = HoughLines()
    # a bright vertical line -> strongest accumulator is dir 0 (rho=x)
    img = np.zeros((24, 24, 3), np.uint8)
    img[:, 8, :] = 255
    n, d, r, v = hl._census(img)
    assert d == 0 and n > 0 and v > 0
    # horizontal -> dir 1 (rho=y)
    img = np.zeros((24, 24, 3), np.uint8)
    img[8, :, :] = 255
    assert hl._census(img)[1] == 1
    # main diagonal -> dir 3 (rho=x-y constant along it)
    img = np.zeros((24, 24, 3), np.uint8)
    for i in range(24):
        img[i, i, :] = 255
    assert hl._census(img)[1] == 3
    # anti-diagonal -> dir 2 (rho=x+y)
    img = np.zeros((24, 24, 3), np.uint8)
    for i in range(24):
        img[i, 23 - i, :] = 255
    assert hl._census(img)[1] == 2
    # flat image: no edges
    assert hl._census(np.full((10, 10, 3), 50, np.uint8)) == (0, -1, -1, 0)


def test_hough_matches_scalar_twin():
    import os

    import pyarrow.parquet as pq

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.stages.images import HoughLines

    d = fixture_path(n=300, seed=42)
    imgs = pq.read_table(os.path.join(d, "images.parquet"),
                         columns=["bytes"]).to_pandas()
    hl = HoughLines()
    for raw in imgs["bytes"][:5]:
        px = decode_image(raw)
        lum = px.astype(np.int64).sum(axis=2).tolist()
        h, w = len(lum), len(lum[0])
        votes = [dict(), dict(), dict(), dict()]
        n_edge = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (lum[y - 1][x + 1] + 2 * lum[y][x + 1]
                      + lum[y + 1][x + 1] - lum[y - 1][x - 1]
                      - 2 * lum[y][x - 1] - lum[y + 1][x - 1])
                gy = (lum[y + 1][x - 1] + 2 * lum[y + 1][x]
                      + lum[y + 1][x + 1] - lum[y - 1][x - 1]
                      - 2 * lum[y - 1][x] - lum[y - 1][x + 1])
                if gx * gx + gy * gy > hl.EDGE_T:
                    n_edge += 1
                    for di, rho in enumerate((x, y, x + y, x - y)):
                        votes[di][rho] = votes[di].get(rho, 0) + 1
        bd, br, bv = -1, -1, 0
        for di in range(4):
            for rho in sorted(votes[di]):
                if votes[di][rho] > bv:
                    bd, br, bv = di, rho, votes[di][rho]
        assert hl._census(px) == (n_edge, bd, br, bv)


# ------------------------------------------------------------------- q404

def test_cube_orders_levels_consistent(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q404_cube_orders"](SF)
    grand = got[(got["priority"] == "ALL") & (got["status"] == "ALL")]
    assert len(grand) == 1
    fine = got[(got["priority"] != "ALL") & (got["status"] != "ALL")]
    pri = got[(got["priority"] != "ALL") & (got["status"] == "ALL")]
    sta = got[(got["priority"] == "ALL") & (got["status"] != "ALL")]
    # every level sums to the grand total
    for lv in (fine, pri, sta):
        assert lv["n_orders"].sum() == grand["n_orders"].iloc[0]
        assert lv["total_c"].sum() == grand["total_c"].iloc[0]
    # per-priority rollup equals the fine cells' partial sums
    chk = fine.groupby("priority")["n_orders"].sum()
    for p, n in zip(pri["priority"], pri["n_orders"]):
        assert chk[p] == n


def test_cube_orders_matches_duckdb(ray_session):
    import duckdb

    from texrex_ray.pipelines.queries import ORACLE, QUERIES

    got = QUERIES["q404_cube_orders"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(ORACLE["q404_cube_orders"]).df()
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_orders": "int64", "total_c": "int64"}))


# ------------------------------------------------------------------- q405

def test_soundex_classic_values_and_twin_parity():
    from texrex_ray.functions.phonetic import soundex_one, soundex_series

    classics = {
        "robert": "r163", "rupert": "r163", "ashcraft": "a261",
        "ashcroft": "a261", "tymczak": "t522", "pfister": "p236",
        "honeyman": "h555", "jackson": "j250",
    }
    for w, k in classics.items():
        assert soundex_one(w) == k, w
    # vectorized path == state machine on random tokens
    import random

    random.seed(5)
    words = ["".join(random.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(random.randint(2, 12)))
             for _ in range(2000)]
    assert soundex_series(pd.Series(words)).tolist() == [
        soundex_one(w) for w in words]


def test_soundex_census_query(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q405_soundex_census"](SF)
    assert (got["n_keys"] <= got["n_tokens"]).all()
    assert (got["top_count"] >= 1).all()
    assert got["top_key"].str.fullmatch(r"[a-z][0-9]{3}").all()
    # at sf0.001 the per-source vocabulary is ~30 synthetic tokens, so
    # collisions are rare but keys can never exceed tokens; real
    # compression is proven by the sf0.01 fixture oracle (n_keys <
    # n_tokens there)
    assert got["n_tokens"].sum() >= got["n_keys"].sum()
