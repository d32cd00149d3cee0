"""q46 (counting quantiles) and q47 (hash split): invariants beyond the
DuckDB gate — layout independence, determinism, and the exact split
membership function."""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_length_quantiles_match_duckdb(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q46_length_quantiles"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(
        """SELECT lang, quantile_disc(n_chars, 0.5) AS p50,
                  quantile_disc(n_chars, 0.9) AS p90,
                  quantile_disc(n_chars, 0.99) AS p99
           FROM documents GROUP BY lang ORDER BY lang"""
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"p50": "int64", "p90": "int64", "p99": "int64"}),
        want.astype({"p50": "int64", "p90": "int64", "p99": "int64"}),
    )


def test_quantile_convention_edge_cases():
    """The counting pick must equal quantile_disc on integral q*n edges."""
    con = duckdb.connect()
    rng = np.random.default_rng(11)
    for n in (4, 10, 50, 200):
        xs = np.sort(rng.integers(0, 1000, n))
        for q in (0.25, 0.5, 0.9, 0.99):
            want = con.execute(
                f"SELECT quantile_disc(x, {q!r}) FROM (SELECT unnest({xs.tolist()}) AS x)"
            ).fetchone()[0]
            rank = min(n, max(1, math.ceil(q * n)))
            assert xs[rank - 1] == want, (n, q)


def test_hll_registers_mergeable():
    """Register vectors are a mergeable sketch: regs(A ∪ B) == max(regs(A), regs(B))
    — the property that lets per-batch partials combine via groupby().Max."""
    from texrex_ray.pipelines.queries import hll_estimate, hll_registers

    items = [f"item-{i * 37}" for i in range(5000)]
    whole = hll_registers(items)
    merged = np.maximum.reduce(
        [hll_registers(items[i::7]) for i in range(7)]  # overlapping? no: exact partition
    )
    assert (whole == merged).all()
    est = hll_estimate(whole)
    assert abs(est - 5000) / 5000 < 0.10  # ~3.2% standard error at m=1024


def test_hll_query_accuracy_and_exact_side(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q48_hll_distinct"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(
        "SELECT event_type, COUNT(DISTINCT value) AS n_exact FROM events"
        " GROUP BY event_type ORDER BY event_type"
    ).df()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_exact"].tolist() == want["n_exact"].tolist()
    rel = (got["n_hll"] - got["n_exact"]).abs() / got["n_exact"]
    assert (rel < 0.15).all()


def test_hash_split_membership_and_sizes(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q47_hash_split"](SF).set_index("split")
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    # independent scalar recompute of the membership function
    buckets = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little") % 100
            for i in ids
        ]
    )
    for name, m in (
        ("train", buckets < 80),
        ("val", (buckets >= 80) & (buckets < 90)),
        ("test", buckets >= 90),
    ):
        assert got.loc[name, "n_docs"] == int(m.sum())
        assert got.loc[name, "sum_ids"] == int(ids[m].sum())
    assert got["n_docs"].sum() == len(ids)  # a partition, not a sample
    # 80/10/10 within binomial noise on 500 docs
    assert 0.70 < got.loc["train", "n_docs"] / len(ids) < 0.90
