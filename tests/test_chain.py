"""End-to-end cleaning chain + query registry smoke tests (sf0.001)."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_clean_documents_chain():
    from texrex_ray.pipelines.clean_documents import clean_documents

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = clean_documents(ds, minhash_k=16)
    df = out.to_pandas()
    assert len(df) == 500
    for col in (
        "text_md5", "fp64", "minhash", "simhash", "pred_lang",
        "badness", "stop_ratio", "valid", "n_tokens",
    ):
        assert col in df.columns, col
    assert df["valid"].all()  # the synthetic docs are all clean text
    assert df["n_tokens"].gt(0).all()
    assert df["minhash"].map(len).eq(16).all()


def test_exact_dedup_matches_duckdb():
    from texrex_ray.dedup.exact import exact_dedup, exact_dedup_keep_ids

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    keep = exact_dedup_keep_ids(ds).to_pandas()
    want = duckdb.sql(
        f"SELECT MIN(doc_id) AS doc_id FROM read_parquet('{SF}/documents.parquet') GROUP BY md5(text)"
    ).df()
    assert sorted(keep["doc_id"]) == sorted(want["doc_id"])
    full = exact_dedup(ds).to_pandas()
    assert sorted(full["doc_id"]) == sorted(want["doc_id"])


def test_entry_contract():
    import __ray_entry__ as e

    res = e.entry()
    assert isinstance(res, ray.data.Dataset)
    assert res.count() == 500
    qs, oracle = e.queries(), e.oracle_sql()
    assert set(oracle) <= set(qs)
    assert len(qs) >= 10
