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


def test_resumable_write_skips_committed(tmp_path):
    """Failed-run recovery: committed shards are skipped on re-run."""
    import os

    from texrex_ray.state.resume import read_committed, resumable_write

    calls = []

    def pipeline(files):
        calls.append(tuple(files))
        ds = ray.data.read_parquet(files)
        return ds.map_batches(
            lambda t: t.append_column("n2", pa.array([x * 2 for x in t["doc_id"].to_pylist()])),
            batch_format="pyarrow",
        )

    paths = [f"{SF}/documents.parquet"] * 4
    out = str(tmp_path / "out")
    r1 = resumable_write(paths, pipeline, out, n_shards=4)
    assert len(r1["written"]) == 4 and not r1["skipped"]
    # simulate a crashed shard: remove one commit marker
    os.remove(os.path.join(out, "shard=0002", "_COMMIT"))
    calls.clear()
    r2 = resumable_write(paths, pipeline, out, n_shards=4)
    assert r2["written"] == ["shard=0002"]
    assert len(r2["skipped"]) == 3
    assert len(calls) == 1  # only the broken shard was re-processed
    total = read_committed(out).count()
    assert total == 4 * 500


def test_write_partitioned_by_key_resumes(ray_session, tmp_path):
    """Key-partitioned sink: committed partitions are pruned before the
    shuffle on re-run, and readers see exactly the input rows once."""
    import os

    from texrex_ray.state.resume import (
        read_committed_parts,
        write_partitioned_by_key,
    )

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = str(tmp_path / "bykey")
    r1 = write_partitioned_by_key(ds, out, "doc_id", n_partitions=8)
    assert len(r1["written"]) == 8 and not r1["skipped"]
    assert read_committed_parts(out).count() == 500

    # simulate two crashed partitions
    for p in ("part=0001", "part=0004"):
        os.remove(os.path.join(out, p, "_COMMIT"))
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
        for d in os.listdir(out)
        if os.path.exists(os.path.join(out, d, "_COMMIT"))
    }
    r2 = write_partitioned_by_key(ds, out, "doc_id", n_partitions=8)
    assert sorted(r2["written"]) == ["part=0001", "part=0004"]
    assert len(r2["skipped"]) == 6
    for d, t in mtimes.items():  # committed partitions were not rewritten
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == t
    got = read_committed_parts(out).to_pandas()
    assert len(got) == 500 and got["doc_id"].is_unique
