"""ops/diff.py table fingerprint/diff and ops/window.py running_totals."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_table_diff_detects_and_localizes(ray_session):
    from texrex_ray.ops.diff import table_diff

    t = pa.table(
        {
            "k": pa.array(list(range(200)), pa.int64()),
            "v": pa.array([f"val{i}" for i in range(200)], pa.string()),
        }
    )
    a = ray.data.from_arrow(t)
    ident = table_diff(a, ray.data.from_arrow(t), "k", ["k", "v"], n_buckets=16)
    assert (ident["match"] == 1).all() and len(ident) == 16

    # tamper: drop k=7, edit k=13
    df = t.to_pandas()
    df = df[df["k"] != 7].copy()
    df.loc[df["k"] == 13, "v"] = "EDITED"
    b = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    d = table_diff(a, b, "k", ["k", "v"], n_buckets=16)
    bad = d[d["match"] == 0]
    assert 1 <= len(bad) <= 2  # only the touched buckets flag
    assert d["n_a"].sum() == 200 and d["n_b"].sum() == 199


def test_table_fingerprint_layout_and_partial_count_invariant(ray_session):
    """Checksum must not depend on block layout or partial count — the
    int64-wrap regression (pandas groupby coercing the object-precision
    partial sums) showed up exactly as a layout-dependent checksum."""
    from texrex_ray.ops.diff import table_fingerprint

    t = pa.table(
        {
            "k": pa.array(list(range(500)), pa.int64()),
            "v": pa.array([f"text {i} " * 5 for i in range(500)], pa.string()),
        }
    )
    one = table_fingerprint(ray.data.from_arrow(t), "k", ["k", "v"], n_buckets=8)
    many = table_fingerprint(
        ray.data.from_arrow(t).repartition(37), "k", ["k", "v"], n_buckets=8
    )
    pd.testing.assert_frame_equal(one, many)
    # ≥ 5 partials per bucket above: an int64 partial sum would have wrapped
    assert (one["n_rows"].sum()) == 500


def test_running_totals_matches_pandas(ray_session):
    from texrex_ray.ops.window import running_totals

    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": rng.integers(0, 10_000, n),
            "eid": np.arange(n),
            "v": rng.integers(-50, 50, n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(7)
    got = (
        running_totals(ds, "k", ["ts", "eid"], "v")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "ts", "eid"]).copy()
    g = want.groupby("k", sort=False)
    want["cum_n"] = g.cumcount() + 1
    want["cum_sum"] = g["v"].cumsum()
    want = want.sort_values("eid").reset_index(drop=True)
    assert got["cum_n"].tolist() == want["cum_n"].tolist()
    assert got["cum_sum"].tolist() == want["cum_sum"].tolist()


def test_table_fingerprint_null_canonicalization(ray_session):
    """ADVICE r3: NULLs in `cols` hash as chr(0) on the Ray side; the
    DuckDB twin must COALESCE(col, chr(0)) or the row silently drops out
    of the SQL checksum.  Verify the documented recipe matches exactly
    on a NULL-bearing table, and that a NULL KEY raises loudly."""
    import duckdb
    import pytest

    from texrex_ray.ops.diff import MOD, table_fingerprint

    df = pd.DataFrame(
        {
            "k": np.arange(50, dtype=np.int64),
            "v": [None if i % 7 == 0 else f"val{i}" for i in range(50)],
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = table_fingerprint(
        ray.data.from_arrow(t).repartition(4), "k", ["k", "v"], n_buckets=8
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"""
        SELECT CAST(md5_number_lower(CAST(k AS VARCHAR)) % 8 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(md5_number_lower(
                      CAST(k AS VARCHAR) || '|' || COALESCE(v, chr(0))
                    ) % {MOD}) % {MOD} AS BIGINT) AS checksum
        FROM t GROUP BY bucket ORDER BY bucket
        """
    ).df()
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert got["checksum"].tolist() == want["checksum"].tolist()

    nullkey = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "v": ["a", "b"]})
    with pytest.raises(Exception, match="NULL"):
        table_fingerprint(
            ray.data.from_arrow(pa.Table.from_pandas(nullkey, preserve_index=False)),
            "k",
            ["k", "v"],
            n_buckets=4,
        )
