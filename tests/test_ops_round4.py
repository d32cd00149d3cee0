"""Round-4 operator units: sessionization, exact quantiles, packing.

The oracle gate (q98-q101) pins full-table parity vs DuckDB; these pin
edge semantics and physical-layout invariance on constructed inputs."""

import numpy as np
import pandas as pd
import ray.data


def test_sessionize_gap_semantics(ray_session):
    from texrex_ray.ops.sessions import sessionize

    # user 1: gaps 10, 31, 5 min -> sessions [2 events][2 events]
    # user 2: single event -> one session of 1
    base = 1_700_000_000_000_000  # us
    m = 60 * 1_000_000
    rows = [
        {"user_id": 1, "event_id": 1, "ts": base},
        {"user_id": 1, "event_id": 2, "ts": base + 10 * m},
        {"user_id": 1, "event_id": 3, "ts": base + 41 * m},
        {"user_id": 1, "event_id": 4, "ts": base + 46 * m},
        {"user_id": 2, "event_id": 5, "ts": base},
        # exact 30-min gap is NOT a new session (strictly greater)
        {"user_id": 3, "event_id": 6, "ts": base},
        {"user_id": 3, "event_id": 7, "ts": base + 30 * m},
    ]
    ds = ray.data.from_items(rows)
    out = (
        sessionize(ds, gap_us=30 * m, order_cols=("event_id",))
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    got = list(zip(out["user_id"], out["session_idx"], out["n_events"]))
    assert got == [(1, 0, 2), (1, 1, 2), (2, 0, 1), (3, 0, 2)]
    assert out.loc[0, "start_us"] == base and out.loc[0, "end_us"] == base + 10 * m

    # physical layout must not move a session boundary
    out2 = (
        sessionize(ds.repartition(5), gap_us=30 * m, order_cols=("event_id",))
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert out2.values.tolist() == out.values.tolist()


def test_grouped_exact_quantiles_matches_reference(ray_session):
    from texrex_ray.ops.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 4000),
            "v": rng.integers(-100, 2000, 4000).astype("int64"),
        }
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    out = (
        grouped_exact_quantiles(ray.data.from_pandas(df).repartition(7), "g", "v", qs)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        n = len(vals)
        for q, col in zip(qs, ("p10", "p50", "p90", "p99")):
            want = vals[max(int(np.ceil(q * n)), 1) - 1]  # PERCENTILE_DISC
            assert row[col] == want, (row["g"], q)


def test_quantiles_singleton_and_ties(ray_session):
    from texrex_ray.ops.quantiles import grouped_exact_quantiles

    df = pd.DataFrame({"g": ["a", "b", "b", "b", "b"], "v": [7, 5, 5, 5, 5]})
    out = (
        grouped_exact_quantiles(ray.data.from_pandas(df), "g", "v", [0.01, 1.0])
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["p1"].tolist() == [7, 5]
    assert out["p100"].tolist() == [7, 5]


def test_packing_offsets_contiguous(ray_session):
    """q101 semantics: within a shard, token offsets tile the concat
    stream exactly (no holes, no overlaps), regardless of layout."""
    from texrex_ray.pipelines.queries import QUERIES

    out = QUERIES["q101_token_packing"]("/root/testdata/sf0.001")
    for _, sub in out.groupby("shard"):
        sub = sub.sort_values("doc_id")
        starts = sub["tok_offset"].to_numpy()
        lens = sub["n_tokens"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts + lens)[:-1]).all()
        assert (sub["seq_idx"].to_numpy() == starts // 2048).all()
