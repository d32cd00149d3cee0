"""Distributed join operators (ops/join.py) vs pandas ground truth.

Covers all six join types, null-key SQL semantics, string and multi-column
keys, bucket-count invariance, and broadcast/shuffle agreement.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from texrex_ray.ops import broadcast_join, shuffle_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 200),
            "a": rng.normal(size=200),
            "s": [f"s{i % 7}" for i in range(200)],
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 80),
            "b": rng.integers(0, 100, 80),
            "a": rng.normal(size=80),
        }
    )
    left.loc[[3, 11], "k"] = pd.NA
    left["k"] = left["k"].astype("Int64")
    right.loc[[5], "k"] = pd.NA
    right["k"] = right["k"].astype("Int64")
    return left, right


def expected(left: pd.DataFrame, right: pd.DataFrame, how: str) -> pd.DataFrame:
    lk, rk = left.dropna(subset=["k"]), right.dropna(subset=["k"])
    rr = rk.rename(columns={"a": "a_r"})
    if how == "semi":
        return lk[lk["k"].isin(rk["k"])]
    if how == "anti":
        return pd.concat([lk[~lk["k"].isin(rk["k"])], left[left["k"].isna()]])
    out = lk.merge(rr, on="k", how=how)
    if how in ("left", "outer"):
        out = pd.concat([out, left[left["k"].isna()]], ignore_index=True)
    if how in ("right", "outer"):
        out = pd.concat(
            [out, right[right["k"].isna()].rename(columns={"a": "a_r"})],
            ignore_index=True,
        )
    return out


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(
            tuple(
                "NA"
                if pd.isna(v)
                else (
                    repr(round(float(v), 9))
                    if isinstance(v, (int, float, np.integer, np.floating))
                    else str(v)
                )
                for v in row
            )
        )
    return sorted(out)


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer", "semi", "anti"])
def test_shuffle_join_types(ray_session, frames, how):
    left, right = frames
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    got = shuffle_join(lds, rds, "k", how=how, n_buckets=7).to_pandas()
    assert canon(got) == canon(expected(left, right, how))


def test_bucket_count_invariance(ray_session, frames):
    left, right = frames
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    a = shuffle_join(lds, rds, "k", how="inner", n_buckets=3).to_pandas()
    b = shuffle_join(lds, rds, "k", how="inner", n_buckets=31).to_pandas()
    assert canon(a) == canon(b)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_broadcast_matches_shuffle(ray_session, frames, how):
    left, right = frames
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    bc = broadcast_join(lds, right, "k", how=how).to_pandas()
    sh = shuffle_join(lds, rds, "k", how=how, n_buckets=5).to_pandas()
    assert canon(bc) == canon(sh)


def test_string_and_multi_key(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "g": [f"g{i % 5}" for i in range(120)],
            "n": rng.integers(0, 4, 120),
            "v": rng.normal(size=120),
        }
    )
    right = pd.DataFrame(
        {
            "g": [f"g{i % 6}" for i in range(30)],
            "n": rng.integers(0, 5, 30),
            "w": rng.integers(0, 9, 30),
        }
    )
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    got = shuffle_join(lds, rds, ["g", "n"], how="inner", n_buckets=9).to_pandas()
    exp = left.merge(right, on=["g", "n"], how="inner")
    assert canon(got) == canon(exp)


def test_right_on_rename(ray_session):
    left = pd.DataFrame({"custkey": [1, 2, 3, 4], "x": [10.0, 20.0, 30.0, 40.0]})
    right = pd.DataFrame({"ck": [2, 4, 5], "y": ["a", "b", "c"]})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    got = shuffle_join(lds, rds, "custkey", right_on="ck", how="inner", n_buckets=4).to_pandas()
    exp = left.merge(right.rename(columns={"ck": "custkey"}), on="custkey")
    assert canon(got) == canon(exp)
    bc = broadcast_join(lds, right, "custkey", right_on="ck", how="inner").to_pandas()
    assert canon(bc) == canon(exp)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hot_key_salting(ray_session, how):
    """A hot key spread over salted sub-buckets joins identically."""
    rng = np.random.default_rng(3)
    n = 300
    lk = rng.integers(0, 20, n)
    lk[: n // 2] = 7  # half the probe side hits one key
    left = pd.DataFrame({"k": lk, "v": rng.normal(size=n)})
    rk = rng.integers(0, 25, 60)
    rk[:10] = 7
    right = pd.DataFrame({"k": rk, "w": rng.integers(0, 9, 60)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    plain = shuffle_join(lds, rds, "k", how=how, n_buckets=5).to_pandas()
    salted = shuffle_join(
        lds, rds, "k", how=how, n_buckets=5, hot_keys=[7], skew_salt=4
    ).to_pandas()
    assert canon(salted) == canon(plain)


def test_hot_key_salting_rejects_outer(ray_session):
    lds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
    rds = ray.data.from_pandas(pd.DataFrame({"k": [1], "w": [2.0]}))
    with pytest.raises(ValueError):
        shuffle_join(lds, rds, "k", how="outer", hot_keys=[1])


def test_shuffle_join_scale_dataset_native(ray_session):
    """300k-row join where no corpus-sized data ever lands on the driver.

    Inputs are built block-parallel via ray.data.range; the only driver
    materialization is the final aggregate (one row).  Row count checks
    the closed form: each of 50k keys appears 4× left and 2× right →
    4·2·50k matches.  auto_buckets sizing (expected_rows) is exercised
    instead of an explicit n_buckets.
    """
    from texrex_ray.ops import shuffle_join

    n_keys = 50_000
    left = ray.data.range(4 * n_keys).map_batches(
        lambda b: {"k": b["id"] % n_keys, "v": b["id"]}, batch_format="numpy"
    )
    right = ray.data.range(2 * n_keys).map_batches(
        lambda b: {"k": b["id"] % n_keys, "w": b["id"] * 3}, batch_format="numpy"
    )
    joined = shuffle_join(
        left, right, "k", how="inner", expected_rows=6 * n_keys
    )
    assert joined.count() == 8 * n_keys


@pytest.mark.parametrize("how", ["inner", "semi"])
def test_bloom_prefilter_exact(ray_session, how):
    """Pre-shuffle Bloom filtering never changes the join result."""
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 10_000, 500), "v": rng.normal(size=500)})
    right = pd.DataFrame({"k": rng.integers(0, 10_000, 40), "w": np.arange(40)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    plain = shuffle_join(lds, rds, "k", how=how, n_buckets=5).to_pandas()
    filt = shuffle_join(
        lds, rds, "k", how=how, n_buckets=5, bloom_prefilter=True
    ).to_pandas()
    assert canon(filt) == canon(plain)


def test_bloom_prefilter_rejects_outer_paths(ray_session):
    lds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
    rds = ray.data.from_pandas(pd.DataFrame({"k": [1], "w": [2.0]}))
    with pytest.raises(ValueError):
        shuffle_join(lds, rds, "k", how="left", bloom_prefilter=True)


def test_join_planner_agrees_across_plans(ray_session, frames):
    from texrex_ray.ops import join

    left, right = frames
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    auto = join(lds, rds, "k", how="inner").to_pandas()          # small → broadcast
    forced = join(lds, rds, "k", how="inner", plan="shuffle", n_buckets=5).to_pandas()
    inmem = join(lds, right, "k", how="inner").to_pandas()       # DataFrame right
    assert canon(auto) == canon(forced) == canon(inmem)
    # outer can't broadcast: auto must pick the shuffle path and still work
    outer = join(lds, rds, "k", how="outer", n_buckets=5).to_pandas()
    assert canon(outer) == canon(expected(left, right, "outer"))
    with pytest.raises(ValueError):
        join(lds, rds, "k", how="outer", plan="broadcast")


def test_range_join_matches_manual(ray_session):
    from texrex_ray.ops import range_join

    rng = np.random.default_rng(9)
    left = pd.DataFrame({"v": rng.uniform(-5, 120, 400), "tag": np.arange(400)})
    iv = pd.DataFrame({"lo": [0.0, 10.0, 25.0], "band": ["a", "b", "c"]})
    lds = ray.data.from_pandas(left).repartition(3)
    got = range_join(lds, iv, "v", attach=["band"], keep="all").to_pandas()
    lo = iv["lo"].to_numpy()
    idx = np.searchsorted(lo, left["v"].to_numpy(), side="right") - 1
    want = [iv["band"].iloc[i] if i >= 0 else None for i in idx]
    got = got.sort_values("tag").reset_index(drop=True)
    assert [x if pd.notna(x) else None for x in got["band"]] == want
    matched = range_join(lds, iv, "v", attach=["band"], keep="matched").to_pandas()
    assert len(matched) == sum(i >= 0 for i in idx)


def test_asof_join_matches_merge_asof(ray_session):
    from texrex_ray.ops import asof_join

    rng = np.random.default_rng(4)
    left = pd.DataFrame({"t": np.sort(rng.integers(0, 1000, 300)), "eid": np.arange(300)})
    right = pd.DataFrame(
        {"t": np.sort(rng.choice(np.arange(0, 1000, 7), 40, replace=False)), "rate": rng.normal(size=40)}
    )
    lds = ray.data.from_pandas(left).repartition(4)
    got = (
        asof_join(lds, right, "t", attach=["rate"], keep="all")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(left.sort_values("t"), right, on="t").sort_values("eid").reset_index(drop=True)
    a, b = got["rate"].to_numpy(), want["rate"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert (both_nan | (np.abs(a - b) < 1e-12)).all()


def test_bucketed_groupby_matches_native(ray_session):
    """Exactness of the coarse-bucket aggregate vs Ray's native aggregate."""
    from ray.data.aggregate import Count, Max

    from texrex_ray.ops.aggregate import bucketed_groupby

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 500, 4000),
            "b": rng.integers(0, 7, 4000),
            "v": rng.integers(0, 1000, 4000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    native = (
        ds.groupby(["a", "b"])
        .aggregate(Count(alias_name="n"), Max("v", alias_name="mx"))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    bucketed = (
        bucketed_groupby(
            ds,
            ["a", "b"],
            lambda g: g.groupby(["a", "b"], sort=False)
            .agg(n=("v", "size"), mx=("v", "max"))
            .reset_index(),
            n_buckets=13,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert native[["a", "b", "n", "mx"]].astype("int64").equals(
        bucketed[["a", "b", "n", "mx"]].astype("int64")
    )


def test_grouped_topk_matches_pandas(ray_session):
    from texrex_ray.ops import grouped_topk

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, 600),
            "v": rng.normal(size=600).round(6),
            "id": np.arange(600),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        grouped_topk(ds, "g", "v", 3, ascending=False, tiebreak="id")
        .to_pandas()
        .sort_values(["g", "rk"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == want["id"].tolist()
    assert (got.groupby("g")["rk"].apply(lambda s: s.tolist() == list(range(1, len(s) + 1)))).all()


def test_hop_window_covers_each_event(ray_session):
    from texrex_ray.ops import hop_window

    ts = pd.to_datetime([1000, 4800, 7300], unit="s")
    df = pd.DataFrame({"ts": ts, "x": [1, 2, 3]})
    ds = ray.data.from_pandas(df)
    out = hop_window(ds, "ts", size_s=3600 * 3, step_s=3600).to_pandas()
    assert len(out) == 9  # 3 windows per event
    for _, row in out.iterrows():
        es = row["ts"].timestamp()
        assert row["window_start"] <= es < row["window_start"] + 3 * 3600
        assert row["window_start"] % 3600 == 0


def test_session_count_matches_manual(ray_session):
    from texrex_ray.ops import session_count

    rows = []
    for u, times in {"a": [0, 100, 4000, 4100], "b": [0, 2000, 3900]}.items():
        rows += [{"u": u, "ts": pd.Timestamp(t, unit="s"), "i": i} for i, t in enumerate(times)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    got = (
        session_count(ds, "u", "ts", gap_s=1800, tiebreak="i")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert got["n_sessions"].tolist() == [2, 3]  # a: gap at 4000; b: every gap > 1800
    assert got["n_events"].tolist() == [4, 3]


def test_deterministic_shuffle_is_stable_permutation(ray_session):
    import numpy as np
    import ray.data

    from texrex_ray.ops import deterministic_shuffle

    rows = [{"doc_id": i, "v": i * 2} for i in range(300)]
    a = deterministic_shuffle(ray.data.from_items(rows, override_num_blocks=3)).to_pandas()
    b = deterministic_shuffle(ray.data.from_items(rows, override_num_blocks=11)).to_pandas()

    # exact permutation: every position 0..n-1 once
    assert sorted(a["pos"].tolist()) == list(range(300))
    # layout-invariant: same order regardless of input blocking
    av = a.sort_values("pos")["doc_id"].tolist()
    bv = b.sort_values("pos")["doc_id"].tolist()
    assert av == bv
    # actually shuffled, and other columns ride along
    assert av != list(range(300))
    assert (a["v"] == a["doc_id"] * 2).all()
    # a different salt is a different permutation
    c = deterministic_shuffle(
        ray.data.from_items(rows, override_num_blocks=3), salt="epoch1"
    ).to_pandas()
    assert c.sort_values("pos")["doc_id"].tolist() != av


def test_pagerank_int_analytic_chain(ray_session):
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.graph import pagerank_int

    # a -> b only. Hand-computed 3 exact-integer iterations:
    # r1(a)=150000, r1(b)=1000000; r2(b)=277500; r3(b)=277500.
    edges = ray.data.from_arrow(
        pa.table({"src": ["http://a/"], "dst": ["http://b/"]})
    )
    out = pagerank_int(edges, iters=3).set_index("page")["rank"]
    assert out["http://a/"] == 150000
    assert out["http://b/"] == 277500


def test_pagerank_edges_fixture_fresh(ray_session):
    import pyarrow.parquet as pq

    from texrex_ray.sources.webgraph import link_edges, make_webgraph

    t = pq.read_table("/root/repo/tests/fixtures/oracle/pagerank_edges.parquet")
    g = make_webgraph(n_hosts=40, pages_per_host_base=12, n_seeds=8, seed=7)
    e = link_edges(g)
    assert list(zip(t["src"].to_pylist(), t["dst"].to_pylist())) == e


def test_pagerank_shuffle_plan_matches_broadcast(ray_session):
    """The distributed-rank-state plan (shuffle_join + bucketed_groupby per
    iteration, nothing node-sized on the driver) must be bit-identical to
    the broadcast plan — same integer algebra, different exchange."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from texrex_ray.ops.graph import pagerank_int

    fx = pq.read_table("/root/repo/tests/fixtures/oracle/pagerank_edges.parquet")
    ds = ray.data.from_arrow(fx)
    a = pagerank_int(ds, iters=3)
    b = pagerank_int(ds, iters=3, plan="shuffle")
    assert a.equals(b)

    # 10× synthetic graph with dangling nodes and multi-edges
    rng = np.random.default_rng(3)
    n_nodes, n_edges = 1500, 30_000
    srcs = [f"h{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    dsts = [f"h{int(i)}" for i in rng.integers(0, n_nodes + 50, n_edges)]
    big = ray.data.from_arrow(
        pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)})
    ).repartition(5)
    a = pagerank_int(big, iters=2)
    b = pagerank_int(big, iters=2, plan="shuffle")
    assert a.equals(b)


def test_bloom_prefilter_cross_dtype_keys(ray_session):
    """ADVICE: int64 vs float64 keys must survive the bloom prefilter —
    the merge coerces them equal, so the filter has to as well."""
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.join import shuffle_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1.0, 2.0, 99.0], pa.float64()),
                  "lv": pa.array([10, 20, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "rv": pa.array([100, 200, 300], pa.int64())})
    )
    plain = shuffle_join(left, right, "k", how="inner").to_pandas()
    bloomed = shuffle_join(
        left, right, "k", how="inner", bloom_prefilter=True
    ).to_pandas()
    key = lambda d: sorted(zip(d["k"], d["lv"], d["rv"]))
    assert key(bloomed) == key(plain)
    assert len(plain) == 2


def test_asof_and_range_attach_collisions_suffixed(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.interval import asof_join, range_join

    left = ray.data.from_arrow(
        pa.table({"ts": pa.array([5, 15], pa.int64()),
                  "rate": pa.array([0.0, 0.0], pa.float64())})
    )
    right = pd.DataFrame({"ts": [0, 10], "rate": [1.5, 2.5]})
    out = asof_join(left, right, "ts").to_pandas()
    assert list(out.columns) == ["ts", "rate", "rate_r"]
    assert out["rate_r"].tolist() == [1.5, 2.5]

    iv = pd.DataFrame({"lo": [0, 10], "rate": [7.0, 8.0]})
    out2 = range_join(left, iv, "ts").to_pandas()
    assert list(out2.columns) == ["ts", "rate", "rate_r"]
    assert out2["rate_r"].tolist() == [7.0, 8.0]


def test_hop_window_pre_epoch_floor(ray_session):
    """ADVICE: pre-1970 timestamps must floor (not truncate) into their
    window — -1s belongs to window_start -3600, not 0."""
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.window import hop_window

    t = pa.table({"ts": pa.array([-1, 0, 3599], pa.timestamp("ms"))})
    # -1 ms -> floor to -1 s? unit conversion: -1ms // 1000 = -1s (floor)
    out = (
        hop_window(ray.data.from_arrow(t), "ts", size_s=3600, step_s=3600)
        .to_pandas()
        .sort_values("window_start")
    )
    assert out["window_start"].tolist() == [-3600, 0, 0]


def test_asof_join_by_matches_pandas(ray_session):
    """Per-key as-of (big-big, bucketed) must equal a global
    pd.merge_asof(by=...) ground truth, independent of layout."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.interval import asof_join_by

    rng = np.random.default_rng(9)
    nl, nr = 3000, 1500
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, nl),
            "ts": rng.integers(0, 100_000, nl),
            "lid": np.arange(nl),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 50, nr),
                "ts": rng.integers(0, 100_000, nr),
                "rv": rng.integers(0, 10**6, nr),
            }
        )
        .drop_duplicates(["k", "ts"])  # deterministic ties
        .reset_index(drop=True)
    )
    lds = ray.data.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(7)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(3)
    got = (
        asof_join_by(lds, rds, on="ts", by="k")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert got["lid"].tolist() == want["lid"].tolist()
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), want["rv"].astype("float64"), check_names=False
    )
    # attach collision gains the suffix
    right2 = right.rename(columns={"rv": "lid"})
    rds2 = ray.data.from_arrow(pa.Table.from_pandas(right2, preserve_index=False))
    got2 = asof_join_by(lds, rds2, on="ts", by="k").to_pandas()
    assert "lid_r" in got2.columns and "lid" in got2.columns


def test_bloom_prefilter_fractional_float_keys(ray_session):
    """ADVICE r3: an int64 left key against a right side holding
    FRACTIONAL floats (2.5) used to crash the prefilter ('cannot safely
    cast' on Int64.astype) — the pair now stringifies through the
    merge's own coercion target (float) and stays exact."""
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.join import shuffle_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "lv": pa.array([10, 20, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1.0, 2.5, 3.0], pa.float64()),
                  "rv": pa.array([100, 200, 300], pa.int64())})
    )
    plain = shuffle_join(left, right, "k", how="inner").to_pandas()
    bloomed = shuffle_join(
        left, right, "k", how="inner", bloom_prefilter=True
    ).to_pandas()
    key = lambda d: sorted(zip(d["k"], d["lv"], d["rv"]))
    assert key(bloomed) == key(plain)
    assert sorted(plain["k"]) == [1, 3]  # 2 vs 2.5 never matches


def test_attach_names_residual_collision(ray_session):
    """ADVICE r3: attaching 'x' when the left already has BOTH 'x' and
    'x_r' must yield 'x_r_r', not a silent duplicate column."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from texrex_ray.ops.interval import range_join

    left = ray.data.from_arrow(
        pa.table({"ts": pa.array([5, 15], pa.int64()),
                  "rate": pa.array([0.0, 0.0], pa.float64()),
                  "rate_r": pa.array([9.0, 9.0], pa.float64())})
    )
    iv = pd.DataFrame({"lo": [0, 10], "rate": [7.0, 8.0]})
    out = range_join(left, iv, "ts").to_pandas()
    assert list(out.columns) == ["ts", "rate", "rate_r", "rate_r_r"]
    assert out["rate_r_r"].tolist() == [7.0, 8.0]
    assert out["rate_r"].tolist() == [9.0, 9.0]
