"""Geometry / sampling / media census part 3 (hulls, butterflies, priority sampling, pitch, shots; q345-q387).

Split from the former pipelines/queries.py monolith; registration
order across chunks is preserved by the package __init__ (which also
applies the curated first-50 driver window)."""

from __future__ import annotations

from texrex_ray.pipelines.queries._core import (  # noqa: F401
    Any,
    Callable,
    Count,
    Max,
    Min,
    ORACLE,
    QUERIES,
    Sum,
    _cents,
    _read,
    np,
    pa,
    pc,
    pd,
    pq,
    query,
    ray,
    re,
)
from texrex_ray.pipelines.queries.flagships import _TOKEN_RE, _av_n  # noqa: F401
from texrex_ray.pipelines.queries.census_b import _BWT_PREFIX  # noqa: F401



# --------------------------------------------------------------------------
# National market share (TPC-H Q8 shape) (q345)
# --------------------------------------------------------------------------

_Q8_SQL = """
WITH cust AS (
  SELECT c_custkey FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'AMERICA'
),
ords AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders WHERE o_custkey IN (SELECT c_custkey FROM cust)
),
f AS (
  SELECT o.o_year,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) // 100 AS vol_c,
         (SELECT n2.n_name FROM supplier s JOIN nation n2
            ON n2.n_nationkey = s.s_nationkey
          WHERE s.s_suppkey = l.l_suppkey) AS supp_nation
  FROM lineitem l
  JOIN ords o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'STANDARD'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
            AS BIGINT) AS nation_vol_c,
       CAST(SUM(vol_c) AS BIGINT) AS total_vol_c,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
            * 1000000 // SUM(vol_c) AS BIGINT) AS share_ppm
FROM f GROUP BY o_year ORDER BY o_year
"""


@query("q345_market_share", sql=_Q8_SQL)
def q345_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATION_3 suppliers' market share, by order
    year, of STANDARD-part volume ordered by AMERICA-region customers.
    Plan: the three dimension reductions (region->customer set,
    customer-filtered orders -> orderkey->year map, supplier->nation
    flag) are driver-side joins over dimension tables, broadcast once;
    the lineitem fact is scanned ONCE with a per-batch partial
    (year, nation_vol, total_vol) aggregate.  The orderkey->year map is
    order-count-sized — beyond broadcast reach it becomes the q54
    shuffle join on l_orderkey (auto-bucketed); noted, not needed at
    bench scale.  Integer cents + PPM share.  Output:
    (o_year, nation_vol_c, total_vol_c, share_ppm)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    am_regions = set(reg.loc[reg["r_name"] == "AMERICA", "r_regionkey"])
    am_nations = set(nat.loc[nat["n_regionkey"].isin(am_regions),
                             "n_nationkey"])
    am_cust = set(cust.loc[cust["c_nationkey"].isin(am_nations),
                           "c_custkey"].astype(int))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    keep_o = orders[orders["o_custkey"].isin(am_cust)]
    o2y = dict(
        zip(
            keep_o["o_orderkey"].astype(int),
            keep_o["o_orderdate"].dt.year.astype(int),
        )
    )

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    n3 = int(nat.loc[nat["n_name"] == "NATION_3", "n_nationkey"].iloc[0])
    n3_supp = set(sup.loc[sup["s_nationkey"] == n3, "s_suppkey"].astype(int))

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    std_parts = set(part.loc[part["p_type"] == "STANDARD",
                             "p_partkey"].astype(int))

    o2y_ref = ray.put(o2y)
    n3_ref = ray.put(n3_supp)
    parts_ref = ray.put(std_parts)

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        oy = ray.get(o2y_ref)
        ns = ray.get(n3_ref)
        sp = ray.get(parts_ref)
        y = df["l_orderkey"].map(oy)
        keep = y.notna() & df["l_partkey"].isin(sp)
        if not keep.any():
            return pd.DataFrame(
                {"o_year": pd.Series([], dtype=np.int64),
                 "nation_vol_c": pd.Series([], dtype=np.int64),
                 "total_vol_c": pd.Series([], dtype=np.int64)}
            )
        d = df.loc[keep]
        vol = (
            np.round(d["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.round(d["l_discount"].to_numpy() * 100).astype(np.int64))
            // 100
        )
        is_n3 = d["l_suppkey"].isin(ns).to_numpy()
        g = pd.DataFrame(
            {
                "o_year": y[keep].astype(np.int64).to_numpy(),
                "nation_vol_c": np.where(is_n3, vol, 0),
                "total_vol_c": vol,
            }
        ).groupby("o_year", as_index=False).sum()
        return g

    out = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("o_year")
        .aggregate(
            Sum("nation_vol_c", alias_name="nation_vol_c"),
            Sum("total_vol_c", alias_name="total_vol_c"),
        )
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    out["share_ppm"] = (
        out["nation_vol_c"].astype(object) * 1_000_000
        // out["total_vol_c"]
    ).astype("int64")
    for c in ("o_year", "nation_vol_c", "total_vol_c"):
        out[c] = out[c].astype("int64")
    return out[["o_year", "nation_vol_c", "total_vol_c", "share_ppm"]]


# --------------------------------------------------------------------------
# Convex-hull content extent over the image payload table (q346)
# --------------------------------------------------------------------------

_HULL_SQL = (
    "SELECT fmt, n_images, n_fg, sum_hull_area2, sum_hull_verts "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/hull_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q346_convex_hull", sql=_HULL_SQL)
def q346_convex_hull(sf_dir: str):
    """Convex hull of each image's bright-pixel set
    (stages/images.py::ConvexHullStats): content extent for auto-crop /
    density audits.  Candidates reduce vectorized to per-row
    x-extremes, then an exact-integer monotone chain; decode and hull
    stay in the actor pool, three int64 scalars per image shuffle.
    Oracle fixture: INDEPENDENT Jarvis-march twin (gift wrapping).
    Output per fmt: (fmt, n_images, n_fg, sum_hull_area2,
    sum_hull_verts)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import ConvexHullStats

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        ConvexHullStats, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_fg", "hull_verts", "hull_area2"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "n_fg": g["n_fg"].sum(),
                "sum_hull_area2": g["hull_area2"].sum(),
                "sum_hull_verts": g["hull_verts"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_fg", alias_name="n_fg"),
            Sum("sum_hull_area2", alias_name="sum_hull_area2"),
            Sum("sum_hull_verts", alias_name="sum_hull_verts"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_fg", "sum_hull_area2", "sum_hull_verts"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "n_fg", "sum_hull_area2",
                "sum_hull_verts"]]


# --------------------------------------------------------------------------
# Priority-sampling (Duffield-Lund-Thorup) subset-sum audit (q347)
# --------------------------------------------------------------------------

_PS_K = 64
_PS_SCALE = 1 << 64  # priority = w * 2^64 // hash  (exact integers)

_PS_SQL = f"""
WITH w AS (
  SELECT o_orderkey AS okey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_c,
         o_orderpriority = '1-URGENT' AS in_s,
         GREATEST(md5_number_lower(CAST(o_orderkey AS VARCHAR)), 1) AS h
  FROM orders
),
q AS (SELECT *, CAST(w_c AS HUGEINT) * {_PS_SCALE} // h AS pri FROM w),
r AS (SELECT *, row_number() OVER (ORDER BY pri DESC, okey) AS rn FROM q),
tau AS (SELECT COALESCE(MAX(CASE WHEN rn = {_PS_K + 1} THEN pri END), 0)
               AS tau FROM r),
s AS (SELECT * FROM r WHERE rn <= {_PS_K}),
x AS (SELECT CAST(SUM(w_c) AS BIGINT) AS exact_total_c,
             CAST(SUM(CASE WHEN in_s THEN w_c ELSE 0 END) AS BIGINT)
               AS exact_urgent_c,
             CAST(COUNT(*) AS BIGINT) AS n_items FROM w),
e AS (SELECT
        CAST(SUM(GREATEST(CAST(w_c AS HUGEINT), (SELECT tau FROM tau)))
             AS BIGINT) AS est_total_c,
        CAST(SUM(CASE WHEN in_s
                 THEN GREATEST(CAST(w_c AS HUGEINT), (SELECT tau FROM tau))
                 ELSE 0 END) AS BIGINT) AS est_urgent_c
      FROM s)
SELECT n_items, CAST((SELECT tau FROM tau) AS BIGINT) AS tau,
       exact_total_c, est_total_c,
       CAST(ABS(est_total_c - exact_total_c) * 10000 // exact_total_c
            AS BIGINT) AS err_total_bp,
       exact_urgent_c, est_urgent_c
FROM x, e
"""


@query("q347_priority_sampling", sql=_PS_SQL)
def q347_priority_sampling(sf_dir: str):
    """Priority sampling (Duffield-Lund-Thorup): draw ONE weighted
    sample of k=64 orders (priority = weight / uniform(hash)) and
    estimate BOTH the total order value and an arbitrary-subset sum
    (the '1-URGENT' slice) as sum of max(w_i, tau) over sampled subset
    members, tau = the (k+1)-th priority.  Priorities are EXACT
    integers (w * 2^64 // md5_lower64, Python ints — they exceed
    int64), identical to the DuckDB HUGEINT oracle.  The distributed
    plan: each batch emits only its local top-(k+1) candidates
    (a batch's member of the global top-(k+1) is in that batch's
    top-(k+1)), so the driver merge sees k+1 rows per block while the
    exact totals flow through ordinary Sum aggregates.  Output:
    (n_items, tau, exact_total_c, est_total_c, err_total_bp,
    exact_urgent_c, est_urgent_c)."""
    import hashlib

    ods = _read(sf_dir, "orders",
                ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        w = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        in_s = (df["o_orderpriority"] == "1-URGENT").to_numpy()
        cand = []
        for okey, wc, fl in zip(k, w, in_s):
            h = int.from_bytes(
                hashlib.md5(str(int(okey)).encode()).digest()[8:], "little"
            ) or 1
            cand.append((int(wc) * _PS_SCALE // h, int(okey), int(wc),
                         bool(fl)))
        cand.sort(key=lambda t: (-t[0], t[1]))
        top = cand[: _PS_K + 1]
        return pd.DataFrame(
            {
                "okey": [t[1] for t in top],
                "w_c": [t[2] for t in top],
                "in_s": [t[3] for t in top],
                "pri_str": [str(t[0]) for t in top],  # > int64: ship as str
                "n_items": [len(df)] + [0] * (len(top) - 1),
                "sum_w": [int(w.sum())] + [0] * (len(top) - 1),
                "sum_w_s": [int(w[in_s].sum())] + [0] * (len(top) - 1),
            }
        )

    parts = ods.map_batches(partial, batch_format="pandas").to_pandas()
    n_items = int(parts["n_items"].sum())
    exact_total = int(parts["sum_w"].sum())
    exact_urgent = int(parts["sum_w_s"].sum())
    cand = sorted(
        (
            (int(p), int(o), int(wc), bool(fl))
            for p, o, wc, fl in zip(parts["pri_str"], parts["okey"],
                                    parts["w_c"], parts["in_s"])
        ),
        key=lambda t: (-t[0], t[1]),
    )
    top = cand[:_PS_K]
    tau = cand[_PS_K][0] if len(cand) > _PS_K else 0
    est_total = sum(max(wc, tau) for _, _, wc, _ in top)
    est_urgent = sum(max(wc, tau) for _, _, wc, fl in top if fl)
    return pd.DataFrame(
        {
            "n_items": [n_items],
            "tau": [tau],
            "exact_total_c": [exact_total],
            "est_total_c": [est_total],
            "err_total_bp": [abs(est_total - exact_total) * 10000
                             // exact_total],
            "exact_urgent_c": [exact_urgent],
            "est_urgent_c": [est_urgent],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Bipartite butterfly (2x2 biclique) count (q348)
# --------------------------------------------------------------------------

_BFLY_SQL = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY p),
wedge AS (
  SELECT e1.s AS s1, e2.s AS s2, CAST(COUNT(*) AS BIGINT) AS m
  FROM e e1 JOIN e e2 ON e1.p = e2.p AND e1.s < e2.s
  GROUP BY 1, 2
)
SELECT (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e) AS n_left,
       (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) FROM e) AS n_right,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS n_butterflies
FROM wedge
"""


@query("q348_butterfly_count", sql=_BFLY_SQL)
def q348_butterfly_count(sf_dir: str):
    """Exact butterfly (2x2 biclique) count of the supplier-part
    bipartite graph — the bipartite clustering primitive (BUTTERFLIES
    are to bipartite graphs what triangles are to unipartite ones).
    Plan: distinct edges via a hash-bucketed combine
    (ops/aggregate.py::bucketed_groupby — native sort-groupby is the
    wrong tool for this key cardinality), then
    ops/graph.py::butterfly_fold with plan="auto": the additive
    co-occurrence-matrix fold while the left side fits (≤30k nodes,
    the case here), switching to the (s1,s2)-bucketed wedge-pair
    shuffle with hot-vertex salting beyond it (tests force both plans
    and compare).  Output: (n_left, n_right, n_edges, n_wedges,
    n_butterflies)."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.graph import butterfly_fold

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    n_rows = li.count()  # metadata-only on parquet

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().rename(
            columns={"l_suppkey": "s", "l_partkey": "p"}
        )

    edges = bucketed_groupby(
        li.map_batches(dedup, batch_format="pandas"),
        ["s", "p"],
        lambda df: df.drop_duplicates(),
        expected_rows=n_rows,
    ).materialize()
    n_edges = edges.count()

    def _distinct(col: str) -> int:
        return bucketed_groupby(
            edges,
            col,
            lambda df: df[[col]].drop_duplicates(),
            expected_rows=n_edges,
        ).count()

    n_left = _distinct("s")
    n_right = _distinct("p")

    # Butterfly fold: plan="auto" — the additive co-occurrence-matrix
    # fold while the left side (suppliers) is small, the salted
    # wedge-pair shuffle at page scale (ops/graph.py::butterfly_fold
    # documents both).
    n_wedges, n_butterflies = butterfly_fold(
        edges, n_left=n_left, expected_edges=n_edges, plan="auto"
    )
    return pd.DataFrame(
        {
            "n_left": [n_left],
            "n_right": [n_right],
            "n_edges": [n_edges],
            "n_wedges": [n_wedges],
            "n_butterflies": [n_butterflies],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Chi-square independence audit: event type x value band (q349)
# --------------------------------------------------------------------------

_CHI2_SQL = """
WITH c AS (
  SELECT event_type AS et,
         CASE WHEN CAST(ROUND(value * 100) AS BIGINT) < 2000 THEN 0
              WHEN CAST(ROUND(value * 100) AS BIGINT) < 5000 THEN 1
              WHEN CAST(ROUND(value * 100) AS BIGINT) < 10000 THEN 2
              ELSE 3 END AS vb
  FROM events
),
o AS (SELECT et, vb, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1, 2),
grid AS (
  SELECT e.et, v.vb, COALESCE(o.n, 0) AS n
  FROM (SELECT DISTINCT et FROM o) e
  CROSS JOIN (SELECT DISTINCT vb FROM o) v
  LEFT JOIN o ON o.et = e.et AND o.vb = v.vb
),
rt AS (SELECT et, SUM(n) AS r FROM grid GROUP BY 1),
ct AS (SELECT vb, SUM(n) AS c FROM grid GROUP BY 1),
tot AS (SELECT SUM(n) AS nn FROM grid)
SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT g.et) - 1) * (COUNT(DISTINCT g.vb) - 1)
            AS BIGINT) AS dof,
       CAST(SUM(
         (g.n * nn - r * c) * (g.n * nn - r * c) * 1000000
           // (r * c * nn)
       ) AS BIGINT) AS chi2_scaled
FROM grid g JOIN rt ON rt.et = g.et JOIN ct ON ct.vb = g.vb, tot
"""


@query("q349_chi2_independence", sql=_CHI2_SQL)
def q349_chi2_independence(sf_dir: str):
    """Pearson chi-square independence audit of event_type x value
    band (fixed cent thresholds) — the categorical-drift / feature-
    dependence primitive.  Integer-exact: with N, row totals r and
    column totals c, each cell contributes
    (O*N - r*c)^2 * 1e6 // (r*c*N) — floored PER CELL in Python ints
    (the squared numerators exceed int64), matching the DuckDB HUGEINT
    oracle term for term, including EMPTY grid cells (O=0 cells still
    carry E>0).  Plan: one combiner-style partial count per batch, a
    cell-count-sized groupby, driver math on the <=R*C grid.  Output:
    (n_rows, n_cells, dof, chi2_scaled)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        vb = np.select([vc < 2000, vc < 5000, vc < 10000],
                       [0, 1, 2], default=3)
        return (
            pd.DataFrame({"et": df["event_type"].to_numpy(), "vb": vb})
            .groupby(["et", "vb"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    grid = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["et", "vb"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ets = sorted(grid["et"].unique())
    vbs = sorted(grid["vb"].unique())
    full = (
        pd.MultiIndex.from_product([ets, vbs], names=["et", "vb"])
        .to_frame(index=False)
        .merge(grid, on=["et", "vb"], how="left")
        .fillna({"n": 0})
    )
    nn = int(full["n"].sum())
    r = full.groupby("et")["n"].transform("sum").astype(int)
    c = full.groupby("vb")["n"].transform("sum").astype(int)
    chi2 = sum(
        (int(o) * nn - int(ri) * int(ci)) ** 2 * 1_000_000
        // (int(ri) * int(ci) * nn)
        for o, ri, ci in zip(full["n"], r, c)
    )
    return pd.DataFrame(
        {
            "n_rows": [nn],
            "n_cells": [len(full)],
            "dof": [(len(ets) - 1) * (len(vbs) - 1)],
            "chi2_scaled": [chi2],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Union-of-rectangles area via slab decomposition (q350)
# --------------------------------------------------------------------------

_RECT_SLABS = 64
_RECT_DOM = 101_000  # x/y origins < 100000, extents <= 1000

_RECT_SQL = (
    "SELECT n_rects, sum_rect_area, union_area "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/rectunion_sf0.01.parquet')"
)


def _order_rects(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic synthetic rectangles, one per order (exact ints)."""
    import hashlib

    k = df["o_orderkey"].to_numpy(np.int64)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(x)).encode()).digest()[8:],
                           "little")
            for x in k
        ),
        np.uint64,
        len(k),
    ).astype(object)
    x0 = np.array([int(v) % 100_000 for v in h], np.int64)
    y0 = np.array([int(v) // 100_000 % 100_000 for v in h], np.int64)
    w = k % 900 + 100
    ht = (k * 7) % 900 + 100
    return pd.DataFrame({"x0": x0, "x1": x0 + w, "y0": y0, "y1": y0 + ht})


def _sweep_area(rects: pd.DataFrame) -> int:
    """Exact union area: x-event sweep with a compressed-y coverage
    count array (covered length recomputed per event span)."""
    if rects.empty:
        return 0
    ys = np.unique(np.concatenate([rects["y0"].to_numpy(),
                                   rects["y1"].to_numpy()]))
    seg_len = np.diff(ys).astype(np.int64)
    y_pos = {int(v): i for i, v in enumerate(ys)}
    events = []  # (x, +1/-1, y0_idx, y1_idx)
    for x0, x1, y0, y1 in rects[["x0", "x1", "y0", "y1"]].itertuples(
            index=False):
        events.append((int(x0), 1, y_pos[int(y0)], y_pos[int(y1)]))
        events.append((int(x1), -1, y_pos[int(y0)], y_pos[int(y1)]))
    events.sort()
    cnt = np.zeros(len(ys) - 1, np.int64)
    area = 0
    prev_x = events[0][0]
    for x, d, i0, i1 in events:
        if x > prev_x:
            area += int(seg_len[cnt > 0].sum()) * (x - prev_x)
            prev_x = x
        cnt[i0:i1] += d
    return area


@query("q350_rect_union_area", sql=_RECT_SQL)
def q350_rect_union_area(sf_dir: str):
    """Exact area of the union of 15k+ axis-aligned rectangles (one
    deterministic rect per order) — the coverage/overlap primitive
    behind viewport dedup and tile planning.  DISTRIBUTED by slab
    decomposition: the x-axis splits into 64 fixed slabs, each rect is
    REPLICATED (clipped) to the slabs it overlaps via a flat-map, and
    each slab runs an independent event sweep over a compressed-y
    coverage array — slabs partition the plane, so slab areas sum
    exactly, no halo needed.  The oracle fixture is an INDEPENDENT
    x-strip + y-interval-merge twin over the unsliced input
    (tools/gen_oracle_fixtures.py::gen_rectunion).  Output:
    (n_rects, sum_rect_area, union_area)."""
    ods = _read(sf_dir, "orders", ["o_orderkey"])
    slab_w = _RECT_DOM // _RECT_SLABS + 1

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        r = _order_rects(df)
        outs = []
        for x0, x1, y0, y1 in r.itertuples(index=False):
            for s in range(int(x0) // slab_w, (int(x1) - 1) // slab_w + 1):
                lo, hi = s * slab_w, (s + 1) * slab_w
                outs.append((s, max(int(x0), lo), min(int(x1), hi),
                             int(y0), int(y1)))
        out = pd.DataFrame(
            outs, columns=["slab", "x0", "x1", "y0", "y1"]
        )
        # per-batch partials for the exact-total audit columns
        out["n_rects"] = 0
        out["rect_area"] = 0
        if len(r):
            out.loc[out.index[0], "n_rects"] = len(r)
            out.loc[out.index[0], "rect_area"] = int(
                ((r["x1"] - r["x0"]) * (r["y1"] - r["y0"])).sum()
            )
        return out

    from texrex_ray.ops.aggregate import bucketed_groupby

    exploded = ods.map_batches(explode, batch_format="pandas").materialize()
    n_rects = int(exploded.sum("n_rects"))
    sum_rect_area = int(exploded.sum("rect_area"))

    def slab_sweep(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, sub in df.groupby("slab", sort=False):
            outs.append((int(s), _sweep_area(sub)))
        return pd.DataFrame(outs, columns=["slab", "area"])

    areas = bucketed_groupby(
        exploded.drop_columns(["n_rects", "rect_area"]),
        "slab",
        slab_sweep,
        n_buckets=16,
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_rects": [n_rects],
            "sum_rect_area": [sum_rect_area],
            "union_area": [int(areas["area"].sum())],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Rolling 7-row minimum with halo exchange (q351)
# --------------------------------------------------------------------------

_ROLL_W = 7

_ROLLMIN_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS value_c,
         MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           ORDER BY ts, event_id
           ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW
         ) AS win_min
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(win_min) AS BIGINT) AS sum_win_min_c,
       CAST(SUM(CASE WHEN win_min = value_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_self_min
FROM v
"""


@query("q351_rolling_min", sql=_ROLLMIN_SQL)
def q351_rolling_min(sf_dir: str):
    """Global 7-row rolling minimum over the (ts, event_id)-ordered
    event stream — the monitoring floor/debounce primitive — WITHOUT a
    global sort: ops/window.py::windowed_min range-slices the order
    key and exchanges only each slice's (window-1)-row HALO through
    the driver, then computes the in-slice rolling min vectorized.
    The order key packs (epoch_us, event_id) so ties are impossible.
    Output: (n_rows, sum_win_min_c, n_self_min)."""
    from texrex_ray.ops.window import windowed_min

    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])
    min_us = int(pd.Timestamp(ev.min("ts")).value // 1000)

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # exact (ts, event_id) total order in ONE int64: rebased stamps
        # (<= ~2^42 us for a multi-week window) shifted over 21 id bits
        span = us - min_us
        if span.max(initial=0) >= (1 << 42) or eid.max(initial=0) >= (1 << 21):
            raise ValueError(
                "q351 packed order key overflow: widen to (ord_hi, ord_lo)"
            )
        ok = (span << 21) | eid
        vc = np.round(t["value"].to_numpy(zero_copy_only=False) * 100
                      ).astype(np.int64)
        return pa.table({"ord": ok, "us": us, "eid": eid, "value_c": vc})

    base = ev.map_batches(derive, batch_format="pyarrow")
    rolled = windowed_min(base, "ord", "value_c", window=_ROLL_W,
                          out="win_min")

    def fold(t: pa.Table) -> pa.Table:
        wm = t["win_min"].to_numpy(zero_copy_only=False)
        vc = t["value_c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "sum_win_min_c": pa.array([int(wm.sum())], pa.int64()),
                "n_self_min": pa.array([int((wm == vc).sum())], pa.int64()),
            }
        )

    out = (
        rolled.map_batches(fold, batch_format="pyarrow")
        .groupby(None)
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_win_min_c", alias_name="sum_win_min_c"),
            Sum("n_self_min", alias_name="n_self_min"),
        )
        .to_pandas()
    )
    return out[["n_rows", "sum_win_min_c", "n_self_min"]].astype("int64")


# --------------------------------------------------------------------------
# Minimum seam-carving cost over the image payload table (q352)
# --------------------------------------------------------------------------

_SEAM_SQL = (
    "SELECT fmt, n_images, sum_seam_cost, min_seam_cost, max_seam_cost "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/seam_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q352_seam_energy", sql=_SEAM_SQL)
def q352_seam_energy(sf_dir: str):
    """Minimum vertical seam cost per image (seam carving /
    content-aware-resize inner loop): gradient-energy surface + one
    vectorized min-of-three DP per row (stages/images.py::SeamEnergy).
    Low cost = a low-energy corridor (croppable background column).
    Decode and DP stay in the actor pool; one int64 per image
    shuffles.  Oracle fixture: INDEPENDENT Dijkstra twin over the same
    pixel DAG (tools/gen_oracle_fixtures.py::gen_seam).  Output per
    fmt: (fmt, n_images, sum_seam_cost, min_seam_cost,
    max_seam_cost)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import SeamEnergy

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        SeamEnergy, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "seam_cost"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["seam_cost"]
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_seam_cost": g.sum(),
                "min_seam_cost": g.min(),
                "max_seam_cost": g.max(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_seam_cost", alias_name="sum_seam_cost"),
            Min("min_seam_cost", alias_name="min_seam_cost"),
            Max("max_seam_cost", alias_name="max_seam_cost"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_seam_cost", "min_seam_cost", "max_seam_cost"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "sum_seam_cost", "min_seam_cost",
                "max_seam_cost"]]


# --------------------------------------------------------------------------
# Kadane maximum-burst (best contiguous run) per user (q353)
# --------------------------------------------------------------------------

_KADANE_BASE = 5000  # cents: runs are scored against a 50-unit baseline

_KADANE_SQL = f"""
WITH v AS (
  SELECT user_id AS u, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) - {_KADANE_BASE} AS x
  FROM events
),
c0 AS (
  SELECT u, ts, event_id,
         SUM(x) OVER (PARTITION BY u ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM v
),
c AS (
  SELECT u, cum,
         COALESCE(MIN(cum) OVER (
             PARTITION BY u ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pmin
  FROM c0
),
b AS (
  SELECT u, MAX(cum - LEAST(pmin, 0)) AS best FROM c GROUP BY u
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(best) AS BIGINT) AS sum_best_c,
       CAST(MAX(best) AS BIGINT) AS max_best_c,
       CAST(SUM(CASE WHEN best > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_positive
FROM b
"""


@query("q353_kadane_burst", sql=_KADANE_SQL)
def q353_kadane_burst(sf_dir: str):
    """Best contiguous spend burst per user (Kadane): the maximum-sum
    NONEMPTY run of baseline-centred event values in (ts, event_id)
    order — the classic 'hottest streak' primitive.  The scan form
    used here is exchange-friendly: best = max_i (S_i - min(0,
    min_{{j<i}} S_j)) over per-user prefix sums, so each USER-COMPLETE
    bucket (one hash-bucketed combine) computes cumsum + shifted
    prefix-min vectorized — no per-row Python, one exchange.  Output:
    (n_users, sum_best_c, max_best_c, n_users_positive)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    n_rows = ev.count()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        x = (
            np.round(df["value"].to_numpy() * 100).astype(np.int64)
            - _KADANE_BASE
        )
        g = df.groupby("user_id", sort=False)
        cum = pd.Series(x, index=df.index).groupby(
            df["user_id"], sort=False
        ).cumsum().to_numpy(np.int64)
        rows = []
        start = 0
        for u, sz in g.size().items():
            c = cum[start:start + sz]
            pmin = np.concatenate(([0], np.minimum.accumulate(c)[:-1]))
            best = int((c - np.minimum(pmin, 0)).max())
            rows.append((u, best))
            start += sz
        return pd.DataFrame(rows, columns=["u", "best"])

    per = bucketed_groupby(ev, "user_id", per_user, expected_rows=n_rows)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        b = df["best"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_users": [len(b)],
                "sum_best_c": [int(b.sum())],
                "max_best_c": [int(b.max()) if len(b) else -(1 << 62)],
                "n_users_positive": [int((b > 0).sum())],
            }
        )

    out = (
        per.map_batches(fold, batch_format="pandas")
        .groupby(None)
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("sum_best_c", alias_name="sum_best_c"),
            Max("max_best_c", alias_name="max_best_c"),
            Sum("n_users_positive", alias_name="n_users_positive"),
        )
        .to_pandas()
    )
    return out[["n_users", "sum_best_c", "max_best_c",
                "n_users_positive"]].astype("int64")


# --------------------------------------------------------------------------
# Exact distributed selection (k-th smallest) without a sort (q354)
# --------------------------------------------------------------------------

_KTH_SQL = """
WITH v AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x
           FROM lineitem),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM v)
SELECT n_rows,
       (SELECT x FROM v ORDER BY x LIMIT 1
        OFFSET ((SELECT n_rows FROM n) + 9) // 10 - 1)  AS p10_c,
       (SELECT x FROM v ORDER BY x LIMIT 1
        OFFSET ((SELECT n_rows FROM n) + 1) // 2 - 1)   AS p50_c,
       (SELECT x FROM v ORDER BY x LIMIT 1
        OFFSET ((SELECT n_rows FROM n) * 9 + 9) // 10 - 1) AS p90_c
FROM n
"""


@query("q354_exact_kth", sql=_KTH_SQL)
def q354_exact_kth(sf_dir: str):
    """EXACT order statistics (p10/p50/p90 as k-th smallest, k =
    ceil(q*n)) of the price column WITHOUT any global sort: pass 1
    builds a coarse value histogram (value >> 8 buckets, one
    combiner-style groupby whose result is histogram-sized); the
    driver walks the cumulative counts to locate each target's bucket
    and residual rank; pass 2 filters just those buckets' rows (a
    predicate-pushdown scan returning ~n/buckets values) and picks the
    residual ranks from the tiny sorted slices.  Two streaming passes,
    no materialization — the distributed-selection replacement for
    ORDER BY ... OFFSET.  Output: (n_rows, p10_c, p50_c, p90_c)."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def hist(t: pa.Table) -> pa.Table:
        v = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        b, c = np.unique(v >> 8, return_counts=True)
        return pa.table({"b": b, "c": c.astype(np.int64)})

    counts = (
        li.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    n = int(counts["c"].sum())
    targets = {
        "p10_c": (n + 9) // 10,
        "p50_c": (n + 1) // 2,
        "p90_c": (n * 9 + 9) // 10,
    }
    cum = counts["c"].cumsum().to_numpy(np.int64)
    buckets = counts["b"].to_numpy(np.int64)
    need: dict[int, list[tuple[str, int]]] = {}
    for name, k in targets.items():
        i = int(np.searchsorted(cum, k))
        resid = k - (int(cum[i - 1]) if i else 0)  # 1-indexed within bucket
        need.setdefault(int(buckets[i]), []).append((name, resid))
    need_ref = ray.put(set(need))

    def in_buckets(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        v = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = np.isin(v >> 8, list(want))
        return pa.table({"x": v[keep]})

    vals = li.map_batches(in_buckets, batch_format="pyarrow").to_pandas()
    x = np.sort(vals["x"].to_numpy(np.int64))
    out = {"n_rows": n}
    for b, wants in need.items():
        in_b = x[(x >> 8) == b]
        for name, resid in wants:
            out[name] = int(in_b[resid - 1])
    return pd.DataFrame({k: [v] for k, v in out.items()}).astype("int64")[
        ["n_rows", "p10_c", "p50_c", "p90_c"]
    ]


# --------------------------------------------------------------------------
# Learned-index audit: interpolation rank error (q355)
# --------------------------------------------------------------------------

_INTERP_SQL = """
WITH v AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x
           FROM lineitem),
r AS (SELECT x, RANK() OVER (ORDER BY x) AS rnk FROM v),
mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi, CAST(COUNT(*) AS BIGINT) AS n
       FROM v),
e AS (
  SELECT ABS(rnk - ((x - lo) * (n - 1) // (hi - lo) + 1)) AS err
  FROM r, mm
)
SELECT (SELECT n FROM mm) AS n_rows,
       (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) FROM v) AS n_distinct,
       CAST(MAX(err) AS BIGINT) AS max_abs_err,
       CAST(SUM(err) AS BIGINT) AS sum_abs_err
FROM e
"""


@query("q355_interpolation_rank", sql=_INTERP_SQL)
def q355_interpolation_rank(sf_dir: str):
    """Learned-index audit: how far the straight-line model
    ``rank ~ (key - min) * (n-1) / (max - min) + 1`` strays from each
    key's true RANK (1 + count of strictly smaller rows) — the exact
    error bound a PGM/RMI-style index would need to store for this
    key distribution.  NO GLOBAL SORT: per-value counts come from one
    combiner groupby, and the true rank of every distinct value is an
    EXCLUSIVE prefix sum of counts in value order —
    ops/window.py::prefix_scan_sum over the (value, count) table
    (range slices + driver carries).  Errors then aggregate per
    distinct value weighted by count.  Output:
    (n_rows, n_distinct, max_abs_err, sum_abs_err)."""
    from texrex_ray.ops.window import prefix_scan_sum

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def vc(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            np.round(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64),
            return_counts=True,
        )
        return pa.table({"x": v, "c": c.astype(np.int64)})

    from texrex_ray.ops.aggregate import bucketed_groupby

    counts = bucketed_groupby(
        li.map_batches(vc, batch_format="pyarrow"),
        "x",
        lambda df: df.groupby("x", as_index=False)["c"].sum(),
        expected_rows=li.count(),
    ).materialize()  # re-read by min/max/sum + the prefix scan below
    lo = int(counts.min("x"))
    hi = int(counts.max("x"))
    n = int(counts.sum("c"))
    n_distinct = counts.count()
    ranked = prefix_scan_sum(counts, "x", "c", out="smaller")

    def err(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        rnk = t["smaller"].to_numpy(zero_copy_only=False) + 1
        pred = (x - lo) * (n - 1) // (hi - lo) + 1
        e = np.abs(rnk - pred)
        return pa.table(
            {
                "max_abs_err": pa.array([int(e.max())], pa.int64()),
                "sum_abs_err": pa.array([int((e * c).sum())], pa.int64()),
            }
        )

    agg = (
        ranked.map_batches(err, batch_format="pyarrow")
        .groupby(None)
        .aggregate(
            Max("max_abs_err", alias_name="max_abs_err"),
            Sum("sum_abs_err", alias_name="sum_abs_err"),
        )
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_rows": [n],
            "n_distinct": [n_distinct],
            "max_abs_err": [int(agg["max_abs_err"].iloc[0])],
            "sum_abs_err": [int(agg["sum_abs_err"].iloc[0])],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# PNG-style residual entropy-coding bound per image (q356)
# --------------------------------------------------------------------------

_RESID_SQL = (
    "SELECT fmt, n_images, sum_raw_bits, sum_huff_bits, ratio_ppm "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/resid_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q356_residual_coding_bound", sql=_RESID_SQL)
def q356_residual_coding_bound(sf_dir: str):
    """Left-predictor residual Huffman bound per image (the PNG 'Sub'
    filter + optimal-prefix-code audit) — how many bits the payload
    column actually needs after cheap spatial prediction, the storage-
    planning counterpart of q229/q273.  Decode, residual and Huffman
    run in the actor pool; two int64s per image shuffle.  Oracle
    fixture: the INDEPENDENT two-queue Huffman twin.  Output per fmt:
    (fmt, n_images, sum_raw_bits, sum_huff_bits, ratio_ppm)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import ResidualCodingBound

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        ResidualCodingBound, concurrency=2, batch_size=64,
        batch_format="pyarrow",
    ).select_columns(["fmt", "raw_bits", "huff_bits"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_raw_bits": g["raw_bits"].sum(),
                "sum_huff_bits": g["huff_bits"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_raw_bits", alias_name="sum_raw_bits"),
            Sum("sum_huff_bits", alias_name="sum_huff_bits"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    out["ratio_ppm"] = (
        out["sum_huff_bits"] * 1_000_000 // out["sum_raw_bits"]
    ).astype("int64")
    for c in ("n_images", "sum_raw_bits", "sum_huff_bits"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "sum_raw_bits", "sum_huff_bits",
                "ratio_ppm"]]


# --------------------------------------------------------------------------
# t-closeness privacy audit (ordered EMD per quasi-group) (q357)
# --------------------------------------------------------------------------

_TC_SQL = """
WITH c AS (
  SELECT c_nationkey AS grp,
         (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS band
  FROM customer
),
bands AS (SELECT DISTINCT band FROM c),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_bands FROM bands),
gb AS (SELECT grp, band, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1, 2),
grid AS (
  SELECT g.grp, b.band, COALESCE(gb.n, 0) AS n
  FROM (SELECT DISTINCT grp FROM c) g
  CROSS JOIN bands b
  LEFT JOIN gb ON gb.grp = g.grp AND gb.band = b.band
),
cums1 AS (
  SELECT grp, band, n,
         SUM(n) OVER (PARTITION BY grp ORDER BY band
                      ROWS UNBOUNDED PRECEDING) AS cg,
         SUM(n) OVER (PARTITION BY grp) AS ng,
         SUM(n) OVER () AS nn
  FROM grid
),
cums AS (
  SELECT *, SUM(cg) OVER (PARTITION BY band) AS ca FROM cums1
),
t AS (
  SELECT grp, CAST(MAX(ng) AS BIGINT) AS n_g,
         CAST(SUM(ABS(cg * nn - ca * ng)) * 1000000
              // (MAX(ng) * MAX(nn) * ((SELECT m_bands FROM m) - 1))
              AS BIGINT) AS t_ppm
  FROM cums GROUP BY grp
)
SELECT CAST(grp AS BIGINT) AS grp, n_g, t_ppm FROM t ORDER BY grp
"""


@query("q357_t_closeness", sql=_TC_SQL)
def q357_t_closeness(sf_dir: str):
    """t-closeness audit: for each quasi-identifier group (customer
    nation), the ordered earth-mover's distance between the group's
    sensitive-attribute distribution (account-balance bands) and the
    global one — EMD over an ordered 1-D attribute is the mean
    absolute cumulative gap, computed here EXACTLY as
    sum_k |cumg_k * N - cuma_k * n_g| * 1e6 // (n_g * N * (m-1))
    (one floor at the end, Python ints).  The k-anonymity/l-diversity
    (q176/q226) completion of the privacy suite.  Plan: one
    combiner-style (group, band) count groupby (grid-sized), driver
    math over the <=25x11 grid.  Output per group:
    (grp, n_g, t_ppm) ordered by group."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        band = (
            np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
            + 100_000
        ) // 100_000
        return (
            pd.DataFrame({"grp": df["c_nationkey"].to_numpy(np.int64),
                          "band": band})
            .groupby(["grp", "band"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    grid = (
        cust.map_batches(partial, batch_format="pandas")
        .groupby(["grp", "band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    grps = sorted(grid["grp"].unique())
    bands = sorted(grid["band"].unique())
    m = len(bands)
    full = (
        pd.MultiIndex.from_product([grps, bands], names=["grp", "band"])
        .to_frame(index=False)
        .merge(grid, on=["grp", "band"], how="left")
        .fillna({"n": 0})
        .sort_values(["grp", "band"])
    )
    nn = int(full["n"].sum())
    rows = []
    ca = (
        full.groupby("band")["n"].sum().reindex(bands).cumsum()
        .astype(int).tolist()
    )
    for g, sub in full.groupby("grp"):
        cg = sub["n"].cumsum().astype(int).tolist()
        n_g = int(sub["n"].sum())
        num = sum(abs(a * nn - b * n_g) for a, b in zip(cg, ca))
        rows.append((int(g), n_g, num * 1_000_000 // (n_g * nn * (m - 1))))
    return pd.DataFrame(rows, columns=["grp", "n_g", "t_ppm"]).astype(
        "int64"
    )


# --------------------------------------------------------------------------
# 3x3 median-filter denoise audit over the image payload table (q358)
# --------------------------------------------------------------------------

_MED_SQL = (
    "SELECT fmt, n_images, n_interior, sum_abs_change, n_changed "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/median_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q358_median_filter", sql=_MED_SQL)
def q358_median_filter(sf_dir: str):
    """3x3 median-filter noise audit per image
    (stages/images.py::MedianFilter): the L1 mass a median denoiser
    would remove — high sum_abs_change flags salt-and-pepper noise /
    dithering in the payload.  The median-of-9 runs as a 19-exchange
    sorting NETWORK (vectorized min/max planes, zero per-pixel
    Python); pixels stay in the actor pool.  Oracle fixture: the
    INDEPENDENT stack-and-np.median twin.  Output per fmt:
    (fmt, n_images, n_interior, sum_abs_change, n_changed)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import MedianFilter

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        MedianFilter, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_interior", "sum_abs_change", "n_changed"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "n_interior": g["n_interior"].sum(),
                "sum_abs_change": g["sum_abs_change"].sum(),
                "n_changed": g["n_changed"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_interior", alias_name="n_interior"),
            Sum("sum_abs_change", alias_name="sum_abs_change"),
            Sum("n_changed", alias_name="n_changed"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_interior", "sum_abs_change", "n_changed"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "n_interior", "sum_abs_change",
                "n_changed"]]


# --------------------------------------------------------------------------
# Sole-latest supplier on shared orders (TPC-H Q21 shape) (q359)
# --------------------------------------------------------------------------

_Q21_SQL = """
WITH w AS (
  SELECT l1.l_suppkey
  FROM lineitem l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_shipdate > l1.l_shipdate)
    AND NOT EXISTS (SELECT 1 FROM lineitem l4
                    WHERE l4.l_orderkey = l1.l_orderkey
                      AND l4.l_shipdate = l1.l_shipdate
                      AND l4.l_suppkey <> l1.l_suppkey)
)
SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM w GROUP BY 1
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


@query("q359_waiting_orders", sql=_Q21_SQL)
def q359_waiting_orders(sf_dir: str):
    """TPC-H Q21 shape — 'suppliers who kept everyone waiting': count,
    per supplier, the multi-supplier orders where that supplier ALONE
    holds the strictly latest ship date (every other supplier shipped
    earlier, and no second line ties the max).  The EXISTS / double
    NOT EXISTS nest collapses to ONE order-complete bucketed combine:
    within each order, find the max ship date, test that exactly one
    LINE attains it, that its supplier is unique at the max, and that
    the order spans >= 2 suppliers — then one small groupby counts
    winners.  Output: top-20 (s_suppkey, numwait) by count."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    n_rows = li.count()

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized: per-order supplier spread, max date, and the
        # lines at the max — EVERY line at a unique-supplier max
        # qualifies in the SQL (l4 only excludes OTHER suppliers at
        # that date), so numwait counts lines, not orders
        df = df.assign(
            d=df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        )
        g = df.groupby("l_orderkey")
        nsupp = g["l_suppkey"].nunique()
        mx = g["d"].transform("max")
        at = df[df["d"] == mx]
        ga = at.groupby("l_orderkey")["l_suppkey"]
        per = pd.DataFrame(
            {
                "nsupp": nsupp,
                "n_at": ga.size(),
                "nuniq_at": ga.nunique(),
                "supp": ga.first(),
            }
        )
        win = per[(per["nsupp"] >= 2) & (per["nuniq_at"] == 1)]
        return pd.DataFrame(
            {
                "s_suppkey": win["supp"].to_numpy(np.int64),
                "numwait": win["n_at"].to_numpy(np.int64),
            }
        )

    winners = bucketed_groupby(li, "l_orderkey", per_order,
                               expected_rows=n_rows)

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("s_suppkey", as_index=False)["numwait"].sum()

    out = (
        winners.map_batches(cnt, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .to_pandas()
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out[["s_suppkey", "numwait"]].astype("int64")


# --------------------------------------------------------------------------
# Maximal-marginal-relevance diverse selection over embeddings (q360)
# --------------------------------------------------------------------------

_MMR_K = 10
_MMR_SCALE = 1_000_000  # embeddings fixed-pointed at 1e6

_MMR_SQL = (
    "SELECT rank, vec_id, score "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/mmr_sf0.01.parquet') "
    "ORDER BY rank"
)


def _embed_int(e) -> np.ndarray:
    return np.round(np.asarray(e, np.float64) * _MMR_SCALE).astype(np.int64)


@query("q360_mmr_selection", sql=_MMR_SQL)
def q360_mmr_selection(sf_dir: str):
    """Maximal marginal relevance: greedily pick 10 embeddings
    maximizing ``7 * rel - 3 * N * max_sim(selected)`` — the diverse-
    exemplar selection primitive for training-data curation (relevant
    AND novel).  Fully deterministic integer arithmetic: vectors are
    fixed-pointed at 1e6, relevance is the dot with the corpus SUM
    vector (so both terms share the N * dot scale), ties break on the
    smaller vec_id.  Each greedy round is one DISTRIBUTED argmax:
    map_batches scores every candidate against the broadcast selected
    set (one matmul per batch) and emits its local best; the driver
    reduces block winners — K rounds, zero shuffles.  Oracle fixture:
    INDEPENDENT serial numpy twin.  Output: (rank, vec_id, score)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        E = np.stack([_embed_int(e) for e in df["embedding"]])
        return pd.DataFrame({"s": [E.sum(axis=0).tobytes()],
                             "n": [len(df)]})

    parts = ds.map_batches(sum_partial, batch_format="pandas").to_pandas()
    S = np.sum(
        [np.frombuffer(b, np.int64) for b in parts["s"]], axis=0
    ).astype(np.int64)
    n_total = int(parts["n"].sum())
    s_ref = ray.put(S)

    selected: list[tuple[int, int]] = []  # (vec_id, score)
    sel_vecs: list[np.ndarray] = []
    for _ in range(_MMR_K):
        sel_ref = ray.put(np.stack(sel_vecs) if sel_vecs else None)
        chosen = {v for v, _ in selected}
        chosen_ref = ray.put(chosen)

        def best(df: pd.DataFrame) -> pd.DataFrame:
            sv = ray.get(sel_ref)
            ch = ray.get(chosen_ref)
            ss = ray.get(s_ref)
            keep = ~df["vec_id"].isin(ch)
            if not keep.any():
                return pd.DataFrame(
                    {"vec_id": pd.Series([], dtype=np.int64),
                     "score": pd.Series([], dtype=np.int64),
                     "vec": pd.Series([], dtype=object)}
                )
            sub = df.loc[keep]
            E = np.stack([_embed_int(e) for e in sub["embedding"]])
            rel = E @ ss
            if sv is None:
                pen = np.zeros(len(sub), np.int64)
            else:
                pen = (E @ sv.T).max(axis=1) * n_total
            score = 7 * rel - 3 * pen
            order = np.lexsort((sub["vec_id"].to_numpy(np.int64), -score))
            i = order[0]
            return pd.DataFrame(
                {"vec_id": [int(sub["vec_id"].iloc[i])],
                 "score": [int(score[i])],
                 "vec": [E[i].tobytes()]}
            )

        cands = ds.map_batches(best, batch_format="pandas").to_pandas()
        cands = cands.sort_values(["score", "vec_id"],
                                  ascending=[False, True])
        vid = int(cands["vec_id"].iloc[0])
        score = int(cands["score"].iloc[0])
        selected.append((vid, score))
        sel_vecs.append(np.frombuffer(cands["vec"].iloc[0], np.int64))

    return pd.DataFrame(
        {
            "rank": np.arange(1, _MMR_K + 1, dtype=np.int64),
            "vec_id": [v for v, _ in selected],
            "score": [s for _, s in selected],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Exact integer autocorrelation of the daily revenue series (q361)
# --------------------------------------------------------------------------

def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (DuckDB's ``//``), sign-safe —
    Python's ``//`` floors, which disagrees on negative numerators."""
    q = abs(a) // b
    return q if a >= 0 else -q


_ACF_SQL = """
WITH daily AS (
  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) // 100)
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
grid AS (
  SELECT gs.day, COALESCE(d.r, 0) AS r
  FROM (SELECT unnest(range((SELECT MIN(day) FROM daily),
                            (SELECT MAX(day) FROM daily) + 1)) AS day) gs
  LEFT JOIN daily d ON d.day = gs.day
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS tot
      FROM grid),
c AS (
  SELECT g.day, CAST(g.r AS HUGEINT) * (SELECT n FROM s)
                - (SELECT tot FROM s) AS dev,
         LEAD(g.r, 1) OVER (ORDER BY g.day) AS r1,
         LEAD(g.r, 7) OVER (ORDER BY g.day) AS r7
  FROM grid g
),
c2 AS (
  SELECT dev,
         CAST(r1 AS HUGEINT) * (SELECT n FROM s) - (SELECT tot FROM s)
           AS dev1,
         CAST(r7 AS HUGEINT) * (SELECT n FROM s) - (SELECT tot FROM s)
           AS dev7,
         r1 IS NOT NULL AS h1, r7 IS NOT NULL AS h7
  FROM c
)
SELECT (SELECT n FROM s) AS n_days,
       (SELECT tot FROM s) AS total_c,
       CAST(SUM(CASE WHEN h1 THEN dev * dev1 ELSE 0 END) * 1000000
            // SUM(dev * dev) AS BIGINT) AS acf1_ppm,
       CAST(SUM(CASE WHEN h7 THEN dev * dev7 ELSE 0 END) * 1000000
            // SUM(dev * dev) AS BIGINT) AS acf7_ppm
FROM c2
"""


@query("q361_revenue_autocorr", sql=_ACF_SQL)
def q361_revenue_autocorr(sf_dir: str):
    """Exact integer autocorrelation (lags 1 and 7) of the DAILY
    revenue series — the weekly-seasonality detector.  Missing days
    fill with 0 over the contiguous [min_day, max_day] grid; the ACF
    is computed on n-scaled deviations (dev = n*x - total, Python
    ints — products exceed int64) so no float touches the statistic,
    and the final ppm uses TRUNCATING division to match DuckDB's
    ``//``.  Plan: one combiner-style (day, partial revenue) groupby
    (day-count-sized), driver math over the ~2.5k-point series.
    Output: (n_days, total_c, acf1_ppm, acf7_ppm)."""
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        day = us // 86_400_000_000
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_h = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vol = price_c * (100 - disc_h) // 100
        d, inv = np.unique(day, return_inverse=True)
        return pa.table({"day": d, "r": np.bincount(inv, vol).astype(
            np.int64)})

    # block partials are day-count-sized already: reduce on the driver
    # (a native sort-groupby here costs ~10s for a 2.5k-key series)
    daily = (
        li.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["r"]
        .sum()
        .sort_values("day")
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[daily["day"].to_numpy(np.int64) - lo] = daily["r"].to_numpy(
        np.int64)
    n = len(series)
    tot = int(series.sum())
    dev = [int(x) * n - tot for x in series]  # Python ints: n*x ~ 2.5e12
    den = sum(d * d for d in dev)

    def acf(k: int) -> int:
        num = sum(a * b for a, b in zip(dev[:-k], dev[k:]))
        return _tdiv(num * 1_000_000, den)

    return pd.DataFrame(
        {
            "n_days": [n],
            "total_c": [tot],
            "acf1_ppm": [acf(1)],
            "acf7_ppm": [acf(7)],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Grouped weighted median (q362)
# --------------------------------------------------------------------------

_WMED_SQL = """
WITH w AS (
  SELECT c.c_nationkey AS grp,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS wt
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, c.c_custkey
),
f AS (SELECT grp, bal_c, wt FROM w WHERE wt > 0),
c AS (
  SELECT grp, bal_c, wt,
         SUM(wt) OVER (PARTITION BY grp ORDER BY bal_c
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY grp) AS tw
  FROM f
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN bal_c END) AS BIGINT)
         AS wmedian_c
FROM c GROUP BY grp ORDER BY grp
"""


@query("q362_weighted_median", sql=_WMED_SQL)
def q362_weighted_median(sf_dir: str):
    """Exact weighted median of customer balances per nation, weighted
    by each customer's order count (activity-weighted 'typical
    balance') — the lower weighted median: the smallest balance whose
    cumulative weight reaches half the total.  Plan: the weights come
    from a combiner-style per-customer order count (broadcast-joined
    onto the customer dim driver-side — both are dimension tables);
    the median itself runs in GROUP-COMPLETE hash buckets (one
    bucketed combine: sort by balance, cumsum weights, pick) — no
    global sort.  Output: (grp, total_weight, wmedian_c)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def ocount(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["o_custkey"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"ck": u.astype(np.int64),
                         "wt": c.astype(np.int64)})

    wts = (
        orders.map_batches(ocount, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("wt", alias_name="wt"))
        .to_pandas()
    )
    w_map = dict(zip(wts["ck"].astype(int), wts["wt"].astype(int)))
    w_ref = ray.put(w_map)

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(w_ref)
        wt = df["c_custkey"].map(wm)
        keep = wt.notna()
        return pd.DataFrame(
            {
                "grp": df.loc[keep, "c_nationkey"].to_numpy(np.int64),
                "bal_c": np.round(
                    df.loc[keep, "c_acctbal"].to_numpy() * 100
                ).astype(np.int64),
                "wt": wt[keep].to_numpy(np.int64),
            }
        )

    rows = cust.map_batches(attach, batch_format="pandas")

    def wmed(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby("grp", sort=False):
            sub = sub.sort_values("bal_c", kind="mergesort")
            cw = sub["wt"].to_numpy(np.int64).cumsum()
            tw = int(cw[-1])
            i = int(np.searchsorted(2 * cw, tw))
            out.append((int(g), tw, int(sub["bal_c"].iloc[i])))
        return pd.DataFrame(
            out, columns=["grp", "total_weight", "wmedian_c"]
        )

    res = (
        bucketed_groupby(rows, "grp", wmed, n_buckets=16)
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    return res[["grp", "total_weight", "wmedian_c"]].astype("int64")


# --------------------------------------------------------------------------
# Day-over-day active-user Jaccard drift (q363)
# --------------------------------------------------------------------------

_DJ_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events
),
sz AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1),
inter AS (
  SELECT a.day AS day, CAST(COUNT(*) AS BIGINT) AS i
  FROM du a JOIN du b ON b.user_id = a.user_id AND b.day = a.day + 1
  GROUP BY 1
)
SELECT s1.day AS day,
       s1.n AS n_today,
       s2.n AS n_next,
       COALESCE(i.i, 0) AS n_common,
       CAST(COALESCE(i.i, 0) * 1000000
            // (s1.n + s2.n - COALESCE(i.i, 0)) AS BIGINT) AS j_ppm
FROM sz s1
JOIN sz s2 ON s2.day = s1.day + 1
LEFT JOIN inter i ON i.day = s1.day
ORDER BY day
"""


@query("q363_day_jaccard", sql=_DJ_SQL)
def q363_day_jaccard(sf_dir: str):
    """Day-over-day Jaccard similarity of ACTIVE-USER SETS — the
    cohort-stability drift curve (a sudden dip flags a traffic-mix
    break).  Set sizes and intersections are computed WITHOUT a
    self-join: one distinct (day, user) pass, then a USER-keyed
    bucketed combine marks each user's consecutive-day pairs (sorted
    day diff == 1) and emits (day, 1) intersections — the exchange
    carries distinct pairs, the intersection join collapses into the
    per-user combine.  Integer ppm.  Output per day d:
    (day, n_today, n_next, n_common, j_ppm)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def du(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"day": us // 86_400_000_000,
             "user_id": t["user_id"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = bucketed_groupby(
        ev.map_batches(du, batch_format="pyarrow"),
        ["user_id"],
        lambda df: df.drop_duplicates(),
        n_buckets=16,
    ).materialize()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        d = df["day"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        consec = (np.diff(d) == 1) & (u[1:] == u[:-1])
        sizes = df.groupby("day").size().rename("n").reset_index()
        inter = (
            pd.DataFrame({"day": d[:-1][consec]})
            .groupby("day").size().rename("i").reset_index()
        )
        return sizes.merge(inter, on="day", how="outer").fillna(0)

    agg = (
        bucketed_groupby(pairs, "user_id", per_user, n_buckets=16)
        .to_pandas()
        .groupby("day", as_index=False)[["n", "i"]]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = agg["day"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    i = agg["i"].to_numpy(np.int64)
    rows = []
    nxt = {int(d): (int(a), int(b)) for d, a, b in zip(days, n, i)}
    for d, a, b in zip(days, n, i):
        if int(d) + 1 in nxt:
            n2 = nxt[int(d) + 1][0]
            union = int(a) + n2 - int(b)
            rows.append((int(d), int(a), n2, int(b),
                         int(b) * 1_000_000 // union))
    return pd.DataFrame(
        rows, columns=["day", "n_today", "n_next", "n_common", "j_ppm"]
    ).astype("int64")


# --------------------------------------------------------------------------
# 2x downsample detail-loss audit over the image payload table (q364)
# --------------------------------------------------------------------------

_DOWN_SQL = (
    "SELECT fmt, n_images, n_px_even, sse_down "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/down_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q364_downsample_loss", sql=_DOWN_SQL)
def q364_downsample_loss(sf_dir: str):
    """Detail destroyed by a 2x box downsample (floor-average 2x2 ->
    nearest upsample -> SSE vs original), per image — the resolution-
    budget audit for payload storage planning (pair of q242's plan).
    Exact integers; pixels never leave the actor pool
    (stages/images.py::DownsampleLoss).  Oracle fixture: INDEPENDENT
    reshape-pooling twin (different vectorization of the same spec).
    Output per fmt: (fmt, n_images, n_px_even, sse_down)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import DownsampleLoss

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        DownsampleLoss, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_px_even", "sse_down"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "n_px_even": g["n_px_even"].sum(),
                "sse_down": g["sse_down"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_px_even", alias_name="n_px_even"),
            Sum("sse_down", alias_name="sse_down"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_px_even", "sse_down"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "n_px_even", "sse_down"]]


# --------------------------------------------------------------------------
# 8x8 tile-variance pooling (flat/busy region census) (q365)
# --------------------------------------------------------------------------

_TILE_SQL = (
    "SELECT fmt, n_images, n_tiles, n_flat, n_busy "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/tiles_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q365_tile_variance", sql=_TILE_SQL)
def q365_tile_variance(sf_dir: str):
    """Flat/busy 8x8 tile census per image
    (stages/images.py::TileVariance): tiles whose exact integer
    variance numerator n*sum(x^2) - sum(x)^2 falls below / above fixed
    thresholds — the text-vs-photo region heuristic and the JPEG
    blocking-budget audit.  Reshape-pooled tile sums, zero per-pixel
    Python, three int64s per image shuffle.  Oracle fixture:
    INDEPENDENT per-tile-loop twin.  Output per fmt:
    (fmt, n_images, n_tiles, n_flat, n_busy)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import TileVariance

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        TileVariance, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_tiles", "n_flat", "n_busy"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "n_tiles": g["n_tiles"].sum(),
                "n_flat": g["n_flat"].sum(),
                "n_busy": g["n_busy"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_tiles", alias_name="n_tiles"),
            Sum("n_flat", alias_name="n_flat"),
            Sum("n_busy", alias_name="n_busy"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_tiles", "n_flat", "n_busy"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "n_tiles", "n_flat", "n_busy"]]


# --------------------------------------------------------------------------
# Per-image luminance-histogram EMD against the fmt prototype (q366)
# --------------------------------------------------------------------------

_HEMD_SQL = (
    "SELECT fmt, n_images, sum_emd_scaled, max_emd_scaled "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/hemd_sf0.01.parquet') "
    "ORDER BY fmt"
)

_HEMD_BINS = 96  # luminance 0..765 -> 8-wide bins


def _lum_hist(px: np.ndarray) -> np.ndarray:
    lum = px.astype(np.int64).sum(axis=2) // 8
    return np.bincount(lum.ravel(), minlength=_HEMD_BINS).astype(np.int64)


def emd_scaled(h_img: np.ndarray, h_proto: np.ndarray) -> int:
    """Exact 1-D earth-mover's distance between two histograms as
    sum_k |cum_img*N_proto - cum_proto*n_img| // (N_proto) — the
    image-mass-scaled integer EMD (units: pixels x bins)."""
    n_i = int(h_img.sum())
    n_p = int(h_proto.sum())
    ci = np.cumsum(h_img.astype(object))
    cp = np.cumsum(h_proto.astype(object))
    num = sum(abs(int(a) * n_p - int(b) * n_i) for a, b in zip(ci, cp))
    return num // n_p


@query("q366_hist_match_emd", sql=_HEMD_SQL)
def q366_hist_match_emd(sf_dir: str):
    """Photometric-outlier audit: 1-D earth-mover's distance between
    each image's 96-bin luminance histogram and its FORMAT's prototype
    (the summed group histogram) — large EMD flags exposure/color-cast
    outliers that histogram matching would have to move far.  TWO-PASS
    broadcast plan: pass 1 folds per-fmt histogram sums (one
    combiner-style groupby over 96-int rows); pass 2 re-decodes each
    image against the broadcast prototypes and emits one scaled-int
    EMD — pixels stay in the pool both passes.  Exact integers
    (cumulative cross-products in Python ints).  Output per fmt:
    (fmt, n_images, sum_emd_scaled, max_emd_scaled)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])

    def hist_partial(t: pa.Table) -> pa.Table:
        agg: dict[str, np.ndarray] = {}
        for raw, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            h = _lum_hist(decode_image(raw))
            agg[fmt] = agg.get(fmt, np.zeros(_HEMD_BINS, np.int64)) + h
        return pa.table(
            {
                "fmt": list(agg),
                "hist": [v.tobytes() for v in agg.values()],
            }
        )

    protos: dict[str, np.ndarray] = {}
    for row in ds.map_batches(
        hist_partial, batch_format="pyarrow"
    ).iter_rows():
        h = np.frombuffer(row["hist"], np.int64)
        protos[row["fmt"]] = protos.get(
            row["fmt"], np.zeros(_HEMD_BINS, np.int64)) + h
    protos_ref = ray.put(protos)

    def score(t: pa.Table) -> pa.Table:
        pr = ray.get(protos_ref)
        fmts, emds = [], []
        for raw, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            emds.append(emd_scaled(_lum_hist(decode_image(raw)), pr[fmt]))
            fmts.append(fmt)
        return pa.table({"fmt": fmts, "emd": pa.array(emds, pa.int64())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["emd"]
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_emd_scaled": g.sum(),
                "max_emd_scaled": g.max(),
            }
        ).reset_index()

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_emd_scaled", alias_name="sum_emd_scaled"),
            Max("max_emd_scaled", alias_name="max_emd_scaled"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_emd_scaled", "max_emd_scaled"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "sum_emd_scaled", "max_emd_scaled"]]


# --------------------------------------------------------------------------
# Hierarchical subtree rollup over the implicit order tree (q367)
# --------------------------------------------------------------------------

_TREE_SQL = """
WITH RECURSIVE anc AS (
  SELECT o_orderkey AS node, o_orderkey AS anc FROM orders
  UNION ALL
  SELECT node, (anc - 1) // 2 FROM anc WHERE anc > 0
),
val AS (SELECT o_orderkey AS node,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders),
sub AS (
  SELECT a.anc AS node, CAST(SUM(v.v) AS BIGINT) AS subtree_sum_c
  FROM anc a JOIN val v ON v.node = a.node
  GROUP BY a.anc
),
d AS (
  SELECT node, subtree_sum_c,
         CAST(floor(log2(node + 1)) AS BIGINT) AS depth
  FROM sub
)
SELECT CAST(node AS BIGINT) AS node, depth, subtree_sum_c
FROM d ORDER BY subtree_sum_c DESC, node LIMIT 5
"""


@query("q367_tree_rollup", sql=_TREE_SQL)
def q367_tree_rollup(sf_dir: str):
    """Hierarchical rollup: subtree revenue sums over the IMPLICIT
    binary tree parent(k) = (k-1)//2 on order keys — the org-chart /
    BOM-explosion aggregation shape.  Instead of a level-by-level
    bottom-up walk (depth-many barriers), every node EXPLODES its
    <= log2(n) ancestor chain vectorized inside one map_batches pass
    and a single ancestor-keyed bucketed combine sums subtrees — the
    same transitive closure the recursive-CTE oracle builds, shuffled
    once.  Output: top-5 (node, depth, subtree_sum_c) by sum."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ods = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n_rows = ods.count()

    def explode(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        nodes = [k]
        vals = [v]
        cur = k
        while (cur > 0).any():
            live = cur > 0
            cur = np.where(live, (cur - 1) // 2, 0)
            nodes.append(cur[live])
            vals.append(v[live])
        node = np.concatenate(nodes)
        val = np.concatenate(vals)
        # ancestors repeat heavily inside a batch (shared prefix chains):
        # pre-aggregate locally so the exchange carries distinct nodes
        u, inv = np.unique(node, return_inverse=True)
        return pa.table({"node": u, "v": np.bincount(inv, val).astype(
            np.int64)})

    exploded = ods.map_batches(explode, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["v"].sum().rename(
            columns={"v": "subtree_sum_c"}
        )

    sums = (
        bucketed_groupby(exploded, "node", fold,
                         expected_rows=n_rows * 14)
        .to_pandas()
        .sort_values(["subtree_sum_c", "node"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    sums["depth"] = np.floor(
        np.log2(sums["node"].to_numpy(np.int64) + 1)
    ).astype(np.int64)
    return sums[["node", "depth", "subtree_sum_c"]].astype("int64")


# --------------------------------------------------------------------------
# RAKE keyword extraction over the document corpus (q368)
# --------------------------------------------------------------------------

_RAKE_STOP = frozenset(
    "the a an and of to in is on for with at by from as".split()
)

_RAKE_SQL = (
    "SELECT phrase, n_occurrences, score_scaled "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/rake_sf0.01.parquet') "
    "ORDER BY score_scaled DESC, phrase LIMIT 10"
)


def rake_phrases(text: str) -> list[tuple[str, ...]]:
    """Candidate phrases: maximal stopword-free token runs (RAKE)."""
    toks = _TOKEN_RE.findall(text.lower())
    out: list[tuple[str, ...]] = []
    cur: list[str] = []
    for t in toks:
        if t in _RAKE_STOP:
            if cur:
                out.append(tuple(cur))
                cur = []
        else:
            cur.append(t)
    if cur:
        out.append(tuple(cur))
    return out


@query("q368_rake_keywords", sql=_RAKE_SQL)
def q368_rake_keywords(sf_dir: str):
    """RAKE keyword extraction, corpus-wide: phrases are maximal
    stopword-free token runs; each word scores degree/frequency
    (degree = total length of phrases containing it, counted per
    occurrence), truncated to ppm per word; a phrase scores the sum of
    its word scores.  Plan: phrase extraction is embarrassingly
    parallel; word freq/degree fold through ONE combiner-style word
    groupby (vocab-sized); distinct phrases score against the
    broadcast word table in a phrase-keyed bucketed combine.  Oracle
    fixture: INDEPENDENT serial Counter twin.  Output: top-10
    (phrase, n_occurrences, score_scaled)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["text"])

    def phrases(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df["text"]:
            for ph in rake_phrases(str(t)):
                rows.append((" ".join(ph), len(ph)))
        return pd.DataFrame(rows, columns=["phrase", "plen"])

    ph = ds.map_batches(phrases, batch_format="pandas").materialize()

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        freq: Counter = Counter()
        deg: Counter = Counter()
        for p, ln in zip(df["phrase"], df["plen"]):
            for w in p.split(" "):
                freq[w] += 1
                deg[w] += int(ln)
        return pd.DataFrame(
            {
                "w": list(freq),
                "freq": [freq[w] for w in freq],
                "deg": [deg[w] for w in freq],
            }
        )

    words = (
        ph.map_batches(word_partial, batch_format="pandas")
        .groupby("w")
        .aggregate(Sum("freq", alias_name="freq"),
                   Sum("deg", alias_name="deg"))
        .to_pandas()
    )
    score = {
        w: int(d) * 1_000_000 // int(f)
        for w, f, d in zip(words["w"], words["freq"], words["deg"])
    }
    score_ref = ray.put(score)

    def phrase_fold(df: pd.DataFrame) -> pd.DataFrame:
        sc = ray.get(score_ref)
        g = df.groupby("phrase", as_index=False).size().rename(
            columns={"size": "n_occurrences"}
        )
        g["score_scaled"] = [
            sum(sc[w] for w in p.split(" ")) for p in g["phrase"]
        ]
        return g

    top = (
        bucketed_groupby(ph.drop_columns(["plen"]), "phrase", phrase_fold,
                         n_buckets=16)
        .to_pandas()
        .sort_values(["score_scaled", "phrase"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    top["n_occurrences"] = top["n_occurrences"].astype("int64")
    top["score_scaled"] = top["score_scaled"].astype("int64")
    return top[["phrase", "n_occurrences", "score_scaled"]]


# --------------------------------------------------------------------------
# Cross-modal caption-length vs seam-cost correlation (q369)
# --------------------------------------------------------------------------

_XMOD_FIX = "/root/repo/tests/fixtures/oracle/xmodal_sf0.01.parquet"

_XMOD_SQL = f"""
WITH m AS (SELECT fmt,
                  CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(tok) AS HUGEINT) AS sx,
                  CAST(SUM(seam) AS HUGEINT) AS sy,
                  CAST(SUM(tok * tok) AS HUGEINT) AS sxx,
                  CAST(SUM(seam * seam) AS HUGEINT) AS syy,
                  CAST(SUM(tok * seam) AS HUGEINT) AS sxy
           FROM read_parquet('{_XMOD_FIX}') GROUP BY 1),
c AS (SELECT fmt, n, n * sxy - sx * sy AS cov,
             n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary
      FROM m),
r AS (SELECT fmt, n, cov,
             cov * cov * 1000000 // (varx * vary) AS r2_ppm
      FROM c),
q AS (SELECT fmt, n, cov, r2_ppm * 1000000 AS x,
             CAST(floor(sqrt(CAST(r2_ppm * 1000000 AS DOUBLE))) AS HUGEINT)
                 AS s0
      FROM r)
SELECT fmt, CAST(n AS BIGINT) AS n_images,
       CAST((CASE WHEN cov < 0 THEN -1 ELSE 1 END)
            * (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                    WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END) AS BIGINT)
           AS pearson_ppm
FROM q ORDER BY fmt
"""


@query("q369_crossmodal_corr", sql=_XMOD_SQL)
def q369_crossmodal_corr(sf_dir: str):
    """Cross-modal leakage audit: Pearson correlation (exact-isqrt
    integer ppm, the q221 discipline) between each image's CAPTION
    token count and its PIXEL seam cost, per format — near-zero says
    captions carry no length/complexity shortcut a contrastive model
    could exploit.  One actor-pool pass computes both modalities'
    scalars (pixels never shuffle); the moments fold through a
    fmt-sized groupby; the oracle recomputes the statistic in SQL over
    a committed per-image fixture produced by the INDEPENDENT
    Dijkstra seam twin.  Output: (fmt, n_images, pearson_ppm)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import SeamEnergy

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table",
                     columns=["image_id", "bytes", "fmt", "caption"])

    class Both(SeamEnergy):
        def __call__(self, batch: pa.Table) -> pa.Table:
            seam = [self._seam(self.decode(raw))
                    for raw in batch["bytes"].to_pylist()]
            tok = [len(_TOKEN_RE.findall(str(c).lower()))
                   for c in batch["caption"].to_pylist()]
            return pa.table(
                {
                    "fmt": batch["fmt"],
                    "tok": pa.array(tok, pa.int64()),
                    "seam": pa.array(seam, pa.int64()),
                }
            )

    scored = ds.map_batches(Both, concurrency=2, batch_size=64,
                            batch_format="pyarrow")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n": g.size(),
                "sx": g["tok"].sum(),
                "sy": g["seam"].sum(),
                "sxx": g.apply(lambda s: int((s["tok"] ** 2).sum()),
                               include_groups=False),
                "syy": g.apply(lambda s: int((s["seam"].astype(object)
                                              ** 2).sum()),
                               include_groups=False),
                "sxy": g.apply(lambda s: int((s["tok"] * s["seam"]).sum()),
                               include_groups=False),
            }
        ).reset_index()

    m = (
        scored.map_batches(moments, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("fmt")
    )
    import math

    rows = []
    for r in m.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        cov = n * int(r.sxy) - sx * sy
        varx = n * int(r.sxx) - sx * sx
        vary = n * int(r.syy) - sy * sy
        r2 = cov * cov * 1_000_000 // (varx * vary)
        rows.append((r.fmt, n,
                     (-1 if cov < 0 else 1) * math.isqrt(r2 * 1_000_000)))
    return pd.DataFrame(
        rows, columns=["fmt", "n_images", "pearson_ppm"]
    ).astype({"n_images": "int64", "pearson_ppm": "int64"})


# --------------------------------------------------------------------------
# IBLT set reconciliation between activity weeks (q370)
# --------------------------------------------------------------------------

_IBLT_FIX = "/root/repo/tests/fixtures/oracle/iblt_sf0.01.parquet"

_IBLT_SQL = f"""
WITH wk AS (
  SELECT user_id * 64
         + (epoch_us(ts) // 86400000000
            - (SELECT MIN(epoch_us(ts) // 86400000000) FROM events)) % 7
           AS key,
         (epoch_us(ts) // 86400000000
          - (SELECT MIN(epoch_us(ts) // 86400000000) FROM events)) // 7
           AS week
  FROM events
),
a AS (SELECT DISTINCT key FROM wk WHERE week = 0),
b AS (SELECT DISTINCT key FROM wk WHERE week = 1),
d AS (
  SELECT COUNT(*) AS n_diff FROM (
    (SELECT key FROM a EXCEPT SELECT key FROM b)
    UNION ALL
    (SELECT key FROM b EXCEPT SELECT key FROM a)
  )
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_week0,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_week1,
       CAST(d.n_diff AS BIGINT) AS n_diff,
       f.n_cells, f.n_recovered, f.peel_ok
FROM d, read_parquet('{_IBLT_FIX}') f
"""


def iblt_size(n_diff: int) -> int:
    """Power-of-two cell count with ~4x headroom over the expected
    difference (production sizes this from a strata estimator; the
    sizing pass here doubles as the audit's ground truth)."""
    m = 256
    while m < 4 * max(n_diff, 1):
        m *= 2
    return m


def iblt_positions(u: int, m: int) -> list[int]:
    """3 DISTINCT cell positions per key: double hashing with an odd
    step (invertible mod the power-of-two table)."""
    import hashlib

    dig = hashlib.md5(str(int(u)).encode()).digest()
    h0 = int.from_bytes(dig[:8], "little")
    step = 2 * (int.from_bytes(dig[8:16], "little") % (m // 2)) + 1
    return [(h0 + i * step) % m for i in range(3)]


def iblt_check(u: int) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.md5(f"{int(u)}:chk".encode()).digest()[:8], "little"
    ) & ((1 << 63) - 1)  # int64-safe for the numpy XOR cells


def iblt_insert(cells: np.ndarray, users: np.ndarray, sign: int) -> None:
    """Fold keys into an (m, 3) int64 cell table: signed count, XOR
    keysum, XOR checksum — the additive-sketch structure that makes
    per-batch partials mergeable cellwise."""
    m = len(cells)
    for u in users:
        chk = iblt_check(int(u))
        for p in iblt_positions(int(u), m):
            cells[p, 0] += sign
            cells[p, 1] ^= int(u)
            cells[p, 2] ^= chk


def iblt_peel(cells: np.ndarray) -> tuple[set, set, bool]:
    """Recover the symmetric difference: repeatedly pop pure cells
    (count == +/-1 and checksum matches the keysum)."""
    only_a: set[int] = set()
    only_b: set[int] = set()
    changed = True
    while changed:
        changed = False
        for p in range(len(cells)):
            c = int(cells[p, 0])
            if c in (1, -1):
                u = int(cells[p, 1])
                if int(cells[p, 2]) != iblt_check(u):
                    continue
                (only_a if c == 1 else only_b).add(u)
                iblt_insert(cells, np.array([u]), -c)
                changed = True
    ok = not cells[:, 0].any() and not cells[:, 1].any()
    return only_a, only_b, ok


@query("q370_iblt_reconcile", sql=_IBLT_SQL)
def q370_iblt_reconcile(sf_dir: str):
    """Set reconciliation with an Invertible Bloom Lookup Table over
    the week-0 vs week-1 (user, weekday)-activity key sets: both sets
    fold into ONE m-cell IBLT (signed counts + XOR key/checksums — the
    canonical mergeable sketch: per-batch partials combine CELLWISE,
    so the exchange is m rows per block regardless of set sizes), and
    the driver PEELS pure cells to recover the exact symmetric
    difference without shipping either set.  m is sized ~4x the
    difference (from the same distinct table; production would use a
    strata estimator).  The oracle checks the exact set sizes and diff
    in SQL and the sketch's recovery against the INDEPENDENT
    serial-IBLT fixture twin.  Output:
    (n_week0, n_week1, n_diff, n_cells, n_recovered, peel_ok)."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])
    day0 = int(
        pd.Timestamp(ev.min("ts")).value // 1000 // 86_400_000_000
    )

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000 - day0
        week = day // 7
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"week": week, "key": uid * 64 + day % 7})
        df = df[df["week"].isin((0, 1))].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["week", "key"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    # sizing pass: keys present in exactly one week == the difference
    ones = (
        distinct.groupby("key")
        .aggregate(Count(alias_name="w"))
        .to_pandas()
    )
    n_diff_est = int((ones["w"] == 1).sum())
    m = iblt_size(n_diff_est)
    m_ref = ray.put(m)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(m_ref)
        cells = np.zeros((mm, 3), np.int64)
        a = df.loc[df["week"] == 0, "key"].to_numpy(np.int64)
        b = df.loc[df["week"] == 1, "key"].to_numpy(np.int64)
        iblt_insert(cells, a, +1)
        iblt_insert(cells, b, -1)
        return pd.DataFrame(
            {"cells": [cells.tobytes()], "n0": [len(a)], "n1": [len(b)]}
        )

    parts = distinct.map_batches(fold, batch_format="pandas").to_pandas()
    cells = np.zeros((m, 3), np.int64)
    for blob in parts["cells"]:
        other = np.frombuffer(blob, np.int64).reshape(m, 3)
        cells[:, 0] += other[:, 0]
        cells[:, 1] ^= other[:, 1]
        cells[:, 2] ^= other[:, 2]
    n0 = int(parts["n0"].sum())
    n1 = int(parts["n1"].sum())
    only_a, only_b, ok = iblt_peel(cells)
    n_rec = len(only_a) + len(only_b)
    return pd.DataFrame(
        {
            "n_week0": [n0],
            "n_week1": [n1],
            "n_diff": [n_rec if ok else -1],
            "n_cells": [m],
            "n_recovered": [n_rec],
            "peel_ok": [1 if ok else 0],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# int8 scalar-quantization recall audit over embeddings (q371)
# --------------------------------------------------------------------------

_SQ_K = 10
_SQ_NQ = 10

_SQ_SQL = (
    "SELECT n_queries, k, total_hits, mean_recall_ppm "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/sq8_sf0.01.parquet')"
)


@query("q371_sq8_recall", sql=_SQ_SQL)
def q371_sq8_recall(sf_dir: str):
    """Scalar-quantization (int8) recall audit: per-dimension min/max
    over the corpus -> 0..255 codes -> symmetric quantized dot top-10,
    compared against the exact fixed-point top-10 for the 10 smallest
    vec_ids — how much ANN recall an 8x storage cut costs.  All
    arithmetic integer (fixed point 1e6; codes exact by construction).
    Plan: one stats pass (per-batch dim min/max fold), then one scan
    computing BOTH rankings per batch against the broadcast query
    block with partial top-k emission; the driver merges
    (k x blocks)-sized candidate lists.  Oracle fixture: INDEPENDENT
    full-matrix numpy twin.  Output:
    (n_queries, k, total_hits, mean_recall_ppm)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        E = np.stack([_embed_int(e) for e in df["embedding"]])
        return pd.DataFrame(
            {"lo": [E.min(axis=0).tobytes()], "hi": [E.max(axis=0).tobytes()]}
        )

    parts = ds.map_batches(stats, batch_format="pandas").to_pandas()
    lo = np.min([np.frombuffer(b, np.int64) for b in parts["lo"]], axis=0)
    hi = np.max([np.frombuffer(b, np.int64) for b in parts["hi"]], axis=0)
    span = np.maximum(hi - lo, 1)

    q_rows = ds.sort("vec_id").limit(_SQ_NQ).to_pandas()
    q_ids = q_rows["vec_id"].to_numpy(np.int64)
    Q = np.stack([_embed_int(e) for e in q_rows["embedding"]])
    Qq = ((Q - lo) * 255 // span).astype(np.int64)
    bundle = ray.put((q_ids, Q, Qq, lo, span))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        qi, Qe, Qz, lo_, span_ = ray.get(bundle)
        ids = df["vec_id"].to_numpy(np.int64)
        E = np.stack([_embed_int(e) for e in df["embedding"]])
        Ez = ((E - lo_) * 255 // span_).astype(np.int64)
        rows = []
        for j in range(len(qi)):
            self_mask = ids != qi[j]
            for kind, s in (("exact", E @ Qe[j]), ("quant", Ez @ Qz[j])):
                order = np.lexsort((ids, -s))
                order = order[self_mask[order]][: _SQ_K]
                for r in order:
                    rows.append((int(qi[j]), kind, int(ids[r]),
                                 int(s[r])))
        return pd.DataFrame(rows, columns=["q", "kind", "id", "score"])

    cand = ds.map_batches(topk, batch_format="pandas").to_pandas()
    hits = 0
    for qid, sub in cand.groupby("q"):
        sel = {}
        for kind in ("exact", "quant"):
            s = sub[sub["kind"] == kind].sort_values(
                ["score", "id"], ascending=[False, True]
            ).head(_SQ_K)
            sel[kind] = set(s["id"])
        hits += len(sel["exact"] & sel["quant"])
    return pd.DataFrame(
        {
            "n_queries": [_SQ_NQ],
            "k": [_SQ_K],
            "total_hits": [hits],
            "mean_recall_ppm": [hits * 1_000_000 // (_SQ_NQ * _SQ_K)],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Largest bright component per image (q372)
# --------------------------------------------------------------------------

_LBLOB_SQL = (
    "SELECT fmt, n_images, sum_blob_size, max_blob_size, sum_bbox_area "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/lblob_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q372_largest_blob", sql=_LBLOB_SQL)
def q372_largest_blob(sf_dir: str):
    """Dominant-object gate: size + bounding box of each image's
    largest 4-connected bright component
    (stages/images.py::LargestBlob, vectorized min-label relaxation;
    q269's count tells HOW MANY, this tells HOW BIG).  Two int64s per
    image shuffle.  Oracle fixture: INDEPENDENT scalar BFS flood-fill
    twin.  Output per fmt:
    (fmt, n_images, sum_blob_size, max_blob_size, sum_bbox_area)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import LargestBlob

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        LargestBlob, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "blob_size", "blob_bbox_area"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_blob_size": g["blob_size"].sum(),
                "max_blob_size": g["blob_size"].max(),
                "sum_bbox_area": g["blob_bbox_area"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_blob_size", alias_name="sum_blob_size"),
            Max("max_blob_size", alias_name="max_blob_size"),
            Sum("sum_bbox_area", alias_name="sum_bbox_area"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_blob_size", "max_blob_size",
              "sum_bbox_area"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "sum_blob_size", "max_blob_size",
                "sum_bbox_area"]]


# --------------------------------------------------------------------------
# Longest palindromic substring per document (q373)
# --------------------------------------------------------------------------

_PAL_SQL = (
    "SELECT source, n_docs, sum_pal_len, max_pal_len "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/palin_sf0.01.parquet') "
    "ORDER BY source"
)


def longest_palindrome_manacher(s: str) -> int:
    """Length of the longest palindromic substring, Manacher O(n):
    the separator-interleaved radius expansion with mirror reuse."""
    if not s:
        return 0
    t = "\x00" + "\x00".join(s) + "\x00"
    n = len(t)
    rad = [0] * n
    c = r = 0
    best = 0
    for i in range(n):
        if i < r:
            rad[i] = min(r - i, rad[2 * c - i])
        while i - rad[i] - 1 >= 0 and i + rad[i] + 1 < n \
                and t[i - rad[i] - 1] == t[i + rad[i] + 1]:
            rad[i] += 1
        if i + rad[i] > r:
            c, r = i, i + rad[i]
        best = max(best, rad[i])
    return best


def longest_palindrome_brute(s: str) -> int:
    """Independent twin: center expansion at every position, O(n^2)."""
    n = len(s)
    best = 0
    for ctr in range(n):
        for lo, hi in ((ctr, ctr), (ctr, ctr + 1)):
            while lo >= 0 and hi < n and s[lo] == s[hi]:
                lo -= 1
                hi += 1
            best = max(best, hi - lo - 1)
    return best


@query("q373_longest_palindrome", sql=_PAL_SQL)
def q373_longest_palindrome(sf_dir: str):
    """Longest palindromic substring per document (first 512 chars,
    Manacher O(n)) aggregated per source — a structure probe the
    suffix-automaton suite (q295/q297) can't see (palindromes aren't
    repeats).  Per-doc work is embarrassingly parallel; the exchange
    is source-count-sized partials.  Oracle fixture: INDEPENDENT
    center-expansion twin.  Output per source:
    (source, n_docs, sum_pal_len, max_pal_len)."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src_name, sub in df.groupby("source", sort=False):
            ls = [longest_palindrome_manacher(str(t)[:_BWT_PREFIX])
                  for t in sub["text"]]
            rows.append((src_name, len(ls), int(np.sum(ls)),
                         int(np.max(ls))))
        return pd.DataFrame(
            rows, columns=["source", "n_docs", "sum_pal_len", "max_pal_len"]
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_pal_len", alias_name="sum_pal_len"),
            Max("max_pal_len", alias_name="max_pal_len"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_pal_len", "max_pal_len"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_docs", "sum_pal_len", "max_pal_len"]]


# --------------------------------------------------------------------------
# Salted two-stage aggregate over pathologically hot keys (q374)
# --------------------------------------------------------------------------

_SALT_FAN = 32

_SALT_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY 1 ORDER BY 1
"""


@query("q374_salted_aggregate", sql=_SALT_SQL)
def q374_salted_aggregate(sf_dir: str):
    """Hot-key aggregation via EXPLICIT salting — the skew pattern the
    crawl engine uses for hot hosts, shown standalone: event_type has
    only 5 values, so a direct key shuffle piles ~n/5 rows into single
    tasks at the 100 TB point.  Stage 1 exchanges on
    (key, row_hash % 32) — 160 balanced cells — and combines; stage 2
    collapses the 32 salt partials per key (a 160-row groupby).
    Row-hash salting (not random) keeps the plan deterministic and
    restart-stable.  Output matches the plain GROUP BY oracle:
    (event_type, n_events, sum_c)."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def salt(df: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        s = (df["event_id"].to_numpy(np.int64) % _SALT_FAN)
        return (
            pd.DataFrame(
                {"event_type": df["event_type"].to_numpy(), "salt": s,
                 "n_events": 1, "sum_c": vc}
            )
            .groupby(["event_type", "salt"], as_index=False)
            .sum()
        )

    salted = (
        ev.map_batches(salt, batch_format="pandas")
        .groupby(["event_type", "salt"])  # 5 x 32 balanced cells
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_c", alias_name="sum_c"))
    )
    out = (
        salted.groupby("event_type")  # collapse the salt fan: 160 rows
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_c", alias_name="sum_c"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_c"] = out["sum_c"].astype("int64")
    return out[["event_type", "n_events", "sum_c"]]


# --------------------------------------------------------------------------
# Late shipments by priority class (TPC-H Q12 shape) (q375)
# --------------------------------------------------------------------------

_Q12_SQL = """
SELECT l.l_returnflag AS flag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
      > 60 * 86400000000
GROUP BY 1 ORDER BY 1
"""


@query("q375_late_shipments", sql=_Q12_SQL)
def q375_late_shipments(sf_dir: str):
    """TPC-H Q12 shape — lines shipped > 60 days after their order,
    split by priority class per return flag.  NEITHER side broadcasts
    at the design point, so this rides the house big-big bucketed
    shuffle join (ops/join.py::shuffle_join, one exchange, per-bucket
    pandas merges) followed by a combiner-style conditional aggregate.
    Output: (flag, high_line_count, low_line_count)."""
    from texrex_ray.ops import shuffle_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_shipdate", "l_returnflag"])
    n = orders.count() + items.count()
    joined = shuffle_join(
        items, orders, on="l_orderkey", right_on="o_orderkey",
        expected_rows=n,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gap = (
            df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
            - df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        )
        late = df[gap > 60 * 86_400_000_000]
        if late.empty:
            return pd.DataFrame(
                {"flag": pd.Series([], dtype=str),
                 "high_line_count": pd.Series([], dtype=np.int64),
                 "low_line_count": pd.Series([], dtype=np.int64)}
            )
        hi = late["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        return (
            pd.DataFrame(
                {"flag": late["l_returnflag"].to_numpy(),
                 "high_line_count": hi.to_numpy().astype(np.int64),
                 "low_line_count": (~hi).to_numpy().astype(np.int64)}
            )
            .groupby("flag", as_index=False)
            .sum()
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("flag")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
        .to_pandas()
        .sort_values("flag")
        .reset_index(drop=True)
    )
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out[["flag", "high_line_count", "low_line_count"]]


# --------------------------------------------------------------------------
# Viterbi best-path scoring over per-user event sequences (q376)
# --------------------------------------------------------------------------

_VIT_SQL = (
    "SELECT n_users, sum_best, max_best, min_best "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/viterbi_sf0.01.parquet')"
)


def _vit_matrices(states: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic HMM scores: transition T[s1][s2] and
    emission E[s][o] over the sorted state/observation alphabet."""
    k = len(states)
    idx = np.arange(k)
    T = (np.add.outer(idx * 7, idx * 3) % 11) - 5
    E = (np.add.outer(idx * 5, idx * 2) % 13) - 6
    return T.astype(np.int64), E.astype(np.int64)


def viterbi_best(obs: np.ndarray, T: np.ndarray, E: np.ndarray) -> int:
    """Max-score state path (forward max-sum DP, vectorized over the
    state axis per step)."""
    v = E[:, obs[0]].copy()
    for o in obs[1:]:
        v = (v[:, None] + T).max(axis=0) + E[:, o]
    return int(v.max())


def viterbi_best_backward(obs: np.ndarray, T: np.ndarray,
                          E: np.ndarray) -> int:
    """Independent twin: the REVERSED recursion (suffix best scores) —
    a genuinely different computation order with the same optimum."""
    v = E[:, obs[-1]].copy()
    for o in obs[-2::-1]:
        v = (T + v[None, :]).max(axis=1) + E[:, o]
    return int(v.max())


@query("q376_viterbi_path", sql=_VIT_SQL)
def q376_viterbi_path(sf_dir: str):
    """Viterbi decoding score per user: the max-sum hidden-state path
    over each user's (ts, event_id)-ordered event-type sequence under
    deterministic integer HMM score matrices — the sequence-tagging
    primitive (session intent decoding).  Each USER-COMPLETE bucket
    runs the forward max-sum DP with the state axis vectorized; only
    per-user scalars exchange.  Oracle fixture: the INDEPENDENT
    backward-recursion twin.  Output:
    (n_users, sum_best, max_best, min_best)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    states = sorted(
        r["event_type"]
        for r in ev.groupby("event_type")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
        .to_dict("records")
    )
    T, E = _vit_matrices(states)
    s_pos = {s: i for i, s in enumerate(states)}
    bundle = ray.put((T, E, s_pos))

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        Tm, Em, pos = ray.get(bundle)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        obs_all = df["event_type"].map(pos).to_numpy(np.int64)
        rows = []
        start = 0
        for u, sz in df.groupby("user_id", sort=False).size().items():
            rows.append(
                (int(u), viterbi_best(obs_all[start:start + sz], Tm, Em))
            )
            start += sz
        return pd.DataFrame(rows, columns=["u", "best"])

    per = bucketed_groupby(ev, "user_id", per_user, n_buckets=16)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        b = df["best"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_users": [len(b)],
                "sum_best": [int(b.sum())],
                "max_best": [int(b.max()) if len(b) else -(1 << 62)],
                "min_best": [int(b.min()) if len(b) else (1 << 62)],
            }
        )

    out = (
        per.map_batches(fold, batch_format="pandas")
        .groupby(None)
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("sum_best", alias_name="sum_best"),
            Max("max_best", alias_name="max_best"),
            Min("min_best", alias_name="min_best"),
        )
        .to_pandas()
    )
    return out[["n_users", "sum_best", "max_best", "min_best"]].astype(
        "int64")


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue series (q377)
# --------------------------------------------------------------------------

_RUNS_SQL = """
WITH daily0 AS (
  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) // 100)
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
grid AS (
  SELECT gs.day, COALESCE(d.r, 0) AS r
  FROM (SELECT unnest(range((SELECT MIN(day) FROM daily0),
                            (SELECT MAX(day) FROM daily0) + 1)) AS day) gs
  LEFT JOIN daily0 d ON d.day = gs.day
),
med AS (
  SELECT r AS m FROM grid ORDER BY r
  LIMIT 1 OFFSET ((SELECT COUNT(*) + 1 FROM grid) // 2 - 1)
),
signs AS (
  SELECT day, CASE WHEN r > (SELECT m FROM med) THEN 1 ELSE -1 END AS s
  FROM grid WHERE r <> (SELECT m FROM med)
),
runs AS (
  SELECT s, LAG(s) OVER (ORDER BY day) AS prev FROM signs
),
agg AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
  FROM runs
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM grid) AS n_days,
       n_plus, n_minus, n_runs,
       CAST(1000 + 2000 * n_plus * n_minus // (n_plus + n_minus)
            AS BIGINT) AS expected_runs_milli
FROM agg
"""


@query("q377_runs_test", sql=_RUNS_SQL)
def q377_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test on the daily revenue series: runs of
    above/below-(lower-)median days versus the expected count
    1 + 2*n1*n2/n — the order-randomness audit that catches regime
    shifts plain variance misses.  Median-ties drop (the classic
    spec); everything integer (expected runs in milli, trunc).  Plan:
    same day-count-sized combiner as q361, driver scan over the ~2.5k
    signs.  Output:
    (n_days, n_plus, n_minus, n_runs, expected_runs_milli)."""
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        day = us // 86_400_000_000
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_h = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vol = price_c * (100 - disc_h) // 100
        d, inv = np.unique(day, return_inverse=True)
        return pa.table({"day": d, "r": np.bincount(inv, vol).astype(
            np.int64)})

    daily = (
        li.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["r"]
        .sum()
        .sort_values("day")
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[daily["day"].to_numpy(np.int64) - lo] = daily["r"].to_numpy(
        np.int64)
    n = len(series)
    med = int(np.sort(series)[(n + 1) // 2 - 1])
    s = series[series != med] > med
    n_plus = int(s.sum())
    n_minus = int(len(s) - n_plus)
    n_runs = 1 + int((s[1:] != s[:-1]).sum()) if len(s) else 0
    return pd.DataFrame(
        {
            "n_days": [n],
            "n_plus": [n_plus],
            "n_minus": [n_minus],
            "n_runs": [n_runs],
            "expected_runs_milli": [
                1000 + 2000 * n_plus * n_minus // (n_plus + n_minus)
            ],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Shortest unique prefix per customer name (q378)
# --------------------------------------------------------------------------

_UPFX_SQL = """
WITH names AS (SELECT DISTINCT c_name FROM customer),
o AS (
  SELECT c_name,
         LAG(c_name) OVER (ORDER BY c_name) AS prv,
         LEAD(c_name) OVER (ORDER BY c_name) AS nxt
  FROM names
),
l AS (
  SELECT c_name,
         COALESCE((SELECT MAX(i) FROM unnest(range(1, len(c_name) + 1))
                   AS t(i)
                   WHERE substr(c_name, 1, i) = substr(prv, 1, i)), 0)
           AS lp,
         COALESCE((SELECT MAX(i) FROM unnest(range(1, len(c_name) + 1))
                   AS t(i)
                   WHERE substr(c_name, 1, i) = substr(nxt, 1, i)), 0)
           AS ln
  FROM o
),
u AS (
  SELECT c_name,
         LEAST(CAST(len(c_name) AS BIGINT),
               1 + GREATEST(lp, ln)) AS uplen
  FROM l
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_names,
       CAST(SUM(uplen) AS BIGINT) AS sum_uplen,
       CAST(MAX(uplen) AS BIGINT) AS max_uplen,
       CAST(MIN(uplen) AS BIGINT) AS min_uplen
FROM u
"""


@query("q378_unique_prefix", sql=_UPFX_SQL)
def q378_unique_prefix(sf_dir: str):
    """Shortest unique prefix per customer name — the
    completion/compression bound (how many characters distinguish each
    key).  In SORTED order a key's unique-prefix length is
    1 + max(lcp(prev), lcp(next)), so the plan is the sorted-
    neighborhood shape: contiguous range buckets on the name with a
    one-row HALO exchanged through the driver (per-bucket first/last
    names), vectorized LCPs inside the bucket — never a trie, never
    all-pairs.  Names longer than every distinguisher cap at their own
    length.  Output: (n_names, sum_uplen, max_uplen, min_uplen)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    cust = _read(sf_dir, "customer", ["c_name"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    names = bucketed_groupby(
        cust, "c_name", dedup, n_buckets=16
    ).materialize()

    # range boundaries from a driver pull of the DISTINCT names
    # (dimension-sized here; at scale, boundaries come from a sorted
    # sample and the halo mechanics below stay exact regardless).
    NB = 16
    pulled = (
        pd.concat(
            [
                b.to_pandas()
                for b in names.iter_batches(batch_format="pyarrow",
                                            batch_size=65536)
            ]
        )["c_name"]
        .sort_values()
        .reset_index(drop=True)
    )
    splits = [
        pulled.iloc[i * len(pulled) // NB] for i in range(1, NB)
    ]
    splits_ref = ray.put(splits)

    def rb(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        b = np.searchsorted(np.array(sp, dtype=object),
                            df["c_name"].to_numpy(object), side="right")
        return df.assign(_rb=b.astype(np.int64))

    bucketed = names.map_batches(rb, batch_format="pandas").materialize()

    # halo: per-bucket first/last names -> driver -> neighbours
    ends = bucketed.map_batches(
        lambda df: df.groupby("_rb")["c_name"].agg(["min", "max"])
        .reset_index(),
        batch_format="pandas",
    ).to_pandas().groupby("_rb").agg({"min": "min", "max": "max"})
    order = sorted(ends.index)
    halo = {}
    for i, bidx in enumerate(order):
        prev_last = ends.loc[order[i - 1], "max"] if i else None
        next_first = ends.loc[order[i + 1], "min"] \
            if i + 1 < len(order) else None
        halo[int(bidx)] = (prev_last, next_first)
    halo_ref = ray.put(halo)

    def lcp(a: str, b: str) -> int:
        if a is None or b is None:
            return 0
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return i

    def uplen(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(halo_ref)
        rows = []
        for bidx, sub in df.groupby("_rb", sort=False):
            s = sub["c_name"].sort_values().tolist()
            pl, nf = h.get(int(bidx), (None, None))
            ext = ([pl] if pl is not None else []) + s + (
                [nf] if nf is not None else [])
            off = 1 if pl is not None else 0
            for i in range(len(s)):
                j = i + off
                l1 = lcp(ext[j], ext[j - 1]) if j > 0 else 0
                l2 = lcp(ext[j], ext[j + 1]) if j + 1 < len(ext) else 0
                rows.append(min(len(s[i]), 1 + max(l1, l2)))
        arr = np.array(rows, np.int64)
        return pd.DataFrame(
            {
                "n_names": [len(arr)],
                "sum_uplen": [int(arr.sum())],
                "max_uplen": [int(arr.max()) if len(arr) else 0],
                "min_uplen": [int(arr.min()) if len(arr) else (1 << 62)],
            }
        )

    out = (
        bucketed_groupby(bucketed, "_rb", uplen, n_buckets=NB)
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_names": [int(out["n_names"].sum())],
            "sum_uplen": [int(out["sum_uplen"].sum())],
            "max_uplen": [int(out["max_uplen"].max())],
            "min_uplen": [int(out["min_uplen"].min())],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Referential-integrity census across the star schema (q379)
# --------------------------------------------------------------------------

_FK_SQL = """
SELECT * FROM (
  SELECT 'lineitem.orderkey' AS fk, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT 'lineitem.partkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
  UNION ALL
  SELECT 'lineitem.suppkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
  UNION ALL
  SELECT 'orders.custkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  UNION ALL
  SELECT 'customer.nationkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
  UNION ALL
  SELECT 'supplier.nationkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
  UNION ALL
  SELECT 'nation.regionkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
) ORDER BY fk
"""


@query("q379_fk_integrity", sql=_FK_SQL)
def q379_fk_integrity(sf_dir: str):
    """Referential-integrity census — orphan counts for every foreign
    key in the star schema (the dbt-test staple, run as ONE pass per
    fact table): each FK's key set is a broadcast membership probe
    (Bloom-sized at the 100 TB point — the orderkey set is the only
    fact-sized side and would ride ops/join.py's Bloom prefilter), so
    the fact tables are scanned once each with vectorized isin and a
    7-row result.  Output: (fk, n_rows, n_orphans) per FK."""
    keysets = {}
    for tbl, col in (("orders", "o_orderkey"), ("part", "p_partkey"),
                     ("supplier", "s_suppkey"), ("customer", "c_custkey"),
                     ("nation", "n_nationkey"), ("region", "r_regionkey")):
        keysets[col] = set(
            _read(sf_dir, tbl, [col]).to_pandas()[col].astype(int)
        )
    refs = ray.put(keysets)

    def probe(table: str, cols: dict[str, str]) -> list[tuple]:
        ds = _read(sf_dir, table, list(cols.values()))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(refs)
            rows = []
            for fk_name, col in cols.items():
                pk = col.split("_", 1)[1].replace("l_", "")
                target = {
                    "orderkey": "o_orderkey", "partkey": "p_partkey",
                    "suppkey": "s_suppkey", "custkey": "c_custkey",
                    "nationkey": "n_nationkey", "regionkey": "r_regionkey",
                }[col.split("_", 1)[1]]
                bad = int((~df[col].isin(ks[target])).sum())
                rows.append((fk_name, len(df), bad))
            return pd.DataFrame(rows, columns=["fk", "n_rows", "n_orphans"])

        # partials are fk-sized per batch (≤3 rows): driver reduce, no
        # per-probe groupby exchange (5 exchanges saved across the census)
        return (
            ds.map_batches(partial, batch_format="pandas")
            .to_pandas()
            .groupby("fk", as_index=False)[["n_rows", "n_orphans"]].sum()
            .to_records(index=False)
            .tolist()
        )

    rows = []
    rows += probe("lineitem", {
        "lineitem.orderkey": "l_orderkey",
        "lineitem.partkey": "l_partkey",
        "lineitem.suppkey": "l_suppkey",
    })
    rows += probe("orders", {"orders.custkey": "o_custkey"})
    rows += probe("customer", {"customer.nationkey": "c_nationkey"})
    rows += probe("supplier", {"supplier.nationkey": "s_nationkey"})
    rows += probe("nation", {"nation.regionkey": "n_regionkey"})
    out = pd.DataFrame(rows, columns=["fk", "n_rows", "n_orphans"])
    out = out.sort_values("fk").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out


# --------------------------------------------------------------------------
# M4 visual downsampling of the event-value series (q380)
# --------------------------------------------------------------------------

_M4_CELLS = 128

_M4_SQL = f"""
WITH b AS (
  SELECT (epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
         * {_M4_CELLS}
         // ((SELECT MAX(epoch_us(ts)) - MIN(epoch_us(ts)) + 1
              FROM events)) AS cell,
         (epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
           * 2097152 + event_id AS okey,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS v_min,
       CAST(MAX(v) AS BIGINT) AS v_max,
       CAST(arg_min(v, okey) AS BIGINT) AS v_first,
       CAST(arg_max(v, okey) AS BIGINT) AS v_last
FROM b GROUP BY cell ORDER BY cell
"""


@query("q380_m4_downsample", sql=_M4_SQL)
def q380_m4_downsample(sf_dir: str):
    """M4 visual downsampling (Jugel et al.): min/max/first/last of
    the event-value series per fixed time cell — the lossless-for-
    pixels reduction every monitoring UI runs.  first/last ride
    arg_min/arg_max over a packed (us, event_id) order key, so every
    statistic is an ordinary COMBINER (mergeable across batches); one
    cell-count-sized groupby total.  Output per cell:
    (cell, n, v_min, v_max, v_first, v_last)."""
    ev = _read(sf_dir, "events", ["ts", "event_id", "value"])
    lo_us = int(pd.Timestamp(ev.min("ts")).value // 1000)
    hi_us = int(pd.Timestamp(ev.max("ts")).value // 1000)
    span = hi_us - lo_us + 1

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cell = (us - lo_us) * _M4_CELLS // span
        # tie-free rebased order key: a multi-week span in us times
        # 2^21 id bits stays under 2^63
        key = (us - lo_us) * 2_097_152 + eid
        df = pd.DataFrame({"cell": cell, "key": key, "v": v})
        g = df.groupby("cell")
        out = pd.DataFrame(
            {
                "n": g.size(),
                "v_min": g["v"].min(),
                "v_max": g["v"].max(),
                "k_first": g["key"].min(),
                "k_last": g["key"].max(),
                "v_first": df.loc[g["key"].idxmin(), "v"].to_numpy(),
                "v_last": df.loc[g["key"].idxmax(), "v"].to_numpy(),
            }
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for cell, g in parts.groupby("cell"):
        i_f = g["k_first"].idxmin()
        i_l = g["k_last"].idxmax()
        rows.append(
            (int(cell), int(g["n"].sum()), int(g["v_min"].min()),
             int(g["v_max"].max()), int(g.loc[i_f, "v_first"]),
             int(g.loc[i_l, "v_last"]))
        )
    out = pd.DataFrame(
        rows, columns=["cell", "n", "v_min", "v_max", "v_first", "v_last"]
    ).sort_values("cell").reset_index(drop=True)
    return out.astype("int64")


# --------------------------------------------------------------------------
# Bit-plane complexity (BPCS steganalysis audit) per image (q381)
# --------------------------------------------------------------------------

_BPCS_SQL = (
    "SELECT fmt, n_images, plane, sum_transitions "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/bpcs_sf0.01.parquet') "
    "ORDER BY fmt, plane"
)


@query("q381_bitplane_complexity", sql=_BPCS_SQL)
def q381_bitplane_complexity(sf_dir: str):
    """Bit-plane complexity segmentation (BPCS) audit: horizontal +
    vertical 0/1 transitions per bit plane of the R channel — noise-
    like low planes (high transitions) are where steganography hides
    and where lossless coders stop predicting.  Planes come from
    shifts and the transition count from XOR-free neighbour compares
    (no unpackbits — this VM punishes it); per-image work stays in the
    actor pool.  Oracle fixture: INDEPENDENT loop-over-rows twin.
    Output per (fmt, plane): (fmt, n_images, plane, sum_transitions)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])

    def score(t: pa.Table) -> pa.Table:
        fmts, planes, trans = [], [], []
        for raw, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            b = decode_image(raw)[:, :, 0].astype(np.int64)
            for k in range(8):
                p = (b >> k) & 1
                n_t = int((p[:, 1:] != p[:, :-1]).sum()) + int(
                    (p[1:, :] != p[:-1, :]).sum()
                )
                fmts.append(fmt)
                planes.append(k)
                trans.append(n_t)
        return pa.table(
            {
                "fmt": fmts,
                "plane": pa.array(planes, pa.int64()),
                "n_images": pa.array([1] * len(planes), pa.int64()),
                "sum_transitions": pa.array(trans, pa.int64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby(["fmt", "plane"])
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_transitions", alias_name="sum_transitions"),
        )
        .to_pandas()
        .sort_values(["fmt", "plane"])
        .reset_index(drop=True)
    )
    out["n_images"] = (out["n_images"] // 1).astype("int64")
    out["plane"] = out["plane"].astype("int64")
    out["sum_transitions"] = out["sum_transitions"].astype("int64")
    return out[["fmt", "n_images", "plane", "sum_transitions"]]


# --------------------------------------------------------------------------
# Crop-robust partial-duplicate detection via tile hashing (q382)
# --------------------------------------------------------------------------

_TILEH = 16
_TILEH_MIN_SHARED = 4

_TILEDUP_SQL = (
    "SELECT n_images, n_tiles, n_candidate_pairs, n_dup_pairs "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/tiledup_sf0.01.parquet')"
)


def image_tile_hashes(px: np.ndarray) -> np.ndarray:
    """64-bit content hash per aligned 16x16 tile (R channel bytes) —
    the crop/shift-robust unit for partial-duplicate voting."""
    b = px[:, :, 0]
    h, w = b.shape
    ht, wt = h // _TILEH, w // _TILEH
    if ht == 0 or wt == 0:
        return np.array([], np.int64)
    a = b[: ht * _TILEH, : wt * _TILEH].reshape(
        ht, _TILEH, wt, _TILEH
    ).transpose(0, 2, 1, 3).reshape(ht * wt, _TILEH * _TILEH)
    out = np.empty(ht * wt, np.int64)
    import hashlib

    for i in range(ht * wt):
        out[i] = int.from_bytes(
            hashlib.md5(a[i].tobytes()).digest()[:8], "little"
        ) & ((1 << 63) - 1)
    return out


@query("q382_tile_hash_dups", sql=_TILEDUP_SQL)
def q382_tile_hash_dups(sf_dir: str):
    """Partial-duplicate image detection by TILE-HASH VOTING: each
    image emits a 64-bit hash per aligned 16x16 tile; images sharing a
    tile hash become candidates (an LSH-banding-shaped groupby on the
    hash), and pairs sharing >= 4 distinct tiles count as partial
    dups — robust to captions, borders and recompression in ways a
    whole-image phash is not.  Pixels never shuffle (hashes do); the
    per-hash pair explosion carries the same degree cap discipline as
    q348.  Oracle fixture: INDEPENDENT serial dict twin.  Output:
    (n_images, n_tiles, n_candidate_pairs, n_dup_pairs)."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import decode_image
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes"])

    def tiles(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for iid, raw in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            th = image_tile_hashes(decode_image(raw))
            ids.extend([iid] * len(th))
            hs.extend(th.tolist())
        return pa.table({"image_id": ids, "h": pa.array(hs, pa.int64())})

    tile_ds = ds.map_batches(tiles, batch_format="pyarrow").materialize()
    n_tiles = tile_ds.count()
    n_images = ds.count()

    MAX_BUCKET = 2_000

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("h", sort=False):
            ids = np.sort(g["image_id"].astype(str).unique())
            if len(ids) < 2:
                continue
            if len(ids) > MAX_BUCKET:
                raise ValueError("q382: tile-hash bucket too hot; salt it")
            i, j = np.triu_indices(len(ids), 1)
            outs.append(pd.DataFrame({"a": ids[i], "b": ids[j]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str)})
        return pd.concat(outs, ignore_index=True)

    pair_votes = bucketed_groupby(
        tile_ds, "h", pairs, expected_rows=n_tiles
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby(["a", "b"], sort=False).size()
        return pd.DataFrame(
            {
                "n_candidate_pairs": [len(m)],
                "n_dup_pairs": [int((m >= _TILEH_MIN_SHARED).sum())],
            }
        )

    tot = (
        bucketed_groupby(pair_votes, ["a", "b"], fold,
                         expected_rows=n_tiles * 4)
        .to_pandas()
        .sum()
    )
    return pd.DataFrame(
        {
            "n_images": [n_images],
            "n_tiles": [n_tiles],
            "n_candidate_pairs": [int(tot["n_candidate_pairs"])],
            "n_dup_pairs": [int(tot["n_dup_pairs"])],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Densest subgraph (Charikar greedy peel) on the supplier-part graph (q383)
# --------------------------------------------------------------------------

_DENSE_SQL = (
    "SELECT n_nodes, n_edges, best_nodes, best_edges, best_density_ppm "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/densest_sf0.01.parquet')"
)


def charikar_peel(adj: dict[int, set[int]]) -> tuple[int, int, int]:
    """Greedy 2-approximation: repeatedly remove the min-degree node
    (ties -> smallest id), tracking the density |E|/|V| high-water
    mark.  Returns (best_nodes, best_edges, density_ppm)."""
    deg = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    m = sum(deg.values()) // 2
    best = (len(alive), m, m * 1_000_000 // max(len(alive), 1))
    # bucket queue over degrees: O(V + E) total
    import heapq

    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    while alive:
        d, v = heapq.heappop(heap)
        if v not in alive or deg[v] != d:
            continue
        alive.discard(v)
        m -= deg[v]
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
        if alive:
            dens = m * 1_000_000 // len(alive)
            if dens > best[2]:
                best = (len(alive), m, dens)
    return best


@query("q383_densest_subgraph", sql=_DENSE_SQL)
def q383_densest_subgraph(sf_dir: str):
    """Densest-subgraph mining (Charikar's greedy peel, the 2-approx
    every fraud/community pipeline ships): peel the min-degree node
    until empty, keep the |E|/|V| high-water mark — on the supplier-
    part graph this finds the most tightly co-purchasing cluster.
    The edge aggregation is the distributed stage (one bucketed
    combine); the peel runs on the driver over the V-sized degree
    structure with an E-sized adjacency (the <=5M-edge driver plan of
    q39's clusters; beyond that, the documented iterative
    "remove all nodes below 2(1+eps)*density" distributed variant).
    Oracle fixture: an INDEPENDENT repeated-scan peel twin.  Output:
    (n_nodes, n_edges, best_nodes, best_edges, best_density_ppm)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    n_rows = li.count()

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates()
        return pd.DataFrame(
            {
                "s": out["l_suppkey"].to_numpy(np.int64),
                "p": out["l_partkey"].to_numpy(np.int64) + 1_000_000,
            }
        )

    edges = bucketed_groupby(
        li.map_batches(dedup, batch_format="pandas"),
        ["s", "p"],
        lambda df: df.drop_duplicates(),
        expected_rows=n_rows,
    ).to_pandas()
    adj: dict[int, set[int]] = {}
    for s, p in zip(edges["s"].astype(int), edges["p"].astype(int)):
        adj.setdefault(s, set()).add(p)
        adj.setdefault(p, set()).add(s)
    n_nodes = len(adj)
    n_edges = len(edges)
    bn, be, dens = charikar_peel(adj)
    return pd.DataFrame(
        {
            "n_nodes": [n_nodes],
            "n_edges": [n_edges],
            "best_nodes": [bn],
            "best_edges": [be],
            "best_density_ppm": [dens],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# V-optimal histogram (exact DP over the value distribution) (q384)
# --------------------------------------------------------------------------

_VOPT_BASE = 64
_VOPT_K = 8

_VOPT_SQL = (
    "SELECT n_rows, n_base_bins, k, sse_num_scaled, first_boundary, "
    "last_boundary "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/vopt_sf0.01.parquet')"
)


def voptimal_dp(counts: np.ndarray, vals: np.ndarray, k: int):
    """Exact V-optimal partition of a weighted 1-D histogram into k
    contiguous buckets minimizing total SSE, via Fraction-exact DP
    (O(B^2 k) over B base bins — driver-sized by construction).
    Returns (total SSE as a Fraction, boundary list)."""
    from fractions import Fraction

    B = len(counts)
    cw = np.concatenate(([0], np.cumsum(counts)))
    cs = np.concatenate(([0], np.cumsum(counts * vals)))
    cs2 = np.concatenate(([0], np.cumsum(counts * vals * vals)))

    def sse(i: int, j: int) -> Fraction:  # bins [i, j)
        n = int(cw[j] - cw[i])
        if n == 0:
            return Fraction(0)
        s = int(cs[j] - cs[i])
        s2 = int(cs2[j] - cs2[i])
        return Fraction(s2) - Fraction(s * s, n)

    INFF = Fraction(1 << 200)
    dp = [[INFF] * (B + 1) for _ in range(k + 1)]
    choice = [[0] * (B + 1) for _ in range(k + 1)]
    dp[0][0] = Fraction(0)
    for kk in range(1, k + 1):
        for j in range(1, B + 1):
            for i in range(kk - 1, j):
                c = dp[kk - 1][i] + sse(i, j)
                if c < dp[kk][j]:
                    dp[kk][j] = c
                    choice[kk][j] = i
    bounds = []
    j = B
    for kk in range(k, 0, -1):
        bounds.append(j)
        j = choice[kk][j]
    return dp[k][B], sorted(bounds)


@query("q384_voptimal_hist", sql=_VOPT_SQL)
def q384_voptimal_hist(sf_dir: str):
    """V-optimal histogram construction — the optimizer-statistics
    classic: split the price distribution into k=8 contiguous buckets
    minimizing total within-bucket SSE, EXACTLY (Fraction arithmetic,
    no float drift), via O(B^2 k) DP over B=64 pre-aggregated base
    bins.  The distributed stage is the base-bin fold (one
    histogram-sized combiner groupby); the DP is driver-sized by
    construction (the q312 Selinger pattern).  SSE is reported as the
    numerator of the exact value over the total count
    (sse_num_scaled = floor(SSE * 1000)).  Output: (n_rows,
    n_base_bins, k, sse_num_scaled, first_boundary, last_boundary)."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def hist(t: pa.Table) -> pa.Table:
        v = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        b, c = np.unique(v * _VOPT_BASE // 10_300_000, return_counts=True)
        return pa.table({"b": b, "c": c.astype(np.int64)})

    counts_df = (
        li.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("b", as_index=False)["c"]
        .sum()
        .sort_values("b")
    )
    base = np.zeros(_VOPT_BASE, np.int64)
    np.add.at(base, counts_df["b"].to_numpy(np.int64).clip(
        0, _VOPT_BASE - 1), counts_df["c"].to_numpy(np.int64))
    vals = np.arange(_VOPT_BASE, dtype=np.int64)
    sse, bounds = voptimal_dp(base, vals, _VOPT_K)
    return pd.DataFrame(
        {
            "n_rows": [int(base.sum())],
            "n_base_bins": [_VOPT_BASE],
            "k": [_VOPT_K],
            "sse_num_scaled": [int(sse * 1000)],
            "first_boundary": [bounds[0]],
            "last_boundary": [bounds[-2] if len(bounds) > 1 else bounds[0]],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# C4-style cleaning-rule attribution census (q385)
# --------------------------------------------------------------------------

_C4_SQL = """
WITH f AS (
  SELECT len(regexp_extract_all(lower(text), '[a-z]+')) < 5 AS r_short,
         NOT regexp_matches(rtrim(text), '[.!?"]$') AS r_no_terminal,
         position('{' IN text) > 0 AS r_curly,
         contains(lower(text), 'lorem ipsum') AS r_lorem,
         regexp_matches(lower(text), '[a-z]{26,}') AS r_longword
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT) AS r_short,
       CAST(SUM(CASE WHEN r_no_terminal THEN 1 ELSE 0 END) AS BIGINT)
         AS r_no_terminal,
       CAST(SUM(CASE WHEN r_curly THEN 1 ELSE 0 END) AS BIGINT) AS r_curly,
       CAST(SUM(CASE WHEN r_lorem THEN 1 ELSE 0 END) AS BIGINT) AS r_lorem,
       CAST(SUM(CASE WHEN r_longword THEN 1 ELSE 0 END) AS BIGINT)
         AS r_longword,
       CAST(SUM(CASE WHEN NOT (r_short OR r_no_terminal OR r_curly
                               OR r_lorem OR r_longword)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM f
"""


@query("q385_c4_rule_census", sql=_C4_SQL)
def q385_c4_rule_census(sf_dir: str):
    """C4-style cleaning-rule ATTRIBUTION: per rule, how many documents
    it would drop (short text, no terminal punctuation, curly brace,
    lorem-ipsum, 26+-char token) plus the survivor count — the rule-
    tuning census run before committing a filter chain (complements
    q58's single composite floor).  One vectorized pandas-str pass,
    zero exchanges beyond the 1-row fold.  Output: (n_docs, r_short,
    r_no_terminal, r_curly, r_lorem, r_longword, n_survivors)."""
    ds = _read(sf_dir, "documents", ["text"])

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].astype(str)
        low = t.str.lower()
        r_short = low.str.count(r"[a-z]+") < 5
        r_noterm = ~t.str.rstrip().str.contains(r'[.!?"]$', regex=True)
        r_curly = t.str.contains("{", regex=False)
        r_lorem = low.str.contains("lorem ipsum", regex=False)
        r_long = low.str.contains(r"[a-z]{26,}", regex=True)
        keep = ~(r_short | r_noterm | r_curly | r_lorem | r_long)
        return pd.DataFrame(
            {
                "n_docs": [len(t)],
                "r_short": [int(r_short.sum())],
                "r_no_terminal": [int(r_noterm.sum())],
                "r_curly": [int(r_curly.sum())],
                "r_lorem": [int(r_lorem.sum())],
                "r_longword": [int(r_long.sum())],
                "n_survivors": [int(keep.sum())],
            }
        )

    cols = ["n_docs", "r_short", "r_no_terminal", "r_curly", "r_lorem",
            "r_longword", "n_survivors"]
    out = (
        ds.map_batches(rules, batch_format="pandas")
        .groupby(None)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    return out[cols].astype("int64")


# --------------------------------------------------------------------------
# Autocorrelation pitch detection over the audio payload (q386)
# --------------------------------------------------------------------------

_PITCH_SQL = (
    "SELECT fmt, n_clips, sum_pitch_chz, min_pitch_chz, max_pitch_chz "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/pitch_sf0.01.parquet') "
    "ORDER BY fmt"
)


def pitch_lag(pcm: np.ndarray, sr: int) -> int:
    """Dominant-tone lag: argmax over lags in [sr/4000, sr/80] of the
    integer autocorrelation sum(x[t] * x[t+L]); ties -> smallest lag."""
    x = pcm.astype(np.int64)
    lo = max(2, sr // 4000)
    hi = min(sr // 80, len(x) - 1)
    best_l, best_s = lo, None
    for L in range(lo, hi + 1):
        s = int(np.dot(x[:-L], x[L:]))
        if best_s is None or s > best_s:
            best_l, best_s = L, s
    return best_l


@query("q386_pitch_detect", sql=_PITCH_SQL)
def q386_pitch_detect(sf_dir: str):
    """Dominant-pitch detection per audio clip: exact integer
    autocorrelation argmax over the 80 Hz - 4 kHz lag window, reported
    in centi-Hz (100 * sr // lag) — the tone/music gate for audio
    curation.  Decode + lag scan stay in the actor pool (the per-lag
    dot products are numpy int64, exact); one int per clip shuffles.
    Oracle fixture: INDEPENDENT twin over the REGENERATED raw PCM
    (never the container codec path) with the lossy-format
    quantization applied arithmetically.  Output per fmt:
    (fmt, n_clips, sum_pitch_chz, min_pitch_chz, max_pitch_chz)."""
    from texrex_ray.sources.av import decode_audio
    from texrex_ray.sources.av import fixture_path as av_fixture

    n_aud, _ = _av_n(sf_dir)
    d = av_fixture(n=n_aud, seed=42)
    ds = ray.data.read_parquet(f"{d}/audio.parquet",
                               columns=["bytes", "fmt"])

    def score(t: pa.Table) -> pa.Table:
        fmts, chz = [], []
        for raw, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            pcm, sr = decode_audio(raw)
            chz.append(100 * sr // pitch_lag(pcm, sr))
            fmts.append(fmt)
        return pa.table({"fmt": fmts, "chz": pa.array(chz, pa.int64())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["chz"]
        return pd.DataFrame(
            {
                "n_clips": g.size(),
                "sum_pitch_chz": g.sum(),
                "min_pitch_chz": g.min(),
                "max_pitch_chz": g.max(),
            }
        ).reset_index()

    out = (
        ds.map_batches(score, batch_format="pyarrow", batch_size=64)
        .map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_clips", alias_name="n_clips"),
            Sum("sum_pitch_chz", alias_name="sum_pitch_chz"),
            Min("min_pitch_chz", alias_name="min_pitch_chz"),
            Max("max_pitch_chz", alias_name="max_pitch_chz"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_clips", "sum_pitch_chz", "min_pitch_chz",
              "max_pitch_chz"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_clips", "sum_pitch_chz", "min_pitch_chz",
                "max_pitch_chz"]]


# --------------------------------------------------------------------------
# Shot-boundary detection over the video payload (q387)
# --------------------------------------------------------------------------

_SHOT_SQL = (
    "SELECT n_videos, n_frame_pairs, n_boundaries, sum_max_diff "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/shots_sf0.01.parquet')"
)


def shot_stats(frames: np.ndarray) -> tuple[int, int, int]:
    """(n_pairs, n_boundaries, max_diff): consecutive-frame L1
    luminance differences; a pair is a BOUNDARY when its diff exceeds
    2x the (lower-)median diff of the clip — the classic adaptive
    threshold, exact integers."""
    lum = frames.astype(np.int64).sum(axis=3)
    d = np.abs(np.diff(lum, axis=0)).sum(axis=(1, 2))
    if len(d) == 0:
        return 0, 0, 0
    med = int(np.sort(d)[(len(d) + 1) // 2 - 1])
    return len(d), int((d > 2 * med).sum()), int(d.max())


@query("q387_shot_boundaries", sql=_SHOT_SQL)
def q387_shot_boundaries(sf_dir: str):
    """Shot-boundary detection per video clip: consecutive-frame L1
    luminance deltas against an adaptive 2x-median threshold — the
    frame-sampling gate (sample densely inside shots, never across
    them).  Decode + diff stay in the actor pool; three ints per clip
    shuffle.  Oracle fixture: INDEPENDENT struct-unpack parser twin
    (never decode_video).  Output:
    (n_videos, n_frame_pairs, n_boundaries, sum_max_diff)."""
    from texrex_ray.sources.av import decode_video
    from texrex_ray.sources.av import fixture_path as av_fixture

    _, n_vid = _av_n(sf_dir)
    d = av_fixture(n=n_vid, seed=42)
    ds = ray.data.read_parquet(f"{d}/video.parquet", columns=["bytes"])

    def score(t: pa.Table) -> pa.Table:
        np_, nb, mx = [], [], []
        for raw in t["bytes"].to_pylist():
            frames, _fps = decode_video(raw)
            a, b, c = shot_stats(frames)
            np_.append(a)
            nb.append(b)
            mx.append(c)
        return pa.table(
            {
                "n_videos": pa.array([1] * len(np_), pa.int64()),
                "n_frame_pairs": pa.array(np_, pa.int64()),
                "n_boundaries": pa.array(nb, pa.int64()),
                "max_diff": pa.array(mx, pa.int64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow", batch_size=32)
        .groupby(None)
        .aggregate(
            Sum("n_videos", alias_name="n_videos"),
            Sum("n_frame_pairs", alias_name="n_frame_pairs"),
            Sum("n_boundaries", alias_name="n_boundaries"),
            Sum("max_diff", alias_name="sum_max_diff"),
        )
        .to_pandas()
    )
    return out[["n_videos", "n_frame_pairs", "n_boundaries",
                "sum_max_diff"]].astype("int64")
