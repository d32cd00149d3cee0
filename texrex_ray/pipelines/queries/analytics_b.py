"""Sessions / layout / index analytics (redirects, SCD intervals, compaction, postings, coverage; q196-q246 era).

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
from texrex_ray.pipelines.queries.flagships import TOKEN_SQL, _TOKEN_RE, _sf_of  # noqa: F401
from texrex_ray.pipelines.queries.corpus_ops import _EDGE_FIXTURE, _SESSIONS_SQL  # noqa: F401
from texrex_ray.pipelines.queries.analytics_a import PPM  # noqa: F401



# --------------------------------------------------------------------------
# Peak session concurrency (max interval overlap via distributed scan)
# --------------------------------------------------------------------------

_PEAK_SQL = (
    "WITH sess AS (\n" + _SESSIONS_SQL + "\n),\n"
    + """
b AS (SELECT start_us AS ts, 1 AS dd FROM sess
      UNION ALL SELECT end_us, -1 FROM sess),
p AS (SELECT ts, dd,
             SUM(dd) OVER (ORDER BY ts, dd DESC ROWS UNBOUNDED PRECEDING) AS c
      FROM b)
SELECT CAST((SELECT MAX(c) FROM p) AS BIGINT) AS peak,
       CAST((SELECT MIN(ts) FROM p WHERE c = (SELECT MAX(c) FROM p))
            AS BIGINT) AS peak_ts_us,
       CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions
"""
)


@query("q196_peak_concurrency", sql=_PEAK_SQL)
def q196_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions (max interval overlap) over q98's
    30-min sessions — the capacity number a crawl scheduler or serving
    planner actually provisions for.  Classic sweep: +1 at session
    start, -1 at end, peak = max running sum with starts before ends at
    equal timestamps.  Distributed shape: boundary deltas pre-aggregate
    per TIMESTAMP (one keyed exchange), a distributed sort orders the
    grid, and the scan runs as per-block partials (local prefix max +
    block delta sum) composed with block offsets on the driver — the
    prefix-scan decomposition, so no single task ever sees the whole
    timeline."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.sessions import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    sess = sessionize(
        ds, order_cols=("event_id",), gap_us=1_800_000_000,
        expected_rows=ds.count(),
    )
    n_sessions = sess.count()

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [
                pd.DataFrame({"ts": df["start_us"], "plus": 1, "minus": 0}),
                pd.DataFrame({"ts": df["end_us"], "plus": 0, "minus": 1}),
            ]
        )
        return (
            out.groupby("ts", sort=False)[["plus", "minus"]].sum().reset_index()
        )

    grid = bucketed_groupby(
        sess.map_batches(bounds, batch_format="pandas"),
        "ts",
        lambda g: g.groupby("ts", sort=False)[["plus", "minus"]].sum()
        .reset_index(),
        expected_rows=2 * n_sessions,
    ).sort("ts").materialize()

    @ray.remote
    def block_scan(blk: pa.Table):
        ts = blk["ts"].to_numpy(zero_copy_only=False)
        plus = blk["plus"].to_numpy(zero_copy_only=False).astype(np.int64)
        minus = blk["minus"].to_numpy(zero_copy_only=False).astype(np.int64)
        delta = plus - minus
        before = np.concatenate([[0], np.cumsum(delta)[:-1]])
        c_mid = before + plus  # starts count before ends at equal ts
        if len(c_mid) == 0:
            return 0, None, None
        i = int(np.argmax(c_mid))  # earliest index at the max
        return int(delta.sum()), int(c_mid[i]), int(ts[i])

    parts = ray.get([block_scan.remote(r) for r in grid.to_arrow_refs()])
    offset, peak, peak_ts = 0, -(1 << 62), None
    for dsum, best, bts in parts:
        if best is not None and offset + best > peak:
            peak, peak_ts = offset + best, bts
        offset += dsum
    return pd.DataFrame(
        {"peak": [peak], "peak_ts_us": [peak_ts], "n_sessions": [n_sessions]}
    ).astype("int64")


# --------------------------------------------------------------------------
# Redirect-chain resolution (pointer jumping over the link graph)
# --------------------------------------------------------------------------

_REDIRECT_FIXTURE = "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
_REDIRECT_ROUNDS = 10  # doubling rounds -> resolves chains up to 2^10 hops

_REDIRECT_SQL = f"""
WITH RECURSIVE
e AS (SELECT src, dst FROM read_parquet('{_REDIRECT_FIXTURE}')),
r AS (SELECT src, MIN(dst) AS tgt FROM e
      WHERE md5_number_lower(src) % 10 < 3 GROUP BY 1),
nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM e
                                  UNION ALL SELECT dst FROM e)),
walk AS (
  SELECT n.n AS start, n.n AS cur, 0 AS hops FROM nodes n
  UNION ALL
  SELECT w.start, r.tgt, w.hops + 1
  FROM walk w JOIN r ON r.src = w.cur WHERE w.hops < {2**_REDIRECT_ROUNDS}
),
term AS (SELECT start, cur, hops FROM walk
         WHERE cur NOT IN (SELECT src FROM r)
           AND hops <= {2**_REDIRECT_ROUNDS})
SELECT n.n AS src_node,
       COALESCE(t.cur, '<cycle>') AS final_node,
       CAST(COALESCE(t.hops, -1) AS BIGINT) AS hops
FROM nodes n LEFT JOIN term t ON t.start = n.n
ORDER BY src_node
"""


@query("q197_redirect_resolution", sql=_REDIRECT_SQL)
def q197_redirect_resolution(sf_dir: str):
    """Redirect-chain resolution over the committed link graph: nodes
    in a deterministic md5 bucket (30%) act as redirects to their
    smallest out-neighbor; every URL resolves to its terminal target
    with hop count, cycles marked '<cycle>' — the canonical-URL step a
    crawler runs before dedup (HTTP 3xx flattening).  Engine plan is
    POINTER JUMPING: {_REDIRECT_ROUNDS} doubling rounds p <- p[p],
    s <- s + s[p] (log chain length, each round ONE hash-partitioned
    self-join at scale; here vectorized index gather), vs the oracle's
    hop-at-a-time recursive CTE — independent algorithms, identical
    results."""
    import hashlib

    ed = ray.data.read_parquet(_REDIRECT_FIXTURE).to_pandas()
    nodes = np.sort(
        pd.unique(pd.concat([ed["src"], ed["dst"]], ignore_index=True))
    )
    idx = {u: i for i, u in enumerate(nodes)}

    def bucket(u: str) -> int:
        return int.from_bytes(hashlib.md5(u.encode()).digest()[8:], "little") % 10

    tgt = (
        ed[[bucket(u) < 3 for u in ed["src"]]]
        .groupby("src")["dst"]
        .min()
    )
    # a redirect must have an out-edge; bucketed nodes without one are
    # terminals (mirrors the oracle's r = bucketed src nodes of e)
    is_red = np.isin(nodes, tgt.index.to_numpy())
    p = np.arange(len(nodes), dtype=np.int64)
    s = np.zeros(len(nodes), dtype=np.int64)
    for u, t in tgt.items():
        p[idx[u]] = idx[t]
        s[idx[u]] = 1
    for _ in range(_REDIRECT_ROUNDS):
        s = s + s[p]
        p = p[p]
    resolved = ~is_red[p]
    final = np.where(resolved, nodes[p], "<cycle>")
    hops = np.where(resolved, s, -1)
    return pd.DataFrame(
        {"src_node": nodes, "final_node": final, "hops": hops.astype("int64")}
    )


# --------------------------------------------------------------------------
# Weighted-Jaccard source similarity (token multiset min/max ratio)
# --------------------------------------------------------------------------

_WJACC_SQL = f"""
WITH c AS (SELECT source, unnest({TOKEN_SQL}) AS token FROM documents),
cc AS (SELECT source, token, CAST(COUNT(*) AS HUGEINT) AS n FROM c GROUP BY 1, 2),
s AS (SELECT DISTINCT source FROM documents),
p AS (SELECT a.source AS src_a, b.source AS src_b
      FROM s a JOIN s b ON a.source < b.source),
u AS (SELECT p.src_a, p.src_b, cc.token
      FROM p JOIN cc ON cc.source IN (p.src_a, p.src_b) GROUP BY 1, 2, 3),
m AS (SELECT u.src_a, u.src_b,
             COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb
      FROM u LEFT JOIN cc a ON a.source = u.src_a AND a.token = u.token
             LEFT JOIN cc b ON b.source = u.src_b AND b.token = u.token)
SELECT src_a, src_b,
       CAST(SUM(LEAST(na, nb)) * {PPM} // SUM(GREATEST(na, nb)) AS BIGINT)
            AS wjacc_ppm
FROM m GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q198_weighted_jaccard", sql=_WJACC_SQL)
def q198_weighted_jaccard(sf_dir: str):
    """Weighted Jaccard similarity sum(min)/sum(max) between every
    source pair over token MULTISETS — the set-similarity twin of
    q170's cosine (Jaccard punishes volume mismatch where cosine
    forgives it; a mixture designer reads both).  Scale shape differs
    from q170: per-pair min/max contributions are computed INSIDE
    token-keyed buckets (each bucket pivots its tokens x sources and
    emits pairs-sized partials), so the driver never holds a
    vocab-sized frame — finish is |S|^2/2 rows."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in _TOKEN_RE.findall((txt or "").lower()):
                cnt[(src, tok)] += 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks]),
                "token": pa.array([k[1] for k in ks]),
                "c": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(
            index="token", columns="source", values="c",
            aggfunc="sum", fill_value=0,
        )
        srcs = sorted(piv.columns)
        rows = []
        for i, a in enumerate(srcs):
            va = piv[a].to_numpy()
            for b in srcs[i + 1:]:
                vb = piv[b].to_numpy()
                rows.append(
                    (a, b, int(np.minimum(va, vb).sum()),
                     int(np.maximum(va, vb).sum()))
                )
        return pd.DataFrame(rows, columns=["src_a", "src_b", "smin", "smax"])

    parts = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "token",
        pair_partials,
        expected_rows=ds.count() * 64,
    ).to_pandas()  # pairs x buckets sized
    agg = parts.groupby(["src_a", "src_b"], as_index=False)[["smin", "smax"]].sum()
    agg["wjacc_ppm"] = [
        int(a) * PPM // int(b) for a, b in zip(agg["smin"], agg["smax"])
    ]
    out = agg[["src_a", "src_b", "wjacc_ppm"]].sort_values(["src_a", "src_b"])
    out["wjacc_ppm"] = out["wjacc_ppm"].astype("int64")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# Churn-label generation (leakage-safe temporal split)
# --------------------------------------------------------------------------

CHURN_HORIZON_US = 7 * 86400 * 1_000_000

_CHURN_SQL = f"""
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
pre AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_past,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                    AS value_past_c,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                    AS active_days_past
        FROM events, mx
        WHERE epoch_us(ts) < mx.m - {CHURN_HORIZON_US} GROUP BY 1),
post AS (SELECT DISTINCT user_id FROM events, mx
         WHERE epoch_us(ts) >= mx.m - {CHURN_HORIZON_US})
SELECT pre.user_id, n_past, value_past_c, active_days_past,
       CAST(CASE WHEN post.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
            AS churned
FROM pre LEFT JOIN post USING (user_id) ORDER BY 1
"""


@query("q199_churn_labels", sql=_CHURN_SQL)
def q199_churn_labels(sf_dir: str):
    """Leakage-safe churn-label generation: features strictly BEFORE
    the temporal split T = max_ts - 7d (event count, value cents,
    distinct active days), label = no activity at or after T — the
    training-table builder whose one invariant is that no post-split
    fact leaks into a feature (the split is a pure function of ts, so
    it holds per batch by construction).  ONE user-keyed exchange
    carries (user, day, cents, post-flag); users without pre-split
    history produce no row (they have no features)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    t_split = pd.Timestamp(ds.max("ts")).value // 1000 - CHURN_HORIZON_US

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        pre = us < t_split
        f = pd.DataFrame(
            {"user_id": df["user_id"], "day": day, "vc": vc, "pre": pre}
        )
        feats = (
            f[f["pre"]]
            .groupby("user_id")
            .agg(
                n_past=("vc", "size"),
                value_past_c=("vc", "sum"),
                active_days_past=("day", "nunique"),
            )
            .reset_index()
        )
        post = set(f[~f["pre"]]["user_id"])
        feats["churned"] = [
            0 if u in post else 1 for u in feats["user_id"]
        ]
        return feats

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype("int64")


# --------------------------------------------------------------------------
# SCD2 state intervals (run-length compression of per-user event types)
# --------------------------------------------------------------------------

_SCD_SQL = """
WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                  CASE WHEN lag(event_type) OVER w IS NULL
                            OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (SELECT user_id, event_type, us,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) - 1 AS run_idx
      FROM o),
g AS (SELECT user_id, run_idx, event_type,
             MIN(us) AS valid_from_us, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM r GROUP BY 1, 2, 3),
mx AS (SELECT user_id, MAX(us) AS last_us FROM o GROUP BY 1)
SELECT g.user_id, CAST(g.run_idx AS BIGINT) AS run_idx, g.event_type,
       g.valid_from_us, COALESCE(
           lead(g.valid_from_us) OVER (PARTITION BY g.user_id
                                       ORDER BY g.run_idx),
           mx.last_us) AS valid_to_us,
       g.n_events
FROM g JOIN mx USING (user_id) ORDER BY user_id, run_idx
"""


@query("q200_scd_intervals", sql=_SCD_SQL)
def q200_scd_intervals(sf_dir: str):
    """SCD-type-2 state intervals: each user's event-type sequence
    run-length-compressed into validity intervals [valid_from_us,
    valid_to_us) closed by the next state change (the last run closes
    at the user's final event) — the dimension-table build every
    warehouse ETL runs, and the crawl twin of per-host fetch-state
    history.  A per-user fact: ONE user-keyed bucketed exchange; the
    change-point detection, run grouping and interval closing are all
    vectorized inside the bucket (diff + cumsum, the sessionize
    shape)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(us=us)
        same_user = df["user_id"].eq(df["user_id"].shift())
        same_type = df["event_type"].eq(df["event_type"].shift())
        chg = (~(same_user & same_type)).astype(np.int64)
        run = chg.cumsum()  # globally increasing; per-user re-indexed below
        g = (
            df.assign(run=run)
            .groupby(["user_id", "run", "event_type"], sort=False)
            .agg(valid_from_us=("us", "min"), n_events=("us", "size"),
                 last_us=("us", "max"))
            .reset_index()
        )
        g["run_idx"] = g.groupby("user_id", sort=False).cumcount()
        nxt = g.groupby("user_id", sort=False)["valid_from_us"].shift(-1)
        user_last = g.groupby("user_id", sort=False)["last_us"].transform("max")
        g["valid_to_us"] = nxt.fillna(user_last).astype(np.int64)
        return g[
            ["user_id", "run_idx", "event_type", "valid_from_us",
             "valid_to_us", "n_events"]
        ]

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .sort_values(["user_id", "run_idx"])
        .reset_index(drop=True)
    )
    for c in ("user_id", "run_idx", "valid_from_us", "valid_to_us", "n_events"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Small-file compaction planner (storage maintenance: next-fit banding)
# --------------------------------------------------------------------------

COMPACT_TARGET = 16_384  # chars per output file (stand-in for bytes)

_COMPACT_SQL = f"""
WITH c AS (SELECT source, doc_id, n_chars,
                  SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_chars
                      AS bytes_before
           FROM documents)
SELECT source, CAST(bytes_before // {COMPACT_TARGET} AS BIGINT) AS batch_idx,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS bytes
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q201_compaction_plan", sql=_COMPACT_SQL)
def q201_compaction_plan(sf_dir: str):
    """Small-file compaction planner (the OPTIMIZE/rewrite step every
    long-lived parquet/Lance corpus needs after many incremental crawl
    appends): within each storage partition (source), fragments ordered
    by id are banded into output files by NEXT-FIT on cumulative size —
    batch = floor(bytes_before / target) — a one-pass, deterministic
    approximation of bin packing that never reorders fragments (row
    order is lineage).  Scale shape: the group is a PARTITION'S FILE
    MANIFEST (metadata-sized — fragment ids + sizes, never data), so
    the per-group pandas cumsum holds even when the data itself is
    100 TB; the exchange is one source-keyed bucketed_groupby."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "doc_id", "n_chars"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        sz = df["n_chars"].to_numpy(dtype=np.int64)
        # per-source exclusive cumsum (restart at source boundaries)
        cum = np.cumsum(sz) - sz
        first = (~df["source"].eq(df["source"].shift())).to_numpy()
        base = np.where(first, cum, 0)
        np.maximum.accumulate(base, out=base)
        before = cum - base
        df = df.assign(batch_idx=before // COMPACT_TARGET)
        g = (
            df.groupby(["source", "batch_idx"], sort=False)
            .agg(n_files=("n_chars", "size"), bytes=("n_chars", "sum"))
            .reset_index()
        )
        return g

    out = (
        bucketed_groupby(ds, "source", plan, expected_rows=ds.count())
        .to_pandas()
        .sort_values(["source", "batch_idx"])
        .reset_index(drop=True)
    )
    for c in ("batch_idx", "n_files", "bytes"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Blocked record linkage (Fellegi-Sunter-style additive agreement scores)
# --------------------------------------------------------------------------

LINK_BAND = 64          # n_chars blocking band width
LINK_THRESHOLD = 25     # keep pairs scoring at least this

_LINKAGE_SQL = f"""
WITH d AS (SELECT doc_id, lang, source, n_chars,
                  substr(text, 1, 8)  AS pre8,
                  substr(text, length(text) - 7, 8) AS suf8,
                  n_chars // {LINK_BAND} AS band
           FROM documents),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (CASE WHEN a.pre8 = b.pre8 THEN 22 ELSE -3 END)
           + (CASE WHEN a.suf8 = b.suf8 THEN 18 ELSE -2 END)
           + (CASE WHEN abs(a.n_chars - b.n_chars) <= 4 THEN 7 ELSE -1 END)
           + (CASE WHEN a.source = b.source THEN 2 ELSE 0 END) AS score
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(score AS BIGINT) AS score
FROM p WHERE score >= {LINK_THRESHOLD} ORDER BY doc_a, doc_b
"""


@query("q202_record_linkage", sql=_LINKAGE_SQL)
def q202_record_linkage(sf_dir: str):
    """Fellegi-Sunster-style record linkage: block on (lang, length
    band), score candidate pairs by an additive agreement pattern over
    cheap deterministic features (8-char prefix/suffix equality, length
    proximity, same source) with fixed integer log-weight surrogates,
    keep pairs above threshold.  The classical ER shape: blocking keeps
    the candidate set near-linear, the score is a pure per-pair
    function.  Scale: ONE exchange keyed on the block id; per-group
    work is |block|^2 bounded by the band construction (a hot block at
    corpus scale is split by tightening the band, the documented
    setjoin/tender remedy)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source", "text", "n_chars"])

    def feats(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": t["n_chars"],
                "pre8": pa.array([(s or "")[:8] for s in txt]),
                "suf8": pa.array([(s or "")[-8:] for s in txt]),
                "band": pc.divide(t["n_chars"], pa.scalar(LINK_BAND, pa.int64())),
            }
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        rows = []
        ids = g["doc_id"].to_numpy()
        nch = g["n_chars"].to_numpy()
        pre = g["pre8"].to_numpy()
        suf = g["suf8"].to_numpy()
        src = g["source"].to_numpy()
        for bkey, idx in g.groupby(["lang", "band"], sort=False).indices.items():
            for ii in range(len(idx)):
                i = idx[ii]
                for jj in range(ii + 1, len(idx)):
                    j = idx[jj]
                    s = (
                        (22 if pre[i] == pre[j] else -3)
                        + (18 if suf[i] == suf[j] else -2)
                        + (7 if abs(int(nch[i]) - int(nch[j])) <= 4 else -1)
                        + (2 if src[i] == src[j] else 0)
                    )
                    if s >= LINK_THRESHOLD:
                        a, b = int(ids[i]), int(ids[j])
                        rows.append((a, b, s))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "score"])

    n = ds.count()
    blocked = ds.map_batches(feats, batch_format="pyarrow")

    def bkey(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()),
            pc.cast(t["band"], pa.string()),
            "|",
        )
        return t.append_column("block", key)

    out = (
        bucketed_groupby(
            blocked.map_batches(bkey, batch_format="pyarrow"),
            "block",
            block_pairs,
            expected_rows=n,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    for c in ("doc_a", "doc_b", "score"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Theil-Sen robust slope per user (median of pairwise slopes)
# --------------------------------------------------------------------------

TS_CAP = 200  # pairwise slopes over at most this many leading events/user

_THEILSEN_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                  CAST(ROUND(value * 100) AS BIGINT) AS vc,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
c AS (SELECT * FROM e WHERE rn <= {TS_CAP}),
p AS (SELECT a.user_id,
             (b.vc - a.vc) * 86400000000 // (b.us - a.us) AS s
      FROM c a JOIN c b
        ON a.user_id = b.user_id AND b.rn > a.rn AND b.us > a.us)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(quantile_disc(s, 0.5) AS BIGINT) AS slope_cpd
FROM p GROUP BY 1 ORDER BY 1
"""


@query("q203_theil_sen", sql=_THEILSEN_SQL)
def q203_theil_sen(sf_dir: str):
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise
    slopes (value cents per day, truncating integer division mirroring
    DuckDB's ``//``) over the user's first {TS_CAP} events — the
    outlier-proof alternative to q109's least-squares trend (one wild
    value moves OLS arbitrarily, moves Theil-Sen not at all).  The cap
    bounds per-user work at O(cap^2) with a deterministic prefix rule
    shared by the SQL twin.  Scale: one user-keyed exchange; slopes are
    formed by numpy broadcasting inside the group, never globally."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out_u, out_n, out_s = [], [], []
        us_all = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vc_all = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        for uid, idx in df.groupby("user_id", sort=False).indices.items():
            us = us_all[idx][:TS_CAP]
            vc = vc_all[idx][:TS_CAP]
            dt = us[None, :] - us[:, None]
            dv = vc[None, :] - vc[:, None]
            m = dt > 0  # upper triangle by time; equal-ts pairs excluded
            iu = np.triu_indices(len(us), k=1)
            keep = m[iu]
            dts = dt[iu][keep]
            dvs = dv[iu][keep]
            if len(dts) == 0:
                continue
            # DuckDB // truncates toward zero; emulate exactly
            mag = (np.abs(dvs) * 86_400_000_000) // dts
            s = np.where(dvs < 0, -mag, mag)
            s.sort()
            out_u.append(int(uid))
            out_n.append(len(s))
            out_s.append(int(s[(len(s) - 1) // 2]))
        return pd.DataFrame(
            {"user_id": out_u, "n_pairs": out_n, "slope_cpd": out_s}
        )

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_pairs", "slope_cpd"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Time-series gap fill (per-user daily resample with zero-fill)
# --------------------------------------------------------------------------

_GAPFILL_SQL = """
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                  CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                      AS value_c
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
g AS (SELECT user_id,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                 AS day
      FROM r)
SELECT g.user_id,
       CAST(g.day - DATE '1970-01-01' AS BIGINT) AS day_idx,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.value_c, 0) AS value_c
FROM g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day
ORDER BY 1, 2
"""


@query("q204_gap_fill", sql=_GAPFILL_SQL)
def q204_gap_fill(sf_dir: str):
    """Per-user daily resample with explicit zero-filled gaps between
    the user's first and last active day — the step every downstream
    window/trend/periodicity model needs before it can treat a series
    as equally spaced (a missing day is a ZERO observation, not an
    absent row; q177/q193-style models silently skew without it).
    Scale: one user-keyed exchange of (user, day) partials; the dense
    reindex (np.arange span + scatter) happens per user inside the
    bucket, output is span-sized per user, never corpus-wide."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        vc = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(), "day_idx": day, "vc": vc}
        )
        g = (
            df.groupby(["user_id", "day_idx"], sort=False)
            .agg(n_events=("vc", "size"), value_c=("vc", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "day_idx"], sort=False)
            .agg(n_events=("n_events", "sum"), value_c=("value_c", "sum"))
            .reset_index()
        )
        outs = []
        for uid, sub in g.groupby("user_id", sort=False):
            lo, hi = int(sub["day_idx"].min()), int(sub["day_idx"].max())
            days = np.arange(lo, hi + 1, dtype=np.int64)
            n = np.zeros(len(days), dtype=np.int64)
            v = np.zeros(len(days), dtype=np.int64)
            pos = sub["day_idx"].to_numpy(dtype=np.int64) - lo
            n[pos] = sub["n_events"].to_numpy(dtype=np.int64)
            v[pos] = sub["value_c"].to_numpy(dtype=np.int64)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(len(days), int(uid), np.int64),
                        "day_idx": days,
                        "n_events": n,
                        "value_c": v,
                    }
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                columns=["user_id", "day_idx", "n_events", "value_c"]
            )
        )

    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            "user_id",
            fill,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values(["user_id", "day_idx"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Multi-pattern literal scan (blocklist/lexicon hit counting)
# --------------------------------------------------------------------------

SCAN_PATTERNS = ["batch batch", "window window", "slow scan", "hash join",
                 "sort order", "dup"]

_PATTERN_SQL = " UNION ALL ".join(
    f"""
SELECT source, '{p}' AS pattern,
       CAST(SUM((length(text) - length(replace(text, '{p}', '')))
                // {len(p)}) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN position('{p}' IN text) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""
    for p in SCAN_PATTERNS
) + " ORDER BY source, pattern"


@query("q205_pattern_counts", sql=_PATTERN_SQL)
def q205_pattern_counts(sf_dir: str):
    """Multi-pattern literal scan over the corpus: per (source,
    pattern) non-overlapping hit counts + matching-doc counts for a
    fixed lexicon — the counting generalization of q141's boolean
    blocklist gate (lexicon audits, contamination phrase tallies,
    keyword dashboards).  Python's str.count IS the non-overlapping
    greedy-left count the SQL replace() trick computes, and it runs in
    C per (doc, pattern) — for lexicons beyond ~100 entries the same
    stage swaps in an Aho-Corasick automaton built once per actor (the
    q141 pattern); counts are identical, the scan becomes one pass.
    Zero exchanges beyond a |sources|x|patterns| partial-sum table."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_pylist()
        txts = t["text"].to_pylist()
        agg: dict[tuple[str, str], list[int]] = {}
        for s, x in zip(srcs, txts):
            x = x or ""
            for p in SCAN_PATTERNS:
                c = x.count(p)
                a = agg.setdefault((s, p), [0, 0])
                a[0] += c
                a[1] += 1 if c > 0 else 0
        ks = sorted(agg)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks]),
                "pattern": pa.array([k[1] for k in ks]),
                "n_hits": pa.array([agg[k][0] for k in ks], pa.int64()),
                "n_docs": pa.array([agg[k][1] for k in ks], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "pattern"])
        .aggregate(Sum("n_hits", alias_name="n_hits"),
                   Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
        .sort_values(["source", "pattern"])
        .reset_index(drop=True)
    )
    out["n_hits"] = out["n_hits"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Per-fragment encoding stats (RLE/dictionary encodability audit)
# --------------------------------------------------------------------------

ENC_FRAG = 4096  # rows per storage fragment

_ENCSTATS_SQL = f"""
WITH f AS (SELECT event_id // {ENC_FRAG} AS frag_id, event_type,
                  row_number() OVER (PARTITION BY event_id // {ENC_FRAG}
                                     ORDER BY ts, event_id) AS rn,
                  lag(event_type) OVER (PARTITION BY event_id // {ENC_FRAG}
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT frag_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN prev IS NULL OR prev <> event_type
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM f GROUP BY 1 ORDER BY 1
"""


@query("q206_encoding_stats", sql=_ENCSTATS_SQL)
def q206_encoding_stats(sf_dir: str):
    """Per-fragment encodability audit for the event_type column: run
    count under the fragment's (ts, event_id) order and distinct count
    — the two numbers that decide whether RLE / dictionary encoding
    pays and whether a re-sort (q78/q146 layout ops) is worth the
    write amplification.  Fragments are fixed row-ranges (event_id
    div), so the stat is embarrassingly parallel: ONE fragment-keyed
    exchange, runs counted by a vectorized shift-compare inside each
    fragment, nothing global."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def add_frag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "frag_id",
            pc.divide(t["event_id"], pa.scalar(ENC_FRAG, pa.int64())),
        )

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["frag_id", "ts", "event_id"], kind="mergesort")
        outs = []
        for fid, sub in df.groupby("frag_id", sort=False):
            et = sub["event_type"].to_numpy()
            runs = 1 + int((et[1:] != et[:-1]).sum()) if len(et) else 0
            outs.append(
                (int(fid), len(et), runs, int(pd.unique(et).size))
            )
        return pd.DataFrame(
            outs, columns=["frag_id", "n_rows", "n_runs", "n_distinct"]
        )

    out = (
        bucketed_groupby(
            ds.map_batches(add_frag, batch_format="pyarrow"),
            "frag_id",
            stats,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values("frag_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Shortest-path centralities over the crawl link graph (q207, q208)
# --------------------------------------------------------------------------

_GRAPH_FIXDIR = "/root/repo/tests/fixtures"


@query(
    "q207_stress_centrality",
    sql="SELECT node, stress FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/stress_centrality_sf0.01.parquet') "
    "ORDER BY node",
)
def q207_stress_centrality(sf_dir: str):
    """Stress centrality — the INTEGER cousin of betweenness (number
    of shortest s->t paths through v, over all ordered pairs): the
    bridge-page diagnostic a crawl operator reads next to q95's
    degrees and q110's HITS before trusting hub sampling.  Integer
    throughout, so the fixture compare is precision-safe where float
    betweenness (summation-order-dependent) is not.  Ray side: per
    source, Brandes-style vectorized level-BFS accumulation fanned out
    over a source Dataset against the ONE broadcast CSR; node-keyed
    groupby folds partials (ops/centrality.py).  Fixture twin: the
    independent pair identity sigma_st(v) = sigma_sv*sigma_vt on BFS
    matrices (tools/gen_oracle_fixtures.py::gen_stress_centrality)."""
    from texrex_ray.ops.centrality import stress_centrality

    edges = ray.data.read_parquet(
        f"{_GRAPH_FIXDIR}/oracle/pagerank_edges.parquet"
    ).to_pandas()
    out = stress_centrality(edges)
    out["stress"] = out["stress"].astype("int64")
    return out


@query(
    "q208_harmonic_closeness",
    sql="SELECT node, harmonic_ppm, n_reached, sum_dist FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/harmonic_closeness_sf0.01.parquet') "
    "ORDER BY node",
)
def q208_harmonic_closeness(sf_dir: str):
    """Harmonic closeness on out-distances: sum(PPM // d(s, v)) over
    reached v, plus reach count and total distance — the
    disconnection-proof closeness variant (unreached nodes contribute
    zero instead of poisoning the mean), computed exactly in floor-div
    integers.  Ray side: one map_batches fan-out of sources against
    the broadcast CSR, one row per source, no fold.  Fixture twin:
    plain deque BFS with dict distances — no shared code with the
    vectorized level-BFS (tools/gen_oracle_fixtures.py)."""
    from texrex_ray.ops.centrality import harmonic_centrality

    edges = ray.data.read_parquet(
        f"{_GRAPH_FIXDIR}/oracle/pagerank_edges.parquet"
    ).to_pandas()
    out = harmonic_centrality(edges).sort_values("node").reset_index(drop=True)
    for c in ("harmonic_ppm", "n_reached", "sum_dist"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Consistent-hash ring placement audit (q209)
# --------------------------------------------------------------------------

RING_VNODES = 32

_RING_SQL = f"""
WITH shards AS (SELECT DISTINCT s_name FROM supplier),
vn AS (SELECT s_name, i FROM shards CROSS JOIN range({RING_VNODES}) t(i)),
ring AS (SELECT s_name,
                CAST(concat('0x', substr(md5(s_name || '#'
                     || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) AS pos
         FROM vn),
ks AS (SELECT c_name,
              CAST(concat('0x', substr(md5(c_name), 1, 15)) AS BIGINT) AS kh
       FROM customer),
rm AS (SELECT MIN(s_name) AS gone FROM shards),
m1 AS (SELECT pos AS p, 0 AS isk, s_name, NULL AS c_name FROM ring
       UNION ALL SELECT kh, 1, NULL, c_name FROM ks),
a1 AS (SELECT c_name, COALESCE(
           first_value(s_name IGNORE NULLS) OVER (
               ORDER BY p, isk DESC, s_name
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
           (SELECT s_name FROM ring ORDER BY pos, s_name LIMIT 1)) AS shard,
           isk
       FROM m1),
m2 AS (SELECT pos AS p, 0 AS isk, s_name, NULL AS c_name
       FROM ring, rm WHERE s_name <> rm.gone
       UNION ALL SELECT kh, 1, NULL, c_name FROM ks),
a2 AS (SELECT c_name, COALESCE(
           first_value(s_name IGNORE NULLS) OVER (
               ORDER BY p, isk DESC, s_name
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
           (SELECT s_name FROM ring, rm WHERE s_name <> rm.gone
            ORDER BY pos, s_name LIMIT 1)) AS shard,
           isk
       FROM m2),
c1 AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n
       FROM a1 WHERE isk = 1 GROUP BY 1),
c2 AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n
       FROM a2 WHERE isk = 1 GROUP BY 1)
SELECT s.s_name AS shard, COALESCE(c1.n, 0) AS n_keys,
       COALESCE(c2.n, 0) AS n_keys_after
FROM shards s
LEFT JOIN c1 ON c1.shard = s.s_name
LEFT JOIN c2 ON c2.shard = s.s_name
ORDER BY 1
"""


@query("q209_hash_ring", sql=_RING_SQL)
def q209_hash_ring(sf_dir: str):
    """Consistent-hash ring placement audit ({RING_VNODES} virtual
    nodes per shard, md5 positions): per-shard key load, and the load
    after decommissioning one shard — the companion to q121's
    rendezvous audit, quantifying the ring's defining property that
    removal only REASSIGNS the departed shard's keys (every surviving
    shard's count is non-decreasing).  Ray side: both rings broadcast
    once (shard-count-sized), customers stream through ONE map_batches
    doing two vectorized searchsorted lookups; partial counts fold in
    a shard-keyed groupby.  Same plan at 10^10 keys — the ring never
    grows with the key count."""
    import hashlib

    def h15(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    shards = sorted(
        _read(sf_dir, "supplier", ["s_name"])
        .to_pandas()["s_name"]
        .unique()
        .tolist()
    )
    gone = min(shards)

    def build_ring(names: list[str]):
        pts = [
            (h15(f"{s}#{i}"), s) for s in names for i in range(RING_VNODES)
        ]
        pts.sort()
        return (
            np.array([p for p, _ in pts], dtype=np.int64),
            np.array([s for _, s in pts]),
        )

    pos1, name1 = build_ring(shards)
    pos2, name2 = build_ring([s for s in shards if s != gone])
    rings = ray.put((pos1, name1, pos2, name2))

    def assign(t: pa.Table) -> pa.Table:
        p1, n1, p2, n2 = ray.get(rings)
        kh = np.array(
            [h15(c) for c in t["c_name"].to_pylist()], dtype=np.int64
        )
        i1 = np.searchsorted(p1, kh, side="left") % len(p1)
        i2 = np.searchsorted(p2, kh, side="left") % len(p2)
        out = []
        for names, idx in ((n1, i1), (n2, i2)):
            s = pd.Series(names[idx]).value_counts()
            out.append(s)
        return pa.table(
            {
                "shard": pa.array(
                    list(out[0].index) + list(out[1].index)
                ),
                "which": pa.array(
                    [0] * len(out[0]) + [1] * len(out[1]), pa.int32()
                ),
                "n": pa.array(
                    list(out[0].to_numpy()) + list(out[1].to_numpy()),
                    pa.int64(),
                ),
            }
        )

    parts = (
        _read(sf_dir, "customer", ["c_name"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["shard", "which"])
        .sum("n")
        .to_pandas()
    )
    col = "sum(n)" if "sum(n)" in parts.columns else "n"
    piv = parts.pivot_table(
        index="shard", columns="which", values=col, fill_value=0
    )
    out = pd.DataFrame({"shard": shards})
    out["n_keys"] = (
        out["shard"].map(piv[0] if 0 in piv.columns else {}).fillna(0)
    ).astype("int64")
    out["n_keys_after"] = (
        out["shard"].map(piv[1] if 1 in piv.columns else {}).fillna(0)
    ).astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


# --------------------------------------------------------------------------
# BM25 retrieval (integer-exact rational arithmetic, k1=6/5, b=3/4)
# --------------------------------------------------------------------------

BM25_TERMS = ("hash", "join", "window")
BM25_TOPK = 20

# contribution(doc, t) = idf_c(t) * 44*tf*T // (20*tf*T + 6*T + 18*dl*N)
# where idf_c = N*PPM // df — the BM25 tf-saturation term with k1=6/5,
# b=3/4 and avgdl = T/N multiplied through so every quantity is an exact
# integer (see docstring); HUGEINT guards the numerator product.
_BM25_SQL = f"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tk
             FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_all FROM dl),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       WHERE tk IN {BM25_TERMS!r} GROUP BY 1, 2),
df AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id,
              CAST(((CAST(nn.n_docs AS HUGEINT) * 1000000 // df.df)
                    * (44 * tf.tf * tot.t_all))
                   // (20 * tf.tf * tot.t_all + 6 * tot.t_all
                       + 18 * dl.dl * nn.n_docs) AS BIGINT) AS c
       FROM tf
       JOIN df USING (tk)
       JOIN dl USING (doc_id)
       CROSS JOIN tot CROSS JOIN nn)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_c
FROM sc GROUP BY 1
ORDER BY score_c DESC, doc_id
LIMIT {BM25_TOPK}
"""


@query("q210_bm25", sql=_BM25_SQL)
def q210_bm25(sf_dir: str):
    """BM25 top-k retrieval, integer-exact: with k1 = 6/5, b = 3/4 and
    avgdl = T/N the saturation term tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    is the exact rational 44*tf*T / (20*tf*T + 6*T + 18*dl*N); paired
    with the integer idf surrogate N*PPM//df, every doc score is a sum
    of floor divisions — bit-identical on both engines where float BM25
    depends on libm and summation order.  Scale shape: ONE corpus pass
    emits per-doc (dl, tf_t) partials; N, T, df fold via Dataset
    aggregates; only MATCHING docs (tf > 0 on some term) reach the
    Python-int scorer; top-k finishes on a match-set-sized frame.
    Numerators exceed int64 (idf ~N*PPM times 44*tf*T), so the scorer
    uses Python ints — the q94 overflow discipline."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    terms = list(BM25_TERMS)

    def partial(t: pa.Table) -> pa.Table:
        txts = t["text"].to_pylist()
        toks = [_TOKEN_RE.findall((s or "").lower()) for s in txts]
        cols = {
            "doc_id": t["doc_id"],
            "dl": pa.array([len(x) for x in toks], pa.int64()),
        }
        for q in terms:
            cols[f"tf_{q}"] = pa.array(
                [sum(1 for w in x if w == q) for x in toks], pa.int64()
            )
        return pa.table(cols)

    per_doc = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("dl", alias_name="t_all"), Count(alias_name="n_docs")]
    stats = per_doc.aggregate(*aggs)
    t_all, n_docs = int(stats["t_all"]), int(stats["n_docs"])

    def matched(t: pa.Table) -> pa.Table:
        m = np.zeros(len(t), dtype=bool)
        for q in terms:
            m |= t[f"tf_{q}"].to_numpy(zero_copy_only=False) > 0
        return t.filter(pa.array(m))

    hits = per_doc.map_batches(matched, batch_format="pyarrow").to_pandas()
    df_t = {
        q: int((hits[f"tf_{q}"] > 0).sum()) for q in terms
    }
    scores = []
    for _, r in hits.iterrows():
        s = 0
        dl = int(r["dl"])
        for q in terms:
            tf = int(r[f"tf_{q}"])
            if tf == 0 or df_t[q] == 0:
                continue
            idf = n_docs * PPM // df_t[q]
            s += (idf * (44 * tf * t_all)) // (
                20 * tf * t_all + 6 * t_all + 18 * dl * n_docs
            )
        scores.append(s)
    hits = hits.assign(score_c=scores)
    out = (
        hits.sort_values(["score_c", "doc_id"], ascending=[False, True])
        .head(BM25_TOPK)[["doc_id", "score_c"]]
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score_c"] = out["score_c"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Image patchify (ViT-style tile statistics over the payload table)
# --------------------------------------------------------------------------

@query(
    "q211_image_patches",
    sql="SELECT image_id, tile_row, tile_col, tile_h, tile_w, sum_r, sum_g,"
    " sum_b, n_px FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/image_patches_n300_s42.parquet') "
    "ORDER BY image_id, tile_row, tile_col",
)
def q211_image_patches(sf_dir: str):
    """Patchify the image+caption payload table: each image flat-maps
    into a 4x4 grid of tiles with exact integer channel sums — the
    vision-training prep stage (ViT patches / tile statistics) done as
    an actor-pool map_batches where DECODE NEVER LEAVES THE TASK
    (binary in, 9 int64 columns out; the corpus's pixels are never
    shuffled).  Floor boundaries i*dim//4 make ragged sizes split
    deterministically.  Fixture twin: per-pixel Python-int
    accumulation, an independent summation path
    (tools/gen_oracle_fixtures.py::gen_image_patches)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import ImagePatcher

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes"])
    out = (
        ds.map_batches(
            # pool sized below the session's CPU count so the upstream
            # read tasks are never starved (4-CPU test sessions included)
            ImagePatcher, concurrency=2, batch_size=32,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["image_id", "tile_row", "tile_col"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        if c != "image_id":
            out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Jain fairness index of per-user load (scheduler fairness audit)
# --------------------------------------------------------------------------

_JAIN_SQL = """
WITH load AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) * SUM(x) * 1000000 // (COUNT(*) * SUM(x * x)) AS BIGINT)
           AS jain_ppm,
       CAST(MIN(x) AS BIGINT) AS min_load, CAST(MAX(x) AS BIGINT) AS max_load
FROM load GROUP BY 1 ORDER BY 1
"""


@query("q212_jain_fairness", sql=_JAIN_SQL)
def q212_jain_fairness(sf_dir: str):
    """Jain fairness index (sum x)^2 / (n * sum x^2) of per-user load
    within each event type, PPM-scaled integer — the standard scheduler
    fairness audit (1.0 = perfectly even, 1/n = one user hogs all),
    companion to q174's token-bucket and q84's partition-skew audits.
    Scale: per-(type,user) counts fold combiner-style in map_batches
    partials; the moment reduction (n, sum, sum of squares) is
    domain-sized; nothing row-scale leaves the first exchange."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "x": g["count_all"].cast(pa.int64()),
            }
        )

    loads = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .sum("x")
    )

    def moments(t: pa.Table) -> pa.Table:
        col = "sum(x)" if "sum(x)" in t.column_names else "x"
        x = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "x": x})
        g = df.groupby("event_type").agg(
            n=("x", "size"), s1=("x", "sum"), s2=("x", lambda v: int((v**2).sum())),
            mn=("x", "min"), mx=("x", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        loads.map_batches(moments, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")
        .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
             mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
    )
    m["jain_ppm"] = [
        int(a) * int(a) * PPM // (int(n) * int(b))
        for a, n, b in zip(m["s1"], m["n"], m["s2"])
    ]
    out = m.rename(
        columns={"n": "n_users", "mn": "min_load", "mx": "max_load"}
    )[["event_type", "n_users", "jain_ppm", "min_load", "max_load"]]
    out = out.sort_values("event_type").reset_index(drop=True)
    for c in ("n_users", "jain_ppm", "min_load", "max_load"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Decision stump: optimal misclassification split (q213)
# --------------------------------------------------------------------------

STUMP_LANG = "en"

_STUMP_SQL = f"""
WITH h AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN lang = '{STUMP_LANG}' THEN 1 ELSE 0 END)
                       AS BIGINT) AS pos
           FROM documents GROUP BY 1),
tot AS (SELECT SUM(n) AS nt, SUM(pos) AS pt FROM h),
c AS (SELECT v,
             SUM(n)  OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
             SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS pl
      FROM h),
cost AS (SELECT v, nl, nt - nl AS nr,
                (nl - GREATEST(pl, nl - pl))
              + ((nt - nl) - GREATEST(pt - pl, (nt - nl) - (pt - pl)))
                    AS miscls
         FROM c, tot)
SELECT CAST(v AS BIGINT) AS threshold, CAST(miscls AS BIGINT) AS miscls,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right
FROM cost ORDER BY miscls, threshold LIMIT 1
"""


@query("q213_decision_stump", sql=_STUMP_SQL)
def q213_decision_stump(sf_dir: str):
    """Optimal decision stump on n_chars predicting lang == 'en' by
    MISCLASSIFICATION count (the integer-exact split criterion; Gini /
    entropy have threshold-varying rational denominators that cannot be
    argmin'd without pairwise cross-multiplication) — the first split
    every tree/GBM feature-prep pipeline evaluates, and a feature-
    usefulness audit on its own.  Scale shape: the corpus folds to a
    (value, n, pos) counting histogram (combiner partials, q46's
    shape); the cumulative scan + argmin runs on the histogram —
    distinct-value-sized, never row-sized.  Tie-break: smallest
    threshold."""
    ds = _read(sf_dir, "documents", ["n_chars", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "v": t["n_chars"].to_numpy(),
                "pos": (
                    np.asarray(t["lang"].to_pylist()) == STUMP_LANG
                ).astype(np.int64),
            }
        )
        g = df.groupby("v").agg(n=("pos", "size"), pos=("pos", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"))
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    n = h["n"].to_numpy(dtype=np.int64)
    pos = h["pos"].to_numpy(dtype=np.int64)
    nt, pt = int(n.sum()), int(pos.sum())
    nl = np.cumsum(n)
    pl = np.cumsum(pos)
    nr = nt - nl
    pr = pt - pl
    mis = (nl - np.maximum(pl, nl - pl)) + (nr - np.maximum(pr, nr - pr))
    i = int(np.lexsort((h["v"].to_numpy(), mis))[0])
    return pd.DataFrame(
        {
            "threshold": [int(h["v"].iloc[i])],
            "miscls": [int(mis[i])],
            "n_left": [int(nl[i])],
            "n_right": [int(nr[i])],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Wilson lower-bound ranking (q214)
# --------------------------------------------------------------------------

WILSON_MIN_CHARS = 600

# z = 2 (95.45%): LB = ((k+2)n - 2*isqrt((k(n-k)+n)*n)) / (n(n+4)),
# with isqrt = exact integer floor sqrt on BOTH engines (the SQL side
# Newton-corrects CAST(floor(sqrt(x))) which alone mis-rounds near
# perfect squares).
_WILSON_SQL = f"""
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN n_chars >= {WILSON_MIN_CHARS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS k
           FROM documents GROUP BY 1),
r AS (SELECT source, n, k, (k * (n - k) + n) * n AS x,
             CAST(floor(sqrt(CAST((k * (n - k) + n) * n AS DOUBLE)))
                  AS BIGINT) AS s0
      FROM s),
i AS (SELECT source, n, k,
             CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                  WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS isq
      FROM r)
SELECT source, n, k,
       CAST(k * 1000000 // n AS BIGINT) AS rate_ppm,
       CAST(((k + 2) * n - 2 * isq) * 1000000 // (n * (n + 4)) AS BIGINT)
           AS wilson_ppm
FROM i ORDER BY wilson_ppm DESC, source
"""


@query("q214_wilson_rank", sql=_WILSON_SQL)
def q214_wilson_rank(sf_dir: str):
    """Rank sources by the Wilson LOWER confidence bound (z = 2) of
    their long-document rate — the small-sample-honest ranking (a 2/2
    source never outranks a 900/1000 source the way the naive rate
    does).  Everything integer: with z = 2 the bound reduces to
    ((k+2)n − 2·sqrt((k(n−k)+n)·n)) / (n(n+4)) and the sqrt is exact
    math.isqrt, mirrored in SQL by a Newton-corrected floor(sqrt) —
    bit-identical ranks, no libm.  Scale: per-source (n, k) partials
    fold combiner-style; the bound is computed on the domain-sized
    table."""
    import math

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "k": (
                    t["n_chars"].to_numpy(zero_copy_only=False)
                    >= WILSON_MIN_CHARS
                ).astype(np.int64),
            }
        )
        g = df.groupby("source").agg(n=("k", "size"), k=("k", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    s = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
    )
    rows = []
    for _, r in s.iterrows():
        n, k = int(r["n"]), int(r["k"])
        isq = math.isqrt((k * (n - k) + n) * n)
        rows.append(
            (
                r["source"],
                n,
                k,
                k * PPM // n,
                ((k + 2) * n - 2 * isq) * PPM // (n * (n + 4)),
            )
        )
    out = pd.DataFrame(
        rows, columns=["source", "n", "k", "rate_ppm", "wilson_ppm"]
    ).sort_values(["wilson_ppm", "source"], ascending=[False, True]).reset_index(
        drop=True
    )
    for c in ("n", "k", "rate_ppm", "wilson_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Graph eccentricity / diameter diagnostics (q215)
# --------------------------------------------------------------------------

@query(
    "q215_eccentricity",
    sql="SELECT node, ecc, n_reached FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/eccentricity_sf0.01.parquet') "
    "ORDER BY node",
)
def q215_eccentricity(sf_dir: str):
    """Out-eccentricity per node (max BFS distance over reached pages;
    graph diameter = max over nodes) — the frontier-depth bound a crawl
    scheduler reads before setting max-hops budgets (q115's depth
    histogram tells where the mass is, eccentricity tells how deep the
    tail goes).  Same broadcast-CSR BFS fan-out as q208; fixture twin
    is the deque BFS (tools/gen_oracle_fixtures.py::gen_eccentricity)."""
    from texrex_ray.ops.centrality import eccentricity

    edges = ray.data.read_parquet(
        f"{_GRAPH_FIXDIR}/oracle/pagerank_edges.parquet"
    ).to_pandas()
    out = eccentricity(edges).sort_values("node").reset_index(drop=True)
    for c in ("ecc", "n_reached"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Embedding-space label consistency: LOO 1-NN accuracy (q216)
# --------------------------------------------------------------------------

EMB_QUANT = 1000  # fixed-point scale: round(x * 1000) -> int64

_LOO_SQL = f"""
WITH q AS (SELECT vec_id, label,
                  list_transform(embedding,
                                 x -> CAST(ROUND(x * {EMB_QUANT}) AS BIGINT))
                      AS qe
           FROM embeddings),
d AS (SELECT a.vec_id AS i, a.label AS la, b.vec_id AS j, b.label AS lb,
             list_sum(list_transform(list_zip(a.qe, b.qe),
                      s -> (s[1] - s[2]) * (s[1] - s[2]))) AS d2
      FROM q a JOIN q b ON a.vec_id <> b.vec_id),
nn AS (SELECT i, la, lb,
              row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rn
       FROM d)
SELECT CAST(la AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM nn WHERE rn = 1 GROUP BY 1 ORDER BY 1
"""


@query("q216_loo_knn_accuracy", sql=_LOO_SQL)
def q216_loo_knn_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label consistency per class — the standard
    embedding-quality eval (does the embedding space cluster by
    label?) run before trusting q106/q147-style semantic ops.
    Distances are SQUARED EUCLIDEAN over fixed-point int64 vectors
    (round(x*1000)): exact integer argmin with (distance, vec_id)
    tie-break, immune to the float summation-order trap that makes
    cosine argmins engine-dependent.  Scale shape: the quantized
    matrix broadcasts once (it is the SMALL side by construction —
    at 10^9 vectors this becomes the q16 block-streamed form); query
    rows stream through map_batches computing block x corpus
    distances via int64 matmul; per-label count partials fold in a
    label-keyed groupby."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy(dtype=np.int64)
    labels = full["label"].to_numpy(dtype=np.int64)
    Q = np.round(
        np.stack(full["embedding"].to_numpy()) * EMB_QUANT
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, labels, Q = ids[order], labels[order], Q[order]
    ref = ray.put((ids, labels, Q))

    def block(t: pa.Table) -> pa.Table:
        cids, clabels, cq = ray.get(ref)
        bi = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        bq = np.round(
            np.stack(t["embedding"].to_pandas().to_numpy()) * EMB_QUANT
        ).astype(np.int64)
        # d2 = |a|^2 + |b|^2 - 2ab, exact in int64 at this scale
        d2 = (
            (bq * bq).sum(axis=1)[:, None]
            + (cq * cq).sum(axis=1)[None, :]
            - 2 * bq @ cq.T
        )
        self_mask = bi[:, None] == cids[None, :]
        d2[self_mask] = np.iinfo(np.int64).max
        # argmin by (d2, vec_id): cids ascending, so the first minimum
        # along axis 1 is the smallest-id tie
        nn = d2.argmin(axis=1)
        correct = (clabels[nn] == bl).astype(np.int64)
        df = pd.DataFrame({"label": bl, "correct": correct})
        g = df.groupby("label").agg(
            n=("correct", "size"), n_correct=("correct", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(block, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("n_correct", alias_name="n_correct"))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Crawl URL/host discovery-rate curve (q217)
# --------------------------------------------------------------------------

DISC_WINDOW = 25

_DISC_SQL = f"""
WITH v AS (SELECT seq, url, host, seq // {DISC_WINDOW} AS w
           FROM read_parquet(
               '{_GRAPH_FIXDIR}/oracle/crawl_visits_sf0.01.parquet')),
fu AS (SELECT seq // {DISC_WINDOW} AS w, CAST(COUNT(*) AS BIGINT) AS c
       FROM (SELECT url, MIN(seq) AS seq FROM v GROUP BY 1) GROUP BY 1),
fh AS (SELECT seq // {DISC_WINDOW} AS w, CAST(COUNT(*) AS BIGINT) AS c
       FROM (SELECT host, MIN(seq) AS seq FROM v GROUP BY 1) GROUP BY 1),
nv AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_visits FROM v GROUP BY 1)
SELECT nv.w AS window_idx, nv.n_visits,
       COALESCE(fu.c, 0) AS n_new_urls,
       CAST(SUM(COALESCE(fu.c, 0)) OVER (ORDER BY nv.w
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_urls,
       COALESCE(fh.c, 0) AS n_new_hosts,
       CAST(SUM(COALESCE(fh.c, 0)) OVER (ORDER BY nv.w
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hosts
FROM nv LEFT JOIN fu ON fu.w = nv.w LEFT JOIN fh ON fh.w = nv.w
ORDER BY 1
"""


@query("q217_discovery_curve", sql=_DISC_SQL)
def q217_discovery_curve(sf_dir: str):
    """URL/host discovery-rate curve of the crawl: per window of
    {DISC_WINDOW} steps, visits, first-seen URLs/hosts and their
    cumulative counts — the frontier-saturation diagnostic (when
    new-host discovery flatlines, the walk is recirculating and the
    seed list or jump rate needs attention; ClaraX's random-jump knob
    exists exactly for this).  Ray side re-runs the q21 engine (its
    visit order is fixture-faithful by the q21 gate) and derives the
    curve with vectorized first-occurrence marks; the SQL derives the
    same curve INDEPENDENTLY from the committed visits fixture."""
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.sources.webgraph import make_webgraph

    steps = {0.001: 60, 0.01: 150, 0.1: 400}.get(_sf_of(sf_dir), 150)
    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    eng = CrawlEngine(g, n_walkers=1, n_partitions=4, seed=42, config=CrawlConfig())
    eng.run(max_steps=steps)
    rows = eng.visit_order()
    eng.shutdown()
    v = pd.DataFrame(rows, columns=["seq", "url", "host", "action"])
    v["w"] = v["seq"] // DISC_WINDOW
    new_url = ~v["url"].duplicated()
    new_host = ~v["host"].duplicated()
    out = (
        v.assign(nu=new_url.astype(np.int64), nh=new_host.astype(np.int64))
        .groupby("w")
        .agg(n_visits=("seq", "size"), n_new_urls=("nu", "sum"),
             n_new_hosts=("nh", "sum"))
        .reset_index()
        .rename(columns={"w": "window_idx"})
        .sort_values("window_idx")
        .reset_index(drop=True)
    )
    out["cum_urls"] = out["n_new_urls"].cumsum()
    out["cum_hosts"] = out["n_new_hosts"].cumsum()
    out = out[
        ["window_idx", "n_visits", "n_new_urls", "cum_urls",
         "n_new_hosts", "cum_hosts"]
    ]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution (q218)
# --------------------------------------------------------------------------

_UATTR_SQL = """
WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
asg AS (SELECT c.click_id, c.ts,
               (SELECT p.purchase_id FROM p
                WHERE p.user_id = c.user_id AND p.ts >= c.ts
                ORDER BY p.ts, p.purchase_id LIMIT 1) AS purchase_id
        FROM c),
pos AS (SELECT purchase_id, click_id,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY ts, click_id) AS rn,
               COUNT(*) OVER (PARTITION BY purchase_id) AS m
        FROM asg WHERE purchase_id IS NOT NULL)
SELECT purchase_id, click_id,
       CAST(CASE WHEN m = 1 THEN 1000000
                 WHEN m = 2 THEN 500000
                 WHEN rn = 1 OR rn = m THEN 400000
                 WHEN rn = 2 THEN 200000 // (m - 2) + 200000 % (m - 2)
                 ELSE 200000 // (m - 2) END AS BIGINT) AS credit_ppm
FROM pos ORDER BY purchase_id, click_id
"""


@query("q218_position_attribution", sql=_UATTR_SQL)
def q218_position_attribution(sf_dir: str):
    """Position-based (U-shaped) multi-touch attribution: each click
    joins the SAME user's next purchase at-or-after it (the forward
    as-of — q96's last-touch is the backward one); within a purchase's
    click set, first and last touch get 40% each and the middles split
    the remaining 20% by floor division, remainder to the earliest
    middle, so credits sum to exactly PPM per purchase.  ONE user-keyed
    exchange co-locates both event streams; the forward as-of is a
    vectorized searchsorted per bucket; credit assignment is a window
    computation inside the purchase group."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    def keep_cp(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        return t.filter(
            pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        )

    tagged = ev.map_batches(keep_cp, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(us=us)
        for _, sub in df.groupby("user_id", sort=False):
            cl = sub[sub["event_type"] == "click"].sort_values(
                ["us", "event_id"], kind="mergesort"
            )
            pu = sub[sub["event_type"] == "purchase"].sort_values(
                ["us", "event_id"], kind="mergesort"
            )
            if len(cl) == 0 or len(pu) == 0:
                continue
            # forward as-of: first purchase with ts >= click ts; the
            # (ts, id) sort makes the equal-ts run lead with min id
            j = np.searchsorted(pu["us"].to_numpy(), cl["us"].to_numpy(),
                                side="left")
            ok = j < len(pu)
            if not ok.any():
                continue
            a = pd.DataFrame(
                {
                    "purchase_id": pu["event_id"].to_numpy()[j[ok]],
                    "click_id": cl["event_id"].to_numpy()[ok],
                    "us": cl["us"].to_numpy()[ok],
                }
            )
            outs.append(a)
        if not outs:
            return pd.DataFrame(
                columns=["purchase_id", "click_id", "credit_ppm"]
            )
        asg = pd.concat(outs, ignore_index=True).sort_values(
            ["purchase_id", "us", "click_id"], kind="mergesort"
        )
        m = asg.groupby("purchase_id")["click_id"].transform("size").to_numpy()
        rn = asg.groupby("purchase_id").cumcount().to_numpy() + 1
        credit = np.where(
            m == 1,
            PPM,
            np.where(
                m == 2,
                500_000,
                np.where(
                    (rn == 1) | (rn == m),
                    400_000,
                    np.where(
                        rn == 2,
                        200_000 // np.maximum(m - 2, 1)
                        + 200_000 % np.maximum(m - 2, 1),
                        200_000 // np.maximum(m - 2, 1),
                    ),
                ),
            ),
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "purchase_id": asg["purchase_id"].to_numpy(),
                "click_id": asg["click_id"].to_numpy(),
                "credit_ppm": credit,
            }
        )

    out = (
        bucketed_groupby(tagged, "user_id", combine,
                         expected_rows=ev.count())
        .to_pandas()
        .sort_values(["purchase_id", "click_id"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Sort-layout pruning ROI (q219)
# --------------------------------------------------------------------------

LAYOUT_FRAG = 64
LAYOUT_PROBES = (64, 128, 256, 384, 512, 640, 768, 896, 1024, 1280, 1536)

_LAYOUT_SQL = f"""
WITH nat AS (SELECT doc_id // {LAYOUT_FRAG} AS f, MIN(n_chars) AS mn,
                    MAX(n_chars) AS mx
             FROM documents GROUP BY 1),
srt AS (SELECT f, MIN(n_chars) AS mn, MAX(n_chars) AS mx
        FROM (SELECT (row_number() OVER (ORDER BY n_chars, doc_id) - 1)
                  // {LAYOUT_FRAG} AS f, n_chars
              FROM documents) GROUP BY 1),
probes AS (SELECT unnest({list(LAYOUT_PROBES)}) AS probe)
SELECT CAST(probe AS BIGINT) AS probe,
       CAST((SELECT COUNT(*) FROM nat
             WHERE nat.mn <= probe AND probe <= nat.mx) AS BIGINT)
           AS frags_natural,
       CAST((SELECT COUNT(*) FROM srt
             WHERE srt.mn <= probe AND probe <= srt.mx) AS BIGINT)
           AS frags_sorted
FROM probes ORDER BY probe
"""


@query("q219_layout_roi", sql=_LAYOUT_SQL)
def q219_layout_roi(sf_dir: str):
    """Zone-map pruning ROI of re-sorting the corpus by n_chars: for a
    fixed probe set, fragments a point lookup must scan under the
    NATURAL (doc_id) layout vs the SORTED layout — the number that
    justifies (or kills) a q78/q146-style rewrite before paying its
    write amplification.  Scale insight the implementation exploits:
    the sorted layout's zone maps are a PURE FUNCTION of the value
    histogram (fragment f spans the values at global ranks
    [f*K, f*K+K-1], read off cumulative counts) — so the sorted-side
    audit needs only the q46-shape histogram exchange, never a global
    sort.  The natural side is one fragment-keyed min/max groupby.
    doc_id density (0..N-1) is asserted, making doc_id//K the exact
    natural-layout fragment id."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    n_docs = ds.count()

    def nat_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "f": pc.divide(t["doc_id"], pa.scalar(LAYOUT_FRAG, pa.int64())),
                "n_chars": t["n_chars"],
            }
        )

    nat = (
        ds.map_batches(nat_partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Min("n_chars", alias_name="mn"),
                   Max("n_chars", alias_name="mx"))
        .to_pandas()
    )
    assert int(nat["f"].max()) == (n_docs - 1) // LAYOUT_FRAG, (
        "doc_id not dense; natural fragment ids need a rank pass"
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("n_chars").aggregate([([], "count_all")])
        return pa.table(
            {"v": g["n_chars"], "c": g["count_all"].cast(pa.int64())}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .sum("c")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    ccol = "sum(c)" if "sum(c)" in hist.columns else "c"
    vals = hist["v"].to_numpy(dtype=np.int64)
    cum = hist[ccol].to_numpy(dtype=np.int64).cumsum()
    n_frag = (n_docs + LAYOUT_FRAG - 1) // LAYOUT_FRAG
    lo_rank = np.arange(n_frag, dtype=np.int64) * LAYOUT_FRAG
    hi_rank = np.minimum(lo_rank + LAYOUT_FRAG - 1, n_docs - 1)
    srt_mn = vals[np.searchsorted(cum, lo_rank, side="right")]
    srt_mx = vals[np.searchsorted(cum, hi_rank, side="right")]

    rows = []
    for p in LAYOUT_PROBES:
        fn = int(((nat["mn"] <= p) & (p <= nat["mx"])).sum())
        fs = int(((srt_mn <= p) & (p <= srt_mx)).sum())
        rows.append((p, fn, fs))
    return pd.DataFrame(
        rows, columns=["probe", "frags_natural", "frags_sorted"]
    ).astype("int64")


# --------------------------------------------------------------------------
# Image exposure audit (q220)
# --------------------------------------------------------------------------

@query(
    "q220_exposure_audit",
    sql="SELECT image_id, p05, p50, p95, n_dark, n_bright FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/exposure_audit_n300_s42.parquet') "
    "ORDER BY image_id",
)
def q220_exposure_audit(sf_dir: str):
    """Exposure QC over the image payload table: per-image integer luma
    quantiles (p05/p50/p95) + clipped-pixel counts — the black-frame /
    blown-highlight reject gate a vision-training pipeline runs before
    spending decode+embed compute downstream.  Actor-pool stage
    (stages/images.py::ExposureAudit): decode in the task, one
    vectorized bincount per image, 6 int64 columns out — pixels never
    shuffle.  Fixture twin: pure-Python per-pixel counting loop
    (tools/gen_oracle_fixtures.py::gen_exposure_audit)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import ExposureAudit

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes"])
    out = (
        ds.map_batches(
            ExposureAudit, concurrency=2, batch_size=32,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        if c != "image_id":
            out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Grouped Pearson correlation, integer-exact (q221)
# --------------------------------------------------------------------------

# r_ppm = sign(cov) * isqrt(r2_ppm * PPM) with
# r2_ppm = cov^2 * PPM // (varx * vary); cov = n*Sxy - Sx*Sy etc.
# Double-floor convention shared by both engines; HUGEINT covers the
# cov^2*PPM product through sf0.1 (the Ray side uses unbounded ints).
_PEARSON_SQL = """
WITH m AS (SELECT lang,
                  CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(n_chars) AS HUGEINT) AS sx,
                  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+')))
                       AS HUGEINT) AS sy,
                  CAST(SUM(n_chars * n_chars) AS HUGEINT) AS sxx,
                  CAST(SUM(CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                       AS BIGINT) * len(regexp_extract_all(lower(text),
                       '[a-z]+'))) AS HUGEINT) AS syy,
                  CAST(SUM(n_chars * len(regexp_extract_all(lower(text),
                       '[a-z]+'))) AS HUGEINT) AS sxy
           FROM documents GROUP BY 1),
c AS (SELECT lang, n, n * sxy - sx * sy AS cov,
             n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary
      FROM m),
r AS (SELECT lang, n, cov,
             cov * cov * 1000000 // (varx * vary) AS r2_ppm
      FROM c),
q AS (SELECT lang, n, cov, r2_ppm, r2_ppm * 1000000 AS x,
             CAST(floor(sqrt(CAST(r2_ppm * 1000000 AS DOUBLE))) AS HUGEINT)
                 AS s0
      FROM r)
SELECT lang, CAST(n AS BIGINT) AS n,
       CAST((CASE WHEN cov < 0 THEN -1 ELSE 1 END)
            * (CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                    WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END) AS BIGINT)
           AS pearson_ppm
FROM q ORDER BY lang
"""


@query("q221_grouped_pearson", sql=_PEARSON_SQL)
def q221_grouped_pearson(sf_dir: str):
    """Pearson correlation of (n_chars, token count) per language as an
    exact integer: r_ppm = sign(cov) * isqrt(cov^2*PPM//(varx*vary)*PPM)
    over the five integer moment sums — the correlation audit every
    feature pipeline wants, computed without libm so both engines agree
    to the last ppm (float corr differs in the last ulps across
    summation orders).  Scale: the corpus folds to per-(batch, lang)
    moment partials (q49's shape), the finish is domain-sized; Python
    ints carry the cov^2 product unbounded (SQL mirrors in HUGEINT,
    verified through sf0.1 magnitudes)."""
    import math

    ds = _read(sf_dir, "documents", ["lang", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.array(
            [len(_TOKEN_RE.findall((s or "").lower()))
             for s in t["text"].to_pylist()],
            dtype=np.int64,
        )
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    rows = []
    for _, r in m.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        r2_ppm = cov * cov * PPM // (varx * vary)
        val = math.isqrt(r2_ppm * PPM)
        rows.append((r["lang"], n, -val if cov < 0 else val))
    out = pd.DataFrame(rows, columns=["lang", "n", "pearson_ppm"])
    out["n"] = out["n"].astype("int64")
    out["pearson_ppm"] = out["pearson_ppm"].astype("int64")
    return out


# --------------------------------------------------------------------------
# CDC upsert/delete apply (warehouse MERGE semantics) (q222)
# --------------------------------------------------------------------------

_UPSERT_SQL = """
WITH log AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
                        AS op,
                    CAST(ROUND(value * 100) AS BIGINT) AS vc
             FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY us DESC, event_id DESC) AS rn
      FROM log),
n AS (SELECT user_id,
             CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_upserts
      FROM log GROUP BY 1)
SELECT r.user_id, r.vc AS value_c, n.n_upserts, r.us AS last_us
FROM r JOIN n USING (user_id)
WHERE r.rn = 1 AND r.op = 'U'
ORDER BY r.user_id
"""


@query("q222_upsert_apply", sql=_UPSERT_SQL)
def q222_upsert_apply(sf_dir: str):
    """Change-data-capture MERGE apply: a keyed upsert/delete log
    (op = D for 'error' events, else U; version = (ts, event_id))
    collapses to final table state — last writer wins, a trailing
    delete removes the key entirely (the Delta/Iceberg MERGE
    semantics every warehouse sync job runs; the texrex twin is
    recrawl overwriting a page's stored record).  ONE user-keyed
    exchange; inside the bucket the winner is a vectorized
    idxmax-by-version, no sort of the full log."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def apply_log(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(
            us=us,
            vc=np.round(df["value"].to_numpy() * 100).astype(np.int64),
            is_del=(df["event_type"] == "error").to_numpy(),
        )
        df = df.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        last = df.groupby("user_id", sort=False).tail(1)
        ups = (
            df[~df["is_del"]]
            .groupby("user_id", sort=False)
            .size()
            .rename("n_upserts")
        )
        keep = last[~last["is_del"]]
        out = keep.merge(ups, left_on="user_id", right_index=True)
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "value_c": out["vc"].to_numpy(),
                "n_upserts": out["n_upserts"].to_numpy(),
                "last_us": out["us"].to_numpy(),
            }
        )

    out = (
        bucketed_groupby(ds, "user_id", apply_log, expected_rows=ds.count())
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Edge stress: bridge-edge ranking (q223)
# --------------------------------------------------------------------------

@query(
    "q223_edge_stress",
    sql="SELECT src, dst, stress FROM read_parquet("
    f"'{_GRAPH_FIXDIR}/oracle/edge_stress_sf0.01.parquet') "
    "ORDER BY src, dst",
)
def q223_edge_stress(sf_dir: str):
    """Edge stress — shortest-path traffic PER LINK (the bridge-edge /
    cut-candidate ranking that complements q207's node stress: a high-
    stress edge between low-stress endpoints is a structural bottleneck
    the crawl scheduler should not starve).  Each source adds
    sigma_su * (1 + g(w)) to DAG edge (u, w) during the same reverse
    level sweep as node stress; contributions accumulate per CSR
    position and fold in ONE position-keyed groupby.  Fixture twin:
    classic predecessor-list Brandes (independent implementation
    path)."""
    from texrex_ray.ops.centrality import edge_stress

    edges = ray.data.read_parquet(
        f"{_GRAPH_FIXDIR}/oracle/pagerank_edges.parquet"
    ).to_pandas()
    out = edge_stress(edges)
    out = out[out["stress"] > 0].reset_index(drop=True)
    out["stress"] = out["stress"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Delta-encoding bit-width audit (q224)
# --------------------------------------------------------------------------

_DELTA_SQL = f"""
WITH f AS (SELECT event_id // {ENC_FRAG} AS frag_id, epoch_us(ts) AS us,
                  event_id
           FROM events),
d AS (SELECT frag_id,
             us - lag(us) OVER (PARTITION BY frag_id
                                ORDER BY us, event_id) AS delta
      FROM f),
b AS (SELECT frag_id,
             CASE WHEN delta = 0 THEN 0
                  ELSE length(printf('%b', delta)) END AS bits
      FROM d WHERE delta IS NOT NULL)
SELECT frag_id, CAST(COUNT(*) AS BIGINT) AS n_deltas,
       CAST(SUM(bits) AS BIGINT) AS sum_bits,
       CAST(MAX(bits) AS BIGINT) AS max_bits,
       CAST((SUM(bits) + 7) // 8 AS BIGINT) AS packed_bytes
FROM b GROUP BY 1 ORDER BY 1
"""


@query("q224_delta_bits", sql=_DELTA_SQL)
def q224_delta_bits(sf_dir: str):
    """Delta-encoding bit-width audit of the timestamp column: per
    fragment (q206's row ranges), the bit widths of successive-ts
    deltas under the fragment's (ts, event_id) sort — sum/max bits and
    the tight-packed byte size, i.e. what delta encoding would pay vs
    8 bytes/raw value.  The companion to q206's RLE audit for the
    NUMERIC columns; together they price a layout rewrite.  One
    fragment-keyed exchange; widths via vectorized log2-free
    bit_length (int64 deltas are exact, printf('%b') on the SQL
    side)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def add_frag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "frag_id",
            pc.divide(t["event_id"], pa.scalar(ENC_FRAG, pa.int64())),
        )

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(us=us).sort_values(
            ["frag_id", "us", "event_id"], kind="mergesort"
        )
        outs = []
        for fid, sub in df.groupby("frag_id", sort=False):
            u = sub["us"].to_numpy()
            if len(u) < 2:
                continue
            delta = np.diff(u)
            # bit_length: 0 for zero deltas, else floor(log2)+1 — exact
            # via the binary string length of Python ints (no float log)
            bits = np.array(
                [0 if d == 0 else int(d).bit_length() for d in delta],
                dtype=np.int64,
            )
            outs.append(
                (
                    int(fid),
                    len(bits),
                    int(bits.sum()),
                    int(bits.max()),
                    (int(bits.sum()) + 7) // 8,
                )
            )
        return pd.DataFrame(
            outs,
            columns=["frag_id", "n_deltas", "sum_bits", "max_bits",
                     "packed_bytes"],
        )

    out = (
        bucketed_groupby(
            ds.map_batches(add_frag, batch_format="pyarrow"),
            "frag_id",
            stats,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values("frag_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Heaps-law vocabulary growth per source (q225)
# --------------------------------------------------------------------------

VOCAB_WINDOW = 20  # docs per growth window

_HEAPS_SQL = f"""
WITH d AS (SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                      AS r
           FROM documents),
tok AS (SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tk
        FROM documents),
ft AS (SELECT source, tk, MIN(doc_id) AS fdoc FROM tok GROUP BY 1, 2),
fw AS (SELECT ft.source, d.r // {VOCAB_WINDOW} AS w,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM ft JOIN d ON d.doc_id = ft.fdoc AND d.source = ft.source
       GROUP BY 1, 2),
nd AS (SELECT source, r // {VOCAB_WINDOW} AS w,
              CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM d GROUP BY 1, 2)
SELECT nd.source, CAST(nd.w AS BIGINT) AS window_idx, nd.n_docs,
       COALESCE(fw.c, 0) AS n_new_types,
       CAST(SUM(COALESCE(fw.c, 0)) OVER (PARTITION BY nd.source ORDER BY nd.w
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
FROM nd LEFT JOIN fw ON fw.source = nd.source AND fw.w = nd.w
ORDER BY 1, 2
"""


@query("q225_vocab_growth", sql=_HEAPS_SQL)
def q225_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth per source: new word types per
    window of {VOCAB_WINDOW} docs (doc_id order) and the cumulative
    vocabulary — the saturation curve that separates generative
    sources from template mills (a flat curve on a high-volume source
    is a duplication alarm, the corpus-level cousin of q122's per-doc
    novelty).  Plan: per-doc DISTINCT (source, token, doc_id) partials
    → ONE (source, token)-keyed exchange takes min doc_id → the finish
    joins first-occurrence counts to windows on a DOCS-SIZED frame
    (ranks from a source-keyed exchange; at 10^9 docs that join rides
    the q138 co-partitioned layout instead of the driver)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        srcs, docs, toks = [], [], []
        for did, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(),
            t["text"].to_pylist(),
        ):
            for tk in set(_TOKEN_RE.findall((txt or "").lower())):
                srcs.append(src)
                docs.append(did)
                toks.append(tk)
        return pa.table(
            {
                "source": pa.array(srcs),
                "tk": pa.array(toks),
                "doc_id": pa.array(docs, pa.int64()),
            }
        )

    def first_occ(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["source", "tk"], sort=False)["doc_id"]
            .min()
            .reset_index(name="fdoc")
        )
        return g.groupby(["source", "fdoc"], sort=False).size().reset_index(
            name="c"
        )

    # (source, first-doc) new-type counts: docs-sized result
    fo = (
        bucketed_groupby(
            ds.map_batches(tok_partial, batch_format="pyarrow"),
            ["source", "tk"],
            first_occ,
            expected_rows=ds.count() * 64,
        )
        .to_pandas()
        .groupby(["source", "fdoc"], as_index=False)["c"]
        .sum()
    )
    docs = (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    docs["r"] = docs.groupby("source").cumcount()
    docs["w"] = docs["r"] // VOCAB_WINDOW
    m = docs.merge(
        fo, left_on=["source", "doc_id"], right_on=["source", "fdoc"],
        how="left",
    )
    m["c"] = m["c"].fillna(0).astype(np.int64)
    out = (
        m.groupby(["source", "w"], as_index=False)
        .agg(n_docs=("doc_id", "size"), n_new_types=("c", "sum"))
        .rename(columns={"w": "window_idx"})
        .sort_values(["source", "window_idx"])
        .reset_index(drop=True)
    )
    out["cum_types"] = out.groupby("source")["n_new_types"].cumsum()
    for c in ("window_idx", "n_docs", "n_new_types", "cum_types"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# l-diversity privacy audit (q226)
# --------------------------------------------------------------------------

LDIV_BAND = 128
LDIV_L = 3

_LDIV_SQL = f"""
SELECT lang, CAST(n_chars // {LDIV_BAND} AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(CASE WHEN COUNT(DISTINCT source) >= {LDIV_L} THEN 1 ELSE 0 END
            AS BIGINT) AS diverse
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q226_l_diversity", sql=_LDIV_SQL)
def q226_l_diversity(sf_dir: str):
    """l-diversity audit over the q176 quasi-identifier groups (lang x
    length band): distinct sensitive values (source) per group and the
    l >= {LDIV_L} flag — k-anonymity's necessary companion (a group of
    50 rows all from ONE source still leaks membership; Machanavajjhala
    et al. 2007).  One group-keyed exchange; distinct counting happens
    inside the bucket on group-sized frames."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["lang", "n_chars", "source"])

    def add_band(t: pa.Table) -> pa.Table:
        return t.append_column(
            "band", pc.divide(t["n_chars"], pa.scalar(LDIV_BAND, pa.int64()))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["lang", "band"], sort=False)
            .agg(n_rows=("source", "size"), n_sources=("source", "nunique"))
            .reset_index()
        )
        g["diverse"] = (g["n_sources"] >= LDIV_L).astype(np.int64)
        return g

    out = (
        bucketed_groupby(
            ds.map_batches(add_band, batch_format="pyarrow"),
            ["lang", "band"],
            combine,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values(["lang", "band"])
        .reset_index(drop=True)
    )
    for c in ("band", "n_rows", "n_sources", "diverse"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Cross-source boilerplate n-gram discovery (q227)
# --------------------------------------------------------------------------

BOILER_GRAM = 4
BOILER_MIN_SOURCES = 3
BOILER_TOPK = 50

_XBOILER_SQL = f"""
WITH toks AS (SELECT doc_id, source,
                     regexp_extract_all(lower(text), '[a-z]+') t
              FROM documents),
grams AS (SELECT DISTINCT doc_id, source,
                 array_to_string(t[i:i+{BOILER_GRAM - 1}], ' ') g
          FROM toks, unnest(range(1, len(t) - {BOILER_GRAM - 2})) AS u(i)),
agg AS (SELECT g, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM grams GROUP BY 1)
SELECT g AS gram, n_sources, n_docs
FROM agg WHERE n_sources >= {BOILER_MIN_SOURCES}
ORDER BY n_sources DESC, n_docs DESC, gram LIMIT {BOILER_TOPK}
"""


@query("q227_boilerplate_ngrams", sql=_XBOILER_SQL)
def q227_boilerplate_ngrams(sf_dir: str):
    """Corpus-level boilerplate discovery: {BOILER_GRAM}-grams that
    recur across >= {BOILER_MIN_SOURCES} distinct sources, ranked by
    coverage — the data-driven way to SEED a blocklist (q141) or a
    removal pass: phrases shared by unrelated sources are navigation /
    legal / template text, the cross-document complement of the
    per-div Deboilerplater.  Plan: per-doc DISTINCT gram explode →
    ONE gram-keyed exchange counting distinct (source, doc) inside the
    bucket → threshold + result-sized top-k.  Same exchange shape as
    q122/q87 (hash-the-key swap documented there applies here
    verbatim)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def gram_partial(t: pa.Table) -> pa.Table:
        gs, srcs, docs = [], [], []
        for did, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(),
            t["text"].to_pylist(),
        ):
            toks = _TOKEN_RE.findall((txt or "").lower())
            seen = set()
            for i in range(len(toks) - BOILER_GRAM + 1):
                g = " ".join(toks[i:i + BOILER_GRAM])
                if g not in seen:
                    seen.add(g)
                    gs.append(g)
                    srcs.append(src)
                    docs.append(did)
        return pa.table(
            {
                "g": pa.array(gs),
                "source": pa.array(srcs),
                "doc_id": pa.array(docs, pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("g", sort=False)
            .agg(n_sources=("source", "nunique"), n_docs=("doc_id", "nunique"))
            .reset_index()
        )
        return g[g["n_sources"] >= BOILER_MIN_SOURCES]

    cand = bucketed_groupby(
        ds.map_batches(gram_partial, batch_format="pyarrow"),
        "g",
        combine,
        expected_rows=ds.count() * 256,
    ).to_pandas()
    if cand.empty:
        cand = pd.DataFrame(columns=["g", "n_sources", "n_docs"])
    out = (
        cand.sort_values(
            ["n_sources", "n_docs", "g"], ascending=[False, False, True]
        )
        .head(BOILER_TOPK)
        .rename(columns={"g": "gram"})
        .reset_index(drop=True)
    )
    out["n_sources"] = out["n_sources"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out[["gram", "n_sources", "n_docs"]]


# --------------------------------------------------------------------------
# Tokenizer fertility audit (q228)
# --------------------------------------------------------------------------

_FERT_SQL = """
WITH e AS (SELECT doc_id, n_words, n_subwords FROM read_parquet(
               '/root/repo/tests/fixtures/oracle/bpe_encode_sf0.01.parquet')),
j AS (SELECT d.lang, e.n_words, e.n_subwords
      FROM e JOIN documents d USING (doc_id))
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
       CAST(SUM(n_subwords) * 1000000 // SUM(n_words) AS BIGINT)
           AS fertility_ppm
FROM j GROUP BY 1 ORDER BY 1
"""


@query("q228_tokenizer_fertility", sql=_FERT_SQL)
def q228_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility per language: subwords-per-word (PPM) under
    the q120-trained BPE — THE fairness number for a multilingual
    tokenizer (a language with 2x fertility pays 2x context and 2x
    compute per sentence; budget models like q101's packing consume
    these totals).  Ray side re-trains + re-encodes distributedly
    (q120/q131 machinery, zero-shuffle encode); the oracle derives the
    same totals in SQL from the committed INDEPENDENT sequential-
    encoder fixture joined to document langs."""
    from texrex_ray.functions.bpe import bpe_encode, bpe_train

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_df = bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=12)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    enc = bpe_encode(docs, merges).to_pandas()
    langs = _read(sf_dir, "documents", ["doc_id", "lang"]).to_pandas()
    j = enc.merge(langs, on="doc_id")
    out = (
        j.groupby("lang", as_index=False)
        .agg(n_docs=("doc_id", "size"), n_words=("n_words", "sum"),
             n_subwords=("n_subwords", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["fertility_ppm"] = [
        int(s) * PPM // int(w) for s, w in zip(out["n_subwords"], out["n_words"])
    ]
    for c in ("n_docs", "n_words", "n_subwords", "fertility_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Payload storage audit: bytes per pixel by format (q229)
# --------------------------------------------------------------------------

_IMGDIR = "/tmp/texrex_ray_fixtures/images_n300_s42"

_BPP_SQL = f"""
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(octet_length(bytes)) AS BIGINT) AS sum_bytes,
       CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS sum_px,
       CAST(SUM(octet_length(bytes)) * 1000
            // SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS bytes_per_kpx,
       CAST(SUM(octet_length(bytes)) * 1000000
            // SUM(CAST(w AS BIGINT) * h * 3 + 12) AS BIGINT)
           AS vs_raw_ppm
FROM read_parquet('{_IMGDIR}/images.parquet') GROUP BY 1 ORDER BY 1
"""


@query("q229_payload_storage", sql=_BPP_SQL)
def q229_payload_storage(sf_dir: str):
    """Payload storage audit over the image table: bytes per kilopixel
    and container-vs-raw ratio per format — the table that decides
    re-encode policy (which fmt is paying its rent) and sizes the
    object-store budget per shard before a harvest run.  Metadata-only
    columns plus octet_length(bytes): the blobs are READ but never
    shuffled; partials are fmt-keyed sums."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "bytes", "w", "h"])

    def partial(t: pa.Table) -> pa.Table:
        blen = pc.binary_length(t["bytes"]).cast(pa.int64())
        w = t["w"].cast(pa.int64())
        h = t["h"].cast(pa.int64())
        px = pc.multiply(w, h)
        df = pd.DataFrame(
            {
                "fmt": t["fmt"].to_pylist(),
                "n_images": 1,
                "sum_bytes": blen.to_numpy(),
                "sum_px": px.to_numpy(),
                "sum_raw": (px.to_numpy() * 3 + 12),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("fmt", as_index=False).sum(), preserve_index=False
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n_images", "sum_bytes", "sum_px", "sum_raw")])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    m["bytes_per_kpx"] = [
        int(b) * 1000 // int(p) for b, p in zip(m["sum_bytes"], m["sum_px"])
    ]
    m["vs_raw_ppm"] = [
        int(b) * PPM // int(r) for b, r in zip(m["sum_bytes"], m["sum_raw"])
    ]
    out = m[["fmt", "n_images", "sum_bytes", "sum_px", "bytes_per_kpx",
             "vs_raw_ppm"]].copy()
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Caption dirt profile (q230)
# --------------------------------------------------------------------------

DIRT_PATTERNS = {
    "n_entity": r"&[a-z]+;",
    "n_tag": r"<[^>]+>",
    "n_email": r"[a-z0-9.]+@[a-z0-9.]+",
    "n_uri": r"https?://",
}

_DIRT_SQL = f"""
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_captions,
       CAST(SUM(CASE WHEN regexp_matches(caption, '&[a-z]+;')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_entity,
       CAST(SUM(CASE WHEN regexp_matches(caption, '<[^>]+>')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_tag,
       CAST(SUM(CASE WHEN regexp_matches(caption, '[a-z0-9.]+@[a-z0-9.]+')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       CAST(SUM(CASE WHEN regexp_matches(caption, 'https?://')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_uri,
       CAST(SUM(CASE WHEN contains(caption, chr(160))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nbsp,
       CAST(SUM(CASE WHEN contains(caption, chr(8203))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_zwsp
FROM read_parquet('{_IMGDIR}/images.parquet') GROUP BY 1 ORDER BY 1
"""


@query("q230_caption_dirt", sql=_DIRT_SQL)
def q230_caption_dirt(sf_dir: str):
    """Dirt profile of the RAW caption column before the cleaning
    chain: per format, documents carrying HTML entities, stray tags,
    e-mails, URIs, NBSP and ZWSP — the intake dashboard that tells the
    q45 pipeline what work is ahead and, rerun after cleansing,
    proves it happened (every count must drop to zero).  Vectorized
    pandas str.contains over a streaming pass; fmt-keyed count
    partials only."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "caption"])

    def partial(t: pa.Table) -> pa.Table:
        cap = pd.Series(t["caption"].to_pylist())
        df = pd.DataFrame({"fmt": t["fmt"].to_pylist(), "n_captions": 1})
        for col, pat in DIRT_PATTERNS.items():
            df[col] = cap.str.contains(pat, regex=True).astype(np.int64)
        df["n_nbsp"] = cap.str.contains("\u00a0", regex=False).astype(np.int64)
        df["n_zwsp"] = cap.str.contains("\u200b", regex=False).astype(np.int64)
        return pa.Table.from_pandas(
            df.groupby("fmt", as_index=False).sum(), preserve_index=False
        )

    cols = ["n_captions", *DIRT_PATTERNS.keys(), "n_nbsp", "n_zwsp"]
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    out = out[["fmt", *cols]]
    for c in cols:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Water-filling fetch-budget allocation (q231)
# --------------------------------------------------------------------------

WF_BUDGET = 4000

_WF_SQL = f"""
WITH he AS (SELECT regexp_extract(dst, 'http://([^/]+)/', 1) AS host
            FROM read_parquet('{_EDGE_FIXTURE}')),
deg AS (SELECT host, CAST(count(*) AS BIGINT) AS demand FROM he GROUP BY 1),
lv AS (SELECT CAST(COALESCE(MAX(l), 0) AS BIGINT) AS level FROM (
           SELECT t.l AS l, SUM(LEAST(d.demand, t.l)) AS s
           FROM deg d CROSS JOIN
                (SELECT unnest(range(0, (SELECT MAX(demand) + 1 FROM deg)))
                 AS l) t
           GROUP BY 1) WHERE s <= {WF_BUDGET}),
base AS (SELECT d.host, d.demand, LEAST(d.demand, lv.level) AS fl,
                lv.level AS level FROM deg d, lv),
r AS (SELECT CAST({WF_BUDGET} - SUM(fl) AS BIGINT) AS rem FROM base),
ranked AS (SELECT host, demand, fl, level,
                  CASE WHEN demand > level THEN ROW_NUMBER() OVER
                       (PARTITION BY demand > level ORDER BY host)
                  END AS br FROM base)
SELECT host, demand,
       CAST(fl + CASE WHEN br IS NOT NULL AND br <= r.rem THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked, r ORDER BY host
"""


@query("q231_waterfill_budget", sql=_WF_SQL)
def q231_waterfill_budget(sf_dir: str):
    """Max-min-fair (water-filling) allocation of a global fetch budget
    across hosts: every host is filled to a common waterline L capped
    by its own demand (in-link count), L chosen as the largest integer
    with sum(min(demand, L)) <= budget, and the integer remainder goes
    +1 each to the lexicographically-smallest unsaturated hosts — the
    scheduler's fair-share answer to q116's proportional apportionment
    (proportional lets one mega-host eat the budget; water-filling
    protects the tail, exactly ClaraX's politeness intent).  Plan: the
    demand census is the distributed part (vectorized host extraction,
    combiner partials, ONE host-keyed exchange); the waterline solve is
    exact integer math on the host-sized table."""
    edges = ray.data.read_parquet(_EDGE_FIXTURE, columns=["dst"])

    def partial(t: pa.Table) -> pa.Table:
        h = pd.Series(t["dst"].to_pylist()).str.extract(
            r"http://([^/]+)/", expand=False
        )
        g = h.value_counts().rename_axis("host").reset_index(name="pn")
        return pa.Table.from_pandas(g, preserve_index=False)

    deg = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("pn", alias_name="demand"))
        .to_pandas()  # host-sized
    )
    d = deg["demand"].astype("int64").to_numpy()
    hosts = deg["host"].to_numpy()
    n = len(d)
    tot = int(d.sum())
    if WF_BUDGET >= tot:
        alloc = d.copy()
    else:
        srt = np.sort(d)
        pfx = np.concatenate([[0], np.cumsum(srt)])
        level = None
        for k in range(n):  # k smallest hosts saturated
            lo = int(srt[k - 1]) if k else 0
            hi = int(srt[k])
            cand = (WF_BUDGET - int(pfx[k])) // (n - k)
            if lo <= cand < hi:
                level = cand
                break
        assert level is not None
        fl = np.minimum(d, level)
        rem = WF_BUDGET - int(fl.sum())
        unsat = np.sort(hosts[d > level])
        bonus_hosts = set(unsat[:rem])
        alloc = fl + np.array([h in bonus_hosts for h in hosts], dtype=np.int64)
        assert int(alloc.sum()) == WF_BUDGET  # budget exactness invariant
    out = (
        pd.DataFrame({"host": hosts, "demand": d, "alloc": alloc})
        .sort_values("host")
        .reset_index(drop=True)
    )
    out["demand"] = out["demand"].astype("int64")
    out["alloc"] = out["alloc"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Host-partition modularity of the crawl link graph (q232)
# --------------------------------------------------------------------------

_MOD_SQL = f"""
WITH e AS (SELECT regexp_extract(src, 'http://([^/]+)/', 1) AS hs,
                  regexp_extract(dst, 'http://([^/]+)/', 1) AS hd
           FROM read_parquet('{_EDGE_FIXTURE}')),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
outs AS (SELECT hs AS host, CAST(count(*) AS BIGINT) AS out_deg
         FROM e GROUP BY 1),
ins AS (SELECT hd AS host, CAST(count(*) AS BIGINT) AS in_deg
        FROM e GROUP BY 1),
intra AS (SELECT hs AS host, CAST(count(*) AS BIGINT) AS e_intra
          FROM e WHERE hs = hd GROUP BY 1),
hosts AS (SELECT DISTINCT host FROM
          (SELECT hs AS host FROM e UNION ALL SELECT hd FROM e))
SELECT h.host,
       CAST(COALESCE(i2.e_intra, 0) AS BIGINT) AS e_intra,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(m.m * COALESCE(i2.e_intra, 0)
            - COALESCE(o.out_deg, 0) * COALESCE(i.in_deg, 0) AS BIGINT)
           AS contrib_num
FROM hosts h CROSS JOIN m
LEFT JOIN outs o ON o.host = h.host
LEFT JOIN ins i ON i.host = h.host
LEFT JOIN intra i2 ON i2.host = h.host
ORDER BY h.host
"""


@query("q232_host_modularity", sql=_MOD_SQL)
def q232_host_modularity(sf_dir: str):
    """Directed modularity of the BY-HOST partition of the page link
    graph: per host c, the exact integer numerator
    ``m * e_intra(c) - out_deg(c) * in_deg(c)`` of Leicht-Newman
    directed modularity (Q = sum_c contrib_num / m^2) — the number
    that says whether hash-partitioning the frontier BY HOST actually
    co-locates most link traffic (high Q: intra-host edges stay inside
    a shard; low Q: every hop is a cross-shard message).  Emitted as
    raw integers (no division) so the value-hash is rounding-free;
    DuckDB's `//` truncates toward zero while Python floors, so a
    PPM-scaled signed quotient would diverge on negative contribs.
    Plan: one vectorized host-extraction pass emitting per-batch
    (host, intra/out/in) count partials, ONE host-keyed exchange, exact
    integer math on the host-sized result."""
    edges = ray.data.read_parquet(_EDGE_FIXTURE)

    def partial(t: pa.Table) -> pa.Table:
        hs = pd.Series(t["src"].to_pylist()).str.extract(
            r"http://([^/]+)/", expand=False
        )
        hd = pd.Series(t["dst"].to_pylist()).str.extract(
            r"http://([^/]+)/", expand=False
        )
        out_p = hs.value_counts().rename_axis("host").reset_index(name="out_pn")
        in_p = hd.value_counts().rename_axis("host").reset_index(name="in_pn")
        intra_p = (
            hs[hs.eq(hd)].value_counts().rename_axis("host")
            .reset_index(name="intra_pn")
        )
        g = (
            out_p.merge(in_p, on="host", how="outer")
            .merge(intra_p, on="host", how="outer")
            .fillna(0)
        )
        for c in ("out_pn", "in_pn", "intra_pn"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("out_pn", alias_name="out_deg"),
            Sum("in_pn", alias_name="in_deg"),
            Sum("intra_pn", alias_name="e_intra"),
        )
        .to_pandas()  # host-sized
        .sort_values("host")
        .reset_index(drop=True)
    )
    m = int(agg["out_deg"].sum())
    agg["contrib_num"] = [
        m * int(e) - int(o) * int(i)
        for e, o, i in zip(agg["e_intra"], agg["out_deg"], agg["in_deg"])
    ]
    for c in ("e_intra", "out_deg", "in_deg", "contrib_num"):
        agg[c] = agg[c].astype("int64")
    return agg[["host", "e_intra", "out_deg", "in_deg", "contrib_num"]]


# --------------------------------------------------------------------------
# Exponential-backoff compliance audit (q233)
# --------------------------------------------------------------------------

_BACKOFF_SQL = f"""
WITH err AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events
             WHERE event_type = 'error'),
o AS (SELECT user_id, t, ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY t, event_id) AS rn FROM err),
g AS (SELECT a.user_id, a.rn, a.t - b.t AS gap
      FROM o a JOIN o b ON a.user_id = b.user_id AND a.rn = b.rn + 1),
p AS (SELECT a.user_id, a.gap AS gap, b.gap AS pgap
      FROM g a JOIN g b ON a.user_id = b.user_id AND a.rn = b.rn + 1),
n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors
      FROM err GROUP BY 1)
SELECT n.user_id, n.n_errors,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN p.gap >= 2 * p.pgap THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ok,
       CAST(SUM(CASE WHEN p.gap >= 2 * p.pgap THEN 1 ELSE 0 END)
            * {PPM} // count(*) AS BIGINT) AS ok_ppm
FROM p JOIN n ON p.user_id = n.user_id
GROUP BY n.user_id, n.n_errors
ORDER BY n.user_id
"""


@query("q233_backoff_audit", sql=_BACKOFF_SQL)
def q233_backoff_audit(sf_dir: str):
    """Exponential-backoff compliance audit: per user, over consecutive
    'error' events, the fraction of adjacent gap pairs where the retry
    gap at least DOUBLED (gap_i >= 2 * gap_{i-1}) — the log-side audit
    of the fetcher's retry discipline (ClaraX restarts its client and
    backs off on failing hosts; a client that retries at constant
    cadence hammers a dying host).  Plan: per-batch filter+project to
    (user_id, event_id, ts_us) partials, ONE user-keyed bucketed
    exchange, per-user sort + vectorized diff inside the bucket;
    microsecond-integer gaps so the doubling test is exact."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["event_type"], pa.scalar("error"))
        f = t.filter(mask)
        return pa.table(
            {
                "user_id": f["user_id"],
                "event_id": f["event_id"],
                "t": f["ts"].cast(pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            sub = sub.sort_values(["t", "event_id"])
            t = sub["t"].to_numpy()
            if len(t) < 3:
                continue
            gaps = np.diff(t)
            ok = int(np.sum(gaps[1:] >= 2 * gaps[:-1]))
            n_pairs = len(gaps) - 1
            rows.append(
                (int(uid), len(t), n_pairs, ok, ok * PPM // n_pairs)
            )
        return pd.DataFrame(
            rows, columns=["user_id", "n_errors", "n_pairs", "n_ok", "ok_ppm"]
        )

    n_ev = ev.count()
    out = (
        bucketed_groupby(
            ev.map_batches(partial, batch_format="pyarrow"),
            "user_id",
            combine,
            expected_rows=n_ev,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Host out-link concentration: Simpson index per source host (q234)
# --------------------------------------------------------------------------

_FANOUT_SQL = f"""
WITH e AS (SELECT regexp_extract(src, 'http://([^/]+)/', 1) AS hs,
                  regexp_extract(dst, 'http://([^/]+)/', 1) AS hd
           FROM read_parquet('{_EDGE_FIXTURE}')),
x AS (SELECT hs, hd, CAST(count(*) AS BIGINT) AS n FROM e
      WHERE hs <> hd GROUP BY 1, 2),
a AS (SELECT hs AS host, CAST(SUM(n) AS BIGINT) AS n_links,
             CAST(count(*) AS BIGINT) AS n_targets,
             CAST(SUM(n * (n - 1)) AS BIGINT) AS pair_hits
      FROM x GROUP BY 1)
SELECT host, n_links, n_targets,
       CAST(pair_hits * {PPM} // (n_links * (n_links - 1)) AS BIGINT)
           AS simpson_ppm
FROM a WHERE n_links >= 2 ORDER BY host
"""


@query("q234_fanout_simpson", sql=_FANOUT_SQL)
def q234_fanout_simpson(sf_dir: str):
    """Out-link concentration per source host: the Simpson index
    (probability two random external out-links point at the SAME
    target host, PPM-scaled, integer-exact — no log, unlike entropy)
    over the host-contracted link graph.  High Simpson = the host
    funnels into one neighbor (link farm / mirror feeder, a q118
    reciprocity complement); low = a genuine hub worth frontier
    priority.  Plan: vectorized host extraction, per-batch (hs, hd)
    count partials (combiner), ONE host-pair-sized keyed exchange,
    per-host math on the host-sized result."""
    edges = ray.data.read_parquet(_EDGE_FIXTURE)

    def partial(t: pa.Table) -> pa.Table:
        hs = pd.Series(t["src"].to_pylist()).str.extract(
            r"http://([^/]+)/", expand=False
        )
        hd = pd.Series(t["dst"].to_pylist()).str.extract(
            r"http://([^/]+)/", expand=False
        )
        df = pd.DataFrame({"hs": hs, "hd": hd})
        df = df[df["hs"] != df["hd"]]
        g = df.groupby(["hs", "hd"], as_index=False).size().rename(
            columns={"size": "pn"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby(["hs", "hd"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # host-pair-sized
    )
    rows = []
    for host, sub in pairs.groupby("hs"):
        n = sub["n"].astype("int64")
        n_links = int(n.sum())
        if n_links < 2:
            continue
        pair_hits = int((n * (n - 1)).sum())
        rows.append(
            (
                host,
                n_links,
                len(sub),
                pair_hits * PPM // (n_links * (n_links - 1)),
            )
        )
    out = pd.DataFrame(
        rows, columns=["host", "n_links", "n_targets", "simpson_ppm"]
    ).sort_values("host").reset_index(drop=True)
    for c in ("n_links", "n_targets", "simpson_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Aspect-ratio bucketing for image-batch packing (q235)
# --------------------------------------------------------------------------

# (ratio_w, ratio_h) ladder; PPM ratio is the bucket key (SDXL-style
# aspect bucketing: every training batch holds one bucket so no image is
# padded, only center-cropped to the bucket ratio)
ASPECT_BUCKETS = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3)]

_ASPECT_CASES = " ".join(
    f"UNION ALL SELECT {i} AS b_idx, {rw} AS rw, {rh} AS rh"
    for i, (rw, rh) in enumerate(ASPECT_BUCKETS)
).removeprefix("UNION ALL ")

_ASPECT_SQL = f"""
WITH img AS (SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h
             FROM read_parquet('{_IMGDIR}/images.parquet')),
b AS ({_ASPECT_CASES}),
d AS (SELECT img.image_id, img.w, img.h, b.b_idx, b.rw, b.rh,
             abs(img.w * {PPM} // img.h - b.rw * {PPM} // b.rh) AS dist,
             ROW_NUMBER() OVER (PARTITION BY img.image_id
                 ORDER BY abs(img.w * {PPM} // img.h - b.rw * {PPM} // b.rh),
                          b.b_idx) AS rn
      FROM img CROSS JOIN b),
pick AS (SELECT * FROM d WHERE rn = 1),
per AS (SELECT b_idx, rw, rh, w, h,
               CASE WHEN w * rh >= h * rw
                    THEN h * rw * {PPM} // (rh * w)
                    ELSE w * rh * {PPM} // (rw * h) END AS retained_ppm
        FROM pick)
SELECT b_idx, CAST(rw AS BIGINT) AS rw, CAST(rh AS BIGINT) AS rh,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(w * h) AS BIGINT) AS sum_px,
       CAST(SUM(retained_ppm) AS BIGINT) AS sum_retained_ppm
FROM per GROUP BY 1, 2, 3 ORDER BY b_idx
"""


@query("q235_aspect_buckets", sql=_ASPECT_SQL)
def q235_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing plan for image training batches
    (SDXL-style): every image joins the ladder bucket with the nearest
    PPM aspect ratio (tie -> lowest bucket index) and pays a
    center-crop cost; per bucket we report population, pixel mass, and
    the summed retained-pixel fraction (PPM, integer-exact floor on
    both engines) — the table that decides whether the ladder needs
    more rungs before a 100-TB re-encode pass.  Plan: metadata-only
    columns (w, h — the blobs never load), vectorized numpy bucket
    argmin per batch, ONE bucket-keyed combine of 7 rows."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "w", "h"])
    b_ppm = np.array(
        [rw * PPM // rh for rw, rh in ASPECT_BUCKETS], dtype=np.int64
    )
    rw_a = np.array([rw for rw, _ in ASPECT_BUCKETS], dtype=np.int64)
    rh_a = np.array([rh for _, rh in ASPECT_BUCKETS], dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        w = t["w"].cast(pa.int64()).to_numpy()
        h = t["h"].cast(pa.int64()).to_numpy()
        img_ppm = w * PPM // h
        dist = np.abs(img_ppm[:, None] - b_ppm[None, :])
        # argmin picks the lowest index on ties — matches the SQL rn
        idx = np.argmin(dist, axis=1)
        rw, rh = rw_a[idx], rh_a[idx]
        wide = w * rh >= h * rw
        retained = np.where(
            wide, h * rw * PPM // (rh * w), w * rh * PPM // (rw * h)
        )
        df = pd.DataFrame(
            {
                "b_idx": idx.astype(np.int64),
                "rw": rw,
                "rh": rh,
                "n_images": 1,
                "sum_px": w * h,
                "sum_retained_ppm": retained,
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["b_idx", "rw", "rh"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["b_idx", "rw", "rh"])
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_px", alias_name="sum_px"),
            Sum("sum_retained_ppm", alias_name="sum_retained_ppm"),
        )
        .to_pandas()
        .sort_values("b_idx")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["b_idx", "rw", "rh", "n_images", "sum_px",
                "sum_retained_ppm"]]


# --------------------------------------------------------------------------
# Politeness makespan lower bound (q236)
# --------------------------------------------------------------------------

MIN_GAP_US = 500_000  # per-host politeness gap
N_WALKERS = 8
FETCH_US = 40_000  # per-fetch service time on one walker

_MAKESPAN_SQL = f"""
WITH u AS (SELECT DISTINCT dst AS url,
                  regexp_extract(dst, 'http://([^/]+)/', 1) AS host
           FROM read_parquet('{_EDGE_FIXTURE}')),
per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages FROM u GROUP BY 1),
g AS (SELECT CAST(SUM(n_pages) AS BIGINT) AS n_urls,
             CAST(count(*) AS BIGINT) AS n_hosts,
             CAST(MAX(n_pages) AS BIGINT) AS max_host_pages
      FROM per)
SELECT n_urls, n_hosts, max_host_pages,
       CAST((max_host_pages - 1) * {MIN_GAP_US} + {FETCH_US} AS BIGINT)
           AS lb_politeness_us,
       CAST(((n_urls + {N_WALKERS} - 1) // {N_WALKERS}) * {FETCH_US}
            AS BIGINT) AS lb_work_us,
       CAST(GREATEST((max_host_pages - 1) * {MIN_GAP_US} + {FETCH_US},
                     ((n_urls + {N_WALKERS} - 1) // {N_WALKERS})
                     * {FETCH_US}) AS BIGINT) AS makespan_lb_us
FROM g
"""


@query("q236_makespan_bound", sql=_MAKESPAN_SQL)
def q236_makespan_bound(sf_dir: str):
    """Crawl makespan lower bound: no schedule can finish the frontier
    faster than max(politeness bound, work bound) — the hottest host
    serializes at one fetch per MIN_GAP_US, and N_WALKERS walkers cap
    aggregate service throughput.  This single row is what a capacity
    planner reads BEFORE launching: if lb_politeness dominates, adding
    walkers is useless (q231's fairness problem); if lb_work dominates,
    the cluster is undersized.  Plan: distinct-URL census per host
    (ONE host-keyed exchange of URL hashes), exact integer microsecond
    bounds on the host-sized result."""
    edges = ray.data.read_parquet(_EDGE_FIXTURE, columns=["dst"])

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t["dst"].to_pylist()).drop_duplicates()
        return pa.table(
            {
                "url": pa.array(s.to_list()),
                "host": pa.array(
                    s.str.extract(r"http://([^/]+)/", expand=False).to_list()
                ),
            }
        )

    from texrex_ray.ops.aggregate import bucketed_groupby

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates("url")
        return (
            u.groupby("host", as_index=False)
            .size()
            .rename(columns={"size": "n_pages"})
        )

    per = (
        bucketed_groupby(
            edges.map_batches(partial, batch_format="pyarrow"),
            "host",
            combine,
            expected_rows=edges.count(),
        )
        .to_pandas()  # host-sized
        .groupby("host", as_index=False)["n_pages"].sum()
    )
    n_urls = int(per["n_pages"].sum())
    mx = int(per["n_pages"].max())
    lb_pol = (mx - 1) * MIN_GAP_US + FETCH_US
    lb_work = ((n_urls + N_WALKERS - 1) // N_WALKERS) * FETCH_US
    out = pd.DataFrame(
        [
            {
                "n_urls": n_urls,
                "n_hosts": len(per),
                "max_host_pages": mx,
                "lb_politeness_us": lb_pol,
                "lb_work_us": lb_work,
                "makespan_lb_us": max(lb_pol, lb_work),
            }
        ]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Caption truncation-loss audit (q237)
# --------------------------------------------------------------------------

TRUNC_LIMIT = 12  # tokens kept by the text encoder (CLIP-style hard cut)

_TRUNC_SQL = f"""
WITH c AS (SELECT fmt,
                  len(regexp_extract_all(lower(caption), '[a-z0-9]+'))
                      AS n_tok
           FROM read_parquet('{_IMGDIR}/images.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_captions,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN n_tok > {TRUNC_LIMIT} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       CAST(SUM(GREATEST(n_tok - {TRUNC_LIMIT}, 0)) AS BIGINT)
           AS lost_tokens,
       CAST(SUM(GREATEST(n_tok - {TRUNC_LIMIT}, 0)) * {PPM} // SUM(n_tok)
            AS BIGINT) AS lost_ppm
FROM c GROUP BY fmt ORDER BY fmt
"""


@query("q237_caption_truncation", sql=_TRUNC_SQL)
def q237_caption_truncation(sf_dir: str):
    """Caption truncation-loss audit: a CLIP-style text encoder hard-
    cuts captions at TRUNC_LIMIT tokens, so every token past the limit
    is paid for in storage and shuffle but never trains — per format,
    the captions over the limit and the PPM of total token mass lost.
    This is the number that justifies (or kills) a caption-rewrite
    pass before a 100-TB re-encode.  Plan: vectorized regex token
    count per batch (blobs never load — caption + fmt columns only),
    fmt-keyed count partials, one 5-row combine."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "caption"])

    def partial(t: pa.Table) -> pa.Table:
        n_tok = np.array(
            [
                len(_CAPTOK_RE.findall((c or "").lower()))
                for c in t["caption"].to_pylist()
            ],
            dtype=np.int64,
        )
        lost = np.maximum(n_tok - TRUNC_LIMIT, 0)
        df = pd.DataFrame(
            {
                "fmt": t["fmt"].to_pylist(),
                "n_captions": 1,
                "n_tokens": n_tok,
                "n_truncated": (n_tok > TRUNC_LIMIT).astype(np.int64),
                "lost_tokens": lost,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("fmt", as_index=False).sum(), preserve_index=False
        )

    cols = ["n_captions", "n_tokens", "n_truncated", "lost_tokens"]
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    out["lost_ppm"] = [
        int(l) * PPM // int(n) for l, n in zip(out["lost_tokens"], out["n_tokens"])
    ]
    for c in (*cols, "lost_ppm"):
        out[c] = out[c].astype("int64")
    return out[["fmt", *cols, "lost_ppm"]]


_CAPTOK_RE = re.compile(r"[a-z0-9]+")


# --------------------------------------------------------------------------
# Deterministic K-fold assignment balance audit (q238)
# --------------------------------------------------------------------------

N_FOLDS = 5

_FOLD_SQL = f"""
WITH f AS (SELECT lang,
                  md5_number_lower(CAST(doc_id AS VARCHAR)) % {N_FOLDS}
                      AS fold
           FROM documents),
c AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs FROM f
      GROUP BY 1, 2)
SELECT CAST(fold AS BIGINT) AS fold, lang, n_docs,
       CAST({N_FOLDS} * n_docs - SUM(n_docs) OVER (PARTITION BY lang)
            AS BIGINT) AS dev_num
FROM c ORDER BY fold, lang
"""


@query("q238_fold_balance", sql=_FOLD_SQL)
def q238_fold_balance(sf_dir: str):
    """Deterministic K-fold assignment + stratification audit: every
    document's fold is a pure content-stable function of its id (md5
    mod K — the q47 membership function, so folds survive
    repartitioning, appends, and engine swaps), and per (fold, lang)
    we emit the exact integer deviation numerator
    ``K * n_docs(fold, lang) - n_docs(lang)`` (zero == perfectly
    stratified; the full chi-square needs only this table).  An eval
    harness reads this BEFORE trusting per-fold metrics on a skewed
    corpus.  Plan: per-batch md5 fold hash (per-row digest, ~50 ns)
    + (fold, lang) count partials, ONE K*langs-sized combine."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        folds = np.array(
            [
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[8:], "little"
                ) % N_FOLDS
                for i in t["doc_id"].to_pylist()
            ],
            dtype=np.int64,
        )
        df = pd.DataFrame(
            {"fold": folds, "lang": t["lang"].to_pylist(), "n_docs": 1}
        )
        return pa.Table.from_pandas(
            df.groupby(["fold", "lang"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["fold", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()  # K x langs rows
    )
    lang_tot = out.groupby("lang")["n_docs"].transform("sum")
    out["dev_num"] = N_FOLDS * out["n_docs"] - lang_tot
    out = out.sort_values(["fold", "lang"]).reset_index(drop=True)
    for c in ("fold", "n_docs", "dev_num"):
        out[c] = out[c].astype("int64")
    return out[["fold", "lang", "n_docs", "dev_num"]]


# --------------------------------------------------------------------------
# Label-propagation communities over the crawl link graph (q239)
# --------------------------------------------------------------------------

@query(
    "q239_label_propagation",
    sql="SELECT page, label FROM read_parquet("
    "'/root/repo/tests/fixtures/oracle/label_prop_sf0.01.parquet') "
    "ORDER BY page",
)
def q239_label_propagation(sf_dir: str):
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    4 rounds, min-label tie-break) over the crawl link graph — the
    cheap community detector that collapses link farms and mirror
    rings onto one label without modularity optimization (q232 then
    SCORES the found partition).  Ray plan (`ops/graph.py::
    label_propagation`): nodes integer-encoded once, per-round
    broadcast of the node-sized label array, per-batch bidirectional
    (node, neighbor-label) count partials, ONE (node,label)-keyed
    exchange per round — the PageRank exchange shape, label-valued.
    Oracle: committed fixture from the INDEPENDENT dict/Counter
    sequential twin."""
    from texrex_ray.ops.graph import label_propagation

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return label_propagation(edges, iters=4)


# --------------------------------------------------------------------------
# Held-out OOV rate vs a train-fold vocabulary (q240)
# --------------------------------------------------------------------------

VOCAB_K = 12  # the synthetic corpus has ~31 types; 12 leaves a real OOV tail

_OOV_SQL = f"""
WITH f AS (SELECT doc_id, lang, text,
                  md5_number_lower(CAST(doc_id AS VARCHAR)) % {N_FOLDS}
                      AS fold
           FROM documents),
tr AS (SELECT unnest({TOKEN_SQL}) AS token FROM f WHERE fold <> 0),
voc AS (SELECT token FROM (SELECT token, count(*) AS n FROM tr GROUP BY 1)
        ORDER BY n DESC, token ASC LIMIT {VOCAB_K}),
ev AS (SELECT lang, unnest({TOKEN_SQL}) AS token FROM f WHERE fold = 0)
SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN token NOT IN (SELECT token FROM voc)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN token NOT IN (SELECT token FROM voc)
                THEN 1 ELSE 0 END) * {PPM} // count(*) AS BIGINT) AS oov_ppm
FROM ev GROUP BY lang ORDER BY lang
"""


@query("q240_oov_rate", sql=_OOV_SQL)
def q240_oov_rate(sf_dir: str):
    """Held-out OOV audit: build the top-VOCAB_K token vocabulary on
    the q238 TRAIN folds (md5(doc_id) % K != 0 — content-stable, so
    the split never leaks under repartitioning) and measure per-lang
    out-of-vocabulary token mass on the held-out fold — the eval-side
    number that says whether a fixed vocab (or a q120 BPE merge table)
    transfers across languages or silently starves the tail ones.
    Plan: pass 1 = combiner-style partial token counts over train
    folds, one token-keyed exchange, result-sized top-k; pass 2 =
    broadcast vocab set (ray.put once), vectorized isin per batch,
    lang-sized combine.  Tie-break at the vocab boundary is
    (count DESC, token ASC) on both engines."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def fold_of(i) -> int:
        return int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:], "little"
        ) % N_FOLDS

    def train_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if fold_of(i) != 0:
                c.update(_TOKEN_RE.findall((txt or "").lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "pn": pa.array(list(c.values()), pa.int64()),
            }
        )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        # per-block prune: tokens are unique after the groupby, so the
        # global top-K lives inside the union of per-block top-Ks —
        # the driver sees at most blocks * K rows, never the full vocab
        return df.sort_values(
            ["n", "token"], ascending=[False, True]
        ).head(VOCAB_K)

    tok = (
        ds.map_batches(train_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
    )
    vocab = set(
        tok.sort_values(["n", "token"], ascending=[False, True])
        .head(VOCAB_K)["token"]
    )
    voc_ref = ray.put(vocab)

    def eval_partial(t: pa.Table) -> pa.Table:
        v = ray.get(voc_ref)
        langs, n_tok, n_oov = [], [], []
        for i, lang, txt in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(),
            t["text"].to_pylist(),
        ):
            if fold_of(i) != 0:
                continue
            toks = _TOKEN_RE.findall((txt or "").lower())
            langs.append(lang)
            n_tok.append(len(toks))
            n_oov.append(sum(1 for w in toks if w not in v))
        df = pd.DataFrame(
            {"lang": langs, "n_tokens": n_tok, "n_oov": n_oov}
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).sum(), preserve_index=False
        )

    out = (
        ds.map_batches(eval_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_oov", alias_name="n_oov"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["oov_ppm"] = [
        int(o) * PPM // int(n) for o, n in zip(out["n_oov"], out["n_tokens"])
    ]
    for c in ("n_tokens", "n_oov", "oov_ppm"):
        out[c] = out[c].astype("int64")
    return out[["lang", "n_tokens", "n_oov", "oov_ppm"]]


# --------------------------------------------------------------------------
# Exact byte-identical image dedup: storage reclaim table (q241)
# --------------------------------------------------------------------------

_IMGDUP_SQL = f"""
WITH g AS (SELECT fmt, bytes, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(octet_length(bytes) AS BIGINT) AS blen
           FROM read_parquet('{_IMGDIR}/images.parquet') GROUP BY fmt, bytes)
SELECT fmt, CAST(SUM(cnt) AS BIGINT) AS n_images,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(SUM(cnt - 1) AS BIGINT) AS n_dup_rows,
       CAST(SUM(cnt * blen) AS BIGINT) AS sum_bytes,
       CAST(SUM((cnt - 1) * blen) AS BIGINT) AS reclaim_bytes
FROM g GROUP BY fmt ORDER BY fmt
"""


@query("q241_image_exact_dedup", sql=_IMGDUP_SQL)
def q241_image_exact_dedup(sf_dir: str):
    """Exact byte-identical image dedup accounting: per format, rows
    that are perfect copies of another payload and the bytes a
    content-addressed store would reclaim — the storage-side
    complement of pHash NEAR-dup (q72): exact dup removal is free and
    lossless, so it always runs first.  Plan: per-batch md5-digest of
    the payload (16-byte key — the blobs themselves NEVER leave their
    read task, q117's hash-not-content exchange discipline), ONE
    digest-keyed exchange of (fmt, digest, cnt, blen) partials,
    fmt-sized final combine.  Oracle groups by the raw BLOB — same
    equivalence, independent mechanism (md5 collisions would show as a
    hash mismatch here)."""
    import hashlib

    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "bytes"])

    def partial(t: pa.Table) -> pa.Table:
        fmts = t["fmt"].to_pylist()
        digs, lens = [], []
        for b in t["bytes"].to_pylist():
            digs.append(hashlib.md5(b).hexdigest())
            lens.append(len(b))
        df = pd.DataFrame(
            {"fmt": fmts, "dig": digs, "blen": lens, "cnt": 1}
        )
        return pa.Table.from_pandas(
            df.groupby(["fmt", "dig", "blen"], as_index=False)["cnt"].sum(),
            preserve_index=False,
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["fmt", "dig", "blen"], as_index=False)["cnt"].sum()
        g["n_images"] = g["cnt"]
        g["n_unique"] = 1
        g["n_dup_rows"] = g["cnt"] - 1
        g["sum_bytes"] = g["cnt"] * g["blen"]
        g["reclaim_bytes"] = (g["cnt"] - 1) * g["blen"]
        return g[["fmt", "n_images", "n_unique", "n_dup_rows", "sum_bytes",
                  "reclaim_bytes"]]

    cols = ["n_images", "n_unique", "n_dup_rows", "sum_bytes",
            "reclaim_bytes"]
    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            "dig",
            combine,
            expected_rows=300,
        )
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[["fmt", *cols]]


# --------------------------------------------------------------------------
# Max-edge resize plan: pixel savings before re-encode (q242)
# --------------------------------------------------------------------------

MAX_EDGE = 96

_RESIZE_SQL = f"""
WITH img AS (SELECT fmt, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h
             FROM read_parquet('{_IMGDIR}/images.parquet')),
r AS (SELECT fmt, w, h,
             CASE WHEN GREATEST(w, h) <= {MAX_EDGE} THEN w
                  ELSE GREATEST(w * {MAX_EDGE} // GREATEST(w, h), 1) END
                 AS nw,
             CASE WHEN GREATEST(w, h) <= {MAX_EDGE} THEN h
                  ELSE GREATEST(h * {MAX_EDGE} // GREATEST(w, h), 1) END
                 AS nh
      FROM img)
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(CASE WHEN nw <> w OR nh <> h THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resized,
       CAST(SUM(w * h) AS BIGINT) AS px_before,
       CAST(SUM(nw * nh) AS BIGINT) AS px_after,
       CAST((SUM(w * h) - SUM(nw * nh)) * {PPM} // SUM(w * h) AS BIGINT)
           AS saved_ppm
FROM r GROUP BY fmt ORDER BY fmt
"""


@query("q242_resize_plan", sql=_RESIZE_SQL)
def q242_resize_plan(sf_dir: str):
    """Max-edge resize plan: cap every image's longest edge at
    MAX_EDGE px (aspect-preserving integer-floor dims, min 1) and
    report per format how many rows shrink and the PPM of pixel mass
    saved — the planning table that sizes a re-encode pass's compute
    and the object-store budget it frees (a 100-TB harvest is mostly
    oversized pixels).  Metadata-only: w/h columns, the blobs never
    load; exact integer dims so the plan equals what the q37-style
    decode-resize actors will actually produce."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "w", "h"])

    def partial(t: pa.Table) -> pa.Table:
        w = t["w"].cast(pa.int64()).to_numpy()
        h = t["h"].cast(pa.int64()).to_numpy()
        edge = np.maximum(w, h)
        over = edge > MAX_EDGE
        nw = np.where(over, np.maximum(w * MAX_EDGE // edge, 1), w)
        nh = np.where(over, np.maximum(h * MAX_EDGE // edge, 1), h)
        df = pd.DataFrame(
            {
                "fmt": t["fmt"].to_pylist(),
                "n_images": 1,
                "n_resized": ((nw != w) | (nh != h)).astype(np.int64),
                "px_before": w * h,
                "px_after": nw * nh,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("fmt", as_index=False).sum(), preserve_index=False
        )

    cols = ["n_images", "n_resized", "px_before", "px_after"]
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    out["saved_ppm"] = [
        (int(b) - int(a)) * PPM // int(b)
        for b, a in zip(out["px_before"], out["px_after"])
    ]
    for c in (*cols, "saved_ppm"):
        out[c] = out[c].astype("int64")
    return out[["fmt", *cols, "saved_ppm"]]


# --------------------------------------------------------------------------
# Watermark / late-data audit under adversarial arrival order (q243)
# --------------------------------------------------------------------------

LATENESS_US = 14 * 86_400_000_000  # allowed out-of-orderness: 14 d (stream spans ~30 d)
# unique content-stable arrival key: md5-shuffled, event_id-salted
_ARR_MOD = 2**38
_ARR_SHIFT = 2**24

_LATE_SQL = f"""
WITH a AS (SELECT event_type, event_id, epoch_us(ts) AS t,
                  (md5_number_lower(CAST(event_id AS VARCHAR)) % {_ARR_MOD})
                      * {_ARR_SHIFT} + event_id AS arr
           FROM events),
w AS (SELECT event_type, t,
             MAX(t) OVER (ORDER BY arr
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pm
      FROM a)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN pm - {LATENESS_US} > t THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN pm - {LATENESS_US} > t THEN 1 ELSE 0 END)
            * {PPM} // count(*) AS BIGINT) AS late_ppm
FROM w GROUP BY event_type ORDER BY event_type
"""


@query("q243_late_events", sql=_LATE_SQL)
def q243_late_events(sf_dir: str):
    """Watermark / late-data audit: replay the event stream in a
    content-stable ADVERSARIAL arrival order (md5-shuffled — the
    synthetic feed is perfectly ts-ordered, so a worst-case ingest
    permutation is what actually exercises the operator; being a pure
    function of event_id it is also engine-invariant) and count, per
    type, events arriving later than the watermark ``running_max(ts) -
    LATENESS_US`` — the number that sizes a streaming sink's
    allowed-lateness buffer.  Plan: the watermark is
    ``ops/window.py::prefix_scan_max`` — an exclusive global running
    max with NO global sort: contiguous range slices, bucket maxima to
    the driver (n_buckets values), exclusive prefix carry broadcast
    back, one in-slice vectorized cummax.  Two narrow integer
    exchanges total."""
    import hashlib

    from texrex_ray.ops.window import prefix_scan_max

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def keyed(t: pa.Table) -> pa.Table:
        eids = t["event_id"].to_pylist()
        arr = np.array(
            [
                (
                    int.from_bytes(
                        hashlib.md5(str(i).encode()).digest()[8:], "little"
                    ) % _ARR_MOD
                ) * _ARR_SHIFT + i
                for i in eids
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "arr": pa.array(arr),
                "t": t["ts"].cast(pa.int64()),
            }
        )

    scanned = prefix_scan_max(
        ev.map_batches(keyed, batch_format="pyarrow"), "arr", "t"
    )

    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            n_events=1,
            n_late=(df["prev_max"] - LATENESS_US > df["t"]).astype(np.int64),
        )
        return df.groupby("event_type", as_index=False)[
            ["n_events", "n_late"]
        ].sum()

    out = (
        scanned.map_batches(late_partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_late", alias_name="n_late"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["late_ppm"] = [
        int(l) * PPM // int(n) for l, n in zip(out["n_late"], out["n_events"])
    ]
    for c in ("n_events", "n_late", "late_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# URL front-coding savings per host (q244)
# --------------------------------------------------------------------------

_FRONTCODE_SQL = f"""
WITH u AS (SELECT DISTINCT dst AS url,
                  regexp_extract(dst, 'http://([^/]+)/', 1) AS host
           FROM read_parquet('{_EDGE_FIXTURE}')),
o AS (SELECT host, url,
             LAG(url) OVER (PARTITION BY host ORDER BY url) AS prev
      FROM u),
l AS (SELECT host, url,
             CASE WHEN prev IS NULL THEN 0 ELSE (
                 SELECT COALESCE(MAX(k), 0)
                 FROM (SELECT unnest(range(1,
                          LEAST(length(url), length(prev)) + 1)) AS k)
                 WHERE substr(url, 1, CAST(k AS INTEGER))
                       = substr(prev, 1, CAST(k AS INTEGER))
             ) END AS lcp
      FROM o)
SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(SUM(length(url)) AS BIGINT) AS bytes_raw,
       CAST(SUM(lcp) AS BIGINT) AS bytes_saved,
       CAST(SUM(lcp) * {PPM} // SUM(length(url)) AS BIGINT) AS saved_ppm
FROM l GROUP BY host ORDER BY host
"""


@query("q244_url_frontcoding", sql=_FRONTCODE_SQL)
def q244_url_frontcoding(sf_dir: str):
    """Front-coding savings for the URL frontier store: within each
    host, URLs sort lexicographically and each stores only its suffix
    after the longest common prefix with its predecessor — exactly how
    production crawlers (and the TARC arcxi index) keep 10^10-URL seen
    sets in RAM.  Per host: raw bytes, bytes the shared prefixes save,
    and the PPM ratio that decides whether the frontier shards get
    front-coded pages or plain sorted strings.  Plan: distinct-URL
    projection, ONE host-keyed bucketed exchange, in-bucket sort +
    per-string LCP (the kernel is inherently per-string; hashing and
    grouping stay vectorized)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    edges = ray.data.read_parquet(_EDGE_FIXTURE, columns=["dst"])

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t["dst"].to_pylist()).drop_duplicates()
        return pa.table(
            {
                "url": pa.array(s.to_list()),
                "host": pa.array(
                    s.str.extract(r"http://([^/]+)/", expand=False).to_list()
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for host, sub in df.groupby("host", sort=False):
            urls = sorted(set(sub["url"]))
            raw = sum(len(u) for u in urls)
            saved = 0
            for prev, cur in zip(urls, urls[1:]):
                k = 0
                m = min(len(prev), len(cur))
                while k < m and prev[k] == cur[k]:
                    k += 1
                saved += k
            rows.append((host, len(urls), raw, saved,
                         saved * PPM // raw))
        return pd.DataFrame(
            rows,
            columns=["host", "n_urls", "bytes_raw", "bytes_saved",
                     "saved_ppm"],
        )

    out = (
        bucketed_groupby(
            edges.map_batches(partial, batch_format="pyarrow"),
            "host",
            combine,
            expected_rows=edges.count(),
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    for c in ("n_urls", "bytes_raw", "bytes_saved", "saved_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Postings run-length compressibility per language (q245)
# --------------------------------------------------------------------------

_RUNS_SQL = f"""
WITH r AS (SELECT lang, doc_id,
                  CASE WHEN LAG(doc_id) OVER (PARTITION BY lang
                                              ORDER BY doc_id) = doc_id - 1
                       THEN 0 ELSE 1 END AS run_start
           FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(run_start) AS BIGINT) AS n_runs,
       CAST(SUM(run_start) * {PPM} // count(*) AS BIGINT) AS runs_ppm
FROM r GROUP BY lang ORDER BY lang
"""


@query("q245_postings_runs", sql=_RUNS_SQL)
def q245_postings_runs(sf_dir: str):
    """Run-length compressibility of per-language doc_id posting lists:
    the number of maximal consecutive-id runs (a Roaring/RLE container
    stores one (start, len) pair per run, so runs_ppm ~ PPM means
    incompressible singletons, ~0 means free storage).  The index-
    layout twin of q99's inverted index and q219's sort-layout ROI.
    Plan: NO sort — a run START is simply a doc whose predecessor id
    is absent from its language's set, so each doc emits a presence
    token at doc_id and a probe token at doc_id + 1, ONE (lang,
    id)-keyed bucketed exchange counts starts, lang-sized combine."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def tokens(t: pa.Table) -> pa.Table:
        d = t["doc_id"].cast(pa.int64()).to_numpy()
        lang = t["lang"].to_pylist()
        return pa.table(
            {
                "lang": pa.array(lang + lang),
                "key": pa.array(np.concatenate([d, d + 1])),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(d), np.int64),
                         np.ones(len(d), np.int64)]
                    )
                ),  # 0 = present-here, 1 = predecessor-marker
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "key"])["kind"].agg(["min", "max"])
        # run start: a present token (min==0) with no predecessor
        # marker at the same key (max==0)
        starts = (g["max"] == 0) & (g["min"] == 0)
        pres = g["min"] == 0
        out = pd.DataFrame(
            {
                "lang": [l for l, _ in g.index],
                "n_docs": pres.astype(np.int64).to_numpy(),
                "n_runs": starts.astype(np.int64).to_numpy(),
            }
        )
        return out.groupby("lang", as_index=False).sum()

    out = (
        bucketed_groupby(
            ds.map_batches(tokens, batch_format="pyarrow"),
            ["lang", "key"],
            combine,
            expected_rows=ds.count() * 2,
        )
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_runs", alias_name="n_runs"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["runs_ppm"] = [
        int(r) * PPM // int(n) for r, n in zip(out["n_runs"], out["n_docs"])
    ]
    for c in ("n_docs", "n_runs", "runs_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Session interval-union coverage per user (q246)
# --------------------------------------------------------------------------

COVER_WINDOW_US = 30 * 60_000_000  # each event covers [ts, ts + 30 min)

_COVER_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                  epoch_us(ts) + {COVER_WINDOW_US} AS e FROM events),
o AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pm
      FROM e)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pm, s)), 0)) AS BIGINT)
           AS covered_us,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pm, s)), 0)) * {PPM}
            // (MAX(e) - MIN(s)) AS BIGINT) AS util_ppm
FROM o GROUP BY user_id ORDER BY user_id
"""


@query("q246_interval_coverage", sql=_COVER_SQL)
def q246_interval_coverage(sf_dir: str):
    """Interval-union coverage: each event opens a 30-minute activity
    window; per user, the exact µs length of the UNION of those
    windows (overlaps counted once — the classic island problem) and
    its PPM share of the user's total active span.  The engagement
    number raw event counts inflate and sessionization (q98)
    approximates.  Plan: ONE user-keyed bucketed exchange; inside the
    bucket a vectorized sort + shifted cummax turns the union into
    ``sum(max(0, e - max(s, running_max_before)))`` — linear, no
    interval tree."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def project(t: pa.Table) -> pa.Table:
        s = t["ts"].cast(pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "s": s,
                "e": pc.add(s, pa.scalar(COVER_WINDOW_US, pa.int64())),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            sub = sub.sort_values(["s", "e"], kind="mergesort")
            s = sub["s"].to_numpy()
            e = sub["e"].to_numpy()
            pm = np.empty(len(e), dtype=np.int64)
            pm[0] = s[0]  # COALESCE(pm, s): first interval adds e - s
            if len(e) > 1:
                pm[1:] = np.maximum.accumulate(e[:-1])
            covered = int(np.maximum(e - np.maximum(s, pm), 0).sum())
            span = int(e.max() - s.min())
            rows.append(
                (int(uid), len(sub), covered, covered * PPM // span)
            )
        return pd.DataFrame(
            rows, columns=["user_id", "n_events", "covered_us", "util_ppm"]
        )

    out = (
        bucketed_groupby(
            ev.map_batches(project, batch_format="pyarrow"),
            "user_id",
            combine,
            expected_rows=ev.count(),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out
