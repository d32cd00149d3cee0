"""Relational + stream analytics (outer joins, KMV, sorted-neighborhood, DBSCAN, episodes, readability; q143-q195 era).

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
from texrex_ray.pipelines.queries.flagships import _GRAMS_CTE, _JACCARD_SQL, _TOKEN_RE, _av_n, _doc_bucket  # noqa: F401
from texrex_ray.pipelines.queries.corpus_ops import _ALL  # noqa: F401



# --------------------------------------------------------------------------
# Full-outer big-big join (the one shuffle_join plan without a q entry)
# --------------------------------------------------------------------------

@query(
    "q143_outer_join",
    sql="""
    WITH l AS (SELECT o_custkey AS custkey, COUNT(*) AS n_open,
                      CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS open_total_c
               FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
         r AS (SELECT c_custkey AS custkey,
                      CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
               FROM customer WHERE c_acctbal > 5000)
    SELECT COALESCE(l.custkey, r.custkey) AS custkey,
           COALESCE(n_open, 0) AS n_open,
           COALESCE(open_total_c, 0) AS open_total_c,
           COALESCE(acctbal_c, -1) AS acctbal_c
    FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
    ORDER BY custkey
    """,
)
def q143_outer_join(sf_dir: str):
    """FULL OUTER bucketed shuffle join — the reconciliation plan
    (ops/join.py supports how="outer"; q54 covers inner, q138 the
    co-partitioned variant; this closes outer).  Customers holding open
    orders vs high-balance customers: both sides have unmatched keys, and
    an outer merge must emit each exactly once — per-bucket pandas outer
    merges do, because every key lives in exactly one bucket.  NULL sides
    are COALESCEd to integer sentinels on BOTH engines so the value hash
    never compares engine NULL spellings."""
    from texrex_ray.ops import shuffle_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    left = (
        orders.filter(expr="o_orderstatus == 'O'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_open"), Sum("o_totalprice", alias_name="tot"))
    )

    def l_fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["o_custkey"].astype("int64"),
                "n_open": df["n_open"].astype("int64"),
                "open_total_c": (df["tot"] * 100).round().astype("int64"),
            }
        )

    def r_fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_acctbal"] > 5000.0]
        return pd.DataFrame(
            {
                "custkey": df["c_custkey"].astype("int64"),
                "acctbal_c": (df["c_acctbal"] * 100).round().astype("int64"),
            }
        )

    joined = shuffle_join(
        left.map_batches(l_fin, batch_format="pandas"),
        cust.map_batches(r_fin, batch_format="pandas"),
        "custkey",
        how="outer",
        expected_rows=cust.count(),
    )
    out = joined.to_pandas()
    out["n_open"] = out["n_open"].fillna(0).astype("int64")
    out["open_total_c"] = out["open_total_c"].fillna(0).astype("int64")
    out["acctbal_c"] = out["acctbal_c"].fillna(-1).astype("int64")
    out["custkey"] = out["custkey"].astype("int64")
    return out.sort_values("custkey").reset_index(drop=True)[
        ["custkey", "n_open", "open_total_c", "acctbal_c"]
    ]


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — bottom-k distinct estimation
# --------------------------------------------------------------------------

KMV_K = 64


@query(
    "q144_kmv_distinct",
    sql=f"""
    WITH toks AS (SELECT source, regexp_extract_all(lower(text), '[a-z]+') t
                  FROM documents),
    g AS (SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS tok
          FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
    h AS (SELECT source, md5_number_lower(tok) AS hk FROM g),
    r AS (SELECT source, hk,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk) AS rn
          FROM h),
    kth AS (SELECT source, hk AS hk64 FROM r WHERE rn = {KMV_K}),
    ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact FROM h GROUP BY 1)
    SELECT ex.source, n_exact,
           CAST(COALESCE({KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT
                         // kth.hk64::HUGEINT, n_exact) AS BIGINT) AS kmv_est
    FROM ex LEFT JOIN kth USING (source) ORDER BY source
    """,
)
def q144_kmv_distinct(sf_dir: str):
    """KMV / theta-sketch distinct 3-gram count per source (k minimum
    hash values; estimate (k-1)·2⁶⁴ / h₍ₖ₎, Bar-Yossef et al. 2002) next
    to q48's HLL: KMV sketches are UNION-MERGEABLE (union of bottom-k
    sets, re-trim to k) and, unlike HLL, support INTERSECTION estimates —
    the cross-corpus overlap question.  Per-batch partials emit each
    batch's distinct (source, hash) pairs; one source-keyed exchange of
    TYPE-cardinality (never token-cardinality) rows computes the exact
    count (the audit column) and the kth minimum.  The hash is
    md5_lower64 ≡ DuckDB md5_number_lower, so estimates are bit-equal
    across engines — integer division, no floats."""
    from texrex_ray.functions.hashing import md5_lower64

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        srcs, hks = [], []
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if not grams:
                continue
            hk = md5_lower64(sorted(grams))
            srcs.extend([src] * len(hk))
            hks.append(hk)
        hk_all = np.concatenate(hks) if hks else np.array([], np.uint64)
        return pa.table({"source": pa.array(srcs), "hk": pa.array(hk_all, pa.uint64())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        src = g["source"].iloc[0]
        hk = np.unique(g["hk"].to_numpy().astype(np.uint64))
        n_exact = len(hk)
        if n_exact >= KMV_K:
            est = ((KMV_K - 1) << 64) // int(hk[KMV_K - 1])
        else:
            est = n_exact
        return pd.DataFrame(
            {"source": [src], "n_exact": [n_exact], "kmv_est": [est]}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"n_exact": "int64", "kmv_est": "int64"})
    return out.sort_values("source").reset_index(drop=True)


# --------------------------------------------------------------------------
# Sorted-neighborhood near-dup blocking (Hernández & Stolfo 1995)
# --------------------------------------------------------------------------

SNM_W = 4  # window: candidate pairs at rank distance 1..W
_SNM_KEY_SQL = "substr(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), 1, 24)"


@query(
    "q145_sorted_neighborhood",
    sql=(
        f"""
    WITH keyd AS (SELECT doc_id, {_SNM_KEY_SQL} AS k FROM documents),
    r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM keyd),
    cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
                    GREATEST(a.doc_id, b.doc_id) AS id_b
             FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNM_W}),
    """
        + _GRAMS_CTE.format(m=2, m1=1).strip()
        + """,
    sizes AS (SELECT doc_id, COUNT(*) sz FROM grams GROUP BY 1),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) i
              FROM cand c
              JOIN grams ga ON ga.doc_id = c.id_a
              JOIN grams gb ON gb.doc_id = c.id_b AND gb.g = ga.g
              GROUP BY 1, 2)
    SELECT id_a, id_b, i AS n_inter, (sa.sz + sb.sz - i) AS n_union
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE i * 2 >= (sa.sz + sb.sz - i)
    ORDER BY id_a, id_b
    """
    ),
)
def q145_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood near-dup blocking — the third candidate-
    generation family next to minhash-LSH (q17) and Hamming block-LSH
    (q57): sort the corpus ONCE by a cheap blocking key (first 24
    letters-only chars), slide a rank window of {SNM_W}, and only
    window pairs are verified (exact 3-gram Jaccard ≥ 1/2 in integer
    arithmetic, q14's threshold).  Shape at 100 TB: one sort (the
    unavoidable exchange) + the q50 two-phase rank assignment
    (ops/shuffle.py::sorted_positions — block summaries, no serial
    scan), then grams carry (rank, size) so the verify is ONE
    gram-keyed bucketed exchange whose per-gram pair fan-out is bounded
    by the window, never all-pairs.  The window crosses block
    boundaries by construction (pairs live in the gram groups, not in
    rank-contiguous partitions), so no overlap replication is needed."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.shuffle import sorted_positions

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def add_key(t: pa.Table) -> pa.Table:
        keys = [
            re.sub(r"[^a-z]+", " ", (s or "").lower())[:24]
            + "\x01"
            + str(i).zfill(12)
            for s, i in zip(t["text"].to_pylist(), t["doc_id"].to_pylist())
        ]
        return t.append_column("skey", pa.array(keys))

    ranked = sorted_positions(
        ds.map_batches(add_key, batch_format="pyarrow"), "skey", pos_col="rn"
    )

    def explode(t: pa.Table) -> pa.Table:
        gs, rns, ids, szs = [], [], [], []
        for txt, rn, did in zip(
            t["text"].to_pylist(), t["rn"].to_pylist(), t["doc_id"].to_pylist()
        ):
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            for g in grams:
                gs.append(g)
                rns.append(rn)
                ids.append(did)
                szs.append(len(grams))
        return pa.table(
            {
                "g": pa.array(gs),
                "rn": pa.array(rns, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "sz": pa.array(szs, pa.int64()),
            }
        )

    gram_rows = ranked.map_batches(explode, batch_format="pyarrow")

    def window_pairs(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in b.groupby("g", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("rn")
            rn = grp["rn"].to_numpy()
            ids = grp["doc_id"].to_numpy()
            szs = grp["sz"].to_numpy()
            hi = np.searchsorted(rn, rn + SNM_W, side="right")
            lo = np.arange(len(rn)) + 1
            cnt = np.maximum(hi - lo, 0)
            keep = cnt > 0
            if not keep.any():
                continue
            ia = np.repeat(np.arange(len(rn))[keep], cnt[keep])
            jb = np.concatenate(
                [np.arange(l, h) for l, h in zip(lo[keep], hi[keep])]
            )
            a_id, b_id = ids[ia], ids[jb]
            a_sz, b_sz = szs[ia], szs[jb]
            a_first = a_id < b_id
            outs.append(
                pd.DataFrame(
                    {
                        "id_small": np.where(a_first, a_id, b_id),
                        "id_big": np.where(a_first, b_id, a_id),
                        "size_small": np.where(a_first, a_sz, b_sz),
                        "size_big": np.where(a_first, b_sz, a_sz),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "id_small": pd.Series([], dtype="int64"),
                    "id_big": pd.Series([], dtype="int64"),
                    "size_small": pd.Series([], dtype="int64"),
                    "size_big": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    shared = bucketed_groupby(
        gram_rows, "g", window_pairs, expected_rows=n_docs * 60
    )
    pairs = bucketed_groupby(
        shared,
        ["id_small", "id_big"],
        lambda g: g.groupby(["id_small", "id_big"], sort=False)
        .agg(
            n_inter=("size_small", "size"),
            sa=("size_small", "max"),
            sb=("size_big", "max"),
        )
        .reset_index(),
        expected_rows=n_docs * SNM_W,
    )

    out = pairs.to_pandas()
    out["n_union"] = out["sa"] + out["sb"] - out["n_inter"]
    out = out[out["n_inter"] * 2 >= out["n_union"]]
    out = out.rename(columns={"id_small": "id_a", "id_big": "id_b"})
    out = out[["id_a", "id_b", "n_inter", "n_union"]].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Z-order (Morton) storage clustering + zone-map quality audit
# --------------------------------------------------------------------------

ZORDER_FRAG = 64  # rows per storage fragment (zone-map granule)


@query(
    "q146_zorder_layout",
    sql=f"""
    WITH q AS (SELECT event_id, user_id AS x,
                      CAST(ROUND(value * 100) AS BIGINT) AS y FROM events),
    z AS (SELECT event_id, x, y,
            SUM(((x >> i) & 1) * (1::BIGINT << (2*i))
                + ((y >> i) & 1) * (1::BIGINT << (2*i + 1))) AS zc
          FROM q, range(16) t(i) GROUP BY 1, 2, 3),
    rz AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY zc, event_id) AS rn FROM z),
    fz AS (SELECT (rn - 1) // {ZORDER_FRAG} AS frag,
                  MAX(x) - MIN(x) AS dx, MAX(y) - MIN(y) AS dy
           FROM rz GROUP BY 1),
    ri AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY event_id) AS rn FROM q),
    fi AS (SELECT (rn - 1) // {ZORDER_FRAG} AS frag,
                  MAX(x) - MIN(x) AS dx, MAX(y) - MIN(y) AS dy
           FROM ri GROUP BY 1)
    SELECT 'id' AS layout, CAST(COUNT(*) AS BIGINT) AS n_frag,
           CAST(SUM(dx) AS BIGINT) AS sum_dx, CAST(SUM(dy) AS BIGINT) AS sum_dy
    FROM fi
    UNION ALL
    SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(dx) AS BIGINT), CAST(SUM(dy) AS BIGINT) FROM fz
    ORDER BY layout
    """,
)
def q146_zorder_layout(sf_dir: str):
    """Z-order (Morton-curve) storage clustering — the multi-dimension
    sibling of q78's similarity order: interleaving the bits of two query
    dimensions (user, value-cents) and sorting by the interleave packs
    rows that are close in BOTH dimensions into the same storage
    fragment, so zone maps (per-fragment min/max, the q133/q134 pruning
    structure) cut 2-D range scans instead of only the leading sort key.
    One sort (the unavoidable exchange) + sorted_positions ranks; the
    audit compares per-{ZORDER_FRAG}-row fragment bounding boxes under
    the z-order vs the naive id layout — fragment-count-sized exchange,
    bit-exact integer Morton codes on both engines."""
    from texrex_ray.ops.shuffle import sorted_positions

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (
            pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        zc = np.zeros(len(x), dtype=np.int64)
        for i in range(16):
            zc += ((x >> i) & 1) << (2 * i)
            zc += ((y >> i) & 1) << (2 * i + 1)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "zkey": pa.array(
                    [f"{z:012d}:{e:012d}" for z, e in zip(zc, eid)]
                ),
                "ikey": pa.array([f"{e:012d}" for e in eid]),
            }
        )

    base = ds.map_batches(derive, batch_format="pyarrow")

    def frag_stats(layout: str, key: str) -> pd.DataFrame:
        ranked = sorted_positions(
            base.select_columns([key, "x", "y"]), key, pos_col="rn"
        )

        def to_frag(t: pa.Table) -> pa.Table:
            rn = t["rn"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "frag": pa.array((rn - 1) // ZORDER_FRAG, pa.int64()),
                    "x": t["x"],
                    "y": t["y"],
                }
            )

        f = (
            ranked.map_batches(to_frag, batch_format="pyarrow")
            .groupby("frag")
            .aggregate(
                Min("x", alias_name="x_lo"), Max("x", alias_name="x_hi"),
                Min("y", alias_name="y_lo"), Max("y", alias_name="y_hi"),
            )
            .to_pandas()
        )
        return pd.DataFrame(
            {
                "layout": [layout],
                "n_frag": [len(f)],
                "sum_dx": [int((f["x_hi"] - f["x_lo"]).sum())],
                "sum_dy": [int((f["y_hi"] - f["y_lo"]).sum())],
            }
        )

    out = pd.concat(
        [frag_stats("id", "ikey"), frag_stats("zorder", "zkey")],
        ignore_index=True,
    ).astype({"n_frag": "int64", "sum_dx": "int64", "sum_dy": "int64"})
    return out.sort_values("layout").reset_index(drop=True)


# --------------------------------------------------------------------------
# DBSCAN over embeddings (eps-cosine density clustering)
# --------------------------------------------------------------------------

DBSCAN_SCALE = 1000       # embedding quantization (int64-exact dot products)
DBSCAN_NUM, DBSCAN_DEN = 7, 20  # eps: cosine >= 7/20 = 0.35
DBSCAN_MINPTS = 4         # core point: >= 4 eps-neighbors (excluding self)


@query(
    "q147_embed_dbscan",
    sql=f"""
    WITH RECURSIVE
    le AS (SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                                 x -> round(x * {DBSCAN_SCALE})) v
           FROM embeddings),
    pe AS (SELECT a.vec_id ia, b.vec_id ib
           FROM le a JOIN le b ON a.vec_id < b.vec_id
           WHERE list_dot_product(a.v, b.v) > 0
             AND {DBSCAN_DEN * DBSCAN_DEN}
                 * CAST(list_dot_product(a.v, b.v) AS HUGEINT)
                 * CAST(list_dot_product(a.v, b.v) AS HUGEINT)
                 >= {DBSCAN_NUM * DBSCAN_NUM}
                 * CAST(list_dot_product(a.v, a.v) AS HUGEINT)
                 * CAST(list_dot_product(b.v, b.v) AS HUGEINT)),
    edges AS (SELECT ia a, ib b FROM pe UNION ALL SELECT ib, ia FROM pe),
    deg AS (SELECT a AS vec_id, COUNT(*) d FROM edges GROUP BY 1),
    core AS (SELECT vec_id FROM deg WHERE d >= {DBSCAN_MINPTS}),
    cedges AS (SELECT e.a, e.b FROM edges e
               JOIN core x ON x.vec_id = e.a JOIN core y ON y.vec_id = e.b),
    reach(node, r) AS (SELECT vec_id, vec_id FROM core
                       UNION
                       SELECT c.b, r.r FROM reach r JOIN cedges c ON c.a = r.node),
    clab AS (SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    border AS (SELECT e.a AS vec_id, MIN(cl.cluster_id) AS cluster_id
               FROM edges e JOIN clab cl ON cl.vec_id = e.b
               WHERE e.a NOT IN (SELECT vec_id FROM core) GROUP BY e.a)
    SELECT v.vec_id,
           CAST(COALESCE(cl.cluster_id, bo.cluster_id, -1) AS BIGINT) AS cluster_id,
           CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
                WHEN bo.vec_id IS NOT NULL THEN 'border' ELSE 'noise' END AS role
    FROM embeddings v LEFT JOIN clab cl ON cl.vec_id = v.vec_id
    LEFT JOIN border bo ON bo.vec_id = v.vec_id
    ORDER BY v.vec_id
    """,
)
def q147_embed_dbscan(sf_dir: str):
    """DBSCAN over the embedding column — density clustering as the
    noise-aware alternative to q69's k-means and q106's SemDeDup: dense
    regions become clusters, isolated vectors stay 'noise' instead of
    being forced into a nearest centroid.  Deterministic variant: border
    points take the MIN cluster label among their core neighbors (classic
    DBSCAN is visit-order-dependent there).  Plan: eps-pairs via the q16
    blockwise pass (block refs stream from the object store, per-task
    memory = batch + block); degrees and components are pair-graph-sized
    (dedup/clusters.py's driver plan with the documented distributed
    fallback).  Embeddings quantize to {DBSCAN_SCALE}ths so every dot
    product is int64-exact and the eps test (cos ≥ {DBSCAN_NUM}/{DBSCAN_DEN})
    is pure integer arithmetic on BOTH engines — no float threshold."""
    from texrex_ray.dedup.clusters import dup_clusters
    from texrex_ray.dedup.embed import _matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    proj = ds.materialize()
    refs_ref = ray.put(proj.to_arrow_refs())

    def quant(m: np.ndarray) -> np.ndarray:
        s = m.astype(np.float64) * DBSCAN_SCALE
        # DuckDB round() is half-away-from-zero; np.round is banker's
        return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)

    d2 = DBSCAN_DEN * DBSCAN_DEN
    n2 = DBSCAN_NUM * DBSCAN_NUM

    def eps_pairs(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = quant(_matrix(t, "embedding"))
        na2 = (m * m).sum(axis=1)
        out_a, out_b = [], []
        for ref in ray.get(refs_ref):
            blk = ray.get(ref)
            if blk.num_rows == 0:
                continue
            bids = blk["vec_id"].to_numpy(zero_copy_only=False)
            bm = quant(_matrix(blk, "embedding"))
            nb2 = (bm * bm).sum(axis=1)
            dot = m @ bm.T  # int64-exact: |dot| <= dim * SCALE^2 * max|x|^2
            ok = (dot > 0) & (
                d2 * dot * dot >= n2 * na2[:, None] * nb2[None, :]
            ) & (ids[:, None] < bids[None, :])
            ai, bj = np.nonzero(ok)
            out_a.append(ids[ai])
            out_b.append(bids[bj])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    pairs = proj.map_batches(eps_pairs, batch_format="pyarrow").materialize()

    # degrees: pair-graph-sized (result set of the eps join)
    pdf = pairs.to_pandas()
    deg = (
        pd.concat([pdf["id_a"], pdf["id_b"]])
        .value_counts()
        .rename_axis("vec_id")
        .rename("d")
    )
    core = set(deg[deg >= DBSCAN_MINPTS].index)

    core_pairs = pdf[pdf["id_a"].isin(core) & pdf["id_b"].isin(core)]
    if len(core_pairs):
        clab = dup_clusters(
            ray.data.from_pandas(core_pairs.reset_index(drop=True))
        ).set_index("doc_id")["cluster_id"]
    else:
        clab = pd.Series(dtype="int64")
    # isolated core points (no core neighbor) form singleton clusters
    for c in core:
        if c not in clab.index:
            clab.loc[c] = c

    # border: non-core with >= 1 core neighbor -> min core cluster label
    mask_a = pdf["id_a"].isin(core) & ~pdf["id_b"].isin(core)
    mask_b = pdf["id_b"].isin(core) & ~pdf["id_a"].isin(core)
    bor = pd.concat(
        [
            pd.DataFrame(
                {"vec_id": pdf.loc[mask_a, "id_b"],
                 "cl": clab.loc[pdf.loc[mask_a, "id_a"]].to_numpy()}
            ),
            pd.DataFrame(
                {"vec_id": pdf.loc[mask_b, "id_a"],
                 "cl": clab.loc[pdf.loc[mask_b, "id_b"]].to_numpy()}
            ),
        ],
        ignore_index=True,
    )
    border = bor.groupby("vec_id")["cl"].min() if len(bor) else pd.Series(dtype="int64")

    core_ref = ray.put(clab.to_dict())
    border_ref = ray.put(border.to_dict())

    def label(t: pa.Table) -> pa.Table:
        cm, bm = ray.get(core_ref), ray.get(border_ref)
        ids = t["vec_id"].to_pylist()
        cl, role = [], []
        for i in ids:
            if i in cm:
                cl.append(int(cm[i])); role.append("core")
            elif i in bm:
                cl.append(int(bm[i])); role.append("border")
            else:
                cl.append(-1); role.append("noise")
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cl, pa.int64()),
                "role": pa.array(role),
            }
        )

    out = ds.select_columns(["vec_id"]).map_batches(label, batch_format="pyarrow")
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Per-source token-distribution divergence (chi-square audit)
# --------------------------------------------------------------------------

CHI2_SCALE = 1_000_000


@query(
    "q148_source_divergence",
    sql=f"""
    WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                 FROM documents),
    c AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) n FROM tok GROUP BY 1, 2),
    ms AS (SELECT source, SUM(n) ns FROM c GROUP BY 1),
    mt AS (SELECT t, SUM(n) nt FROM c GROUP BY 1),
    tot AS (SELECT SUM(n) nn FROM c),
    cells AS (SELECT ms.source, ms.ns, mt.nt, COALESCE(c.n, 0) AS n
              FROM ms CROSS JOIN mt
              LEFT JOIN c ON c.source = ms.source AND c.t = mt.t),
    term AS (SELECT source,
               (CAST(n AS HUGEINT) * nn - CAST(ns AS HUGEINT) * nt)
               * (CAST(n AS HUGEINT) * nn - CAST(ns AS HUGEINT) * nt)
               * {CHI2_SCALE}
               // (CAST(ns AS HUGEINT) * nt * nn) AS v
             FROM cells, tot)
    SELECT source, CAST(SUM(v) AS BIGINT) AS chi2_c
    FROM term GROUP BY source ORDER BY source
    """,
)
def q148_source_divergence(sf_dir: str):
    """Which sources' token distributions diverge from the corpus —
    the contamination/drift tripwire a mixture pipeline (q60/q71) checks
    before re-weighting: per-source Pearson chi-square against the global
    unigram distribution, including zero cells (a source MISSING a common
    token is evidence too).  Exchange shape: per-batch combiner counts →
    one (source, token) groupby of cell-cardinality rows; marginals and
    the |sources| × |vocab| contingency finish are cell-sized, never
    corpus-sized.  Per-cell terms floor in integer arithmetic
    (HUGEINT / Python int) so both engines sum identical integers."""
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
                "t": pa.array([k[1] for k in ks]),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    cells = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "t"],
        lambda g: g.groupby(["source", "t"], sort=False)["n"].sum().reset_index(),
        expected_rows=ds.count() * 4,
    ).to_pandas()

    pivot = cells.pivot_table(
        index="source", columns="t", values="n", fill_value=0, aggfunc="sum"
    )
    ns = pivot.sum(axis=1)
    nt = pivot.sum(axis=0)
    nn = int(ns.sum())
    out = []
    for src in pivot.index:
        s_ns = int(ns[src])
        chi = 0
        row = pivot.loc[src]
        for tok in pivot.columns:
            n = int(row[tok])
            t_nt = int(nt[tok])
            d = n * nn - s_ns * t_nt
            chi += d * d * CHI2_SCALE // (s_ns * t_nt * nn)
        out.append((src, chi))
    df = pd.DataFrame(out, columns=["source", "chi2_c"]).astype({"chi2_c": "int64"})
    return df.sort_values("source").reset_index(drop=True)


# --------------------------------------------------------------------------
# Audio fingerprint near-dup (energy-delta signature + Hamming radius)
# --------------------------------------------------------------------------

AUDIO_FP_TWIN = 10_000  # twin clip id = original id + this offset


@query(
    "q149_audio_fingerprint",
    sql="SELECT id_a, id_b, hamming FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/audio_fp_pairs_sf0.01.parquet') "
    "ORDER BY id_a, id_b",
)
def q149_audio_fingerprint(sf_dir: str):
    """Audio near-dup detection — the audio sibling of q57's image pHash:
    each clip decodes to PCM in an actor-pool stage and reduces to a
    64-bit energy-delta fingerprint (stages/av.py::audio_fingerprint),
    whose bit ORDERING survives lossy re-encoding; pairs within Hamming
    ≤ 2 come out of the same complete pigeonhole block-LSH that serves
    SimHash and pHash (dedup/lsh.py::hamming_pairs — signatures are the
    only thing that shuffles, never PCM).  Each clip is planted a lossy
    re-encode twin (id + 10000) the search must recover.  Oracle:
    committed fixture from regenerated PCM + published formula +
    brute-force O(n²) scan — independent of codec, stage, and LSH."""
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.sources.av import fixture_path as av_fixture
    from texrex_ray.stages.av import AudioFingerprint

    n_aud, _ = _av_n(sf_dir)
    d = av_fixture(n=n_aud, seed=42)
    ds = ray.data.read_parquet(f"{d}/audio.parquet")
    sigs = ds.map_batches(
        AudioFingerprint(twin_offset=AUDIO_FP_TWIN),
        batch_format="pyarrow",
        batch_size=64,
    )
    pairs = hamming_pairs(
        sigs, id_col="clip_id", sig_col="simhash", max_hamming=2,
        expected_rows=2 * n_aud, expected_pairs=2 * n_aud,
    )
    out = pairs.to_pandas().astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Phrase search (positional postings intersection)
# --------------------------------------------------------------------------

PHRASE = ("hash", "join")


@query(
    "q150_phrase_search",
    sql=f"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') t
                  FROM documents),
    seq AS (SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t)+1)) AS pos
            FROM toks)
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase
    FROM seq a JOIN seq b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
    GROUP BY 1 ORDER BY n_phrase DESC, a.doc_id
    """,
)
def q150_phrase_search(sf_dir: str):
    """Phrase query ("{PHRASE[0]} {PHRASE[1]}") — the positional
    half of retrieval that q99's inverted index (df/tf postings) cannot
    answer: occurrences must be ADJACENT.  Positions of both terms live
    inside each document row, so the intersection (pos+1 matching) is
    doc-local numpy — zero exchange, the embarrassingly-parallel shape
    positional-postings intersection compiles to when documents are the
    partition unit.  Only matching (doc_id, count) rows leave the scan."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    w0, w1 = PHRASE

    def scan(t: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _TOKEN_RE.findall((s or "").lower())
            a = np.fromiter(
                (i for i, w in enumerate(toks) if w == w0), dtype=np.int64
            )
            if not len(a):
                continue
            b = {i for i, w in enumerate(toks) if w == w1}
            n = int(sum(1 for i in a if i + 1 in b))
            if n:
                ids.append(did)
                ns.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n_phrase": pa.array(ns, pa.int64())}
        )

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    return out.sort_values(["n_phrase", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )


# --------------------------------------------------------------------------
# Cohort retention (weekly cohorts × activity offsets)
# --------------------------------------------------------------------------

WEEK_US = 7 * 86_400 * 1_000_000


@query(
    "q151_cohort_retention",
    sql=f"""
    WITH w AS (SELECT user_id, CAST(epoch_us(ts) // {WEEK_US} AS BIGINT) AS wk
               FROM events GROUP BY 1, 2),
    c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY 1)
    SELECT c.cohort, w.wk - c.cohort AS offset_wk,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM w JOIN c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q151_cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix — the growth-accounting view of any
    event stream (and of a recrawl log: hosts first seen in week W still
    being fetched k weeks later).  Both the cohort (a user's FIRST active
    week) and the offsets are per-user facts, so the whole matrix needs
    ONE user-keyed exchange: batches compress to distinct (user, week)
    partials in place, the bucketed combine dedups, takes min-week per
    user and emits (cohort, offset) rows — one per retained user-week —
    and the finish is a cohort×offset-sized sum, independent of event
    volume.  Weeks are integer epoch-microsecond floors (shared formula
    with the oracle), so bucketing is engine-invariant."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "wk": df["ts"].astype("int64") // WEEK_US,
            }
        )
        return out.drop_duplicates()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        cohort = df.groupby("user_id", sort=False)["wk"].transform("min")
        rows = pd.DataFrame(
            {"cohort": cohort, "offset_wk": df["wk"] - cohort}
        )
        return (
            rows.groupby(["cohort", "offset_wk"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )

    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "user_id",
            combine,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["cohort", "offset_wk"], as_index=False)["n_users"]
        .sum()
        .sort_values(["cohort", "offset_wk"])
        .reset_index(drop=True)
    )
    for c in ("cohort", "offset_wk", "n_users"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Grouped Gini concentration (histogram-exact, ppm)
# --------------------------------------------------------------------------

GINI_SCALE = 1_000_000

_GINI_SQL = f"""
WITH ucnt AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
r AS (SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(x) OVER (PARTITION BY event_type) AS s
      FROM ucnt)
SELECT event_type,
       CAST((2 * SUM(i * x) - (MAX(n) + 1) * MAX(s)) * {GINI_SCALE}
            // (MAX(n) * MAX(s)) AS BIGINT) AS gini_ppm,
       CAST(MAX(n) AS BIGINT) AS n_users
FROM r GROUP BY 1 ORDER BY 1
"""


@query("q152_grouped_gini", sql=_GINI_SQL)
def q152_grouped_gini(sf_dir: str):
    """Per-event-type Gini coefficient of user activity — the inequality
    gauge a mixture pipeline reads before capping dominant contributors
    (and a crawl reads over per-host fetch counts to see frontier
    concentration).  Gini is a pure function of the per-group VALUE
    HISTOGRAM: with multiplicities m at ascending value v, the rank sum
    Σ i·x_i telescopes to Σ v·(m·c_prev + m(m+1)/2), so the plan is
    q113's: per-batch (type, user) count partials → ONE user-keyed
    exchange to finish per-user totals and fold them into (type, value)
    histograms → a histogram-sized finish.  Rank ties carry equal
    values, so Σ i·x_i is tie-order-invariant and the ppm result is
    integer-exact against the window-function oracle (numerator ≥ 0 by
    the Chebyshev sum inequality, so floor == truncate)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["event_type", "user_id"], sort=False)
            .size()
            .rename("x")
            .reset_index()
        )

    def to_hist(df: pd.DataFrame) -> pd.DataFrame:
        tot = (
            df.groupby(["event_type", "user_id"], sort=False)["x"]
            .sum()
            .reset_index()
        )
        return (
            tot.groupby(["event_type", "x"], sort=False)
            .size()
            .rename("m")
            .reset_index()
        )

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "user_id",
            to_hist,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["event_type", "x"], as_index=False)["m"]
        .sum()
    )

    rows = []
    for et, sub in hist.groupby("event_type", sort=True):
        sub = sub.sort_values("x")
        n = s = s1 = 0
        for v, m in zip(sub["x"], sub["m"]):
            v, m = int(v), int(m)
            # ranks c_prev+1 .. c_prev+m each hold value v
            s1 += v * (m * n + m * (m + 1) // 2)
            n += m
            s += v * m
        gini = (2 * s1 - (n + 1) * s) * GINI_SCALE // (n * s)
        rows.append({"event_type": et, "gini_ppm": gini, "n_users": n})
    out = pd.DataFrame(rows)
    for c in ("gini_ppm", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# --------------------------------------------------------------------------
# Prefix-filtering set-similarity self-join (AllPairs / PPJoin)
# --------------------------------------------------------------------------

_SETJOIN_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') ts
           FROM documents),
g AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS tok
      FROM t, unnest(range(1, len(ts) - 1)) AS u(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS i
          FROM g a JOIN g b USING (tok) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, i AS n_inter,
       CAST(sa.sz + sb.sz - i AS BIGINT) AS n_union
FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
WHERE 2 * i >= (sa.sz + sb.sz - i)
ORDER BY id_a, id_b
"""


@query("q153_prefix_setjoin", sql=_SETJOIN_SQL)
def q153_prefix_setjoin(sf_dir: str):
    """Set-similarity self-join with PREFIX FILTERING (Bayardo et al.
    2007 / PPJoin, Xiao et al. 2008) — the candidate-bounded alternative
    to q14's all-grams exchange: each document's distinct word-3-gram
    set exchanges only its rarest |x|−⌈t·|x|⌉+1 elements (global
    ascending-df order), complete by the prefix-overlap theorem; the
    exact integer threshold 2·|∩| ≥ |∪| (J ≥ 0.5) is verified on
    result-bounded candidate sets.  dedup/setjoin.py carries the plan:
    vocab-sized df exchange → doc-local prefix emit → element-keyed
    bucketed exchange with loud hot-key guard → pair-keyed dedup →
    broadcast-sets verify.  Oracle: brute-force all-pairs SQL —
    equality proves the prefix filter dropped nothing."""
    from texrex_ray.dedup.setjoin import prefix_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def to_sets(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = _TOKEN_RE.findall((txt or "").lower())
            grams = sorted(
                {f"{a} {b} {c}" for a, b, c in zip(ws, ws[1:], ws[2:])}
            )
            ids.append(did)
            toks.append(grams)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "toks": pa.array(toks, pa.list_(pa.string())),
            }
        )

    sets = ds.map_batches(to_sets, batch_format="pyarrow")
    return prefix_jaccard_pairs(
        sets, id_col="doc_id", set_col="toks", threshold=(1, 2),
        expected_rows=n_docs * 40,
    )


# --------------------------------------------------------------------------
# Product-quantization ANN (PQ codes + ADC top-k)
# --------------------------------------------------------------------------

@query(
    "q154_pq_adc_topk",
    sql="SELECT query_id, neighbor_id, adc_dist, rank FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/pq_adc_sf0.01.parquet') "
    "ORDER BY query_id, rank",
)
def q154_pq_adc_topk(sf_dir: str):
    """Product quantization (Jégou et al. 2011) — the vector-COMPRESSION
    member of the ANN family (q15 brute, q19 SRP-LSH, q36 IVF): vectors
    compress to m=8 one-byte codes against per-subspace codebooks, and
    queries score codes with an Asymmetric Distance Computation table
    (m×ks integer lookups per vector).  Training, encode, and ADC are
    ALL integer-exact (scale ×1e6, floor-mean k-means with lowest-index
    ties, int64 distance sums), so the committed fixture from the
    pure-Python sequential twin (dedup/pq.py::pq_sequential) pins every
    code and every rank — not just "close" recall.  Codebooks broadcast
    once; encode + scoring are stateless zero-copy map_batches with
    per-batch partial top-k; the corpus never shuffles."""
    from texrex_ray.dedup.pq import pq_adc_topk, pq_encode, pq_train

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, ks=16, iters=5)
    codes = pq_encode(ds, books)

    qdf = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(8))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    queries = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(qdf["vec_id"], qdf["embedding"])
    }
    return pq_adc_topk(codes, books, queries, k=10)


# --------------------------------------------------------------------------
# KMV theta-sketch cross-corpus intersection (the estimate HLL cannot give)
# --------------------------------------------------------------------------

_KMV_INTER_SQL = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') t
              FROM documents),
g AS (SELECT DISTINCT doc_id % 2 AS side, array_to_string(t[i:i+2], ' ') AS tok
      FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
h AS (SELECT DISTINCT side, md5_number_lower(tok) AS hk FROM g),
u AS (SELECT hk, CAST(COUNT(*) AS BIGINT) AS ns FROM h GROUP BY hk),
r AS (SELECT hk, ns, ROW_NUMBER() OVER (ORDER BY hk) AS rn FROM u),
th AS (SELECT hk AS theta FROM r WHERE rn = {KMV_K})
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE ns = 2) AS n_exact_inter,
       CAST(COALESCE(
         (SELECT (SELECT COUNT(*) FROM r WHERE r.ns = 2 AND r.hk < th.theta)::HUGEINT
                 * 18446744073709551616::HUGEINT // th.theta::HUGEINT
          FROM th),
         (SELECT COUNT(*) FROM u WHERE ns = 2)) AS BIGINT) AS kmv_inter_est
"""


@query("q155_kmv_intersection", sql=_KMV_INTER_SQL)
def q155_kmv_intersection(sf_dir: str):
    """Cross-corpus overlap from theta sketches — the INTERSECTION
    estimate q144 documents as KMV's edge over HLL (q48), closed:
    split the corpus into deterministic halves (doc parity), sketch each
    side's distinct 3-grams, and estimate |A∩B| as
    ``n_both_below_theta · 2⁶⁴ // θ`` with θ the {KMV_K}-th smallest
    union hash — the same estimator family as q144's distinct count, so
    the two compose.  Exchange: per-batch distinct (side, hash) partials
    → ONE hash-keyed bucketed exchange whose combine emits only a
    per-bucket bottom-{KMV_K} candidate list plus a both-sides counter
    (the exact audit column rides the same exchange); the driver merge
    is buckets × {KMV_K} rows.  md5_lower64 ≡ md5_number_lower keeps the
    integers bit-equal across engines."""
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        seen: set = set()
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            side = int(did) % 2
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if grams:
                for hk in md5_lower64(sorted(grams)):
                    seen.add((side, int(hk)))
        if not seen:
            return pa.table({"side": pa.array([], pa.int8()),
                             "hk": pa.array([], pa.uint64())})
        sides, hks = zip(*sorted(seen))
        return pa.table({"side": pa.array(sides, pa.int8()),
                         "hk": pa.array(hks, pa.uint64())})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per = g.drop_duplicates().groupby("hk")["side"].nunique()
        hk = per.index.to_numpy().astype(np.uint64)
        both = (per.to_numpy() == 2).astype(np.int8)
        n_inter = int(both.sum())
        order = np.argsort(hk)[:KMV_K]  # bucket bottom-k candidates
        out = pd.DataFrame({
            "hk": hk[order], "both": both[order],
            "cnt_inter": np.zeros(len(order), np.int64),
        })
        if len(out):
            out.iloc[0, out.columns.get_loc("cnt_inter")] = n_inter
        return out

    rows = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), "hk", combine,
        expected_rows=ds.count() * 40,
    ).to_pandas()

    n_exact = int(rows["cnt_inter"].sum())
    hk = rows["hk"].to_numpy().astype(np.uint64)
    order = np.argsort(hk)
    hk_sorted = hk[order]
    both_sorted = rows["both"].to_numpy()[order]
    if len(hk_sorted) >= KMV_K:
        theta = int(hk_sorted[KMV_K - 1])
        n_both_below = int(both_sorted[: KMV_K - 1].sum())
        est = (n_both_below << 64) // theta
    else:
        est = n_exact
    return pd.DataFrame(
        {"n_exact_inter": [n_exact], "kmv_inter_est": [est]}
    ).astype("int64")


# --------------------------------------------------------------------------
# Event-transition matrix (first-order Markov behavior model)
# --------------------------------------------------------------------------

PPM = 1_000_000

_TRANS_SQL = f"""
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_type AS from_type, nxt AS to_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*)::HUGEINT * {PPM}
            // SUM(COUNT(*)) OVER (PARTITION BY event_type)::HUGEINT
            AS BIGINT) AS p_ppm
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q156_event_transitions", sql=_TRANS_SQL)
def q156_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event
    sequences — the behavior model under session analysis (and the
    state-machine view of a crawl log: fetch→redirect→fetch…).
    Successor pairs are a per-user fact, so ONE user-keyed bucketed
    exchange suffices: each bucket sorts its users' events (ts, then
    event_id for deterministic ties), shifts within user, and emits
    (from, to) count partials; the finish is a |types|²-sized sum with
    integer ppm row-normalization (HUGEINT twin) — event volume never
    reaches the driver."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = df.groupby("user_id", sort=False)["event_type"].shift(-1)
        keep = nxt.notna()
        pairs = pd.DataFrame(
            {"from_type": df["event_type"][keep], "to_type": nxt[keep]}
        )
        return (
            pairs.groupby(["from_type", "to_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    mat = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .groupby(["from_type", "to_type"], as_index=False)["n"]
        .sum()
    )
    tot = mat.groupby("from_type")["n"].transform("sum")
    mat["p_ppm"] = [
        int(n) * PPM // int(t) for n, t in zip(mat["n"], tot)
    ]
    for c in ("n", "p_ppm"):
        mat[c] = mat[c].astype("int64")
    return mat.sort_values(["from_type", "to_type"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankings (hybrid search)
# --------------------------------------------------------------------------

RRF_K = 60
RRF_TOPK = 5

_RRF_SQL = f"""
WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 8),
s AS (SELECT q.qid, e.vec_id nid,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) sim
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
cosr AS (SELECT qid AS query_id, nid AS neighbor_id,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, nid ASC) AS r
         FROM s QUALIFY r <= 10),
adcr AS (SELECT query_id, neighbor_id, rank AS r FROM
         read_parquet('/root/repo/tests/fixtures/oracle/pq_adc_sf0.01.parquet')),
fused AS (SELECT COALESCE(c.query_id, a.query_id) AS query_id,
                 COALESCE(c.neighbor_id, a.neighbor_id) AS neighbor_id,
                 COALESCE(1000000 // ({RRF_K} + c.r), 0)
                 + COALESCE(1000000 // ({RRF_K} + a.r), 0) AS rrf_score
          FROM cosr c FULL OUTER JOIN adcr a
          ON a.query_id = c.query_id AND a.neighbor_id = c.neighbor_id)
SELECT query_id, neighbor_id, CAST(rrf_score AS BIGINT) AS rrf_score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, neighbor_id ASC) AS rank
FROM fused QUALIFY rank <= {RRF_TOPK} ORDER BY query_id, rank
"""


@query("q157_rrf_fusion", sql=_RRF_SQL)
def q157_rrf_fusion(sf_dir: str):
    """Hybrid-retrieval fusion: reciprocal-rank fusion (Cormack et al.
    2009) of the EXACT cosine top-10 (q15's brute-force path) with the
    COMPRESSED PQ/ADC top-10 (q154's path) — the standard way a serving
    stack combines a cheap compressed index with an exact re-scorer
    without comparing incommensurable scores.  RRF uses ranks only
    (score = Σ 1e6//(60+rank), integer), so float cosine never crosses
    engines; the fusion itself is a result-sized pandas merge on the
    driver — both rankings are k×queries rows by construction."""
    from texrex_ray.dedup.embed import knn_bruteforce
    from texrex_ray.dedup.pq import pq_adc_topk, pq_encode, pq_train

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cos = knn_bruteforce(ds, query_ids=list(range(8)), k=10)

    books = pq_train(ds, m=8, ks=16, iters=5)
    codes = pq_encode(ds, books)
    qdf = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(8))),
        batch_format="pyarrow",
    ).to_pandas()
    adc = pq_adc_topk(
        codes, books,
        {int(i): np.asarray(v, np.float64)
         for i, v in zip(qdf["vec_id"], qdf["embedding"])},
        k=10,
    )

    merged = cos[["query_id", "neighbor_id", "rank"]].merge(
        adc[["query_id", "neighbor_id", "rank"]],
        on=["query_id", "neighbor_id"], how="outer", suffixes=("_c", "_a"),
    )

    def _score(r) -> int:
        s = 0
        if pd.notna(r["rank_c"]):
            s += PPM // (RRF_K + int(r["rank_c"]))
        if pd.notna(r["rank_a"]):
            s += PPM // (RRF_K + int(r["rank_a"]))
        return s

    merged["rrf_score"] = merged.apply(_score, axis=1)
    merged = merged.sort_values(
        ["query_id", "rrf_score", "neighbor_id"],
        ascending=[True, False, True],
    )
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    out = merged[merged["rank"] <= RRF_TOPK].reset_index(drop=True)
    for c in ("query_id", "neighbor_id", "rrf_score", "rank"):
        out[c] = out[c].astype("int64")
    return out[["query_id", "neighbor_id", "rrf_score", "rank"]]


# --------------------------------------------------------------------------
# Co-citation host similarity (hosts sharing link targets)
# --------------------------------------------------------------------------

COCITE_CAP = 50  # dst pages cited by more hosts are skipped (tender's cap)

_COCITE_SQL = f"""
WITH e AS (SELECT regexp_extract(src, '^https?://([^/]+)', 1) AS h, dst
           FROM read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')),
d AS (SELECT DISTINCT h, dst FROM e),
grp AS (SELECT dst FROM d GROUP BY dst
        HAVING COUNT(*) BETWEEN 2 AND {COCITE_CAP}),
pairs AS (SELECT a.h AS host_a, b.h AS host_b
          FROM d a JOIN d b USING (dst) JOIN grp USING (dst)
          WHERE a.h < b.h)
SELECT host_a, host_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 3
ORDER BY host_a, host_b
"""


@query("q158_cocitation", sql=_COCITE_SQL)
def q158_cocitation(sf_dir: str):
    """Co-citation similarity over the crawl graph (Small 1973 lifted to
    hosts): two hosts are related when many pages cite targets in
    common — the inbound complement of q118's direct host-pair counts
    and the classic related-sites signal.  Plan is tender's: distinct
    (dst, src_host) rows → ONE dst-keyed bucketed exchange generating
    C(n,2) host pairs only for dst groups of 2..{COCITE_CAP} (the
    redundancy cap kills hub skew — a page cited by every host carries
    no signal) → pair-keyed count exchange, n_shared ≥ 3.  Input is the
    committed crawl edge fixture q70/q129 share."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    n_edges = edges.count()

    def hostify(df: pd.DataFrame) -> pd.DataFrame:
        h = df["src"].str.extract(r"^https?://([^/]+)", expand=False)
        return pd.DataFrame({"h": h, "dst": df["dst"]}).drop_duplicates()

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for dst, sub in g.groupby("dst", sort=False):
            hs = np.sort(sub["h"].unique())
            n = len(hs)
            if n < 2 or n > COCITE_CAP:
                continue
            ia, ib = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"host_a": hs[ia], "host_b": hs[ib]}))
        if not outs:
            return pd.DataFrame({"host_a": pd.Series([], dtype=object),
                                 "host_b": pd.Series([], dtype=object)})
        return pd.concat(outs)

    pairs = bucketed_groupby(
        edges.map_batches(hostify, batch_format="pandas"),
        "dst", group_pairs, expected_rows=n_edges,
    )
    counts = bucketed_groupby(
        pairs, ["host_a", "host_b"],
        lambda g: g.groupby(["host_a", "host_b"], sort=False)
        .size().rename("n_shared").reset_index(),
        expected_rows=n_edges * 4,
    ).to_pandas()
    counts = (
        counts.groupby(["host_a", "host_b"], as_index=False)["n_shared"].sum()
    )
    out = counts[counts["n_shared"] >= 3].sort_values(
        ["host_a", "host_b"]
    ).reset_index(drop=True)
    out["n_shared"] = out["n_shared"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Lexical concentration per source (Herfindahl / Simpson, rational-exact)
# --------------------------------------------------------------------------

_HHI_SQL = f"""
WITH toks AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
              FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2)
SELECT source,
       CAST(SUM(n * n)::HUGEINT * {PPM} // (SUM(n)::HUGEINT * SUM(n)::HUGEINT)
            AS BIGINT) AS hhi_ppm,
       CAST((SUM(n)::HUGEINT * SUM(n)::HUGEINT - SUM(n * n)::HUGEINT) * {PPM}
            // (SUM(n)::HUGEINT * SUM(n)::HUGEINT) AS BIGINT) AS simpson_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_types
FROM c GROUP BY source ORDER BY source
"""


@query("q159_lexical_hhi", sql=_HHI_SQL)
def q159_lexical_hhi(sf_dir: str):
    """Lexical concentration per source: Herfindahl–Hirschman index
    Σ(nᵢ/N)² and Simpson diversity 1−HHI — the RATIONAL concentration
    measures (no logs, so integer-exact where Shannon entropy cannot
    be) that flag template-dominated sources next to q148's χ² and
    q152's Gini.  Per-batch (source, token) combiner counts → one
    cell-cardinality exchange; Σn and Σn² are per-source ints, the ppm
    finish is pure integer division (HUGEINT twin)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt: Counter = Counter()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in _TOKEN_RE.findall((txt or "").lower()):
                cnt[(src, tok)] += 1
        ks = list(cnt.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks]),
            "tok": pa.array([k[1] for k in ks]),
            "n": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    cells = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "tok"],
        lambda g: g.groupby(["source", "tok"], sort=False)["n"].sum().reset_index(),
        expected_rows=ds.count() * 4,
    ).to_pandas()

    rows = []
    for src, sub in cells.groupby("source", sort=True):
        n = sub["n"].to_numpy()
        tot = int(n.sum())
        sq = int((n.astype(object) ** 2).sum())  # python ints, no wrap
        hhi = sq * PPM // (tot * tot)
        simpson = (tot * tot - sq) * PPM // (tot * tot)
        rows.append({"source": src, "hhi_ppm": hhi,
                     "simpson_ppm": simpson, "n_types": len(sub)})
    out = pd.DataFrame(rows)
    for c in ("hhi_ppm", "simpson_ppm", "n_types"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# --------------------------------------------------------------------------
# Inter-arrival burstiness per user (CV² of gaps, integer-exact)
# --------------------------------------------------------------------------

_BURST_SQL = f"""
WITH g AS (SELECT user_id,
                  (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id)))
                  // 1000000 AS gap_s
           FROM events),
a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_s) AS BIGINT) AS sum_s,
             SUM(gap_s::HUGEINT * gap_s::HUGEINT) AS sum_s2
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1 HAVING SUM(gap_s) > 0)
SELECT user_id, n_gaps,
       CAST((n_gaps::HUGEINT * sum_s2 - sum_s::HUGEINT * sum_s::HUGEINT) * {PPM}
            // (sum_s::HUGEINT * sum_s::HUGEINT) AS BIGINT) AS cv2_ppm
FROM a ORDER BY user_id
"""


@query("q160_burstiness", sql=_BURST_SQL)
def q160_burstiness(sf_dir: str):
    """Inter-arrival burstiness per user: CV² = Var/Mean² of the gaps
    between consecutive events (Poisson ⇒ ≈1, bursty ⇒ ≫1) — the
    recrawl-scheduler's dual of q134's change rate: WHEN a page's
    updates cluster, not just how often.  ONE user-keyed exchange;
    per-bucket vectorized sort+diff, gaps floored to whole seconds
    (shared ``// 1e6`` with the oracle so the integers match), moments
    accumulated as Python ints (q49's exact-moment contract) and the
    ppm finish is n·Σd²−(Σd)² over (Σd)² — no floats anywhere."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("int64")
        gap = us.groupby(df["user_id"], sort=False).diff() // 1_000_000
        keep = gap.notna()
        sub = pd.DataFrame({"user_id": df["user_id"][keep],
                            "g": gap[keep].astype("int64")})
        rows = []
        for uid, s in sub.groupby("user_id", sort=False):
            gs = [int(v) for v in s["g"]]
            tot = sum(gs)
            if tot <= 0:
                continue
            sq = sum(v * v for v in gs)
            n = len(gs)
            rows.append({
                "user_id": int(uid), "n_gaps": n,
                "cv2_ppm": (n * sq - tot * tot) * PPM // (tot * tot),
            })
        return pd.DataFrame(rows)

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_gaps", "cv2_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Two-sample KS drift statistic per source (distribution shift, exact)
# --------------------------------------------------------------------------

_KS_SQL = f"""
WITH h AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
vals AS (SELECT DISTINCT v FROM h),
srcs AS (SELECT DISTINCT source FROM h),
grid AS (SELECT s.source, va.v, COALESCE(h.c, 0) AS c
         FROM srcs s CROSS JOIN vals va
         LEFT JOIN h ON h.source = s.source AND h.v = va.v),
tot AS (SELECT v, SUM(c) AS c FROM h GROUP BY v),
ctot AS (SELECT v, SUM(c) OVER (ORDER BY v) AS ct FROM tot),
cum AS (SELECT source, v,
               SUM(c) OVER (PARTITION BY source ORDER BY v) AS cs
        FROM grid),
ns AS (SELECT source, SUM(c) AS ns FROM h GROUP BY source),
nn AS (SELECT SUM(c) AS n FROM h)
SELECT cum.source,
       CAST(MAX(ABS(cs * ((SELECT n FROM nn) - ns.ns)
                    - (ctot.ct - cs) * ns.ns)) * {PPM}
            // (ns.ns * ((SELECT n FROM nn) - ns.ns)) AS BIGINT) AS ks_ppm,
       CAST(ns.ns AS BIGINT) AS n_docs
FROM cum JOIN ctot USING (v) JOIN ns ON ns.source = cum.source
GROUP BY cum.source, ns.ns ORDER BY cum.source
"""


@query("q161_ks_drift", sql=_KS_SQL)
def q161_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic per source vs the REST of
    the corpus over document length — the nonparametric distribution-
    shift tripwire next to q148's χ² (which sees token mix but not
    length shape).  KS is a pure function of the per-(source, value)
    HISTOGRAM, so the plan is ONE (source, value)-count exchange;
    the ECDF supremum is computed on the histogram grid with cross-
    multiplied integer numerators (cs·N_rest − c_rest·N_s — no
    division until the final ppm), so the statistic is exact and
    engine-invariant."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["source", "n_chars"], sort=False)
            .size().rename("c").reset_index()
        )

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["source", "n_chars"],
            lambda g: g.groupby(["source", "n_chars"], sort=False)["c"]
            .sum().reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["source", "n_chars"], as_index=False)["c"].sum()
    )

    pivot = hist.pivot_table(
        index="n_chars", columns="source", values="c", fill_value=0,
        aggfunc="sum",
    ).sort_index()
    cum = pivot.cumsum()
    ns = pivot.sum(axis=0)
    n = int(ns.sum())
    ct = cum.sum(axis=1)
    rows = []
    for src in pivot.columns:
        n_s = int(ns[src])
        cs = cum[src].to_numpy().astype(object)
        rest = (ct.to_numpy().astype(object) - cs)
        num = np.abs(cs * (n - n_s) - rest * n_s)
        ks = int(max(num)) * PPM // (n_s * (n - n_s))
        rows.append({"source": src, "ks_ppm": ks, "n_docs": n_s})
    out = pd.DataFrame(rows)
    for c in ("ks_ppm", "n_docs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# --------------------------------------------------------------------------
# Exponentially-decayed activity (freshness-weighted popularity)
# --------------------------------------------------------------------------

DECAY_MAX_SHIFT = 20  # 2^-20 < 1 ppm — further decay is exactly 0

_DECAY_SQL = f"""
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
d AS (SELECT user_id,
             {PPM} // (1::BIGINT << LEAST(((SELECT m FROM mx) - epoch_us(ts))
                                          // {WEEK_US}, {DECAY_MAX_SHIFT})) AS w
      FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w) AS BIGINT) AS decayed_ppm
FROM d GROUP BY 1 ORDER BY 1
"""


@query("q162_decayed_activity", sql=_DECAY_SQL)
def q162_decayed_activity(sf_dir: str):
    """Freshness-weighted activity per user: each event counts
    2^-(age in weeks) — the exponentially-decayed popularity a recrawl
    scheduler keeps per page (recent signal dominates, old signal never
    quite dies).  Power-of-two decay makes the weight an integer SHIFT
    (1e6 >> age_wk, floored at 2^-{DECAY_MAX_SHIFT} ≡ 0), so the score
    is integer-exact — no float exp anywhere.  Plan: one metadata-cheap
    max(ts) pass broadcast as the reference instant, then per-batch
    weight partials → one user-keyed exchange of (user, n, Σw) rows."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def batch_max(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        return pa.table({"m": pa.array([pc.max(us).as_py()], pa.int64())})

    m = int(
        ds.map_batches(batch_max, batch_format="pyarrow")
        .to_pandas()["m"].max()
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        age_wk = np.minimum(
            (m - df["ts"].astype("int64")) // WEEK_US, DECAY_MAX_SHIFT
        ).to_numpy()
        w = PPM // (1 << age_wk.astype(np.int64))
        return pd.DataFrame({"user_id": df["user_id"], "w": w}).groupby(
            "user_id", sort=False
        ).agg(n_events=("w", "size"), decayed_ppm=("w", "sum")).reset_index()

    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "user_id",
            lambda g: g.groupby("user_id", sort=False)
            .agg(n_events=("n_events", "sum"), decayed_ppm=("decayed_ppm", "sum"))
            .reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_events", "decayed_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# MinHash estimator accuracy audit (estimate vs exact Jaccard per pair)
# --------------------------------------------------------------------------

_MINHASH_AUDIT_SQL = f"""
WITH p AS (
{_JACCARD_SQL}
),
s AS (SELECT * FROM
      read_parquet('/root/repo/tests/fixtures/oracle/minhash_sigs_sf0.01.parquet'))
SELECT p.id_a, p.id_b,
       CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) * {PPM} // 100
            AS BIGINT) AS est_ppm,
       CAST(ANY_VALUE(p.n_inter) * {PPM} // ANY_VALUE(p.n_union) AS BIGINT)
           AS j_ppm
FROM p
JOIN s sa ON sa.doc_id = p.id_a
JOIN s sb ON sb.doc_id = p.id_b AND sb.h_idx = sa.h_idx
GROUP BY p.id_a, p.id_b ORDER BY p.id_a, p.id_b
"""


@query("q163_minhash_audit", sql=_MINHASH_AUDIT_SQL)
def q163_minhash_audit(sf_dir: str):
    """Sketch-accuracy audit: for every TRUE near-dup pair (q14's exact
    Jaccard join), the MinHash match-fraction estimate (matches/k over
    the reference Rabin64 signatures) next to the exact J — the
    calibration table that justifies the k=100 / threshold-5 settings
    tender runs with.  Signatures are computed ONLY for pair-involved
    documents (a result-bounded `pc.is_in` scan — the corpus is never
    re-hashed for an audit); both columns are integer ppm.  The SQL twin
    recomputes the exact side live and joins the committed signature
    fixture (hash values pinned by tests/test_rabin.py)."""
    from texrex_ray.functions.rabin import rabin_minhash_signatures
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    pairs = QUERIES["q14_ngram_jaccard"](sf_dir)
    if hasattr(pairs, "to_pandas"):
        pairs = pairs.to_pandas()
    ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    need = pa.array(ids, pa.int64())

    def sigs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["doc_id"], value_set=need))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        toks = [
            LATIN_TOKEN_RE.findall((s or "").lower())
            for s in t["text"].to_pylist()
        ]
        sig, has_fp = rabin_minhash_signatures(toks, k=100, n=5)
        if not has_fp.all():
            raise RuntimeError("pair document without a minhash fingerprint")
        return pa.table({
            "doc_id": t["doc_id"],
            "sig": pa.array([list(map(int, row)) for row in sig],
                            pa.list_(pa.uint64())),
        })

    sdf = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sigs, batch_format="pyarrow")
        .to_pandas()
    )
    sig_of = {int(i): np.asarray(v, np.uint64) for i, v in
              zip(sdf["doc_id"], sdf["sig"])}

    rows = []
    for _, r in pairs.iterrows():
        a, b = int(r["id_a"]), int(r["id_b"])
        match = int((sig_of[a] == sig_of[b]).sum())
        rows.append({
            "id_a": a, "id_b": b, "n_match": match,
            "est_ppm": match * PPM // 100,
            "j_ppm": int(r["n_inter"]) * PPM // int(r["n_union"]),
        })
    out = pd.DataFrame(rows).astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Join-size estimation audit (planner statistics vs ground truth)
# --------------------------------------------------------------------------

_JOINEST_SQL = """
WITH bo AS (SELECT md5_number_lower(CAST(o_orderkey AS VARCHAR)) % 64 AS bucket,
                   o_orderkey AS k FROM orders),
bl AS (SELECT md5_number_lower(CAST(l_orderkey AS VARCHAR)) % 64 AS bucket,
              l_orderkey AS k FROM lineitem),
ca AS (SELECT bucket, k, CAST(COUNT(*) AS BIGINT) AS c FROM bo GROUP BY 1, 2),
cb AS (SELECT bucket, k, CAST(COUNT(*) AS BIGINT) AS c FROM bl GROUP BY 1, 2),
sa AS (SELECT bucket, SUM(c) AS n_a, COUNT(*) AS ndv_a FROM ca GROUP BY 1),
sb AS (SELECT bucket, SUM(c) AS n_b, COUNT(*) AS ndv_b FROM cb GROUP BY 1),
act AS (SELECT ca.bucket, SUM(ca.c * cb.c) AS actual_rows
        FROM ca JOIN cb USING (bucket, k) GROUP BY 1)
SELECT CAST(sa.bucket AS BIGINT) AS bucket,
       CAST(sa.n_a AS BIGINT) AS n_a, CAST(sb.n_b AS BIGINT) AS n_b,
       CAST(sa.ndv_a AS BIGINT) AS ndv_a, CAST(sb.ndv_b AS BIGINT) AS ndv_b,
       CAST(COALESCE(act.actual_rows, 0) AS BIGINT) AS actual_rows,
       CAST(sa.n_a * sb.n_b // GREATEST(sa.ndv_a, sb.ndv_b) AS BIGINT)
           AS est_rows
FROM sa JOIN sb USING (bucket) LEFT JOIN act ON act.bucket = sa.bucket
ORDER BY bucket
"""


@query("q164_join_estimate_audit", sql=_JOINEST_SQL)
def q164_join_estimate_audit(sf_dir: str):
    """Planner-statistics audit: the textbook join-size estimate
    |A|·|B| / max(ndv_A, ndv_B) (uniform-frequency assumption — what
    every cost-based optimizer starts from) against the EXACT join size
    Σ_k c_A(k)·c_B(k), per routing bucket of the shared md5 key hash —
    the table `ops/join.py::shuffle_join`'s auto_buckets sizing implies.
    Plan: per-batch (bucket, key) count partials from both sides → ONE
    key-keyed exchange computing per-key c_A, c_B and folding them into
    bucket-level (n, ndv, Σ c_A·c_B) partials → a 64-row driver finish.
    All integers; est uses floor division on both engines."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(col: str, side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = (
                df.groupby(col, sort=False).size().rename("c").reset_index()
                .rename(columns={col: "k"})
            )
            out["bucket"] = _doc_bucket(out["k"], 64)
            out["side"] = side
            return out
        return f

    both = orders.map_batches(partial("o_orderkey", "a"), batch_format="pandas").union(
        lineitem.map_batches(partial("l_orderkey", "b"), batch_format="pandas")
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per = (
            g.groupby(["bucket", "k", "side"], sort=False)["c"].sum().unstack(
                "side", fill_value=0
            ).reset_index()
        )
        for s in ("a", "b"):
            if s not in per.columns:
                per[s] = 0
        per["prod"] = per["a"] * per["b"]
        return per.groupby("bucket", as_index=False).agg(
            n_a=("a", "sum"), n_b=("b", "sum"),
            ndv_a=("a", lambda s: int((s > 0).sum())),
            ndv_b=("b", lambda s: int((s > 0).sum())),
            actual_rows=("prod", "sum"),
        )

    parts = (
        bucketed_groupby(both, "k", combine, expected_rows=lineitem.count())
        .to_pandas()
        .groupby("bucket", as_index=False)
        .sum()
    )
    parts["est_rows"] = [
        int(na) * int(nb) // max(int(xa), int(xb))
        for na, nb, xa, xb in zip(
            parts["n_a"], parts["n_b"], parts["ndv_a"], parts["ndv_b"]
        )
    ]
    out = parts.sort_values("bucket").reset_index(drop=True)
    cols = ["bucket", "n_a", "n_b", "ndv_a", "ndv_b", "actual_rows", "est_rows"]
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[cols]


# --------------------------------------------------------------------------
# Band self-join (|price_a - price_b| <= delta)
# --------------------------------------------------------------------------

BAND_DELTA_C = 25  # cents

_BAND_SQL = f"""
WITH v AS (SELECT o_orderkey AS id,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc FROM orders)
SELECT a.id AS id_a, b.id AS id_b, ABS(a.pc - b.pc) AS dist
FROM v a JOIN v b ON b.id > a.id
                 AND b.pc BETWEEN a.pc - {BAND_DELTA_C} AND a.pc + {BAND_DELTA_C}
ORDER BY id_a, id_b
"""


@query("q165_band_join", sql=_BAND_SQL)
def q165_band_join(sf_dir: str):
    """Band self-join: order pairs within {BAND_DELTA_C} cents of each
    other — the inequality join (price matching, near-timestamp
    reconciliation) a hash join cannot express.  `ops/bandjoin.py`
    buckets values at width delta so any qualifying pair spans at most
    two ADJACENT buckets; each point exchanges to its own bucket plus a
    ghost copy in the next, every pair meets exactly once, and the
    per-bucket join is a sorted two-pointer window — cost ∝ band
    occupancy, never the cross product."""
    from texrex_ray.ops.bandjoin import band_join_self

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": df["o_orderkey"],
            "pc": np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64),
        })

    return band_join_self(
        ds.map_batches(cents, batch_format="pandas"),
        id_col="id", value_col="pc", delta=BAND_DELTA_C,
        expected_rows=ds.count() * 2,
    )


# --------------------------------------------------------------------------
# 2-D skyline (Pareto frontier: max price, min date)
# --------------------------------------------------------------------------

_SKYLINE_SQL = """
WITH v AS (SELECT o_orderkey AS id,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
                  epoch_us(o_orderdate) AS date_us FROM orders)
SELECT id, price_c, date_us FROM v o1
WHERE NOT EXISTS (
  SELECT 1 FROM v o2
  WHERE o2.price_c >= o1.price_c AND o2.date_us <= o1.date_us
    AND (o2.price_c > o1.price_c OR o2.date_us < o1.date_us))
ORDER BY id
"""


@query("q166_skyline", sql=_SKYLINE_SQL)
def q166_skyline(sf_dir: str):
    """2-D skyline / Pareto frontier (Börzsönyi et al. 2001): the orders
    no other order beats on BOTH price (higher) and date (earlier) —
    multi-objective "best" selection (largest-image-smallest-bytes,
    best-quality-shortest-doc).  `ops/skyline.py` exploits the
    operator's own algebra: the global skyline ⊆ union of per-block
    skylines, so blocks prune locally (vectorized sort + prefix-max)
    and only result-sized survivors reach the driver's exact re-filter.
    ZERO shuffle; ties in both dimensions kept on both sides (NOT
    EXISTS semantics)."""
    from texrex_ray.ops.skyline import skyline2d

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": df["o_orderkey"],
            "price_c": np.round(df["o_totalprice"].to_numpy() * 100).astype(
                np.int64
            ),
            "date_us": df["o_orderdate"].astype("int64"),
        })

    return skyline2d(
        ds.map_batches(prep, batch_format="pandas"),
        id_col="id", max_col="price_c", min_col="date_us",
    )


# --------------------------------------------------------------------------
# Deadline conversion (click -> purchase within 1 hour, per user)
# --------------------------------------------------------------------------

CONVERT_WINDOW_US = 3_600_000_000  # 1 hour

_DEADLINE_SQL = f"""
WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase')
SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN EXISTS (
            SELECT 1 FROM p WHERE p.user_id = c.user_id
              AND p.t > c.t AND p.t <= c.t + {CONVERT_WINDOW_US})
            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM c GROUP BY 1 ORDER BY 1
"""


@query("q167_deadline_conversion", sql=_DEADLINE_SQL)
def q167_deadline_conversion(sf_dir: str):
    """Deadline-window conversion: clicks followed by a purchase within
    one hour, per user — the time-bounded funnel q75's order-only
    extrema cannot express (and the crawl twin: fetches re-validated
    within the freshness SLA).  Both event streams of a user meet in
    ONE user-keyed bucketed exchange; within the bucket the deadline
    check is a vectorized ``searchsorted`` of each click into the
    user's sorted purchase times — no per-pair join, cost ∝ events."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["click", "purchase"]))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            us = sub["ts"].astype("int64")
            clicks = np.sort(us[sub["event_type"] == "click"].to_numpy())
            if not len(clicks):
                continue
            buys = np.sort(us[sub["event_type"] == "purchase"].to_numpy())
            if len(buys):
                lo = np.searchsorted(buys, clicks, side="right")
                hi = np.searchsorted(
                    buys, clicks + CONVERT_WINDOW_US, side="right"
                )
                conv = int((hi > lo).sum())
            else:
                conv = 0
            rows.append({"user_id": int(uid), "n_clicks": len(clicks),
                         "n_converted": conv})
        return pd.DataFrame(rows)

    out = (
        bucketed_groupby(
            ds.map_batches(keep, batch_format="pyarrow"),
            "user_id", combine, expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_clicks", "n_converted"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Winsorized (clamped) mean per group — robust stats from the histogram
# --------------------------------------------------------------------------

_WINSOR_SQL = """
WITH v AS (SELECT l_returnflag AS grp,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS vc FROM lineitem),
q AS (SELECT grp, quantile_disc(vc, 0.1) AS p10, quantile_disc(vc, 0.9) AS p90
      FROM v GROUP BY 1)
SELECT v.grp, CAST(ANY_VALUE(q.p10) AS BIGINT) AS p10_c,
       CAST(ANY_VALUE(q.p90) AS BIGINT) AS p90_c,
       CAST(SUM(LEAST(GREATEST(v.vc, q.p10), q.p90)) // COUNT(*) AS BIGINT)
           AS winsor_mean_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM v JOIN q USING (grp) GROUP BY v.grp ORDER BY v.grp
"""


@query("q168_winsorized_mean", sql=_WINSOR_SQL)
def q168_winsorized_mean(sf_dir: str):
    """Winsorized mean per group: clamp to the in-group [p10, p90] and
    average — the robust location estimate between q113's median/MAD
    and the raw mean (what a quality-score aggregator uses when tails
    are garbage but mass matters).  Like q113 it is a pure function of
    the (group, value) HISTOGRAM: ONE count exchange; percentile bounds
    via PERCENTILE_DISC positions, the clamped sum FOLDED from the same
    histogram (clamped value × multiplicity — no second data pass),
    floor-divided mean."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "grp": df["l_returnflag"],
            "vc": np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64),
        }).groupby(["grp", "vc"], sort=False).size().rename("cnt").reset_index()

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["grp", "vc"],
            lambda g: g.groupby(["grp", "vc"], sort=False)["cnt"].sum()
            .reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["grp", "vc"], as_index=False)["cnt"].sum()
    )

    def disc(vals: np.ndarray, cum: np.ndarray, n: int, q: float) -> int:
        pos = max(int(np.ceil(q * n)), 1)
        return int(vals[np.searchsorted(cum, pos, side="left")])

    rows = []
    for grp, sub in hist.groupby("grp", sort=True):
        sub = sub.sort_values("vc")
        vals = sub["vc"].to_numpy()
        cnts = sub["cnt"].to_numpy()
        n = int(cnts.sum())
        cum = cnts.cumsum()
        p10 = disc(vals, cum, n, 0.1)
        p90 = disc(vals, cum, n, 0.9)
        clamped = np.clip(vals, p10, p90)
        total = int((clamped.astype(object) * cnts.astype(object)).sum())
        rows.append({"grp": grp, "p10_c": p10, "p90_c": p90,
                     "winsor_mean_c": total // n, "n": n})
    out = pd.DataFrame(rows)
    for c in ("p10_c", "p90_c", "winsor_mean_c", "n"):
        out[c] = out[c].astype("int64")
    return out.sort_values("grp").reset_index(drop=True)


# --------------------------------------------------------------------------
# Common-neighbor link prediction over the crawl graph
# --------------------------------------------------------------------------

LINKPRED_MIN_CN = 3

_LINKPRED_SQL = f"""
WITH e AS (SELECT src, dst FROM
           read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')),
und AS (SELECT DISTINCT a, b FROM (
          SELECT src AS a, dst AS b FROM e WHERE src <> dst
          UNION ALL SELECT dst, src FROM e WHERE src <> dst)),
deg AS (SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
wedge AS (SELECT n1.a AS u, n2.a AS v, n1.b AS z
          FROM und n1 JOIN und n2 ON n1.b = n2.b AND n1.a < n2.a),
cand AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
                CAST(SUM({PPM} // deg.d) AS BIGINT) AS ra_ppm
         FROM wedge JOIN deg ON deg.z = wedge.z
         GROUP BY 1, 2 HAVING COUNT(*) >= {LINKPRED_MIN_CN})
SELECT u, v, cn, ra_ppm FROM cand
WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = cand.u AND und.b = cand.v)
ORDER BY u, v
"""


@query("q169_link_prediction", sql=_LINKPRED_SQL)
def q169_link_prediction(sf_dir: str):
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003)
    over the crawl graph: unlinked page pairs sharing ≥ {LINKPRED_MIN_CN}
    neighbors, scored by common-neighbor count and the Resource-
    Allocation index Σ_z 1/deg(z) — RA instead of Adamic–Adar's 1/log
    deg because 1/deg is RATIONAL, so ppm scores are integer-exact.
    Plan: undirected dedup exchange once (degrees ride it), wedges
    generated where z's adjacency lives (per-z C(n,2), the triangle
    kernel's shape), ONE pair-keyed exchange sums (cn, ra) partials,
    existing edges removed by a broadcast membership filter."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    n_edges = edges.count()

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        return pd.DataFrame({
            "a": pd.concat([df["src"], df["dst"]], ignore_index=True),
            "b": pd.concat([df["dst"], df["src"]], ignore_index=True),
        }).drop_duplicates()

    und = bucketed_groupby(
        edges.map_batches(undirect, batch_format="pandas"),
        "a",
        lambda g: g.drop_duplicates(),
        expected_rows=n_edges * 2,
    ).materialize()

    # adjacency grouped by z = b: wedge generation where z's neighbors live
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for z, sub in g.groupby("b", sort=False):
            ns = np.sort(sub["a"].unique())
            n = len(ns)
            if n < 2:
                continue
            d = n  # deg(z) in the undirected simple graph
            ia, ib = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({
                "u": ns[ia], "v": ns[ib],
                "cn": np.ones(len(ia), np.int64),
                "ra": np.full(len(ia), PPM // d, np.int64),
            }))
        if not outs:
            return pd.DataFrame({"u": pd.Series([], dtype=object),
                                 "v": pd.Series([], dtype=object),
                                 "cn": pd.Series([], dtype="int64"),
                                 "ra": pd.Series([], dtype="int64")})
        return pd.concat(outs)

    wedge_parts = bucketed_groupby(
        und, "b", wedges, expected_rows=n_edges * 8,
    )
    cand = bucketed_groupby(
        wedge_parts, ["u", "v"],
        lambda g: g.groupby(["u", "v"], sort=False)
        .agg(cn=("cn", "sum"), ra_ppm=("ra", "sum")).reset_index(),
        expected_rows=n_edges * 16,
    ).to_pandas()
    cand = cand.groupby(["u", "v"], as_index=False).agg(
        cn=("cn", "sum"), ra_ppm=("ra_ppm", "sum")
    )
    cand = cand[cand["cn"] >= LINKPRED_MIN_CN]

    edge_set = set(
        map(tuple, und.to_pandas()[["a", "b"]].itertuples(index=False))
    )
    keep = [
        (u, v) not in edge_set for u, v in zip(cand["u"], cand["v"])
    ]
    out = cand[keep].sort_values(["u", "v"]).reset_index(drop=True)
    for c in ("cn", "ra_ppm"):
        out[c] = out[c].astype("int64")
    return out[["u", "v", "cn", "ra_ppm"]]


# --------------------------------------------------------------------------
# Source-pair unigram similarity (squared cosine, rational-exact)
# --------------------------------------------------------------------------

_SRCCOS_SQL = f"""
WITH toks AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+'))
                     AS tok FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
nrm AS (SELECT source, SUM(n * n) AS n2 FROM c GROUP BY 1),
dot AS (SELECT a.source AS s_a, b.source AS s_b, SUM(a.n * b.n) AS d
        FROM c a JOIN c b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2)
SELECT s_a, s_b,
       CAST(dot.d::HUGEINT * dot.d::HUGEINT * {PPM}
            // (na.n2::HUGEINT * nb.n2::HUGEINT) AS BIGINT) AS cos2_ppm
FROM dot JOIN nrm na ON na.source = s_a JOIN nrm nb ON nb.source = s_b
ORDER BY s_a, s_b
"""


@query("q170_source_cosine", sql=_SRCCOS_SQL)
def q170_source_cosine(sf_dir: str):
    """Source-pair unigram similarity matrix — the mixture-design view
    of which sources are redundant (near-identical token profiles) vs
    complementary.  Cosine itself needs a square root, so the SQUARED
    cosine dot²/(‖a‖²·‖b‖²) is reported instead: fully rational, hence
    integer-ppm exact on both engines (HUGEINT twin).  One (source,
    token) count exchange; the |S|²-sized pair finish runs on cell
    vectors, never documents."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt: Counter = Counter()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in _TOKEN_RE.findall((txt or "").lower()):
                cnt[(src, tok)] += 1
        ks = list(cnt.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks]),
            "tok": pa.array([k[1] for k in ks]),
            "n": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    cells = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source", "tok"],
            lambda g: g.groupby(["source", "tok"], sort=False)["n"].sum()
            .reset_index(),
            expected_rows=ds.count() * 4,
        )
        .to_pandas()
        .groupby(["source", "tok"], as_index=False)["n"].sum()
    )
    vecs = {
        src: dict(zip(sub["tok"], sub["n"]))
        for src, sub in cells.groupby("source")
    }
    srcs = sorted(vecs)
    n2 = {s: sum(int(v) * int(v) for v in vecs[s].values()) for s in srcs}
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            d = sum(
                int(n) * int(vecs[sb][t])
                for t, n in vecs[sa].items() if t in vecs[sb]
            )
            rows.append({
                "s_a": sa, "s_b": sb,
                "cos2_ppm": d * d * PPM // (n2[sa] * n2[sb]),
            })
    out = pd.DataFrame(rows)
    out["cos2_ppm"] = out["cos2_ppm"].astype("int64")
    return out.sort_values(["s_a", "s_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Zipf head coverage per source (top-10 type mass)
# --------------------------------------------------------------------------

_ZIPF_SQL = f"""
WITH toks AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+'))
                     AS tok FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
r AS (SELECT source, tok, n,
             row_number() OVER (PARTITION BY source ORDER BY n DESC, tok)
                 AS rk
      FROM c)
SELECT source,
       CAST(SUM(n) FILTER (rk <= 10) * {PPM} // SUM(n) AS BIGINT)
           AS head10_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_types
FROM r GROUP BY source ORDER BY source
"""


@query("q171_zipf_head", sql=_ZIPF_SQL)
def q171_zipf_head(sf_dir: str):
    """Zipf head coverage: the token-mass fraction the 10 most frequent
    types carry per source — high head mass means template/boilerplate
    text, the quick screen before q148/q159's heavier divergence tests.
    Same ONE (source, token) exchange; per-source the finish is a
    top-10-by-(count desc, token) pick plus integer ppm division."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt: Counter = Counter()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in _TOKEN_RE.findall((txt or "").lower()):
                cnt[(src, tok)] += 1
        ks = list(cnt.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks]),
            "tok": pa.array([k[1] for k in ks]),
            "n": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    cells = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source", "tok"],
            lambda g: g.groupby(["source", "tok"], sort=False)["n"].sum()
            .reset_index(),
            expected_rows=ds.count() * 4,
        )
        .to_pandas()
        .groupby(["source", "tok"], as_index=False)["n"].sum()
    )
    rows = []
    for src, sub in cells.groupby("source", sort=True):
        sub = sub.sort_values(["n", "tok"], ascending=[False, True])
        tot = int(sub["n"].sum())
        head = int(sub["n"].head(10).sum())
        rows.append({"source": src, "head10_ppm": head * PPM // tot,
                     "n_types": len(sub)})
    out = pd.DataFrame(rows)
    for c in ("head10_ppm", "n_types"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# --------------------------------------------------------------------------
# Degree assortativity of the crawl graph (signed r², rational-exact)
# --------------------------------------------------------------------------

_ASSORT_SQL = f"""
WITH e AS (SELECT DISTINCT src, dst FROM
           read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')
           WHERE src <> dst),
od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
idg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
xy AS (SELECT od.d AS x, idg.d AS y
       FROM e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x)::HUGEINT AS sx,
             SUM(y)::HUGEINT AS sy, SUM(x*y)::HUGEINT AS sxy,
             SUM(x*x)::HUGEINT AS sxx, SUM(y*y)::HUGEINT AS syy
      FROM xy)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(n * sxy - sx * sy AS BIGINT) AS num,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END
            * ((n * sxy - sx * sy) * (n * sxy - sx * sy) * {PPM}
               // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
            AS BIGINT) AS r2_signed_ppm
FROM s
"""


@query("q172_assortativity", sql=_ASSORT_SQL)
def q172_assortativity(sf_dir: str):
    """Degree assortativity of the crawl graph (Newman 2002): do
    high-out-degree pages link to high-in-degree pages?  Positive ⇒
    hub-to-hub core (crawl prioritization finds it fast), negative ⇒
    hub-and-spoke.  Pearson r over per-edge (out-deg(src), in-deg(dst))
    needs a square root, so the SIGNED SQUARED correlation
    sign(num)·num²/(den_x·den_y) is reported — rational, integer-ppm
    exact (HUGEINT twin).  Plan: degree tables from two keyed count
    exchanges, per-edge (x, y) via broadcast degree lookup, five q49
    moment partials in Python ints."""
    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        return df.drop_duplicates()

    e = edges.map_batches(dedup, batch_format="pandas").to_pandas()
    e = e.drop_duplicates()
    od = e.groupby("src").size()
    idg = e.groupby("dst").size()
    x = od[e["src"]].to_numpy().astype(object)
    y = idg[e["dst"]].to_numpy().astype(object)
    n = len(e)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    num = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    sign = -1 if num < 0 else 1
    r2 = sign * (num * num * PPM // den)
    return pd.DataFrame(
        {"n_edges": [n], "num": [num], "r2_signed_ppm": [r2]}
    ).astype("int64")


# --------------------------------------------------------------------------
# Hub-removal robustness (largest components after deleting top hubs)
# --------------------------------------------------------------------------

HUBS_REMOVED = 20

_ROBUST_SQL = f"""
WITH e0 AS (SELECT DISTINCT src, dst FROM
            read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')
            WHERE src <> dst),
und AS (SELECT DISTINCT a, b FROM (
          SELECT src AS a, dst AS b FROM e0 UNION ALL SELECT dst, src FROM e0)),
deg AS (SELECT a AS node, COUNT(*) AS d FROM und GROUP BY 1),
hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {HUBS_REMOVED}),
ue AS (SELECT a, b FROM und
       WHERE a NOT IN (SELECT node FROM hubs)
         AND b NOT IN (SELECT node FROM hubs)),
nodes AS (SELECT DISTINCT a AS n FROM ue),
rec AS (
  WITH RECURSIVE reach(n, m) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT ue.b, r.m FROM reach r JOIN ue ON ue.a = r.n
  ) SELECT n, MIN(m) AS lbl FROM reach GROUP BY n),
sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS size FROM rec GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY size DESC, lbl) AS BIGINT) AS rank,
       size
FROM sizes QUALIFY rank <= 5 ORDER BY rank
"""


@query("q173_hub_robustness", sql=_ROBUST_SQL)
def q173_hub_robustness(sf_dir: str):
    """Attack-tolerance of the crawl graph (Albert, Jeong & Barabási
    2000): delete the {HUBS_REMOVED} highest-degree pages and measure
    the surviving component sizes — how much of the web stays reachable
    if the hub pages go dark (the mirror question of q142's seed
    cover).  Degrees from the undirected dedup exchange, hubs are a
    driver top-k, components via `dedup/clusters.py::dup_clusters`
    (min-label propagation with its documented driver/distributed plan
    switch); pages map to a sorted integer index so min-index labels ≡
    the oracle's min-name labels."""
    from texrex_ray.dedup.clusters import dup_clusters

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        return pd.DataFrame({
            "a": pd.concat([df["src"], df["dst"]], ignore_index=True),
            "b": pd.concat([df["dst"], df["src"]], ignore_index=True),
        }).drop_duplicates()

    und = (
        edges.map_batches(undirect, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    deg = und.groupby("a").size().sort_values(ascending=False)
    hubs = set(
        deg.reset_index()
        .sort_values([0, "a"], ascending=[False, True])["a"]
        .head(HUBS_REMOVED)
    )
    ue = und[~und["a"].isin(hubs) & ~und["b"].isin(hubs)]
    nodes = np.array(sorted(set(ue["a"]) | set(ue["b"])))
    idx = {v: i for i, v in enumerate(nodes)}
    pairs_df = pd.DataFrame({
        "id_a": [idx[v] for v in ue["a"]],
        "id_b": [idx[v] for v in ue["b"]],
    })
    labels = dup_clusters(ray.data.from_pandas(pairs_df))
    sizes = (
        labels.groupby("cluster_id").size().rename("size").reset_index()
    )
    sizes["lbl"] = [nodes[int(i)] for i in sizes["cluster_id"]]
    sizes = sizes.sort_values(["size", "lbl"], ascending=[False, True]).head(5)
    sizes["rank"] = range(1, len(sizes) + 1)
    out = sizes[["rank", "size"]].reset_index(drop=True)
    return out.astype("int64")


# --------------------------------------------------------------------------
# Token-bucket rate-limiter audit (politeness recurrence per user)
# --------------------------------------------------------------------------

TB_PERIOD_US = 14_400_000_000  # one token per 4 hours
TB_BURST = 2                 # bucket capacity in tokens
TB_CAP_US = TB_BURST * TB_PERIOD_US

_THROTTLE_SQL = f"""
WITH RECURSIVE s AS (SELECT user_id, epoch_us(ts) AS t,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS i
           FROM events),
st(user_id, i, t, tok_after, thr) AS (
  SELECT user_id, i, t,
         CASE WHEN {TB_CAP_US} >= {TB_PERIOD_US}
              THEN {TB_CAP_US} - {TB_PERIOD_US} ELSE {TB_CAP_US} END,
         CASE WHEN {TB_CAP_US} >= {TB_PERIOD_US} THEN 0 ELSE 1 END
  FROM s WHERE i = 1
  UNION ALL
  SELECT n.user_id, n.i, n.t,
         CASE WHEN LEAST(p.tok_after + (n.t - p.t), {TB_CAP_US})
                   >= {TB_PERIOD_US}
              THEN LEAST(p.tok_after + (n.t - p.t), {TB_CAP_US})
                   - {TB_PERIOD_US}
              ELSE LEAST(p.tok_after + (n.t - p.t), {TB_CAP_US}) END,
         CASE WHEN LEAST(p.tok_after + (n.t - p.t), {TB_CAP_US})
                   >= {TB_PERIOD_US} THEN 0 ELSE 1 END
  FROM st p JOIN s n ON n.user_id = p.user_id AND n.i = p.i + 1)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(thr) AS BIGINT) AS n_throttled
FROM st GROUP BY 1 ORDER BY 1
"""


@query("q174_token_bucket", sql=_THROTTLE_SQL)
def q174_token_bucket(sf_dir: str):
    """Token-bucket rate-limiter audit: replay each user's event stream
    through a bucket of {TB_BURST} tokens refilling one per 4 hours
    and count the requests a politeness gate would throttle — the
    state/politeness.py budget semantics as a batch audit, and a shape
    worth having on its own: a SEQUENTIAL RECURRENCE (bucket level
    depends on every prior event) that parallelizes perfectly by key.
    ONE user-keyed exchange; the per-user replay is a tight integer
    loop over that user's sorted times (microsecond arithmetic, no
    floats), mirrored by a linear recursive CTE on the oracle side."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            ts = sub["ts"].astype("int64").tolist()
            tok = TB_CAP_US
            prev = None
            thr = 0
            for t in ts:
                if prev is not None:
                    tok = min(tok + (t - prev), TB_CAP_US)
                if tok >= TB_PERIOD_US:
                    tok -= TB_PERIOD_US
                else:
                    thr += 1
                prev = t
            rows.append({"user_id": int(uid), "n_events": len(ts),
                         "n_throttled": thr})
        return pd.DataFrame(rows)

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_events", "n_throttled"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Range-partition planner (equi-depth boundaries + skew audit)
# --------------------------------------------------------------------------

RANGE_PARTS = 16

_RANGEPLAN_SQL = f"""
WITH v AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS vc
           FROM lineitem),
r AS (SELECT vc, row_number() OVER (ORDER BY vc) AS rn FROM v),
nn AS (SELECT COUNT(*) AS n FROM v),
b AS (SELECT u.i,
             (SELECT vc FROM r
              WHERE rn = GREATEST((u.i * (SELECT n FROM nn)
                                   + {RANGE_PARTS} - 1) // {RANGE_PARTS}, 1))
                 AS bound
      FROM unnest(range(1, {RANGE_PARTS})) AS u(i)),
assign AS (SELECT vc, (SELECT COUNT(*) FROM b WHERE b.bound < v.vc) AS part
           FROM v)
SELECT CAST(part AS BIGINT) AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(vc) AS BIGINT) AS min_c, CAST(MAX(vc) AS BIGINT) AS max_c
FROM assign GROUP BY 1 ORDER BY 1
"""


@query("q175_range_partition_plan", sql=_RANGEPLAN_SQL)
def q175_range_partition_plan(sf_dir: str):
    """Range-partition planner: the equi-depth boundary table a
    distributed sort's shuffle needs (Ray's `ds.sort` samples; this
    computes EXACT boundaries), plus the per-partition row counts and
    bounds that audit the resulting balance.  Boundaries are
    PERCENTILE_DISC positions on the value histogram (q100's ONE
    count-exchange plan); assignment folds back over the same
    histogram — rows are never rescanned.  Partition of v = number of
    boundaries strictly below v, identical on both engines."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return (
            pd.DataFrame({"vc": vc}).groupby("vc", sort=False).size()
            .rename("cnt").reset_index()
        )

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "vc",
            lambda g: g.groupby("vc", sort=False)["cnt"].sum().reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby("vc", as_index=False)["cnt"].sum()
        .sort_values("vc")
    )
    vals = hist["vc"].to_numpy()
    cnts = hist["cnt"].to_numpy()
    n = int(cnts.sum())
    cum = cnts.cumsum()
    bounds = []
    for i in range(1, RANGE_PARTS):
        pos = max((i * n + RANGE_PARTS - 1) // RANGE_PARTS, 1)
        bounds.append(int(vals[np.searchsorted(cum, pos, side="left")]))
    barr = np.asarray(bounds, dtype=np.int64)
    part = np.searchsorted(barr, vals, side="left")  # boundaries < v
    # searchsorted(left) counts bounds <= v-1 i.e. bounds < v for ints
    rows = []
    for p in np.unique(part):
        mask = part == p
        rows.append({
            "part": int(p), "n_rows": int(cnts[mask].sum()),
            "min_c": int(vals[mask].min()), "max_c": int(vals[mask].max()),
        })
    return pd.DataFrame(rows).astype("int64").sort_values("part").reset_index(
        drop=True
    )


# --------------------------------------------------------------------------
# k-anonymity risk audit (quasi-identifier group sizes)
# --------------------------------------------------------------------------

KANON_K = 5

_KANON_SQL = f"""
WITH w AS (SELECT user_id,
                  MIN(CAST(epoch_us(ts) // {WEEK_US} AS BIGINT)) AS cohort
           FROM events GROUP BY 1),
cnt AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
dom AS (SELECT user_id, event_type AS dom_type FROM cnt
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY c DESC, event_type) = 1),
qi AS (SELECT w.user_id, w.cohort, dom.dom_type
       FROM w JOIN dom USING (user_id))
SELECT cohort, dom_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(*) < {KANON_K} AS BIGINT) AS at_risk
FROM qi GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q176_k_anonymity", sql=_KANON_SQL)
def q176_k_anonymity(sf_dir: str):
    """k-anonymity risk audit over behavioral quasi-identifiers — the
    release-time privacy gate next to q61's PII scrub: users whose
    (first-active week, dominant event type) combination is shared by
    fewer than {KANON_K} others are re-identifiable from "anonymized"
    event data.  Both QI components are per-user facts, so ONE
    user-keyed exchange derives them (min week; argmax type with the
    deterministic count-desc/type-asc tie-break) and the finish is a
    QI-cardinality groupby."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            cohort = int(sub["ts"].astype("int64").min() // WEEK_US)
            cnt = sub.groupby("event_type").size().reset_index(name="c")
            cnt = cnt.sort_values(["c", "event_type"],
                                  ascending=[False, True])
            rows.append({"user_id": int(uid), "cohort": cohort,
                         "dom_type": cnt["event_type"].iloc[0]})
        return pd.DataFrame(rows)

    qi = bucketed_groupby(
        ds, "user_id", combine, expected_rows=ds.count()
    ).to_pandas()
    out = (
        qi.groupby(["cohort", "dom_type"], as_index=False)
        .agg(n_users=("user_id", "size"))
    )
    out["at_risk"] = (out["n_users"] < KANON_K).astype("int64")
    for c in ("cohort", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort", "dom_type"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Hourly autocorrelation (periodicity detection, rational-exact)
# --------------------------------------------------------------------------

HOUR_US = 3_600_000_000
ACF_MAX_LAG = 24

_ACF_SQL = f"""
WITH h AS (SELECT CAST(epoch_us(ts) // {HOUR_US} AS BIGINT) AS hr,
                  CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
lim AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
grid AS (SELECT g.hr, COALESCE(h.x, 0) AS x
         FROM (SELECT unnest(range((SELECT h0 FROM lim),
                                   (SELECT h1 FROM lim) + 1)) AS hr) g
         LEFT JOIN h USING (hr)),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x)::HUGEINT AS sx FROM grid),
d AS (SELECT hr, (SELECT n FROM s) * x - (SELECT sx FROM s) AS dv FROM grid),
c0 AS (SELECT SUM(dv * dv) AS c FROM d),
ck AS (SELECT u.k, SUM(a.dv * b.dv) AS c
       FROM unnest(range(1, {ACF_MAX_LAG} + 1)) AS u(k)
       JOIN d a ON TRUE JOIN d b ON b.hr = a.hr + u.k
       GROUP BY u.k)
SELECT CAST(k AS BIGINT) AS lag,
       CAST(CASE WHEN ck.c < 0 THEN -1 ELSE 1 END
            * (ABS(ck.c) * {PPM} // (SELECT c FROM c0)) AS BIGINT) AS r_ppm
FROM ck ORDER BY lag
"""


@query("q177_periodicity", sql=_ACF_SQL)
def q177_periodicity(sf_dir: str):
    """Autocorrelation of the hourly event-count series at lags 1..24 —
    the periodicity detector a recrawl scheduler reads to find a site's
    active hours (daily rhythm ⇒ a peak at lag 24).  The series is the
    COMPLETE hourly grid (missing hours count 0); deviations are
    zero-meaned by cross-multiplication (n·x−Σx, no division), so every
    lag correlation is a RATIONAL C_k/C_0 → signed integer ppm, exact
    on both engines (HUGEINT twin).  Plan: one hour-keyed count
    exchange (grid-sized, ≪ events), lag products on the driver grid."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = df["ts"].astype("int64") // HOUR_US
        return pd.DataFrame({"hr": hr}).groupby("hr", sort=False).size().rename(
            "x"
        ).reset_index()

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "hr",
            lambda g: g.groupby("hr", sort=False)["x"].sum().reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby("hr", as_index=False)["x"].sum()
    )
    h0, h1 = int(hist["hr"].min()), int(hist["hr"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[hist["hr"].to_numpy() - h0] = hist["x"].to_numpy()
    n = len(grid)
    sx = int(grid.sum())
    d = (n * grid.astype(object) - sx)
    c0 = int((d * d).sum())
    rows = []
    for k in range(1, ACF_MAX_LAG + 1):
        ck = int((d[:-k] * d[k:]).sum()) if k < n else 0
        sign = -1 if ck < 0 else 1
        rows.append({"lag": k, "r_ppm": sign * (abs(ck) * PPM // c0)})
    return pd.DataFrame(rows).astype("int64")


# --------------------------------------------------------------------------
# CUSUM changepoint (max cumulative deviation over the daily series)
# --------------------------------------------------------------------------

DAY_US = 86_400_000_000

_CUSUM_SQL = f"""
WITH dd AS (SELECT CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
lim AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dd),
grid AS (SELECT g.day, COALESCE(dd.x, 0) AS x
         FROM (SELECT unnest(range((SELECT d0 FROM lim),
                                   (SELECT d1 FROM lim) + 1)) AS day) g
         LEFT JOIN dd USING (day)),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x)::HUGEINT AS sx FROM grid),
cs AS (SELECT day,
              SUM((SELECT n FROM s) * x - (SELECT sx FROM s))
                  OVER (ORDER BY day) AS c
       FROM grid)
SELECT CAST(day AS BIGINT) AS cp_day, CAST(ABS(c) AS BIGINT) AS max_abs_cusum,
       CAST((SELECT n FROM s) AS BIGINT) AS n_days
FROM cs ORDER BY ABS(c) DESC, day LIMIT 1
"""


@query("q178_cusum_changepoint", sql=_CUSUM_SQL)
def q178_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint over the daily event-count series: the day
    where the cumulative deviation from the global mean peaks — the
    classic level-shift detector (Page 1954) a pipeline health monitor
    runs over ingest volume.  Deviations zero-meaned by
    cross-multiplication (n·x−Σx), cumulative sums exact integers; the
    argmax tie-breaks to the earliest day on both engines.  Same
    day-keyed count exchange as q177; the finish is grid-sized."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("int64") // DAY_US
        return pd.DataFrame({"day": day}).groupby("day", sort=False).size().rename(
            "x"
        ).reset_index()

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            "day",
            lambda g: g.groupby("day", sort=False)["x"].sum().reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby("day", as_index=False)["x"].sum()
    )
    d0, d1 = int(hist["day"].min()), int(hist["day"].max())
    grid = np.zeros(d1 - d0 + 1, dtype=np.int64)
    grid[hist["day"].to_numpy() - d0] = hist["x"].to_numpy()
    n = len(grid)
    sx = int(grid.sum())
    dev = n * grid.astype(object) - sx
    cs = np.cumsum(dev)
    absc = np.abs(cs)
    best = int(np.argmax(absc))  # first max = earliest day
    return pd.DataFrame({
        "cp_day": [d0 + best],
        "max_abs_cusum": [int(absc[best])],
        "n_days": [n],
    }).astype("int64")


# --------------------------------------------------------------------------
# Bounce rate per signup cohort (sessionization composition)
# --------------------------------------------------------------------------

_BOUNCE_SQL = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (SELECT user_id,
                SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS sidx
         FROM s),
per AS (SELECT user_id, sidx, CAST(COUNT(*) AS BIGINT) AS n
        FROM sess GROUP BY 1, 2),
coh AS (SELECT user_id, CAST(MIN(epoch_us(ts) // {WEEK_US}) AS BIGINT)
               AS cohort FROM events GROUP BY 1)
SELECT coh.cohort, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN per.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(SUM(CASE WHEN per.n = 1 THEN 1 ELSE 0 END) * {PPM} // COUNT(*)
            AS BIGINT) AS bounce_ppm
FROM per JOIN coh USING (user_id)
GROUP BY 1 ORDER BY 1
"""


@query("q179_bounce_rate", sql=_BOUNCE_SQL)
def q179_bounce_rate(sf_dir: str):
    """Bounce rate per signup cohort: single-event sessions over total
    sessions, grouped by each user's first-active week — q98's
    sessionization composed with q151's cohorts in ONE user-keyed
    exchange (sessions and the cohort are both per-user facts, so one
    bucket combine derives both; the finish is cohort-sized).  Integer
    ppm rate."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rows = []
        for uid, sub in df.groupby("user_id", sort=False):
            us = sub["ts"].astype("int64").to_numpy()
            cohort = int(us.min() // WEEK_US)
            new = np.ones(len(us), dtype=np.int64)
            new[1:] = (us[1:] - us[:-1] > 1_800_000_000).astype(np.int64)
            sidx = np.cumsum(new)
            sizes = np.bincount(sidx)[1:]
            rows.append({
                "cohort": cohort,
                "n_sessions": int((sizes > 0).sum()),
                "n_bounces": int((sizes == 1).sum()),
            })
        return pd.DataFrame(rows)

    per_user = bucketed_groupby(
        ds, "user_id", combine, expected_rows=ds.count()
    ).to_pandas()
    out = per_user.groupby("cohort", as_index=False).agg(
        n_sessions=("n_sessions", "sum"), n_bounces=("n_bounces", "sum")
    )
    out["bounce_ppm"] = [
        int(b) * PPM // int(s) for b, s in zip(out["n_bounces"], out["n_sessions"])
    ]
    for c in ("cohort", "n_sessions", "n_bounces", "bounce_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cohort").reset_index(drop=True)


# --------------------------------------------------------------------------
# Random-failure robustness (complement of q173's targeted attack)
# --------------------------------------------------------------------------

FAIL_PCT = 30

_RANDFAIL_SQL = f"""
WITH e0 AS (SELECT DISTINCT src, dst FROM
            read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')
            WHERE src <> dst),
und AS (SELECT DISTINCT a, b FROM (
          SELECT src AS a, dst AS b FROM e0 UNION ALL SELECT dst, src FROM e0)),
dead AS (SELECT DISTINCT a AS node FROM und
         WHERE md5_number_lower(a) % 100 < {FAIL_PCT}),
ue AS (SELECT a, b FROM und
       WHERE a NOT IN (SELECT node FROM dead)
         AND b NOT IN (SELECT node FROM dead)),
nodes AS (SELECT DISTINCT a AS n FROM ue),
rec AS (
  WITH RECURSIVE reach(n, m) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT ue.b, r.m FROM reach r JOIN ue ON ue.a = r.n
  ) SELECT n, MIN(m) AS lbl FROM reach GROUP BY n),
sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS size FROM rec GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY size DESC, lbl) AS BIGINT) AS rank,
       size
FROM sizes QUALIFY rank <= 5 ORDER BY rank
"""


@query("q180_random_failure", sql=_RANDFAIL_SQL)
def q180_random_failure(sf_dir: str):
    """Error-tolerance twin of q173 (Albert–Jeong–Barabási's OTHER
    curve): delete a deterministic {FAIL_PCT}% "random" node sample
    (content-stable md5 bucket — the repo's split hash, so the sample
    is layout-invariant and engine-shared) and measure surviving
    component sizes.  Scale-free graphs survive random failure but
    shatter under q173's targeted attack — the pair of numbers IS the
    robustness diagnosis.  Same plan: degree exchange, broadcast kill
    set, dup_clusters components."""
    from texrex_ray.dedup.clusters import dup_clusters
    from texrex_ray.functions.hashing import md5_lower64

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]]
        return pd.DataFrame({
            "a": pd.concat([df["src"], df["dst"]], ignore_index=True),
            "b": pd.concat([df["dst"], df["src"]], ignore_index=True),
        }).drop_duplicates()

    und = (
        edges.map_batches(undirect, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    all_nodes = sorted(set(und["a"]))
    h = md5_lower64(all_nodes) % np.uint64(100)
    dead = {n for n, hv in zip(all_nodes, h) if int(hv) < FAIL_PCT}
    ue = und[~und["a"].isin(dead) & ~und["b"].isin(dead)]
    nodes = np.array(sorted(set(ue["a"]) | set(ue["b"])))
    idx = {v: i for i, v in enumerate(nodes)}
    labels = dup_clusters(ray.data.from_pandas(pd.DataFrame({
        "id_a": [idx[v] for v in ue["a"]],
        "id_b": [idx[v] for v in ue["b"]],
    })))
    sizes = labels.groupby("cluster_id").size().rename("size").reset_index()
    sizes["lbl"] = [nodes[int(i)] for i in sizes["cluster_id"]]
    sizes = sizes.sort_values(["size", "lbl"], ascending=[False, True]).head(5)
    sizes["rank"] = range(1, len(sizes) + 1)
    return sizes[["rank", "size"]].reset_index(drop=True).astype("int64")


# --------------------------------------------------------------------------
# Cohort value curves (retention-weighted cumulative value)
# --------------------------------------------------------------------------

_COHORT_VALUE_SQL = f"""
WITH c AS (SELECT user_id,
                  MIN(CAST(epoch_us(ts) // {WEEK_US} AS BIGINT)) AS cohort
           FROM events GROUP BY 1)
SELECT c.cohort,
       CAST(epoch_us(e.ts) // {WEEK_US} - c.cohort AS BIGINT) AS offset_wk,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_c,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q181_cohort_value", sql=_COHORT_VALUE_SQL)
def q181_cohort_value(sf_dir: str):
    """Cohort value curves — q151's retention matrix weighted by the
    event `value` column (the LTV-by-age view; for a crawl: bytes
    fetched by host-discovery age).  Cohort and offsets are per-user
    facts → ONE user-keyed exchange emits (cohort, offset, Σ value
    cents, n) partials, the finish is matrix-sized.  Each event's value
    rounds to integer cents BEFORE summation on BOTH engines (the
    repo-wide scaled-int contract), so partial sums commute exactly —
    no float aggregate ever crosses an exchange."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        wk = df["ts"].astype("int64") // WEEK_US
        cohort = wk.groupby(df["user_id"], sort=False).transform("min")
        g = pd.DataFrame({
            "cohort": cohort, "offset_wk": wk - cohort, "value": df["value"],
        })
        # exact decimal-cent partials: value is generated with 2-decimal
        # precision, so per-event cents are integers and sums are exact
        g["vc"] = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        return (
            g.groupby(["cohort", "offset_wk"], sort=False)
            .agg(value_c=("vc", "sum"), n_events=("vc", "size"))
            .reset_index()
        )

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()
        .groupby(["cohort", "offset_wk"], as_index=False)
        .agg(value_c=("value_c", "sum"), n_events=("n_events", "sum"))
        .sort_values(["cohort", "offset_wk"])
        .reset_index(drop=True)
    )
    for c in ("cohort", "offset_wk", "value_c", "n_events"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Cross-format pHash pair matrix (codec-invariance audit)
# --------------------------------------------------------------------------

_FMT_PAIRS_SQL = """
WITH i AS (SELECT image_id, fmt, phash FROM
           read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet'))
SELECT LEAST(a.fmt, b.fmt) AS fmt_a, GREATEST(a.fmt, b.fmt) AS fmt_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(bit_count(xor(a.phash, b.phash))) AS BIGINT) AS min_hamming
FROM i a JOIN i b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 6
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q182_phash_format_matrix", sql=_FMT_PAIRS_SQL)
def q182_phash_format_matrix(sf_dir: str):
    """Codec-invariance audit of the payload dedup: q57's pHash-Hamming
    near-dup pairs broken down by FORMAT pair — whether perceptual
    clusters cross codec boundaries (they should, for true re-encodes)
    or stay within one format (format-specific artifacts dominate the
    hash).  Pairs from the same complete block-LSH as q57; the format
    attach is a broadcast id→fmt lookup (image-table-sized metadata,
    never pixels), finish is |fmts|²-sized."""
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table")
    n = ds.count()
    pairs = hamming_pairs(
        ds, id_col="image_id", sig_col="phash", max_hamming=6,
        expected_rows=n, expected_pairs=n,
    ).to_pandas()

    fmt_df = (
        ds.map_batches(
            lambda t: t.select(["image_id", "fmt"]), batch_format="pyarrow"
        )
        .to_pandas()
    )
    fmt = dict(zip(fmt_df["image_id"], fmt_df["fmt"]))
    fa = [fmt[i] for i in pairs["id_a"]]
    fb = [fmt[i] for i in pairs["id_b"]]
    pairs["fmt_a"] = [min(x, y) for x, y in zip(fa, fb)]
    pairs["fmt_b"] = [max(x, y) for x, y in zip(fa, fb)]
    out = (
        pairs.groupby(["fmt_a", "fmt_b"], as_index=False)
        .agg(n_pairs=("hamming", "size"), min_hamming=("hamming", "min"))
        .sort_values(["fmt_a", "fmt_b"])
        .reset_index(drop=True)
    )
    for c in ("n_pairs", "min_hamming"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Percentile-rank normalization (per-language quantile mapping)
# --------------------------------------------------------------------------

_PCTRANK_SQL = f"""
SELECT doc_id, lang,
       CAST((RANK() OVER (PARTITION BY lang ORDER BY n_chars) - 1) * {PPM}
            // (COUNT(*) OVER (PARTITION BY lang) - 1) AS BIGINT) AS pct_ppm
FROM documents ORDER BY doc_id
"""


@query("q183_percentile_rank", sql=_PCTRANK_SQL)
def q183_percentile_rank(sf_dir: str):
    """Percentile-rank normalization: each document's length mapped to
    its within-language percentile (SQL percent_rank semantics,
    (rank−1)/(n−1) with min-rank ties, floored to integer ppm) — the
    quantile mapping that makes quality thresholds comparable across
    languages (q58 picks ONE threshold; this normalizes the whole
    score).  rank−1 = count of strictly smaller values, a pure function
    of the per-language VALUE HISTOGRAM: one count exchange builds the
    histograms, they broadcast once, and every document gets its ppm
    by a vectorized searchsorted where it sits — corpus-shaped output
    with zero corpus shuffle."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["lang", "n_chars"], sort=False).size().rename("c")
            .reset_index()
        )

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["lang", "n_chars"],
            lambda g: g.groupby(["lang", "n_chars"], sort=False)["c"].sum()
            .reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["lang", "n_chars"], as_index=False)["c"].sum()
    )
    plans = {}
    for lang, sub in hist.groupby("lang"):
        sub = sub.sort_values("n_chars")
        vals = sub["n_chars"].to_numpy()
        cnts = sub["c"].to_numpy()
        cum_below = np.concatenate([[0], cnts.cumsum()[:-1]])
        plans[lang] = (vals, cum_below, int(cnts.sum()))
    plans_ref = ray.put(plans)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(plans_ref)
        out = np.empty(len(df), dtype=np.int64)
        nc = df["n_chars"].to_numpy()
        for lang in pd.unique(df["lang"]):
            vals, below, n = pl[lang]
            m = (df["lang"] == lang).to_numpy()
            idx = np.searchsorted(vals, nc[m], side="left")
            out[m] = below[idx] * PPM // max(n - 1, 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"], "lang": df["lang"], "pct_ppm": out,
        })

    res = ds.map_batches(assign, batch_format="pandas").to_pandas()
    for c in ("doc_id", "pct_ppm"):
        res[c] = res[c].astype("int64")
    return res.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Cross-source contamination map (near-dup pairs by source pair)
# --------------------------------------------------------------------------

_SRC_CONTAM_SQL = (
    "WITH p AS (\n" + _JACCARD_SQL + "\n)\n"
    + """
SELECT LEAST(da.source, db.source) AS src_a,
       GREATEST(da.source, db.source) AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p JOIN documents da ON da.doc_id = p.id_a
       JOIN documents db ON db.doc_id = p.id_b
GROUP BY 1, 2 ORDER BY 1, 2
"""
)


@query("q184_source_contamination", sql=_SRC_CONTAM_SQL)
def q184_source_contamination(sf_dir: str):
    """Cross-source contamination map: q14's exact near-dup pairs
    attributed to SOURCE pairs — which feeds copy from each other (the
    question a mixture designer asks before deduplicating within vs
    across sources; diagonal entries are internal duplication).
    Composition: the result-sized pair list + a broadcast doc→source
    lookup restricted to pair-involved docs (`pc.is_in` scan, never the
    corpus); finish is |sources|²-bounded."""
    pairs = QUERIES["q14_ngram_jaccard"](sf_dir)
    if hasattr(pairs, "to_pandas"):
        pairs = pairs.to_pandas()
    ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    need = pa.array(ids, pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=need)).select(
            ["doc_id", "source"]
        )

    src_df = (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    src = dict(zip(src_df["doc_id"], src_df["source"]))
    sa = [src[int(i)] for i in pairs["id_a"]]
    sb = [src[int(i)] for i in pairs["id_b"]]
    pairs["src_a"] = [min(x, y) for x, y in zip(sa, sb)]
    pairs["src_b"] = [max(x, y) for x, y in zip(sa, sb)]
    out = (
        pairs.groupby(["src_a", "src_b"], as_index=False)
        .agg(n_pairs=("id_a", "size"))
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Co-purchase pair mining (A-Priori over order baskets)
# --------------------------------------------------------------------------

BASKET_SUPPORT = 3

_COPURCHASE_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
singles AS (SELECT l_partkey FROM b GROUP BY 1
            HAVING COUNT(*) >= {BASKET_SUPPORT}),
fb AS (SELECT l_orderkey, l_partkey FROM b JOIN singles USING (l_partkey)),
p AS (SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM fb a JOIN fb b2 ON a.l_orderkey = b2.l_orderkey
                          AND a.l_partkey < b2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {BASKET_SUPPORT})
SELECT part_a, part_b, support FROM p ORDER BY part_a, part_b
"""


@query("q185_copurchase", sql=_COPURCHASE_SQL)
def q185_copurchase(sf_dir: str):
    """Frequent co-purchase pairs (A-Priori, Agrawal & Srikant 1994):
    part pairs ordered together in ≥ {BASKET_SUPPORT} orders.  The
    A-Priori downward-closure prune runs first — a part pair can only
    be frequent if BOTH parts are (a combiner count exchange +
    broadcast frequent-item set, which on skewed real catalogs kills
    most of the basket volume before any pair exists).  Then ONE
    order-keyed exchange assembles baskets (per-order C(k,2) with k =
    basket size, never catalog²) and a pair-keyed exchange counts
    support."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_rows = ds.count()

    def distinct_pairs_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    b = bucketed_groupby(
        ds.map_batches(distinct_pairs_partial, batch_format="pandas"),
        ["l_orderkey", "l_partkey"],
        lambda g: g.drop_duplicates(),
        expected_rows=n_rows,
    ).materialize()

    # A-Priori phase 1: frequent single items
    singles = bucketed_groupby(
        b, "l_partkey",
        lambda g: g.groupby("l_partkey", sort=False).size().rename("c")
        .reset_index(),
        expected_rows=n_rows,
    ).to_pandas().groupby("l_partkey", as_index=False)["c"].sum()
    freq = pa.array(
        singles[singles["c"] >= BASKET_SUPPORT]["l_partkey"].astype("int64"),
        pa.int64(),
    )

    def keep_freq(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["l_partkey"], value_set=freq))

    # phase 2: baskets -> pairs -> support
    def basket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby("l_orderkey", sort=False):
            parts = np.sort(sub["l_partkey"].unique())
            k = len(parts)
            if k < 2:
                continue
            ia, ib = np.triu_indices(k, k=1)
            outs.append(pd.DataFrame({"part_a": parts[ia], "part_b": parts[ib]}))
        if not outs:
            return pd.DataFrame({"part_a": pd.Series([], dtype="int64"),
                                 "part_b": pd.Series([], dtype="int64")})
        return pd.concat(outs)

    pairs = bucketed_groupby(
        b.map_batches(keep_freq, batch_format="pyarrow"),
        "l_orderkey", basket_pairs, expected_rows=n_rows * 4,
    )
    supp = (
        bucketed_groupby(
            pairs, ["part_a", "part_b"],
            lambda g: g.groupby(["part_a", "part_b"], sort=False).size()
            .rename("support").reset_index(),
            expected_rows=n_rows * 8,
        )
        .to_pandas()
        .groupby(["part_a", "part_b"], as_index=False)["support"].sum()
    )
    out = supp[supp["support"] >= BASKET_SUPPORT].sort_values(
        ["part_a", "part_b"]
    ).reset_index(drop=True)
    for c in ("part_a", "part_b", "support"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve (user activity lifetime, right-censored)
# --------------------------------------------------------------------------

_KM_SQL = f"""
WITH RECURSIVE
u AS (SELECT user_id,
             CAST(datediff('day', MIN(CAST(ts AS DATE)),
                           MAX(CAST(ts AS DATE))) AS BIGINT) AS dur,
             CAST(MAX(CAST(ts AS DATE)) =
                  (SELECT MAX(CAST(ts AS DATE)) FROM events) AS INT) AS cens
      FROM events GROUP BY 1),
g AS (SELECT dur AS t, CAST(SUM(1 - cens) AS BIGINT) AS d_t,
             CAST(COUNT(*) AS BIGINT) AS m_t
      FROM u GROUP BY 1),
e AS (SELECT t, d_t,
             CAST((SELECT SUM(m_t) FROM g g2 WHERE g2.t >= g.t) AS BIGINT) AS n_t
      FROM g WHERE d_t > 0),
ord AS (SELECT t, d_t, n_t, ROW_NUMBER() OVER (ORDER BY t) AS rn FROM e),
rec AS (
  SELECT rn, t, d_t, n_t,
         CAST({PPM} * (n_t - d_t) // n_t AS BIGINT) AS s
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.t, o.d_t, o.n_t,
         CAST(r.s * (o.n_t - o.d_t) // o.n_t AS BIGINT)
  FROM ord o JOIN rec r ON o.rn = r.rn + 1
)
SELECT t AS t_days, n_t AS n_risk, d_t AS n_events, s AS surv_ppm
FROM rec ORDER BY t_days
"""


@query("q186_kaplan_meier", sql=_KM_SQL)
def q186_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) of user
    activity lifetime with right censoring: duration = days between a
    user's first and last event; users whose last event falls on the
    corpus's final day are censored (still alive).  S(t) steps by the
    exact integer recurrence s <- s*(n_t-d_t)//n_t at each uncensored
    event time (floor at every step, mirrored by the oracle's recursive
    CTE).  Distribution: per-user first/last is a combiner min/max
    (ONE users-keyed exchange); the curve itself is a pure function of
    the duration GRID — (dur, censored) counts, day-range-sized — so
    event volume never reaches the driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pd.DataFrame({"user_id": df["user_id"], "day": d})

    from texrex_ray.ops.aggregate import bucketed_groupby

    n_ev = ds.count()  # metadata-only on parquet
    u = bucketed_groupby(
        ds.map_batches(to_days, batch_format="pandas"),
        "user_id",
        lambda g: g.groupby("user_id", as_index=False)["day"]
        .agg(["min", "max"])
        .rename(columns={"min": "mn", "max": "mx"}),
        expected_rows=n_ev,
    ).materialize()  # users-sized
    gmax = int(u.max("mx"))

    def grid_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "t": (df["mx"] - df["mn"]).astype(np.int64),
                    "cens": (df["mx"] == gmax).astype(np.int64),
                }
            )
            .groupby(["t", "cens"], sort=False)
            .size()
            .rename("m")
            .reset_index()
        )

    grid = (
        u.map_batches(grid_partial, batch_format="pandas")
        .to_pandas()  # day-grid-sized
        .groupby(["t", "cens"], as_index=False)["m"]
        .sum()
    )
    per_t = (
        grid.assign(d=np.where(grid["cens"] == 0, grid["m"], 0))
        .groupby("t", as_index=False)
        .agg(d_t=("d", "sum"), m_t=("m", "sum"))
        .sort_values("t")
    )
    # n_t = users with dur >= t (suffix sum over the grid)
    suffix = per_t["m_t"][::-1].cumsum()[::-1].to_numpy()
    s = PPM
    rows = []
    for t, d_t, n_t in zip(per_t["t"], per_t["d_t"], suffix):
        if int(d_t) == 0:
            continue
        t, d_t, n_t = int(t), int(d_t), int(n_t)
        s = s * (n_t - d_t) // n_t
        rows.append((t, n_t, d_t, s))
    return pd.DataFrame(
        rows, columns=["t_days", "n_risk", "n_events", "surv_ppm"]
    ).astype("int64")


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) distribution-shift test between source pairs
# --------------------------------------------------------------------------

_MWU_SQL = """
WITH v AS (SELECT source, n_chars FROM documents),
s AS (SELECT DISTINCT source FROM v),
p AS (SELECT a.source AS src_a, b.source AS src_b
      FROM s a JOIN s b ON a.source < b.source),
j AS (SELECT p.src_a, p.src_b, v.source, v.n_chars
      FROM p JOIN v ON v.source IN (p.src_a, p.src_b)),
r AS (SELECT src_a, src_b, source,
             CAST(2 * RANK() OVER (PARTITION BY src_a, src_b ORDER BY n_chars)
                  + COUNT(*) OVER (PARTITION BY src_a, src_b, n_chars)
                  - 1 AS HUGEINT) AS r2
      FROM j),
agg AS (SELECT src_a, src_b,
               SUM(CASE WHEN source = src_a THEN r2 ELSE 0 END) AS r2a,
               SUM(CASE WHEN source = src_a THEN 1 ELSE 0 END)::HUGEINT AS na,
               SUM(CASE WHEN source = src_b THEN 1 ELSE 0 END)::HUGEINT AS nb
        FROM r GROUP BY 1, 2)
SELECT src_a, src_b, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(LEAST(r2a - na * (na + 1),
                  2 * na * nb - (r2a - na * (na + 1))) AS BIGINT) AS u2_min
FROM agg ORDER BY 1, 2
"""


@query("q187_mannwhitney", sql=_MWU_SQL)
def q187_mannwhitney(sf_dir: str):
    """Mann-Whitney U rank-sum test statistic between every source pair
    over document length — the nonparametric distribution-shift check a
    mixture designer runs before pooling feeds (q161's KS twin, but
    tie-exact and integer).  Average ranks are half-integers, so both
    engines carry 2x the rank sum: u2_min = min(U2_a, U2_b) with
    U2_a = R2_a - n_a(n_a+1) and U2_a + U2_b = 2*n_a*n_b.  Like q183,
    the statistic is a pure function of the per-source VALUE HISTOGRAMS:
    one count exchange builds them, and all |sources|^2/2 pair
    statistics close on the driver from histogram merges — the corpus
    is never pairwise-replicated (the oracle replicates it; the engine
    must not)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["source", "n_chars"], sort=False).size().rename("c")
            .reset_index()
        )

    hist = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["source", "n_chars"],
            lambda g: g.groupby(["source", "n_chars"], sort=False)["c"].sum()
            .reset_index(),
            expected_rows=ds.count(),
        )
        .to_pandas()
        .groupby(["source", "n_chars"], as_index=False)["c"].sum()
    )
    hists = {
        src: dict(zip(sub["n_chars"].astype(int), sub["c"].astype(int)))
        for src, sub in hist.groupby("source")
    }
    rows = []
    for src_a in sorted(hists):
        for src_b in sorted(hists):
            if src_a >= src_b:
                continue
            ha, hb = hists[src_a], hists[src_b]
            na, nb = sum(ha.values()), sum(hb.values())
            r2a = 0
            seen = 0  # combined count of strictly-smaller values
            for v in sorted(set(ha) | set(hb)):
                ca, cb = ha.get(v, 0), hb.get(v, 0)
                tie = ca + cb
                # 2 * average rank of the tie group starting at seen+1
                r2 = 2 * (seen + 1) + tie - 1
                r2a += ca * r2
                seen += tie
            u2a = r2a - na * (na + 1)
            rows.append((src_a, src_b, na, nb, min(u2a, 2 * na * nb - u2a)))
    out = pd.DataFrame(
        rows, columns=["src_a", "src_b", "n_a", "n_b", "u2_min"]
    )
    for c in ("n_a", "n_b", "u2_min"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Markov stationary distribution of the event-type chain (power iteration)
# --------------------------------------------------------------------------

_MARKOV_ITERS = 12


def _markov_sql() -> str:
    its = [
        f"it0 AS (SELECT event_type, CAST({PPM} // (SELECT COUNT(*) FROM t)"
        " AS BIGINT) AS pi FROM t)"
    ]
    for k in range(1, _MARKOV_ITERS + 1):
        its.append(
            f"it{k} AS (SELECT m.to_type AS event_type, "
            f"CAST(SUM(it{k-1}.pi * m.p_ppm // {PPM}) AS BIGINT) AS pi "
            f"FROM it{k-1} JOIN m ON m.from_type = it{k-1}.event_type "
            "GROUP BY 1)"
        )
    return f"""
WITH seq AS (SELECT user_id, event_type,
                    lead(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS nxt
             FROM events),
m0 AS (SELECT event_type AS from_type, nxt AS to_type,
              CAST(COUNT(*)::HUGEINT * {PPM}
                   // SUM(COUNT(*)) OVER (PARTITION BY event_type)::HUGEINT
                   AS BIGINT) AS p_ppm
       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT DISTINCT event_type FROM events),
m AS (SELECT * FROM m0
      UNION ALL
      SELECT event_type, event_type, {PPM} FROM t
      WHERE event_type NOT IN (SELECT DISTINCT from_type FROM m0)),
{", ".join(its)}
SELECT t.event_type, COALESCE(f.pi, 0) AS pi_ppm
FROM t LEFT JOIN it{_MARKOV_ITERS} f USING (event_type) ORDER BY 1
"""


@query("q188_markov_stationary", sql=_markov_sql())
def q188_markov_stationary(sf_dir: str):
    """Stationary distribution of q156's event-type Markov chain by
    integer power iteration: pi <- pi P with floor-per-term ppm
    arithmetic ({_MARKOV_ITERS} iterations, uniform start, dangling
    types get a self-loop) — the long-run state occupancy that turns
    the transition matrix into a behavior fingerprint (crawl twin:
    steady-state fetch/redirect/error shares).  ONE corpus exchange
    (q156's user-keyed successor counting) builds the |types|^2 matrix;
    the iteration runs on the driver over that tiny matrix.  Oracle:
    the SAME iterations unrolled as {_MARKOV_ITERS} SQL joins (the q70
    pattern — independent implementations, bit-identical algebra)."""
    trans = QUERIES["q156_event_transitions"](sf_dir)
    if hasattr(trans, "to_pandas"):
        trans = trans.to_pandas()
    types = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    idx = {t: i for i, t in enumerate(types)}
    n = len(types)
    M = np.zeros((n, n), dtype=np.int64)
    for f, t, p in zip(trans["from_type"], trans["to_type"], trans["p_ppm"]):
        M[idx[f], idx[t]] = int(p)
    dangling = ~np.isin(types, trans["from_type"].unique())
    for i in np.flatnonzero(dangling):
        M[i, i] = PPM
    pi = np.full(n, PPM // n, dtype=np.int64)
    for _ in range(_MARKOV_ITERS):
        pi = ((pi[:, None] * M) // PPM).sum(axis=0)
    return pd.DataFrame({"event_type": types, "pi_ppm": pi.astype("int64")})


# --------------------------------------------------------------------------
# Fagin's Threshold Algorithm: certified top-k over two ranked score lists
# --------------------------------------------------------------------------

TA_K = 10
TA_EVENT_WEIGHT = 500  # cents credited per event in the combined score


_TA_SQL = f"""
WITH s AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v_c,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT user_id, v_c, n, v_c + {TA_EVENT_WEIGHT} * n AS score
FROM s ORDER BY score DESC, user_id LIMIT {TA_K}
"""


@query("q189_ta_topk", sql=_TA_SQL)
def q189_ta_topk(sf_dir: str):
    """Fagin's Threshold Algorithm (Fagin, Lotem & Naor 2001): certified
    top-{TA_K} users by combined score (value cents + {TA_EVENT_WEIGHT}
    x event count) WITHOUT ranking the full population.  Two users-sized
    score lists are sorted once (distributed sorts); the driver then
    streams matching prefixes in chunks, and stops as soon as the k-th
    candidate's full score strictly exceeds the threshold
    tau = v_c(depth) + {TA_EVENT_WEIGHT}*n(depth) — every unseen user is
    bounded by tau per list monotonicity, so at 10^9 users the scan
    depth stays O(k)-ish while the oracle's ORDER BY ranks everyone.
    Ties degrade gracefully to a deeper (still correct) scan."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "vc": vc})
            .groupby("user_id", sort=False)["vc"]
            .agg(["sum", "size"])
            .reset_index()
            .rename(columns={"sum": "v_c", "size": "n"})
        )

    from texrex_ray.ops.aggregate import bucketed_groupby

    n_ev = ds.count()  # metadata-only on parquet
    u = bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id",
        lambda g: g.groupby("user_id", as_index=False)[["v_c", "n"]].sum(),
        expected_rows=n_ev,
    ).materialize()  # users-sized
    n_users = u.count()
    by_v = u.sort("v_c", descending=True).materialize()
    by_n = u.sort("n", descending=True).materialize()

    cand: dict[int, tuple[int, int]] = {}
    depth = 0
    while True:
        depth = min(n_users, depth + max(4 * TA_K, 64))
        tv = by_v.take(depth)
        tn = by_n.take(depth)
        for r in tv + tn:
            cand[int(r["user_id"])] = (int(r["v_c"]), int(r["n"]))
        tau = int(tv[-1]["v_c"]) + TA_EVENT_WEIGHT * int(tn[-1]["n"])
        best = sorted(
            ((vc + TA_EVENT_WEIGHT * n, uid, vc, n) for uid, (vc, n) in cand.items()),
            key=lambda t: (-t[0], t[1]),
        )[:TA_K]
        if depth >= n_users or (len(best) == TA_K and best[-1][0] > tau):
            break
    return pd.DataFrame(
        [(uid, vc, n, sc) for sc, uid, vc, n in best],
        columns=["user_id", "v_c", "n", "score"],
    ).astype("int64")


# --------------------------------------------------------------------------
# Benford first-digit audit (data-forensics screen over order values)
# --------------------------------------------------------------------------

# floor(log10(1 + 1/d) * PPM) — shared literal constants on both engines
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}

_BENFORD_SQL = f"""
WITH d AS (SELECT CAST(LEFT(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1) AS BIGINT) AS digit
           FROM orders WHERE o_totalprice >= 1),
o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*)::HUGEINT * {PPM}
                  // SUM(COUNT(*)) OVER ()::HUGEINT AS BIGINT) AS obs_ppm
      FROM d GROUP BY 1),
b AS (SELECT * FROM (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())})
      AS t(digit, benford_ppm))
SELECT b.digit, COALESCE(o.n, 0) AS n, COALESCE(o.obs_ppm, 0) AS obs_ppm,
       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(ABS(COALESCE(o.obs_ppm, 0) - b.benford_ppm) AS BIGINT) AS dev_ppm
FROM b LEFT JOIN o USING (digit) ORDER BY b.digit
"""


@query("q190_benford", sql=_BENFORD_SQL)
def q190_benford(sf_dir: str):
    """Benford's-law first-digit audit over order values — the
    data-forensics screen for fabricated or truncated numeric feeds
    (Benford 1938; a synthetic price generator fails it in exactly the
    way this table shows).  The expected ppm shares are shared literal
    constants; observed shares are integer ppm of the digit histogram.
    ONE combiner count exchange (9 partial rows per batch), digit-grid
    finish — corpus-size-independent."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].to_numpy()
        x = np.floor(v[v >= 1]).astype(np.int64)
        first = pd.Series(x).astype(str).str[0].astype(np.int64)
        return first.value_counts().rename_axis("digit").rename("n").reset_index()

    cnt = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()  # digit-grid-sized partials
        .groupby("digit", as_index=False)["n"]
        .sum()
    )
    total = int(cnt["n"].sum())
    full = pd.DataFrame({"digit": list(_BENFORD_PPM)})
    out = full.merge(cnt, on="digit", how="left").fillna({"n": 0})
    out["n"] = out["n"].astype("int64")
    out["obs_ppm"] = [int(n) * PPM // total if total else 0 for n in out["n"]]
    out["benford_ppm"] = [_BENFORD_PPM[d] for d in out["digit"]]
    out["dev_ppm"] = (out["obs_ppm"] - out["benford_ppm"]).abs()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("digit").reset_index(drop=True)


# --------------------------------------------------------------------------
# CUBE grouping sets (completes q105's ROLLUP to the full lattice)
# --------------------------------------------------------------------------


@query(
    "q191_cube",
    sql=f"""
    SELECT COALESCE(source, '{_ALL}') AS source,
           COALESCE(lang, '{_ALL}') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY CUBE(source, lang) ORDER BY 1, 2
    """,
)
def q191_cube(sf_dir: str):
    """GROUP BY CUBE(source, lang): the full grouping-set lattice —
    q105's ROLLUP plus the (·, lang) marginal — in the same ONE corpus
    pass: each batch emits partial rows for all four grouping sets with
    the '__all__' sentinel and one grouping-sets-sized keyed exchange
    sums them.  4x partial rows per batch beats four corpus scans; the
    exchange never sees the corpus."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "lang": t["lang"].to_pylist(),
                "ch": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        outs = []
        for cols in (["source", "lang"], ["source"], ["lang"], []):
            g = df.groupby(cols, sort=False)["ch"].agg(["size", "sum"]).reset_index() \
                if cols else pd.DataFrame(
                    {"size": [len(df)], "sum": [int(df["ch"].sum())]}
                )
            if "source" not in g:
                g["source"] = _ALL
            if "lang" not in g:
                g["lang"] = _ALL
            outs.append(g[["source", "lang", "size", "sum"]])
        allg = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(
            allg.rename(columns={"size": "pn", "sum": "pc"}), preserve_index=False
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("pn", alias_name="n_docs"), Sum("pc", alias_name="sum_chars"))
        .to_pandas()  # grouping-sets-sized
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_chars"):
        merged[c] = merged[c].astype("int64")
    return merged[["source", "lang", "n_docs", "sum_chars"]]


# --------------------------------------------------------------------------
# Frequent event-type episodes (trigram sequential patterns per user)
# --------------------------------------------------------------------------

EPISODE_SUPPORT = 5

_EPISODE_SQL = f"""
WITH s AS (SELECT user_id, event_type AS e1,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3 HAVING COUNT(*) >= {EPISODE_SUPPORT}
ORDER BY 1, 2, 3
"""


@query("q192_episodes", sql=_EPISODE_SQL)
def q192_episodes(sf_dir: str):
    """Frequent behavioral episodes: consecutive event-type TRIGRAMS per
    user with support >= {EPISODE_SUPPORT} (the GSP/sequential-pattern
    step above q156's bigram transitions — the unit a funnel designer
    or crawl-loop detector actually reads).  Successor trigrams are a
    per-user fact: ONE user-keyed bucketed exchange sorts each bucket's
    users, double-shifts within user, and emits trigram count partials;
    the finish is pattern-grid-sized (<= |types|^3)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"]
        e2 = g.shift(-1)
        e3 = g.shift(-2)
        keep = e3.notna()
        tri = pd.DataFrame(
            {"e1": df["event_type"][keep], "e2": e2[keep], "e3": e3[keep]}
        )
        return (
            tri.groupby(["e1", "e2", "e3"], sort=False).size().rename("n")
            .reset_index()
        )

    out = (
        bucketed_groupby(ds, "user_id", combine, expected_rows=ds.count())
        .to_pandas()  # pattern-grid-sized
        .groupby(["e1", "e2", "e3"], as_index=False)["n"]
        .sum()
    )
    out = out[out["n"] >= EPISODE_SUPPORT].sort_values(["e1", "e2", "e3"])
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# Exponential smoothing of the daily event series (integer Brown/Holt)
# --------------------------------------------------------------------------

_SMOOTH_SQL = f"""
WITH RECURSIVE
d AS (SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             AS BIGINT) AS day FROM events),
grid AS (SELECT unnest(generate_series((SELECT MIN(day) FROM d),
                                       (SELECT MAX(day) FROM d))) AS day),
c AS (SELECT grid.day, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
      FROM grid LEFT JOIN (SELECT day, COUNT(*) AS n FROM d GROUP BY 1) cnt
      USING (day)),
ord AS (SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM c),
rec AS (
  SELECT rn, day, n, n AS s FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.day, o.n, (o.n + 3 * r.s) // 4
  FROM ord o JOIN rec r ON o.rn = r.rn + 1
)
SELECT day, n, CAST(s AS BIGINT) AS smooth FROM rec ORDER BY day
"""


@query("q193_exp_smoothing", sql=_SMOOTH_SQL)
def q193_exp_smoothing(sf_dir: str):
    """Simple exponential smoothing (Brown 1956) of the daily event
    series with alpha = 1/4 as the exact integer recurrence
    s <- (x + 3s)//4 over the COMPLETE zero-filled day grid (missing
    days smooth toward zero, which is what a traffic monitor wants) —
    the denoised load curve recrawl/capacity planning reads instead of
    the raw spikes q178 changepoints.  ONE day-keyed count exchange
    builds the grid; the recurrence is inherently serial but grid-sized,
    so it closes on the driver (oracle: the same floors in a recursive
    CTE)."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return (
            pd.Series(d).value_counts().rename_axis("day").rename("n")
            .reset_index()
        )

    cnt = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()  # day-grid-sized partials
        .groupby("day", as_index=False)["n"]
        .sum()
    )
    days = np.arange(int(cnt["day"].min()), int(cnt["day"].max()) + 1)
    n = np.zeros(len(days), dtype=np.int64)
    n[cnt["day"].to_numpy() - days[0]] = cnt["n"].to_numpy()
    s = int(n[0])
    smooth = [s]
    for x in n[1:]:
        s = (int(x) + 3 * s) // 4
        smooth.append(s)
    return pd.DataFrame(
        {"day": days, "n": n, "smooth": np.array(smooth, dtype=np.int64)}
    ).astype("int64")


# --------------------------------------------------------------------------
# Mutual-nearest-neighbor embedding alignment (cross-set reciprocal NN)
# --------------------------------------------------------------------------

_MUTUAL_NN_SQL = """
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
ab AS (SELECT a.vec_id AS aid, b.vec_id AS bid
       FROM a CROSS JOIN b
       QUALIFY row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) DESC,
                    b.vec_id ASC) = 1),
ba AS (SELECT b.vec_id AS bid, a.vec_id AS aid
       FROM b CROSS JOIN a
       QUALIFY row_number() OVER (
           PARTITION BY b.vec_id
           ORDER BY list_cosine_similarity(b.embedding::DOUBLE[],
                                           a.embedding::DOUBLE[]) DESC,
                    a.vec_id ASC) = 1)
SELECT ab.aid AS id_a, ab.bid AS id_b
FROM ab JOIN ba ON ab.aid = ba.aid AND ab.bid = ba.bid
ORDER BY id_a
"""


@query("q194_mutual_nn", sql=_MUTUAL_NN_SQL)
def q194_mutual_nn(sf_dir: str):
    """Mutual-nearest-neighbor alignment between two embedding sets
    (even vs odd vec_ids as the deterministic split): pairs (a, b)
    where each is the other's argmax-cosine neighbor — the reciprocal
    filter that turns one-directional NN into high-precision anchors
    (bitext mining / cross-snapshot entity alignment, Artetxe & Schwenk
    2019).  Both directions run the blockwise-refs exact-NN plan
    (``dedup/embed.py::cross_nearest_neighbors``): the target side is
    materialized once, only block REFS circulate, per-task memory is
    one batch + one block; the reciprocal check is an anchors-sized
    merge."""
    from texrex_ray.dedup.embed import cross_nearest_neighbors

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _parity(p: int):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["vec_id"], 1), p)
            return t.filter(keep)

        return f

    a = ds.map_batches(_parity(0), batch_format="pyarrow")
    b = ds.map_batches(_parity(1), batch_format="pyarrow")
    ab = cross_nearest_neighbors(a, b).rename(
        columns={"src_id": "id_a", "nn_id": "id_b"}
    )
    ba = cross_nearest_neighbors(b, a).rename(
        columns={"src_id": "id_b", "nn_id": "id_a"}
    )
    out = ab.merge(ba, on=["id_a", "id_b"]).sort_values("id_a")
    return out.reset_index(drop=True).astype("int64")


# --------------------------------------------------------------------------
# Flesch readability scoring (integer heuristic, corpus quality signal)
# --------------------------------------------------------------------------

_FLESCH_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS words,
         CAST(GREATEST(length(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sentences,
         CAST(length(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
              AS syllables
  FROM documents)
SELECT doc_id, words, sentences, syllables,
       CAST(206835 - 1015 * words // sentences
                   - 84600 * syllables // words AS BIGINT) AS flesch_milli
FROM c WHERE words > 0 ORDER BY doc_id
"""


@query("q195_readability", sql=_FLESCH_SQL)
def q195_readability(sf_dir: str):
    """Flesch reading-ease per document as an exact integer heuristic
    (milli-points): 206.835 - 1.015 w/s - 84.6 syl/w with vowel-group
    runs as the syllable proxy and [.!?]+ runs as sentences — the
    readability floor a training-data quality gate applies alongside
    q58/q63.  Pure per-row map: vectorized regex counts in ONE fused
    Arrow pass, zero exchanges; floors ordered identically on both
    engines (1015*w//s, 84600*syl//w)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = df["text"].str.count(r"[A-Za-z]+").to_numpy().astype(np.int64)
        s = np.maximum(
            df["text"].str.count(r"[.!?]+").to_numpy().astype(np.int64), 1
        )
        syl = df["text"].str.count(r"[aeiouAEIOU]+").to_numpy().astype(np.int64)
        keep = w > 0
        fm = 206835 - 1015 * w[keep] // s[keep] - 84600 * syl[keep] // w[keep]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep],
                "words": w[keep],
                "sentences": s[keep],
                "syllables": syl[keep],
                "flesch_milli": fm,
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")
