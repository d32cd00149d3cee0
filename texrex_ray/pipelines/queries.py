"""Driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2 (or a training-data
op from the build brief), implemented Ray-Data-first, with — where the
semantics are ANSI-SQL-expressible — an equivalent DuckDB SQL string over
the same parquet tables.  Column names match exactly between both sides;
float aggregates are emitted as scaled BIGINT cents so value-hash
comparison is precision-safe.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(x) -> int:
    return int(round(float(x) * 100))


# --------------------------------------------------------------------------
# Aggregation (partial-agg groupby; reference analogue: the per-stage stats
# counters, trworker.pas:160-193, and tender's pair counting)
# --------------------------------------------------------------------------

@query(
    "q01_lineitem_agg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT)                      AS sum_qty_c,
           CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT)                 AS sum_base_c,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_c,
           COUNT(*)                                                          AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with vectorized derived column."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base"),
            Sum("disc_price", alias_name="sum_disc"),
            Count(alias_name="count_order"),
        )
    )
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    for src, dst in (("sum_qty", "sum_qty_c"), ("sum_base", "sum_base_c"), ("sum_disc", "sum_disc_c")):
        df[dst] = df[src].map(_cents).astype("int64")
    return df[["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c", "sum_disc_c", "count_order"]]


TOKEN_SQL = "regexp_extract_all(lower(text), '[a-z]+')"
_TOKEN_RE = re.compile(r"[a-z]+")


@query(
    "q02_top_tokens",
    sql=f"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest({TOKEN_SQL}) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q02_top_tokens(sf_dir: str):
    """Global top-20 token frequencies: per-batch partial counts → groupby sum.

    Reference analogue: per-doc top-N type counts (trwritetools.pas:281-300),
    lifted to a corpus-global top-k with combiner-style pre-aggregation so
    the shuffle moves (token, partial_count) rows, not tokens.
    """
    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[str] = Counter()
        for s in t["text"].to_pylist():
            c.update(_TOKEN_RE.findall((s or "").lower()))
        toks = list(c.keys())
        return pa.table({"token": toks, "pn": pa.array([c[k] for k in toks], pa.int64())})

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
    )
    df = agg.to_pandas().sort_values(["n", "token"], ascending=[False, True]).head(20)
    return df.reset_index(drop=True)[["token", "n"]]


@query(
    "q03_exact_dedup",
    sql="""
    SELECT MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def q03_exact_dedup(sf_dir: str):
    """Exact dedup, keep-first (min id) per content hash.

    Reference analogue: DuplicateDetector's first-wins Bloom dedup
    (trduplicatedetector.pas:114-122) re-expressed as hash groupby + min —
    the Ray-idiomatic batch variant (SURVEY.md §2.2#1 option b).
    """
    from texrex_ray.dedup.exact import exact_dedup_keep_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_keep_ids(ds, id_col="doc_id", text_col="text")


@query(
    "q04_doc_stats",
    sql=f"""
    SELECT doc_id,
           len({TOKEN_SQL}) AS n_tokens,
           len(list_distinct({TOKEN_SQL})) AS n_types
    FROM documents
    """,
)
def q04_doc_stats(sf_dir: str):
    """Per-document token/type counting (token counting op of the brief)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = [_TOKEN_RE.findall((s or "").lower()) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array([len(x) for x in toks], pa.int64()),
                "n_types": pa.array([len(set(x)) for x in toks], pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


@query(
    "q05_lang_agg",
    sql="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q05_lang_agg(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    return out.to_pandas().sort_values("lang").reset_index(drop=True)


# --------------------------------------------------------------------------
# Joins (broadcast small side — reference analogue: tecl §2.5, geolocation)
# --------------------------------------------------------------------------

@query(
    "q06_customer_nation_join",
    sql="""
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(c.c_acctbal) * 100) AS BIGINT) AS sum_acctbal_c
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q06_customer_nation_join(sf_dir: str):
    """Broadcast hash join: tiny nation table shipped once via ray.put;
    per-batch lookup is a vectorized searchsorted over the sorted keys."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation = nation.sort_values("n_nationkey")
    lookup_ref = ray.put(
        (nation["n_nationkey"].to_numpy(np.int64), nation["n_name"].to_numpy())
    )
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def attach(t: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        idx = np.searchsorted(keys, t["c_nationkey"].to_numpy(zero_copy_only=False))
        return t.append_column("n_name", pa.array(names[idx], pa.string()))

    out = (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="sum_acctbal"))
    )
    df = out.to_pandas().sort_values("n_name").reset_index(drop=True)
    df["sum_acctbal_c"] = df["sum_acctbal"].map(_cents).astype("int64")
    return df[["n_name", "n_customers", "sum_acctbal_c"]]


@query(
    "q07_orders_anti_join",
    sql="""
    SELECT o.o_orderkey
    FROM orders o
    WHERE o.o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q07_orders_anti_join(sf_dir: str):
    """Broadcast anti-join (tecl blacklist mode, trteclapplication.pas:248-368).
    Membership test is Arrow ``pc.is_in`` against the broadcast value set —
    a hash probe in C, not a Python loop."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    black = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    black_ref = ray.put(pa.array(black.unique()))
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def anti(t: pa.Table) -> pa.Table:
        b = ray.get(black_ref)
        mask = pc.is_in(t["o_custkey"], value_set=b)
        return t.filter(pc.invert(mask)).select(["o_orderkey"])

    return ds.map_batches(anti, batch_format="pyarrow")


@query(
    "q08_orders_semi_join",
    sql="""
    SELECT o.o_orderkey
    FROM orders o
    WHERE o.o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def q08_orders_semi_join(sf_dir: str):
    """Broadcast semi-join (tecl --white mode), vectorized via pc.is_in."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    white = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    white_ref = ray.put(pa.array(white.unique()))
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def semi(t: pa.Table) -> pa.Table:
        w = ray.get(white_ref)
        mask = pc.is_in(t["o_custkey"], value_set=w)
        return t.filter(mask).select(["o_orderkey"])

    return ds.map_batches(semi, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Windowed aggregation over the events stream
# --------------------------------------------------------------------------

@query(
    "q09_events_window",
    sql="""
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_c
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q09_events_window(sf_dir: str):
    """Tumbling 1-hour window per event type (streaming-shaped op).

    The reference has no windowing (SURVEY.md §2.7); this is the brief's
    windowed-aggregate addition, done as truncate → partial agg → groupby.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        epoch = pc.divide(pc.cast(win, pa.int64()), pa.scalar(1_000_000, pa.int64()))
        return pa.table(
            {"event_type": t["event_type"], "window_start": epoch, "value": t["value"]}
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    df = out.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    df["sum_value_c"] = df["sum_value"].map(_cents).astype("int64")
    return df[["event_type", "window_start", "n_events", "sum_value_c"]]


@query(
    "q10_user_sessions",
    sql="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
)
def q10_user_sessions(sf_dir: str):
    """Session windows (30-min gap) per user via ``ops.session_count`` —
    a coarse-bucket combine vectorized across every user in the bucket.

    Partitioning assumption: one user's events fit one bucket group
    (holds at any realistic user cardinality; hot users would be salted
    by day).
    """
    from texrex_ray.ops.window import session_count

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = session_count(ds, "user_id", "ts", gap_s=1800, tiebreak="event_id")
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    df["n_sessions"] = df["n_sessions"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df[["user_id", "n_sessions", "n_events"]]


# --------------------------------------------------------------------------
# Near-duplicate detection (tender/tecl, §2.4/2.5) + training-data dedup ops
# --------------------------------------------------------------------------

_GRAMS_CTE = """
    toks AS (SELECT doc_id, n_chars, regexp_extract_all(lower(text), '[a-z]+') t FROM documents),
    grams AS (SELECT DISTINCT doc_id, n_chars, array_to_string(t[i:i+{m}], ' ') g
              FROM toks, unnest(range(1, len(t) - {m1})) AS u(i))
"""

_TENDER_SQL = (
    "WITH "
    + _GRAMS_CTE.format(m=4, m1=3)
    + """,
    grp AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 199),
    pairs AS (SELECT a.doc_id AS id_small, b.doc_id AS id_big, COUNT(*) AS n_shared
              FROM grams a JOIN grams b USING (g) JOIN grp USING (g)
              WHERE (a.n_chars < b.n_chars OR (a.n_chars = b.n_chars AND a.doc_id < b.doc_id))
                AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT id_small, id_big, n_shared FROM pairs WHERE n_shared >= 5
"""
)


@query("q11_near_dup_pairs", sql=_TENDER_SQL)
def q11_near_dup_pairs(sf_dir: str):
    """tender phases 1-3 over exact 5-gram shingles (sort/merge collapses to
    groupby; pair cap 200; smaller-doc-first by (n_chars, doc_id); pair
    threshold 5).  ref: trtenderapplication.pas:340-632."""
    from texrex_ray.dedup.tender import count_pairs, gram_shingles, shingle_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    sh = gram_shingles(ds, n=5)
    pairs = count_pairs(shingle_pairs(sh, max_redundancy=200), pair_threshold=5)
    df = pairs.to_pandas()
    return df.astype({"id_small": "int64", "id_big": "int64", "n_shared": "int64"})


@query(
    "q12_near_dup_survivors",
    sql="SELECT doc_id FROM documents WHERE doc_id NOT IN "
    "(SELECT DISTINCT id_small FROM (" + _TENDER_SQL + "))",
)
def q12_near_dup_survivors(sf_dir: str):
    """tender blacklist → tecl anti-join: documents that survive near-dedup.

    The blacklist (distinct smaller ids of near-dup pairs) is tiny, so it is
    broadcast and applied as a filter inside map_batches — the tecl hash
    anti-join (ref: trteclapplication.pas:248-368)."""
    from texrex_ray.dedup.tender import blacklist, count_pairs, gram_shingles, shingle_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    sh = gram_shingles(ds, n=5)
    pairs = count_pairs(shingle_pairs(sh, max_redundancy=200), pair_threshold=5)
    black_ref = ray.put(pa.array(blacklist(pairs).to_pandas()["id_small"].unique()))

    def anti(t: pa.Table) -> pa.Table:
        b = ray.get(black_ref)
        mask = pc.is_in(t["doc_id"], value_set=b)
        return t.filter(pc.invert(mask)).select(["doc_id"])

    return ds.map_batches(anti, batch_format="pyarrow")


@query(
    "q13_minhash_tender",
    sql="SELECT id_small, id_big, n_shared FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/minhash_tender_sf0.01.parquet')",
)
def q13_minhash_tender(sf_dir: str):
    """The reference's actual tender scheme: 100 Rabin64 minhashes/doc over
    the ported trpoly64 table as the shingle table, pair counting on
    minhash collisions.  ref: trshingler.pas + trtenderapplication.pas.
    Oracle: committed fixture from an independent naive pair-counter over
    the same signatures (tools/gen_oracle_fixtures.py); the hash values
    themselves are pinned against a literal transcription of the reference
    algorithm in tests/test_rabin.py."""
    from texrex_ray.dedup.tender import tender

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    pairs = tender(ds, use_minhash=True, k=100, pair_threshold=5, scheme="rabin")
    df = pairs.to_pandas()
    return df.astype({"id_small": "int64", "id_big": "int64", "n_shared": "int64"})


_JACCARD_SQL = (
    "WITH "
    + _GRAMS_CTE.format(m=2, m1=1)
    + """,
    sizes AS (SELECT doc_id, COUNT(*) sz FROM grams GROUP BY 1),
    inter AS (SELECT a.doc_id ia, b.doc_id ib, COUNT(*) i
              FROM grams a JOIN grams b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT ia AS id_a, ib AS id_b, i AS n_inter,
           (sa.sz + sb.sz - i) AS n_union
    FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
    WHERE i * 2 >= (sa.sz + sb.sz - i)
"""
)


@query("q14_ngram_jaccard", sql=_JACCARD_SQL)
def q14_ngram_jaccard(sf_dir: str):
    """n-gram Jaccard near-dup pairs (3-gram sets, J ≥ 0.5) with integer-exact
    threshold arithmetic (2·|∩| ≥ |∪|), no float compare.

    The per-doc gram-set sizes ride ON the shingle rows (size_from_grams)
    and reduce through the pair groupby (Max of a per-pair constant), so no
    corpus-sized size dict is ever broadcast from the driver."""
    from texrex_ray.dedup.tender import gram_shingles, shingle_pairs
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    n_docs = ds.count()
    sh = gram_shingles(ds, n=3, size_from_grams=True)
    raw = shingle_pairs(
        sh, max_redundancy=10**9, order_by_size=False, carry_sizes=True,
        expected_rows=n_docs * 60,
    )
    # nearly every pair row is its own group (1.27M rows → 1.13M groups at
    # sf0.1), where Ray's native aggregate pays per-group Python overhead
    # (measured 484 s); the bucketed pandas combine is exact and ~2 s.
    pairs = bucketed_groupby(
        raw,
        ["id_small", "id_big"],
        lambda g: g.groupby(["id_small", "id_big"], sort=False)
        .agg(
            n_inter=("size_small", "size"),
            sz_a=("size_small", "max"),
            sz_b=("size_big", "max"),
        )
        .reset_index(),
        expected_rows=n_docs * 250,
    )

    def finish(t: pa.Table) -> pa.Table:
        ni = pc.cast(t["n_inter"], pa.int64())
        nu = pc.cast(
            pc.subtract(pc.add(t["sz_a"], t["sz_b"]), t["n_inter"]), pa.int64()
        )
        out = pa.table(
            {
                "id_a": pc.cast(t["id_small"], pa.int64()),
                "id_b": pc.cast(t["id_big"], pa.int64()),
                "n_inter": ni,
                "n_union": nu,
            }
        )
        return out.filter(pc.greater_equal(pc.multiply(ni, pa.scalar(2, pa.int64())), nu))

    return pairs.map_batches(finish, batch_format="pyarrow")


@query(
    "q15_embed_knn",
    sql="""
    WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 8),
    s AS (SELECT q.qid, e.vec_id nid,
                 list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) sim
          FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
    SELECT qid AS query_id, nid AS neighbor_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
    FROM s QUALIFY rank <= 10 ORDER BY query_id, rank
    """,
)
def q15_embed_knn(sf_dir: str):
    """Brute-force cosine top-10 for query vectors vec_id<8: broadcast query
    matrix, per-batch partial top-k, groupby-reduce (similarity-search op)."""
    from texrex_ray.dedup.embed import knn_bruteforce

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = knn_bruteforce(ds, query_ids=list(range(8)), k=10)
    df["rank"] = df["rank"].astype("int64")
    return df


@query(
    "q16_embed_nn",
    sql="""
    SELECT a.vec_id, b.vec_id AS nn_id
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY a.vec_id
        ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                 b.vec_id ASC) = 1
    ORDER BY a.vec_id
    """,
)
def q16_embed_nn(sf_dir: str):
    """Per-vector argmax-cosine neighbor (embedding near-dup primitive)."""
    from texrex_ray.dedup.embed import nearest_neighbors

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return nearest_neighbors(ds)


@query("q17_minhash_lsh", sql=_JACCARD_SQL)
def q17_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup pairs (banded buckets → candidate docs →
    distributed exact Jaccard ≥ 0.5 verify).  With rows-per-band = 2 the
    candidate recall at J = 0.5 is 1 − (1 − 0.25)^48 ≈ 1 − 1e-6, so the
    verified output equals the exact all-pairs Jaccard join — the oracle
    SQL is the same brute-force join as q14."""
    from texrex_ray.dedup.lsh import minhash_lsh_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # row-count hint (metadata-only on parquet) sizes the candidate-stage
    # bucket count and the pre-exchange coalesce — same policy as tender()
    out = minhash_lsh_pairs(
        ds, k=96, bands=48, n=3, jaccard_threshold=0.5,
        expected_rows=ds.count(),
    )

    def to_int64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "n_inter": t["n_inter"],
                "n_union": t["n_union"],
            }
        )

    return out.map_batches(to_int64, batch_format="pyarrow")


_SIMHASH_FIX = "/root/repo/tests/fixtures/oracle/simhash_sig_sf0.01.parquet"


@query(
    "q18_simhash_dups",
    sql=f"""
    WITH s AS (SELECT * FROM read_parquet('{_SIMHASH_FIX}'))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
    """,
)
def q18_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs, Hamming ≤ 12 with COMPLETE candidate
    generation (13 disjoint bit blocks; pigeonhole guarantees a block
    match within the radius).  Oracle: a committed signature fixture
    (tools/gen_oracle_fixtures.py, sf0.01) over which DuckDB does the
    brute-force O(n²) Hamming join — independently verifying that the
    block-LSH candidate generation misses nothing."""
    from texrex_ray.dedup.lsh import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = simhash_pairs(ds, max_hamming=12)

    def to_int64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.cast(t["id_a"], pa.int64()),
                "id_b": pc.cast(t["id_b"], pa.int64()),
                "hamming": pc.cast(t["hamming"], pa.int64()),
            }
        )

    return out.map_batches(to_int64, batch_format="pyarrow")


def _sf_of(sf_dir: str) -> float:
    import os

    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


@query(
    "q20_image_pipeline",
    sql="SELECT image_id, phash, ok, fmt, w, h FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/image_pipeline_sf0.01.parquet')",
)
def q20_image_pipeline(sf_dir: str):
    """Graft payload: image+caption cleaning pipeline (caption cleanse →
    decode/verify → features → phash dedup) over the deterministic
    synthetic images fixture, scaled by sf.  Oracle: committed expected
    output (regression pin; the PSNR≥40 decode invariant is separately
    asserted in tests)."""
    from texrex_ray.pipelines.caption import fixture_path, image_caption_pipeline
    from texrex_ray.sources.lance_io import read_images

    n = {0.001: 100, 0.01: 300, 0.1: 1000}.get(_sf_of(sf_dir), 300)
    d = fixture_path(n=n, seed=42)
    ds = read_images(f"{d}/images_table")
    out = image_caption_pipeline(ds, batch_size=64)
    df = out.to_pandas()[["image_id", "phash", "ok", "fmt", "w", "h"]]
    return df.sort_values("image_id").reset_index(drop=True)


@query(
    "q21_crawl_visits",
    sql="SELECT seq, url, host, action FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/crawl_visits_sf0.01.parquet')",
)
def q21_crawl_visits(sf_dir: str):
    """ClaraX crawl on the synthetic web graph (single walker, oracle-
    faithful): visit-order table (seq, url, host, action).  Oracle: the
    INDEPENDENT sequential ClaraX reimplementation (crawl/oracle.py)
    produced the committed expected-visits fixture — the engine must
    reproduce its visit order exactly (the north-rule fidelity gate)."""
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.sources.webgraph import make_webgraph

    steps = {0.001: 60, 0.01: 150, 0.1: 400}.get(_sf_of(sf_dir), 150)
    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    eng = CrawlEngine(g, n_walkers=1, n_partitions=4, seed=42, config=CrawlConfig())
    eng.run(max_steps=steps)
    rows = eng.visit_order()
    eng.shutdown()  # release actor CPU reservations (driver session lives on)
    return pd.DataFrame(rows, columns=["seq", "url", "host", "action"])


@query(
    "q24_text_assessment",
    sql="SELECT doc_id, pred_lang, badness_bp FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/text_assessment_sf0.01.parquet')",
)
def q24_text_assessment(sf_dir: str):
    """TextAssessmentMulti over documents: predicted language (argmin
    badness over profiles) + badness in basis points.  Oracle: committed
    fixture from a scalar per-doc recomputation (cleanse → normalize →
    tokenize → assess) that bypasses the Dataset pipeline composition."""
    from texrex_ray.pipelines.clean_documents import clean_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = clean_documents(ds, minhash_k=16).select_columns(["doc_id", "pred_lang", "badness"])
    df = out.to_pandas()
    df["badness_bp"] = (df["badness"] * 10_000).round().astype("int64")
    return df[["doc_id", "pred_lang", "badness_bp"]].sort_values("doc_id").reset_index(drop=True)


@query(
    "q26_range_join",
    sql="""
    WITH bands(band, lo, hi) AS (VALUES
        ('tiny', 0, 10), ('small', 10, 25), ('large', 25, 100)),
    j AS (SELECT b.band, l.l_quantity FROM lineitem l
          JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi)
    SELECT band, COUNT(*) AS n, CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_c
    FROM j GROUP BY band ORDER BY band
    """,
)
def q26_range_join(sf_dir: str):
    """Range join against a broadcast interval table — the geolocator's
    IP-interval binary-search lookup pattern (ref: trgeolocator.pas:131-171)
    demonstrated on lineitem quantity bands via ``ops.range_join``."""
    from texrex_ray.ops import range_join

    bands = pd.DataFrame(
        {"lo": [0.0, 10.0, 25.0], "band": ["tiny", "small", "large"]}
    )
    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    out = (
        range_join(ds, bands, "l_quantity", attach=["band"])
        .groupby("band")
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
    )
    df = out.to_pandas().sort_values("band").reset_index(drop=True)
    df["sum_qty_c"] = df["sum_qty"].map(_cents).astype("int64")
    return df[["band", "n", "sum_qty_c"]]


@query(
    "q27_raw_docs_pipeline",
    sql="SELECT url, charset, n_divs, pred_lang, country, region, city, valid FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/raw_docs_sf0.01.parquet')",
)
def q27_raw_docs_pipeline(sf_dir: str):
    """Full texrex worker chain over WARC records (charset → strip →
    filter → meta → secondpass → deboilerplate → normalize → div-dedup →
    assess → shingle → geolocate); rows-only, invariants asserted in
    tests.  ref: trworker.pas:422-621."""
    import os
    import tempfile

    from texrex_ray.pipelines.raw_docs import raw_docs_pipeline
    from texrex_ray.sources.warc import make_warc_bytes, read_warc
    from texrex_ray.sources.webgraph import make_webgraph

    n_hosts = {0.001: 5, 0.01: 10, 0.1: 20}.get(_sf_of(sf_dir), 10)
    g = make_webgraph(n_hosts=n_hosts, pages_per_host_base=10, seed=42)
    recs = [
        {"url": p.url, "ip": "10.0.0.1", "charset": p.charset, "body": p.content}
        for p in g.pages.values()
        if p.status == 200
    ]
    d = tempfile.mkdtemp(prefix="texrex_warc_")
    with open(os.path.join(d, "fixture.warc"), "wb") as f:
        f.write(make_warc_bytes(recs))
    ds = read_warc(os.path.join(d, "fixture.warc"), min_doc_size=0)
    out = raw_docs_pipeline(
        ds, minhash_k=16, drop_invalid=False,
        boiler_opts={"min_good_chars": 100},  # fixture pages are small
        filter_opts={"size_threshold": 100},
    )
    df = out.to_pandas()
    df["n_divs"] = df["divs"].map(len)
    return (
        df[["url", "charset", "n_divs", "pred_lang", "country", "region", "city", "valid"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


@query(
    "q28_token_writer",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(upper(text), '[A-Z]+')) AS type
        FROM documents),
    c AS (SELECT doc_id, type, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
    SELECT doc_id, type, cnt FROM c
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, type) <= 3
    ORDER BY doc_id, cnt DESC, type
    """,
)
def q28_token_writer(sf_dir: str):
    """Token writer: per-doc top-3 upper-cased types with counts
    (ref: trwritetools.pas:274-310)."""
    import re as _re

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rx = _re.compile(r"[A-Z]+")

    def topn(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids, types, cnts = [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = Counter(rx.findall((s or "").upper()))
            for ty, n in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]:
                ids.append(i)
                types.append(ty)
                cnts.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "type": pa.array(types, pa.string()),
             "cnt": pa.array(cnts, pa.int64())}
        )

    return ds.map_batches(topn, batch_format="pyarrow")


@query(
    "q29_top_orders",
    sql="""
    SELECT o_orderkey FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q29_top_orders(sf_dir: str):
    """Global top-k via distributed sort + limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.to_pandas()[["o_orderkey"]]


@query("q30_distinct_event_types", sql="SELECT DISTINCT event_type FROM events")
def q30_distinct_event_types(sf_dir: str):
    """Distinct values (shuffle dedup on a low-cardinality key)."""
    ds = _read(sf_dir, "events", ["event_type"])
    vals = ds.unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals)})


_LM_SQL = f"""
    lm AS (SELECT token, CAST(n AS BIGINT) AS n FROM (
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({TOKEN_SQL}) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 20)),
    tot AS (SELECT CAST(SUM(n) + COUNT(*) + 1 AS BIGINT) AS t FROM lm)
"""

_HYDRA_PAT = r"(\w+)- (\w+)"

_HYDRA_SQL = (
    "WITH "
    + _LM_SQL
    + r""",
    dirty AS (SELECT doc_id,
              regexp_replace(text, '\b(\w{3})(\w{3,})\b', '\1- \2', 'g') AS d
              FROM documents),
    spans AS (SELECT doc_id, unnest(regexp_extract_all(d, '(\w+)- (\w+)')) AS sp
              FROM dirty),
    parts AS (SELECT doc_id,
                     lower(regexp_extract(sp, '(\w+)- (\w+)', 1)) AS l,
                     lower(regexp_extract(sp, '(\w+)- (\w+)', 2)) AS r
              FROM spans),
    scored AS (SELECT p.doc_id,
        COALESCE(cs.n, 0) AS cs_n, COALESCE(cm.n, 0) AS cm_n
        FROM parts p
        LEFT JOIN lm cs ON cs.token = p.r
        LEFT JOIN lm cm ON cm.token = p.l || p.r),
    -- reference decision (strict count comparisons): the prefix token
    -- ("tab-") and the hyphenated concat ("tab-levalue") can never be LM
    -- unigrams ([a-z]+ only), so their counts are 0 and the only possible
    -- rewrite is MERGE, which fires iff c_merger > c_suffix and > 0.
    reps AS (SELECT doc_id, COUNT(*) AS n FROM scored
             WHERE cm_n > cs_n AND cm_n > 0
             GROUP BY doc_id)
    SELECT d.doc_id, CAST(COALESCE(r.n, 0) AS BIGINT) AS n_repairs
    FROM documents d LEFT JOIN reps r ON r.doc_id = d.doc_id
"""
)


@query("q31_hydra", sql=_HYDRA_SQL)
def q31_hydra(sf_dir: str):
    """hydra de-hyphenation (ref: trhydraapplication.pas:400-568): seeded
    hyphen injection into every ≥6-char word, then the reference's
    token-pair repair scan.  Returns per-doc rewrite counts; the strict
    integer count comparisons make the DuckDB oracle reproduce the
    decisions bit-for-bit (the LM is the corpus top-20 token table,
    computable in SQL)."""
    import re as _re

    from texrex_ray.stages.postproc import UnigramLM, dehyphenate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = q02_top_tokens(sf_dir)  # corpus top tokens as the unigram LM
    lm = UnigramLM(dict(zip(toks["token"], toks["n"])))
    lm_ref = ray.put(lm)
    dirt = _re.compile(r"\b(\w{3})(\w{3,})\b")

    def repair(t: pa.Table) -> pa.Table:
        lm_ = ray.get(lm_ref)
        ids, n_rep = [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            dirty = dirt.sub(r"\1- \2", s or "")
            _, n = dehyphenate(dirty, lm_, with_count=True)
            ids.append(i)
            n_rep.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "n_repairs": pa.array(n_rep, pa.int64())})

    return ds.map_batches(repair, batch_format="pyarrow")


_ROFL_SQL = (
    "WITH "
    + _LM_SQL
    + r""",
    dirty AS (SELECT doc_id, regexp_replace(text, '(\w+) (\w+)', '\1.\2', 'g') AS d
              FROM documents),
    spans AS (SELECT doc_id,
              unnest(regexp_extract_all(d, '([a-zA-Z]{2,})[!?:.]+([a-zA-Z]{2,})')) AS sp
              FROM dirty),
    parts AS (SELECT doc_id,
                     lower(regexp_extract(sp, '([a-zA-Z]{2,})[!?:.]+([a-zA-Z]{2,})', 1)) AS a,
                     lower(regexp_extract(sp, '([a-zA-Z]{2,})[!?:.]+([a-zA-Z]{2,})', 2)) AS b
              FROM spans),
    q AS (SELECT doc_id, COUNT(*) AS nq FROM parts
          WHERE a IN (SELECT token FROM lm) AND b IN (SELECT token FROM lm)
          GROUP BY doc_id)
    SELECT d.doc_id, CAST(LEAST(COALESCE(q.nq, 0), 10) AS BIGINT) AS n_splits
    FROM documents d LEFT JOIN q ON q.doc_id = d.doc_id
"""
)


@query("q32_rofl", sql=_ROFL_SQL)
def q32_rofl(sf_dir: str):
    """rofl run-together fixing (ref: trroflapplication.pas:380-493):
    seeded '.'-gluing of every adjacent token pair, then word-list-driven
    splits (word list = corpus top-20 tokens, limit 10).  Returns per-doc
    applied-split counts; the oracle reproduces the candidate regex and
    word-list gate in SQL."""
    import re as _re

    from texrex_ray.stages.postproc import fix_runtogether

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = q02_top_tokens(sf_dir)
    words = set(toks["token"])
    words_ref = ray.put(words)
    dirt = _re.compile(r"(\w+) (\w+)")

    def fix(t: pa.Table) -> pa.Table:
        w = ray.get(words_ref)
        ids, n_sp = [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            dirty = dirt.sub(r"\1.\2", s or "")
            _, n = fix_runtogether(dirty, w, limit=10, with_count=True)
            ids.append(i)
            n_sp.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "n_splits": pa.array(n_sp, pa.int64())})

    return ds.map_batches(fix, batch_format="pyarrow")


@query(
    "q33_xml_writer",
    sql="SELECT doc_id, xml FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/xml_writer_sf0.01.parquet')",
)
def q33_xml_writer(sf_dir: str):
    """XML corpus writer over the raw-docs pipeline output (ref:
    trwritetools.pas:81-271) with the full doc-level boilerplate/badness
    aggregates (bdc bdv nbc nbcprop nbd nbdprop avgbpc avgbpd) and div
    class chars; valid docs only, like the reference writer.  Returns
    (doc_id, xml)."""
    from texrex_ray.pipelines.raw_docs import raw_docs_pipeline
    from texrex_ray.sources.warc import make_warc_bytes, read_warc
    from texrex_ray.sources.webgraph import make_webgraph
    from texrex_ray.sources.writers import xml_format
    import os
    import tempfile

    g = make_webgraph(n_hosts=5, pages_per_host_base=8, seed=42)
    recs = [
        {"url": p.url, "ip": "10.0.0.1", "charset": p.charset, "body": p.content}
        for p in g.pages.values()
        if p.status == 200
    ]
    d = tempfile.mkdtemp(prefix="texrex_warc_")
    with open(os.path.join(d, "f.warc"), "wb") as f:
        f.write(make_warc_bytes(recs))
    ds = read_warc(os.path.join(d, "f.warc"), min_doc_size=0)
    out = raw_docs_pipeline(
        ds, minhash_k=16, drop_invalid=False,
        boiler_opts={"min_good_chars": 100},  # fixture pages are small
        filter_opts={"size_threshold": 100},
    ).map_batches(xml_format, batch_format="pyarrow")
    df = out.to_pandas()
    return df[["doc_id", "xml"]].sort_values("doc_id").reset_index(drop=True)


@query(
    "q34_priority_crawl",
    sql="SELECT round, url, host FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/priority_crawl_sf0.01.parquet')",
)
def q34_priority_crawl(sf_dir: str):
    """Degree-biased priority-frontier crawl (the north-star's priority
    scheduler): per-partition heaps keyed by host in-degree, global top-B
    selection per round, politeness/robots gated.  Oracle: committed
    expected-visits fixture (determinism across partition counts + degree
    bias are separately asserted in tests)."""
    from texrex_ray.crawl.priority import PriorityCrawlEngine
    from texrex_ray.sources.webgraph import make_webgraph

    fetches = {0.001: 50, 0.01: 120, 0.1: 300}.get(_sf_of(sf_dir), 120)
    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    eng = PriorityCrawlEngine(g, n_partitions=4, budget_per_round=16)
    eng.run(max_fetches=fetches)
    rows = eng.visit_order()
    eng.shutdown()
    return pd.DataFrame(rows, columns=["round", "url", "host"])


_GEO_BLOCKS = "/root/repo/tests/fixtures/oracle/geo_blocks.parquet"


@query(
    "q35_geolocate",
    sql=f"""
    WITH b AS (SELECT * FROM read_parquet('{_GEO_BLOCKS}')),
    d AS (SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS ip FROM documents)
    SELECT d.doc_id,
           COALESCE(b.country, '') AS country,
           COALESCE(b.region, '') AS region,
           COALESCE(b.city, '') AS city
    FROM d LEFT JOIN b ON d.ip >= b.ip_from AND d.ip <= b.ip_to
    """,
)
def q35_geolocate(sf_dir: str):
    """Geolocation range join (ref: trgeolocator.pas:116-173): deterministic
    per-doc IPs (Knuth-hash of doc_id mod 2³²) looked up in the broadcast
    block table via one vectorized searchsorted per batch; resolves
    (country, region, city).  The oracle does the identical range join
    declaratively over the committed blocks parquet."""
    from texrex_ray.stages.geolocate import Geolocator, synthetic_geo_blocks

    starts, ends, locations = synthetic_geo_blocks(n_blocks=64, seed=42)
    geo_ref = ray.put((starts, ends, locations))
    ds = _read(sf_dir, "documents", ["doc_id"])

    def locate(t: pa.Table) -> pa.Table:
        s_, e_, loc_ = ray.get(geo_ref)
        g = Geolocator(s_, e_, loc_)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ips = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        locs = g.lookup_ints(ips)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "country": pa.array([l[0] for l in locs], pa.string()),
                "region": pa.array([l[1] for l in locs], pa.string()),
                "city": pa.array([l[2] for l in locs], pa.string()),
            }
        )

    return ds.map_batches(locate, batch_format="pyarrow")


@query(
    "q19_lsh_ann",
    sql="SELECT query_id, neighbor_id, rank FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/lsh_ann_sf0.01.parquet')",
)
def q19_lsh_ann(sf_dir: str):
    """Approximate NN via random-hyperplane LSH buckets (scale path of
    q15).  Oracle: committed fixture from an independent numpy
    reimplementation of the same probe plan (bucket → multi-probe →
    brute-force within probed buckets); recall vs exact KNN asserted in
    tests."""
    from texrex_ray.dedup.embed import lsh_ann

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return lsh_ann(ds, query_ids=list(range(8)), k=10, n_planes=4)


@query(
    "q36_ivf_ann",
    sql="""
    WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 8),
    s AS (SELECT q.qid, e.vec_id nid,
                 list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) sim
          FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
    SELECT qid AS query_id, nid AS neighbor_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
    FROM s QUALIFY rank <= 10 ORDER BY query_id, rank
    """,
)
def q36_ivf_ann(sf_dir: str):
    """IVF approximate NN (k-means cells + probe lists), run at
    nprobe == nlist where IVF is provably exact — the oracle is therefore
    the same brute-force SQL as q15.  Recall at nprobe < nlist (the real
    scale configuration) is measured separately in tests/test_dedup.py."""
    from texrex_ray.dedup.embed import ivf_ann

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_ann(ds, query_ids=list(range(8)), k=10, nlist=8, nprobe=8)


def _av_n(sf_dir: str) -> tuple[int, int]:
    sf = _sf_of(sf_dir)
    return (
        {0.001: 40, 0.01: 150, 0.1: 600}.get(sf, 150),
        {0.001: 30, 0.01: 100, 0.1: 400}.get(sf, 100),
    )


@query(
    "q37_audio_features",
    sql="SELECT audio_id, ok, duration_ms, rms_c, zcr_bp, peak_hz, centroid_hz FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/audio_features_sf0.01.parquet')",
)
def q37_audio_features(sf_dir: str):
    """Audio payload chain: synthetic-container decode (actor pool) →
    time-domain stats → spectral features.  Oracle: committed fixture
    computed scalar-wise from the REGENERATED raw PCM (never touching the
    container encode/decode or the stage classes), so it independently
    verifies both the codec round-trip and the Dataset composition."""
    from texrex_ray.sources.av import fixture_path as av_fixture
    from texrex_ray.stages.av import AudioDecoder, AudioFeatures

    n_aud, _ = _av_n(sf_dir)
    d = av_fixture(n=n_aud, seed=42)
    ds = ray.data.read_parquet(f"{d}/audio.parquet")
    out = (
        ds.map_batches(AudioDecoder(), batch_format="pyarrow", batch_size=64)
        .map_batches(AudioFeatures(), batch_format="pyarrow", batch_size=64)
        .select_columns(
            ["audio_id", "ok", "duration_ms", "rms_c", "zcr_bp", "peak_hz", "centroid_hz"]
        )
    )
    return out.to_pandas().sort_values("audio_id").reset_index(drop=True)


@query(
    "q38_video_frames",
    sql="SELECT video_id, frame_idx, mean_lum_c, is_key FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/video_frames_sf0.01.parquet')",
)
def q38_video_frames(sf_dir: str):
    """Video frame-sampling (every 2nd frame → one row per frame, the
    flat_map shape) + per-frame luminance.  Oracle: committed fixture from
    regenerated frames, sampled and reduced scalar-wise without the
    container or the stage class."""
    from texrex_ray.sources.av import fixture_path as av_fixture
    from texrex_ray.stages.av import VideoFrameSampler

    _, n_vid = _av_n(sf_dir)
    d = av_fixture(n=n_vid, seed=42)
    ds = ray.data.read_parquet(f"{d}/video.parquet")
    out = ds.map_batches(VideoFrameSampler(step=2), batch_format="pyarrow", batch_size=32)
    return (
        out.to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )


_CS_PL = "Zażółć gęślą jaźń, pchnąć w tę łódź jeża lub ośm skrzyń fig. "
_CS_JP = "日本語のテキストです。漢字とひらがなとカタカナを含みます。"
_CS_RU = "Съешь же ещё этих мягких французских булок, да выпей чаю. "


@query(
    "q25_charset_convert",
    sql=f"""
    SELECT * FROM (VALUES
      ('http://cs.example/jp-declared',   'shift_jis',    repeat('{_CS_JP}', 40)),
      ('http://cs.example/latin1-upgrade','windows-1252', '“quoted”'),
      ('http://cs.example/pl-declared',   'iso8859-2',    repeat('{_CS_PL}', 40)),
      ('http://cs.example/ru-declared',   'cp1251',       repeat('{_CS_RU}', 40)),
      ('http://cs.example/ru-misdeclared','cp1251',       repeat('{_CS_RU}', 40)),
      ('http://cs.example/ru-sniffed',    'cp1251',       repeat('{_CS_RU}', 40)),
      ('http://cs.example/utf8-declared', 'utf-8',        'héllo wörld')
    ) AS t(url, charset, text) ORDER BY url
    """,
)
def q25_charset_convert(sf_dir: str):
    """CharsetConverter breadth (ref: trcharsetconverter.pas:93-147):
    declared charset > 32 KiB sniff > cp1252 fallback, with the
    ISO-8859-1 → Windows-1252 upgrade.  The oracle is a hand-written
    VALUES table — fully independent of the decode code path; every
    behavior it pins is also unit-tested in tests/test_charset.py."""
    from texrex_ray.crawl.fetcher import decode_content

    recs = [
        ("http://cs.example/pl-declared", "iso-8859-2", (_CS_PL * 40).encode("iso-8859-2")),
        ("http://cs.example/jp-declared", "shift_jis", (_CS_JP * 40).encode("shift_jis")),
        ("http://cs.example/ru-declared", "windows-1251", (_CS_RU * 40).encode("windows-1251")),
        ("http://cs.example/ru-sniffed", "", (_CS_RU * 40).encode("windows-1251")),
        ("http://cs.example/ru-misdeclared", "x-bogus-charset", (_CS_RU * 40).encode("windows-1251")),
        ("http://cs.example/utf8-declared", "utf-8", "héllo wörld".encode()),
        ("http://cs.example/latin1-upgrade", "iso-8859-1", b"\x93quoted\x94"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in recs], pa.string()),
            "declared": pa.array([r[1] for r in recs], pa.string()),
            "raw": pa.array([r[2] for r in recs], pa.binary()),
        }
    )

    def convert(b: pa.Table) -> pa.Table:
        texts, names = [], []
        for raw, dec in zip(b["raw"].to_pylist(), b["declared"].to_pylist()):
            text, name = decode_content(raw, dec)
            texts.append(text)
            names.append(name)
        return pa.table(
            {
                "url": b["url"],
                "charset": pa.array(names, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    out = ray.data.from_arrow(t).map_batches(convert, batch_format="pyarrow")
    return out.to_pandas().sort_values("url").reset_index(drop=True)


@query(
    "q39_dup_clusters",
    sql="WITH RECURSIVE pairs AS (" + _JACCARD_SQL + """),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def q39_dup_clusters(sf_dir: str):
    """Duplicate CLUSTERS from the q14 Jaccard pair edges: connected
    components by iterative min-label propagation (distributed edge scan,
    result-sized label broadcast).  Oracle: DuckDB recursive-CTE
    transitive closure over the identical edge set — an independent
    algorithm (BFS closure vs label propagation)."""
    from texrex_ray.dedup.clusters import dup_clusters

    pairs = QUERIES["q14_ngram_jaccard"](sf_dir)
    df = dup_clusters(pairs)
    df["doc_id"] = df["doc_id"].astype("int64")
    df["cluster_id"] = df["cluster_id"].astype("int64")
    return df


@query(
    "q40_sliding_window",
    sql="""
    WITH e AS (SELECT event_type,
                      CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
                      value
               FROM events),
    hop AS (SELECT event_type, h - 3600 * k AS window_start, value
            FROM e, UNNEST([0, 1, 2]) AS t(k))
    SELECT event_type, window_start, COUNT(*) AS n_events,
           CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_c
    FROM hop GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q40_sliding_window(sf_dir: str):
    """Sliding (hopping) window: size 3 h, step 1 h, per event type — the
    streaming-window custom op of the brief.  Each event expands to its
    size/step covering windows inside ``map_batches`` (vectorized
    repeat), then one partial-agg groupby — the same shape a streaming
    engine's hop-window operator lowers to."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    from texrex_ray.ops.window import hop_window

    out = (
        hop_window(ds, "ts", size_s=3 * 3600, step_s=3600)
        .drop_columns(["ts"])
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    df = out.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    df["sum_value_c"] = df["sum_value"].map(_cents).astype("int64")
    return df[["event_type", "window_start", "n_events", "sum_value_c"]]


@query(
    "q41_group_topk",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c, rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3 ORDER BY o_custkey, rk
    """,
)
def q41_group_topk(sf_dir: str):
    """Per-group top-k (top-3 orders by price per customer): per-batch
    partial top-3 (combiner) shrinks the exchange to ≤ 3 rows per
    (customer, block), then a keyed groupby finishes — the distributed
    grouped-top-k pattern."""
    from texrex_ray.ops.topk import grouped_topk

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(
        ds, "o_custkey", "o_totalprice", 3, ascending=False, tiebreak="o_orderkey"
    )
    df = out.to_pandas().sort_values(["o_custkey", "rk"]).reset_index(drop=True)
    df["price_c"] = (df["o_totalprice"] * 100).round().astype("int64")
    df["rk"] = df["rk"].astype("int64")
    return df[["o_custkey", "o_orderkey", "price_c", "rk"]]


@query(
    "q22_bloom_dedup",
    sql="SELECT DISTINCT md5(text) AS text_md5 FROM documents ORDER BY 1",
)
def q22_bloom_dedup(sf_dir: str):
    """Streaming first-wins exact dedup through the sharded scaling-Bloom
    actor pool (ref: trduplicatedetector.pas:114-122).  The accepted hash
    set equals the distinct content-hash set for exact duplicates, which
    the SQL oracle verifies — also an end-to-end false-positive check on
    the Bloom at this corpus size."""
    from texrex_ray.dedup.exact import bloom_dedup_hashes

    ds = _read(sf_dir, "documents", ["text"])
    return bloom_dedup_hashes(ds, n_shards=4)


@query(
    "q42_props_extract",
    sql="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q42_props_extract(sf_dir: str):
    """Semi-structured ETL: extract a field from the JSON-ish `props`
    string with the VECTORIZED Arrow regex kernel (pc.extract_regex — no
    Python row loop), then a partial-agg groupby."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    df["sum_k"] = df["sum_k"].astype("int64")
    return df[["event_type", "n", "sum_k"]]


@query(
    "q43_asof_join",
    sql="""
    WITH rates AS (
        SELECT date_trunc('hour', ts) AS rts,
               CAST(ROUND(AVG(value) * 100) AS BIGINT) AS rate_c
        FROM events
        WHERE (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600) % 6 = 0
        GROUP BY 1)
    SELECT e.event_id,
           CAST(epoch(r.rts) AS BIGINT) AS rate_window,
           r.rate_c
    FROM events e ASOF JOIN rates r ON e.ts >= r.rts
    ORDER BY e.event_id
    """,
)
def q43_asof_join(sf_dir: str):
    """As-of join (a custom operator Ray Data lacks): each event joins the
    most recent sparse 6-hourly "rate" checkpoint at or before its
    timestamp.  The small side (the checkpoint table) is aggregated with
    one groupby, broadcast sorted via ``ray.put``, and each batch resolves
    its matches with one ``np.searchsorted`` — the temporal analogue of
    the q26 interval lookup; the big side never shuffles.  Oracle:
    DuckDB's native ASOF JOIN."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def hour_bucket(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        h = pc.divide(pc.cast(win, pa.int64()), pa.scalar(1_000_000, pa.int64()))
        keep = pc.equal(
            pc.subtract(h, pc.multiply(pc.divide(h, 21600), pa.scalar(21600, pa.int64()))), 0
        )
        return pa.table({"h": h, "value": t["value"]}).filter(keep)

    rates = (
        ds.map_batches(hour_bucket, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("value", alias_name="sv"), Count(alias_name="nv"))
        .to_pandas()
        .sort_values("h")
    )
    # half-up (values are positive) to match DuckDB ROUND, not numpy banker's
    ckpts = pd.DataFrame(
        {
            "rate_window": rates["h"].to_numpy(),
            "rate_c": np.floor(rates["sv"] / rates["nv"] * 100 + 0.5).astype("int64"),
        }
    )

    def epoch_secs(t: pa.Table) -> pa.Table:
        es = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(1_000_000, pa.int64()))
        return pa.table({"event_id": t["event_id"], "es": es})

    from texrex_ray.ops import asof_join

    out = asof_join(
        ds.map_batches(epoch_secs, batch_format="pyarrow"),
        ckpts,
        "es",
        right_on="rate_window",
        attach=["rate_window", "rate_c"],
        keep="matched",
    ).drop_columns(["es"])
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def _crawl_and_harvest(sf_dir: str):
    """Shared q44/q45 front half: oracle-faithful single-walker crawl of
    the with_images fixture graph → corpus parquet → harvested Dataset
    (canonical image+caption columns, lazily fetched)."""
    import shutil
    import tempfile

    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.pipelines.harvest import harvest_images
    from texrex_ray.sources.webgraph import make_webgraph

    steps = {0.001: 60, 0.01: 150, 0.1: 400}.get(_sf_of(sf_dir), 150)
    g = make_webgraph(
        n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42, with_images=True
    )
    cfg = CrawlConfig(collect_images=True)
    td = tempfile.mkdtemp(prefix="q44_", dir="/tmp")
    try:
        eng = CrawlEngine(g, n_walkers=1, n_partitions=4, seed=42, config=cfg, out_dir=td)
        eng.run(max_steps=steps)
        eng.shutdown()
        corpus = ray.data.read_parquet(f"{td}/corpus")
        yield harvest_images(corpus, g.images)
    finally:
        shutil.rmtree(td, ignore_errors=True)


@query(
    "q44_image_harvest",
    sql="SELECT image_id, w, h, fmt, caption, phash, n_bytes FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/image_harvest_sf0.01.parquet')",
)
def q44_image_harvest(sf_dir: str):
    """Crawl→image harvest bridge (the graft's A+B integration): crawl the
    with_images fixture graph (single walker, oracle-faithful), read the
    corpus parquet, explode ``<img>``+caption refs, first-wins dedup per
    src in visit order, actor-fetch container bytes + header dims + pixel
    phash (pipelines/harvest.py).  Oracle: the committed fixture produced
    by the SEQUENTIAL clarax_walk replay (tools/gen_oracle_fixtures.py::
    gen_image_harvest) — no engine, no Dataset machinery."""
    for harvested in _crawl_and_harvest(sf_dir):

        def project(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "w": t["w"],
                    "h": t["h"],
                    "fmt": t["fmt"],
                    "caption": t["caption"],
                    "phash": t["phash"],
                    "n_bytes": pc.binary_length(t["bytes"]).cast(pa.int64()),
                }
            )

        df = harvested.map_batches(project, batch_format="pyarrow").to_pandas()
        return df.sort_values("image_id").reset_index(drop=True)


@query(
    "q45_harvest_caption_pipeline",
    sql="SELECT image_id, caption, n_tags, n_uris, ok, mean_lum_c, phash FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/harvest_pipeline_sf0.01.parquet')",
)
def q45_harvest_caption_pipeline(sf_dir: str):
    """The full A+B chain: the harvested image+caption table (q44) pushed
    through the flagship caption-cleaning pipeline — SecondPass entity/tag
    wash of the HTML-borne caption dirt, normalizer+NFC, actor-pool decode
    + stats, keep-first phash dedup (pipelines/caption.py).  Oracle: the
    sequential harvest rows recomputed scalar-wise through the same
    published formulas (gen_harvest_pipeline), no Dataset composition."""
    from texrex_ray.pipelines.caption import image_caption_pipeline

    for harvested in _crawl_and_harvest(sf_dir):
        canonical = harvested.select_columns(
            ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        )
        out = image_caption_pipeline(canonical, batch_size=64, with_features=False)

        def project(t: pa.Table) -> pa.Table:
            lum_c = pc.round(pc.multiply(t["mean_lum"], pa.scalar(100.0)))
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "caption": t["caption"],
                    "n_tags": pc.cast(t["n_tags"], pa.int64()),
                    "n_uris": pc.cast(t["n_uris"], pa.int64()),
                    "ok": t["ok"],
                    "mean_lum_c": pc.cast(lum_c, pa.int64()),
                    "phash": t["phash"],
                }
            )

        df = out.map_batches(project, batch_format="pyarrow").to_pandas()
        return df.sort_values("image_id").reset_index(drop=True)


@query(
    "q46_length_quantiles",
    sql="""
    SELECT lang,
           quantile_disc(n_chars, 0.5)  AS p50,
           quantile_disc(n_chars, 0.9)  AS p90,
           quantile_disc(n_chars, 0.99) AS p99
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q46_length_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles WITHOUT a global sort.

    A sort-based quantile is an all-to-all shuffle of every row; this is
    the counting form: per-batch (lang, n_chars) value-count histograms
    (pyarrow ``group_by`` — zero-copy, vectorized) → one small
    ``groupby().Sum`` over (group, value) pairs → cumulative-count
    quantile pick on the result-sized histogram.  The shuffle moves one
    row per DISTINCT (lang, n_chars) pair, bounded by the value domain,
    not the corpus: at 100 TB the histogram of an int-valued feature is
    still KB-scale.  Quantile convention matches DuckDB ``quantile_disc``
    (value at 0-based index ceil(q*n)-1, verified empirically across
    sizes/integral q*n edges).
    """
    import math

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial_hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "n_chars": g["n_chars"],
                "pn": g["count_all"].cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # result-sized: one row per distinct (lang, value)
    )
    rows = []
    for lang, grp in hist.groupby("lang"):
        grp = grp.sort_values("n_chars")
        vals = grp["n_chars"].to_numpy()
        cum = grp["n"].to_numpy().cumsum()
        n = int(cum[-1])
        picks = {}
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = min(n, max(1, math.ceil(q * n)))
            picks[name] = int(vals[np.searchsorted(cum, rank)])
        rows.append({"lang": lang, **picks})
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)[
        ["lang", "p50", "p90", "p99"]
    ]


@query(
    "q47_hash_split",
    sql="""
    SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM (SELECT doc_id, n_chars,
                 md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS b
          FROM documents)
    GROUP BY split
    ORDER BY split
    """,
)
def q47_hash_split(sf_dir: str):
    """Deterministic train/val/test split by content-stable hash (80/10/10).

    The split of every row is a pure function of its id — md5 of the
    decimal id string, lower 8 digest bytes little-endian (exactly
    DuckDB's ``md5_number_lower``), mod 100 — so membership is stable
    across runs, layouts and cluster sizes, and any shard can be
    re-derived independently (the property a 100 TB training pipeline
    needs: no global sample state, no coordination).  Embarrassingly
    parallel: no shuffle of the corpus, only per-batch partial
    (split, count, sums) rows into a 3-key groupby.  ``sum_ids`` makes
    the oracle sensitive to exact membership, not just split sizes.
    md5 has no Arrow kernel so the digest is a per-row call; it is ~50 ns
    on a 6-char key and amortizes to noise next to any text stage.
    """
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        buckets = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little") % 100
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        split = np.where(buckets < 80, "train", np.where(buckets < 90, "val", "test"))
        chars = t["n_chars"].to_numpy(zero_copy_only=False)
        out: dict[str, list] = {"split": [], "pn": [], "pchars": [], "pids": []}
        for s in ("train", "val", "test"):
            m = split == s
            if m.any():
                out["split"].append(s)
                out["pn"].append(int(m.sum()))
                out["pchars"].append(int(chars[m].sum()))
                out["pids"].append(int(ids[m].sum()))
        return pa.table(
            {
                "split": pa.array(out["split"], pa.string()),
                "pn": pa.array(out["pn"], pa.int64()),
                "pchars": pa.array(out["pchars"], pa.int64()),
                "pids": pa.array(out["pids"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Sum("pn", alias_name="n_docs"),
            Sum("pchars", alias_name="sum_chars"),
            Sum("pids", alias_name="sum_ids"),
        )
    )
    return out.to_pandas().sort_values("split").reset_index(drop=True)[
        ["split", "n_docs", "sum_chars", "sum_ids"]
    ]


@query(
    "q49_grouped_moments",
    sql="""
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(FLOOR(100.0 * (s / n) + 0.5) AS BIGINT) AS mean_c,
           CAST(FLOOR(100.0 * (ss / n - (s / n) * (s / n)) + 0.5) AS BIGINT) AS var_c
    FROM (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS ss
        FROM lineitem GROUP BY l_returnflag
    )
    ORDER BY l_returnflag
    """,
)
def q49_grouped_moments(sf_dir: str):
    """Grouped mean/variance in ONE pass via exact integer moments.

    The naive distributed variance (mean pass + squared-deviation pass)
    reads the corpus twice; the moments form carries per-batch partial
    (n, Σx, Σx²) — three int64 cells per group — through a single
    groupby-sum and finishes with scalar float math on the result-sized
    frame.  Because the quantities are integral, the partial sums are
    EXACT integers on both sides, so the final float expression is
    evaluated on bit-identical inputs with the same op order and IEEE
    semantics as the oracle; rounding uses floor(x*100 + 0.5) on both
    sides (half-away vs banker's round can differ at exact .5).
    """
    import math

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial_moments(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"l_returnflag": t["l_returnflag"].to_pylist(), "pq": q, "pqq": q * q}
        )
        g = df.groupby("l_returnflag", sort=False).agg(
            pn=("pq", "size"), ps=("pq", "sum"), pss=("pqq", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        ds.map_batches(partial_moments, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("pn", alias_name="n_rows"),
            Sum("ps", alias_name="s"),
            Sum("pss", alias_name="ss"),
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    n = agg["n_rows"].astype(np.float64)
    s = agg["s"].astype(np.float64)
    ss = agg["ss"].astype(np.float64)
    agg["mean_c"] = [int(math.floor(100.0 * (si / ni) + 0.5)) for si, ni in zip(s, n)]
    agg["var_c"] = [
        int(math.floor(100.0 * (ssi / ni - (si / ni) * (si / ni)) + 0.5))
        for ssi, ni, si in zip(ss, n, s)
    ]
    return agg[["l_returnflag", "n_rows", "mean_c", "var_c"]]


HLL_P = 10  # 2^10 = 1024 registers; standard error 1.04/sqrt(m) ≈ 3.2%


def hll_registers(tokens: list[str]) -> np.ndarray:
    """HyperLogLog register vector (m=2**HLL_P) for a set of strings.

    idx = top ``p`` bits of the stable 64-bit hash; rho = 1-based position
    of the leftmost 1 in the remaining 64-p bits (0 register = empty).
    float64 log2 is exact here because the rho stream is < 2^53.
    """
    from texrex_ray.functions.hashing import stable_hash64

    m = 1 << HLL_P
    regs = np.zeros(m, dtype=np.int64)
    if not tokens:
        return regs
    h = stable_hash64(tokens, seed=0)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = (h & np.uint64((1 << (64 - HLL_P)) - 1)).astype(np.uint64)
    width = 64 - HLL_P
    rho = np.full(len(rem), width + 1, dtype=np.int64)
    nz = rem > 0
    rho[nz] = width - np.floor(np.log2(rem[nz].astype(np.float64))).astype(np.int64)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (Flajolet et al. 2007, the standard published formulas)."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return int(round(e))


@query(
    "q48_hll_distinct",
    sql="""
    SELECT e.event_type, e.n_exact, f.n_hll
    FROM (
        SELECT event_type, COUNT(DISTINCT value) AS n_exact
        FROM events
        GROUP BY event_type
    ) e
    JOIN read_parquet('/root/repo/tests/fixtures/oracle/hll_values_sf0.01.parquet') f
      USING (event_type)
    ORDER BY e.event_type
    """,
)
def q48_hll_distinct(sf_dir: str):
    """Distinct values per event_type, exact AND as a mergeable HLL sketch.

    The sketch is the 100 TB path: each batch emits its (group, register,
    rho) partials — ≤ groups × 1024 rows regardless of input size — and
    register merge is an associative ``groupby().Max``, so cardinality
    estimation never shuffles values.  The exact side (needed by the
    oracle, and the small-scale cross-check) shuffles one row per distinct
    (group, value) pair — cardinality-sized, not corpus-sized.  Values are
    hashed via their ``repr`` (injective on floats, identical in both
    implementations).  Oracle: exact via live DuckDB COUNT(DISTINCT)
    joined to the committed fixture produced by a SEQUENTIAL pure-Python
    scalar recompute of the estimate (tools/gen_oracle_fixtures.py::
    gen_hll_values — no numpy, no Dataset machinery).
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial_regs(t: pa.Table) -> pa.Table:
        types_out, regs_out, rho_out = [], [], []
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pylist(), "value": t["value"].to_pylist()}
        )
        for etype, grp in df.groupby("event_type"):
            vals = [repr(float(v)) for v in np.unique(grp["value"].to_numpy())]
            regs = hll_registers(vals)
            nz = np.nonzero(regs)[0]
            types_out.extend([etype] * len(nz))
            regs_out.extend(nz.tolist())
            rho_out.extend(regs[nz].tolist())
        return pa.table(
            {
                "event_type": pa.array(types_out, pa.string()),
                "reg": pa.array(regs_out, pa.int64()),
                "rho": pa.array(rho_out, pa.int64()),
            }
        )

    from texrex_ray.ops.aggregate import bucketed_groupby

    # Both merges ride bucketed_groupby: native aggregate's per-group
    # Python overhead is ~0.1-2 ms/group (ops/aggregate.py), and these
    # exchanges have 5k / 50k groups (measured 5.6 s + 2.3 s native vs
    # 1.3 s + 0.9 s bucketed at sf0.1, identical rows).
    def hll_combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["event_type", "reg"], as_index=False)["rho"]
            .max()
            .rename(columns={"rho": "rho_max"})
        )

    merged = bucketed_groupby(
        ds.map_batches(partial_regs, batch_format="pyarrow"),
        ["event_type", "reg"],
        hll_combine,
        expected_rows=8 * (1 << HLL_P),  # few event types × m registers
    ).to_pandas()  # result-sized: ≤ groups × 1024 rows

    # Exact distinct: bucket on (event_type, value) so every distinct pair
    # lands in exactly one bucket; counting pairs per event_type WITHIN a
    # bucket and summing across buckets is therefore exact (deliberate
    # cross-key combine — buckets partition the key space).
    def exact_combine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop_duplicates()
            .groupby("event_type")
            .size()
            .rename("_n")
            .reset_index()
        )

    exact_parts = bucketed_groupby(
        ds, ["event_type", "value"], exact_combine, expected_rows=ds.count()
    ).to_pandas()  # ≤ buckets × groups rows
    exact = (
        exact_parts.groupby("event_type")["_n"].sum().rename("n_exact").reset_index()
    )

    rows = []
    for etype, grp in merged.groupby("event_type"):
        regs = np.zeros(1 << HLL_P, dtype=np.int64)
        regs[grp["reg"].to_numpy()] = grp["rho_max"].to_numpy()
        rows.append({"event_type": etype, "n_hll": hll_estimate(regs)})
    out = pd.merge(exact, pd.DataFrame(rows), on="event_type")
    return out.sort_values("event_type").reset_index(drop=True)[
        ["event_type", "n_exact", "n_hll"]
    ]


PACK_BUDGET = 20_000  # chars per shard; sf0.01 → 8 shards, sf0.1 → 75


@query(
    "q50_prefix_pack",
    sql=f"""
    WITH c AS (
        SELECT doc_id, n_chars,
               CAST(COALESCE(SUM(n_chars) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS before
        FROM documents
    )
    SELECT before // {PACK_BUDGET} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM c GROUP BY shard ORDER BY shard
    """,
)
def q50_prefix_pack(sf_dir: str):
    """Sequence packing via a distributed prefix sum (order-aware scan).

    The training-data op: lay documents out in a stable global order
    (doc_id) and cut the stream into fixed-budget shards — every doc goes
    to shard ``floor(chars_before_it / budget)``, the deterministic
    chunking a tokenize-and-pack loader needs.  A running total is the
    textbook "needs a serial scan" op; the distributed form is the
    two-phase scan:

    1. per-block summaries ``(lo_id, hi_id, n_docs, sum_chars)`` — one
       row per block, so the driver sees block-count-sized data (at
       100 TB: one row per parquet piece), never rows;
    2. driver sorts summaries by ``lo``, checks the id ranges are
       disjoint (the id-range-partitioned-input assumption, asserted,
       which id-sorted parquet layouts satisfy), and prefix-sums them
       into per-block exclusive offsets — broadcast back via ``ray.put``;
    3. a second pass over the same lazy Dataset adds the block offset to
       the within-block exclusive cumsum (vectorized, block-local) and
       emits per-shard partials into a shard-keyed groupby-sum.

    Each pass is embarrassingly parallel; the only serial state is the
    block-summary prefix (KB-scale).  Both map passes use
    ``batch_size=None`` so batch == block and pass 2 re-derives exactly
    the pass-1 blocks (same file, same deterministic read plan); the
    offset lookup re-asserts (n, sum) per block so any layout drift fails
    loudly instead of misassigning shards.  ``sum_ids`` makes the oracle
    membership-exact per shard.  Oracle: the same chunking as a SQL
    window function (which DuckDB evaluates with a serial scan — the
    luxury the 100 TB side doesn't have).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def block_summary(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ch = t["n_chars"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array([int(ids[0])], pa.int64()),
                "hi": pa.array([int(ids[-1])], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
                "s": pa.array([int(ch.sum())], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    if (parts["lo"].to_numpy()[1:] <= parts["hi"].to_numpy()[:-1]).any():
        raise ValueError("q50: input blocks have overlapping doc_id ranges")
    csum = parts["s"].cumsum()
    offsets = {
        int(lo): (int(off), int(n), int(s))
        for lo, off, n, s in zip(
            parts["lo"], csum - parts["s"], parts["n"], parts["s"]
        )
    }
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        off, n, s = table[int(ids[0])]
        if n != len(ids) or s != int(ch.sum()) or (np.diff(ids) <= 0).any():
            raise ValueError("q50: pass-2 block does not match its pass-1 summary")
        before = off + np.cumsum(ch) - ch
        shard = before // PACK_BUDGET
        df = pd.DataFrame({"shard": shard, "ch": ch, "id": ids})
        g = df.groupby("shard", sort=False).agg(
            pn=("ch", "size"), pchars=("ch", "sum"), pids=("id", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    out = (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("shard")
        .aggregate(
            Sum("pn", alias_name="n_docs"),
            Sum("pchars", alias_name="sum_chars"),
            Sum("pids", alias_name="sum_ids"),
        )
    )
    return out.to_pandas().sort_values("shard").reset_index(drop=True)[
        ["shard", "n_docs", "sum_chars", "sum_ids"]
    ]


@query(
    "q51_tfidf_top_term",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOKEN_SQL}) AS token FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), ranked AS (
        SELECT tf.doc_id, tf.token,
               CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score_c,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * 1000000 // df.df DESC, tf.token ASC
               ) AS rn
        FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, score_c FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def q51_tfidf_top_term(sf_dir: str):
    """Most characteristic term per document by TF-IDF (rational idf).

    Corpus statistics op: document frequency is computed with the q02
    combiner shape — per-batch DISTINCT tokens per doc → (token, partial
    df) rows → one token-keyed groupby-sum — so the shuffle moves
    vocabulary-sized partials, never token occurrences.  The df table is
    then broadcast ONCE via ``ray.put`` (the small-side-lookup pattern;
    natural-language vocabulary is sublinear in corpus size — for an
    open-ended key domain swap in the bucketed hash join of
    dedup/tender.py) and each doc resolves its top term locally in one
    vectorized pass — the per-doc step never shuffles.

    Scoring uses the RATIONAL idf ``tf * 1e6 // df`` (exact int64 on both
    sides) instead of ``tf·ln(N/df)``: the ranking inside a document is
    identical whenever df ranks identically, and integer floor-division
    is bit-reproducible across DuckDB/numpy/Python where libm ``ln``
    differs by ULPs at rounding boundaries.  Ties break lexicographically.
    Reference analogue: the per-doc top-N token profile of the token
    writer (trwritetools.pas:281-300) weighted by corpus rarity.
    """
    from collections import Counter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for s in t["text"].to_pylist():
            c.update(set(_TOKEN_RE.findall((s or "").lower())))
        toks = list(c.keys())
        return pa.table(
            {"token": toks, "pdf": pa.array([c[k] for k in toks], pa.int64())}
        )

    df_tab = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()
    )
    ref = ray.put(dict(zip(df_tab["token"], df_tab["df"].astype(int))))

    def top_term(t: pa.Table) -> pa.Table:
        dfm = ray.get(ref)
        ids_out, toks_out, scores_out = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tf = Counter(_TOKEN_RE.findall((s or "").lower()))
            if not tf:
                continue
            best_tok, best_score = None, -1
            for tok, n in tf.items():
                sc = n * 1_000_000 // dfm[tok]
                if sc > best_score or (sc == best_score and tok < best_tok):
                    best_tok, best_score = tok, sc
            ids_out.append(did)
            toks_out.append(best_tok)
            scores_out.append(best_score)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "token": pa.array(toks_out, pa.string()),
                "score_c": pa.array(scores_out, pa.int64()),
            }
        )

    out = ds.map_batches(top_term, batch_format="pyarrow")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


SAMPLE_K = 5


@query(
    "q52_group_sample",
    sql=f"""
    WITH r AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang, doc_id FROM r WHERE rn <= {SAMPLE_K} ORDER BY lang, doc_id
    """,
)
def q52_group_sample(sf_dir: str):
    """Deterministic uniform k-per-group sample without a shuffle
    (bottom-k-by-hash, a.k.a. the bottom-k sketch).

    Sampling a 100 TB corpus with ``random_shuffle().limit(k)`` is an
    all-to-all exchange; ordering every group by a content-stable hash
    and keeping the k smallest is a uniform sample that needs none: the
    bottom-k of a union is the bottom-k of the parts' bottom-k's, so each
    batch emits at most ``k × groups`` candidate rows (combiner), and one
    result-sized combine task picks the winners.  Same md5 membership
    function as q47 (DuckDB ``md5_number_lower``), so the sample is
    reproducible across runs, layouts and engines; doc_id breaks hash
    ties.  The bottom-k hash values double as a per-group min-hash sketch
    (set-similarity estimation for free).  One combine task suffices for
    ≤ ~5M candidate rows; beyond that, swap the ``repartition(1)`` for a
    lang-keyed groupby — documented fallback, same winners.
    """
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["lang", "hk", "doc_id"], kind="mergesort")
        return w.groupby("lang", sort=False).head(SAMPLE_K)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hk = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                for i in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        df = pd.DataFrame(
            {"lang": t["lang"].to_pylist(), "doc_id": ids, "hk": hk}
        )
        return pa.Table.from_pandas(bottom_k(df), preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return bottom_k(df).drop(columns=["hk"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )
    return out.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)


@query(
    "q53_star_join",
    sql="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS revenue_c
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q53_star_join(sf_dir: str):
    """Star join: one fact table, a chain of broadcast dimensions.

    The warehouse staple Ray Data has no join operator for: orders (fact)
    resolved against customer → nation → region.  The three dimension
    tables are PRE-JOINED ON THE DRIVER into one custkey → (region,
    nation) lookup — dims are small by definition (at TPC-H scale:
    customer is 1.5M rows/SF vs 15M orders and 60M lineitem) — broadcast
    once via ``ray.put``, and the fact table streams through a single
    ``map_batches`` that emits pre-aggregated (region, nation) partials.
    The fact side never shuffles; the final groupby moves ≤ |nations| rows
    per block.  A dim too big to broadcast drops to the bucketed hash join
    (q06 pattern).  Lookup is vectorized: factorized custkey → ``np.take``
    into dense dim arrays, pandas groupby for the partials.
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    # dense arrays indexed by custkey (contiguous in the generator; the
    # dict fallback below keeps correctness if they ever are not)
    keys = dim["c_custkey"].to_numpy()
    lut = {int(k): i for i, k in enumerate(keys)}
    ref = ray.put((lut, dim["r_name"].to_numpy(), dim["n_name"].to_numpy()))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        lut_, rn, nn = ray.get(ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.fromiter((lut_[int(k)] for k in ck), dtype=np.int64, count=len(ck))
        df = pd.DataFrame(
            {
                "r_name": rn[idx],
                "n_name": nn[idx],
                "price": t["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["r_name", "n_name"], sort=False).agg(
            pn=("price", "size"), ps=("price", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("pn", alias_name="n_orders"), Sum("ps", alias_name="rev"))
        .to_pandas()
        .sort_values(["r_name", "n_name"])
        .reset_index(drop=True)
    )
    out["revenue_c"] = out["rev"].map(_cents).astype("int64")
    return out[["r_name", "n_name", "n_orders", "revenue_c"]]


# --------------------------------------------------------------------------
# General distributed joins (ops/join.py) — the reusable operators behind
# the inline patterns of q06/q07/q08/q53
# --------------------------------------------------------------------------

@query(
    "q54_bigbig_join",
    sql="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)
               AS revenue_c
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q54_bigbig_join(sf_dir: str):
    """Big-big equi-join via the bucketed shuffle join (ops/join.py).

    orders ⋈ lineitem on orderkey — NEITHER side fits a broadcast at the
    100 TB design point, so both hash-bucket on the key and meet in
    per-bucket pandas merges (one shuffle total).  Revenue is then
    pre-aggregated per batch before the tiny priority groupby.
    """
    from texrex_ray.ops import shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    n = orders.count() + items.count()
    joined = shuffle_join(
        orders, items, "o_orderkey", right_on="l_orderkey", how="inner",
        expected_rows=n,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby("o_orderpriority", sort=False).agg(
            pn=("rev", "size"), ps=("rev", "sum")
        )
        return g.reset_index()

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("pn", alias_name="n_items"), Sum("ps", alias_name="rev"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["revenue_c"] = out["rev"].map(_cents).astype("int64")
    return out[["o_orderpriority", "n_items", "revenue_c"]]


@query(
    "q55_order_count_dist",
    sql="""
    SELECT c_orders AS n_orders, COUNT(*) AS n_custs
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_orders
    ORDER BY n_orders
    """,
)
def q55_order_count_dist(sf_dir: str):
    """TPC-H-Q13-style distribution: customers by how many orders they made.

    Exercises the LEFT outer path of ``shuffle_join`` — customers with no
    orders must survive with a NULL orderkey and count as zero.  The
    per-customer count then folds into a tiny histogram groupby.
    """
    from texrex_ray.ops import shuffle_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = shuffle_join(
        cust, orders, "c_custkey", right_on="o_custkey", how="left",
        expected_rows=cust.count() + orders.count(),
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("c_custkey", sort=False)["o_orderkey"]
            .count()  # counts non-null only — zero for orderless customers
            .reset_index(name="pc")
        )
        return g

    # The partial stream is ≈ |customers| rows (each custkey co-buckets in
    # the join, so partials only split across a bucket's output batches).
    # Two keyed sort-shuffles over that tiny stream cost seconds of fixed
    # exchange overhead (measured 9.3 s → 2 s at sf0.1), so the finish is
    # ONE combine task — the count_pairs trade.  Beyond ~5M customers,
    # swap the repartition(1) for groupby("c_custkey").aggregate(Sum) +
    # groupby("c_orders").count(): same rows, keyed exchange.
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("c_custkey", sort=False)["pc"].sum()
        hist = per.value_counts().sort_index()
        return pd.DataFrame(
            {"n_orders": hist.index.astype("int64"), "n_custs": hist.to_numpy()}
        )

    out = (
        joined.map_batches(per_cust, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("n_orders")
        .reset_index(drop=True)
    )
    return out[["n_orders", "n_custs"]]


# --------------------------------------------------------------------------
# Count-min sketch → exact-verified heavy hitters
# --------------------------------------------------------------------------

CMS_D, CMS_W, HH_THRESHOLD = 4, 2048, 80


def cms_partial(keys: list[str]) -> np.ndarray:
    """One batch's count-min partial: a (d, w) int64 matrix (mergeable by +).

    Rows use double hashing h1 + i·h2 from one blake2b digest per key —
    the standard pairwise-independent family (Kirsch & Mitzenmacher), the
    same trick the Bloom segments use.
    """
    import hashlib

    m = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for k in keys:
        d = hashlib.blake2b(k.encode(), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        for i in range(CMS_D):
            m[i, (h1 + i * h2) % CMS_W] += 1
    return m


def cms_estimate(m: np.ndarray, keys: list[str]) -> np.ndarray:
    """Point estimates (≥ true count, w.h.p. close) for each key."""
    import hashlib

    out = np.empty(len(keys), dtype=np.int64)
    for j, k in enumerate(keys):
        d = hashlib.blake2b(k.encode(), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        out[j] = min(m[i, (h1 + i * h2) % CMS_W] for i in range(CMS_D))
    return out


@query(
    "q56_heavy_hitters",
    sql=f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= {HH_THRESHOLD}
    ORDER BY user_id
    """,
)
def q56_heavy_hitters(sf_dir: str):
    """Users with ≥ {threshold} events: sketch-guided, exactly verified.

    The 100 TB shape: a full keyed groupby over every user is an
    all-to-all shuffle of the whole stream, but heavy hitters only need
    counts for a tiny candidate set.  Pass 1 folds each batch into a
    (4×2048) count-min partial — fixed-size, mergeable by addition, so
    the driver reduces n_blocks small matrices, never rows.  Pass 2
    probes each batch's DISTINCT users against the broadcast sketch;
    since CMS never underestimates, the emitted candidates are a strict
    superset of the true heavy hitters.  Pass 3 counts ONLY candidate
    rows (`pc.is_in` prefilter, combiner partials, one result-sized
    combine) and applies the threshold exactly — sketch error cannot
    reach the output, it only costs a few extra verified candidates.
    """
    ds = _read(sf_dir, "events", ["user_id"])

    def sketch_block(t: pa.Table) -> pa.Table:
        m = cms_partial([str(u) for u in t["user_id"].to_pylist()])
        return pa.table({"cms": pa.array([m.reshape(-1)])})

    cms = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for b in (
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=256)
    ):
        cms += np.sum(np.asarray(b["cms"].to_pylist(), dtype=np.int64), axis=0)
    cms_ref = ray.put(cms.reshape(CMS_D, CMS_W))

    def candidates(t: pa.Table) -> pa.Table:
        users = pc.unique(t["user_id"])
        est = cms_estimate(ray.get(cms_ref), [str(u) for u in users.to_pylist()])
        return pa.table({"user_id": users.filter(pa.array(est >= HH_THRESHOLD))})

    cand_df = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    cand_ref = ray.put(pa.array(cand_df["user_id"].unique()))  # candidate-set-sized

    def count_cand(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.is_in(t["user_id"], value_set=ray.get(cand_ref)))
        vc = pc.value_counts(keep["user_id"])
        return pa.table(
            {
                "user_id": vc.field("values"),
                "pn": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)["pn"].sum().reset_index(name="n_events")
        return g[g["n_events"] >= HH_THRESHOLD]

    out = (
        ds.map_batches(count_cand, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out[["user_id", "n_events"]]


@query(
    "q57_phash_near_dups",
    sql="""
    SELECT a.image_id AS id_a, b.image_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet') a
    JOIN read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet') b
      ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 6
    ORDER BY id_a, id_b
    """,
)
def q57_phash_near_dups(sf_dir: str):
    """Image near-duplicates by perceptual-hash Hamming radius (payload op).

    The input-hint table carries a 64-bit pixel pHash per image; visually
    near-identical images (re-encodes, small crops) land within a small
    Hamming ball.  ``hamming_pairs`` — the same pigeonhole block-LSH that
    powers text SimHash — runs the radius search distributed: 7 bit-block
    bucket keys per signature, exact popcount verification inside each
    bucket, nothing corpus-sized on the driver.  Oracle: brute-force O(n²)
    bit_count self-join in DuckDB over the committed (image_id, phash)
    fixture of the same deterministic image table, proving the LSH
    candidate generation is COMPLETE at d ≤ 6.
    """
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)  # the committed-oracle table's params
    ds = read_images(f"{d}/images_table")

    # row/pair hints (metadata-only count): pair volume is ~linear in rows
    # in the dedup regime, so past ~5M rows the keyed-groupby pair-dedup
    # plan actually engages instead of the single-combine default
    n = ds.count()
    out = (
        hamming_pairs(
            ds, id_col="image_id", sig_col="phash", max_hamming=6,
            expected_rows=n, expected_pairs=n,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out["hamming"] = out["hamming"].astype("int64")
    return out[["id_a", "id_b", "hamming"]]


@query(
    "q58_quality_floor",
    sql="""
    WITH th AS (
        SELECT lang, quantile_disc(n_chars, 0.5) AS med
        FROM documents GROUP BY lang
    )
    SELECT d.lang, COUNT(*) AS n_kept,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_kept_chars
    FROM documents d JOIN th ON d.lang = th.lang
    WHERE d.n_chars >= th.med
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def q58_quality_floor(sf_dir: str):
    """Per-group quantile-threshold pruning — the training-data staple
    "drop everything below the per-language median quality".

    Two phases, neither corpus-shuffling: (1) the counting-histogram
    quantile of q46 yields each language's median in one domain-sized
    exchange; (2) the thresholds (one row per language — broadcast via
    ``ray.put``) gate a vectorized filter pass whose survivors fold into
    per-batch count/min partials.  The corpus streams through the filter
    once; only histogram rows and partials ever shuffle.  Same
    ``quantile_disc`` convention as q46 (rank ceil(q·n), 0-based −1).
    """
    import math

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial_hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "n_chars": g["n_chars"],
                "pn": g["count_all"].cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # domain-sized
    )
    med = {}
    for lang, grp in hist.groupby("lang"):
        grp = grp.sort_values("n_chars")
        cum = grp["n"].to_numpy().cumsum()
        rank = min(int(cum[-1]), max(1, math.ceil(0.5 * cum[-1])))
        med[lang] = int(grp["n_chars"].to_numpy()[np.searchsorted(cum, rank)])
    med_ref = ray.put(med)

    def keep_and_count(df: pd.DataFrame) -> pd.DataFrame:
        th = df["lang"].map(ray.get(med_ref))
        kept = df[df["n_chars"] >= th]
        g = kept.groupby("lang", sort=False)["n_chars"].agg(["size", "min"])
        return g.reset_index().rename(columns={"size": "pk", "min": "pm"})

    out = (
        ds.map_batches(keep_and_count, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("pk", alias_name="n_kept"), Min("pm", alias_name="min_kept_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["min_kept_chars"] = out["min_kept_chars"].astype("int64")
    return out[["lang", "n_kept", "min_kept_chars"]]


# --------------------------------------------------------------------------
# Benchmark decontamination: test-set n-gram overlap detection
# --------------------------------------------------------------------------

DECON_N = 5  # token n-gram width, the common decontamination window


def _bench_grams(sf_dir: str) -> set[str]:
    """The deterministic 'benchmark' set: every 5-gram of the 10
    lexicographically-first documents (simulating a held-out eval set
    whose content must not leak into training data)."""
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = t.to_pandas().sort_values("doc_id").head(10)
    grams: set[str] = set()
    for s in df["text"]:
        toks = LATIN_TOKEN_RE.findall((s or "").lower())
        grams.update(
            " ".join(toks[i : i + DECON_N]) for i in range(len(toks) - DECON_N + 1)
        )
    return grams


@query(
    "q59_decontaminate",
    sql="""
    SELECT doc_id, n_hits FROM
    read_parquet('/root/repo/tests/fixtures/oracle/decontam_sf0.01.parquet')
    ORDER BY doc_id
    """,
)
def q59_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any 5-gram
    with the held-out benchmark set.

    The benchmark's grams are hashed to a sorted uint64 array — a few KB
    per thousand benchmark docs — broadcast once; each training batch
    tokenizes, hashes its rolling 5-grams with the same function, and
    membership is one vectorized ``np.isin`` against the sorted array.
    Output is (doc_id, n_hits) for contaminated docs only — result-sized,
    no shuffle at all (the per-doc counts are computed where the doc is).
    Self-hits (benchmark docs flagging themselves) are expected and kept:
    a decontamination pass removes eval overlap wherever it appears.
    Oracle: committed fixture from an INDEPENDENT sequential recompute
    (tools/gen_oracle_fixtures.py::gen_decontam — pure-Python string
    sets, no hashing, no Dataset machinery).
    """
    from texrex_ray.functions.hashing import hash64
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    grams = sorted(_bench_grams(sf_dir))
    gram_hashes = np.sort(hash64(grams))
    ref = ray.put(gram_hashes)

    def scan(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        ids, hits = [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = LATIN_TOKEN_RE.findall((s or "").lower())
            if len(toks) < DECON_N:
                continue
            g = [" ".join(toks[i : i + DECON_N]) for i in range(len(toks) - DECON_N + 1)]
            n = int(np.isin(hash64(g), bench, assume_unique=False).sum())
            if n:
                ids.append(doc_id)
                hits.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, t["doc_id"].type), "n_hits": pa.array(hits, pa.int64())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Deterministic weighted corpus mixture (data-mixture sampling)
# --------------------------------------------------------------------------

# per-source keep rates (percent), deterministic and visible to BOTH the
# Ray side (dict) and the SQL oracle (VALUES list) from this one literal
MIX_PCT = {f"src{i}": 5 + 4 * i for i in range(20)}
_MIX_VALUES = ", ".join(f"('{s}', {p})" for s, p in sorted(MIX_PCT.items()))


@query(
    "q60_corpus_mixture",
    sql=f"""
    WITH w(source, pct) AS (VALUES {_MIX_VALUES}),
    d AS (
        SELECT source, doc_id,
               md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS b
        FROM documents
    )
    SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS sum_ids
    FROM d JOIN w USING (source)
    WHERE d.b < w.pct
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q60_corpus_mixture(sf_dir: str):
    """Weighted data mixture: sample each source at its own rate,
    deterministically — how a training corpus blends domains (web 80 %,
    forums 30 %, …) WITHOUT sample state or coordination.

    Membership is a pure row function: the q47 content-stable hash
    (md5_number_lower % 100) compared to the source's broadcast rate —
    stable across runs, layouts and cluster sizes, re-derivable per
    shard, and composable with the q47 split (independent hash uses
    would need distinct salts; documented, not needed here).
    Embarrassingly parallel: filter + per-batch (source, count, sum_ids)
    partials into a source-sized groupby; ``sum_ids`` pins exact
    membership in the oracle, not just rates.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    pct_ref = ray.put(MIX_PCT)

    def partial(t: pa.Table) -> pa.Table:
        pcts = ray.get(pct_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = _doc_bucket(ids)
        src = t["source"].to_pylist()
        th = np.fromiter((pcts.get(s, 0) for s in src), dtype=np.int64, count=len(src))
        keep = b < th
        df = pd.DataFrame({"source": np.asarray(src, dtype=object)[keep], "i": ids[keep]})
        g = df.groupby("source", sort=False)["i"].agg(["size", "sum"])
        return pa.Table.from_pandas(
            g.reset_index().rename(columns={"size": "pk", "sum": "ps"}),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pk", alias_name="n_kept"), Sum("ps", alias_name="sum_ids"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_ids"] = out["sum_ids"].astype("int64")
    return out[["source", "n_kept", "sum_ids"]]


def _doc_bucket(ids, mod: int = 100) -> np.ndarray:
    """``md5_number_lower(CAST(doc_id AS VARCHAR)) % mod`` — the shared
    content-stable split/mixture hash (q47/q60/q65/q67/q68; q71 at
    per-mille resolution)."""
    from texrex_ray.functions.hashing import md5_lower64

    return (md5_lower64([str(int(i)) for i in ids]) % np.uint64(mod)).astype(np.int64)


def _doc_bucket_filter(lo: int, hi: int):
    """map_batches filter: keep docs whose split bucket is in [lo, hi)."""

    def f(t: pa.Table) -> pa.Table:
        b = _doc_bucket(t["doc_id"].to_pylist())
        return t.filter(pa.array((b >= lo) & (b < hi)))

    return f


# --------------------------------------------------------------------------
# PII redaction (corpus-release scrub; q31/q32-style deterministic dirt)
# --------------------------------------------------------------------------

# The synthetic documents carry no PII, so — like q31's hyphen dirt — the
# query seeds deterministic PII from doc_id (email on id%3, phone on id%4,
# IPv4 on id%5) identically on both sides, then runs the real operator.
_PII_DIRT_SQL = """
    SELECT doc_id, text
      || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id || '@mail'
              || (doc_id % 7) || '.example.com' ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || printf('%04d', doc_id % 10000)
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256) || '.'
              || ((doc_id // 256) % 256) || '.' || (doc_id % 250) ELSE '' END AS d
    FROM documents
"""


def _pii_dirt(i: int) -> str:
    out = ""
    if i % 3 == 0:
        out += f" reach user{i}@mail{i % 7}.example.com"
    if i % 4 == 0:
        out += f" call 555-{i % 10000:04d}"
    if i % 5 == 0:
        out += f" from 10.{i % 256}.{(i // 256) % 256}.{i % 250}"
    return out


def _pii_sql() -> str:
    from texrex_ray.functions.pii import PII_PATTERNS

    sql = f"WITH dirty AS ({_PII_DIRT_SQL})"
    prev = "dirty"
    cols = []
    for idx, (name, pat, repl) in enumerate(PII_PATTERNS):
        cols.append(f"n_{name}")
        sql += (
            f", s{idx} AS (SELECT doc_id, {', '.join(cols[:-1]) + ', ' if cols[:-1] else ''}"
            f"len(regexp_extract_all(d, '{pat}')) AS n_{name}, "
            f"regexp_replace(d, '{pat}', '{repl}', 'g') AS d FROM {prev})"
        )
        prev = f"s{idx}"
    sql += (
        f" SELECT doc_id, {', '.join(cols)}, CAST(LENGTH(d) AS BIGINT) AS red_len "
        f"FROM {prev} ORDER BY doc_id"
    )
    return sql


@query("q61_pii_redact", sql=_pii_sql())
def q61_pii_redact(sf_dir: str):
    """PII scrub for corpus release: replace e-mails / phones / IPv4s with
    typed placeholders, report per-doc counts + redacted length.

    The operator (``functions/pii.py::redact_pii``) is pure RE2 via
    pyarrow.compute — vectorized, stateless, shuffle-free; the oracle
    shares the exact pattern strings because DuckDB's regexp functions
    are RE2 too (counts taken on the progressively redacted string in
    the same fixed order).
    """
    from texrex_ray.functions.pii import redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        dirty = [
            (s or "") + _pii_dirt(i) for i, s in zip(ids, t["text"].to_pylist())
        ]
        t = t.set_column(
            t.schema.get_field_index("text"), "text", pa.array(dirty, pa.string())
        )
        t = redact_pii(t, "text")
        red_len = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        return t.drop_columns(["text"]).append_column("red_len", red_len)

    out = ds.map_batches(run, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Cross-document segment dedup (CCNet-style keep-first)
# --------------------------------------------------------------------------

@query(
    "q62_segment_dedup",
    sql="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents),
    segs AS (
        SELECT doc_id, CAST((i - 1) // 3 AS BIGINT) AS seg,
               string_agg(tok, ' ' ORDER BY i) AS s, COUNT(*) AS k
        FROM toks GROUP BY doc_id, (i - 1) // 3),
    full_segs AS (SELECT * FROM segs WHERE k = 3),
    winners AS (
        SELECT s, MIN(doc_id * 1048576 + seg) AS w FROM full_segs GROUP BY s),
    kept AS (
        SELECT f.doc_id, COUNT(*) AS n_kept
        FROM full_segs f JOIN winners w
          ON f.s = w.s AND f.doc_id * 1048576 + f.seg = w.w
        GROUP BY f.doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM full_segs GROUP BY doc_id)
    SELECT t.doc_id, t.n_segs, COALESCE(k.n_kept, 0) AS n_kept
    FROM tot t LEFT JOIN kept k USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q62_segment_dedup(sf_dir: str):
    """Segment-level exact dedup across the corpus: per doc, how many
    3-token segments it holds and how many survive global keep-first
    (minimal (doc_id, position) occurrence wins).

    One coarse-bucket shuffle on segment text + a result-sized count
    merge — no join, no driver materialization of segment data
    (``dedup/segments.py::segment_dedup_counts``).
    """
    from texrex_ray.dedup.segments import segment_dedup_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = segment_dedup_counts(ds, n=3, expected_rows=n_docs * 20).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_segs", "n_kept"]
    ]


# --------------------------------------------------------------------------
# Repetition quality filters (Gopher-style)
# --------------------------------------------------------------------------

@query(
    "q63_repetition_filter",
    sql="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents),
    tc AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
    dup AS (
        SELECT doc_id, CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup_toks
        FROM (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok)
        GROUP BY doc_id),
    bg AS (
        SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS b
        FROM toks),
    top2 AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top2_cnt
        FROM (SELECT doc_id, b, COUNT(*) AS c FROM bg WHERE b IS NOT NULL
              GROUP BY doc_id, b)
        GROUP BY doc_id),
    j AS (
        SELECT t.doc_id, t.n_toks, d.n_dup_toks, COALESCE(p.top2_cnt, 0) AS top2_cnt
        FROM tc t JOIN dup d USING (doc_id) LEFT JOIN top2 p USING (doc_id))
    SELECT doc_id, n_toks, n_dup_toks, top2_cnt,
           CAST(n_dup_toks * 2 <= n_toks
                AND top2_cnt * 5 <= GREATEST(n_toks - 1, 0) AS BIGINT) AS keep
    FROM j ORDER BY doc_id
    """,
)
def q63_repetition_filter(sf_dir: str):
    """Gopher-style repetition gate: per-doc duplicate-token mass and top
    adjacent-bigram count, with the keep decision in exact integer
    arithmetic.  Embarrassingly parallel — one vectorized ``map_batches``
    pass (``functions/repetition.py``), no shuffle."""
    from texrex_ray.functions.repetition import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(repetition_stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Canonical-representative selection per duplicate cluster
# --------------------------------------------------------------------------

@query(
    "q64_cluster_canonical",
    sql="WITH RECURSIVE pairs AS (" + _JACCARD_SQL + """),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
    ),
    clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY node),
    m AS (SELECT c.cluster_id, c.doc_id, d.n_chars,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                    ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
          FROM clusters c JOIN documents d USING (doc_id))
    SELECT cluster_id, COUNT(*) AS n_members,
           MAX(CASE WHEN rk = 1 THEN doc_id END)  AS canonical_id,
           MAX(CASE WHEN rk = 1 THEN n_chars END) AS canonical_chars
    FROM m GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def q64_cluster_canonical(sf_dir: str):
    """Complete the near-dup story: per duplicate cluster (q39's connected
    components), elect the CANONICAL survivor by quality — longest doc,
    ties to the smaller id — instead of naive keep-first.

    Scale shape: the cluster labels are result-sized (only docs that
    appear in a dup pair); they broadcast once via ``ray.put`` and the
    documents table is FILTERED where it lives (`pc.is_in`, no shuffle)
    to fetch member quality; the grouped argmax runs on the result-sized
    member table."""
    from texrex_ray.dedup.clusters import dup_clusters

    pairs = QUERIES["q14_ngram_jaccard"](sf_dir)
    labels = dup_clusters(pairs)
    lab = dict(zip((int(d) for d in labels["doc_id"]), (int(c) for c in labels["cluster_id"])))
    lab_ref = ray.put(lab)
    member_ids = pa.array(sorted(lab), pa.int64())

    def members(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["doc_id"], value_set=member_ids))
        lab_ = ray.get(lab_ref)
        cl = pa.array([lab_[int(i)] for i in t["doc_id"].to_pylist()], pa.int64())
        return t.append_column("cluster_id", cl)

    m = (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(members, batch_format="pyarrow")
        .to_pandas()
    )
    m = m.sort_values(["cluster_id", "n_chars", "doc_id"], ascending=[True, False, True])
    top = m.groupby("cluster_id", sort=True).first().reset_index()
    cnt = m.groupby("cluster_id", sort=True).size().rename("n_members").reset_index()
    out = cnt.merge(top, on="cluster_id")
    out = out.rename(columns={"doc_id": "canonical_id", "n_chars": "canonical_chars"})
    for c in ("cluster_id", "n_members", "canonical_id", "canonical_chars"):
        out[c] = out[c].astype("int64")
    return out[["cluster_id", "n_members", "canonical_id", "canonical_chars"]]


# --------------------------------------------------------------------------
# Incremental dedup against a persisted corpus index
# --------------------------------------------------------------------------

@query(
    "q65_incremental_dedup",
    sql="""
    WITH b AS (SELECT doc_id, text,
                      md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS bk
               FROM documents),
    toks AS (SELECT doc_id, bk, unnest(string_split(text, ' ')) AS tok,
                    generate_subscripts(string_split(text, ' '), 1) AS i
             FROM b),
    segs AS (SELECT doc_id, bk, string_agg(tok, ' ' ORDER BY i) AS s, COUNT(*) AS k
             FROM toks GROUP BY doc_id, bk, (i - 1) // 3),
    fs AS (SELECT * FROM segs WHERE k = 3),
    old AS (SELECT DISTINCT s FROM fs WHERE bk < 80),
    new AS (SELECT doc_id, s FROM fs WHERE bk >= 80)
    SELECT n.doc_id, COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN o.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known
    FROM new n LEFT JOIN old o ON n.s = o.s
    GROUP BY n.doc_id ORDER BY n.doc_id
    """,
)
def q65_incremental_dedup(sf_dir: str):
    """Continuous-ingest dedup: flag today's shard against YESTERDAY'S
    corpus without re-shuffling the historical data.

    The q47 doc_id hash splits documents 80/20 into "existing corpus" /
    "new shard".  The existing side's 3-token-segment hashes build a
    persisted, hash-partitioned sorted index ONCE
    (``state/corpus_index.py::build_hash_index`` — only 8-byte hashes
    shuffle); the new side probes it with an actor-pool stage that
    lazily caches shards (zero shuffle on the probe path).  Output:
    per new doc, total segments and how many already exist in the
    corpus.  64-bit md5 segment hashing is collision-free at any
    realistic corpus size relative to the oracle's exact string join.
    """
    import shutil
    import tempfile

    from texrex_ray.dedup.segments import SEG_SHIFT, segment_rows
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.state.corpus_index import HashIndexProbe, build_hash_index

    def hash_segs(t: pa.Table) -> pa.Table:
        h = md5_lower64(t["s"].to_pylist())
        return pa.table({"h": pa.array(h, pa.uint64()), "key": t["key"]})

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="texrex_cindex_")
    try:
        old_segs = segment_rows(
            docs.map_batches(_doc_bucket_filter(0, 80), batch_format="pyarrow"), n=3
        ).map_batches(hash_segs, batch_format="pyarrow")
        build_hash_index(old_segs, index_dir, hash_col="h", n_shards=16)

        new_segs = segment_rows(
            docs.map_batches(_doc_bucket_filter(80, 100), batch_format="pyarrow"), n=3
        ).map_batches(hash_segs, batch_format="pyarrow")
        probed = new_segs.map_batches(
            HashIndexProbe,
            fn_constructor_kwargs={"index_dir": index_dir, "hash_col": "h"},
            concurrency=(1, 4),
            batch_format="pyarrow",
        )

        def to_doc(t: pa.Table) -> pa.Table:
            doc = np.asarray(t["key"].to_numpy(zero_copy_only=False)) >> SEG_SHIFT
            df = pd.DataFrame(
                {"doc_id": doc, "known": t["known"].to_numpy(zero_copy_only=False)}
            )
            g = df.groupby("doc_id", sort=False)["known"].agg(["size", "sum"])
            return pa.Table.from_pandas(
                g.reset_index().rename(columns={"size": "n_segs", "sum": "n_known"}),
                preserve_index=False,
            )

        def sum_doc(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("doc_id", sort=False)[["n_segs", "n_known"]].sum().reset_index()

        out = (
            bucketed_groupby(
                probed.map_batches(to_doc, batch_format="pyarrow"), "doc_id", sum_doc
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ("doc_id", "n_segs", "n_known"):
            out[c] = out[c].astype("int64")
        return out[["doc_id", "n_segs", "n_known"]]
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# --------------------------------------------------------------------------
# Deterministic global training-order shuffle
# --------------------------------------------------------------------------

@query(
    "q66_training_order",
    sql="""
    WITH k AS (SELECT doc_id,
                      md5_number_lower(CAST(doc_id AS VARCHAR) || ':epoch0') AS key
               FROM documents),
    p AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 AS pos FROM k)
    SELECT pos, doc_id FROM p WHERE pos % 97 = 0 ORDER BY pos
    """,
)
def q66_training_order(sf_dir: str):
    """Reproducible global training order: content-stable pseudo-random
    permutation + exact global positions, at any cluster size.

    ``ops/shuffle.py::deterministic_shuffle`` — ONE key sort (the
    unavoidable exchange), then block-summary prefix offsets (q50's
    two-phase scan) instead of any serial numbering.  The oracle
    recomputes the identical permutation with ROW_NUMBER over the same
    md5 key; every 97th position is emitted so the check pins the whole
    order, not just counts."""
    from texrex_ray.ops.shuffle import deterministic_shuffle

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = (
        deterministic_shuffle(ds, id_col="doc_id", salt="epoch0")
        .map_batches(
            lambda t: t.filter(
                pa.array(t["pos"].to_numpy(zero_copy_only=False) % 97 == 0)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    return out[["pos", "doc_id"]]


# --------------------------------------------------------------------------
# Incremental NEAR-dup against the persisted LSH band index
# --------------------------------------------------------------------------

@query(
    "q67_incremental_neardup",
    sql="SELECT doc_id, n_hits FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/incremental_neardup_sf0.01.parquet') "
    "ORDER BY doc_id",
)
def q67_incremental_neardup(sf_dir: str):
    """Near-dup candidates for a NEW shard against the historical corpus,
    without touching the historical documents: the old side's Rabin64
    minhash BAND hashes are persisted once in the hash-partitioned index
    (``dedup/incremental.py``), the new side probes with the actor-pool
    stage.  Oracle: committed fixture from a sequential band-tuple set
    recompute (tuple equality — independent of the index, the band-hash
    encoding, and all Dataset machinery)."""
    import shutil
    import tempfile

    from texrex_ray.dedup.incremental import build_neardup_index, neardup_candidates

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="texrex_ndidx_")
    try:
        build_neardup_index(
            docs.map_batches(_doc_bucket_filter(0, 80), batch_format="pyarrow"), index_dir
        )
        out = (
            neardup_candidates(
                docs.map_batches(_doc_bucket_filter(80, 100), batch_format="pyarrow"),
                index_dir,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ("doc_id", "n_hits"):
            out[c] = out[c].astype("int64")
        return out[["doc_id", "n_hits"]]
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# --------------------------------------------------------------------------
# Flagship corpus-release pipeline: quality gate → near-dup drop → mixture
# --------------------------------------------------------------------------

@query(
    "q68_release_pipeline",
    sql="WITH pairs AS (" + _JACCARD_SQL + f"""),
    dropped AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents),
    tc AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
    dup AS (
        SELECT doc_id, CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup
        FROM (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok)
        GROUP BY doc_id),
    bg AS (SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS b
           FROM toks),
    top2 AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS t2
             FROM (SELECT doc_id, b, COUNT(*) AS c FROM bg WHERE b IS NOT NULL
                   GROUP BY doc_id, b) GROUP BY doc_id),
    rep AS (
        SELECT t.doc_id, t.n_toks
        FROM tc t JOIN dup d USING (doc_id) LEFT JOIN top2 p USING (doc_id)
        WHERE d.n_dup * 2 <= t.n_toks
          AND COALESCE(p.t2, 0) * 5 <= GREATEST(t.n_toks - 1, 0)),
    w(source, pct) AS (VALUES {_MIX_VALUES}),
    kept AS (
        SELECT d.source, d.doc_id, r.n_toks
        FROM documents d
        JOIN rep r ON r.doc_id = d.doc_id
        JOIN w ON w.source = d.source
        WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 100 < w.pct
          AND d.doc_id NOT IN (SELECT doc_id FROM dropped))
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_toks) AS BIGINT) AS sum_toks
    FROM kept GROUP BY source ORDER BY source
    """,
)
def q68_release_pipeline(sf_dir: str):
    """The whole corpus-release pass in ONE streaming sweep over the
    documents: Gopher repetition gate (q63) → near-dup victim drop (q14
    pairs, id_b side) → per-source mixture sampling (q60 rates) →
    per-source release stats.

    Everything row-local fuses into a single ``map_batches`` stage
    (repetition stats, mixture hash, broadcast drop-set membership via
    ``pc.is_in``); the only exchanges are the q14 pair computation
    (result-sized drop list) and a source-cardinality groupby of
    partials.  ``sum_ids``/``sum_toks`` pin exact membership."""
    from texrex_ray.functions.repetition import repetition_stats

    pairs = QUERIES["q14_ngram_jaccard"](sf_dir)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    drop = pa.array(sorted({int(b) for b in pairs["id_b"]}), pa.int64())
    drop_ref = ray.put(drop)
    pct_ref = ray.put(MIX_PCT)

    def stage(t: pa.Table) -> pa.Table:
        r = repetition_stats(t)  # row-aligned with t
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = r["keep"].to_numpy(zero_copy_only=False).astype(bool)
        n_toks = r["n_toks"].to_numpy(zero_copy_only=False)
        not_dropped = ~pc.is_in(t["doc_id"], value_set=ray.get(drop_ref)).to_numpy(
            zero_copy_only=False
        )
        b = _doc_bucket(ids)
        pcts = ray.get(pct_ref)
        src = t["source"].to_pylist()
        th = np.fromiter((pcts.get(s, 0) for s in src), dtype=np.int64, count=len(src))
        m = keep & not_dropped & (b < th)
        df = pd.DataFrame(
            {"source": np.asarray(src, dtype=object)[m], "i": ids[m], "nt": n_toks[m]}
        )
        g = df.groupby("source", sort=False).agg(
            pk=("i", "size"), ps=("i", "sum"), pt=("nt", "sum")
        ).reset_index()
        # explicit schema: an all-filtered batch must not emit a null-typed
        # source column (schema-divergent blocks downstream)
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "pk": pa.array(g["pk"].to_numpy(dtype=np.int64)),
                "ps": pa.array(g["ps"].to_numpy(dtype=np.int64)),
                "pt": pa.array(g["pt"].to_numpy(dtype=np.int64)),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = (
        ds.map_batches(stage, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("pk", alias_name="n_kept"),
            Sum("ps", alias_name="sum_ids"),
            Sum("pt", alias_name="sum_toks"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ("n_kept", "sum_ids", "sum_toks"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_kept", "sum_ids", "sum_toks"]]


# --------------------------------------------------------------------------
# Vector aggregate: per-label embedding centroids
# --------------------------------------------------------------------------

@query(
    "q69_embed_centroids",
    sql="""
    WITH x AS (SELECT label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS dim
               FROM embeddings)
    SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c
    FROM x GROUP BY label, dim ORDER BY label, dim
    """,
)
def q69_embed_centroids(sf_dir: str):
    """Per-label embedding centroid (the k-means/IVF seeding primitive) as
    an exact distributed vector aggregate: each element is scaled to an
    int BEFORE summation (floor(v·1e6 + 0.5)), so partial sums commute
    bit-exactly across any batch order — no float-reduction drift between
    engines.  Per batch: zero-copy flatten of the Arrow list column,
    one vectorized pandas label-groupby over the (n, d) int matrix; the
    exchange is label × dim partial rows (KB-scale), never vectors."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                 "pn": pa.array([], pa.int64()), "ps": pa.array([], pa.int64())}
            )
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            raise ValueError("q69: null embeddings are not supported")
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // len(t)
        if d * len(t) != len(flat):
            raise ValueError("q69: ragged embedding lengths within a batch")
        vi = np.floor(flat.astype(np.float64).reshape(len(t), d) * 1e6 + 0.5).astype(
            np.int64
        )
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame(vi).groupby(lab).sum()
        cnt = pd.Series(lab).value_counts().sort_index()
        rows = {
            "label": np.repeat(g.index.to_numpy(), d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(g)),
            "pn": np.repeat(cnt.to_numpy().astype(np.int64), d),
            "ps": g.to_numpy().reshape(-1),
        }
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("pn", alias_name="n_vecs"), Sum("ps", alias_name="sum_c"))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    for c in ("label", "dim", "n_vecs", "sum_c"):
        out[c] = out[c].astype("int64")
    return out[["label", "dim", "n_vecs", "sum_c"]]


# --------------------------------------------------------------------------
# PageRank over the crawl link graph
# --------------------------------------------------------------------------

_PAGERANK_SQL = """WITH e AS (SELECT src, dst FROM read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')),
    nodes AS (SELECT src AS p FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT p, CAST(1000000 AS BIGINT) AS r FROM nodes),
    r1 AS (SELECT n.p, CAST(150000 + (850 * COALESCE(SUM(r0.r // dg.d), 0)) // 1000 AS BIGINT) AS r
           FROM nodes n
           LEFT JOIN e ON e.dst = n.p
           LEFT JOIN deg dg ON dg.src = e.src
           LEFT JOIN r0 ON r0.p = e.src
           GROUP BY n.p),
    r2 AS (SELECT n.p, CAST(150000 + (850 * COALESCE(SUM(r1.r // dg.d), 0)) // 1000 AS BIGINT) AS r
           FROM nodes n
           LEFT JOIN e ON e.dst = n.p
           LEFT JOIN deg dg ON dg.src = e.src
           LEFT JOIN r1 ON r1.p = e.src
           GROUP BY n.p),
    r3 AS (SELECT n.p, CAST(150000 + (850 * COALESCE(SUM(r2.r // dg.d), 0)) // 1000 AS BIGINT) AS r
           FROM nodes n
           LEFT JOIN e ON e.dst = n.p
           LEFT JOIN deg dg ON dg.src = e.src
           LEFT JOIN r2 ON r2.p = e.src
           GROUP BY n.p),
    final AS (SELECT p AS page, r AS pr FROM r3)
    SELECT page, pr FROM final ORDER BY pr DESC, page LIMIT 20"""


@query("q70_pagerank", sql=_PAGERANK_SQL)
def q70_pagerank(sf_dir: str):
    """Integer-exact PageRank over the crawler's scoped link graph
    (``ops/graph.py::pagerank_int``, 3 iterations, damping 0.85): the
    recrawl/seed-scoring primitive a production frontier feeds on.
    Edges stream through ``map_batches``; each iteration broadcasts the
    node-sized rank table once.  Oracle: DuckDB runs the SAME iterations
    itself from the committed edge-list fixture (SQL joins vs broadcast
    dicts — independent implementations, bit-identical scaled-int
    algebra).  Output: top 20 pages by final rank."""
    from texrex_ray.ops.graph import pagerank_int
    from texrex_ray.sources.webgraph import link_edges, make_webgraph

    g = make_webgraph(n_hosts=40, pages_per_host_base=12, n_seeds=8, seed=7)
    e = link_edges(g)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.string()),
                "dst": pa.array([b for _, b in e], pa.string()),
            }
        )
    ).repartition(8)
    out = pagerank_int(edges, iters=3).rename(columns={"rank": "pr"})
    return out.head(20).reset_index(drop=True)[["page", "pr"]]


# --------------------------------------------------------------------------
# Temperature-weighted corpus mixture (data-derived rates)
# --------------------------------------------------------------------------

@query(
    "q71_temperature_mixture",
    sql="""
    WITH sz AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n,
                 CAST(FLOOR(SQRT(CAST(n AS DOUBLE) * 1000000)) AS BIGINT) AS w
          FROM sz),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, COUNT(*) AS s FROM w),
    th AS (SELECT source, n, LEAST(1000, (w * 500 * s) // tw) AS t FROM w, tot),
    k AS (SELECT d.source, d.doc_id FROM documents d JOIN th ON th.source = d.source
          WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000 < th.t),
    agg AS (SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM k GROUP BY source)
    SELECT th.source, th.n AS n_total, CAST(th.t AS BIGINT) AS rate_pm,
           COALESCE(a.n_kept, 0) AS n_kept, COALESCE(a.sum_ids, 0) AS sum_ids
    FROM th LEFT JOIN agg a ON a.source = th.source
    ORDER BY th.source
    """,
)
def q71_temperature_mixture(sf_dir: str):
    """Temperature-weighted mixture with rates DERIVED FROM THE DATA
    (p_s ∝ √n_s — the multilingual up-sampling rule at τ=2), unlike
    q60's fixed table.  Two-phase plan: a source-sized count groupby →
    the driver turns sizes into per-mille thresholds (√ via IEEE sqrt,
    identical in numpy and DuckDB, then pure integer algebra) → one
    broadcast → stateless membership filter + partial aggregation.
    ``sum_ids`` pins exact membership."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    sz = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    n = sz["n"].to_numpy(dtype=np.int64)
    w = np.floor(np.sqrt(n.astype(np.float64) * 1e6)).astype(np.int64)
    t = np.minimum(1000, (w * 500 * len(sz)) // w.sum()).astype(np.int64)
    plan = dict(zip(sz["source"], t))
    plan_ref = ray.put(plan)

    def partial(tb: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        ids = tb["doc_id"].to_numpy(zero_copy_only=False)
        b = _doc_bucket(ids, mod=1000)
        src = tb["source"].to_pylist()
        th = np.fromiter((pl[s] for s in src), dtype=np.int64, count=len(src))
        m = b < th
        df = pd.DataFrame({"source": np.asarray(src, dtype=object)[m], "i": ids[m]})
        g = df.groupby("source", sort=False)["i"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "pk": pa.array(g["size"].to_numpy(dtype=np.int64)),
                "ps": pa.array(g["sum"].to_numpy(dtype=np.int64)),
            }
        )

    kept = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pk", alias_name="n_kept"), Sum("ps", alias_name="sum_ids"))
        .to_pandas()
    )
    out = sz.rename(columns={"n": "n_total"})
    out["rate_pm"] = t
    out = out.merge(kept, on="source", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out["sum_ids"] = out["sum_ids"].fillna(0).astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    return out[["source", "n_total", "rate_pm", "n_kept", "sum_ids"]]

# --------------------------------------------------------------------------
# Canonical image per pHash near-dup cluster (payload-side q64)
# --------------------------------------------------------------------------

@query(
    "q72_image_canonical",
    sql="""
    WITH RECURSIVE p AS (
        SELECT image_id, phash, w, h FROM
        read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet')),
    pairs AS (SELECT a.image_id AS ia, b.image_id AS ib
              FROM p a JOIN p b ON a.image_id < b.image_id
              WHERE bit_count(xor(a.phash, b.phash)) <= 6),
    edges AS (SELECT ia AS a, ib AS b FROM pairs
              UNION ALL SELECT ib, ia FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node),
    clusters AS (SELECT node AS image_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY node),
    m AS (SELECT c.cluster_id, c.image_id, CAST(p.w * p.h AS BIGINT) AS px,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                    ORDER BY p.w * p.h DESC, c.image_id ASC) AS rk
          FROM clusters c JOIN p ON p.image_id = c.image_id)
    SELECT cluster_id, COUNT(*) AS n_members,
           MAX(CASE WHEN rk = 1 THEN image_id END) AS canonical_id,
           MAX(CASE WHEN rk = 1 THEN px END)       AS canonical_px
    FROM m GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def q72_image_canonical(sf_dir: str):
    """Payload-side canonical election: cluster near-identical images
    (pHash Hamming ≤ 6 via the block-LSH radius search), then keep the
    highest-resolution member per cluster (ties to smaller id) — how an
    image corpus keeps ONE best copy of each re-encoded/rescaled
    original.  Labels are result-sized; the image table is filtered
    where it lives (`pc.is_in`) — pixels never shuffle.  Oracle:
    brute-force O(n²) bit_count pairs + recursive-CTE closure +
    ROW_NUMBER argmax, all in SQL over the committed fixture."""
    from texrex_ray.dedup.clusters import dup_clusters
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    # prune at the read: neither pass needs the pixel payload bytes
    ds = read_images(f"{d}/images_table", columns=["image_id", "phash", "w", "h"])
    n_img = ds.count()  # hints: pair volume ~linear in rows (dedup regime)
    pairs = hamming_pairs(
        ds, id_col="image_id", sig_col="phash", max_hamming=6,
        expected_rows=n_img, expected_pairs=n_img,
    )
    labels = dup_clusters(pairs)
    lab = dict(zip(labels["doc_id"], labels["cluster_id"]))
    lab_ref = ray.put(lab)
    member_ids = pa.array(sorted(lab), pa.string())

    def members(t: pa.Table) -> pa.Table:
        t = t.select(["image_id", "w", "h"])
        t = t.filter(pc.is_in(t["image_id"], value_set=member_ids))
        lab_ = ray.get(lab_ref)
        cl = pa.array([lab_[i] for i in t["image_id"].to_pylist()], pa.string())
        return t.append_column("cluster_id", cl)

    m = ds.map_batches(members, batch_format="pyarrow").to_pandas()
    m["px"] = (m["w"].astype("int64") * m["h"].astype("int64")).astype("int64")
    m = m.sort_values(["cluster_id", "px", "image_id"], ascending=[True, False, True])
    top = m.groupby("cluster_id", sort=True).first().reset_index()
    cnt = m.groupby("cluster_id", sort=True).size().rename("n_members").reset_index()
    out = cnt.merge(top[["cluster_id", "image_id", "px"]], on="cluster_id")
    out = out.rename(columns={"image_id": "canonical_id", "px": "canonical_px"})
    out["n_members"] = out["n_members"].astype("int64")
    out["canonical_px"] = out["canonical_px"].astype("int64")
    return out[["cluster_id", "n_members", "canonical_id", "canonical_px"]]

# --------------------------------------------------------------------------
# PageRank-informed priority crawl (rank feeds the next crawl's frontier)
# --------------------------------------------------------------------------

@query(
    "q73_rank_priority_crawl",
    sql="SELECT round, url, host FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/rank_priority_crawl_sf0.01.parquet')",
)
def q73_rank_priority_crawl(sf_dir: str):
    """The production crawl loop closed: PageRank from the discovered link
    graph (q70's operator) becomes the HOST PRIORITY of the next crawl —
    frontier heaps key on rank-score + live in-degree instead of degree
    alone.  Same engine, same politeness/robots gates; the bias is a
    static broadcast dict resident in each frontier actor.  Oracle:
    committed expected-visits fixture (regression pin like q34;
    partition-count determinism and the rank-changes-the-schedule fact
    are asserted in tests)."""
    from texrex_ray.crawl.priority import PriorityCrawlEngine
    from texrex_ray.functions.urlkit import host_of
    from texrex_ray.ops.graph import pagerank_int
    from texrex_ray.sources.webgraph import link_edges, make_webgraph

    fetches = {0.001: 50, 0.01: 120, 0.1: 300}.get(_sf_of(sf_dir), 120)
    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    e = link_edges(g)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in e], pa.string()),
                "dst": pa.array([b for _, b in e], pa.string()),
            }
        )
    )
    pr = pagerank_int(edges, iters=3)
    scores: dict[str, int] = {}
    for page, r in zip(pr["page"], pr["rank"]):
        h = host_of(page)
        scores[h] = scores.get(h, 0) + int(r)
    scores = {h: v // 1000 for h, v in scores.items()}

    # budget BELOW the host count: the global top-B selection must actually
    # choose, so the rank bias shapes the schedule (at budget >= hosts the
    # politeness gate admits everyone and priority is moot)
    eng = PriorityCrawlEngine(
        g, n_partitions=4, budget_per_round=4, host_scores=scores
    )
    eng.run(max_fetches=fetches)
    rows = eng.visit_order()
    eng.shutdown()
    return pd.DataFrame(rows, columns=["round", "url", "host"])

# --------------------------------------------------------------------------
# Corpus datasheet: wide per-source stats in one pass
# --------------------------------------------------------------------------

@query(
    "q74_corpus_card",
    sql="""
    WITH t AS (
        SELECT source, lang, n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_toks
        FROM documents)
    SELECT source,
           COUNT(*)                        AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)    AS sum_chars,
           CAST(SUM(n_toks) AS BIGINT)     AS sum_toks,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(n_chars) AS BIGINT)    AS min_chars,
           CAST(MAX(n_chars) AS BIGINT)    AS max_chars
    FROM t GROUP BY source ORDER BY source
    """,
)
def q74_corpus_card(sf_dir: str):
    """The dataset datasheet in ONE streaming pass: per source — doc and
    token volume, language diversity, length extremes.  Every metric is
    a commutative integer partial (count/sum/min/max + a per-batch lang
    SET union whose distinct-count finishes on source-sized data), so the
    exchange is source-cardinality rows regardless of corpus size."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        # NULL text: SQL's SUM skips the NULL n_toks — adding 0 is identical
        n_toks = np.fromiter(
            (0 if s is None else s.count(" ") + 1 for s in txt),
            dtype=np.int64,
            count=len(txt),
        )
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "lang": t["lang"].to_pylist(),
                "ch": t["n_chars"].to_numpy(zero_copy_only=False),
                "tk": n_toks,
            }
        )
        g = df.groupby("source", sort=False).agg(
            pn=("ch", "size"), pch=("ch", "sum"), ptk=("tk", "sum"),
            pmin=("ch", "min"), pmax=("ch", "max"),
            plangs=("lang", lambda s: ",".join(sorted(set(s)))),
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "pn": pa.array(g["pn"].to_numpy(dtype=np.int64)),
                "pch": pa.array(g["pch"].to_numpy(dtype=np.int64)),
                "ptk": pa.array(g["ptk"].to_numpy(dtype=np.int64)),
                "pmin": pa.array(g["pmin"].to_numpy(dtype=np.int64)),
                "pmax": pa.array(g["pmax"].to_numpy(dtype=np.int64)),
                "plangs": pa.array(g["plangs"].tolist(), pa.string()),
            }
        )

    df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = df.groupby("source", sort=True).agg(
        n_docs=("pn", "sum"), sum_chars=("pch", "sum"), sum_toks=("ptk", "sum"),
        min_chars=("pmin", "min"), max_chars=("pmax", "max"),
        langs=("plangs", lambda s: set(",".join(s).split(","))),
    ).reset_index()
    out["n_langs"] = out["langs"].map(len).astype("int64")
    for c in ("n_docs", "sum_chars", "sum_toks", "min_chars", "max_chars"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_docs", "sum_chars", "sum_toks", "n_langs",
                "min_chars", "max_chars"]]

# --------------------------------------------------------------------------
# Funnel detection: users who click before purchasing
# --------------------------------------------------------------------------

@query(
    "q75_funnel",
    sql="""
    WITH g AS (
        SELECT user_id,
               epoch_us(MIN(ts) FILTER (WHERE event_type = 'click'))    AS first_click,
               epoch_us(MAX(ts) FILTER (WHERE event_type = 'purchase')) AS last_purchase
        FROM events GROUP BY user_id)
    SELECT user_id, first_click, last_purchase
    FROM g
    WHERE first_click IS NOT NULL AND last_purchase IS NOT NULL
      AND first_click < last_purchase
    ORDER BY user_id
    """,
)
def q75_funnel(sf_dir: str):
    """Conversion-funnel detection: users whose first 'click' precedes
    their last 'purchase' — the existence-of-ordered-pair pattern reduces
    to two commutative per-user extrema (min click ts, max purchase ts),
    so per-batch partials + ONE user-keyed groupby solve it with no
    session assembly and no ordering requirement on the input."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "et": t["event_type"].to_pylist(),
                "e": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        a = df[df["et"] == "click"].groupby("user_id")["e"].min()
        b = df[df["et"] == "purchase"].groupby("user_id")["e"].max()
        out = pd.DataFrame({"pa_": a, "pb": b}).reset_index()
        # sentinel encoding for the groupby merge (Min/Max ignore them)
        out["pa_"] = out["pa_"].fillna(2**62).astype("int64")
        out["pb"] = out["pb"].fillna(-(2**62)).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("pa_", alias_name="first_click"), Max("pb", alias_name="last_purchase"))
        .to_pandas()
    )
    out = out[
        (out["first_click"] < 2**62)
        & (out["last_purchase"] > -(2**62))
        & (out["first_click"] < out["last_purchase"])
    ].sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "first_click", "last_purchase"):
        out[c] = out[c].astype("int64")
    return out[["user_id", "first_click", "last_purchase"]]

# --------------------------------------------------------------------------
# Vocabulary attribution: which source first contributes each token type
# --------------------------------------------------------------------------

@query(
    "q76_vocab_attribution",
    sql="""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    w AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok),
    j AS (SELECT w.tok, d.source FROM w JOIN documents d ON d.doc_id = w.fd)
    SELECT source, COUNT(*) AS n_new_tokens
    FROM j GROUP BY source ORDER BY source
    """,
)
def q76_vocab_attribution(sf_dir: str):
    """Vocabulary growth attribution: each distinct token type is credited
    to the source of its FIRST document (min doc_id) — which data source
    actually adds new vocabulary vs repeating the old.  The exchange is
    one ``bucketed_groupby`` on token text (vocab-cardinality keys —
    Ray's native per-group reduce would pay per-type overhead); the
    winner's source rides on the token rows, so no join back."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def tok_rows(t: pa.Table) -> pa.Table:
        toks, ids, srcs = [], [], []
        for i, src_, s in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist()
        ):
            if s is None:  # SQL unnest(string_split(NULL)) emits no rows
                continue
            parts = s.split(" ")
            toks.extend(parts)
            ids.extend([i] * len(parts))
            srcs.extend([src_] * len(parts))
        return pa.table(
            {
                "tok": pa.array(toks, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
            }
        )

    def first_doc(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["tok", "doc_id"])
            .groupby("tok", sort=False)
            .first()
            .reset_index()[["tok", "source"]]
        )

    winners = bucketed_groupby(
        ds.map_batches(tok_rows, batch_format="pyarrow"),
        "tok",
        first_doc,
        expected_rows=n_docs * 60,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = pd.Series(t["source"].to_pylist()).value_counts()
        return pa.table(
            {
                "source": pa.array(g.index.tolist(), pa.string()),
                "pn": pa.array(g.to_numpy().astype(np.int64)),
            }
        )

    out = (
        winners.map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pn", alias_name="n_new_tokens"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["n_new_tokens"] = out["n_new_tokens"].astype("int64")
    return out[["source", "n_new_tokens"]]

# --------------------------------------------------------------------------
# URL canonicalization dedup (frontier normalization)
# --------------------------------------------------------------------------

_URL_DIRT_SQL = """
    SELECT doc_id,
           'HTTP://WWW.Host' || (doc_id % 5) || '.COM:80/p' || (doc_id % 3)
           || '?utm_source=s' || (doc_id % 4) || '&id=' || (doc_id % 7)
           || '&utm_campaign=c#sec' || (doc_id % 6) AS u
    FROM documents
"""


def _url_dirt(i: int) -> str:
    return (
        f"HTTP://WWW.Host{i % 5}.COM:80/p{i % 3}"
        f"?utm_source=s{i % 4}&id={i % 7}&utm_campaign=c#sec{i % 6}"
    )


def _url_canon_sql() -> str:
    from texrex_ray.functions.urlkit import URL_CANON_TAIL_STEPS, URL_HEAD_RE

    head = f"regexp_replace(lower(regexp_extract(u, '{URL_HEAD_RE}')), ':80$', '')"
    tail = f"regexp_replace(u, '{URL_HEAD_RE}', '')"
    for pat, repl in URL_CANON_TAIL_STEPS:
        # DuckDB single-quoted strings pass backslashes through verbatim
        tail = f"regexp_replace({tail}, '{pat}', '{repl}', 'g')"
    return (
        f"WITH dirty AS ({_URL_DIRT_SQL}), "
        f"c AS (SELECT doc_id, {head} || {tail} AS canon FROM dirty) "
        "SELECT canon, COUNT(*) AS n_docs, MIN(doc_id) AS first_id "
        "FROM c GROUP BY canon ORDER BY canon"
    )


@query("q77_url_canonical_dedup", sql=_url_canon_sql())
def q77_url_canonical_dedup(sf_dir: str):
    """Frontier URL normalization + dedup: lowercase scheme/host, strip
    :80, fragments and utm_* tracking params (the rewrite chain shared
    verbatim with the oracle's RE2), then first-wins per canonical form.
    Vectorized pandas str ops per batch; the exchange is one
    canonical-cardinality groupby."""
    from texrex_ray.functions.urlkit import canonical_urls

    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        canon = canonical_urls([_url_dirt(int(i)) for i in ids])
        df = pd.DataFrame({"canon": canon, "i": np.asarray(ids, dtype=np.int64)})
        g = df.groupby("canon", sort=False)["i"].agg(["size", "min"]).reset_index()
        return pa.table(
            {
                "canon": pa.array(g["canon"].tolist(), pa.string()),
                "pn": pa.array(g["size"].to_numpy(dtype=np.int64)),
                "pm": pa.array(g["min"].to_numpy(dtype=np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("canon")
        .aggregate(Sum("pn", alias_name="n_docs"), Min("pm", alias_name="first_id"))
        .to_pandas()
        .sort_values("canon")
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["first_id"] = out["first_id"].astype("int64")
    return out[["canon", "n_docs", "first_id"]]

# --------------------------------------------------------------------------
# Similarity-clustered storage order (sort by SimHash, adjacent distance)
# --------------------------------------------------------------------------

@query(
    "q78_storage_order",
    sql=f"""
    WITH s AS (SELECT doc_id, simhash FROM read_parquet('{_SIMHASH_FIX}')),
    a AS (SELECT bit_count(xor(simhash,
              lag(simhash) OVER (ORDER BY simhash, doc_id))) AS d FROM s),
    b AS (SELECT bit_count(xor(simhash,
              lag(simhash) OVER (ORDER BY doc_id))) AS d FROM s)
    SELECT CAST((SELECT SUM(d) FROM a) AS BIGINT) AS sorted_total,
           CAST((SELECT SUM(d) FROM b) AS BIGINT) AS idorder_total
    """,
)
def q78_storage_order(sf_dir: str):
    """Similarity-clustered layout: writing docs in SimHash order places
    near-duplicates adjacently (better column compression, better dedup
    locality).  The evidence is the total adjacent Hamming distance in
    signature order vs id order — computed scale-correctly: after the
    sort, each block contributes a LOCAL pair sum plus its boundary
    signatures (q50-style block summaries); the driver only chains the
    block boundaries.  Signed-int64 sig ordering matches the SQL BIGINT
    sort."""
    from texrex_ray.dedup.lsh import popcount64
    from texrex_ray.functions.hashing import simhash64
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in t["text"].to_pylist()]
        # 3-gram shingles — identical preprocessing to the committed sig
        # fixture (tools/gen_oracle_fixtures.py::gen_simhash_signatures)
        grams = [
            [" ".join(tk[i : i + 3]) for i in range(max(0, len(tk) - 2))]
            for tk in toks
        ]
        sig = simhash64(grams).view(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "sig": pa.array(sig, pa.int64())}
        )

    # Pin once: both orderings consume the same sig table; without the
    # materialize the tokenize+simhash pass (the expensive leg) runs twice.
    # (doc_id, sig) is 16 B/row — corpus-count-sized, safe to pin at scale.
    sigs = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()

    def adjacent_total(sorted_ds, keys) -> int:
        s = sorted_ds.sort(keys).materialize()

        def summary(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "lo_id": pa.array([], pa.int64()),
                                 "first": pa.array([], pa.int64()),
                                 "last": pa.array([], pa.int64()),
                                 "local": pa.array([], pa.int64())})
            v = t["sig"].to_numpy(zero_copy_only=False)
            k = t[keys[0]].to_numpy(zero_copy_only=False)
            i0 = t["doc_id"].to_numpy(zero_copy_only=False)
            local = int(
                popcount64((v[1:].view(np.uint64) ^ v[:-1].view(np.uint64))).sum()
            ) if len(v) > 1 else 0
            return pa.table(
                {"lo": pa.array([int(k[0])], pa.int64()),
                 "lo_id": pa.array([int(i0[0])], pa.int64()),
                 "first": pa.array([int(v[0])], pa.int64()),
                 "last": pa.array([int(v[-1])], pa.int64()),
                 "local": pa.array([local], pa.int64())}
            )

        # sort by (first sort key, first doc_id): ties in the sig key can
        # straddle blocks, and doc_id (unique) pins the global block order
        parts = (
            s.map_batches(summary, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .sort_values(["lo", "lo_id"])
            .reset_index(drop=True)
        )
        total = int(parts["local"].sum())
        for i in range(1, len(parts)):
            x = (int(parts["last"].iloc[i - 1]) ^ int(parts["first"].iloc[i])) & (
                (1 << 64) - 1
            )
            total += bin(x).count("1")
        return total

    sorted_total = adjacent_total(sigs, ["sig", "doc_id"])
    idorder_total = adjacent_total(sigs, ["doc_id"])
    return pd.DataFrame(
        {"sorted_total": [sorted_total], "idorder_total": [idorder_total]}
    ).astype("int64")

# --------------------------------------------------------------------------
# Cross-modal alignment moments: caption length vs image resolution
# --------------------------------------------------------------------------

@query(
    "q79_caption_alignment",
    sql="""
    SELECT fmt, COUNT(*) AS n_imgs,
           CAST(SUM(LENGTH(caption)) AS BIGINT)           AS s_cap,
           CAST(SUM(w * h) AS BIGINT)                     AS s_px,
           CAST(SUM(LENGTH(caption) * w * h) AS BIGINT)   AS s_cappx
    FROM read_parquet('/root/repo/tests/fixtures/oracle/image_harvest_sf0.01.parquet')
    GROUP BY fmt ORDER BY fmt
    """,
)
def q79_caption_alignment(sf_dir: str):
    """Cross-modal dataset statistics over the harvested image+caption
    table (the graft cell's A+B payload): per container format, the
    exact integer moments (n, Σ|caption|, Σ pixels, Σ |caption|·pixels)
    from which caption-length/resolution correlation — the alignment
    filter signal — follows.  Same single-pass partial-moment shape as
    q49; the exchange is fmt-cardinality rows."""
    harvested = QUERIES["q44_image_harvest"](sf_dir)
    if not isinstance(harvested, pd.DataFrame):
        harvested = harvested.to_pandas()
    ds = ray.data.from_pandas(harvested[["fmt", "caption", "w", "h"]])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "fmt": t["fmt"].to_pylist(),
                "cap": pd.Series(t["caption"].to_pylist())
                .str.len()
                .fillna(0)  # NULL caption: SQL SUM skips it, == adding 0
                .to_numpy(np.int64),
                "px": (
                    t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
                    * t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        df["cappx"] = df["cap"] * df["px"]
        g = df.groupby("fmt", sort=False).agg(
            pn=("cap", "size"), pc=("cap", "sum"), pp=("px", "sum"), px2=("cappx", "sum")
        ).reset_index()
        return pa.table(
            {
                "fmt": pa.array(g["fmt"].tolist(), pa.string()),
                "pn": pa.array(g["pn"].to_numpy(dtype=np.int64)),
                "pc": pa.array(g["pc"].to_numpy(dtype=np.int64)),
                "pp": pa.array(g["pp"].to_numpy(dtype=np.int64)),
                "px2": pa.array(g["px2"].to_numpy(dtype=np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("pn", alias_name="n_imgs"), Sum("pc", alias_name="s_cap"),
            Sum("pp", alias_name="s_px"), Sum("px2", alias_name="s_cappx"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_imgs", "s_cap", "s_px", "s_cappx"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_imgs", "s_cap", "s_px", "s_cappx"]]

# --------------------------------------------------------------------------
# Signed random projection (cosine-LSH) codes for embeddings
# --------------------------------------------------------------------------

@query(
    "q80_srp_codes",
    sql="""
    WITH bits AS (SELECT unnest(range(0, 16)) AS i),
    dims AS (SELECT unnest(range(1, 65)) AS j),
    r AS (SELECT i, j,
                 CASE WHEN md5_number_lower(i || ':' || j) % 2 = 0
                      THEN 1 ELSE -1 END AS s
          FROM bits, dims),
    x AS (SELECT vec_id,
                 CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vi,
                 dim
          FROM (SELECT vec_id, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings)),
    si AS (SELECT x.vec_id, r.i, SUM(x.vi * r.s) AS s
           FROM x JOIN r ON r.j = x.dim GROUP BY 1, 2)
    SELECT vec_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END)
                AS BIGINT) AS code
    FROM si GROUP BY vec_id ORDER BY vec_id
    """,
)
def q80_srp_codes(sf_dir: str):
    """Signed-random-projection LSH for cosine similarity (Charikar 2002):
    each embedding gets a 16-bit code whose bits are the signs of dot
    products with ±1 random hyperplanes — near-parallel vectors collide
    in Hamming space, making the codes a drop-in signature column for
    ``hamming_pairs``.  Determinism is total: the hyperplane signs come
    from ``md5_lower64(bit:dim)`` and the elements are scaled to int64
    BEFORE the dot product (q69's trick), so the sign decisions are
    exact-integer and bit-identical to the SQL oracle's join-and-sum.
    One zero-copy map_batches pass; no shuffle at all."""
    from texrex_ray.functions.hashing import md5_lower64

    BITS, D = 16, 64
    keys = [f"{i}:{j}" for i in range(BITS) for j in range(1, D + 1)]
    # (D, BITS): +1 where md5(bit:dim) is even, -1 where odd — the SQL CASE
    R = (1 - 2 * (md5_lower64(keys) % np.uint64(2)).astype(np.int64)).reshape(
        BITS, D
    ).T
    r_ref = ray.put(R)

    def codes(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "code": pa.array([], pa.int64())}
            )
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        vi = np.floor(flat.astype(np.float64).reshape(len(t), D) * 1e6 + 0.5).astype(
            np.int64
        )
        s = vi @ ray.get(r_ref)  # (n, BITS) exact int64 dot products
        bits = (s > 0).astype(np.int64)
        code = (bits << np.arange(BITS, dtype=np.int64)).sum(axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "code": pa.array(code, pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(codes, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return out[["vec_id", "code"]]

# --------------------------------------------------------------------------
# Windowed distinct users (sliding window × exact distinct-count)
# --------------------------------------------------------------------------

@query(
    "q81_window_distinct",
    sql="""
    WITH e AS (SELECT user_id,
                      CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h
               FROM events),
    hop AS (SELECT user_id, h - 3600 * k AS window_start
            FROM e, UNNEST([0, 1, 2]) AS t(k))
    SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM hop GROUP BY window_start ORDER BY window_start
    """,
)
def q81_window_distinct(sf_dir: str):
    """Sliding-window distinct users: the hop-window expand
    (``ops/window.py``) composed with an exact distributed distinct —
    one ``bucketed_groupby`` on window_start where a vectorized
    ``nunique`` finishes each window.  The streaming-analytics staple
    (3-hour windows advancing hourly), with the window fan-out factor
    independent of data volume."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.window import hop_window

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    hopped = hop_window(ds, "ts", size_s=3 * 3600, step_s=3600).select_columns(
        ["window_start", "user_id"]
    )

    def nun(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("window_start")["user_id"].nunique().reset_index(name="n_users")
        )

    out = (
        bucketed_groupby(hopped, "window_start", nun)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    out["window_start"] = out["window_start"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out[["window_start", "n_users"]]


_TARC_SQL = """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0 THEN replace(text, '<', '(')
              ELSE 'HTTP/1.1 200 OK  doc:  ' || CAST(doc_id AS VARCHAR) || ' ' || chr(10)
                   || '<html>' || text || '</html>' END AS rawtext
  FROM documents),
sp AS (SELECT doc_id, rawtext, strpos(rawtext, '<') AS lt FROM raw),
rec AS (
  SELECT doc_id,
         CASE WHEN lt = 0 THEN NULL
              ELSE trim(regexp_replace(substr(rawtext, 1, lt - 1), ' +', ' ', 'g'),
                        ' ' || chr(9) || chr(10) || chr(13)) END AS header,
         CASE WHEN lt = 0 THEN NULL ELSE substr(rawtext, lt) END AS body
  FROM sp),
lens AS (
  SELECT doc_id,
         CASE WHEN header IS NULL THEN -1 ELSE strlen(header) END AS hlen,
         CASE WHEN header IS NULL THEN -1 ELSE strlen(body) + 1 END AS blen,
         CASE WHEN header IS NULL THEN 9
              ELSE 9 + strlen(header) + strlen(body) + 1 END AS rec_bytes,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
  FROM rec),
pos AS (
  SELECT doc_id, hlen, blen, rn // 100 AS tarc_shard,
         COALESCE(SUM(rec_bytes) OVER (PARTITION BY rn // 100 ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rstart
  FROM lens)
SELECT doc_id,
       CAST(tarc_shard AS BIGINT) AS tarc_shard,
       CAST(CASE WHEN hlen = -1 THEN -1 ELSE rstart + 9 END AS BIGINT) AS hoff,
       CAST(hlen AS BIGINT) AS hlen,
       CAST(CASE WHEN hlen = -1 THEN -1 ELSE rstart + 9 + hlen END AS BIGINT) AS boff,
       CAST(blen AS BIGINT) AS blen
FROM pos ORDER BY doc_id
"""


@query("q23_tarc_layout", sql=_TARC_SQL)
def q23_tarc_layout(sf_dir: str):
    """TARC archive layout manifest: per-doc byte offsets inside
    doc_id-sharded raw archive files (ref: trwritetools.pas:313-369 —
    marker, Trim(DelSpace1(header)), body + newline, per-doc
    tarcheader/-body offset+length metas; extraction ≡
    src/programs/arcxi.pas).  Raw text is derived deterministically from
    ``documents.text`` (an HTTP-ish header with collapsible doubled
    spaces + an html wrapper; every 50th doc loses its '<'s and takes
    the reference's ``dumped`` branch with -1 offsets).  The layout is
    the q50-style distributed prefix sum: block summaries give global
    row numbers (driver sees one row per block), shard = rn //
    docs_per_shard, and each shard's byte offsets are assigned in the
    one group task that would also stream the shard file
    (``write_tarc``).  The physical writer round-trip (arcxi(seek+read)
    reconstructs header and body bit-for-bit, gzip-transparent) is
    pinned by tests/test_tarc.py."""
    from texrex_ray.sources.writers import tarc_manifest

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def mk_raw(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        raws = [
            (tx or "").replace("<", "(")
            if int(i) % 50 == 0
            else f"HTTP/1.1 200 OK  doc:  {int(i)} \n<html>{tx or ''}</html>"
            for i, tx in zip(ids, texts)
        ]
        return pa.table({"doc_id": t["doc_id"], "raw": pa.array(raws, pa.string())})

    return tarc_manifest(
        ds.map_batches(mk_raw, batch_format="pyarrow", batch_size=None),
        docs_per_shard=100,
    )


_PSNR_SQL = """
WITH src AS (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idn, image_id,
         octet_length(bytes) - 12 AS n
  FROM read_parquet('/tmp/texrex_ray_fixtures/images_n300_s42/images.parquet')),
calc AS (
  SELECT image_id, n,
         CASE WHEN idn % 7 = 0 THEN 163840
              WHEN idn % 7 = 3 THEN 1 ELSE 0 END AS sse,
         CASE WHEN idn % 11 = 0 THEN 0 ELSE 1 END AS caption_eq
  FROM src)
SELECT image_id,
       CAST(sse AS BIGINT) AS sse,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(CASE WHEN 10000 * sse <= 65025 * n THEN 1 ELSE 0 END AS BIGINT) AS psnr_ok,
       CAST(caption_eq AS BIGINT) AS caption_eq
FROM calc ORDER BY image_id
"""


@query("q82_pixel_parity", sql=_PSNR_SQL)
def q82_pixel_parity(sf_dir: str):
    """The north rule's per-row invariant as a distributed operator:
    decoded-pixel PSNR ≥ 40 dB (integer-exact SSE gate) + caption
    equality between OUR pipeline's image table and the reference table
    (``sources/images.py::pixel_parity`` — one id-bucketed shuffle join,
    per-bucket decode + int64 SSE).  The "ours" side is the fixture with
    a deterministic perturbation: every idn%7==0 image gets 10 pixel
    bytes shifted by 128 (SSE 163840 — fails 40 dB on small images,
    passes on 128×128 ones, so the gate depends on real pixel counts),
    idn%7==3 gets a single ±1 byte (SSE 1, always passes), and idn%11==0
    captions gain a trailing '!'.  The oracle predicts the SSEs in
    closed form (|x − (x+128 mod 256)| = 128 for every byte); the Ray
    side computes them from the actual perturbed bytes."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import pixel_parity
    from texrex_ray.sources.lance_io import read_images

    n = {0.001: 100, 0.01: 300, 0.1: 1000}.get(_sf_of(sf_dir), 300)
    d = fixture_path(n=n, seed=42)
    ref = read_images(f"{d}/images_table")

    def perturb(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        raws = t["bytes"].to_pylist()
        caps = t["caption"].to_pylist()
        out_b, out_c = [], []
        for i, raw, cap in zip(ids, raws, caps):
            idn = int(i[3:])
            b = bytearray(raw)
            if idn % 7 == 0:
                for k in range(12, 22):
                    b[k] = (b[k] + 128) % 256
            elif idn % 7 == 3:
                b[12] = b[12] - 1 if b[12] == 255 else b[12] + 1
            c = cap + "!" if idn % 11 == 0 else cap
            out_b.append(bytes(b))
            out_c.append(c)
        return pa.table(
            {
                "image_id": t["image_id"],
                "bytes": pa.array(out_b, pa.binary()),
                "caption": pa.array(out_c, pa.string()),
            }
        )

    ours = ref.map_batches(perturb, batch_format="pyarrow")
    out = pixel_parity(ours, ref).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


_POLITENESS_SQL = """
WITH v AS (SELECT seq, url, host
           FROM read_parquet('/root/repo/tests/fixtures/oracle/crawl_visits_sf0.01.parquet')),
g AS (SELECT host, url,
             seq - lag(seq) OVER (PARTITION BY host ORDER BY seq) AS gap
      FROM v)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_visits,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(COALESCE(min(gap), -1) AS BIGINT) AS min_gap
FROM g GROUP BY host ORDER BY host
"""


@query("q83_politeness_audit", sql=_POLITENESS_SQL)
def q83_politeness_audit(sf_dir: str):
    """Crawl-log politeness audit: per-host visit cadence from the walk's
    own visit order (the invariant a politeness gate is supposed to
    produce — ref: host budgets at trwalkers.pas:331-363).  Runs the
    q21 engine configuration, then a distributed grouped ordered-gap
    pass: per host, visit count, distinct URLs, and the MINIMUM seq gap
    between consecutive visits (-1 when a host was visited once).  The
    audit op is a ``bucketed_groupby`` with one vectorized sort+diff per
    bucket; the oracle recomputes it as a SQL lag window over the
    committed oracle-walk fixture (same fixture q21 is graded on)."""
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.sources.webgraph import make_webgraph

    steps = {0.001: 60, 0.01: 150, 0.1: 400}.get(_sf_of(sf_dir), 150)
    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    eng = CrawlEngine(g, n_walkers=1, n_partitions=4, seed=42, config=CrawlConfig())
    eng.run(max_steps=steps)
    rows = eng.visit_order()
    eng.shutdown()
    visits = ray.data.from_arrow(
        pa.table(
            {
                "seq": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "host": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "seq"])
        gap = df.groupby("host", sort=False)["seq"].diff()
        out = (
            df.assign(__gap=gap)
            .groupby("host", sort=False)
            .agg(
                n_visits=("seq", "size"),
                n_urls=("url", "nunique"),
                min_gap=("__gap", "min"),
            )
            .reset_index()
        )
        out["min_gap"] = out["min_gap"].fillna(-1).astype("int64")
        out["n_visits"] = out["n_visits"].astype("int64")
        out["n_urls"] = out["n_urls"].astype("int64")
        return out

    return (
        bucketed_groupby(visits, "host", audit)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)[["host", "n_visits", "n_urls", "min_gap"]]
    )


_SKEW_SQL = """
WITH b AS (SELECT md5_number_lower(CAST(l_orderkey AS VARCHAR)) % 64 AS bucket
           FROM lineitem)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM b GROUP BY bucket ORDER BY bucket
"""


@query("q84_partition_skew", sql=_SKEW_SQL)
def q84_partition_skew(sf_dir: str):
    """Partition-skew diagnostics: the per-bucket row counts a planned
    hash partitioning would produce (the 'partitioning / shuffle / skew
    handled explicitly' axis needs a measuring tool before a salting
    decision — this is it).  One streaming pass: per-batch
    ``np.bincount`` over the stable md5 bucket of the key, then a
    64-row groupby-sum — the driver never sees rows, only the
    bucket histogram.  The same hash (``md5_lower64`` ≡ DuckDB
    ``md5_number_lower``) routes the persisted corpus index and the
    80/20 split, so this histogram predicts REAL shuffle layouts."""
    from texrex_ray.functions.hashing import md5_lower64

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    n_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t["l_orderkey"].to_pylist()]
        b = (md5_lower64(keys) % np.uint64(n_buckets)).astype(np.int64)
        counts = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "pn": pa.array(counts[nz].astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("pn", alias_name="n_rows"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    return out[["bucket", "n_rows"]]


_STRATIFIED_SQL = """
SELECT lang, doc_id,
       CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS rk
FROM documents
QUALIFY rk <= 20
ORDER BY lang, rk
"""


@query("q85_stratified_sample", sql=_STRATIFIED_SQL)
def q85_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: exactly k docs per stratum
    (language), chosen by smallest content-stable hash — the
    train-data subsampling primitive (per-source/per-language caps)
    that needs NO global shuffle and is reproducible across engines,
    layouts and runs.  Ranking hash is ``md5_lower64`` (≡ DuckDB
    ``md5_number_lower``); selection is ``grouped_topk`` — per-bucket
    vectorized head-k, exchange bounded by k × strata."""
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.ops.topk import grouped_topk

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = md5_lower64([str(v) for v in t["doc_id"].to_pylist()])
        return t.append_column("h", pa.array(h, pa.uint64()))

    out = (
        grouped_topk(
            ds.map_batches(add_hash, batch_format="pyarrow"),
            "lang",
            "h",
            k=20,
            ascending=True,
            tiebreak="doc_id",
        )
        .to_pandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    out["rk"] = out["rk"].astype("int64")
    return out[["lang", "doc_id", "rk"]]


_USER_GROWTH_SQL = """
WITH first_seen AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
SELECT strftime(first_ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_new_users
FROM first_seen GROUP BY day ORDER BY day
"""


@query("q86_user_growth", sql=_USER_GROWTH_SQL)
def q86_user_growth(sf_dir: str):
    """Growth-curve accounting WITHOUT a sequential scan: 'how many new
    users appear each day' == a first-occurrence histogram — per-batch
    (user, min ts) partials, one keyed min-combine, then a per-day
    count.  The same two-exchange shape computes any first-seen curve
    (new vocabulary, new hosts discovered by the crawl, new image
    clusters) at corpus scale; nothing time-ordered is scanned
    serially."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial_first(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_pandas(), "ts": t["ts"].to_pandas()}
        )
        g = df.groupby("user_id", sort=False)["ts"].min().reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "pf": pa.array(g["ts"].astype("int64").to_numpy(), pa.int64()),
            }
        )

    firsts = (
        ds.map_batches(partial_first, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("pf", alias_name="first_ts"))
    )

    def hist(t: pa.Table) -> pa.Table:
        ts = t["first_ts"].to_numpy(zero_copy_only=False)
        day = ts // (86_400 * 10**6) * 86_400  # us -> epoch-day start (s)
        u, c = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day_s": pa.array(u.astype(np.int64)),
                "pn": pa.array(c.astype(np.int64)),
            }
        )

    out = (
        firsts.map_batches(hist, batch_format="pyarrow")
        .groupby("day_s")
        .aggregate(Sum("pn", alias_name="n_new_users"))
        .to_pandas()
        .sort_values("day_s")
        .reset_index(drop=True)
    )
    out["day"] = pd.to_datetime(out["day_s"], unit="s").dt.strftime("%Y-%m-%d")
    out["n_new_users"] = out["n_new_users"].astype("int64")
    return out[["day", "n_new_users"]]


_SPAN_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKEN_SQL} AS ts FROM documents),
wins AS (
  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS w
  FROM toks, unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS t(i)),
firsts AS (SELECT w, min(doc_id) AS fd FROM wins GROUP BY w)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN fd < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
FROM wins JOIN firsts USING (w)
GROUP BY doc_id ORDER BY doc_id
"""


@query("q87_span_dedup", sql=_SPAN_DEDUP_SQL)
def q87_span_dedup(sf_dir: str):
    """Exact substring (token-window) dedup accounting — the Lee et al.
    'dedup repeated spans' pipeline step at window granularity: every
    8-token sliding window, grouped EXACTLY on its content, is a
    duplicate instance when the same window first appears in a smaller
    doc_id.  One bucketed exchange does everything: each bucket holds
    all instances of its windows, so first-owner and per-doc instance
    counts are one vectorized transform; per-doc partials then sum in a
    doc-keyed aggregate.  The exchange (and the pinned window table)
    carries a 128-bit content hash + byte-length witness, not the window
    text — 64-bit would admit birthday collisions at ~10⁹ windows;
    128-bit is ~1.5e-15 at 10¹², and any same-hash/different-length
    pair raises loudly (dedup/segments.py::guard_collisions).  Returns
    (doc_id, n_windows, n_dup_windows) for every doc with ≥8 tokens."""
    from texrex_ray.dedup.segments import guard_collisions, hash128
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = 8

    def win_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_w, out_d = [], []
        for i, s in zip(ids, t["text"].to_pylist()):
            toks = _TOKEN_RE.findall((s or "").lower())
            ii = int(i)
            for p in range(len(toks) - W + 1):
                out_w.append(" ".join(toks[p : p + W]))
                out_d.append(ii)
        ws = pd.Series(out_w, dtype="object")
        h1, h2 = hash128(ws)
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "wl": pa.array(ws.str.len().to_numpy().astype(np.int32)),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    # pin the exploded windows: the bucketed sort exchange samples AND
    # shuffles its input, and the doc-keyed aggregate follows — lazily the
    # explode re-executes per pass (measured 14-16 s vs 5.5 s pinned at
    # sf0.1); hashed, the pinned table is 20 bytes/row instead of the
    # window text (~8x corpus text)
    wins = ds.map_batches(win_rows, batch_format="pyarrow").materialize()

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        guard_collisions(g, ["h1", "h2"], "wl")
        fd = g.groupby(["h1", "h2"], sort=False)["doc_id"].transform("min")
        g = g.assign(__dup=(fd < g["doc_id"]).astype("int64"))
        out = g.groupby("doc_id", sort=False).agg(
            pn=("__dup", "size"), pd_=("__dup", "sum")
        )
        return out.reset_index()

    # partials are (buckets x docs)-sized — one combine task beats a second
    # sort exchange (which would also re-execute the bucketed stage for its
    # sample pass; measured 18 s vs 5 s).  Beyond ~5M partial rows swap in
    # groupby("doc_id").aggregate(Sum) (tender.count_pairs pattern).
    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).agg(
            n_windows=("pn", "sum"), n_dup_windows=("pd_", "sum")
        )

    out = (
        bucketed_groupby(wins, ["h1", "h2"], per_window, expected_rows=wins.count())
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["n_windows"] = out["n_windows"].astype("int64")
    out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
    return out[["doc_id", "n_windows", "n_dup_windows"]]


_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS cum_n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cum_value_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
"""


@query("q88_running_totals", sql=_RUNNING_SQL)
def q88_running_totals(sf_dir: str):
    """Per-user running count + running value sum in event order — the
    ordered windowed aggregate (SQL ROWS UNBOUNDED PRECEDING) via
    ``ops/window.py::running_totals``: one bucketed exchange on the
    user key, one vectorized sort + grouped cumsum per bucket.  Values
    go to integer cents BEFORE accumulation so the running sums hash
    exactly."""
    from texrex_ray.ops.window import running_totals

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "value_c", pa.array([_cents(x) for x in v], pa.int64())
        )

    out = (
        running_totals(
            ds.map_batches(cents, batch_format="pyarrow"),
            "user_id",
            ["ts", "event_id"],
            "value_c",
            out_n="cum_n",
            out_sum="cum_value_c",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["cum_n"] = out["cum_n"].astype("int64")
    out["cum_value_c"] = out["cum_value_c"].astype("int64")
    return out[["event_id", "user_id", "cum_n", "cum_value_c"]]


_DIFF_M = (1 << 61) - 1
_DIFF_SQL = f"""
WITH tampered AS (
  SELECT doc_id,
         CASE WHEN doc_id % 101 = 0 THEN text || ' [edited]' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 97 <> 0),
fa AS (
  SELECT md5_number_lower(CAST(doc_id AS VARCHAR)) % 64 AS bucket,
         count(*) AS n,
         CAST(sum(md5_number_lower(
                CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, chr(0))
                  || '|' || COALESCE(lang, chr(0))
              ) % {_DIFF_M}) % {_DIFF_M} AS BIGINT) AS cs
  FROM documents GROUP BY bucket),
fb AS (
  SELECT md5_number_lower(CAST(doc_id AS VARCHAR)) % 64 AS bucket,
         count(*) AS n,
         CAST(sum(md5_number_lower(
                CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, chr(0))
                  || '|' || COALESCE(lang, chr(0))
              ) % {_DIFF_M}) % {_DIFF_M} AS BIGINT) AS cs
  FROM tampered GROUP BY bucket)
SELECT CAST(COALESCE(fa.bucket, fb.bucket) AS BIGINT) AS bucket,
       CAST(COALESCE(fa.n, 0) AS BIGINT) AS n_a,
       CAST(COALESCE(fb.n, 0) AS BIGINT) AS n_b,
       CAST(COALESCE(fa.cs, 0) AS BIGINT) AS checksum_a,
       CAST(COALESCE(fb.cs, 0) AS BIGINT) AS checksum_b,
       CAST(CASE WHEN COALESCE(fa.n,0) = COALESCE(fb.n,0)
                  AND COALESCE(fa.cs,0) = COALESCE(fb.cs,0)
            THEN 1 ELSE 0 END AS BIGINT) AS match
FROM fa FULL JOIN fb ON fa.bucket = fb.bucket
ORDER BY bucket
"""


@query("q89_table_diff", sql=_DIFF_SQL)
def q89_table_diff(sf_dir: str):
    """Distributed table diff (``ops/diff.py``): compare two corpus
    copies WITHOUT joining or shuffling either — per key-hash bucket, a
    row count and an order-independent modular row checksum (md5 mod
    2⁶¹−1, exact in any engine), compared driver-side at bucket
    granularity.  The validation tool a migration/re-run needs at
    100 TB: a mismatch names the buckets to re-scan.  The 'b' side is
    the corpus with deterministic tampering (every 97th doc dropped,
    every 101st edited); the oracle recomputes both fingerprints in
    SQL."""
    from texrex_ray.ops.diff import table_diff

    a = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tamper(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % 97) != 0
        t = t.filter(pa.array(keep))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = [
            (s or "") + " [edited]" if int(i) % 101 == 0 else s
            for i, s in zip(ids, t["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(texts, pa.string()),
             "lang": t["lang"]}
        )

    b = a.map_batches(tamper, batch_format="pyarrow")
    out = table_diff(a, b, "doc_id", ["doc_id", "text", "lang"], n_buckets=64)
    return out.sort_values("bucket").reset_index(drop=True)


_LANGID_SQL = """
WITH chars AS (
  SELECT doc_id, lang,
         regexp_replace(lower(text), '[^a-z ]', '', 'g') AS s
  FROM documents),
tris AS (
  SELECT doc_id, lang, substr(s, i, 3) AS g
  FROM chars, unnest(generate_series(1, greatest(length(s) - 2, 0))) AS t(i)),
prof AS (
  SELECT lang, g FROM (
    SELECT lang, g,
           row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS rk
    FROM tris GROUP BY lang, g)
  WHERE rk <= 40),
docg AS (SELECT DISTINCT doc_id, g FROM tris),
scores AS (
  SELECT d.doc_id, p.lang, count(*) AS sc
  FROM docg d JOIN prof p USING (g) GROUP BY d.doc_id, p.lang),
pred AS (
  SELECT doc_id, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lang ASC) AS rk
  FROM scores)
SELECT c.doc_id, p.pred_lang,
       CAST(CASE WHEN p.pred_lang = c.lang THEN 1 ELSE 0 END AS BIGINT) AS match
FROM chars c LEFT JOIN (SELECT doc_id, pred_lang FROM pred WHERE rk = 1) p USING (doc_id)
ORDER BY c.doc_id
"""


@query("q90_langid", sql=_LANGID_SQL)
def q90_langid(sf_dir: str):
    """Language-ID by character-trigram profiles (Cavnar–Trenkle
    heuristic), fully data-derived: per-language top-40 trigram
    profiles from one keyed count exchange + grouped top-k, then a
    broadcast-profiles streaming classification by distinct-trigram
    overlap (``functions/langid.py``).  Integer-exact scoring and
    deterministic tie-breaks make the whole two-stage pipeline
    SQL-recomputable.  Output: (doc_id, pred_lang, match-vs-corpus
    label)."""
    from texrex_ray.functions.langid import classify_langid, trigram_profiles

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    prof = trigram_profiles(ds, k=40)
    out = (
        classify_langid(ds, prof)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["match"] = (out["pred_lang"] == out["lang"]).astype("int64")
    return out[["doc_id", "pred_lang", "match"]]


_INC_AGG_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq
FROM documents GROUP BY lang ORDER BY lang
"""


@query("q91_incremental_agg", sql=_INC_AGG_SQL)
def q91_incremental_agg(sf_dir: str):
    """Incremental aggregate maintenance: yesterday's per-language
    moments (count / Σchars / Σchars²) are PERSISTED from the historical
    80% split; today's 20% increment streams through the same partial
    aggregation and MERGES with the stored state — mergeable partials
    mean history is never re-scanned.  The oracle aggregates the full
    corpus in one go: the merge path must land on exactly those
    integers.  (The same shape maintains any commutative-monoid
    aggregate — HLL registers, count-min rows, per-source token counts —
    over a continuously-ingested corpus.)"""
    import os
    import tempfile

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas(), "pn": 1, "ps": ch, "pq": ch * ch}
        )
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def agg_split(lo: int, hi: int) -> pd.DataFrame:
        ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        return (
            ds.map_batches(_doc_bucket_filter(lo, hi), batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(
                Sum("pn", alias_name="n_docs"),
                Sum("ps", alias_name="sum_chars"),
                Sum("pq", alias_name="sum_sq"),
            )
            .to_pandas()
        )

    with tempfile.TemporaryDirectory() as d:
        state_path = os.path.join(d, "lang_moments.parquet")
        # "yesterday": persist the historical aggregate
        agg_split(0, 80).to_parquet(state_path, index=False)
        # "today": aggregate only the increment, merge with stored state
        state = pd.read_parquet(state_path)
        delta = agg_split(80, 100)
        merged = (
            pd.concat([state, delta], ignore_index=True)
            .groupby("lang", as_index=False)
            .sum()
            .sort_values("lang")
            .reset_index(drop=True)
        )
    for c in ("n_docs", "sum_chars", "sum_sq"):
        merged[c] = merged[c].astype("int64")
    return merged[["lang", "n_docs", "sum_chars", "sum_sq"]]


_VALUE_RANKS_SQL = """
WITH v AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qty_c FROM lineitem),
h AS (SELECT qty_c, count(*) AS n FROM v GROUP BY qty_c)
SELECT qty_c, CAST(n AS BIGINT) AS n,
       CAST(1 + COALESCE(SUM(n) OVER (ORDER BY qty_c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rank_min
FROM h ORDER BY qty_c
"""


@query("q92_value_ranks", sql=_VALUE_RANKS_SQL)
def q92_value_ranks(sf_dir: str):
    """Global ranks WITHOUT a global sort: the histogram-rank pattern.
    One keyed count exchange builds the value histogram (domain-sized,
    not row-sized); the driver prefix-sums it once and every row's
    exact min-rank (SQL ``rank()``) is then a broadcast lookup — the
    way percentile features are computed over 10¹⁰ rows when a
    ``ds.sort`` would be an all-to-all of the whole corpus.  Output is
    the ranked histogram itself (value, count, rank_min); the
    per-row attach is a ``map_batches`` dictionary gather."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        qc = np.round(q * 100).astype(np.int64)
        u, c = np.unique(qc, return_counts=True)
        return pa.table(
            {"qty_c": pa.array(u), "pn": pa.array(c.astype(np.int64))}
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qty_c")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
        .sort_values("qty_c")
        .reset_index(drop=True)
    )
    h["n"] = h["n"].astype("int64")
    h["rank_min"] = (h["n"].cumsum() - h["n"] + 1).astype("int64")
    return h[["qty_c", "n", "rank_min"]]


_SIMHASH_DECON_SQL = """
WITH bench AS (
  SELECT doc_id FROM documents
  WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 >= 95),
sigs AS (
  SELECT d.doc_id,
         CAST(s.simhash AS BIGINT) AS simhash,
         CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_bench
  FROM documents d
  JOIN read_parquet('/root/repo/tests/fixtures/oracle/simhash_sig_sf0.01.parquet') s
    USING (doc_id)
  LEFT JOIN bench b USING (doc_id)),
pairs AS (
  SELECT t.doc_id AS train_id, bm.doc_id AS bench_id,
         bit_count(xor(t.simhash, bm.simhash)) AS hamming
  FROM sigs t JOIN sigs bm
    ON t.is_bench = 0 AND bm.is_bench = 1)
SELECT train_id, bench_id, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= 20
ORDER BY train_id, bench_id
"""


@query("q93_simhash_decontaminate", sql=_SIMHASH_DECON_SQL)
def q93_simhash_decontaminate(sf_dir: str):
    """NEAR-dup decontamination across two corpora: which training docs
    are within SimHash Hamming ≤ 20 of any held-out benchmark doc (the
    hash-split 95+ bucket)?  q59 catches exact n-gram overlap; this
    catches paraphrased/near-copied contamination.  Both sides union
    into ONE ``hamming_pairs`` radius search (complete multi-index
    candidate generation) with a side tag; only cross-side pairs
    survive.  The benchmark ids offset by 10⁹ so the union keeps one id
    space — pairs are then (train, bench) regardless of which side
    sorted first.  Oracle joins the committed SimHash fixture (the
    signature family is pinned by q18's fixture freshness test)."""
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.functions.hashing import simhash64
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    OFF = 10**9
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = [LATIN_TOKEN_RE.findall((s or "").lower()) for s in t["text"].to_pylist()]
        grams = [
            [" ".join(tk[i : i + 3]) for i in range(max(0, len(tk) - 2))]
            for tk in toks
        ]
        sh = simhash64(grams)
        bench = _doc_bucket(ids) >= 95
        out_id = np.where(bench, ids + OFF, ids)
        return pa.table(
            {
                "doc_id": pa.array(out_id.astype(np.int64)),
                "simhash": pa.array(sh),
            }
        )

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow")
    # radius 20 (21 blocks of 3 bits) — decontamination wants recall;
    # the recursive bucket splits keep the wide radius tractable.
    # hints: one sig per doc (metadata-only count); pair volume is
    # ~linear in rows, so past ~5M docs the keyed pair-dedup engages
    n_docs = ds.count()
    pairs = hamming_pairs(
        sigs, max_hamming=20, expected_rows=n_docs, expected_pairs=n_docs
    ).to_pandas()
    a, b = pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()
    cross = (a >= OFF) != (b >= OFF)
    pairs = pairs[cross].copy()
    a, b = pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()
    pairs["train_id"] = np.where(a >= OFF, b, a)
    pairs["bench_id"] = np.where(a >= OFF, a - OFF, b - OFF)
    out = (
        pairs[["train_id", "bench_id", "hamming"]]
        .sort_values(["train_id", "bench_id"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_PMI_SQL = f"""
WITH toks AS (SELECT {TOKEN_SQL} AS ts FROM documents),
uni AS (SELECT unnest(ts) AS w FROM toks),
ucnt AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
big AS (SELECT ts[i] AS w1, ts[i+1] AS w2
        FROM toks, unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS t(i)),
bcnt AS (SELECT w1, w2, count(*) AS nab FROM big GROUP BY w1, w2),
tot AS (SELECT count(*) AS btot FROM big)
SELECT w1, w2, CAST(nab AS BIGINT) AS n_ab,
       CAST(CAST(nab AS HUGEINT) * btot * 1000000
            // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT) AS pmi_c
FROM bcnt JOIN ucnt a ON w1 = a.w JOIN ucnt b ON w2 = b.w, tot
WHERE nab >= 5
ORDER BY pmi_c DESC, w1, w2 LIMIT 20
"""


@query("q94_collocations", sql=_PMI_SQL)
def q94_collocations(sf_dir: str):
    """Top-20 collocations by PMI — integer-exact: PMI ordering equals
    the ordering of n_ab·B·10⁶ // (n_a·n_b) (scaled cross-ratio), so no
    log/float ever enters the rank.  Plan: combiner-style per-batch
    unigram+bigram count partials → two keyed sums; the unigram table
    (vocab-sized) broadcasts once, bigram rows score in place, and the
    global top-20 reduces via per-block partial top-k — the exchange is
    count partials, never token streams."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])
    MIN_AB = 5

    def count_rows(t: pa.Table) -> pa.Table:
        """ONE tokenize pass emits unigram AND bigram partials: unigrams
        ride as (w1, w2='') rows so a single keyed exchange carries both
        count tables."""
        from collections import Counter

        uc: Counter[str] = Counter()
        bc: Counter[tuple[str, str]] = Counter()
        btot = 0
        for s in t["text"].to_pylist():
            toks = _TOKEN_RE.findall((s or "").lower())
            uc.update(toks)
            bc.update(zip(toks, toks[1:]))
            btot += max(0, len(toks) - 1)
        w1 = [w for w in uc] + [k[0] for k in bc]
        w2 = [""] * len(uc) + [k[1] for k in bc]
        pn = [uc[w] for w in uc] + [bc[k] for k in bc]
        pb = [0] * len(w1)
        if pb:
            pb[0] = btot  # per-batch bigram total rides along: Σ = corpus B
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "pn": pa.array(pn, pa.int64()),
                "pb": pa.array(pb, pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_rows, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("pn", alias_name="n_ab"), Sum("pb", alias_name="pb"))
        .to_pandas()
    )
    btot = int(counts["pb"].sum())
    uni = counts[counts["w2"] == ""]
    udict = dict(zip(uni["w1"], uni["n_ab"].astype(int)))
    big = counts[counts["w2"] != ""].copy()
    big = big[big["n_ab"] >= MIN_AB].copy()
    na = big["w1"].map(udict).astype("int64")
    nb = big["w2"].map(udict).astype("int64")
    # arbitrary-precision Python ints: n_ab·B·10⁶ wraps int64 silently at
    # btot ≳ 1e7 with a frequent bigram (the oracle computes in HUGEINT);
    # the QUOTIENT always fits int64 (≤ B·10⁶), only intermediates grow.
    # Rows here are the ≥MIN_AB bigram table — result-scale, loop is fine.
    big["pmi_c"] = pd.Series(
        [
            int(ab) * btot * 1_000_000 // (int(x) * int(y))
            for ab, x, y in zip(big["n_ab"], na, nb)
        ],
        index=big.index,
        dtype="int64",
    )
    big["n_ab"] = big["n_ab"].astype("int64")
    out = big.sort_values(
        ["pmi_c", "w1", "w2"], ascending=[False, True, True]
    ).head(20)
    return out.reset_index(drop=True)[["w1", "w2", "n_ab", "pmi_c"]]


_DEGREE_SQL = """
WITH e AS (SELECT src, dst FROM read_parquet('/root/repo/tests/fixtures/oracle/pagerank_edges.parquet')),
o AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
i AS (SELECT dst AS node, count(*) AS d FROM e GROUP BY dst)
SELECT * FROM (
  SELECT 'out' AS direction, CAST(d AS BIGINT) AS degree,
         CAST(count(*) AS BIGINT) AS n_nodes FROM o GROUP BY d
  UNION ALL
  SELECT 'in', CAST(d AS BIGINT), CAST(count(*) AS BIGINT) FROM i GROUP BY d
) ORDER BY direction, degree
"""


@query("q95_degree_distribution", sql=_DEGREE_SQL)
def q95_degree_distribution(sf_dir: str):
    """In/out-degree distributions of the crawl link graph — the
    statistic ClaraX's degree-biased host sampling feeds on (ref:
    trwalkers.pas seed weighting) and the first thing to inspect before
    choosing hot-host salts.  Two keyed count exchanges (node-sized)
    then degree-histogram partials (domain-sized) — rows never reach
    the driver."""
    from ray.data.aggregate import Sum

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )

    def deg_rows(col: str):
        def f(t: pa.Table) -> pa.Table:
            s = pd.Series(t[col].to_pandas()).value_counts()
            return pa.table(
                {
                    "node": pa.array(s.index.to_numpy(), pa.string()),
                    "pd_": pa.array(s.to_numpy(), pa.int64()),
                }
            )

        return f

    def hist(direction: str):
        def f(t: pa.Table) -> pa.Table:
            d = t["d"].to_numpy(zero_copy_only=False)
            u, c = np.unique(d, return_counts=True)
            return pa.table(
                {
                    "direction": pa.array([direction] * len(u), pa.string()),
                    "degree": pa.array(u.astype(np.int64)),
                    "pn": pa.array(c.astype(np.int64)),
                }
            )

        return f

    outs = []
    for direction, col in (("out", "src"), ("in", "dst")):
        deg = (
            edges.map_batches(deg_rows(col), batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("pd_", alias_name="d"))
        )
        h = (
            deg.map_batches(hist(direction), batch_format="pyarrow")
            .groupby(["direction", "degree"])
            .aggregate(Sum("pn", alias_name="n_nodes"))
            .to_pandas()
        )
        outs.append(h)
    out = (
        pd.concat(outs, ignore_index=True)
        .sort_values(["direction", "degree"])
        .reset_index(drop=True)
    )
    out["degree"] = out["degree"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out[["direction", "degree", "n_nodes"]]


_ATTRIB_SQL = """
WITH c AS (
  SELECT user_id, max(event_id) AS click_id, ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
p AS (SELECT event_id AS purchase_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS value_c
      FROM events WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, p.value_c,
       CAST(COALESCE(c.click_id, -1) AS BIGINT) AS click_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""


@query("q96_click_attribution", sql=_ATTRIB_SQL)
def q96_click_attribution(sf_dir: str):
    """Last-touch attribution: every purchase joins the SAME USER's most
    recent click at-or-before it — the per-key as-of join
    (``ops/interval.py::asof_join_by``: both sides co-locate in one
    bucketed exchange on user_id, one vectorized ``merge_asof`` across
    all keys per bucket; neither side broadcasts — the big-big temporal
    join the broadcast asof_join cannot express).  Clicks pre-dedupe to
    one per (user, ts) (max event_id) so equal-timestamp ties are
    engine-independent; unmatched purchases keep click_id −1."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.interval import asof_join_by

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def purchases(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        t = t.filter(m)
        vals = [_cents(v) for v in t["value"].to_pylist()]
        return pa.table(
            {
                "purchase_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_c": pa.array(vals, pa.int64()),
            }
        )

    def clicks(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "click")
        t = t.filter(m)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"], "click_id": t["event_id"]}
        )

    # pin the deduped clicks: the as-of exchange samples + shuffles its
    # union input, which would re-run this groupby pipeline (q87 lesson)
    click_ds = bucketed_groupby(
        ev.map_batches(clicks, batch_format="pyarrow"),
        ["user_id", "ts"],
        lambda g: g.groupby(["user_id", "ts"], as_index=False)["click_id"].max(),
    ).materialize()
    out = (
        asof_join_by(
            ev.map_batches(purchases, batch_format="pyarrow"),
            click_ds,
            on="ts",
            by="user_id",
        )
        .to_pandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    out["click_id"] = out["click_id"].fillna(-1).astype("int64")
    out["value_c"] = out["value_c"].astype("int64")
    out["purchase_id"] = out["purchase_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out[["purchase_id", "user_id", "value_c", "click_id"]]


_BOILER_FIXDIR = "/root/repo/tests/fixtures"


@query(
    "q97_boiler_scores",
    sql="SELECT url, div_idx, boiler_score_c, boilerplate, doc_valid FROM "
    f"read_parquet('{_BOILER_FIXDIR}/oracle/boiler_scores_sf0.01.parquet')",
)
def q97_boiler_scores(sf_dir: str):
    """Deboilerplater oracle gate (closing the one §2.2 stage that was
    pytest-only): the distributed actor chain — charset/strip →
    secondpass → Deboilerplater ACTOR POOL loading the committed
    FANN_FLO_2.1 net in __init__ — must reproduce the committed fixture
    of raw FANN-forward per-div scores + doc-kill verdicts produced by a
    scalar per-doc recompute through parse_fann(...).run (an independent
    forward path; tools/gen_oracle_fixtures.py::gen_boiler_scores).
    ref: trdeboilerplater.pas:290-335 (DecideThreshs), :619-699 (FANN)."""
    from texrex_ray.pipelines.raw_docs import charset_and_strip, secondpass_divs
    from texrex_ray.sources.webgraph import make_webgraph
    from texrex_ray.stages.boilerplate import Deboilerplater

    g = make_webgraph(n_hosts=10, pages_per_host_base=10, seed=42)
    recs = [
        {"url": u, "raw": g.pages[u].content, "charset": g.pages[u].charset or ""}
        for u in sorted(u for u, p in g.pages.items() if p.status == 200)
    ]
    kw = dict(batch_format="pyarrow", batch_size=64)
    ds = (
        ray.data.from_items(recs, override_num_blocks=4)
        .map_batches(charset_and_strip, **kw)
        .map_batches(secondpass_divs, **kw)
        .map_batches(
            Deboilerplater,
            fn_constructor_kwargs={
                "fann_file": f"{_BOILER_FIXDIR}/boilerplate_37_18_1.net",
                "min_good_chars": 100,  # fixture pages are small (q27's knob)
            },
            concurrency=(1, 2),
            **kw,
        )
    )

    def explode(t: pa.Table) -> pa.Table:
        urls, idxs, sc, fl, dv = [], [], [], [], []
        for u, divs, v in zip(
            t["url"].to_pylist(), t["divs"].to_pylist(), t["valid"].to_pylist()
        ):
            for i, d in enumerate(divs or []):
                urls.append(u)
                idxs.append(i)
                sc.append(int(np.round(d["boiler_score"] * 1_000_000)))
                fl.append(bool(d["boilerplate"]))
                dv.append(bool(v))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "div_idx": pa.array(idxs, pa.int64()),
                "boiler_score_c": pa.array(sc, pa.int64()),
                "boilerplate": pa.array(fl, pa.bool_()),
                "doc_valid": pa.array(dv, pa.bool_()),
            }
        )

    return (
        ds.map_batches(explode, **kw)
        .to_pandas()
        .sort_values(["url", "div_idx"])
        .reset_index(drop=True)
    )


_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM d)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us, max(us) AS end_us
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q98_sessionization", sql=_SESSIONS_SQL)
def q98_sessionization(sf_dir: str):
    """Gap-based sessionization (30-min) over the event stream — the
    user-behavior workhorse, and the shape of per-source crawl-session
    accounting.  ONE bucketed exchange on user_id; session assignment is
    vectorized diff+cumsum per bucket (ops/sessions.py)."""
    from texrex_ray.ops.sessions import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = (
        sessionize(
            ds, order_cols=("event_id",), gap_us=1_800_000_000,
            expected_rows=ds.count(),
        )
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    for c in ("user_id", "session_idx", "n_events", "start_us", "end_us"):
        out[c] = out[c].astype("int64")
    return out[["user_id", "session_idx", "n_events", "start_us", "end_us"]]


_INVIDX_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({TOKEN_SQL}) AS token FROM documents),
c AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2),
p AS (SELECT token, doc_id, cnt,
             row_number() OVER (PARTITION BY token ORDER BY cnt DESC, doc_id) AS rn
      FROM c),
heads AS (SELECT token, string_agg(doc_id || ':' || cnt, ',' ORDER BY rn) AS top_docs
          FROM p WHERE rn <= 5 GROUP BY token),
agg AS (SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(cnt) AS BIGINT) AS tf
        FROM c GROUP BY token)
SELECT a.token, a.df, a.tf, h.top_docs
FROM agg a JOIN heads h USING (token)
WHERE a.df >= 5 ORDER BY a.token
"""


@query("q99_inverted_index", sql=_INVIDX_SQL)
def q99_inverted_index(sf_dir: str):
    """Inverted-index build: per token, document frequency, total term
    frequency, and the head of the posting list (top-5 docs by in-doc
    count, doc_id tiebreak) serialized as 'doc:cnt,...'.  Per-doc term
    counts are exact partials computed where the docs sit (one row per
    (token, doc) — no cross-batch merge needed), then ONE bucketed
    exchange on token builds df/tf/postings vectorized.  df >= 5 keeps
    the output index-head-sized."""
    from collections import Counter

    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def partial(t: pa.Table) -> pa.Table:
        ids, toks, cnts = [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = Counter(_TOKEN_RE.findall((s or "").lower()))
            ids.extend([int(i)] * len(c))
            toks.extend(c.keys())
            cnts.extend(c.values())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby("token", sort=False)
            .agg(df_=("cnt", "size"), tf=("cnt", "sum"))
            .reset_index()
        )
        agg = agg[agg["df_"] >= 5]
        keep = df[df["token"].isin(agg["token"])]
        keep = keep.sort_values(
            ["token", "cnt", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = keep.groupby("token", sort=False).head(5)
        posting = top["doc_id"].astype(str) + ":" + top["cnt"].astype(str)
        tops = (
            posting.groupby(top["token"], sort=False)
            .agg(",".join)
            .rename("top_docs")
            .reset_index()
        )
        out = agg.merge(tops, on="token").rename(columns={"df_": "df"})
        return out[["token", "df", "tf", "top_docs"]]

    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            "token",
            combine,
            expected_rows=n_docs * 40,
        )
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    out["df"] = out["df"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out[["token", "df", "tf", "top_docs"]]


_QUANTILES_SQL = """
WITH v AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
           FROM lineitem)
SELECT l_returnflag,
       quantile_disc(price_c, 0.10) AS p10,
       quantile_disc(price_c, 0.50) AS p50,
       quantile_disc(price_c, 0.90) AS p90,
       quantile_disc(price_c, 0.99) AS p99
FROM v GROUP BY 1 ORDER BY 1
"""


@query("q100_grouped_quantiles", sql=_QUANTILES_SQL)
def q100_grouped_quantiles(sf_dir: str):
    """Distributed EXACT grouped percentiles (quality-threshold
    calibration): batches compress to (group, value, count) partials in
    place, ONE bucketed exchange sums and selects PERCENTILE_DISC
    positions per group (ops/quantiles.py)."""
    from texrex_ray.ops.quantiles import grouped_exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "price_c": (df["l_extendedprice"] * 100).round().astype("int64"),
            }
        )

    out = (
        grouped_exact_quantiles(
            ds.map_batches(cents, batch_format="pandas"),
            "l_returnflag",
            "price_c",
            [0.10, 0.50, 0.90, 0.99],
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    for c in ("p10", "p50", "p90", "p99"):
        out[c] = out[c].astype("int64")
    return out[["l_returnflag", "p10", "p50", "p90", "p99"]]


_PACKING_SQL = f"""
WITH n AS (SELECT doc_id, doc_id % 8 AS shard,
                  CAST(len({TOKEN_SQL}) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS tok_offset FROM n)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // 2048 AS BIGINT) AS seq_idx
FROM c ORDER BY doc_id
"""


@query("q101_token_packing", sql=_PACKING_SQL)
def q101_token_packing(sf_dir: str):
    """Concat-then-chunk sequence packing (the GPT-style pretraining
    layout): docs are concatenated in doc_id order within fixed shards
    and split into 2048-token sequences; each doc reports its shard,
    global token offset and the sequence its first token lands in.
    Token counting happens where the docs sit; ONE bucketed exchange on
    the shard key orders + cumsums each shard vectorized.  Bins never
    cross shards, so the layout is embarrassingly parallel at any scale
    (shard count is the only knob)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def count_tokens(t: pa.Table) -> pa.Table:
        ids = [int(i) for i in t["doc_id"].to_pylist()]
        n = [len(_TOKEN_RE.findall((s or "").lower())) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array([i % 8 for i in ids], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        off = df.groupby("shard", sort=False)["n_tokens"].cumsum() - df["n_tokens"]
        return df.assign(tok_offset=off, seq_idx=off // 2048)

    out = (
        bucketed_groupby(
            ds.map_batches(count_tokens, batch_format="pyarrow"),
            "shard",
            pack,
            expected_rows=n_docs,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "shard", "n_tokens", "tok_offset", "seq_idx"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "shard", "n_tokens", "tok_offset", "seq_idx"]]


# --------------------------------------------------------------------------
# Cuckoo-filter URL-seen backend (north rule: "sharded bloom/cuckoo")
# --------------------------------------------------------------------------


@query(
    "q102_cuckoo_dedup",
    sql="SELECT DISTINCT md5(text) AS text_md5 FROM documents ORDER BY 1",
)
def q102_cuckoo_dedup(sf_dir: str):
    """q22's streaming first-wins exact dedup with the CUCKOO URL-seen
    backend (``state/cuckoo.py``) behind the same sharded actor pool —
    the oracle doubles as an end-to-end false-positive check on the
    16-bit-fingerprint filter at this corpus size.  Unlike the Bloom
    chain, the cuckoo filter also supports deletion (retract-and-recrawl);
    ``tests/test_cuckoo.py`` covers that path plus engine equivalence."""
    from texrex_ray.dedup.exact import bloom_dedup_hashes

    ds = _read(sf_dir, "documents", ["text"])
    return bloom_dedup_hashes(ds, n_shards=4, backend="cuckoo")


# --------------------------------------------------------------------------
# Edit-distance-1 near-dup join (SymSpell deletion blocking)
# --------------------------------------------------------------------------


@query(
    "q103_editdist_pairs",
    sql="""
    WITH v AS (
        SELECT p_name AS s, CAST(count(*) AS BIGINT) AS n
        FROM part GROUP BY 1
    )
    SELECT a.s AS a, b.s AS b, a.n AS n_a, b.n AS n_b
    FROM v a JOIN v b ON a.s < b.s AND levenshtein(a.s, b.s) = 1
    ORDER BY a, b
    """,
)
def q103_editdist_pairs(sf_dir: str):
    """Typo-level near-dup join: distinct part names at edit distance
    EXACTLY 1, found by SymSpell deletion-neighborhood blocking
    (``dedup/editdist.py``) — the dedup class token/shingle overlap
    cannot express.  Candidates block on hashed 1-deletion variants
    (alphabet-bounded groups, hash-keyed exchange), an exact
    threshold-1 verifier prunes (transpositions share keys but are
    distance 2), pairs dedup on a result-sized exchange.  The oracle is
    the quadratic ``levenshtein`` self-join — tractable at fixture
    vocab, which is exactly why the blocking plan exists for real ones.
    """
    from texrex_ray.dedup.editdist import ed1_pairs

    ds = _read(sf_dir, "part", ["p_name"])
    return ed1_pairs(ds, "p_name", expected_rows=ds.count())


# --------------------------------------------------------------------------
# Good-Turing count-of-counts (LM frequency spectrum)
# --------------------------------------------------------------------------


@query(
    "q104_count_of_counts",
    sql=f"""
    WITH toks AS (SELECT unnest({TOKEN_SQL}) AS token FROM documents),
    v AS (SELECT token, count(*) AS r FROM toks GROUP BY 1)
    SELECT CAST(r AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS n_types
    FROM v GROUP BY r ORDER BY r
    """,
)
def q104_count_of_counts(sf_dir: str):
    """Frequency-of-frequencies spectrum (the Good–Turing / Kneser–Ney
    estimation input): r → number of token types occurring exactly r
    times.  Two combiner-shaped exchanges, both shrinking: token count
    partials (vocab-sized, the q02 pattern), then per-bucket partial
    spectra — the second exchange is distinct-r-sized (≈ O(√corpus) by
    Zipf), so the corpus never moves."""
    from collections import Counter

    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for s in t["text"].to_pylist():
            c.update(_TOKEN_RE.findall((s or "").lower()))
        toks = list(c.keys())
        return pa.table(
            {"token": toks, "pn": pa.array([c[k] for k in toks], pa.int64())}
        )

    def spectrum(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("token", sort=False)["pn"].sum()
        vc = r.value_counts()
        return pd.DataFrame(
            {"r": vc.index.to_numpy(np.int64), "pn_types": vc.to_numpy(np.int64)}
        )

    parts = bucketed_groupby(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        "token",
        spectrum,
        expected_rows=ds.count(),
    ).to_pandas()  # distinct-r × buckets rows: tiny
    out = (
        parts.groupby("r", as_index=False)["pn_types"]
        .sum()
        .rename(columns={"pn_types": "n_types"})
        .sort_values("r")
        .reset_index(drop=True)
    )
    for c in ("r", "n_types"):
        out[c] = out[c].astype("int64")
    return out[["r", "n_types"]]


# --------------------------------------------------------------------------
# ROLLUP aggregation (multi-level partials in one pass)
# --------------------------------------------------------------------------

_ALL = "__all__"


@query(
    "q105_rollup",
    sql=f"""
    SELECT COALESCE(source, '{_ALL}') AS source,
           COALESCE(lang, '{_ALL}') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY ROLLUP(source, lang) ORDER BY 1, 2
    """,
)
def q105_rollup(sf_dir: str):
    """ROLLUP(source, lang) in ONE corpus pass: each batch emits partial
    rows for all three grouping sets — (source, lang), (source, ·),
    (·, ·) — with the '__all__' sentinel, and one groups-sized keyed
    exchange sums them.  3× partial rows per batch beats three corpus
    scans; the exchange is grouping-sets-sized.  (Sentinel precondition:
    no real '__all__' source/lang values — the fixture has none; a real
    corpus would reserve a non-value token.)"""
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
        for cols in (["source", "lang"], ["source"], []):
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
# SemDeDup: within-cluster embedding-cosine dedup
# --------------------------------------------------------------------------


@query(
    "q106_semdedup",
    sql="""
    SELECT CAST(a.vec_id AS BIGINT) AS vec_id, CAST(a.label AS BIGINT) AS label
    FROM embeddings a
    WHERE NOT EXISTS (
        SELECT 1 FROM embeddings b
        WHERE b.label = a.label AND b.vec_id < a.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.35)
    ORDER BY vec_id
    """,
)
def q106_semdedup(sf_dir: str):
    """Semantic dedup (SemDeDup): drop a vector when a lower-id vector in
    the SAME cluster (the ``label`` assignment) is cosine-similar >= 0.35.
    One cluster-keyed exchange + a per-group float64 gram-matrix mask —
    pairwise cosine never crosses cluster boundaries, which is the
    published algorithm's own scale contract.  eps sits in a verified
    >=5e-5 gap of the pair-similarity distribution at every fixture SF,
    so the float64 boundary is decided identically by numpy and DuckDB.
    """
    from texrex_ray.dedup.embed import semdedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return semdedup(ds, eps=0.35)


# --------------------------------------------------------------------------
# Bigram-LM document scoring (count-based perplexity proxy)
# --------------------------------------------------------------------------


@query(
    "q107_bigram_lm_score",
    sql=f"""
    WITH toks AS (SELECT doc_id, {TOKEN_SQL} AS ts FROM documents),
    big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
            FROM toks,
                 unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS t(i)),
    ucnt AS (SELECT w1 AS w, count(*) AS n FROM big GROUP BY 1),
    bcnt AS (SELECT w1, w2, count(*) AS nab FROM big GROUP BY 1, 2)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(nab AS HUGEINT) * 1000000 // n) AS BIGINT) AS score_c
    FROM big d
    JOIN bcnt USING (w1, w2)
    JOIN ucnt ON d.w1 = ucnt.w
    GROUP BY d.doc_id ORDER BY doc_id
    """,
)
def q107_bigram_lm_score(sf_dir: str):
    """Count-based bigram-LM fluency score per document (the classic
    KenLM-style quality signal, integer-exact): score_c = sum over the
    doc's bigram instances of P(w2|w1) in scaled-int form
    ``C(w1,w2) * 1e6 // C(w1 as context)``.

    Shape: ONE bigram-count exchange (per-batch combiner partials →
    bucketed_groupby — vocab²-bounded, sublinear in corpus by Zipf);
    context counts derive from the bigram table itself (no second corpus
    pass for unigrams); both tables broadcast once via ``ray.put`` and
    each doc scores locally — the corpus text never shuffles.  For an
    open-ended bigram domain that outgrows broadcast, the swap is the
    bucketed hash join of dedup/tender.py keyed on (w1,w2) — documented,
    not needed at natural-language vocabulary sizes.  Per-instance floor
    division accumulated in Python ints (no int64 wrap — the q94 advice).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[tuple[str, str]] = Counter()
        for s in t["text"].to_pylist():
            ts = _TOKEN_RE.findall((s or "").lower())
            c.update(zip(ts, ts[1:]))
        w1s, w2s, ns = [], [], []
        for (w1, w2), n in c.items():
            w1s.append(w1)
            w2s.append(w2)
            ns.append(n)
        return pa.table(
            {"w1": w1s, "w2": w2s, "pn": pa.array(ns, pa.int64())}
        )

    from texrex_ray.ops.aggregate import bucketed_groupby

    bcnt = bucketed_groupby(
        ds.map_batches(bigram_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        lambda g: g.groupby(["w1", "w2"], as_index=False)["pn"].sum(),
        expected_rows=ds.count() * 8,
    ).to_pandas()  # bigram-vocab-sized
    nab = dict(zip(zip(bcnt["w1"], bcnt["w2"]), (int(v) for v in bcnt["pn"])))
    ctx = bcnt.groupby("w1")["pn"].sum()
    nctx = dict(zip(ctx.index, (int(v) for v in ctx.to_numpy())))
    nab_ref, nctx_ref = ray.put(nab), ray.put(nctx)

    def score(t: pa.Table) -> pa.Table:
        big = ray.get(nab_ref)
        uni = ray.get(nctx_ref)
        ids, nb, sc = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ts = _TOKEN_RE.findall((s or "").lower())
            total = 0  # Python int: exact, unbounded
            k = 0
            for pair in zip(ts, ts[1:]):
                total += big[pair] * 1_000_000 // uni[pair[0]]
                k += 1
            ids.append(did)
            nb.append(k)
            sc.append(total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "score_c": pa.array(sc, pa.int64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .filter(lambda r: r["n_bigrams"] > 0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out[["doc_id", "n_bigrams", "score_c"]]


# --------------------------------------------------------------------------
# Triangle counting on the crawl link graph
# --------------------------------------------------------------------------

_EDGE_FIXTURE = "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"

_TRIANGLE_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
u AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b
      FROM e WHERE src <> dst),
tri AS (SELECT x.a n1, x.b n2, y.b n3
        FROM u x JOIN u y ON x.b = y.a JOIN u z ON z.a = x.a AND z.b = y.b),
n AS (SELECT n1 AS node FROM tri
      UNION ALL SELECT n2 FROM tri UNION ALL SELECT n3 FROM tri)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM n GROUP BY node ORDER BY node
"""


@query("q108_triangle_counts", sql=_TRIANGLE_SQL)
def q108_triangle_counts(sf_dir: str):
    """Per-node triangle counts of the crawl link graph (link-farm /
    mutual-citation structure).  Degree-ordered orientation bounds the
    wedge explosion at O(m^1.5) and kills the hub-reducer curse; wedges
    meet the edge set on ONE hash-keyed exchange (``ops/graph.py::
    triangle_counts``).  Oracle = the cubic 3-way self-join, tractable
    at fixture size — which is exactly why the oriented-wedge plan
    exists for real graphs."""
    from texrex_ray.ops.graph import triangle_counts

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return triangle_counts(edges, expected_edges=edges.count())


# --------------------------------------------------------------------------
# Grouped OLS trend (integer-exact slope per group)
# --------------------------------------------------------------------------


@query(
    "q109_grouped_trend",
    sql="""
    WITH x AS (SELECT o_orderpriority AS grp,
                      CAST(datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) AS HUGEINT) AS x,
                      CAST(FLOOR(o_totalprice * 100 + 0.5) AS HUGEINT) AS y
               FROM orders),
    s AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM x GROUP BY grp)
    SELECT grp, CAST(n AS BIGINT) AS n,
           CAST((n * sxy - sx * sy) * 1000000
                // (n * sxx - sx * sx) AS BIGINT) AS slope_c
    FROM s ORDER BY grp
    """,
)
def q109_grouped_trend(sf_dir: str):
    """Per-group OLS trend of order value over time, integer-exact:
    slope_c = (n·Σxy − Σx·Σy)·10⁶ // (n·Σxx − Σx²) with x = epoch days,
    y = price cents.  The distributed shape is the moments-combiner
    (q49): each batch emits the five per-group sufficient statistics,
    ONE groups-sized exchange sums them, the slope closes on the
    driver over a groups-sized frame.  Sums accumulate as Python ints
    (exact, unbounded — Σxy at 10⁹ rows × (2·10⁴ days · 10⁹ cents)
    overflows int64, the q94 advice class)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def stats_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "grp": t["o_orderpriority"].to_pylist(),
                # timestamp[us] -> epoch days, vectorized
                "x": (
                    t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000
                ),
                "y": np.floor(
                    t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
                ).astype(np.int64),
            }
        )
        # per-batch int64 products are safe (x ~ 1e4, y ~ 1e7, n_batch ~ 4k);
        # the unbounded accumulation happens in object dtype below
        g = df.groupby("grp", sort=False)
        out = pd.DataFrame(
            {
                "pn": g.size(),
                "sx": g["x"].sum(),
                "sy": g["y"].sum(),
                "sxy": g.apply(
                    lambda d: sum(int(a) * int(b) for a, b in zip(d["x"], d["y"])),
                    include_groups=False,
                ),
                "sxx": g["x"].apply(lambda s: sum(int(v) * int(v) for v in s)),
            }
        ).reset_index()
        for c in ("sx", "sy", "sxy", "sxx"):
            out[c] = out[c].astype(str)  # decimal strings: exact transport
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()  # groups × batches rows: tiny
    )
    rows = []
    for grp, g in parts.groupby("grp"):
        n = int(g["pn"].sum())
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        num = (n * sxy - sx * sy) * 1_000_000
        den = n * sxx - sx * sx  # > 0 unless all x equal in the group
        # DuckDB's integer `//` truncates toward zero; Python's floors —
        # match the SQL twin explicitly for negative slopes
        slope_c = -((-num) // den) if num < 0 else num // den
        rows.append({"grp": grp, "n": n, "slope_c": slope_c})
    out = pd.DataFrame(rows).sort_values("grp").reset_index(drop=True)
    for c in ("n", "slope_c"):
        out[c] = out[c].astype("int64")
    return out[["grp", "n", "slope_c"]]


# --------------------------------------------------------------------------
# HITS hubs & authorities on the crawl link graph
# --------------------------------------------------------------------------

_HITS_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
a1r AS (SELECT dst AS node, CAST(count(*) AS HUGEINT) * 1000000 AS v FROM e GROUP BY dst),
a1 AS (SELECT n.node, COALESCE(a1r.v, 0) * 1000000 // (SELECT max(v) FROM a1r) AS v
       FROM n LEFT JOIN a1r USING (node)),
h1r AS (SELECT e.src AS node, CAST(sum(a1.v) AS HUGEINT) AS v
        FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
h1 AS (SELECT n.node, COALESCE(h1r.v, 0) * 1000000 // (SELECT max(v) FROM h1r) AS v
       FROM n LEFT JOIN h1r USING (node)),
a2r AS (SELECT e.dst AS node, CAST(sum(h1.v) AS HUGEINT) AS v
        FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
a2 AS (SELECT n.node, COALESCE(a2r.v, 0) * 1000000 // (SELECT max(v) FROM a2r) AS v
       FROM n LEFT JOIN a2r USING (node)),
h2r AS (SELECT e.src AS node, CAST(sum(a2.v) AS HUGEINT) AS v
        FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
h2 AS (SELECT n.node, COALESCE(h2r.v, 0) * 1000000 // (SELECT max(v) FROM h2r) AS v
       FROM n LEFT JOIN h2r USING (node))
SELECT n.node AS page, CAST(h2.v AS BIGINT) AS hub_c, CAST(a2.v AS BIGINT) AS auth_c
FROM n JOIN h2 USING (node) JOIN a2 USING (node)
ORDER BY page
"""


@query("q110_hits", sql=_HITS_SQL)
def q110_hits(sf_dir: str):
    """HITS hubs & authorities over the crawl link graph (link hubs vs
    content authorities — the score a harvest crawl prioritizing
    image-bearing pages wants next to PageRank).  Integer-exact
    max-normalized iteration; distribution = the pagerank broadcast
    contract (edges int-encoded once, node-sized score vector via
    ``ray.put``, one gather+bincount pass per half-step).  Oracle
    unrolls the same two iterations as chained SQL CTEs."""
    from texrex_ray.ops.graph import hits_int

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return hits_int(edges, iters=2)


# --------------------------------------------------------------------------
# TrustRank: seed-personalized PageRank for spam-resistant crawl priority
# --------------------------------------------------------------------------

_TRUST_SEEDS = (
    "http://host0.tld0/p0",
    "http://host1.tld1/p11",
    "http://host5.tld2/p1",
)
_TRUST_SEED_SQL = ", ".join(f"'{s}'" for s in _TRUST_SEEDS)

_TRUSTRANK_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
seeds AS (SELECT unnest([{_TRUST_SEED_SQL}]) AS node),
r0 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END AS r
       FROM n LEFT JOIN seeds s USING (node)),
c1 AS (SELECT r0.node, r0.r // deg.d AS c FROM r0 JOIN deg USING (node)),
t1 AS (SELECT e.dst AS node, sum(c1.c) AS t FROM e JOIN c1 ON e.src = c1.node GROUP BY e.dst),
r1 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                      + 850 * COALESCE(t1.t, 0) // 1000 AS r
       FROM n LEFT JOIN seeds s USING (node) LEFT JOIN t1 USING (node)),
c2 AS (SELECT r1.node, r1.r // deg.d AS c FROM r1 JOIN deg USING (node)),
t2 AS (SELECT e.dst AS node, sum(c2.c) AS t FROM e JOIN c2 ON e.src = c2.node GROUP BY e.dst),
r2 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                      + 850 * COALESCE(t2.t, 0) // 1000 AS r
       FROM n LEFT JOIN seeds s USING (node) LEFT JOIN t2 USING (node)),
c3 AS (SELECT r2.node, r2.r // deg.d AS c FROM r2 JOIN deg USING (node)),
t3 AS (SELECT e.dst AS node, sum(c3.c) AS t FROM e JOIN c3 ON e.src = c3.node GROUP BY e.dst),
r3 AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END
                      + 850 * COALESCE(t3.t, 0) // 1000 AS r
       FROM n LEFT JOIN seeds s USING (node) LEFT JOIN t3 USING (node))
SELECT node AS page, CAST(r AS BIGINT) AS rank FROM r3
ORDER BY rank DESC, page
"""


@query("q111_trustrank", sql=_TRUSTRANK_SQL)
def q111_trustrank(sf_dir: str):
    """TrustRank (Gyöngyi et al. 2004): PageRank personalized to a
    curated seed list — teleport mass lands only on seeds, so trust
    flows outward along links and link-farm islands unreachable from
    the seeds score exactly 0.  The spam-resistant priority a frontier
    scheduler combines with raw PageRank.  Same integer algebra and
    broadcast/shuffle plan pair as q70 (``pagerank_int(seeds=)``);
    oracle unrolls the identical three iterations in SQL."""
    from texrex_ray.ops.graph import pagerank_int

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return pagerank_int(edges, iters=3, seeds=set(_TRUST_SEEDS))


# --------------------------------------------------------------------------
# Frontier debt: discovered-but-never-expanded pages by in-degree
# --------------------------------------------------------------------------

_FRONTIER_DEBT_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
din AS (SELECT dst AS page, count(*) AS in_degree FROM e GROUP BY dst)
SELECT page, CAST(in_degree AS BIGINT) AS in_degree
FROM din
WHERE page NOT IN (SELECT DISTINCT src FROM e)
ORDER BY in_degree DESC, page
LIMIT 100
"""


@query("q112_frontier_debt", sql=_FRONTIER_DEBT_SQL)
def q112_frontier_debt(sf_dir: str):
    """Frontier debt: pages the crawl DISCOVERED (appear as link
    targets) but never EXPANDED (never appear as a source), ranked by
    in-degree — the next-round scheduling queue a budgeted crawl wants
    first.  ONE node-keyed exchange: batches emit (node, in-degree
    partial, expanded flag) rows; the bucketed combine sums in-degree
    and drops any node with an expanded witness (distributed anti-join
    without a second table scan).  Top-100 via per-block partial top-k
    — nothing node-sized reaches the driver."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    n_edges = edges.count()

    def partials(t: pa.Table) -> pa.Table:
        dc = pd.Series(t["dst"].to_pandas()).value_counts()
        sc = pd.unique(pd.Series(t["src"].to_pandas()))
        return pa.table(
            {
                "node": pa.array(list(dc.index) + list(sc), pa.string()),
                "din": pa.array(
                    list(dc.to_numpy(np.int64)) + [0] * len(sc), pa.int64()
                ),
                "exp": pa.array(
                    [0] * len(dc) + [1] * len(sc), pa.int64()
                ),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node", as_index=False).agg(
            in_degree=("din", "sum"), expanded=("exp", "max")
        )
        out = agg[(agg["expanded"] == 0) & (agg["in_degree"] > 0)]
        return out[["node", "in_degree"]].rename(columns={"node": "page"})

    debt = bucketed_groupby(
        edges.map_batches(partials, batch_format="pyarrow"),
        "node",
        combine,
        expected_rows=n_edges,
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["in_degree", "page"], ascending=[False, True]
        ).head(100)

    out = (
        debt.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["in_degree", "page"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    out["in_degree"] = out["in_degree"].astype("int64")
    return out[["page", "in_degree"]]


# --------------------------------------------------------------------------
# Grouped robust stats: median / MAD / outlier gate from ONE histogram
# --------------------------------------------------------------------------

_MAD_SQL = """
WITH v AS (SELECT l_returnflag AS grp,
                  CAST(ROUND(l_quantity * 100) AS BIGINT) AS vc
           FROM lineitem),
med AS (SELECT grp, quantile_disc(vc, 0.5) AS med FROM v GROUP BY grp),
d AS (SELECT v.grp, abs(v.vc - med.med) AS dev FROM v JOIN med USING (grp)),
mad AS (SELECT grp, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY grp)
SELECT d.grp,
       CAST(any_value(med.med) AS BIGINT) AS median_c,
       CAST(any_value(mad.mad) AS BIGINT) AS mad_c,
       CAST(count(*) FILTER (d.dev > 3 * mad.mad) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n
FROM d JOIN mad USING (grp) JOIN med USING (grp)
GROUP BY d.grp
ORDER BY d.grp
"""


@query("q113_grouped_mad", sql=_MAD_SQL)
def q113_grouped_mad(sf_dir: str):
    """Robust per-group outlier gate: median, MAD (median absolute
    deviation) and the |x−med| > 3·MAD outlier count — the quality-floor
    calibration that survives heavy tails where mean/stddev break.

    MAD is a pure function of the per-group VALUE HISTOGRAM, so the
    whole thing is ONE (group, value)-count exchange (q100's combiner
    compression): batches compress to count partials in place, the
    bucketed combine derives median via PERCENTILE_DISC positions, folds
    the histogram through |v−med| for the deviation histogram (no second
    data pass), selects MAD the same way, and counts outlier mass.
    Exchange ∝ groups × distinct values, independent of row count."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "grp": df["l_returnflag"],
                "vc": np.round(df["l_quantity"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )
        return (
            out.groupby(["grp", "vc"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
            .astype({"cnt": "int64"})
        )

    def _disc(vals: np.ndarray, cum: np.ndarray, n: int) -> int:
        pos = max(int(np.ceil(0.5 * n)), 1)  # 1-indexed PERCENTILE_DISC
        return int(vals[np.searchsorted(cum, pos, side="left")])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby("grp", sort=False):
            agg = sub.groupby("vc", sort=True)["cnt"].sum()
            vals = agg.index.to_numpy()
            cnts = agg.to_numpy()
            n = int(cnts.sum())
            med = _disc(vals, cnts.cumsum(), n)
            dev = np.abs(vals - med)
            dagg = pd.Series(cnts).groupby(dev).sum()  # fold, don't rescan
            mad = _disc(dagg.index.to_numpy(), dagg.to_numpy().cumsum(), n)
            n_out = int(cnts[dev > 3 * mad].sum())
            rows.append(
                {
                    "grp": g,
                    "median_c": med,
                    "mad_c": mad,
                    "n_outliers": n_out,
                    "n": n,
                }
            )
        return pd.DataFrame(rows)

    out = (
        bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"), "grp", combine
        )
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    for c in ("median_c", "mad_c", "n_outliers", "n"):
        out[c] = out[c].astype("int64")
    return out[["grp", "median_c", "mad_c", "n_outliers", "n"]]


# --------------------------------------------------------------------------
# Containment near-dup: asymmetric subset detection (A embedded in B)
# --------------------------------------------------------------------------

_CONTAIN_SQL = (
    "WITH "
    # inclusive slice: t[i:i+1] = 2 tokens (q14's m=2 is its 3-grams)
    + _GRAMS_CTE.format(m=1, m1=0)
    + """,
    sizes AS (SELECT doc_id, COUNT(*) sz FROM grams GROUP BY 1),
    inter AS (SELECT a.doc_id ia, b.doc_id ib, COUNT(*) i
              FROM grams a JOIN grams b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT ia AS id_a, ib AS id_b, i AS n_inter,
           CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
           CAST(i * 1000000 // least(sa.sz, sb.sz) AS BIGINT) AS cont_c
    FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
    WHERE i * 5 >= 4 * least(sa.sz, sb.sz)
"""
)


@query("q114_containment_dedup", sql=_CONTAIN_SQL)
def q114_containment_dedup(sf_dir: str):
    """Containment near-dup pairs: C = |∩| / min(|A|, |B|) ≥ 0.8 over
    2-gram sets — the ASYMMETRIC complement of Jaccard (q14): a short
    document embedded verbatim in a long one has tiny Jaccard but
    containment ≈ 1 (wire-copy / quoted-reply / boilerplate-wrapper
    dedup).  Threshold in integer arithmetic (5·|∩| ≥ 4·min), score as
    scaled int.  Same exchange plan as q14: gram self-join with sizes
    riding on the pair rows — no driver-broadcast size dict."""
    from texrex_ray.dedup.tender import gram_shingles, shingle_pairs
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    n_docs = ds.count()
    sh = gram_shingles(ds, n=2, size_from_grams=True)
    raw = shingle_pairs(
        sh, max_redundancy=10**9, order_by_size=False, carry_sizes=True,
        expected_rows=n_docs * 60,
    )
    pairs = bucketed_groupby(
        raw,
        ["id_small", "id_big"],
        lambda g: g.groupby(["id_small", "id_big"], sort=False)
        .agg(
            n_inter=("size_small", "size"),
            sz_a=("size_small", "max"),
            sz_b=("size_big", "max"),
        )
        .reset_index(),
        expected_rows=n_docs * 250,
    )

    def finish(t: pa.Table) -> pa.Table:
        ni = pc.cast(t["n_inter"], pa.int64())
        sa = pc.cast(t["sz_a"], pa.int64())
        sb = pc.cast(t["sz_b"], pa.int64())
        mn = pc.min_element_wise(sa, sb)
        out = pa.table(
            {
                "id_a": pc.cast(t["id_small"], pa.int64()),
                "id_b": pc.cast(t["id_big"], pa.int64()),
                "n_inter": ni,
                "sz_a": sa,
                "sz_b": sb,
                "cont_c": pc.divide(
                    pc.multiply(ni, pa.scalar(1_000_000, pa.int64())), mn
                ),
            }
        )
        return out.filter(
            pc.greater_equal(
                pc.multiply(ni, pa.scalar(5, pa.int64())),
                pc.multiply(mn, pa.scalar(4, pa.int64())),
            )
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Crawl-depth map: BFS min-hop distance from the seed set
# --------------------------------------------------------------------------

_DEPTH_SQL = f"""
WITH RECURSIVE e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
walk(node, d) AS (
    SELECT unnest([{_TRUST_SEED_SQL}]) AS node, 0 AS d
    UNION
    SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node WHERE w.d < 20
)
SELECT node AS page, CAST(min(d) AS BIGINT) AS depth
FROM walk GROUP BY node ORDER BY page
"""


@query("q115_crawl_depth", sql=_DEPTH_SQL)
def q115_crawl_depth(sf_dir: str):
    """Crawl-depth map: min-hop distance from the seed list along the
    link graph — what a depth-scoped crawl gates on and what seed-
    proximity priority feeds from.  Broadcast-frontier BFS
    (``ops/graph.py::bfs_depths``): one edge pass per round emitting
    result-bounded distinct-dst partials, ≤ diameter rounds.  Oracle is
    an independent recursive CTE (UNION-distinct walk, min per node)."""
    from texrex_ray.ops.graph import bfs_depths

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return bfs_depths(edges, set(_TRUST_SEEDS), max_depth=20)


# --------------------------------------------------------------------------
# Per-host fetch-budget apportionment (largest-remainder method)
# --------------------------------------------------------------------------

_BUDGET_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
h AS (SELECT regexp_extract(dst, 'http://([^/]+)/', 1) AS host,
             count(*) AS n FROM e GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM h),
b AS (SELECT host, n, 10000 * n // tot AS fl, (10000 * n) % tot AS rem
      FROM h, t),
k AS (SELECT 10000 - sum(fl) AS extra FROM b),
r AS (SELECT host, n, fl, rem,
             row_number() OVER (ORDER BY rem DESC, host ASC) AS rk FROM b)
SELECT host, CAST(n AS BIGINT) AS in_degree,
       CAST(fl + CASE WHEN rk <= (SELECT extra FROM k) THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r ORDER BY host
"""


@query("q116_host_budget", sql=_BUDGET_SQL)
def q116_host_budget(sf_dir: str):
    """Per-host fetch-quota apportionment for the next crawl round:
    split a global budget of 10 000 fetches across hosts proportional
    to observed in-link demand, by the largest-remainder (Hamilton)
    method — integer-exact, sums to the budget EXACTLY (floor quotas
    + one extra to the largest remainders, ties by host).  The
    politeness-budget allocator the north rule's scheduler feeds.
    Plan: vectorized host extraction + combiner count partials → one
    host-sized exchange → driver apportionment over the host table."""
    BUDGET = 10_000
    edges = ray.data.read_parquet(_EDGE_FIXTURE)

    def partial(t: pa.Table) -> pa.Table:
        hosts = (
            pd.Series(t["dst"].to_pandas())
            .str.extract(r"http://([^/]+)/", expand=False)
        )
        c = hosts.value_counts()
        return pa.table(
            {
                "host": pa.array(c.index, pa.string()),
                "pn": pa.array(c.to_numpy(np.int64), pa.int64()),
            }
        )

    counts = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # host-sized
    )
    n = counts["n"].astype("int64")
    tot = int(n.sum())
    fl = (BUDGET * n) // tot
    rem = (BUDGET * n) % tot
    extra = BUDGET - int(fl.sum())
    order = (
        pd.DataFrame({"host": counts["host"], "rem": rem})
        .sort_values(["rem", "host"], ascending=[False, True])
        .index[:extra]
    )
    quota = fl.copy()
    quota.loc[order] += 1
    out = pd.DataFrame(
        {
            "host": counts["host"],
            "in_degree": n,
            "quota": quota.astype("int64"),
        }
    ).sort_values("host").reset_index(drop=True)
    assert int(out["quota"].sum()) == BUDGET  # apportionment invariant
    return out


# --------------------------------------------------------------------------
# Content-defined chunking dedup (gear-hash CDC, FastCDC family)
# --------------------------------------------------------------------------

@query(
    "q117_cdc_dedup",
    sql="SELECT source, n_chunks, n_bytes, n_dup_chunks, dup_bytes FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/cdc_stats_sf0.01.parquet') "
    "ORDER BY source",
)
def q117_cdc_dedup(sf_dir: str):
    """Storage-level dedup report via content-defined chunking: gear-hash
    boundaries (FastCDC family, Xia et al. 2016) split documents at
    content-determined points so shared spans dedup even when offsets
    shift; per-source totals of duplicate chunk occurrences and bytes.
    The 64-tap window sum is fully vectorized (pre-shifted gear tables,
    sentinel-gap concatenation — `dedup/cdc.py`); ONE chunk-hash-keyed
    exchange elects min-(doc_id, idx) owners, 16-byte hashes are the only
    thing that shuffles.  Oracle: committed fixture from the INDEPENDENT
    per-byte sequential chunker + dict first-owner scan."""
    from texrex_ray.dedup.cdc import cdc_dedup_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    n_docs = ds.count()
    return cdc_dedup_stats(ds, avg_bits=6, expected_chunks=n_docs * 8)


# --------------------------------------------------------------------------
# Host-graph contraction + mirror reciprocity
# --------------------------------------------------------------------------

_HOSTGRAPH_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
he AS (SELECT regexp_extract(src, 'http://([^/]+)/', 1) AS hs,
              regexp_extract(dst, 'http://([^/]+)/', 1) AS hd FROM e),
c AS (SELECT hs, hd, count(*) AS n FROM he WHERE hs <> hd GROUP BY hs, hd),
p AS (SELECT least(hs, hd) AS a, greatest(hs, hd) AS b,
             sum(CASE WHEN hs < hd THEN n ELSE 0 END) AS nab,
             sum(CASE WHEN hs > hd THEN n ELSE 0 END) AS nba
      FROM c GROUP BY 1, 2)
SELECT a AS host_a, b AS host_b, CAST(nab AS BIGINT) AS n_ab,
       CAST(nba AS BIGINT) AS n_ba,
       CAST(least(nab, nba) AS BIGINT) AS n_mutual
FROM p ORDER BY host_a, host_b
"""


@query("q118_host_graph", sql=_HOSTGRAPH_SQL)
def q118_host_graph(sf_dir: str):
    """Host-graph contraction: collapse the page link graph onto hosts
    and measure per-host-pair link reciprocity (n_mutual = min of the
    two directions) — the mirror-site / link-exchange-ring signal a
    crawl scheduler uses to collapse redundant hosts.  Plan: vectorized
    host extraction + per-batch canonical-pair partials (combiner), one
    host-pair-sized keyed exchange; page URLs never shuffle."""
    edges = ray.data.read_parquet(_EDGE_FIXTURE)

    def partial(t: pa.Table) -> pa.Table:
        hs = (
            pd.Series(t["src"].to_pandas())
            .str.extract(r"http://([^/]+)/", expand=False)
        )
        hd = (
            pd.Series(t["dst"].to_pandas())
            .str.extract(r"http://([^/]+)/", expand=False)
        )
        df = pd.DataFrame({"hs": hs, "hd": hd})
        df = df[df["hs"] != df["hd"]]
        a = np.minimum(df["hs"], df["hd"])
        b = np.maximum(df["hs"], df["hd"])
        fwd = (df["hs"] < df["hd"]).to_numpy()
        part = (
            pd.DataFrame(
                {
                    "a": a,
                    "b": b,
                    "pab": np.where(fwd, 1, 0),
                    "pba": np.where(fwd, 0, 1),
                }
            )
            .groupby(["a", "b"], as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("pab", alias_name="n_ab"), Sum("pba", alias_name="n_ba"))
        .to_pandas()  # host-pair-sized
        .rename(columns={"a": "host_a", "b": "host_b"})
        .sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )
    out["n_mutual"] = np.minimum(out["n_ab"], out["n_ba"])
    for c in ("n_ab", "n_ba", "n_mutual"):
        out[c] = out[c].astype("int64")
    return out[["host_a", "host_b", "n_ab", "n_ba", "n_mutual"]]


# --------------------------------------------------------------------------
# k-core decomposition of the crawl link graph
# --------------------------------------------------------------------------

@query(
    "q119_core_numbers",
    sql="SELECT node, core FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/core_numbers_sf0.01.parquet') "
    "ORDER BY node",
)
def q119_core_numbers(sf_dir: str):
    """k-core decomposition of the (undirected) crawl link graph — the
    density-peeling statistic: link-farm cores sit at high k, pages that
    survive pruning anchor the authority structure.  Matula–Beck peeling
    lifted to broadcast rounds (``ops/graph.py::core_numbers``): canon
    edge dedup exchange once, then one edge pass per peel round emitting
    result-bounded bincount partials of degree lost to victims.  Oracle:
    committed fixture from the INDEPENDENT per-edge sequential peeling."""
    from texrex_ray.ops.graph import core_numbers

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return core_numbers(edges, expected_edges=edges.count())


# --------------------------------------------------------------------------
# BPE vocabulary training (subword tokenizer merges)
# --------------------------------------------------------------------------

@query(
    "q120_bpe_train",
    sql='SELECT rank, "left", "right", pair_count FROM '
    "read_parquet('/root/repo/tests/fixtures/oracle/bpe_merges_sf0.01.parquet') "
    "ORDER BY rank",
)
def q120_bpe_train(sf_dir: str):
    """BPE tokenizer-vocabulary training (Sennrich et al. 2016): learn
    the 12 most frequent adjacent-symbol merges over the corpus.  The
    corpus is scanned ONCE (word-type count exchange); each merge round
    is a pair-vocab-sized keyed sum + a one-row driver argmax + an
    in-place merge over the vocab-sized type table
    (``functions/bpe.py::bpe_train``).  Ties break to the
    lexicographically smallest pair — fully deterministic.  Oracle:
    committed fixture from the INDEPENDENT dict-based sequential
    trainer."""
    from texrex_ray.functions.bpe import bpe_train

    ds = _read(sf_dir, "documents", ["text"])
    return bpe_train(ds, n_merges=12)


# --------------------------------------------------------------------------
# Rendezvous-hash shard rebalance audit (frontier repartitioning)
# --------------------------------------------------------------------------

_HRW_16 = ", ".join(f"'s{i:02d}'" for i in range(16))
_HRW_20 = ", ".join(f"'s{i:02d}'" for i in range(20))

_HRW_SQL = f"""
WITH e AS (SELECT dst FROM read_parquet('{_EDGE_FIXTURE}')),
k AS (SELECT DISTINCT dst AS key FROM e),
o16 AS (SELECT key, shard FROM (
    SELECT k.key, n.shard,
           row_number() OVER (PARTITION BY k.key
               ORDER BY md5_number_lower(k.key || '|' || n.shard) DESC,
                        n.shard ASC) AS rn
    FROM k CROSS JOIN (SELECT unnest([{_HRW_16}]) AS shard) n) WHERE rn = 1),
o20 AS (SELECT key, shard FROM (
    SELECT k.key, n.shard,
           row_number() OVER (PARTITION BY k.key
               ORDER BY md5_number_lower(k.key || '|' || n.shard) DESC,
                        n.shard ASC) AS rn
    FROM k CROSS JOIN (SELECT unnest([{_HRW_20}]) AS shard) n) WHERE rn = 1)
SELECT o20.shard,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN o16.shard <> o20.shard THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
FROM o20 JOIN o16 USING (key)
GROUP BY o20.shard ORDER BY o20.shard
"""


@query("q121_rendezvous_rebalance", sql=_HRW_SQL)
def q121_rendezvous_rebalance(sf_dir: str):
    """Rendezvous-hash (HRW, Thaler & Ravishankar 1998) shard-rebalance
    audit: route every frontier URL to argmax_{shard} md5(key|shard)
    under 16 and under 20 shards and count what moves — HRW's minimal-
    disruption guarantee (a key moves ONLY to a newly added shard, never
    between survivors) is exactly what the crawl's partition-pinned
    politeness/Bloom state needs when the actor pool resizes.  Plan: ONE
    key-keyed exchange dedups URLs; owners are computed vectorized
    inside the bucket combine (36 tiny md5 passes), and only per-shard
    count partials leave it."""
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.ops.aggregate import bucketed_groupby

    shards16 = [f"s{i:02d}" for i in range(16)]
    shards20 = [f"s{i:02d}" for i in range(20)]
    edges = ray.data.read_parquet(_EDGE_FIXTURE, columns=["dst"])
    n_edges = edges.count()

    def distinct_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": pa.array(pd.unique(pd.Series(t["dst"].to_pandas())), pa.string())}
        )

    def owners(shards: list[str], keys: list[str]) -> np.ndarray:
        m = np.stack(
            [md5_lower64([k + "|" + s for k in keys]) for s in shards]
        )  # (n_shards, n_keys); argmax returns the FIRST max — shard ASC ties
        return np.argmax(m, axis=0)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["key"].drop_duplicates().tolist()
        o16 = owners(shards16, keys)
        o20 = owners(shards20, keys)
        names20 = np.array(shards20, dtype=object)
        moved = np.array(shards16, dtype=object)[o16] != names20[o20]
        part = pd.DataFrame(
            {"shard": names20[o20], "n_keys": 1, "n_moved": moved.astype(np.int64)}
        )
        return part.groupby("shard", as_index=False).sum()

    out = (
        bucketed_groupby(
            edges.map_batches(distinct_partial, batch_format="pyarrow"),
            "key",
            combine,
            expected_rows=n_edges,
        )
        .to_pandas()  # ≤ shards × buckets rows
        .groupby("shard", as_index=False)
        .sum()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    for c in ("n_keys", "n_moved"):
        out[c] = out[c].astype("int64")
    return out[["shard", "n_keys", "n_moved"]]


# --------------------------------------------------------------------------
# Per-document n-gram novelty (corpus-unique gram fraction)
# --------------------------------------------------------------------------

_NOVELTY_SQL = (
    "WITH "
    + _GRAMS_CTE.format(m=2, m1=1)
    + """,
    df AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
    per AS (SELECT doc_id, count(*) AS n_grams,
                   sum(CASE WHEN df.c = 1 THEN 1 ELSE 0 END) AS n_unique
            FROM grams JOIN df USING (g) GROUP BY doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_unique AS BIGINT) AS n_unique,
           CAST(n_unique * 1000000 // n_grams AS BIGINT) AS novelty_c
    FROM per ORDER BY doc_id
"""
)


@query("q122_ngram_novelty", sql=_NOVELTY_SQL)
def q122_ngram_novelty(sf_dir: str):
    """Per-document novelty: the fraction of a doc's distinct 3-grams
    that appear NOWHERE else in the corpus — the de-dup-adjacent quality
    signal (template/boilerplate pages score near 0, original content
    near 1; DoReMi/DSIR-style mixture tuning consumes exactly this).
    Plan: distinct-gram explode (doc-local) → ONE gram-keyed exchange;
    corpus-unique grams emit (doc_id, 1) partials INSIDE the bucket
    combine, per-doc gram totals ride a doc-local pass — both reductions
    are result-(docs-)sized, the corpus text never shuffles twice."""
    from texrex_ray.dedup.tender import gram_shingles
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    n_docs = ds.count()
    # doc_size from size_from_grams = the distinct-gram count per doc —
    # the denominator rides on every gram row, no second corpus pass.
    # Pinned: TWO consumers (the gram exchange + the totals projection)
    # would otherwise re-run the explode per consumer (and the exchange
    # samples its input, q87 lesson).
    sh = gram_shingles(ds, n=3, size_from_grams=True).materialize()

    def uniq_partial(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("shingle", sort=False)["doc_id"].agg(["size", "first"])
        uniq = c[c["size"] == 1]
        part = pd.DataFrame({"doc_id": uniq["first"], "pn": 1})
        return part.groupby("doc_id", as_index=False).sum()

    uniq = (
        bucketed_groupby(sh, "shingle", uniq_partial, expected_rows=n_docs * 60)
        .to_pandas()
        .groupby("doc_id", as_index=False)
        .sum()
    )  # docs-sized (the result size)

    totals = (
        sh.map_batches(
            lambda df: df[["doc_id", "doc_size"]].drop_duplicates("doc_id"),
            batch_format="pandas",
        )
        .to_pandas()
        .drop_duplicates("doc_id")
    )
    out = totals.merge(uniq, on="doc_id", how="left").fillna({"pn": 0})
    out = out.rename(columns={"doc_size": "n_grams", "pn": "n_unique"})
    out["novelty_c"] = (
        out["n_unique"].astype("int64") * 1_000_000 // out["n_grams"]
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_grams", "n_unique", "novelty_c"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "n_grams", "n_unique", "novelty_c"]]


# --------------------------------------------------------------------------
# Crawl-trap detection: URL-shape collapse per host
# --------------------------------------------------------------------------

_TRAP_SQL = f"""
WITH e AS (SELECT dst FROM read_parquet('{_EDGE_FIXTURE}')),
u AS (SELECT DISTINCT dst AS url FROM e),
s AS (SELECT regexp_extract(url, 'http://([^/]+)/', 1) AS host,
             regexp_replace(regexp_extract(url, 'http://[^/]+(/.*)', 1),
                            '[0-9]+', 'N', 'g') AS shape
      FROM u),
per AS (SELECT host, shape, count(*) AS c FROM s GROUP BY host, shape)
SELECT host,
       CAST(sum(c) AS BIGINT) AS n_urls,
       CAST(count(*) AS BIGINT) AS n_shapes,
       CAST(max(c) AS BIGINT) AS max_shape_urls,
       CAST(sum(c) * 1000000 // count(*) AS BIGINT) AS trap_score_c
FROM per GROUP BY host ORDER BY host
"""


@query("q123_crawl_traps", sql=_TRAP_SQL)
def q123_crawl_traps(sf_dir: str):
    """Crawl-trap detection: collapse every discovered URL's PATH to its
    shape (digit runs → N) and score hosts by URLs-per-shape — calendar
    pages, session-id mills and pagination mazes produce unbounded URLs
    of a handful of shapes, and a budgeted crawl caps them before they
    eat the frontier.  ONE host-keyed exchange (per-batch distinct
    (host, shape) count partials; within-bucket URL dedup); integer
    trap score."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    edges = ray.data.read_parquet(_EDGE_FIXTURE, columns=["dst"])
    n_edges = edges.count()

    def partial(t: pa.Table) -> pa.Table:
        urls = pd.Series(pd.unique(pd.Series(t["dst"].to_pandas())))
        host = urls.str.extract(r"http://([^/]+)/", expand=False)
        shape = urls.str.extract(
            r"http://[^/]+(/.*)", expand=False
        ).str.replace(r"[0-9]+", "N", regex=True)
        return pa.Table.from_pandas(
            pd.DataFrame({"host": host, "url": urls, "shape": shape}),
            preserve_index=False,
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("url")  # cross-batch dups land together
        per = g.groupby(["host", "shape"], as_index=False).size()
        out = per.groupby("host", as_index=False).agg(
            n_urls=("size", "sum"),
            n_shapes=("size", "size"),
            max_shape_urls=("size", "max"),
        )
        out["trap_score_c"] = (
            out["n_urls"].astype("int64") * 1_000_000 // out["n_shapes"]
        )
        return out

    out = (
        bucketed_groupby(
            edges.map_batches(partial, batch_format="pyarrow"),
            "host",
            combine,
            expected_rows=n_edges,
        )
        .to_pandas()  # host-sized
        .sort_values("host")
        .reset_index(drop=True)
    )
    for c in ("n_urls", "n_shapes", "max_shape_urls", "trap_score_c"):
        out[c] = out[c].astype("int64")
    return out[["host", "n_urls", "n_shapes", "max_shape_urls", "trap_score_c"]]


# --------------------------------------------------------------------------
# pHash Hamming distance spectrum (dedup-threshold calibration)
# --------------------------------------------------------------------------

@query(
    "q124_phash_spectrum",
    sql="""
    SELECT CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet') a
    JOIN read_parquet('/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet') b
      ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 16
    GROUP BY 1 ORDER BY 1
    """,
)
def q124_phash_spectrum(sf_dir: str):
    """Near-range pHash Hamming distance spectrum (d ≤ 16) over the
    image table — the threshold-calibration curve for payload dedup: the
    gap between the near-dup mass (re-encodes, small crops at low d) and
    the random-pair shoulder tells you where to place q57's radius.
    Same pigeonhole block-LSH machinery (``hamming_pairs``), one
    distance-keyed count finish; nothing all-pairs anywhere."""
    from texrex_ray.dedup.lsh import hamming_pairs
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table")
    n = ds.count()
    pairs = hamming_pairs(
        ds, id_col="image_id", sig_col="phash", max_hamming=16,
        expected_rows=n, expected_pairs=n * 40,
    )
    out = (
        pairs.groupby("hamming")
        .aggregate(Count(alias_name="n_pairs"))
        .to_pandas()  # ≤ 17 rows
        .sort_values("hamming")
        .reset_index(drop=True)
    )
    for c in ("hamming", "n_pairs"):
        out[c] = out[c].astype("int64")
    return out[["hamming", "n_pairs"]]


# --------------------------------------------------------------------------
# Web bowtie decomposition (Broder et al. 2000) around a pivot
# --------------------------------------------------------------------------

_BOWTIE_SQL = f"""
WITH RECURSIVE e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
fwd(node) AS (
    SELECT '{_TRUST_SEEDS[0]}' AS node
    UNION
    SELECT e.dst FROM fwd f JOIN e ON e.src = f.node
),
bwd(node) AS (
    SELECT '{_TRUST_SEEDS[0]}' AS node
    UNION
    SELECT e.src FROM bwd b JOIN e ON e.dst = b.node
),
cls AS (SELECT n.node,
               CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'scc'
                    WHEN b.node IS NOT NULL THEN 'in'
                    WHEN f.node IS NOT NULL THEN 'out'
                    ELSE 'other' END AS component
        FROM n LEFT JOIN fwd f USING (node) LEFT JOIN bwd b USING (node))
SELECT component, CAST(count(*) AS BIGINT) AS n_pages
FROM cls GROUP BY component ORDER BY component
"""


@query("q125_bowtie", sql=_BOWTIE_SQL)
def q125_bowtie(sf_dir: str):
    """Bowtie decomposition of the crawl graph around a pivot (Broder et
    al. 2000, "Graph structure in the Web"): SCC = pages that both reach
    and are reached from the pivot, IN = feed into it, OUT = fed by it,
    OTHER = tendrils/disconnected — the macro-shape a crawl strategist
    reads before spending budget (seeds in IN reach the core; OUT-only
    regions need fresh seeds).  Two BFS sweeps (forward on edges,
    backward on reversed edges) through ``ops/graph.py::bfs_depths`` —
    reachability only, depths discarded; each sweep is ≤ diameter
    result-bounded edge passes.  Oracle: two recursive-CTE closures."""
    from texrex_ray.ops.graph import bfs_depths

    pivot = _TRUST_SEEDS[0]
    edges = ray.data.read_parquet(_EDGE_FIXTURE).materialize()
    fwd = set(bfs_depths(edges, {pivot}, max_depth=10**6)["page"])
    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
    )
    bwd = set(bfs_depths(rev, {pivot}, max_depth=10**6)["page"])

    def classify(t: pa.Table) -> pa.Table:
        nodes = pd.unique(
            pd.concat(
                [pd.Series(t["src"].to_pandas()), pd.Series(t["dst"].to_pandas())]
            )
        )
        return pa.table({"node": pa.array(nodes, pa.string())})

    nodes = pd.unique(
        edges.map_batches(classify, batch_format="pyarrow").to_pandas()["node"]
    )
    comp = np.where(
        np.isin(nodes, list(fwd & bwd)), "scc",
        np.where(
            np.isin(nodes, list(bwd)), "in",
            np.where(np.isin(nodes, list(fwd)), "out", "other"),
        ),
    )
    out = (
        pd.DataFrame({"component": comp})
        .groupby("component", as_index=False)
        .size()
        .rename(columns={"size": "n_pages"})
        .sort_values("component")
        .reset_index(drop=True)
    )
    out["n_pages"] = out["n_pages"].astype("int64")
    return out[["component", "n_pages"]]


# --------------------------------------------------------------------------
# Embedding drift audit: centroid shift between two deterministic halves
# --------------------------------------------------------------------------

_DRIFT_SQL = """
WITH x AS (SELECT label, vec_id,
                  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                       AS BIGINT) AS ci,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings),
cnt AS (SELECT label,
               COUNT(*) FILTER (vec_id % 2 = 0) AS n_a,
               COUNT(*) FILTER (vec_id % 2 = 1) AS n_b
        FROM embeddings GROUP BY label),
s AS (SELECT label, dim,
             COALESCE(SUM(ci) FILTER (vec_id % 2 = 0), 0) AS sa,
             COALESCE(SUM(ci) FILTER (vec_id % 2 = 1), 0) AS sb
      FROM x GROUP BY label, dim),
d AS (SELECT s.label,
             SUM((CAST(c.n_b AS HUGEINT) * s.sa - CAST(c.n_a AS HUGEINT) * s.sb)
                 * (CAST(c.n_b AS HUGEINT) * s.sa - CAST(c.n_a AS HUGEINT) * s.sb))
                 AS drift
      FROM s JOIN cnt c USING (label) GROUP BY s.label)
SELECT CAST(d.label AS BIGINT) AS label,
       CAST(c.n_a AS BIGINT) AS n_a, CAST(c.n_b AS BIGINT) AS n_b,
       CAST(d.drift AS VARCHAR) AS drift_sq
FROM d JOIN cnt c USING (label) ORDER BY label
"""


@query("q126_embedding_drift", sql=_DRIFT_SQL)
def q126_embedding_drift(sf_dir: str):
    """Distribution-shift audit over the embedding table: per label, the
    exact scaled squared distance between the centroids of two
    deterministic halves (even/odd vec_id) — Σ_d (n_b·Σ_a v_d −
    n_a·Σ_b v_d)², i.e. ‖μ_a − μ_b‖² × (n_a·n_b·10⁶)².  A drifting
    ingest (new encoder, corrupted shard) shows up as an outlier label.
    Integer-exact end to end: elements scaled to ints before summation
    (q69's contract), per-(label, dim) int64 diffs cross the exchange,
    the square-and-sum runs in Python ints (the value exceeds int64, so
    it travels as a decimal string — matching the SQL's HUGEINT→VARCHAR)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                 "half": pa.array([], pa.int64()), "pn": pa.array([], pa.int64()),
                 "ps": pa.array([], pa.int64())}
            )
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // len(t)
        vi = np.floor(flat.astype(np.float64).reshape(len(t), d) * 1e6 + 0.5).astype(
            np.int64
        )
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        key = lab * 2 + half
        g = pd.DataFrame(vi).groupby(key).sum()
        cnt = pd.Series(key).value_counts().sort_index()
        rows = {
            "label": np.repeat(g.index.to_numpy() // 2, d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(g)),
            "half": np.repeat(g.index.to_numpy() % 2, d),
            "pn": np.repeat(cnt.to_numpy().astype(np.int64), d),
            "ps": g.to_numpy().reshape(-1),
        }
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim", "half"])
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
        .to_pandas()  # labels × dims × 2 rows
    )
    piv = sums.pivot_table(
        index=["label", "dim"], columns="half", values=["n", "s"],
        fill_value=0, aggfunc="sum",
    )
    out_rows = []
    for label, sub in piv.groupby(level="label"):
        na = int(sub[("n", 0)].iloc[0]) if ("n", 0) in sub else 0
        nb = int(sub[("n", 1)].iloc[0]) if ("n", 1) in sub else 0
        sa = sub[("s", 0)] if ("s", 0) in sub else 0
        sb = sub[("s", 1)] if ("s", 1) in sub else 0
        drift = 0
        for x, y in zip(np.asarray(sa), np.asarray(sb)):
            diff = nb * int(x) - na * int(y)  # Python ints: no wrap
            drift += diff * diff
        out_rows.append(
            {"label": int(label), "n_a": na, "n_b": nb, "drift_sq": str(drift)}
        )
    out = pd.DataFrame(out_rows).sort_values("label").reset_index(drop=True)
    for c in ("label", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out[["label", "n_a", "n_b", "drift_sq"]]


# --------------------------------------------------------------------------
# Deterministic contrastive negative sampling (image-caption training pairs)
# --------------------------------------------------------------------------

_PHASH_FIXTURE = "/root/repo/tests/fixtures/oracle/images_phash_n300_s42.parquet"

_NEGATIVES_SQL = f"""
WITH p AS (SELECT image_id, phash FROM read_parquet('{_PHASH_FIXTURE}')),
cand AS (SELECT a.image_id AS anchor_id, b.image_id AS neg_id,
                md5_number_lower(a.image_id || '|' || b.image_id) AS h
         FROM p a JOIN p b ON a.image_id <> b.image_id
         WHERE bit_count(xor(a.phash, b.phash)) > 16)
SELECT anchor_id, neg_id,
       CAST(row_number() OVER (PARTITION BY anchor_id
                               ORDER BY h, neg_id) AS BIGINT) AS rnk
FROM cand QUALIFY rnk <= 3 ORDER BY anchor_id, rnk
"""


@query("q127_contrastive_negatives", sql=_NEGATIVES_SQL)
def q127_contrastive_negatives(sf_dir: str):
    """Deterministic hard-negative assignment for contrastive
    image-caption training (CLIP-style): for every anchor image, the 3
    pool images with the smallest md5(anchor|candidate) that are NOT
    visual near-dups (pHash Hamming > 16 — a near-dup as \"negative\"
    poisons the loss).  Hash ranking makes the sample layout-invariant
    and shard-re-derivable — no RNG state to checkpoint.  Plan: the
    (id, phash) pool is broadcast once via ``ray.put`` (at corpus scale
    the pool is a q52-style bottom-k hash sample, documented); anchors
    stream through one zero-exchange ``map_batches`` doing a vectorized
    XOR-popcount mask + per-anchor partial top-3."""
    from texrex_ray.dedup.lsh import popcount64
    from texrex_ray.functions.hashing import md5_lower64

    pool = pq.read_table(_PHASH_FIXTURE).to_pandas()
    pool_ref = ray.put(
        (
            pool["image_id"].to_numpy(dtype=object),
            pool["phash"].to_numpy(np.int64).astype(np.uint64),
        )
    )
    ds = ray.data.read_parquet(_PHASH_FIXTURE)

    def negatives(t: pa.Table) -> pa.Table:
        ids, sigs = ray.get(pool_ref)
        out_a, out_n, out_r = [], [], []
        for aid, asig in zip(
            t["image_id"].to_pylist(),
            t["phash"].to_numpy(zero_copy_only=False).astype(np.uint64),
        ):
            ok = (popcount64(sigs ^ asig) > 16) & (ids != aid)
            cand = ids[ok]
            h = md5_lower64([f"{aid}|{c}" for c in cand])
            order = np.lexsort((cand, h))[:3]  # h asc, ties by neg_id
            for r, j in enumerate(order, start=1):
                out_a.append(aid)
                out_n.append(cand[j])
                out_r.append(r)
        return pa.table(
            {
                "anchor_id": pa.array(out_a, pa.string()),
                "neg_id": pa.array(out_n, pa.string()),
                "rnk": pa.array(out_r, pa.int64()),
            }
        )

    out = (
        ds.map_batches(negatives, batch_format="pyarrow")
        .to_pandas()  # 3 rows per anchor — result-sized
        .sort_values(["anchor_id", "rnk"])
        .reset_index(drop=True)
    )
    out["rnk"] = out["rnk"].astype("int64")
    return out[["anchor_id", "neg_id", "rnk"]]


# --------------------------------------------------------------------------
# Neighborhood function / effective diameter (HyperBall)
# --------------------------------------------------------------------------

@query(
    "q128_neighborhood_fn",
    sql="SELECT t, nf_c FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/neighborhood_fn_sf0.01.parquet') "
    "ORDER BY t",
)
def q128_neighborhood_fn(sf_dir: str):
    """Approximate neighborhood function N(t) of the crawl graph via
    HyperBall (Boldi & Vigna 2013 / ANF, Palmer et al. 2002) — the
    effective-diameter curve, computable at web scale where all-pairs
    BFS is hopeless.  Per-node 64-register HLL counters max-merge along
    edges each round; register max is ORDER-INVARIANT so the distributed
    run is bit-identical to sequential, and the float estimates are
    taken once in sorted node order (deterministic).  One broadcast +
    one result-bounded edge pass per round, early-stop at the diameter.
    Oracle: committed fixture from the INDEPENDENT per-edge sequential
    twin."""
    from texrex_ray.ops.graph import neighborhood_function

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return neighborhood_function(edges, t_max=8)


# --------------------------------------------------------------------------
# OPIC on-line page importance (incremental frontier priority)
# --------------------------------------------------------------------------

_OPIC_SQL = f"""
WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
nn AS (SELECT count(*) AS n FROM n),
c0 AS (SELECT n.node, CAST(1000000 AS BIGINT) AS c FROM n),
p0 AS (SELECT COALESCE(sum(c), 0) AS p FROM c0 WHERE node NOT IN (SELECT node FROM deg)),
t1 AS (SELECT e.dst AS node, sum(c0.c // deg.d) AS t
       FROM e JOIN c0 ON e.src = c0.node JOIN deg ON e.src = deg.node GROUP BY e.dst),
c1 AS (SELECT n.node, COALESCE(t1.t, 0) + (SELECT p FROM p0) // (SELECT n FROM nn) AS c
       FROM n LEFT JOIN t1 USING (node)),
p1 AS (SELECT COALESCE(sum(c), 0) AS p FROM c1 WHERE node NOT IN (SELECT node FROM deg)),
t2 AS (SELECT e.dst AS node, sum(c1.c // deg.d) AS t
       FROM e JOIN c1 ON e.src = c1.node JOIN deg ON e.src = deg.node GROUP BY e.dst),
c2 AS (SELECT n.node, COALESCE(t2.t, 0) + (SELECT p FROM p1) // (SELECT n FROM nn) AS c
       FROM n LEFT JOIN t2 USING (node)),
p2 AS (SELECT COALESCE(sum(c), 0) AS p FROM c2 WHERE node NOT IN (SELECT node FROM deg)),
t3 AS (SELECT e.dst AS node, sum(c2.c // deg.d) AS t
       FROM e JOIN c2 ON e.src = c2.node JOIN deg ON e.src = deg.node GROUP BY e.dst),
c3 AS (SELECT n.node, COALESCE(t3.t, 0) + (SELECT p FROM p2) // (SELECT n FROM nn) AS c
       FROM n LEFT JOIN t3 USING (node))
SELECT n.node AS page,
       CAST(c0.c + c1.c + c2.c + c3.c AS BIGINT) AS importance
FROM n JOIN c0 USING (node) JOIN c1 USING (node)
       JOIN c2 USING (node) JOIN c3 USING (node)
ORDER BY importance DESC, page
"""


@query("q129_opic_importance", sql=_OPIC_SQL)
def q129_opic_importance(sf_dir: str):
    """OPIC on-line page importance (Abiteboul et al., WWW 2003) over
    the crawl link graph — the importance signal a frontier can keep
    INCREMENTALLY while crawling (cash moves only when a page is
    visited), unlike PageRank's convergence loop; ClaraX's
    degree-biased host sampling (trwalkers.pas random-walk policy) is
    the implicit version of exactly this priority.  Synchronous-rounds
    integer algebra (dangling cash to a virtual root, redistributed
    ``pot // n`` same round; importance = history + cash), distributed
    on the pagerank broadcast contract.  Oracle unrolls the identical
    three rounds as SQL CTEs — an independent implementation, not a
    stored result."""
    from texrex_ray.ops.graph import opic_int

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return opic_int(edges, rounds=3)


# --------------------------------------------------------------------------
# Weighted k-per-group sample (deterministic priority sampling)
# --------------------------------------------------------------------------

WSAMPLE_K = 5


@query(
    "q130_weighted_sample",
    sql=f"""
    WITH r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT)
                            * 1000000 // GREATEST(n_chars, 1),
                            doc_id
               ) AS rn
        FROM documents
    )
    SELECT source, doc_id FROM r WHERE rn <= {WSAMPLE_K}
    ORDER BY source, doc_id
    """,
)
def q130_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED k-per-source sample, shuffle-free — the
    length-biased pick a mixture builder wants (long documents carry
    more tokens, so token-budget sampling weights by ``n_chars``).

    Priority-sampling shape (Duffield et al. 2007 / Efraimidis–Spirakis
    A-ES): rank by ``u^(1/w)``-style key, keep the bottom k per group.
    The textbook key needs ``ln(u)`` — a float whose last ULP differs
    across libm builds, so cross-engine exactness dies.  This variant
    uses the integer surrogate ``key = md5_64(id)·10⁶ // w`` (Python
    bigints here, HUGEINT in SQL — bit-identical): selection
    probability rises monotonically with weight, the sample is
    layout-invariant, shard-re-derivable, and any shard can verify
    membership locally.  Documented deviation: the inclusion
    probabilities are not the exact E-S ``w_i/Σw`` law.

    Same combiner plan as q52: each batch emits ≤ k·sources candidate
    rows, one result-sized combine picks the winners — zero shuffles
    of the corpus at any scale.
    """
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["source", "key", "doc_id"], kind="mergesort")
        return w.groupby("source", sort=False).head(WSAMPLE_K)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        wts = t["n_chars"].to_numpy(zero_copy_only=False)
        keys = [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
            * 1_000_000
            // max(int(w), 1)
            for i, w in zip(ids, wts)
        ]
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "doc_id": ids,
                # Python bigints (h·10⁶ > 2^64); object dtype compares exactly
                "key": pd.Series(keys, dtype=object),
            }
        )
        return pa.Table.from_pandas(
            bottom_k(df).assign(key=lambda d: d["key"].astype(str)),
            preserve_index=False,
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(key=df["key"].map(int))
        return bottom_k(df).drop(columns=["key"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )
    return (
        out.to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# BPE encode (the trained tokenizer's serving path)
# --------------------------------------------------------------------------

@query(
    "q131_bpe_encode",
    sql="SELECT doc_id, n_words, n_subwords, n_distinct_subwords FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/bpe_encode_sf0.01.parquet') "
    "ORDER BY doc_id",
)
def q131_bpe_encode(sf_dir: str):
    """Distributed BPE ENCODING — q120's trained merges applied to every
    document (the tokenizer serving path; its n_subwords column is the
    exact token-budget input q101's sequence packing consumes).  Merge
    table broadcast once; each batch encodes only its DISTINCT words
    through a per-call memo (Zipf: types ≪ tokens) then maps
    occurrences — zero shuffle, embarrassingly parallel
    (``functions/bpe.py::bpe_encode``).  Merges come from the
    distributed trainer (proven ≡ sequential by q120/test); oracle is a
    committed fixture from the INDEPENDENT per-word sequential encoder
    driven by the sequential trainer."""
    from texrex_ray.functions.bpe import bpe_encode, bpe_train

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_df = bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=12)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    out = bpe_encode(docs, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Cross-modal duplicate clusters (pixels ∪ captions)
# --------------------------------------------------------------------------

_HARVEST_FIX = "/root/repo/tests/fixtures/oracle/image_harvest_sf0.01.parquet"

_CROSSMODAL_FIX = "/root/repo/tests/fixtures/oracle/crossmodal_images.parquet"

_CROSSMODAL_SQL = f"""
WITH RECURSIVE p AS (
    SELECT image_id, caption, phash, w, h FROM read_parquet('{_CROSSMODAL_FIX}')),
toks AS (SELECT image_id, regexp_extract_all(lower(caption), '[a-z]+') AS tk FROM p),
grams AS (
    SELECT DISTINCT image_id, tk[i] || ' ' || tk[i+1] AS g
    FROM toks, unnest(generate_series(1, greatest(len(tk) - 1, 0))) AS t(i)),
sizes AS (SELECT image_id, count(*) AS sz FROM grams GROUP BY image_id),
inter AS (
    SELECT a.image_id AS ia, b.image_id AS ib, count(*) AS ni
    FROM grams a JOIN grams b ON a.g = b.g AND a.image_id < b.image_id
    GROUP BY a.image_id, b.image_id),
cpairs AS (
    SELECT ia, ib FROM inter
    JOIN sizes sa ON sa.image_id = ia JOIN sizes sb ON sb.image_id = ib
    WHERE 5 * ni >= 3 * (sa.sz + sb.sz - ni)),
ppairs AS (
    SELECT a.image_id AS ia, b.image_id AS ib
    FROM p a JOIN p b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 6),
allp AS (SELECT ia, ib FROM cpairs UNION SELECT ia, ib FROM ppairs),
edges AS (SELECT ia AS a, ib AS b FROM allp UNION ALL SELECT ib, ia FROM allp),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node),
clusters AS (SELECT node AS image_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
m AS (SELECT c.cluster_id, c.image_id, CAST(p.w * p.h AS BIGINT) AS px,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY p.w * p.h DESC, c.image_id ASC) AS rk
      FROM clusters c JOIN p USING (image_id))
SELECT cluster_id, COUNT(*) AS n_members,
       MAX(CASE WHEN rk = 1 THEN image_id END) AS canonical_id,
       MAX(CASE WHEN rk = 1 THEN px END)       AS canonical_px
FROM m GROUP BY cluster_id ORDER BY cluster_id
"""


@query("q132_crossmodal_dedup", sql=_CROSSMODAL_SQL)
def q132_crossmodal_dedup(sf_dir: str):
    """Cross-modal duplicate clusters over the harvested image+caption
    table — the UNION of pixel near-dups (pHash Hamming ≤ 6, block-LSH)
    and caption near-dups (2-gram Jaccard ≥ 0.6, integer threshold),
    fused by connected components, one canonical member elected per
    cluster (highest resolution, ties to smaller id).  Re-encoded
    copies drift in pHash, re-captioned mirrors drift in text; a
    single-modality dedup misses half of them
    (``dedup/crossmodal.py``).  Both edge lists are result-sized;
    bytes never shuffle.  Oracle: brute-force gram self-join +
    bit_count pairs + recursive-CTE closure + ROW_NUMBER argmax."""
    from texrex_ray.dedup.crossmodal import crossmodal_clusters

    ds = ray.data.read_parquet(
        _CROSSMODAL_FIX, columns=["image_id", "caption", "phash", "w", "h"]
    )
    return crossmodal_clusters(ds, max_hamming=6, jaccard_num=3, jaccard_den=5)


# --------------------------------------------------------------------------
# Count-based document classifier (multinomial-NB shape)
# --------------------------------------------------------------------------

_NB_SQL = """
WITH split AS (
    SELECT doc_id, text, lang,
           md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS b
    FROM documents),
train AS (SELECT * FROM split WHERE b < 80),
test  AS (SELECT * FROM split WHERE b >= 80),
ttok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
         FROM train),
cnt AS (SELECT lang, tok, count(*) AS n FROM ttok GROUP BY lang, tok),
tot AS (SELECT lang, count(*) AS t FROM ttok GROUP BY lang),
voc AS (SELECT count(DISTINCT tok) AS v FROM ttok),
htok AS (SELECT doc_id, tok, count(*) AS tf FROM
         (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
          FROM test)
         GROUP BY doc_id, tok),
sc AS (SELECT h.doc_id, c.lang,
              sum(h.tf * ((COALESCE(cnt.n, 0) + 1) * 1000000
                          // (c.t + (SELECT v FROM voc)))) AS s
       FROM htok h CROSS JOIN tot c
       LEFT JOIN cnt ON cnt.lang = c.lang AND cnt.tok = h.tok
       GROUP BY h.doc_id, c.lang),
pred AS (SELECT doc_id, lang, s,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY s DESC, lang ASC) AS rk
         FROM sc)
SELECT doc_id, lang AS pred, CAST(s AS BIGINT) AS score
FROM pred WHERE rk = 1 ORDER BY doc_id
"""


@query("q133_nb_classifier", sql=_NB_SQL)
def q133_nb_classifier(sf_dir: str):
    """Distributed count-based document classifier trained AND served in
    place (multinomial-Naive-Bayes shape; the language/quality gate a
    corpus pipeline bootstraps from its own labels).  Train on the q47
    md5-deterministic 80% split: per-batch token-count partials → ONE
    (class, token)-keyed exchange (model-sized, ≪ corpus); serve the
    20% holdout with the weight table broadcast once — zero shuffle.
    Integer-exact log-free weights ``(C+1)·10⁶ // (T_c+V)`` make the
    argmax bit-identical across engines (documented deviation from
    Σ tf·log p̂; ``functions/classify.py``).  Oracle recomputes the
    whole train+serve chain in SQL."""
    from texrex_ray.functions.classify import classify, train_class_weights
    from texrex_ray.functions.hashing import md5_lower64

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tag(t: pa.Table) -> pa.Table:
        b = md5_lower64([str(i) for i in t["doc_id"].to_pylist()]) % 100
        return t.append_column("b", pa.array(b.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()
    train = tagged.filter(expr="b < 80")
    test = tagged.filter(expr="b >= 80")
    n = tagged.count()
    weights, defaults, _ = train_class_weights(train, expected_rows=n * 100)
    out = classify(test, weights, defaults).to_pandas()
    out = out.rename(columns={"pred": "pred"})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Recrawl scheduling: change-rate × age priority (freshness crawl)
# --------------------------------------------------------------------------

_RECRAWL_SQL = """
WITH f AS (
    SELECT user_id AS page, epoch_us(ts) AS t, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
    FROM events),
per AS (
    SELECT page, count(*) AS n_fetches,
           sum(CASE WHEN pv IS NOT NULL AND value <> pv THEN 1 ELSE 0 END)
               AS n_changes,
           max(t) AS last_t
    FROM f GROUP BY page),
g AS (SELECT max(last_t) AS mt FROM per)
SELECT page,
       CAST(n_fetches AS BIGINT) AS n_fetches,
       CAST(n_changes AS BIGINT) AS n_changes,
       CAST(((SELECT mt FROM g) - last_t) // 1000000 AS BIGINT) AS age_s,
       CAST((((SELECT mt FROM g) - last_t) // 1000000)
            * (CASE WHEN n_fetches = 1 THEN 1000000
                    ELSE 1000000 * n_changes // (n_fetches - 1) END + 1)
            AS BIGINT) AS priority
FROM per
ORDER BY priority DESC, page
LIMIT 100
"""


@query("q134_recrawl_priority", sql=_RECRAWL_SQL)
def q134_recrawl_priority(sf_dir: str):
    """Freshness-driven recrawl scheduling (Cho & Garcia-Molina 2000
    shape): pages that change often and haven't been fetched recently
    come first.  The fetch history (here: the events log read as
    page=user_id, fetch time=ts, content signature=value) yields a
    per-page OBSERVED change rate — consecutive-fetch signature flips
    over refetches — and ``priority = age_s · (rate_ppm + 1)`` with
    never-refetched pages at the max-explore rate.  Integer-exact
    throughout (epoch_us // and ppm //).

    Scale shape: ordered adjacency (lag) forces ONE page-keyed
    bucketed exchange of narrow (page, t, value) rows; each bucket
    does a vectorized sort + grouped shift-compare; the per-page
    result is site-table-sized, finished on the driver (global max
    timestamp is one scalar).  Oracle: the same lag/aggregate chain
    as a SQL window query."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    n = ds.count()

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "page": pc.cast(t["user_id"], pa.int64()),
                "t": pc.cast(t["ts"], pa.int64()),  # timestamp[us] -> µs
                "value": t["value"],
                "event_id": pc.cast(t["event_id"], pa.int64()),
            }
        )

    def per_page(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["page", "t", "event_id"], kind="mergesort")
        g = df.groupby("page", sort=False)
        prev = g["value"].shift()
        changed = prev.notna() & (df["value"] != prev)
        out = pd.DataFrame(
            {
                "n_fetches": g.size(),
                "n_changes": changed.groupby(df["page"]).sum().astype("int64"),
                "last_t": g["t"].max(),
            }
        ).reset_index()
        return out

    per = bucketed_groupby(
        ds.map_batches(project, batch_format="pyarrow"),
        "page",
        per_page,
        expected_rows=n,
    ).to_pandas()  # site-table-sized

    mt = int(per["last_t"].max())
    age_s = (mt - per["last_t"].astype("int64")) // 1_000_000
    nf = per["n_fetches"].astype("int64")
    nc = per["n_changes"].astype("int64")
    rate = np.where(nf == 1, 1_000_000, 1_000_000 * nc // np.maximum(nf - 1, 1))
    per_out = pd.DataFrame(
        {
            "page": per["page"].astype("int64"),
            "n_fetches": nf,
            "n_changes": nc,
            "age_s": age_s.astype("int64"),
            "priority": (age_s * (rate + 1)).astype("int64"),
        }
    )
    return (
        per_out.sort_values(["priority", "page"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# Token heavy hitters via top-m + residual summaries (SpaceSaving family)
# --------------------------------------------------------------------------

TOKEN_HH_THRESHOLD = 900


@query(
    "q135_token_heavy_hitters",
    sql=f"""
    WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS item
               FROM documents)
    SELECT item, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY item HAVING count(*) >= {TOKEN_HH_THRESHOLD}
    ORDER BY n DESC, item
    """,
)
def q135_token_heavy_hitters(sf_dir: str):
    """Corpus-vocabulary heavy hitters with a MERGEABLE top-m+residual
    summary (the deterministic SpaceSaving cousin of q56's count-min):
    each batch folds exact local token counts into top-16 + the largest
    discarded count, the driver reduces n_blocks·17 rows into
    never-underestimating upper bounds (unconditional superset — no
    N/m precondition), and an exact ``pc.is_in``-prefiltered count
    verifies candidates.  Stop-word discovery, boilerplate-vocab
    detection, tokenizer-pretraining floors — all read this list.
    ``ops/spacesaving.py``; m=16 < the fixture's 31-token vocab, so
    the truncation path truly runs.  Oracle: plain HAVING count."""
    from texrex_ray.ops.spacesaving import heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])

    def items_of(t: pa.Table) -> list[str]:
        out: list[str] = []
        for s in t["text"].to_pylist():
            out.extend(_TOKEN_RE.findall((s or "").lower()))
        return out

    return heavy_hitters(ds, items_of, threshold=TOKEN_HH_THRESHOLD, m=16)


# --------------------------------------------------------------------------
# Proportional stratified sample (Hamilton quotas × bottom-k-by-hash)
# --------------------------------------------------------------------------

STRAT_BUDGET = 40


@query(
    "q136_proportional_sample",
    sql=f"""
    WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(n) AS t FROM cnt),
    quota AS (SELECT source, ({STRAT_BUDGET} * n) // (SELECT t FROM tot) AS q,
                     ({STRAT_BUDGET} * n) % (SELECT t FROM tot) AS rem
              FROM cnt),
    base AS (SELECT sum(q) AS bq FROM quota),
    rk AS (SELECT source, q,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS r
           FROM quota),
    final AS (SELECT source,
                     q + CASE WHEN r <= {STRAT_BUDGET} - (SELECT bq FROM base)
                              THEN 1 ELSE 0 END AS k
              FROM rk),
    ranked AS (SELECT source, doc_id,
                      ROW_NUMBER() OVER (
                          PARTITION BY source
                          ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)),
                                   doc_id) AS rn
               FROM documents)
    SELECT r.source, r.doc_id
    FROM ranked r JOIN final f USING (source)
    WHERE r.rn <= f.k
    ORDER BY source, doc_id
    """,
)
def q136_proportional_sample(sf_dir: str):
    """PROPORTIONAL stratified sample: a global budget of
    {STRAT_BUDGET} documents split across sources by largest-remainder
    (Hamilton) apportionment — quotas sum to the budget EXACTLY, unlike
    per-source rounding — then filled deterministically per source by
    bottom-k-by-md5 (q52's combiner plan with a per-source k).  The
    eval-set builder's sampler: representation ∝ corpus share, no RNG
    state, any shard can re-derive membership.  Two source-sized
    exchanges (counts, winners); the corpus never shuffles.  Composes
    q116's apportionment with q52's sampling — both already
    oracle-proven; the SQL twin chains the same CTEs."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    counts = (
        ds.groupby("source").count().to_pandas()
    )  # source-cardinality
    counts = counts.rename(columns={"count()": "n"}).sort_values("source")
    total = int(counts["n"].sum())
    q = (STRAT_BUDGET * counts["n"].astype("int64")) // total
    rem = (STRAT_BUDGET * counts["n"].astype("int64")) % total
    leftover = STRAT_BUDGET - int(q.sum())
    order = np.lexsort((counts["source"].to_numpy(), -rem.to_numpy()))
    bump = np.zeros(len(counts), dtype=np.int64)
    bump[order[:leftover]] = 1
    quotas = dict(zip(counts["source"], (q.to_numpy() + bump).astype(int)))
    q_ref = ray.put(quotas)

    def bottom_k(df: pd.DataFrame, ks: dict) -> pd.DataFrame:
        w = df.sort_values(["source", "hk", "doc_id"], kind="mergesort")
        return (
            w.groupby("source", sort=False, group_keys=False)
            .apply(lambda g: g.head(ks.get(g.name, 0)))
            .reset_index(drop=True)
        )

    def partial(t: pa.Table) -> pa.Table:
        ks = ray.get(q_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hk = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                for i in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        df = pd.DataFrame({"source": t["source"].to_pylist(), "doc_id": ids, "hk": hk})
        return pa.Table.from_pandas(bottom_k(df, ks), preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(q_ref)
        return bottom_k(df, ks).drop(columns=["hk"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# Warm-start PageRank: checkpointed rank maintenance between crawl rounds
# --------------------------------------------------------------------------

_PR_ITER = """
r{n} AS (SELECT n.p, CAST(150000 + (850 * COALESCE(SUM(r{p}.r // dg.d), 0)) // 1000 AS BIGINT) AS r
       FROM nodes n
       LEFT JOIN e ON e.dst = n.p
       LEFT JOIN deg dg ON dg.src = e.src
       LEFT JOIN r{p} ON r{p}.p = e.src
       GROUP BY n.p)"""

_WARM_PR_SQL = (
    f"""WITH e AS (SELECT src, dst FROM read_parquet('{_EDGE_FIXTURE}')),
    nodes AS (SELECT src AS p FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT p, CAST(1000000 AS BIGINT) AS r FROM nodes),"""
    + ",".join(_PR_ITER.format(n=i, p=i - 1) for i in range(1, 6))
    + """
    SELECT p AS page, r AS rank FROM r5 ORDER BY rank DESC, page"""
)


@query("q137_warm_start_pagerank", sql=_WARM_PR_SQL)
def q137_warm_start_pagerank(sf_dir: str):
    """Checkpointed rank maintenance: run 3 PageRank iterations, persist
    the (page, rank) state, WARM-START 2 more from it — bit-identical
    to 5 straight iterations, so a crawl can keep refining ranks
    round over round without ever recomputing from scratch
    (``pagerank_int(init_ranks=)``; the graph sibling of q91's
    incremental aggregate maintenance).  Nodes unseen by the prior
    state cold-start at ``scale``; both plans carry the prior — the
    broadcast plan as a node-sized dict, the shuffle plan by joining
    the checkpoint TABLE in without driver materialization.  Oracle
    unrolls the full 5 iterations as SQL CTEs (it has no checkpoint —
    equality proves the warm start loses nothing)."""
    from texrex_ray.ops.graph import pagerank_int

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    first3 = pagerank_int(edges, iters=3)
    return pagerank_int(edges, iters=2, init_ranks=first3)


# --------------------------------------------------------------------------
# Co-partitioned (bucketed) join — a join with zero shuffle
# --------------------------------------------------------------------------

@query(
    "q138_copartitioned_join",
    sql="""
    SELECT c.c_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS total_c
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    ORDER BY custkey
    """,
)
def q138_copartitioned_join(sf_dir: str):
    """Customer⋈orders with ZERO shuffle: both tables are first laid out
    hash-partitioned on the customer key by the resumable sink
    (``state/resume.py::write_partitioned_by_key`` — the layout a
    recurring pipeline persists anyway), then
    ``ops/bucket_join.py::copartitioned_join`` merges partition pairs
    in independent map tasks (the Hive bucketed-join pattern; layout
    contract CHECKED via the _COMMIT markers, mismatched bucket counts
    raise).  At 100 TB this converts the recurring big-big join into a
    map-only pass paid once at write time.  The per-customer aggregate
    closes inside the same partition tasks — custkey never crosses a
    partition boundary by construction."""
    import shutil
    import tempfile

    from texrex_ray.ops.bucket_join import copartitioned_join
    from texrex_ray.state.resume import write_partitioned_by_key

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    root = tempfile.mkdtemp(prefix="coparty_", dir="/tmp")
    try:
        write_partitioned_by_key(cust, f"{root}/cust", "c_custkey", 8)
        write_partitioned_by_key(orders, f"{root}/orders", "c_custkey", 8)
        joined = copartitioned_join(
            f"{root}/cust", f"{root}/orders", "c_custkey", how="inner"
        )

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("c_custkey", as_index=False).agg(
                n_orders=("o_totalprice", "size"),
                total_c=("o_totalprice", lambda s: int(round(float(s.sum()) * 100))),
            )
            return g

        out = joined.map_batches(agg, batch_format="pandas", batch_size=None).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = out.rename(columns={"c_custkey": "custkey"})
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_c"] = out["total_c"].astype("int64")
    return out.sort_values("custkey").reset_index(drop=True)


# --------------------------------------------------------------------------
# Incremental quantile maintenance (mergeable counting histograms)
# --------------------------------------------------------------------------

@query(
    "q139_incremental_quantiles",
    sql="""
    SELECT event_type,
           CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS BIGINT) AS p90
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q139_incremental_quantiles(sf_dir: str):
    """Incremental EXACT quantile maintenance: the per-group counting
    histogram (q46/q100's exchange shape) is a mergeable monoid, so a
    corpus ingested shard-by-shard keeps exact PERCENTILE_DISC
    quantiles by ADDING histograms — history rows are never re-scanned
    (the order-statistics sibling of q91's moment merge and q137's
    rank warm start; ``ops/quantiles.py::histogram_state /
    quantiles_from_states``).  Here the events stream splits into a
    persisted 80% history and a 20% increment; each side builds its
    state independently, one keyed addition merges them.  Oracle:
    live quantile_disc over the FULL corpus — equality proves the
    merge loses nothing."""
    from texrex_ray.ops.quantiles import histogram_state, quantiles_from_states

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64())
        b = pc.cast(
            pc.subtract(
                t["event_id"],
                pc.multiply(pc.divide(t["event_id"], pa.scalar(10)), pa.scalar(10)),
            ),
            pa.int64(),
        )
        return pa.table(
            {"b": b, "event_type": t["event_type"], "v_c": v}
        )

    tagged = ds.map_batches(cents, batch_format="pyarrow").materialize()
    history = tagged.filter(expr="b < 8")
    incr = tagged.filter(expr="b >= 8")
    st_h = histogram_state(history, "event_type", "v_c")
    st_i = histogram_state(incr, "event_type", "v_c")
    out = quantiles_from_states([st_h, st_i], "event_type", "v_c", [0.5, 0.9])
    out = out.rename(columns={"p50": "p50", "p90": "p90"})
    out["p50"] = out["p50"].astype("int64")
    out["p90"] = out["p90"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# --------------------------------------------------------------------------
# Local-cluster personalized PageRank (ACL push)
# --------------------------------------------------------------------------

@query(
    "q140_ppr_push",
    sql="SELECT page, p, r FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/ppr_push_sf0.01.parquet') "
    "ORDER BY p DESC, page",
)
def q140_ppr_push(sf_dir: str):
    """Local-cluster personalized PageRank around one seed page by
    batched ACL push sweeps (Andersen, Chung & Lang 2006): mass pushes
    outward only where residual is large, so work and non-zero support
    stay proportional to the seed's NEIGHBORHOOD — carving the
    community around a known-good (or known-spam) page without ranking
    the whole web, the thing a crawl triage queue actually asks for.
    Integer floors throughout; one node-sized share vector broadcast
    per sweep, edge batches gather+bincount
    (``ops/graph.py::ppr_push_int``).  Oracle: committed fixture from
    the INDEPENDENT per-edge sequential twin."""
    from texrex_ray.ops.graph import ppr_push_int

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return ppr_push_int(edges, "http://host1.tld1/p165", max_rounds=30)


# --------------------------------------------------------------------------
# Banned-phrase blocklist gate (corpus-release scrub, q61's sibling)
# --------------------------------------------------------------------------

# a release blocklist is config-sized; ONE compiled RE2 alternation scans
# each document once regardless of phrase count (shared verbatim with
# DuckDB's RE2) — word-boundary anchored so substrings don't fire
_BLOCKLIST = ("merge", "spill", "outer join", "slow scan")
_BLOCK_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


@query(
    "q141_blocklist_gate",
    sql=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BLOCK_RE}')) AS BIGINT)
               AS n_hits,
           CAST(len(regexp_extract_all(lower(text), '{_BLOCK_RE}')) = 0 AS BOOLEAN)
               AS keep
    FROM documents
    ORDER BY doc_id
    """,
)
def q141_blocklist_gate(sf_dir: str):
    """Banned-phrase blocklist gate — the release-time scrub next to
    q61's PII redaction: a config-sized phrase list compiles to ONE
    word-boundary-anchored RE2 alternation, each document is scanned
    once regardless of phrase count (the regex-set alternative to an
    Aho-Corasick automaton — RE2 builds the same DFA), per-doc hit
    count + keep verdict come out of a single vectorized
    ``pc.count_substring_regex`` pass.  Stateless, shuffle-free; the
    pattern string is shared VERBATIM with DuckDB's RE2 so both
    engines run the same automaton."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        hits = pc.cast(pc.count_substring_regex(low, _BLOCK_RE), pa.int64())
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_hits": hits,
                "keep": pc.equal(hits, pa.scalar(0, pa.int64())),
            }
        )

    out = ds.map_batches(gate, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Greedy max-cover seed selection (crawl seed-list construction)
# --------------------------------------------------------------------------

@query(
    "q142_seed_cover",
    sql="SELECT rank, seed, n_new FROM "
    "read_parquet('/root/repo/tests/fixtures/oracle/seed_cover_sf0.01.parquet') "
    "ORDER BY rank",
)
def q142_seed_cover(sf_dir: str):
    """Crawl seed-list construction by greedy maximum coverage: pick 5
    source pages, each round the one whose out-neighbors add the most
    not-yet-covered pages — the classic (1-1/e)-approximate submodular
    greedy (the influence-maximization pattern).  k rounds; each round
    broadcasts the covered set (bounded by the picked seeds' total
    out-degree) and ONE edge pass emits per-src uncovered-neighbor-SET
    partials merged in a src-keyed exchange (multi-edges collapse in
    the set union); the argmax is one driver row
    (``ops/graph.py::greedy_seed_cover``).  Oracle: committed fixture
    from the INDEPENDENT dict-based sequential twin."""
    from texrex_ray.ops.graph import greedy_seed_cover

    edges = ray.data.read_parquet(_EDGE_FIXTURE)
    return greedy_seed_cover(edges, k=5)


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

    u = (
        ds.map_batches(to_days, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="mn"), Max("day", alias_name="mx"))
        .materialize()  # users-sized
    )
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

    u = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("v_c", alias_name="v_c"), Sum("n", alias_name="n"))
        .materialize()  # users-sized
    )
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
             "vs_raw_ppm"]]
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


# --------------------------------------------------------------------------
# HTML nesting-depth audit over raw pages (q247)
# --------------------------------------------------------------------------

_HTML_FIXTURE = "/root/repo/tests/fixtures/oracle/html_pages_sf0.01.parquet"
VOID_TAGS = ("br", "img", "hr", "meta", "link", "input")
_TAG_RE = re.compile(r"<[^>]+>")
_TAGNAME_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9]*)")

_VOID_SQL = ", ".join(f"'{v}'" for v in VOID_TAGS)

_DEPTH_SQL = f"""
WITH p AS (SELECT url, host, regexp_extract_all(html, '<[^>]+>') AS tg
           FROM read_parquet('{_HTML_FIXTURE}')),
d AS (SELECT url, host, i,
             CASE WHEN tg[CAST(i AS INTEGER)] LIKE '</%' THEN -1
                  WHEN tg[CAST(i AS INTEGER)] LIKE '%/>' THEN 0
                  WHEN lower(regexp_extract(tg[CAST(i AS INTEGER)],
                       '</?([a-zA-Z][a-zA-Z0-9]*)', 1)) IN ({_VOID_SQL})
                       THEN 0
                  ELSE 1 END AS delta
      FROM p, unnest(range(1, len(tg) + 1)) AS u(i)),
w AS (SELECT url, host,
             SUM(delta) OVER (PARTITION BY url ORDER BY i) AS run
      FROM d),
per AS (SELECT p.url, p.host,
               GREATEST(COALESCE(MAX(w.run), 0), 0) AS depth
        FROM p LEFT JOIN w ON w.url = p.url GROUP BY 1, 2)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(SUM(depth) AS BIGINT) AS sum_depth
FROM per GROUP BY host ORDER BY host
"""


@query("q247_html_depth", sql=_DEPTH_SQL)
def q247_html_depth(sf_dir: str):
    """HTML nesting-depth audit over the raw synthetic pages: per
    host, the maximum and summed per-page tag-stack depth (open tags
    push, close tags pop, void/self-closing tags are flat) — the
    structural complexity gauge that sizes the HtmlStripper's div
    stack (`trhtmlstripper.pas:174-189`) and flags crawler-trap
    markup (runaway nesting) before the chain pays for it.  Plan:
    pages regenerate in-process from the seed-pinned webgraph (the
    committed fixture is the SAME bytes for the oracle); per-batch
    per-string tag scan (inherently sequential per document, linear),
    host-keyed count partials only — no page content ever shuffles."""
    from texrex_ray.sources.webgraph import make_webgraph

    g = make_webgraph(
        n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42,
        with_images=True,
    )
    urls = sorted(g.pages)
    pages = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([g.pages[u].host for u in urls]),
                "html": pa.array(
                    [g.pages[u].content.decode("latin-1") for u in urls]
                ),
            }
        )
    ).repartition(8)

    def partial(t: pa.Table) -> pa.Table:
        hosts, depths = [], []
        for host, html in zip(t["host"].to_pylist(), t["html"].to_pylist()):
            depth = run = 0
            for tag in _TAG_RE.findall(html):
                if tag.startswith("</"):
                    run -= 1
                elif tag.endswith("/>"):
                    pass
                else:
                    m = _TAGNAME_RE.match(tag)
                    if m and m.group(1).lower() in VOID_TAGS:
                        pass
                    else:
                        run += 1
                depth = max(depth, run)
            hosts.append(host)
            depths.append(depth)
        df = pd.DataFrame({"host": hosts, "depth": depths})
        g2 = df.groupby("host", as_index=False).agg(
            n_pages=("depth", "size"),
            max_depth=("depth", "max"),
            sum_depth=("depth", "sum"),
        )
        return pa.Table.from_pandas(g2, preserve_index=False)

    out = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Max("max_depth", alias_name="max_depth"),
            Sum("sum_depth", alias_name="sum_depth"),
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    for c in ("n_pages", "max_depth", "sum_depth"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Budget-cut corpus selection by value density (q248)
# --------------------------------------------------------------------------

_SELECT_SQL = f"""
WITH d AS (SELECT doc_id, source,
                  len(regexp_extract_all(lower(text), '[a-z]+')) AS cost,
                  len(list_distinct(regexp_extract_all(lower(text),
                      '[a-z]+'))) AS value
           FROM documents),
r AS (SELECT doc_id, source, cost, value,
             (({PPM} - value * {PPM} // cost) * 8589934592 + doc_id)
                 AS okey
      FROM d),
b AS (SELECT CAST(SUM(cost) * 2 // 5 AS BIGINT) AS budget FROM d),
s AS (SELECT source, cost, value, okey,
             COALESCE(SUM(cost) OVER (ORDER BY okey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prev_sum
      FROM r)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(cost) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN prev_sum + cost <= b.budget THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       CAST(SUM(CASE WHEN prev_sum + cost <= b.budget THEN cost ELSE 0 END)
            AS BIGINT) AS tokens_selected
FROM s, b GROUP BY source ORDER BY source
"""


@query("q248_budget_selection", sql=_SELECT_SQL)
def q248_budget_selection(sf_dir: str):
    """Budget-cut corpus selection: rank every document by lexical
    value density (distinct tokens per token, PPM — the cheap quality
    proxy) and keep documents, best first, while the exclusive
    running token cost stays inside a 40%-of-corpus token budget —
    the data-selection pass a fixed training budget forces, reported
    per source.  Plan: per-doc (cost, value) is one vectorized pass;
    the global priority order needs NO sort — ``ops/window.py::
    prefix_scan_sum`` range-slices the integer order key
    ((PPM - density) * 2^33 + doc_id, unique and priority-ordered),
    carries bucket sums, and each doc tests ``prev_sum + cost <=
    budget`` locally.  Two narrow integer exchanges."""
    from texrex_ray.ops.window import prefix_scan_sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def measure(t: pa.Table) -> pa.Table:
        costs, values = [], []
        for txt in t["text"].to_pylist():
            toks = _TOKEN_RE.findall((txt or "").lower())
            costs.append(len(toks))
            values.append(len(set(toks)))
        cost = np.array(costs, dtype=np.int64)
        value = np.array(values, dtype=np.int64)
        did = t["doc_id"].cast(pa.int64()).to_numpy()
        okey = (PPM - value * PPM // cost) * 8589934592 + did
        return pa.table(
            {
                "source": t["source"],
                "cost": pa.array(cost),
                "okey": pa.array(okey),
            }
        )

    m = ds.map_batches(measure, batch_format="pyarrow").materialize()
    budget = int(m.sum("cost")) * 2 // 5
    scanned = prefix_scan_sum(m, "okey", "cost")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        sel = df["prev_sum"] + df["cost"] <= budget
        df = df.assign(
            n_docs=1,
            tokens_total=df["cost"],
            n_selected=sel.astype(np.int64),
            tokens_selected=np.where(sel, df["cost"], 0),
        )
        return df.groupby("source", as_index=False)[
            ["n_docs", "tokens_total", "n_selected", "tokens_selected"]
        ].sum()

    cols = ["n_docs", "tokens_total", "n_selected", "tokens_selected"]
    out = (
        scanned.map_batches(pick, batch_format="pandas")
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[["source", *cols]]


# --------------------------------------------------------------------------
# URL-seen state sizing plan: Bloom vs cuckoo bytes per host (q249)
# --------------------------------------------------------------------------

# 1% Bloom: m/n = ln(1/p)/ln^2(2) = 9.585 bits/key (k = 7), as the exact
# rational 9585/1000; cuckoo: 2-byte slots (12-bit fingerprint + padding)
# at 0.95 load -> slots = ceil(n * 20 / 19)

_SIZING_SQL = f"""
WITH u AS (SELECT DISTINCT dst AS url,
                  regexp_extract(dst, 'http://([^/]+)/', 1) AS host
           FROM read_parquet('{_EDGE_FIXTURE}')),
per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM u GROUP BY 1)
SELECT host, n_urls,
       CAST((n_urls * 9585 + 7999) // 8000 AS BIGINT) AS bloom_bytes,
       CAST(((n_urls * 20 + 18) // 19) * 2 AS BIGINT) AS cuckoo_bytes
FROM per ORDER BY host
"""


@query("q249_state_sizing", sql=_SIZING_SQL)
def q249_state_sizing(sf_dir: str):
    """URL-seen state sizing plan: per host (= per politeness shard),
    the exact bytes a 1%-FPR Bloom filter (9.585 bits/key as the
    rational 9585/1000, k=7) and a 0.95-load 2-byte-slot cuckoo filter
    need for that host's distinct URL count — the capacity table that
    decides which sharded `state/bloom.py` vs `state/cuckoo.py`
    variant a 10^10-frontier deployment allocates, and what each
    partition's checkpoint will weigh.  Plan: distinct-URL census
    (ONE host-keyed exchange), host-sized integer arithmetic."""
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
        u = df.drop_duplicates("url")
        return (
            u.groupby("host", as_index=False)
            .size()
            .rename(columns={"size": "n_urls"})
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
    n = out["n_urls"].astype("int64")
    out["bloom_bytes"] = (n * 9585 + 7999) // 8000
    out["cuckoo_bytes"] = ((n * 20 + 18) // 19) * 2
    for c in ("n_urls", "bloom_bytes", "cuckoo_bytes"):
        out[c] = out[c].astype("int64")
    return out[["host", "n_urls", "bloom_bytes", "cuckoo_bytes"]]


# --------------------------------------------------------------------------
# A/A chi-square calibration of the drift monitor (q250)
# --------------------------------------------------------------------------

CHI_BIN_W = 20  # doc token-count bin width
CHI_BINS = 10  # bins 0..9, last bin open-ended

_CHI_SQL = f"""
WITH d AS (SELECT source,
                  md5_number_lower(CAST(doc_id AS VARCHAR)) % 2 AS half,
                  LEAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                        // {CHI_BIN_W}, {CHI_BINS - 1}) AS bin
           FROM documents),
c AS (SELECT source, bin,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM d GROUP BY 1, 2),
n AS (SELECT source, CAST(SUM(a) AS BIGINT) AS na,
             CAST(SUM(b) AS BIGINT) AS nb FROM c GROUP BY 1),
per AS (SELECT c.source, c.bin, c.a, c.b,
               CAST((c.a * n.nb - c.b * n.na) * (c.a * n.nb - c.b * n.na)
                    * {PPM} // (n.na * n.nb * (c.a + c.b)) AS BIGINT)
                   AS chi_ppm
        FROM c JOIN n ON n.source = c.source)
SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
       CAST(SUM(chi_ppm) AS BIGINT) AS chi2_ppm
FROM per GROUP BY source ORDER BY source
"""


@query("q250_aa_drift_calibration", sql=_CHI_SQL)
def q250_aa_drift_calibration(sf_dir: str):
    """A/A calibration of the drift monitor: split every source's
    documents into two content-stable halves (md5 of doc_id — NOT a
    time or layout split, so the two samples are exchangeable by
    construction) and compute the exact integer chi-square statistic
    between their token-length histograms.  A drift alarm (cf. q161's
    KS) is only trustworthy if this A/A number sits near zero — run it
    before believing any A/B drift reading.  Per-bin floor-PPM
    contributions so both engines sum identical integers.  Plan:
    per-batch (source, half, bin) count partials, ONE
    sources*bins-sized exchange."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        srcs, halves, bins = [], [], []
        for i, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(),
            t["text"].to_pylist(),
        ):
            half = int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[8:], "little"
            ) % 2
            b = min(
                len(_TOKEN_RE.findall((txt or "").lower())) // CHI_BIN_W,
                CHI_BINS - 1,
            )
            srcs.append(src)
            halves.append(half)
            bins.append(b)
        df = pd.DataFrame(
            {"source": srcs, "half": halves, "bin": bins, "n": 1}
        )
        return pa.Table.from_pandas(
            df.groupby(["source", "half", "bin"], as_index=False).sum(),
            preserve_index=False,
        )

    cnt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "half", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # sources x 2 x bins rows
    )
    piv = (
        cnt.pivot_table(
            index=["source", "bin"], columns="half", values="n",
            fill_value=0, aggfunc="sum",
        )
        .reset_index()
    )
    for h in (0, 1):
        if h not in piv.columns:
            piv[h] = 0
    rows = []
    for src, sub in piv.groupby("source"):
        na = int(sub[0].sum())
        nb = int(sub[1].sum())
        chi = 0
        for _, r in sub.iterrows():
            a, b = int(r[0]), int(r[1])
            num = (a * nb - b * na) ** 2 * PPM
            chi += num // (na * nb * (a + b))
        rows.append((src, len(sub), chi))
    out = pd.DataFrame(
        rows, columns=["source", "n_bins", "chi2_ppm"]
    ).sort_values("source").reset_index(drop=True)
    for c in ("n_bins", "chi2_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Global channel normalization constants (q251)
# --------------------------------------------------------------------------

_CHSTATS_FIXTURE = (
    "/root/repo/tests/fixtures/oracle/channel_stats_n300_s42.parquet"
)

_CHSTATS_SQL = f"""
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(n_px) AS BIGINT) AS n_px,
       CAST(SUM(sum_r) AS BIGINT) AS sum_r,
       CAST(SUM(sum_g) AS BIGINT) AS sum_g,
       CAST(SUM(sum_b) AS BIGINT) AS sum_b,
       CAST(SUM(sq_r) AS BIGINT) AS sq_r,
       CAST(SUM(sq_g) AS BIGINT) AS sq_g,
       CAST(SUM(sq_b) AS BIGINT) AS sq_b,
       CAST(SUM(sum_r) * 1000 // SUM(n_px) AS BIGINT) AS mean_r_milli,
       CAST(SUM(sum_g) * 1000 // SUM(n_px) AS BIGINT) AS mean_g_milli,
       CAST(SUM(sum_b) * 1000 // SUM(n_px) AS BIGINT) AS mean_b_milli
FROM read_parquet('{_CHSTATS_FIXTURE}') GROUP BY fmt ORDER BY fmt
"""


@query("q251_channel_stats", sql=_CHSTATS_SQL)
def q251_channel_stats(sf_dir: str):
    """Dataset normalization constants: exact per-channel pixel sums,
    sums of squares, and milli-scaled means per format over the full
    decoded payload table — what every vision trainer hard-codes as
    `mean=[...], std=[...]`, computed distributedly and bit-identical
    under any partitioning because only EXACT integers are exchanged
    (means derive at the end; std follows from sq/n - mean^2 on the
    same integers).  Plan: `stages/images.py::ChannelStats` actor pool
    (decode in `__init__`-held codec, pixels never shuffle; 7 int64
    columns out), fmt-keyed sum combine.  Oracle: committed fixture
    from the INDEPENDENT scalar-loop serial decoder."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import ChannelStats

    d = fixture_path(n=300, seed=42)
    ds = read_images(
        f"{d}/images_table", columns=["image_id", "fmt", "bytes"]
    )
    stats = ds.map_batches(
        ChannelStats, batch_size=32, concurrency=2, batch_format="pyarrow"
    )
    cols = ["n_px", "sum_r", "sum_g", "sum_b", "sq_r", "sq_g", "sq_b"]

    def with_count(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_images", pa.array(np.ones(t.num_rows, np.int64))
        )

    out = (
        stats.map_batches(with_count, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n_images", *cols)])
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for ch in ("r", "g", "b"):
        out[f"mean_{ch}_milli"] = [
            int(s) * 1000 // int(n)
            for s, n in zip(out[f"sum_{ch}"], out["n_px"])
        ]
    keep = ["fmt", "n_images", *cols,
            "mean_r_milli", "mean_g_milli", "mean_b_milli"]
    for c in keep[1:]:
        out[c] = out[c].astype("int64")
    return out[keep]


# --------------------------------------------------------------------------
# Nation-pair trade flows (TPC-H Q7 shape) (q252)
# --------------------------------------------------------------------------

FLOW_TOPK = 30

_FLOWS_SQL = f"""
WITH f AS (SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                  CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      // 100 AS vol_c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           WHERE cn.n_name <> sn.n_name)
SELECT cust_nation, supp_nation, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(vol_c) AS BIGINT) AS volume_c
FROM f GROUP BY 1, 2
ORDER BY volume_c DESC, cust_nation, supp_nation LIMIT {FLOW_TOPK}
"""


@query("q252_nation_flows", sql=_FLOWS_SQL)
def q252_nation_flows(sf_dir: str):
    """Cross-nation trade flows (the TPC-H Q7 join shape): volume
    shipped from each supplier nation to each distinct customer
    nation, top {FLOW_TOPK} lanes — the 6-table join stress test that
    proves a reference user can port their heaviest reporting query.
    Plan: ONE shuffle_join for the only fact-fact edge
    (lineitem x orders, both corpus-sized, auto-bucketed hash
    exchange); every dimension (customer, supplier, nation) rides a
    broadcast_join — small sides ship once via ray.put, never through
    an exchange; partial (pair, count, cents) aggregation before the
    pair-sized final combine."""
    from texrex_ray.ops.join import broadcast_join, shuffle_join

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    cust_nat = cust.merge(
        nat.rename(columns={"n_name": "cust_nation"}),
        left_on="c_nationkey", right_on="n_nationkey",
    )[["c_custkey", "cust_nation"]]
    supp_nat = supp.merge(
        nat.rename(columns={"n_name": "supp_nation"}),
        left_on="s_nationkey", right_on="n_nationkey",
    )[["s_suppkey", "supp_nation"]]

    j = shuffle_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        expected_rows=li.count(),
    )
    j = broadcast_join(j, cust_nat, on="o_custkey", right_on="c_custkey")
    j = broadcast_join(j, supp_nat, on="l_suppkey", right_on="s_suppkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cust_nation"] != df["supp_nation"]]
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        # pure integer cents x (100 - discount hundredths) // 100: exact
        # and engine-invariant (per-row float ROUND hits .5 ties)
        df = df.assign(n_items=1, vol_c=price_c * (100 - disc_h) // 100)
        return df.groupby(["cust_nation", "supp_nation"], as_index=False)[
            ["n_items", "vol_c"]
        ].sum()

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby(["cust_nation", "supp_nation"])
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("vol_c", alias_name="volume_c"),
        )
        .to_pandas()  # nation-pair-sized
        .sort_values(
            ["volume_c", "cust_nation", "supp_nation"],
            ascending=[False, True, True],
        )
        .head(FLOW_TOPK)
        .reset_index(drop=True)
    )
    for c in ("n_items", "volume_c"):
        agg[c] = agg[c].astype("int64")
    return agg[["cust_nation", "supp_nation", "n_items", "volume_c"]]


# --------------------------------------------------------------------------
# Crawl action mix by walk phase (q253)
# --------------------------------------------------------------------------

_VISITS_FIXTURE = (
    "/root/repo/tests/fixtures/oracle/crawl_visits_sf0.01.parquet"
)

_ACTMIX_SQL = f"""
WITH v AS (SELECT seq, action,
                  seq * 10 // (SELECT MAX(seq) + 1 FROM read_parquet(
                      '{_VISITS_FIXTURE}')) AS decile
           FROM read_parquet('{_VISITS_FIXTURE}'))
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_visits,
       CAST(SUM(CASE WHEN action = 'step' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_step,
       CAST(SUM(CASE WHEN action = 'randomjump' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_jump,
       CAST(SUM(CASE WHEN action = 'seed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_seed
FROM v GROUP BY 1 ORDER BY 1
"""


@query("q253_crawl_action_mix", sql=_ACTMIX_SQL)
def q253_crawl_action_mix(sf_dir: str):
    """Crawl dynamics audit: the walk-action mix (step / randomjump /
    seed) per decile of the visit sequence — the observable that says
    whether the random-walk policy has entered its steady state
    (early deciles are seed/jump-heavy while the frontier warms, late
    deciles should be step-dominated) and the first chart to read when
    tuning jump probability against trap escape (q123).  Plan: the
    visit log is already the crawl engine's per-partition parquet
    output; decile assignment is one vectorized pass, decile-keyed
    count partials only."""
    visits = ray.data.read_parquet(_VISITS_FIXTURE)
    hi = int(visits.max("seq")) + 1

    def partial(t: pa.Table) -> pa.Table:
        seq = t["seq"].cast(pa.int64()).to_numpy()
        act = np.asarray(t["action"].to_pylist())
        df = pd.DataFrame(
            {
                "decile": seq * 10 // hi,
                "n_visits": 1,
                "n_step": (act == "step").astype(np.int64),
                "n_jump": (act == "randomjump").astype(np.int64),
                "n_seed": (act == "seed").astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("decile", as_index=False).sum(), preserve_index=False
        )

    cols = ["n_visits", "n_step", "n_jump", "n_seed"]
    out = (
        visits.map_batches(partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    for c in ("decile", *cols):
        out[c] = out[c].astype("int64")
    return out[["decile", *cols]]


# --------------------------------------------------------------------------
# Segment x priority association lift (q254)
# --------------------------------------------------------------------------

_LIFT_SQL = f"""
WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
cell AS (SELECT seg, prio, CAST(count(*) AS BIGINT) AS n_obs
         FROM j GROUP BY 1, 2),
m AS (SELECT seg, CAST(SUM(n_obs) AS BIGINT) AS n_seg FROM cell GROUP BY 1),
p AS (SELECT prio, CAST(SUM(n_obs) AS BIGINT) AS n_prio FROM cell GROUP BY 1)
SELECT cell.seg, cell.prio, cell.n_obs,
       CAST(cell.n_obs * n.n * {PPM} // (m.n_seg * p.n_prio) AS BIGINT)
           AS lift_ppm
FROM cell JOIN m ON m.seg = cell.seg
JOIN p ON p.prio = cell.prio
CROSS JOIN n
ORDER BY cell.seg, cell.prio
"""


@query("q254_segment_priority_lift", sql=_LIFT_SQL)
def q254_segment_priority_lift(sf_dir: str):
    """Contingency-table lift between customer market segment and
    order priority: observed / expected-under-independence as exact
    PPM (``n_obs * N * PPM // (n_seg * n_prio)``; PPM ~ 1e6 means
    independent) — the association screen that decides whether a
    stratified sampler (q85) must stratify on BOTH columns or one is
    redundant.  Plan: the fact-dim edge is a broadcast_join (customer
    segments ship once); (seg, prio) count partials, one 25-cell
    combine, margins derived from the SAME cell counts so the
    identity sum(cells) == N is exact."""
    from texrex_ray.ops.join import broadcast_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    j = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(
            columns={"c_mktsegment": "seg", "o_orderpriority": "prio"}
        ).assign(n_obs=1)
        return df.groupby(["seg", "prio"], as_index=False)["n_obs"].sum()

    cell = (
        j.map_batches(partial, batch_format="pandas")
        .groupby(["seg", "prio"])
        .aggregate(Sum("n_obs", alias_name="n_obs"))
        .to_pandas()  # seg x prio cells
    )
    n = int(cell["n_obs"].sum())
    n_seg = cell.groupby("seg")["n_obs"].transform("sum")
    n_prio = cell.groupby("prio")["n_obs"].transform("sum")
    cell["lift_ppm"] = [
        int(o) * n * PPM // (int(a) * int(b))
        for o, a, b in zip(cell["n_obs"], n_seg, n_prio)
    ]
    out = cell.sort_values(["seg", "prio"]).reset_index(drop=True)
    for c in ("n_obs", "lift_ppm"):
        out[c] = out[c].astype("int64")
    return out[["seg", "prio", "n_obs", "lift_ppm"]]


# --------------------------------------------------------------------------
# Crawl coverage vs the seed-reachable set (q255)
# --------------------------------------------------------------------------

_G42_EDGES = "/root/repo/tests/fixtures/oracle/graph42_edges.parquet"
_G42_SEEDS = "/root/repo/tests/fixtures/oracle/graph42_seeds.parquet"

_COVERAGE_SQL = f"""
WITH RECURSIVE e AS (SELECT src, dst FROM read_parquet('{_G42_EDGES}')),
walk(node) AS (
    SELECT url AS node FROM read_parquet('{_G42_SEEDS}')
    UNION
    SELECT e.dst FROM walk w JOIN e ON e.src = w.node
),
reach AS (SELECT DISTINCT node AS url,
                 regexp_extract(node, 'http://([^/]+)/', 1) AS host
          FROM walk),
vis AS (SELECT DISTINCT url FROM read_parquet('{_VISITS_FIXTURE}'))
SELECT reach.host, CAST(count(*) AS BIGINT) AS n_reachable,
       CAST(SUM(CASE WHEN vis.url IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_visited,
       CAST(SUM(CASE WHEN vis.url IS NOT NULL THEN 1 ELSE 0 END) * {PPM}
            // count(*) AS BIGINT) AS coverage_ppm
FROM reach LEFT JOIN vis ON vis.url = reach.url
GROUP BY reach.host ORDER BY reach.host
"""


@query("q255_crawl_coverage", sql=_COVERAGE_SQL)
def q255_crawl_coverage(sf_dir: str):
    """Crawl coverage audit: of the pages REACHABLE from the seed set
    (the crawl's theoretical ceiling), the per-host fraction the
    150-step reference walk actually visited — the recall number that
    separates "the walk is short" from "the policy starves this host"
    (read with q112's frontier debt and q217's discovery curve).
    Plan: reachability is `ops/graph.py::bfs_depths` (per-round
    frontier broadcast, edge-batch joins — the PageRank exchange
    shape); the visit log joins as a broadcast filter; host-sized
    combine.  Oracle: DuckDB runs its own recursive-CTE closure over
    the committed edge fixture — independent BFS implementations."""
    from texrex_ray.ops.graph import bfs_depths

    edges = ray.data.read_parquet(_G42_EDGES)
    seeds = set(
        pd.read_parquet(_G42_SEEDS)["url"]
    )  # seed list: crawl-config-sized
    depths = bfs_depths(edges, frozenset(seeds), max_depth=10**6)
    reach = depths[["page"]].copy()
    reach["host"] = reach["page"].str.extract(r"http://([^/]+)/")
    visited = set(pd.read_parquet(_VISITS_FIXTURE)["url"].unique())
    reach["vis"] = reach["page"].isin(visited).astype(np.int64)
    out = (
        reach.groupby("host", as_index=False)
        .agg(n_reachable=("page", "size"), n_visited=("vis", "sum"))
        .sort_values("host")
        .reset_index(drop=True)
    )
    out["coverage_ppm"] = [
        int(v) * PPM // int(n)
        for v, n in zip(out["n_visited"], out["n_reachable"])
    ]
    for c in ("n_reachable", "n_visited", "coverage_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Near-dup cluster-size histogram (q256)
# --------------------------------------------------------------------------

_CLUSTHIST_SQL = f"""
WITH RECURSIVE pairs AS (SELECT id_small AS a, id_big AS b
                         FROM ({_TENDER_SQL})),
und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(node, root) AS (
    SELECT a AS node, a AS root FROM (SELECT DISTINCT a FROM und)
    UNION
    SELECT u.b, r.root FROM reach r JOIN und u ON u.a = r.node
),
comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node),
sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz FROM comp GROUP BY 1)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY sz ORDER BY sz
"""


@query("q256_dup_cluster_sizes", sql=_CLUSTHIST_SQL)
def q256_dup_cluster_sizes(sf_dir: str):
    """Cluster-size histogram of the near-dup pair graph: how much of
    the duplication is pairwise (size 2) vs viral template families
    (large components) — THE shape that decides dedup policy (keep-one
    per cluster loses little on pairs, but a 50-doc component usually
    means boilerplate, not copies; cf. q39/q64).  Plan: pairs from the
    tender chain (result-sized), connected components via
    `dedup/clusters.py::dup_clusters` (numpy label propagation under
    the documented 5M-edge driver plan, distributed pointer-jumping
    above), histogram on the component-sized result.  Oracle: DuckDB's
    own recursive-CTE closure over ITS pair SQL — two independent CC
    implementations."""
    from texrex_ray.dedup.clusters import dup_clusters
    from texrex_ray.dedup.tender import count_pairs, gram_shingles, shingle_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    sh = gram_shingles(ds, n=5)
    pairs = count_pairs(shingle_pairs(sh, max_redundancy=200), pair_threshold=5)
    cl = dup_clusters(pairs, id_a="id_small", id_b="id_big")
    sizes = cl.groupby("cluster_id").size()
    hist = sizes.value_counts().sort_index()
    out = pd.DataFrame(
        {
            "cluster_size": hist.index.astype("int64"),
            "n_clusters": hist.to_numpy().astype("int64"),
        }
    )
    out["n_docs"] = (out["cluster_size"] * out["n_clusters"]).astype("int64")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# Per-source near-dup removal burden (q257)
# --------------------------------------------------------------------------

_BURDEN_SQL = f"""
WITH black AS (SELECT DISTINCT id_small FROM ({_TENDER_SQL}))
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN b.id_small IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN b.id_small IS NOT NULL THEN 1 ELSE 0 END)
            * {PPM} // count(*) AS BIGINT) AS removed_ppm
FROM documents d LEFT JOIN black b ON b.id_small = d.doc_id
GROUP BY d.source ORDER BY d.source
"""


@query("q257_dedup_burden", sql=_BURDEN_SQL)
def q257_dedup_burden(sf_dir: str):
    """Per-source near-dup removal burden: which sources pay the
    tender blacklist (q12's complement, attributed) — a source whose
    removed_ppm spikes is either syndicating content or being crawled
    twice under different hosts; the dashboard that routes dedup
    savings back to acquisition decisions.  Plan: blacklist is
    result-sized and broadcast (ray.put once); one vectorized isin
    pass over (doc_id, source), source-sized combine."""
    from texrex_ray.dedup.tender import (
        blacklist, count_pairs, gram_shingles, shingle_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    sh = gram_shingles(ds, n=5)
    pairs = count_pairs(shingle_pairs(sh, max_redundancy=200), pair_threshold=5)
    black_ref = ray.put(
        set(blacklist(pairs).to_pandas()["id_small"].unique().tolist())
    )

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        b = ray.get(black_ref)
        rem = np.array(
            [int(i) in b for i in t["doc_id"].to_pylist()], dtype=np.int64
        )
        df = pd.DataFrame(
            {"source": t["source"].to_pylist(), "n_docs": 1, "n_removed": rem}
        )
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_removed", alias_name="n_removed"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["removed_ppm"] = [
        int(r) * PPM // int(n) for r, n in zip(out["n_removed"], out["n_docs"])
    ]
    for c in ("n_docs", "n_removed", "removed_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Winnowing document fingerprints (q258)
# --------------------------------------------------------------------------

WIN_K = 4  # tokens per k-gram
WIN_W = 4  # winnowing window (grams); density -> 2/(w+1)
_WIN_HMOD = 2**32

_WINNOW_SQL = f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') t
              FROM documents),
grams AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                 md5_number_lower(array_to_string(
                     t[CAST(i AS INTEGER):CAST(i + {WIN_K - 1} AS INTEGER)],
                     ' ')) % {_WIN_HMOD} AS h
          FROM toks, unnest(range(1, len(t) - {WIN_K - 2})) AS u(i)),
w AS (SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN {WIN_W - 1} PRECEDING AND CURRENT ROW)
                 AS mn,
             COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN {WIN_W - 1} PRECEDING
                            AND CURRENT ROW) AS nfull
      FROM grams),
sel AS (SELECT DISTINCT w.doc_id,
               (SELECT MAX(g2.i) FROM grams g2
                WHERE g2.doc_id = w.doc_id
                  AND g2.i BETWEEN w.i - {WIN_W - 1} AND w.i
                  AND g2.h = w.mn) AS pos
        FROM w WHERE w.nfull = {WIN_W}),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM sel GROUP BY 1),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
       FROM grams GROUP BY 1)
SELECT sz.doc_id, sz.n_grams, COALESCE(per.n_fp, 0) AS n_fp,
       CAST(COALESCE(per.n_fp, 0) * {PPM} // sz.n_grams AS BIGINT)
           AS density_ppm
FROM sz LEFT JOIN per ON per.doc_id = sz.doc_id ORDER BY sz.doc_id
"""


@query("q258_winnowing", sql=_WINNOW_SQL)
def q258_winnowing(sf_dir: str):
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm): hash every {WIN_K}-token gram, slide a
    {WIN_W}-gram window, keep the window minimum (RIGHTMOST position
    on ties), dedup selected positions — the guaranteed-coverage
    fingerprint set whose density converges to 2/(w+1), the
    local-document complement of global minhash (q13): any shared
    substring of >= w+k-1 tokens is guaranteed to share a fingerprint.
    Per doc: gram count, fingerprints kept, density PPM.  Plan:
    per-doc work is embarrassingly parallel (one vectorized
    sliding-window argmin per doc inside map_batches — no exchange at
    all until the doc-sized result)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(t: pa.Table) -> pa.Table:
        dids, n_grams, n_fps = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _TOKEN_RE.findall((txt or "").lower())
            grams = [
                " ".join(toks[i:i + WIN_K])
                for i in range(len(toks) - WIN_K + 1)
            ]
            if not grams:
                continue
            h = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(g.encode()).digest()[8:], "little"
                    ) % _WIN_HMOD
                    for g in grams
                ],
                dtype=np.int64,
            )
            if len(h) >= WIN_W:
                win = np.lib.stride_tricks.sliding_window_view(h, WIN_W)
                rev = win[:, ::-1]
                arg = np.argmin(rev, axis=1)  # rightmost min of the window
                pos = np.arange(len(h) - WIN_W + 1) + (WIN_W - 1 - arg)
                n_fp = len(np.unique(pos))
            else:
                n_fp = 0
            dids.append(int(did))
            n_grams.append(len(grams))
            n_fps.append(n_fp)
        g = np.array(n_grams, dtype=np.int64)
        f = np.array(n_fps, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "n_grams": pa.array(g),
                "n_fp": pa.array(f),
                "density_ppm": pa.array(f * PPM // g),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# Payload integrity: magic-byte sniff vs declared format (q259)
# --------------------------------------------------------------------------

_MAGIC_HEX = {"png": b"SPNG".hex().upper(), "jpeg": b"SJPG".hex().upper(),
              "webp": b"SWEB".hex().upper()}
_SNIFF_CASES = " ".join(
    f"WHEN left(hex(bytes), 8) = '{hx}' THEN '{fmt}'"
    for fmt, hx in _MAGIC_HEX.items()
)

_SNIFF_SQL = f"""
WITH s AS (SELECT fmt AS declared,
                  CASE {_SNIFF_CASES} ELSE 'unknown' END AS sniffed,
                  CASE WHEN octet_length(bytes)
                            = 12 + CAST(w AS BIGINT) * h * 3
                       THEN 1 ELSE 0 END AS len_ok
           FROM read_parquet('{_IMGDIR}/images.parquet'))
SELECT declared, sniffed, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(len_ok) AS BIGINT) AS n_len_ok
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q259_payload_integrity", sql=_SNIFF_SQL)
def q259_payload_integrity(sf_dir: str):
    """Payload integrity audit: sniff every image's container from its
    magic bytes and cross-tab against the DECLARED format column, plus
    an exact container-length check (12-byte header + w*h*3) — the
    intake gate that catches truncated fetches, mislabeled rows, and
    corrupt shards BEFORE a decode actor crashes on them mid-pipeline.
    A healthy harvest reads as a pure diagonal with n_len_ok ==
    n_images; any off-diagonal row is a quarantine list.  Plan:
    4-byte prefix + length arithmetic per batch (the payload is read
    but only its first bytes are touched; nothing shuffles but the
    3x3 count table)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.images import MAGIC
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["fmt", "bytes", "w", "h"])
    rev = {v: k for k, v in MAGIC.items()}

    def partial(t: pa.Table) -> pa.Table:
        declared = t["fmt"].to_pylist()
        w = t["w"].cast(pa.int64()).to_numpy()
        h = t["h"].cast(pa.int64()).to_numpy()
        sniffed, len_ok = [], []
        for i, b in enumerate(t["bytes"].to_pylist()):
            sniffed.append(rev.get(b[:4], "unknown"))
            len_ok.append(int(len(b) == 12 + int(w[i]) * int(h[i]) * 3))
        df = pd.DataFrame(
            {
                "declared": declared,
                "sniffed": sniffed,
                "n_images": 1,
                "n_len_ok": len_ok,
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["declared", "sniffed"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["declared", "sniffed"])
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_len_ok", alias_name="n_len_ok"),
        )
        .to_pandas()
        .sort_values(["declared", "sniffed"])
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_len_ok"):
        out[c] = out[c].astype("int64")
    return out[["declared", "sniffed", "n_images", "n_len_ok"]]


# --------------------------------------------------------------------------
# pHash bit-balance audit (q260)
# --------------------------------------------------------------------------

_BITBAL_SQL = f"""
WITH b AS (SELECT CAST(u.b AS BIGINT) AS bit,
                  (phash >> CAST(u.b AS INTEGER)) & 1 AS v
           FROM read_parquet('{_IMGDIR}/images.parquet'),
                unnest(range(0, 64)) AS u(b))
SELECT bit, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(v) AS BIGINT) AS n_ones,
       CAST(abs(2 * SUM(v) - count(*)) * {PPM} // count(*) AS BIGINT)
           AS bias_ppm
FROM b GROUP BY bit ORDER BY bit
"""


@query("q260_phash_bit_balance", sql=_BITBAL_SQL)
def q260_phash_bit_balance(sf_dir: str):
    """pHash bit-balance audit: for each of the 64 hash bits, how far
    its ones-rate sits from 50% (bias_ppm = |2*ones - n| * PPM // n).
    A biased bit carries less than one bit of information, so every
    Hamming-LSH band that includes it loses selectivity — this table
    is what you read before choosing q72's band layout, and a bit
    pinned near 0/PPM means the phash kernel is broken for this
    corpus.  Plan: 64 shift-and-mask partial sums per batch (no
    unpackbits, no row explosion on the Ray side), one 64-row
    combine."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["phash"])

    def partial(t: pa.Table) -> pa.Table:
        ph = t["phash"].cast(pa.int64()).to_numpy().astype(np.uint64)
        ones = np.array(
            [int(((ph >> np.uint64(b)) & np.uint64(1)).sum())
             for b in range(64)],
            dtype=np.int64,
        )
        return pa.table(
            {
                "bit": pa.array(np.arange(64, dtype=np.int64)),
                "n_images": pa.array(
                    np.full(64, len(ph), dtype=np.int64)
                ),
                "n_ones": pa.array(ones),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_ones", alias_name="n_ones"),
        )
        .to_pandas()
        .sort_values("bit")
        .reset_index(drop=True)
    )
    out["bias_ppm"] = [
        abs(2 * int(o) - int(n)) * PPM // int(n)
        for o, n in zip(out["n_ones"], out["n_images"])
    ]
    for c in ("bit", "n_images", "n_ones", "bias_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Declarative data-quality rule suite (q261)
# --------------------------------------------------------------------------

_DQ_SQL = """
SELECT 'lineitem_orphan_order' AS rule,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'orders_orphan_customer',
       CAST(count(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'discount_range',
       CAST(count(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'quantity_positive',
       CAST(count(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'doc_chars_match',
       CAST(count(*) AS BIGINT),
       CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
            AS BIGINT)
FROM documents
ORDER BY rule
"""


@query("q261_data_quality", sql=_DQ_SQL)
def q261_data_quality(sf_dir: str):
    """Declarative data-quality rule suite in one pass per table:
    referential integrity (every lineitem names a real order, every
    order a real customer — broadcast key-set membership, the orphan
    detector a 100-TB ingest runs before ANY join is trusted), value
    ranges (discount, quantity), and derived-column consistency
    (n_chars == length(text)).  Output: (rule, n_checked,
    n_violations) — a healthy feed is all zeros, and any nonzero row
    is a quarantine predicate.  Plan: dimension key sets ship once via
    ray.put; every rule is a vectorized per-batch count partial;
    nothing but the 5-row rule table ever shuffles."""
    orders_keys = set(
        _read(sf_dir, "orders", ["o_orderkey"]).to_pandas()["o_orderkey"]
    )
    cust_keys = set(
        _read(sf_dir, "customer", ["c_custkey"]).to_pandas()["c_custkey"]
    )
    ok_ref = ray.put(orders_keys)
    ck_ref = ray.put(cust_keys)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_discount", "l_quantity"])

    def li_rules(df: pd.DataFrame) -> pd.DataFrame:
        ok = ray.get(ok_ref)
        orphan = (~df["l_orderkey"].isin(ok)).sum()
        disc = ((df["l_discount"] < 0) | (df["l_discount"] > 0.1)).sum()
        qty = (df["l_quantity"] <= 0).sum()
        n = len(df)
        return pd.DataFrame(
            {
                "rule": ["lineitem_orphan_order", "discount_range",
                         "quantity_positive"],
                "n_checked": [n, n, n],
                "n_violations": [int(orphan), int(disc), int(qty)],
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def o_rules(df: pd.DataFrame) -> pd.DataFrame:
        ck = ray.get(ck_ref)
        orphan = (~df["o_custkey"].isin(ck)).sum()
        return pd.DataFrame(
            {
                "rule": ["orders_orphan_customer"],
                "n_checked": [len(df)],
                "n_violations": [int(orphan)],
            }
        )

    docs = _read(sf_dir, "documents", ["text", "n_chars"])

    def d_rules(df: pd.DataFrame) -> pd.DataFrame:
        bad = (df["text"].str.len() != df["n_chars"]).sum()
        return pd.DataFrame(
            {
                "rule": ["doc_chars_match"],
                "n_checked": [len(df)],
                "n_violations": [int(bad)],
            }
        )

    parts = (
        li.map_batches(li_rules, batch_format="pandas")
        .union(orders.map_batches(o_rules, batch_format="pandas"))
        .union(docs.map_batches(d_rules, batch_format="pandas"))
    )
    out = (
        parts.groupby("rule")
        .aggregate(
            Sum("n_checked", alias_name="n_checked"),
            Sum("n_violations", alias_name="n_violations"),
        )
        .to_pandas()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    for c in ("n_checked", "n_violations"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters with exact verification (q262)
# --------------------------------------------------------------------------

MG_K = 767  # counters per summary; guarantee: freq > n/(MG_K+1) survives

_HH_SQL = f"""
WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z]+') t
              FROM documents),
bg AS (SELECT t[CAST(i AS INTEGER)] || ' ' || t[CAST(i + 1 AS INTEGER)]
           AS bigram
       FROM toks, unnest(range(1, len(t))) AS u(i)),
tot AS (SELECT count(*) AS n FROM bg),
c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1)
SELECT bigram, CAST(cnt AS BIGINT) AS n_count,
       CAST(cnt * {PPM} // (SELECT n FROM tot) AS BIGINT) AS share_ppm
FROM c WHERE cnt * {MG_K + 1} > (SELECT n FROM tot)
ORDER BY bigram
"""


@query("q262_misra_gries", sql=_HH_SQL)
def q262_misra_gries(sf_dir: str):
    """Streaming heavy hitters over token bigrams via the Misra-Gries
    summary (k={MG_K} counters): every batch keeps at most k weighted
    candidates (decrement-by-(k+1)-th-largest prune), so the exchange
    is k-bounded per block no matter how large the vocabulary — the
    sketch a 100-TB vocabulary pass runs INSTEAD of a full groupby
    (the deterministic-counter complement of q56's count-min sketch:
    MG gives k-bounded memory and a frequency LOWER bound, CMS gives
    fixed memory and an UPPER bound).
    Superset guarantee: any bigram with global share > 1/(k+1) beats
    that share in at least one batch (pigeonhole), so the candidate
    union covers all true heavy hitters; an exact second pass counts
    only candidates (broadcast set) and the threshold filter makes the
    output deterministic and merge-order-independent.  Output:
    (bigram, n_count, share_ppm) for bigrams with cnt*(k+1) > n."""
    ds = _read(sf_dir, "documents", ["text"])

    def mg_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        n_total = 0
        for txt in t["text"].to_pylist():
            ws = re.findall(r"[a-z]+", txt.lower())
            n_total += max(len(ws) - 1, 0)
            c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        if len(c) > MG_K:
            cut = sorted(c.values(), reverse=True)[MG_K]
            c = Counter({k: v - cut for k, v in c.items() if v > cut})
        keys = sorted(c)
        return pa.table(
            {
                "bigram": pa.array(keys + ["\x00TOTAL"]),
                "weight": pa.array(
                    [c[k] for k in keys] + [n_total], type=pa.int64()
                ),
            }
        )

    partials = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("weight", alias_name="weight"))
        .to_pandas()
    )
    n_total = int(partials.loc[partials["bigram"] == "\x00TOTAL", "weight"].iloc[0])
    cands = set(partials.loc[partials["bigram"] != "\x00TOTAL", "bigram"])
    cand_ref = ray.put(cands)

    def exact_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        cs = ray.get(cand_ref)
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            ws = re.findall(r"[a-z]+", txt.lower())
            for a, b in zip(ws, ws[1:]):
                g = f"{a} {b}"
                if g in cs:
                    c[g] += 1
        keys = sorted(c)
        return pa.table(
            {
                "bigram": pa.array(keys),
                "n_count": pa.array([c[k] for k in keys], type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n_count", alias_name="n_count"))
        .to_pandas()
    )
    out = out[out["n_count"] * (MG_K + 1) > n_total].copy()
    out["share_ppm"] = [int(v) * PPM // n_total for v in out["n_count"]]
    out = out.sort_values("bigram").reset_index(drop=True)
    for c in ("n_count", "share_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# ROLLUP hierarchical aggregate from one leaf pass (q263)
# --------------------------------------------------------------------------

_ROLLUP_SQL = """
WITH base AS (
  SELECT r.r_name, n.n_name,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey)
SELECT COALESCE(r_name, '*ALL*') AS r_name,
       COALESCE(n_name, '*ALL*') AS n_name,
       CAST(SUM(cents) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM base GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name, n_name
"""


@query("q263_rollup_revenue", sql=_ROLLUP_SQL)
def q263_rollup_revenue(sf_dir: str):
    """ROLLUP hierarchy (region -> nation -> grand total) computed
    from ONE leaf aggregate: orders scan emits per-batch partial sums
    keyed by nationkey (dimension chain customer->nation->region ships
    once via ray.put — at warehouse scale the customer map becomes a
    shuffle join, the nation/region maps stay broadcast), the combine
    is nation-sized (~25 rows), and the region subtotals + grand total
    are derived from the leaf rows driver-side with exact integer
    sums — never a second scan per level, which is what GROUP BY
    ROLLUP costs when executed naively (q105 solves the same shape by
    emitting 3x partial rows per batch; deriving from the leaf works
    whenever every rollup level is a function of the leaf key).  Per-row
    cents are exact
    (prices are 2-decimal; *100 never lands on a .5 tie)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cust_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"].astype(int)))
    map_ref = ray.put(cust_nat)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        g = pd.DataFrame(
            {
                "nationkey": df["o_custkey"].map(m).astype("int64"),
                "cents": np.rint(df["o_totalprice"].to_numpy() * 100).astype(
                    "int64"
                ),
                "n_orders": 1,
            }
        )
        return g.groupby("nationkey", as_index=False).sum()

    leaf = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(
            Sum("cents", alias_name="revenue_c"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    names = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    leaf = leaf.merge(
        names[["n_nationkey", "n_name", "r_name"]],
        left_on="nationkey",
        right_on="n_nationkey",
    )[["r_name", "n_name", "revenue_c", "n_orders"]]
    by_reg = leaf.groupby("r_name", as_index=False)[["revenue_c", "n_orders"]].sum()
    by_reg["n_name"] = "*ALL*"
    total = pd.DataFrame(
        {
            "r_name": ["*ALL*"],
            "n_name": ["*ALL*"],
            "revenue_c": [leaf["revenue_c"].sum()],
            "n_orders": [leaf["n_orders"].sum()],
        }
    )
    out = (
        pd.concat([leaf, by_reg, total], ignore_index=True)[
            ["r_name", "n_name", "revenue_c", "n_orders"]
        ]
        .sort_values(["r_name", "n_name"])
        .reset_index(drop=True)
    )
    for c in ("revenue_c", "n_orders"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Ordered funnel conversion (q264)
# --------------------------------------------------------------------------

_FUNNEL_SQL = f"""
WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after,
       CAST((SELECT count(*) FROM c) * {PPM}
            // (SELECT count(*) FROM v) AS BIGINT) AS click_ppm,
       CAST((SELECT count(*) FROM p) * {PPM}
            // (SELECT count(*) FROM c) AS BIGINT) AS purchase_ppm
"""


@query("q264_funnel_ordered", sql=_FUNNEL_SQL)
def q264_funnel_ordered(sf_dir: str):
    """Strict-order funnel (view -> click -> purchase): a user
    converts a stage only with an event strictly AFTER their previous
    stage's first qualifying event — strictly stronger than q75's
    existence-of-ordered-pair funnel (min/max extrema can't express a
    3-stage strict order).  Plan: three
    filtered min-aggregate passes, each exchange is user-dimension
    sized; between passes the (user -> frontier-ts) map ships once via
    ray.put and the next filter is a vectorized per-batch compare.  At
    warehouse scale the broadcast map becomes a shuffle join on
    user_id; the pass structure (one per funnel stage) is unchanged."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def stage_min(prev_ref, etype: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            us = df["user_id"].to_numpy()
            ts = df["ts"].astype("int64").to_numpy()
            mask = (df["event_type"] == etype).to_numpy()
            if prev_ref is not None:
                prev = ray.get(prev_ref)
                gate = np.array(
                    [prev.get(int(u), None) for u in us], dtype=object
                )
                ok = np.array(
                    [g is not None and t > g for g, t in zip(gate, ts)]
                )
                mask &= ok
            sub = pd.DataFrame({"user_id": us[mask], "t": ts[mask]})
            if not len(sub):
                return pd.DataFrame({"user_id": [], "t": []}).astype(
                    {"user_id": "int64", "t": "int64"}
                )
            return sub.groupby("user_id", as_index=False).min()

        return fn

    def collect(stage_ds) -> dict[int, int]:
        df = (
            stage_ds.groupby("user_id")
            .aggregate(Min("t", alias_name="t"))
            .to_pandas()
        )
        return dict(zip(df["user_id"].astype(int), df["t"].astype(int)))

    t1 = collect(ev.map_batches(stage_min(None, "view"), batch_format="pandas"))
    t1_ref = ray.put(t1)
    t2 = collect(ev.map_batches(stage_min(t1_ref, "click"), batch_format="pandas"))
    t2_ref = ray.put(t2)
    t3 = collect(
        ev.map_batches(stage_min(t2_ref, "purchase"), batch_format="pandas")
    )
    n_users = len(ev.select_columns(["user_id"]).unique("user_id"))
    nv, nc, npp = len(t1), len(t2), len(t3)
    return pd.DataFrame(
        {
            "n_users": [n_users],
            "n_view": [nv],
            "n_click_after": [nc],
            "n_purchase_after": [npp],
            "click_ppm": [nc * PPM // nv],
            "purchase_ppm": [npp * PPM // nc],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Blur (variance-of-Laplacian) audit over the image table (q265)
# --------------------------------------------------------------------------

BLUR_MILLI = 2_400_000  # variance-of-Laplacian floor (milli-units)

_BLUR_SQL = f"""
WITH s AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/sharpness_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(CASE WHEN var_milli < {BLUR_MILLI} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blurry,
       CAST(MIN(var_milli) AS BIGINT) AS min_var_milli,
       CAST(MAX(var_milli) AS BIGINT) AS max_var_milli,
       CAST(SUM(var_milli) AS BIGINT) AS sum_var_milli
FROM s GROUP BY fmt ORDER BY fmt
"""


@query("q265_blur_audit", sql=_BLUR_SQL)
def q265_blur_audit(sf_dir: str):
    """Blur detection via variance of the Laplacian — the standard
    sharpness gate an image-caption curation pass runs before spending
    caption/embedding compute on unusable pixels (complement of q223's
    exposure audit: exposure finds bad LEVELS, Laplacian variance finds
    missing EDGES).  Integer-exact: channel-sum luminance, 4-neighbor
    Laplacian on interior pixels, population variance scaled x1000
    (stages/images.py::SharpnessAudit).  Per fmt: image count, blurry
    count (< {BLUR_MILLI} milli), min/max/sum variance.  Plan:
    actor-pool decode+variance, pixels never leave the task, fmt-sized
    combine.  Oracle: committed fixture from the INDEPENDENT per-pixel
    scalar loop."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import SharpnessAudit

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        SharpnessAudit, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "sharp_var_milli"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["sharp_var_milli"]
        out = pd.DataFrame(
            {
                "n_images": g.size(),
                "n_blurry": g.apply(lambda s: int((s < BLUR_MILLI).sum())),
                "min_var_milli": g.min(),
                "max_var_milli": g.max(),
                "sum_var_milli": g.sum(),
            }
        ).reset_index()
        return out

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_blurry", alias_name="n_blurry"),
            Min("min_var_milli", alias_name="min_var_milli"),
            Max("max_var_milli", alias_name="max_var_milli"),
            Sum("sum_var_milli", alias_name="sum_var_milli"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_blurry", "min_var_milli", "max_var_milli",
              "sum_var_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# k-truss ladder of the crawl link graph (q266)
# --------------------------------------------------------------------------

@query(
    "q266_ktruss",
    sql="SELECT k, n_edges FROM read_parquet("
    "'/root/repo/tests/fixtures/oracle/ktruss_sf0.01.parquet') ORDER BY k",
)
def q266_ktruss(sf_dir: str):
    """k-truss ladder (Cohen 2008) of the undirected crawl link graph:
    for each k, edges whose every survivor closes >= k-2 triangles —
    the triangle-support community core between q109's triangle counts
    and q119's degree cores (a k-truss needs CLOSURE, so link farms
    that inflate degree without mutual linking fall out of it).
    Broadcast-CSR peeling rounds with vectorized per-edge neighbor
    intersections; the documented >10^9-edge swap is hash-partitioned
    wedge enumeration (ops/graph.py::ktruss_sizes).  Fixture twin: the
    INDEPENDENT stack-driven incremental peel (ktruss_sequential)."""
    from texrex_ray.ops.graph import ktruss_sizes

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    out = ktruss_sizes(edges, expected_edges=edges.count())
    return out


# --------------------------------------------------------------------------
# Distributed Lloyd k-means over embeddings (q267)
# --------------------------------------------------------------------------

KM_K = 8
KM_ITERS = 5


@query(
    "q267_kmeans",
    sql="SELECT cluster, n_members, inertia FROM read_parquet("
    "'/root/repo/tests/fixtures/oracle/kmeans_sf0.01.parquet') "
    "ORDER BY cluster",
)
def q267_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (k={KM_K}, {KM_ITERS} iterations) over
    the embedding table in fixed-point int64 (round(x*1000)) so every
    step — assignment argmin (ties to the lowest cluster), centroid
    update (elementwise floor-div of exact partial sums, empty cluster
    keeps its centroid), final inertia — is engine-invariant.  The
    clustering pass behind semantic dedup shard maps (q106) and IVF
    coarse quantizers (q36): q69 aggregates centroids for GIVEN labels,
    this LEARNS them.  Plan: quantized vectors materialize once;
    each iteration broadcasts the K x d centroid matrix and runs ONE
    map_batches pass emitting (cluster, dim) partial sums — the
    exchange is K x d rows per block, never vectors; the driver pivots
    a K x d table.  Oracle: committed fixture from the INDEPENDENT
    per-row serial trainer."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quantize(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // len(t)
        q = np.floor(flat.astype(np.float64).reshape(len(t), d) * 1e3 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    qds = ds.map_batches(quantize, batch_format="pyarrow").materialize()
    init = (
        qds.sort("vec_id").limit(KM_K).to_pandas()
    )
    cents = np.stack([np.asarray(v, dtype=np.int64) for v in init["q"]])
    d = cents.shape[1]

    def _unpack_fixed_lists(col, n_rows: int) -> np.ndarray:
        """Zero-copy (n, d) int64 view of a fixed-width list column."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        return flat.reshape(n_rows, len(flat) // n_rows)

    def assign(q: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # argmin over ||q-c||²; dropping the q² term preserves ties
        scores = -2 * (q @ c.T) + (c * c).sum(axis=1)[None, :]
        a = np.argmin(scores, axis=1)  # first occurrence = lowest cluster
        diff = q - c[a]
        return a, (diff * diff).sum(axis=1)

    for _ in range(KM_ITERS):
        c_ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            q = _unpack_fixed_lists(t["q"], len(t))
            a, _ = assign(q, c)
            g = pd.DataFrame(q).groupby(a).sum()
            cnt = pd.Series(a).value_counts().sort_index()
            return pa.table(
                {
                    "cluster": pa.array(
                        np.repeat(g.index.to_numpy().astype(np.int64), d)
                    ),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(g))),
                    "pn": pa.array(
                        np.repeat(cnt.to_numpy().astype(np.int64), d)
                    ),
                    "ps": pa.array(g.to_numpy().reshape(-1)),
                }
            )

        agg = (
            qds.map_batches(partial, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
            .to_pandas()
        )
        new = cents.copy()
        for j, sub in agg.groupby("cluster"):
            sub = sub.sort_values("dim")
            n = int(sub["n"].iloc[0])
            if n:
                new[int(j)] = sub["s"].to_numpy() // n
        cents = new

    c_ref = ray.put(cents)

    def final_partial(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        q = _unpack_fixed_lists(t["q"], len(t))
        a, d2 = assign(q, c)
        df = pd.DataFrame({"cluster": a, "pn": 1, "pi": d2})
        return pa.Table.from_pandas(
            df.groupby("cluster", as_index=False).sum(), preserve_index=False
        )

    out = (
        qds.map_batches(final_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Sum("pn", alias_name="n_members"), Sum("pi", alias_name="inertia")
        )
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    for c in ("cluster", "n_members", "inertia"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# LRU reuse-distance histogram, SHARDS-sampled (q268)
# --------------------------------------------------------------------------

SHARDS_MOD = 4  # keep keys with md5 % SHARDS_MOD == 0 (rate 1/4)

_REUSE_SQL = f"""
WITH s AS (SELECT event_id, user_id,
                  row_number() OVER (ORDER BY ts, event_id) AS pos
           FROM events
           WHERE md5_number_lower(CAST(user_id AS VARCHAR))
                 % {SHARDS_MOD} = 0),
w AS (SELECT pos, user_id,
             lag(pos) OVER (PARTITION BY user_id ORDER BY pos) AS ppos
      FROM s),
d AS (SELECT CASE WHEN ppos IS NULL THEN -1
             ELSE (SELECT COUNT(DISTINCT s2.user_id) FROM s s2
                   WHERE s2.pos > w.ppos AND s2.pos < w.pos) END AS dist
      FROM w)
SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_accesses
FROM d GROUP BY dist ORDER BY dist
"""


@query("q268_reuse_distance", sql=_REUSE_SQL)
def q268_reuse_distance(sf_dir: str):
    """LRU reuse-distance (Mattson stack-distance) histogram of the
    user-access stream, SHARDS-sampled (Waldspurger et al. 2015):
    hash-sample the KEYS at rate 1/{SHARDS_MOD}, replay only the
    sampled substream, and the exact distances on it estimate the full
    miss-ratio curve at distance x {SHARDS_MOD} — the cache-sizing
    curve for the crawl's document/robots caches, computed at constant
    memory no matter the stream length.  dist = distinct keys between
    consecutive accesses of the same key (hit in an LRU of size C iff
    dist < C; -1 = cold first access).  Plan: the hash filter and the
    (ts, event_id) sort are distributed; the replay is a single
    move-to-front scan over the SAMPLE-sized substream on the driver —
    at 100 TB you lower the rate, never the memory.  Output:
    (dist, n_accesses)."""
    import hashlib

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        uniq = df["user_id"].unique()
        ok = {
            int(u)
            for u in uniq
            if int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:], "little")
            % SHARDS_MOD
            == 0
        }
        return df[df["user_id"].isin(ok)]

    sub = (
        ev.map_batches(keep, batch_format="pandas")
        .sort(["ts", "event_id"])
        .to_pandas()
    )
    stack: list[int] = []  # most-recent-first
    from collections import Counter

    hist: Counter = Counter()
    for u in sub["user_id"].astype(int):
        try:
            i = stack.index(u)
        except ValueError:
            hist[-1] += 1
            stack.insert(0, u)
            continue
        hist[i] += 1
        stack.pop(i)
        stack.insert(0, u)
    ds = sorted(hist)
    return pd.DataFrame(
        {"dist": ds, "n_accesses": [hist[d] for d in ds]}
    ).astype("int64")


# --------------------------------------------------------------------------
# Per-image connected-component (blob) count (q269)
# --------------------------------------------------------------------------

_BLOB_SQL = """
WITH b AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/blob_counts_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(n_blobs) AS BIGINT) AS sum_blobs,
       CAST(MIN(n_blobs) AS BIGINT) AS min_blobs,
       CAST(MAX(n_blobs) AS BIGINT) AS max_blobs
FROM b GROUP BY fmt ORDER BY fmt
"""


@query("q269_blob_count", sql=_BLOB_SQL)
def q269_blob_count(sf_dir: str):
    """4-connected foreground component count per image (object-count
    proxy): flat graphics label as a handful of blobs, busy photographs
    as thousands — the structure-complexity gate that pairs with q265's
    edge-energy gate in an image-curation chain.  Vectorized min-label
    relaxation inside the decode actor (stages/images.py::BlobCount);
    only the scalar count leaves the task.  Per fmt: image count and
    sum/min/max blobs.  Oracle: committed fixture from the INDEPENDENT
    scalar BFS flood fill."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import BlobCount

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        BlobCount, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_blobs"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["n_blobs"]
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_blobs": g.sum(),
                "min_blobs": g.min(),
                "max_blobs": g.max(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_blobs", alias_name="sum_blobs"),
            Min("min_blobs", alias_name="min_blobs"),
            Max("max_blobs", alias_name="max_blobs"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_blobs", "min_blobs", "max_blobs"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Grouped isotonic regression via PAVA (q270)
# --------------------------------------------------------------------------

@query(
    "q270_isotonic",
    sql="SELECT l_returnflag, qty, n_items, fitted_mc FROM read_parquet("
    "'/root/repo/tests/fixtures/oracle/isotonic_sf0.01.parquet') "
    "ORDER BY l_returnflag, qty",
)
def q270_isotonic(sf_dir: str):
    """Per-group isotonic regression (pool-adjacent-violators) of mean
    line price vs quantity — the monotone calibration fit used to turn
    a raw heuristic score into a trustworthy ranking signal (here:
    price should rise with quantity; pooled levels expose where the
    fixture violates it).  Integer-exact throughout: pooling compares
    rational means by cross-multiplication in Python ints, the fitted
    level is emitted as milli-cents floor-div.  Plan: ONE distributed
    (group, qty) aggregate (quantity-domain-sized exchange), then PAVA
    inside ``map_groups`` per group — each group is domain-sized (~50
    rows), so the sequential pool scan is result-sized work.  Oracle:
    committed fixture from the INDEPENDENT stack-based serial PAVA."""
    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "qty": np.rint(df["l_quantity"].to_numpy()).astype("int64"),
                "cents": np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
                    "int64"
                ),
                "n_items": 1,
            }
        )
        return g.groupby(["l_returnflag", "qty"], as_index=False).sum()

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "qty"])
        .aggregate(
            Sum("cents", alias_name="cents"), Sum("n_items", alias_name="n_items")
        )
    )

    def pava(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("qty").reset_index(drop=True)
        # pools as [qty_list, s, n]; merge while mean decreases
        pools: list[list] = []
        for _, r in g.iterrows():
            pools.append([[int(r["qty"])], int(r["cents"]), int(r["n_items"])])
            while len(pools) > 1 and (
                pools[-2][1] * pools[-1][2] > pools[-1][1] * pools[-2][2]
            ):
                q2, s2, n2 = pools.pop()
                pools[-1][0].extend(q2)
                pools[-1][1] += s2
                pools[-1][2] += n2
        rows = []
        flag = g["l_returnflag"].iloc[0]
        per_q = dict(zip(g["qty"].astype(int), g["n_items"].astype(int)))
        for qs, s, n in pools:
            fit = s * 1000 // n
            for qv in qs:
                rows.append((flag, qv, per_q[qv], fit))
        return pd.DataFrame(
            rows, columns=["l_returnflag", "qty", "n_items", "fitted_mc"]
        )

    out = (
        agg.groupby("l_returnflag")
        .map_groups(pava, batch_format="pandas")
        .to_pandas()
        .sort_values(["l_returnflag", "qty"])
        .reset_index(drop=True)
    )
    for c in ("qty", "n_items", "fitted_mc"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Apriori frequent part-pairs (q271)
# --------------------------------------------------------------------------

ITEMSET_MINSUP = 3

_ITEMSET_SQL = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(count(*) AS BIGINT) AS support
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= {ITEMSET_MINSUP}
ORDER BY support DESC, p1, p2
"""


@query("q271_itemset_pairs", sql=_ITEMSET_SQL)
def q271_itemset_pairs(sf_dir: str):
    """Market-basket frequent pairs with the Apriori candidate prune
    (Agrawal & Srikant 1994): parts co-ordered in >= MINSUP orders.
    Plan: (1) L1 pass — distinct-order count per part via ONE part-keyed
    bucketed exchange, frequent-part set broadcast to every task (at
    100 TB this set is vocabulary-sized, the whole point of the prune);
    (2) baskets co-locate by ONE order-keyed bucketed exchange, pairs
    generated per order by a vectorized self-merge among frequent parts
    only; (3) pair supports summed by a pair-keyed bucketed exchange —
    never a per-group Python reduce over ~1e5 pair groups.  Output:
    (p1, p2, support)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_rows = li.count()

    # L1: parts present in >= MINSUP distinct orders
    def part_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby("l_partkey", as_index=False).size()
        return g.rename(columns={"size": "n_orders"})

    l1 = bucketed_groupby(
        li, ["l_partkey"], part_orders, expected_rows=n_rows
    ).to_pandas()
    freq = set(l1.loc[l1["n_orders"] >= ITEMSET_MINSUP, "l_partkey"].astype(int))

    filt = li.map_batches(
        lambda df: df[df["l_partkey"].isin(freq)], batch_format="pandas"
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = (
            m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False)
            .size()
            .rename(columns={"l_partkey_x": "p1", "l_partkey_y": "p2",
                             "size": "support"})
        )
        return g

    partial = bucketed_groupby(filt, ["l_orderkey"], pairs, expected_rows=n_rows)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p1", "p2"], as_index=False)["support"].sum()
        return g[g["support"] >= ITEMSET_MINSUP]

    out = (
        bucketed_groupby(partial, ["p1", "p2"], total, expected_rows=n_rows)
        .to_pandas()
        .sort_values(["support", "p1", "p2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    for c in ("p1", "p2", "support"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Binary box-split palette quantization (q272)
# --------------------------------------------------------------------------

_PALETTE_SQL = """
WITH p AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/palette_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(n_boxes) AS BIGINT) AS sum_boxes,
       CAST(SUM(quant_err) AS BIGINT) AS sum_err,
       CAST(MAX(quant_err) AS BIGINT) AS max_err
FROM p GROUP BY fmt ORDER BY fmt
"""


@query("q272_palette_quant", sql=_PALETTE_SQL)
def q272_palette_quant(sf_dir: str):
    """K=8 palette quantization error per image via the deterministic
    midpoint box-split (stages/images.py::PaletteQuant) — synthetic
    graphics quantize to near-zero error, photographs don't; the
    compressibility gate of an image-curation chain.  Pixels never
    leave the decode task; only two scalars per image shuffle.  Per
    fmt: image count, sum of boxes, sum/max quantization error.
    Oracle: committed fixture from the INDEPENDENT recursive splitter."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import PaletteQuant

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        PaletteQuant, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "n_boxes", "quant_err"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_boxes": g["n_boxes"].sum(),
                "sum_err": g["quant_err"].sum(),
                "max_err": g["quant_err"].max(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_boxes", alias_name="sum_boxes"),
            Sum("sum_err", alias_name="sum_err"),
            Max("max_err", alias_name="max_err"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_boxes", "sum_err", "max_err"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Huffman storage-bound audit (q273)
# --------------------------------------------------------------------------

@query(
    "q273_huffman_bits",
    sql="SELECT lang, n_bytes, n_symbols, huff_bits, saved_ppm "
    "FROM read_parquet("
    "'/root/repo/tests/fixtures/oracle/huffman_sf0.01.parquet') "
    "ORDER BY lang",
)
def q273_huffman_bits(sf_dir: str):
    """Optimal byte-level Huffman storage bound per language: what an
    entropy coder would save over raw UTF-8 — the storage-planning
    audit for a corpus tier (cold text shards compress ~2x; this
    computes the per-language bound exactly).  Plan: per-batch byte
    histograms via ONE np.bincount over the concatenated batch bytes
    (lang x 256 partial rows — the only exchange), then the 256-leaf
    Huffman build on the driver.  Total weighted code length is the
    UNIQUE optimal cost, so any correct Huffman implementation agrees —
    the fixture oracle uses the two-queue method, this one a heap.
    Output: (lang, n_bytes, n_symbols, huff_bits, saved_ppm)."""
    import heapq

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in df.groupby("lang"):
            buf = np.frombuffer(
                "".join(sub["text"].tolist()).encode("utf-8"), dtype=np.uint8
            )
            counts = np.bincount(buf, minlength=256)
            nz = np.nonzero(counts)[0]
            rows.append(
                pd.DataFrame(
                    {"lang": lang, "byte": nz.astype("int64"),
                     "n": counts[nz].astype("int64")}
                )
            )
        return pd.concat(rows, ignore_index=True)

    agg = (
        docs.map_batches(hist, batch_format="pandas")
        .groupby(["lang", "byte"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out_rows = []
    for lang, sub in agg.groupby("lang"):
        w = sub["n"].astype(int).tolist()
        n_bytes = sum(w)
        n_sym = len(w)
        if n_sym == 1:
            bits = n_bytes  # 1-bit code by convention
        else:
            heap = list(w)
            heapq.heapify(heap)
            bits = 0
            while len(heap) > 1:
                a = heapq.heappop(heap)
                b = heapq.heappop(heap)
                bits += a + b
                heapq.heappush(heap, a + b)
        out_rows.append(
            (lang, n_bytes, n_sym, bits,
             (8 * n_bytes - bits) * PPM // (8 * n_bytes))
        )
    out = pd.DataFrame(
        sorted(out_rows),
        columns=["lang", "n_bytes", "n_symbols", "huff_bits", "saved_ppm"],
    )
    for c in ("n_bytes", "n_symbols", "huff_bits", "saved_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Bigram next-token accuracy (q274)
# --------------------------------------------------------------------------

_BIGRAM_SQL = f"""
WITH tk AS (SELECT doc_id, lang,
                   regexp_extract_all(lower(text), '[a-z]+') AS toks
            FROM documents),
tok AS (SELECT doc_id, lang, unnest(toks) AS w,
               generate_subscripts(toks, 1) AS i FROM tk),
bg AS (SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
fb AS (SELECT *, md5_number_lower(CAST(doc_id AS VARCHAR)) % {N_FOLDS} AS fold
       FROM bg),
tr AS (SELECT w1, w2, count(*) AS n FROM fb WHERE fold <> 0 GROUP BY 1, 2),
pr AS (SELECT w1, w2 AS wp FROM (
         SELECT w1, w2,
                row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2) AS rn
         FROM tr) WHERE rn = 1),
ev AS (SELECT lang, w1, w2 FROM fb WHERE fold = 0)
SELECT lang, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN pr.wp = ev.w2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       CAST(SUM(CASE WHEN pr.wp = ev.w2 THEN 1 ELSE 0 END)
            * {PPM} // count(*) AS BIGINT) AS acc_ppm
FROM ev LEFT JOIN pr USING (w1)
GROUP BY lang ORDER BY lang
"""


@query("q274_bigram_nexttok", sql=_BIGRAM_SQL)
def q274_bigram_nexttok(sf_dir: str):
    """Bigram language-model next-token accuracy on the held-out fold —
    the cheapest intrinsic eval of a corpus as TRAINING DATA: train the
    argmax bigram predictor (ties broken lexicographically) on the
    md5-stable train folds, score per-language accuracy on fold 0.
    Plan: bigram emission is a per-batch zip (no exchange); train
    counts and the per-w1 argmax are TWO token-keyed bucketed
    exchanges (vocabulary-scale groups, never per-group Python); the
    eval side joins the prediction table by ONE shuffle_join on w1 —
    at 100 TB the prediction table is vocab²-bounded and the join
    stays bucket-local.  Output: (lang, n_bigrams, n_correct,
    acc_ppm)."""
    import hashlib

    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.join import shuffle_join

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    tok_re = re.compile(r"[a-z]+")

    def bigrams(df: pd.DataFrame) -> pd.DataFrame:
        rows_w1, rows_w2, rows_lang, rows_fold = [], [], [], []
        for i, lang, text in zip(df["doc_id"], df["lang"], df["text"]):
            fold = int.from_bytes(
                hashlib.md5(str(int(i)).encode()).digest()[8:], "little"
            ) % N_FOLDS
            ws = tok_re.findall((text or "").lower())
            rows_w1.extend(ws[:-1])
            rows_w2.extend(ws[1:])
            rows_lang.extend([lang] * max(len(ws) - 1, 0))
            rows_fold.extend([fold] * max(len(ws) - 1, 0))
        return pd.DataFrame(
            {"lang": rows_lang, "fold": rows_fold,
             "w1": rows_w1, "w2": rows_w2}
        )

    bg = docs.map_batches(bigrams, batch_format="pandas")
    n_hint = docs.count() * 200  # ~tokens per doc upper bound

    train = bg.map_batches(
        lambda df: df.loc[df["fold"] != 0, ["w1", "w2"]], batch_format="pandas"
    )
    counts = bucketed_groupby(
        train, ["w1", "w2"],
        lambda df: df.groupby(["w1", "w2"], as_index=False).size()
        .rename(columns={"size": "n"}),
        expected_rows=n_hint,
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["w1", "n", "w2"], ascending=[True, False, True])
        top = d.drop_duplicates("w1", keep="first")
        return top[["w1", "w2"]].rename(columns={"w2": "wp"})

    pred = bucketed_groupby(counts, ["w1"], argmax, expected_rows=n_hint)

    ev = bg.map_batches(
        lambda df: df.loc[df["fold"] == 0, ["lang", "w1", "w2"]],
        batch_format="pandas",
    )
    joined = shuffle_join(ev, pred, on="w1", how="left",
                          expected_rows=n_hint)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["wp"] == df["w2"]).astype("int64")
        return pd.DataFrame(
            {"lang": df["lang"], "n_bigrams": 1, "n_correct": ok}
        ).groupby("lang", as_index=False).sum()

    out = (
        joined.map_batches(score, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_bigrams", alias_name="n_bigrams"),
                   Sum("n_correct", alias_name="n_correct"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["acc_ppm"] = out["n_correct"] * PPM // out["n_bigrams"]
    for c in ("n_bigrams", "n_correct", "acc_ppm"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# CRC32 transfer-integrity ledger (q275)
# --------------------------------------------------------------------------

_CRC_SQL = """
WITH c AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/crc_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(DISTINCT crc) AS BIGINT) AS n_distinct,
       CAST(sum(crc) AS BIGINT) AS sum_crc,
       CAST(min(crc) AS BIGINT) AS min_crc,
       CAST(max(crc) AS BIGINT) AS max_crc
FROM c GROUP BY fmt ORDER BY fmt
"""


@query("q275_crc_ledger", sql=_CRC_SQL)
def q275_crc_ledger(sf_dir: str):
    """CRC-32 transfer-integrity ledger over the image payloads — the
    checksum manifest a multi-hop copy (crawler → object store → training
    host) verifies against; per fmt: counts, distinct checksums (exact
    duplicate detector at 4 bytes/image), and sum/min/max as the
    mergeable ledger digest.  Plan: crc32 per blob inside the read task
    (zlib C kernel, bytes never shuffle), (fmt, crc) count combine, per-
    fmt aggregates over the distinct-checksum-sized survivor set.
    Oracle: committed fixture from an INDEPENDENT table-driven
    pure-Python CRC-32."""
    import zlib

    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["bytes", "fmt"])

    def crc(t: pa.Table) -> pa.Table:
        vals = [zlib.crc32(raw) for raw in t["bytes"].to_pylist()]
        return pa.table({"fmt": t["fmt"], "crc": pa.array(vals, pa.int64())})

    per = (
        ds.map_batches(crc, batch_format="pyarrow")
        .groupby(["fmt", "crc"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    g = per.groupby("fmt")
    out = pd.DataFrame(
        {
            "n_images": g["n"].sum(),
            "n_distinct": g["crc"].size(),
            "sum_crc": g.apply(
                lambda s: int((s["crc"] * s["n"]).sum()), include_groups=False
            ),
            "min_crc": g["crc"].min(),
            "max_crc": g["crc"].max(),
        }
    ).reset_index().sort_values("fmt").reset_index(drop=True)
    for c in ("n_images", "n_distinct", "sum_crc", "min_crc", "max_crc"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Hilbert-curve layout vs Z-order (q276)
# --------------------------------------------------------------------------

HILBERT_ORDER = 16  # 2^16 x 2^16 grid, d < 2^32


def hilbert_d_vec(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert xy→d (s-reflection variant; validated by the
    exhaustive adjacency test in tests/test_round4ll.py: consecutive d
    are always grid neighbors, which Z-order cannot guarantee)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


_HILBERT_SQL = f"""
WITH q AS (SELECT event_id, user_id AS x,
                  CAST(ROUND(value * 100) AS BIGINT) AS y FROM events),
h AS (SELECT q.event_id, q.x, q.y, f.hkey
      FROM q JOIN read_parquet(
        '/root/repo/tests/fixtures/oracle/hilbert_sf0.01.parquet') f
      USING (event_id)),
rh AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY hkey, event_id) AS rn FROM h),
fh AS (SELECT (rn - 1) // {ZORDER_FRAG} AS frag,
              MAX(x) - MIN(x) AS dx, MAX(y) - MIN(y) AS dy
       FROM rh GROUP BY 1),
z AS (SELECT event_id, x, y,
        SUM(((x >> i) & 1) * (1::BIGINT << (2*i))
            + ((y >> i) & 1) * (1::BIGINT << (2*i + 1))) AS zc
      FROM q, range({HILBERT_ORDER}) t(i) GROUP BY 1, 2, 3),
rz AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY zc, event_id) AS rn FROM z),
fz AS (SELECT (rn - 1) // {ZORDER_FRAG} AS frag,
              MAX(x) - MIN(x) AS dx, MAX(y) - MIN(y) AS dy
       FROM rz GROUP BY 1)
SELECT 'hilbert' AS layout, CAST(COUNT(*) AS BIGINT) AS n_frag,
       CAST(SUM(dx) AS BIGINT) AS sum_dx, CAST(SUM(dy) AS BIGINT) AS sum_dy
FROM fh
UNION ALL
SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(dx) AS BIGINT), CAST(SUM(dy) AS BIGINT) FROM fz
ORDER BY layout
"""


@query("q276_hilbert_layout", sql=_HILBERT_SQL)
def q276_hilbert_layout(sf_dir: str):
    """Hilbert-curve storage clustering vs q146's Z-order on the same
    (user, value-cents) dimensions: the Hilbert index keeps consecutive
    rows GRID-ADJACENT (no Z-order jump discontinuities), so per-
    fragment bounding boxes — what zone maps prune with — shrink
    further for the same single sort.  Plan identical to q146: derive
    keys vectorized per batch, ONE sort (sorted_positions), fragment-
    count-sized bbox aggregate.  Oracle: hilbert codes from the
    committed fixture (INDEPENDENT scalar implementation), Z-order and
    both frag audits recomputed in SQL."""
    from texrex_ray.ops.shuffle import sorted_positions

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (
            pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hk = hilbert_d_vec(HILBERT_ORDER, x, y)
        zc = np.zeros(len(x), dtype=np.int64)
        for i in range(HILBERT_ORDER):
            zc += ((x >> i) & 1) << (2 * i)
            zc += ((y >> i) & 1) << (2 * i + 1)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "hkey": pa.array(
                    [f"{h:012d}:{e:012d}" for h, e in zip(hk, eid)]
                ),
                "zkey": pa.array(
                    [f"{z:012d}:{e:012d}" for z, e in zip(zc, eid)]
                ),
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
        [frag_stats("hilbert", "hkey"), frag_stats("zorder", "zkey")],
        ignore_index=True,
    ).astype({"n_frag": "int64", "sum_dx": "int64", "sum_dy": "int64"})
    return out.sort_values("layout").reset_index(drop=True)


# --------------------------------------------------------------------------
# SymSpell 1-delete near-duplicate strings (q277)
# --------------------------------------------------------------------------

_SYMSPELL_SQL = """
WITH v AS (SELECT DISTINCT c_name AS w FROM customer)
SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b
  ON a.w < b.w AND abs(length(a.w) - length(b.w)) <= 1
 AND levenshtein(a.w, b.w) = 1
ORDER BY w1, w2
"""


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein<=1 in O(n): equal length -> at most one
    mismatch; length gap 1 -> one-gap subsequence check."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = used = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif used:
            return False
        else:
            used = 1
            j += 1
    return True


@query("q277_symspell_pairs", sql=_SYMSPELL_SQL)
def q277_symspell_pairs(sf_dir: str):
    """All string pairs at edit distance exactly 1 via the SymSpell
    1-delete index (Garbe) — the spell-variant / near-identifier
    clustering primitive: two strings within distance 1 ALWAYS share a
    member of {self} ∪ {1-deletes} (substitution at i → both i-deletes
    collide; insertion → the longer side's delete equals the shorter
    string itself), so candidate generation is an equi-join on delete
    variants, never an all-pairs scan.  Plan: variant explode per batch
    (length+1 rows per string), variant-keyed bucketed exchange for
    candidates, pair-keyed bucketed dedup, O(n) two-pointer verify —
    at 100 TB the exchange is (corpus × avg_len) rows of SHORT strings,
    and the verify touches only candidates.  Output: (w1, w2)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

    cust = _read(sf_dir, "customer", ["c_name"])
    n_hint = cust.count() * 20

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        ws, vs = [], []
        for w in df["c_name"].drop_duplicates():
            ws.append(w)
            vs.append(w)
            for i in range(len(w)):
                ws.append(w)
                vs.append(w[:i] + w[i + 1:])
        return pd.DataFrame({"w": ws, "v": vs})

    var = cust.map_batches(variants, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        m = d.merge(d, on="v")
        m = m[m["w_x"] < m["w_y"]]
        return m[["w_x", "w_y"]].drop_duplicates().rename(
            columns={"w_x": "w1", "w_y": "w2"}
        )

    cand = bucketed_groupby(var, ["v"], bucket_pairs, expected_rows=n_hint)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        keep = [
            _lev_le1(w1, w2) for w1, w2 in zip(d["w1"], d["w2"])
        ]
        return d[np.asarray(keep, dtype=bool)]

    out = (
        bucketed_groupby(cand, ["w1", "w2"], verify, expected_rows=n_hint)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    return out


# --------------------------------------------------------------------------
# Gale-Shapley stable matching (q278)
# --------------------------------------------------------------------------

GS_N = 100  # matching market size (suppliers propose)

_GS_SQL = """
SELECT p AS s_suppkey, a AS c_custkey, p_rank, a_rank
FROM read_parquet('/root/repo/tests/fixtures/oracle/stable_match_sf0.01.parquet')
ORDER BY s_suppkey
"""


@query("q278_stable_match", sql=_GS_SQL)
def q278_stable_match(sf_dir: str):
    """Proposer-optimal stable matching (Gale-Shapley 1962) between the
    first GS_N suppliers and customers, preferences = (|acctbal gap|
    cents, key) — the two-sided assignment primitive (replica election,
    shard placement, crawl-budget pairing).  Strict preferences make
    the proposer-optimal matching UNIQUE, so independent
    implementations agree row-for-row and stability is a checkable
    certificate.  Plan: preference ranking is the data-sized work and
    runs distributed (ops/matching.py::rank_preferences, broadcast
    acceptor table); deferred acceptance is O(N²) pointer chasing over
    the domain-sized rank matrix on the driver — the round-synchronous
    exchange variant for web-scale N is documented in the module.
    Output: (s_suppkey, c_custkey, p_rank, a_rank)."""
    from texrex_ray.ops.matching import gale_shapley, rank_preferences

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    sup_pd = sup.to_pandas().sort_values("s_suppkey").head(GS_N)
    cust_pd = cust.to_pandas().sort_values("c_custkey").head(len(sup_pd))

    sup_ds = ray.data.from_pandas(sup_pd)
    cust_ds = ray.data.from_pandas(cust_pd)
    prefs_p = rank_preferences(
        sup_ds, cust_pd, "s_suppkey", "s_acctbal", "c_custkey", "c_acctbal"
    )
    prefs_a = rank_preferences(
        cust_ds, sup_pd, "c_custkey", "c_acctbal", "s_suppkey", "s_acctbal"
    ).rename(columns={"p": "a", "a": "p"})  # acceptor-side: (a, rank, p)
    out = gale_shapley(prefs_p, prefs_a).rename(
        columns={"p": "s_suppkey", "a": "c_custkey"}
    )
    for c in ("s_suppkey", "c_custkey", "p_rank", "a_rank"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Histogram-equalization contrast audit (q279)
# --------------------------------------------------------------------------

_HISTEQ_SQL = """
WITH h AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/histeq_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(var_before_milli) AS BIGINT) AS sum_var_before,
       CAST(SUM(var_after_milli) AS BIGINT) AS sum_var_after,
       CAST(SUM(CASE WHEN var_after_milli > var_before_milli
                THEN 1 ELSE 0 END) AS BIGINT) AS n_gained
FROM h GROUP BY fmt ORDER BY fmt
"""


@query("q279_hist_equalize", sql=_HISTEQ_SQL)
def q279_hist_equalize(sf_dir: str):
    """Histogram-equalization contrast audit per image
    (stages/images.py::HistEqualize): the classic integer CDF remap of
    channel-sum luminance, variance x1000 before/after — which assets
    an enhancement pass would actually improve.  Two scalars per image
    leave the decode task; per fmt: counts, variance sums, images
    gained.  Oracle: committed fixture from the INDEPENDENT per-pixel
    scalar twin."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import HistEqualize

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        HistEqualize, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "var_before_milli", "var_after_milli"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(
            gained=(df["var_after_milli"] > df["var_before_milli"]).astype(
                "int64"
            )
        ).groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_var_before": g["var_before_milli"].sum(),
                "sum_var_after": g["var_after_milli"].sum(),
                "n_gained": g["gained"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_var_before", alias_name="sum_var_before"),
            Sum("sum_var_after", alias_name="sum_var_after"),
            Sum("n_gained", alias_name="n_gained"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_var_before", "sum_var_after", "n_gained"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Deterministic KLL quantile sketch (q280)
# --------------------------------------------------------------------------

KLL_K = 64
KLL_BUCKETS = 32
KLL_STATS = [("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]

_KLL_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/kll_sf0.01.parquet')),
t AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t)
SELECT f.stat, f.est_c,
       CAST((SELECT count(*) FROM t WHERE t.c < f.est_c) AS BIGINT)
           AS n_below,
       n.n_total,
       CAST((f.q_num * n.n_total + f.q_den - 1) // f.q_den AS BIGINT)
           AS target_rank,
       CAST(abs((SELECT count(*) FROM t WHERE t.c < f.est_c)
                - (f.q_num * n.n_total + f.q_den - 1) // f.q_den)
            AS BIGINT) AS err_rank
FROM f, n ORDER BY f.stat
"""


@query("q280_kll_quantiles", sql=_KLL_SQL)
def q280_kll_quantiles(sf_dir: str):
    """Mergeable deterministic KLL quantile sketch (ops/kll.py) over
    line-item price cents, plus an EXACT distributed rank audit of each
    estimate — the streaming replacement for q46's exact histogram when
    the value domain is unbounded: O(k log(n/k)) state per bucket,
    content-stable bucketing (md5 of the row key), bucket sketches
    merged in id order so the result is layout-invariant.  Plan: ONE
    bucketed exchange carrying (value, weight) sketch rows (KB-scale),
    driver merge over KLL_BUCKETS sketches, then ONE partial-count pass
    for the exact ranks of the four estimates.  Output: (stat, est_c,
    n_below, n_total, target_rank, err_rank) — err bounded by
    rank_error_bound, asserted in tests."""
    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.ops.kll import (
        build_sketch,
        merge_sketches,
        quantile,
        rows_to_sketch,
        sketch_to_rows,
    )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]
    )

    def bucket_vals(df: pd.DataFrame) -> pd.DataFrame:
        keys = [
            f"{o}:{l}"
            for o, l in zip(df["l_orderkey"].astype(int),
                            df["l_linenumber"].astype(int))
        ]
        b = (md5_lower64(keys) % np.uint64(KLL_BUCKETS)).astype(np.int64)
        c = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({"bucket": b, "c": c})

    def bucket_sketch(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(g["c"].to_numpy())
        levels = build_sketch(vals, KLL_K)
        v, w = sketch_to_rows(levels)
        return pd.DataFrame(
            {"bucket": int(g["bucket"].iloc[0]), "v": v, "w": w}
        )

    rows = (
        li.map_batches(bucket_vals, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_sketch, batch_format="pandas")
        .to_pandas()
    )
    merged: list[np.ndarray] = []
    for b in sorted(rows["bucket"].unique()):
        sub = rows[rows["bucket"] == b]
        sk = rows_to_sketch(sub["v"].to_numpy(), sub["w"].to_numpy())
        merged = merge_sketches(merged, sk, KLL_K) if merged else sk
    ests = {
        stat: quantile(merged, qn, qd) for stat, qn, qd in KLL_STATS
    }

    thresholds = np.array([ests[s] for s, _, _ in KLL_STATS], dtype=np.int64)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        below = [(c < t).sum() for t in thresholds]
        return pd.DataFrame(
            {
                "stat": [s for s, _, _ in KLL_STATS],
                "n_below": np.asarray(below, dtype=np.int64),
                "n_total": np.int64(len(c)),
            }
        )

    agg = (
        li.map_batches(counts, batch_format="pandas")
        .groupby("stat")
        .aggregate(Sum("n_below", alias_name="n_below"),
                   Sum("n_total", alias_name="n_total"))
        .to_pandas()
    )
    agg["est_c"] = agg["stat"].map(ests)
    qmap = {s: (qn, qd) for s, qn, qd in KLL_STATS}
    agg["target_rank"] = [
        (qmap[s][0] * int(n) + qmap[s][1] - 1) // qmap[s][1]
        for s, n in zip(agg["stat"], agg["n_total"])
    ]
    agg["err_rank"] = (agg["n_below"] - agg["target_rank"]).abs()
    out = agg[["stat", "est_c", "n_below", "n_total", "target_rank",
               "err_rank"]].sort_values("stat").reset_index(drop=True)
    for c in ("est_c", "n_below", "n_total", "target_rank", "err_rank"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Systematic weighted sampling (q281)
# --------------------------------------------------------------------------

SAMPLE_N = 100

_SYSSAMPLE_SQL = f"""
WITH c AS (SELECT doc_id, n_chars,
       COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
       FROM documents),
t AS (SELECT SUM(n_chars) AS w FROM documents)
SELECT doc_id, n_chars,
       CAST((lo + n_chars) * {SAMPLE_N} // w
            - lo * {SAMPLE_N} // w AS BIGINT) AS mult
FROM c, t
WHERE (lo + n_chars) * {SAMPLE_N} // w > lo * {SAMPLE_N} // w
ORDER BY doc_id
"""


@query("q281_systematic_sample", sql=_SYSSAMPLE_SQL)
def q281_systematic_sample(sf_dir: str):
    """Systematic probability-proportional-to-size sampling: lay all
    documents along the cumulative n_chars axis and take one unit every
    W/SAMPLE_N — the PPS sampler behind corpus audits ("inspect 100
    documents weighted by size") with EXACTLY SAMPLE_N total
    multiplicity by floor telescoping, no randomness, no sort-by-
    priority.  Plan: ops/window.py::prefix_scan_sum gives the exclusive
    global running sum with NO global sort (range slices + driver
    carry); selection is then a per-batch integer predicate.  A
    document larger than W/SAMPLE_N spans several sampling points and
    reports its multiplicity.  Output: (doc_id, n_chars, mult)."""
    from texrex_ray.ops.window import prefix_scan_sum

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    w_total = int(docs.sum("n_chars"))
    scanned = prefix_scan_sum(docs, "doc_id", "n_chars", out="lo")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        lo = df["lo"].to_numpy().astype(np.int64)
        hi = lo + df["n_chars"].to_numpy().astype(np.int64)
        m = hi * SAMPLE_N // w_total - lo * SAMPLE_N // w_total
        out = df.loc[m > 0, ["doc_id", "n_chars"]].copy()
        out["mult"] = m[m > 0]
        return out

    out = (
        scanned.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_chars", "mult"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Otsu threshold audit (q282)
# --------------------------------------------------------------------------

_OTSU_SQL = """
WITH o AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/otsu_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(otsu_thresh) AS BIGINT) AS sum_thresh,
       CAST(MIN(otsu_thresh) AS BIGINT) AS min_thresh,
       CAST(MAX(otsu_thresh) AS BIGINT) AS max_thresh,
       CAST(SUM(otsu_eta_milli) AS BIGINT) AS sum_eta_milli
FROM o GROUP BY fmt ORDER BY fmt
"""


@query("q282_otsu_threshold", sql=_OTSU_SQL)
def q282_otsu_threshold(sf_dir: str):
    """Otsu's optimal threshold + separability per image
    (stages/images.py::OtsuThreshold): exact-integer argmax of
    between-class variance over the 766-bin luminance histogram — the
    per-image replacement for q269's fixed foreground constant, and a
    flat-vs-bimodal structure gate (eta→0 means no meaningful split).
    Histogram-sized work per image, two scalars shuffle.  Oracle:
    committed fixture from the INDEPENDENT Fraction-arithmetic twin."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import OtsuThreshold

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        OtsuThreshold, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "otsu_thresh", "otsu_eta_milli"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_thresh": g["otsu_thresh"].sum(),
                "min_thresh": g["otsu_thresh"].min(),
                "max_thresh": g["otsu_thresh"].max(),
                "sum_eta_milli": g["otsu_eta_milli"].sum(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_thresh", alias_name="sum_thresh"),
            Min("min_thresh", alias_name="min_thresh"),
            Max("max_thresh", alias_name="max_thresh"),
            Sum("sum_eta_milli", alias_name="sum_eta_milli"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_thresh", "min_thresh", "max_thresh",
              "sum_eta_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Sobel edge-orientation histogram (q283)
# --------------------------------------------------------------------------

_SOBEL_SQL = """
WITH s AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/sobel_fixture.parquet')),
u AS (SELECT fmt, unnest(ori_hist) AS votes,
             generate_subscripts(ori_hist, 1) - 1 AS sector FROM s)
SELECT fmt, CAST(sector AS BIGINT) AS sector,
       CAST(SUM(votes) AS BIGINT) AS n_votes
FROM u GROUP BY fmt, sector ORDER BY fmt, sector
"""


@query("q283_sobel_orientation", sql=_SOBEL_SQL)
def q283_sobel_orientation(sf_dir: str):
    """Per-format 8-sector edge-orientation histogram (the HOG
    descriptor's first stage) via stages/images.py::SobelOrientation:
    integer Sobel on shifted interior views, octant decided by exact
    sign/magnitude comparisons — no atan, no floats, so bit-identical
    everywhere.  Synthetic graphics show axis-aligned spikes,
    photographs spread — the texture-direction signal for curation.
    Only the 8-bin histogram leaves the task.  Oracle: committed
    fixture from the INDEPENDENT per-pixel nested-branch twin, sector
    sums recomputed in SQL.  Output: (fmt, sector, n_votes)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import SobelOrientation

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        SobelOrientation, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "ori_hist"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fmt, sub in df.groupby("fmt"):
            mat = np.vstack([np.asarray(h, dtype=np.int64)
                             for h in sub["ori_hist"]])
            tot = mat.sum(axis=0)
            rows.append(pd.DataFrame({
                "fmt": fmt,
                "sector": np.arange(8, dtype=np.int64),
                "n_votes": tot,
            }))
        return pd.concat(rows, ignore_index=True)

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby(["fmt", "sector"])
        .aggregate(Sum("n_votes", alias_name="n_votes"))
        .to_pandas()
        .sort_values(["fmt", "sector"])
        .reset_index(drop=True)
    )
    for c in ("sector", "n_votes"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Morphological opening despeckle audit (q284)
# --------------------------------------------------------------------------

_MORPH_SQL = """
WITH m AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/morph_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(fg_px) AS BIGINT) AS sum_fg,
       CAST(SUM(opened_px) AS BIGINT) AS sum_opened,
       CAST(SUM(speckle_px) AS BIGINT) AS sum_speckle,
       CAST(MAX(speckle_px) AS BIGINT) AS max_speckle
FROM m GROUP BY fmt ORDER BY fmt
"""


@query("q284_morph_opening", sql=_MORPH_SQL)
def q284_morph_opening(sf_dir: str):
    """3x3 morphological opening despeckle audit per image
    (stages/images.py::MorphOpening): erosion-then-dilation removes
    sub-kernel foreground specks — the denoise pass before q269's blob
    count; opening is anti-extensive, so speckle_px >= 0 always (test
    invariant).  Shifted whole-array min/max, three scalars shuffle.
    Oracle: committed fixture from the INDEPENDENT scalar
    neighborhood-walk twin."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import MorphOpening

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        MorphOpening, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).select_columns(["fmt", "fg_px", "opened_px", "speckle_px"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "sum_fg": g["fg_px"].sum(),
                "sum_opened": g["opened_px"].sum(),
                "sum_speckle": g["speckle_px"].sum(),
                "max_speckle": g["speckle_px"].max(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_fg", alias_name="sum_fg"),
            Sum("sum_opened", alias_name="sum_opened"),
            Sum("sum_speckle", alias_name="sum_speckle"),
            Max("max_speckle", alias_name="max_speckle"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_fg", "sum_opened", "sum_speckle",
              "max_speckle"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# CUSUM drift detector (q285)
# --------------------------------------------------------------------------

CUSUM_H_MULT = 5  # alarm threshold = 5 * allowance

_CUSUM_SQL = """
SELECT event_type, n_days, allowance_k, threshold_h, n_alarms,
       first_alarm_day, max_s
FROM read_parquet('/root/repo/tests/fixtures/oracle/cusum_sf0.01.parquet')
ORDER BY event_type
"""


@query("q285_cusum_drift", sql=_CUSUM_SQL)
def q285_cusum_drift(sf_dir: str):
    """Page's CUSUM drift detector over per-type daily event volumes —
    the data-quality tripwire that catches a feed running persistently
    hot (S_t = max(0, S_{t-1} + x_t - k); alarm and reset when S_t > h)
    where a plain threshold only sees single spikes.  Missing days
    zero-fill over the GLOBAL day range (a silent feed is itself
    drift).  Integer spec: k = floor(total/n_days) + 1 (strictly above
    floor-mean), h = CUSUM_H_MULT * k.  Plan: ONE (day x type)-sized
    distributed aggregate, then the recursive scan runs per type inside
    map_groups over day-domain-sized series.  Output: (event_type,
    n_days, allowance_k, threshold_h, n_alarms, first_alarm_day,
    max_s)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        g = (
            pd.DataFrame({"event_type": df["event_type"], "day": day, "n": 1})
            .groupby(["event_type", "day"], as_index=False)
            .sum()
        )
        return g

    daily = (
        ev.map_batches(day_counts, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"))
    )
    lo = int(daily.min("day"))
    hi = int(daily.max("day"))
    n_days = hi - lo + 1

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        full = np.zeros(n_days, dtype=np.int64)
        full[g["day"].to_numpy().astype(np.int64) - lo] = g["n"].to_numpy()
        total = int(full.sum())
        k = total // n_days + 1
        h = CUSUM_H_MULT * k
        s = 0
        max_s = 0
        n_alarms = 0
        first = -1
        for i in range(n_days):
            s = max(0, s + int(full[i]) - k)
            max_s = max(max_s, s)
            if s > h:
                n_alarms += 1
                if first < 0:
                    first = lo + i
                s = 0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_days": [n_days],
                "allowance_k": [k],
                "threshold_h": [h],
                "n_alarms": [n_alarms],
                "first_alarm_day": [first],
                "max_s": [max_s],
            }
        )

    out = (
        daily.groupby("event_type")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_days", "allowance_k", "threshold_h", "n_alarms",
              "first_alarm_day", "max_s"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Aho-Corasick multi-pattern census (q286)
# --------------------------------------------------------------------------

AC_PATTERNS = ["a", "an", "row", "scan", "tab", "table"]

_AC_SQL = """
WITH pats(pattern) AS (VALUES ('a'), ('an'), ('row'), ('scan'), ('tab'),
                              ('table')),
hits AS (
  SELECT d.doc_id, p.pattern
  FROM documents d CROSS JOIN pats p
  CROSS JOIN generate_series(1, 600) AS t(i)
  WHERE i <= length(d.text) - length(p.pattern) + 1
    AND substr(d.text, i, length(p.pattern)) = p.pattern
)
SELECT pattern, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM hits GROUP BY pattern ORDER BY pattern
"""


@query("q286_aho_corasick", sql=_AC_SQL)
def q286_aho_corasick(sf_dir: str):
    """Multi-pattern term census via ONE Aho-Corasick automaton pass
    (functions/multimatch.py) instead of the reference's per-pattern
    regex sweeps (trrofl.pas word lists) — O(corpus + matches) for any
    blocklist size, counting ALL (overlapping, nested) occurrences.
    Automaton built once per actor in __init__; only pattern-sized
    count rows leave each task.  Oracle: brute-force SQL position scan
    substr(text, i, len(p)) = p — the exact same overlap semantics by
    construction.  Output: (pattern, n_docs, n_occ)."""
    from texrex_ray.functions.multimatch import AhoCorasick

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    class Census:
        def __init__(self) -> None:
            self.ac = AhoCorasick(AC_PATTERNS)

        def __call__(self, t: pa.Table) -> pa.Table:
            occ = np.zeros(len(AC_PATTERNS), dtype=np.int64)
            ndoc = np.zeros(len(AC_PATTERNS), dtype=np.int64)
            for txt in t["text"].to_pylist():
                c = self.ac.count(txt)
                occ += c
                ndoc += c > 0
            return pa.table(
                {
                    "pattern": pa.array(AC_PATTERNS, pa.string()),
                    "n_docs": pa.array(ndoc, pa.int64()),
                    "n_occ": pa.array(occ, pa.int64()),
                }
            )

    out = (
        docs.map_batches(Census, concurrency=2, batch_size=256,
                         batch_format="pyarrow")
        .groupby("pattern")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_occ", alias_name="n_occ"))
        .to_pandas()
        .sort_values("pattern")
        .reset_index(drop=True)
    )
    out = out[out["n_occ"] > 0].copy()
    for c in ("n_docs", "n_occ"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# k-core decomposition (q287)
# --------------------------------------------------------------------------

_KCORE_SQL = """
SELECT CAST(core AS BIGINT) AS core, CAST(count(*) AS BIGINT) AS n_nodes
FROM read_parquet('/root/repo/tests/fixtures/oracle/kcore_fixture.parquet')
GROUP BY core ORDER BY core
"""


@query("q287_kcore", sql=_KCORE_SQL)
def q287_kcore(sf_dir: str):
    """Core number of every crawl-graph page via the h-index fixpoint
    (ops/graph.py::kcore_int) — coreness grades graph density the way
    q266's k-truss grades cohesion; link farms land in deep cores.
    Node-sized broadcast per round, edge-batch H-index vectorized, a
    documented join swap at page scale.  Oracle: committed fixture from
    the INDEPENDENT Batagelj-Zaversnik bucket-peeling twin
    (kcore_sequential) — a different algorithm whose unique answer must
    coincide.  Output: (core, n_nodes) histogram."""
    from texrex_ray.ops.graph import kcore_int

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    pernode = kcore_int(edges)
    out = (
        pernode.groupby("core", as_index=False)
        .size()
        .rename(columns={"size": "n_nodes"})
        .sort_values("core")
        .reset_index(drop=True)
    )
    for c in ("core", "n_nodes"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Bloom-filter false-positive-rate audit (q288)
# --------------------------------------------------------------------------

BLOOM_AUDIT_CAP = 4096      # initial segment capacity (forces scaling)
BLOOM_AUDIT_ERR = 0.01      # per-segment design error rate
BLOOM_AUDIT_CHUNK = 1024    # fixed add-chunk size (segmentation is part
                            # of the spec: chunks land whole in a segment)
BLOOM_AUDIT_PROBES = 50_000

_BLOOM_AUDIT_SQL = """
SELECT n_keys, n_added, n_segments, total_bits, total_set_bits,
       n_probes, n_fp, fpr_ppm
FROM read_parquet('/root/repo/tests/fixtures/oracle/bloom_audit_sf0.01.parquet')
"""


@query("q288_bloom_fpr_audit", sql=_BLOOM_AUDIT_SQL)
def q288_bloom_fpr_audit(sf_dir: str):
    """Measured false-positive rate of the URL-seen ScalingBloom
    (state/bloom.py, ref trbloom.pas:169-582) against a disjoint probe
    set — the audit that justifies the crawl frontier's memory budget:
    membership is any-segment-hits, so the effective FPR of a 3-segment
    chain is ~1-(1-p)^3, NOT the per-segment design p.  Build is
    deterministic (sorted keys, fixed 1024-key chunks, driver-side —
    the engine's real blooms are per-frontier-shard); the 50k-key probe
    runs distributed with the snapshot broadcast once via ray.put.
    Oracle: committed fixture from the INDEPENDENT pure-Python-int
    bit-set twin (no numpy).  Output: one audit row."""
    from texrex_ray.state.bloom import ScalingBloom

    orders = _read(sf_dir, "orders", ["o_orderkey"]).to_pandas()
    keys = [f"u:{k}" for k in np.sort(orders["o_orderkey"].to_numpy())]
    bloom = ScalingBloom(initial_capacity=BLOOM_AUDIT_CAP,
                         error_rate=BLOOM_AUDIT_ERR)
    n_added = 0
    for i in range(0, len(keys), BLOOM_AUDIT_CHUNK):
        n_added += int(bloom.add_if_new(keys[i:i + BLOOM_AUDIT_CHUNK]).sum())
    snap_ref = ray.put(bloom.snapshot())

    def probe(t: pa.Table) -> pa.Table:
        b = ScalingBloom.restore(ray.get(snap_ref))
        ids = t["id"].to_numpy(zero_copy_only=False)
        hit = b.contains_many([f"x:{i}" for i in ids])
        return pa.table({"fp": pa.array([int(hit.sum())], pa.int64())})

    n_fp = int(
        ray.data.range(BLOOM_AUDIT_PROBES)
        .map_batches(probe, batch_format="pyarrow", batch_size=8192)
        .sum("fp")
    )
    total_bits = sum(s.bits for s in bloom.segments)
    set_bits = sum(
        int(np.unpackbits(s.arr).sum()) for s in bloom.segments
    )
    return pd.DataFrame(
        {
            "n_keys": [len(keys)],
            "n_added": [n_added],
            "n_segments": [len(bloom.segments)],
            "total_bits": [total_bits],
            "total_set_bits": [set_bits],
            "n_probes": [BLOOM_AUDIT_PROBES],
            "n_fp": [n_fp],
            "fpr_ppm": [n_fp * 1_000_000 // BLOOM_AUDIT_PROBES],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# LZ76 complexity profile (q289)
# --------------------------------------------------------------------------

_LZ76_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/lz76_sf0.01.parquet'))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(lz76) AS BIGINT) AS sum_c,
       CAST(MIN(lz76) AS BIGINT) AS min_c,
       CAST(MAX(lz76) AS BIGINT) AS max_c,
       CAST(SUM(lz76) * 1000 // SUM(n_chars) AS BIGINT) AS c_per_kchar
FROM f GROUP BY lang ORDER BY lang
"""


@query("q289_lz76_complexity", sql=_LZ76_SQL)
def q289_lz76_complexity(sf_dir: str):
    """LZ76 phrase-count complexity per document (functions/
    complexity.py) aggregated per language — the tuning-free
    compressibility signal: template/boilerplate text parses into few
    phrases, natural prose into ~n/log n.  Embarrassingly parallel doc-
    local scan; language-sized aggregate rows shuffle.  Oracle:
    committed fixture from the INDEPENDENT Kaspar-Schuster pointer-walk
    twin (char-by-char, no substring-search primitive), re-aggregated
    in SQL.  Output: (lang, n_docs, sum_c, min_c, max_c, c_per_kchar
    = sum_c * 1000 // sum_chars)."""
    from texrex_ray.functions.complexity import lz76_complexity

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        df = pd.DataFrame(
            {
                "lang": langs,
                "c": [lz76_complexity(s) for s in texts],
                "nch": [len(s) for s in texts],
            }
        )
        g = df.groupby("lang").agg(
            n_docs=("c", "size"), sum_c=("c", "sum"), min_c=("c", "min"),
            max_c=("c", "max"), sum_ch=("nch", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_c", alias_name="sum_c"),
            Min("min_c", alias_name="min_c"),
            Max("max_c", alias_name="max_c"),
            Sum("sum_ch", alias_name="sum_ch"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["c_per_kchar"] = out["sum_c"] * 1000 // out["sum_ch"]
    out = out.drop(columns=["sum_ch"])
    for c in ("n_docs", "sum_c", "min_c", "max_c", "c_per_kchar"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Hamilton largest-remainder apportionment (q290)
# --------------------------------------------------------------------------

HAMILTON_SEATS = 10_000

_HAMILTON_SQL = """
WITH w AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w_chars
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(w_chars) AS big_w FROM w),
q AS (
  SELECT source, w_chars,
         w_chars * 10000 // big_w       AS base_seats,
         w_chars * 10000 %  big_w       AS rem,
         10000 - SUM(w_chars * 10000 // big_w) OVER () AS r_extra
  FROM w, tot
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk FROM q
)
SELECT source, w_chars, CAST(base_seats AS BIGINT) AS base_seats,
       CAST(CASE WHEN rk <= r_extra THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_seats + CASE WHEN rk <= r_extra THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM r ORDER BY source
"""


@query("q290_hamilton_apportion", sql=_HAMILTON_SQL)
def q290_hamilton_apportion(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed sampling
    budget across sources, proportional to corpus bytes — the exact-
    integer way to split "take 10k docs" over shards so the totals sum
    EXACTLY to the budget (floor quotas + one extra seat to the largest
    remainders, ties by source name).  The weight scan is the only
    distributed pass; apportionment runs on the stratum-sized table.
    Pure-SQL oracle (window functions), no fixture.  Output: (source,
    w_chars, base_seats, extra, seats)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    w = (
        docs.groupby("source")
        .aggregate(Sum("n_chars", alias_name="w_chars"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    big_w = int(w["w_chars"].sum())
    num = w["w_chars"].astype("int64") * HAMILTON_SEATS
    w["base_seats"] = num // big_w
    rem = num % big_w
    r_extra = HAMILTON_SEATS - int(w["base_seats"].sum())
    order = np.lexsort((w["source"].to_numpy(), -rem.to_numpy()))
    extra = np.zeros(len(w), dtype=np.int64)
    extra[order[:r_extra]] = 1
    w["extra"] = extra
    w["seats"] = w["base_seats"] + w["extra"]
    for c in ("w_chars", "base_seats", "extra", "seats"):
        w[c] = w[c].astype("int64")
    return w


# --------------------------------------------------------------------------
# Integral-image box means (q291)
# --------------------------------------------------------------------------

_BOXMEANS_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/boxmeans_fixture.parquet'))
SELECT fmt, CAST(count(*) AS BIGINT) AS n_boxes,
       CAST(SUM(mean_milli) AS BIGINT) AS sum_mean,
       CAST(MIN(mean_milli) AS BIGINT) AS min_mean,
       CAST(MAX(mean_milli) AS BIGINT) AS max_mean
FROM f GROUP BY fmt ORDER BY fmt
"""


@query("q291_box_means", sql=_BOXMEANS_SQL)
def q291_box_means(sf_dir: str):
    """Mean luminance of 8 deterministic boxes per image via ONE
    summed-area table per image (stages/images.py::BoxMeans) — O(1)
    per box after an O(pixels) integral pass (Viola-Jones); the
    region-stat backbone for thumbnail/crop scoring.  Box coords derive
    from md5(image_id:b), exact integer mean_milli = sum*1000//area.
    Oracle: committed fixture from the INDEPENDENT direct per-box
    pixel-loop twin, per-format stats recomputed in SQL."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import BoxMeans

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    rows = ds.map_batches(
        BoxMeans, concurrency=2, batch_size=64, batch_format="pyarrow"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")["mean_milli"]
        return pd.DataFrame(
            {
                "n_boxes": g.size(),
                "sum_mean": g.sum(),
                "min_mean": g.min(),
                "max_mean": g.max(),
            }
        ).reset_index()

    out = (
        rows.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_boxes", alias_name="n_boxes"),
            Sum("sum_mean", alias_name="sum_mean"),
            Min("min_mean", alias_name="min_mean"),
            Max("max_mean", alias_name="max_mean"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_boxes", "sum_mean", "min_mean", "max_mean"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Max-sum sliding 7-day window per event type (q292)
# --------------------------------------------------------------------------

WINDOW_DAYS = 7

_WINMAX_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day,
         SUM(n) OVER (PARTITION BY event_type ORDER BY day
                      RANGE BETWEEN CURRENT ROW AND 6 FOLLOWING) AS wsum
  FROM daily
),
best AS (
  SELECT event_type, day AS best_start_day, wsum AS best_sum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY wsum DESC, day) AS rk
  FROM win
)
SELECT b.event_type, CAST(b.best_start_day AS BIGINT) AS best_start_day,
       CAST(b.best_sum AS BIGINT) AS best_sum,
       CAST(a.n_days_active AS BIGINT) AS n_days_active
FROM best b
JOIN (SELECT event_type, count(*) AS n_days_active FROM daily GROUP BY 1) a
  USING (event_type)
WHERE b.rk = 1 ORDER BY b.event_type
"""


@query("q292_window_max_burst", sql=_WINMAX_SQL)
def q292_window_max_burst(sf_dir: str):
    """Hottest 7-day window per event type — the burst detector behind
    capacity planning: max over window starts of the volume in
    [s, s+6], where the optimum is provably achieved starting AT an
    active day (shifting a start right to the next active day loses
    nothing on the left and can only gain on the right), so both
    engines scan only active-day starts.  ONE (day x type) aggregate,
    then a day-domain-sized vectorized sliding sum per type.  Ties ->
    earliest start.  Output: (event_type, best_start_day, best_sum,
    n_days_active)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("int64") // 86_400_000_000).astype("int64")
        return (
            pd.DataFrame({"event_type": df["event_type"], "day": day, "n": 1})
            .groupby(["event_type", "day"], as_index=False)
            .sum()
        )

    daily = (
        ev.map_batches(day_counts, batch_format="pandas")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        days = g["day"].to_numpy().astype(np.int64)
        ns = g["n"].to_numpy().astype(np.int64)
        # windowed sum at each active start via two-pointer searchsorted
        ends = np.searchsorted(days, days + WINDOW_DAYS, side="left")
        csum = np.concatenate([[0], ns.cumsum()])
        wsums = csum[ends] - csum[np.arange(len(days))]
        i = int(np.lexsort((days, -wsums))[0])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "best_start_day": [int(days[i])],
                "best_sum": [int(wsums[i])],
                "n_days_active": [len(days)],
            }
        )

    out = (
        daily.groupby("event_type")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("best_start_day", "best_sum", "n_days_active"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Smallest string period via KMP failure function (q293)
# --------------------------------------------------------------------------

_PERIOD_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/period_sf0.01.parquet'))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN period < n_chars THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bordered,
       CAST(SUM(period) AS BIGINT) AS sum_period,
       CAST(SUM(period * 1000 // n_chars) AS BIGINT) AS sum_ratio_milli
FROM f GROUP BY lang ORDER BY lang
"""


@query("q293_smallest_period", sql=_PERIOD_SQL)
def q293_smallest_period(sf_dir: str):
    """Smallest period p of each document (minimal p with s[i] ==
    s[i+p] for all i < n-p, i.e. n minus the longest border from the
    KMP failure function) — template spam repeats with tiny periods,
    natural prose has p == n.  Doc-local O(n) scan; language-sized
    aggregates shuffle.  Oracle: committed fixture from the INDEPENDENT
    brute-force shift-check twin (tries each p ascending).  Output:
    (lang, n_docs, n_bordered, sum_period, sum_ratio_milli)."""
    from texrex_ray.functions.complexity import smallest_period

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        ps = [smallest_period(s) for s in texts]
        df = pd.DataFrame(
            {
                "lang": langs,
                "p": ps,
                "bordered": [int(p < len(s)) for p, s in zip(ps, texts)],
                "ratio": [p * 1000 // len(s) for p, s in zip(ps, texts)],
            }
        )
        g = df.groupby("lang").agg(
            n_docs=("p", "size"), n_bordered=("bordered", "sum"),
            sum_period=("p", "sum"), sum_ratio_milli=("ratio", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_bordered", alias_name="n_bordered"),
            Sum("sum_period", alias_name="sum_period"),
            Sum("sum_ratio_milli", alias_name="sum_ratio_milli"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "n_bordered", "sum_period", "sum_ratio_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Coordinated key-sample join estimate (q294)
# --------------------------------------------------------------------------

COORD_SAMPLE_MOD = 16

_COORD_SQL = """
WITH so AS (
  SELECT o_custkey FROM orders
  WHERE md5_number_lower(CAST(o_custkey AS VARCHAR)) % 16 = 0
),
sc AS (
  SELECT c_custkey FROM customer
  WHERE md5_number_lower(CAST(c_custkey AS VARCHAR)) % 16 = 0
),
j AS (SELECT count(*) AS n FROM so JOIN sc ON o_custkey = c_custkey),
t AS (SELECT count(*) AS n FROM orders JOIN customer
      ON o_custkey = c_custkey)
SELECT CAST((SELECT count(*) FROM so) AS BIGINT) AS n_sample_ord,
       CAST((SELECT count(*) FROM sc) AS BIGINT) AS n_sample_cust,
       CAST(j.n AS BIGINT)                        AS n_sample_join,
       CAST(j.n * 16 AS BIGINT)                   AS est_join,
       CAST(t.n AS BIGINT)                        AS true_join,
       CAST(abs(j.n * 16 - t.n) * 1000000 // t.n AS BIGINT) AS err_ppm
FROM j, t
"""


@query("q294_coordinated_sample_join", sql=_COORD_SQL)
def q294_coordinated_sample_join(sf_dir: str):
    """Coordinated Bernoulli key sampling for join-size estimation:
    BOTH sides keep a key iff md5(custkey) % 16 == 0 (the q47/q60
    md5_number_lower convention), so the sample of the join IS the
    join of the samples (inclusion is a pure key function — the
    estimator is unbiased with rate 1/16 on the KEY domain, unlike
    independent row sampling which needs 1/256).  Complements q164's
    NDV-formula audit with the sampling-based estimator.  Samples are
    filtered AT the scan; only 1/16 of keys ever shuffle.  Output: one
    audit row (counts, est_join = n_sample_join*16, true_join,
    err_ppm)."""
    from texrex_ray.functions.hashing import md5_lower64

    def keep(t: pa.Table, col: str) -> pa.Table:
        h = md5_lower64([str(int(x)) for x in t[col].to_pylist()])
        return t.filter(pa.array(h % np.uint64(COORD_SAMPLE_MOD) == 0))

    so = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: keep(t, "o_custkey"), batch_format="pyarrow"
    )
    sc = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: keep(t, "c_custkey"), batch_format="pyarrow"
    )
    n_so = so.count()
    # customer keys are unique: broadcast the sampled-key set, count
    # sampled orders whose custkey is in it (the joined sample), and
    # get the true join size from per-key order counts x key presence
    sc_keys = set(sc.to_pandas()["c_custkey"].tolist())
    keys_ref = ray.put(np.fromiter(sc_keys, dtype=np.int64, count=len(sc_keys)))

    def join_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(np.isin(ck, ks).sum())], pa.int64())})

    n_sj = int(so.map_batches(join_partial, batch_format="pyarrow").sum("n"))
    # true join size: orders joined to (unique-key) customer = orders
    # whose custkey exists in customer
    cust = _read(sf_dir, "customer", ["c_custkey"]).to_pandas()
    all_ref = ray.put(cust["c_custkey"].to_numpy().astype(np.int64))

    def true_partial(t: pa.Table) -> pa.Table:
        ks = ray.get(all_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(np.isin(ck, ks).sum())], pa.int64())})

    true_join = int(
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(true_partial, batch_format="pyarrow")
        .sum("n")
    )
    est = n_sj * COORD_SAMPLE_MOD
    return pd.DataFrame(
        {
            "n_sample_ord": [n_so],
            "n_sample_cust": [len(sc_keys)],
            "n_sample_join": [n_sj],
            "est_join": [est],
            "true_join": [true_join],
            "err_ppm": [abs(est - true_join) * 1_000_000 // true_join],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Longest repeated substring (q295)
# --------------------------------------------------------------------------

_LRS_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/lrs_sf0.01.parquet'))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(lrs) AS BIGINT) AS sum_lrs,
       CAST(MAX(lrs) AS BIGINT) AS max_lrs,
       CAST(SUM(lrs * 1000 // n_chars) AS BIGINT) AS sum_ratio_milli
FROM f GROUP BY lang ORDER BY lang
"""


@query("q295_longest_repeat", sql=_LRS_SQL)
def q295_longest_repeat(sf_dir: str):
    """Longest repeated substring per document (suffix-array adjacent
    LCP max, functions/complexity.py) — internal-duplication signal:
    a high lrs/n ratio marks copy-pasted blocks inside one page that
    near-dup passes (which compare ACROSS docs) never see.  Doc-local;
    language-sized aggregates shuffle.  Oracle: committed fixture from
    the INDEPENDENT binary-search + rolling-l-gram-set twin.  Output:
    (lang, n_docs, sum_lrs, max_lrs, sum_ratio_milli)."""
    from texrex_ray.functions.complexity import longest_repeated_substring

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        ls = [longest_repeated_substring(s) for s in texts]
        df = pd.DataFrame(
            {
                "lang": langs,
                "l": ls,
                "ratio": [l * 1000 // len(s) for l, s in zip(ls, texts)],
            }
        )
        g = df.groupby("lang").agg(
            n_docs=("l", "size"), sum_lrs=("l", "sum"), max_lrs=("l", "max"),
            sum_ratio_milli=("ratio", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_lrs", alias_name="sum_lrs"),
            Max("max_lrs", alias_name="max_lrs"),
            Sum("sum_ratio_milli", alias_name="sum_ratio_milli"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_lrs", "max_lrs", "sum_ratio_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Greedy interval scheduling (q296)
# --------------------------------------------------------------------------

SESSION_US = 1_800_000_000  # each event claims a 30-min slot

_INTSCHED_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/intsched_sf0.01.parquet'))
SELECT CAST(n_selected AS BIGINT) AS n_selected,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS sum_events
FROM f GROUP BY n_selected ORDER BY n_selected
"""


@query("q296_interval_scheduling", sql=_INTSCHED_SQL)
def q296_interval_scheduling(sf_dir: str):
    """Maximum non-overlapping 30-min sessions per user — the
    earliest-finish greedy (provably optimal for interval scheduling):
    scan a user's events by (end, start), keep each whose start >= the
    last kept end.  The attention-capacity bound behind engagement
    dedup: n_selected counts DISTINCT attention slots, where raw event
    counts double-bill bursts.  ONE user-keyed exchange; per-group
    vectorized scan.  Oracle: committed fixture from the INDEPENDENT
    O(n log n) DP twin (sort by end + bisect over predecessors).
    Output histogram: (n_selected, n_users, sum_events)."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        st = np.sort(g["ts"].astype("int64").to_numpy())
        last_end = -1
        n_sel = 0
        for s in st.tolist():
            if s >= last_end:
                n_sel += 1
                last_end = s + SESSION_US
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(st)],
                "n_selected": [n_sel],
            }
        )

    per_user = (
        ev.groupby("user_id").map_groups(pick, batch_format="pandas")
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_selected").agg(
            n_users=("user_id", "size"), sum_events=("n_events", "sum")
        ).reset_index()
        return g

    out = (
        per_user.map_batches(hist, batch_format="pandas")
        .groupby("n_selected")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("sum_events", alias_name="sum_events"))
        .to_pandas()
        .sort_values("n_selected")
        .reset_index(drop=True)
    )
    for c in ("n_selected", "n_users", "sum_events"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Distinct substring count via suffix automaton (q297)
# --------------------------------------------------------------------------

_DSUB_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/dsub_sf0.01.parquet'))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct,
       CAST(SUM(n_distinct * 1000 // (n_chars * (n_chars + 1) // 2))
            AS BIGINT) AS sum_fill_milli
FROM f GROUP BY lang ORDER BY lang
"""


@query("q297_distinct_substrings", sql=_DSUB_SQL)
def q297_distinct_substrings(sf_dir: str):
    """Distinct-substring count per document via a LINEAR suffix
    automaton (Blumer et al. 1985; sum of len(v)-len(link(v)))
    (functions/complexity.py::distinct_substrings) — the saturation
    counterpart to q289's LZ76: fill = distinct/(n(n+1)/2) approaches
    1 for incompressible text, collapses for templates.  Doc-local
    linear scan.  Oracle: committed fixture from the INDEPENDENT
    suffix-array twin (n(n+1)/2 - sum adjacent LCP).  Output: (lang,
    n_docs, sum_distinct, sum_fill_milli)."""
    from texrex_ray.functions.complexity import distinct_substrings

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        ds_ = [distinct_substrings(s) for s in texts]
        df = pd.DataFrame(
            {
                "lang": langs,
                "d": ds_,
                "fill": [
                    d * 1000 // (len(s) * (len(s) + 1) // 2)
                    for d, s in zip(ds_, texts)
                ],
            }
        )
        g = df.groupby("lang").agg(
            n_docs=("d", "size"), sum_distinct=("d", "sum"),
            sum_fill_milli=("fill", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_distinct", alias_name="sum_distinct"),
            Sum("sum_fill_milli", alias_name="sum_fill_milli"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_distinct", "sum_fill_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Haar wavelet band energy (q298)
# --------------------------------------------------------------------------

_HAAR_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/haar_fixture.parquet'))
SELECT fmt, band, CAST(count(*) AS BIGINT) AS n_images,
       CAST(SUM(energy) AS BIGINT) AS sum_energy,
       CAST(MAX(energy) AS BIGINT) AS max_energy
FROM f GROUP BY fmt, band ORDER BY fmt, band
"""


@query("q298_haar_energy", sql=_HAAR_SQL)
def q298_haar_energy(sf_dir: str):
    """2-level integer Haar band energies per image (stages/
    images.py::HaarEnergy) — multi-resolution texture profile: flat
    graphics pile energy into LL2, photographs spread it across
    LH/HL/HH; the frequency-domain complement to q283's orientation
    histogram.  Unnormalized +-sums of 2x2 blocks, exact int64 squares;
    7 scalar rows per image shuffle.  Oracle: committed fixture from
    the INDEPENDENT per-pixel nested-loop twin.  Output: (fmt, band,
    n_images, sum_energy, max_energy)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import HaarEnergy

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    rows = ds.map_batches(
        HaarEnergy, concurrency=2, batch_size=64, batch_format="pyarrow"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["fmt", "band"])["energy"]
        return pd.DataFrame(
            {"n_images": g.size(), "sum_energy": g.sum(),
             "max_energy": g.max()}
        ).reset_index()

    out = (
        rows.map_batches(partial, batch_format="pandas")
        .groupby(["fmt", "band"])
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_energy", alias_name="sum_energy"),
            Max("max_energy", alias_name="max_energy"),
        )
        .to_pandas()
        .sort_values(["fmt", "band"])
        .reset_index(drop=True)
    )
    for c in ("n_images", "sum_energy", "max_energy"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Density core-point census over quantized embeddings (q299)
# --------------------------------------------------------------------------

DENSITY_RADIUS_SQ = 1_400_000  # milli-quantized L2^2 threshold
DENSITY_MIN_PTS = 5            # neighbors (excluding self) for a core

_DENSITY_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/density_sf0.01.parquet'))
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN n_neighbors >= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_core,
       CAST(SUM(n_neighbors) AS BIGINT) AS sum_neighbors,
       CAST(MAX(n_neighbors) AS BIGINT) AS max_neighbors
FROM f GROUP BY label ORDER BY label
"""


@query("q299_density_core_census", sql=_DENSITY_SQL)
def q299_density_core_census(sf_dir: str):
    """DBSCAN-style core-point census over embeddings: per vector, the
    count of OTHER vectors within integer L2^2 radius after milli-unit
    quantization (q = round(v*1000): 64-dim dots <= 64e6, EXACT in
    float64 matmul — no float ambiguity), cores have >= 5.  The density
    signal behind semantic-dedup clustering: cores mark over-sampled
    semantic neighborhoods.  Plan: quantized matrix broadcast once
    (ray.put), each batch computes one block x corpus distance matmul —
    at page scale swap the broadcast for the LSH/IVF prefilter
    (dedup/embed.py) as documented there.  Oracle: committed fixture
    from the INDEPENDENT scalar per-pair loop twin.  Output: (label,
    n_vecs, n_core, sum_neighbors, max_neighbors)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    all_df = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    q = np.rint(np.asarray(list(all_df["embedding"]), dtype=np.float64)
                * 1000.0).astype(np.float64)
    norms = (q * q).sum(axis=1)
    ref = ray.put((q, norms))

    def count_neighbors(t: pa.Table) -> pa.Table:
        corpus, cn = ray.get(ref)
        block = np.rint(
            np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
        )
        bn = (block * block).sum(axis=1)
        # L2^2 = |a|^2 + |b|^2 - 2ab, all integer-valued float64
        d2 = bn[:, None] + cn[None, :] - 2.0 * (block @ corpus.T)
        within = (d2 <= float(DENSITY_RADIUS_SQ)).sum(axis=1) - 1  # self
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": t["label"],
                "n_neighbors": pa.array(within.astype(np.int64), pa.int64()),
            }
        )

    per_vec = emb.map_batches(count_neighbors, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label")["n_neighbors"]
        return pd.DataFrame(
            {
                "n_vecs": g.size(),
                "n_core": df.groupby("label")["n_neighbors"]
                .apply(lambda s: int((s >= DENSITY_MIN_PTS).sum())),
                "sum_neighbors": g.sum(),
                "max_neighbors": g.max(),
            }
        ).reset_index()

    out = (
        per_vec.map_batches(partial, batch_format="pandas")
        .groupby("label")
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("n_core", alias_name="n_core"),
            Sum("sum_neighbors", alias_name="sum_neighbors"),
            Max("max_neighbors", alias_name="max_neighbors"),
        )
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for c in ("label", "n_vecs", "n_core", "sum_neighbors", "max_neighbors"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Double-sweep BFS diameter bound (q300)
# --------------------------------------------------------------------------

_DIAM_SQL = """
SELECT start_node, CAST(ecc_start AS BIGINT) AS ecc_start,
       peak_node, CAST(ecc_peak AS BIGINT) AS ecc_peak,
       CAST(n_reached AS BIGINT) AS n_reached,
       CAST(n_nodes AS BIGINT) AS n_nodes
FROM read_parquet('/root/repo/tests/fixtures/oracle/diameter_fixture.parquet')
"""


@query("q300_diameter_bound", sql=_DIAM_SQL)
def q300_diameter_bound(sf_dir: str):
    """Double-sweep BFS diameter lower bound of the undirected crawl
    graph: BFS from the lexicographically smallest node, then BFS from
    the farthest node found (ties -> lex-min); ecc_peak is the
    classic 2-sweep bound (exact on trees, near-exact on web graphs) —
    the hop-budget sizing input for frontier scheduling.  Plan:
    adjacency built ONCE (kcore-style exchange); each BFS level is one
    map over adjacency with the frontier broadcast; level count =
    eccentricity (~tens).  Oracle: committed fixture from the
    INDEPENDENT deque-BFS twin.  Output: one row."""
    from texrex_ray.ops.graph import double_sweep

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    r = double_sweep(edges)
    return pd.DataFrame([r])[
        ["start_node", "ecc_start", "peak_node", "ecc_peak",
         "n_reached", "n_nodes"]
    ]


# --------------------------------------------------------------------------
# Lindley queue waits (q301)
# --------------------------------------------------------------------------

LINDLEY_SERVICE_US = 120_000_000  # fixed 2-min service per event

_LINDLEY_SQL = """
WITH a AS (
  SELECT event_type, epoch_us(ts) AS at,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS k
  FROM events
),
u AS (
  SELECT event_type, at, k,
         at - k * 120000000 AS uu
  FROM a
),
w AS (
  SELECT event_type,
         GREATEST(0, MAX(uu) OVER (PARTITION BY event_type ORDER BY k
                                   ROWS UNBOUNDED PRECEDING) - uu) AS wait
  FROM u
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_arrivals,
       CAST(SUM(CASE WHEN wait > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_delayed,
       CAST(SUM(wait) AS BIGINT) AS sum_wait_us,
       CAST(MAX(wait) AS BIGINT) AS max_wait_us
FROM w GROUP BY event_type ORDER BY event_type
"""


@query("q301_lindley_queue", sql=_LINDLEY_SQL)
def q301_lindley_queue(sf_dir: str):
    """Single-server queue waits per event type via the Lindley
    recursion W_{k+1} = max(0, W_k + S - gap_k) with fixed service
    S = 2 min — the backpressure model for a fetch/decode worker fed by
    this arrival stream: n_delayed and max_wait tell you whether ONE
    worker keeps up and how deep the buffer must be.  Closed form
    W_k = max(0, runmax_j<=k(U_j) - U_k) with U_j = A_j - j*S turns
    the recursion into a prefix max — vectorized per type in
    map_groups AND expressible as a pure-SQL window (the oracle; no
    fixture).  Order: (ts, event_id).  Output: (event_type,
    n_arrivals, n_delayed, sum_wait_us, max_wait_us)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "event_id"])

    def waits(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        at = g["ts"].astype("int64").to_numpy()
        k = np.arange(1, len(at) + 1, dtype=np.int64)
        u = at - k * LINDLEY_SERVICE_US
        w = np.maximum(np.maximum.accumulate(u) - u, 0)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_arrivals": [len(at)],
                "n_delayed": [int((w > 0).sum())],
                "sum_wait_us": [int(w.sum())],
                "max_wait_us": [int(w.max()) if len(w) else 0],
            }
        )

    out = (
        ev.groupby("event_type")
        .map_groups(waits, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_arrivals", "n_delayed", "sum_wait_us", "max_wait_us"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Longest increasing subsequence per user (q302)
# --------------------------------------------------------------------------

_LIS_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/lis_sf0.01.parquet'))
SELECT CAST(lis_len AS BIGINT) AS lis_len,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS sum_events
FROM f GROUP BY lis_len ORDER BY lis_len
"""


@query("q302_lis_per_user", sql=_LIS_SQL)
def q302_lis_per_user(sf_dir: str):
    """Longest STRICTLY increasing subsequence of each user's
    value-cents stream (ordered by ts, event_id) via patience sorting
    (O(n log n) bisect on pile tops) — the monotone-trend depth that
    rank correlations blur: a long LIS certifies a sustained escalation
    path.  ONE user-keyed exchange; per-group bisect scan.  Oracle:
    committed fixture from the INDEPENDENT O(n^2) DP twin.  Output
    histogram: (lis_len, n_users, sum_events)."""
    import bisect

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id", "value"])

    def lis(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        vals = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        tops: list[int] = []
        for v in vals.tolist():
            i = bisect.bisect_left(tops, v)
            if i == len(tops):
                tops.append(v)
            else:
                tops[i] = v
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(vals)],
                "lis_len": [len(tops)],
            }
        )

    per_user = ev.groupby("user_id").map_groups(lis, batch_format="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lis_len").agg(
            n_users=("user_id", "size"), sum_events=("n_events", "sum")
        ).reset_index()

    out = (
        per_user.map_batches(hist, batch_format="pandas")
        .groupby("lis_len")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("sum_events", alias_name="sum_events"))
        .to_pandas()
        .sort_values("lis_len")
        .reset_index(drop=True)
    )
    for c in ("lis_len", "n_users", "sum_events"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Belady OPT vs LRU cache replay (q303)
# --------------------------------------------------------------------------

CACHE_SIZES = (4, 8, 16, 32)

_BELADY_SQL = """
SELECT CAST(cache_size AS BIGINT) AS cache_size,
       CAST(n_accesses AS BIGINT) AS n_accesses,
       CAST(lru_hits AS BIGINT) AS lru_hits,
       CAST(opt_hits AS BIGINT) AS opt_hits
FROM read_parquet('/root/repo/tests/fixtures/oracle/belady_sf0.01.parquet')
ORDER BY cache_size
"""


@query("q303_belady_vs_lru", sql=_BELADY_SQL)
def q303_belady_vs_lru(sf_dir: str):
    """Offline-optimal (Belady) vs LRU hit counts on the user-access
    stream at several cache sizes — the headroom audit for q268's
    miss-ratio curve: opt_hits - lru_hits is what a smarter eviction
    could still win.  OPT evicts the resident key with the farthest
    next use (never-again first, ties -> largest key).  Plan: the
    (ts, event_id) sort is distributed; the replay is one
    constant-memory scan per cache size over the stream — at 100 TB
    replay the SHARDS-sampled substream exactly as q268 does.  Oracle:
    committed fixture from the INDEPENDENT twin (OrderedDict LRU +
    next-use-chain OPT; the query uses array scans).  Output:
    (cache_size, n_accesses, lru_hits, opt_hits)."""
    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id"])
    trace = (
        ev.sort(["ts", "event_id"])
        .to_pandas()["user_id"]
        .to_numpy()
        .astype(np.int64)
    )
    n = len(trace)
    # next-use index per position (n = never again)
    nxt = np.full(n, n, dtype=np.int64)
    last: dict[int, int] = {}
    for i in range(n - 1, -1, -1):
        k = int(trace[i])
        nxt[i] = last.get(k, n)
        last[k] = i
    rows = []
    for cap in CACHE_SIZES:
        # LRU via recency stamps
        lru_hits = 0
        stamp: dict[int, int] = {}
        for i in range(n):
            k = int(trace[i])
            if k in stamp:
                lru_hits += 1
            elif len(stamp) >= cap:
                victim = min(stamp, key=lambda x: stamp[x])
                del stamp[victim]
            stamp[k] = i
        # OPT: resident -> its next use position, refreshed on access
        opt_hits = 0
        res: dict[int, int] = {}
        for i in range(n):
            k = int(trace[i])
            if k in res:
                opt_hits += 1
            elif len(res) >= cap:
                # farthest next use; ties (never again) -> largest key
                victim = max(res, key=lambda x: (res[x], x))
                del res[victim]
            res[k] = int(nxt[i])
        rows.append((cap, n, lru_hits, opt_hits))
    return pd.DataFrame(
        rows, columns=["cache_size", "n_accesses", "lru_hits", "opt_hits"]
    ).astype("int64")


# --------------------------------------------------------------------------
# DGIM sliding-window count sketch (q304)
# --------------------------------------------------------------------------

DGIM_WINDOW_US = 14 * 86_400_000_000  # last 14 days
DGIM_K = 2                            # max buckets per size


def _dgim_run(ts_list: list[int]) -> tuple[int, int, int]:
    """DGIM (Datar-Gionis-Indyk-Motwani 2002) over a time-based window:
    process 1-bits at timestamps ascending; buckets (size, rightmost
    ts), at most DGIM_K per size — on K+1, merge the OLDEST two into
    one of double size (rightmost ts of the newer); expire buckets
    with rightmost ts <= t_end - W.  Estimate = sum of all bucket
    sizes minus half the oldest (floor) — the classic <=50% bound on
    the oldest bucket's straddle.  Returns (estimate, n_buckets,
    oldest_size)."""
    buckets: list[tuple[int, int]] = []  # oldest first
    for t in ts_list:
        buckets.append((1, t))
        # cascade merges: scan sizes ascending
        size = 1
        while True:
            idx = [i for i, b in enumerate(buckets) if b[0] == size]
            if len(idx) <= DGIM_K:
                break
            i0, i1 = idx[0], idx[1]  # the two OLDEST of this size
            merged = (size * 2, buckets[i1][1])
            buckets = (
                buckets[:i0] + [merged] + buckets[i0 + 1:i1]
                + buckets[i1 + 1:]
            )
            size *= 2
    if not ts_list:
        return 0, 0, 0
    t_end = ts_list[-1]
    buckets = [b for b in buckets if b[1] > t_end - DGIM_WINDOW_US]
    if not buckets:
        return 0, 0, 0
    total = sum(b[0] for b in buckets)
    oldest = buckets[0][0]
    return total - oldest + oldest // 2 + (oldest % 2), len(buckets), oldest


_DGIM_SQL = """
WITH a AS (SELECT event_type, epoch_us(ts) AS t FROM events),
m AS (SELECT event_type, MAX(t) AS t_end FROM a GROUP BY event_type),
ex AS (
  SELECT a.event_type, CAST(count(*) AS BIGINT) AS exact_w
  FROM a JOIN m USING (event_type)
  WHERE a.t > m.t_end - 1209600000000
  GROUP BY a.event_type
),
f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/dgim_sf0.01.parquet'))
SELECT f.event_type, ex.exact_w, f.est_w, f.n_buckets, f.oldest_size
FROM f JOIN ex USING (event_type) ORDER BY f.event_type
"""


@query("q304_dgim_window_count", sql=_DGIM_SQL)
def q304_dgim_window_count(sf_dir: str):
    """DGIM sliding-window counting per event type: O(log^2 W) memory
    per counter instead of buffering the window — the constant-memory
    'events in the last 14 days' gauge a streaming collector keeps per
    key.  Window anchored at each TYPE's own last arrival.  Plan: per-type
    map_groups runs the bucket cascade over (ts)-sorted groups; the
    exact window count is ONE distributed filtered aggregate.  Oracle:
    exact side recomputed in SQL from raw events; sketch side from the
    committed INDEPENDENT deque-twin fixture.  Output: (event_type,
    exact_w, est_w, n_buckets, oldest_size); tests pin the DGIM bound
    |est-exact| <= oldest_size/2."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].astype("int64").to_numpy()).tolist()
        est, nb, oldest = _dgim_run(ts)
        exact = int(
            (np.asarray(ts) > ts[-1] - DGIM_WINDOW_US).sum()
        ) if ts else 0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "exact_w": [exact],
                "est_w": [est],
                "n_buckets": [nb],
                "oldest_size": [oldest],
            }
        )

    out = (
        ev.groupby("event_type")
        .map_groups(per_type, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("exact_w", "est_w", "n_buckets", "oldest_size"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Feature-hashing collision census (q305)
# --------------------------------------------------------------------------

FEATHASH_BUCKETS = 16

_FEATHASH_SQL = """
WITH tok AS (
  SELECT t AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE length(t) > 0
),
tc AS (SELECT token, count(*) AS occ FROM tok GROUP BY token),
tb AS (SELECT token, occ, md5_number_lower(token) % 16 AS b FROM tc),
bl AS (
  SELECT b, count(*) AS load, SUM(occ) AS occ_sum
  FROM tb GROUP BY b
)
SELECT CAST(load AS BIGINT) AS load,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(SUM(occ_sum) AS BIGINT) AS sum_occurrences
FROM bl GROUP BY load ORDER BY load
"""


@query("q305_feature_hash_census", sql=_FEATHASH_SQL)
def q305_feature_hash_census(sf_dir: str):
    """Hashing-trick collision census: vocabulary -> 16 buckets via
    md5 (the q47/q60 convention; bucket count sized to the synthetic
    vocab so collisions actually occur), histogram of bucket loads (distinct
    tokens per bucket) with the token-occurrence mass riding along —
    the audit that tells you how much feature mass a hashed
    vectorizer smears (buckets with load >= 2).  Plan: per-batch token
    counts -> ONE token-keyed exchange -> bucket-sized combine;
    pure-SQL oracle (string_split + md5_number_lower), no fixture.
    Output: (load, n_buckets, sum_occurrences)."""
    from texrex_ray.functions.hashing import md5_lower64

    docs = _read(sf_dir, "documents", ["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in txt.split(" "):
                if w:
                    cnt[w] = cnt.get(w, 0) + 1
        toks = list(cnt)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "occ": pa.array([cnt[w] for w in toks], pa.int64()),
            }
        )

    per_token = (
        docs.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("occ", alias_name="occ"))
    )

    def bucketize(t: pa.Table) -> pa.Table:
        b = (md5_lower64(t["token"].to_pylist())
             % np.uint64(FEATHASH_BUCKETS)).astype(np.int64)
        df = pd.DataFrame({"b": b, "occ": t["occ"].to_numpy()})
        g = df.groupby("b").agg(load=("occ", "size"),
                                occ_sum=("occ", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        per_token.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("load", alias_name="load"),
                   Sum("occ_sum", alias_name="occ_sum"))
        .to_pandas()
        .groupby("load")
        .agg(n_buckets=("b", "size"), sum_occurrences=("occ_sum", "sum"))
        .reset_index()
        .sort_values("load")
        .reset_index(drop=True)
    )
    for c in ("load", "n_buckets", "sum_occurrences"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Power-of-two-choices load balance (q306)
# --------------------------------------------------------------------------

P2C_BUCKETS = 64

_P2C_SQL = """
SELECT scheme, CAST(max_load AS BIGINT) AS max_load,
       CAST(nonempty AS BIGINT) AS nonempty,
       CAST(sum_sq AS BIGINT) AS sum_sq
FROM read_parquet('/root/repo/tests/fixtures/oracle/p2c_sf0.01.parquet')
ORDER BY scheme
"""


@query("q306_power_of_two_choices", sql=_P2C_SQL)
def q306_power_of_two_choices(sf_dir: str):
    """Balls-into-bins audit: place doc_ids (ascending — the placement
    ORDER is part of the spec) into 64 bins by (a) one hash and (b)
    the lesser-loaded of two hashes (Azar et al. 1994: exponential ->
    log-log max-load drop); md5-derived h1/h2, ties -> smaller bin.
    The shard-placement policy comparison for q209's hash ring.  The
    hashes compute distributed; the two-choice placement is a
    key-count-sized sequential fold (at scale: per-shard streams).
    Oracle: committed fixture from the INDEPENDENT array-walk twin.
    Output: (scheme, max_load, nonempty, sum_sq)."""
    from texrex_ray.functions.hashing import md5_lower64

    docs = _read(sf_dir, "documents", ["doc_id"])

    def hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h1 = (md5_lower64([f"{int(i)}:1" for i in ids])
              % np.uint64(P2C_BUCKETS)).astype(np.int64)
        h2 = (md5_lower64([f"{int(i)}:2" for i in ids])
              % np.uint64(P2C_BUCKETS)).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"],
             "h1": pa.array(h1), "h2": pa.array(h2)}
        )

    hdf = (
        docs.map_batches(hashes, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    single = np.bincount(hdf["h1"].to_numpy(), minlength=P2C_BUCKETS)
    loads = np.zeros(P2C_BUCKETS, dtype=np.int64)
    for a, b in zip(hdf["h1"].tolist(), hdf["h2"].tolist()):
        if loads[a] < loads[b] or (loads[a] == loads[b] and a <= b):
            loads[a] += 1
        else:
            loads[b] += 1
    rows = [
        ("p2c", int(loads.max()), int((loads > 0).sum()),
         int((loads ** 2).sum())),
        ("single", int(single.max()), int((single > 0).sum()),
         int((single ** 2).sum())),
    ]
    return pd.DataFrame(
        rows, columns=["scheme", "max_load", "nonempty", "sum_sq"]
    ).astype({"max_load": "int64", "nonempty": "int64", "sum_sq": "int64"})


# --------------------------------------------------------------------------
# Weighted interval scheduling DP (q307)
# --------------------------------------------------------------------------

_WIS_SQL = """
SELECT user_id, n_events, total_value_c, best_value_c
FROM read_parquet('/root/repo/tests/fixtures/oracle/wis_sf0.01.parquet')
ORDER BY user_id
"""


@query("q307_weighted_intervals", sql=_WIS_SQL)
def q307_weighted_intervals(sf_dir: str):
    """Maximum total VALUE of non-overlapping 30-min sessions per user
    (weighted interval scheduling) — where q296's unweighted greedy is
    provably optimal, the weighted case needs the classic DP
    dp[i] = max(dp[i-1], v_i + dp[pred(i)]); the revenue-capacity bound
    per user.  Vectorized: ends sorted, pred(i) via ONE searchsorted,
    then a linear fold.  ONE user-keyed exchange.  Oracle: committed
    fixture from the INDEPENDENT recursive-memo twin.  Output:
    (user_id, n_events, total_value_c, best_value_c)."""
    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id", "value"])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        st = g["ts"].astype("int64").to_numpy()
        val = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((st, st + SESSION_US))  # by end, then start
        st = st[order]
        val = val[order]
        ends = st + SESSION_US
        pred = np.searchsorted(ends, st, side="right")
        dp = np.zeros(len(st) + 1, dtype=np.int64)
        for i in range(1, len(st) + 1):
            take = val[i - 1] + dp[pred[i - 1]]
            dp[i] = dp[i - 1] if dp[i - 1] >= take else take
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(st)],
                "total_value_c": [int(val.sum())],
                "best_value_c": [int(dp[-1])],
            }
        )

    out = (
        ev.groupby("user_id")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "n_events", "total_value_c", "best_value_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Merkle tree root (q308)
# --------------------------------------------------------------------------

def _merkle_root(leaves: list[bytes]) -> tuple[str, int]:
    """Iterative Merkle fold: blake2b-16 of left+right per pair, an odd
    trailing node promotes UNCHANGED; returns (root hex, depth)."""
    import hashlib

    if not leaves:
        return "", 0
    level = list(leaves)
    depth = 0
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(hashlib.blake2b(level[i] + level[i + 1],
                                       digest_size=16).digest())
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
        depth += 1
    return level[0].hex(), depth


_MERKLE_SQL = """
SELECT CAST(n_leaves AS BIGINT) AS n_leaves,
       CAST(depth AS BIGINT) AS depth, root_hex
FROM read_parquet('/root/repo/tests/fixtures/oracle/merkle_sf0.01.parquet')
"""


@query("q308_merkle_root", sql=_MERKLE_SQL)
def q308_merkle_root(sf_dir: str):
    """Merkle root of the corpus (leaves = md5(text) in doc_id order,
    blake2b-16 internal nodes, odd node promoted) — the tamper-evident
    counterpart to q275's CRC ledger: a replica can verify any single
    document against the root with a log-depth proof instead of
    re-hashing the corpus.  Leaf hashing is distributed; the fold runs
    on the leaf-digest vector (16 bytes/doc — at 10^9 docs, fold
    per-shard subtrees and combine the log-sized crowns).  Oracle:
    committed fixture from the INDEPENDENT recursive-halving twin.
    Output: (n_leaves, depth, root_hex)."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def leaf(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(
                    [hashlib.md5(s.encode()).digest()
                     for s in t["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    ld = (
        docs.map_batches(leaf, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    leaves = [bytes(b) for b in ld["h"]]
    root, depth = _merkle_root(leaves)
    return pd.DataFrame(
        {"n_leaves": [len(leaves)], "depth": [depth], "root_hex": [root]}
    ).astype({"n_leaves": "int64", "depth": "int64"})


# --------------------------------------------------------------------------
# Content-defined chunking dedup (q309)
# --------------------------------------------------------------------------

CDC_WINDOW = 8
CDC_BASE = 257        # rolling polynomial base (mod 2^64)
CDC_MASK_MOD = 64     # boundary when window hash % 64 == 0

_CDC_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/cdc_sf0.01.parquet')),
d AS (SELECT chunk_md5, count(*) AS occ, MIN(chunk_len) AS clen
      FROM f GROUP BY chunk_md5)
SELECT CAST(SUM(occ) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(SUM(occ - 1) AS BIGINT) AS dup_chunks,
       CAST(SUM((occ - 1) * clen) AS BIGINT) AS dup_chars
FROM d
"""


@query("q309_cdc_dedup", sql=_CDC_SQL)
def q309_cdc_dedup(sf_dir: str):
    """Content-defined chunking (the rsync/borg primitive) over
    documents: split after every position whose 8-byte rolling
    polynomial hash (base 257 mod 2^64) is divisible by 64 — boundaries
    move WITH content, so an insertion only re-chunks its neighborhood
    (fixed-size blocks would shift every later block) — then count
    duplicate chunks corpus-wide: the storage-dedup win estimate.
    Boundary set is a pure per-position function (no min-length state),
    so chunking is embarrassingly parallel; ONE chunk-hash-keyed
    exchange counts occurrences.  Oracle: committed fixture of per-doc
    chunks from the INDEPENDENT scalar Python-int rolling twin, dedup
    aggregates recomputed in SQL.  Output: (n_chunks, n_distinct,
    dup_chunks, dup_chars)."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        hs, ls = [], []
        pw = np.array(
            [pow(CDC_BASE, CDC_WINDOW - 1 - j, 1 << 64)
             for j in range(CDC_WINDOW)],
            dtype=np.uint64,
        )
        for txt in t["text"].to_pylist():
            b = np.frombuffer(txt.encode(), dtype=np.uint8)
            n = len(b)
            if n < CDC_WINDOW:
                cuts = [n]
            else:
                w = np.lib.stride_tricks.sliding_window_view(b, CDC_WINDOW)
                with np.errstate(over="ignore"):
                    h = (w.astype(np.uint64) * pw[None, :]).sum(axis=1)
                # position i = window END index (i + CDC_WINDOW - 1)
                ends = np.flatnonzero(h % np.uint64(CDC_MASK_MOD) == 0) \
                    + CDC_WINDOW
                cuts = sorted(set(ends.tolist()) | {n})
            prev = 0
            raw = txt.encode()
            for c in cuts:
                if c > prev:
                    piece = raw[prev:c]
                    hs.append(hashlib.md5(piece).hexdigest())
                    ls.append(len(piece))
                    prev = c
        return pa.table(
            {
                "chunk_md5": pa.array(hs, pa.string()),
                "chunk_len": pa.array(ls, pa.int64()),
                "one": pa.array([1] * len(hs), pa.int64()),
            }
        )

    per_hash = (
        docs.map_batches(chunks, batch_format="pyarrow")
        .groupby("chunk_md5")
        .aggregate(Sum("one", alias_name="occ"),
                   Min("chunk_len", alias_name="clen"))
        .to_pandas()
    )
    occ = per_hash["occ"].astype("int64")
    clen = per_hash["clen"].astype("int64")
    return pd.DataFrame(
        {
            "n_chunks": [int(occ.sum())],
            "n_distinct": [len(per_hash)],
            "dup_chunks": [int((occ - 1).sum())],
            "dup_chars": [int(((occ - 1) * clen).sum())],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Max s-t flow / edge connectivity (q310)
# --------------------------------------------------------------------------

_MAXFLOW_SQL = """
SELECT s_node, t_node, CAST(max_flow AS BIGINT) AS max_flow
FROM read_parquet('/root/repo/tests/fixtures/oracle/maxflow_fixture.parquet')
"""


@query("q310_maxflow", sql=_MAXFLOW_SQL)
def q310_maxflow(sf_dir: str):
    """Edge-disjoint path count (unit-capacity max s-t flow = s-t edge
    connectivity, Menger) between q300's two sweep endpoints — the
    redundancy audit: how many independent routes survive link loss.
    Edge canonicalization is distributed; Edmonds-Karp augmentation
    runs on the edge-sized residual graph (driver plan, ego-radius cap
    documented for page scale).  The flow VALUE is unique, so the
    oracle fixture runs DINIC (a different algorithm) and must agree.
    Output: (s_node, t_node, max_flow)."""
    from texrex_ray.ops.graph import maxflow_int

    dm = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/diameter_fixture.parquet"
    ).iloc[0]
    s, t = str(dm["start_node"]), str(dm["peak_node"])
    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    f = maxflow_int(edges, s, t)
    return pd.DataFrame(
        {"s_node": [s], "t_node": [t], "max_flow": [f]}
    ).astype({"max_flow": "int64"})


# --------------------------------------------------------------------------
# Maximum bipartite matching (q311)
# --------------------------------------------------------------------------

_MATCHING_SQL = """
SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(n_parts AS BIGINT) AS n_parts,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(matching AS BIGINT) AS matching
FROM read_parquet('/root/repo/tests/fixtures/oracle/matching_sf0.01.parquet')
"""


@query("q311_bipartite_matching", sql=_MATCHING_SQL)
def q311_bipartite_matching(sf_dir: str):
    """Maximum supplier-part matching over the distinct (l_suppkey,
    l_partkey) bipartite graph — the one-part-per-supplier assignment
    capacity (how many parts can ship simultaneously if each supplier
    handles one): Hopcroft-Karp on the deduped edge list.  The SIZE is
    unique (Koenig), so the fixture twin runs plain Kuhn augmentation.
    Edge dedup is ONE distributed exchange; matching runs on the
    distinct-edge-sized graph.  Output: (n_suppliers, n_parts,
    n_edges, matching)."""
    import sys

    from texrex_ray.ops.graph import hopcroft_karp

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs_df = (
        li.map_batches(dedup, batch_format="pandas")
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    pairs = [(f"s{int(s)}", f"p{int(p)}")
             for s, p in zip(pairs_df["l_suppkey"], pairs_df["l_partkey"])]
    sys.setrecursionlimit(max(10_000, 4 * len(pairs)))
    m = hopcroft_karp(pairs)
    return pd.DataFrame(
        {
            "n_suppliers": [len({a for a, _ in pairs})],
            "n_parts": [len({b for _, b in pairs})],
            "n_edges": [len(pairs)],
            "matching": [m],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Selinger join-order DP (q312)
# --------------------------------------------------------------------------

_SELINGER_SQL = """
SELECT best_order, CAST(best_cost AS BIGINT) AS best_cost,
       worst_order, CAST(worst_cost AS BIGINT) AS worst_cost,
       CAST(n_valid_orders AS BIGINT) AS n_valid_orders
FROM read_parquet('/root/repo/tests/fixtures/oracle/selinger_sf0.01.parquet')
"""

# join graph: customer-orders (custkey), orders-lineitem (orderkey),
# customer-nation (nationkey)
_SEL_TABLES = ("c", "l", "n", "o")
_SEL_PREDS = {frozenset("co"), frozenset("ol"), frozenset("cn")}


def _sel_connected(sub: frozenset) -> bool:
    if len(sub) <= 1:
        return True
    seen = {next(iter(sub))}
    grew = True
    while grew:
        grew = False
        for t in sub - seen:
            if any(frozenset((t, s)) in _SEL_PREDS for s in seen):
                seen.add(t)
                grew = True
    return seen == sub


@query("q312_selinger_join_order", sql=_SELINGER_SQL)
def q312_selinger_join_order(sf_dir: str):
    """Selinger (System R 1979) left-deep join-order DP over
    {customer, orders, lineitem, nation} with cost = SUM of EXACT
    intermediate join cardinalities (cross products forbidden) — the
    optimizer audit run against TRUE sizes instead of estimates, the
    ground truth q164's estimate audit compares against.  Every
    connected-subset cardinality is ONE distributed broadcast-membership
    count (np.isin against ray.put key sets); the DP itself is
    16-subset-sized.  Tie-break: lexicographic order string.  Oracle:
    committed fixture from the INDEPENDENT full-permutation-enumeration
    twin with pandas-merge cardinalities.  Output: (best_order,
    best_cost, worst_order, worst_cost, n_valid_orders)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    cust_keys = ray.put(cust["c_custkey"].to_numpy().astype(np.int64))
    nat_ok_cust = ray.put(
        cust.loc[cust["c_nationkey"].isin(set(nat["n_nationkey"])),
                 "c_custkey"].to_numpy().astype(np.int64)
    )

    def count_in(ds, col, ref):
        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            v = t[col].to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int(np.isin(v, ks).sum())],
                                           pa.int64())})

        return int(ds.map_batches(f, batch_format="pyarrow").sum("n"))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    co = count_in(orders, "o_custkey", cust_keys)          # |c ⋈ o|
    ol = int(li.count())                                   # |o ⋈ l| (FK)
    cn = int(cust["c_nationkey"].isin(set(nat["n_nationkey"])).sum())
    # orders whose cust exists AND cust's nation exists
    con = count_in(orders, "o_custkey", nat_ok_cust)
    # lineitems whose order's cust exists: broadcast the joined orderkeys
    odf = orders.to_pandas()
    ok_orders = ray.put(
        odf.loc[odf["o_custkey"].isin(set(cust["c_custkey"])),
                "o_orderkey"].to_numpy().astype(np.int64)
    )
    col_ = count_in(li, "l_orderkey", ok_orders)
    full_ok = ray.put(
        odf.loc[odf["o_custkey"].isin(
            set(cust.loc[cust["c_nationkey"].isin(set(nat["n_nationkey"])),
                         "c_custkey"])),
                "o_orderkey"].to_numpy().astype(np.int64)
    )
    conl = count_in(li, "l_orderkey", full_ok)
    card = {
        frozenset("co"): co, frozenset("ol"): ol, frozenset("cn"): cn,
        frozenset("col"): col_, frozenset("con"): con,
        frozenset("coln"): conl,
    }
    # DP over connected subsets, left-deep, no cross products
    from itertools import combinations

    best: dict = {}
    worst: dict = {}
    npaths: dict = {}
    for t in _SEL_TABLES:
        s = frozenset(t)
        best[s] = (0, t)
        worst[s] = (0, t)
        npaths[s] = 1
    for size in (2, 3, 4):
        for combo in combinations(_SEL_TABLES, size):
            s = frozenset(combo)
            if not _sel_connected(s) or s not in card:
                continue
            cands_b, cands_w, cnt = [], [], 0
            for t in sorted(s):
                rest = s - {t}
                if rest in best and _sel_connected(rest) and any(
                    frozenset((t, r)) in _SEL_PREDS for r in rest
                ):
                    cands_b.append((best[rest][0] + card[s],
                                    best[rest][1] + t))
                    cands_w.append((worst[rest][0] + card[s],
                                    worst[rest][1] + t))
                    cnt += npaths[rest]
            if cands_b:
                best[s] = min(cands_b)
                worst[s] = max(cands_w)
                npaths[s] = cnt
    full = frozenset(_SEL_TABLES)
    return pd.DataFrame(
        {
            "best_order": [best[full][1]],
            "best_cost": [best[full][0]],
            "worst_order": [worst[full][1]],
            "worst_cost": [worst[full][0]],
            "n_valid_orders": [npaths[full]],
        }
    ).astype({"best_cost": "int64", "worst_cost": "int64",
              "n_valid_orders": "int64"})


# --------------------------------------------------------------------------
# Bridges and articulation points (q313)
# --------------------------------------------------------------------------

_BRIDGES_SQL = """
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges_und AS BIGINT) AS n_edges_und,
       CAST(n_bridges AS BIGINT) AS n_bridges,
       CAST(n_articulation AS BIGINT) AS n_articulation
FROM read_parquet('/root/repo/tests/fixtures/oracle/bridges_fixture.parquet')
"""


@query("q313_bridges_articulation", sql=_BRIDGES_SQL)
def q313_bridges_articulation(sf_dir: str):
    """Single-point-of-failure census of the crawl graph: bridges
    (links whose loss disconnects) and articulation points (pages
    whose loss does) via iterative Tarjan low-link (ops/graph.py) —
    the structural complement to q173's hub-removal robustness.  Both
    sets are unique graph properties (DFS-order independent), so the
    fixture twin uses brute-force removal + component recount.  Edge
    canonicalization distributed; linear DFS on the edge-sized
    adjacency.  Output: one row."""
    from texrex_ray.ops.graph import bridges_articulation

    edges = ray.data.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    r = bridges_articulation(edges)
    return pd.DataFrame([r]).astype("int64")


# --------------------------------------------------------------------------
# Roaring-style container census (q314)
# --------------------------------------------------------------------------

ROAR_SPAN = 1024  # container id-span; array if 2*count < span/8 bytes

_ROARING_SQL = """
WITH cells AS (
  SELECT o_orderstatus AS status, o_orderkey // 1024 AS chunk,
         count(*) AS cnt
  FROM orders GROUP BY 1, 2
),
cls AS (
  SELECT status, chunk, cnt,
         CASE WHEN 2 * cnt < 128 THEN 2 * cnt ELSE 128 END AS bytes,
         CASE WHEN 2 * cnt < 128 THEN 1 ELSE 0 END AS is_array
  FROM cells
)
SELECT status, CAST(count(*) AS BIGINT) AS n_containers,
       CAST(SUM(is_array) AS BIGINT) AS n_array,
       CAST(count(*) - SUM(is_array) AS BIGINT) AS n_bitmap,
       CAST(SUM(bytes) AS BIGINT) AS bytes_total,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM cls GROUP BY status ORDER BY status
"""


@query("q314_roaring_census", sql=_ROARING_SQL)
def q314_roaring_census(sf_dir: str):
    """Roaring-bitmap container census for a value-index on
    o_orderstatus: per (value, 1024-id chunk), store the posting as a
    sorted ARRAY (2 bytes/id) when that beats the dense BITMAP
    (span/8 = 128 bytes), the Chambi et al. 2016 rule scaled to the
    chunk span — the storage planner's answer to 'how big is a bitmap
    index on this column'.  ONE (value, chunk)-keyed exchange; the
    classification is per-cell arithmetic.  Pure-SQL oracle.  Output:
    (status, n_containers, n_array, n_bitmap, bytes_total, n_rows)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "status": df["o_orderstatus"],
                    "chunk": df["o_orderkey"].astype("int64") // ROAR_SPAN,
                    "cnt": 1,
                }
            )
            .groupby(["status", "chunk"], as_index=False)
            .sum()
        )
        return g

    per_cell = (
        ds.map_batches(cells, batch_format="pandas")
        .groupby(["status", "chunk"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    bitmap_bytes = ROAR_SPAN // 8
    arr = 2 * per_cell["cnt"] < bitmap_bytes
    per_cell["bytes"] = np.where(arr, 2 * per_cell["cnt"], bitmap_bytes)
    per_cell["is_array"] = arr.astype(int)
    out = (
        per_cell.groupby("status")
        .agg(
            n_containers=("chunk", "size"),
            n_array=("is_array", "sum"),
            bytes_total=("bytes", "sum"),
            n_rows=("cnt", "sum"),
        )
        .reset_index()
        .sort_values("status")
        .reset_index(drop=True)
    )
    out["n_bitmap"] = out["n_containers"] - out["n_array"]
    out = out[["status", "n_containers", "n_array", "n_bitmap",
               "bytes_total", "n_rows"]]
    for c in ("n_containers", "n_array", "n_bitmap", "bytes_total", "n_rows"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# MATTR lexical diversity (q315)
# --------------------------------------------------------------------------

MATTR_WINDOW = 20

_MATTR_SQL = """
WITH dt AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, lang, unnest(toks) AS token,
         generate_subscripts(toks, 1) AS pos, len(toks) AS n_toks
  FROM dt
),
wins AS (
  SELECT s.doc_id, s.lang, s.pos AS w, t.token
  FROM tok s JOIN tok t
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.pos AND s.pos + 19
  WHERE s.pos <= s.n_toks - 19
),
perwin AS (
  SELECT doc_id, lang, w, count(DISTINCT token) AS d
  FROM wins GROUP BY doc_id, lang, w
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(SUM(d) AS BIGINT) AS sum_distinct,
       CAST(SUM(d) * 1000 // (20 * count(*)) AS BIGINT) AS mattr_milli
FROM perwin GROUP BY lang ORDER BY lang
"""


@query("q315_mattr", sql=_MATTR_SQL)
def q315_mattr(sf_dir: str):
    """MATTR (moving-average type-token ratio, Covington & McFall
    2010, window 20) per language — the length-invariant lexical-
    diversity measure plain TTR is not (TTR falls with doc length;
    MATTR's windows don't): the corpus-linguistics quality gauge next
    to q159's HHI.  Per-doc incremental sliding distinct count (one
    dict, O(tokens)); language-sized aggregates shuffle.  Pure-SQL
    oracle (window self-join + COUNT DISTINCT).  Output: (lang,
    n_windows, sum_distinct, mattr_milli)."""
    docs = _read(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        rows: dict[str, list[int]] = {}
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in txt.split(" ") if w]
            n = len(toks)
            acc = rows.setdefault(lang, [0, 0])
            if n < MATTR_WINDOW:
                continue
            cnt: dict[str, int] = {}
            distinct = 0
            s = 0
            for i, w in enumerate(toks):
                c = cnt.get(w, 0)
                if c == 0:
                    distinct += 1
                cnt[w] = c + 1
                if i >= MATTR_WINDOW:
                    old = toks[i - MATTR_WINDOW]
                    cnt[old] -= 1
                    if cnt[old] == 0:
                        distinct -= 1
                if i >= MATTR_WINDOW - 1:
                    acc[0] += 1
                    acc[1] += distinct
        langs = sorted(rows)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_windows": pa.array([rows[l][0] for l in langs], pa.int64()),
                "sum_distinct": pa.array([rows[l][1] for l in langs],
                                         pa.int64()),
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_windows", alias_name="n_windows"),
                   Sum("sum_distinct", alias_name="sum_distinct"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["mattr_milli"] = (
        out["sum_distinct"] * 1000 // (MATTR_WINDOW * out["n_windows"])
    )
    for c in ("n_windows", "sum_distinct", "mattr_milli"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Local-supplier volume (TPC-H Q5 shape) (q316)
# --------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"

_Q5_SQL = f"""
WITH f AS (SELECT n.n_name AS nation,
                  CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      // 100 AS vol_c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey
           WHERE c.c_nationkey = s.s_nationkey
             AND r.r_name = '{Q5_REGION}'
             AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
             AND o.o_orderdate <  TIMESTAMP '{Q5_DATE_HI}')
SELECT nation, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(vol_c) AS BIGINT) AS revenue_c
FROM f GROUP BY nation ORDER BY revenue_c DESC, nation
"""


@query("q316_local_supplier_volume", sql=_Q5_SQL)
def q316_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — revenue from orders where customer and
    supplier sit in the SAME nation (the cyclic join predicate that
    breaks naive join trees), nations restricted to one region, orders
    to one year.  Plan: the date filter prunes orders AT the scan;
    ONE shuffle_join joins the two fact tables; nation equality rides
    broadcast dimension maps (c_custkey -> nationkey, s_suppkey ->
    nationkey) compared per batch — the cycle costs NO extra exchange.
    Output: (nation, n_items, revenue_c)."""
    from texrex_ray.ops.join import broadcast_join, shuffle_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lo = pd.Timestamp(Q5_DATE_LO).value // 1000
    hi = pd.Timestamp(Q5_DATE_HI).value // 1000

    def date_filter(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                       pc.less(d, pa.scalar(hi)))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(
        nat.merge(reg[reg["r_name"] == Q5_REGION],
                  left_on="n_regionkey", right_on="r_regionkey")
        ["n_nationkey"]
    )
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))

    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                     expected_rows=li.count())
    j = broadcast_join(j, cust[["c_custkey", "c_nationkey"]],
                       on="o_custkey", right_on="c_custkey")
    j = broadcast_join(j, supp[["s_suppkey", "s_nationkey"]],
                       on="l_suppkey", right_on="s_suppkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["c_nationkey"] == df["s_nationkey"])
                & df["c_nationkey"].isin(asia)]
        if not len(df):
            return pd.DataFrame({"nation": [], "n_items": [], "vol_c": []})
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        df = df.assign(
            nation=df["c_nationkey"].map(nname),
            n_items=1,
            vol_c=price_c * (100 - disc_h) // 100,
        )
        return df.groupby("nation", as_index=False)[["n_items", "vol_c"]].sum()

    out = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("nation")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("vol_c", alias_name="revenue_c"))
        .to_pandas()
        .sort_values(["revenue_c", "nation"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for c in ("n_items", "revenue_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Shipping-priority top-k (TPC-H Q3 shape) (q317)
# --------------------------------------------------------------------------

Q3_DATE = "1997-07-01"
Q3_TOPK = 10

_Q3_SQL = f"""
WITH f AS (SELECT l.l_orderkey,
                  CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      // 100 AS vol_c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           WHERE o.o_orderdate < TIMESTAMP '{Q3_DATE}'
             AND l.l_shipdate > TIMESTAMP '{Q3_DATE}')
SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(vol_c) AS BIGINT) AS revenue_c
FROM f GROUP BY l_orderkey
ORDER BY revenue_c DESC, l_orderkey LIMIT {Q3_TOPK}
"""


@query("q317_shipping_priority", sql=_Q3_SQL)
def q317_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — top-{Q3_TOPK} unshipped orders by outstanding
    revenue at a cutoff date (ordered before, shipped after).  Plan:
    BOTH date predicates prune at the scans (the selective filters do
    the heavy lifting before any exchange); the surviving slice joins
    via broadcast of the filtered orderkey set (small after the
    filter), per-order partials combine, grouped top-k finishes.
    Output: (l_orderkey, n_items, revenue_c)."""
    cut = pd.Timestamp(Q3_DATE).value // 1000

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def ofilter(t: pa.Table) -> pa.Table:
        keep = pc.less(t["o_orderdate"].cast(pa.int64()), pa.scalar(cut))
        return t.filter(keep).select(["o_orderkey"])

    ok = ray.put(
        orders.map_batches(ofilter, batch_format="pyarrow")
        .to_pandas()["o_orderkey"].to_numpy().astype(np.int64)
    )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"].cast(pa.int64()), pa.scalar(cut))
        t = t.filter(keep)
        keys = ray.get(ok)
        ks = t["l_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(ks, keys)))
        df = t.to_pandas()
        if not len(df):
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64()),
                             "vol_c": pa.array([], pa.int64())})
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        df = df.assign(n_items=1, vol_c=price_c * (100 - disc_h) // 100)
        g = df.groupby("l_orderkey", as_index=False)[["n_items", "vol_c"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("vol_c", alias_name="revenue_c"))
        .to_pandas()
        .sort_values(["revenue_c", "l_orderkey"], ascending=[False, True])
        .head(Q3_TOPK)
        .reset_index(drop=True)
    )
    for c in ("l_orderkey", "n_items", "revenue_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Promo revenue share (TPC-H Q14 shape) (q318)
# --------------------------------------------------------------------------

Q14_LO = "1997-07-01"
Q14_HI = "1997-08-01"

_Q14_SQL = f"""
WITH f AS (SELECT p.p_type,
                  CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      // 100 AS vol_c
           FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
             AND l.l_shipdate <  TIMESTAMP '{Q14_HI}')
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol_c ELSE 0 END)
            AS BIGINT) AS promo_c,
       CAST(SUM(vol_c) AS BIGINT) AS total_c,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol_c ELSE 0 END)
            * 1000000 // SUM(vol_c) AS BIGINT) AS promo_ppm
FROM f
"""


@query("q318_promo_share", sql=_Q14_SQL)
def q318_promo_share(sf_dir: str):
    """TPC-H Q14 shape — share of one month's revenue from PROMO-type
    parts: the conditional-aggregate-over-a-join pattern every
    marketing dashboard runs.  Plan: the ship-date predicate prunes at
    the scan; part types ride ONE broadcast map (partkey -> is_promo);
    three integers leave each task.  Output: (n_items, promo_c,
    total_c, promo_ppm)."""
    lo = pd.Timestamp(Q14_LO).value // 1000
    hi = pd.Timestamp(Q14_HI).value // 1000
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = ray.put(
        part.loc[part["p_type"] == "PROMO", "p_partkey"]
        .to_numpy().astype(np.int64)
    )
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                       pc.less(d, pa.scalar(hi)))
        t = t.filter(keep)
        pk = ray.get(promo)
        ks = t["l_partkey"].to_numpy(zero_copy_only=False)
        is_promo = np.isin(ks, pk)
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_h = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vol = price_c * (100 - disc_h) // 100
        return pa.table(
            {
                "n_items": pa.array([len(vol)], pa.int64()),
                "promo_c": pa.array([int(vol[is_promo].sum())], pa.int64()),
                "total_c": pa.array([int(vol.sum())], pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("promo_c", alias_name="promo_c"),
                   Sum("total_c", alias_name="total_c"))
        .to_pandas()
    )
    n, p, tt = (int(agg["n_items"].iloc[0]), int(agg["promo_c"].iloc[0]),
                int(agg["total_c"].iloc[0]))
    return pd.DataFrame(
        {
            "n_items": [n],
            "promo_c": [p],
            "total_c": [tt],
            "promo_ppm": [p * 1_000_000 // tt],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Small-quantity-order revenue (TPC-H Q17 shape) (q319)
# --------------------------------------------------------------------------

Q17_BRAND = "Brand#2"

_Q17_SQL = f"""
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
st AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
         count(*) AS cnt
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  GROUP BY l_partkey
),
f AS (
  SELECT l.l_partkey, CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ep_c
  FROM lineitem l JOIN st ON l.l_partkey = st.l_partkey
  WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * st.cnt
        < st.sum_qty_c
)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(SUM(ep_c) AS BIGINT) AS revenue_c
FROM f
"""


@query("q319_small_qty_revenue", sql=_Q17_SQL)
def q319_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue from lineitems of one brand whose
    quantity is below 20% of that PART's average quantity: the
    correlated-aggregate pattern (per-key threshold computed from the
    same fact table), kept integer-exact by cross-multiplying the
    average away (qty_c * 5 * cnt < sum_qty_c).  Plan: brand filter
    broadcasts the partkey set; per-part (sum, count) is ONE keyed
    exchange whose result broadcasts back — the fact table never
    shuffles twice.  Output: (n_items, n_parts, revenue_c)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_keys = ray.put(
        part.loc[part["p_brand"] == Q17_BRAND, "p_partkey"]
        .to_numpy().astype(np.int64)
    )
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def brand_only(t: pa.Table) -> pa.Table:
        ks = ray.get(brand_keys)
        keep = np.isin(t["l_partkey"].to_numpy(zero_copy_only=False), ks)
        return t.filter(pa.array(keep))

    branded = li.map_batches(brand_only, batch_format="pyarrow")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty_c=np.round(df["l_quantity"] * 100).astype(np.int64), cnt=1
        )
        return df.groupby("l_partkey", as_index=False)[["qty_c", "cnt"]].sum()

    st = (
        branded.map_batches(stats, batch_format="pandas")
        .groupby("l_partkey")
        .aggregate(Sum("qty_c", alias_name="sum_qty_c"),
                   Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    st_ref = ray.put(
        {int(k): (int(s), int(c))
         for k, s, c in zip(st["l_partkey"], st["sum_qty_c"], st["cnt"])}
    )

    def below(t: pa.Table) -> pa.Table:
        stm = ray.get(st_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty_c = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ep_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = np.zeros(len(pk), dtype=bool)
        for i, k in enumerate(pk.tolist()):
            s, c = stm[k]
            keep[i] = qty_c[i] * 5 * c < s
        kept = pd.DataFrame({"pk": pk[keep], "ep": ep_c[keep]})
        g = kept.groupby("pk", as_index=False).agg(
            n_items=("ep", "size"), revenue_c=("ep", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        branded.map_batches(below, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_items": [int(agg["n_items"].sum())],
            "n_parts": [int((agg["n_items"] > 0).sum())],
            "revenue_c": [int(agg["revenue_c"].sum())],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Large-volume customers (TPC-H Q18 shape) (q320)
# --------------------------------------------------------------------------

Q18_QTY_C = 9_000  # HAVING sum(quantity) > 90.00 (cents scale)

_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > {Q18_QTY_C}
)
SELECT c.c_custkey, o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
       CAST(b.sum_qty_c AS BIGINT) AS sum_qty_c
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_c DESC, o_orderkey LIMIT 20
"""


@query("q320_large_volume_orders", sql=_Q18_SQL)
def q320_large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape — customers behind the largest-quantity orders:
    fact-side HAVING (per-order quantity sum over a threshold) feeding
    a dimension join and a top-k.  Plan: ONE orderkey-keyed exchange
    computes the sums; only qualifying orderkeys (a tiny set) ship to
    the driver to broadcast-join orders/customer; top-20 by
    (totalprice, orderkey).  Output: (c_custkey, o_orderkey,
    totalprice_c, sum_qty_c)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qsum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(q=np.round(df["l_quantity"] * 100).astype(np.int64))
        return df.groupby("l_orderkey", as_index=False)["q"].sum()

    sums = (
        li.map_batches(qsum, batch_format="pandas")
        .groupby("l_orderkey")
        .aggregate(Sum("q", alias_name="sum_qty_c"))
        .to_pandas()
    )
    big = sums[sums["sum_qty_c"] > Q18_QTY_C]
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"]).to_pandas()
    out = (
        big.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .assign(
            totalprice_c=lambda d: np.round(
                d["o_totalprice"] * 100).astype(np.int64)
        )
        .rename(columns={"o_custkey": "c_custkey"})
        .sort_values(["totalprice_c", "o_orderkey"],
                     ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )[["c_custkey", "o_orderkey", "totalprice_c", "sum_qty_c"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Order-priority EXISTS semi-join (TPC-H Q4 shape) (q321)
# --------------------------------------------------------------------------

Q4_LO = "1996-01-01"
Q4_HI = "1996-04-01"
Q4_LATE_DAYS = 60

_Q4_SQL = f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


@query("q321_priority_exists", sql=_Q4_SQL)
def q321_priority_exists(sf_dir: str):
    """TPC-H Q4 shape — orders per priority (one quarter) having AT
    LEAST ONE lineitem shipped more than {Q4_LATE_DAYS} days after the
    order date: the EXISTS semi-join with a cross-table predicate.
    Plan: quarter filter prunes orders at the scan; the (orderkey ->
    orderdate) map of the pruned quarter broadcasts; lineitem batches
    emit the DISTINCT late orderkeys they see (semi-join = set union,
    no row multiplication); the priority count runs on the order side.
    Output: (o_orderpriority, order_count)."""
    lo = pd.Timestamp(Q4_LO).value // 1000
    hi = pd.Timestamp(Q4_HI).value // 1000
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ofilter(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].astype("int64")
        return df[(d >= lo) & (d < hi)]

    odf = orders.map_batches(ofilter, batch_format="pandas").to_pandas()
    odate = ray.put(
        dict(zip(odf["o_orderkey"].astype(int),
                 odf["o_orderdate"].astype("int64").astype(int)))
    )
    late_us = Q4_LATE_DAYS * 86_400_000_000
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def late_keys(t: pa.Table) -> pa.Table:
        om = ray.get(odate)
        ks = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sd = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hit = set()
        for k, s in zip(ks.tolist(), sd.tolist()):
            od = om.get(k)
            if od is not None and s > od + late_us:
                hit.add(k)
        return pa.table({"k": pa.array(sorted(hit), pa.int64())})

    late = (
        li.map_batches(late_keys, batch_format="pyarrow")
        .to_pandas()["k"].unique()
    )
    sel = odf[odf["o_orderkey"].isin(set(late.tolist()))]
    out = (
        sel.groupby("o_orderpriority")
        .size()
        .rename("order_count")
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["order_count"] = out["order_count"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Important-stock share (TPC-H Q11 shape) (q322)
# --------------------------------------------------------------------------

Q11_MEAN_NUM, Q11_MEAN_DEN = 3, 2  # keep parts > 1.5x the mean value

_Q11_SQL = f"""
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) // 100)
             AS value_c
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(value_c) AS total_c, count(*) AS n_parts FROM v)
SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
FROM v, tot
WHERE value_c * n_parts * {Q11_MEAN_DEN} > total_c * {Q11_MEAN_NUM}
ORDER BY value_c DESC, l_partkey
"""


@query("q322_important_stock", sql=_Q11_SQL)
def q322_important_stock(sf_dir: str):
    """TPC-H Q11 shape — parts whose traded value exceeds 1.5x the
    GLOBAL mean part value: the group-vs-global-scalar HAVING (each
    group compared against an aggregate over everything),
    integer-exact via cross-multiplication (v*n*2 > total*3).  Plan: ONE
    partkey exchange builds per-part values; the global total is a
    driver scalar; the filter runs on the part-sized frame.  Output:
    (l_partkey, value_c) ordered by value desc."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        df = df.assign(v=price_c * (100 - disc_h) // 100)
        return df.groupby("l_partkey", as_index=False)["v"].sum()

    per_part = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("l_partkey")
        .aggregate(Sum("v", alias_name="value_c"))
        .to_pandas()
    )
    total = int(per_part["value_c"].sum())
    n_parts = len(per_part)
    out = (
        per_part[per_part["value_c"] * n_parts * Q11_MEAN_DEN
                 > total * Q11_MEAN_NUM]
        .sort_values(["value_c", "l_partkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for c in ("l_partkey", "value_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Top supplier by quarter revenue (TPC-H Q15 shape) (q323)
# --------------------------------------------------------------------------

Q15_LO = "1997-01-01"
Q15_HI = "1997-04-01"

_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) // 100)
             AS total_rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate <  TIMESTAMP '{Q15_HI}'
  GROUP BY l_suppkey
)
SELECT l_suppkey AS s_suppkey, CAST(total_rev_c AS BIGINT) AS total_rev_c
FROM rev WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
ORDER BY s_suppkey
"""


@query("q323_top_supplier", sql=_Q15_SQL)
def q323_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — the supplier(s) whose quarter revenue EQUALS
    the maximum (the view + scalar-subquery-equality pattern that must
    return ALL ties, not a LIMIT-1).  Plan: date prune at the scan,
    ONE suppkey exchange, max + equality filter on the supplier-sized
    frame.  Output: (s_suppkey, total_rev_c)."""
    lo = pd.Timestamp(Q15_LO).value // 1000
    hi = pd.Timestamp(Q15_HI).value // 1000
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                       pc.less(d, pa.scalar(hi)))
        df = t.filter(keep).to_pandas()
        if not len(df):
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        df = df.assign(v=price_c * (100 - disc_h) // 100)
        g = df.groupby("l_suppkey", as_index=False)["v"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("v", alias_name="total_rev_c"))
        .to_pandas()
    )
    mx = int(rev["total_rev_c"].max())
    out = (
        rev[rev["total_rev_c"] == mx]
        .rename(columns={"l_suppkey": "s_suppkey"})
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    for c in ("s_suppkey", "total_rev_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Dormant rich customers (TPC-H Q22 shape) (q324)
# --------------------------------------------------------------------------

Q22_NATIONS = (1, 3, 5, 7, 9)
Q22_CUTOFF = "2000-06-01"

_Q22_SQL = f"""
WITH pool AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN {Q22_NATIONS}
),
avgp AS (
  SELECT SUM(bal_c) AS s, count(*) AS n FROM pool WHERE bal_c > 0
),
rich AS (
  SELECT p.* FROM pool p, avgp WHERE p.bal_c * avgp.n > avgp.s
),
dormant AS (
  SELECT r.* FROM rich r
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = r.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c
FROM dormant GROUP BY c_nationkey ORDER BY nationkey
"""


@query("q324_dormant_rich", sql=_Q22_SQL)
def q324_dormant_rich(sf_dir: str):
    """TPC-H Q22 shape — customers in selected nations with
    above-average (positive-balance average, cross-multiplied exact)
    account balance and NO orders since {Q22_CUTOFF} (dormant):
    scalar-subquery threshold + NOT EXISTS anti-join.  Plan: the candidate pool is customer-sized
    (dimension); the anti-join broadcasts the candidate key set and
    subtracts the order-side hits gathered in ONE distributed pass.
    Output: (nationkey, n_cust, sum_bal_c)."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).to_pandas()
    pool = cust[cust["c_nationkey"].isin(Q22_NATIONS)].copy()
    pool["bal_c"] = np.round(pool["c_acctbal"] * 100).astype(np.int64)
    pos = pool[pool["bal_c"] > 0]
    s, n = int(pos["bal_c"].sum()), len(pos)
    rich = pool[pool["bal_c"] * n > s]
    keys = ray.put(rich["c_custkey"].to_numpy().astype(np.int64))
    cut = pd.Timestamp(Q22_CUTOFF).value // 1000
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def hits(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["o_orderdate"].cast(pa.int64()),
                                pa.scalar(cut))
        t = t.filter(keep)
        ks = ray.get(keys)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        got = np.unique(ck[np.isin(ck, ks)])
        return pa.table({"k": pa.array(got, pa.int64())})

    with_orders = set(
        orders.map_batches(hits, batch_format="pyarrow")
        .to_pandas()["k"].tolist()
    )
    dormant = rich[~rich["c_custkey"].isin(with_orders)]
    out = (
        dormant.groupby("c_nationkey")
        .agg(n_cust=("c_custkey", "size"), sum_bal_c=("bal_c", "sum"))
        .reset_index()
        .rename(columns={"c_nationkey": "nationkey"})
        .sort_values("nationkey")
        .reset_index(drop=True)
    )
    for c in ("nationkey", "n_cust", "sum_bal_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# BPE merge training (q325)
# --------------------------------------------------------------------------

BPE_MERGES = 8


def _bpe_merges(word_freq: dict[str, int], k: int) -> list[tuple]:
    """First k BPE merges (Sennrich et al. 2016) over a word-frequency
    table: symbols start as characters; each round merges the most
    frequent adjacent pair (ties -> lexicographically smallest pair).
    Returns [(idx, left, right, pair_freq)]."""
    seqs = {w: tuple(w) for w in word_freq}
    out = []
    for idx in range(k):
        counts: dict[tuple, int] = {}
        for w, seq in seqs.items():
            f = word_freq[w]
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        out.append((idx, best[0], best[1], counts[best]))
        merged = best[0] + best[1]
        new_seqs = {}
        for w, seq in seqs.items():
            res = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    res.append(merged)
                    i += 2
                else:
                    res.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(res)
        seqs = new_seqs
    return out


_BPE_SQL = """
SELECT CAST(merge_idx AS BIGINT) AS merge_idx, left_sym, right_sym,
       CAST(pair_freq AS BIGINT) AS pair_freq
FROM read_parquet('/root/repo/tests/fixtures/oracle/bpe_sf0.01.parquet')
ORDER BY merge_idx
"""


@query("q325_bpe_merges", sql=_BPE_SQL)
def q325_bpe_merges(sf_dir: str):
    """First 8 BPE tokenizer-training merges over the corpus (Sennrich
    et al. 2016): the fast-BPE decomposition — the CORPUS pass (word
    frequencies) is the distributed part (per-batch token counts, ONE
    token-keyed exchange), the merge loop then runs on the VOCAB-sized
    frequency table (exactly how production BPE trainers scale: corpus
    O(TB) -> vocab O(MB)).  Ties -> lexicographically smallest pair,
    so the merge sequence is unique.  Oracle: committed fixture from
    the INDEPENDENT regex-free scalar twin fed by a pandas word count.
    Output: (merge_idx, left_sym, right_sym, pair_freq)."""
    docs = _read(sf_dir, "documents", ["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in txt.split(" "):
                if w:
                    cnt[w] = cnt.get(w, 0) + 1
        toks = list(cnt)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "occ": pa.array([cnt[w] for w in toks], pa.int64()),
            }
        )

    wf = (
        docs.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("occ", alias_name="occ"))
        .to_pandas()
    )
    merges = _bpe_merges(
        dict(zip(wf["token"], wf["occ"].astype(int))), BPE_MERGES
    )
    return pd.DataFrame(
        merges, columns=["merge_idx", "left_sym", "right_sym", "pair_freq"]
    ).astype({"merge_idx": "int64", "pair_freq": "int64"})


# --------------------------------------------------------------------------
# kNN label-noise census (q326)
# --------------------------------------------------------------------------

KNN_NOISE_K = 5

_KNNNOISE_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/knnnoise_sf0.01.parquet'))
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN maj_label <> label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_disagree
FROM f GROUP BY label ORDER BY label
"""


@query("q326_knn_label_noise", sql=_KNNNOISE_SQL)
def q326_knn_label_noise(sf_dir: str):
    """Label-noise census via k-NN disagreement (the confident-learning
    heuristic): a vector whose 5 nearest neighbors (integer-quantized
    dot products — exact in float64 matmul) majority-vote a DIFFERENT
    label is a relabel/removal candidate.  Deterministic tie-breaks:
    neighbors by (-dot, vec_id); majority by (count desc, label asc).
    Plan: quantized matrix broadcast once, per-batch top-k against it;
    the LSH/IVF prefilter swap at page scale as in q299.  Oracle:
    committed fixture from the INDEPENDENT scalar per-pair twin.
    Output: (label, n_vecs, n_disagree)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    all_df = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    q = np.rint(np.asarray(list(all_df["embedding"]), dtype=np.float64)
                * 1000.0)
    ids = all_df["vec_id"].to_numpy().astype(np.int64)
    labels = all_df["label"].to_numpy().astype(np.int64)
    ref = ray.put((q, ids, labels))

    def vote(t: pa.Table) -> pa.Table:
        corpus, cids, clab = ray.get(ref)
        block = np.rint(
            np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
        )
        bids = t["vec_id"].to_numpy(zero_copy_only=False)
        dots = block @ corpus.T
        maj = np.empty(len(bids), dtype=np.int64)
        for i in range(len(bids)):
            d = dots[i]
            order = np.lexsort((cids, -d))
            picked = []
            for j in order:
                if cids[j] == bids[i]:
                    continue
                picked.append(j)
                if len(picked) == KNN_NOISE_K:
                    break
            cnt: dict[int, int] = {}
            for j in picked:
                cnt[int(clab[j])] = cnt.get(int(clab[j]), 0) + 1
            maj[i] = min(cnt, key=lambda l: (-cnt[l], l))
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": t["label"],
                "maj_label": pa.array(maj, pa.int64()),
            }
        )

    per_vec = emb.map_batches(vote, batch_format="pyarrow").to_pandas()
    per_vec["dis"] = (per_vec["maj_label"] != per_vec["label"]).astype(int)
    out = (
        per_vec.groupby("label")
        .agg(n_vecs=("vec_id", "size"), n_disagree=("dis", "sum"))
        .reset_index()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for c in ("label", "n_vecs", "n_disagree"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Class-balanced resampling plan (q327)
# --------------------------------------------------------------------------

_BALANCE_SQL = """
WITH cnt AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
),
mx AS (SELECT MAX(n) AS target FROM cnt)
SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n,
       CAST(target // n AS BIGINT) AS base_mult,
       CAST(target % n AS BIGINT) AS n_extra
FROM cnt, mx ORDER BY label
"""


@query("q327_class_balance_plan", sql=_BALANCE_SQL)
def q327_class_balance_plan(sf_dir: str):
    """Exact class-balancing oversample plan: every label is brought
    to the majority-class count with base multiplicity target//n plus
    n_extra = target%n single extra copies (assigned by hash rank at
    apply time, q281-style) — totals are EXACTLY target per class, no
    float sampling rates.  ONE label-sized aggregate.  Pure-SQL
    oracle.  Output: (label, n, base_mult, n_extra)."""
    emb = _read(sf_dir, "embeddings", ["label"])
    cnt = (
        emb.groupby("label")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    target = int(cnt["n"].max())
    cnt["base_mult"] = target // cnt["n"]
    cnt["n_extra"] = target % cnt["n"]
    for c in ("label", "n", "base_mult", "n_extra"):
        cnt[c] = cnt[c].astype("int64")
    return cnt


# --------------------------------------------------------------------------
# Linear-threshold cascade (q328)
# --------------------------------------------------------------------------

LT_SEEDS = 25       # top-in-degree seed count
LT_MAX_ROUNDS = 10  # fixed simulation horizon (standard LTM practice)


def _lt_thresholds(nodes: list[str]) -> dict[str, int]:
    """Deterministic per-node activation threshold in [1, 100]:
    md5-derived — the 'random' thresholds of the Kempe-Kleinberg-
    Tardos linear-threshold model, pinned for replay."""
    import hashlib

    return {
        v: int.from_bytes(hashlib.md5(f"lt:{v}".encode()).digest()[:4],
                          "little") % 100 + 1
        for v in nodes
    }


_LT_SQL = """
SELECT CAST(round AS BIGINT) AS round,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_active AS BIGINT) AS n_active
FROM read_parquet('/root/repo/tests/fixtures/oracle/cascade_fixture.parquet')
ORDER BY round
"""


@query("q328_lt_cascade", sql=_LT_SQL)
def q328_lt_cascade(sf_dir: str):
    """Linear-threshold influence cascade (Kempe-Kleinberg-Tardos
    2003) on the crawl graph: seeds = top-{LT_SEEDS} in-degree pages;
    a page activates when the share of its in-neighbors active
    reaches its md5-pinned threshold percent (integer cross-multiplied:
    active_in * 100 >= thresh * in_deg) — the virality model for how
    content spreads through link neighborhoods.  Synchronous rounds =
    deterministic.  Plan: per-round ONE map over the edge set with the
    active bitmap broadcast (double_sweep-style); horizon fixed at
    LT_MAX_ROUNDS rounds (the standard fixed-budget simulation).
    Oracle: committed fixture from the INDEPENDENT scalar
    adjacency-walk twin.  Output: (round, n_new, n_active)."""
    edges_df = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    edges_df = edges_df[edges_df["src"] != edges_df["dst"]].drop_duplicates()
    nodes = np.sort(
        pd.unique(pd.concat([edges_df["src"], edges_df["dst"]]))
    )
    idx = pd.Index(nodes)
    s = idx.get_indexer(edges_df["src"]).astype(np.int64)
    d = idx.get_indexer(edges_df["dst"]).astype(np.int64)
    n = len(nodes)
    in_deg = np.bincount(d, minlength=n).astype(np.int64)
    thr_map = _lt_thresholds(list(nodes))
    thr = np.array([thr_map[v] for v in nodes], dtype=np.int64)
    order = np.lexsort((nodes, -in_deg))
    seeds = order[:LT_SEEDS]
    active = np.zeros(n, dtype=bool)
    active[seeds] = True
    edges_ds = ray.data.from_pandas(
        pd.DataFrame({"s": s, "d": d})
    ).materialize()
    rows = [(0, LT_SEEDS, LT_SEEDS)]
    rnd = 0
    while rnd < LT_MAX_ROUNDS:
        rnd += 1
        aref = ray.put(active)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            am = ray.get(aref)
            hit = am[df["s"].to_numpy()]
            cnt = np.bincount(df["d"].to_numpy()[hit], minlength=n)
            return pd.DataFrame({"node": np.flatnonzero(cnt),
                                 "k": cnt[cnt > 0]})

        acc = (
            edges_ds.map_batches(partial, batch_format="pandas")
            .groupby("node")
            .aggregate(Sum("k", alias_name="k"))
            .to_pandas()
        )
        active_in = np.zeros(n, dtype=np.int64)
        active_in[acc["node"].to_numpy()] = acc["k"].to_numpy()
        newly = (~active) & (in_deg > 0) & (
            active_in * 100 >= thr * in_deg
        )
        if not newly.any():
            break
        active |= newly
        rows.append((rnd, int(newly.sum()), int(active.sum())))
    out = pd.DataFrame(rows, columns=["round", "n_new", "n_active"])
    return out.astype("int64")


# --------------------------------------------------------------------------
# Clustering coefficient by degree bucket (q329)
# --------------------------------------------------------------------------

_CLUSTCOEF_SQL = """
WITH f AS (SELECT * FROM read_parquet(
    '/root/repo/tests/fixtures/oracle/clustcoef_fixture.parquet'))
SELECT CAST(deg_bucket AS BIGINT) AS deg_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(SUM(tri2) AS BIGINT) AS sum_tri2,
       CAST(SUM(wedges) AS BIGINT) AS sum_wedges,
       CAST(CASE WHEN SUM(wedges) > 0
                 THEN SUM(tri2) * 1000000 // SUM(wedges)
                 ELSE 0 END AS BIGINT) AS coef_ppm
FROM f GROUP BY deg_bucket ORDER BY deg_bucket
"""


@query("q329_clustering_by_degree", sql=_CLUSTCOEF_SQL)
def q329_clustering_by_degree(sf_dir: str):
    """Local clustering coefficient curve by degree bucket (bucket =
    bit_length(deg)) — the c(k) ~ k^-1 signature that separates
    hierarchical web graphs from random ones (Ravasz-Barabasi).
    Per-node: tri2 = 2x triangles through the node (closed wedges),
    wedges = deg*(deg-1); coefficient = ppm ratio per bucket.
    Plan: sorted-adjacency intersection per node batch (the q266
    two-pointer idiom) with the CSR broadcast; exchange is node-sized.
    Oracle: committed fixture from the INDEPENDENT per-edge dict-set
    twin.  Output: (deg_bucket, n_nodes, sum_tri2, sum_wedges,
    coef_ppm)."""
    edges_df = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"
    )
    a = edges_df["src"].to_numpy()
    b = edges_df["dst"].to_numpy()
    und = {(x, y) if x < y else (y, x) for x, y in zip(a, b) if x != y}
    nodes = np.sort(pd.unique(np.array([v for e in und for v in e])))
    idx = pd.Index(nodes)
    ea = idx.get_indexer([e[0] for e in und]).astype(np.int64)
    eb = idx.get_indexer([e[1] for e in und]).astype(np.int64)
    n = len(nodes)
    # CSR of sorted neighbors
    both_a = np.concatenate([ea, eb])
    both_b = np.concatenate([eb, ea])
    o = np.lexsort((both_b, both_a))
    both_a, both_b = both_a[o], both_b[o]
    offs = np.searchsorted(both_a, np.arange(n + 1))
    deg = (offs[1:] - offs[:-1]).astype(np.int64)
    csr_ref = ray.put((offs, both_b, deg))

    def per_node(t: pa.Table) -> pa.Table:
        offs_, tails, deg_ = ray.get(csr_ref)
        vs = t["v"].to_numpy(zero_copy_only=False)
        tri2 = np.zeros(len(vs), dtype=np.int64)
        for i, v in enumerate(vs.tolist()):
            nb = tails[offs_[v]:offs_[v + 1]]
            cnt = 0
            for u in nb.tolist():
                nu = tails[offs_[u]:offs_[u + 1]]
                cnt += int(
                    np.isin(nb, nu, assume_unique=True).sum()
                )
            tri2[i] = cnt
        return pa.table(
            {
                "v": pa.array(vs),
                "tri2": pa.array(tri2),
                "wedges": pa.array(deg_[vs] * (deg_[vs] - 1)),
                "deg_bucket": pa.array(
                    np.array([int(x).bit_length() for x in deg_[vs]],
                             dtype=np.int64)
                ),
            }
        )

    per = (
        ray.data.from_pandas(pd.DataFrame({"v": np.arange(n)}))
        .map_batches(per_node, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    g = per.groupby("deg_bucket").agg(
        n_nodes=("v", "size"), sum_tri2=("tri2", "sum"),
        sum_wedges=("wedges", "sum"),
    ).reset_index()
    g["coef_ppm"] = np.where(
        g["sum_wedges"] > 0,
        g["sum_tri2"] * 1_000_000 // g["sum_wedges"], 0
    )
    g = g.sort_values("deg_bucket").reset_index(drop=True)
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g


# --------------------------------------------------------------------------
# Directed-edge reciprocity (q330)
# --------------------------------------------------------------------------

_EDGES_FIXTURE = "/root/repo/tests/fixtures/oracle/pagerank_edges.parquet"

_RECIP_SQL = f"""
WITH e AS (
  SELECT DISTINCT src, dst
  FROM read_parquet('{_EDGES_FIXTURE}') WHERE src <> dst
),
m AS (
  SELECT e1.src, e1.dst FROM e e1 JOIN e e2
    ON e1.src = e2.dst AND e1.dst = e2.src
)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM m) AS BIGINT) AS n_mutual_arcs,
       CAST((SELECT count(*) FROM m) * 1000000
            // (SELECT count(*) FROM e) AS BIGINT) AS reciprocity_ppm
"""


@query("q330_reciprocity", sql=_RECIP_SQL)
def q330_reciprocity(sf_dir: str):
    """Link reciprocity of the directed crawl graph — the fraction of
    arcs with a reverse arc (Garlaschelli-Loffredo): mutual linking
    separates editorial link exchanges from organic citation.  Plan:
    canonical-pair keying makes this ONE exchange: each arc maps to
    (min, max, dir-bit); a pair is mutual iff both bits appear — no
    self-join.  Pure-SQL oracle (the naive reversed self-join).
    Output: (n_edges, n_mutual_arcs, reciprocity_ppm)."""
    edges = ray.data.read_parquet(_EDGES_FIXTURE)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src"] != df["dst"]].drop_duplicates()
        lo = np.minimum(df["src"], df["dst"])
        hi = np.maximum(df["src"], df["dst"])
        return pd.DataFrame(
            {"lo": lo, "hi": hi,
             "fwd": (df["src"].to_numpy() == lo.to_numpy()).astype(int),
             "bwd": (df["src"].to_numpy() != lo.to_numpy()).astype(int)}
        ).drop_duplicates()

    pairs = (
        edges.map_batches(canon, batch_format="pandas")
        .groupby(["lo", "hi"])
        .aggregate(Sum("fwd", alias_name="fwd"),
                   Sum("bwd", alias_name="bwd"))
        .to_pandas()
    )
    fwd = pairs["fwd"].clip(upper=1)
    bwd = pairs["bwd"].clip(upper=1)
    n_edges = int(fwd.sum() + bwd.sum())
    mutual_pairs = int(((fwd > 0) & (bwd > 0)).sum())
    n_mutual_arcs = 2 * mutual_pairs
    return pd.DataFrame(
        {
            "n_edges": [n_edges],
            "n_mutual_arcs": [n_mutual_arcs],
            "reciprocity_ppm": [n_mutual_arcs * 1_000_000 // n_edges],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# 1-D k-means price quantization (q331)
# --------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 8


_KMEANS_SQL = """
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(centroid_c AS BIGINT) AS centroid_c,
       CAST(n AS BIGINT) AS n,
       CAST(sum_c AS BIGINT) AS sum_c
FROM read_parquet('/root/repo/tests/fixtures/oracle/kmeans1d_sf0.01.parquet')
ORDER BY bucket
"""


@query("q331_price_kmeans", sql=_KMEANS_SQL)
def q331_price_kmeans(sf_dir: str):
    """Distributed 1-D Lloyd k-means over order totals (k=8, 8 fixed
    iterations) — learned price-bucket boundaries for histogram
    equalization / zone-map design, integer-exact end to end:
    deterministic spread init (min + span*(2i+1)//2k), nearest-centroid
    assignment with ties to the LOWER bucket, floor-mean updates, empty
    clusters keep their centroid.  The classic distributed-Lloyd
    shape: centroids broadcast per iteration (ray.put), per-batch
    (sum, count) partials, k-sized driver update — the same pattern
    dedup/embed.py::train_centroids runs over vectors.  Oracle:
    committed fixture from the INDEPENDENT scalar loop twin.  Output:
    (bucket, centroid_c, n, sum_c)."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["o_totalprice"] * 100).astype(np.int64)
        return pd.DataFrame({"lo": [int(c.min())], "hi": [int(c.max())]})

    mm = orders.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    cent = np.array(
        [lo + (hi - lo) * (2 * i + 1) // (2 * KMEANS_K)
         for i in range(KMEANS_K)],
        dtype=np.int64,
    )
    for _ in range(KMEANS_ITERS):
        cref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cc = ray.get(cref)
            v = np.round(df["o_totalprice"] * 100).astype(np.int64).to_numpy()
            d = np.abs(v[:, None] - cc[None, :])
            a = d.argmin(axis=1)  # argmin takes the LOWEST index on ties
            return pd.DataFrame(
                {"bucket": a, "s": v, "n": np.ones(len(v), dtype=np.int64)}
            ).groupby("bucket", as_index=False).sum()

        agg = (
            orders.map_batches(partial, batch_format="pandas")
            .groupby("bucket")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .to_pandas()
        )
        new = cent.copy()
        for b, s, n in zip(agg["bucket"], agg["s"], agg["n"]):
            new[int(b)] = int(s) // int(n)
        if np.array_equal(new, cent):
            break
        cent = new
    cref = ray.put(cent)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(cref)
        v = np.round(df["o_totalprice"] * 100).astype(np.int64).to_numpy()
        a = np.abs(v[:, None] - cc[None, :]).argmin(axis=1)
        return pd.DataFrame(
            {"bucket": a, "sum_c": v, "n": np.ones(len(v), dtype=np.int64)}
        ).groupby("bucket", as_index=False).sum()

    out = (
        orders.map_batches(final, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("sum_c", alias_name="sum_c"),
                   Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["centroid_c"] = [int(cent[int(b)]) for b in out["bucket"]]
    out = out[["bucket", "centroid_c", "n", "sum_c"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Shuffle adjacency audit (q332)
# --------------------------------------------------------------------------

SHUFFLE_AUDIT_SALT = "shuffle"

_SHUFAUD_SQL = f"""
WITH o AS (
  SELECT source,
         LAG(source) OVER (
           ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)
                                     || ':{SHUFFLE_AUDIT_SALT}'), doc_id
         ) AS prev_source
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
            AS BIGINT) AS n_adjacent_same
FROM o
"""


@query("q332_shuffle_adjacency", sql=_SHUFAUD_SQL)
def q332_shuffle_adjacency(sf_dir: str):
    """Shuffle-quality audit of ops/shuffle.py::deterministic_shuffle:
    count adjacent pairs in the training order that share a source —
    a well-mixed order keeps this near the random-permutation
    expectation Sum n_s(n_s-1)/n; clumps mean curriculum leakage.
    Plan: the shuffle's own global positions make the adjacency
    distributed: per-batch interior LAG compare + block-count-sized
    boundary stitching on the driver — no second exchange.  Pure-SQL
    oracle recomputes the SAME md5 order with a window LAG.  Output:
    (n_rows, n_adjacent_same)."""
    from texrex_ray.ops.shuffle import deterministic_shuffle

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    shuffled = deterministic_shuffle(docs, id_col="doc_id",
                                     salt=SHUFFLE_AUDIT_SALT)

    def interior(t: pa.Table) -> pa.Table:
        df = t.select(["pos", "source"]).to_pandas().sort_values("pos")
        src = df["source"].to_numpy()
        same = int((src[1:] == src[:-1]).sum()) if len(src) > 1 else 0
        return pa.table(
            {
                "same": pa.array([same], pa.int64()),
                "n": pa.array([len(df)], pa.int64()),
                "first_pos": pa.array([int(df["pos"].iloc[0])], pa.int64()),
                "first_src": pa.array([df["source"].iloc[0]], pa.string()),
                "last_pos": pa.array([int(df["pos"].iloc[-1])], pa.int64()),
                "last_src": pa.array([df["source"].iloc[-1]], pa.string()),
            }
        )

    parts = shuffled.map_batches(
        interior, batch_format="pyarrow"
    ).to_pandas().sort_values("first_pos")
    n_rows = int(parts["n"].sum())
    same = int(parts["same"].sum())
    # stitch block boundaries (consecutive positions across blocks)
    last_pos = parts["last_pos"].to_numpy()[:-1]
    next_pos = parts["first_pos"].to_numpy()[1:]
    touching = last_pos + 1 == next_pos
    same += int(
        (touching
         & (parts["last_src"].to_numpy()[:-1]
            == parts["first_src"].to_numpy()[1:])).sum()
    )
    return pd.DataFrame(
        {"n_rows": [n_rows], "n_adjacent_same": [same]}
    ).astype("int64")


# --------------------------------------------------------------------------
# Deficit round robin (q333)
# --------------------------------------------------------------------------

DRR_QUANTUM_C = 1_000
DRR_ROUNDS = 200


def _drr_run(queues: dict[str, list[int]]) -> list[tuple]:
    """Deficit Round Robin (Shreedhar-Varghese 1996): types served in
    sorted order; each visit adds QUANTUM to the deficit, serves heads
    while size <= deficit, zeroes the deficit when the queue drains.
    Fixed {DRR_ROUNDS}-round horizon.  Returns per type:
    (type, n_served, served_value_c, backlog, deficit_end)."""
    types = sorted(queues)
    head = {t: 0 for t in types}
    deficit = {t: 0 for t in types}
    served = {t: 0 for t in types}
    value = {t: 0 for t in types}
    for _ in range(DRR_ROUNDS):
        for t in types:
            q = queues[t]
            if head[t] >= len(q):
                deficit[t] = 0
                continue
            deficit[t] += DRR_QUANTUM_C
            while head[t] < len(q) and q[head[t]] <= deficit[t]:
                deficit[t] -= q[head[t]]
                value[t] += q[head[t]]
                served[t] += 1
                head[t] += 1
            if head[t] >= len(q):
                deficit[t] = 0
    return [
        (t, served[t], value[t], len(queues[t]) - served[t], deficit[t])
        for t in types
    ]


_DRR_SQL = """
SELECT event_type, CAST(n_served AS BIGINT) AS n_served,
       CAST(served_value_c AS BIGINT) AS served_value_c,
       CAST(backlog AS BIGINT) AS backlog,
       CAST(deficit_end AS BIGINT) AS deficit_end
FROM read_parquet('/root/repo/tests/fixtures/oracle/drr_sf0.01.parquet')
ORDER BY event_type
"""


@query("q333_deficit_round_robin", sql=_DRR_SQL)
def q333_deficit_round_robin(sf_dir: str):
    """Deficit-round-robin fairness replay (Shreedhar-Varghese 1996)
    over per-type event queues (FIFO by ts, size = value cents,
    quantum 1000c, 200 rounds) — the byte-fair scheduler audit for a
    multi-tenant fetch/ingest pipeline: DRR guarantees each type's
    served value per round approaches the quantum regardless of item
    sizes.  Plan: queue construction is ONE type-keyed exchange with
    per-group (ts, event_id) sort; the scheduler fold runs on the
    queue heads (at scale: one DRR per dispatcher shard).  Oracle:
    committed fixture from the INDEPENDENT deque-twin.  Output:
    (event_type, n_served, served_value_c, backlog, deficit_end)."""
    ev = _read(sf_dir, "events", ["ts", "event_id", "event_type", "value"])

    def q_lists(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        sizes = np.maximum(
            np.rint(g["value"].to_numpy() * 100).astype(np.int64), 1
        )
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "sizes": [sizes.tolist()]}
        )

    qs = (
        ev.groupby("event_type")
        .map_groups(q_lists, batch_format="pandas")
        .to_pandas()
    )
    rows = _drr_run(dict(zip(qs["event_type"], qs["sizes"])))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_served", "served_value_c",
                       "backlog", "deficit_end"]
    )
    for c in ("n_served", "served_value_c", "backlog", "deficit_end"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Forecast revenue change (TPC-H Q6 shape) (q334)
# --------------------------------------------------------------------------

Q6_LO = "1996-01-01"
Q6_HI = "1997-01-01"

_Q6_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT) // 100)
            AS BIGINT) AS revenue_delta_c
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
  AND l_shipdate <  TIMESTAMP '{Q6_HI}'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 4 AND 6
  AND CAST(ROUND(l_quantity * 100) AS BIGINT) < 2400
"""


@query("q334_forecast_revenue", sql=_Q6_SQL)
def q334_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — revenue given up to small-quantity discounts
    in a year (price x discount over a 3-predicate slice): the pure
    scan-filter-aggregate that measures how well predicates push to
    the read.  NO join, NO exchange — two integers leave each task.
    Output: (n_items, revenue_delta_c)."""
    lo = pd.Timestamp(Q6_LO).value // 1000
    hi = pd.Timestamp(Q6_HI).value // 1000
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                              pa.scalar(100.0))), pa.int64())
        qty_c = pc.cast(pc.round(pc.multiply(t["l_quantity"],
                                             pa.scalar(100.0))), pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                    pc.less(d, pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(disc_h, pa.scalar(4)),
                        pc.less_equal(disc_h, pa.scalar(6))),
                pc.less(qty_c, pa.scalar(2400)),
            ),
        )
        t2 = t.filter(keep)
        price_c = np.round(
            t2["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        dh = np.round(
            t2["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        delta = price_c * dh // 100
        return pa.table(
            {
                "n_items": pa.array([t2.num_rows], pa.int64()),
                "delta": pa.array([int(delta.sum())], pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("delta", alias_name="revenue_delta_c"))
        .to_pandas()
    )
    return agg[["n_items", "revenue_delta_c"]].astype("int64")


# --------------------------------------------------------------------------
# Returned-item top customers (TPC-H Q10 shape) (q335)
# --------------------------------------------------------------------------

Q10_LO = "1996-01-01"
Q10_HI = "1996-07-01"
Q10_TOPK = 20

_Q10_SQL = f"""
WITH f AS (SELECT o.o_custkey,
                  CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      // 100 AS vol_c
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           WHERE l.l_returnflag = 'R'
             AND o.o_orderdate >= TIMESTAMP '{Q10_LO}'
             AND o.o_orderdate <  TIMESTAMP '{Q10_HI}')
SELECT c.c_custkey, n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(f.vol_c) AS BIGINT) AS lost_revenue_c
FROM f JOIN customer c ON c.c_custkey = f.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, n.n_name
ORDER BY lost_revenue_c DESC, c_custkey LIMIT {Q10_TOPK}
"""


@query("q335_returned_items", sql=_Q10_SQL)
def q335_returned_items(sf_dir: str):
    """TPC-H Q10 shape — customers who returned the most revenue in a
    half-year window: returnflag filter on the fact side, date filter
    on orders, customer+nation dimension decoration, top-20.  Plan:
    both filters prune at the scans; the half-year orderkey->custkey
    map broadcasts (small after the filter); per-customer partials
    combine before the customer-sized top-k.  Output: (c_custkey,
    nation, n_items, lost_revenue_c)."""
    lo = pd.Timestamp(Q10_LO).value // 1000
    hi = pd.Timestamp(Q10_HI).value // 1000
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].astype("int64")
        return df.loc[(d >= lo) & (d < hi), ["o_orderkey", "o_custkey"]]

    omap_df = orders.map_batches(ofilter, batch_format="pandas").to_pandas()
    omap = ray.put(dict(zip(omap_df["o_orderkey"].astype(int),
                            omap_df["o_custkey"].astype(int))))
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        om = ray.get(omap)
        ks = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cust = np.array([om.get(int(k), -1) for k in ks], dtype=np.int64)
        sel = cust >= 0
        df = t.to_pandas()[sel]
        if not len(df):
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64()),
                             "vol_c": pa.array([], pa.int64())})
        price_c = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        disc_h = np.round(df["l_discount"] * 100).astype(np.int64)
        g = pd.DataFrame(
            {"c_custkey": cust[sel], "n_items": 1,
             "vol_c": price_c * (100 - disc_h) // 100}
        ).groupby("c_custkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("vol_c", alias_name="lost_revenue_c"))
        .to_pandas()
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dec = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out = (
        per_cust.merge(dec[["c_custkey", "n_name"]], on="c_custkey")
        .rename(columns={"n_name": "nation"})
        .sort_values(["lost_revenue_c", "c_custkey"],
                     ascending=[False, True])
        .head(Q10_TOPK)
        .reset_index(drop=True)
    )[["c_custkey", "nation", "n_items", "lost_revenue_c"]]
    for c in ("c_custkey", "n_items", "lost_revenue_c"):
        out[c] = out[c].astype("int64")
    return out


# --------------------------------------------------------------------------
# Disjunctive predicate revenue (TPC-H Q19 shape) (q336)
# --------------------------------------------------------------------------

_Q19_SQL = """
WITH f AS (
  SELECT CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
             // 100 AS vol_c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
         AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) BETWEEN 100 AND 1500)
     OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 5 AND 20
         AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) BETWEEN 1000 AND 3000)
     OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 10 AND 40
         AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) BETWEEN 2000 AND 5000)
)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(vol_c) AS BIGINT) AS revenue_c
FROM f
"""

Q19_ARMS = (
    ("Brand#2", 1, 10, 100, 1500),
    ("Brand#17", 5, 20, 1000, 3000),
    ("Brand#25", 10, 40, 2000, 5000),
)


@query("q336_disjunctive_revenue", sql=_Q19_SQL)
def q336_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under a 3-arm DISJUNCTION of
    (brand, size-range, quantity-range) predicates: the OR-of-ANDs
    slice planners must union instead of intersecting.  Plan: each arm
    compiles to a broadcast partkey set (brand+size prune on the
    dimension); lineitem batches test arm membership + quantity range
    vectorized and union the arms with one boolean OR — the fact table
    is scanned ONCE for all arms.  Output: (n_items, revenue_c)."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).to_pandas()
    arms = []
    for brand, slo, shi, qlo, qhi in Q19_ARMS:
        keys = part.loc[
            (part["p_brand"] == brand)
            & (part["p_size"] >= slo) & (part["p_size"] <= shi),
            "p_partkey",
        ].to_numpy().astype(np.int64)
        arms.append((ray.put(keys), qlo, qhi))
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty_c = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = np.zeros(len(pk), dtype=bool)
        for ref, qlo, qhi in arms:
            ks = ray.get(ref)
            keep |= np.isin(pk, ks) & (qty_c >= qlo) & (qty_c <= qhi)
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_h = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vol = (price_c * (100 - disc_h) // 100)[keep]
        return pa.table(
            {
                "n_items": pa.array([int(keep.sum())], pa.int64()),
                "revenue_c": pa.array([int(vol.sum())], pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()
    )
    return agg[["n_items", "revenue_c"]].astype("int64")


# --------------------------------------------------------------------------
# Boruvka minimum spanning forest over the supplier-part graph (q337)
# --------------------------------------------------------------------------

_MST_SQL = (
    "SELECT n_nodes, n_edges, n_components, n_mst_edges, mst_weight_c "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/mst_sf0.01.parquet')"
)


@query("q337_boruvka_msf", sql=_MST_SQL)
def q337_boruvka_msf(sf_dir: str):
    """Minimum spanning forest of the bipartite supplier-part graph
    (edge weight = MIN lineitem extendedprice in cents for the pair),
    computed with DISTRIBUTED Boruvka rounds: per round, every
    component's cheapest outgoing edge is found with one combiner-style
    ``map_batches`` partial + a component-keyed groupby over a packed
    ``(w, src, dst)`` int64 key (lexicographic min == integer min), and
    only the per-component winners reach the driver's union-find.
    Components at least halve per round, so the loop is O(log V) rounds
    of edge-local work — the textbook MST shape for map-reduce.  The
    node->component label array is driver-broadcast per round (V here is
    suppliers+parts ~ 2.1k; at web scale labels shard into actor state
    and merging uses pointer-jumping, same plan switch as
    ops/graph.py::dup_clusters).  Every MSF has the same total weight
    and edge count, so the output is implementation-independent; the
    oracle fixture is an INDEPENDENT Kruskal twin
    (tools/gen_oracle_fixtures.py::gen_mst).  Output one row:
    (n_nodes, n_edges, n_components, n_mst_edges, mst_weight_c)."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_extendedprice"])

    # edge aggregation: per-batch min per (src, dst), then one shuffle
    def edge_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "dst": t["l_partkey"].to_numpy(zero_copy_only=False)
                + 1_000_000,
                "w_c": np.round(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        g = df.groupby(["src", "dst"], as_index=False)["w_c"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    edges = (
        li.map_batches(edge_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min("w_c", alias_name="w_c"))
        .materialize()  # reused every Boruvka round; edge-list-sized
    )
    n_edges = edges.count()

    # driver-side node universe + dense index (V = result-sized here)
    uniq = (
        pd.concat(
            [
                b.to_pandas()
                for b in edges.select_columns(["src", "dst"]).iter_batches(
                    batch_format="pyarrow", batch_size=65536
                )
            ]
        )
        .melt(value_name="node")["node"]
        .drop_duplicates()
        .sort_values()
        .to_numpy()
    )
    n_nodes = len(uniq)
    node_pos = {int(v): i for i, v in enumerate(uniq)}
    pos_ref = ray.put(node_pos)

    # union-find on dense node indices (driver: component-sized state)
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return int(x)

    # packed lexicographic key (w, src, dst) -> one int64 so the
    # per-component argmin is a plain integer Min aggregate.  Index
    # width is sized from V at the driver; the weight gets the rest of
    # the 63 bits, asserted loudly (beyond that, switch the winner
    # aggregate to a map_groups lexicographic min).
    idx_bits = max(int(np.ceil(np.log2(max(n_nodes, 2)))), 1)
    w_bits = 63 - 2 * idx_bits

    mst_w = 0
    mst_e = 0
    while True:
        # component label per node, broadcast once per round
        labels = np.array([find(i) for i in range(n_nodes)], dtype=np.int64)
        lab_ref = ray.put(labels)

        def min_out(df: pd.DataFrame) -> pd.DataFrame:
            lab = ray.get(lab_ref)
            pos = ray.get(pos_ref)
            si = df["src"].map(pos).to_numpy(np.int64)
            di = df["dst"].map(pos).to_numpy(np.int64)
            c1, c2 = lab[si], lab[di]
            live = c1 != c2
            if not live.any():
                return pd.DataFrame({"comp": [], "packed": []}).astype(
                    {"comp": np.int64, "packed": np.int64}
                )
            w = df["w_c"].to_numpy(np.int64)[live]
            if w.max(initial=0) >= (1 << w_bits):
                raise ValueError(
                    f"q337 packed-key overflow: w_c needs >= {w_bits} bits"
                )
            packed = (
                (w << (2 * idx_bits)) | (si[live] << idx_bits) | di[live]
            )
            both = pd.DataFrame(
                {
                    "comp": np.concatenate([c1[live], c2[live]]),
                    "packed": np.concatenate([packed, packed]),
                }
            )
            return both.groupby("comp", as_index=False)["packed"].min()

        winners = (
            edges.map_batches(min_out, batch_format="pandas")
            .groupby("comp")
            .aggregate(Min("packed", alias_name="packed"))
            .to_pandas()
        )
        if winners.empty:
            break
        merged_any = False
        # sort for determinism; unpack and union
        for p in np.sort(winners["packed"].to_numpy(np.int64)):
            w = int(p >> (2 * idx_bits))
            si = int((p >> idx_bits) & ((1 << idx_bits) - 1))
            di = int(p & ((1 << idx_bits) - 1))
            ra, rb = find(si), find(di)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                mst_w += w
                mst_e += 1
                merged_any = True
        if not merged_any:
            break

    n_comp = len({find(i) for i in range(n_nodes)})
    return pd.DataFrame(
        {
            "n_nodes": [n_nodes],
            "n_edges": [n_edges],
            "n_components": [n_comp],
            "n_mst_edges": [mst_e],
            "mst_weight_c": [mst_w],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# AMS F2 sketch audit over the event stream (q338)
# --------------------------------------------------------------------------

_AMS_J = 17  # odd estimator count -> the median is an exact element

_AMS_SQL = f"""
WITH cnt AS (
  SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
est AS (
  SELECT j,
         CAST(SUM(CASE WHEN md5_number_lower(CAST(u AS VARCHAR) || ':' ||
                                             CAST(j AS VARCHAR)) % 2 = 0
                       THEN c ELSE -c END) AS BIGINT) AS s
  FROM cnt CROSS JOIN (SELECT unnest(range({_AMS_J})) AS j)
  GROUP BY j
),
ranked AS (
  SELECT s * s AS e, row_number() OVER (ORDER BY s * s) AS rn FROM est
),
x AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM cnt),
m AS (SELECT e AS est_f2 FROM ranked WHERE rn = {(_AMS_J + 1) // 2})
SELECT exact_f2, est_f2,
       CAST(ABS(est_f2 - exact_f2) * 10000 // exact_f2 AS BIGINT) AS rel_err_bp
FROM x, m
"""


@query("q338_ams_f2", sql=_AMS_SQL)
def q338_ams_f2(sf_dir: str):
    """AMS second-frequency-moment sketch audit: F2 = sum over users of
    count^2 (the self-join size of the stream), estimated with 17
    four-wise-ish +/-1 estimators S_j = sum_u sign_j(u) * c_u, taking
    the MEDIAN of S_j^2 — versus the exact F2 from the same grouped
    counts.  Ray plan: combiner-style per-batch partial counts ->
    groupby-user sum (the only key-cardinality exchange); the 17 signed
    sums fold over the RESULT-SIZED user table per batch and meet in a
    17-row groupby — the signs (md5_number_lower(u:j) parity, identical
    in DuckDB and Python) are computed on aggregated keys, never per
    event.  At 100 TB the user table itself streams: the signed partial
    per batch is 17 numbers, so the second exchange stays 17 rows.
    Output: (exact_f2, est_f2, rel_err_bp)."""
    import hashlib

    ev = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"u": u.astype(np.int64), "c": c.astype(np.int64)})

    counts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("c", alias_name="c"))
    )

    def signed(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        js = np.empty(_AMS_J, np.int64)
        ss = np.empty(_AMS_J, np.int64)
        f2 = int((c.astype(object) * c).sum())
        for j in range(_AMS_J):
            sign = np.fromiter(
                (
                    1
                    if int.from_bytes(
                        hashlib.md5(f"{int(x)}:{j}".encode()).digest()[8:],
                        "little",
                    )
                    % 2
                    == 0
                    else -1
                    for x in u
                ),
                np.int64,
                len(u),
            )
            js[j] = j
            ss[j] = int((sign * c).sum())
        out = pa.table({"j": js, "s": ss})
        return out.append_column(
            "f2", pa.array([f2] + [0] * (_AMS_J - 1), pa.int64())
        )

    folded = (
        counts.map_batches(signed, batch_format="pyarrow")
        .groupby("j")
        .aggregate(Sum("s", alias_name="s"), Sum("f2", alias_name="f2"))
        .to_pandas()
    )
    exact = int(folded["f2"].sum())
    ests = np.sort((folded["s"].to_numpy(np.int64) ** 2))
    est = int(ests[(_AMS_J - 1) // 2])
    return pd.DataFrame(
        {
            "exact_f2": [exact],
            "est_f2": [est],
            "rel_err_bp": [abs(est - exact) * 10000 // exact],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Profit by nation and ship year (TPC-H Q9 shape) (q339)
# --------------------------------------------------------------------------

_Q9_SQL = """
WITH f AS (
  SELECT n.n_name,
         CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) // 100
           - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
             * CAST(ROUND(l.l_quantity * 100) AS BIGINT) // 100 AS amount_c
  FROM lineitem l
  JOIN part p     ON p.p_partkey  = l.l_partkey
  JOIN supplier s ON s.s_suppkey  = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
)
SELECT n_name, o_year, CAST(SUM(amount_c) AS BIGINT) AS profit_c
FROM f GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


@query("q339_nation_profit", sql=_Q9_SQL)
def q339_nation_profit(sf_dir: str):
    """TPC-H Q9 shape — profit by (supplier nation, ship year) for 'red'
    parts, with retail price standing in for supply cost (no partsupp
    table).  Plan: the two dimension sides are broadcast lookup arrays
    (partkey -> retail cents for the name-filtered parts; suppkey ->
    nation name via a driver-side 100x25 join), the fact table is
    scanned once with a combiner-style partial aggregate on
    (nation, year), and the final exchange is nation*year-sized.
    Integer-exact cents arithmetic end to end (the q94 discipline).
    Output: (n_name, o_year, profit_c) ordered by nation, year DESC."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    red = part[part["p_name"].str.contains("red")]
    retail_c = dict(
        zip(
            red["p_partkey"].astype(np.int64),
            np.round(red["p_retailprice"].to_numpy() * 100).astype(np.int64),
        )
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    s2n = dict(
        zip(
            sup["s_suppkey"].astype(np.int64),
            sup["s_nationkey"].map(
                dict(zip(nat["n_nationkey"], nat["n_name"]))
            ),
        )
    )
    retail_ref, s2n_ref = ray.put(retail_c), ray.put(s2n)

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rc = ray.get(retail_ref)
        sn = ray.get(s2n_ref)
        r = df["l_partkey"].map(rc)
        keep = r.notna()
        if not keep.any():
            return pd.DataFrame(
                {"n_name": pd.Series([], dtype=str),
                 "o_year": pd.Series([], dtype=np.int64),
                 "profit_c": pd.Series([], dtype=np.int64)}
            )
        d = df.loc[keep]
        price_c = np.round(d["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_h = np.round(d["l_discount"].to_numpy() * 100).astype(np.int64)
        qty_c = np.round(d["l_quantity"].to_numpy() * 100).astype(np.int64)
        amount = (price_c * (100 - disc_h) // 100
                  - r[keep].to_numpy(np.int64) * qty_c // 100)
        g = pd.DataFrame(
            {
                "n_name": d["l_suppkey"].map(sn).to_numpy(),
                "o_year": d["l_shipdate"].dt.year.to_numpy(np.int64),
                "profit_c": amount,
            }
        ).groupby(["n_name", "o_year"], as_index=False)["profit_c"].sum()
        return g

    out = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("profit_c", alias_name="profit_c"))
        .to_pandas()
        .sort_values(["n_name", "o_year"], ascending=[True, False])
        .reset_index(drop=True)
    )
    out["o_year"] = out["o_year"].astype("int64")
    out["profit_c"] = out["profit_c"].astype("int64")
    return out[["n_name", "o_year", "profit_c"]]


# --------------------------------------------------------------------------
# Johnson two-machine flow-shop makespan (q340)
# --------------------------------------------------------------------------

_FS_MOD = 86_400  # synthetic per-machine processing seconds: [1, 86400]

_JOHNSON_SQL = f"""
WITH j AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) % {_FS_MOD} + 1 AS p1,
         (o_orderkey * 37 + 11) % {_FS_MOD} + 1                    AS p2
  FROM orders
),
s AS (
  SELECT *,
         CASE WHEN p1 < p2 THEN 0 ELSE 1 END AS grp,
         CASE WHEN p1 < p2 THEN p1 ELSE -p2 END AS k2
  FROM j
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_jobs,
             CAST(SUM(p1) AS BIGINT) AS total_p1,
             CAST(SUM(p2) AS BIGINT) AS total_p2 FROM j),
jo AS (
  SELECT CAST(MAX(score) AS BIGINT) AS makespan_johnson FROM (
    SELECT SUM(p1) OVER (ORDER BY grp, k2, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      + (SELECT total_p2 FROM t)
      - COALESCE(SUM(p2) OVER (ORDER BY grp, k2, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS score FROM s)
),
fi AS (
  SELECT CAST(MAX(score) AS BIGINT) AS makespan_fifo FROM (
    SELECT SUM(p1) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      + (SELECT total_p2 FROM t)
      - COALESCE(SUM(p2) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS score FROM s)
)
SELECT n_jobs, total_p1, total_p2, makespan_johnson, makespan_fifo
FROM t, jo, fi
"""


@query("q340_johnson_flowshop", sql=_JOHNSON_SQL)
def q340_johnson_flowshop(sf_dir: str):
    """Johnson's rule for the two-machine flow shop: every order is a
    job with synthetic deterministic processing times (p1 from the
    price cents, p2 from the key), scheduled by the optimal rule
    (p1<p2 ascending p1 first, then the rest descending p2) and
    compared against FIFO key order.  The makespan uses the CLOSED
    FORM C = max_j (cumsum_p1(j) + total_p2 - cumsum_p2(j-1)), so the
    sequential machine-2 recurrence becomes two distributed EXCLUSIVE
    prefix scans (ops/window.py::prefix_scan_sum — contiguous range
    slices, driver carries are bucket-count-sized) over a packed
    integer schedule key + one global max: no global sort, no
    driver-side job list.  Output one row:
    (n_jobs, total_p1, total_p2, makespan_johnson, makespan_fifo)."""
    from texrex_ray.ops.window import prefix_scan_sum

    ods = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p1 = (
            np.round(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)
            % _FS_MOD
            + 1
        )
        p2 = (k * 37 + 11) % _FS_MOD + 1
        if k.max(initial=0) >= (1 << 21):
            raise ValueError("q340 packed key: o_orderkey needs >= 21 bits")
        grp = (p1 >= p2).astype(np.int64)
        k2 = np.where(grp == 0, p1, -p2)
        # (grp, k2, key) packed into one int64 order key for the scans
        ord_j = (grp << 39) | ((k2 + (1 << 17)) << 21) | k
        return pa.table({"key": k, "p1": p1, "p2": p2, "ord_j": ord_j})

    jobs = ods.map_batches(derive, batch_format="pyarrow")
    n_jobs = jobs.count()
    total_p1 = jobs.sum("p1")
    total_p2 = jobs.sum("p2")

    def makespan(ds: ray.data.Dataset, order_col: str) -> int:
        s1 = prefix_scan_sum(ds, order_col, "p1", out="pp1")
        s2 = prefix_scan_sum(s1, order_col, "p2", out="pp2")

        def score(t: pa.Table) -> pa.Table:
            v = (
                t["pp1"].to_numpy(zero_copy_only=False)
                + t["p1"].to_numpy(zero_copy_only=False)
                + total_p2
                - t["pp2"].to_numpy(zero_copy_only=False)
            )
            return pa.table({"m": pa.array([int(v.max())], pa.int64())})

        return int(
            s2.map_batches(score, batch_format="pyarrow").max("m")
        )

    return pd.DataFrame(
        {
            "n_jobs": [n_jobs],
            "total_p1": [total_p1],
            "total_p2": [total_p2],
            "makespan_johnson": [makespan(jobs, "ord_j")],
            "makespan_fifo": [makespan(jobs, "key")],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Delta-stepping single-source shortest paths (q341)
# --------------------------------------------------------------------------

_SSSP_SQL = (
    "SELECT n_nodes, n_reached, sum_dist_c, max_dist_c "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/sssp_sf0.01.parquet')"
)

_SSSP_DELTA = 1 << 21  # bucket width in cents (~21k USD)


@query("q341_delta_stepping", sql=_SSSP_SQL)
def q341_delta_stepping(sf_dir: str):
    """Delta-stepping SSSP (Meyer & Sanders) over the undirected
    supplier-part graph (edge weight = MIN lineitem extendedprice
    cents for the pair), source = the smallest node id.  The classic
    scalable SSSP: distances are binned into width-DELTA buckets; the
    lowest bucket is drained with repeated LIGHT-edge (w < DELTA)
    relaxation phases, then HEAVY edges of the removed set relax once.
    Every relaxation phase is DISTRIBUTED: one map_batches over the
    (materialized, edge-aggregated) edge dataset with the frontier
    mask + distance array broadcast, a per-batch min-per-dst combiner,
    and a dst-keyed groupby min — the driver only merges per-node
    winners (V-sized here; sharded actor state at web scale, the same
    plan note as q337).  The oracle fixture is an INDEPENDENT binary-
    heap Dijkstra twin (tools/gen_oracle_fixtures.py::gen_sssp).
    Output: (n_nodes, n_reached, sum_dist_c, max_dist_c)."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_extendedprice"])

    def edge_partial(t: pa.Table) -> pa.Table:
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64) \
            + 1_000_000
        w = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "src": np.concatenate([s, d]),  # undirected: both ways
                "dst": np.concatenate([d, s]),
                "w_c": np.concatenate([w, w]),
            }
        ).groupby(["src", "dst"], as_index=False)["w_c"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        li.map_batches(edge_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min("w_c", alias_name="w_c"))
        .materialize()  # reused every relaxation phase
    )

    uniq = (
        pd.concat(
            [
                b.to_pandas()
                for b in edges.select_columns(["src"]).iter_batches(
                    batch_format="pyarrow", batch_size=65536
                )
            ]
        )["src"]
        .drop_duplicates()
        .sort_values()
        .to_numpy(np.int64)
    )
    n_nodes = len(uniq)
    pos = {int(v): i for i, v in enumerate(uniq)}
    pos_ref = ray.put(pos)

    INF = np.int64(1 << 62)
    dist = np.full(n_nodes, INF, np.int64)
    dist[0] = 0  # uniq is sorted: index 0 == smallest node id
    pending = np.zeros(n_nodes, bool)
    pending[0] = True

    def relax(active: np.ndarray, light: bool) -> pd.DataFrame:
        act_ref = ray.put(active)
        dist_ref = ray.put(dist)

        def phase(df: pd.DataFrame) -> pd.DataFrame:
            a = ray.get(act_ref)
            dd = ray.get(dist_ref)
            p = ray.get(pos_ref)
            si = df["src"].map(p).to_numpy(np.int64)
            w = df["w_c"].to_numpy(np.int64)
            kind = (w < _SSSP_DELTA) if light else (w >= _SSSP_DELTA)
            live = a[si] & kind
            if not live.any():
                return pd.DataFrame(
                    {"di": pd.Series([], dtype=np.int64),
                     "cand": pd.Series([], dtype=np.int64)}
                )
            di = df["dst"].map(p).to_numpy(np.int64)[live]
            cand = dd[si[live]] + w[live]
            out = pd.DataFrame({"di": di, "cand": cand})
            return out.groupby("di", as_index=False)["cand"].min()

        return (
            edges.map_batches(phase, batch_format="pandas")
            .groupby("di")
            .aggregate(Min("cand", alias_name="cand"))
            .to_pandas()
        )

    def apply(req: pd.DataFrame) -> np.ndarray:
        improved = np.zeros(n_nodes, bool)
        if len(req):
            di = req["di"].to_numpy(np.int64)
            cand = req["cand"].to_numpy(np.int64)
            better = cand < dist[di]
            dist[di[better]] = cand[better]
            improved[di[better]] = True
        return improved

    while pending.any():
        i = int(dist[pending].min()) // _SSSP_DELTA
        in_bucket = pending & (dist < INF) & (dist // _SSSP_DELTA == i)
        removed = np.zeros(n_nodes, bool)
        while in_bucket.any():
            removed |= in_bucket
            pending &= ~in_bucket
            pending |= apply(relax(in_bucket, light=True))
            in_bucket = pending & (dist // _SSSP_DELTA == i)
        pending |= apply(relax(removed, light=False))

    reached = dist < INF
    return pd.DataFrame(
        {
            "n_nodes": [n_nodes],
            "n_reached": [int(reached.sum())],
            "sum_dist_c": [int(dist[reached].sum())],
            "max_dist_c": [int(dist[reached].max())],
        }
    ).astype("int64")


# --------------------------------------------------------------------------
# Parts-supplier relationship census (TPC-H Q16 shape) (q342)
# --------------------------------------------------------------------------

_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)

_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 25
"""


@query("q342_supplier_census", sql=_Q16_SQL)
def q342_supplier_census(sf_dir: str):
    """TPC-H Q16 shape — COUNT(DISTINCT supplier) per (brand, type,
    size) for a size-list slice, excluding one brand, one type, and
    complained-about suppliers (acctbal < 0, the Q16 anti-join).  Plan:
    both dimension filters are broadcast lookups (part dim -> attrs,
    supplier exclusion set); the fact scan dedupes
    (brand, type, size, suppkey) per batch (combiner), one groupby
    collapses cross-batch duplicates, a second groupby counts distinct
    suppliers — the exchanges carry distinct COMBINATIONS, never fact
    rows.  Output: top-25 by (supplier_cnt DESC, brand, type, size)."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    keep = part[
        (part["p_brand"] != "Brand#2")
        & (part["p_type"] != "PROMO")
        & part["p_size"].isin(_Q16_SIZES)
    ]
    attrs = {
        int(r.p_partkey): (r.p_brand, r.p_type, int(r.p_size))
        for r in keep.itertuples()
    }
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    excl = set(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].astype(int))
    attrs_ref, excl_ref = ray.put(attrs), ray.put(excl)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def combos(df: pd.DataFrame) -> pd.DataFrame:
        am = ray.get(attrs_ref)
        ex = ray.get(excl_ref)
        d = df[df["l_partkey"].isin(am) & ~df["l_suppkey"].isin(ex)]
        if d.empty:
            return pd.DataFrame(
                {"p_brand": pd.Series([], dtype=str),
                 "p_type": pd.Series([], dtype=str),
                 "p_size": pd.Series([], dtype=np.int64),
                 "suppkey": pd.Series([], dtype=np.int64)}
            )
        rows = d.drop_duplicates(["l_partkey", "l_suppkey"])
        att = rows["l_partkey"].map(am)
        return pd.DataFrame(
            {
                "p_brand": att.str[0].to_numpy(),
                "p_type": att.str[1].to_numpy(),
                "p_size": att.str[2].to_numpy(np.int64),
                "suppkey": rows["l_suppkey"].to_numpy(np.int64),
            }
        ).drop_duplicates()

    distinct = (
        li.map_batches(combos, batch_format="pandas")
        .groupby(["p_brand", "p_type", "p_size", "suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    counts = (
        distinct.groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .to_pandas()
        .sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
        )
        .head(25)
        .reset_index(drop=True)
    )
    counts["p_size"] = counts["p_size"].astype("int64")
    counts["supplier_cnt"] = counts["supplier_cnt"].astype("int64")
    return counts[["p_brand", "p_type", "p_size", "supplier_cnt"]]


# --------------------------------------------------------------------------
# Burrows-Wheeler run compressibility (q343)
# --------------------------------------------------------------------------

_BWT_PREFIX = 512

_BWT_SQL = (
    "SELECT source, n_docs, sum_chars, sum_runs, runs_ppm "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/bwt_sf0.01.parquet') "
    "ORDER BY source"
)


@query("q343_bwt_runs", sql=_BWT_SQL)
def q343_bwt_runs(sf_dir: str):
    """Per-source Burrows-Wheeler compressibility: BWT each document's
    first 512 chars (+ sentinel) and count the transform's character
    RUNS — the bzip2 pipeline's leverage (repetitive text -> few runs).
    The per-doc suffix array uses numpy prefix doubling
    (functions/complexity.py::bwt_runs, O(n log^2 n) lexsort rounds);
    the oracle fixture is the INDEPENDENT explicit-rotation-sort twin.
    Per-doc work is embarrassingly parallel map_batches; the exchange
    is source-count-sized partial sums.  Output per source:
    (source, n_docs, sum_chars, sum_runs, runs_ppm) where
    runs_ppm = sum_runs * 1e6 // sum_chars (lower = more squeezable)."""
    from texrex_ray.functions.complexity import bwt_runs

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src_name, sub in df.groupby("source", sort=False):
            n_c = 0
            n_r = 0
            for t in sub["text"]:
                c, r = bwt_runs(str(t)[:_BWT_PREFIX])
                n_c += c
                n_r += r
            rows.append((src_name, len(sub), n_c, n_r))
        return pd.DataFrame(
            rows, columns=["source", "n_docs", "sum_chars", "sum_runs"]
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Sum("sum_runs", alias_name="sum_runs"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["runs_ppm"] = (
        out["sum_runs"] * 1_000_000 // out["sum_chars"]
    ).astype("int64")
    for c in ("n_docs", "sum_chars", "sum_runs"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_docs", "sum_chars", "sum_runs", "runs_ppm"]]


# --------------------------------------------------------------------------
# L1 distance-transform audit over the image payload table (q344)
# --------------------------------------------------------------------------

_DT_SQL = (
    "SELECT fmt, n_images, n_fg, sum_dt, max_dt "
    "FROM read_parquet('/root/repo/tests/fixtures/oracle/dt_sf0.01.parquet') "
    "ORDER BY fmt"
)


@query("q344_distance_transform", sql=_DT_SQL)
def q344_distance_transform(sf_dir: str):
    """Exact L1 distance transform per image (separable two-pass lower
    envelope, stages/images.py::DistanceTransform): how far background
    pixels sit from the nearest bright (luminance >= 383) pixel — the
    layout-sparsity audit behind content-crop and saliency heuristics.
    Decode + transform run in the actor pool (pixels never shuffle);
    three int64 scalars per image reach the per-fmt aggregate.  Oracle:
    committed fixture from the INDEPENDENT multi-source BFS-dilation
    twin (L1 distance == 4-neighbour BFS depth on an obstacle-free
    grid).  Output per fmt: (fmt, n_images, n_fg, sum_dt, max_dt)."""
    from texrex_ray.pipelines.caption import fixture_path
    from texrex_ray.sources.lance_io import read_images
    from texrex_ray.stages.images import DistanceTransform

    d = fixture_path(n=300, seed=42)
    ds = read_images(f"{d}/images_table", columns=["image_id", "bytes", "fmt"])
    scored = ds.map_batches(
        DistanceTransform, concurrency=2, batch_size=64,
        batch_format="pyarrow",
    ).select_columns(["fmt", "n_fg", "sum_dt", "max_dt"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fmt")
        return pd.DataFrame(
            {
                "n_images": g.size(),
                "n_fg": g["n_fg"].sum(),
                "sum_dt": g["sum_dt"].sum(),
                "max_dt": g["max_dt"].max(),
            }
        ).reset_index()

    out = (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_fg", alias_name="n_fg"),
            Sum("sum_dt", alias_name="sum_dt"),
            Max("max_dt", alias_name="max_dt"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    for c in ("n_images", "n_fg", "sum_dt", "max_dt"):
        out[c] = out[c].astype("int64")
    return out[["fmt", "n_images", "n_fg", "sum_dt", "max_dt"]]


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
    wrong tool for this key cardinality); per-part wedge EXPLOSION
    (d*(d-1)/2 supplier pairs, vectorized triu indices) inside the
    p-bucketed combine; pair multiplicities m fold to
    sum C(m, 2) inside the (s1,s2)-bucketed combine, so only
    bucket-count rows reach the final sum.  Wedges are the scale knob:
    a hot part with degree d emits O(d^2) pairs — the degree cap
    guards it loudly (at web scale, split hot vertices by hashed
    neighbour ranges and correct the within-split undercount).
    Output: (n_left, n_right, n_edges, n_wedges, n_butterflies)."""
    from texrex_ray.ops.aggregate import bucketed_groupby

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

    # Butterfly fold: the LEFT side (suppliers) is small by
    # construction, so the per-pair co-neighbourhood counts m(s1,s2)
    # come from an ADDITIVE co-occurrence matrix instead of a wedge
    # shuffle: each edge block builds a local 0/1 incidence B over its
    # parts and emits triu(B @ B^T) — partial matrices SUM across
    # blocks (parts partition cleanly), so the only "exchange" is a
    # block-count driver reduce of L*(L-1)/2-entry vectors.  Dot
    # products are integers < 2^24, exact in float32 BLAS.  Beyond
    # L ~ 3e4 left nodes the matrix no longer fits and the plan is the
    # (s1,s2)-bucketed wedge-pair shuffle with hot-vertex salting —
    # guarded loudly here.
    if n_left > 30_000:
        raise ValueError(
            f"q348: {n_left} left nodes exceeds the co-occurrence-matrix "
            "plan; switch to the bucketed wedge-pair shuffle with salting"
        )
    s_ids = np.sort(
        pd.concat(
            [
                b.to_pandas()
                for b in bucketed_groupby(
                    edges, "s", lambda df: df[["s"]].drop_duplicates(),
                    expected_rows=n_edges,
                ).iter_batches(batch_format="pyarrow", batch_size=65536)
            ]
        )["s"].to_numpy(np.int64)
    )
    pos = {int(v): i for i, v in enumerate(s_ids)}
    pos_ref = ray.put(pos)
    L = n_left
    iu, ju = np.triu_indices(L, 1)

    def comat(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket = a p-COMPLETE slice (bucketed_groupby hashes on p),
        # so every part's full supplier set co-locates here — a plain
        # map_batches split would tear parts across blocks and silently
        # undercount cross-block pairs
        pm = ray.get(pos_ref)
        si = df["s"].map(pm).to_numpy(np.int64)
        p_codes, uniq_p = pd.factorize(df["p"], sort=False)
        B = np.zeros((L, len(uniq_p)), np.float32)
        B[si, p_codes] = 1.0
        M = B @ B.T
        i, j = np.triu_indices(L, 1)
        return pd.DataFrame({"m_flat": [M[i, j].astype(np.int64).tobytes()]})

    m = np.zeros(L * (L - 1) // 2, np.int64)
    for row in bucketed_groupby(
        edges, "p", comat, expected_rows=n_edges
    ).iter_rows():
        m += np.frombuffer(row["m_flat"], np.int64)
    n_wedges = int(m.sum())
    n_butterflies = int((m * (m - 1) // 2).sum())
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
