"""SURVEY §2 flagship pipelines and core training-data ops (relational aggregates, joins, exact/near dedup, crawl, media pipelines; q01-q79 era).

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
