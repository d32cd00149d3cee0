"""Corpus release / sampling / sketch / graph ops (SRP codes, politeness and parity audits, mixtures, HLL/CMS, pagerank family; q80-q142 era).

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
from texrex_ray.pipelines.queries.flagships import TOKEN_SQL, _GRAMS_CTE, _TOKEN_RE, _doc_bucket, _doc_bucket_filter, _sf_of  # noqa: F401


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
