"""Structure census tail part 1 (HTML depth, drift calibration, flows, periods, scheduling; q247-q296).

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
from texrex_ray.pipelines.queries.flagships import _TENDER_SQL, _TOKEN_RE  # noqa: F401
from texrex_ray.pipelines.queries.corpus_ops import _EDGE_FIXTURE  # noqa: F401
from texrex_ray.pipelines.queries.analytics_a import PPM, ZORDER_FRAG  # noqa: F401
from texrex_ray.pipelines.queries.analytics_b import N_FOLDS, _IMGDIR  # noqa: F401



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
        .to_pandas()  # nation-pair-sized partials per batch
        .groupby(["cust_nation", "supp_nation"], as_index=False)[
            ["n_items", "vol_c"]
        ]
        .sum()
        .rename(columns={"vol_c": "volume_c"})
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

    from texrex_ray.ops.aggregate import bucketed_groupby

    n_ev = ev.count()  # metadata-only on parquet

    def collect(stage_ds) -> dict[int, int]:
        # users-keyed bucketed reduce (NOT the native per-group sort
        # aggregate, and NOT a driver pull of the raw per-batch partials
        # — with many users per batch those approach event count); the
        # driver frame is exactly users-sized, which the broadcast dict
        # needs anyway
        df = bucketed_groupby(
            stage_ds,
            "user_id",
            lambda g: g.groupby("user_id", as_index=False)["t"].min(),
            expected_rows=n_ev,
        ).to_pandas()
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
