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
    """Broadcast hash join: tiny nation table shipped once via ray.put."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def attach(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        names = [lookup.get(k) for k in t["c_nationkey"].to_pylist()]
        return t.append_column("n_name", pa.array(names, pa.string()))

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
    """Broadcast anti-join (tecl blacklist mode, trteclapplication.pas:248-368)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    black = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    black_ref = ray.put(black)
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def anti(t: pa.Table) -> pa.Table:
        b = ray.get(black_ref)
        mask = [k not in b for k in t["o_custkey"].to_pylist()]
        return t.filter(pa.array(mask)).select(["o_orderkey"])

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
    """Broadcast semi-join (tecl --white mode)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    white = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    white_ref = ray.put(white)
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def semi(t: pa.Table) -> pa.Table:
        w = ray.get(white_ref)
        mask = [k in w for k in t["o_custkey"].to_pylist()]
        return t.filter(pa.array(mask)).select(["o_orderkey"])

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
    """Session windows (30-min gap) per user: groupby(user).map_groups.

    Partitioning assumption: one user's events fit one group (holds at any
    realistic user cardinality; hot users would be salted by day).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        new_sess = (gap.isna() | (gap > 1800)).astype("int64")
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_sess.sum())],
                "n_events": [len(g)],
            }
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)
