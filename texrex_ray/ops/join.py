"""Distributed equi-joins for Ray Data.

Ray Data (2.49) has no join operator; every join in this repo so far was an
inline broadcast pattern (q06/q07/q08/q53) or a bucketed self-join
(dedup/tender.py).  This module makes both shapes public, reusable
operators:

``broadcast_join``
    Small right side: ship it ONCE via ``ray.put``, probe per batch with a
    vectorized pandas merge / Arrow ``is_in``.  The big side never
    shuffles.  This is the right plan whenever the build side fits in one
    worker's heap (dimension tables, blacklists, seed sets) — at 100 TB the
    fact stream is the only thing that moves, and it moves zero times.

``shuffle_join``
    Big-big: both sides are Datasets.  Each side tags rows with
    ``bucket = row_hash(keys) % n_buckets``, the union shuffles ONCE on
    bucket, and every bucket merges its two sides with one vectorized
    pandas merge.  ``n_buckets`` scales with the input (``auto_buckets``)
    so one bucket ≈ one in-memory group regardless of corpus size — the
    same scale shape as dedup/tender.py's pair join.  Equal keys land in
    equal buckets by construction, so the result is exact for all join
    types; skew is bounded per-bucket, and a pathologically hot key is the
    caller's cue to pre-aggregate or salt (see dedup/tender.py
    max_redundancy for the dedup-flavored version of that guard).

Join types: inner / left / right / outer / semi / anti (semi and anti
return left columns only, matching tecl's white/black list semantics,
trteclapplication.pas:248-368).

Null-key rows never match (SQL semantics): they are dropped on the probe
side for inner/semi, kept unmatched for left/outer/anti.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from texrex_ray.dedup.tender import auto_buckets

_SIDE, _BUCKET = "__side", "__bucket"


def _canon_dtype(t) -> object:
    """Canonical pandas dtype for a column that may acquire nulls.

    Nullable extension dtypes ("Int64", "boolean") round-trip to plain
    Arrow int64/bool with nulls when Ray converts the pandas group output
    back to a block, so every group emits one unified schema even when
    some groups have no matches (all-NA right side) and others are fully
    matched.  ``t`` is an Arrow DataType for Arrow-block datasets, a
    pandas/numpy dtype (or None for object columns) for pandas blocks.
    """
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "float64"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_timestamp(t):
            return f"datetime64[{t.unit}]"
        return "object"
    s = str(t)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "Int64"
    if s.startswith(("float", "Float")):
        return "float64"
    if s in ("bool", "boolean"):
        return "boolean"
    if s.startswith("datetime64"):
        return s
    return "object"


def _na_for(dtype) -> object:
    """The NA scalar each dtype's constructor accepts."""
    s = str(dtype)
    if s.startswith("float"):
        return np.nan
    if s.startswith("datetime"):
        return pd.NaT
    if s in ("Int64", "boolean"):
        return pd.NA
    return None


def _schema_dtypes(ds: ray.data.Dataset) -> dict[str, object]:
    sch = ds.schema()
    return {n: _canon_dtype(t) for n, t in zip(sch.names, sch.types)}


def _row_hash(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Deterministic, process-stable row hash over the key columns.

    ``hash_pandas_object`` is purely algorithmic (fixed default hash key,
    no PYTHONHASHSEED dependence), so the two sides — hashed in different
    worker processes — agree on every key's bucket.  Not persisted
    anywhere, so cross-version stability is not required (contrast
    stable_hash64, used for checkpointed state).
    """
    return pd.util.hash_pandas_object(df[cols], index=False).to_numpy()


def _keys_str(df: pd.DataFrame, cols: list[str]) -> list[str]:
    """One canonical string per key row (must agree across both sides)."""
    if len(cols) == 1:
        return [str(v) for v in df[cols[0]]]
    return ["|".join(str(v) for v in t) for t in zip(*(df[c] for c in cols))]


def _merge_key_dtype(lt, rt):
    """Canonical dtype a KEY column pair joins under, or None when the
    families are incompatible (the merge itself would raise).

    Same family → the left (merge-canonical) dtype; mixed int/float → the
    merge's own coercion target, nullable Float64 (casting a fractional
    float to Int64 raises 'cannot safely cast', and int '2' vs float
    '2.0' would desync the Bloom prefilter from the merge even when it
    doesn't)."""

    def kind(t):
        t = pd.api.types.pandas_dtype(t)
        if pd.api.types.is_float_dtype(t):
            return "f"
        if pd.api.types.is_integer_dtype(t):
            return "i"
        if pd.api.types.is_bool_dtype(t):
            return "b"
        return "o"

    kl, kr = kind(lt), kind(rt)
    if kl == kr:
        return lt
    if {kl, kr} == {"i", "f"}:
        return "Float64"  # nullable: an NA-bearing Int64 batch still casts
    return None


_BLOOM_CACHE: dict[str, object] = {}


def _cached_bloom(snap_ref):
    """Restore a broadcast Bloom snapshot once per worker process.

    Bounded to the MOST RECENT snapshot: a long-lived worker running many
    bloom-prefiltered joins would otherwise accumulate every restored
    filter forever.  Within one join all batches share one ref, so the
    single-slot policy never thrashes."""
    key = snap_ref.hex()
    b = _BLOOM_CACHE.get(key)
    if b is None:
        from texrex_ray.state.bloom import ScalingBloom

        b = ScalingBloom.restore(ray.get(snap_ref))
        _BLOOM_CACHE.clear()
        _BLOOM_CACHE[key] = b
    return b


def _finalize_arrow(df: pd.DataFrame) -> pa.Table:
    """Convert the pandas group output to an Arrow block explicitly.

    Ray's own pandas→Arrow schema unification cannot interpret nullable
    extension dtypes (``from_numpy_dtype(Int64Dtype())`` raises), which
    degrades columns to object blocks downstream; ``Table.from_pandas``
    maps Int64/boolean to proper nullable Arrow int64/bool."""
    return pa.Table.from_pandas(df, preserve_index=False)


def _resolve_names(
    left_cols: list[str],
    right_cols: list[str],
    on: list[str],
    right_on: list[str],
    suffix: str,
) -> dict[str, str]:
    """Right-side rename map: key cols take the left names (so pandas
    coalesces them in outer joins), payload collisions get ``suffix``."""
    ren: dict[str, str] = {}
    for lc, rc in zip(on, right_on):
        ren[rc] = lc
    taken = set(left_cols)
    for c in right_cols:
        if c in ren:
            continue
        ren[c] = c + suffix if c in taken else c
    return ren


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def broadcast_join(
    left: ray.data.Dataset,
    right: pa.Table | pd.DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    right_on: str | list[str] | None = None,
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Join a Dataset against a small in-memory right side, broadcast once.

    The right side is put in the object store a single time; every map
    task reads the same zero-copy ref.  Per batch the probe is one pandas
    hash merge (inner/left) or an index membership test (semi/anti) — no
    shuffle, no driver round-trips.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"broadcast_join supports inner/left/semi/anti, not {how!r}")
    on, right_on = _as_list(on), _as_list(right_on if right_on is not None else on)
    rdf = right.to_pandas() if isinstance(right, pa.Table) else right.copy()
    ren = _resolve_names(left.schema().names, list(rdf.columns), on, right_on, suffix)
    rdf = rdf.rename(columns=ren)
    # SQL semantics: null build-side keys never match anything
    rdf = rdf.dropna(subset=on)
    if how in ("semi", "anti"):
        rdf = rdf[on].drop_duplicates()
    ref = ray.put(rdf)
    out_dtypes = {c: str(t) for c, t in rdf.dtypes.items() if c not in on}

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        if how in ("semi", "anti"):
            m = df.merge(r, on=on, how="left", indicator=True)["_merge"] == "both"
            mask = m.to_numpy()
            return df[mask] if how == "semi" else df[~mask]
        out = df.merge(r, on=on, how=how)
        if how == "left":
            # unify group schemas: unmatched batches must not demote ints
            for c, t in out_dtypes.items():
                if t.startswith("int"):
                    out[c] = out[c].astype("Int64")
            return _finalize_arrow(out)
        return out

    return left.map_batches(probe, batch_format="pandas")


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    *,
    how: str = "inner",
    right_on: str | list[str] | None = None,
    suffix: str = "_r",
    n_buckets: int | None = None,
    expected_rows: int | None = None,
    hot_keys=None,
    skew_salt: int = 8,
    bloom_prefilter: bool = False,
    bloom_fpr: float = 0.01,
) -> ray.data.Dataset:
    """Bucketed hash join of two Datasets (the big-big plan).

    One shuffle total: both sides map to (bucket, side, superset columns),
    union, ``groupby(bucket).map_groups`` merges each bucket with a single
    vectorized pandas merge.  Memory per task is one bucket's rows —
    bounded by ``auto_buckets`` scaling, not by corpus size.

    Skew: a pathologically hot key would pile its whole left side into one
    bucket.  Pass the hot values as ``hot_keys`` (scalars, or tuples for
    multi-column keys) and their left rows spread over ``skew_salt``
    sub-buckets while their right rows replicate into all of them — every
    pair still meets exactly once, the hot bucket shrinks ×skew_salt.
    Cold keys are untouched (sub-bucket 0).  Only inner/left/semi/anti
    support salting: replicating the right side would duplicate the
    unmatched rows a right/outer join must emit once.

    ``bloom_prefilter=True`` (inner/semi) builds a Bloom filter over the
    build side's keys and drops non-matching probe rows before the
    shuffle — exact results (false positives merely probe and miss), with
    exchange volume ∝ match set for selective joins.
    """
    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if hot_keys is not None and how in ("right", "outer"):
        raise ValueError("hot_keys salting supports inner/left/semi/anti only")
    if bloom_prefilter and how not in ("inner", "semi"):
        raise ValueError("bloom_prefilter supports inner/semi only")
    on, right_on = _as_list(on), _as_list(right_on if right_on is not None else on)
    l_dtypes = _schema_dtypes(left)
    r_dtypes_raw = _schema_dtypes(right)
    ren = _resolve_names(list(l_dtypes), list(r_dtypes_raw), on, right_on, suffix)
    r_dtypes = {ren[c]: t for c, t in r_dtypes_raw.items()}

    semi_mode = how in ("semi", "anti")
    if semi_mode:
        right = right.select_columns(right_on)
        r_dtypes = {c: r_dtypes[c] for c in on}

    left_cols = list(l_dtypes)
    right_cols = list(r_dtypes)
    # superset layout both sides emit: keys once, then each side's payload
    all_cols = left_cols + [c for c in right_cols if c not in on]
    col_dtype = {**r_dtypes, **l_dtypes}  # key cols take the left dtype…
    # …unless the PAIR coerces: a mixed int/float key joins under Float64
    # on BOTH sides (pandas-merge semantics), so the superset cast, the
    # Bloom stringification, and the output dtype all follow the pair
    for c1, c2 in zip(on, right_on):
        d = _merge_key_dtype(l_dtypes[c1], r_dtypes_raw[c2])
        if d is not None:
            col_dtype[c1] = d

    if n_buckets is None:
        n_buckets = auto_buckets(expected_rows)
    shuffle_blocks = (
        max(8, min(256, int(np.ceil(expected_rows / 50_000)))) if expected_rows else 16
    )

    if bloom_prefilter:
        # Build a compact membership filter over the build side's keys and
        # drop probe rows that cannot match BEFORE the shuffle — for a
        # selective join the exchange volume collapses to ~the match set
        # (+ fpr).  False positives only cost a futile merge probe, so the
        # result is exact.  The Bloom streams through the driver once in
        # O(filter) memory; beyond ~10⁹ build keys, partition the join
        # first and build per-partition filters instead.
        from texrex_ray.state.bloom import ScalingBloom

        def _bloom_keys(df: pd.DataFrame, cols: list[str]) -> list[str]:
            # cast to the join's pair-canonical key dtype FIRST (see
            # col_dtype above): both sides must stringify identically or
            # matching probe rows silently vanish from the filter
            cast = pd.DataFrame(
                {c2: df[c2].astype(col_dtype[c1]) for c1, c2 in zip(on, cols)}
            )
            return _keys_str(cast, cols)

        bloom_ok = True
        bloom = ScalingBloom(
            initial_capacity=max(
                100_000, (expected_rows or 0) // 2
            ),
            error_rate=bloom_fpr,
        )
        try:
            for bdf in right.select_columns(right_on).iter_batches(
                batch_format="pandas", batch_size=65536
            ):
                bloom.add_if_new(_bloom_keys(bdf, right_on))
        except (TypeError, ValueError):
            # unexpected unsafe cast on the build side: a filter missing
            # any build key would DROP matching probe rows, so disable
            # the prefilter outright (it is an optimization, never
            # required for correctness)
            bloom_ok = False

        if bloom_ok:
            snap_ref = ray.put(bloom.snapshot())

            def bloom_flt(df: pd.DataFrame) -> pd.DataFrame:
                try:
                    keys = _bloom_keys(df, on)
                except (TypeError, ValueError):
                    return df  # un-castable probe batch: pass through unfiltered
                return df[_cached_bloom(snap_ref).contains_many(keys)]

            left = left.map_batches(bloom_flt, batch_format="pandas")

    hot_set = None
    if hot_keys is not None:
        hot_set = {k if isinstance(k, tuple) else (k,) for k in hot_keys}

    def _hot_mask(df: pd.DataFrame) -> np.ndarray:
        if len(on) == 1:
            return df[on[0]].isin({k[0] for k in hot_set}).to_numpy()
        return (
            pd.Series(list(zip(*(df[c] for c in on))), index=df.index)
            .isin(hot_set)
            .to_numpy()
        )

    def widen(side: int, rename: dict[str, str] | None):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if rename:
                df = df.rename(columns=rename)
            out = pd.DataFrame(index=df.index)
            for c in all_cols:
                out[c] = (
                    df[c].astype(col_dtype[c])
                    if c in df.columns
                    else pd.Series(_na_for(col_dtype[c]), index=df.index, dtype=col_dtype[c])
                )
            out[_SIDE] = np.int8(side)
            base = (_row_hash(out, on) % np.uint64(n_buckets)).astype(np.int64)
            if hot_set is None:
                out[_BUCKET] = base
                return out
            hot = _hot_mask(out)
            if side == 0:
                # probe side: spread hot rows round-robin over sub-buckets
                salt = np.arange(len(out), dtype=np.int64) % skew_salt
                salt[~hot] = 0
                out[_BUCKET] = base * skew_salt + salt
                return out
            # build side: cold rows to sub-bucket 0, hot rows to ALL
            out[_BUCKET] = base * skew_salt
            cold = out[~hot]
            hot_rows = out[hot]
            reps = [
                hot_rows.assign(**{_BUCKET: hot_rows[_BUCKET] + s})
                for s in range(skew_salt)
            ]
            return pd.concat([cold, *reps], ignore_index=True)

        return fn

    tagged = left.map_batches(widen(0, None), batch_format="pandas").union(
        right.map_batches(widen(1, ren), batch_format="pandas")
    )

    out_cols = left_cols if semi_mode else all_cols

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g[_SIDE] == 0][left_cols]
        rf = g[g[_SIDE] == 1][right_cols]
        # SQL semantics: a null key never matches anything.  pandas merge
        # matches NaN == NaN, so null-key rows are split out of the merge
        # and re-attached unmatched where the join type keeps them
        # (NOT-EXISTS semantics for anti).
        l_null = lf[on].isna().any(axis=1).to_numpy()
        r_null = rf[on].isna().any(axis=1).to_numpy()
        lk, ln = lf[~l_null], lf[l_null]
        rk, rn = rf[~r_null], rf[r_null]
        if semi_mode:
            m = lk.merge(rk.drop_duplicates(), on=on, how="left", indicator=True)
            mask = (m["_merge"] == "both").to_numpy()
            out = lk[mask] if how == "semi" else pd.concat([lk[~mask], ln])
        else:
            out = lk.merge(rk, on=on, how=how)
            extras = []
            if how in ("left", "outer") and len(ln):
                extras.append(ln)
            if how in ("right", "outer") and len(rn):
                extras.append(rn)
            if extras:
                out = pd.concat([out, *extras], ignore_index=True)
        out = out.reindex(columns=out_cols)
        for c in out_cols:  # merge/reindex can demote dtypes on all-NA sides
            want = col_dtype[c]
            if str(out[c].dtype) != str(want):
                if str(want).startswith("datetime"):
                    out[c] = pd.to_datetime(out[c]).astype(want)
                else:
                    out[c] = out[c].astype(want)
        return out

    return (
        tagged.repartition(shuffle_blocks)
        .groupby(_BUCKET)
        .map_groups(merge_bucket, batch_format="pandas")
        .map_batches(_finalize_arrow, batch_format="pandas")
    )


def join(
    left: ray.data.Dataset,
    right,
    on: str | list[str],
    *,
    how: str = "inner",
    right_on: str | list[str] | None = None,
    suffix: str = "_r",
    broadcast_threshold_rows: int = 2_000_000,
    plan: str = "auto",
    **shuffle_kwargs,
) -> ray.data.Dataset:
    """Plan-selecting join: broadcast when the build side is small, else
    the bucketed shuffle.

    ``right`` may be an in-memory pandas DataFrame / Arrow Table (always
    broadcast when ``how`` allows it) or a Dataset, in which case its row
    count decides: ≤ ``broadcast_threshold_rows`` and a broadcast-capable
    ``how`` (inner/left/semi/anti) → collect + broadcast (the build side
    moves once, the probe side never shuffles); otherwise the shuffle
    join.  ``plan`` forces "broadcast" or "shuffle" explicitly.

    ``right.count()`` is metadata-only for parquet reads; on a derived
    Dataset it executes the upstream pipeline — pass ``plan="shuffle"``
    (or a materialized right side) when that cost is unacceptable.
    """
    if plan not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown plan={plan!r}")
    in_memory = isinstance(right, (pd.DataFrame, pa.Table))
    can_broadcast = how in ("inner", "left", "semi", "anti")
    if plan == "broadcast" and not can_broadcast:
        raise ValueError(f"broadcast plan cannot express how={how!r}")

    if in_memory:
        if can_broadcast and plan != "shuffle":
            return broadcast_join(
                left, right, on, how=how, right_on=right_on, suffix=suffix
            )
        tbl = right if isinstance(right, pa.Table) else pa.Table.from_pandas(
            right, preserve_index=False
        )
        right = ray.data.from_arrow(tbl)
        return shuffle_join(
            left, right, on, how=how, right_on=right_on, suffix=suffix,
            **shuffle_kwargs,
        )

    if plan == "auto" and can_broadcast:
        # pin the right side before the size probe: count() on a derived
        # Dataset executes its upstream pipeline, and the subsequent
        # collect (or shuffle) would execute it AGAIN — materialize makes
        # the build side run once, whichever plan wins
        right = right.materialize()
    if plan == "broadcast" or (
        plan == "auto"
        and can_broadcast
        and right.count() <= broadcast_threshold_rows
    ):
        keep = _as_list(right_on if right_on is not None else on)
        proj = keep if how in ("semi", "anti") else None
        collected = (right.select_columns(proj) if proj else right).to_pandas()
        return broadcast_join(
            left, collected, on, how=how, right_on=right_on, suffix=suffix
        )
    return shuffle_join(
        left, right, on, how=how, right_on=right_on, suffix=suffix, **shuffle_kwargs
    )
