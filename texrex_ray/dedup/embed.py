"""Embedding-space operators: brute-force cosine KNN, nearest-neighbor
dedup, and an LSH-bucketed approximate variant (the scale path).

The brute-force path broadcasts the (small) query matrix once with
``ray.put`` and computes per-batch partial top-k inside ``map_batches``
(numpy float64 matmul), then reduces the partials — the full corpus is
never materialized on the driver.  The LSH variant buckets vectors by
random-hyperplane sign bits and searches only within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(t: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list/fixed-size-list column.

    Zero-copy flatten + reshape when the layout allows it (FixedSizeList,
    or a variable list whose offsets are uniform — parquet round-trips
    embeddings as the latter); `to_pylist` was measured ~10× slower."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), dim).astype(np.float64, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        widths = offsets[1:] - offsets[:-1]
        if len(widths) and (widths == widths[0]).all() and arr.null_count == 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(widths[0])).astype(
                np.float64, copy=False
            )
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _reduce_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final per-query top-k over the per-batch partial rows.

    The partials are bounded by n_blocks × n_queries × (k+1) rows — a
    small result by construction — so this reduce runs vectorized on the
    driver (one sort + grouped head) instead of paying a Sort all-to-all
    through the object store for kilobytes of data.  At extreme block
    counts, pre-combine with ``precombine_topk`` first (same function
    inside map_batches)."""
    g = partials[partials["neighbor_id"] != partials["query_id"]]
    g = g.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    g = g.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    g["rank"] = g.groupby("query_id").cumcount() + 1
    return g[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def precombine_topk(partials_ds: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """Distributed intermediate combine for partial top-k streams: keeps
    the best k+1 rows per query PER COALESCED BLOCK, so the driver-side
    final reduce sees n_coalesced_blocks × n_queries × (k+1) rows no
    matter how many map blocks produced partials (the documented
    extreme-block-count fallback of ``_reduce_topk``, now a tested code
    path — pass ``precombine=True`` to the ANN entry points)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
        )
        # keep k+1: the self row (excluded only at the final reduce) must
        # not be allowed to evict a real neighbor here
        return g.groupby("query_id", sort=False).head(k + 1).reset_index(drop=True)

    return partials_ds.repartition(8).map_batches(
        local, batch_format="pandas", batch_size=None
    )


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precombine: bool = False,
) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded.

    Ties broken by neighbor_id ascending (matches the SQL oracle's ORDER BY
    sim DESC, neighbor_id ASC).
    """
    qarr = np.asarray(sorted(query_ids), dtype=np.int64)

    def grab_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, qarr)
        return t.filter(pa.array(mask)).select([id_col, vec_col])

    qdf = ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    qids = qdf[id_col].to_numpy()
    qmat = _unit(np.asarray(list(qdf[vec_col]), dtype=np.float64))
    q_ref = ray.put((qids, qmat))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_matrix(t, vec_col))
        sims = m @ qmat_.T  # (batch, n_queries)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))  # +1 headroom for self row
        for qi in range(len(qids_)):
            col = sims[:, qi]
            top = np.argpartition(-col, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            for j in top:
                out_q.append(qids_[qi])
                out_n.append(ids[j])
                out_s.append(col[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    out = ds.map_batches(partial_topk, batch_format="pyarrow")
    if precombine:
        out = precombine_topk(out, k)
    return _reduce_topk(out.to_pandas(), k)


def nearest_neighbors(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Per-vector argmax-cosine neighbor: (vec_id, nn_id) — exact, fully
    distributed, with NO corpus-sized broadcast or driver materialization.

    Plan (the blockwise pairwise pass): the projected corpus is
    materialized once into object-store blocks and only the block REFS
    circulate; each ``map_batches`` task streams the other blocks one at
    a time from the (shared, spillable) object store and keeps a running
    argmax per row.  Compute is the inherent O(N²/P) of exact all-pairs
    NN; per-task memory is one batch + one block, regardless of corpus
    size.  Strict-improvement updates reproduce ``np.argmax`` first-hit
    tie-breaking over the corpus in block order, so results are
    bit-identical to a single-matrix argmax.  At 10⁹ vectors prefer
    ``ivf_ann``-style cells; this is the exact-oracle path (q16).
    """
    proj = ds.select_columns([id_col, vec_col]).materialize()
    refs_ref = ray.put(proj.to_arrow_refs())

    def block_nn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_matrix(t, vec_col))
        best = np.full(len(ids), -np.inf)
        best_id = np.zeros(len(ids), dtype=np.int64)
        for ref in ray.get(refs_ref):
            blk = ray.get(ref)
            if blk.num_rows == 0:
                continue
            bids = blk[id_col].to_numpy(zero_copy_only=False)
            sims = m @ _unit(_matrix(blk, vec_col)).T
            sims[ids[:, None] == bids[None, :]] = -np.inf  # exclude self
            j = np.argmax(sims, axis=1)
            v = sims[np.arange(len(ids)), j]
            upd = v > best
            best[upd] = v[upd]
            best_id[upd] = bids[j[upd]]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "nn_id": pa.array(best_id, pa.int64())}
        )

    out = proj.map_batches(block_nn, batch_format="pyarrow", batch_size=batch_size)
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


def train_centroids(
    ds: ray.data.Dataset,
    *,
    nlist: int,
    iters: int = 10,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic k-means centroids (unit-sphere) from a hashed sample.

    Training data is the rows with ``stable(id) % sample_mod == 0`` — a
    deterministic, layout-independent sample whose size the caller bounds
    (at 100 TB pick ``sample_mod`` so ~1e6 vectors land on the driver; the
    corpus itself never does).  Init is the ``nlist`` sampled vectors with
    the smallest ids (reproducible without RNG), then ``iters`` Lloyd
    rounds of cosine k-means (normalize → argmax-dot → mean → normalize).
    Empty clusters keep their previous centroid.
    """

    def grab_sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (ids % sample_mod) == 0 if sample_mod > 1 else np.ones(len(ids), bool)
        return t.filter(pa.array(mask)).select([id_col, vec_col])

    df = ds.map_batches(grab_sample, batch_format="pyarrow").to_pandas()
    df = df.sort_values(id_col).reset_index(drop=True)
    x = _unit(np.asarray(list(df[vec_col]), dtype=np.float64))
    if len(x) < nlist:
        raise ValueError(f"sample of {len(x)} rows cannot seed {nlist} centroids")
    cent = x[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return _unit(cent)


def ivf_ann(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    precombine: bool = False,
) -> pd.DataFrame:
    """IVF approximate top-k: coarse k-means cells, per-query probe lists.

    The inverted-file structure is implicit — no index build pass or
    shuffle: centroids (nlist × dim, tiny) broadcast via ``ray.put``; each
    corpus batch assigns its vectors to cells with one matmul-argmax and
    computes sims only for the queries whose ``nprobe`` nearest cells
    include that cell, emitting per-batch partial top-k.  Driver reduce as
    in ``knn_bruteforce``.  With ``nprobe == nlist`` every cell is probed
    and the result is EXACTLY the brute-force top-k (the q36 oracle);
    recall at nprobe < nlist is measured in tests.
    """
    cent = train_centroids(
        ds, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    qarr = np.asarray(sorted(query_ids), dtype=np.int64)

    def grab_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, qarr)
        return t.filter(pa.array(mask)).select([id_col, vec_col])

    qdf = ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    qids = qdf[id_col].to_numpy()
    qmat = _unit(np.asarray(list(qdf[vec_col]), dtype=np.float64))
    # probe table: (n_queries, nlist) bool — the nprobe nearest cells
    qsims = qmat @ cent.T
    order = np.argsort(-qsims, axis=1)[:, :nprobe]
    probe = np.zeros((len(qids), nlist), dtype=bool)
    probe[np.arange(len(qids))[:, None], order] = True
    plan_ref = ray.put((qids, qmat, cent, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_, cent_, probe_ = ray.get(plan_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_matrix(t, vec_col))
        cell = np.argmax(m @ cent_.T, axis=1)
        any_probed = probe_.any(axis=0)[cell]
        ids, m, cell = ids[any_probed], m[any_probed], cell[any_probed]
        out_q, out_n, out_s = [], [], []
        if len(ids):
            sims = m @ qmat_.T
            kk = min(k + 1, len(ids))
            for qi in range(len(qids_)):
                col = np.where(probe_[qi][cell], sims[:, qi], -np.inf)
                top = (
                    np.argpartition(-col, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
                )
                for j in top:
                    if np.isfinite(col[j]):
                        out_q.append(qids_[qi])
                        out_n.append(ids[j])
                        out_s.append(col[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    out = ds.map_batches(partial_topk, batch_format="pyarrow")
    if precombine:
        out = precombine_topk(out, k)
    return _reduce_topk(out.to_pandas(), k)


def lsh_ann(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precombine: bool = False,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane buckets, multi-probe search.

    Vectors hash to an ``n_planes``-bit sign bucket; each query probes its
    own bucket plus all buckets at Hamming distance 1.  The probe plan
    (query matrix + per-query allowed-bucket table — tiny) is broadcast
    once, and the corpus streams through ONE ``map_batches`` pass: each
    batch buckets its vectors, computes sims only against the queries
    whose probe set covers them, and emits per-batch partial top-k rows.
    The tiny partial set reduces in ``_reduce_topk``.  No shuffle of the
    corpus, no driver materialization of corpus-sized data — the scale
    path the brute-force KNN falls back from.  Returns (query_id,
    neighbor_id, rank); recall measured against ``knn_bruteforce`` in
    tests.
    """
    rng = np.random.default_rng(seed)
    # dim taken from the first row
    dim = len(ds.take(1)[0][vec_col])
    planes = rng.standard_normal((dim, n_planes))
    qarr = np.asarray(sorted(query_ids), dtype=np.int64)

    def grab_queries(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, qarr)
        return t.filter(pa.array(mask)).select([id_col, vec_col])

    qdf = ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    qids = qdf[id_col].to_numpy()
    qmat = _unit(np.asarray(list(qdf[vec_col]), dtype=np.float64))
    qbits = (qmat @ planes) > 0
    qbuckets = (qbits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
    # per-query allowed-bucket membership table (n_queries, 2**n_planes)
    probe = np.zeros((len(qids), 1 << n_planes), dtype=bool)
    for qi, b in enumerate(qbuckets):
        probe[qi, b] = True
        for bit in range(n_planes):
            probe[qi, b ^ (1 << bit)] = True
    plan_ref = ray.put((qids, qmat, planes, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_, planes_, probe_ = ray.get(plan_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_matrix(t, vec_col))
        bucket = (((m @ planes_) > 0) * (1 << np.arange(planes_.shape[1]))).sum(
            axis=1
        ).astype(np.int64)
        # rows probed by at least one query
        any_probed = probe_.any(axis=0)[bucket]
        ids, m, bucket = ids[any_probed], m[any_probed], bucket[any_probed]
        out_q, out_n, out_s = [], [], []
        if len(ids):
            sims = m @ qmat_.T  # (batch', n_queries)
            kk = min(k + 1, len(ids))
            for qi in range(len(qids_)):
                col = np.where(probe_[qi][bucket], sims[:, qi], -np.inf)
                top = (
                    np.argpartition(-col, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
                )
                for j in top:
                    if np.isfinite(col[j]):
                        out_q.append(qids_[qi])
                        out_n.append(ids[j])
                        out_s.append(col[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    out = ds.map_batches(partial_topk, batch_format="pyarrow")
    if precombine:
        out = precombine_topk(out, k)
    return _reduce_topk(out.to_pandas(), k)


def semdedup(
    ds: ray.data.Dataset,
    *,
    eps: float = 0.35,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    within each cluster, drop a vector when a LOWER-ID vector in the same
    cluster has cosine similarity >= ``eps``; return the survivors.

    The clustering is an input column (``cluster_col``) — at scale that is
    the k-means assignment from ``train_centroids``/``ivf_ann``'s plan; k
    is chosen so a cluster fits one task, which is SemDeDup's own premise
    (pairwise cosine is only ever computed WITHIN a cluster).  The op is
    then one hash exchange on the cluster key + a vectorized per-group
    mask: normalize in float64, one gram matrix per group, keep row j iff
    no kept-candidate i<j (by id order) reaches eps.  Anti-join semantics
    ("exists ANY lower-id neighbor", not the greedy kept-chain) keep the
    SQL twin non-recursive — q106's oracle is the NOT EXISTS self-join.

    Reference analogue: the shingle/SimHash near-dup family of texrex
    (trshingler.pas) lifted to embedding space.
    """

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        x = _unit(np.asarray(g[vec_col].tolist(), dtype=np.float64))
        s = x @ x.T
        # drop j when any i<j has cos >= eps (strict upper triangle test)
        dup = (np.triu(s >= eps, k=1)).any(axis=0)
        return g.loc[~dup, [id_col, cluster_col]]

    out = (
        ds.groupby(cluster_col)
        .map_groups(prune, batch_format="pandas")
        .to_pandas()  # survivor-id-sized
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    for c in (id_col, cluster_col):
        out[c] = out[c].astype("int64")
    return out[[id_col, cluster_col]]


def cross_nearest_neighbors(
    ds_src: ray.data.Dataset,
    ds_tgt: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Argmax-cosine neighbor of every source vector INSIDE the target
    set: (src_id, nn_id).  Same blockwise-refs plan as
    ``nearest_neighbors`` — the target is materialized once, only block
    refs circulate, each source batch streams target blocks with a
    running strict-improvement argmax (per-task memory = one batch +
    one block).  Mutual-NN alignment composes two calls + an inner
    merge."""
    tgt = ds_tgt.select_columns([id_col, vec_col]).materialize()
    refs_ref = ray.put(tgt.to_arrow_refs())

    def block_nn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _unit(_matrix(t, vec_col))
        best = np.full(len(ids), -np.inf)
        best_id = np.zeros(len(ids), dtype=np.int64)
        for ref in ray.get(refs_ref):
            blk = ray.get(ref)
            if blk.num_rows == 0:
                continue
            bids = blk[id_col].to_numpy(zero_copy_only=False)
            sims = m @ _unit(_matrix(blk, vec_col)).T
            j = np.argmax(sims, axis=1)
            v = sims[np.arange(len(ids)), j]
            upd = v > best
            best[upd] = v[upd]
            best_id[upd] = bids[j[upd]]
        return pa.table(
            {"src_id": pa.array(ids, pa.int64()), "nn_id": pa.array(best_id, pa.int64())}
        )

    out = ds_src.select_columns([id_col, vec_col]).map_batches(
        block_nn, batch_format="pyarrow", batch_size=batch_size
    )
    return out.to_pandas().sort_values("src_id").reset_index(drop=True)
