"""Product quantization: compressed vector codes + ADC top-k search.

PQ (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits each d-dim vector into ``m`` subvectors and
quantizes each against its own ``ks``-entry codebook, compressing a
vector to ``m`` bytes; search scores compressed codes against an
uncompressed query with an Asymmetric Distance Computation (ADC) table —
``m × ks`` precomputed subspace distances, one table lookup-sum per
database vector.  The compression/serving sibling of `ivf_ann` (coarse
routing) and `lsh_ann` (hash routing) in `dedup/embed.py`.

Everything is INTEGER-EXACT so any two faithful implementations agree
bit-for-bit (the committed-fixture oracle contract):

- vectors scale to int64 once: ``floor(v·1e6 + 0.5)`` (q69's contract);
- k-means uses squared-L2 on those ints, ties to the LOWEST centroid
  index, and integer centroid updates ``sum // count`` (floor) — no
  float ever enters training, so the sequential pure-python twin in
  tools/gen_oracle_fixtures.py reproduces codebooks exactly;
- ADC distances are int64 sums of int64 subspace distances; top-k ties
  break by neighbor id ascending.

Scale shape: training samples a deterministic hashed subset to the
driver (``sample_mod``, `train_centroids`' contract — bound the sample,
never the corpus); codebooks broadcast once via ``ray.put``; encode and
ADC scoring are stateless vectorized ``map_batches`` over zero-copy
Arrow batches with per-batch partial top-k (`_reduce_topk` finish) — the
corpus never shuffles and never lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from texrex_ray.dedup.embed import _matrix, _reduce_topk, precombine_topk

PQ_SCALE = 1_000_000


def int_scale(m: np.ndarray) -> np.ndarray:
    """float matrix -> int64, floor(v*1e6 + 0.5) (q69's exact contract)."""
    return np.floor(m * PQ_SCALE + 0.5).astype(np.int64)


def _assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin squared-L2 with ties to the lowest index (int64-exact)."""
    # (n, ks) distance matrix; values bounded by d_sub * (2e6)^2 ~ 3e13
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)  # np argmin takes the first (lowest) index on ties


def pq_train(
    ds: ray.data.Dataset,
    *,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Integer-exact per-subspace k-means codebooks, shape (m, ks, d//m).

    Init is the ``ks`` sampled vectors with the smallest ids (no RNG);
    each Lloyd round assigns by integer squared-L2 (ties to the lowest
    centroid) and updates centroids as elementwise ``sum // count``.
    Empty clusters keep their previous centroid.  The sample
    (``stable(id) % sample_mod == 0``) lands on the driver — bound it
    with ``sample_mod`` at scale, as `train_centroids` documents.
    """

    def grab_sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (ids % sample_mod) == 0 if sample_mod > 1 else np.ones(len(ids), bool)
        return t.filter(pa.array(mask)).select([id_col, vec_col])

    df = ds.map_batches(grab_sample, batch_format="pyarrow").to_pandas()
    df = df.sort_values(id_col).reset_index(drop=True)
    x = int_scale(np.asarray(list(df[vec_col]), dtype=np.float64))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < ks:
        raise ValueError(f"sample of {n} rows cannot seed {ks} centroids")
    dsub = d // m
    books = np.empty((m, ks, dsub), dtype=np.int64)
    for mi in range(m):
        xs = x[:, mi * dsub:(mi + 1) * dsub]
        cent = xs[:ks].copy()
        for _ in range(iters):
            a = _assign(xs, cent)
            for c in range(ks):
                members = xs[a == c]
                if len(members):
                    # integer floor mean: per-dim sum // count
                    cent[c] = members.sum(axis=0, dtype=np.int64) // len(members)
        books[mi] = cent
    return books


def pq_encode(
    ds: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """(id, code: list<uint8>[m]) — stateless vectorized encode."""
    m, ks, dsub = codebooks.shape
    books_ref = ray.put(codebooks)

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        x = int_scale(_matrix(t, vec_col))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for mi in range(m):
            codes[:, mi] = _assign(x[:, mi * dsub:(mi + 1) * dsub], books[mi])
        return pa.table(
            {
                id_col: t[id_col],
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), m
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_adc_topk(
    codes: ray.data.Dataset,
    codebooks: np.ndarray,
    queries: dict[int, np.ndarray],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    precombine: bool = False,
) -> pd.DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rank), self excluded.

    ``queries`` maps query id -> RAW float vector; distance tables are
    integer squared-L2 between the int-scaled query subvectors and the
    codebooks, so every ADC distance is an exact int64 and rank order is
    engine-invariant (ties to neighbor id ascending).
    """
    m, ks, dsub = codebooks.shape
    qids = np.asarray(sorted(queries), dtype=np.int64)
    qmat = int_scale(np.asarray([queries[int(q)] for q in qids], dtype=np.float64))
    # dist tables: (n_q, m, ks)
    tables = np.empty((len(qids), m, ks), dtype=np.int64)
    for mi in range(m):
        qs = qmat[:, mi * dsub:(mi + 1) * dsub]
        diff = qs[:, None, :] - codebooks[mi][None, :, :]
        tables[:, mi, :] = (diff.astype(np.int64) ** 2).sum(axis=2)
    t_ref = ray.put((qids, tables))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, tables_ = ray.get(t_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        c = np.asarray(t["code"].to_pylist(), dtype=np.int64)  # (batch, m)
        out_q, out_n, out_d = [], [], []
        kk = min(k + 1, len(ids))
        for qi in range(len(qids_)):
            # ADC: sum of table lookups per subspace
            dist = np.zeros(len(ids), dtype=np.int64)
            for mi in range(m):
                dist += tables_[qi, mi, c[:, mi]]
            top = (
                np.argpartition(dist, kk - 1)[:kk]
                if len(ids) > kk
                else np.arange(len(ids))
            )
            for j in top:
                out_q.append(qids_[qi])
                out_n.append(ids[j])
                out_d.append(dist[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                # negate: _reduce_topk sorts "sim" DESCENDING
                "sim": pa.array([-v for v in out_d], pa.int64()),
            }
        )

    out = codes.map_batches(partial_topk, batch_format="pyarrow")
    if precombine:
        out = precombine_topk(out, k)
    partials = out.to_pandas()
    red = _reduce_topk(partials, k)
    dist = (
        partials.set_index(["query_id", "neighbor_id"])["sim"]
        .groupby(level=[0, 1])
        .max()
    )
    red["adc_dist"] = [
        int(-dist.loc[(q, n)]) for q, n in zip(red["query_id"], red["neighbor_id"])
    ]
    for c in ("query_id", "neighbor_id", "adc_dist", "rank"):
        red[c] = red[c].astype("int64")
    return red[["query_id", "neighbor_id", "adc_dist", "rank"]]


def pq_sequential(
    vectors: dict[int, list[float]],
    query_ids: list[int],
    *,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    k: int = 10,
) -> list[tuple[int, int, int, int]]:
    """Pure-Python sequential twin (fixture oracle): same integer PQ
    contract — scale, floor-mean k-means with lowest-index ties, ADC —
    implemented with dicts and loops, no numpy, no Ray.  Returns
    (query_id, neighbor_id, adc_dist, rank) rows."""
    import math

    ids = sorted(vectors)
    x = {
        i: [int(math.floor(v * PQ_SCALE + 0.5)) for v in vectors[i]] for i in ids
    }
    d = len(x[ids[0]])
    assert d % m == 0
    dsub = d // m

    def sub(vec: list[int], mi: int) -> list[int]:
        return vec[mi * dsub:(mi + 1) * dsub]

    def d2(a: list[int], b: list[int]) -> int:
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    books: list[list[list[int]]] = []
    for mi in range(m):
        cent = [sub(x[i], mi) for i in ids[:ks]]
        for _ in range(iters):
            groups: dict[int, list[list[int]]] = {}
            for i in ids:
                v = sub(x[i], mi)
                best, bd = 0, None
                for ci, c in enumerate(cent):
                    dd = d2(v, c)
                    if bd is None or dd < bd:
                        best, bd = ci, dd
                groups.setdefault(best, []).append(v)
            for ci in range(ks):
                mem = groups.get(ci)
                if mem:
                    cent[ci] = [
                        sum(v[j] for v in mem) // len(mem) for j in range(dsub)
                    ]
        books.append(cent)

    codes = {}
    for i in ids:
        code = []
        for mi in range(m):
            v = sub(x[i], mi)
            best, bd = 0, None
            for ci, c in enumerate(books[mi]):
                dd = d2(v, c)
                if bd is None or dd < bd:
                    best, bd = ci, dd
            code.append(best)
        codes[i] = code

    rows = []
    for q in sorted(query_ids):
        table = [
            [d2(sub(x[q], mi), books[mi][ci]) for ci in range(ks)]
            for mi in range(m)
        ]
        scored = []
        for i in ids:
            if i == q:
                continue
            dist = sum(table[mi][codes[i][mi]] for mi in range(m))
            scored.append((dist, i))
        scored.sort()
        for rank, (dist, i) in enumerate(scored[:k], start=1):
            rows.append((q, i, dist, rank))
    return rows
