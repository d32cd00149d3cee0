"""Distributed table diff: compare two tables WITHOUT moving either.

The 100 TB data-validation problem: after a migration / re-run / index
rebuild, "are these two copies the same, and if not, where?"  A join
would shuffle both corpora; this op instead reduces each side to a
BUCKET-level fingerprint — per hash bucket of the key, a row count and
an order-independent modular checksum over canonicalized rows — so the
exchange is bucket-count-sized and a mismatch names the buckets to
re-scan (resync granularity = corpus / n_buckets, same shape as
state/corpus_index shards).

Checksums are exact integers: per row ``md5_lower64(key|col|col|…) mod
M`` (M = 2⁶¹−1, so sums stay reproducible in any engine with 128-bit or
modular accumulation — DuckDB: ``CAST(sum(md5_number_lower(s) % M) % M
AS BIGINT)``), summed mod M with a vectorized pairwise-fold that never
overflows uint64.  Order-independence makes the checksum layout-proof;
md5 makes it content-stable across runs and machines (the
functions/hashing.py contract).

NULL canonicalization: a NULL value in ``cols`` hashes as chr(0), so
the DuckDB twin MUST wrap every concatenated column in
``COALESCE(CAST(c AS VARCHAR), chr(0))`` — a bare ``||`` would
propagate NULL and silently drop the whole row from the SQL checksum,
fingerprinting the two engines differently (false bucket mismatches).
The KEY column must be non-null (asserted): there is no meaningful
bucket for a missing key, and str(None) vs SQL NULL would route it
differently anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from texrex_ray.functions.hashing import md5_lower64

MOD = (1 << 61) - 1  # Mersenne prime < 2^62: pairwise sums fit uint64


def _mod_sum(h: np.ndarray) -> int:
    """Exact Σ h_i mod MOD via pairwise folding (no uint64 overflow:
    every addition is of two values < 2^61)."""
    v = (h % np.uint64(MOD)).astype(np.uint64)
    while len(v) > 1:
        if len(v) % 2:
            v = np.concatenate([v, np.zeros(1, np.uint64)])
        v = (v[0::2] + v[1::2]) % np.uint64(MOD)
    return int(v[0]) if len(v) else 0


def table_fingerprint(
    ds: ray.data.Dataset,
    key_col: str,
    cols: list[str],
    *,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """(bucket, n_rows, checksum) per key-hash bucket — one streaming
    pass, bucket-count-sized output."""

    def partial(t: pa.Table) -> pa.Table:
        parts = [
            # fill NULL→chr(0) on the ARROW side: pandas fillna("\x00")
            # routes through a numpy '<U1' scalar that TRUNCATES the NUL
            # and silently fills '' instead (ambiguous with real empty
            # strings, and desynced from the documented SQL recipe)
            pc.fill_null(pc.cast(t[c], pa.string()), "\x00").to_pandas()
            for c in cols
        ]
        rows = parts[0].str.cat(parts[1:], sep="|") if len(parts) > 1 else parts[0]
        h = md5_lower64(rows.tolist())
        if t[key_col].null_count:
            raise ValueError(
                f"table_fingerprint: key column {key_col!r} contains NULLs "
                "(no bucket for a missing key; see module doc)"
            )
        b = (md5_lower64([str(v) for v in t[key_col].to_pylist()]) % np.uint64(n_buckets)).astype(np.int64)
        out_b, out_n, out_c = [], [], []
        for bk in np.unique(b):
            m = b == bk
            out_b.append(int(bk))
            out_n.append(int(m.sum()))
            out_c.append(_mod_sum(h[m]))
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int64()),
                "pn": pa.array(out_n, pa.int64()),
                "pc": pa.array(out_c, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # per-bucket partials arrive once per input block: reduce them with
    # PYTHON-int modular sums — an int64 sum of values < 2^61 silently
    # wraps after only 4 partials (shifting the checksum by multiples of
    # 2^64 mod M = 8), and pandas groupby coerces object columns back to
    # int64, so the mod must happen inside the reduction
    g = parts.groupby("bucket")
    out = pd.DataFrame(
        {
            "bucket": np.fromiter(g.groups.keys(), dtype=np.int64),
            "n_rows": g["pn"].sum().to_numpy(dtype=np.int64),
            "checksum": g["pc"]
            .apply(lambda s: sum(int(x) for x in s) % MOD)
            .to_numpy(dtype=np.int64),
        }
    )
    return out.sort_values("bucket").reset_index(drop=True)


def table_diff(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    key_col: str,
    cols: list[str],
    *,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Bucket-level diff of two tables over the same schema: (bucket,
    n_a, n_b, checksum_a, checksum_b, match).  Neither table is joined
    or shuffled — two independent streaming fingerprints, compared on
    the driver (bucket-count-sized)."""
    fa = table_fingerprint(a, key_col, cols, n_buckets=n_buckets).set_index("bucket")
    fb = table_fingerprint(b, key_col, cols, n_buckets=n_buckets).set_index("bucket")
    idx = fa.index.union(fb.index)
    out = pd.DataFrame(
        {
            "bucket": idx.to_numpy(),
            "n_a": fa["n_rows"].reindex(idx, fill_value=0).to_numpy(),
            "n_b": fb["n_rows"].reindex(idx, fill_value=0).to_numpy(),
            "checksum_a": fa["checksum"].reindex(idx, fill_value=0).to_numpy(),
            "checksum_b": fb["checksum"].reindex(idx, fill_value=0).to_numpy(),
        }
    )
    out["match"] = (
        (out["n_a"] == out["n_b"]) & (out["checksum_a"] == out["checksum_b"])
    ).astype("int64")
    for c in ("n_a", "n_b", "checksum_a", "checksum_b"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)
