"""Deterministic global training-order shuffle with exact positions.

Training wants the corpus in a reproducible pseudo-random order — the
same order on every run, every cluster size, every resume — plus a
global position per row (for curriculum windows, epoch boundaries,
"start from sample 3.1e9").  ``random_shuffle()`` gives neither.

The order key is content-stable: ``md5_lower64(str(id) + ':' + salt)``
(DuckDB-recomputable via ``md5_number_lower``), so the permutation is a
pure function of ids and salt.  One ``Dataset.sort`` on the key is the
unavoidable all-to-all (a global shuffle IS an exchange); positions are
then assigned WITHOUT a serial scan by the q50 two-phase trick:

1. the sorted dataset is materialized (its blocks are the shuffle
   output — at 100 TB this is the pass that writes the training order);
2. per-block summaries (key-lo, key-hi, n) — block-count-sized, never
   row-sized — are prefix-summed on the driver into per-block offsets;
3. a second block-local pass adds offset + within-block index.

Both passes run over the SAME materialized blocks, and pass 2
re-asserts each block's summary, so any block drift fails loudly
instead of silently renumbering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from texrex_ray.functions.hashing import md5_lower64

KEY = "__shuffle_key"


def deterministic_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    pos_col: str = "pos",
) -> ray.data.Dataset:
    """Return ``ds`` in stable pseudo-random order with a global ``pos_col``.

    The result is materialized (the sort output is the deliverable);
    rows keep all input columns, plus int64 positions 0..n-1.
    """

    def add_key(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)  # metadata dicts break sort-reduce schema hashing
        k = md5_lower64([f"{i}:{salt}" for i in t[id_col].to_pylist()])
        return t.append_column(KEY, pa.array(k, pa.uint64()))

    s = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .sort([KEY, id_col])
        .materialize()
    )

    def summary(t: pa.Table) -> pa.Table:
        k = t[KEY].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"lo": pa.array([], pa.uint64()), "hi": pa.array([], pa.uint64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array([int(k[0])], pa.uint64()),
                "hi": pa.array([int(k[-1])], pa.uint64()),
                "n": pa.array([len(k)], pa.int64()),
            }
        )

    parts = (
        s.map_batches(summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    # <= : equal keys straddling a block boundary (duplicate ids) would make
    # the per-block offset lookup ambiguous — refuse loudly.
    if len(parts) > 1 and (
        parts["lo"].to_numpy()[1:] <= parts["hi"].to_numpy()[:-1]
    ).any():
        raise ValueError(
            "deterministic_shuffle: sorted blocks overlap in key range "
            "(duplicate ids in id_col?)"
        )
    csum = parts["n"].cumsum()
    offsets = {
        int(lo): (int(off), int(n))
        for lo, off, n in zip(parts["lo"], csum - parts["n"], parts["n"])
    }
    if len(offsets) != len(parts):
        raise ValueError("deterministic_shuffle: blocks share a first sort key")
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        k = t[KEY].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return t.drop_columns([KEY]).append_column(
                pos_col, pa.array([], pa.int64())
            )
        table = ray.get(ref)
        off, n = table[int(k[0])]
        # elementwise compare, not np.diff: uint64 diff wraps and is never < 0
        if n != len(k) or (k[1:] < k[:-1]).any():
            raise ValueError("deterministic_shuffle: pass-2 block drifted from summary")
        pos = off + np.arange(len(k), dtype=np.int64)
        return t.drop_columns([KEY]).append_column(pos_col, pa.array(pos))

    return s.map_batches(assign, batch_format="pyarrow", batch_size=None)


def sorted_positions(
    ds: ray.data.Dataset,
    key_col: str,
    pos_col: str = "rn",
    base: int = 1,
) -> ray.data.Dataset:
    """Sort by a UNIQUE key column and attach exact global ranks.

    The distributed ROW_NUMBER() OVER (ORDER BY key): one ``Dataset.sort``
    (the unavoidable exchange), then the q50/q66 two-phase block-summary
    prefix — per-block (first, last, n) summaries are block-count-sized,
    the driver prefix-sums offsets, and a second block-local pass adds
    ``offset + arange`` while re-asserting each block's summary, so block
    drift fails loudly instead of silently renumbering.  No serial scan,
    no row-sized driver state.

    ``key_col`` must be UNIQUE (compose a tiebreaker into the key string
    with a separator that sorts below every key character — duplicate keys
    straddling a block boundary are detected and refused).
    """
    s = ds.sort(key_col).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.string()),
                             "hi": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        k = t[key_col]
        return pa.table({
            "lo": pa.array([str(k[0].as_py())]),
            "hi": pa.array([str(k[t.num_rows - 1].as_py())]),
            "n": pa.array([t.num_rows], pa.int64()),
        })

    parts = (
        s.map_batches(summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    if len(parts) > 1 and (
        parts["lo"].to_numpy()[1:] <= parts["hi"].to_numpy()[:-1]
    ).any():
        raise ValueError(
            f"sorted_positions: blocks overlap in {key_col!r} range "
            "(duplicate keys? compose a unique tiebreaker into the key)"
        )
    csum = parts["n"].cumsum()
    offsets = {
        lo: (int(off), int(n))
        for lo, off, n in zip(parts["lo"], csum - parts["n"], parts["n"])
    }
    if len(offsets) != len(parts):
        raise ValueError("sorted_positions: blocks share a first sort key")
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(pos_col, pa.array([], pa.int64()))
        keys = t[key_col].to_pylist()
        off, n = ray.get(ref)[str(keys[0])]
        if n != t.num_rows or any(a > b for a, b in zip(keys, keys[1:])):
            raise ValueError("sorted_positions: pass-2 block drifted from summary")
        if any(a == b for a, b in zip(keys, keys[1:])):
            raise ValueError(
                f"sorted_positions: duplicate {key_col!r} keys — ranks would be "
                "ambiguous; compose a unique tiebreaker into the key"
            )
        pos = base + off + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column(pos_col, pa.array(pos))

    return s.map_batches(assign, batch_format="pyarrow", batch_size=None)
