"""Co-partitioned (bucketed) join: a join with ZERO shuffle.

The oldest big-data trick in the book (Hive bucketed map-join): if two
tables were WRITTEN hash-partitioned on the join key with the same
partition count and hash function — exactly what
``state/resume.py::write_partitioned_by_key`` produces — then every
join key lives in the same partition index on both sides, and the join
decomposes into ``n_partitions`` independent local merges.  No
exchange, no driver state: each Ray task reads one partition pair and
merges it.  At 100 TB this converts the single most expensive join in
a recurring pipeline into a map-only pass, paid for once at layout
time (and the layout is the resumable sink the pipeline wants anyway).

The layout contract is CHECKED, not assumed: both directories must
carry the same committed partition names (``part=XXXX/_COMMIT``); a
mismatch raises — joining across different bucket counts or an
uncommitted write would silently drop keys.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data


def _committed_parts(d: str) -> list[str]:
    return sorted(
        p
        for p in os.listdir(d)
        if p.startswith("part=")
        and os.path.exists(os.path.join(d, p, "_COMMIT"))
    )


def copartitioned_join(
    dir_a: str,
    dir_b: str,
    on: str | list[str],
    *,
    how: str = "inner",
    suffix: str = "_r",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Join two ``write_partitioned_by_key`` layouts partition-by-partition.

    ``how`` ∈ {inner, left}; SQL null-key semantics (null keys never
    match).  Each partition pair merges in one task — the join is
    map-only.  Raises when the layouts disagree.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: co-partitioned join supports inner/left")
    on = [on] if isinstance(on, str) else list(on)
    pa_ = _committed_parts(dir_a)
    pb_ = _committed_parts(dir_b)
    if pa_ != pb_:
        raise ValueError(
            f"co-partition layout mismatch: {dir_a} has {len(pa_)} committed "
            f"partitions, {dir_b} has {len(pb_)} — both sides must be written "
            "by write_partitioned_by_key with the same n_partitions"
        )
    if not pa_:
        raise ValueError(f"no committed partitions under {dir_a}")

    parts = ray.data.from_items(
        [{"part": p} for p in pa_]
    )

    def join_one(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        outs = []
        for p in batch["part"]:
            a = pq.read_table(os.path.join(dir_a, p)).to_pandas()
            b = pq.read_table(os.path.join(dir_b, p)).to_pandas()
            a = a.drop(columns=[c for c in a.columns if c == "__part"], errors="ignore")
            b = b.drop(columns=[c for c in b.columns if c == "__part"], errors="ignore")
            # SQL null-key semantics: null keys never match
            probe = b.dropna(subset=on)
            m = a.merge(probe, on=on, how=how, suffixes=("", suffix))
            if how == "inner":
                m = m.dropna(subset=on)
            outs.append(m)
        return pd.concat(outs, ignore_index=True)

    return parts.map_batches(
        join_one,
        batch_format="pandas",
        batch_size=1,
        **({"concurrency": concurrency} if concurrency else {}),
    )
