"""Zone-map fragment pruning: skip whole parquet files from footer stats.

At 100 TB the cheapest byte is the one never read.  Ray Data's
``read_parquet`` already prunes row groups when a filter expression is
pushed down, but the FILE list itself is assembled first — and a
key-range query over a corpus laid out by that key (date-partitioned
events, doc_id-sharded corpus slices, host-bucketed frontier dumps)
can drop most files before the read plan exists, using only parquet
FOOTER metadata (a few KiB per file, no data pages touched).

``pruned_read(path, column, lo, hi)`` reads each fragment's footer,
keeps files whose [min, max] zone for ``column`` overlaps [lo, hi],
and hands ONLY those to ``ray.data.read_parquet``.  Files with missing
statistics are conservatively kept.  The residual in-file filter is
still applied (zone maps are necessary, not sufficient).

This mirrors what the reference cannot do at all — its readers scan
every file handed to the pool (trreader.pas:780-814) — and what Lance
does natively with fragment-level zone maps; the parquet fallback
keeps the same seam (sources/lance_io.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq
import ray.data


@dataclass
class FragmentZone:
    path: str
    n_rows: int
    vmin: object  # None when the footer carries no stats for the column
    vmax: object


def fragment_zones(path: str, column: str) -> list[FragmentZone]:
    """Per-file (min, max, rows) for ``column`` from parquet footers only.

    ``path`` may be a file or a directory of fragments.  Row-group stats
    are folded to one file-level zone (the footer holds them all; no
    data pages are read).
    """
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    zones: list[FragmentZone] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        try:
            ci = md.schema.to_arrow_schema().names.index(column)
        except ValueError:
            raise KeyError(f"column {column!r} not in {f}")
        vmin, vmax, have = None, None, False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                have = False
                break
            vmin = st.min if vmin is None else min(vmin, st.min)
            vmax = st.max if vmax is None else max(vmax, st.max)
            have = True
        if not have:
            vmin = vmax = None
        zones.append(FragmentZone(f, md.num_rows, vmin, vmax))
    return zones


def prune_fragments(
    zones: list[FragmentZone], lo, hi
) -> tuple[list[str], int, int]:
    """(kept file list, kept count, pruned count); missing stats keep."""
    kept, pruned = [], 0
    for z in zones:
        if z.vmin is None or z.vmax is None or (z.vmax >= lo and z.vmin <= hi):
            kept.append(z.path)
        else:
            pruned += 1
    return kept, len(kept), pruned


def pruned_read(
    path: str,
    *,
    column: str,
    lo,
    hi,
    columns: list[str] | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Zone-map-pruned ``read_parquet`` of rows with lo <= column <= hi.

    Returns (dataset, stats) where stats records files kept/pruned —
    callers should surface it (no silent caps contract).  The residual
    row filter runs inside the read tasks via a pushed-down dataset
    filter expression.
    """
    zones = fragment_zones(path, column)
    kept, n_kept, n_pruned = prune_fragments(zones, lo, hi)
    stats = {
        "files_total": len(zones),
        "files_kept": n_kept,
        "files_pruned": n_pruned,
        "rows_skipped": sum(z.n_rows for z in zones if z.path not in set(kept)),
    }
    if not kept:
        # empty but schema-stable: read zero rows of the first fragment
        ds = ray.data.read_parquet(
            zones[0].path, columns=columns
        ).limit(0)
        return ds, stats
    read_cols = columns
    if read_cols is not None and column not in read_cols:
        read_cols = list(read_cols) + [column]
    ds = ray.data.read_parquet(kept, columns=read_cols)
    ds = ds.filter(expr=f"({column} >= {lo!r}) and ({column} <= {hi!r})")
    if columns is not None and column not in columns:
        ds = ds.select_columns(columns)
    return ds, stats
