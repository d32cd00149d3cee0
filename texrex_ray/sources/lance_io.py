"""Image+caption table I/O — Lance when available, Parquet otherwise.

The north rule stores the graft payload "over Lance tables of image +
caption pairs".  Lance is a columnar format with native Ray Data bindings
(``ray.data.read_lance`` / ``Dataset.write_lance``); this container does
not ship the ``lance`` package, so every entry point here degrades to a
Parquet directory with the IDENTICAL schema (BASELINE.json input_hint:
image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64) and the format choice is recorded next to
the data (``_FORMAT`` marker) so readers never guess.

All writes are resumable-safe: tmp + atomic rename, one fragment per
input block (Lance does this natively; the Parquet fallback keeps Ray's
file-per-block layout), so a restarted job can skip finished partitions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

INPUT_HINT_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def have_lance() -> bool:
    """True when the ``lance`` package is importable in this environment."""
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _marker(path: str) -> str:
    return os.path.join(path, "_FORMAT")


def table_format(path: str) -> str:
    """'lance' | 'parquet' for an existing table directory."""
    try:
        with open(_marker(path)) as f:
            return f.read().strip()
    except FileNotFoundError:
        pass
    # autodetect: a Lance dataset directory contains _versions/; fall back
    # to parquet for anything else (including a bare .parquet file path).
    if os.path.isdir(os.path.join(path, "_versions")):
        return "lance"
    return "parquet"


def write_images(
    ds: ray.data.Dataset | pa.Table, path: str, *, fmt: str = "auto"
) -> str:
    """Write an image+caption table; returns the format actually used.

    ``fmt='auto'`` prefers Lance when importable.  A ``pa.Table`` input is
    written directly (small fixtures); a Dataset streams block-per-file.
    """
    if fmt == "auto":
        fmt = "lance" if have_lance() else "parquet"
    os.makedirs(path, exist_ok=True)
    if fmt == "lance":
        if isinstance(ds, pa.Table):
            import lance

            lance.write_dataset(ds, path, mode="overwrite")
        else:
            ds.write_lance(path)
    else:
        if isinstance(ds, pa.Table):
            f = os.path.join(path, "part-00000.parquet")
            # bounded row groups: parquet reads split at row-group
            # granularity, so one giant binary row group would serialize
            # every downstream read into a single task
            pq.write_table(ds, f + ".tmp", row_group_size=512)
            os.replace(f + ".tmp", f)
        else:
            ds.write_parquet(path)
    with open(_marker(path) + ".tmp", "w") as f:
        f.write(fmt)
    os.replace(_marker(path) + ".tmp", _marker(path))
    return fmt


def read_images(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an image+caption table written by ``write_images`` (or any
    Lance/Parquet directory) as a streaming Dataset, with column pruning
    pushed into the read."""
    if table_format(path) == "lance":
        return ray.data.read_lance(path, columns=columns)
    kw = {"columns": columns} if columns else {}
    return ray.data.read_parquet(path, file_extensions=["parquet"], **kw)
