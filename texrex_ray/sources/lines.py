"""Line reader with transparent gzip over multiple files.

Reference semantics (ref: trfilein.pas / trfileinh.pas:28-82): buffered
line reads over plain or gzipped files, auto-advancing over a file list;
the ``PeekedLine`` merge facility maps to sorted Dataset merges.

Ray mapping: one read task per file (``read_binary_files``) + a gunzip +
line-split ``map_batches`` — the reader pool's file work-stealing comes
for free from task scheduling (trreader.pas:610-674).
"""

from __future__ import annotations

import gzip

import pyarrow as pa
import ray.data


def read_lines(paths: str | list[str], encoding: str = "utf-8") -> ray.data.Dataset:
    """Dataset of (path, line_no, line) rows; gzip members auto-detected."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def split(t: pa.Table) -> pa.Table:
        out_p, out_n, out_l = [], [], []
        for path, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            for i, line in enumerate(blob.decode(encoding, "replace").splitlines()):
                out_p.append(path)
                out_n.append(i)
                out_l.append(line)
        return pa.table(
            {
                "path": pa.array(out_p, pa.string()),
                "line_no": pa.array(out_n, pa.int64()),
                "line": pa.array(out_l, pa.string()),
            }
        )

    return files.map_batches(split, batch_format="pyarrow")
