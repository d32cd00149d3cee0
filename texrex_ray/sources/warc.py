"""WARC / ARC record readers (and writers for fixtures).

Semantics follow the reference reader (ref: trreader.pas):

- WARC: a record begins at a line equal to ``WARC/1.0`` (``IsBegin``,
  trreader.pas:265-270); WARC headers run to the first blank line;
  ``WARC-Target-URI``, ``WARC-IP-Address`` and the ``Content-Type`` charset
  are extracted, plus configurable extra header keys (``CrawlHeaderExtract``,
  trreader.pas:279-305); the record body is everything up to the next
  record start (scan loop trreader.pas:423-517).
- ARC: a record starts at a line matching ``http://url ip date mime size``
  (trreader.pas:311-391); the first line carries the metadata.
- raw-size clamps: records outside [min_doc_size, max_doc_size] are
  dropped (trreader.pas:211-214, 483-489; defaults 2 KiB / 256 KiB).

Ray mapping: ``ray.data.read_binary_files`` (one task per file — the
reference's reader-pool file work-stealing for free, trreader.pas:610-674)
→ a ``map_batches`` splitter yielding one Arrow row per record.  Gzip
members are decompressed transparently per file.
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa
import ray.data

WARC_BEGIN = b"WARC/1.0"
ARC_BEGIN_RE = re.compile(rb"^https?://\S+ \d+\.\d+\.\d+\.\d+ \S+ \S+ \d+$", re.M)
_CHARSET_RE = re.compile(rb"charset=([A-Za-z0-9_\-]+)", re.I)


def _warc_header_get(head: bytes, key: bytes) -> str:
    m = re.search(rb"(?im)^" + re.escape(key) + rb":\s*(.+?)\s*$", head)
    return m.group(1).decode("utf-8", "replace") if m else ""


def split_warc(
    data: bytes,
    min_doc_size: int = 0,
    max_doc_size: int = 256 * 1024,
    extract_headers: tuple[str, ...] = (),
) -> list[dict]:
    """One dict per WARC record: url, ip, charset, headers, body."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    starts = [m.start() for m in re.finditer(rb"(?m)^WARC/1\.0\r?$", data)]
    starts.append(len(data))
    for s, e in zip(starts[:-1], starts[1:]):
        rec = data[s:e]
        if min_doc_size and len(rec) < min_doc_size:
            continue
        if max_doc_size and len(rec) > max_doc_size:
            continue
        hdr_end = rec.find(b"\r\n\r\n")
        if hdr_end < 0:
            hdr_end = rec.find(b"\n\n")
            body_off = hdr_end + 2
        else:
            body_off = hdr_end + 4
        head = rec[:hdr_end] if hdr_end > 0 else rec
        body = rec[body_off:] if hdr_end > 0 else b""
        cm = _CHARSET_RE.search(head)
        row = {
            "url": _warc_header_get(head, b"WARC-Target-URI"),
            "ip": _warc_header_get(head, b"WARC-IP-Address"),
            "charset": cm.group(1).decode().lower() if cm else "",
            "raw": body,
            "raw_len": len(rec),
        }
        for k in extract_headers:
            row[f"hdr_{k.lower().replace('-', '_')}"] = _warc_header_get(
                head, k.encode()
            )
        out.append(row)
    return out


def split_arc(
    data: bytes, min_doc_size: int = 0, max_doc_size: int = 256 * 1024
) -> list[dict]:
    """One dict per ARC record (url ip date mime size header line)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    starts = [m.start() for m in ARC_BEGIN_RE.finditer(data)]
    starts.append(len(data))
    for s, e in zip(starts[:-1], starts[1:]):
        rec = data[s:e]
        nl = rec.find(b"\n")
        if nl < 0:
            continue
        first = rec[:nl].decode("utf-8", "replace").split(" ")
        if len(first) != 5:
            continue
        url, ip, date, mime, _size = first
        body = rec[nl + 1 :]
        if min_doc_size and len(rec) < min_doc_size:
            continue
        if max_doc_size and len(rec) > max_doc_size:
            continue
        out.append(
            {"url": url, "ip": ip, "date": date, "mime": mime, "raw": body,
             "charset": "", "raw_len": len(rec)}
        )
    return out


def _records_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return pa.table(
            {"url": pa.array([], pa.string()), "ip": pa.array([], pa.string()),
             "charset": pa.array([], pa.string()), "raw": pa.array([], pa.binary()),
             "raw_len": pa.array([], pa.int64())}
        )
    keys = list(rows[0].keys())
    return pa.table({k: pa.array([r.get(k) for r in rows]) for k in keys})


def read_warc(
    paths: str | list[str],
    *,
    min_doc_size: int = 2048,
    max_doc_size: int = 256 * 1024,
    extract_headers: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Dataset of WARC records (one row per record, one read task per file)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def splitter(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t["bytes"].to_pylist():
            rows.extend(
                split_warc(blob, min_doc_size, max_doc_size, extract_headers)
            )
        return _records_to_table(rows)

    return files.map_batches(splitter, batch_format="pyarrow")


def read_arc(
    paths: str | list[str],
    *,
    min_doc_size: int = 2048,
    max_doc_size: int = 256 * 1024,
) -> ray.data.Dataset:
    files = ray.data.read_binary_files(paths, include_paths=True)

    def splitter(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t["bytes"].to_pylist():
            rows.extend(split_arc(blob, min_doc_size, max_doc_size))
        return _records_to_table(rows)

    return files.map_batches(splitter, batch_format="pyarrow")


# -- fixture writers --------------------------------------------------------

def make_warc_bytes(records: list[dict]) -> bytes:
    """records: dicts with url, ip, body (bytes), charset."""
    parts = []
    for r in records:
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-IP-Address: {r.get('ip', '0.0.0.0')}\r\n"
            f"Content-Type: text/html; charset={r.get('charset', 'utf-8')}\r\n"
            f"Content-Length: {len(r['body'])}\r\n"
            f"\r\n"
        ).encode()
        parts.append(head + r["body"] + b"\r\n\r\n")
    return b"".join(parts)


def make_arc_bytes(records: list[dict]) -> bytes:
    parts = []
    for r in records:
        line = (
            f"{r['url']} {r.get('ip', '1.2.3.4')} 20150101000000 text/html "
            f"{len(r['body'])}\n"
        ).encode()
        parts.append(line + r["body"] + b"\n")
    return b"".join(parts)
