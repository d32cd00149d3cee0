"""Corpus writers: XML formatter, shingle / link / token / TARC projections.

Ray-Data re-expressions of the reference writer pool (ref:
trwritetools.pas; pool trwriter.pas:299-370).  Canonical sink is
partitioned parquet (``ds.write_parquet``); the XML formatter reproduces
the reference's document markup for byte-level interop, the rest are
column projections/explosions:

- XML corpus (ref: trwritetools.pas:81-271): ``<doc url id ...>`` +
  ``<meta/>`` + ``<div idx bpc bpv>`` / ``<dup idx of>``.
- shingle writer (ref: :419-441): k rows/doc ``(shingle, doc_id, doc_size)``.
- link writer (ref: :373-416): ``(src_url, link, badness, boiler_score)``
  per kept link; repairs ``http://http://``.
- token writer (ref: :274-310): per-doc top-N ``(type, count, freq)``.
- TARC writer (ref: :313-369): raw passthrough ``(doc_id, header, body)``;
  byte offsets replaced by row addressing (arcxi ≡ filter by id,
  src/programs/arcxi.pas).
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa
import ray.data

from texrex_ray.functions.hashing import doc_id_for_url
from texrex_ray.functions.tokenize import type_counts


def _g6(x: float) -> str:
    """FloatToStrF(…, ffGeneral, 6, 4) equivalent: 6 significant digits."""
    return f"{float(x):.6g}"


def badness_to_bdc(badness: float) -> str:
    """Badness class char (ref: trutilities.pas:965-968)."""
    return chr(round(badness / 2) + 97)


def boiler_to_bpc(score: float) -> str:
    """Boilerplate class char (ref: trutilities.pas:971-976)."""
    return "a" if score <= 0 else chr(round(score * 10) + 97)


def doc_boiler_aggregates(divs: list[dict], threshold: float = 0.55) -> dict:
    """The <doc> boilerplate aggregates (ref: trdeboilerplater.pas:619-699
    DecideMlp statistics): counts/chars split at the MLP threshold, plus
    score averages weighted by div (avgbpd) and by character (avgbpc)."""
    bd = nbd = bc = nbc = 0
    sum_s = 0.0
    sum_sc = 0.0
    for d in divs:
        if not d.get("valid", True):
            continue
        s = float(d.get("boiler_score", 0.0) or 0.0)
        sz = len(d.get("text", "") or "")
        if s > threshold:
            bd += 1
            bc += sz
        else:
            nbd += 1
            nbc += sz
        sum_s += s
        sum_sc += s * sz
    n_valid = bd + nbd
    valid_chars = bc + nbc
    return {
        "nbc": nbc,
        "nbcprop": nbc / valid_chars if valid_chars else -1.0,
        "nbd": nbd,
        "nbdprop": nbd / n_valid if n_valid else -1.0,
        "avgbpc": sum_sc / valid_chars if valid_chars else 0.0,
        "avgbpd": sum_s / n_valid if n_valid else 0.0,
    }


def doc_to_xml(row: dict, write_metrics: bool = False) -> str:
    """One document's corpus-XML (ref: trwritetools.pas:81-271): the
    ``<doc>`` tag carries the badness class (bdc/bdv) and boilerplate
    aggregates (nbc nbcprop nbd nbdprop avgbpc avgbpd), each ``<div>``
    its bpc class char + bpv score; duplicates become ``<dup idx of>``
    backreferences; ``write_metrics`` adds the per-div 37-float
    ``<metrics/>`` element (AWriteDivMetrics)."""
    doc_id = row.get("doc_id") or doc_id_for_url(row.get("url", ""))
    divs = row.get("divs") or []
    badness = float(row.get("badness", 0.0) or 0.0)
    agg = doc_boiler_aggregates(divs)
    parts = [
        f"<doc url={quoteattr(row.get('url', ''))} id={quoteattr(str(doc_id))}"
        f" ip={quoteattr(row.get('ip', '') or '')}"
        f" sourcecharset={quoteattr(row.get('charset', '') or '')}"
        f" sourcedoctype={quoteattr(row.get('doctype', '') or '')}"
        f' bdc="{badness_to_bdc(badness)}" bdv="{_g6(badness)}"'
        f' nbc="{agg["nbc"]}" nbcprop="{_g6(agg["nbcprop"])}"'
        f' nbd="{agg["nbd"]}" nbdprop="{_g6(agg["nbdprop"])}"'
        f' avgbpc="{_g6(agg["avgbpc"])}" avgbpd="{_g6(agg["avgbpd"])}"'
        ">"
    ]
    metas = {
        k[len("meta_"):]: v for k, v in row.items() if k.startswith("meta_") and v
    }
    if row.get("title"):
        metas.setdefault("title", row["title"])
    for k, v in sorted(metas.items()):
        parts.append(f"<meta name={quoteattr(k)} content={quoteattr(str(v))}/>")
    for i, d in enumerate(divs):
        if not d.get("valid", True):
            continue
        dup_of = d.get("dup_of", -1)
        if dup_of is not None and dup_of >= 0:
            parts.append(f'<dup idx="{i}" of="{dup_of}"></dup>')
            continue
        s = float(d.get("boiler_score", 0.0) or 0.0)
        open_tag = f'<div idx="{i}" bpc="{boiler_to_bpc(s)}" bpv="{_g6(s)}">'
        metrics = ""
        if write_metrics and d.get("metrics"):
            vals = " ".join(f"{float(m):.7g}" for m in d["metrics"])
            metrics = f'<metrics value="{vals}" />'
        parts.append(f"{open_tag}{metrics}{escape(d.get('text', ''))}</div>")
    parts.append("</doc>")
    return "\n".join(parts)


def xml_format(batch: pa.Table, write_metrics: bool = False) -> pa.Table:
    """Valid documents only, like the reference writer (which Exits on
    ``not ADocument.Valid``)."""
    rows = batch.to_pylist()
    rows = [r for r in rows if r.get("valid", True)]
    return pa.table(
        {
            "doc_id": pa.array(
                [r.get("doc_id") or doc_id_for_url(r.get("url", "")) for r in rows],
                pa.string(),
            ),
            "xml": pa.array(
                [doc_to_xml(r, write_metrics=write_metrics) for r in rows], pa.string()
            ),
        }
    )


def shingle_rows(batch: pa.Table, fingerprint_col: str = "fingerprint") -> pa.Table:
    """Explode per-doc fingerprints to (shingle, doc_id, doc_size) rows."""
    fps = batch[fingerprint_col].to_pylist()
    urls = batch["url"].to_pylist() if "url" in batch.column_names else None
    ids = (
        batch["doc_id"].to_pylist()
        if "doc_id" in batch.column_names
        else [doc_id_for_url(u) for u in urls]
    )
    sizes = (
        batch["raw_len"].to_pylist()
        if "raw_len" in batch.column_names
        else [0] * len(ids)
    )
    out_s, out_i, out_z = [], [], []
    for fp, i, z in zip(fps, ids, sizes):
        for s in fp or []:
            out_s.append(s)
            out_i.append(i)
            out_z.append(z)
    return pa.table(
        {
            "shingle": pa.array(out_s, pa.uint64()),
            "doc_id": pa.array(out_i),
            "doc_size": pa.array(out_z, pa.int64()),
        }
    )


def link_rows(batch: pa.Table) -> pa.Table:
    """Explode per-doc links to (src_url, link, badness, boiler_score)."""
    urls = batch["url"].to_pylist()
    links = batch["links"].to_pylist()
    bad = (
        batch["badness"].to_pylist()
        if "badness" in batch.column_names
        else [0.0] * len(urls)
    )
    out_u, out_l, out_b = [], [], []
    for u, ls, b in zip(urls, links, bad):
        for link in ls or []:
            # repair the double-scheme artifact (ref: trwritetools.pas:373-416)
            while link.startswith("http://http://") or link.startswith("https://http://"):
                link = link.split("//", 1)[1]
                if not link.startswith(("http://", "https://")):
                    link = "http://" + link
            out_u.append(u)
            out_l.append(link)
            out_b.append(b)
    return pa.table(
        {
            "src_url": pa.array(out_u, pa.string()),
            "link": pa.array(out_l, pa.string()),
            "badness": pa.array(out_b, pa.float64()),
        }
    )


def token_rows(batch: pa.Table, top_n: int = 20) -> pa.Table:
    """Per-doc top-N (doc_id, type, count, freq) (ref: trwritetools.pas:274-310)."""
    ids = (
        batch["doc_id"].to_pylist()
        if "doc_id" in batch.column_names
        else [doc_id_for_url(u) for u in batch["url"].to_pylist()]
    )
    toks = batch["tokens"].to_pylist()
    out_i, out_t, out_c, out_f = [], [], [], []
    for i, ts in zip(ids, toks):
        counts = type_counts(ts or [])
        total = sum(counts.values()) or 1
        for t, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]:
            out_i.append(i)
            out_t.append(t)
            out_c.append(c)
            out_f.append(c / total)
    return pa.table(
        {
            "doc_id": pa.array(out_i),
            "type": pa.array(out_t, pa.string()),
            "count": pa.array(out_c, pa.int64()),
            "freq": pa.array(out_f, pa.float64()),
        }
    )


def tarc_rows(batch: pa.Table) -> pa.Table:
    """Raw passthrough (doc_id, body) — random access by row id (arcxi)."""
    urls = batch["url"].to_pylist()
    raws = batch["raw"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array([doc_id_for_url(u) for u in urls], pa.string()),
            "url": pa.array(urls, pa.string()),
            "body": pa.array(raws, pa.binary()),
        }
    )


def arcxi_lookup(tarc_ds: ray.data.Dataset, doc_id: str) -> bytes | None:
    """Fetch one raw document by id (ref: src/programs/arcxi.pas:30-148)."""
    hit = tarc_ds.filter(expr=f"doc_id == '{doc_id}'").take(1)
    return hit[0]["body"] if hit else None


# ---------------------------------------------------------------------------
# TARC byte-offset archive (ref: trwritetools.pas:313-369) + arcxi extraction
# ---------------------------------------------------------------------------

TARC_MARKER = b"TARC/1.0\n"  # written before EVERY record, dumped or not


def _pascal_trim(s: str) -> str:
    """SysUtils.Trim: strip chars ≤ #32 from both ends."""
    return s.strip("".join(chr(c) for c in range(33)))


def tarc_split(raw: str) -> tuple[str | None, str | None]:
    """The reference's header/body split (trwritetools.pas:320-357):
    header = Trim(DelSpace1(text before the first '<')) — runs of SPACES
    (#32 only, DelSpace1) collapse to one, then a ≤#32 trim; body = from
    the first '<' to the end.  (None, None) when no '<' exists — the
    reference marks such documents ``tarcfile=dumped`` with -1 offsets
    and writes only the record marker."""
    i = raw.find("<")
    if i < 0:
        return None, None
    import re

    header = _pascal_trim(re.sub(" +", " ", raw[:i]))
    return header, raw[i:]


def tarc_manifest(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    raw_col: str = "raw",
    docs_per_shard: int = 100,
    out_dir: str | None = None,
) -> ray.data.Dataset:
    """Compute (and optionally WRITE) the TARC layout: per-doc byte
    offsets inside doc_id-ordered shard files.

    The reference writes one serial stream and records per-doc
    ``tarcheaderoffset/-length`` / ``tarcbodyoffset/-length`` metas as it
    goes (trwritetools.pas:313-369) — inherently single-writer.  The
    Ray-native layout shards the stream by global row number (q50-style
    block-summary prefix sum over the doc_id-sorted input: the driver
    sees one row per block, never documents), then each shard's offsets
    are assigned independently inside ONE ``groupby(shard)`` task — which
    is also the task that streams the shard file to disk when
    ``out_dir`` is given (tmp+rename, so a crashed run never leaves a
    half-written shard visible; re-running overwrites idempotently).
    Record layout per doc: 9-byte ``TARC/1.0\\n`` marker, then (unless
    dumped) header bytes, body bytes, and one ``\\n`` — lengths are UTF-8
    BYTES, offsets are real ``seek()`` positions for ``arcxi``.

    Returns a Dataset (doc_id, tarc_shard, hoff, hlen, boff, blen) with
    -1s for dumped docs, ordered within shards by doc_id.
    """
    import numpy as np
    import pandas as pd
    import ray

    def rec_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        raws = t[raw_col].to_pylist()
        hlen, blen, headers, bodies = [], [], [], []
        for r in raws:
            h, b = tarc_split(r or "")
            if h is None:
                hlen.append(-1)
                blen.append(-1)
                headers.append("")
                bodies.append("")
            else:
                hlen.append(len(h.encode("utf-8")))
                blen.append(len(b.encode("utf-8")) + 1)  # + trailing \n
                headers.append(h)
                bodies.append(b)
        cols = {
            "doc_id": ids,
            "hlen": pa.array(hlen, pa.int64()),
            "blen": pa.array(blen, pa.int64()),
        }
        if out_dir is not None:
            cols["header"] = pa.array(headers, pa.string())
            cols["body"] = pa.array(bodies, pa.string())
        return pa.table(cols)

    rows = ds.map_batches(rec_rows, batch_format="pyarrow")

    # global row numbers via block summaries (the q50 two-phase scan):
    # requires doc_id-range-partitioned input, asserted loudly below
    def block_summary(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array([int(ids[0])], pa.int64()),
                "hi": pa.array([int(ids[-1])], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
            }
        )

    parts = (
        rows.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    if (parts["lo"].to_numpy()[1:] <= parts["hi"].to_numpy()[:-1]).any():
        raise ValueError("tarc_manifest: blocks have overlapping doc_id ranges")
    csum = parts["n"].cumsum()
    offsets = {
        int(lo): (int(off), int(n))
        for lo, off, n in zip(parts["lo"], csum - parts["n"], parts["n"])
    }
    ref = ray.put(offsets)

    def assign_shard(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        off, n = table[int(ids[0])]
        if n != len(ids):
            raise ValueError("tarc_manifest: pass-2 block drifted from pass 1")
        rn = off + np.arange(len(ids), dtype=np.int64)
        return t.append_column(
            "tarc_shard", pa.array(rn // docs_per_shard, pa.int64())
        )

    sharded = rows.map_batches(assign_shard, batch_format="pyarrow", batch_size=None)

    marker_len = len(TARC_MARKER)

    def shard_layout(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        shard = int(g["tarc_shard"].iloc[0])
        hl = g["hlen"].to_numpy()
        bl = g["blen"].to_numpy()
        dumped = hl < 0
        rec = np.where(dumped, marker_len, marker_len + hl + bl)
        start = np.cumsum(rec) - rec  # exclusive prefix: record start
        hoff = np.where(dumped, -1, start + marker_len)
        boff = np.where(dumped, -1, start + marker_len + np.maximum(hl, 0))
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "tarc_shard": shard,
                "hoff": hoff.astype(np.int64),
                "hlen": hl,
                "boff": boff.astype(np.int64),
                "blen": bl,
            }
        )
        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"shard_{shard:05d}.tarc")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                for h, b, dmp in zip(g["header"], g["body"], dumped):
                    f.write(TARC_MARKER)
                    if not dmp:
                        f.write(h.encode("utf-8"))
                        f.write(b.encode("utf-8"))
                        f.write(b"\n")
            os.replace(tmp, path)
            out["tarcfile"] = np.where(dumped, "dumped", path)
        return out

    return sharded.groupby("tarc_shard").map_groups(
        shard_layout, batch_format="pandas"
    )


def write_tarc(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    raw_col: str = "raw",
    docs_per_shard: int = 100,
) -> ray.data.Dataset:
    """Write doc_id-sharded TARC files + return the offsets manifest
    (doc_id, tarc_shard, hoff, hlen, boff, blen, tarcfile)."""
    return tarc_manifest(
        ds,
        id_col=id_col,
        raw_col=raw_col,
        docs_per_shard=docs_per_shard,
        out_dir=out_dir,
    )


def arcxi(path: str, offset: int, length: int) -> bytes:
    """Extract ``length`` bytes at ``offset`` — gzip-transparent, exactly
    the reference extractor (src/programs/arcxi.pas:30-148: seek + read,
    TGZFileStream when the file is gzipped)."""
    if offset < 0 or length < 1:
        raise ValueError("offset must be ≥ 0 and length ≥ 1")
    import gzip

    with open(path, "rb") as probe:
        magic = probe.read(2)
    opener = gzip.open if magic == b"\x1f\x8b" else open
    with opener(path, "rb") as f:
        f.seek(offset)
        buf = f.read(length)
    if len(buf) != length:
        raise ValueError(f"could not read {length} bytes at {offset} from {path}")
    return buf
