"""The full texrex document pipeline over raw WARC-style records.

This is the §2.2 worker chain on its native input (ref:
trworker.pas:422-621): records (url, ip, raw bytes) →

  charset detect/convert → HTML strip (nested divs w/ tag stats) →
  simple document filter → meta extract → second pass (entities +
  cleansing per div) → deboilerplate (37 features + MLP actor) →
  normalizer + NFC per div → in-doc div dedup → tokenize/assess over
  non-boilerplate divs → shingle fingerprint → geolocate

Nested ``divs`` stay one-row-per-document throughout (windowed
boilerplate features and in-doc dedup are per-document semantics —
SURVEY.md §7.4); exploding to paragraph rows happens only in writers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from texrex_ray.crawl.fetcher import decode_content
from texrex_ray.functions.cleanse import cleanse_full
from texrex_ray.functions.hashing import minhash_signatures
from texrex_ray.functions.normalize import nfc, normalize_text, utf8_size
from texrex_ray.functions.striphtml import strip_html
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE, rel_freqs, type_counts
from texrex_ray.sources.profiles import default_profiles
from texrex_ray.stages.boilerplate import Deboilerplater
from texrex_ray.stages.divdedup import div_dedup
from texrex_ray.stages.geolocate import Geolocator, synthetic_geo_blocks
from texrex_ray.stages.metaextract import extract_meta
from texrex_ray.functions.assess import LanguageProfile, assess_multi


def charset_and_strip(batch: pa.Table) -> pa.Table:
    """Decode (charset detect w/ meta override) + strip to nested divs.

    (ref: trcharsetconverter.pas:93-147 + trhtmlstripper.pas:595-704)
    """
    urls = batch["url"].to_pylist()
    raws = batch["raw"].to_pylist()
    declared = (
        batch["charset"].to_pylist()
        if "charset" in batch.column_names
        else [""] * len(urls)
    )
    out_divs, charsets, titles, doctypes, heads, links = [], [], [], [], [], []
    for raw, decl in zip(raws, declared):
        text, cs = decode_content(raw or b"", decl or "")
        sr = strip_html(text)
        if sr.meta_charset and sr.meta_charset not in (cs, ""):
            text, cs = decode_content(raw or b"", sr.meta_charset)
            sr = strip_html(text)
        out_divs.append(
            [
                {
                    "text": d.text, "open_tags": d.open_tags,
                    "close_tags": d.close_tags, "anchors": d.anchors,
                    "container": d.container, "skipped": d.skipped,
                    "valid": True, "dup_of": -1,
                    "boiler_score": 0.0, "boilerplate": False,
                }
                for d in sr.div_infos
            ]
        )
        charsets.append(cs)
        titles.append(sr.title)
        doctypes.append(sr.doctype)
        heads.append(text[:4096])
        links.append(sr.links)
    return (
        batch.drop_columns([c for c in ("charset",) if c in batch.column_names])
        .append_column("divs", pa.array(out_divs))
        .append_column("charset", pa.array(charsets, pa.string()))
        .append_column("title", pa.array(titles, pa.string()))
        .append_column("doctype", pa.array(doctypes, pa.string()))
        .append_column("head", pa.array(heads, pa.string()))
        .append_column("links", pa.array(links, pa.list_(pa.string())))
    )


def simple_document_filter(
    batch: pa.Table, size_threshold: int = 1000, div_threshold: int = 2
) -> pa.Table:
    """Kill docs below UTF-8 size / valid-div-count thresholds.

    (ref: trsimpledocumentfilter.pas:81-89; demo INI uses 1000/2)
    """
    divs_col = batch["divs"].to_pylist()
    valid = []
    for divs in divs_col:
        sz = sum(utf8_size(d["text"]) for d in divs or [])
        valid.append(sz >= size_threshold and len(divs or []) >= div_threshold)
    v = pa.array(valid, pa.bool_())
    if "valid" in batch.column_names:
        v = pc.and_(batch["valid"], v)
        return batch.set_column(batch.schema.get_field_index("valid"), "valid", v)
    return batch.append_column("valid", v)


def meta_stage(batch: pa.Table) -> pa.Table:
    heads = batch["head"].to_pylist()
    metas = [extract_meta(h or "") for h in heads]
    for key in ("keywords", "author", "description", "robots"):
        batch = batch.append_column(
            f"meta_{key}", pa.array([m.get(key, "") for m in metas], pa.string())
        )
    return batch


def secondpass_divs(batch: pa.Table) -> pa.Table:
    """Entity decode + junk blanking per div (ref: trsecondpass.pas:233-282);
    empty divs invalidated.  Meta fields are cleansed the same way (ref:
    trsecondpass.pas:217-229 Metarator: entity decode → cleanse → trim →
    multi-space collapse), including the title."""
    divs_col = batch["divs"].to_pylist()
    out = []
    for divs in divs_col:
        new = []
        for d in divs or []:
            s, n_tag, n_email, n_uri, n_hash = cleanse_full(d["text"])
            new.append(
                {**d, "text": s, "valid": bool(s) and d.get("valid", True),
                 "cleansed": n_tag + n_email + n_uri + n_hash}
            )
        out.append(new)
    batch = batch.set_column(batch.schema.get_field_index("divs"), "divs", pa.array(out))
    meta_cols = [c for c in batch.column_names if c.startswith("meta_") or c == "title"]
    for c in meta_cols:
        vals = [cleanse_full(v or "")[0].strip() for v in batch[c].to_pylist()]
        batch = batch.set_column(
            batch.schema.get_field_index(c), c, pa.array(vals, pa.string())
        )
    return batch


def normalize_divs(batch: pa.Table) -> pa.Table:
    """Normalizer + NFC per div (ref: trnormalizer.pas, trnfcnormalizer.pas)."""
    divs_col = batch["divs"].to_pylist()
    out = []
    for divs in divs_col:
        new = []
        for d in divs or []:
            s = nfc(normalize_text(d["text"]))
            new.append({**d, "text": s, "valid": bool(s.strip()) and d.get("valid", True)})
        out.append(new)
    return batch.set_column(batch.schema.get_field_index("divs"), "divs", pa.array(out))


class DocAssessor:
    """Tokenize + language/badness over non-boilerplate valid divs
    (ref: trunicodeletterrangetokenizer.pas + trtextassessment.pas)."""

    def __init__(self, profiles=None, threshold: float = 5.0, max_boiler: float = 0.5):
        profs = profiles if profiles is not None else default_profiles()
        self.profiles = [LanguageProfile.parse(n, t) for n, t in profs]
        self.threshold = threshold
        self.max_boiler = max_boiler

    def __call__(self, batch: pa.Table) -> pa.Table:
        divs_col = batch["divs"].to_pylist()
        langs, bads, toks_out = [], [], []
        for divs in divs_col:
            toks: list[str] = []
            for d in divs or []:
                if d.get("valid", True) and d.get("boiler_score", 0.0) <= self.max_boiler:
                    toks.extend(LATIN_TOKEN_RE.findall(d["text"]))
            rf = rel_freqs(type_counts(toks))
            lang, b = assess_multi(rf, self.profiles)
            langs.append(lang)
            bads.append(b)
            toks_out.append(toks)
        batch = (
            batch.append_column("pred_lang", pa.array(langs, pa.string()))
            .append_column("badness", pa.array(np.array(bads)))
            .append_column("tokens", pa.array(toks_out, pa.list_(pa.string())))
        )
        ok = pc.less_equal(batch["badness"], pa.scalar(self.threshold))
        v = pc.and_(batch["valid"], ok)
        return batch.set_column(batch.schema.get_field_index("valid"), "valid", v)


def shingle_stage(batch: pa.Table, k: int = 100, scheme: str = "rabin") -> pa.Table:
    """Document fingerprint column (ref: trshingler.pas:97-150).

    Default is the reference-faithful Rabin64 minhash over the ported
    trpoly64 table — values interchangeable with reference shingle files;
    docs without enough tokens keep the all-ones no-fingerprint marker.
    """
    toks = batch["tokens"].to_pylist()
    if scheme == "rabin":
        from texrex_ray.functions.rabin import rabin_minhash_signatures

        sig, _ = rabin_minhash_signatures(toks, k=k)
    else:
        sig = minhash_signatures(toks, k=k)
    col = pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1)), k)
    return batch.append_column("fingerprint", col)


def raw_docs_pipeline(
    ds: ray.data.Dataset,
    *,
    minhash_k: int = 100,
    batch_size: int = 512,
    boiler_concurrency: int | tuple[int, int] | None = None,
    boiler_opts: dict | None = None,
    filter_opts: dict | None = None,
    geo_blocks=None,
    drop_invalid: bool = True,
) -> ray.data.Dataset:
    """``boiler_opts`` / ``filter_opts`` override the deboilerplater and
    SimpleDocumentFilter kill thresholds (the reference exposes the same
    knobs via INI, data/texrex.ini:107-130) — e.g. small-page fixture
    corpora need lower ``min_good_chars`` / ``size_threshold`` than the
    web-scale defaults of 500 / 1000."""
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    bo = boiler_opts or {}
    fo = filter_opts or {}
    ds = ds.map_batches(charset_and_strip, **kw)
    ds = ds.map_batches(lambda b: simple_document_filter(b, **fo), **kw)
    ds = ds.map_batches(meta_stage, **kw)
    ds = ds.map_batches(secondpass_divs, **kw)
    if boiler_concurrency is None:
        ds = ds.map_batches(Deboilerplater(**bo), **kw)
    else:
        ds = ds.map_batches(
            Deboilerplater, fn_constructor_kwargs=bo, concurrency=boiler_concurrency, **kw
        )
    ds = ds.map_batches(normalize_divs, **kw)
    ds = ds.map_batches(lambda b: div_dedup(b), **kw)
    ds = ds.map_batches(DocAssessor(), **kw)
    ds = ds.map_batches(lambda b: shingle_stage(b, k=minhash_k), **kw)
    starts, ends, locations = geo_blocks if geo_blocks else synthetic_geo_blocks()
    ds = ds.map_batches(Geolocator(starts, ends, locations), **kw)
    ds = ds.map_batches(lambda b: b.drop_columns(["tokens", "head"]), **kw)
    if drop_invalid:
        ds = ds.map_batches(lambda b: b.filter(b["valid"]), **kw)
    return ds
