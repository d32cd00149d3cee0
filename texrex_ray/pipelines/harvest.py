"""Crawl→image bridge: harvest ``<img>``+caption refs out of the crawled
corpus into the canonical image+caption table (the graft's A+B
integration).

The crawl engine (``collect_images=True``) buffers per-document
``img_srcs``/``img_caps`` list columns into its corpus parquet.  This
module turns that corpus into the BASELINE.json input_hint table
``(image_id, bytes, w, h, fmt, caption, phash)``:

1. **explode** — corpus rows → one row per image reference, with the
   deterministic visit-order key ``(round, walker_id, pos)`` (each walker
   fetches ≤1 URL per round and refs keep document order, so the key is a
   total order on references that is independent of physical layout).
2. **first-wins dedup** — one row per distinct ``src``: the reference with
   the smallest visit-order key wins (the image-channel analogue of the
   Bloom URL-seen first-wins gate; the winning caption is the first one the
   crawl saw).  Small inputs resolve in a single combine task; the scale
   path hash-buckets by ``src`` so no group exceeds ~1/n_buckets of the
   refs and the winner merge is a vectorized ``drop_duplicates`` per
   bucket (the tender exchange pattern, dedup/tender.py).
3. **fetch + decode header** — an actor-pool ``map_batches`` stage
   resolves ``src`` → container bytes.  In the sandbox the "CDN" is the
   synthetic web graph's deterministic image store, broadcast ONCE via
   ``ray.put`` and materialized per actor in ``__init__``; in production
   this actor holds the HTTP session pool + politeness budget and the
   store ref is absent.  Dims/format come from the container header,
   ``phash`` from the decoded pixels (sources/images.py contract).

Downstream, the harvested table feeds ``image_caption_pipeline`` (caption
cleanse → decode/verify → features → phash dedup) unchanged — captions
harvested from page HTML carry exactly the entity/tag dirt the cleansing
chain handles.

Reference analogue: texrex consumes pre-fetched ARC/WARC; ClaraX fetches
pages only (trwalkers.pas has no image channel).  The harvest is the
graft-mandated extension, grafted on the corpus output so the walk itself
(visit order, URL-seen — the pinned fidelity surface) is untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from texrex_ray.crawl.fetcher import ArrowKeyedStore
from texrex_ray.functions.hashing import doc_id_for_url, stable_hash64

HARVEST_COLS = ["url", "round", "walker_id", "img_srcs", "img_caps"]


def explode_image_refs(batch: pa.Table) -> pa.Table:
    """One output row per harvested image reference.

    Adds ``pos`` (0-based index of the ref within its page, document
    order) so ``(round, walker_id, pos)`` totally orders references."""
    srcs = pc.list_flatten(batch["img_srcs"])
    caps = pc.list_flatten(batch["img_caps"])
    parent = pc.list_parent_indices(batch["img_srcs"])
    counts = pc.list_value_length(batch["img_srcs"]).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    pos = np.arange(int(counts.sum()), dtype=np.int64) - starts
    return pa.table(
        {
            "src": srcs,
            "caption": caps,
            "page_url": pc.take(batch["url"], parent),
            "round": pc.take(batch["round"], parent),
            "walker_id": pc.take(batch["walker_id"], parent),
            "pos": pa.array(pos, pa.int64()),
        }
    )


def _first_refs(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized winner merge: smallest (round, walker_id, pos) per src."""
    w = df.sort_values(["src", "round", "walker_id", "pos"], kind="mergesort")
    return w.drop_duplicates("src", keep="first").reset_index(drop=True)


def first_wins_refs(
    refs: ray.data.Dataset,
    *,
    n_buckets: int | None = None,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """One row per distinct src — first reference in visit order wins.

    ``n_buckets=None`` (small inputs / oracle queries): a single combine
    task.  ``n_buckets=N`` (scale path): hash-partition by src first so
    each winner merge sees ~1/N of the refs; output is identical.
    ``expected_rows`` coalesces the exploded refs to ~50k-row blocks before
    the bucket groupby — Ray's sort-shuffle pays per-(map-block × reduce-
    slice) fixed costs, so many tiny blocks dominate wall time at bench
    scale (measured 2.4 s → 0.8 s here; same lesson as dedup/tender.py's
    exchange coalescing)."""
    if n_buckets is None:
        return refs.repartition(1).map_batches(
            _first_refs, batch_format="pandas", batch_size=None
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = stable_hash64(t["src"].to_pylist(), seed=7)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    bucketed = refs.map_batches(add_bucket, batch_format="pyarrow")
    if expected_rows is not None:
        bucketed = bucketed.repartition(max(1, expected_rows // 50_000))

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        return _first_refs(g).drop(columns=["bucket"])

    return bucketed.groupby("bucket").map_groups(bucket_first, batch_format="pandas")


class ArrowBytesStore(ArrowKeyedStore):
    """Zero-copy synthetic CDN: (img_url → encoded bytes) as ONE Arrow
    table (the 10x bench graph's 113k-image dict cost ~1 s of deserialize
    per fetcher actor).  Same .get(url) duck type as the dict it
    replaces; shared machinery in ``crawl/fetcher.py::ArrowKeyedStore``."""

    @classmethod
    def from_dict(cls, store: dict) -> "ArrowBytesStore":
        return cls(
            pa.table(
                {
                    "url": pa.array(list(store.keys()), pa.string()),
                    "bytes": pa.array(list(store.values()), pa.large_binary()),
                }
            )
        )

    def get(self, url: str):
        i = self._row(url)
        return None if i is None else self._tbl["bytes"][i].as_py()


class ImageFetcher:
    """Actor-pool stage: src → container bytes + header dims + phash.

    ``store_ref``: ``ray.put`` handle to the synthetic CDN store
    (``ArrowBytesStore``, or any .get(url)→bytes|None object), attached
    once per actor.  Misses (a page referenced an image the store never
    served) are dropped, counted in ``fetch_misses``.  Production
    swap-in: an HTTP client pool with the same ``__call__`` contract."""

    def __init__(self, store_ref) -> None:
        self.store = ray.get(store_ref) if isinstance(store_ref, ray.ObjectRef) else store_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from texrex_ray.sources.images import MAGIC, decode_image

        fmt_of = {v: k for k, v in MAGIC.items()}
        keep, raws, ws, hs, fmts, phs = [], [], [], [], [], []
        import hashlib

        for s in batch["src"].to_pylist():
            raw = self.store.get(s)
            if raw is None:
                keep.append(False)
                continue
            keep.append(True)
            raws.append(raw)
            ws.append(int.from_bytes(raw[4:8], "big"))
            hs.append(int.from_bytes(raw[8:12], "big"))
            fmts.append(fmt_of.get(raw[:4], "unknown"))
            d = hashlib.blake2b(decode_image(raw).tobytes(), digest_size=8).digest()
            phs.append(int.from_bytes(d, "big", signed=True))
        t = batch.filter(pa.array(keep, pa.bool_()))
        return (
            t.append_column("bytes", pa.array(raws, pa.binary()))
            .append_column("w", pa.array(ws, pa.int32()))
            .append_column("h", pa.array(hs, pa.int32()))
            .append_column("fmt", pa.array(fmts, pa.string()))
            .append_column("phash", pa.array(phs, pa.int64()))
        )


def harvest_images(
    corpus: ray.data.Dataset,
    image_store: dict[str, bytes] | ray.ObjectRef,
    *,
    n_buckets: int | None = None,
    expected_rows: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Corpus (with img_srcs/img_caps) → input_hint image+caption table.

    Output columns: ``image_id bytes w h fmt caption phash`` plus
    provenance ``src page_url round walker_id`` (select the canonical 7
    before writing the Lance table — ``harvest_to_table``)."""
    if isinstance(image_store, ray.ObjectRef):
        ref = image_store
    else:
        ref = ray.put(
            ArrowBytesStore.from_dict(image_store)
            if isinstance(image_store, dict)
            else image_store
        )
    refs = corpus.map_batches(explode_image_refs, batch_format="pyarrow")
    winners = first_wins_refs(refs, n_buckets=n_buckets, expected_rows=expected_rows)
    kw: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is None:
        fetched = winners.map_batches(ImageFetcher(ref), **kw)
    else:
        fetched = winners.map_batches(
            ImageFetcher,
            fn_constructor_kwargs={"store_ref": ref},
            concurrency=concurrency,
            **kw,
        )

    def add_id(t: pa.Table) -> pa.Table:
        ids = [doc_id_for_url(s) for s in t["src"].to_pylist()]
        return t.append_column("image_id", pa.array(ids, pa.string()))

    return fetched.map_batches(add_id, batch_format="pyarrow").select_columns(
        [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "src", "page_url", "round", "walker_id",
        ]
    )


def harvest_to_table(harvested: ray.data.Dataset, path: str) -> str:
    """Write the canonical 7-column input_hint table (Lance when
    available, schema-identical parquet fallback); returns the format."""
    from texrex_ray.sources.lance_io import write_images

    canonical = harvested.select_columns(
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    return write_images(canonical, path)
