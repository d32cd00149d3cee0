"""Flagship image+caption pipeline (the graft payload path).

read images table → caption cleanse (SecondPass → Normalizer → NFC) →
decode+stats (actor pool) → features (actor pool) → phash exact dedup →
cleaned table.  This is texrex's cleaning chain grafted onto the
image+caption "document": caption ≈ div text, bytes ≈ RawText, phash ≈
the exact-dup fingerprint (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from texrex_ray.sources.images import make_images
from texrex_ray.stages import textchain as tc
from texrex_ray.stages.images import ImageDecoder, ImageFeatures


def fixture_path(n: int, seed: int = 42, root: str = "/tmp/texrex_ray_fixtures") -> str:
    """Write (once) and return the deterministic images fixture dir.

    The payload table lands twice: a plain ``images.parquet`` (DuckDB
    oracle input) and an ``images_table/`` written through
    ``lance_io.write_images`` — Lance when the package is available, the
    schema-identical Parquet fallback here (north rule: the pipeline runs
    over Lance tables of image+caption pairs)."""
    from texrex_ray.sources.lance_io import write_images

    d = os.path.join(root, f"images_n{n}_s{seed}")
    imgs_p = os.path.join(d, "images.parquet")
    exp_p = os.path.join(d, "images_expected.parquet")
    tbl_d = os.path.join(d, "images_table")
    if not (
        os.path.exists(imgs_p)
        and os.path.exists(exp_p)
        and os.path.exists(os.path.join(tbl_d, "_FORMAT"))
    ):
        os.makedirs(d, exist_ok=True)
        images, expected = make_images(n=n, seed=seed)
        pq.write_table(images, imgs_p + ".tmp")
        pq.write_table(expected, exp_p + ".tmp")
        os.replace(imgs_p + ".tmp", imgs_p)
        os.replace(exp_p + ".tmp", exp_p)
        write_images(images, tbl_d)
    return d


def caption_clean_stage(batch: pa.Table) -> pa.Table:
    """SecondPass + Normalizer + NFC over the caption column."""
    t = batch.rename_columns(
        [c if c != "caption" else "text" for c in batch.column_names]
    )
    t = tc.secondpass(t)
    t = tc.normalize(t)
    return t.rename_columns([c if c != "text" else "caption" for c in t.column_names])


def image_caption_pipeline(
    ds: ray.data.Dataset,
    *,
    decoder_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    with_features: bool = True,
    dedup: bool = True,
) -> ray.data.Dataset:
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    if dedup:
        import pandas as pd
        import pyarrow.compute as pc
        import ray

        # keep-first per phash WITHOUT shuffling the wide rows (bytes stay
        # put): winners are decided on a projected (phash, image_id)
        # stream — two narrow columns of the INPUT (phash and image_id are
        # input columns, untouched by every later stage) — then the wide
        # stream is filtered by a broadcast winner-id set (the tecl
        # broadcast-semi-join pattern) BEFORE the decode stages, so loser
        # rows are never decoded and the expensive chain executes exactly
        # once (a post-decode winner pass would re-execute the lazy decode
        # lineage a second time).  At small/bench scale the winner
        # decision is one combine task; beyond ~1e8 uniques decide winners
        # with groupby("phash") on the projection and shard the filter —
        # either way the image bytes never enter an all-to-all.
        def first_ids(g: pd.DataFrame) -> pd.DataFrame:
            w = (
                g.sort_values(["phash", "image_id"])
                .drop_duplicates("phash", keep="first")
            )
            return w[["image_id"]].reset_index(drop=True)

        winners = (
            ds.select_columns(["phash", "image_id"])
            .repartition(1)
            .map_batches(first_ids, batch_format="pandas", batch_size=None)
            .to_pandas()["image_id"]
        )
        win_ref = ray.put(pa.array(winners))

        def keep_winners(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["image_id"], value_set=ray.get(win_ref)))

        ds = ds.map_batches(keep_winners, **kw)
    ds = ds.map_batches(caption_clean_stage, **kw)
    if decoder_concurrency is None:
        ds = ds.map_batches(ImageDecoder(), **kw)
        if with_features:
            ds = ds.map_batches(ImageFeatures(), **kw)
    else:
        ds = ds.map_batches(ImageDecoder, concurrency=decoder_concurrency, **kw)
        if with_features:
            ds = ds.map_batches(ImageFeatures, concurrency=decoder_concurrency, **kw)
    return ds
