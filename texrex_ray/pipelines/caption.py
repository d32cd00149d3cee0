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

    def _layout_current() -> bool:
        # a fixture cached before the bounded-row-group fix keeps its one
        # giant row group (and its single-task read) forever unless the
        # freshness check inspects the layout, not just existence
        try:
            return pq.read_metadata(imgs_p).num_row_groups == -(-n // 512)
        except Exception:
            return False

    if not (
        os.path.exists(imgs_p)
        and os.path.exists(exp_p)
        and os.path.exists(os.path.join(tbl_d, "_FORMAT"))
        and _layout_current()
    ):
        os.makedirs(d, exist_ok=True)
        images, expected = make_images(n=n, seed=seed)
        # bounded row groups: a single-row-group binary column serializes
        # the whole read into ONE task (Ray splits parquet at row-group
        # granularity) — measured 1.5 s of the images bench leg at n=10k
        pq.write_table(images, imgs_p + ".tmp", row_group_size=512)
        pq.write_table(expected, exp_p + ".tmp", row_group_size=4096)
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


_WINNER_CACHE: dict[str, object] = {}


def _cached_winner_ids(refs_ref):
    """Assemble the winner-id membership array once per worker process
    from broadcast BLOCK REFS (the q16 pattern: ids stream block-by-block
    through plasma — the driver never holds the concatenated list).
    Single-slot cache: one dedup's filter stages share one ref."""
    import ray

    key = refs_ref.hex()
    arr = _WINNER_CACHE.get(key)
    if arr is None:
        blocks = ray.get(list(ray.get(refs_ref)))
        parts = []
        for b in blocks:
            if not isinstance(b, pa.Table):  # stray empty pandas block
                if "image_id" not in getattr(b, "columns", ()):
                    continue
                b = pa.Table.from_pandas(b[["image_id"]], preserve_index=False)
            col = b["image_id"]
            parts.append(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )
        arr = pa.concat_arrays(parts) if parts else pa.array([], pa.string())
        _WINNER_CACHE.clear()
        _WINNER_CACHE[key] = arr
    return arr


def image_caption_pipeline(
    ds: ray.data.Dataset,
    *,
    decoder_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    with_features: bool = True,
    dedup: bool = True,
    expected_rows: int | None = None,
    winner_plan: str = "auto",
) -> ray.data.Dataset:
    """``winner_plan`` picks the phash keep-first decision plan:
    ``"single"`` is one combine task + driver-held winner list (fastest
    at bench scale), ``"shuffle"`` decides winners with a bucketed
    groupby on the narrow projection and ships the winner ids as plasma
    block refs (never concatenated on the driver) — the corpus-scale
    path.  ``"auto"`` switches on ``expected_rows`` > 5M."""
    if winner_plan not in ("auto", "single", "shuffle"):
        raise ValueError(f"unknown winner_plan={winner_plan!r}")
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    if dedup:
        import pandas as pd
        import pyarrow.compute as pc
        import ray

        # keep-first per phash WITHOUT shuffling the wide rows (bytes stay
        # put): winners are decided on a projected (phash, image_id)
        # stream — two narrow columns of the INPUT (phash and image_id are
        # input columns, untouched by every later stage) — then the wide
        # stream is filtered by a winner-id membership set (the tecl
        # broadcast-semi-join pattern) BEFORE the decode stages, so loser
        # rows are never decoded and the expensive chain executes exactly
        # once (a post-decode winner pass would re-execute the lazy decode
        # lineage a second time).  Either plan below keeps the image
        # bytes out of every all-to-all; they differ only in where the
        # narrow winner decision happens.
        def first_ids(g: pd.DataFrame) -> pd.DataFrame:
            w = (
                g.sort_values(["phash", "image_id"])
                .drop_duplicates("phash", keep="first")
            )
            return w[["image_id"]].reset_index(drop=True)

        proj = ds.select_columns(["phash", "image_id"])
        use_shuffle = winner_plan == "shuffle" or (
            winner_plan == "auto"
            and expected_rows is not None
            and expected_rows > 5_000_000
        )
        if use_shuffle:
            # corpus-scale plan: winners per phash via the coarse-bucket
            # exchange (exact — keep-first is a pure per-key aggregation),
            # then the winner ids stay in the object store as block refs;
            # each filter worker assembles the membership array lazily,
            # once per process.  Nothing row-scaled touches the driver.
            from texrex_ray.ops.aggregate import bucketed_groupby

            winners_ds = bucketed_groupby(
                proj, "phash", first_ids, expected_rows=expected_rows
            ).materialize()
            refs_ref = ray.put(winners_ds.to_arrow_refs())

            def keep_winners(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.is_in(t["image_id"], value_set=_cached_winner_ids(refs_ref))
                )

        else:
            winners = (
                proj.repartition(1)
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
