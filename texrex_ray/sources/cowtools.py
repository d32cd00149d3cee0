"""cowsplit / cowinterleave equivalents.

- cowsplit (ref: trcowsplitapplication.pas:66-95): split corpus output
  every N documents, only at document boundaries.  In Ray Data document
  boundaries are row boundaries, so this is output-file sizing —
  ``write_parquet(min_rows_per_file=N)`` / ``repartition`` — exposed here
  as a thin helper for parity.
- cowinterleave (ref: trcowinterleaveapplication.pas:60-75): merge corpus
  XML with token-annotation streams positionally.  Here both sides carry
  ``doc_id``, so the merge is a keyed equi-join: small side broadcast,
  joined inside ``map_batches`` (no shuffle).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def cowsplit(ds: ray.data.Dataset, out_dir: str, docs_per_file: int) -> None:
    """Write the corpus in files of ~docs_per_file rows (doc boundaries)."""
    try:
        ds.write_parquet(out_dir, min_rows_per_file=docs_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=docs_per_file)


def cowinterleave(
    corpus: ray.data.Dataset,
    annotations: ray.data.Dataset,
    on: str = "doc_id",
) -> ray.data.Dataset:
    """Attach annotation columns to corpus rows by key (broadcast join).

    Assumes the annotation side fits in the object store (it is one row per
    document with small payload); for a large annotation side use the
    bucketed hash-join pattern from ``dedup.tender`` instead.
    """
    ann_df = annotations.to_pandas()
    ann_cols = [c for c in ann_df.columns if c != on]
    lookup_ref = ray.put(
        dict(zip(ann_df[on], zip(*(ann_df[c] for c in ann_cols))))
    )

    def attach(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        keys = t[on].to_pylist()
        for ci, cname in enumerate(ann_cols):
            vals = [
                (lookup[k][ci] if k in lookup else None) for k in keys
            ]
            t = t.append_column(f"ann_{cname}", pa.array(vals))
        return t

    return corpus.map_batches(attach, batch_format="pyarrow")
