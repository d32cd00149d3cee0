"""Cross-modal duplicate clustering over image+caption pairs.

The graft payload (BASELINE.json input_hint) is a table of image +
caption rows.  Re-encoded images drift in pHash only a few bits;
re-captioned mirrors keep the text but swap the pixels; scraped copies
often perturb BOTH a little.  A dedup pass that looks at one modality
misses half the copies, so the production rule is the UNION of two
near-dup edge sets:

    pixels : Hamming(phash) <= d            (block-LSH, dedup/lsh.py)
    text   : Jaccard(caption 2-gram sets) >= t   (integer threshold)

fused by connected components (dedup/clusters.py) and resolved to one
canonical member per cluster (highest resolution, ties to smaller id)
— the cross-modal generalization of q72's pixels-only election.

Scale shape: caption pairs use the tender/q14 exchange plan (distinct
grams exploded where the rows live, per-image set size riding the gram
rows, ONE gram-keyed bucketed exchange with a redundancy cap, pair
counts closed in a pair-keyed bucketed combine); pixel pairs use the
pigeonhole multi-index; both edge lists are RESULT-sized.  The image
bytes never enter either exchange.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_TOKEN_RE = re.compile(r"[a-z]+")


def caption_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "image_id",
    text_col: str = "caption",
    num: int = 7,
    den: int = 10,
    max_redundancy: int = 200,
    expected_rows: int | None = None,
) -> ray.data.Dataset:
    """(id_a, id_b) string-id pairs with 2-gram Jaccard >= num/den.

    Integer-exact threshold: ``den·|∩| >= num·(|A|+|B|-|∩|)`` — no float
    compare, bit-identical to the SQL twin.  Set sizes ride the gram
    rows (max-reduce per pair), so no corpus-sized dict is broadcast.
    Gram groups larger than ``max_redundancy`` are skipped (the tender
    redundancy cap, trshinglehelpers.pas:436-437): a gram shared by
    thousands of captions is boilerplate, not evidence.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def gram_rows(t: pa.Table) -> pa.Table:
        ids_out: list[str] = []
        g_out: list[str] = []
        sz_out: list[int] = []
        for i, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = _TOKEN_RE.findall((s or "").lower())
            gs = {a + " " + b for a, b in zip(toks, toks[1:])}
            for g in gs:
                ids_out.append(i)
                g_out.append(g)
                sz_out.append(len(gs))
        return pa.table(
            {
                "g": pa.array(g_out, pa.string()),
                "id": pa.array(ids_out, pa.string()),
                "sz": pa.array(sz_out, pa.int64()),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for _, grp in df.groupby("g", sort=False):
            n = len(grp)
            if n < 2 or n > max_redundancy:
                continue
            order = np.argsort(grp["id"].to_numpy(), kind="stable")
            ids = grp["id"].to_numpy()[order]
            szs = grp["sz"].to_numpy()[order]
            for x in range(n):
                for y in range(x + 1, n):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_sa.append(szs[x])
                    out_sb.append(szs[y])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="object"),
                "id_b": pd.Series(out_b, dtype="object"),
                "sz_a": pd.Series(out_sa, dtype="int64"),
                "sz_b": pd.Series(out_sb, dtype="int64"),
            }
        )

    raw = bucketed_groupby(
        grams, "g", pairs_in_bucket, expected_rows=expected_rows
    )

    counted = bucketed_groupby(
        raw,
        ["id_a", "id_b"],
        lambda g: g.groupby(["id_a", "id_b"], sort=False)
        .agg(n_inter=("sz_a", "size"), sz_a=("sz_a", "max"), sz_b=("sz_b", "max"))
        .reset_index(),
        expected_rows=expected_rows,
    )

    def finish(t: pa.Table) -> pa.Table:
        ni = pc.cast(t["n_inter"], pa.int64())
        union = pc.cast(
            pc.subtract(pc.add(t["sz_a"], t["sz_b"]), t["n_inter"]), pa.int64()
        )
        keep = pc.greater_equal(
            pc.multiply(ni, pa.scalar(den, pa.int64())),
            pc.multiply(union, pa.scalar(num, pa.int64())),
        )
        return t.select(["id_a", "id_b"]).filter(keep)

    return counted.map_batches(finish, batch_format="pyarrow")


def crossmodal_clusters(
    ds: ray.data.Dataset,
    *,
    id_col: str = "image_id",
    text_col: str = "caption",
    sig_col: str = "phash",
    max_hamming: int = 6,
    jaccard_num: int = 7,
    jaccard_den: int = 10,
    expected_rows: int | None = None,
) -> pd.DataFrame:
    """Canonical election over the FUSED (pixel ∪ text) near-dup graph.

    Returns (cluster_id, n_members, canonical_id, canonical_px): one row
    per duplicate cluster, canonical = highest w·h, ties to smaller id.
    Labels and the pair lists are result-sized; pixels never shuffle —
    the table is re-filtered in place via ``pc.is_in`` (q72 contract).
    """
    from texrex_ray.dedup.clusters import dup_clusters
    from texrex_ray.dedup.lsh import hamming_pairs

    ds = ds.materialize()  # read once; both passes + member filter reuse it
    n = expected_rows or ds.count()

    text_pairs = caption_jaccard_pairs(
        ds, id_col=id_col, text_col=text_col,
        num=jaccard_num, den=jaccard_den, expected_rows=n * 20,
    )
    pix_pairs = hamming_pairs(
        ds, id_col=id_col, sig_col=sig_col, max_hamming=max_hamming,
        expected_rows=n, expected_pairs=n,
    )
    edges = text_pairs.union(pix_pairs)
    labels = dup_clusters(edges)
    lab = dict(zip(labels["doc_id"], labels["cluster_id"]))
    lab_ref = ray.put(lab)
    member_ids = pa.array(sorted(lab), pa.string())

    def members(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "w", "h"])
        t = t.filter(pc.is_in(t[id_col], value_set=member_ids))
        lab_ = ray.get(lab_ref)
        cl = pa.array([lab_[i] for i in t[id_col].to_pylist()], pa.string())
        return t.append_column("cluster_id", cl)

    empty = pd.DataFrame(
        {
            "cluster_id": pd.Series([], dtype="object"),
            "n_members": pd.Series([], dtype="int64"),
            "canonical_id": pd.Series([], dtype="object"),
            "canonical_px": pd.Series([], dtype="int64"),
        }
    )
    if not lab:
        return empty
    m = ds.map_batches(members, batch_format="pyarrow").to_pandas()
    if m.empty:
        return empty
    m["px"] = (m["w"].astype("int64") * m["h"].astype("int64")).astype("int64")
    m = m.sort_values(
        ["cluster_id", "px", id_col], ascending=[True, False, True]
    )
    top = m.groupby("cluster_id", sort=True).first().reset_index()
    cnt = m.groupby("cluster_id", sort=True).size().rename("n_members").reset_index()
    out = cnt.merge(top[["cluster_id", id_col, "px"]], on="cluster_id")
    out = out.rename(columns={id_col: "canonical_id", "px": "canonical_px"})
    out["n_members"] = out["n_members"].astype("int64")
    out["canonical_px"] = out["canonical_px"].astype("int64")
    return out[["cluster_id", "n_members", "canonical_id", "canonical_px"]]
