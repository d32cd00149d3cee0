"""Duplicate clusters: connected components over near-dup pair edges.

The pair detectors (tender / LSH / SimHash / Jaccard) emit EDGES; dedup
policies usually want CLUSTERS ("keep one representative per component").
This computes per-node component labels by iterative min-label
propagation — the standard scalable CC construction (label = min doc_id
reachable), with pointer jumping (path compression) so convergence takes
O(log diameter) rounds.

Three plans, identical results (tests pin equivalence):

- ``driver`` — the pair graph is result-sized in the dedup regime
  (near-dups only), so the whole CC runs as vectorized numpy on the
  driver after ONE Dataset execution.  Measured 2 s where the
  per-iteration broadcast plan took 483 s at sf0.1 (fixed per-execution
  overhead, not data volume).
- ``broadcast`` — the label table is a driver-resident Series broadcast
  per iteration via ``ray.put``; the edge scan stays distributed.
  Ceiling: labels (and per-iteration partials) are node-sized on the
  driver — fine to ~10⁸ nodes, wrong beyond.
- ``shuffle`` — the page-scale plan: labels live in a KEYED DATASET and
  every round is bucketed exchanges (ops/join.py::shuffle_join +
  ops/aggregate.py::bucketed_groupby, the same pattern as
  ops/graph.py::_pagerank_shuffle): directed edges join labels on src,
  per-node candidate minima fold in a bucketed groupby, and each round
  ends with one pointer-jump hop (the label table joined against
  itself).  Nothing node-sized ever lands on the driver until the
  final (caller-contract) result.

``plan="auto"`` picks driver below ``driver_edge_limit`` edges and
shuffle above it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def dup_clusters(
    pairs: ray.data.Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    driver_edge_limit: int = 5_000_000,
    plan: str = "auto",
    hop_hot_threshold: int = 100_000,
) -> pd.DataFrame:
    """(doc_id, cluster_id) for every document in a pair; cluster_id =
    the smallest doc_id in its connected component.

    ``plan``: "auto" (driver below ``driver_edge_limit`` edges, shuffle
    above), or force "driver" / "broadcast" / "shuffle" (see module
    docstring for the three shapes).
    """
    # materialize the (narrow) edge list once — the input lineage may be a
    # whole pair-detection pipeline, which must not re-execute per
    # propagation iteration
    edges_ds = pairs.select_columns([id_a, id_b]).materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"doc_id": [], "cluster_id": []})

    if plan == "auto":
        plan = "driver" if n_edges <= driver_edge_limit else "shuffle"
    if plan == "driver":
        return _cc_driver(edges_ds, id_a, id_b, max_iters)
    if plan == "broadcast":
        return _cc_broadcast(edges_ds, id_a, id_b, max_iters)
    if plan == "shuffle":
        return _cc_shuffle(
            edges_ds, id_a, id_b, max_iters, n_edges,
            hop_hot_threshold=hop_hot_threshold,
        )
    raise ValueError(f"dup_clusters: unknown plan {plan!r}")


def _cc_driver(
    edges_ds: ray.data.Dataset, id_a: str, id_b: str, max_iters: int
) -> pd.DataFrame:
    """Driver plan: scatter-min label propagation + pointer jumping, all
    numpy on the (result-sized) edge arrays."""
    nodes_df = edges_ds.to_pandas()
    a = nodes_df[id_a].to_numpy()
    b = nodes_df[id_b].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    idx_of = pd.Series(np.arange(len(nodes)), index=nodes)
    ea = idx_of.loc[a].to_numpy()
    eb = idx_of.loc[b].to_numpy()
    lab = np.arange(len(nodes), dtype=np.int64)  # label = node index
    for _ in range(max_iters):
        m = np.minimum(lab[ea], lab[eb])
        new = lab.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        while True:  # pointer jumping: O(log diameter) overall
            hopped = np.minimum(new, new[new])
            if (hopped == new).all():
                break
            new = hopped
        if (new == lab).all():
            break
        lab = new
    else:
        raise RuntimeError(f"dup_clusters did not converge in {max_iters} iterations")
    out = pd.DataFrame({"doc_id": nodes, "cluster_id": nodes[lab]})
    return out.sort_values("doc_id").reset_index(drop=True)


def _cc_broadcast(
    edges_ds: ray.data.Dataset, id_a: str, id_b: str, max_iters: int
) -> pd.DataFrame:
    """Broadcast plan: driver-resident label Series, distributed edge
    scans emitting per-batch partial minima."""
    nodes_df = edges_ds.to_pandas()
    a = nodes_df[id_a].to_numpy()
    b = nodes_df[id_b].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    labels = pd.Series(nodes, index=nodes)

    for _ in range(max_iters):
        lab_ref = ray.put(labels)

        def propagate(t: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            ea = np.asarray(t[id_a].to_pylist())
            eb = np.asarray(t[id_b].to_pylist())
            la = lab.loc[ea].to_numpy()
            lb = lab.loc[eb].to_numpy()
            m = np.minimum(la, lb)
            # per-batch partial minima for both endpoints
            part = pd.DataFrame(
                {"node": np.concatenate([ea, eb]), "cand": np.concatenate([m, m])}
            )
            part = part.groupby("node", sort=False)["cand"].min().reset_index()
            return pa.Table.from_pandas(part, preserve_index=False)

        partials = edges_ds.map_batches(propagate, batch_format="pyarrow").to_pandas()
        cand = partials.groupby("node")["cand"].min()
        new_labels = labels.copy()
        new_labels.loc[cand.index] = np.minimum(
            new_labels.loc[cand.index].to_numpy(), cand.to_numpy()
        )
        # pointer jumping (path compression): a label is always itself a
        # node id, so hop label -> label-of-label until fixpoint.  This
        # turns per-edge propagation's O(diameter) rounds into
        # O(log diameter) — a 10^6-long dup chain converges in ~20 outer
        # iterations instead of 10^6 (labels table is result-sized, so the
        # hops are driver-cheap).
        while True:
            hopped = np.minimum(
                new_labels.to_numpy(), new_labels.loc[new_labels.to_numpy()].to_numpy()
            )
            if (hopped == new_labels.to_numpy()).all():
                break
            new_labels = pd.Series(hopped, index=new_labels.index)
        if new_labels.equals(labels):
            break
        labels = new_labels
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} iterations"
        )

    out = pd.DataFrame({"doc_id": labels.index, "cluster_id": labels.to_numpy()})
    return out.sort_values("doc_id").reset_index(drop=True)


def _min_update(df: pd.DataFrame, lab_col: str, cand_col: str) -> pa.Table:
    """(node, lab=min(lab, cand), changed) as an EXPLICIT Arrow block —
    the joins emit pandas nullable extension dtypes that Ray's
    pandas→Arrow unification cannot map.  NaN candidates (left-join
    misses) keep the current label.  The left join may upcast int64
    candidates to float64 (pandas NaN semantics); taken values cast back
    to the label dtype, exact because doc-id labels stay < 2^53 whenever
    they transit the float column (string labels never upcast)."""
    lab = df[lab_col]
    # fill join misses with the row's own label BEFORE comparing — object
    # (string) labels would otherwise hit None < str TypeErrors
    c = df[cand_col].where(df[cand_col].notna(), lab)
    take = (c < lab).fillna(False).to_numpy(bool)
    new = lab.where(~take, c)
    if new.dtype != lab.dtype:
        new = new.astype(lab.dtype)
    out = pd.DataFrame({
        "node": df["node"].to_numpy(),
        "lab": new.to_numpy(),
        "changed": take.astype(np.int64),
    })
    return pa.Table.from_pandas(out, preserve_index=False)


def _changed_count(lab_ds: ray.data.Dataset, col: str = "changed") -> int:
    """Scalar sum of a 0/1 column — the per-round convergence signal (the
    only thing the driver sees each round)."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(df[col].sum())]})

    return int(
        sum(r["n"] for r in lab_ds.map_batches(part, batch_format="pandas").iter_rows())
    )


def _cc_shuffle(
    edges_ds: ray.data.Dataset,
    id_a: str,
    id_b: str,
    max_iters: int,
    n_edges: int,
    *,
    hop_hot_threshold: int = 100_000,
) -> pd.DataFrame:
    """Shuffle plan: labels are a Dataset keyed by node; each round is
    (1) directed edges ⋈ labels on src, (2) per-dst candidate-min
    bucketed groupby, (3) labels ⋈ candidates with min-update, and
    (4) ONE pointer-jump hop (labels ⋈ labels on lab=node) — the
    propagate-plus-path-halving CC, O(log·) rounds.  Fixpoint test:
    a round where propagation changes nothing means labels are
    component-constant minima (min-consistency across every edge in
    both directions), so the hop is skipped and the result equals the
    driver plan's.  Per round: 3 bucketed exchanges + 2 scalar count
    passes; driver traffic is two scalars per round."""
    from texrex_ray.ops.aggregate import bucketed_groupby
    from texrex_ray.ops.join import shuffle_join

    def explode_directed(df: pd.DataFrame) -> pd.DataFrame:
        # both directions: cand(dst) folds min over ALL neighbours
        return pd.DataFrame({
            "src": pd.concat([df[id_a], df[id_b]], ignore_index=True).to_numpy(),
            "dst": pd.concat([df[id_b], df[id_a]], ignore_index=True).to_numpy(),
        })

    darrows = edges_ds.map_batches(
        explode_directed, batch_format="pandas"
    ).materialize()

    nodes_ds = bucketed_groupby(
        darrows.select_columns(["src"]).map_batches(
            lambda df: df.rename(columns={"src": "node"}).drop_duplicates(),
            batch_format="pandas",
        ),
        "node",
        lambda df: df[["node"]].drop_duplicates(),
        expected_rows=2 * n_edges,
    ).materialize()
    n_nodes = nodes_ds.count()

    lab_ds = nodes_ds.map_batches(
        lambda t: t.append_column("lab", t["node"]), batch_format="pyarrow"
    ).materialize()

    for _ in range(max_iters):
        # (1) neighbour labels: directed edges ⋈ labels on src
        j1 = shuffle_join(
            darrows, lab_ds, on="src", right_on="node", how="inner",
            expected_rows=2 * n_edges,
        )

        def cand_rows(df: pd.DataFrame) -> pd.DataFrame:
            part = pd.DataFrame({
                "node": df["dst"].to_numpy(),
                "cand": df["lab"].to_numpy(),
            })
            return part.groupby("node", sort=False)["cand"].min().reset_index()

        # (2) per-node candidate minimum over all neighbours
        cand = bucketed_groupby(
            j1.map_batches(cand_rows, batch_format="pandas"),
            "node",
            lambda g: g.groupby("node", sort=False)["cand"].min().reset_index(),
            expected_rows=n_nodes,
        )

        # (3) min-update the label table
        upd_j = shuffle_join(
            lab_ds, cand, on="node", how="left", expected_rows=n_nodes
        )
        stepped = upd_j.map_batches(
            lambda df: _min_update(df, "lab", "cand"), batch_format="pandas"
        ).materialize()
        if _changed_count(stepped) == 0:
            # min-consistent across every edge (both directions) ⇒ labels
            # are component-constant component minima — done
            lab_ds = stepped.select_columns(["node", "lab"]).materialize()
            break
        # (4) one pointer-jump hop: lab ← min(lab, lab[lab]); a label is
        # itself a node id, so the hop is the label table self-joined.
        # SKEW: as components converge, every member shares ONE lab value
        # — a giant near-dup component would pile into a single hop
        # bucket.  Detect hot labs first (per-batch pre-aggregated counts,
        # so the count exchange carries ≤ n_blocks rows per lab) and salt
        # them through shuffle_join's hot_keys path.
        cur = stepped.select_columns(["node", "lab"])

        def lab_counts(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df["lab"].value_counts().rename_axis("lab")
                .reset_index(name="c")
            )

        hot_thresh = hop_hot_threshold
        hot_df = bucketed_groupby(
            cur.map_batches(lab_counts, batch_format="pandas"),
            "lab",
            lambda g: g.groupby("lab", as_index=False)["c"].sum(),
            expected_rows=n_nodes,
        ).map_batches(
            lambda df: df[df["c"] > hot_thresh], batch_format="pandas"
        ).to_pandas()  # bounded: ≤ n_nodes / hot_thresh rows
        hot_labs = (
            None if hot_df.empty else list(hot_df["lab"])
        )

        hop_src = cur.map_batches(
            lambda t: t.rename_columns(["hnode", "hlab"]),
            batch_format="pyarrow",
        )
        hop_j = shuffle_join(
            cur, hop_src, on="lab", right_on="hnode", how="left",
            expected_rows=n_nodes, hot_keys=hot_labs, skew_salt=16,
        )
        lab_ds = hop_j.map_batches(
            lambda df: _min_update(df, "lab", "hlab"), batch_format="pandas"
        ).select_columns(["node", "lab"]).materialize()
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} iterations"
        )

    out = lab_ds.to_pandas().rename(columns={"node": "doc_id", "lab": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True)
