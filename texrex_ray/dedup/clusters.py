"""Duplicate clusters: connected components over near-dup pair edges.

The pair detectors (tender / LSH / SimHash / Jaccard) emit EDGES; dedup
policies usually want CLUSTERS ("keep one representative per component").
This computes per-node component labels by iterative min-label
propagation — the standard scalable CC construction (label = min doc_id
reachable), converging in ≤ diameter iterations.

Shape: the edge stream is scanned distributed (``map_batches`` emits
per-batch partial minima), while the label table itself is RESULT-sized
(only documents that appear in a near-dup pair — the dedup regime's
small side, same assumption as the LSH candidate set) and is broadcast
per iteration via ``ray.put``.  A corpus whose pair graph exceeds driver
memory would swap the broadcast for a keyed per-iteration exchange
(groupby-join); the edge-scan side is unchanged.
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
) -> pd.DataFrame:
    """(doc_id, cluster_id) for every document in a pair; cluster_id =
    the smallest doc_id in its connected component.

    Plan switch: the pair graph is result-sized (near-dups only), so up
    to ``driver_edge_limit`` edges the whole CC runs as vectorized numpy
    on the driver — one Dataset execution total.  The distributed
    per-iteration edge scan below it is the documented huge-graph path;
    it costs a full (cheap, materialized) Dataset pass PER ITERATION,
    which measured 483 s at sf0.1 against 2 s for the driver plan —
    fixed per-execution overhead, not data volume.
    """
    # materialize the (narrow) edge list once — the input lineage may be a
    # whole pair-detection pipeline, which must not re-execute per
    # propagation iteration
    edges_ds = pairs.select_columns([id_a, id_b]).materialize()

    # labels: node -> current component label (result-sized)
    nodes_df = edges_ds.to_pandas()
    if nodes_df.empty:
        return pd.DataFrame({"doc_id": [], "cluster_id": []})
    a = nodes_df[id_a].to_numpy()
    b = nodes_df[id_b].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    labels = pd.Series(nodes, index=nodes)

    if len(nodes_df) <= driver_edge_limit:
        # driver plan: scatter-min label propagation + pointer jumping,
        # all numpy on the (result-sized) edge arrays
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
