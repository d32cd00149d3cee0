"""SemDeDup within-cluster cosine dedup and bigram-LM scoring."""

import numpy as np
import ray.data

from texrex_ray.dedup.embed import semdedup


def _rows(vecs, labels):
    return [
        {"vec_id": i, "embedding": list(map(float, v)), "label": int(l)}
        for i, (v, l) in enumerate(zip(vecs, labels))
    ]


def test_semdedup_drops_only_within_cluster(ray_session):
    v = np.array([1.0, 0.0, 0.0])
    w = np.array([0.0, 1.0, 0.0])
    # ids 0,1 near-identical in cluster 0; id 2 identical to 0 but cluster 1
    vecs = [v, v + 1e-3 * w, v, w]
    ds = ray.data.from_items(_rows(vecs, [0, 0, 1, 1]))
    got = semdedup(ds, eps=0.9)
    # id 1 is a dup of 0 (same cluster); id 2 survives (other cluster)
    assert got["vec_id"].tolist() == [0, 2, 3]


def test_semdedup_anti_join_semantics_not_greedy_chain(ray_session):
    # a~b and b~c but NOT a~c: anti-join drops b (dup of a) AND c (dup
    # of b) even though b itself was dropped — matches the SQL oracle.
    theta = np.arccos(0.75)
    a = np.array([1.0, 0.0])
    b = np.array([np.cos(theta), np.sin(theta)])
    c = np.array([np.cos(2 * theta), np.sin(2 * theta)])
    assert a @ c < 0.7  # cos(2θ) = 0.125
    ds = ray.data.from_items(_rows([a, b, c], [5, 5, 5]))
    got = semdedup(ds, eps=0.7)
    assert got["vec_id"].tolist() == [0]


def test_semdedup_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8))
    labels = rng.integers(0, 4, size=60)
    eps = 0.5
    ds = ray.data.from_items(_rows(vecs, labels))
    got = semdedup(ds, eps=eps)["vec_id"].tolist()
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = [
        j
        for j in range(60)
        if not any(
            labels[i] == labels[j] and u[i] @ u[j] >= eps for i in range(j)
        )
    ]
    assert got == want


def test_bigram_lm_score_small(ray_session):
    from texrex_ray.pipelines.queries import QUERIES

    got = QUERIES["q107_bigram_lm_score"]("/root/testdata/sf0.001")
    # hand-check one doc against a pure-python recount
    import pyarrow.parquet as pq
    import re

    tok = re.compile(r"[a-z]+")
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for did, s in zip(t["doc_id"], t["text"]):
        ts = tok.findall((s or "").lower())
        pairs = list(zip(ts, ts[1:]))
        per_doc[int(did)] = pairs
        for p in pairs:
            big[p] = big.get(p, 0) + 1
            ctx[p[0]] = ctx.get(p[0], 0) + 1
    want = {
        did: sum(big[p] * 1_000_000 // ctx[p[0]] for p in pairs)
        for did, pairs in per_doc.items()
        if pairs
    }
    got_map = dict(zip(got["doc_id"], got["score_c"]))
    assert got_map == want
