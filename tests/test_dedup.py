"""Dedup operator tests: tender semantics (FIXTURES.md §4), LSH, embeddings."""

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _shingle_table():
    """FIXTURES.md §4: clusters sharing ≥5 shingles, a <5 pair, a hot shingle."""
    rows = []
    # cluster A: docs 1,2,3 share shingles 100..105 (6 shared) — sizes 10,20,30
    for s in range(100, 106):
        for d, sz in ((1, 10), (2, 20), (3, 30)):
            rows.append((s, d, sz))
    # pair B: docs 4,5 share shingles 200..202 (3 < 5) — survives
    for s in range(200, 203):
        for d, sz in ((4, 40), (5, 50)):
            rows.append((s, d, sz))
    # hot shingle 999 shared by 250 docs — must be skipped by the cap
    for d in range(1000, 1250):
        rows.append((999, d, 5))
    df = pd.DataFrame(rows, columns=["shingle", "doc_id", "doc_size"])
    df["shingle"] = df["shingle"].astype("uint64")
    return ray.data.from_pandas(df)


def test_tender_pair_semantics():
    from texrex_ray.dedup.tender import blacklist, count_pairs, shingle_pairs

    sh = _shingle_table()
    pairs = count_pairs(shingle_pairs(sh, max_redundancy=200), pair_threshold=5).to_pandas()
    got = {(r.id_small, r.id_big, r.n_shared) for r in pairs.itertuples()}
    # cluster A: all 3 pairs, smaller-doc-first by (size, id), 6 shared each
    assert got == {(1, 2, 6), (1, 3, 6), (2, 3, 6)}
    # blacklist = smaller ids {1, 2}
    bl = set(blacklist(count_pairs(shingle_pairs(sh), 5)).to_pandas()["id_small"])
    assert bl == {1, 2}


def test_tender_hot_shingle_cap():
    from texrex_ray.dedup.tender import count_pairs, shingle_pairs

    sh = _shingle_table()
    # without the cap the hot shingle contributes C(250,2) pairs
    pairs_uncapped = shingle_pairs(sh, max_redundancy=10**9).count()
    pairs_capped = shingle_pairs(sh, max_redundancy=200).count()
    assert pairs_uncapped - pairs_capped == 250 * 249 // 2


def test_tender_on_documents_matches_bruteforce():
    """gram-shingle tender == brute-force pair counting (python oracle)."""
    from texrex_ray.dedup.tender import count_pairs, gram_shingles, shingle_pairs
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    got = count_pairs(shingle_pairs(gram_shingles(ds, n=5)), 5).to_pandas()
    got_set = {(r.id_small, r.id_big, r.n_shared) for r in got.itertuples()}

    df = ds.to_pandas()
    grams = {}
    sizes = {}
    for r in df.itertuples():
        toks = LATIN_TOKEN_RE.findall(r.text.lower())
        grams[r.doc_id] = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        sizes[r.doc_id] = r.n_chars
    # shingle -> docs, apply cap, count shared per pair
    from collections import Counter, defaultdict

    by_g = defaultdict(list)
    for d, gs in grams.items():
        for g in gs:
            by_g[g].append(d)
    cnt: Counter = Counter()
    for g, docs in by_g.items():
        if len(docs) < 2 or len(docs) > 200:
            continue
        docs = sorted(docs, key=lambda d: (sizes[d], d))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cnt[(docs[i], docs[j])] += 1
    want = {(a, b, n) for (a, b), n in cnt.items() if n >= 5}
    assert got_set == want


def test_auto_buckets_scale_with_input():
    from texrex_ray.dedup.tender import auto_buckets

    assert auto_buckets(None) == 64
    assert auto_buckets(10_000) == 64  # floor
    assert auto_buckets(250_000 * 512) == 512  # ∝ rows
    assert auto_buckets(10**12) == 1 << 16  # ceiling


def test_pairs_independent_of_bucket_count():
    """Same-shingle rows always co-bucket, so the pair set must be identical
    under any n_buckets — the invariant that makes auto-sizing safe."""
    from texrex_ray.dedup.tender import count_pairs, shingle_pairs

    sh = _shingle_table()
    outs = []
    for nb in (1, 7, 64, 1024):
        p = count_pairs(shingle_pairs(sh, n_buckets=nb), 5).to_pandas()
        outs.append({(r.id_small, r.id_big, r.n_shared) for r in p.itertuples()})
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_minhash_lsh_finds_true_pairs():
    from texrex_ray.dedup.lsh import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra tail words here"},  # near-dup of 1
        {"doc_id": 3, "text": "totally different content with other words " * 6},
        {"doc_id": 4, "text": "totally different content with other words " * 6},  # dup of 3
        {"doc_id": 5, "text": "unique snowflake paragraph about nothing at all in particular"},
    ]
    ds = ray.data.from_items(docs)
    pairs = minhash_lsh_pairs(ds, k=96, bands=24, n=3, jaccard_threshold=0.5).to_pandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert (1, 2) in got and (3, 4) in got
    assert all(5 not in p for p in got)
    # exact verification: every emitted pair satisfies 2·|∩| ≥ |∪|
    assert (2 * pairs["n_inter"] >= pairs["n_union"]).all()


def test_simhash_near_vs_far():
    from texrex_ray.dedup.lsh import simhash_pairs

    words = ["w%d" % i for i in range(60)]
    near_a = " ".join(words)
    near_b = " ".join(words[:-2] + ["x1", "x2"])
    far = " ".join("z%d" % i for i in range(60))
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": near_a},
            {"doc_id": 2, "text": near_b},
            {"doc_id": 3, "text": far},
        ]
    )
    pairs = simhash_pairs(ds, max_hamming=12).to_pandas()
    got = {(r.id_a, r.id_b) for r in pairs.itertuples()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_candidate_generation_complete():
    """Block-LSH with max_hamming+1 blocks must find EVERY pair within the
    radius (pigeonhole) — brute force over the signature table agrees."""
    import itertools

    from texrex_ray.dedup.lsh import popcount64, simhash_pairs
    from texrex_ray.functions.hashing import simhash64
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    df = ds.to_pandas()
    toks = [LATIN_TOKEN_RE.findall(s.lower()) for s in df["text"]]
    grams = [
        [" ".join(tk[i : i + 3]) for i in range(max(0, len(tk) - 2))] for tk in toks
    ]
    sig = simhash64(grams)
    ids = df["doc_id"].to_numpy()
    want = set()
    for i, j in itertools.combinations(range(len(ids)), 2):
        d = int(popcount64(np.array([sig[i] ^ sig[j]], dtype=np.uint64))[0])
        if d <= 12:
            a, b = sorted((ids[i], ids[j]))
            want.add((a, b, d))
    got_df = simhash_pairs(ds, max_hamming=12, shingle_n=3).to_pandas()
    got = {(r.id_a, r.id_b, r.hamming) for r in got_df.itertuples()}
    assert got == want


def test_dedup_ops_accept_string_ids():
    """The crawl corpus uses 32-hex md5 string doc ids — the dedup suite
    must compose with it (no forced int casts)."""
    from texrex_ray.dedup.lsh import minhash_lsh_pairs, simhash_pairs

    docs = [
        {"doc_id": "aa" * 16, "text": "alpha beta gamma delta epsilon zeta " * 8},
        {"doc_id": "bb" * 16, "text": "alpha beta gamma delta epsilon zeta " * 8 + "tail"},
        {"doc_id": "cc" * 16, "text": "other totally unrelated words entirely " * 8},
    ]
    ds = ray.data.from_items(docs)
    mh = minhash_lsh_pairs(ds, k=96, bands=48, n=3).to_pandas()
    assert ("aa" * 16, "bb" * 16) in {(r.id_a, r.id_b) for r in mh.itertuples()}
    sh = simhash_pairs(ds, max_hamming=12).to_pandas()
    assert ("aa" * 16, "bb" * 16) in {(r.id_a, r.id_b) for r in sh.itertuples()}


def test_knn_bruteforce_matches_numpy():
    from texrex_ray.dedup.embed import knn_bruteforce

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = knn_bruteforce(ds, query_ids=[0, 1], k=5)
    df = ds.to_pandas()
    m = np.asarray(list(df["embedding"]), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    for q in (0, 1):
        qv = m[ids == q][0]
        sims = m @ qv
        sims[ids == q] = -np.inf
        order = np.lexsort((ids, -sims))[:5]
        want = list(ids[order])
        mine = list(got.loc[got["query_id"] == q].sort_values("rank")["neighbor_id"])
        assert mine == want, (q, mine, want)


def test_lsh_ann_recall():
    from texrex_ray.dedup.embed import knn_bruteforce, lsh_ann

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, query_ids=list(range(8)), k=10)
    approx = lsh_ann(ds, query_ids=list(range(8)), k=10, n_planes=4)
    recalls = []
    for q in range(8):
        e = set(exact.loc[exact["query_id"] == q, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == q, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5  # 4 planes + multi-probe 1 on 500 vecs


def test_ivf_ann_exact_at_full_probe():
    from texrex_ray.dedup.embed import ivf_ann, knn_bruteforce

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, query_ids=[0, 3, 7], k=10)
    ivf = ivf_ann(ds, query_ids=[0, 3, 7], k=10, nlist=8, nprobe=8)
    pd.testing.assert_frame_equal(
        ivf.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_ivf_ann_recall_at_partial_probe():
    from texrex_ray.dedup.embed import ivf_ann, knn_bruteforce

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, query_ids=list(range(8)), k=10)
    approx = ivf_ann(ds, query_ids=list(range(8)), k=10, nlist=8, nprobe=3)
    recalls = []
    for q in range(8):
        e = set(exact.loc[exact["query_id"] == q, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == q, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.6  # 3/8 cells probed


def test_ivf_centroids_deterministic():
    from texrex_ray.dedup.embed import train_centroids

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    c1 = train_centroids(ds, nlist=4, iters=5)
    c2 = train_centroids(ds.repartition(7), nlist=4, iters=5)
    np.testing.assert_allclose(c1, c2)


def test_dup_clusters_components(ray_session):
    from texrex_ray.dedup.clusters import dup_clusters

    # two components: a chain 1-2-3-4 (diameter 3) and an island 9-10
    pairs = ray.data.from_items(
        [
            {"id_a": 2, "id_b": 1},
            {"id_a": 2, "id_b": 3},
            {"id_a": 3, "id_b": 4},
            {"id_a": 10, "id_b": 9},
        ]
    )
    got = dup_clusters(pairs)
    want = {1: 1, 2: 1, 3: 1, 4: 1, 9: 9, 10: 9}
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_dup_clusters_long_chain(ray_session):
    """A dup chain far longer than max_iters converges via pointer jumping
    (per-edge propagation alone would need diameter=299 rounds)."""
    from texrex_ray.dedup.clusters import dup_clusters

    pairs = ray.data.from_items(
        [{"id_a": i, "id_b": i + 1} for i in range(300)]
    ).repartition(8)
    got = dup_clusters(pairs, max_iters=50)
    assert (got["cluster_id"] == 0).all()
    assert len(got) == 301


def test_dup_clusters_string_ids(ray_session):
    from texrex_ray.dedup.clusters import dup_clusters

    pairs = ray.data.from_items(
        [{"id_a": "b", "id_b": "c"}, {"id_a": "a", "id_b": "c"}]
    )
    got = dup_clusters(pairs)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == {"a": "a", "b": "a", "c": "a"}


def test_dup_clusters_plans_agree(ray_session):
    """Driver-numpy plan ≡ distributed per-iteration plan on the same graph."""
    import pandas as pd

    from texrex_ray.dedup.clusters import dup_clusters

    edges = pd.DataFrame(
        {"id_a": [1, 2, 5, 9, 20, 21], "id_b": [2, 3, 6, 10, 21, 22]}
    )
    ds = ray.data.from_pandas(edges).repartition(3)
    fast = dup_clusters(ds)
    # driver_edge_limit=0 routes auto to the shuffle plan; the broadcast
    # plan keeps explicit coverage so it cannot silently rot
    slow = dup_clusters(ds, driver_edge_limit=0)
    bcast = dup_clusters(ds, plan="broadcast")
    assert fast.values.tolist() == slow.values.tolist()
    assert fast.values.tolist() == bcast.values.tolist()


def test_segment_dedup_keep_first(ray_session):
    from texrex_ray.dedup.segments import segment_dedup_counts

    # doc 1: "a b c d e f"  -> segs ["a b c", "d e f"]
    # doc 2: "a b c x y z"  -> ["a b c" dup of doc1, "x y z"]
    # doc 3: "d e f a b c z" -> ["d e f" dup, "a b c" dup], trailing "z" dropped
    # doc 4: "q"            -> no full segment, omitted from output
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "a b c x y z"},
            {"doc_id": 3, "text": "d e f a b c z"},
            {"doc_id": 4, "text": "q"},
        ]
    )
    out = (
        segment_dedup_counts(ds, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_segs"].tolist() == [2, 2, 2]
    assert out["n_kept"].tolist() == [2, 1, 0]


def test_segment_dedup_within_doc_first_position_wins(ray_session):
    from texrex_ray.dedup.segments import segment_dedup_counts

    # the same segment twice inside one doc: only the first position kept
    ds = ray.data.from_items([{"doc_id": 7, "text": "a b c a b c"}])
    out = segment_dedup_counts(ds, n=3).to_pandas()
    assert out["n_segs"].tolist() == [2]
    assert out["n_kept"].tolist() == [1]


def test_srp_codes_cluster_near_parallel_vectors(ray_session, tmp_path):
    """SRP codes from q80's construction put near-parallel vectors within
    a small Hamming distance and anti-parallel ones far apart."""
    import pyarrow.parquet as pq_

    from texrex_ray.functions.hashing import md5_lower64
    from texrex_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(3)
    base = rng.normal(size=64).astype(np.float32)
    rows = {
        "vec_id": [1, 2, 3],
        "embedding": [
            base.tolist(),
            (base + rng.normal(scale=0.01, size=64).astype(np.float32)).tolist(),
            (-base).tolist(),
        ],
        "label": [0, 0, 0],
    }
    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(
        __import__("pyarrow").table(rows), str(d / "embeddings.parquet")
    )
    out = QUERIES["q80_srp_codes"](str(d)).set_index("vec_id")["code"]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(out[1], out[2]) <= 2       # near-parallel: almost same code
    assert ham(out[1], out[3]) >= 14      # anti-parallel: almost all bits flip
