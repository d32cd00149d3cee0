"""Crawl→image harvest bridge (pipelines/harvest.py + with_images webgraph).

Pins: (1) extract_images markup semantics; (2) with_images=True leaves the
walk fixture surface untouched (identical visit order / link graph);
(3) harvest output is layout-invariant (n_partitions, bucketed vs single
combine) and first-wins-deterministic; (4) phash equals the images-table
convention (phash_of) so phash dedup composes across both channels.
"""

import os

import ray
import ray.data

from texrex_ray.crawl.policy import CrawlConfig
from texrex_ray.functions.striphtml import extract_images
from texrex_ray.sources.webgraph import make_webgraph


def test_extract_images_markup():
    html = (
        '<p>x<img src="/a.png" alt="Alpha cap"></p>'
        "<figure><img src='b.jpeg'><figcaption>Beta <b>cap</b>\n two</figcaption></figure>"
        '<figure><img src="c.webp" alt="Alt wins"><figcaption>not me</figcaption></figure>'
        "<img src=d.png>"
        "<img alt='no src'>"
    )
    got = extract_images(html)
    assert got == [
        ("/a.png", "Alpha cap"),
        ("b.jpeg", "Beta cap two"),  # figcaption fallback, tags stripped, ws collapsed
        ("c.webp", "Alt wins"),  # non-empty alt beats figcaption
        ("d.png", ""),  # unquoted src, no caption
    ]


def test_webgraph_images_leave_walk_untouched():
    """with_images uses only local hash-seeded RNG streams: the link graph,
    page text and the oracle walk are identical to the plain graph."""
    from texrex_ray.crawl.oracle import clarax_walk

    g0 = make_webgraph(n_hosts=8, pages_per_host_base=8, n_seeds=6, seed=11)
    g1 = make_webgraph(
        n_hosts=8, pages_per_host_base=8, n_seeds=6, seed=11, with_images=True
    )
    assert set(g0.pages) == set(g1.pages)
    assert g0.seeds == g1.seeds
    # identical outlink structure (hrefs drawn from the shared RNG)
    for u in g0.pages:
        assert g0.pages[u].out_links == g1.pages[u].out_links
    assert len(g1.images) > 0 and not g0.images
    r0 = clarax_walk(g0, max_steps=80, seed=11, config=CrawlConfig())
    r1 = clarax_walk(
        g1, max_steps=80, seed=11, config=CrawlConfig(collect_images=True)
    )
    assert r0.visit_order == r1.visit_order
    assert r0.url_seen == r1.url_seen


def _run_harvest(tmpdir, n_partitions, n_buckets, expected_rows=None):
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.pipelines.harvest import harvest_images

    g = make_webgraph(
        n_hosts=8, pages_per_host_base=8, n_seeds=6, seed=11, with_images=True
    )
    d = os.path.join(tmpdir, f"c{n_partitions}_{n_buckets}_{expected_rows}")
    eng = CrawlEngine(
        g,
        n_walkers=1,
        n_partitions=n_partitions,
        seed=11,
        config=CrawlConfig(collect_images=True),
        out_dir=d,
    )
    eng.run(max_steps=90)
    eng.shutdown()
    corpus = ray.data.read_parquet(os.path.join(d, "corpus"))
    out = harvest_images(
        corpus, g.images, n_buckets=n_buckets, expected_rows=expected_rows
    )
    df = out.to_pandas().sort_values("image_id").reset_index(drop=True)
    return g, df


def test_harvest_layout_invariance_and_phash(tmp_path):
    g, base = _run_harvest(str(tmp_path), 2, None)
    assert len(base) > 10
    assert base.image_id.is_unique
    cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
    for n_parts, n_buckets, exp in ((4, None, None), (2, 5, None), (2, 5, 120_000)):
        _, other = _run_harvest(str(tmp_path), n_parts, n_buckets, exp)
        assert other[cols].equals(base[cols])
    # phash matches the images-table convention over the same container
    from texrex_ray.sources.images import decode_image, phash_of

    src_of = {r.image_id: r for r in base.head(5).itertuples()}
    from texrex_ray.functions.hashing import doc_id_for_url

    by_id = {doc_id_for_url(u): u for u in g.images}
    for iid, row in src_of.items():
        raw = g.images[by_id[iid]]
        pixels = decode_image(raw)
        assert phash_of(pixels, row.fmt) == row.phash
        assert (row.w, row.h) == (pixels.shape[1], pixels.shape[0])


def test_harvest_first_wins_caption(tmp_path):
    """The winning caption is the first reference in visit order — check
    against a scalar replay of the corpus parquet."""
    import pyarrow.parquet as pq_

    g, df = _run_harvest(str(tmp_path), 2, None)
    d = os.path.join(str(tmp_path), "c2_None_None", "corpus")
    rows = []
    for part in sorted(os.listdir(d)):
        for f in sorted(os.listdir(os.path.join(d, part))):
            t = pq_.read_table(os.path.join(d, part, f))
            rows.extend(t.to_pylist())
    rows.sort(key=lambda r: (r["round"], r["walker_id"]))
    first = {}
    for r in rows:
        for s, c in zip(r["img_srcs"], r["img_caps"]):
            first.setdefault(s, c)
    from texrex_ray.functions.hashing import doc_id_for_url

    expect = {doc_id_for_url(s): c for s, c in first.items() if s in g.images}
    got = dict(zip(df.image_id, df.caption))
    assert got == expect
