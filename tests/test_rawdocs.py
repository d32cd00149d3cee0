"""WARC/ARC readers + the full nested-div document pipeline (FIXTURES.md §3)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from texrex_ray.sources.warc import (
    make_arc_bytes,
    make_warc_bytes,
    read_arc,
    read_warc,
    split_arc,
    split_warc,
)


def _pages_html(i: int, charset: str = "utf-8") -> bytes:
    body = (
        "<html><head><title>Doc %d</title>"
        '<meta name="keywords" content="k1, k2"><meta name="author" content="A. Uthor">'
        "</head><body>"
        "<script>drop me</script>"
        "<p>First paragraph with enough words to pass filters and some more text "
        "to get the document over the small threshold we use in tests.</p>"
        '<p>Second paragraph &amp; entities with <a href="/x%d">a link</a> here.</p>'
        "<p>Second paragraph &amp; entities with <a href=\"/x%d\">a link</a> here.</p>"
        "<div>tail &copy; 2015 boiler | nav | links</div>"
        "</body></html>" % (i, i, i)
    )
    return body.encode("latin-1" if charset == "iso-8859-1" else "utf-8")


def _records(n=6):
    return [
        {
            "url": f"http://site{i % 3}.com/d{i}",
            "ip": f"10.0.{i}.1",
            "charset": "iso-8859-1" if i % 3 == 0 else "utf-8",
            "body": _pages_html(i, "iso-8859-1" if i % 3 == 0 else "utf-8"),
        }
        for i in range(n)
    ]


def test_warc_split_roundtrip():
    recs = _records()
    data = make_warc_bytes(recs)
    rows = split_warc(data, min_doc_size=0)
    assert len(rows) == len(recs)
    assert rows[0]["url"] == recs[0]["url"]
    assert rows[0]["ip"] == recs[0]["ip"]
    assert rows[0]["charset"] == "iso-8859-1"
    assert b"First paragraph" in rows[1]["raw"]


def test_warc_size_clamp():
    recs = _records()
    data = make_warc_bytes(recs)
    # ref: trreader.pas:483-489 — clamp drops everything outside the band
    assert split_warc(data, min_doc_size=10**6) == []
    assert split_warc(data, max_doc_size=10) == []


def test_arc_split():
    recs = _records(4)
    rows = split_arc(make_arc_bytes(recs), min_doc_size=0)
    assert len(rows) == 4
    assert rows[2]["url"] == recs[2]["url"]
    assert rows[2]["mime"] == "text/html"


def test_read_warc_dataset(tmp_path):
    p = tmp_path / "f.warc"
    p.write_bytes(make_warc_bytes(_records()))
    ds = read_warc(str(p), min_doc_size=0)
    assert ds.count() == 6
    assert "url" in ds.schema().names


def test_raw_docs_pipeline_end_to_end(tmp_path):
    from texrex_ray.pipelines.raw_docs import raw_docs_pipeline

    p = tmp_path / "f.warc"
    p.write_bytes(make_warc_bytes(_records(8)))
    ds = read_warc(str(p), min_doc_size=0)
    out = raw_docs_pipeline(ds, minhash_k=16, drop_invalid=False)
    df = out.to_pandas()
    assert len(df) == 8
    # charset conversion: latin-1 pages decoded, divs extracted, script dropped
    assert df["charset"].isin(["utf-8", "windows-1252"]).all()
    row = df.iloc[0]
    texts = [d["text"] for d in row["divs"]]
    assert not any("drop me" in t for t in texts)
    # secondpass: entities decoded
    assert any("&" in t and "&amp;" not in t for t in texts)
    # meta extractor
    assert row["meta_keywords"] == "k1, k2"
    assert row["meta_author"] == "A. Uthor"
    # in-doc dedup: the repeated second paragraph points at its first index
    dup_ofs = [d["dup_of"] for d in row["divs"]]
    assert any(x >= 0 for x in dup_ofs)
    first_dup = next(d for d in row["divs"] if d["dup_of"] >= 0)
    assert row["divs"][first_dup["dup_of"]]["text"] == first_dup["text"]
    # boilerplate scored; fingerprint present; geolocation ran
    assert all("boiler_score" in d for d in row["divs"])
    assert len(row["fingerprint"]) == 16
    assert "country" in df.columns
    assert "pred_lang" in df.columns


def test_boilerplate_features_shape_and_windows():
    from texrex_ray.functions.striphtml import DivInfo
    from texrex_ray.stages.boilerplate import N_FEATURES, div_features

    infos = [
        DivInfo(text="a real sentence with quite a few words in it.", open_tags=1),
        DivInfo(text="nav | nav | nav", open_tags=8, close_tags=8, anchors=6),
        DivInfo(text="another real paragraph of text that goes on.", open_tags=1),
    ]
    f = div_features(infos, doctype="html")
    assert f.shape == (3, N_FEATURES)
    # windowed smoothing: middle div's ±1 window mixes its neighbors
    assert f[1, 35] == pytest.approx((f[0, 5] + f[1, 5] + f[2, 5]) / 3, rel=1e-5)


def test_boilerplate_scorer_separates():
    from texrex_ray.functions.striphtml import DivInfo
    from texrex_ray.stages.boilerplate import Deboilerplater

    d = Deboilerplater()
    content = DivInfo(
        text="This is a long paragraph of real content. It has sentences. "
        "They continue for a while and look like prose.", open_tags=1,
    )
    boiler = DivInfo(text="home | nav", open_tags=12, close_tags=12, anchors=8)
    scores, _, _ = d.score_doc([content, boiler, content], doctype="html")
    assert scores[1] > scores[0]


def test_geolocator_binary_search():
    from texrex_ray.stages.geolocate import Geolocator, synthetic_geo_blocks

    starts, ends, locations = synthetic_geo_blocks(n_blocks=8, seed=1)
    g = Geolocator(starts, ends, locations)
    inside = g.lookup_ints(np.array([int(starts[3]) + 1], dtype=np.uint64))
    assert inside == [locations[3]]
    assert inside[0][0].startswith("C") and inside[0][2].startswith("city")
    if int(starts[0]) > 1:
        outside = g.lookup_ints(np.array([int(starts[0]) - 1], dtype=np.uint64))
        assert outside == [("", "", "")]
    # legacy bare-country lists still resolve (empty region/city)
    g2 = Geolocator(starts, ends, ["X"] * 8)
    assert g2.lookup_ints(np.array([int(starts[0]) + 1], dtype=np.uint64)) == [("X", "", "")]


def test_read_lines_gzip(tmp_path):
    import gzip as _gz

    from texrex_ray.sources.lines import read_lines

    (tmp_path / "a.txt").write_text("one\ntwo\nthree")
    (tmp_path / "b.txt.gz").write_bytes(_gz.compress(b"four\nfive"))
    ds = read_lines([str(tmp_path / "a.txt"), str(tmp_path / "b.txt.gz")])
    df = ds.to_pandas()
    assert len(df) == 5
    assert set(df["line"]) == {"one", "two", "three", "four", "five"}
    assert df.loc[df["line"] == "five", "line_no"].iloc[0] == 1


def test_walk_dump_and_metrics():
    from texrex_ray.crawl.engine import CrawlEngine
    from texrex_ray.sources.webgraph import make_webgraph

    g = make_webgraph(n_hosts=6, pages_per_host_base=6, n_seeds=4, seed=3)
    eng = CrawlEngine(g, n_walkers=2, n_partitions=2, seed=3)
    eng.run(max_steps=30)
    dump = eng.walk_stack_dump().to_pandas()
    assert {"walker_id", "url", "host", "n_links", "depth"} <= set(dump.columns)
    assert len(dump) > 0
    m = eng.metrics_table().to_pandas()
    assert len(m) == 2 and "gated_fetches" in m.columns
    eng.shutdown()
