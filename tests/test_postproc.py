"""hydra/rofl goldens (FIXTURES.md §5) + writer projections."""

import pyarrow as pa

from texrex_ray.stages.postproc import (
    CONCATENATE,
    LEAVE,
    MERGE,
    UnigramLM,
    dehyphenate,
    fix_runtogether,
    hydra_decision,
)


def _lm():
    return UnigramLM(
        {
            "auto": 50, "bahn": 40, "autobahn": 400,          # merge wins
            "well": 100, "known": 100, "well-known": 900,     # hyphen wins
            "red": 500, "car": 500, "redcar": 1, "red-car": 1,  # parts win
        }
    )


def test_hydra_decision_branches():
    lm = _lm()
    # prefix carries its hyphen, as in the reference's raw-token lookup
    assert hydra_decision(lm, "auto-", "bahn") == MERGE
    assert hydra_decision(lm, "well-", "known") == CONCATENATE
    assert hydra_decision(lm, "red-", "car") == LEAVE


def test_hydra_german_nn_compound_rule():
    """ref: trhydraapplication.pas:474-481 — capitalized unknown pairs
    concatenate under --german even when the LM knows nothing."""
    lm = UnigramLM({})
    assert hydra_decision(lm, "Donau-", "Dampfschiff", german=True) == CONCATENATE
    assert hydra_decision(lm, "Donau-", "Dampfschiff", german=False) == LEAVE
    # lowercase pairs don't trigger the rule
    assert hydra_decision(lm, "donau-", "dampfschiff", german=True) == LEAVE
    assert (
        dehyphenate("die Donau- Dampfschiff fahrt", lm, german=True)
        == "die Donau-Dampfschiff fahrt"
    )


def test_hydra_rewrites_line():
    lm = _lm()
    assert dehyphenate("the auto- bahn is long", lm) == "the autobahn is long"
    assert dehyphenate("a well- known fact", lm) == "a well-known fact"
    assert dehyphenate("a red- car here", lm) == "a red- car here"
    out = dehyphenate("the auto- bahn", lm, non_destructive=True)
    assert out == 'the <normalized from="auto- bahn">autobahn</normalized>'


def test_rofl_splits_runtogether():
    words = {"rain", "tomorrow", "sun", "today"}
    out = fix_runtogether("rain.tomorrow it ends", words)
    assert out == "rain. Tomorrow it ends"
    # unknown words untouched
    assert fix_runtogether("xyzzy.plugh stays", words) == "xyzzy.plugh stays"
    # ignore lists suppress the split
    assert (
        fix_runtogether("rain.tomorrow", words, suffix_ignore={"tomorrow"})
        == "rain.tomorrow"
    )
    # emoticons protected
    assert fix_runtogether("look :lol: rain.today", words) == "look :lol: rain. Today"
    # split limit respected
    out = fix_runtogether("rain.today sun.tomorrow rain.today sun.today", words, limit=2)
    assert out.count(". ") == 2


def test_writers_projections():
    from texrex_ray.sources.writers import doc_to_xml, link_rows, shingle_rows, token_rows

    row = {
        "url": "http://a.com/x", "ip": "1.2.3.4", "charset": "utf-8",
        "doctype": "html", "badness": 1.234, "title": "T",
        "meta_author": "A",
        "divs": [
            {"text": "hello & <world>", "valid": True, "dup_of": -1,
             "boiler_score": 0.2, "boilerplate": False},
            {"text": "hello & <world>", "valid": True, "dup_of": 0,
             "boiler_score": 0.2, "boilerplate": False},
            {"text": "gone", "valid": False, "dup_of": -1,
             "boiler_score": 0.9, "boilerplate": True},
        ],
    }
    xml = doc_to_xml(row)
    assert 'url="http://a.com/x"' in xml
    assert "&amp; &lt;world&gt;" in xml
    assert '<dup idx="1" of="0"></dup>' in xml
    assert xml.count("<div") == 1  # invalid div not emitted
    # doc-level aggregates (ref: trwritetools.pas:112-124): two valid divs,
    # both score 0.2 <= 0.55 → non-boiler; 15 chars each
    assert 'bdc="b"' in xml  # round(1.234/2)+97 = 'b'
    assert 'bdv="1.234"' in xml
    assert 'nbc="30" nbcprop="1"' in xml
    assert 'nbd="2" nbdprop="1"' in xml
    assert 'avgbpc="0.2" avgbpd="0.2"' in xml
    # div class chars: bpc = chr(round(0.2*10)+97) = 'c'
    assert 'bpc="c" bpv="0.2"' in xml
    # metrics emission (AWriteDivMetrics)
    row["divs"][0]["metrics"] = [0.5, 1.25]
    xml_m = doc_to_xml(row, write_metrics=True)
    assert '<metrics value="0.5 1.25" />' in xml_m

    batch = pa.table(
        {
            "url": ["http://a.com/1"],
            "fingerprint": [[1, 2, 3]],
            "raw_len": [100],
            "links": [["http://http://b.com/x", "http://c.com/y"]],
            "badness": [0.5],
            "tokens": [["a", "b", "a", "c", "a"]],
        }
    )
    sh = shingle_rows(batch)
    assert sh.num_rows == 3 and sh["doc_size"].to_pylist() == [100, 100, 100]
    lk = link_rows(batch)
    assert lk["link"].to_pylist() == ["http://b.com/x", "http://c.com/y"]
    tk = token_rows(batch, top_n=2)
    assert tk["type"].to_pylist() == ["A", "B"]
    assert tk["count"].to_pylist() == [3, 1]


def test_cowtools(tmp_path):
    import ray.data

    from texrex_ray.sources.cowtools import cowinterleave, cowsplit

    corpus = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i}"} for i in range(20)]
    )
    cowsplit(corpus, str(tmp_path / "out"), docs_per_file=5)
    import os

    files = [f for f in os.listdir(tmp_path / "out") if f.endswith(".parquet")]
    assert len(files) >= 2

    ann = ray.data.from_items(
        [{"doc_id": i, "pos_tags": f"T{i}"} for i in range(0, 20, 2)]
    )
    merged = cowinterleave(corpus, ann).to_pandas().sort_values("doc_id")
    assert merged.loc[merged["doc_id"] == 2, "ann_pos_tags"].iloc[0] == "T2"
    assert merged.loc[merged["doc_id"] == 3, "ann_pos_tags"].isna().all()
