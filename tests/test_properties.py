"""Property-based tests (hypothesis) for the scalar kernels."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from texrex_ray.functions.cleanse import cleanse_full, collapse_whitespace, decode_entities
from texrex_ray.functions.hashing import minhash_signatures, ngrams, simhash64
from texrex_ray.functions.normalize import nfc, normalize_text
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE, tokenize
from texrex_ray.functions.urlkit import host_of, ip_to_int
from texrex_ray.state.bloom import ScalingBloom

text_st = st.text(max_size=300)
token_st = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8), max_size=40
)


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_nfc_idempotent(s):
    assert nfc(nfc(s)) == nfc(s)


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_cleanse_removes_all_markup_and_uris(s):
    out, *_ = cleanse_full(s)
    assert "http://" not in out and "https://" not in out
    assert collapse_whitespace(out) == out  # no residual whitespace runs


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_entity_decode_idempotent_on_clean_text(s):
    # after one full decode+strip of '&', a second decode is a no-op
    decoded = decode_entities(s)
    if "&" not in decoded:
        assert decode_entities(decoded) == decoded


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_tokenizer_output_is_letter_runs(s):
    for tok in tokenize(s):
        assert LATIN_TOKEN_RE.fullmatch(tok)


@settings(max_examples=30, deadline=None)
@given(token_st)
def test_ngrams_count(toks):
    g = ngrams(toks, n=5)
    if len(toks) == 0:
        assert g == []
    elif len(toks) < 5:
        assert len(g) == 1
    else:
        assert len(g) == len(toks) - 4
    assert all(len(x) >= 9 for x in g)


@settings(max_examples=30, deadline=None)
@given(token_st)
def test_minhash_and_simhash_deterministic(toks):
    a = minhash_signatures([toks], k=16)
    b = minhash_signatures([list(toks)], k=16)
    assert (a == b).all()
    assert simhash64([toks])[0] == simhash64([list(toks)])[0]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200, unique=True))
def test_bloom_no_false_negatives(items):
    b = ScalingBloom(initial_capacity=64, error_rate=0.01)
    b.add_if_new(items)
    assert b.contains_many(items).all()


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255),
       st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_ip_roundtrip(a, b, c, d):
    v = ip_to_int(f"{a}.{b}.{c}.{d}")
    assert v == (a << 24) | (b << 16) | (c << 8) | d


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + ".-", min_size=1, max_size=20))
def test_host_of_never_raises(h):
    host_of(f"http://{h}/path")


@settings(max_examples=60, deadline=None)
@given(text_st)
def test_pii_redaction_idempotent_and_clean(s):
    import pyarrow as pa

    from texrex_ray.functions.pii import PII_PATTERNS, redact_pii

    once = redact_pii(pa.table({"text": [s]}), "text")
    txt = once["text"].to_pylist()[0]
    # a second pass finds nothing: placeholders contain no PII shapes
    twice = redact_pii(pa.table({"text": [txt]}), "text")
    for name, _, _ in PII_PATTERNS:
        assert twice[f"n_{name}"].to_pylist() == [0]
    assert twice["text"].to_pylist() == [txt]


@settings(max_examples=40, deadline=None)
@given(st.lists(token_st, min_size=1, max_size=8))
def test_repetition_stats_bounds(docs):
    import pyarrow as pa

    from texrex_ray.functions.repetition import repetition_stats

    texts = [" ".join(d) for d in docs]
    out = repetition_stats(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    n = out["n_toks"].to_pylist()
    dup = out["n_dup_toks"].to_pylist()
    top = out["top2_cnt"].to_pylist()
    for i in range(len(texts)):
        toks = texts[i].split(" ")
        assert n[i] == len(toks)
        assert 0 <= dup[i] <= n[i]
        assert dup[i] != 1  # duplicate mass is never exactly one instance
        assert 0 <= top[i] <= max(n[i] - 1, 0)
