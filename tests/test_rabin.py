"""Rabin64 port goldens: the vectorized table path must match a literal
transcription of the reference algorithm (trrabinhash.pas:111-268) under
the ported trpoly64 polynomial table, and the shingle construction must
follow trshingler.pas:97-150 (upper-case, no separator, space-pad to 9,
no fingerprint below n tokens)."""

import numpy as np

from texrex_ray.functions.rabin import (
    DEFAULT_POLY,
    load_polys,
    rabin64_scalar,
    rabin_hash_many,
    rabin_minhash_signatures,
    reference_shingles,
)


def test_poly_table_ported_verbatim():
    polys = load_polys()
    assert len(polys) == 1000
    # first/second/last entries of trpoly64.pas (binary literals)
    assert int(polys[0]) == 0x1B
    assert int(polys[1]) == 0xB000000000000001
    assert int(polys[999]) == 0xBD7A1A4C91168C05


def test_vectorized_matches_scalar_transcription():
    polys = load_polys(7)
    cases = [b"", b"a", b"abc", b"ABCDEFGH", b"ABCDEFGHI",
             b"The quick brown fox jumps over the lazy dog", b"x" * 23]
    vec = rabin_hash_many(list(cases), 7)
    for i, s in enumerate(cases):
        for j, p in enumerate(polys):
            assert int(vec[i, j]) == rabin64_scalar(s, int(p)), (s, hex(int(p)))


def test_golden_values_pinned():
    """Regression pin: these values define shingle-file compatibility."""
    g = rabin_hash_many([b"   LOREMIPSUM", b"THEQUICKBROWNFOXJUMPS"], 3)
    assert [hex(int(x)) for x in g[0]] == [
        "0x52454e2a33352714", "0x12454d718b067881", "0x79c91a2d2fa5acc0"]
    assert [hex(int(x)) for x in g[1]] == [
        "0x43a42be42846730a", "0x40e7c6448b34224f", "0xa75009f3850d20e7"]
    # sub-8-byte strings pass through unreduced (starter-byte loop only) —
    # the reason the reference pads shingles to >= 9 chars
    assert rabin64_scalar(b"texrex", DEFAULT_POLY) == int.from_bytes(b"texrex", "big")


def test_reference_shingle_construction():
    toks = ["the", "quick", "brown", "fox", "jumps", "over"]
    assert reference_shingles(toks, n=5) == [
        b"THEQUICKBROWNFOXJUMPS", b"QUICKBROWNFOXJUMPSOVER"]
    # short grams pad LEFT with spaces to 9
    assert reference_shingles(["ab", "cd"], n=2) == [b"     ABCD"]
    # below n tokens: no fingerprint at all (reference Exits)
    assert reference_shingles(["only", "four", "tokens", "here"], n=5) == []


def test_minhash_signature_min_semantics():
    toks = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    sig, has = rabin_minhash_signatures([toks, ["too", "few"]], k=8, n=5)
    assert has.tolist() == [True, False]
    grams = reference_shingles(toks, n=5)
    h = rabin_hash_many(grams, 8)
    assert (sig[0] == h.min(axis=0)).all()
    assert (sig[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
