"""Edit-distance-1 join: verifier exactness, blocking completeness, Ray op."""

import itertools
import random

import pandas as pd
import pytest
import ray.data

from texrex_ray.dedup.editdist import _del1_keys, ed1_pairs, edit_distance_is_1


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_verifier_matches_dp_on_random_strings():
    rng = random.Random(7)
    alphabet = "abc"
    pool = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 5)))
        for _ in range(80)
    ]
    for a, b in itertools.combinations(pool, 2):
        assert edit_distance_is_1(a, b) == (_levenshtein(a, b) == 1), (a, b)


def test_verifier_edges():
    assert edit_distance_is_1("a", "")          # deletion to empty
    assert edit_distance_is_1("hot gear", "hot bear")   # substitution
    assert edit_distance_is_1("gear", "gears")  # insertion
    assert not edit_distance_is_1("ab", "ba")   # transposition = 2
    assert not edit_distance_is_1("same", "same")
    assert not edit_distance_is_1("abc", "abcde")


def test_blocking_complete_for_distance_1():
    """Every true ED-1 pair shares at least one blocking key."""
    rng = random.Random(13)
    pool = list(
        {
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 4)))
            for _ in range(60)
        }
    )
    for a, b in itertools.combinations(pool, 2):
        if _levenshtein(a, b) == 1:
            assert set(_del1_keys(a)) & set(_del1_keys(b)), (a, b)


def test_ed1_pairs_matches_bruteforce(ray_session):
    rows = [
        {"name": s}
        for s in [
            "red widget", "red wídget", "red widgets", "blue bolt", "blue bolt",
            "blue colt", "glue bolt", "ba", "ab", "a", "", "hot gear",
            "hot bear", "hot gear",
        ]
    ]
    ds = ray.data.from_items(rows)
    got = ed1_pairs(ds, "name")
    vocab = pd.Series([r["name"] for r in rows]).value_counts()
    want = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(vocab.index), 2)
        if _levenshtein(a, b) == 1
    )
    assert list(zip(got["a"], got["b"])) == want
    # counts ride through: "blue bolt" appears twice, "hot gear" twice
    row = got[(got["a"] == "blue bolt") & (got["b"] == "blue colt")].iloc[0]
    assert row["n_a"] == 2 and row["n_b"] == 1


def test_ed1_min_count_floor(ray_session):
    ds = ray.data.from_items(
        [{"name": "aa"}, {"name": "aa"}, {"name": "ab"}, {"name": "ab"}, {"name": "ac"}]
    )
    got = ed1_pairs(ds, "name", min_count=2)
    assert list(zip(got["a"], got["b"])) == [("aa", "ab")]


def test_degenerate_group_raises(ray_session):
    import texrex_ray.dedup.editdist as m

    old = m.MAX_GROUP
    m.MAX_GROUP = 3
    try:
        ds = ray.data.from_items([{"name": f"x{i}"} for i in range(10)])
        with pytest.raises(Exception, match="degenerate"):
            ed1_pairs(ds, "name")
    finally:
        m.MAX_GROUP = old
