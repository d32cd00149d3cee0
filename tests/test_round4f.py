"""Round-4 batch F: KS drift, decayed activity, minhash estimator audit."""

import re

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- q161

def test_ks_drift_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import PPM, QUERIES

    got = QUERIES["q161_ks_drift"](SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vals = np.sort(docs["n_chars"].unique())
    n = len(docs)
    for _, r in got.iterrows():
        src = r["source"]
        mine = docs[docs["source"] == src]["n_chars"].to_numpy()
        rest = docs[docs["source"] != src]["n_chars"].to_numpy()
        ks_num = 0
        for v in vals:
            cs = int((mine <= v).sum())
            cr = int((rest <= v).sum())
            ks_num = max(ks_num, abs(cs * len(rest) - cr * len(mine)))
        assert int(r["ks_ppm"]) == ks_num * PPM // (len(mine) * len(rest))
        assert int(r["n_docs"]) == len(mine)


def test_ks_identical_halves_is_zeroish(ray_session):
    # a source compared against a COPY of itself has KS 0 by construction;
    # sanity for the cross-multiplied numerator: identical ECDFs cancel
    from texrex_ray.pipelines.queries import PPM

    xs = np.array([3, 5, 5, 9, 9, 9])
    # cs*nr - cr*ns with mine == rest
    for v in np.unique(xs):
        cs = int((xs <= v).sum())
        assert cs * len(xs) - cs * len(xs) == 0
    assert PPM > 0


# ------------------------------------------------------------------- q162

def test_decayed_activity_matches_serial(ray_session):
    from texrex_ray.pipelines.queries import (
        DECAY_MAX_SHIFT, PPM, QUERIES, WEEK_US,
    )

    got = QUERIES["q162_decayed_activity"](SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("int64")
    m = int(us.max())
    want: dict = {}
    for uid, t in zip(ev["user_id"], us):
        shift = min((m - int(t)) // WEEK_US, DECAY_MAX_SHIFT)
        n, w = want.get(int(uid), (0, 0))
        want[int(uid)] = (n + 1, w + PPM // (1 << shift))
    have = {
        int(r["user_id"]): (int(r["n_events"]), int(r["decayed_ppm"]))
        for _, r in got.iterrows()
    }
    assert have == want
    # decay sanity: no user's decayed score exceeds n_events * 1e6
    assert (got["decayed_ppm"] <= got["n_events"] * PPM).all()


# ------------------------------------------------------------------- q163

def test_minhash_audit_matches_serial(ray_session):
    from texrex_ray.functions.rabin import rabin_minhash_signatures
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE
    from texrex_ray.pipelines.queries import PPM, QUERIES

    got = QUERIES["q163_minhash_audit"](SF)
    assert len(got) > 0
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")

    def sig(did: int) -> np.ndarray:
        toks = LATIN_TOKEN_RE.findall((docs.loc[did, "text"] or "").lower())
        s, ok = rabin_minhash_signatures([toks], k=100, n=5)
        assert ok[0]
        return s[0]

    def grams(did: int) -> frozenset:
        ws = re.findall(r"[a-z]+", (docs.loc[did, "text"] or "").lower())
        return frozenset(" ".join(ws[i:i + 3]) for i in range(len(ws) - 2))

    for _, r in got.iterrows():
        a, b = int(r["id_a"]), int(r["id_b"])
        match = int((sig(a) == sig(b)).sum())
        assert int(r["n_match"]) == match
        assert int(r["est_ppm"]) == match * PPM // 100
        ga, gb = grams(a), grams(b)
        inter = len(ga & gb)
        union = len(ga) + len(gb) - inter
        assert int(r["j_ppm"]) == inter * PPM // union
        # the whole point: the estimate tracks the exact value
        assert abs(int(r["est_ppm"]) - int(r["j_ppm"])) < 250_000


def test_minhash_sigs_fixture_fresh():
    """Committed signature fixture equals a live recompute at sf0.01."""
    from texrex_ray.functions.rabin import rabin_minhash_signatures
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    fix = pd.read_parquet(
        "/root/repo/tests/fixtures/oracle/minhash_sigs_sf0.01.parquet"
    )
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet").set_index(
        "doc_id"
    )
    for did, sub in fix.groupby("doc_id"):
        toks = LATIN_TOKEN_RE.findall((docs.loc[did, "text"] or "").lower())
        s, ok = rabin_minhash_signatures([toks], k=100, n=5)
        assert ok[0]
        want = sub.sort_values("h_idx")["sig"].to_numpy().astype(np.uint64)
        assert (s[0] == want).all(), did
