"""Trained deboilerplater weights: held-out quality + shipped-file checks.

Replaces the sign-structure smoke tests as the quality gate the verdict
asked for: the tenet-equivalent trainer (stages/boilertrain.py) must reach
>0.9 precision AND recall on labeled divs generated from a seed never seen
in training, and the shipped JSON must reproduce that."""

import numpy as np

from texrex_ray.stages.boilerplate import MLP, Deboilerplater, trained_weights
from texrex_ray.stages.boilertrain import evaluate, make_labeled_docs


def test_shipped_weights_holdout_quality():
    holdout = make_labeled_docs(n_docs=150, seed=20260817)  # unseen seed
    p, r = evaluate(trained_weights(), holdout, threshold=0.55)
    assert p > 0.9 and r > 0.9, (p, r)


def test_default_stage_uses_trained_weights():
    d = Deboilerplater()
    w = trained_weights()
    assert np.allclose(d.net.w1, np.asarray(w["w1"]))
    # reference-default kill thresholds (data/texrex.ini:126-130)
    assert d.threshold == 0.55
    assert d.min_good_divs == 1
    assert d.min_good_chars == 500
    assert d.min_char_prop == 0.25
    assert d.min_div_prop == 0.1


def test_doc_kill_thresholds():
    """A doc of pure boilerplate dies; a content-heavy doc survives."""
    docs = make_labeled_docs(n_docs=40, seed=99)
    d = Deboilerplater()
    killed = survived = 0
    for divs, doctype, labels in docs:
        boiler_only = [dv for dv, y in zip(divs, labels) if y == 1]
        content_heavy = [dv for dv, y in zip(divs, labels) if y == 0] * 4
        if boiler_only:
            _, ok, _ = d.score_doc(boiler_only, doctype)
            killed += not ok
        if sum(len(dv.text) for dv in content_heavy) >= 600:
            _, ok, _ = d.score_doc(content_heavy, doctype)
            survived += ok
    assert killed >= 35  # pure boilerplate rarely survives
    assert survived >= 30  # content-heavy docs rarely die


def test_trainer_is_deterministic():
    from texrex_ray.stages.boilertrain import features_and_labels, train_rprop

    docs = make_labeled_docs(n_docs=30, seed=3)
    x, y = features_and_labels(docs)
    w_a = train_rprop(x, y, epochs=20, seed=5)
    w_b = train_rprop(x, y, epochs=20, seed=5)
    assert np.allclose(np.asarray(w_a["w1"]), np.asarray(w_b["w1"]))
    assert MLP(w_a).score(x).shape == (len(x),)
