"""tenet-equivalent: train the 37→18→1 deboilerplater MLP with iRPROP−.

The reference ships FANN nets trained offline by tenet
(ref: trtenetapplication.pas:121-149: default 37 inputs, one hidden layer
of 18, RPROP, sigmoid-symmetric hidden).  We do not copy those weight
files; instead this module generates LABELED synthetic paragraphs —
boilerplate = navigation link lists, footers/copyright lines, pipe menus,
short CTA fragments, like the structures the webgraph generator emits —
computes the SAME 37 features the serving stage uses
(``boilerplate.div_features``), and trains with iRPROP− (Igel & Hüsken
2000, the sign-based step-size adaptation FANN's RPROP implements).

``tools/train_boilerplate.py`` runs this and ships the weights as JSON
(``texrex_ray/data/boilerplate_weights.json``); precision/recall on a
held-out seed is asserted in tests.
"""

from __future__ import annotations

import numpy as np

from texrex_ray.functions.striphtml import DivInfo
from texrex_ray.stages.boilerplate import N_FEATURES, MLP, div_features

_CONTENT_WORDS = (
    "research shows that rivers carry sediment downstream over many years "
    "forming deltas where they meet the sea local farmers adapt their crops "
    "to the changing seasons and markets while historians debate the causes "
    "of the decline scholars agree the evidence points to gradual change "
    "communities organized festivals every spring celebrating the harvest "
    "engineers designed the bridge to withstand strong winds and heavy loads"
).split()

_NAV_WORDS = "home about contact products news login register search sitemap help faq terms".split()

_CTA = ["read more", "click here", "subscribe now", "buy now", "learn more",
        "sign up", "download", "share this"]


def _content_div(rng: np.random.Generator, pos_hint: float) -> tuple[DivInfo, int]:
    anchors = int(rng.random() < 0.25)  # the occasional inline link
    if rng.random() < 0.4:
        # unpunctuated prose (forum posts, scraped fragments): still content
        words = rng.choice(_CONTENT_WORDS, size=12 + int(rng.integers(0, 28)))
        text = " ".join(words)
    else:
        n_sent = 2 + int(rng.integers(0, 5))
        sents = []
        for _ in range(n_sent):
            words = rng.choice(_CONTENT_WORDS, size=8 + int(rng.integers(0, 14)))
            sents.append(" ".join(words).capitalize() + ".")
        text = " ".join(sents)
    return (
        DivInfo(text=text, open_tags=anchors, close_tags=anchors,
                anchors=anchors, container=1, skipped=0),
        0,
    )


def _boiler_div(rng: np.random.Generator, pos_hint: float) -> tuple[DivInfo, int]:
    kind = rng.integers(0, 4)
    if kind == 0:  # nav link list
        n = 3 + int(rng.integers(0, 8))
        items = list(rng.choice(_NAV_WORDS, size=n))
        text = " ".join(items)
        anchors = n
        tags = n + int(rng.integers(0, 4))
    elif kind == 1:  # footer / copyright
        year = 1999 + int(rng.integers(0, 25))
        text = f"© {year} example corp all rights reserved privacy policy imprint"
        anchors = 1 + int(rng.integers(0, 3))
        tags = anchors
    elif kind == 2:  # pipe menu
        n = 3 + int(rng.integers(0, 6))
        text = " | ".join(rng.choice(_NAV_WORDS, size=n))
        anchors = n
        tags = n
    else:  # short CTA fragment
        text = str(rng.choice(_CTA))
        anchors = 1
        tags = 1 + int(rng.integers(0, 2))
    return (
        DivInfo(text=text, open_tags=tags, close_tags=tags,
                anchors=anchors, container=int(rng.integers(0, 5)), skipped=0),
        1,
    )


def make_labeled_docs(
    n_docs: int = 400, seed: int = 7
) -> list[tuple[list[DivInfo], str, np.ndarray]]:
    """Documents of mixed divs: header/footer boilerplate around content."""
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n_docs):
        n_head = int(rng.integers(1, 4))
        n_body = int(rng.integers(2, 8))
        n_tail = int(rng.integers(1, 3))
        divs: list[DivInfo] = []
        labels: list[int] = []
        for _ in range(n_head):
            d, y = _boiler_div(rng, 0.0)
            divs.append(d)
            labels.append(y)
        for _ in range(n_body):
            # content with occasional interspersed boilerplate
            d, y = (_boiler_div if rng.random() < 0.15 else _content_div)(rng, 0.5)
            divs.append(d)
            labels.append(y)
        for _ in range(n_tail):
            d, y = _boiler_div(rng, 1.0)
            divs.append(d)
            labels.append(y)
        doctype = str(rng.choice(["", "html", "xhtml"]))
        docs.append((divs, doctype, np.array(labels, dtype=np.float64)))
    return docs


def features_and_labels(docs) -> tuple[np.ndarray, np.ndarray]:
    xs, ys = [], []
    for divs, doctype, labels in docs:
        xs.append(div_features(divs, doctype))
        ys.append(labels)
    return np.vstack(xs).astype(np.float64), np.concatenate(ys)


def train_rprop(
    x: np.ndarray,
    y: np.ndarray,
    hidden: int = 18,
    epochs: int = 300,
    seed: int = 42,
) -> dict:
    """Full-batch iRPROP− on MSE; tanh hidden, sigmoid output (the serving
    MLP's activations).  Returns the weights dict the MLP class loads."""
    rng = np.random.default_rng(seed)
    w1 = rng.standard_normal((x.shape[1], hidden)) * 0.3
    b1 = np.zeros(hidden)
    w2 = rng.standard_normal((hidden, 1)) * 0.3
    b2 = np.zeros(1)
    params = [w1, b1, w2, b2]
    steps = [np.full_like(p, 0.0125) for p in params]
    prev = [np.zeros_like(p) for p in params]
    yv = y[:, None]
    n = len(x)
    for _ in range(epochs):
        h = np.tanh(x @ w1 + b1)
        o = 1.0 / (1.0 + np.exp(-(h @ w2 + b2)))
        d2 = 2.0 * (o - yv) * o * (1.0 - o) / n
        g_w2 = h.T @ d2
        g_b2 = d2.sum(axis=0)
        dh = (d2 @ w2.T) * (1.0 - h * h)
        g_w1 = x.T @ dh
        g_b1 = dh.sum(axis=0)
        for p, st, pg, g in zip(params, steps, prev, (g_w1, g_b1, g_w2, g_b2)):
            sgn = np.sign(g)
            same = pg * g > 0
            flip = pg * g < 0
            st[same] = np.minimum(st[same] * 1.2, 50.0)
            st[flip] = np.maximum(st[flip] * 0.5, 1e-6)
            g = np.where(flip, 0.0, g)  # iRPROP−: zero gradient on sign flip
            p -= np.sign(g) * st
            pg[...] = g
    return {"w1": w1.tolist(), "b1": b1.tolist(), "w2": w2.tolist(), "b2": b2.tolist()}


def evaluate(weights: dict, docs, threshold: float = 0.55) -> tuple[float, float]:
    """(precision, recall) of boilerplate detection on labeled docs."""
    net = MLP(weights)
    x, y = features_and_labels(docs)
    pred = net.score(x) > threshold
    truth = y > 0.5
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    return precision, recall
