"""Count-based document classification (multinomial-Naive-Bayes shape).

The quality/language gate a corpus pipeline actually trains in place:
count per-class token frequencies over a labeled split, score unseen
documents by summed per-token class weights, take the argmax.  Both
phases are pure count algebra, so the whole classifier — training AND
serving — distributes as combiner partials + one vocab-sized exchange,
and is INTEGER-EXACT end to end:

    weight_c(w) = (C_c(w) + 1) · 10⁶ // (T_c + V)      (add-one smoothing)
    score_c(d)  = Σ_w  tf(w, d) · weight_c(w)
    pred(d)     = argmax_c score_c(d),  ties to the smaller class label

This is the log-free integer surrogate of multinomial NB: the true NB
score is Σ tf·log p̂ — a float whose libm tail differs across engines —
while the linear-weight sum keeps the same "frequent-in-class tokens
vote for the class" geometry with bit-identical cross-engine results
(documented deviation: argmax of Σ tf·p̂ is not always the argmax of
Σ tf·log p̂).

Scale shape: training = per-batch token-count partials → ONE
(class, token)-keyed bucketed exchange (vocab·classes rows, ≪ corpus);
the weight table is tokenizer-vocab-sized and broadcast once via
``ray.put``; serving is a stateless zero-shuffle ``map_batches`` pass.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_TOKEN_RE = re.compile(r"[a-z]+")

_SCALE = 1_000_000


def train_class_weights(
    train: ray.data.Dataset,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    expected_rows: int | None = None,
) -> tuple[dict[tuple[str, str], int], dict[str, int], int]:
    """((class, token) -> weight, class -> default weight, vocab size).

    The default weight is the smoothed weight of an unseen token,
    ``10⁶ // (T_c + V)`` — per class, because class totals differ.
    """
    from texrex_ray.ops.aggregate import bucketed_groupby

    def count_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter[tuple[str, str]] = Counter()
        for lab, s in zip(t[label_col].to_pylist(), t[text_col].to_pylist()):
            for w in _TOKEN_RE.findall((s or "").lower()):
                c[(lab, w)] += 1
        return pa.table(
            {
                "lab": pa.array([k[0] for k in c], pa.string()),
                "tok": pa.array([k[1] for k in c], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = bucketed_groupby(
        train.map_batches(count_partial, batch_format="pyarrow"),
        ["lab", "tok"],
        lambda g: g.groupby(["lab", "tok"], as_index=False)["n"].sum(),
        expected_rows=expected_rows,
    ).to_pandas()  # vocab·classes-sized — the model, not the corpus

    vocab = int(counts["tok"].nunique())
    totals = counts.groupby("lab")["n"].sum().astype("int64")
    weights: dict[tuple[str, str], int] = {}
    for lab, tok, n in zip(counts["lab"], counts["tok"], counts["n"]):
        weights[(lab, tok)] = (int(n) + 1) * _SCALE // (int(totals[lab]) + vocab)
    defaults = {
        lab: _SCALE // (int(t) + vocab) for lab, t in totals.items()
    }
    return weights, defaults, vocab


def classify(
    ds: ray.data.Dataset,
    weights: dict[tuple[str, str], int],
    defaults: dict[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, pred, score) — argmax class per document, zero shuffle.

    The weight table rides the object store once (``ray.put``); each
    batch scores its documents with vectorized dict lookups.
    """
    classes = sorted(defaults)
    model_ref = ray.put((weights, defaults, classes))

    def score_batch(t: pa.Table) -> pa.Table:
        from collections import Counter

        w, dflt, cls = ray.get(model_ref)
        ids, preds, scores = [], [], []
        for did, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            tf = Counter(_TOKEN_RE.findall((s or "").lower()))
            if not tf:
                continue
            best_c, best_s = None, None
            for c in cls:
                d = dflt[c]
                sc = 0
                for tok, n in tf.items():
                    sc += n * w.get((c, tok), d)
                if best_s is None or sc > best_s:
                    best_c, best_s = c, sc
            ids.append(did)
            preds.append(best_c)
            scores.append(best_s)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pred": pa.array(preds, pa.string()),
                "score": pa.array(scores, pa.int64()),
            }
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def classify_sequential(
    train_rows: list[tuple[str, str]], test_rows: list[tuple[int, str]]
) -> dict[int, tuple[str, int]]:
    """Independent dict-based twin (test oracle): same weights/argmax from
    plain Python counts, no Dataset machinery."""
    from collections import Counter, defaultdict

    cnt: dict[str, Counter] = defaultdict(Counter)
    for lab, s in train_rows:
        cnt[lab].update(_TOKEN_RE.findall((s or "").lower()))
    vocab = len({t for c in cnt.values() for t in c})
    weights = {
        lab: {t: (n + 1) * _SCALE // (sum(c.values()) + vocab) for t, n in c.items()}
        for lab, c in cnt.items()
    }
    defaults = {lab: _SCALE // (sum(c.values()) + vocab) for lab, c in cnt.items()}
    out = {}
    for did, s in test_rows:
        tf = Counter(_TOKEN_RE.findall((s or "").lower()))
        if not tf:
            continue
        best = None
        for lab in sorted(cnt):
            sc = sum(n * weights[lab].get(t, defaults[lab]) for t, n in tf.items())
            if best is None or sc > best[1]:
                best = (lab, sc)
        out[did] = best
    return out
