"""Train and ship the deboilerplater MLP weights (tenet-equivalent).

Usage::

    python tools/train_boilerplate.py

Writes ``texrex_ray/data/boilerplate_weights.json`` and prints held-out
precision/recall (must exceed 0.9/0.9 — also asserted in
tests/test_boilerplate_training.py).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from texrex_ray.stages.boilertrain import (  # noqa: E402
    evaluate,
    features_and_labels,
    make_labeled_docs,
    train_rprop,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "texrex_ray", "data", "boilerplate_weights.json",
)


def main() -> None:
    train = make_labeled_docs(n_docs=600, seed=7)
    x, y = features_and_labels(train)
    weights = train_rprop(x, y, hidden=18, epochs=300, seed=42)
    holdout = make_labeled_docs(n_docs=200, seed=1234)
    p, r = evaluate(weights, holdout, threshold=0.55)
    print(f"holdout precision={p:.3f} recall={r:.3f} (n_train_divs={len(x)})")
    with open(OUT, "w") as f:
        json.dump({"precision_holdout": p, "recall_holdout": r, **weights}, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
