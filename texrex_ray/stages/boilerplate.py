"""Deboilerplater: 37 per-paragraph features + MLP scoring, doc-level kill.

Semantics follow the reference (ref: trdeboilerplater.pas): compute a
37-float feature vector per div (``trdeboilerplater.pas:338-537``:
clamped length, document proportion, positional percentile, markup ratio,
char-class counts, sentence statistics, ©-flag, doctype one-hot, container
one-hot, open/close ratio, skipped divs), smooth the markup-ratio feature
over ±1/±2 windows (``:540-616`` — features 35/36; this forces the nested
divs layout: never explode paragraphs before this stage), run a small MLP
per div (``:619-699``; FANN 37→18→1 sigmoid-symmetric per
``trtenetapplication.pas:131-141``), mark divs with score > threshold as
boilerplate, then kill whole documents below non-boilerplate div/char
count+proportion thresholds (``:290-335``).

The reference's FANN weight files are data we do not copy; the shipped
``data/boilerplate_weights.json`` is TRAINED here by the tenet-equivalent
iRPROP− trainer (``stages/boilertrain.py`` via
``tools/train_boilerplate.py``) on synthetic labeled paragraphs
(nav/footer/copyright/menu boilerplate vs sentence content) over the same
37 features, holding >0.9/0.9 precision/recall on a held-out seed
(asserted in tests).  ``synthetic_weights`` remains as the dependency-free
fallback stand-in.

Doc-kill thresholds default to the reference's shipped configuration
(data/texrex.ini:126-130: Threshold 0.55, MinDivsBelowThreshold 1,
MinCharsBelowThreshold 500, MinCharProportion 0.25, MinDivProportion 0.1).

Actor-pool stage: weights load once per actor in ``__init__``.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from texrex_ray.functions.striphtml import DivInfo

N_FEATURES = 37
_SENT_RE = re.compile(r"[.!?]+")
TRAINED_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "boilerplate_weights.json",
)


def trained_weights() -> dict:
    """The shipped iRPROP−-trained net (tools/train_boilerplate.py)."""
    with open(TRAINED_WEIGHTS_PATH) as f:
        return json.load(f)


def div_features(infos: list[DivInfo], doctype: str = "") -> np.ndarray:
    """(n_divs, 37) float32 feature matrix for one document."""
    n = len(infos)
    f = np.zeros((n, N_FEATURES), dtype=np.float32)
    if n == 0:
        return f
    lens = np.array([len(d.text) for d in infos], dtype=np.float64)
    total = max(1.0, lens.sum())
    for i, d in enumerate(infos):
        t = d.text
        L = len(t)
        invL = 1.0 / max(1, L)
        n_alpha = sum(c.isalpha() for c in t)
        n_digit = sum(c.isdigit() for c in t)
        n_upper = sum(c.isupper() for c in t)
        n_punct = sum(c in ".,;:!?()[]{}'\"-" for c in t)
        n_space = t.count(" ")
        words = t.split()
        n_words = len(words)
        sentences = [s for s in _SENT_RE.split(t) if s.strip()]
        markup = d.open_tags + d.close_tags
        f[i, 0] = min(L, 2000.0) / 2000.0           # clamped length
        f[i, 1] = L / total                          # doc proportion
        f[i, 2] = i / n                              # positional percentile
        f[i, 3] = (i + 1) == n                       # last div flag
        f[i, 4] = i == 0                             # first div flag
        f[i, 5] = markup * invL                      # markup ratio (smoothed below)
        f[i, 6] = d.anchors * invL                   # anchor density
        f[i, 7] = d.anchors / max(1, n_words)        # anchors per word
        f[i, 8] = n_alpha * invL
        f[i, 9] = n_digit * invL
        f[i, 10] = n_upper * invL
        f[i, 11] = n_punct * invL
        f[i, 12] = n_space * invL
        f[i, 13] = min(n_words, 400) / 400.0
        f[i, 14] = (n_alpha / max(1, n_words)) / 15.0 if n_words else 0.0  # mean word len
        f[i, 15] = len(sentences) / max(1, n_words)  # sentence density
        f[i, 16] = (
            np.mean([len(s.split()) for s in sentences]) / 40.0 if sentences else 0.0
        )                                            # mean sentence words
        f[i, 17] = ("©" in t) or ("copyright" in t.lower())
        f[i, 18] = d.open_tags / max(1, d.close_tags)  # open/close ratio
        f[i, 19] = min(d.skipped, 10) / 10.0
        f[i, 20] = t.rstrip().endswith((".", "!", "?"))
        f[i, 21] = t[:1].isupper() if t else 0.0
        f[i, 22] = sum(w.isdigit() for w in words) / max(1, n_words)
        f[i, 23] = t.count("|") * invL
        f[i, 24] = t.count("•") * invL + t.count("·") * invL
        # doctype one-hot (25-28): none/html4/xhtml/html5
        dt = (doctype or "").lower()
        f[i, 25] = dt == ""
        f[i, 26] = "html 4" in dt or "html4" in dt
        f[i, 27] = "xhtml" in dt
        f[i, 28] = dt.strip() == "html"
        # container one-hot (29-34): other/p/div/li/td/h*
        c = infos[i].container
        f[i, 29] = c == 0
        f[i, 30] = c == 1
        f[i, 31] = c == 2
        f[i, 32] = c == 3
        f[i, 33] = c == 4
        f[i, 34] = c in (5, 6)
    # windowed markup-ratio smoothing ±1 / ±2 (features 35, 36)
    mr = f[:, 5].astype(np.float64)
    pad = np.pad(mr, 2, mode="edge")
    f[:, 35] = ((pad[1:-3] + pad[2:-2] + pad[3:-1]) / 3.0).astype(np.float32)
    f[:, 36] = ((pad[:-4] + pad[1:-3] + pad[2:-2] + pad[3:-1] + pad[4:]) / 5.0).astype(
        np.float32
    )
    return f


def synthetic_weights(seed: int = 42, hidden: int = 18) -> dict:
    """Deterministic 37→18→1 stand-in net with heuristic sign structure."""
    rng = np.random.default_rng(seed)
    w1 = (rng.standard_normal((N_FEATURES, hidden)) * 0.15).astype(np.float64)
    b1 = np.zeros(hidden)
    w2 = (rng.standard_normal((hidden, 1)) * 0.3).astype(np.float64)
    b2 = np.zeros(1)
    # bias the first hidden units toward the classic heuristics
    w1[5, 0] = 3.0; w1[6, 0] = 2.0; w1[0, 0] = -2.0    # markup+anchors, short
    w2[0, 0] = 2.5
    w1[7, 1] = 3.0; w1[16, 1] = -2.0                    # anchors/word, no sentences
    w2[1, 0] = 2.0
    w1[17, 2] = 3.0; w1[2, 2] = 2.0                     # © near document end
    w2[2, 0] = 1.5
    return {
        "w1": w1.tolist(), "b1": b1.tolist(),
        "w2": w2.tolist(), "b2": b2.tolist(),
    }


class MLP:
    def __init__(self, weights: dict):
        self.w1 = np.asarray(weights["w1"], dtype=np.float64)
        self.b1 = np.asarray(weights["b1"], dtype=np.float64)
        self.w2 = np.asarray(weights["w2"], dtype=np.float64)
        self.b2 = np.asarray(weights["b2"], dtype=np.float64)

    def score(self, feats: np.ndarray) -> np.ndarray:
        h = np.tanh(feats @ self.w1 + self.b1)  # sigmoid-symmetric (FANN)
        o = 1.0 / (1.0 + np.exp(-(h @ self.w2 + self.b2)))
        return o[:, 0]


class Deboilerplater:
    """Actor-pool stage over nested-div rows.

    Expects per-row columns ``divs`` (list<struct> with text/open_tags/
    close_tags/anchors/container/skipped) and ``doctype``; appends
    ``boiler_score`` per div, a per-div ``boilerplate`` flag, and doc-level
    ``valid`` kill per the reference thresholds
    (trdeboilerplater.pas:290-335).
    """

    def __init__(
        self,
        weights_json: str | None = None,
        fann_file: str | None = None,
        threshold: float = 0.55,
        min_good_divs: int = 1,
        min_good_chars: int = 500,
        min_char_prop: float = 0.25,
        min_div_prop: float = 0.1,
        store_metrics: bool = False,
    ):
        if fann_file:
            # classification parity with a reference deployment: load the
            # net the reference's SetFannFile would (FANN_FLO_2.1 text,
            # trdeboilerplater.pas:697-699); `texrex_ray fannport` converts
            # such files to the weights-JSON every other surface accepts
            from texrex_ray.stages.fann import fann_to_mlp_weights, load_fann

            weights = fann_to_mlp_weights(load_fann(fann_file))
        elif weights_json:
            weights = json.loads(weights_json)
        else:
            try:
                weights = trained_weights()
            except OSError:
                weights = synthetic_weights()
        self.net = MLP(weights)
        self.threshold = threshold
        self.min_good_divs = min_good_divs
        self.min_good_chars = min_good_chars
        self.min_char_prop = min_char_prop
        self.min_div_prop = min_div_prop
        self.store_metrics = store_metrics

    def score_doc(
        self, infos: list[DivInfo], doctype: str = ""
    ) -> tuple[np.ndarray, bool, np.ndarray]:
        """(per-div scores, doc_valid, feature matrix) — kill logic per
        trdeboilerplater.pas:290-335 (DecideThreshs)."""
        feats = div_features(infos, doctype)
        if len(infos) == 0:
            return np.zeros(0), False, feats
        scores = self.net.score(feats)
        good = scores <= self.threshold
        n_good = int(good.sum())
        good_chars = sum(len(d.text) for d, g in zip(infos, good) if g)
        total_chars = max(1, sum(len(d.text) for d in infos))
        doc_valid = (
            n_good >= self.min_good_divs
            and good_chars >= self.min_good_chars
            and good_chars / total_chars >= self.min_char_prop
            and n_good / len(infos) >= self.min_div_prop
        )
        return scores, doc_valid, feats

    def __call__(self, batch):
        import pyarrow as pa

        divs_col = batch["divs"].to_pylist()
        doctypes = (
            batch["doctype"].to_pylist()
            if "doctype" in batch.column_names
            else [""] * len(divs_col)
        )
        new_divs, valids = [], []
        for divs, dt in zip(divs_col, doctypes):
            infos = [
                DivInfo(
                    text=d["text"], open_tags=d.get("open_tags", 0),
                    close_tags=d.get("close_tags", 0), anchors=d.get("anchors", 0),
                    container=d.get("container", 0), skipped=d.get("skipped", 0),
                )
                for d in (divs or [])
            ]
            scores, ok, feats = self.score_doc(infos, dt or "")
            valids.append(ok)
            extra = (
                [{"metrics": [float(x) for x in feats[i]]} for i in range(len(scores))]
                if self.store_metrics
                else [{}] * len(scores)
            )
            new_divs.append(
                [
                    {**d, "boiler_score": float(s),
                     "boilerplate": bool(s > self.threshold), **e}
                    for d, s, e in zip(divs or [], scores, extra)
                ]
            )
        batch = batch.set_column(
            batch.schema.get_field_index("divs"), "divs", pa.array(new_divs)
        )
        if "valid" in batch.column_names:
            import pyarrow.compute as pc

            merged = pc.and_(batch["valid"], pa.array(valids, pa.bool_()))
            return batch.set_column(batch.schema.get_field_index("valid"), "valid", merged)
        return batch.append_column("valid", pa.array(valids, pa.bool_()))
