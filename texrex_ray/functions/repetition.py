"""Gopher-style repetition quality signals, vectorized per batch.

Rae et al. 2021 ("Scaling Language Models: ... Gopher") filter web docs
whose text is dominated by repeated lines / n-grams.  Over the flat
``documents`` table the analogous per-doc signals are:

- ``n_toks``     — token count;
- ``n_dup_toks`` — token instances whose type occurs more than once in
  the doc (duplicate-token mass);
- ``top2_cnt``   — occurrences of the doc's most frequent adjacent
  bigram (the "top 2-gram fraction" numerator);
- ``keep``       — the Gopher-shaped gate in exact integer arithmetic:
  duplicate mass under half the tokens AND the top bigram under a fifth
  of all bigrams.

Everything is per-document, so the stage is embarrassingly parallel —
one ``map_batches`` pass, no shuffle, output is doc-count-sized.  The
per-batch implementation is vectorized pandas/numpy over an exploded
token frame (one C groupby per batch), not a per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def repetition_stats(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    # "" splits to [''] (1 token), matching SQL string_split semantics
    tok_lists = [(s or "").split(" ") for s in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)

    doc_idx = np.repeat(np.arange(len(ids)), lens)
    toks = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists]) if len(doc_idx) else np.array([], dtype=object)

    df = pd.DataFrame({"d": doc_idx, "t": toks})
    # duplicate-token mass: sum of per-(doc, type) counts where count > 1
    cnt = df.groupby(["d", "t"], sort=False).size()
    dup = cnt[cnt > 1].groupby(level="d").sum()
    n_dup = np.zeros(len(ids), dtype=np.int64)
    n_dup[dup.index.to_numpy()] = dup.to_numpy()

    # adjacent bigrams: shift within doc (mask the last token of each doc)
    if len(doc_idx):
        nxt_tok = np.roll(toks, -1)
        nxt_doc = np.roll(doc_idx, -1)
        m = (doc_idx == nxt_doc) & (np.arange(len(doc_idx)) + 1 < len(doc_idx))
        bg = pd.DataFrame(
            {
                "d": doc_idx[m],
                "b": pd.Series(toks[m]) + " " + pd.Series(nxt_tok[m]),
            }
        )
        top = bg.groupby(["d", "b"], sort=False).size().groupby(level="d").max()
    else:
        top = pd.Series(dtype=np.int64)
    top2 = np.zeros(len(ids), dtype=np.int64)
    if len(top):
        top2[top.index.to_numpy()] = top.to_numpy()

    n_bigrams = np.maximum(lens - 1, 0)
    keep = ((n_dup * 2 <= lens) & (top2 * 5 <= n_bigrams)).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_toks": pa.array(lens),
            "n_dup_toks": pa.array(n_dup),
            "top2_cnt": pa.array(top2),
            "keep": pa.array(keep),
        }
    )
