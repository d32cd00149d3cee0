"""The texrex cleaning chain over flat text documents, as Arrow batch stages.

Maps the reference worker chain (ref: trworker.pas:422-621, stages §2.2 of
SURVEY.md) onto ``map_batches``-composable functions for tables with a
``text`` column (the driver ``documents`` table, image captions, crawl
page paragraphs).  Stage order mirrors the reference: cleanse (SecondPass)
→ normalize → NFC → tokenize → quality/size filter → assessment (badness +
language) → fingerprints (md5 / rolling / minhash / simhash).

All stages are stateless pure functions except ``Assessor`` (profiles are
tiny, but it is written as a callable class so profile parsing happens once
per actor — the reference instantiates profiles per worker thread,
trworker.pas:297-344).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from texrex_ray.functions.assess import LanguageProfile
from texrex_ray.functions.cleanse import cleanse_full
from texrex_ray.functions.hashing import (
    md5_hex,
    minhash_signatures,
    rolling_fingerprints,
    simhash64,
)
from texrex_ray.functions.normalize import nfc, normalize_text, utf8_size
from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

# A small English-ish stopword set used by the quality scorer; fixed so the
# DuckDB oracle can embed the identical list.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "at", "by", "from", "as", "it", "this", "that", "be",
)


def secondpass(batch: pa.Table, col: str = "text") -> pa.Table:
    """Entity decode + tag/email/URI/hashtag blanking + whitespace collapse.

    Adds replacement-count columns (the reference's per-div cleanse metrics,
    ref: trsecondpass.pas:135-141).
    """
    batch = batch.replace_schema_metadata(None)  # drop pandas metadata
    texts = batch.column(col).to_pylist()
    out = [cleanse_full(s or "") for s in texts]
    cleaned = [o[0] for o in out]
    counts = np.array([o[1:] for o in out], dtype=np.int32).reshape(len(out), 4)
    batch = batch.set_column(batch.schema.get_field_index(col), col, pa.array(cleaned, pa.string()))
    for i, name in enumerate(("n_tags", "n_emails", "n_uris", "n_hashtags")):
        batch = batch.append_column(name, pa.array(counts[:, i]))
    return batch


def normalize(batch: pa.Table, col: str = "text") -> pa.Table:
    """Normalizer + NFC (ref: trnormalizer.pas, trnfcnormalizer.pas)."""
    texts = batch.column(col).to_pylist()
    normed = [nfc(normalize_text(s or "")) for s in texts]
    return batch.set_column(
        batch.schema.get_field_index(col), col, pa.array(normed, pa.string())
    )


def tokenize_stage(batch: pa.Table, col: str = "text") -> pa.Table:
    """Adds tokens (list<string>), n_tokens, n_types, utf8_size."""
    texts = batch.column(col).to_pylist()
    toks = [LATIN_TOKEN_RE.findall(s or "") for s in texts]
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    n_types = np.array([len({w.upper() for w in t}) for t in toks], dtype=np.int64)
    sizes = np.array([utf8_size(s or "") for s in texts], dtype=np.int64)
    return (
        batch.append_column("tokens", pa.array(toks, pa.list_(pa.string())))
        .append_column("n_tokens", pa.array(n_tokens))
        .append_column("n_types", pa.array(n_types))
        .append_column("utf8_size", pa.array(sizes))
    )


def quality(batch: pa.Table) -> pa.Table:
    """Quality metrics: stopword ratio, alpha ratio, mean token length.

    The size/paragraph-count kill of SimpleDocumentFilter (ref:
    trsimpledocumentfilter.pas:81-89) generalizes here to a ``valid`` flag
    from utf8_size and token-count thresholds.
    """
    # fully vectorized: Arrow kernels over the flattened token list, then
    # per-doc sums via bincount on repeated doc ids (reduceat-free — this
    # host punishes reduceat on large arrays)
    lt = batch.column("tokens").combine_chunks()
    n = len(batch)
    counts = pc.list_value_length(lt).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lt)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    is_stop = pc.is_in(
        pc.utf8_lower(flat), value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    ids = np.repeat(np.arange(n), counts)
    tot_len = np.bincount(ids, weights=tok_len, minlength=n)
    n_stop = np.bincount(ids, weights=is_stop.astype(np.float64), minlength=n)
    denom = np.maximum(counts, 1).astype(np.float64)
    nonempty = counts > 0
    stop_ratio = np.where(nonempty, n_stop / denom, 0.0)
    mean_len = np.where(nonempty, tot_len / denom, 0.0)
    text_len = (
        pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.float64)
    )
    alpha_ratio = np.where(nonempty, tot_len / np.maximum(1.0, text_len), 0.0)
    batch = (
        batch.append_column("stop_ratio", pa.array(stop_ratio))
        .append_column("mean_token_len", pa.array(mean_len))
        .append_column("alpha_ratio", pa.array(alpha_ratio))
    )
    valid = pc.and_(
        pc.greater_equal(batch.column("utf8_size"), pa.scalar(1, pa.int64())),
        pc.greater_equal(batch.column("n_tokens"), pa.scalar(1, pa.int64())),
    )
    return batch.append_column("valid", valid)


class Assessor:
    """TextAssessmentMulti as an actor-pool stage (ref: trtextassessment.pas).

    Profiles are parsed once per actor in ``__init__``; per batch, each
    document's upper-cased type relative frequencies are scored against all
    profiles; language = argmin badness.
    """

    def __init__(self, profiles: list[tuple[str, str]], threshold: float = 5.0):
        self.profiles = [LanguageProfile.parse(n, t) for n, t in profiles]
        self.threshold = threshold
        # vectorized layout, built once per actor: the union vocabulary of
        # all profile words plus per-profile (vocab-aligned) mean/sd/limit
        # arrays — scoring a batch becomes a (docs × vocab) matrix of
        # log-relative frequencies against P broadcast parameter rows.
        self.vocab = sorted({w for p in self.profiles for w in p.words})
        self.vindex = {w: i for i, w in enumerate(self.vocab)}
        V = len(self.vocab)
        P = len(self.profiles)
        self.p_mask = np.zeros((P, V), dtype=bool)        # word in profile?
        self.p_mean = np.zeros((P, V))
        self.p_sd = np.ones((P, V))
        self.p_limit = np.zeros((P, V))
        self.p_size = np.ones(P)
        for pi, prof in enumerate(self.profiles):
            self.p_size[pi] = max(1, len(prof.words))
            for w, (mean, sd, limit) in prof.words.items():
                vi = self.vindex[w]
                self.p_mask[pi, vi] = True
                self.p_mean[pi, vi] = mean
                # sd <= 0 ⇒ the scalar path scores dev = 0 for PRESENT
                # words; encode that as mean = -inf (dev := -inf → clip 0)
                self.p_sd[pi, vi] = sd if sd > 0 else 1.0
                if sd <= 0:
                    self.p_mean[pi, vi] = -np.inf
                self.p_limit[pi, vi] = limit
        self.p_names = [p.name for p in self.profiles]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        V = len(self.vocab)
        # counts matrix without touching Python rows: uppercase the
        # flattened token stream, map each token to its vocab slot
        # (index_in), and bincount (doc, slot) pairs
        lt = batch.column("tokens").combine_chunks()
        per_doc = pc.list_value_length(lt).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_up = pc.utf8_upper(pc.list_flatten(lt))
        vidx = (
            pc.index_in(flat_up, value_set=pa.array(self.vocab))
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ids = np.repeat(np.arange(n), per_doc)
        sel = vidx >= 0
        counts = (
            np.bincount(ids[sel] * V + vidx[sel], minlength=n * V)
            .reshape(n, V)
            .astype(np.float64)
        )
        totals = per_doc.astype(np.float64)
        # log10 relative frequency where present; scoring per profile:
        # present → clamp((mean - logrf)/sd, 0, limit); absent → limit
        # (identical math to functions.assess.badness, batched)
        with np.errstate(divide="ignore", invalid="ignore"):
            logrf = np.log10(counts / np.maximum(totals, 1.0)[:, None])
        present = counts > 0
        bad_all = np.empty((len(self.profiles), n))
        for pi in range(len(self.profiles)):
            dev = (self.p_mean[pi][None, :] - np.where(present, logrf, 0.0)) / self.p_sd[pi][None, :]
            contrib = np.clip(dev, 0.0, None)
            contrib = np.minimum(contrib, self.p_limit[pi][None, :])
            contrib = np.where(present, contrib, self.p_limit[pi][None, :])
            contrib = np.where(self.p_mask[pi][None, :], contrib, 0.0)
            bad_all[pi] = contrib.sum(axis=1) / self.p_size[pi]
        best = np.argmin(bad_all, axis=0)
        bad = bad_all[best, np.arange(n)]
        langs = [self.p_names[b] if np.isfinite(bad[i]) else "unknown" for i, b in enumerate(best)]
        batch = batch.append_column("pred_lang", pa.array(langs, pa.string()))
        batch = batch.append_column("badness", pa.array(bad))
        ok = pc.less_equal(batch.column("badness"), pa.scalar(self.threshold))
        return batch.set_column(
            batch.schema.get_field_index("valid"),
            "valid",
            pc.and_(batch.column("valid"), ok),
        )


def fingerprints(batch: pa.Table, k: int = 100, ngram: int = 5) -> pa.Table:
    """md5 + rolling 64-bit + minhash(k) + simhash fingerprints.

    Minhash mirrors the reference Shingler (ref: trshingler.pas:97-150,
    100 hashes over token 5-grams); simhash and the rolling fingerprint are
    additions for the training-data dedup suite.
    """
    texts = batch.column("text").to_pylist()
    toks = batch.column("tokens").to_pylist()
    md5s = [md5_hex(s or "") for s in texts]
    roll = rolling_fingerprints([s or "" for s in texts])
    sig = minhash_signatures(toks, k=k, n=ngram)
    sh = simhash64(toks)
    minhash_col = pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1)), k)
    return (
        batch.append_column("text_md5", pa.array(md5s, pa.string()))
        .append_column("fp64", pa.array(roll))
        .append_column("minhash", minhash_col)
        .append_column("simhash", pa.array(sh))
    )


def drop_tokens(batch: pa.Table) -> pa.Table:
    """Drop the wide tokens column once downstream stages no longer need it."""
    if "tokens" in batch.column_names:
        return batch.drop_columns(["tokens"])
    return batch
