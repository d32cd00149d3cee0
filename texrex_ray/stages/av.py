"""Audio/video payload stages — actor-pool ``map_batches`` over Arrow.

Mirrors ``stages/images.py``: decode once per row inside a pooled actor
(codec contexts would load once per actor in ``__init__``), small batch
sizes because rows carry large binary blobs, integer-scaled outputs so
DuckDB value-hash comparison is precision-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from texrex_ray.sources.av import decode_audio, decode_video


class AudioDecoder:
    """Decode clip → verify header metadata → time-domain stats.

    Adds: ok(bool), duration_ms(int64), rms_c(int64 = RMS×100 of int16
    samples), zcr_bp(int64 = zero-crossing rate × 10 000).
    """

    def __init__(self) -> None:
        self.decode = decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, dur, rms, zcr = [], [], [], []
        for raw, sr, ns in zip(
            batch["bytes"].to_pylist(),
            batch["sr"].to_pylist(),
            batch["n_samples"].to_pylist(),
        ):
            try:
                pcm, sr_dec = self.decode(raw)
                good = sr_dec == sr and len(pcm) == ns and len(pcm) > 0
            except Exception:
                pcm, good = None, False
            ok.append(good)
            if good:
                x = pcm.astype(np.float64)
                dur.append(int(round(len(pcm) * 1000.0 / sr)))
                rms.append(int(round(float(np.sqrt(np.mean(x * x))) * 100)))
                zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
                zcr.append(int(round(zc * 10_000.0 / max(1, len(pcm) - 1))))
            else:
                dur.append(0)
                rms.append(0)
                zcr.append(0)
        return (
            batch.append_column("ok", pa.array(ok, pa.bool_()))
            .append_column("duration_ms", pa.array(dur, pa.int64()))
            .append_column("rms_c", pa.array(rms, pa.int64()))
            .append_column("zcr_bp", pa.array(zcr, pa.int64()))
        )


class AudioFeatures:
    """Spectral features per clip: dominant-bin frequency and spectral
    centroid via one rfft per clip (a batched model/embedding stage slots
    in here identically at scale).

    Adds: peak_hz(int64), centroid_hz(int64).
    """

    def __init__(self) -> None:
        self.decode = decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        peak, cent = [], []
        for raw in batch["bytes"].to_pylist():
            try:
                pcm, sr = self.decode(raw)
            except Exception:
                peak.append(0)
                cent.append(0)
                continue
            spec = np.abs(np.fft.rfft(pcm.astype(np.float64)))
            freqs = np.fft.rfftfreq(len(pcm), d=1.0 / sr)
            if spec.sum() == 0:
                peak.append(0)
                cent.append(0)
                continue
            peak.append(int(round(freqs[int(np.argmax(spec))])))
            cent.append(int(round(float((freqs * spec).sum() / spec.sum()))))
        return batch.append_column("peak_hz", pa.array(peak, pa.int64())).append_column(
            "centroid_hz", pa.array(cent, pa.int64())
        )


class VideoFrameSampler:
    """Frame-sample stage: every ``step``-th frame → ONE OUTPUT ROW PER
    SAMPLED FRAME (flat_map shape — output rows ≠ input rows is native to
    map_batches).  Emits (video_id, frame_idx, mean_lum_c, is_key) with
    mean_lum_c = mean luminance × 100.
    """

    def __init__(self, step: int = 2) -> None:
        self.step = step
        self.decode = decode_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, lums, keys = [], [], [], []
        for vid, raw in zip(batch["video_id"].to_pylist(), batch["bytes"].to_pylist()):
            try:
                frames, _fps = self.decode(raw)
            except Exception:
                continue
            for f in range(0, frames.shape[0], self.step):
                lum = frames[f].astype(np.float64).mean()
                vids.append(vid)
                idxs.append(f)
                lums.append(int(round(lum * 100)))
                keys.append(f == 0)
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "mean_lum_c": pa.array(lums, pa.int64()),
                "is_key": pa.array(keys, pa.bool_()),
            }
        )


def audio_fingerprint(pcm: np.ndarray) -> int:
    """64-bit energy-delta fingerprint of mono int16 PCM (the published
    contract, shared verbatim by the q149 oracle fixture): split the clip
    into 65 equal index frames, E_j = sum of squared samples, bit j set
    iff E_{j+1} > E_j.  Energy ORDERING survives mild lossy quantization
    (the synthetic ogg's step-16 ≈ 46 dB SNR flips ≤ 2 of 64 bits on this
    corpus), which is what makes Hamming-radius search find re-encodes."""
    n = len(pcm)
    F = 65
    x = pcm.astype(np.float64)
    bounds = [j * n // F for j in range(F + 1)]
    e = np.array([(x[bounds[j]: bounds[j + 1]] ** 2).sum() for j in range(F)])
    sig = 0
    for j in range(64):
        if e[j + 1] > e[j]:
            sig |= 1 << j
    return sig


class AudioFingerprint:
    """Actor-pool stage: decode + fingerprint → (clip_id, simhash int64).

    ``twin_offset`` additionally emits, per clip, the fingerprint of a
    synthetic lossy re-encode (ogg quantization applied to the decoded
    PCM) under ``clip_id + twin_offset`` — the planted near-duplicates
    the q149 radius search must recover.
    """

    def __init__(self, twin_offset: int | None = None, twin_quant: int = 16) -> None:
        self.decode = decode_audio
        self.twin_offset = twin_offset
        self.twin_quant = twin_quant

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for aid, raw in zip(batch["audio_id"].to_pylist(), batch["bytes"].to_pylist()):
            idx = int(aid[3:])  # "aud%08d"
            try:
                pcm, _sr = self.decode(raw)
            except Exception:
                continue
            ids.append(idx)
            sigs.append(np.int64(np.uint64(audio_fingerprint(pcm))))
            if self.twin_offset is not None:
                q = self.twin_quant
                twin = (
                    (np.round(pcm.astype(np.int32) / q) * q)
                    .clip(-32768, 32767)
                    .astype(np.int16)
                )
                ids.append(idx + self.twin_offset)
                sigs.append(np.int64(np.uint64(audio_fingerprint(twin))))
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(sigs, pa.int64()),
            }
        )


class VoiceActivity:
    """Actor-pool stage: frame-level activity segmentation — the
    speech/tone-span gate for audio curation (complements the global
    rms/zcr of AudioDecoder with WHERE the energy sits).

    20 ms frames (tail partial frame dropped); a frame is ACTIVE iff
    its energy beats the clip's mean frame energy, compared exactly in
    integers: e_f * n_frames > total_energy (sums of int16², < 2^53
    for any realistic clip, held in int64).  Adds ``n_frames``,
    ``n_active`` and ``max_run`` (longest consecutive active span).
    """

    FRAME_MS = 20

    def __init__(self) -> None:
        self.decode = decode_audio

    def _segments(self, pcm: np.ndarray, sr: int) -> tuple[int, int, int]:
        flen = max(1, sr * self.FRAME_MS // 1000)
        n_frames = len(pcm) // flen
        if n_frames == 0:
            return 0, 0, 0
        x = pcm[: n_frames * flen].astype(np.int64)
        e = (x * x).reshape(n_frames, flen).sum(axis=1)
        total = int(e.sum())
        active = e * n_frames > total
        n_active = int(active.sum())
        max_run = 0
        run = 0
        for a in active:
            run = run + 1 if a else 0
            if run > max_run:
                max_run = run
        return n_frames, n_active, max_run

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, na, mr = [], [], []
        for raw in batch["bytes"].to_pylist():
            pcm, sr = self.decode(raw)
            a, b, c = self._segments(pcm, sr)
            nf.append(a)
            na.append(b)
            mr.append(c)
        return (
            batch.append_column("n_frames", pa.array(nf, pa.int64()))
            .append_column("n_active", pa.array(na, pa.int64()))
            .append_column("max_run", pa.array(mr, pa.int64()))
        )


class MotionBlocks:
    """Actor-pool stage: block-matching motion estimation between
    consecutive frames — the pan/static census that complements
    q387's shot boundaries (WITHIN-shot motion vs ACROSS-shot cuts).

    Per frame pair: 4x4 luminance blocks on the margin-2 interior of
    the earlier frame, each matched against the later frame over all
    25 offsets (dx, dy) in [-2, 2]²; best = minimum SAD with ties to
    the lexicographically smallest (dy, dx) (so the zero offset wins
    pure-brightness changes only if no shift beats it).  The 25
    candidate SADs are whole-array shifted-view reductions (reshape
    pooling, no per-pixel Python).  Adds ``n_pairs``, ``n_blocks``,
    ``n_moving`` (best offset != (0,0)) and ``sum_sad`` (int64).
    """

    MARGIN = 2
    BLOCK = 4

    def __init__(self) -> None:
        self.decode = decode_video

    def _census(self, frames: np.ndarray) -> tuple[int, int, int, int]:
        n, h, w, _ = frames.shape
        m, bs = self.MARGIN, self.BLOCK
        ih, iw = h - 2 * m, w - 2 * m
        bh, bw = ih // bs, iw // bs
        if n < 2 or bh == 0 or bw == 0:
            return 0, 0, 0, 0
        lum = frames.astype(np.int64).sum(axis=3)
        n_moving = 0
        sum_sad = 0
        offs = [(dy, dx) for dy in range(-m, m + 1) for dx in range(-m, m + 1)]
        for f in range(n - 1):
            prev = lum[f, m:m + bh * bs, m:m + bw * bs]
            best = None
            best_off = None
            for oi, (dy, dx) in enumerate(offs):
                nxt = lum[f + 1, m + dy:m + dy + bh * bs,
                          m + dx:m + dx + bw * bs]
                sad = (
                    np.abs(prev - nxt)
                    .reshape(bh, bs, bw, bs)
                    .sum(axis=(1, 3))
                )
                if best is None:
                    best = sad.copy()
                    best_off = np.zeros_like(sad)
                else:
                    better = sad < best
                    best[better] = sad[better]
                    best_off[better] = oi
            zero_oi = offs.index((0, 0))
            n_moving += int((best_off != zero_oi).sum())
            sum_sad += int(best.sum())
        return n - 1, (n - 1) * bh * bw, n_moving, sum_sad

    def __call__(self, batch: pa.Table) -> pa.Table:
        np_, nb, nm, ss = [], [], [], []
        for raw in batch["bytes"].to_pylist():
            frames, _ = self.decode(raw)
            a, b, c, d = self._census(frames)
            np_.append(a)
            nb.append(b)
            nm.append(c)
            ss.append(d)
        return (
            batch.append_column("n_pairs", pa.array(np_, pa.int64()))
            .append_column("n_blocks", pa.array(nb, pa.int64()))
            .append_column("n_moving", pa.array(nm, pa.int64()))
            .append_column("sum_sad", pa.array(ss, pa.int64()))
        )


class WalshSpectrum:
    """Actor-pool stage: fast Walsh-Hadamard sequency census per audio
    clip — an EXACT-integer spectral-band split (the Hadamard basis is
    ±1, so unlike a DFT no trigonometric rounding enters): low-index
    Walsh coefficients capture slow envelope structure, high-index
    ones capture rapid alternation, separating tonal from noisy clips
    without floats.

    64-sample non-overlapping frames (tail dropped); per frame the
    order-64 fast Walsh-Hadamard transform — 6 vectorized butterfly
    rounds over the whole (n_frames, 64) block at once, |coef| ≤
    64·32768 so squares stay < 2^53 in int64 — then reordered to
    SEQUENCY (Walsh) order via the gray-code bit-reversal permutation,
    so coefficient s has exactly s sign changes.  Parseval: Σ w² =
    64·Σ x² exactly.  Bands: low = sequencies 0-7 (envelope), high =
    sequencies 32-63 (rapid alternation).  Adds ``n_frames``,
    ``low_energy``, ``high_energy``, ``total_energy`` (int64).
    """

    FRAME = 64

    def __init__(self) -> None:
        self.decode = decode_audio
        F = self.FRAME
        bits = F.bit_length() - 1
        # sequency s -> natural (Sylvester) index: bit-reverse(gray(s))
        self.perm = np.array(
            [int(f"{s ^ (s >> 1):0{bits}b}"[::-1], 2) for s in range(F)],
            dtype=np.int64,
        )

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int, int]:
        F = self.FRAME
        n_frames = len(pcm) // F
        if n_frames == 0:
            return 0, 0, 0, 0
        w = pcm[: n_frames * F].astype(np.int64).reshape(n_frames, F).copy()
        h = 1
        while h < F:
            w = w.reshape(n_frames, F // (2 * h), 2, h)
            a = w[:, :, 0, :] + w[:, :, 1, :]
            b = w[:, :, 0, :] - w[:, :, 1, :]
            w = np.concatenate(
                [a[:, :, None, :], b[:, :, None, :]], axis=2
            ).reshape(n_frames, F)
            h *= 2
        e = (w * w)[:, self.perm]
        low = int(e[:, :8].sum())
        high = int(e[:, 32:].sum())
        total = int(e.sum())
        return n_frames, low, high, total

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, lo, hi, tt = [], [], [], []
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            a, b, c, d = self._census(pcm)
            nf.append(a)
            lo.append(b)
            hi.append(c)
            tt.append(d)
        return (
            batch.append_column("n_frames", pa.array(nf, pa.int64()))
            .append_column("low_energy", pa.array(lo, pa.int64()))
            .append_column("high_energy", pa.array(hi, pa.int64()))
            .append_column("total_energy", pa.array(tt, pa.int64()))
        )


_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Vectorized G.711 mu-law encode (int16 -> uint8) — the classic
    ALL-INTEGER telephony companding: bias, segment exponent from the
    magnitude's high bit, 4-bit mantissa, ones-complement code."""
    x = x.astype(np.int64)
    sign = (x < 0).astype(np.int64)
    m = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # segment exponent: index of the highest set bit in bits 7..14
    e = np.zeros(len(m), np.int64)
    for thresh in (0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000):
        e += (m >= thresh).astype(np.int64)
    mant = (m >> (e + 3)) & 0x0F
    return (~((sign << 7) | (e << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """Vectorized G.711 mu-law decode (uint8 -> int16)."""
    c = (~code.astype(np.int64)) & 0xFF
    sign = (c >> 7) & 1
    e = (c >> 4) & 7
    mant = c & 0x0F
    m = (((mant << 3) | _MULAW_BIAS) << e) - _MULAW_BIAS
    return np.where(sign == 1, -m, m).astype(np.int16)


class MuLawAudit:
    """Actor-pool stage: G.711 mu-law companding round-trip audit —
    encode every sample to the 8-bit telephony code and measure the
    exact integer reconstruction error: the bandwidth-vs-fidelity
    audit for speech-grade audio storage (complements q371's linear
    int8 quantization with the logarithmic codec the phone network
    actually uses — mu-law spends its 16 codes per octave, so loud
    clips lose absolute precision but keep relative precision).

    Everything is integer bit arithmetic (G.711 is specified that
    way); encode/decode are whole-array numpy.  Adds ``n_samples``,
    ``sse`` (Σ(decoded−original)², int64) and ``max_err`` (int64).
    """

    def __init__(self) -> None:
        self.decode_clip = decode_audio

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int]:
        if len(pcm) == 0:
            return 0, 0, 0
        rec = mulaw_decode(mulaw_encode(pcm)).astype(np.int64)
        err = rec - pcm.astype(np.int64)
        return len(pcm), int((err * err).sum()), int(np.abs(err).max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, se, mx = [], [], []
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode_clip(raw)
            a, b, c = self._census(pcm)
            ns.append(a)
            se.append(b)
            mx.append(c)
        return (
            batch.append_column("n_samples", pa.array(ns, pa.int64()))
            .append_column("sse", pa.array(se, pa.int64()))
            .append_column("max_err", pa.array(mx, pa.int64()))
        )


class ExposureFlicker:
    """Actor-pool stage: global exposure-stability census per video
    clip — frame-level brightness SUMS (never divided, so exact):
    where q387's shot detector sees CONTENT change via per-pixel L1
    deltas, this sees global exposure drift/flicker (auto-exposure
    hunting, strobing, fades) even when content is static.

    S_f = Σ summed-channel luminance of frame f.  A pair flickers iff
    |S_{f+1} − S_f| > JUMP_T · n_px (mean jump above JUMP_T summed-
    channel gray levels, compared in integers).  Also the longest
    strictly-increasing S run (fade-in detector) and the S range.
    Adds ``n_frames``, ``n_jumps``, ``max_mono_run``, ``range_s``
    (int64).
    """

    JUMP_T = 6

    def __init__(self) -> None:
        self.decode = decode_video

    def _census(self, frames: np.ndarray) -> tuple[int, int, int, int]:
        n = frames.shape[0]
        if n == 0:
            return 0, 0, 0, 0
        npx = frames.shape[1] * frames.shape[2]
        s = frames.astype(np.int64).sum(axis=(1, 2, 3))
        if n == 1:
            return 1, 0, 0, 0
        d = np.diff(s)
        n_jumps = int((np.abs(d) > self.JUMP_T * npx).sum())
        run = best = 0
        for inc in (d > 0).tolist():
            run = run + 1 if inc else 0
            best = max(best, run)
        return n, n_jumps, best, int(s.max() - s.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            frames, _fps = self.decode(raw)
            for lst, v in zip(cols, self._census(frames)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_frames", "n_jumps", "max_mono_run",
                              "range_s"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class SilenceTrim:
    """Actor-pool stage: leading/trailing silence census — the
    boundary-trim audit every speech-data pipeline runs before
    training (silence wastes tokens and skews VAD statistics).

    A sample is silent iff |x| <= THRESH (64 ≈ −54 dBFS).  Emits the
    run of silent samples at each end (a fully-silent clip reports
    n_lead = n, n_trail = 0 — the runs never double-count) plus the
    active span length.  One argmax over a boolean plane per side —
    whole-array numpy.  Adds ``n_samples``, ``n_lead``, ``n_trail``,
    ``n_active`` (int64).
    """

    THRESH = 64

    def __init__(self) -> None:
        self.decode = decode_audio

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int, int]:
        n = len(pcm)
        if n == 0:
            return 0, 0, 0, 0
        loud = np.abs(pcm.astype(np.int64)) > self.THRESH
        if not loud.any():
            return n, n, 0, 0
        first = int(np.argmax(loud))
        last = n - 1 - int(np.argmax(loud[::-1]))
        return n, first, n - 1 - last, last - first + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_samples", "n_lead", "n_trail",
                              "n_active"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


class AdpcmAudit:
    """Actor-pool stage: IMA ADPCM 4-bit codec round-trip audit — the
    ADAPTIVE differential codec (step-size table + index adaptation)
    complementing q407's instantaneous logarithmic mu-law: ADPCM
    tracks the signal, so smooth tonal clips reconstruct much better
    than noise at the same 4 bits/sample.

    Spec: 64-sample blocks, predictor RESET per block (pred = first
    sample stored verbatim, index = 0, the remaining 63 samples
    encoded) — the reset is what makes blocks independent, so the
    stage runs the 63 sequential steps VECTORIZED ACROSS all blocks
    of a clip (numpy state vectors, position loop only), the classic
    blocked-codec trick (same shape as RsParity).  All arithmetic is
    the integer IMA reference: diff/4-bit code/step>>3 reconstruction,
    clamps at ±32768/32767 and index 0..88.  Adds ``n_blocks``,
    ``sse`` (Σ(dec−orig)² over encoded positions), ``max_err``.
    """

    BLOCK = 64

    def __init__(self) -> None:
        self.decode = decode_audio
        self.steps = np.array(_IMA_STEPS, np.int64)
        self.idx_adj = np.array(_IMA_INDEX, np.int64)

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int]:
        B = self.BLOCK
        n = len(pcm) // B
        if n == 0:
            return 0, 0, 0
        blocks = pcm[: n * B].astype(np.int64).reshape(n, B)
        pred = blocks[:, 0].copy()
        index = np.zeros(n, np.int64)
        sse = 0
        max_err = 0
        for j in range(1, B):
            step = self.steps[index]
            diff = blocks[:, j] - pred
            sign = diff < 0
            mag = np.abs(diff)
            # 3-bit magnitude code by successive subtraction (IMA ref)
            code = np.zeros(n, np.int64)
            rem = mag.copy()
            st = step.copy()
            for bit in (4, 2, 1):
                take = rem >= st
                code += np.where(take, bit, 0)
                rem = np.where(take, rem - st, rem)
                st >>= 1
            # reconstruction: (code + 0.5) * step / 4 in integer form
            delta = (step >> 3) + np.where(code & 4, step, 0) \
                + np.where(code & 2, step >> 1, 0) \
                + np.where(code & 1, step >> 2, 0)
            pred = pred + np.where(sign, -delta, delta)
            np.clip(pred, -32768, 32767, out=pred)
            index = index + self.idx_adj[code]
            np.clip(index, 0, 88, out=index)
            err = pred - blocks[:, j]
            sse += int((err * err).sum())
            max_err = max(max_err, int(np.abs(err).max()))
        return n, sse, max_err

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_blocks", "sse", "max_err"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class WalshOnsets:
    """Actor-pool stage: spectral-flux onset census over the Walsh
    sequency spectrum — frame-to-frame L1 change of the EXACT-integer
    Walsh energy vector (reusing WalshSpectrum's butterfly + sequency
    reorder): onsets are frames whose flux beats twice the clip's
    median flux, compared with integer cross-multiplication
    (2·median_lo ≤ flux·2 vs ... precisely: flux > 2·median where the
    median of an even count is the LOWER middle — a fixed integer
    spec).  The temporal-change complement to q402's static band
    census.  Adds ``n_frames``, ``n_onsets``, ``max_flux`` (int64).
    """

    FRAME = 64

    def __init__(self) -> None:
        self.decode = decode_audio
        self._ws = WalshSpectrum()

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int]:
        F = self.FRAME
        n_frames = len(pcm) // F
        if n_frames < 2:
            return n_frames, 0, 0
        w = pcm[: n_frames * F].astype(np.int64).reshape(n_frames, F).copy()
        h = 1
        while h < F:
            w = w.reshape(n_frames, F // (2 * h), 2, h)
            a = w[:, :, 0, :] + w[:, :, 1, :]
            b = w[:, :, 0, :] - w[:, :, 1, :]
            w = np.concatenate(
                [a[:, :, None, :], b[:, :, None, :]], axis=2
            ).reshape(n_frames, F)
            h *= 2
        e = (w * w)[:, self._ws.perm]
        flux = np.abs(np.diff(e, axis=0)).sum(axis=1)
        med = int(np.sort(flux)[(len(flux) - 1) // 2])  # lower middle
        n_onsets = int((flux > 2 * med).sum())
        return n_frames, n_onsets, int(flux.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_frames", "n_onsets", "max_flux"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class StaticTiles:
    """Actor-pool stage: temporally-static tile census — per 4x4
    spatial tile the RANGE of its summed luminance across frames:
    overlay regions (logos, watermarks, UI chrome) hold still while
    content moves, so tiles with range ≤ JITTER·tile_px flag overlay
    real estate — the temporal complement to q398's spatial template
    search.  Tile sums are one reshape-reduce per frame stack; the
    range is max−min over the frame axis (exact ints).  Adds
    ``n_tiles``, ``n_static``, ``max_range`` (int64; a single-frame
    clip reports every tile static).
    """

    T = 4
    JITTER = 6  # summed-channel gray levels per pixel

    def __init__(self) -> None:
        self.decode = decode_video

    def _census(self, frames: np.ndarray) -> tuple[int, int, int]:
        n, h, w, _ = frames.shape
        T = self.T
        th, tw = h // T, w // T
        if n == 0 or th == 0 or tw == 0:
            return 0, 0, 0
        lum = frames.astype(np.int64).sum(axis=3)
        tiles = lum[:, : th * T, : tw * T].reshape(n, th, T, tw, T
                                                   ).sum(axis=(2, 4))
        rng = tiles.max(axis=0) - tiles.min(axis=0)
        static = rng <= self.JITTER * T * T
        return th * tw, int(static.sum()), int(rng.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            frames, _fps = self.decode(raw)
            for lst, v in zip(cols, self._census(frames)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_tiles", "n_static", "max_range"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class TemporalSsim:
    """Actor-pool stage: temporal SSIM census — the exact-integer
    8x8-tile SSIM rational (SsimAudit's cleared-of-means form, C1=7,
    C2=59) evaluated between CONSECUTIVE FRAMES instead of between an
    image and its reconstruction: perceptual shot coherence (cuts and
    hard motion crater tile SSIM even when exposure is stable — the
    perceptual complement to q387's L1 deltas and q411's global
    sums).  Per frame pair the tile sums are whole-array reductions;
    the ≤256 per-tile rational finishes are bounded Python ints.
    Adds ``n_pairs``, ``n_tiles`` (pairs x tiles), ``sum_ssim_ppm``,
    ``min_ssim_ppm`` (int64; 1e6 min for clips with < 2 frames).
    """

    C1 = 7
    C2 = 59
    T = 8

    def __init__(self) -> None:
        self.decode = decode_video

    def _census(self, frames: np.ndarray) -> tuple[int, int, int, int]:
        n, h, w, _ = frames.shape
        T = self.T
        th, tw = h // T, w // T
        if n < 2 or th == 0 or tw == 0:
            return 0, 0, 0, 1_000_000
        lum = frames.astype(np.int64).sum(axis=3) // 3
        x = lum[:, : th * T, : tw * T].reshape(n, th, T, tw, T)
        sx = x.sum(axis=(2, 4)).reshape(n, -1)
        sxx = (x * x).sum(axis=(2, 4)).reshape(n, -1)
        sxy = (x[:-1] * x[1:]).sum(axis=(2, 4)).reshape(n - 1, -1)
        nn = (T * T) ** 2
        npix = T * T
        total = 0
        mn = None
        for p in range(n - 1):
            a_l, b_l = sx[p].tolist(), sx[p + 1].tolist()
            aa_l, bb_l = sxx[p].tolist(), sxx[p + 1].tolist()
            ab_l = sxy[p].tolist()
            for a, b, aa, bb, ab in zip(a_l, b_l, aa_l, bb_l, ab_l):
                a1 = 2 * a * b + self.C1 * nn
                a2 = 2 * (npix * ab - a * b) + self.C2 * nn
                b1 = a * a + b * b + self.C1 * nn
                b2 = (npix * aa - a * a) + (npix * bb - b * b) \
                    + self.C2 * nn
                v = (a1 * a2 * 1_000_000) // (b1 * b2)
                total += v
                mn = v if mn is None or v < mn else mn
        return n - 1, (n - 1) * th * tw, total, mn if mn is not None else 1_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            frames, _fps = self.decode(raw)
            for lst, v in zip(cols, self._census(frames)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_pairs", "n_tiles", "sum_ssim_ppm",
                              "min_ssim_ppm"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class WalshCompaction:
    """Actor-pool stage: adaptive energy-compaction census — per
    64-sample frame, the share of Walsh energy captured by the 8
    LARGEST coefficients (vs q402's FIXED sequency bands): the
    compressibility signal transform coders actually exploit (tonal
    frames compact into few coefficients, noise spreads flat).

    Reuses the exact butterfly; per-frame top-8 via np.partition along
    the coefficient axis (no ordering spec needed — the top-8 SUM is
    permutation-invariant, ties included either way sum equal).  Adds
    ``n_frames``, ``top8_energy``, ``total_energy`` (int64).
    """

    FRAME = 64
    K = 8

    def __init__(self) -> None:
        self.decode = decode_audio

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int]:
        F = self.FRAME
        n_frames = len(pcm) // F
        if n_frames == 0:
            return 0, 0, 0
        w = pcm[: n_frames * F].astype(np.int64).reshape(n_frames, F).copy()
        h = 1
        while h < F:
            w = w.reshape(n_frames, F // (2 * h), 2, h)
            a = w[:, :, 0, :] + w[:, :, 1, :]
            b = w[:, :, 0, :] - w[:, :, 1, :]
            w = np.concatenate(
                [a[:, :, None, :], b[:, :, None, :]], axis=2
            ).reshape(n_frames, F)
            h *= 2
        e = w * w
        top = np.partition(e, F - self.K, axis=1)[:, F - self.K:]
        return n_frames, int(top.sum()), int(e.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_frames", "top8_energy", "total_energy"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class GopDeltaBound:
    """Actor-pool stage: GOP delta-encoding size bound — one keyframe
    (all pixels) plus, per later frame, the count of pixels whose RGB
    differs from the previous frame: the intra/inter compression
    planning bound that complements q396's motion vectors (which model
    WHERE pixels went, not how many changed) and q387's cut detector.
    Whole-array frame diffs.  Adds ``n_key_px``, ``n_delta_px``
    (changed-pixel total across non-key frames), ``n_frames``.
    """

    def __init__(self) -> None:
        self.decode = decode_video

    def _census(self, frames: np.ndarray) -> tuple[int, int, int]:
        n, h, w, _ = frames.shape
        if n == 0:
            return 0, 0, 0
        if n == 1:
            return h * w, 0, 1
        diff = (frames[1:] != frames[:-1]).any(axis=3)
        return h * w, int(diff.sum()), n

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            frames, _fps = self.decode(raw)
            for lst, v in zip(cols, self._census(frames)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_key_px", "n_delta_px", "n_frames"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class CrestFactor:
    """Actor-pool stage: peak-to-average power census — the dynamic-
    range statistic (PAPR) mastering and loudness pipelines gate on:
    emitted division-free as peak² and Σx² so the inverse crest ratio
    Σx²·10⁶ // (n·peak²) is exact (pure tone 500 000, constant
    1 000 000, heavy-tailed noise ≪).  Whole-array numpy.  Adds
    ``n_samples``, ``peak``, ``energy`` (Σx²) and ``crest_inv_ppm``
    (int64; 0 for an all-zero clip).
    """

    def __init__(self) -> None:
        self.decode = decode_audio

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int, int]:
        n = len(pcm)
        if n == 0:
            return 0, 0, 0, 0
        x = pcm.astype(np.int64)
        peak = int(np.abs(x).max())
        energy = int((x * x).sum())
        if peak == 0:
            return n, 0, 0, 0
        return n, peak, energy, energy * 1_000_000 // (n * peak * peak)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_samples", "peak", "energy",
                              "crest_inv_ppm"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class LoudnessRange:
    """Actor-pool stage: loudness-range census (LRA-lite) — the spread
    between the 10th and 95th percentile of 20 ms frame energies
    (nearest-rank on the sorted list, indices floor(0.10·(n−1)) and
    floor(0.95·(n−1)) — a fixed integer spec): broadcast loudness
    normalization gates on exactly this spread, which q443's global
    crest (one peak) and q395's binary activity can't see.  Frame
    energies are one reshape-reduce; the two taps come from
    np.partition (no full sort).  Adds ``n_frames``, ``e_p10``,
    ``e_p95``, ``lra_e`` (= e_p95 − e_p10, int64).
    """

    FRAME_MS = 20

    def __init__(self) -> None:
        self.decode = decode_audio

    def _census(self, pcm: np.ndarray, sr: int) -> tuple[int, int, int, int]:
        flen = max(1, sr * self.FRAME_MS // 1000)
        n_frames = len(pcm) // flen
        if n_frames == 0:
            return 0, 0, 0, 0
        x = pcm[: n_frames * flen].astype(np.int64)
        e = (x * x).reshape(n_frames, flen).sum(axis=1)
        i10 = (10 * (n_frames - 1)) // 100
        i95 = (95 * (n_frames - 1)) // 100
        p10 = int(np.partition(e, i10)[i10])
        p95 = int(np.partition(e, i95)[i95])
        return n_frames, p10, p95, p95 - p10

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm, sr)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_frames", "e_p10", "e_p95", "lra_e"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class ZeroCrossIntervals:
    """Actor-pool stage: zero-crossing INTERVAL census — the
    distribution of gaps between successive sign changes (crossing at
    i iff sign(x[i]) != sign(x[i-1]), zeros counted as positive — a
    fixed spec): a pure tone shows one dominant interval (half its
    period), speech/noise spreads — the period-DISTRIBUTION
    complement to q386's single ACF argmax and AudioDecoder's global
    rate.  Crossings via one sign-diff, intervals via np.diff, modal
    interval from one bincount (ties to the smallest interval).
    Adds ``n_intervals``, ``modal_gap``, ``modal_n``, ``max_gap``
    (int64; zeros when fewer than 2 crossings).
    """

    def __init__(self) -> None:
        self.decode = decode_audio

    def _census(self, pcm: np.ndarray) -> tuple[int, int, int, int]:
        if len(pcm) < 2:
            return 0, 0, 0, 0
        pos = pcm >= 0
        cross = np.nonzero(pos[1:] != pos[:-1])[0] + 1
        if len(cross) < 2:
            return 0, 0, 0, 0
        gaps = np.diff(cross)
        counts = np.bincount(gaps)
        modal = int(np.argmax(counts))  # argmax ties -> smallest gap
        return (
            int(len(gaps)), modal, int(counts[modal]), int(gaps.max()),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            pcm, _sr = self.decode(raw)
            for lst, v in zip(cols, self._census(pcm)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_intervals", "modal_gap", "modal_n",
                              "max_gap"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out
