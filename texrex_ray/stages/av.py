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
