"""Deterministic synthetic audio + video tables (multimodal payloads).

Same design as ``sources/images.py``: the container has no media codecs,
so ``fmt`` names a **synthetic codec** with the shape of real formats —
``wav`` is lossless int16 PCM, ``ogg`` is lossy via uniform quantization
calibrated to SNR ≥ 40 dB; ``rawv`` is lossless stacked RGB frames.  A
``decode_external`` hook marks where ffmpeg/librosa would plug in.  The
Ray-side plumbing (opaque ``binary`` column + typed metadata, actor-pool
decode, small batch sizes for large blobs) is the real, tested part.

Schemas:
  audio(audio_id:string, bytes:binary, sr:int32, n_samples:int32,
        fmt:string, caption:string)
  video(video_id:string, bytes:binary, w:int32, h:int32, n_frames:int32,
        fps:int32, fmt:string, caption:string)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_MAGIC = {"wav": b"SWAV", "ogg": b"SOGG"}
AUDIO_QUANT = {"wav": 1, "ogg": 16}  # int16 step 16 → SNR ≈ 46 dB on full-scale tones
VIDEO_MAGIC = {"rawv": b"SVID"}


def encode_audio(pcm: np.ndarray, sr: int, fmt: str) -> bytes:
    """pcm: (n,) int16 mono → synthetic container bytes."""
    q = AUDIO_QUANT[fmt]
    data = pcm if q == 1 else (np.round(pcm.astype(np.int32) / q) * q).clip(
        -32768, 32767
    ).astype(np.int16)
    head = AUDIO_MAGIC[fmt] + int(sr).to_bytes(4, "big") + len(pcm).to_bytes(4, "big")
    return head + data.tobytes()


def decode_audio(raw: bytes) -> tuple[np.ndarray, int]:
    """Synthetic container bytes → ((n,) int16 pcm, sample_rate)."""
    if raw[:4] not in AUDIO_MAGIC.values():
        return decode_external_audio(raw)
    sr = int.from_bytes(raw[4:8], "big")
    n = int.from_bytes(raw[8:12], "big")
    return np.frombuffer(raw[12:], dtype=np.int16)[:n], sr


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """frames: (n, h, w, 3) uint8 → synthetic container bytes."""
    n, h, w, _ = frames.shape
    head = (
        VIDEO_MAGIC["rawv"]
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + int(fps).to_bytes(4, "big")
    )
    return head + frames.tobytes()


def decode_video(raw: bytes) -> tuple[np.ndarray, int]:
    """Synthetic container bytes → ((n, h, w, 3) uint8 frames, fps)."""
    if raw[:4] != VIDEO_MAGIC["rawv"]:
        return decode_external_video(raw)
    w = int.from_bytes(raw[4:8], "big")
    h = int.from_bytes(raw[8:12], "big")
    n = int.from_bytes(raw[12:16], "big")
    fps = int.from_bytes(raw[16:20], "big")
    return np.frombuffer(raw[20:], dtype=np.uint8).reshape(n, h, w, 3), fps


try:  # optional real-codec seam (lance_io.py fallback pattern): decodes
    # real WAV/OGG on hosts with soundfile; this sandbox has none
    import soundfile as _soundfile
except ImportError:  # pragma: no cover - container has no soundfile
    _soundfile = None

try:  # real video frames on hosts with PyAV
    import av as _pyav
except ImportError:  # pragma: no cover - container has no PyAV
    _pyav = None


def decode_external_audio(raw: bytes) -> tuple[np.ndarray, int]:
    """Real-codec seam: WAV/OGG/FLAC → ((n,) int16 mono pcm, sr) via
    soundfile when importable; raises only when it is absent."""
    if _soundfile is not None:
        import io

        data, sr = _soundfile.read(io.BytesIO(raw), dtype="int16")
        if data.ndim > 1:  # downmix to mono, matching the synthetic shape
            data = (data.astype(np.int32).mean(axis=1)).astype(np.int16)
        return np.ascontiguousarray(data), int(sr)
    raise NotImplementedError(
        "no audio codec library importable (tried soundfile); "
        "payloads use the synthetic SWAV/SOGG containers"
    )


def decode_external_video(raw: bytes) -> tuple[np.ndarray, int]:
    """Real-codec seam: MP4/WebM → ((n, h, w, 3) uint8 frames, fps) via
    PyAV when importable; raises only when it is absent."""
    if _pyav is not None:
        import io

        with _pyav.open(io.BytesIO(raw)) as container:
            stream = container.streams.video[0]
            # average_rate is None for some variable-rate containers —
            # report 0 rather than crash; callers treat 0 as "unknown"
            fps = int(round(float(stream.average_rate or 0)))
            frames = [
                f.to_ndarray(format="rgb24") for f in container.decode(stream)
            ]
        if not frames:
            raise ValueError(
                "video container has a stream but no decodable frames"
            )
        return np.stack(frames), fps
    raise NotImplementedError(
        "no video codec library importable (tried PyAV); "
        "payloads use the synthetic SVID container"
    )


def decode_external(raw: bytes):
    """Back-compat dispatcher for unknown-magic payloads: audio headers
    route to soundfile, anything else to PyAV; raises only when the
    needed library is absent.  Schema, batch sizing and actor signatures
    are identical either way."""
    # RIFF is both WAV (audio) and AVI (video) — disambiguate on the
    # form-type field at bytes 8:12
    if raw[:4] == b"RIFF":
        if raw[8:12] == b"WAVE":
            return decode_external_audio(raw)
        return decode_external_video(raw)
    if raw[:4] in (b"OggS", b"fLaC"):
        return decode_external_audio(raw)
    return decode_external_video(raw)


def snr_db(orig: np.ndarray, dec: np.ndarray) -> float:
    """Signal-to-noise ratio of a decoded clip vs the original (dB)."""
    s = np.mean(orig.astype(np.float64) ** 2)
    n = np.mean((orig.astype(np.float64) - dec.astype(np.float64)) ** 2)
    if n == 0:
        return float("inf")
    return float(10.0 * np.log10(s / n))


def _synth_pcm(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """Sum of 2-4 seeded sinusoids + mild noise, peak-normalized int16."""
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(80.0, sr / 4))
        a = float(rng.uniform(0.2, 1.0))
        ph = float(rng.uniform(0, 2 * np.pi))
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0, 0.02, n)
    x = x / np.max(np.abs(x)) * 0.8
    return (x * 32767).astype(np.int16)


def make_audio(n: int, seed: int = 42) -> pa.Table:
    """n deterministic clips; ~1/3 lossy; caption shares the images dirt
    vocabulary (entities, tags) so the caption-cleanse stage composes."""
    ids, blobs, srs, lens, fmts, caps = [], [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        sr = int(rng.choice([8000, 16000]))
        dur = float(rng.uniform(0.2, 1.0))
        pcm = _synth_pcm(rng, int(sr * dur), sr)
        fmt = "ogg" if i % 3 == 0 else "wav"
        ids.append(f"aud{i:08d}")
        blobs.append(encode_audio(pcm, sr, fmt))
        srs.append(sr)
        lens.append(len(pcm))
        fmts.append(fmt)
        caps.append(f"clip {i} &amp; tone <b>set</b> {i % 7}")
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr": pa.array(srs, pa.int32()),
            "n_samples": pa.array(lens, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )


def make_video(n: int, seed: int = 42) -> pa.Table:
    """n deterministic tiny clips (16×16, 4-12 frames): moving gradient +
    a brightness ramp so per-frame luminance is distinct and testable."""
    ids, blobs, ws, hs, nfs, fpss, caps = [], [], [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 2_000_003 + i)
        w = h = 16
        nf = int(rng.integers(4, 13))
        fps = int(rng.choice([10, 24]))
        base = rng.integers(0, 96, size=(h, w, 3), dtype=np.uint8)
        frames = np.empty((nf, h, w, 3), dtype=np.uint8)
        for f in range(nf):
            shift = np.roll(base, f, axis=1).astype(np.int32)
            frames[f] = np.clip(shift + f * 9, 0, 255).astype(np.uint8)
        ids.append(f"vid{i:08d}")
        blobs.append(encode_video(frames, fps))
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
        fpss.append(fps)
        caps.append(f"scene {i} pan&#228;rama {i % 5}")
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nfs, pa.int32()),
            "fps": pa.array(fpss, pa.int32()),
            "fmt": pa.array(["rawv"] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )


def fixture_path(n: int, seed: int = 42, root: str = "/tmp/texrex_ray_fixtures") -> str:
    """Write (once) and return the deterministic audio+video fixture dir."""
    import os

    import pyarrow.parquet as pq

    d = os.path.join(root, f"av_n{n}_s{seed}")
    aud_p = os.path.join(d, "audio.parquet")
    vid_p = os.path.join(d, "video.parquet")
    if not (os.path.exists(aud_p) and os.path.exists(vid_p)):
        os.makedirs(d, exist_ok=True)
        pq.write_table(make_audio(n, seed), aud_p + ".tmp")
        pq.write_table(make_video(n, seed), vid_p + ".tmp")
        os.replace(aud_p + ".tmp", aud_p)
        os.replace(vid_p + ".tmp", vid_p)
    return d
