"""Audio/video payload: codec round-trip invariants + stage semantics."""

import numpy as np
import pytest
import ray.data

from texrex_ray.sources.av import (
    AUDIO_QUANT,
    _synth_pcm,
    decode_audio,
    decode_external,
    decode_video,
    encode_audio,
    encode_video,
    make_audio,
    make_video,
    snr_db,
)
from texrex_ray.stages.av import AudioDecoder, AudioFeatures, VideoFrameSampler


def test_audio_roundtrip_lossless():
    rng = np.random.default_rng(1)
    pcm = _synth_pcm(rng, 4000, 8000)
    dec, sr = decode_audio(encode_audio(pcm, 8000, "wav"))
    assert sr == 8000
    np.testing.assert_array_equal(dec, pcm)


def test_audio_lossy_snr_at_least_40db():
    # the input_hint invariant (PSNR>=40 for lossy formats), audio analogue
    for i in range(10):
        rng = np.random.default_rng(100 + i)
        pcm = _synth_pcm(rng, 6000, 16000)
        dec, _ = decode_audio(encode_audio(pcm, 16000, "ogg"))
        assert snr_db(pcm, dec) >= 40.0
    assert AUDIO_QUANT["ogg"] > 1  # actually lossy


def test_video_roundtrip_bit_exact():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(5, 8, 8, 3), dtype=np.uint8)
    dec, fps = decode_video(encode_video(frames, 24))
    assert fps == 24
    np.testing.assert_array_equal(dec, frames)


def test_decode_external_raises_only_without_codec_lib():
    import texrex_ray.sources.av as m

    if m._soundfile is None:
        with pytest.raises(NotImplementedError):
            decode_external(b"RIFFxxxx")
    else:  # pragma: no cover - container has no soundfile
        pytest.skip("soundfile present; real path covered below")
    if m._pyav is None:
        with pytest.raises(NotImplementedError):
            decode_external(b"\x00\x00\x00\x18ftypmp42")


@pytest.mark.skipif(
    __import__("texrex_ray.sources.av", fromlist=["_soundfile"])._soundfile
    is None,
    reason="real audio codec path needs soundfile",
)
def test_decode_external_real_wav_roundtrip():  # pragma: no cover
    """On a soundfile-capable host a real RIFF/WAV decodes through the
    same seam the synthetic containers bypass."""
    import io

    import soundfile as sf

    rng = np.random.default_rng(3)
    pcm = _synth_pcm(rng, 2000, 8000)
    buf = io.BytesIO()
    sf.write(buf, pcm, 8000, format="WAV", subtype="PCM_16")
    dec, sr = decode_audio(buf.getvalue())
    assert sr == 8000
    np.testing.assert_array_equal(dec, pcm)


def test_audio_stage_columns(ray_session):
    ds = ray.data.from_arrow(make_audio(n=12, seed=5))
    out = (
        ds.map_batches(AudioDecoder(), batch_format="pyarrow", batch_size=4)
        .map_batches(AudioFeatures(), batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )
    assert out["ok"].all()
    assert (out["duration_ms"] > 0).all()
    assert (out["rms_c"] > 0).all()
    # peak frequency is inside the synth band (80 Hz .. sr/4)
    assert (out["peak_hz"] >= 40).all()
    assert (out["peak_hz"] <= out["centroid_hz"] * 10).all()


def test_frame_sampler_flatmap_shape(ray_session):
    vids = make_video(n=8, seed=6)
    ds = ray.data.from_arrow(vids)
    out = ds.map_batches(VideoFrameSampler(step=2), batch_format="pyarrow").to_pandas()
    nf = dict(zip(vids["video_id"].to_pylist(), vids["n_frames"].to_pylist()))
    for vid, g in out.groupby("video_id"):
        want = list(range(0, nf[vid], 2))
        assert sorted(g["frame_idx"]) == want
        assert g.loc[g["frame_idx"] == 0, "is_key"].all()
    # brightness ramp: later frames are brighter
    for vid, g in out.groupby("video_id"):
        s = g.sort_values("frame_idx")["mean_lum_c"].to_numpy()
        assert (np.diff(s) > 0).all()


def test_make_audio_deterministic():
    a1 = make_audio(n=6, seed=9)
    a2 = make_audio(n=6, seed=9)
    assert a1.equals(a2)
