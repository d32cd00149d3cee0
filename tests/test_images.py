"""Image payload tests: codec round-trip invariants, pipeline e2e."""

import numpy as np
import pytest
import ray.data

from texrex_ray.sources.images import (
    decode_external,
    decode_image,
    encode_image,
    make_images,
    phash_of,
    psnr,
)


def test_codec_roundtrip_invariants():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    # png lossless
    assert np.array_equal(decode_image(encode_image(px, "png")), px)
    # lossy ≥ 40 dB (input_hint invariant)
    for fmt in ("jpeg", "webp"):
        out = decode_image(encode_image(px, fmt))
        assert psnr(px, out) >= 40.0, fmt


def test_decode_external_raises_only_without_codec_lib():
    import texrex_ray.sources.images as m

    if m._pil_image is None:
        with pytest.raises(NotImplementedError):
            decode_external(b"\x89PNG\r\n\x1a\n...")
    else:  # pragma: no cover - container has no PIL
        pytest.skip("PIL present; real path covered below")


@pytest.mark.skipif(
    __import__("texrex_ray.sources.images", fromlist=["_pil_image"])._pil_image
    is None,
    reason="real image codec path needs PIL",
)
def test_decode_external_real_png_roundtrip():  # pragma: no cover
    """On a PIL-capable host, a real PNG decodes bit-exact through the
    same seam the synthetic containers bypass."""
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    out = decode_image(buf.getvalue())  # unknown magic -> external seam
    np.testing.assert_array_equal(out, px)


def test_make_images_deterministic_with_dups():
    t1, e1 = make_images(n=60, seed=42)
    t2, _ = make_images(n=60, seed=42)
    assert t1.equals(t2)
    ph = t1["phash"].to_pylist()
    assert len(set(ph)) < len(ph)  # injected exact dups share phash
    # phash matches decoded pixels
    row = {c: t1[c][0].as_py() for c in t1.column_names}
    px = np.frombuffer(e1["pixels"][0].as_py(), dtype=np.uint8).reshape(
        e1["h"][0].as_py(), e1["w"][0].as_py(), 3
    )
    assert phash_of(px, row["fmt"]) == row["phash"]


def test_pipeline_e2e_with_verification():
    import ray

    from texrex_ray.pipelines.caption import fixture_path, image_caption_pipeline
    from texrex_ray.stages.images import verify_against_expected

    d = fixture_path(n=80, seed=42)
    ds = ray.data.read_parquet(f"{d}/images.parquet")
    out = image_caption_pipeline(ds, batch_size=32)
    df = out.to_pandas()
    src = ray.data.read_parquet(f"{d}/images.parquet").to_pandas()
    # dedup kept exactly one row per phash
    assert len(df) == src["phash"].nunique()
    assert df["ok"].all()
    assert df["feat"].map(len).eq(14).all()
    # captions cleansed: no tags/uris left
    assert not df["caption"].str.contains("<b>").any()
    assert not df["caption"].str.contains("http://").any()
    # per-row pixel invariant vs stored originals
    import pyarrow.parquet as pq

    exp = pq.read_table(f"{d}/images_expected.parquet")
    emap = {
        i: (p, w, h)
        for i, p, w, h in zip(
            exp["image_id"].to_pylist(), exp["pixels"].to_pylist(),
            exp["w"].to_pylist(), exp["h"].to_pylist(),
        )
    }
    import pyarrow as pa

    ver = verify_against_expected(pa.Table.from_pandas(src), emap)
    assert ver["pixel_ok"].to_pandas().all()
    assert (ver["psnr"].to_pandas() >= 40).all()


def test_pixel_parity_gate_and_loudness(ray_session):
    """pixel_parity: identical tables pass everywhere; the 40 dB gate
    depends on real pixel counts; one-sided rows fail loudly."""
    import pyarrow as pa
    import pytest
    import ray.data

    from texrex_ray.sources.images import encode_image, pixel_parity, _make_pixels
    import numpy as np

    rng = np.random.default_rng(3)
    small = _make_pixels(rng, 32, 32)
    big = _make_pixels(rng, 128, 128)

    def tbl(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "image_id": pa.array([r[0] for r in rows], pa.string()),
                    "bytes": pa.array([r[1] for r in rows], pa.binary()),
                    "caption": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    ref = tbl([("a", encode_image(small, "png"), "cap a"),
               ("b", encode_image(big, "png"), "cap b")])
    # same 10-byte +128 damage: fails 40 dB at 32x32, passes at 128x128
    def damage(px):
        enc = bytearray(encode_image(px, "png"))
        for k in range(12, 22):
            enc[k] = (enc[k] + 128) % 256
        return bytes(enc)

    ours = tbl([("a", damage(small), "cap a"), ("b", damage(big), "CAP B")])
    out = pixel_parity(ours, ref).to_pandas().set_index("image_id")
    assert out.loc["a", "psnr_ok"] == 0 and out.loc["b", "psnr_ok"] == 1
    assert out.loc["a", "sse"] == out.loc["b", "sse"] == 163840
    assert out.loc["a", "caption_eq"] == 1 and out.loc["b", "caption_eq"] == 0

    ident = pixel_parity(ref, ref).to_pandas()
    assert (ident["psnr_ok"] == 1).all() and (ident["sse"] == 0).all()

    lonely = tbl([("a", encode_image(small, "png"), "cap a")])
    with pytest.raises(Exception, match="only one side"):
        pixel_parity(lonely, ref).to_pandas()


def test_winner_plans_agree(ray_session):
    """VERDICT r3 #3: the corpus-scale winner plan (bucketed groupby +
    block-ref winner filter, no driver-held id list) must emit exactly
    the single-combine plan's rows — parametrized over plan switches,
    including the auto threshold engaging via expected_rows."""
    import ray

    from texrex_ray.pipelines.caption import fixture_path, image_caption_pipeline

    d = fixture_path(n=80, seed=42)

    def run(**kw):
        ds = ray.data.read_parquet(f"{d}/images.parquet")
        out = image_caption_pipeline(ds, batch_size=32, **kw).to_pandas()
        return out.sort_values("image_id").reset_index(drop=True)

    single = run(winner_plan="single")
    shuffled = run(winner_plan="shuffle")
    auto_big = run(winner_plan="auto", expected_rows=6_000_000)  # > 5M: shuffle
    assert single["image_id"].tolist() == shuffled["image_id"].tolist()
    assert single["caption"].tolist() == shuffled["caption"].tolist()
    assert single["image_id"].tolist() == auto_big["image_id"].tolist()

    import pytest

    with pytest.raises(ValueError, match="winner_plan"):
        run(winner_plan="bogus")
