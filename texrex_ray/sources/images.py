"""Deterministic synthetic image+caption table (the graft payload).

Schema per BASELINE.json input_hint: ``image_id:string, bytes:binary,
w:int32, h:int32, fmt:string, caption:string, phash:int64``.

The container has no image codecs (no PIL/cv2), so ``fmt`` names a
**synthetic codec** with the same *shape* as real formats: ``png`` is
lossless, ``jpeg``/``webp`` are lossy via uniform quantization calibrated
so decoded pixels reconstruct at PSNR ≥ 40 dB (the input_hint's per-row
invariant).  A ``decode_external`` hook marks where a real codec plugs in
(NotImplementedError stub).  Pixels are procedural (seeded RNG gradients +
rectangles); exact duplicates (same pixels+fmt → same phash) are injected
at a controlled rate.

Captions carry the dirt the cleaning chain must handle (FIXTURES.md §1):
HTML entities incl. double-escapes, stray tags, e-mails, URIs, NBSP/ZWSP,
non-NFC sequences, duplicated sentences.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MAGIC = {"png": b"SPNG", "jpeg": b"SJPG", "webp": b"SWEB"}
QUANT = {"png": 1, "jpeg": 6, "webp": 4}  # q=6 → PSNR ≈ 43 dB, q=4 → ≈ 47 dB


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → synthetic container bytes."""
    h, w, _ = pixels.shape
    q = QUANT[fmt]
    if q > 1:
        data = (np.round(pixels.astype(np.int32) / q) * q).clip(0, 255).astype(np.uint8)
    else:
        data = pixels
    head = MAGIC[fmt] + w.to_bytes(4, "big") + h.to_bytes(4, "big")
    return head + data.tobytes()


def decode_image(raw: bytes) -> np.ndarray:
    """Synthetic container bytes → (h, w, 3) uint8 pixels."""
    magic = raw[:4]
    if magic not in MAGIC.values():
        return decode_external(raw)
    w = int.from_bytes(raw[4:8], "big")
    h = int.from_bytes(raw[8:12], "big")
    return np.frombuffer(raw[12:], dtype=np.uint8).reshape(h, w, 3)


try:  # optional real-codec seam (lance_io.py fallback pattern): on a
    # host WITH an image library, real PNG/JPEG/WebP payloads decode;
    # this sandbox has none, so the synthetic containers carry all tests
    from PIL import Image as _pil_image
except ImportError:  # pragma: no cover - container has no PIL
    _pil_image = None


def decode_external(raw: bytes) -> np.ndarray:
    """Real-codec seam: PNG/JPEG/WebP → (h, w, 3) uint8 via PIL when the
    library is importable; raises only when it is absent.  The Ray-side
    plumbing (schema, batch sizing, actor signature) is identical either
    way."""
    if _pil_image is not None:
        import io

        with _pil_image.open(io.BytesIO(raw)) as img:
            return np.asarray(img.convert("RGB"), dtype=np.uint8)
    raise NotImplementedError(
        "no image codec library importable (tried PIL); "
        "payloads use the synthetic SPNG/SJPG/SWEB container"
    )


def phash_of(pixels: np.ndarray, fmt: str) -> int:
    """Stable 64-bit perceptual-hash stand-in over DECODED pixels.

    Exact duplicates (identical pixels + fmt → identical decoded bytes)
    share a phash; signed int64 for parquet."""
    decoded = decode_image(encode_image(pixels, fmt))
    d = hashlib.blake2b(decoded.tobytes(), digest_size=8).digest()
    return int.from_bytes(d, "big", signed=True)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_CAPTION_WORDS = (
    "sunset mountain river city bridge forest portrait abstract pattern "
    "texture light shadow vintage modern colorful monochrome aerial macro"
).split()

_DIRT = [
    " &amp; friends",
    " Café scene",  # non-NFC e + combining acute
    " visit http://example.com/pic",
    " contact photo@example.org",
    " <b>bold</b> claim",
    " &amp;acirc; entity",
    " with nbsp and​zwsp",
]


def _make_caption(rng: np.random.Generator) -> str:
    words = list(rng.choice(_CAPTION_WORDS, size=6 + int(rng.integers(0, 8))))
    sent = " ".join(words)
    cap = sent.capitalize() + "."
    if rng.random() < 0.4:
        cap += _DIRT[int(rng.integers(0, len(_DIRT)))]
    if rng.random() < 0.15:
        cap += " " + sent.capitalize() + "."  # duplicated sentence
    return cap


def _make_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.zeros((h, w, 3), dtype=np.float64)
    for c in range(3):
        gx, gy = rng.uniform(-1, 1), rng.uniform(-1, 1)
        base[:, :, c] = 128 + 100 * (gx * xx / w + gy * yy / h)
    for _ in range(int(rng.integers(1, 4))):
        x0, y0 = int(rng.integers(0, w)), int(rng.integers(0, h))
        x1, y1 = int(rng.integers(x0, w + 1)), int(rng.integers(y0, h + 1))
        base[y0:y1, x0:x1, :] += rng.uniform(-80, 80, size=3)
    base += rng.normal(0, 6, size=base.shape)
    return base.clip(0, 255).astype(np.uint8)


def make_images(
    n: int = 200, seed: int = 42, dup_rate: float = 0.05
) -> tuple[pa.Table, pa.Table]:
    """(images, images_expected) deterministic tables.

    ``images_expected`` stores the ORIGINAL pixels (pre-encode) per row —
    the reference against which decoded output is PSNR-checked.
    """
    rng = np.random.default_rng(seed)
    fmts = ["png", "jpeg", "webp"]
    sizes = [32, 64, 128]
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    expected = {"image_id": [], "pixels": [], "w": [], "h": []}
    made: list[tuple[np.ndarray, str]] = []
    for i in range(n):
        if made and rng.random() < dup_rate:
            pixels, fmt = made[int(rng.integers(0, len(made)))]
        else:
            w = sizes[int(rng.integers(0, 3))]
            h = sizes[int(rng.integers(0, 3))]
            fmt = fmts[int(rng.integers(0, 3))]
            pixels = _make_pixels(rng, w, h)
            made.append((pixels, fmt))
        h_, w_ = pixels.shape[:2]
        enc = encode_image(pixels, fmt)
        rows["image_id"].append(f"img{i:08d}")
        rows["bytes"].append(enc)
        rows["w"].append(w_)
        rows["h"].append(h_)
        rows["fmt"].append(fmt)
        rows["caption"].append(_make_caption(rng))
        rows["phash"].append(phash_of(pixels, fmt))
        expected["image_id"].append(f"img{i:08d}")
        expected["pixels"].append(pixels.tobytes())
        expected["w"].append(w_)
        expected["h"].append(h_)
    images = pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "caption": pa.array(rows["caption"], pa.string()),
            "phash": pa.array(rows["phash"], pa.int64()),
        }
    )
    images_expected = pa.table(
        {
            "image_id": pa.array(expected["image_id"], pa.string()),
            "pixels": pa.array(expected["pixels"], pa.binary()),
            "w": pa.array(expected["w"], pa.int32()),
            "h": pa.array(expected["h"], pa.int32()),
        }
    )
    return images, images_expected


def pixel_parity(
    ours: "ray.data.Dataset",
    reference: "ray.data.Dataset",
    *,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    psnr_db: int = 40,
) -> "ray.data.Dataset":
    """Per-row decoded-pixel PSNR + caption-equality check between two
    image tables — the north rule's row invariant ("decoded-pixel
    allclose, PSNR ≥ 40 dB for lossy formats, + caption equality per
    row") as a first-class distributed operator.

    Both sides join on ``id_col`` (the one bucketed shuffle; blob
    payloads ride the exchange untouched), then each bucket decodes both
    byte columns and computes the squared error over decoded pixels —
    INTEGER-exact, so the PSNR gate is an integer inequality::

        PSNR ≥ p  ⇔  10^(p/10) · SSE ≤ 255² · n_pixels   (p multiple of 10)

    Returns (image_id, sse, n_bytes, psnr_ok, caption_eq) with int64
    columns; ``psnr_ok`` is 1 for identical pixels too (SSE = 0).
    Mismatched lengths or missing partner rows fail loudly — a parity
    check that silently skips rows is not a parity check.
    """
    import pandas as pd
    import ray.data  # noqa: F401  (type only)

    from texrex_ray.ops.join import shuffle_join

    if psnr_db % 10:
        raise ValueError("psnr_db must be a multiple of 10 for integer-exact gating")
    scale = 10 ** (psnr_db // 10)

    joined = shuffle_join(
        ours.select_columns([id_col, bytes_col, caption_col]),
        reference.select_columns([id_col, bytes_col, caption_col]),
        id_col,
        how="outer",
        suffix="_ref",
    )

    def compare(df: pd.DataFrame) -> pd.DataFrame:
        ids, sses, ns, oks, caps = [], [], [], [], []
        it = zip(
            df[id_col], df[bytes_col], df[f"{bytes_col}_ref"],
            df[caption_col], df[f"{caption_col}_ref"],
        )
        for rid, a, b, ca, cb in it:
            if a is None or b is None or isinstance(a, float) or isinstance(b, float):
                raise ValueError(
                    f"pixel_parity: {rid!r} present on only one side"
                )
            pa_, pb = decode_image(bytes(a)), decode_image(bytes(b))
            if pa_.shape != pb.shape:
                raise ValueError(
                    f"pixel_parity: {rid!r} decoded shapes differ "
                    f"{pa_.shape} vs {pb.shape}"
                )
            d = pa_.astype(np.int64) - pb.astype(np.int64)
            sse = int((d * d).sum())
            n = int(pa_.size)
            ids.append(rid)
            sses.append(sse)
            ns.append(n)
            oks.append(int(scale * sse <= 65025 * n))
            caps.append(int(ca == cb))
        return pd.DataFrame(
            {
                "image_id": ids,
                "sse": pd.array(sses, dtype="int64"),
                "n_bytes": pd.array(ns, dtype="int64"),
                "psnr_ok": pd.array(oks, dtype="int64"),
                "caption_eq": pd.array(caps, dtype="int64"),
            }
        )

    return joined.map_batches(compare, batch_format="pandas")
