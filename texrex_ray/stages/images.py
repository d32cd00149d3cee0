"""Image payload stages: decode/verify, resize, feature-extract, caption
cleanse — actor-pool ``map_batches`` stages over zero-copy Arrow batches.

Large binary rows: these stages are built for SMALL batch sizes (the
driver pipeline uses batch_size≈256 for 128×128 RGB) so batch × pool
concurrency stays inside worker heaps; blocks of encoded bytes flow
zero-copy from the object store (input_hint: Dataset + map_batches over
zero-copy Arrow, actor pools for stateful stages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from texrex_ray.sources.images import decode_image, psnr


class ImageDecoder:
    """Actor-pool stage: decode bytes → verify dims → per-image stats.

    Stateful shape: a real deployment loads codec contexts / a GPU decoder
    once per actor in ``__init__`` (here the synthetic codec needs no
    state, but the pool pattern is what scales).
    Adds: ok(bool), mean_lum(float), std_lum(float).
    """

    def __init__(self) -> None:
        self.decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, mean_l, std_l = [], [], []
        for raw, w, h in zip(
            batch["bytes"].to_pylist(), batch["w"].to_pylist(), batch["h"].to_pylist()
        ):
            try:
                px = self.decode(raw)
                good = px.shape == (h, w, 3)
            except Exception:
                px, good = None, False
            ok.append(good)
            if good:
                lum = px.astype(np.float32).mean(axis=2)
                mean_l.append(float(lum.mean()))
                std_l.append(float(lum.std()))
            else:
                mean_l.append(0.0)
                std_l.append(0.0)
        return (
            batch.append_column("ok", pa.array(ok, pa.bool_()))
            .append_column("mean_lum", pa.array(mean_l, pa.float64()))
            .append_column("std_lum", pa.array(std_l, pa.float64()))
        )


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize to (target, target), stored
    as a fixed-size raw RGB column ``thumb``."""

    def __init__(self, target: int = 16) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        t = self.target
        for raw in batch["bytes"].to_pylist():
            px = decode_image(raw)
            h, w, _ = px.shape
            yi = (np.arange(t) * h // t).clip(0, h - 1)
            xi = (np.arange(t) * w // t).clip(0, w - 1)
            thumbs.append(px[yi][:, xi].tobytes())
        return batch.append_column("thumb", pa.array(thumbs, pa.binary()))


class ImageFeatures:
    """Actor-pool stage: per-channel mean/std + 8-bin luminance histogram
    → ``feat: list<float>[14]`` (a model-inference stand-in: weights/model
    would load in ``__init__``)."""

    def __init__(self) -> None:
        self.bins = np.linspace(0, 256, 9)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for raw in batch["bytes"].to_pylist():
            px = decode_image(raw).astype(np.float32)
            means = px.mean(axis=(0, 1)) / 255.0
            stds = px.std(axis=(0, 1)) / 255.0
            lum = px.mean(axis=2)
            hist, _ = np.histogram(lum, bins=self.bins)
            hist = hist / max(1, lum.size)
            feats.append(np.concatenate([means, stds, hist]).astype(np.float32))
        return batch.append_column(
            "feat", pa.array([list(map(float, f)) for f in feats], pa.list_(pa.float32(), 14))
        )


def verify_against_expected(batch: pa.Table, expected: dict, min_psnr: float = 40.0) -> pa.Table:
    """Per-row invariant (input_hint): decoded pixels vs stored originals —
    bit-exact for png, PSNR ≥ 40 dB for lossy formats.  ``expected`` maps
    image_id → (pixels bytes, w, h); broadcast via ray.put by the caller."""
    res_psnr, res_ok = [], []
    for iid, raw, fmt in zip(
        batch["image_id"].to_pylist(), batch["bytes"].to_pylist(), batch["fmt"].to_pylist()
    ):
        px = decode_image(raw)
        want_b, w, h = expected[iid]
        want = np.frombuffer(want_b, dtype=np.uint8).reshape(h, w, 3)
        p = psnr(want, px)
        res_psnr.append(p if np.isfinite(p) else 99.0)
        res_ok.append(bool(p >= min_psnr) if fmt != "png" else bool(np.array_equal(want, px)))
    return batch.append_column("psnr", pa.array(res_psnr, pa.float64())).append_column(
        "pixel_ok", pa.array(res_ok, pa.bool_())
    )


class ImagePatcher:
    """Actor-pool patchify stage: flat-map each image into a GRID x GRID
    tile table of integer channel sums (the vision-training prep step —
    ViT-style patch statistics — expressed as a Ray Data batch stage).

    Tile boundaries are floor(i * dim / GRID), so ragged sizes split
    deterministically and every pixel lands in exactly one tile.  Decode
    happens here (binary in, int64 stats out — pixels never leave the
    task); batches stay small because rows carry image payloads.
    """

    GRID = 4

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, trs, tcs = [], [], []
        tws, ths = [], []
        sr, sg, sb, npx = [], [], [], []
        g = self.GRID
        for iid, raw in zip(
            batch["image_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            px = self._decode(raw).astype(np.int64)
            h, w, _ = px.shape
            rb = [h * i // g for i in range(g + 1)]
            cb = [w * i // g for i in range(g + 1)]
            for r in range(g):
                for c in range(g):
                    tile = px[rb[r]:rb[r + 1], cb[c]:cb[c + 1]]
                    ids.append(iid)
                    trs.append(r)
                    tcs.append(c)
                    ths.append(rb[r + 1] - rb[r])
                    tws.append(cb[c + 1] - cb[c])
                    s = tile.sum(axis=(0, 1))
                    sr.append(int(s[0]))
                    sg.append(int(s[1]))
                    sb.append(int(s[2]))
                    npx.append(tile.shape[0] * tile.shape[1])
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "tile_h": pa.array(ths, pa.int64()),
                "tile_w": pa.array(tws, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
                "n_px": pa.array(npx, pa.int64()),
            }
        )


class ExposureAudit:
    """Actor-pool exposure QC: per image, integer luma quantiles
    (p05/p50/p95 at sorted index floor(q*(n-1))) plus clipped-pixel
    counts (luma <= 2 dark, >= 253 bright) — the reject-before-train
    check for black frames / blown highlights.  Luma is the integer
    BT.601 surrogate (299r + 587g + 114b) // 1000; quantiles come from
    a 256-bin bincount, so per-image work is one vectorized pass."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self._decode = decode_image

    @staticmethod
    def _quantile_from_counts(counts: np.ndarray, n: int, q: float) -> int:
        idx = int(q * (n - 1))
        cum = np.cumsum(counts)
        return int(np.searchsorted(cum, idx, side="right"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, p05, p50, p95, dark, bright = [], [], [], [], [], []
        for iid, raw in zip(
            batch["image_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            px = self._decode(raw).astype(np.int64)
            luma = (
                299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
            ) // 1000
            flat = luma.ravel()
            counts = np.bincount(flat, minlength=256)
            n = flat.size
            ids.append(iid)
            p05.append(self._quantile_from_counts(counts, n, 0.05))
            p50.append(self._quantile_from_counts(counts, n, 0.50))
            p95.append(self._quantile_from_counts(counts, n, 0.95))
            dark.append(int(counts[:3].sum()))
            bright.append(int(counts[253:].sum()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "p05": pa.array(p05, pa.int64()),
                "p50": pa.array(p50, pa.int64()),
                "p95": pa.array(p95, pa.int64()),
                "n_dark": pa.array(dark, pa.int64()),
                "n_bright": pa.array(bright, pa.int64()),
            }
        )


class ChannelStats:
    """Actor-pool stage: per-image exact integer channel statistics
    (sum and sum-of-squares per RGB channel, pixel count) — the pass
    that produces a dataset's normalization constants (mean/std per
    channel) for vision training.  Decode happens inside the task
    (binary in, seven int64 columns out — pixels never shuffle);
    means/stds are derived downstream from the EXACT sums so the
    constants are bit-identical however the corpus is partitioned."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fmts = [], []
        out = {c: [] for c in
               ("sum_r", "sum_g", "sum_b", "sq_r", "sq_g", "sq_b", "n_px")}
        for iid, fmt, raw in zip(
            batch["image_id"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["bytes"].to_pylist(),
        ):
            px = self._decode(raw).astype(np.int64)
            ids.append(iid)
            fmts.append(fmt)
            s = px.sum(axis=(0, 1))
            q = (px * px).sum(axis=(0, 1))
            out["sum_r"].append(int(s[0]))
            out["sum_g"].append(int(s[1]))
            out["sum_b"].append(int(s[2]))
            out["sq_r"].append(int(q[0]))
            out["sq_g"].append(int(q[1]))
            out["sq_b"].append(int(q[2]))
            out["n_px"].append(px.shape[0] * px.shape[1])
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                **{k: pa.array(v, pa.int64()) for k, v in out.items()},
            }
        )


class SharpnessAudit:
    """Actor-pool stage: variance-of-Laplacian sharpness per image —
    the standard blur detector an image-caption curation pass runs
    before spending caption/embedding compute on unusable pixels.

    Integer-exact: luminance is the per-pixel CHANNEL SUM (0..765,
    int64 — no /3, no float), the 4-neighbor Laplacian is computed on
    interior pixels, and the population variance is emitted as
    ``var_milli = (n*Σl² - (Σl)²) * 1000 // n²`` so the blur verdict
    hashes identically on every engine.  Decode happens inside the
    task; only the scalar column leaves it.  Adds: ``sharp_var_milli``
    (int64; -1 for images too small for an interior).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for raw in batch["bytes"].to_pylist():
            px = self.decode(raw).astype(np.int64)
            lum = px.sum(axis=2)
            if lum.shape[0] < 3 or lum.shape[1] < 3:
                out.append(-1)
                continue
            lap = (
                4 * lum[1:-1, 1:-1]
                - lum[:-2, 1:-1]
                - lum[2:, 1:-1]
                - lum[1:-1, :-2]
                - lum[1:-1, 2:]
            )
            n = lap.size
            s = int(lap.sum())
            s2 = int((lap * lap).sum())
            out.append((n * s2 - s * s) * 1000 // (n * n))
        return batch.append_column(
            "sharp_var_milli", pa.array(out, pa.int64())
        )


class BlobCount:
    """Actor-pool stage: count 4-connected foreground components per
    image — the structure-complexity signal (object count proxy) an
    image curation pass uses to separate flat graphics from busy
    photographs, and the pixel-level cousin of the corpus-level
    connected components in dedup/clusters.py.

    Foreground = channel-sum luminance > ``thresh`` (default 383 =
    half of 765; integer, no float).  Labeling is vectorized
    min-label relaxation: every foreground pixel starts with its own
    index and repeatedly takes the min over its foreground 4-neighbors
    until fixpoint — iterations bound by component diameter, every
    step a whole-array numpy op (no per-pixel Python).  Adds:
    ``n_blobs`` (int64).
    """

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    def _count(self, px: np.ndarray) -> int:
        lum = px.astype(np.int64).sum(axis=2)
        fg = lum > self.thresh
        if not fg.any():
            return 0
        h, w = fg.shape
        lab = np.where(fg, np.arange(h * w, dtype=np.int64).reshape(h, w), -1)
        big = np.int64(h * w)
        while True:
            cur = np.where(fg, lab, big)
            m = cur.copy()
            m[1:, :] = np.minimum(m[1:, :], cur[:-1, :])
            m[:-1, :] = np.minimum(m[:-1, :], cur[1:, :])
            m[:, 1:] = np.minimum(m[:, 1:], cur[:, :-1])
            m[:, :-1] = np.minimum(m[:, :-1], cur[:, 1:])
            new = np.where(fg, m, -1)
            if np.array_equal(new, lab):
                break
            lab = new
        return int(len(np.unique(lab[fg])))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._count(self.decode(raw)) for raw in batch["bytes"].to_pylist()]
        return batch.append_column("n_blobs", pa.array(out, pa.int64()))


class PaletteQuant:
    """Actor-pool stage: K-color palette via iterative binary box-split
    (median-cut family, midpoint rule) + integer quantization error —
    the palette/compressibility signal an image-curation pass uses to
    separate synthetic graphics (tiny error at K=8) from photographs.

    Deterministic spec (the fixture oracle and test twin re-implement
    it independently):

    - start with one box holding all pixels; repeat until ``k`` boxes
      or no box has channel range > 0: pick the box with the largest
      (max-min) channel range (first/lowest box id on ties), split on
      its widest channel (lowest channel index on ties) at
      ``mid = (min+max)//2`` — pixels with value <= mid keep the box
      id, the rest move to a fresh id (both sides non-empty because
      range > 0).
    - palette color per box = floor per-channel mean (sum//n); error =
      sum over pixels of squared L2 distance to their box's color.

    All splits are whole-array numpy masks (no per-pixel Python).
    Adds: ``n_boxes``, ``quant_err`` (int64).
    """

    def __init__(self, k: int = 8) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.k = k

    def _quant(self, px: np.ndarray) -> tuple[int, int]:
        pts = px.reshape(-1, 3).astype(np.int64)
        lab = np.zeros(len(pts), dtype=np.int64)
        n_boxes = 1
        while n_boxes < self.k:
            best, best_rng, best_ch = -1, 0, 0
            for b in range(n_boxes):
                sel = pts[lab == b]
                if not len(sel):
                    continue
                rng = sel.max(axis=0) - sel.min(axis=0)
                ch = int(np.argmax(rng))
                if rng[ch] > best_rng:
                    best, best_rng, best_ch = b, int(rng[ch]), ch
            if best < 0 or best_rng == 0:
                break
            m = lab == best
            v = pts[:, best_ch]
            lo = int(v[m].min())
            hi = int(v[m].max())
            mid = (lo + hi) // 2
            lab[m & (v > mid)] = n_boxes
            n_boxes += 1
        err = 0
        for b in range(n_boxes):
            sel = pts[lab == b]
            if not len(sel):
                continue
            c = sel.sum(axis=0) // len(sel)
            err += int(((sel - c) ** 2).sum())
        return n_boxes, err

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb, qe = [], []
        for raw in batch["bytes"].to_pylist():
            n, e = self._quant(self.decode(raw))
            nb.append(n)
            qe.append(e)
        return batch.append_column(
            "n_boxes", pa.array(nb, pa.int64())
        ).append_column("quant_err", pa.array(qe, pa.int64()))


class HistEqualize:
    """Actor-pool stage: histogram-equalization contrast audit.

    Channel-sum luminance (0..765) per pixel; the classic integer remap
    ``v' = (cdf(v) - cdf_min) * 765 // (n_px - cdf_min)`` (cdf_min =
    CDF at the darkest PRESENT level, so the darkest pixel maps to 0
    and the brightest to 765); a single-level image equalizes to all
    zeros by convention.  Emits exact population variance x1000 before
    and after via the (n*s2 - s*s) // (n*n) identity — the
    contrast-gain signal an enhancement pass would use to decide which
    assets benefit.  Adds: ``var_before_milli``, ``var_after_milli``
    (int64).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    @staticmethod
    def _var_milli(vals: np.ndarray) -> int:
        n = vals.size
        s = int(vals.sum())
        s2 = int((vals.astype(object) ** 2).sum())
        return (n * s2 - s * s) * 1000 // (n * n)

    def _audit(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2).ravel()
        n = lum.size
        hist = np.bincount(lum, minlength=766)
        cdf = np.cumsum(hist)
        cdf_min = int(cdf[int(lum.min())])
        if cdf_min == n:
            eq = np.zeros_like(lum)
        else:
            eq = (cdf[lum] - cdf_min) * 765 // (n - cdf_min)
        return self._var_milli(lum), self._var_milli(eq)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vb, va = [], []
        for raw in batch["bytes"].to_pylist():
            b, a = self._audit(self.decode(raw))
            vb.append(b)
            va.append(a)
        return batch.append_column(
            "var_before_milli", pa.array(vb, pa.int64())
        ).append_column("var_after_milli", pa.array(va, pa.int64()))


class OtsuThreshold:
    """Actor-pool stage: Otsu's optimal global threshold over channel-sum
    luminance (0..765) — the classic foreground/background split that
    feeds q269's blob count with a per-image threshold instead of a
    global constant.  The argmax of between-class variance runs in
    exact integer arithmetic (cross-multiplied rational compare, Python
    ints — the squared terms exceed int64), over the 766-bin histogram,
    never per pixel.  Ties take the lowest threshold.  Adds:
    ``otsu_thresh`` (-1 for single-level images) and ``otsu_eta_milli``
    (between-class / total variance x1000, the separability score).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _otsu(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2).ravel()
        hist = np.bincount(lum, minlength=766)
        n = int(lum.size)
        s = int(lum.sum())
        s2 = int((lum.astype(object) ** 2).sum())
        tot_var_num = n * s2 - s * s  # N^2 * sigma_total^2
        if tot_var_num == 0:
            return -1, 0
        best_t, best_num, best_den = -1, 0, 1
        n0 = 0
        s0 = 0
        for t in range(766):
            n0 += int(hist[t])
            s0 += t * int(hist[t])
            if n0 == 0 or n0 == n:
                continue
            num = (s0 * n - s * n0) ** 2
            den = n0 * (n - n0)
            if num * best_den > best_num * den:
                best_t, best_num, best_den = t, num, den
        eta_milli = best_num * 1000 // (best_den * tot_var_num)
        return best_t, eta_milli

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts, es = [], []
        for raw in batch["bytes"].to_pylist():
            t, e = self._otsu(self.decode(raw))
            ts.append(t)
            es.append(e)
        return batch.append_column(
            "otsu_thresh", pa.array(ts, pa.int64())
        ).append_column("otsu_eta_milli", pa.array(es, pa.int64()))


class SobelOrientation:
    """Actor-pool stage: 8-sector edge-orientation histogram (the HOG
    descriptor's first stage) over channel-sum luminance.

    Integer Sobel gradients on the interior (3x3 kernels via shifted
    views, no per-pixel Python); each edge pixel (|gx|+|gy| >= thresh)
    votes into one of 8 octants decided by exact integer comparisons
    (signs of gx, gy and |gy| vs |gx| — no atan, no floats): octant =
    (sign pattern, steeper-than-45°).  Adds ``ori_hist`` (8 x int64
    list) and ``n_edge_px``.
    """

    def __init__(self, thresh: int = 160) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    def _hist(self, px: np.ndarray) -> tuple[list[int], int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 3 or w < 3:
            return [0] * 8, 0
        # Sobel via shifted interior views
        tl, tc, tr = lum[:-2, :-2], lum[:-2, 1:-1], lum[:-2, 2:]
        ml, mr = lum[1:-1, :-2], lum[1:-1, 2:]
        bl, bc, br = lum[2:, :-2], lum[2:, 1:-1], lum[2:, 2:]
        gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
        gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
        mag = np.abs(gx) + np.abs(gy)
        edge = mag >= self.thresh
        n_edge = int(edge.sum())
        if n_edge == 0:
            return [0] * 8, 0
        gxe, gye = gx[edge], gy[edge]
        # octant: bit0 = gy < 0 OR (gy == 0 AND gx < 0)  (lower half)
        #         bit1 = gx < 0 XOR bit0                  (quadrant walk)
        #         bit2 = |gy| > |gx|                      (steep)
        lower = (gye < 0) | ((gye == 0) & (gxe < 0))
        left = gxe < 0
        steep = np.abs(gye) > np.abs(gxe)
        oct_ = (
            lower.astype(np.int64) * 4
            + (left ^ lower).astype(np.int64) * 2
            + steep.astype(np.int64)
        )
        return np.bincount(oct_, minlength=8).astype(int).tolist(), n_edge

    def __call__(self, batch: pa.Table) -> pa.Table:
        hists, ns = [], []
        for raw in batch["bytes"].to_pylist():
            hi, n = self._hist(self.decode(raw))
            hists.append(hi)
            ns.append(n)
        return batch.append_column(
            "ori_hist", pa.array(hists, pa.list_(pa.int64()))
        ).append_column("n_edge_px", pa.array(ns, pa.int64()))


class MorphOpening:
    """Actor-pool stage: 3x3 binary morphological opening (erosion then
    dilation) of the foreground mask — the despeckle pass that removes
    sub-kernel noise before q269's blob count.  Both passes are shifted
    whole-array min/max with zero-padding semantics (border treated as
    background for erosion, as background contribution 0 for dilation).
    Adds: ``fg_px`` (mask pixels before), ``opened_px`` (after),
    ``speckle_px`` (= removed by opening, int64).
    """

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    @staticmethod
    def _erode(m: np.ndarray) -> np.ndarray:
        p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=bool)
        p[1:-1, 1:-1] = m
        out = np.ones_like(m)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out &= p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
        return out

    @staticmethod
    def _dilate(m: np.ndarray) -> np.ndarray:
        p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=bool)
        p[1:-1, 1:-1] = m
        out = np.zeros_like(m)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out |= p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
        return out

    def _audit(self, px: np.ndarray) -> tuple[int, int]:
        fg = px.astype(np.int64).sum(axis=2) > self.thresh
        opened = self._dilate(self._erode(fg))
        return int(fg.sum()), int(opened.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        before, after = [], []
        for raw in batch["bytes"].to_pylist():
            b, a = self._audit(self.decode(raw))
            before.append(b)
            after.append(a)
        sp = [b - a for b, a in zip(before, after)]
        return (
            batch.append_column("fg_px", pa.array(before, pa.int64()))
            .append_column("opened_px", pa.array(after, pa.int64()))
            .append_column("speckle_px", pa.array(sp, pa.int64()))
        )


class BoxMeans:
    """Actor-pool stage: mean luminance of k deterministic boxes per
    image via ONE summed-area table (integral image) — O(1) per box
    after an O(pixels) pass, the classic Viola-Jones trick; the direct
    per-box loop the fixture twin uses is O(pixels) per box.

    Boxes derive from md5(image_id:b): y0/x0 mod dims, then height/
    width mod the remaining span (always >= 1x1, in-bounds).  Emits
    rows (image_id, fmt, box_idx, mean_milli) with mean_milli =
    box_sum * 1000 // area over channel-sum luminance (0..765).
    """

    def __init__(self, n_boxes: int = 8) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.n_boxes = n_boxes

    @staticmethod
    def box_for(image_id: str, b: int, h: int, w: int) -> tuple[int, int, int, int]:
        import hashlib

        d = hashlib.md5(f"{image_id}:{b}".encode()).digest()
        y0 = (d[0] << 8 | d[1]) % h
        x0 = (d[2] << 8 | d[3]) % w
        bh = d[4] % (h - y0) + 1
        bw = d[6] % (w - x0) + 1
        return y0, x0, bh, bw

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fmts, idxs, means = [], [], [], []
        for iid, fmt, raw in zip(
            batch["image_id"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["bytes"].to_pylist(),
        ):
            px = self.decode(raw)
            lum = px.astype(np.int64).sum(axis=2)
            h, w = lum.shape
            sat = np.zeros((h + 1, w + 1), dtype=np.int64)
            sat[1:, 1:] = lum.cumsum(axis=0).cumsum(axis=1)
            for b in range(self.n_boxes):
                y0, x0, bh, bw = self.box_for(iid, b, h, w)
                s = int(
                    sat[y0 + bh, x0 + bw] - sat[y0, x0 + bw]
                    - sat[y0 + bh, x0] + sat[y0, x0]
                )
                ids.append(iid)
                fmts.append(fmt)
                idxs.append(b)
                means.append(s * 1000 // (bh * bw))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "box_idx": pa.array(idxs, pa.int64()),
                "mean_milli": pa.array(means, pa.int64()),
            }
        )


class HaarEnergy:
    """Actor-pool stage: unnormalized integer 2D Haar transform of
    channel-sum luminance, ``levels`` deep — the multi-resolution
    energy split (sum of squared band coefficients) that separates
    flat synthetic graphics (energy piles into deep LL) from textured
    photographs (energy spread across LH/HL/HH).  All integer: bands
    are +-sums of 2x2 blocks (no /2 normalization), dims crop to even
    per level.  Emits one row per (image, band): band in
    {LH1,HL1,HH1,...,LLk}, energy = sum of squares (int64-safe:
    coefficients <= 765*4^level, squares * pixels << 2^63).
    """

    def __init__(self, levels: int = 2) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.levels = levels

    def bands(self, px: np.ndarray) -> list[tuple[str, int]]:
        lum = px.astype(np.int64).sum(axis=2)
        out = []
        ll = lum
        for lv in range(1, self.levels + 1):
            h, w = ll.shape
            ll = ll[: h - h % 2, : w - w % 2]
            if ll.size == 0:
                break
            a = ll[0::2, 0::2]
            b = ll[0::2, 1::2]
            c = ll[1::2, 0::2]
            d = ll[1::2, 1::2]
            out.append((f"LH{lv}", int(((a - b + c - d) ** 2).sum())))
            out.append((f"HL{lv}", int(((a + b - c - d) ** 2).sum())))
            out.append((f"HH{lv}", int(((a - b - c + d) ** 2).sum())))
            ll = a + b + c + d
        out.append((f"LL{self.levels}", int((ll ** 2).sum())))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fmts, bnames, es = [], [], [], []
        for iid, fmt, raw in zip(
            batch["image_id"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["bytes"].to_pylist(),
        ):
            for bn, e in self.bands(self.decode(raw)):
                ids.append(iid)
                fmts.append(fmt)
                bnames.append(bn)
                es.append(e)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "band": pa.array(bnames, pa.string()),
                "energy": pa.array(es, pa.int64()),
            }
        )


class DistanceTransform:
    """Actor-pool stage: exact L1 (city-block) distance transform to
    the nearest FOREGROUND pixel (channel-sum luminance >= ``thresh``),
    via the separable two-pass lower-envelope trick — for the L1
    metric, ``dt(x,y) = min_y' (rowdt(x,y') + |y-y'|)`` collapses to a
    forward and a backward ``min``-accumulate of ``g -/+ index``, so
    the whole transform is four vectorized passes, never per-pixel
    Python.  Adds ``n_fg`` (foreground pixels), ``sum_dt`` (total L1
    distance over background pixels) and ``max_dt`` (image
    "emptiness" radius; -1 when the image has no foreground)."""

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    @staticmethod
    def _envelope_1d(g: np.ndarray, axis: int) -> np.ndarray:
        """min over j along ``axis`` of g[j] + |i - j| (vectorized)."""
        n = g.shape[axis]
        idx_shape = [1, 1]
        idx_shape[axis] = n
        idx = np.arange(n, dtype=np.int64).reshape(idx_shape)
        fwd = np.minimum.accumulate(g - idx, axis=axis) + idx
        rev = np.flip(
            np.minimum.accumulate(np.flip(g + idx, axis=axis), axis=axis),
            axis=axis,
        ) - idx
        return np.minimum(fwd, rev)

    def _dt(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        fg = lum >= self.thresh
        n_fg = int(fg.sum())
        if n_fg == 0:
            return 0, 0, -1
        h, w = fg.shape
        inf = np.int64(h + w + 2)
        g = np.where(fg, np.int64(0), inf)
        rowdt = self._envelope_1d(g, axis=1)   # nearest fg in-row
        dt = self._envelope_1d(rowdt, axis=0)  # + |dy| envelope
        return n_fg, int(dt.sum()), int(dt.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, sd, md = [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c = self._dt(self.decode(raw))
            nf.append(a)
            sd.append(b)
            md.append(c)
        return (
            batch.append_column("n_fg", pa.array(nf, pa.int64()))
            .append_column("sum_dt", pa.array(sd, pa.int64()))
            .append_column("max_dt", pa.array(md, pa.int64()))
        )


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew's monotone chain with STRICT turns (collinear boundary
    points dropped — hull lists corners only).  Input points are
    deduplicated and sorted here; returns the hull CCW.  Degenerate
    inputs: 1 point -> [p], all-collinear -> the 2 extreme points."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts
    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # all points collinear: keep the two extremes
        return [pts[0], pts[-1]]
    return hull


def jarvis_march(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Independent twin: gift wrapping with farthest-point collinear
    tie-break (also corners-only), for the fixture/test oracle."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts
    start = min(pts, key=lambda p: (p[1], p[0]))
    hull = [start]
    cur = start
    while True:
        nxt = None
        for cand in pts:
            if cand == cur:
                continue
            if nxt is None:
                nxt = cand
                continue
            c = _cross(cur, nxt, cand)
            if c < 0 or (
                c == 0
                and (abs(cand[0] - cur[0]) + abs(cand[1] - cur[1]))
                > (abs(nxt[0] - cur[0]) + abs(nxt[1] - cur[1]))
            ):
                nxt = cand
        if nxt is None or nxt == start:
            break
        hull.append(nxt)
        cur = nxt
    if len(hull) < 3:
        return [pts[0], pts[-1]]
    return hull


def hull_area2(hull: list[tuple[int, int]]) -> int:
    """2x the polygon area (shoelace, exact integer); 0 for <3 pts."""
    if len(hull) < 3:
        return 0
    s = 0
    for (x1, y1), (x2, y2) in zip(hull, hull[1:] + hull[:1]):
        s += x1 * y2 - x2 * y1
    return abs(s)


class ConvexHullStats:
    """Actor-pool stage: convex hull of the FOREGROUND pixel set
    (luminance >= ``thresh``) per image — the content-extent audit
    behind auto-crop and layout density scoring.  The candidate set is
    first reduced VECTORIZED to per-row x-extremes (the hull of the
    row-extreme points equals the hull of all foreground pixels), so
    the monotone chain runs over <= 2h points, not n_fg.  Exact
    integer arithmetic (cross products + shoelace).  Adds ``n_fg``,
    ``hull_verts`` (strict corners; 1/2 for degenerate point/segment
    sets) and ``hull_area2`` (2x area; 0 when degenerate)."""

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    def _stats(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        fg = lum >= self.thresh
        n_fg = int(fg.sum())
        if n_fg == 0:
            return 0, 0, 0
        h, w = fg.shape
        rows = fg.any(axis=1)
        ys = np.nonzero(rows)[0]
        first = fg[rows].argmax(axis=1)
        last = w - 1 - fg[rows][:, ::-1].argmax(axis=1)
        pts = [(int(x), int(y)) for x, y in zip(first, ys)]
        pts += [(int(x), int(y)) for x, y in zip(last, ys)]
        hull = monotone_chain(pts)
        return n_fg, len(hull), hull_area2(hull)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, hv, ha = [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c = self._stats(self.decode(raw))
            nf.append(a)
            hv.append(b)
            ha.append(c)
        return (
            batch.append_column("n_fg", pa.array(nf, pa.int64()))
            .append_column("hull_verts", pa.array(hv, pa.int64()))
            .append_column("hull_area2", pa.array(ha, pa.int64()))
        )


def seam_energy(lum: np.ndarray) -> np.ndarray:
    """Gradient-magnitude energy |dx| + |dy| with replicated borders
    (exact integers), the seam-carving cost surface."""
    padx = np.pad(lum, ((0, 0), (1, 1)), mode="edge")
    pady = np.pad(lum, ((1, 1), (0, 0)), mode="edge")
    return np.abs(padx[:, 2:] - padx[:, :-2]) + np.abs(
        pady[2:, :] - pady[:-2, :]
    )


class SeamEnergy:
    """Actor-pool stage: minimum vertical-seam cost (seam carving's
    inner loop) — the cheapest top-to-bottom 8-connected-column path
    through the gradient-energy surface, via the classic DP
    ``cost[y] = energy[y] + min(cost[y-1] shifted -1/0/+1)`` — one
    vectorized min-of-three per row, no per-pixel Python.  Exact
    integers; the oracle twin runs Dijkstra over the same DAG.  Adds
    ``seam_cost`` (int64)."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _seam(self, px: np.ndarray) -> int:
        lum = px.astype(np.int64).sum(axis=2)
        e = seam_energy(lum)
        big = np.int64(1) << 50
        cost = e[0].copy()
        for y in range(1, e.shape[0]):
            left = np.concatenate(([big], cost[:-1]))
            right = np.concatenate((cost[1:], [big]))
            cost = e[y] + np.minimum(np.minimum(left, cost), right)
        return int(cost.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cs = [self._seam(self.decode(raw))
              for raw in batch["bytes"].to_pylist()]
        return batch.append_column("seam_cost", pa.array(cs, pa.int64()))


def huffman_bits_heap(hist: np.ndarray) -> int:
    """Exact optimal prefix-code size (total bits) for a symbol
    histogram via heapq Huffman — the optimal TOTAL is unique across
    tie-breaks, so any Huffman implementation agrees.  Single-symbol
    convention: 1 bit per occurrence."""
    import heapq

    w = [int(x) for x in hist if x > 0]
    if not w:
        return 0
    if len(w) == 1:
        return w[0]
    heapq.heapify(w)
    total = 0
    while len(w) > 1:
        a = heapq.heappop(w)
        b = heapq.heappop(w)
        total += a + b
        heapq.heappush(w, a + b)
    return total


def huffman_bits_twoqueue(hist: np.ndarray) -> int:
    """Independent twin: sorted two-queue Huffman (O(n) merge after
    one sort) — different mechanics, same unique optimal total."""
    leaves = sorted(int(x) for x in hist if x > 0)
    if not leaves:
        return 0
    if len(leaves) == 1:
        return leaves[0]
    from collections import deque

    q1, q2 = deque(leaves), deque()
    total = 0

    def pop_min():
        if q1 and (not q2 or q1[0] <= q2[0]):
            return q1.popleft()
        return q2.popleft()

    while len(q1) + len(q2) > 1:
        a = pop_min()
        b = pop_min()
        total += a + b
        q2.append(a + b)
    return total


class ResidualCodingBound:
    """Actor-pool stage: exact entropy-coding lower bound (optimal
    prefix code, bits) of each image's LEFT-PREDICTOR residuals — the
    PNG 'Sub' filter audit: how compressible the pixels are after the
    cheapest spatial predictor.  Residuals r = (b[x] - b[x-1]) mod 256
    over the R channel, vectorized; the 256-bin histogram feeds an
    exact Huffman total (optimal size is tie-break-invariant).  Adds
    ``raw_bits`` (8 * n_px) and ``huff_bits``."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _bits(self, px: np.ndarray) -> tuple[int, int]:
        b = px[:, :, 0].astype(np.int64)
        resid = np.empty_like(b)
        resid[:, 0] = b[:, 0]
        resid[:, 1:] = (b[:, 1:] - b[:, :-1]) % 256
        hist = np.bincount(resid.ravel(), minlength=256)
        return 8 * b.size, huffman_bits_heap(hist)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rb, hb = [], []
        for raw in batch["bytes"].to_pylist():
            a, b = self._bits(self.decode(raw))
            rb.append(a)
            hb.append(b)
        return batch.append_column(
            "raw_bits", pa.array(rb, pa.int64())
        ).append_column("huff_bits", pa.array(hb, pa.int64()))


_MED9_NET = [
    (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
    (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
    (4, 2), (6, 4), (4, 2),
]


def median9(planes: list[np.ndarray]) -> np.ndarray:
    """Exact median of 9 equal-shape integer planes via the classic
    19-exchange sorting network — every exchange is a vectorized
    min/max, no per-pixel Python.  After the network, index 4 holds
    the median."""
    v = [p.copy() for p in planes]
    for a, b in _MED9_NET:
        lo = np.minimum(v[a], v[b])
        hi = np.maximum(v[a], v[b])
        v[a], v[b] = lo, hi
    return v[4]


class MedianFilter:
    """Actor-pool stage: 3x3 median filter over channel-sum luminance
    (interior pixels) — the classic salt-and-pepper denoiser, run as
    19 vectorized min/max exchanges (median-of-9 sorting network).
    Adds ``n_interior``, ``sum_abs_change`` (L1 between original and
    filtered interior) and ``n_changed`` — the noise-level audit.
    Images smaller than 3x3 emit zeros."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _stats(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 3 or w < 3:
            return 0, 0, 0
        planes = [lum[y:h - 2 + y, x:w - 2 + x]
                  for y in range(3) for x in range(3)]
        med = median9(planes)
        diff = np.abs(med - lum[1:-1, 1:-1])
        return int(diff.size), int(diff.sum()), int((diff > 0).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ni, sa, nc = [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c = self._stats(self.decode(raw))
            ni.append(a)
            sa.append(b)
            nc.append(c)
        return (
            batch.append_column("n_interior", pa.array(ni, pa.int64()))
            .append_column("sum_abs_change", pa.array(sa, pa.int64()))
            .append_column("n_changed", pa.array(nc, pa.int64()))
        )


class DownsampleLoss:
    """Actor-pool stage: detail lost by a 2x box downsample — SSE
    between the original (cropped to even dims) and the
    nearest-upsampled floor-average of each 2x2 block, over channel-sum
    luminance.  Exact integers (floor-average is the spec).  Adds
    ``n_px_even`` and ``sse_down`` — the per-image resolution-budget
    audit (high SSE = halving resolution destroys real detail)."""

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _loss(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        he, we = h - h % 2, w - w % 2
        if he == 0 or we == 0:
            return 0, 0
        a = lum[:he, :we]
        small = (
            a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
        ) // 4
        up = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
        d = a - up
        return int(a.size), int((d * d).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        np_, ss = [], []
        for raw in batch["bytes"].to_pylist():
            a, b = self._loss(self.decode(raw))
            np_.append(a)
            ss.append(b)
        return batch.append_column(
            "n_px_even", pa.array(np_, pa.int64())
        ).append_column("sse_down", pa.array(ss, pa.int64()))


class TileVariance:
    """Actor-pool stage: 8x8 tile variance map over channel-sum
    luminance, exact integers — a tile is FLAT when its scaled
    variance numerator n*sum(x^2) - sum(x)^2 <= thresh * n^2, BUSY
    when it exceeds busy_thresh * n^2 (the text/graphics-region
    heuristic).  Edge tiles (partial) are skipped; per-tile sums are
    reshape-pooled, no per-pixel Python.  Adds ``n_tiles``,
    ``n_flat``, ``n_busy``."""

    def __init__(self, tile: int = 8, thresh: int = 400,
                 busy_thresh: int = 8000) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.tile = tile
        self.thresh = thresh
        self.busy = busy_thresh

    def _stats(self, px: np.ndarray) -> tuple[int, int, int]:
        t = self.tile
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        ht, wt = h // t, w // t
        if ht == 0 or wt == 0:
            return 0, 0, 0
        a = lum[: ht * t, : wt * t].reshape(ht, t, wt, t)
        s = a.sum(axis=(1, 3))
        s2 = (a * a).sum(axis=(1, 3))
        n = t * t
        num = n * s2 - s * s  # n^2 * variance, exact
        flat = int((num <= self.thresh * n * n).sum())
        busy = int((num > self.busy * n * n).sum())
        return ht * wt, flat, busy

    def __call__(self, batch: pa.Table) -> pa.Table:
        nt, nf, nb = [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c = self._stats(self.decode(raw))
            nt.append(a)
            nf.append(b)
            nb.append(c)
        return (
            batch.append_column("n_tiles", pa.array(nt, pa.int64()))
            .append_column("n_flat", pa.array(nf, pa.int64()))
            .append_column("n_busy", pa.array(nb, pa.int64()))
        )


class LargestBlob:
    """Actor-pool stage: size and bounding box of the LARGEST
    4-connected bright component (luminance >= ``thresh``) — the
    dominant-object gate that pairs with q269's blob count.  Labels
    come from the same vectorized min-label relaxation (each round a
    4-neighbour minimum, no per-pixel Python); size ties break toward
    the component containing the smallest (y, x) pixel.  Adds
    ``blob_size``, ``blob_bbox_area`` (0, 0 when no foreground)."""

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    def _largest(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        fg = lum >= self.thresh
        if not fg.any():
            return 0, 0
        h, w = fg.shape
        lab = np.where(
            fg, np.arange(h * w, dtype=np.int64).reshape(h, w), -1
        )
        big = np.int64(h * w + 1)
        cur = np.where(fg, lab, big)
        while True:
            nxt = cur.copy()
            nxt[1:, :] = np.minimum(nxt[1:, :], cur[:-1, :])
            nxt[:-1, :] = np.minimum(nxt[:-1, :], cur[1:, :])
            nxt[:, 1:] = np.minimum(nxt[:, 1:], cur[:, :-1])
            nxt[:, :-1] = np.minimum(nxt[:, :-1], cur[:, 1:])
            nxt = np.where(fg, nxt, big)
            if np.array_equal(nxt, cur):
                break
            cur = nxt
        labels = cur[fg]
        uniq, counts = np.unique(labels, return_counts=True)
        # ties: smallest root label == component holding the smallest
        # (y, x) foreground pixel (labels are y*w + x)
        best = uniq[np.lexsort((uniq, -counts))][0]
        ys, xs = np.nonzero(fg & (cur == best))
        bbox = int(ys.max() - ys.min() + 1) * int(xs.max() - xs.min() + 1)
        return int(counts[uniq == best][0]), bbox

    def __call__(self, batch: pa.Table) -> pa.Table:
        sz, bb = [], []
        for raw in batch["bytes"].to_pylist():
            a, b = self._largest(self.decode(raw))
            sz.append(a)
            bb.append(b)
        return batch.append_column(
            "blob_size", pa.array(sz, pa.int64())
        ).append_column("blob_bbox_area", pa.array(bb, pa.int64()))


class HarrisCorners:
    """Actor-pool stage: Harris corner census — the interest-point
    density signal (photos of structured scenes score high, flat
    synthetic fills score near zero).

    Integer pipeline, no floats: Sobel gradients on the interior
    (shifted views, as SobelOrientation), per-pixel products gx²/gxy/gy²
    box-summed over a 3x3 window (shifted-view sums again), response
    R = 20·det(M) − trace(M)² — Harris k = 0.05 cleared to integers by
    scaling det by 20 (k·20 = 1).  All magnitudes bound by
    20·(9·3060²)² < 2^63 for 8-bit 3-channel input.  Adds
    ``n_corner_px`` (R > thresh) and ``max_resp`` (int64).
    """

    def __init__(self, thresh: int = 1 << 38) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = int(thresh)

    def _census(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 5 or w < 5:
            return 0, 0
        tl, tc, tr = lum[:-2, :-2], lum[:-2, 1:-1], lum[:-2, 2:]
        ml, mr = lum[1:-1, :-2], lum[1:-1, 2:]
        bl, bc, br = lum[2:, :-2], lum[2:, 1:-1], lum[2:, 2:]
        gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
        gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
        gxx, gxy, gyy = gx * gx, gx * gy, gy * gy

        def box3(a: np.ndarray) -> np.ndarray:
            return (
                a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
            )

        sxx, sxy, syy = box3(gxx), box3(gxy), box3(gyy)
        resp = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
        return int((resp > self.thresh).sum()), int(resp.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, mx = [], []
        for raw in batch["bytes"].to_pylist():
            n, m = self._census(self.decode(raw))
            ns.append(n)
            mx.append(m)
        return batch.append_column(
            "n_corner_px", pa.array(ns, pa.int64())
        ).append_column("max_resp", pa.array(mx, pa.int64()))


class SsimAudit:
    """Actor-pool stage: integer-exact SSIM audit of a 2x box-downsample
    -> nearest-upsample reconstruction — the perceptual complement to
    q364's absolute-error DownsampleLoss (SSIM weights *structure*, so a
    uniform brightness shift scores high while texture loss scores low).

    Integer discipline: luminance (r+g+b)//3, per 8x8 tile the SSIM
    rational is cleared of means via sums (n=64): with sx=Σx, sxx=Σx²,
    A1 = 2·sx·sy + C1·n², A2 = 2·(n·sxy − sx·sy) + C2·n²,
    B1 = sx² + sy² + C1·n², B2 = (n·sxx − sx²) + (n·syy − sy²) + C2·n²,
    tile SSIM = (A1·A2)/(B1·B2) exactly; stabilizers C1=7, C2=59 are the
    integer roundings of the standard (0.01·255)²/(0.03·255)².  The ppm
    scaling A1·A2·10⁶ exceeds int64, so the finish is per-tile Python
    ints (≤256 tiles/image — bounded, not a per-pixel loop); the tile
    sums themselves are whole-array numpy reductions.  Adds ``n_tiles``,
    ``sum_ssim_ppm``, ``min_ssim_ppm`` (int64).
    """

    C1 = 7
    C2 = 59
    T = 8

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2) // 3
        h, w = lum.shape
        h2, w2 = (h // 2) * 2, (w // 2) * 2
        lum = lum[:h2, :w2]
        T = self.T
        th, tw = h2 // T, w2 // T
        if th == 0 or tw == 0:
            # No full 8x8 tile: min must stay NEUTRAL for the per-format
            # Min aggregate, so emit the SSIM identity value (1.0 in ppm)
            # rather than 0 — a 0 here would read as one tiny image
            # reporting catastrophic structural loss.
            return 0, 0, 1_000_000
        box = (
            lum[0::2, 0::2] + lum[0::2, 1::2] + lum[1::2, 0::2] + lum[1::2, 1::2]
        ) // 4
        rec = np.repeat(np.repeat(box, 2, axis=0), 2, axis=1)
        x = lum[: th * T, : tw * T].reshape(th, T, tw, T)
        y = rec[: th * T, : tw * T].reshape(th, T, tw, T)
        sx = x.sum(axis=(1, 3)).ravel().tolist()
        sy = y.sum(axis=(1, 3)).ravel().tolist()
        sxx = (x * x).sum(axis=(1, 3)).ravel().tolist()
        syy = (y * y).sum(axis=(1, 3)).ravel().tolist()
        sxy = (x * y).sum(axis=(1, 3)).ravel().tolist()
        n = T * T
        nn = n * n
        total = 0
        mn: int | None = None
        for a, b, aa, bb, ab in zip(sx, sy, sxx, syy, sxy):
            a1 = 2 * a * b + self.C1 * nn
            a2 = 2 * (n * ab - a * b) + self.C2 * nn
            b1 = a * a + b * b + self.C1 * nn
            b2 = (n * aa - a * a) + (n * bb - b * b) + self.C2 * nn
            v = (a1 * a2 * 1_000_000) // (b1 * b2)
            total += v
            mn = v if mn is None or v < mn else mn
        return th * tw, total, mn if mn is not None else 1_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        nt, sm, mn = [], [], []
        for raw in batch["bytes"].to_pylist():
            t, s, m = self._census(self.decode(raw))
            nt.append(t)
            sm.append(s)
            mn.append(m)
        return (
            batch.append_column("n_tiles", pa.array(nt, pa.int64()))
            .append_column("sum_ssim_ppm", pa.array(sm, pa.int64()))
            .append_column("min_ssim_ppm", pa.array(mn, pa.int64()))
        )


class TemplateMatch:
    """Actor-pool stage: coarse (stride-4) planted-logo search — minimum
    sum-of-squared-differences between a fixed 8x8 seeded template and
    the luminance plane over a stride-4 grid of positions (the coarse
    pass of classic hierarchical template matching; a fine pass would
    re-search ±3 px around the coarse winner).

    Integer pipeline: luminance (r+g+b)//3 ∈ [0,255], SSD per position
    ≤ 64·255² < 2^23 — the whole SSD map is 64 shifted-strided-view
    accumulations, no per-position loop.  Ties break to the first
    position in row-major order (np.argmin's contract).  Adds
    ``best_y``, ``best_x``, ``best_ssd`` (int64; -1/-1/-1 when the
    image is smaller than the template).
    """

    def __init__(self, seed: int = 397, t: int = 8, stride: int = 4) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.t = int(t)
        self.stride = int(stride)
        rng = np.random.RandomState(seed)
        self.tmpl = rng.randint(0, 256, (self.t, self.t)).astype(np.int64)

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2) // 3
        h, w = lum.shape
        T, S = self.t, self.stride
        if h < T or w < T:
            return -1, -1, -1
        gh = (h - T) // S + 1
        gw = (w - T) // S + 1
        ssd = np.zeros((gh, gw), np.int64)
        for ty in range(T):
            for tx in range(T):
                v = lum[ty : ty + (gh - 1) * S + 1 : S, tx : tx + (gw - 1) * S + 1 : S]
                d = v - self.tmpl[ty, tx]
                ssd += d * d
        k = int(np.argmin(ssd))
        by, bx = divmod(k, gw)
        return by * S, bx * S, int(ssd[by, bx])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ys, xs, ss = [], [], []
        for raw in batch["bytes"].to_pylist():
            y, x, s = self._census(self.decode(raw))
            ys.append(y)
            xs.append(x)
            ss.append(s)
        return (
            batch.append_column("best_y", pa.array(ys, pa.int64()))
            .append_column("best_x", pa.array(xs, pa.int64()))
            .append_column("best_ssd", pa.array(ss, pa.int64()))
        )


_LBP_UNIFORM = np.array(
    [
        c
        for c in range(256)
        if bin((((c << 1) | (c >> 7)) & 0xFF) ^ c).count("1") <= 2
    ],
    dtype=np.int64,
)


class LbpTexture:
    """Actor-pool stage: 8-neighbor local-binary-pattern texture census —
    the rotation-ish texture descriptor (Ojala et al.) complementing
    q283's gradient orientations: LBP sees micro-texture (spots, edges,
    corners as bit patterns), not gradient energy.

    Code per interior pixel: bit i set iff neighbor_i >= center, i
    clockwise from top-left.  ``uniform`` patterns (≤2 circular 0/1
    transitions — the 58 classic codes) are the texture-bearing ones;
    their share separates structured texture from noise.  Whole-array
    pipeline: 8 shifted-view compares OR-ed into a code plane, one
    bincount.  Adds ``n_px``, ``n_uniform`` (int64) and ``hist``
    (fixed 256 int64 list) for exact downstream modal analysis.
    """

    _OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1))

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, np.ndarray]:
        lum = px.astype(np.int64).sum(axis=2) // 3
        h, w = lum.shape
        if h < 3 or w < 3:
            return 0, 0, np.zeros(256, np.int64)
        c = lum[1:-1, 1:-1]
        code = np.zeros(c.shape, np.int64)
        for i, (dy, dx) in enumerate(self._OFFS):
            nb = lum[1 + dy : h - 1 + dy, 1 + dx : w - 1 + dx]
            code |= (nb >= c).astype(np.int64) << i
        hist = np.bincount(code.ravel(), minlength=256).astype(np.int64)
        return int(code.size), int(hist[_LBP_UNIFORM].sum()), hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        np_, nu, hs = [], [], []
        for raw in batch["bytes"].to_pylist():
            n, u, h = self._census(self.decode(raw))
            np_.append(n)
            nu.append(u)
            hs.append(h.tolist())
        return (
            batch.append_column("n_px", pa.array(np_, pa.int64()))
            .append_column("n_uniform", pa.array(nu, pa.int64()))
            .append_column("hist", pa.array(hs, pa.list_(pa.int64())))
        )


class GlcmTexture:
    """Actor-pool stage: gray-level co-occurrence texture census
    (Haralick) — second-order texture statistics that LBP (q399) and
    gradient censuses can't see: LBP encodes LOCAL rank patterns,
    the GLCM measures how often specific gray-level PAIRS co-occur at
    a fixed offset, separating coarse from fine texture at equal edge
    density.

    Luminance (r+g+b)//3 quantized to 16 levels (//16); co-occurrence
    counts over the two canonical offsets (0,1) and (1,0) pooled into
    one 16x16 matrix via a single bincount of packed codes 16*a+b
    (symmetrized by construction order — (a,b) kept directed, matching
    the scalar twin).  Exact integer Haralick features:
    contrast = Σ n_ab (a-b)², energy = Σ n_ab², and homogeneity in ppm
    = Σ (n_ab · 10⁶) // (1 + (a-b)²) — per-cell floor, a fixed integer
    spec (256 bounded cells, numpy-vectorized).  Adds ``n_pairs``,
    ``contrast``, ``energy``, ``homog_ppm`` (int64).
    """

    LEVELS = 16

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        L = self.LEVELS
        a, b = np.divmod(np.arange(L * L, dtype=np.int64), L)
        self._d2 = (a - b) ** 2

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2) // 3
        q = lum // self.LEVELS
        L = self.LEVELS
        codes_h = (q[:, :-1] * L + q[:, 1:]).ravel()
        codes_v = (q[:-1, :] * L + q[1:, :]).ravel()
        n = np.bincount(codes_h, minlength=L * L) + np.bincount(
            codes_v, minlength=L * L
        )
        n = n.astype(np.int64)
        n_pairs = int(n.sum())
        contrast = int((n * self._d2).sum())
        energy = int((n * n).sum())
        homog = int(((n * 1_000_000) // (1 + self._d2)).sum())
        return n_pairs, contrast, energy, homog

    def __call__(self, batch: pa.Table) -> pa.Table:
        np_, ct, en, hg = [], [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c, d = self._census(self.decode(raw))
            np_.append(a)
            ct.append(b)
            en.append(c)
            hg.append(d)
        return (
            batch.append_column("n_pairs", pa.array(np_, pa.int64()))
            .append_column("contrast", pa.array(ct, pa.int64()))
            .append_column("energy", pa.array(en, pa.int64()))
            .append_column("homog_ppm", pa.array(hg, pa.int64()))
        )


class HoughLines:
    """Actor-pool stage: exact-integer Hough line census over the four
    lattice directions — vertical, horizontal and the two diagonals,
    the only angles whose normal form a·x + b·y stays integral with
    a,b ∈ {0,±1} (no trigonometric rounding enters).  Finds the
    strongest straight line through the Sobel edge mask: layout
    detectors (tables, frames, scanned rules) fire on high vote
    fractions, natural scenes stay diffuse.

    Edge mask: Sobel on the summed-channel plane (same kernel as
    HarrisCorners), edge iff gx²+gy² > EDGE_T.  Votes per direction
    are one bincount of the integer rho plane over edge pixels:
    d0 rho=x (vertical), d1 rho=y (horizontal), d2 rho=x+y, d3
    rho=x−y.  Best line = max votes, ties to the smallest (dir, rho).
    Adds ``n_edge_px``, ``best_dir``, ``best_rho``, ``best_votes``
    (int64; -1/-1/0 best when no edge pixels).
    """

    EDGE_T = 1_000_000

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 3 or w < 3:
            return 0, -1, -1, 0
        gx = (
            lum[:-2, 2:] + 2 * lum[1:-1, 2:] + lum[2:, 2:]
            - lum[:-2, :-2] - 2 * lum[1:-1, :-2] - lum[2:, :-2]
        )
        gy = (
            lum[2:, :-2] + 2 * lum[2:, 1:-1] + lum[2:, 2:]
            - lum[:-2, :-2] - 2 * lum[:-2, 1:-1] - lum[:-2, 2:]
        )
        edge = gx * gx + gy * gy > self.EDGE_T
        ys, xs = np.nonzero(edge)
        if len(ys) == 0:
            return 0, -1, -1, 0
        ys = ys + 1  # interior offset
        xs = xs + 1
        best = (-1, 0, 0)  # (votes, -dir, -rho) under max; track manually
        bd, br, bv = -1, -1, 0
        for d, rho in enumerate((xs, ys, xs + ys, xs - ys)):
            off = int(rho.min())
            counts = np.bincount(rho - off)
            v = int(counts.max())
            r = int(np.argmax(counts)) + off  # argmax ties -> smallest rho
            if v > bv:
                bd, br, bv = d, r, v
        return int(len(ys)), bd, br, bv

    def __call__(self, batch: pa.Table) -> pa.Table:
        ne, bd, br, bv = [], [], [], []
        for raw in batch["bytes"].to_pylist():
            a, b, c, d = self._census(self.decode(raw))
            ne.append(a)
            bd.append(b)
            br.append(c)
            bv.append(d)
        return (
            batch.append_column("n_edge_px", pa.array(ne, pa.int64()))
            .append_column("best_dir", pa.array(bd, pa.int64()))
            .append_column("best_rho", pa.array(br, pa.int64()))
            .append_column("best_votes", pa.array(bv, pa.int64()))
        )


class BayerAudit:
    """Actor-pool stage: RGGB Bayer mosaic + integer bilinear demosaic
    round-trip audit — the sensor-pipeline fidelity census: sample the
    RGB image onto the RGGB color-filter grid (R at even/even, G at
    the two mixed parities, B at odd/odd), reconstruct the two missing
    channels per site by the classic bilinear rules (2- or 4-neighbor
    integer mean, floor division), and measure the exact per-channel
    reconstruction SSE over the interior.  Flat fills reconstruct
    perfectly; chroma edges alias — the census separates graphics
    from photographic content by demosaic stress.

    Whole-array implementation: the mosaic is parity-slice assembly,
    each reconstruction rule is a shifted-view sum over one parity
    class (np.select over four parity masks), no per-pixel loop.
    Adds ``n_px`` (interior pixels), ``sse_r``, ``sse_g``, ``sse_b``,
    ``max_err`` (int64).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int, int]:
        p = px.astype(np.int64)
        h, w = p.shape[:2]
        if h < 3 or w < 3:
            return 0, 0, 0, 0, 0
        R, G, B = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        m = np.empty((h, w), np.int64)
        m[0::2, 0::2] = R[0::2, 0::2]
        m[0::2, 1::2] = G[0::2, 1::2]
        m[1::2, 0::2] = G[1::2, 0::2]
        m[1::2, 1::2] = B[1::2, 1::2]

        c = m[1:-1, 1:-1]
        up, down = m[:-2, 1:-1], m[2:, 1:-1]
        left, right = m[1:-1, :-2], m[1:-1, 2:]
        cross = up + down + left + right
        diag = m[:-2, :-2] + m[:-2, 2:] + m[2:, :-2] + m[2:, 2:]
        hpair, vpair = left + right, up + down

        yy, xx = np.indices(c.shape)
        ry, rx = (yy + 1) % 2, (xx + 1) % 2  # absolute parities
        at_r = (ry == 0) & (rx == 0)
        at_b = (ry == 1) & (rx == 1)
        at_g_rrow = (ry == 0) & (rx == 1)
        at_g_brow = (ry == 1) & (rx == 0)

        rec_r = np.select(
            [at_r, at_b, at_g_rrow, at_g_brow],
            [c, diag // 4, hpair // 2, vpair // 2],
        )
        rec_g = np.select(
            [at_r, at_b, at_g_rrow, at_g_brow],
            [cross // 4, cross // 4, c, c],
        )
        rec_b = np.select(
            [at_r, at_b, at_g_rrow, at_g_brow],
            [diag // 4, c, vpair // 2, hpair // 2],
        )
        er = rec_r - R[1:-1, 1:-1]
        eg = rec_g - G[1:-1, 1:-1]
        eb = rec_b - B[1:-1, 1:-1]
        mx = max(int(np.abs(er).max()), int(np.abs(eg).max()),
                 int(np.abs(eb).max()))
        return (
            int(c.size),
            int((er * er).sum()),
            int((eg * eg).sum()),
            int((eb * eb).sum()),
            mx,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        names = ("n_px", "sse_r", "sse_g", "sse_b", "max_err")
        out = batch
        for name, lst in zip(names, cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class HaarFeatures:
    """Actor-pool stage: Viola-Jones-style Haar-like rectangle features
    via ONE integral image — the region-contrast detector family
    (complements q394's point corners and q403's thin lines with BLOCK
    structure: banners, split layouts, letterboxing).

    Features at every position, fixed scale, exact integers over the
    summed-channel plane: 2-rect horizontal (right 8x8 minus left 8x8
    inside an 8x16 window) and 3-rect vertical (top 8x8 + bottom 8x8
    minus 2x middle 8x8 inside a 24x8 window).  Each window sum is 4
    integral-image taps — whole-grid shifted views, no per-window
    loop.  Ties break row-major to the first position (argmax
    contract).  Adds ``n_win2``, ``max_h2`` (max |response|),
    ``n_win3``, ``max_v3`` (int64; 0 when the image is smaller than
    the window).
    """

    B = 8  # block edge

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    @staticmethod
    def _rect_sums(ii: np.ndarray, h: int, w: int, bh: int, bw: int
                   ) -> np.ndarray:
        """Sum of every bh x bw rectangle (top-left grid), via 4 taps."""
        return (
            ii[bh: h + 1, bw: w + 1] - ii[: h - bh + 1, bw: w + 1]
            - ii[bh: h + 1, : w - bw + 1] + ii[: h - bh + 1, : w - bw + 1]
        )

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        B = self.B
        if h < B or w < B:
            return 0, 0, 0, 0
        ii = np.zeros((h + 1, w + 1), np.int64)
        np.cumsum(np.cumsum(lum, axis=0), axis=1, out=ii[1:, 1:])
        rs = self._rect_sums(ii, h, w, B, B)  # (h-B+1, w-B+1) block sums
        n2 = m2 = n3 = m3 = 0
        if w >= 2 * B:
            # right block minus left block, same row
            resp = rs[:, B:] - rs[:, : w - 2 * B + 1]
            n2 = resp.size
            m2 = int(np.abs(resp).max())
        if h >= 3 * B:
            resp = (rs[: h - 3 * B + 1, :] + rs[2 * B:, :]
                    - 2 * rs[B: h - 2 * B + 1, :])
            n3 = resp.size
            m3 = int(np.abs(resp).max())
        return n2, m2, n3, m3

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_win2", "max_h2", "n_win3", "max_v3"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class SkeletonCensus:
    """Actor-pool stage: Zhang-Suen thinning census — iteratively peel
    the Otsu-binarized foreground down to its 1-px skeleton and count
    what survives: line art / text glyphs keep most of their pixels as
    skeleton (high ratio), solid blobs collapse (low ratio) — a shape-
    complexity gate orthogonal to q372's blob size and q344's
    distance transform.

    Binarization: foreground = luminance sum > Otsu threshold over the
    summed-channel histogram (exact integer between-class variance
    argmax, smallest threshold wins ties; foreground must be the
    MINORITY side — if more than half the pixels exceed the threshold
    the polarity flips, so 'ink on paper' and 'paper on ink' skeletal
    equally).  Thinning: classic two-subiteration Zhang-Suen with the
    B(p)∈[2,6] / A(p)=1 / cross-neighbor rules, each subiteration one
    whole-array shifted-view pass.  Adds ``n_fg`` (foreground px),
    ``n_skel`` (skeleton px), ``n_iter`` (full iterations until
    fixpoint; bounded by 256).
    """

    MAX_ITER = 256

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    @staticmethod
    def _otsu(lum: np.ndarray) -> int:
        hist = np.bincount(lum.ravel(), minlength=766).astype(np.int64)
        total = int(lum.size)
        tot_sum = int((np.arange(766, dtype=np.int64) * hist).sum())
        best_t, best_num, best_den = 0, -1, 1
        w0 = 0
        s0 = 0
        for t in range(766):
            w0 += int(hist[t])
            if w0 == 0 or w0 == total:
                continue
            s0 += t * int(hist[t])
            w1 = total - w0
            # between-class variance numerator (exact rational compare)
            num = (s0 * total - tot_sum * w0) ** 2
            den = w0 * w1
            if num * best_den > best_num * den:
                best_t, best_num, best_den = t, num, den
        return best_t

    @classmethod
    def _neighbors(cls, img: np.ndarray):
        """The 8 neighbor planes P2..P9 (clockwise from north) of the
        interior, Zhang-Suen convention."""
        return (
            img[:-2, 1:-1], img[:-2, 2:], img[1:-1, 2:], img[2:, 2:],
            img[2:, 1:-1], img[2:, :-2], img[1:-1, :-2], img[:-2, :-2],
        )

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 3 or w < 3:
            return 0, 0, 0
        t = self._otsu(lum)
        fg = lum > t
        if int(fg.sum()) * 2 > lum.size:
            fg = ~fg
        n_fg = int(fg.sum())
        img = np.zeros((h + 2, w + 2), np.uint8)
        img[1:-1, 1:-1] = fg
        it = 0
        while it < self.MAX_ITER:
            changed = False
            for phase in (0, 1):
                p = self._neighbors(img)
                c = img[1:-1, 1:-1]
                b = sum(x.astype(np.int64) for x in p)
                ring = np.stack([x.astype(np.int64) for x in p]
                                + [p[0].astype(np.int64)])
                a = ((ring[1:] - ring[:-1]) == 1).sum(axis=0)
                if phase == 0:
                    cond = ((p[0] * p[2] * p[4]) == 0) & (
                        (p[2] * p[4] * p[6]) == 0)
                else:
                    cond = ((p[0] * p[2] * p[6]) == 0) & (
                        (p[0] * p[4] * p[6]) == 0)
                kill = (c == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond
                if kill.any():
                    img[1:-1, 1:-1][kill] = 0
                    changed = True
            it += 1
            if not changed:
                break
        return n_fg, int(img.sum()), it

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_fg", "n_skel", "n_iter"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class Colorfulness:
    """Actor-pool stage: Hasler-Süsstrunk-style colorfulness census in
    EXACT integer sums — opponent-channel statistics rg = R−G and
    yb = (R+G)//2 − B, emitted as raw first/second moments so the
    downstream aggregate (and the oracle) can form the variance
    exactly without any square root: grayscale content has all four
    sums ≈ 0, saturated graphics blow up Σrg²/Σyb².  Whole-array
    numpy.  Adds ``n_px``, ``sum_rg``, ``sum_rg2``, ``sum_yb``,
    ``sum_yb2`` (int64).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int, int]:
        p = px.astype(np.int64)
        rg = p[:, :, 0] - p[:, :, 1]
        yb = (p[:, :, 0] + p[:, :, 1]) // 2 - p[:, :, 2]
        return (
            int(rg.size),
            int(rg.sum()), int((rg * rg).sum()),
            int(yb.sum()), int((yb * yb).sum()),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_px", "sum_rg", "sum_rg2", "sum_yb",
                              "sum_yb2"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


_GF_POLY = 0x11D  # x^8+x^4+x^3+x^2+1, the standard RS(255,·) modulus


def _gf_tables() -> tuple[np.ndarray, np.ndarray]:
    exp = np.zeros(512, np.int64)
    log = np.zeros(256, np.int64)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= _GF_POLY
    exp[255:510] = exp[:255]
    return exp, log


class RsParity:
    """Actor-pool stage: Reed-Solomon GF(2^8) parity audit over the
    raw image payload — the storage-integrity complement to q275's
    CRC ledger and q308's Merkle root: RS parity is the ECC actually
    deployed under object stores, and its syndrome census proves the
    GF arithmetic end to end.

    Spec: split the payload bytes into 64-byte data chunks (tail
    partial chunk dropped), append R=8 parity symbols per chunk =
    remainder of data(x)·x^8 mod g(x), g = Π_{i<8}(x−α^i) over
    GF(256)/0x11D.  The polynomial division is sequential in the 64
    byte POSITIONS but whole-array across a payload's chunks
    (log/antilog table lookups — 64 vectorized steps per image).
    Adds ``n_chunks``, ``sum_parity`` (Σ all parity bytes),
    ``xor_parity`` (XOR-fold of all parity bytes, int64).
    """

    CHUNK = 64
    R = 8

    def __init__(self) -> None:
        self.exp, self.log = _gf_tables()
        # generator polynomial g(x), monic, degree R
        g = np.array([1], np.int64)
        for i in range(self.R):
            root = int(self.exp[i])
            nxt = np.zeros(len(g) + 1, np.int64)
            # multiply g by (x - root): shift ^ scale
            nxt[:-1] ^= g
            scaled = np.where(
                g > 0, self.exp[(self.log[g] + self.log[root]) % 255], 0
            )
            nxt[1:] ^= scaled
            g = nxt
        self.gen = g  # g[0] == 1

    def _parity(self, data: np.ndarray) -> np.ndarray:
        """data: (n_chunks, CHUNK) uint8 -> (n_chunks, R) parity."""
        n = data.shape[0]
        rem = np.zeros((n, self.R), np.int64)
        glow = self.gen[1:]  # degree-R monic: divide by trailing coeffs
        glog = self.log[glow]
        gmask = glow > 0
        for j in range(self.CHUNK):
            lead = rem[:, 0] ^ data[:, j].astype(np.int64)
            rem[:, :-1] = rem[:, 1:]
            rem[:, -1] = 0
            nz = lead > 0
            if nz.any():
                ll = self.log[lead[nz]]
                for k in range(self.R):
                    if gmask[k]:
                        rem[nz, k] ^= self.exp[(ll + glog[k]) % 255]
        return rem

    def _census(self, raw: bytes) -> tuple[int, int, int]:
        buf = np.frombuffer(raw, dtype=np.uint8)
        n = len(buf) // self.CHUNK
        if n == 0:
            return 0, 0, 0
        data = buf[: n * self.CHUNK].reshape(n, self.CHUNK)
        par = self._parity(data)
        x = 0
        for v in par.ravel().tolist():
            x ^= v
        return n, int(par.sum()), x

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(raw)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_chunks", "sum_parity", "xor_parity"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class EulerTopology:
    """Actor-pool stage: Euler-number topology census via Gray's quad
    counting — components minus holes of the Otsu foreground (8-
    connected fg / 4-connected bg) from nothing but 2x2 pattern
    counts: E8 = (Q1 − Q3 − 2·QD) / 4, one bincount of packed quad
    codes, no labeling pass — the topological complement to q269's
    blob count and q372's largest blob (a donut and a disk have the
    same area but different Euler number).

    Binarization shares SkeletonCensus's exact-integer Otsu spec
    (minority-side foreground).  Adds ``n_fg``, ``euler8`` (int64).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        t = SkeletonCensus._otsu(lum)
        fg = lum > t
        if int(fg.sum()) * 2 > lum.size:
            fg = ~fg
        n_fg = int(fg.sum())
        img = np.zeros((h + 2, w + 2), np.int64)
        img[1:-1, 1:-1] = fg
        quad = (img[:-1, :-1] * 8 + img[:-1, 1:] * 4
                + img[1:, :-1] * 2 + img[1:, 1:])
        counts = np.bincount(quad.ravel(), minlength=16)
        q1 = int(counts[1] + counts[2] + counts[4] + counts[8])
        q3 = int(counts[7] + counts[11] + counts[13] + counts[14])
        qd = int(counts[6] + counts[9])
        e4 = q1 - q3 - 2 * qd
        assert e4 % 4 == 0
        return n_fg, e4 // 4

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_fg", "euler8"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


_BAYER8 = None


def bayer_matrix(n: int = 8) -> np.ndarray:
    """Classic recursive Bayer ordered-dither matrix (values 0..n²−1)."""
    m = np.array([[0]], np.int64)
    while m.shape[0] < n:
        k = m.shape[0]
        m = np.block([
            [4 * m + 0, 4 * m + 2],
            [4 * m + 3, 4 * m + 1],
        ])
    return m


class OrderedDither:
    """Actor-pool stage: 8x8 Bayer ordered-dither halftoning census —
    quantize luminance to 1 bit through the classic tiled threshold
    matrix and compare against the flat mid-gray threshold: smooth
    gradients flip many pixels (that is the point of dithering —
    spatial dither encodes intermediate tones), hard graphics flip
    none.  The dither comparison is lum·64 vs (2·bayer+1)·765/2 —
    cross-multiplied so everything stays integral: bit = 1 iff
    2·lum·64 > (2·b+1)·765.  Whole-array via np.tile.  Adds
    ``n_px``, ``n_on`` (dithered white count), ``n_flips`` (pixels
    whose dithered bit differs from the flat threshold
    2·lum > 765).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.bayer = bayer_matrix(8)

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        th = np.tile(self.bayer, (h // 8 + 1, w // 8 + 1))[:h, :w]
        on = 2 * lum * 64 > (2 * th + 1) * 765
        flat = 2 * lum > 765
        return int(lum.size), int(on.sum()), int((on != flat).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_px", "n_on", "n_flips"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class ShapeMoments:
    """Actor-pool stage: exact n²-scaled central moments of the Otsu
    foreground — the orientation/elongation shape census (a glyph, a
    banner and a blob separate by second-moment anisotropy long
    before any classifier runs).  Division-free: with S10 = Σx,
    S01 = Σy, the n²-scaled central moments are
    mu20s = n·ΣX² − S10², mu02s = n·ΣY² − S01², mu11s = n·ΣXY −
    S10·S01 — the same clear-the-mean trick as q391's covariance.
    Binarization shares SkeletonCensus's exact Otsu (minority fg).
    Adds ``n_fg``, ``mu20s``, ``mu02s``, ``mu11s`` (int64; zeros for
    an empty foreground).
    """

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        t = SkeletonCensus._otsu(lum)
        fg = lum > t
        if int(fg.sum()) * 2 > lum.size:
            fg = ~fg
        ys, xs = np.nonzero(fg)
        n = len(ys)
        if n == 0:
            return 0, 0, 0, 0
        ys = ys.astype(np.int64)
        xs = xs.astype(np.int64)
        s10, s01 = int(xs.sum()), int(ys.sum())
        s20, s02 = int((xs * xs).sum()), int((ys * ys).sum())
        s11 = int((xs * ys).sum())
        return (
            n,
            n * s20 - s10 * s10,
            n * s02 - s01 * s01,
            n * s11 - s10 * s01,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_fg", "mu20s", "mu02s", "mu11s"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class ByteUniformity:
    """Actor-pool stage: chi-square byte-uniformity audit of the RAW
    payload — how far the encoded byte stream is from uniform(256):
    well-compressed formats sit near the χ² expectation, structured
    or sparse encodings blow up — the no-logarithm stand-in for
    payload entropy (complements q206's encoding stats and q423's
    oracle needs only integers: χ²·N = 256·Σo² − N², exact).
    One bincount per payload.  Adds ``n_bytes``, ``sum_o2``
    (Σ per-byte-value counts squared), ``n_distinct`` (int64).
    """

    def __init__(self) -> None:
        pass

    def _census(self, raw: bytes) -> tuple[int, int, int]:
        buf = np.frombuffer(raw, dtype=np.uint8)
        if len(buf) == 0:
            return 0, 0, 0
        o = np.bincount(buf, minlength=256).astype(np.int64)
        return len(buf), int((o * o).sum()), int((o > 0).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(raw)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_bytes", "sum_o2", "n_distinct"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class RlsaLayout:
    """Actor-pool stage: run-length smearing (RLSA, Wahl-Wong-Casey)
    layout census — fill horizontal background gaps of length ≤ S
    between Otsu-foreground pixels and count how the black-run
    structure collapses: text lines smear into solid bars (few long
    runs), scattered noise stays fragmented — THE classic document-
    layout-analysis primitive, complementing q247's HTML depth with a
    pixel-side layout signal.

    Exact gap rule: a background pixel whose nearest left fg is ld
    away and nearest right fg is rd away (same row) is filled iff
    ld + rd − 1 ≤ S (i.e. it sits in a bounded gap of length ≤ S).
    Distances are computed with S shifted-view passes each side — no
    per-pixel loop.  Adds ``n_fg``, ``n_filled``, ``runs_before``,
    ``runs_after`` (horizontal black-run counts, int64).
    """

    S = 4

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    @staticmethod
    def _runs(mask: np.ndarray) -> int:
        starts = mask & ~np.pad(mask, ((0, 0), (1, 0)))[:, :-1]
        return int(starts.sum())

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        t = SkeletonCensus._otsu(lum)
        fg = lum > t
        if int(fg.sum()) * 2 > lum.size:
            fg = ~fg
        h, w = fg.shape
        S = self.S
        BIG = S + 1
        ld = np.full((h, w), BIG, np.int64)
        rd = np.full((h, w), BIG, np.int64)
        for k in range(1, S + 1):
            left = np.zeros((h, w), bool)
            left[:, k:] = fg[:, :-k]
            np.minimum(ld, np.where(left, k, BIG), out=ld)
            right = np.zeros((h, w), bool)
            right[:, :-k] = fg[:, k:]
            np.minimum(rd, np.where(right, k, BIG), out=rd)
        filled = (~fg) & (ld + rd - 1 <= S)
        smeared = fg | filled
        return (
            int(fg.sum()), int(filled.sum()),
            self._runs(fg), self._runs(smeared),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_fg", "n_filled", "runs_before",
                              "runs_after"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class CannyHysteresis:
    """Actor-pool stage: Canny-style double-threshold + hysteresis edge
    census — strong edges (mag² > HI) seed a flood through weak pixels
    (mag² > LO), so faint but CONNECTED contours survive while isolated
    speckle dies: the edge-quality gate q403's line votes and q283's
    orientation census both build on but never measure.

    Sobel on the summed-channel plane (the HarrisCorners kernel);
    hysteresis as iterative whole-array dilation of the strong mask
    inside the weak mask until fixpoint (≤ diag iterations, each one
    shifted-view OR).  Adds ``n_strong``, ``n_weak`` (weak-or-strong
    count), ``n_kept`` (surviving edge pixels), ``n_iter`` (int64).
    """

    HI = 4_000_000
    LO = 1_000_000

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        if h < 3 or w < 3:
            return 0, 0, 0, 0
        gx = (
            lum[:-2, 2:] + 2 * lum[1:-1, 2:] + lum[2:, 2:]
            - lum[:-2, :-2] - 2 * lum[1:-1, :-2] - lum[2:, :-2]
        )
        gy = (
            lum[2:, :-2] + 2 * lum[2:, 1:-1] + lum[2:, 2:]
            - lum[:-2, :-2] - 2 * lum[:-2, 1:-1] - lum[:-2, 2:]
        )
        mag2 = gx * gx + gy * gy
        strong = mag2 > self.HI
        weak = mag2 > self.LO
        kept = np.zeros((strong.shape[0] + 2, strong.shape[1] + 2), bool)
        kept[1:-1, 1:-1] = strong
        wk = np.zeros_like(kept)
        wk[1:-1, 1:-1] = weak
        it = 0
        while True:
            it += 1
            grow = kept.copy()
            grow[1:, :] |= kept[:-1, :]
            grow[:-1, :] |= kept[1:, :]
            grow[:, 1:] |= kept[:, :-1]
            grow[:, :-1] |= kept[:, 1:]
            grow[1:, 1:] |= kept[:-1, :-1]
            grow[1:, :-1] |= kept[:-1, 1:]
            grow[:-1, 1:] |= kept[1:, :-1]
            grow[:-1, :-1] |= kept[1:, 1:]
            grow &= wk
            if (grow == kept).all():
                break
            kept = grow
        return (
            int(strong.sum()), int(weak.sum()),
            int(kept.sum()), it,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_strong", "n_weak", "n_kept", "n_iter"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class CrackPerimeter:
    """Actor-pool stage: crack-boundary perimeter + isoperimetric
    compactness of the LARGEST 4-connected bright component (same
    threshold-383 foreground and min-label relaxation as LargestBlob)
    — boundary length is the shape signal q372's area and q422's
    moments both miss: a disk and a starburst of equal area differ
    by 10x in perimeter.

    Crack perimeter = number of unit edges between a largest-blob
    pixel and anything else (other components, background, or the
    image border) — two padded-diff counts, no boundary walk.
    Compactness = P²·10⁶ // A exactly (disk ≈ 12.6e6, square 16e6,
    filament ≫).  Adds ``blob_area``, ``blob_perim``, ``compact_ppm``
    (0,0,0 when no foreground).
    """

    def __init__(self, thresh: int = 383) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image
        self.thresh = thresh

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        fg = lum >= self.thresh
        if not fg.any():
            return 0, 0, 0
        h, w = fg.shape
        big = np.int64(h * w + 1)
        cur = np.where(
            fg, np.arange(h * w, dtype=np.int64).reshape(h, w), big
        )
        while True:
            nxt = cur.copy()
            nxt[1:, :] = np.minimum(nxt[1:, :], cur[:-1, :])
            nxt[:-1, :] = np.minimum(nxt[:-1, :], cur[1:, :])
            nxt[:, 1:] = np.minimum(nxt[:, 1:], cur[:, :-1])
            nxt[:, :-1] = np.minimum(nxt[:, :-1], cur[:, 1:])
            nxt = np.where(fg, nxt, big)
            if np.array_equal(nxt, cur):
                break
            cur = nxt
        labels = cur[fg]
        uniq, counts = np.unique(labels, return_counts=True)
        best = uniq[np.lexsort((uniq, -counts))][0]
        m = np.zeros((h + 2, w + 2), bool)
        m[1:-1, 1:-1] = fg & (cur == best)
        perim = int((m[:, 1:] != m[:, :-1]).sum()) + int(
            (m[1:, :] != m[:-1, :]).sum())
        area = int(counts[uniq == best][0])
        return area, perim, perim * perim * 1_000_000 // area

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("blob_area", "blob_perim", "compact_ppm"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class TexturePeriodicity:
    """Actor-pool stage: long-range texture-periodicity census — raw
    integer autocorrelation of the luminance plane at five fixed lags
    ((0,4), (4,0), (4,4), (0,8), (8,0)): tiled/repeating backgrounds
    (wallpaper, watermark grids) light up at their period while GLCM
    (q400, adjacent pairs) and LBP (q399, 1-px ring) stay blind to
    structure beyond 1 px.  Emitted as raw products + overlap counts
    so the downstream normalization is exact.  Each lag is one
    shifted-view multiply-reduce.  Adds ``n_px``, ``sum_x2`` (zero-lag
    reference) and ``ac_h4, ac_v4, ac_d4, ac_h8, ac_v8`` (int64).
    """

    LAGS = ((0, 4), (4, 0), (4, 4), (0, 8), (8, 0))

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        out = [int(lum.size), int((lum * lum).sum())]
        for dy, dx in self.LAGS:
            if h <= dy or w <= dx:
                out.append(0)
                continue
            a = lum[: h - dy, : w - dx]
            b = lum[dy:, dx:]
            out.append(int((a * b).sum()))
        return tuple(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = ("n_px", "sum_x2", "ac_h4", "ac_v4", "ac_d4",
                 "ac_h8", "ac_v8")
        cols = tuple([] for _ in names)
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(names, cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class ByteBigrams:
    """Actor-pool stage: second-order byte-structure census of the RAW
    payload — distinct adjacent byte PAIRS and the modal pair: where
    q423's first-order histogram sees symbol balance, the bigram
    census sees sequential structure (run-length-coded streams reuse
    few pairs, entropy-coded streams cover the 65536 space).  One
    bincount of 16-bit packed codes per payload; modal ties break to
    the smallest code (argmax contract).  Adds ``n_pairs``,
    ``n_distinct_pairs``, ``top_pair``, ``top_count`` (int64;
    -1/0 top for payloads under 2 bytes).
    """

    def __init__(self) -> None:
        pass

    def _census(self, raw: bytes) -> tuple[int, int, int, int]:
        buf = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        if len(buf) < 2:
            return 0, 0, -1, 0
        codes = buf[:-1] * 256 + buf[1:]
        counts = np.bincount(codes, minlength=65536)
        top = int(np.argmax(counts))
        return (
            int(len(codes)), int((counts > 0).sum()),
            top, int(counts[top]),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(raw)):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_pairs", "n_distinct_pairs", "top_pair",
                              "top_count"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class QuadtreeLeaves:
    """Actor-pool stage: quadtree homogeneity decomposition census —
    recursively quarter the luminance plane until a tile is
    homogeneous (max − min ≤ T) or a dimension goes odd: graphics
    collapse into a few large leaves, texture shatters into thousands
    — the classic spatial-complexity measure behind BSP coders and
    mixed-content detection (orthogonal to q365's fixed-grid tile
    variance: the quadtree ADAPTS its tiling).

    Whole-array implementation: min/max pyramids by pairwise
    reduction (one level per halving, no recursion), then a top-down
    mask walk counts leaves per level.  Adds ``n_leaves``,
    ``max_depth`` (deepest split level reached), ``n_px`` (int64).
    """

    T = 24  # summed-channel homogeneity tolerance

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        # quadtree tiles are ASPECT-PRESERVING quarters (h/2^d, w/2^d);
        # the deepest splittable depth is the smaller 2-adic valuation
        # (at that depth one tile dimension is odd or 1 -> forced leaf)
        D = 0
        while h % (1 << (D + 1)) == 0 and w % (1 << (D + 1)) == 0:
            D += 1
        bh, bw = h >> D, w >> D
        g = 1 << D
        base = lum.reshape(g, bh, g, bw)
        mins = [base.min(axis=(1, 3))]  # index k=0 -> finest grid g x g
        maxs = [base.max(axis=(1, 3))]
        while mins[-1].shape[0] > 1:
            m, M = mins[-1], maxs[-1]
            mins.append(np.minimum(
                np.minimum(m[0::2, 0::2], m[0::2, 1::2]),
                np.minimum(m[1::2, 0::2], m[1::2, 1::2])))
            maxs.append(np.maximum(
                np.maximum(M[0::2, 0::2], M[0::2, 1::2]),
                np.maximum(M[1::2, 0::2], M[1::2, 1::2])))
        n_leaves = 0
        max_depth = 0
        active = np.ones((1, 1), dtype=bool)  # root grid
        for depth in range(D + 1):
            k = D - depth  # pyramid index holding this depth's grid
            homog = (maxs[k] - mins[k]) <= self.T
            leaf = active & (homog | (depth == D))
            cnt = int(leaf.sum())
            if cnt:
                n_leaves += cnt
                max_depth = depth
            if depth == D:
                break
            active = np.repeat(np.repeat(active & ~leaf, 2, axis=0),
                               2, axis=1)
        return n_leaves, max_depth, h * w

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_leaves", "max_depth", "n_px"), cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class ExposureClipping:
    """Actor-pool stage: exposure-clipping census — the photographic
    curation gate (blown highlights / crushed shadows / unused dynamic
    range): counts of near-black (lum ≤ 15) and near-white (lum ≥ 750)
    summed-channel pixels plus the nearest-rank p1-p99 used range from
    ONE 766-bin histogram (tap indices (k·(n−1))//100 — a fixed
    integer spec).  Adds ``n_px``, ``n_under``, ``n_over``,
    ``used_range`` (int64).
    """

    UNDER = 15
    OVER = 750

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        n = lum.size
        hist = np.bincount(lum.ravel(), minlength=766)
        cum = hist.cumsum()
        i1 = (1 * (n - 1)) // 100
        i99 = (99 * (n - 1)) // 100
        p1 = int(np.searchsorted(cum, i1 + 1))
        p99 = int(np.searchsorted(cum, i99 + 1))
        return (
            n,
            int(hist[: self.UNDER + 1].sum()),
            int(hist[self.OVER:].sum()),
            p99 - p1,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_px", "n_under", "n_over", "used_range"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class SaturationCensus:
    """Actor-pool stage: channel-spread saturation census — per pixel
    max(R,G,B) − min(R,G,B) (the HSV-free saturation proxy): raw first
    and second moments plus the near-gray count (spread ≤ 8), the
    direct complement to Colorfulness's OPPONENT moments (rg/yb can
    cancel on balanced mixtures where the channel spread cannot).
    Whole-array numpy.  Adds ``n_px``, ``sum_sat``, ``sum_sat2``,
    ``n_gray`` (int64).
    """

    GRAY_T = 8

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int, int]:
        p = px.astype(np.int64)
        sat = p.max(axis=2) - p.min(axis=2)
        return (
            int(sat.size), int(sat.sum()), int((sat * sat).sum()),
            int((sat <= self.GRAY_T).sum()),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_px", "sum_sat", "sum_sat2", "n_gray"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out


class TileDistinct:
    """Actor-pool stage: per-tile distinct-value census — number of
    DISTINCT luminance values inside each 8x8 tile (summed over the
    image, plus the max tile): the quantization-aware complexity
    signal q365's variance misses (a 2-value checkerboard has huge
    variance but distinct=2; smooth gradients have low variance but
    distinct≈64).  Whole-array: sort each tile's 64 values along one
    axis, count strict increases + 1.  Adds ``n_tiles``,
    ``sum_distinct``, ``max_distinct`` (int64).
    """

    T = 8

    def __init__(self) -> None:
        from texrex_ray.sources.images import decode_image

        self.decode = decode_image

    def _census(self, px: np.ndarray) -> tuple[int, int, int]:
        lum = px.astype(np.int64).sum(axis=2)
        h, w = lum.shape
        T = self.T
        th, tw = h // T, w // T
        if th == 0 or tw == 0:
            return 0, 0, 0
        tiles = lum[: th * T, : tw * T].reshape(th, T, tw, T
                                                ).transpose(0, 2, 1, 3
                                                            ).reshape(
            th * tw, T * T)
        srt = np.sort(tiles, axis=1)
        distinct = (np.diff(srt, axis=1) > 0).sum(axis=1) + 1
        return th * tw, int(distinct.sum()), int(distinct.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ([], [], [])
        for raw in batch["bytes"].to_pylist():
            for lst, v in zip(cols, self._census(self.decode(raw))):
                lst.append(v)
        out = batch
        for name, lst in zip(("n_tiles", "sum_distinct", "max_distinct"),
                             cols):
            out = out.append_column(name, pa.array(lst, pa.int64()))
        return out
