"""Image preprocessing kernels (M7/M8), cv2-free.

Numpy reimplementations of the reference's OpenCV chain
(worker/pipeline/image_preproc.py:17-72): denoise -> contrast (CLAHE)
-> adaptive binarize -> small-noise removal -> deskew, operating on
2-D uint8 grayscale arrays.

Documented deviations from the cv2 originals (semantics preserved,
kernels approximated where the cv2 algorithm is impractical without
the library):
* denoise: 3x3 median filter instead of fastNlMeansDenoisingColored
  (classic speckle denoiser; NL-means needs cv2's optimized patch
  search).
* CLAHE: real clip-limited tile histograms + bilinear interpolation
  between tile mappings (the actual CLAHE algorithm, same clip_limit
  2.0 / 8x8 tiles).
* adaptive binarize: Gaussian-weighted local mean threshold, block 35,
  C 15 — same parameters as cv2.adaptiveThreshold(GAUSSIAN_C).
* deskew: orientation from the second moments (covariance eigenvector)
  of dark pixels instead of cv2.minAreaRect, nearest-neighbor rotation
  with replicated borders instead of INTER_CUBIC warpAffine.

The Ray-side stage (``PreprocWorker``) decodes via PIL when installed
and dead-letters rows otherwise — the kernels themselves are pure
numpy and fully tested in this container.
"""

from __future__ import annotations

import numpy as np


def _sliding(img: np.ndarray, k: int) -> np.ndarray:
    """(H, W, k, k) sliding windows with edge-replicated padding."""
    pad = k // 2
    padded = np.pad(img, pad, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, (k, k))
    return win


def median_denoise(img: np.ndarray, k: int = 3) -> np.ndarray:
    """3x3 median filter (speckle denoise; stands in for NL-means)."""
    return np.median(_sliding(img, k), axis=(-2, -1)).astype(np.uint8)


def clahe(img: np.ndarray, clip_limit: float = 2.0,
          tiles: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Contrast-Limited Adaptive Histogram Equalization: per-tile
    clipped histogram -> CDF mapping, bilinearly interpolated between
    the four surrounding tile mappings per pixel."""
    h, w = img.shape
    ty, tx = tiles
    # per-tile clipped-CDF lookup tables
    luts = np.zeros((ty, tx, 256), dtype=np.float64)
    ys = np.linspace(0, h, ty + 1).astype(int)
    xs = np.linspace(0, w, tx + 1).astype(int)
    for i in range(ty):
        for j in range(tx):
            tile = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
            n = hist.sum()
            if n == 0:
                luts[i, j] = np.arange(256)
                continue
            clip = max(clip_limit * n / 256.0, 1.0)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = cdf / n * 255.0
    # tile centers for interpolation
    cy = (ys[:-1] + ys[1:]) / 2.0
    cx = (xs[:-1] + xs[1:]) / 2.0
    iy = np.clip(np.searchsorted(cy, np.arange(h)) - 1, 0, ty - 2)
    ix = np.clip(np.searchsorted(cx, np.arange(w)) - 1, 0, tx - 2)
    fy = np.clip((np.arange(h) - cy[iy]) / np.maximum(cy[iy + 1] - cy[iy], 1),
                 0, 1)
    fx = np.clip((np.arange(w) - cx[ix]) / np.maximum(cx[ix + 1] - cx[ix], 1),
                 0, 1)
    v = img.astype(np.intp)
    m00 = luts[iy[:, None], ix[None, :], v]
    m01 = luts[iy[:, None], ix[None, :] + 1, v]
    m10 = luts[iy[:, None] + 1, ix[None, :], v]
    m11 = luts[iy[:, None] + 1, ix[None, :] + 1, v]
    fyc = fy[:, None]
    fxc = fx[None, :]
    out = (m00 * (1 - fyc) * (1 - fxc) + m01 * (1 - fyc) * fxc
           + m10 * fyc * (1 - fxc) + m11 * fyc * fxc)
    return np.clip(out, 0, 255).astype(np.uint8)


def _gaussian_blur(img: np.ndarray, block: int) -> np.ndarray:
    """Separable Gaussian blur with sigma derived per cv2's rule
    (sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8), replicated borders."""
    sigma = 0.3 * ((block - 1) * 0.5 - 1) + 0.8
    r = block // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    kern = np.exp(-(x * x) / (2 * sigma * sigma))
    kern /= kern.sum()
    padded = np.pad(img.astype(np.float64), ((0, 0), (r, r)), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, block, axis=1)
    out = win @ kern
    padded = np.pad(out, ((r, r), (0, 0)), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, block, axis=0)
    return win @ kern


def adaptive_binarize(img: np.ndarray, block: int = 35,
                      C: int = 15) -> np.ndarray:
    """Gaussian-weighted local-mean threshold (cv2.adaptiveThreshold
    ADAPTIVE_THRESH_GAUSSIAN_C / THRESH_BINARY, block 35, C 15):
    pixel > local_mean - C -> 255 else 0."""
    local = _gaussian_blur(img, block)
    return np.where(img.astype(np.float64) > local - C, 255, 0) \
        .astype(np.uint8)


def _component_runs(mask: np.ndarray):
    """Label 8-connected components over run-length rows; yields
    (label_root, [(y, x0, x1), ...]) per component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    next_label = 0
    prev: list[tuple[int, int, int]] = []
    runs_by_label: dict[int, list[tuple[int, int, int]]] = {}
    for y in range(mask.shape[0]):
        row = mask[y]
        if not row.any():
            prev = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.flatnonzero(d == 1) + 1)
        ends = list(np.flatnonzero(d == -1) + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(len(row))
        cur = []
        for x0, x1 in zip(starts, ends):
            label = None
            for px0, px1, pl in prev:
                if px0 < x1 + 1 and x0 < px1 + 1:  # 8-connectivity
                    r = find(pl)
                    if label is None:
                        label = r
                    elif r != label:
                        parent[max(r, label)] = min(r, label)
                        label = min(r, label)
            if label is None:
                label = next_label
                parent[label] = label
                next_label += 1
            cur.append((x0, x1, label))
            runs_by_label.setdefault(label, []).append((y, x0, x1))
        prev = cur
    merged: dict[int, list[tuple[int, int, int]]] = {}
    for label, runs in runs_by_label.items():
        merged.setdefault(find(label), []).extend(runs)
    return merged.items()


def remove_small_noise(img: np.ndarray, min_area: int = 30) -> np.ndarray:
    """Whiten dark components smaller than ``min_area`` pixels
    (image_preproc.py:63-72 semantics, 8-connectivity)."""
    mask = img < 128
    out = img.copy()
    for _, runs in _component_runs(mask):
        area = sum(x1 - x0 for _, x0, x1 in runs)
        if area < min_area:
            for y, x0, x1 in runs:
                out[y, x0:x1] = 255
    return out


def estimate_skew_angle(img: np.ndarray) -> float:
    """Skew angle (degrees) of dark content from the principal axis of
    the dark-pixel covariance (minAreaRect stand-in). Positive =
    counter-clockwise content tilt."""
    ys, xs = np.nonzero(img < 128)
    if len(ys) < 2:
        return 0.0
    x = xs - xs.mean()
    y = ys - ys.mean()
    cov_xx = float((x * x).mean())
    cov_yy = float((y * y).mean())
    cov_xy = float((x * y).mean())
    angle = 0.5 * np.degrees(np.arctan2(2 * cov_xy, cov_xx - cov_yy))
    if angle > 45:
        angle -= 90
    elif angle < -45:
        angle += 90
    return float(angle)


def rotate(img: np.ndarray, degrees: float) -> np.ndarray:
    """Nearest-neighbor rotation about the center, replicated borders
    (warpAffine INTER_CUBIC stand-in; exact geometry, cheaper
    resampling)."""
    h, w = img.shape
    theta = np.radians(degrees)
    c, s = np.cos(theta), np.sin(theta)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sx = c * (xx - cx) + s * (yy - cy) + cx
    sy = -s * (xx - cx) + c * (yy - cy) + cy
    sxi = np.clip(np.rint(sx).astype(int), 0, w - 1)
    syi = np.clip(np.rint(sy).astype(int), 0, h - 1)
    return img[syi, sxi]


def deskew(img: np.ndarray) -> np.ndarray:
    """Estimate and undo the dominant skew (image_preproc.py:28-44)."""
    return rotate(img, -estimate_skew_angle(img))


def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's between-class-variance-maximizing global threshold
    (cv2.THRESH_OTSU stand-in, straight from the histogram)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    w = hist.cumsum()
    total = w[-1]
    if total == 0:
        return 127
    mu = (hist * np.arange(256)).cumsum()
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        # sigma_B^2(t) proportional to (mu_T w(t) - mu(t) N)^2 / (w (N-w))
        between = (mu_t * w - mu * total) ** 2 / (w * (total - w))
    between[~np.isfinite(between)] = -1.0
    return int(np.argmax(between[:-1]))


def estimate_skew_angle_projection(img: np.ndarray,
                                   max_angle: float = 10.0,
                                   steps: int = 100) -> float:
    """Radon-projection skew estimate (M8 extra; reference
    image_enhancer.py:139-156): Otsu-binarize inverse, dilate text
    lines with a 5x1 vertical kernel, then over ``steps`` angles in
    [-max_angle, max_angle) find the rotation maximizing the sum of
    squared horizontal-projection bins — text lines aligned with the
    projection axis concentrate mass into few bins, peaking the
    sum-of-squares exactly like the reference's
    ``sum(sinogram[:, i]**2)``. Projection computed directly from
    dark-pixel coordinates (y' = y·cos θ − x·sin θ histogram), no
    image resampling per angle — more robust than the covariance
    method on sparse text."""
    thr = otsu_threshold(img)
    binary = (img <= thr)
    # 5x1 vertical dilation (reference's np.ones((5,1)) kernel):
    # OR of shifts -2..+2 along rows
    d = binary.copy()
    for s in (-2, -1, 1, 2):
        shifted = np.zeros_like(binary)
        if s > 0:
            shifted[s:] = binary[:-s]
        else:
            shifted[:s] = binary[-s:]
        d |= shifted
    binary = d
    ys, xs = np.nonzero(binary)
    if len(ys) < 16:
        return 0.0
    y = ys.astype(np.float64)
    x = xs.astype(np.float64)
    thetas = np.linspace(-max_angle, max_angle, steps, endpoint=False)
    best_theta, best_score = 0.0, -1.0
    diag = int(np.ceil(np.hypot(img.shape[0], img.shape[1]))) + 2
    for t in thetas:
        rad = np.radians(t)
        proj = y * np.cos(rad) - x * np.sin(rad)
        hist = np.bincount(
            np.clip(np.rint(proj).astype(np.int64) + diag, 0, 2 * diag),
            minlength=2 * diag + 1)
        score = float((hist.astype(np.float64) ** 2).sum())
        if score > best_score:
            best_score, best_theta = score, float(t)
    return best_theta


def deskew_projection(img: np.ndarray, min_angle: float = 0.5,
                      max_correct: float = 20.0) -> np.ndarray:
    """Projection-based deskew with the reference's gating
    (image_enhancer.py:150-161): rotations under ``min_angle`` pass
    through (likely not skewed); corrections are applied only when the
    magnitude is in (min_angle, max_correct). Rotation keeps the input
    canvas (replicated borders) — documented deviation from the
    reference's canvas expansion, same convention as ``deskew``."""
    rotation = estimate_skew_angle_projection(img)
    if abs(rotation) < min_angle or abs(rotation) >= max_correct:
        return img
    # undo the measured rotation (an image skewed by rotate(img, +d)
    # measures +d and must be rotated by -d — calibrated by test)
    return rotate(img, -rotation)


def _area_reduce_axis(img: np.ndarray, out_n: int, axis: int) -> np.ndarray:
    """Exact pixel-area-weighted average along one axis (the
    cv2.INTER_AREA downscale semantics): treat pixels as unit-width
    constant segments, integrate over each output cell via the
    piecewise-linear cumulative integral (np.interp — fully
    vectorized), divide by cell width."""
    a = np.moveaxis(np.asarray(img, dtype=np.float64), axis, 0)
    n = a.shape[0]
    flat = a.reshape(n, -1)
    cs = np.concatenate([np.zeros((1, flat.shape[1])),
                         np.cumsum(flat, axis=0)])
    edges = np.linspace(0.0, float(n), out_n + 1)
    # F at fractional edges: same index/weight vector for every column
    idx = np.clip(np.floor(edges).astype(np.int64), 0, n - 1)
    frac = edges - idx
    f = cs[idx] + frac[:, None] * (cs[idx + 1] - cs[idx])
    cell = (n / out_n)
    out = (f[1:] - f[:-1]) / cell
    return np.moveaxis(out.reshape((out_n,) + a.shape[1:]), 0, axis)


def area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Downscale a 2-D (or 2-D + channel) uint8 image by exact area
    averaging — cv2.INTER_AREA semantics, pure numpy. Intended for
    downscaling; upscaling degenerates to box interpolation."""
    out = _area_reduce_axis(img, out_h, 0)
    out = _area_reduce_axis(out, out_w, 1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def downscale_max_dim(img: np.ndarray, target: int = 1600) -> np.ndarray:
    """M10 fast-mode downscale (reference
    worker/document_processor.py:406-424): when the longest side
    exceeds ``target`` px, scale so it equals ``target`` (aspect
    preserved, INTER_AREA averaging); smaller images pass through
    untouched. Same rounding as the reference: int(dim * scale)."""
    h, w = img.shape[:2]
    max_dim = max(h, w)
    if max_dim <= target:
        return img
    scale = target / float(max_dim)
    return area_resize(img, int(h * scale), int(w * scale))


def preprocess_image(img: np.ndarray) -> np.ndarray:
    """The full reference chain (image_preproc.py:17-26): denoise ->
    CLAHE contrast -> adaptive binarize -> small-noise removal ->
    deskew, on a 2-D uint8 grayscale array."""
    img = median_denoise(img)
    img = clahe(img)
    img = adaptive_binarize(img)
    img = remove_small_noise(img)
    return deskew(img)


class PreprocWorker:
    """Actor-pool stage: (id, image:binary) -> preprocessed PNG bytes.
    Needs PIL for decode/encode; rows dead-letter with a clear error
    when it's absent (kernels above stay testable without it)."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def __call__(self, batch):
        import pyarrow as pa
        ids = batch["id"].to_pylist()
        payloads = batch["image"].to_pylist()
        out_id, out_img, out_err = [], [], []
        for i, payload in zip(ids, payloads):
            if not self._pil:
                out_id.append(i)
                out_img.append(None)
                out_err.append("NotImplementedError: image decode "
                               "requires pillow")
                continue
            try:
                import io

                from PIL import Image
                arr = np.array(Image.open(io.BytesIO(payload)).convert("L"))
                buf = io.BytesIO()
                Image.fromarray(preprocess_image(arr)).save(buf, "PNG")
                out_id.append(i)
                out_img.append(buf.getvalue())
                out_err.append(None)
            except Exception as exc:  # noqa: BLE001 — dead-letter per row
                out_id.append(i)
                out_img.append(None)
                out_err.append(f"{type(exc).__name__}: {exc}")
        return pa.table({"id": pa.array(out_id, pa.string()),
                         "image": pa.array(out_img, pa.binary()),
                         "error": pa.array(out_err, pa.string())})


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, pure numpy (cv2.INTER_LINEAR semantics: source
    coordinates at half-pixel centers, edge clamp). Complements
    ``area_resize`` (the downscale kernel) for the UPSCALE direction —
    two gathers per axis and three lerps, fully vectorized."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)
    fx = np.clip(xs - x0, 0.0, 1.0)
    if a.ndim == 3:
        fy = fy[:, None, None]
        fx = fx[None, :, None]
    else:
        fy = fy[:, None]
        fx = fx[None, :]
    top = a[y0][:, x0] * (1.0 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1.0 - fx) + a[y1][:, x1] * fx
    out = top * (1.0 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def upscale_small(img: np.ndarray, min_dim: int = 1000,
                  factor: int = 2) -> np.ndarray:
    """M8 optional upscale (reference
    worker/pipeline/processors/image_enhancer.py:474-509): images whose
    longest side is under ``min_dim`` px are enlarged ``factor``x before
    OCR so small scans get enough pixels per glyph; larger images pass
    through untouched. The reference's optional super-resolution model
    is replaced by deterministic bilinear interpolation — same gate,
    same shape contract, no model weights (documented stub boundary,
    same policy as the OCR engine adapters)."""
    h, w = img.shape[:2]
    if max(h, w) >= min_dim:
        return img
    return bilinear_resize(img, h * factor, w * factor)
