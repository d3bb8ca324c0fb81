"""Image-preprocessing kernel tests (M7/M8, cv2-free numpy)."""

import numpy as np
import pytest

from ocr_model_ray.stages.image_preproc import (
    PreprocWorker, adaptive_binarize, clahe, deskew, estimate_skew_angle,
    median_denoise, preprocess_image, remove_small_noise, rotate)


def test_median_denoise_kills_salt_pepper():
    rng = np.random.RandomState(0)
    img = np.full((60, 80), 200, dtype=np.uint8)
    ys, xs = rng.randint(0, 60, 40), rng.randint(0, 80, 40)
    img[ys, xs] = 0  # isolated pepper
    out = median_denoise(img)
    assert (out == 200).mean() > 0.999


def test_clahe_expands_low_contrast_range():
    rng = np.random.RandomState(1)
    img = rng.randint(100, 120, size=(128, 128)).astype(np.uint8)
    out = clahe(img)
    assert out.dtype == np.uint8
    # clip_limit=2.0 bounds amplification to ~2x + redistribution
    assert out.max() - out.min() > (img.max() - img.min()) * 2
    # near-monotone along a ramp (tile-boundary interpolation may
    # wobble by a count or two, never reverse the ordering broadly)
    flat = clahe(np.tile(np.arange(256, dtype=np.uint8), (256, 1)))
    assert (np.diff(flat[128].astype(int)) >= -2).all()


def test_adaptive_binarize_handles_gradient_background():
    # dark text on a strong illumination gradient defeats a global
    # threshold; the local threshold keeps text dark, background white
    grad = np.tile(np.linspace(80, 240, 200).astype(np.uint8), (100, 1))
    img = grad.copy()
    img[40:44, 20:60] = 30    # stroke in the dark half
    img[40:44, 150:190] = 100  # stroke in the bright half
    out = adaptive_binarize(img)
    assert (out[42, 25:55] == 0).all()
    assert (out[42, 155:185] == 0).all()
    assert (out[10, 5:195] == 255).mean() > 0.95


def test_remove_small_noise_keeps_large_components():
    img = np.full((100, 100), 255, dtype=np.uint8)
    img[10:12, 10:13] = 0          # 6 px speck -> removed
    img[50:60, 20:80] = 0          # 600 px block -> kept
    out = remove_small_noise(img, min_area=30)
    assert (out[10:12, 10:13] == 255).all()
    assert (out[50:60, 20:80] == 0).all()


@pytest.mark.parametrize("true_angle", [-6.0, -2.5, 3.0, 8.0])
def test_deskew_recovers_known_rotation(true_angle):
    img = np.full((200, 300), 255, dtype=np.uint8)
    for y in range(40, 170, 18):   # horizontal text-line pattern
        img[y:y + 3, 30:270] = 0
    tilted = rotate(img, true_angle)
    est = estimate_skew_angle(tilted)
    assert abs(est - true_angle) < 1.0
    fixed = deskew(tilted)
    assert abs(estimate_skew_angle(fixed)) < 0.5


def test_preprocess_chain_outputs_binary_uint8():
    rng = np.random.RandomState(2)
    img = rng.randint(90, 170, size=(120, 160)).astype(np.uint8)
    img[30:34, 20:140] = 20
    out = preprocess_image(img)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert set(np.unique(out)) <= {0, 255}


def test_preproc_worker_dead_letters_without_pil():
    import pyarrow as pa
    w = PreprocWorker()
    batch = pa.table({"id": pa.array(["a"], pa.string()),
                      "image": pa.array([b"\x89PNG\r\n\x1a\nxxxx"],
                                        pa.binary())})
    out = w(batch)
    assert out.num_rows == 1
    err = out["error"][0].as_py()
    if w._pil:
        # PIL present: a garbage PNG still dead-letters, never raises
        assert err is None or err
    else:
        assert "pillow" in err


def test_area_resize_integer_block_mean():
    """Exact 2x downscale must equal the 2x2 block mean (INTER_AREA
    semantics)."""
    from ocr_model_ray.stages.image_preproc import area_resize
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = area_resize(img, 2, 2)
    want = np.rint(img.reshape(2, 2, 2, 2).mean(axis=(1, 3)))
    assert (out == want).all()


def test_area_resize_constant_and_mean_preserving():
    from ocr_model_ray.stages.image_preproc import area_resize
    c = np.full((37, 53), 77, dtype=np.uint8)
    assert set(np.unique(area_resize(c, 10, 17))) == {77}
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (320, 240), dtype=np.uint8)
    # area averaging conserves the integral up to rounding
    assert abs(float(img.mean())
               - float(area_resize(img, 32, 24).astype(float).mean())) < 1.0


def test_downscale_max_dim_reference_semantics():
    """M10 (document_processor.py:406-424): cap longest side at target
    with int(dim*scale) rounding; smaller images pass through
    UNTOUCHED (same object)."""
    from ocr_model_ray.stages.image_preproc import downscale_max_dim
    big = np.zeros((3200, 2400), dtype=np.uint8)
    out = downscale_max_dim(big, target=1600)
    assert out.shape == (1600, 1200)
    wide = np.zeros((100, 4000), dtype=np.uint8)
    out = downscale_max_dim(wide, target=1600)
    assert out.shape == (int(100 * 1600 / 4000), 1600)
    small = np.zeros((100, 80), dtype=np.uint8)
    assert downscale_max_dim(small, target=1600) is small


def test_fast_downscale_ocr_passthrough_without_pil():
    """fast-mode OCR wrapper: without PIL the payload reaches the base
    engine unchanged (the reference's except-fallback), and the wrapped
    engine output equals the unwrapped one."""
    from ocr_model_ray.stages.engines import fast_downscale_ocr
    from ocr_model_ray.spec import ocr_stub
    payload = b"\x89PNG\r\n\x1a\nnot really an image"
    wrapped = fast_downscale_ocr(ocr_stub)
    assert wrapped(payload) == ocr_stub(payload)


def test_otsu_threshold_separates_bimodal():
    from ocr_model_ray.stages.image_preproc import otsu_threshold
    rng = np.random.RandomState(4)
    img = np.concatenate([rng.randint(10, 40, 5000),
                          rng.randint(200, 240, 5000)]) \
        .astype(np.uint8).reshape(100, 100)
    t = otsu_threshold(img)
    # threshold is inclusive for class 0 ([0..t]): anything from the
    # low cluster's top (39) to below the high cluster separates
    assert 39 <= t < 200


def test_projection_deskew_recovers_known_rotation():
    """M8 extra (image_enhancer.py:139-161): the Radon-projection
    estimator must recover a known synthetic rotation of a lined page
    to the search grid's resolution, and deskew_projection must undo
    it; near-straight pages pass through UNTOUCHED (same object)."""
    from ocr_model_ray.stages.image_preproc import (
        deskew_projection, estimate_skew_angle_projection, rotate)
    img = np.full((400, 600), 255, dtype=np.uint8)
    for y in range(40, 360, 30):
        img[y:y + 4, 40:560] = 0
    for true_angle in (3.0, -4.2):
        skewed = rotate(img, true_angle)
        est = estimate_skew_angle_projection(skewed)
        assert abs(est - true_angle) <= 0.25
        fixed = deskew_projection(skewed)
        assert abs(estimate_skew_angle_projection(fixed)) < 0.5
    assert deskew_projection(img) is img


def test_projection_deskew_gates_extreme_angles():
    """Corrections outside (0.5, 20) degrees pass through — the
    reference's significant-but-not-extreme gate."""
    from ocr_model_ray.stages.image_preproc import deskew_projection
    blank = np.full((50, 50), 255, dtype=np.uint8)
    assert deskew_projection(blank) is blank


def test_bilinear_resize_identity_and_interpolation():
    """Same-size resize is the identity; a 2x upscale of a linear ramp
    stays monotone with interior values interpolated between the source
    samples; channel images broadcast."""
    from ocr_model_ray.stages.image_preproc import bilinear_resize

    ramp = np.tile(np.arange(0, 250, 10, dtype=np.uint8), (4, 1))
    assert np.array_equal(bilinear_resize(ramp, *ramp.shape), ramp)

    up = bilinear_resize(ramp, 8, 50)
    assert up.shape == (8, 50)
    assert (np.diff(up[0].astype(int)) >= 0).all()          # monotone
    assert up[0, 0] == ramp[0, 0] and up[-1, -1] == ramp[-1, -1]
    # interior output samples land strictly between source neighbors
    mid = up[0, 1:-1].astype(int)
    assert mid.min() >= int(ramp[0, 0]) and mid.max() <= int(ramp[0, -1])

    rgb = np.dstack([ramp, ramp[:, ::-1], ramp])
    up3 = bilinear_resize(rgb, 8, 50)
    assert up3.shape == (8, 50, 3)
    assert np.array_equal(up3[..., 0], up)                  # per-channel


def test_upscale_small_gate():
    """Only images under the min_dim gate are enlarged (reference
    image_enhancer.py:474-509 semantics: small scans get 2x pixels,
    big ones pass through)."""
    from ocr_model_ray.stages.image_preproc import upscale_small

    small = np.full((120, 80), 128, np.uint8)
    up = upscale_small(small, min_dim=200)
    assert up.shape == (240, 160)
    assert int(up.mean()) == 128                            # flat stays flat

    big = np.zeros((300, 100), np.uint8)
    assert upscale_small(big, min_dim=200) is big
