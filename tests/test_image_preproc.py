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
