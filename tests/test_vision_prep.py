"""V-tier preprocessing ports (deepdoc/vision/operators.py), cv2-free."""

import numpy as np
import pytest

from ragflow_spark.core import vision_prep as V


def test_standardize_image_mean_std():
    im = np.full((2, 2, 3), 255, dtype=np.uint8)
    out = V.standardize_image(im, [0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    assert out.dtype == np.float32
    assert np.allclose(out, 1.0)  # (1.0 - 0.5) / 0.5
    out2 = V.standardize_image(im, [0, 0, 0], [1, 1, 1], is_scale=False,
                               norm_type="none")
    assert np.allclose(out2, 255.0)


def test_normalize_image_orders():
    im = np.ones((4, 4, 3), dtype=np.uint8) * 128
    chw_params = V.normalize_image(im, order="hwc")
    expected = (128 / 255.0 - np.array(V.IMAGENET_MEAN)) / np.array(
        V.IMAGENET_STD)
    assert np.allclose(chw_params[0, 0], expected, atol=1e-6)


def test_to_chw_and_pad():
    im = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    chw = V.to_chw(im)
    assert chw.shape == (3, 2, 3)
    padded = V.pad_to(im, size_div=32)
    assert padded.shape == (32, 32, 3)
    assert np.allclose(padded[:2, :3], im)
    assert padded[5, 5, 0] == 0
    with pytest.raises(ValueError):
        V.pad_to(im, size=(1, 1))


def test_generate_scale_matches_reference_rule():
    # 100x200 to target 800(/1333 cap default shape): min-side fit
    sy, sx = V.generate_scale((100, 200), [800, 800])
    # min side 100 -> scale 8, but max side 200*8=1600 > 800 -> cap 4
    assert sy == sx == 4.0
    sy2, sx2 = V.generate_scale((100, 200), [400, 800], keep_ratio=False)
    assert (sy2, sx2) == (4.0, 4.0)


def test_bilinear_identity_and_downscale():
    im = np.random.default_rng(7).uniform(0, 255, (8, 8, 3)).astype(
        np.float32)
    same = V._bilinear(im, 8, 8)
    assert np.allclose(same, im, atol=1e-4)  # identity at same size
    half = V._bilinear(im, 4, 4)
    assert half.shape == (4, 4, 3)
    # downscale result stays within the input's value range
    assert half.min() >= im.min() - 1e-4 and half.max() <= im.max() + 1e-4


def test_detector_input_chain():
    im = np.random.default_rng(3).integers(0, 255, (100, 150, 3)).astype(
        np.uint8)
    tensor, im_info = V.detector_input(im, target_size=96)
    # CHW, padded to the 32-grid
    assert tensor.ndim == 3 and tensor.shape[0] == 3
    assert tensor.shape[1] % 32 == 0 and tensor.shape[2] % 32 == 0
    assert im_info["scale_factor"].dtype == np.float32
    sy, sx = im_info["scale_factor"]
    assert sy == sx  # keep_ratio
    # min-side fit 96/100=0.96 overflows the max side (150*0.96=144>96),
    # so the cap 96/150 applies — the reference's exact rule
    assert abs(sy - 0.64) < 1e-6
