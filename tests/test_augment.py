"""M20 pixel augmentation kernels (functions/augment.py; reference
Scripts/augument_img.py:36-155) — numpy-first, so every property is
testable in this container."""

from __future__ import annotations

import numpy as np
import pytest

from deepseek_ocr_customvllm_ray.functions.augment import (
    AUGMENT_FAMILIES,
    add_shadow_gradient_array,
    apply_perspective_array,
    augment_page_array,
    horizontal_motion_blur_array,
    motion_blur_array,
    perspective_coeffs,
    random_perspective_array,
    rotate_with_crop_array,
)


def _page(w=120, h=90, seed=7):
    rng = np.random.default_rng(seed)
    arr = np.full((h, w, 3), 255, dtype=np.uint8)
    # black text-like strokes so warps/blur have structure to move
    for _ in range(12):
        y = int(rng.integers(5, h - 5))
        x0, x1 = sorted(rng.integers(5, w - 5, size=2))
        arr[y, x0:x1] = 0
    return arr


class TestMotionBlur:
    def test_constant_image_invariant(self):
        arr = np.full((20, 40, 3), 128, dtype=np.uint8)
        assert np.array_equal(horizontal_motion_blur_array(arr, k=15), arr)

    def test_exact_box_average(self):
        # single black column on white: blurred row value = exact box mean
        arr = np.full((5, 21, 3), 255, dtype=np.uint8)
        arr[:, 10] = 0
        out = horizontal_motion_blur_array(arr, k=5)
        # at the impulse: (4*255 + 0)/5 = 204
        assert out[2, 10, 0] == 204
        assert out[2, 0, 0] == 255  # far from the impulse: untouched

    def test_k_below_3_is_identity_and_even_k_promoted(self):
        arr = _page()
        assert horizontal_motion_blur_array(arr, k=2) is arr
        assert np.array_equal(
            horizontal_motion_blur_array(arr, k=4),
            horizontal_motion_blur_array(arr, k=5),
        )

    def test_directional_blur_shape_and_smoothing(self):
        arr = _page()
        out = motion_blur_array(arr, k=13, angle_deg=10.0)
        assert out.shape == arr.shape
        # blur caps the steepest edge: a k-box spreads a 255 step over k
        # pixels (peak adjacent difference ~255/k, resampling slack allowed)
        peak = np.abs(np.diff(out.astype(np.int64), axis=1)).max()
        assert peak < 128
        assert np.abs(np.diff(arr.astype(np.int64), axis=1)).max() == 255


class TestShadow:
    def test_deterministic_in_seed(self):
        arr = _page()
        a = add_shadow_gradient_array(arr, 0.35, seed=3)
        b = add_shadow_gradient_array(arr, 0.35, seed=3)
        c = add_shadow_gradient_array(arr, 0.35, seed=4)
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_darkens_monotonically_with_strength(self):
        arr = np.full((30, 30, 3), 200, dtype=np.uint8)
        m1 = add_shadow_gradient_array(arr, 0.2, seed=1).mean()
        m2 = add_shadow_gradient_array(arr, 0.5, seed=1).mean()
        assert m2 < m1 < 200

    def test_mask_bounded(self):
        arr = np.full((30, 30, 3), 200, dtype=np.uint8)
        out = add_shadow_gradient_array(arr, 0.4, seed=2)
        assert out.max() <= 200
        assert out.min() >= int(200 * 0.6) - 1  # 1-strength floor


class TestPerspective:
    def test_identity_coeffs_are_identity(self):
        corners = [(0, 0), (100, 0), (100, 80), (0, 80)]
        coeffs = perspective_coeffs(corners, corners)
        np.testing.assert_allclose(
            coeffs, [1, 0, 0, 0, 1, 0, 0, 0], atol=1e-9
        )
        arr = _page(100, 80)
        assert np.array_equal(apply_perspective_array(arr, coeffs), arr)

    def test_translation_coeffs_shift_content(self):
        # output->input mapping with c=+10 samples 10 px to the right
        arr = np.full((20, 40, 3), 255, dtype=np.uint8)
        arr[:, 30] = 0
        out = apply_perspective_array(arr, [1, 0, 10, 0, 1, 0, 0, 0])
        assert out[10, 20, 0] == 0
        assert out[10, 30, 0] == 255

    def test_random_perspective_deterministic(self):
        arr = _page()
        a = random_perspective_array(arr, 0.06, seed=5)
        b = random_perspective_array(arr, 0.06, seed=5)
        c = random_perspective_array(arr, 0.06, seed=6)
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.shape == arr.shape


class TestRotate:
    def test_zero_angle_keeps_content(self):
        arr = _page()
        out = rotate_with_crop_array(arr, 0.0, crop_ratio=1.0)
        # identity geometry: only the bilinear resample at integer grid,
        # which is exact -> arrays equal
        assert np.array_equal(out, arr)

    def test_shape_preserved_and_rotation_moves_content(self):
        arr = _page()
        out = rotate_with_crop_array(arr, 2.0)
        assert out.shape == arr.shape
        assert not np.array_equal(out, arr)

    def test_ninety_degrees_matches_rot90(self):
        # square image, full crop: 90° CCW == np.rot90 exactly (grid-aligned)
        arr = _page(64, 64)
        out = rotate_with_crop_array(arr, 90.0, crop_ratio=1.0)
        assert np.array_equal(out, np.rot90(arr))


class TestFamilies:
    def test_all_reference_severities_run_and_are_deterministic(self):
        arr = _page()
        for family, levels in AUGMENT_FAMILIES.items():
            for sev in range(len(levels)):
                a = augment_page_array(arr, family, severity=sev, seed=11)
                b = augment_page_array(arr, family, severity=sev, seed=11)
                assert a.shape == arr.shape, (family, sev)
                assert np.array_equal(a, b), (family, sev)

    def test_unknown_family_raises(self):
        with pytest.raises(KeyError):
            augment_page_array(_page(), "sepia")
