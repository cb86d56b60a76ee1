"""Tiling / token-accounting parity (SURVEY §2.3 M3/M4/M7)."""

from deepseek_ocr_customvllm_ray.functions import tiling


class TestCountTiles:
    def test_small_image_not_applicable(self):
        # images <=640x640 bypass count_tiles entirely (grid [1,1] in
        # num_image_tokens); count_tiles itself still returns a valid grid
        assert tiling.count_tiles(640, 640) in tiling.candidate_ratios()

    def test_candidate_grid_products(self):
        ratios = tiling.candidate_ratios()
        assert all(2 <= i * j <= 6 for i, j in ratios)
        assert ratios == sorted(ratios, key=lambda x: x[0] * x[1])

    def test_wide_image_prefers_wide_grid(self):
        i, j = tiling.count_tiles(2000, 700)
        assert i > j

    def test_tall_image_prefers_tall_grid(self):
        i, j = tiling.count_tiles(700, 2000)
        assert j > i

    def test_square_large(self):
        assert tiling.count_tiles(1280, 1280) in {(1, 2), (2, 1), (2, 2)}

    def test_deterministic(self):
        assert tiling.count_tiles(1234, 987) == tiling.count_tiles(1234, 987)


class TestNumImageTokens:
    def test_small_image_global_only(self):
        # h=w=ceil((1024/16)/4)=16 -> global 16*17=272, no local, +1
        assert tiling.num_image_tokens(640, 640) == 16 * 17 + 1

    def test_no_cropping(self):
        assert tiling.num_image_tokens(3000, 3000, cropping=False) == 16 * 17 + 1

    def test_tiled_adds_local(self):
        n = tiling.num_image_tokens(1280, 1280)
        i, j = tiling.count_tiles(1280, 1280)
        expect = 16 * 17 + (j * 10) * (i * 10 + 1) + 1
        assert n == expect
        assert n > 16 * 17 + 1


class TestPrepDims:
    def test_deskew_passthrough(self):
        assert tiling.deskew_dims(800, 600) == (800, 600)

    def test_margin_crop(self):
        assert tiling.crop_margin_dims(800, 600) == (680, 480)

    def test_degenerate_crop_skipped(self):
        assert tiling.crop_margin_dims(100, 90) == (100, 90)


class TestImageTransform:
    """M6 contract: ToTensor + Normalize re-expressed in numpy."""

    def test_layout_and_dtype(self):
        import numpy as np

        px = np.random.default_rng(0).integers(0, 256, (5, 7, 3), dtype=np.uint8)
        x = tiling.image_transform(px)
        assert x.shape == (3, 5, 7) and x.dtype == np.float32

    def test_default_maps_to_minus1_1(self):
        import numpy as np

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        assert np.allclose(tiling.image_transform(px), -1.0)
        px[:] = 255
        assert np.allclose(tiling.image_transform(px), 1.0)
        px[:] = 128
        expect = (128 / 255 - 0.5) / 0.5
        assert np.allclose(tiling.image_transform(px), expect, atol=1e-6)

    def test_no_normalize_is_unit_range(self):
        import numpy as np

        px = np.full((2, 2, 3), 51, dtype=np.uint8)
        x = tiling.image_transform(px, normalize=False)
        assert np.allclose(x, 0.2)

    def test_per_channel_stats(self):
        import numpy as np

        px = np.zeros((1, 1, 3), dtype=np.uint8)
        px[0, 0] = [255, 0, 255]
        x = tiling.image_transform(px, mean=(1.0, 0.0, 0.5), std=(1.0, 1.0, 0.5))
        assert np.allclose(x[:, 0, 0], [0.0, 0.0, 1.0])

    def test_bad_shape_rejected(self):
        import numpy as np
        import pytest as _pytest

        with _pytest.raises(ValueError):
            tiling.image_transform(np.zeros((4, 4), dtype=np.uint8))
