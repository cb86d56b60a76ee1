"""M7 tensor emission parity (process/image_process.py:416-585 contract)."""

import numpy as np
import pytest

from deepseek_ocr_customvllm_ray.functions.tensorize import (
    ArrayImage,
    check_token_parity,
    contain_size,
    image_token_run,
    pad_global_view,
    to_pixels,
    tokenize_with_images,
)
from deepseek_ocr_customvllm_ray.functions.tiling import (
    PROMPT,
    count_tiles,
    num_image_tokens,
    pil_available,
)

IDS = dict(image_token_id=128815, bos_id=0, eos_id=1, pad_id=2)


def _enc(s):
    # deterministic tokenizer stub: one token per char, never colliding
    # with the sentinel ids above
    return [1000 + (ord(c) % 97) for c in s]


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayImage(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


class TestRunLayout:
    def test_untiled_run_is_273(self):
        assert len(image_token_run(1, 1, 7)) == 273  # 16*(16+1)+1

    def test_tiled_run_matches_scalar_contract(self):
        for w, h in [(1700, 2200), (1280, 640), (641, 640), (3000, 500)]:
            nw, nh = count_tiles(w, h)
            assert len(image_token_run(nw, nh, 7)) == num_image_tokens(w, h)

    def test_parity_sweep(self):
        for w in (100, 640, 641, 900, 1700, 2600):
            for h in (100, 640, 641, 900, 2200):
                assert check_token_parity(w, h, cropping=True), (w, h)
                assert check_token_parity(w, h, cropping=False), (w, h)


class TestPadGlobalView:
    def test_contain_arithmetic(self):
        assert contain_size(512, 1024, 1024, 1024) == (512, 1024)
        assert contain_size(1024, 512, 1024, 1024) == (1024, 512)
        assert contain_size(100, 100, 1024, 1024) == (1024, 1024)
        assert contain_size(3, 7, 1024, 1024) == (round(3 / 7 * 1024), 1024)

    def test_pad_geometry_and_fill(self):
        img = _img(512, 1024)
        out = pad_global_view(img)
        assert out.shape == (1024, 1024, 3)
        x = round((1024 - 512) * 0.5)
        assert np.array_equal(out[:, x:x + 512], img.pixels)  # no resample
        assert (out[:, :x] == 127).all() and (out[:, x + 512:] == 127).all()

    def test_square_image_fills_whole_view(self):
        img = _img(100, 100)
        out = pad_global_view(img)
        assert out.shape == (1024, 1024, 3)
        assert not (out == 127).all()  # resized content everywhere
        assert np.array_equal(out, to_pixels(img.resize((1024, 1024))))

    @pytest.mark.skipif(not pil_available(), reason="PIL not installed")
    def test_matches_real_pil_pad(self):
        from PIL import Image, ImageOps

        px = _img(512, 1024).pixels
        ours = pad_global_view(ArrayImage(px))
        theirs = np.asarray(ImageOps.pad(
            Image.fromarray(px), (1024, 1024), color=(127, 127, 127)))
        assert np.array_equal(ours, theirs)


class TestTokenizeWithImages:
    def test_untiled_page_shapes_and_mask(self):
        out = tokenize_with_images([_img(500, 400)], _enc, **IDS)
        pre, post = PROMPT.split("<image>")
        run_len = num_image_tokens(500, 400)
        L = 1 + len(_enc(pre)) + run_len + len(_enc(post))  # bos, eos removed
        assert out["input_ids"].shape == (1, L)
        assert out["images_seq_mask"].shape == (L,)
        assert out["target_ids"].shape == (L,)
        assert out["pixel_values"].shape == (1, 3, 1024, 1024)
        assert out["pixel_values"].dtype == np.float32
        assert out["images_spatial_crop"].tolist() == [[1, 1]]
        # untiled -> zero crop placeholder
        assert out["images_crop"].shape == (1, 1, 3, 640, 640)
        assert (out["images_crop"] == 0).all()
        assert out["num_image_tokens"] == [run_len]
        assert out["image_shapes"] == [(500, 400)]
        # mask is True exactly on the image-token run
        start = 1 + len(_enc(pre))
        m = out["images_seq_mask"]
        assert m[start:start + run_len].all()
        assert not m[:start].any() and not m[start + run_len:].any()

    def test_tiled_page_crops_and_run(self):
        w, h = 1700, 2200
        out = tokenize_with_images([_img(w, h)], _enc, **IDS)
        nw, nh = count_tiles(w, h)
        assert out["images_spatial_crop"].tolist() == [[nw, nh]]
        assert out["images_crop"].shape == (1, nw * nh, 3, 640, 640)
        assert not (out["images_crop"] == 0).all()
        assert out["num_image_tokens"] == [num_image_tokens(w, h)]

    def test_target_ids_mask_image_positions(self):
        out = tokenize_with_images([_img(500, 400)], _enc, **IDS)
        ids = out["input_ids"][0]
        tgt = out["target_ids"]
        img_pos = ids == IDS["image_token_id"]
        assert (tgt[img_pos] == -100).all()
        assert np.array_equal(tgt[~img_pos], ids[~img_pos])
        assert img_pos.sum() == out["num_image_tokens"][0]
        # inference mode stripped the trailing eos
        assert ids[-1] != IDS["eos_id"] and ids[0] == IDS["bos_id"]

    def test_cropping_false_resizes_no_tiles(self):
        out = tokenize_with_images(
            [_img(1700, 2200)], _enc, cropping=False, **IDS)
        assert out["images_spatial_crop"].tolist() == [[1, 1]]
        assert (out["images_crop"] == 0).all()
        assert out["num_image_tokens"] == [273]
        # resized to 640x640; the square then CONTAINS to the full 1024
        # frame (no pad region) — global view == transform(pad(resize()))
        from deepseek_ocr_customvllm_ray.functions.tiling import (
            image_transform,
        )

        img = _img(1700, 2200)
        expect = image_transform(pad_global_view(img.resize((640, 640))))
        assert np.array_equal(out["pixel_values"][0], expect)

    def test_pad_border_value_when_tall(self):
        out = tokenize_with_images([_img(512, 1024)], _enc, **IDS)
        pv = out["pixel_values"][0]
        from deepseek_ocr_customvllm_ray.functions.tiling import (
            image_transform,
        )

        pad_val = image_transform(np.full((1, 1, 3), 127, np.uint8))[0, 0, 0]
        assert (pv[:, :, :256] == pad_val).all()
        assert (pv[:, :, 768:] == pad_val).all()
        assert (pv[:, :, 256:768] != pad_val).any()

    def test_no_images_placeholders(self):
        out = tokenize_with_images([], _enc, prompt="just text", **IDS)
        assert out["pixel_values"].shape == (1, 3, 1024, 1024)
        assert (out["pixel_values"] == 0).all()
        assert out["images_spatial_crop"].tolist() == [[0]]
        assert out["images_crop"].shape == (1, 1, 3, 640, 640)
        assert out["num_image_tokens"] == []

    def test_tag_count_mismatch_raises(self):
        with pytest.raises(ValueError):
            tokenize_with_images([_img(10, 10), _img(10, 10)], _enc, **IDS)

    def test_small_page_global_view_not_resized(self):
        """cropping=True and page <= 640: the ORIGINAL image pads to 1024
        (the reference only resizes when cropping is off)."""
        img = _img(500, 400)
        out = tokenize_with_images([img], _enc, **IDS)
        expect = pad_global_view(img)
        got = out["pixel_values"][0]
        m = np.float32(0.5)
        un = (got * m + m) * np.float32(255.0)
        assert np.array_equal(np.rint(un).astype(np.uint8),
                              expect.transpose(2, 0, 1))
