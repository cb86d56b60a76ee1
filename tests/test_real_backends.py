"""Import-guarded real renderer / decoder seams (VERDICT r2 item 6).

The sandbox has neither PyMuPDF nor PIL, so the real-behavior tests skip
here; the always-run tests pin the CONFIG contract — the factories fall
back to the synthetic implementations exactly when the library is absent,
so a deployment that does have the libraries activates the real path with
zero code changes.
"""

import base64

import pytest

from deepseek_ocr_customvllm_ray.stages.multimodal import (
    ImageDecodeStage,
    PilImageDecodeStage,
    make_image_decode_stage,
    pil_available,
)
from deepseek_ocr_customvllm_ray.stages.ocr_stage import (
    PyMuPdfRenderer,
    SyntheticPdfRenderer,
    make_page_renderer,
    pymupdf_available,
)

# a minimal but valid one-page PDF (blank page, letter-ish size)
_MINIMAL_PDF = (
    b"%PDF-1.1\n"
    b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
    b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
    b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]>>endobj\n"
    b"xref\n0 4\n"
    b"0000000000 65535 f \n"
    b"0000000009 00000 n \n"
    b"0000000052 00000 n \n"
    b"0000000101 00000 n \n"
    b"trailer<</Size 4/Root 1 0 R>>\nstartxref\n164\n%%EOF\n"
)


class TestFactorySwap:
    def test_page_renderer_factory_matches_availability(self):
        r = make_page_renderer(prefer_real=True)
        if pymupdf_available():
            assert isinstance(r, PyMuPdfRenderer)
        else:
            assert isinstance(r, SyntheticPdfRenderer)

    def test_page_renderer_prefer_real_false_is_synthetic(self):
        assert isinstance(make_page_renderer(prefer_real=False), SyntheticPdfRenderer)

    def test_image_decode_factory_matches_availability(self):
        cls = make_image_decode_stage(prefer_real=True)
        if pil_available():
            assert cls is PilImageDecodeStage
        else:
            assert cls is ImageDecodeStage

    def test_image_decode_prefer_real_false_is_stub(self):
        assert make_image_decode_stage(prefer_real=False) is ImageDecodeStage

    def test_real_classes_fail_fast_when_libs_absent(self):
        """Constructing the real implementations without their libraries
        must raise at construction (driver side), never inside a worker."""
        if not pymupdf_available():
            with pytest.raises(ImportError):
                PyMuPdfRenderer()
        if not pil_available():
            with pytest.raises(ImportError):
                PilImageDecodeStage()


@pytest.mark.skipif(not pymupdf_available(), reason="PyMuPDF not installed")
class TestPyMuPdfRenderer:
    def test_renders_reference_contract(self):
        r = PyMuPdfRenderer(dpi=144)
        pages = r.render(_MINIMAL_PDF)
        assert len(pages) == 1
        w, h, emission = pages[0]
        # 612x792 pt page at 144 DPI (zoom 2.0) -> 1224x1584 px
        assert (w, h) == (1224, 1584)
        png = base64.b64decode(emission)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_unrenderable_payload_yields_zero_pages(self):
        assert PyMuPdfRenderer().render(b"not a pdf at all") == []


@pytest.mark.skipif(not pil_available(), reason="PIL not installed")
class TestPilImageDecode:
    def test_decodes_png_dims(self):
        import io

        import pyarrow as pa
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (17, 9)).save(buf, format="PNG")
        batch = pa.table({
            "id": [1, 2],
            "media": pa.array([buf.getvalue(), b"junk"], pa.binary()),
        })
        out = PilImageDecodeStage()(batch)
        assert out["width"].to_pylist() == [17, 0]
        assert out["height"].to_pylist() == [9, 0]
        assert out["mode"].to_pylist() == ["RGB", ""]


# --- VllmOcrEngine seam (VERDICT r3 item 2) --------------------------------

from deepseek_ocr_customvllm_ray.stages.ocr_stage import MockOcrEngine
from deepseek_ocr_customvllm_ray.stages.vllm_engine import (
    PROMPT,
    TokenNGramBanProcessor,
    VllmOcrEngine,
    make_ocr_engine,
    vllm_available,
)


class TestVllmEngineSeam:
    def test_factory_matches_availability(self):
        cls = make_ocr_engine(prefer_real=True)
        if vllm_available():
            assert cls is VllmOcrEngine
        else:
            assert cls is MockOcrEngine

    def test_factory_prefer_real_false_is_mock(self):
        assert make_ocr_engine(prefer_real=False) is MockOcrEngine

    @pytest.mark.skipif(vllm_available(), reason="vLLM present")
    def test_constructing_without_vllm_fails_fast(self):
        with pytest.raises(ImportError):
            VllmOcrEngine(model_path="/nonexistent")

    @pytest.mark.skipif(not vllm_available(), reason="vLLM absent")
    def test_real_engine_requires_model_path(self):
        with pytest.raises(ValueError):
            VllmOcrEngine(model_path="")

    def test_prompt_is_reference_byte_exact(self):
        assert PROMPT == "<image>\n<|grounding|>Convert the document to markdown."


class TestTokenNGramBanProcessor:
    """Decode-contract unit tests for the vLLM logits-processor wiring
    (semantics of process/ngram_norepeat.py:7-40, hand-computed)."""

    def test_no_ban_below_ngram_size(self):
        p = TokenNGramBanProcessor(ngram_size=3, window_size=10)
        assert p.banned_tokens([1, 2]) == set()

    def test_bans_completion_of_repeated_prefix(self):
        # history ...1,2,3... then current prefix (1,2) -> 3 banned
        p = TokenNGramBanProcessor(ngram_size=3, window_size=10)
        assert p.banned_tokens([1, 2, 3, 9, 1, 2]) == {3}

    def test_window_limits_lookback(self):
        # the earlier (1,2,3) falls outside a window of 4
        p = TokenNGramBanProcessor(ngram_size=3, window_size=4)
        assert p.banned_tokens([1, 2, 3, 9, 9, 9, 1, 2]) == set()

    def test_whitelist_never_banned(self):
        p = TokenNGramBanProcessor(
            ngram_size=3, window_size=10, whitelist_token_ids={3}
        )
        assert p.banned_tokens([1, 2, 3, 9, 1, 2]) == set()

    def test_multiple_completions_all_banned(self):
        p = TokenNGramBanProcessor(ngram_size=2, window_size=20)
        # prefix (5,): 5 followed by 6 and by 7 earlier -> both banned
        assert p.banned_tokens([5, 6, 5, 7, 5]) == {6, 7}

    def test_call_masks_scores_numpy(self):
        import numpy as np

        p = TokenNGramBanProcessor(ngram_size=3, window_size=10)
        scores = np.zeros(8, dtype=np.float32)
        out = p(np.array([1, 2, 3, 9, 1, 2]), scores)
        assert out[3] == float("-inf")
        assert out[4] == 0.0

    def test_validation(self):
        with pytest.raises(ValueError):
            TokenNGramBanProcessor(ngram_size=0)
        with pytest.raises(ValueError):
            TokenNGramBanProcessor(ngram_size=2, window_size=0)


# --- real pixel tiling path (VERDICT r3 item 6) ----------------------------

from deepseek_ocr_customvllm_ray.functions.tiling import (
    count_tiles,
    crop_flexible_pixels,
    detect_and_correct_skew,
    dynamic_preprocess_pixels,
    pil_available as tiling_pil_available,
    prepare_page_image,
)


class _FakeImage:
    """Minimal PIL-image protocol (size/mode/convert/crop/resize/rotate)
    recording operations — lets the slicing ARITHMETIC run without PIL."""

    def __init__(self, w, h, mode="RGB", ops=None):
        self.size = (w, h)
        self.mode = mode
        self.ops = ops if ops is not None else []

    def convert(self, mode):
        self.ops.append(("convert", mode))
        return _FakeImage(*self.size, mode=mode, ops=self.ops)

    def crop(self, box):
        self.ops.append(("crop", box))
        return _FakeImage(box[2] - box[0], box[3] - box[1], self.mode, self.ops)

    def resize(self, wh):
        self.ops.append(("resize", wh))
        return _FakeImage(wh[0], wh[1], self.mode, self.ops)

    def rotate(self, angle, expand=False):
        self.ops.append(("rotate", angle, expand))
        return self


class TestPixelTiling:
    def test_dynamic_preprocess_grid_matches_dims_contract(self):
        img = _FakeImage(1700, 2200)
        tiles, grid = dynamic_preprocess_pixels(img)
        assert grid == count_tiles(1700, 2200)
        assert len(tiles) == grid[0] * grid[1]
        assert all(t.size == (640, 640) for t in tiles)

    def test_dynamic_preprocess_boxes_row_major(self):
        img = _FakeImage(1280, 640)  # 2x1 grid exactly
        tiles, grid = dynamic_preprocess_pixels(img)
        assert grid == (2, 1)
        boxes = [op[1] for op in img.ops if op[0] == "crop"]
        assert boxes == [(0, 0, 640, 640), (640, 0, 1280, 640)]

    def test_thumbnail_appended_when_tiled(self):
        img = _FakeImage(1280, 640)
        tiles, _ = dynamic_preprocess_pixels(img, use_thumbnail=True)
        assert len(tiles) == 3 and tiles[-1].size == (640, 640)

    def test_crop_margins_and_degenerate_skip(self):
        img = _FakeImage(1000, 800)
        out = crop_flexible_pixels(img)
        assert out.size == (880, 680)
        tiny = _FakeImage(100, 100)
        assert crop_flexible_pixels(tiny).size == (100, 100)  # degenerate

    def test_crop_converts_rgba(self):
        img = _FakeImage(1000, 800, mode="RGBA")
        out = crop_flexible_pixels(img)
        assert ("convert", "RGB") in out.ops

    def test_deskew_passthrough_without_tesseract(self):
        # pytesseract is absent here -> the reference failure path: unchanged
        img = _FakeImage(1000, 800)
        assert detect_and_correct_skew(img) is img

    def test_prepare_page_order_deskew_then_crop(self):
        img = _FakeImage(1000, 800)
        out = prepare_page_image(img)
        assert out.size == (880, 680)

    @pytest.mark.skipif(not tiling_pil_available(), reason="PIL absent")
    def test_real_pil_tiles(self):
        from PIL import Image

        img = Image.new("RGB", (1700, 2200), (255, 255, 255))
        tiles, grid = dynamic_preprocess_pixels(img)
        assert len(tiles) == grid[0] * grid[1]
        assert all(t.size == (640, 640) for t in tiles)
