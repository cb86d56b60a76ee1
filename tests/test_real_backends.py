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
