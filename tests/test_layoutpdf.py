"""K6 layout-PDF writer (functions/layoutpdf.py; reference
app/utils/utils.py:104-126)."""

from __future__ import annotations

import re
import struct

import pytest

from deepseek_ocr_customvllm_ray.functions.layoutpdf import (
    images_to_pdf,
    jpeg_dimensions,
    make_layout_pdf_batch,
)


def fake_jpeg_with_sof(w: int, h: int) -> bytes:
    """Minimal JPEG byte stream with a real SOF0 header (decoder-shaped,
    not decodable — only the header matters here)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 14) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 4
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


class TestJpegDimensions:
    def test_sof0_parsed(self):
        assert jpeg_dimensions(fake_jpeg_with_sof(640, 480)) == (640, 480)

    def test_progressive_sof2_parsed(self):
        data = fake_jpeg_with_sof(123, 45).replace(b"\xff\xc0", b"\xff\xc2")
        assert jpeg_dimensions(data) == (123, 45)

    def test_fake_crop_has_no_dims(self):
        from deepseek_ocr_customvllm_ray.functions.fakemedia import fake_crop_jpeg

        data = fake_crop_jpeg("https://x", 0, "0_0.jpg", (0, 0, 10, 10))
        assert jpeg_dimensions(data) is None

    def test_non_jpeg_rejected(self):
        assert jpeg_dimensions(b"%PDF-1.4") is None
        assert jpeg_dimensions(b"") is None


def _xref_offsets(pdf: bytes):
    m = re.search(rb"startxref\n(\d+)\n%%EOF", pdf)
    assert m, "missing startxref"
    xref_at = int(m.group(1))
    assert pdf[xref_at:xref_at + 4] == b"xref"
    table = pdf[xref_at:].split(b"\n")
    n = int(table[1].split()[1])
    offsets = []
    for line in table[2:2 + n]:
        off, gen, kind = line.split()
        offsets.append((int(off), kind))
    return offsets


class TestImagesToPdf:
    def test_empty_list_is_empty_bytes(self):
        assert images_to_pdf([]) == b""

    def test_structure_two_pages(self):
        jpegs = [fake_jpeg_with_sof(96, 192), fake_jpeg_with_sof(48, 96)]
        pdf = images_to_pdf(jpegs)
        assert pdf.startswith(b"%PDF-1.4")
        assert pdf.count(b"/Type/Page/") == 2
        assert pdf.count(b"/Count 2") == 1
        # JPEG bytes embedded verbatim (lossless DCT passthrough)
        for j in jpegs:
            assert j in pdf
        # 96 px at 96 dpi = 72 pt
        assert b"/MediaBox[0 0 72.0000 144.0000]" in pdf

    def test_xref_offsets_point_at_objects(self):
        pdf = images_to_pdf([fake_jpeg_with_sof(10, 10)])
        offsets = _xref_offsets(pdf)
        assert offsets[0] == (0, b"f")
        for num, (off, kind) in enumerate(offsets[1:], start=1):
            assert kind == b"n"
            assert pdf[off:].startswith(f"{num} 0 obj".encode()), num

    def test_explicit_dims_override_missing_sof(self):
        from deepseek_ocr_customvllm_ray.functions.fakemedia import fake_crop_jpeg

        crop = fake_crop_jpeg("https://x", 1, "1_0.jpg", (0, 0, 5, 5))
        pdf = images_to_pdf([crop], dims=[(200, 100)])
        assert b"/Width 200/Height 100" in pdf

    def test_missing_dims_raise(self):
        from deepseek_ocr_customvllm_ray.functions.fakemedia import fake_crop_jpeg

        crop = fake_crop_jpeg("https://x", 1, "1_0.jpg", (0, 0, 5, 5))
        with pytest.raises(ValueError):
            images_to_pdf([crop])

    @pytest.mark.skipif(
        not __import__("deepseek_ocr_customvllm_ray.stages.ocr_stage", fromlist=["pymupdf_available"]).pymupdf_available(),
        reason="PyMuPDF absent",
    )
    def test_roundtrip_with_pymupdf(self):
        import fitz

        pdf = images_to_pdf([fake_jpeg_with_sof(30, 40), fake_jpeg_with_sof(30, 40)])
        doc = fitz.open(stream=pdf, filetype="pdf")
        assert doc.page_count == 2


def test_layout_pdf_batch_over_figures(ray_session):
    import pyarrow as pa

    from deepseek_ocr_customvllm_ray.functions.fakemedia import fake_crop_jpeg

    figs = [
        [{"name": "0_0.jpg", "jpeg": fake_crop_jpeg("u", 0, "0_0.jpg", (0, 0, 9, 9))}],
        [],
        None,
    ]
    batch = pa.table({
        "url": ["a", "b", "c"],
        "figures": pa.array(figs, pa.list_(
            pa.struct([("name", pa.string()), ("jpeg", pa.binary())])
        )),
    })
    out = make_layout_pdf_batch()(batch)
    pdfs = out["layout_pdf"].to_pylist()
    assert pdfs[0].startswith(b"%PDF-1.4") and b"/Width 640/Height 640" in pdfs[0]
    assert pdfs[1] == b"" and pdfs[2] == b""
