"""K6: layout-PDF writer — recompose (annotated) page JPEGs into one PDF.

The reference shells out to img2pdf (``app/utils/utils.py:104-126``:
RGB-convert, JPEG quality 95, ``img2pdf.convert`` over the byte list).
img2pdf embeds each JPEG losslessly as a DCTDecode Image XObject on its
own page; this module builds that exact PDF structure from scratch
(no img2pdf / PIL dependency): one page per image, page box sized
``pixels * 72 / dpi`` points (img2pdf's default assumption of 96 DPI when
the JPEG carries none), JPEG bytes passed through untouched.

Dimensions come from the JPEG SOF header when present; the sandbox's fake
crops carry no SOF, so explicit ``(width, height)`` pairs are accepted —
the PDF structure is identical either way and is what the tests pin.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

# SOF markers that carry frame dimensions (C0-CF minus DHT/JPG/DAC)
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def jpeg_dimensions(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from a JPEG's SOF segment, or None when the stream
    has no parseable frame header (e.g. this sandbox's fake crops)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 3 < n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: bare
            i += 2
            continue
        if marker == 0xD9:  # EOI
            return None
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _SOF_MARKERS:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return (w, h)
        i += 2 + seglen
    return None


def images_to_pdf(
    jpegs: Sequence[bytes],
    dims: Optional[Sequence[Tuple[int, int]]] = None,
    dpi: float = 96.0,
) -> bytes:
    """JPEG byte strings -> one PDF (bytes), one page per image.

    ``dims``: explicit (width, height) per image; required for any JPEG
    whose SOF header is missing.  Returns ``b""`` for an empty list (the
    reference returns early on no images)."""
    if not jpegs:
        return b""
    sizes: List[Tuple[int, int]] = []
    for k, data in enumerate(jpegs):
        wh = dims[k] if dims is not None else jpeg_dimensions(data)
        if wh is None:
            wh = jpeg_dimensions(data)
        if wh is None or wh[0] <= 0 or wh[1] <= 0:
            raise ValueError(f"image {k}: no dimensions (no SOF and no dims)")
        sizes.append((int(wh[0]), int(wh[1])))

    # object layout: 1 catalog, 2 pages, then per image k (0-based):
    #   3+3k page, 4+3k contents, 5+3k image xobject
    n_imgs = len(jpegs)
    objects: List[bytes] = []
    kids = " ".join(f"{3 + 3 * k} 0 R" for k in range(n_imgs))
    objects.append(b"<</Type/Catalog/Pages 2 0 R>>")
    objects.append(
        f"<</Type/Pages/Kids[{kids}]/Count {n_imgs}>>".encode()
    )
    scale = 72.0 / dpi
    streams: dict = {}
    for k, (data, (w, h)) in enumerate(zip(jpegs, sizes)):
        pw, ph = w * scale, h * scale
        page = (
            f"<</Type/Page/Parent 2 0 R/MediaBox[0 0 {pw:.4f} {ph:.4f}]"
            f"/Resources<</XObject<</Im{k} {5 + 3 * k} 0 R>>>>"
            f"/Contents {4 + 3 * k} 0 R>>"
        ).encode()
        content = f"q\n{pw:.4f} 0 0 {ph:.4f} 0 0 cm\n/Im{k} Do\nQ\n".encode()
        contents = (
            f"<</Length {len(content)}>>".encode(), content
        )
        img = (
            f"<</Type/XObject/Subtype/Image/Width {w}/Height {h}"
            f"/ColorSpace/DeviceRGB/BitsPerComponent 8/Filter/DCTDecode"
            f"/Length {len(data)}>>".encode(), data
        )
        objects.append(page)
        streams[4 + 3 * k] = contents
        streams[5 + 3 * k] = img
        objects.append(None)  # placeholder: stream objects rendered below
        objects.append(None)

    out = bytearray(b"%PDF-1.4\n")
    offsets: List[int] = []
    for num in range(1, 3 + 3 * n_imgs):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode()
        if num in streams:
            head, body = streams[num]
            out += head + b"\nstream\n" + body + b"\nendstream"
        else:
            out += objects[num - 1]
        out += b"\nendobj\n"
    xref_at = len(out)
    total = len(offsets) + 1
    out += f"xref\n0 {total}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer<</Size {total}/Root 1 0 R>>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_layout_pdf_batch(
    figures_col: str = "figures",
    out_col: str = "layout_pdf",
    default_dims: Tuple[int, int] = (640, 640),
):
    """``map_batches`` fn: per doc, compose its figure/page JPEG crops
    (``list<struct<name, jpeg>>`` — the K4 artifact column) into a single
    ``layout_pdf: binary`` column (artifact-as-data, like the crops
    themselves; no side files).  Dimension source: JPEG SOF when present,
    ``default_dims`` otherwise (the sandbox's fake crops).  Docs with no
    figures get an empty value, mirroring the reference's early return."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        pdfs = []
        for figs in batch[figures_col].to_pylist():
            jpegs = [f["jpeg"] for f in (figs or [])]
            dims = [jpeg_dimensions(j) or default_dims for j in jpegs]
            pdfs.append(images_to_pdf(jpegs, dims))
        return batch.append_column(out_col, pa.array(pdfs, pa.binary()))

    return fn
