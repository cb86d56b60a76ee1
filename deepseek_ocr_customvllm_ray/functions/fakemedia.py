"""Deterministic stand-ins for image decode/render/crop.

The real image libraries (PyMuPDF, PIL) are NOT available in this
environment, so the page-render and figure-crop steps of the reference
(app/utils/utils.py:70-102 render; postprocess_md.py:116-124 JPEG crop) are
STUBBED with clearly-marked deterministic fakes.  The Ray-side plumbing —
schemas, batch shapes, actor signatures, output layout — is real; only the
pixel payloads are synthetic.

A fake page "image" is just its dimensions (carried as columns); a fake
"crop" is a byte string with JPEG SOI/EOI markers wrapping a SHA-1 of the
crop identity, so crops are content-addressed and byte-stable across runs,
processes, and parallelism levels.
"""

from __future__ import annotations

import hashlib

FAKE_JPEG_PREFIX = b"\xff\xd8FAKEJPEG\x00"  # JPEG SOI + fake marker
FAKE_JPEG_SUFFIX = b"\xff\xd9"  # JPEG EOI


def fake_crop_jpeg(url: str, page_no: int, name: str, box) -> bytes:
    """Deterministic fake JPEG bytes for a figure crop.

    Real implementation would be ``image.crop(box).save(..., "JPEG",
    quality=95)`` (postprocess_md.py:120-124).  Raises nothing; pure.
    """
    ident = f"{url}|{page_no}|{name}|{box[0]},{box[1]},{box[2]},{box[3]}"
    digest = hashlib.sha1(ident.encode("utf-8")).digest()
    return FAKE_JPEG_PREFIX + digest + FAKE_JPEG_SUFFIX


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for a real image decode (PIL.Image.open analog).

    Not implemented in this sandbox — real clusters would swap this for a
    PIL/torchvision decode inside the same actor stage.
    """
    raise NotImplementedError(
        "image decode requires PIL/PyMuPDF, which are not available in this "
        "environment; the pipeline carries (width, height) metadata and "
        "fake_crop_jpeg() payloads instead"
    )
