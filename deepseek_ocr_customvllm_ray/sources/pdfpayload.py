"""Synthetic PDF payload container.

Real inputs would be genuine PDF bytes rendered per page with PyMuPDF at
144 DPI (app/utils/utils.py:70-102).  PyMuPDF is not available here, so the
synthetic corpus embeds, behind the same ``%PDF`` magic the reference's
router would check, a JSON page list: each page carries its dimensions and
the raw model emission the mock OCR engine will "decode" for it.  The
page-explode stage (stages/ocr_stage.py) is the only reader.

Format (bytes): ``%PDF-1.7\n%RAYX-SYNTH\n`` + UTF-8 JSON
``{"pages": [{"width": int, "height": int, "emission": str}, ...]}``.
"""

from __future__ import annotations

import json
from typing import List, Tuple

PDF_MAGIC = b"%PDF"
_SYNTH_HEADER = b"%PDF-1.7\n%RAYX-SYNTH\n"


def build_pdf_payload(pages: List[dict]) -> bytes:
    """pages: [{"width", "height", "emission"}, ...] -> container bytes."""
    return _SYNTH_HEADER + json.dumps({"pages": pages}, ensure_ascii=False).encode(
        "utf-8"
    )


def is_pdf_payload(payload: bytes) -> bool:
    """Router predicate — magic-byte check, the analog of the reference's
    ``.pdf`` extension validation (app/api/routes/ocr.py:33-38)."""
    return payload[:4] == PDF_MAGIC


def parse_pdf_payload(payload: bytes) -> List[Tuple[int, int, str]]:
    """Container bytes -> [(width, height, emission), ...].

    The render-to-image analog of ``pdf_to_images_high_quality``; a corrupt
    container yields zero pages (the reference would raise and FAIL the job —
    here the doc simply produces no pages and is recorded in lineage with
    n_pages=0).
    """
    if not is_pdf_payload(payload):
        return []
    try:
        body = payload[len(_SYNTH_HEADER):]
        doc = json.loads(body.decode("utf-8"))
        out = []
        for p in doc["pages"]:
            out.append((int(p["width"]), int(p["height"]), str(p["emission"])))
        return out
    except Exception:
        return []
