"""Per-page processing and per-document merge — shared by the sequential
golden driver (sources/golden.py) and the Ray stages (stages/ocr_stage.py).

This module is the single statement of the document contract; the golden
driver and the distributed pipeline differ ONLY in orchestration (serial
loop vs flat-map/actor-pool/groupby), so their byte-equality tests the Ray
wiring (ordering, merge keys, figure naming) and nothing else.

Reference trace being reproduced (ocr_service.py:99-176 with the 40-page
chunk loop collapsed — output is chunk-size-invariant by design; the
reference only matches this when total_pages <= CHUNK_SIZE, a deliberate
divergence documented in SURVEY §7.4):

  per page:  decode (mock: n-gram-suppressed emission + EOS)            A1-A5
             -> strip EOS + strip                                       M13.1
             -> figure crops named {page}_{k}.jpg                       M11/K4
             -> clean page markdown                                     M13.3-5
             -> extract_content + blocks (JSON branch)                  M12/M15
  per doc:   raw_md   = concat(raw + "\\n\\n<--- Page Split --->\\n\\n")  K1
             markdown = concat(clean + "\\n\\n\\n\\n" for non-skipped) + "\\n"  K2/G1
             doc_json = {document:{metadata,content:[{page_number,blocks}]}}  K3
             page numbering continuous 1-based over ALL pages           G1
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..config import EOS_TOKEN, PAGE_SPLIT_MARKER, ExtractConfig
from . import mdtext, tiling
from .blocks import process_ocr_to_blocks
from .fakemedia import fake_crop_jpeg
from .fastjson import dumps_indent2
from .html_extract import extract_markdown_and_text
from .ngram import suppress_repeats_text


def document_envelope(url: str, warc_ts_iso: str, content_pages: list) -> str:
    """THE doc_json serialization (ocr_service.py:161-174 shape with the
    exact ``json.dumps(ensure_ascii=False, indent=2)`` arguments).  Single
    definition — golden, merge, and the distributed html path all call this,
    so the byte-identity surface cannot drift between copies.

    Serialized by ``fastjson.dumps_indent2`` — byte-identical to the dumps
    call above by differential test (CPython's C encoder is disabled when
    ``indent`` is set; the stdlib pure-Python walk measured ~24% of the
    flagship extraction wall)."""
    return dumps_indent2(
        {
            "document": {
                "metadata": {
                    "source_filename": url,
                    "total_pages": len(content_pages),
                    "processed_at": warc_ts_iso,
                },
                "content": content_pages,
            }
        }
    )


def mock_decode(emission: str, cfg: ExtractConfig) -> str:
    """The mock OCR engine's per-page output: the embedded emission run
    through the no-repeat-n-gram suppressor (decode-time A4 analog), plus the
    EOS terminator vLLM includes (include_stop_str_in_output=True,
    model_init.py:54)."""
    if not cfg.ngram_suppress:
        return emission + EOS_TOKEN
    return (
        suppress_repeats_text(
            emission, cfg.ngram_size, cfg.ngram_window, cfg.ngram_whitelist
        )
        + EOS_TOKEN
    )


def process_page(
    url: str,
    page_no: int,
    width: int,
    height: int,
    raw_text: str,
    cfg: ExtractConfig,
) -> Dict[str, Any]:
    """Everything computable from one page's raw OCR output.

    Returns a dict with:
      raw_text    — the model output incl. EOS (for the raw_md column)
      clean_md    — cleaned page markdown, or None when SKIP_REPEAT drops it
      blocks      — typed block list (JSON branch, extract_content path)
      figures     — [(name, jpeg_bytes)] crops named {page_no}_{k}.jpg
      heading_level — last heading level on THIS page, 0 when none
                      (page-local: the reference threads the value across
                      pages inside its serial loop, but it is dead state —
                      never consumed — so the parallel engine does not
                      serialize pages to reproduce the fold)
    """
    content = mdtext.strip_eos(raw_text)
    skipped = cfg.skip_repeat and not content

    # M1 -> M2 page prep (order matters: deskew before crop, M8): in this
    # sandbox these are dimension-level stubs; crops denormalize against the
    # PREPPED image like the reference (process_single_image then
    # draw_bounding_boxes on the processed image)
    pw, ph = tiling.crop_margin_dims(*tiling.deskew_dims(width, height))

    figures = []
    if not skipped:
        for name, box in mdtext.figure_crop_boxes(content, page_no, pw, ph):
            figures.append((name, fake_crop_jpeg(url, page_no, name, box)))

    clean_md: Optional[str] = None
    if not skipped:
        clean_md = mdtext.clean_page_content(content, page_no)

    # JSON branch runs on the UN-stripped raw text for every page, empty or
    # not (ocr_service.py:132-136)
    blocks = process_ocr_to_blocks(mdtext.extract_content(raw_text, url))

    return {
        "raw_text": raw_text,
        "clean_md": clean_md,
        "blocks": blocks,
        "figures": figures,
        "heading_level": mdtext.last_heading_level(content, 0),
        # M3/M4/M7 token accounting on the prepped page (metrics parity)
        "n_image_tokens": tiling.num_image_tokens(pw, ph),
    }


def merge_document(
    url: str,
    warc_ts_iso: str,
    pages: List[Dict[str, Any]],
) -> Dict[str, Any]:
    """Pages (ALREADY sorted by page_no) -> the per-doc output row.

    ``processed_at`` uses the row's crawl timestamp instead of wall clock so
    output is deterministic (reference uses datetime.now, ocr_service.py:166
    — an unavoidable divergence for reproducibility).
    """
    raw_md = "".join(p["raw_text"] + PAGE_SPLIT_MARKER for p in pages)
    markdown = mdtext.merge_clean_pages(
        [p["clean_md"] for p in pages if p["clean_md"] is not None]
    )
    content_pages = [
        {"page_number": i + 1, "blocks": p["blocks"]} for i, p in enumerate(pages)
    ]
    doc_json = document_envelope(url, warc_ts_iso, content_pages)
    flat_blocks: List[dict] = []
    for p in pages:
        flat_blocks.extend(p["blocks"])
    figures: List[tuple] = []
    for p in pages:
        figures.extend(p["figures"])
    return {
        "url": url,
        "doc_kind": "pdf",
        "markdown": markdown,
        "extracted_text": markdown,
        "raw_md": raw_md,
        "doc_json": doc_json,
        "blocks": flat_blocks,
        "figures": figures,
        "n_pages": len(pages),
        "n_image_tokens": sum(p.get("n_image_tokens", 0) for p in pages),
    }


def html_document(url: str, warc_ts_iso: str, html_bytes: bytes) -> Dict[str, Any]:
    """The HTML branch's per-doc output row (north-star; no reference
    analog).  Single logical page; block grammar shared with the PDF branch.
    """
    html = html_bytes.decode("utf-8", errors="replace")
    markdown, text = extract_markdown_and_text(html)  # ONE dom parse
    blocks = process_ocr_to_blocks(markdown)
    doc_json = document_envelope(url, warc_ts_iso, [{"page_number": 1, "blocks": blocks}])
    return {
        "url": url,
        "doc_kind": "html",
        "markdown": markdown,
        "extracted_text": text,
        "raw_md": "",
        "doc_json": doc_json,
        "blocks": blocks,
        "figures": [],
        "n_pages": 1,
        "n_image_tokens": 0,
    }
