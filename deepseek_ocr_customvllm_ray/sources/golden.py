"""Sequential golden driver — the reference-shaped single-process pipeline.

Processes the synthetic pages table exactly like the reference worker loop
(one doc at a time, pages in order: ocr_service.py:60-213), using the shared
contract functions in ``functions/document.py``.  The Ray pipeline
(pipelines/extract.py) must produce byte-identical rows per url; the e2e
test asserts that, which validates the distributed orchestration (explode /
actor pool / groupby merge / dedup) against this serial ground truth.
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from ..config import ExtractConfig
from ..functions.document import (
    html_document,
    merge_document,
    mock_decode,
    process_page,
)
from .pdfpayload import is_pdf_payload, parse_pdf_payload

BLOCK_STRUCT = pa.struct(
    [
        ("type", pa.string()),
        ("level", pa.int32()),
        ("text", pa.large_string()),
        ("table_id", pa.string()),
        ("rows", pa.large_list(pa.large_list(pa.string()))),
        ("validation", pa.string()),
        ("source", pa.string()),
    ]
)
FIGURE_STRUCT = pa.struct([("name", pa.string()), ("jpeg", pa.binary())])

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_kind", pa.string()),
        ("markdown", pa.large_string()),
        ("extracted_text", pa.large_string()),
        ("raw_md", pa.large_string()),
        ("doc_json", pa.large_string()),
        ("blocks", pa.large_list(BLOCK_STRUCT)),
        ("figures", pa.large_list(FIGURE_STRUCT)),
        ("n_pages", pa.int32()),
        ("n_image_tokens", pa.int64()),
    ]
)


def block_to_struct(b: Dict[str, Any]) -> Dict[str, Any]:
    """Typed block dict -> flattened nullable struct (FIXTURES.md §2)."""
    return {
        "type": b.get("type"),
        "level": b.get("level"),
        "text": b.get("text"),
        "table_id": b.get("table_id"),
        "rows": b.get("rows"),
        "validation": b.get("validation"),
        "source": b.get("source"),
    }


def struct_to_block(s: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`block_to_struct` — restores the reference's typed
    dict shape and key order (schemas.py:15-30) so ``json.dumps`` output is
    byte-identical after an Arrow round-trip."""
    t = s.get("type")
    if t == "heading":
        return {"type": "heading", "level": int(s["level"]), "text": s["text"]}
    if t == "paragraph":
        return {"type": "paragraph", "text": s["text"]}
    if t == "table":
        return {
            "type": "table",
            "table_id": s["table_id"],
            "rows": [list(r) for r in s["rows"]],
            "validation": s["validation"],
        }
    if t == "image":
        return {"type": "image", "source": s["source"]}
    return {k: v for k, v in s.items() if v is not None}


def doc_to_row(doc: Dict[str, Any]) -> Dict[str, Any]:
    row = dict(doc)
    row["blocks"] = [block_to_struct(b) for b in doc["blocks"]]
    row["figures"] = [{"name": n, "jpeg": j} for n, j in doc["figures"]]
    return row


def extract_document(
    url: str, warc_ts_iso: str, payload: bytes, cfg: ExtractConfig
) -> Dict[str, Any]:
    """One document end-to-end (serial): route -> per-page -> merge.

    A PDF payload that parses to zero pages (corrupt container) produces NO
    output row (returns None) — it is recorded as a lineage failure, matching
    the distributed pipeline where such a doc explodes to zero page rows.
    """
    if is_pdf_payload(payload):
        parsed = parse_pdf_payload(payload)
        if not parsed:
            return None
        pages = []
        for page_no, (w, h, emission) in enumerate(parsed):
            raw = mock_decode(emission, cfg)
            pages.append(process_page(url, page_no, w, h, raw, cfg))
        return merge_document(url, warc_ts_iso, pages)
    return html_document(url, warc_ts_iso, payload)


def run_golden(pages_table: pa.Table, cfg: ExtractConfig = None) -> pa.Table:
    """Sequential golden: dedup urls (earliest warc_ts wins, ties by payload
    hash) then extract each doc in input order."""
    cfg = cfg or ExtractConfig()
    from ..functions.winners import select_url_winners

    best = select_url_winners(
        zip(
            pages_table["url"].to_pylist(),
            pages_table["warc_ts"].to_pylist(),
            pages_table["html"].to_pylist(),
        ),
        cfg.max_payload_mb,
    )

    rows: List[Dict[str, Any]] = []
    for url in sorted(best):
        ts, payload = best[url]
        doc = extract_document(url, ts.isoformat(), payload, cfg)
        if doc is not None:
            rows.append(doc_to_row(doc))
    return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
