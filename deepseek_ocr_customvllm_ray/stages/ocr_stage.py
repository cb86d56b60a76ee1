"""Unified extraction stages: explode -> OCR actor pool -> postprocess ->
per-doc merge.

Distributed re-expression of the reference worker loop
(ocr_service.py:99-141), single-pass for BOTH branches: the routed/deduped
doc stream is consumed exactly once (no dataset forking, which would
re-execute the read + dedup shuffle per branch — fatal at 100 TB).  HTML
docs ride the same page-row schema as one logical page and skip the OCR
actor work.

- ``explode_documents``  — doc row -> page rows.  The reference's 40-page
  chunking (CHUNK_SIZE, app/config.py:60) is subsumed by Ray block / batch
  sizing; page rows are the skew-free unit of work (a 2000-page doc becomes
  2000 independent rows — SURVEY §4 "Skew").
- ``MockOcrEngine``      — the stateful actor-pool stage standing in for the
  vLLM engine (A1-A5).  ``__init__`` is the once-per-actor model-load slot
  (model_init.py:17-41 analog); ``__call__`` is ``llm.generate`` over an
  Arrow batch (processor.py:25-34).  ``batch_size`` plays ``max_num_seqs``'s
  role.  HTML rows pass through untouched.
- ``postprocess``        — M9-M16 per pdf page (postprocess_md.py:229-300);
  Readability extraction per html doc (north-star branch).
- ``merge_documents``    — groupby(url).map_groups: in-group sort by
  page_no then ordered concat (G1, ocr_service.py:123-136,147-176).  The
  only post-dedup wide step; key = url, same key as the dedup shuffle.

Every record carries explicit ``(url, page_no)`` — no positional zips
anywhere (SURVEY §4 "Ordering").
"""

from __future__ import annotations

import pickle
from typing import Dict, List

import pyarrow as pa

from ..config import ExtractConfig
from ..functions.document import (
    document_envelope,
    merge_document,
    mock_decode,
    process_page,
)
from ..functions.blocks import process_ocr_to_blocks
from ..functions.html_extract import extract_markdown_and_text
from ..sources.golden import (
    EXTRACTED_SCHEMA,
    block_to_struct,
    doc_to_row,
)
from ..sources.pdfpayload import parse_pdf_payload

KIND_PDF_PAGE = "pdf_page"
KIND_HTML_DOC = "html_doc"

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts_iso", pa.string()),
        ("kind", pa.string()),
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("emission", pa.large_string()),
    ]
)

PROCESSED_PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts_iso", pa.string()),
        ("kind", pa.string()),
        ("page_no", pa.int32()),
        ("n_pages", pa.int32()),
        ("raw_text", pa.large_string()),
        ("clean_md", pa.large_string()),  # pdf: page md (null = SKIP_REPEAT);
                                          # html: doc markdown
        ("extracted_text", pa.large_string()),  # html only; null for pdf pages
        # (blocks, figures) pickled per page: the typed dicts cross the merge
        # shuffle as one binary column — constructing Arrow list<struct>
        # per PAGE and converting back per DOC costs ~3x the extraction
        # itself (measured); the nested types appear only once, in the final
        # document schema
        ("page_payload", pa.binary()),
        ("heading_level", pa.int32()),
        ("n_image_tokens", pa.int64()),
    ]
)


class PageRenderer:
    """Deployment seam for pdf-payload -> page rendering (the reference
    renders with PyMuPDF at 144 DPI, utils.py:70-102).  ``render`` returns
    a list of ``(width, height, emission)`` page tuples; a real deployment
    swaps in a renderer that rasterizes pages (emission = image bytes or a
    handle), and the rest of the pipeline — explode schema, OCR actor
    signature, merge keys — is unchanged.  Must be picklable (shipped to
    Ray tasks)."""

    def render(self, payload: bytes) -> List[tuple]:
        raise NotImplementedError


class SyntheticPdfRenderer(PageRenderer):
    """Default: parse the deterministic synthetic PDF container (this
    sandbox has no PyMuPDF; the container stands in for rasterization).
    A corrupt container renders to zero pages — same as the reference's
    failure path, where an unrenderable upload yields no page images."""

    def render(self, payload: bytes) -> List[tuple]:
        return parse_pdf_payload(payload)


def pymupdf_available() -> bool:
    try:
        import fitz  # noqa: F401

        return True
    except Exception:
        return False


class PyMuPdfRenderer(PageRenderer):
    """Real rasterizer for deployments that have PyMuPDF (reference
    contract: app/utils/utils.py:70-102 — ``get_pixmap`` at ``dpi=144``,
    ``zoom = dpi/72``, RGB).  The page image travels in the ``emission``
    string column as base64 PNG (PAGE_SCHEMA pins emission as a string; a
    GPU OCR engine base64-decodes it in ``__call__``); width/height are the
    pixmap dimensions, so tiling arithmetic (M3-M5) sees real pixels.

    Import-guarded: constructing it without PyMuPDF raises ImportError
    immediately (fail fast on the driver, not inside a worker task); use
    :func:`make_page_renderer` for automatic fallback to the synthetic
    renderer.  An unparseable payload renders to zero pages — the
    reference's failure path."""

    def __init__(self, dpi: int = 144):
        import fitz  # noqa: F401 — fail fast if the deployment lacks it

        self.dpi = dpi

    def render(self, payload: bytes) -> List[tuple]:
        import base64

        import fitz

        try:
            doc = fitz.open(stream=payload, filetype="pdf")
        except Exception:
            return []
        out = []
        try:
            mat = fitz.Matrix(self.dpi / 72.0, self.dpi / 72.0)
            for page in doc:
                pix = page.get_pixmap(matrix=mat)
                png = pix.tobytes("png")
                out.append(
                    (pix.width, pix.height, base64.b64encode(png).decode("ascii"))
                )
        finally:
            doc.close()
        return out


def make_page_renderer(prefer_real: bool = True, dpi: int = 144) -> PageRenderer:
    """The deployment seam as CONFIG: returns :class:`PyMuPdfRenderer` when
    the library exists (and ``prefer_real``), else the synthetic renderer —
    so swapping to real rasterization on a PyMuPDF-equipped cluster is a
    no-code change (pass the result to ``make_explode_documents`` /
    ``build_extract_pipeline(renderer=...)``)."""
    if prefer_real and pymupdf_available():
        return PyMuPdfRenderer(dpi=dpi)
    return SyntheticPdfRenderer()


def make_explode_documents(renderer: PageRenderer = None):
    """Doc rows -> unified page rows (S2 analog for pdf; identity-wrap for
    html), with the page renderer injectable (PyMuPDF/GPU deployments are a
    constructor swap — tests/test_pipeline_e2e.py injects a fake)."""
    renderer = renderer or SyntheticPdfRenderer()

    def explode_documents(batch: pa.Table) -> pa.Table:
        cols: Dict[str, list] = {k: [] for k in (
            "url", "warc_ts_iso", "kind", "page_no", "n_pages", "width", "height", "emission",
        )}

        def emit(url, iso, kind, page_no, n_pages, w, h, emission):
            cols["url"].append(url)
            cols["warc_ts_iso"].append(iso)
            cols["kind"].append(kind)
            cols["page_no"].append(page_no)
            cols["n_pages"].append(n_pages)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["emission"].append(emission)

        for url, ts, payload, kind in zip(
            batch["url"].to_pylist(),
            batch["warc_ts"].to_pylist(),
            batch["html"].to_pylist(),
            batch["doc_kind"].to_pylist(),
        ):
            iso = ts.isoformat()
            if kind == "pdf":
                pages = renderer.render(payload)
                for page_no, (w, h, emission) in enumerate(pages):
                    emit(url, iso, KIND_PDF_PAGE, page_no, len(pages), w, h, emission)
            else:
                emit(
                    url, iso, KIND_HTML_DOC, 0, 1, 0, 0,
                    payload.decode("utf-8", errors="replace"),
                )
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in PAGE_SCHEMA], schema=PAGE_SCHEMA
        )

    return explode_documents


# default stage instance (synthetic container renderer)
explode_documents = make_explode_documents()


class MockOcrEngine:
    """Actor-pool OCR stage (A1-A5 observable contract).

    Deterministic mock: page "image" in (dimensions + embedded emission) ->
    markdown-with-grounding-tags string out, with decode-time n-gram
    suppression (A4).  A GPU deployment swaps this class for one that loads
    vLLM weights in ``__init__`` and calls ``llm.generate`` in ``__call__``;
    the stage signature (Arrow batch in/out, rows keyed by (url, page_no))
    is unchanged.  HTML rows get raw_text="" and are untouched otherwise.
    """

    def __init__(self, cfg: ExtractConfig = None):
        self.cfg = cfg or ExtractConfig()  # once-per-actor setup slot

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        emissions = batch["emission"].to_pylist()
        raw = [
            mock_decode(e, self.cfg) if k == KIND_PDF_PAGE else ""
            for k, e in zip(kinds, emissions)
        ]
        return batch.append_column("raw_text", pa.array(raw, pa.large_string()))


class FallbackOcrEngine(MockOcrEngine):
    """A7 analog: the Tesseract fallback engine behind the SAME stage
    interface (app/services/processor.py:38-60 wraps pytesseract output in a
    MockModelOutput with the vLLM shape; engine selection is a constructor
    swap, exactly as the reference falls back when the vLLM init returns
    None, app/core/model_init.py:36-41).

    Observable difference reproduced: the fallback engine emits PLAIN text —
    no grounding tags, no layout markup — so downstream postprocessing sees
    tag-free pages.  Deterministic: strips grounding tags from the embedded
    emission (what a plain-text OCR of the same page would read).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..config import EOS_TOKEN
        from ..functions.mdtext import REF_DET_RE

        kinds = batch["kind"].to_pylist()
        emissions = batch["emission"].to_pylist()
        raw = [
            REF_DET_RE.sub("", e) + EOS_TOKEN if k == KIND_PDF_PAGE else ""
            for k, e in zip(kinds, emissions)
        ]
        return batch.append_column("raw_text", pa.array(raw, pa.large_string()))


def make_postprocess_page_batch(cfg: ExtractConfig):
    """Stateless postprocess: M9-M16 per pdf page; Readability per html doc."""

    def postprocess_page_batch(batch: pa.Table) -> pa.Table:
        out: Dict[str, list] = {f.name: [] for f in PROCESSED_PAGE_SCHEMA}
        for url, iso, kind, page_no, n_pages, w, h, emission, raw in zip(
            batch["url"].to_pylist(),
            batch["warc_ts_iso"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["page_no"].to_pylist(),
            batch["n_pages"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["emission"].to_pylist(),
            batch["raw_text"].to_pylist(),
        ):
            if kind == KIND_PDF_PAGE:
                p = process_page(url, page_no, w, h, raw, cfg)
                clean_md = p["clean_md"]
                extracted_text = None
                payload = pickle.dumps((p["blocks"], p["figures"]), protocol=4)
                heading = p["heading_level"]
                n_img_tok = p["n_image_tokens"]
                raw_text = raw
            else:
                markdown, extracted_text = extract_markdown_and_text(emission)
                clean_md = markdown
                payload = pickle.dumps((process_ocr_to_blocks(markdown), []), protocol=4)
                heading = 0
                n_img_tok = 0
                raw_text = ""
            out["url"].append(url)
            out["warc_ts_iso"].append(iso)
            out["kind"].append(kind)
            out["page_no"].append(page_no)
            out["n_pages"].append(n_pages)
            out["raw_text"].append(raw_text)
            out["clean_md"].append(clean_md)
            out["extracted_text"].append(extracted_text)
            out["page_payload"].append(payload)
            out["heading_level"].append(heading)
            out["n_image_tokens"].append(n_img_tok)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in PROCESSED_PAGE_SCHEMA],
            schema=PROCESSED_PAGE_SCHEMA,
        )

    return postprocess_page_batch


_MERGE_COLUMNS = (
    "url", "warc_ts_iso", "kind", "page_no", "raw_text", "clean_md",
    "extracted_text", "page_payload", "n_image_tokens",
)


def _merge_span_to_doc(col: Dict[str, list], start: int, end: int) -> dict:
    """One (url, crawl-ts) span of the column-decoded, sorted partition ->
    extracted-doc row dict.  Reads parallel column lists by index — no
    per-row dict pivot of the whole partition."""
    url = col["url"][start]
    ts_iso = col["warc_ts_iso"][start]
    if col["kind"][start] == KIND_HTML_DOC:
        blocks, _ = pickle.loads(col["page_payload"][start])
        doc_json = document_envelope(url, ts_iso, [{"page_number": 1, "blocks": blocks}])
        return {
            "url": url,
            "doc_kind": "html",
            "markdown": col["clean_md"][start],
            "extracted_text": col["extracted_text"][start],
            "raw_md": "",
            "doc_json": doc_json,
            "blocks": [block_to_struct(b) for b in blocks],
            "figures": [],
            "n_pages": 1,
            "n_image_tokens": 0,
        }
    pages: List[Dict] = []
    for i in range(start, end):  # span is already page_no-sorted
        blocks, figures = pickle.loads(col["page_payload"][i])
        pages.append(
            {
                "raw_text": col["raw_text"][i],
                "clean_md": col["clean_md"][i],
                "blocks": blocks,
                "figures": figures,
                "n_image_tokens": col["n_image_tokens"][i],
            }
        )
    return doc_to_row(merge_document(url, ts_iso, pages))


def merge_partition(batch: pa.Table) -> pa.Table:
    """Merge one hash partition of page rows: every url's pages are
    co-located here; sort by (url, warc_ts_iso, page_no) once, split on
    (url, crawl-timestamp) boundaries, merge each run.  One vectorized call
    per PARTITION (not per url).  The crawl timestamp is part of the group
    key so that with dedup disabled, pages of DISTINCT crawls of one url
    never interleave into a corrupt document (after dedup each url has one
    crawl, so the key is effectively url)."""
    if "_part" in batch.column_names:
        batch = batch.drop_columns(["_part"])
    if batch.num_rows == 0:
        return EXTRACTED_SCHEMA.empty_table()
    batch = batch.sort_by(
        [("url", "ascending"), ("warc_ts_iso", "ascending"), ("page_no", "ascending")]
    )
    # columnar decode: one to_pylist per NEEDED column (no whole-table
    # row-dict pivot); doc boundaries found on the two small key columns
    col = {name: batch[name].to_pylist() for name in _MERGE_COLUMNS}
    n = batch.num_rows
    urls, tss = col["url"], col["warc_ts_iso"]
    docs: List[dict] = []
    start = 0
    for i in range(1, n + 1):
        if i == n or urls[i] != urls[start] or tss[i] != tss[start]:
            docs.append(_merge_span_to_doc(col, start, i))
            start = i
    return pa.Table.from_pylist(docs, schema=EXTRACTED_SCHEMA)
