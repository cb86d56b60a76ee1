"""Markdown / grounding-tag post-processing — the byte-identity surface.

Pure, deterministic string transforms re-expressing the reference contract:

- grounding-tag matching and partitioning      (postprocess_md.py:53-65)
- coordinate parsing (safe literal, not eval)  (postprocess_md.py:68-78)
- 0-999 grid box denormalisation               (postprocess_md.py:96-114)
- raw->clean content for the JSON branch       (postprocess_md.py:26-50)
- per-page clean-markdown + figure naming      (postprocess_md.py:229-300)
- paragraph/date heuristics                    (app/utils/utils.py:164-183)
- formula / CER-side normalizers               (Scripts/run_batch.py:53-68,
                                                Scripts/clean_markdown.py:4-30,
                                                Scripts/eval_CER.py:63-69)

The reference has TWO divergent latex normalizations — ``=:`` in
``extract_content`` (postprocess_md.py:48) vs ``=: `` (trailing space) in
``process_ocr_output`` (postprocess_md.py:281) — and two divergent newline
collapses (exact-count replaces at :49 vs ``\n{3,}`` regex at :283).  Both
pairs are preserved verbatim: the JSON/blocks branch uses
:func:`extract_content`, the clean-markdown branch uses
:func:`clean_page_content`.

No function here touches Ray; they are wired into ``map_batches`` by
``stages/ocr_stage.py``.
"""

from __future__ import annotations

import ast
import re
from typing import List, Optional, Sequence, Tuple

from ..config import EOS_TOKEN, PAGE_MARKER

# Grounding-tag pattern (postprocess_md.py:36,54) — DOTALL so labels/coords may
# span lines.  Compiled once at import; reused by every batch.
REF_DET_RE = re.compile(
    r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL
)
_HEADING_RE = re.compile(r"^(#+)\s+", re.MULTILINE)
_NL3PLUS_RE = re.compile(r"\n{3,}")


def re_match(text: str) -> Tuple[list, list, list]:
    """Partition grounding-tag matches into image refs vs other refs.

    Returns ``(all_matches, image_matches, other_matches)`` where each element
    of ``all_matches`` is the regex 3-tuple ``(full, label, coords)`` and the
    partitioned lists hold the full matched strings.
    Contract: postprocess_md.py:53-65.
    """
    matches = REF_DET_RE.findall(text)
    images, others = [], []
    for m in matches:
        if "<|ref|>image<|/ref|>" in m[0]:
            images.append(m[0])
        else:
            others.append(m[0])
    return matches, images, others


def extract_coordinates_and_label(
    ref_match: Sequence[str],
) -> Optional[Tuple[str, list]]:
    """Parse ``(label, [[x1,y1,x2,y2], ...])`` from a regex match tuple.

    The reference uses ``eval`` on model-emitted text (postprocess_md.py:73);
    here a strict literal parser (``ast.literal_eval``) with the identical
    accept-or-None behaviour: any parse failure returns ``None``.
    """
    try:
        label = ref_match[1]
        coords = ast.literal_eval(ref_match[2])
    except Exception:
        return None
    return (label, coords)


def denormalize_box(
    points: Sequence[float], width: int, height: int
) -> Tuple[int, int, int, int]:
    """Scale a 0-999-grid box to pixel coords, clamp, and fix inversion.

    Contract: postprocess_md.py:100-110 — truncating ``int()``, clamp to
    ``[0, dim]``, then swap inverted corners.
    """
    x1, y1, x2, y2 = points
    left = max(0, min(int(x1 / 999 * width), width))
    top = max(0, min(int(y1 / 999 * height), height))
    right = max(0, min(int(x2 / 999 * width), width))
    bottom = max(0, min(int(y2 / 999 * height), height))
    if left > right:
        left, right = right, left
    if top > bottom:
        top, bottom = bottom, top
    return left, top, right, bottom


def extract_content(text: str, job_id: str) -> str:
    """Raw model output -> cleaned text for the blocks/JSON branch.

    Byte-exact contract of postprocess_md.py:26-50: strip the EOS token,
    replace image refs with ``![](./{job_id}/images/{k}.jpg)\\n`` (k counts
    image refs on this page), delete other refs, ``\\coloneqq``->``:=``,
    ``\\eqqcolon``->``=:`` (NO trailing space), then the exact-count newline
    collapses ``\\n\\n\\n\\n``->``\\n\\n`` followed by ``\\n\\n\\n``->``\\n\\n``.
    """
    if EOS_TOKEN in text:
        text = text.replace(EOS_TOKEN, "")
    _, images, others = re_match(text)
    for img_idx, match in enumerate(images):
        text = text.replace(match, f"![](./{job_id}/images/{img_idx}.jpg)\n")
    for match in others:
        text = text.replace(match, "")
    text = text.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=:")
    text = text.replace("\n\n\n\n", "\n\n").replace("\n\n\n", "\n\n")
    return text


def figure_crop_boxes(
    content: str, page_no: int, width: int, height: int
) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    """Compute the figure crops the reference would save for one page.

    Walks ALL refs in page order (postprocess_md.py:93-129): for each
    image-labelled box, denormalise; keep only boxes with width>2 and
    height>2 px; successful crops are named ``{page_no}_{k}.jpg`` where ``k``
    increments only on saved crops.  Returns ``[(name, (l,t,r,b)), ...]``.

    Failure semantics match the reference exactly: a coordinate PARSE
    failure skips just that ref (``extract_coordinates_and_label`` returns
    None, guarded by ``if result:``), but a malformed box that raises during
    unpacking/denormalisation aborts ALL remaining crops on the page while
    keeping those already produced — ``draw_bounding_boxes`` raises out of
    its loop and ``process_ocr_output`` catches at page level
    (postprocess_md.py:258-263).
    """
    matches, _, _ = re_match(content)
    out: List[Tuple[str, Tuple[int, int, int, int]]] = []
    img_idx = 0
    try:
        for ref in matches:
            result = extract_coordinates_and_label(ref)
            if not result:
                continue
            label, points_list = result
            for points in points_list:
                left, top, right, bottom = denormalize_box(points, width, height)
                if label == "image":
                    if (right - left) > 2 and (bottom - top) > 2:
                        out.append(
                            (f"{page_no}_{img_idx}.jpg", (left, top, right, bottom))
                        )
                        img_idx += 1
    except Exception:
        pass  # page-level abort: keep crops made so far, stop cropping
    return out


def clean_page_content(content: str, page_no: int) -> str:
    """Raw (EOS-stripped, stripped) page text -> clean markdown for the page.

    Byte-exact contract of postprocess_md.py:265-283 (steps 3-5 of
    ``process_ocr_output``): replace image refs with
    ``![](images/{page_no}_{k}.jpg)\\n`` where k enumerates image refs (NOT
    saved crops — link/crop counters can diverge, as in the reference),
    delete other refs, ``\\coloneqq``->``:=``, ``\\eqqcolon``->``=: `` (WITH
    trailing space), collapse ``\n{3,}``->``\n\n`` (regex path).
    """
    _, images, others = re_match(content)
    for img_idx, match_tag in enumerate(images):
        content = content.replace(match_tag, f"![](images/{page_no}_{img_idx}.jpg)\n")
    for match in others:
        content = content.replace(match, "")
    content = content.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=: ")
    content = _NL3PLUS_RE.sub("\n\n", content)
    return content


def strip_eos(text: str) -> str:
    """EOS removal + strip, the step shared by both branches
    (postprocess_md.py:244)."""
    return text.replace(EOS_TOKEN, "").strip()


def last_heading_level(content: str, prev: int = 0) -> int:
    """Track the last markdown heading level seen (postprocess_md.py:266-269).

    Dead state in the reference (computed, never consumed) — kept for parity
    of the per-page metrics record, not for any output byte.
    """
    found = _HEADING_RE.findall(content)
    if found:
        return len(found[-1])
    return prev


def merge_clean_pages(page_contents: Sequence[str]) -> str:
    """Per-doc clean markdown: each cleaned page + the 4-newline page marker,
    then the single chunk-loop ``"\\n"`` (ocr_service.py:128-129 with the
    chunk loop collapsed to one chunk — chunk-boundary invariant by design).
    Empty sequence -> ``"\\n"`` (a doc whose pages were all skipped).
    """
    return "".join(c + PAGE_MARKER for c in page_contents) + "\n"


# --- paragraph heuristics (app/utils/utils.py:164-183) --------------------

_DATE_RE = re.compile(r"(\d{1,2}/\d{1,2}/\d{4})")
_LETTER_DIGIT_RE = re.compile(r"([a-zA-Z])(\d)")
_HAS_DIGIT_RE = re.compile(r"\d")


def apply_regex_heuristics(text: str) -> str:
    """Date-split / letter-digit-split paragraph normalizer
    (utils.py:164-183, byte-exact)."""
    if not text or not text.strip():
        return text
    if not _HAS_DIGIT_RE.search(text):
        # both heuristics require a digit (date match; letter-digit sub is
        # the identity without one) — one cheap scan skips two regex passes
        # on the common digit-free paragraph
        return text
    m = _DATE_RE.search(text)
    if m:
        start, end = m.span()
        prefix = text[:start].strip()
        suffix = text[end:].strip()
        parts = []
        if prefix:
            parts.append(prefix)
        parts.append(m.group(1))
        if suffix:
            parts.append(suffix)
        return " | ".join(parts)
    return _LETTER_DIGIT_RE.sub(r"\1 | \2", text)


# --- batch-CLI / eval-side normalizers ------------------------------------

_FORMULA_RE = re.compile(r"\\\[(.*?)\\\]")
_QUAD_ANNOT_RE = re.compile(r"\\quad\s*\([^)]*\)")


def clean_formula(text: str) -> str:
    """Drop ``\\quad (…)`` annotations inside ``\\[...\\]`` formulas
    (Scripts/run_batch.py:53-68, byte-exact)."""

    def _one(m: re.Match) -> str:
        formula = _QUAD_ANNOT_RE.sub("", m.group(1)).strip()
        return r"\[" + formula + r"\]"

    return _FORMULA_RE.sub(_one, text)


def batch_cli_clean(text: str) -> str:
    """The batch-CLI per-image cleaning contract (Scripts/run_batch.py:133-143,
    byte-exact quirks preserved): formula clean, then for EACH grounding-tag
    match delete it and re-run the newline collapse + ``<center>`` strip —
    meaning a page with zero tags gets NO newline collapse at all, and the
    EOS token is never stripped."""
    content = clean_formula(text)
    matches = REF_DET_RE.findall(content)
    for m in matches:
        content = (
            content.replace(m[0], "")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content


_PAGE_SPLIT_TAG_RE = re.compile(r"<---? ?Page Split ?--->?")
_MD_PUNCT_RE = re.compile(r"(\*\*|\*|#|!|\||<|>|\-|=)")
_WS_RE = re.compile(r"\s+")


def clean_text_refined(text: str) -> str:
    """Flatten markdown to plain text for CER comparison
    (Scripts/clean_markdown.py:4-30, byte-exact)."""
    text = _PAGE_SPLIT_TAG_RE.sub("", text)
    text = _MD_PUNCT_RE.sub("", text)
    text = re.sub(r'"', "", text)
    text = text.replace("\n", " ")
    text = _WS_RE.sub(" ", text)
    return text.strip()


def clean_text(text: str) -> str:
    """Whitespace-collapse normalizer (Scripts/eval_CER.py:63-69)."""
    return _WS_RE.sub(" ", text).strip()
