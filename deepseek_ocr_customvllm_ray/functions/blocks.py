"""Markdown -> typed block extraction + financial-table validation.

Pure re-expression of the reference block grammar:

- ``parse_html_table``        — app/utils/postprocess_json.py:5-23
- ``process_ocr_to_blocks``   — app/utils/postprocess_json.py:180-276
- ``validate_financial_rows`` — app/utils/utils.py:185-218

Block shapes (app/schemas/schemas.py:15-30):
  heading   {type, level:int, text}
  paragraph {type, text}
  table     {type, table_id:"tbl_NN", rows:List[List[str]], validation:str}
  image     {type, source}

The Arrow-facing flattened struct (all variants in one struct with nullable
fields) is built in ``stages/ocr_stage.py``; this module stays plain-Python
dicts so it is independently unit-testable against golden pairs.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from .mdtext import apply_regex_heuristics

_TR_RE = re.compile(r"<tr.*?>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
_TD_RE = re.compile(r"<td.*?>(.*?)</td>", re.IGNORECASE | re.DOTALL)
_HEADING_LINE_RE = re.compile(r"^(#+)\s*(.*)")
_HTML_TABLE_RE = re.compile(r"<table", re.IGNORECASE)
_IMAGE_LINE_RE = re.compile(r"^!\[.*?\]\((.*?)\)")
_INT_RE = re.compile(r"[-+]?\d+")

# Keywords marking a totals row, casefold-matched (utils.py:204).
_TOTAL_KEYWORDS = ("cộng", "tổng cộng", "total")


def parse_html_table(html_string: str) -> List[List[str]]:
    """Regex tr/td parse of a single-line HTML table, cells stripped."""
    rows: List[List[str]] = []
    for row_content in _TR_RE.findall(html_string):
        cells = [c.strip() for c in _TD_RE.findall(row_content)]
        rows.append(cells)
    return rows


def validate_financial_rows(rows: list) -> str:
    """Sum-vs-total confidence check (utils.py:185-218, byte-exact results).

    Per row: join cells with spaces, drop ``.``/``,``, regex all ints, take
    the LAST int as the row value.  Rows containing a total keyword set the
    expected total; if |sum(others) - total| > 2 -> low confidence.  Any
    exception -> "Indeterminate".
    """
    try:
        data_values = []
        total_value = 0
        has_total_row = False
        for row in rows:
            row_str = " ".join(row).replace(".", "").replace(",", "")
            nums = _INT_RE.findall(row_str)
            if not nums:
                continue
            current_val = int(nums[-1])
            if any(kw in row_str.lower() for kw in _TOTAL_KEYWORDS):
                total_value = current_val
                has_total_row = True
            else:
                data_values.append(current_val)
        if has_total_row and data_values:
            if abs(sum(data_values) - total_value) > 2:
                return "Low Confidence Table (Column Shift Detected)"
        return "High"
    except Exception:
        return "Indeterminate"


def process_ocr_to_blocks(markdown_text: str) -> List[Dict[str, Any]]:
    """Line-oriented state machine -> typed blocks (postprocess_json.py:180-276).

    Order of dispatch per stripped line: heading, single-line HTML table,
    markdown-table accumulation (``|``-prefixed; ``|---|`` separator rows
    dropped), blank-line paragraph/table finalization, image link, paragraph
    accumulation (lines joined with single spaces; heuristics applied at
    finalization).  A non-``|`` non-blank line while inside a markdown table
    finalizes the table and STARTS a new paragraph with that line
    (postprocess_json.py:270-272).
    """
    blocks: List[Dict[str, Any]] = []
    lines = markdown_text.strip().split("\n")

    in_md_table = False
    md_table_lines: List[str] = []
    table_counter = 1
    paragraph = ""

    def finalize_paragraph() -> None:
        nonlocal paragraph
        if paragraph.strip():
            blocks.append(
                {"type": "paragraph", "text": apply_regex_heuristics(paragraph.strip())}
            )
            paragraph = ""

    def finalize_md_table() -> None:
        nonlocal in_md_table, md_table_lines, table_counter
        if md_table_lines:
            try:
                data_rows = [
                    ln.strip("|").split("|")
                    for ln in md_table_lines
                    if not ln.strip().startswith("|---|")
                ]
                cleaned = [[c.strip() for c in row] for row in data_rows]
                if len(cleaned) >= 1:
                    blocks.append(
                        {
                            "type": "table",
                            "table_id": f"tbl_{table_counter:02d}",
                            "rows": cleaned,
                            "validation": validate_financial_rows(cleaned),
                        }
                    )
                    table_counter += 1
            except Exception:
                finalize_paragraph()
                blocks.append({"type": "paragraph", "text": "\n".join(md_table_lines)})
        in_md_table = False
        md_table_lines = []

    for line in lines:
        line = line.strip()

        hm = _HEADING_LINE_RE.match(line)
        if hm:
            finalize_md_table()
            finalize_paragraph()
            blocks.append(
                {"type": "heading", "level": len(hm.group(1)), "text": hm.group(2).strip()}
            )
            continue

        if _HTML_TABLE_RE.search(line):
            finalize_md_table()
            finalize_paragraph()
            try:
                table_rows = parse_html_table(line)
                if table_rows:
                    blocks.append(
                        {
                            "type": "table",
                            "table_id": f"tbl_{table_counter:02d}",
                            "rows": table_rows,
                            "validation": validate_financial_rows(table_rows),
                        }
                    )
                    table_counter += 1
                else:
                    paragraph = line
                    finalize_paragraph()
            except Exception:
                paragraph = line
                finalize_paragraph()
            continue

        if line.startswith("|"):
            if not in_md_table:
                finalize_paragraph()
                in_md_table = True
            md_table_lines.append(line)
            continue

        if in_md_table and not line:
            finalize_md_table()
            continue

        if not line:
            if paragraph:
                finalize_paragraph()
            continue

        im = _IMAGE_LINE_RE.match(line)
        if im:
            finalize_md_table()
            finalize_paragraph()
            blocks.append({"type": "image", "source": im.group(1).strip()})
            continue

        if not in_md_table:
            paragraph = (paragraph + " " + line) if paragraph else line
        else:
            finalize_md_table()
            paragraph = line

    finalize_md_table()
    finalize_paragraph()
    return blocks
