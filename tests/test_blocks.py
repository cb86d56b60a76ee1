"""Golden pairs for the block grammar + financial validation (SURVEY §2.3 M14/M15, §2.6 G3)."""

from deepseek_ocr_customvllm_ray.functions.blocks import (
    parse_html_table,
    process_ocr_to_blocks,
    validate_financial_rows,
)


class TestParseHtmlTable:
    def test_simple(self):
        html = "<table><tr><td> a </td><td>b</td></tr><tr><td>c</td></tr></table>"
        assert parse_html_table(html) == [["a", "b"], ["c"]]

    def test_attrs_and_case(self):
        html = '<TABLE><TR class="x"><TD align="c">1</TD></TR></TABLE>'
        assert parse_html_table(html) == [["1"]]

    def test_empty(self):
        assert parse_html_table("<table></table>") == []


class TestValidateFinancialRows:
    def test_high_confidence(self):
        rows = [["item a", "100"], ["item b", "200"], ["Tổng cộng", "300"]]
        assert validate_financial_rows(rows) == "High"

    def test_tolerance_2(self):
        rows = [["a", "100"], ["b", "200"], ["total", "302"]]
        assert validate_financial_rows(rows) == "High"

    def test_low_confidence(self):
        rows = [["a", "100"], ["b", "200"], ["total", "999"]]
        assert validate_financial_rows(rows) == "Low Confidence Table (Column Shift Detected)"

    def test_thousand_separators(self):
        rows = [["a", "1.000"], ["b", "2,000"], ["cộng", "3000"]]
        assert validate_financial_rows(rows) == "High"

    def test_no_total_row(self):
        assert validate_financial_rows([["a", "1"], ["b", "2"]]) == "High"

    def test_no_numbers(self):
        assert validate_financial_rows([["a"], ["b"]]) == "High"

    def test_last_number_wins(self):
        rows = [["code 55 value", "100"], ["total row", "100"]]
        assert validate_financial_rows(rows) == "High"


class TestBlocks:
    def test_heading_levels(self):
        blocks = process_ocr_to_blocks("# Title\n\n### Sub")
        assert blocks == [
            {"type": "heading", "level": 1, "text": "Title"},
            {"type": "heading", "level": 3, "text": "Sub"},
        ]

    def test_heading_no_space(self):
        assert process_ocr_to_blocks("##Tight")[0] == {
            "type": "heading", "level": 2, "text": "Tight",
        }

    def test_paragraph_join_and_heuristics(self):
        blocks = process_ocr_to_blocks("line one\nline two\n\nnext para")
        assert blocks == [
            {"type": "paragraph", "text": "line one line two"},
            {"type": "paragraph", "text": "next para"},
        ]

    def test_paragraph_letter_digit_heuristic(self):
        assert process_ocr_to_blocks("invoice42")[0]["text"] == "invoice | 42"

    def test_markdown_table(self):
        md = "| a | b |\n|---|---|\n| 1 | 2 |\n\nafter"
        blocks = process_ocr_to_blocks(md)
        assert blocks[0]["type"] == "table"
        assert blocks[0]["table_id"] == "tbl_01"
        assert blocks[0]["rows"] == [["a", "b"], ["1", "2"]]
        assert blocks[0]["validation"] == "High"
        assert blocks[1] == {"type": "paragraph", "text": "after"}

    def test_markdown_table_interrupted_by_text(self):
        # non-| non-blank line inside a table finalizes it and starts a paragraph
        md = "| a |\nplain"
        blocks = process_ocr_to_blocks(md)
        assert blocks[0]["type"] == "table"
        assert blocks[1] == {"type": "paragraph", "text": "plain"}

    def test_html_table_inline(self):
        md = "before\n<table><tr><td>x</td><td>1</td></tr></table>\nafter"
        blocks = process_ocr_to_blocks(md)
        assert [b["type"] for b in blocks] == ["paragraph", "table", "paragraph"]
        assert blocks[1]["rows"] == [["x", "1"]]

    def test_html_table_unparsable_becomes_paragraph(self):
        md = "<table broken no rows>"
        blocks = process_ocr_to_blocks(md)
        assert blocks == [{"type": "paragraph", "text": "<table broken no rows>"}]

    def test_table_counter_shared(self):
        md = "| a |\n\n<table><tr><td>b</td></tr></table>"
        blocks = process_ocr_to_blocks(md)
        assert blocks[0]["table_id"] == "tbl_01"
        assert blocks[1]["table_id"] == "tbl_02"

    def test_image_block(self):
        blocks = process_ocr_to_blocks("![](images/0_0.jpg)")
        assert blocks == [{"type": "image", "source": "images/0_0.jpg"}]

    def test_financial_low_confidence_table(self):
        md = "| a | 100 |\n| b | 200 |\n| total | 999 |"
        blocks = process_ocr_to_blocks(md)
        assert blocks[0]["validation"].startswith("Low Confidence")

    def test_empty_input(self):
        assert process_ocr_to_blocks("") == []

    def test_separator_rows_dropped(self):
        md = "| h |\n|---|\n| v |"
        assert process_ocr_to_blocks(md)[0]["rows"] == [["h"], ["v"]]
