"""HTML main-content extraction (north-star branch)."""

from deepseek_ocr_customvllm_ray.functions import html_extract as hx

BOILERPLATE = """<html><head><title>Site</title>
<script>var x = 1;</script><style>.a{{color:red}}</style></head>
<body>
<nav><a href="/">Home</a><a href="/b">Blog</a><a href="/c">Contact</a></nav>
<div class="sidebar"><a href="/1">link one</a><a href="/2">link two</a>
<a href="/3">link three</a><a href="/4">link four</a></div>
<div id="main-content">
<h1>Article Title</h1>
<p>{p1}</p>
<p>{p2}</p>
</div>
<footer>Copyright 2026, all rights reserved. <a href="/tos">Terms</a></footer>
</body></html>"""

P1 = "This is the first long paragraph of the main article, with enough text to score well, including several clauses, commas, and words."
P2 = "A second paragraph continues the main content here with additional sentences that carry the body of the document."


class TestExtraction:
    def test_main_content_only(self):
        html = BOILERPLATE.format(p1=P1, p2=P2)
        text = hx.extract_text(html)
        assert P1 in text and P2 in text
        assert "Home" not in text
        assert "Copyright" not in text
        assert "link one" not in text
        assert "var x" not in text

    def test_markdown_blocks(self):
        html = BOILERPLATE.format(p1=P1, p2=P2)
        md = hx.extract_markdown(html)
        assert md.startswith("# Article Title")
        assert "\n\n" + P1 + "\n\n" in md

    def test_single_paragraph_roundtrip(self):
        # the oracle contract: wrapping plain text in the template and
        # extracting must return the text byte-identically
        text = "spark group query row data slow small filter customer line"
        html = BOILERPLATE.format(p1=text, p2=P2)
        assert text in hx.extract_text(html).split("\n\n")

    def test_list_and_table(self):
        html = """<html><body><div id="content">
        <p>Main paragraph with plenty of text to win the scoring contest, truly.</p>
        <ul><li>alpha</li><li>beta</li></ul>
        <table><tr><td>k</td><td>v</td></tr></table>
        </div></body></html>"""
        md = hx.extract_markdown(html)
        assert "- alpha" in md and "- beta" in md
        assert "| k | v |" in md

    def test_entity_unescape(self):
        html = '<html><body><div id="main"><p>a &amp; b &lt;c&gt; with more than twenty characters, yes</p></div></body></html>'
        assert "a & b <c>" in hx.extract_text(html)

    def test_malformed_html_no_crash(self):
        assert hx.extract_text("<div><p>unclosed everywhere") != None
        assert hx.extract_text("") == ""
        assert hx.extract_text("no tags at all here") is not None

    def test_title(self):
        html = "<html><head><title>The Title</title></head><body></body></html>"
        assert hx.extract_title(html) == "The Title"

    def test_negative_class_penalized(self):
        html = """<html><body>
        <div class="comment">Short spammy comment text with words here, not the article, nope.</div>
        <div class="article-body"><p>The genuine article body has this distinctive sentence, with commas, included.</p></div>
        </body></html>"""
        text = hx.extract_text(html)
        assert "genuine article body" in text
        assert "spammy" not in text
