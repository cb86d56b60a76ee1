"""HTML main-content extraction — Readability-style node scoring, stdlib-only.

The north-star branch with no reference analog (BASELINE.json north_star):
parse HTML into a light DOM with ``html.parser.HTMLParser`` (lxml is not
available in this environment), score block-level candidate containers by
text density vs link density, pick the best container, and emit (a) plain
main text and (b) markdown using the same block grammar the PDF branch feeds
into ``functions.blocks.process_ocr_to_blocks``.

Scoring (classic Readability heuristics, public algorithm):
- kill subtrees at parse time: script/style/nav/footer/header/aside/form/
  noscript/iframe/button/select/option/template; elements whose id/class
  matches the negative pattern (comment|sidebar|menu|banner|ad-|advert|
  promo|related|share|social|breadcrumb|pagination|cookie) are score-
  PENALIZED as candidates (−25), not removed — they leak only when the
  winning container is their ancestor;
- candidate containers: article/main/body/div/section/td;
- score(candidate) = sum over descendant paragraphs of
  (min(text_len, 1000)/100 + comma_count) , scaled by (1 - link_density)
  where link_density = link_text_len / text_len;
- id/class matching the positive pattern (article|body|content|main|post|
  text|entry) gets a +25 bonus, negative pattern -25 (applied before the
  link-density scale).

Deterministic: pure function of the HTML bytes.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional

_KILL_TAGS = frozenset(
    "script style nav footer header aside form noscript iframe button "
    "select option template svg".split()
)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_BLOCK_TAGS = frozenset(
    "p div article main section td li h1 h2 h3 h4 h5 h6 pre blockquote "
    "table tr ul ol body html head title figure figcaption".split()
)
_CANDIDATE_TAGS = frozenset("article main body div section td".split())
_NEGATIVE_RE = re.compile(
    r"comment|sidebar|side-bar|menu|banner|ad-|advert|promo|related|share|"
    r"social|breadcrumb|pagination|cookie|widget|footer|nav",
    re.IGNORECASE,
)
_POSITIVE_RE = re.compile(
    r"article|body|content|main|post|text|entry|story", re.IGNORECASE
)
_WS_RE = re.compile(r"\s+")


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_text", "_linklen")

    def __init__(self, tag: str, attrs: dict, parent: "Optional[Node]"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node or str (text)
        self.parent = parent
        self._text: Optional[str] = None  # memo: tree is frozen after parse
        self._linklen: Optional[int] = None

    # -- text accounting ---------------------------------------------------

    def text(self) -> str:
        """Whitespace-normalized text of the subtree — MEMOIZED.

        Scoring visits every candidate ancestor of a node, so the uncached
        version re-walked each subtree once per ancestor (quadratic in
        nesting depth; measured as the top non-suppressor cost of the
        flagship run).  Child texts compose exactly: joining normalized
        child texts with single spaces and re-normalizing equals
        normalizing the flat fragment join, because ``\\s+`` collapse and
        edge-strip commute with concatenation."""
        if self._text is None:
            parts = [
                c if isinstance(c, str) else c.text() for c in self.children
            ]
            # " ".join(s.split()) == _WS_RE.sub(" ", s).strip(): both
            # collapse whitespace runs and drop edges, but split/join is
            # C-level and ~3x cheaper than the regex pass
            self._text = " ".join(" ".join(parts).split())
        return self._text

    def link_text_len(self) -> int:
        if self._linklen is None:
            n = 0
            for c in self.children:
                if isinstance(c, Node):
                    if c.tag == "a":
                        n += len(c.text())
                    else:
                        n += c.link_text_len()
            self._linklen = n
        return self._linklen

    def iter_nodes(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def idclass(self) -> str:
        return f"{self.attrs.get('id', '')} {self.attrs.get('class', '')}"


class _TreeBuilder(HTMLParser):
    """Builds a Node tree; drops killed subtrees at parse time."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur: Node = self.root
        # killed-subtree tracking is keyed on the KILL TAG's own name (depth
        # of same-name nesting), not on every open tag — crawled HTML is full
        # of implicitly-closed <li>/<p> whose missing end tags would desync a
        # naive depth counter and swallow the rest of the document
        self._kill_tag: str = ""
        self._kill_same = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._kill_same:
            if tag == self._kill_tag:
                self._kill_same += 1
            return
        if tag in _KILL_TAGS:
            self._kill_tag = tag
            self._kill_same = 1
            return
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._kill_same or tag in _KILL_TAGS:
            return
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag: str) -> None:
        if self._kill_same:
            if tag == self._kill_tag:
                self._kill_same -= 1
            return
        # close the nearest open ancestor with this tag (tolerant of bad HTML)
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data: str) -> None:
        if self._kill_same:
            return
        if data and not data.isspace():
            self.cur.children.append(data)


def parse_dom(html: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    return b.root


def _content_score(node: Node) -> float:
    text = node.text()
    tlen = len(text)
    if tlen == 0:
        return 0.0
    base = 0.0
    # paragraph-level contributions
    for d in node.iter_nodes():
        if d.tag in ("p", "pre", "blockquote", "li", "h1", "h2", "h3"):
            t = d.text()
            if len(t) >= 20:
                base += min(len(t), 1000) / 100.0 + t.count(",")
    # even bare text inside a div counts a little
    base += min(tlen, 1000) / 200.0
    idc = node.idclass()
    if _NEGATIVE_RE.search(idc):
        base -= 25.0
    if _POSITIVE_RE.search(idc):
        base += 25.0
    link_density = node.link_text_len() / tlen
    return base * (1.0 - link_density)


def select_main(root: Node) -> Optional[Node]:
    """Best-scoring candidate container, ties broken by document order."""
    best: Optional[Node] = None
    best_score = 0.0
    for node in root.iter_nodes():
        if node.tag in _CANDIDATE_TAGS:
            s = _content_score(node)
            if s > best_score:
                best, best_score = node, s
    if best is None:
        # fall back to <body> or the whole tree
        for node in root.iter_nodes():
            if node.tag == "body":
                return node
        return root
    return best


# --- markdown emission ----------------------------------------------------


def _emit_markdown(node: Node, out: List[str], depth: int = 0) -> None:
    tag = node.tag
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        out.append("#" * int(tag[1]) + " " + node.text())
        return
    if tag == "p" or tag == "blockquote" or tag == "figcaption":
        t = node.text()
        if t:
            out.append(t)
        return
    if tag == "pre":
        out.append("```\n" + node.text() + "\n```")
        return
    if tag == "img":
        src = node.attrs.get("src", "")
        out.append(f"![]({src})")
        return
    if tag in ("ul", "ol"):
        for c in node.children:
            if isinstance(c, Node) and c.tag == "li":
                out.append("- " + c.text())
        return
    if tag == "table":
        rows: List[str] = []
        for tr in node.iter_nodes():
            if tr.tag == "tr":
                cells = [
                    c.text()
                    for c in tr.children
                    if isinstance(c, Node) and c.tag in ("td", "th")
                ]
                if cells:
                    rows.append("| " + " | ".join(cells) + " |")
        if rows:
            # ONE block: newline-joined rows form a valid markdown table that
            # the block grammar parses as a single table (blank-line-joined
            # rows would fragment into one-row tables)
            out.append("\n".join(rows))
        return
    # container: recurse, collecting stray text runs as paragraphs
    stray: List[str] = []

    def flush() -> None:
        if stray:
            t = " ".join(" ".join(stray).split())  # == _WS_RE collapse+strip
            if t:
                out.append(t)
            stray.clear()

    for c in node.children:
        if isinstance(c, str):
            stray.append(c)
        else:
            if c.tag == "a":
                stray.append(c.text())
                continue
            if c.tag in ("span", "b", "i", "em", "strong", "u", "small", "sup", "sub", "code", "abbr", "time", "mark"):
                stray.append(c.text())
                continue
            flush()
            _emit_markdown(c, out, depth + 1)
    flush()


def _main_blocks(html: str) -> List[str]:
    """One parse+score+emit pass -> main-content block strings."""
    main = select_main(parse_dom(html))
    if main is None:
        return []
    out: List[str] = []
    _emit_markdown(main, out)
    return out


def _blocks_to_text(out: List[str]) -> str:
    cleaned: List[str] = []
    for b in out:
        if not b:
            continue
        if b.startswith("```\n") and b.endswith("\n```"):
            cleaned.append(b[4:-4])
            continue
        m = re.match(r"^(#+ |\- |!\[\]\()", b)
        if m:
            if b.startswith("!["):
                continue
            cleaned.append(b[len(m.group(1)):])
            continue
        cleaned.append(b)
    return "\n\n".join(cleaned)


def extract_markdown(html: str) -> str:
    """Main-content markdown: blocks separated by blank lines."""
    return "\n\n".join(b for b in _main_blocks(html) if b)


def extract_text(html: str) -> str:
    """Main-content plain text: block texts joined by ``"\\n\\n"``; markdown
    markers are not included (headings/list items appear as bare text)."""
    return _blocks_to_text(_main_blocks(html))


def extract_markdown_and_text(html: str) -> tuple:
    """(markdown, text) from a SINGLE parse — the DOM parse + scoring is the
    dominant cost of the html branch; callers needing both outputs must not
    pay it twice."""
    out = _main_blocks(html)
    return "\n\n".join(b for b in out if b), _blocks_to_text(out)


def extract_title(html: str) -> str:
    root = parse_dom(html)
    for n in root.iter_nodes():
        if n.tag in ("title", "h1"):
            t = n.text()
            if t:
                return t
    return ""
