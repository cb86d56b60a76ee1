"""Seeded synthetic Common-Crawl-style corpus (FIXTURES.md §1, §4).

Generates the ``pages`` input table — ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string`` (BASELINE.json input_hint) — covering
every fixture family in FIXTURES.md §4: markdown/html/financial tables,
figure+caption pages with 0-999-grid boxes (tiny-box and inverted-corner
variants), heading ladders, date and letter-digit paragraphs, the two
divergent latex normalizations, pathological repeat pages, empty pages,
multi-chunk (>40 page) docs, newline-collapse runs, duplicate urls, a hot
url_host (~30% of rows), log-normal payload-size skew, and
boilerplate-heavy HTML pages.

Everything is a pure function of ``seed``; timestamps are synthesized (no
wall clock) so goldens are stable.
"""

from __future__ import annotations

import datetime as _dt
from typing import List

import numpy as np
import pyarrow as pa

from .pdfpayload import build_pdf_payload

_WORDS = (
    "spark ray data block batch stream merge sort join filter key value row "
    "column table scan shuffle actor lineage manifest page crawl extract "
    "markdown heading figure caption revenue report quarter tổng doanh thu "
    "chi phí lợi nhuận bảng cân đối kế toán"
).split()

_LANGS = ["vi", "en", "fr", "es", "zh"]
_HOSTS = [f"host{i}.example.com" for i in range(9)]
_HOT_HOST = "hot.example.com"

_EPOCH = _dt.datetime(2026, 1, 1)


class _ScaledRng:
    """Thin proxy over a numpy Generator carrying the emission-size scale —
    passed to the family builders in place of a bare Generator so the scale
    is call-scoped (a module global would race across concurrent corpus
    generations and break the pure-function-of-seed contract)."""

    __slots__ = ("rng", "words_scale")

    def __init__(self, rng: np.random.Generator, words_scale: int = 1):
        self.rng = rng
        self.words_scale = max(1, int(words_scale))

    def __getattr__(self, name):
        return getattr(self.rng, name)


def _words(rng, n: int) -> str:
    n = n * getattr(rng, "words_scale", 1)
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


# --- emission builders, one per fixture family ----------------------------


def _em_plain(rng) -> str:
    paras = [_words(rng, int(rng.integers(8, 40))) for _ in range(int(rng.integers(1, 4)))]
    return "\n\n".join(paras)


def _em_md_table(rng) -> str:
    ncol = int(rng.integers(2, 5))
    header = "| " + " | ".join(_words(rng, 1) for _ in range(ncol)) + " |"
    sep = "|" + "---|" * ncol
    rows = [
        "| " + " | ".join(str(int(rng.integers(1, 999))) for _ in range(ncol)) + " |"
        for _ in range(int(rng.integers(2, 6)))
    ]
    return "# Bảng số liệu\n\n" + "\n".join([header, sep] + rows) + "\n\nGhi chú " + _words(rng, 6)


def _em_html_table(rng) -> str:
    # td tags are whitespace-separated tokens: the word-token n-gram
    # suppressor's whitelist (<td>, </td>) can then exempt them, mirroring
    # the reference's vocab-id whitelist {128821,128822}
    cells = lambda: "".join(
        f"<td> {_words(rng, 2)} </td>" for _ in range(int(rng.integers(2, 4)))
    )
    table = "<table>" + "".join(f"<tr>{cells()}</tr>" for _ in range(int(rng.integers(2, 5)))) + "</table>"
    return _words(rng, 10) + "\n" + table + "\n" + _words(rng, 5)


def _em_financial(rng, low_confidence: bool) -> str:
    vals = [int(rng.integers(100, 9999)) for _ in range(3)]
    total = sum(vals) + (500 if low_confidence else 0)
    rows = [f"| Mục {chr(65 + i)} | {v} |" for i, v in enumerate(vals)]
    rows.append(f"| Tổng cộng | {total} |")
    return "## Báo cáo tài chính\n\n| Hạng mục | Giá trị |\n|---|---|\n" + "\n".join(rows)


def _em_figure(rng) -> str:
    # one normal box, one tiny (skipped by >2px rule), one inverted-corner
    x1, y1 = int(rng.integers(0, 300)), int(rng.integers(0, 300))
    x2, y2 = x1 + int(rng.integers(200, 500)), y1 + int(rng.integers(200, 500))
    normal = f"<|ref|>image<|/ref|><|det|>[[{x1}, {y1}, {min(x2,999)}, {min(y2,999)}]]<|/det|>"
    tiny = "<|ref|>image<|/ref|><|det|>[[500, 500, 501, 501]]<|/det|>"
    inverted = f"<|ref|>image<|/ref|><|det|>[[{min(x2,999)}, {min(y2,999)}, {x1}, {y1}]]<|/det|>"
    other = f"<|ref|>title<|/ref|><|det|>[[0, 0, 999, 60]]<|/det|>Tiêu đề hình"
    return (
        f"{other}\n\n{normal}\nHình 1: {_words(rng, 6)}\n\n{tiny}\n{inverted}\nHình 2: "
        + _words(rng, 4)
    )


def _em_headings(rng) -> str:
    parts = []
    for lvl in range(1, int(rng.integers(3, 7))):
        parts.append("#" * lvl + " " + _words(rng, 3))
        parts.append(_words(rng, 12))
    return "\n\n".join(parts)


def _em_date(rng) -> str:
    d, m, y = int(rng.integers(1, 29)), int(rng.integers(1, 13)), int(rng.integers(2015, 2027))
    return f"Ngày lập {d:02d}/{m:02d}/{y} tại Hà Nội\n\n" + _words(rng, 10)


def _em_letter_digit(rng) -> str:
    return f"Số hóa đơn HD{int(rng.integers(100, 999))} kèm mã A{int(rng.integers(10, 99))}\n\n" + _words(rng, 8)


def _em_latex(rng) -> str:
    return (
        "Định nghĩa x \\coloneqq y và z \\eqqcolon w\n\n"
        "\\[E = mc^2 \\quad (1)\\]\n\n" + _words(rng, 6)
    )


def _em_repeat(rng) -> str:
    period = int(rng.integers(3, 8))
    unit = _words(rng, period)
    return ((unit + " ") * 40).strip()


def _em_empty(rng) -> str:
    return "   \n  " if rng.random() < 0.5 else ""


def _em_newlines(rng) -> str:
    return _words(rng, 5) + "\n\n\n\n" + _words(rng, 5) + "\n\n\n" + _words(rng, 5)


def _em_other_refs(rng) -> str:
    return (
        f"<|ref|>header<|/ref|><|det|>[[0, 0, 999, 50]]<|/det|>{_words(rng, 8)}\n\n"
        + _words(rng, 10)
    )


_FAMILIES = [
    _em_plain,
    _em_md_table,
    _em_html_table,
    lambda rng: _em_financial(rng, False),
    lambda rng: _em_financial(rng, True),
    _em_figure,
    _em_headings,
    _em_date,
    _em_letter_digit,
    _em_latex,
    _em_repeat,
    _em_empty,
    _em_newlines,
    _em_other_refs,
]


def _make_pdf(rng: np.random.Generator, n_pages: int) -> bytes:
    pages = []
    for _ in range(n_pages):
        fam = _FAMILIES[int(rng.integers(0, len(_FAMILIES)))]
        pages.append(
            {
                "width": int(rng.integers(600, 1400)),
                "height": int(rng.integers(800, 1900)),
                "emission": fam(rng),
            }
        )
    return build_pdf_payload(pages)


_HTML_TEMPLATE = """<html><head><title>{title}</title>
<script>window.track && window.track("pv");</script>
<style>body {{ margin: 0; }}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a></nav>
<div class="sidebar">{side_links}</div>
<div id="main-content">
{body}
</div>
<footer>Copyright 2026 {host}. <a href="/tos">Terms</a> <a href="/privacy">Privacy</a></footer>
</body></html>"""


def _make_html(rng: np.random.Generator, host: str, pad: int = 0):
    """Returns (html_bytes, main_text) — main_text is the golden extraction."""
    title = _words(rng, 4)
    paras = [_words(rng, int(rng.integers(20, 60))) for _ in range(int(rng.integers(2, 6)))]
    body = f"<h1>{title}</h1>\n" + "\n".join(f"<p>{p}</p>" for p in paras)
    if pad:
        # size skew: long link-farm sidebars inflate byte length, not content
        side = " ".join(
            f'<a href="/l{i}">{_words(rng, 2)}</a>' for i in range(pad)
        )
    else:
        side = '<a href="/x">related post</a>'
    html = _HTML_TEMPLATE.format(
        title=title, side_links=side, body=body, host=host
    )
    main_text = "\n\n".join([title] + paras)
    return html.encode("utf-8"), main_text


def generate_pages(
    n_docs: int = 60,
    seed: int = 42,
    pdf_fraction: float = 0.45,
    dup_fraction: float = 0.06,
    long_doc_every: int = 25,
    page_mu: float = 0.7,
    page_sigma: float = 0.8,
    words_scale: int = 1,
) -> pa.Table:
    """Build the synthetic pages table.

    Deterministic in all arguments.  ~30% of rows land on the hot host;
    ``long_doc_every`` inserts >40-page PDFs (multi-chunk fixture);
    duplicate urls are appended at the end with LATER warc_ts and different
    payloads (dedup keeps the earliest).
    """
    rng = _ScaledRng(np.random.default_rng(seed), words_scale)
    urls: List[str] = []
    ts: List[_dt.datetime] = []
    payloads: List[bytes] = []
    texts: List[str] = []
    langs: List[str] = []

    for i in range(n_docs):
        host = _HOT_HOST if rng.random() < 0.30 else _HOSTS[int(rng.integers(0, len(_HOSTS)))]
        url = f"https://{host}/doc/{i}"
        is_pdf = rng.random() < pdf_fraction
        if is_pdf:
            if long_doc_every and i % long_doc_every == long_doc_every - 1:
                n_pages = int(rng.integers(41, 50))  # multi-chunk fixture
            else:
                # log-normal-ish page-count skew
                n_pages = max(1, int(rng.lognormal(page_mu, page_sigma)))
            payload = _make_pdf(rng, n_pages)
            fallback = _words(rng, 12)
        else:
            pad = int(rng.lognormal(1.0, 1.6))  # byte-size skew via link farms
            payload, main_text = _make_html(rng, host, pad=pad)
            fallback = main_text[:120]
        urls.append(url)
        ts.append(_EPOCH + _dt.timedelta(seconds=i * 17))
        payloads.append(payload)
        texts.append(fallback)
        langs.append(_LANGS[int(rng.integers(0, len(_LANGS)))])

    # duplicate-url rows (later crawl of the same url, different payload)
    n_dups = max(1, int(n_docs * dup_fraction))
    for j in range(n_dups):
        src = int(rng.integers(0, n_docs))
        urls.append(urls[src])
        # relative to the ORIGINAL row's ts so the dup is later at any
        # n_docs (a fixed epoch offset inverts beyond ~152k docs)
        ts.append(ts[src] + _dt.timedelta(days=30, seconds=j))
        payload, _ = _make_html(rng, _HOSTS[0])
        payloads.append(payload)
        texts.append(texts[src])
        langs.append(langs[src])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_corpus(path: str, **kwargs) -> pa.Table:
    import pyarrow.parquet as pq

    table = generate_pages(**kwargs)
    pq.write_table(table, path, row_group_size=512)
    return table


def write_corpus_sharded(dir_path: str, n_shards: int = 32, **kwargs) -> int:
    """Write the corpus as a directory of shard files (the realistic input
    layout — a 100 TB crawl is tens of thousands of shards; a single file
    serializes the read).  Small row groups let readers split further."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    table = generate_pages(**kwargs)
    n = table.num_rows
    per = (n + n_shards - 1) // n_shards
    for i in range(n_shards):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(
            table.slice(lo, min(per, n - lo)),
            os.path.join(dir_path, f"part-{i:05d}.parquet"),
            row_group_size=256,
        )
    return n
