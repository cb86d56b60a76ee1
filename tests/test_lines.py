"""Line/paragraph granularity operators (stages/lines.py).

Semantic evidence for the C4-style line filter (Raffel et al. 2020 §2.2)
and the Lee et al. 2022 paragraph exact dedup: hand-computed expectations,
a serial pure-Python reference parity sweep, and the edge cases (null /
empty docs, within-doc duplicates, fully-emptied docs, single-line docs).
The DuckDB oracles for the wired queries live in ``__ray_entry__.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.lines import (
    make_line_filter_batch,
    paragraph_dedup,
)


def _batch(ids, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


# --- line filter ----------------------------------------------------------


def test_line_filter_hand_computed():
    fn = make_line_filter_batch("text", "doc_id", min_words=3, badwords=("bad",))
    out = fn(_batch(
        [1, 2, 3],
        [
            "one two three\nshort\nx bad y z",   # keep line 0 only
            "a b\nc d",                            # all lines too short -> doc dropped
            "alpha beta gamma delta",              # single line, kept verbatim
        ],
    ))
    assert out["doc_id"].to_pylist() == [1, 3]
    assert out["text"].to_pylist() == ["one two three", "alpha beta gamma delta"]
    assert out["n_lines"].to_pylist() == [3, 1]
    assert out["n_kept"].to_pylist() == [1, 1]


def test_line_filter_null_and_empty_docs_dropped():
    fn = make_line_filter_batch("text", "doc_id", min_words=1)
    out = fn(_batch([1, 2, 3], [None, "", "ok line"]))
    assert out["doc_id"].to_pylist() == [3]


def test_line_filter_empty_batch_keeps_schema():
    fn = make_line_filter_batch("text", "doc_id")
    out = fn(_batch([], []))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "text", "n_lines", "n_kept"]


def test_line_filter_badword_is_substring():
    """Badword matching is substring containment (C4 uses a phrase list);
    'bad' inside 'badge' also trips it — documented contract."""
    fn = make_line_filter_batch("text", "doc_id", min_words=1, badwords=("bad",))
    out = fn(_batch([1], ["shiny badge here\nclean line here"]))
    assert out["text"].to_pylist() == ["clean line here"]
    assert out["n_kept"].to_pylist() == [1]


# --- paragraph dedup ------------------------------------------------------


def _serial_paragraph_dedup(rows, sep="\n"):
    """Pure-Python reference: first (doc_id, idx) occurrence survives."""
    seen = {}
    paras = []
    for doc_id, text in sorted(rows):
        if text is None or text == "":
            continue
        for idx, p in enumerate(text.split(sep)):
            key = (doc_id, idx)
            if p not in seen:
                seen[p] = key
            paras.append((doc_id, idx, p, seen[p] == key))
    out = {}
    for doc_id, idx, p, keep in paras:
        d = out.setdefault(doc_id, {"kept": [], "n_paras": 0})
        d["n_paras"] += 1
        if keep:
            d["kept"].append(p)
    return {
        doc_id: (sep.join(d["kept"]), d["n_paras"], len(d["kept"]))
        for doc_id, d in out.items()
        if d["kept"]
    }


def _run(ray_session, rows, **kw):
    import ray.data as rd

    ds = rd.from_arrow(_batch([r[0] for r in rows], [r[1] for r in rows]))
    df = (
        paragraph_dedup(ds, "text", "doc_id", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return {
        int(r.doc_id): (r.text, int(r.n_paras), int(r.n_kept))
        for r in df.itertuples(index=False)
    }


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_paragraph_dedup_hand_computed(ray_session, strategy):
    rows = [
        (1, "alpha\nbeta\nalpha"),     # within-doc repeat: idx 2 cut
        (2, "beta\ngamma"),            # beta already owned by doc 1
        (3, "alpha"),                  # loses its only para -> dropped
        (4, None),                     # null -> dropped
        (5, "delta"),                  # untouched
    ]
    got = _run(ray_session, rows, num_partitions=4, strategy=strategy)
    assert got == {
        1: ("alpha\nbeta", 3, 2),
        2: ("gamma", 2, 1),
        5: ("delta", 1, 1),
    }


def test_paragraph_dedup_no_duplicates_is_identity(ray_session):
    rows = [(i, f"unique {i} one\nunique {i} two") for i in range(20)]
    got = _run(ray_session, rows, num_partitions=4)
    assert got == {i: (rows[i][1], 2, 2) for i in range(20)}


def test_paragraph_dedup_matches_serial_reference(ray_session):
    """Randomized corpus with heavy cross- and within-doc duplication."""
    import random

    rng = random.Random(7)
    vocab = [f"para {i} words here" for i in range(12)]
    rows = [
        (doc_id, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 6))))
        for doc_id in range(60)
    ]
    for parts in (3, 16):
        for strategy in ("broadcast", "shuffle"):
            got = _run(ray_session, rows, num_partitions=parts, strategy=strategy)
            assert got == _serial_paragraph_dedup(rows), (parts, strategy)


def test_paragraph_dedup_empty_paragraphs_dedup_too(ray_session):
    """Empty strings between separators are paragraphs like any other:
    the first (doc 1, idx 1) survives, every later one is cut."""
    rows = [(1, "a\n\nb"), (2, "\nc")]
    got = _run(ray_session, rows, num_partitions=2)
    assert got == {1: ("a\n\nb", 3, 3), 2: ("c", 2, 1)}
