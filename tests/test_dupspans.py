"""Duplicated token-span operators (stages/dupspans.py).

Semantic evidence for the Lee et al. 2022 substring-granularity dedup:
hand-computed expectations, a serial pure-Python reference parity sweep
over a duplication-heavy randomized corpus, and the edge cases (null /
empty docs, docs shorter than k, within-doc-only repeats, fully-scrubbed
docs).  The DuckDB oracles for the wired queries live in
``__ray_entry__.py`` (``dup_ngram_stats`` / ``scrub_dup_ngrams``).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.dupspans import (
    dup_ngram_stats,
    scrub_dup_ngrams,
)


def _batch(ids, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _serial(rows, k):
    """Pure-Python reference for BOTH operators.

    Returns ``(stats, scrub)``: ``stats[doc] = (n_kgrams, n_dup_kgrams)``,
    ``scrub[doc] = (text, n_tokens, n_removed)``.  Tokenization is
    ``text.split(' ')``; a gram is duplicated iff its exact string occurs
    in >= 2 distinct documents; every token covered by any duplicated
    occurrence is cut.
    """
    owners: dict[str, set] = {}
    parsed = {}
    for doc_id, text in rows:
        toks = [] if text is None else text.split(" ")
        gs = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        parsed[doc_id] = (toks, gs)
        for g in gs:
            owners.setdefault(g, set()).add(doc_id)
    dup = {g for g, d in owners.items() if len(d) >= 2}
    stats, scrub = {}, {}
    for doc_id, (toks, gs) in parsed.items():
        stats[doc_id] = (len(gs), sum(g in dup for g in gs))
        covered = set()
        for i, g in enumerate(gs):
            if g in dup:
                covered.update(range(i, i + k))
        kept = [t for q, t in enumerate(toks) if q not in covered]
        scrub[doc_id] = (" ".join(kept), len(toks), len(covered))
    return stats, scrub


def _run_stats(rows, k, **kw):
    import ray.data as rd

    ds = rd.from_arrow(_batch([r[0] for r in rows], [r[1] for r in rows]))
    df = dup_ngram_stats(ds, "text", "doc_id", k=k, **kw).to_pandas()
    return {
        int(r.doc_id): (int(r.n_kgrams), int(r.n_dup_kgrams))
        for r in df.itertuples(index=False)
    }


def _run_scrub(rows, k, **kw):
    import ray.data as rd

    ds = rd.from_arrow(_batch([r[0] for r in rows], [r[1] for r in rows]))
    df = scrub_dup_ngrams(ds, "text", "doc_id", k=k, **kw).to_pandas()
    return {
        int(r.doc_id): (r.text, int(r.n_tokens), int(r.n_removed))
        for r in df.itertuples(index=False)
    }


_HAND = [
    (1, "a b c d e"),            # shares "a b c" with doc 2
    (2, "x a b c y"),
    (3, "p q r p q r p q r"),    # within-doc repeats only: NOT duplicated
    (4, None),                   # null text
    (5, ""),                     # one empty token, shorter than k
    (6, "u v"),                  # shorter than k
]


def test_stats_hand_computed(ray_session):
    got = _run_stats(_HAND, k=3, num_partitions=4)
    assert got == {
        1: (3, 1),
        2: (3, 1),
        3: (7, 0),   # "p q r" occurs 3x but in ONE distinct doc
        4: (0, 0),
        5: (0, 0),
        6: (0, 0),
    }


def test_scrub_hand_computed(ray_session):
    got = _run_scrub(_HAND, k=3, num_partitions=4)
    assert got == {
        1: ("d e", 5, 3),          # tokens 0-2 covered by "a b c"@0
        2: ("x y", 5, 3),          # tokens 1-3 covered by "a b c"@1
        3: ("p q r p q r p q r", 9, 0),
        4: ("", 0, 0),
        5: ("", 1, 0),             # ''.split(' ') == [''] — one token kept
        6: ("u v", 2, 0),
    }


def test_scrub_all_occurrences_removed(ray_session):
    """Boilerplate has no canonical owner: BOTH copies are cut (unlike
    paragraph_dedup's first-occurrence-survives contract)."""
    rows = [(1, "license text here"), (2, "license text here end")]
    got = _run_scrub(rows, k=3, num_partitions=2)
    assert got == {1: ("", 3, 3), 2: ("end", 4, 3)}


def test_overlapping_dup_windows_cover_union(ray_session):
    """Two overlapping duplicated windows cover the union of their
    token ranges, not double-count it."""
    rows = [(1, "a b c d z"), (2, "a b c d w")]  # "a b c" and "b c d" both dup
    got = _run_scrub(rows, k=3, num_partitions=2)
    assert got[1] == ("z", 5, 4)
    assert got[2] == ("w", 5, 4)
    stats = _run_stats(rows, k=3, num_partitions=2)
    assert stats == {1: (3, 2), 2: (3, 2)}


def test_matches_serial_reference(ray_session):
    """Randomized duplication-heavy corpus, multiple partition counts
    and k values — partition-invariant and reference-exact."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(9)]
    rows = [
        (doc_id, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for doc_id in range(80)
    ] + [(80, None), (81, "")]
    for k in (2, 4):
        want_stats, want_scrub = _serial(rows, k)
        # align the null-doc expectation with the operator contract
        for parts in (3, 16):
            assert _run_stats(rows, k, num_partitions=parts) == want_stats, (k, parts)
            assert _run_scrub(rows, k, num_partitions=parts) == want_scrub, (k, parts)


def test_k_must_be_at_least_two(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_batch([1], ["a b"]))
    with pytest.raises(ValueError):
        dup_ngram_stats(ds, "text", "doc_id", k=1)
    with pytest.raises(ValueError):
        scrub_dup_ngrams(ds, "text", "doc_id", k=0)


def test_consecutive_spaces_are_empty_tokens(ray_session):
    """split(' ') semantics: 'a  b' is three tokens (a, '', b) — the
    SQL-replayable contract, not whitespace collapsing."""
    rows = [(1, "a  b c"), (2, "a  b d")]  # "a|''|b" is a shared 3-gram
    got = _run_scrub(rows, k=3, num_partitions=2)
    assert got[1] == ("c", 4, 3)
    assert got[2] == ("d", 4, 3)


def test_unique_corpus_scrub_is_identity(ray_session):
    """A corpus with no cross-document duplicated k-gram must come back
    byte-identical from scrub (the suppressor-never-perturbs property)."""
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(50)]
    got = _run_scrub(rows, k=3, num_partitions=4)
    assert got == {i: (t, len(t.split(" ")), 0) for i, t in rows}
    stats = _run_stats(rows, k=3, num_partitions=4)
    assert all(d == 0 for _n, d in stats.values())
