"""BM25 top-k retrieval (stages/retrieval.py): serial-reference parity,
ranking sanity, edge cases.  The bit-exact DuckDB oracle for the wired
query lives in ``__ray_entry__.py`` (``bm25_topk``)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.retrieval import bm25_topk


def _serial(texts, terms, k, k1=1.2, b=0.75):
    docs = [
        (i, t.split()) for i, t in enumerate(texts)
        if t is not None and t.strip()
    ]
    n = len(docs)
    avgdl = sum(len(w) for _i, w in docs) / n
    out = []
    for i, words in docs:
        score = 0.0
        for term in terms:
            tf = words.count(term)
            df = sum(term in w for _j, w in docs)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + (b * len(words)) / avgdl)
            )
        if score > 0:
            out.append((i, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def _run(texts, terms, k, parallelism=4):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(parallelism)
    df = bm25_topk(ds, "text", "doc_id", terms, k=k).to_pandas()
    return [(int(r.doc_id), float(r.score)) for r in df.itertuples(index=False)]


def test_matches_serial_reference(ray_session):
    import random

    rng = random.Random(5)
    vocab = ["cat", "dog", "fish", "bird", "tree", "rock"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        for _ in range(120)
    ] + [None, "", "   "]
    got = _run(texts, ["cat", "fish"], k=15)
    want = _serial(texts, ["cat", "fish"], k=15)
    assert [i for i, _s in got] == [i for i, _s in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12), (gi, wi)


def test_tf_saturation_and_length_norm(ray_session):
    """More matches rank higher; at equal tf the shorter doc wins (length
    normalization)."""
    texts = [
        "cat cat cat filler filler",   # 0: high tf
        "cat filler filler",           # 1: tf 1, short
        "cat filler filler filler filler filler filler",  # 2: tf 1, long
        "filler only here",            # 3: no match
    ]
    got = _run(texts, ["cat"], k=10)
    assert [i for i, _s in got] == [0, 1, 2]


def test_no_matches_is_empty(ray_session):
    assert _run(["a b c", "d e f"], ["zzz"], k=5) == []


def test_partition_invariant(ray_session):
    texts = [f"term{i % 7} word{i % 3} pad" for i in range(80)]
    want = _run(texts, ["term1", "word2"], k=10, parallelism=1)
    for p in (2, 8):
        assert _run(texts, ["term1", "word2"], k=10, parallelism=p) == want


def test_validation(ray_session):
    with pytest.raises(ValueError):
        _run(["a"], [], k=5)
    with pytest.raises(ValueError):
        _run(["a"], ["a"], k=0)
