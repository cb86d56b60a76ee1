"""Benchmark decontamination (stages/decontam.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.decontam import (
    decontaminate,
    flag_contaminated,
    make_contamination_batch,
)


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_flags_and_counts():
    out = make_contamination_batch("text", "doc_id", ["the cat", "dog"])(
        _batch([
            "the cat sat",          # 1 hit
            "dog meets the cat",    # 2 hits
            "unrelated text",       # clean
            "cathedral dogma",      # 'dog' IS a substring of 'dogma'
        ])
    )
    assert out["contaminated"].to_pylist() == [True, True, False, True]
    assert out["n_hits"].to_pylist() == [1, 2, 0, 1]


def test_substring_not_token_semantics():
    """Contract is substring containment (== SQL contains), not word
    match — documented, and what n-gram contamination checks want."""
    out = make_contamination_batch("text", "doc_id", ["at s"])(_batch(["the cat sat"]))
    assert out["contaminated"].to_pylist() == [True]


def test_empty_phrases_rejected():
    with pytest.raises(ValueError):
        make_contamination_batch("text", "doc_id", [])
    with pytest.raises(ValueError):
        decontaminate(None, "text", [])


def test_null_text_is_clean_and_kept(ray_session):
    """Null text matches nothing: flagged clean, and NOT silently dropped
    by the filter (a bare invert(null) would drop it)."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the cat", None], pa.string()),
    })
    out = make_contamination_batch("text", "doc_id", ["cat"])(t)
    assert out["contaminated"].to_pylist() == [True, False]
    assert out["n_hits"].to_pylist() == [1, 0]
    clean = decontaminate(rd.from_arrow(t), "text", ["cat"]).to_pandas()
    assert clean["doc_id"].tolist() == [1]


def test_repeated_phrase_counts_once():
    """n_hits counts DISTINCT phrases present, not occurrences."""
    out = make_contamination_batch("text", "doc_id", ["ab"])(_batch(["ab ab ab"]))
    assert out["n_hits"].to_pylist() == [1]


def test_dataset_flag_and_filter(ray_session):
    import ray.data as rd

    t = _batch(["keep me", "drop the cat", "also keep"])
    flagged = (
        flag_contaminated(rd.from_arrow(t), "text", "doc_id", ["the cat"])
        .to_pandas().sort_values("doc_id")
    )
    assert flagged["contaminated"].tolist() == [False, True, False]
    clean = decontaminate(rd.from_arrow(t), "text", ["the cat"]).to_pandas()
    assert sorted(clean["text"]) == ["also keep", "keep me"]
    # all columns pass through the filter
    assert sorted(clean.columns) == ["doc_id", "text"]
