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


def test_shingle_index_build_and_probe():
    from deepseek_ocr_customvllm_ray.stages.decontam import build_shingle_index
    from deepseek_ocr_customvllm_ray.functions.hashing import shingle_hashes
    import numpy as np

    idx = build_shingle_index(["the quick brown fox", "jumps over it"], k=3)
    assert idx.dtype == np.uint64 and (idx[1:] > idx[:-1]).all()
    # every shingle of a benchmark text probes positive
    hs = shingle_hashes("the quick brown fox", 3)
    assert np.isin(hs, idx).all()
    # an unrelated text probes negative
    assert not np.isin(shingle_hashes("totally different words here", 3), idx).any()
    # short texts contribute their joined-words shingle
    short = build_shingle_index(["two words"], k=3)
    assert np.isin(shingle_hashes("two words", 3), short).all()
    assert build_shingle_index([], k=3).size == 0
    assert build_shingle_index([None, ""], k=3).size == 0


def test_flag_contaminated_by_index(ray_session):
    import ray.data as rd

    from deepseek_ocr_customvllm_ray.stages.decontam import (
        build_shingle_index,
        flag_contaminated_by_index,
    )

    idx = build_shingle_index(["alpha beta gamma delta"], k=3)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "x alpha beta gamma y",     # shares 'alpha beta gamma'
            "alpha beta gamma delta",   # shares both benchmark shingles
            "beta alpha gamma delta",   # same words, different order: clean
            None,                       # null: clean
        ], pa.string()),
    })
    out = (
        flag_contaminated_by_index(rd.from_arrow(t), "text", "doc_id", idx)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [True, True, False, False]
    assert out["n_shingle_hits"].tolist() == [1, 2, 0, 0]


class TestEmbeddingDecontam:
    def test_hits_and_threshold_margin(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.decontam import embedding_decontam

        bench = np.array([[1.0, 0.0], [0.0, 1.0]])
        vecs = [
            [1.0, 0.0],    # identical to bench 0 -> 1 hit (cos 1, bench1 cos 0)
            [1.0, 1.0],    # cos ~0.707 to both -> 2 hits
            [-1.0, -1.0],  # negative to both -> 0 hits
        ]
        t = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        })
        out = embedding_decontam(
            rd.from_arrow(t), bench, "embedding", "vec_id", threshold=0.5
        ).to_pandas().sort_values("vec_id")
        assert out["n_hits"].tolist() == [1, 2, 0]
        assert out["contaminated"].tolist() == [True, True, False]

    def test_zero_vector_never_contaminated(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.decontam import embedding_decontam

        t = pa.table({
            "vec_id": pa.array([7], pa.int64()),
            "embedding": pa.array([[0.0, 0.0]], pa.list_(pa.float64())),
        })
        out = embedding_decontam(
            rd.from_arrow(t), np.array([[1.0, 0.0]]), "embedding", "vec_id"
        ).to_pandas()
        assert out["n_hits"].tolist() == [0]

    def test_threshold_margin_on_driver_corpus(self):
        """Pin that the oracle threshold 0.35 is far from every actual
        cosine at sf0.01 (the SQL oracle recomputes cosines with a
        different summation order; a pair near the threshold could flip)."""
        import os

        import numpy as np
        import pyarrow.parquet as pq

        p = "/root/testdata/sf0.01/embeddings.parquet"
        if not os.path.exists(p):
            import pytest as _pytest

            _pytest.skip("driver testdata absent")
        t = pq.read_table(p, columns=["vec_id", "embedding"])
        V = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        bench = Vn[np.argsort(t["vec_id"].to_numpy())[:32]]
        margin = np.abs(Vn @ bench.T - 0.35).min()
        assert margin > 1e-6, margin
