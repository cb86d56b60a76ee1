"""DSIR hashed-n-gram importance resampling (stages/dsir.py;
Xie et al. 2023)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.dsir import (
    _doc_feature_buckets,
    bucket_distribution,
    dsir_select,
    log_ratio_vector,
    make_importance_score_batch,
)

B = 1 << 10  # small bucket space for tests


def arr(texts):
    return pa.array(texts, pa.string())


class TestFeatureBuckets:
    def test_batch_shape_invariance(self):
        texts = ["the cat sat", "dogs bark loud tonight", "", None, "one"]
        d_all, b_all, c_all = _doc_feature_buckets(arr(texts), B)
        # same docs split across two batches -> same per-doc features
        d1, b1, c1 = _doc_feature_buckets(arr(texts[:2]), B)
        d2, b2, c2 = _doc_feature_buckets(arr(texts[2:]), B)
        got_all = sorted(zip(d_all.tolist(), b_all.tolist(), c_all.tolist()))
        got_split = sorted(
            list(zip(d1.tolist(), b1.tolist(), c1.tolist()))
            + [(d + 2, b, c) for d, b, c in zip(d2.tolist(), b2.tolist(), c2.tolist())]
        )
        assert got_all == got_split

    def test_counts_unigrams_plus_bigrams(self):
        # "a b a" -> unigrams a,b,a + bigrams (a,b),(b,a): total count 5
        d, b, c = _doc_feature_buckets(arr(["a b a"]), B)
        assert c.sum() == 5
        assert (d == 0).all()

    def test_repeated_token_accumulates(self):
        d1, b1, c1 = _doc_feature_buckets(arr(["x x x x"]), B)
        # 4 unigrams of the same bucket + 3 identical bigrams -> 2 rows
        assert sorted(c1.tolist()) == [3, 4]

    def test_empty_and_null_produce_nothing(self):
        d, b, c = _doc_feature_buckets(arr(["", None, "   "]), B)
        assert len(d) == 0


class TestDistributionAndRatio:
    def test_bucket_distribution_matches_local(self, ray_session):
        import ray.data as rd

        texts = ["alpha beta gamma", "beta beta", "gamma delta epsilon zeta"]
        t = pa.table({"text": arr(texts)})
        vec = bucket_distribution(rd.from_arrow(t).repartition(3), "text", B)
        d, b, c = _doc_feature_buckets(arr(texts), B)
        want = np.zeros(B, dtype=np.int64)
        np.add.at(want, b, c)
        assert np.array_equal(vec, want)
        assert vec.sum() == c.sum()

    def test_log_ratio_shapes_and_direction(self):
        p = np.zeros(8, dtype=np.int64)
        q = np.zeros(8, dtype=np.int64)
        p[3] = 100  # bucket 3 is target-heavy
        q[5] = 100  # bucket 5 is raw-heavy
        lr = log_ratio_vector(p, q, alpha=1.0)
        assert lr[3] > 0 > lr[5]
        assert lr.shape == (8,)


class TestSelect:
    def _tables(self):
        # raw corpus: half the docs speak "quantum", half speak "pasta";
        # target corpus is all-quantum -> quantum docs must win
        raw = pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": arr(
                ["quantum physics entangles qubits deeply"] * 10
                + ["pasta recipe needs tomato basil"] * 10
            ),
        })
        target = pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": arr(["quantum qubits entangle in quantum physics"] * 3),
        })
        return raw, target

    def test_target_like_docs_selected(self, ray_session):
        import ray.data as rd

        raw, target = self._tables()
        out = dsir_select(
            rd.from_arrow(raw), rd.from_arrow(target), "text", "doc_id",
            k=8, n_buckets=B, seed=7,
        ).to_pandas()
        assert len(out) == 8
        assert set(out["doc_id"]) <= set(range(10))  # all quantum docs

    def test_deterministic_and_partition_invariant(self, ray_session):
        import ray.data as rd

        raw, target = self._tables()
        a = dsir_select(
            rd.from_arrow(raw), rd.from_arrow(target), "text", "doc_id",
            k=5, n_buckets=B, seed=3,
        ).to_pandas()
        b = dsir_select(
            rd.from_arrow(raw).repartition(7), rd.from_arrow(target),
            "text", "doc_id", k=5, n_buckets=B, seed=3,
        ).to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["gumbel_key"].tolist() == b["gumbel_key"].tolist()

    def test_seed_changes_gumbel_not_weight(self, ray_session):
        import ray.data as rd
        import ray

        raw, target = self._tables()
        from deepseek_ocr_customvllm_ray.stages.dsir import (
            bucket_distribution as bd,
        )

        p = bd(ray.data.from_arrow(target), "text", B)
        q = bd(ray.data.from_arrow(raw), "text", B)
        lr_ref = ray.put(log_ratio_vector(p, q))
        f1 = make_importance_score_batch("text", "doc_id", lr_ref, B, seed=1)
        f2 = make_importance_score_batch("text", "doc_id", lr_ref, B, seed=2)
        o1, o2 = f1(raw), f2(raw)
        assert o1["weight"].to_pylist() == o2["weight"].to_pylist()
        assert o1["gumbel_key"].to_pylist() != o2["gumbel_key"].to_pylist()

    def test_k_validation(self, ray_session):
        import ray.data as rd

        raw, target = self._tables()
        with pytest.raises(ValueError):
            dsir_select(rd.from_arrow(raw), rd.from_arrow(target),
                        "text", "doc_id", k=0, n_buckets=B)
