"""Group hash sampling + actor-pool quality scoring units."""

import hashlib

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.sampling import group_hash_sample
from deepseek_ocr_customvllm_ray.stages.scoring import QualityScorer, score_quality


class TestGroupHashSample:
    def _ds(self, n=40, groups=("a", "b", "c")):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "g": pa.array([groups[i % len(groups)] for i in range(n)], pa.string()),
        })).repartition(4)

    def test_matches_serial_md5_rank(self, ray_session):
        k, seed = 3, 42
        out = group_hash_sample(self._ds(), "g", "doc_id", k=k, seed=seed).to_pandas()
        exp = {}
        for i in range(40):
            g = "abc"[i % 3]
            rk = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]
            exp.setdefault(g, []).append((rk, i))
        want = sorted(i for g, v in exp.items() for _, i in sorted(v)[:k])
        assert sorted(out["doc_id"]) == want
        assert list(out.columns) == ["doc_id", "g"]  # _rk/_part stripped

    def test_small_groups_survive_whole(self, ray_session):
        out = group_hash_sample(self._ds(n=4), "g", "doc_id", k=10).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 3]

    def test_seed_changes_selection_but_not_count(self, ray_session):
        a = group_hash_sample(self._ds(), "g", "doc_id", k=3, seed=1).to_pandas()
        b = group_hash_sample(self._ds(), "g", "doc_id", k=3, seed=2).to_pandas()
        assert len(a) == len(b) == 9
        assert sorted(a["doc_id"]) != sorted(b["doc_id"])

    def test_k_validation(self, ray_session):
        with pytest.raises(ValueError):
            group_hash_sample(self._ds(), "g", "doc_id", k=0)


class TestQualityScorer:
    def test_hand_computed_logit(self):
        s = QualityScorer()
        out = s(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # doc1: 4 tokens, 3 distinct, 10 chars -> 2*4+3*3-1-40 = -24
            "text": pa.array(["aa bb aa c", "", None], pa.string()),
        })).to_pylist()
        assert out[0] == {
            "doc_id": 1, "n_chars": 10, "n_tokens": 4,
            "n_distinct_tokens": 3, "quality_logit": -24, "quality_ok": False,
        }
        # empty and null docs: all-zero features, logit = bias
        for r in out[1:]:
            assert r["n_tokens"] == r["n_distinct_tokens"] == 0
            assert r["quality_logit"] == -40 and not r["quality_ok"]

    def test_custom_weights_and_threshold(self):
        s = QualityScorer(weights={"w_tokens": 10, "bias": 0}, threshold=25)
        out = s(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x y z"], pa.string()),
        })).to_pylist()[0]
        # 10*3 + 3*3 - 0 - 0 = 39 > 25
        assert out["quality_logit"] == 39 and out["quality_ok"]

    def test_actor_pool_stage(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"tok{i} " * (i + 1) for i in range(20)], pa.string()),
        })).repartition(4)
        out = score_quality(ds, concurrency=2).to_pandas()
        assert len(out) == 20
        serial = QualityScorer()
        exp = serial(pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array([f"tok{i} " * (i + 1) for i in range(20)], pa.string()),
        })).to_pandas()
        got = out.sort_values("doc_id").reset_index(drop=True)
        assert got.equals(exp.sort_values("doc_id").reset_index(drop=True))
