"""Similarity search: brute-force cosine top-k + IVF recall."""

import numpy as np
import pyarrow as pa


def _emb_table(n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return pa.table({
        "vec_id": list(range(n)),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    }), vecs


class TestKnnBrute:
    def test_matches_numpy_reference(self, ray_session):
        import ray.data as rd
        from deepseek_ocr_customvllm_ray.stages.similarity import knn_brute

        t, vecs = _emb_table()
        q = vecs[0]
        out = knn_brute(rd.from_arrow(t), np.asarray([q]), "embedding", "vec_id", k=5)
        # ground truth
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qu = q / np.linalg.norm(q)
        sims = unit @ qu
        expect = list(np.argsort(-sims)[:5])
        assert out["id"].tolist() == expect
        assert out["cosine"].iloc[0] > 0.999  # self-match first

    def test_multi_query(self, ray_session):
        import ray.data as rd
        from deepseek_ocr_customvllm_ray.stages.similarity import knn_brute

        t, vecs = _emb_table()
        out = knn_brute(rd.from_arrow(t), vecs[:3], "embedding", "vec_id", k=3)
        assert len(out) == 9
        firsts = out.groupby("query_no").first()["id"].tolist()
        assert firsts == [0, 1, 2]


class TestKnnIvf:
    def test_recall_vs_brute(self, ray_session):
        import ray.data as rd
        from deepseek_ocr_customvllm_ray.stages.similarity import knn_brute, knn_ivf

        t, vecs = _emb_table(n=400)
        q = vecs[7]
        brute = knn_brute(rd.from_arrow(t), np.asarray([q]), "embedding", "vec_id", k=10)
        ivf = knn_ivf(
            rd.from_arrow(t), np.asarray([q]), "embedding", "vec_id",
            k=10, n_clusters=8, n_probe=4,
        )
        overlap = len(set(brute["id"]) & set(ivf["id"]))
        assert overlap >= 6  # probing half the clusters keeps recall high
        assert ivf["id"].iloc[0] == 7  # self-match survives probing


class TestIvfIndex:
    def test_build_query_and_prune(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.similarity import (
            build_ivf_index,
            knn_brute,
            knn_ivf_index,
        )

        t, vecs = _emb_table(n=300)
        idx = str(tmp_path / "ivf")
        cents = build_ivf_index(rd.from_arrow(t), "embedding", "vec_id", idx, n_clusters=8)
        assert cents.shape[0] == 8
        # hive partition dirs exist
        parts = [d for d in os.listdir(os.path.join(idx, "vectors")) if d.startswith("cluster=")]
        assert len(parts) >= 2

        q = vecs[11]
        out = knn_ivf_index(idx, np.asarray([q]), k=10, n_probe=4)
        assert out["id"].iloc[0] == 11  # self-match
        brute = knn_brute(rd.from_arrow(t), np.asarray([q]), "embedding", "vec_id", k=10)
        overlap = len(set(out["id"]) & set(brute["id"]))
        assert overlap >= 6
