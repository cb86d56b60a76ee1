"""Distributed k-means / SemDeDup / mixture-rebalance units."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)
from deepseek_ocr_customvllm_ray.stages.sampling import rebalance_groups


def _vec_ds(vecs, ids=None, nparts=3):
    import ray.data as rd

    vecs = np.asarray(vecs, dtype=np.float64)
    ids = list(range(len(vecs))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
    })).repartition(nparts)


class TestKMeans:
    def test_separated_blobs_recovered(self, ray_session):
        # two tight blobs on orthogonal axes -> 2-means must split them
        rng = np.random.default_rng(0)
        a = np.tile([10.0, 0.0, 0.0], (20, 1)) + rng.normal(0, 0.1, (20, 3))
        b = np.tile([0.0, 10.0, 0.0], (20, 1)) + rng.normal(0, 0.1, (20, 3))
        ds = _vec_ds(np.vstack([a, b]))
        cents = kmeans_fit(ds, "embedding", "vec_id", 2, iters=5, seed=7)
        lab = kmeans_assign(ds, cents, "embedding", "vec_id").to_pandas()
        lab = lab.sort_values("vec_id")["cluster"].to_numpy()
        assert len(set(lab[:20])) == 1 and len(set(lab[20:])) == 1
        assert lab[0] != lab[20]

    def test_partition_invariant_bitwise(self, ray_session):
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(60, 8))
        outs = []
        for nparts in (1, 6):
            ds = _vec_ds(vecs, nparts=nparts)
            cents = kmeans_fit(ds, "embedding", "vec_id", 4, iters=3, seed=7)
            outs.append(cents)
        assert np.array_equal(outs[0], outs[1])  # bit-equal, not allclose

    def test_centroids_unit_norm(self, ray_session):
        rng = np.random.default_rng(2)
        ds = _vec_ds(rng.normal(size=(30, 5)) * 7)
        cents = kmeans_fit(ds, "embedding", "vec_id", 3, iters=2, seed=7)
        assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


class TestSemanticDedup:
    def test_exact_duplicates_drop_to_lowest_id(self, ray_session):
        base = np.eye(4)
        # ids 0..3 distinct; 10..13 duplicate them exactly
        vecs = np.vstack([base, base])
        ds = _vec_ds(vecs, ids=[0, 1, 2, 3, 10, 11, 12, 13])
        cents = kmeans_fit(ds, "embedding", "vec_id", 2, iters=3, seed=7)
        out = semantic_dedup(ds, "embedding", "vec_id", cents, 0.9).to_pandas()
        out = out.set_index("vec_id").sort_index()
        assert bool(out.loc[[0, 1, 2, 3], "keep"].all())
        assert not out.loc[[10, 11, 12, 13], "keep"].any()
        # every duplicate points at its exact twin (same basis vector)
        for i in range(4):
            assert out.loc[10 + i, "dup_of"] == i
        assert (out.loc[[0, 1, 2, 3], "dup_of"] == -1).all()

    def test_threshold_one_keeps_everything(self, ray_session):
        rng = np.random.default_rng(3)
        ds = _vec_ds(rng.normal(size=(20, 6)))
        cents = kmeans_fit(ds, "embedding", "vec_id", 3, iters=2, seed=7)
        out = semantic_dedup(ds, "embedding", "vec_id", cents, 1.01).to_pandas()
        assert bool(out["keep"].all()) and (out["dup_of"] == -1).all()

    def test_dedup_is_within_cluster_only(self, ray_session):
        # near-identical pair forced into DIFFERENT clusters survives:
        # the SemDeDup trade, pinned so a refactor that globalizes the
        # comparison (changing semantics) fails loudly
        vecs = np.vstack([np.tile([5, 0.0], (5, 1)), np.tile([0.0, 5], (5, 1))])
        ds = _vec_ds(vecs, nparts=2)
        cents = np.asarray([[1.0, 0.0], [0.0, 1.0]])
        out = semantic_dedup(ds, "embedding", "vec_id", cents, 0.9).to_pandas()
        # one keeper per cluster, not one global keeper
        assert int(out["keep"].sum()) == 2


class TestRebalanceGroups:
    def _docs(self, n=200):
        import ray.data as rd

        # group sizes 20/60/120 -> rates 1.0 / 1/3 / 1/6
        g = ["a"] * 20 + ["b"] * 60 + ["c"] * 120
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(g, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        })).repartition(4)

    def test_smallest_group_kept_whole(self, ray_session):
        out = rebalance_groups(self._docs(), "source", "doc_id", "n_chars").to_pandas()
        assert (out["source"] == "a").sum() == 20

    def test_matches_serial_threshold(self, ray_session):
        out = rebalance_groups(self._docs(), "source", "doc_id", "n_chars").to_pandas()
        rates = {"a": 1.0, "b": 20.0 / 60.0, "c": 20.0 / 120.0}
        for i, g in [(i, "abc"[0 if i < 20 else 1 if i < 80 else 2]) for i in range(200)]:
            dig = hashlib.md5(f"42:{i}".encode()).hexdigest()[:8]
            want = rates[g] >= 1.0 or dig < format(int(rates[g] * 16**8), "08x")
            assert (i in set(out["doc_id"])) == want

    def test_negative_weights_rejected(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "source": pa.array(["a"], pa.string()),
            "n_chars": pa.array([-5], pa.int64()),
        }))
        with pytest.raises(ValueError):
            rebalance_groups(ds, "source", "doc_id", "n_chars")
