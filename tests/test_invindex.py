"""Inverted index units (stages/invindex.py)."""

import os

import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.invindex import (
    inverted_index,
    lookup_postings,
    make_pair_partial,
    write_inverted_index,
)


def _corpus():
    return pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": pa.array(
            ["b a a b", "a c", "", None], pa.string()
        ),
    })


class TestInvertedIndex:
    def test_pair_partial_dedupes_within_doc(self):
        out = make_pair_partial("text", "doc_id")(_corpus()).to_pylist()
        got = sorted((r["token"], r["doc_id"]) for r in out)
        assert got == [("a", 1), ("a", 3), ("b", 3), ("c", 1)]

    def test_index_postings_sorted_and_deduped(self, ray_session):
        import ray.data as rd

        out = inverted_index(
            rd.from_arrow(_corpus()).repartition(3), "text", "doc_id",
            num_partitions=4,
        ).to_pandas().sort_values("token").reset_index(drop=True)
        assert list(out["token"]) == ["a", "b", "c"]
        assert list(out["df"]) == [2, 1, 1]
        assert list(out["postings"]) == ["1,3", "3", "1"]

    def test_cross_batch_pair_dupes_collapse(self, ray_session):
        # the same (token, doc) pair arriving from two batches must not
        # produce a duplicate posting
        import ray.data as rd

        t = pa.table({
            "doc_id": pa.array([7, 7], pa.int64()),
            "text": pa.array(["x y", "x z"], pa.string()),
        })
        out = inverted_index(
            rd.from_arrow(t).repartition(2), "text", "doc_id"
        ).to_pandas()
        got = dict(zip(out["token"], out["postings"]))
        assert got == {"x": "7", "y": "7", "z": "7"}

    def test_write_and_point_lookup(self, ray_session, tmp_path):
        import ray.data as rd

        d = str(tmp_path / "idx")
        write_inverted_index(
            rd.from_arrow(_corpus()), d, "text", "doc_id", num_buckets=4
        )
        assert any(e.startswith("bucket=") for e in os.listdir(d))
        got = lookup_postings(d, ["a", "c", "missing"], num_buckets=4)
        assert got == {"a": "1,3", "c": "1"}

    def test_lookup_empty_index_dir(self, ray_session, tmp_path):
        assert lookup_postings(str(tmp_path), ["a"]) == {}
