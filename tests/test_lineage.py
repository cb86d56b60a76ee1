"""Lineage records (G2/K9 analog): correctness + order-insensitivity."""

import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.lineage import host_lineage, shard_lineage_records
from deepseek_ocr_customvllm_ray.state.manifest import doc_hash63, shard_of_host


def _docs_table():
    rows = [
        ("https://hot.example.com/a", "md-a", 2),
        ("https://hot.example.com/b", "md-b", 1),
        ("https://cold.example.com/c", "md-c", 3),
    ]
    return pa.table({
        "url": [r[0] for r in rows],
        "markdown": [r[1] for r in rows],
        "n_pages": pa.array([r[2] for r in rows], pa.int32()),
    })


class TestHostLineage:
    def test_counts_and_hash(self, ray_session):
        import ray.data as rd

        out = host_lineage(rd.from_arrow(_docs_table()), n_shards=8).to_pandas()
        by_host = out.set_index("url_host")
        assert by_host.loc["hot.example.com", "n_docs"] == 2
        assert by_host.loc["hot.example.com", "n_pages"] == 3
        assert by_host.loc["cold.example.com", "n_docs"] == 1
        expect = doc_hash63("https://hot.example.com/a", "md-a") ^ doc_hash63(
            "https://hot.example.com/b", "md-b"
        )
        assert int(by_host.loc["hot.example.com", "content_hash"]) == expect

    def test_order_insensitive_hash(self, ray_session):
        import ray.data as rd

        t = _docs_table()
        rev = t.take(list(reversed(range(t.num_rows))))
        a = host_lineage(rd.from_arrow(t), 8).to_pandas().set_index("url_host")
        b = host_lineage(rd.from_arrow(rev), 8).to_pandas().set_index("url_host")
        for h in a.index:
            assert a.loc[h, "content_hash"] == b.loc[h, "content_hash"]

    def test_shard_records_roll_up(self, ray_session):
        import ray.data as rd

        recs = shard_lineage_records(rd.from_arrow(_docs_table()), n_shards=8)
        assert sum(r["n_docs"] for r in recs) == 3
        sids = {shard_of_host("hot.example.com", 8), shard_of_host("cold.example.com", 8)}
        assert {r["shard_id"] for r in recs} == sids
