"""Checkpoint manifest + exact resume (north_rule requirement)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from deepseek_ocr_customvllm_ray.config import ExtractConfig
from deepseek_ocr_customvllm_ray.pipelines.resumable import run_resumable
from deepseek_ocr_customvllm_ray.sources.corpus import write_corpus
from deepseek_ocr_customvllm_ray.state import manifest as mf

CFG = ExtractConfig(ocr_concurrency=2)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_corpus(str(p), n_docs=30, seed=21)
    return str(p)


def read_out(out_dir):
    df = pq.read_table(out_dir).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


class TestManifestPrimitives:
    def test_shard_stable(self):
        assert mf.shard_of_host("a.example.com", 16) == mf.shard_of_host("a.example.com", 16)
        assert 0 <= mf.shard_of_host("x", 16) < 16

    def test_atomic_record_roundtrip(self, tmp_path):
        rec = {"shard_id": 3, "n_docs": 5, "content_hash": 123}
        mf.write_manifest_record(str(tmp_path), rec)
        got = mf.read_manifest(str(tmp_path))
        assert got[3]["n_docs"] == 5

    def test_torn_manifest_ignored(self, tmp_path):
        mdir = tmp_path / mf.MANIFEST_DIR
        mdir.mkdir()
        (mdir / "shard=9.json").write_text("{not json")
        assert mf.read_manifest(str(tmp_path)) == {}


class TestResume:
    def test_cold_run_writes_manifest(self, ray_session, corpus_path, tmp_path):
        out = str(tmp_path / "out")
        res = run_resumable(corpus_path, out, n_shards=8, cfg=CFG)
        assert res["completed_before"] == []
        assert len(res["processed"]) >= 1
        recs = mf.read_manifest(out)
        assert set(recs) == set(res["processed"])
        # output dirs exist exactly for shards that produced documents;
        # empty shards get zero-records (done, not pending) and no dir
        shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
        nonzero = {sid for sid, r in recs.items() if r["n_docs"] > 0}
        assert sorted(int(d.split("=")[1]) for d in shard_dirs) == sorted(nonzero)

    def test_resume_equals_cold(self, ray_session, corpus_path, tmp_path):
        cold_dir = str(tmp_path / "cold")
        run_resumable(corpus_path, cold_dir, n_shards=8, cfg=CFG)
        cold = read_out(cold_dir)
        all_shards = sorted(mf.read_manifest(cold_dir))

        # simulate a crashed run: only half the shards finished, plus one
        # partial (un-manifested) shard dir with garbage inside
        resumed_dir = str(tmp_path / "resumed")
        half = set(all_shards[: len(all_shards) // 2])
        res1 = run_resumable(corpus_path, resumed_dir, n_shards=8, cfg=CFG, only_shards=half)
        assert set(res1["processed"]) == half
        victim = all_shards[-1]
        partial = os.path.join(resumed_dir, f"shard_id={victim}")
        os.makedirs(partial, exist_ok=True)
        with open(os.path.join(partial, "junk.parquet"), "wb") as f:
            f.write(b"partial garbage from a crashed writer")

        # resume: must clean the partial dir and process exactly the rest
        res2 = run_resumable(corpus_path, resumed_dir, n_shards=8, cfg=CFG)
        assert victim in res2["removed_partial"]
        assert set(res2["processed"]) == set(all_shards) - half
        assert set(res2["completed_before"]) == half

        resumed = read_out(resumed_dir)
        cold_cmp = cold.drop(columns=["shard_id"], errors="ignore")
        res_cmp = resumed.drop(columns=["shard_id"], errors="ignore")
        assert cold_cmp["url"].tolist() == res_cmp["url"].tolist()
        for col in ["markdown", "raw_md", "doc_json", "extracted_text", "n_pages"]:
            assert cold_cmp[col].tolist() == res_cmp[col].tolist(), col

        # manifests agree (content hashes are order-insensitive)
        m_cold = mf.read_manifest(cold_dir)
        m_res = mf.read_manifest(resumed_dir)
        assert set(m_cold) == set(m_res)
        for sid in m_cold:
            assert m_cold[sid]["content_hash"] == m_res[sid]["content_hash"]
            assert m_cold[sid]["n_docs"] == m_res[sid]["n_docs"]

    def test_fully_complete_run_skips_everything(self, ray_session, corpus_path, tmp_path):
        out = str(tmp_path / "done")
        run_resumable(corpus_path, out, n_shards=8, cfg=CFG)
        res = run_resumable(corpus_path, out, n_shards=8, cfg=CFG)
        assert res["processed"] == []
