"""Robustness corpus (M20 analog) + CER evaluation harness (G4)."""

import numpy as np
import pytest

from deepseek_ocr_customvllm_ray.config import ExtractConfig
from deepseek_ocr_customvllm_ray.sources import robustness as rb
from deepseek_ocr_customvllm_ray.sources.corpus import generate_pages
from deepseek_ocr_customvllm_ray.sources.golden import run_golden
from deepseek_ocr_customvllm_ray.stages.dedup import exact_dedup_shuffle


class TestPerturb:
    def test_deterministic(self):
        a = rb.perturb_text("hello world example text", 0.1, np.random.default_rng(3))
        b = rb.perturb_text("hello world example text", 0.1, np.random.default_rng(3))
        assert a == b

    def test_severity_zero_keeps_most(self):
        t = "the quick brown fox" * 5
        out = rb.perturb_text(t, 0.01, np.random.default_rng(1))
        assert abs(len(out) - len(t)) < 10

    def test_empty(self):
        assert rb.perturb_text("", 0.5, np.random.default_rng(0)) == ""


class TestCerEval:
    def test_noise_increases_cer(self):
        corpus = generate_pages(n_docs=20, seed=9, pdf_fraction=1.0)
        clean = run_golden(corpus).to_pandas()
        mild = run_golden(rb.perturb_pages_table(corpus, 0.02, seed=5)).to_pandas()
        severe = run_golden(rb.perturb_pages_table(corpus, 0.15, seed=5)).to_pandas()
        r0 = rb.corpus_cer_eval(clean, clean)
        r1 = rb.corpus_cer_eval(clean, mild)
        r2 = rb.corpus_cer_eval(clean, severe)
        assert r0["mean_cer"] == 0.0
        assert 0.0 < r1["mean_cer"] < r2["mean_cer"]
        assert r1["n_docs"] == len(clean)


class TestExactDedupShuffle:
    def test_matches_broadcast_variant(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
        t = pa.table({"doc_id": list(range(6)), "text": texts})
        out = exact_dedup_shuffle(rd.from_arrow(t), "text", "doc_id", num_partitions=4)
        df = out.to_pandas()
        assert sorted(df["doc_id"]) == [0, 1, 3]
