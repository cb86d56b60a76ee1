"""Bloom filter + HyperLogLog sketches."""

import numpy as np

from deepseek_ocr_customvllm_ray.functions.sketches import BloomFilter, HyperLogLog


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(1 << 16, 5)
        keys = [f"key-{i}" for i in range(5000)]
        bf.add_many(keys)
        assert bf.contains_many(keys).all()

    def test_low_false_positive_rate(self):
        bf = BloomFilter(1 << 16, 5)
        bf.add_many([f"key-{i}" for i in range(2000)])
        probes = [f"other-{i}" for i in range(10000)]
        fp = bf.contains_many(probes).mean()
        assert fp < 0.05

    def test_merge_is_union(self):
        a, b = BloomFilter(1 << 12, 4), BloomFilter(1 << 12, 4)
        a.add_many(["x", "y"])
        b.add_many(["z"])
        m = a.merge(b)
        assert m.contains_many(["x", "y", "z"]).all()

    def test_bytes_roundtrip(self):
        bf = BloomFilter(1 << 12, 4)
        bf.add_many(["alpha", "beta"])
        bf2 = BloomFilter.from_bytes(bf.to_bytes(), 1 << 12, 4)
        assert bf2.contains_many(["alpha", "beta"]).all()

    def test_empty(self):
        bf = BloomFilter(1 << 10, 3)
        assert bf.contains_many([]).shape == (0,)
        assert not bf.contains_many(["nope"]).any()


class TestHll:
    def test_estimate_within_tolerance(self):
        hll = HyperLogLog(p=12)
        n = 50000
        hll.add_many([f"item-{i}" for i in range(n)])
        est = hll.estimate()
        assert abs(est - n) / n < 0.05  # ~1.04/sqrt(4096) ≈ 1.6% expected

    def test_small_cardinality_linear_counting(self):
        hll = HyperLogLog(p=12)
        hll.add_many([f"v{i}" for i in range(100)])
        assert abs(hll.estimate() - 100) < 10

    def test_duplicates_dont_inflate(self):
        hll = HyperLogLog(p=12)
        hll.add_many(["same"] * 10000)
        assert hll.estimate() < 3

    def test_merge_equals_union(self):
        a, b = HyperLogLog(12), HyperLogLog(12)
        a.add_many([f"a{i}" for i in range(10000)])
        b.add_many([f"a{i}" for i in range(5000, 15000)])
        m = a.merge(b)
        assert abs(m.estimate() - 15000) / 15000 < 0.05

    def test_deterministic(self):
        a, b = HyperLogLog(10), HyperLogLog(10)
        for h in (a, b):
            h.add_many([f"x{i}" for i in range(1000)])
        assert (a.registers == b.registers).all()

    def test_bytes_roundtrip(self):
        a = HyperLogLog(10)
        a.add_many(["p", "q", "r"])
        b = HyperLogLog.from_bytes(a.to_bytes(), 10)
        assert a.estimate() == b.estimate()
