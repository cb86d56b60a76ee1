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


class TestCountMin:
    def test_never_underestimates_and_small_overestimate(self):
        import numpy as np

        from deepseek_ocr_customvllm_ray.functions.sketches import CountMinSketch

        rng = np.random.default_rng(5)
        keys = [f"k{i}" for i in range(5000)]
        true = {k: int(rng.integers(1, 50)) for k in keys}
        s = CountMinSketch(width=2048, depth=4)
        s.add_many(list(true), list(true.values()))
        est = s.query_many(list(true))
        t = np.array(list(true.values()))
        assert (est >= t).all()  # one-sided error
        total = int(t.sum())
        # eps = e/width; allow 3x slack on the expected bound
        assert (est - t).max() <= 3 * 2.718 * total / 2048

    def test_merge_equals_single_pass(self):
        from deepseek_ocr_customvllm_ray.functions.sketches import CountMinSketch

        a = CountMinSketch(64, 3)
        b = CountMinSketch(64, 3)
        a.add_many(["x", "y", "x"])
        b.add_many(["y", "z"], [10, 2])
        one = CountMinSketch(64, 3)
        one.add_many(["x", "y", "x", "y", "z"], [1, 1, 1, 10, 2])
        assert (a.merge(b).table == one.table).all()

    def test_roundtrip_and_empty(self):
        from deepseek_ocr_customvllm_ray.functions.sketches import CountMinSketch

        s = CountMinSketch(32, 2)
        s.add_many(["a"], [7])
        r = CountMinSketch.from_bytes(s.to_bytes(), 32, 2)
        assert (r.table == s.table).all()
        assert r.query_many(["a"])[0] >= 7
        assert s.query_many([]).size == 0
        s.add_many([])  # no-op


class TestLogHistogram:
    def test_quantiles_within_bin_error(self):
        import numpy as np

        from deepseek_ocr_customvllm_ray.functions.sketches import LogHistogram

        rng = np.random.default_rng(9)
        vals = rng.lognormal(mean=5.0, sigma=1.5, size=20000).astype(np.int64) + 1
        h = LogHistogram(sub=16)
        h.add_many(vals)
        rel_bound = 2 ** (1 / 16) - 1  # bin ratio
        for q in (0.1, 0.5, 0.9, 0.99):
            exact = float(np.quantile(vals, q))
            est = h.quantile(q)
            assert abs(est - exact) / exact <= 2 * rel_bound + 0.01, (q, est, exact)

    def test_merge_order_free(self):
        import numpy as np

        from deepseek_ocr_customvllm_ray.functions.sketches import LogHistogram

        a, b, c = LogHistogram(), LogHistogram(), LogHistogram()
        a.add_many([1, 5, 9]); b.add_many([100, 200]); c.add_many([7] * 10)
        one = LogHistogram()
        one.add_many([1, 5, 9, 100, 200] + [7] * 10)
        ab_c = a.merge(b).merge(c)
        c_ba = c.merge(b).merge(a)
        assert (ab_c.counts == one.counts).all()
        assert (c_ba.counts == one.counts).all()

    def test_empty_and_roundtrip(self):
        import math

        from deepseek_ocr_customvllm_ray.functions.sketches import LogHistogram

        h = LogHistogram()
        assert math.isnan(h.quantile(0.5))
        h.add_many([42])
        r = LogHistogram.from_bytes(h.to_bytes())
        assert r.quantile(0.5) == h.quantile(0.5)
        # clamping: zero/negative land in the first bin, huge in the last
        h.add_many([0, -5, 2**62])
        assert int(h.counts.sum()) == 4
