"""Deterministic hash sampling (stages/sampling.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.sampling import (
    _threshold_hex,
    epoch_shuffle,
    hash_sample,
    make_hash_sample_batch,
    make_stratified_sample_batch,
    stratified_sample,
)


def _tbl(n=1000):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en", "de", "fr", "zh"][i % 4] for i in range(n)),
    })


def test_threshold_endpoints():
    assert _threshold_hex(0.0) == "00000000"
    # 'g' sorts after every hex digest -> fraction 1.0 keeps ALL rows,
    # including the ~1-in-2^32 whose prefix is exactly 'ffffffff'
    assert _threshold_hex(1.0) == "g"
    assert _threshold_hex(1.0) > "ffffffff"
    assert _threshold_hex(0.1) == "19999999"
    with pytest.raises(ValueError):
        _threshold_hex(1.5)
    with pytest.raises(ValueError):
        _threshold_hex(-0.1)


def test_fraction_zero_and_one():
    t = _tbl(200)
    assert make_hash_sample_batch("doc_id", 0.0)(t).num_rows == 0
    assert make_hash_sample_batch("doc_id", 1.0)(t).num_rows == 200


def test_rate_and_determinism():
    t = _tbl(5000)
    a = make_hash_sample_batch("doc_id", 0.1, seed=42)(t)
    b = make_hash_sample_batch("doc_id", 0.1, seed=42)(t)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert abs(a.num_rows / 5000 - 0.1) < 0.02
    c = make_hash_sample_batch("doc_id", 0.1, seed=7)(t)
    assert c["doc_id"].to_pylist() != a["doc_id"].to_pylist()


def test_fractions_nest():
    """Growing the fraction grows the subset monotonically (thresholds
    nest), so a pilot sample is a strict subset of a bigger one."""
    t = _tbl(3000)
    small = set(make_hash_sample_batch("doc_id", 0.05)(t)["doc_id"].to_pylist())
    big = set(make_hash_sample_batch("doc_id", 0.2)(t)["doc_id"].to_pylist())
    assert small < big


def test_stratified_rates_and_default():
    t = _tbl(4000)  # 1000 per lang
    out = make_stratified_sample_batch(
        "doc_id", "lang", {"en": 0.4, "de": 0.1}, default_fraction=0.02
    )(t)
    langs = out["lang"].to_pylist()
    rates = {l: langs.count(l) / 1000 for l in ("en", "de", "fr", "zh")}
    assert abs(rates["en"] - 0.4) < 0.05
    assert abs(rates["de"] - 0.1) < 0.03
    assert rates["fr"] < 0.05 and rates["zh"] < 0.05


def test_stratum_changes_threshold_not_digest():
    """The same doc_id is kept/dropped based on its stratum's threshold but
    the digest is stratum-independent: a doc kept under the LOW rate is
    always kept under the HIGH rate."""
    t = _tbl(2000)
    low = set(
        make_stratified_sample_batch("doc_id", "lang", {}, default_fraction=0.05)(t)[
            "doc_id"
        ].to_pylist()
    )
    high = set(
        make_stratified_sample_batch("doc_id", "lang", {}, default_fraction=0.3)(t)[
            "doc_id"
        ].to_pylist()
    )
    assert low < high


def test_epoch_shuffle_is_permutation(ray_session):
    """Same rows, new order; the order is a pure function of (seed, epoch)
    regardless of input block structure; epochs permute independently."""
    import ray.data as rd

    t = _tbl(400)
    a = epoch_shuffle(rd.from_arrow(t), "doc_id").to_pandas()
    assert "shuffle_key" not in a.columns  # helper column dropped
    assert "shuffle_key" in epoch_shuffle(
        rd.from_arrow(t), "doc_id", keep_key=True
    ).schema().names
    assert sorted(a["doc_id"]) == list(range(400))
    assert a["doc_id"].tolist() != list(range(400))
    # block structure must not matter
    b = epoch_shuffle(rd.from_arrow(t).repartition(7), "doc_id").to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # a different epoch is a different permutation of the same rows
    e1 = epoch_shuffle(rd.from_arrow(t), "doc_id", epoch=1).to_pandas()
    assert sorted(e1["doc_id"]) == list(range(400))
    assert e1["doc_id"].tolist() != a["doc_id"].tolist()


def test_dataset_paths_match_batch_paths(ray_session):
    import ray.data as rd

    t = _tbl(1000)
    got = sorted(
        hash_sample(rd.from_arrow(t), "doc_id", 0.15).to_pandas()["doc_id"]
    )
    want = sorted(make_hash_sample_batch("doc_id", 0.15)(t)["doc_id"].to_pylist())
    assert got == want

    got_s = sorted(
        stratified_sample(
            rd.from_arrow(t).repartition(5), "doc_id", "lang", {"en": 0.5}
        ).to_pandas()["doc_id"]
    )
    want_s = sorted(
        make_stratified_sample_batch("doc_id", "lang", {"en": 0.5})(t)[
            "doc_id"
        ].to_pylist()
    )
    assert got_s == want_s


class TestSplitAssign:
    def test_distribution_and_determinism(self, ray_session):
        import collections

        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.sampling import split_assign

        t = pa.table({"doc_id": pa.array(range(10000), pa.int64())})
        out = split_assign(
            rd.from_arrow(t), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        ).to_pandas()
        c = collections.Counter(out["split"])
        assert 8700 <= c["train"] <= 9300
        assert 350 <= c["val"] <= 650 and 350 <= c["test"] <= 650
        # stable across block structures
        out2 = split_assign(
            rd.from_arrow(t).repartition(9), "doc_id",
            {"train": 0.9, "val": 0.05, "test": 0.05},
        ).to_pandas().sort_values("doc_id")
        assert out.sort_values("doc_id")["split"].tolist() == out2["split"].tolist()

    def test_weights_validated(self):
        import pytest as _pytest

        from deepseek_ocr_customvllm_ray.stages.sampling import (
            make_split_assign_batch,
        )

        with _pytest.raises(ValueError):
            make_split_assign_batch("doc_id", {"a": 0.5, "b": 0.6})
        with _pytest.raises(ValueError):
            make_split_assign_batch("doc_id", {"a": 1.5, "b": -0.5})

    def test_single_split_takes_all(self):
        import pyarrow as pa

        from deepseek_ocr_customvllm_ray.stages.sampling import (
            make_split_assign_batch,
        )

        t = pa.table({"doc_id": pa.array(range(50), pa.int64())})
        out = make_split_assign_batch("doc_id", {"all": 1.0})(t)
        assert set(out["split"].to_pylist()) == {"all"}


class TestWeightedSample:
    """Efraimidis-Spirakis weighted sampling without replacement."""

    @staticmethod
    def _serial(ids, weights, k, seed=42):
        import hashlib
        import numpy as np

        keys = []
        for i, w in zip(ids, weights):
            if w is None or w <= 0:
                continue
            u = int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:13], 16
            ) / 2.0**52
            with np.errstate(divide="ignore"):
                keys.append((-np.log(u) / w, i, w))
        keys.sort()
        return [(i, w) for _k, i, w in keys[:k]]

    def _run(self, ids, weights, k, parallelism=4):
        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.sampling import weighted_sample

        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "w": pa.array(weights, pa.int64()),
        })
        ds = rd.from_arrow(t).repartition(parallelism)
        df = weighted_sample(ds, "doc_id", "w", k=k).to_pandas()
        return [(int(r.doc_id), int(r.w)) for r in df.itertuples(index=False)]

    def test_matches_serial_reference(self, ray_session):
        ids = list(range(200))
        weights = [(i % 13) + 1 for i in ids]
        for k in (1, 10, 50):
            assert self._run(ids, weights, k) == self._serial(ids, weights, k)

    def test_samples_nest(self, ray_session):
        """The size-k winner set is a prefix of the size-(k+10) set —
        keys are a pure function of (seed, row)."""
        ids = list(range(100))
        weights = [((i * 7) % 20) + 1 for i in ids]
        small = self._run(ids, weights, 5)
        big = self._run(ids, weights, 15)
        assert big[:5] == small

    def test_nonpositive_and_null_weights_excluded(self, ray_session):
        ids = [1, 2, 3, 4]
        weights = [0, -5, None, 100]
        assert self._run(ids, weights, 4) == [(4, 100)]

    def test_partition_invariant(self, ray_session):
        ids = list(range(120))
        weights = [(i % 9) + 1 for i in ids]
        want = self._serial(ids, weights, 20)
        for p in (1, 3, 16):
            assert self._run(ids, weights, 20, parallelism=p) == want, p

    def test_k_validated(self, ray_session):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._run([1], [1], 0)
