"""Exact-quantile selection (stages/quantiles.py) vs numpy/DuckDB ground
truth — the engine must reproduce SQL ``percentile_disc`` (ceil-rank)
semantics exactly, including duplicate-heavy, constant, tiny, and
float-boundary-hostile columns."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_customvllm_ray.stages.quantiles import exact_quantiles

PS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _disc(vals, p):
    """percentile_disc reference: 1-indexed rank ceil(p*n) of sorted vals."""
    s = np.sort(np.asarray(vals))
    return s[max(1, math.ceil(p * len(s))) - 1]


def _run(vals, ps=PS, **kw):
    typ = pa.int64() if all(isinstance(v, (int, np.integer)) for v in vals) else pa.float64()
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, typ)})).repartition(8)
    return exact_quantiles(ds, "x", ps, **kw)


def test_matches_numpy_disc_int():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50_000, size=20_000).tolist()
    t = _run(vals, max_candidates=500)  # force refinement rounds
    for p, v in zip(t["p"].to_pylist(), t["value"].to_pylist()):
        assert v == _disc(vals, p), p


def test_matches_duckdb_quantile_disc():
    rng = np.random.default_rng(11)
    # duplicate-heavy: zipf-ish ints
    vals = (rng.zipf(1.3, size=5_000) % 1000).astype(np.int64).tolist()
    t = _run(vals, max_candidates=200)
    con = duckdb.connect()
    con.register("v", pa.table({"x": pa.array(vals, pa.int64())}))
    for p, v in zip(t["p"].to_pylist(), t["value"].to_pylist()):
        (want,) = con.execute(
            f"SELECT quantile_disc(x, {p}) FROM v"
        ).fetchone()
        assert v == want, p


def test_float_column():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1e6, size=8_000).tolist()
    t = _run(vals, max_candidates=300)
    for p, v in zip(t["p"].to_pylist(), t["value"].to_pylist()):
        assert v == pytest.approx(_disc(vals, p), abs=0.0), p


def test_constant_and_tiny():
    t = _run([42] * 1000)
    assert t["value"].to_pylist() == [42] * len(PS)
    t = _run([5])
    assert t["value"].to_pylist() == [5] * len(PS)
    t = _run([3, 1, 2], ps=[0.5, 1.0])
    assert t["value"].to_pylist() == [2, 3]


def test_nulls_and_nans_excluded():
    tbl = pa.table({
        "x": pa.array([1.0, None, float("nan"), 2.0, 3.0, 4.0], pa.float64())
    })
    ds = ray.data.from_arrow(tbl)
    t = exact_quantiles(ds, "x", [0.5])
    assert t["value"].to_pylist() == [2.0]


def test_empty():
    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    t = exact_quantiles(ds, "x", [0.5])
    assert len(t) == 0


def test_adversarial_boundary_values():
    # values engineered to sit exactly on bucket boundaries of the first
    # histogram round: lo=0, hi=2048 with nb=2048 gives w=1.0 — every
    # integer lands ON a boundary; the predicate chain must stay exact.
    vals = list(range(0, 2049)) * 5
    t = _run(vals, max_candidates=50, n_buckets=2048)
    for p, v in zip(t["p"].to_pylist(), t["value"].to_pylist()):
        assert v == _disc(vals, p), p


# --- grouped variant --------------------------------------------------------

from deepseek_ocr_customvllm_ray.stages.quantiles import grouped_exact_quantiles


def _run_grouped(groups, vals, ps=(0.25, 0.5, 0.75), **kw):
    t = pa.table({
        "g": pa.array(groups, pa.string()),
        "x": pa.array(vals, pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = grouped_exact_quantiles(ds, "x", "g", list(ps), **kw).to_pandas()
    return {(r.g, r.p): int(r.value) for r in out.itertuples(index=False)}


def test_grouped_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    groups = [f"g{i % 4}" for i in range(4000)]
    vals = rng.integers(0, 100_000, size=4000).tolist()
    got = _run_grouped(groups, vals, max_candidates=200)  # force refinement
    for g in {f"g{i}" for i in range(4)}:
        sub = [v for gg, v in zip(groups, vals) if gg == g]
        for p in (0.25, 0.5, 0.75):
            assert got[(g, p)] == _disc(sub, p), (g, p)


def test_grouped_matches_duckdb(ray_session):
    rng = np.random.default_rng(9)
    groups = [["en", "fr", "de"][i % 3] for i in range(900)]
    vals = (rng.zipf(1.5, size=900) % 10_000).astype(np.int64).tolist()
    got = _run_grouped(groups, vals, max_candidates=100)
    con = duckdb.connect()
    con.register("t", pa.table({
        "g": pa.array(groups, pa.string()), "x": pa.array(vals, pa.int64())
    }))
    for p in (0.25, 0.5, 0.75):
        for g, v in con.execute(
            f"SELECT g, quantile_disc(x, {p}) FROM t GROUP BY g"
        ).fetchall():
            assert got[(g, p)] == v, (g, p)


def test_grouped_skewed_group_sizes_and_constant_group(ray_session):
    groups = ["big"] * 5000 + ["tiny"] * 3 + ["const"] * 50
    vals = list(range(5000)) + [7, 3, 11] + [42] * 50
    got = _run_grouped(groups, vals, max_candidates=64)
    assert got[("const", 0.5)] == 42
    assert got[("tiny", 0.5)] == _disc([7, 3, 11], 0.5)
    assert got[("big", 0.75)] == _disc(list(range(5000)), 0.75)


def test_grouped_null_keys_and_values_excluded(ray_session):
    t = pa.table({
        "g": pa.array(["a", "a", None, "b", "b"], pa.string()),
        "x": pa.array([1, None, 5, 10, 20], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = grouped_exact_quantiles(ds, "x", "g", [0.5]).to_pandas()
    got = {(r.g, r.p): int(r.value) for r in out.itertuples(index=False)}
    assert got == {("a", 0.5): 1, ("b", 0.5): 10}


def test_infinities_resolve_by_count(ray_session):
    """+/-inf stall naive range refinement (inf bucket width); they must
    resolve positionally and leave the finite refinement intact."""
    vals = [float("-inf")] * 10 + list(range(100)) + [float("inf")] * 40
    t = _run([float(v) for v in vals], ps=[0.05, 0.5, 0.9],
             max_candidates=16)  # force refinement on the finite part
    got = dict(zip(t["p"].to_pylist(), t["value"].to_pylist()))
    assert got[0.05] == float("-inf")   # rank 8 <= 10 negs
    assert got[0.5] == _disc(vals, 0.5)
    assert got[0.9] == float("inf")     # rank 135 > 110
    # grouped variant: one group full of +inf, one mixed
    import ray

    tb = pa.table({
        "g": pa.array(["inf"] * 5 + ["mix"] * 20, pa.string()),
        "x": pa.array([float("inf")] * 5
                      + [float(i) for i in range(19)] + [float("-inf")],
                      pa.float64()),
    })
    out = grouped_exact_quantiles(
        ray.data.from_arrow(tb).repartition(4), "x", "g", [0.5],
        max_candidates=4,
    ).to_pandas()
    got2 = {(r.g, r.p): r.value for r in out.itertuples(index=False)}
    assert got2[("inf", 0.5)] == float("inf")
    assert got2[("mix", 0.5)] == _disc(
        [float(i) for i in range(19)] + [float("-inf")], 0.5
    )
