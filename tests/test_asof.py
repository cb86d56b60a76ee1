"""As-of join units (stages/asof.py): differential vs pandas.merge_asof,
tie-break determinism, null keys/times, unmatched keys, empty right side,
string keys, and the dtype-contract errors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.asof import asof_join


def _run(left: pd.DataFrame, right: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data as rd

    out = asof_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2),
        **kw,
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


def _expected(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """pandas reference: dedupe right (k, t) to max rid, backward asof."""
    r2 = (
        right.sort_values(["k", "t", "rid"])
        .groupby(["k", "t"], as_index=False)
        .last()
    )
    return (
        pd.merge_asof(
            left.sort_values("t"), r2.sort_values("t"),
            on="t", by="k", direction="backward",
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _mk(seed=7, n_l=2000, n_r=1200, l_keys=40, r_keys=50):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, l_keys, n_l),
        "t": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_r) + 10_000,
        "k": rng.integers(0, r_keys, n_r),
        "t": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
        "val": rng.normal(size=n_r),
    })
    return left, right


def test_differential_vs_merge_asof(ray_session):
    left, right = _mk()
    got = _run(left, right, on="t", by="k", tiebreak="rid")
    exp = _expected(left, right)[["lid", "k", "t", "rid", "val"]]
    pd.testing.assert_frame_equal(got[["lid", "k", "t", "rid", "val"]], exp)
    # some rows match, some don't (left has keys absent in right and times
    # before any right row) — both paths genuinely exercised
    assert 0 < got["rid"].notna().sum() < len(got)


def test_tiebreak_collapses_equal_times_to_max(ray_session):
    left, right = _mk(seed=11, n_l=500, n_r=300)
    dup = right.iloc[:60].copy()
    dup["rid"] += 90_000  # same (k, t), larger rid, different val
    dup["val"] += 5.0
    right = pd.concat([right, dup], ignore_index=True)
    got = _run(left, right, on="t", by="k", tiebreak="rid")
    exp = _expected(left, right)[["lid", "k", "t", "rid", "val"]]
    pd.testing.assert_frame_equal(got[["lid", "k", "t", "rid", "val"]], exp)
    # any row matched to a duplicated (k, t) must carry the max-rid twin
    dup_rids = set(right.iloc[:60]["rid"])  # the smaller twin of each pair
    assert not set(got["rid"].dropna().astype(int)) & dup_rids


def test_null_left_key_and_time_survive_unmatched(ray_session):
    left, right = _mk(seed=3, n_l=50, n_r=40)
    left.loc[0, "k"] = None
    left.loc[1, "t"] = pd.NaT
    left["k"] = left["k"].astype("Int64")
    got = _run(left, right, on="t", by="k", tiebreak="rid")
    assert len(got) == 50  # LEFT join: nothing dropped
    assert pd.isna(got.loc[0, "rid"]) and pd.isna(got.loc[1, "rid"])


def test_empty_right_side_yields_all_nulls(ray_session):
    left, right = _mk(seed=5, n_l=30, n_r=10)
    right = right[right["k"] > 10**9]  # empty: schema not inferable
    schema = pa.schema([
        ("rid", pa.int64()), ("k", pa.int64()),
        ("t", pa.timestamp("ns")), ("val", pa.float64()),
    ])
    got = _run(left, right, on="t", by="k", tiebreak="rid",
               right_schema=schema)
    assert len(got) == 30
    assert got["rid"].isna().all() and got["val"].isna().all()


def test_empty_right_without_schema_raises(ray_session):
    import ray.data as rd

    left, right = _mk(seed=5, n_l=5, n_r=5)
    right = right[right["k"] > 10**9]
    with pytest.raises(ValueError, match="no inferable schema"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t", by="k")


def test_string_keys(ray_session):
    left, right = _mk(seed=9, n_l=400, n_r=250)
    left["k"] = "u" + left["k"].astype(str)
    right["k"] = "u" + right["k"].astype(str)
    got = _run(left, right, on="t", by="k", tiebreak="rid")
    exp = _expected(left, right)[["lid", "k", "t", "rid", "val"]]
    pd.testing.assert_frame_equal(got[["lid", "k", "t", "rid", "val"]], exp)


def test_equal_time_is_a_match(ray_session):
    left = pd.DataFrame({
        "lid": [0], "k": [1],
        "t": pd.to_datetime(["2026-01-01 12:00:00"]),
    })
    right = pd.DataFrame({
        "rid": [7], "k": [1],
        "t": pd.to_datetime(["2026-01-01 12:00:00"]),
        "val": [3.5],
    })
    got = _run(left, right, on="t", by="k", tiebreak="rid")
    assert got.loc[0, "rid"] == 7  # <=, not <


def test_column_collision_and_dtype_mismatch_raise(ray_session):
    import ray.data as rd

    left, right = _mk(n_l=10, n_r=10)
    bad = right.rename(columns={"rid": "lid"})  # collides with left
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_pandas(left), rd.from_pandas(bad), on="t", by="k")
    bad2 = right.copy()
    bad2["k"] = bad2["k"].astype(str)
    with pytest.raises(TypeError, match="by"):
        asof_join(rd.from_pandas(left), rd.from_pandas(bad2), on="t", by="k")
