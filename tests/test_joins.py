"""As-of join operator (co-partitioned union + merge_asof)."""

import datetime as dt

import pyarrow as pa
import pytest


def _mk(rows, schema):
    return pa.table({k: [r[i] for r in rows] for i, k in enumerate(schema)})


class TestAsofJoin:
    def test_backward_match_and_unmatched(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import asof_join

        t0 = dt.datetime(2026, 1, 1)

        def ts(d):
            return t0 + dt.timedelta(days=d)

        left = _mk(
            [(1, 100, ts(10)), (2, 100, ts(1)), (3, 200, ts(5)), (4, 300, ts(5))],
            ["event_id", "key", "ts"],
        )
        right = _mk(
            [(100, ts(2), "a"), (100, ts(9), "b"), (200, ts(5), "c")],
            ["key", "rts", "val"],
        )
        out = (
            asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="key", right_key="key",
                left_ts="ts", right_ts="rts",
                left_cols=["event_id"], right_cols=["val"],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got = dict(zip(out["event_id"].astype(int), out["val"]))
        assert got[1] == "b"      # latest right <= ts(10)
        assert got[2] is None     # ts(1) precedes every right row
        assert got[3] == "c"      # equal timestamps match (<=)
        assert got[4] is None     # key with no right side at all

    def test_null_keys_kept_unmatched(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import asof_join

        t0 = dt.datetime(2026, 1, 1)
        left = pa.table({
            "event_id": [1, 2],
            "key": pa.array([None, 100], pa.int64()),
            "ts": pa.array([t0, t0], pa.timestamp("us")),
        })
        right = pa.table({
            "key": pa.array([100, None], pa.int64()),
            "rts": pa.array([t0, t0], pa.timestamp("us")),
            "val": ["m", "never"],
        })
        out = (
            asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                "key", "key", "ts", "rts", ["event_id"], ["val"], num_partitions=2,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        got = dict(zip(out["event_id"].astype(int), out["val"]))
        assert got[1] is None     # null-key left row kept, unmatched
        assert got[2] == "m"      # normal match; null-key right row ignored

    def test_tie_winner_deterministic(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import asof_join

        t0 = dt.datetime(2026, 1, 1)
        left = pa.table({
            "event_id": [1],
            "key": pa.array([5], pa.int64()),
            "ts": pa.array([t0], pa.timestamp("us")),
        })
        right = pa.table({
            "key": pa.array([5, 5], pa.int64()),
            "rts": pa.array([t0, t0], pa.timestamp("us")),
            "val": ["b", "a"],
        })
        for _ in range(3):
            out = asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                "key", "key", "ts", "rts", ["event_id"], ["val"], num_partitions=2,
            ).to_pandas()
            assert out["val"].iloc[0] == "b"  # max by value columns


class TestHashJoin:
    def _tables(self):
        left = pa.table({
            "lid": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array([10, 10, 20, 30, None], pa.int64()),
            "lv": pa.array([100, 200, 300, 400, 500], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([10, 10, 20, 40, None], pa.int64()),
            "rv": ["a", "b", "c", "d", "never"],
        })
        return left, right

    def test_inner_cross_product_and_null_keys(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import hash_join

        left, right = self._tables()
        out = (
            hash_join(
                rd.from_arrow(left), rd.from_arrow(right), "k", "k",
                left_cols=["lid", "lv"], right_cols=["rv"],
                how="inner", num_partitions=4,
            )
            .to_pandas().sort_values(["lid", "rv"]).reset_index(drop=True)
        )
        got = list(zip(out["lid"].astype(int), out["rv"]))
        # key 10 appears 2x2 (SQL cross product within key); key 30 and the
        # null keys on both sides never match
        assert got == [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c")]
        assert out["lv"].dtype == "int64"  # cast back from the union padding

    def test_left_keeps_unmatched_and_null_key_rows(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import hash_join

        left, right = self._tables()
        out = (
            hash_join(
                rd.from_arrow(left), rd.from_arrow(right), "k", "k",
                left_cols=["lid"], right_cols=["rv"],
                how="left", num_partitions=4,
            )
            .to_pandas().sort_values(["lid", "rv"]).reset_index(drop=True)
        )
        by_lid = out.groupby("lid")["rv"].apply(list).to_dict()
        assert sorted(by_lid[1]) == ["a", "b"]
        assert by_lid[3] == ["c"]
        assert by_lid[4] == [None]  # unmatched left row kept
        assert by_lid[5] == [None]  # null-key left row kept (SQL LEFT JOIN)

    def test_bad_how_rejected(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import hash_join

        left, right = self._tables()
        with pytest.raises(ValueError):
            hash_join(
                rd.from_arrow(left), rd.from_arrow(right), "k", "k",
                left_cols=["lid"], right_cols=["rv"], how="outer",
            )


class TestRangeJoinCount:
    def test_window_counting(self, ray_session):
        import datetime as dt

        import pyarrow as pa
        import pandas as pd
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import range_join_count

        T = dt.datetime
        left = pa.table({
            "eid": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([10, 10, 20, 30], pa.int64()),
            "ts": pa.array(
                [T(2026, 3, 1), T(2026, 1, 5), T(2026, 3, 1), T(2026, 3, 1)],
                pa.timestamp("us"),
            ),
        })
        right = pa.table({
            "k": pa.array([10, 10, 10, 20], pa.int64()),
            "rts": pa.array(
                # for k=10: one inside 30d of Mar 1, one exactly AT Mar 1
                # (inclusive), one far older; k=20's order is AFTER the event
                [T(2026, 2, 15), T(2026, 3, 1), T(2025, 1, 1), T(2026, 4, 1)],
                pa.timestamp("us"),
            ),
        })
        out = (
            range_join_count(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="ts", right_ts="rts",
                window=pd.Timedelta(days=30), left_cols=["eid"], out_col="n",
            )
            .to_pandas().set_index("eid")["n"].to_dict()
        )
        assert out == {1: 2, 2: 0, 3: 0, 4: 0}

    def test_skewed_hot_key(self, ray_session):
        """One user with 10^4 orders (the pathological key the round-2
        key-merge materialized as an |L| x |R| product): the sort-sweep
        resolves it with two searchsorted bounds per left row.  Counts are
        verified against a direct per-row computation."""
        import datetime as dt

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import range_join_count

        t0 = dt.datetime(2026, 1, 1)
        n_orders = 10_000
        rng = np.random.default_rng(7)
        # hot key 1: 10^4 right rows over ~200 days; 50 left events
        hot_rts = [t0 + dt.timedelta(minutes=int(m)) for m in
                   np.sort(rng.integers(0, 200 * 24 * 60, n_orders))]
        left_ts = [t0 + dt.timedelta(days=int(d), hours=int(h))
                   for d, h in zip(rng.integers(0, 200, 50), rng.integers(0, 24, 50))]
        left = pa.table({
            "eid": pa.array(list(range(50)) + [999], pa.int64()),
            "k": pa.array([1] * 50 + [2], pa.int64()),
            "ts": pa.array(left_ts + [t0], pa.timestamp("us")),
        })
        right = pa.table({
            "k": pa.array([1] * n_orders, pa.int64()),
            "rts": pa.array(hot_rts, pa.timestamp("us")),
        })
        window = pd.Timedelta(days=90)
        out = (
            range_join_count(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="ts", right_ts="rts",
                window=window, left_cols=["eid"], out_col="n",
                num_partitions=4,
            )
            .to_pandas().set_index("eid")["n"].to_dict()
        )
        rts_arr = np.array(hot_rts, dtype="datetime64[us]")
        for eid, t in enumerate(left_ts):
            tnp = np.datetime64(t, "us")
            expect = int(((rts_arr <= tnp) & (rts_arr > tnp - window.to_numpy())).sum())
            assert out[eid] == expect
        assert out[999] == 0

    def test_null_key_left_row_unmatched(self, ray_session):
        import datetime as dt

        import pyarrow as pa
        import pandas as pd
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.joins import range_join_count

        left = pa.table({
            "eid": pa.array([1, 2], pa.int64()),
            "k": pa.array([5, None], pa.int64()),
            "ts": pa.array([dt.datetime(2026, 1, 10)] * 2, pa.timestamp("us")),
        })
        right = pa.table({
            "k": pa.array([5], pa.int64()),
            "rts": pa.array([dt.datetime(2026, 1, 9)], pa.timestamp("us")),
        })
        out = (
            range_join_count(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="ts", right_ts="rts",
                window=pd.Timedelta(days=30), left_cols=["eid"], out_col="n",
            )
            .to_pandas().set_index("eid")["n"].to_dict()
        )
        assert out == {1: 1, 2: 0}
