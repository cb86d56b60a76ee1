"""Sliding time-window aggregation units (stages/windows.py)."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.windows import rolling_time_agg


def _tbl(rows):
    ks, ts, vs = zip(*rows)
    return pa.table({
        "k": pa.array(ks, pa.string()),
        "hour": pa.array(
            [dt.datetime(2026, 1, 1) + dt.timedelta(hours=h) for h in ts],
            pa.timestamp("us"),
        ),
        "v": pa.array(vs, pa.int64()),
    })


def _run(ray_session, rows, window, parts=4):
    import ray.data as rd

    out = rolling_time_agg(
        rd.from_arrow(_tbl(rows)).repartition(3), "k", "hour", ["v"],
        window=window, num_partitions=parts,
    ).to_pandas()
    out["h"] = (
        out["hour"].to_numpy().astype("datetime64[ns]").astype("int64")
        // 3_600_000_000_000
        - int(np.datetime64("2026-01-01").astype("datetime64[h]").astype("int64"))
    )
    return {(r.k, r.h): r.rolling_v for r in out.itertuples()}


class TestRollingTimeAgg:
    def test_gaps_excluded_range_semantics(self, ray_session):
        # hours 0,1,5: window 3 at h=5 must NOT see h=0/1 (gap > window)
        got = _run(ray_session, [("a", 0, 10), ("a", 1, 20), ("a", 5, 40)], 3)
        assert got == {("a", 0): 10, ("a", 1): 30, ("a", 5): 40}

    def test_keys_isolated(self, ray_session):
        got = _run(ray_session, [("a", 0, 1), ("b", 1, 100), ("a", 1, 2)], 3)
        assert got == {("a", 0): 1, ("a", 1): 3, ("b", 1): 100}

    def test_window_one_is_identity(self, ray_session):
        rows = [("a", 0, 5), ("a", 1, 6), ("a", 2, 7)]
        got = _run(ray_session, rows, 1)
        assert got == {("a", 0): 5, ("a", 1): 6, ("a", 2): 7}

    def test_matches_serial_reference(self, ray_session):
        rng = np.random.default_rng(7)
        rows = []
        for k in "abcdefgh":
            hours = sorted(rng.choice(48, size=12, replace=False).tolist())
            for h in hours:
                rows.append((k, int(h), int(rng.integers(1, 100))))
        got = _run(ray_session, rows, 4, parts=5)
        exp = {}
        for k, h, v in rows:
            exp[(k, h)] = sum(
                v2 for k2, h2, v2 in rows if k2 == k and h - 3 <= h2 <= h
            )
        assert got == exp

    def test_window_validation(self, ray_session):
        import ray.data as rd

        with pytest.raises(ValueError):
            rolling_time_agg(
                rd.from_arrow(_tbl([("a", 0, 1)])), "k", "hour", ["v"], window=0
            )


class TestKeyLag:
    def _run(self, rows, parts=4):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_lag

        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1) + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
        })
        df = key_lag(
            rd.from_arrow(t), "user_id", "ts", "event_id", num_partitions=parts
        ).to_pandas()
        return {
            int(r.event_id): (
                None if r.delta_us != r.delta_us else int(r.delta_us)  # NaN check
            )
            for r in df.itertuples(index=False)
        }

    def test_hand_computed(self, ray_session):
        rows = [  # (event_id, user, seconds)
            (1, 7, 0), (2, 7, 10), (3, 7, 10), (4, 7, 25),
            (5, 8, 100),          # singleton user: null delta
        ]
        got = self._run(rows)
        assert got == {
            1: None,
            2: 10_000_000,
            3: 0,              # tie on ts: ordered by event_id, delta 0
            4: 15_000_000,
            5: None,
        }

    def test_partition_invariant(self, ray_session):
        rows = [(i, i % 5, (i * 37) % 600) for i in range(200)]
        want = self._run(rows, parts=1)
        for p in (3, 16):
            assert self._run(rows, parts=p) == want, p


class TestKeyRowNumber:
    def test_hand_computed_and_invariant(self, ray_session):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_row_number

        rows = [(1, 7, 5), (2, 7, 1), (3, 8, 9), (4, 7, 1)]  # tie: ids 2,4
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1) + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
        })
        want = {2: 1, 4: 2, 1: 3, 3: 1}  # ts asc, id tie-break
        for parts in (1, 4):
            df = key_row_number(
                rd.from_arrow(t), "user_id", "ts", "event_id",
                num_partitions=parts,
            ).to_pandas()
            got = {int(r.event_id): int(r.row_number)
                   for r in df.itertuples(index=False)}
            assert got == want, parts


class TestKeyCumsum:
    def _run(self, rows, parts=4):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_cumsum

        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1) + dt.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "v": pa.array([r[3] for r in rows], pa.int64()),
        })
        df = key_cumsum(
            rd.from_arrow(t), "user_id", "ts", "event_id", ["v"],
            num_partitions=parts,
        ).to_pandas()
        return {int(r.event_id): int(r.cum_v) for r in df.itertuples(index=False)}

    def test_hand_computed(self, ray_session):
        rows = [  # (event_id, user, seconds, v)
            (1, 7, 0, 10), (2, 7, 10, 5), (3, 7, 10, 1), (4, 7, 25, -3),
            (5, 8, 100, 42),
        ]
        # ties on ts order by event_id: 2 then 3
        assert self._run(rows) == {1: 10, 2: 15, 3: 16, 4: 13, 5: 42}

    def test_negative_and_zero_values(self, ray_session):
        rows = [(1, 1, 0, -5), (2, 1, 1, 0), (3, 1, 2, 5)]
        assert self._run(rows) == {1: -5, 2: -5, 3: 0}

    def test_partition_invariant(self, ray_session):
        rows = [(i, i % 7, (i * 37) % 600, (i * 13) % 101 - 50)
                for i in range(300)]
        want = self._run(rows, parts=1)
        for p in (3, 16):
            assert self._run(rows, parts=p) == want, p


class TestKeyRank:
    def _run(self, ray_session, rows, ntile=4, parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_rank

        ks, vs, ids = zip(*rows)
        t = pa.table({
            "k": pa.array(ks, pa.string()),
            "v": pa.array(vs, pa.int64()),
            "id": pa.array(ids, pa.int64()),
        })
        out = key_rank(
            rd.from_arrow(t).repartition(3), "k", "v", "id",
            ntile=ntile, num_partitions=parts,
        ).to_pandas()
        return {
            r.id: (r.rnk, r.dense_rnk, r.ntile_bucket)
            for r in out.itertuples()
        }

    def test_rank_ties_and_gaps(self, ray_session):
        # values desc: 30, 20, 20, 10 -> rank 1,2,2,4; dense 1,2,2,3
        got = self._run(
            ray_session,
            [("a", 30, 1), ("a", 20, 2), ("a", 20, 3), ("a", 10, 4)],
        )
        assert got[1][:2] == (1, 1)
        assert got[2][:2] == (2, 2)
        assert got[3][:2] == (2, 2)
        assert got[4][:2] == (4, 3)

    def test_ntile_uneven_buckets(self, ray_session):
        # 6 rows, ntile 4 -> bucket sizes 2,2,1,1 by (v desc, id)
        rows = [("a", 60 - i, i) for i in range(6)]
        got = self._run(ray_session, rows, ntile=4)
        assert [got[i][2] for i in range(6)] == [1, 1, 2, 2, 3, 4]

    def test_ntile_fewer_rows_than_buckets(self, ray_session):
        rows = [("a", 9, 0), ("a", 8, 1)]
        got = self._run(ray_session, rows, ntile=4)
        assert [got[i][2] for i in range(2)] == [1, 2]

    def test_keys_isolated(self, ray_session):
        got = self._run(
            ray_session, [("a", 5, 1), ("b", 9, 2), ("a", 7, 3)]
        )
        assert got[3] == (1, 1, 1) and got[1] == (2, 2, 2)
        assert got[2] == (1, 1, 1)

    def test_matches_duckdb(self, ray_session):
        import duckdb

        rng = np.random.default_rng(11)
        n = 400
        ks = rng.choice(list("abcdefg"), size=n)
        vs = rng.integers(0, 40, size=n)  # heavy ties
        rows = [(str(ks[i]), int(vs[i]), i) for i in range(n)]
        got = self._run(ray_session, rows, ntile=3, parts=5)
        con = duckdb.connect()
        con.register(
            "t",
            pd.DataFrame({"k": [r[0] for r in rows],
                          "v": [r[1] for r in rows],
                          "id": [r[2] for r in rows]}),
        )
        want = con.execute(
            "SELECT id, RANK() OVER (PARTITION BY k ORDER BY v DESC) r,"
            " DENSE_RANK() OVER (PARTITION BY k ORDER BY v DESC) d,"
            " NTILE(3) OVER (PARTITION BY k ORDER BY v DESC, id) q FROM t"
        ).fetchall()
        for id_, r, d, q in want:
            assert got[id_] == (r, d, q), id_


class TestKeyMode:
    def _run(self, ray_session, rows, parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_mode

        ks, cs = zip(*rows)
        t = pa.table({
            "k": pa.array(ks, pa.int64()),
            "c": pa.array(cs, pa.string()),
        })
        out = key_mode(
            rd.from_arrow(t).repartition(3), "k", "c", num_partitions=parts
        ).to_pandas()
        return {r.k: (r.c, r.n) for r in out.itertuples()}

    def test_majority_wins(self, ray_session):
        got = self._run(
            ray_session, [(1, "x"), (1, "y"), (1, "x"), (2, "z")]
        )
        assert got == {1: ("x", 2), 2: ("z", 1)}

    def test_tie_breaks_lexicographically(self, ray_session):
        got = self._run(ray_session, [(1, "b"), (1, "a"), (1, "b"), (1, "a")])
        assert got == {1: ("a", 2)}

    def test_matches_duckdb(self, ray_session):
        import duckdb

        rng = np.random.default_rng(3)
        rows = [
            (int(rng.integers(0, 25)), str(rng.choice(list("uvwxyz"))))
            for _ in range(600)
        ]
        got = self._run(ray_session, rows, parts=6)
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame({"k": [r[0] for r in rows],
                               "c": [r[1] for r in rows]})
        )
        want = con.execute(
            "WITH cnt AS (SELECT k, c, count(*) n FROM t GROUP BY 1,2) "
            "SELECT k, c, n FROM cnt QUALIFY row_number() OVER "
            "(PARTITION BY k ORDER BY n DESC, c) = 1"
        ).fetchall()
        assert got == {k: (c, n) for k, c, n in want}


class TestKeyLeadBounds:
    def _run(self, ray_session, rows, parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_lead_bounds

        ks, ts, vs, ids = zip(*rows)
        t = pa.table({
            "k": pa.array(ks, pa.string()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m) for m in ts],
                pa.timestamp("us"),
            ),
            "v": pa.array(vs, pa.int64()),
            "id": pa.array(ids, pa.int64()),
        })
        out = key_lead_bounds(
            rd.from_arrow(t).repartition(3), "k", "ts", "id", "v",
            num_partitions=parts,
        ).to_pandas()
        return {
            r.id: (r.next_ts, r.first_value, r.last_value)
            for r in out.itertuples()
        }

    def test_lead_null_on_last(self, ray_session):
        got = self._run(
            ray_session, [("a", 0, 10, 1), ("a", 5, 20, 2), ("b", 3, 7, 3)]
        )
        assert got[1][0] == pd.Timestamp(2026, 1, 1, 0, 5)
        assert pd.isna(got[2][0]) and pd.isna(got[3][0])

    def test_bounds_cover_whole_partition(self, ray_session):
        got = self._run(
            ray_session,
            [("a", 2, 20, 1), ("a", 0, 10, 2), ("a", 9, 90, 3)],
        )
        # order by ts: id2(v=10) first, id3(v=90) last — for EVERY row
        for i in (1, 2, 3):
            assert got[i][1] == 10 and got[i][2] == 90

    def test_ties_order_by_id(self, ray_session):
        got = self._run(
            ray_session, [("a", 0, 5, 2), ("a", 0, 6, 1)]
        )
        # tie on ts -> id 1 first: first_value=6, last_value=5
        for i in (1, 2):
            assert got[i][1] == 6 and got[i][2] == 5

    def test_matches_duckdb(self, ray_session):
        import duckdb

        rng = np.random.default_rng(5)
        n = 300
        rows = [
            (str(rng.choice(list("abcde"))), int(rng.integers(0, 50)),
             int(rng.integers(-20, 100)), i)
            for i in range(n)
        ]
        got = self._run(ray_session, rows, parts=5)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({
            "k": [r[0] for r in rows],
            "ts": [dt.datetime(2026, 1, 1) + dt.timedelta(minutes=r[1])
                   for r in rows],
            "v": [r[2] for r in rows],
            "id": [r[3] for r in rows],
        }))
        want = con.execute(
            "SELECT id, LEAD(ts) OVER w, FIRST_VALUE(v) OVER w2, "
            "LAST_VALUE(v) OVER w2 FROM t "
            "WINDOW w AS (PARTITION BY k ORDER BY ts, id), "
            "w2 AS (PARTITION BY k ORDER BY ts, id ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ).fetchall()
        for id_, nxt, fv, lv in want:
            g = got[id_]
            assert (pd.isna(g[0]) and nxt is None) or g[0] == nxt
            assert (g[1], g[2]) == (fv, lv), id_


class TestKeyFunnel:
    def _run(self, ray_session, rows, steps=("A", "B", "C"), parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_funnel

        ks, ts, cs = zip(*rows)
        t = pa.table({
            "k": pa.array(ks, pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m) for m in ts],
                pa.timestamp("us"),
            ),
            "c": pa.array(cs, pa.string()),
        })
        out = key_funnel(
            rd.from_arrow(t).repartition(3), "k", "ts", "c",
            steps=list(steps), num_partitions=parts,
        ).to_pandas()
        return {r.k: r for r in out.itertuples()}

    def test_full_funnel(self, ray_session):
        got = self._run(ray_session, [(1, 0, "A"), (1, 5, "B"), (1, 9, "C")])
        r = got[1]
        assert r.n_steps == 3
        assert r.t_A == pd.Timestamp(2026, 1, 1, 0, 0)
        assert r.t_C == pd.Timestamp(2026, 1, 1, 0, 9)

    def test_out_of_order_does_not_count(self, ray_session):
        # B happens BEFORE the first A -> funnel stalls at step 1
        got = self._run(ray_session, [(1, 5, "A"), (1, 2, "B"), (1, 9, "C")])
        r = got[1]
        assert r.n_steps == 1 and pd.isna(r.t_B) and pd.isna(r.t_C)

    def test_strictly_after(self, ray_session):
        # same-timestamp B does not complete step 2 (strict >)
        got = self._run(ray_session, [(1, 3, "A"), (1, 3, "B")])
        assert got[1].n_steps == 1

    def test_min_after_prev_step(self, ray_session):
        # two Bs after A: the earlier one wins; C after it completes
        got = self._run(
            ray_session,
            [(1, 0, "A"), (1, 8, "B"), (1, 4, "B"), (1, 6, "C"), (1, 2, "C")],
        )
        r = got[1]
        assert r.t_B == pd.Timestamp(2026, 1, 1, 0, 4)
        assert r.t_C == pd.Timestamp(2026, 1, 1, 0, 6)
        assert r.n_steps == 3

    def test_no_first_step(self, ray_session):
        got = self._run(ray_session, [(1, 0, "B"), (1, 1, "C"), (2, 0, "A")])
        assert got[1].n_steps == 0 and pd.isna(got[1].t_A)
        assert got[2].n_steps == 1


class TestKeyMedian:
    def _run(self, ray_session, rows, parts=4):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import key_median

        ks, vs = zip(*rows)
        t = pa.table({
            "k": pa.array(ks, pa.string()),
            "v": pa.array(vs, pa.int64()),
        })
        out = key_median(
            rd.from_arrow(t).repartition(3), "k", "v", num_partitions=parts
        ).to_pandas()
        return dict(zip(out["k"], out["median"]))

    def test_odd_and_even_counts(self, ray_session):
        got = self._run(
            ray_session,
            [("a", 1), ("a", 9), ("a", 5), ("b", 4), ("b", 10)],
        )
        assert got == {"a": 5.0, "b": 7.0}

    def test_nulls_dropped_and_null_only_key_absent(self, ray_session):
        got = self._run(
            ray_session, [("a", 3), ("a", None), ("b", None)]
        )
        assert got == {"a": 3.0}

    def test_matches_duckdb(self, ray_session):
        import duckdb

        rng = np.random.default_rng(23)
        rows = [
            (f"k{int(rng.integers(0, 40))}", int(rng.integers(-50, 50)))
            for _ in range(700)
        ]
        got = self._run(ray_session, rows, parts=6)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"k": [r[0] for r in rows],
                                        "v": [r[1] for r in rows]}))
        want = dict(con.execute(
            "SELECT k, median(v) FROM t GROUP BY k"
        ).fetchall())
        assert got == {k: float(v) for k, v in want.items()}


class TestKeyFunnelDifferential:
    def test_matches_duckdb_random(self, ray_session):
        import duckdb

        from deepseek_ocr_customvllm_ray.stages.windows import key_funnel
        import ray.data as rd

        rng = np.random.default_rng(31)
        n = 500
        t = pa.table({
            "k": pa.array(rng.integers(0, 30, n), pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1)
                 + dt.timedelta(minutes=int(m))
                 for m in rng.integers(0, 200, n)],
                pa.timestamp("us"),
            ),
            "c": pa.array(rng.choice(["A", "B", "C", "X"], n), pa.string()),
        })
        out = key_funnel(
            rd.from_arrow(t).repartition(3), "k", "ts", "c",
            steps=["A", "B", "C"], num_partitions=5,
        ).to_pandas()
        got = {
            r.k: (r.t_A, r.t_B, r.t_C, r.n_steps) for r in out.itertuples()
        }
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        want = con.execute(
            "WITH s1 AS (SELECT k, min(ts) AS ta FROM t WHERE c='A' "
            "GROUP BY k), "
            "s2 AS (SELECT t.k, min(ts) AS tb FROM t JOIN s1 ON t.k = s1.k "
            "AND ts > ta WHERE c='B' GROUP BY t.k), "
            "s3 AS (SELECT t.k, min(ts) AS tc FROM t JOIN s2 ON t.k = s2.k "
            "AND ts > tb WHERE c='C' GROUP BY t.k), "
            "u AS (SELECT DISTINCT k FROM t) "
            "SELECT u.k, ta, tb, tc FROM u LEFT JOIN s1 USING (k) "
            "LEFT JOIN s2 USING (k) LEFT JOIN s3 USING (k)"
        ).fetchall()
        for k, ta, tb, tc in want:
            g = got[k]
            for i, w in enumerate((ta, tb, tc)):
                if w is None:
                    assert pd.isna(g[i]), (k, i)
                else:
                    assert g[i] == w, (k, i)
            assert g[3] == sum(x is not None for x in (ta, tb, tc))


class TestKeyPercentiles:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import (
            key_percentiles,
        )

        rng = np.random.default_rng(41)
        n = 400
        t = pa.table({
            "k": pa.array(rng.integers(0, 25, n), pa.int64()),
            "v": pa.array(rng.integers(0, 30, n), pa.int64()),  # ties
            "id": pa.array(range(n), pa.int64()),
        })
        out = key_percentiles(
            rd.from_arrow(t).repartition(3), "k", "v", "id",
            num_partitions=5,
        ).to_pandas()
        got = {r.id: (r.pct_rank, r.cume_dist) for r in out.itertuples()}
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        want = con.execute(
            "SELECT id, PERCENT_RANK() OVER w, CUME_DIST() OVER w FROM t "
            "WINDOW w AS (PARTITION BY k ORDER BY v)"
        ).fetchall()
        for id_, p, c in want:
            assert got[id_] == (p, c), id_

    def test_single_row_key(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.windows import (
            key_percentiles,
        )

        t = pa.table({
            "k": pa.array([7], pa.int64()),
            "v": pa.array([5], pa.int64()),
            "id": pa.array([0], pa.int64()),
        })
        out = key_percentiles(rd.from_arrow(t), "k", "v", "id").to_pandas()
        assert out["pct_rank"].tolist() == [0.0]
        assert out["cume_dist"].tolist() == [1.0]
