"""As-of (backward temporal) join — the time-series operator Ray Data has
no built-in for: every LEFT row is matched to the single RIGHT row with the
same key and the greatest right time <= left time (SQL ``ASOF LEFT JOIN``,
pandas ``merge_asof`` with ``direction="backward"``).

The classic uses in a training-data pipeline: stamp each interaction event
with the most recent prior state change (last purchase before a click, last
config deploy before an error, last crawl of a page before a link was
observed), without materializing a dense state table.

Scale shape
-----------
Both sides are tagged and unioned, then ONE crc32(key) hash exchange
co-locates every key's left and right rows in the same partition (the same
single-exchange pattern as ``stages/windows.py``).  Each partition then
resolves ALL of its keys in one vectorized pass:

1. dense-rank the partition's keys (``np.unique`` over both sides),
2. lexsort the right side by (rank, time) and optionally collapse
   duplicate (key, time) rows to a deterministic winner (max tiebreak),
3. encode (rank, time) into ONE int64 composite
   ``rank * span + (time - t_min + 1)`` so a single global
   ``np.searchsorted(..., side="right") - 1`` lands every left row on its
   backward match — no per-key Python dispatch.  Left times are clipped
   into the span: clipping below lands the probe BEFORE the rank's first
   right entry (offset 0 < 1, rank check rejects), clipping above lands it
   on the rank's last entry, which is exactly the backward-join answer.

If a partition's ``n_ranks * span`` would overflow int64 (keys x time
range beyond ~4e18 — pathological skew), that partition alone falls back
to a per-key-group ``searchsorted`` loop with identical semantics.

Memory is bounded by the largest single partition (raise
``num_partitions`` for hot keys); payload columns cross the wire once.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE = "_asof_side"
_PART = "_asof_part"
# composite guard: rank * span must stay clear of int64
_MAX_COMPOSITE = 2**62


def _time_i64(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp/int column -> int64 numpy (unit-preserving; both sides of
    a join must carry the same unit, enforced by the union schema).  Nulls
    are pinned to 0 BEFORE the numpy conversion — a null would otherwise
    force a float64 array and silently round int64 times past 2^53 (the
    rows are masked out by the caller's validity vector regardless)."""
    t = col.type
    if not (pa.types.is_timestamp(t) or pa.types.is_integer(t)):
        raise TypeError(f"asof time column must be timestamp or integer, got {t}")
    col = pc.fill_null(pc.cast(col, pa.int64()), 0)
    return col.to_numpy(zero_copy_only=False)


def _resolve_partition(
    batch: pa.Table,
    on: str,
    by: str,
    right_value_cols: List[str],
    out_schema: pa.Schema,
    tiebreak: Optional[str],
) -> pa.Table:
    batch = batch.drop_columns([_PART])
    left = batch.filter(pc.equal(batch[_SIDE], 0)).drop_columns([_SIDE])
    right = batch.filter(pc.equal(batch[_SIDE], 1)).drop_columns([_SIDE])
    left_cols = [f.name for f in out_schema if f.name not in right_value_cols]
    left = left.select(left_cols)

    if left.num_rows == 0:
        return out_schema.empty_table()

    def _left_only() -> pa.Table:
        arrays = [left[c] for c in left_cols]
        for c in right_value_cols:
            arrays.append(pa.nulls(left.num_rows, out_schema.field(c).type))
        return pa.table(arrays, schema=out_schema)

    # right rows with a null key or time can never be a backward match
    if right.num_rows:
        right = right.filter(
            pc.and_(right[by].is_valid(), right[on].is_valid())
        )
    if right.num_rows == 0:
        return _left_only()

    lk = left[by]
    rk = right[by]
    l_valid = (
        lk.is_valid().to_numpy(zero_copy_only=False)
        & left[on].is_valid().to_numpy(zero_copy_only=False)
    )
    # dense ranks over BOTH sides so left probes share the right's rank
    # space; null left keys are pinned to an existing right key BEFORE the
    # numpy conversion (a numeric null would otherwise force float64 and
    # round 64-bit ids past 2^53) — those rows are masked by l_valid
    if pa.types.is_string(lk.type):
        pin = rk[0].as_py()
        lk_np = np.asarray(
            [pin if v is None else v for v in lk.to_pylist()], dtype=object
        )
        rk_np = np.asarray(rk.to_pylist(), dtype=object)
    else:
        pin = rk[0]
        lk_np = pc.fill_null(lk, pin).to_numpy(zero_copy_only=False)
        rk_np = rk.to_numpy(zero_copy_only=False)
    all_keys = np.concatenate([lk_np, rk_np])
    uniq, inv = np.unique(all_keys, return_inverse=True)
    l_rank = inv[: len(lk_np)]
    r_rank = inv[len(lk_np):]

    lt = _time_i64(left[on])
    rt = _time_i64(right[on])

    # sort right by (rank, time[, tiebreak]) and collapse (key, time) dupes
    if tiebreak is not None:
        tb = right[tiebreak].to_numpy(zero_copy_only=False)
        r_order = np.lexsort((tb, rt, r_rank))
    else:
        r_order = np.lexsort((rt, r_rank))
    r_rank_s = r_rank[r_order]
    rt_s = rt[r_order]
    if tiebreak is not None and len(r_order) > 1:
        # last of each (rank, time) run == max tiebreak (lexsort is stable)
        last = np.empty(len(r_order), dtype=bool)
        last[-1] = True
        last[:-1] = (r_rank_s[1:] != r_rank_s[:-1]) | (rt_s[1:] != rt_s[:-1])
        r_order = r_order[last]
        r_rank_s = r_rank_s[last]
        rt_s = rt_s[last]

    t_min = int(rt_s.min())
    t_max = int(rt_s.max())
    span = (t_max - t_min) + 2  # offsets live in [1, span-1]

    n_rank = len(uniq)
    if n_rank * span < _MAX_COMPOSITE:
        r_comp = r_rank_s.astype(np.int64) * span + (rt_s - t_min + 1)
        l_off = np.clip(lt - t_min + 1, 0, span - 1)
        l_comp = l_rank.astype(np.int64) * span + l_off
        pos = np.searchsorted(r_comp, l_comp, side="right") - 1
        valid = (
            l_valid
            & (pos >= 0)
            & (r_rank_s[np.clip(pos, 0, None)] == l_rank)
            & (rt_s[np.clip(pos, 0, None)] <= lt)
        )
    else:  # pathological key-count x time-span: per-key-group fallback
        pos = np.full(len(lt), -1, dtype=np.int64)
        starts = np.searchsorted(r_rank_s, np.arange(n_rank), side="left")
        ends = np.searchsorted(r_rank_s, np.arange(n_rank), side="right")
        for i in range(len(lt)):
            if not l_valid[i]:
                continue
            s, e = starts[l_rank[i]], ends[l_rank[i]]
            if s == e:
                continue
            p = s + np.searchsorted(rt_s[s:e], lt[i], side="right") - 1
            if p >= s:
                pos[i] = p
        valid = pos >= 0

    safe_pos = np.clip(pos, 0, None)
    take_idx = pa.array(
        r_order[safe_pos].astype(np.int64), mask=~np.asarray(valid, dtype=bool)
    )
    arrays = [left[c] for c in left_cols]
    for c in right_value_cols:
        arrays.append(right[c].take(take_idx))
    return pa.table(arrays, schema=out_schema)


def _arrow_schema(ds, what: str) -> pa.Schema:
    """Dataset -> pyarrow.Schema via an identity Arrow-format pass, so
    pandas-backed inputs (object dtype, extension dtypes) resolve to real
    Arrow types.  Executes a one-block prefix (same cost class as
    ``ds.schema()`` itself)."""
    norm = ds.map_batches(lambda t: t, batch_format="pyarrow")
    sch = norm.schema()
    if sch is None:
        raise ValueError(
            f"asof {what} side has no inferable schema (empty dataset?); "
            "pass an explicit schema (e.g. right_schema=) or construct the "
            "side with from_arrow over a typed empty table"
        )
    return pa.schema(
        [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
    )


def asof_join(
    left_ds,
    right_ds,
    on: str,
    by: str,
    tiebreak: Optional[str] = None,
    num_partitions: int = 32,
    right_schema: Optional[pa.Schema] = None,
):
    """Backward as-of join: for every left row, the right row with equal
    ``by`` key and the greatest ``on`` time <= the left time (``ASOF LEFT
    JOIN`` semantics — unmatched left rows survive with nulls).

    Right columns other than ``on``/``by`` are carried to the output and
    must not collide with left column names (rename upstream — the same
    contract as ``pandas.merge_asof`` suffixes, made explicit).
    ``tiebreak``: optional right column; duplicate right (key, time) rows
    collapse to the max-``tiebreak`` row so the join is deterministic
    under ties (mirror it in any SQL oracle with a QUALIFY row_number).
    Right's ``on`` column is not emitted (it equals the matched time; add
    a copy under another name upstream if needed).
    """
    l_schema = _arrow_schema(left_ds, "left")
    r_schema = right_schema or _arrow_schema(right_ds, "right")
    l_types = {f.name: f.type for f in l_schema}
    r_types = {f.name: f.type for f in r_schema}
    l_names = list(l_schema.names)
    r_value_cols = [n for n in r_schema.names if n not in (on, by)]
    clash = sorted(set(r_value_cols) & set(l_names))
    if clash:
        raise ValueError(f"right value columns collide with left: {clash}")
    if l_types[on] != r_types[on]:
        raise TypeError(
            f"asof 'on' dtype mismatch: left {l_types[on]} vs right {r_types[on]}"
        )
    if l_types[by] != r_types[by]:
        raise TypeError("asof 'by' dtype mismatch between sides")

    out_fields = [pa.field(n, l_types[n]) for n in l_names]
    out_fields += [pa.field(n, r_types[n]) for n in r_value_cols]
    out_schema = pa.schema(out_fields)

    # unified union schema: left cols + right value cols (+ tiebreak ghost
    # on the left side), each side padded with typed nulls
    union_fields = list(out_fields) + [pa.field(_SIDE, pa.int8())]
    union_schema = pa.schema(union_fields)

    def _pad(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = []
            for f in union_schema:
                if f.name == _SIDE:
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif f.name in batch.column_names:
                    arrays.append(pc.cast(batch[f.name], f.type))
                else:
                    arrays.append(pa.nulls(n, f.type))
            return pa.table(arrays, schema=union_schema)

        return fn

    def add_part(batch: pa.Table) -> pa.Table:
        # shared partitioning contract (stages/partition.hash_mod —
        # non-str keys hash their str() form there)
        from .partition import hash_mod

        part = hash_mod(batch[by].to_pylist(), num_partitions)
        return batch.append_column(_PART, pa.array(part, pa.int32()))

    tagged = left_ds.map_batches(_pad(0), batch_format="pyarrow").union(
        right_ds.map_batches(_pad(1), batch_format="pyarrow")
    )

    def resolve(batch: pa.Table) -> pa.Table:
        return _resolve_partition(batch, on, by, r_value_cols, out_schema, tiebreak)

    return (
        tagged.map_batches(add_part, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(resolve, batch_format="pyarrow")
    )
