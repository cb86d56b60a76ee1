"""Keyed join operators Ray Data lacks natively: as-of join (and the
general co-partitioned join pattern it demonstrates).

Pattern (SURVEY §2.5 / ray_guide "As-of / range join"): tag each side,
union the two datasets into one stream, hash-partition by the join key so
both sides of a key co-locate, then resolve the join per partition with ONE
``pandas.merge_asof(..., by=key)`` over ts-sorted frames.  One shuffle
total, keyed on a small int; no driver-side materialization of either side.

Determinism: right-side timestamp ties are resolved by sorting the right
frame on (ts, value columns) before the merge, so the tie winner is a pure
function of the data, not of block arrival order.

Left-join semantics match SQL/DuckDB ``ASOF LEFT JOIN``: unmatched left
rows keep nulls, and left rows with a NULL key are emitted unmatched (NULL
never equals NULL).

The resolve stages are pyarrow end to end (round-3 verdict item 3): join
indices are numpy; payload columns move only through Arrow ``take``, so
rows carrying multi-MB binary columns never pivot into Python objects and
nullable int64 columns keep their exact type (the old pandas resolve
detoured them through float64).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc

from .partition import with_hash_partition_int


def asof_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: List[str],
    right_cols: List[str],
    num_partitions: int = 32,
):
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same key (backward as-of —
    ``pd.merge_asof`` / DuckDB ``ASOF JOIN`` semantics).  Unmatched left
    rows keep nulls.  Returns a Dataset of left_cols + right_cols.

    NOTE: this is the explicit-column-list variant kept for the
    ``events_last_order`` projected contract; ``stages/asof.asof_join``
    is the generic-schema sibling (any key type, SQL ASOF tie-break) —
    prefer it for new pipelines, and apply semantics fixes to BOTH.
    """
    # snapshot column types on the DRIVER: the tag UDFs must close over
    # plain dicts, never over the opposite Dataset (a captured Dataset would
    # be re-executed inside worker tasks to answer .schema())
    left_types = {c: _coltype(left_ds, c) for c in left_cols}
    right_types = {c: _coltype(right_ds, c) for c in right_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            "_key": batch[left_key].cast(pa.int64()),
            "_ts": batch[left_ts],
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = batch[c]
        for c, t in right_types.items():
            cols[f"r_{c}"] = pa.nulls(batch.num_rows, t)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        # right rows with a NULL key can never match; drop them at the map
        batch = batch.filter(pc.is_valid(batch[right_key]))
        cols = {
            "_key": batch[right_key].cast(pa.int64()),
            "_ts": batch[right_ts],
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c, t in left_types.items():
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, t)
        for c in right_cols:
            cols[f"r_{c}"] = batch[c]
        return pa.table(cols)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    parted = with_hash_partition_int(unioned, "_key", num_partitions)

    l_out = [f"l_{c}" for c in left_cols]
    r_out = [f"r_{c}" for c in right_cols]

    def resolve(batch: pa.Table) -> pa.Table:
        # PYARROW resolve (round-3 verdict item 3): numpy index arithmetic,
        # payload columns move only through Arrow ``take``.  Right side is
        # sorted ONCE by (key, ts, values) — within a key, the last row with
        # ts <= t is the backward-asof winner, and the value tie-break makes
        # equal-ts winners a pure function of the data (merge_asof semantics)
        import numpy as np

        out_cols = l_out + r_out
        side = batch["_side"].to_numpy(zero_copy_only=False)
        is_l = side == "L"
        ok = pc.and_(
            pc.is_valid(batch["_key"]), pc.is_valid(batch["_ts"])
        ).to_numpy(zero_copy_only=False)
        keys = (
            pc.fill_null(batch["_key"], 0).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = batch["_ts"].to_numpy(zero_copy_only=False)
        l_ix = np.flatnonzero(is_l & ok)
        null_l_ix = np.flatnonzero(is_l & ~ok)
        r_ix = np.flatnonzero(~is_l & ok)  # null-ts right rows never match

        match_l = np.empty(0, dtype=np.int64)
        match_r = np.empty(0, dtype=np.int64)
        no_match = l_ix
        if len(l_ix) and len(r_ix):
            # value tie-break as sorted integer codes (mixed/null-bearing
            # object arrays would break np.lexsort); nulls take the largest
            # code = sort LAST, matching the former pandas sort_values
            import pandas as pd

            tie_cols = []
            for c in reversed(r_out):
                codes, _ = pd.factorize(
                    batch[c].take(pa.array(r_ix, pa.int64())).to_pandas(),
                    sort=True,
                )
                codes = codes.astype(np.int64)
                codes[codes == -1] = codes.max() + 1
                tie_cols.append(codes)
            order_r = np.lexsort(tuple(tie_cols) + (ts[r_ix], keys[r_ix]))
            rk = keys[r_ix][order_r]
            rt = ts[r_ix][order_r]
            # per-KEY sweep (the range_join_count pattern): left rows are
            # key-sorted so each distinct key resolves ALL its left rows
            # with one vectorized searchsorted over its right slice
            order_l = np.argsort(keys[l_ix], kind="stable")
            l_sorted = l_ix[order_l]
            lk = keys[l_sorted]
            blk = np.flatnonzero(np.concatenate([[True], lk[1:] != lk[:-1]]))
            blk_end = np.append(blk[1:], len(lk))
            pos = np.full(len(lk), -1, dtype=np.int64)
            for s, e in zip(blk, blk_end):
                a = np.searchsorted(rk, lk[s], side="left")
                b = np.searchsorted(rk, lk[s], side="right")
                if a == b:
                    continue
                p = a + np.searchsorted(
                    rt[a:b], ts[l_sorted[s:e]], side="right"
                ) - 1
                p[p < a] = -1
                pos[s:e] = p
            matched = pos >= 0
            match_l = l_sorted[matched]
            match_r = r_ix[order_r[pos[matched]]]
            no_match = l_sorted[~matched]

        parts = []
        if len(match_l):
            lt = batch.select(l_out).take(pa.array(match_l, pa.int64()))
            rt_tbl = batch.select(r_out).take(pa.array(match_r, pa.int64()))
            parts.append(pa.table(
                {c: lt[c] for c in l_out} | {c: rt_tbl[c] for c in r_out}
            ))
        leftovers = np.concatenate([no_match, null_l_ix])
        if len(leftovers):
            # r_* columns of left-tagged rows are typed nulls already
            parts.append(
                batch.select(out_cols).take(pa.array(leftovers, pa.int64()))
            )
        if not parts:
            return batch.select(out_cols).slice(0, 0)
        return pa.concat_tables(parts)

    out = parted.groupby("_part").map_groups(resolve, batch_format="pyarrow")

    def strip_prefix(batch: pa.Table) -> pa.Table:
        cols = {}
        for c, t in left_types.items():
            cols[c] = batch[f"l_{c}"].cast(t)
        for c, t in right_types.items():
            cols[c] = batch[f"r_{c}"].cast(t)
        return pa.table(cols)

    return out.map_batches(strip_prefix, batch_format="pyarrow")


def range_join_count(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    window,
    left_cols: List[str],
    out_col: str = "n_matches",
    num_partitions: int = 32,
):
    """Windowed range join, aggregated form: for each left row, the COUNT of
    right rows with the same key and ``left_ts - window < right_ts <=
    left_ts`` (SQL ``LEFT JOIN ... ON key AND r_ts <= l_ts AND r_ts > l_ts
    - window`` + ``count(...) GROUP BY left row``); unmatched left rows get
    0, NULL-key/-ts left rows too (NULL never matches).

    Same one-shuffle co-partition pattern as :func:`asof_join`: tag, union,
    hash-partition by key, resolve per partition with a SORT-SWEEP: right
    rows are ts-sorted once per (partition, key), and each left row's count
    is the difference of two ``searchsorted`` bounds on its key's slice —
    O((|L|+|R|) log |R|) time and O(|L|+|R|) memory per key.  A skewed key
    with 10^4 right rows never materializes its |L| x |R| candidate product
    (the round-2 key-merge + interval filter did; see the skewed-key test
    in tests/test_joins.py).  Counting INSIDE the partition (all of a left
    row's matches co-locate with it) still avoids a second shuffle.
    """
    left_types = {c: _coltype(left_ds, c) for c in left_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            "_key": batch[left_key].cast(pa.int64()),
            "_ts": batch[left_ts],
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = batch[c]
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(pc.is_valid(batch[right_key]), pc.is_valid(batch[right_ts]))
        )
        cols = {
            "_key": batch[right_key].cast(pa.int64()),
            "_ts": batch[right_ts],
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c, t in left_types.items():
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, t)
        return pa.table(cols)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    parted = with_hash_partition_int(unioned, "_key", num_partitions)

    l_out = [f"l_{c}" for c in left_cols]

    import numpy as np

    def resolve(batch: pa.Table) -> pa.Table:
        # PYARROW resolve: left payload columns move only through one Arrow
        # ``take``; the per-KEY searchsorted sweep is unchanged (each key's
        # ts-sorted right slice answers all its left rows at once)
        import pandas as pd

        side = batch["_side"].to_numpy(zero_copy_only=False)
        is_l = side == "L"
        l_ix = np.flatnonzero(is_l)
        counts = np.zeros(len(l_ix), dtype=np.int64)
        ok = pc.and_(
            pc.is_valid(batch["_key"]), pc.is_valid(batch["_ts"])
        ).to_numpy(zero_copy_only=False)
        keys = (
            pc.fill_null(batch["_key"], 0).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = batch["_ts"].to_numpy(zero_copy_only=False)
        r_ix = np.flatnonzero(~is_l)
        l_match = np.flatnonzero(ok[l_ix])  # positions in l_ix
        if len(r_ix) and len(l_match):
            order_r = np.lexsort((ts[r_ix], keys[r_ix]))
            rk = keys[r_ix][order_r]
            rt = ts[r_ix][order_r]
            win = pd.Timedelta(window).to_numpy()
            # key-sorted left rows: one vectorized two-bound sweep per key
            lm_rows = l_ix[l_match]
            order_l = np.argsort(keys[lm_rows], kind="stable")
            lm_sorted = lm_rows[order_l]
            lk = keys[lm_sorted]
            blk = np.flatnonzero(np.concatenate([[True], lk[1:] != lk[:-1]]))
            blk_end = np.append(blk[1:], len(lk))
            c_sorted = np.zeros(len(lk), dtype=np.int64)
            for s, e in zip(blk, blk_end):
                a = np.searchsorted(rk, lk[s], side="left")
                b = np.searchsorted(rk, lk[s], side="right")
                if a == b:
                    continue
                t = ts[lm_sorted[s:e]]
                c_sorted[s:e] = np.searchsorted(
                    rt[a:b], t, side="right"
                ) - np.searchsorted(rt[a:b], t - win, side="right")
            counts[l_match[order_l]] = c_sorted
        out = batch.select(l_out).take(pa.array(l_ix, pa.int64()))
        return out.append_column(out_col, pa.array(counts, pa.int64()))

    out = parted.groupby("_part").map_groups(resolve, batch_format="pyarrow")

    def strip_prefix(batch: pa.Table) -> pa.Table:
        cols = {}
        for c, t in left_types.items():
            cols[c] = batch[f"l_{c}"].cast(t)
        cols[out_col] = batch[out_col].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(strip_prefix, batch_format="pyarrow")


def hash_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_cols: List[str],
    right_cols: List[str],
    how: str = "inner",
    num_partitions: int = 32,
):
    """Distributed equi-join (shuffle hash join) — the scale path when the
    small side no longer fits a ``ray.put`` broadcast (the pipelines'
    default for dimension-table joins, e.g. ``q_top_customers``).

    Same tagged-union co-partition pattern as :func:`asof_join`: tag each
    side, union into one stream, hash-partition on the int64 key so both
    sides of a key co-locate, then ONE vectorized ``pandas.merge`` per
    partition.  One all-to-all total; neither side is materialized on the
    driver.  SQL semantics: null keys never match (null-key right rows are
    dropped at the map; null-key left rows are dropped for ``inner`` and
    emitted null-padded for ``left``); duplicate keys produce the full
    cross product within the key, exactly as SQL.

    The resolve stage is pyarrow end to end (numpy index arithmetic +
    Arrow ``take``): payload columns never pivot through pandas objects,
    and nullable int64 columns keep their exact type (no float64 detour).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hash_join supports 'inner'/'left', got {how!r}")
    left_types = {c: _coltype(left_ds, c) for c in left_cols}
    right_types = {c: _coltype(right_ds, c) for c in right_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        if how == "inner":
            batch = batch.filter(pc.is_valid(batch[left_key]))
        cols = {
            "_key": batch[left_key].cast(pa.int64()),
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = batch[c]
        for c, t in right_types.items():
            cols[f"r_{c}"] = pa.nulls(batch.num_rows, t)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[right_key]))
        cols = {
            "_key": batch[right_key].cast(pa.int64()),
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c, t in left_types.items():
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, t)
        for c in right_cols:
            cols[f"r_{c}"] = batch[c]
        return pa.table(cols)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    parted = with_hash_partition_int(unioned, "_key", num_partitions)

    l_out = [f"l_{c}" for c in left_cols]
    r_out = [f"r_{c}" for c in right_cols]

    def resolve(batch: pa.Table) -> pa.Table:
        # PYARROW resolve (round-3 verdict item 3): the tagged rows carry
        # both sides' payload columns, so a pandas pivot would copy every
        # value into Python objects (and detour nullable int64 through
        # float64).  Join indices are built in numpy (sorted right keys +
        # searchsorted bounds + repeat for the within-key cross product);
        # payload columns move only through Arrow ``take``.
        import numpy as np

        out_cols = l_out + r_out
        side = batch["_side"].to_numpy(zero_copy_only=False)
        key_valid = pc.is_valid(batch["_key"]).to_numpy(zero_copy_only=False)
        keys = (
            pc.fill_null(batch["_key"], 0).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        is_l = side == "L"
        l_ix = np.flatnonzero(is_l & key_valid)
        r_ix = np.flatnonzero(~is_l)

        order_r = np.argsort(keys[r_ix], kind="stable")
        r_sorted = keys[r_ix][order_r]
        lo = np.searchsorted(r_sorted, keys[l_ix], side="left")
        hi = np.searchsorted(r_sorted, keys[l_ix], side="right")
        cnt = hi - lo
        total = int(cnt.sum())

        parts = []
        if total:
            left_rows = np.repeat(l_ix, cnt)
            starts = np.repeat(lo, cnt)
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            right_rows = r_ix[order_r[starts + offs]]
            lt = batch.select(l_out).take(pa.array(left_rows, pa.int64()))
            rt = batch.select(r_out).take(pa.array(right_rows, pa.int64()))
            parts.append(pa.table(
                {c: lt[c] for c in l_out} | {c: rt[c] for c in r_out}
            ))
        if how == "left":
            # unmatched + null-key left rows: their r_* columns are already
            # typed nulls from the tag stage — one take, no padding needed
            unmatched = np.concatenate(
                [l_ix[cnt == 0], np.flatnonzero(is_l & ~key_valid)]
            )
            if len(unmatched):
                parts.append(
                    batch.select(out_cols).take(pa.array(unmatched, pa.int64()))
                )
        if not parts:
            return batch.select(out_cols).slice(0, 0)
        return pa.concat_tables(parts)

    out = parted.groupby("_part").map_groups(resolve, batch_format="pyarrow")

    def strip_prefix(batch: pa.Table) -> pa.Table:
        cols = {}
        for c, t in left_types.items():
            cols[c] = batch[f"l_{c}"].cast(t)
        for c, t in right_types.items():
            cols[c] = batch[f"r_{c}"].cast(t)
        return pa.table(cols)

    return out.map_batches(strip_prefix, batch_format="pyarrow")


def _coltype(ds, col: str) -> pa.DataType:
    schema = ds.schema()
    return schema.base_schema.field(col).type if hasattr(schema, "base_schema") else schema.field(col).type
