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

Caveat: the union pads each side's columns with nulls, which forces int64
payload columns through pandas float64 inside the resolve stage — exact for
|v| < 2^53; for 64-bit snowflake-style ids pass them as strings.
"""

from __future__ import annotations

from typing import List

import pandas as pd
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
    ``right_ts <= left_ts`` within the same key (backward as-of, the
    ``pd.merge_asof`` / DuckDB ``ASOF JOIN`` semantics).  Unmatched left
    rows keep nulls.  Returns a Dataset of left_cols + right_cols.
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

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # NULL-key or NULL-ts left rows: emit unmatched (SQL NULL semantics)
        unmatched = df["_key"].isna() | df["_ts"].isna()
        null_left = df[unmatched & (df["_side"] == "L")]
        df = df[~unmatched]

        left = df[df["_side"] == "L"].sort_values("_ts", kind="mergesort")
        # deterministic tie winner: order right rows by (ts, values) — the
        # primary _ts order satisfies merge_asof, and merge_asof backward
        # picks the LAST of equal timestamps, i.e. the max by value columns
        right = df[df["_side"] == "R"].sort_values(["_ts"] + r_out, kind="mergesort")
        parts = []
        if not left.empty:
            if right.empty:
                parts.append(left[l_out + r_out])
            else:
                merged = pd.merge_asof(
                    left[["_ts", "_key"] + l_out].reset_index(drop=True),
                    right[["_ts", "_key"] + r_out].reset_index(drop=True),
                    on="_ts",
                    by="_key",
                    direction="backward",
                )
                parts.append(merged[l_out + r_out])
        if not null_left.empty:
            parts.append(null_left[l_out + r_out])
        if not parts:
            # typed empty frame (object-dtype empties would emit a
            # schema-drifting null block)
            return df[l_out + r_out].iloc[0:0]
        return pd.concat(parts, ignore_index=True)

    out = parted.groupby("_part").map_groups(resolve, batch_format="pandas")

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

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == "L"].reset_index(drop=True)
        right = df[df["_side"] == "R"]
        if left.empty:
            out = left[l_out].copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        counts = np.zeros(len(left), dtype=np.int64)
        matchable = (left["_key"].notna() & left["_ts"].notna()).to_numpy()
        if not right.empty and matchable.any():
            # right side sorted ONCE by (key, ts); each key's rows form a
            # contiguous ts-sorted slice
            r = right[["_key", "_ts"]].sort_values(
                ["_key", "_ts"], kind="mergesort"
            )
            r_keys = r["_key"].to_numpy()
            r_ts = r["_ts"].to_numpy()
            win = pd.Timedelta(window).to_numpy()
            lm = left[matchable]
            # one numpy pass per KEY (not per row, not per pair): two
            # searchsorted bounds over the key's slice give the
            # (t-window, t] count for every left row of that key at once
            for key, g in lm.groupby("_key", sort=False):
                lo = np.searchsorted(r_keys, key, side="left")
                hi = np.searchsorted(r_keys, key, side="right")
                if lo == hi:
                    continue
                ts_slice = r_ts[lo:hi]
                t = g["_ts"].to_numpy()
                c = np.searchsorted(ts_slice, t, side="right") - np.searchsorted(
                    ts_slice, t - win, side="right"
                )
                # left has a RangeIndex (reset above), so g's index labels
                # ARE the row positions in `left`
                counts[g.index.to_numpy()] = c
        out = left[l_out].copy()
        out[out_col] = counts
        return out

    out = parted.groupby("_part").map_groups(resolve, batch_format="pandas")

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

    Caveat (shared with :func:`asof_join`): the union pads the other
    side's columns with nulls, which routes int64 payload columns through
    pandas float64 inside the resolve stage — exact for |v| < 2^53; the
    output edge casts back to the declared Arrow types.
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

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        is_l = df["_side"] == "L"
        null_left = df[is_l & df["_key"].isna()]  # only present when how=left
        left = df[is_l & df["_key"].notna()]
        right = df[~is_l]
        parts = []
        if not left.empty:
            if right.empty:
                if how == "left":
                    parts.append(left[l_out + r_out])
            else:
                merged = left[["_key"] + l_out].merge(
                    right[["_key"] + r_out], on="_key", how=how
                )
                parts.append(merged[l_out + r_out])
        if how == "left" and not null_left.empty:
            parts.append(null_left[l_out + r_out])
        if not parts:
            return df[l_out + r_out].iloc[0:0]
        return pd.concat(parts, ignore_index=True)

    out = parted.groupby("_part").map_groups(resolve, batch_format="pandas")

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
