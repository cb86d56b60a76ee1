"""Keyed join operators Ray Data lacks natively: as-of join (and the
general co-partitioned join pattern it demonstrates).

Pattern (SURVEY §2.5 / ray_guide "As-of / range join"): tag each side,
union the two datasets into one stream, hash-partition by the join key so
both sides of a key co-locate, then resolve the join per key group with
``pandas.merge_asof`` over ts-sorted frames.  One shuffle total, keyed on a
small int; no driver-side materialization of either side.

Determinism: ties in the right side's timestamp are resolved before the
merge by sorting on (ts, tiebreak columns); the matched VALUE columns are
identical across tie choices when the tie rows agree on them (the oracle
contract used by q_events_last_order).
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow as pa

from .partition import with_hash_partition


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

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            "_key": batch[left_key].cast(pa.int64()),
            "_ts": batch[left_ts],
            "_side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = batch[c]
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(batch.num_rows, _coltype(right_ds, c))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {
            "_key": batch[right_key].cast(pa.int64()),
            "_ts": batch[right_ts],
            "_side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, _coltype(left_ds, c))
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
        outs = []
        for _, g in df.groupby("_key", sort=True):
            left = g[g["_side"] == "L"].sort_values("_ts", kind="mergesort")
            right = g[g["_side"] == "R"].sort_values("_ts", kind="mergesort")
            if left.empty:
                continue
            if right.empty:
                outs.append(left[l_out + r_out])
                continue
            merged = pd.merge_asof(
                left[["_ts"] + l_out].reset_index(drop=True),
                right[["_ts"] + r_out].reset_index(drop=True),
                on="_ts",
                direction="backward",
            )
            outs.append(merged[l_out + r_out])
        if not outs:
            return pd.DataFrame({c: [] for c in l_out + r_out})
        return pd.concat(outs, ignore_index=True)

    out = parted.groupby("_part").map_groups(resolve, batch_format="pandas")

    def strip_prefix(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            cols[c] = batch[f"l_{c}"]
        for c in right_cols:
            cols[c] = batch[f"r_{c}"]
        return pa.table(cols)

    return out.map_batches(strip_prefix, batch_format="pyarrow")


def with_hash_partition_int(ds, key_col: str, n: int, out_col: str = "_part"):
    """Hash-partition on an int64 key column (crc-mix then mod)."""
    import numpy as np

    def add(batch: pa.Table) -> pa.Table:
        arr = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (arr * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        parts = (mixed % np.uint64(n)).astype(np.int32)
        return batch.append_column(out_col, pa.array(parts, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def _coltype(ds, col: str) -> pa.DataType:
    schema = ds.schema()
    return schema.base_schema.field(col).type if hasattr(schema, "base_schema") else schema.field(col).type
