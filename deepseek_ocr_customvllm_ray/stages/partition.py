"""Explicit hash-partitioning helpers.

Ray Data's key-based ``repartition(keys=...)`` requires the session-global
HASH_SHUFFLE strategy; instead the pipelines partition explicitly with a
``_part = crc32(key) % N`` column and group on that small int key.  The
shuffle moves the same bytes, but the shuffle key is an int32 (cheap range
sort) and downstream per-partition functions run once per PARTITION, fully
vectorized, instead of once per group.

Also home of the byte-size skew bucketing (SURVEY §4 "Skew"): pick the
partition count so the largest partition is bounded, and salt hot keys.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def hash_mod(values, n: int) -> np.ndarray:
    """crc32(str) % n per value — THE string-key partitioning contract
    (every operator that co-locates on a string key routes through here,
    so a mixing change lands everywhere at once).  Non-str keys hash
    their ``str()`` form, keeping one deterministic rule for generic
    keys (as-of join int keys, etc.)."""
    return np.fromiter(
        (
            zlib.crc32((v if isinstance(v, str) else str(v)).encode("utf-8")) % n
            for v in values
        ),
        dtype=np.int32,
        count=len(values),
    )


def with_hash_partition(ds, key_col: str, n: int, out_col: str = "_part"):
    def add(batch: pa.Table) -> pa.Table:
        parts = hash_mod(batch[key_col].to_pylist(), n)
        return batch.append_column(out_col, pa.array(parts, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def with_hash_partition_int(ds, key_col: str, n: int, out_col: str = "_part"):
    """Hash-partition on an int64 key column.

    Mixing folds the high bits back down (``x ^= x >> 33``) before the mod,
    so power-of-two ``n`` doesn't degenerate to ``key % n`` (strided or
    low-bit-zeroed key spaces would otherwise land on one partition).  Null
    keys go to partition 0; downstream resolvers handle them explicitly.
    """

    def add(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        arr = col.to_numpy(zero_copy_only=False)
        null_mask = np.asarray(pa.compute.is_null(col.combine_chunks() if hasattr(col, "combine_chunks") else col))
        vals = np.nan_to_num(arr.astype(np.float64), nan=0.0).astype(np.int64).astype(np.uint64)
        mixed = (vals * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        mixed ^= mixed >> np.uint64(33)
        parts = (mixed % np.uint64(n)).astype(np.int32)
        parts[null_mask] = 0
        return batch.append_column(out_col, pa.array(parts, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")
