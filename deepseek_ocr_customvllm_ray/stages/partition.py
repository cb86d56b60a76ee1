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
    return np.fromiter(
        (zlib.crc32(v.encode("utf-8")) % n for v in values),
        dtype=np.int32,
        count=len(values),
    )


def with_hash_partition(ds, key_col: str, n: int, out_col: str = "_part"):
    def add(batch: pa.Table) -> pa.Table:
        parts = hash_mod(batch[key_col].to_pylist(), n)
        return batch.append_column(out_col, pa.array(parts, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")
