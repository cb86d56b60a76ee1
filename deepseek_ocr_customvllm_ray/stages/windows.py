"""Sliding (rolling) time-window aggregation — the windowed sibling of the
tumbling aggregate (``q_events_hourly``): for every (key, bucket) row of an
already-bucketed series, the trailing-window sum over the last ``window``
buckets, RANGE semantics (missing buckets contribute nothing, matching SQL
``RANGE BETWEEN <w-1> PRECEDING AND CURRENT ROW``).

Scale shape: the input is the SMALL output of a tumbling aggregate
(|keys| x |buckets| rows, time-bounded), but keys can still be numerous
(per-domain series), so the sweep is partition-level — one crc32 hash
exchange co-locates each key, and every partition resolves ALL its keys in
one vectorized pass (lexsort + cumsum + ``searchsorted`` two-pointer,
clamped at key starts) — never one Python call per key.
"""

from __future__ import annotations

from typing import List
from zlib import crc32

import numpy as np
import pandas as pd
import pyarrow as pa


def rolling_time_agg(
    ds,
    key_col: str,
    time_col: str,
    value_cols: List[str],
    window: int,
    bucket: str = "hour",
    num_partitions: int = 16,
):
    """Add ``rolling_<col>`` trailing-window sums per key.

    ``ds`` rows must be unique per (key, bucket) with ``time_col`` already
    truncated to the bucket (the tumbling aggregate's contract).  A window
    of 3 means current bucket + 2 preceding.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    bucket_ns = {"hour": 3600, "minute": 60, "day": 86400, "second": 1}[
        bucket
    ] * 1_000_000_000

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        part = np.array(
            [crc32(str(k).encode("utf-8")) % num_partitions for k in keys],
            dtype=np.int32,
        )
        return batch.append_column("_part", pa.array(part, pa.int32()))

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        if not len(df):
            return df
        df = df.sort_values([key_col, time_col], kind="mergesort").reset_index(drop=True)
        # normalize the unit explicitly: Arrow timestamps surface in pandas
        # as datetime64[s]/[us]/[ns] depending on the upstream, and a bare
        # astype(int64) would count in whatever unit arrived
        t = df[time_col].to_numpy().astype("datetime64[ns]").astype("int64") // bucket_ns
        key_change = np.empty(len(df), dtype=bool)
        key_change[0] = True
        kv = df[key_col].to_numpy()
        key_change[1:] = kv[1:] != kv[:-1]
        starts = np.flatnonzero(key_change)
        start_of_row = np.repeat(starts, np.diff(np.append(starts, len(df))))
        # one GLOBALLY sorted search domain for every key at once: offset
        # each key's buckets into a disjoint span (span > max offset +
        # window, so a window's lower bound can never reach the previous
        # key's region) — the whole partition resolves in one searchsorted
        codes = np.cumsum(key_change) - 1
        t0 = t.min()
        span = (t.max() - t0) + window + 1
        comb = codes * span + (t - t0)
        left = np.maximum(
            np.searchsorted(comb, comb - (window - 1)), start_of_row
        )
        idx = np.arange(len(df))
        for c in value_cols:
            cum = np.concatenate([[0], np.cumsum(df[c].to_numpy(dtype=np.int64))])
            df["rolling_" + c] = cum[idx + 1] - cum[left]
        return df

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(sweep, batch_format="pandas")
    )


def key_lag(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_partitions: int = 16,
):
    """Per-key LAG: previous event's timestamp and the exact microsecond
    delta — SQL ``LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)``, the
    inter-arrival-time primitive (crawl politeness gaps, session-gap
    inputs, rate estimation) Ray Data has no window function for.

    ONE crc32(key) exchange co-locates each key's rows; every partition
    resolves ALL its keys in a single lexsort + shift (no per-key Python).
    Ties on ts order by ``id_col`` — deterministic on any cluster shape.
    First event per key gets null ``prev_ts`` / ``delta_us``.  Returns
    ``(id, key, ts, prev_ts, delta_us)``; delta is exact int64
    microseconds (both engines subtract epoch integers, no float time).
    """
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop_columns(["_part"])
        ts_type = t[ts_col].type
        if pa.types.is_timestamp(ts_type):
            # normalize to microseconds so delta_us is unit-true for any
            # input resolution (s/ms/us/ns columns)
            ts_type = pa.timestamp("us")
            t = t.set_column(
                t.schema.get_field_index(ts_col), ts_col,
                pc.cast(t[ts_col], ts_type),
            )
        out_schema = pa.schema([
            (id_col, pa.int64()),
            (key_col, t[key_col].type),
            (ts_col, ts_type),
            ("prev_ts", ts_type),
            ("delta_us", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, keys))
        k_s, t_s, i_s = keys[order], ts[order], ids[order]
        has_prev = np.concatenate([[False], k_s[1:] == k_s[:-1]])
        prev = np.concatenate([[0], t_s[:-1]])
        delta = np.where(has_prev, t_s - prev, 0)
        mask = ~has_prev
        return pa.table({
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
            ts_col: pa.array(t_s, mask=np.zeros(len(t_s), bool)).cast(ts_type),
            "prev_ts": pa.array(prev, mask=mask).cast(ts_type),
            "delta_us": pa.array(delta, mask=mask, type=pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def key_row_number(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_partitions: int = 16,
):
    """Per-key ROW_NUMBER: 1-based event sequence index — SQL
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, id)`` (the
    "nth interaction of this user/host" feature).  Same single-exchange
    lexsort sweep as :func:`key_lag`; integer-exact by construction.
    Returns ``(id, key, row_number)``."""
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            (id_col, pa.int64()),
            (key_col, t[key_col].type),
            ("row_number", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        import pyarrow.compute as pc

        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, keys))
        k_s, i_s = keys[order], ids[order]
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        pos = np.arange(len(k_s), dtype=np.int64)
        start = pos[new_key][np.cumsum(new_key) - 1]
        rn = pos - start + 1
        return pa.table({
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
            "row_number": pa.array(rn, pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")
