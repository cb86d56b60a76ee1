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
