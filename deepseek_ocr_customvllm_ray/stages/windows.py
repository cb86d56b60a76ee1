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

from typing import List, Sequence

import numpy as np
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

    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.drop_columns(["_part"])
        if not tbl.num_rows:
            fields = list(zip(tbl.schema.names, tbl.schema.types))
            fields += [("rolling_" + c, pa.int64()) for c in value_cols]
            return pa.schema(fields).empty_table()
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        # normalize the unit explicitly: Arrow surfaces s/us/ns timestamps
        # depending on the upstream, and a bare int64 cast would count in
        # whatever unit arrived
        t = pc.cast(
            pc.cast(tbl[time_col], pa.timestamp("ns")), pa.int64()
        ).to_numpy(zero_copy_only=False) // bucket_ns
        order = np.lexsort((t, keys))
        tbl = tbl.take(pa.array(order))
        keys, t = keys[order], t[order]
        key_change = np.empty(len(keys), dtype=bool)
        key_change[0] = True
        key_change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(key_change)
        start_of_row = np.repeat(starts, np.diff(np.append(starts, len(keys))))
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
        idx = np.arange(len(keys))
        for c in value_cols:
            v = tbl[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
            cum = np.concatenate([[0], np.cumsum(v)])
            tbl = tbl.append_column(
                "rolling_" + c, pa.array(cum[idx + 1] - cum[left], pa.int64())
            )
        return tbl

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    gap_minutes: int,
    value_cols: Sequence[str] = (),
    num_partitions: int = 16,
):
    """Session windows per key: a new session starts at a key's first event
    and whenever the gap to the previous event of the same key EXCEEDS
    ``gap_minutes`` (strict — SQL's ``ts - lag(ts) OVER w > INTERVAL``
    idiom).  Returns one row per (key, session):
    ``(key, session_start, n_events, sum_<col>...)`` with int64 sums over
    each ``value_cols`` entry (pre-convert floats upstream — e.g. money to
    integer cents — so the sums stay exact).

    Same shape as :func:`key_lag`: ONE crc32(key) exchange co-locates each
    key's rows, then every partition resolves ALL its keys in a single
    lexsort + boundary-``reduceat`` sweep — never one Python call or one
    pandas frame per key (the per-group-materialization idiom caps
    parallelism at |keys| and holds a key's whole history in one heap).
    Session assignment is order-independent for equal timestamps (equal ts
    ⇒ zero gap ⇒ same session), so the result is deterministic on any
    cluster shape.
    """
    from .partition import with_hash_partition

    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    gap_us = int(gap_minutes) * 60_000_000
    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop_columns(["_part"])
        ts_type = t[ts_col].type
        if pa.types.is_timestamp(ts_type):
            ts_type = pa.timestamp("us")
            t = t.set_column(
                t.schema.get_field_index(ts_col), ts_col,
                pc.cast(t[ts_col], ts_type),
            )
        out_schema = pa.schema(
            [
                (key_col, t[key_col].type),
                ("session_start", ts_type),
                ("n_events", pa.int64()),
            ]
            + [("sum_" + c, pa.int64()) for c in value_cols]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        k_s, t_s = keys[order], ts[order]
        same_key = np.concatenate([[False], k_s[1:] == k_s[:-1]])
        delta = np.concatenate([[0], t_s[1:] - t_s[:-1]])
        new_sess = ~same_key | (delta > gap_us)
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.append(starts, len(t_s)))
        cols = {
            key_col: pa.array(k_s[starts], t[key_col].type),
            "session_start": pa.array(t_s[starts], pa.int64()).cast(ts_type),
            "n_events": pa.array(counts, pa.int64()),
        }
        for c in value_cols:
            v = t[c].cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
            cols["sum_" + c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


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


def key_cumsum(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_cols: Sequence[str],
    num_partitions: int = 16,
):
    """Per-key running total — SQL ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` (the cumulative-spend /
    cumulative-bytes-crawled feature).  ``value_cols`` must already be
    integer-exact (convert money to cents upstream) so the prefix sums
    are bit-identical across engines and cluster shapes.

    Same single-exchange shape as :func:`key_lag`: one crc32(key)
    exchange co-locates each key's rows, then every partition resolves
    ALL its keys in one lexsort + global-cumsum-minus-key-base sweep —
    no per-key Python, no per-key frame.  Ties on ts order by ``id_col``
    (unique), so ROWS and RANGE frames coincide and the result is
    deterministic.  Returns ``(id, key, cum_<col>...)``."""
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema(
            [(id_col, pa.int64()), (key_col, t[key_col].type)]
            + [("cum_" + c, pa.int64()) for c in value_cols]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        import pyarrow.compute as pc

        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, keys))
        k_s, i_s = keys[order], ids[order]
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        starts = np.flatnonzero(new_key)
        start_of_row = np.repeat(starts, np.diff(np.append(starts, len(k_s))))
        cols = {
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
        }
        for c in value_cols:
            v = t[c].cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
            total = np.concatenate([[0], np.cumsum(v)])
            cols["cum_" + c] = pa.array(
                total[np.arange(len(v)) + 1] - total[start_of_row], pa.int64()
            )
        return pa.table(cols, schema=out_schema)

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


def key_rank(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    ntile: int = 4,
    num_partitions: int = 16,
):
    """Per-key ranking family in ONE sweep — SQL ``RANK()`` /
    ``DENSE_RANK()`` over ``value_col DESC`` plus ``NTILE(ntile)`` over
    ``(value_col DESC, id)`` within each key (the per-host page-quality
    ranking / per-user spend-quartile feature).  RANK and DENSE_RANK
    depend only on the value ordering, so ties are engine-independent;
    NTILE is position-based, so its order includes ``id_col`` to stay
    deterministic across engines and cluster shapes.

    ``value_col`` must be integer-exact (cents upstream).  Same
    single-exchange shape as :func:`key_lag`: one crc32(key) exchange,
    then every partition resolves ALL its keys in one
    lexsort + boundary-vector pass — no per-key Python, no per-key frame.
    Returns ``(id, key, value, rnk, dense_rnk, ntile_bucket)``.
    """
    if ntile < 1:
        raise ValueError(f"ntile must be >= 1, got {ntile}")
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            (id_col, pa.int64()),
            (key_col, t[key_col].type),
            (value_col, pa.int64()),
            ("rnk", pa.int64()),
            ("dense_rnk", pa.int64()),
            ("ntile_bucket", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # DESC on value, ASC on id: lexsort is ascending, so negate values
        order = np.lexsort((ids, -vals, keys))
        k_s, v_s, i_s = keys[order], vals[order], ids[order]
        n = len(k_s)
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        key_starts = np.flatnonzero(new_key)
        start_of_key = np.repeat(
            key_starts, np.diff(np.append(key_starts, n))
        )
        pos_in_key = np.arange(n, dtype=np.int64) - start_of_key
        # RANK: 1 + rows strictly greater = the tie group's start offset
        new_val = new_key | np.concatenate([[True], v_s[1:] != v_s[:-1]])
        val_starts = np.flatnonzero(new_val)
        start_of_val = np.repeat(
            val_starts, np.diff(np.append(val_starts, n))
        )
        rnk = start_of_val - start_of_key + 1
        # DENSE_RANK: distinct-value index within the key
        dcum = np.cumsum(new_val)
        dense = dcum - dcum[start_of_key] + 1
        # NTILE(k): first (n % k) buckets get ceil(n/k) rows
        n_of_key = np.repeat(
            np.diff(np.append(key_starts, n)), np.diff(np.append(key_starts, n))
        )
        base = n_of_key // ntile
        rem = n_of_key % ntile
        boundary = rem * (base + 1)
        in_big = pos_in_key < boundary
        big = pos_in_key // np.maximum(base + 1, 1)
        small = rem + (pos_in_key - boundary) // np.maximum(base, 1)
        bucket = np.where(in_big, big, small) + 1
        return pa.table({
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
            value_col: pa.array(v_s, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "dense_rnk": pa.array(dense, pa.int64()),
            "ntile_bucket": pa.array(bucket, pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def key_mode(
    ds,
    key_col: str,
    cat_col: str,
    num_partitions: int = 16,
):
    """Per-key modal category — "dominant language per host" / "most
    frequent event type per user": the category with the highest count
    per key, ties broken by the lexicographically smallest category
    (deterministic; SQL ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY n DESC, cat) = 1``).

    ONE exchange: per-batch (key, cat) partial counts shrink the corpus to
    its (key x cat) support BEFORE the exchange; the crc32(key) partition
    co-locates every partial of a key, so one per-partition sweep both
    folds the partials (lexsort + boundary ``add.reduceat``) and resolves
    the argmax — no separate distributed groupby round.  Shuffle volume is
    the (key, cat) support per batch, not the event count.  Returns
    ``(key, cat, n)`` with ``n`` the winning category's count.
    """
    from .partition import with_hash_partition

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (key_col, batch[key_col].type),
            (cat_col, pa.string()),
            ("n_p", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        return (
            batch.select([key_col, cat_col])
            .group_by([key_col, cat_col])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, cat_col, "n_p"])
            .cast(out_schema)
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    parts = with_hash_partition(partials, key_col, num_partitions)

    def fold_argmax(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            (key_col, t[key_col].type),
            (cat_col, t[cat_col].type),
            ("n", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        cats = t[cat_col].to_numpy(zero_copy_only=False)
        ns = t["n_p"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # fold: sum partials per (key, cat) pair in one lexsort + reduceat
        order = np.lexsort((cats, keys))
        k_s, c_s, n_s = keys[order], cats[order], ns[order]
        new_pair = np.concatenate(
            [[True], (k_s[1:] != k_s[:-1]) | (c_s[1:] != c_s[:-1])]
        )
        starts = np.flatnonzero(new_pair)
        pk, pc_, pn = k_s[starts], c_s[starts], np.add.reduceat(n_s, starts)
        # argmax: highest n first, then smallest category string
        order2 = np.lexsort((pc_, -pn, pk))
        k2 = pk[order2]
        first = np.concatenate([[True], k2[1:] != k2[:-1]])
        pick = order2[first]
        return pa.table({
            key_col: pa.array(pk[pick], t[key_col].type),
            cat_col: pa.array(pc_[pick], t[cat_col].type),
            "n": pa.array(pn[pick], pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(fold_argmax, batch_format="pyarrow")


def key_lead_bounds(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    num_partitions: int = 16,
):
    """Per-key LEAD + partition bounds in one sweep — SQL ``LEAD(ts)``
    (next event's timestamp; the "time-to-next-crawl" feature) plus
    ``FIRST_VALUE(v)`` / ``LAST_VALUE(v)`` over the WHOLE key partition
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING`` —
    the session's opening/closing value).  ``value_col`` must be
    integer-exact (cents upstream).  Order within a key is
    ``(ts, id)`` — deterministic under ties on any cluster shape.

    Same single-exchange shape as :func:`key_lag`: one crc32(key)
    exchange, one lexsort + boundary-vector pass per partition.
    Returns ``(id, key, ts, next_ts, first_value, last_value)``.
    """
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop_columns(["_part"])
        ts_type = t[ts_col].type
        if pa.types.is_timestamp(ts_type):
            ts_type = pa.timestamp("us")
            t = t.set_column(
                t.schema.get_field_index(ts_col), ts_col,
                pc.cast(t[ts_col], ts_type),
            )
        out_schema = pa.schema([
            (id_col, pa.int64()),
            (key_col, t[key_col].type),
            (ts_col, ts_type),
            ("next_ts", ts_type),
            ("first_value", pa.int64()),
            ("last_value", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, keys))
        k_s, t_s, i_s, v_s = keys[order], ts[order], ids[order], vals[order]
        n = len(k_s)
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        key_starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(key_starts, n))
        start_of_key = np.repeat(key_starts, counts)
        end_of_key = np.repeat(key_starts + counts - 1, counts)
        has_next = np.concatenate([k_s[1:] == k_s[:-1], [False]])
        nxt = np.concatenate([t_s[1:], [0]])
        return pa.table({
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
            ts_col: pa.array(t_s, pa.int64()).cast(ts_type),
            "next_ts": pa.array(nxt, mask=~has_next).cast(ts_type),
            "first_value": pa.array(v_s[start_of_key], pa.int64()),
            "last_value": pa.array(v_s[end_of_key], pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def key_funnel(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    num_partitions: int = 16,
):
    """Ordered conversion funnel per key — step k completes at the MIN
    event time of type ``steps[k]`` STRICTLY AFTER step k-1's completion
    (the product-analytics "view -> click -> purchase" question, and the
    crawl-ops "discovered -> fetched -> extracted" question).  Returns one
    row per key: ``(key, t_<step>..., n_steps)`` with null timestamps from
    the first unreached step on (an earlier-step event after a later gap
    can never resurrect the chain — the mask cascades).

    Same single-exchange shape as :func:`key_lag`: one crc32(key)
    exchange, then every partition resolves ALL its keys in
    ``len(steps)`` vectorized masked segmented-min passes
    (``np.minimum.at`` over key codes) — no per-key Python, no sort even:
    segmented min needs no ordering.  Deterministic: min is
    order-independent, ties irrelevant (strict > between steps).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop_columns(["_part"])
        ts_type = t[ts_col].type
        if pa.types.is_timestamp(ts_type):
            ts_type = pa.timestamp("us")
            t = t.set_column(
                t.schema.get_field_index(ts_col), ts_col,
                pc.cast(t[ts_col], ts_type),
            )
        out_schema = pa.schema(
            [(key_col, t[key_col].type)]
            + [("t_" + s, ts_type) for s in steps]
            + [("n_steps", pa.int64())]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        types = t[type_col].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(keys, return_inverse=True)
        n_keys = len(uniq)
        prev = np.full(n_keys, -np.inf)
        cols = {key_col: pa.array(uniq, t[key_col].type)}
        n_steps = np.zeros(n_keys, dtype=np.int64)
        tsf = ts.astype(np.float64)  # exact for any epoch-us magnitude
        for s in steps:
            cur = np.full(n_keys, np.inf)
            mask = (types == s) & (tsf > prev[codes])
            np.minimum.at(cur, codes[mask], tsf[mask])
            reached = np.isfinite(cur)
            n_steps += reached.astype(np.int64)
            cols["t_" + s] = pa.array(
                np.where(reached, cur, 0).astype(np.int64), mask=~reached
            ).cast(ts_type)
            prev = cur
        cols["n_steps"] = pa.array(n_steps, pa.int64())
        return pa.table(cols, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def key_median(
    ds,
    key_col: str,
    value_col: str,
    num_partitions: int = 16,
):
    """Per-key exact SQL ``median(value)`` at HIGH key cardinality (one
    row per key; the per-user / per-host statistic `grouped_exact_quantiles`
    is deliberately not built for — its driver state is per-group, so it
    caps at ~10^3 groups, while this kernel's state lives inside the
    partitions).  Even-count keys interpolate as the mean of the two
    middle values — exact in float64 for int64 inputs (the
    ``source_median_chars`` argument).  Nulls drop (SQL aggregate
    semantics); a key with only null values emits no row (its SQL median
    is NULL inside a group the oracle can filter symmetrically).

    ONE crc32(key) exchange of projected (key, value) rows, then every
    partition resolves ALL its keys in a single lexsort + boundary-index
    gather.  Returns ``(key, median)``.
    """
    import pyarrow.compute as pc

    from .partition import with_hash_partition

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, value_col])
        return t.filter(pc.is_valid(t[value_col]))

    parts = with_hash_partition(
        ds.map_batches(project, batch_format="pyarrow"),
        key_col, num_partitions,
    )

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            (key_col, t[key_col].type),
            ("median", pa.float64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        k_s, v_s = keys[order], vals[order]
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, len(k_s)))
        lo = starts + (counts - 1) // 2
        hi = starts + counts // 2
        med = (v_s[lo] + v_s[hi]) / 2.0
        return pa.table({
            key_col: pa.array(k_s[starts], t[key_col].type),
            "median": pa.array(med, pa.float64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def key_percentiles(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int = 16,
):
    """Per-key ``PERCENT_RANK()`` / ``CUME_DIST()`` over ``value ASC`` —
    the relative-standing window pair ((rank-1)/(n-1) and
    rows-with-value<=current / n).  Both are ONE double division of exact
    ints, so the floats are bit-reproducible.  Tie groups share both
    values (value-only ordering — engine-independent).  Same
    single-exchange lexsort sweep as :func:`key_rank`.
    Returns ``(id, key, value, pct_rank, cume_dist)``.
    """
    from .partition import with_hash_partition

    parts = with_hash_partition(ds, key_col, num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            (id_col, pa.int64()),
            (key_col, t[key_col].type),
            (value_col, pa.int64()),
            ("pct_rank", pa.float64()),
            ("cume_dist", pa.float64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, vals, keys))
        k_s, v_s, i_s = keys[order], vals[order], ids[order]
        n = len(k_s)
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        key_starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(key_starts, n))
        start_of_key = np.repeat(key_starts, counts)
        n_of_key = np.repeat(counts, counts)
        new_val = new_key | np.concatenate([[True], v_s[1:] != v_s[:-1]])
        val_starts = np.flatnonzero(new_val)
        val_counts = np.diff(np.append(val_starts, n))
        start_of_val = np.repeat(val_starts, val_counts)
        end_of_val = np.repeat(val_starts + val_counts - 1, val_counts)
        rank = start_of_val - start_of_key + 1
        le_count = end_of_val - start_of_key + 1
        pct = np.where(
            n_of_key > 1, (rank - 1) / np.maximum(n_of_key - 1, 1), 0.0
        )
        cume = le_count / n_of_key
        return pa.table({
            id_col: pa.array(i_s, pa.int64()),
            key_col: pa.array(k_s, t[key_col].type),
            value_col: pa.array(v_s, pa.int64()),
            "pct_rank": pa.array(pct, pa.float64()),
            "cume_dist": pa.array(cume, pa.float64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")
