"""Exact URL dedup guard — hash-partition + per-group earliest
(SURVEY §2.8: the per-row invariant is keyed on url, so duplicate crawls of
the same url must collapse to one deterministic winner BEFORE extraction).

Winner = min (warc_ts, sha1(payload)): earliest crawl wins; byte-hash
tie-break makes the choice independent of block arrival order under the
streaming executor.  The groupby is a shuffle keyed on url — at 100 TB this
is the cheap shuffle (doc-level rows, payload moves once, before any page
explosion multiplies rows).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def keep_earliest(group: pd.DataFrame) -> pd.DataFrame:
    """Winner row for one url (used by tests; the pipeline uses the
    vectorized per-block path below)."""
    if len(group) == 1:
        return group
    keys = [
        (ts, hashlib.sha1(payload).hexdigest())
        for ts, payload in zip(group["warc_ts"], group["html"])
    ]
    best = min(range(len(keys)), key=keys.__getitem__)
    return group.iloc[[best]]


def dedup_block(batch: pa.Table) -> pa.Table:
    """Vectorized keep-earliest within one hash partition: rows of a url are
    co-located by the partitioner, so a partition-local winner is the global
    answer.  PYARROW in/out: multi-MB ``html`` payloads stay Arrow buffers —
    the former pandas kernel pivoted every payload into a Python ``bytes``
    object and back, a real copy tax on this (non-default) path.  The sha1
    tie-break touches ONLY duplicated urls' payloads (the rare case); the
    no-duplicate fast path returns the batch zero-copy."""
    import numpy as np

    if "_part" in batch.column_names:
        batch = batch.drop_columns(["_part"])
    urls = batch["url"].to_numpy(zero_copy_only=False)
    _, inv, counts = np.unique(urls, return_inverse=True, return_counts=True)
    dup_mask = counts[inv] > 1
    if not dup_mask.any():
        return batch
    uniq = batch.filter(pa.array(~dup_mask))
    dup_ix = np.flatnonzero(dup_mask)
    dups = batch.take(pa.array(dup_ix, pa.int64()))
    shas = np.asarray(
        [hashlib.sha1(p.as_py()).hexdigest() for p in dups["html"]], dtype=object
    )
    d_urls = urls[dup_ix]
    d_ts = dups["warc_ts"].to_numpy(zero_copy_only=False)
    order = np.lexsort((shas, d_ts, d_urls))
    u_sorted = d_urls[order]
    first = np.empty(len(order), dtype=bool)
    first[0] = True
    first[1:] = u_sorted[1:] != u_sorted[:-1]
    winners = dups.take(pa.array(order[first], pa.int64()))
    return pa.concat_tables([uniq, winners])


def dedup_by_url(ds, num_partitions: int = 64):
    """``Dataset -> Dataset`` with one deterministic row per url.

    Hash-partition by crc32(url) % N (one all-to-all of doc rows keyed on a
    small int — cheap to sort) then ONE vectorized winner pass per
    partition.  Semantically identical to ``groupby(url).map_groups(keep_
    earliest)`` but pays N Python calls instead of one per url — at 10^9
    urls the per-group calls dominate."""
    from .partition import with_hash_partition

    ds = with_hash_partition(ds, "url", num_partitions)
    return ds.groupby("_part").map_groups(dedup_block, batch_format="pyarrow")


def dedup_by_url_broadcast(ds, max_payload_mb: int = 200):
    """Shuffle-free twin of :func:`dedup_by_url` for an already-ROUTED
    stream: payload rows never cross an all-to-all.

    1. meta pass: project ONLY (url, warc_ts) off the lazy routed stream
       (the route stage already applied the shared validity predicate, so
       the bare projection IS the validated meta view) and resolve
       duplicate-url winners with ``dedup_meta.compute_dup_winners`` — one
       thin hash-partitioned exchange of key/ts rows;
    2. broadcast the winner arrays (``ray.put`` once, read per task);
    3. filter pass: the SAME lazy upstream re-executes under the vectorized
       winner predicate; exact-clone urls re-join as their single canonical
       row.

    Trade-off vs the shuffle path: the upstream read+route executes twice
    (meta pass + filter pass), but the meta view is two thin columns —
    measured far cheaper than hash-partition-sorting payload bytes (the
    payload dedup exchange is ~30 s of the page-exploded flagship wall on
    the bench corpus).  Pick ``page_dedup_strategy="shuffle"`` when the
    upstream is too expensive to run twice (e.g. a decompression-heavy
    source)."""
    import ray
    import ray.data as rd

    from .dedup_meta import (
        compute_dup_winners,
        make_winner_filter,
        winners_to_arrays,
    )

    meta_ds = ds.select_columns(["url", "warc_ts"])
    winners, clone_rows = compute_dup_winners(
        meta_ds, payload_ds=ds, max_payload_mb=max_payload_mb
    )
    if not winners:
        return ds
    winners_ref = ray.put(winners_to_arrays(winners))
    out = ds.map_batches(make_winner_filter(winners_ref), batch_format="pyarrow")
    if clone_rows is not None:
        # canonical rows for exact-clone urls (already routed — they were
        # sliced from this same stream's batches) rejoin after the filter
        out = out.union(rd.from_arrow(clone_rows))
    return out
