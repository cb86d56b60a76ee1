"""Lineage/metrics pass (G2/K9 analog): per-shard and per-host aggregate
records over the extracted output.

The reference's per-job status/timing row in Postgres (ocr_service.py:49-59,
186-198) becomes a ``groupby(url_host)`` / ``groupby(shard_id)`` aggregate
emitting ``(n_docs, n_pages, total_md_bytes, content_hash)`` — the records
that feed the checkpoint manifest and make runs auditable.

content_hash is an XOR fold (order-insensitive), computed per batch with a
vectorized partial aggregation before the tiny groupby (pre-aggregate
pattern: the shuffle moves one row per (host, batch), not per doc).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..state.manifest import doc_hash63, host_of_url, shard_of_host


def make_lineage_partials(n_shards: int):
    """Extracted-doc batch -> per-(shard, host) partial lineage rows."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        mds = batch["markdown"].to_pylist()
        n_pages = batch["n_pages"].to_pylist()
        agg = {}
        for url, md, np_ in zip(urls, mds, n_pages):
            host = host_of_url(url)
            sid = shard_of_host(host, n_shards)
            key = (sid, host)
            cur = agg.setdefault(key, [0, 0, 0, 0])
            cur[0] += 1
            cur[1] += int(np_)
            cur[2] += len(md.encode("utf-8"))
            cur[3] ^= doc_hash63(url, md)
        rows = sorted(agg.items())
        return pa.table(
            {
                "shard_id": pa.array([k[0] for k, _ in rows], pa.int32()),
                "url_host": pa.array([k[1] for k, _ in rows], pa.string()),
                "n_docs_p": pa.array([v[0] for _, v in rows], pa.int64()),
                "n_pages_p": pa.array([v[1] for _, v in rows], pa.int64()),
                "md_bytes_p": pa.array([v[2] for _, v in rows], pa.int64()),
                "hash_p": pa.array([v[3] for _, v in rows], pa.int64()),
            }
        )

    return fn


def host_lineage(docs_ds, n_shards: int = 64, agg_blocks: int = 1):
    """Extracted docs -> per-host lineage records (small table).

    ``agg_blocks``: the partial table coalesces to this many blocks before
    the groupby — Ray's sort shuffle emits schema-less empty bundles for
    empty input blocks (warning spam + divergent downstream schema), and
    the partial table is host-bounded so one block is the right default."""
    import pandas as pd

    partials = docs_ds.map_batches(make_lineage_partials(n_shards), batch_format="pyarrow")
    partials = partials.repartition(agg_blocks)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        h = 0
        for v in group["hash_p"]:
            h ^= int(v)
        return pd.DataFrame(
            {
                "shard_id": [int(group["shard_id"].iloc[0])],
                "url_host": [group["url_host"].iloc[0]],
                "n_docs": [int(group["n_docs_p"].sum())],
                "n_pages": [int(group["n_pages_p"].sum())],
                "md_bytes": [int(group["md_bytes_p"].sum())],
                "content_hash": [h],
            }
        )

    return partials.groupby("url_host").map_groups(fold, batch_format="pandas")


def shard_lineage_records(docs_ds, n_shards: int) -> List[dict]:
    """Collapse host lineage to one record per shard (manifest rows).
    The result is tiny (n_shards rows) — safe to collect on the driver."""
    hosts = host_lineage(docs_ds, n_shards).to_pandas()
    out = []
    for sid, g in hosts.groupby("shard_id"):
        h = 0
        for v in g["content_hash"]:
            h ^= int(v)
        out.append(
            {
                "shard_id": int(sid),
                "n_docs": int(g["n_docs"].sum()),
                "n_pages": int(g["n_pages"].sum()),
                "md_bytes": int(g["md_bytes"].sum()),
                "content_hash": h,
                "n_hosts": int(len(g)),
            }
        )
    return out
