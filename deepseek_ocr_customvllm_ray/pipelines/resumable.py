"""Resumable extraction run: shard-partitioned output + checkpoint manifest.

``run_resumable(pages_path, out_dir)``:

1. read the manifest -> completed shard set; delete partial shard dirs;
2. read pages, route, add shard_id = crc32(url_host) % n_shards;
3. ANTI-JOIN against completed shards (broadcast set filter in map_batches
   — no shuffle);
4. run the extraction pipeline on the remainder;
5. write hive-partitioned parquet (``shard_id=K/``) — per-shard dirs are the
   resumable unit;
6. compute per-shard lineage records (pre-aggregated XOR fold) and write one
   manifest JSON per shard atomically.

A crashed run leaves shards either (a) manifested+complete or (b) partial
without manifest; step 1 makes (b) disappear, so a resumed run reprocesses
exactly the missing shards and the final (output, manifest) state is
byte-identical to a cold run — asserted by tests/test_resume.py.
"""

from __future__ import annotations

from typing import Optional, Set

import pyarrow as pa

from ..config import ExtractConfig
from ..state.manifest import (
    clean_partial_shards,
    host_of_url,
    read_manifest,
    shard_of_host,
    write_manifest_record,
)
from ..stages.lineage import shard_lineage_records
from .extract import build_extract_pipeline, read_pages


def _add_shard(batch: pa.Table, n_shards: int) -> pa.Table:
    sids = pa.array(
        [shard_of_host(host_of_url(u), n_shards) for u in batch["url"].to_pylist()],
        pa.int32(),
    )
    return batch.append_column("shard_id", sids)


def run_resumable(
    pages_path: str,
    out_dir: str,
    n_shards: int = 16,
    cfg: Optional[ExtractConfig] = None,
    only_shards: Optional[Set[int]] = None,
) -> dict:
    """Returns {"completed_before", "removed_partial", "processed"}
    shard-id lists.

    ``only_shards`` restricts processing (used by tests to simulate a run
    that crashed after finishing a subset of shards).  Every candidate
    shard (in scope and not previously completed) gets a manifest record
    after this run — shards whose remaining input yields zero documents get
    a zero record, so resume converges instead of re-reading them forever.
    """
    import ray

    cfg = cfg or ExtractConfig()
    manifest = read_manifest(out_dir)
    completed: Set[int] = set(manifest)
    removed = clean_partial_shards(out_dir, completed)

    skip_ref = ray.put(completed)

    def drop_done(batch: pa.Table) -> pa.Table:
        done = ray.get(skip_ref)
        batch = _add_shard(batch, n_shards)
        keep = [
            (s not in done) and (only_shards is None or s in only_shards)
            for s in batch["shard_id"].to_pylist()
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    ds = read_pages(pages_path).map_batches(drop_done, batch_format="pyarrow")
    docs = build_extract_pipeline(ds, cfg)

    # re-derive shard_id on the output (url is carried through) and write
    # hive-partitioned so each shard is an independent directory
    def add_out_shard(batch: pa.Table) -> pa.Table:
        return _add_shard(batch, n_shards)

    docs = docs.map_batches(add_out_shard, batch_format="pyarrow")
    # drop nested columns parquet partitioning chokes on? no — blocks/figures
    # are ordinary list<struct> columns, parquet handles them.
    docs = docs.materialize()  # consumed twice below (write + lineage);
    # the extracted output is ~manifest-scale smaller than input; at larger
    # scale, swap for write-then-read-back of the shard dirs.
    if docs.count() > 0:
        docs.write_parquet(out_dir, partition_cols=["shard_id"])
        records = shard_lineage_records(docs, n_shards)
    else:
        records = []
    # zero records for in-scope shards that produced no documents (all-
    # corrupt / all-invalid input): they are DONE, not pending
    candidates = set(range(n_shards)) - completed
    if only_shards is not None:
        candidates &= set(only_shards)
    have = {r["shard_id"] for r in records}
    for sid in sorted(candidates - have):
        records.append({
            "shard_id": sid, "n_docs": 0, "n_pages": 0, "md_bytes": 0,
            "content_hash": 0, "n_hosts": 0,
        })
    for rec in records:
        write_manifest_record(out_dir, rec)

    return {
        "completed_before": sorted(completed),
        "removed_partial": sorted(removed),
        "processed": sorted(r["shard_id"] for r in records),
    }
