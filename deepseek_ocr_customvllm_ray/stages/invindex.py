"""Distributed inverted index — token -> sorted posting list of doc ids
(the retrieval structure behind keyword search / contains-queries over a
crawl corpus; the text-side sibling of the persisted IVF vector index in
``similarity.py``).

Scale shape:
- read tasks emit THIN distinct (token, doc_id) pairs (np.unique pair
  factorization — text never leaves the task, within-doc repeats
  collapse before the wire);
- ONE crc32(token) hash exchange co-locates each token's pairs;
- every partition builds ALL its posting lists vectorized: lexsort +
  group boundaries + one ``binary_join`` over a ListArray — no per-token
  Python;
- postings are comma-joined strings (the artifact contract; a production
  variant would keep ``list<int64>`` — comma strings keep the driver's
  cell-hash contract and DuckDB's ``string_agg`` exactly comparable);
- ``write_inverted_index`` persists hive-partitioned by token-hash
  bucket, so a point lookup reads ONLY its bucket directories (path-level
  pruning — the corpus is never rescanned at query time).

Posting lists of stop-word-like tokens are corpus-sized; callers at
crawl scale should df-cap or drop the head of the vocabulary first
(``word_frequencies`` gives the df histogram) — documented, not silently
truncated here.
"""

from __future__ import annotations

import os
from zlib import crc32

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def make_pair_partial(text_col: str, id_col: str):
    """Per-batch distinct (token, doc_id) pairs."""

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep).cast(pa.int64()).to_numpy(zero_copy_only=False)
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = len(lists)
        if n == 0:
            return pa.table({
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
            })
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        counts = offsets[1:] - offsets[:-1]
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        vocab, codes = np.unique(words, return_inverse=True)
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), counts)
        pair = np.unique(doc_ix * len(vocab) + codes)
        return pa.table({
            "token": pa.array(vocab[pair % len(vocab)], pa.string()),
            "doc_id": pa.array(ids[pair // len(vocab)], pa.int64()),
        })

    return fn


def _build_partition(part: "pa.Table") -> "pa.Table":
    part = part.drop_columns(["_part"])
    if part.num_rows == 0:
        return pa.schema([("token", pa.string()), ("df", pa.int64()),
                          ("postings", pa.string())]).empty_table()
    tok_all = np.asarray(part["token"].to_pylist(), dtype=object)
    ids_all = part["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids_all, tok_all))
    tok = tok_all[order]
    ids = ids_all[order]
    first = np.empty(len(tok), dtype=bool)
    first[0] = True
    first[1:] = tok[1:] != tok[:-1]
    # cross-batch duplicates of a (token, doc_id) pair collapse here
    dup = np.zeros(len(ids), dtype=bool)
    dup[1:] = (ids[1:] == ids[:-1]) & ~first[1:]
    keep = ~dup
    ids_k = ids[keep]
    # recompute boundaries over the deduped stream
    tok_k = tok[keep]
    first_k = np.empty(len(tok_k), dtype=bool)
    first_k[0] = True
    first_k[1:] = tok_k[1:] != tok_k[:-1]
    starts_k = np.flatnonzero(first_k)
    lens_k = np.diff(np.append(starts_k, len(tok_k)))
    id_strs = pa.array(ids_k.astype("U"), pa.string())
    lists = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(lens_k)]), pa.int32()), id_strs
    )
    postings = pc.binary_join(lists, ",")
    return pa.table({
        "token": pa.array(tok_k[starts_k], pa.string()),
        "df": pa.array(lens_k.astype(np.int64), pa.int64()),
        "postings": postings,
    })


def inverted_index(ds, text_col: str, id_col: str, num_partitions: int = 32):
    """``Dataset -> Dataset`` of (token, df, postings)."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = np.array(
            [crc32(t.encode("utf-8")) % num_partitions for t in batch["token"].to_pylist()],
            dtype=np.int32,
        )
        return batch.append_column("_part", pa.array(part, pa.int32()))

    return (
        ds.map_batches(make_pair_partial(text_col, id_col), batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_build_partition, batch_format="pyarrow")
    )


def write_inverted_index(
    ds, out_dir: str, text_col: str, id_col: str,
    num_partitions: int = 32, num_buckets: int = 16,
):
    """Persist the index hive-partitioned by token-hash bucket
    (``bucket=<k>/``); returns the directory."""
    idx = inverted_index(ds, text_col, id_col, num_partitions)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = np.array(
            [crc32(t.encode("utf-8")) % num_buckets for t in batch["token"].to_pylist()],
            dtype=np.int32,
        )
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    idx.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def lookup_postings(index_dir: str, tokens, num_buckets: int = 16) -> dict:
    """Point lookup: reads ONLY the queried tokens' bucket directories
    (path-level pruning; see the hive-partition gotcha — filters on
    partition columns break Ray's fragment sampler, so we pass the
    directories explicitly)."""
    import ray.data as rd

    want = {t: crc32(t.encode("utf-8")) % num_buckets for t in tokens}
    dirs = sorted({os.path.join(index_dir, f"bucket={b}") for b in want.values()})
    dirs = [d for d in dirs if os.path.isdir(d)]
    # a LIST of paths must be files, not directories, for read_parquet
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        return {}
    tset = pa.array(sorted(want), pa.string())

    def probe(batch: pa.Table) -> pa.Table:
        hit = pc.is_in(batch["token"], value_set=tset)
        return batch.filter(hit).select(["token", "postings"])

    out = rd.read_parquet(files).map_batches(probe, batch_format="pyarrow").take_all()
    return {r["token"]: r["postings"] for r in out}
