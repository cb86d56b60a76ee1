"""Line/paragraph-level corpus operators.

Web-pipeline cleaning steps that work BELOW document granularity: C4-style
line filtering (Raffel et al. 2020 §2.2 — drop short/policy-violating
lines, keep the rest of the document) and cross-corpus paragraph-level
exact deduplication (Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" — remove every later occurrence of a duplicated
paragraph while preserving the surrounding document).

Vectorized core shared by both: documents are split ONCE with the Arrow
``split_pattern`` kernel, every per-line computation runs on the FLATTENED
value array (Arrow / numpy kernels — no Python loop over lines), and the
surviving lines are re-joined per document by offset arithmetic +
``binary_join``.

Scale shape of :func:`paragraph_dedup` (the only shuffling op here):

1. explode — map-only; ships THIN rows ``(h: int64 blake2b-8, doc_id,
   idx)``, never the paragraph text;
2. winner resolution — one hash-partitioned exchange on ``h``; every
   occurrence of a paragraph co-locates, the lexicographically first
   ``(doc_id, idx)`` wins, only LOSER coordinates (the duplicate
   occurrences, a small fraction of a crawl) ship onward;
3. reassembly — losers co-partitioned with their documents on ``doc_id``
   (tagged union, one exchange); each partition re-splits its documents
   and drops the loser positions with a sorted-key ``searchsorted``
   membership test.

So the all-to-all volume is O(paragraphs) thin int rows + O(duplicates),
never O(corpus bytes); document payloads cross the wire exactly once, in
stage 3.  At 10^12 documents the 64-bit paragraph hash has a ~2^-24
birthday collision chance per 10^9 DISTINCT paragraphs — the documented
approximation (an engine that needs certainty verifies winner groups by
content, the :mod:`.dedup` n-gram pattern).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .partition import with_hash_partition_int

__all__ = ["paragraph_dedup", "make_line_filter_batch"]


# --- shared vectorized split/rebuild helpers ------------------------------


def _nonnull_nonempty(batch: pa.Table, text_col: str) -> pa.Table:
    keep = pc.fill_null(pc.greater(pc.utf8_length(batch[text_col]), 0), False)
    return batch.filter(keep)


def _split_docs(texts, sep: str):
    """texts -> (list_array, values, offsets:int64[n+1] starting at 0,
    counts:int64[n]).  ``values`` is the flattened per-line string array."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    lists = pc.split_pattern(arr, pattern=sep)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy().astype(np.int64)
    offsets = offsets - offsets[0]
    values = lists.flatten()
    counts = offsets[1:] - offsets[:-1]
    return lists, values, offsets, counts


def _mask_join(values: pa.Array, offsets: np.ndarray, keep: np.ndarray, sep: str):
    """Keep only flagged flattened elements and re-join per document.

    Pure offset arithmetic: prefix-sum the keep mask to get per-doc kept
    counts, filter the value array once, rebuild a ListArray, and let the
    ``binary_join`` kernel produce the joined strings.  Returns
    ``(joined: pa.Array, kept_counts: np.ndarray)``; documents with zero
    kept elements join to ``""`` — callers filter on ``kept_counts``.
    """
    cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    kept_counts = cum[offsets[1:]] - cum[offsets[:-1]]
    new_offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    kept_values = values.filter(pa.array(keep))
    rebuilt = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), kept_values
    )
    return pc.binary_join(rebuilt, sep), kept_counts


# --- C4-style line filter (map-only) --------------------------------------


def make_line_filter_batch(
    text_col: str,
    id_col: str,
    sep: str = "\n",
    min_words: int = 5,
    badwords: tuple[str, ...] = (),
):
    """``map_batches`` fn: C4-style line cleaning (Raffel et al. 2020).

    Keeps lines with >= ``min_words`` whitespace-delimited words and no
    badword substring; re-joins the survivors per document.  Documents
    with zero surviving lines are dropped (C4 drops empty pages).  Output
    columns: ``(id, text, n_lines, n_kept)``.  Map-only — composes at any
    pipeline position with no shuffle.  All per-line predicates are Arrow
    RE2 / substring kernels over the flattened line array.
    """

    def fn(batch: pa.Table) -> pa.Table:
        batch = _nonnull_nonempty(batch, text_col)
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
                "n_lines": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            })
        _, values, offsets, counts = _split_docs(batch[text_col], sep)
        n_words = pc.count_substring_regex(values, pattern=r"\S+")
        keep = pc.greater_equal(n_words, min_words)
        for w in badwords:
            keep = pc.and_(keep, pc.invert(pc.match_substring(values, w)))
        keep_np = np.asarray(keep, dtype=bool)
        joined, kept_counts = _mask_join(values, offsets, keep_np, sep)
        doc_keep = pa.array(kept_counts > 0)
        return pa.table({
            id_col: batch[id_col].filter(doc_keep),
            text_col: joined.filter(doc_keep),
            "n_lines": pa.array(counts, pa.int64()).filter(doc_keep),
            "n_kept": pa.array(kept_counts, pa.int64()).filter(doc_keep),
        })

    return fn


# --- cross-corpus paragraph dedup -----------------------------------------


def _para_hashes(values: pa.Array) -> np.ndarray:
    """blake2b 8-byte digests of each flattened paragraph, as int64 (the
    hashlib rounds run in C; the loop is only encode + slice — same budget
    as the shingle/simhash kernels in :mod:`..functions.hashing`)."""
    return np.array(
        [
            int.from_bytes(blake2b(p.encode("utf-8"), digest_size=8).digest(), "little")
            for p in values.to_pylist()
        ],
        dtype=np.uint64,
    ).view(np.int64)


def paragraph_dedup(
    ds,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    num_partitions: int = 32,
    strategy: str = "broadcast",
):
    """Corpus-wide paragraph-level exact dedup (Lee et al. 2022 shape).

    The FIRST occurrence of each paragraph — ordered by ``(doc_id, idx)``
    — survives; every later occurrence (including repeats inside one
    document) is cut from its document's text.  Documents that lose every
    paragraph are dropped.  Returns a Dataset with columns
    ``(id, text, n_paras, n_kept)``.

    Matches the SQL semantics
    ``row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1``
    up to 64-bit paragraph-hash collisions (see module docstring).

    ``strategy`` picks the reassembly exchange (winner resolution always
    runs the thin-row hash shuffle of module-docstring stage 2):

    * ``"broadcast"`` (default) — loser coordinates (duplicate
      occurrences only, a small fraction of a crawl) are gathered into
      one (doc_id, idx)-sorted pair of int64 arrays inside a Ray task,
      ``ray.put`` once, and every map task cuts its documents with
      vectorized ``searchsorted`` probes.  Document payloads NEVER enter
      an all-to-all; measured ~2x end-to-end vs the shuffle path at 100k
      docs / 800k paragraphs (the second Sort dominated that wall).
    * ``"shuffle"`` — tagged-union co-partition of losers with documents
      on doc_id; for corpora whose duplicate fraction is too large for a
      broadcast array (ships payload bytes through ONE exchange, never
      concentrates coordinates in one place).
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def explode(batch: pa.Table) -> pa.Table:
        batch = _nonnull_nonempty(batch, text_col)
        if batch.num_rows == 0:
            return pa.table({
                "h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
            })
        _, values, offsets, counts = _split_docs(batch[text_col], sep)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat_ids = np.repeat(ids, counts)
        flat_idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        return pa.table({
            "h": pa.array(_para_hashes(values), pa.int64()),
            "doc_id": pa.array(flat_ids, pa.int64()),
            "idx": pa.array(flat_idx, pa.int64()),
        })

    thin = ds.map_batches(explode, batch_format="pyarrow")
    parts = with_hash_partition_int(thin, "h", num_partitions)

    def losers(part: pa.Table) -> pa.Table:
        h = part["h"].to_numpy(zero_copy_only=False)
        d = part["doc_id"].to_numpy(zero_copy_only=False)
        i = part["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, d, h))
        hs = h[order]
        first = np.empty(len(hs), dtype=bool)
        if len(hs):
            first[0] = True
            first[1:] = hs[1:] != hs[:-1]
        lose = order[~first]
        return pa.table({
            "doc_id": pa.array(d[lose].astype(np.int64), pa.int64()),
            "idx": pa.array(i[lose].astype(np.int64), pa.int64()),
        })

    # Duplicate-occurrence coordinates only — the thin side of the corpus.
    drop_ds = parts.groupby("_part").map_groups(losers, batch_format="pyarrow")

    if strategy == "broadcast":
        import ray

        def _gather(refs):
            # empty blocks can be schema-less (Ray derives no schema from
            # all-empty outputs) — skip them before touching columns
            ts = [
                t for t in ray.get(refs)
                if t.num_rows and "doc_id" in t.schema.names
            ]
            if ts:
                d = np.concatenate(
                    [t["doc_id"].to_numpy(zero_copy_only=False) for t in ts]
                ).astype(np.int64)
                i = np.concatenate(
                    [t["idx"].to_numpy(zero_copy_only=False) for t in ts]
                ).astype(np.int64)
            else:
                d = i = np.array([], dtype=np.int64)
            order = np.lexsort((i, d))
            return d[order], i[order]

        drop_ref = ray.remote(num_cpus=1)(_gather).remote(
            list(drop_ds.materialize().to_arrow_refs())
        )

        def cut(batch: pa.Table) -> pa.Table:
            drop_docs, drop_idx = ray.get(drop_ref)  # zero-copy plasma read
            batch = _nonnull_nonempty(batch, text_col)
            if batch.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    text_col: pa.array([], pa.string()),
                    "n_paras": pa.array([], pa.int64()),
                    "n_kept": pa.array([], pa.int64()),
                })
            doc_ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            _, values, offsets, counts = _split_docs(batch[text_col], sep)
            # slice the GLOBAL loser array down to this batch's docs:
            # per-doc [lo, hi) ranges, expanded by the repeat/arange trick
            u = np.sort(doc_ids)
            lo = np.searchsorted(drop_docs, u)
            hi = np.searchsorted(drop_docs, u, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total:
                sel = np.repeat(lo, cnt) + (
                    np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                sub_rank = np.searchsorted(u, drop_docs[sel])
                # global order is (doc, idx); within the batch that maps to
                # ascending (rank, idx) — already sorted for searchsorted
                drop_key = sub_rank * np.int64(2**32) + drop_idx[sel]
            else:
                drop_key = np.array([], dtype=np.int64)
            flat_rank = np.searchsorted(u, np.repeat(doc_ids, counts))
            flat_idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
                offsets[:-1], counts
            )
            flat_key = flat_rank.astype(np.int64) * np.int64(2**32) + flat_idx
            if len(drop_key):
                pos = np.searchsorted(drop_key, flat_key)
                pos_c = np.minimum(pos, len(drop_key) - 1)
                member = (pos < len(drop_key)) & (drop_key[pos_c] == flat_key)
            else:
                member = np.zeros(len(flat_key), dtype=bool)
            joined, kept_counts = _mask_join(values, offsets, ~member, sep)
            doc_keep = pa.array(kept_counts > 0)
            return pa.table({
                id_col: pa.array(doc_ids, pa.int64()).filter(doc_keep),
                text_col: joined.filter(doc_keep),
                "n_paras": pa.array(counts, pa.int64()).filter(doc_keep),
                "n_kept": pa.array(kept_counts, pa.int64()).filter(doc_keep),
            })

        return ds.map_batches(cut, batch_format="pyarrow")

    # Tagged union: document rows carry idx = -1 (real paragraph indices
    # are >= 0), loser rows carry a null text.  One co-partitioned
    # exchange on doc_id brings each document together with the positions
    # it must cut.
    def tag_docs(batch: pa.Table) -> pa.Table:
        batch = _nonnull_nonempty(batch, text_col)
        n = batch.num_rows
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "idx": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            "_text": batch[text_col].cast(pa.string()),
        })

    def tag_drops(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "idx": batch["idx"].cast(pa.int64()),
            "_text": pa.array([None] * n, pa.string()),
        })

    tagged = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        drop_ds.map_batches(tag_drops, batch_format="pyarrow")
    )
    co = with_hash_partition_int(tagged, "doc_id", num_partitions)

    def reassemble(t: pa.Table) -> pa.Table:
        idx = t["idx"].to_numpy(zero_copy_only=False)
        doc_mask = idx < 0
        docs_t = t.filter(pa.array(doc_mask))
        drops_t = t.filter(pa.array(~doc_mask))
        if docs_t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
                "n_paras": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            })
        doc_ids = docs_t["doc_id"].to_numpy(zero_copy_only=False)
        _, values, offsets, counts = _split_docs(docs_t["_text"], sep)
        # Dense-rank doc ids within the partition so the (doc, idx)
        # membership key fits int64 at ANY corpus id range (doc_id itself
        # can exceed 2^31 at crawl scale; the local rank cannot).
        u = np.sort(doc_ids)
        flat_rank = np.searchsorted(u, np.repeat(doc_ids, counts))
        flat_idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
            offsets[:-1], counts
        )
        flat_key = flat_rank.astype(np.int64) * np.int64(2**32) + flat_idx
        drop_rank = np.searchsorted(u, drops_t["doc_id"].to_numpy(zero_copy_only=False))
        drop_key = np.sort(
            drop_rank.astype(np.int64) * np.int64(2**32)
            + drops_t["idx"].to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(drop_key, flat_key)
        pos_c = np.minimum(pos, max(len(drop_key) - 1, 0))
        member = (
            (pos < len(drop_key)) & (drop_key[pos_c] == flat_key)
            if len(drop_key)
            else np.zeros(len(flat_key), dtype=bool)
        )
        joined, kept_counts = _mask_join(values, offsets, ~member, sep)
        doc_keep = pa.array(kept_counts > 0)
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()).filter(doc_keep),
            text_col: joined.filter(doc_keep),
            "n_paras": pa.array(counts, pa.int64()).filter(doc_keep),
            "n_kept": pa.array(kept_counts, pa.int64()).filter(doc_keep),
        })

    return co.groupby("_part").map_groups(reassemble, batch_format="pyarrow")
