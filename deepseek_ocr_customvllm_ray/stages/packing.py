"""Sequence packing — group documents into training sequences whose token
budget is bounded by ``max_tokens`` (the "sample packing" step every LLM
pre-training pipeline runs between cleaning and tokenized-shard writing).

Packing is inherently order-dependent, so a naive distributed version would
change output with block arrival order.  This one is **parallelism-
invariant by construction**: documents are assigned to fixed id ranges
(``range_id = doc_id // range_size`` — a pure function of the row, not of
execution), each range packs greedily in ascending doc_id order, and
sequence ids encode (range_id, index-within-range).  Any cluster shape,
block order, or retry produces byte-identical sequences.

Scale shape:
- stage 1 projects each doc to THIN rows (doc_id, n_tokens, range)
  inside ``map_batches`` — text never leaves the reading task;
- one all-to-all keyed on ``range_id % num_partitions`` (a small int32)
  co-locates each range; moved bytes are ~16/row regardless of doc size;
- stage 2 packs each partition in one vectorized-setup pass (numpy
  sort + range slicing; the greedy fill itself is an O(n) walk over a
  small int array per range).

Oversized docs (n_tokens > max_tokens) become single-doc sequences and are
flagged ``truncated`` — the downstream tokenizer decides clip-vs-split.
Not SQL-expressible (sequential greedy fill), so the query oracle is a
golden snapshot; semantics are pinned by a serial-reference parity test
and a cross-parallelism invariance test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: max sequences representable per range (seq_id = range_id * _SEQ_STRIDE + i)
_SEQ_STRIDE = 1_000_000


def _token_counts(batch: pa.Table, text_col: str) -> pa.Array:
    """Whitespace token counts (the shared analysis kernel); null text
    packs as an empty doc."""
    from .analysis import whitespace_token_counts

    return pc.fill_null(whitespace_token_counts(batch[text_col]), 0)


def pack_greedy(doc_ids: np.ndarray, n_tokens: np.ndarray, max_tokens: int):
    """Serial greedy fill over docs already in ascending doc_id order.

    Returns a list of (doc_id_list, total_tokens, truncated) sequences.
    A doc that would overflow the open sequence closes it; a doc alone
    bigger than the budget ships as its own truncated sequence."""
    seqs = []
    cur_ids: list[int] = []
    cur_tok = 0
    for d, t in zip(doc_ids.tolist(), n_tokens.tolist()):
        if t > max_tokens:
            if cur_ids:
                seqs.append((cur_ids, cur_tok, False))
                cur_ids, cur_tok = [], 0
            seqs.append(([d], t, True))
            continue
        if cur_tok + t > max_tokens and cur_ids:
            seqs.append((cur_ids, cur_tok, False))
            cur_ids, cur_tok = [], 0
        cur_ids.append(d)
        cur_tok += t
    if cur_ids:
        seqs.append((cur_ids, cur_tok, False))
    return seqs


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    range_size: int = 200,
    num_partitions: int = 16,
):
    """``Dataset -> Dataset`` of packed sequences.

    Output columns: ``seq_id`` (int64, globally unique, order-invariant),
    ``doc_ids`` (comma-joined ascending ids), ``n_docs``, ``total_tokens``,
    ``truncated`` (bool: single oversized doc)."""
    if range_size > _SEQ_STRIDE:
        # a range can emit at most range_size sequences (one per doc);
        # beyond the stride, seq_ids of adjacent ranges would collide
        raise ValueError(
            f"range_size ({range_size}) must be <= {_SEQ_STRIDE} "
            "to keep seq_id = range_id * stride + i collision-free"
        )

    def project(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        rng = ids_np // range_size  # ids >= 0: floor == trunc
        return pa.table({
            "doc_id": ids,
            "n_tokens": _token_counts(batch, text_col),
            "range_id": pa.array(rng, pa.int64()),
            "_part": pa.array((rng % num_partitions).astype(np.int32)),
        })

    _OUT_SCHEMA = pa.schema([
        ("seq_id", pa.int64()),
        ("doc_ids", pa.string()),
        ("n_docs", pa.int64()),
        ("total_tokens", pa.int64()),
        ("truncated", pa.bool_()),
    ])

    def pack_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        doc_id = part["doc_id"].to_numpy(zero_copy_only=False)
        n_tokens = part["n_tokens"].to_numpy(zero_copy_only=False)
        range_id = part["range_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc_id, range_id))
        ids = doc_id[order]
        toks = n_tokens[order]
        rngs = range_id[order]
        out = {"seq_id": [], "doc_ids": [], "n_docs": [], "total_tokens": [],
               "truncated": []}
        bounds = np.flatnonzero(np.diff(rngs)) + 1
        for lo, hi in zip(
            np.concatenate(([0], bounds)), np.concatenate((bounds, [len(ids)]))
        ):
            base = int(rngs[lo]) * _SEQ_STRIDE
            for i, (sids, tot, trunc) in enumerate(
                pack_greedy(ids[lo:hi], toks[lo:hi], max_tokens)
            ):
                out["seq_id"].append(base + i)
                out["doc_ids"].append(",".join(map(str, sids)))
                out["n_docs"].append(len(sids))
                out["total_tokens"].append(tot)
                out["truncated"].append(trunc)
        return pa.table(out, schema=_OUT_SCHEMA)

    thin = ds.map_batches(project, batch_format="pyarrow")
    return thin.groupby("_part").map_groups(pack_partition, batch_format="pyarrow")
