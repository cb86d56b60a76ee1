"""Context-window document chunking — split each document into
overlapping fixed-token windows (the step between cleaning and
tokenization when documents exceed the model context; the sibling of
``packing.pack_sequences``, which handles the too-SHORT side).

Map-only and embarrassingly parallel: every output chunk is a pure
function of its own row, so the stage streams, never shuffles, and is
parallelism-invariant by construction.

Contract (mirrored exactly by the DuckDB oracle):

- tokens = whitespace split of the trimmed text (the same tokenizer as
  ``analysis.whitespace_token_counts``); docs with no tokens (empty /
  whitespace-only / null) emit no chunks;
- ``stride = chunk_tokens - overlap`` (requires ``0 <= overlap <
  chunk_tokens``); chunk ``j`` covers tokens ``[j*stride, j*stride +
  chunk_tokens)`` clipped to the doc;
- the number of chunks is ``ceil(max(n - overlap, 1) / stride)`` — every
  token is covered, and no chunk starts inside the final overlap region
  (which would duplicate a fully-contained window);
- ``chunk_text`` is the window's tokens joined by a single space
  (original whitespace runs are NOT preserved — chunking happens after
  :mod:`normalize` in a real pipeline, where they are already collapsed).

The emission is fully vectorized: ONE ``split_pattern_regex`` per batch,
window index arithmetic in numpy (repeat/cumsum — no per-doc Python),
token gather with ``take``, and one ``binary_join`` to build every chunk
string in a single kernel call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def make_chunk_batch(
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
):
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep)
        if not len(ids):
            return pa.table({
                id_col: pa.array([], id_type),
                "chunk_id": pa.array([], pa.int64()),
                "n_chunk_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        lists = pa.chunked_array([lists]).combine_chunks()
        flat = lists.values  # all tokens of the batch, back to back
        n = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        doc_start = np.concatenate([[0], np.cumsum(n)[:-1]])
        m = (np.maximum(n - overlap, 1) + stride - 1) // stride  # chunks/doc
        total = int(m.sum())
        doc_of = np.repeat(np.arange(len(n)), m)
        j = np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        tok_start = j * stride
        lens = np.minimum(chunk_tokens, n[doc_of] - tok_start)
        flat_start = doc_start[doc_of] + tok_start
        # gather indices for every chunk's tokens in one take()
        tot_toks = int(lens.sum())
        within = np.arange(tot_toks) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        take_idx = np.repeat(flat_start, lens) + within
        offsets = np.concatenate([[0], np.cumsum(lens)])
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.take(pa.array(take_idx, pa.int64()))
        )
        return pa.table({
            id_col: ids.take(pa.array(doc_of, pa.int64())),
            "chunk_id": pa.array(j, pa.int64()),
            "n_chunk_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pc.binary_join(chunk_lists, " "),
        })

    return fn


def chunk_documents(ds, text_col: str, id_col: str, chunk_tokens: int = 128, overlap: int = 16):
    """Dataset wrapper: one row per (doc, window)."""
    return ds.map_batches(
        make_chunk_batch(text_col, id_col, chunk_tokens, overlap),
        batch_format="pyarrow",
    )
