"""BM25 top-k retrieval over a text column.

The ranking completion of the retrieval family (``stages/invindex.py``
builds the index; this scores a query): Okapi BM25 with the Lucene
non-negative idf, ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)``,

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*((1-b) + b*dl/avgdl))

Cross-engine exactness: every float expression is written with ONE fixed
parenthesization, mirrored literally in the DuckDB oracle — the inputs
(tf, dl, df, N, sum_dl) are exact integers, constants are identical
literals, and IEEE-754 doubles make the same op sequence bit-identical,
so even the emitted ``score`` column hash-matches (the same discipline
that makes ``weighted_sample``'s ``-ln(u)/w`` key oracle-exact).

Scale shape:

* pass 1 is a map-only corpus-stats pass with ONE tiny partial row per
  batch: ``(n_docs, sum_dl, df_1..df_T)`` — folded on the driver (a few
  ints per batch, independent of corpus size);
* pass 2 is map-only scoring + per-batch top-k: each batch keeps its k
  best ``(id, score)``, so the final exchange sees k rows per block and
  the global resolve sorts a tiny survivor set (the ``weighted_sample``
  shape).  Corpus bytes never shuffle; only matching docs (score > 0)
  are candidates.

Tokenization matches ``analysis.word_frequencies``: whitespace-trim then
``\\s+`` split, empty docs excluded — byte-compatible with the oracle's
``string_split_regex(trim(text), '\\s+')``.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bm25_topk"]

_WS = " \t\n\v\f\r"


def _doc_tokens(batch: pa.Table, text_col: str):
    """(doc mask over batch rows, flattened values, offsets) for nonempty
    trimmed docs — the word_frequencies tokenization."""
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
    keep_np = np.asarray(keep)
    lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    if len(lists):
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        values = lists.flatten()
    else:
        offsets = np.zeros(1, dtype=np.int64)
        values = pa.array([], pa.string())
    return keep_np, values, offsets


def _term_tfs(values: pa.Array, offsets: np.ndarray, terms) -> np.ndarray:
    """(n_docs, n_terms) int64 term frequencies via one equality kernel +
    prefix-sum window per term — no Python loop over tokens."""
    n_docs = len(offsets) - 1
    out = np.zeros((n_docs, len(terms)), dtype=np.int64)
    for ti, term in enumerate(terms):
        mask = np.asarray(pc.equal(values, term))
        if mask.dtype == object:  # empty array edge
            mask = mask.astype(bool)
        cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        out[:, ti] = cs[offsets[1:]] - cs[offsets[:-1]]
    return out


def bm25_topk(
    ds,
    text_col: str,
    id_col: str,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """``Dataset -> Dataset (id, score)`` — the k highest-BM25 docs for
    the bag-of-terms query, score desc, id tie-break, only score > 0."""
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    # ---- pass 1: corpus stats (one tiny row per batch) ----
    def stats_partial(batch: pa.Table) -> pa.Table:
        _keep, values, offsets = _doc_tokens(batch, text_col)
        n_docs = len(offsets) - 1
        tfs = _term_tfs(values, offsets, terms)
        row = {
            "n": pa.array([n_docs], pa.int64()),
            "sdl": pa.array([int(offsets[-1])], pa.int64()),
        }
        for ti in range(len(terms)):
            row[f"df{ti}"] = pa.array(
                [int((tfs[:, ti] > 0).sum())], pa.int64()
            )
        return pa.table(row)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_total = int(parts["n"].sum())
    if n_total == 0:
        return _empty_result(id_col)
    sum_dl = int(parts["sdl"].sum())
    dfs = [int(parts[f"df{ti}"].sum()) for ti in range(len(terms))]
    avgdl = sum_dl / n_total  # exact same int/int -> double as the oracle
    idfs = [
        math.log((n_total - df + 0.5) / (df + 0.5) + 1.0) for df in dfs
    ]

    # ---- pass 2: map-only score + per-batch top-k partial ----
    def score_partial(batch: pa.Table) -> pa.Table:
        keep_np, values, offsets = _doc_tokens(batch, text_col)
        ids = (
            batch[id_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep_np]
        )
        if not len(ids):
            return _empty_result(id_col).combine_chunks()
        tfs = _term_tfs(values, offsets, terms)
        dl = (offsets[1:] - offsets[:-1]).astype(np.float64)
        # parenthesization mirrored in the oracle SQL, term order fixed
        norm = tfs.astype(np.float64) + k1 * ((1.0 - b) + (b * dl[:, None]) / avgdl)
        score = np.zeros(len(ids), dtype=np.float64)
        for ti in range(len(terms)):
            score = score + idfs[ti] * (
                (tfs[:, ti].astype(np.float64) * (k1 + 1.0)) / norm[:, ti]
            )
        hit = score > 0.0
        ids, score = ids[hit], score[hit]
        order = np.lexsort((ids, -score))[:k]
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "score": pa.array(score[order], pa.float64()),
        })

    out = ds.map_batches(score_partial, batch_format="pyarrow")
    return out.sort(["score", id_col], descending=[True, False]).limit(k)


def _empty_result(id_col: str) -> pa.Table:
    return pa.table({
        id_col: pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    })
