"""Model-based quality scoring — the actor-pool inference pattern for a
learned document-quality classifier (FineWeb-Edu-style model filtering),
exercised here with a fixed integer-weight linear model so the contract
stays exactly checkable.

The stage shape is the one a real model needs (and the one the OCR and
multimodal stages already use): a callable CLASS passed to
``map_batches(..., concurrency=N)`` — the checkpoint "loads" ONCE per
actor in ``__init__`` (here: materializing the weight vector; in
production: tokenizer + ONNX/torch weights), and ``__call__`` scores
whole batches vectorized.  Swapping in a real classifier changes only
``__init__`` and the matmul — not the pipeline.

The score is an INTEGER logit over integer features
(``w·x`` with integer weights, floor-div for the length penalty), so
engine and oracle agree bit-for-bit; a float sigmoid would only
monotonically rescale it and is left to callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: fixed "checkpoint": integer weights of the toy quality model
DEFAULT_WEIGHTS = {"w_tokens": 2, "w_distinct": 3, "w_chars_per10": -1, "bias": -40}


class QualityScorer:
    """Callable-class stage for ``map_batches`` actor pools."""

    def __init__(self, weights: dict | None = None, threshold: int = 0):
        # once per ACTOR, not per batch — the model-load seam
        w = dict(DEFAULT_WEIGHTS, **(weights or {}))
        self.w_tokens = int(w["w_tokens"])
        self.w_distinct = int(w["w_distinct"])
        self.w_chars_per10 = int(w["w_chars_per10"])
        self.bias = int(w["bias"])
        self.threshold = int(threshold)
        self.text_col = "text"
        self.id_col = "doc_id"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].cast(pa.int64())
        n = len(ids)
        n_chars = np.asarray(
            pc.fill_null(pc.utf8_length(batch[self.text_col]), 0), dtype=np.int64
        )
        trimmed = pc.utf8_trim_whitespace(batch[self.text_col])
        has_toks = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        mask = np.asarray(has_toks)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        if mask.any():
            lists = pc.split_pattern_regex(trimmed.filter(has_toks), pattern=r"\s+")
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            offsets = lists.offsets.to_numpy().astype(np.int64)
            offsets = offsets - offsets[0]
            counts = offsets[1:] - offsets[:-1]
            words = np.asarray(lists.flatten().to_pylist(), dtype=object)
            _, codes = np.unique(words, return_inverse=True)
            v = max(int(codes.max()) + 1, 1) if len(codes) else 1
            doc_ix = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            pair = np.unique(doc_ix * v + codes)
            idx = np.flatnonzero(mask)
            n_tokens[idx] = counts
            n_distinct[idx] = np.bincount(pair // v, minlength=len(counts))
        logit = (
            self.w_tokens * n_tokens
            + self.w_distinct * n_distinct
            + self.w_chars_per10 * (n_chars // 10)
            + self.bias
        )
        return pa.table({
            self.id_col: ids,
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "quality_logit": pa.array(logit, pa.int64()),
            "quality_ok": pa.array(logit > self.threshold),
        })


def score_quality(
    ds, text_col: str = "text", id_col: str = "doc_id",
    weights: dict | None = None, threshold: int = 0, concurrency=4,
):
    """Actor-pool scoring stage (weights load once per actor).

    An int ``concurrency`` is treated as the pool MAX with min size 1
    (``(1, n)``): a fixed pool of n actors each holding a CPU can consume
    every core of a small cluster and permanently starve the upstream read
    tasks — observed as a livelock at ``num_cpus=2`` with ``concurrency=2``.
    Pass a ``(min, max)`` tuple explicitly to pin a floor.
    """

    class _Bound(QualityScorer):
        def __init__(self):
            super().__init__(weights=weights, threshold=threshold)
            self.text_col = text_col
            self.id_col = id_col

    if type(concurrency) is int:  # bool is an int subclass; don't coerce it
        import logging

        logging.getLogger(__name__).info(
            "score_quality: int concurrency=%d coerced to autoscaling pool "
            "(1, %d); pass a (min, max) tuple to pin a floor", concurrency,
            max(1, concurrency),
        )
        concurrency = (1, max(1, concurrency))
    return ds.map_batches(_Bound, concurrency=concurrency, batch_format="pyarrow")
