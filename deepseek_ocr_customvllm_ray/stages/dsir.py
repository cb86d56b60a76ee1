"""DSIR-style data selection: hashed-n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining documents whose hashed unigram+bigram
feature distribution looks like a small TARGET corpus rather than the RAW
corpus: estimate bucketed n-gram distributions p (target) and q (raw),
score each raw document ``w(x) = sum_b c_b(x) * (log p_b - log q_b)``, and
keep the top-k by ``w + Gumbel noise`` (here: a SEEDED Gumbel derived from
the document id, so selection is a pure function of (corpus, target, seed,
k) — reproducible on any cluster shape).

Scale shape (100 TB story):
- feature hashing is map-only: words factorized per batch (``np.unique``),
  crc32 computed once per DISTINCT word, bigram buckets from a splitmix64
  mix of the two word hashes — bucket ids are pure functions of the token
  strings, independent of batching;
- the distribution estimate is the lineage-partial pattern: per-batch
  bucket-count partials (<= n_buckets rows each) -> one groupby bounded by
  ``n_buckets`` (default 2^14), never by corpus size;
- the two distributions fold to ONE dense float64 log-ratio vector
  (n_buckets * 8 B — 128 KB at the default), broadcast via ``ray.put``;
  scoring is a map-only pass (one ``np.bincount`` matmul per batch);
- top-k selection is the distributed local-top-k + driver-merge pattern
  (same as q_top20_longest_docs); k rows reach the driver, never the
  corpus.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 1 << 14

_SPLITMIX_A = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_B = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (wrapping uint64) — decorrelates crc32 inputs."""
    x = (x + _SPLITMIX_A)
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_B
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C
    return x ^ (x >> np.uint64(31))


def _word_hashes(flat_words) -> np.ndarray:
    """crc32 per DISTINCT word (vocabulary-bounded Python; no Arrow crc
    kernel exists), gathered back to the flat array — deterministic across
    batches because the hash is a pure function of the token string."""
    import zlib

    words = np.asarray(flat_words.to_pylist(), dtype=object)
    if not len(words):
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(words, return_inverse=True)
    crc = np.fromiter(
        (zlib.crc32(w.encode("utf-8")) for w in uniq),
        dtype=np.uint64, count=len(uniq),
    )
    return crc[inv]


def _doc_feature_buckets(
    texts, n_buckets: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """String array -> (doc_index, bucket, count) triples over hashed
    unigram + bigram features (one split per batch, numpy the rest)."""
    from .analysis import _py_split_words

    m, flat = _py_split_words(texts)
    h = _word_hashes(flat)
    total = int(m.sum())
    doc_ix = np.repeat(np.arange(len(m), dtype=np.int64), m)

    uni_b = (_mix64(h) % np.uint64(n_buckets)).astype(np.int64)
    # bigrams: adjacent pairs within a doc
    ends = np.cumsum(m)
    pos = np.arange(total, dtype=np.int64) - np.repeat(ends - m, m)
    has_next = pos < np.repeat(m, m) - 1
    big_h = _mix64(h[:-1] * np.uint64(1099511628211) + _mix64(h[1:])) if total > 1 else np.empty(0, np.uint64)
    big_b = (big_h[has_next[:-1]] % np.uint64(n_buckets)).astype(np.int64) if total > 1 else np.empty(0, np.int64)
    big_doc = doc_ix[:-1][has_next[:-1]] if total > 1 else np.empty(0, np.int64)

    all_doc = np.concatenate([doc_ix, big_doc])
    all_b = np.concatenate([uni_b, big_b])
    if not len(all_doc):
        return all_doc, all_b, np.empty(0, np.int64)
    # collapse to (doc, bucket) counts
    order = np.lexsort((all_b, all_doc))
    d_s, b_s = all_doc[order], all_b[order]
    new = np.empty(len(d_s), dtype=bool)
    new[0] = True
    new[1:] = (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(d_s)))
    return d_s[starts], b_s[starts], counts.astype(np.int64)


def make_bucket_count_partial(text_col: str, n_buckets: int = DEFAULT_BUCKETS):
    """Per-batch partial corpus bucket counts (<= n_buckets rows per batch)
    — the combiner feeding a bucket-bounded groupby."""

    def fn(batch: pa.Table) -> pa.Table:
        _, b, c = _doc_feature_buckets(batch[text_col], n_buckets)
        if len(b):
            vec = np.bincount(b, weights=c, minlength=n_buckets).astype(np.int64)
            nz = np.flatnonzero(vec)
        else:
            vec, nz = None, np.empty(0, np.int64)
        return pa.table({
            "bucket": pa.array(nz, pa.int64()),
            "cnt_p": pa.array(vec[nz] if len(nz) else [], pa.int64()),
        })

    return fn


def bucket_distribution(ds, text_col: str, n_buckets: int = DEFAULT_BUCKETS) -> np.ndarray:
    """Corpus -> dense bucket-count vector (int64[n_buckets]).  The groupby
    is bounded by n_buckets; the dense fold happens on the driver (128 KB
    at the default size)."""
    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(make_bucket_count_partial(text_col, n_buckets),
                       batch_format="pyarrow")
        .repartition(1)  # bucket-bounded; avoids empty-block schema bundles
        .groupby("bucket")
        .aggregate(Sum("cnt_p", alias_name="n"))
        .take_all()
    )
    vec = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        vec[int(r["bucket"])] = int(r["n"])
    return vec


def log_ratio_vector(
    target_counts: np.ndarray, raw_counts: np.ndarray, alpha: float = 1.0
) -> np.ndarray:
    """Smoothed ``log p_hat - log q_hat`` per bucket (add-alpha on both)."""
    p = (target_counts + alpha) / (target_counts.sum() + alpha * len(target_counts))
    q = (raw_counts + alpha) / (raw_counts.sum() + alpha * len(raw_counts))
    return np.log(p) - np.log(q)


def make_importance_score_batch(
    text_col: str, id_col: str, log_ratio_ref, n_buckets: int, seed: int = 0
):
    """map_batches fn: (id, weight, gumbel_key) per doc.  ``gumbel_key`` is
    ``weight + Gumbel(seed, id)`` — the DSIR sampling statistic, a pure
    function of (doc, seed) via a blake2b-seeded uniform."""
    import hashlib

    import ray

    def fn(batch: pa.Table) -> pa.Table:
        lr = ray.get(log_ratio_ref) if not isinstance(log_ratio_ref, np.ndarray) else log_ratio_ref
        d, b, c = _doc_feature_buckets(batch[text_col], n_buckets)
        n = batch.num_rows
        w = np.zeros(n, dtype=np.float64)
        if len(d):
            np.add.at(w, d, c * lr[b])
        ids = batch[id_col].to_pylist()
        u = np.empty(n, dtype=np.float64)
        for i, doc_id in enumerate(ids):
            hv = hashlib.blake2b(
                f"{seed}|{doc_id}".encode("utf-8"), digest_size=8
            ).digest()
            # uniform in (0, 1): 53 mantissa bits, never exactly 0
            u[i] = (int.from_bytes(hv, "big") >> 11) / float(1 << 53) or 2.0**-54
        gumbel = -np.log(-np.log(u))
        return pa.table({
            id_col: batch[id_col],
            "weight": pa.array(w, pa.float64()),
            "gumbel_key": pa.array(w + gumbel, pa.float64()),
        })

    return fn


def dsir_select(
    raw_ds,
    target_ds,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 0,
):
    """Top-k DSIR selection: returns Dataset[(id, weight, gumbel_key)] of
    the k raw docs with the largest ``weight + Gumbel`` (ties broken by
    id for determinism).  ``raw_ds`` is scanned twice (once for q, once
    for scoring) — both passes are map-only."""
    import ray

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    p_vec = bucket_distribution(target_ds, text_col, n_buckets)
    q_vec = bucket_distribution(raw_ds, text_col, n_buckets)
    lr_ref = ray.put(log_ratio_vector(p_vec, q_vec, alpha))

    scored = raw_ds.map_batches(
        make_importance_score_batch(text_col, id_col, lr_ref, n_buckets, seed),
        batch_format="pyarrow",
    )

    # distributed local top-k: each batch keeps its k best, the
    # k-bounded survivors sort once
    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        keys = batch["gumbel_key"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -keys))[:k]
        return batch.take(pa.array(np.sort(order), pa.int64()))

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["gumbel_key", id_col], descending=[True, False])
        .limit(k)
    )
