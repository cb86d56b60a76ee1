"""Substring-level duplicated n-gram detection and scrubbing.

The token-window sibling of :func:`..stages.lines.paragraph_dedup` —
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") deduplicate at the level of repeated TOKEN SPANS, not whole
paragraphs: a k-token window whose exact text occurs in two or more
distinct documents is training-harmful boilerplate (license headers,
navigation chrome, templated sentences) even when the surrounding
documents differ.  Two operators:

* :func:`dup_ngram_stats` — per-document counts ``(doc_id, n_kgrams,
  n_dup_kgrams)`` where a k-gram is "duplicated" iff its exact string
  occurs in >= 2 distinct documents corpus-wide.  The flag/score form
  (C4 kept a score; FineWeb filters on it).
* :func:`scrub_dup_ngrams` — the removal form: every token covered by
  any duplicated k-gram occurrence is cut from its document (all
  occurrences are scrubbed — the span is boilerplate, no occurrence is
  canonical), survivors re-joined with single spaces.

Tokenization is ``text.split(' ')`` — byte-exact with SQL
``string_split(text, ' ')`` (consecutive spaces yield empty tokens in
both), so a DuckDB oracle can re-derive every count independently.

Vectorized kernel (no Python loop over tokens or grams):

1. documents are split ONCE with the Arrow ``split_pattern`` kernel;
2. only DISTINCT tokens are hashed (``np.unique`` + blake2b-16, the
   loop runs over the vocabulary of the batch, not its length), giving
   two independent 64-bit lanes per token;
3. k-gram keys are two independent degree-k polynomial compressions of
   the windowed token-hash lanes (``sliding_window_view`` + odd-
   multiplier powers, uint64 wraparound) — a 128-bit key whose random
   collision odds are ~n^2/2^128 corpus-wide (the lanes are
   cryptographic, the polynomials independent), vs the engineered-
   collision-free but per-gram-loop blake2b alternative.

Scale shape (mirrors ``paragraph_dedup``):

* stats: map-only explode ships THIN rows ``(h1, h2, doc_id, cnt)``
  pre-summed per (gram, doc) inside each batch; ONE hash-partitioned
  exchange on h1 co-locates every occurrence of a gram; each partition
  resolves duplicated-ness with a single lexsort + ``reduceat`` sweep
  and emits per-doc partials; a doc-keyed groupby of those tiny rows
  finishes.  Corpus bytes never shuffle.
* scrub: the resolve stage instead emits the distinct DUPLICATED keys
  (bounded by distinct duplicated grams, a small fraction of a crawl),
  gathered sorted into one ``ray.put`` broadcast; a second map-only
  pass re-derives each batch's gram keys, probes membership with
  vectorized ``searchsorted`` run-range tests, marks covered tokens by
  prefix-sum window arithmetic, and re-joins survivors with
  ``binary_join``.  Broadcast ceiling: 16 B/distinct-dup-gram (a 10^9-
  gram dup set is a 16 GB broadcast); beyond that, swap the probe for
  a tagged-union co-partition of dup keys with gram rows on h1 — the
  ``paragraph_dedup`` "shuffle" strategy shape.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

from .lines import _nonnull_nonempty, _mask_join, _split_docs
from .partition import with_hash_partition_int

__all__ = ["dup_ngram_stats", "scrub_dup_ngrams"]

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _powers(p: np.uint64, k: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint64)
    out[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the modulus
        for i in range(1, k):
            out[i] = out[i - 1] * p
    return out


def _token_lanes(values: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """blake2b-16 per DISTINCT token, broadcast back: two uint64 lanes."""
    toks = values.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(toks, return_inverse=True)
    if not len(uniq):
        z = np.array([], dtype=np.uint64)
        return z, z
    buf = np.frombuffer(
        b"".join(blake2b(t.encode("utf-8"), digest_size=16).digest() for t in uniq),
        dtype=np.uint64,
    ).reshape(-1, 2)
    return buf[:, 0][inv], buf[:, 1][inv]


def _gram_keys(
    lane1: np.ndarray, lane2: np.ndarray, counts: np.ndarray, k: int
):
    """Per-doc sliding k-gram keys over the FLATTENED token lanes.

    Returns ``(g1, g2, doc_idx, m)``: two uint64 key arrays for every
    valid (non-doc-crossing) window, the batch-local doc index of each
    window, and the per-doc window counts ``m = max(0, counts-k+1)``.
    """
    n = len(lane1)
    m = np.clip(counts - k + 1, 0, None).astype(np.int64)
    total = int(m.sum())
    if total == 0 or n < k:
        z = np.array([], dtype=np.uint64)
        return z, z, np.array([], dtype=np.int64), m
    offsets = np.concatenate([[0], np.cumsum(counts)])
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), m)
    local = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    starts = offsets[:-1][doc_idx] + local
    sw1 = np.lib.stride_tricks.sliding_window_view(lane1, k)[starts]
    sw2 = np.lib.stride_tricks.sliding_window_view(lane2, k)[starts]
    g1 = (sw1 * _powers(_P1, k)).sum(axis=1, dtype=np.uint64)
    g2 = (sw2 * _powers(_P2, k)).sum(axis=1, dtype=np.uint64)
    return g1, g2, doc_idx, m


def _explode_batch(batch: pa.Table, text_col: str, id_col: str, k: int) -> pa.Table:
    """Thin (h1, h2, doc_id, cnt) rows, pre-summed per (gram, doc)."""
    empty = pa.table({
        "h1": pa.array([], pa.int64()),
        "h2": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    })
    batch = _nonnull_nonempty(batch, text_col)
    if batch.num_rows == 0:
        return empty
    _, values, _, counts = _split_docs(batch[text_col], " ")
    l1, l2 = _token_lanes(values)
    g1, g2, doc_idx, _ = _gram_keys(l1, l2, counts, k)
    if not len(g1):
        return empty
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[doc_idx]
    order = np.lexsort((ids, g2, g1))
    g1s, g2s, ds_ = g1[order], g2[order], ids[order]
    new = np.empty(len(g1s), dtype=bool)
    new[0] = True
    new[1:] = (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1]) | (ds_[1:] != ds_[:-1])
    idx = np.flatnonzero(new)
    cnt = np.diff(np.concatenate([idx, [len(g1s)]]))
    return pa.table({
        "h1": pa.array(g1s[idx].view(np.int64), pa.int64()),
        "h2": pa.array(g2s[idx].view(np.int64), pa.int64()),
        "doc_id": pa.array(ds_[idx], pa.int64()),
        "cnt": pa.array(cnt, pa.int64()),
    })


def _zero_batch(batch: pa.Table, text_col: str, id_col: str, k: int) -> pa.Table:
    """(doc_id, 0, 0) rows for docs that produce NO k-gram (null/empty
    text or fewer than k tokens) so they still appear in the stats."""
    import pyarrow.compute as pc

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch[text_col]
    nonnull = np.asarray(pc.is_valid(texts))
    n_tok = np.zeros(batch.num_rows, dtype=np.int64)
    if nonnull.any():
        sub = batch.filter(pa.array(nonnull))
        _, _, _, counts = _split_docs(sub[text_col], " ")
        n_tok[nonnull] = counts
    short = ~nonnull | (n_tok < k)
    return pa.table({
        "doc_id": pa.array(ids[short], pa.int64()),
        "n_kgrams": pa.array(np.zeros(short.sum(), np.int64), pa.int64()),
        "n_dup_kgrams": pa.array(np.zeros(short.sum(), np.int64), pa.int64()),
    })


def _resolve_sorted(t: pa.Table):
    """Lexsort one partition's (h1,h2,doc,cnt) rows; return the sorted
    arrays plus (gram group ids, per-(gram,doc) boundary index array)."""
    h1 = t["h1"].to_numpy(zero_copy_only=False)
    h2 = t["h2"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    c = t["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, h2, h1))
    h1, h2, d, c = h1[order], h2[order], d[order], c[order]
    new_g = np.empty(len(h1), dtype=bool)
    new_g[0] = True
    new_g[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    gid = np.cumsum(new_g) - 1
    new_gd = new_g.copy()
    new_gd[1:] |= d[1:] != d[:-1]
    sub = np.flatnonzero(new_gd)
    return h1, h2, d, c, gid, sub


def dup_ngram_stats(
    ds, text_col: str, id_col: str, k: int = 5, num_partitions: int = 32
):
    """Per-document duplicated-k-gram counts.

    Returns a Dataset ``(doc_id, n_kgrams, n_dup_kgrams)`` covering EVERY
    input document (zero rows for docs shorter than k tokens).  A k-gram
    occurrence counts as duplicated iff its exact k-token string occurs
    in >= 2 distinct documents anywhere in the corpus.

    SQL semantics (the DuckDB oracle re-derives it literally):
    ``COUNT(*) FILTER (WHERE g IN (SELECT g FROM grams GROUP BY g
    HAVING COUNT(DISTINCT doc_id) >= 2))`` per doc over 1-based list
    slices of ``string_split(text, ' ')``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    thin = ds.map_batches(
        lambda b: _explode_batch(b, text_col, id_col, k), batch_format="pyarrow"
    )
    parts = with_hash_partition_int(thin, "h1", num_partitions)

    def resolve(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_kgrams": pa.array([], pa.int64()),
            "n_dup_kgrams": pa.array([], pa.int64()),
        })
        if not t.num_rows:
            return empty
        _h1, _h2, d, c, gid, sub = _resolve_sorted(t)
        # per-(gram, doc) occurrence totals + their gram's distinct-doc count
        sub_cnt = np.add.reduceat(c, sub)
        sub_doc = d[sub]
        sub_gid = gid[sub]
        docs_per_gram = np.bincount(sub_gid)
        dup = docs_per_gram[sub_gid] >= 2
        # partial per-doc sums within this partition (docs are sorted
        # within grams, not globally; one more lexsort on doc finishes)
        order = np.argsort(sub_doc, kind="stable")
        sd, sc = sub_doc[order], sub_cnt[order]
        sdup = np.where(dup, sub_cnt, 0)[order]
        first = np.concatenate([[True], sd[1:] != sd[:-1]])
        idx = np.flatnonzero(first)
        return pa.table({
            "doc_id": pa.array(sd[idx], pa.int64()),
            "n_kgrams": pa.array(np.add.reduceat(sc, idx), pa.int64()),
            "n_dup_kgrams": pa.array(np.add.reduceat(sdup, idx), pa.int64()),
        })

    partials = parts.groupby("_part").map_groups(resolve, batch_format="pyarrow")
    zeros = ds.map_batches(
        lambda b: _zero_batch(b, text_col, id_col, k), batch_format="pyarrow"
    )
    merged = partials.union(zeros).groupby("doc_id").sum(
        ["n_kgrams", "n_dup_kgrams"]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_kgrams": batch["sum(n_kgrams)"].cast(pa.int64()),
            "n_dup_kgrams": batch["sum(n_dup_kgrams)"].cast(pa.int64()),
        })

    return merged.map_batches(rename, batch_format="pyarrow")


def _member128(
    g1: np.ndarray, g2: np.ndarray, a1: np.ndarray, a2: np.ndarray
) -> np.ndarray:
    """Vectorized membership of (g1,g2) pairs in the lexsorted (a1,a2)
    key arrays: run-range ``searchsorted`` on a1, direct compare where
    the run is a singleton (the overwhelmingly common case), per-row
    inner ``searchsorted`` on the rare multi-key runs."""
    out = np.zeros(len(g1), dtype=bool)
    if not len(a1) or not len(g1):
        return out
    lo = np.searchsorted(a1, g1, side="left")
    hi = np.searchsorted(a1, g1, side="right")
    single = (hi - lo) == 1
    si = lo[single]
    out[single] = a2[si] == g2[single]
    for t in np.flatnonzero((hi - lo) > 1):
        j = np.searchsorted(a2[lo[t] : hi[t]], g2[t])
        out[t] = j < (hi[t] - lo[t]) and a2[lo[t] + j] == g2[t]
    return out


def scrub_dup_ngrams(
    ds, text_col: str, id_col: str, k: int = 5, num_partitions: int = 32
):
    """Cut every token covered by a corpus-duplicated k-gram occurrence.

    Returns a Dataset ``(doc_id, text, n_tokens, n_removed)`` with one
    row per input document: ``text`` is the surviving tokens re-joined
    with single spaces (possibly ``""``), ``n_tokens`` the original
    ``len(string_split(text, ' '))`` (0 for null text), ``n_removed``
    the count of cut token positions.  ALL occurrences of a duplicated
    span are scrubbed (boilerplate has no canonical owner) — the
    C4/Lee-style removal contract a DuckDB oracle can replay exactly.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    import ray

    thin = ds.map_batches(
        lambda b: _explode_batch(b, text_col, id_col, k), batch_format="pyarrow"
    )
    parts = with_hash_partition_int(thin, "h1", num_partitions)

    def dup_keys(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
            })
        h1, h2, _d, _c, gid, sub = _resolve_sorted(t)
        docs_per_gram = np.bincount(gid[sub])
        first = np.flatnonzero(
            np.concatenate([[True], gid[sub][1:] != gid[sub][:-1]])
        )
        dup_first = sub[first][docs_per_gram >= 2]
        return pa.table({
            "h1": pa.array(h1[dup_first], pa.int64()),
            "h2": pa.array(h2[dup_first], pa.int64()),
        })

    dup_ds = parts.groupby("_part").map_groups(dup_keys, batch_format="pyarrow")

    def _gather(refs):
        ts = [
            t for t in ray.get(refs) if t.num_rows and "h1" in t.schema.names
        ]
        if ts:
            a1 = np.concatenate(
                [t["h1"].to_numpy(zero_copy_only=False) for t in ts]
            ).view(np.uint64)
            a2 = np.concatenate(
                [t["h2"].to_numpy(zero_copy_only=False) for t in ts]
            ).view(np.uint64)
        else:
            a1 = a2 = np.array([], dtype=np.uint64)
        order = np.lexsort((a2, a1))
        return a1[order], a2[order]

    dup_ref = ray.remote(num_cpus=1)(_gather).remote(
        list(dup_ds.materialize().to_arrow_refs())
    )

    def scrub(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a1, a2 = ray.get(dup_ref)  # zero-copy plasma read
        ids = batch[id_col].cast(pa.int64())
        texts = batch[text_col]
        nonnull = np.asarray(pc.is_valid(texts))
        n = batch.num_rows
        out_text = np.full(n, "", dtype=object)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_removed = np.zeros(n, dtype=np.int64)
        if nonnull.any():
            sub = batch.filter(pa.array(nonnull))
            _, values, offsets, counts = _split_docs(sub[text_col], " ")
            l1, l2 = _token_lanes(values)
            g1, g2, _doc_idx, m = _gram_keys(l1, l2, counts, k)
            dup_start = _member128(g1, g2, a1, a2)
            # token p (local index q, doc j) is covered iff any duplicated
            # window starts at local index in [max(0, q-k+1), min(q, m_j-1)]
            cs = np.concatenate([[0], np.cumsum(dup_start, dtype=np.int64)])
            gram_off = np.concatenate([[0], np.cumsum(m)])
            total_tok = int(counts.sum())
            tok_doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            q = np.arange(total_tok, dtype=np.int64) - np.repeat(
                offsets[:-1], counts
            )
            m_tok = m[tok_doc]
            base = gram_off[:-1][tok_doc]
            has_grams = m_tok > 0
            lo_g = np.where(has_grams, base + np.clip(q - k + 1, 0, None), 0)
            hi_g = np.where(
                has_grams, base + np.clip(np.minimum(q, m_tok - 1), 0, None), 0
            )
            covered = has_grams & (cs[hi_g + 1] - cs[lo_g] > 0)
            joined, kept_counts = _mask_join(values, offsets, ~covered, " ")
            out_text[nonnull] = joined.to_numpy(zero_copy_only=False)
            n_tokens[nonnull] = counts
            n_removed[nonnull] = counts - kept_counts
        return pa.table({
            "doc_id": ids,
            "text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")
