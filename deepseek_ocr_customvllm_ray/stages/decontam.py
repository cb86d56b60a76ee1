"""Benchmark decontamination — flag / drop documents that contain text from
an evaluation set, so the training corpus doesn't memorize the benchmark.

The benchmark side is SMALL and the corpus side is 100 TB, so both paths
here are broadcast semi-joins — no shuffle, no per-row Python in the scan:

- **phrase path** (``flag_contaminated`` / ``decontaminate``): the phrase
  list rides each task's closure (fine for the tens-to-hundreds of
  phrases it targets); one vectorized Arrow ``match_substring`` kernel
  pass per phrase, so cost is O(K · corpus-bytes);
- **index path** (``build_shingle_index`` / ``flag_contaminated_by_index``):
  for benchmarks of millions of n-grams — the hash index ships via
  ``ray.put`` ONCE and each doc probes it with a ``searchsorted``, so
  lookup cost is independent of benchmark size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _phrase_hit_counts(txt, phrases: list[str]) -> np.ndarray:
    """Per-row count of DISTINCT phrases present.  The correctness-critical
    null rule lives HERE, once, for both the flag and filter paths: null
    text contains nothing (``fill_null(False)`` — a bare null would poison
    the count / silently drop the row from an inverted filter)."""
    if not phrases:
        raise ValueError("phrases must be non-empty")
    hits = np.zeros(len(txt), dtype=np.int64)
    for p in phrases:
        m = pc.fill_null(pc.match_substring(txt, pattern=p), False)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        hits += np.asarray(m).astype(np.int64)
    return hits


def make_contamination_batch(text_col: str, id_col: str, phrases: list[str]):
    """``map_batches`` fn: (id, contaminated bool, n_hits = how many
    distinct phrases occur).  Substring semantics, case-sensitive — the
    same contract as SQL ``contains()`` so the oracle is independent."""
    if not phrases:
        raise ValueError("phrases must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        hits = _phrase_hit_counts(batch[text_col], phrases)
        return pa.table({
            id_col: batch[id_col],
            "contaminated": pa.array(hits > 0),
            "n_hits": pa.array(hits, pa.int64()),
        })

    return fn


def flag_contaminated(ds, text_col: str, id_col: str, phrases: list[str]):
    """``Dataset -> Dataset`` of (id, contaminated, n_hits)."""
    return ds.map_batches(
        make_contamination_batch(text_col, id_col, phrases),
        batch_format="pyarrow",
    )


def decontaminate(ds, text_col: str, phrases: list[str]):
    """``Dataset -> Dataset`` keeping only benchmark-clean rows (all
    columns pass through; map-only filter)."""
    if not phrases:
        raise ValueError("phrases must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        hits = _phrase_hit_counts(batch[text_col], phrases)
        return batch.filter(pa.array(hits == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


# --- shingle-hash index variant (the large-K scale path) ------------------


def build_shingle_index(texts, k: int = 3) -> np.ndarray:
    """Sorted uint64 blake2b hashes of every word k-gram in the benchmark
    corpus (`functions/hashing.shingle_hashes` semantics: lowercased,
    whitespace-tokenized, <k-token texts contribute one joined shingle).

    The index is the SMALL side — millions of benchmark shingles fit in a
    few MB of uint64s — so it broadcasts once while the 100-TB corpus
    streams past it.  Unlike the per-phrase substring scan, lookup cost is
    independent of benchmark size: O(shingles-per-doc · log |index|)."""
    from ..functions.hashing import shingle_hashes

    hs: set[int] = set()
    for t in texts:
        hs.update(shingle_hashes(t or "", k).tolist())
    return np.array(sorted(hs), dtype=np.uint64)


def flag_contaminated_by_index(ds, text_col: str, id_col: str,
                               index: np.ndarray, k: int = 3):
    """``Dataset -> Dataset`` of (id, contaminated, n_shingle_hits =
    DISTINCT doc shingles present in the benchmark index).

    The index ships via ``ray.put`` once and is read zero-copy from the
    local object store in every task; membership is a vectorized
    ``searchsorted`` probe per document."""
    import ray

    from ..functions.hashing import shingle_hashes

    idx_ref = ray.put(np.asarray(index, dtype=np.uint64))

    def fn(batch: pa.Table) -> pa.Table:
        idx = ray.get(idx_ref)
        n_hits = np.zeros(len(batch), dtype=np.int64)
        if len(idx):
            for i, t in enumerate(batch[text_col].to_pylist()):
                hs = shingle_hashes(t or "", k)
                if hs.size:
                    pos = np.searchsorted(idx, hs)
                    pos_c = np.minimum(pos, len(idx) - 1)
                    n_hits[i] = int((idx[pos_c] == hs).sum())
        return pa.table({
            id_col: batch[id_col],
            "contaminated": pa.array(n_hits > 0),
            "n_shingle_hits": pa.array(n_hits, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def embedding_decontam(
    corpus_ds,
    bench_vecs: "np.ndarray",
    vec_col: str,
    id_col: str,
    threshold: float = 0.35,
):
    """SEMANTIC decontamination: flag corpus rows whose embedding is
    cosine-similar (>= ``threshold``) to ANY benchmark embedding — catches
    paraphrased benchmark leakage that phrase/shingle matching misses.

    Same broadcast shape as the phrase path: the benchmark matrix ships
    via ``ray.put`` once (a 10^5-question benchmark at d=768 float64 is
    ~600 MB — within object-store broadcast range; chunk the matmul by
    benchmark rows above that), and each corpus batch computes one
    ``(n, d) @ (d, m)`` unit-vector matmul — map-only, the corpus never
    shuffles.  Returns (id, n_hits, contaminated).
    """
    import ray

    from ..functions.vectors import to_matrix

    q = np.asarray(bench_vecs, dtype=np.float64)
    q_norms = np.linalg.norm(q, axis=1, keepdims=True)
    # pin zero-norm benchmark rows to 1.0 like the corpus side below —
    # a 0/0 division would make the row NaN and silently match NOTHING
    # (its exact duplicates would pass decontamination)
    q_norms[q_norms == 0] = 1.0
    qn = q / q_norms
    q_ref = ray.put(qn)

    def fn(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = to_matrix(batch[vec_col], dim=qm.shape[1])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ qm.T
        hits = (sims >= threshold).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })

    return corpus_ds.map_batches(fn, batch_format="pyarrow")
