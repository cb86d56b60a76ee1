"""Hashed-free exact bigram language-model perplexity scoring.

The CCNet / RefinedWeb quality gate (Wenzek et al. 2020 §4.2 train a
KenLM on a reference corpus and keep the low-perplexity tail): train a
word-bigram LM with add-alpha smoothing over the corpus, then score
every document's per-token log-probability with it.  Two phases:

* **train** — unigram and adjacent-pair counts via the existing
  ``analysis.word_frequencies`` / ``bigram_frequencies`` kernels
  (per-batch partials, ONE vocabulary-sized groupby each — shuffle
  volume scales with the vocabulary, not the corpus).  The folded count
  tables are collected on the driver (vocabulary-sized, the same
  small-result materialization as the DSIR log-ratio table) and
  broadcast ONCE with ``ray.put``.
* **score** — a stateful actor pool: ``__init__`` fetches the broadcast
  model and materializes the Arrow lookup arrays once per actor;
  ``__call__`` is map-only per batch — one ``split_pattern_regex``, one
  ``index_in`` per count table, one vectorized ``np.log`` over all
  bigrams in the batch, per-doc segment sums by cumsum over offsets.
  No Python loop over tokens anywhere.

Cross-engine exactness (the ``bm25_topk`` discipline): the per-bigram
log-probability ``ln((cb + 0.5) / (cu + 0.5 * V))`` has exact-integer
inputs and ONE fixed parenthesization mirrored literally in the DuckDB
oracle, so each double is bit-identical; it is then quantized to fixed
point (``floor(lp * 2^20 + 0.5)`` -> int64) so the per-document SUM is
an exact integer — order-free, parallelism-invariant, engine-invariant.
``exp`` is NOT applied engine-side (numpy and DuckDB ``exp`` differ by
1 ulp on this box): the emitted contract is the raw ints
``(n_bigrams, lp_q20)`` and consumers derive
``ppl = exp(-(lp_q20 / 2^20) / n_bigrams)`` — the
``compression_ratio`` raw-ints pattern.

100-TB shape: the broadcast ceiling is O(|unigram| + |bigram pair|)
entries.  Web-scale English word vocabularies run ~10^7-10^8 pairs
after the usual count>=2 prune — a few GB, still broadcastable per
node.  Past that, the documented swap is (a) frequency-prune the tail
(KenLM's own default) or (b) score via two thin hash joins on
``(w1, w2)`` / ``w1`` instead of the broadcast — both exchanges carry
~16-byte rows, never the corpus payload.  Training on the full corpus
(self-perplexity) means every scored pair exists in the model; a
held-out reference corpus (the actual CCNet setup) plugs in by passing
``ref_ds``.

Tokenization matches ``analysis.word_frequencies`` byte-for-byte:
whitespace-trim then ``\\s+`` split, empty docs excluded; docs with
fewer than 2 tokens have no bigrams and are excluded from the output
(the SQL oracle's inner-join + GROUP BY drops them identically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["train_bigram_lm", "bigram_lm_perplexity", "ccnet_ppl_buckets"]


def _collect_counts(freq_ds, key_col: str):
    """Materialize a (key, n) frequency Dataset into contiguous Arrow/
    numpy arrays.  Vocabulary-sized by construction (the groupby already
    folded the corpus), so this is a small-result take."""
    batches = list(freq_ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    tbl = pa.concat_tables(batches).combine_chunks()
    keys = tbl[key_col]
    keys = keys.chunk(0) if keys.num_chunks else pa.array([], pa.string())
    counts = tbl["n"].to_numpy().astype(np.int64) if len(tbl) else np.zeros(0, np.int64)
    return keys, counts


def train_bigram_lm(ds, text_col: str):
    """Count-fold phase: returns ``(model_ref, vocab_size)`` where
    ``model_ref`` is a ``ray.put`` handle on the unigram/pair count
    arrays.  ``vocab_size`` is the distinct-unigram count V used by the
    add-alpha denominator."""
    from . import analysis

    uni_keys, uni_counts = _collect_counts(
        analysis.word_frequencies(ds, text_col), "token")
    pair_keys, pair_counts = _collect_counts(
        analysis.bigram_frequencies(ds, text_col), "pair")
    model_ref = ray.put({
        "uni_keys": uni_keys,
        "uni_counts": uni_counts,
        "pair_keys": pair_keys,
        "pair_counts": pair_counts,
    })
    return model_ref, int(len(uni_keys))


#: fixed-point quantum for log-prob accumulation (2^20; exact in double)
LP_QUANTUM = 1048576.0


class BigramLmScorer:
    """Actor-pool scorer: model fetched + lookup arrays pinned once per
    actor in ``__init__``; ``__call__`` is pure vectorized batch work."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 vocab_size: int, alpha: float = 0.5,
                 carry_cols: tuple = ()):
        model = ray.get(model_ref)
        # lookup representation is picked ONCE per actor by vocabulary
        # size: small vocabularies keep the Arrow hash probe (its
        # per-batch value_set rebuild is O(V) — negligible when V is
        # thousands, and the probe itself is the fastest option); large
        # vocabularies (the documented 10^7-10^8 pair regime) sort into
        # numpy 'U' arrays once (C-speed string compares) so each batch
        # probes with searchsorted in O(tokens * log V) instead of
        # re-hashing the whole vocabulary every call
        self._uni = self._vocab_rep(model["uni_keys"], model["uni_counts"])
        self._pair = self._vocab_rep(model["pair_keys"], model["pair_counts"])
        self._text_col = text_col
        self._id_col = id_col
        self._V = float(vocab_size)
        self._alpha = float(alpha)
        self._carry = tuple(carry_cols)

    #: vocabulary size above which the per-batch index_in hash rebuild
    #: (O(V) per call) loses to the sorted searchsorted probe
    SORTED_PROBE_MIN_VOCAB = 1_000_000

    @classmethod
    def _vocab_rep(cls, keys: pa.Array, counts: np.ndarray):
        counts = np.asarray(counts, np.int64)
        if len(keys) < cls.SORTED_PROBE_MIN_VOCAB:
            # pad position 0 = "unseen" (count 0) so index_in misses
            # (-1) resolve through fill_null -> 0 without a branch
            return ("hash", keys, np.concatenate([np.zeros(1, np.int64),
                                                  counts]))
        k = keys.to_numpy(zero_copy_only=False).astype(str)
        order = np.argsort(k, kind="stable")
        return ("sorted", k[order], counts[order])

    @staticmethod
    def _lookup(values: pa.Array, rep) -> np.ndarray:
        kind, keys, counts = rep
        if kind == "hash":
            idx = pc.index_in(values, value_set=keys)
            idx = pc.add(pc.fill_null(idx, -1), 1)
            return counts[np.asarray(idx, dtype=np.int64)]
        v = values.to_numpy(zero_copy_only=False).astype(str)
        if not len(keys):
            return np.zeros(len(v), np.int64)
        pos = np.searchsorted(keys, v)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = (pos < len(keys)) & (keys[pos_c] == v)
        return np.where(hit, counts[pos_c], 0)

    def _out(self, ids, n_big, sums, carried) -> pa.Table:
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for name, arr in carried:
            cols[name] = arr
        cols["n_bigrams"] = pa.array(n_big, pa.int64())
        cols["lp_q20"] = pa.array(sums, pa.int64())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = self._out(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            [(c, batch[c].slice(0, 0).combine_chunks()) for c in self._carry],
        )
        trimmed = pc.utf8_trim_whitespace(batch[self._text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = np.asarray(batch[self._id_col].filter(keep), dtype=np.int64)
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        if not len(lists):
            return empty
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        values = lists.flatten()
        n_tok = np.diff(offsets)
        if len(values) < 2:
            return empty
        valid = np.ones(len(values), dtype=bool)
        valid[offsets[1:] - 1] = False  # last token of each doc
        idx = np.flatnonzero(valid)
        if not len(idx):
            return empty
        left = values.take(pa.array(idx))
        right = values.take(pa.array(idx + 1))
        pairs = pc.binary_join_element_wise(left, right, " ")
        cu = self._lookup(left, self._uni)
        cb = self._lookup(pairs, self._pair)
        # ONE fixed parenthesization, mirrored in the DuckDB oracle:
        #   ln((cb + 0.5e0) / (cu + 0.5e0 * v))
        lp = np.log((cb + self._alpha) / (cu + self._alpha * self._V))
        q = np.floor(lp * LP_QUANTUM + 0.5).astype(np.int64)
        cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(q)])
        # bigram segment bounds per doc: doc j owns bigrams starting at
        # token positions [offsets[j], offsets[j+1]-1) -> in the
        # compacted q array those are a contiguous run of (n_tok[j]-1)
        n_big = np.maximum(n_tok - 1, 0)
        ends = np.cumsum(n_big)
        starts = ends - n_big
        sums = cs[ends] - cs[starts]
        has = n_big > 0
        has_mask = pa.array(has)
        carried = [
            (c, batch[c].filter(keep).combine_chunks().filter(has_mask))
            for c in self._carry
        ]
        return self._out(ids[has], n_big[has], sums[has], carried)


def bigram_lm_perplexity(ds, text_col: str, id_col: str,
                         ref_ds=None, alpha: float = 0.5,
                         concurrency=4, carry_cols: tuple = ()):
    """``Dataset -> Dataset`` of ``(doc_id, n_bigrams, lp_q20)`` exact
    ints; ``ppl = exp(-(lp_q20 / 2^20) / n_bigrams)`` downstream.

    ``ref_ds`` is the training corpus (CCNet trains on Wikipedia);
    default = score the input against itself (self-perplexity).
    ``concurrency``: an int is coerced to an autoscaling ``(1, n)``
    pool so the stage never deadlocks a cluster smaller than the pool
    floor (the ``score_quality`` lesson)."""
    model_ref, vocab = train_bigram_lm(
        ds if ref_ds is None else ref_ds, text_col)
    if type(concurrency) is int:
        concurrency = (1, max(1, concurrency))
    return ds.map_batches(
        BigramLmScorer,
        fn_constructor_args=(
            model_ref, text_col, id_col, vocab, alpha, tuple(carry_cols)),
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def ccnet_ppl_buckets(ds, text_col: str, id_col: str, group_col: str,
                      ref_ds=None, alpha: float = 0.5, concurrency=4):
    """The CCNet selection step (Wenzek et al. 2020 §4.3): bucket every
    document into ``head`` / ``middle`` / ``tail`` by per-language LM
    perplexity tertiles.

    Composition of two existing exact kernels: :func:`bigram_lm_perplexity`
    scores each doc (exact ints), then ``quantiles.grouped_exact_quantiles``
    finds the per-group tertile thresholds of the mean log-prob
    ``mlp = lp_q20 / n_bigrams`` (ONE double division of exact ints —
    bit-identical across engines; perplexity is ``exp(-mlp/2^20)``, a
    MONOTONE DECREASING map, so tertiles of mlp ARE reverse tertiles of
    ppl and no engine-side ``exp`` is needed).  Bucket rule on exact
    doubles: ``mlp <= t(1/3) -> 'tail'`` (highest perplexity),
    ``mlp <= t(2/3) -> 'middle'``, else ``'head'``.

    Scale shape: the scored table is THIN (id + group + 2 ints) and is
    materialized ONCE because the grouped-quantile refinement is
    multi-pass — re-scoring the corpus per pass would re-read the
    payload ~4x; at 10^12 docs the pinned table is ~40 B/doc and spills,
    or checkpoint it to Parquet between the two phases.  Thresholds are
    G x 2 driver-side scalars broadcast in the task closure; the bucket
    pass is map-only."""
    from .quantiles import grouped_exact_quantiles

    scored = bigram_lm_perplexity(
        ds, text_col, id_col, ref_ds=ref_ds, alpha=alpha,
        concurrency=concurrency, carry_cols=(group_col,),
    )

    def add_mlp(b: pa.Table) -> pa.Table:
        mlp = (np.asarray(b["lp_q20"], dtype=np.float64)
               / np.asarray(b["n_bigrams"], dtype=np.float64))
        return b.append_column("mlp", pa.array(mlp, pa.float64()))

    scored = scored.map_batches(add_mlp, batch_format="pyarrow").materialize()
    th = grouped_exact_quantiles(
        scored, "mlp", group_col, [1.0 / 3.0, 2.0 / 3.0])
    lo: dict = {}
    hi: dict = {}
    for g, p, v in zip(th[group_col].to_pylist(), th["p"].to_pylist(),
                       th["value"].to_pylist()):
        (lo if p < 0.5 else hi)[g] = float(v)

    th_groups = sorted(set(lo) & set(hi))
    th_keys = pa.array(th_groups, pa.string())
    t1_arr = np.array([lo[g] for g in th_groups], dtype=np.float64)
    t2_arr = np.array([hi[g] for g in th_groups], dtype=np.float64)

    def bucketize(b: pa.Table) -> pa.Table:
        # vectorized threshold lookup; inner-join semantics (a null or
        # unknown group drops the row, matching the oracle's JOIN)
        gi = pc.index_in(b[group_col], value_set=th_keys)
        valid = pc.is_valid(gi)
        b = b.filter(valid)
        gidx = np.asarray(gi.filter(valid), dtype=np.int64)
        mlp = np.asarray(b["mlp"], dtype=np.float64)
        t1 = t1_arr[gidx]
        t2 = t2_arr[gidx]
        bucket = np.where(mlp <= t1, "tail",
                          np.where(mlp <= t2, "middle", "head"))
        return pa.table({
            "doc_id": b["doc_id"],
            group_col: b[group_col],
            "n_bigrams": b["n_bigrams"],
            "lp_q20": b["lp_q20"],
            "bucket": pa.array(bucket.tolist(), pa.string()),
        })

    return scored.map_batches(bucketize, batch_format="pyarrow")
