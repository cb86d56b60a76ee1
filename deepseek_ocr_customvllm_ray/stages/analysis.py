"""Text-analysis stages: token counting, quality scoring, language ID,
fingerprinting — vectorized ``map_batches`` wrappers over
``functions/textstats.py`` kernels."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textstats as ts


def whitespace_token_counts(texts) -> pa.Array:
    """Whitespace token counts of a string array, fully vectorized via
    Arrow kernels (split_pattern + list_value_length — no Python loop).
    THE pinned token-semantics contract shared with the SQL oracles; the
    packing stage builds on it too.

    Trim first: a regex split counts empty boundary fields, so untrimmed
    (' a b ' -> 4) and whitespace-only ('  ' -> 2) texts would overcount
    vs str.split() / the trimmed oracle SQL.  Null in -> null out."""
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.list_value_length(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
    return pc.if_else(
        pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), toks
    ).cast(pa.int64())


def make_token_count_batch(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch[id_col],
            "n_tokens": whitespace_token_counts(batch[text_col]),
        })

    return fn


def make_quality_batch(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        rows = {
            "doc_id": batch[id_col].to_pylist(),
            "n_chars": [], "n_tokens": [], "mean_token_len": [],
            "punct_ratio": [], "stopword_ratio": [], "digit_ratio": [],
        }
        for t in batch[text_col].to_pylist():
            f = ts.quality_features(t or "")
            for k in ("n_chars", "n_tokens", "mean_token_len", "punct_ratio",
                      "stopword_ratio", "digit_ratio"):
                rows[k].append(f[k])
        return pa.table({
            "doc_id": pa.array(rows["doc_id"]),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
            "mean_token_len": pa.array(rows["mean_token_len"], pa.float64()),
            "punct_ratio": pa.array(rows["punct_ratio"], pa.float64()),
            "stopword_ratio": pa.array(rows["stopword_ratio"], pa.float64()),
            "digit_ratio": pa.array(rows["digit_ratio"], pa.float64()),
        })

    return fn


def make_langid_batch(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        preds = [ts.detect_language(t or "") for t in batch[text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[id_col],
            "pred_lang": pa.array(preds, pa.string()),
        })

    return fn


def make_fingerprint_batch(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        fps = [ts.doc_fingerprint(t or "") for t in batch[text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[id_col],
            "fingerprint": pa.array(fps, pa.int64()),
        })

    return fn


def make_token_diversity_batch(text_col: str, id_col: str):
    """Per-doc repetition signal (Gopher-style quality rule): total and
    DISTINCT whitespace-token counts; a low distinct/total ratio marks
    boilerplate/spam.  Empty and null texts are dropped (the SQL oracle's
    unnest+GROUP BY produces no row for them).  The per-row set() is
    inherent — Arrow has no list-distinct kernel — and bounded by document
    token count, like the other per-row string kernels in this module."""

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep)
        toks = pc.split_pattern_regex(
            trimmed.filter(keep), pattern=r"\s+"
        ).to_pylist()
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
            "n_distinct_tokens": pa.array(
                [len(set(t)) for t in toks], pa.int64()
            ),
        })

    return fn


def make_word_count_partial(text_col: str):
    """Per-batch partial word counts: split + flatten + ``value_counts``
    inside the map task, so the downstream ``groupby(token)`` shuffles one
    row per DISTINCT token per batch instead of one per occurrence — the
    combiner pattern that keeps a corpus-wide term count feasible at
    10^12 tokens (shuffle volume scales with vocabulary, not corpus)."""

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        nonempty = trimmed.filter(pc.greater(pc.utf8_length(trimmed), 0))
        toks = pc.list_flatten(
            pc.split_pattern_regex(nonempty, pattern=r"\s+")
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "cnt_p": vc.field("counts").cast(pa.int64()),
        })

    return fn


def word_frequencies(ds, text_col: str, top_k: int | None = None):
    """``Dataset -> Dataset`` of (token, n) corpus term frequencies.

    Partial counts per batch, one small groupby over the vocabulary, then
    an optional deterministic top-k (count desc, token asc)."""
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(make_word_count_partial(text_col), batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt_p", alias_name="n"))
    )
    if top_k is not None:
        out = out.sort(["n", "token"], descending=[True, False]).limit(top_k)
    return out


def make_bpe_token_count_batch(text_col: str, id_col: str):
    """Approximate BPE token counts via the GPT-2 pre-tokenizer regex
    (compiled once at module import; not SQL-expressible — the pattern uses
    a lookahead RE2/DuckDB lacks — so its oracle is a golden snapshot)."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = [ts.bpe_token_count(t or "") for t in batch[text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[id_col],
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        })

    return fn
