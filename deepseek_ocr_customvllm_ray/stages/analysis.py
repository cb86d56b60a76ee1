"""Text-analysis stages: token counting, quality scoring, language ID,
fingerprinting — vectorized ``map_batches`` wrappers over
``functions/textstats.py`` kernels."""

from __future__ import annotations

import numpy as np
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


# ---------------------------------------------------------------------------
# Python-split() parity helpers.  The quality / langid / fingerprint kernels
# are serial references in ``functions/textstats.py`` built on str.split();
# the vectorized twins below must reproduce them EXACTLY, so the RE2 split
# uses Python's str.isspace() character set (RE2's \s is ASCII-only and
# misses \x0b, \x1c-\x1f, \x85, \xa0 and the Unicode Zs/Zl/Zp spaces).

_PY_WS_CHARS = (
    # str.isspace() character set: ASCII whitespace + FS/GS/RS/US + NEL +
    # NBSP + Ogham space + Zs runs + LS/PS + NNBSP + MMSP + ideographic space
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_PY_WS_CLASS = "[" + "".join(f"\\x{{{ord(c):X}}}" for c in _PY_WS_CHARS) + "]"


def _ranges_class(predicate) -> str:
    """Explicit RE2 range class of every codepoint satisfying
    ``predicate`` — the only way to get EXACT parity with this Python's
    unicodedata tables (RE2 ships its own, often newer, Unicode version:
    `'\\U00031350'` is a letter to RE2 but unassigned to Python 3.11's
    ``re``, found by the hypothesis parity fuzz).  One full sweep per
    process (~80 ms), cached by callers."""
    cps = [c for c in range(0x110000) if predicate(chr(c))]
    ranges = []
    start = prev = cps[0]
    for c in cps[1:]:
        if c == prev + 1:
            prev = c
            continue
        ranges.append((start, prev))
        start = prev = c
    ranges.append((start, prev))
    body = "".join(
        f"\\x{{{a:X}}}" if a == b else f"\\x{{{a:X}}}-\\x{{{b:X}}}"
        for a, b in ranges
    )
    return "[" + body + "]"


_CLASS_CACHE: dict = {}


def _py_digit_class() -> str:
    """RE2 class equal to ``str.isdigit()`` (Nd plus Numeric_Type=Digit —
    ``'²'.isdigit()`` is True but ``\\p{Nd}`` misses it)."""
    if "digit" not in _CLASS_CACHE:
        _CLASS_CACHE["digit"] = _ranges_class(str.isdigit)
    return _CLASS_CACHE["digit"]


def _py_punct_class() -> str:
    """RE2 class equal to Python re's ``[^\\w\\s]``: neither a word char
    (``isalnum() or '_'`` — verified identical to ``re.compile(r'\\w')``
    over all of Unicode in tests) nor an ``isspace()`` char, per THIS
    interpreter's tables."""
    if "punct" not in _CLASS_CACHE:
        _CLASS_CACHE["punct"] = _ranges_class(
            lambda ch: not (ch.isalnum() or ch == "_" or ch.isspace())
        )
    return _CLASS_CACHE["punct"]


def _py_split_words(texts):
    """str.split() parity over a string array: returns ``(n_tokens int64
    numpy, flat_words StringArray)`` where empty/whitespace-only/null rows
    contribute 0 tokens and nothing to the flat array.

    Uses the utf8proc whitespace kernels, NOT a regex: they reproduce
    str.split()/str.strip() exactly (verified char-by-char over all of
    Unicode in tests) and run ~4x faster than ``split_pattern_regex``."""
    texts = pc.fill_null(texts, "")
    trimmed = pc.utf8_trim_whitespace(texts)
    lists = pc.utf8_split_whitespace(trimmed)
    counts = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    empty = pc.equal(pc.utf8_length(trimmed), 0).to_numpy(zero_copy_only=False)
    counts = np.where(empty, 0, counts)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # empty rows split to [''] — drop exactly those artifacts (real tokens
    # are never empty after a trim + run split)
    if empty.any():
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    return counts, flat


def _segment_sums(values: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat array segmented by ``counts`` (cumsum-based:
    safe for zero-length segments, wraps naturally for unsigned dtypes)."""
    cs = np.concatenate([np.zeros(1, values.dtype), np.cumsum(values)])
    ends = np.cumsum(counts)
    starts = ends - counts
    return cs[ends] - cs[starts]


def make_quality_batch(text_col: str, id_col: str):
    """Vectorized quality features (exact twin of
    ``textstats.quality_features`` — differential-tested): ONE regex split
    per batch, flat-array segment sums for token stats, RE2 count kernels
    for the punct/digit ratios.  No per-row Python."""

    en_stops = pa.array(sorted(ts._LANG_STOPWORDS["en"]), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        n_chars = pc.utf8_length(texts).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m, flat = _py_split_words(texts)

        word_lens = pc.utf8_length(flat).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        len_sums = _segment_sums(word_lens, m)
        stop_hits = pc.is_in(
            pc.utf8_lower(flat), value_set=en_stops
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        stop_sums = _segment_sums(stop_hits, m)

        n_punct = pc.count_substring_regex(
            texts, pattern=_py_punct_class()
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_digit = pc.count_substring_regex(
            texts, pattern=_py_digit_class()
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)

        has = m > 0
        mf = np.maximum(m, 1).astype(np.float64)
        ncf = np.maximum(n_chars, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch[id_col],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(m, pa.int64()),
            "mean_token_len": pa.array(
                np.where(has, len_sums / mf, 0.0), pa.float64()
            ),
            "punct_ratio": pa.array(
                np.where(has & (n_chars > 0), n_punct / ncf, 0.0), pa.float64()
            ),
            "stopword_ratio": pa.array(
                np.where(has, stop_sums / mf, 0.0), pa.float64()
            ),
            "digit_ratio": pa.array(
                np.where(has & (n_chars > 0), n_digit / ncf, 0.0), pa.float64()
            ),
        })

    return fn


def make_langid_batch(text_col: str, id_col: str):
    """Vectorized language ID (exact twin of ``textstats.detect_language``):
    CJK fast path = one RE2 match over the first 2000 chars; stopword vote =
    one split + 5 ``is_in`` passes over the flattened first-500-words array,
    argmax with first-language tie-break (the serial kernel's strict-``>``
    iteration order)."""
    langs = list(ts._LANG_STOPWORDS)
    stop_sets = [
        pa.array(sorted(ts._LANG_STOPWORDS[l]), pa.string()) for l in langs
    ]

    def fn(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        n = len(texts)
        head = pc.utf8_slice_codeunits(texts, start=0, stop=2000)
        is_cjk = pc.match_substring_regex(
            head, pattern=r"[\x{4E00}-\x{9FFF}]"
        ).to_numpy(zero_copy_only=False)

        trimmed = pc.utf8_trim_whitespace(texts)
        lists = pc.list_slice(pc.utf8_split_whitespace(trimmed), 0, 500)
        m = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        empty = pc.equal(pc.utf8_length(trimmed), 0).to_numpy(zero_copy_only=False)
        m = np.where(empty, 0, m)
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if empty.any():
            flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        lower = pc.utf8_lower(flat)

        scores = np.empty((len(langs), n), dtype=np.int64)
        for i, vs in enumerate(stop_sets):
            hits = pc.is_in(lower, value_set=vs).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            scores[i] = _segment_sums(hits, m)
        best = np.argmax(scores, axis=0)  # first max = serial strict-> order
        best_score = scores[best, np.arange(n)]
        lang_arr = np.asarray(langs, dtype=object)
        preds = np.where(best_score > 0, lang_arr[best], "und")
        preds = np.where(is_cjk, "zh", preds)
        return pa.table({
            "doc_id": batch[id_col],
            "pred_lang": pa.array(preds, pa.string()),
        })

    return fn


def make_fingerprint_batch(text_col: str, id_col: str):
    """Vectorized 64-bit document fingerprint (exact twin of
    ``textstats.doc_fingerprint``): the serial rolling hash
    ``h = h*B + crc32(w)`` equals ``SEED*B^m + sum(crc_i * B^(m-1-i))`` mod
    2^64, so per batch: one crc32 C-call per word (the only remaining
    Python loop — vocabulary-bounded, no Arrow crc kernel exists), then the
    polynomial fold as pure uint64 numpy (wraparound is mod-2^64)."""
    import zlib

    B = ts._FP_BASE
    SEED = ts._FP_SEED

    def fn(batch: pa.Table) -> pa.Table:
        m, flat = _py_split_words(batch[text_col])
        n = len(m)
        total = int(m.sum())
        max_m = int(m.max()) if n else 0
        pows = np.ones(max_m + 1, dtype=np.uint64)
        if max_m:
            pows[1:] = np.cumprod(np.full(max_m, B, dtype=np.uint64))
        if total:
            crc_flat = np.fromiter(
                (zlib.crc32(w.encode("utf-8")) for w in flat.to_pylist()),
                dtype=np.uint64, count=total,
            )
            ends = np.cumsum(m)
            starts = ends - m
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, m)
            exps = np.repeat(m, m) - 1 - pos
            terms = crc_flat * pows[exps]
            h = SEED * pows[m] + _segment_sums(terms, m)
        else:
            h = SEED * pows[m]  # every row empty -> SEED * B^0
        return pa.table({
            "doc_id": batch[id_col],
            "fingerprint": pa.array(
                (h >> np.uint64(1)).astype(np.int64), pa.int64()
            ),
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


def make_bigram_count_partial(text_col: str):
    """Per-batch partial word-BIGRAM counts — the first iteration of a
    BPE-style merge-pair count at word granularity (which adjacent token
    pair is most frequent corpus-wide), and the Gopher duplicate-bigram
    signal's corpus-level sibling.  Same combiner shape as
    :func:`make_word_count_partial`: the downstream ``groupby`` shuffles
    one row per DISTINCT pair per batch, so volume scales with the pair
    vocabulary, not the corpus.  Pairs never cross document boundaries;
    the join separator is a single space (tokens are ``\\s+``-split, so
    they cannot contain one — the pair string is unambiguous and DuckDB
    re-derives it from list slices)."""

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        nonempty = trimmed.filter(
            pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        )
        lists = pc.split_pattern_regex(nonempty, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        empty = pa.table({
            "pair": pa.array([], pa.string()),
            "cnt_p": pa.array([], pa.int64()),
        })
        if not len(lists):
            return empty
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        values = lists.flatten()
        n = len(values)
        if n < 2:
            return empty
        valid = np.ones(n, dtype=bool)
        valid[offsets[1:] - 1] = False  # last token of each doc
        idx = np.flatnonzero(valid)
        if not len(idx):
            return empty
        left = values.take(pa.array(idx))
        right = values.take(pa.array(idx + 1))
        pairs = pc.binary_join_element_wise(left, right, " ")
        vc = pairs.value_counts()
        return pa.table({
            "pair": vc.field("values"),
            "cnt_p": vc.field("counts").cast(pa.int64()),
        })

    return fn


def bigram_frequencies(ds, text_col: str, top_k: int | None = None):
    """``Dataset -> Dataset`` of (pair, n) corpus bigram frequencies.

    Partial counts per batch, one pair-vocabulary groupby, optional
    deterministic top-k (count desc, pair asc)."""
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(make_bigram_count_partial(text_col), batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("cnt_p", alias_name="n"))
    )
    if top_k is not None:
        out = out.sort(["n", "pair"], descending=[True, False]).limit(top_k)
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


def make_compression_stats_batch(text_col: str, id_col: str, level: int = 6):
    """zlib compression ratio as a quality signal (the CCNet/RefinedWeb
    heuristic: boilerplate and template spam compress far better than
    fluent prose, so a low ``n_zlib / n_bytes`` flags low-quality docs).

    Map-only; emits the raw INTS ``(n_bytes, n_zlib)`` so downstream
    filters derive the ratio exactly and the golden snapshot is
    engine-independent.  zlib runs its DEFLATE rounds in C — the Python
    loop is encode + length, the same budget as the digest kernels.  The
    transform is not SQL-expressible (DuckDB has no zlib) -> pinned
    golden snapshot oracle; determinism = fixed level, fixed zlib.
    Null text counts as the empty string (0 bytes in, header-only out).
    """
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        nb = np.empty(len(texts), dtype=np.int64)
        nz = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf-8")
            nb[i] = len(raw)
            nz[i] = len(zlib.compress(raw, level))
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "n_zlib": pa.array(nz, pa.int64()),
        })

    return fn


def make_repetition_stats_batch(text_col: str, id_col: str):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), map-only.

    Per document: word count, word-bigram count / distinct count (the
    duplicate-bigram fraction numerator/denominator) and the top single
    word's occurrence count (top-word dominance).  Null/whitespace-only
    docs are dropped, as in the other per-doc analysis kernels.

    Fully vectorized: ONE ``split_pattern_regex`` over the batch, words
    factorized to int codes with ``np.unique``, bigram/dominance stats by
    lexsort + run-boundary arithmetic on the flattened code array — no
    Python loop over rows or words.  Downstream filters derive fractions
    (e.g. ``1 - n_distinct_bigrams/n_bigrams > 0.2``) from the raw ints;
    emitting ints keeps the contract exact across engines.
    """

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep).cast(pa.int64())
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = len(ids)
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "n_distinct_bigrams": pa.array([], pa.int64()),
                "top_word_n": pa.array([], pa.int64()),
            })
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        counts = offsets[1:] - offsets[:-1]
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        codes = np.unique(words, return_inverse=True)[1].astype(np.int64)
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), counts)

        # --- top-word dominance: run lengths of (doc, code) after sort
        order = np.lexsort((codes, doc_ix))
        d_s, c_s = doc_ix[order], codes[order]
        new_run = np.empty(len(d_s), dtype=bool)
        new_run[0] = True
        new_run[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_start, len(d_s)))
        top = np.zeros(n, dtype=np.int64)
        np.maximum.at(top, d_s[run_start], run_len)

        # --- bigrams: adjacent pairs within a doc
        pos_in_doc = np.arange(len(doc_ix)) - np.repeat(offsets[:-1], counts)
        has_next = pos_in_doc < np.repeat(counts, counts) - 1
        b_doc = doc_ix[has_next]
        b1 = codes[has_next]
        b2 = codes[1:][has_next[:-1]] if len(codes) else codes[:0]
        n_bigrams = np.maximum(counts - 1, 0)
        if len(b_doc):
            order2 = np.lexsort((b2, b1, b_doc))
            bd, x1, x2 = b_doc[order2], b1[order2], b2[order2]
            uniq = np.empty(len(bd), dtype=bool)
            uniq[0] = True
            uniq[1:] = (bd[1:] != bd[:-1]) | (x1[1:] != x1[:-1]) | (x2[1:] != x2[:-1])
            n_distinct = np.bincount(bd[uniq], minlength=n).astype(np.int64)
        else:
            n_distinct = np.zeros(n, dtype=np.int64)

        return pa.table({
            id_col: ids,
            "n_words": pa.array(counts, pa.int64()),
            "n_bigrams": pa.array(n_bigrams, pa.int64()),
            "n_distinct_bigrams": pa.array(n_distinct, pa.int64()),
            "top_word_n": pa.array(top, pa.int64()),
        })

    return fn


def repetition_filter(
    ds,
    text_col: str,
    id_col: str,
    max_dup_bigram_frac: float = 0.2,
    max_top_word_frac: float = 0.3,
    min_words: int = 1,
):
    """Drop repetitive documents by the Gopher thresholds.

    Keeps rows whose duplicate-bigram fraction (``1 - distinct/total``,
    0 for docs with <2 words) and top-word fraction stay at or below the
    caps.  Returns ``(id, n_words)`` for the survivors; map-only — join
    back to the corpus by id, or inline the stats kernel into a wider
    pipeline where the payload should stay put.
    """

    stats = ds.map_batches(
        make_repetition_stats_batch(text_col, id_col), batch_format="pyarrow"
    )

    def keep(batch: pa.Table) -> pa.Table:
        nb = batch["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = batch["n_distinct_bigrams"].to_numpy(zero_copy_only=False)
        nw = batch["n_words"].to_numpy(zero_copy_only=False)
        top = batch["top_word_n"].to_numpy(zero_copy_only=False)
        dup_frac = np.where(nb > 0, 1.0 - nd / np.maximum(nb, 1), 0.0)
        ok = (
            (dup_frac <= max_dup_bigram_frac)
            & (top / np.maximum(nw, 1) <= max_top_word_frac)
            & (nw >= min_words)
        )
        out = batch.filter(pa.array(ok))
        return pa.table({id_col: out[id_col], "n_words": out["n_words"]})

    return stats.map_batches(keep, batch_format="pyarrow")


def make_doc_freq_partial(text_col: str):
    """Per-batch partial DOCUMENT frequencies: one row per distinct token
    with the number of batch docs containing it ((doc, token) pairs are
    deduped before counting — the df combiner, same shuffle shape as
    ``make_word_count_partial``: volume scales with vocabulary)."""

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = len(lists)
        if n == 0:
            return pa.table({
                "token": pa.array([], pa.string()),
                "df_p": pa.array([], pa.int64()),
            })
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        counts = offsets[1:] - offsets[:-1]
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        vocab, codes = np.unique(words, return_inverse=True)
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), counts)
        pair = np.unique(doc_ix * len(vocab) + codes)
        df_p = np.bincount(pair % len(vocab), minlength=len(vocab))
        return pa.table({
            "token": pa.array(vocab, pa.string()),
            "df_p": pa.array(df_p, pa.int64()),
        })

    return fn


def document_frequencies(ds, text_col: str):
    """``Dataset -> Dataset`` of (token, df): how many docs contain each
    token.  Partials per batch + one vocabulary-sized groupby."""
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(make_doc_freq_partial(text_col), batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_p", alias_name="df"))
    )


def doc_top_terms(ds, text_col: str, id_col: str, k: int = 5):
    """Top-k distinctive terms per document, ranked by ``tf/df`` (term
    frequency over document frequency — tf-idf with the idf choice
    ``1/df``; kept RATIONAL on purpose: IEEE division is exact-rounded,
    so the ranking contract is bit-identical across engines, where an
    ``ln(N/df)`` idf would hinge on last-ulp libm agreement).  Ties break
    on token.

    Two passes over the input (index-then-probe, like shingle_decontam):
    pass 1 aggregates (token, df) — shuffle volume = vocabulary — and
    gathers it into ONE Ray task whose sorted-vocab arrays broadcast via
    the object store; pass 2 is map-only: per-batch (doc, token, tf)
    rows, vectorized ``searchsorted`` df lookup, per-doc rank by
    lexsort + run boundaries.  The broadcast assumes crawl-scale vocab is
    pruned (df floor / top-V); an unpruned 10^9-token vocabulary needs
    the shuffle swap instead: ``joins.hash_join`` of tf rows with the df
    table on token, then a per-doc top-k groupby."""
    import ray

    refs = list(document_frequencies(ds, text_col).materialize().to_arrow_refs())

    def _gather(rs):
        ts = [t for t in ray.get(rs) if t.num_rows]
        if not ts:
            return np.array([], dtype=object), np.array([], dtype=np.int64)
        tok = np.concatenate([np.asarray(t["token"].to_pylist(), dtype=object) for t in ts])
        df = np.concatenate([t["df"].to_numpy(zero_copy_only=False) for t in ts])
        order = np.argsort(tok)
        return tok[order], df[order].astype(np.int64)

    vocab_ref = ray.remote(num_cpus=1)(_gather).remote(refs)

    def topk(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        })
        trimmed = pc.utf8_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep).cast(pa.int64()).to_numpy(zero_copy_only=False)
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = len(lists)
        if n == 0:
            return empty
        vocab, dfs = ray.get(vocab_ref)
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        counts = offsets[1:] - offsets[:-1]
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        bvocab, codes = np.unique(words, return_inverse=True)
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), counts)
        pair, tf = np.unique(doc_ix * len(bvocab) + codes, return_counts=True)
        p_doc, p_code = pair // len(bvocab), pair % len(bvocab)
        p_tok = bvocab[p_code]
        p_df = dfs[np.searchsorted(vocab, p_tok)]  # every token is in the corpus vocab
        score = tf.astype(np.float64) / p_df
        order = np.lexsort((p_tok, -score, p_doc))
        d_s = p_doc[order]
        first = np.empty(len(d_s), dtype=bool)
        if len(d_s):
            first[0] = True
            first[1:] = d_s[1:] != d_s[:-1]
        rank = np.arange(len(d_s)) - np.repeat(
            np.flatnonzero(first), np.diff(np.append(np.flatnonzero(first), len(d_s)))
        ) + 1
        sel = rank <= k
        o = order[sel]
        return pa.table({
            id_col: pa.array(ids[p_doc[o]], pa.int64()),
            "token": pa.array(p_tok[o], pa.string()),
            "tf": pa.array(tf[o], pa.int64()),
            "df": pa.array(p_df[o], pa.int64()),
            "rank": pa.array(rank[sel], pa.int64()),
        })

    return ds.map_batches(topk, batch_format="pyarrow")


def make_token_entropy_batch(text_col: str, id_col: str):
    """Per-doc Shannon entropy of the whitespace-token distribution (the
    information-density quality signal: near-zero entropy = keyword-stuffed
    or template spam).  ``H = ln(n) - (1/n) * sum_t c_t ln c_t``; each
    ``c ln c`` term is quantized to fixed-point BEFORE the sum
    (``floor(c * ln(c) * 2^20 + 0.5)``, the ``stages/lm.py`` idiom) so
    the per-doc aggregate is an exact int64 and the cross-engine contract
    is bit-identical; ``entropy`` is then ONE double expression of exact
    ints, written identically in the SQL oracle.

    Vectorized: one regex split per batch, token factorization with
    ``np.unique``, per-(doc, token) counts via a combined-code unique, the
    per-doc fold via ``np.bincount`` — map-only, no per-row Python beyond
    the inherent string split.  Empty / null texts drop (the oracle's
    unnest produces no row for them)."""

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "clnc_q20": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        })
        # ASCII trim, exactly the oracle's trim(text, ' \t\n\v\f\r') —
        # utf8_trim_whitespace would also strip NBSP/U+3000 edges and
        # diverge from the SQL on non-ASCII whitespace
        trimmed = pc.ascii_trim_whitespace(batch[text_col])
        keep = pc.fill_null(pc.greater(pc.utf8_length(trimmed), 0), False)
        ids = batch[id_col].filter(keep).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lists = pc.split_pattern_regex(trimmed.filter(keep), pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n_docs = len(lists)
        if n_docs == 0:
            return empty
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        counts = offsets[1:] - offsets[:-1]
        # token identity via dictionary codes (vectorized C) — the strings
        # themselves never matter, only the per-(doc, token) counts
        flat = lists.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_vocab = len(enc.dictionary)
        doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        pair, c = np.unique(doc_ix * n_vocab + codes, return_counts=True)
        p_doc = pair // n_vocab
        cf = c.astype(np.float64)
        q = np.floor(cf * np.log(cf) * 1048576.0 + 0.5).astype(np.int64)
        # int64 accumulator (bincount's float64 weights would round past
        # 2^53 and break the exact-int contract)
        clnc = np.zeros(n_docs, dtype=np.int64)
        np.add.at(clnc, p_doc, q)
        nf = counts.astype(np.float64)
        # quantize ln(n) too: numpy's vectorized log and SQL ln differ in
        # the last ulp, so the final expression must be ints-only
        ln_n_q20 = np.floor(np.log(nf) * 1048576.0 + 0.5).astype(np.int64)
        entropy = (ln_n_q20 - clnc / nf) / 1048576.0
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "clnc_q20": pa.array(clnc, pa.int64()),
            "entropy": pa.array(entropy, pa.float64()),
        })

    return fn


def make_sentence_stats_batch(text_col: str, id_col: str):
    """Per-doc sentence structure: count and total character length of
    non-empty sentence segments (split on ``[.!?]+\\s+`` — the RE2
    pattern both engines share), the mean-sentence-length quality signal
    without a float in the contract.  Null texts drop (oracle's WHERE);
    empty / punctuation-only texts keep a (0, 0) row.  One regex split
    per batch; counts and length sums fold on int64 accumulators over
    the list offsets — no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        valid = pc.is_valid(batch[text_col])
        batch = batch.filter(valid)
        out_schema = pa.schema([
            ("doc_id", pa.int64()),
            ("n_sentences", pa.int64()),
            ("sum_sent_chars", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lists = pc.split_pattern_regex(
            batch[text_col], pattern=r"[.!?]+\s+"
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = lists.offsets.to_numpy().astype(np.int64)
        offsets = offsets - offsets[0]
        seg_counts = offsets[1:] - offsets[:-1]
        flat = lists.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        seg_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nonempty = seg_len > 0
        doc_ix = np.repeat(
            np.arange(len(ids), dtype=np.int64), seg_counts
        )
        n_sent = np.zeros(len(ids), dtype=np.int64)
        np.add.at(n_sent, doc_ix[nonempty], 1)
        tot = np.zeros(len(ids), dtype=np.int64)
        np.add.at(tot, doc_ix[nonempty], seg_len[nonempty])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "sum_sent_chars": pa.array(tot, pa.int64()),
        }, schema=out_schema)

    return fn
