"""Unicode text normalization — the first cleaning pass of a crawl
pipeline (NFC/NFKC canonicalization so visually-identical strings hash
identically downstream, control-character strip, whitespace collapse).

The strip/collapse steps are Arrow RE2 kernels; the Unicode
canonicalization runs ``unicodedata.normalize`` on the (vectorized-
detected) non-ASCII minority only, because this pyarrow's
``utf8_normalize`` is broken (see ``_unicode_normalize``).  The stage is
map-only and streams.  Exact-dedup and MinHash both key on raw bytes, so
running this BEFORE the dedup family is what makes "same text, different
encoding" pages collapse (composed vs decomposed accents, NBSP vs space
variants normalized by NFKC, stray control bytes from bad decoders).

Contract (mirrored by the DuckDB oracle, which re-derives it with
``nfc_normalize`` + the same RE2 patterns):

1. Unicode normalize to ``form`` (default NFC — the only form DuckDB
   exposes, hence the oracle's choice; NFKC additionally folds
   compatibility characters like fullwidth letters).
2. Strip control characters ``[\\x00-\\x08\\x0E-\\x1F\\x7F]`` (TAB
   through CR survive as whitespace for the next step).
3. Collapse every ``\\s+`` run to one space and trim the ends.

Nulls propagate (null in -> null out) through every kernel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_CTRL = r"[\x00-\x08\x0E-\x1F\x7F]"


def _unicode_normalize(texts, form: str):
    """Unicode normalization with a vectorized ASCII fast path.

    This build's ``pc.utf8_normalize`` emits DECOMPOSED output for every
    form (pyarrow 16.1: NFC of a composed e-acute returns e + U+0301), so
    the canonicalization itself goes through ``unicodedata.normalize``
    (the same Unicode tables DuckDB's ``nfc_normalize`` implements).  The
    Python call only runs on rows that contain non-ASCII bytes — detected
    vectorized via char-count == byte-count — which on crawl text is a
    small minority; ASCII is normalization-invariant under every form."""
    import unicodedata

    import numpy as np

    non_ascii = pc.fill_null(
        pc.not_equal(pc.utf8_length(texts), pc.binary_length(texts)), False
    )
    mask = np.asarray(non_ascii)
    if not mask.any():
        return texts
    texts = pa.chunked_array([texts]).combine_chunks() if isinstance(
        texts, pa.ChunkedArray
    ) else texts
    idx = np.flatnonzero(mask)
    fixed = pa.array(
        [unicodedata.normalize(form, t) for t in texts.take(pa.array(idx)).to_pylist()],
        pa.string(),
    )
    # scatter back: replace_with_mask keeps untouched rows zero-copy
    return pc.replace_with_mask(texts, pa.array(mask), fixed)


def normalize_texts(texts, form: str = "NFC"):
    """The kernel chain over one Arrow string array."""
    x = _unicode_normalize(texts, form)
    x = pc.replace_substring_regex(x, pattern=_CTRL, replacement="")
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(x, " ")


def make_normalize_batch(
    text_col: str, id_col: str, out_col: str = "norm_text", form: str = "NFC"
):
    """``map_batches`` fn emitting (id_col, out_col)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch[id_col], out_col: normalize_texts(batch[text_col], form)}
        )

    return fn


def normalize_text(ds, text_col: str, form: str = "NFC"):
    """Replace ``text_col`` in place (all other columns pass through)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, normalize_texts(batch[text_col], form))

    return ds.map_batches(fn, batch_format="pyarrow")
