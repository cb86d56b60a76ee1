"""PII redaction — scrub emails / IPv4 addresses / phone numbers from a
text column and count what was removed.

Training-data pipelines run this as a mandatory pre-tokenization pass;
at 100 TB it must be a pure map stage, and it is: every kernel here is an
Arrow RE2 call (``replace_substring_regex`` / ``count_substring_regex``)
over the whole column — zero Python per-row work, zero shuffles.

The three patterns are intentionally RE2-compatible (no lookarounds) so
the exact same regexes run in DuckDB's ``regexp_replace`` /
``regexp_extract_all`` for the independent oracle.  Replacement order
matters and is fixed: emails first (an address contains dot-separated
digit runs a later pattern could half-match), then IPs, then phones.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (count column, RE2 pattern, replacement token) — applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ips", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("n_phones", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
]


def make_redact_batch(text_col: str, id_col: str):
    """``map_batches`` fn: emit (id, redacted text, per-kind match counts).

    Counts are taken on the text as it stands when that pattern runs (the
    same order the replacements apply), so a value consumed by an earlier
    pattern is never double-counted.  Null text passes through as null
    with null counts — the same semantics as the SQL oracle's
    ``regexp_replace(NULL, ...)``."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        counts = {}
        for col, pat, tok in PII_PATTERNS:
            counts[col] = pc.count_substring_regex(txt, pattern=pat).cast(pa.int64())
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=tok)
        return pa.table({id_col: batch[id_col], "redacted": txt, **counts})

    return fn


def redact_pii(ds, text_col: str, id_col: str):
    """``Dataset -> Dataset`` of (id, redacted, n_emails, n_ips, n_phones)."""
    return ds.map_batches(make_redact_batch(text_col, id_col), batch_format="pyarrow")
