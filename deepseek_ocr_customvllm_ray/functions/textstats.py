"""Text-analysis kernels for large-scale training-data pipelines.

No reference analog (the reference processes scanned documents); these are
the standard web-text curation operators (language ID, quality scoring,
token counting, fingerprinting) the task brief requires as first-class
components.  All kernels are deterministic and vectorize over pandas Series
or plain lists inside ``map_batches``.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List

import numpy as np

WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: GPT-2-style contraction/word/number/punct split
# (public pattern from the GPT-2 paper/tokenizer).
BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+", re.UNICODE
)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# Tiny per-language stopword seeds for the n-gram/stopword language-ID
# heuristic (public lists, truncated to the most frequent).
_LANG_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it for was on are as with".split()),
    "fr": frozenset("le la les de des et un une est que pour dans sur au".split()),
    "es": frozenset("el la los las de y un una es que por para con del".split()),
    "de": frozenset("der die das und zu den von ist mit für auf ein eine".split()),
    "vi": frozenset("và của là có cho một người được không trong để các những".split()),
}


def whitespace_token_count(text: str) -> int:
    """Number of whitespace-separated tokens."""
    return len(text.split())


def bpe_token_count(text: str) -> int:
    """Approximate BPE token count via the GPT-2 pre-tokenizer regex."""
    return len(BPE_RE.findall(text))


def quality_features(text: str) -> Dict[str, float]:
    """Deterministic quality-scoring features (length / punctuation /
    stopword ratios), the standard web-text heuristics."""
    n_chars = len(text)
    words = text.split()
    n_tokens = len(words)
    if n_tokens == 0:
        return {
            "n_chars": n_chars, "n_tokens": 0, "mean_token_len": 0.0,
            "punct_ratio": 0.0, "stopword_ratio": 0.0, "digit_ratio": 0.0,
        }
    n_punct = len(_PUNCT_RE.findall(text))
    n_digits = sum(c.isdigit() for c in text)
    lower = [w.lower() for w in words]
    en_stop = _LANG_STOPWORDS["en"]
    n_stop = sum(w in en_stop for w in lower)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": float(np.mean([len(w) for w in words])),
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_tokens,
        "digit_ratio": n_digits / n_chars if n_chars else 0.0,
    }


def detect_language(text: str) -> str:
    """Stopword-vote language ID with a CJK character fast path.

    Returns the best-scoring language code or ``"und"`` when no evidence.
    """
    if not text:
        return "und"
    # CJK fast path: any han char -> zh (the corpus has no ja/ko)
    for ch in text[:2000]:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF:
            return "zh"
    words = [w.lower() for w in text.split()[:500]]
    if not words:
        return "und"
    best, best_score = "und", 0
    for lang, stops in _LANG_STOPWORDS.items():
        score = sum(w in stops for w in words)
        if score > best_score:
            best, best_score = lang, score
    return best


_FP_BASE = np.uint64(1099511628211)   # FNV-ish multiplier
_FP_SEED = np.uint64(14695981039346656037)


def doc_fingerprint(text: str) -> int:
    """64-bit rolling/accumulating document fingerprint over word hashes
    (order-sensitive, whitespace-normalized) — cheap content identity for
    lineage manifests.  Returns a non-negative int64-safe value.

    Plain-int arithmetic (identical values to the former numpy-scalar
    version — both are mod 2^64 — without its per-step overflow warning)."""
    h = int(_FP_SEED)
    base = int(_FP_BASE)
    for w in text.split():
        h = (h * base + zlib.crc32(w.encode("utf-8"))) & 0xFFFFFFFFFFFFFFFF
    return h >> 1  # fit in signed int64


def text_sha1_hex(texts: List[str]) -> List[str]:
    import hashlib

    return [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in texts]
