"""Near-duplicate hashing kernels: shingles, MinHash, SimHash, Jaccard.

Public algorithms (Broder '97 MinHash; Charikar '02 SimHash; standard LSH
banding).  Deterministic across processes: shingle hashing uses crc32 (not
Python ``hash``, which is salted per process), and permutation parameters
come from a seeded ``numpy`` RNG.

All kernels are numpy-vectorized per document; the per-batch wrappers live
in ``stages/dedup.py``.
"""

from __future__ import annotations

import zlib
from typing import List, Set

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)


def word_shingles(text: str, k: int = 3) -> Set[str]:
    """Set of word k-grams (lowercased, whitespace-tokenized)."""
    words = text.lower().split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """True uint64 hashes of the shingle set (blake2b 8-byte digests —
    crc32's 32 bits would collide distinct shingles at crawl scale and
    inflate similarity), sorted and deduped."""
    from hashlib import blake2b

    sh = word_shingles(text, k)
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (
                int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")
                for s in sh
            ),
            dtype=np.uint64,
            count=len(sh),
        )
    )


def minhash_params(num_perm: int, seed: int = 1234):
    """(a, b) universal-hash parameters, seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*h + b) mod p, per perm.

    Vectorized as an (num_perm, n_shingles) broadcast; empty shingle sets get
    the all-max signature (never matches anything).
    """
    num_perm = len(a)
    if hashes.size == 0:
        return np.full(num_perm, int(_MERSENNE), dtype=np.uint64)
    # NOTE: the uint64 product wraps mod 2^64 BEFORE the mod-p reduction, so
    # this is a fixed 64-bit mixing family, NOT the textbook universal
    # (a*h+b) mod p (2^64 is not a multiple of p).  It is deterministic,
    # self-consistent, and empirically near-uniform — which is what the
    # Jaccard estimator needs — but an independent implementation of the
    # textbook family will not reproduce these signatures.
    hv = hashes & ((np.uint64(1) << np.uint64(61)) - np.uint64(1))
    prod = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def band_keys(sig: np.ndarray, n_bands: int) -> List[int]:
    """LSH banding: split the signature into n_bands rows-per-band groups and
    hash each band to a bucket key (crc32 over the band bytes)."""
    rows = len(sig) // n_bands
    keys = []
    for bi in range(n_bands):
        band = sig[bi * rows : (bi + 1) * rows]
        keys.append(zlib.crc32(band.tobytes()) & 0x7FFFFFFF)
    return keys


def signature_similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate = fraction of equal signature slots."""
    return float(np.mean(sig_a == sig_b))


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verify-side measure)."""
    a, b = word_shingles(text_a, k), word_shingles(text_b, k)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """Full 64-bit SimHash over word tokens (blake2b hashes, bit vote).
    Returned as a SIGNED int64 reinterpretation (arrow-storable) — no vote
    bit is discarded; use :func:`hamming64`, which masks back to unsigned."""
    from hashlib import blake2b

    words = text.lower().split()
    if not words:
        return 0
    vals = np.fromiter(
        (
            int.from_bytes(blake2b(w.encode("utf-8"), digest_size=8).digest(), "little")
            for w in words
        ),
        dtype=np.uint64,
        count=len(words),
    )
    bits = ((vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))  # signed two's-complement reinterpret


def hamming64(x: int, y: int) -> int:
    return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
