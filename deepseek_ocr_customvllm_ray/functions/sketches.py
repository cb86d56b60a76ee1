"""Mergeable sketches: Bloom filter (semi-join side), HyperLogLog
(approximate distinct), Count-Min (frequencies), log-histogram (quantiles).
Public algorithms (Bloom '70; Flajolet et al. '07; Cormode &
Muthukrishnan '05), numpy-vectorized, deterministic (blake2b 8-byte
hashing — never Python's salted ``hash``, and never crc32, whose 32 bits
collide at crawl scale; see ``_hash64``).

The mergeability is the point for Ray: each ``map_batches`` task emits one
small sketch; a tiny reduce merges them (union for Bloom, element-wise max
for HLL registers) — the pre-aggregate pattern with constant-size partials.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterable, List

import numpy as np

_MAXH = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64(values: Iterable[str]) -> np.ndarray:
    """True 64-bit hashes (blake2b/8-byte digests).  A crc32-based mix
    would cap entropy at 2^32 — birthday collisions at ~10^5 keys, HLL
    saturation near 4.3e9 — unacceptable for crawl-scale sketching."""
    return np.fromiter(
        (
            int.from_bytes(blake2b(v.encode("utf-8"), digest_size=8).digest(), "little")
            for v in values
        ),
        dtype=np.uint64,
    )


class BloomFilter:
    """Fixed-size Bloom filter; k hash probes derived from one 64-bit hash
    (Kirsch-Mitzenmacher double hashing)."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions_from(self, h: np.ndarray) -> np.ndarray:
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) & np.uint64(self.n_bits - 1)

    def _positions(self, values: List[str]) -> np.ndarray:
        return self._positions_from(_hash64(values))

    def add_many(self, values: List[str]) -> None:
        if not values:
            return
        self.add_hashes(_hash64(values))

    def add_hashes(self, h: np.ndarray) -> None:
        """Insert pre-computed 64-bit hashes (blake2b-8/little-endian — the
        same family ``add_many`` derives, so text- and digest-side callers
        interoperate)."""
        if not len(h):
            return
        pos = self._positions_from(h).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, values: List[str]) -> np.ndarray:
        """Vectorized membership test -> bool array (no false negatives)."""
        if not values:
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(_hash64(values))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=bool)
        pos = self._positions_from(h)
        word = self.bits[(pos >> np.uint64(6)).ravel()].reshape(pos.shape)
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, k: int) -> "BloomFilter":
        bf = cls(n_bits, k)
        bf.bits = np.frombuffer(data, dtype=np.uint64).copy()
        return bf


class HyperLogLog:
    """HLL with 2^p registers; standard bias-corrected estimator."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values: List[str]) -> None:
        if not values:
            return
        h = _hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) & _MAXH
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.full(len(h), 64 - self.p, dtype=np.uint8)
        nonzero = rest != 0
        if nonzero.any():
            # number of leading zeros via float exponent is unsafe; use
            # a bit-length loop over 64 bits vectorized with log2
            bl = np.zeros(len(h), dtype=np.int64)
            r = rest[nonzero]
            bl_nz = np.floor(np.log2(r.astype(np.float64))).astype(np.int64)
            bl[nonzero] = bl_nz
            lz = np.where(nonzero, 63 - bl, 64 - self.p).astype(np.int64)
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting for small n
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan '05): approximate counts
    with one-sided error (never under-estimates; over-estimate bounded by
    eps * total_count w.p. 1 - delta for width = e/eps, depth = ln(1/delta)).

    Mergeable by element-wise table addition, so each ``map_batches`` task
    emits one (depth x width) int64 table and a tiny reduce sums them —
    frequency tracking over 10^12 tokens in depth*width*8 bytes.  Row d
    hashes value v as ``_hash64(f"{d}:{v}") % width`` (independent salted
    rows, deterministic across processes)."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _positions(self, values: List[str], d: int) -> np.ndarray:
        return (_hash64(f"{d}:{v}" for v in values) % np.uint64(self.width)).astype(
            np.int64
        )

    def add_many(self, values: List[str], counts=None) -> None:
        if not values:
            return
        w = (
            np.ones(len(values), dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )
        for d in range(self.depth):
            np.add.at(self.table[d], self._positions(values, d), w)

    def query_many(self, values: List[str]) -> np.ndarray:
        """Per-value estimate: min over rows (the CM estimator)."""
        if not values:
            return np.zeros(0, dtype=np.int64)
        est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            est = np.minimum(est, self.table[d][self._positions(values, d)])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        out = CountMinSketch(self.width, self.depth)
        out.table = self.table + other.table
        return out

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, width: int, depth: int) -> "CountMinSketch":
        s = cls(width, depth)
        s.table = np.frombuffer(data, dtype=np.int64).reshape(depth, width).copy()
        return s


class LogHistogram:
    """Mergeable log-scale histogram for approximate quantiles of positive
    values (the classic HDR-histogram idea: fixed exponential bins, so the
    relative error is bounded by the bin growth factor).

    ``sub`` linear sub-bins per power of two bound relative error at
    2^(1/sub) - 1 (sub=16 -> ~4.4%).  Merge = element-wise count add, so
    each ``map_batches`` task emits one constant-size count vector and a
    tiny reduce sums them — quantiles over 10^12 rows without a sort.
    Deterministic: estimates depend only on the merged counts."""

    #: bins cover [1, 2^60); values outside clamp to the edge bins
    _MAX_POW = 60

    def __init__(self, sub: int = 16):
        self.sub = sub
        self.counts = np.zeros(self._MAX_POW * sub, dtype=np.int64)

    def _bin_index(self, values: np.ndarray) -> np.ndarray:
        v = np.clip(np.asarray(values, dtype=np.float64), 1.0, 2.0**self._MAX_POW - 1)
        idx = np.floor(np.log2(v) * self.sub).astype(np.int64)
        return np.clip(idx, 0, len(self.counts) - 1)

    def add_many(self, values) -> None:
        if len(values) == 0:
            return
        np.add.at(self.counts, self._bin_index(values), 1)

    def merge(self, other: "LogHistogram") -> "LogHistogram":
        assert self.sub == other.sub
        out = LogHistogram(self.sub)
        out.counts = self.counts + other.counts
        return out

    def quantile(self, q: float) -> float:
        """Estimate: the geometric midpoint of the bin holding the q-th
        ranked value (relative error <= half the bin ratio)."""
        total = int(self.counts.sum())
        if total == 0:
            return float("nan")
        rank = min(max(q, 0.0), 1.0) * (total - 1)
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, rank + 1))
        lo = 2.0 ** (b / self.sub)
        hi = 2.0 ** ((b + 1) / self.sub)
        return float(np.sqrt(lo * hi))

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, sub: int = 16) -> "LogHistogram":
        h = cls(sub)
        h.counts = np.frombuffer(data, dtype=np.int64).copy()
        return h
