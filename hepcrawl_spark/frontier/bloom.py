"""Pure-numpy Bloom filter — the second membership backend the north
rule names ("bloom/cuckoo URL-seen").

Standard partitioned Bloom filter: k deterministic index functions
derived from the 64-bit url fingerprint by SplitMix-style remixing (no
RNG — resume must be bit-reproducible).  At the default sizing
(m/n = 16 bits/key, k = 8) the false-positive rate is ~6e-4 — a false
positive *drops a never-seen URL*, which is the accepted trade of a
Bloom gate (the cuckoo backend supports deletion and holds fp ~1e-4 at
the same bits/key; Bloom's advantage is dead-simple union/merge of
shards: bitwise OR).  There are no false negatives: everything
inserted is always reported seen, so admitted ⊆ exact-admitted.

Sharding story is identical to ``cuckoo.CuckooShard`` — one shard per
``xxhash64(url_host) % S`` group, shard blob small enough for a single
``applyInPandas`` group (see seen.py).
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64((1 << 64) - 1)
# SplitMix64 multipliers (public constants)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _remix(h: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic 64-bit remix of ``h`` with an integer salt."""
    # salt constant folded in Python ints (numpy scalar uint64 products
    # warn on overflow; array ops below wrap silently by contract)
    add = np.uint64((salt * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
    z = (h + add) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * _M1) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * _M2) & _MASK64
    return z ^ (z >> np.uint64(31))


class BloomShard:
    """One shard: ``bits`` is a uint64 word array of ``m`` bits."""

    __slots__ = ("m", "k", "words", "count")

    def __init__(self, m_bits: int = 1 << 20, k: int = 8,
                 words: np.ndarray | None = None, count: int = 0):
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        self.m = int(m_bits)
        self.k = int(k)
        self.words = (
            words if words is not None
            else np.zeros(self.m // 64, dtype=np.uint64)
        )
        self.count = count

    def _indexes(self, hashes: np.ndarray) -> np.ndarray:
        """(len(hashes), k) bit indexes."""
        h = hashes.astype(np.uint64)
        cols = [
            (_remix(h, salt) % np.uint64(self.m)).astype(np.int64)
            for salt in range(1, self.k + 1)
        ]
        return np.stack(cols, axis=1)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        idx = self._indexes(np.asarray(hashes))
        word = idx >> 6
        bit = np.uint64(1) << (idx & 63).astype(np.uint64)
        return ((self.words[word] & bit) != 0).all(axis=1)

    def insert_many(self, hashes: np.ndarray) -> None:
        """Set all k bits for every hash (idempotent)."""
        if not len(hashes):
            return
        idx = self._indexes(np.asarray(hashes))
        word = (idx >> 6).ravel()
        bit = (np.uint64(1) << (idx & 63).astype(np.uint64)).ravel()
        np.bitwise_or.at(self.words, word, bit)
        self.count += int(len(hashes))

    def contains(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.int64))[0])

    def insert(self, h: int) -> None:
        self.insert_many(np.array([h], dtype=np.int64))

    def merge(self, other: "BloomShard") -> "BloomShard":
        """Union of two shards (bitwise OR) — the Bloom superpower that
        makes map-side partial seen-sets mergeable like partial aggs."""
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge differently-sized blooms")
        return BloomShard(
            self.m, self.k, self.words | other.words,
            self.count + other.count,
        )

    # -- serialization (checkpoint blob) ----------------------------------

    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k, self.count], dtype=np.int64)
        return header.tobytes() + self.words.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomShard":
        header = np.frombuffer(blob[:24], dtype=np.int64)
        m, k, count = (int(x) for x in header)
        words = np.frombuffer(blob[24:], dtype=np.uint64).copy()
        return cls(m, k, words, count)
