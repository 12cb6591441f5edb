"""Bloom-filter URL-seen set (numpy bitarray, xxhash64-derived probes).

The reference's approximate dedup is a node-local 100k-entry Caffeine LRU
(``/root/reference/src/main/scala/abwcf/actors/UrlDeduplicator.scala:29-43``,
explicitly lossy — exact dedup happens at the PageManager identity).  The
Spark engine keeps the same two-tier design at cluster scale
(SURVEY.md §2 O4/O5):

- **bloom fast path** — a driver-held, broadcast bit array probed inside a
  vectorized pandas UDF.  A *negative* probe proves the URL was never
  inserted, so it can skip the exact anti-join entirely; a *positive* probe
  means "maybe seen" and falls through to the anti-join.  The bloom may
  therefore never cause a false drop — it only routes rows.
- **exact path** — left-anti join against the frontier table (the authority).

The filter is *incremental*: each round adds only that round's inserted
URLs (their 64-bit xxhash64 values), never re-scanning the frontier, so the
per-round cost is O(new URLs), not O(frontier).  At 10^10-URL scale the bits
are sized by ``for_capacity`` (k=7 hashes, ~9.6 bits/key → ~1% fpp); the
array lives on the driver between rounds and is shipped to executors via
``SparkContext.broadcast`` once per round.

All k probe positions derive from the single signed-64 xxhash64 value that
Spark's ``F.xxhash64`` already computes for the frontier (double hashing:
g_i = h1 + i*h2, Kirsch-Mitzenmacher), so executors never re-hash strings.
"""

from __future__ import annotations

import math

import numpy as np

_WORD_BITS = 64


class BloomFilter:
    """Fixed-size bloom over signed/unsigned 64-bit keys."""

    def __init__(self, n_bits: int, n_hashes: int = 7):
        n_bits = max(_WORD_BITS, int(n_bits))
        self.n_bits = ((n_bits + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
        self.n_hashes = int(n_hashes)
        self.words = np.zeros(self.n_bits // _WORD_BITS, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def for_capacity(cls, n_keys: int, fpp: float = 0.01) -> "BloomFilter":
        n_keys = max(1, int(n_keys))
        n_bits = int(-n_keys * math.log(fpp) / (math.log(2) ** 2)) + 1
        k = max(1, round(n_bits / n_keys * math.log(2)))
        return cls(n_bits, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via double hashing of the 64-bit key."""
        u = keys.astype(np.int64).view(np.uint64)
        h1 = u
        # splitmix64-style remix for the second hash stream
        z = (u + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd → full-period
        i = np.arange(self.n_hashes, dtype=np.uint64)[None, :]
        g = (h1[:, None] + i * h2[:, None]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return (g % np.uint64(self.n_bits)).astype(np.uint64)

    def add_hashes(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(
            self.words,
            (pos // _WORD_BITS).astype(np.int64),
            np.uint64(1) << (pos % _WORD_BITS),
        )
        self.n_added += len(keys)

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized probe: bool array, True = maybe-seen, False = new."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        bits = (
            self.words[(pos // _WORD_BITS).astype(np.int64)]
            >> (pos % _WORD_BITS)
        ) & np.uint64(1)
        return bits.all(axis=1)

    def union(self, other: "BloomFilter") -> None:
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        self.words |= other.words
        self.n_added += other.n_added

    # -- checkpoint serialization ------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes, self.n_added], dtype=np.int64)
        return head.tobytes() + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        head = np.frombuffer(data[:24], dtype=np.int64)
        bf = cls(int(head[0]), int(head[1]))
        bf.words = np.frombuffer(data[24:], dtype=np.uint64).copy()
        bf.n_added = int(head[2])
        return bf
