"""Partial-key cuckoo filter over 64-bit keys — the deletable URL-seen set.

The north rule names "bloom/cuckoo-filter URL-seen set"; this is the cuckoo
half (Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14).  Same contract as kernels/bloom.BloomFilter
— ``might_contain`` is free of false negatives, false positives are bounded
— plus DELETION, which a bloom cannot do without counting overhead: evicting
a URL from the seen-set (recrawl scheduling, frontier purges) just removes
its fingerprint.

Design (all public-paper standard):
- table of ``n_buckets`` (power of two) × 4 slots of 16-bit fingerprints;
  fp = 0 means empty, real fingerprints are remapped to 1..0xFFFF, so the
  false-positive bound is ≈ 2·4/2^16 ≈ 1.2e-4 per probe.
- partial-key addressing: ``i2 = i1 XOR h(fp)`` — either index is
  recoverable from the other plus the fingerprint alone, which is what
  makes eviction chains (and therefore ~95% load factors) possible.
- DETERMINISTIC eviction (no RNG anywhere — results must be reproducible
  run-to-run): the victim slot of kick k is ``(fp + k) mod 4``.
- an exact OVERFLOW STASH: an insert that exhausts ``max_kicks`` lands in a
  driver-visible stash list probed exactly.  The crawl engine treats a
  negative probe as PROOF a URL was never inserted (it skips the exact
  anti-join) — a dropped insert would be a correctness bug, not a
  capacity hiccup, so the filter NEVER drops; at the sized load factor the
  stash stays empty in practice.

Reference analogue: the URL-seen authority is PageManager entity identity
(``/root/reference/src/main/scala/abwcf/actors/PageManager.scala:19``); this
filter, like the bloom, is the scale path that keeps the exact check from
touching the 10^10-row frontier every round.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
SLOTS = 4


def _splitmix64(u: np.ndarray) -> np.ndarray:
    """The same public splitmix64 remix the bloom kernel uses.  uint64
    wraparound is the intended arithmetic — numpy only warns for SCALAR
    operands (the eviction loop passes scalars), so silence it locally."""
    with np.errstate(over="ignore"):
        z = (u + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) & _MASK64
        return z ^ (z >> np.uint64(31))


class CuckooFilter:
    """4-way, 16-bit-fingerprint cuckoo filter with an exact overflow stash."""

    def __init__(self, n_buckets: int, max_kicks: int = 500):
        n_buckets = max(int(n_buckets), 2)
        if n_buckets & (n_buckets - 1):
            n_buckets = 1 << n_buckets.bit_length()  # XOR addressing needs 2^k
        self.n_buckets = n_buckets
        self.max_kicks = int(max_kicks)
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        # overflow stash: synthetic (bucket << 16) | fingerprint records —
        # NOT original keys (the homeless entry after a failed eviction
        # chain is some earlier key's fingerprint whose origin is unknown);
        # might_contain/remove_hashes decode them as (bucket, fp) pairs
        self.stash: list[int] = []
        self.n_added = 0
        # session counters (CacheMetrics.scala:53-69 eviction parity):
        # transient — not serialized; shard writers report per-batch deltas
        self.n_kicks = 0    # eviction-chain displacements executed
        self.n_removed = 0  # fingerprints deleted via remove_hashes

    @classmethod
    def for_capacity(cls, n_keys: int, load: float = 0.84) -> "CuckooFilter":
        """Size so n_keys fits at ``load`` occupancy (0.84 leaves headroom
        under the ~0.95 feasibility bound of 4-way cuckoo hashing, keeping
        eviction chains short and the stash empty)."""
        n_keys = max(1, int(n_keys))
        want = int(n_keys / (SLOTS * load)) + 1
        return cls(1 << max(want - 1, 1).bit_length())

    # ------------------------------------------------------------ hashing
    def _derive(self, keys: np.ndarray):
        """(fingerprint uint16 in 1..0xFFFF, primary bucket index)."""
        u = np.asarray(keys, dtype=np.int64).view(np.uint64)
        mixed = _splitmix64(u)
        fp = (mixed & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty marker
        i1 = ((u >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i, fp):
        """i2 = i1 XOR h(fp) (and back again — an involution)."""
        fph = _splitmix64(np.asarray(fp, dtype=np.uint64))
        return (np.asarray(i, dtype=np.uint64) ^ fph) % np.uint64(
            self.n_buckets
        )

    # ------------------------------------------------------------- insert
    def add_hashes(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys) == 0:
            return
        fps, i1s = self._derive(keys)
        i2s = self._alt_index(i1s, fps).astype(np.int64)
        table = self.table
        for key, fp, i1, i2 in zip(keys, fps, i1s, i2s):
            placed = False
            for i in (i1, i2):
                row = table[i]
                free = np.nonzero(row == 0)[0]
                if len(free):
                    row[free[0]] = fp
                    placed = True
                    break
            if placed:
                self.n_added += 1
                continue
            # eviction chain: deterministic victim slot (fp + kick) % 4
            i, cur = int(i2), int(fp)
            for kick in range(self.max_kicks):
                slot = (cur + kick) % SLOTS
                self.n_kicks += 1
                cur, table[i, slot] = int(table[i, slot]), np.uint16(cur)
                i = int(self._alt_index(i, np.uint16(cur)))
                row = table[i]
                free = np.nonzero(row == 0)[0]
                if len(free):
                    row[free[0]] = cur
                    cur = 0
                    break
            if cur:
                # the displaced fingerprint has nowhere to go: park the
                # still-homeless ENTRY exactly.  ``cur`` is some evicted
                # fingerprint whose origin key is unknown — so the stash
                # holds a synthetic (bucket, fp) record probed exactly via
                # the same derivation the table probe uses.
                self.stash.append((i << 16) | cur)
            self.n_added += 1

    # ------------------------------------------------------------- probe
    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s = self._derive(keys)
        i2s = self._alt_index(i1s, fps).astype(np.int64)
        fcol = fps[:, None]
        out = (self.table[i1s] == fcol).any(axis=1) | (
            self.table[i2s] == fcol
        ).any(axis=1)
        if self.stash:
            st = np.asarray(self.stash, dtype=np.int64)
            st_i = st >> 16
            st_fp = (st & 0xFFFF).astype(np.uint16)
            for i, fp in zip(st_i, st_fp):
                alt = int(self._alt_index(int(i), fp))
                out |= (fps == fp) & ((i1s == i) | (i2s == i)
                                      | (i1s == alt) | (i2s == alt))
        return out

    # ------------------------------------------------------------- delete
    def remove_hashes(self, keys: np.ndarray) -> int:
        """Remove ONE fingerprint occurrence per key; returns how many were
        found.  Standard cuckoo caveat: only remove keys that were added
        (removing a never-added key can strip a colliding entry's
        fingerprint and turn its probe falsely negative)."""
        keys = np.asarray(keys, dtype=np.int64)
        removed = 0
        if len(keys) == 0:
            return 0
        fps, i1s = self._derive(keys)
        i2s = self._alt_index(i1s, fps).astype(np.int64)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            done = False
            for i in (i1, i2):
                row = self.table[i]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                continue
            rec_a, rec_b = (int(i1) << 16) | int(fp), (int(i2) << 16) | int(fp)
            for rec in (rec_a, rec_b):
                if rec in self.stash:
                    self.stash.remove(rec)
                    removed += 1
                    break
        self.n_added -= removed
        self.n_removed += removed
        return removed

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        head = np.array(
            [self.n_buckets, len(self.stash), self.n_added], dtype=np.int64
        )
        stash = np.asarray(self.stash, dtype=np.int64)
        return head.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:24], dtype=np.int64)
        n_buckets, n_stash, n_added = (int(v) for v in head)
        cf = cls(n_buckets)
        tbytes = n_buckets * SLOTS * 2
        cf.table = (
            np.frombuffer(data[24:24 + tbytes], dtype=np.uint16)
            .reshape(n_buckets, SLOTS)
            .copy()
        )
        cf.stash = [
            int(v)
            for v in np.frombuffer(data[24 + tbytes:], dtype=np.int64)[:n_stash]
        ]
        cf.n_added = n_added
        return cf

    @property
    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / self.table.size
