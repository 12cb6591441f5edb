"""Unit tests for the bloom URL-seen kernel (no Spark needed)."""

import numpy as np

from abwcf_spark.kernels.bloom import BloomFilter
from abwcf_spark.kernels.hashing import xxhash64_str


def keys(n, prefix="u"):
    return np.array(
        [xxhash64_str(f"https://h.example/{prefix}/{i}") for i in range(n)],
        dtype=np.int64,
    )


def test_no_false_negatives():
    bf = BloomFilter.for_capacity(10_000, 0.01)
    k = keys(5_000)
    bf.add_hashes(k)
    assert bf.might_contain(k).all(), "bloom may NEVER miss an inserted key"


def test_fpp_in_budget():
    bf = BloomFilter.for_capacity(10_000, 0.01)
    bf.add_hashes(keys(10_000))
    probe = keys(20_000, prefix="other")
    fpp = bf.might_contain(probe).mean()
    assert fpp < 0.03, f"false-positive rate {fpp:.4f} blew the 1% design point"


def test_incremental_equals_bulk():
    bulk = BloomFilter.for_capacity(4_000)
    inc = BloomFilter.for_capacity(4_000)
    k = keys(4_000)
    bulk.add_hashes(k)
    for part in np.array_split(k, 7):
        inc.add_hashes(part)
    assert (bulk.words == inc.words).all()


def test_serialization_roundtrip():
    bf = BloomFilter.for_capacity(1_000)
    bf.add_hashes(keys(1_000))
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.n_bits == bf.n_bits and bf2.n_hashes == bf.n_hashes
    assert bf2.n_added == bf.n_added
    assert (bf2.words == bf.words).all()
    probe = keys(500, "x")
    assert (bf.might_contain(probe) == bf2.might_contain(probe)).all()


def test_union():
    a = BloomFilter.for_capacity(2_000)
    b = BloomFilter.for_capacity(2_000)
    ka, kb = keys(1_000, "a"), keys(1_000, "b")
    a.add_hashes(ka)
    b.add_hashes(kb)
    a.union(b)
    assert a.might_contain(ka).all() and a.might_contain(kb).all()


def test_empty_probe_and_add():
    bf = BloomFilter.for_capacity(100)
    bf.add_hashes(np.array([], dtype=np.int64))
    assert bf.might_contain(np.array([], dtype=np.int64)).shape == (0,)
    assert not bf.might_contain(keys(10)).any()
