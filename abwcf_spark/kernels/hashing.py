"""64-bit hashing kernel: XXH64 matching Spark's ``F.xxhash64``.

Spark's ``xxhash64`` expression hashes a string column's UTF-8 bytes with
XXH64 at seed 42 and returns a *signed* 64-bit long.  The pure-Python oracle
(``abwcf_spark/testing/oracle.py``) must produce bit-identical priorities to
the Spark pipeline (deterministic priority = xxhash64(url), replacing the
reference's irreproducible ``ThreadLocalRandom`` default —
``/root/reference/src/main/scala/abwcf/api/PrioritizationFunctions.scala:11-12``),
so this module implements XXH64 from the public algorithm spec
(https://github.com/Cyan4973/xxHash — public domain spec) and is verified
against ``F.xxhash64`` in ``tests/test_hashing.py``.

Also provides a numpy-vectorized batch variant for use inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    acc = _rotl(acc, 31)
    return (acc * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxhash64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit XXH64 of a string's UTF-8 bytes — equals
    ``F.xxhash64(col)`` for a StringType column."""
    return _to_signed(xxhash64_bytes(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed XXH64 of a LongType value — equals ``F.xxhash64(longCol)``.

    Spark hashes integral types as a single little-endian 8-byte long via
    ``hashLong`` (not the byte-stream path); replicate that: seed+P5, len 8,
    then the 8-byte tail step.
    """
    h = (seed + P5 + 8) & _M
    k1 = _round(0, v & _M)
    h ^= k1
    h = (_rotl(h, 27) * P1 + P4) & _M
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return _to_signed(h)


def xxhash64_series(s: pd.Series, seed: int = SPARK_SEED) -> pd.Series:
    """Batch XXH64 over a string Series → int64 Series (signed, Spark-equal).

    Implementation note: per-element Python over the UTF-8 bytes.  The Spark
    pipeline itself uses the JVM ``F.xxhash64`` — this batch form exists for
    the oracle/tests and for bloom-probe UDFs, where the bloom probe
    afterwards is numpy-vectorized.
    """
    vals = np.fromiter(
        (xxhash64_bytes(x.encode("utf-8"), seed) for x in s.astype(str)),
        dtype=np.uint64,
        count=len(s),
    )
    return pd.Series(vals.view(np.int64), index=s.index)
