"""XXH64 kernel vs golden values captured from Spark ``F.xxhash64`` (seed 42),
plus a live cross-check against the JVM implementation."""

import pandas as pd
import pytest

from abwcf_spark.kernels.hashing import (
    xxhash64_bytes,
    xxhash64_long,
    xxhash64_series,
    xxhash64_str,
)

STR_GOLDEN = {
    "": -7444071767201028348,
    "a": -8582455328737087284,
    "hello world": 7620854247404556961,
    "https://example.com/": 5583151835934739346,
    "x" * 100: 365730103971579591,
    "😃.example": 8800360215784851288,
    "abcdefgh12345678abcdefgh12345678XYZ": 515815909338388831,
}

LONG_GOLDEN = {
    0: -5252525462095825812,
    1: -7001672635703045582,
    -1: 3858142552250413010,
    42: -6876166290308861218,
    2**62: 8973626371093010265,
    -(2**62): 5005707091092326006,
    123456789: 3415128141240069951,
}


@pytest.mark.parametrize("s,h", STR_GOLDEN.items())
def test_str_golden(s, h):
    assert xxhash64_str(s) == h


@pytest.mark.parametrize("v,h", LONG_GOLDEN.items())
def test_long_golden(v, h):
    assert xxhash64_long(v) == h


def test_series():
    s = pd.Series(list(STR_GOLDEN))
    assert xxhash64_series(s).tolist() == list(STR_GOLDEN.values())


def test_reference_vector():
    # xxhash spec sanity: XXH64("", seed=0) = 0xEF46DB3751D8E999
    assert xxhash64_bytes(b"", 0) == 0xEF46DB3751D8E999


def test_matches_spark(spark):
    from pyspark.sql import functions as F

    strs = list(STR_GOLDEN) + [f"https://h{i}.example/p/{i}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    assert all(got[s] == xxhash64_str(s) for s in strs)
