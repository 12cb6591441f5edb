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


def test_sharded_bloom_probe_and_update(spark, tmp_path):
    """ShardedBloom: executor-side update + probe must agree with the
    single-array BloomFilter semantics — no false negatives, bounded fpp,
    and only O(shards) metadata returns to the driver."""
    import numpy as np

    from abwcf_spark.kernels.bloom_shards import ShardedBloom
    from abwcf_spark.kernels.hashing import xxhash64_str

    sb = ShardedBloom(str(tmp_path / "bloom"), capacity=10_000, n_shards=8)
    member = [f"https://s{i}.example/p/{i}" for i in range(2_000)]
    other = [f"https://o{i}.example/q/{i}" for i in range(2_000)]
    df = spark.createDataFrame(
        [(xxhash64_str(u),) for u in member], "url_hash long"
    ).repartition(8)
    added = sb.add_dataframe(df, "url_hash")
    assert added == len(member)
    assert 0 < len(sb.versions) <= 8

    from pyspark.sql import functions as F

    probe = sb.make_probe_udf()
    all_urls = spark.createDataFrame(
        [(u, xxhash64_str(u)) for u in member + other], "url string, h long"
    )
    got = {
        r.url: r.maybe
        for r in all_urls.select("url", probe(F.col("h")).alias("maybe")).collect()
    }
    assert all(got[u] for u in member), "false negative: member probed absent"
    fp = sum(1 for u in other if got[u]) / len(other)
    assert fp < 0.05, f"fpp too high: {fp}"

    # incremental second round only rewrites touched shards as new versions
    df2 = spark.createDataFrame(
        [(xxhash64_str(f"https://n{i}.example/{i}"),) for i in range(100)],
        "url_hash long",
    )
    v_before = dict(sb.versions)
    sb.add_dataframe(df2, "url_hash")
    assert any(v > max(v_before.values()) for v in sb.versions.values())
    assert all(sb.versions[s] >= v for s, v in v_before.items())


def test_sharded_bloom_never_rewrites_a_version(spark, tmp_path):
    """Shard-file immutability: a rebuild followed by a same-round add (the
    restore-then-crawl sequence) must produce DISTINCT versioned files —
    re-writing a path a long-lived worker already cached would serve stale
    bits → bloom false negatives → duplicate frontier rows on re-discovered
    URLs."""
    import os

    from abwcf_spark.kernels.bloom_shards import ShardedBloom
    from abwcf_spark.kernels.hashing import xxhash64_str

    d = str(tmp_path / "bloom")
    sb = ShardedBloom(d, capacity=4_000, n_shards=4)
    df1 = spark.createDataFrame(
        [(xxhash64_str(f"https://a{i}.example/{i}"),) for i in range(500)],
        "url_hash long",
    )
    sb.add_dataframe(df1, "url_hash")
    v1 = dict(sb.versions)

    # rebuild (as _restore does) then immediately add the same round's batch
    sb.rebuild_from(df1.selectExpr("url_hash"))
    v2 = dict(sb.versions)
    df2 = spark.createDataFrame(
        [(xxhash64_str(f"https://b{i}.example/{i}"),) for i in range(500)],
        "url_hash long",
    )
    sb.add_dataframe(df2, "url_hash")
    v3 = dict(sb.versions)

    # strictly increasing write-counter versions: no path written twice
    assert max(v2.values()) > max(v1.values())
    assert max(v3.values()) > max(v2.values())
    # every referenced version file exists and both batches probe positive
    for s, v in sb.versions.items():
        assert os.path.exists(os.path.join(d, f"shard={s:05d}", f"v={v:06d}.bin"))
    from pyspark.sql import functions as F

    probe = sb.make_probe_udf()
    both = df1.unionByName(df2)
    n_hit = both.select(probe(F.col("url_hash")).alias("m")).where("m").count()
    assert n_hit == both.count(), "false negative after rebuild+add"

    # manifest round-trip resumes the write counter past all on-disk versions
    sb2 = ShardedBloom.from_manifest(d, sb.to_manifest())
    assert sb2.wseq >= max(v3.values())
