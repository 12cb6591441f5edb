"""Bucketed incremental frontier commits: per-round write IO must scale
with the round's DELTA (touched buckets), never with frontier size — the
Iceberg-MERGE analogue of the reference's row-level
`UPDATE pages SET status = ? WHERE url = ?` (SlickPageRepository.scala:39,
batched via Batcher.scala:37-61)."""

import inspect
import os

from abwcf_spark.config import CrawlConfig
from abwcf_spark.engine.crawler import SparkCrawler
from abwcf_spark.testing.compare import assert_crawl_equal
from abwcf_spark.testing.corpus import CorpusSpec, gen_corpus
from abwcf_spark.testing.oracle import crawl_oracle
from abwcf_spark.testing.spark_fixtures import corpus_to_spark


def _dir_bytes(d):
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_commit_bytes_scale_with_round_delta(spark, tmp_path):
    """Late rounds fetch 1 URL (budget 1/host/round) against a frontier of
    ~40 rows spread over 64 buckets: the per-round frontier write must touch
    only the few delta buckets, so its bytes are a small fraction of the
    full table's."""
    spec = CorpusSpec(n_hosts=1, urls_per_host=40, seed_hosts=1,
                      with_images=False, redirect_rate=0, error_rate=0)
    tables = gen_corpus(spec)
    sdfs = corpus_to_spark(spark, tables)
    ckpt = str(tmp_path / "ckpt")
    crawler = SparkCrawler(
        spark, sdfs["corpus"], sdfs["robots"], CrawlConfig(),
        checkpoint_dir=ckpt, checkpoint_interval=5,
        collect_metrics=False, frontier_buckets=64,
    )
    res = crawler.run(seeds=sdfs["seeds"])
    oracle = crawl_oracle(tables["corpus"], tables["robots"], tables["seeds"])
    assert_crawl_equal(res, oracle)

    frontier_bytes = sum(
        _dir_bytes(p) for p in set(crawler.bucket_map.values())
    )
    frontier_rows = res.frontier.count()
    assert frontier_rows >= 30

    # the last few rounds insert nothing (tree exhausted) and fetch 1 URL:
    # their delta must be a handful of buckets, a small fraction of the table
    late = sorted(
        e for e in os.listdir(ckpt)
        if e.startswith("round=")
        and os.path.isdir(os.path.join(ckpt, e, "frontier_delta"))
    )[-3:]
    assert late, "no round delta dirs found"
    for e in late:
        delta_dir = os.path.join(ckpt, e, "frontier_delta")
        buckets_written = [
            b for b in os.listdir(delta_dir) if b.startswith("bucket=")
        ]
        delta_rows = spark.read.parquet(delta_dir).count()
        assert len(buckets_written) <= 6, (
            f"{e}: rewrote {len(buckets_written)} buckets for a 1-fetch round"
        )
        assert delta_rows <= frontier_rows / 3, (
            f"{e}: delta rows {delta_rows} not << frontier {frontier_rows}"
        )
    # and the delta files referenced by the map really are spread across
    # multiple historic rounds (untouched buckets were NOT rewritten)
    ref_rounds = {
        os.path.basename(os.path.dirname(os.path.dirname(p)))
        for p in crawler.bucket_map.values()
    }
    assert len(ref_rounds) >= 3, (
        "bucket map references a single round — the table is still being "
        f"fully rewritten every round: {ref_rounds}"
    )


def test_step_never_collects_row_data():
    """The round loop must keep row data off the driver: no toPandas/collect
    of row-bearing DataFrames inside _step (bucket ids and shard metadata —
    O(K) scalars — are the only permitted driver traffic)."""
    src = inspect.getsource(SparkCrawler._step)
    assert "toPandas" not in src
    # the only .collect() is the touched-bucket id set (O(n_buckets) ints)
    collects = [ln.strip() for ln in src.splitlines() if ".collect()" in ln]
    assert collects == ["touched = sorted(int(r.b) for r in bsrc.distinct().collect())"], collects
