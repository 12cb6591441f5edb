"""Structured Streaming seed/candidate ingestion.

The engine's round loop is a deterministic batch protocol (the exactness
gate needs synchronous rounds — SURVEY.md §3.1), but seed intake in a
production crawl is a stream: new seed lists land continuously and must be
normalized, filtered, deduplicated and inserted into the frontier as they
arrive — ABWCF's ``Crawler.SeedUrls`` entry point
(``/root/reference/src/main/scala/abwcf/actors/Crawler.scala:156-159``)
re-expressed as ``readStream → foreachBatch``.

Each micro-batch runs the SAME operator chain as a crawl round's intake
half (normalize → url-filter → in-batch dedup → URL-seen anti-join →
priority → frontier append), so streamed seeds are byte-compatible with
batch-seeded frontiers.  Checkpointing is Spark's own streaming checkpoint
(offset tracking) + the frontier parquet dir; exactly-once per URL comes
from the URL-seen anti-join against the frontier, which makes re-delivered
micro-batches idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import STATUS_DISCOVERED, CrawlConfig
from ..operators.round_ops import (
    dedup_in_round,
    priority_column,
    url_filter_predicate,
    url_seen_filter,
    with_host,
)
from ..operators.udfs import make_normalize_udf

SEED_STREAM_SCHEMA = "url string, seq long"


def seed_intake_batch(
    spark: SparkSession,
    batch: DataFrame,
    frontier_dir: str,
    cfg: CrawlConfig,
    discovered_round: int = 0,
) -> None:
    """foreachBatch body: intake one micro-batch of seed URLs into the
    frontier parquet dir (append).  Idempotent per URL via anti-join."""
    normalize_udf = make_normalize_udf(cfg)
    cand = (
        batch.select(
            F.col("url").cast("string"),
            F.lit(0).cast("int").alias("crawl_depth"),
            F.col("seq").cast("long"),
        )
        .withColumn("_norm", normalize_udf(F.col("url")))
        .where(F.col("_norm").isNotNull())
        .select(F.col("_norm").alias("url"), "crawl_depth", "seq")
        .where(url_filter_predicate(cfg, F.col("url")))
    )
    cand = dedup_in_round(cand)
    try:
        frontier = spark.read.parquet(frontier_dir)
        have_frontier = True
    except Exception:
        have_frontier = False
    if have_frontier:
        cand = url_seen_filter(cand, frontier)
    rows = with_host(cand).select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        "host",
        F.lit(STATUS_DISCOVERED).alias("status"),
        F.col("crawl_depth").cast("int"),
        priority_column(cfg).alias("crawl_priority"),
        F.lit(discovered_round).cast("int").alias("discovered_round"),
        F.lit(None).cast("int").alias("fetched_round"),
        F.lit(None).cast("long").alias("fetch_order"),
        F.spark_partition_id().alias("partition_id"),
    )
    rows.write.mode("append").parquet(frontier_dir)


def start_seed_stream(
    spark: SparkSession,
    seed_dir: str,
    frontier_dir: str,
    checkpoint_dir: str,
    cfg: CrawlConfig = CrawlConfig(),
):
    """File-source seed stream: every parquet file dropped into ``seed_dir``
    becomes a micro-batch of frontier inserts.  Returns the StreamingQuery
    (caller awaits / stops)."""
    stream = (
        spark.readStream.schema(SEED_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seed_dir)
    )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        seed_intake_batch(spark, batch_df, frontier_dir, cfg)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
