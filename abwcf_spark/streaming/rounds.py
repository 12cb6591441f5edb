"""Structured-Streaming-driven round execution.

The north star replaces ABWCF's actor mailboxes with "micro-batch
Structured Streaming rounds".  The engine's round protocol is deterministic
and synchronous (the exactness gate requires it — SURVEY.md §3.1), so the
streaming integration drives exactly that protocol from a streaming
trigger: a rate source ticks, and each ``foreachBatch`` invocation runs ONE
crawl round (``SparkCrawler._step``) on the driver.  Durability remains the
crawler's own manifest/snapshot machinery (kill the query, resume the
crawler — byte-identical, tests/test_streaming_ingest.py), layered with
Spark's streaming checkpoint for the trigger offsets.

This is the micro-batch shape a production deployment would run: rounds
fire continuously under the streaming scheduler (processingTime trigger ≙
the reference's continuous actor loop), new seeds can be injected between
rounds via ``ingest.seed_intake_batch``, and the query stops itself when
the frontier drains.
"""

from __future__ import annotations

from ..engine.crawler import SparkCrawler


def stream_rounds(
    crawler: SparkCrawler,
    seeds=None,
    checkpoint_dir: str | None = None,
    trigger_seconds: float = 0.0,
    max_rounds: int | None = None,
):
    """Run the crawl as a Structured Streaming query — one round per
    micro-batch trigger.  Blocks until the crawl drains (or ``max_rounds``),
    then returns the CrawlResult-equivalent state from the crawler."""
    spark = crawler.spark
    # restart semantics: a restarted query (same streaming checkpoint)
    # replays its last trigger into _tick — resume the crawler from its own
    # manifest when one exists, so the replay CONTINUES the crawl instead
    # of re-running round 0 on a freshly seeded frontier
    if crawler.checkpoint_dir and crawler.latest_snapshot() is not None:
        crawler._restore()
    elif seeds is not None:
        crawler.seed(seeds)
    limit = max_rounds if max_rounds is not None else crawler.cfg.max_rounds
    state = {"done": False}

    def _tick(batch_df, batch_id: int) -> None:
        # the rate rows themselves are ignored — the trigger IS the round
        # clock (HostQueue's delay gates already live in virtual round time)
        if state["done"] or crawler.rnd >= limit:
            state["done"] = True
            return
        state["done"] = crawler._step()
        if crawler.checkpoint_dir and (
            crawler.rnd % crawler.checkpoint_interval == 0 or state["done"]
        ):
            crawler._checkpoint()

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(1, int(1 / trigger_seconds) if trigger_seconds else 1000))
        .load()
    )
    writer = stream.writeStream.foreachBatch(_tick)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    q = writer.start()
    try:
        # bounded-wait polling on awaitTermination — processAllAvailable
        # against a continuously producing rate source can block forever
        # when rounds lag the tick rate
        while not state["done"] and q.isActive:
            q.awaitTermination(1)
    finally:
        q.stop()
    if crawler.checkpoint_dir and not state["done"]:
        crawler._checkpoint()

    from ..engine.crawler import CrawlResult

    return CrawlResult(
        crawler.frontier,
        crawler.hosts,
        crawler.rnd,
        crawler.fetch_seq,
        crawler.metrics,
        crawler.payload_failures,
    )
