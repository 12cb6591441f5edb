"""Event-time windowed rollup — batch/streaming-unified.

The reference exports crawl metrics continuously from its metrics actors
(``/root/reference/src/main/scala/abwcf/metrics/FetcherMetrics.scala:130-145``);
the Spark-native analogue of "metrics over time" is an EVENT-TIME tumbling
window aggregation, which Spark's unified DataFrame API lets us write ONCE
and run in two modes:

- **batch** (the driver gate runs this): a plain groupBy over the parquet
  `events` table — SQL-oracle-checkable against ``date_trunc('hour', ts)``;
- **streaming**: the same transform over ``readStream`` with a watermark,
  so state for closed windows is evicted and late rows beyond the
  watermark are dropped (tests/test_streaming_rollup.py drives the full
  append-mode lifecycle: window closes → row emits → later-than-watermark
  arrivals are discarded).

Scale shape: tumbling-window groupBy is one shuffle on
(window, event_type) with map-side partial aggregation; streaming state
is bounded by (windows in watermark horizon × event types).  The value
column is summed as DECIMAL(18,2) — exact, order-independent — so the
result hashes identically on any engine and any partitioning; the exact
sum is cast to double only at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(
    events: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Per-(1-hour tumbling window, event_type) count + exact value sum.

    ``events`` may be a batch OR streaming DataFrame with columns
    (ts timestamp, event_type string, value double).  Streaming callers
    pass ``watermark`` (e.g. ``"2 hours"``) to bound state and define
    lateness; batch callers leave it None (a watermark is a no-op barrier
    in batch mode anyway, but omitting it keeps the batch plan trivial).
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
        )
    )
