"""Event-time windowed rollup: batch/streaming unification + watermark
semantics (streaming/rollup.py).

The SAME transform must (a) equal the SQL-oracled batch result when run
as a stream in complete mode, and (b) in append mode with a watermark,
emit a window only once it closes and DROP rows later than the watermark
— Spark's replacement for the reference's continuously-updating metrics
actors, with bounded state."""

import time
from datetime import datetime

import pytest

from abwcf_spark.streaming.rollup import windowed_event_rollup

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_chunk(spark, path, rows):
    spark.createDataFrame(
        [
            (i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), et, v)
            for i, (ts, et, v) in enumerate(rows)
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def test_streaming_complete_mode_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        ("2024-01-01 10:05:00", "click", 1.25),
        ("2024-01-01 10:30:00", "click", 2.50),
        ("2024-01-01 10:45:00", "view", 0.75),
        ("2024-01-01 13:10:00", "click", 4.00),
    ]
    _write_chunk(spark, src, rows)

    batch = windowed_event_rollup(spark.read.parquet(src)).toPandas()

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        windowed_event_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM rollup_complete").toPandas()
    finally:
        q.stop()

    key = ["window_start", "event_type"]
    assert (
        got.sort_values(key).reset_index(drop=True).to_dict("records")
        == batch.sort_values(key).reset_index(drop=True).to_dict("records")
    )


def test_streaming_append_mode_emits_closed_windows_and_drops_late(
    spark, tmp_path
):
    """Append-mode lifecycle: a window emits once the watermark passes its
    end, and a row arriving LATER than the watermark never changes it."""
    src = str(tmp_path / "src")
    # the source dir must exist before the stream is defined
    _write_chunk(spark, src, [("2024-01-01 09:59:00", "view", 0.50)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        windowed_event_rollup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_append")
        .outputMode("append")
        .start()
    )
    try:
        # batch 1: two rows in the 10:00 window; a row at 13:05 pushes the
        # watermark (13:05 - 1h = 12:05) past the 10:00 window's end
        _write_chunk(spark, src, [
            ("2024-01-01 10:05:00", "click", 1.25),
            ("2024-01-01 10:30:00", "click", 2.50),
            ("2024-01-01 13:05:00", "view", 4.00),
        ])
        q.processAllAvailable()
        # batch 2: a LATE row for the already-closed 10:00 window (10:45 <
        # watermark 12:05 → dropped) — watermark advancement lands at the
        # END of a micro-batch, so the 10:00 emission happens here
        _write_chunk(spark, src, [
            ("2024-01-01 10:45:00", "click", 99.00),
        ])
        q.processAllAvailable()

        deadline = time.time() + 30
        emitted = None
        while time.time() < deadline:
            emitted = spark.sql(
                "SELECT * FROM rollup_append WHERE window_start = "
                "'2024-01-01 10:00:00'"
            ).toPandas()
            if len(emitted):
                break
            q.processAllAvailable()
            time.sleep(0.5)
        assert len(emitted) == 1, "closed 10:00 window never emitted"
        row = emitted.iloc[0]
        # the late 99.00 click must NOT be in the emitted window
        assert row.event_type == "click"
        assert int(row.n_events) == 2
        assert float(row.sum_value) == pytest.approx(3.75)

        # the still-open 13:00 window must not have emitted yet
        open_w = spark.sql(
            "SELECT * FROM rollup_append WHERE window_start = "
            "'2024-01-01 13:00:00'"
        ).toPandas()
        assert len(open_w) == 0
    finally:
        q.stop()
