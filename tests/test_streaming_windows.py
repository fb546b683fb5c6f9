"""Watermarked event-time windows: batch == streaming result; late
data beyond the watermark is dropped."""

import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2026, 1, 1, *hms), et, v) for i, (hms, et, v) in enumerate(rows)],
        EVENTS_SCHEMA,
    )


def test_batch_windowed_counts(spark):
    from triplestore_spark.streaming.windows import windowed_event_counts

    df = _mk_events(
        spark,
        [
            ((10, 5, 0), "click", 1.0),
            ((10, 45, 0), "click", 2.0),
            ((11, 5, 0), "click", 4.0),
            ((10, 20, 0), "view", 8.0),
        ],
    )
    out = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert out[("click", "2026-01-01 10:00:00")] == (2, 3.0)
    assert out[("click", "2026-01-01 11:00:00")] == (1, 4.0)
    assert out[("view", "2026-01-01 10:00:00")] == (1, 8.0)


def test_streaming_matches_batch_and_drops_late(spark, tmp_path):
    from triplestore_spark.streaming.windows import (
        stream_windowed_counts,
        windowed_event_counts,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    batch1 = _mk_events(
        spark,
        [
            ((10, 5, 0), "click", 1.0),
            ((10, 45, 0), "click", 2.0),
            ((13, 0, 0), "click", 16.0),  # advances watermark to 11:00
        ],
    )
    batch1.write.mode("overwrite").parquet(in_dir)

    q = stream_windowed_counts(
        spark, in_dir, out_dir, cp, EVENTS_SCHEMA,
        window_duration="1 hour", watermark="2 hours",
    )
    q.awaitTermination(180)

    # batch 2 arrives: one on-time event (13:30) and one VERY late
    # event (9:30, watermark already at 11:00) that must be dropped
    batch2 = _mk_events(
        spark,
        [
            ((13, 30, 0), "click", 32.0),
            ((9, 30, 0), "click", 64.0),  # late beyond watermark
            ((18, 0, 0), "click", 0.5),  # advances watermark past 13:xx
        ],
    )
    batch2.write.mode("append").parquet(in_dir)
    q2 = stream_windowed_counts(
        spark, in_dir, out_dir, cp, EVENTS_SCHEMA,
        window_duration="1 hour", watermark="2 hours",
    )
    q2.awaitTermination(180)

    got = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # 10:00 window: the two on-time events only — 64.0 was dropped
    assert got[("click", "2026-01-01 10:00:00")] == (2, 3.0)
    # 13:00 window emitted once watermark passed: includes both 13:xx
    assert got[("click", "2026-01-01 13:00:00")] == (2, 48.0)
    # the late 9:30 event contributed nowhere
    assert not any(
        ws == "2026-01-01 09:00:00" for (_, ws) in got
    )