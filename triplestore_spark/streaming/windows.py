"""Event-time windowed aggregation with late-data handling.

The reference has no event-time semantics (SURVEY.md §2.9 — its
"streaming" is incremental IO); this is the Spark-native counterpart
a live KG ingest needs: windowed counts over an event stream with a
watermark bounding state for late data.

Works identically over a batch DataFrame (no watermark needed) and a
streaming one — the same function serves the DuckDB-oracled batch
query and the streaming test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, window_start, n, sum_value) tumbling-window
    aggregate; on a streaming input the watermark bounds aggregation
    state and drops events later than `watermark`."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col("event_type"),
            F.window(F.col(ts_col), window_duration).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """File-source streaming variant: parquet events dir -> windowed
    counts appended to out_dir (update via foreachBatch overwrite of
    complete windows would need a sink with upsert; append mode emits
    each window once its watermark passes)."""
    stream = (
        spark.readStream.schema(schema).parquet(in_dir)
    )
    agg = windowed_event_counts(stream, window_duration, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
