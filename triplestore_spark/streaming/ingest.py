"""Structured-Streaming ingest.

The reference's "streaming" is incremental pull/push IO with context
cancellation (reference decode.go:65-127, encode.go:59-77) — Spark's
batch engine is already iterator-based, so those map to the plain
readers. What Structured Streaming adds is the LIVE counterpart: a
continuously-growing directory of NT files ingested exactly-once into
a canonical triple table.

stream_into_source uses foreachBatch + dedup-merge: each micro-batch
is parsed with the same nt_decode path as batch mode, keyed, and
merged into the sink parquet with left-anti on tkey (idempotent —
replayed batches collapse, the streaming analog of Source.Add
semantics). Checkpointing is Spark's own WAL (exactly-once file
ingest); cancellation = query.stop() (the ctx.Done() analog).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from triplestore_spark.sources.ntriples import decode_lines_df


def stream_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of .nt files -> streaming keyed
    triple DataFrame (same decode UDF as batch)."""
    lines = spark.readStream.format("text").load(path)
    return decode_lines_df(lines)


def stream_into_source(
    spark: SparkSession,
    in_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Run (or resume) the ingest query: new NT files -> dedup-merged
    canonical parquet at table_dir. Returns the StreamingQuery."""
    stream = stream_ntriples(spark, in_dir)
    data_path = os.path.join(table_dir, "triples.parquet")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(["tkey"])
        spark_ = batch.sparkSession
        if os.path.exists(data_path):
            existing = spark_.read.parquet(data_path)
            fresh = batch.join(
                existing.select("tkey"), on="tkey", how="left_anti"
            )
            fresh.write.mode("append").parquet(data_path)
        else:
            batch.write.mode("overwrite").parquet(data_path)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
