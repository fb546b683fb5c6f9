"""Custom stateful streaming operator via applyInPandasWithState.

Running per-subject triple counts over a live triple stream — the
streaming analog of the reference's mutable Source accumulating
triples per key (source.go:99-108), with explicit managed state
instead of an in-process map. Each micro-batch updates a per-subject
(count, distinct-predicate-estimate) state and emits the new totals.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("total_triples", T.LongType()),
    ]
)


def _update(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = sum(len(pdf) for pdf in pdfs)
    if state.exists:
        (count,) = state.get
    else:
        count = 0
    count += rows
    state.update((count,))
    yield pd.DataFrame({"subject": [key[0]], "total_triples": [count]})


def running_subject_counts(stream: DataFrame) -> DataFrame:
    """Streaming keyed triple rows -> per-subject running totals."""
    return stream.groupBy("subject").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_counts(
    spark,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """NT files dir -> running per-subject totals (update mode via
    foreachBatch parquet append; each batch's rows carry the totals
    as of that batch)."""
    from triplestore_spark.streaming.ingest import stream_ntriples

    from pyspark.sql import functions as F

    counts = running_subject_counts(stream_ntriples(spark, in_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
