from triplestore_spark.streaming.ingest import (
    stream_ntriples,
    stream_into_source,
)

__all__ = ["stream_ntriples", "stream_into_source"]
