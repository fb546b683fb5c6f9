"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join on,
Arrow batching for the pandas-UDF codec paths) while remaining correct
on local[N]. Parallelism comes from SPARK_GRAFT_CPUS when set.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# path -> (mtime, inferred StructType). METADATA-only memo:
# re-inferring a parquet schema costs a footer read + analysis
# (~70-100 ms per spark.read.parquet call, measured) and the engine
# re-reads the same immutable input tables on every query
# construction. Results are still computed from the parquet files on
# every action — only the schema is reused, and only while the path's
# mtime is unchanged, so an in-process rewrite re-infers.
_SCHEMA_CACHE: dict = {}


def read_parquet_table(spark: SparkSession, path: str):
    """spark.read.parquet with a per-path schema memo (see above)."""
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        # non-local / unstat-able path: no memo, plain read
        return spark.read.parquet(path)
    hit = _SCHEMA_CACHE.get(path)
    if hit is not None and hit[0] == mtime:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = (mtime, df.schema)
    return df


def get_spark(
    app_name: str = "triplestore-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # 8m advisory (vs 64m default): triple rows are wide strings;
        # on local[N] the default coalesces small-bench shuffles below
        # the core count. On a real cluster partition counts are large
        # either way — this only buys parallelism at the small end.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
