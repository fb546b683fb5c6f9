"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):    flagship KG pipeline on sf0.001.
queries():       every implemented operator from SURVEY.md §2.
oracle_sql():    DuckDB-runnable ANSI SQL equivalents.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract -> canonicalize -> dedup over the interleaved
    corpus built from /root/testdata/sf0.001 documents."""
    from triplestore_spark.pipeline.run import run_pipeline

    return run_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from triplestore_spark.queries import registry

    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from triplestore_spark.queries import registry

    return {
        name: sql for name, (_, sql) in registry().items() if sql is not None
    }
