"""Iceberg backend wiring (config-gated; no jars in this sandbox).

On a real cluster the materialized layouts become Iceberg tables so
snapshots, sort specs, and time travel are catalog-managed instead of
manifest-file-managed. This module holds the exact DDL/session config
the parquet emulation in operators/materialize.py stands in for —
switching backends is a config change, not a code change.

Activation (spark-submit):

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.kg.type=hadoop
    --conf spark.sql.catalog.kg.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from triplestore_spark.operators.materialize import LAYOUTS


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def create_layout_tables_sql(
    catalog: str = "kg", db: str = "graph", partitions: int = 1024
) -> list[str]:
    """DDL for the three sorted layouts. Each table is bucketed on its
    leading key (shuffle-free point lookups + clustered files) and
    sorted by the full layout key (min/max skipping within files)."""
    out = []
    lead = {"spo": "subject", "pos": "predicate", "osp": "okey"}
    for layout, keys in LAYOUTS.items():
        cols = """
          subject string, subject_is_bnode boolean, predicate string,
          object_kind string, object_value string, object_type string,
          object_lang string, okey string, tkey string
        """
        out.append(
            f"CREATE TABLE IF NOT EXISTS {catalog}.{db}.triples_{layout} "
            f"({cols}) USING iceberg "
            f"PARTITIONED BY (bucket({partitions}, {lead[layout]})) "
            f"TBLPROPERTIES ('write.distribution-mode'='hash', "
            f"'sort-order'='{', '.join(keys)}')"
        )
    return out


def write_layouts_iceberg(
    df: DataFrame, catalog: str = "kg", db: str = "graph"
) -> None:
    """writeTo(...).overwritePartitions() per layout; Iceberg assigns
    the snapshot id (the reference's dirty-flag analog, P2)."""
    spark = df.sparkSession
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use the parquet "
            "backend (operators/materialize.py) or launch with "
            "--packages iceberg-spark-runtime (see module docstring)"
        )
    for ddl in create_layout_tables_sql(catalog, db):
        spark.sql(ddl)
    for layout, keys in LAYOUTS.items():
        (
            df.sortWithinPartitions(*keys)
            .writeTo(f"{catalog}.{db}.triples_{layout}")
            .overwritePartitions()
        )
