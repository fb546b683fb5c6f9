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


# bucket key per layout: the highest-cardinality column among the
# layout's leading sort keys. POS leads with `predicate` (cardinality
# ~dozens — a terrible bucket key), so it buckets on object_value,
# its second-position sort component: point lookups WithPredObj still
# prune on both, and hot predicates spread across buckets instead of
# hot-spotting one (the salting concern from the skew handling).
BUCKET_KEYS = {"spo": "subject", "pos": "object_value", "osp": "object_value"}


def create_layout_tables_sql(
    catalog: str = "kg", db: str = "graph", partitions: int = 1024
) -> list[str]:
    """DDL for the three sorted layouts — STORED COLUMNS ARE THE 7
    COMPONENT COLUMNS ONLY, matching operators/materialize.py (okey/
    tkey are derived at scan time by with_keys; storing them tripled
    ~150 B/row of pure redundancy). Each table is bucketed on its
    BUCKET_KEYS column and sorted by the full LAYOUTS sort spec so
    Iceberg file/row-group min-max stats prune point lookups."""
    from triplestore_spark import schema as S

    cols = ", ".join(
        f"{name} {'boolean' if name == 'subject_is_bnode' else 'string'}"
        for name in S.TRIPLE_FIELDS
    )
    out = []
    for layout, keys in LAYOUTS.items():
        out.append(
            f"CREATE TABLE IF NOT EXISTS {catalog}.{db}.triples_{layout} "
            f"({cols}) USING iceberg "
            f"PARTITIONED BY (bucket({partitions}, {BUCKET_KEYS[layout]})) "
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
    from triplestore_spark import schema as S

    for ddl in create_layout_tables_sql(catalog, db):
        spark.sql(ddl)
    bare = df.select(*S.TRIPLE_FIELDS)  # component columns only
    for layout, keys in LAYOUTS.items():
        (
            bare.sortWithinPartitions(*keys)
            .writeTo(f"{catalog}.{db}.triples_{layout}")
            .overwritePartitions()
        )
