"""Checks folded out of the driver registry in the round-4
consolidation (the driver's CORRECTNESS harness caps at 50 gates, so
redundant gates moved here — VERDICT r3 #1).

- count parity: the former kg_count / graph_count gates (reference
  source.go len() / Count) as exact Spark-vs-DuckDB assertions.
- melt union: the merged struct_melt gate must equal the union of its
  two former per-table gates.
"""

import os

import duckdb
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_pipeline_count_parity(spark, sf_dir, duck):
    """kg_count's old oracle, now a pytest assertion: distinct canonical
    triple count of the flagship pipeline matches DuckDB exactly."""
    from triplestore_spark.queries import PIPELINE_TRIPLES_SQL, _pipeline_canonical

    n_spark = _pipeline_canonical(spark, sf_dir).count()
    n_duck = duck.execute(
        PIPELINE_TRIPLES_SQL
        + "SELECT count(*) AS n FROM (SELECT DISTINCT * FROM pipeline_triples)"
    ).fetchone()[0]
    assert n_spark == n_duck > 0


def test_graph_count_parity(spark, sf_dir, duck):
    """graph_count's old oracle: the deduped TPC-H melt's triple count
    (count == distinct tkeys — dedup_triples guarantees it)."""
    from triplestore_spark.queries import (
        TPCH_TRIPLES_SQL,
        dedup_triples,
        tpch_graph_triples,
    )

    g = dedup_triples(tpch_graph_triples(spark, sf_dir))
    n_spark = g.count()
    assert n_spark == g.select("tkey").distinct().count()
    n_duck = duck.execute(
        TPCH_TRIPLES_SQL
        + "SELECT count(*) AS n FROM (SELECT DISTINCT tkey FROM keyed)"
    ).fetchone()[0]
    assert n_spark == n_duck > 0


def test_struct_melt_gate_unions_both_tables(spark, sf_dir):
    """The merged struct_melt gate = customer melt + orders melt with
    no overlap lost: per-subject-prefix counts match the table sizes
    (3 fields per customer row, 3 per order row)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    df = entry.queries()["struct_melt"](spark, sf_dir)
    by_prefix = {
        r["p"]: r["n"]
        for r in df.groupBy(
            F.split("subject", ":").getItem(0).alias("p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    n_ord = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    assert by_prefix == {"cust": 3 * n_cust, "order": 3 * n_ord}
