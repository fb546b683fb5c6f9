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


def test_registry_is_exactly_fifty():
    """The driver's CORRECTNESS harness caps gates at 50 — the
    round-5 swap (nt_encode -> nt_roundtrip, cli_convert ->
    codec_auto_detect, + bgp_star/path_supply_2hop) must keep the
    registry exactly full, every gate oracled."""
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    assert len(q) == 50
    assert set(q) == set(o)


def test_nt_roundtrip_gate_subsumes_nt_encode(spark, sf_dir):
    """Round-5 fold: the merged nt_roundtrip gate's line column must
    equal the former nt_encode gate's output exactly (the encoder run
    over the decoded components == the encoder run over the melt)."""
    import __spark_entry__ as entry
    from triplestore_spark.queries import (
        dedup_triples,
        tpch_graph_triples,
    )
    from triplestore_spark.sources.ntriples import nt_encode_expr

    merged = entry.queries()["nt_roundtrip"](spark, sf_dir)
    assert set(merged.columns) == {"tkey", "line"}
    old = (
        dedup_triples(tpch_graph_triples(spark, sf_dir))
        .select(nt_encode_expr().alias("line"))
    )
    got = sorted(r["line"] for r in merged.select("line").collect())
    want = sorted(r["line"] for r in old.collect())
    assert got == want and len(got) > 0


def test_codec_auto_detect_gate_subsumes_cli_convert(spark, sf_dir):
    """Round-5 fold: the binary side of the mixed directory is written
    BY THE CLI, so n_sources == 2 for every canonical key certifies
    the CLI conversion and the auto-dispatch of both decoders at
    once. A key with n_sources == 1 means one format dropped or
    corrupted it; 3+ means a decoder double-read."""
    import __spark_entry__ as entry
    from triplestore_spark.queries import dedup_triples, tpch_graph_triples

    df = entry.queries()["codec_auto_detect"](spark, sf_dir)
    rows = df.collect()
    n_graph = dedup_triples(tpch_graph_triples(spark, sf_dir)).count()
    assert len(rows) == n_graph
    assert all(r["n_sources"] == 2 for r in rows)
