"""Named queries + matching DuckDB oracle SQL.

Every operator from SURVEY.md §2 gets a (spark_query, oracle_sql)
pair; the driver runs both at sf=0.01 and compares row count + schema
+ order-insensitive value hash. Column names/aliases match on both
sides by construction.

The graph-surface queries run over a deterministic melt of the TPC-H
nation/region/supplier tables into triples; the KG-pipeline queries
run the real extract->resolve->dedup flow whose oracle is plain SQL
over `documents` (the corpus chunking is mention-invariant: chunks
split at spaces, mentions are whole tokens).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from triplestore_spark import schema as S
from triplestore_spark.functions.keys import with_keys
from triplestore_spark.operators.graph import dedup_triples
from triplestore_spark.operators.struct_melt import MeltField, melt_df
from triplestore_spark.pipeline import spec
from triplestore_spark.pipeline.run import run_pipeline


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# TPC-H melt: the graph-demo triple set
# ---------------------------------------------------------------------------

def tpch_graph_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")

    nation_triples = melt_df(
        nation,
        F.concat(F.lit("nation:"), F.col("n_nationkey")),
        [
            MeltField("rdf:type", F.lit("kg:Nation"), S.KIND_RESOURCE),
            MeltField("kg:name", F.col("n_name"), typ=S.XSD_STRING),
            MeltField(
                "kg:inRegion",
                F.concat(F.lit("region:"), F.col("n_regionkey")),
                S.KIND_RESOURCE,
            ),
        ],
    )
    region_triples = melt_df(
        region,
        F.concat(F.lit("region:"), F.col("r_regionkey")),
        [
            MeltField("rdf:type", F.lit("kg:Region"), S.KIND_RESOURCE),
            MeltField("kg:name", F.col("r_name"), typ=S.XSD_STRING),
        ],
    )
    return with_keys(nation_triples.unionByName(region_triples))


# the same melt as SQL (shared prefix of every graph oracle)
TPCH_TRIPLES_SQL = """
WITH triples AS (
  SELECT 'nation:' || n_nationkey AS subject, FALSE AS subject_is_bnode,
         'rdf:type' AS predicate, 'res' AS object_kind,
         'kg:Nation' AS object_value, '' AS object_type, '' AS object_lang
  FROM nation
  UNION ALL
  SELECT 'nation:' || n_nationkey, FALSE, 'kg:name', 'lit', n_name,
         'xsd:string', '' FROM nation
  UNION ALL
  SELECT 'nation:' || n_nationkey, FALSE, 'kg:inRegion', 'res',
         'region:' || n_regionkey, '', '' FROM nation
  UNION ALL
  SELECT 'region:' || r_regionkey, FALSE, 'rdf:type', 'res', 'kg:Region',
         '', '' FROM region
  UNION ALL
  SELECT 'region:' || r_regionkey, FALSE, 'kg:name', 'lit', r_name,
         'xsd:string', '' FROM region
),
keyed AS (
  SELECT *,
    CASE WHEN object_kind = 'lit' THEN
           CASE WHEN object_lang <> '' THEN '"' || object_value || '"@' || object_lang
                ELSE '"' || object_value || '"^^<' || object_type || '>' END
         WHEN object_kind = 'bnode' THEN '_:' || object_value
         ELSE '<' || object_value || '>' END AS okey,
    (CASE WHEN subject_is_bnode THEN '_:' || subject
          ELSE '<' || subject || '>' END)
      || '<' || predicate || '>' ||
    (CASE WHEN object_kind = 'lit' THEN
           CASE WHEN object_lang <> '' THEN '"' || object_value || '"@' || object_lang
                ELSE '"' || object_value || '"^^<' || object_type || '>' END
         WHEN object_kind = 'bnode' THEN '_:' || object_value
         ELSE '<' || object_value || '>' END) AS tkey
  FROM triples
)
"""

_TRIPLE_COLS = (
    "subject, subject_is_bnode, predicate, object_kind, object_value,"
    " object_type, object_lang, okey, tkey"
)


# ---------------------------------------------------------------------------
# KG pipeline oracles (documents table)
# ---------------------------------------------------------------------------

PIPELINE_TRIPLES_SQL = f"""
WITH mention_toks AS (
  SELECT 'doc:' || doc_id AS doc, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
mentions AS (
  SELECT DISTINCT doc AS subject, 'kg:mentions' AS predicate,
         'res' AS object_kind, gaz.iri AS object_value,
         '' AS object_type, '' AS object_lang
  FROM mention_toks JOIN {spec.gazetteer_values_sql()}
    ON mention_toks.tok = gaz.surface
),
chunks AS (
  SELECT doc_id,
         CAST(ceil(len(string_split(text, ' ')) / {spec.CHUNK_WORDS}.0) AS BIGINT)
           AS n_chunks
  FROM documents WHERE len(text) > 0
),
media AS (
  SELECT 'doc:' || c.doc_id AS subject, 'kg:hasMedia' AS predicate,
         'res' AS object_kind,
         'media://' || c.doc_id || '/' || j.j AS object_value,
         '' AS object_type, '' AS object_lang
  FROM chunks c, LATERAL (SELECT unnest(range(0, c.n_chunks)) AS j) j
  WHERE (c.doc_id * 31 + j.j) % {spec.MEDIA_EVERY} = 0
),
metadata AS (
  SELECT 'doc:' || doc_id AS subject, 'kg:source' AS predicate,
         'res' AS object_kind, 'src:' || source AS object_value,
         '' AS object_type, '' AS object_lang
  FROM documents
  UNION ALL
  SELECT 'doc:' || doc_id, 'kg:title', 'lit',
         array_to_string(string_split(text, ' ')[1:{spec.TITLE_WORDS}], ' '),
         'xsd:string', lang
  FROM documents
  UNION ALL
  SELECT 'doc:' || doc_id, 'kg:nchars', 'lit', CAST(n_chars AS VARCHAR),
         'xsd:integer', ''
  FROM documents
  UNION ALL
  SELECT 'doc:' || doc_id, 'rdf:type', 'res', 'kg:Document', '', ''
  FROM documents
),
pipeline_triples AS (
  SELECT * FROM mentions UNION ALL SELECT * FROM media
  UNION ALL SELECT * FROM metadata
)
"""


def _pipeline_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_pipeline(spark, sf_dir)


def _nt_encode_expr():
    from triplestore_spark.sources.ntriples import nt_encode_expr

    return nt_encode_expr()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def registry() -> dict[str, tuple[Callable, str | None]]:
    """name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql|None)."""
    q: dict[str, tuple[Callable, str | None]] = {}

    # -- KG pipeline (the flagship) --

    q["kg_canonical_triples"] = (
        lambda spark, sf: _pipeline_canonical(spark, sf).select(
            "subject",
            "predicate",
            "object_kind",
            "object_value",
            "object_type",
            "object_lang",
            "tkey",
        ),
        PIPELINE_TRIPLES_SQL
        + """
        SELECT DISTINCT subject, predicate, object_kind, object_value,
               object_type, object_lang,
               '<' || subject || '>' || '<' || predicate || '>' ||
               (CASE WHEN object_kind = 'lit' THEN
                      CASE WHEN object_lang <> ''
                           THEN '"' || object_value || '"@' || object_lang
                           ELSE '"' || object_value || '"^^<' || object_type || '>'
                      END
                     ELSE '<' || object_value || '>' END) AS tkey
        FROM pipeline_triples
        """,
    )

    q["kg_count"] = (
        lambda spark, sf: _pipeline_canonical(spark, sf).agg(
            F.count(F.lit(1)).alias("n")
        ),
        PIPELINE_TRIPLES_SQL
        + "SELECT count(*) AS n FROM (SELECT DISTINCT * FROM pipeline_triples)",
    )

    q["kg_mentions"] = (
        lambda spark, sf: _pipeline_canonical(spark, sf)
        .where(F.col("predicate") == spec.PRED_MENTIONS)
        .select("subject", F.col("object_value").alias("entity")),
        PIPELINE_TRIPLES_SQL
        + "SELECT subject, object_value AS entity FROM mentions",
    )

    q["kg_media"] = (
        lambda spark, sf: _pipeline_canonical(spark, sf)
        .where(F.col("predicate") == spec.PRED_HAS_MEDIA)
        .select("subject", F.col("object_value").alias("media_ref")),
        PIPELINE_TRIPLES_SQL
        + "SELECT subject, object_value AS media_ref FROM media",
    )

    q["kg_entity_degree"] = (
        # object-grouping query over the mentions predicate (the
        # WithPredObj family generalized to group-by)
        lambda spark, sf: _pipeline_canonical(spark, sf)
        .where(F.col("predicate") == spec.PRED_MENTIONS)
        .groupBy(F.col("object_value").alias("entity"))
        .agg(F.count(F.lit(1)).alias("n_docs")),
        PIPELINE_TRIPLES_SQL
        + """
        SELECT object_value AS entity, count(*) AS n_docs
        FROM mentions GROUP BY object_value
        """,
    )

    # -- graph query surface over the TPC-H melt --

    def graph(spark, sf):
        return dedup_triples(tpch_graph_triples(spark, sf))

    q["graph_triples"] = (
        lambda spark, sf: graph(spark, sf).select(
            *[c.strip() for c in _TRIPLE_COLS.split(",")]
        ),
        TPCH_TRIPLES_SQL + f"SELECT DISTINCT {_TRIPLE_COLS} FROM keyed",
    )

    q["graph_count"] = (
        lambda spark, sf: graph(spark, sf).agg(F.count(F.lit(1)).alias("n")),
        TPCH_TRIPLES_SQL
        + "SELECT count(*) AS n FROM (SELECT DISTINCT tkey FROM keyed)",
    )

    q["graph_with_subject"] = (
        lambda spark, sf: graph(spark, sf)
        .where(F.col("subject") == "nation:7")
        .select("predicate", "object_kind", "object_value"),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT predicate, object_kind, object_value
        FROM keyed WHERE subject = 'nation:7'
        """,
    )

    q["graph_with_predicate"] = (
        lambda spark, sf: graph(spark, sf)
        .where(F.col("predicate") == "kg:inRegion")
        .select("subject", "object_value"),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT subject, object_value
        FROM keyed WHERE predicate = 'kg:inRegion'
        """,
    )

    q["graph_with_object"] = (
        lambda spark, sf: graph(spark, sf)
        .where(F.col("okey") == "<region:2>")
        .select("subject", "predicate"),
        TPCH_TRIPLES_SQL
        + "SELECT DISTINCT subject, predicate FROM keyed WHERE okey = '<region:2>'",
    )

    q["graph_with_subj_pred"] = (
        lambda spark, sf: graph(spark, sf)
        .where((F.col("subject") == "nation:7") & (F.col("predicate") == "kg:name"))
        .select("object_value"),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT object_value FROM keyed
        WHERE subject = 'nation:7' AND predicate = 'kg:name'
        """,
    )

    q["graph_with_pred_obj"] = (
        lambda spark, sf: graph(spark, sf)
        .where(
            (F.col("predicate") == "rdf:type") & (F.col("okey") == "<kg:Nation>")
        )
        .select("subject"),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT subject FROM keyed
        WHERE predicate = 'rdf:type' AND okey = '<kg:Nation>'
        """,
    )

    q["graph_with_subj_obj"] = (
        lambda spark, sf: graph(spark, sf)
        .where(
            (F.col("subject") == "nation:7") & (F.col("okey") == "<region:2>")
        )
        .select("predicate"),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT predicate FROM keyed
        WHERE subject = 'nation:7' AND okey = '<region:2>'
        """,
    )

    q["graph_contains"] = (
        # membership by canonical key (Contains, Q7), as a count so the
        # result is deterministic relational data
        lambda spark, sf: graph(spark, sf)
        .where(F.col("tkey") == '<nation:7><rdf:type><kg:Nation>')
        .agg(F.count(F.lit(1)).alias("present")),
        TPCH_TRIPLES_SQL
        + """
        SELECT count(*) AS present FROM (SELECT DISTINCT tkey FROM keyed)
        WHERE tkey = '<nation:7><rdf:type><kg:Nation>'
        """,
    )

    q["graph_remove"] = (
        # Remove = left-anti join on tkey (U2): drop all rdf:type triples
        lambda spark, sf: (
            lambda g: g.join(
                g.where(F.col("predicate") == "rdf:type").select("tkey"),
                on="tkey",
                how="left_anti",
            ).select("subject", "predicate", "object_value")
        )(graph(spark, sf)),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT subject, predicate, object_value FROM keyed
        WHERE tkey NOT IN (SELECT tkey FROM keyed WHERE predicate = 'rdf:type')
        """,
    )

    q["graph_add_dedup"] = (
        # Add is idempotent: union the melt with itself -> same count (U1/A1)
        lambda spark, sf: dedup_triples(
            tpch_graph_triples(spark, sf).unionByName(
                tpch_graph_triples(spark, sf)
            )
        ).agg(F.count(F.lit(1)).alias("n")),
        TPCH_TRIPLES_SQL
        + """
        SELECT count(*) AS n FROM (
          SELECT DISTINCT tkey FROM (
            SELECT tkey FROM keyed UNION ALL SELECT tkey FROM keyed
          )
        )
        """,
    )

    q["graph_sort_desc"] = (
        # Triples.Sort: descending canonical key (O1). Driver hashing is
        # order-insensitive, so expose the rank as data.
        lambda spark, sf: graph(spark, sf)
        .select("tkey")
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("tkey")))),
        TPCH_TRIPLES_SQL
        + """
        SELECT tkey, CAST(row_number() OVER (ORDER BY tkey DESC) AS INT) AS rank
        FROM (SELECT DISTINCT tkey FROM keyed)
        """,
    )

    q["nt_encode"] = (
        # S8: NT encoding as data (context-free form)
        lambda spark, sf: graph(spark, sf).select(
            _nt_encode_expr().alias("line")
        ),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT
          '<' || subject || '> <' || predicate || '> ' ||
          (CASE WHEN object_kind = 'res' THEN '<' || object_value || '>'
                WHEN object_kind = 'bnode' THEN '_:' || object_value
                WHEN object_lang <> ''
                  THEN '"' || object_value || '"@' || object_lang
                WHEN object_type = 'xsd:string'
                  THEN '"' || object_value || '"'
                ELSE '"' || object_value || '"^^<' || object_type || '>'
          END) || ' .' AS line
        FROM keyed
        """,
    )

    return q
