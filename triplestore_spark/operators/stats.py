"""VoID-style dataset statistics (W3C "Vocabulary of Interlinked
Datasets" — the ecosystem-standard graph summary every public RDF
dataset publishes; the reference has no analog, its Count is the
whole surface).

Three summaries, each a single aggregation pass shaped for scale:

- `void_summary`: one row — triples, distinct subjects / predicates /
  objects, class count. Distinct counts are exact by default; at
  100 TB pass `exact=False` to switch every distinct to
  `approx_count_distinct` (HyperLogLog++, one pass, no
  count-distinct expand).
- `property_partition`: per predicate — triples, distinct subjects,
  distinct objects (VoID propertyPartition). One groupBy(predicate);
  with `exact=True` Catalyst plans the multi-distinct via expand,
  still a single shuffle keyed on the (low-cardinality) predicate.
- `class_partition`: per rdf:type class — entity count (VoID
  classPartition). One filtered groupBy; the filter is a component
  predicate that pushes onto a materialized POS layout's stats.

`type_predicates` defaults to both spellings this engine encounters:
the compact 'rdf:type' its own corpora store and the full
rdf-syntax-ns IRI external Turtle/NT files carry.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triplestore_spark.schema import KIND_RESOURCE

RDF_TYPE_FORMS = (
    "rdf:type",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    "a",
)


def _df(graph) -> DataFrame:
    return graph.df if hasattr(graph, "df") else graph


def _okey(df: DataFrame):
    if "okey" in df.columns:
        return F.col("okey")
    from triplestore_spark.functions.keys import okey_expr

    return okey_expr()


def _distinct(col, exact: bool):
    return F.count_distinct(col) if exact else F.approx_count_distinct(col)


def void_summary(
    graph,
    exact: bool = True,
    type_predicates: Sequence[str] = RDF_TYPE_FORMS,
) -> DataFrame:
    """One-row dataset summary (VoID triples / distinctSubjects /
    properties / distinctObjects / classes)."""
    df = _df(graph)
    is_class = F.col("predicate").isin(list(type_predicates)) & (
        F.col("object_kind") == KIND_RESOURCE
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_triples"),
        _distinct(F.col("subject"), exact).alias("n_subjects"),
        _distinct(F.col("predicate"), exact).alias("n_predicates"),
        _distinct(_okey(df), exact).alias("n_objects"),
        _distinct(
            F.when(is_class, F.col("object_value")), exact
        ).alias("n_classes"),
    )


def property_partition(graph, exact: bool = True) -> DataFrame:
    """Per-predicate partition stats -> (predicate, n_triples,
    n_subjects, n_objects), predicate-sorted."""
    df = _df(graph)
    return (
        df.groupBy("predicate")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            _distinct(F.col("subject"), exact).alias("n_subjects"),
            _distinct(_okey(df), exact).alias("n_objects"),
        )
        .orderBy("predicate")
    )


def class_partition(
    graph, type_predicates: Sequence[str] = RDF_TYPE_FORMS
) -> DataFrame:
    """Per-class entity counts -> (cls, n_entities). An entity
    counts once per class even with duplicate type triples."""
    df = _df(graph)
    return (
        df.where(
            F.col("predicate").isin(list(type_predicates))
            & (F.col("object_kind") == KIND_RESOURCE)
        )
        .select(F.col("object_value").alias("cls"), "subject")
        .distinct()
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy("cls")
    )
