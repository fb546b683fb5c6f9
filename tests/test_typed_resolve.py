"""Typed column views (F6) + fuzzy ER / link-score UDF (X4)."""

import pytest
from pyspark.sql import functions as F

from triplestore_spark.dsl import subj_pred, triples_to_df
from triplestore_spark.functions.typed import parse_typed_col, strict_parse_typed


def test_parse_typed_col(spark):
    df = triples_to_df(
        spark,
        [
            subj_pred("a", "p").integer_literal(42),
            subj_pred("b", "p").string_literal("42"),
            subj_pred("c", "p").boolean_literal(True),
        ],
    )
    out = df.select(
        "subject",
        parse_typed_col("object_value", "object_type", "xsd:integer").alias("v"),
    ).collect()
    vals = {r["subject"]: r["v"] for r in out}
    assert vals == {"a": 42, "b": None, "c": None}


def test_parse_typed_long_form_accepted(spark):
    from triplestore_spark.dsl import lit_typed

    df = triples_to_df(
        spark,
        [
            subj_pred("a", "p").object(
                lit_typed("7", "http://www.w3.org/2001/XMLSchema#integer")
            )
        ],
    )
    v = df.select(
        parse_typed_col("object_value", "object_type", "xsd:integer").alias("v")
    ).first()["v"]
    assert v == 7


def test_strict_parse_raises_like_reference(spark):
    df = triples_to_df(spark, [subj_pred("a", "p").integer_literal(1)])
    with pytest.raises(ValueError, match="literal is not an xsd:boolean but"):
        strict_parse_typed(df, "xsd:boolean")


def test_datetime_typed_view(spark):
    from datetime import datetime, timezone

    df = triples_to_df(
        spark,
        [
            subj_pred("a", "p").datetime_literal(
                datetime(2009, 2, 1, 2, 53, 9, tzinfo=timezone.utc)
            )
        ],
    )
    v = df.select(
        parse_typed_col("object_value", "object_type", "xsd:dateTime").alias("v")
    ).first()["v"]
    assert v.year == 2009 and v.month == 2


def test_fuzzy_resolution(spark):
    from triplestore_spark.pipeline.resolve import (
        gazetteer_df,
        resolve_mentions_fuzzy,
    )

    mentions = spark.createDataFrame(
        [("doc:1", "spark"), ("doc:1", "sprk"), ("doc:2", "tble"),
         ("doc:2", "zzz")],
        ["doc_id", "surface"],
    )
    out = resolve_mentions_fuzzy(mentions, gazetteer_df(spark), min_score=0.4)
    got = {(r["subject"], r["object_value"]) for r in out.collect()}
    # exact 'spark' and typo 'sprk' resolve to kg:ent/spark; 'tble'
    # (shares 'tb'? no — blocking on first char 't' -> 'table',
    # dice('tble','table') = bigrams {tb,bl,le} vs {ta,ab,bl,le} = 2*2/7)
    assert ("doc:1", "kg:ent/spark") in got
    assert ("doc:2", "kg:ent/table") in got
    assert not any(s == "zzz" for _, s in got)


def test_link_score_values(spark):
    from triplestore_spark.pipeline.resolve import link_score_udf

    df = spark.createDataFrame(
        [("spark", "spark"), ("sprk", "spark"), ("a", "b")], ["m", "c"]
    )
    rows = df.select(
        "m", link_score_udf()(F.col("m"), F.col("c")).alias("s")
    ).collect()
    scores = {r["m"]: r["s"] for r in rows}
    assert scores["spark"] == 1.0
    assert 0.4 < scores["sprk"] < 1.0
    assert scores["a"] == 0.0