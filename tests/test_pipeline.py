"""Pipeline correctness: span invariant + P/R vs the pure-Python oracle."""

import pytest
from pyspark.sql import functions as F

from triplestore_spark.pipeline.corpus import (
    build_corpus,
    read_documents,
    reassemble_text,
)
from triplestore_spark.pipeline.oracle import (
    oracle_corpus_triples,
    oracle_spans,
    precision_recall,
)
from triplestore_spark.pipeline.run import run_pipeline


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_documents(spark, sf_dir).cache()


def test_span_sequence_invariant(spark, docs):
    """Per-row span-sequence equality (kind, text, media_ref, order)
    vs the oracle corpus builder (BASELINE.json input_hint)."""
    corpus = build_corpus(docs)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in corpus.collect()
    }
    for row in docs.collect():
        want = oracle_spans(row["doc_id"], row["text"])
        assert got[f"doc:{row['doc_id']}"] == want, row["doc_id"]


def test_reassembly_identity(spark, docs):
    """Spans must reassemble to the exact original text — extraction
    never reorders or drops content."""
    corpus = build_corpus(docs)
    re_df = reassemble_text(corpus).withColumnRenamed("text", "rebuilt")
    joined = docs.select(
        F.concat(F.lit("doc:"), "doc_id").alias("doc_id"), "text"
    ).join(re_df, "doc_id")
    mismatches = joined.where(F.col("text") != F.col("rebuilt")).count()
    assert mismatches == 0


def test_pipeline_pr_vs_oracle(spark, docs, sf_dir):
    """P/R >= 0.95 of emitted (s,p,o) triples vs reference triples
    (BASELINE.json north_rule). Ours should be exactly 1.0/1.0."""
    canon = run_pipeline(spark, sf_dir)
    got = {
        (
            r["subject"],
            r["predicate"],
            r["object_kind"],
            r["object_value"],
            r["object_type"],
            r["object_lang"],
        )
        for r in canon.collect()
    }
    want = oracle_corpus_triples([r.asDict() for r in docs.collect()])
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert (p, r) == (1.0, 1.0)


def test_pipeline_dedup_is_canonical(spark, sf_dir):
    canon = run_pipeline(spark, sf_dir)
    assert canon.count() == canon.select("tkey").distinct().count()


def test_salted_strategy_same_result(spark, sf_dir):
    a = run_pipeline(spark, sf_dir, strategy="broadcast")
    b = run_pipeline(spark, sf_dir, strategy="salted")
    assert a.select("tkey").exceptAll(b.select("tkey")).isEmpty()
    assert b.select("tkey").exceptAll(a.select("tkey")).isEmpty()


def test_no_python_udf_in_plan(spark, sf_dir):
    """The extract/resolve hot path must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython / mapInPandas nodes."""
    canon = run_pipeline(spark, sf_dir)
    plan = canon._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow", "MapInPandas"):
        assert marker not in plan, f"{marker} found in physical plan"
