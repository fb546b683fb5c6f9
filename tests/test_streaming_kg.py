"""Streaming KG construction (streaming/kg.py): micro-batched
extract -> resolve -> dedup-merge must equal the batch flagship
pipeline over the union of all ingested files — exactly once, across
batch boundaries, resume, and cross-file duplicate documents."""

import os

import pytest

from triplestore_spark.streaming.ingest import read_sink
from triplestore_spark.streaming.kg import stream_documents_into_kg


@pytest.fixture()
def doc_files(spark, sf_dir, tmp_path):
    """Split the sf documents table into three parquet files (plus a
    duplicated slice) under a streaming input dir."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    a = docs.where("doc_id % 3 = 0")
    b = docs.where("doc_id % 3 = 1")
    c = docs.where("doc_id % 3 = 2")
    for name, part in (("a", a), ("b", b)):
        part.coalesce(1).write.parquet(str(tmp_path / f"stage_{name}"))
        _move_single_file(tmp_path / f"stage_{name}", in_dir / f"{name}.parquet")
    return in_dir, c, docs


def _move_single_file(stage_dir, dest):
    [f] = [p for p in stage_dir.iterdir() if p.name.endswith(".parquet")]
    f.rename(dest)


def test_streaming_kg_equals_batch_pipeline(spark, sf_dir, tmp_path, doc_files):
    in_dir, c, docs = doc_files
    table_dir = str(tmp_path / "kg")
    cp_dir = str(tmp_path / "cp")

    # two files -> one availableNow run, one file per micro-batch
    q = stream_documents_into_kg(
        spark, str(in_dir), table_dir, cp_dir, max_files_per_trigger=1
    )
    q.awaitTermination(180)

    got = read_sink(spark, table_dir)

    from triplestore_spark.functions.keys import with_keys
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.pipeline.run import candidate_triples

    two_thirds = docs.where("doc_id % 3 < 2")
    want = dedup_triples(candidate_triples(spark, two_thirds))
    got_keys = sorted(r["tkey"] for r in got.select("tkey").collect())
    want_keys = sorted(r["tkey"] for r in want.select("tkey").collect())
    assert got_keys == want_keys and len(got_keys) > 0

    # resume: third slice arrives PLUS a byte-identical duplicate of
    # slice a (same doc_ids -> same triples); the sink must equal the
    # batch pipeline over the full table, the duplicate a no-op
    c.coalesce(1).write.parquet(str(tmp_path / "stage_c"))
    _move_single_file(tmp_path / "stage_c", in_dir / "c.parquet")
    a_df = spark.read.parquet(str(in_dir / "a.parquet"))
    a_df.coalesce(1).write.parquet(str(tmp_path / "stage_a2"))
    _move_single_file(tmp_path / "stage_a2", in_dir / "a_again.parquet")

    q2 = stream_documents_into_kg(
        spark, str(in_dir), table_dir, cp_dir, max_files_per_trigger=1
    )
    q2.awaitTermination(180)

    got2 = read_sink(spark, table_dir)
    want_all = dedup_triples(candidate_triples(spark, docs))
    got2_keys = sorted(r["tkey"] for r in got2.select("tkey").collect())
    want_all_keys = sorted(
        r["tkey"] for r in want_all.select("tkey").collect()
    )
    assert got2_keys == want_all_keys
    # exactly-once: no duplicate canonical keys in the sink
    assert len(got2_keys) == len(set(got2_keys))

    # the streamed KG answers the query surface like any other graph:
    # BGP over the sink (keyed at scan time by read_sink? -> with_keys)
    from triplestore_spark.operators.bgp import bgp_match

    kg = with_keys(got2)
    pairs = bgp_match(
        kg, [("?d", "kg:mentions", "?e"), ("?d", "rdf:type", "kg:Document")]
    )
    assert pairs.count() > 0

    # lineage metrics: one row per committed micro-batch (4 input
    # files => 4 batches at maxFilesPerTrigger=1), doc counts summing
    # to the files' row counts (the duplicate slice counts as docs
    # READ even though its triples were all dropped by the merge)
    from triplestore_spark.streaming.kg import read_batch_metrics

    m = read_batch_metrics(spark, table_dir).orderBy("batch_id")
    rows = m.collect()
    assert [r["batch_id"] for r in rows] == [0, 1, 2, 3]
    n_docs_files = docs.count() + docs.where("doc_id % 3 = 0").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_files
    assert all(r["n_candidate_triples"] > 0 for r in rows)


def test_streaming_kg_crash_after_commit_replays_idempotently(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The worst failure point: the micro-batch's sink append COMMITS,
    then the driver dies before the WAL marks the batch done. On
    restart Spark replays the batch; the tkey anti-join merge must
    absorb the duplicate append bit-exactly."""
    import triplestore_spark.streaming.kg as kg_mod
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.pipeline.run import candidate_triples

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    docs.coalesce(1).write.parquet(str(tmp_path / "stage"))
    [f] = [p for p in (tmp_path / "stage").iterdir()
           if p.name.endswith(".parquet")]
    f.rename(in_dir / "docs.parquet")

    table_dir = str(tmp_path / "kg")
    cp_dir = str(tmp_path / "cp")

    real_merge = kg_mod.merge_batch_into_sink
    crashed = {"done": False}

    def merge_then_crash(batch_df, data_path, *a, **kw):
        real_merge(batch_df, data_path, *a, **kw)
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash AFTER sink commit")

    monkeypatch.setattr(kg_mod, "merge_batch_into_sink", merge_then_crash)
    q = stream_documents_into_kg(spark, str(in_dir), table_dir, cp_dir)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        # availableNow surfaces the foreachBatch error on the query
        q.processAllAvailable()
    assert crashed["done"]
    # sink already holds the batch's triples; WAL never committed it
    monkeypatch.setattr(kg_mod, "merge_batch_into_sink", real_merge)

    q2 = stream_documents_into_kg(spark, str(in_dir), table_dir, cp_dir)
    q2.awaitTermination(180)

    got = sorted(
        r["tkey"]
        for r in read_sink(spark, table_dir).select("tkey").collect()
    )
    want = sorted(
        r["tkey"]
        for r in dedup_triples(candidate_triples(spark, docs))
        .select("tkey")
        .collect()
    )
    assert got == want and len(got) == len(set(got)) > 0


def test_streamed_kg_materializes_and_answers_layout_routed_bgp(
    spark, sf_dir, tmp_path
):
    """The full round-5 story in one flow: stream documents into the
    KG sink, materialize the three sorted layouts from it, and answer
    a conjunctive BGP whose patterns route to SPO and POS — equal to
    the same BGP over the in-memory batch pipeline graph."""
    from triplestore_spark.operators.bgp import bgp_match
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.operators.materialize import (
        MaterializedGraph,
        materialize_graph,
    )
    from triplestore_spark.pipeline.run import candidate_triples

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    docs.coalesce(1).write.parquet(str(tmp_path / "stage"))
    [f] = [p for p in (tmp_path / "stage").iterdir()
           if p.name.endswith(".parquet")]
    f.rename(in_dir / "docs.parquet")

    table_dir = str(tmp_path / "kg")
    q = stream_documents_into_kg(
        spark, str(in_dir), table_dir, str(tmp_path / "cp")
    )
    q.awaitTermination(180)

    mat_dir = str(tmp_path / "mat")
    materialize_graph(read_sink(spark, table_dir), mat_dir,
                      num_partitions=4)
    g = MaterializedGraph(spark, mat_dir)
    pats = [
        ("doc:7", "?p", "?o"),            # SPO route
        ("?d", "kg:mentions", "?o"),      # POS route
    ]
    got = bgp_match(g, pats)
    files = "\n".join(got.inputFiles())
    assert "/spo/" in files and "/pos/" in files
    want = bgp_match(
        dedup_triples(candidate_triples(spark, docs)), pats
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b and len(a) > 0
