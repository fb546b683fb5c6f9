"""Streaming ingest: exactly-once NT file ingest with dedup merge."""

import os

from triplestore_spark.dsl import subj_pred, triples_to_df
from triplestore_spark.sources.ntriples import encode_triples
from triplestore_spark.streaming.ingest import stream_into_source


def test_stream_ingest_dedup_and_resume(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table_dir = str(tmp_path / "table")
    cp_dir = str(tmp_path / "cp")

    t1 = subj_pred("s1", "p").integer_literal(1)
    t2 = subj_pred("s2", "p").integer_literal(2)
    t3 = subj_pred("s3", "p").integer_literal(3)

    (in_dir / "a.nt").write_text(encode_triples(triples_to_df(spark, [t1, t2])))

    q = stream_into_source(spark, str(in_dir), table_dir, cp_dir)
    q.awaitTermination(120)

    out = spark.read.parquet(os.path.join(table_dir, "triples.parquet"))
    assert {r["tkey"] for r in out.select("tkey").collect()} == {
        t1.tkey(),
        t2.tkey(),
    }

    # second file arrives: overlap (t2) + new (t3); resume from the
    # same checkpoint -> only the new file is read, dedup-merge keeps
    # the table canonical
    (in_dir / "b.nt").write_text(encode_triples(triples_to_df(spark, [t2, t3])))
    q2 = stream_into_source(spark, str(in_dir), table_dir, cp_dir)
    q2.awaitTermination(120)

    out2 = spark.read.parquet(os.path.join(table_dir, "triples.parquet"))
    keys = [r["tkey"] for r in out2.select("tkey").collect()]
    assert sorted(keys) == sorted({t1.tkey(), t2.tkey(), t3.tkey()})
