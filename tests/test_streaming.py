"""Streaming ingest: exactly-once NT file ingest with dedup merge."""

import glob
import os

from pyspark.sql import functions as F

from triplestore_spark.dsl import subj_pred, triples_to_df
from triplestore_spark.sources.ntriples import encode_triples
from triplestore_spark.streaming.ingest import (
    _BUCKET,
    bucket_expr,
    compact_sink,
    fs_exists,
    merge_batch_into_sink,
    read_sink,
    stream_into_source,
)


def _batch(spark, ids):
    return triples_to_df(
        spark, [subj_pred(f"s{i}", "p").integer_literal(i) for i in ids]
    )


def test_merge_batch_idempotent_and_bucketed(spark, tmp_path):
    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(50)), path, n_buckets=8)
    merge_batch_into_sink(_batch(spark, range(25, 75)), path, n_buckets=8)
    # replay: a re-delivered batch must collapse entirely
    merge_batch_into_sink(_batch(spark, range(25, 75)), path, n_buckets=8)

    out = spark.read.parquet(path)
    assert out.count() == 75
    assert out.select("tkey").distinct().count() == 75
    # sink is physically partitioned by the tkey hash bucket
    assert glob.glob(os.path.join(path, f"{_BUCKET}=*"))


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    """The anti-join's 'existing' side must carry a partition filter
    on the bucket column — per-batch read volume then scales with the
    batch's bucket fan-out, NOT total sink size (round 1 re-read the
    whole sink every micro-batch)."""
    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(200)), path, n_buckets=16)

    batch = _batch(spark, [3]).withColumn(_BUCKET, bucket_expr(16))
    touched = [r[0] for r in batch.select(_BUCKET).distinct().collect()]
    assert len(touched) == 1

    pruned = spark.read.parquet(path).where(F.col(_BUCKET).isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    after = plan.split("PartitionFilters")[1][:300]
    assert _BUCKET in after, plan
    # physical evidence: the sink has >1 bucket dir, the batch touches 1
    dirs = glob.glob(os.path.join(path, f"{_BUCKET}=*"))
    assert len(dirs) > 1


def test_compact_sink_reduces_fragments(spark, tmp_path):
    path_dir = tmp_path / "table"
    data_path = str(path_dir / "triples.parquet")
    for lo in range(0, 60, 20):  # 3 append batches -> >=3 fragments
        merge_batch_into_sink(_batch(spark, range(lo, lo + 20)), data_path)

    before = read_sink(spark, str(path_dir))
    before_keys = sorted(r["tkey"] for r in before.select("tkey").collect())

    def frag_count():
        return len(glob.glob(os.path.join(data_path, "*", "*.parquet")))

    frags_before = frag_count()
    compact_sink(spark, str(path_dir), files_per_bucket=1)
    assert frag_count() < frags_before

    after = read_sink(spark, str(path_dir))
    assert sorted(r["tkey"] for r in after.select("tkey").collect()) == before_keys
    assert not fs_exists(spark, data_path + "._compacting")
    assert not fs_exists(spark, data_path + "._old")


def test_stream_compacts_on_cadence(spark, tmp_path):
    """With compact_every=1 the second micro-batch (batch_id=1...)
    triggers compaction: contents unchanged, fragments bounded."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table_dir = str(tmp_path / "table")
    cp_dir = str(tmp_path / "cp")

    (in_dir / "a.nt").write_text(
        encode_triples(_batch(spark, range(10)))
    )
    q = stream_into_source(spark, str(in_dir), table_dir, cp_dir,
                           compact_every=1)
    q.awaitTermination(120)
    (in_dir / "b.nt").write_text(
        encode_triples(_batch(spark, range(5, 15)))
    )
    q2 = stream_into_source(spark, str(in_dir), table_dir, cp_dir,
                            compact_every=1)
    q2.awaitTermination(120)

    out = read_sink(spark, table_dir)
    assert out.select("tkey").distinct().count() == 15
    data_path = os.path.join(table_dir, "triples.parquet")
    assert not fs_exists(spark, data_path + "._compacting")
    assert not fs_exists(spark, data_path + "._old")


def test_fs_exists_storage_agnostic(spark, tmp_path):
    assert not fs_exists(spark, str(tmp_path / "nope"))
    (tmp_path / "yes").mkdir()
    assert fs_exists(spark, str(tmp_path / "yes"))


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
