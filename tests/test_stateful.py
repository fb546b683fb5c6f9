"""applyInPandasWithState: running per-subject counts survive across
restarts via the state store."""

from triplestore_spark.dsl import subj_pred, triples_to_df
from triplestore_spark.sources.ntriples import encode_triples
from triplestore_spark.streaming.stateful import stream_running_counts


def test_running_counts_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    (in_dir / "a.nt").write_text(
        encode_triples(
            triples_to_df(
                spark,
                [
                    subj_pred("s1", "p").integer_literal(1),
                    subj_pred("s1", "q").integer_literal(2),
                    subj_pred("s2", "p").integer_literal(3),
                ],
            )
        )
    )
    q = stream_running_counts(spark, str(in_dir), out_dir, cp)
    q.awaitTermination(180)

    first = {
        r["subject"]: r["total_triples"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first == {"s1": 2, "s2": 1}

    # second file: s1 gains one more; state must carry the prior 2
    (in_dir / "b.nt").write_text(
        encode_triples(
            triples_to_df(spark, [subj_pred("s1", "r").integer_literal(4)])
        )
    )
    q2 = stream_running_counts(spark, str(in_dir), out_dir, cp)
    q2.awaitTermination(180)

    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        b = r["batch_id"]
        if r["subject"] not in latest or latest[r["subject"]][0] < b:
            latest[r["subject"]] = (b, r["total_triples"])
    assert latest["s1"][1] == 3  # 2 + 1, via persisted state
    assert latest["s2"][1] == 1