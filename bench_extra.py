"""Extra benchmarks: noop-sink isolation + phase decomposition.

`bench.py` is FROZEN for the driver's measurement; this file exists so
optimization work can time each phase of the headline queries without
the sink/collect cost mixed in (spark_optimization_guide.md §1.4) and
without touching the frozen harness. Prints ONE JSON line with a
distinct metric name.

Phases:
  p_read_repart   documents scan + conditional round-robin repartition
  p_candidates    extraction only (mentions+media+metadata), noop sink
  p_dedup_noop    extract -> dedup (full canonical set), noop sink
  q1_count        the frozen q1 shape (count action)
  p_fingerprint   dedup -> cache -> graph_fingerprint (q2's first half)
  p_writes_incl_fp  materialize_graph off a warm cache: the in-call
                    fingerprint pass plus the three sorted layout writes
  q5_noop         kg_entity_degree, noop sink
  q4_noop         tpch melt dedup, noop sink
  q6_encode       frozen shape (max(length) forcing)
  q7_decode_noop  decode of cached lines, noop sink
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from pyspark.sql import functions as F

    from triplestore_spark.session import get_spark

    spark = get_spark(
        "triplestore-bench-extra", cpus=cpus, shuffle_partitions=max(cpus, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.operators.materialize import (
        graph_fingerprint,
        materialize_graph,
    )
    from triplestore_spark.pipeline.corpus import read_documents
    from triplestore_spark.pipeline.run import candidate_triples, run_pipeline
    from triplestore_spark.queries import registry, tpch_graph_triples
    from triplestore_spark.sources.ntriples import decode_lines_df, nt_encode_expr

    timings: dict[str, float] = {}
    load_start = round(os.getloadavg()[0], 2)

    def timed(name, fn):
        runs = []
        for i in range(reps):
            if i:
                time.sleep(0.2)
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(runs), 3)

    # warmup: same shape as bench.py
    docs_warm = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).limit(50)
    dedup_triples(candidate_triples(spark, docs_warm)).count()
    _warm = dedup_triples(candidate_triples(spark, docs_warm)).select(
        nt_encode_expr().alias("value")
    )
    decode_lines_df(_warm).count()

    timed("p_read_repart", lambda: noop(read_documents(spark, sf_dir)))
    timed(
        "p_candidates",
        lambda: noop(candidate_triples(spark, read_documents(spark, sf_dir))),
    )
    timed("p_dedup_noop", lambda: noop(run_pipeline(spark, sf_dir)))
    timed("q1_count", lambda: run_pipeline(spark, sf_dir).count())

    def fingerprint_once():
        canon = run_pipeline(spark, sf_dir).cache()
        graph_fingerprint(canon)
        canon.unpersist()

    timed("p_fingerprint", fingerprint_once)

    out_dir = tempfile.mkdtemp(prefix="ts_bx_")
    try:
        canon = run_pipeline(spark, sf_dir).cache()
        graph_fingerprint(canon)  # warm the cache once, untimed

        def writes_once():
            materialize_graph(canon, os.path.join(out_dir, "g"), force=True)

        timed("p_writes_incl_fp", writes_once)
        canon.unpersist()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    reg = registry()
    timed("q5_noop", lambda: noop(reg["kg_entity_degree"][0](spark, sf_dir)))
    timed(
        "q4_noop",
        lambda: noop(
            tpch_graph_triples(spark, sf_dir).dropDuplicates(["tkey"])
        ),
    )

    canon_cached = run_pipeline(spark, sf_dir).cache()
    n = canon_cached.count()
    timed(
        "q6_encode",
        lambda: canon_cached.select(nt_encode_expr().alias("value"))
        .agg(F.max(F.length("value")))
        .collect(),
    )
    lines_cached = canon_cached.select(nt_encode_expr().alias("value")).cache()
    lines_cached.count()
    timed("q7_decode_noop", lambda: noop(decode_lines_df(lines_cached)))
    canon_cached.unpersist()
    lines_cached.unpersist()

    print(
        json.dumps(
            {
                "metric": "kg_pipeline_bench_phases",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "loadavg_start": load_start,
                "loadavg_end": round(os.getloadavg()[0], 2),
                "sf": sf,
                "triples": n,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
