"""Two-parallelism scaling harness (north_rule evidence).

No real cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the IDENTICAL job on the IDENTICAL
input at local[8] (N) and local[32] (4N) and reporting throughput at
both plus efficiency = T(4N) / (4 * T(N)).

The sf0.1 corpus is small enough that Spark's fixed costs (session,
stage scheduling) dominate; to measure the scalable portion the
harness replicates the documents input REPLICATE times with disjoint
doc_id ranges (deterministic; done identically for both runs), which
multiplies the triple count without changing per-row work.

Each config runs in its own subprocess (a JVM can't change master).

Usage: python tools/bench_scaling.py [--replicate K] [--sf SF_DIR]
Writes/updates BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, sf_dir: str, replicate: int) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from triplestore_spark.session import get_spark
from triplestore_spark.operators.materialize import materialize_graph
from triplestore_spark.functions.keys import with_keys
from triplestore_spark.operators.graph import dedup_triples
from triplestore_spark.pipeline.run import candidate_triples
from triplestore_spark.pipeline.corpus import read_documents
import tempfile, shutil

spark = get_spark("scaling-bench", cpus={cpus}, shuffle_partitions={max(cpus,16)})
spark.sparkContext.setLogLevel("ERROR")

docs = read_documents(spark, {sf_dir!r})
n_docs_base = docs.count()  # warms input + gives scale facts
if {replicate} > 1:
    # repartition BEFORE the replicating crossJoin: the base table is
    # one parquet split, and inflating it in a single task would
    # serialize the whole corpus build
    docs = docs.repartition({2 * cpus})
    # disjoint doc_id ranges per replica -> no artificial dedup collapse
    reps = spark.range({replicate}).select(F.col("id").alias("rep"))
    docs = docs.crossJoin(F.broadcast(reps)).withColumn(
        "doc_id", F.col("doc_id") + F.col("rep") * 100000000
    ).drop("rep")

out = tempfile.mkdtemp(prefix="ts_scale_")
with open("/proc/loadavg") as f:
    load = f.read().split()[0]
t0 = time.time()
canon = dedup_triples(with_keys(candidate_triples(spark, docs)))
materialize_graph(canon, out + "/g", force=True)
elapsed = time.time() - t0
import glob
n = json.load(open(out + "/g/_manifest.json"))["fingerprint"]["count"]
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": {cpus}, "sec": round(elapsed,2),
    "triples": n, "tps": round(n/elapsed,1), "docs": n_docs_base*{replicate},
    "loadavg_at_start": load}}))
"""
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"run cpus={cpus} failed")


def best_of(k: int, cpus: int, sf_dir: str, replicate: int) -> dict:
    runs = [run_one(cpus, sf_dir, replicate) for _ in range(k)]
    return min(runs, key=lambda r: r["sec"]) | {
        "all_secs": [r["sec"] for r in runs]
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n-cpus", type=int, default=4,
                    help="N (4N is derived); default 4 vs 16 because "
                    "this sandbox carries ~8 cores of background load")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    n = best_of(args.repeats, args.n_cpus, args.sf, args.replicate)
    n4 = best_of(args.repeats, args.n_cpus * 4, args.sf, args.replicate)
    eff = round(n4["tps"] / (4 * n["tps"]), 3)
    summary = {
        "metric": "triples/sec end-to-end extract->canonicalize->materialize",
        "input": {"sf_dir": args.sf, "replicate": args.replicate,
                  "docs": n["docs"], "triples": n["triples"]},
        "N": n,
        "4N": n4,
        "scaling_efficiency": eff,
        "criterion": "efficiency >= 0.8",
        "pass": eff >= 0.8,
        "loadavg_before": load_before,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — scaling evidence (north_rule)

Job: the full flagship pipeline — build interleaved corpus ->
extract (mentions/media/metadata) -> broadcast-resolve -> tkey dedup
-> materialize SPO/POS/OSP sorted parquet. Identical job, identical
input, two parallelism levels (sandbox proxy for N vs 4N executors;
best of {args.repeats} runs per config).

Input: {args.sf} documents replicated x{args.replicate} with disjoint
doc_id ranges = {n['docs']} docs -> {n['triples']} canonical triples.

Environment caveat: this sandbox shares its 32 CPUs with ~8 cores of
background load (loadavg {load_before} before the runs) and shows
heavy run-to-run variance; N={args.n_cpus} vs 4N={args.n_cpus * 4}
keeps the 4N run inside the idle-core budget so the measurement
reflects the job, not tenancy contention.

| config | wall sec (best) | all runs | triples/s |
|---|---|---|---|
| local[{args.n_cpus}]  (N)  | {n['sec']} | {n['all_secs']} | {n['tps']} |
| local[{args.n_cpus * 4}] (4N) | {n4['sec']} | {n4['all_secs']} | {n4['tps']} |

**Scaling efficiency T(4N) / (4 * T(N)) = {eff}** (criterion >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Reference single-process context (BASELINE.md): ~1-2 M triples/s codec,
~0.9 M triples/s snapshot index build on 100k triples — in-memory
codec loops; our end-to-end number includes 4 shuffles and 3 sorted
parquet writes. See bench.py's codec microbenches for the
apples-to-apples codec comparison.

Generated by tools/bench_scaling.py on {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
