"""Two-cluster-size scaling harness (north_rule evidence).

No real cluster exists in this sandbox; the N -> 4N criterion is
evidenced by the identical job on the identical input at local[C] (N)
vs local[4C] (4N) with a HARDWARE CALIBRATION step, because this VM
throttles per-core speed as occupancy rises (measured: a pure-CPU
loop runs 1.47x slower when 15 other cores are busy than solo —
hypervisor frequency/steal throttling, visible in /proc/stat steal).
On a real cluster 4N executors add 4x machines at constant per-core
speed; on this box they can't, so the harness reports:

  raw_efficiency        = T(4N) / (4 * T(N))
  hardware_ceiling      = percore(4C busy) / percore(C busy)
                          (max efficiency ANY perfectly-parallel job
                          can reach on this box, by calibration spin)
  normalized_efficiency = raw_efficiency / hardware_ceiling

Alternatives measured and rejected (2026-08-16): local-cluster
executor JVMs add loopback-shuffle serialization that distorts the
other direction (eff 0.37); threads in one JVM are the cleanest proxy
available here.

Usage: python tools/bench_scaling.py [--replicate K] [--sf DIR]
       [--n-cpus C] [--repeats R]
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CALIB_WORK = "x=0\nfor i in range(30_000_000): x+=i"

# Memory-bandwidth probe: a shuffle/sort/parquet job is bandwidth-bound
# for much of its time, and DRAM bandwidth is SHARED across cores in
# one box — the ALU loop above can't see that contention (round-4
# finding: the job's own CPU-seconds inflate 1.38x from 4->16 busy
# cores while the ALU probe inflates only ~1.06x). On a real cluster
# 4N executors bring 4x the memory bandwidth; in one box they don't.
_MEM_WORK = """
import numpy as np, time
a = np.ones(12_500_000); b = np.empty(12_500_000)  # 100 MB each
t0 = time.time()
for _ in range(20):
    b[:] = a; a[:] = b
print(time.time() - t0)
"""
_MEM_SPIN = """
import numpy as np
a = np.ones(12_500_000); b = np.empty(12_500_000)
while True:
    b[:] = a; a[:] = b
"""


def _timed_loop() -> float:
    t0 = time.time()
    exec(compile(_CALIB_WORK, "w", "exec"), {})
    return time.time() - t0


def _spinners(n: int, code: str):
    return [
        subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.DEVNULL
        )
        for _ in range(n)
    ]


def _loop_with_spinners(n_spinners: int) -> float:
    procs = _spinners(n_spinners, "while True: pass")
    time.sleep(0.5)
    try:
        return _timed_loop()
    finally:
        for p in procs:
            p.kill()


def _mem_loop_with_spinners(n_spinners: int) -> float:
    procs = _spinners(n_spinners, _MEM_SPIN)
    time.sleep(1.5)  # let spinners allocate before measuring
    try:
        out = subprocess.run(
            [sys.executable, "-c", _MEM_WORK], capture_output=True, text=True
        )
        return float(out.stdout.strip().splitlines()[-1])
    finally:
        for p in procs:
            p.kill()


def hardware_ceiling(n: int, n4: int, repeats: int = 3) -> dict:
    """Max achievable T(n)/(4*T(4n)) efficiency on this box, by two
    probes bracketing the job mix: an ALU loop (frequency/steal
    throttling only) and a DRAM-streaming loop (shared memory
    bandwidth — the dominant contention for shuffle/sort/parquet
    phases). `ceiling` keeps the ALU probe for continuity with prior
    rounds; `ceiling_membw` is the bandwidth-bound bound."""
    at_n = min(_loop_with_spinners(n - 1) for _ in range(repeats))
    at_n4 = min(_loop_with_spinners(n4 - 1) for _ in range(repeats))
    mem_n = min(_mem_loop_with_spinners(n - 1) for _ in range(repeats))
    mem_n4 = min(_mem_loop_with_spinners(n4 - 1) for _ in range(repeats))
    return {
        "loop_sec_at_N_occupancy": round(at_n, 3),
        "loop_sec_at_4N_occupancy": round(at_n4, 3),
        "ceiling": round(at_n / at_n4, 3),
        "mem_sec_at_N_occupancy": round(mem_n, 3),
        "mem_sec_at_4N_occupancy": round(mem_n4, 3),
        "ceiling_membw": round(mem_n / mem_n4, 3),
    }


def run_one(cpus: int, sf_dir: str, replicate: int) -> dict:
    nparts = 2 * cpus
    code = f"""
import json, sys, time, os, tempfile, shutil
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from triplestore_spark.session import get_spark
spark = get_spark("scaling-bench", cpus={cpus}, shuffle_partitions={nparts})
spark.sparkContext.setLogLevel("ERROR")
from triplestore_spark.pipeline.run import candidate_triples
from triplestore_spark.pipeline.corpus import read_documents
from triplestore_spark.functions.keys import with_keys
from triplestore_spark.operators.graph import dedup_triples
from triplestore_spark.operators.materialize import LAYOUTS

def flow(replicate):
    docs = read_documents(spark, {sf_dir!r})
    n_docs_base = docs.count()  # warms input + scale facts
    # repartition BEFORE the replicating crossJoin: the base table is
    # one parquet split; inflating it in a single task would serialize
    # the corpus build
    docs = docs.repartition({nparts})
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    docs = docs.crossJoin(F.broadcast(reps)).withColumn(
        "doc_id", F.col("doc_id") + F.col("rep") * 100000000).drop("rep")
    out = tempfile.mkdtemp(prefix="ts_scale_")
    t0 = time.time()
    canon = dedup_triples(candidate_triples(spark, docs)).cache()
    # mirror the production materialize path (operators/materialize.py):
    # component-only columns, three layout writes submitted concurrently
    from concurrent.futures import ThreadPoolExecutor
    from triplestore_spark import schema as S
    bare = canon.select(*S.TRIPLE_FIELDS)
    def write_layout(item):
        layout, keys = item
        (bare.repartitionByRange({nparts}, *[F.col(k) for k in keys])
             .sortWithinPartitions(*keys)
             .write.mode("overwrite").parquet(out + "/" + layout))
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(write_layout, LAYOUTS.items()))
    elapsed = time.time() - t0
    canon.unpersist()
    n = spark.read.parquet(out + "/spo").count()
    shutil.rmtree(out, ignore_errors=True)
    return elapsed, n, n_docs_base

# warmup: identical plan shape on tiny data compiles codegen + JIT
# (steady-state throughput is the 100 TB-relevant quantity; a real
# job amortizes the one-time ~30 s of compilation over hours)
flow(2)
with open("/proc/loadavg") as f:
    load = f.read().split()[0]
elapsed, n, n_docs_base = flow({replicate})
# total CPU burned by the local-mode JVM (utime+stime+children, jiffies)
jvm_pid = spark.sparkContext._gateway.proc.pid
with open(f"/proc/{{jvm_pid}}/stat") as f:
    st = f.read().split()
hz = os.sysconf("SC_CLK_TCK")
cpu_sec = (int(st[13]) + int(st[14]) + int(st[15]) + int(st[16])) / hz
spark.stop()
print("RESULT " + json.dumps({{"cpus": {cpus}, "sec": round(elapsed,2),
    "triples": n, "tps": round(n/elapsed,1), "docs": n_docs_base*{replicate},
    "loadavg_at_start": load, "cpu_sec_total": round(cpu_sec,1)}}))
"""
    env = dict(os.environ, SPARK_DRIVER_MEMORY="24g")
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"run cpus={cpus} failed")


def interleaved(
    k: int, cpus_a: int, cpus_b: int, sf_dir: str, replicate: int
) -> tuple[dict, dict]:
    """Alternate configs A,B,A,B,... so host-noise epochs hit both
    equally; report each config's MIN (the uncontended estimate —
    identical runs vary up to ~1.6x with co-tenant load here)."""
    runs_a, runs_b = [], []
    for _ in range(k):
        runs_a.append(run_one(cpus_a, sf_dir, replicate))
        runs_b.append(run_one(cpus_b, sf_dir, replicate))

    def summarize(runs):
        best = min(runs, key=lambda r: r["sec"])
        return best | {
            "all_secs": [r["sec"] for r in runs],
            "all_loadavg": [r["loadavg_at_start"] for r in runs],
        }

    return summarize(runs_a), summarize(runs_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=300)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n-cpus", type=int, default=4, help="N (4N derived)")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    calib = hardware_ceiling(args.n_cpus, args.n_cpus * 4)
    n, n4 = interleaved(
        args.repeats, args.n_cpus, args.n_cpus * 4, args.sf, args.replicate
    )
    raw = round(n4["tps"] / (4 * n["tps"]), 3)
    norm = round(raw / calib["ceiling"], 3)
    summary = {
        "metric": "triples/sec end-to-end extract->canonicalize->materialize",
        "proxy": f"local[{args.n_cpus}] vs local[{args.n_cpus * 4}] "
        "+ per-core hardware calibration",
        "input": {"sf_dir": args.sf, "replicate": args.replicate,
                  "docs": n["docs"], "triples": n["triples"]},
        "N": n,
        "4N": n4,
        "hardware_calibration": calib,
        "raw_efficiency": raw,
        "normalized_efficiency": norm,
        "criterion": "normalized efficiency >= 0.8",
        "pass": norm >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — scaling evidence (north_rule)

Job: the full flagship pipeline — build interleaved corpus ->
extract (mentions/media/metadata) -> broadcast-resolve -> global tkey
dedup -> materialize SPO/POS/OSP sorted parquet. Identical job,
identical input, two parallelism levels: local[{args.n_cpus}] (N) vs
local[{args.n_cpus * 4}] (4N).

Input: {args.sf} documents replicated x{args.replicate} with disjoint
doc_id ranges = {n['docs']} docs -> {n['triples']} canonical triples.
Best of {args.repeats} runs per config (the box carries intermittent
background tenant load; per-run loadavg recorded).

## Hardware calibration (why raw efficiency cannot reach 1.0 here)

This VM throttles per-core speed as occupancy rises (hypervisor
frequency/steal; /proc/stat shows steal time). A pure-CPU Python loop
pinned solo vs alongside spinners measures the per-core slowdown:

- loop at N={args.n_cpus} busy cores:  {calib['loop_sec_at_N_occupancy']} s
- loop at 4N={args.n_cpus * 4} busy cores: {calib['loop_sec_at_4N_occupancy']} s
- **max efficiency any perfectly-parallel job can show: {calib['ceiling']}**

On a real cluster, 4N executors are 4x machines at constant per-core
speed, so the cluster-relevant number is the normalized efficiency.
(Alternative proxies measured and rejected: local-cluster executor
JVMs add loopback-shuffle serialization — raw 0.37; see git history.)

## Results

| config | wall sec (best) | all runs | loadavg | triples/s |
|---|---|---|---|---|
| local[{args.n_cpus}]  (N)  | {n['sec']} | {n['all_secs']} | {n['all_loadavg']} | {n['tps']} |
| local[{args.n_cpus * 4}] (4N) | {n4['sec']} | {n4['all_secs']} | {n4['all_loadavg']} | {n4['tps']} |

- raw efficiency T(4N) / (4 * T(N)) = **{raw}**
- hardware ceiling (calibration)   = **{calib['ceiling']}**
- **normalized efficiency = {norm}** (criterion >= 0.8: {"PASS" if norm >= 0.8 else "FAIL"})

Reference single-process context (BASELINE.md): ~1-2 M triples/s codec,
~0.9 M triples/s snapshot index build on 100k triples — in-memory
codec loops; our end-to-end number includes the gazetteer-resolve
join, a global tkey dedup shuffle, and 3 sorted parquet writes. See
bench.py q6/q7 for the apples-to-apples codec throughput.

Generated by tools/bench_scaling.py on {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    # preserve the hand-maintained sections (codec throughput, history,
    # variance notes) that live after the scaling block
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "## Codec throughput"
    tail = ""
    if os.path.exists(out_path):
        old = open(out_path).read()
        if marker in old:
            tail = old[old.index(marker):]
    with open(out_path, "w") as f:
        f.write(md + ("\n" + tail if tail else ""))


if __name__ == "__main__":
    main()
