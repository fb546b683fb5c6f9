"""Next-decade spot check for the heavy operators (VERDICT r2 #7).

No sf1.0 testdata exists in this sandbox, so the decade step is
synthesized deterministically: the sf0.1 documents are replicated
REP times with disjoint doc_id ranges (the same corpus inflation the
scaling harness uses). DuckDB can't oracle this volume comfortably,
but replication yields EXACT invariants the outputs must satisfy —
stronger than rows-only, independent of the Spark implementation:

- flagship canonical triples: every subject is doc-scoped, copies get
  fresh ids, so count(REP x) == REP * count(1x).
- near-dup keep list: all REP copies of a base doc are mutual exact
  dups (Jaccard 1.0), so every base-level cluster (and every former
  singleton) collapses to ONE survivor: kept(REP x) == kept(1x).
- minhash-verified pairs: jaccard is id-free, so
  pairs(REP x) == n_docs * C(REP,2) + REP^2 * pairs(1x).

Usage: python tools/check_scale10x.py [--sf DIR] [--rep K] [--round N]
Writes BENCH/SCALE{K}X_r{N}.txt. Run in a low-load window with NOTHING
else concurrent (self-contention invalidates the timing context).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--round", type=int, default=4)
    args = ap.parse_args()

    from triplestore_spark.operators.dedup import (
        dedup_keep_list,
        minhash_lsh_pairs,
    )
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.pipeline.corpus import read_documents
    from triplestore_spark.pipeline.run import candidate_triples
    from triplestore_spark.session import get_spark

    spark = get_spark("scale10x", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = read_documents(spark, args.sf)
    n_docs = docs1.count()
    reps = spark.range(args.rep).select(F.col("id").alias("rep"))
    docsR = (
        docs1.repartition(64)
        .crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )

    lines = [f"scale10x: sf={args.sf} rep={args.rep} docs={n_docs * args.rep}"]
    ok = True

    def check(name, got, want, secs):
        nonlocal ok
        good = got == want
        ok = ok and good
        lines.append(
            f"  {name:34s} got={got} want={want} "
            f"{'OK' if good else 'FAIL'} [{secs:.1f}s]"
        )

    # 1. flagship canonical triples scale exactly linearly
    t0 = time.time()
    base_triples = dedup_triples(candidate_triples(spark, docs1)).count()
    rep_triples = dedup_triples(candidate_triples(spark, docsR)).count()
    check("canonical_triples", rep_triples, args.rep * base_triples,
          time.time() - t0)

    # 2. near-dup keep list collapses every copy family to one survivor
    t0 = time.time()
    pairs1 = minhash_lsh_pairs(
        docs1, n=3, num_hashes=32, bands=8, verify_threshold=0.5
    ).select("doc_a", "doc_b")
    kept1 = dedup_keep_list(docs1, pairs1).count()
    pairsR = minhash_lsh_pairs(
        docsR, n=3, num_hashes=32, bands=8, verify_threshold=0.5
    ).select("doc_a", "doc_b")
    keptR = dedup_keep_list(docsR, pairsR).count()
    check("dedup_keep_list", keptR, kept1, time.time() - t0)

    # 3. verified pair count follows the replication formula
    t0 = time.time()
    n_pairs1 = pairs1.count()
    n_pairsR = pairsR.count()
    want = n_docs * (args.rep * (args.rep - 1) // 2) + args.rep**2 * n_pairs1
    check("minhash_verified_pairs", n_pairsR, want, time.time() - t0)

    lines.append("ALL OK" if ok else "FAILURES PRESENT")
    out = "\n".join(lines) + "\n"
    print(out)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = f"SCALE{args.rep}X_r{args.round:02d}.txt"
    with open(os.path.join(repo, "BENCH", name), "w") as f:
        f.write(out)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
