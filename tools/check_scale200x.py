"""x200 replication decade for the dedup/CC/LSH family (VERDICT r4 #3).

1M docs (sf0.1 x 200, disjoint doc_id ranges) through the curation
funnel: quality filter -> MinHash-LSH bucketing -> star connected
components -> keep-list. Replication yields EXACT invariants
(implementation-independent), checked at both scales:

- filtered docs: filter is per-doc and id-independent, so
  filtered(REP x) == REP * filtered(1x).
- LSH CANDIDATE pairs: replicated copies have identical text, hence
  identical MinHash signatures, hence share ALL band buckets — every
  copy family is a guaranteed clique, and a cross-doc pair is a
  candidate at REP x iff it is at 1x. So
  cand(REP x) == n_filtered * C(REP,2) + REP^2 * cand(1x).
- keep-list: every base-level candidate component absorbs all copies
  of its members, so survivors(REP x) == survivors(1x).
- star CC rounds: logged against the O(log^2 n) bound (Kiveris
  SoCC'14); copy-cliques are diameter-1 so a handful of alternating
  rounds is expected.

Why CANDIDATE pairs, not verified pairs, at this decade: the exact
Jaccard verify join fans out by shingles-per-doc (~52 here), and the
synthetic copy-clique makes candidate count quadratic in REP —
verifying 110M clique pairs means a ~5.7B-row shuffle (>free disk in
this sandbox). That quadratic term is an artifact of exact-copy
replication, not of real corpora (where exact copies are collapsed by
hash dedup long before LSH); the verified-pair formula is proven
exact at x50 (BENCH/SCALE50X_r04.txt). The stages stressed here —
bucket-join fan-out, 100M-edge CC, keep-list anti-join — are the ones
whose round counts and shuffle sizes actually grow with the decade.

The keep-list count is derived from the SAME labels dedup_keep_list
computes (survivor := doc with label == own id or no label), so this
is the deliverable path, not a parallel reimplementation.

Usage: python tools/check_scale200x.py [--sf DIR] [--rep 200] [--round N]
Writes BENCH/SCALE{K}X_r{N}.txt. Run in a low-load window with NOTHING
else concurrent.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def loadavg() -> str:
    return open("/proc/loadavg").read().split()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=200)
    ap.add_argument("--round", type=int, default=5)
    args = ap.parse_args()

    # the x200 decade holds ~74M candidate edges plus disk-persisted
    # intermediates — the library's 8g driver default (sized for the
    # sf benches) OOMs here; claim a scale-appropriate heap unless the
    # caller already chose one
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")

    from pyspark import StorageLevel

    from triplestore_spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
    )
    from triplestore_spark.operators.textstats import filter_documents
    from triplestore_spark.pipeline.corpus import read_documents
    from triplestore_spark.session import get_spark

    spark = get_spark("scale200x", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = read_documents(spark, args.sf)
    reps = spark.range(args.rep).select(F.col("id").alias("rep"))
    docsR = (
        docs1.repartition(64)
        .crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )

    lines = [
        f"scale200x: sf={args.sf} rep={args.rep} "
        f"start_loadavg={loadavg()}"
    ]
    ok = True

    def check(name, got, want, secs):
        nonlocal ok
        good = got == want
        ok = ok and good
        lines.append(
            f"  {name:34s} got={got} want={want} "
            f"{'OK' if good else 'FAIL'} [{secs:.1f}s load={loadavg()}]"
        )

    # 1. quality filter scales exactly linearly
    t0 = time.time()
    f1 = filter_documents(docs1).localCheckpoint()
    n_f1 = f1.count()
    # REP-x intermediates go DISK_ONLY: deserialized-in-heap caching of
    # 1M text rows / 74M edges is exactly what the heap should not hold
    fR = filter_documents(docsR).persist(StorageLevel.DISK_ONLY)
    n_fR = fR.count()
    check("filtered_docs", n_fR, args.rep * n_f1, time.time() - t0)

    # 2. LSH candidate pairs follow the replication formula
    t0 = time.time()
    cand1 = minhash_lsh_pairs(
        f1, n=3, num_hashes=32, bands=8, verify_threshold=None
    ).localCheckpoint()
    n_c1 = cand1.count()
    candR = minhash_lsh_pairs(
        fR, n=3, num_hashes=32, bands=8, verify_threshold=None
    ).persist(StorageLevel.DISK_ONLY)
    n_cR = candR.count()
    want = n_f1 * (args.rep * (args.rep - 1) // 2) + args.rep**2 * n_c1
    check("lsh_candidate_pairs", n_cR, want, time.time() - t0)

    # 3. star CC over the 1x and REPx candidate graphs; keep-list from
    # the labels (the exact survivors dedup_keep_list would keep)
    def keep_count(filtered, cand, stats):
        cc = connected_components_star(cand, stats=stats)
        dropped = cc.where(F.col("doc_id") != F.col("cluster_id")).count()
        return filtered.count() - dropped

    t0 = time.time()
    st1: dict = {}
    kept1 = keep_count(f1, cand1, st1)
    secs1 = time.time() - t0
    t0 = time.time()
    stR: dict = {}
    keptR = keep_count(fR, candR, stR)
    secsR = time.time() - t0
    check("dedup_keep_list(star)", keptR, kept1, secs1 + secsR)

    # CC rounds vs the O(log^2 n) expectation — copy-cliques are
    # diameter-1, so rounds should stay single-digit at 1M nodes
    n_nodes = args.rep * n_f1
    bound = math.ceil(math.log2(max(n_nodes, 2))) ** 2
    lines.append(
        f"  cc_rounds: 1x={st1.get('rounds')} (converged="
        f"{st1.get('converged')}), {args.rep}x={stR.get('rounds')} "
        f"(converged={stR.get('converged')}) on {n_nodes} nodes / "
        f"{n_cR} edges; log2(n)^2 bound={bound} "
        f"[cc_1x={secs1:.1f}s cc_{args.rep}x={secsR:.1f}s]"
    )
    ok = ok and bool(stR.get("converged")) and bool(st1.get("converged"))
    ok = ok and stR.get("rounds", bound + 1) <= bound

    lines.append(f"end_loadavg={loadavg()}")
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
