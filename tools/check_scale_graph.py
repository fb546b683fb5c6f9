"""Scale-decade check for the round-6 graph analytics family
(operators/graph_algos.py, operators/graph_sample.py).

Protocol (same exact-invariant style as check_scale200x.py for the
dedup family): build a deterministic base graph B (hash-derived
G(n, d) plus a ring so components and triangles both exist), then a
scaled graph = K DISJOINT suffixed copies of B. Disjointness makes
the invariants EXACT, not statistical:

- triangles(K copies)        == K * triangles(B)      (exact integer)
- #components(K copies)      == K * #components(B)    (exact integer)
- CC star rounds at K copies <= log2(n)^2 bound and ~= rounds at B
  (component structure identical per copy)
- pagerank: each copy's rank vector == base ranks / K (the dynamics
  are per-copy independent and linear; checked to 1e-9 on a sample)
- sample_neighborhoods row count(K) == K * count(B) (per-node row
  count is min(deg, fanout), degrees are copy-invariant even though
  the md5 draws differ per copy)

Wall times at 1x and Kx are reported for the scaling story (local
mode shares one machine, so time ratios are indicative; the EXACT
invariants are the correctness evidence).

Usage: python tools/check_scale_graph.py [--k 10] [--nodes 20000]
       [--deg 10] [--round 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def base_edges(spark, n: int, d: int):
    """Deterministic pseudo-random digraph: d hash-derived out-edges
    per node plus a ring edge (one big weak component per copy, plus
    hash triangles). Engine-independent (md5-based, no RNG state)."""
    from pyspark.sql import functions as F

    ids = spark.range(n).select(F.col("id"))
    js = spark.range(d).select(F.col("id").alias("j"))
    rand = ids.crossJoin(js).select(
        F.concat(F.lit("v"), F.col("id")).alias("src"),
        F.concat(
            F.lit("v"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.col("id"), F.col("j"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % n,
        ).alias("dst"),
    )
    ring = ids.select(
        F.concat(F.lit("v"), F.col("id")).alias("src"),
        F.concat(F.lit("v"), (F.col("id") + 1) % n).alias("dst"),
    )
    return (
        rand.unionByName(ring)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def replicate(edges, k: int):
    from pyspark.sql import functions as F

    reps = edges.sparkSession.range(k).select(
        F.col("id").cast("string").alias("rep")
    )
    return edges.crossJoin(F.broadcast(reps)).select(
        F.concat_ws("@", "src", "rep").alias("src"),
        F.concat_ws("@", "dst", "rep").alias("dst"),
    )


def measure(edges, seeds, fanouts):
    from pyspark.sql import functions as F

    from triplestore_spark.operators.graph_algos import (
        connected_components,
        pagerank,
        triangle_count,
    )
    from triplestore_spark.operators.graph_sample import (
        sample_neighborhoods,
    )

    out = {}
    t0 = time.time()
    out["edges"] = edges.count()
    out["build_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["triangles"] = triangle_count(edges).first()[0]
    out["triangles_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    stats: dict = {}
    cc = connected_components(edges, stats=stats)
    out["components"] = cc.select("component").distinct().count()
    out["cc_rounds"] = stats.get("rounds")
    out["cc_converged"] = stats.get("converged")
    out["cc_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    pr = pagerank(edges, iterations=5)
    out["pr_mass"] = float(
        pr.agg(F.sum("rank")).first()[0]
    )
    out["pr_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["sample_rows"] = sample_neighborhoods(
        edges, seeds, fanouts, salt="scale"
    ).count()
    out["sample_sec"] = round(time.time() - t0, 2)
    return out, pr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--round", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from triplestore_spark.session import get_spark

    spark = get_spark("scale-graph", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import math

    n, d, k = args.nodes, args.deg, args.k
    seeds = [f"v{i * (n // 8)}" for i in range(8)]
    fanouts = [10, 5]

    base = base_edges(spark, n, d).localCheckpoint()
    r1, pr1 = measure(base, seeds, fanouts)

    big = replicate(base, k).localCheckpoint()
    seeds_k = [f"{s}@{r}" for s in seeds for r in range(k)]
    rk, prk = measure(big, seeds_k, fanouts)

    # exact per-copy pagerank invariant on a sample of nodes: rank in
    # copy 0 of the Kx graph == base rank / K
    sample_nodes = [f"v{i * (n // 16)}" for i in range(16)]
    b = {
        r["node"]: r["rank"]
        for r in pr1.where(F.col("node").isin(sample_nodes)).collect()
    }
    g = {
        r["node"]: r["rank"]
        for r in prk.where(
            F.col("node").isin([f"{s}@0" for s in sample_nodes])
        ).collect()
    }
    pr_dev = max(
        abs(g[f"{s}@0"] * k - b[s]) for s in sample_nodes if s in b
    )

    bound = int(math.log2(n * k) ** 2)  # log^2 of total node count
    checks = {
        "triangles_exact": rk["triangles"] == k * r1["triangles"],
        "components_exact": rk["components"] == k * r1["components"],
        "cc_rounds_bounded": (rk["cc_rounds"] or 0) <= bound
        and bool(rk["cc_converged"]),
        "pr_per_copy_max_dev": pr_dev,
        "pr_per_copy_ok": pr_dev < 1e-9,
        "pr_mass_ok": abs(r1["pr_mass"] - 1) < 1e-9
        and abs(rk["pr_mass"] - 1) < 1e-9,
        "sample_rows_exact": rk["sample_rows"] == k * r1["sample_rows"],
    }
    ok = all(
        v for key, v in checks.items() if not key.endswith("_dev")
    )
    out = {
        "k": k,
        "nodes": n,
        "deg": d,
        "base": r1,
        "scaled": rk,
        "cc_rounds_log2sq_bound": bound,
        "checks": checks,
        "pass": bool(ok),
    }
    line = json.dumps(out)
    print(line)
    path = os.path.join(
        REPO, "BENCH", f"SCALE_GRAPH_r{args.round:02d}.txt"
    )
    with open(path, "w") as f:
        f.write(
            "# Graph-analytics scale-decade check "
            "(tools/check_scale_graph.py)\n\n"
            "K disjoint copies of a deterministic base graph; "
            "invariants are EXACT by\nconstruction (see module "
            "docstring): triangles/components/sample-rows scale\n"
            "by exactly K, per-copy PageRank equals base/K, CC "
            "rounds stay in the\nlog^2 bound.\n\n"
        )
        f.write(json.dumps(out, indent=2) + "\n")
    print("wrote", path)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
