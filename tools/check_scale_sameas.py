"""Scale-decade check for owl:sameAs canonicalization
(operators/sameas.py merge_equivalents).

Protocol (the repo's exact-invariant style, check_scale_graph.py):
build a deterministic base KG B — entities with facts plus sameAs
CHAINS of varying length (chains are the CC worst case the star
algorithm exists for) — then a scaled KG = K DISJOINT suffixed
copies of B. Disjointness makes the invariants EXACT:

- merged triple count(K copies)     == K * count(merge(B))
- equivalence classes(K copies)     == K * classes(B)
- per-copy merged triples, stripped of the copy suffix, are
  IDENTICAL to merge(B) (relational anti-join both ways, 0 rows)
- no alias survives as subject or resource object (global scan)
- idempotence at scale: merge(merge(K)) adds/removes nothing
- CC rounds at K copies stay within the O(log^2 n) bound and match
  the base (component structure is copy-invariant)

Wall times at 1x and Kx reported for the scaling story (shared local
machine — the EXACT invariants are the correctness evidence).

Usage: python tools/check_scale_sameas.py [--k 100] [--entities 500]
       [--round 6]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def base_rows(spark, n_entities: int, copy: str):
    """Deterministic base KG for one copy tag: every entity carries
    two facts (a literal and a resource edge to a hash-derived
    neighbor), and entities group into sameAs chains of length
    (i % 7) + 1 — lengths 1..7, so singletons, pairs, and genuine
    chains all occur. Engine-independent (arithmetic, no RNG)."""
    from pyspark.sql import functions as F

    ids = spark.range(n_entities).select(F.col("id"))
    ent = F.concat(F.lit(f"e{copy}_"), F.col("id"))
    neigh = F.concat(
        F.lit(f"e{copy}_"),
        F.pmod(F.col("id") * 31 + 7, F.lit(n_entities)),
    )
    lit_fact = ids.select(
        ent.alias("subject"), F.lit(False).alias("subject_is_bnode"),
        F.lit("kg:size").alias("predicate"), F.lit("lit").alias("object_kind"),
        (F.col("id") % 100).cast("string").alias("object_value"),
        F.lit("xsd:integer").alias("object_type"), F.lit("").alias("object_lang"),
    )
    res_fact = ids.select(
        ent.alias("subject"), F.lit(False).alias("subject_is_bnode"),
        F.lit("kg:near").alias("predicate"), F.lit("res").alias("object_kind"),
        neigh.alias("object_value"),
        F.lit("").alias("object_type"), F.lit("").alias("object_lang"),
    )
    # chains: entity i links to i+1 when both sit in the same chain
    # block (blocks of length (block_start % 7) + 1, tiled greedily:
    # use a simple rule — i links i+1 unless i+1 starts a new block,
    # where blocks are runs of length (floor(i / 7) % 7) + 1; easier
    # exact rule: link i -> i+1 iff (i % 7) < (i // 7) % 7 — gives a
    # deterministic mixture of chain lengths 1..7)
    links = (
        ids.where(
            (F.col("id") % 7 < F.pmod(F.floor(F.col("id") / 7), F.lit(7)))
            & (F.col("id") + 1 < n_entities)
        )
        .select(
            ent.alias("subject"), F.lit(False).alias("subject_is_bnode"),
            F.lit("owl:sameAs").alias("predicate"),
            F.lit("res").alias("object_kind"),
            F.concat(F.lit(f"e{copy}_"), F.col("id") + 1).alias(
                "object_value"
            ),
            F.lit("").alias("object_type"), F.lit("").alias("object_lang"),
        )
    )
    return lit_fact.unionByName(res_fact).unionByName(links)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--entities", type=int, default=500)
    ap.add_argument("--round", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from triplestore_spark.operators.dedup import connected_components_star
    from triplestore_spark.operators.sameas import (
        equivalence_classes,
        merge_equivalents,
    )
    from triplestore_spark.session import get_spark

    spark = get_spark("scale-sameas")
    spark.sparkContext.setLogLevel("ERROR")

    checks = []

    def check(name, ok, detail=""):
        checks.append((name, bool(ok), detail))
        print(("OK  " if ok else "FAIL") + f" {name}  {detail}")

    base = base_rows(spark, args.entities, "c0").cache()
    t0 = time.time()
    merged_base = merge_equivalents(base)
    base_rows_out = sorted(tuple(r) for r in merged_base.collect())
    t_base = time.time() - t0
    n_base_classes = equivalence_classes(base).count()
    print(
        f"base: {base.count()} triples -> {len(base_rows_out)} merged, "
        f"{n_base_classes} non-identity class members, {t_base:.1f}s"
    )

    big = base_rows(spark, args.entities, "c0")
    for i in range(1, args.k):
        big = big.unionByName(base_rows(spark, args.entities, f"c{i}"))
    big = big.repartition(32).cache()
    n_big = big.count()

    t0 = time.time()
    merged_big = merge_equivalents(big).cache()
    n_merged_big = merged_big.count()
    t_big = time.time() - t0
    print(f"{args.k}x: {n_big} triples -> {n_merged_big} merged, {t_big:.1f}s")

    check(
        "count_scales_exactly",
        n_merged_big == args.k * len(base_rows_out),
        f"{n_merged_big} == {args.k} * {len(base_rows_out)}",
    )
    n_big_classes = equivalence_classes(big).count()
    check(
        "classes_scale_exactly",
        n_big_classes == args.k * n_base_classes,
        f"{n_big_classes} == {args.k} * {n_base_classes}",
    )

    # per-copy equality: strip the copy tag from copy c1 and compare
    # to the base output (anti-join both ways)
    c1 = merged_big.where(F.col("subject").startswith("ec1_"))
    stripped = c1.select(
        F.regexp_replace("subject", "^ec1_", "ec0_").alias("subject"),
        "subject_is_bnode", "predicate", "object_kind",
        F.when(
            F.col("object_kind") == "res",
            F.regexp_replace("object_value", "^ec1_", "ec0_"),
        ).otherwise(F.col("object_value")).alias("object_value"),
        "object_type", "object_lang",
    )
    cols = list(stripped.columns)
    a = stripped.join(merged_base, on=cols, how="left_anti").count()
    b = merged_base.join(stripped, on=cols, how="left_anti").count()
    check("copy_equals_base", a == 0 and b == 0, f"anti-joins {a}/{b}")

    # no alias survives anywhere (aliases are exactly the non-rep
    # members of every class)
    aliases = equivalence_classes(big).select(
        F.expr("substring(node_key, 2, length(node_key) - 2)").alias("n")
    )
    dangling = (
        merged_big.join(
            aliases, merged_big["subject"] == aliases["n"], "left_semi"
        ).count()
        + merged_big.where(F.col("object_kind") == "res")
        .join(aliases, merged_big["object_value"] == aliases["n"],
              "left_semi")
        .count()
    )
    check("no_dangling_aliases", dangling == 0, f"{dangling} rows")

    again = merge_equivalents(merged_big)
    check(
        "idempotent_at_scale",
        again.count() == n_merged_big
        and again.join(merged_big, on=cols, how="left_anti").count() == 0,
    )

    # CC round count at scale vs the log^2 bound
    stats: dict = {}
    pairs = (
        big.where(F.col("predicate") == "owl:sameAs")
        .select(
            F.concat(F.lit("<"), "subject", F.lit(">")).alias("doc_a"),
            F.concat(F.lit("<"), "object_value", F.lit(">")).alias("doc_b"),
        )
    )
    connected_components_star(pairs, stats=stats)
    n_nodes = args.k * args.entities
    bound = math.log2(max(n_nodes, 2)) ** 2
    check(
        "cc_rounds_within_bound",
        stats.get("converged") and stats.get("rounds", 99) <= bound,
        f"rounds={stats.get('rounds')} bound={bound:.0f} "
        f"nodes={n_nodes}",
    )

    ok = all(c[1] for c in checks)
    print(json.dumps({
        "check": "scale_sameas", "k": args.k,
        "entities_per_copy": args.entities,
        "triples_1x": base.count(), "triples_kx": n_big,
        "merged_kx": n_merged_big,
        "secs_1x": round(t_base, 1), "secs_kx": round(t_big, 1),
        "cc_rounds": stats.get("rounds"),
        "pass": ok,
    }))
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
