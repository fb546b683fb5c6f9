"""Scale-decade check for the full-text search family
(operators/text_search.py).

Protocol (same exact-invariant style as check_scale_graph.py): build
the inverted index over the sf0.1 documents table (base B), then over
K DISJOINT copies — copy i's doc_ids get a '#c{i}' suffix and every
token gets a 'c{i}x' prefix, so the copies share no vocabulary.
Disjointness makes the invariants EXACT, not statistical:

- postings rows (K copies)   == K * postings rows (B)
- term_stats rows (K copies) == K * term_stats rows (B)
- n_docs ×K; avgdl UNCHANGED (every copy has the base length profile)
- per-copy df(c{i}x<t>)      == base df(<t>) for EVERY term (checked
  relationally: strip the prefix, anti-join against base — 0 rows)
- single-term top-k per copy == base top-k with suffixed ids, same
  ranks: with one query term the ordering depends only on tf and dl
  (idf is a per-term constant factor), both copy-invariant; the
  score ratio scaled/base is the idf ratio — one constant across
  all hits (checked to 1e-9)

Wall times at 1x and Kx are reported for the scaling story (shared
machine — the EXACT invariants are the correctness evidence).

Usage: python tools/check_scale_text.py [--k 100] [--topk 10]
       [--round 6] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--round", type=int, default=6)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from triplestore_spark.operators.text_search import (
        bm25_search,
        build_text_index,
    )
    from triplestore_spark.session import get_spark

    spark = get_spark(
        "scale-text", cpus=args.cpus, shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    k = args.k

    out: dict = {"k": k, "topk": args.topk, "sf_dir": args.sf_dir}

    # -- base ----------------------------------------------------------
    t0 = time.time()
    base = build_text_index(docs)
    base.postings = base.postings.cache()
    n_post_b = base.postings.count()
    n_stats_b = base.term_stats.count()
    out["base"] = {
        "docs": base.n_docs,
        "postings": n_post_b,
        "terms": n_stats_b,
        "avgdl": round(base.avgdl, 6),
        "build_sec": round(time.time() - t0, 2),
    }

    # the 3 most frequent terms drive the ranking check
    probe_terms = [
        r["term"]
        for r in base.term_stats.orderBy(
            F.col("df").desc(), F.col("term")
        ).limit(3).collect()
    ]
    t0 = time.time()
    base_hits = {
        q: [(r["id"], r["rank"], r["score"]) for r in rows]
        for q, rows in (
            (q, sorted(
                bm25_search(base, {q: q}, k=args.topk).collect(),
                key=lambda r: r["rank"],
            ))
            for q in probe_terms
        )
    }
    out["base"]["search_sec"] = round(time.time() - t0, 2)

    # -- K disjoint copies --------------------------------------------
    copies = []
    for i in range(k):
        copies.append(
            docs.select(
                F.concat("doc_id", F.lit(f"#c{i}")).alias("doc_id"),
                F.regexp_replace(
                    F.lower("text"), "([a-z0-9]+)", f"c{i}x$1"
                ).alias("text"),
            )
        )
    scaled_docs = copies[0]
    for c in copies[1:]:
        scaled_docs = scaled_docs.unionByName(c)

    t0 = time.time()
    scaled = build_text_index(scaled_docs)
    scaled.postings = scaled.postings.cache()
    n_post_s = scaled.postings.count()
    n_stats_s = scaled.term_stats.count()
    out["scaled"] = {
        "docs": scaled.n_docs,
        "postings": n_post_s,
        "terms": n_stats_s,
        "avgdl": round(scaled.avgdl, 6),
        "build_sec": round(time.time() - t0, 2),
    }

    # per-copy df == base df, for EVERY term of EVERY copy
    stripped = scaled.term_stats.select(
        F.regexp_extract("term", r"^c\d+x(.*)$", 1).alias("bterm"),
        "df",
    )
    df_mismatch = (
        stripped.join(
            base.term_stats.withColumnRenamed("term", "bterm")
            .withColumnRenamed("df", "df_base"),
            on="bterm",
            how="left",
        )
        .where(
            F.col("df_base").isNull() | (F.col("df") != F.col("df_base"))
        )
        .count()
    )

    # ranking invariance: copy 0 and copy k-1 of each probe term
    t0 = time.time()
    qmap = {
        f"{q}@{i}": f"c{i}x{q}"
        for q in probe_terms
        for i in (0, k - 1)
    }
    srows = bm25_search(scaled, qmap, k=args.topk).collect()
    out["scaled"]["search_sec"] = round(time.time() - t0, 2)
    by_q: dict = {}
    for r in srows:
        by_q.setdefault(r["qid"], []).append(r)
    rank_ok, ratio_dev = True, 0.0
    for qid, rows in by_q.items():
        q, i = qid.rsplit("@", 1)
        rows.sort(key=lambda r: r["rank"])
        want_ids = [f"{d}#c{i}" for d, _rank, _s in base_hits[q]]
        got_ids = [r["id"] for r in rows]
        if got_ids != want_ids:
            rank_ok = False
            continue
        ratios = [
            r["score"] / s
            for r, (_d, _rank, s) in zip(rows, base_hits[q])
        ]
        ratio_dev = max(
            ratio_dev, max(ratios) - min(ratios) if ratios else 0.0
        )

    checks = {
        "postings_exact": n_post_s == k * n_post_b,
        "terms_exact": n_stats_s == k * n_stats_b,
        "docs_exact": scaled.n_docs == k * base.n_docs,
        "avgdl_equal": abs(scaled.avgdl - base.avgdl) < 1e-9,
        "df_per_copy_mismatches": df_mismatch,
        "df_per_copy_ok": df_mismatch == 0,
        "rank_order_preserved": rank_ok,
        "score_ratio_max_dev": ratio_dev,
        "score_ratio_constant": ratio_dev < 1e-9,
    }
    out["probe_terms"] = probe_terms
    out["checks"] = checks
    out["pass"] = all(
        v for c, v in checks.items()
        if isinstance(v, bool)
    )

    txt = (
        "# Full-text-search scale-decade check "
        "(tools/check_scale_text.py)\n\n"
        "K disjoint term-prefixed copies of the sf0.1 documents "
        "table; invariants are EXACT by construction (see module "
        "docstring): postings/term/doc counts scale by exactly K, "
        "avgdl unchanged, per-copy df equals base df for every term, "
        "single-term rankings are copy-invariant with one constant "
        "score ratio (the idf shift).\n\n"
        + json.dumps(out, indent=2)
        + "\n"
    )
    dest = os.path.join(REPO, "BENCH", f"SCALE_TEXT_r{args.round:02d}.txt")
    with open(dest, "w") as f:
        f.write(txt)
    print(json.dumps(out))
    print("PASS" if out["pass"] else "FAIL", "->", dest)
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
