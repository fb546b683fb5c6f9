"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compares row count + sorted-column value
multiset. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from triplestore_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=16)

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        status = []
        if name not in oracles:
            status.append(f"rows-only n={len(srows)}")
            print(f"  {name:28s} {len(srows):8d} rows   (no oracle) "
                  f"[{time.time()-t0:5.1f}s]")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_schema = sorted(scols) == sorted(dcols)
        s_norm = normalize(srows, scols)
        d_norm = normalize(drows, dcols)
        ok_rows = len(srows) == len(drows)
        ok_vals = s_norm == d_norm
        ok = ok_schema and ok_rows and ok_vals
        mark = "OK " if ok else "FAIL"
        print(
            f"  {name:28s} {len(srows):8d} rows   {mark} "
            f"(schema={ok_schema} count={ok_rows} values={ok_vals}) "
            f"[{time.time()-t0:5.1f}s]"
        )
        if not ok:
            failures.append(name)
            if not ok_schema:
                print(f"    spark cols:  {sorted(scols)}")
                print(f"    duckdb cols: {sorted(dcols)}")
            for i, (a, b) in enumerate(zip(s_norm, d_norm)):
                if a != b:
                    print(f"    first diff @{i}:\n      spark:  {a}\n      duckdb: {b}")
                    break
            if len(s_norm) != len(d_norm):
                print(f"    counts: spark={len(s_norm)} duckdb={len(d_norm)}")

    print(("ALL OK" if not failures else f"FAILURES: {failures}"))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
