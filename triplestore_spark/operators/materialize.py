"""Materialized graph snapshots: SPO / POS / OSP sorted table layouts.

The reference builds 7 in-memory hash indexes per snapshot
(reference source.go:130-164). At 100 TB the equivalent is one
canonical triple table written in three sort orders, so every point
lookup is a filter on the sort prefix of the best layout:

    WithSubject / WithSubjPred / WithSubjObj / Contains -> SPO
    WithPredicate / WithPredObj                         -> POS
    WithObject                                          -> OSP

Each layout is range-partitioned on its leading key and sorted within
partitions, so Parquet min/max statistics prune both files and row
groups (Iceberg `write.sorted-by` semantics; locally emulated with
repartitionByRange + sortWithinPartitions — no Iceberg jars in this
sandbox, see SURVEY.md §7.4; on a real cluster the writer switches to
`USING iceberg` DDL with the same sort specs).

Snapshot versioning (the reference's dirty-flag memoization,
source.go:87-97): `_manifest.json` carries a content fingerprint
(count + xor of tkey hashes); re-materializing an unchanged source is
a no-op.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from triplestore_spark import schema as S
from triplestore_spark.dsl import Obj
from triplestore_spark.operators.graph import RDFGraph, dedup_triples

# Sort/partition keys are the COMPONENT columns, not the derived
# okey/tkey strings: the object components induce an equally valid
# clustering (all rows of one object are contiguous), the range
# shuffle ships ~150 fewer bytes per row, and point lookups push
# component equality down onto parquet min/max stats directly.
_OBJ = ["object_kind", "object_value", "object_type", "object_lang"]
LAYOUTS = {
    "spo": ["subject", "predicate", *_OBJ],
    "pos": ["predicate", *_OBJ, "subject"],
    "osp": [*_OBJ, "subject", "predicate"],
}

MANIFEST = "_manifest.json"


def graph_fingerprint(df: DataFrame) -> dict:
    """Deterministic content fingerprint of a keyed triple set:
    (count, xor/sum of xxhash64(tkey)). Order-insensitive; cheap
    (one partial-agg pass, no sort)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("tkey")), F.lit(0)).alias("hx"),
        F.coalesce(
            F.bit_xor(F.xxhash64("tkey", F.lit(1))), F.lit(0)
        ).alias("hx2"),
        # logical payload size (the tkey is the concatenation of every
        # component, so its length ~= the row's text bytes); rides the
        # same partial-agg pass for free and sizes the layout writes
        F.coalesce(F.sum(F.length("tkey")), F.lit(0)).alias("nbytes"),
    ).collect()[0]
    return {
        "count": row["n"],
        "hx": int(row["hx"]),
        "hx2": int(row["hx2"]),
        "nbytes": int(row["nbytes"]),
    }


def layout_partitions(fp: dict) -> int:
    """Derive the layout write's partition count from the DATA SIZE,
    not a constant (guide §2/§6: scale-adaptive partitioning, output
    file sizing): one partition per TARGET logical bytes of triple
    text (`nbytes` from graph_fingerprint), so a 10x corpus gets 10x
    the files and a tiny corpus is not sprayed across 32 near-empty
    sorted files (measured: 3-layout write of the sf1.0-sim corpus
    3.3 s at the old constant 32 vs 2.6 s size-derived; 2.7 s -> 1.4 s
    at sf0.1 — OPTIMIZATION_r07.md). The default target is
    local-sized; production deployments set
    SPARK_GRAFT_MATERIALIZE_PARTITION_BYTES to ~512 MB (logical) for
    100-200 MB zstd parquet files per guide §6, or move the writer to
    Iceberg write.target-file-size-bytes. Shared with
    tools/plan_capture.py so the captured write plans always match the
    real writer's partitioning."""
    target = int(
        os.environ.get(
            "SPARK_GRAFT_MATERIALIZE_PARTITION_BYTES",
            str(8 * 1024 * 1024),
        )
    )
    return max(1, -(-int(fp.get("nbytes", 0)) // max(1, target)))


def materialize_graph(
    df: DataFrame,
    path: str,
    layouts: tuple[str, ...] = ("spo", "pos", "osp"),
    num_partitions: Optional[int] = None,
    force: bool = False,
) -> dict:
    """Write a deduped canonical triple set in the requested layouts.

    Returns the manifest. Skips the write when the fingerprint matches
    the existing manifest (snapshot memoization)."""
    if getattr(df, "_ts_canonical", False) and "tkey" in df.columns:
        # already the exact output of dedup_triples (marker set there):
        # re-deduplicating would repeat the full exchange + aggregate
        src = df
    else:
        src = dedup_triples(df)
    # cache the 7 COMPONENT columns only: the derived okey/tkey strings
    # (~150 B/row, about half the row) are recomputed by a codegen
    # concat wherever needed — the fingerprint derives tkey on the fly
    # over the cached components, and the layout writes read exactly
    # the stored columns (r7: smaller cache, same passes)
    canon = src.select(*S.TRIPLE_FIELDS).cache()
    from triplestore_spark.functions.keys import with_keys

    fp = graph_fingerprint(with_keys(canon))

    manifest_path = os.path.join(path, MANIFEST)
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        # content identity is (count, hx, hx2) — compare exactly those
        # keys so manifests written before the fingerprint grew its
        # `nbytes` sizing field still memoize instead of re-writing an
        # unchanged snapshot
        def _core(d: dict) -> tuple:
            return (d.get("count"), d.get("hx"), d.get("hx2"))

        if _core(old.get("fingerprint", {})) == _core(fp) and set(
            old.get("layouts", [])
        ) >= set(layouts):
            canon.unpersist()
            return old

    if num_partitions is None:
        num_partitions = layout_partitions(fp)

    bare = canon

    def write_layout(layout: str) -> None:
        keys = LAYOUTS[layout]
        (
            # store the 7 component columns ONLY: the derived okey/
            # tkey strings (~150 B/row x 3 layout copies) are pure
            # redundancy — they are derived at scan time by a codegen
            # concat, and every lookup pushes down component equality
            bare.repartitionByRange(num_partitions, *[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
            .write.mode("overwrite")
            .parquet(os.path.join(path, layout))
        )

    # submit the three layout jobs concurrently: they read the same
    # cached canon, and overlapping their shuffle-read tails and
    # commit phases keeps cores busy (measured 1.7x on the write
    # phase at local[32]; on a cluster concurrent jobs share
    # executors via the scheduler the same way)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(layouts)) as ex:
        list(ex.map(write_layout, layouts))

    manifest = {
        "version": 1,
        "fingerprint": fp,
        "layouts": list(layouts),
        "num_partitions": num_partitions,
        "sort_specs": {layout: LAYOUTS[layout] for layout in layouts},
    }
    os.makedirs(path, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    canon.unpersist()
    return manifest


class MaterializedGraph(RDFGraph):
    """RDFGraph over materialized layouts: every lookup reads the
    layout whose sort prefix matches the predicate, so Parquet
    min/max stats skip non-matching files/row-groups."""

    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self._path = path
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        self._layout_cache: dict[str, DataFrame] = {}
        base = self.layout("spo")
        super().__init__(base, cache=False)
        self._count = self.manifest["fingerprint"]["count"]

    def layout(self, name: str) -> DataFrame:
        """The keyed frame of one sorted layout ('spo'/'pos'/'osp');
        falls back to the first materialized layout when the requested
        one was not written. Public: BGP pattern routing
        (operators/bgp.py) picks its scan source here."""
        if name not in self._layout_cache:
            if name not in self.manifest["layouts"]:
                name = self.manifest["layouts"][0]
            from triplestore_spark.functions.keys import with_keys

            # okey/tkey are derived at scan time (whole-stage-codegen
            # concat over the stored components)
            self._layout_cache[name] = with_keys(
                self._spark.read.parquet(os.path.join(self._path, name))
            )
        return self._layout_cache[name]

    # route each lookup to the best-sorted copy
    def with_subject(self, s: str) -> DataFrame:
        return self.layout("spo").where(F.col("subject") == s)

    def with_subj_pred(self, s: str, p: str) -> DataFrame:
        return self.layout("spo").where(
            (F.col("subject") == s) & (F.col("predicate") == p)
        )

    def with_subj_obj(self, s: str, o: Obj) -> DataFrame:
        from triplestore_spark.operators.graph import object_predicate

        return self.layout("spo").where(
            (F.col("subject") == s) & object_predicate(o)
        )

    def with_predicate(self, p: str) -> DataFrame:
        return self.layout("pos").where(F.col("predicate") == p)

    def with_pred_obj(self, p: str, o: Obj) -> DataFrame:
        from triplestore_spark.operators.graph import object_predicate

        return self.layout("pos").where(
            (F.col("predicate") == p) & object_predicate(o)
        )

    def with_object(self, o: Obj) -> DataFrame:
        from triplestore_spark.operators.graph import object_predicate

        return self.layout("osp").where(object_predicate(o))
