"""Stage checkpointing with per-partition lineage + metrics (north_rule).

Each pipeline stage writes its output parquet PLUS:

- `_lineage.json`: the stage's input fingerprint (deterministic
  content hash of its input), row count, wall time, status. On rerun,
  a stage whose recorded input fingerprint matches is SKIPPED and its
  parquet is reused — resume-from-failure at stage granularity: kill
  the job after stage k, rerun, stages 1..k are read back, k+1..n
  recompute, output byte-identical (tested in test_checkpoint.py).
- `_partitions.parquet`: per-partition (partition_id, rows,
  min/max tkey) metrics — the lineage/metrics table the north_rule
  asks for; doubles as a skew histogram for the bench harness.

The reference has no failure story (single process, in-memory); this
is the Spark-native addition its Snapshot memoization
(source.go:87-97) grows into at cluster scale.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE = "_lineage.json"
PARTITIONS = "_partitions.parquet"


def write_partition_metrics(df: DataFrame, path: str, key: str = "tkey") -> None:
    metrics = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.min(key).alias("min_key"),
        F.max(key).alias("max_key"),
    )
    metrics.write.mode("overwrite").parquet(os.path.join(path, PARTITIONS))


def read_partition_metrics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, PARTITIONS))


class CheckpointedPipeline:
    """Run named stages with skip-if-done semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(
        self,
        name: str,
        input_fingerprint: dict,
        compute: Callable[[], DataFrame],
        metrics_key: str = "tkey",
    ) -> DataFrame:
        """Return the stage output, recomputing only when the input
        fingerprint changed (or no checkpoint exists)."""
        d = self._stage_dir(name)
        lineage_path = os.path.join(d, LINEAGE)
        data_path = os.path.join(d, "data.parquet")

        if os.path.exists(lineage_path):
            with open(lineage_path) as f:
                lineage = json.load(f)
            if (
                lineage.get("input_fingerprint") == input_fingerprint
                and lineage.get("status") == "complete"
            ):
                return self.spark.read.parquet(data_path)

        t0 = time.time()
        out = compute()
        out.write.mode("overwrite").parquet(data_path)
        written = self.spark.read.parquet(data_path)
        if metrics_key in written.columns:
            write_partition_metrics(written, d, metrics_key)
        lineage = {
            "stage": name,
            "input_fingerprint": input_fingerprint,
            "rows": written.count(),
            "wall_sec": round(time.time() - t0, 3),
            "status": "complete",
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        os.makedirs(d, exist_ok=True)
        with open(lineage_path, "w") as f:
            json.dump(lineage, f, indent=2)
        return written

    def lineage(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, name, LINEAGE)
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out


def input_fingerprint(spark: SparkSession, *paths: str) -> dict:
    """Cheap deterministic fingerprint of input files (name, size,
    mtime) — no data scan; used as the stage invalidation key."""
    entries = []
    for path in paths:
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [path]
        for f in files:
            st = os.stat(f)
            entries.append([os.path.basename(f), st.st_size, int(st.st_mtime)])
    return {"files": entries}


def run_pipeline_checkpointed(
    spark: SparkSession, sf_dir: str, root: str
) -> DataFrame:
    """The flagship pipeline, cut into resumable stages:
    candidates -> canonical (dedup)."""
    from triplestore_spark.functions.keys import with_keys
    from triplestore_spark.operators.graph import dedup_triples
    from triplestore_spark.pipeline.corpus import read_documents
    from triplestore_spark.pipeline.run import candidate_triples

    cp = CheckpointedPipeline(spark, root)
    fp = input_fingerprint(spark, os.path.join(sf_dir, "documents.parquet"))

    candidates = cp.stage(
        "s1_candidates",
        fp,
        lambda: with_keys(
            candidate_triples(spark, read_documents(spark, sf_dir))
        ),
    )
    canonical = cp.stage(
        "s2_canonical",
        {"upstream": fp, "op": "dedup_tkey"},
        lambda: dedup_triples(candidates),
    )
    return canonical
