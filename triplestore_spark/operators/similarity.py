"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k, pure Catalyst — the dot
  product is a zip_with + aggregate over the array columns, ranking
  is one window per query. The correctness baseline.
- lsh_topk: random-hyperplane LSH buckets (deterministic seed) as the
  scale path — candidates only compete within matching buckets
  (multi-probe via sign-bit neighbors), then exact cosine re-rank.
  At 100 TB the bucket join replaces the full cross product.
- embedding_near_dup_pairs: near-duplicate detection by cosine >=
  threshold within LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k by cosine,
    excluding self. Queries are broadcast (few rows) against the full
    corpus; ties broken by neighbor id for determinism."""
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cos = cosine_expr(
        F.col("qvec").cast("array<double>"),
        F.col(vec_col).cast("array<double>"),
    )
    scored = (
        embeddings.crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (numpy PCG64 with fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = (vec . plane_i) >= 0. Pure Catalyst
    fold over the plane list (literal arrays)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = _dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def with_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    planes = _hyperplanes(dim, n_planes, seed)
    return embeddings.withColumn(
        "bucket",
        lsh_signature_expr(F.col(vec_col).cast("array<double>"), planes),
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 32,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket or any
    1-bit-flip neighbor bucket (multi-probe), exact cosine re-rank
    within candidates."""
    bucketed = with_lsh_buckets(embeddings, dim, n_planes, vec_col=vec_col)
    queries = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    probes = queries.select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cos = cosine_expr(
        F.col("qvec").cast("array<double>"),
        F.col(vec_col).cast("array<double>"),
    )
    scored = (
        bucketed.join(F.broadcast(probes), on="bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (the lowest-id vectors),
    JVM-side nearest-centroid assignment, then per-cluster exact
    scoring as a grouped applyInPandas (one numpy matmul per cluster
    batch — the standard vectorized ANN shape). Queries probe their
    n_probe nearest centroids.

    At cluster scale the assignment is a narrow map and scoring
    shuffles by cluster id — candidates never leave their cluster
    partition.
    """
    import numpy as np

    spark = embeddings.sparkSession
    cent_rows = (
        embeddings.orderBy(id_col).limit(n_clusters).collect()
    )
    centroids = np.array([r[vec_col] for r in cent_rows], dtype="float64")
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    c_list = centroids.tolist()

    vec_d = F.col(vec_col).cast("array<double>")

    def centroid_score(i):
        return cosine_expr(
            vec_d, F.array(*[F.lit(float(x)) for x in c_list[i]])
        )

    scores = F.array(*[centroid_score(i) for i in range(len(c_list))])
    assigned = embeddings.withColumn(
        "cluster",
        F.array_position(scores, F.array_max(scores)).cast("int") - 1,
    )

    # queries probe their n_probe nearest centroids
    qrows = embeddings.where(F.col(id_col).isin(query_ids)).collect()
    probes = []
    for r in qrows:
        q = np.asarray(r[vec_col], dtype="float64")
        sims = centroids @ (q / np.linalg.norm(q))
        for c in np.argsort(-sims)[:n_probe]:
            probes.append((int(r[id_col]), list(map(float, r[vec_col])), int(c)))
    probe_df = spark.createDataFrame(
        probes, "query_id long, qvec array<double>, cluster int"
    )

    joined = assigned.join(F.broadcast(probe_df), on="cluster").where(
        F.col(id_col) != F.col("query_id")
    )

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.array(pdf[vec_col].tolist(), dtype="float64")
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        out = []
        for qid, grp in pdf.groupby("query_id"):
            q = np.asarray(grp["qvec"].iloc[0], dtype="float64")
            q = q / np.linalg.norm(q)
            idx = grp.index
            sims = vecs[pdf.index.get_indexer(idx)] @ q
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": grp[id_col].to_numpy(),
                        "cosine": np.round(sims, 6),
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            columns=["query_id", "neighbor_id", "cosine"]
        )

    scored = joined.groupBy("cluster").applyInPandas(score_cluster, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 32,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, candidates
    restricted to shared LSH buckets."""
    bucketed = with_lsh_buckets(embeddings, dim, n_planes, vec_col=vec_col)
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        "bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        "bucket",
    )
    cos = cosine_expr(
        F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")
    )
    return (
        a.join(b, on="bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .distinct()
        .where(F.col("cosine") >= threshold)
    )
