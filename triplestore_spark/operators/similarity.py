"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k, pure Catalyst — the dot
  product is a zip_with + aggregate over the array columns, ranking
  is one window per query. The correctness baseline.
- lsh_topk: banded random-hyperplane LSH (OR-construction over
  `bands` independent sign-bit buckets, deterministic seed) as the
  scale path — a corpus vector competes iff ANY band bucket matches
  the query's, then exact cosine re-ranks. At 100 TB the bucket join
  replaces the full cross product, and only (id, band, bucket) rows
  ride the shuffle.
- embedding_near_dup_pairs: near-duplicate detection by cosine >=
  threshold within LSH buckets.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

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


def _norm_zero_safe(a: Column) -> Column:
    # Spark's Divide returns null on a 0 divisor; clamp zero norms to
    # 1.0 so a zero vector scores 0.0 against every centroid — the same
    # convention the Arrow matmul path applies (vn[vn == 0] = 1.0).
    n = _norm(a)
    return F.when(n == F.lit(0.0), F.lit(1.0)).otherwise(n)


def cosine_zero_safe_expr(a: Column, b: Column) -> Column:
    """cosine_expr with zero-norm inputs scoring 0.0 instead of null —
    keeps the Catalyst centroid assigner's output (incl. nullability)
    identical to the Arrow path across CENTROID_EXPR_MAX_TERMS."""
    return _dot(a, b) / (_norm_zero_safe(a) * _norm_zero_safe(b))


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


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 32,
    bands: int = 16,
    rows_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via banded hyperplane LSH (OR-construction):
    a corpus vector is a candidate if ANY of `bands` independent
    rows_per_band-bit sign buckets matches the query's, then exact
    cosine re-ranks the candidates. Recall at cosine c is
    1-(1-p^r)^b with p = 1-acos(c)/pi — the defaults give ~0.93 at
    c=0.6 and ~0.8 at c=0.5, where round 2's single-bucket +
    1-bit-multiprobe design recalled <0.3 (measured; redesigned to
    the embedding_near_dup_pairs banding it already shares code with).

    Scale shape: the band join ships only (id, band, bucket) rows;
    vectors are re-joined per candidate id AFTER dedup, so the wide
    embedding column never rides the bucket shuffle."""
    buckets = embeddings.select(
        F.col(id_col).alias("nid"),
        F.posexplode(
            banded_bucket_udf(dim, bands, rows_per_band, seed)(
                F.col(vec_col).cast("array<double>")
            )
        ).alias("band", "bucket"),
    )
    qbuckets = buckets.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), "band", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(qbuckets), on=["band", "bucket"])
        .where(F.col("nid") != F.col("query_id"))
        .select("query_id", F.col("nid").alias("neighbor_id"))
        .distinct()
    )
    qvecs = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    nvecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nvec"),
    )
    cos = cosine_expr(F.col("qvec"), F.col("nvec"))
    scored = (
        cand.join(F.broadcast(qvecs), on="query_id")
        .join(nvecs, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
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


def _ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int,
    lloyd_iters: int,
    id_col: str,
    vec_col: str,
):
    """Deterministic k-means-style centroids: seeds are a hash-spread
    sample (order by xxhash64(id) — uniform across the id space, not
    the id prefix round 1 used), refined by `lloyd_iters` distributed
    Lloyd steps: JVM-side nearest-centroid assign, then a
    posexplode + groupBy(cluster, dim) mean — only k x dim aggregated
    doubles ever reach the driver."""
    import numpy as np

    seed_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_clusters)
        .collect()
    )
    centroids = np.array([r[vec_col] for r in seed_rows], dtype="float64")
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    vec_d = F.col(vec_col).cast("array<double>")
    for _ in range(lloyd_iters):
        assigned = embeddings.withColumn(
            "cluster", nearest_centroid_col(vec_d, centroids.tolist())
        )
        means = (
            assigned.select(
                "cluster", F.posexplode(vec_d).alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()  # empty clusters keep their centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for c, dims in by_cluster.items():
            v = np.array([dims[d] for d in sorted(dims)], dtype="float64")
            nrm = np.linalg.norm(v)
            if nrm > 0:
                new[c] = v / nrm
        centroids = new
    return centroids


def _nearest_centroid_expr(vec_d: Column, c_list: list[list[float]]) -> Column:
    scores = F.array(
        *[
            cosine_zero_safe_expr(vec_d, F.array(*[F.lit(float(x)) for x in c]))
            for c in c_list
        ]
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


# n_clusters * dim above which the literal Catalyst expression (one
# cosine fold per centroid, every centroid embedded as literal arrays)
# stops being codegen-friendly — production k (thousands of clusters)
# would blow up the generated code. Past it, assignment switches to a
# single Arrow-batched numpy matmul per batch: same argmax-of-cosine
# semantics, first-max tie-breaking on both paths.
CENTROID_EXPR_MAX_TERMS = 4096


def _nearest_centroid_udf(c_list: list[list[float]]):
    import numpy as np

    C = np.array(c_list, dtype="float64")
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    C = C / cn

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype="float64")
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        sims = (V / vn) @ C.T
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return _assign


def nearest_centroid_col(vec_d: Column, c_list: list[list[float]]) -> Column:
    """Cluster id of the nearest (max-cosine) centroid. Dispatches on
    n_clusters x dim: small models stay pure-Catalyst (whole-stage
    codegen, no Python); past CENTROID_EXPR_MAX_TERMS the Arrow matmul
    path takes over (the banded_bucket_udf pattern). Both paths are
    deterministic and pick the FIRST maximal centroid on ties —
    parity is locked by tests/test_dataops.py."""
    n_terms = len(c_list) * (len(c_list[0]) if c_list else 0)
    if n_terms <= CENTROID_EXPR_MAX_TERMS:
        return _nearest_centroid_expr(vec_d, c_list)
    return _nearest_centroid_udf(c_list)(vec_d)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: deterministic hash-sampled + Lloyd-refined
    centroids, JVM-side nearest-centroid assignment, then per-cluster
    exact scoring as a grouped applyInPandas (one numpy matmul per
    cluster batch — the standard vectorized ANN shape). Queries probe
    their n_probe nearest centroids.

    At cluster scale the assignment is a narrow map and scoring
    shuffles by cluster id — candidates never leave their cluster
    partition.
    """
    import numpy as np

    spark = embeddings.sparkSession
    centroids = _ivf_centroids(
        embeddings, n_clusters, lloyd_iters, id_col, vec_col
    )
    c_list = centroids.tolist()

    vec_d = F.col(vec_col).cast("array<double>")
    assigned = embeddings.withColumn(
        "cluster", nearest_centroid_col(vec_d, c_list)
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


def banded_bucket_udf(
    dim: int, bands: int, rows_per_band: int, seed: int = 42
):
    """Arrow-batched band-bucket signature: one (n, bands*rows) sign
    matmul per batch, each band's row bits packed into a long. At
    bands*rows ~ 128 planes this beats the Catalyst literal-fold
    (8k-literal codegen) by a wide margin — the vectorized scale path."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal(
        (bands * rows_per_band, dim)
    )
    weights = (1 << np.arange(rows_per_band)).astype("int64")

    @F.pandas_udf("array<bigint>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype="float64")
        bits = (V @ planes.T >= 0).astype("int64")
        buckets = bits.reshape(len(V), bands, rows_per_band) @ weights
        return pd.Series(list(buckets))

    return _buckets


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 32,
    bands: int = 16,
    rows_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    Banded OR-construction (the minhash-band pattern on hyperplane
    bits): a pair is a candidate if ANY of `bands` independent
    rows_per_band-bit sign buckets matches, then exact cosine
    verifies. Recall at cosine c: 1-(1-p^r)^b with p = 1-acos(c)/pi —
    defaults give ~0.97 at c=0.90 and >0.999 at c=0.95 (a single
    8-plane bucket, round 1's design, missed ~70% at c=0.90).

    Scale shape: the band join ships only (id, band, bucket) rows —
    vectors are re-joined per id AFTER candidate dedup, so the wide
    embedding column never rides the bucket shuffle."""
    buckets = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            banded_bucket_udf(dim, bands, rows_per_band, seed)(
                F.col(vec_col).cast("array<double>")
            )
        ).alias("band", "bucket"),
    )
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, on=["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("vec_a"),
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vec_b"),
    )
    cos = cosine_expr(F.col("vec_a"), F.col("vec_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _planted_offsets(dim: int, alpha: float = 0.4, seed: int = 7) -> list[float]:
    """Deterministic unit offset * alpha, shared verbatim by the Spark
    expression and the DuckDB oracle (repr round-trips doubles)."""
    import numpy as np

    u = np.random.default_rng(seed).standard_normal(dim)
    u = alpha * (u / np.linalg.norm(u))
    return [float(x) for x in u]


def with_planted_near_dups(
    embeddings: DataFrame,
    dim: int,
    every: int = 25,
    id_offset: int = 1_000_000,
    alpha: float = 0.4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a perturbed copy of every `every`-th vector: id+offset,
    vec + alpha*u (fixed unit u). For unit-norm inputs the planted
    pair lands at cosine ~ 1/sqrt(1+alpha^2) +- (v.u) jitter —
    alpha=0.4 puts it in the 0.90-0.95 near-dup window. Used by the
    recall tests and the oracled gate (planted_near_dup_sql is the
    DuckDB-side twin)."""
    c = _planted_offsets(dim, alpha, seed)
    planted = embeddings.where((F.col(id_col) % every) == 0).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.array(*[F.lit(x) for x in c]),
            lambda v, off: v + off,
        ).alias(vec_col),
    )
    base = embeddings.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    return base.unionByName(planted)


def planted_near_dup_sql(
    dim: int,
    threshold: float = 0.9,
    every: int = 25,
    id_offset: int = 1_000_000,
    alpha: float = 0.4,
    seed: int = 7,
) -> str:
    """DuckDB oracle for embedding_near_dup_pairs over the planted
    table: EXACT all-pairs cosine (the LSH result must equal it —
    recall 1.0 on this data is asserted by the local gate run)."""
    c = _planted_offsets(dim, alpha, seed)
    lits = ", ".join(repr(x) for x in c)
    return f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    planted AS (
      SELECT vec_id + {id_offset} AS vec_id,
             list_transform(
               list_zip(v, CAST([{lits}] AS DOUBLE[])), s -> s[1] + s[2]
             ) AS v
      FROM base WHERE vec_id % {every} = 0
    ),
    aug AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
    """
