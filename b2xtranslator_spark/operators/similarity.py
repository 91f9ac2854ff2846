"""Similarity search over an embedding column (`embeddings` table).

- brute-force cosine top-k: the exact baseline (oracle-checkable against
  DuckDB's list_cosine_similarity)
- LSH-bucketed ANN: sign-of-projection bucketing with deterministic
  pseudo-random hyperplanes derived from (plane, dim) index hashes, so the
  same buckets are computable on any engine without shipping weights.
  At 100TB scale the bucket join replaces the cross join: each probe only
  scans its bucket (and optionally neighboring buckets for recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against one stored query vector; deterministic
    tiebreak on vec_id. The query side is a 1-row broadcast."""
    query = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("embedding"), F.col("q"))
                    / (_norm(F.col("embedding")) * _norm(F.col("q"))), 6),
        )
        .select("vec_id", "cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _hyperplane_sign(embedding_col, plane: int):
    """Deterministic pseudo-random hyperplane: weight(plane, dim) =
    ((1 + plane*31 + dim*7) % 13) - 6, centered-ish integers. The projection
    sign is one LSH bit. Expressible identically in portable SQL."""
    weighted = F.aggregate(
        F.zip_with(
            embedding_col,
            F.sequence(F.lit(0), F.size(embedding_col) - 1),
            lambda x, d: (
                x * (((F.lit(1 + plane * 31) + d * 7) % 13) - 6).cast("double")
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(weighted >= 0, 1).otherwise(0)


def lsh_bucket(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Assign each vector its LSH bucket id (n_planes sign bits)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(F.col("embedding"), p)
    return embeddings.select("vec_id", bucket.alias("bucket"), "embedding")


def embedding_near_duplicates_fast(
    embeddings: DataFrame, threshold: float = 0.35, max_vecs: int | None = 400
) -> DataFrame:
    """NumPy-matmul variant of dedup.embedding_near_duplicates: one
    mapInPandas over a broadcast right side scores a whole Arrow batch with
    a single BLAS call (~10-100x the per-element Catalyst aggregate). Same
    output contract (vec_a < vec_b, cosine >= threshold)."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    vecs = embeddings
    if max_vecs is not None:
        vecs = vecs.where(F.col("vec_id") < max_vecs)
    rows = vecs.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def score(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy()
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_mat = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T
            ai, bi = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": b_ids[bi],
                    "cosine": np.round(sims[ai, bi], 6),
                }
            )

    return vecs.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        score, "vec_a long, vec_b long, cosine double"
    )


def cosine_topk_lsh(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, n_planes: int = 6
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket.

    The scale path: the bucket equi-join shuffles each vector once by bucket
    id instead of cross-joining; recall is tuned by n_planes (fewer planes =
    bigger buckets = higher recall)."""
    bucketed = lsh_bucket(embeddings, n_planes)
    query = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("q")
    )
    return (
        bucketed.join(
            F.broadcast(query), F.col("bucket") == F.col("qbucket")
        )
        .where(F.col("vec_id") != query_vec_id)
        .withColumn(
            "cosine",
            F.round(_dot(F.col("embedding"), F.col("q"))
                    / (_norm(F.col("embedding")) * _norm(F.col("q"))), 6),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
