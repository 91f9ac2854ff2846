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
