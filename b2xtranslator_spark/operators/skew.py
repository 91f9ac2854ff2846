"""Bucket-skew guards for LSH candidate self-joins.

Every banding scheme in this repo (minhash bands, simhash bit slices,
sign-LSH band buckets) funnels candidates through an equi-join on a bucket
key. A bucket of n rows emits O(n^2) candidate pairs, so a single degenerate
hot bucket — thousands of empty/boilerplate documents sharing a signature,
near-zero vectors sharing a sign pattern — turns an otherwise linear plan
quadratic at corpus scale. The guard drops oversized buckets BEFORE the
self-join and makes the drop observable.

Dropped buckets mean dropped recall for their members; the stats frame
exists precisely so that loss is reported, never silent. Members of a hot
bucket usually still surface through their other bands (minhash/sign-LSH
emit ``bands`` rows per item), so the practical recall cost is small unless
an item is degenerate in every band — which is exactly the pathological
content (empty text, zero vectors) a dedup pipeline wants quarantined
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_bucket_size(df: DataFrame, keys: list[str], max_rows: int) -> DataFrame:
    """Drop every bucket (distinct ``keys`` value) holding more than
    ``max_rows`` rows.

    Implemented as a count window over the bucket keys: the window shuffle
    hash-partitions on exactly the downstream join keys, so the self-join's
    own exchange requirement is already satisfied and the guard costs a
    per-partition count, not an extra full shuffle."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .where(F.col("_bucket_n") <= max_rows)
        .drop("_bucket_n")
    )


def bucket_skew_stats(df: DataFrame, keys: list[str], max_rows: int) -> DataFrame:
    """The buckets cap_bucket_size would drop: (keys..., n_rows), largest
    first. Run alongside the capped query so dropped candidate mass is a
    reported metric, not a silent recall loss."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > max_rows)
        .orderBy(F.desc("n_rows"))
    )
