"""Banded Hamming pair-finding over any integer signature column.

The pigeonhole construction shared by text SimHash and image dHash dedup:
slice a ``bits``-wide signature into ``bands`` disjoint bit ranges and
equi-join on (band, slice) — any pair within ``bands - 1`` Hamming distance
shares at least one identical band, so the candidate join has 100% recall
for ``max_hamming <= bands - 1``; an exact popcount(xor) filter verifies.
The shuffle is O(rows x bands), skew-guarded, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import cap_bucket_size


def banded_hamming_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
    max_bucket_size: int,
    out_prefix: str,
) -> DataFrame:
    """(id, hash) -> (``{out_prefix}_a``, ``{out_prefix}_b``, hamming) pairs
    with hamming <= max_hamming. Recall is complete while
    max_hamming <= bands - 1 and no band bucket exceeded the skew cap
    (dropped buckets are observable via skew.bucket_skew_stats)."""
    if not 1 <= bands <= bits:
        raise ValueError(f"bands must be in [1, bits={bits}], got {bands}")
    width = bits // bands
    # the last band absorbs bits % bands so every signature bit is covered —
    # otherwise two hashes differing only in the top remainder bits would
    # never become candidates and the pigeonhole recall guarantee would
    # silently break for bits not divisible by bands.
    last_width = bits - (bands - 1) * width
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(hash_col, b * width)
            .bitwiseAND(
                F.lit((1 << (last_width if b == bands - 1 else width)) - 1)
            )
            .alias("key"),
        )
        for b in range(bands)
    ]
    keyed = sig.select(
        id_col, hash_col, F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, hash_col, "bk.band", "bk.key")
    keyed = cap_bucket_size(keyed, ["band", "key"], max_bucket_size)
    ca, cb = f"{out_prefix}_a", f"{out_prefix}_b"
    a = keyed.select(
        F.col(id_col).alias(ca), F.col(hash_col).alias("ha"), "band", "key"
    )
    b = keyed.select(
        F.col(id_col).alias(cb), F.col(hash_col).alias("hb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col(ca) < F.col(cb))
        .dropDuplicates([ca, cb])
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select(ca, cb, "hamming")
    )
