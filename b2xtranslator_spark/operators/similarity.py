"""Similarity search over an embedding column (`embeddings` table).

- brute-force cosine top-k: the exact baseline (oracle-checkable against
  DuckDB's list_cosine_similarity)
- sign-of-projection LSH with deterministic pseudo-random hyperplanes whose
  integer weights are pure arithmetic in (plane, dim) — so the exact same
  buckets are computable on any engine (DuckDB oracle included) without
  shipping weights. The plane family includes a plane*dim cross term: without
  it every plane is a shifted window of one LCG sequence and bands are
  correlated (measured: recall plateaus no matter how many bands are added).
- banded LSH near-duplicate pipeline: candidates from a per-band bucket
  equi-join (shuffle O(vecs x bands), never all-pairs), verified by exact
  cosine. At 100 TB this replaces the cross join; threshold drives the
  (planes_per_band, bands) choice — high thresholds (0.9+) want long bands
  (8+ planes) for tiny buckets, low thresholds want short bands + more of
  them for recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic hyperplane family: weight(plane, dim) =
#   ((M1*plane + M2*dim + MX*plane*dim + C) % MOD) - (MOD-1)/2
# The MX cross term decorrelates planes (see module docstring).
_M1, _M2, _MX, _C, _MOD = 48271, 69621, 2654435761, 7919, 2001
_HALF = (_MOD - 1) // 2  # 1000


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
    """Sign of the projection onto deterministic hyperplane ``plane`` — one
    LSH bit. Integer weights, expressible identically in portable SQL."""
    weighted = F.aggregate(
        F.zip_with(
            embedding_col,
            F.sequence(F.lit(0), F.size(embedding_col) - 1),
            lambda x, d: x.cast("double") * (
                (
                    (F.lit(_M1 * plane) + F.lit(_M2) * d
                     + F.lit(_MX * plane) * d + F.lit(_C)) % _MOD
                ) - _HALF
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(weighted >= 0, 1).otherwise(0)


def _hyperplane_sign_sql(plane: int, col: str = "embedding") -> str:
    """SQL-string twin of _hyperplane_sign — identical integer-weight
    arithmetic, parsed server-side in one call (building the per-plane
    zip_with/aggregate lambdas through the column API cost ~0.15 s of
    py4j round trips per query, measured optimization round 6)."""
    m1p = _M1 * plane
    mxp = _MX * plane
    return (
        f"(CASE WHEN aggregate(zip_with({col}, sequence(0, size({col}) - 1), "
        f"(x, d) -> CAST(x AS DOUBLE) * CAST((({m1p} + {_M2} * d + {mxp} * d "
        f"+ {_C}) % {_MOD}) - {_HALF} AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END)"
    )


def lsh_bucket(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Assign each vector its LSH bucket id (n_planes sign bits)."""
    # bucket = fold(bucket*2 + sign_p)  ==  sum_p sign_p * 2^(n-1-p);
    # one parsed expression, same integer value
    terms = " + ".join(
        f"({1 << (n_planes - 1 - p)} * {_hyperplane_sign_sql(p)})"
        for p in range(n_planes)
    )
    return embeddings.select(
        "vec_id", F.expr(f"0 + {terms}").alias("bucket"), "embedding"
    )


def _plane_matrix(n_planes: int, dim: int):
    """The deterministic integer weight matrix, NumPy form (same formula as
    _hyperplane_sign)."""
    import numpy as np

    p = np.arange(n_planes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    return ((_M1 * p + _M2 * d + _MX * p * d + _C) % _MOD - _HALF).astype(np.float64)


def lsh_band_buckets(
    embeddings: DataFrame,
    bands: int,
    planes_per_band: int,
    carry_embedding: bool = True,
) -> DataFrame:
    """One row per (vector, band): the band's bucket key from its own
    disjoint slice of the plane family. The downstream equi-join on
    (band, bucket) is the scale path — each vector shuffles ``bands`` times,
    never pairwise.

    All bands*planes projections are ONE BLAS matmul per Arrow batch
    (mapInPandas) against the deterministic integer plane matrix — measured
    ~10x the 40 interpreted Catalyst array-folds this replaced, and a pure
    map (no shuffle). Integer weights times float64 products are exact, so
    the only engine-dependence is FP summation order on projections that
    land exactly at zero — the recall margin (and the exact-cosine verify
    stage downstream) absorbs it.

    ``carry_embedding=True`` duplicates the full vector through the band
    shuffle (bands x byte amplification on the widest column — with the
    default 20 bands that is 20x the embedding bytes). ``False`` emits only
    (vec_id, band, bucket) — the id-only rows shuffle at ~1/30th the bytes
    for a 64-dim float vector and the verify stage re-joins embeddings by
    vec_id (two extra hash joins). Benchmarked both at sf0.1
    (BENCH/BASELINE.md round 3): carrying wins while embedding bytes/row is
    below roughly the dedup-join row overhead; at corpus scale with wide
    vectors (>=256 dims) the id-only plan shuffles an order of magnitude
    fewer bytes and is the default recommendation."""
    import numpy as np
    import pandas as pd

    n_planes = bands * planes_per_band

    def kernel(batches):
        planes_t = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            if planes_t is None:
                planes_t = _plane_matrix(n_planes, mat.shape[1]).T
            bits = (mat @ planes_t >= 0).astype(np.int64)  # n x planes
            # band keys: planes_per_band bits -> integer per band
            keys = np.zeros((len(pdf), bands), dtype=np.int64)
            for b in range(bands):
                for r in range(planes_per_band):
                    keys[:, b] = keys[:, b] * 2 + bits[:, b * planes_per_band + r]
            cols = {
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), bands),
                "band": np.tile(np.arange(bands), len(pdf)),
                "bucket": keys.reshape(-1),
            }
            if carry_embedding:
                cols["embedding"] = [
                    e for e in pdf["embedding"] for _ in range(bands)
                ]
            yield pd.DataFrame(cols)

    schema = (
        "vec_id long, band int, bucket long, embedding array<float>"
        if carry_embedding
        else "vec_id long, band int, bucket long"
    )
    return embeddings.select("vec_id", "embedding").mapInPandas(kernel, schema)


from .skew import bucket_skew_stats, cap_bucket_size  # noqa: E402,F401 re-export


def embedding_near_duplicates_lsh(
    embeddings: DataFrame,
    threshold: float = 0.35,
    max_vecs: int | None = 400,
    bands: int = 20,
    planes_per_band: int = 2,
    max_bucket_size: int = 100_000,
    carry_vectors: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded sign-LSH candidates + exact-cosine
    verify. Same output contract as dedup.embedding_near_duplicates (the
    exact cross-join spec), but candidates come from per-(band, bucket)
    grouping — O(vecs x bands) shuffle rows — so the plan survives corpus
    scale where the cross join cannot. Recall is tuned by
    (bands, planes_per_band); the defaults give 100% recall at threshold
    0.35 on the test corpus with a 4-band margin (empirically 0 misses
    from 16 bands up).

    Plan (optimization round 6, guide §8 "decide with small rows, move big
    rows once"): the band kernel emits ID-ONLY rows; each (band, bucket)
    is grouped ONCE and ordered candidate pairs are generated row-locally
    (two-level explode, per-row memory O(bucket)); pairs are de-duplicated
    while still id-only (a pair surfaces from up to ``bands`` buckets, so
    deduplicating AFTER attaching vectors shuffled the embedding payload
    once per surfacing — measured 398k heavy rows vs 80k id pairs on the
    bench); only then are embeddings + precomputed norms attached by join
    for the exact-cosine verify. The old shape was a self equi-join that
    executed the band kernel twice plus a window-count skew pass and
    carried embeddings through every stage. The size filter on the grouped
    bucket IS the skew cap (same drop-oversized-bucket semantics as
    operators.skew.cap_bucket_size); report drops via bucket_skew_stats.

    ``max_bucket_size`` caps candidate generation per (band, bucket): a hot
    bucket of n rows emits n^2/2 pairs, so one degenerate signature (e.g.
    thousands of near-zero vectors sharing a sign pattern) would otherwise
    dominate the job.

    ``carry_vectors`` is retained for API compatibility; since the round-6
    restructure both settings execute the same id-only plan (carrying the
    vectors through the pair stages was strictly more shuffle bytes for
    identical results)."""
    vecs = embeddings
    if max_vecs is not None:
        vecs = vecs.where(F.col("vec_id") < max_vecs)
    bb = lsh_band_buckets(vecs, bands, planes_per_band, carry_embedding=False)
    grouped = (
        bb.groupBy("band", "bucket")
        .agg(F.collect_list("vec_id").alias("ids"))
        .where(F.size("ids").between(2, max_bucket_size))
    )
    # outer explode walks left positions so per-row memory stays O(bucket)
    lefts = grouped.select(
        "ids",
        F.explode(F.sequence(F.lit(1), F.size("ids") - 1)).alias("p"),
    )
    ids = (
        lefts.select(
            F.element_at("ids", F.col("p")).alias("x"),
            F.explode(
                F.slice("ids", F.col("p") + 1, F.size("ids") - F.col("p"))
            ).alias("y"),
        )
        .select(
            F.least("x", "y").alias("vec_a"),
            F.greatest("x", "y").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    # attach embeddings once per deduplicated pair; the norm is computed
    # once per VECTOR here (same Catalyst expression as the old per-pair
    # fold -> bit-identical values) because a vector lands in O(bucket)
    # pairs and the interpreted higher-order fold per pair dominated the
    # verify stage
    sides = vecs.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    ea = sides.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    eb = sides.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cand = ids.join(ea, "vec_a").join(eb, "vec_b")
    return (
        cand.withColumn(
            "cosine",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_near_duplicates_fast(
    embeddings: DataFrame,
    threshold: float = 0.35,
    max_vecs: int | None = 400,
    bands: int = 20,
    planes_per_band: int = 2,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """NumPy-matmul variant of embedding_near_duplicates_lsh: one BLAS call
    per (band, bucket) group via applyInPandas scores the whole bucket at
    once (~10-100x the per-element Catalyst aggregate). No driver collect,
    no broadcast of vector data — each bucket is scored where it lands after
    the band shuffle. Rounding is half-away-from-zero to match Spark's
    F.round / the DuckDB oracle exactly on both signs (np.round is banker's
    rounding, and floor(x*1e6+0.5) rounds negative halves toward +inf;
    ADVICE r01/r02).

    The dense n x n similarity matrix is O(bucket^2) memory, so the skew
    guard is mandatory here: buckets over ``max_bucket_size`` are dropped
    pre-shuffle via cap_bucket_size (so no oversized group is ever
    materialized as a pandas frame, let alone an n x n allocation) — report
    them via bucket_skew_stats."""
    import numpy as np
    import pandas as pd

    vecs = embeddings
    if max_vecs is not None:
        vecs = vecs.where(F.col("vec_id") < max_vecs)
    bb = lsh_band_buckets(vecs, bands, planes_per_band)
    # drop hot buckets BEFORE the group shuffle: applyInPandas materializes
    # each group as one in-memory pandas frame, so a degenerate bucket of
    # vectors would OOM the Python worker before the kernel's own size check
    # ever ran (the window-count guard spills JVM-side instead)
    bb = cap_bucket_size(bb, ["band", "bucket"], max_bucket_size)

    empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_bucket_size:  # defense-in-depth; capped upstream
            return empty
        ids = pdf["vec_id"].to_numpy()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        # HALF_UP on magnitude, sign restored = round half away from zero
        rounded = np.copysign(np.floor(np.abs(sims) * 1e6 + 0.5), sims) / 1e6
        ai, bi = np.nonzero((rounded >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"vec_a": ids[ai], "vec_b": ids[bi], "cosine": rounded[ai, bi]}
        )

    pairs = bb.groupBy("band", "bucket").applyInPandas(
        score_bucket, "vec_a long, vec_b long, cosine double"
    )
    # a pair can surface from several bands with the identical cosine
    return pairs.dropDuplicates(["vec_a", "vec_b"])


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 4,
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: score only vectors in (or near) the query's LSH bucket.

    The scale path: the bucket equi-join shuffles each vector once by bucket
    id instead of cross-joining; recall is tuned by n_planes (fewer planes =
    bigger buckets = higher recall) AND by multi-probe: ``probe_hamming`` > 0
    also scans buckets whose id differs from the query's in at most that many
    sign bits — the standard multi-probe recall lever that costs no extra
    shuffle (the probe set rides the broadcast join condition). Deterministic
    planes make the bucket assignment — and therefore the result —
    oracle-expressible in SQL (popcount(xor) <= probe_hamming)."""
    bucketed = lsh_bucket(embeddings, n_planes)
    query = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("q")
    )
    return (
        bucketed.join(
            F.broadcast(query),
            F.bit_count(
                F.col("bucket").cast("long").bitwiseXOR(F.col("qbucket").cast("long"))
            )
            <= probe_hamming,
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


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 7,
    fit_rows: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: a seeded k-means coarse quantizer
    assigns every vector to a cluster; the query scores only vectors in its
    ``n_probe`` nearest clusters.

    The scale shape: centroids are a tiny broadcast model; assignment is one
    map; the probe is a semi-join on cluster id — each vector shuffles once
    by cluster, never pairwise. The quantizer FIT is bounded: k-means trains
    on a deterministic ``fit_rows``-row sample (global top-k by
    md5(vec_id) — a uniform pseudo-random draw, TakeOrdered-cheap, stable
    across partitioning), then the broadcast model assigns the FULL table.
    Fitting on the whole corpus would iterate k-means over 100 TB per
    Lloyd step; a 10^5-row sample fixes the centroids at negligible cost
    with the usual coarse-quantizer accuracy (FAISS-style train/add split).
    Recall is tuned by n_probe (and n_clusters controls the partition
    granularity); exact cosine is used within probed clusters so every
    returned score is exact. Not SQL-expressible (learned centroids), so
    correctness evidence is the pytest recall/score-agreement check against
    cosine_topk_bruteforce rather than a DuckDB oracle."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id", "embedding", array_to_vector("embedding").alias("features")
    )
    fit_sample = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(fit_rows)
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(fit_sample)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster")
    )

    # driver-side: rank centroids by distance to the query vector (centroids
    # are O(n_clusters * dim) — a model artifact, not data)
    q_row = embeddings.where(F.col("vec_id") == query_vec_id).head()
    if q_row is None:
        raise ValueError(f"query vec_id {query_vec_id} not found in embeddings")
    q = np.array(q_row["embedding"], dtype=np.float64)
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    order = np.argsort(((centers - q) ** 2).sum(axis=1))
    probe = [int(c) for c in order[:n_probe]]

    query = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    return (
        assigned.where(F.col("cluster").isin(probe))
        .where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(query))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("embedding"), F.col("q"))
                    / (_norm(F.col("embedding")) * _norm(F.col("q"))), 6),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_dedup_pipeline(
    embeddings: DataFrame,
    threshold: float = 0.35,
    max_vecs: int | None = 400,
    bands: int = 20,
    planes_per_band: int = 2,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """End-to-end embedding dedup decision: banded sign-LSH candidates ->
    exact-cosine verify -> connected components -> per-vector keep/drop
    (keep = the vector IS its cluster's min vec_id). The embedding mirror
    of dedup.dedup_pipeline — one dataflow from raw vectors to the
    keep-list a training-data pipeline applies."""
    from .dedup import connected_components

    vecs = embeddings
    if max_vecs is not None:
        vecs = vecs.where(F.col("vec_id") < max_vecs)
    pairs = embedding_near_duplicates_lsh(
        embeddings, threshold, max_vecs, bands, planes_per_band, max_bucket_size
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    clusters = connected_components(
        pairs, nodes=vecs.select(F.col("vec_id").alias("doc_id"))
    )
    return clusters.select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


_GRID_SEED = 1000  # centroid index offset: disjoint from the LSH plane family


def _grid_weight(c, d):
    """Deterministic integer centroid weight (same arithmetic family as the
    LSH hyperplanes, offset seed so centroids and planes are uncorrelated);
    c and d are Columns."""
    a = (
        F.lit(_M1) * (c + F.lit(_GRID_SEED))
        + F.lit(_M2) * d
        + F.lit(_MX) * (c + F.lit(_GRID_SEED)) * d
        + F.lit(_C)
    ) % F.lit(_MOD)
    return (a - F.lit(_HALF)).cast("double")


def ivf_topk_grid(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN top-k with a DETERMINISTIC grid coarse quantizer: centroids
    are integer-arithmetic vectors (no learned KMeans state), every vector
    row-locally joins its best-cosine centroid, and only vectors in the
    query's ``n_probe`` nearest cells are scored exactly.

    This is the oracle-expressible sibling of ivf_topk (whose learned
    KMeans quantizer cannot be reproduced in SQL): cluster assignment,
    probe selection and final exact scores are all pure portable
    arithmetic, so the whole ANN query is value-hash checkable in DuckDB.
    Recall/cost tune exactly like IVF: more probes -> more of the true
    top-k, fewer -> less scoring. Scores round to 6 before the argmax so
    float ulps can never flip cluster choices between engines.

    Scale shape: assignment is a PURE MAP (at corpus scale it would be
    computed once and persisted next to the vectors, exactly like a FAISS
    IVF list id); the query row is a 1-row broadcast carrying its probe
    set; candidate filtering happens at the scan; top-k is TakeOrdered.
    No shuffle anywhere but the final k rows.

    Optimization round 6: when the table's vectors share ONE dimension
    (checked with a tiny min/max-size probe at build, like ivf_topk's
    existing head() probe), the integer weight matrix and the centroid
    norms become LITERALS — the interpreted weight arithmetic previously
    re-evaluated 3x per (centroid, dim) per row, and the norm fold is
    row-independent anyway. Exactness: the weights are positive-operand
    integer arithmetic (Python % == SQL % here) and every norm is
    sqrt of an exact-integer double sum (all terms < 2^53, so fold order
    cannot matter), so the literal path produces bit-identical negs/
    cosines; mixed-dimension tables fall back to the original
    per-row-dim formulation. Measured 3.7 -> ~1.3 s on the bench table."""
    emb = F.col("embedding")
    dim = F.size(emb)

    def cl_sorted():
        return F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                lambda c: F.struct(
                    F.round(
                        -F.aggregate(
                            F.zip_with(
                                emb,
                                F.sequence(F.lit(0), dim - 1),
                                lambda x, d: x.cast("double") * _grid_weight(c, d),
                            ),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        )
                        / F.sqrt(
                            F.aggregate(
                                F.transform(
                                    F.sequence(F.lit(0), dim - 1),
                                    lambda d: _grid_weight(c, d)
                                    * _grid_weight(c, d),
                                ),
                                F.lit(0.0),
                                lambda acc, v: acc + v,
                            )
                        ),
                        6,
                    ).alias("negs"),
                    c.cast("int").alias("c"),
                ),
            )
        )

    def cl_literal_sql(d: int) -> str:
        import math

        structs = []
        for c in range(n_centroids):
            cs = c + _GRID_SEED
            wrow = [
                ((_M1 * cs + _M2 * dd + _MX * cs * dd + _C) % _MOD) - _HALF
                for dd in range(d)
            ]
            # exact-integer sum of squares -> the same double sqrt the
            # Catalyst fold produced (order-independent: all exact)
            norm = math.sqrt(float(sum(w * w for w in wrow)))
            warr = "array(" + ", ".join(f"{w}D" for w in wrow) + ")"
            structs.append(
                "named_struct('negs', round(-aggregate(zip_with(embedding, "
                f"{warr}, (x, w) -> CAST(x AS DOUBLE) * w), "
                "CAST(0 AS DOUBLE), (acc, v) -> acc + v) "
                f"/ {norm!r}D, 6), 'c', {c})"
            )
        return f"array_sort(array({', '.join(structs)}))"

    dims = embeddings.agg(
        F.min(F.size("embedding")).alias("lo"),
        F.max(F.size("embedding")).alias("hi"),
    ).first()
    if dims["lo"] is not None and dims["lo"] == dims["hi"]:
        cl_col = F.expr(cl_literal_sql(int(dims["lo"])))
    else:
        cl_col = cl_sorted()
    scored = embeddings.select("vec_id", "embedding", cl_col.alias("cl"))
    assigned = scored.select(
        "vec_id", "embedding", F.col("cl")[0]["c"].alias("cluster")
    )
    qrow = scored.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"),
        F.transform(F.slice("cl", 1, n_probe), lambda s: s["c"]).alias(
            "probes"
        ),
    )
    cand = (
        assigned.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qrow))
        .where(F.array_contains(F.col("probes"), F.col("cluster")))
    )
    return (
        cand.withColumn(
            "cosine",
            F.round(
                _dot(F.col("embedding"), F.col("qe"))
                / (_norm(F.col("embedding")) * _norm(F.col("qe"))),
                6,
            ),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
