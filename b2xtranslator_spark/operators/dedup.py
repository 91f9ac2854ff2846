"""Deduplication operators for a large-scale training-data pipeline.

Four families over the `documents` table, all shuffle-conscious:

- exact: hash-groupBy on a normalized fingerprint (1 shuffle, map-side
  partial agg; oracle-checkable via md5)
- minhash + LSH: shingle -> 64-bit hashes -> per-band min -> band-bucket
  join; candidate pairs only ever co-group within a band bucket, so the
  shuffle is O(docs x bands) rows, never O(docs^2)
- simhash: 64-bit sign-aggregated token hashes; near-dups share the value
  (or a band of it)
- n-gram Jaccard: exact verify on small candidate sets via a distinct-token
  self-join (oracle-checkable)
- embedding cosine near-dup: exact pair similarity over `embeddings`
  (oracle-checkable via DuckDB list_cosine_similarity)
- connected components: candidate pairs -> per-document cluster keeper
  (iterative min-label propagation; oracle-checkable via a recursive
  transitive-closure CTE)

Every candidate self-join takes a ``max_bucket_size`` skew guard
(operators/skew.py): one degenerate hot bucket otherwise goes quadratic at
corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_text():
    return F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup groups: normalized-text md5, keeper = min doc_id per
    group (groups of size 1 included so the fingerprint+groupBy semantics are
    verifiable on corpora without duplicates)."""
    return (
        documents.select("doc_id", F.md5(F.encode(_norm_text(), "UTF-8")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def _seeded_hash60(col, seed: int):
    """Seeded 60-bit hash from md5(seed || value) — portable SQL semantics
    (DuckDB: CAST(('0x'||substr(md5(seed||value),1,15)) AS BIGINT)), chosen
    over xxhash64 so the whole MinHash family is oracle-checkable."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{seed}|"), col), "UTF-8")), 1, 15
        ),
        16,
        10,
    ).cast("long")


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 16, shingle_len: int = 4
) -> DataFrame:
    """MinHash signatures via word shingles and md5-derived double hashing.

    shingles: sliding windows of `shingle_len` words; one explode, then a
    single groupBy computes ALL minima map-side (partial agg) — no per-hash
    shuffle. The hash family is Kirsch-Mitzenmacher double hashing:
    h_i = h1 + i*h2 with h1 (60-bit) and h2 (40-bit) taken from ONE md5 of
    the shingle — one digest instead of num_hashes digests per shingle
    (measured 3.5x on the bench), still portable SQL, and a standard
    construction for MinHash families."""
    # stage the token array: the shingle lambda slices it per position, and
    # an unbound split(regexp_replace(...)) subtree would re-tokenize the
    # document once per shingle (the O(n^2) lambda trap; BENCH notes)
    staged = documents.select(
        "doc_id", F.split(_norm_text(), " ").alias("_w")
    )
    words = F.col("_w")
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words) - shingle_len, F.lit(0))
    )
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle_len)),
    )
    exploded = staged.select(
        "doc_id", F.explode(shingles).alias("shingle")
    )
    digest = F.md5(F.encode(F.col("shingle"), "UTF-8"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 10), 16, 10).cast("long")
    aggs = [
        F.min(h1 + F.lit(seed) * h2).alias(f"mh{seed}")
        for seed in range(num_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 4,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs sharing
    any band bucket become a candidate pair (a < b).

    Plan (optimization round 6): each (band, bucket) is grouped ONCE and
    ordered pairs are generated row-locally with a two-level explode — the
    old self equi-join executed the whole shingle+signature pipeline twice
    (Spark does not de-duplicate self-join sides) plus a window-count skew
    pass; now the signatures are computed once and shuffle once.

    ``max_bucket_size`` is the skew guard: a band bucket of n docs emits
    n^2/2 pairs, so one degenerate signature (empty/boilerplate text shared
    by thousands of docs) would otherwise go quadratic. Oversized buckets
    are dropped by the size filter on the grouped bucket (same
    drop-and-report semantics as operators.skew.cap_bucket_size) — report
    them with operators.skew.bucket_skew_stats."""
    sig = minhash_signatures(documents, num_hashes, shingle_len)
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                _seeded_hash60(F.concat_ws(",", *cols), 1000 + b).alias("bucket"),
            )
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    grouped = (
        buckets.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids").between(2, max_bucket_size))
    )
    # outer explode walks left positions so per-row memory stays O(bucket)
    lefts = grouped.select(
        "ids", F.explode(F.sequence(F.lit(1), F.size("ids") - 1)).alias("p")
    )
    pairs = lefts.select(
        F.element_at("ids", F.col("p")).alias("x"),
        F.explode(
            F.slice("ids", F.col("p") + 1, F.size("ids") - F.col("p"))
        ).alias("y"),
    )
    return pairs.select(
        F.least("x", "y").alias("doc_a"), F.greatest("x", "y").alias("doc_b")
    ).distinct()


SIMHASH_BITS = 60  # 15 hex digits of md5 -> fits a signed 64-bit lane


def _token_hash60(col):
    """60-bit token hash from the first 15 hex digits of md5 — chosen over
    xxhash64 so the identical value is computable in portable SQL
    (DuckDB: CAST(('0x'||substr(md5(w),1,15)) AS BIGINT)), making the whole
    SimHash family oracle-checkable."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash: per-token 60-bit md5-derived hash, per-bit +/-1 vote,
    sign -> bit.

    One explode + one groupBy; the per-bit votes are computed map-side
    (partial agg) inside Catalyst (no Python). The whole
    votes-plus-reconstruction expression is built as ONE parsed SQL string:
    constructing 60 vote aggregates + 60 reconstruction terms through the
    column API cost ~1 s of py4j round trips per query build (measured,
    optimization round 6) for an identical integer-exact plan."""
    words = F.split(_norm_text(), " ")
    tok = documents.select("doc_id", F.explode(words).alias("w")).where(
        F.length("w") > 0
    )
    tok = tok.select("doc_id", _token_hash60(F.col("w")).alias("h"))
    # per-bit vote: sum(+1 if bit set else -1); bit set in the final hash
    # when the vote is positive — same expressions the column-API build
    # produced, parsed server-side in one call
    sim_sql = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 "
        f"ELSE -1 END) > 0 THEN {1 << b}L ELSE 0L END)"
        for b in range(bits)
    )
    return tok.groupBy("doc_id").agg(
        F.expr(f"CAST(0 AS BIGINT) + {sim_sql}").alias("simhash")
    )


def simhash_candidate_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = 4,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """SimHash pair-finding: band the hash into ``bands`` disjoint bit slices
    and equi-join on (band, slice). By pigeonhole, any pair within
    ``bands - 1`` Hamming distance shares at least one identical band, so
    with 4 bands the candidate join has 100% recall for hamming <= 3 — then
    an exact popcount(xor) filter verifies. The shuffle is O(docs x bands),
    never all-pairs (the banding mirror of minhash_lsh_candidates).

    ``max_bucket_size`` drops degenerate hot slices before the self-join
    (the n^2 skew guard; see operators.skew) — the pigeonhole recall
    guarantee then holds only for pairs whose shared band survived the cap,
    so report dropped buckets via bucket_skew_stats."""
    from .banding import banded_hamming_pairs

    sig = simhash(documents, bits)
    return banded_hamming_pairs(
        sig, "doc_id", "simhash", bits, bands, max_hamming,
        max_bucket_size, out_prefix="doc",
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    max_docs: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (word) Jaccard similarity for pairs sharing >=1 token.

    Distinct-token self-join: |A ∩ B| from the join, |A|,|B| from per-doc
    counts; only pairs with a common token ever shuffle. Used standalone on
    small corpora and as the verify stage after LSH candidates at scale.

    ``max_df`` drops tokens appearing in more than that many documents
    BEFORE the self-join: a token with document frequency k contributes k^2
    join rows, so one stop-word-like token across the corpus would otherwise
    go quadratic (the join-row guard the self-join plan needs at scale).
    The cap changes the token sets, i.e. the Jaccard definition — callers
    (and the oracle SQL) must apply the same cap."""
    docs = documents
    if max_docs is not None:
        docs = docs.where(F.col("doc_id") < max_docs)
    words = F.split(_norm_text(), " ")
    tok = docs.select("doc_id", F.explode(words).alias("w")).where(
        F.length("w") > 2
    ).distinct()
    if max_df is not None:
        from pyspark.sql.window import Window

        tok = (
            tok.withColumn("df", F.count("*").over(Window.partitionBy("w")))
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        tok.alias("a")
        .join(tok.alias("b"), "w")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n", "na")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95, max_vecs: int | None = 2000
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, O(n^2) within the cap).

    The exact pass is the verify stage; at corpus scale candidates come from
    LSH bucketing first (see ann_lsh_bucketed in operators/similarity.py)."""
    vecs = embeddings
    if max_vecs is not None:
        vecs = vecs.where(F.col("vec_id") < max_vecs)
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(dot / (norm(F.col("ea")) * norm(F.col("eb"))), 6))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Dedup-cluster assignment: connected components over candidate pairs
    (doc_a, doc_b), labeling every node with the MIN doc_id reachable from
    it — the canonical "keeper" of its duplicate cluster. The stage that
    turns pairwise LSH output into per-document keep/drop decisions.

    Plan: iterative min-label propagation. Each round joins the (node, lbl)
    frame to the symmetric edge list, takes the min neighbor label per node,
    and stops when no label changed (one cheap count action per round). The
    round count is bounded by the cluster diameter — near-duplicate clusters
    are shallow (dozens of hops at most), not social-graph deep, so a small
    max_iter bound holds at corpus scale; the classic large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce") halves
    that to O(log d) rounds with the same join shape if diameter ever grows.
    Labels are checkpoint-truncated each round via localCheckpoint to stop
    the lineage (and its plan) growing linearly with iterations.

    ``nodes`` (a frame with doc_id) widens the output to singleton docs
    (cluster_id = own doc_id); omitted, only docs appearing in pairs are
    labeled. Pair endpoints are always labeled, even if absent from a
    narrower ``nodes`` frame (output covers nodes UNION endpoints). Oracle: a recursive transitive-closure CTE computes the same
    min-reachable label in portable SQL."""
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize the edge list ONCE: its lineage is the whole upstream
    # candidate/verify dataflow, and every propagation round would otherwise
    # re-execute it from the scan up
    edges = edges.localCheckpoint(eager=True)
    # Propagate ONLY over edge endpoints: a singleton node can never change
    # label, so carrying the full corpus through every round would join and
    # checkpoint O(corpus) rows x max_iter for work proportional to the
    # (typically tiny) duplicate-pair endpoint set. Singletons from `nodes`
    # are unioned back once at the end. This also guarantees endpoint nodes
    # missing from a narrower `nodes` frame still propagate (a severed path
    # would silently split clusters).
    endpoints = edges.select(F.col("src").alias("node")).distinct()
    labels = endpoints.withColumn("lbl", F.col("node"))
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                "lbl",
            )
        ).localCheckpoint(eager=True)  # one execution; `changed` reads the result
        changed = new_labels.where(F.col("new_lbl") != F.col("lbl")).limit(1).count()
        labels = new_labels.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning partial labels would hand out cluster_ids whose
        # "keeper" is itself not a keeper (min within max_iter hops, not the
        # component min) and diverge from the transitive-closure oracle
        raise ValueError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (cluster diameter exceeds it) or switch to the "
            "large-star/small-star O(log d) variant"
        )
    if nodes is not None:
        singletons = (
            nodes.select(F.col("doc_id").alias("node"))
            .distinct()
            .join(endpoints, "node", "left_anti")
            .withColumn("lbl", F.col("node"))
        )
        labels = labels.unionByName(singletons)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def paragraph_duplicates(documents: DataFrame, min_len: int = 20) -> DataFrame:
    """Cross-corpus paragraph-level dedup (the CCNet/CommonCrawl pipeline
    stage): hash every trimmed non-empty line of at least ``min_len`` chars,
    group by hash across ALL documents, report hashes appearing in more
    than one place with their occurrence count, spread, and canonical
    keeper (min doc, then min line index).

    Plan: one explode (rows ~ total paragraphs) -> one hash-agg with
    map-side partial aggregation (the boilerplate skew — the same footer on
    a million pages — pre-aggregates inside every task before a single
    combined row per partition shuffles, exactly the top_tokens argument).
    md5 keys keep the operator oracle-portable."""
    # posexplode BEFORE the length filter so line_no indexes the DOCUMENT's
    # lines (what a consumer edits/keeps), not positions in a filtered list
    # that shift with every short/blank line above
    all_lines = F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x))
    para = documents.select(
        "doc_id", F.posexplode(all_lines).alias("line_no", "para")
    ).where(F.length("para") >= min_len)
    # the composite arg-min key below allots 10^6 line slots per doc_id; a
    # document beyond that would silently alias into the next doc_id and
    # corrupt both keeper fields, so the bound is ENFORCED: the job fails
    # loudly instead (assert_true returns NULL when the predicate holds,
    # so the filter passes every valid row and cannot be pruned away)
    para = para.where(
        F.assert_true(
            F.col("line_no") < 1000000,
            "paragraph_duplicates: document with >= 1e6 lines breaks the "
            "doc_id*1e6+line_no arg-min key; split the document or raise "
            "the slot width",
        ).isNull()
    )
    return (
        para.groupBy(F.md5(F.encode(F.col("para"), "UTF-8")).alias("para_fp"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            # arg-min over (doc_id, line_no) as one scalar key — the form
            # both engines aggregate identically. ASSUMPTION (documented,
            # not enforced): < 10^6 lines per document; a longer document
            # would alias into the next doc_id. Transcript-corpus documents
            # are orders of magnitude below this.
            (
                F.min(F.col("doc_id") * 1000000 + F.col("line_no"))
                % 1000000
            ).alias("keeper_line_no"),
        )
        .where(F.col("n_occurrences") > 1)
    )


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 16,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the deep-diameter scale path promised in
    connected_components' docstring: O(log d) rounds instead of O(d), with
    the same per-round join shape (one groupBy on the node key).

    - large-star: every node links its LARGER neighbors to the minimum of
      its closed neighborhood — long chains contract toward small ids from
      every node at once.
    - small-star: every node (edges canonicalized u > v) re-links its
      smaller neighbors and itself to the neighborhood minimum — flattens
      the partial trees into stars.

    Both rounds preserve connectivity and strictly shrink total edge
    weight, so the fixpoint is a star forest: every node's remaining edge
    points at its component minimum. Output schema matches
    connected_components exactly ((doc_id, cluster_id), singletons from
    ``nodes`` included), so the two variants are interchangeable — and
    checked equal in tests and against the same recursive-CTE oracle."""
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = (
        e.where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # cut the candidate-dataflow lineage
    )
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric view: for each node u, attach its
        # larger neighbors to m = min(N(u) ∪ {u})
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star over canonical (u > v) edges: attach smaller neighbors
        # AND u itself to the neighborhood minimum
        m2 = edges.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            edges.join(m2, "u")
            .select(
                F.col("v").alias("a"), F.col("m"), F.col("u").alias("self_u")
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("x"), F.col("m").alias("y")),
                        F.struct(
                            F.col("self_u").alias("x"), F.col("m").alias("y")
                        ),
                    )
                ).alias("s")
            )
            .select(F.col("s.x").alias("u"), F.col("s.y").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        new_edges = (
            large.unionByName(small)
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            new_edges.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new_edges).limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (log-diameter bound exceeded — pathological input?)"
        )
    # star forest: u > v = root. Roots label themselves.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
    roots = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        .withColumn("lbl", F.col("node"))
    )
    labels = labels.unionByName(roots)
    if nodes is not None:
        singles = (
            nodes.select(F.col("doc_id").alias("node"))
            .distinct()
            .join(labels.select("node"), "node", "left_anti")
            .withColumn("lbl", F.col("node"))
        )
        labels = labels.unionByName(singles)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def jaccard_verify_pairs(
    documents: DataFrame, pairs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact word-set Jaccard for GIVEN candidate pairs only (the verify
    stage after LSH pair-finding). Unlike ngram_jaccard_pairs (which
    self-joins the whole token table), this joins the candidate list to the
    per-doc distinct-token sets twice, so work is proportional to the
    candidates' token mass — the shape a candidates->verify pipeline needs
    at corpus scale."""
    words = F.split(_norm_text(), " ")
    tok = (
        documents.select("doc_id", F.explode(words).alias("w"))
        .where(F.length("w") > 2)
        .distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ta = tok.select(F.col("doc_id").alias("doc_a"), "w")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "w")
    common = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_pipeline(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """The full corpus-dedup decision in one dataflow: MinHash-LSH
    candidates -> exact Jaccard verify -> connected components -> per-doc
    keep/drop. Every document comes back labeled with its cluster keeper
    and whether it survives dedup (keep = it IS the keeper).

    This is the end-to-end composition a training-data pipeline runs:
    candidate generation is banded (never all-pairs, skew-guarded), the
    verify touches only candidate token mass, clustering is min-label
    propagation, and the decision is a deterministic function of the
    cluster (min doc_id wins). Fully oracle-checkable in portable SQL
    (recursive CTE over the same candidate+verify definition)."""
    pairs = minhash_lsh_candidates(
        documents, num_hashes, bands, max_bucket_size=max_bucket_size
    )
    verified = jaccard_verify_pairs(documents, pairs, jaccard_threshold)
    clusters = connected_components(
        verified.select("doc_a", "doc_b"), nodes=documents
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def duplicate_text_spans(
    documents: DataFrame, n: int = 8, min_count: int = 2
) -> DataFrame:
    """Exact-substring duplicate SPANS — the token-level dedup signal of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2022), bounded to fixed-``n`` token grams: find every position
    whose n-gram recurs >= ``min_count`` times across the corpus, then
    merge overlapping/adjacent positions into maximal per-document spans
    (the byte ranges a trimming pass would cut).

    Plan: stage the token array (bound column — the unbound-lambda trap),
    one explode of (pos, gram-hash60) rows, ONE hash-agg for gram counts
    (map-side partial agg absorbs boilerplate skew), a 1:N equi-join back
    (build side is the filtered hash set — a hot gram fans out to probe
    rows, never to pairs), then per-doc islands-and-gaps (window on
    doc_id: new island when the position gap exceeds n) -> one groupBy for
    span extents. No all-pairs anywhere; shuffle keys are gram hashes and
    doc_ids. md5-60bit grams keep the operator oracle-portable."""
    ws = F.split(F.lower(F.col("text")), " ")
    # documents shorter than n tokens have no grams; the filter also guards
    # Spark's sequence(), which DESCENDS when stop < start (sequence(0,-1)
    # is [0,-1], not empty) and would feed slice() an invalid 0 start
    staged = (
        documents.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(ws)-{n}),"
                    f" i -> conv(substring(md5(array_join(slice(ws, i+1, {n}), ' ')),"
                    " 1, 15), 16, 10))"
                )
            ).alias("pos", "h"),
        )
        .select("doc_id", "pos", F.col("h").cast("long").alias("h"))
    )
    dup_hashes = (
        staged.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= min_count)
        .select("h")
    )
    dup_pos = staged.join(dup_hashes, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_pos.select(
        "doc_id",
        "pos",
        F.when(
            F.coalesce(F.col("pos") - F.lag("pos").over(w), F.lit(n + 1)) > n,
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    ).select(
        "doc_id",
        "pos",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n)).alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    )


def trim_duplicate_spans(
    documents: DataFrame, n: int = 8, min_count: int = 2
) -> DataFrame:
    """APPLY the exact-substring dedup (the second half of the Lee et al.
    2022 recipe): for every duplicated token n-gram keep the corpus-first
    occurrence (min (doc_id, pos) composite key) and cut every other
    occurrence's token range; returns each document's trimmed text with
    cut/kept accounting.

    Plan: same gram-hash explode + ONE hash-agg as duplicate_text_spans
    (the agg also computes the keeper arg-min as a scalar composite —
    oracle-portable), a 1:N probe join, then cut indices collect_set per
    doc and a row-local array rebuild via array_except over the position
    sequence (positions are distinct ints, so set semantics are exact;
    O(tokens + cuts) row-local vs the O(tokens x cuts) per-token
    array_contains scan it replaced — a fully-duplicated 2^20-token doc
    is no longer a straggler). Composite-key bound: pos < 2^20 per document
    (enforced loudly, same policy as paragraph_duplicates); doc_id must
    fit 2^43 — document ids beyond that need a wider key."""
    pos_limit = 1 << 20
    ws = F.split(F.lower(F.col("text")), " ")
    staged = documents.select("doc_id", ws.alias("ws"))
    grams = (
        staged.where(F.size("ws") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(ws)-{n}),"
                    f" i -> conv(substring(md5(array_join(slice(ws, i+1, {n}), ' ')),"
                    " 1, 15), 16, 10))"
                )
            ).alias("pos", "h"),
        )
        .select("doc_id", "pos", F.col("h").cast("long").alias("h"))
    )
    grams = grams.where(
        F.assert_true(
            F.col("pos") < pos_limit,
            "trim_duplicate_spans: document with >= 2^20 tokens breaks the "
            "keeper composite key; split the document or widen the key",
        ).isNull()
    )
    composite = F.col("doc_id") * pos_limit + F.col("pos")
    dup = (
        grams.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(composite).alias("keeper"),
        )
        .where(F.col("n_occ") >= min_count)
        .select("h", "keeper")
    )
    cut = (
        grams.join(dup, "h")
        .where(composite != F.col("keeper"))
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("i"))
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("cut"))
    )
    joined = staged.join(cut, "doc_id", "left").select(
        "doc_id",
        "ws",
        F.coalesce(F.col("cut"), F.array().cast("array<int>")).alias("cut"),
    )
    # array_except keeps array1's order and hashes array2 — linear in
    # tokens + cuts, and exact here because positions are distinct
    kept = F.array_except(
        F.sequence(F.lit(0), F.size("ws") - 1), F.col("cut")
    )
    return joined.select(
        "doc_id",
        F.array_join(
            F.transform(kept, lambda i: F.element_at(F.col("ws"), i + 1)), " "
        ).alias("text_trimmed"),
        F.size("cut").alias("n_tokens_cut"),
        (F.size("ws") - F.size("cut")).alias("n_tokens_kept"),
    )
