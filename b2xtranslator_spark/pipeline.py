"""Spark extraction pipeline: transcripts in, extracted text + spans out.

Architecture (SURVEY.md §3 "Spark lifecycle"):

    read transcripts (column-pruned)
      -> salt & repartition by conv_id        (skew defense: oversized
                                               attachment conversations split
                                               across tasks)
      -> mapInPandas(extract_turns)           (Arrow batches; pure per-
                                               document map; no shuffle)
      -> write partitioned by conv_bucket,
         sorted within partitions by (conv_id, turn_idx)

plus bucket-group checkpointing so a killed run resumes without recomputing
completed groups (Iceberg-snapshot-per-commit semantics expressed over
parquet staging in this sandbox; the commit unit is a deterministic
hash-bucket group, idempotent under retry).

The per-document decode is a scalar black box to Catalyst (SURVEY.md §4): no
custom rules, no RDDs, no driver-side loops over rows.
"""

from __future__ import annotations

import base64
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_PREFIX = "b64cfb:"
# raw (non-base64) HTML/markup payloads — the north rule's markup leg;
# extraction strips boilerplate via formats/markup.py
MARKUP_PREFIX = "markup:"
# same, with the link-density main-content heuristic forced ON for this row
# (per-row opt-in; the B2X_MARKUP_MAIN_CONTENT env knob remains the global)
MARKUP_MAIN_PREFIX = "markup_main:"

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("part", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
        ]
    )
)

METRICS_TYPE = StructType(
    [
        StructField("docs_parsed", IntegerType()),
        StructField("records_decoded", LongType()),
        StructField("bytes_decoded", LongType()),
        StructField("failures", IntegerType()),
        StructField("wall_ms", LongType()),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("spans", SPAN_TYPE),
        StructField("status", StringType()),
        StructField("error", StringType()),
        StructField("metrics", METRICS_TYPE),
    ]
)


# Content-addressed per-worker decode cache: real transcript corpora repeat
# identical attachments (the same document forwarded across turns and
# conversations), and the decode is deterministic, so each Python worker
# memoizes results keyed by the payload digest. Bounded LRU — the cached
# value is the small result tuple (text + spans + metrics), never the
# payload bytes. Decoding is a pure function of the payload, so a hit is
# byte-identical to a fresh decode.
_DECODE_CACHE: "OrderedDict[bytes, tuple]" = None  # type: ignore[assignment]
# entries; 0 disables (B2X_DECODE_CACHE env, read at worker import so bench
# A/B runs can measure the cache-cold decode rate honestly)
_DECODE_CACHE_MAX = int(os.environ.get("B2X_DECODE_CACHE", "256"))

# Per-document payload cap (decoded bytes): at corpus scale a single
# multi-GB attachment must become an error row, not a Python-worker OOM.
# The base64 text is ~4/3 the decoded size; the cap is checked on the
# encoded length before any allocation. 256 MB default — far above any
# legitimate Office binary, small enough that one doc cannot take down an
# executor that sized its memory for normal batches.
_MAX_PAYLOAD_BYTES = int(os.environ.get("B2X_MAX_PAYLOAD_BYTES", str(256 << 20)))

# Output chunking budget for the map kernel: the INPUT Arrow batch size is
# bounded JVM-side (maxRecordsPerBatch=128 x payload size), but the kernel's
# OUTPUT frame + its Arrow serialization buffer are extra copies — yielding
# in byte-bounded slices caps that additional footprint per batch.
_OUT_CHUNK_BYTES = int(os.environ.get("B2X_OUT_CHUNK_BYTES", str(64 << 20)))
# opt-in link-density main-content heuristic for markup payloads (the DOM
# boilerplate rule beyond structural tag stripping; formats/markup.py)
_MARKUP_MAIN_CONTENT = os.environ.get(
    "B2X_MARKUP_MAIN_CONTENT", ""
).lower() in ("1", "true", "yes")


def _extract_one(text: str | None, tool: str | None) -> tuple:
    """Extract a single turn. Payload may arrive in `text` OR `tool`
    (BASELINE.json input_hint); non-payload turns pass through."""
    global _DECODE_CACHE
    import hashlib

    from .extractors import extract_payload_text  # module-cached after first call

    src = None
    is_markup = False
    markup_main = False
    markup_prefix_len = len(MARKUP_PREFIX)
    for candidate in (text, tool):
        if candidate and candidate.startswith(PAYLOAD_PREFIX):
            src = candidate
            break
        if candidate and candidate.startswith(MARKUP_MAIN_PREFIX):
            src = candidate
            is_markup = True
            markup_main = True
            markup_prefix_len = len(MARKUP_MAIN_PREFIX)
            break
        if candidate and candidate.startswith(MARKUP_PREFIX):
            src = candidate
            is_markup = True
            break
    if src is None:
        passthrough = text or ""
        return (
            passthrough,
            [("main", 0, len(passthrough))],
            "skipped",
            None,
            (0, 0, len(passthrough), 0, 0),
        )

    # the oversize gate must run BEFORE the cache key (an md5 over the full
    # source) so repeated oversize rows never pay a multi-hundred-MB hash
    # for a result that is never cached. Binary payloads: exact from the
    # base64 ratio. Markup: a char count UNDER-measures UTF-8 (CJK/emoji
    # are 2-4 bytes/char), so chars > cap rejects immediately (UTF-8 is
    # >= 1 byte/char) and anything smaller is measured by an exact encode —
    # bounded at cap chars, i.e. never the multi-GB worst case the gate
    # exists to stop.
    if is_markup:
        raw = src[markup_prefix_len:]
        byte_len = (
            len(raw)
            if len(raw) > _MAX_PAYLOAD_BYTES
            else len(raw.encode("utf-8"))
        )
    else:
        byte_len = (len(src) - len(PAYLOAD_PREFIX)) // 4 * 3
    if byte_len > _MAX_PAYLOAD_BYTES:
        return (
            "",
            [],
            "oversize",
            f"payload ~{byte_len} bytes exceeds "
            f"B2X_MAX_PAYLOAD_BYTES={_MAX_PAYLOAD_BYTES}",
            (0, 0, 0, 1, 0),
        )

    key = None
    if _DECODE_CACHE_MAX > 0:
        if _DECODE_CACHE is None:
            from collections import OrderedDict

            _DECODE_CACHE = OrderedDict()
        # Hash the exact payload bytes: an ascii-'replace' digest would map a
        # literal '?' and any non-ASCII char at the same position to the same
        # key, letting one row be served another row's cached result (ADVICE
        # r02). utf-8 is injective on str, so collisions need an md5 break.
        # markup extraction output depends on the main-content mode: the
        # mode byte must be part of the key or a toggled flag serves stale
        # results computed under the other mode
        mode = (
            b"\x01"
            if (is_markup and (markup_main or _MARKUP_MAIN_CONTENT))
            else b"\x00"
        )
        key = hashlib.md5(mode + src.encode("utf-8")).digest()
        hit = _DECODE_CACHE.get(key)
        if hit is not None:
            _DECODE_CACHE.move_to_end(key)
            return hit
    if is_markup:
        payload = src[markup_prefix_len:].encode("utf-8")
        res = extract_payload_text(
            payload, force_kind="html",
            html_main_content=markup_main or _MARKUP_MAIN_CONTENT,
        )
    else:
        try:
            payload = base64.b64decode(src[len(PAYLOAD_PREFIX) :])
        except Exception as exc:  # malformed base64 is a row error, not a task error
            return ("", [], "parse_error", f"base64: {exc}", (0, 0, 0, 1, 0))
        res = extract_payload_text(payload)
    spans = res.metrics.get("spans") or [("main", 0, len(res.text))]
    failures = 0 if res.status in ("ok", "skipped") else 1
    out = (
        res.text,
        spans,
        res.status,
        res.error,
        (
            1 if res.status == "ok" else 0,
            int(res.metrics.get("records_decoded", 0)),
            int(res.metrics.get("bytes_decoded", 0)),
            failures,
            int(res.metrics.get("wall_ms", 0)),
        ),
    )
    if key is not None:
        _DECODE_CACHE[key] = out
        if len(_DECODE_CACHE) > _DECODE_CACHE_MAX:
            _DECODE_CACHE.popitem(last=False)
    return out


def extract_turns(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of turns in, one batch of
    extracted rows out. Non-payload (chat) rows never enter a per-row Python
    conditional: the whole batch is mask-assigned with vectorized pandas ops
    and only the document-bearing indices loop into the parser core (which
    vectorizes its own byte work internally)."""
    import numpy as np

    for whole in batches:
        # byte-bounded slicing: one slice's outputs (and their Arrow
        # serialization) are the only extra copies alive at a time, so a
        # batch of huge attachments cannot triple-buffer itself into an OOM
        sizes = (
            whole["text"].str.len().to_numpy(dtype="float64", na_value=0.0)
            + whole["tool"].str.len().to_numpy(dtype="float64", na_value=0.0)
        )
        cuts = [0]
        acc = 0
        for r, sz in enumerate(sizes):
            acc += int(sz)
            if acc >= _OUT_CHUNK_BYTES and r + 1 < len(whole):
                cuts.append(r + 1)
                acc = 0
        cuts.append(len(whole))
        slices = (
            [whole]
            if len(cuts) == 2
            else [whole.iloc[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]
        )
        yield from _extract_frames(slices, np)


def _extract_frames(slices, np) -> Iterator[pd.DataFrame]:
    for pdf in slices:
        text_s = pdf["text"]
        tool_s = pdf["tool"]
        is_doc = (
            text_s.str.startswith(PAYLOAD_PREFIX, na=False)
            | tool_s.str.startswith(PAYLOAD_PREFIX, na=False)
            | text_s.str.startswith(MARKUP_PREFIX, na=False)
            | tool_s.str.startswith(MARKUP_PREFIX, na=False)
            | text_s.str.startswith(MARKUP_MAIN_PREFIX, na=False)
            | tool_s.str.startswith(MARKUP_MAIN_PREFIX, na=False)
        ).to_numpy()

        # vectorized passthrough defaults for every row (chat rows keep them)
        passthrough = text_s.fillna("")
        texts = passthrough.to_numpy(dtype=object).copy()
        lens = passthrough.str.len().to_numpy()
        spans = [[("main", 0, int(n))] for n in lens]
        statuses = np.full(len(pdf), "skipped", dtype=object)
        errors: list = [None] * len(pdf)
        metrics: list = [(0, 0, int(n), 0, 0) for n in lens]

        for i in np.nonzero(is_doc)[0]:
            t, s, st, err, m = _extract_one(text_s.iat[i], tool_s.iat[i])
            texts[i] = t
            spans[i] = s
            statuses[i] = st
            errors[i] = err
            metrics[i] = m
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].values,
                "text": texts,
                "spans": spans,
                "status": statuses,
                "error": errors,
                "metrics": metrics,
            }
        )


def run_extraction(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 4,
    mode: str = "none",
) -> DataFrame:
    """Arrow-batched extraction with a configurable pre-map layout.

    mode="none" (default): map directly over the scan partitions — ZERO
    shuffle. The payload column is the bulk of the data, so not moving it
    before a pure per-document map is the single biggest overhead saving
    (measured 32% wall at 8 cores vs the salted shuffle); input split sizing
    (spark.sql.files.maxPartitionBytes=32MB) controls balance instead. Skew
    defense lives where skew actually bites — the WRITE shuffle
    (write_extracted salts its partitioning key).

    mode="salted": pre-shuffle on (conv_id, salt(turn_idx)) — conversations
    stay mostly co-located while a 1000-turn conversation of 10MB
    attachments splits across `salt_buckets` tasks. Use when a downstream
    stage consumes the mapped output grouped by conversation directly.

    mode="balanced": round-robin into fine partitions — best task balance
    when the input file layout itself is skewed.

    Partition count defaults to cores x 8: doc-size variance (4KB..10MB) is
    high, so fine partitions + AQE coalescing beat coarse ones (measured 2.8x
    on the sample corpus)."""
    spark = transcripts.sparkSession
    pruned = transcripts.select("conv_id", "turn_idx", "text", "tool")
    n = num_partitions or spark.sparkContext.defaultParallelism * 8
    if mode == "none":
        shaped = pruned
    elif mode == "balanced":
        shaped = pruned.repartition(n)
    else:
        shaped = pruned.repartition(
            n,
            F.col("conv_id"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets)),
        )
    return shaped.mapInPandas(extract_turns, schema=EXTRACTED_SCHEMA)


def write_extracted(
    extracted: DataFrame, path: str, n_buckets: int = 32, salt_buckets: int = 4
) -> None:
    """Sink (SURVEY.md §2.1 S9): partitioned by conv_id hash bucket, stable
    (conv_id, turn_idx) order within files.

    This is the shuffle where conversation skew bites (north_star: oversized
    attachment conversations), so the partitioning key carries a salt: a
    giant conversation spreads over `salt_buckets` reducers, each writing a
    sorted file into the same conv_bucket directory."""
    (
        extracted.withColumn(
            "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
        )
        .repartition(
            F.col("conv_bucket"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets)),
        )
        # the sort must LEAD with the partition column: FileFormatWriter
        # re-sorts each task by partition columns when rows aren't already
        # clustered on them, which would destroy the (conv_id, turn_idx)
        # order
        .sortWithinPartitions("conv_bucket", "conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("conv_bucket")
        .parquet(path)
    )


# -- checkpointed run (resume without recompute) --------------------------------


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through Hadoop's FileSystem so it answers correctly
    for hdfs:// and s3a:// URIs, not only the local filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def run_with_checkpoints(
    spark: SparkSession,
    transcripts_path: str,
    out_dir: str,
    run_id: str,
    n_groups: int = 8,
    fail_after_groups: int | None = None,
) -> dict:
    """Process the corpus in deterministic hash-bucket groups; each group is
    one Spark job committed with an idempotent overwrite + a checkpoint row.
    Re-running with the same run_id skips completed groups (FIXTURES.md §5).

    Group selection must PRUNE, not rescan: a predicate on
    pmod(xxhash64(conv_id)) cannot push into a parquet scan, so n_groups
    groups would read the corpus n_groups times. The input is therefore
    staged ONCE partitioned by the group key (one scan + one shuffle-free
    write); every group then reads only its own partition directory. On a
    real deployment the input is an Iceberg table bucketed by conv_id and
    the staging step disappears — bucket partition pruning does this for
    free at the metadata layer.

    Per-group metrics ride the write job via Observation (no second read of
    the written output).

    fail_after_groups is a test hook simulating a killed run."""
    from pyspark.sql import Observation

    ckpt_path = os.path.join(out_dir, "_checkpoints")
    done: set[int] = set()
    try:
        ckpt = spark.read.parquet(ckpt_path)
        # group numbers are only meaningful under the SAME n_groups: resuming
        # run_id with a different group count must re-run everything (the
        # staging dir is likewise keyed by n_groups), otherwise rows hashed
        # into a "done-numbered" group of the new partitioning are skipped
        done = {
            r["partition_id"]
            for r in ckpt.where(
                (F.col("run_id") == run_id)
                & (F.col("state") == "done")
                & (F.col("n_groups") == n_groups)
            ).collect()
        }
    except Exception:
        pass  # first run: no checkpoint table yet (or pre-n_groups schema)

    group_col = F.pmod(F.xxhash64("conv_id"), F.lit(n_groups))
    # The staging directory is keyed by n_groups: resuming with a different
    # group count must re-stage, not silently skip rows whose grp value
    # exceeds the new n_groups (ADVICE r02). Existence is checked through the
    # Hadoop FileSystem API so the guard also holds on HDFS/S3 paths where
    # os.path.exists is always False and every run would re-scan the corpus.
    staged_path = os.path.join(out_dir, f"_staged_g{n_groups}")
    if not _fs_exists(spark, os.path.join(staged_path, "_SUCCESS")):
        (
            spark.read.parquet(transcripts_path)
            .withColumn("grp", group_col)
            .write.mode("overwrite")
            .partitionBy("grp")
            .parquet(staged_path)
        )
    staged = spark.read.parquet(staged_path)

    processed = 0
    stats = {"groups_run": 0, "groups_skipped": len(done)}
    for group in range(n_groups):
        if group in done:
            continue
        if fail_after_groups is not None and processed >= fail_after_groups:
            stats["killed"] = True
            return stats
        # partition pruning: only the grp=<group> directory is scanned
        subset = staged.where(F.col("grp") == group).drop("grp")
        obs = Observation()
        extracted = run_extraction(subset).observe(
            obs,
            F.count(F.lit(1)).alias("turns"),
            F.sum("metrics.docs_parsed").alias("docs_parsed"),
            F.sum("metrics.records_decoded").alias("records_decoded"),
            F.sum("metrics.failures").alias("failures"),
        )
        group_out = os.path.join(out_dir, f"group={group}")
        (
            extracted.sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .parquet(group_out)
        )
        # lineage + metrics row; append is safe because resume filters on
        # (run_id, state, partition_id) and group commits are idempotent
        agg = obs.get
        row = [
            (
                run_id,
                group,
                group,
                n_groups,
                "done",
                int(agg["docs_parsed"] or 0),
                int(agg["records_decoded"] or 0),
                int(agg["failures"] or 0),
                int(time.time() * 1000),
            )
        ]
        spark.createDataFrame(
            row,
            "run_id string, partition_id int, conv_bucket int, n_groups int, "
            "state string, docs_parsed long, records_decoded long, "
            "failures long, ts long",
        ).coalesce(1).write.mode("append").parquet(ckpt_path)
        processed += 1
        stats["groups_run"] += 1
    return stats


def read_extracted(spark: SparkSession, out_dir: str, n_groups: int = 8) -> DataFrame:
    paths = [
        os.path.join(out_dir, f"group={g}")
        for g in range(n_groups)
        if os.path.isdir(os.path.join(out_dir, f"group={g}"))
    ]
    return spark.read.parquet(*paths)


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Run-level metrics aggregation (SURVEY.md §2.4 A3/A4): Catalyst's
    built-in partial+final hash aggregate, no custom code."""
    return extracted.agg(
        F.count("*").alias("turns"),
        F.sum("metrics.docs_parsed").alias("docs_parsed"),
        F.sum("metrics.records_decoded").alias("records_decoded"),
        F.sum("metrics.bytes_decoded").alias("bytes_decoded"),
        F.sum("metrics.failures").alias("failures"),
        F.sum(F.when(F.col("status") == "encrypted", 1).otherwise(0)).alias(
            "encrypted"
        ),
    )
