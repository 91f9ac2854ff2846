"""Streaming exact-dedup: emit only the FIRST occurrence of each document
fingerprint across the life of the stream.

The batch dedup operators (operators/dedup.py) answer "which documents are
duplicates"; a continuous ingest needs the online form — "is this incoming
document new?" — where the seen-set must survive across micro-batches and
restarts. applyInPandasWithState keyed by fingerprint holds one tiny state
row per distinct document (first_seen doc_id + timestamp); duplicates of a
fingerprint inside one batch are resolved deterministically by (doc_id)
order before consulting state.

State lifecycle (two contracts, pick per deployment):

- ``ttl_seconds=None`` (default): keep-first FOREVER. State size is
  O(distinct fingerprints) over the stream's whole life — at corpus scale
  this is exactly the working set a dedup service has to hold somewhere;
  Spark shards it by the groupBy key across executors and the checkpoint
  makes it restart-durable. Sizing: one state row is the fingerprint key
  (32 hex chars) + a long ≈ 60-80 bytes in the state store, so 10^9
  distinct documents ≈ 60-80 GB across the cluster — plan executor count
  (state shards) accordingly, or switch to the TTL contract.
- ``ttl_seconds=N``: keep-first WITHIN a processing-time window. A
  fingerprint idle for N seconds is evicted (ProcessingTimeTimeout) and its
  next occurrence is treated as new — bounded state, weaker dedup (exactly
  the trade a rolling-window ingest wants). Each duplicate arrival slides
  the window forward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _fp_col():
    """Normalized-content fingerprint — the SAME normalization as the batch
    dedup family (operators/dedup._norm_text); one definition so the two
    streaming variants and batch dedup can never disagree on what counts
    as a duplicate."""
    return F.md5(
        F.encode(F.regexp_replace(F.lower("text"), "\\s+", " "), "UTF-8")
    )

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_doc_id", LongType()),
    ]
)


def make_keep_first(ttl_seconds: int | None = None):
    """Build the applyInPandasWithState kernel: one group per fingerprint;
    emits the group's first row, suppresses everything after — forever
    (ttl_seconds=None) or until the fingerprint has been idle ttl_seconds
    (sliding processing-time TTL, bounded state)."""

    def keep_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry: forget the fingerprint; its next occurrence is new
            state.remove()
            return
        if state.exists:
            # duplicate arrivals slide the TTL window forward
            if ttl_seconds is not None:
                state.setTimeoutDuration(ttl_seconds * 1000)
            return  # fingerprint already seen: emit nothing
        (fp,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        first = rows.sort_values("doc_id").iloc[0]
        state.update((int(first["doc_id"]),))
        if ttl_seconds is not None:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame(
            [(fp, int(first["doc_id"]), first["text"])],
            columns=["fp", "doc_id", "text"],
        )

    return keep_first


keep_first = make_keep_first()


def start_streaming_dedup(
    spark, input_dir, output_dir, checkpoint_dir, ttl_seconds: int | None = None
):
    """File-source stream of documents(doc_id, text, ...) -> emit each
    normalized-text fingerprint's first occurrence exactly once across all
    micro-batches (and across restarts, via the state checkpoint). With
    ttl_seconds, exactly once per TTL window instead (bounded state; see
    module docstring). Note ProcessingTimeTimeout keeps an availableNow
    query alive after the data drains — poll the sink and stop()."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    source = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("fp", _fp_col())
    )
    deduped = source.groupBy("fp").applyInPandasWithState(
        make_keep_first(ttl_seconds),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_seconds is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_within_watermark_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    delay: str = "10 minutes",
):
    """The BUILT-IN event-time counterpart to the custom stateful kernel:
    ``dropDuplicatesWithinWatermark`` keeps the first occurrence of each
    fingerprint among rows whose event times fall within the watermark
    horizon — Spark owns the state lifecycle (eviction at the watermark),
    no Python kernel at all. Choose it when "duplicate" is an EVENT-TIME
    window notion and late data past the watermark may legitimately
    reappear; keep the applyInPandasWithState kernel when the contract is
    keep-first-forever or processing-time TTL (the built-in expresses
    neither)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    source = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("fp", _fp_col())
        .withWatermark("ts", delay)
    )
    deduped = source.dropDuplicatesWithinWatermark(["fp"]).select(
        "doc_id", "fp", "ts"
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
