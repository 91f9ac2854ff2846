"""Streaming exact-dedup: emit only the FIRST occurrence of each document
fingerprint across the life of the stream.

The batch dedup operators (operators/dedup.py) answer "which documents are
duplicates"; a continuous ingest needs the online form — "is this incoming
document new?" — where the seen-set must survive across micro-batches and
restarts. applyInPandasWithState keyed by fingerprint holds one tiny state
row per distinct document (first_seen doc_id + timestamp); duplicates of a
fingerprint inside one batch are resolved deterministically by (doc_id)
order before consulting state.

State size is O(distinct fingerprints) — at corpus scale this is exactly
the working set a dedup service has to hold somewhere; Spark shards it by
the groupBy key across executors, and the checkpoint makes it
restart-durable.
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


def keep_first(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: one group per fingerprint; emits the
    group's first-ever row, suppresses everything after."""
    if state.exists:
        return  # fingerprint already seen in an earlier batch: emit nothing
    (fp,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    first = rows.sort_values("doc_id").iloc[0]
    state.update((int(first["doc_id"]),))
    yield pd.DataFrame(
        [(fp, int(first["doc_id"]), first["text"])],
        columns=["fp", "doc_id", "text"],
    )


def start_streaming_dedup(spark, input_dir, output_dir, checkpoint_dir):
    """File-source stream of documents(doc_id, text, ...) -> emit each
    normalized-text fingerprint's first occurrence exactly once across all
    micro-batches (and across restarts, via the state checkpoint)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    source = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn(
            "fp",
            F.md5(F.encode(F.regexp_replace(F.lower("text"), "\\s+", " "), "UTF-8")),
        )
    )
    deduped = source.groupBy("fp").applyInPandasWithState(
        keep_first,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
