"""Stateful streaming sessionization of conversation turns.

Custom stateful operator via ``applyInPandasWithState``: groups a stream of
transcript turns into per-conversation sessions split on idle gaps. The
reference has no streaming surface (SURVEY.md §2.9); this is the transcript-
pipeline operator a continuous ingest needs (e.g. "emit a conversation
segment once it has been quiet for N minutes" to trigger extraction of the
closed segment).

State per conv_id: (session_no, last_ts, turn_count). Works identically in
batch tests via availableNow triggers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_no", IntegerType()),
        StructField("n_turns", IntegerType()),
        StructField("first_ts", LongType()),
        StructField("last_ts", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_no", IntegerType()),
        StructField("last_ts", LongType()),
        StructField("n_turns", IntegerType()),
        StructField("first_ts", LongType()),
    ]
)

GAP_SECONDS = 1800


def make_sessionizer(gap_seconds: int = GAP_SECONDS):
    """Build an applyInPandasWithState kernel closed over the idle gap.

    Emits one row per CLOSED session; the open session lives in state. A
    processing-time timeout flushes the final session of an idle conversation
    — without it a conversation that simply stops would hold its last session
    in state forever ("emit a segment once it has been quiet for N minutes"
    requires the quiet case to fire; ADVICE r01)."""

    def sessionize_turns(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key

        if state.hasTimedOut:
            # Idle flush: no new turns arrived within the gap — close the open
            # session but KEEP the counter in state so a later resume continues
            # session numbering (emitting session_no=0 twice for one conv_id
            # would break the per-conversation key; ADVICE r02). The counter
            # must survive even repeated timeouts: removing it on a later
            # empty timeout re-introduces the same collision for a
            # conversation that resumes after two idle gaps (caught by the
            # round-3 drive). The timer is NOT re-armed here — an idle
            # conversation costs one flushed-counter row in the state store
            # (O(distinct conv_ids), a few dozen bytes each) and no further
            # timeout work until new turns re-arm it in the data path.
            session_no, last_ts, n_turns, first_ts = state.get
            if n_turns > 0:
                state.update((session_no + 1, None, 0, None))
                yield pd.DataFrame(
                    [(conv_id, session_no, n_turns, first_ts, last_ts)],
                    columns=["conv_id", "session_no", "n_turns", "first_ts", "last_ts"],
                )
            return

        if state.exists:
            session_no, last_ts, n_turns, first_ts = state.get
        else:
            session_no, last_ts, n_turns, first_ts = 0, None, 0, None

        closed: list[tuple] = []
        ts_values: list[int] = []
        for pdf in pdfs:
            ts_values.extend(int(v) for v in pdf["ts_epoch"].values)
        for ts in sorted(ts_values):
            if last_ts is not None and ts - last_ts > gap_seconds:
                closed.append((conv_id, session_no, n_turns, first_ts, last_ts))
                session_no += 1
                n_turns = 0
                first_ts = ts
            if first_ts is None:
                first_ts = ts
            last_ts = ts
            n_turns += 1

        state.update((session_no, last_ts, n_turns, first_ts))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["conv_id", "session_no", "n_turns", "first_ts", "last_ts"],
            )

    return sessionize_turns


sessionize_turns = make_sessionizer()


def start_sessionize_stream(
    spark,
    input_dir,
    output_dir,
    checkpoint_dir,
    gap_seconds: int = GAP_SECONDS,
    available_now: bool = True,
):
    """Note on triggers: with ProcessingTimeTimeout pending state keeps an
    availableNow query alive past the last data batch (timeouts still need to
    fire), so batch-style callers should awaitTermination with a bound and
    stop() — closed sessions are committed per micro-batch either way. A
    continuous deployment passes available_now=False for a rolling trigger."""
    from pyspark.sql import functions as F

    from .ingest import TRANSCRIPT_SCHEMA

    source = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .withColumn("ts_epoch", F.unix_timestamp("ts"))
        .select("conv_id", "ts_epoch")
    )
    sessions = source.groupBy("conv_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()
