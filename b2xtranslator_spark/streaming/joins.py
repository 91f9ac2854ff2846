"""Watermarked stream-stream interval join over the turn stream.

The remaining built-in Structured Streaming pattern in scope: joining two
live streams with event-time bounds. Use case from the transcript domain:
pair every user turn with the assistant response that follows it within a
bounded interval — response-latency analytics over a live ingest, the
streaming analogue of the batch as-of join (operators/asof.py).

Scale shape: both sides are watermarked and the join condition carries an
event-time range (response ts in [user ts, user ts + max_response]), so
Spark can evict state for rows older than watermark + range on BOTH sides
— state is O(traffic inside the horizon), never unbounded. An inner join
with a range condition and equality on conv_id shuffles both streams once
on conv_id; without the time bound Spark rejects the plan outright
(unbounded state), which is exactly the discipline the 100 TB posture
wants enforced at plan time.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def turn_response_pairs(
    turns,
    max_response: str = "5 minutes",
    watermark_delay: str = "10 minutes",
):
    """user turn x first-window assistant turns of the same conversation.

    ``turns``: streaming DataFrame (conv_id, turn_idx, role, ts). Returns
    (conv_id, user_turn_idx, asst_turn_idx, response_lag_s) for every
    assistant turn landing within ``max_response`` after a user turn."""
    users = (
        turns.where(F.col("role") == "user")
        .select(
            F.col("conv_id"),
            F.col("turn_idx").alias("user_turn_idx"),
            F.col("ts").alias("user_ts"),
        )
        .withWatermark("user_ts", watermark_delay)
    )
    asst = (
        turns.where(F.col("role") == "assistant")
        .select(
            F.col("conv_id").alias("a_conv_id"),
            F.col("turn_idx").alias("asst_turn_idx"),
            F.col("ts").alias("asst_ts"),
        )
        .withWatermark("asst_ts", watermark_delay)
    )
    joined = users.join(
        asst,
        (F.col("conv_id") == F.col("a_conv_id"))
        & (F.col("asst_ts") >= F.col("user_ts"))
        & (
            F.col("asst_ts")
            <= F.col("user_ts") + F.expr(f"INTERVAL {max_response}")
        ),
        "inner",
    )
    return joined.select(
        "conv_id",
        "user_turn_idx",
        "asst_turn_idx",
        (
            F.col("asst_ts").cast("double") - F.col("user_ts").cast("double")
        ).alias("response_lag_s"),
    )


def start_turn_response_join_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_response: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """File-source turn stream -> user/assistant response pairs."""
    from .ingest import TRANSCRIPT_SCHEMA

    source = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .select("conv_id", "turn_idx", "role", "ts")
    )
    pairs = turn_response_pairs(source, max_response, watermark_delay)
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()
