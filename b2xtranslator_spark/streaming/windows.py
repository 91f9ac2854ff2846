"""Watermarked windowed aggregation over the turn stream.

The built-in Structured Streaming pattern the brief calls out (watermark +
windowed aggregation for late data): turns-per-window counts that tolerate
late arrivals up to the watermark and emit finalized windows exactly once.
Unlike sessionize/dedup (custom state via applyInPandasWithState), this is
pure Catalyst streaming state — `window()` + `groupBy().agg()` — so Spark
manages eviction from the watermark with no custom kernel.

Scale shape: state is O(open windows x active conv_ids), bounded by the
watermark horizon (late data older than the watermark is DROPPED, which is
the documented trade — a larger delay keeps more state but loses less).
Append output mode emits each window only after the watermark passes its
end, i.e. finalized-once semantics for downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def windowed_turn_counts(
    stream_df,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
):
    """turns + distinct-role count per (conv_id, event-time window).

    stream_df: streaming DataFrame with (conv_id, role, ts). The watermark
    is on ts (event time); approx_count_distinct keeps the role cardinality
    sketch-sized inside streaming state (exact distinct is unsupported in
    streaming aggs for good reason — unbounded per-group state)."""
    return (
        stream_df.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("role").alias("n_roles_approx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "n_roles_approx",
        )
    )


def start_windowed_counts_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """File-source stream of transcript turns -> finalized per-window counts
    (append mode: a window row is emitted once, after the watermark passes
    its end)."""
    from .ingest import TRANSCRIPT_SCHEMA

    source = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .select("conv_id", "role", "ts")
    )
    counts = windowed_turn_counts(source, window_duration, watermark_delay)
    writer = (
        counts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()
