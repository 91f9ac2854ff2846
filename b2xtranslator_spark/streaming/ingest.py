"""Streaming ingestion: extract text from transcript files as they arrive.

The reference is batch-only, file-at-a-time (SURVEY.md §2.9); at corpus scale
the same per-document map also needs a continuous-arrival mode: a Structured
Streaming file source over the transcripts landing zone, the identical
``extract_turns`` Arrow kernel, and an append sink with checkpointing (so a
killed stream resumes exactly once per input file — the streaming analogue of
the batch checkpoint table).

No watermarks/stateful operators are needed: extraction is stateless per row,
so the only streaming state is the file-source offset log.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..pipeline import EXTRACTED_SCHEMA, extract_turns

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Returns the started StreamingQuery. With trigger_available_now the
    stream drains everything currently in `input_dir` and stops — the batch
    semantics used by tests; a production deployment runs continuous."""
    source = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = source.select("conv_id", "turn_idx", "text", "tool").mapInPandas(
        extract_turns, schema=EXTRACTED_SCHEMA
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
