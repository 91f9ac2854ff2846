"""spark-submit entry point: checkpointed extraction over a transcripts table.

    spark-submit --py-files b2xtranslator_spark.zip scripts/job.py \
        --input  <transcripts parquet/iceberg path> \
        --output <output dir> [--run-id r1] [--groups 64]

On a cluster, parallelism/executors come from spark-submit --conf /
--num-executors; this script only declares the job. Resume semantics:
re-running with the same --run-id skips committed groups
(pipeline.run_with_checkpoints).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default="run-1")
    p.add_argument("--groups", type=int, default=64)
    args = p.parse_args()

    from b2xtranslator_spark.pipeline import run_with_checkpoints

    # builder WITHOUT master(): spark-submit / cluster manager decides
    spark = (
        SparkSession.builder.appName("b2x-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .getOrCreate()
    )
    stats = run_with_checkpoints(
        spark, args.input, args.output, args.run_id, n_groups=args.groups
    )
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
