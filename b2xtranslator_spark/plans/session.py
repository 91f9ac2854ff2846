"""SparkSession factory tuned for the extraction workload.

The job is a pure per-document map over wide binary payloads (SURVEY.md §3):
the knobs that matter are Arrow batch shaping for mapInPandas, AQE for
runtime coalescing of the salted shuffle, and shuffle partition counts sized
to local[32] (a real cluster submit overrides via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "b2xtranslator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # payloads are ~10KB-10MB each: keep Arrow batches small enough that
        # a batch of worst-case documents stays well under executor memory
        # (SURVEY.md §3: ~64MB batches; ISSUE-003-Memory-Management.md)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # binary columns compress poorly and row-groups should stay scannable
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv6Addresses=false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
