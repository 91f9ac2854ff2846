"""Streaming exact-dedup: the first occurrence of a fingerprint is emitted
exactly once across micro-batches and across stream restarts (state
checkpoint)."""

from __future__ import annotations

import pandas as pd

from b2xtranslator_spark.streaming.dedup import start_streaming_dedup


def _run(spark, in_dir, out_dir, ckpt):
    q = start_streaming_dedup(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()


def test_cross_batch_dedup_keeps_first(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    batch1 = pd.DataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha  text")],  # 3 dups 1 after norm
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(batch1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir).toPandas().sort_values("doc_id")
    # in-batch duplicate collapsed to the smallest doc_id
    assert out.doc_id.tolist() == [1, 2]

    # batch 2: one repeat of an already-seen text (across batches), one new
    batch2 = pd.DataFrame(
        [(10, "alpha text"), (11, "gamma text")], columns=["doc_id", "text"]
    )
    spark.createDataFrame(batch2).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)  # restart: state comes from checkpoint
    out = spark.read.parquet(out_dir).toPandas().sort_values("doc_id")
    assert out.doc_id.tolist() == [1, 2, 11], out
    assert set(out.text) == {"alpha text", "beta text", "gamma text"}
