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


def test_keep_first_ttl_kernel_expires_and_readmits():
    """TTL contract (VERDICT r02 #6): a fingerprint idle past ttl_seconds is
    evicted and its next occurrence re-emitted; duplicates inside the window
    slide the timeout forward. Kernel-level test via a fake GroupState."""
    import pandas as pd

    from b2xtranslator_spark.streaming.dedup import make_keep_first
    from tests.test_sessionize import FakeGroupState

    kernel = make_keep_first(ttl_seconds=30)
    state = FakeGroupState()
    key = ("fp-1",)
    batch = pd.DataFrame({"doc_id": [7, 3], "text": ["b", "a"]})

    # first sighting: emit doc 3 (min doc_id), arm the TTL
    out = list(kernel(key, iter([batch]), state))
    assert len(out) == 1 and out[0].iloc[0]["doc_id"] == 3
    assert state.get == (3,) and state.timeout_ms == 30_000

    # duplicate within the window: suppressed, TTL slides forward
    state.timeout_ms = None
    out = list(kernel(key, iter([batch]), state))
    assert out == [] and state.timeout_ms == 30_000

    # TTL expiry: state evicted silently
    state.hasTimedOut = True
    out = list(kernel(key, iter([]), state))
    assert out == [] and state.removed

    # next occurrence after expiry is new again
    state.hasTimedOut = False
    out = list(kernel(key, iter([batch]), state))
    assert len(out) == 1 and out[0].iloc[0]["doc_id"] == 3


def test_keep_first_no_ttl_never_arms_timeout():
    """Default contract: NoTimeout — keep-first forever, no timer ever set
    (state is O(distinct fingerprints) by design, documented)."""
    import pandas as pd

    from b2xtranslator_spark.streaming.dedup import make_keep_first
    from tests.test_sessionize import FakeGroupState

    kernel = make_keep_first(None)
    state = FakeGroupState()
    batch = pd.DataFrame({"doc_id": [1], "text": ["x"]})
    out = list(kernel(("fp",), iter([batch]), state))
    assert len(out) == 1 and state.timeout_ms is None
    out = list(kernel(("fp",), iter([batch]), state))
    assert out == [] and state.timeout_ms is None


def test_builtin_watermark_dedup(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark variant: duplicates inside the
    horizon collapse to the first occurrence; distinct texts all pass."""
    import pandas as pd

    from b2xtranslator_spark.streaming.dedup import (
        start_dedup_within_watermark_stream,
    )

    base = tmp_path_factory.mktemp("wmdedup")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        (1, "same text", t0),
        (2, "same  TEXT", t0 + pd.Timedelta(minutes=1)),  # normalized dup
        (3, "different text", t0 + pd.Timedelta(minutes=2)),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)
    q = start_dedup_within_watermark_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    out = spark.read.parquet(out_dir).toPandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3]
