"""Watermarked stream-stream interval join: in-window responses pair, out-
of-window ones don't, cross-conversation pairing never happens, and the
join resumes exactly-once from its checkpoint."""

from __future__ import annotations

import pandas as pd

from b2xtranslator_spark.streaming.joins import start_turn_response_join_stream

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write(spark, in_dir, rows):
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(rows, columns=COLS)
    (
        spark.createDataFrame(pdf)
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )


def _run_drain(spark, in_dir, out_dir, ckpt):
    q = start_turn_response_join_stream(
        spark, in_dir, out_dir, ckpt,
        max_response="5 minutes", watermark_delay="10 minutes",
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    try:
        return spark.read.parquet(out_dir).toPandas()
    except Exception:
        return pd.DataFrame()


def test_interval_join_pairs_in_window_responses(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ssjoin")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    _write(spark, in_dir, [
        ("conv-A", 0, "user", "q1", "", t0),
        ("conv-A", 1, "assistant", "a1", "", t0 + pd.Timedelta(minutes=2)),
        ("conv-A", 2, "user", "q2", "", t0 + pd.Timedelta(minutes=20)),
        # response 7 min later: outside the 5-minute bound
        ("conv-A", 3, "assistant", "a2", "", t0 + pd.Timedelta(minutes=27)),
        # same timestamps in another conversation must not cross-pair
        ("conv-B", 0, "user", "q", "", t0),
        ("conv-B", 1, "assistant", "a", "", t0 + pd.Timedelta(minutes=1)),
    ])
    out = _run_drain(spark, in_dir, out_dir, ckpt)
    got = {
        (r.conv_id, r.user_turn_idx, r.asst_turn_idx, r.response_lag_s)
        for r in out.itertuples()
    }
    assert got == {
        ("conv-A", 0, 1, 120.0),
        ("conv-B", 0, 1, 60.0),
    }


def test_interval_join_resumes_from_checkpoint(spark, tmp_path_factory):
    """A user turn arriving before its response: the pair must surface
    after a restart when the response lands (join state survives the
    checkpoint), without duplicating already-emitted pairs."""
    base = tmp_path_factory.mktemp("ssjoin2")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    _write(spark, in_dir, [
        ("conv-A", 0, "user", "q1", "", t0),
        ("conv-A", 1, "assistant", "a1", "", t0 + pd.Timedelta(minutes=1)),
        ("conv-C", 0, "user", "pending", "", t0 + pd.Timedelta(minutes=3)),
    ])
    first = _run_drain(spark, in_dir, out_dir, ckpt)
    assert ("conv-A", 0, 1) in {
        (r.conv_id, r.user_turn_idx, r.asst_turn_idx) for r in first.itertuples()
    }
    # second run: the response for conv-C arrives within its window
    _write(spark, in_dir, [
        ("conv-C", 1, "assistant", "late answer", "",
         t0 + pd.Timedelta(minutes=6)),
    ])
    out = _run_drain(spark, in_dir, out_dir, ckpt)
    pairs = [
        (r.conv_id, r.user_turn_idx, r.asst_turn_idx) for r in out.itertuples()
    ]
    assert pairs.count(("conv-A", 0, 1)) == 1  # not re-emitted
    assert pairs.count(("conv-C", 0, 1)) == 1  # completed across restart
