"""Watermarked windowed aggregation: finalized-once windows, late-data
semantics. Append mode only emits a window after the watermark passes its
end, so the test feeds a second batch whose max event time advances the
watermark beyond the earlier windows."""

from __future__ import annotations

import time

import pandas as pd

from b2xtranslator_spark.streaming.windows import start_windowed_counts_stream

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write(spark, in_dir, rows):
    pdf = pd.DataFrame(rows, columns=COLS)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(in_dir)


def _run_drain(spark, in_dir, out_dir, ckpt):
    q = start_windowed_counts_stream(
        spark, in_dir, out_dir, ckpt,
        window_duration="5 minutes", watermark_delay="10 minutes",
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    try:
        return spark.read.parquet(out_dir).toPandas()
    except Exception:
        return pd.DataFrame()


def test_windows_finalize_after_watermark_and_accept_late_rows(
    spark, tmp_path_factory
):
    base = tmp_path_factory.mktemp("win")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    # batch 1: three turns in window [00:00, 00:05), one in [00:05, 00:10)
    _write(spark, in_dir, [
        ("conv-A", 0, "user", "x", "", t0),
        ("conv-A", 1, "assistant", "x", "", t0 + pd.Timedelta(minutes=1)),
        ("conv-A", 2, "user", "x", "", t0 + pd.Timedelta(minutes=2)),
        ("conv-A", 3, "user", "x", "", t0 + pd.Timedelta(minutes=6)),
    ])
    out = _run_drain(spark, in_dir, out_dir, ckpt)
    # watermark after batch1 = 00:06 - 10min < 00:05 -> nothing finalized yet
    assert len(out) == 0

    # batch 2: one LATE row still inside the watermark for [00:00, 00:05)
    # plus a far-future row that pushes the watermark past both windows
    _write(spark, in_dir, [
        ("conv-A", 4, "assistant", "late", "", t0 + pd.Timedelta(minutes=3)),
        ("conv-B", 0, "user", "x", "", t0 + pd.Timedelta(hours=2)),
    ])
    out = _run_drain(spark, in_dir, out_dir, ckpt)
    finalized = out[out["conv_id"] == "conv-A"].sort_values("window_start")
    assert len(finalized) == 2
    first, second = finalized.iloc[0], finalized.iloc[1]
    # the late row WAS counted into the first window (3 + 1 late)
    assert first["n_turns"] == 4
    assert second["n_turns"] == 1
    assert str(first["window_start"]).startswith("2026-01-01 00:00")
    assert str(second["window_start"]).startswith("2026-01-01 00:05")
