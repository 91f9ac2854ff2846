"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd

from b2xtranslator_spark.streaming.sessionize import start_sessionize_stream


def test_sessions_split_on_idle_gap(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    rows = []
    # conv A: 3 turns, 40-min gap, 2 turns  -> one closed session of 3 turns
    for i, minute in enumerate((0, 1, 2, 42, 43)):
        rows.append(("conv-A", i, "user", "hi", "", pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=minute)))
    # conv B: all close together -> no closed session emitted yet
    for i in range(4):
        rows.append(("conv-B", i, "user", "hi", "", pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    spark.createDataFrame(pdf).write.mode("append").parquet(in_dir)

    q = start_sessionize_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["conv_id"] == "conv-A"
    assert row["session_no"] == 0
    assert row["n_turns"] == 3

    # a later batch with another gap closes the second A-session from state
    late = pd.DataFrame(
        [("conv-A", 9, "user", "hi", "", pd.Timestamp("2026-01-01") + pd.Timedelta(hours=3))],
        columns=pdf.columns,
    )
    spark.createDataFrame(late).write.mode("append").parquet(in_dir)
    q = start_sessionize_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir).toPandas().sort_values("session_no")
    assert len(out) == 2
    assert out.iloc[1]["n_turns"] == 2  # the 42/43-minute pair
