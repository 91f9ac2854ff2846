"""Stateful streaming sessionization (applyInPandasWithState).

With ProcessingTimeTimeout, pending per-conversation state keeps the query
alive past the last data micro-batch (the timeout still has to fire), so the
tests poll the committed output and stop() rather than awaiting termination.
"""

from __future__ import annotations

import time

import pandas as pd

from b2xtranslator_spark.streaming.sessionize import start_sessionize_stream

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _await_rows(spark, q, out_dir, n_rows, timeout=120):
    """Poll the sink until >= n_rows are committed (or timeout), then stop."""
    end = time.time() + timeout
    seen = 0
    while time.time() < end:
        try:
            seen = spark.read.parquet(out_dir).count()
        except Exception:
            seen = 0
        if seen >= n_rows or not q.isActive:
            break
        time.sleep(1)
    if q.isActive:
        q.stop()
    return seen


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
    pdf = pd.DataFrame(rows, columns=COLS)
    spark.createDataFrame(pdf).write.mode("append").parquet(in_dir)

    q = start_sessionize_stream(spark, in_dir, out_dir, ckpt)
    assert _await_rows(spark, q, out_dir, 1) >= 1

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
    assert _await_rows(spark, q, out_dir, 2) >= 2
    out = spark.read.parquet(out_dir).toPandas().sort_values("session_no")
    assert len(out) == 2
    assert out.iloc[1]["n_turns"] == 2  # the 42/43-minute pair


def test_idle_conversation_final_session_is_flushed(spark, tmp_path_factory):
    """The quiet case of "emit a segment once it has been quiet for N
    minutes": a conversation that stops sending turns must still have its
    final session emitted via the processing-time timeout (ADVICE r01)."""
    base = tmp_path_factory.mktemp("sess_idle")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    # 1s apart: no event-time gap splits; the only emission is the idle flush
    rows = [
        ("conv-X", i, "user", "hi", "", pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i))
        for i in range(3)
    ]
    spark.createDataFrame(pd.DataFrame(rows, columns=COLS)).write.mode(
        "append"
    ).parquet(in_dir)

    # short gap + rolling trigger so the timeout fires within the test
    q = start_sessionize_stream(
        spark, in_dir, out_dir, ckpt, gap_seconds=6, available_now=False
    )
    assert _await_rows(spark, q, out_dir, 1, timeout=90) >= 1
    out = spark.read.parquet(out_dir).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["conv_id"] == "conv-X"
    assert row["n_turns"] == 3  # the whole (only) session, flushed on idle
