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


class FakeGroupState:
    """Minimal GroupState stand-in for kernel-level unit tests (the
    applyInPandasWithState contract: exists/get/update/remove/hasTimedOut/
    setTimeoutDuration)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state does not exist")
        return self._value

    def update(self, v):
        self._value = tuple(v)
        self.removed = False

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _run_kernel(kernel, key, pdfs, state):
    return list(kernel(key, iter(pdfs), state))


def test_session_numbering_survives_idle_flush_and_resume():
    """ADVICE r02 (high): the idle-timeout flush must NOT discard the session
    counter — a conversation that resumes after one or MORE idle gaps has to
    continue at session_no+1, never re-emit session_no=0."""
    from b2xtranslator_spark.streaming.sessionize import make_sessionizer

    kernel = make_sessionizer(gap_seconds=60)
    state = FakeGroupState()
    key = ("conv-A",)

    # batch 1: three close turns -> open session 0 in state, nothing emitted
    out = _run_kernel(
        kernel, key, [pd.DataFrame({"ts_epoch": [1000, 1001, 1002]})], state
    )
    assert out == [] and state.get[0] == 0 and state.get[2] == 3

    # idle timeout fires: session 0 flushed, counter advanced and KEPT
    state.hasTimedOut = True
    out = _run_kernel(kernel, key, [], state)
    assert len(out) == 1
    assert out[0].iloc[0]["session_no"] == 0 and out[0].iloc[0]["n_turns"] == 3
    assert state.exists and state.get == (1, None, 0, None)

    # a SECOND empty timeout (conversation stays quiet) must not kill the
    # counter either — this was the round-3 regression caught by the drive
    out = _run_kernel(kernel, key, [], state)
    assert out == [] and state.exists and state.get[0] == 1

    # resume: new turns become session 1 (not a duplicate session 0)
    state.hasTimedOut = False
    out = _run_kernel(kernel, key, [pd.DataFrame({"ts_epoch": [9000, 9001]})], state)
    assert out == [] and state.get == (1, 9001, 2, 9000)
    state.hasTimedOut = True
    out = _run_kernel(kernel, key, [], state)
    assert out[0].iloc[0]["session_no"] == 1 and out[0].iloc[0]["n_turns"] == 2
