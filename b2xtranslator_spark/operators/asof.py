"""As-of (point-in-time) join operators.

The reference's interval alignments (SURVEY.md §2.3 J1-J3) live inside the
decode UDF as searchsorted lookups; at the DataFrame level the same
"most recent value at or before T" semantics appear constantly in transcript
analytics (attach the last tool event to each turn, the last login to each
action). Spark has no native ASOF JOIN — the idiomatic composition is a
forward-filled window over the unioned stream, which shuffles each side
once by key and never builds a range cross-product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_event_asof(
    events: DataFrame,
    marker_type: str = "click",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """For every event, the timestamp/id of the user's most recent PRIOR
    (or simultaneous) event of `marker_type` — the classic as-of self-join,
    expressed as a forward-fill window (one shuffle on the key)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_marker = F.col("event_type") == marker_type
    return events.select(
        "event_id",
        key,
        "event_type",
        F.last(F.when(is_marker, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("asof_marker_ts"),
        F.last(F.when(is_marker, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("asof_marker_event_id"),
    )


def last_event_asof_tolerance(
    events: DataFrame,
    marker_type: str = "click",
    tolerance_s: int = 3600,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Tolerance-bounded as-of: the most recent prior marker, but only if it
    happened within ``tolerance_s`` seconds — older markers yield NULL (the
    pandas merge_asof ``tolerance=`` semantics, the common form for session
    attribution: 'the click that led here, unless it was hours ago').

    Same single-shuffle forward-fill plan as last_event_asof; the tolerance
    is a post-window conditional on the SAME matched row (never a second
    scan or range join)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_marker = F.col("event_type") == marker_type
    marker_ts = F.last(F.when(is_marker, F.col(ts)), ignorenulls=True).over(w)
    marker_id = F.last(
        F.when(is_marker, F.col("event_id")), ignorenulls=True
    ).over(w)
    # Interval comparison, not epoch subtraction: adding a day-time INTERVAL
    # to TIMESTAMP adds physical seconds and to TIMESTAMP_NTZ adds wall-clock
    # seconds — each exactly merge_asof's tolerance semantics for that type.
    # A cast-to-timestamp epoch diff would shift NTZ values by the session
    # tz, which does NOT cancel across a DST boundary (off by ±3600s).
    # Sub-second precision preserved on BOTH sides: the quoted fractional
    # interval literal keeps microseconds (a bare int(tolerance_s) would
    # silently truncate a float tolerance to whole seconds).
    in_tol = F.col(ts) <= marker_ts + F.expr(
        f"INTERVAL '{float(tolerance_s):.6f}' SECOND"
    )
    return events.select(
        "event_id",
        key,
        "event_type",
        F.when(in_tol, marker_ts).alias("asof_marker_ts"),
        F.when(in_tol, marker_id).alias("asof_marker_event_id"),
    )
