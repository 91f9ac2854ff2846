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
    # the double cast keeps sub-second precision; unix_timestamp would
    # truncate to whole seconds and disagree with fractional epoch()
    # arithmetic (and merge_asof semantics) on gaps within 1s of the bound.
    # NTZ needs the intermediate timestamp cast; the session-tz shift it
    # introduces is identical on both sides and cancels in the difference.
    def _secs(c):
        return c.cast("timestamp").cast("double")

    in_tol = (_secs(F.col(ts)) - _secs(marker_ts)) <= tolerance_s
    return events.select(
        "event_id",
        key,
        "event_type",
        F.when(in_tol, marker_ts).alias("asof_marker_ts"),
        F.when(in_tol, marker_id).alias("asof_marker_event_id"),
    )
