"""Temporal/relational operators over event streams (graft extras; the
reference has no SQL/temporal layer — these broaden the §2.9 relational
checklist with the window/sessionization/semi-structured shapes a
training-data pipeline needs for telemetry and curriculum tables).

All pure native expressions: tumbling windows (``F.window``), ranked
windows (``row_number``), gaps-and-islands sessionization (lag + running
sum — the distributed form of per-user sequential scans), and JSON field
extraction.  Every operator is DuckDB-oracle-checkable (driver queries
events_hourly_rollup / events_sessions / events_topk_per_user /
events_json_extract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregation per event_type.

    window_start is emitted as epoch seconds (bigint) so results are
    engine- and timezone-representation independent.  At scale this is one
    shuffle on (window, event_type) with map-side partial aggregation —
    exactly the shape Structured Streaming runs incrementally with a
    watermark (see streaming test)."""
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session stats via gaps-and-islands: a session breaks when
    the gap to the previous event exceeds ``gap_minutes``.

    Output: (user_id, n_sessions, n_events, max_session_events).
    Two shuffles (user window + session agg), both partitioned by user —
    the second reuses the first's partitioning."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (no direct long cast); the timestamp hop adds
    # a fixed session-tz offset that cancels in the difference
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(by_user)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn("_new", is_new).withColumn(
        "_sid", F.sum("_new").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = tagged.groupBy("user_id", "_sid").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("_n").alias("n_events"),
        F.max("_n").alias("max_session_events"),
    )


def topk_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value per user (ranked window; deterministic
    tie-break on event_id)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "event_id", "value", "rank")
    )


def json_extract_props(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull props.k as an int column (the
    get_json_object path stays JVM-side)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )
