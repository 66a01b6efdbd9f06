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


def _ntz_epoch_seconds(expr: str) -> F.Column:
    """Wall-clock seconds since 1970-01-01 for a TIMESTAMP_NTZ expression —
    pure NTZ arithmetic via timestampdiff, so the result is independent of
    spark.sql.session.timeZone (unix_timestamp on NTZ is NOT: it converts
    through the session zone and would diverge from a naive-epoch oracle on
    any non-UTC driver)."""
    return F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({expr} AS TIMESTAMP_NTZ))"
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed aggregation per event_type.

    window_start is emitted as naive epoch seconds (bigint) computed with
    timezone-free NTZ arithmetic; value sums run in integer cents (the
    fixture's values are on a 0.01 grid) so they are exact in any engine —
    no float-summation-order rounding hazards.  At scale this is one
    shuffle on (window, event_type) with map-side partial aggregation —
    exactly the shape Structured Streaming runs incrementally with a
    watermark (see streaming test)."""
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .select(
            _ntz_epoch_seconds("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_cents",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session stats via gaps-and-islands: a session breaks when
    the gap to the previous event exceeds ``gap_minutes``.

    Output: (user_id, n_sessions, n_events, max_session_events).
    Two shuffles (user window + session agg), both partitioned by user —
    the second reuses the first's partitioning."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timezone-free NTZ seconds: a session-tz hop would shift by a DST
    # transition mid-stream and mis-measure gaps that straddle it
    secs = _ntz_epoch_seconds("ts")
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
