"""Temporal operators over the events table (events.py) — unit semantics
plus the Structured Streaming equivalence for the windowed rollup."""

import datetime

from pyspark.sql import functions as F

from lshdedup.events import hourly_rollup, sessionize, topk_per_user

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minute)


def test_sessionize_known_fixture(spark):
    rows = [
        # user 1: events at 0, 10, 20 min (one session), then 120 (second)
        (0, _ts(0), 1, "a", 1.0, "{}"),
        (1, _ts(10), 1, "a", 1.0, "{}"),
        (2, _ts(20), 1, "a", 1.0, "{}"),
        (3, _ts(120), 1, "a", 1.0, "{}"),
        # user 2: single event
        (4, _ts(5), 2, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["user_id"]: r for r in sessionize(df, gap_minutes=30).collect()}
    assert got[1]["n_sessions"] == 2
    assert got[1]["n_events"] == 4
    assert got[1]["max_session_events"] == 3
    assert got[2]["n_sessions"] == 1 and got[2]["n_events"] == 1


def test_topk_per_user_ties_deterministic(spark):
    rows = [
        (0, _ts(0), 1, "a", 5.0, "{}"),
        (1, _ts(1), 1, "a", 5.0, "{}"),   # tie → lower event_id wins
        (2, _ts(2), 1, "a", 9.0, "{}"),
        (3, _ts(3), 1, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [(r["event_id"], r["rank"]) for r in
           topk_per_user(df, k=3).orderBy("rank").collect()]
    assert got == [(2, 1), (0, 2), (1, 3)]


def test_streaming_rollup_equals_batch(spark, tmp_path):
    """The SAME hourly_rollup shape run as a Structured Streaming windowed
    aggregation (complete mode) produces the batch result — the streaming
    form of the temporal operator."""
    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    batch = {tuple(r) for r in hourly_rollup(spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = hourly_rollup(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM rollup_test").collect()}
    assert got == batch
