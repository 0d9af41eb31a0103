"""Structured Streaming: streaming masking + windowed/session aggregates.

Streams are bounded replays of the events fixture (file source +
availableNow trigger) so results are deterministic and comparable to batch.
"""

import pytest
from pyspark.sql import functions as F

from mysql_data_anonymizer_spark.blueprint import Blueprint
from mysql_data_anonymizer_spark.sources import files
import mysql_data_anonymizer_spark.streaming.stream_ops as ms


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a micros-timestamp parquet dir for readStream."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    files.read_table(spark, f"{sf_dir}/events.parquet", table_name="events").write.mode(
        "overwrite"
    ).parquet(path)
    return path


@pytest.fixture(scope="module")
def events_stream(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    return spark.readStream.schema(batch.schema).parquet(events_dir)


def test_mask_stream_rejects_batch_df(spark, events):
    plan = Blueprint("events", lambda t: t.primary("event_id")).plan
    with pytest.raises(ValueError, match="streaming"):
        ms.mask_stream(events, plan)


def test_mask_stream_rejects_row_template(events_stream):
    bp = Blueprint(
        "events",
        lambda t: t.primary("event_id").column("props").replaceWith("row_#row#"),
    )
    with pytest.raises(ValueError, match="#row#"):
        ms.mask_stream(events_stream, bp.plan)


def test_mask_stream_masks_user_id(spark, events_stream, events_dir):
    bp = Blueprint(
        "events",
        lambda t: t.primary("event_id")
        .column("user_id")
        .replaceWith(F.col("user_id") + F.lit(500000)),
    )
    masked = ms.mask_stream(events_stream, bp.plan)
    ms.run_to_memory(masked, "masked_events")
    got = spark.sql("SELECT count(*) n, min(user_id) lo FROM masked_events").collect()[0]
    batch = spark.read.parquet(events_dir)
    assert got.n == batch.count()
    assert got.lo >= 500000


def test_tumbling_aggregates_match_batch(spark, events_stream, events_dir):
    ms.run_to_memory(ms.tumbling_aggregates(events_stream), "ev_tumbling")
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM ev_tumbling").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "total_value")
    )
    expected = {(r.ws, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert streamed == expected  # bounded replay: no late drops, exact parity


def test_sliding_windows_overlap(spark, events_stream):
    ms.run_to_memory(ms.sliding_counts(events_stream, "1 hour", "30 minutes"), "ev_sliding")
    rows = spark.sql("SELECT * FROM ev_sliding").collect()
    assert rows
    # every event lands in 2 overlapping windows: total count doubles
    total = sum(r.n_events for r in rows)
    per_window = spark.sql("SELECT sum(n_events) FROM ev_sliding").collect()[0][0]
    assert total == per_window
    starts = {r.window_start.minute for r in rows}
    assert starts == {0, 30}


def test_session_aggregates_run(spark, events_stream):
    ms.run_to_memory(ms.session_aggregates(events_stream, gap="30 minutes"), "ev_sessions")
    rows = spark.sql("SELECT * FROM ev_sessions").collect()
    assert rows
    assert all(r.session_end >= r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)
