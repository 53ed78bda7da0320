"""Streaming twins on the tie-dense fuzzed event stream.

The streaming equivalence suite (test_streaming.py) replays the driver's
UNIFORM synthetic events; windowed-aggregation, sessionization, and
dedup-by-id semantics diverge from their batch twins precisely at
equal-timestamp collisions and boundary-straddling sessions — the shapes
the seeded fuzz corpus (test_fuzz_events_parity) is built to maximize.
This suite replays that corpus through the streaming jobs and asserts
batch equivalence, so a tie a watermark or state operator handles
differently from the batch plan cannot hide in uniform data.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.streaming.jobs import (
    run_to_memory_sink,
    session_counts,
    stream_from_json_dir,
    tumbling_counts,
)
from tests.test_fuzz_events_parity import _write_events


@pytest.fixture(scope="module")
def fuzz_stream_dirs(spark, tmp_path_factory):
    """(parquet testdata dir, JSON-lines stream dir) for the seed-777
    tie-dense corpus, the stream ordered by event time so the file-source
    replay is watermark-friendly (ties keep their arbitrary-but-stable
    secondary order)."""
    data_dir = _write_events(
        str(tmp_path_factory.mktemp("fuzz_stream_data")), seed=777, n_events=120
    )
    stream_dir = tmp_path_factory.mktemp("fuzz_stream_json")
    pdf = load_table(spark, data_dir, "events").orderBy("ts", "event_id").toPandas()
    pdf["ts"] = pdf["ts"].astype(str)
    with open(stream_dir / "part-0.json", "w") as f:
        for rec in pdf.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    return data_dir, str(stream_dir)


def test_fuzz_tumbling_equals_batch(spark, fuzz_stream_dirs):
    data_dir, stream_dir = fuzz_stream_dirs
    stream = stream_from_json_dir(spark, stream_dir)
    run_to_memory_sink(tumbling_counts(stream), "fz_tumbling", mode="complete")
    got = (
        spark.table("fz_tumbling").orderBy("win_start", "event_type").toPandas()
    )
    want = (
        load_table(spark, data_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
        .orderBy("win_start", "event_type")
        .toPandas()
    )
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (got["event_type"].values == want["event_type"].values).all()


def test_fuzz_sessions_match_batch(spark, fuzz_stream_dirs):
    data_dir, stream_dir = fuzz_stream_dirs
    stream = stream_from_json_dir(spark, stream_dir)
    run_to_memory_sink(session_counts(stream), "fz_sessions", mode="complete")
    got = spark.table("fz_sessions")
    from amazon_climate_data_etl_spark.operators.events import session_windows

    want = session_windows(spark, data_dir)
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("n_events")).collect()[0][0]
        == want.agg(F.sum("n_events")).collect()[0][0]
    )
