"""Structured Streaming surface: windowed + session aggregates over a
deterministic micro-batch source, results checked against the equivalent
batch computation."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.streaming.pit import stream_sessionize, stream_windowed_features


@pytest.fixture()
def stream_input(spark, tmp_path):
    """File-based stream: two parquet drops processed as micro-batches."""
    path = str(tmp_path / "in")
    rows = [
        (1, datetime(2024, 1, 1, 0, m), float(m)) for m in (0, 1, 2, 40, 41)
    ] + [(2, datetime(2024, 1, 1, 0, 5), 9.0)]
    df = spark.createDataFrame(rows, "entity long, event_time timestamp, value double")
    df.coalesce(1).write.parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "never" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_windowed_counts(spark, stream_input):
    out = stream_windowed_features(
        stream_input,
        {"n": F.count(F.lit(1)), "sum_v": F.sum("value")},
        window="10 minutes",
        watermark="1 hour",
    )
    _run(out, "win_t")
    got = {(r.entity, r.window_start.minute): (r.n, r.sum_v)
           for r in spark.sql("select * from win_t").collect()}
    assert got[(1, 0)] == (3, 0.0 + 1 + 2)
    assert got[(1, 40)] == (2, 40.0 + 41)
    assert got[(2, 0)] == (1, 9.0)


def test_stream_sessionize(spark, stream_input):
    out = stream_sessionize(
        stream_input,
        {"n": F.count(F.lit(1))},
        gap="30 minutes",
        watermark="1 hour",
    )
    _run(out, "sess_t")
    rows = spark.sql("select * from sess_t").collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r.entity, []).append(r.n)
    # entity 1: two sessions (minutes 0-2 and 40-41); entity 2: one session
    assert sorted(by_entity[1]) == [2, 3]
    assert by_entity[2] == [1]
