"""Stateful streaming sessionization vs its batch rendering.

Input files are written in event-time order so triggers see no late data;
then every session the stream emits must equal a batch session exactly, and
only each user's final (still-open, timeout not yet reached) session may be
missing from the stream output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datatrove_spark.operators import time_series
from datatrove_spark.streaming.sessions_stream import sessionize_stream
from tests.conftest import SF_SMALL

GAP_MIN = 10


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .filter("user_id < 8")
        .select("user_id", "ts", "value", "event_id")
    )
    # time-ordered files -> no late data across triggers
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(out + "/all")
    rows = spark.read.parquet(out + "/all").orderBy("ts").collect()
    third = len(rows) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third] if i < 2 else rows[2 * third :]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode("overwrite").parquet(
            f"{out}/in/part{i}"
        )
    return out


def test_stream_sessions_match_batch(spark, events_dir, tmp_path):
    batch_input = spark.read.parquet(f"{events_dir}/in/part*")
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.sum_value, 6))
        for r in time_series.sessionize(batch_input, gap_minutes=GAP_MIN).collect()
    }

    stream = (
        spark.readStream.schema(batch_input.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{events_dir}/in/part*")
    )
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").collect()

    assert got, "stream emitted no sessions"
    for r in got:
        key = (r.user_id, r.session_start)
        assert key in batch, f"streamed session not in batch result: {r}"
        end, n, sv = batch[key]
        assert (r.session_end, r.n_events, round(r.sum_value, 6)) == (end, n, sv), r
    # at most one (the still-open last) session per user may be missing
    n_users = batch_input.select("user_id").distinct().count()
    assert len(got) >= len(batch) - n_users
