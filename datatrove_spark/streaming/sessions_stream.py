"""Custom stateful streaming operator: gap-based sessionization.

The batch rendering lives in operators/time_series.py (lag + running sum);
this is the streaming form with explicit keyed state via
``applyInPandasWithState`` — the engine's demonstration of a custom
stateful operator (the reference has no streaming at all, SURVEY.md §2.9).

Semantics (same contract as time_series.sessionize for in-order input):
  a user's events belong to one session while consecutive gaps are
  <= gap_minutes; a larger gap closes the session and starts a new one.

Late-data contract (streaming only — the batch form sees all data sorted):
  within a micro-batch, events are sorted before merging, so intra-batch
  disorder is fully handled. Across micro-batches, a straggler that still
  falls within ``gap`` of the open session's interval merges correctly
  (including extending session_start backwards); a straggler older than
  ``session_start - gap`` is DROPPED, because the session it belonged to
  may already have been emitted — the same policy Spark's watermark applies
  one level earlier. Set ``watermark`` to the disorder bound you need.

State machine per user key:
  state = (start_us, last_us, n_events, sum_value) of the OPEN session.
  On new events: merge with state, sort by event time, split on gaps —
  every closed session is emitted immediately, the trailing open session
  goes (back) into state with an event-time timeout of last + gap.
  On timeout (watermark passed last + gap — no more events can extend it):
  emit the open session and clear state.

Scale: state is one fixed-size tuple per ACTIVE user (bounded by the
watermark-driven timeout), shuffled once on user_id — the standard
keyed-state shape that survives unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def make_session_fn(gap_minutes: int = 30):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            events: list[tuple[int, float]] = []
            for pdf in pdfs:
                us = pdf["ts"].astype("datetime64[us]").astype("int64")
                events.extend(zip(us.tolist(), pdf["value"].tolist()))
            events.sort()
            cur = tuple(state.get) if state.exists else None
            for us, val in events:
                if cur is None:
                    cur = (us, us, 1, float(val))
                elif us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (us, us, 1, float(val))
                elif us < cur[0] - gap_us:
                    # a cross-batch straggler older than the open session's
                    # reach: its true session may already be partially
                    # emitted, so merging would corrupt session_start —
                    # drop it (standard late-data policy; Spark's watermark
                    # already dropped anything older than the watermark)
                    continue
                else:
                    # out-of-order within the gap window: min() lets a
                    # straggler legitimately extend the session backwards
                    cur = (min(cur[0], us), max(cur[1], us), cur[2] + 1, cur[3] + float(val))
            if cur is not None:
                state.update(cur)
                # no more events can extend the session once the event-time
                # watermark passes last + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if not closed:
            return
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 6) for c in closed],
            }
        )

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "0 seconds"
) -> DataFrame:
    """events stream (user_id, ts, value) -> closed-session stream."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (ntz is rejected); session TZ is UTC so
    # the instant is unchanged
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
