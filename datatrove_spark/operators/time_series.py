"""Time-series operators over the `events` stream table.

The reference is pure batch text curation (SURVEY.md §2.9: no windows, no
streaming), but a web-scale engine ingests crawl/event telemetry too; these
are the batch renderings of the streaming pipeline's aggregations
(streaming/quality_stream.py) so the same logic is checkable against a SQL
oracle:

- window_agg    tumbling event-time window x event_type: count / sum / mean
                of `value`, mean of the JSON `props.k` field (JSON scalar
                extraction). One partial+final agg, no other shuffle.
- sessionize    gap-based sessions per user (new session when the gap from
                the previous event > gap_minutes): the classic lag ->
                flag -> running-sum pattern, two windows over ONE
                hash-partitioning of user_id (partitionBy reuse).

At scale: both shuffle once on their natural key (window bucket x type /
user_id). Event-time watermarking in the streaming variant bounds state; the
batch forms here are scan -> shuffle -> agg with AQE-coalesced outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NAME = "time_series"


def window_agg(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, sum_value, avg_value, avg_k)."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 6).alias("avg_k"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "avg_value", "avg_k")
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """One row per (user, session): session_seq is the user's 1-based session
    number; bounds and size per session. Both windows share one shuffle of
    user_id (the second orders within the same partitioning)."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # microsecond epochs on both sides (ntz -> session-UTC timestamp): exact
    # integer gap math, no sub-second truncation drift vs the oracle
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = df.withColumn(
        "__new", (us - F.lag(us).over(by_user) > gap_us).cast("int")
    ).withColumn("session_seq", F.coalesce(F.sum("__new").over(by_user), F.lit(0)) + 1)
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def oracle_sql_window_agg(table: str = "events", window_sql: str = "1 hour") -> str:
    return f"""
SELECT time_bucket(INTERVAL '{window_sql}', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value,
       round(avg(json_extract_string(props, '$.k')::DOUBLE), 6) AS avg_k
FROM {table}
GROUP BY 1, 2
""".strip()


def oracle_sql_sessionize(table: str = "events", gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) + 1)::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, session_seq
""".strip()
