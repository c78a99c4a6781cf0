"""Sessionization: the classic log-pipeline analytic-window operator.

Gap-based sessions per user: a new session starts when the gap to the
previous event exceeds ``gap_minutes``.  Pure window functions (lag +
running sum over a partition) — one shuffle on the session key, fully
SQL-expressible, so it gets an honest DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Assign session ids: (user, session_seq) where session_seq increments
    at every gap > gap_minutes."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ inputs: cast to TIMESTAMP (identity under the pinned UTC session)
    # so unix_micros accepts them
    tsc = F.col(ts_col).cast("timestamp")
    prev = F.lag(tsc).over(w)
    # microsecond arithmetic: unix_timestamp() truncates sub-second parts
    # and silently mis-buckets events exactly at the gap boundary
    new_sess = (
        prev.isNull()
        | ((F.unix_micros(tsc) - F.unix_micros(prev))
           > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    return events.withColumn("session_seq",
                             F.sum(new_sess).over(w).cast("long"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-session row counts and duration seconds."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.floor((F.unix_micros(F.max(F.col(ts_col).cast("timestamp")))
                      - F.unix_micros(F.min(F.col(ts_col).cast("timestamp"))))
                     / 1_000_000)
             .cast("long").alias("duration_s"))
    )
