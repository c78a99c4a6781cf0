"""Aggregate stage: exact per-sink counts by facility × severity × hour.

Computed from the *routed sink files* (column-pruned read-back of 4 small
columns), not by re-running the parse stage — at 10^12 rows the read-back
scan is trivially cheap next to the parse, and aggregating what was
actually written makes the counts an integrity check of the sinks.
Partial (map-side) + final hash aggregation is Catalyst-automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


AGG_COLS = ("sink", "facility", "severity", "hour")


def sink_aggregates(routed: DataFrame) -> DataFrame:
    return (
        routed
        .groupBy(
            F.col("sink"),
            F.col("facility"),
            F.col("severity"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def per_sink_metrics(routed: DataFrame) -> DataFrame:
    """Per (sink, source, severity_bucket) lineage/metrics rows: row count
    and event-time watermark (max ts) — the checkpoint state payload."""
    return (
        routed
        .groupBy("sink", "source", "severity_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("ts").alias("watermark_ts"),
            F.sum("n_tok").alias("sum_n_tok"),
        )
    )
