"""Enrichment stage: broadcast hash joins against the tiny dimension tables.

The reference's facility/severity name tables (pri.rs:77-104, 145-156) are
24- and 8-row dims — forced ``F.broadcast`` so no shuffle ever occurs here;
at 10^12 rows the enrich stage stays embarrassingly parallel.  Hostname
enrichment is the same pattern with a user-supplied dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schema import facility_dim, severity_dim


def enrich(parsed: DataFrame, hostname_dim: DataFrame | None = None
           ) -> DataFrame:
    spark = parsed.sparkSession
    out = (
        parsed
        .join(F.broadcast(facility_dim(spark)),
              parsed["facility"] == F.col("facility_code"), "left")
        .drop("facility_code")
        .join(F.broadcast(severity_dim(spark)),
              parsed["severity"] == F.col("severity_code"), "left")
        .drop("severity_code")
        .withColumn("severity_bucket",
                    F.coalesce(F.col("severity_bucket"), F.lit("unknown")))
    )
    if hostname_dim is not None:
        out = out.join(F.broadcast(hostname_dim), ["hostname"], "left")
    return out
