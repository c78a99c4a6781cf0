"""Spark schemas and dimension tables for the syslog pipeline.

Data-model mapping per SURVEY.md §1.3: the reference's ``Message<S>``
(message.rs:14-26) becomes a fixed, explicitly-declared StructType; every
header field nullable; structured data is array-of-pairs (duplicate keys are
legal and input order is preserved — structured_data.rs:14-17), compared as
sorted multisets.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .oracle import FACILITY_NAMES, SEVERITY_NAMES

# input table per BASELINE.json input_hint
TOKENIZED_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("tokens", ArrayType(IntegerType(), False), False),
    StructField("n_tok", IntegerType(), False),
    StructField("source", StringType(), False),
])

SD_PARAM = StructType([
    StructField("key", StringType(), False),
    StructField("value", StringType(), False),
])
SD_ELEMENT = StructType([
    StructField("id", StringType(), False),
    StructField("params", ArrayType(SD_PARAM, False), False),
])

# flat parsed fields (message.rs:14-26 mapped per SURVEY §1.3)
SYSLOG_FIELDS = [
    StructField("protocol", StringType(), False),
    StructField("version", LongType(), True),
    StructField("facility", IntegerType(), True),
    StructField("severity", IntegerType(), True),
    StructField("ts", TimestampType(), True),            # UTC instant
    StructField("tz_offset_seconds", IntegerType(), True),
    StructField("hostname", StringType(), True),
    StructField("appname", StringType(), True),
    StructField("procid_pid", IntegerType(), True),
    StructField("procid_name", StringType(), True),
    StructField("msgid", StringType(), True),
    StructField("structured_data", ArrayType(SD_ELEMENT, False), False),
    StructField("msg", StringType(), False),
    StructField("parse_ok", BooleanType(), False),
]
SYSLOG_STRUCT = StructType(SYSLOG_FIELDS)

# parse output of the tokenized pipeline: passthrough + parsed
PARSED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("source", StringType(), False),
        StructField("n_tok", IntegerType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
    ]
    + SYSLOG_FIELDS
)


def facility_dim(spark):
    """24-row facility lookup (pri.rs:77-104) — broadcast-join side."""
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(FACILITY_NAMES)],
        "facility_code INT, facility_name STRING",
    )


def severity_dim(spark):
    """8-row severity lookup (pri.rs:145-156) + routing bucket."""
    rows = [
        (i, n, "high" if i <= 3 else ("mid" if i <= 5 else "low"))
        for i, n in enumerate(SEVERITY_NAMES)
    ]
    return spark.createDataFrame(
        rows, "severity_code INT, severity_name STRING, severity_bucket STRING"
    )


def decompose_pri_cols(pri_col):
    """PRI bit-math as JVM column expressions (pri.rs:161-169):
    facility = pri >> 3 (null if > 23), severity = pri & 7."""
    fac = F.shiftright(pri_col, 3)
    return (
        F.when(fac <= F.lit(23), fac).cast("int").alias("facility"),
        pri_col.bitwiseAND(F.lit(7)).cast("int").alias("severity"),
    )
