"""JSONL / CSV ingestion for raw-log and document corpora.

Crawl pipelines receive most non-parquet data as JSON Lines or CSV; the
production failure mode is not "can't parse a file" but "row 4,731,882
of a 10 GB shard is truncated".  Both readers here therefore parse
line-by-line with ``from_json`` / ``from_csv`` over a plain text scan
and split the result into (good, dead_letter) — the same dead-letter
discipline the syslog route stage applies to unparseable messages
(route.py:33-39), so a single malformed line never fails a 100-TB
ingest and nothing is silently dropped.

Why text + from_json instead of ``spark.read.json(mode=PERMISSIVE)``:
the built-in reader refuses plans that reference ONLY its internal
corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN —
the dead-letter frame is exactly that query; the documented workaround
is caching the whole scan, which is not a 100-TB move).  The text scan
keeps the raw line as a first-class column, parses in the same
projection (no extra pass, still whole-stage codegen), and stays
splittable because JSONL/CSV are newline-delimited — unlike a
multiLine JSON file, which is ONE task no matter its size.

The schema is REQUIRED, never inferred: inference is a full extra pass
(Spark reads every file twice) and a correctness hazard (a first shard
of all-null columns infers string).

Consuming BOTH frames materializes the text scan twice (each frame is
an independent plan).  Dead-letter rates are tiny, so the second scan
is cheap relative to caching the whole parse — but a caller writing
both outputs in one job should persist ``parsed`` (or checkpoint the
good frame) if the input will not be re-readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields)
                      + [StructField(CORRUPT_COL, StringType(), True)])


def _split(parsed: DataFrame, schema: StructType
           ) -> tuple[DataFrame, DataFrame]:
    good = (parsed.where(F.col(f"j.{CORRUPT_COL}").isNull())
            .select(*[F.col(f"j.{f.name}").alias(f.name)
                      for f in schema.fields if f.name != CORRUPT_COL]))
    dead = (parsed.where(F.col(f"j.{CORRUPT_COL}").isNotNull())
            .select(F.col("raw")))
    return good, dead


def read_jsonl(spark, path: str, schema: StructType
               ) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON into (good, dead_letter).

    ``good`` carries exactly the caller's schema; ``dead_letter``
    carries (raw,) — the untouched offending line, mirroring the parse
    fallback contract of keeping the untrimmed input (lib.rs:92 /
    oracle.py fallback rows)."""
    full = _with_corrupt(schema)
    parsed = (spark.read.text(path)
              .select(F.col("value").alias("raw"),
                      F.from_json(
                          "value", full,
                          {"mode": "PERMISSIVE",
                           "columnNameOfCorruptRecord": CORRUPT_COL})
                      .alias("j")))
    return _split(parsed, schema)


def read_csv_logs(spark, path: str, schema: StructType, sep: str = ","
                  ) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_jsonl: (good, dead_letter) with the same
    corrupt-column contract.  A row with the wrong column count or an
    unparseable typed field lands in dead_letter with its raw text
    intact."""
    full = _with_corrupt(schema)
    parsed = (spark.read.text(path)
              .select(F.col("value").alias("raw"),
                      F.from_csv(
                          "value", full.simpleString(),
                          {"mode": "PERMISSIVE", "sep": sep,
                           "columnNameOfCorruptRecord": CORRUPT_COL})
                      .alias("j")))
    return _split(parsed, schema)
