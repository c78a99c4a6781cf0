"""Spark-side serializer (functions/serialize.py) round-trip tests:
serialize the parsed corpus with the JVM expression, compare against the
Python oracle serializer, and re-parse to assert Message equality."""

from pyspark.sql import functions as F

from syslog_loose_spark.config import ParseConfig, PipelineConfig
from syslog_loose_spark.functions.serialize import serialize_syslog
from syslog_loose_spark.oracle import (
    parse_message,
    serialize_message,
)
from syslog_loose_spark.operators.parse import parse_tokenized
from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS, corpus_line
from syslog_loose_spark.sources.tokenized import generate_tokenized


def test_spark_serializer_matches_oracle(spark):
    df = parse_tokenized(generate_tokenized(spark, len(GOLDEN_CORPUS)),
                         ParseConfig())
    out = df.select(
        "doc_id",
        serialize_syslog(
            F.col("protocol"), F.col("version"), F.col("facility"),
            F.col("severity"), F.col("ts"), F.col("tz_offset_seconds"),
            F.col("hostname"), F.col("appname"), F.col("procid_pid"),
            F.col("procid_name"), F.col("msgid"), F.col("structured_data"),
            F.col("msg"),
        ).alias("line"),
    ).orderBy("doc_id").collect()
    assert len(out) == len(GOLDEN_CORPUS)
    for r in out:
        idx = int(r["doc_id"].split("-")[1])
        m = parse_message(corpus_line(idx), ParseConfig())
        want = serialize_message(m)
        assert r["line"] == want, (idx, r["line"], want)
        # the canonical line re-parses to an equal Message — guaranteed
        # only when facility/severity exist (a null facility serializes as
        # the <47> default and re-parses as (5,7); the reference quickcheck
        # generator never produces that shape, quickcheck.rs:44)
        # ... nor with a msg that starts with '-'/'[' (the grammar
        # legitimately reassigns it — same carve-outs as the property
        # generator in tests/test_property_roundtrip.py)
        # ... nor a literal '-' hostname ('-' ≡ None on re-parse; the
        # reference quickcheck compares them equal, quickcheck.rs:243-247)
        if (m.facility is not None and m.severity is not None
                and m.msg[:1] not in ("-", "[") and m.hostname != "-"):
            m2 = parse_message(r["line"])
            assert m.eq_reference(m2), idx


def test_spark_serializer_pre_epoch_fraction(spark):
    """Pre-1970 instants with fractional seconds: unix_micros is negative
    and a plain % would emit '.-500'; pmod keeps the fraction in 0..999999
    (matches oracle._ts_rfc3339)."""
    lines = [
        "<34>1 1969-12-31T23:59:59.5Z h a - - - pre-epoch",
        "<34>1 1969-12-31T23:59:59.123456Z h a - - - pre-epoch-micro",
        "<34>1 1969-12-31T23:59:59.5+05:30 h a - - - pre-epoch-offset",
        "<34>1 1901-06-01T00:00:00.25-03:00 h a - - - deep-past",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)],
                               "idx INT, raw STRING")
    from syslog_loose_spark.operators.parse import parse_syslog_udf

    p = df.select("idx", parse_syslog_udf(ParseConfig())(
        F.col("raw")).alias("m")).select("idx", "m.*")
    out = p.select(
        "idx",
        serialize_syslog(
            F.col("protocol"), F.col("version"), F.col("facility"),
            F.col("severity"), F.col("ts"), F.col("tz_offset_seconds"),
            F.col("hostname"), F.col("appname"), F.col("procid_pid"),
            F.col("procid_name"), F.col("msgid"), F.col("structured_data"),
            F.col("msg"),
        ).alias("line"),
    ).orderBy("idx").collect()
    for i, line in enumerate(lines):
        want = serialize_message(parse_message(line, ParseConfig()))
        assert out[i]["line"] == want, (line, out[i]["line"], want)
