"""String-column parse UDF (parse_message analogue, lib.rs:121-123) and
hostname-dimension enrichment."""

from pyspark.sql import functions as F

from syslog_loose_spark.config import ParseConfig, PipelineConfig
from syslog_loose_spark.operators.enrich import enrich
from syslog_loose_spark.operators.parse import parse_syslog_udf, parse_tokenized
from syslog_loose_spark.oracle import parse_message
from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS
from syslog_loose_spark.sources.tokenized import generate_tokenized


def test_parse_syslog_udf_string_column(spark):
    df = spark.createDataFrame(
        [(i, line) for i, (_, line) in enumerate(GOLDEN_CORPUS)],
        "idx INT, raw STRING")
    udf = parse_syslog_udf(ParseConfig())
    rows = (df.select("idx", udf(F.col("raw")).alias("m"))
            .select("idx", "m.*").orderBy("idx").collect())
    for r in rows:
        m = parse_message(GOLDEN_CORPUS[r["idx"]][1])
        assert (r["facility"], r["severity"]) == (m.facility, m.severity)
        assert r["hostname"] == m.hostname
        assert r["msg"] == m.msg
        assert r["protocol"] == m.protocol


def test_parse_syslog_udf_null_input(spark):
    df = spark.createDataFrame([(1, None), (2, "<34>1 - h a - - - x")],
                               "idx INT, raw STRING")
    udf = parse_syslog_udf(ParseConfig())
    rows = {r["idx"]: r for r in
            df.select("idx", udf("raw").alias("m")).select("idx", "m.*")
            .collect()}
    assert rows[1]["parse_ok"] is False and rows[1]["msg"] == ""
    assert rows[2]["hostname"] == "h"


def test_hostname_dim_enrichment(spark):
    parsed = parse_tokenized(generate_tokenized(spark, len(GOLDEN_CORPUS)),
                             ParseConfig())
    host_dim = spark.createDataFrame(
        [("74794bfb6795", "dc-east", "prod"),
         ("ubnt", "edge", "prod")],
        "hostname STRING, site STRING, env STRING")
    out = enrich(parsed, hostname_dim=host_dim)
    rows = out.where(F.col("site").isNotNull()) \
        .select("hostname", "site", "env").distinct().collect()
    got = {(r["hostname"], r["site"], r["env"]) for r in rows}
    assert ("74794bfb6795", "dc-east", "prod") in got
    assert ("ubnt", "edge", "prod") in got
    # unmatched hostnames keep null enrichment (left join)
    assert out.where(F.col("hostname") == "plertrood-thinkpad-x220")
    n_null = out.where(F.col("hostname").isNotNull()
                       & F.col("site").isNull()).count()
    assert n_null > 0
    # the plan stays broadcast (third BroadcastHashJoin, still no shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "Exchange hashpartitioning" not in plan
