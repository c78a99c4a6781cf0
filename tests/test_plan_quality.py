"""Physical-plan assertions: the properties that matter at 100 TB must be
visible in .explain() — column pruning into the parquet scan, broadcast
(never shuffled) dim joins, exactly one Python boundary."""

from pyspark.sql import functions as F

from syslog_loose_spark.config import ParseConfig, PipelineConfig
from syslog_loose_spark.operators.aggregate import per_sink_metrics
from syslog_loose_spark.plans.pipeline import parsed_pipeline
from syslog_loose_spark.sources.tokenized import write_fixture


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_readback_metrics_scan_prunes_tokens(spark, tmp_path):
    """The aggregate/metrics read-back must NOT read the fat token column
    — at 10^12 rows that's the difference between a trivial scan and
    re-reading the whole table."""
    fixture = str(tmp_path / "in")
    out = str(tmp_path / "routed")
    write_fixture(spark, fixture, 300)
    routed = parsed_pipeline(spark.read.parquet(fixture), PipelineConfig())
    routed.write.partitionBy("sink", "source", "severity_bucket") \
        .mode("overwrite").parquet(out)
    m = per_sink_metrics(spark.read.parquet(out))
    plan = _plan(m)
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan, plan
    assert "tokens" not in scan[0], scan[0]
    assert "msg" not in scan[0], scan[0]


def test_input_scan_prunes_unused_columns(spark, tmp_path):
    """A query touching only PRI-derived fields still ships tokens into
    the UDF (it must detokenize) but must not read doc-id-irrelevant
    columns it doesn't use."""
    fixture = str(tmp_path / "in2")
    write_fixture(spark, fixture, 300)
    df = parsed_pipeline(spark.read.parquet(fixture), PipelineConfig())
    q = df.groupBy("facility").count()
    plan = _plan(q)
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    # n_tok and doc_id are not needed for this aggregate
    assert "n_tok" not in scan, scan
    assert plan.count("ArrowEvalPython") == 1 or "EvalPython" in plan


def test_single_python_boundary_in_full_pipeline(spark):
    from syslog_loose_spark.sources.tokenized import generate_tokenized

    df = parsed_pipeline(generate_tokenized(spark, 100), PipelineConfig())
    plan = _plan(df)
    # generator contributes one (mapInPandas) + parse one (ArrowEvalPython)
    n_python = plan.count("EvalPython") + plan.count("MapInPandas")
    assert n_python <= 2, plan


def test_chunk_filter_applies_before_parse(spark, tmp_path):
    """The resume chunk predicate is on a scan column and must sit below
    the Python parse stage in the physical plan (pre-parse pruning)."""
    fixture = str(tmp_path / "in3")
    write_fixture(spark, fixture, 300)
    tokens = spark.read.parquet(fixture)
    chunk = tokens.where(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == 0)
    df = parsed_pipeline(chunk, PipelineConfig())
    plan = _plan(df.select("facility"))
    # the filter must appear in/next to the scan, below the Python eval
    eval_pos = plan.find("EvalPython")
    filt_pos = plan.find("xxhash64")
    assert filt_pos > eval_pos > -1, plan  # deeper in the tree = printed later
