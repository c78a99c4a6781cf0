"""syslog_loose_spark — a PySpark-native engine with the capabilities of
StephenWakely/syslog-loose (tolerant RFC3164/RFC5424 parsing) generalized
into a parse → enrich → route → aggregate pipeline.

Drop-in-feel API surface (reference lib.rs entry points on the left):

    parse_message(s)                 -> Message        (row-at-a-time)
    parse_message_exact(s)           -> Message | ParseFail (strict)
    serialize_message(m)             -> str            (Display)
    Message, ParseFail, ParseConfig

Spark-side:

    parse_syslog_udf(cfg)    scalar struct UDF over a string column
    parse_tokenized(df, cfg) the tokenized-table pipeline stage
    run_pipeline(...)        resumable parse→enrich→route→aggregate job
"""

from .config import ParseConfig, PipelineConfig, default_year_policy
from .oracle import (
    FACILITY_NAMES,
    SEVERITY_NAMES,
    Message,
    ParseFail,
    compose_pri,
    decompose_pri,
    parse_message,
    parse_message_exact,
    serialize_message,
    strip_sd_escapes,
)

__all__ = [
    "ParseConfig", "PipelineConfig", "default_year_policy",
    "Message", "ParseFail", "parse_message", "parse_message_exact",
    "serialize_message", "strip_sd_escapes", "decompose_pri", "compose_pri",
    "FACILITY_NAMES", "SEVERITY_NAMES",
]


def parse_syslog_udf(cfg: ParseConfig = ParseConfig()):
    from .operators.parse import parse_syslog_udf as _f

    return _f(cfg)


def parse_tokenized(df, cfg: ParseConfig = ParseConfig()):
    from .operators.parse import parse_tokenized as _f

    return _f(df, cfg)


def run_pipeline(*args, **kwargs):
    from .plans.pipeline import run_pipeline as _f

    return _f(*args, **kwargs)
