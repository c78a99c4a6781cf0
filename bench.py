#!/usr/bin/env python
"""Benchmark harness.

Headline: end-to-end parse → enrich → route → aggregate over a tokenized
syslog parquet table sized by the scale factor (sequences/sec).  Also runs
the per-family queries at $SPARK_GRAFT_SF_DIR, and — unless
SPARK_GRAFT_SKIP_SCALING=1 — repeats the headline job at a lower
parallelism (local[N/4]) on the same input to evidence the north rule's
N → 4N scaling criterion (efficiency = (thr_4N / thr_N) / 4).

Prints exactly ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "rows": ..., "sequences_per_sec": ...,
   "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def make_session(cpus: int):
    from syslog_loose_spark.session import get_spark

    return get_spark(f"syslog-bench-{cpus}", cpus=cpus,
                     shuffle_partitions=max(2 * cpus, 8))


def headline(spark, fixture_dir: str, out_dir: str, n_rows: int) -> float:
    """Timed: scan parquet -> parse -> enrich -> route(write) -> aggregate."""
    from syslog_loose_spark.config import PipelineConfig
    from syslog_loose_spark.plans.pipeline import run_pipeline

    t0 = time.perf_counter()
    tokens = spark.read.parquet(fixture_dir)
    run_pipeline(spark, tokens, out_dir, run_id="bench",
                 cfg=PipelineConfig(), n_chunks=1)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_rows = max(int(40_000_000 * sf), 2000)

    import __spark_entry__ as entry_mod
    from syslog_loose_spark.sources.tokenized import write_fixture

    work = tempfile.mkdtemp(prefix="syslog_bench_")
    fixture = os.path.join(work, "input")
    results: dict[str, float] = {}

    spark = make_session(cpus)
    write_fixture(spark, fixture, n_rows, vary_ts=True)

    # headline at full parallelism (warm: one untimed chunk-less pass of
    # the parse stage to JIT/fork python workers)
    spark.read.parquet(fixture).limit(1000).count()
    t_full = headline(spark, fixture, os.path.join(work, "out_full"), n_rows)
    results["e2e_parse_route_aggregate"] = round(t_full, 3)

    # per-family queries at the driver's sf dir
    queries = entry_mod.queries()
    for name in ("syslog_parse_golden", "syslog_route_counts",
                 "syslog_agg_fac_sev_hour", "q1_pricing_summary",
                 "q3_top_orders", "q5_nation_revenue", "events_hourly",
                 "dedup_exact", "ngram_jaccard", "minhash_signatures",
                 "doc_fingerprint", "text_quality", "lang_id",
                 "ann_cosine_topk", "embedding_norms"):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        results[name] = round(time.perf_counter() - t0, 3)
    spark.stop()

    scaling = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        low = max(cpus // 4, 1)
        spark_low = make_session(low)
        spark_low.read.parquet(fixture).limit(1000).count()
        t_low = headline(spark_low, fixture,
                         os.path.join(work, "out_low"), n_rows)
        spark_low.stop()
        thr_full = n_rows / t_full
        thr_low = n_rows / t_low
        scaling = {
            "cores_low": low, "cores_high": cpus,
            "sec_low": round(t_low, 3), "sec_high": round(t_full, 3),
            "seq_per_sec_low": round(thr_low, 1),
            "seq_per_sec_high": round(thr_full, 1),
            "efficiency": round((thr_full / thr_low) / (cpus / low), 3),
        }

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "e2e parse->enrich->route->aggregate wall seconds "
                  f"({n_rows} tokenized sequences, local[{cpus}])",
        "value": round(t_full, 3),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "rows": n_rows,
        "sequences_per_sec": round(n_rows / t_full, 1),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
