#!/usr/bin/env python
"""e2e CPU-inflation audit harness (r4 VERDICT item 4).

The canonical r4 bench showed machine-CPU per row rising 1.81x from
8 to 32 CPUs on the SAME input while the pure-Python parse kernel's
per-core droop was only 1.048x — so most of the inflation is inside the
Spark pipeline (JVM GC / shuffle / Arrow traffic / kernel time), not VM
clocks.  This harness localizes it:

* runs the bench's pinned-subprocess e2e child at two widths (and under
  A/B conf variants), INTERLEAVED so VM drift cannot land on one side;
* inside each child, splits machine CPU by process tree — JVM vs Python
  workers vs driver Python vs "other" (kernel/unaccounted);
* enables the Spark event log and aggregates per-stage task metrics
  (executor run/CPU, JVM GC, deserialize CPU, shuffle write) so the
  JVM-side share is attributed stage by stage.

Usage:
  python tools/e2e_cpu_audit.py baseline     # 8 vs 32, 2 reps each
  python tools/e2e_cpu_audit.py levers       # A/B conf levers at 32
  SPARK_GRAFT_AUDIT_ROWS=4000000 ...         # row count override

Prints one JSON line per child run plus a final summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_CHILD = r'''
import glob, json, os, sys, time

sys.path.insert(0, "/root/repo")
from syslog_loose_spark.session import get_spark
from syslog_loose_spark.config import PipelineConfig
from syslog_loose_spark.plans.pipeline import run_pipeline

fixture, out_root, slots, conf_json, evdir = sys.argv[1:6]
slots = int(slots)
conf = json.loads(conf_json)

local_dir = os.path.join(out_root, "scratch")
os.makedirs(local_dir, exist_ok=True)
os.makedirs(evdir, exist_ok=True)
extra = {"spark.sql.files.maxPartitionBytes": "8m",
         "spark.sql.files.openCostInBytes": "1m",
         "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
         "spark.eventLog.enabled": "true",
         "spark.eventLog.compress": "false",
         "spark.eventLog.dir": "file://" + evdir}
extra.update(conf)
spark = get_spark(f"audit-{slots}", cpus=slots,
                  shuffle_partitions=max(4 * slots, 8),
                  local_dir=local_dir, extra_conf=extra)

run_pipeline(spark, spark.read.parquet(fixture).limit(500000),
             f"{out_root}/warm", run_id="warm",
             cfg=PipelineConfig(shuffle_partitions=max(4 * slots, 8)),
             n_chunks=1)


def cpu_all():
    with open("/proc/stat") as f:
        p = f.readline().split()[1:]
    # user+nice+system [+irq+softirq]
    return (sum(int(x) for x in p[:3]) + int(p[5]) + int(p[6])) \
        / os.sysconf("SC_CLK_TCK")


def proc_tree_cpu():
    """{pid: (comm, ppid, utime+stime+cutime+cstime sec)} for all procs."""
    tick = os.sysconf("SC_CLK_TCK")
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split around the LAST ')'
        lp = s.rindex(")")
        comm = s[s.index("(") + 1:lp]
        rest = s[lp + 2:].split()
        ppid = int(rest[1])
        cpu = (int(rest[11]) + int(rest[12]) + int(rest[13])
               + int(rest[14])) / tick
        out[int(d)] = (comm, ppid, cpu)
    return out


def split_cpu(procs):
    """Partition process CPU into driver-python / jvm / python-worker."""
    me = os.getpid()
    descend = {me}
    changed = True
    while changed:
        changed = False
        for pid, (_, ppid, _) in procs.items():
            if ppid in descend and pid not in descend:
                descend.add(pid)
                changed = True
    jvm = pyw = drv = 0.0
    for pid, (comm, _, cpu) in procs.items():
        if pid not in descend:
            continue
        if comm == "java":
            jvm += cpu
        elif pid == me:
            drv += cpu
        else:
            pyw += cpu    # pyspark.daemon + forked workers
    return {"jvm": round(jvm, 1), "pyworker": round(pyw, 1),
            "driver_py": round(drv, 1)}


timings = {}
p0 = split_cpu(proc_tree_cpu())
c0, t0 = cpu_all(), time.perf_counter()
run_pipeline(spark, spark.read.parquet(fixture),
             f"{out_root}/run", run_id="audit",
             cfg=PipelineConfig(shuffle_partitions=max(4 * slots, 8)),
             n_chunks=1, timings=timings)
wall = time.perf_counter() - t0
mcpu = cpu_all() - c0
p1 = split_cpu(proc_tree_cpu())
split = {k: round(p1[k] - p0[k], 1) for k in p1}
split["other"] = round(mcpu - sum(split.values()), 1)

app_id = spark.sparkContext.applicationId
spark.stop()

# ---- event log: per-stage task-metric sums --------------------------------
stages = {}
names = {}
paths = []
for path in glob.glob(os.path.join(evdir, "*")):
    if app_id not in path:
        continue
    if os.path.isdir(path):  # rolling v2 layout: dir of events_* files
        paths.extend(sorted(glob.glob(os.path.join(path, "events*"))))
    else:
        paths.append(path)
for path in paths:
    with open(path) as f:
        for ln in f:
            try:
                ev = json.loads(ln)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                names[si["Stage ID"]] = si["Stage Name"].split("\n")[0]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                d = stages.setdefault(sid, {"n": 0, "run_ms": 0,
                                            "cpu_ms": 0, "gc_ms": 0,
                                            "deser_cpu_ms": 0,
                                            "shuf_write_ms": 0,
                                            "result_ser_ms": 0})
                d["n"] += 1
                d["run_ms"] += tm.get("Executor Run Time", 0)
                d["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                d["gc_ms"] += tm.get("JVM GC Time", 0)
                d["deser_cpu_ms"] += tm.get(
                    "Executor Deserialize CPU Time", 0) / 1e6
                d["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                d["shuf_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6

tot = {k: round(sum(d[k] for d in stages.values()) / 1000.0, 1)
       for k in ("run_ms", "cpu_ms", "gc_ms", "deser_cpu_ms",
                 "shuf_write_ms", "result_ser_ms")}
top = sorted(stages.items(), key=lambda kv: -kv[1]["cpu_ms"])[:6]
top_out = [{"stage": names.get(sid, str(sid))[:60],
            **{k: round(v / 1000.0, 1) if k != "n" else v
               for k, v in d.items()}} for sid, d in top]

print("RESULT " + json.dumps({
    "wall": round(wall, 2), "machine_cpu": round(mcpu, 1),
    "cores_busy": round(mcpu / wall, 1),
    "phases": {k: {"sec": v[0], "cpu": v[1]} for k, v in timings.items()},
    "proc_split": split,
    "evlog_totals_sec": tot,
    "evlog_top_stages": top_out}), flush=True)
'''


def _slots(ncpu: int) -> int:
    return max(1, (ncpu * 3) // 4)


def run_child(ncpu: int, fixture: str, work: str, tag: str,
              conf: dict) -> dict:
    conf = dict(conf)
    slots = int(conf.pop("__slots", _slots(ncpu)))
    cpus = ",".join(str(i) for i in range(ncpu))
    out_root = tempfile.mkdtemp(prefix=f"audit_{tag}_", dir=work)
    evdir = os.path.join(out_root, "evlog")
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", _CHILD,
         fixture, out_root, str(slots), json.dumps(conf), evdir],
        capture_output=True, text=True, cwd="/root/repo")
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    if not lines:
        raise RuntimeError(tag + ": " + r.stderr[-3000:])
    res = json.loads(lines[-1].split(" ", 1)[1])
    res["tag"] = tag
    res["ncpu"] = ncpu
    print(json.dumps(res), flush=True)
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    return res


def build_fixture(work: str, n_rows: int) -> str:
    sys.path.insert(0, "/root/repo")
    from syslog_loose_spark.session import get_spark
    from syslog_loose_spark.sources.tokenized import write_fixture

    fixture = os.path.join(work, "input")
    spark = get_spark("audit-gen", cpus=24)
    write_fixture(spark, fixture, n_rows, vary_ts=True, partitions=96)
    spark.stop()
    return fixture


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    n_rows = int(os.environ.get("SPARK_GRAFT_AUDIT_ROWS", "4000000"))
    tmp = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cpu_audit_", dir=tmp)
    fixture = build_fixture(work, n_rows)
    results = []

    if mode == "baseline":
        for _rep in range(2):
            results.append(run_child(32, fixture, work, "base32", {}))
            results.append(run_child(8, fixture, work, "base8", {}))
    else:
        variants = json.loads(os.environ.get("SPARK_GRAFT_AUDIT_VARIANTS", '""')) or {
            "base": {},
            "arrow10k": {
                "spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
            "gcthreads8": {"spark.driver.extraJavaOptions":
                           "-XX:+UseParallelGC -XX:ParallelGCThreads=8"},
            "heap16": {"spark.driver.memory": "16g"},
            "parquet_lz4": {"spark.sql.parquet.compression.codec": "lz4"},
            "zstd_shuffle": {"spark.io.compression.codec": "zstd"},
            "slots16": {"__slots": "16"},
        }
        for _rep in range(2):
            for tag, conf in variants.items():
                results.append(run_child(32, fixture, work, tag, conf))

    import shutil

    shutil.rmtree(work, ignore_errors=True)
    best: dict = {}
    for r in results:
        k = (r["tag"], r["ncpu"])
        if k not in best or r["wall"] < best[k]["wall"]:
            best[k] = r
    print("SUMMARY " + json.dumps(
        {f"{t}@{n}": {"wall": b["wall"], "machine_cpu": b["machine_cpu"],
                      "cores_busy": b["cores_busy"],
                      "proc_split": b["proc_split"],
                      "gc_sec": b["evlog_totals_sec"]["gc_ms"],
                      "task_cpu_sec": b["evlog_totals_sec"]["cpu_ms"]}
         for (t, n), b in sorted(best.items())}), flush=True)


if __name__ == "__main__":
    main()
