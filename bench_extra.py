#!/usr/bin/env python
"""Extra per-query measurement harness for optimization work.

bench.py is FROZEN (driver contract); all exploratory numbers come from
here.  Mirrors bench.py's methodology exactly: same session shape
(bench-gen, slots = 0.75*cpus), warm pass at sf0.001 to compile codegen,
then best-of-N noop-sink timings at the target sf dir, unpersist_tracked
between reps so operator caches never carry across runs.

Usage:
  python bench_extra.py q <name> [<name>...]   time registry queries
  python bench_extra.py plan <name> [...]      save .explain('formatted')
                                               to plans/r08/<name>_<tag>.txt
  python bench_extra.py heavy <op> [...]       heavy datapoints
                                               (simhash200k|embed80k|
                                                winnow200k|curation100k)
Options:
  --reps N     (default 2)   --tag TAG   (plan file suffix, default 'cur')
  --sf DIR     (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _slots(ncpu: int) -> int:
    return max(1, (ncpu * 3) // 4)


def _get_session():
    from syslog_loose_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("bench-gen", cpus=_slots(cpus))


def _synth_docs(spark, n):
    from pyspark.sql import functions as F
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


def _synth_emb(spark, n, dim=64):
    from pyspark.sql import functions as F
    base = (F.when(F.col("vec_id") % 100 == 99, F.col("vec_id") - 1)
            .otherwise(F.col("vec_id")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(base * dim + j.cast("long")),
                          F.lit(1000)).cast("double") / 500.0 - 1.0))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))


def _heavy_fns(spark):
    from pyspark.sql import functions as F

    from syslog_loose_spark.functions.dedup import (
        simhash_near_dups, winnow_near_dups, _track)
    from syslog_loose_spark.functions.similarity import (
        embedding_near_dups, plane_bands)
    from syslog_loose_spark.functions.text import (
        calibrated_quality_cut_by, token_budget_cut, token_count)

    def curation100k():
        docs = _synth_docs(spark, 100_000).withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 5)
                               .cast("string")))
        cut1 = calibrated_quality_cut_by(docs, group_col="source",
                                         keep_ppm=700_000)
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

    planes = plane_bands(n_bands=2, n_planes=10, dim=64)
    return {
        "simhash200k": lambda: simhash_near_dups(
            _synth_docs(spark, 200_000), max_hamming=3, bands=4).count(),
        "embed80k": lambda: embedding_near_dups(
            _synth_emb(spark, 80_000), threshold=0.95,
            planes=planes).count(),
        "winnow200k": lambda: winnow_near_dups(
            _synth_docs(spark, 200_000), k=4, w=5, min_shared=2).count(),
        "curation100k": curation100k,
    }


def main() -> int:
    args = sys.argv[1:]
    reps, tag, sf_dir = 2, "cur", "/root/testdata/sf0.1"
    mode, names = args[0], []
    it = iter(args[1:])
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--tag":
            tag = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    import __spark_entry__ as entry_mod
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    spark = _get_session()
    out = {}
    if mode == "q":
        queries = entry_mod.queries()
        warm_dir = "/root/testdata/sf0.001"
        for name in names:
            if os.path.isdir(warm_dir):
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            unpersist_tracked()
            best, samples = None, []
            for _ in range(reps):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                samples.append(round(dt, 3))
                best = dt if best is None or dt < best else best
                unpersist_tracked()
            out[name] = {"best": round(best, 3), "samples": samples}
            print(f"{name}: {out[name]}", flush=True)
    elif mode == "plan":
        queries = entry_mod.queries()
        os.makedirs("/root/repo/plans/r08", exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            path = f"/root/repo/plans/r08/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            unpersist_tracked()
            print(f"{name}: wrote {path} ({txt.count('Exchange')} Exchange,"
                  f" {txt.count('EvalPython')} EvalPython)", flush=True)
    elif mode == "heavy":
        fns = _heavy_fns(spark)
        for name in names:
            best, samples, res = None, [], None
            for _ in range(reps):
                t0 = time.perf_counter()
                res = fns[name]()
                dt = time.perf_counter() - t0
                samples.append(round(dt, 3))
                best = dt if best is None or dt < best else best
                unpersist_tracked()
            out[name] = {"best": round(best, 3), "samples": samples,
                         "result": res}
            print(f"{name}: {out[name]}", flush=True)
    else:
        print(__doc__)
        return 1
    spark.stop()
    import json
    print("SUMMARY " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
