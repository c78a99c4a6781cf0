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


def _mat_scans(plan):
    """Count materialized-relation scans: r8's _track produces an eager
    localCheckpoint (printed as a `Scan ExistingRDD`), _track_persist the
    classic InMemoryTableScan — either proves the relation is computed
    once and REUSED, which is what these shape tests pin."""
    return plan.count("InMemoryTableScan") + plan.count("ExistingRDD")


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


def test_q1_pushdown_and_pruning(spark):
    """The shipdate filter must reach the parquet scan (PushedFilters) and
    the scan must not read columns q1 never touches (l_tax, l_partkey) —
    at 100 TB that's the difference between scanning 6 columns and 11."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q1_pricing_summary"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines()
            if "FileScan" in ln and "lineitem" in ln][0]
    assert "l_shipdate" in scan.split("PushedFilters")[-1], scan
    assert "l_tax" not in scan, scan
    assert "l_partkey" not in scan, scan


def test_q3_segment_filter_pushed_and_broadcast(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q3_top_orders"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    cust_scan = [ln for ln in plan.splitlines()
                 if "FileScan" in ln and "customer" in ln][0]
    assert "c_mktsegment" in cust_scan.split("PushedFilters")[-1], cust_scan
    assert "BroadcastHashJoin" in plan, plan


def test_ngram_shingle_relation_cached_once(spark):
    """The exploded shingle relation feeds 4 consumers; the plan must show
    ONE materialization (r8: an eager localCheckpoint -> ExistingRDD scan;
    previously an InMemoryTableScan) instead of 4 explode+distinct trees —
    the consumer plan may not replay the shingle explode at all."""
    from syslog_loose_spark.functions.dedup import (
        ngram_jaccard_pairs, unpersist_tracked)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = ngram_jaccard_pairs(docs, threshold=0.5)
    plan = _plan(df)
    assert ("ExistingRDD" in plan) or ("InMemoryTableScan" in plan), plan
    assert "Generate explode" not in plan, plan
    unpersist_tracked()
    spark.catalog.clearCache()


def test_dedup_exact_single_shuffle(spark):
    """exact_dedup is one hash-aggregate: exactly one Exchange (plus
    AQE reads) and no join in the plan."""
    from syslog_loose_spark.functions.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(exact_dedup(docs))
    assert "Join" not in plan, plan
    n_exchange = sum(1 for ln in plan.splitlines()
                     if "Exchange hashpartitioning" in ln)
    assert n_exchange == 1, plan


def test_bucketed_route_write_enables_shuffle_free_join(spark, tmp_path):
    """Two outputs bucketed by doc_id must join with ZERO Exchange — the
    co-location contract that makes downstream dedup/lineage joins free
    at 100 TB."""
    from syslog_loose_spark.operators.route import route_write_bucketed
    from syslog_loose_spark.sources.tokenized import generate_tokenized

    import shutil

    for t in ("routed_a", "routed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a failed prior run can orphan the managed location
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    routed = parsed_pipeline(generate_tokenized(spark, 400),
                             PipelineConfig())
    cfg = PipelineConfig(shuffle_partitions=8)
    route_write_bucketed(routed.select("doc_id", "source", "sink"),
                         "routed_a", cfg, n_buckets=8)
    route_write_bucketed(routed.select("doc_id", "n_tok"),
                         "routed_b", cfg, n_buckets=8)
    # force a sort-merge join (tiny test tables would auto-broadcast and
    # hide the co-location property under test)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("routed_a").join(spark.table("routed_b"), "doc_id")
             .groupBy("sink").count())
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        # bucketed scans feed the join directly: no shuffle on doc_id
        assert "Exchange hashpartitioning(doc_id" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS routed_a")
    spark.sql("DROP TABLE IF EXISTS routed_b")


def test_top_users_partial_topk_not_global_window(spark):
    """events_top_users must compile to TakeOrderedAndProject (per-partition
    partial top-k), not a global unpartitioned Window over every user total
    — the single-reducer sort dies at 100x user cardinality.  The rank
    window that remains must sit ABOVE the limit (bounded 20-row input)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["events_top_users"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # the Window node's subtree must contain the TakeOrdered (i.e. windowed
    # input is the already-limited frame, not the raw totals)
    win_at = plan.find("Window")
    topk_at = plan.find("TakeOrderedAndProject")
    assert win_at != -1 and topk_at != -1 and win_at < topk_at, plan


def test_term_doc_freq_partial_topk(spark):
    """Corpus term stats must rank via TakeOrderedAndProject, never a
    global sort of the full term dictionary."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["term_doc_freq"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_ivf_refined_cents_cached_not_recomputed(spark):
    """The refined centroid one-row frame feeds two broadcasts (corpus
    assignment + query probing); it must come from cache in BOTH places
    or the corpus-wide Lloyd pass runs twice (r4 fix — the executed plan
    had no ReusedExchange)."""
    from syslog_loose_spark.functions import similarity as S
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = S.ivf_topk(emb, emb.where(F.col("vec_id") < 3),
                    n_cells=8, n_probe=2, k=3)
    plan = _plan(df)
    assert _mat_scans(plan) >= 2, plan
    unpersist_tracked()


def test_hash_split_is_pure_projection_no_exchange(spark):
    """Split assignment must be a per-row function: any Exchange means
    the operator would reshuffle 100 TB for a column derivable in the
    scan projection."""
    from syslog_loose_spark.functions.sampling import hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(hash_split(docs, [("train", 0.9), ("val", 0.1)]))
    assert "Exchange" not in plan, plan


def test_pack_sequences_single_shard_exchange(spark):
    """Packing shuffles ONCE on the shard key; the running sum stays
    inside each shard's window partition."""
    from syslog_loose_spark.functions.sampling import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pack_sequences(docs, budget=4096, n_shards=8))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_curation_full_plan_shape(spark):
    """The composed curation plan (r4 VERDICT item 6): no cartesian
    products, every similarity join hash- or broadcast-based, and a
    bounded number of exchanges — the filters + repetition caps must fuse
    into the scan side, not add per-family shuffles beyond the aggregate
    (repetition), the banded self-join, and the final anti-join."""
    import __spark_entry__ as entry_mod
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    df = entry_mod.queries()["curation_full"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # exchanges: repetition agg (2-level), bucket-cap agg + banded
    # self-join, CC-losers anti-join side, final sort. The bound is
    # deliberately loose — it catches an accidental extra per-family
    # shuffle (each adds >= 2 at once), not partition-count tuning.
    n_ex = plan.count("Exchange")
    assert n_ex <= 14, f"{n_ex} exchanges:\n{plan}"
    unpersist_tracked()


def test_pq_codebook_trains_on_bounded_sample(spark):
    """VERDICT r5 item 2: the PQ codebook build must NOT run its
    per-subspace seed window over the full corpus — with train_n set,
    the window's input is a TakeOrderedAndProject of at most train_n
    rows (per-partition top-n + one merge, no full sort shuffle).
    Also pins the sample SEMANTICS: training on the corpus with
    train_n=n must equal training on the n smallest-md5('pq-train-')
    rows with sampling off."""
    from syslog_loose_spark.functions import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # r8: the sampled build collects the bounded TakeOrdered sample and
    # replays the build driver-side — the returned frame is a literal
    # one-row relation; the TakeOrderedAndProject shape claim moves to
    # the distributed reference path (train_n set, driver_build off)
    plan = _plan(S.pq_codebooks(emb, m=4, ks=8, dim=16, train_n=100))
    assert ("ExistingRDD" in plan) or ("LocalTableScan" in plan), plan
    plan_dist = _plan(S.pq_codebooks(emb, m=4, ks=8, dim=16, train_n=100,
                                     driver_build=False))
    assert "TakeOrderedAndProject" in plan_dist, plan_dist

    tag = F.md5(F.concat(F.lit("pq-train-"),
                         F.col("vec_id").cast("string")))
    manual = (emb.withColumn("t", tag).orderBy("t", "vec_id")
              .limit(100).drop("t"))
    a = S.pq_codebooks(emb, m=4, ks=8, dim=16, train_n=100).collect()
    b = S.pq_codebooks(manual, m=4, ks=8, dim=16, train_n=0).collect()
    assert a == b


def test_gopher_c4_pure_map_no_exchange(spark, tmp_path):
    """The per-row curation filters (Gopher rules, C4 line filter) must
    stay whole-stage-codegen maps over the scan: zero exchanges, zero
    Python boundaries — at 100 TB they are the map side of whatever
    follows, never a shuffle of their own."""
    from syslog_loose_spark.functions.text import (c4_line_filter,
                                                   gopher_quality_stats)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox."), (2, "- a\n- b")],
        "doc_id LONG, text STRING")
    for op in (gopher_quality_stats, c4_line_filter):
        plan = _plan(op(docs))
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


def test_rate_anomalies_two_exchanges_window_over_aggregate(spark):
    """rate_anomalies computes per-key totals via a window OVER the
    hourly aggregate, not a rollup+self-join: exactly two exchanges
    (hash agg + window repartition), and the window input is the
    aggregate, so the raw event stream is shuffled once only."""
    import datetime as dt

    from syslog_loose_spark.operators.aggregate import rate_anomalies

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h), "t") for h in range(4)],
        "ts TIMESTAMP, event_type STRING")
    plan = _plan(rate_anomalies(ev))
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan


def test_heavy_hitters_one_python_boundary_and_broadcast_total(spark):
    """heavy_hitter_words: the MG candidate pass is the ONLY Python
    boundary (one cached MapInPandas — the recount is pure JVM), the
    candidate probe is a BROADCAST hash join (a sort-merge probe would
    shuffle the entire token stream: AQE materializes both sides before
    re-deciding, measured ~17 s of token Exchange at 80M tokens), and
    the 1-row token total joins by broadcast, never a shuffle."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import heavy_hitter_words

    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(50)], "doc_id LONG, text STRING")
    try:
        plan = _plan(heavy_hitter_words(df, thr_ppm=1000))
        # the MG pass lives inside the materialized candidate relation
        # (r8: executed once by the eager checkpoint, so the final plan
        # shows only the ExistingRDD scan — zero Python at probe time)
        assert _mat_scans(plan) >= 1, plan
        assert plan.count("EvalPython") == 0, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan
    finally:
        unpersist_tracked()


def test_calibrated_quality_reuses_cached_scores(spark):
    """calibrated_quality_cut: the scored relation feeds BOTH the
    histogram branch and the output join through the persisted cache —
    the expensive unigram pipeline must not appear twice in the plan."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import calibrated_quality_cut

    df = spark.createDataFrame(
        [(i, "x y z common common") for i in range(30)],
        "doc_id LONG, text STRING")
    try:
        plan = _plan(calibrated_quality_cut(df))
        assert _mat_scans(plan) >= 2, plan
    finally:
        unpersist_tracked()


def test_bpe_merge_partial_topk_and_broadcast_pair(spark):
    """bpe_merge_step: the winning pair comes from a partial top-k
    (TakeOrdered), never a global sort, and joins every row by
    broadcast; the merge itself is pure JVM (zero Python)."""
    from syslog_loose_spark.functions.text import bpe_merge_step

    df = spark.createDataFrame(
        [(i, "a a b a a") for i in range(40)], "doc_id LONG, text STRING")
    plan = _plan(bpe_merge_step(df))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_dedup_broadcast_cents_cached_assignment(spark):
    """semantic_dedup: ONE broadcast centroid row drives a shuffle-free
    cell assignment (BroadcastNestedLoopJoin, zero Python), and the
    assigned relation is computed once and cached — both sides of the
    within-cell pair join must read the InMemoryRelation, never replay
    the assignment (or the centroid build) twice."""
    from syslog_loose_spark.functions import similarity as S
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(80)
    try:
        plan = _plan(S.semantic_dedup(emb, n_cells=4))
        assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, \
            plan
        assert _mat_scans(plan) >= 2, plan
    finally:
        unpersist_tracked()


def test_nb_classifier_model_join_no_forced_broadcast(spark):
    """nb_lang_classifier: the vocabulary-sized model join must carry NO
    broadcast hint (the word_rarity r5 lesson — the model grows with the
    corpus).  With broadcasting disabled the scoring join must fall back
    to a shuffle join AND produce identical results; the bounded classes
    dim keeps its explicit broadcast either way."""
    from syslog_loose_spark.functions.text import nb_lang_classifier

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    default = sorted(nb_lang_classifier(docs).collect())
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = nb_lang_classifier(docs)
        plan = _plan(df)
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), plan
        assert "BroadcastHashJoin" in plan or \
            "BroadcastNestedLoopJoin" in plan, plan
        fallback = sorted(df.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert default == fallback


def test_bpe_encode_pure_map_no_exchange(spark):
    """bpe_encode compiles a frozen merge table into one chained replace
    expression: zero exchanges, zero Python — at 100 TB it is the map
    side of whatever follows, never a stage of its own."""
    from syslog_loose_spark.functions.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c a")], "doc_id LONG, text STRING")
    plan = _plan(bpe_encode(docs, [("a", "b"), ("a\x1fb", "c")]))
    assert "Exchange" not in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_weighted_sample_partial_topk(spark):
    """weighted_sample's n smallest keys come from TakeOrdered (per-
    partition partial top-n + one merge), never a global sort, and the
    key is a pure projection — no exchange beyond the top-n merge, no
    Python."""
    from pyspark.sql import functions as F2
    from syslog_loose_spark.functions.sampling import weighted_sample

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .withColumn("wt", F2.pmod(F2.col("n_chars"), F2.lit(7)))
    plan = _plan(weighted_sample(docs, 20, "wt"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_source_kl_no_forced_broadcast_on_vocab_join(spark):
    """source_kl_divergence's word-keyed corpus join and source-keyed
    totals join carry NO broadcast hint (vocabulary and domain count
    grow with the corpus).  With broadcasting disabled the plan falls
    back to shuffle joins AND produces identical results; the 1-row
    total keeps its explicit broadcast."""
    from syslog_loose_spark.functions.text import source_kl_divergence

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(150)
    default = sorted(source_kl_divergence(docs).collect())
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = source_kl_divergence(docs)
        plan = _plan(df)
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), plan
        fallback = sorted(df.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert default == fallback


def test_dedup_inner_lines_pure_map_no_exchange(spark):
    """dedup_inner_lines is one per-row array expression: zero
    exchanges, zero Python — intra-doc state never crosses rows."""
    from syslog_loose_spark.functions.text import dedup_inner_lines

    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "x\nx")], "doc_id LONG, text STRING")
    plan = _plan(dedup_inner_lines(docs))
    assert "Exchange" not in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_quality_cut_by_reuses_cached_scores(spark):
    """calibrated_quality_cut_by: the (group, score) relation feeds the
    per-group histogram AND the output join through the persisted cache
    — the unigram pipeline must not appear twice in the plan."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import calibrated_quality_cut_by

    df = spark.createDataFrame(
        [(i, "x y z common common", "s%d" % (i % 2)) for i in range(30)],
        "doc_id LONG, text STRING, source STRING")
    try:
        plan = _plan(calibrated_quality_cut_by(df))
        assert _mat_scans(plan) >= 2, plan
    finally:
        unpersist_tracked()


def test_mix_ratios_single_scan_via_cache(spark):
    """mix_ratios_for_targets: the per-source token counts feed both
    the 1-row total and the output through the persisted cache — one
    corpus scan, and the total joins by broadcast."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import mix_ratios_for_targets

    df = spark.createDataFrame(
        [(i, "a b c", "s%d" % (i % 3)) for i in range(30)],
        "doc_id LONG, text STRING, source STRING")
    try:
        plan = _plan(mix_ratios_for_targets(df, [("s0", 10_000)]))
        assert _mat_scans(plan) >= 2, plan
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, \
            plan
    finally:
        unpersist_tracked()


def test_bigram_backoff_no_forced_broadcast_on_model_joins(spark):
    """bigram_backoff_logprob: the bigram- and word-keyed model joins
    carry NO broadcast hint (both tables grow with the corpus).  With
    broadcasting disabled the joins fall back to shuffle joins AND
    produce identical results; the 1-row corpus total keeps its
    explicit broadcast."""
    from syslog_loose_spark.functions.text import bigram_backoff_logprob

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    default = sorted(bigram_backoff_logprob(docs).collect())
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bigram_backoff_logprob(docs)
        plan = _plan(df)
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), plan
        fallback = sorted(df.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert default == fallback


def test_sq8_stats_broadcast_encode_pure_map(spark):
    """sq8_quantize: pass 1 aggregates per-dimension stats into ONE
    broadcast row; pass 2 is a pure per-row encode — the only joins are
    the broadcast, there is no corpus-keyed shuffle join and no
    Python."""
    from syslog_loose_spark.functions.similarity import sq8_quantize

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(100)
    plan = _plan(sq8_quantize(emb))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_winnow_selection_pure_map_join_capped(spark):
    """winnow_near_dups: fingerprint selection is a per-row expression
    (no Python), the fingerprint relation is cached once and read by
    the cap aggregate and both join sides (InMemoryTableScan >= 2)."""
    from syslog_loose_spark.functions.dedup import (
        unpersist_tracked, winnow_near_dups)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    try:
        plan = _plan(winnow_near_dups(docs))
        assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, \
            plan
        assert _mat_scans(plan) >= 2, plan
    finally:
        unpersist_tracked()


def test_zipf_slope_partial_topk_no_global_sort(spark):
    """zipf_slope's vocabulary head comes from TakeOrdered (partial
    top-k), never a full vocabulary sort; the only window runs over the
    <= top_n surviving rows."""
    from syslog_loose_spark.functions.text import zipf_slope

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    plan = _plan(zipf_slope(docs, top_n=50))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_asof_join_single_shuffle_no_nested_loop(spark):
    """asof_join must plan as union -> ONE keyed exchange -> window,
    never the BroadcastNestedLoopJoin a non-equi formulation produces;
    no Python anywhere."""
    from pyspark.sql import functions as F2
    from syslog_loose_spark.operators.joins import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = asof_join(ev.where(F2.col("event_type") == "click"),
                   ev.where(F2.col("event_type") == "error"))
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # key hash (+AQE read)
    assert "Window" in plan, plan
    assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, plan


def test_range_join_binned_hash_join_not_nested_loop(spark):
    """range_join_binned must plan as a HASH equi-join on (key, bin)
    with the containment predicate as a post-filter — the raw BETWEEN
    formulation would be a BroadcastNestedLoopJoin."""
    from pyspark.sql import functions as F2
    from syslog_loose_spark.operators.joins import range_join_binned

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = (ev.where(F2.col("event_type") == "error")
          .select(F2.col("event_id").alias("window_id"), "user_id",
                  F2.col("ts").alias("start"),
                  (F2.col("ts") + F2.expr("INTERVAL 60 MINUTES"))
                  .alias("end")))
    plan = _plan(range_join_binned(
        ev.where(F2.col("event_type") == "click"), iv,
        bin_seconds=3600))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_curation_v2_composed_plan_no_python(spark):
    """The round-6 curation composition (stratified cut -> winnow dedup
    -> token budget) must compile to ONE pure-JVM plan: zero Python
    boundaries, with the persisted score/fingerprint relations reused
    (multiple InMemoryTableScans) rather than recomputed."""
    import __spark_entry__ as entry_mod
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    try:
        df = entry_mod.queries()["curation_v2"](
            spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, \
            plan
        assert _mat_scans(plan) >= 3, plan
    finally:
        unpersist_tracked()


def test_sq8_topk_codes_only_scan_broadcast_sides(spark):
    """sq8_topk: the stats row and the query table are the only
    broadcasts; scoring is a per-row fold over codes — no corpus-keyed
    shuffle join, no Python."""
    from pyspark.sql import functions as F2
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.similarity import sq8_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(100)
    try:
        plan = _plan(sq8_topk(emb, emb.where(F2.col("vec_id") < 3), k=3))
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert plan.count("EvalPython") + plan.count("MapInPandas") == 0, \
            plan
    finally:
        unpersist_tracked()


def test_iceberg_partition_prune_env_gated():
    """VERDICT r6 item 7: the writer abstraction claims manifest-level
    chunk pruning on Iceberg inputs (route_write_bucketed's docstring,
    BASELINE.md).  The sandbox cannot host the runtime — no network
    (PyPI and Maven unreachable, verified r7) and installs are forbidden
    — so the claim stays design-argued there (negative result recorded
    in BASELINE.md); this test IS the smoke for any environment that
    can provide a local iceberg-spark-runtime jar."""
    import os
    import pytest

    jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if not jar:
        pytest.skip(
            "no Iceberg runtime in this sandbox (no network, installs "
            "forbidden — recorded negative result, BASELINE.md r7); "
            "set SPARK_GRAFT_ICEBERG_JAR=<iceberg-spark-runtime jar> "
            "to run the partition-prune smoke")
    import tempfile

    from pyspark.sql import SparkSession, functions as F2

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    s = (SparkSession.builder.master("local[4]")
         .appName("iceberg-smoke")
         .config("spark.jars", jar)
         .config("spark.sql.extensions",
                 "org.apache.iceberg.spark.extensions."
                 "IcebergSparkSessionExtensions")
         .config("spark.sql.catalog.local",
                 "org.apache.iceberg.spark.SparkCatalog")
         .config("spark.sql.catalog.local.type", "hadoop")
         .config("spark.sql.catalog.local.warehouse", wh)
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
    try:
        from syslog_loose_spark.sources.tokenized import generate_tokenized

        df = generate_tokenized(s, 2000)
        (df.writeTo("local.db.routed_smoke")
         .partitionedBy(F2.bucket(8, F2.col("doc_id")))
         .createOrReplace())
        full = s.table("local.db.routed_smoke")
        # chunk predicate aligned with the bucket transform: the scan
        # must open fewer data files than the full table (manifest-level
        # pruning, not a post-scan filter)
        pruned = s.sql(
            "SELECT * FROM local.db.routed_smoke "
            "WHERE system.bucket(8, doc_id) = 3")
        assert len(pruned.inputFiles()) < len(full.inputFiles())
        assert pruned.count() > 0
    finally:
        s.stop()
