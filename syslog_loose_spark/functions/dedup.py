"""Deduplication operators for training-data pipelines.

Scale shapes:
  * exact_dedup      — hash-groupBy, one shuffle on the content hash
  * ngram jaccard    — shingle explode + self-join on shingle (bounded by
                       shingle frequency; cap hot shingles before joining)
  * MinHash + LSH    — signature via portable md5-based hashing, banded
                       bucket join: candidate generation cost is
                       O(rows × bands), never O(rows²)
  * SimHash          — 64-bit sign-aggregated word hashes; near-dup pairs
                       via simhash_near_dups (banded bit-slice equality
                       join + exact bit_count(xor) re-score)

The word/shingle hash is the first 8 hex chars of md5 — identical in Spark
and DuckDB, which keeps every operator here oracle-checkable in pure SQL.

Scale guards (the difference between O(n) and O(n²) at 100 TB): every
bucket-equality self-join caps degenerate buckets (``max_shingle_freq`` /
``max_bucket_size``) and persists the bucketed relation so it is computed
once, not once per join side.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

MERSENNE = 2147483647  # 2^31-1, the classic MinHash modulus

# Bounded registry of persisted intermediates (ADVICE r2): the bucketed
# relations cached by the near-dup operators used to live until session
# teardown, so a long-lived session running many queries accumulated
# executor storage.  Each new tracked persist now evicts the oldest beyond
# a small window (unpersist only drops cache — consumers recompute, so
# eviction is always correct), and callers that know a result is fully
# materialized can drop everything with unpersist_tracked().
_PERSISTED: list = []
# Bound raised 2 -> 5 in r7: the curation_v2 composition legitimately
# carries 5 live stage caches (two scored relations, the winnow
# fingerprints, and both survivor relations); with the bound at 2 the
# survivors were evicted at plan-build time and the composition REPLAYED
# the expensive stages — interleaved A/B at 100k worst-case-vocab docs
# measured 2.1x (19-22 s full cache vs 40-51 s evicting).  Still a hard
# bound: a long-lived session never holds more than 5 live caches.
# (r8: _track now checkpoints instead of persisting, so "eviction" just
# drops the registry reference — downstream plans keep their blocks
# alive through the JVM Dataset, and truly-unreferenced blocks are freed
# by the ContextCleaner.)
_MAX_LIVE = 5
_PERSISTED_LOCK = threading.Lock()


def _drop(df: DataFrame) -> None:
    # a handle may be bound to a SparkSession that has since stopped
    # (tests/streaming restart sessions); dropping cache on a dead
    # session is a no-op by intent, not an error
    try:
        df.unpersist()
    except Exception:
        pass


def _register(df: DataFrame) -> DataFrame:
    """Put an ALREADY-persisted frame under the bounded registry (same
    eviction path as _track, without a second persist)."""
    with _PERSISTED_LOCK:
        _PERSISTED.append(df)
        evict = _PERSISTED[:-_MAX_LIVE]
        del _PERSISTED[:-_MAX_LIVE]
    for old in evict:
        _drop(old)
    return df


def _track(df: DataFrame) -> DataFrame:
    """Materialize a reused stage relation and TRUNCATE its lineage.

    r8: eager localCheckpoint replaced persist().  persist kept the full
    logical plan alive under every consumer, and on deep compositions
    (curation_v2: five tracked stages, each nesting the previous ones)
    the driver's plan canonicalization/cache-lookup dominated wall time
    — measured 11.6 s -> 3.2 s at sf0.1 and the same shape at 100k docs
    just from cutting lineage (guide §3.3/§5: materialise intermediates
    to truncate enormous plans).  Storage cost is the same class as the
    old MEMORY_AND_DISK persist; the trade is fault-tolerance of the
    materialized blocks (executor loss means job restart instead of
    recompute), acceptable for bounded stage relations.  Values are
    unchanged — every tracked relation is deterministic by construction.
    Eviction/unpersist still runs through the registry: dropping the
    reference lets the ContextCleaner free checkpoint blocks, and
    unpersist_tracked() additionally unpersists the checkpointed RDD
    DIRECTLY (the ContextCleaner's weak-ref path needs a JVM GC cycle;
    measured: without the direct drop a long-lived session accumulated
    one persistent RDD per tracked stage across the whole query suite)."""
    ck = df.localCheckpoint(eager=True)
    try:
        # the checkpointed blocks' RDD handle, for the explicit drop in
        # unpersist_tracked (LogicalRDD.rdd via the JVM plan)
        ck._ck_rdd = ck._jdf.queryExecution().analyzed().rdd()
    except Exception:
        ck._ck_rdd = None
    return _register(ck)


def _track_persist(df: DataFrame) -> DataFrame:
    """The pre-r8 persist-based tracking, kept for the two cases where a
    checkpoint is the wrong tool: ONE-ROW broadcast index frames (the ANN
    cents/codebook/stats rows — lineage is shallow, and the eager
    checkpoint job costs more than it saves) and iterative trainer loops
    that already truncate lineage explicitly every few rounds (the BPE
    trainers, where a per-round checkpoint job is pure overhead)."""
    return _register(df.persist(StorageLevel.MEMORY_AND_DISK))


def unpersist_tracked() -> int:
    """Release every live tracked cache (call after materializing).

    NB (r8): for checkpoint-tracked relations this DROPS THE BLOCKS —
    lineage is truncated, so a still-held DataFrame handle cannot be
    re-executed afterwards (unlike the old persist path, which fell back
    to recompute).  The contract is unchanged in spirit: call only after
    the results are materialized."""
    with _PERSISTED_LOCK:
        live, _PERSISTED[:] = _PERSISTED[:], []
    for df in live:
        rdd = getattr(df, "_ck_rdd", None)
        if rdd is not None:
            try:
                rdd.unpersist(False)
            except Exception:
                pass
        _drop(df)
    return len(live)


def _widen(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan widening (r8): a fixture-sized input arrives
    as a single parquet row group — ONE scan task — which serializes the
    expensive per-row kernels (simhash votes, winnow/minhash md5 chains,
    ANN encode folds) these operators run before their first shuffle.
    Widen to the session's parallelism when the scan is narrower; at
    real scale inputs already carry more splits than cores and this is
    a NO-OP (the same pattern the BPE trainers use).  Results are
    unaffected: every consumer is order-independent, and Spark's
    sort-before-repartition keeps the round-robin assignment
    deterministic under retries."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def cap_buckets(df: DataFrame, keys: list[str],
                max_bucket_size: int) -> DataFrame:
    """Drop degenerate buckets before a bucket-equality self-join — one
    oversized bucket (e.g. millions of near-empty docs sharing a
    signature) would re-square the join.  Dropped buckets lose only pairs
    the other bands can still recover, so recall degrades gracefully
    instead of the job falling over."""
    ok = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("bn"))
          .where(F.col("bn") <= max_bucket_size)
          .select(*keys))
    return df.join(ok, keys)


def content_hash(text: Column) -> Column:
    return F.md5(F.encode(text, "UTF-8"))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact content hash.  One hash-shuffle."""
    return (
        df.select(content_hash(F.col(text_col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
    )


def word_hash(col: Column) -> Column:
    """Portable string->int64: first 32 bits of md5 (matches the DuckDB
    expression CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 8),
                  16, 10).cast("long")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (distinct set per doc downstream)."""
    w = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(w) - F.lit(n))
    return F.when(
        F.size(w) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(w, " ")))


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_freq: int = 1000,
                        persist: bool = True) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    Shuffle plan: explode -> distinct -> self-join on shingle -> count
    common -> join per-doc sizes (broadcastable when docs are few; fine as
    shuffle join at scale).  ``max_shingle_freq`` drops degenerate hot
    shingles that would square the join (the standard guard at web scale:
    a shingle shared by f docs yields ~f²/2 pairs, so the cap bounds the
    worst bucket at ~max_shingle_freq²/2).

    The exploded shingle relation feeds four consumers (sizes, freq, both
    self-join sides); with ``persist`` (default) it is cached so the
    explode+distinct shuffle runs once instead of four times.  Tracked
    persists are bounded (see ``_track``) and droppable via
    ``unpersist_tracked()`` once the result is materialized.
    """
    sh = (
        _widen(df).select(F.col(id_col).alias("id"),
                          F.explode(F.array_distinct(
                              shingles(F.col(text_col), n))).alias("sh"))
        .distinct()
    )
    if persist:
        sh = _track(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    sh = sh.join(freq.where(F.col("f") <= max_shingle_freq), "sh")
    common = (
        sh.alias("x").join(sh.alias("y"), "sh")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common
        .join(sizes.withColumnRenamed("id", "a")
                   .withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b")
                   .withColumnRenamed("sz", "szb"), "b")
        .withColumn("jaccard",
                    F.col("c") / (F.col("sza") + F.col("szb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


# deterministic affine MinHash coefficients (any fixed odd-ish constants)
def _coeffs(k: int):
    a = [(2 * i + 1) * 1000003 % MERSENNE for i in range(1, k + 1)]
    b = [(i * i + 7) * 999983 % MERSENNE for i in range(1, k + 1)]
    return a, b


def minhash_signature(text: Column, k: int = 8, n: int = 3) -> Column:
    """k-wide MinHash over word n-gram shingles:
    sig_i = min over shingles of (a_i * h(s) + b_i) mod 2^31-1."""
    a, b = _coeffs(k)
    hashes = F.transform(F.array_distinct(shingles(text, n)), word_hash)

    # NB: plain 2-arg lambdas only — a default-arg capture changes the
    # detected arity and pyspark binds the array-index column instead.
    def _mh(ai: int, bi: int):
        return lambda h: (h * F.lit(ai) + F.lit(bi)) % F.lit(MERSENNE)

    return F.array(*[
        F.array_min(F.transform(hashes, _mh(a[i], b[i]))).alias(f"mh{i}")
        for i in range(k)
    ])


def minhash_signature_df(df: DataFrame, k: int = 8, n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id"
                         ) -> DataFrame:
    """(id, sig) with the shingle-hash array materialized ONCE per row —
    the 8 per-permutation mins then reuse it, which keeps the codegen tree
    small and evaluates md5 once per shingle instead of once per
    (shingle × permutation)."""
    a, b = _coeffs(k)

    def _mh(ai: int, bi: int):
        return lambda h: (h * F.lit(ai) + F.lit(bi)) % F.lit(MERSENNE)

    hashed = _widen(df).select(
        F.col(id_col).alias("id"),
        F.transform(F.array_distinct(shingles(F.col(text_col), n)),
                    word_hash).alias("hs"),
    )
    return hashed.select(
        "id",
        F.array(*[F.array_min(F.transform(F.col("hs"), _mh(a[i], b[i])))
                  for i in range(k)]).alias("sig"),
    )


def minhash_lsh_candidates(df: DataFrame, k: int = 8, bands: int = 4,
                           n: int = 3, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_bucket_size: int = 1000,
                           persist: bool = True) -> DataFrame:
    """Banded LSH: equal band-slices of the signature land in the same
    bucket; candidate pairs come from a groupBy-bucket self-join — the
    scalable alternative to the quadratic all-pairs comparison.

    ``max_bucket_size``: see cap_buckets.
    """
    rows = k // bands
    sig = minhash_signature_df(df, k, n, text_col, id_col)
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.concat_ws(",", *[
                         F.col("sig")[bi * rows + r].cast("string")
                         for r in range(rows)]).alias("key"))
            for bi in range(bands)])).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    if persist:   # 3 consumers (cap agg + both join sides); see ngram note
        banded = _track(banded)
    capped = cap_buckets(banded, ["band", "key"], max_bucket_size)
    return (
        capped.alias("x").join(capped.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )


# bit j of the simhash reads bit j%32 of md5 half j//32; the final value
# re-assembles sign bits with plain literal masks (bit 63 is the long's
# sign bit, hence the negative literal — identical wrap as shiftleft)
_SIMHASH_BITS = [(0 if j < 32 else 1, 1 << (j % 32)) for j in range(64)]
_SIMHASH_OUT_MASKS = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def minhash_jaccard_estimate(df: DataFrame, k: int = 8, bands: int = 4,
                             n: int = 3, text_col: str = "text",
                             id_col: str = "doc_id",
                             max_bucket_size: int = 1000) -> DataFrame:
    """Sketch-based similarity for LSH candidate pairs: estimate Jaccard
    as the fraction of agreeing MinHash components (the estimator's
    expectation IS the Jaccard).  This is the 100-TB similarity path —
    O(pairs x k) signature comparisons instead of the shingle self-join's
    O(pairs x shingles); the exact ngram_jaccard_pairs stays as the
    ground-truth oracle for recall studies at small scale."""
    cands = minhash_lsh_candidates(df, k, bands, n, text_col, id_col,
                                   max_bucket_size)
    sig = minhash_signature_df(df, k, n, text_col, id_col)
    return (
        cands
        .join(sig.withColumnRenamed("id", "a")
                 .withColumnRenamed("sig", "sa"), "a")
        .join(sig.withColumnRenamed("id", "b")
                 .withColumnRenamed("sig", "sb"), "b")
        .withColumn("est_jaccard", F.round(
            F.size(F.filter(
                F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
                lambda v: v)) / F.lit(float(k)), 4))
        .select("a", "b", "est_jaccard")
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over words: bit_j = sign of sum over words of
    (bit_j(h(w)) ? +1 : -1), h = md5 split into two 32-bit halves.

    Single-pass shape: ONE md5 per word, ONE aggregate whose accumulator
    is the 64-wide vote array (zip_with against a literal bit-mask table).
    The previous formulation built 64 separate aggregate folds — a huge
    codegen tree re-walking the word array 64 times; this one is measured
    4.5x faster on the documents table, bit-identical output (and thus
    identical to the DuckDB oracle).  Near-dup pair generation over the
    value lives in simhash_near_dups."""
    w = F.split(text, " ")
    ms = F.transform(w, lambda x: F.md5(F.encode(x, "UTF-8")))
    hs = F.transform(ms, lambda m: F.struct(
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("b")))
    bits = F.array(*[
        F.struct(F.lit(h).alias("half"), F.lit(mk).cast("long").alias("mask"))
        for h, mk in _SIMHASH_BITS])
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc, bits,
            lambda c, b: c + F.when(
                F.when(b["half"] == 0, h["a"]).otherwise(h["b"])
                 .bitwiseAND(b["mask"]) != 0, F.lit(1)).otherwise(F.lit(-1))),
    )
    outm = F.array(*[F.lit(mk).cast("long") for mk in _SIMHASH_OUT_MASKS])
    return F.aggregate(
        F.zip_with(votes, outm,
                   lambda v, mk: F.when(v > 0, mk)
                                  .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda a, x: a + x)


def simhash_df(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("id"),
                     simhash64(F.col(text_col)).alias("sh"))


def simhash_near_dups(df: DataFrame, max_hamming: int = 3, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket_size: int = 1000,
                      persist: bool = True) -> DataFrame:
    """Near-dup pairs (a < b) with hamming(simhash_a, simhash_b) <=
    ``max_hamming``.

    Scale shape: the 64-bit simhash splits into ``bands`` equal bit
    slices; by pigeonhole any pair within hamming distance < ``bands``
    shares at least one identical slice, so candidates come from equality
    joins on (band, slice) — O(rows x bands), never all-pairs — and the
    exact ``bit_count(xor) <= d`` check re-scores candidates.  Requires
    ``max_hamming < bands`` for complete recall (asserted).  Degenerate
    buckets are capped like minhash_lsh_candidates.
    """
    assert max_hamming < bands, "pigeonhole needs max_hamming < bands"
    width = 64 // bands
    mask = (1 << width) - 1
    # NB: sh itself has a single consumer (sliced) — only the sliced
    # relation, read 3x, is worth caching
    sh = simhash_df(_widen(df), text_col, id_col)
    sliced = sh.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("sh", b * width)
                 .bitwiseAND(F.lit(mask)).alias("key"))
            for b in range(bands)])).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.key")
    if persist:
        sliced = _track(sliced)
    capped = cap_buckets(sliced, ["band", "key"], max_bucket_size)
    return (
        capped.alias("x").join(capped.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh")))
                 .cast("long").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _local_components(rows) -> list:
    """Union-find over a collected edge list (union-by-min, so the final
    root of every node IS the minimum reachable id — same contract as the
    distributed path)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set()
    for r in rows:
        nodes.add(r[0])
        nodes.add(r[1])
    return [(x, find(x)) for x in nodes]


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 32,
                         local_threshold: int = 1 << 20) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the MINIMUM node id reachable through the pair graph
    — the deterministic canonical representative.

    This is the post-pass that turns near-duplicate PAIRS into duplicate
    CLUSTERS (transitivity: a~b and b~c must collapse to one keeper even
    when a~c was never emitted by the banded join).

    Two physical strategies behind one contract:

    * ``n_edges <= local_threshold`` (the overwhelmingly common case —
      the pair set is the OUTPUT of a banded similarity join, orders of
      magnitude smaller than the corpus): one bounded collect + driver
      union-find.  The distributed loop costs several Spark jobs PER
      ROUND in fixed scheduling latency; for a thousand-edge graph that
      was measured at ~8 s of pure overhead vs microseconds of actual
      union-find work (r5).  The collect is bounded by construction:
      at most 2*local_threshold rows of two ints (~32 MB at the default).
    * larger graphs: iterative min-label propagation with pointer
      jumping, pure DataFrame joins:

        label[x] <- min(label[x], min over neighbors label[y])   (1 hop)
        label[x] <- min(label[x], label[label[x]])               (jump)

      The jump step doubles the effective propagation distance per round
      (hash-to-min style), so convergence is O(log diameter) rounds over
      the PAIR set.  Every generation is materialized by the convergence
      check and the previous one unpersisted, so peak storage is two
      label frames + the edge set.  Raises RuntimeError if ``max_iter``
      rounds don't converge (loud, never silently-wrong clusters)."""
    # single-pass undirected expansion: a union of pairs with its swap
    # would evaluate the (expensive — banded-join) pair subtree TWICE;
    # exploding both directions out of one row reads it once
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col(a_col).alias("x"), F.col(b_col).alias("y")),
                F.struct(F.col(b_col).alias("x"), F.col(a_col).alias("y"))
             )).alias("e"))
             .select("e.x", "e.y")
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        if edges.count() <= 2 * local_threshold:
            from pyspark.sql.types import StructField, StructType

            spark = pairs.sparkSession
            t = edges.schema["x"].dataType
            out = _local_components(
                [(r["x"], r["y"]) for r in edges.collect()])
            return spark.createDataFrame(
                out, StructType([StructField("node", t, False),
                                 StructField("component", t, False)]))
        labels = (edges.groupBy("x").agg(F.min("y").alias("nmin"))
                  .select("x", F.least(F.col("x"),
                                       F.col("nmin")).alias("lbl"))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        labels.count()
        for _ in range(max_iter):
            nbr = (edges.join(labels.select(F.col("x").alias("y"),
                                            F.col("lbl").alias("ylbl")),
                              "y")
                   .groupBy("x").agg(F.min("ylbl").alias("nlbl")))
            prop = (labels.join(nbr, "x", "left")
                    .select("x", F.least(
                        F.col("lbl"),
                        F.coalesce(F.col("nlbl"), F.col("lbl")))
                        .alias("lbl")))
            parent = prop.select(F.col("x").alias("px"),
                                 F.col("lbl").alias("plbl"))
            jumped = (prop.join(parent, prop["lbl"] == parent["px"],
                                "left")
                      .select(prop["x"].alias("x"),
                              F.least(prop["lbl"],
                                      F.coalesce(parent["plbl"],
                                                 prop["lbl"]))
                              .alias("lbl"))
                      .persist(StorageLevel.MEMORY_AND_DISK))
            changed = (jumped.alias("n")
                       .join(labels.alias("o"), "x")
                       .where(F.col("n.lbl") != F.col("o.lbl")).count())
            labels.unpersist()
            labels = jumped
            if changed == 0:
                # registered through the same bounded-eviction path as
                # every other near-dup cache (_MAX_LIVE holds; callers
                # still unpersist_tracked() after materializing)
                _register(labels)
                return labels.select(F.col("x").alias("node"),
                                     F.col("lbl").alias("component"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(diameter > 2^rounds is implausible for near-dup graphs — "
            "check the pair input)")
    finally:
        edges.unpersist()


def drop_near_dup_docs(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical document per near-duplicate CLUSTER: the
    minimum id of each connected component survives, every other member
    is dropped.  Docs in no pair pass through untouched.  One broadcast-
    able anti-join against the (small) non-canonical member set."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


def contamination_hits(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                       min_hits: int = 1, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, n_hits) for every corpus document sharing at least
    ``min_hits`` distinct word n-grams with ANY benchmark/eval document —
    the standard pre-training decontamination check (eval answers leaking
    into the training set inflate benchmark scores).

    Scale shape: the eval set is tiny next to the corpus, so its distinct
    n-gram set is BROADCAST; the corpus side streams explode → broadcast
    semi-probe → per-doc distinct count.  The only shuffle is the groupBy
    over the MATCHED rows (rare n-grams → few matches), never the corpus
    n-gram stream.  With n=8 over natural text, spurious collisions are
    negligible; lower n / higher min_hits trade recall vs precision."""
    ev = (eval_docs.select(F.explode(F.array_distinct(
              shingles(F.col(text_col), n))).alias("gram"))
          .distinct())
    corpus = _widen(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(
            shingles(F.col(text_col), n))).alias("gram"))
    return (corpus.join(F.broadcast(ev), "gram")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .where(F.col("n_hits") >= min_hits)
            .select(F.col("id").alias(id_col), "n_hits"))


def duplicated_ngram_stats(docs: DataFrame, n: int = 8,
                           min_docs: int = 2, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Corpus SELF-duplication signal (the Lee-et-al "deduplicating
    training data" measurement): per document, how many of its distinct
    word n-grams also occur in at least ``min_docs`` documents corpus-wide
    — high dup_frac marks templated/mirrored/boilerplate-heavy pages that
    survive document-level dedup because their full texts differ.

    Scale shape: one (gram -> distinct-doc count) hash aggregation builds
    the duplicated-gram set; each doc counts its members against it and
    derives dup_frac.  The duplicated set grows with the corpus, so the
    join carries NO broadcast hint (AQE decides — same contract as
    word_rarity_stats / remove_boilerplate_lines).  The gram stream
    shuffles once for the count and once for the per-doc agg; nothing is
    collected.  Returns (id, n_grams, n_dup, dup_frac)."""
    docs = _widen(docs)
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(
            shingles(F.col(text_col), n))).alias("gram"))
    dup = (grams.groupBy("gram")
           .agg(F.count_distinct("id").alias("nd"))
           .where(F.col("nd") >= min_docs).select("gram"))
    per = (grams.join(dup, "gram")
           .groupBy("id").agg(F.count(F.lit(1)).alias("n_dup")))
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(shingles(F.col(text_col), n)))
         .alias("n_grams"))
    return (totals.join(per, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.col("n_grams").cast("long").alias("n_grams"),
                    F.coalesce(F.col("n_dup"), F.lit(0))
                     .cast("long").alias("n_dup"))
            .withColumn("dup_frac", F.round(
                F.col("n_dup") / F.greatest(F.col("n_grams"), F.lit(1)),
                4)))


def strip_duplicated_spans(docs: DataFrame, n: int = 8,
                           min_docs: int = 2, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """The ACTIONABLE sibling of duplicated_ngram_stats — the Lee-et-al
    "Deduplicating Training Data" EXSUBSTR shape re-expressed over word
    n-grams: excise from every document each token covered by an n-gram
    that occurs in >= ``min_docs`` DISTINCT documents, keeping the rest
    of the text intact (document-level dedup can't touch these — the
    surrounding text differs).  Overlapping duplicated spans merge
    naturally because removal is per covered TOKEN position.

    Edge semantics: documents shorter than ``n`` tokens produce no
    grams (they cannot contain an n-token duplicated span) and pass
    through verbatim — deliberately NOT the whole-doc fallback gram
    ``shingles`` uses for set-similarity.

    Scale shape: positional grams stream through one
    (gram -> distinct-doc count) hash aggregation to build the
    duplicated set; the occurrence join carries NO broadcast hint (the
    duplicated set grows with the corpus — same contract as
    duplicated_ngram_stats / word_rarity_stats).  Only MATCHED
    occurrences (rare) fan out to their n covered positions, which
    collapse to ONE position-set row per affected doc (collect_set —
    bounded by that doc's own length); the rebuild is then a single
    id-keyed join of the docs against that small set table plus a pure
    per-row index-aware array filter.  The raw token stream is NEVER
    exploded into a shuffle (the r6 first cut anti-joined every token
    of the corpus — at web scale that shuffle dwarfs the duplicated
    set by orders of magnitude).  Returns (id, text, n_words,
    n_removed) with ``text`` rebuilt from the surviving tokens."""
    w = F.split(F.col(text_col), " ")
    gram_arr = F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(0), F.size(w) - F.lit(n)),
                    lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    docs = _widen(docs)
    g = docs.select(F.col(id_col).alias("id"),
                    F.posexplode(gram_arr).alias("pos", "gram"))
    dup = (g.groupBy("gram")
           .agg(F.count_distinct("id").alias("nd"))
           .where(F.col("nd") >= min_docs).select("gram"))
    rm = (g.join(dup, "gram")
          .select("id", F.explode(F.sequence(
              F.col("pos"), F.col("pos") + F.lit(n - 1))).alias("tp"))
          .groupBy("id")
          .agg(F.collect_set("tp").alias("rm")))
    base = docs.select(F.col(id_col).alias("id"),
                       F.split(F.col(text_col), " ").alias("ws"))
    rm_arr = F.coalesce(F.col("rm"), F.array().cast("array<int>"))
    kept_arr = F.filter(
        "ws", lambda x, i: ~F.array_contains(rm_arr, i))
    return (base.join(rm, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.array_join(kept_arr, " ").alias(text_col),
                    F.size("ws").cast("long").alias("n_words"),
                    F.size(rm_arr).cast("long").alias("n_removed")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  min_hits: int = 1, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Drop corpus documents flagged by ``contamination_hits`` — one
    left-anti join against the (small) contaminated-id set."""
    hits = contamination_hits(docs, eval_docs, n, min_hits, id_col,
                              text_col)
    return docs.join(hits.select(id_col), id_col, "left_anti")


def content_fingerprints(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """The persistable state-table side of incremental dedup: one 16-byte
    md5 of the NORMALIZED text per distinct content (column ``fp``).
    Store THIS between crawls — hashes, never text — and feed it back to
    dedup_incremental_fp so a year of history is a few TB of fingerprints
    instead of a re-scan + re-hash of every kept document."""
    from .text import normalize_text

    fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    return docs.select(fp.alias("fp")).distinct()


def dedup_incremental_fp(new_docs: DataFrame, seen_fps: DataFrame,
                         text_col: str = "text",
                         fp_col: str = "fp") -> DataFrame:
    """Fingerprint-table incremental dedup (r5 VERDICT item 6): drop new
    documents whose normalized content hash appears in ``seen_fps``, a
    PRE-HASHED fingerprint frame (the shape content_fingerprints writes
    and the resume state table already stores for chunks).  Only the
    increment is hashed; history is never re-read as text.

    One anti-join on the 16-byte hash.  When a day's increment is small
    relative to the accumulated table, only the hash column shuffles —
    and the optimizer may broadcast the increment side instead when it
    is the smaller relation."""
    from .text import normalize_text

    fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    # no distinct on the seen side: left_anti semantics are unchanged by
    # right-side duplicates, and content_fingerprints already dedups the
    # state table it writes — re-aggregating it here would add a full
    # exchange+hash-agg over the history per increment (r6 review)
    seen = seen_fps.select(F.col(fp_col).alias("fp"))
    return (new_docs.withColumn("fp", fp)
            .join(seen, "fp", "left_anti")
            .drop("fp"))


def dedup_incremental(new_docs: DataFrame, seen_docs: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Snapshot-over-snapshot dedup from raw TEXT on both sides: hashes
    ``seen_docs`` on the fly and delegates to dedup_incremental_fp.
    Convenience form — production loops should persist
    content_fingerprints and call the _fp variant directly."""
    return dedup_incremental_fp(
        new_docs, content_fingerprints(seen_docs, text_col), text_col)


def winnow_fingerprints(df: DataFrame, k: int = 4, w: int = 5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): hash every word k-gram to a 60-bit md5-derived
    integer, slide a w-wide window over the hash sequence, keep each
    window's MINIMUM; the distinct minima are the document's
    fingerprint set.  The paper's guarantee: any shared token run of
    length >= w + k - 1 between two documents shares at least one
    selected fingerprint — POSITION-ROBUST local sampling, unlike
    MinHash (one global sketch) or SimHash (one global vote): a copied
    paragraph inside an otherwise different document still collides.

    Scale shape: gram hashing, the sliding minima, and the distinct
    all happen in ONE per-row expression chain (no shuffle, no
    Python); only the exploded (id, fp) output is relational, and
    winnowing's density bound (~2/(w+1) of positions selected) makes
    that stream a fraction of the token stream.  Docs shorter than
    k + w - 1 tokens produce no fingerprints (explode drops them) —
    too short for the guarantee to mean anything.

    Returns (id, fp), distinct per document."""
    k, w = int(k), int(w)
    staged = df.select(F.col(id_col).alias("id"),
                       F.split(F.col(text_col), " ").alias("ws"))
    # explicit empty-array guards: Spark's sequence(1, 0) is a
    # DESCENDING [1, 0] (not empty), whose 0 would crash slice()
    hs = F.expr(
        f"case when size(ws) >= {k} then"
        f" transform(sequence(1, size(ws) - {k} + 1),"
        f" i -> cast(conv(substr(md5(array_join(slice(ws, i, {k}),"
        f" ' ')), 1, 15), 16, 10) as bigint))"
        f" else array() end")
    mins = F.expr(
        f"case when size(hs) >= {w} then"
        f" array_distinct(transform(sequence(1, size(hs) - {w} + 1),"
        f" j -> array_min(slice(hs, j, {w}))))"
        f" else cast(array() as array<bigint>) end")
    return (staged.select("id", hs.alias("hs"))
            .select("id", F.explode(mins).alias("fp")))


def winnow_near_dups(df: DataFrame, k: int = 4, w: int = 5,
                     min_shared: int = 2, max_bucket_size: int = 1000,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs by SHARED winnowed fingerprints — the
    copied-passage detector: pair weight n_shared counts distinct
    fingerprints two documents have in common, so a lifted paragraph
    of >= w + k - 1 tokens forces n_shared >= 1 and longer copies
    scale it up.

    Scale shape: bucket-equality self-join on the fingerprint value,
    capped with cap_buckets (degenerate fingerprints shared by
    thousands of docs — empty-ish text — would re-square the join;
    dropping whole oversized buckets is deterministic and
    oracle-replicable); the fingerprint relation persists through the
    bounded registry (cap agg + both join sides read it).  Returns
    (a, b, n_shared) with n_shared >= min_shared."""
    fps = _track(winnow_fingerprints(_widen(df), k=k, w=w,
                                     text_col=text_col, id_col=id_col))
    capped = cap_buckets(fps, ["fp"], max_bucket_size)
    return (capped.alias("x").join(capped.alias("y"), "fp")
            .where(F.col("x.id") < F.col("y.id"))
            .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= int(min_shared))
            .select("a", "b", F.col("n_shared").cast("long")
                    .alias("n_shared")))
