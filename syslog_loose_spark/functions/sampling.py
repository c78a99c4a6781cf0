"""Dataset assembly operators for training-data pipelines: deterministic
splits, stratified sampling, and sequence packing.

Everything here is hash-derived (md5 — the repo's portable hash, identical
in Spark and DuckDB) and window/aggregate expressible, so each operator is
exactly oracle-checkable AND rerun-stable: re-executing on the same corpus
yields byte-identical assignments, which is what makes splits auditable
and training jobs resumable.

Scale shapes:
  * hash_split        — one projection, no shuffle: split membership is a
                        pure function of the id.
  * stratified_sample — one shuffle on the stratum key + in-partition
                        rank; the md5 order makes the per-stratum sample
                        pseudo-random yet deterministic.
  * pack_sequences    — shard-parallel running sums (window per shard),
                        the chunked-concatenation packing used for
                        GPT-style pretraining: documents are laid head to
                        tail within a shard and cut into fixed-budget
                        bins, so a document may straddle two bins (that
                        is the production semantics — the alternative,
                        greedy whole-doc bin packing, is inherently
                        sequential).  Shards scale the packing across
                        executors; n_shards bounds per-task state.
  * mix_sources       — one projection, no shuffle: source-ratio
                        down-sampling as a pure per-row function of
                        (source, id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_U32 = 4294967296.0


def _hash_frac(tag: str, id_col: Column) -> Column:
    """Uniform [0,1) fraction from md5(tag || id) — first 32 bits."""
    h = F.md5(F.concat(F.lit(tag), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(_U32))


def hash_split(df: DataFrame, weights: list[tuple[str, float]],
               id_col: str = "doc_id",
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split with the given weights,
    deterministically in the id.  ``weights`` is an ordered list of
    (name, weight) summing to ~1.0; the last split absorbs rounding.
    Membership is a pure per-row function — no shuffle, no state, and a
    row's split never changes when the corpus grows (the property that
    keeps eval sets uncontaminated across crawls)."""
    frac = _hash_frac("split-", F.col(id_col))
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, group_col: str, n_per_group: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly ``n_per_group`` rows per stratum (fewer if the stratum is
    smaller), chosen by md5 rank — pseudo-random but deterministic and
    rerun-stable.  One shuffle on the stratum key; the in-partition sort
    is bounded by the stratum size (use hash_split-style filters first if
    a stratum can exceed a task)."""
    w = Window.partitionBy(group_col).orderBy(
        _hash_frac("strat-", F.col(id_col)), id_col)
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n_per_group)
            .drop("_rk"))


def pack_sequences(df: DataFrame, budget: int, n_shards: int = 16,
                   id_col: str = "doc_id",
                   size_col: str = "n_chars") -> DataFrame:
    """Chunked-concatenation packing: within each (md5-derived) shard,
    documents are laid head to tail in id order and cut into fixed
    ``budget``-sized bins.  Emits (id, shard, bin, offset) where offset
    is the document's start position inside its bin; a document whose
    span crosses a boundary continues into bin+1 (exactly how GPT-style
    pretraining concatenates and chunks).  Window per shard — shards
    pack in parallel, and the global order is deterministic."""
    shard = (F.conv(F.substring(
        F.md5(F.concat(F.lit("pack-"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("long") % n_shards).alias("shard")
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (df.select(F.col(id_col), F.col(size_col).alias("sz"), shard)
           .withColumn("cum_before",
                       F.coalesce(F.sum("sz").over(w), F.lit(0)))
           .select(
               id_col, "shard",
               (F.col("cum_before") / budget).cast("long").alias("bin"),
               (F.col("cum_before") % budget).alias("offset"),
               F.col("sz").alias(size_col)))
    return out


def mix_sources(df: DataFrame, ratios: list[tuple[str, float]],
                id_col: str = "doc_id", source_col: str = "source",
                default_ratio: float = 1.0) -> DataFrame:
    """Source-mixture control (the Pile/Dolma-style domain weighting):
    keep each row of source s with probability ratios[s], decided by the
    deterministic md5 fraction — a pure per-row projection, NO shuffle,
    rerun-stable, and growth-stable (a kept row stays kept when the
    corpus grows; eval contamination cannot creep in through re-mixing).
    ``ratios`` are KEEP probabilities in [0,1] (down-sampling only —
    up-sampling is an epoch/repetition choice at training time, not a
    row-filter); sources not listed keep ``default_ratio``.  The ratio
    table is configuration, not data, so it compiles into the projection
    as a CASE — nothing is joined or broadcast."""
    frac = _hash_frac("mix-", F.col(id_col))
    keep = F.lit(float(default_ratio))
    for name, r in reversed(ratios):
        keep = (F.when(F.col(source_col) == name, F.lit(float(r)))
                .otherwise(keep))
    return df.where(frac < keep)


def weighted_sample(df: DataFrame, n: int, weight_col: str,
                    id_col: str = "doc_id", cap: int = 32,
                    key_out: str = "sample_key") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the n rows
    with the smallest key, where a row's key is the MINIMUM of w
    independent md5 draws (w = clamp(weight, 0, cap); weight<=0 rows are
    excluded).  Mapping each draw u through -ln(1-u) turns the row key
    into a min of w iid Exp(1) variables ~ Exp(w), and the map is the
    same monotone function for every row — so the induced ranking is
    EXACTLY the Efraimidis-Spirakis (2006) exponential-key order
    (P(a outranks b) = w_a/(w_a+w_b), successive-weighted-draw
    semantics), but the comparison stays on md5 HEX STRINGS: no ln, no
    pow, no float whose last ulp could diverge between engines.

    ``cap`` bounds the per-row draw count (the md5 array is O(cap) JVM
    work per row, and a row with weight >= cap saturates — document the
    truncation when weights are heavy-tailed).  Fractional weights need
    the float exponential-key path; integer weights (token counts,
    quality grades) are the pipeline case and stay hash-exact.

    Scale shape: keys are a pure per-row projection (no shuffle), and
    the n smallest rows come from orderBy+limit == TakeOrdered — a
    per-partition partial top-n plus one n*partitions merge, never a
    global sort.  Rerun-stable and growth-stable the same way
    hash_split is: a row's key never changes when the corpus grows.
    Returns the sampled rows with ``sample_key`` appended."""
    wcl = F.least(F.greatest(F.coalesce(
        F.col(weight_col).cast("long"), F.lit(0)), F.lit(0)),
        F.lit(int(cap)))
    # Guard wcl >= 1 INSIDE the key expression: Spark sequence(1, 0) is
    # the DESCENDING [1, 0] (CLAUDE.md sequence trap), so an unguarded
    # key would manufacture a spurious i=0 draw for weight-0 rows the
    # DuckDB oracle (range(1, wcl+1) = empty) never produces.  The
    # .where below still drops those rows; the when() makes the key
    # expression safe to reuse/reorder on its own (ADVICE r6).
    key = F.when(wcl >= 1, F.array_min(F.transform(
        F.sequence(F.lit(1), wcl),
        lambda i: F.md5(F.concat(F.lit("wsamp-"),
                                 F.col(id_col).cast("string"),
                                 F.lit("-"), i.cast("string"))))))
    return (df.withColumn(key_out, key)
            .where(wcl >= 1)
            .orderBy(key_out, id_col)
            .limit(n))
