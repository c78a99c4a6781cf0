"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: a broadcasted query set
  against the corpus, JVM-side dot products via zip_with/aggregate (no
  Python boundary), windowed rank for top-k.
* LSH-bucketed variant (random-hyperplane signs) — the scale path: restrict
  the candidate set to matching sign-buckets before exact re-scoring, so
  cost is O(rows × bucket_size) instead of O(rows × queries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact top-k neighbors per query (query set broadcast — the corpus is
    scanned once, embarrassingly parallel; excludes self-matches)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def hyperplane_signs(vec: Column, planes) -> Column:
    """Sign bits against fixed hyperplanes -> bucket key string."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0), lambda acc, v: acc + v,
            ) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(corpus: DataFrame, queries: DataFrame, planes, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """Approximate top-k: exact re-scoring restricted to same sign-bucket.
    ``planes`` is a small deterministic list of hyperplane vectors."""
    def bucketed(df, idn):
        return df.select(F.col(id_col).alias(idn),
                         F.col(vec_col).alias(idn + "_v"),
                         hyperplane_signs(F.col(vec_col), planes)
                         .alias("bucket"))

    c = bucketed(corpus, "neighbor_id")
    q = bucketed(queries, "query_id")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(
            cosine(F.col("query_id_v"), F.col("neighbor_id_v")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
