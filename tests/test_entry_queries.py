"""Local simulation of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() side by side on
sf0.01, compare row count, column names, and order-insensitive values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)  # None-safe deterministic ordering


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
    a = _rows(spark_rows, spark_cols)
    b = _rows(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sink" in df.columns


def test_registry_counts_consistent():
    """queries() and oracle_sql() must stay key-for-key identical, and the
    README's advertised count must match — the r2 VERDICT staleness class
    (docs said 37, registry had 38) cannot recur silently."""
    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES))
    import re

    readme = open(os.path.join(os.path.dirname(entry_mod.__file__),
                               "README.md")).read()
    m = re.search(r"driver contract: (\d+) queries, ALL (\d+)", readme)
    assert m, "README count line missing"
    assert int(m.group(1)) == len(QUERIES) == int(m.group(2)), (
        f"README says {m.group(1)}/{m.group(2)}, registry has "
        f"{len(QUERIES)}")


def test_approx_quantile_rank_error_bound(spark):
    """Beyond the sketch accuracy the GK guarantee is rank error
    <= n/accuracy: force compression with a tiny accuracy and check the
    returned value's true rank sits within the bound (with the sketch's
    own slack factor of 2 for merged summaries)."""
    from pyspark.sql import functions as F

    n, acc, p = 4000, 50, 0.5
    df = spark.range(n).select(
        (F.col("id").cast("double") * 1.7 % 997).alias("v"))
    got = df.agg(F.expr(f"approx_percentile(v, {p}, {acc})")).collect()[0][0]
    vals = sorted(r["v"] for r in df.collect())
    rank = vals.index(got) + 1
    bound = 2.0 * n / acc + 1
    assert abs(rank - p * n) <= bound, (rank, p * n, bound)
