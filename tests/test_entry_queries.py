"""Local simulation of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() side by side on
sf0.01, compare row count, column names, ARROW TYPES, and
order-insensitive values.

The Arrow-type comparison is the r4 lesson (VERDICT r4 item 2): the
driver hashes Arrow batches, so a DuckDB HUGEINT (window/aggregate SUM
arithmetic left uncast) arrives as decimal128 and hash-mismatches
Spark's int64 even when every value is identical.  `fetchall()` coerces
those to Python ints and hides the class entirely — both sides are
therefore fetched via Arrow here and their canonical type classes
asserted before any value compare.
"""

import math
import os
from decimal import Decimal

import duckdb
import pyarrow as pa
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
    if isinstance(v, Decimal):
        # Value-compare coercion ONLY — the type gate above has already
        # failed if a Decimal reached here on one side but not the other.
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _type_class(t: pa.DataType) -> str:
    """Canonical Arrow type class: what the driver's value hash is
    sensitive to.  string/large_string collapse (encoding detail);
    timestamp tz is ignored (session-pinned UTC vs DuckDB-naive render
    identically); decimal vs integer vs float do NOT collapse."""
    if pa.types.is_unsigned_integer(t):
        return f"uint{t.bit_width}"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_date(t):
        return "date"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{_type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return ("struct<" + ",".join(
            f"{f.name}:{_type_class(f.type)}" for f in t) + ">")
    return str(t)


def _arrow_type_mismatches(spark_schema: pa.Schema,
                           duck_schema: pa.Schema) -> list:
    """Per-column (name, spark_class, duck_class) triples that differ,
    matching columns by lowercased name (the driver sorts by name)."""
    s = {f.name.lower(): _type_class(f.type) for f in spark_schema}
    d = {f.name.lower(): _type_class(f.type) for f in duck_schema}
    return [(c, s.get(c), d.get(c))
            for c in sorted(set(s) | set(d)) if s.get(c) != d.get(c)]


def _arrow_rows(tbl: pa.Table):
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)  # None-safe deterministic ordering


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(name, spark, duck):
    stbl = QUERIES[name](spark, SF_DIR).toArrow()
    spark_cols = [c.lower() for c in stbl.schema.names]
    spark_rows = _arrow_rows(stbl)

    dtbl = duck.execute(ORACLES[name]).arrow()
    duck_cols = [c.lower() for c in dtbl.schema.names]
    duck_rows = _arrow_rows(dtbl)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}")
    bad_types = _arrow_type_mismatches(stbl.schema, dtbl.schema)
    assert not bad_types, (
        f"{name}: Arrow type mismatch (col, spark, duck): {bad_types} — "
        "the driver hashes Arrow values, so this is a gate red even if "
        "every value is equal (r4 pack_sequences HUGEINT lesson)")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
    a = _rows(spark_rows, spark_cols)
    b = _rows(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


def test_gate_catches_uncast_hugeint(duck):
    """Regression for the r4 driver red: the pack_sequences oracle with
    `offset` left uncast (DuckDB window SUM → HUGEINT → decimal128 under
    Arrow) must FAIL the Arrow-type gate, and the fixed oracle must pass
    it, against the engine's published int64 contract."""
    buggy = entry_mod.oracle_sql()["pack_sequences"].replace(
        "CAST(cum_before % 4096 AS BIGINT) AS offset",
        "cum_before % 4096 AS offset")
    assert buggy != entry_mod.oracle_sql()["pack_sequences"]
    engine_schema = pa.schema([
        ("doc_id", pa.int64()), ("shard", pa.int64()),
        ("bin", pa.int64()), ("offset", pa.int64()),
        ("n_chars", pa.int64())])

    bad = _arrow_type_mismatches(
        engine_schema, duck.execute(buggy).arrow().schema)
    assert any(c == "offset" and "decimal" in (d or "")
               for c, _, d in bad), bad

    good = _arrow_type_mismatches(
        engine_schema,
        duck.execute(entry_mod.oracle_sql()["pack_sequences"])
        .arrow().schema)
    assert good == [], good


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


def test_driver_window_contract():
    """VERDICT r5 item 8: the driver verifies only the FIRST 50
    queries() entries, so rotation past the window must be deliberate.
    Red if a never-driver-verified query sits outside the window (the
    r5 structural finding), or if the latest artifact names queries
    that no longer exist (silent rename)."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(entry_mod.__file__), "tools"))
    from check_driver_window import audit

    rec = audit()
    assert rec["never_verified_outside_window"] == [], rec
    assert rec["artifact_keys_not_in_registry"] == [], rec


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


@pytest.mark.parametrize("name,engine", [
    ("ann_ivf_topk", "ivf"), ("ann_pq_topk", "pq"), ("ann_ivf_pq_topk", "ivfpq")])
def test_ann_train_sample_differential_subcorpus(name, engine, spark, duck):
    """The driver gate never exercises a training sample SMALLER than the
    corpus (fixtures < 65536 rows make the md5-prefix LIMIT a no-op), so
    this is the lockstep proof for the sampled build: engine with
    train_n=100 vs the same oracle SQL with its train LIMITs rewritten
    to 100 — rank-for-rank equal."""
    from pyspark.sql import functions as F

    from syslog_loose_spark.functions import similarity as S

    sql = ORACLES[name].replace("LIMIT 65536", "LIMIT 100")
    assert sql != ORACLES[name]  # the rewrite must have bitten
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") < 10)
    if engine == "ivf":
        df = S.ivf_topk(emb, q, n_cells=16, n_probe=4, k=5, train_n=100)
    elif engine == "pq":
        df = S.pq_topk(emb, q, m=8, ks=16, k=5, train_n=100)
    else:
        df = S.ivf_pq_topk(emb, q, n_cells=16, n_probe=4, m=8, ks=16,
                           k=5, train_n=100)
    got = sorted(tuple(r) for r in
                 df.select("query_id", "rank", "neighbor_id").collect())
    want = sorted((r[0], r[1], r[2])
                  for r in duck.execute(sql).fetchall())
    assert got == want


def test_ann_driver_build_bit_equal_distributed(spark):
    """r8: with a bounded train_n the PQ codebook and IVF centroid
    builds run driver-side on the collected md5 sample (one TakeOrdered
    job instead of a multi-stage chain).  The replay must be FLOAT-OP
    EXACT: every cvec/cn2/ncv value bit-equal to the distributed build
    it replaced (left-to-right folds, (s/n)/1e6 division order, half-up
    rounding), across train_n regimes and Lloyd depths incl. the
    0-round seeds-only path."""
    from syslog_loose_spark.functions import similarity as S
    from syslog_loose_spark.functions.dedup import unpersist_tracked

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    for train_n in (1 << 16, 100):
        loc = S.pq_codebooks(emb, train_n=train_n).collect()[0]["cb"]
        ref = S.pq_codebooks(emb, train_n=train_n,
                             driver_build=False).collect()[0]["cb"]
        assert len(loc) == len(ref)
        for a, b in zip(loc, ref):
            assert (a["sub"], a["code"]) == (b["sub"], b["code"])
            assert list(a["cvec"]) == [float(x) for x in b["cvec"]], \
                (train_n, a["sub"], a["code"])
            assert a["cn2"] == b["cn2"]
        for n_cells, rounds in ((16, 1), (8, 2), (8, 0)):
            loc = S._ivf_cents_one_local(
                emb, "vec_id", "embedding", n_cells, rounds,
                train_n).collect()[0]["cents"]
            ref_c = S._ivf_cents_one(
                S._ivf_seed_cents(emb, "vec_id", "embedding", n_cells))
            train = S._pq_train_sample(emb, "vec_id", train_n,
                                       "ivf-train-")
            for _ in range(rounds):
                ref_c = S._ivf_cents_one(S._ivf_lloyd_refine(
                    train, ref_c, "vec_id", "embedding"))
            ref = ref_c.collect()[0]["cents"]
            assert len(loc) == len(ref), (train_n, n_cells, rounds)
            for a, b in zip(loc, ref):
                assert int(a["cid"]) == int(b["cid"])
                assert list(a["cvec"]) == [float(x) for x in b["cvec"]], \
                    (train_n, n_cells, rounds, a["cid"])
                assert a["ncv"] == b["ncv"]
        unpersist_tracked()
