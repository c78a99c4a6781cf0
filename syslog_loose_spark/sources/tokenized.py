"""Sources for the tokenized-sequence input table.

Production entry: an Iceberg table of (doc_id, tokens, n_tok, source) —
``read_tokenized`` falls back to parquet when no Iceberg catalog is
configured (the sandbox has none).  Test/bench entry: ``generate_tokenized``
builds the same table *distributedly* (spark.range + mapInPandas), so
generation scales with the cluster instead of the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from ..schema import TOKENIZED_SCHEMA
from .corpus import GOLDEN_CORPUS, SOURCES, _MIX, tokenize


def read_tokenized(spark, path: str):
    """Read the input table.  Iceberg when the path is a catalog table name
    and an Iceberg catalog is configured; parquet otherwise."""
    if "/" not in path and "." in path:
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            pass
    return spark.read.schema(TOKENIZED_SCHEMA).parquet(path)


def generate_tokenized(spark, n_rows: int, partitions: int | None = None,
                       vary_ts: bool = False):
    """Deterministic distributed generation: row i carries corpus line
    i % len(corpus) and the skewed arithmetic source assignment
    (corpus.source_for).  Executor-side, vectorized per Arrow batch.

    ``vary_ts`` rewrites each line's first MM:SS (minute/second only, so
    hour buckets and all other parse fields are unchanged) as a function
    of the row id — benchmarks use it so per-line memoization inside the
    parser cannot trivialize the measurement."""
    import re

    toks = [np.array(tokenize(line), dtype=np.int32)
            for _, line in GOLDEN_CORPUS]
    lines = [line for _, line in GOLDEN_CORPUS]
    n_corpus = len(toks)
    n_sources = len(SOURCES)
    ts_rx = re.compile(r"(\d{2}:)(\d{2}):(\d{2})")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mod = ids % n_corpus
            h = (ids * _MIX) % 100
            src_idx = np.where(h < 60, 0, 1 + (h % (n_sources - 1)))
            sources = np.array(SOURCES, dtype=object)[src_idx]
            if vary_ts:
                row_toks = []
                for i, m in zip(ids, mod):
                    sub = ts_rx.sub(
                        lambda g, i=int(i): f"{g.group(1)}{i % 60:02d}:"
                                            f"{(i * 7) % 60:02d}",
                        lines[m], count=1)
                    row_toks.append(
                        np.frombuffer(sub.encode("utf-8"), dtype=np.uint8)
                        .astype(np.int32))
            else:
                row_toks = [toks[m] for m in mod]
            yield pd.DataFrame({
                "doc_id": [f"doc-{i:08d}" for i in ids],
                "tokens": row_toks,
                "n_tok": np.array([len(t) for t in row_toks],
                                  dtype=np.int32),
                "source": sources,
            })

    rng = spark.range(0, n_rows, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=TOKENIZED_SCHEMA)


def write_fixture(spark, path: str, n_rows: int,
                  vary_ts: bool = False,
                  partitions: int | None = None) -> None:
    """Materialize a generated table as parquet (exercises the real scan
    path: column pruning + predicate pushdown).  ``partitions`` controls
    the file count — a parquet file written this small is one row group,
    and a row group is the minimum scan-split unit, so benchmark fixtures
    need enough files to keep every task slot fed."""
    generate_tokenized(spark, n_rows, partitions=partitions,
                       vary_ts=vary_ts) \
        .write.mode("overwrite").parquet(path)
