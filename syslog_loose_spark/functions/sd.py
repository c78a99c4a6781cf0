"""Structured-data helper column functions."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def strip_sd_escapes_col(value: Column) -> Column:
    """The params() escape-stripping view (structured_data.rs:84-114) as a
    pure JVM expression: tokenize into (escape-pair | single char) — the
    left-to-right pair-greedy regex scan is exactly the reference's
    stateful loop — then map the four special pairs ``\\"  \\]  \\\\  \\n``
    and keep every other token verbatim.

    Note: a *parsed* SD value can never end in an unpaired backslash
    (param_value only admits escape pairs, structured_data.rs:117-129), so
    the reference's drop-trailing-backslash quirk is unreachable here.
    """
    tokens = F.regexp_extract_all(value, F.lit(r"(?s)(\\.|.)"), 1)
    bs = "\\"
    return F.array_join(
        F.transform(
            tokens,
            lambda t: (
                F.when(t == F.lit(bs + '"'), F.lit('"'))
                .when(t == F.lit(bs + "]"), F.lit("]"))
                .when(t == F.lit(bs + bs), F.lit(bs))
                .when(t == F.lit(bs + "n"), F.lit("\n"))
                .otherwise(t)
            ),
        ),
        "",
    )
