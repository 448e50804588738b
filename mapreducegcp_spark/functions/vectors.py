"""Vector column functions over array<float>/array<double> embeddings.

All arithmetic is expressed with Spark's higher-order array functions
(``zip_with`` / ``aggregate``) so it runs JVM-side inside codegen, with
a strict left-fold in double precision. The left fold matters: it makes
the result bit-identical to a DuckDB ``list_reduce`` oracle over the
same parquet floats, so similarity queries can be value-hash checked
exactly rather than with tolerances.

The reference has no vector support at all; this is part of the
LLM-pipeline extension surface (north star, SURVEY.md §7 phase 3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


# DuckDB oracle fragments, kept in lockstep with the fold order above.
DOT_ORACLE_EXPR = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
)
NORM_ORACLE_EXPR = (
    "sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)
