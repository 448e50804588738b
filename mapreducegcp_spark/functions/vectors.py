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


def blas_pair_candidates(
    emb_df,
    threshold: float | None = None,
    margin: float = 1e-6,
) -> "DataFrame":
    """Distributed BLAS prefilter for exact all-pairs cosine operators.

    The exact O(n^2) fold evaluation is the correctness contract (it
    hash-matches DuckDB), but evaluating a 64-element interpreted fold
    per pair is ~100x the work of one matmul. This narrows the pair
    space first: broadcast the (n, dim) unit matrix (model-parameter
    sized — 0.5 GB at 1e6 vectors; beyond that the LSH/IVF operators
    are the path), then each Arrow batch computes approximate cosines
    for its rows against everything in one BLAS call and emits only

    - ``threshold`` mode: pairs (a < b) with approx >= threshold-margin
    - argmax mode (threshold=None): for each row, every partner within
      ``margin`` of that row's max — a superset of the exact argmax.

    numpy's pairwise-summed dot differs from the strict left fold by
    <1e-12 relative at dim 64, so with margin 1e-6 no qualifying pair
    can be lost; the caller re-scores candidates with the exact fold,
    which alone decides the output (values and ties).
    """
    import numpy as np

    spark = emb_df.sparkSession
    pdf = emb_df.select("vec_id", "embedding").toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], "vec_a long, vec_b long")
    ids_all = pdf["vec_id"].to_numpy().astype("int64")
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    bc = spark.sparkContext.broadcast((ids_all, M / nrm))

    def gen(batches):
        import pandas as pd

        ids_b, Mn = bc.value
        order = np.argsort(ids_b)
        for pdf_ in batches:
            if len(pdf_) == 0:
                continue
            ids = pdf_["vec_id"].to_numpy().astype("int64")
            E = np.vstack(pdf_["embedding"].to_numpy()).astype(np.float64)
            n = np.linalg.norm(E, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (E / n) @ Mn.T  # (batch, n_all)
            rows_a, rows_b = [], []
            if threshold is not None:
                hit_r, hit_c = np.nonzero(
                    (sims >= threshold - margin) & (ids[:, None] < ids_b[None, :])
                )
                rows_a, rows_b = ids[hit_r], ids_b[hit_c]
            else:
                self_col = order[np.searchsorted(ids_b, ids, sorter=order)]
                sims[np.arange(len(ids)), self_col] = -np.inf
                mx = sims.max(axis=1, keepdims=True)
                hit_r, hit_c = np.nonzero(sims >= mx - margin)
                rows_a, rows_b = ids[hit_r], ids_b[hit_c]
            yield pd.DataFrame({"vec_a": rows_a, "vec_b": rows_b})

    return emb_df.select("vec_id", "embedding").mapInPandas(
        gen, "vec_a long, vec_b long"
    )
