"""Vector math as JVM-side column expressions.

Embedding similarity stays inside whole-stage codegen via
``zip_with`` / ``aggregate`` higher-order functions — no Python
crossing in the hot path. A vectorized pandas_udf twin
(:func:`cosine_pandas_udf`) exists for the UDF-surface contract and for
workloads where Arrow-batched NumPy beats codegen (very wide vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    """Squared L2 norm — precompute this per SIDE of a similarity join so
    only the dot product is evaluated per pair."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def norm(a: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; evaluation order matches DuckDB's
    list_cosine_similarity (dot / sqrt(n2a * n2b)) so rounded outputs
    agree bit-for-bit."""
    sq = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    sq_b = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    return dot(a, b) / F.sqrt(sq * sq_b)


def cosine_pandas_udf():
    """Arrow-batched cosine for (array<double>, array<double>) pairs.

    Returns a pandas_udf; used by the similarity operators when the
    vector dimension is large enough that NumPy's SIMD beats per-element
    codegen expressions.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.vstack(a.to_numpy())
        bv = np.vstack(b.to_numpy())
        num = np.einsum("ij,ij->i", av, bv)
        den = np.sqrt(np.einsum("ij,ij->i", av, av) * np.einsum("ij,ij->i", bv, bv))
        return pd.Series(num / den)

    return _cos
