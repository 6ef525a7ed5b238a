"""Shared output-discipline helpers for the declared queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column) -> Column:
    """Float output discipline: quantize at DECIMAL(28,10), round to 2,
    emit DOUBLE.

    Spark's and DuckDB's float aggregates can differ by 1 ulp (e.g. avg
    = sum/count lands a hair above/below an .xx5 boundary), which flips
    ROUND(x, 2) between engines. Rounding first at digit 10 absorbs the
    ulp noise — both engines land on the same 10-digit decimal — and the
    final 2-digit decimal converts to the one nearest double on either
    engine, so the fetched value is bit-identical. (Emitting DECIMAL
    itself is NOT hash-safe: the engines' fetch paths stringify
    trailing-zero cents differently — '248095.00' vs '248095.0' — and
    that representational skew is what the driver hashes.) Oracle SQL
    mirrors this as CAST(ROUND(CAST(x AS DECIMAL(28,10)), 2) AS DOUBLE).
    """
    return F.round(col.cast("decimal(28,10)"), 2).cast("double")


def day_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (matches DuckDB strftime '%Y-%m-%d')."""
    return F.date_format(col, "yyyy-MM-dd")


def hour_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:00:00' string for hourly buckets."""
    return F.date_format(F.date_trunc("hour", col), "yyyy-MM-dd HH:mm:ss")
