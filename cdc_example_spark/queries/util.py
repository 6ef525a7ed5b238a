"""Shared output-discipline helpers for the declared queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column) -> Column:
    """Float output discipline: quantize at DECIMAL(28,10), round to 2,
    emit DECIMAL(18,2).

    Spark's and DuckDB's float aggregates can differ by 1 ulp (e.g. avg
    = sum/count lands a hair above/below an .xx5 boundary), which flips
    ROUND(x, 2) between engines. Rounding first at digit 10 absorbs the
    ulp noise — both engines land on the same 10-digit decimal — and the
    final DECIMAL(18,2) makes the textual value exact for the driver's
    hash. Oracle SQL mirrors this as
    CAST(ROUND(CAST(x AS DECIMAL(28,10)), 2) AS DECIMAL(18,2)).
    """
    return F.round(col.cast("decimal(28,10)"), 2).cast("decimal(18,2)")


def day_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (matches DuckDB strftime '%Y-%m-%d')."""
    return F.date_format(col, "yyyy-MM-dd")


def hour_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:00:00' string for hourly buckets."""
    return F.date_format(F.date_trunc("hour", col), "yyyy-MM-dd HH:mm:ss")
