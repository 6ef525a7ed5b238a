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


def small_result_order(df, *cols):
    """Total-order a KNOWN-SMALL final result: one partition, one
    in-partition sort.

    A global ``orderBy`` plans a range exchange, which costs a separate
    range-boundary SAMPLING job plus a multi-partition shuffle + fetch
    — measured ~60-80 ms of the per-query floor at sf0.1 for results
    of a few hundred rows. When the result cardinality is bounded by
    DIMENSIONS (groups over region/nation/lang/band, pivots, explicit
    top-k) rather than by fact cardinality, a single output partition
    is the right plan at ANY scale — the result is small at 100 TB too,
    and the single-partition sort doubles as the total-order guarantee
    the determinism contract needs. Unbounded outputs (per-customer,
    per-doc rows) must keep global orderBy; queries ending in
    orderBy().limit() already plan as TakeOrderedAndProject and should
    stay as written.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)


def shuffled_order(df, *cols):
    """Global ``orderBy`` for an UNBOUNDED result whose last pre-sort
    stage is expensive — with the sort's range-boundary sampling made
    cheap (r14, guide §2.4/§7.2).

    A bare ``orderBy`` plans a range exchange whose boundary-sampling
    job executes the ENTIRE child plan once, and the range-map stage
    then re-executes the child's final narrow stage to write the
    shuffle — upstream shuffle-map stages are reused, but everything
    since the last exchange (a sort-merge join + banded Levenshtein DP,
    an in-bucket pair explosion) runs TWICE per submission. Measured at
    sf0.1 (interleaved, 5-sample medians): q82 1.49 → 0.83 s, q113
    2.83 → 2.21 s, byte-identical output.

    Hash-repartitioning on the leading sort key first pins the
    expensive stage's output as shuffle files: the sampling job and the
    range-map stage both re-READ those files instead of recomputing the
    stage. The extra exchange carries only the RESULT rows (pair
    tables, component stats — output-sized, never corpus-sized), uses
    the session shuffle width, and AQE coalesces it at cluster scale;
    the global sort itself is unchanged, so the total order — and the
    driver's row hash — is identical.
    """
    return df.repartition(*[F.col(c) if isinstance(c, str) else c for c in cols[:1]]).orderBy(*cols)


def day_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (matches DuckDB strftime '%Y-%m-%d')."""
    return F.date_format(col, "yyyy-MM-dd")


def hour_str(col: Column) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:00:00' string for hourly buckets."""
    return F.date_format(F.date_trunc("hour", col), "yyyy-MM-dd HH:mm:ss")
