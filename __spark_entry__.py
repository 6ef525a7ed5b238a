"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``cdc_example_spark``; this module only adapts
the registry to the driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_example_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q3: 3-way join + agg + top-k) on sf0.001."""
    from cdc_example_spark.queries.batch import q03

    return q03(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
