"""Batch parquet catalog over the driver testdata directories.

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning — the 100 TB deployment
swaps the path for a date-partitioned lake location and everything else
holds.

The one normalization: ``events.ts`` is nanosecond-precision parquet,
which Spark's reader only accepts as raw int64 when
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by session.get_spark).
We convert nanos → microsecond TimestampType at scan time (Spark's max
precision; FIXTURES.md §B8 mandates the cast). The conversion is a
column expression, so pushdown on the other columns is unaffected.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-session plan cache: re-listing the directory and re-reading parquet
#: footers for every query adds driver latency that matters when the same
#: table feeds dozens of queries. Keyed weakly so a stopped session frees it.
_plan_cache: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table from ``{sf_dir}/{name}.parquet``.

    Works on any caller-provided SparkSession (the correctness driver
    builds its own): the two configs the engine's semantics depend on
    are runtime-settable SQL confs, so pin them here, not only in
    session.get_spark.
    """
    cache = _plan_cache.setdefault(spark, {})
    key = (os.path.normpath(sf_dir), name)
    if key in cache:
        return cache[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos → microsecond timestamp (floor division keeps
        # ordering; sub-microsecond precision is unrepresentable in Spark).
        # `div` = integer division: epoch-ns values (~1.7e18) overflow the
        # 53-bit mantissa of a double, so `/ 1000` would corrupt them.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every driver table as a temp view (for spark.sql queries)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
