"""Bucketed lake writes — pre-shuffled tables for co-located joins.

At 100 TB the biggest recurring cost is re-shuffling the same fact
tables on the same keys for every join. Bucketing moves that shuffle
to WRITE time, once: a table written with ``bucketBy(N, key)`` is
physically pre-partitioned by ``hash(key) % N``, and a join between
two tables bucketed the same way on the join key needs ZERO exchanges
— each task reads matching bucket files from both sides
(tests/test_lake_bucketing.py pins the exchange-free plan).

``sortBy`` within buckets additionally removes the per-task sort of a
sort-merge join (files are read back in sorted order when
``spark.sql.sources.bucketing.enabled`` and the sort columns match).

Spark's bucketing metadata lives in the session catalog, so writes go
through ``saveAsTable`` with an explicit ``path`` — the parquet files
are ordinary files at ``path``; only the bucket spec needs the
catalog. On a real deployment the catalog is Hive/Glue/Unity and the
path is the lake; semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally in-bucket-sorted)
    parquet table registered as ``table`` with files at ``path``."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    ``spark.read.parquet(path)`` would see only files and lose the
    co-location guarantee)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Write ``df`` as a directory-partitioned parquet dataset
    (``path/partition_col=value/...``) — the lake layout that turns
    partition-key predicates into directory pruning: a filter on the
    partition column never opens non-matching files at all
    (PartitionFilters in the scan node, distinct from parquet
    row-group PushedFilters). At 100 TB the partition column is the
    ingest date; every time-bounded query then scans only its days."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
