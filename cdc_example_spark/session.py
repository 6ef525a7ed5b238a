"""SparkSession factory.

Pins the session to the engine's determinism + performance contract:

- ``spark.sql.session.timeZone=UTC``: the reference stores TIMESTAMPTZ and
  serves Instants (reference ``V1__init.sql:3-4``, ``Message.kt:15-17``);
  Spark's TimestampType is UTC-normalized only if the session TZ is pinned.
- AQE on: runtime coalescing / skew-join handling at scale.
- Arrow on: every pandas_udf / applyInPandas crossing is Arrow-batched.
- ``parquet.nanosAsLong``: the driver's ``events`` table carries
  nanosecond timestamps which Spark's vectorized parquet reader rejects;
  we read them as raw int64 nanos and convert in the loader
  (see sources/catalog.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdc_example_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row batches for Arrow transfer and the columnar cache:
        # analytics results/tables are narrow, so bigger batches cut
        # per-batch overhead without memory risk (default is 10k).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # 128MB input splits: right-sized map tasks at 100TB; harmless locally.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    )
    if master is None and "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    elif master is not None:
        builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
