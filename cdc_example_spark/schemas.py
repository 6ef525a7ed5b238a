"""Explicit schema literals for every table and stream the engine touches.

The reference declares every schema up front (Flyway migration
``V1__init.sql``, Kotlin DTOs in ``MessageConsumer.kt:54-70``) and never
infers; we follow suit — schema inference is forbidden on streaming input.

Analytics-table schemas match the driver parquet under /root/testdata/sf*
(verified against the files; see FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# CDC data model (reference V1__init.sql:1-9, Message.kt:9-22)
# ---------------------------------------------------------------------------

#: The reference's one base table. UUID → canonical string; TIMESTAMPTZ →
#: TimestampType (UTC session). Reference: V1__init.sql:1-7.
MESSAGES = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("create_time", TimestampType(), nullable=False),
        StructField("update_time", TimestampType(), nullable=False),
        StructField("message", StringType(), nullable=False),
        StructField("username", StringType(), nullable=False),
    ]
)

#: Row image inside the Debezium envelope. Timestamps arrive as ISO-8601
#: strings (reference prototype/message.md:17,22) and are cast after
#: from_json.
_ROW_IMAGE = StructType(
    [
        StructField("id", StringType()),
        StructField("create_time", StringType()),
        StructField("update_time", StringType()),
        StructField("message", StringType()),
        StructField("username", StringType()),
    ]
)

#: Debezium source-lineage block (reference prototype/message.md:26-41).
_SOURCE = StructType(
    [
        StructField("version", StringType()),
        StructField("connector", StringType()),
        StructField("name", StringType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),
        StructField("db", StringType()),
        StructField("sequence", StringType()),
        StructField("ts_us", LongType()),
        StructField("ts_ns", LongType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("txId", LongType()),
        StructField("lsn", LongType()),
        StructField("xmin", LongType()),
    ]
)

#: Full Debezium change-event value (reference prototype/message.md:12-48).
#: ``before`` null on insert, ``after`` null on delete, op ∈ {i,u,d}.
CDC_ENVELOPE = StructType(
    [
        StructField("before", _ROW_IMAGE),
        StructField("after", _ROW_IMAGE),
        StructField("source", _SOURCE),
        StructField("transaction", StringType()),
        StructField("op", StringType()),
        StructField("ts", StringType()),
        StructField("ts_ms", LongType()),
        StructField("ts_us", LongType()),
        StructField("ts_ns", LongType()),
    ]
)

#: Kafka key: JSON ``{"id": "<uuid>"}`` (reference prototype/message.md:7-9).
CDC_KEY = StructType([StructField("id", StringType())])

# ---------------------------------------------------------------------------
# Analytics tables (driver testdata; FIXTURES.md §B)
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

#: ``ts`` is nanosecond-precision on disk; the loader reads it as int64
#: nanos (spark.sql.legacy.parquet.nanosAsLong) and converts to Spark's
#: microsecond TimestampType.
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

#: All driver tables, in dependency-ish order.
ANALYTICS_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
