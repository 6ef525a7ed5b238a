"""State-store-backed CDC materialization via applyInPandasWithState.

The bucket-sink path (operators/keyed_state.py) materializes to a
table on storage — the right shape when the view must outlive the query
and be readable by other engines. This module is the OTHER canonical
Spark shape: keep the latest row image per key in the streaming state
store (RocksDB per session.py) and emit the view's CHANGES downstream —
an update-mode changelog like the reference's WebSocket fan-out
(MessageWebSocketHandler.kt:35-54), where every listener sees each
upsert/delete as it lands.

Semantics are identical to KeyedStateSink.apply_changes (cited there):
last-write-wins by (lsn, ts_ms) — never arrival order — delete on
tombstone, resurrection allowed. The per-key state is one row image +
its lsn, so state size is O(live keys), partitioned by Spark across
executors and spill-safe under RocksDB.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: per-key state: latest applied (lsn, ts_ms) + the row image (None if deleted)
_STATE_SCHEMA = StructType(
    [
        StructField("lsn", LongType()),
        StructField("ts_ms", LongType()),
        StructField("exists", BooleanType()),
        StructField("id", StringType()),
        StructField("create_time", TimestampType()),
        StructField("update_time", TimestampType()),
        StructField("message", StringType()),
        StructField("username", StringType()),
    ]
)

#: emitted changelog row (update-mode): the post-apply image per touched key
OUTPUT_SCHEMA = StructType(
    [
        StructField("key_id", StringType()),
        StructField("is_delete", BooleanType()),
        StructField("id", StringType()),
        StructField("create_time", TimestampType()),
        StructField("update_time", TimestampType()),
        StructField("message", StringType()),
        StructField("username", StringType()),
        StructField("lsn", LongType()),
    ]
)


def _apply_key(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's changes for one key into the stored image."""
    (key_id,) = key
    if state.exists:
        cur = list(state.get)
    else:
        cur = [-1, -1, False, None, None, None, None, None]

    for pdf in pdfs:
        # Normalize NULL lsn/ts_ms to -1 BEFORE ordering/comparing: in
        # pandas a NULL long arrives as NaN, which (a) makes the
        # stale-skip tuple compare always-False, (b) sorts LAST in
        # sort_values (null would win), and (c) would be stored into a
        # LongType state field. -1 makes nulls lose, matching
        # keyed_state.py's desc_nulls_last order and the initial state
        # sentinel.
        pdf = pdf.copy()
        pdf[["lsn", "ts_ms"]] = pdf[["lsn", "ts_ms"]].fillna(-1).astype("int64")
        # authoritative order: (lsn, ts_ms) — the batch may arrive shuffled
        pdf = pdf.sort_values(["lsn", "ts_ms"])
        for row in pdf.itertuples(index=False):
            if (row.lsn, row.ts_ms) <= (cur[0], cur[1]):
                continue  # stale replay (at-least-once delivery) — idempotent skip
            if row.is_delete:
                cur = [row.lsn, row.ts_ms, False, None, None, None, None, None]
            else:
                a = row.after
                cur = [
                    row.lsn,
                    row.ts_ms,
                    True,
                    a["id"],
                    a["create_time"],
                    a["update_time"],
                    a["message"],
                    a["username"],
                ]
    state.update(tuple(cur))
    yield pd.DataFrame(
        [
            {
                "key_id": key_id,
                "is_delete": not cur[2],
                "id": cur[3],
                "create_time": cur[4],
                "update_time": cur[5],
                "message": cur[6],
                "username": cur[7],
                "lsn": cur[0],
            }
        ]
    )


def materialize_with_state(routed: DataFrame) -> DataFrame:
    """Routed changes (envelope.route_changes output) → per-key changelog.

    Downstream: ``.writeStream.outputMode("update")`` into memory/console
    or ``foreachBatch`` fan-out. The live view at any moment is the last
    changelog row per key with ``is_delete = false``.
    """
    return routed.groupBy("key_id").applyInPandasWithState(
        _apply_key,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming funnel (S10): the per-user strict-order funnel q71 computes
# in batch, maintained incrementally in the state store. State is three
# event-time micros (earliest signup, earliest qualifying click,
# earliest qualifying purchase; −1 = not reached); each micro-batch
# folds its events in EVENT-TIME order and emits the user's updated
# stage. Contract (stated, like every funnel stream in production): the
# source must deliver each user's events in non-decreasing event-time
# across batches — the state machine is monotone, so an out-of-order
# earlier click cannot retroactively replace a later one the way the
# batch fold's full sort would. In-order replay ⇒ byte-identical to
# q71's F.aggregate fold (pinned by test_s10).
# ---------------------------------------------------------------------------

FUNNEL_STATE = StructType(
    [
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
    ]
)

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
        StructField("stage", LongType()),
    ]
)


def _funnel_key(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    cur = list(state.get) if state.exists else [-1, -1, -1]
    for pdf in pdfs:
        for row in pdf.sort_values("t").itertuples(index=False):
            if row.c == 0 and cur[0] < 0:
                cur[0] = row.t
            elif row.c == 1 and cur[1] < 0 and cur[0] >= 0 and row.t > cur[0]:
                cur[1] = row.t
            elif row.c == 2 and cur[2] < 0 and cur[1] >= 0 and row.t > cur[1]:
                cur[2] = row.t
    state.update(tuple(cur))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "t1": cur[0],
                "t2": cur[1],
                "t3": cur[2],
                "stage": sum(1 for t in cur if t >= 0),
            }
        ]
    )


def funnel_with_state(events: DataFrame) -> DataFrame:
    """Streaming twin of q71's funnel fold over (user_id, ts, event_type).

    Input: a streaming frame with those three columns. Output
    (update mode): one row per touched user per micro-batch with the
    funnel timestamps reached so far and ``stage`` ∈ 0..3.
    """
    from pyspark.sql import functions as F

    code = (
        F.when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "purchase", 2)
    )
    coded = events.select(
        "user_id", F.unix_micros("ts").alias("t"), code.alias("c")
    ).filter(F.col("c").isNotNull())
    return coded.groupBy("user_id").applyInPandasWithState(
        _funnel_key,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
