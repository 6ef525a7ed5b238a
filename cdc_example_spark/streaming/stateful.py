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


# ---------------------------------------------------------------------------
# Streaming sessionization with EVENT-TIME TIMEOUT (S12): the
# GroupStateTimeout surface the other two stateful operators don't
# exercise. session_window (S6) gives declarative sessions; this is the
# imperative twin a pipeline reaches for when sessions need custom
# close logic — and the only way a session can EMIT on silence (no
# further events for the user) is the state-store timeout: the state
# registers last_event + gap as its timeout timestamp, and when the
# WATERMARK passes it, Spark invokes the function with hasTimedOut for
# exactly that key, with no new rows. Sessions whose closing gap is
# visible inside the data (a later event > gap away) close inline
# without waiting. In-order source contract, like S10.
# ---------------------------------------------------------------------------

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_key_fn(gap_us: int):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "start_us": start, "end_us": last, "n_events": n}]
            )
            return
        ts = sorted(
            int(t)
            for pdf in pdfs
            for t in pdf["t"].to_numpy()
        )
        cur = list(state.get) if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        state.update(tuple(cur))
        # timeout at last + gap; the API requires a value beyond the
        # current watermark, so clamp forward when the key is already
        # behind it (emission slips to the clamp, session bounds don't).
        timeout_ms = max(
            cur[1] // 1000 + gap_us // 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "start_us": c[0],
                        "end_us": c[1],
                        "n_events": c[2],
                    }
                    for c in closed
                ]
            )

    return fn


def sessionize_with_state(
    events: DataFrame,
    gap: str = "30 minutes",
    gap_us: int = 30 * 60 * 1_000_000,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-user sessions over (user_id, ts) with silence-triggered close.

    Output (append mode): one row per CLOSED session. A session closes
    either inline (a later event arrives > gap after the previous) or
    via the event-time timeout when the watermark passes last + gap —
    the mechanism that lets the pipeline flush sessions for users who
    simply stopped, which no data-driven operator can do.
    """
    from pyspark.sql import functions as F

    coded = events.withWatermark("ts", watermark_delay).select(
        "user_id", F.unix_micros("ts").alias("t"), F.col("ts")
    )
    return coded.groupBy("user_id").applyInPandasWithState(
        _session_key_fn(gap_us),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
