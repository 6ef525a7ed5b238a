"""As-of (most-recent-match) join and changelog time travel.

Spark has no ASOF JOIN operator; the naive encoding — a range theta-join
plus per-left-row argmax — plans a BroadcastNestedLoopJoin and melts at
scale. This module implements the idiomatic distributed shapes instead:

- :func:`asof_join` — the union-merge encoding: tag both sides, union,
  one shuffle by key, one in-partition sort, carry the latest right
  payload forward with ``last(..., ignorenulls)``. No join node at all
  (pinned by tests/test_plan_audit.py); cost = shuffle(|L| + |R|) —
  the same shape a stream-stream temporal join's state store implies.
- :func:`snapshot_at` — point-in-time state of a changelog (the batch
  twin of the CDC sink's last-write-wins MERGE, reference
  ``MessageConsumer.kt:24-38`` semantics): one partial-aggregating
  ``max_by`` per key, so only one candidate struct per key per map
  task reaches the shuffle — NOT a window sort over every version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key (inclusive,
    like DuckDB's ``ASOF JOIN ... ON l.t >= r.t``); left rows with no
    prior right row keep NULL payloads (left-outer semantics).

    ``right``'s non-key, non-timestamp columns become the payload and
    must not collide with left column names (pre-alias them).
    ``tiebreak`` (a right column) makes equal-timestamp matches
    deterministic: the greatest tiebreak value wins.

    The payload travels inside ONE struct, so a NULL in a payload
    column never makes ``last(ignorenulls)`` skip past the true most
    recent match — the struct is non-null whenever a right row exists.
    """
    on = list(on)
    payload_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(1).alias("_side"),
    )
    merged = r.unionByName(l, allowMissingColumns=True)
    # right rows sort BEFORE the left row at the same timestamp
    # (inclusive match); among equal right timestamps the greatest
    # tiebreak sorts last and wins
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )


def snapshot_at(
    changelog: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    as_of: Column | str,
    tiebreak: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Materialize the state of a keyed changelog as of ``as_of``.

    Returns one row per key: the greatest-``(ts, tiebreak)`` version
    with ``ts ≤ as_of`` — the time-travel read every CDC consumer
    eventually wants, and exactly the fold the streaming sink applies
    incrementally (last-write-wins per key). If ``delete_col`` names a
    boolean column, keys whose winning version is a delete are absent
    from the snapshot (tombstone semantics).

    Scale shape: filter (pushed to the scan) + one ``max_by`` hash
    aggregate. Partial aggregation keeps a single candidate per key per
    map task; nothing sorts every historical version the way a
    row_number window would.
    """
    keys = list(keys)
    as_of_col = F.lit(as_of) if isinstance(as_of, str) else as_of
    payload_cols = [c for c in changelog.columns if c not in keys]
    ordering = F.struct(
        F.col(ts_col), *([F.col(tiebreak)] if tiebreak else [])
    )
    winner = (
        changelog.filter(F.col(ts_col) <= as_of_col.cast(changelog.schema[ts_col].dataType))
        .groupBy(*keys)
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ordering).alias("_v")
        )
    )
    out = winner.select(
        *keys, *[F.col(f"_v.{c}").alias(c) for c in payload_cols]
    )
    if delete_col is not None:
        out = out.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    return out
