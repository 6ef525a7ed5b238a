"""S8 — incremental materialized aggregate (IVM) from the CDC stream.

Oracle: after every batch, the incrementally maintained
``username → (n_rows, sum_val)`` table must equal the groupBy
recompute over the base table's materialized snapshot — through
inserts, updates (group-preserving AND group-moving), deletes, and
resurrection. Plus the exactly-once contract: redelivered batches are
no-ops (delta application is not idempotent, so this is load-bearing,
unlike the base sink where replay merely converges).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.incremental_agg import IncrementalAggSink
from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
from tests.cdc_fixtures import envelope, row_image

T0 = "2025-10-26T23:21:07.598794Z"
T1 = "2025-10-26T23:22:11.000231Z"


@pytest.fixture()
def sinks(tmp_path):
    return (
        KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8),
        IncrementalAggSink(path=str(tmp_path / "agg")),
    )


def apply(spark, state, agg, records, batch_id):
    raw = spark.createDataFrame(records, "key STRING, value STRING")
    routed = route_changes(decode_envelope(raw))
    # contract: the agg folds against the PRE-merge snapshot
    agg.apply_changes(routed, state.snapshot(spark), batch_id=batch_id)
    state.apply_changes(routed, batch_id=batch_id)


def recompute(spark, state):
    return {
        r.group_key: (r.n_rows, r.sum_val)
        for r in state.snapshot(spark)
        .groupBy(F.col("username").alias("group_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce(F.length("message"), F.lit(0))).alias("sum_val"),
        )
        .collect()
    }


def incremental(spark, agg):
    return {
        r.group_key: (r.n_rows, r.sum_val) for r in agg.snapshot(spark).collect()
    }


def test_s8_incremental_agg_tracks_recompute(spark, sinks):
    state, agg = sinks
    a, b, c = (str(uuid.uuid4()) for _ in range(3))

    # batch 1: three inserts across two groups
    apply(spark, state, agg, [
        envelope("i", a, after=row_image(a, T0, T0, "hello", "alice")),
        envelope("i", b, after=row_image(b, T0, T0, "hi", "bob")),
        envelope("i", c, after=row_image(c, T0, T0, "yo", "alice")),
    ], batch_id=1)
    assert incremental(spark, agg) == recompute(spark, state)
    assert incremental(spark, agg)["alice"] == (2, 7)

    # batch 2: group-preserving update (longer message) + delete of bob
    apply(spark, state, agg, [
        envelope("u", a,
                 before=row_image(a, T0, T0, "hello", "alice"),
                 after=row_image(a, T0, T1, "hello again", "alice")),
        envelope("d", b, before=row_image(b, T0, T0, "hi", "bob"), after=None),
    ], batch_id=2)
    got = incremental(spark, agg)
    assert got == recompute(spark, state)
    assert "bob" not in got  # zero-count group dropped

    # batch 3: group-MOVING update (alice→carol) + resurrection of bob
    apply(spark, state, agg, [
        envelope("u", c,
                 before=row_image(c, T0, T0, "yo", "alice"),
                 after=row_image(c, T0, T1, "moved", "carol")),
        envelope("i", b, after=row_image(b, T1, T1, "back", "bob")),
    ], batch_id=3)
    assert incremental(spark, agg) == recompute(spark, state)


def test_s8_redelivery_is_noop(spark, sinks):
    state, agg = sinks
    a = str(uuid.uuid4())
    batch = [envelope("i", a, after=row_image(a, T0, T0, "once", "alice"))]
    apply(spark, state, agg, batch, batch_id=1)
    before = incremental(spark, agg)
    # crash-between-sinks redelivery: the agg already committed v_1, the
    # stream re-sends batch 1 → must not double-count
    raw = spark.createDataFrame(batch, "key STRING, value STRING")
    routed = route_changes(decode_envelope(raw))
    agg.apply_changes(routed, state.snapshot(spark), batch_id=1)
    assert incremental(spark, agg) == before == {"alice": (1, 4)}


def test_s8_crash_before_marker_flip_recomputes_cleanly(spark, sinks):
    state, agg = sinks
    a, b = str(uuid.uuid4()), str(uuid.uuid4())
    apply(spark, state, agg, [
        envelope("i", a, after=row_image(a, T0, T0, "first", "alice")),
    ], batch_id=1)

    # simulate: batch 2's version dir was written but the process died
    # BEFORE the marker flip — the marker still points at v_1
    batch2 = [envelope("i", b, after=row_image(b, T0, T0, "second", "bob"))]
    raw = spark.createDataFrame(batch2, "key STRING, value STRING")
    routed = route_changes(decode_envelope(raw))
    snap = state.snapshot(spark)
    agg.apply_changes(routed, snap, batch_id=2)
    with open(agg._marker_path() + ".tmp", "w") as f:
        f.write("1")
    import os
    os.replace(agg._marker_path() + ".tmp", agg._marker_path())  # roll back flip

    # redelivery of batch 2 recomputes v_2 from v_1 — applied once
    agg.apply_changes(routed, snap, batch_id=2)
    state.apply_changes(routed, batch_id=2)
    assert incremental(spark, agg) == recompute(spark, state)
    assert incremental(spark, agg) == {"alice": (1, 5), "bob": (1, 6)}


def test_s8_null_group_key_converges(spark, sinks):
    """NULL usernames form ONE group that the state⟗delta merge must
    keep matching across batches (eqNullSafe; ADVICE r2 — a null-unsafe
    join appended a duplicate NULL-keyed state row per touching batch)."""
    state, agg = sinks
    a, b, c = (str(uuid.uuid4()) for _ in range(3))

    apply(spark, state, agg, [
        envelope("i", a, after=row_image(a, T0, T0, "anon one", None)),
        envelope("i", b, after=row_image(b, T0, T0, "named", "alice")),
    ], batch_id=1)
    assert incremental(spark, agg) == recompute(spark, state)

    # second batch touches the NULL group again: must MERGE into the
    # existing NULL state row, not append a second one
    apply(spark, state, agg, [
        envelope("i", c, after=row_image(c, T0, T0, "anon two", None)),
    ], batch_id=2)
    got = incremental(spark, agg)
    assert got == recompute(spark, state)
    assert got[None] == (2, 16)
    null_rows = agg.snapshot(spark).filter(F.col("group_key").isNull()).count()
    assert null_rows == 1

    # update moving a row OUT of the NULL group, and a delete within it
    apply(spark, state, agg, [
        envelope("u", a,
                 before=row_image(a, T0, T0, "anon one", None),
                 after=row_image(a, T0, T1, "claimed", "carol")),
        envelope("d", c, before=row_image(c, T0, T0, "anon two", None), after=None),
    ], batch_id=3)
    got = incremental(spark, agg)
    assert got == recompute(spark, state)
    assert None not in got  # zero-count NULL group dropped like any other


def test_s8_late_attachment_bootstraps_from_base_snapshot(spark, tmp_path):
    """An agg sink attached AFTER the base table already holds history
    must bootstrap its first version from the pre-batch base snapshot
    (ADVICE r2 — it previously folded only future deltas and silently
    omitted every pre-attachment row)."""
    state = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)
    a, b, c = (str(uuid.uuid4()) for _ in range(3))

    # history the agg sink never saw: two batches straight to the base
    for bid, recs in [
        (1, [envelope("i", a, after=row_image(a, T0, T0, "hello", "alice")),
             envelope("i", b, after=row_image(b, T0, T0, "hi", "bob"))]),
        (2, [envelope("u", a,
                      before=row_image(a, T0, T0, "hello", "alice"),
                      after=row_image(a, T0, T1, "hello again", "alice"))]),
    ]:
        raw = spark.createDataFrame(recs, "key STRING, value STRING")
        state.apply_changes(route_changes(decode_envelope(raw)), batch_id=bid)

    # attach the agg sink at batch 3 — first apply must bootstrap, and
    # the batch's own delta (update of a pre-attachment row + insert)
    # must fold against that bootstrapped state
    agg = IncrementalAggSink(path=str(tmp_path / "agg"))
    apply(spark, state, agg, [
        envelope("u", b,
                 before=row_image(b, T0, T0, "hi", "bob"),
                 after=row_image(b, T0, T1, "hi there", "bob")),
        envelope("i", c, after=row_image(c, T1, T1, "new", "carol")),
    ], batch_id=3)
    assert incremental(spark, agg) == recompute(spark, state) == {
        "alice": (1, 11), "bob": (1, 8), "carol": (1, 3),
    }

    # and stays convergent on the next ordinary batch
    apply(spark, state, agg, [
        envelope("d", a, before=row_image(a, T0, T1, "hello again", "alice"), after=None),
    ], batch_id=4)
    assert incremental(spark, agg) == recompute(spark, state)


def test_s8_streaming_wiring_maintains_agg(spark, tmp_path):
    """End-to-end: file CDC source → materialize(agg_sinks=[...]) keeps
    the aggregate current through the real Structured Streaming path,
    including checkpoint resume (batch 1 must not re-fold)."""
    import json

    from cdc_example_spark.streaming.materialize import file_cdc_source, materialize

    src = tmp_path / "cdc-in"
    src.mkdir()
    state = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)
    agg = IncrementalAggSink(path=str(tmp_path / "agg"))
    ckpt = tmp_path / "ckpt"
    a, b = str(uuid.uuid4()), str(uuid.uuid4())

    def run():
        stream = file_cdc_source(spark, str(src), max_files_per_trigger=1)
        q = materialize(stream, state, str(ckpt), trigger_once=True, agg_sinks=[agg])
        q.awaitTermination(120)
        assert q.exception() is None

    def write(n, records):
        with open(src / f"batch-{n:04d}.json", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    write(1, [
        envelope("i", a, after=row_image(a, T0, T0, "hello", "alice"), lsn=100),
        envelope("i", b, after=row_image(b, T0, T0, "hi", "bob"), lsn=110),
    ])
    run()
    assert incremental(spark, agg) == recompute(spark, state) == {
        "alice": (1, 5), "bob": (1, 2),
    }

    write(2, [
        envelope("u", a, after=row_image(a, T0, T1, "hello again", "alice"), lsn=200),
        envelope("d", b, after=None, lsn=210),
    ])
    run()  # NEW query, same checkpoint: batch 1 not re-folded
    assert incremental(spark, agg) == recompute(spark, state) == {"alice": (1, 11)}
