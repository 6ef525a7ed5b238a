"""S13 — multi-table CDC routing: ONE stream, one checkpoint, one
foreachBatch pass fanning out per-topic slices into per-table
KeyedStateSinks (VERDICT r8 item 5). Debezium emits one topic per
table (reference setup-debezium.sh:22-27 topic.prefix semantics); the
reference's per-table invariants must hold independently per sink:
last-write-wins by LSN, delete-on-tombstone, no cross-table bleed, and
checkpoint resume without re-apply.
"""

from __future__ import annotations

import json
import os

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.streaming.materialize import (
    file_cdc_source,
    materialize_tables,
)
from tests.cdc_fixtures import envelope, row_image

_T0 = "2025-10-26T10:00:00.000000Z"
_T1 = "2025-10-26T10:05:00.000000Z"

TOPIC_A = "messages.public.messages"
TOPIC_B = "messages.public.audit_log"


def _write_batch(src, n, records_with_topics):
    p = src / f"batch-{n:04d}.json"
    with open(p, "w") as f:
        for topic, rec in records_with_topics:
            f.write(json.dumps({**rec, "topic": topic}) + "\n")
    # explicit mtime spacing: the file source orders same-mtime files
    # arbitrarily (the S12 flake)
    os.utime(p, (1_700_000_000 + n, 1_700_000_000 + n))


def _run(spark, src, sinks, ckpt, seen):
    q = materialize_tables(
        file_cdc_source(spark, str(src), with_topic=True),
        sinks,
        str(ckpt),
        on_batch=lambda topic, df, bid: seen.append((topic, bid)),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert q.exception() is None


def test_s13_one_stream_routes_two_tables(spark, tmp_path):
    src = tmp_path / "cdc-in"
    src.mkdir()
    sinks = {
        TOPIC_A: KeyedStateSink(path=str(tmp_path / "state_a"), num_buckets=8),
        TOPIC_B: KeyedStateSink(path=str(tmp_path / "state_b"), num_buckets=8),
    }
    ckpt = tmp_path / "ckpt"
    seen: list[tuple[str, int]] = []

    # batch 1: interleaved envelopes of BOTH tables; key "k1" exists in
    # both tables with different payloads — the bleed probe
    _write_batch(src, 1, [
        (TOPIC_A, envelope("i", "k1", after=row_image("k1", _T0, _T0, "a-v1", "alice"), lsn=100)),
        (TOPIC_B, envelope("i", "k1", after=row_image("k1", _T0, _T0, "b-v1", "bob"), lsn=101)),
        (TOPIC_A, envelope("i", "k2", after=row_image("k2", _T0, _T0, "a-only", "alice"), lsn=102)),
        (TOPIC_B, envelope("i", "k3", after=row_image("k3", _T0, _T0, "b-only", "bob"), lsn=103)),
    ])
    _run(spark, src, sinks, ckpt, seen)

    sa = {r["id"]: r.asDict() for r in sinks[TOPIC_A].snapshot(spark).collect()}
    sb = {r["id"]: r.asDict() for r in sinks[TOPIC_B].snapshot(spark).collect()}
    assert set(sa) == {"k1", "k2"} and sa["k1"]["message"] == "a-v1"
    assert set(sb) == {"k1", "k3"} and sb["k1"]["message"] == "b-v1"

    # batch 2 touches ONLY table A (update k1 preserving create_time,
    # delete k2): table B's sink must see zero work, not an empty merge
    _write_batch(src, 2, [
        (TOPIC_A, envelope("u", "k1", after=row_image("k1", _T0, _T1, "a-v2", "alice"), lsn=200)),
        (TOPIC_A, envelope("d", "k2", after=None, lsn=201)),
    ])
    seen2: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen2)
    assert {t for t, _ in seen2} == {TOPIC_A}  # B never fired

    sa = {r["id"]: r.asDict() for r in sinks[TOPIC_A].snapshot(spark).collect()}
    sb = {r["id"]: r.asDict() for r in sinks[TOPIC_B].snapshot(spark).collect()}
    assert set(sa) == {"k1"} and sa["k1"]["message"] == "a-v2"
    # create_time preserved through the update (reference invariant)
    assert sa["k1"]["create_time"] is not None
    assert str(sa["k1"]["create_time"]) != str(sa["k1"]["update_time"])
    assert set(sb) == {"k1", "k3"} and sb["k1"]["message"] == "b-v1"


def test_s13_checkpoint_resume_does_not_reapply(spark, tmp_path):
    src = tmp_path / "cdc-in"
    src.mkdir()
    sinks = {
        TOPIC_A: KeyedStateSink(path=str(tmp_path / "state_a"), num_buckets=8),
        TOPIC_B: KeyedStateSink(path=str(tmp_path / "state_b"), num_buckets=8),
    }
    ckpt = tmp_path / "ckpt"
    _write_batch(src, 1, [
        (TOPIC_A, envelope("i", "a1", after=row_image("a1", _T0, _T0, "a-v1", "u"), lsn=100)),
        (TOPIC_B, envelope("i", "b1", after=row_image("b1", _T0, _T0, "b-v1", "u"), lsn=101)),
    ])
    seen: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen)
    first = sorted(seen)

    # a NEW query on the same checkpoint with no new files: nothing
    # re-applies (offsets committed), both tables unchanged
    seen2: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen2)
    assert seen2 == []

    # and a redelivered batch id is a metadata no-op per sink: both
    # markers hold the shared batch id from the first run
    bids = {bid for _, bid in first}
    assert sinks[TOPIC_A].last_applied_batch_id() in bids
    assert sinks[TOPIC_B].last_applied_batch_id() in bids
    sa = {r["id"] for r in sinks[TOPIC_A].snapshot(spark).collect()}
    sb = {r["id"] for r in sinks[TOPIC_B].snapshot(spark).collect()}
    assert sa == {"a1"} and sb == {"b1"}


def test_s13_on_batch_skipped_for_already_committed_topic(spark, tmp_path):
    """ADVICE r9: on crash-redelivery (sink committed, streaming
    checkpoint didn't), the redelivered micro-batch is a marker no-op
    for the committed topic — and the side-effecting on_batch callback
    must be skipped for it too, not invoked a second time with the
    same (topic, batch_id)."""
    from cdc_example_spark.streaming.envelope import decode_envelope, route_changes

    src = tmp_path / "cdc-in"
    src.mkdir()
    sinks = {
        TOPIC_A: KeyedStateSink(path=str(tmp_path / "state_a"), num_buckets=8),
        TOPIC_B: KeyedStateSink(path=str(tmp_path / "state_b"), num_buckets=8),
    }
    ckpt = tmp_path / "ckpt"
    rec_a = envelope("i", "a1", after=row_image("a1", _T0, _T0, "a-v1", "u"), lsn=100)
    rec_b = envelope("i", "b1", after=row_image("b1", _T0, _T0, "b-v1", "u"), lsn=101)
    _write_batch(src, 1, [(TOPIC_A, rec_a), (TOPIC_B, rec_b)])

    # simulate the crash window: table A's sink already committed the
    # stream's first batch id (0) before the checkpoint could commit
    raw_a = spark.createDataFrame([rec_a], "key STRING, value STRING")
    assert sinks[TOPIC_A].apply_changes(route_changes(decode_envelope(raw_a)), 0)

    seen: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen)
    # the redelivered slice no-opped on A (marker) → callback skipped;
    # B merged normally → callback fired exactly once
    assert {t for t, _ in seen} == {TOPIC_B}
    sa = {r["id"] for r in sinks[TOPIC_A].snapshot(spark).collect()}
    assert sa == {"a1"}  # the pre-committed merge is intact


def test_s13_avro_decode_carries_topic_for_routing(spark):
    """The converter matrix completes: the Avro decoder passes the
    topic through its Arrow decode beside the binary columns, so
    materialize_tables(converter="avro") routes identically to the
    JSON path (same downstream code)."""
    from pyspark.sql import Row

    from cdc_example_spark.streaming import avro_envelope as A
    from cdc_example_spark.streaming.envelope import route_changes

    img = row_image("k-1", _T0, _T0, "hello", "ann")
    recs = []
    for topic, kid in ((TOPIC_A, "a1"), (TOPIC_B, "b1"), (TOPIC_A, "a2")):
        k, v = A.encode_change(kid, "c", None, dict(img, id=kid), 100, 200)
        recs.append(Row(key=k, value=v, topic=topic))
    df = spark.createDataFrame(recs, "key binary, value binary, topic string")
    routed = route_changes(A.decode_avro_envelope(df, topic_col="topic"))
    assert "topic" in routed.columns
    got = {
        (r["topic"], r["key_id"]): r["is_delete"] for r in routed.collect()
    }
    assert set(got) == {(TOPIC_A, "a1"), (TOPIC_B, "b1"), (TOPIC_A, "a2")}
    assert not any(got.values())
    # and without a topic column the decoder's shape is unchanged
    plain = A.decode_avro_envelope(df.drop("topic"))
    assert "topic" not in plain.columns
