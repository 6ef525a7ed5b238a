"""S14 — heterogeneous multi-table CDC routing (VERDICT r9 item 3).

S13 routed topics but decoded every topic through the single messages
envelope, so a second table could only ride the stream if it shared the
messages row shape. A real deployment's second table has DIFFERENT
columns — Debezium emits a distinct ``after`` schema per topic. These
tests pin the S14 contract: two tables with different column sets
routed through ONE stream and ONE checkpoint, each slice decoded with
its own derived envelope (JSON via ``cdc_envelope_for``, Avro via
``avro_row_schema``), with the per-table invariants (LWW by LSN,
delete-on-tombstone, no cross-table bleed) and checkpoint resume
holding independently per sink.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.schemas import MESSAGES
from cdc_example_spark.streaming.materialize import (
    file_cdc_source,
    materialize_tables,
)
from tests.cdc_fixtures import envelope, row_image

_T0 = "2025-10-26T10:00:00.000000Z"
_T1 = "2025-10-26T10:05:00.000000Z"

TOPIC_MSG = "app.public.messages"
TOPIC_AUD = "app.public.audit_log"

#: the second table: a DIFFERENT column set (long + timestamp + strings)
AUDIT = StructType(
    [
        StructField("id", StringType()),
        StructField("actor", StringType()),
        StructField("action", StringType()),
        StructField("severity", LongType()),
        StructField("created", TimestampType()),
    ]
)


def audit_image(id_: str, actor: str, action: str, severity: int, created: str) -> dict:
    return {
        "id": id_,
        "actor": actor,
        "action": action,
        "severity": severity,
        "created": created,
    }


def _write_batch(src, n, records_with_topics):
    p = src / f"batch-{n:04d}.json"
    with open(p, "w") as f:
        for topic, rec in records_with_topics:
            f.write(json.dumps({**rec, "topic": topic}) + "\n")
    # explicit mtime spacing (the S12 flake): same-mtime files order
    # arbitrarily in the file source
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


def _sinks(tmp_path):
    return {
        TOPIC_MSG: KeyedStateSink(path=str(tmp_path / "state_msg"), num_buckets=8),
        TOPIC_AUD: KeyedStateSink(
            path=str(tmp_path / "state_aud"), num_buckets=8, schema=AUDIT
        ),
    }


def test_s14_heterogeneous_tables_one_stream(spark, tmp_path):
    src = tmp_path / "cdc-in"
    src.mkdir()
    sinks = _sinks(tmp_path)
    ckpt = tmp_path / "ckpt"
    seen: list[tuple[str, int]] = []

    # batch 1: interleaved envelopes of both tables; the audit rows
    # carry columns the messages envelope does not know about
    _write_batch(src, 1, [
        (TOPIC_MSG, envelope("i", "k1", after=row_image("k1", _T0, _T0, "hello", "alice"), lsn=100)),
        (TOPIC_AUD, envelope("i", "a1", after=audit_image("a1", "alice", "login", 3, _T0), lsn=101)),
        (TOPIC_AUD, envelope("i", "a2", after=audit_image("a2", "bob", "delete", 9, _T0), lsn=102)),
    ])
    _run(spark, src, sinks, ckpt, seen)

    sm = {r["id"]: r.asDict() for r in sinks[TOPIC_MSG].snapshot(spark).collect()}
    sa = {r["id"]: r.asDict() for r in sinks[TOPIC_AUD].snapshot(spark).collect()}
    # per-table columns materialized with their own schema — no bleed
    assert set(sm) == {"k1"} and sm["k1"]["message"] == "hello"
    assert sorted(sm["k1"]) == sorted(f.name for f in MESSAGES.fields)
    assert set(sa) == {"a1", "a2"}
    assert sorted(sa["a1"]) == sorted(f.name for f in AUDIT.fields)
    assert sa["a1"]["actor"] == "alice" and sa["a1"]["severity"] == 3
    assert sa["a2"]["action"] == "delete" and sa["a2"]["severity"] == 9
    # the timestamp column decoded as a real timestamp, not a string
    assert sa["a1"]["created"] is not None
    assert not isinstance(sa["a1"]["created"], str)

    # batch 2: audit-table LWW by LSN (two updates of a1, the higher
    # LSN listed FIRST — arrival order must not win) + tombstone of a2;
    # messages-table update preserving create_time
    _write_batch(src, 2, [
        (TOPIC_AUD, envelope("u", "a1", after=audit_image("a1", "alice", "logout", 5, _T0), lsn=202)),
        (TOPIC_AUD, envelope("u", "a1", after=audit_image("a1", "alice", "retry", 4, _T0), lsn=201)),
        (TOPIC_AUD, envelope("d", "a2", after=None, lsn=203)),
        (TOPIC_MSG, envelope("u", "k1", after=row_image("k1", _T0, _T1, "hello v2", "alice"), lsn=204)),
    ])
    seen2: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen2)
    assert {t for t, _ in seen2} == {TOPIC_MSG, TOPIC_AUD}

    sm = {r["id"]: r.asDict() for r in sinks[TOPIC_MSG].snapshot(spark).collect()}
    sa = {r["id"]: r.asDict() for r in sinks[TOPIC_AUD].snapshot(spark).collect()}
    assert set(sa) == {"a1"}, "tombstone must delete a2"
    assert sa["a1"]["action"] == "logout" and sa["a1"]["severity"] == 5, (
        "LSN order, not arrival order, decides the winner"
    )
    assert sm["k1"]["message"] == "hello v2"
    # create_time preserved through the update (carried in the image)
    assert str(sm["k1"]["create_time"]) != str(sm["k1"]["update_time"])


def test_s14_checkpoint_resume_no_reapply(spark, tmp_path):
    src = tmp_path / "cdc-in"
    src.mkdir()
    sinks = _sinks(tmp_path)
    ckpt = tmp_path / "ckpt"
    _write_batch(src, 1, [
        (TOPIC_MSG, envelope("i", "k1", after=row_image("k1", _T0, _T0, "m", "u"), lsn=100)),
        (TOPIC_AUD, envelope("i", "a1", after=audit_image("a1", "u", "login", 1, _T0), lsn=101)),
    ])
    seen: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen)
    assert {t for t, _ in seen} == {TOPIC_MSG, TOPIC_AUD}

    # new query, same checkpoint, no new files: nothing re-applies
    seen2: list[tuple[str, int]] = []
    _run(spark, src, sinks, ckpt, seen2)
    assert seen2 == []
    assert {r["id"] for r in sinks[TOPIC_AUD].snapshot(spark).collect()} == {"a1"}

    # restart-shaped: fresh sink OBJECTS over the same state paths
    # resolve the persisted schema-agnostic layout and serve it
    fresh = _sinks(tmp_path)
    assert {r["id"] for r in fresh[TOPIC_AUD].snapshot(spark).collect()} == {"a1"}


def test_s14_avro_per_topic_writer_schemas(spark, tmp_path):
    """The Avro variant: each topic's changes encoded with its OWN
    writer schema (distinct registry ids served by the stub registry),
    decoded per-slice via the derived ``avro_row_schema`` — one stream,
    heterogeneous columns, registry resolution exercised."""
    from pyspark.sql import Row

    from cdc_example_spark.streaming import avro_envelope as A
    from cdc_example_spark.streaming.envelope import route_changes
    from cdc_example_spark.streaming.schema_registry import tree_to_avro_json
    from tests.test_schema_registry import StubRegistry

    aud_row = A.avro_row_schema(AUDIT)
    reg = StubRegistry({
        1: tree_to_avro_json(A.KEY_SCHEMA),
        2: tree_to_avro_json(A.VALUE_SCHEMA),
        11: tree_to_avro_json(A.key_schema_for("id")),
        12: tree_to_avro_json(A.value_schema_for(aud_row)),
    })
    try:
        recs = []
        k, v = A.encode_change(
            "k1", "c", None,
            dict(row_image("k1", _T0, _T0, "hello", "ann"), id="k1"),
            100, 200,
        )
        recs.append(Row(key=k, value=v, topic=TOPIC_MSG))
        for kid, sev, lsn in (("a1", 3, 101), ("a2", 9, 102)):
            k, v = A.encode_change(
                kid, "c", None, audit_image(kid, "bob", "login", sev, _T0),
                lsn, 200,
                key_schema_id=11, value_schema_id=12,
                row_schema=aud_row,
            )
            recs.append(Row(key=k, value=v, topic=TOPIC_AUD))
        raw = spark.createDataFrame(recs, "key binary, value binary, topic string")

        sinks = _sinks(tmp_path)
        for topic, sink in sinks.items():
            slice_raw = raw.filter(raw["topic"] == topic).drop("topic")
            decoded = A.decode_avro_envelope(
                slice_raw,
                registry_url=reg.url,
                table_schema=sink.schema,
                key_field=sink.key,
            )
            assert sink.apply_changes(route_changes(decoded), batch_id=1)
        sm = {r["id"]: r.asDict() for r in sinks[TOPIC_MSG].snapshot(spark).collect()}
        sa = {r["id"]: r.asDict() for r in sinks[TOPIC_AUD].snapshot(spark).collect()}
        assert set(sm) == {"k1"} and sm["k1"]["message"] == "hello"
        assert set(sa) == {"a1", "a2"} and sa["a2"]["severity"] == 9
        assert sorted(sa["a1"]) == sorted(f.name for f in AUDIT.fields)
        # the audit frames resolved their OWN writer schema ids
        assert 12 in reg.hits and 2 in reg.hits
    finally:
        reg.close()


def test_s14_sink_rejects_key_outside_schema(tmp_path):
    with pytest.raises(ValueError, match="not a column"):
        KeyedStateSink(path=str(tmp_path / "s"), key="nope", schema=AUDIT)
