"""Kafka CDC decode contract pinned to the reference's captured wire bytes.

The reference documents one real captured Debezium record
(prototype/message.md:1-49): topic ``messages.public.messages``, a JSON
key, and a JSON value for an update op. These tests push that exact
sample (comments stripped — the capture is annotated JSON5; every field
value byte-identical) through ``decode_envelope``/``route_changes`` and
assert the decoded row field-for-field, so the only Kafka piece left
untested by the suite is the broker socket itself (VERDICT r2 item 3).

Notes pinned here because they differ from the synthetic fixtures:
- the captured row images have NO ``update_time`` field — the declared
  schema must decode them anyway (missing struct field → NULL), since
  Debezium emits whatever the table has;
- ``source.sequence`` is a STRING containing a JSON array, not an array;
- the envelope carries ``ts``/``ts_us``/``ts_ns`` the consumer ignores —
  decode must tolerate (and drop) them.
"""

from __future__ import annotations

import datetime as dt
import json

from cdc_example_spark.streaming.envelope import decode_envelope, route_changes

# --- verbatim capture, prototype/message.md:7-9 (key) and :12-48 (value) ---

WIRE_KEY = '{"id":"74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2"}'

WIRE_VALUE = json.dumps(
    {
        "before": {
            "id": "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2",
            "create_time": "2025-10-26T23:47:21.465566Z",
            "message": "message1",
            "username": "user",
        },
        "after": {
            "id": "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2",
            "create_time": "2025-10-26T23:47:21.465566Z",
            "message": "message2",
            "username": "user",
        },
        "source": {
            "version": "3.0.0.Final",
            "connector": "postgresql",
            "name": "messages",
            "ts_ms": 1761523267598,
            "snapshot": "false",
            "db": "defaultdb",
            "sequence": '["23967824","23968848"]',
            "ts_us": 1761523267598210,
            "ts_ns": 1761523267598210000,
            "schema": "public",
            "table": "messages",
            "txId": 755,
            "lsn": 23968848,
            "xmin": None,
        },
        "transaction": None,
        "op": "u",
        "ts": "2025-10-26T23:47:21.465566Z",
        "ts_ms": 1761523268027,
        "ts_us": 1761523268027183,
        "ts_ns": 1761523268027183807,
    }
)

CAPTURE_INSTANT = dt.datetime(2025, 10, 26, 23, 47, 21, 465566)


def _decode_one(spark, key: str, value: str):
    raw = spark.createDataFrame([(key, value)], "key STRING, value STRING")
    rows = decode_envelope(raw).collect()
    assert len(rows) == 1
    return rows[0]


def test_captured_update_decodes_field_for_field(spark):
    row = _decode_one(spark, WIRE_KEY, WIRE_VALUE)

    # key comes from the Kafka KEY, not the value (MessageConsumer.kt:33)
    assert row.key_id == "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2"
    assert row.op == "u"
    assert row.lsn == 23968848
    assert row.ts_ms == 1761523268027

    for img, msg in ((row.before, "message1"), (row.after, "message2")):
        assert img is not None
        assert img.id == "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2"
        assert img.message == msg
        assert img.username == "user"
        # ZonedTimestamp "2025-10-26T23:47:21.465566Z" parsed to the
        # exact microsecond (session tz is UTC in conftest)
        assert img.create_time == CAPTURE_INSTANT
        # captured table has no update_time column — declared-schema
        # decode yields NULL, it must not fail or shift other fields
        assert img.update_time is None


def test_captured_update_routes_as_upsert(spark):
    raw = spark.createDataFrame([(WIRE_KEY, WIRE_VALUE)], "key STRING, value STRING")
    routed = route_changes(decode_envelope(raw)).collect()
    assert len(routed) == 1
    assert routed[0].is_delete is False
    assert routed[0].after.message == "message2"


def test_documented_null_variants_route_by_after(spark):
    """message.md:13 'null in case of insert' / :19 'null in case of
    delete' — routing is after-IS-NULL, never the op code."""
    val = json.loads(WIRE_VALUE)

    insert = dict(val, before=None, op="i")
    row = _decode_one(spark, WIRE_KEY, json.dumps(insert))
    assert row.before is None and row.after is not None

    delete = dict(val, after=None, op="d")
    raw = spark.createDataFrame(
        [(WIRE_KEY, json.dumps(delete))], "key STRING, value STRING"
    )
    routed = route_changes(decode_envelope(raw)).collect()
    assert routed[0].is_delete is True
    assert routed[0].key_id == "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2"


def test_unparseable_key_rows_are_dropped_at_routing(spark):
    """A record whose Kafka KEY fails to parse is unroutable — it can
    address no materialized row. route_changes drops it (r5: the fused
    merge's per-key winner test and the old anti-join both mishandle a
    NULL key, so the guard lives at the routing boundary; the reference
    consumer would throw on the same input, MessageConsumer.kt:33)."""
    raw = spark.createDataFrame(
        [
            ("not json at all", WIRE_VALUE),
            (WIRE_KEY, WIRE_VALUE),
        ],
        "key STRING, value STRING",
    )
    routed = route_changes(decode_envelope(raw)).collect()
    assert len(routed) == 1
    assert routed[0].key_id == "74cb6b55-9a09-4c6d-8b94-8d9b63dd10a2"


def test_wire_sample_matches_reference_capture_if_present(spark):
    """When the reference checkout is available, re-extract the capture
    from prototype/message.md and assert the embedded copy above hasn't
    drifted from it (values only — the capture is commented JSON5)."""
    import pytest

    try:
        with open("/root/reference/prototype/message.md") as f:
            doc = f.read()
    except OSError:
        pytest.skip("reference checkout not available")

    import re

    # strip line comments, then parse the fenced key/value blocks
    blocks = re.findall(r"```(?:json5?|json)\n(.*?)```", doc, re.S)
    key_block = next(b for b in blocks if b.strip().startswith('{"id"'))
    value_block = next(b for b in blocks if '"before"' in b)
    value_clean = re.sub(r"//[^\n]*", "", value_block)
    assert json.loads(key_block) == json.loads(WIRE_KEY)
    assert json.loads(value_clean) == json.loads(WIRE_VALUE)
