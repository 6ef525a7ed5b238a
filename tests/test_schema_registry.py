"""Schema-Registry resolution for the Avro envelope path (VERDICT r6
item 8): a stub Confluent registry (stdlib HTTP, the public
``GET /schemas/ids/{id}`` contract) serves the reference's envelope
schemas; decode through the registry path must equal decode through
the pinned-schema path bit-for-bit, and every failure mode (registry
down, unknown id, unsupported schema feature) must fall back to the
pinned schemas instead of stalling or corrupting rows.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row

import cdc_example_spark.streaming.avro_envelope as A
from cdc_example_spark.streaming.schema_registry import (
    SchemaRegistryClient,
    avro_json_to_tree,
    tree_to_avro_json,
)


class StubRegistry:
    """Confluent-wire stub: id → Avro schema JSON; counts lookups."""

    def __init__(self, schemas: "dict[int, object]"):
        self.schemas = schemas
        self.hits: "list[int]" = []
        stub = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                prefix = "/schemas/ids/"
                if not self.path.startswith(prefix):
                    self.send_response(404)
                    self.end_headers()
                    return
                sid = int(self.path[len(prefix):])
                stub.hits.append(sid)
                if sid not in stub.schemas:
                    body = json.dumps({"error_code": 40403}).encode()
                    self.send_response(404)
                else:
                    body = json.dumps(
                        {"schema": json.dumps(stub.schemas[sid])}
                    ).encode()
                    self.send_response(200)
                self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self._httpd.server_address[1]}"
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# converter pair
# ---------------------------------------------------------------------------

def test_tree_json_converters_are_inverses_on_reference_schemas():
    for tree in (A.KEY_SCHEMA, A.VALUE_SCHEMA, A.ROW_SCHEMA, "string", "long",
                 ("union_null", "long")):
        assert avro_json_to_tree(tree_to_avro_json(tree)) == tree


def test_json_to_tree_rejects_unsupported_features():
    for bad in ("int", ["null", "string", "long"], {"type": "enum"},
                {"type": "array", "items": "string"}):
        with pytest.raises(ValueError):
            avro_json_to_tree(bad)


# ---------------------------------------------------------------------------
# client behavior against the stub
# ---------------------------------------------------------------------------

def test_client_resolves_caches_and_falls_back():
    reg = StubRegistry({
        1: tree_to_avro_json(A.KEY_SCHEMA),
        7: {"type": "enum", "name": "nope"},  # unsupported feature
    })
    try:
        c = SchemaRegistryClient(reg.url)
        assert c.resolve(1, "FALLBACK") == A.KEY_SCHEMA
        assert c.resolve(1, "FALLBACK") == A.KEY_SCHEMA
        assert reg.hits.count(1) == 1, "second resolve must be served from cache"
        # unknown id and unsupported schema both fall back, negative-cached
        assert c.resolve(99, "FALLBACK") == "FALLBACK"
        assert c.resolve(99, "FALLBACK") == "FALLBACK"
        assert reg.hits.count(99) == 1
        assert c.resolve(7, "FALLBACK") == "FALLBACK"
    finally:
        reg.close()


def test_client_dead_registry_falls_back():
    c = SchemaRegistryClient("http://127.0.0.1:9", timeout=0.2)  # discard port
    assert c.resolve(2, A.VALUE_SCHEMA) == A.VALUE_SCHEMA
    assert c.resolve(2, A.VALUE_SCHEMA) == A.VALUE_SCHEMA  # negative-cached


# ---------------------------------------------------------------------------
# decode parity through the registry path
# ---------------------------------------------------------------------------

def _changes():
    t0 = "2025-10-26T10:00:00.000000Z"
    t1 = "2025-10-26T10:00:05.000000Z"
    img0 = {"id": "m1", "create_time": t0, "update_time": t0,
            "message": "hi", "username": "ann"}
    img1 = {**img0, "update_time": t1, "message": "edited"}
    return [
        ("c", "m1", None, img0, 1000, 1),
        ("u", "m1", img0, img1, 1008, 2),
        ("d", "m1", img1, None, 1016, 3),
    ]


def _rows(df):
    return [
        (r.key_id,
         None if r.before is None else tuple(r.before),
         None if r.after is None else tuple(r.after),
         r.op, r.lsn, r.ts_ms)
        for r in df.orderBy("lsn").collect()
    ]


def test_registry_path_decode_parity_and_fallback(spark):
    records = [
        Row(key=k, value=v)
        for op, kid, b, a, lsn, ts in _changes()
        for k, v in [A.encode_change(kid, op, b, a, lsn, ts)]
    ]
    raw = spark.createDataFrame(records, "key binary, value binary")
    pinned = _rows(A.decode_avro_envelope(raw))

    # registry serving the REAL schemas (ids 1/2 — encode_change's)
    reg = StubRegistry({
        1: tree_to_avro_json(A.KEY_SCHEMA),
        2: tree_to_avro_json(A.VALUE_SCHEMA),
    })
    try:
        via_registry = _rows(
            A.decode_avro_envelope(raw, registry_url=reg.url)
        )
        assert via_registry == pinned and len(pinned) == 3
        assert sorted(set(reg.hits)) == [1, 2], "both ids resolved over HTTP"
    finally:
        reg.close()

    # registry DOWN: the decode must still produce the pinned result
    dead = _rows(
        A.decode_avro_envelope(
            raw, registry_url="http://127.0.0.1:9"
        )
    )
    assert dead == pinned


def test_registry_path_decodes_evolved_schema(spark):
    """A writer schema with an APPENDED string field (the canonical
    BACKWARD-compatible evolution) must decode through the registry —
    the pinned schema alone would misparse the extra bytes."""
    evolved_row = ("record", A.ROW_SCHEMA[1] + [("tag", ("union_null", "string"))])
    evolved_value = (
        "record",
        [
            ("before", ("union_null", evolved_row)),
            ("after", ("union_null", evolved_row)),
            ("source", A.SOURCE_SCHEMA),
            ("op", "string"),
            ("ts_ms", ("union_null", "long")),
        ],
    )
    t0 = "2025-10-26T10:00:00.000000Z"
    img = {"id": "m9", "create_time": t0, "update_time": t0,
           "message": "hey", "username": "zed", "tag": "extra"}
    value = {
        "before": None, "after": img,
        "source": {"version": "x", "connector": "postgresql",
                   "name": "messages", "ts_ms": 1, "lsn": 2000},
        "op": "c", "ts_ms": 5,
    }
    key = A.confluent_frame(1, A.avro_encode(A.KEY_SCHEMA, {"id": "m9"}))
    val = A.confluent_frame(9, A.avro_encode(evolved_value, value))
    raw = spark.createDataFrame([Row(key=key, value=val)], "key binary, value binary")

    reg = StubRegistry({
        1: tree_to_avro_json(A.KEY_SCHEMA),
        9: tree_to_avro_json(evolved_value),
    })
    try:
        rows = _rows(A.decode_avro_envelope(raw, registry_url=reg.url))
        assert len(rows) == 1
        key_id, before, after, op, lsn, ts_ms = rows[0]
        assert key_id == "m9" and op == "c" and lsn == 2000
        assert after is not None and after[3] == "hey" and after[4] == "zed"
    finally:
        reg.close()

    # without the registry, the evolved frame must degrade to an
    # unapplied row (schema mismatch -> per-row tolerance), not crash
    rows = A.decode_avro_envelope(raw).collect()
    assert len(rows) == 1 and rows[0].key_id == "m9"


def test_registry_schema_with_removed_field_degrades_not_nulls(spark):
    """ADVICE r7: a registry-resolved writer schema that REMOVED a
    pinned field (here `username`) must route the frame through the
    per-row decode-failure tolerance — an UNAPPLIED row (NULL after,
    NULL lsn) — never materialize an applied row whose missing column
    is silently NULL."""
    reduced_row = (
        "record",
        [(f, s) for f, s in A.ROW_SCHEMA[1] if f != "username"],
    )
    reduced_value = (
        "record",
        [
            ("before", ("union_null", reduced_row)),
            ("after", ("union_null", reduced_row)),
            ("source", A.SOURCE_SCHEMA),
            ("op", "string"),
            ("ts_ms", ("union_null", "long")),
        ],
    )
    t0 = "2025-10-26T10:00:00.000000Z"
    img = {"id": "m9", "create_time": t0, "update_time": t0, "message": "hey"}
    value = {
        "before": None, "after": img,
        "source": {"version": "x", "connector": "postgresql",
                   "name": "messages", "ts_ms": 1, "lsn": 2000},
        "op": "c", "ts_ms": 5,
    }
    key = A.confluent_frame(1, A.avro_encode(A.KEY_SCHEMA, {"id": "m9"}))
    val = A.confluent_frame(9, A.avro_encode(reduced_value, value))
    raw = spark.createDataFrame(
        [Row(key=key, value=val)], "key binary, value binary"
    )

    reg = StubRegistry({
        1: tree_to_avro_json(A.KEY_SCHEMA),
        9: tree_to_avro_json(reduced_value),
    })
    try:
        rows = A.decode_avro_envelope(raw, registry_url=reg.url).collect()
    finally:
        reg.close()
    assert len(rows) == 1
    r = rows[0]
    assert r.key_id == "m9"            # key still routes
    assert r.after is None and r.before is None  # NOT a half-NULL image
    assert r.lsn is None               # unapplied: ordered out downstream
