"""Avro/Schema-Registry envelope variant (streaming/avro_envelope.py).

Three layers of checks, mirroring the JSON wire-contract suite:
  1. codec round-trips (incl. varint edge values and truncation);
  2. the Spark decode is column-for-column identical to the JSON
     path's decode_envelope on the SAME logical change sequence —
     the converter choice must be a one-line swap;
  3. the decoded stream drives apply-side routing like the JSON path
     (delete iff after IS NULL, unroutable keys dropped).
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import Row

from cdc_example_spark.streaming import avro_envelope as A
from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
from tests.cdc_fixtures import envelope, row_image


def test_varint_round_trip_edges():
    for n in (0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**62), 2**63 - 1, -(2**63)):
        buf = bytearray()
        A._write_long(buf, n)
        got, pos = A._read_long(bytes(buf), 0)
        assert (got, pos) == (n, len(buf)), n


def test_record_union_round_trip():
    img = {
        "id": "u-1",
        "create_time": "2025-10-26T23:21:07.999533Z",
        "update_time": "2025-10-26T23:21:08.000000Z",
        "message": "héllo wörld",  # utf-8 multibyte
        "username": "alice",
    }
    val = {
        "before": None,
        "after": img,
        "source": {
            "version": "3.2.2.Final",
            "connector": "postgresql",
            "name": "messages",
            "ts_ms": 1,
            "lsn": 10016,
        },
        "op": "c",
        "ts_ms": 1761523268027,
    }
    buf = A.avro_encode(A.VALUE_SCHEMA, val)
    got, pos = A.avro_decode(A.VALUE_SCHEMA, buf)
    assert pos == len(buf)
    assert got == val


def test_confluent_frame_and_truncation():
    framed = A.confluent_frame(42, b"\x02hi")
    assert framed[0] == 0 and len(framed) == 5 + 3
    sid, body = A.confluent_unframe(framed)
    assert (sid, body) == (42, b"\x02hi")
    with pytest.raises(ValueError):
        A.confluent_unframe(b"\x01\x00\x00\x00\x2a")  # bad magic
    with pytest.raises(ValueError):
        A.avro_decode(A.KEY_SCHEMA, b"\x10abc")  # string cut short


def _changes():
    img1 = row_image(
        "k-1",
        "2025-10-26T23:21:07.999533Z",
        "2025-10-26T23:21:07.999533Z",
        "first",
        "alice",
    )
    img2 = dict(img1, update_time="2025-10-26T23:22:00.000000Z", message="second")
    return [
        ("c", "k-1", None, img1, 10008, 1761523268027),
        ("u", "k-1", img1, img2, 10016, 1761523268130),
        ("d", "k-1", img2, None, 10024, 1761523268254),
    ]


def _decoded_rows(df):
    return [
        (
            r.key_id,
            None if r.before is None else tuple(r.before),
            None if r.after is None else tuple(r.after),
            r.op,
            r.lsn,
            r.ts_ms,
        )
        for r in df.orderBy("lsn").collect()
    ]


def test_avro_decode_equals_json_decode(spark):
    """The converter swap contract: identical typed rows from both
    wire formats for the same logical change sequence."""
    json_records = [
        Row(**envelope(op, kid, before=b, after=a, lsn=lsn, ts_ms=ts))
        for op, kid, b, a, lsn, ts in _changes()
    ]
    avro_records = [
        Row(key=k, value=v)
        for op, kid, b, a, lsn, ts in _changes()
        for k, v in [A.encode_change(kid, op, b, a, lsn, ts)]
    ]
    jdf = decode_envelope(spark.createDataFrame(json_records))
    adf = A.decode_avro_envelope(
        spark.createDataFrame(avro_records, "key binary, value binary")
    )
    assert jdf.schema == adf.schema
    assert _decoded_rows(jdf) == _decoded_rows(adf)


def test_avro_routing_matches_reference_semantics(spark):
    avro_records = [
        Row(key=k, value=v)
        for op, kid, b, a, lsn, ts in _changes()
        for k, v in [A.encode_change(kid, op, b, a, lsn, ts)]
    ]
    # plus one unroutable record (garbage key) — must be dropped
    avro_records.append(Row(key=b"\x00\x00\x00\x00\x01\xff", value=avro_records[0].value))
    decoded = A.decode_avro_envelope(
        spark.createDataFrame(avro_records, "key binary, value binary")
    )
    routed = route_changes(decoded).orderBy("lsn").collect()
    assert [r.is_delete for r in routed] == [False, False, True]
    assert routed[-1].after is None
    assert routed[0].after.message == "first"


def test_schema_id_is_carried_and_checked():
    k, v = A.encode_change("k-9", "c", None, {
        "id": "k-9",
        "create_time": "2025-10-26T23:21:07Z",
        "update_time": "2025-10-26T23:21:07Z",
        "message": "m",
        "username": "u",
    }, 1, 2, key_schema_id=7, value_schema_id=9)
    assert A.confluent_unframe(k)[0] == 7
    assert A.confluent_unframe(v)[0] == 9


def test_garbage_value_rows_decode_to_unapplied_nulls(spark):
    """A record whose VALUE fails to decode must not kill the batch:
    the row keeps its key but carries no image/lsn, so routing treats
    it as nothing applicable (after NULL + lsn NULL) — the per-row
    tolerance the JSON path has via from_json-returns-NULL."""
    from pyspark.sql import Row

    good_k, good_v = A.encode_change(
        "k-ok", "c", None,
        {
            "id": "k-ok",
            "create_time": "2025-10-26T23:21:07Z",
            "update_time": "2025-10-26T23:21:07Z",
            "message": "m",
            "username": "u",
        },
        5, 6,
    )
    bad = Row(key=good_k, value=b"\x00\x00\x00\x00\x09\xff\xff")  # truncated body
    rows = A.decode_avro_envelope(
        spark.createDataFrame([Row(key=good_k, value=good_v), bad],
                              "key binary, value binary")
    ).collect()
    assert len(rows) == 2
    ok = [r for r in rows if r.lsn is not None]
    broken = [r for r in rows if r.lsn is None]
    assert len(ok) == 1 and ok[0].after.message == "m"
    assert len(broken) == 1 and broken[0].key_id == "k-ok"
    assert broken[0].after is None and broken[0].op is None


def test_avro_pipeline_parity_with_json_materialize(spark, tmp_path):
    """End-to-end converter swap: the SAME change sequence replayed
    once as JSON lines and once as Confluent-framed Avro parquet must
    materialize IDENTICAL final state through the same
    decode→route→apply pipeline (materialize(converter=...))."""
    import os
    import time

    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.streaming.materialize import (
        file_avro_cdc_source,
        file_cdc_source,
        materialize,
    )

    changes = _changes() + [
        ("c", "k-2", None, row_image(
            "k-2", "2025-10-26T23:25:00Z", "2025-10-26T23:25:00Z", "other", "bob"
        ), 10032, 1761523268400),
    ]

    # JSON replay
    jsrc = tmp_path / "json_in"
    jsrc.mkdir()
    for i, (op, kid, b, a, lsn, ts) in enumerate(changes):
        with open(jsrc / f"b{i}.jsonl", "w") as f:
            f.write(json.dumps(envelope(op, kid, before=b, after=a, lsn=lsn, ts_ms=ts)) + "\n")
        os.utime(jsrc / f"b{i}.jsonl", (time.time() + i, time.time() + i))
    jsink = KeyedStateSink(path=str(tmp_path / "jstate"), num_buckets=4)
    q = materialize(
        file_cdc_source(spark, str(jsrc)),
        jsink,
        str(tmp_path / "jckpt"),
        trigger_once=True,
    )
    q.awaitTermination()
    assert q.exception() is None

    # Avro replay of the SAME changes
    asrc = tmp_path / "avro_in"
    asrc.mkdir()
    from pyspark.sql import Row

    for i, (op, kid, b, a, lsn, ts) in enumerate(changes):
        k, v = A.encode_change(kid, op, b, a, lsn, ts)
        spark.createDataFrame(
            [Row(key=k, value=v)], "key binary, value binary"
        ).coalesce(1).write.mode("overwrite").parquet(str(asrc / f"b{i:03d}"))
    # mtime spacing (the S12 discipline)
    paths = sorted(
        os.path.join(r, fn)
        for r, _d, fs in os.walk(asrc)
        for fn in fs
        if fn.endswith(".parquet")
    )
    for j, p in enumerate(paths):
        os.utime(p, (time.time() + j, time.time() + j))
    asink = KeyedStateSink(path=str(tmp_path / "astate"), num_buckets=4)
    q2 = materialize(
        file_avro_cdc_source(spark, str(asrc)),
        asink,
        str(tmp_path / "ackpt"),
        trigger_once=True,
        converter="avro",
    )
    q2.awaitTermination()
    assert q2.exception() is None

    def state(sink):
        df = sink.snapshot(spark)  # MESSAGES schema: id is the key
        return {
            r.id: (str(r.create_time), str(r.update_time), r.message, r.username)
            for r in df.collect()
        }

    js, as_ = state(jsink), state(asink)
    assert js == as_ and "k-2" in js  # k-1 deleted, k-2 live, byte-equal
