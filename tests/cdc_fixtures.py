"""Synthetic Debezium envelopes (shape: reference prototype/message.md:6-49)."""

from __future__ import annotations

import json

_LSN = [10000]


def envelope(
    op: str,
    key_id: str,
    before: dict | None = None,
    after: dict | None = None,
    ts_ms: int = 1761523268027,
    lsn: int | None = None,
) -> dict:
    """One Kafka-shaped record {key, value} with a full Debezium value."""
    if lsn is None:
        _LSN[0] += 8
        lsn = _LSN[0]
    value = {
        "before": before,
        "after": after,
        "source": {
            "version": "3.2.2.Final",
            "connector": "postgresql",
            "name": "messages",
            "ts_ms": ts_ms - 429,
            "snapshot": "false",
            "db": "postgres",
            "sequence": json.dumps([str(lsn - 8), str(lsn)]),
            "ts_us": (ts_ms - 429) * 1000,
            "ts_ns": (ts_ms - 429) * 1000000,
            "schema": "public",
            "table": "messages",
            "txId": 761,
            "lsn": lsn,
            "xmin": None,
        },
        "transaction": None,
        "op": op,
        "ts": None,
        "ts_ms": ts_ms,
        "ts_us": ts_ms * 1000,
        "ts_ns": ts_ms * 1000000,
    }
    return {"key": json.dumps({"id": key_id}), "value": json.dumps(value)}


def row_image(id_: str, create: str, update: str, message: str, username: str) -> dict:
    """after/before image; timestamps as ISO-8601 instants (message.md:17,22)."""
    return {
        "id": id_,
        "create_time": create,
        "update_time": update,
        "message": message,
        "username": username,
    }
