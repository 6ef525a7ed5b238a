"""Run the browser live-view demo: REST ingress + WebSocket hub + the
file-replayed CDC pipeline, wired exactly like the reference's app
(reference: src/main/resources/static/index.html + debug.html served
by Spring; here: streaming/rest.py serves the engine's own pages).

    python scripts/run_liveview.py [--port 8080]

Then open http://127.0.0.1:<port>/ (live view) and /debug (raw feed).
Writes go through the page form -> POST /api/messages -> KeyedStateSink
-> a Debezium-envelope WAL double -> the file CDC source -> the
materialized view -> ws_frames -> every connected browser. Ctrl-C
stops everything.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.session import get_spark
    from cdc_example_spark.streaming.materialize import file_cdc_source, materialize
    from cdc_example_spark.streaming.rest import MessageRestServer
    from cdc_example_spark.streaming.sinks import broadcast_frames, ws_frames
    from cdc_example_spark.streaming.websocket import WsHub

    spark = get_spark("liveview-demo")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="liveview_")
    wal = os.path.join(root, "wal")
    os.makedirs(wal)
    ingest = KeyedStateSink(path=os.path.join(root, "db"), num_buckets=8)
    view = KeyedStateSink(path=os.path.join(root, "view"), num_buckets=8)

    hub = WsHub()
    ws_port = hub.start()

    def on_batch(batch_df, batch_id):
        frames = [r["frame"] for r in ws_frames(batch_df).collect()]
        broadcast_frames(frames, [hub.broadcast])

    # WAL double: every REST write is re-emitted as its Debezium
    # envelope into the file source the pipeline tails (the one hop the
    # sandbox cannot run for real — see README "Kafka status"; envelope
    # shape from the reference's prototype/message.md:6-49).
    seq = {"n": 0, "lsn": 10000}

    def _instant(rest_ts: str) -> str:
        d = dt.datetime.fromisoformat(rest_ts.replace("Z", "+00:00"))
        return d.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"

    def _wal_write(op, key_id, after):
        seq["n"] += 1
        seq["lsn"] += 8
        ts_ms = int(time.time() * 1000)
        value = {
            "before": None,
            "after": after,
            "source": {
                "version": "3.2.2.Final", "connector": "postgresql",
                "name": "messages", "ts_ms": ts_ms, "snapshot": "false",
                "db": "postgres",
                "sequence": json.dumps([str(seq["lsn"] - 8), str(seq["lsn"])]),
                "ts_us": ts_ms * 1000, "ts_ns": ts_ms * 1000000,
                "schema": "public", "table": "messages", "txId": seq["n"],
                "lsn": seq["lsn"], "xmin": None,
            },
            "transaction": None, "op": op, "ts": None,
            "ts_ms": ts_ms, "ts_us": ts_ms * 1000, "ts_ns": ts_ms * 1000000,
        }
        rec = {"key": json.dumps({"id": key_id}), "value": json.dumps(value)}
        path = os.path.join(wal, f"wal-{seq['n']:06d}.json")
        with open(path, "w") as f:
            f.write(json.dumps(rec) + "\n")
        # distinct mtimes: the file source orders same-mtime files
        # arbitrarily (the S12 postmortem)
        os.utime(path, (time.time() + seq["n"], time.time() + seq["n"]))

    rest = MessageRestServer(spark, ingest)
    _upsert, _delete = rest._upsert, rest._delete

    def upsert(body):
        saved = _upsert(body)
        _wal_write(
            "u" if body.get("id") else "c",
            saved["id"],
            {
                "id": saved["id"],
                "create_time": _instant(saved["createTime"]),
                "update_time": _instant(saved["updateTime"]),
                "message": saved["message"],
                "username": saved["username"],
            },
        )
        return saved

    def delete(message_id):
        _delete(message_id)
        _wal_write("d", message_id, None)

    rest._upsert, rest._delete = upsert, delete
    rest.start(port=args.port)
    rest.ws_url = f"ws://127.0.0.1:{ws_port}"

    query = materialize(
        file_cdc_source(spark, wal),
        view,
        os.path.join(root, "ckpt"),
        on_batch=on_batch,
        processing_time="1 second",
    )
    print(f"live view:  http://127.0.0.1:{rest.port}/")
    print(f"raw feed:   http://127.0.0.1:{rest.port}/debug")
    print(f"websocket:  {rest.ws_url}   (Ctrl-C to stop)")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        query.stop()
        rest.stop()
        hub.close()
        spark.stop()


if __name__ == "__main__":
    main()
