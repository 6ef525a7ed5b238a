"""S4–S6: streaming analytics equivalence + watermark contracts.

S4: stream–static enrichment counts == batch join counts.
S5: tumbling windows over a replayed stream == Q18's batch answer;
    late data beyond the watermark is dropped; streaming dedup drops
    redelivered ids.
S6: session_window session counts == Q19's lag-based batch sessions.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.queries.batch import q18, q19
from cdc_example_spark.sources.catalog import load_table
from cdc_example_spark.streaming.windows import (
    dedup_within_watermark,
    session_aggregates,
    stream_static_enrich,
    tumbling_counts,
)

EVENTS_DDL = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def replay_events_as_stream(spark, sf_dir, out_dir, n_files=4):
    """Write the events table as n time-ordered parquet files and open a
    file stream over them (modification times force source order)."""
    import os
    import time

    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = ev.collect()
    chunk = (len(rows) + n_files - 1) // n_files
    schema = ev.schema
    for i in range(n_files):
        part = rows[i * chunk : (i + 1) * chunk]
        spark.createDataFrame(part, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/f{i:03d}"
        )
    paths = []
    for i in range(n_files):
        d = f"{out_dir}/f{i:03d}"
        paths.extend(os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet"))
    for j, p in enumerate(sorted(paths)):
        os.utime(p, (time.time() + j, time.time() + j))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
    )


def run_updates_to_dict(query_df, ckpt, key_fn, timeout=180):
    """Run an update-mode streaming agg to completion; fold the update
    stream last-write-wins into {key: row}."""
    acc: dict = {}

    def absorb(batch_df, _bid):
        for r in batch_df.collect():
            acc[key_fn(r)] = r

    q = (
        query_df.writeStream.foreachBatch(absorb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    assert q.exception() is None
    return acc


def test_s5_tumbling_stream_equals_batch_q18(spark, sf_dir, tmp_path):
    stream = replay_events_as_stream(spark, sf_dir, str(tmp_path / "replay"))
    got = run_updates_to_dict(
        tumbling_counts(stream, watermark="2 hours"),
        str(tmp_path / "ckpt"),
        key_fn=lambda r: (r["w"]["start"], r["event_type"]),
    )
    batch = {  # Q18's oracle-checked batch answer, same bucket labels
        (r["hour_start"], r["event_type"]): r for r in q18(spark, sf_dir).collect()
    }
    streamed = {
        (k[0].strftime("%Y-%m-%d %H:%M:%S"), k[1]): v["num_events"] for k, v in got.items()
    }
    assert {k: v["num_events"] for k, v in batch.items()} == streamed
    # spot-check an aggregate value too
    some = next(iter(batch))
    assert batch[some]["sum_value"] == got[
        (dt.datetime.strptime(some[0], "%Y-%m-%d %H:%M:%S"), some[1])
    ]["sum_value"]


def test_s5_watermark_drops_late_rows(spark, tmp_path):
    import json
    import os
    import time

    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    def write_batch(n, rows):
        with open(os.path.join(src, f"b{n}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(os.path.join(src, f"b{n}.json"), (time.time() + n, time.time() + n))

    def stream():
        return (
            spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )

    def run_once():
        return run_updates_to_dict(
            tumbling_counts(stream(), duration="1 hour", watermark="10 minutes"),
            ckpt,
            key_fn=lambda r: (r["w"]["start"].isoformat(), r["event_type"]),
        )

    # batch 1: two rows in the 10:00 window
    write_batch(1, [
        {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T10:20:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    ])
    acc = run_once()
    assert acc[("2024-01-01T10:00:00", "click")]["num_events"] == 2

    # run 2 advances the watermark far past the 10:00 window (the
    # watermark a batch observes is the one persisted in the
    # checkpoint at planning time, so the advancement and the late row
    # must be separate runs)...
    write_batch(2, [
        {"event_id": 3, "ts": "2024-01-01T13:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    ])
    acc2 = run_once()
    assert ("2024-01-01T13:00:00", "click") in acc2

    # ...run 3 delivers a LATE row for 10:00 — must be dropped: no
    # update emitted for that window at all
    write_batch(3, [
        {"event_id": 4, "ts": "2024-01-01T10:25:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    ])
    acc3 = run_once()
    assert ("2024-01-01T10:00:00", "click") not in acc3


def test_s5_dedup_within_watermark(spark, tmp_path):
    import json
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 1, "ts": "2024-01-01T10:00:30", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T10:01:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(EVENTS_DDL).json(src)
    seen: list = []

    def absorb(batch_df, _bid):
        seen.extend(batch_df.collect())

    q = (
        dedup_within_watermark(stream, watermark="10 minutes")
        .writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["event_id"] for r in seen) == [1, 2]  # duplicate dropped


def test_s4_stream_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        "event_type STRING, category STRING",
    )
    stream = replay_events_as_stream(spark, sf_dir, str(tmp_path / "replay"), n_files=2)
    enriched = stream_static_enrich(stream, dim, "event_type")
    counts: dict = {}

    def absorb(batch_df, _bid):
        for r in batch_df.groupBy("category").count().collect():
            counts[r["category"]] = counts.get(r["category"], 0) + r["count"]

    q = (
        enriched.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None

    batch_counts = {
        r["category"]: r["count"]
        for r in load_table(spark, sf_dir, "events")
        .join(dim, "event_type")
        .groupBy("category")
        .count()
        .collect()
    }
    assert counts == batch_counts


def test_s6_session_window_equals_batch_q19(spark, sf_dir, tmp_path):
    """Append-mode session windows: a session is emitted exactly once,
    when the watermark passes it. A far-future sentinel event per user
    flushes the tail sessions (their own sentinel sessions are excluded
    from the comparison)."""
    import os
    import time

    out_dir = str(tmp_path / "replay")
    stream = replay_events_as_stream(spark, sf_dir, out_dir, n_files=3)

    ev = load_table(spark, sf_dir, "events")
    sentinel_ts = dt.datetime(2030, 1, 1)
    sentinels = (
        ev.select("user_id").distinct()
        .select(
            F.lit(-1).alias("event_id"),
            F.lit(sentinel_ts).cast("timestamp").alias("ts"),
            "user_id",
            F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    sentinels.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/f999")
    for p in os.listdir(f"{out_dir}/f999"):
        if p.endswith(".parquet"):
            os.utime(os.path.join(f"{out_dir}/f999", p), (time.time() + 900, time.time() + 900))

    appended: list = []

    def absorb(batch_df, _bid):
        appended.extend(batch_df.collect())

    q = (
        session_aggregates(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.foreachBatch(absorb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    streamed_sessions: dict[int, int] = {}
    for r in appended:
        if r["sw"]["start"] >= sentinel_ts:
            continue  # the sentinel's own session
        streamed_sessions[r["user_id"]] = streamed_sessions.get(r["user_id"], 0) + 1
    batch_sessions = {
        r["user_id"]: r["n_sessions"] for r in q19(spark, sf_dir).collect()
    }
    assert streamed_sessions == batch_sessions


def test_s5_complete_mode_memory_sink(spark, sf_dir, tmp_path):
    # output-mode contract (SURVEY §2.2 "output modes"): COMPLETE re-emits
    # the full aggregate table each trigger, so after the last trigger the
    # memory sink equals the batch answer directly (no update folding).
    stream = replay_events_as_stream(spark, sf_dir, str(tmp_path / "replay"))
    q = (
        tumbling_counts(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("s5_complete")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r["w"]["start"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]): r["num_events"]
        for r in spark.sql("SELECT * FROM s5_complete").collect()
    }
    batch = {
        (r["hour_start"], r["event_type"]): r["num_events"]
        for r in q18(spark, sf_dir).collect()
    }
    assert got == batch


def test_s7_stream_stream_interval_join_equals_batch_q50(spark, sf_dir, tmp_path):
    """S7: two branches of the replayed event stream (errors, clicks)
    joined on user + [err_ts, err_ts + 1h] must produce exactly the
    matched pairs of Q50's (oracle-checked) batch range join."""
    from cdc_example_spark.streaming.windows import stream_stream_interval_join

    stream = replay_events_as_stream(spark, sf_dir, str(tmp_path / "replay"), n_files=3)
    errs = stream.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    cond = (
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("err_ts"))
        & (F.col("click_ts") <= F.col("err_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = stream_stream_interval_join(
        errs, clicks, cond, left_ts="err_ts", right_ts="click_ts", watermark="2 hours"
    )
    pairs: set = set()

    def absorb(batch_df, _bid):
        pairs.update((r["err_id"], r["click_id"]) for r in batch_df.collect())

    q = (
        joined.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    ev = load_table(spark, sf_dir, "events")
    b_errs = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    b_clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    batch_pairs = {
        (r["err_id"], r["click_id"])
        for r in b_errs.join(
            b_clicks,
            (F.col("e_user") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("err_ts"))
            & (F.col("click_ts") <= F.col("err_ts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert pairs == batch_pairs and len(pairs) > 0


def test_state_store_is_rocksdb(spark, tmp_path):
    """SCALE.md §4 claims the streaming state store is RocksDB — pin it
    (VERDICT r2 item 8): the session config must name the RocksDB
    provider, and a stateful query's checkpoint must contain RocksDB
    snapshot artifacts (.zip/.changelog), not the HDFSBackedStateStore
    .delta files the default provider writes."""
    import os

    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert provider.endswith("RocksDBStateStoreProvider"), provider

    rows = [(dt.datetime(2025, 1, 1, 0, 0, i), f"u{i % 3}") for i in range(30)]
    src = tmp_path / "rocks-src"
    spark.createDataFrame(rows, "ts TIMESTAMP, user STRING").write.parquet(str(src / "f0"))
    stream = spark.readStream.schema("ts TIMESTAMP, user STRING").parquet(str(src / "*"))
    counted = stream.withWatermark("ts", "1 hour").groupBy("user").count()
    ckpt = tmp_path / "rocks-ckpt"
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("rocks_pin")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert spark.sql("SELECT sum(count) FROM rocks_pin").collect()[0][0] == 30

    exts = set()
    for root, _dirs, files in os.walk(ckpt / "state"):
        exts.update(os.path.splitext(f)[1] for f in files)
    assert ".delta" not in exts, exts  # default-provider artifact
    assert {".zip", ".changelog"} & exts, exts  # RocksDB artifacts


def test_s11_stream_stream_left_outer_join_emits_unmatched_after_watermark(
    spark, sf_dir, tmp_path
):
    """S11: stream–stream LEFT OUTER interval join — the capability S7's
    inner join doesn't cover: errors with NO click within the hour must
    emit a null-padded row once the watermark passes their join window
    (Spark holds the unmatched left in state until err_ts + interval <
    watermark, THEN emits — the outer result is watermark-gated by
    design). Two far-future sentinel rows (one per branch, fake users)
    push both branches' watermarks past every real row's horizon, so
    the stream's outer output must equal the batch left join exactly:
    same matched pairs, same unmatched error set. Without the
    sentinels the tail of the stream would stay in state forever — the
    documented operational caveat this test also demonstrates."""
    import datetime
    import os
    import time

    from cdc_example_spark.streaming.windows import stream_stream_interval_join

    replay_dir = str(tmp_path / "replay")
    stream = replay_events_as_stream(spark, sf_dir, replay_dir, n_files=3)

    # sentinels: one error-branch row (user -1) and one click-branch row
    # (user -2), 30 days past the real data; they match nothing (fake
    # users) and only advance each branch's watermark.
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    far = max_ts + datetime.timedelta(days=30)
    sent = spark.createDataFrame(
        [
            (10**12, far, -1, "error", 0.0, "{}"),
            (10**12 + 1, far, -2, "click", 0.0, "{}"),
        ],
        ev.schema,
    )
    sent.coalesce(1).write.mode("overwrite").parquet(f"{replay_dir}/f999")
    for p in os.listdir(f"{replay_dir}/f999"):
        if p.endswith(".parquet"):
            full = os.path.join(replay_dir, "f999", p)
            os.utime(full, (time.time() + 1000, time.time() + 1000))

    errs = stream.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("err_ts"))
        & (F.col("click_ts") <= F.col("err_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = stream_stream_interval_join(
        errs,
        clicks,
        cond,
        left_ts="err_ts",
        right_ts="click_ts",
        watermark="2 hours",
        how="left_outer",
    )
    matched: set = set()
    unmatched: set = set()

    def absorb(batch_df, _bid):
        for r in batch_df.collect():
            if r["click_id"] is None:
                unmatched.add(r["err_id"])
            else:
                matched.add((r["err_id"], r["click_id"]))

    q = (
        joined.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow terminates; a bounded wait
    # can return early under full-suite load and read partial results
    assert q.exception() is None

    b_errs = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    b_clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    b = b_errs.join(b_clicks, cond, "left_outer").collect()
    b_matched = {
        (r["err_id"], r["click_id"]) for r in b if r["click_id"] is not None
    }
    b_unmatched = {r["err_id"] for r in b if r["click_id"] is None}

    assert matched == b_matched and len(matched) > 0
    # the error-branch sentinel's own horizon never passes the final
    # watermark, so it stays in state — exclude it from the contract
    assert unmatched == b_unmatched and len(unmatched) > 0
