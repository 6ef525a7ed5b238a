"""S9 — applyInPandasWithState CDC materialization: the state-store
twin of the bucket-sink path, checked against the same reference
invariants — last-write-wins by lsn, delete-on-tombstone, resurrection
allowed, create_time preserved across updates
(CdcApplicationTests.kt:21-44)."""

from __future__ import annotations

import json
import uuid

from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
from cdc_example_spark.streaming.materialize import file_cdc_source
from cdc_example_spark.streaming.stateful import materialize_with_state
from tests.cdc_fixtures import envelope, row_image


def _write_batch(path, n, records):
    with open(path / f"batch-{n:04d}.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _view(spark, table):
    """Live view = last changelog row per key, dropping deletes."""
    rows = spark.sql(
        f"""
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY lsn DESC) rn
          FROM {table}
        ) WHERE rn = 1 AND NOT is_delete
        """
    ).collect()
    return {r["id"]: r.asDict() for r in rows}


def test_s9_state_store_materialization_matches_reference_semantics(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    a, b = str(uuid.uuid4()), str(uuid.uuid4())
    t0 = "2025-10-26T10:00:00.000000Z"
    t1 = "2025-10-26T10:05:00.000000Z"

    # batch 1: create a and b (out of lsn order within the batch — the
    # operator must order by lsn, not arrival)
    _write_batch(src, 1, [
        envelope("u", a, after=row_image(a, t0, t1, "a-v2", "alice"), lsn=120),
        envelope("i", a, after=row_image(a, t0, t0, "a-v1", "alice"), lsn=100),
        envelope("i", b, after=row_image(b, t0, t0, "b-v1", "bob"), lsn=110),
    ])
    # batch 2: delete b, then resurrect it; stale replay of a's insert
    _write_batch(src, 2, [
        envelope("d", b, after=None, lsn=200),
        envelope("i", b, after=row_image(b, t1, t1, "b-v2", "bob"), lsn=210),
        envelope("i", a, after=row_image(a, t0, t0, "a-v1", "alice"), lsn=100),
    ])

    changelog = materialize_with_state(
        route_changes(decode_envelope(file_cdc_source(spark, str(src), max_files_per_trigger=1)))
    )
    q = (
        changelog.writeStream.format("memory")
        .queryName("state_changelog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    view = _view(spark, "state_changelog")
    assert set(view) == {a, b}
    # last-write-wins: a's update (lsn 120) beat both the in-batch
    # earlier insert and the batch-2 stale replay (lsn 100)
    assert view[a]["message"] == "a-v2"
    # create_time preserved across the update; update_time advanced
    assert view[a]["create_time"] != view[a]["update_time"]
    # resurrection: delete (200) then insert (210) leaves b live
    assert view[b]["message"] == "b-v2"


def test_s10_streaming_funnel_matches_batch_fold(spark, tmp_path):
    """funnel_with_state over an in-order 3-batch replay must land every
    user on exactly the (t1, t2, t3) the batch fold (q71's F.aggregate
    walk of the full sorted sequence) computes — including users who
    stall at every intermediate stage and purchase-before-click decoys."""
    import json
    import random

    from cdc_example_spark.streaming.stateful import funnel_with_state

    rng = random.Random(31)
    types = ["signup", "click", "purchase", "view"]
    events = []  # (user_id, t_micros, type)
    for uid in range(40):
        n = rng.randint(1, 12)
        ts = sorted(rng.sample(range(1_000_000, 9_000_000), n))
        for t in ts:
            events.append((uid, t, rng.choice(types)))
    events.sort(key=lambda e: e[1])  # in-order source contract

    # independent python oracle: walk each user's full sequence sorted
    expect = {}
    for uid in range(40):
        cur = [-1, -1, -1]
        for _, t, ty in sorted(e for e in events if e[0] == uid):
            if ty == "signup" and cur[0] < 0:
                cur[0] = t
            elif ty == "click" and cur[1] < 0 and cur[0] >= 0 and t > cur[0]:
                cur[1] = t
            elif ty == "purchase" and cur[2] < 0 and cur[1] >= 0 and t > cur[1]:
                cur[2] = t
        expect[uid] = tuple(cur)

    src = tmp_path / "in"
    src.mkdir()
    third = len(events) // 3
    for i, chunk in enumerate(
        (events[:third], events[third : 2 * third], events[2 * third :])
    ):
        with open(src / f"b{i}.jsonl", "w") as f:
            for uid, t, ty in chunk:
                f.write(json.dumps({"user_id": uid, "t": t, "event_type": ty}) + "\n")
    # explicit mtime spacing — the in-order source contract must not
    # hinge on same-mtime tie-breaking (see S12's flake postmortem)
    import os
    import time

    for i in range(3):
        os.utime(src / f"b{i}.jsonl", (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema("user_id long, t long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .selectExpr("user_id", "timestamp_micros(t) AS ts", "event_type")
    )
    q = (
        funnel_with_state(stream)
        .writeStream.format("memory")
        .queryName("funnel_s10")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final state per user: every state field is MONOTONE (-1 → value,
    # then frozen; stage only grows), so the max tuple per user IS the
    # final state — no reliance on the memory sink's row order.
    rows = spark.sql("SELECT * FROM funnel_s10").collect()
    last = {}
    for r in rows:
        tup = (r["stage"], r["t1"], r["t2"], r["t3"])
        if r["user_id"] not in last or tup > last[r["user_id"]]:
            last[r["user_id"]] = tup
    last = {u: (t1, t2, t3, st) for u, (st, t1, t2, t3) in last.items()}
    for uid, exp in expect.items():
        if not any(e[0] == uid for e in events):
            continue
        got = last[uid]
        assert got[:3] == exp, (uid, got, exp)
        assert got[3] == sum(1 for t in exp if t >= 0)


def test_s12_event_time_timeout_sessionization_matches_oracle(spark, tmp_path):
    """sessionize_with_state over an in-order replay must emit exactly
    the sessions a python fold of each user's full sequence computes —
    inline-closed sessions (gap visible in the data) AND
    timeout-closed ones (the user's final session, flushed when the
    far-future sentinel advances the watermark past last + gap)."""
    import json
    import random

    from cdc_example_spark.streaming.stateful import sessionize_with_state

    GAP_US = 600 * 1_000_000  # 10 minutes
    rng = random.Random(77)
    events = []  # (user_id, t_micros)
    base = 1_700_000_000_000_000
    for uid in range(25):
        t = base + rng.randint(0, 120) * 1_000_000
        for _ in range(rng.randint(1, 20)):
            # mixture of small steps (same session) and > gap jumps
            step = rng.choice([5, 30, 200, 500, 700, 1500, 4000])
            t += step * 1_000_000
            events.append((uid, t))
    events.sort(key=lambda e: e[1])

    # independent oracle: same gap fold per user
    expect = set()
    for uid in range(25):
        ts = sorted(t for u, t in events if u == uid)
        if not ts:
            continue
        cur = [ts[0], ts[0], 1]
        for t in ts[1:]:
            if t - cur[1] > GAP_US:
                expect.add((uid, cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
            else:
                cur[1] = t
                cur[2] += 1
        expect.add((uid, cur[0], cur[1], cur[2]))

    src = tmp_path / "in"
    src.mkdir()
    third = len(events) // 3
    chunks = [events[:third], events[third : 2 * third], events[2 * third :]]
    # sentinels LAST: a fake far-future user advances the watermark past
    # every real session's last + gap — and a SECOND, later sentinel
    # batch is required because timeouts fire during the batch AFTER
    # the watermark advance (the operator evaluates hasTimedOut keys at
    # batch start against the watermark the previous batch produced).
    far = max(t for _, t in events) + 30 * 86400 * 1_000_000
    chunks.append([(-1, far)])
    chunks.append([(-2, far + 86400 * 1_000_000)])
    for i, chunk in enumerate(chunks):
        with open(src / f"b{i}.jsonl", "w") as f:
            for uid, t in chunk:
                f.write(json.dumps({"user_id": uid, "t": t}) + "\n")
    # EXPLICIT mtime spacing (replay_events_as_stream's discipline): the
    # file source orders same-mtime files arbitrarily, and a sentinel
    # processed early blasts the watermark forward — every open session
    # then times out prematurely (observed as a flaky split/miss set).
    import os
    import time

    for i in range(len(chunks)):
        os.utime(src / f"b{i}.jsonl", (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema("user_id long, t long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .selectExpr("user_id", "timestamp_micros(t) AS ts")
    )
    q = (
        sessionize_with_state(stream, gap_us=GAP_US, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_s12")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow terminates; a bounded wait
    # can return early under full-suite load and read partial results
    assert q.exception() is None
    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_s12").collect()
        if r.user_id >= 0
    }
    assert got == expect and len(expect) > 25  # real session splits occurred
