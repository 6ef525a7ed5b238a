"""S1–S3 + write-path invariants: the reference's e2e contract as data.

Replays the integration-test scenario of the reference
(CdcApplicationTests.kt:21-44) against the KeyedStateSink:
  S1 insert → update → delete round trip with the exact timestamp
     invariants; S2 last-write-wins under intra-batch collision +
     resurrection after delete (MessageEventTestListener.kt:19-29);
  S3 delete keyed from the Kafka KEY with after=null
     (MessageConsumer.kt:32-38).
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from cdc_example_spark.operators.keyed_state import KeyedStateSink, KeyNotFoundError
from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
from tests.cdc_fixtures import envelope, row_image

UTC = dt.timezone.utc


def apply_batch(spark, sink, records):
    raw = spark.createDataFrame(records, "key STRING, value STRING")
    sink.apply_changes(route_changes(decode_envelope(raw)))


def rows_by_id(spark, sink):
    return {r["id"]: r.asDict() for r in sink.snapshot(spark).collect()}


@pytest.fixture()
def sink(tmp_path):
    return KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)


def test_s1_insert_update_delete_roundtrip(spark, sink):
    mid = str(uuid.uuid4())
    t0 = "2025-10-26T23:21:07.598794Z"
    t1 = "2025-10-26T23:22:11.000231Z"

    # insert: create_time == update_time (CdcApplicationTests.kt:25)
    apply_batch(spark, sink, [
        envelope("i", mid, after=row_image(mid, t0, t0, "hello", "alice")),
    ])
    state = rows_by_id(spark, sink)
    assert set(state) == {mid}
    assert state[mid]["create_time"] == state[mid]["update_time"]
    assert state[mid]["message"] == "hello"

    # update: same id, create_time preserved, update_time changed
    # (CdcApplicationTests.kt:35-37); full before image present
    # (REPLICA IDENTITY FULL, V1__init.sql:9)
    apply_batch(spark, sink, [
        envelope("u", mid,
                 before=row_image(mid, t0, t0, "hello", "alice"),
                 after=row_image(mid, t0, t1, "hello again", "alice")),
    ])
    state = rows_by_id(spark, sink)
    assert set(state) == {mid}
    assert state[mid]["create_time"] == dt.datetime(2025, 10, 26, 23, 21, 7, 598794)
    assert state[mid]["update_time"] == dt.datetime(2025, 10, 26, 23, 22, 11, 231)
    assert state[mid]["message"] == "hello again"

    # delete: after=null, key from Kafka key → row gone
    # (CdcApplicationTests.kt:42-43)
    apply_batch(spark, sink, [
        envelope("d", mid, before=row_image(mid, t0, t1, "hello again", "alice"), after=None),
    ])
    assert rows_by_id(spark, sink) == {}


def test_s2_last_write_wins_and_resurrection(spark, sink):
    mid = str(uuid.uuid4())
    other = str(uuid.uuid4())
    t0 = "2025-10-26T10:00:00.000000Z"

    # one micro-batch: insert + two updates + unrelated key — the later
    # LSN must win within the batch (intra-batch collapse)
    apply_batch(spark, sink, [
        envelope("i", mid, after=row_image(mid, t0, t0, "v1", "bob"), lsn=100),
        envelope("u", mid, after=row_image(mid, t0, t0, "v2", "bob"), lsn=200),
        envelope("u", mid, after=row_image(mid, t0, t0, "v3", "bob"), lsn=300),
        envelope("i", other, after=row_image(other, t0, t0, "x", "carol"), lsn=150),
    ])
    state = rows_by_id(spark, sink)
    assert state[mid]["message"] == "v3"
    assert state[other]["message"] == "x"

    # out-of-order arrival: stale LSN in a later batch must still win
    # *within its own batch only* — apply uses LSN order, not arrival
    apply_batch(spark, sink, [
        envelope("u", mid, after=row_image(mid, t0, t0, "v5", "bob"), lsn=500),
        envelope("u", mid, after=row_image(mid, t0, t0, "v4", "bob"), lsn=400),
    ])
    assert rows_by_id(spark, sink)[mid]["message"] == "v5"

    # delete then re-insert same key (resurrection,
    # MessageEventTestListener.kt:19-23)
    apply_batch(spark, sink, [envelope("d", mid, after=None, lsn=600)])
    assert mid not in rows_by_id(spark, sink)
    apply_batch(spark, sink, [
        envelope("i", mid, after=row_image(mid, t0, t0, "reborn", "bob"), lsn=700),
    ])
    state = rows_by_id(spark, sink)
    assert state[mid]["message"] == "reborn"
    assert state[other]["message"] == "x"


def test_s3_delete_and_insert_same_batch_collapses(spark, sink):
    mid = str(uuid.uuid4())
    t0 = "2025-10-26T10:00:00.000000Z"
    # insert then delete inside ONE batch → final outcome = absent
    apply_batch(spark, sink, [
        envelope("i", mid, after=row_image(mid, t0, t0, "temp", "dave"), lsn=100),
        envelope("d", mid, after=None, lsn=200),
    ])
    assert rows_by_id(spark, sink) == {}
    # delete of a never-seen key is a no-op, not an error
    apply_batch(spark, sink, [envelope("d", str(uuid.uuid4()), after=None)])
    assert rows_by_id(spark, sink) == {}


def test_crash_replay_batch_is_exactly_once(spark, sink):
    """foreachBatch redelivery (crash between sink write and checkpoint
    commit) must leave state equal to the once-applied fold —
    SURVEY.md §3.2.4: the reference is at-least-once; the sink claims
    exactly-once *effect*, so the claim gets a crash test.
    """
    mid = str(uuid.uuid4())
    other = str(uuid.uuid4())
    t0 = "2025-10-26T10:00:00.000000Z"
    batch1 = [
        envelope("i", mid, after=row_image(mid, t0, t0, "v1", "bob"), lsn=100),
        envelope("i", other, after=row_image(other, t0, t0, "x", "carol"), lsn=110),
    ]
    batch2 = [
        envelope("u", mid, after=row_image(mid, t0, t0, "v2", "bob"), lsn=200),
        envelope("d", other, after=None, lsn=210),
    ]

    def routed(records):
        raw = spark.createDataFrame(records, "key STRING, value STRING")
        return route_changes(decode_envelope(raw))

    sink.apply_changes(routed(batch1), batch_id=1)
    sink.apply_changes(routed(batch2), batch_id=2)
    expected = rows_by_id(spark, sink)
    assert expected[mid]["message"] == "v2" and other not in expected

    # replay WITH the batch id (the foreachBatch shape): high-watermark
    # makes redelivery a metadata no-op
    sink.apply_changes(routed(batch2), batch_id=2)
    assert rows_by_id(spark, sink) == expected
    assert sink.last_applied_batch_id() == 2

    # replay WITHOUT an id (marker unavailable): the re-merge itself
    # must be idempotent against post-batch state — same LSN winners,
    # same rows, and the redelivered delete of an absent key a no-op
    sink.apply_changes(routed(batch2))
    assert rows_by_id(spark, sink) == expected

    # double replay for good measure (at-least-once can redeliver twice)
    sink.apply_changes(routed(batch2))
    assert rows_by_id(spark, sink) == expected


def test_write_path_upsert_delete_semantics(spark, sink):
    """A12/A13: service-level upsert preserving create_time + delete."""
    now0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    reqs = spark.createDataFrame(
        [(None, "alice", "m1"), (None, "bob", "m2")],
        "id STRING, username STRING, message STRING",
    )
    sink.upsert_requests(reqs, now0)
    state = rows_by_id(spark, sink)
    assert len(state) == 2
    for row in state.values():
        assert row["create_time"] == row["update_time"] == now0

    # update one row: create_time preserved, update_time refreshed
    alice_id = next(i for i, r in state.items() if r["username"] == "alice")
    now1 = dt.datetime(2025, 1, 2, 9, 30, 0)
    upd = spark.createDataFrame(
        [(alice_id, "alice", "m1-edited")], "id STRING, username STRING, message STRING"
    )
    sink.upsert_requests(upd, now1)
    state = rows_by_id(spark, sink)
    assert state[alice_id]["create_time"] == now0
    assert state[alice_id]["update_time"] == now1
    assert state[alice_id]["message"] == "m1-edited"

    # update of missing id raises (MessageNotFoundException analog)
    bad = spark.createDataFrame(
        [(str(uuid.uuid4()), "eve", "nope")], "id STRING, username STRING, message STRING"
    )
    with pytest.raises(KeyNotFoundError):
        sink.upsert_requests(bad, now1)

    # delete by key
    sink.delete_keys(spark.createDataFrame([(alice_id,)], "id STRING"))
    state = rows_by_id(spark, sink)
    assert alice_id not in state and len(state) == 1


def test_merge_metric_fallback_on_statically_empty_plan(spark, sink, monkeypatch):
    """VERDICT r2 item 9: the `_merge` Observation fallback.

    Since the merge now runs under ``microbatch_conf`` (AQE off), the
    CollectMetrics node is no longer elided by AQE's empty-relation
    propagation and the metric read succeeds even for empty writes —
    asserted by the recording case below. The fallback stays as defense
    (a caller-tuned session or future optimizer rule could still elide
    the node), so the except branch is exercised by FORCING the metric
    read to raise and asserting the recount path still lands a clean
    no-op."""
    from pyspark.sql import Observation

    from cdc_example_spark.operators import keyed_state as KS

    outcome = {}

    class RaisingObservation(Observation):
        @property
        def get(self):
            outcome["raised"] = True
            raise RuntimeError("metric unavailable (forced)")

    monkeypatch.setattr(KS, "Observation", RaisingObservation)
    key = str(uuid.uuid4())
    sink.delete_keys(spark.createDataFrame([(key,)], "id STRING"))
    assert outcome == {"raised": True}, outcome
    assert rows_by_id(spark, sink) == {}

    # normal path: metric present and read cleanly, for the statically
    # empty write AND a runtime-empty deletes-only streaming batch
    class RecordingObservation(Observation):
        @property
        def get(self):
            v = Observation.get.fget(self)
            outcome["ok"] = True
            return v

    monkeypatch.setattr(KS, "Observation", RecordingObservation)
    outcome.clear()
    sink.delete_keys(spark.createDataFrame([(key,)], "id STRING"))
    assert outcome == {"ok": True}, outcome
    outcome.clear()
    apply_batch(spark, sink, [envelope("d", key, after=None)])
    assert outcome == {"ok": True}, outcome
    assert rows_by_id(spark, sink) == {}

    # a normal non-empty batch through the same instrumentation takes
    # the metric path (except branch is only for empty plans)
    outcome.clear()
    t = "2025-10-26T23:21:07.598794Z"
    apply_batch(spark, sink, [envelope("i", key, after=row_image(key, t, t, "hello", "alice"))])
    assert outcome == {"ok": True}, outcome
    assert set(rows_by_id(spark, sink)) == {key}

    # deletes-into-existing-state that EMPTY the state entirely are
    # runtime-empty again (kept anti-joins to zero rows) → AQE elides,
    # fallback runs — and must still remove the emptied bucket dirs
    outcome.clear()
    apply_batch(spark, sink, [envelope("d", key, after=None)])
    assert outcome in ({"ok": True}, {"raised": True}), outcome
    assert rows_by_id(spark, sink) == {}


def test_microbatch_conf_scopes_and_restores(spark):
    """microbatch_conf must set AQE off + narrow shuffles inside the
    scope and restore the session's values on BOTH exit paths — a
    leaked conf would silently re-profile every later batch query on
    the shared session."""
    from cdc_example_spark.operators.keyed_state import (
        MICROBATCH_SHUFFLE_PARTITIONS,
        microbatch_conf,
    )

    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    with microbatch_conf(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            MICROBATCH_SHUFFLE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts0

    try:
        with microbatch_conf(spark):
            raise RuntimeError("merge blew up")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts0


# ---------------------------------------------------------------------------
# AUTO bucket sizing (VERDICT r7 item 5): the default path starts at 8
# buckets, persists the count it hashed with, and grows by re-bucketing
# from the observed per-bucket state rows.
# ---------------------------------------------------------------------------


def _insert_records(n, tag=""):
    t = "2025-10-26T23:21:07.598794Z"
    return [
        envelope(
            "i",
            f"k{tag}{i:05d}",
            after=row_image(f"k{tag}{i:05d}", t, t, f"m{i}", "ann"),
            lsn=1000 + i,
            ts_ms=1000 + i,
        )
        for i in range(n)
    ]


def test_auto_bucket_count_resolves_and_persists(spark, tmp_path):
    from cdc_example_spark.operators.keyed_state import (
        AUTO_MIN_BUCKETS,
        LEGACY_DEFAULT_BUCKETS,
    )

    path = str(tmp_path / "state")
    s1 = KeyedStateSink(path=path)
    assert s1.num_buckets == AUTO_MIN_BUCKETS
    apply_batch(spark, s1, _insert_records(20))
    # the count the state was hashed with is persisted and resolved by
    # a fresh sink object (restart semantics)
    s2 = KeyedStateSink(path=path)
    assert s2.num_buckets == AUTO_MIN_BUCKETS
    assert len(rows_by_id(spark, s2)) == 20
    # an explicit matching count is accepted; a conflicting one fails
    # loud instead of silently mis-addressing every key
    KeyedStateSink(path=path, num_buckets=AUTO_MIN_BUCKETS)
    with pytest.raises(ValueError, match="bucketed"):
        KeyedStateSink(path=path, num_buckets=16)
    # legacy layout (state dirs, no meta file): resolves the historical
    # constructor default
    import os

    os.remove(os.path.join(path, "_num_buckets"))
    s3 = KeyedStateSink(path=path)
    assert s3.num_buckets == LEGACY_DEFAULT_BUCKETS or s3.num_buckets == AUTO_MIN_BUCKETS
    # (8 == min here only if exists() were False; state exists, so it
    # must be the legacy default)
    assert s3.num_buckets == LEGACY_DEFAULT_BUCKETS


def test_auto_bucket_growth_rebuckets_and_preserves_state(spark, tmp_path):
    from cdc_example_spark.operators.keyed_state import AUTO_MIN_BUCKETS

    path = str(tmp_path / "state")
    sink = KeyedStateSink(path=path, rows_per_bucket_target=25)
    assert sink._auto and sink.num_buckets == AUTO_MIN_BUCKETS
    # 600 keys over 8 buckets = 75 rows/bucket > 25 → grow; estimated
    # total 600 → next power of two with ≤25 rows/bucket is 32
    apply_batch(spark, sink, _insert_records(600))
    assert sink.num_buckets == 32, sink.num_buckets
    # state fully preserved through the re-bucket
    rows = rows_by_id(spark, sink)
    assert len(rows) == 600
    assert rows["k00007"]["message"] == "m7"
    # the grown count is persisted; a fresh object resolves it
    s2 = KeyedStateSink(path=path)
    assert s2.num_buckets == 32
    # addressing stays correct after growth: update + delete land on
    # the right keys through the new hash
    t2 = "2025-10-26T23:59:27.585446Z"
    apply_batch(spark, s2, [
        envelope("u", "k00007",
                 after=row_image("k00007", t2, t2, "edited", "ann"),
                 lsn=90_000, ts_ms=90_000),
        envelope("d", "k00008", after=None, lsn=90_001, ts_ms=90_001),
    ])
    rows = rows_by_id(spark, s2)
    assert rows["k00007"]["message"] == "edited"
    assert "k00008" not in rows and len(rows) == 599
    # growth is monotonic and idempotent: re-applying small traffic
    # does not shrink or re-bucket again
    apply_batch(spark, s2, _insert_records(5, tag="x"))
    assert s2.num_buckets == 32


def test_fused_apply_matches_scoped_two_job_shape(spark, tmp_path, monkeypatch):
    """r12 T3-margin shape: the one-job fused apply (filesystem bucket
    listing + in-plan semi-join + Observation-recovered touched set)
    must be semantics-identical to the two-job scoped shape on a mixed
    batch — including the delete that empties a bucket (its directory
    cleared in both) and untouched buckets never rewritten."""
    import glob as _glob
    import os as _os

    import cdc_example_spark.operators.keyed_state as KS

    t = "2025-10-26T23:59:27.585446Z"

    def seed(path):
        s = KeyedStateSink(path=path, num_buckets=8)
        apply_batch(spark, s, [
            envelope("i", f"seed{i:04d}",
                     after=row_image(f"seed{i:04d}", t, t, f"m{i}", "ann"),
                     lsn=100 + i, ts_ms=100 + i)
            for i in range(64)
        ])
        return s

    def mixed_batch(s):
        # a key alone in its bucket: find a bucket with exactly one
        # seed key and tombstone it (the empty-bucket cleanup case)
        from pyspark.sql import functions as F
        rows = s.snapshot(spark).select("id").collect()
        by_bucket = {}
        for r in rows:
            b = int(spark.range(1).select(
                F.lit(r["id"]).alias("k")).select(
                KS.KeyedStateSink._bucket(s, F.col("k"))).first()[0])
            by_bucket.setdefault(b, []).append(r["id"])
        lone = min(by_bucket.items(), key=lambda kv: (len(kv[1]), kv[0]))
        victims = lone[1]
        recs = [
            envelope("d", v, after=None, lsn=9000 + i, ts_ms=9000 + i)
            for i, v in enumerate(victims)
        ]
        # plus an update, an out-of-order LWW pair, and an insert
        recs += [
            envelope("u", "seed0001",
                     after=row_image("seed0001", t, t, "edited", "bob"),
                     lsn=9100, ts_ms=9100),
            envelope("u", "seed0002",
                     after=row_image("seed0002", t, t, "late-wins", "cat"),
                     lsn=9202, ts_ms=9202),
            envelope("u", "seed0002",
                     after=row_image("seed0002", t, t, "early-loses", "cat"),
                     lsn=9201, ts_ms=9201),
            envelope("i", "fresh001",
                     after=row_image("fresh001", t, t, "new", "dan"),
                     lsn=9300, ts_ms=9300),
        ]
        return recs, lone[0]

    # fused (default at 8 buckets)
    fused = seed(str(tmp_path / "fused"))
    recs, bucket_f = mixed_batch(fused)
    mt_before = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(_os.path.join(fused.path, "bucket=*", "*.parquet"))
    }
    apply_batch(spark, fused, recs)

    # scoped two-job (forced)
    monkeypatch.setattr(KS, "FUSED_APPLY_MAX_BUCKETS", -1)
    scoped = seed(str(tmp_path / "scoped"))
    recs2, bucket_s = mixed_batch(scoped)
    assert [r["key"] for r in recs2] == [r["key"] for r in recs]
    apply_batch(spark, scoped, recs2)
    monkeypatch.undo()

    a = rows_by_id(spark, fused)
    b = rows_by_id(spark, scoped)
    assert a == b
    assert a["seed0001"]["message"] == "edited"
    assert a["seed0002"]["message"] == "late-wins"
    assert "fresh001" in a
    # the emptied bucket's directory is cleared in BOTH shapes
    assert not _os.path.isdir(_os.path.join(fused.path, f"bucket={bucket_f}"))
    assert not _os.path.isdir(_os.path.join(scoped.path, f"bucket={bucket_s}"))
    # untouched buckets were not rewritten by the fused shape
    touched_dirs = set()
    from pyspark.sql import functions as F
    for r in recs:
        import json as _json
        kid = _json.loads(r["key"])["id"]
        tb = int(spark.range(1).select(F.lit(kid).alias("k")).select(
            KS.KeyedStateSink._bucket(fused, F.col("k"))).first()[0])
        touched_dirs.add(tb)
    untouched_checked = 0
    for f, mt in mt_before.items():
        bdir = int(f.split("bucket=")[1].split(_os.sep)[0])
        if bdir not in touched_dirs:
            assert _os.path.exists(f) and _os.path.getmtime(f) == mt, f
            untouched_checked += 1
    assert untouched_checked > 0


def test_fused_apply_short_circuits_empty_batches(spark, tmp_path):
    """ADVICE r12: an empty change batch on the fused tier must not
    execute the state-side plan or the dynamic-overwrite write job —
    multi-table routing hands every sink the batches that carry only
    other tables' rows. Pin: no state file is rewritten (set + mtimes
    identical), the exactly-once marker still advances, and a
    non-empty batch afterwards applies normally."""
    import glob as _glob
    import os as _os

    t = "2025-10-26T23:59:27.585446Z"
    s = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)
    apply_batch(spark, s, [
        envelope("i", f"k{i}", after=row_image(f"k{i}", t, t, f"m{i}", "a"),
                 lsn=10 + i, ts_ms=10 + i)
        for i in range(16)
    ])
    files_before = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(_os.path.join(s.path, "bucket=*", "*.parquet"))
    }
    assert files_before

    raw = spark.createDataFrame([], "key STRING, value STRING")
    assert s.apply_changes(
        route_changes(decode_envelope(raw)), batch_id=41, probe_empty=True
    ) is True
    assert s.last_applied_batch_id() == 41  # marker advanced

    files_after = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(_os.path.join(s.path, "bucket=*", "*.parquet"))
    }
    assert files_after == files_before  # nothing rewritten

    # and the sink still applies real work afterwards
    apply_batch(spark, s, [
        envelope("u", "k0", after=row_image("k0", t, t, "edited", "b"),
                 lsn=900, ts_ms=900),
    ])
    assert rows_by_id(spark, s)["k0"]["message"] == "edited"
