"""Property-based check of the CDC apply operator.

The reference pins last-write-wins materialization with delete-on-
tombstone and resurrection (MessageEventTestListener.kt:15-29). The
example-based S-tests replay its integration scenario; this test closes
the gap between "the scenario passes" and "the semantics hold": random
op sequences over a small key set, split at random micro-batch
boundaries (so intra-batch collapse, cross-batch ordering, delete-then-
reinsert, and repeated deletes all occur), must leave the bucket store
equal to a dict fold of the same sequence.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdc_example_spark.operators.keyed_state import KeyedStateSink

KEYS = [f"00000000-0000-0000-0000-00000000000{i}" for i in range(5)]
T0 = dt.datetime(2025, 10, 26, 23, 59, 27)

ROUTED = StructType(
    [
        StructField("key_id", StringType()),
        StructField("is_delete", BooleanType()),
        StructField(
            "after",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("create_time", TimestampType()),
                    StructField("update_time", TimestampType()),
                    StructField("message", StringType()),
                    StructField("username", StringType()),
                ]
            ),
        ),
        StructField("lsn", LongType()),
        StructField("ts_ms", LongType()),
    ]
)

# an op is (key_index, is_delete); LSNs are assigned by sequence position.
ops_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=len(KEYS) - 1), st.booleans()),
    min_size=1,
    max_size=14,
)
cuts_strategy = st.lists(st.integers(min_value=1, max_value=13), max_size=3, unique=True)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=ops_strategy, cuts=cuts_strategy)
def test_random_sequences_match_dict_model(spark, tmp_path_factory, ops, cuts):
    sink = KeyedStateSink(path=str(tmp_path_factory.mktemp("state")), num_buckets=4)

    rows, model = [], {}
    for seq, (ki, is_delete) in enumerate(ops):
        key = KEYS[ki]
        lsn = 1000 + 8 * seq
        if is_delete:
            rows.append((key, True, None, lsn, 1_761_523_268_027 + seq))
            model.pop(key, None)
        else:
            img = (
                key,
                T0,
                T0 + dt.timedelta(seconds=seq),
                f"msg-{seq}",
                f"user-{ki}",
            )
            rows.append((key, False, img, lsn, 1_761_523_268_027 + seq))
            model[key] = img

    bounds = sorted({c for c in cuts if c < len(rows)} | {len(rows)})
    start = 0
    for end in bounds:
        batch = spark.createDataFrame(rows[start:end], ROUTED)
        # deliver shuffled within the batch: correctness must come from
        # (lsn, ts_ms), never arrival order (SURVEY §4.2).
        sink.apply_changes(batch.orderBy(F.col("ts_ms").desc()))
        start = end

    got = {
        r["id"]: (r["id"], r["create_time"], r["update_time"], r["message"], r["username"])
        for r in sink.snapshot(spark).collect()
    }
    assert got == model
