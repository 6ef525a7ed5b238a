"""Property-based check of the incremental aggregate (S8).

The example tests pin specific shapes (group moves, redelivery, crash
recovery); this closes the generalization gap: random op sequences over
a small key set with VARYING group assignment and message length, cut
at random micro-batch boundaries, must leave the incrementally
maintained aggregate equal to a dict-model groupBy of the final base
state — the IVM invariant "incremental ≡ recompute" under arbitrary
interleavings of insert/update/move/delete.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_example_spark.operators.incremental_agg import IncrementalAggSink
from cdc_example_spark.operators.keyed_state import KeyedStateSink
from tests.test_cdc_apply_property import ROUTED, KEYS, T0

GROUPS = ["alice", "bob", "carol"]

# an op: (key_index, is_delete, group_index, message_length)
ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=len(KEYS) - 1),
        st.booleans(),
        st.integers(min_value=0, max_value=len(GROUPS) - 1),
        st.integers(min_value=0, max_value=9),
    ),
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
def test_incremental_agg_equals_model_recompute(spark, tmp_path_factory, ops, cuts):
    base = tmp_path_factory.mktemp("ivm")
    state = KeyedStateSink(path=str(base / "state"), num_buckets=4)
    agg = IncrementalAggSink(path=str(base / "agg"))

    rows, model = [], {}
    for seq, (ki, is_delete, gi, mlen) in enumerate(ops):
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
                "m" * mlen,
                GROUPS[gi],
            )
            rows.append((key, False, img, lsn, 1_761_523_268_027 + seq))
            model[key] = img

    bounds = sorted({c for c in cuts if c < len(rows)} | {len(rows)})
    start = 0
    for batch_id, end in enumerate(bounds, start=1):
        batch = spark.createDataFrame(rows[start:end], ROUTED)
        agg.apply_changes(batch, state.snapshot(spark), batch_id=batch_id)
        state.apply_changes(batch, batch_id=batch_id)
        start = end

    expected: dict[str, tuple[int, int]] = {}
    for _, _, _, msg, user in model.values():
        n, v = expected.get(user, (0, 0))
        expected[user] = (n + 1, v + len(msg))
    got = {
        r.group_key: (r.n_rows, r.sum_val)
        for r in agg.snapshot(spark).collect()
    }
    assert got == expected
