"""Property-based check of the as-of join encoding.

The union-merge encoding (operators/asof.py) replaces a per-left-row
argmax over a range join; this test closes the gap between "q48 matches
DuckDB on the events table" and "the encoding is correct": random
left/right timestamp multisets per key — including collisions between
and within sides, keys existing on only one side, and NULL payload
values — must match a brute-force Python model of the inclusive
most-recent-match rule with greatest-tiebreak resolution.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_example_spark.operators.asof import asof_join

ts = st.integers(min_value=0, max_value=20)
left_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), ts), min_size=1, max_size=10
)
right_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), ts, st.booleans()),
    min_size=0,
    max_size=10,
)


def model_asof(left, right):
    """Brute force: greatest (t, rid) right row with t <= left t, same key."""
    out = {}
    for li, (lk, lt) in enumerate(left):
        best = None
        for rid, (rk, rt, _null) in enumerate(right):
            if rk == lk and rt <= lt:
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
        out[li] = best[1] if best is not None else None
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(left=left_strategy, right=right_strategy)
def test_asof_matches_bruteforce_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        [(i, k, t, None if null else float(i)) for i, (k, t, null) in enumerate(right)],
        "rid long, k long, t long, payload double",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            ldf, rdf.select("k", "t", "rid", "payload"),
            on=["k"], left_ts="t", right_ts="t", tiebreak="rid",
        ).collect()
    }
    expected = model_asof(left, right)
    assert got == expected
    # and the null-payload transport: a matched row's payload must be
    # the model row's payload, null or not
    for r in asof_join(
        ldf, rdf.select("k", "t", "rid", "payload"),
        on=["k"], left_ts="t", right_ts="t", tiebreak="rid",
    ).collect():
        rid = expected[r["lid"]]
        if rid is None:
            assert r["payload"] is None
        else:
            want = None if right[rid][2] else float(rid)
            assert r["payload"] == want
