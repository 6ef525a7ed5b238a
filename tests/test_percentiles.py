"""Distributed exact percentiles (operators/percentiles).

The operator must reproduce np.percentile's linear interpolation
EXACTLY — it is the beyond-task-memory twin of q41's Arrow+np path
(which requires each group's full value stream to fit one task). Both
the bracket regime (n > accuracy) and the small-group full-histogram
regime (n ≤ accuracy) are exercised, plus the GK-vs-np rank-convention
shift that motivated the small-group rule (a ±1-rank skew at the
bracket edge).
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_example_spark.operators.percentiles import (
    grouped_exact_percentiles,
    grouped_exact_percentiles_bucketed,
)


def _check(spark, rows, specs, accuracy):
    """Both exact regimes — GK brackets and bucket brackets (the r7
    registered tier) — must reproduce np.percentile bit-for-bit on the
    same inputs."""
    df = spark.createDataFrame(rows, "g string, x double, y double")
    by_g: dict[str, tuple[list, list]] = {}
    for g, x, y in rows:
        by_g.setdefault(g, ([], []))[0].append(x)
        by_g.setdefault(g, ([], []))[1].append(y)
    for regime, out_df in (
        ("gk", grouped_exact_percentiles(df, "g", specs, accuracy=accuracy)),
        # small n_buckets on purpose: multi-bucket brackets and clamped
        # edges must exercise, not hide behind a wide B
        ("bucket", grouped_exact_percentiles_bucketed(df, "g", specs, n_buckets=64)),
        ("bucket_wide", grouped_exact_percentiles_bucketed(df, "g", specs)),
    ):
        out = {r["g"]: r for r in out_df.collect()}
        for g, (xs, ys) in by_g.items():
            for c, qs in specs:
                vals = xs if c == "x" else ys
                for q in qs:
                    key = f"{c}_p{int(q * 100)}"
                    got = out[g][key]
                    expect = float(np.percentile(vals, q * 100))
                    assert got == pytest.approx(expect, abs=1e-9), (
                        regime, g, key, got, expect,
                    )


def test_exactness_both_regimes_and_duplicates(spark):
    rng = np.random.default_rng(7)
    rows = []
    # group sizes straddle the accuracy=1000 regime boundary; y is a
    # heavy-duplication column (9 distinct values)
    for g, n in (("small", 137), ("mid", 999), ("big", 5000), ("huge", 20000)):
        xs = rng.normal(100, 25, n)
        ys = rng.integers(1, 10, n).astype(float)
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    _check(spark, rows, [("x", [0.5, 0.95]), ("y", [0.5])], accuracy=1000)


def test_rank_convention_edge(spark):
    # n=1205 / q=0.95 reproduced a real miss during development: GK's
    # φ·n rank convention sits one rank above np.percentile's (n−1)·q,
    # outside a naive margin. With n ≤ accuracy the group takes the
    # full-histogram path and must still be exact.
    rng = np.random.default_rng(11)
    xs = rng.normal(0, 1, 1205)
    rows = [("b", float(x), 0.0) for x in xs]
    _check(spark, rows, [("x", [0.5, 0.95])], accuracy=10_000)


def test_single_row_and_constant_groups(spark):
    rows = [("s", 5.0, 0.0)] + [("c", 1.0, 0.0)] * 3
    _check(spark, rows, [("x", [0.5, 0.95])], accuracy=100)


@pytest.fixture(params=["gk", "bucket"])
def op(request):
    if request.param == "gk":
        return lambda df, g, specs: grouped_exact_percentiles(df, g, specs, accuracy=100)
    return lambda df, g, specs: grouped_exact_percentiles_bucketed(df, g, specs, n_buckets=64)


def test_null_values_excluded_and_all_null_group_kept(spark, op):
    # SQL semantics (ADVICE r3): NULLs never contribute to a percentile,
    # and a group whose column is ENTIRELY NULL must keep its row with a
    # NULL percentile — not silently vanish (the r4 re-anchor on the
    # pass-1 group list).
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("allnull", None), ("allnull", None)],
        "g string, x double",
    )
    out = {r["g"]: r for r in op(df, "g", [("x", [0.5])]).collect()}
    assert out["a"]["x_p50"] == pytest.approx(2.0)
    assert "allnull" in out, "all-NULL group row must survive"
    assert out["allnull"]["x_p50"] is None


def test_null_group_key_keeps_computed_values(spark, op):
    # ADVICE r4 (medium): a NULL group key is a legitimate SQL GROUP BY
    # group. Plain `[g]` joins are not null-safe, so the NULL group's
    # rows (a) never met their bracket row in the classify join and
    # (b) lost their computed percentiles in the re-anchor left join.
    # Every join in the operator must be eqNullSafe.
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 3.0), ("a", 10.0), ("a", 30.0)],
        "g string, x double",
    )
    out = {r["g"]: r for r in op(df, "g", [("x", [0.5])]).collect()}
    assert out[None]["x_p50"] == pytest.approx(2.0), "NULL group must keep real values"
    assert out["a"]["x_p50"] == pytest.approx(20.0)


def test_duplicate_specs_raise(spark):
    # ADVICE r4 (low): per-column aliases collide on a repeated column
    # and pairs.index() maps duplicate (c, q) to the first occurrence —
    # fail loudly instead of producing an AnalysisException downstream.
    df = spark.createDataFrame([("a", 1.0, 0.0)], "g string, x double, y double")
    for fn in (grouped_exact_percentiles, grouped_exact_percentiles_bucketed):
        with pytest.raises(ValueError, match="multiple specs entries"):
            fn(df, "g", [("x", [0.5]), ("x", [0.9])])
        with pytest.raises(ValueError, match="duplicate quantiles"):
            fn(df, "g", [("x", [0.5, 0.5])])


def test_mixed_null_column_with_values_elsewhere(spark, op):
    # one column all-NULL in one group while the OTHER column has data
    # there: the group row must carry the real percentile and the NULL
    # side by side.
    df = spark.createDataFrame(
        [("g1", None, 10.0), ("g1", None, 20.0), ("g2", 7.0, 1.0)],
        "g string, x double, y double",
    )
    out = {r["g"]: r for r in op(df, "g", [("x", [0.5]), ("y", [0.5])]).collect()}
    assert out["g1"]["x_p50"] is None
    assert out["g1"]["y_p50"] == pytest.approx(15.0)
    assert out["g2"]["x_p50"] == pytest.approx(7.0)


# ---------------------------------------------------------------------------
# property test: the bucket regime's exactness must not depend on the
# value distribution (its STATE bound does, its exactness must not) —
# heavy duplication, extreme outliers stretching the bucket range, and
# sub-bucket mass concentration all land here.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    st.sampled_from([0.0, 1.0, 1.0, 1.0, 1e-12, 1e6]),  # duplication + outlier
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    groups=st.lists(
        st.lists(_vals, min_size=1, max_size=40), min_size=1, max_size=4
    ),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.95, 1.0]),
)
def test_bucket_regime_exact_on_adversarial_distributions(spark, groups, q):
    rows = [
        (f"g{i}", float(v), 0.0) for i, vs in enumerate(groups) for v in vs
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["g"]: r["x_p50" if q == 0.5 else f"x_p{int(q * 100)}"]
        for r in grouped_exact_percentiles_bucketed(
            df, "g", [("x", [q])], n_buckets=16
        ).collect()
    }
    for i, vs in enumerate(groups):
        expect = float(np.percentile(vs, q * 100))
        assert out[f"g{i}"] == pytest.approx(expect, abs=1e-9), (i, q)


# ---------------------------------------------------------------------------
# Executable tier choice (VERDICT r7 item 7): the guard must MEASURE
# the bucket tier's histogram occupancy and route mass-concentrated
# distributions to GK, uniform ones to the bucket tier — and the auto
# wrapper must stay np.percentile-exact on both.
# ---------------------------------------------------------------------------


def test_tier_guard_routes_by_measured_occupancy(spark):
    from cdc_example_spark.operators.percentiles import (
        bucket_tier_occupancy,
        choose_percentile_tier,
        grouped_exact_percentiles_auto,
    )

    rng = np.random.default_rng(23)
    # uniform mass: bracket buckets carry ~n/B rows → bucket tier
    uni_rows = [("a", float(x), 0.0) for x in rng.uniform(0, 1000, 8000)]
    # adversarial mass: 99% of values identical at 0 with a 1e9 outlier
    # tail — the median's bracket bucket holds ~99% of all rows, the
    # documented bucket-tier degeneracy
    adv_rows = (
        [("a", 0.0, 0.0)] * 7920
        + [("a", float(x), 0.0) for x in rng.uniform(1e8, 1e9, 80)]
    )
    specs = [("x", [0.5, 0.95])]

    uni = spark.createDataFrame(uni_rows, "g string, x double, y double")
    adv = spark.createDataFrame(adv_rows, "g string, x double, y double")

    h_u, n_u = bucket_tier_occupancy(uni, "g", specs)
    h_a, n_a = bucket_tier_occupancy(adv, "g", specs)
    assert n_u == 16000 and n_a == 16000  # 2 pairs × 8000 non-null rows
    assert h_u <= 0.05 * n_u, (h_u, n_u)
    assert h_a > 0.4 * n_a, (h_a, n_a)
    assert choose_percentile_tier(uni, "g", specs) == "bucket"
    assert choose_percentile_tier(adv, "g", specs) == "gk"

    # the dispatch changes COST only, never the value
    for rows, df in ((uni_rows, uni), (adv_rows, adv)):
        out = grouped_exact_percentiles_auto(df, "g", specs).collect()[0]
        vals = [x for _, x, _ in rows]
        for q in (0.5, 0.95):
            expect = float(np.percentile(vals, q * 100))
            assert out[f"x_p{int(q * 100)}"] == pytest.approx(expect, abs=1e-6)


def test_tier_guard_occupancy_matches_registered_geometry(spark):
    """The estimator replays grouped_exact_percentiles_bucketed's exact
    bucket geometry: on a distribution where the bracket range spans
    the whole table (2 rows, B buckets), occupancy must be total."""
    from cdc_example_spark.operators.percentiles import bucket_tier_occupancy

    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 1.0, 0.0)], "g string, x double, y double"
    )
    h, n = bucket_tier_occupancy(df, "g", [("x", [0.5])], n_buckets=64)
    # median of 2 rows interpolates between bucket 0 and bucket 63:
    # the global range covers both rows
    assert (h, n) == (2, 2)
