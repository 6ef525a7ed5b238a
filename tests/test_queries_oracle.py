"""t2-style correctness: every registered query vs its DuckDB oracle.

Runs at sf0.001 by default (fast dev loop); point
CDC_SPARK_TEST_SF_DIR at sf0.01 to reproduce the driver's tier.
Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from cdc_example_spark.queries import all_queries
from tests.oracle_harness import compare, duckdb_con

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    import os

    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    sf_scoped = q.oracle_sf and os.path.basename(os.path.normpath(sf_dir)) != q.oracle_sf
    if q.oracle is None or sf_scoped:
        # rows-only smoke: runs and has a schema (sf-scoped oracles —
        # q62's pinned-centroid SQL — only hold at the driver's tier;
        # point CDC_SPARK_TEST_SF_DIR at it to exercise them here)
        assert df.count() >= 0
        assert len(df.columns) > 0
    else:
        compare(df, con, q.oracle, name=name)


def test_q13_native_set_operators_match_fused(spark, sf_dir):
    # q13's registered plan (r4) derives all four cardinalities from one
    # per-key presence pass; this pins the native DataFrame set
    # operators (subtract / intersect / unionAll / union+distinct) to
    # the fused counts, so the §2.2 INTERSECT/EXCEPT rows stay exercised
    # on the Spark API surface too (DuckDB's oracle runs the genuine SQL
    # set operators on its side).
    from pyspark.sql import functions as F

    from cdc_example_spark.sources.catalog import load_table

    allc = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ordering = (
        load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    )
    fused = {r.tag: r.cnt for r in QUERIES["q13_set_ops"].spark(spark, sf_dir).collect()}
    assert allc.subtract(ordering).count() == fused["except"]
    assert allc.intersect(ordering).count() == fused["intersect"]
    assert allc.unionAll(ordering).count() == fused["union_all"]
    assert allc.union(ordering).distinct().count() == fused["union_distinct"]


def test_q38_hll_error_bound(spark, sf_dir):
    # The raw HLL++ estimates have no cross-engine oracle (q38's hashed
    # output carries exact counts + bound booleans instead); this test
    # asserts the error bound on the raw approx values directly:
    # |approx − exact| ≤ 3·rsd·exact (rsd = 0.05; 3σ is flake-proof).
    from pyspark.sql import functions as F

    from cdc_example_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_suppkey", rsd=0.05).alias("approx_supps"),
            F.countDistinct("l_suppkey").alias("exact_supps"),
        )
        .collect()
    )
    assert rows, "q38 returned no groups"
    for r in rows:
        for approx, exact in ((r.approx_parts, r.exact_parts), (r.approx_supps, r.exact_supps)):
            assert abs(approx - exact) <= max(1, 3 * 0.05 * exact), r
    # and the registered query's booleans must all be true
    q38 = QUERIES["q38_approx_distinct"].spark(spark, sf_dir).collect()
    assert all(r.parts_within_3sigma and r.supps_within_3sigma for r in q38)


def test_q41_approx_percentile_tracks_exact(spark, sf_dir):
    # the 100 TB percentile path is the t-digest sketch; pin it to the
    # exact answer within 1% relative (10k accuracy parameter).
    from pyspark.sql import functions as F

    from cdc_example_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    assert abs(r.approx - r.exact) <= 0.01 * abs(r.exact), r
