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
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke: runs and has a schema
        assert len(df.columns) > 0
    else:
        compare(df, con, q.oracle, name=name)


def test_q38_hll_error_bound(spark, sf_dir):
    # approx_count_distinct has no cross-engine oracle; its contract is
    # the HLL++ error bound instead: |approx − exact| ≤ 3·rsd·exact
    # (rsd defaults to 0.05; 3σ makes the assertion flake-proof).
    rows = QUERIES["q38_approx_distinct"].spark(spark, sf_dir).collect()
    assert rows, "q38 returned no groups"
    for r in rows:
        for approx, exact in ((r.approx_parts, r.exact_parts), (r.approx_supps, r.exact_supps)):
            assert abs(approx - exact) <= max(1, 3 * 0.05 * exact), r


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
