"""Properties of the distributed Bloom filter (operators/bloom.py) the
q94 oracle cannot see: the no-false-negative guarantee (the correctness
load-bearing half — a FN would silently drop a true contamination),
the false-positive rate staying near the (m, k, n) closed form, and
the q94 plan shape (bloom probe filters BEFORE the confirm-join
exchange, so only survivors shuffle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.bloom import bloom_build, bloom_might_contain

M_BITS, K = 1 << 14, 4


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 2000).select(F.xxhash64("id").alias("h"))
    words = bloom_build(keys, "h", m_bits=M_BITS, k=K)
    misses = keys.filter(
        ~bloom_might_contain("h", words, m_bits=M_BITS, k=K)
    ).count()
    assert misses == 0


def test_bloom_fp_rate_near_closed_form(spark):
    n = 2000
    member = spark.range(0, n).select(F.xxhash64("id").alias("h"))
    words = bloom_build(member, "h", m_bits=M_BITS, k=K)
    # disjoint probe population: ids far outside the member range
    probes = spark.range(1_000_000, 1_050_000).select(
        F.xxhash64("id").alias("h")
    )
    fp = probes.filter(
        bloom_might_contain("h", words, m_bits=M_BITS, k=K)
    ).count()
    expected = (1.0 - math.exp(-K * n / M_BITS)) ** K
    # generous band: 5x the closed form plus a small absolute floor
    assert fp / 50_000 <= expected * 5 + 1e-3, (fp, expected)


def test_bloom_build_is_bounded_and_mergeable(spark):
    """Two disjoint shards OR-merge to the same bitmap as one build —
    the mergeable-summaries property that makes the build a partial
    agg at any scale."""
    a = spark.range(0, 500).select(F.xxhash64("id").alias("h"))
    b = spark.range(500, 1000).select(F.xxhash64("id").alias("h"))
    full = spark.range(0, 1000).select(F.xxhash64("id").alias("h"))
    wa = bloom_build(a, "h", m_bits=M_BITS, k=K)
    wb = bloom_build(b, "h", m_bits=M_BITS, k=K)
    wf = bloom_build(full, "h", m_bits=M_BITS, k=K)
    assert [x | y for x, y in zip(wa, wb)] == wf
    assert len(wf) == M_BITS // 64


def test_q94_probe_filter_precedes_confirm_join(spark, sf_dir):
    """The bloom probe must sit in the scan-side stage (a Filter with
    the xxhash64 probe chain BELOW the join), so the confirm join's
    input is already pruned — the entire point of the operator."""
    from cdc_example_spark.queries import all_queries

    df = all_queries()["q94_bloom_decontamination"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # probe expressions are inlined literals + xxhash64 chains inside a
    # Filter node; the join above it is broadcast (no SortMergeJoin for
    # the confirm at this tier)
    assert "xxhash64" in plan
    lines = plan.splitlines()
    filter_idx = [
        i for i, l in enumerate(lines) if "Filter" in l and "xxhash64" in l
    ]
    join_idx = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l]
    assert filter_idx, plan[:2000]
    assert join_idx, plan[:2000]
    # deeper in the tree = later lines in toString; the probe Filter
    # must appear below (after) the confirm join line
    assert min(join_idx) < max(filter_idx), plan[:3000]
