"""Skyline operator oracles: the guarded window refuses adversarial
pair cardinality, and the distributed two-pass frontier matches both a
pure-Python oracle and the window shape (VERDICT r5 item 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.skyline import (
    frontier_partitioned,
    frontier_window,
)


def _synthetic_pairs(spark, n: int):
    """Deterministic high-cardinality distinct (price, sz) pair table:
    price = id (all distinct), sz from a multiplicative hash — the
    adversarial shape where the pair space is data-sized, not
    dimension-bounded."""
    return spark.range(n).select(
        F.col("id").cast("double").alias("price"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(99991)).alias("sz"),
    )


def _py_frontier(rows):
    """Reference skyline: sort (price asc, sz desc), keep rows whose sz
    beats the running max of all predecessors."""
    out, best = [], None
    for price, sz in sorted(rows, key=lambda r: (r[0], -r[1])):
        if best is None or sz > best:
            out.append((price, sz))
            best = sz
    return sorted(out)


def test_frontier_partitioned_matches_python_oracle(spark):
    pairs = _synthetic_pairs(spark, 50_000)
    expected = _py_frontier(
        [(r["price"], r["sz"]) for r in pairs.collect()]
    )
    got = sorted(
        (r["price"], r["sz"])
        for r in frontier_partitioned(pairs, "price", "sz", num_partitions=8).collect()
    )
    assert got == expected and len(got) > 1


def test_frontier_window_matches_partitioned_and_carries_columns(spark):
    # extra column rides through both shapes unchanged
    pairs = _synthetic_pairs(spark, 5_000).withColumn(
        "tag", (F.col("sz") % 7).cast("long")
    )
    w = sorted(map(tuple, frontier_window(pairs, "price", "sz").collect()))
    p = sorted(
        map(tuple, frontier_partitioned(pairs, "price", "sz", 8).collect())
    )
    assert w == p and len(w) > 1 and len(w[0]) == 3


def test_frontier_window_guard_raises_past_max_rows(spark):
    """The cardinality bound is executable: a pair table over the
    budget fails LOUDLY instead of serializing a data-sized sort onto
    one task. (Py4J surfaces raise_error as a SparkRuntimeException —
    match on the message.)"""
    pairs = _synthetic_pairs(spark, 20_000)
    guarded = frontier_window(pairs, "price", "sz", max_rows=10_000)
    with pytest.raises(Exception, match="exceed max_rows=10000"):
        guarded.collect()
    # ...and the identical plan under the budget returns the frontier
    ok = frontier_window(pairs, "price", "sz", max_rows=20_000)
    assert ok.count() == len(
        _py_frontier([(r["price"], r["sz"]) for r in pairs.collect()])
    )


def test_frontier_partition_boundary_ties(spark):
    """Equal prices spanning range-partition boundaries must still see
    earlier same-price rows with larger sz as dominators: 1000 rows
    share 4 prices, forced through 8 range partitions."""
    pairs = spark.range(1_000).select(
        (F.col("id") % 4).cast("double").alias("price"),
        F.col("id").alias("sz"),
    ).distinct()
    expected = _py_frontier([(r["price"], r["sz"]) for r in pairs.collect()])
    got = sorted(
        (r["price"], r["sz"])
        for r in frontier_partitioned(pairs, "price", "sz", num_partitions=8).collect()
    )
    assert got == expected
