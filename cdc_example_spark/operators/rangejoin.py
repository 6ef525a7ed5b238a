"""Bucketed range (interval) join.

``left.point BETWEEN right.lo AND right.hi`` expressed as an equi-join:
Spark plans a raw inequality join as BroadcastNestedLoopJoin — every
left row scans the whole broadcast right side, the classic 100 TB
melter (plans/audit.py exists to catch exactly this). The standard
distributed encoding buckets the range dimension:

1. pick a bucket width ≥ the maximum interval length;
2. each right interval explodes to the (few) buckets it spans;
3. each left point maps to exactly one bucket;
4. equi-join on (keys…, bucket) — shuffle- or broadcast-hash, never
   nested-loop — then apply the exact BETWEEN as a post-filter.

Cost: |R| × (avg span / width + 1) exploded rows through a hash join,
against |L| × |R| for the nested loop. The bucket width is a knob, not
a correctness parameter — any width yields the same rows (pinned by
the q50 oracle hash-check); narrower widths trade explode factor
against join selectivity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Rows (l, r) with ``l[left_point] BETWEEN r[right_lo] AND
    r[right_hi]`` and equality on ``on``, as a bucketed equi-join.

    The range columns must be integer-like (cast timestamps to epoch
    micros first); ``bucket_width`` must be ≥ the longest interval for
    the explode factor to stay ≤ 2 (wider intervals still join
    correctly, they just explode to more buckets).
    """
    on = list(on)
    lb = left.withColumn("_bkt", F.floor(F.col(left_point) / F.lit(bucket_width)))
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor(F.col(right_hi) / F.lit(bucket_width)),
            )
        ),
    )
    joined = lb.join(rb, on=on + ["_bkt"], how=how).filter(
        F.col(left_point).between(F.col(right_lo), F.col(right_hi))
    )
    return joined.drop("_bkt")
