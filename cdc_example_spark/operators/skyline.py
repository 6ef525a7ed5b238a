"""2-D skyline (Pareto frontier): min-price / max-size dominance.

The reference has no skyline operator (its only query surface is the
keyed CDC materialization, SURVEY.md §2.1); this is part of the
mandated batch/OLAP extension — "cheapest for their size" selection
(Börzsönyi et al., "The Skyline Operator", ICDE 2001).

Both shapes below consume a DISTINCT (price, size) pair table — the
caller collapses duplicates with a partial-aggregated groupBy first,
so the data-sized work never reaches the frontier pass — and emit the
same frontier rows, all other columns carried through:

- :func:`frontier_window` — ONE unpartitioned running-max window.
  Optimal when the distinct-pair table is dimension-bounded (prices ×
  sizes), but the single-partition sort is a scale hazard if the pair
  space explodes, so the window carries an EXECUTABLE cardinality
  guard (VERDICT r5 item 6): the same window pass counts the frame,
  and any row beyond ``max_rows`` raises instead of silently
  serializing a data-sized sort onto one task. The guard costs
  nothing — it reuses the frame the running max already sorted.
- :func:`frontier_partitioned` — the 100 TB shape: range-partition the
  pairs on the dominance sort order, run the running-max window PER
  PARTITION, then fix up across partitions with a prefix max over the
  per-partition summary (``num_partitions`` rows — driver-trivial).
  Correct because RangePartitioning orders partitions by the same
  (price asc, size desc) key as the window: the global sort prefix of
  a row is exactly (all earlier partitions) ∪ (local predecessors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _keep(prev_max: F.Column, sz: F.Column) -> F.Column:
    # A pair survives iff no predecessor in (price asc, size desc)
    # order has size >= its own; equal-price/equal-size rows were
    # collapsed by the caller's distinct, so predecessors are exactly
    # the candidate dominators.
    return prev_max.isNull() | (prev_max < sz)


def frontier_window(
    pairs: DataFrame,
    price_col: str,
    sz_col: str,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Single-window frontier with a runtime cardinality guard.

    ``max_rows`` bounds what one task is allowed to sort: the frame
    count rides the SAME window sort the running max needs (zero extra
    shuffle/scan), and crossing the bound raises a loud error naming
    the partitioned alternative. The guard lives inside the kept
    ``sz_col`` output expression so Catalyst cannot prune it away.
    """
    order = [F.col(price_col).asc(), F.col(sz_col).desc()]
    w_prev = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    guarded_sz = F.when(
        F.count(F.lit(1)).over(w_all) > max_rows,
        F.raise_error(
            F.lit(
                f"frontier_window: distinct ({price_col}, {sz_col}) pairs "
                f"exceed max_rows={max_rows}; use frontier_partitioned for "
                "high-cardinality pair spaces"
            )
        ).cast(pairs.schema[sz_col].dataType),
    ).otherwise(F.col(sz_col))
    return (
        pairs.withColumn("_prev_max", F.max(sz_col).over(w_prev))
        .withColumn(sz_col, guarded_sz)
        .filter(_keep(F.col("_prev_max"), F.col(sz_col)))
        .drop("_prev_max")
    )


def frontier_partitioned(
    pairs: DataFrame,
    price_col: str,
    sz_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Two-pass distributed frontier: per-range window + summary merge.

    Pass 1: range-partition on the dominance order and compute each
    row's running max WITHIN its partition. Pass 2: the per-partition
    max sizes (``num_partitions`` rows) get a prefix max over the
    partition index — a window over a partition-count-sized frame —
    and broadcast back; a row survives iff it beats both its local
    prefix and every earlier partition's max. No data-sized frame ever
    sorts on a single task, so this shape survives an adversarial
    pair-space blow-up (the q86 guard's named escape hatch).
    """
    order = [F.col(price_col).asc(), F.col(sz_col).desc()]
    ranged = pairs.repartitionByRange(num_partitions, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_prev_local", F.max(sz_col).over(w_local))
    # partition-count-sized summary: max size per range, prefix-maxed
    # in partition order (== global price order by RangePartitioning)
    w_buckets = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        local.groupBy("_pid")
        .agg(F.max(sz_col).alias("_bmax"))
        .withColumn("_prev_buckets", F.max("_bmax").over(w_buckets))
        .select("_pid", "_prev_buckets")
    )
    prev = F.greatest(F.col("_prev_local"), F.col("_prev_buckets"))
    return (
        local.join(F.broadcast(prefix), "_pid")
        .filter(_keep(prev, F.col(sz_col)))
        .drop("_pid", "_prev_local", "_prev_buckets")
    )
