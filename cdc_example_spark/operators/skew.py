"""Skew-resistant equi-join via key salting.

When one join key holds a disproportionate share of the rows, a plain
shuffle hash/sort-merge join sends that key's entire volume to ONE
reducer — the straggler that turns a 10-minute cluster job into a
4-hour one. Two standard remedies:

- AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  this engine's scale profile): splits oversized partitions at runtime.
  Works only for sort-merge joins and only after the skewed shuffle
  files already exist.
- Explicit salting (this operator): route the skewed side's rows to
  ``salt_factor`` reducers up front by appending a salt to the join
  key, and replicate the other side once per salt value. Predictable,
  plan-time, works for any join strategy; costs |right| × salt_factor
  replicated rows, so salt the side that is big-and-skewed against the
  side that is small-enough-to-replicate (but too big to broadcast —
  otherwise just broadcast it).

The result set is identical for any salt value or factor (each left
row meets exactly the right rows sharing its natural key, whatever
salt it drew) — pinned by the equality test in pytest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys fan out over
    ``salt_factor`` reducers and ``other`` is replicated to meet them.

    ``how`` supports the join types where replication is sound for the
    skewed side ("inner", "left"); a right/full join against a
    replicated side would duplicate unmatched right rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    s = skewed.withColumn("_salt", F.floor(F.rand(seed) * salt_factor).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return s.join(o, on=on + ["_salt"], how=how).drop("_salt")
