"""Z-order (Morton-curve) clustering for multi-dimension data skipping.

The lake-layout problem bucketing (sources/lake.py) does not solve:
a table range-partitioned or sorted on ONE column skips files only for
predicates on that column. Queries that box-filter on TWO dimensions
(ship date x part key, time x tenant, geo x time) read almost every
file under any 1-D order, because the second dimension is uniformly
smeared across the layout. Interleaving the bits of both dimensions
(the Morton / Z-order curve — the same layout Delta Lake's OPTIMIZE
ZORDER BY and Hudi clustering use) makes file-level min/max ranges
tight in BOTH dimensions at once, so a two-sided box predicate prunes
most files from the parquet footer stats alone, before any row is
decoded.

Scale shape: the curve value is pure per-row bit arithmetic (shifts /
masks, whole-stage codegen — no UDF), and the clustered write is one
``repartitionByRange`` on the curve value (a range exchange with
sampled boundaries — the same machinery as a global sort, but only
ever paid ONCE at write time, like the bucketed-lake shuffle). Reads
are ordinary parquet scans; the benefit arrives through the engine's
existing row-group/file skipping, so the operator composes with
everything else and nothing at read time is custom. Correctness is
layout-independent by construction — the query filters on the REAL
columns, never on the curve value — so any clustering decision here
(16-bit quantization, linear vs rank scaling) can only cost
clustering quality, never rows.

tests/test_zorder.py pins the claim with parquet-footer evidence:
the fraction of files whose (min,max) envelope intersects a 2-D box
is several times smaller under the Z-order layout than under a 1-D
sort of the same data into the same file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension (two 16-bit dims -> one 32-bit curve value).
_DIM_BITS = 16

# Bit-spreading masks for the classic shift-or-mask Morton encode:
# after the k-th step every source bit sits 2^k positions apart.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(col: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of a 32-bit word
    (b15..b0 -> 0b0..0 b15 0 b14 0 ... b1 0 b0), pure codegen ops."""
    x = col.bitwiseAND(F.lit((1 << _DIM_BITS) - 1))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns,
    16 bits each: result bit 2i is bit i of ``x``, bit 2i+1 is bit i of
    ``y``. Values past 2^16 wrap (documented clustering-quality-only
    effect; callers with wider dims should pre-scale into 16 bits)."""
    return _spread_bits(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(y.cast("long")), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: tuple[Column, Column],
    n_files: int = 64,
) -> None:
    """Cluster ``df`` on the Z-order curve of ``dims`` and write it as
    ``n_files`` parquet files at ``path``.

    Each dimension is first linearly rescaled to the FULL 16-bit range
    from its global (min, max) — one tiny extra aggregate job at write
    time. Without this, interleaving raw values with unequal magnitudes
    degenerates: a 12-bit day index against an 8-bit key would own
    every varying high curve bit and the "Z-order" would collapse to a
    1-D day sort. (Delta's OPTIMIZE ZORDER solves the same problem
    with range-partition ranks, which additionally immunizes against
    skewed value DISTRIBUTIONS; linear min/max scaling is the
    sampled-boundary-free version that is exact for the roughly
    uniform dims here — a heavily skewed dim should be rank-mapped by
    the caller first.)

    Then one range exchange on the curve value (sampled boundaries,
    balanced files) + an in-partition sort so each file covers a
    contiguous curve segment — that contiguity is what makes per-file
    min/max tight in both dimensions. The curve and staging columns
    are dropped before the write; the layout's value is entirely in
    the footer statistics of the real columns.
    """
    staged = df.withColumn("__d0", dims[0].cast("long")).withColumn(
        "__d1", dims[1].cast("long")
    )
    # bounded driver fetch: exactly four scalars, write-time only
    mm = staged.agg(
        F.min("__d0").alias("lo0"),
        F.max("__d0").alias("hi0"),
        F.min("__d1").alias("lo1"),
        F.max("__d1").alias("hi1"),
    ).first()
    full = (1 << _DIM_BITS) - 1

    def _scaled(col: str, lo: int, hi: int) -> Column:
        span = max(int(hi) - int(lo), 1)
        return F.floor(((F.col(col) - F.lit(int(lo))) * full) / F.lit(span))

    z = morton2(
        _scaled("__d0", mm["lo0"], mm["hi0"]),
        _scaled("__d1", mm["lo1"], mm["hi1"]),
    )
    # Spark's default parquet timestamp encoding is INT96, which
    # carries NO footer min/max statistics — a timestamp dim would be
    # silently unprunable, defeating the operator's entire purpose.
    # Scope TIMESTAMP_MICROS (stats-bearing, the modern encoding) to
    # this write and restore the session's setting after.
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            staged.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", "__d0", "__d1")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def file_envelopes(path: str, columns: list[str]) -> "list[dict]":
    """Per-file (min, max) envelopes for ``columns`` straight from the
    parquet footers (no data pages decoded) — the same statistics the
    engine's scan consults when it skips row groups. Used by the tests
    and by capacity planning; not on any query path."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        env: dict = {"file": os.path.basename(f)}
        for c in columns:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema != c or col.statistics is None:
                        continue
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
            env[c] = (lo, hi)
        out.append(env)
    return out
