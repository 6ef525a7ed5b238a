"""Z-order clustering: parquet-footer evidence that the Morton layout
prunes on BOTH dimensions where a 1-D sort cannot (operators/zorder.py,
q99's lake artifact)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.zorder import (
    file_envelopes,
    morton2,
    write_zordered,
)
from cdc_example_spark.sources.catalog import load_table

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    """lineitem written twice at the same file count: Z-ordered on
    (ship-day, partkey) vs 1-D range-sorted on ship date alone."""
    base = str(tmp_path_factory.mktemp("zorder"))
    li = load_table(spark, sf_dir, "lineitem", cache=False)
    zpath = os.path.join(base, "z")
    write_zordered(
        li,
        zpath,
        (
            F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")),
            F.col("l_partkey"),
        ),
        n_files=N_FILES,
    )
    lpath = os.path.join(base, "lin")
    (
        li.repartitionByRange(N_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return li, zpath, lpath


def _naive(v):
    """pyarrow reports TIMESTAMP_MICROS stats tz-aware (UTC-adjusted);
    Spark's agg rows are naive — strip tz for comparison."""
    return v.replace(tzinfo=None) if hasattr(v, "tzinfo") and v.tzinfo else v


def _hits(envs, col, lo, hi):
    """Files whose footer (min, max) envelope intersects [lo, hi] —
    exactly the files a stats-pruning scan must open."""
    n = 0
    for e in envs:
        emin, emax = e[col]
        if emin is None:
            n += 1  # no stats → cannot be skipped
        elif not (_naive(emax) < lo or _naive(emin) > hi):
            n += 1
    return n


def test_roundtrip_preserves_rows(spark, layouts):
    li, zpath, _ = layouts
    got = spark.read.parquet(zpath)
    assert got.count() == li.count()
    # decimal sums are associative (exact), so they are layout- and
    # partitioning-independent, unlike double sums
    probe = [
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
        F.sum("l_orderkey"),
    ]
    assert li.agg(*probe).first() == got.agg(*probe).first()
    assert len(os.listdir(os.path.dirname(zpath))) >= 1


def _avg_hit_frac(envs, col, lo, hi, n_bands=8, width_pct=10):
    """Mean fraction of files a scan must open, averaged over
    ``n_bands`` disjoint ``width_pct``-wide bands of [lo, hi] — a
    band-position-independent pruning metric (a single band can land
    on a curve split boundary and read unrepresentatively well or
    badly)."""
    span = hi - lo
    total = 0.0
    for i in range(n_bands):
        b_lo = lo + span * (i * width_pct) // 100
        b_hi = lo + span * (i * width_pct + width_pct) // 100
        total += _hits(envs, col, b_lo, b_hi) / len(envs)
    return total / n_bands


def test_second_dimension_prunes_only_under_zorder(spark, sf_dir, layouts):
    """The defining property: partkey-band predicates skip files under
    the Z-order layout, while the date-sorted layout smears partkey
    across EVERY file (nothing is ever skippable)."""
    li, zpath, lpath = layouts
    lo_k, hi_k = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    z_envs = file_envelopes(zpath, ["l_partkey"])
    l_envs = file_envelopes(lpath, ["l_partkey"])
    assert len(z_envs) == N_FILES and len(l_envs) == N_FILES
    z_frac = _avg_hit_frac(z_envs, "l_partkey", lo_k, hi_k)
    l_frac = _avg_hit_frac(l_envs, "l_partkey", lo_k, hi_k)
    # 1-D date sort: every file spans ~the whole key range — a key
    # predicate prunes (essentially) nothing
    assert l_frac >= 0.95, l_frac
    # Z-order: a 10%-wide key band reads well under 2/3 of the files
    # on average
    assert z_frac <= 0.65, (z_frac, l_frac)


def test_both_dimensions_stay_prunable(spark, sf_dir, layouts):
    """Z-order is a compromise, not a trade: the date dimension must
    ALSO still prune (a pure key sort would lose it entirely)."""
    li, zpath, _ = layouts
    lo_d, hi_d = li.agg(F.min("l_shipdate"), F.max("l_shipdate")).first()
    z_envs = file_envelopes(zpath, ["l_shipdate"])
    assert all(e["l_shipdate"][0] is not None for e in z_envs), (
        "timestamp footer stats missing — INT96 write leaked through"
    )
    z_frac = _avg_hit_frac(z_envs, "l_shipdate", lo_d, hi_d)
    assert z_frac <= 0.65, z_frac


def test_morton2_interleaves_bits(spark):
    # pure-Python oracle for the bit interleave
    from pyspark.sql import Row

    def py_morton(x, y):
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in cases])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton2(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == py_morton(x, y), (x, y)
