"""ANN index-health monitor: per-cell occupancy drift of a persisted
IVF layout vs its training-time distribution (VERDICT r10 item 6).

An IVF index degrades silently: the centroids were trained on a
snapshot, and as CDC/ingest shifts the corpus, vectors pile into a few
cells (probe cost and recall both degrade — a probed cell no longer
holds ~TARGET_CELL_SIZE vectors) while others go dead (wasted
directories). The monitor ties the q91 PSI discipline to the index's
own persisted cell assignments: compare the CURRENT per-cell occupancy
distribution against the TRAINING-ERA one, over the full k1 × k2 cell
universe (a cell nothing maps to anymore is exactly the signal — it
must appear as a row, so the universe is enumerated, not grouped-from-
data), and flag when a retrain (``lloyd_refine`` / the ``ivf2_upsert``
rebuild cadence) is due.

Scale shape: one scan of the index layout bounded by a k1·k2-cell
partial-agg'd groupBy, and everything after operates on that
cell-count frame — at 65536 cells the monitor's frame is 64k rows
regardless of corpus size. When a reference predicate must be
evaluated (q116's era cut), the ONE scan reading that column is the
floor: splitting n_cur to a footer-priced pass was measured 2.9×
slower at the k=100 shard, because ivf2_shape_for keeps cells small
so the layout is many small files and the cost is file opens, not
column bytes (SCALE.md §4b-r13). When NO data column is needed at all
— the streaming monitor's reference counts come from persisted meta —
:func:`footer_cell_counts` answers the whole frame from parquet
footers and wins (one-pass A/B at k=100: p50 0.55 s vs 0.76 s).

Determinism (the q91/q109 contract): counts are exact integers, the
Laplace-smoothed shares are ratios of those integers (identical
doubles on any engine), ln() runs on those ratios, and only the
emitted psi columns are rounded. The occupancy flags are pure integer
comparisons (``n_cur · n_cells > factor · total_cur``) — no float
threshold can flip across engines.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PSI_RETRAIN_THRESHOLD = 0.2  # the conventional "investigate" line (q91)
OVERLOAD_FACTOR = 4  # a cell holding >4× the mean share is overloaded


def _dec(col: F.Column, digits: int) -> F.Column:
    return F.round(col.cast("decimal(28,10)"), digits).cast("double")


@contextmanager
def parquet_footer_aggregates(spark):
    """Scope in which parquet answers pushable aggregates from footers:
    the V2 parquet source (the default V1 ignores the conf) with
    ``spark.sql.parquet.aggregatePushdown`` on. Both confs are restored
    on exit — the flip is session-scoped, so keep the window to one
    driver-side read-and-collect.

    Serialized on the package's session-conf lock (the same RLock
    ``microbatch_conf`` holds): two streams sharing one session — e.g.
    two ``materialize_with_monitored_index`` topics, or a monitor
    running beside a merge's conf scope — would otherwise interleave
    set/restore and leak the V2+pushdown profile into the session
    permanently (snapshot-the-other-scope's-flipped-value, the exact
    failure keyed_state documents for its own scope)."""
    from cdc_example_spark.operators.keyed_state import (
        _MICROBATCH_CONF_LOCK as _conf_lock,
    )

    v1_key = "spark.sql.sources.useV1SourceList"
    agg_key = "spark.sql.parquet.aggregatePushdown"
    with _conf_lock:
        prev_v1 = spark.conf.get(v1_key)
        prev_agg = spark.conf.get(agg_key)
        try:
            spark.conf.set(
                v1_key,
                ",".join(
                    s for s in prev_v1.split(",")
                    if s.strip().lower() != "parquet"
                ),
            )
            spark.conf.set(agg_key, "true")
            yield
        finally:
            spark.conf.set(v1_key, prev_v1)
            spark.conf.set(agg_key, prev_agg)


def footer_cell_counts(
    spark,
    path: str,
    coarse_col: str = "coarse",
    fine_col: str = "fine",
) -> "list[list[int]]":
    """Per-cell row counts of a persisted layout, answered from parquet
    FOOTERS — no data column is read (VERDICT r12 item 3: the monitor
    was column-priced because ``count("vec_id")`` forces reading the id
    column from every file; ``count(*)`` grouped by partition columns
    needs only the row counts every footer already carries).

    Spark pushes a grouped ``COUNT(*)`` into row-group metadata only on
    the V2 parquet source with ``spark.sql.parquet.aggregatePushdown``
    on; the default V1 source silently ignores the conf. Both confs are
    flipped for exactly this driver-side collect and restored in a
    ``finally`` (the flip is session-scoped, and every caller —
    foreachBatch monitors, query construction — runs it sequentially on
    the driver). The plan is pinned in tests/test_index_health.py:
    ``PushedAggregation: [COUNT(*)]`` + ``PushedGroupBy`` with no data
    column in ReadSchema.

    The collect is cell-bounded (≤ one row per occupied cell) and the
    result is sorted ``[coarse, fine, n]`` triples — the shape
    ``_write_layout_meta`` persists as ``ref_counts``.
    """
    with parquet_footer_aggregates(spark):
        rows = (
            spark.read.parquet(path)
            .groupBy(
                F.col(coarse_col).cast("int").alias(coarse_col),
                F.col(fine_col).cast("int").alias(fine_col),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    return sorted([int(r[0]), int(r[1]), int(r[2])] for r in rows)




def ivf_occupancy_psi(
    assignments: DataFrame,
    ref_cond: F.Column,
    n_coarse: int,
    n_fine: int,
    coarse_col: str = "coarse",
    fine_col: str = "fine",
    smoothing: float = 0.5,
    overload_factor: int = OVERLOAD_FACTOR,
    psi_threshold: float = PSI_RETRAIN_THRESHOLD,
) -> DataFrame:
    """Per-cell occupancy drift of an IVF(2) layout.

    ``assignments`` is one row per indexed vector carrying its cell
    (``coarse_col``, ``fine_col``) — typically
    ``spark.read.parquet(index_path)``, where both are partition
    columns; ``ref_cond`` selects the TRAINING-ERA sub-population (the
    rows that existed when the centroids were trained — an id
    watermark, an ingest-date cut, a retrain snapshot). The current
    distribution is all rows.

    Returns one row per cell of the FULL k1 × k2 universe, ordered by
    (coarse, fine):

    - ``n_ref`` / ``n_cur`` — exact occupancy counts (BIGINT);
    - ``psi_term`` — this cell's smoothed PSI contribution (6 dp);
    - ``psi_total`` — the index-wide PSI, identical on every row (4 dp,
      the q91 rounding);
    - ``dead`` — nothing maps here anymore (n_cur = 0);
    - ``overloaded`` — n_cur·n_cells > overload_factor·total_cur
      (integer arithmetic, > overload_factor× the mean share);
    - ``retrain_due`` — psi_total > psi_threshold.
    """
    counts = (
        assignments.groupBy(
            F.col(coarse_col).cast("int").alias(coarse_col),
            F.col(fine_col).cast("int").alias(fine_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_cur"),
            F.sum(F.when(ref_cond, 1).otherwise(0)).alias("n_ref"),
        )
    )
    return occupancy_psi_from_counts(
        counts,
        n_coarse,
        n_fine,
        coarse_col=coarse_col,
        fine_col=fine_col,
        smoothing=smoothing,
        overload_factor=overload_factor,
        psi_threshold=psi_threshold,
    )


def occupancy_psi_from_counts(
    counts: DataFrame,
    n_coarse: int,
    n_fine: int,
    coarse_col: str = "coarse",
    fine_col: str = "fine",
    smoothing: float = 0.5,
    overload_factor: int = OVERLOAD_FACTOR,
    psi_threshold: float = PSI_RETRAIN_THRESHOLD,
) -> DataFrame:
    """The PSI core over an already-aggregated cell-count frame.

    ``counts`` carries one row per OCCUPIED cell with exact ``n_ref``
    (training-era occupancy) and ``n_cur`` (current occupancy) BIGINTs;
    cells absent from it are zero in both eras. :func:`ivf_occupancy_psi`
    derives it from per-vector assignments; the CDC retrain loop
    (streaming/index_maintenance.py) derives it from a version's
    persisted reference counts + one partition-column scan — same
    math, same flags, same determinism contract either way.
    """
    n_cells = n_coarse * n_fine
    universe = (
        counts.sparkSession.range(n_cells)
        .select(
            F.floor(F.col("id") / n_fine).cast("int").alias(coarse_col),
            (F.col("id") % n_fine).cast("int").alias(fine_col),
        )
    )
    # Shape guard: a cell outside the declared universe means the
    # caller is monitoring a layout with the wrong (n_coarse, n_fine)
    # — the left join below would silently drop those rows from both
    # counts and totals, reporting a healthy index over partial data.
    # The check runs on the already-cell-bounded count frame (≤ one
    # row per occupied cell), never the corpus.
    stray = counts.filter(
        (F.col(coarse_col) < 0)
        | (F.col(coarse_col) >= n_coarse)
        | (F.col(fine_col) < 0)
        | (F.col(fine_col) >= n_fine)
    ).limit(1).collect()
    if stray:
        r = stray[0]
        raise ValueError(
            f"ivf_occupancy_psi: assignment cell ({r[coarse_col]}, "
            f"{r[fine_col]}) lies outside the declared {n_coarse}x{n_fine} "
            "universe — the layout's shape does not match n_coarse/n_fine"
        )
    # Broadcast the COUNT side: it is cell-bounded (≤ one row per
    # occupied cell) and, unlike the universe, it sits on the
    # non-preserved side of this left-outer join — a broadcast hint on
    # the preserved (left) side is invalid for LeftOuter (BuildLeft)
    # and Spark silently ignores it (ADVICE r11: the inert-hint
    # failure mode). Broadcasting counts keeps the join shuffle-free
    # AND honored.
    cells = (
        universe
        .join(F.broadcast(counts), [coarse_col, fine_col], "left")
        .select(
            coarse_col,
            fine_col,
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    wall = Window.partitionBy()
    tot_ref = F.sum("n_ref").over(wall)
    tot_cur = F.sum("n_cur").over(wall)
    p_ref = (F.col("n_ref") + F.lit(smoothing)) / (
        tot_ref + F.lit(float(n_cells) * smoothing)
    )
    p_cur = (F.col("n_cur") + F.lit(smoothing)) / (
        tot_cur + F.lit(float(n_cells) * smoothing)
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        cells.select(
            coarse_col,
            fine_col,
            "n_ref",
            "n_cur",
            _dec(term, 6).alias("psi_term"),
            _dec(F.sum(term).over(wall), 4).alias("psi_total"),
            (F.col("n_cur") == 0).alias("dead"),
            (
                F.col("n_cur") * F.lit(n_cells)
                > F.lit(overload_factor) * tot_cur
            ).alias("overloaded"),
            (
                _dec(F.sum(term).over(wall), 4) > F.lit(psi_threshold)
            ).alias("retrain_due"),
        )
        .orderBy(coarse_col, fine_col)
    )
