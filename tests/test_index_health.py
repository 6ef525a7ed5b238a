"""operators/index_health — per-cell occupancy PSI of an IVF layout.

The q116 oracle pins cross-engine parity on the driver tables (where
the fixture corpus has no real drift, so every flag is false); these
tests synthesize drift so the flag arithmetic itself is exercised:
dead cells, the integer-arithmetic overload line, the PSI recompute,
and the full-universe row contract.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.index_health import ivf_occupancy_psi


def _assignments(spark, rows):
    # rows: (vec_id, coarse, fine)
    return spark.createDataFrame(rows, "vec_id long, coarse int, fine int")


def test_drifted_index_flags_and_psi_recompute(spark):
    # training era (vec_id < 100): 30 vectors spread over 3 of 4 cells;
    # ingest since: 60 more vectors ALL piling into cell (1, 1), which
    # the training era never used
    rows = []
    vid = 0
    for cell, n in (((0, 0), 10), ((0, 1), 10), ((1, 0), 10)):
        for _ in range(n):
            rows.append((vid, *cell))
            vid += 1
    for _ in range(60):
        rows.append((100 + vid, 1, 1))
        vid += 1
    # overload_factor=2: with only 4 cells the default 4× mean share
    # equals the whole index — unreachable by construction
    out = ivf_occupancy_psi(
        _assignments(spark, rows),
        F.col("vec_id") < 100,
        n_coarse=2,
        n_fine=2,
        overload_factor=2,
    ).collect()

    # full-universe contract: every (coarse, fine) cell is a row,
    # ordered
    assert [(r.coarse, r.fine) for r in out] == [(0, 0), (0, 1), (1, 0), (1, 1)]
    by_cell = {(r.coarse, r.fine): r for r in out}
    assert [(r.n_ref, r.n_cur) for r in out] == [
        (10, 10), (10, 10), (10, 10), (0, 60)
    ]

    # NumPy-free PSI recompute with the same smoothing
    def share(n, tot):
        return (n + 0.5) / (tot + 4 * 0.5)

    want_psi = sum(
        (share(c, 90) - share(r, 30)) * math.log(share(c, 90) / share(r, 30))
        for r, c in ((10, 10), (10, 10), (10, 10), (0, 60))
    )
    assert out[0].psi_total == pytest.approx(round(want_psi, 4), abs=1e-9)
    assert len({r.psi_total for r in out}) == 1  # identical on every row
    assert out[0].psi_total > 0.2
    assert all(r.retrain_due for r in out)

    # the pile-up cell crosses the integer overload line
    # (60 · 4 cells > 2 · 90 total) and nothing is dead
    assert by_cell[(1, 1)].overloaded
    assert not any(r.overloaded for c, r in by_cell.items() if c != (1, 1))
    assert not any(r.dead for r in out)

    # per-cell terms sum (pre-round) to the total: spot the big term
    assert by_cell[(1, 1)].psi_term == pytest.approx(
        round(
            (share(60, 90) - share(0, 30))
            * math.log(share(60, 90) / share(0, 30)),
            6,
        ),
        abs=1e-9,
    )


def test_dead_cells_and_stable_index_stays_quiet(spark):
    # a cell the current population abandoned reads dead; an index
    # whose occupancy matches its training era raises nothing
    rows = [(i, i % 2, 0) for i in range(40)]  # cells (0,0) and (1,0)
    out = ivf_occupancy_psi(
        _assignments(spark, rows), F.col("vec_id") < 20, n_coarse=2, n_fine=2
    ).collect()
    by_cell = {(r.coarse, r.fine): r for r in out}
    # (0,1)/(1,1) never occupied → dead; the occupied cells are not
    assert by_cell[(0, 1)].dead and by_cell[(1, 1)].dead
    assert not by_cell[(0, 0)].dead and not by_cell[(1, 0)].dead
    # ref = evens<20 (10 per occupied cell), cur = 20 per occupied
    # cell — proportionally identical, PSI ~ 0, no flags
    assert not any(r.retrain_due for r in out)
    assert not any(r.overloaded for r in out)
    # not exactly 0: the Laplace smoothing weights the dead cells by
    # 0.5/(N + 1) and the two populations' N differ — but far under
    # the 0.2 retrain line
    assert abs(out[0].psi_total) < 0.05


def test_empty_reference_degrades_finite(spark):
    # a reference filter matching nothing must stay finite (the
    # smoothing's job), flagging maximal drift rather than NaN
    rows = [(i, 0, 0) for i in range(50)]
    out = ivf_occupancy_psi(
        _assignments(spark, rows), F.lit(False), n_coarse=2, n_fine=1
    ).collect()
    assert all(r.psi_total is not None for r in out)
    assert all(not math.isnan(r.psi_total) for r in out)
    assert all(not math.isinf(r.psi_total) for r in out)


def test_shape_mismatch_raises_instead_of_dropping_rows(spark):
    # a cell outside the declared universe means the wrong shape params
    # — must fail loudly, never report a healthy index over partial data
    rows = [(1, 0, 0), (2, 3, 1)]  # (3,1) outside a 2x2 universe
    with pytest.raises(ValueError, match="outside the declared 2x2"):
        ivf_occupancy_psi(
            _assignments(spark, rows), F.lit(True), n_coarse=2, n_fine=2
        ).collect()


def test_monitor_reads_a_cdc_maintained_layout(spark, tmp_path):
    """The monitor consumes the S15/S16-maintained index directly: after
    a CDC batch piles new vectors into one cell, the occupancy PSI over
    the persisted layout (string-keyed, post-merge) must surface the
    drift against the pre-CDC population — the retrain signal the
    freshness pipeline feeds."""
    import numpy as np

    from cdc_example_spark.operators.similarity import (
        build_ivf2_index,
        train_ivf2_local,
    )
    from cdc_example_spark.streaming.ann_freshness import ivf2_apply_cdc
    from cdc_example_spark.streaming.envelope import decode_envelope
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )
    from tests.cdc_fixtures import envelope

    rng = np.random.default_rng(37)
    dim = 4
    base = {f"v{i}": [float(x) for x in rng.normal(size=dim)] for i in range(40)}
    df = spark.createDataFrame(
        sorted(base.items()), "vec_id string, embedding array<double>"
    )
    coarse, fines = train_ivf2_local(df, 2, 2, sample_size=512, seed=7)
    index = str(tmp_path / "index")
    build_ivf2_index(df, coarse, fines, index)

    # CDC: 50 inserts all near one direction (one cell pile-up)
    target = np.asarray(base["v0"])
    batch = [
        envelope(
            "i",
            f"n{i}",
            after={
                "id": f"n{i}",
                "embedding": [float(x) for x in target + 0.05 * rng.normal(size=dim)],
            },
            lsn=900 + i,
        )
        for i in range(50)
    ]
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    decoded = decode_envelope(
        spark.createDataFrame(batch, "key STRING, value STRING"), row_schema=schema
    )
    ivf2_apply_cdc(decoded, coarse, fines, index)

    maintained = spark.read.parquet(index).select("vec_id", "coarse", "fine")
    out = ivf_occupancy_psi(
        maintained,
        ~F.col("vec_id").startswith("n"),  # pre-CDC population = reference
        n_coarse=2,
        n_fine=2,
        overload_factor=2,
    ).collect()
    assert sum(r.n_cur for r in out) == 90 and sum(r.n_ref for r in out) == 40
    assert out[0].psi_total > 0.2
    assert all(r.retrain_due for r in out)
    assert any(r.overloaded for r in out)


# ------------------------------------------------- footer-priced monitor


def _persisted_layout(spark, tmp_path, rows):
    path = str(tmp_path / "footer_layout")
    _assignments(spark, rows).write.partitionBy("coarse", "fine").parquet(
        path
    )
    return path


def test_footer_cell_counts_plan_and_values(spark, tmp_path):
    """The current-occupancy side must be answered from parquet footers:
    the plan pins PushedAggregation/PushedGroupBy with NO data column in
    ReadSchema (VERDICT r12 item 3), the values equal a plain grouped
    count, and the session confs are restored afterwards."""
    from cdc_example_spark.operators.index_health import (
        footer_cell_counts,
        parquet_footer_aggregates,
    )

    rows = [(i, i % 3, i % 2) for i in range(200)]
    path = _persisted_layout(spark, tmp_path, rows)

    v1_before = spark.conf.get("spark.sql.sources.useV1SourceList")
    agg_before = spark.conf.get("spark.sql.parquet.aggregatePushdown")

    got = footer_cell_counts(spark, path)
    want = sorted(
        [int(r[0]), int(r[1]), int(r[2])]
        for r in spark.read.parquet(path)
        .groupBy("coarse", "fine")
        .count()
        .collect()
    )
    assert got == want

    # plan pin through the same conf scope the helper uses
    with parquet_footer_aggregates(spark):
        agg = (
            spark.read.parquet(path)
            .groupBy(
                F.col("coarse").cast("int").alias("coarse"),
                F.col("fine").cast("int").alias("fine"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [COUNT(*)]" in plan
    assert "PushedGroupBy: [coarse, fine]" in plan
    # ReadSchema carries only the pushed groupBy + count — never vec_id
    assert "vec_id" not in plan

    # conf restoration (the scope must not leak V2 parquet session-wide)
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == v1_before
    assert (
        spark.conf.get("spark.sql.parquet.aggregatePushdown") == agg_before
    )
