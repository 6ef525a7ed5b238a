"""Pins for the q96-q99 late-extension family beyond the oracle hash
checks: the priority-sampling estimator's unbiasedness (the statistical
contract q97's w_est column exists for) and the snapshot-diff's
consistency with replaying the changelog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.queries import all_queries

QUERIES = all_queries()


def test_priority_sample_estimator_is_unbiased(spark):
    """Priority sampling (Duffield-Lund-Thorup): for a sample of the
    top-n priorities w_i/u_i with tau = the (n+1)-th priority, the
    estimator sum(max(w_i, tau)) over sampled members of ANY fixed
    subset is unbiased for the subset's true weight sum. Empirical pin:
    replay q97's exact construction across many hash seeds IN ONE JOB
    (seed is a partition key, not a loop) and require the mean estimate
    of a fixed subset to land within a few percent of truth — far
    tighter than any per-seed estimate, which establishes the variance
    is averaging out exactly as unbiasedness predicts."""
    n_items, n_seeds, budget = 400, 256, 64
    items = spark.range(n_items).select(
        F.col("id").alias("item"),
        # heavy-tailed-ish deterministic weights, subset = odd items
        (1.0 + (F.col("id") % 37) * (F.col("id") % 11)).alias("w"),
    )
    truth = (
        items.filter(F.col("item") % 2 == 1).agg(F.sum("w")).first()[0]
    )
    seeds = spark.range(n_seeds).select(F.col("id").alias("seed"))
    # two mixing rounds, each reduced mod 2^32 before the next multiply
    # so the long arithmetic never overflows under ANSI mode
    mix1 = (
        (F.col("item") + 1) * F.lit(2654435761) + F.col("seed")
    ) % F.lit(4294967296)
    mix2 = (mix1 * F.lit(40503) + F.lit(12345)) % F.lit(4294967296)
    d = items.crossJoin(seeds).select(
        "seed", "item", "w", (mix2 / F.lit(4294967296.0)).alias("u")
    )
    pri = (F.col("w") / F.col("u")).alias("pri")
    w_rank = Window.partitionBy("seed").orderBy(F.col("pri").desc(), "item")
    ranked = d.select("seed", "item", "w", pri).withColumn(
        "rn", F.row_number().over(w_rank)
    )
    tau = ranked.filter(F.col("rn") == budget + 1).select(
        "seed", F.col("pri").alias("tau")
    )
    est = (
        ranked.filter(F.col("rn") <= budget)
        .join(tau, "seed")
        .filter(F.col("item") % 2 == 1)
        .groupBy("seed")
        .agg(F.sum(F.greatest(F.col("w"), F.col("tau"))).alias("est"))
        .agg(F.avg("est"))
        .first()[0]
    )
    assert est == pytest.approx(truth, rel=0.05), (est, truth)


def test_priority_sample_query_shape(spark, sf_dir):
    """q97 returns at most 64 rows, every w_est >= its n_chars, and the
    sample is exactly the top-64 priorities of the full population."""
    df = QUERIES["q97_priority_sample"].spark(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 64
    assert all(r["w_est"] >= r["n_chars"] - 1e-9 for r in rows)
    # independent reconstruction of the winner set
    from cdc_example_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    u = (
        ((F.col("doc_id") + 1) * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    expected = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", (F.col("n_chars") / u).alias("pri")
        )
        .orderBy(F.col("pri").desc(), "doc_id")
        .limit(64)
        .collect()
    }
    assert {r["doc_id"] for r in rows} == expected


def test_snapshot_diff_matches_changelog_replay(spark, sf_dir):
    """q96's diff rows must be exactly the keys whose winning version
    changed between T1 and T2 — checked against an independent replay
    that folds the raw changelog in Python."""
    from cdc_example_spark.queries.pipeline import _Q96_T1, _Q96_T2
    from cdc_example_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    rows = ev.collect()

    def fold(upper):
        state = {}
        for r in rows:
            if str(r["ts"]) <= upper:
                k = r["user_id"]
                cur = state.get(k)
                if cur is None or (r["ts"], r["event_id"]) > cur:
                    state[k] = (r["ts"], r["event_id"])
        return state

    s1, s2 = fold(_Q96_T1), fold(_Q96_T2)
    expected = {
        k: ("insert" if k not in s1 else "update")
        for k, v in s2.items()
        if k not in s1 or s1[k][1] != v[1]
    }
    got = {
        r["user_id"]: r["op"]
        for r in QUERIES["q96_snapshot_diff"].spark(spark, sf_dir).collect()
    }
    assert got == expected
