"""Operator tests for relevance/sampling (q51–q54 back ends).

The sf-dir cross-engine checks live in test_queries_oracle.py (auto-
parametrized from the registry); here we pin the operator-level
contracts the oracles can't see: partitioning-invariance of the
deterministic sample, the short-document n-gram guard, BM25's
non-matching-document exclusion, and the WindowGroupLimit scale shape
of the rank-filtered windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_example_spark.operators import relevance as R
from cdc_example_spark.operators import sampling as S


def test_stratified_sample_is_partitioning_invariant(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = S.stratified_sample_k(df, k=5).select("lang", "rnk", "doc_id")
    b = S.stratified_sample_k(df.repartition(13, "doc_id"), k=5).select(
        "lang", "rnk", "doc_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # exactly k per stratum when the stratum is big enough
    counts = dict(
        a.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert counts == {"a": 5, "b": 5}


def test_stratified_sample_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, lang string"
    )
    out = S.stratified_sample_k(df, k=5).collect()
    assert len(out) == 3


def test_top_ngrams_short_docs_guarded(spark):
    df = spark.createDataFrame(
        [(0, "solo", "en"), (1, "two words two words", "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.ngram, r.n_occurrences)
        for r in R.top_ngrams(df, n=2, k=10).collect()
    }
    # the 1-token doc contributes nothing; no descending-sequence blowup
    assert got == {("two words", 2), ("words two", 1)}


def test_bm25_excludes_non_matching_docs(spark):
    df = spark.createDataFrame(
        [(0, "hash hash table"), (1, "nothing relevant here"), (2, "merge sort")],
        "doc_id long, text string",
    )
    out = R.bm25_rank(df, ("hash", "merge"), k=10).collect()
    assert {r.doc_id for r in out} == {0, 2}
    assert all(r.bm25 > 0 for r in out)
    by_id = {r.doc_id: r.n_terms_matched for r in out}
    assert by_id == {0: 1, 2: 1}


def test_tfidf_universal_term_scores_zero(spark):
    # a term in EVERY doc of the corpus has idf = ln((N+1)/(N+1)) = 0
    df = spark.createDataFrame(
        [(0, "common alpha", "en"), (1, "common beta", "en")],
        "doc_id long, text string, lang string",
    )
    out = {
        (r.doc_id, r.term): r.tfidf
        for r in R.tfidf_top_terms(df, k=10).collect()
    }
    assert out[(0, "common")] == 0.0 and out[(1, "common")] == 0.0
    assert out[(0, "alpha")] > 0.0


def test_rank_windows_plan_a_group_limit(spark, sf_dir):
    # the scale contract: per-group top-k must prune map-side
    # (WindowGroupLimit), never sort whole strata through the shuffle.
    from cdc_example_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    for df in (
        S.stratified_sample_k(docs, k=7),
        R.top_ngrams(docs, n=2, k=5),
        R.tfidf_top_terms(docs, k=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan[:2000]


def test_repetition_stats_detects_boilerplate(spark):
    from cdc_example_spark.operators.text_analysis import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "spam ham eggs spam ham eggs spam ham eggs"),  # 7 shingles, 3 distinct
            (1, "all distinct words in this one sentence"),
            (2, "too short"),  # < 3 tokens → no row
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].total_shingles == 7 and rows[0].distinct_shingles == 3
    assert rows[0].rep_frac == 1 - 3 / 7
    assert rows[1].rep_frac == 0.0


def test_contamination_overlap_counts_shared_shingles(spark):
    from cdc_example_spark.operators.text_analysis import contamination_overlap

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # benchmark
            (10, "alpha beta gamma something else"),  # shares 'alpha beta gamma'
            (11, "totally unrelated text content here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in contamination_overlap(df, bench_max_id=10).collect()}
    assert set(rows) == {10}  # doc 11 shares nothing → excluded
    assert rows[10].n_shared == 1 and rows[10].n_shingles == 3


def test_quantize_int8_roundtrip_properties(spark):
    from cdc_example_spark.operators.similarity import quantize_int8_stats

    df = spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 0.0], 0),
            (1, [0.0, 0.0, 0.0, 0.0], 1),   # zero vector: scale 0 guard
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.vec_id: r for r in quantize_int8_stats(df).collect()}
    assert rows[0].scale == 1.0
    # max element always saturates; no other element of this vector does
    assert rows[0].n_saturated == 1
    # per-element error bounded by half a quantization step
    assert rows[0].rms_err <= (rows[0].scale / 127) / 2 + 1e-12
    assert rows[1].scale == 0.0 and rows[1].rms_err == 0.0 and rows[1].n_saturated == 0
