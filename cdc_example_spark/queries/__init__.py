"""Declared query library (SURVEY.md §2.2/§2.3).

Importing this package populates the registry with Q1–Q22 plus the
LLM-data-pipeline extension queries. Use :func:`all_queries` to get the
name → Query mapping consumed by ``__spark_entry__.py`` and the tests.
"""

from cdc_example_spark.queries.registry import (
    Query,
    all_queries,
    query,
    set_driver_order,
)

# Side-effect imports: each module registers its queries.
from cdc_example_spark.queries import batch as _batch  # noqa: F401
from cdc_example_spark.queries import curation as _curation  # noqa: F401
from cdc_example_spark.queries import llm as _llm  # noqa: F401
from cdc_example_spark.queries import relevance as _relevance  # noqa: F401

# The correctness driver hash-checks only the FIRST 50 ``all_queries()``
# entries. Window rule (VERDICT r3 item 1 + r4 item 6, in priority
# order):
#   1. any query whose code CHANGED since its last green driver row,
#      plus anything NEW this round — "green" must never mean "green
#      for an older build";
#   2. then queries whose last green row is OLDEST, so that no query's
#      most recent driver check is ever more than 2 rounds old even
#      when untouched;
#   3. the demoted tail is recently-green unchanged queries
#      (tests/test_queries_oracle.py still checks every query locally
#      each run).
DRIVER_PRIORITY = [
    # new in round 5
    "q70_ivf_persisted_serving",
    "q71_event_funnel",
    "q72_cohort_retention",
    "q73_zipf_slope",
    "q74_ntile_deciles",
    "q75_curation_funnel",
    "q76_hashed_linear_score",
    "q77_hourly_anomalies",
    "q78_resample_interpolate",
    "q79_pagerank",
    "q80_embedding_audit",
    "q81_heavy_hitters",
    "q82_fuzzy_dedup_pairs",
    "q83_pps_sample",
    "q84_markov_transitions",
    "q86_skyline_parts",
    # modified in round 5
    "q41_percentiles",        # carrier-row refinement, GK single-execution
    "q62_ivf_trained_topk",   # trained_centroids session memo
    "q66_semantic_dedup",     # trained_centroids session memo
    "q14_count_distinct",     # r5 item 5 measurement target
    # parked since their r3 green rows (2 rounds old — rotate in, rule 2)
    "q21_exact_dedup_stats",
    "q22_cosine_top5",
    "q23_dedup_survivors",
    "q24_jaccard_neardup_pairs",
    "q39_array_ops",
    "q47_simhash_near_pairs",
    "q48_asof_join",
    "q49_snapshot_at",
    "q50_range_join",
    "q51_tfidf_top_terms",
    "q52_bm25_search",
    "q53_stratified_sample",
    "q54_bigram_vocab",
    "q55_decontamination",
    "q56_repetition_bands",
    "q57_quantization_audit",
    "q59_full_outer_join",
    "q60_set_ops_all",
    "q61_salted_skew_join",
]
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
