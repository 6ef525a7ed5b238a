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
from cdc_example_spark.queries import pipeline as _pipeline  # noqa: F401
from cdc_example_spark.queries import quality as _quality  # noqa: F401
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
    # NEW in round 9 (rule 1): the BPE DICTIONARY tier — char-level
    # merges trained on the 5% sample's word-frequency table, corpus
    # encoded through its (lang, word) dictionary (VERDICT r8 item 2)
    "q112_bpe_dictionary_encode",
    # CHANGED in round 9 (rule 1): q82's oracle gained the exact
    # bag-of-chars lower-bound prune (VERDICT r8 item 3 de-strawman);
    # q109's top-200 selection moved to the 5% sample with in-plan
    # exact global counts (item 6); q110 gained the empty-sample
    # training guard (ADVICE r8 low)
    "q82_fuzzy_dedup_pairs",
    "q109_source_mix_divergence",
    "q110_bpe_encode_corpus",
    # the 14 documented r8-overflow queries (r6 green rows, 3 rounds
    # stale — promised to head the r9 window in the r8 rotation note;
    # VERDICT r8 item 1)
    "q12_top20_lineitems",
    "q13_set_ops",
    "q15_string_functions",
    "q16_orders_by_month",
    "q17_case_math_bands",
    "q18_hourly_event_windows",
    "q19_sessionization",
    "q20_json_buckets",
    "q25_rolling_fingerprints",
    "q26_token_counts",
    "q27_lang_id_confusion",
    "q28_quality_scores",
    "q42_stats_profile",
    "q43_train_test_split",
    # 32 of the 47 r7-green rows due by the 2-round rule (rule 2) —
    # changed-module neighbors first: q105/q106 share
    # queries/relevance.py with this round's q112 + the q105/q110
    # empty-corpus guards; q51–q57 bind the relevance/sampling
    # operator stack; q100/q107 share queries/curation.py with the
    # q82 oracle rewrite
    "q105_bpe_merge_rounds",
    "q106_rag_chunking",
    "q51_tfidf_top_terms",
    "q52_bm25_search",
    "q53_stratified_sample",
    "q54_bigram_vocab",
    "q55_decontamination",
    "q56_repetition_bands",
    "q57_quantization_audit",
    "q100_kmeans_lloyd_refine",
    "q107_matryoshka_audit",
    # then the flagship/join/dedup/ANN families of the r7 block
    "q01_pricing_summary",
    "q02_forecast_revenue",
    "q03_shipping_priority",
    "q04_customers_per_region",
    "q21_exact_dedup_stats",
    "q22_cosine_top5",
    "q23_dedup_survivors",
    "q24_jaccard_neardup_pairs",
    "q39_array_ops",
    "q47_simhash_near_pairs",
    "q48_asof_join",
    "q49_snapshot_at",
    "q50_range_join",
    "q58_dedup_components",
    "q61_salted_skew_join",
    "q64_bucketed_colocated_join",
    "q67_sequence_packing",
    "q68_json_schema_profile",
    "q69_bigram_lm_perplexity",
    "q70_ivf_persisted_serving",
    "q101_segment_span_dedup",
]
# 50 prioritized — the window is exactly full: 1 new + 3 changed in
# r9 (rule 1, ≤4 per VERDICT r8 item 1) + the 14 promised r6-stale
# carries (rule 2) + 32 of the 47 r7-green rows due this round.
# DOCUMENTED OVERFLOW (r9 → r10): q05_customers_without_orders,
# q06_semi_join_having, q07_rollup_nation_segment,
# q08_cube_status_priority, q09_top3_per_nation, q10_order_gaps,
# q11_cumulative_spend, q14_count_distinct, q44_pivot_event_counts,
# q45_subqueries, q46_range_frame, q59_full_outer_join,
# q60_set_ops_all, q63_right_outer_join, q65_window_distribution keep
# their r7 green rows one more round (15 queries, all in the
# untouched queries/batch.py declarative join/window/set families;
# tests/test_queries_oracle.py still oracle-checks them locally every
# run). They MUST head the r10 window together with the r8-green
# block due at r10 by the 2-round rule (the 50 r8 rows minus this
# round's q82/q109/q110 re-verifies = 47, including q41/q108/q111) —
# 62 due vs 50 slots ⇒ r10 carries ~12–16 r8 rows to r11 and must
# keep its own new/changed count ≤3.
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
