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
    # Rule 1 — queries whose code changed this round. r13 registers no
    # new queries (VERDICT r12 item 7); the changed set is:
    #   - q116: its current-occupancy side was split to a footer-
    #     answerable count(*) (VERDICT r12 item 3), measured 2.9×
    #     SLOWER at the k=100 shard (file-open-bound layout), and
    #     REVERTED to the single-scan shape — the footer pricing lives
    #     where it wins, in the streaming monitor (SCALE.md §4b-r13).
    #     Slot kept because its module churned.
    #   - q32 and q79: the r13 OPTIMIZATION pass changed their
    #     operators' internals (lsh_candidate_pairs now plans its
    #     bucket-explosion exchange at the session core count;
    #     pagerank gained the size-gated broadcast path —
    #     OPTIMIZATION_r13.md §1–2). q113/q82/q24 share those
    #     operators and already hold due slots below. Results are
    #     oracle-identical (re-verified at sf0.01 this round), but
    #     "green must never mean green for an older build".
    "q116_ann_index_health",
    "q32_minhash_lsh_candidates",
    "q79_pagerank",
    # The 16 documented r12-overflow queries (r10 green rows, 3
    # rounds stale — promised to head the r13 window in the r12
    # rotation note; VERDICT r12 item 1). They MUST come first
    # among the due rows. All queries/batch.py relational core,
    # untouched since r10.
    "q05_customers_without_orders",
    "q06_semi_join_having",
    "q07_rollup_nation_segment",
    "q08_cube_status_priority",
    "q09_top3_per_nation",
    "q10_order_gaps",
    "q11_cumulative_spend",
    "q14_count_distinct",
    "q44_pivot_event_counts",
    "q45_subqueries",
    "q46_range_frame",
    "q59_full_outer_join",
    "q60_set_ops_all",
    "q63_right_outer_join",
    "q65_window_distribution",
    "q84_markov_transitions",
    # 33 of the 50 r11-green rows due by the 2-round rule (rule 2).
    # Near-neighbor families of this round's changes first: the
    # persisted-ANN/similarity ladder (q116's footer-priced
    # monitor and the retrain-loop GC read the same layouts), then
    # the hybrid/relevance pair feeding q115's composition, then
    # the quality-module rows (quality.py carries the q116 edit),
    # then the fuzzy-dedup heavyweights, then text/dedup, then
    # sampling/BPE/decontamination.
    "q102_ivf2_persisted_serving",
    "q70_ivf_persisted_serving",
    "q62_ivf_trained_topk",
    "q36_ivf_topk",
    "q66_semantic_dedup",
    "q100_kmeans_lloyd_refine",
    "q57_quantization_audit",
    "q35_pandas_cosine_topk",
    "q22_cosine_top5",
    "q47_simhash_near_pairs",
    "q58_dedup_components",
    "q107_matryoshka_audit",
    "q114_hybrid_rrf_search",
    "q52_bm25_search",
    "q51_tfidf_top_terms",
    "q93_pii_redaction",
    "q109_source_mix_divergence",
    "q113_lsh_fuzzy_dedup_pairs",
    "q82_fuzzy_dedup_pairs",
    "q21_exact_dedup_stats",
    "q23_dedup_survivors",
    "q24_jaccard_neardup_pairs",
    "q25_rolling_fingerprints",
    "q26_token_counts",
    "q27_lang_id_confusion",
    "q28_quality_scores",
    "q101_segment_span_dedup",
    "q53_stratified_sample",
    "q54_bigram_vocab",
    "q55_decontamination",
    "q56_repetition_bands",
]
# 50 prioritized — the window is exactly full: 3 rule-1 slots
# (q116 + the two optimization-changed queries q32/q79; = 3, at
# the standing ≤3 cap) + the 16 promised r10-stale carries
# (rule 2, heading the due block as the r12 note requires) + 31
# of the 50 r11-green rows due this round. The two r11-green rows
# the rule-1 slots displaced — q69_bigram_lm_perplexity and
# q105_bpe_merge_rounds (both in modules r13 does not edit) —
# join the documented overflow below and MUST head the r14 window.
# DOCUMENTED OVERFLOW (r13 → r14): q69_bigram_lm_perplexity,
# q105_bpe_merge_rounds (displaced by the r13 rule-1 slots, see
# above), q19_sessionization,
# q20_json_buckets, q42_stats_profile, q43_train_test_split,
# q71_event_funnel, q72_cohort_retention, q74_ntile_deciles,
# q77_hourly_anomalies, q78_resample_interpolate,
# q92_scd2_history (queries/batch.py — relational analytics,
# untouched since r9), q39_array_ops, q67_sequence_packing,
# q68_json_schema_profile, q75_curation_funnel,
# q76_hashed_linear_score (queries/llm.py, untouched),
# q99_zorder_box_scan (queries/pipeline.py, untouched),
# q106_rag_chunking (queries/relevance.py, untouched) keep their
# r11 green rows one more round (17 queries, all in modules r13
# does not edit; tests/test_queries_oracle.py still oracle-checks
# every one locally each run). They MUST head the r14 window
# together with the 50 r12-green rows due at r14 — r14 faces 67
# due vs 50 slots, so r14 must again keep new/changed ≤3 and
# carry ~17 r12 rows (prefer untouched modules) to r15. With 116
# queries against a 50-slot window the steady state is a ~17-row
# documented 3-round tail; the rotation keeps it named,
# module-stable, and locally oracle-checked every run.
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
