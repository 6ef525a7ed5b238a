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
    # ---- r14 window ----
    # Rule 0 — the two rows the r13 rotation PROMISED would head this
    # window (displaced r11-green rows; VERDICT r13 item 6):
    "q69_bigram_lm_perplexity",
    "q105_bpe_merge_rounds",
    # Rule 1 — queries whose code changed in the r14 optimization pass
    # (results oracle-identical, re-verified at sf0.01 this round, but
    # "green must never mean green for an older build"):
    #   - shuffled_order sort tail (queries/util.py): q113, q82, q32,
    #     q24, q31, q34, q29, q25, q58, q87, q19
    #   - q85 single-partition Python crossing; q95 + q58 CC
    #     probe_round; q79 graph.py threshold parser + probe plumbing;
    #     q32/q113 pair_width split (operators/dedup.py)
    "q113_lsh_fuzzy_dedup_pairs",
    "q82_fuzzy_dedup_pairs",
    "q32_minhash_lsh_candidates",
    "q24_jaccard_neardup_pairs",
    "q85_wav_audio_stats",
    "q58_dedup_components",
    "q95_canonical_dedup",
    "q31_embedding_neardup_pairs",
    "q34_multimodal_features",
    "q29_simhash",
    "q25_rolling_fingerprints",
    "q87_sparse_allpairs_cosine",
    "q19_sessionization",
    "q55_decontamination",
    "q79_pagerank",
    # Rule 2 — the remaining 16 documented r13→r14 overflow rows
    # (r11-green, 3 rounds stale; q69/q105/q19 already placed above):
    "q20_json_buckets",
    "q42_stats_profile",
    "q43_train_test_split",
    "q71_event_funnel",
    "q72_cohort_retention",
    "q74_ntile_deciles",
    "q77_hourly_anomalies",
    "q78_resample_interpolate",
    "q92_scd2_history",
    "q39_array_ops",
    "q67_sequence_packing",
    "q68_json_schema_profile",
    "q75_curation_funnel",
    "q76_hashed_linear_score",
    "q99_zorder_box_scan",
    "q106_rag_chunking",
    # Rule 2 fill — 18 of the 42 r12-green rows due by the 2-round
    # rule, families nearest this round's edits first (UDAF/serving/
    # BPE/approx tiers), then relational core:
    "q103_grouped_udaf_trimmed_mean",
    "q115_hybrid_rrf_indexed",
    "q116_ann_index_health",
    "q104_quantized_cosine_topk",
    "q110_bpe_encode_corpus",
    "q112_bpe_dictionary_encode",
    "q108_split_leakage",
    "q111_mixture_reweight_plan",
    "q41_percentiles",
    "q38_approx_distinct",
    "q30_cosine_topk_multi",
    "q33_binary_media_meta",
    "q37_ranking_family",
    "q01_pricing_summary",
    "q02_forecast_revenue",
    "q03_shipping_priority",
    "q04_customers_per_region",
]
# 50 prioritized — exactly full: 2 promised + 15 r14-changed + 16
# overflow + 17 r12-green fills. DOCUMENTED OVERFLOW (r14 → r15), 25
# r12-green rows displaced by this round's 14-row changed set — they
# will be 3 rounds stale at r15 and MUST head the r15 window:
# q13_set_ops, q15_string_functions, q16_orders_by_month,
# q17_case_math_bands, q18_hourly_event_windows, q40_grouping_sets,
# q48_asof_join, q49_snapshot_at, q50_range_join, q61_salted_skew_join,
# q64_bucketed_colocated_join, q73_zipf_slope, q80_embedding_audit,
# q81_heavy_hitters, q83_pps_sample, q86_skyline_parts,
# q88_quality_constraint_audit, q89_touch_attribution,
# q90_sketch_rollup_distinct, q91_psi_value_drift,
# q94_bloom_decontamination, q96_snapshot_diff, q97_priority_sample,
# q98_token_lift, q12_top20_lineitems (all in modules whose relational
# shapes r14 does not restructure;
# tests/test_queries_oracle.py still oracle-checks every query locally
# each run). The 50 r13-green rows are 1 round old and due at r15 too:
# r15 faces 74 due vs 50 slots — keep new/changed ≤3 there.
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
