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
    # NEW in round 8 (rule 1): BPE APPLY — encode the corpus with the
    # sample-trained merge table (VERDICT r7 item 6) — and the
    # temperature-scaled mixture re-weighting planner (the planning
    # half q109's divergence monitor watches the output of)
    "q110_bpe_encode_corpus",
    "q111_mixture_reweight_plan",
    # CHANGED in round 8 (rule 1): q108 now groups the shingle explode
    # on xxhash64 (8-byte exchange key, raw==hashed parity pinned —
    # VERDICT r7 item 2); q109 collects its deterministic top-200
    # token table + per-source totals at construction so the
    # registered plan explodes documents exactly once (item 3)
    "q108_split_leakage",
    "q109_source_mix_divergence",
    # q41's registered functions are byte-identical this round, but
    # operators/percentiles.py gained the executable tier guard
    # (VERDICT r7 item 7) — by the r7 q70 precedent (module-shared
    # code moved → the query re-verifies), it re-enters the window
    "q41_percentiles",
    # the 13 documented r7-overflow queries (r5 green rows, 3 rounds
    # stale — promised to head the r8 window in the r7 rotation note;
    # VERDICT r7 item 1)
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
    "q82_fuzzy_dedup_pairs",
    "q83_pps_sample",
    "q84_markov_transitions",
    # 34 of the 46 r6-green queries due by the 2-round rule (rule 2) —
    # changed-module neighbors first: q87–q99 share queries/quality.py
    # with this round's q108/q109 rewrites, q102–q104/q62/q66 sit on
    # the similarity/IVF stack, then the multimodal/text/stat block
    "q87_sparse_allpairs_cosine",
    "q88_quality_constraint_audit",
    "q89_touch_attribution",
    "q90_sketch_rollup_distinct",
    "q91_psi_value_drift",
    "q92_scd2_history",
    "q93_pii_redaction",
    "q94_bloom_decontamination",
    "q95_canonical_dedup",
    "q96_snapshot_diff",
    "q97_priority_sample",
    "q98_token_lift",
    "q99_zorder_box_scan",
    "q102_ivf2_persisted_serving",
    "q103_grouped_udaf_trimmed_mean",
    "q104_quantized_cosine_topk",
    "q62_ivf_trained_topk",
    "q66_semantic_dedup",
    "q81_heavy_hitters",
    "q85_wav_audio_stats",
    "q86_skyline_parts",
    "q29_simhash",
    "q30_cosine_topk_multi",
    "q31_embedding_neardup_pairs",
    "q32_minhash_lsh_candidates",
    "q33_binary_media_meta",
    "q34_multimodal_features",
    "q35_pandas_cosine_topk",
    "q36_ivf_topk",
    "q37_ranking_family",
    "q38_approx_distinct",
    "q40_grouping_sets",
]
# 50 prioritized — the window is exactly full: 2 new + 2 changed + 1
# module-neighbor re-verify (q41) in r8 (rule 1, ≤5 per VERDICT r7
# item 1) + the 13 promised r5-overflow (rule 2) + 32 of the 46
# r6-green rows due this round.
# DOCUMENTED OVERFLOW (r8 → r9): q12_top20_lineitems, q13_set_ops,
# q15_string_functions, q16_orders_by_month, q17_case_math_bands,
# q18_hourly_event_windows, q19_sessionization, q20_json_buckets,
# q25_rolling_fingerprints, q26_token_counts, q27_lang_id_confusion,
# q28_quality_scores, q42_stats_profile, q43_train_test_split keep
# their r6 green rows one more round (14 queries — q42/q43 displaced
# by q41's module-neighbor re-verify and the new q111 — exactly the
# ≤14 r9-carry budget VERDICT r7 item 1 set);
# their modules (queries/batch.py scalar/window/set families,
# operators/text_analysis.py) are untouched this round and
# tests/test_queries_oracle.py still oracle-checks them locally every
# run. They MUST head the r9 window together with the r7-green block
# (q01–q11, q14, q21–q24, q39, q44–q61, q63–q70, q100, q101,
# q105–q107 — due at r9 by the 2-round rule; q41 is r8-green); r9
# should keep its own new/changed count ≤4 to fit.
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
