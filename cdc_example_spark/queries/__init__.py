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
    # NEW in round 10 (rule 1): the LSH fuzzy-dedup scale tier gets
    # its driver row (VERDICT r9 item 2) — MinHash-LSH candidates over
    # signature shingles, banded-Levenshtein verify, oracle replays
    # the full signature/band/verify arithmetic
    "q113_lsh_fuzzy_dedup_pairs",
    # CHANGED in round 10 (rule 1): the q110/q112 oracles gained the
    # sentinel no-op merge winner so a degenerate (empty) 5% training
    # sample degrades to the identity encode on BOTH engines instead
    # of cascading the oracle empty (ADVICE r9 low; pinned by
    # tests/test_round10_properties.py)
    "q110_bpe_encode_corpus",
    "q112_bpe_dictionary_encode",
    # the 15 documented r9-overflow queries (r7 green rows, 3 rounds
    # stale — promised to head the r10 window in the r9 rotation
    # note; VERDICT r9 item 1)
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
    # 32 of the 47 r8-green rows due by the 2-round rule (rule 2) —
    # changed-module neighbors first: q73/q94 share
    # queries/relevance.py with this round's q110/q112 oracle fixes;
    # q80–q86/q103/q104 share queries/curation.py with the new q113;
    # then the VERDICT watch items (q41 drift pair, q108/q111)
    "q73_zipf_slope",
    "q94_bloom_decontamination",
    "q80_embedding_audit",
    "q81_heavy_hitters",
    "q83_pps_sample",
    "q84_markov_transitions",
    "q85_wav_audio_stats",
    "q86_skyline_parts",
    "q103_grouped_udaf_trimmed_mean",
    "q104_quantized_cosine_topk",
    "q41_percentiles",
    "q108_split_leakage",
    "q111_mixture_reweight_plan",
    # the dedup/sketch families sharing operators/dedup.py with q113
    "q29_simhash",
    "q31_embedding_neardup_pairs",
    "q32_minhash_lsh_candidates",
    "q95_canonical_dedup",
    # then the rest of the r8 block, oldest-risk first
    "q79_pagerank",
    "q87_sparse_allpairs_cosine",
    "q88_quality_constraint_audit",
    "q89_touch_attribution",
    "q90_sketch_rollup_distinct",
    "q91_psi_value_drift",
    "q96_snapshot_diff",
    "q97_priority_sample",
    "q98_token_lift",
    "q37_ranking_family",
    "q38_approx_distinct",
    "q40_grouping_sets",
    "q30_cosine_topk_multi",
    "q33_binary_media_meta",
    "q34_multimodal_features",
]
# 50 prioritized — the window is exactly full: 1 new + 2 changed in
# r10 (rule 1, ≤3 per VERDICT r9 item 1) + the 15 promised r7-stale
# carries (rule 2) + 32 of the 47 r8-green rows due this round.
# DOCUMENTED OVERFLOW (r10 → r11): q35_pandas_cosine_topk,
# q36_ivf_topk, q62_ivf_trained_topk, q66_semantic_dedup,
# q71_event_funnel, q72_cohort_retention, q74_ntile_deciles,
# q75_curation_funnel, q76_hashed_linear_score,
# q77_hourly_anomalies, q78_resample_interpolate, q92_scd2_history,
# q93_pii_redaction, q99_zorder_box_scan, q102_ivf2_persisted_serving
# keep their r8 green rows one more round (15 queries, all in
# modules untouched this round — queries/batch.py window/funnel
# families, queries/llm.py ANN serving rungs, q93/q99 in
# quality/pipeline; tests/test_queries_oracle.py still oracle-checks
# every one locally each run). They MUST head the r11 window
# together with the 48 r9-green rows due at r11 by the 2-round rule
# (the 50 r9 rows minus this round's q110/q112 re-verifies — incl.
# q82/q109/q113-neighbors) — so r11 faces 63 due vs 50 slots and
# must keep its own new/changed count ≤3, carrying ~13 r9 rows
# (prefer untouched modules) to r12.
#
# q114_hybrid_rrf_search is NEW in r10 but registered OUTSIDE the
# window (the r9 rotation promise capped r10's new/changed at 3 and
# the window is exactly full): it is the q113 precedent — pytest +
# local-harness oracle parity now (tests/test_hybrid_retrieval.py;
# the generic oracle test checks it at sf0.001 every run and it was
# hand-verified against its oracle at sf0.01), driver row at r11,
# where it counts as one of r11's ≤3 rule-1 slots.
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
