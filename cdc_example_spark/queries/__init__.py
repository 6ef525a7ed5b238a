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
from cdc_example_spark.queries import llm as _llm  # noqa: F401
from cdc_example_spark.queries import relevance as _relevance  # noqa: F401

# The correctness driver hash-checks only the FIRST 50 ``all_queries()``
# entries. Priority rule: any query whose code CHANGED since its last
# green driver row, plus anything new this round, goes first — "green"
# must never mean "green for an older build" (VERDICT r3 item 1). The
# demoted tail is queries whose last green row matches their current
# code (tests/test_queries_oracle.py still checks every query each run).
DRIVER_PRIORITY = [
    # r3 routed these through the shared token view / catalog changes
    # AFTER their last green row (r2) — re-verify first (VERDICT r3 #1)
    "q25_rolling_fingerprints",
    "q26_token_counts",
    "q27_lang_id_confusion",
    "q28_quality_scores",
    "q29_simhash",
    "q30_cosine_topk_multi",
    "q31_embedding_neardup_pairs",
    "q32_minhash_lsh_candidates",
    "q33_binary_media_meta",
    "q34_multimodal_features",
    "q35_pandas_cosine_topk",
    "q36_ivf_topk",
    # modified in round 4
    "q13_set_ops",           # fused single-pass set-op cardinalities
    "q14_count_distinct",    # NULL-discipline filter (ADVICE r3)
    "q41_percentiles",       # registered tier → distributed-exact path
    "q58_dedup_components",  # graph.py gained rounds="auto" (additive)
    # new in round 4
    "q63_right_outer_join",
    "q64_bucketed_colocated_join",
    "q65_window_distribution",
    "q66_semantic_dedup",
    "q67_sequence_packing",
    "q68_json_schema_profile",
    "q69_bigram_lm_perplexity",
    "q62_ivf_trained_topk",  # gains a full oracle (pinned centroids)
]
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
