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
# entries. Queries with no green driver row yet (round-2 additions that
# registered past the cap, plus anything new this round) go first; the
# demoted tail is long-green q01–q10-class queries with two rounds of
# green rows plus pytest oracle coverage (tests/test_queries_oracle.py
# still checks all 60 every run).
DRIVER_PRIORITY = [
    # never driver-verified (registered at positions 51–60 in round 2)
    "q39_array_ops",
    "q47_simhash_near_pairs",
    "q51_tfidf_top_terms",
    "q52_bm25_search",
    "q53_stratified_sample",
    "q54_bigram_vocab",
    "q55_decontamination",
    "q56_repetition_bands",
    "q57_quantization_audit",
    "q58_dedup_components",
    # new in round 3
    "q61_salted_skew_join",
    "q62_ivf_trained_topk",
]
set_driver_order(DRIVER_PRIORITY)

__all__ = ["Query", "all_queries", "query", "set_driver_order"]
