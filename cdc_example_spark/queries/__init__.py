"""Declared query library (SURVEY.md §2.2/§2.3).

Importing this package populates the registry with Q1–Q22 plus the
LLM-data-pipeline extension queries. Use :func:`all_queries` to get the
name → Query mapping consumed by ``__spark_entry__.py`` and the tests.
"""

from cdc_example_spark.queries.registry import Query, all_queries, query

# Side-effect imports: each module registers its queries.
from cdc_example_spark.queries import batch as _batch  # noqa: F401
from cdc_example_spark.queries import llm as _llm  # noqa: F401
from cdc_example_spark.queries import relevance as _relevance  # noqa: F401

__all__ = ["Query", "all_queries", "query"]
