"""Query registry: one named entry per declared operator/query.

Each query pairs a Spark DataFrame-API implementation with the DuckDB
oracle SQL the driver hash-checks it against (SURVEY.md §2.3). Queries
with no SQL-expressible oracle (approximate / iterative ops) set
``oracle=None`` and get a rows-only check.

Determinism contract (FIXTURES.md "Determinism rules"):
- total-order ORDER BY with key tie-breaks on every query;
- every float output as CAST(ROUND(x, 2) AS DECIMAL(18,2)) on BOTH
  engines so the decimal string — hence the driver's value hash — is
  exact rather than ulp-sensitive;
- timestamps out as formatted strings (engine-native temporal types
  stringify differently across drivers);
- identical column aliases on both engines (the driver sorts columns by
  name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark: SparkQuery
    oracle: str | None


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register ``fn`` as the Spark side of query ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, doc=(fn.__doc__ or "").strip(), spark=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)
