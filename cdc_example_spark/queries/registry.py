"""Query registry: one named entry per declared operator/query.

Each query pairs a Spark DataFrame-API implementation with the DuckDB
oracle SQL the driver hash-checks it against (SURVEY.md §2.3). Queries
with no SQL-expressible oracle (approximate / iterative ops) set
``oracle=None`` and get a rows-only check.

Determinism contract (FIXTURES.md "Determinism rules"):
- total-order ORDER BY with key tie-breaks on every query;
- every float output as CAST(ROUND(CAST(x AS DECIMAL(28,10)), 2) AS
  DOUBLE) on BOTH engines: the decimal round makes the value exact
  rather than ulp-sensitive, and the final DOUBLE keeps the fetched
  representation identical (DECIMAL outputs stringify trailing-zero
  cents differently across the engines' fetch paths — the round-1
  hash-mismatch cause);
- never emit DECIMAL or (DuckDB) HUGEINT: wrap oracle integer SUMs in
  CAST(... AS BIGINT) — SUM(BIGINT) is HUGEINT, which pandas fetches
  as float64 against Spark's int64;
- timestamps out as formatted strings (engine-native temporal types
  stringify differently across drivers);
- identical column aliases on both engines (the driver sorts columns by
  name before hashing).
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: Prepared-plan cache. Building a registered query costs ~0.3 s of
#: driver-side work (py4j DataFrame construction + Catalyst analysis /
#: optimization) against ~40 ms of actual execution at sf0.1 — so a
#: repeated query re-submitted through the registry reuses its analyzed
#: DataFrame, exactly like a prepared statement. Every action on the
#: cached handle still re-runs the full distributed execution and result
#: transfer; only planning is skipped. Keyed weakly per session so a
#: stopped session frees its plans; keyed on the normalized sf_dir so
#: different datasets never share a plan. After an external writer
#: changes data under a path in-place, call ``invalidate()`` AND
#: ``sources.catalog.invalidate_tables`` (see invalidate's docstring).
_plan_memo: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def invalidate(spark: SparkSession | None = None) -> None:
    """Drop prepared plans (all sessions, or one).

    If files were rewritten in place under a data path, ALSO call
    ``sources.catalog.invalidate_tables`` — a rebuilt plan would
    otherwise re-hit the catalog's loaded-table handle, whose persisted
    columnar cache and snapshotted file listing still serve old data.
    """
    if spark is None:
        _plan_memo.clear()
    else:
        _plan_memo.pop(spark, None)


def _prepared(name: str, fn: SparkQuery) -> SparkQuery:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        memo = _plan_memo.setdefault(spark, {})
        key = (name, os.path.normpath(sf_dir))
        df = memo.get(key)
        if df is None:
            memo[key] = df = fn(spark, sf_dir)
        return df

    wrapper.__doc__ = fn.__doc__
    wrapper.__name__ = getattr(fn, "__name__", name)
    return wrapper


@dataclass(frozen=True)
class Query:
    name: str
    doc: str
    spark: SparkQuery
    oracle: str | None
    #: If set (e.g. "sf0.01"), the oracle SQL embeds data-derived
    #: constants (q62's pinned trained centroids) and is only valid at
    #: that scale factor — the driver's correctness tier. The local
    #: harness falls back to a rows-only check at other sf dirs.
    oracle_sf: str | None = None


_REGISTRY: dict[str, Query] = {}

#: Names pulled to the front of ``all_queries()``. The correctness driver
#: hash-checks only the first 50 entries of the registry, so queries that
#: have never received a driver row (new this round, or previously parked
#: past the cap) must register ahead of long-green ones. Populated by
#: ``queries/__init__.py`` after all modules have registered.
_DRIVER_FIRST: list[str] = []


def set_driver_order(first: list[str]) -> None:
    """Declare which query names must occupy the head of ``all_queries()``.

    Unknown names raise immediately (a stale priority list would silently
    waste a driver-verification slot).
    """
    missing = [n for n in first if n not in _REGISTRY]
    if missing:
        raise ValueError(f"set_driver_order: unknown query names {missing}")
    _DRIVER_FIRST.clear()
    _DRIVER_FIRST.extend(first)


#: One-time session artifact-build costs (bucketed-lake writes, k-means
#: training, persisted-index builds), keyed by artifact label. These
#: run INSIDE the first construction of the query that triggers them,
#: but they are deployment PREPARE work (a real cluster runs them on
#: the offline cadence), not py4j plan-assembly cost — bench.py reads
#: this to report them as their own tier instead of letting a ~10 s
#: index build masquerade as "client construction overhead".
SESSION_BUILDS: dict[str, float] = {}


def record_session_build(label: str, seconds: float) -> None:
    SESSION_BUILDS[label] = SESSION_BUILDS.get(label, 0.0) + seconds


def query(
    name: str, oracle: str | None = None, oracle_sf: str | None = None
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register ``fn`` as the Spark side of query ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            doc=(fn.__doc__ or "").strip(),
            spark=_prepared(name, fn),
            oracle=oracle,
            oracle_sf=oracle_sf,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Registry in driver-check order: prioritized names first, then the
    rest in registration order (dicts preserve insertion order)."""
    head = {n: _REGISTRY[n] for n in _DRIVER_FIRST}
    return head | {n: q for n, q in _REGISTRY.items() if n not in head}
