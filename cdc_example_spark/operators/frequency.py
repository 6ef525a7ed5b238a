"""Bounded-memory frequency sketches: Misra-Gries heavy-hitter candidates.

The reference pipeline has no frequency operator of its own (its only
keyed aggregation is the client-side last-write-wins map the browser
maintains from the upsert/delete events that
``src/main/kotlin/com/example/cdc/socket/MessageWebSocketHandler.kt:40-55``
broadcasts — the LWW state itself lives in
``src/main/resources/static/index.html:87-89,202-216``);
this module is part of the mandated batch/LLM-pipeline extension: the
"find the tokens worth special-casing" pass a tokenizer-training or
stop-word pipeline runs over the corpus.

Why a sketch when ``groupBy(token).count()`` is exact: at 100 TB the
token column's cardinality is adversarial (URLs, IDs, code literals
push distinct counts into the billions), so the exact plan's map-side
hash and its shuffle are both vocabulary-sized. Misra-Gries bounds the
per-partition state at ``capacity`` counters with the classical
guarantee: every item with global frequency > N/(capacity+1) survives
in at least one partition's summary (pigeonhole over the per-partition
bound — Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012). The candidate union is therefore a SUPERSET of
every item above the threshold fraction, and a second exact pass over
just the candidates (a broadcast semi-join that prunes the shuffle to
candidate rows only) turns the sketch into an exact answer for any
``threshold_frac > 1/(capacity+1)``.

Batch shape: the summary is maintained per Arrow batch with a
vectorized ``value_counts`` merge, then compressed by subtracting the
(capacity+1)-th largest counter — the mergeable-summaries combine step
— rather than the textbook one-decrement-per-item loop, so the Python
cost is O(batch + capacity·log capacity) per batch, not O(rows).
Peak per-partition memory is therefore O(capacity + distinct values
per Arrow batch) — compression runs AFTER each whole-batch merge, so
the dict transiently holds one batch's distincts (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) on top
of the ``capacity`` steady-state counters. The MG coverage guarantee
is unaffected; only the transient high-water mark exceeds capacity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(col: str, capacity: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[Any, int] = {}
        for pdf in batches:
            for tok, n in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(n)
            if len(counters) > capacity:
                # Mergeable-summaries compression: subtract the
                # (capacity+1)-th largest count from everything and drop
                # the non-positive — equivalent to that many rounds of
                # the textbook all-decrement, and it preserves the
                # "true_count - N/(capacity+1) <= counter" bound.
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - cut for t, c in counters.items() if c > cut
                }
        yield pd.DataFrame({col: pd.Series(list(counters), dtype="object")})

    return gen


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Distinct Misra-Gries survivor values of ``df[col]``.

    One Arrow-batched pass per partition; steady-state summary is
    ``capacity`` counters (transient peak: + one Arrow batch's distinct
    values — see the module docstring); the output is at most
    ``capacity`` rows per partition and contains every value whose
    GLOBAL frequency exceeds N/(capacity+1). Pair with an exact counting pass filtered to these
    candidates to get exact heavy hitters above that fraction.
    """
    if capacity < 1:
        raise ValueError(f"mg_candidates: capacity must be >= 1, got {capacity}")
    from pyspark.sql.types import StructField, StructType

    # Output schema mirrors the input column's type — hardcoding string
    # would silently type-mismatch the downstream semi-join for integer
    # ID columns (ADVICE r5).
    out_schema = StructType([StructField(col, df.schema[col].dataType)])
    summaries = df.select(col).mapInPandas(
        _mg_partition(col, capacity), schema=out_schema
    )
    return summaries.distinct()


def exact_heavy_hitters(
    df: DataFrame,
    col: str,
    capacity: int,
    threshold_frac: float,
    total: DataFrame | None = None,
) -> DataFrame:
    """Exact values of ``col`` with frequency >= threshold_frac * N.

    Two scans: (1) the bounded-memory candidate pass, (2) an exact
    count restricted to candidates via a broadcast semi-join (the
    shuffle carries only candidate partials — at most
    capacity·partitions groups, regardless of true cardinality).
    ``threshold_frac`` must exceed 1/(capacity+1) or the sketch cannot
    guarantee the candidate set covers the answer — fail loudly rather
    than silently under-report.

    Returns (col, cnt, n_total) — the caller applies its own output
    shaping. ``n_total`` rides a 1-row broadcast (the q52/q83 scalar
    pattern), never a global window. Pass ``total`` (a 1-row frame with
    a double ``n_total`` column) when the caller can derive the row
    count more cheaply than re-scanning ``df`` — e.g. summing array
    sizes on the pre-explode table.
    """
    if threshold_frac <= 1.0 / (capacity + 1):
        raise ValueError(
            "exact_heavy_hitters: threshold_frac "
            f"{threshold_frac} <= 1/(capacity+1) = {1.0 / (capacity + 1):.6f}; "
            "raise capacity or the threshold"
        )
    cands = mg_candidates(df, col, capacity)
    if total is None:
        total = df.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    counts = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(threshold_frac) * F.col("n_total"))
    )
