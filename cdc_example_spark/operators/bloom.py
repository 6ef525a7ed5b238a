"""Distributed Bloom-filter build + closed-form probe expression.

The 100 TB decontamination / semi-join problem has two regimes. When
the filter set is small (eval benchmarks, MBs), broadcast the raw set
and intersect map-side — operators/text_analysis.contamination_overlap
(q55). When the filter set is itself huge (a billion-key dedup ledger,
a full holdout corpus), the raw set cannot broadcast — but a Bloom
filter over it still can: at 10 bits/key a 10^9-key set is ~1.2 GB of
bitmap vs hundreds of GB of keys, and the probe is a handful of
hash+shift instructions per row, fully inside whole-stage codegen. The
pattern is bloom-prefilter (map-side, no false negatives) -> exact
confirm join on the tiny surviving fraction, so the shuffle that the
exact join needs moves ~p*N rows instead of N. Spark's own runtime
row-level filtering uses the identical trick for join pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
makes it available as an explicit, composable step with a pinned
deterministic layout (xxhash64 seeds 0..k-1, pmod placement) so
results are reproducible across sessions and engines.

Reference parity: the reference has no analytics surface at all
(SURVEY.md §2.1); this is part of the mandated LLM-pipeline extension
(BASELINE.json:6), same family as q55's decontamination.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int = 4) -> list[int]:
    """Build an m_bits-wide Bloom bitmap over ``df[col]`` (any
    hashable type) and return it as a dense list of m_bits/64 longs.

    Fully distributed until the last step: each row fans out to its k
    bit positions (xxhash64 seeded 0..k-1, pmod m), positions partial-
    aggregate to (word_idx, bit_or(mask)) — at most m/64 groups — and
    only the finished bitmap words reach the driver. The collect is
    bounded by CONSTRUCTION at m_bits/64 longs (8 KB per 2^16 bits)
    regardless of input cardinality, which is the whole point: the
    input may be too big to broadcast, the bitmap never is.
    """
    if m_bits % _WORD_BITS != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            # call_function: the pyspark shiftleft wrapper only takes a
            # python-int bit count, but the SQL function shifts by an
            # expression just fine
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % _WORD_BITS).cast("int"),
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()  # bounded: <= m_bits/64 rows by construction
    )
    out = [0] * (m_bits // _WORD_BITS)
    for r in words:
        out[r.word_idx] = r.word
    return out


def bloom_might_contain(
    col: Column | str, words: list[int], m_bits: int, k: int = 4
) -> Column:
    """Probe expression: true iff all k bits for ``col`` are set in the
    bitmap built by :func:`bloom_build` with the same (m_bits, k).

    The bitmap rides the plan as ONE array<long> literal (8 KB at
    2^16 bits — task-binary sized, not a broadcast variable), and the
    probe is k chains of hash -> shift -> element_at -> bit test, all
    JVM expressions inside codegen. No false negatives (every build
    bit for a present key is set); false positives are whatever the
    (m, k, n) math says and MUST be scrubbed by an exact confirm join
    downstream when exactness matters.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.lit(words)
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + F.lit(1))
        bit = (pos % _WORD_BITS).cast("int")
        tests.append(
            F.call_function("shiftrightunsigned", word, bit).bitwiseAND(
                F.lit(1)
            )
            == 1
        )
    return reduce(lambda a, b: a & b, tests)
