"""Text-analysis column expressions (LLM-pipeline surface).

All JVM-side (split / transform / aggregate / regexp) — these run inside
whole-stage codegen, so the 100 TB document sweep never crosses into
Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the rolling fingerprint (fits comfortably in int64 math:
#: acc < 1e9+7, acc*31 + 255 < 3.2e10 << 2^63).
FP_MOD = 1_000_000_007


def normalized(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, trimmed."""
    return F.lower(F.trim(text))


def content_hash(text: Column) -> Column:
    """SHA-256 hex of the normalized text — the exact-dedup key."""
    return F.sha2(normalized(text), 256)


def words(text: Column) -> Column:
    """Whitespace tokens of the trimmed text."""
    return F.split(F.trim(text), r"\s+")


def word_count(text: Column) -> Column:
    return F.size(words(text))


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash of the normalized text.

    h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod FP_MOD).
    Deterministic and reproducible in plain SQL on any engine (the
    DuckDB oracle replays the identical fold), unlike engine-native
    hash()/xxhash64 whose algorithms differ between engines.
    """
    return _char_fold(normalized(text))


def word_fingerprint(word: Column) -> Column:
    """Same polynomial fold applied to a single token (for SimHash/MinHash)."""
    return _char_fold(word)


def _char_fold(s: Column) -> Column:
    # Spark's split(s, '') keeps a trailing '' (Java split, limit -1);
    # DuckDB's string_split does not — filter empties so both engines
    # fold the identical char sequence.
    chars = F.filter(F.split(s, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(FP_MOD),
    )

def shingles(ws: Column, n: int = 3) -> Column:
    """n-word shingles of a token array; empty when the doc is shorter
    than n (guarded: sequence(1, 0) would DESCEND, not produce empty).

    Mirrors queries/llm._SHINGLES, as a reusable Column form. Two
    performance contracts for callers:

    - ``ws`` MUST be a NAMED column (``.alias`` the split in a prior
      select), never the inline ``split()`` expression: this function
      references its input 4× (size + n element_at), and an inline
      expression tree is copied into every reference site — the split
      then re-runs per transform element, O(words²) per doc (measured
      20× at sf0.1). A named column survives because CollapseProject
      refuses to duplicate expensive multiply-referenced expressions.
    - never feed the result through array_distinct under a later
      explode — InferFiltersFromGenerate inlines the whole expression
      into a derived filter (measured 14× slower, see queries/llm.py).
      Explode first, dedup after.
    """
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
