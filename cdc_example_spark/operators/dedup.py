"""Deduplication operators: exact, MinHash+LSH, SimHash, shingle-Jaccard.

Scale shapes (the whole point of each variant):

- exact: shuffle 32-byte content hashes, never the documents.
- MinHash signature: pure per-row array expressions (no explode, no
  shuffle) → k-integer signature per doc.
- LSH banding: explode k/r band keys per doc (constant factor), shuffle
  8-byte band hashes, self-join only within buckets — candidate pairs
  ∝ true near-dups, not |docs|².
- SimHash: per-row 32-bit sketch; near-dup test is a cheap
  bit_count(xor) over candidate pairs.
- exact shingle-Jaccard: the verification oracle for the approximate
  paths (quadratic in bucket size — run it on LSH candidates only).

All JVM-side higher-order functions; the deterministic polynomial word
fingerprint (functions.text.word_fingerprint) keeps every hash
reproducible in plain SQL on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.functions import text as T

#: MinHash modulus and deterministic per-permutation coefficients.
MINHASH_P = 1_000_000_007


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for h_i(x) = (a_i·x + b_i) mod P — fixed, documented,
    reproducible in the SQL oracle."""
    return [(2 * i + 1, 97 * i + 13) for i in range(num_hashes)]


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key row per normalized content hash."""
    w = Window.partitionBy(T.content_hash(F.col(text_col))).orderBy(key_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def word_fp_set(text: Column) -> Column:
    """Distinct polynomial fingerprints of the document's tokens."""
    return F.array_distinct(F.transform(T.words(F.lower(text)), T.word_fingerprint))


def minhash_signature(text: Column, num_hashes: int = 8) -> Column:
    """k-wise-independent-ish MinHash signature as array<long>.

    No shuffle, no Python: transform+array_min over the token
    fingerprint set. Empty docs get P (sentinel > any hash).
    """
    fps = word_fp_set(text)

    def perm(a: int, b: int):
        return lambda f: (a * f + b) % F.lit(MINHASH_P)

    mins = [
        F.coalesce(F.array_min(F.transform(fps, perm(a, b))), F.lit(MINHASH_P))
        for a, b in minhash_coeffs(num_hashes)
    ]
    return F.array(*mins)


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Fold each signature band to one long key → array<struct<band,key>>."""
    entries = []
    for b in range(bands):
        band_slice = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        key = F.aggregate(
            band_slice,
            F.lit(17).cast("long"),
            lambda acc, x: (acc * 31 + x) % F.lit(MINHASH_P),
        )
        entries.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*entries)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MinHash-LSH candidate pairs (key_1 < key_2, distinct).

    Docs sharing ≥1 band key are candidates. ``group_cols`` (e.g. lang)
    further partition the buckets.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes)
    banded = df.select(
        F.col(key_col).alias("k"),
        *[F.col(c) for c in group_cols],
        F.explode(lsh_band_keys(sig, bands, rows_per_band)).alias("bk"),
    ).select("k", *group_cols, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.k") < F.col("b.k"))
    )
    for c in group_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(F.col("a.k").alias(f"{key_col}_1"), F.col("b.k").alias(f"{key_col}_2"))
        .distinct()
    )


def simhash32(text: Column) -> Column:
    """32-bit SimHash over token fingerprints, as a long.

    Per bit: majority vote of the token fingerprints' bit values
    (+1/−1); bit set iff the vote is positive. Bit extraction uses
    floor-div/mod so the SQL oracle can reproduce it verbatim.
    """
    fps = word_fp_set(text)

    def bit_vote(p: float):
        return lambda acc, f: acc + (F.floor(f / F.lit(p)).cast("long") % 2) * 2 - 1

    bit_terms = []
    for bit in range(32):
        vote = F.aggregate(fps, F.lit(0).cast("long"), bit_vote(float(2**bit)))
        bit_terms.append(F.when(vote > 0, F.lit(int(2**bit)).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    group_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Pairs whose SimHash Hamming distance ≤ max_hamming.

    Pairing is grouped (lang / shard) to bound the quadratic term; the
    scale path blocks on SimHash prefix bands like LSH.
    """
    s = df.select(
        F.col(key_col).alias("k"), *(F.col(c) for c in group_cols), simhash32(F.col(text_col)).alias("sh")
    )
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    for c in group_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn("hamming", F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.k").alias(f"{key_col}_1"),
            F.col("b.k").alias(f"{key_col}_2"),
            "hamming",
        )
    )
