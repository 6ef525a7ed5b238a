"""Misra-Gries heavy hitters (q81) and blocked-Levenshtein fuzzy
dedup (q82) — operator-level pins beyond the driver's oracle rows.

The MG tests pin the sketch's classical guarantee (candidate coverage
of every above-threshold item) and the exactness of the two-pass
composition; the Levenshtein tests pin the blocked operator against a
straight-line Python re-implementation of the declared semantics
(same blocking predicate, same signature, stdlib edit distance).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.dedup import blocked_levenshtein_pairs
from cdc_example_spark.operators.frequency import (
    exact_heavy_hitters,
    mg_candidates,
)
from cdc_example_spark.sources.catalog import load_table


def _zipf_stream(seed: int, n: int, vocab: int) -> list[str]:
    rng = random.Random(seed)
    # Zipf-ish: item i has weight 1/(i+1); a handful of genuinely
    # heavy tokens over a long tail — the regime MG is for.
    weights = [1.0 / (i + 1) for i in range(vocab)]
    return [f"t{i}" for i in rng.choices(range(vocab), weights, k=n)]


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_mg_candidates_cover_all_heavy_items(spark, seed):
    n, vocab, capacity = 20_000, 400, 16
    stream = _zipf_stream(seed, n, vocab)
    df = spark.createDataFrame(
        [(t,) for t in stream], "token string"
    ).repartition(8)  # multiple partitions: the union-of-summaries path
    cands = {r.token for r in mg_candidates(df, "token", capacity).collect()}
    # classical guarantee: every item with freq > N/(capacity+1) survives
    from collections import Counter

    counts = Counter(stream)
    heavy = {t for t, c in counts.items() if c > n / (capacity + 1)}
    assert heavy, "test stream must contain heavy items"
    assert heavy <= cands
    # bounded output: at most capacity rows per partition
    assert len(cands) <= capacity * 8


@pytest.mark.parametrize("seed", [3, 47])
def test_exact_heavy_hitters_match_plain_groupby(spark, seed):
    n, vocab, capacity, frac = 10_000, 300, 24, 0.05
    stream = _zipf_stream(seed, n, vocab)
    df = spark.createDataFrame(
        [(t,) for t in stream], "token string"
    ).repartition(6)
    got = {
        (r.token, r.cnt)
        for r in exact_heavy_hitters(df, "token", capacity, frac).collect()
    }
    from collections import Counter

    counts = Counter(stream)
    want = {(t, c) for t, c in counts.items() if c >= frac * n}
    assert got == want


def test_exact_heavy_hitters_rejects_uncoverable_threshold(spark):
    df = spark.createDataFrame([("a",)], "token string")
    with pytest.raises(ValueError, match="threshold_frac"):
        exact_heavy_hitters(df, "token", capacity=9, threshold_frac=0.05)


def _py_levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocked_levenshtein_matches_python_bruteforce(spark, sf_dir):
    """The operator == the declared semantics, computed row-at-a-time
    in Python: same lang, |len diff| <= band, banded distance over the
    sorted-token 96-char prefix signature. The bucket +/-1 expansion
    must lose NO qualifying pair (|n1-n2| <= W implies bucket diff <= 1).
    """
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.substring(
            F.array_join(
                F.array_sort(F.split(F.trim(F.lower("text")), r"\s+")), " "
            ),
            1,
            96,
        ).alias("sig"),
    ).collect()
    want = set()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for group in by_lang.values():
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                a, b = group[i], group[j]
                if abs(a.nc - b.nc) > 24:
                    continue
                d = _py_levenshtein(a.sig, b.sig)
                if d <= 12:
                    id1, id2 = sorted((a.doc_id, b.doc_id))
                    want.add((id1, id2, a.lang, d))
    got = {
        (r.id1, r.id2, r.lang, r.dist)
        for r in blocked_levenshtein_pairs(docs).collect()
    }
    assert got == want


def test_blocked_levenshtein_each_pair_emitted_once(spark, sf_dir):
    """The 3-bucket probe explode can co-locate a pair in more than one
    bucket only when the pair spans a bucket boundary — the id1<id2 +
    single-meeting-bucket construction must still emit it exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    out = blocked_levenshtein_pairs(docs)
    assert out.count() == out.select("id1", "id2").distinct().count()


def test_lsh_levenshtein_scale_tier_recall_and_exactness(spark, sf_dir):
    """The 100 TB fuzzy-dedup tier (r9): LSH candidates over
    SIG-shingles → banded-DP verify. Pins against the attribute tier's
    exhaustive-in-block truth at the contract sf:
      - distances agree exactly on every shared pair;
      - recall is 1.0 for every pair at dist ≤ 2/3 of the threshold
        (the comfortably-qualifying pairs);
      - overall in-block recall ≥ 0.6 (threshold-edge pairs have
        sig-Jaccard → 0 by construction — the declared S-curve);
      - all emitted pairs verify (id1 < id2, 0 ≤ dist ≤ max_dist)."""
    from cdc_example_spark.operators.dedup import lsh_levenshtein_pairs

    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.id1, r.id2): r.dist
        for r in blocked_levenshtein_pairs(docs).collect()
    }
    got_rows = lsh_levenshtein_pairs(docs).collect()
    got = {(r.id1, r.id2): r.dist for r in got_rows}
    assert all(r.id1 < r.id2 and 0 <= r.dist <= 12 for r in got_rows)
    shared = set(truth) & set(got)
    assert all(truth[p] == got[p] for p in shared)
    comfortable = {p for p, d in truth.items() if d <= 8}
    assert comfortable <= set(got), comfortable - set(got)
    if truth:
        assert len(shared) / len(truth) >= 0.6
