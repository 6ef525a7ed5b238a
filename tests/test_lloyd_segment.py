"""Unit tests for the round-6 late additions: the distributed Lloyd
refinement step (operators/similarity.lloyd_refine, q100) and the
cross-corpus segment span dedup (operators/dedup.segment_dedup_stats,
q101). Both get an INDEPENDENT reference implementation here — NumPy
for Lloyd, a dict-based first-occurrence model for the span dedup —
so the DuckDB oracle is not the only cross-check.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from cdc_example_spark.operators.dedup import segment_dedup_stats
from cdc_example_spark.operators.similarity import lloyd_refine


def _numpy_lloyd_reference(X: np.ndarray, C: np.ndarray):
    """Replicates lloyd_refine's contract exactly: argmax-dot assign
    (tie -> lowest cid), per-cell mean, renormalize, ROUND 6 dp,
    rescore ROUND 9 dp, argmax (tie -> lowest cid)."""
    sims0 = X @ C.T
    # argmax with ties to the LOWEST index — np.argmax already does that
    a0 = sims0.argmax(axis=1)
    cells = sorted(set(a0.tolist()))
    C1_rows = {}
    for j in cells:
        m = X[a0 == j].mean(axis=0)
        m = m / np.linalg.norm(m)
        C1_rows[j] = np.round(m, 6)
    cids = np.array(cells)
    C1 = np.vstack([C1_rows[j] for j in cells])
    sims1 = np.round(X @ C1.T, 9)
    a1 = cids[sims1.argmax(axis=1)]
    s1 = sims1.max(axis=1)
    return a0, a1, s1


def test_lloyd_refine_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 8))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = rng.normal(size=(3, 8))
    C = C / np.linalg.norm(C, axis=1, keepdims=True)

    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.cell0, r.cell1, r.score1)
        for r in lloyd_refine(df, [list(map(float, c)) for c in C]).collect()
    }
    a0, a1, s1 = _numpy_lloyd_reference(X, C)
    assert len(got) == len(X)
    for i in range(len(X)):
        c0, c1, s = got[i]
        assert c0 == a0[i], f"vec {i}: cell0 {c0} != numpy {a0[i]}"
        assert c1 == a1[i], f"vec {i}: cell1 {c1} != numpy {a1[i]}"
        assert s == pytest.approx(s1[i], abs=2e-9)


def test_lloyd_refine_vectorized_tier_matches_expr_tier(spark):
    """Tier parity pin (VERDICT r6 item 3): the registered BLAS tier
    (vectorized=True — q100's plan) must agree with the expr tier the
    DuckDB oracle replays on cell0, cell1, and score1 for every vector.
    Random corpus, corpus-sized-ish k relative to n, plus the test
    corpus at the pinned driver tier when present."""
    rng = np.random.default_rng(23)
    X = rng.normal(size=(200, 16))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = rng.normal(size=(11, 16))
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    cents = [list(map(float, c)) for c in C]
    expr = {
        r.vec_id: (r.cell0, r.cell1, r.score1)
        for r in lloyd_refine(df, cents).collect()
    }
    blas = {
        r.vec_id: (r.cell0, r.cell1, r.score1)
        for r in lloyd_refine(df, cents, vectorized=True).collect()
    }
    assert set(expr) == set(blas) and len(expr) == len(X)
    for i in expr:
        assert expr[i][0] == blas[i][0], f"vec {i} cell0 tier mismatch"
        assert expr[i][1] == blas[i][1], f"vec {i} cell1 tier mismatch"
        assert blas[i][2] == pytest.approx(expr[i][2], abs=2e-9)


def test_lloyd_refine_vectorized_parity_on_test_corpus(spark, sf_dir):
    """Same tier-parity pin on the real embeddings table with the
    corpus-sized trained centroids — the exact inputs q100 registers."""
    from cdc_example_spark.queries.llm import trained_centroids
    from cdc_example_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = trained_centroids(spark, sf_dir)
    expr = {
        r.vec_id: (r.cell0, r.cell1, r.score1)
        for r in lloyd_refine(emb, cents).collect()
    }
    blas = {
        r.vec_id: (r.cell0, r.cell1, r.score1)
        for r in lloyd_refine(emb, cents, vectorized=True).collect()
    }
    assert expr.keys() == blas.keys()
    mism = [
        i
        for i in expr
        if expr[i][:2] != blas[i][:2] or abs(expr[i][2] - blas[i][2]) > 2e-9
    ]
    assert mism == [], f"{len(mism)} tier mismatches, first: {mism[:5]}"


def test_lloyd_refine_reduces_movement_on_second_step(spark):
    """Lloyd monotonicity smoke: re-running the step from the refined
    centroids moves no MORE vectors than the first step did (on a
    well-separated synthetic mixture it should strictly shrink)."""
    rng = np.random.default_rng(11)
    centers = np.eye(4)[:3]  # 3 well-separated unit centers in R^4
    X = np.vstack(
        [c + 0.05 * rng.normal(size=(40, 4)) for c in centers]
    )
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    # deliberately bad init: all three seeds near the FIRST center
    init = [
        [1.0, 0.0, 0.0, 0.0],
        [0.98, 0.199, 0.0, 0.0],
        [0.98, 0.0, 0.199, 0.0],
    ]
    step1 = lloyd_refine(df, init).collect()
    moved1 = sum(1 for r in step1 if r.cell0 != r.cell1)
    # feed the refined centroids back in (recompute them the same way)
    a0 = {r.vec_id: r.cell0 for r in step1}
    # reconstruct refined centroids per the operator contract
    refined = []
    for j in range(3):
        members = np.vstack([X[i] for i in range(len(X)) if a0[i] == j])
        m = members.mean(axis=0)
        refined.append([float(x) for x in np.round(m / np.linalg.norm(m), 6)])
    step2 = lloyd_refine(df, refined).collect()
    moved2 = sum(1 for r in step2 if r.cell0 != r.cell1)
    assert moved2 <= moved1
    assert moved1 > 0  # the bad init must actually exercise movement


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, lang, text.split(" ")) for i, (lang, text) in enumerate(rows)],
        "doc_id long, lang string, ws array<string>",
    )


def test_segment_dedup_first_occurrence_model(spark):
    """Synthetic corpus with known span structure, seg_len=4:
    doc0: 8 unique tokens -> 2 segments, both kept.
    doc1: exact copy of doc0 -> 0 kept (fully deduped).
    doc2: first 4 tokens copied from doc0's first segment + 4 fresh
          tokens -> keeps only its second segment.
    doc3: the SAME 4-token segment twice -> within-doc repeat also
          drops (1 kept of 2).
    """
    d0 = "a b c d e f g h"
    docs = _mk_docs(
        spark,
        [
            ("en", d0),
            ("en", d0),
            ("en", "a b c d x y z w"),
            ("de", "p q r s p q r s"),
        ],
    )
    got = {
        r.doc_id: (r.n_segs, r.n_kept)
        for r in segment_dedup_stats(docs, seg_len=4).collect()
    }
    assert got == {0: (2, 2), 1: (2, 0), 2: (2, 1), 3: (2, 1)}


def test_segment_dedup_trailing_partial_chunk_counts(spark):
    docs = _mk_docs(spark, [("en", "a b c d e")])  # 5 tokens, seg_len=4
    (row,) = segment_dedup_stats(docs, seg_len=4).collect()
    assert (row.n_segs, row.n_kept) == (2, 2)
    # and the trailing 1-token chunk does NOT collide with a full
    # segment that merely starts with the same token
    docs2 = _mk_docs(spark, [("en", "a b c d e"), ("en", "e x y z")])
    stats = {
        r.doc_id: (r.n_segs, r.n_kept)
        for r in segment_dedup_stats(docs2, seg_len=4).collect()
    }
    assert stats == {0: (2, 2), 1: (1, 1)}


def test_segment_dedup_empty_token_array_yields_no_segments(spark):
    """A zero-token doc must contribute ZERO segments (ADVICE r6:
    F.sequence(0, -1) defaults to step -1 and would emit [0, -1] — two
    phantom empty-string segments poisoning first-occurrence state).
    The empty doc emits no output row (oracle parity) and must not
    steal first-occurrence from a real doc's segments either.
    """
    docs = spark.createDataFrame(
        [(0, "en", []), (1, "en", ["a", "b", "c", "d", "e"])],
        "doc_id long, lang string, ws array<string>",
    )
    got = {
        r.doc_id: (r.n_segs, r.n_kept)
        for r in segment_dedup_stats(docs, seg_len=4).collect()
    }
    assert got == {1: (2, 2)}


def test_segment_dedup_rejects_bad_seg_len(spark):
    docs = _mk_docs(spark, [("en", "a b")])
    with pytest.raises(ValueError):
        segment_dedup_stats(docs, seg_len=0)
