"""Hybrid retrieval: reciprocal-rank fusion (operators/relevance.rrf_fuse)
and the q114 composition (BM25 top-20 + cosine top-20 → RRF top-10).

q114's cross-engine parity is covered by the generic oracle harness
(tests/test_queries_oracle.py) — it registers like every other query.
These tests pin the operator semantics the oracle can't see from the
outside: the per-list sentinel/contribution arithmetic, fusion of an
id ranked by both lists, k0 damping, and the scale contract that the
fused exchange only ever carries the already-cut candidate rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.operators.relevance import rrf_fuse

SF = "/root/testdata/sf0.001"


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rnk long")


def test_rrf_sums_contributions_and_sentinels(spark):
    lex = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    vec = _ranked(spark, [(2, 1), (4, 2)])
    out = {
        r.doc_id: r
        for r in rrf_fuse({"lex": lex, "vec": vec}).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 2 is in both lists: term sum; others carry one term + sentinel 0
    assert out[2].lex_rnk == 2 and out[2].vec_rnk == 1
    assert out[2].rrf == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert out[1].lex_rnk == 1 and out[1].vec_rnk == 0
    assert out[1].rrf == pytest.approx(1 / 61, abs=1e-6)
    assert out[4].lex_rnk == 0 and out[4].vec_rnk == 2
    assert out[4].rrf == pytest.approx(1 / 62, abs=1e-6)
    # sentinel columns stay integer-typed (no NULL → float64 upcast on fetch)
    fused = rrf_fuse({"lex": lex, "vec": vec})
    assert dict(fused.dtypes)["lex_rnk"] == "bigint"
    assert dict(fused.dtypes)["vec_rnk"] == "bigint"


def test_rrf_k0_damping_and_single_list(spark):
    lex = _ranked(spark, [(7, 1), (8, 2)])
    out = {r.doc_id: r.rrf for r in rrf_fuse({"lex": lex}, k0=10).collect()}
    assert out[7] == pytest.approx(1 / 11, abs=1e-6)
    assert out[8] == pytest.approx(1 / 12, abs=1e-6)


def test_rrf_rejects_empty_input():
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse({})


def test_rrf_three_lists_fixed_association(spark):
    """3+ lists sum their terms AFTER the aggregation, left-to-right in
    sorted list-name order (ADVICE r10): the fused double must equal
    the same fixed-order Python recompute bit-for-bit BEFORE the
    6-decimal round is even considered, independent of registration
    order."""
    lists = {
        "lex": [(1, 1), (2, 2), (3, 3)],
        "vec": [(2, 1), (3, 2), (4, 3)],
        "graph": [(3, 1), (1, 2), (5, 3)],
    }
    frames = {n: _ranked(spark, rows) for n, rows in lists.items()}
    out = {r.doc_id: r for r in rrf_fuse(frames, k0=60).collect()}
    # reversed registration order must fuse identically
    rev = {
        r.doc_id: r
        for r in rrf_fuse(dict(reversed(list(frames.items()))), k0=60).collect()
    }
    ranks = {}
    for n, rows in lists.items():
        for d, rk in rows:
            ranks.setdefault(d, {})[n] = rk
    for d, by_list in ranks.items():
        acc = 0.0
        for n in sorted(lists):  # the operator's fixed association
            acc = acc + (1.0 / (60 + by_list[n]) if n in by_list else 0.0)
        want = round(acc, 6)
        # the two engine-side fusions must agree EXACTLY (same fixed
        # association regardless of registration order); the Python
        # recompute is approximate only because round() is banker's
        # where the operator's DECIMAL round is HALF_UP
        assert out[d].rrf == rev[d].rrf, (d, out[d].rrf, rev[d].rrf)
        assert out[d].rrf == pytest.approx(want, abs=1e-9), (d, out[d].rrf)
        for n in lists:
            assert out[d][f"{n}_rnk"] == by_list.get(n, 0)


def test_q114_fused_scores_recompute_from_candidate_lists(spark):
    """The registered query's fused output must equal a driver-side
    recompute from its own two candidate lists — pins that fusion adds
    exactly the two lists' terms and nothing else (the oracle would
    also catch this, but from outside the operator boundary)."""
    from cdc_example_spark.queries import all_queries

    q = all_queries()["q114_hybrid_rrf_search"]
    got = q.spark(spark, SF).collect()
    assert 0 < len(got) <= 10

    # rebuild the two lists exactly as the query does
    from cdc_example_spark.functions import vector as V
    from cdc_example_spark.operators import relevance as R
    from cdc_example_spark.queries.util import dec2
    from cdc_example_spark.sources.catalog import load_doc_tokens, load_table

    toks = load_doc_tokens(spark, SF).filter(F.col("doc_id") != 0)
    lex_rows = (
        R.bm25_rank(toks, ("hash", "merge", "scan"), k=20, tokens_col="ws")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .collect()
    )
    lex = {r.doc_id: i + 1 for i, r in enumerate(lex_rows)}
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    probe = emb.filter(F.col("doc_id") == 0).select(F.col("v").alias("qv"))
    vec_rows = (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("doc_id", dec2(V.cosine(F.col("v"), F.col("qv"))).alias("c"))
        .orderBy(F.col("c").desc(), "doc_id")
        .limit(20)
        .collect()
    )
    vec = {r.doc_id: i + 1 for i, r in enumerate(vec_rows)}

    expected = {}
    for d in set(lex) | set(vec):
        s = (1.0 / (60 + lex[d]) if d in lex else 0.0) + (
            1.0 / (60 + vec[d]) if d in vec else 0.0
        )
        expected[d] = (lex.get(d, 0), vec.get(d, 0), round(s, 6))
    top = sorted(expected.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    assert [(r.doc_id, r.lex_rnk, r.vec_rnk, round(r.rrf, 6)) for r in got] == [
        (d, lx, vc, s) for d, (lx, vc, s) in top
    ]


def test_q115_vector_branch_serves_from_pruned_index(spark):
    """The indexed hybrid's vector branch must read the persisted IVF2
    layout with a non-trivial partition predicate (directory pruning),
    never a full-corpus cosine scan — the q115 scale contract."""
    from cdc_example_spark.plans.audit import explain_formatted
    from cdc_example_spark.queries import all_queries

    plan = explain_formatted(
        all_queries()["q115_hybrid_rrf_indexed"].spark(spark, SF)
    )
    pf = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "coarse" in ln
    ]
    assert pf, plan
    # both candidate cuts + the final top-10 stay below the fusion
    cuts = plan.count("TakeOrderedAndProject") + plan.count("GlobalLimit")
    assert cuts >= 3, plan
    assert "CartesianProduct" not in plan


def test_q115_probe_selection_is_the_only_approximation(spark):
    """q62-discipline recall pin, regeneration-proof form: (a) probing
    EVERY (coarse, fine) cell reproduces the brute top-20 exactly, and
    (b) the registered 2×2-probe serve equals the brute top-20 computed
    WITHIN the probed cells — so the approximation comes only from
    probe selection, never the layout, the join, or the rank. Absolute
    recall is probe-fraction-bound on the near-uniform synthetic
    embeddings (measured 0.60 at sf0.001, 4 of 9 directories) and the
    testdata regenerates per round, so the pin is structural, with a
    loose sanity floor."""
    import numpy as np

    from cdc_example_spark.operators.similarity import (
        cosine_topk,
        ivf2_probe_pairs,
        ivf2_topk_indexed,
    )
    from cdc_example_spark.queries.llm import trained_ivf2
    from cdc_example_spark.sources.catalog import load_table

    coarse, fines, path = trained_ivf2(spark, SF)
    emb = load_table(spark, SF, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)

    brute = [r.vec_id for r in cosine_topk(emb, probe, k=20).collect()]
    full = [
        r.vec_id
        for r in ivf2_topk_indexed(
            spark, path, probe, coarse, fines, k=20,
            n_probe_coarse=len(coarse), n_probe_fine=len(fines[0]),
        ).collect()
    ]
    assert full == brute

    qv = np.asarray(probe.collect()[0].embedding, dtype=np.float64)
    pairs = set(ivf2_probe_pairs(qv, coarse, fines, 2, 2))
    idx = spark.read.parquet(path)
    in_cells = idx.filter(
        F.array_contains(
            F.array(
                *[
                    F.array(F.lit(c), F.lit(f))
                    for c, f in sorted(pairs)
                ]
            ),
            F.array(F.col("coarse"), F.col("fine")),
        )
    ).select(F.col("vec_id"), F.col("v").alias("embedding"))
    brute_in_cells = [
        r.vec_id for r in cosine_topk(in_cells, probe, k=20).collect()
    ]
    served = [
        r.vec_id
        for r in ivf2_topk_indexed(
            spark, path, probe, coarse, fines, k=20,
            n_probe_coarse=2, n_probe_fine=2,
        ).collect()
    ]
    assert served == brute_in_cells
    # loose floor: must beat a fifth of the list even on uniform data
    assert len(set(served) & set(brute)) >= 4


def test_q115_fused_scores_recompute_from_candidate_lists(spark):
    """q115's fused output equals a driver-side RRF recompute from its
    own two candidate lists (the q114 pin, vector side swapped to the
    index serve)."""
    from cdc_example_spark.operators import relevance as R
    from cdc_example_spark.operators.similarity import ivf2_topk_indexed
    from cdc_example_spark.queries import all_queries
    from cdc_example_spark.queries.llm import trained_ivf2
    from cdc_example_spark.queries.util import dec2
    from cdc_example_spark.sources.catalog import load_doc_tokens, load_table

    got = all_queries()["q115_hybrid_rrf_indexed"].spark(spark, SF).collect()
    assert 0 < len(got) <= 10

    toks = load_doc_tokens(spark, SF).filter(F.col("doc_id") != 0)
    lex_rows = (
        R.bm25_rank(toks, ("hash", "merge", "scan"), k=20, tokens_col="ws")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .collect()
    )
    lex = {r.doc_id: i + 1 for i, r in enumerate(lex_rows)}
    coarse, fines, path = trained_ivf2(spark, SF)
    probe = load_table(spark, SF, "embeddings").filter(F.col("vec_id") == 0)
    vec_rows = (
        ivf2_topk_indexed(
            spark, path, probe, coarse, fines, k=20,
            n_probe_coarse=2, n_probe_fine=2,
        )
        .select("vec_id", dec2(F.col("cos_sim")).alias("c"))
        .orderBy(F.col("c").desc(), "vec_id")
        .collect()
    )
    vec = {r.vec_id: i + 1 for i, r in enumerate(vec_rows)}

    expected = {}
    for d in set(lex) | set(vec):
        s = (1.0 / (60 + lex[d]) if d in lex else 0.0) + (
            1.0 / (60 + vec[d]) if d in vec else 0.0
        )
        expected[d] = (lex.get(d, 0), vec.get(d, 0), round(s, 6))
    top = sorted(expected.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    assert [(r.doc_id, r.lex_rnk, r.vec_rnk, round(r.rrf, 6)) for r in got] == [
        (d, lx, vc, s) for d, (lx, vc, s) in top
    ]


def test_q114_fusion_input_is_bounded_rows(spark):
    """Scale pin: both fusion inputs end in a top-k cut (limit 20), so
    the union the fused aggregate consumes is ≤40 rows at ANY corpus
    size — the plan must carry the two GlobalLimit/TakeOrdered cuts
    BELOW the fused aggregation, and never a corpus-sized exchange into
    it."""
    from cdc_example_spark.plans.audit import explain_formatted
    from cdc_example_spark.queries import all_queries

    plan = explain_formatted(all_queries()["q114_hybrid_rrf_search"].spark(spark, SF))
    # the two candidate cuts + the final top-10 cut
    cuts = plan.count("TakeOrderedAndProject") + plan.count("GlobalLimit")
    assert cuts >= 3, plan
    assert "CartesianProduct" not in plan
