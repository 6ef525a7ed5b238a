"""Physical-plan invariants — the 100 TB review, enforced.

These never execute a query: they compile the plan at sf0.001 and
assert the properties that decide cost at scale (filter pushdown,
column pruning, broadcast dims, no accidental cartesians). A regression
here means "still correct, 100× slower on the cluster".
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.plans import (
    explain_formatted,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    plan_summary,
)
from cdc_example_spark.queries import all_queries
from cdc_example_spark.sources.catalog import load_table

QUERIES = all_queries()


@pytest.fixture(autouse=True)
def _cold_scans(spark):
    # Audit the source-scan plan, not the hot-table cache: at 100 TB the
    # facts exceed the cache ceiling and run exactly this path. Clearing
    # the session cache matters too — Spark's CacheManager substitutes
    # InMemoryRelation into ANY new plan whose subtree matches a cached
    # one (even a fresh spark.read), which would hide the scan we audit.
    from cdc_example_spark.queries import registry
    from cdc_example_spark.sources import catalog

    old = os.environ.get("SPARK_GRAFT_TABLE_CACHE")
    os.environ["SPARK_GRAFT_TABLE_CACHE"] = "0"
    spark.catalog.clearCache()
    registry.invalidate(spark)  # don't audit (or leave behind) shared prepared plans
    try:
        yield
    finally:
        registry.invalidate(spark)
        # clearCache() above unpersisted every loaded-table handle; drop
        # them from the catalog too, so later test modules re-load (and
        # re-persist) instead of silently running on unpersisted handles.
        catalog.invalidate_tables(spark)
        if old is None:
            del os.environ["SPARK_GRAFT_TABLE_CACHE"]
        else:
            os.environ["SPARK_GRAFT_TABLE_CACHE"] = old


def q(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir)


def test_q01_filter_reaches_scan_and_prunes(spark, sf_dir):
    df = q("q01_pricing_summary", spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate")
    # lineitem is 16 columns; Q1 needs 7.
    assert_read_schema_pruned(df, table_cols=16, max_cols=7)


def test_q02_all_range_filters_pushed(spark, sf_dir):
    df = q("q02_forecast_revenue", spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")
    assert_read_schema_pruned(df, table_cols=16, max_cols=4)


def test_q04_dims_broadcast_not_shuffled(spark, sf_dir):
    df = q("q04_customers_per_region", spark, sf_dir)
    assert_broadcast_join(df, min_count=2)  # region and nation
    assert_no_cartesian(df)


def test_q03_no_cartesian_and_pruned(spark, sf_dir):
    df = q("q03_shipping_priority", spark, sf_dir)
    assert_no_cartesian(df)
    assert_pushed_filters(df, "c_mktsegment")


def test_lsh_plan_is_single_scan_no_join(spark, sf_dir):
    # the LSH operator generates pairs INSIDE each (band, key) bucket
    # (operators/dedup.py): the signature pipeline must run once — one
    # scan, no self-join (a join would re-execute it per side), and
    # never a cartesian with post-filter.
    df = q("q32_minhash_lsh_candidates", spark, sf_dir)
    assert_no_cartesian(df)
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["sort_merge_joins"] + s["broadcast_joins"] == 0, s


def test_q113_lsh_fuzzy_dedup_plan_bucketed_no_allpairs(spark, sf_dir):
    # the fuzzy-dedup scale tier (operators/dedup.py
    # lsh_levenshtein_pairs): candidates are generated INSIDE each
    # (band, key, lang) bucket from a collected id array — never an
    # all-pairs self-join, never a cartesian. The only joins in the
    # plan are the two verify lookups attaching the signature column to
    # each candidate side; the signature pipeline for candidate
    # generation runs exactly once (one corpus scan for it, plus one
    # scan per verify lookup = 3 total).
    df = q("q113_lsh_fuzzy_dedup_pairs", spark, sf_dir)
    assert_no_cartesian(df)
    s = plan_summary(df)
    assert s["scans"] == 3, s
    # r10: the two verify lookups must be SHUFFLE joins — both sides
    # grow with the corpus (sigs is corpus-sized, cands output-sized).
    # Catalyst's estimates broadcast both at the 10× shard: the
    # candidate subtree became a broadcast BUILD side and timed out at
    # spark.sql.broadcastTimeout (bench_scaling r10 catch).
    assert s["sort_merge_joins"] == 2, s
    assert s["broadcast_joins"] == 0, s


def test_simhash_pairs_plan_shares_one_sketch_pass(spark, sf_dir):
    # banded SimHash pairing (operators/dedup.py simhash_near_pairs) is
    # a self-join on the band key, but its two sides must be ONE shared
    # exchange (ReuseExchange): exactly one corpus scan, one merge join,
    # never a broadcast (which would re-execute the sketch pipeline per
    # side and has no exchange to reuse).
    df = q("q47_simhash_near_pairs", spark, sf_dir)
    assert_no_cartesian(df)
    # under AQE, exchange reuse happens via runtime stage caching — only
    # the executed (final) plan shows the ReusedExchange / single scan.
    df.collect()
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["sort_merge_joins"] == 1 and s["broadcast_joins"] == 0, s
    assert s["reused_exchanges"] >= 1, s


def test_asof_join_plans_no_join_node(spark, sf_dir):
    # asof_join is the union-merge encoding (operators/asof.py): a
    # range theta-join would plan BroadcastNestedLoopJoin and melt at
    # scale; the encoding must produce ZERO join nodes of any kind.
    df = q("q48_asof_join", spark, sf_dir)
    assert_no_cartesian(df)
    s = plan_summary(df)
    assert s["sort_merge_joins"] + s["broadcast_joins"] == 0, s


def test_snapshot_at_is_partial_agg_not_window(spark, sf_dir):
    # time travel must aggregate (max_by partial agg: one candidate per
    # key per map task) — a row_number window would sort every
    # historical version through one shuffle.
    plan = q("q49_snapshot_at", spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan or "MaxBy" in plan, plan[:2000]
    assert "partial_max_by" in plan or "partial" in plan.lower(), plan[:2000]


def test_scan_count_is_bounded(spark, sf_dir):
    # q24's posting self-join must share ONE scan→shingle→explode pass
    # between its two sides via ReuseExchange — a broadcast join (no
    # exchange to reuse) would re-shingle the corpus once per side.
    df = q("q24_jaccard_neardup_pairs", spark, sf_dir)
    df.collect()  # AQE: reuse only materializes in the final plan
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["sort_merge_joins"] == 1 and s["broadcast_joins"] == 0, s
    assert s["reused_exchanges"] >= 1, s


def test_projection_prunes_documents_scan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    two = docs.select("doc_id", F.length("text").alias("n"))
    # documents has 6 columns; this projection must scan exactly 2.
    assert_read_schema_pruned(two, table_cols=6, max_cols=2)


def test_codegen_covers_batch_queries(spark, sf_dir):
    # AQE only materializes WholeStageCodegen spans in the FINAL plan, so
    # execute first (sf0.001 — milliseconds), then audit.
    for name in ("q01_pricing_summary", "q16_orders_by_month", "q17_case_math_bands"):
        df = q(name, spark, sf_dir)
        df.collect()
        s = plan_summary(df)
        assert s["codegen_spans"] >= 1, (name, s)


# Queries that INTENTIONALLY broadcast a tiny side into a theta-join
# (BroadcastNestedLoopJoin): the cosine top-k family broadcasts the
# query-vector set; IVF broadcasts the centroid set. Everything else
# must stay equi-join shaped, and nothing may plan a CartesianProduct.
BNLJ_INTENTIONAL = {
    "q22_cosine_top5",
    "q30_cosine_topk_multi",
    "q35_pandas_cosine_topk",
    "q36_ivf_topk",
    # trained-IVF recall audit broadcasts its 10-probe side into one
    # theta-join (centroids are inlined literals, not a join at all)
    "q62_ivf_trained_topk",
    # persisted-IVF serving broadcasts the request's 10 probes into a
    # theta-join against the directory-pruned index read
    "q70_ivf_persisted_serving",
    # BM25 broadcasts its 1-row corpus-stats frame (N, avgdl)
    "q52_bm25_search",
    # decontamination broadcasts its 1-row benchmark shingle-set frame
    "q55_decontamination",
    # the curation funnel composes q55's contamination stage and
    # inherits the same 1-row benchmark-shingle broadcast
    "q75_curation_funnel",
    # PPS sampling broadcasts its 1-row sum-of-weights frame into the
    # map-side inclusion filter (same shape as q52's stats frame)
    "q83_pps_sample",
    # heavy hitters broadcasts its 1-row corpus-token-total frame into
    # the threshold filter (the q52/q83 scalar pattern)
    "q81_heavy_hitters",
    # sparse all-pairs cosine broadcasts its 1-row corpus-size frame
    # into the IDF weighting (the q52/q83 scalar pattern)
    "q87_sparse_allpairs_cosine",
    # token-lift broadcasts its 1-row corpus-size frame into the lift
    # expression (the q52/q83 scalar pattern)
    "q98_token_lift",
    # the quality audit broadcasts its 1-row RI-violation frame into
    # the 1-row scalar-metrics frame before the stack() unpivot
    "q88_quality_constraint_audit",
    # source-mix divergence broadcasts its 1-row corpus-token-total
    # frame into the mixture expression (the q52/q83 scalar pattern)
    "q109_source_mix_divergence",
    # bucket-bracket exact percentiles crossJoin two 1-row broadcast
    # frames (global min/max, global bracket range) into the corpus
    # scans — the q52/q83 scalar pattern; the design exists precisely
    # to avoid per-row hash-join probes (measured 4–5 s each at the
    # 60 M shard)
    "q41_percentiles",
    # Lloyd refinement broadcasts its 1-row refined-centroids frame
    # into the HOF argmax reassignment (the q52/q83 scalar pattern)
    "q100_kmeans_lloyd_refine",
    # two-level IVF serving joins the pruned index read to the
    # broadcast probe frame on a non-equi probe-pair containment
    # predicate (the q70 serving shape, one level deeper)
    "q102_ivf2_persisted_serving",
    # quantized serving is the q22/q30 broadcast-probe shape with
    # int8-code payloads (vec_id != query_id non-equi condition)
    "q104_quantized_cosine_topk",
    # hybrid fusion inherits BOTH tiny-1-row broadcast shapes: q52's
    # corpus-stats crossJoin on the lexical side and q22's probe-vector
    # crossJoin on the vector side
    "q114_hybrid_rrf_search",
    # the indexed hybrid swaps the vector side to q102's serving shape:
    # pruned index read joined to the broadcast probe frame on the
    # non-equi probe-pair containment predicate; the lexical side keeps
    # q52's corpus-stats crossJoin
    "q115_hybrid_rrf_indexed",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_query_plans_a_cartesian(name, spark, sf_dir):
    assert_no_cartesian(q(name, spark, sf_dir), allow_bnlj=name in BNLJ_INTENTIONAL)


def test_q37_windows_share_one_exchange(spark, sf_dir):
    # both ranking windows partition by c_nationkey: Catalyst must plan
    # ONE shuffle (plus the final orderBy's range exchange), never one
    # exchange per window function.
    s = plan_summary(q("q37_ranking_family", spark, sf_dir))
    assert s["exchanges"] <= 2, s


def test_q62_recall_audit_is_two_scans_one_window(spark, sf_dir):
    """The single-pass recall audit (queries/llm.q62): centroid
    assignment is inlined codegen literals — NO join against a centroid
    table — and both ranks come from one window, so the plan is exactly
    the corpus scan plus the broadcast 10-probe subscan, with no
    sort-merge join anywhere. The round-2 composition of
    ivf_topk + cosine_topk planned three corpus passes."""
    df = q("q62_ivf_trained_topk", spark, sf_dir)
    # the 10-probe side rides a BNLJ by design (BNLJ_INTENTIONAL)
    assert_no_cartesian(df, allow_bnlj=True)
    s = plan_summary(df)
    assert s["scans"] == 2, s
    assert s["sort_merge_joins"] == 0, s


def test_q65_distribution_windows_share_one_exchange(spark, sf_dir):
    # percent_rank / cume_dist / nth_value all declare the same
    # (partition, order) spec — Catalyst must evaluate them in ONE
    # Window (or two for the distinct frame) over ONE shuffle, plus the
    # final orderBy's range exchange. A per-function exchange would
    # triple the shuffle at scale.
    s = plan_summary(q("q65_window_distribution", spark, sf_dir))
    assert s["exchanges"] <= 2, s


def test_q64_bucketed_join_agg_only_sorts_exchange(spark, sf_dir):
    """The bucketed-lake query's whole point is the exchange count: the
    32-bucket write pre-shuffled both tables on the custkey, so the
    sort-merge join AND the per-custkey aggregate must plan with zero
    shuffle exchanges — the ONLY Exchange allowed is the final ORDER
    BY's range exchange. More than one means bucketing metadata got
    lost (e.g. a plain parquet read instead of spark.table)."""
    df = q("q64_bucketed_colocated_join", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges == 1, plan[:3000]
    assert "rangepartitioning" in plan.lower(), plan[:3000]
    assert "SortMergeJoin" in plan, plan[:3000]


def test_q61_salt_fans_out_and_replicates_dim(spark, sf_dir):
    """The salted join must actually salt: the physical join keys
    include _salt (hot keys spread over salt_factor reducers) and the
    dim side carries a Generate/explode (one replica per salt value).
    Without these the operator silently degenerated to a plain join."""
    df = q("q61_salted_skew_join", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, plan
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert_no_cartesian(df)


def test_q70_persisted_ivf_serving_prunes_cell_directories(spark, sf_dir):
    """The persisted-IVF serving plan (VERDICT r4 item 3) must read the
    index through PARTITION pruning: the probed cells arrive as a
    literal IN-filter on the `cell` directory column, so the scan's
    PartitionFilters carries `cell` and only the probed cell=<cid>
    directories open — at 100 TB that is n_probe/|centroids| of the
    corpus per request, the whole point of the layout. (Promoted from
    the operator-level pin in test_llm_operators.)"""
    df = q("q70_ivf_persisted_serving", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:2000]
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell" in pf, pf
    # the probe side broadcasts; the serving join must not shuffle the
    # index
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_q102_two_level_serving_prunes_both_partition_levels(spark, sf_dir):
    """The two-level index read must prune on BOTH directory columns:
    the probe predicate is a disjunction of (coarse = c AND fine IN
    (...)) partition filters, so a probe opens n_probe_coarse ×
    n_probe_fine of the k1·k2 directories — the multiplicative pruning
    that lifts the flat design's cell ceiling. Join stays broadcast;
    the index never shuffles."""
    df = q("q102_ivf2_persisted_serving", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:2000]
    pf = plan.split("PartitionFilters", 1)[1][:400]
    assert "coarse" in pf and "fine" in pf, pf
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_q87_allpairs_reuses_token_postings_exchange(spark, sf_dir):
    """The inverted-index self-join must REUSE the weighted-postings
    token exchange, not build it twice: both sides of the pair join are
    the same w subtree shuffled on token, so the physical plan should
    carry at least one ReusedExchange. At 100 TB the postings build
    (tokenize + tf + df-join) is the expensive part — paying it once
    vs twice is the difference the pin protects. Also: no cartesian
    beyond the intentional 1-row corpus-size broadcast."""
    df = q("q87_sparse_allpairs_cosine", spark, sf_dir)
    assert_no_cartesian(df, allow_bnlj=True)
    df.collect()  # AQE: reuse only materializes in the final plan
    s = plan_summary(df)
    assert s["reused_exchanges"] >= 1, s


def test_q92_scd2_single_exchange_for_both_windows(spark, sf_dir):
    """The run-collapse lag() and the validity lead() partition and
    order identically (user_id / ts, event_id), so the physical plan
    must pay ONE hash exchange on user_id — two would shuffle the
    changelog twice for no new ordering. At 100 TB the single
    changelog shuffle is the operator's whole cost."""
    df = q("q92_scd2_history", spark, sf_dir)
    s = plan_summary(df)
    # one exchange for the windows + the final single-partition
    # coalesce path for the bounded summary (partial/final agg pair
    # may add its own); the load-bearing bound: no SECOND wide
    # hashpartitioning on user_id
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    user_exchanges = len(
        re.findall(r"hashpartitioning\(user_id", plan)
    )
    assert user_exchanges == 1, f"{user_exchanges} user_id exchanges\n{plan[:3000]}"
    assert_no_cartesian(df)


def test_q95_survivorship_reuses_q58_component_dataflow(spark, sf_dir):
    """q95 = q58's CC dataflow + one member-rows window + a broadcast
    join to documents for n_chars. The member join must broadcast the
    doc-size side or the member side (both are id+int columns), never
    sort-merge the corpus; and the window must partition on the
    component id, not on anything document-sized."""
    df = q("q95_canonical_dedup", spark, sf_dir)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RowNumber" in plan or "row_number" in plan, plan[:2000]


def test_q108_shuffles_8byte_shingle_hash(spark, sf_dir):
    """VERDICT r7 item 2: the registered q108 plan must group the
    shingle explode on xxhash64 (an 8-byte key across the exchange —
    the q21/q101 discipline), never on the raw 5-string struct; the
    losslessness pin lives in test_quality_queries.py."""
    df = q("q108_split_leakage", spark, sf_dir)
    plan = explain_formatted(df)
    # the per-position hash is computed inside the row-level transform
    assert "xxhash64" in plan, plan[:3000]
    # the distinct-shingle exchange keys on the exploded hash column
    # (bigint `g`), and no struct/string shingle expression survives
    # into any exchange or aggregate key
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(g#" in exec_plan, exec_plan[:3000]
    assert "named_struct" not in exec_plan, exec_plan[:3000]


def test_q109_explodes_documents_once(spark, sf_dir):
    """VERDICT r7 item 3 + r8 item 6: the top-200 token SET is
    collected at construction from the 5% sample (as are the
    |sources|-row per-source totals), so the registered q109 plan must
    contain exactly ONE Generate (token explode) over exactly ONE
    documents scan — the probe stream; gcnt is the in-plan window sum
    on the post-agg frame, n_tok attaches via a literal map, and the
    output spine is literal rows (no second corpus subtree)."""
    df = q("q109_source_mix_divergence", spark, sf_dir)
    plan = explain_formatted(df)
    m = __import__("re").search(r"(?m)^\(\d+\) ", plan)
    tree = plan[: m.start()] if m else plan
    assert tree.count("Generate") == 1, tree
    s = plan_summary(df)
    # one column-pruned corpus scan: the exploded probe stream
    assert s["scans"] == 1, s


def test_q110_encode_is_one_scan_no_udf_no_join(spark, sf_dir):
    """VERDICT r7 item 6's plan contract: the registered BPE-apply plan
    is ONE corpus scan + K chained literal replace projections + a
    lang-keyed partial agg (plus the literal merge-row spine) — no
    Python UDF, no join; training happened at construction."""
    df = q("q110_bpe_encode_corpus", spark, sf_dir)
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 0, s
    plan = explain_formatted(df)
    assert "replace" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_no_cartesian(df)


def test_q111_plan_is_one_sizes_scan_no_explode(spark, sf_dir):
    """The mixture planner reads token COUNTS only: one column-pruned
    documents scan, no Generate (no token explode), no joins — the two
    global sums ride unpartitioned windows over the |sources|-row
    dimension frame."""
    df = q("q111_mixture_reweight_plan", spark, sf_dir)
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 0, s
    plan = explain_formatted(df)
    m = __import__("re").search(r"(?m)^\(\d+\) ", plan)
    tree = plan[: m.start()] if m else plan
    assert "Generate" not in tree, tree
    assert_no_cartesian(df)


def test_q112_dictionary_encode_plan(spark, sf_dir):
    """VERDICT r8 item 2's plan contract: the dictionary-tier BPE
    encode pays ONE corpus scan + one (lang, word) partial-agg
    shuffle; the merge chain is a codegen projection on the post-agg
    dictionary frame — no join, no Python in the registered plan
    (training happened at construction on the 5% sample)."""
    df = q("q112_bpe_dictionary_encode", spark, sf_dir)
    s = plan_summary(df)
    assert s["scans"] == 1, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 0, s
    plan = explain_formatted(df)
    m = __import__("re").search(r"(?m)^\(\d+\) ", plan)
    tree = plan[: m.start()] if m else plan
    # exactly one Generate: the corpus word explode feeding the agg
    assert tree.count("Generate") == 1, tree
    assert "replace" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_no_cartesian(df)
