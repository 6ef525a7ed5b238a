"""Round-10 hardening pins.

- q110/q112 oracle TOTALITY on a degenerate training sample (ADVICE
  r9): a non-empty corpus whose 5% doc_id-hash sample is empty used to
  cascade every merge CTE (and thus the encode CTE) empty on the
  DuckDB side while the Spark side's empty-winner break still emitted
  identity-encode rows. The oracles now carry a sentinel no-op merge
  winner per round (filtered from the merge output), so both engines
  degrade to the identical identity encode.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc_example_spark.queries import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


def test_snapshot_old_fallback_survives_post_swap_cleanup(spark, tmp_path):
    """ADVICE r9: the `.old`-backed snapshot frame is LAZY no more — a
    caller may run its action only after _rebucket's post-swap
    ``rmtree(.old)``, so the fallback must pin its contents eagerly
    instead of throwing FileNotFoundException at action time."""
    import shutil

    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
    from tests.cdc_fixtures import envelope, row_image

    ts = "2025-10-26T23:21:07.598794Z"
    recs = [
        envelope(
            "i",
            f"k{i}",
            after=row_image(f"k{i}", ts, ts, f"m{i}", "a"),
            lsn=100 + i,
            ts_ms=100 + i,
        )
        for i in range(20)
    ]
    raw = spark.createDataFrame(recs, "key STRING, value STRING")
    path = str(tmp_path / "state")
    sink = KeyedStateSink(path=path)
    sink.apply_changes(route_changes(decode_envelope(raw)), batch_id=1)
    # simulate: read lands in the swap window (only .old exists) …
    os.rename(path, path + ".old")
    snap = sink.snapshot(spark)
    # … then the swap completes and cleanup deletes .old BEFORE the
    # caller's action runs
    shutil.rmtree(path + ".old")
    assert {r["id"] for r in snap.collect()} == {f"k{i}" for i in range(20)}


def _chain_vs_rank_diff(spark, words_df, merges):
    from cdc_example_spark.queries.relevance import (
        bpe_word_subtoken_counts_rank_udf,
        bpe_word_subtoken_counts_udf,
    )

    chain = bpe_word_subtoken_counts_udf(merges)(F.col("word"))
    rank = bpe_word_subtoken_counts_rank_udf(merges)(F.col("word"))
    return (
        words_df.select("word", chain.alias("a"), rank.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .collect()
    )


def test_rank_encoder_matches_chain_on_corpus_trained_table(spark, sf_dir):
    """The depth-independent rank-dict encoder (the 30k-merge
    production tier, VERDICT r9 item 6) must agree with the replace
    chain on the CORPUS-trained merge table, trained to exhaustion —
    every trainable merge of the driver vocabulary, every distinct
    corpus word."""
    from cdc_example_spark.queries.relevance import train_bpe_merges
    from cdc_example_spark.sources.catalog import load_doc_tokens

    toks = load_doc_tokens(spark, sf_dir)
    wf = [
        (r["word"], r["freq"])
        for r in toks.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    ]
    merges = train_bpe_merges(wf, 10_000_000)  # to exhaustion
    assert merges, "corpus must train at least one merge"
    words = spark.createDataFrame([(w,) for w, _ in wf], "word string")
    assert _chain_vs_rank_diff(spark, words, merges) == []


def test_rank_encoder_matches_chain_on_adversarial_repeats(spark):
    """Leftmost-nonoverlap + consumed-separator parity: repeated-token
    words are exactly where a naive priority apply diverges from the
    replace chain (" a a a a " merges pairs 1 and 3 only)."""
    merges = ["a a", "aa aa", "aa a", "a b", "b b", "ab ab"]
    words = spark.createDataFrame(
        [(w,) for w in (
            "a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaaaa", "ab", "abab",
            "ababab", "aabb", "abba", "baaab", "bbbb", "aabaa", "xyz",
        )],
        "word string",
    )
    assert _chain_vs_rank_diff(spark, words, merges) == []


def test_driver_trainer_matches_inplan_trainer(spark, sf_dir):
    """train_bpe_merges (the 30k tier's driver-side construction) must
    produce exactly the merges the in-plan Spark trainer produces at
    q112's declared depth — same counts, same (count desc, pair asc)
    tie-break, same replace semantics."""
    from cdc_example_spark.queries.relevance import (
        _Q112_MERGES,
        _char_spaced,
        _top_pair_weighted,
        train_bpe_merges,
    )
    from cdc_example_spark.sources.catalog import load_doc_tokens

    toks = load_doc_tokens(spark, sf_dir).filter(F.col("doc_id") % 20 == 0)
    wft = (
        toks.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", _char_spaced(F.col("word")).alias("seg"))
        .localCheckpoint(eager=True)
    )
    wf = [(r["word"], r["freq"]) for r in wft.select("word", "freq").collect()]
    inplan = []
    for _ in range(_Q112_MERGES):
        a = F.split(F.trim("seg"), " ")
        winners = _top_pair_weighted(wft, a, F.col("freq")).collect()
        if not winners:
            break
        pair = winners[0]["pair"]
        inplan.append(pair)
        wft = wft.withColumn(
            "seg",
            F.replace(
                F.col("seg"),
                F.lit(f" {pair} "),
                F.lit(" " + pair.replace(" ", "") + " "),
            ),
        )
    assert train_bpe_merges(wf, _Q112_MERGES) == inplan


def test_apply_changes_reports_merge_vs_marker_noop(spark, tmp_path):
    """ADVICE r9: apply_changes returns True on a real merge, False on
    the batch-marker redelivery no-op — the signal materialize*'s
    on_batch gating rides on."""
    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
    from tests.cdc_fixtures import envelope, row_image

    ts = "2025-10-26T10:00:00.000000Z"
    raw = spark.createDataFrame(
        [envelope("i", "k1", after=row_image("k1", ts, ts, "m", "u"), lsn=1)],
        "key STRING, value STRING",
    )
    changes = route_changes(decode_envelope(raw))
    sink = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)
    assert sink.apply_changes(changes, batch_id=7) is True
    assert sink.apply_changes(changes, batch_id=7) is False  # redelivery
    assert sink.apply_changes(changes, batch_id=8) is True


@pytest.fixture()
def degenerate_sample_dir(spark, tmp_path, sf_dir):
    # every doc with doc_id % 20 == 0 removed: the corpus stays
    # non-empty but the 5% training sample is EMPTY — the ADVICE r9
    # oracle/engine divergence scenario for the BPE trainers.
    d = str(tmp_path / "sf_degenerate")
    os.makedirs(d)
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % 20 != 0)
        .write.parquet(os.path.join(d, "documents.parquet"))
    )
    return d


@pytest.mark.parametrize(
    "name", ["q110_bpe_encode_corpus", "q112_bpe_dictionary_encode"]
)
def test_bpe_oracle_total_on_degenerate_sample(
    spark, degenerate_sample_dir, name
):
    q = QUERIES[name]
    df = q.spark(spark, degenerate_sample_dir)
    # the empty-winner guard: no merge rows, identity encode only
    assert {r["stage"] for r in df.collect()} == {"encode"}
    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the part-file glob
    path = os.path.join(degenerate_sample_dir, "documents.parquet", "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    try:
        compare(df, con, q.oracle, name=name)
    finally:
        con.close()
