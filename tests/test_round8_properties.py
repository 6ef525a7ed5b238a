"""Round-8 property tests: engine-independent models for the BPE
ENCODE replace chain (q110's core semantics) and the auto-rebucket's
marker/meta survival — properties the DuckDB oracle can't see (it
replays the same algorithm)."""

from __future__ import annotations

import os
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_token = st.text(alphabet="ab_", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _py_top_pair(docs):
    """The trainer's winner rule: adjacent-pair counts, (cnt desc,
    pair asc) — pure-Python model."""
    counts: dict = {}
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            p = f"{a} {b}"
            counts[p] = counts.get(p, 0) + 1
    if not counts:
        return None
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _py_encode(docs, n_merges):
    """Leftmost non-overlapping replace chain — str.replace IS the
    declared merge semantics, so the model is the builtin."""
    corpus = [" " + " ".join(t) + " " for t in docs]
    merges = []
    cur = [list(t) for t in docs]
    for _ in range(n_merges):
        top = _py_top_pair(cur)
        if top is None:
            break
        pair, cnt = top
        merges.append((pair, cnt))
        corpus = [
            s.replace(f" {pair} ", " " + pair.replace(" ", "_") + " ")
            for s in corpus
        ]
        cur = [s.strip().split(" ") if s.strip() else [] for s in corpus]
    return merges, corpus


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=_corpus, n_merges=st.sampled_from([1, 2, 3]))
def test_bpe_replace_chain_matches_python_model(spark, corpus, n_merges):
    """Spark's chained F.replace over the join-space corpus string must
    equal the pure-Python str.replace chain under the same trained
    merges — the q110 encode semantics, independent of DuckDB."""
    # documents with ≥1 adjacent pair somewhere, else training is a no-op
    merges, expect = _py_encode(corpus, n_merges)
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(corpus)],
        "doc_id long, ws array<string>",
    ).select(
        "doc_id",
        F.concat(F.lit(" "), F.array_join("ws", " "), F.lit(" ")).alias("s"),
    )
    s = F.col("s")
    for pair, _cnt in merges:
        s = F.replace(
            s, F.lit(f" {pair} "), F.lit(" " + pair.replace(" ", "_") + " ")
        )
    got = {r.doc_id: r.enc for r in df.select("doc_id", s.alias("enc")).collect()}
    assert got == {i: e for i, e in enumerate(expect)}


def test_rebucket_preserves_marker_and_batch_dedup(spark, tmp_path):
    """The staged-swap re-bucket must carry the applied-batch marker:
    a redelivered batch id after growth stays a metadata no-op."""
    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
    from tests.cdc_fixtures import envelope, row_image

    path = str(tmp_path / "state")
    sink = KeyedStateSink(path=path, rows_per_bucket_target=10)
    t = "2025-10-26T23:21:07.598794Z"
    recs = [
        envelope("i", f"k{i}", after=row_image(f"k{i}", t, t, f"m{i}", "a"),
                 lsn=100 + i, ts_ms=100 + i)
        for i in range(200)
    ]
    raw = spark.createDataFrame(recs, "key STRING, value STRING")
    sink.apply_changes(route_changes(decode_envelope(raw)), batch_id=7)
    assert sink.num_buckets > 8  # growth happened
    assert sink.last_applied_batch_id() == 7  # marker survived the swap
    assert os.path.exists(os.path.join(path, "_num_buckets"))
    # redelivery of batch 7 is a no-op even though the layout changed
    before = {r["id"]: r["message"] for r in sink.snapshot(spark).collect()}
    sink.apply_changes(route_changes(decode_envelope(raw)), batch_id=7)
    after = {r["id"]: r["message"] for r in sink.snapshot(spark).collect()}
    assert before == after and len(after) == 200


def test_rebucket_crash_window_recovers(spark, tmp_path):
    """A crash between the swap's two renames leaves only `.old` (the
    pre-resize state, fully valid): the next sink construction must
    restore it; a stale `.old` beside a live dir must be dropped."""
    import shutil

    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
    from tests.cdc_fixtures import envelope, row_image

    path = str(tmp_path / "state")
    sink = KeyedStateSink(path=path)
    t = "2025-10-26T23:21:07.598794Z"
    recs = [
        envelope("i", f"k{i}", after=row_image(f"k{i}", t, t, f"m{i}", "a"),
                 lsn=100 + i, ts_ms=100 + i)
        for i in range(20)
    ]
    raw = spark.createDataFrame(recs, "key STRING, value STRING")
    sink.apply_changes(route_changes(decode_envelope(raw)), batch_id=1)

    # crash between rename 1 and rename 2: only `.old` exists
    os.rename(path, path + ".old")
    os.makedirs(path + ".rebucket")  # half-written staging leftover
    s2 = KeyedStateSink(path=path)
    assert s2.num_buckets == 8 and s2.last_applied_batch_id() == 1
    assert len(s2.snapshot(spark).collect()) == 20
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".rebucket")

    # crash after rename 2: stale `.old` beside the live dir is dropped
    shutil.copytree(path, path + ".old")
    s3 = KeyedStateSink(path=path)
    assert not os.path.exists(path + ".old")
    assert len(s3.snapshot(spark).collect()) == 20
