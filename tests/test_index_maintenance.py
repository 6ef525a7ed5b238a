"""S17 — the monitor→retrain loop, closed (VERDICT r11 item 3).

q116's ``retrain_due`` flag, executed: a versioned IVF2 layout behind
an atomic pointer is kept fresh by CDC (``ivf2_apply_cdc``), watched
per batch by the same PSI core q116 runs, and — when injected drift
clears the threshold — refined (``lloyd_refine``'s exchange),
rebuilt (``build_ivf2_index``), and pointer-swapped while the
changelog keeps applying. Pins:

- a benign batch does NOT retrain; the drift batch flags and swaps
  exactly once; post-swap PSI is back under the threshold;
- post-swap batches merge into the NEW version; the final layout is
  row-identical to a from-scratch build over the expected state with
  the retrained centroids; full-probe serving equals brute force;
- the old version's directory is retained intact (a reader that
  resolved pre-swap keeps serving consistent files — serving never
  mixes layouts);
- redelivery of the triggering batch across the swap is a marker
  no-op and does NOT fire a second retrain;
- a crash BEFORE the pointer flip (commit point) converges on
  redelivery to the identical layout, clearing the orphan build;
- parity: the in-module coarse refinement matches ``lloyd_refine``'s
  reassignment, and ``lloyd_steps=0`` retraining reproduces
  ``train_ivf2_local``'s fines bit-for-bit.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.operators.similarity import (
    assign_cells_vectorized,
    build_ivf2_index,
    cosine_topk,
    lloyd_refine,
    train_ivf2_local,
)
from cdc_example_spark.streaming import index_maintenance as IM
from cdc_example_spark.streaming.ann_freshness import (
    index_last_applied_batch_id,
)
from cdc_example_spark.streaming.envelope import decode_envelope
from tests.cdc_fixtures import envelope

DIM = 4
N_COARSE, N_FINE = 4, 3

EMB_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _vecs(n, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, DIM))
    return {f"v{i}": [float(x) for x in X[i]] for i in range(n)}


def _img(vid, vec):
    return {"id": vid, "embedding": vec}


def _emb_df(spark, state: dict):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(state.items())],
        "vec_id string, embedding array<double>",
    )


def _write_batch(src, n, records):
    p = src / f"batch-{n:04d}.json"
    with open(p, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    os.utime(p, (1_700_000_000 + n, 1_700_000_000 + n))


def _layout_rows(spark, vdir):
    return {
        (r.vec_id, int(r.coarse), int(r.fine))
        for r in spark.read.parquet(vdir)
        .select("vec_id", "coarse", "fine")
        .collect()
    }


def _decoded(spark, records):
    return decode_envelope(
        spark.createDataFrame(records, "key STRING, value STRING"),
        row_schema=EMB_SCHEMA,
    )


@pytest.fixture(scope="module")
def base_state():
    return _vecs(60)


def _drift_records(state, start_vid, n, direction, lsn0, seed):
    """n inserts piled around one direction — the occupancy-drift
    injection (everything lands in one or two cells)."""
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        vid = f"v{start_vid + i}"
        vec = [float(x) for x in direction + 0.05 * rng.normal(size=DIM)]
        recs.append(envelope("i", vid, after=_img(vid, vec), lsn=lsn0 + i))
        state[vid] = vec
    return recs


def test_s17_drift_flags_retrains_and_swaps_under_live_cdc(
    spark, tmp_path, base_state
):
    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    assert IM.current_version(root) == "bootstrap"
    boot_dir = IM.version_dir(root, "bootstrap")
    meta0 = IM.read_layout_meta(boot_dir)

    # pre-drift: the monitor reads ~zero drift against its own era
    h0 = IM.versioned_layout_health(spark, boot_dir, meta0).first()
    assert float(h0.psi_total) < 0.05 and not bool(h0.retrain_due)

    src = tmp_path / "cdc-in"
    src.mkdir()
    rng = np.random.default_rng(19)
    base = np.asarray(state["v0"])

    # batch 0 — benign churn: one insert + one cell-moving update;
    # PSI stays under the line, NO retrain
    v60 = [float(x) for x in base + 0.05 * rng.normal(size=DIM)]
    v1_new = [float(x) for x in np.asarray(state["v5"]) + 0.05 * rng.normal(size=DIM)]
    b0 = [
        envelope("i", "v60", after=_img("v60", v60), lsn=100),
        envelope(
            "u", "v1", before=_img("v1", state["v1"]),
            after=_img("v1", v1_new), lsn=101,
        ),
    ]
    state["v60"], state["v1"] = v60, v1_new
    _write_batch(src, 0, b0)

    # batch 1 — the drift: 25 inserts piled into -base territory
    b1 = _drift_records(state, 61, 25, -base, lsn0=200, seed=23)
    _write_batch(src, 1, b1)

    # batch 2 — post-swap traffic: one insert + one update, applied to
    # whatever version is then current
    v86 = [float(x) for x in -base + 0.05 * rng.normal(size=DIM)]
    v60_new = [float(x) for x in -base + 0.05 * rng.normal(size=DIM)]
    b2 = [
        envelope("i", "v86", after=_img("v86", v86), lsn=300),
        envelope(
            "u", "v60", before=_img("v60", state["v60"]),
            after=_img("v60", v60_new), lsn=301,
        ),
    ]
    state["v86"], state["v60"] = v86, v60_new
    _write_batch(src, 2, b2)

    sink = KeyedStateSink(
        path=str(tmp_path / "state"), num_buckets=8, schema=EMB_SCHEMA
    )
    q = IM.materialize_with_monitored_index(
        spark.readStream.schema("key STRING, value STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        sink,
        root,
        str(tmp_path / "ckpt"),
        trigger_once=True,
        sample_size=512,
        seed=3,
    )
    q.awaitTermination(240)
    assert q.exception() is None

    # exactly one retrain, at the drift batch: benign batch 0 left the
    # bootstrap serving, batch 1 flagged and swapped, batch 2 merged
    # into the new version
    assert IM.current_version(root) == "b0000000001"
    assert sorted(os.listdir(os.path.join(root, "versions"))) == [
        "b0000000001",
        "bootstrap",
    ]
    new_dir = IM.version_dir(root, "b0000000001")
    meta1 = IM.read_layout_meta(new_dir)
    assert index_last_applied_batch_id(new_dir) == 2  # batch 2 landed here

    # post-swap drift is back under the line (the new version's era is
    # its rebuild snapshot; only batch 2's two rows moved since)
    h1 = IM.versioned_layout_health(spark, new_dir, meta1).first()
    assert float(h1.psi_total) < 0.2 and not bool(h1.retrain_due)

    # the retrained layout is row-identical to a from-scratch build of
    # the expected final state under the retrained centroids
    want_dir = str(tmp_path / "want")
    build_ivf2_index(
        _emb_df(spark, state), meta1["coarse"], meta1["fines"], want_dir
    )
    assert _layout_rows(spark, new_dir) == _layout_rows(spark, want_dir)

    # full-probe serving from the pointer equals brute force
    queries = _emb_df(spark, {k: state[k] for k in ("v0", "v61", "v86")})
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(_emb_df(spark, state), queries, k=3).collect()
    }
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in IM.ivf2_topk_versioned(
            spark, root, queries, k=3,
            n_probe_coarse=len(meta1["coarse"]),
            n_probe_fine=int(meta1["n_fine"]),
        ).collect()
    }
    assert served == exact

    # the old version is retained INTACT — a reader that resolved
    # pre-swap keeps serving a complete, consistent layout (data +
    # meta + marker all still there); serving never mixes versions
    assert os.path.isfile(os.path.join(boot_dir, "_layout_meta.json"))
    assert glob.glob(os.path.join(boot_dir, "coarse=*", "fine=*", "*.parquet"))
    assert index_last_applied_batch_id(boot_dir) == 1  # its final era
    boot_meta_again = IM.read_layout_meta(boot_dir)
    assert boot_meta_again["coarse"] == meta0["coarse"]

    # the table of record saw every streamed key (swap never lost CDC)
    got_state = {
        r["id"]: list(r["embedding"]) for r in sink.snapshot(spark).collect()
    }
    streamed = {"v1", "v60", "v86"} | {f"v{i}" for i in range(61, 86)}
    assert got_state == {k: state[k] for k in streamed}

    # redelivery of the TRIGGERING batch across the swap: marker no-op
    # on the new version, no second retrain, layout unchanged
    before_rows = _layout_rows(spark, new_dir)
    rep = IM.maintain_versioned_index(
        _decoded(spark, b1), root, batch_id=1, sample_size=512, seed=3
    )
    assert rep["retrained"] is False and rep["touched_cells"] == []
    assert IM.current_version(root) == "b0000000001"
    assert _layout_rows(spark, new_dir) == before_rows


def test_s17_crash_before_pointer_flip_converges_on_redelivery(
    spark, tmp_path, base_state, monkeypatch
):
    """The pointer flip is the commit point: kill the loop right
    before it (after the rebuild wrote data+meta) and redeliver. The
    old version must still be serving, the redelivered batch must
    no-op on the old version's marker, the monitor must still flag,
    and the re-run must clear the orphan and land the identical
    layout."""
    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    base = np.asarray(state["v0"])
    b = _drift_records(state, 61, 25, -base, lsn0=200, seed=29)

    def _boom(root_, name_):
        raise RuntimeError("crash injected before the pointer flip")

    monkeypatch.setattr(IM, "_set_current", _boom)
    with pytest.raises(RuntimeError, match="crash injected"):
        IM.maintain_versioned_index(
            _decoded(spark, b), root, batch_id=7, sample_size=512, seed=3
        )
    monkeypatch.undo()

    # pre-swap state is what's serving: pointer untouched, the batch
    # committed to the OLD version (its marker advanced), and the
    # orphan build exists but is unreferenced
    assert IM.current_version(root) == "bootstrap"
    boot_dir = IM.version_dir(root, "bootstrap")
    assert index_last_applied_batch_id(boot_dir) == 7
    orphan = IM.version_dir(root, "b0000000007")
    assert os.path.isdir(orphan)

    # redelivery: apply no-ops on the old marker, the monitor still
    # flags, the orphan is cleared and rebuilt, the flip commits
    rep = IM.maintain_versioned_index(
        _decoded(spark, b), root, batch_id=7, sample_size=512, seed=3
    )
    assert rep["touched_cells"] == []  # marker no-op on the old version
    assert rep["retrained"] is True
    assert IM.current_version(root) == "b0000000007"

    # identical to the uninterrupted cadence: a from-scratch build of
    # the expected state under the (deterministic) retrained centroids
    meta1 = IM.read_layout_meta(orphan)
    want_dir = str(tmp_path / "want")
    build_ivf2_index(
        _emb_df(spark, state), meta1["coarse"], meta1["fines"], want_dir
    )
    assert _layout_rows(spark, orphan) == _layout_rows(spark, want_dir)


def test_s17_coarse_refinement_matches_lloyd_refine(spark, base_state):
    """The loop's coarse-refinement step IS lloyd_refine's exchange:
    assignments under the refined centroids it returns must equal the
    operator's own cell1 output (modulo the order-preserving remap of
    surviving cells)."""
    df = _emb_df(spark, base_state)
    coarse, _ = train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=3)

    refined = IM.lloyd_refined_coarse(df, coarse, steps=1)
    lr = {r.vec_id: (int(r.cell0), int(r.cell1))
          for r in lloyd_refine(df, coarse, vectorized=True).collect()}

    # surviving original cids in order == refined's index order
    occupied = sorted({c0 for c0, _ in lr.values()})
    assert len(refined) == len(occupied)
    remap = {cid: i for i, cid in enumerate(occupied)}

    mine = {
        r.vec_id: int(r.cell)
        for r in df.withColumn(
            "cell", assign_cells_vectorized(refined)("embedding")
        ).collect()
    }
    assert mine == {vid: remap[c1] for vid, (_, c1) in lr.items()}


def test_s17_retrain_with_zero_lloyd_steps_reproduces_trainer_fines(
    spark, base_state
):
    """lloyd_steps=0 + the trainer's own coarse/sample/seed must
    reproduce train_ivf2_local's fines bit-for-bit — the level-2
    parity pin for retrain_fines."""
    df = _emb_df(spark, base_state)
    coarse, fines = train_ivf2_local(
        df, N_COARSE, N_FINE, sample_size=512, seed=9
    )
    c2, f2 = IM.retrain_ivf2(
        df, coarse, N_FINE, lloyd_steps=0, sample_size=512, seed=9
    )
    assert c2 == coarse
    assert f2 == fines


# ------------------------------------------------ retention / GC (r13)


def _force_drift_batch(state, start_vid, direction, lsn0, seed, n=25):
    return _drift_records(state, start_vid, n, direction, lsn0=lsn0, seed=seed)


def test_s17_retention_keeps_last_n_and_serving_survives(
    spark, tmp_path, base_state
):
    """VERDICT r12 item 2: after 3+ retrains only the retained set
    (current + immediate predecessor at retain=2) remains on disk,
    the pointer resolves, and serving from it equals brute force."""
    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    base = np.asarray(state["v0"])
    rng = np.random.default_rng(101)

    # three drift batches, each forced to retrain (psi_threshold=-1
    # makes every batch flag — the retention arithmetic is what's
    # under test, not the flag)
    names = ["bootstrap"]
    vid = 61
    for b in range(3):
        direction = rng.normal(size=DIM)
        recs = _force_drift_batch(
            state, vid, direction, lsn0=1000 + 100 * b, seed=200 + b
        )
        vid += 25
        rep = IM.maintain_versioned_index(
            _decoded(spark, recs), root, batch_id=b,
            psi_threshold=-1.0, sample_size=512, seed=3,
        )
        assert rep["retrained"] is True
        names.append(rep["version"])

    # retain=2: exactly current + its immediate predecessor remain
    left = sorted(os.listdir(os.path.join(root, "versions")))
    assert left == sorted(names[-2:])
    assert IM.current_version(root) == names[-1]
    # the sweep reported the bootstrap-era deletions across the run
    # (bootstrap after retrain 2, the first retrain dir after 3)

    # pre-swap-reader grace: the predecessor is a COMPLETE layout
    pred = IM.version_dir(root, names[-2])
    assert os.path.isfile(os.path.join(pred, "_layout_meta.json"))
    assert glob.glob(os.path.join(pred, "coarse=*", "fine=*", "*.parquet"))

    # serving from the pointer equals brute force on the final state
    meta = IM.read_layout_meta(IM.version_dir(root, names[-1]))
    queries = _emb_df(spark, {k: state[k] for k in ("v0", "v61")})
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(_emb_df(spark, state), queries, k=3).collect()
    }
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in IM.ivf2_topk_versioned(
            spark, root, queries, k=3,
            n_probe_coarse=len(meta["coarse"]),
            n_probe_fine=int(meta["n_fine"]),
        ).collect()
    }
    assert served == exact


def test_s17_gc_is_idempotent_across_a_crash_mid_sweep(
    spark, tmp_path, base_state
):
    """A sweep interrupted mid-rmtree leaves a partial directory whose
    flip marker survives; the next sweep must re-list and finish the
    deletion, and the serving path must be unaffected throughout."""
    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    base = np.asarray(state["v0"])

    # two forced retrains with retention DISABLED (retain=3 keeps all)
    vid = 61
    for b in range(2):
        recs = _force_drift_batch(
            state, vid, -base if b == 0 else base, lsn0=2000 + 100 * b,
            seed=300 + b,
        )
        vid += 25
        rep = IM.maintain_versioned_index(
            _decoded(spark, recs), root, batch_id=b,
            psi_threshold=-1.0, sample_size=512, seed=3, retain=3,
        )
        assert rep["retrained"] is True and rep["gc_removed"] == []
    assert len(os.listdir(os.path.join(root, "versions"))) == 3

    # simulate a crash mid-sweep of the oldest version: its data files
    # are gone but the flip marker survived
    boot = IM.version_dir(root, "bootstrap")
    for p in glob.glob(os.path.join(boot, "coarse=*")):
        import shutil as _sh

        _sh.rmtree(p)
    os.remove(os.path.join(boot, "_layout_meta.json"))
    assert IM._flip_counter(boot) is not None  # the marker survived

    # the next sweep finishes the job, idempotently
    removed = IM.gc_versions(root, retain=2)
    assert removed == ["bootstrap"]
    assert not os.path.isdir(boot)
    assert IM.gc_versions(root, retain=2) == []  # nothing left to do

    # current still resolves and serves
    name = IM.current_version(root)
    meta = IM.read_layout_meta(IM.version_dir(root, name))
    got = IM.ivf2_topk_versioned(
        spark, root, _emb_df(spark, {"v0": state["v0"]}), k=1,
        n_probe_coarse=len(meta["coarse"]),
        n_probe_fine=int(meta["n_fine"]),
    ).collect()
    assert len(got) == 1


def test_s17_gc_reclaims_a_crash_after_stage_even_without_the_marker(
    tmp_path,
):
    """The rmtree-ordering hole the staging rename closes: a sweep that
    crashed AFTER renaming a victim to ``<name>.deleting`` but after
    rmtree had already eaten the ``_flipped`` marker must still be
    reclaimed — under the old in-place delete, a marker-less partial
    directory was unflipped and therefore never sweepable again
    (permanent disk leak). Pure-filesystem test: gc_versions takes no
    Spark session."""
    root = str(tmp_path / "ann")
    vroot = os.path.join(root, "versions")
    # a served current version + a staged victim whose marker is gone
    cur = os.path.join(vroot, "b0000000009")
    os.makedirs(os.path.join(cur, "coarse=0", "fine=0"))
    IM._set_current(root, "b0000000009")
    IM._mark_flipped(root, cur)
    staged = os.path.join(vroot, "bootstrap" + IM._DELETING_SUFFIX)
    os.makedirs(os.path.join(staged, "coarse=1", "fine=0"))
    # (no _flipped inside — the crash ate it first)

    removed = IM.gc_versions(root, retain=2)
    assert not os.path.isdir(staged)  # reclaimed unconditionally
    assert removed == []  # reclaim is not a new deletion
    assert IM.current_version(root) == "b0000000009"
    assert os.path.isdir(cur)  # the serving layout is untouched

    # idempotent: nothing left for a second sweep
    assert IM.gc_versions(root, retain=2) == []


def test_s17_second_manual_retrain_never_destroys_the_serving_layout(
    spark, tmp_path, base_state
):
    """ADVICE r12 (medium): with batch_id=None both retrains derive
    'manual' — before the name guard, the second one rmtree'd the LIVE
    serving directory before re-reading its corpus from the same path
    (serving data loss). The chooser must suffix instead, the old
    layout must survive the rebuild window, and the corpus must carry
    through both retrains."""
    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    base = np.asarray(state["v0"])

    recs1 = _force_drift_batch(state, 61, -base, lsn0=3000, seed=400)
    rep1 = IM.maintain_versioned_index(
        _decoded(spark, recs1), root, batch_id=None,
        psi_threshold=-1.0, sample_size=512, seed=3, retain=3,
    )
    assert rep1["retrained"] is True and rep1["version"] == "manual"

    recs2 = _force_drift_batch(state, 86, base, lsn0=3100, seed=401)
    rep2 = IM.maintain_versioned_index(
        _decoded(spark, recs2), root, batch_id=None,
        psi_threshold=-1.0, sample_size=512, seed=3, retain=3,
    )
    assert rep2["retrained"] is True
    assert rep2["version"] == "manualr2"  # never the serving name
    assert IM.current_version(root) == "manualr2"

    # no rows were lost across the collision window: the new layout
    # holds the full expected corpus
    rows = _layout_rows(spark, IM.version_dir(root, "manualr2"))
    assert {vid for vid, _, _ in rows} == set(state.keys())

    # and 'manual' (the predecessor) is retained intact at retain=3
    assert os.path.isdir(IM.version_dir(root, "manual"))


# ------------------------------------- hybrid over versioned serving (r13)


def test_s17_hybrid_rrf_serves_consistently_across_a_live_swap(
    spark, tmp_path, base_state
):
    """VERDICT r12 item 4: the q115 hybrid composed with the VERSIONED
    serving path. Pins: (a) pre-swap and post-swap requests both equal
    the q115-discipline fusion recomputed against a brute vector side
    on the then-current corpus; (b) a request's plan reads exactly ONE
    version's directories (no mixed-layout read); (c) the pointer is
    resolved once per request — flipping it after plan construction
    does not change (or break) the in-flight request."""
    from pyspark.sql.window import Window

    from cdc_example_spark.operators.index_health import _dec
    from cdc_example_spark.operators.relevance import rrf_fuse

    state = dict(base_state)
    root = str(tmp_path / "ann")
    IM.init_versioned_ivf2(
        _emb_df(spark, state), N_COARSE, N_FINE, root, sample_size=512, seed=3
    )
    # deterministic lexical side — the composition takes the q115 BM25
    # discipline's OUTPUT shape (doc_id, rnk); its derivation is q115's
    # own driver-checked contract
    lex = spark.createDataFrame(
        [(f"v{i}", i + 1) for i in range(10)], "doc_id string, rnk long"
    )
    probe = _emb_df(spark, {"v0": base_state["v0"]})

    def expected(st):
        vec = (
            cosine_topk(_emb_df(spark, st), probe, k=20)
            .select(
                F.col("vec_id").alias("doc_id"),
                _dec(F.col("cos_sim"), 2).alias("cos_sim"),
            )
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.orderBy(F.col("cos_sim").desc(), "doc_id")
                ),
            )
            .select("doc_id", "rnk")
        )
        return [
            (r.doc_id, r.rrf)
            for r in rrf_fuse({"lex": lex, "vec": vec})
            .orderBy(F.col("rrf").desc(), "doc_id")
            .limit(10)
            .collect()
        ]

    def hybrid():
        # full probes: the versioned candidates equal the brute cut,
        # so the fusion must match `expected` exactly
        return IM.hybrid_rrf_versioned(
            spark, root, lex, probe, k=10, k_cand=20,
            n_probe_coarse=N_COARSE, n_probe_fine=N_FINE,
        )

    # (a) pre-swap request
    pre = hybrid()
    assert all("/versions/bootstrap/" in f for f in pre.inputFiles())
    assert [(r.doc_id, r.rrf) for r in pre.collect()] == expected(state)

    # live swap: a forced retrain merges a drift batch and flips
    base = np.asarray(state["v0"])
    recs = _drift_records(state, 61, 25, -base, lsn0=5000, seed=500)
    rep = IM.maintain_versioned_index(
        _decoded(spark, recs), root, batch_id=9,
        psi_threshold=-1.0, sample_size=512, seed=3, retain=3,
    )
    assert rep["retrained"] is True
    new_name = rep["version"]

    # (a)+(b) post-swap request: served wholly from the new version,
    # correct on the drifted corpus
    post = hybrid()
    assert all(f"/versions/{new_name}/" in f for f in post.inputFiles())
    assert [(r.doc_id, r.rrf) for r in post.collect()] == expected(state)

    # (c) resolved-once: build a request, THEN flip the pointer to a
    # name that does not even exist — the in-flight request must keep
    # serving the version it resolved, proving no component re-reads
    # the pointer (re-resolution would raise on the dangling name)
    inflight = hybrid()
    IM._set_current(root, "pending-version-that-does-not-exist")
    try:
        assert [(r.doc_id, r.rrf) for r in inflight.collect()] == expected(
            state
        )
    finally:
        IM._set_current(root, new_name)
    # and a FRESH request after the restore serves normally again
    assert [(r.doc_id, r.rrf) for r in hybrid().collect()] == expected(state)
