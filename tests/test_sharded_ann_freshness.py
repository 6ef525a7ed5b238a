"""S16 — CDC → SHARDED ANN index freshness (VERDICT r10 item 5).

S15 keeps ONE IVF2 layout fresh under an embeddings changelog;
``sharded_ivf2_topk`` (operators/similarity.py) is the past-~4M-vectors
tier where per-shard indexes take over. This suite pins the remaining
CDC case: a changelog whose keys MOVE SHARDS on update (the shard is a
routing attribute carried in the row — tenant/language — so an UPDATE
can change it). Pins:

- after streamed batches (inserts, in-place cell moves, shard-crossing
  updates, a chained within-batch shard round-trip, out-of-order LWW,
  deletes) EVERY shard's index is row-identical to a from-scratch
  ``build_ivf2_index`` over the expected state routed to that shard;
- a chained in-batch move leaves no stale copy in the first cell /
  first shard (the purge scope is all images, not the winner's);
- untouched cells' files are never rewritten, per shard;
- full-probe ``sharded_ivf2_topk`` over the maintained shards equals
  brute force over the expected state;
- redelivery is a per-shard marker no-op, and a forced re-apply
  converges (idempotent key-drop merge).
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
    build_ivf2_index,
    cosine_topk,
    sharded_ivf2_topk,
    train_ivf2_local,
)
from cdc_example_spark.streaming.ann_freshness import (
    index_last_applied_batch_id,
    materialize_with_sharded_index,
    sharded_ivf2_apply_cdc,
)
from cdc_example_spark.streaming.envelope import decode_envelope
from tests.cdc_fixtures import envelope

DIM = 4
N_COARSE, N_FINE = 4, 3
GRPS = ("a", "b")

ROW_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("grp", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _route(img):
    return F.when(img["grp"] == "a", 0).otherwise(1)


def _shard_of(grp: str) -> int:
    return 0 if grp == "a" else 1


def _img(vid, grp, vec):
    return {"id": vid, "grp": grp, "embedding": vec}


def _state_df(spark, state, shard=None):
    rows = [
        (k, g, v)
        for k, (g, v) in sorted(state.items())
        if shard is None or _shard_of(g) == shard
    ]
    return spark.createDataFrame(
        rows, "vec_id string, grp string, embedding array<double>"
    )


def _write_batch(src, n, records):
    p = src / f"batch-{n:04d}.json"
    with open(p, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    os.utime(p, (1_700_000_000 + n, 1_700_000_000 + n))


def _assign(coarse, fines, vec):
    c = int(np.argmax(np.asarray(coarse) @ np.asarray(vec)))
    f = int(np.argmax(np.asarray(fines[c]) @ np.asarray(vec)))
    return c, f


@pytest.fixture(scope="module")
def setup(spark):
    rng = np.random.default_rng(17)
    X = rng.normal(size=(60, DIM))
    state = {
        f"v{i}": (GRPS[i % 2], [float(x) for x in X[i]]) for i in range(60)
    }
    trained = []
    for s in range(2):
        df = _state_df(spark, state, shard=s).select("vec_id", "embedding")
        trained.append(
            train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=5 + s)
        )
    return state, trained


def test_s16_sharded_index_stays_fresh_under_shard_crossing_cdc(
    spark, tmp_path, setup
):
    state, trained = setup
    state = dict(state)
    paths = [str(tmp_path / f"shard{s}") for s in range(2)]
    shards = [(paths[s], *trained[s]) for s in range(2)]
    for s in range(2):
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            paths[s],
        )
    mtimes0 = {
        s: {
            f: os.path.getmtime(f)
            for f in glob.glob(
                os.path.join(paths[s], "**", "*.parquet"), recursive=True
            )
        }
        for s in range(2)
    }
    touched = {0: set(), 1: set()}

    def _touch(grp, vec):
        s = _shard_of(grp)
        touched[s].add(_assign(*trained[s], vec))

    # concentrate the churn around ±(each shard's v0/v1 direction) so
    # only a few cells are touched per shard and the untouched-cell
    # assertion has cells left to check (the S15 fixture discipline)
    rng = np.random.default_rng(23)
    base = {0: np.asarray(state["v0"][1]), 1: np.asarray(state["v1"][1])}

    def _near(s, sign=1.0):
        return [
            float(x) for x in sign * base[s] + 0.05 * rng.normal(size=DIM)
        ]

    src = tmp_path / "cdc-in"
    src.mkdir()

    # batch 1: one insert per shard + an in-place cell-moving update
    b1 = []
    for vid, grp in (("v60", "a"), ("v61", "b")):
        v = _near(_shard_of(grp))
        b1.append(envelope("i", vid, after=_img(vid, grp, v), lsn=100 + int(vid[1:])))
        state[vid] = (grp, v)
        _touch(grp, v)
    v0_new = _near(0, -1.0)
    b1.append(
        envelope(
            "u",
            "v0",
            before=_img("v0", *state["v0"]),
            after=_img("v0", "a", v0_new),
            lsn=150,
        )
    )
    _touch("a", state["v0"][1])
    _touch("a", v0_new)
    state["v0"] = ("a", v0_new)
    _write_batch(src, 1, b1)

    # batch 2: a shard-crossing update (a → b), a delete in shard 1, an
    # out-of-order LWW pair on one key, and a CHAINED within-batch
    # shard round-trip (a → b → a, new embedding) whose intermediate
    # shard must end clean and whose ORIGINAL cell must be purged even
    # though the winning event's before image doesn't address it
    v2_b = _near(1)
    chain_mid, chain_end = _near(1, -1.0), _near(0, -1.0)
    v6_hi, v6_lo = _near(0), _near(0)
    b2 = [
        envelope(
            "u",
            "v2",
            before=_img("v2", *state["v2"]),
            after=_img("v2", "b", v2_b),
            lsn=300,
        ),
        envelope("d", "v3", before=_img("v3", *state["v3"]), after=None, lsn=301),
        # LWW pair: higher LSN written first
        envelope(
            "u",
            "v6",
            before=_img("v6", *state["v6"]),
            after=_img("v6", "a", v6_hi),
            lsn=305,
        ),
        envelope(
            "u",
            "v6",
            before=_img("v6", *state["v6"]),
            after=_img("v6", "a", v6_lo),
            lsn=304,
        ),
        # chained round-trip for v4 (starts in shard 0)
        envelope(
            "u",
            "v4",
            before=_img("v4", *state["v4"]),
            after=_img("v4", "b", chain_mid),
            lsn=310,
        ),
        envelope(
            "u",
            "v4",
            before=_img("v4", "b", chain_mid),
            after=_img("v4", "a", chain_end),
            lsn=311,
        ),
    ]
    _touch(*state["v2"])
    _touch("b", v2_b)
    _touch(*state["v3"])
    _touch(*state["v6"])
    _touch("a", v6_hi)
    _touch("a", v6_lo)
    _touch(*state["v4"])
    _touch("b", chain_mid)
    _touch("a", chain_end)
    state["v2"] = ("b", v2_b)
    del state["v3"]
    state["v6"] = ("a", v6_hi)
    state["v4"] = ("a", chain_end)
    _write_batch(src, 2, b2)

    # batch 3: update a previously-moved key in its NEW shard, and
    # delete another moved key via its new-shard before image
    v2_b2 = _near(1, -1.0)
    b3 = [
        envelope(
            "u",
            "v2",
            before=_img("v2", *state["v2"]),
            after=_img("v2", "b", v2_b2),
            lsn=400,
        ),
        envelope("d", "v60", before=_img("v60", *state["v60"]), after=None, lsn=401),
    ]
    _touch(*state["v2"])
    _touch("b", v2_b2)
    _touch(*state["v60"])
    state["v2"] = ("b", v2_b2)
    del state["v60"]
    _write_batch(src, 3, b3)

    sink = KeyedStateSink(
        path=str(tmp_path / "state"), num_buckets=8, schema=ROW_SCHEMA
    )
    q = materialize_with_sharded_index(
        spark.readStream.schema("key STRING, value STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        sink,
        shards,
        _route,
        str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(240)
    assert q.exception() is None

    # the table of record matches for every streamed key
    got_state = {
        r["id"]: (r["grp"], list(r["embedding"]))
        for r in sink.snapshot(spark).collect()
    }
    streamed = {"v0", "v2", "v4", "v6", "v61"}
    assert got_state == {k: state[k] for k in streamed}

    # (a) every shard row-identical to a from-scratch build of the
    # expected state routed to it — shard-crossing moves and the
    # chained round-trip leave neither stale copies nor strays
    want_by_shard = {}
    for s in range(2):
        full = str(tmp_path / f"full{s}")
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            full,
        )
        want_by_shard[s] = {
            (r.vec_id, r.coarse, r.fine)
            for r in spark.read.parquet(full)
            .select("vec_id", "coarse", "fine")
            .collect()
        }
        got = {
            (r.vec_id, r.coarse, r.fine)
            for r in spark.read.parquet(paths[s])
            .select("vec_id", "coarse", "fine")
            .collect()
        }
        assert got == want_by_shard[s], f"shard {s}"
        # the chained key ends in shard 0 only — the intermediate
        # shard 1 copy and the original shard-0 cell are both purged
        if s == 1:
            assert not [t for t in got if t[0] == "v4"]
    assert sum(1 for t in want_by_shard[0] if t[0] == "v4") == 1

    # (b) untouched cells' files never rewritten, per shard
    for s in range(2):
        touched_dirs = {f"coarse={c}{os.sep}fine={f}" for c, f in touched[s]}
        untouched_checked = 0
        for f, mt in mtimes0[s].items():
            cell = os.sep.join(os.path.relpath(f, paths[s]).split(os.sep)[:2])
            if cell not in touched_dirs:
                assert os.path.exists(f) and os.path.getmtime(f) == mt, f
                untouched_checked += 1
        assert untouched_checked > 0, f"shard {s} fixture degenerate"

    # (c) full-probe sharded serving over the maintained layouts equals
    # brute force over the expected state
    queries = _state_df(
        spark, {k: state[k] for k in ("v0", "v2", "v61")}
    ).select("vec_id", "embedding")
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(
            _state_df(spark, state).select("vec_id", "embedding"), queries, k=3
        ).collect()
    }
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in sharded_ivf2_topk(
            spark,
            shards,
            queries,
            k=3,
            n_probe_coarse=N_COARSE,
            n_probe_fine=N_FINE,
        ).collect()
    }
    assert served == exact

    # (d) redelivery: per-shard markers no-op a replayed batch id …
    lasts = [index_last_applied_batch_id(p) for p in paths]
    assert all(l is not None for l in lasts)
    raw3 = spark.createDataFrame(b3, "key STRING, value STRING")
    decoded3 = decode_envelope(raw3, row_schema=ROW_SCHEMA)
    assert sharded_ivf2_apply_cdc(
        decoded3, shards, _route, batch_id=min(lasts)
    ) == {0: [], 1: []}
    # … and a forced re-apply converges (idempotent key-drop merge)
    sharded_ivf2_apply_cdc(decoded3, shards, _route, batch_id=None)
    for s in range(2):
        again = {
            (r.vec_id, r.coarse, r.fine)
            for r in spark.read.parquet(paths[s])
            .select("vec_id", "coarse", "fine")
            .collect()
        }
        assert again == want_by_shard[s], f"shard {s} diverged on re-apply"


def test_s16_untouched_shard_costs_zero_work(spark, tmp_path, setup):
    """VERDICT r11 item 4: a shard no image routes to must cost ZERO
    Spark jobs — one tiny distinct job lists the touched ordinals, and
    untouched shards take a marker-only commit (the materialize_tables
    topic-listing discipline: absent tables cost zero work)."""
    import cdc_example_spark.streaming.ann_freshness as AF

    state, trained = setup
    paths = [str(tmp_path / f"shard{s}") for s in range(2)]
    shards = [(paths[s], *trained[s]) for s in range(2)]
    for s in range(2):
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            paths[s],
        )
    shard1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(paths[1], "**", "*"), recursive=True)
        if os.path.isfile(f)
    }

    # a batch whose images all live in shard 0 (grp 'a')
    rng = np.random.default_rng(37)
    b = [
        envelope(
            "i",
            "v80",
            after=_img("v80", "a", [float(x) for x in rng.normal(size=DIM)]),
            lsn=800,
        ),
        envelope(
            "u",
            "v0",
            before=_img("v0", *state["v0"]),
            after=_img("v0", "a", [float(x) for x in rng.normal(size=DIM)]),
            lsn=801,
        ),
    ]
    decoded = decode_envelope(
        spark.createDataFrame(b, "key STRING, value STRING"), row_schema=ROW_SCHEMA
    )

    # every per-shard Spark job lives inside ivf2_apply_cdc — record
    # which index paths it runs for
    applied_paths = []
    real_apply = AF.ivf2_apply_cdc

    def _recording_apply(sub, coarse, fines, path, **kw):
        applied_paths.append(path)
        return real_apply(sub, coarse, fines, path, **kw)

    AF.ivf2_apply_cdc = _recording_apply
    try:
        out = AF.sharded_ivf2_apply_cdc(decoded, shards, _route, batch_id=5)
    finally:
        AF.ivf2_apply_cdc = real_apply

    assert out[0] != [] and out[1] == []
    # the untouched shard never entered the per-shard merge path …
    assert applied_paths == [paths[0]]
    # … its files (parquet AND any pre-existing metadata) are untouched …
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(paths[1], "**", "*"), recursive=True)
        if os.path.isfile(f) and not f.endswith("_applied_batch_id")
    } == shard1_files
    # … but its exactly-once bookkeeping still advanced (marker-only
    # commit), so a redelivery no-ops on BOTH shards
    assert index_last_applied_batch_id(paths[1]) == 5
    assert sharded_ivf2_apply_cdc(decoded, shards, _route, batch_id=5) == {
        0: [],
        1: [],
    }


def test_s16_uncovered_route_raises_instead_of_dropping(spark, tmp_path, setup):
    """ADVICE r11: a non-null image whose route evaluates to NULL (or
    to an ordinal outside the layout) used to be masked out of every
    shard — the vector silently vanished from all indexes. It must
    raise."""
    state, trained = setup
    paths = [str(tmp_path / f"shard{s}") for s in range(2)]
    shards = [(paths[s], *trained[s]) for s in range(2)]
    for s in range(2):
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            paths[s],
        )

    # a partial route: no otherwise() branch, so grp 'zz' → NULL
    def _partial_route(img):
        return F.when(img["grp"] == "a", 0).when(img["grp"] == "b", 1)

    rng = np.random.default_rng(41)
    bad = [
        envelope(
            "i",
            "v90",
            after=_img("v90", "zz", [float(x) for x in rng.normal(size=DIM)]),
            lsn=900,
        )
    ]
    decoded = decode_envelope(
        spark.createDataFrame(bad, "key STRING, value STRING"),
        row_schema=ROW_SCHEMA,
    )
    with pytest.raises(ValueError, match="routes to"):
        sharded_ivf2_apply_cdc(decoded, shards, _partial_route, batch_id=0)

    # out-of-range ordinals are the same bug (a 2-shard route against a
    # larger layout constant, say) — same loud failure
    def _oob_route(img):
        return F.when(img["grp"] == "a", 7).otherwise(1)

    ok = [
        envelope(
            "i",
            "v91",
            after=_img("v91", "a", [float(x) for x in rng.normal(size=DIM)]),
            lsn=901,
        )
    ]
    decoded2 = decode_envelope(
        spark.createDataFrame(ok, "key STRING, value STRING"),
        row_schema=ROW_SCHEMA,
    )
    with pytest.raises(ValueError, match="routes to"):
        sharded_ivf2_apply_cdc(decoded2, shards, _oob_route, batch_id=0)
    # neither failure committed a marker — the batch can be redelivered
    # after the route is fixed
    assert index_last_applied_batch_id(paths[0]) is None
    assert index_last_applied_batch_id(paths[1]) is None


def test_s16_crash_between_shard_commits_redelivers_cleanly(spark, tmp_path, setup):
    """The per-shard-marker exactly-once composition, executed: apply a
    batch to shard 0 ONLY (the crash point — shard 0's marker is
    committed, shard 1's is not), then redeliver the WHOLE batch
    through the sharded apply. Shard 0 must no-op on its marker,
    shard 1 must merge normally, and both must end identical to the
    single uninterrupted apply."""
    state, trained = setup
    state = dict(state)
    paths = [str(tmp_path / f"shard{s}") for s in range(2)]
    shards = [(paths[s], *trained[s]) for s in range(2)]
    for s in range(2):
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            paths[s],
        )

    rng = np.random.default_rng(31)
    move_v = [float(x) for x in rng.normal(size=DIM)]
    ins_v = [float(x) for x in rng.normal(size=DIM)]
    # one shard-crossing update (a → b) + one insert into shard 0
    b = [
        envelope(
            "u",
            "v8",
            before=_img("v8", *state["v8"]),
            after=_img("v8", "b", move_v),
            lsn=700,
        ),
        envelope("i", "v70", after=_img("v70", "a", ins_v), lsn=701),
    ]
    state["v8"] = ("b", move_v)
    state["v70"] = ("a", ins_v)
    decoded = decode_envelope(
        spark.createDataFrame(b, "key STRING, value STRING"), row_schema=ROW_SCHEMA
    )

    # crash point: only shard 0 sees the batch (its masked view), and
    # its marker commits
    from cdc_example_spark.streaming.ann_freshness import ivf2_apply_cdc

    before_0 = F.when(
        F.col("before").isNotNull() & (_route(F.col("before")) == 0),
        F.col("before"),
    )
    after_0 = F.when(
        F.col("after").isNotNull() & (_route(F.col("after")) == 0),
        F.col("after"),
    )
    sub0 = decoded.filter(F.col("key_id").isNotNull()).select(
        "key_id", before_0.alias("before"), after_0.alias("after"), "lsn", "ts_ms"
    ).filter(F.col("before").isNotNull() | F.col("after").isNotNull())
    ivf2_apply_cdc(sub0, *trained[0], paths[0], batch_id=0)
    assert index_last_applied_batch_id(paths[0]) == 0
    assert index_last_applied_batch_id(paths[1]) is None
    shard0_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(paths[0], "**", "*.parquet"), recursive=True)
    }

    # redelivery: the full sharded apply with the same batch id
    out = sharded_ivf2_apply_cdc(decoded, shards, _route, batch_id=0)
    assert out[0] == []  # marker no-op on the committed shard
    assert out[1] != []  # normal merge on the crashed-before shard
    # the committed shard's files were not rewritten by the no-op
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(paths[0], "**", "*.parquet"), recursive=True)
    } == shard0_files

    # both shards end identical to an uninterrupted from-scratch build
    for s in range(2):
        want = str(tmp_path / f"want{s}")
        build_ivf2_index(
            _state_df(spark, state, shard=s).select("vec_id", "embedding"),
            *trained[s],
            want,
        )
        got_rows = {
            (r.vec_id, r.coarse, r.fine)
            for r in spark.read.parquet(paths[s])
            .select("vec_id", "coarse", "fine")
            .collect()
        }
        want_rows = {
            (r.vec_id, r.coarse, r.fine)
            for r in spark.read.parquet(want)
            .select("vec_id", "coarse", "fine")
            .collect()
        }
        assert got_rows == want_rows, f"shard {s}"
