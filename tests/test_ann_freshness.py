"""S15 — CDC → ANN index freshness (VERDICT r9 item 7).

One embeddings CDC stream drives BOTH the table of record
(KeyedStateSink, S14 heterogeneous schema) and the persisted IVF2
serving index inside one foreachBatch. Pins:

- after N streamed batches (inserts, cell-moving updates, out-of-order
  LWW, deletes) the index is row-identical to a from-scratch
  ``build_ivf2_index`` over the expected table state;
- untouched cells' files are never rewritten;
- full-probe serving from the maintained index equals brute force;
- redelivery is a marker no-op, and even a forced re-apply converges
  (the key-drop merge is idempotent).
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
    train_ivf2_local,
)
from cdc_example_spark.streaming.ann_freshness import (
    index_last_applied_batch_id,
    ivf2_apply_cdc,
    materialize_with_index,
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


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    state = _vecs(60)
    df = _emb_df(spark, state)
    coarse, fines = train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=3)
    return state, coarse, fines


def _assign(coarse, fines, vec):
    c = int(np.argmax(np.asarray(coarse) @ np.asarray(vec)))
    f = int(np.argmax(np.asarray(fines[c]) @ np.asarray(vec)))
    return c, f


def test_s15_chained_inbatch_update_purges_first_cell(spark, tmp_path, setup):
    """A key updated TWICE in one batch (cellX → cellY → cellZ, chained
    before images) must not leave a stale copy in cellX: the winning
    event's before image only addresses cellY, so the purge scope has
    to be the cells of ALL the batch's images, not the winner's."""
    state, coarse, fines = setup
    index = str(tmp_path / "index")
    build_ivf2_index(_emb_df(spark, state), coarse, fines, index)

    rng = np.random.default_rng(29)
    base = np.asarray(state["v0"])
    mid = [float(x) for x in base + 0.05 * rng.normal(size=DIM)]
    end = [float(x) for x in -base + 0.05 * rng.normal(size=DIM)]
    cells = {
        "orig": _assign(coarse, fines, state["v7"]),
        "mid": _assign(coarse, fines, mid),
        "end": _assign(coarse, fines, end),
    }
    # precondition: the three hops land in three distinct cells, or the
    # pin proves nothing (deterministic under the fixed seeds)
    assert len(set(cells.values())) == 3, cells

    b = [
        envelope("u", "v7", before=_img("v7", state["v7"]), after=_img("v7", mid), lsn=500),
        envelope("u", "v7", before=_img("v7", mid), after=_img("v7", end), lsn=501),
    ]
    decoded = decode_envelope(
        spark.createDataFrame(b, "key STRING, value STRING"), row_schema=EMB_SCHEMA
    )
    touched = ivf2_apply_cdc(decoded, coarse, fines, index)
    assert set(cells.values()) <= set(touched)
    placed = [
        (r.coarse, r.fine)
        for r in spark.read.parquet(index)
        .filter(F.col("vec_id") == "v7")
        .select("coarse", "fine")
        .collect()
    ]
    assert placed == [cells["end"]], placed


def test_s15_purging_a_cells_last_vector_clears_its_file(spark, tmp_path, setup):
    """Dynamic partition overwrite only rewrites partitions that have
    rows in the merge output — deleting EVERY occupant of a cell used
    to leave the cell's old file on disk, still serving the purged
    vectors (ADVICE r11, medium). The emptied cell directory must be
    cleared explicitly."""
    state, coarse, fines = setup
    index = str(tmp_path / "index")
    build_ivf2_index(_emb_df(spark, state), coarse, fines, index)

    # pick the least-occupied cell and tombstone ALL of its occupants
    # in one batch — the merge output then has zero rows for that cell
    occ = {}
    for r in spark.read.parquet(index).select("vec_id", "coarse", "fine").collect():
        occ.setdefault((int(r.coarse), int(r.fine)), []).append(r.vec_id)
    cell, victims = min(occ.items(), key=lambda kv: (len(kv[1]), kv[0]))
    b = [
        envelope("d", vid, before=_img(vid, state[vid]), after=None, lsn=900 + i)
        for i, vid in enumerate(sorted(victims))
    ]
    decoded = decode_envelope(
        spark.createDataFrame(b, "key STRING, value STRING"), row_schema=EMB_SCHEMA
    )
    touched = ivf2_apply_cdc(decoded, coarse, fines, index, batch_id=0)
    assert cell in set(touched)

    # the emptied cell's directory is gone — no stale file keeps
    # serving the purged vectors
    cell_dir = os.path.join(index, f"coarse={cell[0]}", f"fine={cell[1]}")
    assert not glob.glob(os.path.join(cell_dir, "*.parquet"))
    served = {
        r.vec_id for r in spark.read.parquet(index).select("vec_id").collect()
    }
    assert served == set(state) - set(victims)
    # redelivery of the purge batch stays a marker no-op
    assert ivf2_apply_cdc(decoded, coarse, fines, index, batch_id=0) == []


def test_s15_index_stays_fresh_under_cdc(spark, tmp_path, setup):
    state, coarse, fines = setup
    state = dict(state)
    index = str(tmp_path / "index")
    build_ivf2_index(_emb_df(spark, state), coarse, fines, index)
    mtimes0 = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(index, "**", "*.parquet"), recursive=True)
    }

    src = tmp_path / "cdc-in"
    src.mkdir()
    # concentrate the churn around ±v0 so only a few cells are touched
    # and the untouched-cell assertion has cells left to check
    rng = np.random.default_rng(11)
    base = np.asarray(state["v0"])

    def _near(direction):
        return [float(x) for x in direction + 0.05 * rng.normal(size=DIM)]

    new = {k: _near(base) for k in ("v3", "v60", "v61", "v62", "v63", "v64", "v65")}
    moved = {k: _near(-base) for k in ("v1", "v2", "v3", "v5")}
    expected_touched = set()

    def _touch(*vecs):
        for v in vecs:
            expected_touched.add(_assign(coarse, fines, v))

    # batch 1: five inserts (ids BEYOND the initial 60)
    b1 = []
    for i in range(60, 65):
        vid = f"v{i}"
        b1.append(envelope("i", vid, after=_img(vid, new[vid]), lsn=100 + i))
        state[vid] = new[vid]
        _touch(new[vid])
    _write_batch(src, 1, b1)

    # batch 2: two cell-moving updates (before images carried), one
    # insert, and an out-of-order LWW pair for v3 (higher LSN first)
    b2 = [
        envelope("u", "v1", before=_img("v1", state["v1"]), after=_img("v1", moved["v1"]), lsn=300),
        envelope("u", "v2", before=_img("v2", state["v2"]), after=_img("v2", moved["v2"]), lsn=301),
        envelope("i", "v65", after=_img("v65", new["v65"]), lsn=302),
        envelope("u", "v3", before=_img("v3", state["v3"]), after=_img("v3", moved["v3"]), lsn=304),
        envelope("u", "v3", before=_img("v3", state["v3"]), after=_img("v3", new["v3"]), lsn=303),
    ]
    _touch(state["v1"], moved["v1"], state["v2"], moved["v2"], new["v65"],
           state["v3"], moved["v3"], new["v3"])
    state["v1"], state["v2"], state["v3"] = moved["v1"], moved["v2"], moved["v3"]
    state["v65"] = new["v65"]
    _write_batch(src, 2, b2)

    # batch 3: a delete (tombstone with before image) and an update of
    # a row inserted by batch 1 (before image = the batch-1 value)
    b3 = [
        envelope("d", "v4", before=_img("v4", state["v4"]), after=None, lsn=400),
        envelope("u", "v60", before=_img("v60", state["v60"]), after=_img("v60", moved["v5"]), lsn=401),
    ]
    _touch(state["v4"], state["v60"], moved["v5"])
    del state["v4"]
    state["v60"] = moved["v5"]
    _write_batch(src, 3, b3)

    sink = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8, schema=EMB_SCHEMA)
    q = materialize_with_index(
        spark.readStream.schema("key STRING, value STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        sink,
        index,
        coarse,
        fines,
        str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(180)
    assert q.exception() is None

    # the table of record matches for every STREAMED key (the initial
    # 60 were index-bootstrapped, not streamed; v4's tombstone is a
    # no-op there)
    got_state = {
        r["id"]: list(r["embedding"])
        for r in sink.snapshot(spark).collect()
    }
    streamed = {"v1", "v2", "v3", "v60", "v61", "v62", "v63", "v64", "v65"}
    assert got_state == {k: state[k] for k in streamed}

    # (a) index row-identical to a from-scratch build over the state
    full = str(tmp_path / "full")
    build_ivf2_index(_emb_df(spark, state), coarse, fines, full)
    got = {
        (r.vec_id, r.coarse, r.fine)
        for r in spark.read.parquet(index).select("vec_id", "coarse", "fine").collect()
    }
    want = {
        (r.vec_id, r.coarse, r.fine)
        for r in spark.read.parquet(full).select("vec_id", "coarse", "fine").collect()
    }
    assert got == want

    # (b) untouched cells' files never rewritten
    touched_dirs = {f"coarse={c}{os.sep}fine={f}" for c, f in expected_touched}
    untouched_checked = 0
    for f, mt in mtimes0.items():
        cell = os.sep.join(os.path.relpath(f, index).split(os.sep)[:2])
        if cell not in touched_dirs:
            assert os.path.exists(f) and os.path.getmtime(f) == mt, f
            untouched_checked += 1
    assert untouched_checked > 0, "fixture degenerate: every cell touched"

    # (c) serving from the maintained index files == brute force over
    # the expected state (row-identity above already equates the
    # maintained layout with a fresh build, and tests/test_ivf2.py pins
    # the probe path on that layout — this closes the loop at the
    # file-serving level for the streamed ids)
    queries = _emb_df(spark, {k: state[k] for k in ("v0", "v1", "v60")})
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(_emb_df(spark, state), queries, k=3).collect()
    }
    maintained = spark.read.parquet(index).select(
        "vec_id", F.col("v").alias("embedding")
    )
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(maintained, queries, k=3).collect()
    }
    assert served == exact

    # (d) redelivery: the marker no-ops a replayed batch id …
    last = index_last_applied_batch_id(index)
    assert last is not None
    raw3 = spark.createDataFrame(b3, "key STRING, value STRING")
    decoded3 = decode_envelope(raw3, row_schema=EMB_SCHEMA)
    assert ivf2_apply_cdc(decoded3, coarse, fines, index, batch_id=last) == []
    # … and even a FORCED re-apply converges (idempotent key-drop merge)
    ivf2_apply_cdc(decoded3, coarse, fines, index, batch_id=None)
    again = {
        (r.vec_id, r.coarse, r.fine)
        for r in spark.read.parquet(index).select("vec_id", "coarse", "fine").collect()
    }
    assert again == want


def test_survivor_cell_encoding_guard_fails_loudly(spark, tmp_path):
    """ADVICE r12: the survivor-cell Observation encodes cells as
    coarse*1e6 + fine — a layout whose fine ordinals could reach 1e6
    would decode onto the WRONG cell and rmtree a live directory. The
    apply must refuse such a shape up front (driver-side, no job)."""
    import pytest as _pytest

    from cdc_example_spark.streaming.ann_freshness import ivf2_apply_cdc

    coarse = [[1.0, 0.0]]
    # one coarse cell declaring 1_000_001 fine centroids (shared refs —
    # the guard only reads len())
    fines = [[[1.0, 0.0]] * 1_000_001]
    decoded = decode_envelope(
        spark.createDataFrame(
            [envelope("i", "v0", after={"id": "v0", "embedding": [1.0, 0.0]},
                      lsn=1)],
            "key STRING, value STRING",
        ),
        row_schema=EMB_SCHEMA,
    )
    with _pytest.raises(ValueError, match="survivor-cell encoding"):
        ivf2_apply_cdc(decoded, coarse, fines, str(tmp_path / "idx"))
