"""Two-level (coarse-quantizer) IVF tests — the scale path past the
flat index's ~4096-cell ceiling (operators/similarity.py, q102).

Independent checks: NumPy replays the two-level assignment, the
full-probe serve must equal the exact brute-force top-k, and the
serving read must actually PRUNE to the probed (coarse, fine)
directories — the property that makes the layout an index.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from cdc_example_spark.operators.similarity import (
    build_ivf2_index,
    cosine_topk,
    ivf2_probe_pairs,
    ivf2_topk_indexed,
    train_ivf2_local,
)


N_COARSE, N_FINE, DIM = 4, 3, 16


def _clustered(n_per: int = 60, seed: int = 3):
    rng = np.random.default_rng(seed)
    centers = np.eye(DIM)[: N_COARSE * 2]  # more clusters than coarse cells
    X = np.vstack(
        [c + 0.08 * rng.normal(size=(n_per, DIM)) for c in centers]
    )
    return X / np.linalg.norm(X, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def corpus(spark):
    X = _clustered()
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    return X, df


@pytest.fixture(scope="module")
def trained(corpus):
    _, df = corpus
    return train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=1)


@pytest.fixture(scope="module")
def index_path(corpus, trained, tmp_path_factory):
    _, df = corpus
    coarse, fines = trained
    path = str(tmp_path_factory.mktemp("ivf2") / "index")
    build_ivf2_index(df, coarse, fines, path)
    return path


def test_trainer_is_deterministic(corpus):
    _, df = corpus
    c1, f1 = train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=1)
    c2, f2 = train_ivf2_local(df, N_COARSE, N_FINE, sample_size=512, seed=1)
    assert c1 == c2 and f1 == f2


def test_trainer_shapes_and_unit_norm(trained):
    coarse, fines = trained
    assert len(coarse) == N_COARSE and len(fines) == N_COARSE
    for f in fines:
        assert 1 <= len(f) <= N_FINE
        for c in f:
            assert np.linalg.norm(c) == pytest.approx(1.0, abs=1e-9)


def test_built_index_matches_numpy_assignment(corpus, trained, index_path, spark):
    X, _ = corpus
    coarse, fines = trained
    C1 = np.asarray(coarse)
    rows = spark.read.parquet(index_path).select("vec_id", "coarse", "fine").collect()
    assert len(rows) == len(X)
    for r in rows:
        v = X[r.vec_id]
        c = int((v @ C1.T).argmax())
        f = int((v @ np.asarray(fines[c]).T).argmax())
        assert (r.coarse, r.fine) == (c, f), f"vec {r.vec_id}"


def test_full_probe_equals_exact_topk(corpus, trained, index_path, spark):
    """Probing EVERY (coarse, fine) cell must reproduce brute force —
    the approximation comes only from probe selection, never from the
    layout or the join."""
    X, df = corpus
    coarse, fines = trained
    queries = df.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(df, queries, k=3).collect()
    }
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in ivf2_topk_indexed(
            spark, index_path, queries, coarse, fines, k=3,
            n_probe_coarse=N_COARSE, n_probe_fine=N_FINE,
        ).collect()
    }
    assert served == exact


def test_partial_probe_recall_and_pruning(corpus, trained, index_path, spark):
    X, df = corpus
    coarse, fines = trained
    queries = df.filter(F.col("vec_id") < 8)
    served = ivf2_topk_indexed(
        spark, index_path, queries, coarse, fines, k=3,
        n_probe_coarse=2, n_probe_fine=2,
    )
    # (a) the serving read PRUNES: the scan touches only probed
    # (coarse, fine) directories, strictly fewer than exist.
    # input_file_name() is only valid BEFORE an exchange, so replay the
    # operator's pruned read (same disjunctive partition predicate) and
    # list its files directly.
    pairs = set()
    for r in queries.collect():
        pairs.update(
            ivf2_probe_pairs(np.asarray(r.embedding), coarse, fines, 2, 2)
        )
    by_coarse = {}
    for c, f in sorted(pairs):
        by_coarse.setdefault(c, []).append(f)
    pred = None
    for c, fs in by_coarse.items():
        p = (F.col("coarse") == c) & F.col("fine").isin(fs)
        pred = p if pred is None else (pred | p)
    touched = {
        tuple(
            int(seg.split("=")[1])
            for seg in f.split(os.sep)
            if seg.startswith(("coarse=", "fine="))
        )
        for (f,) in spark.read.parquet(index_path)
        .filter(pred)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    all_dirs = {
        (r.coarse, r.fine)
        for r in spark.read.parquet(index_path)
        .select("coarse", "fine")
        .distinct()
        .collect()
    }
    assert touched <= pairs
    assert len(pairs) < len(all_dirs)
    # (b) recall vs exact is high on well-clustered data
    exact = {
        r.query_id: set()
        for r in queries.select(F.col("vec_id").alias("query_id")).collect()
    }
    for r in cosine_topk(df, queries, k=3).collect():
        exact[r.query_id].add(r.vec_id)
    got = {q: set() for q in exact}
    for r in served.collect():
        got[r.query_id].add(r.vec_id)
    hits = sum(len(exact[q] & got[q]) for q in exact)
    assert hits / (3 * len(exact)) >= 0.8


def test_empty_coarse_cell_falls_back_to_coarse_centroid(spark):
    """With more coarse cells than data clusters, an empty sample cell
    must still yield a servable (coarse, fine=0) layout seeded from
    the coarse centroid itself."""
    rng = np.random.default_rng(9)
    X = np.eye(8)[:2] + 0.01 * rng.normal(size=(2, 8))
    X = np.vstack([X] * 10)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    coarse, fines = train_ivf2_local(df, 4, 2, sample_size=64, seed=2)
    assert len(fines) == 4 and all(len(f) >= 1 for f in fines)
    # every vector still assigns somewhere valid
    C1 = np.asarray(coarse)
    for v in X:
        c = int((v @ C1.T).argmax())
        assert 0 <= int((v @ np.asarray(fines[c]).T).argmax()) < len(fines[c])


def test_q102_pinned_oracle_centroids_match_trainer(spark):
    """q102's DuckDB oracle embeds the sf0.01 two-level centroids as
    literals (queries/q102_ivf2_sf001.py). The pin must track the
    trainer bit-for-bit — any drift (trainer change, testdata
    regeneration) fails here with the regen command in hand
    (scripts/gen_q102_oracle_centroids.py)."""
    from cdc_example_spark.operators.similarity import ivf2_shape_for
    from cdc_example_spark.queries.q102_ivf2_sf001 import (
        COARSE_SF001,
        FINES_SF001,
        SF_DIR,
    )
    from cdc_example_spark.sources.catalog import load_table

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"pinned tier {SF_DIR} not present")
    emb = load_table(spark, SF_DIR, "embeddings", cache=False)
    nc, nf = ivf2_shape_for(emb.count())
    coarse, fines = train_ivf2_local(
        emb, n_coarse=nc, n_fine=nf, sample_size=512, n_iters=10
    )
    assert coarse == COARSE_SF001
    assert fines == FINES_SF001


def test_quantized_topk_tracks_exact_topk(corpus, spark):
    """INT8 serving (q104): on the clustered fixture the quantized
    ranking must recover >= 80% of the exact float top-3 and every
    quantized score must sit within the int8 resolution of the exact
    cosine (|err| <= ~2/127 for unit vectors)."""
    from cdc_example_spark.operators.similarity import quantized_cosine_topk

    X, df = corpus
    queries = df.filter(F.col("vec_id") < 8)
    exact = {}
    for r in cosine_topk(df, queries, k=3).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
        exact[(r.query_id, r.vec_id)] = r.cos_sim
    got = {}
    for r in quantized_cosine_topk(df, queries, k=3).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
        if (r.query_id, r.vec_id) in exact:
            assert abs(r.cos_q - exact[(r.query_id, r.vec_id)]) <= 2.0 / 127
    hits = sum(
        len(exact[q] & got[q]) for q in range(8) if q in exact and q in got
    )
    assert hits / (3 * 8) >= 0.8


def test_quantized_topk_drops_zero_vectors(spark):
    from cdc_example_spark.operators.similarity import quantized_cosine_topk

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector: no direction, must not score
        ],
        "vec_id long, embedding array<double>",
    )
    rows = quantized_cosine_topk(df, df.filter("vec_id = 0"), k=5).collect()
    assert {r.vec_id for r in rows} == {1}


def test_sharded_router_full_probe_equals_exact(corpus, spark, tmp_path_factory):
    """Two disjoint shards, each with its own trained two-level index:
    the router's full-probe serve must equal brute force over the whole
    corpus — union-of-top-k + one re-rank window loses nothing."""
    from cdc_example_spark.operators.similarity import sharded_ivf2_topk

    X, df = corpus
    queries = df.filter(F.col("vec_id") < 6)
    half = len(X) // 2
    shards = []
    for i, part in enumerate(
        (df.filter(F.col("vec_id") < half), df.filter(F.col("vec_id") >= half))
    ):
        coarse, fines = train_ivf2_local(part, 3, 2, sample_size=512, seed=5 + i)
        path = str(tmp_path_factory.mktemp(f"shard{i}") / "index")
        build_ivf2_index(part, coarse, fines, path)
        shards.append((path, coarse, fines))
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(df, queries, k=3).collect()
    }
    got = {
        (r.query_id, r.rn): r.vec_id
        for r in sharded_ivf2_topk(
            spark, shards, queries, k=3, n_probe_coarse=3, n_probe_fine=2
        ).collect()
    }
    assert got == exact


def test_ivf2_upsert_touches_only_new_cells_and_serves_like_full_build(
    corpus, trained, spark, tmp_path_factory
):
    """Build on the first half, upsert the second: (a) the index must
    end up row-identical to a from-scratch full build (same cells, same
    vectors), (b) untouched cells' files must NOT be rewritten, and (c)
    full-probe serving from the upserted index equals brute force."""
    import glob

    from cdc_example_spark.operators.similarity import ivf2_upsert

    X, df = corpus
    coarse, fines = trained
    half = len(X) // 2
    path = str(tmp_path_factory.mktemp("upsert") / "index")
    build_ivf2_index(df.filter(F.col("vec_id") < half), coarse, fines, path)

    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }
    touched = ivf2_upsert(
        df.filter(F.col("vec_id") >= half), coarse, fines, path
    )
    assert touched  # the second half lands somewhere

    # (a) row-identical to the full build
    full_path = str(tmp_path_factory.mktemp("full") / "index")
    build_ivf2_index(df, coarse, fines, full_path)
    got = {
        (r.vec_id, r.coarse, r.fine)
        for r in spark.read.parquet(path).select("vec_id", "coarse", "fine").collect()
    }
    want = {
        (r.vec_id, r.coarse, r.fine)
        for r in spark.read.parquet(full_path)
        .select("vec_id", "coarse", "fine")
        .collect()
    }
    assert got == want

    # (b) untouched cells' files survive byte-date-identical
    touched_dirs = {f"coarse={c}{os.sep}fine={f}" for c, f in touched}
    for f, mt in before.items():
        rel = os.path.relpath(f, path)
        cell = os.sep.join(rel.split(os.sep)[:2])
        if cell not in touched_dirs:
            assert os.path.exists(f) and os.path.getmtime(f) == mt, f

    # (c) full-probe serving == brute force
    queries = df.filter(F.col("vec_id") < 6)
    exact = {
        (r.query_id, r.rn): r.vec_id
        for r in cosine_topk(df, queries, k=3).collect()
    }
    served = {
        (r.query_id, r.rn): r.vec_id
        for r in ivf2_topk_indexed(
            spark, path, queries, coarse, fines, k=3,
            n_probe_coarse=N_COARSE, n_probe_fine=N_FINE,
        ).collect()
    }
    assert served == exact
