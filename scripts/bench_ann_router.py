"""Measure the sharded ANN router at tier (VERDICT r6 item 6).

The similarity ladder's last rung — ``sharded_ivf2_topk`` routing over
per-shard two-level indexes past ~4 M vectors/shard — is
correctness-pinned (full probe == brute force, tests/test_ivf2.py) but
had no measured row. This script builds BOTH deployment shapes over
the SAME 800 k-vector corpus (4 × 200 k disjoint shards, the k=100
scaling shard's size, replicated with id offsets + per-copy epsilon —
the bench_scaling replication discipline):

  A. one monolithic two-level index (ivf2_shape_for(800k) cells)
  B. four 200 k shards, independently trained/built, served through
     the router (per-shard probes, k-bounded union, one global window)

and records, for a 16-query batch at k=10: train+build wall per shape,
serve latency (median of 3), and exact recall@10 against brute force
over the full corpus. Run it ALONE (the bench discipline); ~10-15 min.

Usage: python scripts/bench_ann_router.py
Prints one JSON line; paste the row into BASELINE.md/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/sparkgraft_scale")
N_SHARDS = 4
COPIES_PER_SHARD = 100  # sf0.1 embeddings x100 = 200k vectors/shard
K = 10
N_QUERIES = 16


def generate() -> "list[str]":
    """4 disjoint 200k shards (id offset + epsilon per copy, the
    bench_scaling replication rules), idempotent."""
    out_dir = os.path.join(ROOT, "ann_router")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    con = duckdb.connect()
    src = os.path.join(BASE, "embeddings.parquet")
    for s in range(N_SHARDS):
        dst = os.path.join(out_dir, f"shard{s}.parquet")
        paths.append(dst)
        if os.path.exists(dst):
            continue
        lo = s * COPIES_PER_SHARD
        con.execute(
            f"COPY (SELECT vec_id + (i + {lo}) * 10000000 AS vec_id, "
            f"label + (i + {lo}) * 1000 AS label, "
            "CAST(list_transform(embedding, x -> x + 0.001 * (i + "
            f"{lo})) AS FLOAT[]) AS embedding "
            f"FROM '{src}', range(0, {COPIES_PER_SHARD}) AS c(i)) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()
    return paths


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_example_spark.operators import similarity as S
    from cdc_example_spark.session import get_spark, scale_profile

    shard_paths = generate()
    out_dir = os.path.join(ROOT, "ann_router")
    spark = get_spark("bench-ann-router", extra_conf=scale_profile(BASE))
    spark.sparkContext.setLogLevel("ERROR")

    shard_dfs = [spark.read.parquet(p) for p in shard_paths]
    full = shard_dfs[0]
    for df in shard_dfs[1:]:
        full = full.unionAll(df)
    n_total = full.count()
    queries = shard_dfs[0].orderBy("vec_id").limit(N_QUERIES)

    # ---- shape A: one monolithic two-level index ---------------------
    kc, kf = S.ivf2_shape_for(n_total)
    t0 = time.perf_counter()
    coarse_a, fines_a = S.train_ivf2_local(full, kc, kf)
    train_a = round(time.perf_counter() - t0, 3)
    path_a = os.path.join(out_dir, "index_single")
    t0 = time.perf_counter()
    S.build_ivf2_index(full, coarse_a, fines_a, path_a)
    build_a = round(time.perf_counter() - t0, 3)

    def serve_a():
        return S.ivf2_topk_indexed(
            spark, path_a, queries, coarse_a, fines_a, k=K
        ).collect()

    serve_a()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows_a = serve_a()
        samples.append(time.perf_counter() - t0)
    serve_a_s = round(sorted(samples)[1], 3)

    # ---- shape B: router over 4 independently built shards -----------
    kcs, kfs = S.ivf2_shape_for(n_total // N_SHARDS)
    shards = []
    train_b = build_b = 0.0
    for s, (p, df) in enumerate(zip(shard_paths, shard_dfs)):
        t0 = time.perf_counter()
        coarse, fines = S.train_ivf2_local(df, kcs, kfs)
        train_b += time.perf_counter() - t0
        ip = os.path.join(out_dir, f"index_shard{s}")
        t0 = time.perf_counter()
        S.build_ivf2_index(df, coarse, fines, ip)
        build_b += time.perf_counter() - t0
        shards.append((ip, coarse, fines))
    train_b, build_b = round(train_b, 3), round(build_b, 3)

    def serve_b():
        return S.sharded_ivf2_topk(spark, shards, queries, k=K).collect()

    serve_b()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows_b = serve_b()
        samples.append(time.perf_counter() - t0)
    serve_b_s = round(sorted(samples)[1], 3)

    # ---- exact recall@K against brute force over the full corpus -----
    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["vec_id"])
        for r in S.cosine_topk(full, queries, k=K, use_pandas_udf=True).collect()
    }
    brute_s = round(time.perf_counter() - t0, 3)
    got_a = {(r["query_id"], r["vec_id"]) for r in rows_a}
    got_b = {(r["query_id"], r["vec_id"]) for r in rows_b}
    recall_a = round(len(got_a & brute) / len(brute), 4)
    recall_b = round(len(got_b & brute) / len(brute), 4)

    print(
        json.dumps(
            {
                "n_vectors": int(n_total),
                "n_shards": N_SHARDS,
                "k": K,
                "n_queries": N_QUERIES,
                "single": {
                    "cells": f"{kc}x{kf}",
                    "train_sec": train_a,
                    "build_sec": build_a,
                    "serve_sec": serve_a_s,
                    "recall_at_k": recall_a,
                },
                "sharded": {
                    "cells_per_shard": f"{kcs}x{kfs}",
                    "train_sec_total": train_b,
                    "build_sec_total": build_b,
                    "serve_sec": serve_b_s,
                    "recall_at_k": recall_b,
                },
                "brute_force_sec": brute_s,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
