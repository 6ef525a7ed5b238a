"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
stream candidates through a codegen'd cosine, WindowGroupLimit keeps k
per query. Exact; scan-bound at 100 TB.

Scale path: IVF — partition candidates by nearest centroid; a query
probes only ``n_probe`` centroid partitions, cutting the scan by
|centroids|/n_probe. Centroids are provided (deterministic); training
them is a kmeans loop the caller runs offline (e.g. on a sample via
pandas — out of the query path by design).

Both paths share the same output schema, so callers swap exactness for
cost without rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.functions import vector as V


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_pandas_udf: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, vec_id, cos_sim double, rn). Self-matches are
    excluded by id. ``use_pandas_udf`` switches the cosine kernel to the
    Arrow-batched NumPy implementation (same results; wins when the
    vector dimension is large).
    """
    cand = _as_double(candidates, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        V.norm_sq(vec_col).alias("nsq"),
    )
    qry = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        V.norm_sq(vec_col).alias("qnsq"),
    )
    joined = cand.join(F.broadcast(qry), F.col("vec_id") != F.col("query_id"))
    if use_pandas_udf:
        cos = V.cosine_pandas_udf()(F.col("v"), F.col("qv"))
    else:
        # norms precomputed per SIDE (n+m folds) — only the dot product
        # runs per PAIR; same dot/sqrt(a·a * b·b) evaluation order as
        # DuckDB's list_cosine_similarity, so rounded outputs agree.
        cos = V.dot("v", "qv") / F.sqrt(F.col("nsq") * F.col("qnsq"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        joined.withColumn("cos_sim", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos_sim", "rn")
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment (by cosine). ``n_assign > 1`` keeps
    the top-n centroids per vector (used for query-side probing)."""
    vec = _as_double(vectors, vec_col).select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    cen = _as_double(centroids, vec_col).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos").desc(), F.col("centroid_id"))
    return (
        vec.join(F.broadcast(cen), how="cross")
        .withColumn("cos", V.cosine("v", "cv"))
        .withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n_assign)
        .select(F.col("vid"), "centroid_id", "crn")
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the n_probe nearest centroid cells.

    At scale the candidate assignment is computed once and persisted
    partitioned by centroid_id (partition pruning makes each query read
    n_probe/|centroids| of the data); here it's inlined for clarity.
    """
    cand_cells = assign_to_centroids(candidates, centroids, id_col, vec_col, n_assign=1)
    query_cells = assign_to_centroids(queries, centroids, id_col, vec_col, n_assign=n_probe)

    cand = _as_double(candidates, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).join(cand_cells.withColumnRenamed("vid", "vec_id").drop("crn"), "vec_id")

    qry = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).join(
        F.broadcast(query_cells.withColumnRenamed("vid", "query_id").drop("crn")), "query_id"
    )

    joined = cand.join(
        F.broadcast(qry),
        (F.col("vec_id") != F.col("query_id"))
        & (cand["centroid_id"] == qry["centroid_id"]),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        joined.withColumn("cos_sim", V.cosine("v", "qv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos_sim", "rn")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_cols: tuple[str, ...] = ("label",),
    use_pandas_udf: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_1 < id_2) within groups.

    Grouped pairing bounds the quadratic blow-up; the ungrouped scale
    path goes through ivf/LSH blocking first."""
    if use_pandas_udf and group_cols:
        # Grouped-matmul path: one applyInPandas group per blocking key —
        # Arrow ships each vector ONCE (not once per pair) and a single
        # BLAS G·Gᵀ replaces |pairs| interpreted folds. Arithmetic is the
        # same dot/sqrt(a·a * b·b) as the JVM path (cross-checked in
        # tests). At 100 TB the blocking key is (label, LSH bucket) so no
        # single group exceeds executor memory.
        import numpy as np
        import pandas as pd

        v = _as_double(vectors, vec_col).select(
            F.col(id_col).alias("k"), *(F.col(c) for c in group_cols), F.col(vec_col).alias("v")
        )
        thr = float(threshold)

        def pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values("k")
            ids = pdf["k"].to_numpy()
            G = np.vstack(pdf["v"].to_numpy())
            nsq = np.einsum("ij,ij->i", G, G)
            C = (G @ G.T) / np.sqrt(np.outer(nsq, nsq))
            i, j = np.triu_indices(len(ids), k=1)
            keep = C[i, j] >= thr
            return pd.DataFrame(
                {"k1": ids[i[keep]], "k2": ids[j[keep]], "cos_sim": C[i[keep], j[keep]]}
            )

        return (
            v.groupBy(*group_cols)
            .applyInPandas(pairs, schema="k1 long, k2 long, cos_sim double")
            .select(
                F.col("k1").alias(f"{id_col}_1"), F.col("k2").alias(f"{id_col}_2"), "cos_sim"
            )
        )

    v = _as_double(vectors, vec_col).select(
        F.col(id_col).alias("k"),
        *(F.col(c) for c in group_cols),
        F.col(vec_col).alias("v"),
        V.norm_sq(vec_col).alias("nsq"),
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    for c in group_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "cos_sim",
            V.dot("a.v", "b.v") / F.sqrt(F.col("a.nsq") * F.col("b.nsq")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.k").alias(f"{id_col}_1"), F.col("b.k").alias(f"{id_col}_2"), "cos_sim")
    )
