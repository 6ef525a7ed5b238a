"""Q21–Q22 + LLM-data-pipeline extension queries.

Dedup / similarity / text analysis over the `documents` and
`embeddings` tables — the training-data-pipeline surface mandated by
BASELINE.json. Everything here is JVM-side column expressions unless a
pandas_udf is the point (the UDF-surface queries say so explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.functions import text as T
from cdc_example_spark.functions import vector as V
from cdc_example_spark.queries.registry import query
from cdc_example_spark.queries.util import dec2
from cdc_example_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Q21 — exact dedup stats per language.
# Scale: dedup key is a 256-bit content hash → groupBy shuffles hashes,
# not documents; at 100 TB the text column never moves.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT sha256(LOWER(TRIM(text)))) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT sha256(LOWER(TRIM(text)))) AS n_dup_docs,
       CAST(ROUND(CAST(AVG(LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1) AS DECIMAL(28,10)), 2) AS DECIMAL(18,2)) AS avg_words,
       CAST(ROUND(CAST(AVG(n_chars) AS DECIMAL(28,10)), 2) AS DECIMAL(18,2)) AS avg_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("q21_exact_dedup_stats", oracle=_Q21_ORACLE)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2-content-hash exact-dup accounting + word stats per lang."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.length(F.trim(F.col("text"))) - F.length(
        F.replace(F.trim(F.col("text")), F.lit(" "), F.lit(""))
    ) + 1
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(T.content_hash(F.col("text"))).alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct(T.content_hash(F.col("text")))).alias("n_dup_docs"),
            dec2(F.avg(n_words)).alias("avg_words"),
            dec2(F.avg("n_chars")).alias("avg_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Q22 — exact top-5 cosine neighbors of vec_id 0 (label-filtered).
# Scale: the single query vector broadcasts; candidates stream through a
# codegen'd cosine; TakeOrderedAndProject keeps 5 rows per partition.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
  FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       e.label,
       CAST(ROUND(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS DECIMAL(28,10)), 2) AS DECIMAL(18,2)) AS cos_sim
FROM embeddings e, q
WHERE e.label = q.qlabel AND e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 5
"""


@query("q22_cosine_top5", oracle=_Q22_ORACLE)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast query vector → JVM-side cosine → global top-5."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("label").alias("qlabel")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("label") == F.col("qlabel"))
        .select(
            "vec_id",
            "label",
            dec2(V.cosine(F.col("v"), F.col("qv"))).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q23 — exact dedup survivors: canonical keep-lowest-doc_id selection.
# The scalable "which rows survive" companion to Q21's counting.
# ---------------------------------------------------------------------------

_Q23_ORACLE = """
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY sha256(LOWER(TRIM(text)))
                            ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
ORDER BY doc_id
"""


@query("q23_dedup_survivors", oracle=_Q23_ORACLE)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per content hash."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(T.content_hash(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q24 — 3-word-shingle Jaccard near-dup pairs within a language.
# Exact set similarity via explode + self-join on shared shingles:
# |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|. Shingles (not unigrams)
# keep the inverted index sparse — per-token doc frequency is what the
# self-join quadratically amplifies, and 3-gram frequency stays low even
# on small-vocabulary corpora. This is the exact oracle the MinHash-LSH
# path (operators/dedup.py) approximates at scale.
# ---------------------------------------------------------------------------

_Q24_ORACLE = """
WITH ws AS (
  SELECT doc_id, lang, regexp_split_to_array(LOWER(TRIM(text)), '\\s+') AS w
  FROM documents
), tok AS (
  SELECT DISTINCT doc_id, lang,
         UNNEST(list_transform(range(GREATEST(len(w) - 2, 0)),
                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM ws
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
  FROM tok a JOIN tok b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.d1 AS doc_id_1, i.d2 AS doc_id_2,
       CAST(ROUND(CAST(CAST(i.common AS DOUBLE) / (s1.n + s2.n - i.common) AS DECIMAL(28,10)), 2) AS DECIMAL(18,2)) AS jaccard
FROM inter i
JOIN sizes s1 ON i.d1 = s1.doc_id
JOIN sizes s2 ON i.d2 = s2.doc_id
WHERE CAST(i.common AS DOUBLE) / (s1.n + s2.n - i.common) >= 0.8
ORDER BY doc_id_1, doc_id_2
"""

#: 3-word shingles of the (already split) word array `ws`; guarded CASE
#: because sequence(1, 0) would descend, not produce empty.
_SHINGLES = """
CASE WHEN size(ws) >= 3
     THEN transform(sequence(1, size(ws) - 2),
                    i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))
     ELSE array()
END
"""


@query("q24_jaccard_neardup_pairs", oracle=_Q24_ORACLE)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard ≥ 0.8 pairs (explode + shingle self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", "lang", T.words(F.lower(F.col("text"))).alias("ws"))
        .select("doc_id", "lang", F.explode(F.expr(_SHINGLES)).alias("s"))
        # 8-byte join/shuffle keys instead of ~30-byte strings; xxhash64
        # is engine-internal (never compared to the oracle), and a 64-bit
        # collision across a corpus' shingle set is ~1e-8 — irrelevant
        # next to the 2-decimal rounding of the output.
        .select("doc_id", "lang", F.xxhash64("s").alias("w"))
        .distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("s1.n") + F.col("s2.n") - F.col("common"))
    return (
        inter.join(sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id"))
        .filter(jac >= 0.8)
        .select(
            F.col("d1").alias("doc_id_1"),
            F.col("d2").alias("doc_id_2"),
            dec2(jac).alias("jaccard"),
        )
        .orderBy("doc_id_1", "doc_id_2")
    )
