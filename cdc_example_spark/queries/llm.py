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
from cdc_example_spark.queries.util import dec2, shuffled_order, small_result_order
from cdc_example_spark.sources.catalog import load_doc_tokens, load_table

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
       CAST(ROUND(CAST(AVG(LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_words,
       CAST(ROUND(CAST(AVG(n_chars) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_chars
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
        .transform(small_result_order, "lang")
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
       CAST(ROUND(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim
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
       CAST(ROUND(CAST(CAST(i.common AS DOUBLE) / (s1.n + s2.n - i.common) AS DECIMAL(28,10)), 2) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes s1 ON i.d1 = s1.doc_id
JOIN sizes s2 ON i.d2 = s2.doc_id
WHERE CAST(i.common AS DOUBLE) / (s1.n + s2.n - i.common) >= 0.8
ORDER BY doc_id_1, doc_id_2
"""

#: 3-word shingles of the (already split) word array `ws`; guarded CASE
#: because sequence(1, 0) would descend, not produce empty.
#:
#: NOTE (measured, sf0.1): building the deduped shingle-hash set as one
#: array expression (array_distinct ∘ transform ∘ element_at) instead of
#: explode → collect_set looks like it should drop a shuffle, but runs
#: 14× SLOWER (15–20 s vs ~1 s): InferFiltersFromGenerate derives a
#: `size(set) > 0` filter under the later explode, and predicate
#: pushdown INLINES the whole set expression into it — re-evaluating the
#: word-split per element_at reference, O(words²) per doc. The
#: explode → collect_set shape keeps every expensive alias behind a
#: Generate (which pushdown won't cross), and its extra shuffle is
#: 8-byte hashes — cheap. Excluding the optimizer rule fixes the array
#: form but is session-global; not worth it.
_SHINGLES = """
CASE WHEN size(ws) >= 3
     THEN transform(sequence(1, size(ws) - 2),
                    i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))
     ELSE array()
END
"""


@query("q24_jaccard_neardup_pairs", oracle=_Q24_ORACLE)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard ≥ 0.8 pairs (shared-scan self-join)."""
    # One pass builds each doc's deduped shingle-hash set AND its size;
    # the exploded rows carry n, so no post-hoc size lookups.
    #
    # Pair counting is a self-join of the exploded posting rows on
    # (shingle hash, lang) — but the two sides are the IDENTICAL
    # subplan, so ReuseExchange computes and shuffles the scan→shingle→
    # explode pipeline ONCE and both sides read the same shuffle files
    # (one corpus pass at 100 TB; pinned by tests/test_plan_audit.py).
    # The `merge` hint is load-bearing: with cached-table statistics the
    # planner would pick a broadcast join, which has no exchange to
    # reuse and re-executes the pipeline per side. Joined pairs stream
    # through a map-side partial count (the intersection size) with no
    # posting-list arrays materialized — measured ~1.0 s fresh at sf0.1
    # vs 1.3–2.3 s (with 9 s allocation-noise spikes) for collect_list +
    # in-bucket flatten pair generation.
    #
    # NULL langs can never pair in the oracle (its join needs
    # a.lang = b.lang); the join's equality keys preserve exactly that.
    # 8-byte xxhash64 keys instead of ~30-byte shingle strings; the hash
    # is engine-internal (never compared to the oracle), and a 64-bit
    # collision is ~1e-8 per corpus — irrelevant next to the 2-decimal
    # rounding of the output.
    sets = (
        load_doc_tokens(spark, sf_dir)
        .filter(F.col("lang").isNotNull())
        .select("doc_id", "lang", F.explode(F.expr(_SHINGLES)).alias("s"))
        .groupBy("doc_id", "lang")
        .agg(F.collect_set(F.xxhash64("s")).alias("set"))
    )
    tok = sets.select(
        "doc_id", "lang", F.size("set").alias("n"), F.explode("set").alias("w")
    )
    a, b = tok.alias("a").hint("merge"), tok.alias("b").hint("merge")
    inter = (
        a.join(
            b,
            [
                F.col("a.w") == F.col("b.w"),
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.n").alias("n1"),
            F.col("b.n").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        inter.filter(jac >= 0.8)
        .select(
            F.col("d1").alias("doc_id_1"),
            F.col("d2").alias("doc_id_2"),
            dec2(jac).alias("jaccard"),
        )
        # shuffled_order: the bare sort's range sampling re-ran the
        # jaccard intersection-agg stage (r14 A/B -454 ms; util.py note)
        .transform(shuffled_order, "doc_id_1", "doc_id_2")
    )


# ---------------------------------------------------------------------------
# q25 — document fingerprinting: rolling polynomial hash per doc.
# ---------------------------------------------------------------------------

_Q25_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(list_filter(string_split(LOWER(TRIM(text)), ''), c -> c <> ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp
FROM documents
ORDER BY doc_id
"""


@query("q25_rolling_fingerprints", oracle=_Q25_ORACLE)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document."""
    from cdc_example_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    # shuffled_order: range sampling re-ran the per-doc rolling-hash
    # char fold (the scan IS the expensive stage here; r14 -33 ms)
    return docs.select("doc_id", TA.fingerprint(F.col("text")).alias("fp")).transform(
        shuffled_order, "doc_id"
    )


# ---------------------------------------------------------------------------
# q26 — token counting: whitespace + BPE-ish regex pre-tokenizer.
# ---------------------------------------------------------------------------

_Q26_ORACLE = r"""
SELECT lang,
       CAST(SUM(len(regexp_split_to_array(TRIM(text), '\s+'))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
       CAST(ROUND(CAST(AVG(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_bpe_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("q26_token_counts", oracle=_Q26_ORACLE)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per language."""
    from cdc_example_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            TA.token_count_whitespace(F.col("text")).alias("ws"),
            TA.token_count_bpe(F.col("text")).alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            dec2(F.avg("bpe")).alias("avg_bpe_tokens"),
        )
        .transform(small_result_order, "lang")
    )


# ---------------------------------------------------------------------------
# q27 — language-ID heuristic: stopword-hit argmax, confusion counts.
# ---------------------------------------------------------------------------

_Q27_ORACLE = r"""
WITH t AS (
  -- COALESCE mirrors the operator: a NULL text tokenizes as '' and
  -- predicts 'und' on both engines (without it, NULL scores would fall
  -- through every CASE arm to 'zh' while Spark dropped the doc).
  SELECT lang, regexp_split_to_array(LOWER(TRIM(COALESCE(text, ''))), '\s+') AS ws FROM documents
), s AS (
  SELECT lang,
         len(list_filter(ws, w -> w IN ('the','and','of','to','is')))   AS s_en,
         len(list_filter(ws, w -> w IN ('le','la','et','les','des')))   AS s_fr,
         len(list_filter(ws, w -> w IN ('el','los','de','y','que')))    AS s_es,
         len(list_filter(ws, w -> w IN ('der','die','und','das','ist'))) AS s_de,
         len(list_filter(ws, w -> w IN ('de','shi','bu','le','zai')))   AS s_zh
  FROM t
), p AS (
  SELECT lang AS actual_lang,
         CASE WHEN GREATEST(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
              WHEN s_de = GREATEST(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
              WHEN s_en = GREATEST(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
              WHEN s_es = GREATEST(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
              WHEN s_fr = GREATEST(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
              ELSE 'zh' END AS predicted_lang
  FROM s
)
SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
FROM p
GROUP BY actual_lang, predicted_lang
ORDER BY actual_lang, predicted_lang
"""


@query("q27_lang_id_confusion", oracle=_Q27_ORACLE)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword language-ID vs labeled lang: confusion-matrix counts."""
    from cdc_example_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    return (
        TA.lang_id_table(docs, text_col="text", key_col="doc_id", extra_cols=("lang",))
        .select(F.col("lang").alias("actual_lang"), "predicted_lang")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .transform(small_result_order, "actual_lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# q28 — quality scoring: composite heuristic + per-source components.
# ---------------------------------------------------------------------------

_Q28_ORACLE = r"""
WITH f AS (
  SELECT source,
         LENGTH(TRIM(text)) AS n_chars,
         len(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS n_words,
         LENGTH(TRIM(text)) - LENGTH(regexp_replace(TRIM(text), '[.,!?;:]', '', 'g')) AS n_punct,
         len(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
                         w -> w IN ('the','and','of','to','is'))) AS n_stop,
         LENGTH(regexp_replace(TRIM(text), '\s+', '', 'g')) AS n_nonspace
  FROM documents
), g AS (
  SELECT source, n_chars, n_words,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END AS stopword_ratio,
         CASE WHEN n_words > 0 THEN CAST(n_nonspace AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len
  FROM f
), s AS (
  SELECT source, punct_ratio, stopword_ratio,
         (LEAST(n_words / 100.0, 1.0)
          + LEAST(stopword_ratio * 4, 1.0)
          + (CASE WHEN mean_word_len >= 2 AND mean_word_len <= 12 THEN 1.0 ELSE 0.3 END)
          + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.4 END)) / 4 AS score
  FROM g
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(ROUND(CAST(AVG(score) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_quality,
       CAST(ROUND(CAST(AVG(punct_ratio) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_punct_ratio,
       CAST(ROUND(CAST(AVG(stopword_ratio) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_stopword_ratio
FROM s
GROUP BY source
ORDER BY source
"""


@query("q28_quality_scores", oracle=_Q28_ORACLE)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic, aggregated per source."""
    from cdc_example_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    feats = TA.quality_features(F.col("text"))
    return (
        docs.select(
            "source",
            TA.quality_score(F.col("text")).alias("score"),
            feats["punct_ratio"].alias("punct_ratio"),
            feats["stopword_ratio"].alias("stopword_ratio"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec2(F.avg("score")).alias("avg_quality"),
            dec2(F.avg("punct_ratio")).alias("avg_punct_ratio"),
            dec2(F.avg("stopword_ratio")).alias("avg_stopword_ratio"),
        )
        .transform(small_result_order, "source")
    )


# ---------------------------------------------------------------------------
# q29 — SimHash sketches (32-bit) per document.
# ---------------------------------------------------------------------------

_WORD_FP_SQL = """list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                     c -> CAST(ascii(c) AS BIGINT))),
    (a, b) -> (a * 31 + b) % 1000000007)"""

_Q29_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_transform(regexp_split_to_array(LOWER(TRIM(text)), '\\s+'),
                                      w -> {_WORD_FP_SQL})) AS fps
  FROM documents
), b AS (
  SELECT doc_id, UNNEST(fps) AS f FROM t
), v AS (
  SELECT doc_id, bit,
         SUM((CAST(FLOOR(f / POWER(2, bit)) AS BIGINT) % 2) * 2 - 1) AS vote
  FROM b, (SELECT UNNEST(range(32)) AS bit) bits
  GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN CAST(POWER(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM v
GROUP BY doc_id
ORDER BY doc_id
"""


@query("q29_simhash", oracle=_Q29_ORACLE)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc (majority vote over token fingerprints)."""
    from cdc_example_spark.operators import dedup as D

    toks = load_doc_tokens(spark, sf_dir)
    # shuffled_order: range sampling re-ran the 32-vote agg + bit-fold
    # projection stage (r14 -321 ms; queries/util.py note)
    return D.simhash_table(toks, key_col="doc_id", tokens_col="ws").transform(
        shuffled_order, "doc_id"
    )


# ---------------------------------------------------------------------------
# q30 — brute-force cosine top-3 for a query set (similarity operator).
# ---------------------------------------------------------------------------

_Q30_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), j AS (
  SELECT q.query_id, c.vec_id, list_cosine_similarity(c.v, q.qv) AS cos
  FROM c, q WHERE c.vec_id <> q.query_id
), r AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
  FROM j
)
SELECT query_id, vec_id,
       CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim,
       rn
FROM r WHERE rn <= 3
ORDER BY query_id, rn
"""


@query("q30_cosine_topk_multi", oracle=_Q30_ORACLE)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 neighbors for each of 5 query vectors (JVM cosine)."""
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return out.select(
        "query_id", "vec_id", dec2(F.col("cos_sim")).alias("cos_sim"), "rn"
    ).transform(small_result_order, "query_id", "rn")


# ---------------------------------------------------------------------------
# q31 — embedding-cosine near-duplicate pairs (grouped by label).
# ---------------------------------------------------------------------------

_Q31_ORACLE = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       CAST(ROUND(CAST(list_cosine_similarity(a.v, b.v) AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim
FROM v a JOIN v b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35
ORDER BY vec_id_1, vec_id_2
"""


@query("q31_embedding_neardup_pairs", oracle=_Q31_ORACLE)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-label embedding pairs with cosine ≥ 0.35."""
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.embedding_neardup_pairs(emb, threshold=0.35)
    # shuffled_order: range sampling re-ran the pair stage (r14 -185 ms)
    return out.select(
        "vec_id_1", "vec_id_2", dec2(F.col("cos_sim")).alias("cos_sim")
    ).transform(shuffled_order, "vec_id_1", "vec_id_2")


# ---------------------------------------------------------------------------
# q32 — MinHash-LSH near-dup candidate pairs (bands=4 × rows=3) over the
# SAME 3-word-shingle measure q24 computes exactly (unigram MinHash
# saturates on reordered-copy corpora — operators/dedup.py docstring).
# The SQL oracle replays the exact signature/band arithmetic, so the
# approximation itself is deterministic and hash-checked.
# ---------------------------------------------------------------------------


def _sig_sql(i: int) -> str:
    a, b = 2 * i + 1, 97 * i + 13
    return (
        f"COALESCE(list_min(list_transform(fps, f -> ({a} * f + {b}) % 1000000007)),"
        " 1000000007)"
    )


def _band_sql(bnd: int, rows_per_band: int) -> str:
    key = "17"
    for r in range(rows_per_band):
        key = f"(({key} * 31 + s{bnd * rows_per_band + r}) % 1000000007)"
    return key


_Q32_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(LOWER(TRIM(text)), '\\s+'),
                        w -> {_WORD_FP_SQL}) AS wfps
  FROM documents
), t AS (
  SELECT doc_id, lang,
         list_distinct(CASE WHEN len(wfps) >= 3 THEN
           list_transform(range(len(wfps) - 2),
             i -> ((wfps[i+1] * 31 + wfps[i+2]) % 1000000007 * 31 + wfps[i+3]) % 1000000007)
           ELSE [] END) AS fps
  FROM ws
  WHERE len(wfps) >= 3
), sig AS (
  SELECT doc_id, lang,
         {", ".join(f"{_sig_sql(i)} AS s{i}" for i in range(12))}
  FROM t
), banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, lang, {b} AS band, {_band_sql(b, 3)} AS key FROM sig" for b in range(4))}
)
SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.lang = b.lang AND a.doc_id < b.doc_id
ORDER BY doc_id_1, doc_id_2
"""


@query("q32_minhash_lsh_candidates", oracle=_Q32_ORACLE)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (the scale path q24 verifies)."""
    from cdc_example_spark.operators import dedup as D

    # NULL langs can't pair in the oracle (a.lang = b.lang), but the
    # operator's groupBy-bucketing would pair them — filter for parity.
    toks = load_doc_tokens(spark, sf_dir).filter(F.col("lang").isNotNull())
    # shuffled_order: the bare sort's range sampling re-executed the
    # in-bucket pair-explosion stage (queries/util.py r14 note).
    return D.lsh_candidate_pairs(
        toks, num_hashes=12, bands=4, group_cols=("lang",), tokens_col="ws"
    ).transform(shuffled_order, "doc_id_1", "doc_id_2")


# ---------------------------------------------------------------------------
# q33 — multimodal metadata over binary payloads (JVM side).
# ---------------------------------------------------------------------------

_Q33_ORACLE = """
SELECT doc_id AS media_id,
       'text' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       substr(sha256(text), 1, 16) AS sha_prefix
FROM documents
ORDER BY media_id
"""


@query("q33_binary_media_meta", oracle=_Q33_ORACLE)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media wrapping: byte length + content digest."""
    from cdc_example_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.to_media(docs, id_col="doc_id", payload_col="text", media_type="text")
    return media.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.substring(F.sha2(F.col("payload"), 256), 1, 16).alias("sha_prefix"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# q34 — multimodal feature extraction via mapInPandas, hash-checked: the
# stub features are an L1-normalized byte histogram, so bucket COUNTS
# are exactly recoverable as round(features[i] · n_bytes) (float32
# relative error 6e-8 × counts ≤ 1e4 stays far below 0.5), and DuckDB
# replays the histogram byte-by-byte over hex(encode(text)). This pins
# the whole Arrow round trip — binary payload in, float vector out —
# not just the row count.
# ---------------------------------------------------------------------------

_Q34_ORACLE = """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n_bytes
  FROM documents
), b AS (
  SELECT doc_id,
         ((strpos('0123456789ABCDEF', substr(hx, i * 2 + 1, 1)) - 1) * 16
          + strpos('0123456789ABCDEF', substr(hx, i * 2 + 2, 1)) - 1) % 16 AS bucket
  FROM h, UNNEST(range(LENGTH(hx) // 2)) AS t(i)
), c AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bucket = 0  THEN 1 ELSE 0 END) AS BIGINT) AS b0,
         CAST(SUM(CASE WHEN bucket = 5  THEN 1 ELSE 0 END) AS BIGINT) AS b5,
         CAST(SUM(CASE WHEN bucket = 10 THEN 1 ELSE 0 END) AS BIGINT) AS b10,
         CAST(SUM(CASE WHEN bucket = 15 THEN 1 ELSE 0 END) AS BIGINT) AS b15
  FROM b GROUP BY doc_id
)
SELECT h.doc_id AS media_id, h.n_bytes, 16 AS dim,
       COALESCE(c.b0, 0) AS bucket0, COALESCE(c.b5, 0) AS bucket5,
       COALESCE(c.b10, 0) AS bucket10, COALESCE(c.b15, 0) AS bucket15
FROM h LEFT JOIN c ON h.doc_id = c.doc_id
ORDER BY media_id
"""


def _bucket_count(idx: int):
    # features is 0-indexed conceptually, element_at is 1-based
    return F.round(F.element_at("features", idx + 1).cast("double") * F.col("n_bytes")).cast(
        "bigint"
    )


@query("q34_multimodal_features", oracle=_Q34_ORACLE)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake decode→feature stage over binary payloads."""
    from cdc_example_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.to_media(docs, id_col="doc_id", payload_col="text", media_type="text")
    feats = M.extract_features_stub(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.size("features").alias("dim"),
        _bucket_count(0).alias("bucket0"),
        _bucket_count(5).alias("bucket5"),
        _bucket_count(10).alias("bucket10"),
        _bucket_count(15).alias("bucket15"),
        # shuffled_order: range sampling re-ran the mapInPandas feature
        # crossing — the whole Arrow round trip twice (r14 -165 ms)
    ).transform(shuffled_order, "media_id")


# ---------------------------------------------------------------------------
# q35 — pandas_udf cosine path: same task as q30, Arrow-batched NumPy
# kernel, SAME oracle — proves the UDF surface agrees with the JVM path.
# ---------------------------------------------------------------------------


@query("q35_pandas_cosine_topk", oracle=_Q30_ORACLE)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q30 via the vectorized pandas_udf kernel (UDF-surface contract)."""
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, use_pandas_udf=True)
    return out.select(
        "query_id", "vec_id", dec2(F.col("cos_sim")).alias("cos_sim"), "rn"
    ).transform(small_result_order, "query_id", "rn")


# ---------------------------------------------------------------------------
# q36 — IVF approximate top-k: the ANN scale path, hash-checked.
# Centroids are pinned deterministically (vec_id < 8) so the oracle can
# replay the exact cell assignment + probe arithmetic in SQL; at scale
# centroids come from an offline k-means and the candidate assignment is
# persisted partitioned by centroid_id (partition pruning does the rest).
# ---------------------------------------------------------------------------

_Q36_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cen AS (
  SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < 8
), ca AS (
  SELECT vec_id, centroid_id FROM (
    SELECT c.vec_id, cen.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY list_cosine_similarity(c.v, cen.cv) DESC, cen.centroid_id) AS crn
    FROM v c, cen) WHERE crn = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5
), qa AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, cen.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, cen.cv) DESC, cen.centroid_id) AS crn
    FROM q, cen) WHERE crn <= 2
), j AS (
  SELECT q.query_id, c.vec_id, list_cosine_similarity(c.v, q.qv) AS cos
  FROM v c
  JOIN ca ON c.vec_id = ca.vec_id
  JOIN qa ON ca.centroid_id = qa.centroid_id
  JOIN q ON q.query_id = qa.query_id
  WHERE c.vec_id <> q.query_id
), r AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
  FROM j
)
SELECT query_id, vec_id,
       CAST(ROUND(CAST(cos AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim,
       rn
FROM r WHERE rn <= 3
ORDER BY query_id, rn
"""


@query("q36_ivf_topk", oracle=_Q36_ORACLE)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 with n_probe=2 over deterministic centroids."""
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    out = S.ivf_topk(
        candidates=emb,
        queries=emb.filter(F.col("vec_id") < 5),
        centroids=emb.filter(F.col("vec_id") < 8),
        k=3,
        n_probe=2,
    )
    return out.select(
        "query_id", "vec_id", dec2(F.col("cos_sim")).alias("cos_sim"), "rn"
    ).transform(small_result_order, "query_id", "rn")


# ---------------------------------------------------------------------------
# q39 — the array-function family (SURVEY §2.2 "Array" row): size /
# element access (1-based and negative) / array_contains / split, all on
# the tokenized documents table. Spark's java-split and DuckDB's
# regexp_split_to_array agree on leading/trailing empties for trimmed
# input, so the fold is hash-checkable. Scale: pure per-row expressions
# inside whole-stage codegen + one 2-key partial agg — scan-bound.
# ---------------------------------------------------------------------------

_Q39_ORACLE = """
WITH t AS (
  SELECT lang, regexp_split_to_array(TRIM(text), '\\s+') AS ws FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_the,
       CAST(ROUND(CAST(AVG(len(ws)) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_words,
       COUNT(DISTINCT ws[1]) AS n_first_words,
       COUNT(DISTINCT ws[-1]) AS n_last_words
FROM t
GROUP BY lang
ORDER BY lang
"""


@query("q39_array_ops", oracle=_Q39_ORACLE)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/array_contains over whitespace-tokenized docs."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    return (
        docs.select(
            "lang",
            F.size(ws).alias("nw"),
            F.array_contains(ws, "the").cast("int").alias("has_the"),
            F.element_at(ws, 1).alias("first_w"),
            F.element_at(ws, -1).alias("last_w"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_the").alias("docs_with_the"),
            dec2(F.avg("nw")).alias("avg_words"),
            F.countDistinct("first_w").alias("n_first_words"),
            F.countDistinct("last_w").alias("n_last_words"),
        )
        .transform(small_result_order, "lang")
    )


# ---------------------------------------------------------------------------
# q47 — SimHash near-duplicate pairs via pigeonhole banding.
# The oracle computes the same sketches (q29's arithmetic) and
# brute-forces every same-lang pair — banding has recall 1.0 (distance
# ≤ h forces exact agreement on one of h+1 bands) and the hamming
# filter kills band collisions, so the banded pair-set must EQUAL the
# quadratic oracle's (asserted row-for-row at sf0.001 in pytest). The
# registered query hash-checks the pair-count histogram per Hamming
# distance: this synthetic corpus is template-generated and saturates
# the 32-bit sketch (~1.3M raw pairs at sf0.1), and shipping megarows
# of pair ids would bench Arrow transfer, not the operator.
# ---------------------------------------------------------------------------

_Q47_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(regexp_split_to_array(LOWER(TRIM(text)), '\\s+'),
                                      w -> {_WORD_FP_SQL})) AS fps
  FROM documents
), b AS (
  SELECT doc_id, lang, UNNEST(fps) AS f FROM t
), v AS (
  SELECT doc_id, lang, bit,
         SUM((CAST(FLOOR(f / POWER(2, bit)) AS BIGINT) % 2) * 2 - 1) AS vote
  FROM b, (SELECT UNNEST(range(32)) AS bit) bits
  GROUP BY doc_id, lang, bit
), sh AS (
  SELECT doc_id, lang,
         CAST(SUM(CASE WHEN vote > 0 THEN CAST(POWER(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM v
  GROUP BY doc_id, lang
), p AS (
  SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p
GROUP BY hamming
ORDER BY hamming
"""


@query("q47_simhash_near_pairs", oracle=_Q47_ORACLE)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pair histogram (Hamming ≤ 3, per lang)."""
    from cdc_example_spark.operators import dedup as D

    toks = load_doc_tokens(spark, sf_dir)
    pairs = D.simhash_near_pairs(
        toks, key_col="doc_id", max_hamming=3, group_cols=("lang",), tokens_col="ws"
    )
    return (
        pairs.groupBy(F.col("hamming").cast("long").alias("hamming"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .transform(small_result_order, "hamming")
    )


# ---------------------------------------------------------------------------
# q58 — dedup clusters: connected components of the shingle-overlap
# graph (docs sharing ≥ MIN_SHARED distinct 3-shingles within a lang),
# via min-label propagation unrolled a FIXED number of rounds — the
# same relational dataflow on both engines, so cluster ids are
# hash-checkable (a data-dependent fixpoint would not be). Convergence
# at this diameter is asserted in pytest against a union-find model.
# ---------------------------------------------------------------------------

_Q58_MIN_SHARED = 6
_Q58_ROUNDS = 6


def _cc_rounds_sql(rounds: int) -> str:
    # AS MATERIALIZED: each round references the previous one twice;
    # inlined CTEs would re-derive the edge pipeline 2^rounds times
    # (measured 383 s at sf0.1 vs ~1 s materialized). The Spark twin
    # materializes the edge list once for the same reason
    # (operators/graph.connected_components).
    ctes = []
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT l.v, LEAST(l.lbl, COALESCE(m.nm, l.lbl)) AS lbl
  FROM l{i-1} l LEFT JOIN (
    SELECT s.u, MIN(p.lbl) AS nm FROM sym s JOIN l{i-1} p ON s.w = p.v GROUP BY s.u
  ) m ON l.v = m.u
)"""
        )
    return ",\n".join(ctes)


_Q58_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, lang, regexp_split_to_array(LOWER(TRIM(text)), '\\s+') AS w
  FROM documents
), tok AS (
  SELECT DISTINCT doc_id, lang,
         UNNEST(list_transform(range(GREATEST(len(w) - 2, 0)),
                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM ws
), edges AS MATERIALIZED (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM tok a JOIN tok b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_Q58_MIN_SHARED}
), sym AS MATERIALIZED (
  SELECT d1 AS u, d2 AS w FROM edges UNION ALL SELECT d2, d1 FROM edges
), l0 AS MATERIALIZED (
  SELECT v, v AS lbl FROM (SELECT DISTINCT u AS v FROM sym)
),
{_cc_rounds_sql(_Q58_ROUNDS)}
SELECT lbl AS component_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(v) AS max_doc_id
FROM l{_Q58_ROUNDS}
GROUP BY lbl
ORDER BY component_id
"""


def _neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, component) membership of the ≥6-shared-shingle graph —
    q58's edge pipeline + CC loop, shared with q95's survivorship
    pass so both queries agree on cluster identity by construction."""
    from cdc_example_spark.operators.graph import connected_components

    tok = (
        load_doc_tokens(spark, sf_dir)
        .filter(F.col("lang").isNotNull())
        .select("doc_id", "lang", F.explode(F.expr(_SHINGLES)).alias("s"))
        .groupBy("doc_id", "lang")
        .agg(F.collect_set(F.xxhash64("s")).alias("set"))
        .select("doc_id", "lang", F.explode("set").alias("w"))
    )
    a, b = tok.alias("a").hint("merge"), tok.alias("b").hint("merge")
    edges = (
        a.join(
            b,
            [
                F.col("a.w") == F.col("b.w"),
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _Q58_MIN_SHARED)
        .select("d1", "d2")
    )
    # probe_round=3: the declared 6-round unroll carries 2-3x diameter
    # margin for near-clique dup graphs; one construction-time
    # convergence probe proves the remaining rounds are the identity
    # and halves the executed stage count (fresh 0.82 -> 0.36 s at
    # sf0.1, labels byte-equal; falls back to the full unroll if the
    # probe sees changes). See operators/graph.connected_components.
    return connected_components(
        edges, src="d1", dst="d2", rounds=_Q58_ROUNDS, probe_round=3
    )


@query("q58_dedup_components", oracle=_Q58_ORACLE)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: CC over the ≥6-shared-shingle graph.

    Edge generation is the q24 posting-list shape (in-bucket pairs from
    one corpus pass, 8-byte hashes, ReuseExchange-shared sides); the
    component loop is operators/graph.connected_components.
    """
    comp = _neardup_components(spark, sf_dir)
    return (
        comp.groupBy(F.col("component").alias("component_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("v").alias("max_doc_id"),
        )
        # shuffled_order: range sampling re-ran the last CC-round tail
        # (r14 -344 ms). q95 measured the same change NEGATIVE (-40 ms,
        # its pre-sort window+agg stage is cheap) and keeps bare orderBy.
        .transform(shuffled_order, "component_id")
    )


# ---------------------------------------------------------------------------
# q95 — survivorship dedup: the step AFTER clustering that an actual
# curation pipeline ships. q58 names the near-dup clusters; q95 picks
# each cluster's canonical document (keep the longest, n_chars DESC
# with doc_id ASC as the total tie-break — a deterministic
# survivorship rule, the "keep best quality" policy with length as
# the quality stand-in) and reports what the dedup retires. Cluster
# membership is the SAME _neardup_components dataflow as q58, so the
# two queries can never disagree on cluster identity; the
# survivorship pick is one row_number() window over (component) —
# at 100 TB that window shuffles only the cluster MEMBER rows (ids +
# one int), never documents, and cluster sizes are bounded by the
# edge threshold, so no partition skews. Oracle: q58's unrolled-CTE
# label propagation extended with the identical window pick.
# ---------------------------------------------------------------------------

_Q95_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, lang, regexp_split_to_array(LOWER(TRIM(text)), '\\s+') AS w
  FROM documents
), tok AS (
  SELECT DISTINCT doc_id, lang,
         UNNEST(list_transform(range(GREATEST(len(w) - 2, 0)),
                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM ws
), edges AS MATERIALIZED (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM tok a JOIN tok b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_Q58_MIN_SHARED}
), sym AS MATERIALIZED (
  SELECT d1 AS u, d2 AS w FROM edges UNION ALL SELECT d2, d1 FROM edges
), l0 AS MATERIALIZED (
  SELECT v, v AS lbl FROM (SELECT DISTINCT u AS v FROM sym)
),
{_cc_rounds_sql(_Q58_ROUNDS)},
members AS (
  SELECT m.lbl AS component_id, m.v AS doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY m.lbl
                            ORDER BY d.n_chars DESC, m.v) AS rn
  FROM l{_Q58_ROUNDS} m JOIN documents d ON d.doc_id = m.v
)
SELECT component_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc_id,
       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS canonical_chars,
       CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_retired
FROM members
GROUP BY component_id
ORDER BY component_id
"""


@query("q95_canonical_dedup", oracle=_Q95_ORACLE)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster canonical pick + retirement stats over the q58
    near-dup components."""
    comp = _neardup_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    members = comp.join(docs, comp.v == docs.doc_id).select(
        F.col("component").alias("component_id"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = members.select(
        "component_id", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "canonical_doc_id"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("long")
            .alias("canonical_chars"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_retired"),
        )
        .orderBy("component_id")
    )


# ---------------------------------------------------------------------------
# q62 — trained-IVF recall audit: the self-serve ANN path. Centroids
# come from the deterministic sampled spherical k-means trainer
# (operators/similarity.train_ivf_centroids) instead of q36's pinned
# rows; the query reports, per probe vector, how much of the exact
# cosine top-k the trained index recovers at n_probe=2.
#
# Oracle (r4, VERDICT r3 item 3): k-means TRAINING is iterative and not
# SQL-expressible — but it is deterministic, and the driver's check runs
# at exactly sf0.01 on fixed parquet, so the trained centroids for that
# tier are a CONSTANT. With the centroids pinned as literals
# (queries/q62_centroids_sf001.py, regenerated by
# scripts/gen_q62_oracle_centroids.py, drift-checked in
# tests/test_llm_operators.py), everything downstream — argmax-dot cell
# assignment with the (dot desc, cid asc) tie-break, n_probe=2 probe
# sets, the one window yielding exact and IVF-visible ranks, recall@3 —
# is plain window SQL DuckDB replays. The trainer's quality and
# determinism stay pinned in pytest
# (test_train_ivf_centroids_beats_arbitrary_and_is_deterministic).
# ---------------------------------------------------------------------------


#: (session → sf_dir → trained centroids). One k-means job per
#: (session, sf_dir), shared by every trained-centroid consumer (q62's
#: recall audit, q66's SemDeDup, q70's persisted index) — VERDICT r4
#: item 4: q66 used to retrain its 8 centroids on EVERY invocation.
#: The trainer is deterministic (pinned in pytest), so memoization
#: cannot change any result hash. Keyed like q64's bucketed-table memo.
_TRAINED_CENTROIDS: "dict[SparkSession, dict[str, list[list[float]]]]" = {}

#: count of actual trainer invocations — pinned by
#: tests/test_llm_operators.py so a refactor can't silently reintroduce
#: per-invocation retraining.
_TRAINER_RUNS = [0]


def trained_centroids(spark: SparkSession, sf_dir: str) -> "list[list[float]]":
    import os as _os

    from cdc_example_spark.operators import similarity as S

    per_session = _TRAINED_CENTROIDS.setdefault(spark, {})
    key = _os.path.normpath(sf_dir)
    if key not in per_session:
        import time as _time

        from cdc_example_spark.queries.registry import record_session_build

        emb = load_table(spark, sf_dir, "embeddings")
        _TRAINER_RUNS[0] += 1
        t0 = _time.perf_counter()
        # Corpus-sized k (VERDICT r5 item 2): cells stay
        # ~TARGET_CELL_SIZE vectors as the corpus grows, so SemDeDup's
        # within-cell pairwise and IVF's per-cell scans stay bounded.
        # The clamp floor keeps the driver's sf0.001/sf0.01 tiers (500
        # vectors) at exactly k=8, so the pinned centroid-literal
        # oracles (q62_centroids_sf001.py) remain byte-valid there; the
        # count() runs on the cached table handle (one partial-agg).
        k = S.n_centroids_for(emb.count())
        per_session[key] = S.train_ivf_centroids_local(
            emb, n_centroids=k, sample_size=max(512, 4 * k), n_iters=10
        )
        record_session_build("kmeans_training", _time.perf_counter() - t0)
    return per_session[key]


def _pinned_centroid_values_sql() -> str:
    """The sf0.01 trained centroids as a DuckDB VALUES list — shared by
    every oracle that replays the trained-cell assignment (q62, q66)."""
    from cdc_example_spark.queries.q62_centroids_sf001 import CENTROIDS_SF001

    return ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(j, ", ".join(repr(x) for x in c))
        for j, c in enumerate(CENTROIDS_SF001)
    )


def _q62_oracle() -> str:
    cen_values = _pinned_centroid_values_sql()
    # list_inner_product mirrors the Spark side's unit-norm-centroid dot
    # (centroid_cells_expr); cosine ordering == dot ordering only up to
    # the |c| ≈ 1 float wobble, so BOTH engines must rank cells by the
    # raw dot. cos_sim then uses list_cosine_similarity = V.cosine.
    return f"""
WITH cen(cid, cv) AS (
  VALUES
        {cen_values}
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cells AS (
  SELECT vec_id, v, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY list_inner_product(v, cv) DESC, cid) AS crn
  FROM v CROSS JOIN cen
), cand AS (
  SELECT vec_id, v, cid AS cell FROM cells WHERE crn = 1
), probes AS (
  SELECT vec_id AS query_id, ANY_VALUE(v) AS qv,
         list(cid ORDER BY crn) AS probe_cells
  FROM cells WHERE vec_id < 10 AND crn <= 2 GROUP BY vec_id
), scored AS (
  SELECT p.query_id, c.vec_id,
         list_cosine_similarity(c.v, p.qv) AS cos_sim,
         list_contains(p.probe_cells, c.cell) AS in_probe
  FROM cand c JOIN probes p ON c.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, in_probe,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn_all,
         SUM(CASE WHEN in_probe THEN 1 ELSE 0 END)
             OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
                   ROWS UNBOUNDED PRECEDING) AS probed_rank
  FROM scored
)
SELECT query_id,
       CAST(COUNT(CASE WHEN rn_all <= 3 THEN 1 END) AS BIGINT) AS n_exact,
       CAST(COUNT(CASE WHEN rn_all <= 3 AND in_probe AND probed_rank <= 3 THEN 1 END) AS BIGINT) AS n_hit,
       CAST(ROUND(CAST(
           CAST(COUNT(CASE WHEN rn_all <= 3 AND in_probe AND probed_rank <= 3 THEN 1 END) AS DOUBLE)
           / COUNT(CASE WHEN rn_all <= 3 THEN 1 END)
       AS DECIMAL(28,10)), 2) AS DOUBLE) AS recall
FROM ranked GROUP BY query_id ORDER BY query_id
"""


@query("q62_ivf_trained_topk", oracle=_q62_oracle(), oracle_sf="sf0.01")
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of IVF over trained k-means centroids vs exact top-3.

    Single-pass form: instead of running ivf_topk and cosine_topk as two
    separate corpus scans and semi-joining their top-k sets (round-2
    shape, ~10 stages, 0.86 s median at sf0.1), ONE scan assigns every
    vector its centroid cell via inlined literals
    (similarity.centroid_cells_expr — same tie-break as
    assign_to_centroids), broadcasts the 10 probes with their n_probe=2
    cells, and ONE window (partitioned by query, ordered cos desc,
    vec_id) yields both ranks: ``rn_all`` (exact rank over all
    candidates) and ``probed_rank`` (running count of in-probe rows =
    rank within the IVF-visible subset). exact top-3 = rn_all ≤ 3; an
    exact hit is IVF-recovered iff it is in-probe with probed_rank ≤ 3
    — identical semantics, one shuffle, 4 stages (~0.3 s). At 100 TB
    the audit is one corpus pass instead of three.
    """
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    C = trained_centroids(spark, sf_dir)
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("cs", S.centroid_cells_expr(C, "v"))
    cand = base.select(
        "vec_id", "v", F.element_at("cs", 1)["cid"].alias("cell")
    )
    probes = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.transform(F.slice("cs", 1, 2), lambda s: s["cid"]).alias("probe_cells"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    scored = (
        cand.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", V.cosine("v", "qv"))
        .withColumn("in_probe", F.array_contains("probe_cells", F.col("cell")))
        .withColumn("rn_all", F.row_number().over(w))
        .withColumn(
            "probed_rank",
            F.sum(F.when(F.col("in_probe"), 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.count(F.when(F.col("rn_all") <= 3, 1)).alias("n_exact"),
            F.count(
                F.when(
                    (F.col("rn_all") <= 3)
                    & F.col("in_probe")
                    & (F.col("probed_rank") <= 3),
                    1,
                )
            ).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            dec2(F.col("n_hit") / F.col("n_exact")).alias("recall"),
        )
        .transform(small_result_order, "query_id")
    )


# ---------------------------------------------------------------------------
# q66 — semantic dedup (SemDeDup shape): within each trained-centroid
# cell, an embedding is DROPPED when a lower-id same-cell embedding is
# cosine-similar above the threshold — the "keep one representative per
# semantic neighborhood" pass (Abbas et al. 2023 run this exact
# cluster-then-pairwise recipe on LAION/C4). Composition showcase: the
# q62 trainer's centroids compile into the scan (centroid_cells_expr),
# the within-cell self-join is the only pairwise work, and the keep/drop
# verdict is a left anti-join.
# Scale: within-cell pairing is quadratic IN THE CELL — that is
# inherent to SemDeDup, and the published mitigation is the one this
# engine already owns AND ENFORCES IN CODE (VERDICT r5 item 2):
# trained_centroids sizes k = n_centroids_for(corpus count) ≈
# N/TARGET_CELL_SIZE, so cells stay ~constant-size as the corpus grows
# (pinned in test_n_centroids_scales_with_corpus_and_cells_stay_bounded),
# cells shuffle-partition independently, and the pair filter is a cheap
# codegen cosine. The oracle replays the pinned
# sf0.01 centroids (same contract as q62, sf-scoped).
# ---------------------------------------------------------------------------

_Q66_THRESHOLD = 0.35  # measured on sf0.01: drops 88/500 (0.3→205, 0.4→17)


def _q66_oracle() -> str:
    cen_values = _pinned_centroid_values_sql()
    return f"""
WITH cen(cid, cv) AS (
  VALUES
        {cen_values}
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cells AS (
  SELECT vec_id, v, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY list_inner_product(v, cv) DESC, cid) AS crn
  FROM v CROSS JOIN cen
), cand AS (
  SELECT vec_id, v, cid AS cell FROM cells WHERE crn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cand a JOIN cand b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {_Q66_THRESHOLD}
)
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept,
       CAST(ROUND(CAST(CAST(COUNT(d.vec_id) AS DOUBLE) / COUNT(*) AS DECIMAL(28,10)), 2) AS DOUBLE) AS drop_rate
FROM cand c LEFT JOIN dropped d ON c.vec_id = d.vec_id
GROUP BY c.cell ORDER BY c.cell
"""


@query("q66_semantic_dedup", oracle=_q66_oracle(), oracle_sf="sf0.01")
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell SemDeDup audit: kept/dropped counts at cos ≥ 0.35."""
    from cdc_example_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    # session-memoized (VERDICT r4 item 4): no k-means job after the
    # first trained-centroid consumer of this (session, sf_dir).
    C = trained_centroids(spark, sf_dir)
    base = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("cell", F.element_at(S.centroid_cells_expr(C, "v"), 1)["cid"])
        .withColumn("nsq", V.norm_sq("v"))
    )
    a, b = base.alias("a"), base.alias("b")
    # norms precomputed per SIDE (cosine_topk's trick): only the dot
    # runs per pair, and dot/sqrt(nsq_a·nsq_b) evaluates the identical
    # doubles as the per-pair cosine / DuckDB's list_cosine_similarity
    # (same sequential folds, same sqrt(x*y)) — measured 1.07 → 0.75 s
    # at sf0.1 with the hash unchanged.
    cos = V.dot(F.col("a.v"), F.col("b.v")) / F.sqrt(F.col("a.nsq") * F.col("b.nsq"))
    dropped = (
        a.join(
            b,
            [F.col("a.cell") == F.col("b.cell"), F.col("a.vec_id") < F.col("b.vec_id")],
        )
        .filter(cos >= _Q66_THRESHOLD)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    flagged = base.join(
        dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left"
    )
    return (
        flagged.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("is_dup").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("is_dup")).alias("n_kept"),
            dec2(F.count("is_dup") / F.count(F.lit(1))).alias("drop_rate"),
        )
        .transform(small_result_order, "cell")
    )


# ---------------------------------------------------------------------------
# q67 — sequence packing (greedy concat-and-chunk): the step that turns
# curated documents into fixed-length training sequences. Documents are
# concatenated in doc_id order within each language stream and cut into
# 512-token chunks; each document lands in the chunk where it STARTS,
# and a boundary-crosser count quantifies packing loss (the tokens a
# naive concat-chunk splits across sequences). Pure window-cumsum
# arithmetic on exact integer token counts — fully oracle-replayable.
# Scale: ONE cumulative window per language stream, never a global
# sort — streams pack independently (at 100 TB the partition key is
# (lang, shard) and chunk ids offset per shard; a single global cumsum
# would serialize the corpus through one task).
# ---------------------------------------------------------------------------

_Q67_SEQ_LEN = 512

_Q67_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tok
  FROM documents WHERE lang IS NOT NULL
), packed AS (
  SELECT lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
  FROM t
)
SELECT lang,
       CAST(FLOOR(cum_before / {_Q67_SEQ_LEN}) AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(COUNT(CASE WHEN FLOOR(cum_before / {_Q67_SEQ_LEN})
                        <> FLOOR((cum_before + n_tok - 1) / {_Q67_SEQ_LEN})
                  THEN 1 END) AS BIGINT) AS n_boundary_crossers
FROM packed
GROUP BY lang, chunk_id
ORDER BY lang, chunk_id
"""


@query("q67_sequence_packing", oracle=_Q67_ORACLE)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concat-and-chunk packing stats per (lang, 512-token chunk)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = docs.select("doc_id", "lang", T.word_count(F.col("text")).cast("long").alias("n_tok"))
    packed = t.withColumn("cum_before", F.sum("n_tok").over(w) - F.col("n_tok"))
    chunk = F.floor(F.col("cum_before") / _Q67_SEQ_LEN)
    end_chunk = F.floor((F.col("cum_before") + F.col("n_tok") - 1) / _Q67_SEQ_LEN)
    return (
        packed.groupBy("lang", chunk.cast("long").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.count(F.when(chunk != end_chunk, 1)).alias("n_boundary_crossers"),
        )
        .orderBy("lang", "chunk_id")
    )


# ---------------------------------------------------------------------------
# q68 — JSON schema profiling over semi-structured event payloads: the
# schema-drift monitor every event-ingest pipeline runs. `props` parses
# as a transient MAP (from_json map<string,string>), the map explodes
# to (key, value) rows, and per (event_type, key) the profile reports
# presence counts, exact value cardinality, and numeric stats (NULL for
# non-numeric values — F.try_cast semantics via cast). This upgrades
# the SURVEY's "MAP-typed columns: out of scope" line: MAP as a STORED
# column stays out (absent from reference + testdata), but the map
# TRANSIENT type + explode surface is exercised and oracle-checked
# here. The driver fixture happens to carry a single key ('k'); the
# operator is key-generic — json_keys on the DuckDB side discovers
# whatever keys exist.
# Scale: one scan; per-row JSON parse inside codegen; the profile agg
# shuffles (type, key) partials only. Keys with huge value cardinality
# bound the distinct-count state — the 100 TB variant swaps
# countDistinct for approx_count_distinct exactly as q14 → q38.
# ---------------------------------------------------------------------------

_Q68_ORACLE = """
WITH kv AS (
  SELECT event_type, unnest(json_keys(props)) AS key, props FROM events
), v AS (
  SELECT event_type, key,
         json_extract_string(props, '$.' || key) AS val
  FROM kv
)
SELECT event_type,
       key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct_vals,
       CAST(ROUND(CAST(MIN(TRY_CAST(val AS DOUBLE)) AS DECIMAL(28,10)), 2) AS DOUBLE) AS min_num,
       CAST(ROUND(CAST(MAX(TRY_CAST(val AS DOUBLE)) AS DECIMAL(28,10)), 2) AS DOUBLE) AS max_num,
       CAST(ROUND(CAST(AVG(TRY_CAST(val AS DOUBLE)) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_num
FROM v
GROUP BY event_type, key
ORDER BY event_type, key
"""


@query("q68_json_schema_profile", oracle=_Q68_ORACLE)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, key) profile of the JSON props payload."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val"),
    )
    num = F.try_cast("val", "double") if hasattr(F, "try_cast") else F.col("val").cast("double")
    return (
        kv.groupBy("event_type", "key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("val").alias("n_distinct_vals"),
            dec2(F.min(num)).alias("min_num"),
            dec2(F.max(num)).alias("max_num"),
            dec2(F.avg(num)).alias("avg_num"),
        )
        .transform(small_result_order, "event_type", "key")
    )


# ---------------------------------------------------------------------------
# q70 — PERSISTED-IVF serving (VERDICT r4 item 3): the 100 TB ANN path,
# driver-checked. q36/q62 serve from an in-memory corpus scan; this is
# the deployment shape — build_ivf_index writes the corpus partitioned
# by trained cell ONCE per (session, sf_dir) (the offline-build
# cadence; q64's bucketed-lake memo pattern), and serving reads ONLY
# the probed cell=<cid> directories (PartitionFilters, pinned in
# tests/test_plan_audit.py). The serving collect is bounded by
# |probes|·n_probe — the request itself, never corpus data.
# Oracle: the same pinned sf0.01 trained centroids as q62 (the trainer
# is deterministic and shared via trained_centroids), then plain
# window SQL — assign cells, probe 2 cells per query, exact cosine
# top-3 within the probed subset.
# ---------------------------------------------------------------------------

_Q70_INDEXES: "dict[SparkSession, dict[str, str]]" = {}


def _q70_index(spark: SparkSession, sf_dir: str) -> str:
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from cdc_example_spark.operators import similarity as S

    per_session = _Q70_INDEXES.setdefault(spark, {})
    key = _os.path.normpath(sf_dir)
    if key not in per_session:
        import time as _time

        from cdc_example_spark.queries.registry import record_session_build

        tag = _hashlib.sha1(key.encode()).hexdigest()[:8]
        path = _os.path.join(_tempfile.mkdtemp(prefix=f"cdc_ivf_{tag}_"), "index")
        C = trained_centroids(spark, sf_dir)
        t0 = _time.perf_counter()
        S.build_ivf_index(
            load_table(spark, sf_dir, "embeddings"),
            C,
            path,
            id_col="vec_id",
            vec_col="embedding",
        )
        record_session_build("ivf_index_build", _time.perf_counter() - t0)
        per_session[key] = path
    return per_session[key]


def _q70_oracle() -> str:
    cen_values = _pinned_centroid_values_sql()
    return f"""
WITH cen(cid, cv) AS (
  VALUES
        {cen_values}
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cells AS (
  SELECT vec_id, v, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY list_inner_product(v, cv) DESC, cid) AS crn
  FROM v CROSS JOIN cen
), cand AS (
  SELECT vec_id, v, cid AS cell FROM cells WHERE crn = 1
), probes AS (
  SELECT vec_id AS query_id, ANY_VALUE(v) AS qv,
         list(cid ORDER BY crn) AS probe_cells
  FROM cells WHERE vec_id < 10 AND crn <= 2 GROUP BY vec_id
), scored AS (
  SELECT p.query_id, c.vec_id,
         list_cosine_similarity(c.v, p.qv) AS cos_sim
  FROM cand c JOIN probes p
    ON c.vec_id <> p.query_id AND list_contains(p.probe_cells, c.cell)
)
SELECT query_id, vec_id,
       CAST(ROUND(CAST(cos_sim AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim,
       rn
FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 3
ORDER BY query_id, rn
"""


@query("q70_ivf_persisted_serving", oracle=_q70_oracle(), oracle_sf="sf0.01")
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 at n_probe=2 served from the PERSISTED cell-partitioned index."""
    from cdc_example_spark.operators import similarity as S

    path = _q70_index(spark, sf_dir)
    probes = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    out = S.ivf_topk_indexed(
        spark,
        path,
        probes,
        trained_centroids(spark, sf_dir),
        k=3,
        n_probe=2,
    )
    return out.select(
        "query_id", "vec_id", dec2(F.col("cos_sim")).alias("cos_sim"), "rn"
    ).transform(small_result_order, "query_id", "rn")


# ---------------------------------------------------------------------------
# q75 — the curation funnel, end to end in ONE pass: every stage of the
# training-data pipeline this engine exists for (exact dedup → quality
# gate → benchmark decontamination), composed over the same per-doc
# flags and counted with conditional aggregates. The r4/r5 operator
# suite provides each stage (q21/q23 content-hash dedup, q28 quality
# score, q55 contamination); this query is the composition proof — one
# documents scan + the dedup window + the (tiny) contamination
# anti-side, no per-stage re-execution. Scale: flags are per-row
# expressions; the only wide ops are the content-hash window (the
# dedup shuffle q23 already pays) and the broadcast-sized contaminated
# id set.
# ---------------------------------------------------------------------------

_Q75_ORACLE = r"""
WITH h AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY sha256(LOWER(TRIM(text)))
                            ORDER BY doc_id) AS rn
  FROM documents
), f AS (
  SELECT doc_id, rn,
         LENGTH(TRIM(text)) AS n_chars,
         len(regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS n_words,
         LENGTH(TRIM(text)) - LENGTH(regexp_replace(TRIM(text), '[.,!?;:]', '', 'g')) AS n_punct,
         len(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
                         w -> w IN ('the','and','of','to','is'))) AS n_stop,
         LENGTH(regexp_replace(TRIM(text), '\s+', '', 'g')) AS n_nonspace
  FROM h
), q AS (
  SELECT doc_id, rn,
         (LEAST(n_words / 100.0, 1.0)
          + LEAST((CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END) * 4, 1.0)
          + (CASE WHEN n_words > 0
                   AND CAST(n_nonspace AS DOUBLE) / n_words >= 2
                   AND CAST(n_nonspace AS DOUBLE) / n_words <= 12
                  THEN 1.0 ELSE 0.3 END)
          + (CASE WHEN (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) <= 0.2
                  THEN 1.0 ELSE 0.4 END)) / 4 AS score
  FROM f
), ws AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(GREATEST(len(w) - 2, 0)),
                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM ws
), bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id < 10
), csz AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh WHERE doc_id >= 10 GROUP BY doc_id
), cshared AS (
  SELECT c.doc_id, COUNT(*) AS n_shared
  FROM (SELECT doc_id, s FROM sh WHERE doc_id >= 10) c
  JOIN bench b USING (s)
  GROUP BY c.doc_id
)
, contaminated AS (
  SELECT csz.doc_id
  FROM csz JOIN cshared USING (doc_id)
  WHERE CAST(n_shared AS DOUBLE) / n_sh >= 0.5
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_exact_dedup,
       CAST(COUNT(CASE WHEN rn = 1 AND score >= 0.5 THEN 1 END) AS BIGINT) AS n_quality,
       CAST(COUNT(CASE WHEN rn = 1 AND score >= 0.5 AND q.doc_id >= 10
                        AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
                  THEN 1 END) AS BIGINT) AS n_decontaminated
FROM q
"""


@query("q75_curation_funnel", oracle=_Q75_ORACLE)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage survivor counts: all → exact-dedup → quality ≥ 0.5 →
    decontaminated corpus (benchmark = doc_id < 10)."""
    from cdc_example_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    toks = load_doc_tokens(spark, sf_dir)
    w = Window.partitionBy(T.content_hash(F.col("text"))).orderBy("doc_id")
    flagged = docs.select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        TA.quality_score(F.col("text")).alias("score"),
    )
    contaminated = (
        TA.contamination_overlap(toks, bench_max_id=10, tokens_col="ws")
        .filter(F.col("overlap_frac") >= 0.5)
        .select("doc_id", F.lit(True).alias("is_cont"))
    )
    keep = F.col("rn") == 1
    return (
        flagged.join(F.broadcast(contaminated), "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.when(keep, 1)).alias("n_exact_dedup"),
            F.count(F.when(keep & (F.col("score") >= 0.5), 1)).alias("n_quality"),
            F.count(
                F.when(
                    keep
                    & (F.col("score") >= 0.5)
                    & (F.col("doc_id") >= 10)
                    & F.col("is_cont").isNull(),
                    1,
                )
            ).alias("n_decontaminated"),
        )
    )


# ---------------------------------------------------------------------------
# q76 — fasttext-style hashed linear scorer: bigram tokens hash into 64
# feature buckets (the q25/q29 polynomial fold, replayable in SQL on
# any engine), deterministic per-bucket weights are pure integer
# arithmetic of the bucket id (a stand-in for trained model weights —
# the SHAPE is the product: hash → bucket → weight lookup → mean), and
# a document's score is the sequential-fold mean of its bigram weights.
# All arithmetic is exact-integer or order-pinned double, so the score
# hash-checks cross-engine. Scale: per-row array expressions in
# codegen, one (lang) partial agg — no shuffle carries anything
# document-sized; a real model swaps the weight expression for a
# broadcast 2^k-row weight table.
# ---------------------------------------------------------------------------

_Q76_WFP = """list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                     c -> CAST(ascii(c) AS BIGINT))),
    (a, b) -> (a * 31 + b) % 1000000007)"""

_Q76_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'),
                        w -> {_Q76_WFP}) AS fps
  FROM documents WHERE lang IS NOT NULL
), b AS (
  SELECT doc_id, lang,
         list_transform(range(GREATEST(len(fps) - 1, 0)),
                        i -> ((fps[i+1] * 31 + fps[i+2]) % 1000000007) % 64) AS buckets
  FROM t
), s AS (
  SELECT doc_id, lang, len(buckets) AS n_bigrams,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(buckets,
                                    bk -> CAST((bk * 2654435761) % 1024 AS DOUBLE) / 1024.0 - 0.5)),
                     (a, x) -> a + x) AS wsum
  FROM b WHERE len(buckets) > 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ROUND(CAST(AVG(wsum / n_bigrams) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_score,
       CAST(COUNT(CASE WHEN wsum / n_bigrams > 0 THEN 1 END) AS BIGINT) AS n_pass
FROM s GROUP BY lang ORDER BY lang
"""


@query("q76_hashed_linear_score", oracle=_Q76_ORACLE)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean hashed-bigram feature weight per doc, aggregated per lang."""
    toks = load_doc_tokens(spark, sf_dir).filter(F.col("lang").isNotNull())
    fps = F.transform("ws", lambda w: T.word_fingerprint(w))
    n = F.size("fps")
    buckets = F.zip_with(
        F.slice("fps", 1, F.greatest(n - 1, F.lit(0))),
        F.expr("slice(fps, 2, greatest(size(fps) - 1, 0))"),
        lambda x, y: ((x * 31 + y) % 1000000007) % 64,
    )
    weights = F.transform(
        "buckets",
        lambda bk: (bk * F.lit(2654435761)) % 1024 / F.lit(1024.0) - 0.5,
    )
    wsum = F.aggregate("weights", F.lit(0.0), lambda a, x: a + x)
    score = F.col("wsum") / F.col("n_bigrams")
    return (
        toks.withColumn("fps", fps)
        .withColumn("buckets", buckets)
        .filter(F.size("buckets") > 0)
        .withColumn("weights", weights)
        .select(
            "lang",
            F.size("buckets").alias("n_bigrams"),
            wsum.alias("wsum"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dec2(F.avg(score)).alias("avg_score"),
            F.count(F.when(score > 0, 1)).alias("n_pass"),
        )
        .transform(small_result_order, "lang")
    )


# ---------------------------------------------------------------------------
# q102 — TWO-LEVEL (coarse-quantizer) persisted-IVF serving: the scale
# path past the flat index's ~4096-cell ceiling (n_centroids_for names
# it; operators/similarity.py implements it). The session builds the
# coarse=X/fine=Y lake layout ONCE per (session, sf_dir) with the BLAS
# two-level assignment kernel (the measured 100 TB build shape), and
# serving probes the top-2 coarse cells × top-2 fine cells per query —
# a read that prunes MULTIPLICATIVELY (4 of k1·k2 directories) via
# two-level partition pruning. Shape policy is corpus-sized
# (ivf2_shape_for: ~sqrt(N/cell_size) per level), so per-cell scans
# stay bounded to ~TARGET_CELL_SIZE vectors at any corpus.
# Oracle: the two-level trainer is iterative but deterministic and
# sf-scoped, so the sf0.01 coarse+fine centroids are pinned literals
# (queries/q102_ivf2_sf001.py, regenerated by
# scripts/gen_q102_oracle_centroids.py, drift-checked in
# tests/test_ivf2.py) and the whole assignment/probe/serve replays as
# window SQL — the q62/q70 discipline, one level deeper.
# ---------------------------------------------------------------------------

_Q102_STATE: "dict[SparkSession, dict[str, tuple]] " = {}


def trained_ivf2(spark: SparkSession, sf_dir: str):
    """Memoized (coarse, fines, index_path) per (session, sf_dir) —
    the q70 offline-build cadence, two levels deep."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile
    import time as _time

    from cdc_example_spark.operators import similarity as S
    from cdc_example_spark.queries.registry import record_session_build

    per_session = _Q102_STATE.setdefault(spark, {})
    key = _os.path.normpath(sf_dir)
    if key not in per_session:
        emb = load_table(spark, sf_dir, "embeddings")
        nc, nf = S.ivf2_shape_for(emb.count())
        t0 = _time.perf_counter()
        coarse, fines = S.train_ivf2_local(
            emb, n_coarse=nc, n_fine=nf, sample_size=512, n_iters=10
        )
        record_session_build("ivf2_training", _time.perf_counter() - t0)
        tag = _hashlib.sha1(key.encode()).hexdigest()[:8]
        path = _os.path.join(_tempfile.mkdtemp(prefix=f"cdc_ivf2_{tag}_"), "index")
        t0 = _time.perf_counter()
        S.build_ivf2_index(emb, coarse, fines, path)
        record_session_build("ivf2_index_build", _time.perf_counter() - t0)
        per_session[key] = (coarse, fines, path)
    return per_session[key]


def _q102_oracle() -> str:
    from cdc_example_spark.queries.q102_ivf2_sf001 import (
        COARSE_SF001,
        FINES_SF001,
    )

    coarse_values = ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(c, ", ".join(repr(x) for x in cv))
        for c, cv in enumerate(COARSE_SF001)
    )
    fine_values = ",\n        ".join(
        "({}, {}, [{}]::DOUBLE[])".format(c, f, ", ".join(repr(x) for x in fv))
        for c, cell in enumerate(FINES_SF001)
        for f, fv in enumerate(cell)
    )
    return f"""
WITH coarse(ccid, ccv) AS (
  VALUES
        {coarse_values}
), fine(fcid, ffid, fv) AS (
  VALUES
        {fine_values}
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), a1 AS (
  SELECT vec_id, v, ccid AS c1 FROM (
    SELECT vec_id, v, ccid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY list_inner_product(v, ccv) DESC, ccid) AS rn
    FROM v CROSS JOIN coarse) WHERE rn = 1
), cand AS (
  SELECT vec_id, v, c1, ffid AS f1 FROM (
    SELECT a1.vec_id, a1.v, a1.c1, f.ffid,
           ROW_NUMBER() OVER (PARTITION BY a1.vec_id
                              ORDER BY list_inner_product(a1.v, f.fv) DESC, f.ffid) AS rn
    FROM a1 JOIN fine f ON f.fcid = a1.c1) WHERE rn = 1
), qv AS (
  SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 10
), qc AS (
  SELECT query_id, qv, ccid AS pc FROM (
    SELECT query_id, qv, ccid,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY list_inner_product(qv, ccv) DESC, ccid) AS crn
    FROM qv CROSS JOIN coarse) WHERE crn <= 2
), probe_pairs AS (
  SELECT query_id, pc, ffid AS pf FROM (
    SELECT qc.query_id, qc.pc, f.ffid,
           ROW_NUMBER() OVER (PARTITION BY qc.query_id, qc.pc
                              ORDER BY list_inner_product(qc.qv, f.fv) DESC, f.ffid) AS frn
    FROM qc JOIN fine f ON f.fcid = qc.pc) WHERE frn <= 2
), scored AS (
  SELECT q.query_id, c.vec_id,
         list_cosine_similarity(c.v, q.qv) AS cos_sim
  FROM cand c
  JOIN probe_pairs p ON c.c1 = p.pc AND c.f1 = p.pf
  JOIN qv q ON q.query_id = p.query_id AND c.vec_id <> q.query_id
)
SELECT query_id, vec_id,
       CAST(ROUND(CAST(cos_sim AS DECIMAL(28,10)), 2) AS DOUBLE) AS cos_sim,
       rn
FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 3
ORDER BY query_id, rn
"""


@query("q102_ivf2_persisted_serving", oracle=_q102_oracle(), oracle_sf="sf0.01")
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 at (2 coarse × 2 fine) probes from the persisted two-level
    index."""
    from cdc_example_spark.operators import similarity as S

    coarse, fines, path = trained_ivf2(spark, sf_dir)
    probes = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    out = S.ivf2_topk_indexed(
        spark,
        path,
        probes,
        coarse,
        fines,
        k=3,
        n_probe_coarse=2,
        n_probe_fine=2,
    )
    return out.select(
        "query_id", "vec_id", dec2(F.col("cos_sim")).alias("cos_sim"), "rn"
    ).transform(small_result_order, "query_id", "rn")
