"""Q51–Q54 — corpus relevance + deterministic sampling queries.

The retrieval/curation layer of the LLM-data-pipeline surface
(BASELINE.json:6): term weighting (TF-IDF), query relevance (BM25 —
the standard crawl-vs-quality-prompt curation ranker), reproducible
stratified sampling, and n-gram vocabulary building. Operators live in
operators/relevance.py and operators/sampling.py; this module binds
them to the driver tables with DuckDB oracles under the registry's
determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_example_spark.operators import relevance as R
from cdc_example_spark.operators import sampling as S
from cdc_example_spark.queries.registry import query
from cdc_example_spark.queries.util import dec2
from cdc_example_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# q51 — top-3 TF-IDF terms per document (IDF scoped per language).
# Cross-engine determinism of the rank: tf and df are integers, so two
# terms tie in score only with identical (tf, df) — and then BOTH
# engines compute the identical double and break the tie on the term
# string. The smoothed idf ln((N+1)/(df+1)) keeps corpus-universal
# terms at exactly 0.0 on both engines.
# ---------------------------------------------------------------------------

_Q51_ORACLE = r"""
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT lang, doc_id, term, COUNT(*) AS tf
  FROM toks GROUP BY lang, doc_id, term
), n AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
), scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * LN((n.n_docs + 1.0) / (COUNT(*) OVER (PARTITION BY tf.lang, tf.term) + 1)) AS score
  FROM tf JOIN n USING (lang)
), ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk,
       CAST(ROUND(CAST(score AS DECIMAL(28,10)), 2) AS DOUBLE) AS tfidf
FROM ranked
WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@query("q51_tfidf_top_terms", oracle=_Q51_ORACLE)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, language-scoped IDF."""
    docs = load_table(spark, sf_dir, "documents")
    out = R.tfidf_top_terms(docs, k=3)
    return out.select(
        "doc_id", "term", "rnk", dec2(F.col("tfidf")).alias("tfidf")
    ).orderBy("doc_id", "rnk")


# ---------------------------------------------------------------------------
# q52 — BM25 ranking of the corpus against a fixed probe query.
# The top-10 cut orders by the ROUNDED score (then doc_id): integer
# tf/df/dl make equal-input docs collide to the identical double, and
# the 2-decimal round absorbs the ≤1-ulp cross-engine ln() skew for
# unequal inputs, so the cut is reproducible on both engines.
# ---------------------------------------------------------------------------

_QUERY_TERMS = ("hash", "merge", "scan")

_Q52_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ws
  FROM documents
), dl AS (
  SELECT doc_id, len(ws) AS dl FROM d
), c AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM d)
  WHERE term IN ('hash', 'merge', 'scan')
  GROUP BY doc_id, term
), dft AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         LN(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf * (1.2 + 1)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl)) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN c
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
       CAST(ROUND(CAST(SUM(s) AS DECIMAL(28,10)), 2) AS DOUBLE) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


@query("q52_bm25_search", oracle=_Q52_ORACLE)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the probe query (hash, merge, scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_rank(docs, _QUERY_TERMS, k=10).select(
        "doc_id", "n_terms_matched", "bm25"
    )


# ---------------------------------------------------------------------------
# q53 — deterministic stratified sample: exactly 7 docs per language,
# the k-smallest-hash twin of reservoir sampling (operators/sampling).
# Pure int64 arithmetic end to end — bit-reproducible on any engine.
# ---------------------------------------------------------------------------

_Q53_ORACLE = """
WITH h AS (
  SELECT lang, doc_id,
         ((doc_id % 1000003) * 2654435761
          + (doc_id // 1000003) * 40503 + 987654321) % 1048576 AS hv
  FROM documents
), r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
  FROM h
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id
FROM r
WHERE rnk <= 7
ORDER BY lang, rnk
"""


@query("q53_stratified_sample", oracle=_Q53_ORACLE)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 7-per-language stratified sample (hash reservoir)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        S.stratified_sample_k(docs, k=7, stratum_col="lang", key_col="doc_id")
        .select("lang", "rnk", "doc_id")
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# q54 — bigram vocabulary: top-5 word bigrams per language by count.
# Integer counts + string tie-breaks — fully deterministic; the Spark
# side builds bigrams with a JVM `transform` over the token array, the
# oracle with a lateral generate_series over 1-based list indexes.
# ---------------------------------------------------------------------------

_Q54_ORACLE = r"""
WITH t AS (
  SELECT lang, regexp_split_to_array(TRIM(LOWER(text)), '\s+') AS ws
  FROM documents
), grams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i + 1])) AS ngram
  FROM t
), counts AS (
  SELECT lang, ngram, COUNT(*) AS n_occurrences
  FROM grams GROUP BY lang, ngram
), ranked AS (
  SELECT lang, ngram, n_occurrences,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_occurrences DESC, ngram) AS rnk
  FROM counts
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, ngram,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM ranked
WHERE rnk <= 5
ORDER BY lang, rnk
"""


@query("q54_bigram_vocab", oracle=_Q54_ORACLE)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language (tokenizer-training vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        R.top_ngrams(docs, n=2, k=5)
        .select("lang", "rnk", "ngram", "n_occurrences")
        .orderBy("lang", "rnk")
    )
