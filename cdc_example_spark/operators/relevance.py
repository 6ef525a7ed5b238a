"""Corpus-relevance operators: TF-IDF, BM25, n-gram vocabulary.

The retrieval/curation trio a training-data pipeline runs over a raw
corpus: term weighting (which words characterize a document), query
relevance (which documents match a probe query — the standard data-
curation trick of ranking a crawl against a quality prompt), and
vocabulary building (the n-gram frequency table that seeds a tokenizer).

Everything is JVM-side column expressions over a whitespace tokenizer
(functions/text.words) — no UDFs, no collect. Scale shapes:

- the token stream (the 100 TB object) is reduced to per-(doc, term)
  counts by a map-side-combined hash aggregate before anything else
  touches it; raw tokens never cross a shuffle un-aggregated;
- corpus-level statistics (doc counts, average doc length, per-term
  document frequency over a bounded query vocabulary) are tiny
  aggregates that broadcast back to the big side;
- top-k-per-group selections express as rank-filtered windows, which
  Spark ≥3.5 executes with WindowGroupLimit: each map task keeps only
  its local top-k before the shuffle, so the sort never sees the full
  group (tests/test_plan_audit.py pins this for the ranking queries).

Reference parity: the reference has no text operators at all
(SURVEY.md §2.1); this module is part of the BASELINE.json:6 mandated
LLM-data-pipeline extension, same discipline as operators/dedup.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.functions import text as T

#: BM25 shape parameters (Robertson/Spärck Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(
    df: DataFrame,
    text_col: str,
    keep: Sequence[str],
    tokens_col: str | None = None,
) -> DataFrame:
    """Lower-cased whitespace tokens of ``text_col``, one row per token,
    carrying ``keep``. The explode happens after column pruning, so the
    only wide value in flight is the token itself. With ``tokens_col``
    the input already carries the token array (the catalog's shared
    ``load_doc_tokens`` view) and tokenization is skipped."""
    src = F.col(tokens_col) if tokens_col else T.words(F.lower(F.col(text_col)))
    return df.select(*keep, F.explode(src).alias("term"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_col: str = "lang",
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document, IDF scoped per ``corpus_col``.

    tf = in-document term count; idf = ln((N+1)/(df+1)) with N = docs in
    the corpus partition and df = docs containing the term (smoothed so
    a corpus-universal term scores 0 instead of exploding).

    The rank orders by the 2-decimal-rounded score (term tie-break):
    tf/df are integers so equal inputs give the identical double, and
    the round absorbs the ≤1-ulp cross-engine ln() skew between
    near-equal scores from *different* (tf, df) — same discipline as
    bm25_rank's top-k cut. Emitted ``tfidf`` is the rounded value.

    Plan: token stream → (corpus, doc, term) hash agg (map-side
    combine; the ONLY pass over raw text) → df via a count window over
    (corpus, term) on the already-aggregated tf rows → N per corpus as
    a broadcast dim → per-doc rank window, WindowGroupLimit-pruned.
    """
    # function-level import: queries/__init__ imports back into this
    # module (same cycle-avoidance as bm25_rank below).
    from cdc_example_spark.queries.util import dec2

    tf = (
        _tokens(docs, text_col, (corpus_col, id_col), tokens_col)
        .groupBy(corpus_col, id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.groupBy(corpus_col).agg(F.count(F.lit(1)).alias("n_docs"))
    df_w = Window.partitionBy(corpus_col, "term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .join(F.broadcast(n_docs), corpus_col)
        .withColumn(
            "tfidf",
            dec2(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + 1))
            ),
        )
    )
    rank_w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "rnk", "tfidf")
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 score against a bag of query terms.

    score(d) = Σ_t ln(1 + (N−df+0.5)/(df+0.5)) ·
               tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))

    Only documents containing ≥1 query term participate (BM25 of a
    non-matching doc is 0). The top-k cut orders by the 2-decimal
    rounded score with ``id_col`` tie-break — rounding first makes the
    cut reproducible across engines whose ln() differ in the last ulp.

    Plan: doc lengths in the same pass that tokenizes; the token stream
    is filtered to the query vocabulary BEFORE the (doc, term) agg, so
    the shuffle carries only query-term hits; df (≤|query| rows) and
    the corpus stats (1 row) broadcast back; final top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    from cdc_example_spark.queries.util import dec2

    if tokens_col:
        lens = docs.select(id_col, F.col(tokens_col).alias("ws"))
    else:
        lens = docs.select(id_col, T.words(F.lower(F.col(text_col))).alias("ws"))
    lens = lens.withColumn("dl", F.size("ws"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        lens.select(id_col, "dl", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    # the corpus-stats frame is ONE row: broadcasting it into a
    # nested-loop join is the intentional tiny-build-side pattern the
    # plan audit allowlists (same shape as the cosine query-set
    # broadcast) — a literal-key equi-join would just be constant-folded
    # back into this.
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("s", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            dec2(F.sum("s")).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 5,
    text_col: str = "text",
    group_col: str = "lang",
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` most frequent word ``n``-grams per ``group_col`` —
    the vocabulary/statistics table a tokenizer trainer starts from.

    n-grams build as a JVM ``transform`` over the token array (no UDF,
    no extra pass); counts are map-side-combined; the per-group top-k
    is a WindowGroupLimit-pruned rank. Ties (equal counts) break on the
    n-gram string, so the output is a total order — integer counts make
    it reproducible bit-for-bit on any engine.
    """
    if tokens_col:
        toks = docs.select(group_col, F.col(tokens_col).alias("ws"))
    else:
        toks = docs.select(group_col, T.words(F.lower(F.col(text_col))).alias("ws"))
    # sequence(0, size-n) is DESCENDING when size < n (Spark extends
    # sequences both ways) — guard short docs to an empty n-gram list.
    grams = F.when(
        F.size(F.col("ws")) >= n,
        F.expr(
            f"transform(sequence(0, size(ws) - {n}), "
            f"i -> concat_ws(' ', slice(ws, i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toks.select(group_col, F.explode(grams).alias("ngram"))
        .groupBy(group_col, "ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("n_occurrences").desc(), "ngram"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(group_col, "rnk", "ngram", "n_occurrences")
    )


def bigram_lm_doc_scores(toks: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Corpus self-perplexity per document under an add-α bigram LM.

    The CCNet/Gopher-style quality signal without an external model:
    train the n-gram LM ON the corpus itself (one aggregation pass) and
    score every document against it — documents whose word transitions
    are unlike the rest of the corpus surface with high perplexity.

    P(w|prev) = (c(prev,w) + α) / (c(prev) + α·V_lang); per doc:
    avg log-prob over its bigram occurrences, perplexity = exp(−avg).
    All counts are exact integers, so the only float work is the
    division/log/avg chain — deterministic enough for the dec2 oracle
    discipline (same class as every AVG in the query set).

    Scale shape: bigram counts partial-aggregate map-side before one
    (lang, prev, w) shuffle; context counts derive from the (already
    tiny) count table, never a second corpus pass; scoring is a shuffle
    join of doc-bigram rows against the count tables on their natural
    keys — no broadcast of anything corpus-sized, no collect. Input
    ``toks``: (doc_id, lang, ws array<string>).
    """
    bg = (
        toks.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS prev,"
                    " element_at(ws, i + 1) AS w))"
                )
            ).alias("b"),
        )
        .select("doc_id", "lang", "b.prev", "b.w")
    )
    c_bg = bg.groupBy("lang", "prev", "w").agg(F.count(F.lit(1)).alias("c_bg"))
    c_prev = c_bg.groupBy("lang", "prev").agg(F.sum("c_bg").alias("c_prev"))
    vocab = (
        toks.select("lang", F.explode("ws").alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("v"))
    )
    logp = F.log(
        (F.col("c_bg") + F.lit(alpha))
        / (F.col("c_prev") + F.lit(alpha) * F.col("v"))
    )
    return (
        bg.join(c_bg, ["lang", "prev", "w"])
        .join(c_prev, ["lang", "prev"])
        .join(F.broadcast(vocab), ["lang"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("avg_logp"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logp")))
    )


def rrf_fuse(
    rankings: "dict[str, DataFrame]",
    id_col: str = "doc_id",
    rnk_col: str = "rnk",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of named candidate rankings (hybrid search).

    The standard way to combine a lexical ranker (BM25) with a vector
    ranker (embedding cosine) without score calibration: each list
    contributes ``1/(k0 + rank)`` for the documents it ranked, and
    documents missing from a list contribute nothing from it
    (Cormack/Clarke/Büttcher RRF, the fusion TREC/BEIR hybrid baselines
    use; k0=60 is the canonical damping constant).

    Inputs are ALREADY-CUT top-k frames — ``(id_col, rnk_col)`` with
    dense integer ranks starting at 1 under each ranker's own
    deterministic tie-break. That makes fusion O(Σ k_i) regardless of
    corpus size: the expensive work (scan, inverted-index aggregation,
    brute/IVF vector top-k) happens inside each ranking's own plan and
    collapses to ≤k rows via TakeOrderedAndProject BEFORE this union —
    at 100 TB the fused exchange still carries a few dozen rows.

    Output: one row per distinct id with ``{name}_rnk`` per input list
    (BIGINT, 0 = not ranked by that list — a 0 sentinel rather than
    NULL so the column stays integer-typed through any pandas/Arrow
    fetch) and ``rrf`` (the fused score, 6-decimal-rounded DOUBLE: each
    term 1/(k0+r) is the same IEEE double on any engine, and the terms
    are added AFTER the aggregation, left-to-right in sorted list-name
    order — a fixed association independent of row order or list
    count, so the pre-round double is bit-identical on any engine; an
    engine-side SUM over the union would be order-dependent past 2
    lists). An oracle replaying 3+ lists must pivot to per-list terms
    and add in the same sorted-name order (2-list addition is exactly
    commutative, so the q114 oracle's pivoted form is unaffected). No
    global order is imposed — callers cut their own top-k on
    (rrf DESC, id).

    Determinism requires each input ranking to be deterministic; ranks
    produced from rounded scores with an id tie-break (bm25_rank's
    discipline) satisfy this.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = None
    for name, df in rankings.items():
        t = df.select(
            F.col(id_col).alias("_id"),
            F.lit(name).alias("_src"),
            F.col(rnk_col).cast("long").alias("_rnk"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per_list = [
        F.coalesce(
            F.max(F.when(F.col("_src") == name, F.col("_rnk"))), F.lit(0)
        )
        .cast("long")
        .alias(f"{name}_rnk")
        for name in rankings
    ]
    agged = tagged.groupBy(F.col("_id").alias(id_col)).agg(*per_list)
    # Fixed-association fusion: one term per list from its pivoted rank
    # column, added left-to-right in sorted name order. Deterministic
    # for ANY list count — an in-aggregate SUM over the union rows
    # would add in row order, which no engine guarantees.
    rrf_expr = F.lit(0.0)
    for name in sorted(rankings):
        c = F.col(f"{name}_rnk")
        rrf_expr = rrf_expr + F.when(
            c > 0, F.lit(1.0) / (F.lit(float(k0)) + c)
        ).otherwise(F.lit(0.0))
    return agged.withColumn(
        "rrf",
        F.round(rrf_expr.cast("decimal(28,10)"), 6).cast("double"),
    )
