"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length / punct /
stopword / word-shape ratios), token counting (whitespace + a BPE-ish
regex pre-tokenizer), and document fingerprinting (rolling hash).

Everything is a JVM-side column expression: at 100 TB these run inside
whole-stage codegen over the parquet scan with zero Python crossings
and zero shuffles (they're all per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_example_spark.functions import text as T

#: Minimal per-language stopword anchors for the n-gram/stopword
#: language-ID heuristic. Deterministic and tiny by design — a real
#:  deployment swaps in a larger table (broadcast join) without
#: changing the operator shape.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "de", "y", "que"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de", "shi", "bu", "le", "zai"),  # romanized anchors
}

#: BPE-ish pre-tokenizer: letter runs | digit runs | single
#: non-alnum-non-space marks — the GPT-2-style split shape, kept to
#: ASCII classes so Java and RE2 regex engines agree.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words_col(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return T.words(F.lower(text))


def stopword_hits(ws: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(ws, lambda w: w.isin(*sw)))


def lang_scores(ws: Column) -> dict[str, Column]:
    return {lang: stopword_hits(ws, lang) for lang in STOPWORDS}


def predict_lang(ws: Column) -> Column:
    """argmax over stopword scores; ties break by language code order
    (deterministic). 'und' (undetermined) when no stopword hits at all."""
    return _argmax_lang(lang_scores(ws))


def _argmax_lang(scores: dict[str, Column]) -> Column:
    """argmax over per-language score columns; ties break by language
    code order (deterministic); 'und' when every score is zero."""
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def lang_id_table(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc language prediction as a DataFrame (the scale path).

    Explode words once, count stopword hits per language as plain
    conditional aggregates (whole-stage codegen + map-side combine: the
    shuffle carries one row per doc, not per token), then argmax over
    the five scalar score columns. The column-expression variant
    (:func:`predict_lang`) re-evaluates the tokenizer inside every score
    reference — fine for one-off use, ~10× slower in anger.
    """
    # COALESCE(text, ''): exploding a NULL token array would DROP the
    # document, while the SQL oracle's CASE would fall through NULL
    # comparisons to its ELSE branch — with '' both engines tokenize an
    # empty doc and predict 'und'.
    w = df.select(
        F.col(key_col),
        *[F.col(c) for c in extra_cols],
        F.explode(words_col(F.coalesce(F.col(text_col), F.lit("")))).alias("_w"),
    )
    aggs = [
        F.count(F.when(F.col("_w").isin(*STOPWORDS[lang]), F.lit(1))).alias(f"_s_{lang}")
        for lang in STOPWORDS
    ]
    g = w.groupBy(key_col, *extra_cols).agg(*aggs)
    scores = {lang: F.col(f"_s_{lang}") for lang in STOPWORDS}
    return g.select(
        key_col, *extra_cols, _argmax_lang(scores).alias("predicted_lang")
    )


def token_count_whitespace(text: Column) -> Column:
    return F.size(T.words(text))


def token_count_bpe(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (regexp, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals; each ∈ [0, 1]-ish, rounding left
    to the caller."""
    trimmed = F.trim(text)
    n_chars = F.length(trimmed)
    ws = words_col(trimmed)
    n_words = F.size(ws)
    n_punct = n_chars - F.length(F.regexp_replace(trimmed, r"[.,!?;:]", ""))
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS["en"])))
    mean_word_len = F.when(n_words > 0, (F.length(F.regexp_replace(trimmed, r"\s+", "")) / n_words))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)),
        "mean_word_len": F.coalesce(mean_word_len, F.lit(0.0)),
    }


def quality_score(text: Column) -> Column:
    """Composite heuristic: long-enough docs with some stopwords and
    sane word lengths score high; punctuation walls score low."""
    f = quality_features(text)
    length_term = F.least(f["n_words"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    shape_term = F.when((f["mean_word_len"] >= 2) & (f["mean_word_len"] <= 12), 1.0).otherwise(0.3)
    punct_term = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.4)
    return (length_term + stop_term + shape_term + punct_term) / 4


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint (functions.text)."""
    return T.rolling_fingerprint(text)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Within-document repetition: total vs distinct 3-word shingles.

    The Gopher-style repetition quality signal — a doc whose shingle
    stream is mostly duplicates is boilerplate/spam. rep_frac =
    1 − distinct/total ∈ [0, 1); docs shorter than one shingle get no
    row (nothing to measure).

    Scale: MAP-ONLY. The stats are per-document, so they never need a
    shuffle at all: the shingle array stays a row-local value and
    total/distinct are ``size`` / ``size(array_distinct)`` — Spark's
    array_distinct is a linear-time hash-set pass. (The previous
    explode → groupBy(doc) shape shuffled every (id, shingle) pair to
    recount what each row already knew — measured 3× slower at sf0.1,
    and at 100 TB it's a full-corpus shuffle vs none.) The text column
    never leaves the scan projection.
    """
    # Materialize the token array, then the shingle array, as NAMED
    # columns before anything references them: T.shingles references
    # its input 4× and size/array_distinct reference the shingle array
    # 2× — inline expressions would be copied into every reference
    # site and re-evaluated (O(words²) per doc, measured 20× at
    # sf0.1). Named columns survive because CollapseProject refuses to
    # duplicate expensive multiply-referenced expressions.
    # The sub-shingle-doc filter runs at TOKEN level (word count < 3 ⇔
    # zero shingles), never on the shingle array: a later
    # filter(size(sh) > 0) gets predicate-pushed below the projections
    # with the whole shingle pipeline substituted inline — the split
    # then re-runs per element_at reference inside the copied filter
    # expression (measured 10× at sf0.1).
    if tokens_col:
        toks = df.select(id_col, F.col(tokens_col).alias("ws"))
    else:
        toks = df.select(id_col, T.words(F.lower(F.col(text_col))).alias("ws"))
    toks = toks.filter(F.size("ws") >= 3)
    arr = toks.select(id_col, T.shingles(F.col("ws")).alias("sh"))
    return (
        arr.select(
            F.col(id_col),
            F.size("sh").cast("long").alias("total_shingles"),
            F.size(F.array_distinct("sh")).cast("long").alias("distinct_shingles"),
        )
        .withColumn(
            "rep_frac", 1 - F.col("distinct_shingles") / F.col("total_shingles")
        )
    )


def contamination_overlap(
    df: DataFrame,
    bench_max_id: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct 3-word shingles appear in ANY benchmark doc (the GPT-3 /
    Llama eval-overlap check, with ``doc_id < bench_max_id`` standing
    in for the benchmark suite).

    Output (only docs with ≥1 shared shingle): n_shingles, n_shared,
    overlap_frac = n_shared / n_shingles.

    Scale: the benchmark shingle SET is small by construction (eval
    suites are MBs, the corpus is the 100 TB side) → it collapses to
    ONE broadcast row (collect_set of the bench docs' shingles) and
    the corpus side is MAP-ONLY: per-row ``array_distinct`` +
    ``array_intersect`` against the broadcast set — no corpus explode,
    no (id, shingle) shuffle, no join exchange. (The previous
    explode → distinct → broadcast-join shape shuffled every distinct
    corpus (id, shingle) pair; measured 2× slower at sf0.1, and at
    100 TB that shuffle is the whole corpus's token stream. Swap
    shingle strings for 8-byte fingerprints at scale to shrink the
    broadcast + per-row set further.)
    """
    # named-column indirection for the same O(words²) reason as
    # repetition_stats above: ws, then the raw shingle array, then its
    # distinct form each get a projection of their own.
    # Branch on doc_id BEFORE tokenizing: writing one tokenized frame
    # and filtering it twice leaves the cheap doc_id predicates BEHIND
    # the word-count filter in the combined conjunction, so the bench
    # branch re-splits every corpus row just to discard it.
    def _dist_shingles(d: DataFrame) -> DataFrame:
        # token-level short-doc filter, NOT filter(size(sh) > 0) — see
        # repetition_stats for the predicate-pushdown duplication trap
        if tokens_col:
            toks = d.select(id_col, F.col(tokens_col).alias("ws"))
        else:
            toks = d.select(id_col, T.words(F.lower(F.col(text_col))).alias("ws"))
        toks = toks.filter(F.size("ws") >= 3)
        arr = toks.select(id_col, T.shingles(F.col("ws")).alias("sh0"))
        return arr.select(id_col, F.array_distinct("sh0").alias("sh"))

    # bench side: ≤ bench_max_id docs exploded into one global
    # distinct-shingle set
    bench = (
        _dist_shingles(df.filter(F.col(id_col) < bench_max_id))
        .select(F.explode("sh").alias("s"))
        .agg(F.collect_set("s").alias("bench_sh"))
    )
    # single-row broadcast into a nested-loop join — the intentional
    # tiny-build-side pattern (BNLJ_INTENTIONAL, same as q52's corpus
    # stats); the corpus side then computes everything row-locally.
    return (
        _dist_shingles(df.filter(F.col(id_col) >= bench_max_id))
        .crossJoin(F.broadcast(bench))
        .select(
            F.col(id_col),
            F.size("sh").cast("long").alias("n_shingles"),
            F.size(F.array_intersect("sh", "bench_sh")).cast("long").alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
        .withColumn("overlap_frac", F.col("n_shared") / F.col("n_shingles"))
    )
