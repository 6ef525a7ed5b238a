"""Round-6 late-extension queries (q96+): lake layout, CDC version
diff, fixed-size weighted sampling, and term-association mining.

Four operators a production pipeline runs that the q01–q95 surface
does not yet cover:

* q96 — the "what changed between two snapshot versions" CDC diff
  (Delta change-data-feed flavor) over the same changelog the
  reference's LWW map consumes (`MessageService.kt:21-25` semantics;
  the streaming sink applies this fold incrementally, q49 reads one
  version — q96 compares two);
* q97 — priority sampling (Duffield–Lund–Thorup): a FIXED-SIZE
  weighted sample without replacement with unbiased subset-sum
  estimators, complementing q83's Poisson PPS draw whose sample size
  is only expected-k. Pure rational arithmetic (w / u) so the draw
  replays bit-identically on any engine — no pow/log whose libm
  rounding could flip a rank (same discipline as q83's hash uniform);
* q98 — token co-occurrence association (lift) over the corpus: the
  inverted-index-by-document twin of q87's inverted-index-by-token
  join (q87 pairs DOCS via shared tokens; q98 pairs TOKENS via shared
  docs). Lift = P(t1,t2)/(P(t1)P(t2)) is the monotone argument of PMI
  kept in rational form — ordering by it is ordering by PMI, with no
  cross-engine log;
* q99 — Z-order (Morton) lake clustering + a two-dimension box scan
  over the clustered artifact (operators/zorder.py). Results are
  layout-independent by construction (the oracle runs on the raw
  table); the layout's data-skipping value is pinned from parquet
  footers in tests/test_zorder.py.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_example_spark.queries.registry import query
from cdc_example_spark.queries.util import dec2, small_result_order
from cdc_example_spark.sources.catalog import load_doc_tokens, load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# ---------------------------------------------------------------------------
# q96 — CDC snapshot diff ("changes between versions"): per-user state
# as of T1 vs as of T2, classified insert/update — the change-data-feed
# read every downstream consumer of a materialized CDC table wants
# ("what moved since my last sync?"). Spark side: two snapshot_at
# partial-agg folds (q49's max_by shape — no window sort over history)
# full-outer-joined on the key; both agg outputs are already hash-
# partitioned on user_id, so the join adds NO third exchange. On an
# append-only changelog a key present at T1 is present at T2, so
# 'delete' is impossible here by construction (a feed with tombstones
# would surface them through snapshot_at's delete_col and the s2-NULL
# branch below). The oracle reaches the same diff through ROW_NUMBER
# CTEs + FULL JOIN — different algorithm, same answer. Scale: two
# scans (one per version bound) + two partial aggs + one co-partitioned
# join; nothing is ever sorted per key.
# ---------------------------------------------------------------------------

_Q96_T1 = "2024-01-15 00:00:00"
_Q96_T2 = "2024-01-30 00:00:00"

_Q96_ORACLE = f"""
WITH v1 AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_Q96_T1}'
), s1 AS (
  SELECT user_id, event_id, ts FROM v1 WHERE rn = 1
), v2 AS (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{_Q96_T2}'
), s2 AS (
  SELECT user_id, event_id, ts, value FROM v2 WHERE rn = 1
)
SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'insert' ELSE 'update' END AS op,
       s1.event_id AS old_event_id,
       strftime(s1.ts, '{_TS_FMT_DUCK}') AS old_ts,
       s2.event_id AS new_event_id,
       strftime(s2.ts, '{_TS_FMT_DUCK}') AS new_ts,
       CAST(ROUND(CAST(s2.value AS DECIMAL(28,10)), 2) AS DOUBLE) AS new_value
FROM s2 FULL JOIN s1 ON s2.user_id = s1.user_id
WHERE s1.user_id IS NULL OR s1.event_id <> s2.event_id
ORDER BY user_id
"""


@query("q96_snapshot_diff", oracle=_Q96_ORACLE)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key diff of two changelog snapshots (CDC change-data-feed)."""
    from cdc_example_spark.operators.asof import snapshot_at

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    s1 = snapshot_at(
        ev, keys=["user_id"], ts_col="ts", as_of=_Q96_T1, tiebreak="event_id"
    ).select(
        "user_id",
        F.col("event_id").alias("old_event_id"),
        F.col("ts").alias("old_ts_raw"),
    )
    s2 = snapshot_at(
        ev, keys=["user_id"], ts_col="ts", as_of=_Q96_T2, tiebreak="event_id"
    ).select(
        "user_id",
        F.col("event_id").alias("new_event_id"),
        F.col("ts").alias("new_ts_raw"),
        F.col("value").alias("new_value_raw"),
    )
    return (
        s2.join(s1, on="user_id", how="full_outer")
        .filter(
            F.col("old_event_id").isNull()
            | (F.col("old_event_id") != F.col("new_event_id"))
        )
        .select(
            "user_id",
            F.when(F.col("old_event_id").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op"),
            "old_event_id",
            F.date_format("old_ts_raw", _TS_FMT_SPARK).alias("old_ts"),
            "new_event_id",
            F.date_format("new_ts_raw", _TS_FMT_SPARK).alias("new_ts"),
            dec2(F.col("new_value_raw")).alias("new_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q97 — priority sampling (Duffield–Lund–Thorup): fixed-size-64
# weighted sample without replacement. Each doc draws priority
# w / u (w = n_chars, u = the deterministic multiplicative-hash
# uniform from q83, shifted by +1 so doc_id 0 cannot hit u = 0); the
# sample is the top 64 priorities and tau is the 65th (0 when the
# population doesn't exceed the budget — then everything is sampled
# and estimates must be exact) — the published estimator assigns every
# sampled item weight estimate max(w, tau), which makes any subset-sum
# estimate unbiased (pinned empirically across many hash seeds in
# tests/test_pipeline_queries.py). Scale:
# priority is map-side arithmetic; top-65 plans as
# TakeOrderedAndProject (per-partition heap + driver merge of 65-row
# partials — never a global sort); the rank/tau window runs over the
# 65 surviving rows only, bounded by the preceding limit BY
# CONSTRUCTION. Everything is +,*,/,% on exact integers and one
# correctly-rounded IEEE division — no transcendental, so both
# engines rank identically bit-for-bit.
# ---------------------------------------------------------------------------

_Q97_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, n_chars,
         (((doc_id + 1) * 2654435761) % 4294967296) / 4294967296.0 AS u
  FROM documents
), p AS (
  SELECT doc_id, lang, n_chars, n_chars / u AS pri FROM d
), t AS (
  SELECT * FROM p ORDER BY pri DESC, doc_id LIMIT 65
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS rn,
         CASE WHEN COUNT(*) OVER () = 65 THEN MIN(pri) OVER () ELSE 0.0 END
           AS tau
  FROM t
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(ROUND(CAST(pri AS DECIMAL(28,10)), 2) AS DOUBLE) AS priority,
       CAST(ROUND(CAST(GREATEST(n_chars * 1.0, tau) AS DECIMAL(28,10)), 2)
            AS DOUBLE) AS w_est
FROM r WHERE rn <= 64
ORDER BY doc_id
"""


@query("q97_priority_sample", oracle=_Q97_ORACLE)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sample without replacement + DLT estimator."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        ((F.col("doc_id") + 1) * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    top = (
        docs.select(
            "doc_id", "lang", "n_chars", (F.col("n_chars") / u).alias("pri")
        )
        .orderBy(F.col("pri").desc(), "doc_id")
        .limit(65)
    )
    w = Window.orderBy(F.col("pri").desc(), "doc_id")
    w_full = Window.orderBy(F.col("pri").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tau = F.when(
        F.count(F.lit(1)).over(w_full) == 65, F.min("pri").over(w_full)
    ).otherwise(F.lit(0.0))
    return (
        top.select(
            "doc_id",
            "lang",
            "n_chars",
            "pri",
            F.row_number().over(w).alias("rn"),
            tau.alias("tau"),
        )
        .filter(F.col("rn") <= 64)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            dec2(F.col("pri")).alias("priority"),
            dec2(F.greatest(F.col("n_chars") * 1.0, F.col("tau"))).alias(
                "w_est"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q98 — token co-occurrence association (lift): which token pairs
# appear in the same documents far more often than independence
# predicts — collocation mining, the term-association pass behind
# phrase detection and taxonomy building. Structural twin of q87
# transposed: postings keyed by doc_id pair TOKENS (q87 keys by token
# to pair DOCS). Quadratic-control knob: the pairing runs over a
# CAPPED VOCABULARY — the top-64 tokens by document frequency (ties
# broken by token) — the same contract under which co-occurrence
# matrices are built for embedding training (top-V vocab, everything
# else ignored). Pair space is then <= V^2/2 REGARDLESS of corpus
# size, per-doc fan-out <= min(doc tokens, V)^2, and the vocab table
# broadcasts at any scale. (A df BAND is the wrong knob for this
# corpus: its df distribution is bimodal — a ~30-token core in most
# documents and a df=1 tail — so any mid-band is empty; the vocab cap
# is the knob that is also what collocation mining actually wants.)
# Lift stays in rational form (c12 * N / (df1 * df2) — exact-int
# products through one correctly-rounded division), so ordering by it
# IS ordering by PMI with no cross-engine log; both engines rank
# bit-identically. Scale: one token-explode + distinct, one broadcast
# vocab prune, one doc_id self-join whose two sides reuse ONE
# exchange, one map-side-combined pair count. The 1-row corpus-size
# frame rides the q52/q83 broadcast-scalar pattern (BNLJ_INTENTIONAL).
# ---------------------------------------------------------------------------

_Q98_VOCAB = 64

_Q98_ORACLE = rf"""
WITH raw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
), tok AS (
  SELECT DISTINCT doc_id, token FROM raw
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM tok GROUP BY token
), vocab AS (
  SELECT token, df FROM dfreq ORDER BY df DESC, token LIMIT {_Q98_VOCAB}
), n AS (
  SELECT COUNT(*) * 1.0 AS n_docs FROM documents
), t AS (
  SELECT tok.doc_id, tok.token, vocab.df
  FROM tok JOIN vocab USING (token)
), pairs AS (
  SELECT a.token AS token1, b.token AS token2,
         ANY_VALUE(a.df) AS df1, ANY_VALUE(b.df) AS df2,
         COUNT(*) AS c12
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT token1, token2, CAST(c12 AS BIGINT) AS c12,
       CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
       CAST(ROUND(CAST(c12 * n.n_docs / (df1 * df2) AS DECIMAL(28,10)), 2)
            AS DOUBLE) AS lift
FROM pairs, n
ORDER BY c12 * n.n_docs / (df1 * df2) DESC, token1, token2
LIMIT 40
"""


@query("q98_token_lift", oracle=_Q98_ORACLE)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocated token pairs by association lift (capped vocab)."""
    toks = load_doc_tokens(spark, sf_dir)
    tok = (
        toks.select("doc_id", F.explode("ws").alias("token")).distinct()
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "token")
        .limit(_Q98_VOCAB)
    )
    n = toks.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    t = tok.join(F.broadcast(vocab), "token")
    a = t.select(
        "doc_id", F.col("token").alias("token1"), F.col("df").alias("df1")
    )
    b = t.select(
        "doc_id", F.col("token").alias("token2"), F.col("df").alias("df2")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("token1") < F.col("token2"))
        .groupBy("token1", "token2")
        .agg(
            F.first("df1").alias("df1"),
            F.first("df2").alias("df2"),
            F.count(F.lit(1)).alias("c12"),
        )
        .filter(F.col("c12") >= 3)
    )
    lift = F.col("c12") * F.col("n_docs") / (F.col("df1") * F.col("df2"))
    return (
        pairs.crossJoin(F.broadcast(n))
        .orderBy(lift.desc(), "token1", "token2")
        .limit(40)
        .select(
            "token1",
            "token2",
            "c12",
            "df1",
            "df2",
            dec2(lift).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q99 — Z-order-clustered lake scan: lineitem rewritten once on the
# Morton curve of (ship-day index, part key), then a two-dimension box
# query over the clustered files. The rewrite is a session artifact on
# the offline cadence (q64's bucketed-write pattern, its cost recorded
# in the session_build bench tier, memoized per session x sf_dir); the
# registered query is the read path a user actually runs. Correctness
# is layout-independent — the filter touches only the real columns and
# the oracle runs on the RAW table — while the layout's two-dimension
# file-skipping (the thing a 1-D sort cannot give) is pinned from
# parquet footer envelopes in tests/test_zorder.py. Scale: the curve
# value is pure codegen bit arithmetic; the one range exchange happens
# at WRITE time like any lakehouse OPTIMIZE; reads are ordinary
# pushed-filter parquet scans that skip non-intersecting row groups
# via the footer stats the clustering tightened.
# ---------------------------------------------------------------------------

_Q99_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(CAST(SUM(l_extendedprice * (1 - l_discount))
            AS DECIMAL(28,10)), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-06-01 00:00:00'
                     AND TIMESTAMP '1996-12-31 00:00:00'
  AND l_partkey BETWEEN 200 AND 600
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

#: session → {normalized sf_dir → z-ordered lineitem path}; artifacts
#: outlive the call but die with the session (q64's weak-key pattern).
_Q99_PATHS: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def _q99_zordered_lineitem(spark: SparkSession, sf_dir: str) -> str:
    from cdc_example_spark.operators.zorder import write_zordered

    per_session = _Q99_PATHS.setdefault(spark, {})
    key = os.path.normpath(sf_dir)
    if key not in per_session:
        import time as _time

        from cdc_example_spark.queries.registry import record_session_build

        tag = hashlib.sha1(key.encode()).hexdigest()[:8]
        path = os.path.join(tempfile.mkdtemp(prefix=f"cdc_zorder_{tag}_"), "lineitem")
        li = load_table(spark, sf_dir, "lineitem", cache=False)
        t0 = _time.perf_counter()
        write_zordered(
            li,
            path,
            (
                F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")),
                F.col("l_partkey"),
            ),
            n_files=64,
        )
        record_session_build("zorder_lake_write", _time.perf_counter() - t0)
        per_session[key] = path
    return per_session[key]


@query("q99_zorder_box_scan", oracle=_Q99_ORACLE)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimension box scan over the Z-order-clustered lineitem."""
    path = _q99_zordered_lineitem(spark, sf_dir)
    li = spark.read.parquet(path)
    return (
        li.filter(
            F.col("l_shipdate").between("1996-06-01 00:00:00", "1996-12-31 00:00:00")
            & F.col("l_partkey").between(200, 600)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dec2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
        )
        .transform(small_result_order, "l_returnflag")
    )
