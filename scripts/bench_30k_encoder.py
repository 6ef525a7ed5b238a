"""VERDICT r9 item 6 — the vocab encoder at a REAL 30k-merge table.

Produces the SCALE.md §6-r10 rows. Honesty first: the driver corpus's
vocabulary is tiny (31 distinct words at sf0.1; 31·K at the k-shards
because copies are token-prefixed), so the corpus itself EXHAUSTS after
a few hundred trainable merges — measured below, that is the real
ceiling of "train on this corpus". The 30k-merge condition therefore
runs on a merge table TRAINED by the classic BPE algorithm
(queries/relevance.train_bpe_merges — count-desc/pair-asc tie-break,
replace-chain apply semantics) over a 40k-word Zipf-weighted synthetic
vocabulary, which is the production shape: a real web corpus's word
table at 100 TB is ~10⁷ rows and trains 30k+ merges driver-side in
exactly this code path.

Measured tiers:
  t_train_corpus     train-to-exhaustion on the k-shard word table
  t_train_30k        30k merges over the 40k-word synthetic table
  chain per-word     replace-chain UDF cost/word at 1k/5k/30k merges
                     (sampled — the measured ceiling; O(merges)/word)
  rank full-dict     rank-dict UDF over the FULL dictionary at 30k
                     (depth-independent; the declared production tier)
  parity             chain == rank on a 256-word sample at 30k merges
  q112 e2e           the q112-shaped corpus encode on the k-shard
                     through the rank UDF at the corpus ceiling table

Run: python scripts/bench_30k_encoder.py [k]   (default k=10; shard
must already exist under $SPARK_GRAFT_SCALE_ROOT — bench_scaling.py
generates it).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/sparkgraft_scale")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    shard = os.path.join(ROOT, f"k{k}")
    assert os.path.exists(os.path.join(shard, "_DONE")), f"no shard at {shard}"

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cdc_example_spark.queries.relevance import (
        bpe_word_subtoken_counts_rank_udf,
        bpe_word_subtoken_counts_udf,
        train_bpe_merges,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"k": k}

    # ---- 1. corpus ceiling: collect word table, train to exhaustion
    docs = spark.read.parquet(os.path.join(shard, "documents.parquet"))
    t0 = time.time()
    wf_rows = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    t_collect = time.time() - t0
    wf = [(r["word"], r["freq"]) for r in wf_rows]
    t0 = time.time()
    corpus_merges = train_bpe_merges(wf, 10_000_000)
    t_train_corpus = time.time() - t0
    out.update(
        vocab=len(wf),
        t_word_table_sec=round(t_collect, 2),
        corpus_merge_ceiling=len(corpus_merges),
        t_train_corpus_sec=round(t_train_corpus, 2),
    )
    print(f"[1] k={k} shard vocab={len(wf)} word-table collect {t_collect:.2f}s; "
          f"corpus trains {len(corpus_merges)} merges (EXHAUSTED) in {t_train_corpus:.2f}s",
          flush=True)

    # ---- 2. synthetic 40k-word Zipf table → 30k TRAINED merges
    rng = np.random.default_rng(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    n_words = 40_000
    words = []
    seen = set()
    while len(words) < n_words:
        ln = int(rng.integers(6, 14))
        w = "".join(alpha[i] for i in rng.integers(0, 26, ln))
        if w not in seen:
            seen.add(w)
            words.append(w)
    freqs = (1.0 / np.arange(1, n_words + 1)) ** 1.1  # Zipf
    freqs = np.maximum((freqs * 1e6).astype(int), 1)
    syn_wf = list(zip(words, freqs.tolist()))
    t0 = time.time()
    merges30k = train_bpe_merges(syn_wf, 30_000)
    t_train_30k = time.time() - t0
    out.update(n_words_syn=n_words, merges_trained=len(merges30k),
               t_train_30k_sec=round(t_train_30k, 2))
    print(f"[2] trained {len(merges30k)} merges over {n_words} synthetic words "
          f"in {t_train_30k:.2f}s", flush=True)
    assert len(merges30k) >= 30_000, "synthetic vocab exhausted early"

    dict_df = spark.createDataFrame([(w,) for w in words], "word string").repartition(
        int(CPUS)
    ).localCheckpoint(eager=True)
    sample_words = words[:: max(1, n_words // 256)][:256]
    sample_df = spark.createDataFrame(
        [(w,) for w in sample_words], "word string"
    ).coalesce(4).localCheckpoint(eager=True)

    # ---- 3. replace-chain ceiling: per-word cost vs merge depth (sampled)
    chain_rows = []
    for depth in (1_000, 5_000, 30_000):
        udf = bpe_word_subtoken_counts_udf(merges30k[:depth])
        t0 = time.time()
        sample_df.select(udf(F.col("word")).alias("n")).agg(F.sum("n")).collect()
        dt = time.time() - t0
        per_word_ms = 1000.0 * dt / len(sample_words)
        chain_rows.append({"depth": depth, "wall_sec": round(dt, 2),
                           "per_word_ms": round(per_word_ms, 3)})
        print(f"[3] chain @ {depth} merges: {dt:.2f}s for {len(sample_words)} words "
              f"→ {per_word_ms:.3f} ms/word "
              f"(full 40k dict projects to {dt * n_words / len(sample_words) / 60:.1f} min)",
              flush=True)
    out["chain_sampled"] = chain_rows

    # ---- 4. rank encoder: FULL dictionary at 30k merges
    rank_udf = bpe_word_subtoken_counts_rank_udf(merges30k)
    t0 = time.time()
    total = dict_df.select(rank_udf(F.col("word")).alias("n")).agg(F.sum("n")).collect()[0][0]
    t_rank = time.time() - t0
    out.update(rank_full_dict_sec=round(t_rank, 2),
               rank_per_word_us=round(1e6 * t_rank / n_words, 1),
               rank_total_subtokens=int(total))
    print(f"[4] rank @ 30k merges, FULL {n_words}-word dict: {t_rank:.2f}s "
          f"({1e6 * t_rank / n_words:.1f} µs/word), Σsubtokens={total}", flush=True)

    # ---- 5. parity: chain == rank on the sample at 30k merges
    chain_udf = bpe_word_subtoken_counts_udf(merges30k)
    diff = (
        sample_df.select(
            "word",
            chain_udf(F.col("word")).alias("a"),
            rank_udf(F.col("word")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    out["parity_diff_at_30k"] = int(diff)
    print(f"[5] parity chain-vs-rank on {len(sample_words)} words @30k: {diff} diffs",
          flush=True)
    assert diff == 0

    # ---- 6. q112-shaped e2e on the shard: corpus explode + (lang,word)
    # agg + dictionary encode through the rank UDF at the CORPUS table
    corpus_udf = bpe_word_subtoken_counts_rank_udf(corpus_merges)
    t0 = time.time()
    enc = (
        docs.select("lang", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("lang", "cnt", corpus_udf(F.col("word")).alias("n_sub"))
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sub")).alias("n_sub_total"),
        )
        .collect()
    )
    t_e2e = time.time() - t0
    out.update(q112_e2e_sec=round(t_e2e, 2), q112_langs=len(enc))
    print(f"[6] q112-shaped shard encode (corpus {len(corpus_merges)}-merge table, "
          f"rank UDF): {t_e2e:.2f}s over {len(enc)} langs", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
