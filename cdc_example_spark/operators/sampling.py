"""Deterministic sampling operators.

A training pipeline needs samples that are REPRODUCIBLE — the same
rows on any engine, any partitioning, any day — which rules out
``rand()``/``TABLESAMPLE`` (both are partitioning-dependent). The
trick here is the same one queries/batch.q43 uses for the train/val/
test split: a Knuth multiplicative hash of the stable row key is a
deterministic stand-in for a uniform random draw.

``stratified_sample_k`` is the deterministic twin of per-stratum
reservoir sampling: taking the k smallest hash values per stratum is
exactly "reservoir sample of size k" with the hash as the random
tape. Scale shape: the rank-filtered window executes with
WindowGroupLimit (Spark ≥3.5), so each map task keeps only its local
top-k rows per stratum before the shuffle — state is O(k·strata) per
task, never the stratum itself. Low-cardinality strata (the usual
case: language, source, label) would make a naive global sort per
stratum a straggler at 100 TB; the group-limit prune is what keeps
the operator viable there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Same overflow-safe multiplicative-hash constants as q43's split
#: (queries/batch.py): split the key so every intermediate stays far
#: inside int64. The +SALT decorrelates this operator's draw from the
#: train/val/test split's — a row's sample membership must not predict
#: its split bucket.
_MOD = 1_000_003
_MULT_LO = 2_654_435_761
_MULT_HI = 40_503
_SALT = 987_654_321
_BUCKETS = 1_048_576


def sample_hash(key_col: str) -> Column:
    """Deterministic uniform-ish draw in [0, 2^20) from a NON-NEGATIVE
    int64 key column (same overflow argument as q43: lo ≤ 2.7e15,
    hi ≤ 3.7e17, sum far inside int64; negative keys are out of
    contract because Spark DIV truncates where DuckDB // floors).
    Integer DIV has no pyspark.sql.functions Column form, hence the
    name-based signature."""
    key = F.col(key_col)
    lo = (key % _MOD) * F.lit(_MULT_LO)
    hi = F.expr(f"`{key_col}` DIV {_MOD}") * F.lit(_MULT_HI)
    return (lo + hi + _SALT) % _BUCKETS


def stratified_sample_k(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``k`` rows per stratum (all rows if the stratum is
    smaller), chosen by the k smallest sample-hash values.

    Output carries ``rnk`` (1..k within the stratum, in draw order) so
    a downstream consumer can take a nested sub-sample (rows with
    rnk ≤ j are THE deterministic j-sample) without re-hashing.
    """
    h = sample_hash(key_col)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col))
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
