"""Mirror of the driver's Spark-vs-DuckDB comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column-name set, and canonical
values — the same discipline as CORRECTNESS_r{N}.json, so a green test
here predicts a driver hash match.

Fidelity note (round-1 post-mortem): the driver's hash is sensitive to
the *fetched representation*, not just the value — DuckDB DECIMAL(18,2)
keeps trailing-zero cents ('248095.00') where a double prints
'248095.0', and DuckDB SUM(BIGINT) yields HUGEINT which lands in pandas
as float64 ('6.0') against Spark's int64 ('6'). Round 1's harness
stringified Decimals identically on both sides and was green while the
driver was red. This version therefore (a) fetches BOTH sides through
pandas, the representation-lossy path, and (b) canonicalizes with the
value's type CLASS (int-kind vs float-kind vs Decimal vs other), so any
int/float/Decimal skew between the engines fails locally.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import numpy as np

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _cell(v) -> str:
    """Type-class-tagged canonical form.

    int-kind and float-kind values of equal magnitude must NOT collide
    ('i:6' vs 'f:6.0' — the HUGEINT trap), and Decimal must keep its
    scale ('dec:248095.00' — the trailing-zero trap). Int *width*
    (int32 vs int64) intentionally collapses: the driver tolerates it
    (q37's rank columns hash-matched in round 1 with Spark int32 vs
    DuckDB int64).
    """
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else f"f:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if v is not v:  # pandas NaT and other non-reflexive missings
        return "NULL"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Columns sorted by name, every value stringified, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _pandas_rows(df) -> tuple[list[str], list[tuple]]:
    """DataFrame → (columns, row tuples) keeping per-value numpy/object
    types (``itertuples`` preserves dtype per cell; ``values`` would
    upcast the whole block)."""
    cols = [str(c) for c in df.columns]
    rows = [tuple(t[1:]) for t in df.itertuples(name=None)]
    return cols, rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    s_cols, s_rows = _pandas_rows(spark_df.toPandas())
    d_cols, d_rows = _pandas_rows(con.execute(sql).df())

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, duckdb): {diffs}")
