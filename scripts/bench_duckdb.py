"""DuckDB-side timings for the declared query set (BASELINE.md comparison).

Runs every oracle SQL string from __spark_entry__.oracle_sql() against the
same parquet tables at $SPARK_GRAFT_SF_DIR (default sf0.1) and prints one
JSON line {"value": total_sec, "queries": {...}}.  Timing = execute +
fetch (df()), the same "user waits for the full result" window bench.py
measures on the Spark side.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import duckdb_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb_con(sf_dir)
    oracles = entry.oracle_sql()
    timings: dict[str, float] = {}
    for name in sorted(oracles):
        sql = oracles[name]
        con.execute(sql).df()  # warm (buffer pool, plan cache parity with bench.py)
        t0 = time.perf_counter()
        con.execute(sql).df()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"value": round(sum(timings.values()), 3), "unit": "sec", "queries": timings}))


if __name__ == "__main__":
    main()
