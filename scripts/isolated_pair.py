"""Isolated same-day engine pair for ONE query at a scale shard.

The drift-bounding discipline from SCALE.md §4b-r9: run the Spark side
alone (fresh session, nothing else on the host), then the DuckDB
oracle alone, 3 samples each, and report medians. Used when a standing
ratio moves on unchanged code — it separates engine regressions from
in-suite session accumulation and host drift.

Run (ALONE on the host): python scripts/isolated_pair.py q41_percentiles 100
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/sparkgraft_scale")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    name = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    shard = os.path.join(ROOT, f"k{k}")
    assert os.path.exists(os.path.join(shard, "_DONE")), f"no shard at {shard}"

    from pyspark.sql import SparkSession

    from cdc_example_spark.queries import all_queries
    from cdc_example_spark.queries import registry

    q = all_queries()[name]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm (OS cache + JIT), then timed samples with a fresh plan each
    q.spark(spark, shard).collect()
    s_times = []
    for _ in range(samples):
        registry.invalidate(spark)
        t0 = time.perf_counter()
        q.spark(spark, shard).collect()
        s_times.append(time.perf_counter() - t0)
    spark.stop()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(shard, t + '.parquet')}'"
        )
    con.execute(q.oracle).fetchdf()  # warm
    d_times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        con.execute(q.oracle).fetchdf()
        d_times.append(time.perf_counter() - t0)
    con.close()

    sm, dm = statistics.median(s_times), statistics.median(d_times)
    print(json.dumps({
        "query": name, "k": k,
        "spark_samples": [round(x, 2) for x in s_times],
        "duckdb_samples": [round(x, 2) for x in d_times],
        "spark_median": round(sm, 2), "duckdb_median": round(dm, 2),
        "ratio": round(sm / dm, 3),
    }))


if __name__ == "__main__":
    main()
