"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Timing = full execution + Arrow transfer of the complete result to the
Python driver (the work the user would wait for). Arrow (`toArrow`) is
the engine's supported result-transfer path — row-at-a-time collect()
would benchmark pickle, not the engine.

Each query runs three times, reported as three tiers so nothing hides:

- ``cold_total_sec``  — first run: plan build + codegen JIT + execute.
  Spark JIT-compiles generated code per plan shape, a one-time cost
  DuckDB-style interpreters don't pay.
- **headline** (``value`` / ``queries``) — second run, with the
  engine's prepared-plan cache invalidated first: a FRESH plan build +
  full distributed re-execution, and the round-over-round comparable
  number. One deliberate asymmetry vs the DuckDB comparison in
  BASELINE.md: Spark serves scans from its hot-table cache (a feature
  of the engine under test — every tier shares it) while DuckDB
  re-decodes parquet each run (~0.5 s of its sf0.1 total). Set
  SPARK_GRAFT_TABLE_CACHE=0 to bench the pure-scan path.
- ``resubmit_total_sec`` — third run through the registry's
  prepared-plan cache (queries/registry.py): planning skipped, and
  Spark reuses the prior run's shuffle files, so only the final stage
  and result transfer re-run. This is the serving-path latency for a
  repeated query, reported separately because it measures cache reuse,
  not fresh execution.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from cdc_example_spark.queries import all_queries, registry
    from cdc_example_spark.session import get_spark, scale_profile

    # size the runtime profile to the benched input (see session.py:
    # sub-GiB inputs run 8-way shuffles without AQE; cluster-scale
    # inputs keep the scale defaults)
    spark = get_spark("cdc_example_spark-bench", extra_conf=scale_profile(sf_dir))
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()

    def run(name: str) -> None:
        df = qs[name].spark(spark, sf_dir)
        try:
            df.toArrow()
        except Exception:
            df.collect()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    resubmit: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        run(name)
        cold[name] = round(time.perf_counter() - t0, 3)
        registry.invalidate(spark)  # time a fresh plan, not the memo
        t1 = time.perf_counter()
        run(name)
        timings[name] = round(time.perf_counter() - t1, 3)
        t2 = time.perf_counter()
        run(name)  # memoized plan + shuffle reuse
        resubmit[name] = round(time.perf_counter() - t2, 3)

    # CDC apply throughput (BASELINE T2) on the same session — 100k
    # synthetic Debezium envelopes through decode → route → MERGE.
    try:
        import bench_streaming

        cdc = bench_streaming.run(spark=spark, n_events=100_000)
        cdc_fields = {
            "cdc_apply_events_per_sec": cdc["value"],
            "cdc_batch_apply_p50_ms": cdc["batch_apply_p50_ms"],
        }
    except Exception as e:  # never let the T2 add-on kill the T1 report
        cdc_fields = {"cdc_apply_error": repr(e)[:200]}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared-query-set wall clock (steady-state, fresh plans)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total_sec": round(sum(cold.values()), 3),
                "resubmit_total_sec": round(sum(resubmit.values()), 3),
                **cdc_fields,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
