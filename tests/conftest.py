from __future__ import annotations

import json
import os
import re

import pytest

SF_SMOKE = os.environ.get("CDC_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Streaming-suite report (VERDICT r3 item 7): when
# CDC_SPARK_STREAMING_REPORT=<path> is set, collect the S1–S8 test
# outcomes and write them as JSON at session end — the machine-visible
# twin of CORRECTNESS_r{N}.json for the streaming half of the engine.
# scripts/streaming_report.py drives this and merges CDC throughput.
# ---------------------------------------------------------------------------

_S_TEST = re.compile(r"test_(s[1-9]\d?)_")
_S_RESULTS: dict[str, dict[str, str]] = {}


def pytest_runtest_logreport(report):
    m = _S_TEST.search(report.nodeid)
    if not m:
        return
    # ADVICE r4: record setup/teardown failures too — a fixture error
    # never produces a 'call' report, and the suite flag must not read
    # green when the test never ran. 'call' outcomes win; other phases
    # only contribute their failures.
    if report.when != "call" and not report.failed:
        return
    suite = _S_RESULTS.setdefault(m.group(1).upper(), {})
    suite[report.nodeid] = report.outcome if report.when == "call" else "failed"


def pytest_sessionfinish(session, exitstatus):
    out = os.environ.get("CDC_SPARK_STREAMING_REPORT")
    if not out or not _S_RESULTS:
        return
    suites = {
        label: {
            "passed": all(o == "passed" for o in tests.values()),
            "tests": dict(sorted(tests.items())),
        }
        for label, tests in sorted(_S_RESULTS.items())
    }
    with open(out, "w") as f:
        json.dump({"suites": suites}, f, indent=2)


@pytest.fixture(scope="session")
def spark():
    from cdc_example_spark.session import get_spark

    s = get_spark("cdc_example_spark-tests", shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
