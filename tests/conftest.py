import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Isolate this pytest session's oracle fixtures: both sides of every
# oracle comparison (Spark writer + DuckDB reader) live in THIS process,
# so a pid-suffixed dir is always consistent — and two concurrent
# sessions (or a parallel bench.py) can no longer overwrite each other's
# fixtures mid-comparison (observed r12).  Must run before any import of
# queries_catalog, which bakes the path into its oracle SQL at import.
os.environ.setdefault(
    "OUTPOST_SPARK_ORACLE_FIXTURES", f"/tmp/outpost_spark_oracle_fix_{os.getpid()}"
)

from outpost_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("outpost-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --- slow-tier gating (r16, VERDICT r15 #2) -------------------------------
# The full suite outgrew the round driver's pytest window (55 min; the r15
# verify was truncated mid-run at ~58% with zero failures).  Tests marked
# ``slow`` — the model-randomized / e2e tests measured >= ~19 s each, ~25
# min of the total — are skipped unless SPARK_GRAFT_SLOW_TESTS=1, which the
# verify skill sets.  The oracle-parity suite is NOT tiered: it is the
# correctness gate and stays in the default run in full.


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >=~19s model-randomized/e2e test; skipped unless "
        "SPARK_GRAFT_SLOW_TESTS=1 (the verify skill sets it)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS", "") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if item.get_closest_marker("slow"):
            item.add_marker(skip)
