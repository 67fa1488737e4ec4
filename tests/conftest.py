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
