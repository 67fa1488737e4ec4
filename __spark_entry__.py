"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.

Conventions for oracle parity:
- Aggregate/computed columns are aliased identically on both sides.
- Time buckets are emitted as **epoch seconds (BIGINT)** on both sides —
  sidesteps timestamp-tz representation differences between engines.
- Noisy doubles are rounded to 4 decimals on both sides before hashing.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from outpost_spark import queries_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly attempt-metrics style rollup over sf0.001 events.

    Exercises the whole OLAP spine — scan, time filter, epoch-aligned
    bucketing, conditional distinct counts, error-rate ratio, gap fill.
    """
    return queries_catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    return queries_catalog.oracle_sql()
