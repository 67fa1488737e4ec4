"""Retention / TTL maintenance (ST6) over the month-partitioned tables.

Reference: internal/logretention/ttl.go:27-68 + clickhouse_ttl.go — a
desired-vs-applied TTL (in days) is diffed and applied as ``ALTER TABLE
... TTL``; ClickHouse then drops expired parts asynchronously.  The
Parquet analogue operates on the ``month=YYYYMM`` partition layout written
by insert.py:

- whole months strictly older than the cutoff month are dropped as entire
  partition directories (cheap: no data read — the exact analogue of
  ClickHouse dropping whole parts);
- the cutoff month itself is rewritten with ``time >= cutoff`` (only one
  partition is ever rewritten per run);
- newer months are untouched.

At scale this is the standard "delete by partition" pattern: the job's
I/O is bounded by one month of data regardless of table size.  On Delta
Lake the same policy is ``DELETE WHERE time < cutoff`` + ``VACUUM``.

``compact_partition`` is the companion maintenance op: rewrite one
partition into ``target_files`` files (micro-batch streaming writes leave
many small files; compaction restores scan efficiency).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class RetentionReport:
    dropped_partitions: list[str]
    rewritten_partition: str | None
    rows_deleted: int


def _month_partitions(table_path: str) -> list[str]:
    if not os.path.isdir(table_path):
        return []
    return sorted(
        d for d in os.listdir(table_path) if d.startswith("month=")
    )


def apply_retention(
    spark: SparkSession,
    table_path: str,
    *,
    time_col: str,
    ttl_days: int,
    now: datetime | None = None,
) -> RetentionReport:
    """Enforce ``time >= now - ttl_days`` on a month-partitioned table.

    Mirrors logretention's desired-TTL semantics (ttl.go:27-41): rows older
    than the cutoff cease to be visible; whole expired months are dropped
    without reading them.
    """
    if ttl_days <= 0:
        return RetentionReport([], None, 0)
    now = now or datetime.now(timezone.utc)
    cutoff = now - timedelta(days=ttl_days)
    cutoff_month = cutoff.strftime("%Y%m")

    dropped: list[str] = []
    rewritten: str | None = None
    rows_deleted = 0

    for part in _month_partitions(table_path):
        month = part.split("=", 1)[1]
        part_path = os.path.join(table_path, part)
        if month < cutoff_month:
            # count is cheap (parquet footer metadata only)
            rows_deleted += spark.read.parquet(part_path).count()
            shutil.rmtree(part_path)
            dropped.append(part)
        elif month == cutoff_month:
            df = spark.read.parquet(part_path)
            total = df.count()
            kept = df.filter(F.col(time_col) >= F.lit(cutoff))
            kept_count = kept.count()
            if kept_count < total:
                tmp = part_path + "._retention_tmp"
                kept.write.mode("overwrite").parquet(tmp)
                shutil.rmtree(part_path)
                os.rename(tmp, part_path)
                rewritten = part
                rows_deleted += total - kept_count
    return RetentionReport(dropped, rewritten, rows_deleted)


def compact_partition(
    spark: SparkSession, table_path: str, month: str, *, target_files: int = 1
) -> int:
    """Rewrite one month partition into ``target_files`` files.

    Returns the number of input files compacted.  Streaming micro-batches
    append a file per trigger per task; compaction keeps the file count
    (and thus scan/task overhead) bounded.
    """
    part_path = os.path.join(table_path, f"month={month}")
    if not os.path.isdir(part_path):
        return 0
    n_files = sum(
        1
        for f in os.listdir(part_path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    if n_files <= target_files:
        return 0
    df = spark.read.parquet(part_path)
    tmp = part_path + "._compact_tmp"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(part_path)
    os.rename(tmp, part_path)
    return n_files
