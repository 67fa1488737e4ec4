"""InsertMany — the write path for the denormalized events/attempts tables.

Reference semantics:
- Dedupe the incoming batch by attempt_id, last occurrence wins at first
  position (driver/driver.go:94-106).
- Event rows are emitted only for attempts with attempt_number <= 1, one per
  event_id (chlogstore.go:774-784).
- Both tables are month-partitioned on their time column
  (``PARTITION BY toYYYYMM(event_time)``, clickhouse/000001_init.up.sql:24,55)
  — at 100 TB this is what makes every time-bounded query prune to the
  touched months, and makes retention (ST6) a partition drop.

Spark-first: the whole batch is one DataFrame; dedup is ``row_number() over
(partition by id order by ordinal desc)`` (last-wins, matching the
reference's map-overwrite), and writes are dynamic-partition-overwrite-safe
appends.  No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_last_wins(df: DataFrame, key: str, ordinal: str | None = None) -> DataFrame:
    """Batch dedup by ``key``; last occurrence wins (driver/driver.go:94-106).

    With no ``ordinal`` column the choice among duplicates is arbitrary
    (the reference notes duplicate payloads are byte-identical, so either
    row is correct); pass an ordinal for strict last-wins.
    """
    if ordinal is None:
        return df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.col(ordinal).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def split_log_entries(entries: DataFrame, ordinal: str | None = None):
    """LogEntry batch -> (events_rows, attempts_rows).

    ``entries`` carries the denormalized attempt schema (event columns
    embedded — models/tasks.go:99-103).  Returns the two DataFrames the
    reference inserts (chlogstore.go:764-884):

    - attempts: one row per unique attempt_id.
    - events:   attempts with attempt_number <= 1, one row per event_id.
    """
    attempts = dedupe_last_wins(entries, "attempt_id", ordinal)
    if "matched_destination_ids" in entries.columns:
        matched = F.coalesce(
            F.col("matched_destination_ids"), F.array(F.col("destination_id"))
        ).alias("matched_destination_ids")
    else:
        matched = F.array(F.col("destination_id")).alias("matched_destination_ids")
    events = dedupe_last_wins(
        attempts.filter(F.col("attempt_number") <= 1), "event_id", ordinal
    ).select(
        "event_id",
        "tenant_id",
        "destination_id",
        matched,
        "topic",
        "eligible_for_retry",
        "event_time",
        "metadata",
        "data",
    )
    return events, attempts


def with_month_partition(df: DataFrame, time_col: str) -> DataFrame:
    """Add the physical partition column (mirrors ``toYYYYMM``)."""
    return df.withColumn("month", F.date_format(F.col(time_col), "yyyyMM"))


def insert_many(
    entries: DataFrame,
    events_path: str,
    attempts_path: str,
    ordinal: str | None = None,
    storage: str = "parquet",
    app_txn: tuple[str, int] | None = None,
) -> None:
    """Write one LogEntry micro-batch into the two partitioned tables.

    Append-only + read-side dedup mirrors the ReplacingMergeTree model
    (chlogstore/README.md:29-36): duplicates across batches are collapsed by
    ``countDistinct`` in metrics and ``dropDuplicates`` before list limits.

    ``storage`` selects the table layout — the same rows through either:

    - ``"parquet"``: Hive month-partitioned directories (retention =
      directory drops guarded by the journaled swap).
    - ``"txn"``: transaction-log tables (:mod:`.txntable`) — atomic
      commits, concurrent-writer safety, time travel; the month column
      becomes a regular clustered column with footer stats in the log
      (pruning at plan time, retention as a log operation; no journaled
      swap needed because there is no swap).
    """
    events, attempts = split_log_entries(entries, ordinal)
    ev = with_month_partition(events, "event_time")
    at = with_month_partition(attempts, "attempt_time")
    if storage == "txn":
        from outpost_spark.logstore.txntable import TxnTable

        spark = entries.sparkSession
        # per-table writer transactions: each table is exactly-once
        # independently, so a crash between the two appends replays into
        # a no-op on the first and a fresh commit on the second
        TxnTable.get_or_create(spark, events_path, ev.schema).append(
            ev,
            cluster_by="month",
            stats_cols=("event_time",),
            app_txn=(f"{app_txn[0]}::events", app_txn[1]) if app_txn else None,
        )
        TxnTable.get_or_create(spark, attempts_path, at.schema).append(
            at,
            cluster_by="month",
            stats_cols=("attempt_time",),
            app_txn=(f"{app_txn[0]}::attempts", app_txn[1]) if app_txn else None,
        )
        return
    if storage != "parquet":
        raise ValueError(f"storage must be 'parquet' or 'txn', got {storage!r}")
    ev.write.mode("append").partitionBy("month").parquet(events_path)
    at.write.mode("append").partitionBy("month").parquet(attempts_path)
