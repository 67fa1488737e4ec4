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

All directory manipulation goes through :mod:`outpost_spark.fsutil`, so
retention and compaction work against any warehouse scheme the cluster
can read (local, ``file://``, ``hdfs://``, ``s3a://`` — see fsutil's
rename-atomicity note for object stores).

``compact_partition`` is the companion maintenance op: rewrite one
partition into ``target_files`` files (micro-batch streaming writes leave
many small files; compaction restores scan efficiency).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from outpost_spark.fsutil import maintenance_fs


@dataclass
class RetentionReport:
    dropped_partitions: list[str]
    rewritten_partition: str | None
    rows_deleted: int


def _month_partitions(table_path: str, spark: SparkSession | None = None) -> list[str]:
    fs = maintenance_fs(table_path, spark)
    return [d for d in fs.listdir() if d.startswith("month=")]


def _dir_complete(fs, name: str, manifest: dict[str, int]) -> bool:
    """True iff directory ``name`` holds AT LEAST every manifest file at
    its recorded size (a completed copy may coexist with extra cruft, but
    a partial copy is always missing bytes or whole files)."""
    if not manifest:
        return fs.is_dir(name)
    have = fs.file_sizes(name)
    return all(have.get(f) == size for f, size in manifest.items())


def _recover_partials(table_path: str, spark: SparkSession | None = None) -> None:
    """Crash recovery for partition rewrites (run before any maintenance).

    Rewrites stage into ``_tmp_*`` and swap via ``_trash_*`` (both
    underscore-prefixed so Spark's file listing and ``_month_partitions``
    ignore them), with a ``_swapjournal_<part>`` manifest written before
    the first rename (see :func:`_swap_partition`).

    Journaled recovery is sound even when ``rename`` is copy+delete
    (s3a): Hadoop deletes the rename source only after the whole copy
    succeeded, so "trash incomplete ⇒ live partition untouched" and
    "live partition partial ⇒ trash copy completed".  Decision tree per
    leftover journal (every branch idempotent — recovery itself may
    crash and rerun):

    - trash complete per the original's manifest:
        - partition complete per the NEW manifest -> the swap finished
          its second rename; roll FORWARD (drop trash + journal);
        - else -> roll BACK: drop the partial partition, restore trash.
    - trash absent/partial -> the original is still live and complete;
      roll BACK (drop trash + staging).

    Journal-less leftovers (pre-upgrade writers, or a journal write that
    itself crashed — in which case no rename has started) keep the
    original semantics: restore ``_trash_<part>`` when the partition is
    missing, else drop it; drop any ``_tmp_*`` staging dir.
    """
    import json

    fs = maintenance_fs(table_path, spark)
    entries = fs.listdir()
    for d in entries:
        if not d.startswith("_swapjournal_"):
            continue
        part = d[len("_swapjournal_"):]
        trash = f"_trash_{part}"
        try:
            j = json.loads(fs.read_text(d))
            orig_manifest = {k: int(v) for k, v in j["orig"].items()}
            new_manifest = {k: int(v) for k, v in j["new"].items()}
        except (OSError, ValueError, KeyError, TypeError):
            # unreadable journal: its write crashed, so no rename ever
            # started — the orphan pass below cleans staging dirs
            fs.delete(d)
            continue
        if fs.exists(trash) and _dir_complete(fs, trash, orig_manifest):
            if fs.exists(part) and _dir_complete(fs, part, new_manifest):
                fs.delete(trash)  # swap finished; roll forward
            else:
                if fs.exists(part):
                    fs.delete(part)  # partial copy of either side
                fs.rename([trash], [part])
        elif fs.exists(trash):
            fs.delete(trash)  # partial trash copy; original still live
        fs.delete(d)
    for d in fs.listdir():
        if d.startswith("_trash_"):
            part = d[len("_trash_"):]
            if not fs.exists(part):
                fs.rename([d], [part])
            else:
                fs.delete(d)
        elif d.startswith("_tmp_"):
            fs.delete(d)


def _swap_partition(table_path: str, part: str, tmp_path: str, spark: SparkSession | None = None) -> None:
    """Replace partition ``part`` with the staged rewrite at ``tmp_path``.

    Protocol: journal (manifests of both dirs) -> rename part out of the
    way -> rename staging in -> drop trash -> drop journal.  On atomic-
    rename filesystems every intermediate state is trivially recoverable;
    on copy+delete stores the journal's file-size manifests let
    :func:`_recover_partials` decide which side is complete (its
    docstring has the proof sketch).  Staging names are underscore-
    prefixed, so no intermediate state is ever visible to partition
    discovery.
    """
    import json

    fs = maintenance_fs(table_path, spark)
    trash = f"_trash_{part}"
    journal = f"_swapjournal_{part}"
    # tmp_path is a child of table_path by construction (staging names)
    tmp_name = tmp_path.rstrip("/").rsplit("/", 1)[-1]
    fs.write_text(
        [journal],
        json.dumps({"orig": fs.file_sizes(part), "new": fs.file_sizes(tmp_name)}),
    )
    fs.rename([part], [trash])
    fs.rename([tmp_name], [part])
    fs.delete(trash)
    fs.delete(journal)


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

    from outpost_spark.logstore.txntable import TxnTable

    if TxnTable.is_txn_table(table_path):
        # table-format branch: retention is ONE atomic commit (removes
        # for fully-expired files via footer stats — no data read —
        # plus rewritten boundary files); the journaled swap and its
        # crash-window recovery are structurally unnecessary here
        dropped, rewritten, rows = TxnTable(spark, table_path).delete_where_time(
            time_col, cutoff, keep_stats_cols=("month",)
        )
        return RetentionReport(
            [f"{dropped} expired files"] if dropped else [],
            f"{rewritten} boundary files" if rewritten else None,
            rows,
        )

    _recover_partials(table_path, spark)
    fs = maintenance_fs(table_path, spark)
    dropped: list[str] = []
    rewritten: str | None = None
    rows_deleted = 0

    for part in _month_partitions(table_path, spark):
        month = part.split("=", 1)[1]
        part_path = fs.path_str(part)
        if month < cutoff_month:
            # count is cheap (parquet footer metadata only)
            rows_deleted += spark.read.parquet(part_path).count()
            fs.delete(part)
            dropped.append(part)
        elif month == cutoff_month:
            df = spark.read.parquet(part_path)
            total = df.count()
            kept = df.filter(F.col(time_col) >= F.lit(cutoff))
            kept_count = kept.count()
            if kept_count < total:
                tmp = fs.path_str(f"_tmp_retention_{part}")
                kept.write.mode("overwrite").parquet(tmp)
                _swap_partition(table_path, part, tmp, spark)
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
    from outpost_spark.logstore.txntable import TxnTable

    if TxnTable.is_txn_table(table_path):
        return TxnTable(spark, table_path).compact(
            target_files=target_files,
            stats_filter={"month": (month, month)},
            stats_cols=("month",),
        )

    _recover_partials(table_path, spark)
    fs = maintenance_fs(table_path, spark)
    part = f"month={month}"
    if not fs.is_dir(part):
        return 0
    n_files = sum(
        1
        for f in fs.list_files(part)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    if n_files <= target_files:
        return 0
    df = spark.read.parquet(fs.path_str(part))
    tmp = fs.path_str(f"_tmp_compact_{part}")
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    _swap_partition(table_path, part, tmp, spark)
    return n_files
