"""Write-layout helpers: bucketed tables for co-located joins.

At 100 TB the dominant cost of the event⨝attempt reconstruction join
(J1/J2 family) is the shuffle of both fact tables.  The log store
already materializes the join at write time (insert.py) for the hot
read path; for everything else — ad-hoc joins, backfills, re-matching
attempts to re-ingested events — the standard Spark answer is Hive-style
bucketing: both tables pre-hash-partitioned into the same number of
buckets on the join key at WRITE time, so a later equi-join on that key
is planned as a zero-Exchange sort-merge join (each task reads bucket i
of both sides).  One shuffle paid once at ingest, amortized over every
subsequent join, aggregation, or dedup keyed on the bucket column.

Reference anchor: the ClickHouse layout's ORDER BY (tenant_id, time)
primary key (internal/logstore/chlogstore/schema.go) serves the same
purpose — physically co-locating rows by the dominant access key;
bucketing is Spark's durable equivalent (``spark.table`` exposes the
bucket spec to the planner via the catalog, which plain parquet paths
cannot).

Scale notes:
- Bucket count is a layout-time commitment: pick ~(largest expected
  table size / healthy task input), and the SAME count on every table
  that will join.  AQE cannot split a skewed bucket of a bucketed scan,
  so extreme key skew wants salting at write or more buckets.
- ``sortBy`` within buckets lets the sort-merge join skip its sort
  stage entirely (SortExec disappears too, not just the Exchange).
- Bucket pruning: equality filters on the bucket column prune to one
  bucket's files at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Bucketing metadata only exists in the session catalog, so this goes
    through ``saveAsTable`` — ``path`` makes it an external table on any
    warehouse scheme (the parquet files remain plain parquet readable by
    anything; only the bucket GUARANTEE needs the catalog entry).
    """
    writer = df.write.format("parquet").mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    The ``merge`` hint pins sort-merge (a broadcast would silently hide
    whether co-location worked); with matching bucket specs the planned
    join has NO Exchange on either side — asserted in tests via the
    physical plan, which is the property that makes this free at 100 TB.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)


def optimize_partition(
    spark: SparkSession,
    table_path: str,
    month: str,
    *,
    sort_cols: list[str],
    target_files: int = 1,
    writer_options: dict | None = None,
) -> int:
    """Rewrite one month partition SORTED by ``sort_cols`` — the plain-
    parquet analog of the reference's ClickHouse ``ORDER BY (tenant_id,
    time)`` primary key (internal/logstore/chlogstore schema).

    Parquet row-group min/max stats only prune when values are
    CLUSTERED: a partition written from unsorted micro-batches has every
    tenant in every row group, so a tenant-filtered scan reads all of
    them.  After this rewrite each row group covers a tight, mostly
    disjoint sort-key range and pushed equality/range filters skip
    non-matching groups at footer time — measured in tests via pyarrow
    row-group statistics (disjoint tenant ranges) rather than timing.

    Uses the retention machinery's journaled crash-safe swap; combine
    with ``compact_partition``'s scheduling (run after compaction, or
    instead of it — this rewrite also compacts).  Returns the number of
    input files rewritten (0 if the partition is absent).
    """
    from outpost_spark.logstore.retention import _recover_partials, _swap_partition

    _recover_partials(table_path, spark)
    from outpost_spark.fsutil import maintenance_fs

    fs = maintenance_fs(table_path, spark)
    part = f"month={month}"
    if not fs.is_dir(part):
        return 0
    n_files = sum(
        1
        for f in fs.list_files(part)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    df = spark.read.parquet(fs.path_str(part))
    tmp = fs.path_str(f"_tmp_optimize_{part}")
    writer = (
        df.repartition(target_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(tmp)
    _swap_partition(table_path, part, tmp, spark)
    return n_files
