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
