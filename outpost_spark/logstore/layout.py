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


def zorder_expr(df: DataFrame, cols: list[str], *, bits: int = 8):
    """Z-order (Morton) key over ``cols`` as a Column — the multi-column
    clustering key Delta's ``OPTIMIZE ZORDER BY`` sorts by.

    A single-key sort (``optimize_partition``) gives tight row-group
    stats on ONE column and destroys them on every other; interleaving
    the bits of per-column ranks gives every listed column locality
    proportional to its bit share, so pushed filters on ANY of them
    prune row groups.  Per-column normalization to ``2**bits`` ranks:

    - numeric/timestamp columns: approx-quantile range ids (equi-depth,
      Delta's range_partition_id shape — robust to value skew, computed
      once driver-side from a bounded-error sketch);
    - string columns: the same equi-depth ranking over an ORDER-
      PRESERVING numeric proxy (first 8 codepoints, base-256) — hashing
      would spread lexicographically-adjacent values across ranks and a
      row group's STRING min/max stats would then span the whole
      domain, silently disabling the very pruning this exists for
      (measured: equality skip fraction 0.0 under hash ranks);
    - other types: ``xxhash64 mod 2**bits`` (no stats story; documented
      fallback).

    The interleave is pure integer shifts/ors — whole-stage codegen, no
    Python; ``bits * len(cols)`` must fit a long (<= 63).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if bits * len(cols) > 63:
        raise ValueError(f"bits*cols = {bits * len(cols)} exceeds a long")
    n = 1 << bits
    ranks = []
    for c in cols:
        dt = df.schema[c].dataType
        rankable = isinstance(
            dt,
            (
                T.NumericType,
                T.TimestampType,
                T.TimestampNTZType,
                T.DateType,
                T.StringType,
            ),
        )
        if rankable:
            if isinstance(dt, T.NumericType):
                num = F.col(c).cast("double")
            elif isinstance(dt, T.StringType):
                # order-preserving numeric proxy: first 8 codepoints,
                # base 256 (exact for ASCII prefixes; ties collapse to
                # one rank, which only merges adjacent values)
                num = F.lit(0.0)
                for i in range(1, 9):
                    num = num * 256.0 + F.coalesce(
                        F.least(F.ascii(F.substring(F.col(c), i, 1)), F.lit(255)),
                        F.lit(0),
                    )
            elif isinstance(dt, T.DateType):
                num = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
            else:
                num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
            probe = (
                df.select(num.alias("__v")).where(F.col("__v").isNotNull())
            )
            qs = [i / n for i in range(1, n)]
            bounds = sorted(set(probe.approxQuantile("__v", qs, 0.001)))
            # rank = #boundaries strictly below the value (one array
            # filter over the literal boundary list), then SCALED to the
            # full 2**bits domain: a low-cardinality column would
            # otherwise occupy only the rank's low bits, and since the
            # interleave gives the HIGH bits the coarse clustering
            # power, its values would barely cluster at all (measured:
            # 16 tenants at ranks 0-15 -> tenant skip fraction 0.0)
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            # bind num as a lambda VARIABLE via a one-element transform
            # (dedup.py:189's idiom): a lambda that captures the outer
            # EXPRESSION re-evaluates it per boundary element in the
            # interpreted HOF — for the string rank proxy that's the
            # 8-term ascii chain × up to 2**bits-1 boundaries per row
            # (ADVICE r07)
            rank = F.element_at(
                F.transform(
                    F.array(num),
                    lambda v: F.size(F.filter(arr, lambda b: v > b)),
                ),
                1,
            )
            scale = n / float(len(bounds) + 1)
            rank = F.floor(rank.cast("double") * F.lit(scale)).cast("long")
            ranks.append(
                F.least(F.coalesce(rank, F.lit(0)), F.lit(n - 1)).cast("long")
            )
        else:
            ranks.append(
                F.pmod(F.xxhash64(F.col(c)), F.lit(n)).cast("long")
            )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def zorder_partition(
    spark: SparkSession,
    table_path: str,
    month: str,
    *,
    zorder_cols: list[str],
    bits: int = 8,
    target_files: int = 1,
    writer_options: dict | None = None,
) -> int:
    """Rewrite one month partition clustered by the Z-order key of
    ``zorder_cols`` — ``optimize_partition``'s multi-column sibling
    (Delta ``OPTIMIZE ZORDER BY`` analog), same journaled crash-safe
    swap.  After the rewrite, pushed filters on EACH listed column skip
    most row groups at footer time (pyarrow-stat-asserted in tests),
    where a single-key sort only serves its first column.  Returns the
    number of input files rewritten (0 if the partition is absent)."""
    from outpost_spark.fsutil import maintenance_fs
    from outpost_spark.logstore.retention import _recover_partials, _swap_partition

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
    df = spark.read.parquet(fs.path_str(part))
    z = zorder_expr(df, zorder_cols, bits=bits)
    tmp = fs.path_str(f"_tmp_zorder_{part}")
    writer = (
        df.withColumn("__z", z)
        # range-partition on z so FILES are disjoint z-slabs too, not
        # just row groups within a file
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(tmp)
    _swap_partition(table_path, part, tmp, spark)
    return n_files
