"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the configs below are chosen so the same
plans scale to a multi-executor cluster:

- UTC session timezone: all reference bucket math is UTC
  (internal/logstore/bucket/bucket.go:30).
- AQE on: runtime coalescing of shuffle partitions + skew-join handling
  replace hand-tuned partition counts at 100 TB.
- Arrow on: every Pandas-UDF boundary (filter-language fallback, multimodal
  decode) transfers columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "outpost-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the Spark default, kept as OUR default so
        # bench runs stay comparable) coalesces only down to the cluster's
        # default parallelism, never to advisoryPartitionSizeInBytes — at
        # 100 TB the documented recommendation is false, so post-shuffle
        # partitions are sized by bytes rather than multiplied by cores
        # (guide §2.2).  Parameterised, not hard-coded: set
        # SPARK_GRAFT_PARALLELISM_FIRST=false on real clusters.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES):
    """Load the driver-generated parquet tables and register temp views.

    Returns a dict name -> DataFrame. Reads are lazy; column pruning and
    predicate pushdown reach the parquet scans via Catalyst.  Goes through
    the catalog's normalizing reader so timestamp encodings the generator
    might use (nanos, tz-less NTZ) surface uniformly as session-UTC
    TIMESTAMP.
    """
    from outpost_spark.queries_catalog import _t

    out = {}
    for name in names:
        df = _t(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
