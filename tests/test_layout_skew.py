"""Tests: bucketed write layout (co-located joins) + salted distinct."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from outpost_spark.logstore.layout import cobucketed_join, write_bucketed
from outpost_spark.ops.skew import salted_count_distinct


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, tmpdir):
    """Two tables bucketed on the join key with the same bucket count
    must join with ZERO Exchange on either side (the property that makes
    the layout free at 100 TB); the same join over plain parquet paths
    shuffles both sides."""
    ev = spark.range(1000).select(
        F.concat(F.lit("e"), F.col("id")).alias("event_id"),
        (F.col("id") % 7).alias("tenant"),
    )
    att = spark.range(3000).select(
        F.concat(F.lit("e"), (F.col("id") % 1000)).alias("event_id"),
        F.col("id").alias("attempt_id"),
    )
    try:
        write_bucketed(ev, "t_ev_b", bucket_col="event_id", num_buckets=4,
                       path=os.path.join(tmpdir, "ev"))
        write_bucketed(att, "t_att_b", bucket_col="event_id", num_buckets=4,
                       path=os.path.join(tmpdir, "att"))
        joined = cobucketed_join(spark, "t_ev_b", "t_att_b", on="event_id")
        joined.collect()  # finalize AQE so the executed plan is real
        plan = _plan(joined)
        assert "Exchange" not in plan, f"co-bucketed join shuffled:\n{plan}"
        assert joined.count() == 3000

        # contrast: identical join over the same files WITHOUT the bucket
        # spec (plain parquet read) must shuffle
        pev = spark.read.parquet(os.path.join(tmpdir, "ev")).hint("merge")
        patt = spark.read.parquet(os.path.join(tmpdir, "att"))
        plain = pev.join(patt, "event_id")
        plain.collect()
        assert "Exchange" in _plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ev_b")
        spark.sql("DROP TABLE IF EXISTS t_att_b")


def test_bucketed_scan_prunes_buckets(spark, tmpdir):
    """An equality filter on the bucket column must prune the scan to
    one bucket's files (SelectedBucketsCount in the scan node).

    autoBucketedScan is pinned OFF for the assertion: Spark's planner
    otherwise falls back to a plain file scan when no join/aggregate
    exploits the bucketing, and plain scans cannot bucket-prune."""
    df = spark.range(1000).select(
        F.concat(F.lit("e"), F.col("id")).alias("event_id"),
        F.col("id").alias("v"),
    )
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto, "true")
    try:
        write_bucketed(df, "t_prune_b", bucket_col="event_id", num_buckets=8,
                       path=os.path.join(tmpdir, "p"))
        spark.conf.set(auto, "false")
        q = spark.table("t_prune_b").filter(F.col("event_id") == "e42")
        assert q.count() == 1
        plan = _plan(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(auto, prev)
        spark.sql("DROP TABLE IF EXISTS t_prune_b")


def test_salted_count_distinct_matches_plain(spark):
    """Salted two-stage distinct must equal the plain aggregate exactly —
    skewed keys, nulls, multiple salt widths, and the empty frame."""
    rows = (
        [("hot", f"x{i % 137}") for i in range(5000)]
        + [("cold", f"y{i}") for i in range(20)]
        + [("hot", None), ("cold", None), ("nullonly", None)]
    )
    df = spark.createDataFrame(rows, "k string, x string")
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("x").alias("n")).collect()
    }
    for buckets in (1, 7, 64):
        salted = {
            r["k"]: r["n_distinct"]
            for r in salted_count_distinct(df, ["k"], "x", salt_buckets=buckets).collect()
        }
        assert salted == plain, f"salt_buckets={buckets}"
    assert plain["hot"] == 137 and plain["cold"] == 20 and plain["nullonly"] == 0

    empty = df.limit(0)
    assert salted_count_distinct(empty, ["k"], "x").count() == 0


def test_salted_distinct_spreads_the_hot_key(spark):
    """The stage-1 aggregate must group by (key, salt) — the hot key's
    distinct work lands in many partial groups, which is the whole
    point.  Pinned structurally: stage 1 emits multiple rows for a key
    whose distinct set spans salt buckets."""
    df = spark.createDataFrame(
        [("hot", f"x{i}") for i in range(200)], "k string, x string"
    )
    partial = df.groupBy(
        "k", F.pmod(F.xxhash64(F.col("x")), F.lit(16)).alias("s")
    ).agg(F.count_distinct("x").alias("c"))
    assert partial.count() > 1  # spread across salt buckets
    out = salted_count_distinct(df, ["k"], "x", salt_buckets=16).collect()
    assert out[0]["n_distinct"] == 200


def test_optimize_partition_clusters_row_groups(spark, tmpdir):
    """After the sorted rewrite, parquet row-group tenant_id min/max
    ranges are tight (disjoint or touching), so a tenant-filtered scan
    can skip groups; the unsorted original's groups all span the full
    tenant range.  Content must survive byte-identically."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from outpost_spark.logstore.layout import optimize_partition

    path = os.path.join(tmpdir, "tbl")
    df = spark.range(40000).select(
        (F.col("id") % 8).cast("string").alias("tenant_id"),
        F.col("id").alias("v"),
        F.lit("202401").alias("month"),
    )
    # small row groups so one partition has many; unsorted (round-robin)
    df.repartition(4).write.option("parquet.block.size", 64 * 1024).partitionBy(
        "month"
    ).mode("overwrite").parquet(path)
    before = {
        (r["tenant_id"], r["v"]) for r in spark.read.parquet(path).collect()
    }

    def tenant_ranges():
        part = os.path.join(path, "month=202401")
        spans = []
        for f in os.listdir(part):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(part, f)).metadata
            for g in range(md.num_row_groups):
                col = next(
                    md.row_group(g).column(i)
                    for i in range(md.row_group(g).num_columns)
                    if md.row_group(g).column(i).path_in_schema == "tenant_id"
                )
                spans.append((col.statistics.min, col.statistics.max))
        return spans

    assert any(lo != hi for lo, hi in tenant_ranges())  # unsorted: wide spans

    n = optimize_partition(
        spark, path, "202401", sort_cols=["tenant_id", "v"], target_files=1,
        writer_options={"parquet.block.size": 64 * 1024},
    )
    assert n >= 1
    after_spans = tenant_ranges()
    assert len(after_spans) > 1  # still multiple row groups to skip between
    # every rewritten row group covers at most... a tight range: for an
    # equality filter to skip, most groups must EXCLUDE most tenants —
    # assert each group spans at most 2 adjacent tenant values
    assert all(int(hi) - int(lo) <= 1 for lo, hi in after_spans)
    assert {
        (r["tenant_id"], r["v"]) for r in spark.read.parquet(path).collect()
    } == before
    assert not [
        d for d in os.listdir(path)
        if d.startswith(("_trash_", "_tmp_", "_swapjournal_"))
    ]


def test_zorder_partition_prunes_on_both_columns(spark, tmpdir):
    """Z-order clustering (layout.py::zorder_partition, Delta OPTIMIZE
    ZORDER analog): after the rewrite, row-group stats prune on EVERY
    listed column — measured here as the fraction of row groups an
    equality filter on tenant_id and a range filter on ts can each
    skip — while a single-key sort serves only its first column.
    Content must survive exactly."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from outpost_spark.logstore.layout import optimize_partition, zorder_partition

    path = os.path.join(tmpdir, "ztbl")
    # tenant and ts deliberately uncorrelated
    df = spark.range(40000).select(
        F.concat(F.lit("t"), (F.col("id") % 16).cast("string")).alias("tenant_id"),
        ((F.col("id") * 7919) % 40000).cast("long").alias("ts"),
        F.col("id").alias("v"),
        F.lit("202401").alias("month"),
    )
    df.repartition(4).write.option("parquet.block.size", 64 * 1024).partitionBy(
        "month"
    ).mode("overwrite").parquet(path)
    before = {
        (r["tenant_id"], r["ts"], r["v"])
        for r in spark.read.parquet(path).collect()
    }

    def spans(col_name):
        part = os.path.join(path, "month=202401")
        out = []
        for f in os.listdir(part):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(part, f)).metadata
            for g in range(md.num_row_groups):
                col = next(
                    md.row_group(g).column(i)
                    for i in range(md.row_group(g).num_columns)
                    if md.row_group(g).column(i).path_in_schema == col_name
                )
                out.append((col.statistics.min, col.statistics.max))
        return out

    def skip_fraction_tenant(target="t3"):
        sp = spans("tenant_id")
        return sum(1 for lo, hi in sp if not (lo <= target <= hi)) / len(sp)

    def skip_fraction_ts(lo_q=10000, hi_q=12000):
        sp = spans("ts")
        return sum(1 for lo, hi in sp if hi < lo_q or lo > hi_q) / len(sp)

    # single-key sort on tenant: tenant prunes, ts does NOT
    optimize_partition(
        spark, path, "202401", sort_cols=["tenant_id", "ts"], target_files=1,
        writer_options={"parquet.block.size": 64 * 1024},
    )
    assert skip_fraction_tenant() > 0.5
    assert skip_fraction_ts() < 0.2  # ts ranges stay wide under tenant sort
    single_sort_ts = skip_fraction_ts()

    # z-order on (tenant, ts): BOTH columns prune most groups
    n = zorder_partition(
        spark, path, "202401", zorder_cols=["tenant_id", "ts"], bits=8,
        target_files=1, writer_options={"parquet.block.size": 64 * 1024},
    )
    assert n >= 1
    assert len(spans("ts")) > 8  # multiple row groups to skip between
    # with ~10 row groups over the 2-D Morton space each group covers
    # ~1/3 of each dimension, so ~0.45-0.7 of groups exclude a given
    # tenant / 5%-ts-window — the claim is BOTH columns prune (vs the
    # single-key sort where ts pruned < 0.2)
    assert skip_fraction_tenant() > 0.4
    assert skip_fraction_ts() > 0.4
    assert skip_fraction_ts() > single_sort_ts + 0.25
    assert {
        (r["tenant_id"], r["ts"], r["v"])
        for r in spark.read.parquet(path).collect()
    } == before
    assert not [
        d for d in os.listdir(path)
        if d.startswith(("_trash_", "_tmp_", "_swapjournal_"))
    ]
