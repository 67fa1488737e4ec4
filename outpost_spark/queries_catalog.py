"""Operator catalog: every implemented SURVEY.md §2 operator expressed over
the driver-generated testdata tables, with a DuckDB oracle for each.

The testdata ``events`` table is mapped onto the outpost event/attempt
model deterministically (pure arithmetic — mirrored exactly in the SQL
oracles):

- tenant_id   := CAST(user_id AS STRING)
- topic       := event_type
- event_time  := ts
- status      := 'failed' when event_type = 'error' else 'success'
- manual      := event_id % 10 = 9
- attempt_number := event_id % 3 + 1
- matched_destination_ids := ['d_' || event_type]

Parity conventions (driver hashes values order-insensitively after sorting
columns by name):
- identical aliases on both sides;
- time buckets emitted as epoch-second BIGINTs;
- double aggregates rounded to a fixed scale on both sides;
- money sums computed in DECIMAL(18,2) (exact, order-independent).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from outpost_spark.functions.buckets import bucket_epoch_expr
from outpost_spark.functions.topic import glob_to_regex

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ns_window: dict[str, tuple] | None = None,
) -> DataFrame:
    """Read a testdata table, normalizing timestamp columns to TIMESTAMP
    (LTZ, session tz UTC) regardless of how the parquet encodes them.

    - ``timestamp[ns]``: Spark's parquet reader rejects nano precision;
      with ``spark.sql.legacy.parquet.nanosAsLong`` they surface as
      LongType nanos, which we truncate to micros (DuckDB does the same)
      — the scan stays native/vectorized, no driver-side materialization.
    - ``timestamp[s/ms/us]`` without a timezone: Spark 4 infers
      TIMESTAMP_NTZ, which epoch functions (``unix_micros`` et al.)
      reject; cast to TIMESTAMP — under the session's UTC tz the naive
      value is reinterpreted as UTC, exactly how DuckDB treats a naive
      TIMESTAMP in ``epoch()``.
    - ``timestamp[.., tz=..]``: already TIMESTAMP, untouched.

    ``ns_window``: optional {col: (start_dt|None, end_dt|None)} range
    filters applied to the RAW column *before* the conversion.  A filter
    on the converted column (``timestamp_micros(ts div 1000) >= X`` or
    ``cast(ts as timestamp) >= X``) cannot be pushed into the parquet
    scan, so every row group would be read; filtering the raw long/NTZ
    value keeps the predicate in ``PushedFilters`` where min/max
    row-group stats (and, on a partitioned table, partition pruning) skip
    the irrelevant data — the difference between O(window) and O(table)
    I/O at 100 TB.  Bounds are half-open [start, end), tz-aware UTC.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(os.path.join(sf_dir, f"{name}.parquet"))
        for field in schema:
            t = str(field.type)
            if t == "timestamp[ns]":
                if ns_window and field.name in ns_window:
                    start, end = ns_window[field.name]
                    # same contract as the NTZ branch: a naive datetime's
                    # .timestamp() uses the DRIVER's local tz — silent
                    # wrong-window results on a non-UTC driver
                    for b in (start, end):
                        if b is not None and b.tzinfo is None:
                            raise ValueError(
                                f"ns_window bound for {field.name!r} must be tz-aware"
                            )
                    if start is not None:
                        df = df.filter(
                            F.col(field.name) >= int(start.timestamp() * 1_000_000_000)
                        )
                    if end is not None:
                        df = df.filter(
                            F.col(field.name) < int(end.timestamp() * 1_000_000_000)
                        )
                # integer `div`, not `/`: nano epochs exceed double's 2^53
                df = df.withColumn(
                    field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
                )
            elif t.startswith("timestamp[") and "tz=" not in t:
                if ns_window and field.name in ns_window:
                    from datetime import timezone as _tz

                    start, end = ns_window[field.name]
                    # Bounds must be tz-aware: .astimezone() on a naive
                    # datetime would reinterpret it in the driver's local tz.
                    for b in (start, end):
                        if b is not None and b.tzinfo is None:
                            raise ValueError(
                                f"ns_window bound for {field.name!r} must be tz-aware"
                            )
                    # Cast the literal to TIMESTAMP_NTZ so the comparison is
                    # NTZ-vs-NTZ: a plain F.lit(datetime) is TIMESTAMP (LTZ),
                    # which forces a cast onto the *column* and keeps the
                    # predicate out of PushedFilters.
                    def _ntz(b):
                        return F.lit(
                            b.astimezone(_tz.utc).replace(tzinfo=None)
                        ).cast("timestamp_ntz")

                    if start is not None:
                        df = df.filter(F.col(field.name) >= _ntz(start))
                    if end is not None:
                        df = df.filter(F.col(field.name) < _ntz(end))
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    except ImportError:
        pass
    return df


def _events(spark: SparkSession, sf_dir: str, window: tuple | None = None) -> DataFrame:
    """events testdata -> outpost event/attempt hybrid schema (see module doc).

    ``window=(start, end)`` pushes the time range onto the raw nano column
    so the parquet scan skips row groups outside it (see ``_t``).
    """
    e = _t(spark, sf_dir, "events", ns_window={"ts": window} if window else None)
    return e.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_id").cast("string").alias("attempt_id"),
        F.col("user_id").cast("string").alias("tenant_id"),
        F.col("event_type").alias("topic"),
        F.col("ts").alias("event_time"),
        F.col("ts").alias("attempt_time"),
        F.array(F.concat(F.lit("d_"), F.col("event_type"))).alias("matched_destination_ids"),
        F.concat(F.lit("d_"), F.col("event_type")).alias("destination_id"),
        F.when(F.col("event_type") == "error", "failed").otherwise("success").alias("status"),
        (F.col("event_id") % 10 == 9).alias("manual"),
        (F.col("event_id") % 3 + 1).cast("int").alias("attempt_number"),
        F.col("value"),
        F.col("props").alias("data"),
    )


# SQL fragment mirroring _events() for the oracles
_EVENTS_SQL = """
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           CAST(event_id AS VARCHAR) AS attempt_id,
           CAST(user_id AS VARCHAR) AS tenant_id,
           event_type AS topic,
           ts AS event_time,
           ts AS attempt_time,
           'd_' || event_type AS destination_id,
           CASE WHEN event_type = 'error' THEN 'failed' ELSE 'success' END AS status,
           (event_id % 10 = 9) AS manual,
           CAST(event_id % 3 + 1 AS INT) AS attempt_number,
           value,
           props AS data
    FROM events
"""


# ───────────────────────── metrics engine (A1-A13, W1-W4) ─────────────────────────


@_register(
    "metrics_count_all",
    f"SELECT COUNT(DISTINCT attempt_id) AS count FROM ({_EVENTS_SQL})",
)
def metrics_count_all(spark, sf_dir):
    """A1/A2: whole-range exact distinct count (chlogstore/metrics.go:357-360)."""
    return _events(spark, sf_dir).agg(F.count_distinct("attempt_id").alias("count"))


@_register(
    "metrics_hourly_count",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    agg AS (
      SELECT CAST(floor(epoch(attempt_time) / 3600) AS BIGINT) * 3600 AS time_bucket,
             COUNT(DISTINCT attempt_id) AS count
      FROM src
      WHERE attempt_time >= TIMESTAMP '2024-01-02 00:00:00'
        AND attempt_time <  TIMESTAMP '2024-01-03 00:00:00'
      GROUP BY 1
    ),
    slots AS (
      SELECT CAST(s AS BIGINT) AS time_bucket
      FROM range(CAST(epoch(TIMESTAMP '2024-01-02 00:00:00') AS BIGINT),
                 CAST(epoch(TIMESTAMP '2024-01-03 00:00:00') AS BIGINT), 3600) t(s)
    )
    SELECT slots.time_bucket, COALESCE(agg.count, 0) AS count
    FROM slots LEFT JOIN agg USING (time_bucket)
    """,
)
def metrics_hourly_count(spark, sf_dir):
    """W1 + A12: 1h epoch-aligned buckets over one day, gap-filled with zeros."""
    from datetime import datetime, timezone

    from outpost_spark.logstore.metrics import MetricsRequest, TimeRange, query_attempt_metrics

    start = datetime(2024, 1, 2, tzinfo=timezone.utc)
    end = datetime(2024, 1, 3, tzinfo=timezone.utc)
    req = MetricsRequest(TimeRange(start, end), measures=["count"], granularity="1h")
    return query_attempt_metrics(_events(spark, sf_dir, window=(start, end)), req)


@_register(
    "metrics_daily_by_topic",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(floor(epoch(attempt_time) / 86400) AS BIGINT) * 86400 AS time_bucket,
           topic,
           COUNT(DISTINCT attempt_id) AS count,
           COUNT(DISTINCT CASE WHEN status = 'failed' THEN attempt_id END) AS failed_count
    FROM src
    GROUP BY 1, 2
    """,
)
def metrics_daily_by_topic(spark, sf_dir):
    """W2 + A10 + A3: daily buckets x topic dimension with conditional count."""
    df = _events(spark, sf_dir)
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "1d").alias("time_bucket"),
        F.col("topic"),
    ).agg(
        F.count_distinct("attempt_id").alias("count"),
        F.count_distinct(
            F.when(F.col("status") == "failed", F.col("attempt_id"))
        ).alias("failed_count"),
    )


@_register(
    "metrics_error_rate_daily",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(floor(epoch(attempt_time) / 86400) AS BIGINT) * 86400 AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count,
           COUNT(DISTINCT CASE WHEN status = 'success' THEN attempt_id END) AS successful_count,
           COUNT(DISTINCT CASE WHEN status = 'failed' THEN attempt_id END) AS failed_count,
           round(COUNT(DISTINCT CASE WHEN status = 'failed' THEN attempt_id END)
                 / CAST(COUNT(DISTINCT attempt_id) AS DOUBLE), 6) AS error_rate
    FROM src
    GROUP BY 1
    """,
)
def metrics_error_rate_daily(spark, sf_dir):
    """A3/A4: conditional distinct counts + error rate per day."""
    df = _events(spark, sf_dir)
    failed = F.count_distinct(F.when(F.col("status") == "failed", F.col("attempt_id")))
    total = F.count_distinct(F.col("attempt_id"))
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "1d").alias("time_bucket")
    ).agg(
        total.alias("count"),
        F.count_distinct(
            F.when(F.col("status") == "success", F.col("attempt_id"))
        ).alias("successful_count"),
        failed.alias("failed_count"),
        F.round(failed / total.cast("double"), 6).alias("error_rate"),
    )


@_register(
    "metrics_retry_measures",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT COUNT(DISTINCT CASE WHEN attempt_number = 1 AND NOT manual THEN attempt_id END)
             AS first_attempt_count,
           COUNT(DISTINCT CASE WHEN attempt_number > 1 THEN attempt_id END) AS retry_count,
           COUNT(DISTINCT CASE WHEN manual THEN attempt_id END) AS manual_retry_count,
           round(avg(attempt_number), 6) AS avg_attempt_number
    FROM src
    """,
)
def metrics_retry_measures(spark, sf_dir):
    """A5-A8: first/retry/manual conditional counts + avg attempt number."""
    df = _events(spark, sf_dir)
    c = F.col
    return df.agg(
        F.count_distinct(
            F.when((c("attempt_number") == 1) & ~c("manual"), c("attempt_id"))
        ).alias("first_attempt_count"),
        F.count_distinct(F.when(c("attempt_number") > 1, c("attempt_id"))).alias("retry_count"),
        F.count_distinct(F.when(c("manual"), c("attempt_id"))).alias("manual_retry_count"),
        F.round(F.avg("attempt_number"), 6).alias("avg_attempt_number"),
    )


@_register(
    "metrics_rate_whole_range",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT round(COUNT(DISTINCT attempt_id) / (30.0 * 86400), 10) AS rate
    FROM src
    WHERE attempt_time >= TIMESTAMP '2024-01-01 00:00:00'
      AND attempt_time <  TIMESTAMP '2024-01-31 00:00:00'
    """,
)
def metrics_rate_whole_range(spark, sf_dir):
    """A9: whole-range rate = count / range-duration-seconds (rate.go:80-83)."""
    from datetime import datetime, timezone

    start = datetime(2024, 1, 1, tzinfo=timezone.utc)
    end = datetime(2024, 1, 31, tzinfo=timezone.utc)
    df = _events(spark, sf_dir, window=(start, end))
    dur = (end - start).total_seconds()
    return df.agg(
        F.round(F.count_distinct("attempt_id") / F.lit(dur), 10).alias("rate")
    )


@_register(
    "metrics_sunday_weekly",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT (CAST(floor((floor(epoch(attempt_time) / 86400) - 3) / 7) AS BIGINT) * 7 + 3) * 86400
             AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count
    FROM src
    GROUP BY 1
    """,
)
def metrics_sunday_weekly(spark, sf_dir):
    """W3: Sunday-anchored weekly buckets (1970-01-04 anchor, bucket.go:49-57)."""
    df = _events(spark, sf_dir)
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "1w").alias("time_bucket")
    ).agg(F.count_distinct("attempt_id").alias("count"))


@_register(
    "metrics_2day_epoch_buckets",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(floor(floor(epoch(attempt_time) / 86400) / 2) AS BIGINT) * 2 * 86400
             AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count
    FROM src
    GROUP BY 1
    """,
)
def metrics_2day_epoch_buckets(spark, sf_dir):
    """W2 multi-unit: 2-day buckets anchored 1970-01-01 (bucket.go:41-48)."""
    df = _events(spark, sf_dir)
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "2d").alias("time_bucket")
    ).agg(F.count_distinct("attempt_id").alias("count"))


@_register(
    "metrics_monthly",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(epoch(date_trunc('month', attempt_time)) AS BIGINT) AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count
    FROM src
    GROUP BY 1
    """,
)
def metrics_monthly(spark, sf_dir):
    """W4: calendar month buckets (bucket.go:58-66)."""
    df = _events(spark, sf_dir)
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "1M").alias("time_bucket")
    ).agg(F.count_distinct("attempt_id").alias("count"))


@_register(
    "metrics_15m_dense",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(floor(epoch(attempt_time) / 900) AS BIGINT) * 900 AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count
    FROM src
    WHERE attempt_time >= TIMESTAMP '2024-01-05 00:00:00'
      AND attempt_time <  TIMESTAMP '2024-01-06 00:00:00'
    GROUP BY 1
    """,
)
def metrics_15m_dense(spark, sf_dir):
    """W1 multi-unit: 15-minute epoch-aligned buckets (no gap fill)."""
    from datetime import datetime, timezone

    df = _events(
        spark, sf_dir,
        window=(datetime(2024, 1, 5, tzinfo=timezone.utc),
                datetime(2024, 1, 6, tzinfo=timezone.utc)),
    )
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "15m").alias("time_bucket")
    ).agg(F.count_distinct("attempt_id").alias("count"))


@_register(
    "metrics_filtered_by_topic_status",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT CAST(floor(epoch(attempt_time) / 86400) AS BIGINT) * 86400 AS time_bucket,
           COUNT(DISTINCT attempt_id) AS count
    FROM src
    WHERE topic IN ('purchase', 'signup') AND status = 'success'
      AND tenant_id IN ('1','2','3','4','5','6','7','8','9','10','11','12')
    GROUP BY 1
    """,
)
def metrics_filtered_by_topic_status(spark, sf_dir):
    """A13/P3: equality-set filters pre-aggregation (pushed to the scan)."""
    df = _events(spark, sf_dir)
    df = df.filter(
        F.col("topic").isin("purchase", "signup")
        & (F.col("status") == "success")
        & F.col("tenant_id").isin([str(i) for i in range(1, 13)])
    )
    return df.groupBy(
        bucket_epoch_expr(F.col("attempt_time"), "1d").alias("time_bucket")
    ).agg(F.count_distinct("attempt_id").alias("count"))


# ───────────────────────── list queries (O1-O6, S7, P3-P5) ─────────────────────────


@_register(
    "list_events_first_page",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, tenant_id, topic, event_time
    FROM src
    WHERE topic IN ('purchase', 'refund')
    ORDER BY event_time DESC, event_id DESC
    LIMIT 100
    """,
)
def list_events_first_page(spark, sf_dir):
    """O1/O2: first page of a filtered list — ORDER BY (time, id) DESC LIMIT n.

    Spark plans this as TakeOrderedAndProject: per-partition top-k then a
    driver merge — no global sort shuffle, O(limit) result movement.
    """
    df = _events(spark, sf_dir)
    return (
        df.filter(F.col("topic").isin("purchase", "refund"))
        .select("event_id", "tenant_id", "topic", "event_time")
        .orderBy(F.col("event_time").desc(), F.col("event_id").desc())
        .limit(100)
    )


@_register(
    "list_events_keyset_page",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, tenant_id, topic, event_time
    FROM src
    WHERE (date_trunc('ms', event_time) < TIMESTAMP '2024-01-15 00:00:00'
           OR (date_trunc('ms', event_time) = TIMESTAMP '2024-01-15 00:00:00'
               AND event_id < '500'))
    ORDER BY date_trunc('ms', event_time) DESC, event_id DESC
    LIMIT 100
    """,
)
def list_events_keyset_page(spark, sf_dir):
    """O3: keyset (cursor) predicate — (t < T) OR (t = T AND id < I), at
    ms precision to mirror the reference's DateTime64(3) storage."""
    from outpost_spark.logstore.lists import _ms_trunc, keyset_predicate

    df = _events(spark, sf_dir)
    pos_ms = 1705276800000  # 2024-01-15T00:00:00Z
    return (
        df.filter(keyset_predicate("event_time", "event_id", "<", pos_ms, "500"))
        .select("event_id", "tenant_id", "topic", "event_time")
        .orderBy(_ms_trunc("event_time").desc(), F.col("event_id").desc())
        .limit(100)
    )


@_register(
    "point_lookup_event",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, tenant_id, topic, event_time, data
    FROM src WHERE event_id = '123' LIMIT 1
    """,
)
def point_lookup_event(spark, sf_dir):
    """S7: retrieve-by-id point lookup (chlogstore.go:574-639)."""
    df = _events(spark, sf_dir)
    return (
        df.filter(F.col("event_id") == "123")
        .select("event_id", "tenant_id", "topic", "event_time", "data")
        .limit(1)
    )


@_register(
    "list_time_window_gt_lt",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, event_time
    FROM src
    WHERE event_time > TIMESTAMP '2024-01-10 00:00:00'
      AND event_time < TIMESTAMP '2024-01-10 06:00:00'
    ORDER BY event_time ASC, event_id ASC
    """,
)
def list_time_window_gt_lt(spark, sf_dir):
    """P5: strict GT/LT time-range filters (driver/driver.go:12-17)."""
    from datetime import datetime, timezone

    df = _events(
        spark, sf_dir,
        window=(datetime(2024, 1, 10, tzinfo=timezone.utc),
                datetime(2024, 1, 10, 6, tzinfo=timezone.utc)),
    )
    return (
        df.filter(
            (F.col("event_time") > F.lit(datetime(2024, 1, 10, tzinfo=timezone.utc)))
            & (F.col("event_time") < F.lit(datetime(2024, 1, 10, 6, tzinfo=timezone.utc)))
        )
        .select("event_id", "event_time")
        .orderBy(F.col("event_time").asc(), F.col("event_id").asc())
    )


# ───────────────────────── filters & functions (P4, P6, P8, F1-F5) ─────────────────────────


@_register(
    "filter_topic_glob",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, topic FROM src
    WHERE regexp_matches(topic, '^p.*$') OR regexp_matches(topic, '^.*up$')
    """,
)
def filter_topic_glob(spark, sf_dir):
    """P6/F1: '*'-glob topic matching compiled to anchored JVM regex."""
    df = _events(spark, sf_dir)
    return df.filter(
        F.col("topic").rlike(glob_to_regex("p*")) | F.col("topic").rlike(glob_to_regex("*up"))
    ).select("event_id", "topic")


@_register(
    "filter_json_predicate",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, CAST(json_extract_string(data, '$.k') AS BIGINT) AS k
    FROM src
    WHERE CAST(json_extract_string(data, '$.k') AS BIGINT) >= 50
      AND topic = 'purchase'
    """,
)
def filter_json_predicate(spark, sf_dir):
    """P8/F2 (compiled path): {"data":{"k":{"$gte":50}},"topic":"purchase"}.

    The simplejsonmatch document compiles to a native Column over
    ``get_json_object`` — stays in whole-stage codegen, no UDF.
    """
    df = _events(spark, sf_dir)
    k = F.get_json_object(F.col("data"), "$.k").cast("bigint")
    return df.filter((k >= 50) & (F.col("topic") == "purchase")).select(
        "event_id", k.alias("k")
    )


@_register(
    "filter_array_overlap",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id, destination_id FROM src
    WHERE destination_id IN ('d_error', 'd_refund')
    """,
)
def filter_array_overlap(spark, sf_dir):
    """P4: matched_destination_ids overlap (CH hasAny / PG &&)."""
    df = _events(spark, sf_dir)
    return df.filter(
        F.arrays_overlap(
            F.col("matched_destination_ids"),
            F.array(F.lit("d_error"), F.lit("d_refund")),
        )
    ).select("event_id", "destination_id")


# ───────────────────────── joins (J1-J6) ─────────────────────────


@_register(
    "join_latest_attempt_per_key",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    ranked AS (
      SELECT tenant_id, topic, event_id, event_time,
             row_number() OVER (PARTITION BY tenant_id, topic
                                ORDER BY event_time DESC, event_id DESC) AS rn
      FROM src
    )
    SELECT tenant_id, topic, event_id AS latest_event_id, event_time AS latest_time
    FROM ranked WHERE rn = 1
    """,
)
def join_latest_attempt_per_key(spark, sf_dir):
    """J4: latest-attempt-per-(tenant,destination) via max_by struct.

    Implemented with ``max_by`` over a composite (time, id) struct — a
    single hash aggregation (partial+final), cheaper at scale than a
    row_number window which would sort every partition group.
    """
    df = _events(spark, sf_dir)
    best = F.max_by(
        F.struct(F.col("event_id"), F.col("event_time")),
        F.struct(F.col("event_time"), F.col("event_id")),
    )
    return df.groupBy("tenant_id", "topic").agg(
        best.getField("event_id").alias("latest_event_id"),
        best.getField("event_time").alias("latest_time"),
    )


@_register(
    "join_broadcast_dim",
    """
    SELECT p.p_brand,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """J5-style dimension lookup: fact ⨝ broadcast(dim) + agg.

    ``broadcast(part)`` pins a broadcast-hash join — zero shuffle of the
    fact side; only the small aggregated result shuffles.

    Money sums run in DECIMAL(18,2) (exact, order-independent) and are
    emitted as DOUBLE: float(exact decimal) is bit-identical in Spark and
    DuckDB, and the collected Python type is a plain float under every
    fetch path (collect vs pandas), which keeps the driver's value-hash
    representation-stable.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "join_multiway_star",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
)
def join_multiway_star(spark, sf_dir):
    """Star-schema multi-join: fact ⨝ three broadcast dims, one shuffle total.

    ``total`` is an exact DECIMAL(18,2) sum emitted as DOUBLE — see
    ``join_broadcast_dim`` for the representation-stability rationale.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(r["r_name"].alias("region"), n["n_name"].alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@_register(
    "join_explode_unnest",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT DISTINCT tenant_id, destination_id FROM src
    """,
)
def join_explode_unnest(spark, sf_dir):
    """J6: explode(matched_destination_ids) before grouping (CH arrayJoin)."""
    df = _events(spark, sf_dir)
    return (
        df.select("tenant_id", F.explode("matched_destination_ids").alias("destination_id"))
        .distinct()
    )


# ───────────────────────── pricing summary (classic scan-agg) ─────────────────────────


@_register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan-heavy aggregation.

    Every float output is derived from an exact DECIMAL sum, so the result
    is independent of partition layout / summation order: a plain
    ``avg(double)`` accumulates ULP noise that varies with parallelism and
    can flip a rounded digit between runs, which broke the round-1 driver
    hash.  ``avg_disc`` = float(exact decimal sum) / count — one IEEE
    division of identical operands on both engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_base_price"),
        (F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)))
        .alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ───────────────────────── set ops / dedup (SET1-SET3) ─────────────────────────


@_register(
    "dedup_exact_documents",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS canonical_doc_id,
           count(*) AS copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_documents(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, canonical = min id (SET1/SET2)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("copies")
    )


@_register(
    "dedup_drop_duplicates",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT tenant_id, topic, count(*) AS n
    FROM (SELECT DISTINCT tenant_id, topic, event_id FROM src)
    GROUP BY tenant_id, topic
    """,
)
def dedup_drop_duplicates(spark, sf_dir):
    """SET1: dropDuplicates(keys) then aggregate."""
    df = _events(spark, sf_dir)
    return (
        df.select("tenant_id", "topic", "event_id")
        .dropDuplicates(["tenant_id", "topic", "event_id"])
        .groupBy("tenant_id", "topic")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ───────────────────────── streaming-state analogs (ST2, ST3, F11) ─────────────────────────


@_register(
    "alert_consecutive_failures",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    runs AS (
      SELECT tenant_id, event_id, event_time, status,
             row_number() OVER (PARTITION BY tenant_id ORDER BY event_time, event_id)
             - row_number() OVER (PARTITION BY tenant_id, status ORDER BY event_time, event_id)
               AS grp
      FROM src
    ),
    streaks AS (
      SELECT tenant_id, count(*) AS streak_len
      FROM runs WHERE status = 'failed'
      GROUP BY tenant_id, grp
    )
    SELECT tenant_id, CAST(max(streak_len) AS BIGINT) AS max_consecutive_failures
    FROM streaks GROUP BY tenant_id
    """,
)
def alert_consecutive_failures(spark, sf_dir):
    """ST3 (batch analog): max consecutive-failure streak per tenant.

    Gaps-and-islands with two row_numbers — the batch-auditable equivalent
    of the alert evaluator's consecutive-failure counter
    (alert/evaluator.go:119-157).
    """
    from pyspark.sql import Window

    df = _events(spark, sf_dir)
    w_all = Window.partitionBy("tenant_id").orderBy("event_time", "event_id")
    w_status = Window.partitionBy("tenant_id", "status").orderBy("event_time", "event_id")
    runs = df.withColumn("grp", F.row_number().over(w_all) - F.row_number().over(w_status))
    streaks = (
        runs.filter(F.col("status") == "failed")
        .groupBy("tenant_id", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return streaks.groupBy("tenant_id").agg(
        F.max("streak_len").cast("bigint").alias("max_consecutive_failures")
    )


# The batched alert evaluator (streaming/alerts.py::AlertStateTable) on
# ONE micro-batch from empty state IS SQL-expressible: segment by the
# running success count, count new failure ids per segment, emit the
# threshold when-chain per failure row.  The oracle re-derives the full
# signal frame; multi-batch state carry / TTL / suppression windows stay
# pytest-pinned (tests/test_alert_batched.py randomized parity).
# Machine config mirrored in the SQL: auto_disable_failure_count=4
# (pairs: 2->50%, 3->70%, 4->100% with >=), retry_max_limit=2,
# exhausted window 0 (every exhaustion emits).
_ALERT_BATCHED_SQL = f"""
    WITH src AS ({_EVENTS_SQL}),
    att AS (
      SELECT tenant_id,
             destination_id,
             'a' || lpad(event_id, 12, '0') AS attempt_id,
             CASE WHEN CAST(event_id AS BIGINT) % 5 = 0
                  THEN 'success' ELSE 'failed' END AS status,
             attempt_number,
             event_time
      FROM src
    ),
    ordered AS (
      SELECT *,
             SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END) OVER (
               PARTITION BY tenant_id, destination_id
               ORDER BY event_time, attempt_id
               ROWS UNBOUNDED PRECEDING) AS seg
      FROM att
    ),
    counted AS (
      SELECT *,
             CAST(SUM(1) OVER (
               PARTITION BY tenant_id, destination_id, seg
               ORDER BY event_time, attempt_id
               ROWS UNBOUNDED PRECEDING) AS INT) AS cf_count
      FROM ordered WHERE status <> 'success'
    )
    SELECT tenant_id, destination_id,
           CASE WHEN cf_count >= 4 THEN 'alert.destination.disabled'
                ELSE 'alert.destination.consecutive_failure' END AS signal,
           cf_count AS failures,
           CAST(4 AS INT) AS max_failures,
           CAST(CASE WHEN cf_count >= 4 THEN 100
                     WHEN cf_count = 3 THEN 70
                     WHEN cf_count = 2 THEN 50 END AS INT) AS level,
           attempt_id
    FROM counted
    WHERE cf_count >= 2
    UNION ALL
    SELECT tenant_id, destination_id,
           'alert.attempt.exhausted_retries' AS signal,
           cf_count AS failures,
           CAST(4 AS INT) AS max_failures,
           CAST(0 AS INT) AS level,
           attempt_id
    FROM counted
    WHERE attempt_number > 2
"""


@_register("alert_signals_batched", _ALERT_BATCHED_SQL)
def alert_signals_batched(spark, sf_dir):
    """ST3/ST4 batched scale path as a driver-checked row: one
    micro-batch of attempt outcomes (the deterministic event->attempt
    mapping) through ``AlertStateTable.apply_attempts`` from empty
    state — per-row consecutive-failure counts, threshold crossings
    (50/70/100 of auto_disable=4, 100% emits disabled), and
    exhausted-retries signals (attempt_number > retry_max_limit=2) —
    against a DuckDB oracle re-deriving the identical signal frame with
    window functions.  Reference: internal/alert/evaluator.go:119-157;
    the stateful multi-batch behaviors (carry, TTL, suppression) are
    pinned by tests/test_alert_batched.py's randomized parity."""
    from outpost_spark.streaming.alerts import AlertStateMachine, AlertStateTable

    src = _events(spark, sf_dir)
    # alert-specific outcome mix: ~20% successes so the evaluator's
    # success-reset segments are exercised on every key (the event
    # model's topic-derived status would never reset a failing key)
    att = src.select(
        "tenant_id",
        "destination_id",
        F.concat(F.lit("a"), F.lpad("event_id", 12, "0")).alias("attempt_id"),
        F.when(F.col("event_id").cast("long") % 5 == 0, "success")
        .otherwise("failed")
        .alias("status"),
        "attempt_number",
        F.lit(True).alias("eligible_for_retry"),
        "event_time",
    )
    state_dir = os.path.join(
        os.environ.get(
            "OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"
        ),
        "alert_state",
    )
    table = AlertStateTable(
        spark,
        state_dir,
        machine=AlertStateMachine(
            auto_disable_failure_count=4, retry_max_limit=2
        ),
    )
    # batch 1 from empty state: state_before(1) reads versions < 1 only,
    # so re-runs are hermetic regardless of leftover state files
    return table.apply_attempts(att, 1, now=0.0, order_cols=("event_time",))


@_register(
    "retry_backoff_schedule",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           CAST(floor(epoch(event_time)) AS BIGINT) + 30 AS retry_1,
           CAST(floor(epoch(event_time)) AS BIGINT) + 30 + 60 AS retry_2,
           CAST(floor(epoch(event_time)) AS BIGINT) + 30 + 60 + 120 AS retry_3
    FROM src WHERE status = 'failed'
    """,
)
def retry_backoff_schedule(spark, sf_dir):
    """F11: exponential backoff 30s*2^n — cumulative retry fire times."""
    df = _events(spark, sf_dir).filter(F.col("status") == "failed")
    base = F.unix_timestamp("event_time").cast("bigint")
    return df.select(
        "event_id",
        (base + 30).alias("retry_1"),
        (base + 30 + 60).alias("retry_2"),
        (base + 30 + 60 + 120).alias("retry_3"),
    )


# ───────────────────────── text analysis ops ─────────────────────────


@_register(
    "text_token_stats",
    r"""
    SELECT doc_id,
           n_chars,
           CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting + punctuation stats (whitespace tokenizer), JVM-side."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?,;:]", "")).cast("bigint").alias(
            "n_punct"
        ),
    )


@_register(
    "text_token_stats_bpe",
    r"""
    SELECT doc_id,
           CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           coalesce(CAST(list_sum(list_transform(
               regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'),
               p -> CASE WHEN regexp_matches(p, '^[A-Za-z]+$')
                         THEN CAST(ceil(length(p) / 4.0) AS BIGINT)
                         ELSE 1 END)) AS BIGINT), 0) AS n_bpe_tokens
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_token_stats_bpe(spark, sf_dir):
    """Tokenizer-aware token counts (VERDICT r05 stretch #9): modern
    budgets are BPE tokens, not whitespace words.  The codegen
    approximation splits text into GPT-pre-tokenizer pieces (letter
    runs / digits / symbols) and charges ceil(len/4) per letter run —
    RE2-portable, so DuckDB computes the IDENTICAL count as the oracle
    (ops/text.py:bpe_token_count_expr; exact_token_counts is the
    Arrow-batched exact path for a real encoder)."""
    from outpost_spark.ops.text import bpe_token_count_expr

    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
        bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens"),
    )


@_register(
    "text_fingerprint",
    """
    SELECT doc_id, substr(md5(text), 1, 16) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: stable 64-bit content hash (hex prefix)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.substring(F.md5(F.col("text")), 1, 16).alias("fingerprint"))


@_register(
    "text_length_percentiles",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6) AS p50,
           round(quantile_cont(CAST(length(text) AS DOUBLE), 0.9), 6) AS p90,
           round(quantile_cont(CAST(length(text) AS DOUBLE), 0.99), 6) AS p99
    FROM documents GROUP BY lang
    """,
)
def text_length_percentiles(spark, sf_dir):
    """Per-language exact length percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, interpolated)."""
    from outpost_spark.ops.text import length_percentiles

    return length_percentiles(_t(spark, sf_dir, "documents"), "text", "lang")


@_register(
    "text_length_histogram",
    """
    SELECT lang,
           CAST(floor(length(text) / 100) * 100 AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang, bucket_lo
    """,
)
def text_length_histogram(spark, sf_dir):
    """Char-length histogram per language (100-char buckets)."""
    from outpost_spark.ops.text import length_histogram

    return length_histogram(
        _t(spark, sf_dir, "documents"), "text", group_col="lang", bucket_width=100
    )


@_register(
    "text_top_tokens",
    r"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS token
      FROM documents) t
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def text_top_tokens(spark, sf_dir):
    """Global top-20 vocabulary by frequency (deterministic tie-break)."""
    from outpost_spark.ops.text import top_tokens

    return top_tokens(_t(spark, sf_dir, "documents"), "text", k=20)


@_register(
    "text_pii_redact",
    r"""
    WITH e AS (
      SELECT doc_id, text AS t0,
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    i AS (
      SELECT doc_id, t0, t1,
             regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
      FROM e
    )
    SELECT doc_id,
           regexp_replace(t2, '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t2, '\+?\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phones
    FROM i
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII scrubbing with typed placeholders + per-doc match counts
    (sequential email -> ip -> phone passes, counts on the text each pass
    saw).  Dialect-common regexes make the oracle exact."""
    from outpost_spark.ops.text import pii_redact

    return pii_redact(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_repetition_stats",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
             list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
      CAST(len(lines) AS BIGINT) AS n_lines,
      round(CASE WHEN len(lines) > 0
            THEN len(list_distinct(lines)) * 1.0 / len(lines) ELSE 1.0 END, 6) AS distinct_line_ratio,
      round(CASE WHEN len(toks) > 0
            THEN len(list_distinct(toks)) * 1.0 / len(toks) ELSE 1.0 END, 6) AS type_token_ratio,
      round(CASE WHEN coalesce(list_sum(list_transform(lines, l -> length(l))), 0) > 0
            THEN coalesce(list_sum(list_transform(
                   list_filter(lines, l -> len(list_filter(lines, x -> x = l)) > 1),
                   l -> length(l))), 0) * 1.0
                 / list_sum(list_transform(lines, l -> length(l)))
            ELSE 0.0 END, 6) AS dup_line_char_ratio
    FROM s
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Within-document repetition signals (Gopher-style): distinct-line
    ratio, type-token ratio, duplicated-line character mass."""
    from outpost_spark.ops.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), "text", "doc_id")


# ───────────────────── LLM-pipeline ops: dedup / similarity / text ─────────────────────

def _sigs_sql(src: str = "documents", prefix: str = "") -> str:
    return f"""
    {prefix}base AS (
      -- wide (60-bit) gram hash: the verify unit; the 32-bit minhash base
      -- is its top 32 bits (h // 2^28) — mirrors ops.dedup._hash_expr_wide
      SELECT doc_id,
             list_distinct(list_transform(shingles, s ->
               CAST(('0x' || substr(md5('h|' || s), 1, 15)) AS BIGINT))) AS widehash
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(length(lower(text)) - 4, 0) + 1),
                 i -> substr(lower(text), CAST(i AS INT), 5))) AS shingles
        FROM {src})
    ),
    {prefix}sigs AS (
      SELECT doc_id,
             list_transform(range(0, 16), j ->
               coalesce(
                 list_min(list_transform(
                   list_distinct(list_transform(widehash, w -> w // 268435456)), h ->
                   (h * (((2654435761 * (j + 1)) % 1073741824) | 1)
                      + ((2246822519 * j) % 1073741824)) % 4294967291)),
                 4294967296)) AS minhash
      FROM {prefix}base
    )
"""


def _grams_sql(src: str = "documents") -> str:
    """Verify-gram CTE.  Must follow :func:`_sigs_sql` in the same WITH —
    the grams ARE the (already distinct, already hashed) signature
    shingles from its ``base`` CTE, mirroring the fused single-hash-pass
    verify in ``ops.dedup.minhash_dedup_pairs`` (``src`` is carried by
    ``base``; the parameter is kept for call-site symmetry)."""
    del src
    return """
    grams AS (SELECT doc_id, widehash AS g FROM base)
"""


_SIGS_SQL = _sigs_sql()

_GRAMS_SQL = _grams_sql()


@_register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_SIGS_SQL},
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM sigs l JOIN sigs r ON l.doc_id < r.doc_id AND (
           l.minhash[1:4]   = r.minhash[1:4]
        OR l.minhash[5:8]   = r.minhash[5:8]
        OR l.minhash[9:12]  = r.minhash[9:12]
        OR l.minhash[13:16] = r.minhash[13:16])
    ),
    {_GRAMS_SQL}
    SELECT id_a, id_b,
           round(CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) > 0
                 THEN len(list_intersect(ga.g, gb.g)) * 1.0
                      / len(list_distinct(list_concat(ga.g, gb.g)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM cands
    JOIN grams ga ON ga.doc_id = cands.id_a
    JOIN grams gb ON gb.doc_id = cands.id_b
    WHERE CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) > 0
          THEN len(list_intersect(ga.g, gb.g)) * 1.0
               / len(list_distinct(list_concat(ga.g, gb.g)))
          ELSE 0.0 END >= 0.7
    """,
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash(16) + LSH(4x4 bands) near-dup pairs, exact-Jaccard verified.

    The Spark plan shuffles only (band-slice, id) pairs; candidate pairs are
    verified with exact 5-gram Jaccard before output (no false positives).
    """
    from outpost_spark.ops.dedup import minhash_dedup_pairs

    docs = _t(spark, sf_dir, "documents")
    out = minhash_dedup_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        rows_per_band=4,
        shingle_len=5,
        verify_ngram=5,
        threshold=0.7,
    )
    return out


# The numpy hash family is not reproducible in DuckDB, but everything
# DOWNSTREAM of it is SQL: the Spark entry persists the (doc_id, distinct
# gram hashes, minhash signature) frame to a parquet fixture and both
# engines consume THAT — the oracle re-derives the 4x4 band buckets, the
# >=5-matching-lane signature-estimate prefilter, and the exact-Jaccard
# verify from the fixture, so only the hash function itself stays
# pytest-pinned (tests/test_ops.py pins pair-set equality with the md5
# oracle path on planted and real corpora).  Same graduation trick as
# the image-dedup entries (VERDICT r11 task #4).
_MINHASH_FAST_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "minhash_fast_sigs",
)

_MINHASH_FAST_SQL = f"""
    WITH fp AS (
      SELECT doc_id, __grams AS g, minhash
      FROM read_parquet('{_MINHASH_FAST_FIXTURE_DIR}/*.parquet')
      WHERE len(__grams) > 0
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM fp l JOIN fp r ON l.doc_id < r.doc_id AND (
           l.minhash[1:4]   = r.minhash[1:4]
        OR l.minhash[5:8]   = r.minhash[5:8]
        OR l.minhash[9:12]  = r.minhash[9:12]
        OR l.minhash[13:16] = r.minhash[13:16])
      WHERE len(list_filter(range(1, 17), i -> l.minhash[i] = r.minhash[i])) >= 5
    )
    SELECT id_a, id_b,
           round(CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) > 0
                 THEN len(list_intersect(ga.g, gb.g)) * 1.0
                      / len(list_distinct(list_concat(ga.g, gb.g)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM cands
    JOIN fp ga ON ga.doc_id = cands.id_a
    JOIN fp gb ON gb.doc_id = cands.id_b
    WHERE CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) > 0
          THEN len(list_intersect(ga.g, gb.g)) * 1.0
               / len(list_distinct(list_concat(ga.g, gb.g)))
          ELSE 0.0 END >= 0.7
"""


@_register("dedup_minhash_lsh_pairs_fast", _MINHASH_FAST_SQL)
def dedup_minhash_lsh_pairs_fast(spark, sf_dir):
    """MinHash+LSH near-dup pairs on the Arrow-batched numpy signature
    stage — the production path.

    Same LSH geometry and exact-Jaccard verification as
    ``dedup_minhash_lsh_pairs``; the per-shingle hashing runs as one
    vectorized numpy pass with independent per-lane avalanche and a
    signature-estimate prefilter before the gram-array verify join
    (ops/dedup.py:minhash_grams_and_signature_numpy — 2.2x faster than
    the xxhash64 Column path at 1M docs, measured).  The signature frame
    persists to a parquet fixture both engines consume: the DuckDB
    oracle re-derives banding + prefilter + exact Jaccard from it, so
    the full candidate/verify pipeline is value-oracled and only the
    numpy hash family stays pytest-pinned.
    """
    from outpost_spark.ops.dedup import (
        minhash_grams_and_signature_numpy,
        minhash_pairs_from_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    hashed = minhash_grams_and_signature_numpy(
        docs.select("doc_id", "text"),
        "doc_id",
        "text",
        num_hashes=16,
        shingle_len=5,
    )
    hashed.write.mode("overwrite").parquet(_MINHASH_FAST_FIXTURE_DIR)
    back = spark.read.parquet(_MINHASH_FAST_FIXTURE_DIR)
    # the fixture IS the materialization — no further checkpoints needed
    return minhash_pairs_from_signatures(
        back,
        "doc_id",
        num_hashes=16,
        bands=4,
        rows_per_band=4,
        threshold=0.7,
        materialize=False,
    )


def _pairs_cte_sql(src: str = "documents") -> str:
    return f"""
    {_sigs_sql(src)},
    cands AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM sigs l JOIN sigs r ON l.doc_id < r.doc_id AND (
           l.minhash[1:4]   = r.minhash[1:4]
        OR l.minhash[5:8]   = r.minhash[5:8]
        OR l.minhash[9:12]  = r.minhash[9:12]
        OR l.minhash[13:16] = r.minhash[13:16])
    ),
    {_grams_sql(src)},
    pairs AS (
      SELECT id_a, id_b
      FROM cands
      JOIN grams ga ON ga.doc_id = cands.id_a
      JOIN grams gb ON gb.doc_id = cands.id_b
      WHERE CASE WHEN len(list_distinct(list_concat(ga.g, gb.g))) > 0
            THEN len(list_intersect(ga.g, gb.g)) * 1.0
                 / len(list_distinct(list_concat(ga.g, gb.g)))
            ELSE 0.0 END >= 0.7
    ),
    edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(ru, rv) AS (
      SELECT eu, eu FROM edges
      UNION
      SELECT r.ru, e.ev FROM reach r JOIN edges e ON r.rv = e.eu
    ),
    comp AS (SELECT ru AS doc_id, min(rv) AS component FROM reach GROUP BY ru)
"""


_PAIRS_CTE_SQL = _pairs_cte_sql()


def _minhash_pairs(spark, sf_dir):
    from outpost_spark.ops.dedup import minhash_dedup_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, "doc_id", "text",
        num_hashes=16, bands=4, rows_per_band=4,
        shingle_len=5, verify_ngram=5, threshold=0.7,
    )


@_register(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_PAIRS_CTE_SQL}
    SELECT doc_id, component FROM comp
    """,
)
def dedup_connected_components(spark, sf_dir):
    """Near-dup clusters: connected components over the verified
    MinHash+LSH pair graph (component = min reachable doc_id).

    Spark side is iterative min-label propagation
    (``ops.dedup.connected_components`` — O(diameter) checkpointed
    rounds, shuffle keyed on node id throughout); the oracle computes the
    same fixpoint with a recursive transitive-closure CTE, which is only
    feasible because the pair graph is sparse."""
    from outpost_spark.ops.dedup import connected_components

    comp = connected_components(_minhash_pairs(spark, sf_dir))
    return comp.select(F.col("node").alias("doc_id"), "component")


@_register(
    "dedup_canonical_survivors",
    f"""
    WITH RECURSIVE {_PAIRS_CTE_SQL}
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.doc_id = c.component
    """,
)
def dedup_canonical_survivors(spark, sf_dir):
    """Fuzzy-dedup output corpus: every near-dup cluster collapsed to its
    minimum-id member, untouched documents passed through (left-anti join
    against the losers set, which is broadcast-small by construction)."""
    from outpost_spark.ops.dedup import dedup_keep_canonical

    docs = _t(spark, sf_dir, "documents")
    return dedup_keep_canonical(docs, _minhash_pairs(spark, sf_dir), "doc_id").select(
        "doc_id"
    )


_QUALITY_SQL = r"""
      SELECT doc_id,
             round((
               CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END +
               CASE WHEN n_chars > 0 AND n_punct / n_chars > 0 AND n_punct / n_chars < 0.1
                    THEN 1.0 ELSE 0.0 END +
               CASE WHEN (CASE WHEN n_chars > 0 THEN n_digits / n_chars ELSE 0.0 END) < 0.2
                    THEN 1.0 ELSE 0.0 END +
               CASE WHEN n_tokens > 0 AND n_chars / n_tokens >= 3 AND n_chars / n_tokens <= 12
                    THEN 1.0 ELSE 0.0 END
             ) / 4.0, 6) AS q
      FROM (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                    x -> x <> '')) AS DOUBLE) AS n_tokens,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digits
        FROM documents
      )
"""


@_register(
    "dedup_best_quality_survivors",
    f"""
    WITH RECURSIVE {_PAIRS_CTE_SQL},
    q AS ({_QUALITY_SQL}),
    members AS (
      SELECT c.doc_id, c.component, q.q FROM comp c JOIN q USING (doc_id)
    ),
    winners AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (
                 PARTITION BY component ORDER BY q DESC, doc_id ASC
               ) AS rn
        FROM members
      ) WHERE rn = 1
    )
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR d.doc_id IN (SELECT doc_id FROM winners)
    """,
)
def dedup_best_quality_survivors(spark, sf_dir):
    """Quality-weighted fuzzy dedup (r06): each MinHash near-dup
    component keeps its highest-quality-score member (ties -> lowest
    id) rather than the arbitrary min-id canonical — production
    curation semantics (clusters mix a clean original with mangled
    scrapes).  Per-component argmax is a map-side min_by aggregate over
    the tiny members frame, never a corpus window
    (ops/dedup.py:dedup_keep_best)."""
    from outpost_spark.ops.dedup import dedup_keep_best
    from outpost_spark.ops.text import quality_score_expr

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__q", quality_score_expr(F.col("text"))
    )
    return dedup_keep_best(
        docs, _minhash_pairs(spark, sf_dir), "doc_id", "__q"
    ).select("doc_id")


_HASH_FRAC_SQL = (
    "(CAST(('0x' || substr(md5('{seed}|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " / 4294967296.0)"
)


@_register(
    "sample_shuffled_shards",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('shuffle|shard|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k1,
             CAST(('0x' || substr(md5('shuffle|pos|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k2
      FROM documents
    )
    SELECT doc_id,
           CAST(k1 % 64 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY k1 % 64 ORDER BY k2, doc_id) AS BIGINT) AS pos
    FROM t
    """,
)
def sample_shuffled_shards(spark, sf_dir):
    """Deterministic global shuffle into training shards (r06): two
    independent id hashes — one buckets into shards (the only
    corpus-wide movement, a hash partition), one orders WITHIN the
    shard (a per-shard window over corpus/n_shards rows, bounded by
    dialing n_shards — never a global sort).  Reading shards by pos
    yields a corpus-wide pseudo-random order; hash-stable under corpus
    growth (ops/sampling.py:assign_shuffled_shards)."""
    from outpost_spark.ops.sampling import assign_shuffled_shards

    docs = _t(spark, sf_dir, "documents")
    return assign_shuffled_shards(docs, "doc_id", n_shards=64)


@_register(
    "text_mojibake_stats",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'Ã.|â€.|Â ')) AS BIGINT) AS n_mojibake,
           len(regexp_extract_all(text, 'Ã.|â€.|Â ')) > 0 AS has_mojibake
    FROM documents
    """,
)
def text_mojibake_stats(spark, sf_dir):
    """Encoding-damage detection (r06): count classic
    UTF-8-decoded-as-Latin-1 artifact sequences (Ã©-family, â€™-family,
    Â +space) per document — the detection half of ftfy as a pure
    codegen expression with an exact DuckDB oracle; planted-artifact
    pytest carries the positive cases (ops/text.py:mojibake_stats)."""
    from outpost_spark.ops.text import mojibake_stats

    docs = _t(spark, sf_dir, "documents")
    return mojibake_stats(docs, "text", "doc_id")


@_register(
    "sample_hash_documents",
    f"""
    SELECT doc_id FROM documents
    WHERE {_HASH_FRAC_SQL.format(seed="sample")} < 0.25
    """,
)
def sample_hash_documents(spark, sf_dir):
    """Deterministic 25% corpus sample by id-hash fraction — membership is
    stable across runs/engines/corpus growth (unlike RNG-based sample())."""
    from outpost_spark.ops.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25).select("doc_id")


@_register(
    "sample_train_val_test",
    f"""
    SELECT doc_id,
           CASE WHEN {_HASH_FRAC_SQL.format(seed="split")} < 0.8 THEN 'train'
                WHEN {_HASH_FRAC_SQL.format(seed="split")} < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_train_val_test(spark, sf_dir):
    """Deterministic train/val/test assignment (80/10/10) by id hash."""
    from outpost_spark.ops.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    ).select("doc_id", "split")


@_register(
    "sample_mix_by_rates",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_HASH_FRAC_SQL.format(seed="mix")} <
          CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 ELSE 0.1 END
    """,
)
def sample_mix_by_rates(spark, sf_dir):
    """Corpus mixing: per-language sampling rates (down-weight en to 50%,
    keep de, thin everything else to 10%) via the deterministic id-hash
    fraction — pure codegen filter, no shuffle."""
    from outpost_spark.ops.sampling import sample_by_rates

    docs = _t(spark, sf_dir, "documents")
    return sample_by_rates(
        docs, "lang", {"en": 0.5, "de": 1.0}, "doc_id", default_rate=0.1
    ).select("doc_id", "lang")


@_register(
    "text_ngram_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)
    ),
    pg AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY doc_id, g),
    pd AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
             round(sum(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) * 1.0
                   / sum(cnt * length(g)), 6) AS dup_ngram_char_frac
      FROM pg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(pd.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           pd.dup_ngram_char_frac
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def text_ngram_repetition(spark, sf_dir):
    """Gopher's duplicate word-n-gram character fraction (Rae et al.
    2021 App. A1.1) at n=2 — the strongest single predictor of
    degenerate repetition loops; n-grams build by chained zip_with (one
    tokenization per row), aggregate per (doc, gram) then per doc
    (ops/text.py:ngram_repetition_stats).  The n=5 planted-loop
    behavior is pytest-pinned."""
    from outpost_spark.ops.text import ngram_repetition_stats

    docs = _t(spark, sf_dir, "documents")
    return ngram_repetition_stats(docs, "text", "doc_id", n=2)


@_register(
    "text_top_ngram_fraction",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM toks)
    ),
    pg AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY doc_id, g),
    pd AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
             sum(cnt * length(g)) AS total_chars,
             max(struct_pack(c := cnt, l := length(g), g := g)) AS top
      FROM pg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(pd.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           round((pd.top.c * pd.top.l) * 1.0 / pd.total_chars, 6)
             AS top_ngram_char_frac
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def text_top_ngram_fraction(spark, sf_dir):
    """Gopher's TOP-n-gram character fraction (Rae et al. 2021 App.
    A1.1, n in 2..4) at n=3 — the fraction of n-gram characters inside
    the document's single most frequent n-gram, champion chosen by the
    (count, length, gram) total order in both engines
    (ops/text.py:top_ngram_fraction); completes the A1.1 repetition
    family next to text_ngram_repetition's duplicate fraction
    (VERDICT r07 'Next round' #7)."""
    from outpost_spark.ops.text import top_ngram_fraction

    docs = _t(spark, sf_dir, "documents")
    return top_ngram_fraction(docs, "text", "doc_id", n=3)


@_register(
    "text_line_repetition",
    r"""
    WITH segs AS (
      SELECT doc_id, trim(s) AS s
      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS s
            FROM documents)
      WHERE trim(s) <> ''
    ),
    ps AS (SELECT doc_id, s, count(*) AS cnt FROM segs GROUP BY doc_id, s),
    pd AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_segments,
             round(sum(cnt - 1) * 1.0 / sum(cnt), 6) AS dup_frac,
             round(sum((cnt - 1) * length(s)) * 1.0
                   / sum(cnt * length(s)), 6) AS dup_char_frac
      FROM ps GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(pd.n_segments, 0) AS BIGINT) AS n_segments,
           pd.dup_frac,
           pd.dup_char_frac
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def text_line_repetition(spark, sf_dir):
    """Gopher's duplicate line fraction + duplicate line CHARACTER
    fraction (Rae et al. 2021 App. A1.1, L72 — the segment half of the
    repetition rule set, completing it next to the dup/top n-gram
    fractions): repeats counted all-but-first per distinct line, both
    by count and by character mass (ops/text.py:line_repetition_stats;
    the paragraph form is the same op with a paragraph separator)."""
    from outpost_spark.ops.text import line_repetition_stats

    docs = _t(spark, sf_dir, "documents")
    return line_repetition_stats(docs, "text", "doc_id")


@_register(
    "sample_temperature_mix",
    f"""
    WITH s AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ),
    z AS (SELECT sum(pow(n, 0.5)) AS z FROM s),
    r AS (
      SELECT lang,
             round(least(1.0, 200.0 * pow(n, 0.5) / (SELECT z FROM z) / n), 9)
               AS rate
      FROM s
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
    WHERE {_HASH_FRAC_SQL.format(seed="temp")} < r.rate
    """,
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-flattened domain mixing (mT5/XLM-R sampling rule,
    alpha=0.5, ~200-doc target): per-language keep rates derived from
    the language masses IN-PLAN (one tiny groupBy + broadcast rate
    table + codegen filter — the corpus never shuffles), low-resource
    languages boosted relative to proportional sampling
    (ops/sampling.py:sample_temperature_mix)."""
    from outpost_spark.ops.sampling import sample_temperature_mix

    docs = _t(spark, sf_dir, "documents")
    return sample_temperature_mix(
        docs, "lang", "doc_id", target_total=200, alpha=0.5
    ).select("doc_id", "lang")


@_register(
    "sample_shard_manifest",
    r"""
    WITH sh AS (
      SELECT doc_id, n_chars,
             CAST(CAST(('0x' || substr(md5('shuffle|shard|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS INT) AS shard
      FROM documents
    ),
    sub AS (
      SELECT shard,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS sb,
             count(*) AS n_docs,
             sum(n_chars) AS mass,
             md5(string_agg(CAST(doc_id AS VARCHAR), ','
                 ORDER BY CAST(doc_id AS VARCHAR))) AS sub_md5
      FROM sh
      GROUP BY shard, sb
    )
    SELECT shard,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(mass) AS BIGINT) AS mass,
           md5(string_agg(sub_md5, ',' ORDER BY sub_md5)) AS ids_checksum
    FROM sub
    GROUP BY shard
    """,
)
def sample_shard_manifest(spark, sf_dir):
    """Per-shard reproducibility manifest (r07, bounded r08): doc count,
    token/char mass, and a TWO-LEVEL order-canonical checksum — md5 per
    (shard, id-hash sub-bucket) over the sorted sub-list, then md5 over
    the sorted sub-checksums — the record a training job stores next to
    its shards so any later rebuild can verify byte-for-byte membership
    before training, with per-group aggregation state bounded by the
    sub-bucket size instead of the whole shard's id list
    (ops/sampling.py:shard_manifest, composed over the deterministic
    shard assignment)."""
    from outpost_spark.ops.sampling import assign_shuffled_shards, shard_manifest

    docs = _t(spark, sf_dir, "documents")
    sharded = assign_shuffled_shards(
        docs.select("doc_id", "n_chars"), "doc_id", n_shards=16
    ).join(docs.select("doc_id", "n_chars"), "doc_id")
    return shard_manifest(
        sharded, "shard", "doc_id", weight_col="n_chars", sub_buckets=64
    )


@_register(
    "text_redact_pii",
    r"""
    WITH d AS (
      SELECT doc_id,
             text || CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@example.com now'
               WHEN 1 THEN ' server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 down'
               WHEN 2 THEN ' call +1 555-123-4567 today'
               ELSE ''
             END AS text
      FROM documents
    )
    -- counts run on the PROGRESSIVELY-redacted text (pattern i counted
    -- after patterns 1..i-1 replaced), so n_X == inserted <X> markers
    , r1 AS (
      SELECT doc_id, text,
             regexp_replace(text,
               '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM d
    ),
    r2 AS (
      SELECT doc_id, text, t1,
             regexp_replace(t1,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS t2
      FROM r1
    )
    SELECT doc_id,
           regexp_replace(t2,
             '(?:\+\d{1,3}[-. ]?)?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]\d{3,4}\b', '<PHONE>', 'g')
             AS redacted_text,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t1,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t2,
             '(?:\+\d{1,3}[-. ]?)?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]\d{3,4}\b')) AS BIGINT) AS n_phones
    FROM r2
    """,
)
def text_redact_pii(spark, sf_dir):
    """PII redaction (r08, L68): emails / IPv4s / phone-shaped numbers
    replaced with typed placeholders plus per-type match counts — the
    in-place scrubbing pass (ROOTS/RedPajama-v2 style) a pre-training
    pipeline runs where C4 would drop the whole page.  Deterministic
    PII is synthesized onto the corpus (the dedup_url_canonical
    pattern) so the entry exercises every pattern; three chained
    regexp_replace + three counts, all codegen, RE2-portable
    (ops/text.py:redact_pii)."""
    from outpost_spark.ops.text import redact_pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact bob"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" server 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1 down"),
                ),
            )
            .when(F.col("doc_id") % 4 == 2, F.lit(" call +1 555-123-4567 today"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(docs, "text", "doc_id")


@_register(
    "sample_stratified_quota",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_HASH_FRAC_SQL.format(seed="strata")} ASC, doc_id ASC) AS rn
      FROM documents) t
    WHERE rn <= 3
    """,
)
def sample_stratified_quota(spark, sf_dir):
    """Quota sampling: at most 3 documents per language, picked in
    hash-fraction order — the deterministic way to cap over-represented
    strata when assembling a training mix."""
    from outpost_spark.ops.sampling import stratified_quota

    docs = _t(spark, sf_dir, "documents")
    return stratified_quota(docs, ["lang"], 3, "doc_id").select("lang", "doc_id")


@_register(
    "dedup_url_canonical",
    r"""
    WITH d AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'https://www.example.com/page/' || CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed'
               WHEN 1 THEN 'http://example.com/page/' || CAST(doc_id % 100 AS VARCHAR) || '/'
               ELSE 'HTTPS://Example.COM/page/' || CAST(doc_id % 100 AS VARCHAR) || '#frag'
             END AS url
      FROM documents
    ),
    n AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   lower(regexp_replace(regexp_replace(url, '#.*$', ''), '\?.*$', '')),
                   '^https?://', ''),
                 '^www\.', ''),
               '/+$', '') AS canonical_url
      FROM d
    )
    SELECT canonical_url,
           min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS copies
    FROM n GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """URL-level dedup (the crawl-frontier step BEFORE content dedup):
    scheme/www/case/query/fragment/trailing-slash variants of the same
    resource collapse to one canonical URL.  The corpus has no URL
    column, so a deterministic one is derived (three variant shapes of
    doc_id % 100 resources — every normalization rule does real work in
    the parity hash)."""
    from outpost_spark.ops.text import dedup_by_url

    docs = _t(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 100).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://www.example.com/page/"), page, F.lit("?utm_source=feed")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("http://example.com/page/"), page, F.lit("/")),
        )
        .otherwise(F.concat(F.lit("HTTPS://Example.COM/page/"), page, F.lit("#frag")))
    )
    return dedup_by_url(docs.withColumn("url", url), "url", "doc_id")


def _cross_pairs_sql() -> str:
    jac = """round(CASE WHEN len(list_distinct(list_concat(ga.widehash, gb.widehash))) > 0
                 THEN len(list_intersect(ga.widehash, gb.widehash)) * 1.0
                      / len(list_distinct(list_concat(ga.widehash, gb.widehash)))
                 ELSE 0.0 END, 6)"""
    return f"""
    WITH {_sigs_sql("documents", "t")},
    {_sigs_sql("(SELECT * FROM documents WHERE doc_id % 17 = 3)", "b")},
    cands AS (
      SELECT DISTINCT t.doc_id AS train_id, b.doc_id AS bench_id
      FROM tsigs t JOIN bsigs b ON (
           t.minhash[1:4]   = b.minhash[1:4]
        OR t.minhash[5:8]   = b.minhash[5:8]
        OR t.minhash[9:12]  = b.minhash[9:12]
        OR t.minhash[13:16] = b.minhash[13:16])
    )
    SELECT train_id, bench_id, {jac} AS jaccard
    FROM cands
    JOIN tbase ga ON ga.doc_id = cands.train_id
    JOIN bbase gb ON gb.doc_id = cands.bench_id
    WHERE {jac} >= 0.7
    """


@_register("dedup_cross_corpus_near_dups", None)  # SQL attached below
def dedup_cross_corpus_near_dups(spark, sf_dir):
    """Document-level decontamination: which training documents are
    near-dups (MinHash+LSH, exact-Jaccard >= 0.7) of ANY benchmark
    document.  Benchmark = the deterministic doc_id % 17 == 3 slice, so
    every benchmark doc finds its own training copy at J=1 plus the
    corpus's planted near-dups — non-vacuous by construction.  The
    train-vs-benchmark bucket join never forms a self-product; the small
    benchmark side broadcasts under AQE."""
    from outpost_spark.ops.dedup import minhash_cross_pairs

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    return minhash_cross_pairs(docs, bench, "doc_id", "text", threshold=0.7)


_REGISTRY["dedup_cross_corpus_near_dups"] = (
    _REGISTRY["dedup_cross_corpus_near_dups"][0],
    _cross_pairs_sql(),
)


@_register(
    "dedup_substrings_global",
    """
    WITH docs AS (SELECT doc_id, text FROM documents),
    w AS (
      SELECT doc_id, CAST(i AS INT) AS pos, md5(substr(text, CAST(i AS INT), 40)) AS h
      FROM docs, unnest(range(1, greatest(length(text) - 40 + 1, 0) + 1)) AS t(i)
    ),
    f1 AS (SELECT h, min(doc_id) AS fd FROM w GROUP BY h),
    f2 AS (SELECT w.h, min(w.pos) AS fp
           FROM w JOIN f1 ON w.h = f1.h AND w.doc_id = f1.fd GROUP BY w.h),
    rem AS (
      SELECT DISTINCT w.doc_id, CAST(p AS INT) AS p
      FROM w JOIN f1 ON w.h = f1.h JOIN f2 ON w.h = f2.h,
           unnest(range(w.pos, w.pos + 40)) AS u(p)
      WHERE NOT (w.doc_id = f1.fd AND w.pos = f2.fp)
    ),
    chars AS (
      SELECT doc_id, CAST(i AS INT) AS i, substr(text, CAST(i AS INT), 1) AS ch
      FROM docs, unnest(range(1, length(text) + 1)) AS t(i)
    ),
    kept AS (
      SELECT c.doc_id, c.i, c.ch
      FROM chars c LEFT JOIN rem r ON c.doc_id = r.doc_id AND c.i = r.p
      WHERE r.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(ch, '' ORDER BY i) AS text_clean
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.text_clean, '') AS text_clean,
           CAST(length(d.text) - length(coalesce(a.text_clean, '')) AS INT) AS n_removed
    FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def dedup_substrings_global(spark, sf_dir):
    """Substring-level exact dedup (Lee et al. granularity: document >
    paragraph > substring): every character covered by a 40-char window
    already seen earlier in the corpus is cut; first global (doc, pos)
    occurrence keeps its text.  The corpus's planted duplicate documents
    make later copies collapse to empty — non-vacuous by construction.
    The oracle reconstructs cleaned text character-by-character from the
    same removed-position set (the Spark side cuts merged spans with a
    fold — identical result, corpus-scale shape)."""
    from outpost_spark.ops.dedup import dedup_substrings

    docs = _t(spark, sf_dir, "documents")
    return dedup_substrings(docs, "text", "doc_id", window=40)


@_register(
    "pipeline_curate_corpus",
    None,  # composed SQL built programmatically below (_curate_sql)
)
def pipeline_curate_corpus(spark, sf_dir):
    """End-to-end corpus curation as ONE plan: quality gate -> language
    gate -> exact dedup (min id per digest) -> MinHash near-dup collapse
    -> deterministic 90/5/5 split.  Output (doc_id, split) is the corpus a
    training run would read; every stage is a standalone catalog op, this
    entry pins their composition."""
    from outpost_spark.ops.pipeline import curate_corpus

    return curate_corpus(_t(spark, sf_dir, "documents"))


@_register(
    "dedup_simhash",
    None,  # placeholder replaced below (SQL built programmatically)
)
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash fingerprints over whitespace tokens (pure exprs)."""
    from outpost_spark.ops.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, "text", bits=32).select("doc_id", "simhash")


_SIMHASH_BITS_SQL = " + ".join(
    f"CASE WHEN coalesce(list_sum(list_transform(hashes, h -> ((h >> {b}) & 1) * 2 - 1)), 0) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(32)
)
_REGISTRY["dedup_simhash"] = (
    _REGISTRY["dedup_simhash"][0],
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             list_transform(t, tok -> CAST(('0x' || substr(md5('0|' || tok), 1, 8)) AS BIGINT)) AS hashes
      FROM toks
    )
    SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash FROM hashed
    """,
)


@_register(
    "dedup_simhash_pairs",
    None,  # placeholder replaced below (shares the simhash CTE SQL)
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS: band-of-bits equi-join (pigeonhole: within
    Hamming r, at least one of r+1 bands matches exactly) + exact
    ``bit_count(xor)`` verify — completes the dedup family (fingerprints
    alone don't pair)."""
    from outpost_spark.ops.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", bits=32, max_hamming=3)


_REGISTRY["dedup_simhash_pairs"] = (
    _REGISTRY["dedup_simhash_pairs"][0],
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             list_transform(t, tok -> CAST(('0x' || substr(md5('0|' || tok), 1, 8)) AS BIGINT)) AS hashes
      FROM toks
    ),
    sims AS (SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash FROM hashed),
    bands AS (
      SELECT doc_id, simhash, b, (simhash >> (b * 8)) % 256 AS bv
      FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
    FROM bands l JOIN bands r ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
    """,
)


_TOKS_SQL = r"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS t
      FROM documents
    )
"""


@_register(
    "text_chunk_documents",
    f"""
    WITH {_TOKS_SQL},
    s AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    starts AS (
      SELECT doc_id, t, n,
             unnest(range(0, greatest(CAST(ceil((n - 64) / 48.0) AS BIGINT), 0) * 48 + 1, 48)) AS st
      FROM s
    )
    SELECT doc_id,
           CAST(st // 48 AS INT) AS chunk_idx,
           array_to_string(t[st + 1 : st + 64], ' ') AS chunk_text,
           CAST(least(n - st, 64) AS INT) AS n_tokens
    FROM starts
    """,
)
def text_chunk_documents(spark, sf_dir):
    """Token-window chunking (64-token windows, 16-token overlap) — the
    standard pre-training/embedding chunking step, as one codegen'd
    expression pipeline (posexplode is the only row multiplication)."""
    from outpost_spark.ops.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", max_tokens=64, overlap=16)


@_register(
    "dedup_ngram_contamination",
    f"""
    WITH {_TOKS_SQL},
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 7, 0) + 1),
               i -> md5(array_to_string(t[i : i + 7], ' '))))) AS gram
      FROM toks
    ),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
    hits AS (
      SELECT g.doc_id, count(DISTINCT g.gram) AS matched_ngrams
      FROM g JOIN bg USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(h.matched_ngrams, 0) AS matched_ngrams,
           coalesce(h.matched_ngrams, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def dedup_ngram_contamination(spark, sf_dir):
    """Test-set decontamination: flag training documents sharing any word
    8-gram with a benchmark set (here: the deterministic doc_id % 50 = 0
    subset, which plants guaranteed hits — the subset itself and its
    duplicates).  Hashed (gram, id) pairs meet in an equi-join; the
    benchmark gram set broadcasts."""
    from outpost_spark.ops.dedup import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return ngram_contamination(docs, bench, n=8)


@_register(
    "dedup_paragraphs_global",
    """
    WITH d2 AS (
      SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents
    ),
    p0 AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x <> '') AS paras
      FROM d2
    ),
    ph AS (
      SELECT doc_id, pos, md5(para) AS h FROM (
        SELECT doc_id, unnest(paras) AS para, unnest(range(0, len(paras))) AS pos
        FROM p0)
    ),
    f1 AS (SELECT h, min(doc_id) AS fd FROM ph GROUP BY h),
    f2 AS (SELECT ph.h, min(ph.pos) AS fp
           FROM ph JOIN f1 ON ph.h = f1.h AND ph.doc_id = f1.fd GROUP BY ph.h),
    kept AS (
      SELECT ph.doc_id, ph.pos
      FROM ph JOIN f1 ON ph.h = f1.h JOIN f2 ON ph.h = f2.h
      WHERE ph.doc_id = f1.fd AND ph.pos = f2.fp
    ),
    ks AS (SELECT doc_id, list_sort(list(pos)) AS keep FROM kept GROUP BY doc_id)
    SELECT p0.doc_id,
           coalesce(array_to_string(
             list_transform(ks.keep, i -> p0.paras[CAST(i AS INT) + 1]), chr(10)), '') AS text_clean,
           CAST(coalesce(len(ks.keep), 0) AS INT) AS n_kept,
           CAST(len(p0.paras) - coalesce(len(ks.keep), 0) AS INT) AS n_removed
    FROM p0 LEFT JOIN ks ON p0.doc_id = ks.doc_id
    """,
)
def dedup_paragraphs_global(spark, sf_dir):
    """Global paragraph dedup (the C4/RefinedWeb curation step): repeated
    paragraphs survive only at their first global (doc, position)
    occurrence; documents are rebuilt from survivors.  The synthetic
    corpus has no newlines, so a deterministic paragraph structure is
    derived first (the word 'table' becomes a paragraph break —
    identical replace in both engines), which plants genuine cross-
    document shared paragraphs via the corpus's duplicate documents."""
    from outpost_spark.ops.dedup import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), " table ", "\n")
    )
    return dedup_paragraphs(docs, "text", "doc_id")


@_register(
    "dedup_ngram_jaccard_grouped",
    """
    WITH g AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               list_distinct(list_transform(
                 range(1, greatest(length(lower(text)) - 2, 0) + 1),
                 i -> substr(lower(text), CAST(i AS INT), 3))),
               s -> CAST(('0x' || substr(md5('g|' || s), 1, 8)) AS BIGINT))) AS grams
      FROM documents
    )
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(l.grams, r.grams))) > 0
                 THEN len(list_intersect(l.grams, r.grams)) * 1.0
                      / len(list_distinct(list_concat(l.grams, r.grams)))
                 ELSE 0.0 END, 6) AS jaccard
    FROM g l JOIN g r ON l.lang = r.lang AND l.doc_id < r.doc_id
    WHERE CASE WHEN len(list_distinct(list_concat(l.grams, r.grams))) > 0
          THEN len(list_intersect(l.grams, r.grams)) * 1.0
               / len(list_distinct(list_concat(l.grams, r.grams)))
          ELSE 0.0 END >= 0.5
    """,
)
def dedup_ngram_jaccard_grouped(spark, sf_dir):
    """Exact 3-gram Jaccard pairs, blocked by language (bounded quadratic)."""
    from outpost_spark.ops.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, group_col="lang"
    )


_COSINE_SQL = """
      round(CASE WHEN sqrt(list_sum(list_transform(a, x -> x * x)))
                   * sqrt(list_sum(list_transform(b, x -> x * x))) > 0
            THEN list_sum(list_transform(range(1, 65), i -> a[i] * b[i]))
                 / (sqrt(list_sum(list_transform(a, x -> x * x)))
                    * sqrt(list_sum(list_transform(b, x -> x * x))))
            ELSE 0.0 END, 6)
"""


@_register(
    "embed_cosine_topk",
    f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS b FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, {_COSINE_SQL} AS score
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a FROM embeddings), q
    )
    SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 20
    """,
)
def embed_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (baseline ANN path)."""
    from outpost_spark.ops.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return cosine_topk(emb, "embedding", query, id_col="vec_id", k=20)



# Deterministic planted-near-dup augmentation shared by embed_near_dup_pairs
# and embed_semantic_dedup: a perturbed copy of the first 20 vectors
# (+0.001 on dims 9..64; dims 1..8 untouched so sign buckets are provably
# preserved).  ONE definition on each side — the constants are a
# cross-engine parity contract.
_PERT_SRC_SQL = """raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    src AS (
      SELECT vec_id, v FROM raw
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(range(1, 65),
                            i -> CASE WHEN i >= 9 THEN v[i] + 0.001 ELSE v[i] END)
      FROM raw WHERE vec_id < 20
    )"""


def _perturbed_embeddings(spark, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i >= 8, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


_SIGNBUCKET_SQL = " + ".join(
    f"CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(8)
)


@_register(
    "embed_ann_lsh_topk",
    f"""
    WITH b AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             CAST({_SIGNBUCKET_SQL} AS INT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT v AS b, bucket AS qbucket FROM b WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
           round(CASE WHEN sqrt(list_sum(list_transform(a, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.b, x -> x * x))) > 0
                 THEN list_sum(list_transform(range(1, 65), i -> a[i] * q.b[i]))
                      / (sqrt(list_sum(list_transform(a, x -> x * x)))
                         * sqrt(list_sum(list_transform(q.b, x -> x * x))))
                 ELSE 0.0 END, 6) AS score
      FROM (SELECT vec_id, v AS a, bucket FROM b) s, q
      WHERE s.bucket = q.qbucket
    )
    SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def embed_ann_lsh_topk(spark, sf_dir):
    """ANN: sign-LSH bucket prefilter, exact cosine within the bucket."""
    from outpost_spark.ops.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return cosine_topk_lsh(emb, "embedding", query, id_col="vec_id", k=10, bits=8)


# plan-time IVF seed centroids per (sf_dir, n) (n x 64 doubles — tiny);
# re-collecting them per invocation would cost a whole Spark job each time
_IVF_SEED_CACHE: dict = {}


def _ivf_seeds(spark, sf_dir: str, n: int) -> list:
    key = (sf_dir, n)
    if key not in _IVF_SEED_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        _IVF_SEED_CACHE[key] = [
            list(r["v"])
            for r in emb.filter(F.col("vec_id") < n)
            .orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect()
        ]
    return _IVF_SEED_CACHE[key]


def _pq_sample(spark, sf_dir: str, n: int = 16) -> list:
    """The PQ entries' plan-time constants — the n training vectors
    (oracle definition: ``vec_id < n``, ascending) — via ONE pushed-down
    filter collect shared by all three ``embed_pq_*`` entries.  Replaces
    a full-scan TakeOrdered job (``orderBy(vec_id).limit(n)`` inside
    ``pq_train``) plus a separate ``vec_id = 0`` query-fetch job per
    entry: the query vector is ``[0]`` of this same sample (vec_id 0 is
    the oracle's query in every PQ entry).  Verified equivalent to the
    old order/limit selection: vec_id is dense from 0 at every SF, and
    the oracle itself pins the centroid set as ``vec_id < 16``.
    """
    key = (sf_dir, n)
    if key not in _PQ_SAMPLE_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        _PQ_SAMPLE_CACHE[key] = {
            r["vec_id"]: [float(x) for x in r["v"]]
            for r in emb.filter(F.col("vec_id") < n)
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
            .collect()
        }
    return _PQ_SAMPLE_CACHE[key]


_PQ_SAMPLE_CACHE: dict = {}


def _cos_sql(a: str, b: str) -> str:
    return f"""
      round(CASE WHEN sqrt(list_sum(list_transform({a}, x -> x * x)))
                   * sqrt(list_sum(list_transform({b}, x -> x * x))) > 0
            THEN list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))
                 / (sqrt(list_sum(list_transform({a}, x -> x * x)))
                    * sqrt(list_sum(list_transform({b}, x -> x * x))))
            ELSE 0.0 END, 6)
"""


@_register(
    "embed_ann_ivf_topk",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM emb WHERE vec_id < 8),
    scored AS (
      SELECT e.vec_id, s.cid, {_cos_sql("e.v", "s.c")} AS score
      FROM emb e CROSS JOIN cent s
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        FROM scored) t WHERE rn = 1
    ),
    probes AS (SELECT cid FROM scored WHERE vec_id = 0 ORDER BY score DESC, cid ASC LIMIT 2),
    q AS (SELECT v AS b FROM emb WHERE vec_id = 0)
    SELECT e.vec_id, {_cos_sql("e.v", "q.b")} AS score
    FROM emb e JOIN assigned a ON e.vec_id = a.vec_id, q
    WHERE a.cid IN (SELECT cid FROM probes)
    ORDER BY score DESC, e.vec_id ASC LIMIT 10
    """,
)
def embed_ann_ivf_topk(spark, sf_dir):
    """IVF ANN: argmax-cosine list assignment over 8 seed centroids
    (vec_id < 8), probe the query's 2 nearest lists, exact cosine top-10
    within them.  The production layout writes the table partitioned by
    the assignment column so probing prunes files (see
    ``ops.similarity.cosine_topk_ivf``); full Lloyd's training is
    ``train_centroids_kmeans`` (pytest-covered — iterative float means
    are not portably oracle-able)."""
    from outpost_spark.ops.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    seeds = _ivf_seeds(spark, sf_dir, 8)
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return cosine_topk_ivf(emb, "embedding", query, seeds, id_col="vec_id", k=10, nprobe=2)


@_register(
    "embed_knn_join",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM emb WHERE vec_id < 24),
    cscored AS (
      SELECT e.vec_id, s.cid, {_cos_sql("e.v", "s.c")} AS score
      FROM emb e CROSS JOIN cent s
    ),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
      FROM cscored
    ),
    assigned AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 2),
    cand AS (
      SELECT p.vec_id AS sid, a.vec_id AS tid
      FROM probes p JOIN assigned a ON p.cid = a.cid AND p.vec_id <> a.vec_id
    ),
    cs AS (
      SELECT c.sid, c.tid, {_cos_sql("s.v", "t.v")} AS score
      FROM cand c JOIN emb s ON s.vec_id = c.sid JOIN emb t ON t.vec_id = c.tid
    )
    SELECT sid AS src_id, tid AS neighbor_id, score, CAST(rank AS INT) AS rank
    FROM (SELECT sid, tid, score,
                 row_number() OVER (PARTITION BY sid ORDER BY score DESC, tid ASC) AS rank
          FROM cs) t
    WHERE rank <= 3
    """,
)
def embed_knn_join(spark, sf_dir):
    """Batched k-NN join (IVF): EVERY vector -> its top-3 neighbors in one
    plan — the semantic-dedup / retrieval-eval primitive.  24 seed
    centroids (vec_id < 24), 2 probed lists per source; both join
    shuffles carry (cid, id, vec) only and the top-k window sees
    (sid, tid, score) rows with vectors projected away (plan-asserted in
    pytest)."""
    from outpost_spark.ops.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(
        emb, "embedding", _ivf_seeds(spark, sf_dir, 24), id_col="vec_id", k=3, nprobe=2
    )


@_register(
    "embed_knn_join_bulk",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cs AS (
      SELECT s.vec_id AS sid, t.vec_id AS tid, {{_COS}} AS score
      FROM emb s JOIN emb t ON s.vec_id <> t.vec_id
    )
    SELECT sid AS src_id, tid AS neighbor_id, score, CAST(rank AS INT) AS rank
    FROM (SELECT sid, tid, score,
                 row_number() OVER (PARTITION BY sid ORDER BY score DESC, tid ASC) AS rank
          FROM cs) t
    WHERE rank <= 3
    """.replace("{_COS}", _cos_sql("s.v", "t.v")),
)
def embed_knn_join_bulk(spark, sf_dir):
    """Corpus-scale twin of ``embed_knn_join``: BLAS IVF assignment (one
    mapInPandas matrix product) + per-list applyInPandas matmul scoring
    (ops/similarity.py:ivf_assign_bulk/_bulk_scored_pairs) — the path
    that still works when K ~ sqrt(N) centroids make literal-SQL scoring
    impossible.  Run here in the nprobe = nlist DEGENERATE config: every
    list is probed, so IVF pruning cannot drop a candidate, the BLAS
    near-tie assignment ambiguity is irrelevant, and the result provably
    equals brute-force top-k on 6-decimal-rounded scores — giving the
    whole bulk machinery (assignment matrix product, per-list group
    scoring, deterministic composite-key truncation) an EXACT value
    oracle (r07, VERDICT r06 "Next round" #8).  The realistic-nprobe
    config stays pinned by pytest (bulk == expression path) and by the
    1M-vector recall rows in BENCH_SCALE."""
    from outpost_spark.ops.similarity import knn_join_bulk

    emb = _t(spark, sf_dir, "embeddings")
    return knn_join_bulk(
        emb, "embedding", _ivf_seeds(spark, sf_dir, 24), id_col="vec_id",
        k=3, nprobe=24,
    )


@_register(
    "embed_semantic_dedup_bulk",
    f"""
    WITH RECURSIVE {{_PERT}},
    pairs AS (
      SELECT s1.vec_id AS id_a, s2.vec_id AS id_b
      FROM src s1 JOIN src s2 ON s1.vec_id < s2.vec_id
      WHERE {{_COS}} >= 0.95
    ),
    edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(ru, rv) AS (
      SELECT eu, eu FROM edges
      UNION
      SELECT r.ru, e.ev FROM reach r JOIN edges e ON r.rv = e.eu
    ),
    comp AS (SELECT ru AS vid, min(rv) AS component FROM reach GROUP BY ru)
    SELECT s.vec_id FROM src s LEFT JOIN comp c ON s.vec_id = c.vid
    WHERE c.vid IS NULL OR c.vid = c.component
    """.replace("{_PERT}", _PERT_SRC_SQL).replace(
        "{_COS}", _cos_sql("s1.v", "s2.v")
    ),
)
def embed_semantic_dedup_bulk(spark, sf_dir):
    """Corpus-scale twin of ``embed_semantic_dedup`` on the BLAS per-list
    scorer (threshold pairs -> components -> min-id survivors).  Run in
    the nprobe = nlist DEGENERATE config (every list probed, so IVF
    pruning and BLAS assignment near-ties cannot change the pair set):
    the threshold pairs provably equal the all-pairs cosine >= 0.95 set
    on 6-decimal-rounded scores, so the whole bulk machinery gets an
    EXACT survivor-set oracle (r07, VERDICT r06 "Next round" #8).  The
    realistic-nprobe config stays pytest-pinned, with planted
    precision/recall at 1M vectors asserted in BENCH_SCALE."""
    from outpost_spark.ops.similarity import semantic_dedup_bulk

    return semantic_dedup_bulk(
        _perturbed_embeddings(spark, sf_dir),
        "embedding",
        _ivf_seeds(spark, sf_dir, 24),
        id_col="vec_id",
        threshold=0.95,
        nprobe=24,
    )


@_register(
    "embed_knn_join_brute",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cs AS (
      SELECT s.vec_id AS sid, t.vec_id AS tid, {_cos_sql("s.v", "t.v")} AS score
      FROM emb s JOIN emb t ON s.vec_id <> t.vec_id
    )
    SELECT sid AS src_id, tid AS neighbor_id, score, CAST(rank AS INT) AS rank
    FROM (SELECT sid, tid, score,
                 row_number() OVER (PARTITION BY sid ORDER BY score DESC, tid ASC) AS rank
          FROM cs) t
    WHERE rank <= 3
    """,
)
def embed_knn_join_brute(spark, sf_dir):
    """Exact batched k-NN join (O(N^2) baseline for the IVF path) — kept
    oracle-able at sf0.01 where the quadratic cross product is small."""
    from outpost_spark.ops.similarity import knn_join_brute

    emb = _t(spark, sf_dir, "embeddings")
    return knn_join_brute(emb, "embedding", id_col="vec_id", k=3)


@_register(
    "embed_semantic_dedup",
    f"""
    WITH RECURSIVE {_PERT_SRC_SQL},
    cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM raw WHERE vec_id < 24),
    cscored AS (
      SELECT s.vec_id, cent.cid, {_cos_sql("s.v", "cent.c")} AS score
      FROM src s CROSS JOIN cent
    ),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
      FROM cscored
    ),
    assigned AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 2),
    cand AS (
      SELECT DISTINCT least(p.vec_id, a.vec_id) AS id_a,
                      greatest(p.vec_id, a.vec_id) AS id_b
      FROM probes p JOIN assigned a ON p.cid = a.cid AND p.vec_id <> a.vec_id
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN src s1 ON s1.vec_id = c.id_a JOIN src s2 ON s2.vec_id = c.id_b
      WHERE {_cos_sql("s1.v", "s2.v")} >= 0.95
    ),
    edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(ru, rv) AS (
      SELECT eu, eu FROM edges
      UNION
      SELECT r.ru, e.ev FROM reach r JOIN edges e ON r.rv = e.eu
    ),
    comp AS (SELECT ru AS vid, min(rv) AS component FROM reach GROUP BY ru)
    SELECT s.vec_id FROM src s LEFT JOIN comp c ON s.vec_id = c.vid
    WHERE c.vid IS NULL OR c.vid = c.component
    """,
)
def embed_semantic_dedup(spark, sf_dir):
    """Semantic dedup survivors (SemDeDup shape): IVF-blocked embedding
    pairs at cosine >= 0.95 -> connected components -> min-id survivor
    per cluster.  Runs on the embeddings table augmented with the same
    20 deterministic perturbed copies as embed_near_dup_pairs (raw
    vectors have no pairs above threshold), so the entry collapses 20
    real clusters; 24 seed centroids, both probe directions normalized
    least/greatest.  Oracle composes the IVF CTEs with recursive-CTE
    components."""
    from outpost_spark.ops.similarity import semantic_dedup

    return semantic_dedup(
        _perturbed_embeddings(spark, sf_dir),
        "embedding",
        _ivf_seeds(spark, sf_dir, 24),
        id_col="vec_id",
        threshold=0.95,
        nprobe=2,
    )


@_register(
    "embed_quantize_int8",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
      FROM embeddings
    )
    SELECT vec_id,
           round(sc, 9) AS qscale,
           array_to_string(
             CASE WHEN sc > 0
                  THEN list_transform(embedding, x ->
                         CAST(greatest(-127, least(127,
                              floor(CAST(x AS DOUBLE) / sc + 0.5))) AS INT))
                  ELSE list_transform(embedding, x -> 0) END, ',') AS qvec_csv
    FROM s
    """,
)
def embed_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embeddings table —
    the 4x-smaller storage format for embedding columns at corpus scale.
    Explicit half-up rounding (floor(x+0.5)) keeps both engines bit-exact.

    The quantized vector is emitted CSV-joined (``qvec_csv``) rather than
    as ``array<int>``: the driver's canonicalizer sorts result rows with
    pandas, which cannot hash list cells (r04's red row was that crash,
    not a value mismatch — VERDICT r04 "What's wrong" #1).  Same pattern
    as ``routing_match_fanout``'s array output."""
    from outpost_spark.ops.similarity import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb, "embedding").select(
        "vec_id",
        F.round(F.col("qscale"), 9).alias("qscale"),
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
    )


@_register(
    "embed_pq_topk",
    """
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sub AS (
      SELECT vec_id, CAST(j AS INT) AS j, v[j * 8 + 1 : j * 8 + 8] AS sv
      FROM emb, unnest(range(0, 8)) AS t(j)
    ),
    cent AS (
      SELECT CAST(vec_id AS INT) AS c, j, sv AS cv FROM sub WHERE vec_id < 16
    ),
    d2 AS (
      SELECT s.vec_id, s.j, c.c,
             list_sum(list_transform(range(1, 9), i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d
      FROM sub s JOIN cent c ON s.j = c.j
    ),
    codes AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM d2) t
      WHERE rn = 1
    ),
    q AS (SELECT j, sv AS qv FROM sub WHERE vec_id = 0),
    lut AS (
      SELECT c.j, c.c, list_sum(list_transform(range(1, 9), i -> q.qv[i] * c.cv[i])) AS ip
      FROM cent c JOIN q ON c.j = q.j
    ),
    scored AS (
      SELECT codes.vec_id, round(sum(lut.ip), 6) AS score
      FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
      GROUP BY codes.vec_id
    )
    SELECT vec_id, score FROM scored
    ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def embed_pq_topk(spark, sf_dir):
    """Product quantization (Jegou et al.) end-to-end: 8 subspaces x 16
    codes over the 64-dim embeddings (32x compression), ADC top-10 for
    vector 0's query with ZERO Python at query time (the m x k
    inner-product LUT is a plan-time literal; scoring is m element_at
    lookups per row).

    Codebooks here are the oracle-able degenerate of ``pq_train``:
    iters=0 keeps the 16 deterministic sample rows as centroids, so the
    DuckDB oracle reproduces training, encoding (argmin over subspace
    distances, ties to the lowest code), LUT, and ADC ranking exactly.
    Lloyd-refined codebooks (iters>0) are pytest-covered with planted
    near-dup recall + reconstruction-error bounds (tests/test_ops.py).
    """
    from outpost_spark.ops.similarity import pq_encode, pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    sample = _pq_sample(spark, sf_dir, 16)
    books = pq_train(
        emb, "embedding", m=8, k=16, iters=0,
        sample_rows=[sample[i] for i in sorted(sample)],
    )
    q = sample[0]
    return pq_topk(pq_encode(emb, "embedding", books), q, books, k=10)


@_register(
    "embed_pq_topk_rerank",
    """
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sub AS (
      SELECT vec_id, CAST(j AS INT) AS j, v[j * 8 + 1 : j * 8 + 8] AS sv
      FROM emb, unnest(range(0, 8)) AS t(j)
    ),
    cent AS (
      SELECT CAST(vec_id AS INT) AS c, j, sv AS cv FROM sub WHERE vec_id < 16
    ),
    d2 AS (
      SELECT s.vec_id, s.j, c.c,
             list_sum(list_transform(range(1, 9), i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d
      FROM sub s JOIN cent c ON s.j = c.j
    ),
    codes AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM d2) t
      WHERE rn = 1
    ),
    q AS (SELECT j, sv AS qv FROM sub WHERE vec_id = 0),
    lut AS (
      SELECT c.j, c.c, list_sum(list_transform(range(1, 9), i -> q.qv[i] * c.cv[i])) AS ip
      FROM cent c JOIN q ON c.j = q.j
    ),
    adc AS (
      SELECT codes.vec_id, round(sum(lut.ip), 6) AS adc_score
      FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
      GROUP BY codes.vec_id
    ),
    shortlist AS (
      SELECT vec_id FROM adc ORDER BY adc_score DESC, vec_id ASC LIMIT 50
    ),
    qfull AS (SELECT v AS qv FROM emb WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_sum(list_transform(range(1, 65), i -> e.v[i] * qfull.qv[i])), 6) AS score
    FROM emb e JOIN shortlist USING (vec_id), qfull
    ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def embed_pq_topk_rerank(spark, sf_dir):
    """The PRODUCTION-DEFAULT PQ query (VERDICT r12 task #7): ADC
    shortlist + exact rerank (Jegou et al. §IV — quantized scores
    select 50 candidates scanning only the m-byte codes, true inner
    products order them reading full vectors for just those 50 via a
    broadcast semi-join).  BENCH_SCALE measured the trade at 1M x 64d:
    ADC alone recall@10 0.575, +rerank(200) recall 1.0 for ~10% more
    query time — near-free exactness, hence the documented default
    over plain ``embed_pq_topk``.  Same oracle-able degenerate
    codebooks as the ADC entry (iters=0), with the oracle reproducing
    training, encoding, LUT, shortlist, AND the exact rerank."""
    from outpost_spark.ops.similarity import pq_encode, pq_topk_rerank, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    sample = _pq_sample(spark, sf_dir, 16)
    books = pq_train(
        emb, "embedding", m=8, k=16, iters=0,
        sample_rows=[sample[i] for i in sorted(sample)],
    )
    q = sample[0]
    return pq_topk_rerank(
        pq_encode(emb, "embedding", books), emb, q, books, k=10, shortlist=50
    )


@_register(
    "embed_pq_ivf_topk",
    f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM emb WHERE vec_id < 8),
    cscored AS (
      SELECT e.vec_id, s.cid, {{cos}} AS score
      FROM emb e CROSS JOIN cent s
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        FROM cscored) t WHERE rn = 1
    ),
    probes AS (SELECT cid FROM cscored WHERE vec_id = 0 ORDER BY score DESC, cid ASC LIMIT 2),
    sub AS (
      SELECT vec_id, CAST(j AS INT) AS j, v[j * 8 + 1 : j * 8 + 8] AS sv
      FROM emb, unnest(range(0, 8)) AS t(j)
    ),
    pqcent AS (
      SELECT CAST(vec_id AS INT) AS c, j, sv AS cv FROM sub WHERE vec_id < 16
    ),
    d2 AS (
      SELECT s.vec_id, s.j, c.c,
             list_sum(list_transform(range(1, 9), i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d
      FROM sub s JOIN pqcent c ON s.j = c.j
    ),
    codes AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM d2) t
      WHERE rn = 1
    ),
    q AS (SELECT j, sv AS qv FROM sub WHERE vec_id = 0),
    lut AS (
      SELECT c.j, c.c, list_sum(list_transform(range(1, 9), i -> q.qv[i] * c.cv[i])) AS ip
      FROM pqcent c JOIN q ON c.j = q.j
    ),
    adc AS (
      SELECT codes.vec_id, round(sum(lut.ip), 6) AS adc_score
      FROM codes
      JOIN assigned a ON codes.vec_id = a.vec_id
      JOIN lut ON codes.j = lut.j AND codes.c = lut.c
      WHERE a.cid IN (SELECT cid FROM probes)
      GROUP BY codes.vec_id
    ),
    shortlist AS (
      SELECT vec_id FROM adc ORDER BY adc_score DESC, vec_id ASC LIMIT 50
    ),
    qfull AS (SELECT v AS qv FROM emb WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_sum(list_transform(range(1, 65), i -> e.v[i] * qfull.qv[i])), 6) AS score
    FROM emb e JOIN shortlist USING (vec_id), qfull
    ORDER BY score DESC, vec_id ASC LIMIT 10
    """.format(cos=_cos_sql("e.v", "s.c")),
)
def embed_pq_ivf_topk(spark, sf_dir):
    """IVF + PQ composed — the actual 100 TB ANN architecture (Jegou et
    al. §V, IVFADC): the query probes its 2 nearest of 8 IVF lists,
    ADC-scores ONLY those lists' m-byte codes, then exact-reranks a
    50-candidate shortlist from the original vectors.  The two scale
    levers compose: IVF pruning bounds the scan (codes partitioned by
    list id prune at the file level), PQ bounds the bytes per scanned
    row, rerank bounds the full-vector reads to the shortlist.  Same
    oracle-able degenerates as the component entries (seed centroids,
    iters=0 codebooks); the oracle reproduces assignment, probing,
    encoding, LUT, probed-list ADC, shortlist, and the exact rerank."""
    from outpost_spark.ops.similarity import (
        assign_ivf_sql,
        norm_expr,
        pq_encode,
        pq_topk_ivf,
        pq_train,
    )

    emb = _t(spark, sf_dir, "embeddings")
    seeds = _ivf_seeds(spark, sf_dir, 8)
    sample = _pq_sample(spark, sf_dir, 16)
    books = pq_train(
        emb, "embedding", m=8, k=16, iters=0,
        sample_rows=[sample[i] for i in sorted(sample)],
    )
    q = sample[0]
    assigned = (
        emb.withColumn("__vd", F.col("embedding").cast("array<double>"))
        .withColumn("__vn", norm_expr(F.col("__vd")))
        .withColumn("ivf_cid", assign_ivf_sql("__vd", "__vn", seeds))
        .select("vec_id", "ivf_cid")
    )
    codes = pq_encode(emb, "embedding", books).join(assigned, "vec_id")
    return pq_topk_ivf(
        codes, q, books, seeds, k=10, nprobe=2, shortlist=50, vectors_df=emb
    )


@_register(
    "text_gopher_quality",
    r"""
    WITH s AS (SELECT doc_id, text FROM documents),
    w AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x <> '') AS lines
      FROM s
    ),
    m AS (
      SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS swc,
        (length(text) - length(replace(text, '#', ''))) AS n_hash,
        (length(text) - length(replace(text, '...', ''))) / 3
          + length(text) - length(replace(text, chr(8230), '')) AS n_ell,
        len(lines) AS n_lines,
        len(list_filter(lines, x -> starts_with(x, '-') OR starts_with(x, '*')
                                    OR starts_with(x, chr(8226)))) AS n_bullet,
        len(list_filter(lines, x -> ends_with(x, '...') OR ends_with(x, chr(8230)))) AS n_ellline,
        len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        len(list_intersect(list_transform(words, x -> lower(x)),
            ['the','be','to','of','and','that','have','with'])) AS stop_hits
      FROM w
    )
    SELECT doc_id, n_words,
      (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
      coalesce(n_words > 0 AND swc / n_words >= 3 AND swc / n_words <= 10, FALSE) AS ok_mean_word_len,
      coalesce(n_words > 0 AND (n_hash + n_ell) / n_words < 0.1, FALSE) AS ok_symbol_ratio,
      coalesce(NOT (n_lines > 0 AND n_bullet * 1.0 / n_lines >= 0.9), TRUE) AS ok_bullet_lines,
      coalesce(NOT (n_lines > 0 AND n_ellline * 1.0 / n_lines >= 0.3), TRUE) AS ok_ellipsis_lines,
      coalesce(n_words > 0 AND n_alpha * 1.0 / n_words >= 0.8, FALSE) AS ok_alpha_words,
      (stop_hits >= 2) AS ok_stopwords,
      ((n_words >= 50 AND n_words <= 100000)
       AND coalesce(n_words > 0 AND swc / n_words >= 3 AND swc / n_words <= 10, FALSE)
       AND coalesce(n_words > 0 AND (n_hash + n_ell) / n_words < 0.1, FALSE)
       AND coalesce(NOT (n_lines > 0 AND n_bullet * 1.0 / n_lines >= 0.9), TRUE)
       AND coalesce(NOT (n_lines > 0 AND n_ellline * 1.0 / n_lines >= 0.3), TRUE)
       AND coalesce(n_words > 0 AND n_alpha * 1.0 / n_words >= 0.8, FALSE)
       AND (stop_hits >= 2)) AS passes_gopher
    FROM m
    """,
)
def text_gopher_quality(spark, sf_dir):
    """The Gopher document-quality rule set (Rae et al. 2021 App. A1.1)
    as pure codegen Columns: word-count bounds, mean word length,
    symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, required-stopword hits — per-rule booleans plus the AND, so
    curation can histogram WHICH rule rejects."""
    from outpost_spark.ops.text import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"), "text", "doc_id")


@_register(
    "text_top_tokens_approx",
    r"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS token
      FROM documents) t
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def text_top_tokens_approx(spark, sf_dir):
    """L21's single-pass scale path: Misra-Gries summaries per partition
    -> merged candidates -> EXACT recount of candidates (ops/text.py:
    approx_top_tokens).  Counts are never approximate — only candidate
    recall depends on the sketch (guaranteed when the k-th frequency
    exceeds N/(summary_size+1)), so the oracle is the same exact top-k
    SQL as ``text_top_tokens``; the adversarial-tail behavior is
    pytest-pinned."""
    from outpost_spark.ops.text import approx_top_tokens

    return approx_top_tokens(_t(spark, sf_dir, "documents"), "text", k=20)


@_register(
    "sample_token_budget",
    r"""
    WITH t AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k
      FROM documents
    )
    SELECT doc_id, n_chars
    FROM (SELECT doc_id, n_chars, sum(n_chars) OVER (ORDER BY k, doc_id) AS c FROM t) z
    WHERE c <= 60000
    """,
)
def sample_token_budget(spark, sf_dir):
    """Token-budget sampling ("give me ~60k chars of this corpus"):
    keep documents while the hash-ordered running total stays within
    budget (ops/sampling.py:sample_by_token_budget).  The oracle is the
    literal global cumulative window; the Spark plan never sorts the
    corpus — order-aligned hash buckets pass whole via filter and only
    the single boundary bucket runs the exact window."""
    from outpost_spark.ops.sampling import sample_by_token_budget

    docs = _t(spark, sf_dir, "documents")
    return sample_by_token_budget(docs, "doc_id", "n_chars", 60000)


@_register(
    "sample_token_budget_bpe",
    r"""
    WITH t AS (
      SELECT doc_id,
             coalesce(CAST(list_sum(list_transform(
                 regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'),
                 p -> CASE WHEN regexp_matches(p, '^[A-Za-z]+$')
                           THEN CAST(ceil(length(p) / 4.0) AS BIGINT)
                           ELSE 1 END)) AS BIGINT), 0) AS n_bpe_tokens,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k
      FROM documents
    )
    SELECT doc_id, n_bpe_tokens
    FROM (SELECT doc_id, n_bpe_tokens, k,
                 sum(n_bpe_tokens) OVER (ORDER BY k, doc_id) AS c FROM t) z
    WHERE c <= 30000
    """,
)
def sample_token_budget_bpe(spark, sf_dir):
    """Token-budget sampling denominated in (approximate) BPE tokens —
    the combination modern budgets actually mean ("give me 50B tokens"):
    the codegen BPE count (text_token_stats_bpe) feeds the bucketed
    no-global-sort budget prefix (sample_token_budget).  Both pieces and
    their composition are exact DuckDB oracles."""
    from outpost_spark.ops.sampling import sample_by_token_budget
    from outpost_spark.ops.text import bpe_token_count_expr

    docs = _t(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens")
    )
    return sample_by_token_budget(weighted, "doc_id", "n_bpe_tokens", 30000)


# A real tokenizer can't run in SQL, but the budget prefix downstream of
# it is pure SQL: the Spark entry persists the per-doc exact token
# counts from the in-tree BPE encoder to a parquet fixture and the
# oracle re-derives the hash-ordered cumulative-budget window over it —
# only the encoder itself stays pytest-pinned (tests/test_bpe.py:
# frozen-fixture encodes + round-trip decode).  Same graduation trick
# as the image-dedup entries (VERDICT r11 task #5).
_BPE_EXACT_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "bpe_exact_counts",
)

_BPE_EXACT_SQL = f"""
    WITH t AS (
      SELECT doc_id, n_exact_tokens,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k
      FROM read_parquet('{_BPE_EXACT_FIXTURE_DIR}/*.parquet')
    )
    SELECT doc_id, n_exact_tokens
    FROM (SELECT doc_id, n_exact_tokens,
                 sum(n_exact_tokens) OVER (ORDER BY k, doc_id) AS c FROM t) z
    WHERE c <= 30000
"""


@_register("sample_token_budget_bpe_exact", _BPE_EXACT_SQL)
def sample_token_budget_bpe_exact(spark, sf_dir):
    """The EXACT-mode twin of sample_token_budget_bpe: weights come
    from the in-tree pure-Python byte-level BPE (ops/bpe.py, frozen
    trained vocabulary) through exact_token_counts' Arrow-batched UDF,
    then the same bucketed no-global-sort budget prefix.  The weighted
    frame persists to a parquet fixture both engines consume: the
    DuckDB oracle recomputes the hash-ordered cumulative-budget prefix
    over it, so everything but the encoder is value-oracled (the
    encoder is pinned by tests/test_bpe.py's frozen fixtures)."""
    from outpost_spark.ops.sampling import sample_by_token_budget
    from outpost_spark.ops.text import exact_token_counts

    docs = _t(spark, sf_dir, "documents")
    exact_token_counts(
        docs, "text", "doc_id", out_col="n_exact_tokens"
    ).write.mode("overwrite").parquet(_BPE_EXACT_FIXTURE_DIR)
    weighted = spark.read.parquet(_BPE_EXACT_FIXTURE_DIR)
    return sample_by_token_budget(weighted, "doc_id", "n_exact_tokens", 30000)


@_register(
    "join_asof_checkpoint",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    t0 AS (SELECT date_trunc('hour', min(event_time)) AS t0 FROM src),
    cps AS (
      SELECT t.tenant_id,
             t0.t0 + CAST(h AS INT) * INTERVAL 1 HOUR AS cp_time,
             CAST(h * 37 + CAST(t.tenant_id AS BIGINT) % 100 AS BIGINT) AS cp_value
      FROM (SELECT DISTINCT tenant_id FROM src) t, t0, unnest(range(0, 48)) AS u(h)
    )
    SELECT s.event_id,
           CAST(floor(epoch(s.event_time)) AS BIGINT) AS ev_epoch,
           c.cp_value AS asof_cp_value
    FROM src s ASOF LEFT JOIN cps c
      ON s.tenant_id = c.tenant_id AND s.event_time >= c.cp_time
    """,
)
def join_asof_checkpoint(spark, sf_dir):
    """As-of join (kdb+ aj / DuckDB ASOF / merge_asof) — an operator
    Spark has no native node for, re-expressed as union + one per-key
    window carrying the last right-side values forward (ops/joins.py:
    no join node at all, one shuffle per side).  Each event picks up the
    latest hourly tenant checkpoint at or before its time; the oracle is
    DuckDB's NATIVE ASOF LEFT JOIN, so the tie/no-match semantics are
    pinned against a reference implementation, not a mirror."""
    from outpost_spark.ops.joins import asof_join

    ev = _events(spark, sf_dir).select("event_id", "tenant_id", "event_time")
    t0 = ev.agg(F.date_trunc("hour", F.min("event_time")).alias("t0"))
    cps = (
        ev.select("tenant_id").distinct()
        .crossJoin(F.broadcast(t0))
        .select(
            "tenant_id",
            F.explode(F.sequence(F.lit(0), F.lit(47))).alias("h"),
            "t0",
        )
        .select(
            "tenant_id",
            F.timestamp_seconds(
                F.unix_timestamp("t0") + F.col("h") * 3600
            ).alias("cp_time"),
            (F.col("h") * 37 + F.col("tenant_id").cast("bigint") % 100)
            .cast("bigint")
            .alias("cp_value"),
        )
    )
    out = asof_join(
        ev, cps, on="tenant_id", left_ts="event_time", right_ts="cp_time",
        right_cols=["cp_value"],
    )
    return out.select(
        "event_id",
        F.floor(F.unix_timestamp("event_time")).cast("bigint").alias("ev_epoch"),
        F.col("asof_cp_value"),
    )


@_register(
    "join_asof_bucketed",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    t0 AS (SELECT date_trunc('hour', min(event_time)) AS t0 FROM src),
    cps AS (
      SELECT t.tenant_id,
             t0.t0 + CAST(h AS INT) * INTERVAL 1 HOUR AS cp_time,
             CAST(h * 37 + CAST(t.tenant_id AS BIGINT) % 100 AS BIGINT) AS cp_value
      FROM (SELECT DISTINCT tenant_id FROM src) t, t0, unnest(range(0, 48)) AS u(h)
    )
    SELECT s.event_id,
           CAST(floor(epoch(s.event_time)) AS BIGINT) AS ev_epoch,
           c.cp_value AS asof_cp_value
    FROM src s ASOF LEFT JOIN cps c
      ON s.tenant_id = c.tenant_id AND s.event_time >= c.cp_time
    """,
)
def join_asof_bucketed(spark, sf_dir):
    """The HOT-KEY carry mode of the as-of join: identical semantics to
    ``join_asof_checkpoint`` (same DuckDB native ASOF LEFT JOIN oracle)
    through the two-pass bucketed plan — pass 1 carries within (key,
    2-hour bucket) sub-partitions so no single task owns a whole hot
    key, pass 2 carries bucket boundaries via a per-key window over one
    summary row per bucket (ops/joins.py:asof_join bucket_seconds)."""
    from outpost_spark.ops.joins import asof_join

    ev = _events(spark, sf_dir).select("event_id", "tenant_id", "event_time")
    t0 = ev.agg(F.date_trunc("hour", F.min("event_time")).alias("t0"))
    cps = (
        ev.select("tenant_id").distinct()
        .crossJoin(F.broadcast(t0))
        .select(
            "tenant_id",
            F.explode(F.sequence(F.lit(0), F.lit(47))).alias("h"),
            "t0",
        )
        .select(
            "tenant_id",
            F.timestamp_seconds(
                F.unix_timestamp("t0") + F.col("h") * 3600
            ).alias("cp_time"),
            (F.col("h") * 37 + F.col("tenant_id").cast("bigint") % 100)
            .cast("bigint")
            .alias("cp_value"),
        )
    )
    out = asof_join(
        ev, cps, on="tenant_id", left_ts="event_time", right_ts="cp_time",
        right_cols=["cp_value"], bucket_seconds=7200,
    )
    return out.select(
        "event_id",
        F.floor(F.unix_timestamp("event_time")).cast("bigint").alias("ev_epoch"),
        F.col("asof_cp_value"),
    )


@_register(
    "join_range_windows",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    t0 AS (SELECT date_trunc('hour', min(event_time)) AS t0 FROM src),
    iv AS (
      SELECT t.tenant_id, CAST(i AS BIGINT) AS win,
             t0.t0 + CAST(i * 6 AS INT) * INTERVAL 1 HOUR AS ws,
             t0.t0 + CAST(i * 6 + 2 AS INT) * INTERVAL 1 HOUR AS we
      FROM (SELECT DISTINCT tenant_id FROM src) t, t0, unnest(range(0, 4)) AS u(i)
    )
    SELECT s.event_id, iv.win
    FROM src s JOIN iv
      ON s.tenant_id = iv.tenant_id AND s.event_time >= iv.ws AND s.event_time <= iv.we
    """,
)
def join_range_windows(spark, sf_dir):
    """Range (interval-containment) join — naively a cartesian in Spark;
    re-expressed as bin-and-verify (ops/joins.py): intervals explode to
    their overlapped fixed-width bins, facts hash to one bin, an
    equi-join on (tenant, bin) replaces the cross product, exact BETWEEN
    verifies.  Events matched into per-tenant 2-hour maintenance windows
    every 6 hours; oracle = the literal BETWEEN join."""
    from outpost_spark.ops.joins import range_join

    ev = _events(spark, sf_dir).select("event_id", "tenant_id", "event_time")
    t0 = ev.agg(F.date_trunc("hour", F.min("event_time")).alias("t0"))
    iv = (
        ev.select("tenant_id").distinct()
        .crossJoin(F.broadcast(t0))
        .select(
            "tenant_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "t0",
        )
        .select(
            "tenant_id",
            F.col("i").cast("bigint").alias("win"),
            F.timestamp_seconds(F.unix_timestamp("t0") + F.col("i") * 21600).alias("ws"),
            F.timestamp_seconds(
                F.unix_timestamp("t0") + F.col("i") * 21600 + 7200
            ).alias("we"),
        )
    )
    out = range_join(
        ev, iv.select("tenant_id", "win", "ws", "we"),
        on="tenant_id", fact_ts="event_time", start_col="ws", end_col="we",
        bin_width_seconds=3600,
    )
    return out.select("event_id", F.col("iv_win").alias("win"))


@_register(
    "pack_training_sequences",
    r"""
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_assignments,
           TRUE AS pack_within_budget,
           CAST(n_chars AS BIGINT) AS seq_len
    FROM documents
    """,
)
def pack_training_sequences(spark, sf_dir):
    """Sequence packing (ops/packing.py): documents best-fit-decreasing
    packed into 2048-char training sequences by their n_chars.  The
    packing ASSIGNMENT is algorithm-defined (BFD inside hash groups) and
    not SQL-expressible, so the entry emits the per-doc INVARIANT
    projection derived from the actual packing — every doc assigned
    exactly once, its pack's total within budget, its length conserved —
    which an oracle CAN check by value (r07, VERDICT r06 "Next round"
    #8; a violated invariant surfaces as a value mismatch, e.g.
    n_assignments=2 or pack_within_budget=false).  The raw assignment
    (optimality, fill ratio, determinism) stays pytest-pinned."""
    from outpost_spark.ops.packing import pack_sequences

    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", max_len=2048, n_groups=8)
    # pack totals via a window over the SAME frame — a join against
    # packed's own lineage would evaluate the Python packing stage twice
    # (measured 2.2x in the r07 A/B)
    tot = F.sum("seq_len").over(Window.partitionBy("pack_group", "pack_id"))
    return (
        packed.withColumn("__tot", tot)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assignments"),
            F.min(F.col("__tot") <= 2048).alias("pack_within_budget"),
            F.max("seq_len").cast("bigint").alias("seq_len"),
        )
    )


@_register(
    "sink_format_kinesis",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           'bench-stream' AS stream_name,
           '{{"data":' || data || ',"metadata":{{"event-id":"' || event_id ||
           '","timestamp":"2024-01-02T03:04:05Z","topic":"' || topic || '"}}}}' AS data,
           event_id AS partition_key
    FROM src
    """,
)
def sink_format_kinesis(spark, sf_dir):
    """S6 Format surface: the Kinesis PutRecord shape with metadata-in-
    payload (routing/sinkformats.py) — Go-sorted envelope keys, merged
    metadata marshaled key-sorted, event-id partition-key fallback.  The
    oracle reconstructs the exact envelope bytes (event metadata is empty
    here, so the merged map is the three system keys in sorted order).
    Default-template path is zero-Python (plan-asserted in pytest)."""
    from datetime import datetime, timezone

    from outpost_spark.routing.sinkformats import format_kinesis

    events = _events(spark, sf_dir).withColumn(
        "metadata", F.create_map().cast("map<string,string>")
    )
    return format_kinesis(
        events,
        stream_name="bench-stream",
        ts=F.lit(datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)),
        metadata_in_payload=True,
    )


@_register(
    "sink_format_s3",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           'bench-bucket' AS bucket,
           '2024-01-02T03:04:05Z_' || event_id || '.json' AS key,
           data AS body,
           'application/json' AS content_type,
           to_base64(from_hex(sha256(data))) AS checksum_sha256,
           'STANDARD' AS storage_class
    FROM src
    """,
)
def sink_format_s3(spark, sf_dir):
    """S6 Format surface: the S3 PutObject shape (routing/sinkformats.py
    format_s3) — default key template (rfc3339-nano of event.Time,
    trailing zeros stripped, then event id), base64 SHA-256 body
    checksum, content type, storage class; the key's time fields come
    from the EVENT time (destawss3.go:266-270), pinned here with a
    whole-second literal so both engines format it identically.  The
    metadata map is pytest-covered (map columns don't hash portably);
    delivery itself is deliver_s3 with the checksum enforced
    server-side."""
    from datetime import datetime, timezone

    from outpost_spark.routing.sinkformats import format_s3

    ts = datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    events = (
        _events(spark, sf_dir)
        .withColumn("metadata", F.create_map().cast("map<string,string>"))
        .withColumn("event_time", F.lit(ts))
    )
    return format_s3(events, bucket="bench-bucket", ts=F.lit(ts)).drop(
        "metadata"
    )


@_register(
    "sink_format_webhook",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           data AS body,
           'https://hooks.example.test/ep' AS url,
           'application/json' AS content_type,
           event_id AS event_id_header,
           topic AS topic_header,
           '2024-01-02T03:04:05Z' AS timestamp_header
    FROM src
    """,
)
def sink_format_webhook(spark, sf_dir):
    """S6 Format surface, webhook family (r06 — closes the last
    providers): body + merged-metadata headers under the x-outpost-
    prefix (destwebhook.go:733-780).  The oracle pins the header
    surface; the SIGNATURE column is a codegen HMAC (hmac_expr) that
    DuckDB cannot express (its sha256 only hashes VARCHAR, and HMAC
    needs binary pad blocks) — it is pinned instead by RFC 4231
    vectors + stdlib-equality pytest across all algorithms/encodings
    (tests/test_sinkformats.py)."""
    from datetime import datetime, timezone

    from outpost_spark.routing.sinkformats import format_webhook

    events = _events(spark, sf_dir).withColumn(
        "metadata", F.create_map().cast("map<string,string>")
    )
    out = format_webhook(
        events,
        url="https://hooks.example.test/ep",
        ts=F.lit(datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)),
        secrets=None,
    )
    return out.select(
        "event_id",
        "body",
        "url",
        F.col("headers")["content-type"].alias("content_type"),
        F.col("headers")["x-outpost-event-id"].alias("event_id_header"),
        F.col("headers")["x-outpost-topic"].alias("topic_header"),
        F.col("headers")["x-outpost-timestamp"].alias("timestamp_header"),
    )


@_register(
    "agg_count_distinct_salted",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT tenant_id, CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM src GROUP BY tenant_id
    """,
)
def agg_count_distinct_salted(spark, sf_dir):
    """Two-stage salted exact distinct count (ops/skew.py): the skew-
    robust form of A1's per-dimension distinct — a hot group key's
    distinct set spreads across 16 salt buckets instead of one reducer
    task (AQE's skew splitting does not cover aggregations).  Exact by
    construction (salt partitions the DISTINCT domain), so the oracle is
    the plain COUNT(DISTINCT)."""
    from outpost_spark.ops.skew import salted_count_distinct

    ev = _events(spark, sf_dir)
    return salted_count_distinct(ev, ["tenant_id"], "event_id", salt_buckets=16)


@_register(
    "embed_near_dup_pairs",
    f"""
    WITH {_PERT_SRC_SQL},
    b AS (
      SELECT vec_id, v, CAST({_SIGNBUCKET_SQL} AS INT) AS bucket FROM src
    )
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           round(CASE WHEN sqrt(list_sum(list_transform(l.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(r.v, x -> x * x))) > 0
                 THEN list_sum(list_transform(range(1, 65), i -> l.v[i] * r.v[i]))
                      / (sqrt(list_sum(list_transform(l.v, x -> x * x)))
                         * sqrt(list_sum(list_transform(r.v, x -> x * x))))
                 ELSE 0.0 END, 6) AS cosine
    FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE CASE WHEN sqrt(list_sum(list_transform(l.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(r.v, x -> x * x))) > 0
          THEN list_sum(list_transform(range(1, 65), i -> l.v[i] * r.v[i]))
               / (sqrt(list_sum(list_transform(l.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(r.v, x -> x * x))))
          ELSE 0.0 END >= 0.9
    """,
)
def embed_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs via sign-bucket blocking + verify.

    The raw testdata embeddings contain no pairs above the threshold, so
    a bare run would compare 0 rows against 0 rows — a vacuous parity
    check.  The frame is augmented with a deterministic perturbed copy of
    the first 20 vectors (+0.001 on dims 9..64; dims 1..8 — the sign
    bucket — untouched, so each copy provably lands in its source's
    bucket), mirrored exactly in the oracle.  The entry therefore emits
    >= 20 real pairs and the cross-engine hash discriminates the full
    block-join-verify path.
    """
    from outpost_spark.ops.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _perturbed_embeddings(spark, sf_dir), "embedding",
        id_col="vec_id", threshold=0.9, bits=8
    )


@_register(
    "text_quality_score",
    r"""
    WITH s AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS DOUBLE) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digits
      FROM documents
    )
    SELECT doc_id,
           round((
             CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END +
             CASE WHEN n_chars > 0 AND n_punct / n_chars > 0 AND n_punct / n_chars < 0.1
                  THEN 1.0 ELSE 0.0 END +
             CASE WHEN (CASE WHEN n_chars > 0 THEN n_digits / n_chars ELSE 0.0 END) < 0.2
                  THEN 1.0 ELSE 0.0 END +
             CASE WHEN n_tokens > 0 AND n_chars / n_tokens >= 3 AND n_chars / n_tokens <= 12
                  THEN 1.0 ELSE 0.0 END
           ) / 4.0, 6) AS quality_score
    FROM s
    """,
)
def text_quality_score(spark, sf_dir):
    """Heuristic document quality score (length/punct/digit/token bands)."""
    from outpost_spark.ops.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    return quality_score(docs, "text", "doc_id")


def _lang_hits_sql(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_intersect(list_distinct(toks), [{arr}])) AS DOUBLE)"


@_register(
    "text_language_id",
    None,  # built programmatically below
)
def text_language_id(spark, sf_dir):
    """Coarse language ID: script ratio + function-word hits."""
    from outpost_spark.ops.text import language_id

    docs = _t(spark, sf_dir, "documents")
    return language_id(docs, "text", "doc_id")


def _build_langid_sql() -> str:
    from outpost_spark.ops.text import STOPWORDS

    hit_cols = ",\n             ".join(
        f"{_lang_hits_sql(w)} AS hits_{lang}" for lang, w in STOPWORDS.items()
    )
    best = "greatest(hits_en, hits_de, hits_fr, hits_es)"
    label = "'und'"
    for lang in ("es", "fr", "de", "en"):
        label = f"CASE WHEN hits_{lang} = {best} THEN '{lang}' ELSE {label} END"
    return rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS DOUBLE) AS ascii_chars,
             list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    h AS (
      SELECT doc_id, n_chars, ascii_chars,
             {hit_cols}
      FROM t
    )
    SELECT doc_id,
           CASE WHEN n_chars = 0 THEN 'und'
                WHEN (CASE WHEN n_chars > 0 THEN ascii_chars / n_chars ELSE 0.0 END) < 0.5
                THEN 'other'
                WHEN {best} <= 0 THEN 'und'
                ELSE {label} END AS lang_pred
    FROM h
    """


_REGISTRY["text_language_id"] = (_REGISTRY["text_language_id"][0], _build_langid_sql())


def _build_nb_trained_sql(d_cte: str, out_col: str) -> str:
    """Oracle builder for the char-3-gram Naive Bayes trained model
    (ops/langid.py): ``d_cte`` must define ``d(doc_id, t, lang)`` —
    lowercased text and the training label.  Used by BOTH trained
    entries (language ID over the corpus's lang labels; quality over
    self-derived Gopher labels) so the model CTEs stay literally
    identical to the DataFrame implementation's semantics."""
    return f"""
    WITH {d_cte},
    g AS (
      SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS gram
      FROM d, unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS u(i)
    ),
    cnt AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2),
    feat AS (
      SELECT gram FROM (
        SELECT gram, sum(c) AS tc FROM cnt GROUP BY gram
        ORDER BY tc DESC, gram ASC LIMIT 2000) z
    ),
    v AS (SELECT count(*) AS v FROM feat),
    sel AS (SELECT cnt.* FROM cnt JOIN feat USING (gram)),
    tot AS (SELECT lang, sum(c) AS t FROM sel GROUP BY lang),
    langs AS (SELECT lang, count(*) AS nd FROM d GROUP BY lang),
    model AS (
      SELECT f.gram, l.lang,
             CAST(round(ln((coalesce(s.c, 0) + 1) * 1.0
                           / (coalesce(tt.t, 0) + v.v)), 6)
                  AS DECIMAL(24,6)) AS lp
      FROM feat f
      CROSS JOIN langs l
      CROSS JOIN v
      LEFT JOIN sel s ON s.gram = f.gram AND s.lang = l.lang
      LEFT JOIN tot tt ON tt.lang = l.lang
    ),
    priors AS (
      SELECT lang,
             CAST(round(ln(nd * 1.0 / (SELECT sum(nd) FROM langs)), 6)
                  AS DECIMAL(24,6)) AS prior
      FROM langs
    ),
    dg AS (SELECT doc_id, gram, count(*) AS ng FROM g GROUP BY 1, 2),
    sc AS (
      SELECT dg.doc_id, m.lang, sum(dg.ng * m.lp) AS s
      FROM dg JOIN model m USING (gram)
      GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY (s + p.prior) DESC, lang DESC) AS rn
      FROM sc JOIN priors p USING (lang)
    )
    SELECT d.doc_id, coalesce(b.lang, 'und') AS {out_col}
    FROM d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b
    USING (doc_id)
    """


@_register(
    "text_language_id_trained",
    None,  # built programmatically below (shared NB builder)
)
def text_language_id_trained(spark, sf_dir):
    """TRAINED language ID (ops/langid.py): char-3-gram multinomial
    Naive Bayes, model trained FROM the corpus's own labels as
    DataFrames (the ops/lm.py pattern — top-2000-gram feature cut,
    Laplace-smoothed (gram, lang, lp) grid + priors, broadcast to the
    scorer).  The oracle re-derives the ENTIRE model in CTEs: feature
    selection, smoothing, decimal score sums, and the (score, lang)
    argmax are all cross-engine exact."""
    from outpost_spark.ops.langid import language_id_trained

    docs = _t(spark, sf_dir, "documents")
    return language_id_trained(docs, "text", "doc_id")


_REGISTRY["text_language_id_trained"] = (
    _REGISTRY["text_language_id_trained"][0],
    _build_nb_trained_sql(
        "d AS (SELECT doc_id, lower(text) AS t, lang FROM documents)",
        "lang_pred",
    ),
)


@_register("text_quality_trained", None)  # oracle built below
def text_quality_trained(spark, sf_dir):
    """TRAINED quality model (the 'quality models' half of VERDICT r08
    missing #4): the same char-3-gram NB machinery as the trained
    language ID, self-distilled from the Gopher rule set — the
    expensive heuristic gate labels the corpus (pass/fail), the NB
    learns the character statistics of each class, and the resulting
    model is the FAST gate (one broadcast join + argmax, no per-rule
    regex battery) a 100 TB pipeline runs on everything while the rule
    set runs on samples.  The oracle re-derives the Gopher labels AND
    the whole model in CTEs via the shared NB builder."""
    from outpost_spark.ops.langid import quality_trained

    docs = _t(spark, sf_dir, "documents")
    return quality_trained(docs, "text", "doc_id")


_GOPHER_LABEL_CTE = r"""gq AS (
      SELECT doc_id,
        ((n_words >= 50 AND n_words <= 100000)
         AND coalesce(n_words > 0 AND swc / n_words >= 3 AND swc / n_words <= 10, FALSE)
         AND coalesce(n_words > 0 AND (n_hash + n_ell) / n_words < 0.1, FALSE)
         AND coalesce(NOT (n_lines > 0 AND n_bullet * 1.0 / n_lines >= 0.9), TRUE)
         AND coalesce(NOT (n_lines > 0 AND n_ellline * 1.0 / n_lines >= 0.3), TRUE)
         AND coalesce(n_words > 0 AND n_alpha * 1.0 / n_words >= 0.8, FALSE)
         AND (stop_hits >= 2)) AS passes
      FROM (
        SELECT doc_id,
          CAST(len(words) AS BIGINT) AS n_words,
          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS swc,
          (length(text) - length(replace(text, '#', ''))) AS n_hash,
          (length(text) - length(replace(text, '...', ''))) / 3
            + length(text) - length(replace(text, chr(8230), '')) AS n_ell,
          len(lines) AS n_lines,
          len(list_filter(lines, x -> starts_with(x, '-') OR starts_with(x, '*')
                                      OR starts_with(x, chr(8226)))) AS n_bullet,
          len(list_filter(lines, x -> ends_with(x, '...') OR ends_with(x, chr(8230)))) AS n_ellline,
          len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
          len(list_intersect(list_transform(words, x -> lower(x)),
              ['the','be','to','of','and','that','have','with'])) AS stop_hits
        FROM (
          SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words,
                 list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                             x -> x <> '') AS lines
          FROM documents)
      )
    ),
    d AS (
      SELECT documents.doc_id, lower(text) AS t,
             CASE WHEN gq.passes THEN 'pass' ELSE 'fail' END AS lang
      FROM documents JOIN gq ON gq.doc_id = documents.doc_id
    )"""

_REGISTRY["text_quality_trained"] = (
    _REGISTRY["text_quality_trained"][0],
    _build_nb_trained_sql(_GOPHER_LABEL_CTE, "quality_pred"),
)


def _build_curate_sql(
    paragraphs: bool = False, substrings: bool = False, url: bool = False
) -> str:
    """Composed oracle for pipeline_curate_corpus: quality + language gates
    (formulas identical to text_quality_score / text_language_id), exact
    dedup window, the near-dup pair graph + components over the deduped
    subset (x), survivor anti-join, and the 90/5/5 hash split.

    ``paragraphs=True`` builds the v2 oracle: the global paragraph-dedup
    stage (same CTE structure as dedup_paragraphs_global, over the gated
    set g) runs between the gates and exact dedup, documents are rebuilt
    from surviving paragraphs, and emptied documents drop out — mirroring
    ``curate_corpus(paragraph_sep=...)``.

    ``substrings=True`` adds the global substring-dedup stage (the
    dedup_substrings_global CTE structure over the paragraph-rebuilt
    docs) and ``url=True`` prepends URL-level dedup on the deterministic
    url derivation of the v3 entry — together the v3 oracle mirroring
    ``curate_corpus_v3``."""
    from outpost_spark.ops.text import STOPWORDS

    hit_cols = ",\n             ".join(
        f"{_lang_hits_sql(w)} AS hits_{lang}" for lang, w in STOPWORDS.items()
    )
    best = "greatest(hits_en, hits_de, hits_fr, hits_es)"
    label = "'und'"
    for lang in ("es", "fr", "de", "en"):
        label = f"CASE WHEN hits_{lang} = {best} THEN '{lang}' ELSE {label} END"
    lang_case = f"""CASE WHEN n_chars = 0 THEN 'und'
                WHEN (CASE WHEN n_chars > 0 THEN ascii_chars / n_chars ELSE 0.0 END) < 0.5
                THEN 'other'
                WHEN {best} <= 0 THEN 'und'
                ELSE {label} END"""
    quality = """round((
             CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END +
             CASE WHEN n_chars > 0 AND n_punct / n_chars > 0 AND n_punct / n_chars < 0.1
                  THEN 1.0 ELSE 0.0 END +
             CASE WHEN (CASE WHEN n_chars > 0 THEN n_digits / n_chars ELSE 0.0 END) < 0.2
                  THEN 1.0 ELSE 0.0 END +
             CASE WHEN n_tokens > 0 AND n_chars / n_tokens >= 3 AND n_chars / n_tokens <= 12
                  THEN 1.0 ELSE 0.0 END
           ) / 4.0, 6)"""
    frac = _HASH_FRAC_SQL.format(seed="curate")
    src_text = "replace(text, ' table ', chr(10))" if paragraphs else "text"
    t0_from = "documents"
    url_ctes = ""
    if url:
        url_ctes = r"""
    u0 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 < 2 THEN doc_id - (doc_id % 20) ELSE doc_id END AS pg
      FROM documents
    ),
    u1 AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'https://www.example.com/page/' || CAST(pg AS VARCHAR) || '?utm_source=feed'
               WHEN 1 THEN 'http://example.com/page/' || CAST(pg AS VARCHAR) || '/'
               ELSE 'HTTPS://Example.COM/page/' || CAST(pg AS VARCHAR) || '#frag'
             END AS url
      FROM u0
    ),
    u2 AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   lower(regexp_replace(regexp_replace(url, '#.*$', ''), '\?.*$', '')),
                   '^https?://', ''),
                 '^www\.', ''),
               '/+$', '') AS cu
      FROM u1
    ),
    ukeep AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY cu) AS m FROM u2) uu
      WHERE doc_id = m
    ),
    usrc AS (SELECT d.* FROM documents d JOIN ukeep USING (doc_id)),"""
        t0_from = "usrc"
    para_ctes = ""
    x_src = "g"
    if paragraphs:
        para_ctes = """
    p0 AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x <> '') AS paras
      FROM g
    ),
    ph AS (
      SELECT doc_id, pos, md5(para) AS h FROM (
        SELECT doc_id, unnest(paras) AS para, unnest(range(0, len(paras))) AS pos
        FROM p0)
    ),
    pf1 AS (SELECT h, min(doc_id) AS fd FROM ph GROUP BY h),
    pf2 AS (SELECT ph.h, min(ph.pos) AS fp
            FROM ph JOIN pf1 ON ph.h = pf1.h AND ph.doc_id = pf1.fd GROUP BY ph.h),
    pkept AS (
      SELECT ph.doc_id, ph.pos
      FROM ph JOIN pf1 ON ph.h = pf1.h JOIN pf2 ON ph.h = pf2.h
      WHERE ph.doc_id = pf1.fd AND ph.pos = pf2.fp
    ),
    pks AS (SELECT doc_id, list_sort(list(pos)) AS keep FROM pkept GROUP BY doc_id),
    pdx AS MATERIALIZED (
      SELECT doc_id, text FROM (
        SELECT p0.doc_id,
               coalesce(array_to_string(
                 list_transform(pks.keep, i -> p0.paras[CAST(i AS INT) + 1]),
                 chr(10)), '') AS text
        FROM p0 LEFT JOIN pks ON p0.doc_id = pks.doc_id) pd
      WHERE text <> ''
    ),"""
        x_src = "pdx"
    sub_ctes = ""
    if substrings:
        if not paragraphs:
            raise ValueError("substrings stage composes onto the paragraph stage")
        sub_ctes = """
    sw AS MATERIALIZED (
      SELECT doc_id, CAST(i AS INT) AS pos, md5(substr(text, CAST(i AS INT), 40)) AS h
      FROM pdx, unnest(range(1, greatest(length(text) - 40 + 1, 0) + 1)) AS t(i)
    ),
    sg1 AS (SELECT h, min(doc_id) AS fd FROM sw GROUP BY h),
    sg2 AS (SELECT sw.h, min(sw.pos) AS fp
            FROM sw JOIN sg1 ON sw.h = sg1.h AND sw.doc_id = sg1.fd GROUP BY sw.h),
    srem AS (
      SELECT DISTINCT sw.doc_id, CAST(p AS INT) AS p
      FROM sw JOIN sg1 ON sw.h = sg1.h JOIN sg2 ON sw.h = sg2.h,
           unnest(range(sw.pos, sw.pos + 40)) AS u(p)
      WHERE NOT (sw.doc_id = sg1.fd AND sw.pos = sg2.fp)
    ),
    schars AS (
      SELECT doc_id, CAST(i AS INT) AS i, substr(text, CAST(i AS INT), 1) AS ch
      FROM pdx, unnest(range(1, length(text) + 1)) AS t(i)
    ),
    skept AS (
      SELECT c.doc_id, c.i, c.ch
      FROM schars c LEFT JOIN srem r ON c.doc_id = r.doc_id AND c.i = r.p
      WHERE r.doc_id IS NULL
    ),
    sagg AS (
      SELECT doc_id, string_agg(ch, '' ORDER BY i) AS text
      FROM skept GROUP BY doc_id
    ),
    sdx AS MATERIALIZED (
      SELECT p.doc_id, coalesce(s.text, '') AS text
      FROM pdx p LEFT JOIN sagg s ON p.doc_id = s.doc_id
      WHERE coalesce(s.text, '') <> ''
    ),"""
        x_src = "sdx"
    return rf"""
    WITH RECURSIVE{url_ctes} t0 AS (
      SELECT doc_id, {src_text} AS text FROM {t0_from}
    ),
    t1 AS (
      SELECT doc_id, text,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS DOUBLE) AS ascii_chars,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digits,
             list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
      FROM t0
    ),
    h AS (
      SELECT *, CAST(len(toks) AS DOUBLE) AS n_tokens,
             {hit_cols}
      FROM t1
    ),
    g AS MATERIALIZED (
      SELECT doc_id, text FROM h
      WHERE {quality} >= 0.5
        AND ({lang_case}) IN ('en', 'de', 'fr', 'es')
    ),{para_ctes}{sub_ctes}
    x AS MATERIALIZED (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS cmin
        FROM {x_src}) tx
      WHERE doc_id = cmin
    ),
    {_pairs_cte_sql("x")},
    surv AS (
      SELECT x.doc_id FROM x LEFT JOIN comp c ON x.doc_id = c.doc_id
      WHERE c.doc_id IS NULL OR c.doc_id = c.component
    )
    SELECT doc_id,
           CASE WHEN {frac} < 0.9 THEN 'train'
                WHEN {frac} < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM surv
    """


_REGISTRY["pipeline_curate_corpus"] = (
    _REGISTRY["pipeline_curate_corpus"][0],
    _build_curate_sql(),
)


@_register("pipeline_curate_corpus_v2", None)  # composed SQL attached below
def pipeline_curate_corpus_v2(spark, sf_dir):
    """Curation chain WITH the C4-style paragraph stage: quality gate ->
    language gate -> global paragraph dedup (first (doc, pos) occurrence
    of every repeated paragraph survives, documents rebuilt, emptied
    documents dropped) -> exact dedup -> MinHash near-dup collapse ->
    90/5/5 split.  Paragraph structure is derived deterministically (the
    word 'table' becomes a break, as in dedup_paragraphs_global) so the
    corpus's planted duplicate documents produce genuine cross-document
    shared paragraphs for the stage to strip before near-dup detection."""
    from outpost_spark.ops.pipeline import curate_corpus

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), " table ", "\n")
    )
    return curate_corpus(docs, paragraph_sep="\n")


_REGISTRY["pipeline_curate_corpus_v2"] = (
    _REGISTRY["pipeline_curate_corpus_v2"][0],
    _build_curate_sql(paragraphs=True),
)


@_register("pipeline_curate_corpus_v3", None)  # composed SQL attached below
def pipeline_curate_corpus_v3(spark, sf_dir):
    """The full modern curation ordering as ONE oracle-checked plan:
    URL dedup (crawl frontier — before any text is read) -> quality gate
    -> language gate -> global paragraph dedup -> global substring dedup
    (Lee et al. 40-char windows) -> exact dedup -> MinHash near-dup
    collapse -> 90/5/5 split.  The corpus has no URL column, so a
    deterministic one is derived with ~10 % of documents sharing a
    resource across scheme/www/case/query/fragment variants (every
    normalization rule does real work); paragraph breaks derive as in
    v2.  Coarse-to-fine granularity: each dedup stage strictly shrinks
    the next stage's input."""
    from outpost_spark.ops.pipeline import curate_corpus_v3

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), " table ", "\n")
    )
    pg = (
        F.when(
            F.col("doc_id") % 20 < 2, F.col("doc_id") - (F.col("doc_id") % 20)
        )
        .otherwise(F.col("doc_id"))
        .cast("string")
    )
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://www.example.com/page/"), pg, F.lit("?utm_source=feed")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("http://example.com/page/"), pg, F.lit("/")),
        )
        .otherwise(F.concat(F.lit("HTTPS://Example.COM/page/"), pg, F.lit("#frag")))
    )
    return curate_corpus_v3(
        docs.withColumn("url", url), url_col="url", paragraph_sep="\n"
    )


_REGISTRY["pipeline_curate_corpus_v3"] = (
    _REGISTRY["pipeline_curate_corpus_v3"][0],
    _build_curate_sql(paragraphs=True, substrings=True, url=True),
)


@_register(
    "pipeline_curate_corpus_v4",
    f"""
    WITH RECURSIVE
    q AS ({_QUALITY_SQL}),
    g AS (
      SELECT d.* FROM documents d JOIN q USING (doc_id) WHERE q.q >= 0.5
    ),
    {_pairs_cte_sql("g")},
    members AS (
      SELECT c.doc_id, c.component, q.q FROM comp c JOIN q USING (doc_id)
    ),
    winners AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (
                 PARTITION BY component ORDER BY q DESC, doc_id ASC
               ) AS rn
        FROM members
      ) WHERE rn = 1
    ),
    surv AS (
      SELECT g.doc_id, CAST(g.n_chars AS BIGINT) AS w
      FROM g LEFT JOIN comp c ON g.doc_id = c.doc_id
      WHERE c.doc_id IS NULL OR g.doc_id IN (SELECT doc_id FROM winners)
    ),
    bk AS (
      SELECT doc_id, w,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k
      FROM surv
    ),
    kept AS (
      SELECT doc_id
      FROM (SELECT doc_id, w, sum(w) OVER (ORDER BY k, doc_id) AS c FROM bk) z
      WHERE c <= 60000
    ),
    sh AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('shuffle|shard|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k1,
             CAST(('0x' || substr(md5('shuffle|pos|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k2
      FROM kept
    )
    SELECT doc_id,
           CAST(k1 % 16 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY k1 % 16 ORDER BY k2, doc_id) AS BIGINT) AS pos
    FROM sh
    """,
)
def pipeline_curate_corpus_v4(spark, sf_dir):
    """Training-set assembly as ONE oracle-checked plan (r06): quality
    gate -> MinHash near-dup collapse keeping the BEST-quality member
    of each cluster (not min-id) -> ~60k-char token-budget prefix (no
    global sort: bucketed boundary window) -> deterministic shard
    shuffle (two independent hashes, per-shard windows only).  Each
    stage is an independently-oracled operator; this entry pins their
    COMPOSITION end-to-end, the v3 lesson applied to the round's new
    operators."""
    from outpost_spark.ops.dedup import dedup_keep_best, minhash_dedup_pairs
    from outpost_spark.ops.sampling import (
        assign_shuffled_shards,
        sample_by_token_budget,
    )
    from outpost_spark.ops.text import quality_score_expr

    docs = _t(spark, sf_dir, "documents")
    gated = docs.withColumn("__q", quality_score_expr(F.col("text"))).filter(
        F.col("__q") >= 0.5
    )
    # materialize the quality-gated slice ONCE (r15, guide §5): it feeds
    # the MinHash gram pass, BOTH sides of dedup_keep_best (score join +
    # anti-join), and — via the survivor frame — the token-budget
    # sampler, whose bucket-totals collect() executes the whole chain a
    # second time at plan-build.  Each reference otherwise replays the
    # full-text scan + quality expression over the corpus.
    gated = gated.select("doc_id", "text", "n_chars", "__q").localCheckpoint(
        eager=True
    )
    pairs = minhash_dedup_pairs(
        gated, "doc_id", "text",
        num_hashes=16, bands=4, rows_per_band=4,
        shingle_len=5, verify_ngram=5, threshold=0.7,
    )
    surv = dedup_keep_best(gated, pairs, "doc_id", "__q")
    # second joint: the survivor id/weight projection is executed by the
    # budget sampler's bucket-totals collect() AND twice in the final
    # plan (full-bucket filter + boundary window); one narrow
    # materialization runs the keep-best anti-join once
    surv = surv.select("doc_id", "n_chars").localCheckpoint(eager=True)
    kept = sample_by_token_budget(surv, "doc_id", "n_chars", 60000)
    return assign_shuffled_shards(kept.select("doc_id"), "doc_id", n_shards=16)


@_register(
    "text_normalized_fingerprint",
    r"""
    SELECT doc_id,
           substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16)
             AS fingerprint
    FROM documents
    """,
)
def text_normalized_fingerprint(spark, sf_dir):
    """Whitespace/case-normalized content fingerprint."""
    from outpost_spark.ops.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return fingerprint(docs, "text", "doc_id")


@_register(
    "multimodal_features",
    """
    SELECT doc_id AS id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           round(CAST(('0x' || substr(md5(text), 1, 8))  AS BIGINT) / 4294967296.0, 9) AS f0,
           round(CAST(('0x' || substr(md5(text), 9, 8))  AS BIGINT) / 4294967296.0, 9) AS f1,
           round(CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) / 4294967296.0, 9) AS f2,
           round(CAST(('0x' || substr(md5(text), 25, 8)) AS BIGINT) / 4294967296.0, 9) AS f3
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary column -> Arrow mapInPandas featurizer.

    Drives the REAL binary/mapInPandas path (deterministic md5 fake
    decoder — see ops/multimodal.py for the codec stubs); the oracle
    recomputes the same features in SQL.
    """
    from outpost_spark.ops.multimodal import documents_as_multimodal, extract_features

    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(documents_as_multimodal(docs))
    return feats.select(
        "id",
        "modality",
        "n_bytes",
        "checksum",
        *[
            F.round(F.element_at("feat", i + 1), 9).alias(f"f{i}")
            for i in range(4)
        ],
    )


@_register(
    "multimodal_decoded",
    """
    SELECT doc_id AS id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           false AS decode_ok,
           CAST(NULL AS VARCHAR) AS kind,
           CAST(NULL AS INT) AS width,
           CAST(NULL AS INT) AS height,
           CAST(NULL AS INT) AS sample_rate,
           CAST(NULL AS DOUBLE) AS duration_s
    FROM documents
    """,
)
def multimodal_decoded(spark, sf_dir):
    """REAL stdlib decoders (PNG via zlib, WAV via wave) over the binary
    mapInPandas path.  The documents corpus is text, so every row comes
    back ``decode_ok=false`` with null decoded fields — which is exactly
    what the oracle pins: the decode stage runs distributed over an
    undecodable corpus without failing a task, and the portable fields
    (sizes, checksums, flags) hash-match cross-engine.  The decoder
    correctness itself is pinned by pytest over planted PNG/WAV binaries
    (tests/test_ops.py)."""
    from outpost_spark.ops.multimodal import (
        documents_as_multimodal,
        extract_features_decoded,
    )

    docs = _t(spark, sf_dir, "documents")
    return extract_features_decoded(documents_as_multimodal(docs)).select(
        "id",
        "modality",
        "n_bytes",
        "checksum",
        "decode_ok",
        "kind",
        "width",
        "height",
        "sample_rate",
        "duration_s",
    )


# DuckDB cannot decode PNGs, but the band-join + Hamming-verify +
# survivor-collapse stages ARE SQL-expressible: the Spark entry writes
# its (id, dhash, dhash_ok) fingerprint frame to a parquet fixture and
# both engines consume THAT — the oracle re-derives the pairs with an
# exhaustive quadratic join (so it also independently proves the
# pigeonhole band join has zero false negatives) and the survivors with
# a recursive-CTE transitive closure.  Only the PNG decode itself stays
# pytest-pinned (tests/test_image_dedup.py).  The fixture is written by
# the Spark callable before the driver runs the oracle (the driver and
# the parity suite both run spark-then-oracle per entry).
_IMAGE_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "image_dhash",
)

_IMAGE_PAIRS_SQL = f"""
    WITH fp AS (
      SELECT id, dhash
      FROM read_parquet('{_IMAGE_FIXTURE_DIR}/*.parquet')
      WHERE dhash_ok
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
"""


def _write_image_fixture(spark, sf_dir):
    """Planted corpus -> dHash fingerprints, persisted where the DuckDB
    oracle reads them; returns the frame read BACK from the fixture so
    both engines consume byte-identical input."""
    from outpost_spark.ops.multimodal import image_dhash, planted_image_corpus

    docs = _t(spark, sf_dir, "documents")
    imgs = planted_image_corpus(docs, id_col="doc_id")
    image_dhash(imgs).write.mode("overwrite").parquet(_IMAGE_FIXTURE_DIR)
    return spark.read.parquet(_IMAGE_FIXTURE_DIR)


@_register("dedup_image_phash_pairs", _IMAGE_PAIRS_SQL)
def dedup_image_phash_pairs(spark, sf_dir):
    """Perceptual image dedup (VERDICT r08 task #8): dHash over the
    stdlib PNG decoder + the SAME pigeonhole Hamming band join the text
    simhash uses (ops/dedup.py::hamming_banded_pairs, bits=64, five
    unequal-width bands — zero false negatives within the distance,
    never quadratic).  The
    corpus is PLANTED — deterministic synthetic PNGs where ids sharing
    ``id // 4`` are near-identical (single-pixel tweaks) and every 29th
    id is junk bytes (dhash_ok=false rows, never task failures).  The
    oracle verifies the band join against an exhaustive quadratic
    Hamming join over the shared fingerprint fixture; the PNG decode
    itself is pinned in tests/test_image_dedup.py."""
    from outpost_spark.ops.dedup import hamming_banded_pairs

    fp = _write_image_fixture(spark, sf_dir).filter(F.col("dhash_ok"))
    return hamming_banded_pairs(fp, "id", "dhash", bits=64, max_hamming=4)


_IMAGE_SURVIVORS_SQL = f"""
    WITH RECURSIVE fp AS (
      SELECT id, dhash, dhash_ok
      FROM read_parquet('{_IMAGE_FIXTURE_DIR}/*.parquet')
    ),
    pairs AS (
      SELECT a.id AS ia, b.id AS ib
      FROM fp a JOIN fp b ON a.id < b.id
      WHERE a.dhash_ok AND b.dhash_ok
        AND bit_count(xor(a.dhash, b.dhash)) <= 4
    ),
    edges AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION ALL
      SELECT ib, ia FROM pairs
    ),
    walk(id, m) AS (
      SELECT id, id FROM fp WHERE dhash_ok
      UNION
      SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.m
    )
    SELECT id FROM (
      SELECT id, MIN(m) AS root FROM walk GROUP BY id
    ) WHERE id = root
    UNION ALL
    SELECT id FROM fp WHERE NOT dhash_ok
"""


@_register("dedup_image_survivors", _IMAGE_SURVIVORS_SQL)
def dedup_image_survivors(spark, sf_dir):
    """The image-dedup chain completed: dHash pairs -> connected
    components -> canonical (minimum-id) survivor per near-dup cluster,
    over the same planted corpus as dedup_image_phash_pairs; corrupt
    members carry no fingerprint, join no pairs, and pass through
    untouched.  The oracle recomputes the survivor set from the shared
    fingerprint fixture with a recursive-CTE transitive closure (min
    reachable id per component); the PNG decode stays pytest-pinned."""
    from outpost_spark.ops.dedup import dedup_keep_canonical, hamming_banded_pairs

    fp = _write_image_fixture(spark, sf_dir)
    pairs = hamming_banded_pairs(
        fp.filter(F.col("dhash_ok")), "id", "dhash", bits=64, max_hamming=4
    )
    return dedup_keep_canonical(fp.select("id"), pairs, "id")


@_register(
    "multimodal_decoded_planted",
    """
    SELECT doc_id AS id,
           doc_id % 29 <> 0 AS decode_ok,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 2 AND doc_id % 2 = 1 THEN 'jpeg'
                WHEN (doc_id // 4) % 3 = 1 AND doc_id % 2 = 1 THEN 'gif'
                WHEN (doc_id // 4) % 3 = 0 AND doc_id % 4 = 3 THEN 'tiff'
                WHEN (doc_id // 4) % 3 = 0 AND doc_id % 4 = 1 THEN 'bmp'
                ELSE 'png' END AS kind,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 18 ELSE 72 END AS width,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 16 ELSE 64 END AS height,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 1 AND doc_id % 2 = 1 THEN 3
                WHEN (doc_id // 4) % 3 = 0 AND doc_id % 2 = 1 THEN 3
                ELSE 1 END AS channels,
           CASE WHEN doc_id % 29 = 0 THEN NULL ELSE 8 END AS bit_depth
    FROM documents
    """,
)
def multimodal_decoded_planted(spark, sf_dir):
    """REAL image decode, value-oracled end to end (round 11; GIF
    groups round 12; BMP twins round 13; TIFF twins round 14): the
    planted image corpus (PNG/BMP/TIFF noise twin groups incl. PackBits
    strips, mixed PNG/JPEG cell groups incl. both
    progressive scripts, mixed PNG/GIF cell groups incl.
    interlaced GIF, junk members —
    ops/multimodal.py::planted_image_corpus) runs through the REAL
    stdlib PNG + JPEG + GIF decoders distributed in mapInPandas, and
    the oracle derives the expected metadata ANALYTICALLY from the
    generator's id arithmetic (format, dims, channels, corrupt-member
    tolerance) — DuckDB cannot decode the bytes, but it can prove the
    decoder reported exactly the right metadata for every planted
    member, INCLUDING the JPEG, GIF, BMP and TIFF ones.  Pixel values/luminance
    stay pytest-pinned (tests/test_jpeg.py, tests/test_gif.py,
    tests/test_image_dedup.py)."""
    from outpost_spark.ops.multimodal import (
        extract_features_decoded,
        planted_image_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    imgs = planted_image_corpus(docs, id_col="doc_id").select(
        "id", F.lit("image").alias("modality"), "content"
    )
    return extract_features_decoded(imgs).select(
        "id", "decode_ok", "kind", "width", "height", "channels", "bit_depth"
    )


@_register(
    "multimodal_resize_planted",
    """
    SELECT doc_id AS id,
           doc_id % 29 <> 0 AS resize_ok,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 18 ELSE 72 END AS width,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 16 ELSE 64 END AS height,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 9 ELSE 36 END AS out_width,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                WHEN (doc_id // 4) % 3 = 0 THEN 8 ELSE 32 END AS out_height
    FROM documents
    """,
)
def multimodal_resize_planted(spark, sf_dir):
    """REAL image resize, value-oracled end to end (round 11; GIF
    round 12): the planted corpus runs decode -> nearest-neighbor
    resize (scale 0.5) -> re-encode IN THE INPUT'S FORMAT -> re-decode,
    distributed in mapInPandas; the reported output dims come from
    re-decoding the resized bytes, so a dim mismatch anywhere in the
    decode/encode round-trip (PNG, JPEG, or GIF) fails the hash.  The
    oracle derives every expected dim analytically from the generator's
    id arithmetic; junk members survive as resize_ok=false rows.  Pixel
    fidelity stays pytest-pinned (tests/test_ops.py, tests/test_jpeg.py,
    tests/test_gif.py)."""
    from outpost_spark.ops.multimodal import (
        planted_image_corpus,
        resize_images,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    imgs = planted_image_corpus(docs, id_col="doc_id")
    return resize_images(imgs, scale=0.5).select(
        "id", "resize_ok", "width", "height", "out_width", "out_height"
    )


@_register(
    "multimodal_gif_frames_planted",
    """
    SELECT doc_id AS id, CAST(NULL AS INTEGER) AS frame_idx,
           CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
           CAST(NULL AS INTEGER) AS n_frames, FALSE AS decode_ok
    FROM documents WHERE doc_id % 29 = 0
    UNION ALL
    SELECT doc_id AS id,
           CAST(unnest(generate_series(0, CAST(1 + doc_id % 6 AS BIGINT), 2))
                AS INTEGER) AS frame_idx,
           24 AS width, 16 AS height,
           CAST(2 + doc_id % 6 AS INTEGER) AS n_frames, TRUE AS decode_ok
    FROM documents WHERE doc_id % 29 <> 0
    """,
)
def multimodal_gif_frames_planted(spark, sf_dir):
    """REAL video-frame sampling, value-oracled end to end (round 12):
    planted ANIMATED GIFs (n_frames = 2 + id % 6, junk every 29th id)
    run through sample_frames(every_k=2) with the default decoder —
    which now composites real GIF animations through the full GIF89a
    disposal model (ops/gif.py::decode_gif_frames) — distributed in
    mapInPandas.  The oracle re-derives the sampled (id, frame_idx)
    explosion, dims, frame counts, and corrupt-member tolerance
    analytically from the generator's id arithmetic (an unnest over a
    per-doc generate_series — the frame fan-out itself is what's being
    value-checked).  Frame pixels stay pytest-pinned
    (tests/test_gif.py round-trips the animation compositing)."""
    from outpost_spark.ops.multimodal import planted_video_corpus, sample_frames

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    vids = planted_video_corpus(docs)
    return sample_frames(vids, every_k=2).select(
        "id", "frame_idx", "width", "height", "n_frames", "decode_ok"
    )


@_register(
    "multimodal_avi_frames_planted",
    """
    SELECT doc_id AS id, CAST(NULL AS INTEGER) AS frame_idx,
           CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
           CAST(NULL AS INTEGER) AS n_frames, FALSE AS decode_ok
    FROM documents WHERE doc_id % 29 = 0
    UNION ALL
    SELECT doc_id AS id,
           CAST(unnest(generate_series(0, CAST(1 + doc_id % 5 AS BIGINT), 2))
                AS INTEGER) AS frame_idx,
           72 AS width, 64 AS height,
           CAST(2 + doc_id % 5 AS INTEGER) AS n_frames, TRUE AS decode_ok
    FROM documents WHERE doc_id % 29 <> 0
    """,
)
def multimodal_avi_frames_planted(spark, sf_dir):
    """REAL video-container decode, value-oracled end to end (round
    13): planted AVI/Motion-JPEG files (n_frames = 2 + id % 5, odd ids
    carrying PROGRESSIVE SOF2 frames, junk every 29th id) run through
    sample_frames(every_k=2) with the default decoder — which now
    walks the RIFF container and decodes each frame chunk with the
    in-tree JPEG decoder (ops/avi.py::decode_avi) — distributed in
    mapInPandas.  The oracle re-derives the sampled (id, frame_idx)
    explosion, dims, frame counts, and corrupt-member tolerance
    analytically from the generator's id arithmetic, exactly like the
    GIF sibling entry.  Frame pixels stay pytest-pinned
    (tests/test_avi.py round-trips the cell plant within JPEG
    quantization)."""
    from outpost_spark.ops.multimodal import planted_avi_corpus, sample_frames

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    vids = planted_avi_corpus(docs)
    return sample_frames(vids, every_k=2).select(
        "id", "frame_idx", "width", "height", "n_frames", "decode_ok"
    )


@_register(
    "audio_features_planted",
    """
    SELECT doc_id AS id,
           doc_id % 29 <> 0 AS audio_ok,
           CASE WHEN doc_id % 29 = 0 THEN NULL ELSE 8000 END AS sample_rate,
           CASE WHEN doc_id % 29 = 0 THEN NULL ELSE 0.5 END AS duration_s,
           CASE WHEN doc_id % 29 = 0 THEN NULL ELSE 14 END AS n_frames,
           CASE WHEN doc_id % 29 = 0 THEN NULL
                ELSE (20 + (doc_id % 30) * 4) * 15.625 END AS dominant_freq_hz
    FROM documents
    """,
)
def audio_features_planted(spark, sf_dir):
    """REAL FFT feature extraction, value-oracled end to end (round 12):
    planted pure-sine WAVs whose frequencies sit EXACTLY on FFT bins
    (bin 20 + (id % 30) * 4 of a 512-point transform at 8 kHz) run
    through the Hann-windowed rFFT feature stage
    (ops/multimodal.py::extract_audio_features) distributed in
    mapInPandas, and the oracle derives the dominant frequency
    analytically: bin * 15.625 Hz — an exact binary float both engines
    reproduce digit-for-digit — plus duration (4000/8000 s), frame
    count (1 + (4000-512)//256), and junk-member tolerance.  The
    spectral centroid and RMS carry quantization noise (~1e-6) so they
    stay pytest-pinned; the FFT argmax itself is what this entry
    value-checks."""
    from outpost_spark.ops.multimodal import (
        extract_audio_features,
        planted_audio_corpus,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    wavs = planted_audio_corpus(docs)
    return extract_audio_features(wavs).select(
        "id", "audio_ok", "sample_rate", "duration_s", "n_frames",
        "dominant_freq_hz",
    )


# Audio perceptual dedup (round 13): same fixture trick as the image
# chain — the Spark entry persists its (id, afp, afp_ok) fingerprint
# frame and DuckDB re-derives pairs with an exhaustive quadratic
# Hamming join (independently proving the band join has zero false
# negatives) and survivors with a recursive-CTE transitive closure.
# Only the WAV/FFT fingerprint itself stays pytest-pinned
# (tests/test_audio_dedup.py).
_AUDIO_FP_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "audio_afp",
)

_AUDIO_PAIRS_SQL = f"""
    WITH fp AS (
      SELECT id, afp
      FROM read_parquet('{_AUDIO_FP_FIXTURE_DIR}/*.parquet')
      WHERE afp_ok
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.afp, b.afp)) <= 4
"""


def _write_audio_fp_fixture(spark, sf_dir):
    """Planted twin-clip corpus -> spectral fingerprints, persisted
    where the DuckDB oracle reads them; returns the frame read BACK
    from the fixture so both engines consume byte-identical input."""
    from outpost_spark.ops.multimodal import (
        audio_fingerprints,
        planted_audio_dedup_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    clips = planted_audio_dedup_corpus(docs, id_col="doc_id")
    audio_fingerprints(clips).write.mode("overwrite").parquet(
        _AUDIO_FP_FIXTURE_DIR
    )
    return spark.read.parquet(_AUDIO_FP_FIXTURE_DIR)


@_register("dedup_audio_fingerprint_pairs", _AUDIO_PAIRS_SQL)
def dedup_audio_fingerprint_pairs(spark, sf_dir):
    """Perceptual AUDIO dedup (VERDICT r12 task #1): a 64-bit spectral
    fingerprint — sign-of-delta over Hann-rFFT framed band energies,
    the audio analog of the image dHash
    (ops/multimodal.py::audio_fingerprint) — fed through the SAME
    pigeonhole Hamming band join text simhash and image dHash use
    (ops/dedup.py::hamming_banded_pairs, bits=64, five unequal-width
    bands — zero false negatives within the distance, never quadratic).  The corpus is
    PLANTED twin clips: ids sharing ``id // 4`` are rank-swap spectral
    tweaks of the same plant (within Hamming 3), distinct seeds sit
    ~32 bits apart, and every 29th id is junk bytes (afp_ok=false
    rows, never task failures).  The oracle verifies the band join
    against an exhaustive quadratic Hamming join over the shared
    fingerprint fixture; the WAV/FFT fingerprint itself is pinned in
    tests/test_audio_dedup.py."""
    from outpost_spark.ops.dedup import hamming_banded_pairs

    fp = _write_audio_fp_fixture(spark, sf_dir).filter(F.col("afp_ok"))
    return hamming_banded_pairs(fp, "id", "afp", bits=64, max_hamming=4)


_AUDIO_SURVIVORS_SQL = f"""
    WITH RECURSIVE fp AS (
      SELECT id, afp, afp_ok
      FROM read_parquet('{_AUDIO_FP_FIXTURE_DIR}/*.parquet')
    ),
    pairs AS (
      SELECT a.id AS ia, b.id AS ib
      FROM fp a JOIN fp b ON a.id < b.id
      WHERE a.afp_ok AND b.afp_ok
        AND bit_count(xor(a.afp, b.afp)) <= 4
    ),
    edges AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION ALL
      SELECT ib, ia FROM pairs
    ),
    walk(id, m) AS (
      SELECT id, id FROM fp WHERE afp_ok
      UNION
      SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.m
    )
    SELECT id FROM (
      SELECT id, MIN(m) AS root FROM walk GROUP BY id
    ) WHERE id = root
    UNION ALL
    SELECT id FROM fp WHERE NOT afp_ok
"""


@_register("dedup_audio_survivors", _AUDIO_SURVIVORS_SQL)
def dedup_audio_survivors(spark, sf_dir):
    """The audio-dedup chain completed: fingerprint pairs -> connected
    components -> canonical (minimum-id) survivor per near-dup cluster,
    over the same planted twin-clip corpus as
    dedup_audio_fingerprint_pairs; junk members carry no fingerprint,
    join no pairs, and pass through untouched.  The oracle recomputes
    the survivor set from the shared fingerprint fixture with a
    recursive-CTE transitive closure (min reachable id per component);
    the WAV/FFT fingerprint stays pytest-pinned."""
    from outpost_spark.ops.dedup import dedup_keep_canonical, hamming_banded_pairs

    fp = _write_audio_fp_fixture(spark, sf_dir)
    pairs = hamming_banded_pairs(
        fp.filter(F.col("afp_ok")), "id", "afp", bits=64, max_hamming=4
    )
    return dedup_keep_canonical(fp.select("id"), pairs, "id")


_AUDIO_XR_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "audio_afp_xrate",
)

_AUDIO_XR_PAIRS_SQL = f"""
    WITH fp AS (
      SELECT id, afp
      FROM read_parquet('{_AUDIO_XR_FIXTURE_DIR}/*.parquet')
      WHERE afp_ok
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.afp, b.afp)) <= 6
"""


@_register("dedup_audio_crossrate_pairs", _AUDIO_XR_PAIRS_SQL)
def dedup_audio_crossrate_pairs(spark, sf_dir):
    """CROSS-SAMPLE-RATE audio dedup: the corpus mixes 8 kHz plants with
    their 16 kHz resamples (odd ids), and the fingerprint anchors its
    bands to a FIXED Hz range (fmax_hz=3800) so both rates compute
    energies over the same spectral bands — a clip and its resampled
    copy land within a few bits (resampling rolloff adds ~2, rank-swap
    tweaks ~1 more; measured worst 5, cross-group minimum 22, so
    max_hamming=6 separates cleanly with 7 pigeonhole bands).  The
    oracle re-derives pairs from the persisted fingerprint fixture with
    an exhaustive quadratic Hamming join; the Hz-anchored band math is
    pinned in tests/test_audio_dedup.py."""
    from outpost_spark.ops.dedup import hamming_banded_pairs
    from outpost_spark.ops.multimodal import (
        audio_fingerprints,
        planted_audio_dedup_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    clips = planted_audio_dedup_corpus(docs, id_col="doc_id", cross_rate=True)
    audio_fingerprints(clips, fmax_hz=3800.0).write.mode("overwrite").parquet(
        _AUDIO_XR_FIXTURE_DIR
    )
    fp = spark.read.parquet(_AUDIO_XR_FIXTURE_DIR).filter(F.col("afp_ok"))
    return hamming_banded_pairs(fp, "id", "afp", bits=64, max_hamming=6)


_AUDIO_XF_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "audio_afp_xformat",
)

_AUDIO_XF_PAIRS_SQL = f"""
    WITH fp AS (
      SELECT id, afp
      FROM read_parquet('{_AUDIO_XF_FIXTURE_DIR}/*.parquet')
      WHERE afp_ok
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.id < b.id
    WHERE bit_count(xor(a.afp, b.afp)) <= 4
"""


@_register("dedup_audio_crossformat_pairs", _AUDIO_XF_PAIRS_SQL)
def dedup_audio_crossformat_pairs(spark, sf_dir):
    """CROSS-FORMAT audio dedup (r14): the corpus mixes WAV plants with
    their FLAC re-encodes (odd ids, ops/flac.py — in-tree Rice/fixed-
    predictor codec), so a near-dup pair only surfaces if the REAL
    compressed-audio decode path produces the exact fingerprint the PCM
    path does (FLAC is lossless, so twins hash identically — the audio
    analog of the PNG/BMP/TIFF image twins).  The oracle re-derives
    pairs from the persisted fingerprint fixture with an exhaustive
    quadratic Hamming join, independently proving the band join has
    zero false negatives over the mixed-container corpus; the FLAC
    bitstream decode itself is pinned in tests/test_flac.py."""
    from outpost_spark.ops.dedup import hamming_banded_pairs
    from outpost_spark.ops.multimodal import (
        audio_fingerprints,
        planted_audio_dedup_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    clips = planted_audio_dedup_corpus(
        docs, id_col="doc_id", cross_format=True
    )
    audio_fingerprints(clips).write.mode("overwrite").parquet(
        _AUDIO_XF_FIXTURE_DIR
    )
    fp = spark.read.parquet(_AUDIO_XF_FIXTURE_DIR).filter(F.col("afp_ok"))
    return hamming_banded_pairs(fp, "id", "afp", bits=64, max_hamming=4)


# Video near-dup pairing (round 13): per-frame dHash over sampled
# animation frames, paired frame-aligned — the same fixture trick: the
# Spark entry persists its per-frame hash frame and DuckDB re-derives
# the pairing with an exhaustive frame-aligned quadratic Hamming join
# plus the match-fraction threshold, and survivors with a
# recursive-CTE closure.
_VIDEO_FP_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "video_fhash",
)

_VIDEO_PAIRS_SQL = f"""
    WITH fh AS (
      SELECT id, frame_idx, fhash, n_sampled
      FROM read_parquet('{_VIDEO_FP_FIXTURE_DIR}/*.parquet')
      WHERE hash_ok
    ),
    m AS (
      SELECT a.id AS id_a, b.id AS id_b,
             a.n_sampled AS frames_a, b.n_sampled AS frames_b,
             COUNT(*) AS matched_frames
      FROM fh a JOIN fh b
        ON a.id < b.id AND a.frame_idx = b.frame_idx
       AND bit_count(xor(a.fhash, b.fhash)) <= 4
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, matched_frames, frames_a, frames_b
    FROM m
    WHERE matched_frames >= CEIL(LEAST(frames_a, frames_b) * 0.5)
"""


def _write_video_fp_fixture(spark, sf_dir):
    """Planted twin-animation corpus -> per-frame dHash rows, persisted
    where the DuckDB oracle reads them; returns the frame read BACK
    from the fixture so both engines consume byte-identical input."""
    from outpost_spark.ops.multimodal import (
        planted_video_dedup_corpus,
        video_frame_dhash,
    )

    docs = _t(spark, sf_dir, "documents")
    vids = planted_video_dedup_corpus(docs, id_col="doc_id")
    video_frame_dhash(vids, every_k=2).write.mode("overwrite").parquet(
        _VIDEO_FP_FIXTURE_DIR
    )
    return spark.read.parquet(_VIDEO_FP_FIXTURE_DIR)


@_register("dedup_video_nearpairs", _VIDEO_PAIRS_SQL)
def dedup_video_nearpairs(spark, sf_dir):
    """Frame-sequence (video) near-dup pairs (VERDICT r12 task #4):
    sampled animation frames dHashed in the decode stage
    (ops/multimodal.py::video_frame_dhash — decode and hash share one
    Arrow stage, raw frames never leave it), then videos pair when
    >= 50% of the shorter video's sampled frames match the other's
    frame AT THE SAME INDEX within Hamming 4.  The frame-level match
    is the pigeonhole band join keyed by (frame_idx, band, value) —
    frame alignment is part of the bucket key, so buckets never mix
    frame positions (zero false negatives within the distance, linear
    in corpus size).  The corpus is PLANTED twin animations (ids
    sharing id // 4 are one-pixel-per-frame tweaks of the same
    sequence; every 29th id junk).  The oracle re-derives the pairing
    from the persisted per-frame hash fixture with an exhaustive
    frame-aligned quadratic join + the same threshold; the GIF decode
    and dHash stay pytest-pinned (tests/test_video_dedup.py)."""
    from outpost_spark.ops.multimodal import video_dhash_pairs

    fh = _write_video_fp_fixture(spark, sf_dir)
    return video_dhash_pairs(fh, max_hamming=4, min_match_fraction=0.5)


_VIDEO_SURVIVORS_SQL = f"""
    WITH RECURSIVE fh AS (
      SELECT id, frame_idx, fhash, n_sampled, hash_ok
      FROM read_parquet('{_VIDEO_FP_FIXTURE_DIR}/*.parquet')
    ),
    ok AS (SELECT * FROM fh WHERE hash_ok),
    m AS (
      SELECT a.id AS ia, b.id AS ib,
             a.n_sampled AS fa, b.n_sampled AS fb,
             COUNT(*) AS mf
      FROM ok a JOIN ok b
        ON a.id < b.id AND a.frame_idx = b.frame_idx
       AND bit_count(xor(a.fhash, b.fhash)) <= 4
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT ia, ib FROM m WHERE mf >= CEIL(LEAST(fa, fb) * 0.5)
    ),
    edges AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION ALL
      SELECT ib, ia FROM pairs
    ),
    ids AS (SELECT DISTINCT id FROM fh),
    okids AS (SELECT DISTINCT id FROM ok),
    walk(id, m) AS (
      SELECT id, id FROM okids
      UNION
      SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.m
    )
    SELECT id FROM (
      SELECT id, MIN(m) AS root FROM walk GROUP BY id
    ) WHERE id = root
    UNION ALL
    SELECT id FROM ids WHERE id NOT IN (SELECT id FROM okids)
"""


@_register("dedup_video_survivors", _VIDEO_SURVIVORS_SQL)
def dedup_video_survivors(spark, sf_dir):
    """The video-dedup chain completed: frame-aligned pairs ->
    connected components -> canonical (minimum-id) survivor per
    near-dup cluster, over the same planted twin-animation corpus;
    undecodable members carry no frame hashes and pass through
    untouched.  The oracle recomputes the survivor set from the shared
    per-frame hash fixture (quadratic join + threshold + recursive-CTE
    closure)."""
    from outpost_spark.ops.dedup import dedup_keep_canonical
    from outpost_spark.ops.multimodal import video_dhash_pairs

    fh = _write_video_fp_fixture(spark, sf_dir)
    pairs = video_dhash_pairs(fh, max_hamming=4, min_match_fraction=0.5)
    return dedup_keep_canonical(
        fh.select("id").distinct(), pairs, "id"
    )


_VIDEO_XF_FIXTURE_DIR = os.path.join(
    os.environ.get("OUTPOST_SPARK_ORACLE_FIXTURES", "/tmp/outpost_spark_oracle_fix"),
    "video_fhash_xfmt",
)

_VIDEO_XF_PAIRS_SQL = f"""
    WITH fh AS (
      SELECT id, frame_idx, fhash, n_sampled
      FROM read_parquet('{_VIDEO_XF_FIXTURE_DIR}/*.parquet')
      WHERE hash_ok
    ),
    m AS (
      SELECT a.id AS id_a, b.id AS id_b,
             a.n_sampled AS frames_a, b.n_sampled AS frames_b,
             COUNT(*) AS matched_frames
      FROM fh a JOIN fh b
        ON a.id < b.id AND a.frame_idx = b.frame_idx
       AND bit_count(xor(a.fhash, b.fhash)) <= 4
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, matched_frames, frames_a, frames_b
    FROM m
    WHERE matched_frames >= CEIL(LEAST(frames_a, frames_b) * 0.5)
"""


@_register("dedup_video_crossformat_pairs", _VIDEO_XF_PAIRS_SQL)
def dedup_video_crossformat_pairs(spark, sf_dir):
    """CROSS-CONTAINER video dedup: the corpus carries the same
    cell-plant frame sequences encoded as animated GIF (even ids) and
    AVI/Motion-JPEG (odd ids; progressive JPEG frames for ids = 3 mod
    4), so a pair only surfaces when the GIF disposal-model decode and
    the RIFF-walk MJPEG decode produce agreeing per-frame dHashes
    (measured worst twin frame distance 4, cross-group minimum 22) —
    the video analog of the mixed PNG/JPEG/GIF image groups.  Same
    frame-aligned band join and fixture oracle as
    dedup_video_nearpairs."""
    from outpost_spark.ops.multimodal import (
        planted_mixed_video_corpus,
        video_dhash_pairs,
        video_frame_dhash,
    )

    docs = _t(spark, sf_dir, "documents")
    vids = planted_mixed_video_corpus(docs, id_col="doc_id")
    video_frame_dhash(vids, every_k=2).write.mode("overwrite").parquet(
        _VIDEO_XF_FIXTURE_DIR
    )
    fh = spark.read.parquet(_VIDEO_XF_FIXTURE_DIR)
    return video_dhash_pairs(fh, max_hamming=4, min_match_fraction=0.5)


# ───────────────── tenant/destination store (S8, P10, P2/J2, S1) ─────────────────

_DESTS_SQL = """
    dests AS (
      SELECT DISTINCT tenant_id,
             'd_' || topic AS id,
             CASE WHEN topic = 'error' THEN 'sqs' ELSE 'webhook' END AS type,
             topic AS only_topic
      FROM src
    )
"""


def _dests_dim(spark, sf_dir):
    """Synthetic destinations dimension derived from events (deterministic)."""
    src = _events(spark, sf_dir)
    return (
        src.select(
            "tenant_id",
            F.concat(F.lit("d_"), F.col("topic")).alias("id"),
            F.when(F.col("topic") == "error", "sqs").otherwise("webhook").alias("type"),
            F.array(F.col("topic")).alias("topics"),
        )
        .distinct()
    )


@_register(
    "routing_match_fanout",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           array_to_string(list_sort(
             list_concat(
               list_concat(
                 ['d_' || topic],
                 CASE WHEN CAST(tenant_id AS BIGINT) % 2 = 1
                      THEN ['d_wild'] ELSE CAST([] AS VARCHAR[]) END),
               CASE WHEN topic = 'error'
                    THEN ['d_filtered'] ELSE CAST([] AS VARCHAR[]) END
             )), ',') AS matched_csv
    FROM src
    """,
)
def routing_match_fanout(spark, sf_dir):
    """J3/ST-hot-path throughput entry: every event matched against a
    destination corpus (exact-topic per (tenant, topic), a '*' wildcard
    destination disabled for even tenants, and a '*' destination gated by
    a compiled JSON filter) in ``compiled_static`` mode — the zero-Python
    broadcast fan-out the streaming router runs per micro-batch.  Bench
    events/s = event count / entry seconds.  The oracle recomputes each
    event's matched set from the corpus construction rules."""
    from outpost_spark.routing.match import match_events

    events = (
        _events(spark, sf_dir)
        .drop("matched_destination_ids")  # the matcher stamps its own
        .withColumn("metadata", F.create_map().cast("map<string,string>"))
    )
    base = events.select("tenant_id", "topic").distinct()
    nulls = [
        F.lit(None).cast("string").alias("filter"),
        F.lit(None).cast("timestamp").alias("disabled_at"),
    ]
    d_exact = base.select(
        F.concat(F.lit("d_"), F.col("topic")).alias("id"),
        "tenant_id",
        F.lit("webhook").alias("type"),
        F.array(F.col("topic")).alias("topics"),
        *nulls,
    )
    tenants = base.select("tenant_id").distinct()
    d_wild = tenants.select(
        F.lit("d_wild").alias("id"),
        "tenant_id",
        F.lit("webhook").alias("type"),
        F.array(F.lit("*")).alias("topics"),
        F.lit(None).cast("string").alias("filter"),
        F.when(
            F.col("tenant_id").cast("bigint") % 2 == 0,
            F.to_timestamp(F.lit("2020-01-01 00:00:00")),
        ).alias("disabled_at"),
    )
    d_filtered = tenants.select(
        F.lit("d_filtered").alias("id"),
        "tenant_id",
        F.lit("webhook").alias("type"),
        F.array(F.lit("*")).alias("topics"),
        F.lit('{"topic": "error"}').alias("filter"),
        F.lit(None).cast("timestamp").alias("disabled_at"),
    )
    # materialize the synthetic destination corpus ONCE (r16, guide §5):
    # it is derived from events via two distinct shuffles, and the match
    # operator evaluates its destinations frame at least twice — the
    # plan-time filter snapshot (driver collect) and the broadcast build
    # — so un-checkpointed, the events scan + distinct chain ran per use.
    # The frame is dimension-sized (distinct (tenant, topic) + tenants).
    dests = (
        d_exact.unionByName(d_wild)
        .unionByName(d_filtered)
        .localCheckpoint(eager=True)
    )
    matched = match_events(events, dests, filter_mode="compiled_static")
    return matched.select(
        "event_id",
        F.array_join(F.col("matched_destination_ids"), ",").alias("matched_csv"),
    )


@_register(
    "store_list_destinations",
    f"""
    WITH src AS ({_EVENTS_SQL}),
    {_DESTS_SQL}
    SELECT id, tenant_id, type FROM dests
    WHERE type IN ('webhook') AND only_topic = 'purchase'
    """,
)
def store_list_destinations(spark, sf_dir):
    """S8: ListDestination filter scan — Type[] OR + Topics[] AND semantics
    (tenantstore/driver/driver.go:64-70) over a broadcastable dimension."""
    from outpost_spark.tenantstore import ListDestinationRequest, list_destinations

    dests = _dests_dim(spark, sf_dir)
    out = list_destinations(
        dests, ListDestinationRequest(types=["webhook"], topics=["purchase"])
    )
    return out.select("id", "tenant_id", "type")


@_register(
    "store_obfuscate_credentials",
    """
    SELECT s_suppkey,
           CASE WHEN length(s_name) < 10 THEN repeat('*', length(s_name))
                ELSE substr(s_name, 1, 4) || repeat('*', length(s_name) - 4)
           END AS masked
    FROM supplier
    """,
)
def store_obfuscate_credentials(spark, sf_dir):
    """P10: credential display masking (<10 chars → all '*', else keep 4 —
    destregistry/baseprovider.go:14-21) as a native Column expression."""
    from outpost_spark.tenantstore import obfuscate_value_expr

    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey", obfuscate_value_expr(F.col("s_name")).alias("masked")
    )


@_register(
    "publish_validation",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT event_id,
           (tenant_id IS NOT NULL AND
            (data IS NULL OR (json_valid(data) AND json_type(data::JSON) = 'OBJECT')))
             AS valid
    FROM src
    """,
)
def publish_validation(spark, sf_dir):
    """S1: publish ingest validation — data must be a JSON object
    (publish_handlers.go:43-53); expressed as a codegen-friendly predicate."""
    df = _events(spark, sf_dir)
    data = F.col("data")
    is_object = data.isNull() | (
        F.from_json(data, "__probe string").isNotNull() & data.rlike(r"^\s*\{")
    )
    return df.select(
        "event_id", (F.col("tenant_id").isNotNull() & is_object).alias("valid")
    )


@_register(
    "attempt_record_include",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT attempt_id, event_id, tenant_id, destination_id,
           'webhook' AS destination_type, status, attempt_number, manual,
           attempt_time,
           to_json(struct_pack(
             event_id := event_id,
             tenant_id := tenant_id,
             destination_id := destination_id,
             topic := topic,
             time_us := epoch_us(event_time),
             data := data)) AS event_json
    FROM src
    """,
)
def attempt_record_include(spark, sf_dir):
    """J2/P2: AttemptRecord{attempt, event} struct packing with include[]
    expansions (driver/driver.go:82-85) — no runtime join, single-row
    shape.  The nested event struct is serialized to CANONICAL JSON for
    the value hash (key order = struct order, nulls kept, timestamps as
    epoch micros), which Spark's ``to_json`` and DuckDB's
    ``to_json(struct_pack(...))`` produce byte-identically — graduating
    this entry from the rows-only check to a full value oracle
    (VERDICT r07 'Next round' #6)."""
    from outpost_spark.tenantstore import attempt_record

    df = _events(spark, sf_dir).withColumn("destination_type", F.lit("webhook"))
    rec = attempt_record(df, include=("event", "event.data"))
    return rec.select(
        "attempt_id",
        "event_id",
        "tenant_id",
        "destination_id",
        "destination_type",
        "status",
        "attempt_number",
        "manual",
        "attempt_time",
        F.to_json(
            F.struct(
                F.col("event.event_id").alias("event_id"),
                F.col("event.tenant_id").alias("tenant_id"),
                F.col("event.destination_id").alias("destination_id"),
                F.col("event.topic").alias("topic"),
                F.unix_micros(F.col("event.time")).alias("time_us"),
                F.col("event.data").alias("data"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("event_json"),
    )


@_register(
    "attempt_record_flat",
    f"""
    WITH src AS ({_EVENTS_SQL})
    SELECT attempt_id, event_id, tenant_id, destination_id,
           'webhook' AS destination_type, status, attempt_number, manual,
           attempt_time,
           event_id AS ev_id, tenant_id AS ev_tenant_id,
           destination_id AS ev_destination_id, topic AS ev_topic,
           event_time AS ev_time, data AS ev_data
    FROM src
    """,
)
def attempt_record_flat(spark, sf_dir):
    """J2/P2 oracle twin of ``attempt_record_include``: builds the same
    AttemptRecord via ``attempt_record`` then flattens the nested event
    struct into ``ev_*`` scalar columns so DuckDB can hash it — proving the
    struct packing is value-correct, not just shape-correct."""
    from outpost_spark.tenantstore import attempt_record

    df = _events(spark, sf_dir).withColumn("destination_type", F.lit("webhook"))
    rec = attempt_record(df, include=("event", "event.data"))
    return rec.select(
        "attempt_id",
        "event_id",
        "tenant_id",
        "destination_id",
        "destination_type",
        "status",
        "attempt_number",
        "manual",
        "attempt_time",
        F.col("event.event_id").alias("ev_id"),
        F.col("event.tenant_id").alias("ev_tenant_id"),
        F.col("event.destination_id").alias("ev_destination_id"),
        F.col("event.topic").alias("ev_topic"),
        F.col("event.time").alias("ev_time"),
        F.col("event.data").alias("ev_data"),
    )


# CCNet-style bigram LM model + scoring as SQL CTEs, parameterized by the
# training/scoring source CTE name (must expose doc_id, text).  Mirrors
# ops/lm.py::bigram_lm_score exactly: stupid-backoff, 6-decimal-rounded
# log-probs summed as DECIMAL(24,6), true perplexity = exp(-score).
def _lm_ctes(src: str) -> str:
    return rf"""
    __toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ws
      FROM {src}
    ),
    __uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c1
      FROM (SELECT unnest(ws) AS w FROM __toks) GROUP BY w
    ),
    __n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_total FROM __uni),
    __bgi AS (
      SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM __toks
    ),
    __bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM __bgi),
    __bgc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM __bg GROUP BY w1, w2
    ),
    __lp AS (
      SELECT b.doc_id,
        CAST(round(ln(
          CASE WHEN bc.c12 IS NOT NULL AND u1.c1 IS NOT NULL
               THEN CAST(bc.c12 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
               ELSE 0.4 * greatest(CAST(coalesce(u2.c1, 0) AS DOUBLE), 1.0)
                    / (SELECT n_total FROM __n)
          END), 6) AS DECIMAL(24,6)) AS lp
      FROM __bg b
      LEFT JOIN __bgc bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
      LEFT JOIN __uni u1 ON b.w1 = u1.w
      LEFT JOIN __uni u2 ON b.w2 = u2.w
    ),
    __pd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS lm_score
      FROM __lp GROUP BY doc_id
    )
"""


@_register(
    "lm_bigram_score",
    f"""
    WITH src AS (SELECT doc_id, text FROM documents),
    {_lm_ctes("src")}
    SELECT d.doc_id,
           CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           p.lm_score,
           round(exp(-p.lm_score), 6) AS lm_ppl
    FROM documents d LEFT JOIN __pd p ON d.doc_id = p.doc_id
    """,
)
def lm_bigram_score(spark, sf_dir):
    """L-family LM scoring (CCNet, Wenzek et al. 2020): self-trained
    stupid-backoff bigram model, per-doc average log-prob + true
    perplexity — the model IS a pair of count DataFrames, scoring is
    three equi-joins, the per-doc sum is order-independent DECIMAL, and
    the whole thing (model training included) is recomputed by the
    DuckDB oracle in CTEs (ops/lm.py:69)."""
    from outpost_spark.ops.lm import bigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_score(docs, "text", "doc_id")


@_register(
    "lm_ppl_buckets",
    f"""
    WITH src AS (SELECT doc_id, text FROM documents),
    {_lm_ctes("src")},
    sc AS (
      SELECT d.doc_id, round(exp(-p.lm_score), 6) AS lm_ppl
      FROM documents d LEFT JOIN __pd p ON d.doc_id = p.doc_id
    ),
    th AS (
      SELECT round(quantile_cont(lm_ppl, 1.0/3.0), 6) AS t1,
             round(quantile_cont(lm_ppl, 2.0/3.0), 6) AS t2
      FROM sc WHERE lm_ppl IS NOT NULL
    )
    SELECT doc_id, lm_ppl,
           CASE WHEN lm_ppl IS NULL THEN 'unscored'
                WHEN lm_ppl <= (SELECT t1 FROM th) THEN 'head'
                WHEN lm_ppl <= (SELECT t2 FROM th) THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM sc
    """,
)
def lm_ppl_buckets(spark, sf_dir):
    """CCNet's head/middle/tail perplexity split proper (Wenzek et al.
    2020 §4.4, L70): exact-percentile cut thresholds (one tiny
    aggregate, rounded to the shared 6-decimal scale) + a codegen
    comparison — deliberately NOT a global ntile window, which would
    serialize the corpus through one partition; unscoreable docs get an
    explicit bucket (ops/lm.py:perplexity_buckets)."""
    from outpost_spark.ops.lm import perplexity_buckets

    docs = _t(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "text", "doc_id")


@_register(
    "text_c4_filters",
    r"""
    WITH l AS (
      SELECT doc_id, text,
             list_transform(string_split(text, chr(10)), x -> trim(x)) AS lines
      FROM documents
    ),
    k AS (
      SELECT doc_id, text, lines,
             list_filter(lines, x ->
                (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')
                 OR ends_with(x, '"'))
                AND len(list_filter(string_split_regex(x, '\s+'), w -> w <> '')) >= 5
                AND NOT contains(lower(x), 'javascript')) AS kept
      FROM l
    ),
    c AS (
      SELECT doc_id, text, lines, kept,
             coalesce(array_to_string(kept, chr(10)), '') AS clean_text
      FROM k
    ),
    m AS (
      SELECT *,
             CAST(length(regexp_replace(clean_text, '[^.!?]', '', 'g')) AS BIGINT)
               AS n_sentences,
             NOT contains(text, chr(123)) AS ok_no_brace,
             NOT (contains(lower(text), 'lorem ipsum')
                  OR contains(lower(text), 'click here to subscribe')
                  OR contains(lower(text), 'viagra')) AS ok_no_badwords,
             len(kept) > 0 AS ok_has_lines
      FROM c
    )
    SELECT doc_id,
           CAST(len(list_filter(lines, x -> x <> '')) AS INT) AS n_lines,
           CAST(len(kept) AS INT) AS n_kept_lines,
           n_sentences,
           ok_no_brace,
           ok_no_badwords,
           n_sentences >= 3 AS ok_min_sentences,
           ok_has_lines,
           (ok_no_brace AND ok_no_badwords AND n_sentences >= 3 AND ok_has_lines)
             AS passes_c4,
           clean_text
    FROM m
    """,
)
def text_c4_filters(spark, sf_dir):
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2) — terminal-
    punctuation / min-words / javascript line filters plus brace,
    blocklist, and min-sentence page gates — as one whole-stage-codegen
    projection emitting per-rule flags, the cleaned text, and the AND
    (ops/text.py:c4_filters); rule formulas are integer/ASCII-portable,
    so the oracle is exact."""
    from outpost_spark.ops.text import c4_filters

    docs = _t(spark, sf_dir, "documents")
    return c4_filters(docs, "text", "doc_id")


def _fix_mojibake_sql(col: str) -> str:
    from outpost_spark.ops.text import _MOJIBAKE_FIXES

    expr = col
    for bad, good in _MOJIBAKE_FIXES:
        expr = f"replace({expr}, '{bad}', '{good}')"
    return expr


@_register(
    "text_fix_mojibake",
    f"""
    SELECT doc_id,
           {_fix_mojibake_sql("text")} AS fixed_text,
           CAST(len(regexp_extract_all(text, 'Ã.|â€.|Â ')) AS BIGINT)
             AS n_mojibake_before,
           CAST(len(regexp_extract_all({_fix_mojibake_sql("text")}, 'Ã.|â€.|Â ')) AS BIGINT)
             AS n_mojibake_after
    FROM documents
    """,
)
def text_fix_mojibake(spark, sf_dir):
    """Encoding-damage REPAIR (r07, completing r06's detection-only
    entry): literal ``replace`` chain over the generated
    UTF-8-as-cp1252 artifact table — pure codegen, exactly portable —
    plus before/after artifact counts so curation can measure repair
    coverage (ops/text.py:fix_mojibake); planted-artifact pytest pins
    the positive cases, this entry pins corpus-wide parity."""
    from outpost_spark.ops.text import fix_mojibake

    docs = _t(spark, sf_dir, "documents")
    return fix_mojibake(docs, "text", "doc_id")


def _curate_v5_ctes() -> str:
    """The v5 cleaning-cascade CTE chain up to the exact-deduped
    survivor set ``ex`` — shared by the v5 oracle (which stamps splits)
    and the v6 capstone oracle (which filters to train and keeps
    sampling/packaging)."""
    return f"""fx AS (SELECT doc_id, {_fix_mojibake_sql("text")} AS text FROM documents),
    qm AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS DOUBLE) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digits
      FROM fx
    ),
    q AS (
      SELECT doc_id,
             round((
               CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END +
               CASE WHEN n_chars > 0 AND n_punct / n_chars > 0 AND n_punct / n_chars < 0.1
                    THEN 1.0 ELSE 0.0 END +
               CASE WHEN (CASE WHEN n_chars > 0 THEN n_digits / n_chars ELSE 0.0 END) < 0.2
                    THEN 1.0 ELSE 0.0 END +
               CASE WHEN n_tokens > 0 AND n_chars / n_tokens >= 3 AND n_chars / n_tokens <= 12
                    THEN 1.0 ELSE 0.0 END
             ) / 4.0, 6) AS q
      FROM qm
    ),
    src AS (
      SELECT f.doc_id, f.text FROM fx f JOIN q USING (doc_id) WHERE q.q >= 0.5
    ),
    {_lm_ctes("src")},
    gated AS (
      SELECT s.doc_id, s.text
      FROM src s LEFT JOIN __pd p USING (doc_id)
      WHERE p.lm_score IS NULL OR round(exp(-p.lm_score), 6) <= 31.0
    ),
    ex AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cmin
        FROM gated
      ) WHERE doc_id = cmin
    )"""


def _build_curate_v5_sql() -> str:
    """Composed oracle for pipeline_curate_corpus_v5: mojibake replace
    chain -> quality gate (formula identical to _QUALITY_SQL, over the
    REPAIRED text) -> self-trained bigram-LM perplexity gate (the
    lm_bigram_score CTEs over the quality-passing slice, true-ppl
    threshold, short docs kept) -> exact-dedup window -> 90/5/5 hash
    split."""
    frac = _HASH_FRAC_SQL.format(seed="curate")
    return f"""
    WITH {_curate_v5_ctes()}
    SELECT doc_id,
           CASE WHEN {frac} < 0.9 THEN 'train'
                WHEN {frac} < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM ex
    """


def _build_curate_v6_sql() -> str:
    """Composed oracle for pipeline_curate_corpus_v6 — the capstone:
    the full v5 cascade, train split only, then temperature mixing
    (alpha=0.5, target 300), a 120k-char token-budget prefix, the
    deterministic 8-way shard shuffle, and the bounded two-level
    per-shard manifests.  Every sub-chain is copied verbatim from its
    standalone entry's oracle, so this pins the COMPOSITION."""
    split_frac = _HASH_FRAC_SQL.format(seed="curate")
    mix_frac = _HASH_FRAC_SQL.format(seed="temp")
    return f"""
    WITH {_curate_v5_ctes()},
    tr AS (SELECT doc_id FROM ex WHERE {split_frac} < 0.9),
    m AS (
      SELECT t.doc_id, d.lang, d.n_chars
      FROM tr t JOIN documents d USING (doc_id)
    ),
    s AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM m GROUP BY lang),
    z AS (SELECT sum(pow(n, 0.5)) AS z FROM s),
    r AS (
      SELECT lang,
             round(least(1.0, 300.0 * pow(n, 0.5) / (SELECT z FROM z) / n), 9)
               AS rate
      FROM s
    ),
    mx AS (
      SELECT m.doc_id, m.n_chars
      FROM m JOIN r USING (lang)
      WHERE {mix_frac} < r.rate
    ),
    bk AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             CAST(('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS k
      FROM mx
    ),
    kept AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, w, sum(w) OVER (ORDER BY k, doc_id) AS c FROM bk) z2
      WHERE c <= 120000
    ),
    sh AS (
      SELECT doc_id, w,
             CAST(CAST(('0x' || substr(md5('shuffle|shard|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard
      FROM kept
    ),
    sub AS (
      SELECT shard,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS sb,
             count(*) AS n_docs,
             sum(w) AS mass,
             md5(string_agg(CAST(doc_id AS VARCHAR), ','
                 ORDER BY CAST(doc_id AS VARCHAR))) AS sub_md5
      FROM sh
      GROUP BY shard, sb
    )
    SELECT shard,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(mass) AS BIGINT) AS mass,
           md5(string_agg(sub_md5, ',' ORDER BY sub_md5)) AS ids_checksum
    FROM sub
    GROUP BY shard
    """


@_register("pipeline_curate_corpus_v5", _build_curate_v5_sql())
def pipeline_curate_corpus_v5(spark, sf_dir):
    """The CCNet-ordered curation chain (r07): mojibake repair ->
    quality gate -> self-trained bigram-LM perplexity gate (true-ppl
    threshold 31.0, ~the corpus' 90th percentile; short docs kept) ->
    exact dedup -> 90/5/5 split.  Every stage is an independently-
    oracled operator (text_fix_mojibake, text_quality_score,
    lm_bigram_score, dedup_exact_documents, sample_hash_split); this
    entry pins their COMPOSITION — including retraining the LM on the
    gate's own output slice — against one DuckDB oracle
    (ops/pipeline.py:curate_corpus_v5)."""
    from outpost_spark.ops.pipeline import curate_corpus_v5

    docs = _t(spark, sf_dir, "documents")
    return curate_corpus_v5(docs, max_ppl=31.0)


@_register("pipeline_curate_corpus_v6", _build_curate_v6_sql())
def pipeline_curate_corpus_v6(spark, sf_dir):
    """The training-set assembly capstone (r08): the v5 cleaning
    cascade, train split only, then temperature-flattened language
    mixing (alpha=0.5, target 300) -> 120k-char token-budget prefix ->
    deterministic 8-way shard shuffle -> bounded two-level per-shard
    manifests — the single entry a training-data team would actually
    run, returning the manifest table its job verifies before step one.
    One composed DuckDB oracle re-derives the whole chain, LM
    retraining included (ops/pipeline.py:curate_corpus_v6)."""
    from outpost_spark.ops.pipeline import curate_corpus_v6

    docs = _t(spark, sf_dir, "documents")
    return curate_corpus_v6(docs, max_ppl=31.0)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metrics_error_rate_daily(spark, sf_dir)


# Emission order for the driver contract.  The driver walks ``queries()``
# in dict order under a cumulative time budget AND a hard 50-row cap; the
# catalog has >50 entries, so full driver coverage is only achievable by
# ROTATION across rounds (VERDICT r04 "What's missing" #1).  The order is
# therefore computed per-round from two inputs:
#
#   1. Witness history — ``CORRECTNESS_r*.json`` at the repo root records
#      which entries got a driver row each round.  Entries are ordered by
#      most-recent-witness round ascending (never-witnessed first, then the
#      ones skipped longest), so every entry is witnessed at least once per
#      ceil(catalog/50) rounds — two-round cadence up to 100 entries,
#      three-round at the current ~105.
#   2. ``_COST_RANK`` — ascending measured sf0.01 cost, the tiebreak
#      within a witness-round group, so a driver budget cut starves the
#      fewest entries and the multi-second dedup/pipeline family sits at
#      each group's tail.
#
# If no history files are readable (fresh checkout), the order degrades to
# pure ``_COST_RANK``, which is the r04 static order.
_COST_RANK = [
    "store_obfuscate_credentials",
    "store_list_destinations",
    "publish_validation",
    "attempt_record_flat",
    "attempt_record_include",
    "text_quality_score",
    "text_language_id",
    "text_normalized_fingerprint",
    "embed_quantize_int8",
    "embed_cosine_topk",
    "embed_ann_lsh_topk",
    "embed_near_dup_pairs",
    "multimodal_decoded",
    "multimodal_features",
    # remaining cheap entries, ascending measured sf0.01 cost
    "sample_train_val_test",
    "text_fingerprint",
    "sample_hash_documents",
    "sample_mix_by_rates",
    "text_token_stats",
    "dedup_ngram_contamination",
    "dedup_paragraphs_global",
    "text_chunk_documents",
    "text_length_percentiles",
    "dedup_exact_documents",
    "retry_backoff_schedule",
    "text_length_histogram",
    "dedup_drop_duplicates",
    "filter_array_overlap",
    "list_time_window_gt_lt",
    "point_lookup_event",
    "alert_consecutive_failures",
    "filter_topic_glob",
    "list_events_first_page",
    "join_explode_unnest",
    "lineitem_pricing_summary",
    "text_pii_redact",
    "join_latest_attempt_per_key",
    "filter_json_predicate",
    "metrics_15m_dense",
    "list_events_keyset_page",
    "join_broadcast_dim",
    "dedup_simhash",
    "metrics_filtered_by_topic_status",
    "text_repetition_stats",
    "join_multiway_star",
    "metrics_retry_measures",
    "metrics_rate_whole_range",
    "agg_count_distinct_salted",
    "sink_format_kinesis",
    "text_gopher_quality",
    "text_top_tokens_approx",
    "sample_token_budget",
    "join_asof_checkpoint",
    "join_range_windows",
    "pack_training_sequences",
    "embed_pq_topk",
    "dedup_simhash_pairs",
    "metrics_sunday_weekly",
    "sample_stratified_quota",
    "dedup_ngram_jaccard_grouped",
    "embed_ann_ivf_topk",
    "metrics_monthly",
    "metrics_2day_epoch_buckets",
    "metrics_error_rate_daily",
    "dedup_substrings_global",
    "routing_match_fanout",
    "dedup_url_canonical",
    # r07 entries, placed by their measured sf0.1 warm cost
    "text_c4_filters",
    "text_fix_mojibake",
    "sample_temperature_mix",
    "sample_shard_manifest",
    "text_ngram_repetition",
    # the heavy tail — multi-second at sf0.01 even tuned
    "dedup_cross_corpus_near_dups",
    "embed_semantic_dedup",
    "embed_knn_join",
    "embed_knn_join_bulk",
    "embed_semantic_dedup_bulk",
    "embed_knn_join_brute",
    "pipeline_curate_corpus_v2",
    "pipeline_curate_corpus_v3",
    "dedup_canonical_survivors",
    "dedup_connected_components",
    "metrics_daily_by_topic",
    "metrics_hourly_count",
    "metrics_count_all",
    "pipeline_curate_corpus",
    "dedup_minhash_lsh_pairs_fast",
    "dedup_minhash_lsh_pairs",
    "text_top_tokens",
    "lm_bigram_score",
    "pipeline_curate_corpus_v5",
]


def _row_witnesses(name: str, row) -> bool:
    """Does a driver correctness row count as witnessing the entry's FULL
    current contract?  For oracle-backed entries only a green value
    comparison (``hash_match: true``) counts — an old ``no_oracle``
    rows-only row predates the oracle and must not keep the entry out of
    the driver's sample window (VERDICT r11 task #1).  Entries without
    an oracle are witnessed by any row (rows-only is their whole
    contract), and a red/error row on them still counts: the driver saw
    the entry, which is what rotation fairness needs."""
    if _REGISTRY.get(name, (None, None))[1] is None:
        return True
    return isinstance(row, dict) and row.get("hash_match") is True


def _witness_history() -> dict[str, int]:
    """name -> most recent round whose ``CORRECTNESS_r*.json`` has a driver
    row that witnesses the entry per :func:`_row_witnesses` (absent =
    never witnessed at its current contract)."""
    import glob
    import json as _json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        try:
            with open(path) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        rnd = int(m.group(1))
        for name, row in data.items():
            if _row_witnesses(name, row):
                hist[name] = max(hist.get(name, 0), rnd)
    return hist


def _emit_order() -> list[str]:
    rank = {n: i for i, n in enumerate(_COST_RANK)}
    hist = _witness_history()
    # never-witnessed entries (hist 0) lead; within a witness-round group,
    # ascending measured cost; brand-new entries missing from _COST_RANK
    # sort at their group's tail (they have no measurement yet).
    order = sorted(
        _REGISTRY, key=lambda n: (hist.get(n, 0), rank.get(n, len(_COST_RANK)), n)
    )
    # safety: never drop a registered entry
    assert set(order) == set(_REGISTRY), set(_REGISTRY) ^ set(order)
    return order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _emit_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _emit_order()
        if _REGISTRY[name][1] is not None
    }
