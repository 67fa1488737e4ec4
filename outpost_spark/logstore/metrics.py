"""The metrics (OLAP) engine — QueryEventMetrics / QueryAttemptMetrics.

Reference semantics (cited per item):
- Request shape: internal/logstore/driver/metrics.go:26-55
  (TimeRange, Granularity?, Measures[], Dimensions[], Filters{}).
- Measure expressions: internal/logstore/chlogstore/metrics.go:127-133
  (events) and :355-382 (attempts) — exact distinct counts (``uniqExact``),
  conditional variants, error_rate = failed/total, avg(attempt_number).
- Time predicate: ``time >= start AND time < end``
  (chlogstore/metrics.go:139-141, 389-391).
- Filters: equality sets per allowlisted key; events ``destination_id``
  filter is array-overlap on matched_destination_ids
  (chlogstore/metrics.go:136-151, 386-414).
- Dimension allowlists: internal/apirouter/metrics_handlers.go:53-61.
- Gap filling: internal/logstore/bucket/fill.go — one row per (observed
  dimension combo) x (aligned slot); zeros only for requested measures.
- Rates: internal/logstore/driver/rate.go — count / bucket seconds; months
  use true calendar length; no granularity => whole-range duration.
- Row cap: 100_000 (+1 to detect truncation), chlogstore/metrics.go:16.

Spark-first design notes (100 TB):
- One declarative plan: scan -> filter (pushed to parquet) -> (explode for
  the events-by-destination dim, J6) -> groupBy(bucket, dims) -> agg.
  Catalyst does partial+final hash aggregation (map-side combine), so the
  shuffle moves one row per (bucket, dims) per task, not raw data.
- Exact countDistinct is the reference's chosen semantic; Spark plans it as
  a two-phase expand+agg.  The time predicate always bounds the scan, and
  month partition pruning applies when the table is written partitioned on
  ``month(time)`` (see insert.py).
- Gap filling joins a <=100k-slot local relation (guardrail enforced before
  anything is built) against observed dim combos — the slots side is
  broadcast, never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from outpost_spark.functions.buckets import (
    Granularity,
    bucket_count,
    bucket_duration_seconds_expr,
    bucket_epoch_expr,
    bucket_slots,
    parse_granularity,
    MAX_BUCKETS,
    TooManyBucketsError,
)

ROW_LIMIT = 100_000  # chlogstore/metrics.go:16
# " SETTINGS max_execution_time = 30, max_rows_to_group_by = 5000000,
#   group_by_overflow_mode = 'throw'" (chlogstore/metrics.go:13)
MAX_GROUPS = 5_000_000
QUERY_TIMEOUT_S = 30.0


class ResourceLimitError(Exception):
    """driver.ErrResourceLimit — the API layer maps this to HTTP 400
    (wrapCHMetricsError, chlogstore/metrics.go:591-599)."""


class MetricsTimeoutError(ResourceLimitError):
    """Query exceeded the execution-time budget (TIMEOUT_EXCEEDED analog)."""


class GroupLimitExceededError(ResourceLimitError):
    """Aggregation produced more than MAX_GROUPS groups (TOO_MANY_ROWS /
    max_rows_to_group_by analog)."""

EVENT_MEASURES = ("count", "rate")
ATTEMPT_MEASURES = (
    "count",
    "successful_count",
    "failed_count",
    "error_rate",
    "first_attempt_count",
    "retry_count",
    "manual_retry_count",
    "avg_attempt_number",
    "rate",
    "successful_rate",
    "failed_rate",
)
# metrics_handlers.go:53-61
EVENT_DIMENSIONS = ("tenant_id", "topic", "destination_id")
ATTEMPT_DIMENSIONS = (
    "tenant_id",
    "topic",
    "destination_id",
    "destination_type",
    "status",
    "code",
    "manual",
    "attempt_number",
)

# driver/rate.go:6-11
_RATE_DEPS = {"rate": "count", "successful_rate": "successful_count", "failed_rate": "failed_count"}


@dataclass(frozen=True)
class TimeRange:
    start: datetime
    end: datetime


@dataclass
class MetricsRequest:
    """MetricsRequest (driver/metrics.go:49-55).

    ``assume_deduped``: the reference keeps exact ``uniqExact`` counts
    because ReplacingMergeTree may hold not-yet-collapsed duplicate rows.
    When the table is written through the commit-marker sink (per-batch
    markers + in-batch dedup), distinct counts degenerate to plain
    conditional counts, removing one full shuffle of the id column from
    every metrics query.  Caveat: a crash between a batch's append and
    its marker write replays the batch and duplicates its rows (see
    streaming/pipeline.make_log_sink), so this fast path can overcount
    until a dedup compaction runs — opt in only when that window is
    acceptable or compaction is scheduled.  Defaults to False (byte-equal
    reference semantics, duplicate-safe).

    ``approx_distinct``: HyperLogLog++ distinct counts
    (``approx_count_distinct`` at ``approx_rsd`` relative error) instead
    of exact.  The exact path shuffles (bucket, dims, id) once to
    de-duplicate ids and again to merge counts; HLL sketches merge in the
    ordinary partial/final aggregation, removing the id shuffle entirely
    — at 100 TB that is the difference between shuffling every attempt id
    and shuffling a fixed-size sketch per group.  Duplicate-safe (unlike
    ``assume_deduped``) but APPROXIMATE — dashboards yes, billing no.
    Ignored when ``assume_deduped`` is set (plain counts are already
    one-pass and exact).
    """

    time_range: TimeRange
    measures: list[str]
    granularity: str | Granularity | None = None
    dimensions: list[str] = field(default_factory=list)
    filters: dict[str, list] = field(default_factory=dict)
    assume_deduped: bool = False
    approx_distinct: bool = False
    approx_rsd: float = 0.05

    def distinct_mode(self) -> str:
        if self.assume_deduped:
            return "deduped"
        return "approx" if self.approx_distinct else "exact"

    def gran(self) -> Granularity | None:
        if self.granularity is None:
            return None
        if isinstance(self.granularity, Granularity):
            return self.granularity
        return parse_granularity(self.granularity)


def _enrich_measures(measures: list[str]) -> list[str]:
    """driver/rate.go:15-33 — append missing count deps for requested rates."""
    out = list(measures)
    seen = set(measures)
    for m in measures:
        dep = _RATE_DEPS.get(m)
        if dep and dep not in seen:
            out.append(dep)
            seen.add(dep)
    return out


def _count_distinct_if(
    id_col: str, cond: Column, mode: str, rsd: float = 0.05
) -> Column:
    if mode == "deduped":
        return F.count(F.when(cond, F.lit(1)))
    if mode == "approx":
        return F.approx_count_distinct(F.when(cond, F.col(id_col)), rsd)
    return F.count_distinct(F.when(cond, F.col(id_col)))


def _count_distinct(id_col: str, mode: str, rsd: float = 0.05) -> Column:
    if mode == "deduped":
        return F.count(F.lit(1))
    if mode == "approx":
        return F.approx_count_distinct(F.col(id_col), rsd)
    return F.count_distinct(F.col(id_col))


def _attempt_measure_expr(measure: str, mode: str = "exact", rsd: float = 0.05) -> Column | None:
    """chlogstore/metrics.go:355-382; rates are post-aggregation (None here)."""
    c = F.col
    if measure == "count":
        return _count_distinct("attempt_id", mode, rsd)
    if measure == "successful_count":
        return _count_distinct_if("attempt_id", c("status") == "success", mode, rsd)
    if measure == "failed_count":
        return _count_distinct_if("attempt_id", c("status") == "failed", mode, rsd)
    if measure == "error_rate":
        return _count_distinct_if(
            "attempt_id", c("status") == "failed", mode, rsd
        ) / _count_distinct("attempt_id", mode, rsd)
    if measure == "first_attempt_count":
        return _count_distinct_if(
            "attempt_id", (c("attempt_number") == 1) & ~c("manual"), mode, rsd
        )
    if measure == "retry_count":
        return _count_distinct_if("attempt_id", c("attempt_number") > 1, mode, rsd)
    if measure == "manual_retry_count":
        return _count_distinct_if("attempt_id", c("manual"), mode, rsd)
    if measure == "avg_attempt_number":
        return F.avg(c("attempt_number"))
    return None  # rate / successful_rate / failed_rate: post-agg


def _event_measure_expr(measure: str, mode: str = "exact", rsd: float = 0.05) -> Column | None:
    if measure == "count":
        return _count_distinct("event_id", mode, rsd)
    return None


def _apply_filters(df: DataFrame, filters: dict[str, list], *, events: bool) -> DataFrame:
    for key, values in filters.items():
        if not values:
            continue
        if events and key == "destination_id":
            # chlogstore/metrics.go:143-147 — array overlap on matched ids
            df = df.filter(
                F.arrays_overlap(
                    F.col("matched_destination_ids"), F.array(*[F.lit(v) for v in values])
                )
            )
        else:
            df = df.filter(F.col(key).isin(values))
    return df


def _gap_fill(
    spark: SparkSession,
    result: DataFrame,
    req: MetricsRequest,
    measures: list[str],
    requested: list[str],
) -> DataFrame:
    """fill.go:13-120 — slots x observed-dim-combos, zeros for requested measures."""
    g = req.gran()
    slots = bucket_slots(req.time_range.start, req.time_range.end, g)
    if not slots:
        return result
    slots_df = spark.createDataFrame([(s,) for s in slots], "time_bucket bigint")
    if req.dimensions:
        # the agg result is referenced twice below (dim combos + the left
        # join); exchange reuse does NOT fire for these two subtrees
        # (measured), so materialize it once — bounded by the bucket and
        # group-count guardrails (≤100k slots, ≤5M groups), and already
        # persisted (no-op) on the guarded run_metrics path
        if not result.isStreaming:
            result = result.localCheckpoint(eager=True)
        combos = result.select(*req.dimensions).distinct()
        grid = F.broadcast(slots_df).crossJoin(combos)
        join_keys = ["time_bucket", *req.dimensions]
    else:
        grid = slots_df
        join_keys = ["time_bucket"]
    filled = grid.join(result, on=join_keys, how="left")
    zero_float = {"error_rate", "avg_attempt_number"}
    for m in measures:
        if m in _RATE_DEPS:
            continue  # computed post-fill
        default = F.lit(0.0) if m in zero_float else F.lit(0)
        if m in requested:
            filled = filled.withColumn(m, F.coalesce(F.col(m), default))
    return filled


def _finalize(
    spark: SparkSession,
    df: DataFrame,
    req: MetricsRequest,
    measures: list[str],
    *,
    time_col: str,
) -> DataFrame:
    """Shared tail: groupBy -> agg happened; now gap-fill, rates, order, cap."""
    g = req.gran()
    requested = list(req.measures)
    if g is not None:
        df = _gap_fill(spark, df, req, measures, requested)

    # rates (driver/rate.go) — from counts & bucket duration
    rate_wanted = [m for m in requested if m in _RATE_DEPS]
    if rate_wanted:
        if g is not None:
            dur = bucket_duration_seconds_expr(
                F.timestamp_seconds(F.col("time_bucket")), g
            ).cast("double")
        else:
            dur = F.lit((req.time_range.end - req.time_range.start).total_seconds())
        for m in rate_wanted:
            df = df.withColumn(m, F.coalesce(F.col(_RATE_DEPS[m]), F.lit(0)) / dur)

    # drop enriched-only helper counts not requested
    for m in measures:
        if m not in requested:
            df = df.drop(m)

    order_cols = []
    if g is not None:
        order_cols.append(F.col("time_bucket"))
    order_cols += [F.col(d) for d in req.dimensions]
    if order_cols:
        df = df.orderBy(*order_cols)
    return df.limit(ROW_LIMIT + 1)


def _aggregate(
    df: DataFrame,
    req: MetricsRequest,
    *,
    events: bool,
) -> tuple[DataFrame, list[str], str]:
    """Validate the request and build the scan->filter->groupBy->agg plan.

    Returns (aggregated frame before gap-fill/rates/order/limit, enriched
    measure list, time column name).
    """
    if req.time_range.end <= req.time_range.start:
        raise ValueError("time range end must be after start")  # driver/metrics.go:19-24
    g = req.gran()
    if g is not None:
        n = bucket_count(req.time_range.start, req.time_range.end, g)
        if n > MAX_BUCKETS:
            raise TooManyBucketsError(f"{n} buckets > {MAX_BUCKETS}")

    allowed_dims = EVENT_DIMENSIONS if events else ATTEMPT_DIMENSIONS
    allowed_measures = EVENT_MEASURES if events else ATTEMPT_MEASURES
    for d in req.dimensions:
        if d not in allowed_dims:
            raise ValueError(f"invalid dimension {d!r}")
    for m in req.measures:
        if m not in allowed_measures:
            raise ValueError(f"invalid measure {m!r}")

    time_col = "event_time" if events else "attempt_time"
    measures = _enrich_measures(req.measures)

    df = df.filter(
        (F.col(time_col) >= F.lit(req.time_range.start))
        & (F.col(time_col) < F.lit(req.time_range.end))
    )
    df = _apply_filters(df, req.filters, events=events)

    if events and "destination_id" in req.dimensions:
        # J6: explode matched ids (chlogstore arrayJoin — metrics.go:163-166)
        df = df.withColumn("destination_id", F.explode(F.col("matched_destination_ids")))

    group_cols: list[Column] = []
    if g is not None:
        group_cols.append(bucket_epoch_expr(F.col(time_col), g).alias("time_bucket"))
    group_cols += [F.col(d) for d in req.dimensions]

    agg_exprs = []
    mode = req.distinct_mode()
    for m in measures:
        e = (
            _event_measure_expr(m, mode, req.approx_rsd)
            if events
            else _attempt_measure_expr(m, mode, req.approx_rsd)
        )
        if e is not None:
            agg_exprs.append(e.alias(m))
    # HAVING count() > 0 (chlogstore/metrics.go:174-178) — raw-row guard
    agg_exprs.append(F.count(F.lit(1)).alias("__raw_count"))

    if group_cols:
        out = df.groupBy(*group_cols).agg(*agg_exprs)
    else:
        out = df.agg(*agg_exprs)
    out = out.filter(F.col("__raw_count") > 0).drop("__raw_count")
    return out, measures, time_col


def _query_metrics(
    df: DataFrame,
    req: MetricsRequest,
    *,
    events: bool,
) -> DataFrame:
    out, measures, time_col = _aggregate(df, req, events=events)
    return _finalize(df.sparkSession, out, req, measures, time_col=time_col)


def query_event_metrics(events_df: DataFrame, req: MetricsRequest) -> DataFrame:
    """QueryEventMetrics (driver/metrics.go:26-33) as one DataFrame plan.

    Output columns: ``time_bucket`` (bigint epoch-seconds, present iff
    granularity), each requested dimension, each requested measure.
    """
    return _query_metrics(events_df, req, events=True)


def query_attempt_metrics(attempts_df: DataFrame, req: MetricsRequest) -> DataFrame:
    """QueryAttemptMetrics (driver/metrics.go:35-47) as one DataFrame plan."""
    return _query_metrics(attempts_df, req, events=False)


@dataclass
class MetricsResponse:
    """API response shape (metrics_handlers.go:315-419).

    ``data``: one dict per point — {time_bucket?, dimensions{}, metrics{}};
    ``truncated``: the plan fetched ROW_LIMIT+1 rows, got more than the cap.
    """

    data: list[dict]
    granularity: str | None
    row_count: int
    row_limit: int
    truncated: bool
    query_time_ms: int


def run_metrics(
    df: DataFrame,
    req: MetricsRequest,
    *,
    events: bool,
    timeout_s: float | None = QUERY_TIMEOUT_S,
    max_groups: int | None = MAX_GROUPS,
) -> MetricsResponse:
    """Execute a metrics query and shape the response with metadata.

    Rows beyond ROW_LIMIT are dropped and flagged (chlogstore/
    metrics.go:565-568); each point splits into dimensions vs metrics maps.

    Resource guardrails mirror the reference's ClickHouse settings
    (chlogstore/metrics.go:13-25):

    - ``timeout_s`` (max_execution_time): the query runs inside a Spark job
      group; a watchdog cancels the group at the deadline and the call
      raises :class:`MetricsTimeoutError` (→ HTTP 400 at the API layer).
    - ``max_groups`` (max_rows_to_group_by + group_by_overflow_mode=throw):
      for dimensioned queries, the aggregated frame is persisted and
      counted with an early-stop ``limit(max_groups+1)`` before
      finalization; exceeding it raises :class:`GroupLimitExceededError`.
      Persisting means the guard, the gap-fill's two references, and the
      final collect all share ONE aggregation pass.

    Pass ``None`` for either to disable that guard.
    """
    import threading as _threading
    import time as _time
    import uuid as _uuid

    spark = df.sparkSession
    sc = spark.sparkContext
    t0 = _time.perf_counter()

    agg, measures, time_col = _aggregate(df, req, events=events)
    guard_groups = max_groups is not None and bool(req.dimensions)
    if guard_groups:
        agg = agg.persist()

    group = f"metrics-{_uuid.uuid4().hex[:12]}"
    timed_out = _threading.Event()

    def _cancel():
        timed_out.set()
        try:
            sc.cancelJobGroup(group)
        except Exception:
            pass

    timer = _threading.Timer(timeout_s, _cancel) if timeout_s is not None else None
    sc.setJobGroup(group, "metrics query", interruptOnCancel=True)
    try:
        if timer is not None:
            timer.start()
        try:
            if guard_groups:
                n_groups = agg.limit(max_groups + 1).count()
                if n_groups > max_groups:
                    raise GroupLimitExceededError(
                        f"metrics aggregation exceeded {max_groups} groups"
                    )
            out = _finalize(spark, agg, req, measures, time_col=time_col)
            rows = out.collect()
            # the watchdog can fire BETWEEN Spark jobs (driver-side
            # planning, or after the guard count and before this collect)
            # — cancelJobGroup only reaches running jobs, so a query that
            # kept going past the deadline may land here without any
            # exception; max_execution_time semantics say it still fails
            if timed_out.is_set():
                raise MetricsTimeoutError(f"metrics query exceeded {timeout_s}s")
        except (MetricsTimeoutError, GroupLimitExceededError):
            raise
        except Exception as e:
            if timed_out.is_set():
                raise MetricsTimeoutError(
                    f"metrics query exceeded {timeout_s}s"
                ) from e
            raise
    finally:
        if timer is not None:
            timer.cancel()
        sc.setLocalProperty("spark.jobGroup.id", None)
        if guard_groups:
            agg.unpersist()
    elapsed_ms = int((_time.perf_counter() - t0) * 1000)
    truncated = len(rows) > ROW_LIMIT
    rows = rows[:ROW_LIMIT]
    points = []
    for r in rows:
        d = r.asDict()
        point: dict = {}
        if "time_bucket" in d:
            point["time_bucket"] = d.pop("time_bucket")
        point["dimensions"] = {k: d.pop(k) for k in req.dimensions}
        point["metrics"] = {m: d.get(m) for m in req.measures}
        points.append(point)
    return MetricsResponse(
        data=points,
        granularity=req.granularity,
        row_count=len(points),
        row_limit=ROW_LIMIT,
        truncated=truncated,
        query_time_ms=elapsed_ms,
    )


def run_event_metrics(events_df: DataFrame, req: MetricsRequest, **kw) -> MetricsResponse:
    return run_metrics(events_df, req, events=True, **kw)


def run_attempt_metrics(attempts_df: DataFrame, req: MetricsRequest, **kw) -> MetricsResponse:
    return run_metrics(attempts_df, req, events=False, **kw)
