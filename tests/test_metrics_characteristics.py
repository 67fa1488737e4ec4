"""Behavioral characteristics of the metrics engine — ports of
metrics_characteristics.go: truncation flag, calendar-aware monthly rates,
gap fill over an empty range, double-run determinism."""

from datetime import datetime, timezone

import pytest

import outpost_spark.logstore.metrics as M
from outpost_spark.fixtures import DS_END, DS_START, TENANT_1, golden_dataframes
from outpost_spark.logstore.metrics import (
    MetricsRequest,
    TimeRange,
    query_attempt_metrics,
    run_attempt_metrics,
)

FULL = TimeRange(DS_START, DS_END)
T1 = {"tenant_id": [TENANT_1]}


@pytest.fixture(scope="module")
def golden(spark):
    events, attempts = golden_dataframes(spark)
    attempts.cache().count()
    return events, attempts


def test_truncation_flag_set_beyond_row_cap(golden, monkeypatch):
    _, attempts = golden
    monkeypatch.setattr(M, "ROW_LIMIT", 3)
    resp = run_attempt_metrics(
        attempts,
        MetricsRequest(FULL, measures=["count"], granularity="1d", filters=T1),
    )
    assert resp.truncated is True
    assert resp.row_count == 3 and len(resp.data) == 3
    assert resp.row_limit == 3


def test_monthly_rate_uses_calendar_month_seconds(golden):
    # Jan 2000 has 31 days -> 2678400 s; rate = count / 2678400 per bucket
    _, attempts = golden
    out = query_attempt_metrics(
        attempts,
        MetricsRequest(FULL, measures=["count", "rate"], granularity="1M", filters=T1),
    ).collect()
    jan = [r for r in out if r["count"] > 0]
    assert len(jan) == 1
    assert jan[0]["rate"] == pytest.approx(jan[0]["count"] / 2678400.0)


def test_gap_fill_empty_range_emits_all_zero_slots(golden):
    # a day with no data at 1h granularity -> exactly 24 zero rows
    _, attempts = golden
    empty_day = TimeRange(
        datetime(2000, 3, 10, tzinfo=timezone.utc),
        datetime(2000, 3, 11, tzinfo=timezone.utc),
    )
    out = query_attempt_metrics(
        attempts,
        MetricsRequest(empty_day, measures=["count"], granularity="1h", filters=T1),
    ).collect()
    assert len(out) == 24
    assert all(r["count"] == 0 for r in out)
    # slots are contiguous hour starts
    buckets = [r["time_bucket"] for r in out]
    assert buckets == sorted(buckets)
    assert buckets[1] - buckets[0] == 3600


def test_double_run_is_deterministic(golden):
    _, attempts = golden
    req = MetricsRequest(
        FULL,
        measures=["count", "error_rate"],
        dimensions=["status"],
        granularity="1d",
        filters=T1,
    )
    a = [r.asDict() for r in query_attempt_metrics(attempts, req).collect()]
    b = [r.asDict() for r in query_attempt_metrics(attempts, req).collect()]
    assert a == b


def test_assume_deduped_matches_exact_on_clean_store(golden):
    # the golden store has no duplicate ids — the deduped fast path must
    # produce identical numbers to the exact-distinct reference semantics
    from dataclasses import replace

    _, attempts = golden
    req = MetricsRequest(
        FULL,
        measures=["count", "failed_count", "error_rate", "retry_count"],
        dimensions=["status"],
        granularity="1d",
        filters=T1,
    )
    exact = [r.asDict() for r in query_attempt_metrics(attempts, req).collect()]
    fast = [
        r.asDict()
        for r in query_attempt_metrics(
            attempts, replace(req, assume_deduped=True)
        ).collect()
    ]
    assert fast == exact


def test_group_limit_guard_throws_400_analog(golden):
    """max_rows_to_group_by + group_by_overflow_mode='throw'
    (chlogstore/metrics.go:13): a dimension combo producing more groups
    than the cap raises GroupLimitExceededError (the HTTP-400 path)."""
    _, attempts = golden
    req = MetricsRequest(
        FULL,
        measures=["count"],
        granularity="1d",
        dimensions=["tenant_id", "topic"],
    )
    with pytest.raises(M.GroupLimitExceededError):
        run_attempt_metrics(attempts, req, max_groups=2)


def test_group_limit_guard_passes_under_cap(golden):
    _, attempts = golden
    req = MetricsRequest(
        FULL, measures=["count"], granularity="1d", dimensions=["tenant_id"],
        filters=T1,
    )
    resp = run_attempt_metrics(attempts, req, max_groups=M.MAX_GROUPS)
    assert resp.row_count > 0


def test_group_limit_guard_skipped_without_dimensions(golden):
    """Without dimensions, groups == buckets <= MAX_BUCKETS — no guard job."""
    _, attempts = golden
    req = MetricsRequest(FULL, measures=["count"], granularity="1d", filters=T1)
    resp = run_attempt_metrics(attempts, req, max_groups=1)  # would trip if checked
    assert resp.row_count > 0


def test_query_timeout_cancels_job_group(golden):
    """max_execution_time=30 analog: the watchdog cancels the Spark job
    group at the deadline and the call surfaces MetricsTimeoutError."""
    import time as _time

    from pyspark.sql import functions as F

    _, attempts = golden
    # a pandas UDF that sleeps makes the collect outlast any tiny deadline
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def slow_id(s: pd.Series) -> pd.Series:
        _time.sleep(5)
        return s

    slowed = attempts.withColumn("attempt_id", slow_id(F.col("attempt_id")))
    req = MetricsRequest(FULL, measures=["count"], granularity="1d", filters=T1)
    t0 = _time.perf_counter()
    with pytest.raises(M.MetricsTimeoutError):
        run_attempt_metrics(slowed, req, timeout_s=1.0)
    assert _time.perf_counter() - t0 < 30, "cancellation should not wait out the query"


def test_timeout_disabled_runs_to_completion(golden):
    _, attempts = golden
    req = MetricsRequest(FULL, measures=["count"], granularity="1d", filters=T1)
    resp = run_attempt_metrics(attempts, req, timeout_s=None)
    assert resp.row_count > 0


def test_timeout_fires_between_jobs_still_raises(golden):
    """cancelJobGroup only reaches RUNNING jobs — a deadline that elapses
    while the driver is between jobs must still surface
    MetricsTimeoutError (max_execution_time semantics), via the
    post-collect deadline check."""
    _, attempts = golden
    req = MetricsRequest(FULL, measures=["count"], granularity="1d", filters=T1)
    # a deadline this small fires during driver-side planning, before any
    # job starts — the cancel itself is a no-op, the flag check must raise
    with pytest.raises(M.MetricsTimeoutError):
        run_attempt_metrics(attempts, req, timeout_s=1e-6)


def test_approx_distinct_mode(spark):
    """approx_distinct: HLL sketches instead of exact distinct — results
    within the configured rsd of exact, and the plan drops the dedicated
    id-distinct exchange (sketches merge in the ordinary partial/final
    aggregation)."""
    from datetime import datetime, timezone

    from outpost_spark.logstore.metrics import (
        MetricsRequest,
        TimeRange,
        query_attempt_metrics,
    )

    rows = [
        (
            f"a{i}",
            f"e{i}",
            "t1",
            "user.created",
            datetime(2024, 1, 1, i % 24, tzinfo=timezone.utc),
            "success" if i % 5 else "failed",
            False,
            1,
            "d1",
            ["d1"],
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows,
        "attempt_id string, event_id string, tenant_id string, topic string, "
        "attempt_time timestamp, status string, manual boolean, attempt_number int, "
        "destination_id string, matched_destination_ids array<string>",
    )
    tr = TimeRange(
        datetime(2024, 1, 1, tzinfo=timezone.utc), datetime(2024, 1, 2, tzinfo=timezone.utc)
    )
    exact = query_attempt_metrics(
        df, MetricsRequest(time_range=tr, measures=["count", "failed_count"])
    ).collect()[0]
    approx = query_attempt_metrics(
        df,
        MetricsRequest(
            time_range=tr, measures=["count", "failed_count"], approx_distinct=True
        ),
    ).collect()[0]
    assert exact["count"] == 2000
    assert abs(approx["count"] - 2000) <= 2000 * 0.05 * 3  # well within 3x rsd
    assert abs(approx["failed_count"] - exact["failed_count"]) <= exact["failed_count"] * 0.2

    def n_exchanges(req):
        plan = query_attempt_metrics(df, req)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    req_exact = MetricsRequest(time_range=tr, measures=["count"], granularity="1h")
    req_approx = MetricsRequest(
        time_range=tr, measures=["count"], granularity="1h", approx_distinct=True
    )
    assert n_exchanges(req_approx) < n_exchanges(req_exact)
    # assume_deduped wins when both are set (already exact AND one-pass)
    both = MetricsRequest(
        time_range=tr, measures=["count"], assume_deduped=True, approx_distinct=True
    )
    assert both.distinct_mode() == "deduped"
