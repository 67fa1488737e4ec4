"""Port of the reference's golden-dataset metrics assertions.

Expected totals are hand-derived in metrics_dataset.go:65-95 comments:
tenant-1 count=300, topics 100/100/100, destinations 150/150,
successful=180 / failed=120 / error_rate=0.4, codes 200:90 201:90 500:60
422:60, first_attempt=270, retry=0, manual=30, avg_attempt_number=1.0,
whole-range rate=300/2678400, dense-day hourly buckets 25/50/100/50/25.
"""

import pytest

from outpost_spark.fixtures import (
    DENSE_DAY_END,
    DENSE_DAY_START,
    DS_END,
    DS_START,
    TENANT_1,
    golden_dataframes,
)
from outpost_spark.logstore.metrics import (
    MetricsRequest,
    TimeRange,
    query_attempt_metrics,
    query_event_metrics,
)

FULL = TimeRange(DS_START, DS_END)
T1 = {"tenant_id": [TENANT_1]}


@pytest.fixture(scope="module")
def golden(spark):
    events, attempts = golden_dataframes(spark)
    events.cache().count()
    attempts.cache().count()
    return events, attempts


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_event_count_total(golden):
    events, _ = golden
    out = _rows(
        query_event_metrics(
            events, MetricsRequest(FULL, measures=["count"], filters=T1)
        )
    )
    assert out == [{"count": 300}]


def test_event_count_by_topic(golden):
    events, _ = golden
    out = _rows(
        query_event_metrics(
            events,
            MetricsRequest(FULL, measures=["count"], dimensions=["topic"], filters=T1),
        )
    )
    assert {r["topic"]: r["count"] for r in out} == {
        "user.created": 100,
        "user.deleted": 100,
        "user.updated": 100,
    }


def test_event_count_by_destination_explodes_matched_ids(golden):
    events, _ = golden
    out = _rows(
        query_event_metrics(
            events,
            MetricsRequest(
                FULL, measures=["count"], dimensions=["destination_id"], filters=T1
            ),
        )
    )
    assert {r["destination_id"]: r["count"] for r in out} == {
        "m_dest_1.1": 150,
        "m_dest_1.2": 150,
    }


def test_attempt_measures_whole_range(golden):
    _, attempts = golden
    req = MetricsRequest(
        FULL,
        measures=[
            "count",
            "successful_count",
            "failed_count",
            "error_rate",
            "first_attempt_count",
            "retry_count",
            "manual_retry_count",
            "avg_attempt_number",
        ],
        filters=T1,
    )
    (row,) = _rows(query_attempt_metrics(attempts, req))
    assert row["count"] == 300
    assert row["successful_count"] == 180
    assert row["failed_count"] == 120
    assert row["error_rate"] == pytest.approx(0.4)
    assert row["first_attempt_count"] == 270
    assert row["retry_count"] == 0
    assert row["manual_retry_count"] == 30
    assert row["avg_attempt_number"] == pytest.approx(1.0)


def test_attempt_count_by_code(golden):
    _, attempts = golden
    out = _rows(
        query_attempt_metrics(
            attempts,
            MetricsRequest(FULL, measures=["count"], dimensions=["code"], filters=T1),
        )
    )
    assert {r["code"]: r["count"] for r in out} == {"200": 90, "201": 90, "500": 60, "422": 60}


def test_attempt_rates_whole_range(golden):
    _, attempts = golden
    req = MetricsRequest(
        FULL, measures=["rate", "successful_rate", "failed_rate"], filters=T1
    )
    (row,) = _rows(query_attempt_metrics(attempts, req))
    month_secs = 31 * 86400
    assert row["rate"] == pytest.approx(300 / month_secs)
    assert row["successful_rate"] == pytest.approx(180 / month_secs)
    assert row["failed_rate"] == pytest.approx(120 / month_secs)
    assert "count" not in row  # enriched dep dropped when not requested


def test_dense_day_hourly_buckets_with_gap_fill(golden):
    _, attempts = golden
    req = MetricsRequest(
        TimeRange(DENSE_DAY_START, DENSE_DAY_END),
        measures=["count"],
        granularity="1h",
        filters=T1,
    )
    out = _rows(query_attempt_metrics(attempts, req))
    assert len(out) == 24  # gap-filled to every hour of the day
    by_hour = {(r["time_bucket"] % 86400) // 3600: r["count"] for r in out}
    assert by_hour[10] == 25
    assert by_hour[11] == 50
    assert by_hour[12] == 100
    assert by_hour[13] == 50
    assert by_hour[14] == 25
    assert all(by_hour[h] == 0 for h in range(24) if h not in (10, 11, 12, 13, 14))


def test_gap_fill_with_dimensions_only_observed_combos(golden):
    _, attempts = golden
    req = MetricsRequest(
        TimeRange(DENSE_DAY_START, DENSE_DAY_END),
        measures=["count"],
        granularity="1h",
        dimensions=["status"],
        filters=T1,
    )
    out = _rows(query_attempt_metrics(attempts, req))
    # two observed statuses x 24 slots
    assert len(out) == 48
    statuses = {r["status"] for r in out}
    assert statuses == {"success", "failed"}
    dense_total = sum(r["count"] for r in out)
    assert dense_total == 250


def test_tenant_isolation(golden):
    events, _ = golden
    out = _rows(
        query_event_metrics(
            events, MetricsRequest(FULL, measures=["count"], filters={"tenant_id": ["m_tenant_2"]})
        )
    )
    assert out == [{"count": 5}]


def test_daily_gap_fill_sparse(golden):
    events, _ = golden
    req = MetricsRequest(
        FULL, measures=["count"], granularity="1d", filters={"tenant_id": ["m_tenant_2"]}
    )
    out = _rows(query_event_metrics(events, req))
    assert len(out) == 31
    nonzero = {r["time_bucket"]: r["count"] for r in out if r["count"] > 0}
    assert len(nonzero) == 5
    assert sum(nonzero.values()) == 5


def test_invalid_requests(golden):
    events, _ = golden
    with pytest.raises(ValueError):
        query_event_metrics(events, MetricsRequest(TimeRange(DS_END, DS_START), measures=["count"]))
    with pytest.raises(ValueError):
        query_event_metrics(events, MetricsRequest(FULL, measures=["bogus"]))
    with pytest.raises(ValueError):
        query_event_metrics(events, MetricsRequest(FULL, measures=["count"], dimensions=["code"]))
