"""Exactly-once sink replay semantics (ST1/ST7) + metrics response shaping
(metrics_handlers.go:315-419)."""

import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from outpost_spark.logstore.metrics import (
    ROW_LIMIT,
    MetricsRequest,
    TimeRange,
    run_attempt_metrics,
)
from outpost_spark.streaming.pipeline import make_log_sink


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _entries(spark, n=6):
    base = datetime(2024, 1, 15, 12, tzinfo=timezone.utc)
    rows = [
        (f"a{i}", f"e{i}", "t1", "d1", "webhook", "user.created", True,
         base, {}, "{}", "success", base, "200", "{}", False, 1)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "attempt_id string, event_id string, tenant_id string, destination_id string, "
        "destination_type string, topic string, eligible_for_retry boolean, "
        "event_time timestamp, metadata map<string,string>, data string, "
        "status string, attempt_time timestamp, code string, response_data string, "
        "manual boolean, attempt_number int",
    )


def test_sink_replayed_batch_id_is_noop(spark, tmpdir):
    ev, at = os.path.join(tmpdir, "ev"), os.path.join(tmpdir, "at")
    sink = make_log_sink(ev, at, os.path.join(tmpdir, "commits"))
    batch = _entries(spark)
    sink(batch, 7)
    sink(batch, 7)  # crash-replay of the same micro-batch id
    assert spark.read.parquet(at).count() == 6
    assert spark.read.parquet(ev).count() == 6
    sink(batch.withColumn("attempt_id", F.concat(F.lit("x"), "attempt_id")), 8)
    assert spark.read.parquet(at).count() == 12  # new batch id appends


def test_metrics_response_shape_and_metadata(spark):
    df = _entries(spark, 10).withColumn(
        "status", F.when(F.col("attempt_id") < "a5", "failed").otherwise("success")
    )
    req = MetricsRequest(
        TimeRange(
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            datetime(2024, 2, 1, tzinfo=timezone.utc),
        ),
        measures=["count", "failed_count"],
        dimensions=["status"],
        granularity="1d",
    )
    resp = run_attempt_metrics(df, req)
    assert resp.granularity == "1d" and resp.row_limit == ROW_LIMIT
    assert not resp.truncated and resp.row_count == len(resp.data)
    assert resp.query_time_ms >= 0
    by_status = {
        p["dimensions"]["status"]: p["metrics"]
        for p in resp.data
        if p["metrics"]["count"] > 0
    }
    assert by_status["failed"]["count"] == 5
    assert by_status["failed"]["failed_count"] == 5
    assert by_status["success"]["failed_count"] == 0
    # every point carries a bucket (granularity set) and only requested keys
    assert all(set(p) == {"time_bucket", "dimensions", "metrics"} for p in resp.data)
