"""End-to-end Structured Streaming tests: file source -> routing ->
delivery-task stream; LogEntry stream -> foreachBatch log sink ->
queryable tables; transformWithStateInPandas alert stream."""

import json
import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from outpost_spark.logstore.metrics import MetricsRequest, TimeRange, query_attempt_metrics
from outpost_spark.streaming.pipeline import route_stream, write_log_stream

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.StringType()),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_route_stream_file_source_to_tasks(spark, tmpdir):
    src = os.path.join(tmpdir, "in")
    os.makedirs(src)
    rows = [
        {"event_id": "e1", "tenant_id": "t1", "topic": "order.created",
         "event_time": "2024-01-01T00:00:00.000Z", "metadata": {}, "data": json.dumps({"type": "premium"})},
        {"event_id": "e2", "tenant_id": "t1", "topic": "other.topic",
         "event_time": "2024-01-01T00:00:01.000Z", "metadata": {}, "data": "{}"},
    ]
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    dests = spark.createDataFrame(
        [
            ("d_orders", "t1", "webhook", ["order.*"], None, None),
            ("d_premium", "t1", "webhook", ["*"], json.dumps({"data": {"type": "premium"}}), None),
        ],
        "id string, tenant_id string, type string, topics array<string>, filter string, disabled_at timestamp",
    )

    stream = (
        spark.readStream.schema(EV_SCHEMA).json(src)
    )
    tasks = route_stream(stream, dests)
    q = (
        tasks.writeStream.format("memory")
        .queryName("route_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_id"], r["destination_id"], r["attempt"])
            for r in spark.sql("SELECT * FROM route_out").collect()
        }
    finally:
        q.stop()
    assert got == {("e1", "d_orders", 1), ("e1", "d_premium", 1)}


def test_log_sink_foreachbatch_to_queryable_tables(spark, tmpdir):
    src = os.path.join(tmpdir, "entries")
    os.makedirs(src)
    base = datetime(2024, 1, 15, 12, tzinfo=timezone.utc)
    entries = []
    for i in range(10):
        entries.append(
            {
                "attempt_id": f"a{i}",
                "event_id": f"e{i % 5}",  # 5 events, 2 attempts each
                "tenant_id": "t1",
                "destination_id": "d1",
                "destination_type": "webhook",
                "topic": "user.created",
                "eligible_for_retry": True,
                "event_time": base.isoformat(),
                "metadata": {},
                "data": "{}",
                "status": "success" if i % 2 == 0 else "failed",
                "attempt_time": base.isoformat(),
                "code": "200",
                "response_data": "{}",
                "manual": False,
                "attempt_number": 1 if i < 5 else 2,
            }
        )
    entries.append(dict(entries[0]))  # replay duplicate attempt
    with open(os.path.join(src, "b.json"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")

    from outpost_spark.schemas import ATTEMPT_SCHEMA

    stream = spark.readStream.schema(ATTEMPT_SCHEMA).json(src)
    ev_path = os.path.join(tmpdir, "events_tbl")
    at_path = os.path.join(tmpdir, "attempts_tbl")
    q = write_log_stream(stream, ev_path, at_path, os.path.join(tmpdir, "ckpt2"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    events = spark.read.parquet(ev_path)
    attempts = spark.read.parquet(at_path)
    assert events.count() == 5  # one per event, dupes collapsed
    assert attempts.count() == 10  # replayed attempt deduped in-batch

    # the written tables answer metrics queries (whole pipeline round-trip)
    out = query_attempt_metrics(
        attempts,
        MetricsRequest(
            TimeRange(datetime(2024, 1, 1, tzinfo=timezone.utc), datetime(2024, 2, 1, tzinfo=timezone.utc)),
            measures=["count", "failed_count", "retry_count"],
        ),
    ).collect()
    assert out[0]["count"] == 10
    assert out[0]["failed_count"] == 5
    assert out[0]["retry_count"] == 5
    # month partition directory exists (partition pruning at scale)
    assert any(p.startswith("month=202401") for p in os.listdir(at_path) if not p.startswith("_"))


ATTEMPT_STREAM_SCHEMA = (
    "tenant_id string, destination_id string, attempt_id string, "
    "status string, attempt_number int, eligible_for_retry boolean, event_id string"
)


def _write_attempt_batch(src, rows, name):
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_alert_stream_stateful(spark, tmpdir):
    from outpost_spark.streaming.alerts import AlertStateMachine, attach_alert_stream

    src = os.path.join(tmpdir, "attempts_in")
    os.makedirs(src)
    rows = [
        {"tenant_id": "t1", "destination_id": "d1", "attempt_id": f"a{i}",
         "status": "failed", "attempt_number": 1, "eligible_for_retry": True,
         "event_id": f"e{i}"}
        for i in range(4)
    ]
    _write_attempt_batch(src, rows, "b1.json")
    stream = spark.readStream.schema(ATTEMPT_STREAM_SCHEMA).json(src)
    machine = AlertStateMachine(auto_disable_failure_count=4, thresholds=[50, 100])
    alerts = attach_alert_stream(stream, machine)
    q = (
        alerts.writeStream.format("memory")
        .queryName("alerts_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: success resets, then more failures re-alert at 50%
        rows2 = [
            {"tenant_id": "t1", "destination_id": "d1", "attempt_id": "b0",
             "status": "success", "attempt_number": 1, "eligible_for_retry": True,
             "event_id": "e9"},
        ] + [
            {"tenant_id": "t1", "destination_id": "d1", "attempt_id": f"b{i}",
             "status": "failed", "attempt_number": 1, "eligible_for_retry": True,
             "event_id": f"e1{i}"}
            for i in range(1, 3)
        ]
        _write_attempt_batch(src, rows2, "b2.json")
        q.processAllAvailable()
        got = spark.sql(
            "SELECT signal, failures, level, attempt_id FROM alerts_out ORDER BY attempt_id"
        ).collect()
    finally:
        q.stop()
    assert [(r["signal"], r["failures"], r["level"]) for r in got] == [
        ("alert.destination.consecutive_failure", 2, 50),   # a1 crosses 50%
        ("alert.destination.disabled", 4, 100),             # a3 crosses 100%
        ("alert.destination.consecutive_failure", 2, 50),   # b2: reset then 2 fails
    ]


@pytest.mark.slow
def test_retry_stream_timer_fires(spark, tmpdir):
    # NOTE: once a processing-time timeout is registered, the query keeps
    # triggering "cleaning up state" micro-batches until it fires, so
    # processAllAvailable() would block — poll the memory sink instead.
    import time

    from outpost_spark.functions.backoff import ExponentialBackoff
    from outpost_spark.streaming.retry import attach_retry_stream

    src = os.path.join(tmpdir, "retry_in")
    os.makedirs(src)
    _write_attempt_batch(
        src,
        [
            {"tenant_id": "t1", "destination_id": "d1", "attempt_id": "a1",
             "status": "failed", "attempt_number": 1, "eligible_for_retry": True,
             "event_id": "e1"},
            {"tenant_id": "t1", "destination_id": "d2", "attempt_id": "a2",
             "status": "failed", "attempt_number": 1, "eligible_for_retry": True,
             "event_id": "e1"},
        ],
        "b1.json",
    )
    # cancel d2's pending retry with a success well before the 8s timer
    _write_attempt_batch(
        src,
        [{"tenant_id": "t1", "destination_id": "d2", "attempt_id": "a3",
          "status": "success", "attempt_number": 2, "eligible_for_retry": True,
          "event_id": "e1"}],
        "b2.json",
    )
    stream = spark.readStream.schema(ATTEMPT_STREAM_SCHEMA).json(src)
    tasks = attach_retry_stream(stream, ExponentialBackoff(interval=8.0), retry_max_limit=5)
    q = (
        tasks.writeStream.format("memory")
        .queryName("retry_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt4"))
        .start()
    )
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql(
                "SELECT event_id, destination_id, attempt_number FROM retry_out"
            ).collect()
            if got:
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1.0)
        # give a canceled d2 timer a chance to (wrongly) fire too
        time.sleep(3.0)
        got = spark.sql(
            "SELECT event_id, destination_id, attempt_number FROM retry_out"
        ).collect()
    finally:
        q.stop()
    fired = {(r["event_id"], r["destination_id"], r["attempt_number"]) for r in got}
    assert ("e1", "d1", 2) in fired      # failed -> retry attempt 2 fired
    assert not any(d == "d2" for _, d, _n in fired)  # canceled by success


def test_routing_sink_recompiles_per_batch_and_stays_python_free(spark, tmpdir):
    """make_routing_sink: per-batch filter compilation — a filter doc EDITED
    between micro-batches takes effect with no restart, and the per-batch
    routing plan contains no Python evaluation node when every doc
    compiles (the zero-Python streaming default, matching MatchEvent's
    native per-event evaluation)."""
    from outpost_spark.streaming.pipeline import make_routing_sink

    src = os.path.join(tmpdir, "in")
    os.makedirs(src)
    dest_state = {"filter": json.dumps({"data": {"type": "premium"}})}

    def load_destinations(s):
        return s.createDataFrame(
            [("d1", "t1", "webhook", ["*"], dest_state["filter"], None)],
            "id string, tenant_id string, type string, topics array<string>, "
            "filter string, disabled_at timestamp",
        )

    routed_ids: list = []
    plans: list = []

    def process(routed, batch_id):
        plans.append(routed._jdf.queryExecution().executedPlan().toString())
        routed_ids.extend(
            (r["event_id"], r["destination_id"]) for r in routed.collect()
        )

    sink = make_routing_sink(load_destinations, process)

    def run_batch(rows, fname):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema(EV_SCHEMA).json(src)
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmpdir, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    ev = {"tenant_id": "t1", "topic": "x.y", "event_time": "2024-01-01T00:00:00.000Z",
          "metadata": {}}
    run_batch([{**ev, "event_id": "b1", "data": json.dumps({"type": "premium"})},
               {**ev, "event_id": "b2", "data": json.dumps({"type": "basic"})}], "b1.json")
    assert routed_ids == [("b1", "d1")]

    # edit the filter between batches: the next batch compiles the NEW doc
    dest_state["filter"] = json.dumps({"data": {"type": "basic"}})
    run_batch([{**ev, "event_id": "b3", "data": json.dumps({"type": "premium"})},
               {**ev, "event_id": "b4", "data": json.dumps({"type": "basic"})}], "b2.json")
    assert routed_ids == [("b1", "d1"), ("b4", "d1")]

    for plan in plans:
        for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
            assert marker not in plan, f"Python node {marker} in per-batch routing plan"


def test_windowed_attempt_counts_watermark_and_late_data(spark, tmpdir):
    """Event-time windowed pre-aggregation: out-of-order rows inside the
    watermark aggregate correctly; a window's row is emitted (append mode)
    once the watermark passes its end; rows later than the watermark are
    dropped — the documented late-data contract."""
    from outpost_spark.streaming.pipeline import windowed_attempt_counts

    src = os.path.join(tmpdir, "in")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("attempt_id", T.StringType()),
            T.StructField("attempt_time", T.TimestampType()),
            T.StructField("status", T.StringType()),
        ]
    )

    def write_batch(rows, fname):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(schema).json(src)
    agg = windowed_attempt_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )

    def snapshot():
        return {
            (r["bucket_start"].isoformat(), r["rows"], r["failed_rows"])
            for r in spark.sql("SELECT * FROM win_out").collect()
        }

    try:
        # batch 1: two rows in 00:00 window (one out of order), one in 00:01
        write_batch(
            [
                {"attempt_id": "a2", "attempt_time": "2024-01-01T00:00:40.000Z", "status": "success"},
                {"attempt_id": "a1", "attempt_time": "2024-01-01T00:00:10.000Z", "status": "failed"},
                {"attempt_id": "a3", "attempt_time": "2024-01-01T00:01:10.000Z", "status": "success"},
            ],
            "b1.json",
        )
        q.processAllAvailable()
        # watermark after batch 1 = 00:01:10 - 2min < 00:01 -> nothing final yet
        assert snapshot() == set()

        # batch 2: advance event time far enough to close the first two
        # windows (watermark becomes 00:05 - 2min = 00:03 at batch end)
        write_batch(
            [{"attempt_id": "a4", "attempt_time": "2024-01-01T00:05:00.000Z", "status": "success"}],
            "b2.json",
        )
        q.processAllAvailable()
        # batch 3: a row for the 00:00 window arriving AFTER the watermark
        # passed it — must be dropped, not re-opened
        write_batch(
            [
                {"attempt_id": "late", "attempt_time": "2024-01-01T00:00:50.000Z", "status": "failed"},
                {"attempt_id": "a5", "attempt_time": "2024-01-01T00:05:01.000Z", "status": "success"},
            ],
            "b3.json",
        )
        q.processAllAvailable()
        got = snapshot()
    finally:
        q.stop()

    # both early windows emitted exactly once, late row NOT counted
    assert ("2024-01-01T00:00:00", 2, 1) in got
    assert ("2024-01-01T00:01:00", 1, 0) in got
    # the 00:05 window stays open (watermark hasn't passed its end)
    assert not any(b.startswith("2024-01-01T00:05") for b, _, _ in got)


def test_full_pipeline_publish_route_log_metrics(spark, tmpdir):
    """Capstone integration: published events stream in -> routing fan-out
    (zero-Python per-batch compile) -> LogEntry rows -> idempotent log sink
    -> the batch metrics engine answers over the resulting tables.  This is
    the reference's publish->fanout->deliver->log lifecycle end to end on
    one SparkSession."""
    from datetime import datetime, timezone

    from outpost_spark.logstore.metrics import (
        MetricsRequest,
        TimeRange,
        query_attempt_metrics,
    )
    from outpost_spark.streaming.pipeline import make_routing_sink, make_log_sink

    src = os.path.join(tmpdir, "in")
    events_path = os.path.join(tmpdir, "events_t")
    attempts_path = os.path.join(tmpdir, "attempts_t")
    os.makedirs(src)

    def load_destinations(s):
        return s.createDataFrame(
            [
                ("d_orders", "t1", "webhook", ["order.*"], None, None),
                ("d_premium", "t1", "webhook", ["*"],
                 json.dumps({"data": {"tier": "premium"}}), None),
            ],
            "id string, tenant_id string, type string, topics array<string>, "
            "filter string, disabled_at timestamp",
        )

    log_sink = make_log_sink(
        events_path, attempts_path, os.path.join(tmpdir, "commits")
    )

    def deliver_and_log(routed, batch_id):
        entries = routed.select(
            F.concat(F.col("event_id"), F.lit(":"), F.col("destination_id")).alias("attempt_id"),
            "event_id",
            "tenant_id",
            "destination_id",
            "topic",
            F.lit(True).alias("eligible_for_retry"),
            F.col("event_time"),
            F.col("event_time").alias("attempt_time"),
            F.col("metadata"),
            F.col("data"),
            # simulate delivery: premium-filter destination always succeeds,
            # the orders destination fails for updated orders
            F.when(F.col("topic") == "order.updated", "failed")
            .otherwise("success")
            .alias("status"),
            F.lit(False).alias("manual"),
            F.col("attempt").alias("attempt_number"),
        )
        log_sink(entries, batch_id)

    rows = [
        {"event_id": "e1", "tenant_id": "t1", "topic": "order.created",
         "event_time": "2024-03-01T10:00:00.000Z", "metadata": {},
         "data": json.dumps({"tier": "premium"})},      # -> d_orders + d_premium
        {"event_id": "e2", "tenant_id": "t1", "topic": "order.updated",
         "event_time": "2024-03-01T11:00:00.000Z", "metadata": {},
         "data": json.dumps({"tier": "basic"})},        # -> d_orders (fails)
        {"event_id": "e3", "tenant_id": "t1", "topic": "user.created",
         "event_time": "2024-03-01T12:00:00.000Z", "metadata": {},
         "data": json.dumps({"tier": "premium"})},      # -> d_premium only
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(EV_SCHEMA).json(src)
    q = (
        stream.writeStream.foreachBatch(
            make_routing_sink(load_destinations, deliver_and_log)
        )
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    attempts = spark.read.parquet(attempts_path)
    got = {(r["event_id"], r["destination_id"], r["status"]) for r in attempts.collect()}
    assert got == {
        ("e1", "d_orders", "success"),
        ("e1", "d_premium", "success"),
        ("e2", "d_orders", "failed"),
        ("e3", "d_premium", "success"),
    }
    # events table: one row per event, matched ids materialized at write
    events_t = spark.read.parquet(events_path)
    assert events_t.count() == 3

    # the metrics engine answers over the freshly written table
    req = MetricsRequest(
        time_range=TimeRange(
            datetime(2024, 3, 1, tzinfo=timezone.utc),
            datetime(2024, 3, 2, tzinfo=timezone.utc),
        ),
        measures=["count", "failed_count", "error_rate"],
    )
    m = query_attempt_metrics(attempts, req).collect()[0]
    assert m["count"] == 4 and m["failed_count"] == 1
    assert abs(m["error_rate"] - 0.25) < 1e-9
