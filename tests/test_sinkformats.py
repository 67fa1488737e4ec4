"""Tests: provider record formatting (S6 Format surface).

Expectations mirror the reference providers' *_format_test.go cases
(destawskinesis / destawssqs / destawss3 / destgcppubsub /
destazureservicebus / destrabbitmq / destkafka) — the publish/network
half is out of scope by BASELINE.json."""

import base64
import hashlib
import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from outpost_spark.routing.sinkformats import (
    format_azure_servicebus,
    format_kafka,
    format_kinesis,
    format_pubsub,
    format_rabbitmq,
    format_s3,
    format_sqs,
    metadata_expr,
    rfc3339_nano_expr,
)

TS = datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


@pytest.fixture()
def routed(spark):
    rows = [
        (
            "event-123",
            "test-topic",
            {"custom_field": "custom_value"},
            '{"message":"Hello World","user":{"id":"user-456"},"count":123,"active":true}',
            datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=timezone.utc),
        ),
        ("event-456", "other.topic", None, '{"n":1}', TS),
    ]
    return spark.createDataFrame(
        rows,
        "event_id string, topic string, metadata map<string,string>,"
        " data string, event_time timestamp",
    )


def _row(df, event_id="event-123"):
    return [r for r in df.collect() if r["event_id"] == event_id][0]


def test_metadata_merge_priority_and_sorted_json(spark, routed):
    """system < delivery < event metadata; output map key-sorted so
    to_json is byte-compatible with Go's sorted json.Marshal."""
    meta = metadata_expr(
        F.col("event_id"), F.col("topic"), F.col("metadata"), F.lit(TS),
        delivery_metadata={"topic": "delivery-override", "dkey": "dval"},
    )
    out = _row(routed.select("event_id", meta.alias("m"), F.to_json(meta).alias("j")))
    m = dict(out["m"])
    assert m["event-id"] == "event-123"
    assert m["timestamp"] == "2024-01-02T03:04:05Z"
    assert m["topic"] == "delivery-override"  # delivery beats system
    assert m["custom_field"] == "custom_value"
    assert out["j"] == json.dumps(
        {k: m[k] for k in sorted(m)}, separators=(",", ":")
    )
    # event metadata beats delivery metadata
    ev_meta = metadata_expr(
        F.col("event_id"), F.col("topic"),
        F.create_map(F.lit("topic"), F.lit("event-wins")), F.lit(TS),
        delivery_metadata={"topic": "delivery"},
    )
    assert dict(_row(routed.select("event_id", ev_meta.alias("m")))["m"])["topic"] == "event-wins"


def test_rfc3339_nano_strips_trailing_zeros(spark):
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)),
            (2, datetime(2024, 1, 2, 3, 4, 5, 120000, tzinfo=timezone.utc)),
            (3, datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=timezone.utc)),
        ],
        "i int, ts timestamp",
    )
    got = {r["i"]: r["s"] for r in df.select("i", rfc3339_nano_expr(F.col("ts")).alias("s")).collect()}
    assert got[1] == "2024-01-02T03:04:05Z"        # whole second: no fraction
    assert got[2] == "2024-01-02T03:04:05.12Z"     # trailing zeros stripped
    assert got[3] == "2024-01-02T03:04:05.123456Z"


def test_kinesis_format_cases(spark, routed):
    """destawskinesis_format_test.go cases: raw vs envelope payload and
    the partition-key template matrix (metadata path, nested data path,
    numeric/boolean stringification, fallback)."""
    raw = format_kinesis(routed, stream_name="test-stream", ts=F.lit(TS))
    r = _row(raw)
    assert r["stream_name"] == "test-stream"
    assert r["data"].startswith('{"message":"Hello World"')  # raw passthrough
    assert r["partition_key"] == "event-123"  # no template -> event id

    env = format_kinesis(
        routed, stream_name="s", ts=F.lit(TS), metadata_in_payload=True
    )
    payload = json.loads(_row(env)["data"])
    assert payload["data"]["message"] == "Hello World"
    assert payload["metadata"]["event-id"] == "event-123"
    assert payload["metadata"]["custom_field"] == "custom_value"
    assert _row(env)["data"].startswith('{"data":')  # Go-sorted envelope keys

    for tpl, want in [
        ("metadata.topic", "test-topic"),
        ("data.user.id", "user-456"),
        ("data.count", "123"),
        ("data.active", "true"),
        ("data.missing", "event-123"),  # fallback
        ("join('-', [metadata.topic, to_string(data.count)])", "test-topic-123"),
    ]:
        got = _row(
            format_kinesis(
                routed, stream_name="s", ts=F.lit(TS), partition_key_template=tpl
            )
        )["partition_key"]
        assert got == want, (tpl, got)


def test_sqs_format(spark, routed):
    out = _row(format_sqs(routed, queue_url="https://q", ts=F.lit(TS)))
    assert out["queue_url"] == "https://q"
    assert out["message_body"].startswith('{"message"')
    meta = json.loads(out["message_attributes"]["metadata"])
    assert meta["event-id"] == "event-123" and meta["topic"] == "test-topic"


def test_s3_format_default_template_and_checksum(spark, routed):
    out = _row(format_s3(routed, bucket="my-bucket", ts=F.lit(TS)))
    # key uses EVENT time (with Go nano-stripping), not the publish ts
    assert out["key"] == "2024-01-02T03:04:05.123456Z_event-123.json"
    assert out["bucket"] == "my-bucket"
    assert out["content_type"] == "application/json"
    assert out["storage_class"] == "STANDARD"
    body = out["body"].encode()
    assert out["checksum_sha256"] == base64.b64encode(hashlib.sha256(body).digest()).decode()
    assert dict(out["metadata"])["custom_field"] == "custom_value"
    with pytest.raises(ValueError, match="storage class"):
        format_s3(routed, bucket="b", ts=F.lit(TS), storage_class="BOGUS")


def test_s3_format_custom_template_time_fields(spark, routed):
    out = _row(
        format_s3(
            routed, bucket="b", ts=F.lit(TS),
            key_template="join('/', [time.year, time.month, time.day, metadata.\"event-id\"])",
        )
    )
    assert out["key"] == "2024/01/02/event-123"


def test_pubsub_azure_rabbit_shapes(spark, routed):
    p = _row(format_pubsub(routed, ts=F.lit(TS)))
    assert p["data"].startswith('{"message"')
    assert dict(p["attributes"])["topic"] == "test-topic"

    a = _row(format_azure_servicebus(routed, ts=F.lit(TS)))
    assert a["body"] == p["data"]
    assert dict(a["application_properties"])["event-id"] == "event-123"

    r = _row(format_rabbitmq(routed, exchange="ex", ts=F.lit(TS)))
    assert r["exchange"] == "ex" and r["routing_key"] == "test-topic"
    assert r["content_type"] == "application/json"
    assert dict(r["headers"])["event-id"] == "event-123"


def test_kafka_format_headers_and_key(spark, routed):
    out = _row(
        format_kafka(
            routed, topic="events", ts=F.lit(TS),
            partition_key_template="metadata.topic",
        )
    )
    assert out["topic"] == "events" and out["key"] == "test-topic"
    headers = {h["key"]: bytes(h["value"]).decode() for h in out["headers"]}
    assert headers["content-type"] == "application/json"
    assert headers["event-id"] == "event-123"
    assert out["value"].startswith('{"message"')


def test_default_formats_are_zero_python(spark, routed):
    """With empty templates every formatter must stay whole-stage-codegen
    — no Python evaluation nodes in the plan."""
    for fmt in (
        format_kinesis(routed, stream_name="s", ts=F.lit(TS)),
        format_sqs(routed, queue_url="q", ts=F.lit(TS)),
        format_s3(routed, bucket="b", ts=F.lit(TS)),
        format_pubsub(routed, ts=F.lit(TS)),
        format_azure_servicebus(routed, ts=F.lit(TS)),
        format_rabbitmq(routed, exchange="e", ts=F.lit(TS)),
        format_kafka(routed, topic="t", ts=F.lit(TS)),
    ):
        plan = fmt._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
            assert marker not in plan, f"Python node in default format plan:\n{plan}"
