"""Delivery executors (routing/delivery.py): webhook HTTP POST and SQS
publish as mapInPandas stages whose outcomes are DATA — verified
against an in-process HTTP receiver that checks the HMAC signature
server-side, and a real moto-served SQS endpoint (executors run in
worker processes, so only a real endpoint can observe them).  Closes
the S6 executor gap for the providers whose I/O fits Spark's model
(reference: internal/destregistry/providers/destwebhook/destwebhook.go
publish path, destawssqs)."""

import hashlib
import hmac as hmac_mod
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from outpost_spark.routing.delivery import deliver_http, deliver_sqs

SECRET = "whsec_test_secret"
TS = "2024-01-02 03:04:05"


class _Receiver:
    def __init__(self):
        self.lock = threading.Lock()
        self.received: list[dict] = []

    def start(self):
        backend = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                sig = self.headers.get("x-outpost-signature", "")
                want = "v0=" + hmac_mod.new(
                    SECRET.encode(), body, hashlib.sha256
                ).hexdigest()
                with backend.lock:
                    backend.received.append(
                        {
                            "path": self.path,
                            "body": body.decode(),
                            "event_id": self.headers.get("x-outpost-event-id"),
                            "topic": self.headers.get("x-outpost-topic"),
                            "content_type": self.headers.get("Content-Type"),
                            "sig_ok": hmac_mod.compare_digest(sig, want),
                        }
                    )
                if self.path == "/hook":
                    if not hmac_mod.compare_digest(sig, want):
                        self.send_response(401)
                        payload = b'{"error": "bad signature"}'
                    else:
                        self.send_response(200)
                        payload = b'{"ok": true}'
                else:  # /broken
                    self.send_response(503)
                    payload = b'{"error": "backend down"}'
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self.srv.server_address[1]}"


@pytest.fixture()
def receiver():
    r = _Receiver()
    url = r.start()
    yield r, url
    r.srv.shutdown()


def _events(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("evt_"), F.col("id")).alias("event_id"),
        F.concat(F.lit("dest_"), F.col("id") % 2).alias("destination_id"),
        F.lit("user.created").alias("topic"),
        F.create_map(F.lit("k"), F.col("id").cast("string")).alias("metadata"),
        F.concat(F.lit('{"n": '), F.col("id").cast("string"), F.lit("}")).alias(
            "data"
        ),
    )


def test_deliver_http_signed_webhooks_end_to_end(spark, receiver):
    """format_webhook -> deliver_http: every request arrives with a
    VALID HMAC (verified by the receiving server, the real contract),
    system headers intact, and every attempt row reports success with
    the response body captured."""
    from outpost_spark.routing.sinkformats import format_webhook

    backend, url = receiver
    frame = format_webhook(
        _events(spark),
        url=f"{url}/hook",
        ts=F.to_timestamp(F.lit(TS)),
        secrets=[SECRET],
    )
    out = deliver_http(frame).collect()
    assert len(out) == 6
    assert all(r["status"] == "success" and r["response_code"] == 200 for r in out)
    assert all(json.loads(r["response_data"]) == {"ok": True} for r in out)
    assert len(backend.received) == 6
    assert all(r["sig_ok"] for r in backend.received)
    assert {r["event_id"] for r in backend.received} == {
        f"evt_{i}" for i in range(6)
    }
    assert all(r["content_type"] == "application/json" for r in backend.received)
    got = {r["event_id"]: json.loads(r["body"]) for r in backend.received}
    assert got["evt_3"] == {"n": 3}


def test_deliver_http_failures_are_data_not_exceptions(spark, receiver):
    """Non-2xx and transport failures come back as failed attempt rows
    (code + captured response / error), never job failures — the retry
    layer's input contract."""
    backend, url = receiver
    rows = [
        ("evt_ok", f"{url}/hook", "{}"),
        ("evt_503", f"{url}/broken", "{}"),
        ("evt_conn", "http://127.0.0.1:9/nothing", "{}"),  # refused
    ]
    df = spark.createDataFrame(rows, ["event_id", "url", "body"]).select(
        "event_id",
        "url",
        "body",
        F.create_map(
            F.lit("x-outpost-signature"),
            F.lit(
                "v0="
                + hmac_mod.new(SECRET.encode(), b"{}", hashlib.sha256).hexdigest()
            ),
        ).alias("headers"),
    )
    out = {r["event_id"]: r for r in deliver_http(df, timeout=3.0).collect()}
    assert out["evt_ok"]["status"] == "success"
    assert out["evt_503"]["status"] == "failed"
    assert out["evt_503"]["response_code"] == 503
    assert "backend down" in out["evt_503"]["response_data"]
    assert out["evt_conn"]["status"] == "failed"
    assert out["evt_conn"]["response_code"] == 0
    assert out["evt_conn"]["response_data"]  # the transport error text


def test_deliver_http_bad_signature_rejected_by_consumer(spark, receiver):
    """The consumer-side guarantee the HMAC exists for: a frame signed
    with the WRONG secret is rejected (401) and surfaces as a failed
    attempt."""
    from outpost_spark.routing.sinkformats import format_webhook

    backend, url = receiver
    frame = format_webhook(
        _events(spark, 2),
        url=f"{url}/hook",
        ts=F.to_timestamp(F.lit(TS)),
        secrets=["wrong_secret"],
    )
    out = deliver_http(frame).collect()
    assert all(r["status"] == "failed" and r["response_code"] == 401 for r in out)
    assert all(not r["sig_ok"] for r in backend.received)


@pytest.fixture(scope="module")
def moto_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server._server.server_address[:2]
    yield f"http://{host}:{port}"
    server.stop()


def test_deliver_sqs_publishes_with_attributes(spark, moto_endpoint, monkeypatch):
    """format_sqs -> deliver_sqs against a real moto endpoint: messages
    land with the metadata attribute, attempt rows carry the SQS
    message ids."""
    import boto3

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    from outpost_spark.routing.sinkformats import format_sqs

    client = boto3.client("sqs", endpoint_url=moto_endpoint, region_name="us-east-1")
    qurl = client.create_queue(QueueName="deliver-q")["QueueUrl"]

    frame = format_sqs(
        _events(spark, 25), queue_url=qurl, ts=F.to_timestamp(F.lit(TS))
    )
    creds = {"aws_access_key_id": "test", "aws_secret_access_key": "test"}
    out = deliver_sqs(
        frame, queue_url=qurl, endpoint_url=moto_endpoint, region="us-east-1",
        client_kwargs=creds,
    ).collect()
    assert len(out) == 25
    assert all(r["status"] == "success" and r["response_code"] == 200 for r in out)
    assert all(r["response_data"] for r in out)  # message ids

    got = []
    while True:
        resp = client.receive_message(
            QueueUrl=qurl, MaxNumberOfMessages=10, MessageAttributeNames=["All"]
        )
        msgs = resp.get("Messages", [])
        if not msgs:
            break
        got.extend(msgs)
        for m in msgs:
            client.delete_message(QueueUrl=qurl, ReceiptHandle=m["ReceiptHandle"])
    assert len(got) == 25
    sample = got[0]
    meta = json.loads(
        sample["MessageAttributes"]["metadata"]["StringValue"]
    )
    assert meta["topic"] == "user.created"
    assert json.loads(sample["Body"]).keys() == {"n"}


def test_deliver_sqs_transport_failure_is_data(spark):
    """A dead endpoint yields failed rows with the transport error, not
    a raised task."""
    from outpost_spark.routing.sinkformats import format_sqs

    frame = format_sqs(
        _events(spark, 3),
        queue_url="http://127.0.0.1:9/q",
        ts=F.to_timestamp(F.lit(TS)),
    )
    out = deliver_sqs(
        frame,
        queue_url="http://127.0.0.1:9/q",
        endpoint_url="http://127.0.0.1:9",
        region="us-east-1",
        client_kwargs={"aws_access_key_id": "test", "aws_secret_access_key": "test"},
    ).collect()
    assert len(out) == 3
    assert all(r["status"] == "failed" and r["response_code"] == 0 for r in out)
    assert all(r["response_data"] for r in out)
