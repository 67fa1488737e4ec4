"""GCP Pub/Sub queue source (sources/pubsub_source.py): URL parsing,
the Python Data Source stream against an in-process fake Pub/Sub REST
server (same public pull/acknowledge surface the official emulator
serves, with REAL ack deadlines), and the ack-on-commit at-least-once
contract — the second cloud MQ backend behind the sqs_source pattern
(VERDICT r06 "Next round" #7)."""

import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from outpost_spark.sources.pubsub_source import (
    PubSubStreamReader,
    publish,
    register_pubsub_source,
)
from outpost_spark.sources.readers import parse_queue_url


class _FakePubSub:
    """Minimal Pub/Sub REST backend: one topic fanning out to its
    subscriptions; pull moves messages to an in-flight set that
    redelivers after ``ack_deadline`` seconds; acknowledge drops them."""

    def __init__(self, ack_deadline=3.0):
        self.lock = threading.Lock()
        self.ack_deadline = ack_deadline
        self.queues: dict[str, list] = {}  # sub -> [(id, data_b64, attrs)]
        self.inflight: dict[str, dict] = {}  # sub -> ackId -> (msg, deadline)
        self.topic_subs: dict[str, list[str]] = {}
        self.next_id = 0

    def create(self, topic, sub):
        with self.lock:
            self.topic_subs.setdefault(topic, []).append(sub)
            self.queues.setdefault(sub, [])
            self.inflight.setdefault(sub, {})

    def publish(self, topic, messages):
        ids = []
        with self.lock:
            for m in messages:
                self.next_id += 1
                mid = str(self.next_id)
                ids.append(mid)
                for sub in self.topic_subs.get(topic, []):
                    self.queues[sub].append(
                        (mid, m.get("data", ""), m.get("attributes") or {})
                    )
        return ids

    def pull(self, sub, max_messages):
        now = time.time()
        out = []
        with self.lock:
            # lazy redelivery: expired in-flight entries rejoin the queue
            expired = [
                a for a, (_m, dl) in self.inflight[sub].items() if dl <= now
            ]
            for a in expired:
                msg, _dl = self.inflight[sub].pop(a)
                self.queues[sub].append(msg)
            while self.queues[sub] and len(out) < max_messages:
                msg = self.queues[sub].pop(0)
                ack_id = f"ack-{msg[0]}-{now}"
                self.inflight[sub][ack_id] = (msg, now + self.ack_deadline)
                out.append(
                    {
                        "ackId": ack_id,
                        "message": {
                            "messageId": msg[0],
                            "data": msg[1],
                            "publishTime": "2024-01-02T03:04:05Z",
                            "attributes": msg[2],
                        },
                    }
                )
        return out

    def acknowledge(self, sub, ack_ids):
        with self.lock:
            for a in ack_ids:
                self.inflight[sub].pop(a, None)

    def counts(self, sub):
        with self.lock:
            return len(self.queues[sub]), len(self.inflight[sub])


def _make_server(backend: _FakePubSub):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            path = self.path
            resp: dict = {}
            if path.endswith(":publish"):
                topic = path.split("/topics/")[1].split(":")[0]
                resp = {"messageIds": backend.publish(topic, payload["messages"])}
            elif path.endswith(":pull"):
                sub = path.split("/subscriptions/")[1].split(":")[0]
                got = backend.pull(sub, int(payload.get("maxMessages", 10)))
                resp = {"receivedMessages": got} if got else {}
            elif path.endswith(":acknowledge"):
                sub = path.split("/subscriptions/")[1].split(":")[0]
                backend.acknowledge(sub, payload.get("ackIds", []))
            else:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture()
def pubsub():
    backend = _FakePubSub(ack_deadline=3.0)
    srv, endpoint = _make_server(backend)
    yield backend, endpoint
    srv.shutdown()


def test_parse_pubsub_urls():
    fmt, opts = parse_queue_url("gcppubsub://projects/myproj/subscriptions/mysub")
    assert fmt == "pubsub"
    assert opts == {"project": "myproj", "subscription": "mysub"}
    fmt, opts = parse_queue_url(
        "pubsub://projects/p/subscriptions/s?endpoint=http://localhost:8085"
        "&maxMessagesPerBatch=50"
    )
    assert fmt == "pubsub"
    assert opts["endpoint"] == "http://localhost:8085"
    assert opts["maxMessagesPerBatch"] == "50"
    with pytest.raises(ValueError, match="gcppubsub://projects"):
        parse_queue_url("gcppubsub://just-a-name")


def test_pubsub_stream_end_to_end_and_ack_on_commit(spark, pubsub, tmp_path):
    """25 PublishedEvent messages: publish over REST -> gcppubsub:// URL
    -> readStream -> decode/validate columns -> parquet sink; after the
    stream commits, the messages are ACKED (no redelivery even after
    the ack deadline passes)."""
    from outpost_spark.sources.readers import event_stream

    backend, endpoint = pubsub
    backend.create("events", "events-sub")
    events = [
        {
            "id": f"evt_{i}",
            "tenant_id": f"t{i % 3}",
            "topic": "user.created" if i % 2 == 0 else "user.deleted",
            "metadata": {"k": str(i)},
            "data": json.dumps({"n": i}),
        }
        for i in range(25)
    ]
    publish(endpoint, "p", "events", events)

    url = f"gcppubsub://projects/p/subscriptions/events-sub?endpoint={endpoint}"
    out = str(tmp_path / "out")
    q = (
        event_stream(spark, url)
        .writeStream.format("parquet")
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
        # ack-on-commit: nothing redelivers even past the ack deadline
        deadline = time.time() + 30
        while time.time() < deadline:
            if backend.counts("events-sub") == (0, 0):
                break
            time.sleep(1)
        assert backend.counts("events-sub") == (0, 0)
    finally:
        q.stop()


def test_pubsub_uncommitted_messages_redeliver(pubsub):
    """Pull without ack (crash between read and commit): after the ack
    deadline the backend redelivers the same messages — the
    at-least-once contract the reference's gocloud consumer relies on."""
    backend, endpoint = pubsub
    backend.create("t", "s")
    publish(endpoint, "p", "t", [{"n": 1}, {"n": 2}])

    r1 = PubSubStreamReader(
        {"project": "p", "subscription": "s", "endpoint": endpoint}
    )
    rows, nxt = r1.read(r1.initialOffset())
    first = [json.loads(r[1])["n"] for r in rows]
    assert sorted(first) == [1, 2]
    # no commit -> messages stay in-flight until the deadline
    assert backend.counts("s") == (0, 2)
    time.sleep(3.5)
    r2 = PubSubStreamReader(
        {"project": "p", "subscription": "s", "endpoint": endpoint}
    )
    rows2, nxt2 = r2.read(r2.initialOffset())
    again = [json.loads(r[1])["n"] for r in rows2]
    assert sorted(again) == [1, 2]
    r2.commit(nxt2)
    assert backend.counts("s") == (0, 0)


def test_pubsub_attributes_and_cache_replay(spark, pubsub):
    """Attributes surface as a map column; readBetweenOffsets replays a
    formed-but-uncommitted batch from the reader cache."""
    backend, endpoint = pubsub
    backend.create("t2", "s2")
    backend.publish(
        "t2",
        [
            {
                "data": base64.b64encode(b'{"x":1}').decode(),
                "attributes": {"source": "unit"},
            }
        ],
    )
    r = PubSubStreamReader(
        {"project": "p", "subscription": "s2", "endpoint": endpoint}
    )
    off = r.initialOffset()
    rows, nxt = r.read(off)
    rows = list(rows)
    assert rows[0][3] == {"source": "unit"}
    replay = list(r.readBetweenOffsets(off, nxt))
    assert replay == rows
    register_pubsub_source(spark)  # idempotent double-registration
    register_pubsub_source(spark)
