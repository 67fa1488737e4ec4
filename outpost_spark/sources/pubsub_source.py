"""GCP Pub/Sub publish-queue source (S2 breadth) — a PySpark Python
Data Source speaking the Pub/Sub REST protocol.

Reference: internal/mqs/queue.go:15-100 configures Pub/Sub through
gocloud.dev URLs (``gcppubsub://projects/<p>/subscriptions/<s>``); the
consumer contract is pull -> handle -> acknowledge, with redelivery
after the ack deadline for anything unacked (at-least-once).  This
module maps that loop onto Spark 4's Python Data Source API exactly
like :mod:`sqs_source` maps SQS: ``spark.readStream.format("pubsub")``.

Protocol: the subscriber speaks Pub/Sub's public REST surface —
``POST /v1/projects/<p>/subscriptions/<s>:pull`` (``returnImmediately``
+ ``maxMessages``) and ``:acknowledge`` (``ackIds``) — via stdlib
urllib, so the SAME code talks to the official emulator
(``PUBSUB_EMULATOR_HOST``-style ``endpoint`` option, no auth) and, with
a bearer token supplied by the ``token`` option or metadata service, to
the real service.  No google-cloud SDK dependency; the loop is a
handful of HTTP calls per batch, mirroring the reference's gocloud
subscription driver.

Semantics (same honest mapping as SQS):

- Pub/Sub offsets are not replayable; offsets here are synthetic batch
  indices.  ``read`` pulls WITHOUT acking; ``commit`` acks the batch's
  ackIds only after Spark has durably finished the batch.  A crash
  between read and commit leaves the messages subject to the
  subscription's ack deadline, after which Pub/Sub redelivers —
  at-least-once, with engine-level dedup (SET3) absorbing duplicates.
- ``readBetweenOffsets`` replays from the in-memory cache when alive;
  after a driver crash the batch replays empty and the data redelivers
  in a later batch via the ack deadline.
- Scale-out is competing pulls on one subscription (Pub/Sub's native
  model) — same story as SQS competing consumers, same measured-loop
  caveat (bench_scale.py::sqs_ingest_case).

Testing: an in-process fake Pub/Sub REST server (tests/
test_pubsub_source.py) implements pull/acknowledge with real ack
deadlines over plain HTTP — the reader cannot tell it from the
emulator.
"""

from __future__ import annotations

import base64
import json
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PUBSUB_SCHEMA = (
    "message_id string, body string, publish_time string, "
    "attributes map<string,string>"
)


def _post(endpoint: str, path: str, payload: dict, token: str | None = None) -> dict:
    req = urllib.request.Request(
        f"{endpoint.rstrip('/')}{path}",
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=30) as resp:
        body = resp.read()
    return json.loads(body) if body else {}


class PubSubStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.project = options["project"]
        self.subscription = options["subscription"]
        self.endpoint = options.get(
            "endpoint", "https://pubsub.googleapis.com"
        )
        self.token = options.get("token")
        self.batch_size = int(options.get("maxmessagesperbatch", 100))
        self._pending: dict[int, list[str]] = {}  # batch idx -> ackIds
        self._cache: dict[int, list[tuple]] = {}

    def _sub_path(self) -> str:
        return (
            f"/v1/projects/{self.project}/subscriptions/{self.subscription}"
        )

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        rows: list[tuple] = []
        ack_ids: list[str] = []
        while len(rows) < self.batch_size:
            resp = _post(
                self.endpoint,
                f"{self._sub_path()}:pull",
                {
                    "returnImmediately": True,
                    "maxMessages": min(1000, self.batch_size - len(rows)),
                },
                self.token,
            )
            received = resp.get("receivedMessages", [])
            if not received:
                break
            for rm in received:
                m = rm.get("message", {})
                data = base64.b64decode(m.get("data", "") or "").decode(
                    "utf-8", "replace"
                )
                rows.append(
                    (
                        m.get("messageId", ""),
                        data,
                        m.get("publishTime", ""),
                        dict(m.get("attributes") or {}),
                    )
                )
                ack_ids.append(rm["ackId"])
        idx = int(start["batch"])
        self._pending[idx] = ack_ids
        self._cache[idx] = rows
        return iter(rows), {"batch": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._cache.get(int(start["batch"]), []))

    def commit(self, end: dict):
        done = int(end["batch"])
        for idx in sorted(self._pending):
            if idx >= done:
                continue
            ack_ids = self._pending.pop(idx)
            self._cache.pop(idx, None)
            if ack_ids:
                _post(
                    self.endpoint,
                    f"{self._sub_path()}:acknowledge",
                    {"ackIds": ack_ids},
                    self.token,
                )


class PubSubDataSource(DataSource):
    """``spark.readStream.format("pubsub").option("project", ...)
    .option("subscription", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "pubsub"

    def schema(self) -> str:
        return PUBSUB_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> PubSubStreamReader:
        for key in ("project", "subscription"):
            if key not in self.options:
                raise ValueError(f"pubsub source requires option {key}")
        return PubSubStreamReader(self.options)


def register_pubsub_source(spark) -> None:
    """Idempotently register the format with a session."""
    try:
        spark.dataSource.register(PubSubDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise


def publish(
    endpoint: str,
    project: str,
    topic: str,
    messages: list[dict],
    token: str | None = None,
) -> int:
    """Test/ops helper: publish JSON bodies to a topic via REST."""
    payload = {
        "messages": [
            {
                "data": base64.b64encode(
                    json.dumps(m).encode("utf-8")
                ).decode("ascii")
            }
            for m in messages
        ]
    }
    _post(endpoint, f"/v1/projects/{project}/topics/{topic}:publish", payload, token)
    return len(messages)
