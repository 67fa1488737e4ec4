"""Azure Service Bus publish-queue source (S2 breadth) — a PySpark
Python Data Source speaking Service Bus's public REST surface.

Reference: internal/mqs/queue_azureservicebus.go consumes Service Bus
through gocloud/azservicebus with peek-lock receive -> handle ->
complete, redelivery on lock expiry (at-least-once).  This module maps
that loop onto Spark 4's Python Data Source API exactly like
:mod:`sqs_source` / :mod:`pubsub_source`: ``readStream.format("azuresb")``.

Protocol: the documented HTTP runtime operations —

- ``POST {endpoint}/{queue}/messages/head?timeout=N``   peek-lock
  receive: 201 + body, broker metadata (MessageId, LockToken,
  SequenceNumber, EnqueuedTimeUtc) in the ``BrokerProperties`` response
  header; 204 = queue empty,
- ``DELETE {endpoint}/{queue}/messages/{messageId}/{lockToken}``
  complete (destructive ack),
- ``POST {endpoint}/{queue}/messages``                  send,

via stdlib urllib — no Azure SDK dependency.  SAS auth rides the
``sasToken`` option as the ``Authorization`` header when talking to the
real service; the in-tree fake (tests/test_azuresb_source.py) serves
the same surface with REAL lock durations, so the reader cannot tell
it from the service.

Semantics (same honest mapping as the SQS/PubSub sources): synthetic
batch-index offsets; ``read`` peek-locks WITHOUT completing;
``commit`` completes the batch's (messageId, lockToken) pairs only
after Spark durably finished the batch.  A crash between read and
commit leaves the messages locked until the lock duration expires,
after which Service Bus redelivers — at-least-once, absorbed by
engine-level dedup (SET3).  Scale-out = competing receivers on one
queue (Service Bus's native model).

Caveat vs the other two backends: the REST head operation returns ONE
message per call (the protocol has no batch receive), so the
per-consumer ceiling is one HTTP round-trip per message — competing
consumers matter even more here; the AMQP SDKs prefetch for the same
reason.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

AZURESB_SCHEMA = (
    "message_id string, body string, sequence_number long, "
    "enqueued_time string"
)


class AzureSbStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.queue = options["queue"]
        namespace = options.get("namespace")
        self.endpoint = options.get(
            "endpoint",
            f"https://{namespace}.servicebus.windows.net" if namespace else None,
        )
        if not self.endpoint:
            raise ValueError("azuresb source requires option endpoint or namespace")
        self.sas = options.get("sastoken")
        self.batch_size = int(options.get("maxmessagesperbatch", 100))
        self._pending: dict[int, list[tuple[str, str]]] = {}
        self._cache: dict[int, list[tuple]] = {}

    def _request(self, method: str, path: str):
        req = urllib.request.Request(
            f"{self.endpoint.rstrip('/')}{path}", method=method
        )
        if self.sas:
            req.add_header("Authorization", self.sas)
        try:
            resp = urllib.request.urlopen(req, timeout=30)
        except urllib.error.HTTPError as e:
            if e.code == 204:
                return None, {}
            if method == "DELETE" and e.code in (404, 410):
                # lock expired before the commit reached the service: the
                # message has already re-entered the queue and will be
                # re-processed — exactly the at-least-once contract, so a
                # lost-lock complete is best-effort, never fatal (killing
                # the query here would wedge the whole stream on one slow
                # batch)
                return None, {}
            raise
        with resp:
            if resp.status == 204:
                return None, {}
            return resp.read(), dict(resp.headers)

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        rows: list[tuple] = []
        locks: list[tuple[str, str]] = []
        while len(rows) < self.batch_size:
            body, headers = self._request(
                "POST", f"/{self.queue}/messages/head?timeout=0"
            )
            if body is None:
                break
            props = json.loads(headers.get("BrokerProperties", "{}"))
            mid = props.get("MessageId", "")
            rows.append(
                (
                    mid,
                    body.decode("utf-8", "replace"),
                    int(props.get("SequenceNumber", 0)),
                    props.get("EnqueuedTimeUtc", ""),
                )
            )
            locks.append((mid, props.get("LockToken", "")))
        idx = int(start["batch"])
        self._pending[idx] = locks
        self._cache[idx] = rows
        return iter(rows), {"batch": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._cache.get(int(start["batch"]), []))

    def _complete_best_effort(self, mid: str, token: str) -> None:
        """Complete (unlock-delete) one message, best-effort.

        Under at-least-once semantics a FAILED complete is already
        covered: the peek-lock expires and the broker redelivers, so a
        transient failure (5xx, throttle, timeout) must not raise out of
        ``commit`` and kill the streaming query — that would wedge the
        whole stream on one flaky complete while buying nothing
        (ADVICE r07).  One bounded retry for the common blip, then log
        and move on; 404/410 (lock already expired) is handled inside
        ``_request``."""
        for attempt in (0, 1):
            try:
                self._request(
                    "DELETE", f"/{self.queue}/messages/{mid}/{token}"
                )
                return
            except Exception as e:  # noqa: BLE001 — redelivery covers it
                if attempt == 1:
                    import logging

                    logging.getLogger(__name__).warning(
                        "azuresb: complete failed for message %s "
                        "(will redeliver on lock expiry): %s",
                        mid,
                        e,
                    )

    def commit(self, end: dict):
        done = int(end["batch"])
        for idx in sorted(self._pending):
            if idx >= done:
                continue
            locks = self._pending.pop(idx)
            self._cache.pop(idx, None)
            for mid, token in locks:
                self._complete_best_effort(mid, token)


class AzureSbDataSource(DataSource):
    """``spark.readStream.format("azuresb").option("queue", ...)
    .option("endpoint"|"namespace", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "azuresb"

    def schema(self) -> str:
        return AZURESB_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> AzureSbStreamReader:
        if "queue" not in self.options:
            raise ValueError("azuresb source requires option queue")
        return AzureSbStreamReader(self.options)


def register_azuresb_source(spark) -> None:
    """Idempotently register the format with a session."""
    try:
        spark.dataSource.register(AzureSbDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise


def send_messages(
    endpoint: str, queue: str, messages: list[dict], sas: str | None = None
) -> int:
    """Test/ops helper: POST JSON bodies to a queue."""
    for m in messages:
        req = urllib.request.Request(
            f"{endpoint.rstrip('/')}/{queue}/messages",
            data=json.dumps(m).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        if sas:
            req.add_header("Authorization", sas)
        urllib.request.urlopen(req, timeout=30).close()
    return len(messages)
