"""SQS publish-queue source (S2 breadth) — a PySpark Python Data Source.

Reference: internal/mqs/queue.go:15-100 configures SQS through
gocloud.dev-style URLs (``sqs://queue?region=...``); the reference's
consumer loop is receive -> handle -> delete with redelivery after the
visibility timeout (at-least-once).  Spark 4's Python Data Source API
lets that loop be expressed as a first-class ``readStream`` format —
``spark.readStream.format("sqs")`` — behind the same URL surface as the
kafka/file backends (readers.parse_queue_url).

Semantics (honest mapping of SQS onto micro-batches):

- SQS has no replayable offsets; a queue is consume-once.  Offsets here
  are synthetic batch indices; ``read`` receives up to
  ``maxMessagesPerBatch`` messages WITHOUT deleting them, and ``commit``
  deletes the batch's receipt handles only after Spark has durably
  finished the batch.  A crash between read and commit leaves the
  messages invisible until the queue's visibility timeout, after which
  SQS redelivers them — exactly the reference's at-least-once contract
  (engine-level dedup, SET3, absorbs the duplicates downstream).
- ``readBetweenOffsets`` (replay of a formed-but-uncommitted batch on
  restart) serves from the reader's in-memory cache when alive; after a
  full driver crash the cache is gone and the batch replays EMPTY —
  the data is not lost, it redelivers via visibility timeout in a later
  batch.  This is the strongest guarantee SQS's API permits without an
  external message journal.
- The driver-side simple reader matches SQS's model: receive_message is
  a sequential network call (max 10 messages each) and queue fan-in is
  achieved with MULTIPLE QUEUES or competing consumers, not partitioned
  readers.  Rows are distributed to executors by Spark after receive;
  the decode/validate pipeline (readers.event_stream) is Column-only.

Testing: moto's ThreadedMotoServer provides a real HTTP SQS endpoint
(cross-process, so Spark's Python workers see the same queue); the
``endpoint`` query parameter aims boto3 at it.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SQS_SCHEMA = (
    "message_id string, body string, sent_timestamp long, "
    "receive_count int"
)


def _client(options: dict):
    import boto3

    kwargs = {}
    if options.get("region"):
        kwargs["region_name"] = options["region"]
    if options.get("endpoint"):
        kwargs["endpoint_url"] = options["endpoint"]
    # test/CI creds: moto accepts anything; real deployments use the
    # standard AWS credential chain
    if options.get("endpoint"):
        kwargs.setdefault("aws_access_key_id", "test")
        kwargs.setdefault("aws_secret_access_key", "test")
    return boto3.client("sqs", **kwargs)


class SqsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.batch_size = int(options.get("maxmessagesperbatch", 100))
        self.wait_seconds = int(options.get("waittimeseconds", 0))
        self._sqs = None
        self._url = None
        self._pending: dict[int, list[str]] = {}  # batch idx -> handles
        self._cache: dict[int, list[tuple]] = {}  # batch idx -> rows

    def _queue(self):
        if self._sqs is None:
            self._sqs = _client(self.options)
            name = self.options["queuename"]
            self._url = self._sqs.get_queue_url(QueueName=name)["QueueUrl"]
        return self._sqs, self._url

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        sqs, url = self._queue()
        rows: list[tuple] = []
        handles: list[str] = []
        while len(rows) < self.batch_size:
            resp = sqs.receive_message(
                QueueUrl=url,
                MaxNumberOfMessages=min(10, self.batch_size - len(rows)),
                WaitTimeSeconds=self.wait_seconds,
                AttributeNames=["SentTimestamp", "ApproximateReceiveCount"],
            )
            msgs = resp.get("Messages", [])
            if not msgs:
                break
            for m in msgs:
                attrs = m.get("Attributes", {})
                rows.append(
                    (
                        m["MessageId"],
                        m["Body"],
                        int(attrs.get("SentTimestamp", 0)),
                        int(attrs.get("ApproximateReceiveCount", 1)),
                    )
                )
                handles.append(m["ReceiptHandle"])
        idx = int(start["batch"])
        self._pending[idx] = handles
        self._cache[idx] = rows
        return iter(rows), {"batch": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        idx = int(start["batch"])
        return iter(self._cache.get(idx, []))

    def commit(self, end: dict):
        sqs, url = self._queue()
        done = int(end["batch"])
        for idx in sorted(self._pending):
            if idx >= done:
                continue
            handles = self._pending.pop(idx)
            self._cache.pop(idx, None)
            for i in range(0, len(handles), 10):
                entries = [
                    {"Id": str(j), "ReceiptHandle": h}
                    for j, h in enumerate(handles[i : i + 10])
                ]
                if entries:
                    sqs.delete_message_batch(QueueUrl=url, Entries=entries)


class SqsDataSource(DataSource):
    """``spark.readStream.format("sqs").option("queueName", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "sqs"

    def schema(self) -> str:
        return SQS_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SqsStreamReader:
        # option keys arrive lower-cased from Spark
        if "queuename" not in self.options:
            raise ValueError("sqs source requires option queueName")
        return SqsStreamReader(self.options)


def register_sqs_source(spark) -> None:
    """Idempotently register the format with a session."""
    try:
        spark.dataSource.register(SqsDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise


def send_events(url_options: dict, queue_name: str, events: list[dict]) -> int:
    """Test/ops helper: publish PublishedEvent JSON bodies to a queue."""
    sqs = _client(url_options)
    qurl = sqs.get_queue_url(QueueName=queue_name)["QueueUrl"]
    for i in range(0, len(events), 10):
        entries = [
            {"Id": str(j), "MessageBody": json.dumps(e)}
            for j, e in enumerate(events[i : i + 10])
        ]
        sqs.send_message_batch(QueueUrl=qurl, Entries=entries)
    return len(events)
