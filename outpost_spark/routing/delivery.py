"""Destination delivery executors — the I/O half of S6.

The reference's delivery tier (internal/destregistry/registry.go:151
dispatch into internal/destregistry/providers/*) is a per-message
network publisher.  BASELINE.json scopes "webhook delivery
orchestration" out of the Spark engine, and the data half — every
provider's ``Format(event) -> record`` transform — lives Column-only in
:mod:`routing.sinkformats`.  This module adds the executor for the
providers whose I/O *does* fit Spark's execution model when delivery
results are treated as DATA:

- :func:`deliver_http` — webhook / webhook-standard / hookdeck frames
  (``format_webhook*`` output: url, body, headers) POSTed per row, with
  the outcome returned as a DeliveryAttempt-shaped DataFrame
  (status/code/response body), ready for ``insert_many`` and the retry
  layer.  destwebhook.go:782-837 analog: 2xx = success, anything else =
  failure with the response captured.
- :func:`deliver_sqs` — ``format_sqs`` frames published with
  ``send_message_batch`` (10-message API batches), per-partition client
  reuse; the reference's destawssqs provider.

Execution shape: ``mapInPandas`` — rows in, attempt rows out.  The I/O
runs on the EXECUTORS (the driver never sees a payload).  HTTP delivery
is CONCURRENT within each partition (a bounded thread pool, matching the
reference's errgroup fan-out in
internal/publishmq/eventhandler.go:177-200) over KEEP-ALIVE pooled
connections keyed by (scheme, host, port) — the analog of destwebhook's
pooled http.Client transport — so total in-flight deliveries are
``partitions × max_concurrency`` and a 1000-executor cluster delivers on
all 1000 without any coordinator.  At-least-once: a crashed task re-runs
its partition and re-POSTs — exactly the reference's delivery guarantee
(webhook consumers must be idempotent; the event-id header is the dedupe
key).

This is deliberately NOT a streaming sink: wrap it in ``foreachBatch``
and the attempt frame of each micro-batch lands in the log store and
the retry stream in the same transaction scope as the delivery itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ATTEMPT_RESULT_FIELDS = [
    T.StructField("status", T.StringType()),
    T.StructField("response_code", T.IntegerType()),
    T.StructField("response_data", T.StringType()),
]


def _result_schema(df: DataFrame) -> T.StructType:
    return T.StructType(list(df.schema.fields) + list(ATTEMPT_RESULT_FIELDS))


def deliver_http(
    df: DataFrame,
    *,
    method: str = "POST",
    timeout: float = 5.0,
    max_response_bytes: int = 4096,
    max_concurrency: int = 16,
    pool_per_host: int = 16,
    drain_bytes: int = 1 << 20,
) -> DataFrame:
    """POST each (url, body, headers) row; append (status,
    response_code, response_data) — success iff 2xx, non-2xx and
    transport errors are failures with the response/error captured
    (code 0 = no HTTP response), never exceptions: a delivery failure
    is a DATA outcome for the retry layer, not a job failure.

    Concurrency + connection reuse (the reference's delivery shape —
    errgroup fan-out in internal/publishmq/eventhandler.go:177-200 over
    destwebhook's pooled http.Client): each partition runs up to
    ``max_concurrency`` deliveries in flight on a thread pool, each over
    a keep-alive ``http.client`` connection checked out of a per-worker
    pool keyed by (scheme, host, port) and returned after the response
    is drained.  A stale pooled socket (server closed it between
    requests) is retried ONCE on a fresh connection — only when the
    request died before the server could have acted on it, so a
    delivery is never silently duplicated by the pool itself.  Response
    bodies are drained up to ``drain_bytes`` to keep the socket
    reusable; longer responses close it.

    Input: any frame with ``url`` (string), ``body`` (string) and
    ``headers`` (map<string,string>) columns — i.e. ``format_webhook``
    / ``format_webhook_standard`` / ``format_hookdeck`` output; all
    other columns pass through, so keep ``destination_id`` upstream if
    the attempt log needs it.
    """
    schema = _result_schema(df)

    def run(batches):
        import http.client
        import threading
        from concurrent.futures import ThreadPoolExecutor
        from urllib.parse import urlsplit

        pools: dict[tuple, list] = {}
        lock = threading.Lock()

        def acquire(key):
            with lock:
                stack = pools.get(key)
                if stack:
                    return stack.pop(), True  # reused keep-alive socket
            scheme, host, port = key
            cls = (
                http.client.HTTPSConnection
                if scheme == "https"
                else http.client.HTTPConnection
            )
            return cls(host, port, timeout=timeout), False

        def release(key, conn):
            with lock:
                stack = pools.setdefault(key, [])
                if len(stack) < pool_per_host:
                    stack.append(conn)
                    return
            conn.close()

        def one(url: str, body: str, headers) -> tuple[str, int, str]:
            parts = urlsplit(url)
            scheme = parts.scheme or "http"
            port = parts.port or (443 if scheme == "https" else 80)
            key = (scheme, parts.hostname or "", port)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            payload = body.encode("utf-8")
            hdrs = dict(headers or {})
            for _try in (0, 1):
                conn, reused = acquire(key)
                try:
                    conn.request(method, path, body=payload, headers=hdrs)
                    resp = conn.getresponse()
                except (
                    http.client.BadStatusLine,
                    http.client.CannotSendRequest,
                    ConnectionResetError,
                    BrokenPipeError,
                ) as e:
                    conn.close()
                    if reused:  # stale keep-alive — safe to retry fresh
                        continue
                    return "failed", 0, f"{type(e).__name__}: {e}"
                except Exception as e:  # timeout, refused, DNS
                    conn.close()
                    return "failed", 0, f"{type(e).__name__}: {e}"
                # Headers received: the server HAS processed this request,
                # so from here on NOTHING may trigger a re-POST — a retry
                # past this point would duplicate the delivery while
                # recording a single attempt row.  A body-read failure
                # keeps the status the response code already gave us and
                # records the read error alongside.
                code = int(resp.status)
                try:
                    data = resp.read(max_response_bytes)
                except Exception as e:
                    conn.close()
                    ok = 200 <= code < 300
                    return (
                        "success" if ok else "failed",
                        code,
                        f"[body read failed: {type(e).__name__}: {e}]",
                    )
                # drain the rest (bounded) so the socket is reusable
                try:
                    left = drain_bytes
                    while left > 0:
                        chunk = resp.read(min(65536, left))
                        if not chunk:
                            break
                        left -= len(chunk)
                    if resp.isclosed() and not resp.will_close:
                        release(key, conn)
                    elif resp.isclosed():
                        conn.close()
                    else:  # body longer than drain cap
                        conn.close()
                except Exception:
                    conn.close()
                ok = 200 <= code < 300
                return (
                    "success" if ok else "failed",
                    code,
                    data.decode("utf-8", "replace"),
                )
            return "failed", 0, "stale connection retry exhausted"

        ex = ThreadPoolExecutor(max_workers=max_concurrency)
        try:
            for pdf in batches:
                out = list(
                    ex.map(one, pdf["url"], pdf["body"], pdf["headers"])
                )
                pdf = pdf.copy()
                pdf["status"] = [r[0] for r in out]
                pdf["response_code"] = [r[1] for r in out]
                pdf["response_data"] = [r[2] for r in out]
                yield pdf
        finally:
            ex.shutdown(wait=False)
            for stack in pools.values():
                for c in stack:
                    c.close()

    return df.mapInPandas(run, schema)


def deliver_sqs(
    df: DataFrame,
    *,
    queue_url: str,
    endpoint_url: str | None = None,
    region: str | None = None,
    client_kwargs: dict | None = None,
) -> DataFrame:
    """Publish ``format_sqs`` frames (``message_body`` string +
    ``message_attributes`` map) with ``send_message_batch`` in
    10-message API batches — destawssqs's publish surface.  One boto3
    client per PARTITION (created inside the task, reused across its
    rows); failures come back per message id, mapped onto rows as
    failed attempts.  Appends the same (status, response_code,
    response_data) triple as :func:`deliver_http`."""
    schema = _result_schema(df)

    def run(batches):
        import boto3

        # explicit credential/endpoint kwargs: mapInPandas runs in
        # worker PROCESSES, which don't see driver-side env mutations —
        # anything the client needs must travel in the closure
        kw = dict(client_kwargs or {})
        if endpoint_url:
            kw["endpoint_url"] = endpoint_url
        if region:
            kw["region_name"] = region
        client = boto3.client("sqs", **kw)

        for pdf in batches:
            n = len(pdf)
            status = ["failed"] * n
            codes = [0] * n
            resp_data = [""] * n
            for lo in range(0, n, 10):
                chunk = range(lo, min(lo + 10, n))
                entries = []
                for i in chunk:
                    e = {
                        "Id": str(i),
                        "MessageBody": pdf["message_body"].iloc[i],
                    }
                    attrs = pdf["message_attributes"].iloc[i] if "message_attributes" in pdf else None
                    if attrs:
                        e["MessageAttributes"] = {
                            k: {"DataType": "String", "StringValue": v}
                            for k, v in attrs.items()
                        }
                    entries.append(e)
                try:
                    resp = client.send_message_batch(
                        QueueUrl=queue_url, Entries=entries
                    )
                except Exception as e:  # whole-batch transport failure
                    for i in chunk:
                        resp_data[i] = f"{type(e).__name__}: {e}"
                    continue
                for ok in resp.get("Successful", []):
                    i = int(ok["Id"])
                    status[i], codes[i] = "success", 200
                    resp_data[i] = ok.get("MessageId", "")
                for bad in resp.get("Failed", []):
                    i = int(bad["Id"])
                    codes[i] = 500 if bad.get("SenderFault") is False else 400
                    resp_data[i] = f"{bad.get('Code', '')}: {bad.get('Message', '')}"
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp_data
            yield pdf

    return df.mapInPandas(run, schema)


def deliver_rabbitmq(
    df: DataFrame,
    *,
    server_url: str,
    declare_queue: str | None = None,
    confirm: bool = True,
) -> DataFrame:
    """Publish ``format_rabbitmq`` frames (exchange, routing_key,
    content_type, headers, body) over the stdlib AMQP 0-9-1 client —
    the reference's destrabbitmq provider.  One connection per
    PARTITION, reused across its rows; metadata headers and
    content-type ride in the basic properties.

    With ``confirm=True`` (default) the channel runs in
    publisher-confirm mode: a row is 'success' only once the broker
    basic.acks its publish (confirms are awaited once per BATCH, so the
    round-trip amortizes over the batch, not per row); a broker nack or
    an unconfirmable publish (connection died before the ack) is a
    failed row — the silent-drop window of fire-and-forget AMQP is
    closed.  ``confirm=False`` restores fire-and-forget (amqp091's
    default posture).  A transport failure marks the remaining rows OF
    ITS BATCH failed, and the next batch reconnects (transient broker
    blips don't poison the whole partition).  Appends the same (status,
    response_code, response_data) triple — code 200 on publish, 0 on
    failure."""
    schema = _result_schema(df)
    return df.mapInPandas(
        _rabbitmq_partition(server_url, declare_queue, confirm), schema
    )


def _rabbitmq_partition(
    server_url: str, declare_queue: str | None, confirm: bool = True
):
    """Partition function for :func:`deliver_rabbitmq`, module-level so
    the batch-scoped failure and confirm semantics are unit-testable
    in-process."""

    def run(batches):
        from outpost_spark.sources.rabbitmq_source import AmqpClient

        client = None

        def conn():
            nonlocal client
            if client is None or not client.connected:
                c = AmqpClient(server_url).connect()
                if confirm:
                    c.enable_confirms()
                if declare_queue:
                    c.declare_queue(declare_queue)
                client = c
            return client

        for pdf in batches:
            n = len(pdf)
            status, codes, resp = ["failed"] * n, [0] * n, [""] * n
            # a transient failure poisons only the REST OF ITS BATCH;
            # the next micro-batch retries the reconnect conn() supports
            broken: str | None = None
            seq_to_row: dict[int, int] = {}
            for i in range(n):
                if broken:
                    resp[i] = broken
                    continue
                try:
                    seq = conn().publish(
                        pdf["routing_key"].iloc[i],
                        pdf["body"].iloc[i].encode("utf-8"),
                        exchange=pdf["exchange"].iloc[i],
                        content_type=pdf["content_type"].iloc[i],
                        headers=dict(pdf["headers"].iloc[i] or {}),
                    )
                    status[i], codes[i], resp[i] = "success", 200, "published"
                    if confirm:
                        seq_to_row[seq] = i
                except Exception as e:
                    broken = f"{type(e).__name__}: {e}"
                    resp[i] = broken
            if seq_to_row:
                # one confirm round-trip per batch; any publish whose
                # ack we can't obtain is FAILED (redelivery duplicates
                # beat silent drops — at-least-once, consumers dedupe)
                if broken or client is None or not client.connected:
                    for i in seq_to_row.values():
                        status[i], codes[i] = "failed", 0
                        resp[i] = "publish unconfirmed: connection lost"
                else:
                    try:
                        nacked = client.wait_confirms()
                        for seq, i in seq_to_row.items():
                            if seq in nacked:
                                status[i], codes[i] = "failed", 0
                                resp[i] = "broker nacked publish"
                            else:
                                resp[i] = "confirmed"
                    except Exception as e:
                        for i in seq_to_row.values():
                            status[i], codes[i] = "failed", 0
                            resp[i] = f"confirm wait failed: {type(e).__name__}: {e}"
                        # the channel is desynchronized (half-read
                        # confirm frames, stale _unconfirmed seqs) —
                        # drop it so the next batch reconnects on a
                        # clean channel with reset confirm state
                        try:
                            client.close()
                        except Exception:
                            pass
                        client = None
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp
            yield pdf
        if client is not None:
            client.close()

    return run


def deliver_pubsub(
    df: DataFrame,
    *,
    project: str,
    topic: str,
    endpoint: str = "https://pubsub.googleapis.com",
    token: str | None = None,
    api_batch: int = 100,
) -> DataFrame:
    """Publish ``format_pubsub`` frames (data + attributes) via the
    public REST ``topics:publish`` in ``api_batch``-message calls — the
    reference's destgcppubsub provider.  Per-row response_data carries
    the server-assigned messageId; an HTTP failure marks that call's
    rows failed with the status code."""
    import base64 as _b64

    schema = _result_schema(df)
    url = f"{endpoint.rstrip('/')}/v1/projects/{project}/topics/{topic}:publish"

    def run(batches):
        import json as _json
        import urllib.error
        import urllib.request

        def post(msgs):
            req = urllib.request.Request(
                url,
                data=_json.dumps({"messages": msgs}).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            if token:
                req.add_header("Authorization", f"Bearer {token}")
            with urllib.request.urlopen(req, timeout=30) as r:
                return _json.loads(r.read().decode("utf-8")).get("messageIds", [])

        for pdf in batches:
            n = len(pdf)
            status, codes, resp = ["failed"] * n, [0] * n, [""] * n
            for lo in range(0, n, api_batch):
                idx = range(lo, min(lo + api_batch, n))
                msgs = [
                    {
                        "data": _b64.b64encode(
                            pdf["data"].iloc[i].encode("utf-8")
                        ).decode("ascii"),
                        "attributes": dict(pdf["attributes"].iloc[i] or {}),
                    }
                    for i in idx
                ]
                try:
                    ids = post(msgs)
                except urllib.error.HTTPError as e:
                    body = e.read(2048).decode("utf-8", "replace")
                    for i in idx:
                        codes[i], resp[i] = int(e.code), body
                    continue
                except Exception as e:
                    for i in idx:
                        resp[i] = f"{type(e).__name__}: {e}"
                    continue
                for j, i in enumerate(idx):
                    status[i], codes[i] = "success", 200
                    resp[i] = ids[j] if j < len(ids) else ""
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp
            yield pdf

    return df.mapInPandas(run, schema)


def deliver_azuresb(
    df: DataFrame,
    *,
    endpoint: str,
    queue: str,
    sas_token: str | None = None,
) -> DataFrame:
    """Send ``format_azure_servicebus`` frames (body + application
    properties) with the public REST send operation (POST
    /{queue}/messages; custom properties as HTTP headers) — the
    reference's destazureservicebus provider."""
    schema = _result_schema(df)
    url = f"{endpoint.rstrip('/')}/{queue}/messages"

    def run(batches):
        import urllib.error
        import urllib.request

        for pdf in batches:
            n = len(pdf)
            status, codes, resp = ["failed"] * n, [0] * n, [""] * n
            for i in range(n):
                req = urllib.request.Request(
                    url,
                    data=pdf["body"].iloc[i].encode("utf-8"),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                for k, v in dict(pdf["application_properties"].iloc[i] or {}).items():
                    req.add_header(k, v)
                if sas_token:
                    req.add_header("Authorization", sas_token)
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        status[i], codes[i] = "success", int(r.status)
                except urllib.error.HTTPError as e:
                    codes[i] = int(e.code)
                    resp[i] = e.read(2048).decode("utf-8", "replace")
                except Exception as e:
                    resp[i] = f"{type(e).__name__}: {e}"
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp
            yield pdf

    return df.mapInPandas(run, schema)


def deliver_kinesis(
    df: DataFrame,
    *,
    stream_name: str,
    endpoint_url: str | None = None,
    region: str | None = None,
    client_kwargs: dict | None = None,
) -> DataFrame:
    """Publish ``format_kinesis`` frames (data + partition_key) with
    ``put_records`` in 500-record API batches — destawskinesis's
    publish surface.  Per-record failures (the API succeeds partially
    by design) map onto rows as failed attempts with the error code;
    successes carry the shard id + sequence number."""
    schema = _result_schema(df)

    def run(batches):
        import boto3

        kw = dict(client_kwargs or {})
        if endpoint_url:
            kw["endpoint_url"] = endpoint_url
        if region:
            kw["region_name"] = region
        client = boto3.client("kinesis", **kw)

        for pdf in batches:
            n = len(pdf)
            status, codes, resp = ["failed"] * n, [0] * n, [""] * n
            for lo in range(0, n, 500):
                idx = list(range(lo, min(lo + 500, n)))
                recs = [
                    {
                        "Data": pdf["data"].iloc[i].encode("utf-8"),
                        "PartitionKey": pdf["partition_key"].iloc[i],
                    }
                    for i in idx
                ]
                try:
                    out = client.put_records(
                        StreamName=stream_name, Records=recs
                    )
                except Exception as e:
                    for i in idx:
                        resp[i] = f"{type(e).__name__}: {e}"
                    continue
                for j, rec in enumerate(out.get("Records", [])):
                    i = idx[j]
                    if "SequenceNumber" in rec:
                        status[i], codes[i] = "success", 200
                        resp[i] = f"{rec.get('ShardId', '')}/{rec['SequenceNumber']}"
                    else:
                        codes[i] = 500
                        resp[i] = f"{rec.get('ErrorCode', '')}: {rec.get('ErrorMessage', '')}"
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp
            yield pdf

    return df.mapInPandas(run, schema)


def deliver_s3(
    df: DataFrame,
    *,
    endpoint_url: str | None = None,
    region: str | None = None,
    client_kwargs: dict | None = None,
) -> DataFrame:
    """Put ``format_s3`` frames (bucket, key, body, metadata,
    content_type, checksum_sha256, storage_class) as objects —
    destawss3's publish surface, checksum enforced server-side via
    ``ChecksumSHA256`` so a corrupted payload is rejected by S3 itself,
    exactly the provider's integrity contract."""
    schema = _result_schema(df)

    def run(batches):
        import boto3

        kw = dict(client_kwargs or {})
        if endpoint_url:
            kw["endpoint_url"] = endpoint_url
        if region:
            kw["region_name"] = region
        client = boto3.client("s3", **kw)

        for pdf in batches:
            n = len(pdf)
            status, codes, resp = ["failed"] * n, [0] * n, [""] * n
            for i in range(n):
                try:
                    out = client.put_object(
                        Bucket=pdf["bucket"].iloc[i],
                        Key=pdf["key"].iloc[i],
                        Body=pdf["body"].iloc[i].encode("utf-8"),
                        Metadata=dict(pdf["metadata"].iloc[i] or {}),
                        ContentType=pdf["content_type"].iloc[i],
                        ChecksumSHA256=pdf["checksum_sha256"].iloc[i],
                        StorageClass=pdf["storage_class"].iloc[i],
                    )
                    status[i], codes[i] = "success", 200
                    resp[i] = out.get("ETag", "")
                except Exception as e:
                    code = getattr(e, "response", {}).get(
                        "ResponseMetadata", {}
                    ).get("HTTPStatusCode", 0)
                    codes[i] = int(code or 0)
                    resp[i] = f"{type(e).__name__}: {e}"
            pdf = pdf.copy()
            pdf["status"] = status
            pdf["response_code"] = codes
            pdf["response_data"] = resp
            yield pdf

    return df.mapInPandas(run, schema)


def attempt_records(
    results: DataFrame,
    *,
    attempt_time=None,
    attempt_number_col: str = "attempt_number",
    manual: bool = False,
) -> DataFrame:
    """Delivery-result rows -> denormalized LogEntry rows, ready for
    ``logstore.insert.insert_many`` and the retry stream — the glue that
    closes the reference's loop publish -> route -> deliver -> attempt
    log -> retry (models/tasks.go:99-103 carries exactly this
    denormalized shape between the delivery and log tiers).

    The input must keep the event columns alongside the executor's
    (status, response_code, response_data) — run the formatter on a
    frame that retains them, or join back on event_id.  ``attempt_id``
    is deterministic (md5 over event/destination/attempt_number), so a
    re-delivered at-least-once duplicate collapses in the write-side
    dedup instead of double-counting.
    """
    from pyspark.sql import functions as F

    n = (
        F.col(attempt_number_col).cast("int")
        if attempt_number_col in results.columns
        else F.lit(1)
    )
    at = attempt_time if attempt_time is not None else F.current_timestamp()
    cols = [
        F.md5(
            F.concat_ws(
                "|", F.col("event_id"), F.col("destination_id"), n.cast("string")
            )
        ).alias("attempt_id"),
        "event_id",
        "tenant_id",
        "destination_id",
        "topic",
        F.coalesce(F.col("eligible_for_retry"), F.lit(True)).alias(
            "eligible_for_retry"
        )
        if "eligible_for_retry" in results.columns
        else F.lit(True).alias("eligible_for_retry"),
        F.col("event_time")
        if "event_time" in results.columns
        else at.alias("event_time"),
        "metadata",
        "data",
        "status",
        at.alias("attempt_time"),
        F.col("response_code").cast("string").alias("code"),
        "response_data",
        F.lit(manual).alias("manual"),
        n.alias("attempt_number"),
    ]
    return results.select(*cols)
