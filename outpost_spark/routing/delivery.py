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
runs on the EXECUTORS (the driver never sees a payload), per-partition
sequentially with connection reuse; parallelism is the partition count,
so ``df.repartition(n)`` is the concurrency dial and a 1000-executor
cluster delivers on all 1000 without any coordinator.  At-least-once:
a crashed task re-runs its partition and re-POSTs — exactly the
reference's delivery guarantee (webhook consumers must be idempotent;
the event-id header is the dedupe key).

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
) -> DataFrame:
    """POST each (url, body, headers) row; append (status,
    response_code, response_data) — success iff 2xx, non-2xx and
    transport errors are failures with the response/error captured
    (code 0 = no HTTP response), never exceptions: a delivery failure
    is a DATA outcome for the retry layer, not a job failure.

    Input: any frame with ``url`` (string), ``body`` (string) and
    ``headers`` (map<string,string>) columns — i.e. ``format_webhook``
    / ``format_webhook_standard`` / ``format_hookdeck`` output; all
    other columns pass through, so keep ``destination_id`` upstream if
    the attempt log needs it.
    """
    schema = _result_schema(df)

    def run(batches):
        import urllib.error
        import urllib.request

        def one(url: str, body: str, headers) -> tuple[str, int, str]:
            req = urllib.request.Request(
                url, data=body.encode("utf-8"), method=method
            )
            for k, v in (headers or {}).items():
                req.add_header(k, v)
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    data = resp.read(max_response_bytes)
                    code = int(resp.status)
            except urllib.error.HTTPError as e:
                data = e.read(max_response_bytes)
                code = int(e.code)
            except Exception as e:  # timeout, refused, DNS — no response
                return "failed", 0, f"{type(e).__name__}: {e}"
            ok = 200 <= code < 300
            return (
                "success" if ok else "failed",
                code,
                data.decode("utf-8", "replace"),
            )

        for pdf in batches:
            out = [
                one(u, b, h)
                for u, b, h in zip(pdf["url"], pdf["body"], pdf["headers"])
            ]
            pdf = pdf.copy()
            pdf["status"] = [r[0] for r in out]
            pdf["response_code"] = [r[1] for r in out]
            pdf["response_data"] = [r[2] for r in out]
            yield pdf

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
