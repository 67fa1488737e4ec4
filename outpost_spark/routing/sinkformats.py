"""Provider record formatting (S6's data-transformation surface).

The reference's ten destination providers each implement
``Format(event) -> provider record`` — a pure data transformation that
shapes the routed event into the provider's publish payload — and then a
``Publish`` that performs network I/O.  Publishing is out of scope here
(BASELINE.json: "webhook delivery orchestration does not [fit Spark]");
the FORMAT step is exactly the kind of per-row work a routing stream
does at scale, so every provider's record shape is reproduced as a
Column-only transformation over the routed DeliveryTask frame.  A
downstream connector (Spark's Kafka sink, foreachBatch writers, or any
external delivery tier) consumes these frames as-is.

Reference anchors (shapes pinned by each provider's *_format_test.go):
- metadata merge: ``BasePublisher.MakeMetadata``
  (internal/destregistry/basepublisher.go:67-94) — system {timestamp
  RFC3339, event-id, topic} [+ timestamp-ms RFC3339Nano] < delivery
  metadata < event metadata; Go's json.Marshal sorts keys, so merged
  maps here are key-sorted to make ``to_json`` byte-compatible.
- kinesis: destawskinesis.go:186-249 (raw data or {"data","metadata"}
  envelope; JMESPath partition key over the payload, event-id fallback).
- sqs: destawssqs.go:139-160 (body = raw data; one "metadata" message
  attribute holding the JSON-marshaled metadata).
- s3: destawss3.go:185-296 (JMESPath key template over {data, metadata,
  time fields of event.Time}; SHA-256 checksum, base64; content type
  application/json).
- pubsub: destgcppubsub.go:160-177 (data + metadata as attributes).
- azure servicebus: destazureservicebus.go:127-143 (body + metadata as
  application properties).
- rabbitmq: destrabbitmq.go:134-170 (exchange from config, routing key =
  event topic, content-type application/json, metadata as headers).
- kafka: destkafka.go:215-253 (JMESPath partition key like kinesis;
  value = raw data; headers = content-type + metadata).

Scale note: with empty partition-key/key templates (the common
deployment), every formatter is pure whole-stage-codegen Column work —
zero Python.  A non-empty template routes through one Arrow-batched
pandas UDF evaluating JMESPath per row (full ``jmespath`` when
available, the dot-path subset otherwise — functions/sinkfns.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RFC3339 = "yyyy-MM-dd'T'HH:mm:ss"


def rfc3339_expr(ts: Column) -> Column:
    """Go ``time.RFC3339`` for a UTC-session timestamp column."""
    return F.concat(F.date_format(ts, _RFC3339), F.lit("Z"))


def rfc3339_nano_expr(ts: Column) -> Column:
    """Go ``time.RFC3339Nano``: fractional seconds with TRAILING ZEROS
    STRIPPED, and no fraction at all for whole seconds — Go's formatter
    differs from a fixed-width pattern exactly there."""
    frac = F.regexp_replace(F.date_format(ts, "SSSSSS"), "0+$", "")
    return F.concat(
        F.date_format(ts, _RFC3339),
        F.when(frac == "", F.lit("")).otherwise(F.concat(F.lit("."), frac)),
        F.lit("Z"),
    )


def _sorted_entries_keep_last(entries: Column) -> Column:
    """Dedup struct<key,value> entries keeping the LAST occurrence per
    key (merge priority), then sort by key (Go json.Marshal order).
    O(n^2) per row over metadata-sized maps (a handful of entries)."""
    rev = F.reverse(entries)
    dedup = F.filter(
        rev,
        lambda e, i: ~F.exists(
            F.slice(rev, F.lit(1), i), lambda p: p["key"] == e["key"]
        ),
    )
    return F.array_sort(dedup)


def metadata_expr(
    event_id: Column,
    topic: Column,
    event_metadata: Column,
    ts: Column,
    *,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> Column:
    """The merged delivery-metadata map (key-sorted map<string,string>).

    Priority: system < delivery_metadata < event metadata, mirroring
    MakeMetadata; ``ts`` is the publish timestamp column (the reference
    stamps time.Now() — a streaming caller passes the batch timestamp,
    tests pass a literal).
    """
    sys_pairs = [
        (F.lit("timestamp"), rfc3339_expr(ts)),
        (F.lit("event-id"), event_id.cast("string")),
        (F.lit("topic"), topic.cast("string")),
    ]
    if include_ms_timestamp:
        sys_pairs.append((F.lit("timestamp-ms"), rfc3339_nano_expr(ts)))
    system = F.array(
        *[F.struct(k.alias("key"), v.alias("value")) for k, v in sys_pairs]
    )
    delivery = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
            for k, v in (delivery_metadata or {}).items()
        ]
    ).cast("array<struct<key:string,value:string>>")
    event_entries = F.map_entries(
        F.coalesce(event_metadata, F.create_map().cast("map<string,string>"))
    )
    merged = _sorted_entries_keep_last(F.concat(system, delivery, event_entries))
    return F.map_from_entries(merged)


def _metadata_json(meta: Column) -> Column:
    """json.Marshal of the (already key-sorted) metadata map."""
    return F.to_json(meta)


def _py_metadata(ev_id, topic, ev_meta, ts_s, ts_ms, delivery, include_ms):
    """Python twin of :func:`metadata_expr` for UDF-side payloads —
    keeping UDF ARGUMENTS to simple columns matters: feeding the merged
    map's nested-lambda Column tree into a pandas UDF makes codegen
    occasionally fall back to interpreted projection, which cannot
    evaluate the embedded PythonUDF (internal error)."""
    meta = {"timestamp": ts_s, "event-id": ev_id or "", "topic": topic or ""}
    if include_ms:
        meta["timestamp-ms"] = ts_ms
    meta.update(delivery or {})
    meta.update(ev_meta or {})
    return meta


def _partition_key(
    template: str,
    data: Column,
    event_id: Column,
    topic: Column,
    event_metadata: Column,
    ts: Column,
    delivery_metadata: dict[str, str] | None,
    include_ms: bool,
) -> Column:
    """JMESPath partition key over {"data": parsed data, "metadata": ...}
    with event-id fallback (partitionkey.go semantics).  Empty template
    short-circuits to the event id — zero Python on the default path."""
    if not template:
        return event_id.cast("string")
    import json

    from pyspark.sql.functions import pandas_udf

    from outpost_spark.functions.sinkfns import evaluate_partition_key

    @pandas_udf("string")
    def _pk(data_s: "pd.Series", ev_id: "pd.Series", top: "pd.Series",
            ev_meta: "pd.Series", ts_s: "pd.Series", ts_ms: "pd.Series") -> "pd.Series":
        out = []
        for d, i, t, m, tss, tsm in zip(data_s, ev_id, top, ev_meta, ts_s, ts_ms):
            try:
                parsed = json.loads(d) if d else {}
            except ValueError:
                parsed = {}
            payload = {
                "data": parsed or {},
                "metadata": _py_metadata(
                    i, t, m, tss, tsm, delivery_metadata, include_ms
                ),
            }
            out.append(evaluate_partition_key(template, payload, i or ""))
        return pd.Series(out)

    return _pk(
        data, event_id.cast("string"), topic.cast("string"),
        event_metadata, rfc3339_expr(ts), rfc3339_nano_expr(ts),
    )


def _meta(df: DataFrame, ts: Column, delivery_metadata, include_ms) -> Column:
    return metadata_expr(
        F.col("event_id"),
        F.col("topic"),
        F.col("metadata"),
        ts,
        delivery_metadata=delivery_metadata,
        include_ms_timestamp=include_ms,
    )


def format_kinesis(
    df: DataFrame,
    *,
    stream_name: str,
    ts: Column,
    partition_key_template: str = "",
    metadata_in_payload: bool = False,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """PutRecordInput frame: (event_id, stream_name, data, partition_key)."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    if metadata_in_payload:
        # Go marshals the envelope map — keys sort: data, metadata; the
        # raw event JSON embeds verbatim (json.RawMessage)
        data = F.concat(
            F.lit('{"data":'), F.col("data"),
            F.lit(',"metadata":'), _metadata_json(meta), F.lit("}"),
        )
    else:
        data = F.col("data")
    return df.select(
        "event_id",
        F.lit(stream_name).alias("stream_name"),
        data.alias("data"),
        _partition_key(
            partition_key_template, F.col("data"), F.col("event_id"),
            F.col("topic"), F.col("metadata"), ts,
            delivery_metadata, include_ms_timestamp,
        ).alias("partition_key"),
    )


def format_sqs(
    df: DataFrame,
    *,
    queue_url: str,
    ts: Column,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """SendMessageInput frame: body = raw data, one String message
    attribute "metadata" holding the JSON-marshaled metadata map."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    return df.select(
        "event_id",
        F.lit(queue_url).alias("queue_url"),
        F.col("data").alias("message_body"),
        F.create_map(F.lit("metadata"), _metadata_json(meta)).alias(
            "message_attributes"
        ),
    )


_S3_STORAGE_CLASSES = {
    "STANDARD", "REDUCED_REDUNDANCY", "STANDARD_IA", "ONEZONE_IA",
    "INTELLIGENT_TIERING", "GLACIER", "DEEP_ARCHIVE", "GLACIER_IR",
}
_S3_DEFAULT_KEY_TEMPLATE = (
    """join('', [time.rfc3339_nano, '_', metadata."event-id", '.json'])"""
)


def format_s3(
    df: DataFrame,
    *,
    bucket: str,
    ts: Column,
    key_template: str = "",
    storage_class: str = "STANDARD",
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """PutObjectInput frame: key from the JMESPath template over
    {data, metadata, time fields of event_time}; SHA-256 body checksum
    (base64); content type application/json.

    The reference's DEFAULT key template compiles to a pure Column
    expression (rfc3339_nano(event_time) _ event-id .json) — custom
    templates go through the jmespath UDF.
    """
    if storage_class not in _S3_STORAGE_CLASSES:
        raise ValueError(f"invalid S3 storage class {storage_class!r}")
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    template = key_template or _S3_DEFAULT_KEY_TEMPLATE
    if template == _S3_DEFAULT_KEY_TEMPLATE:
        # time fields use event.Time (destawss3.go:266-270), not now()
        key = F.concat(
            rfc3339_nano_expr(F.col("event_time")),
            F.lit("_"),
            F.col("event_id"),
            F.lit(".json"),
        )
    else:
        key = _s3_key_udf(template, delivery_metadata, include_ms_timestamp)(
            F.col("data"), F.col("event_id"), F.col("topic"), F.col("metadata"),
            rfc3339_expr(ts), rfc3339_nano_expr(ts), F.col("event_time"),
        )
    return df.select(
        "event_id",
        F.lit(bucket).alias("bucket"),
        key.alias("key"),
        F.col("data").alias("body"),
        meta.alias("metadata"),
        F.lit("application/json").alias("content_type"),
        F.base64(F.unhex(F.sha2(F.col("data"), 256))).alias("checksum_sha256"),
        F.lit(storage_class).alias("storage_class"),
    )


def _s3_key_udf(template: str, delivery_metadata, include_ms):
    import json

    from pyspark.sql.functions import pandas_udf

    from outpost_spark.functions.sinkfns import evaluate_partition_key

    @pandas_udf("string")
    def _key(data_s: "pd.Series", ev_id: "pd.Series", top: "pd.Series",
             ev_meta: "pd.Series", ts_s: "pd.Series", ts_ms: "pd.Series",
             ev_time: "pd.Series") -> "pd.Series":
        out = []
        for d, i, t_, m_, tss, tsm, t in zip(
            data_s, ev_id, top, ev_meta, ts_s, ts_ms, ev_time
        ):
            utc = t.tz_localize("UTC") if t.tzinfo is None else t.tz_convert("UTC")
            nano = utc.strftime("%Y-%m-%dT%H:%M:%S")
            frac = f"{utc.microsecond:06d}".rstrip("0")
            nano += (f".{frac}" if frac else "") + "Z"
            payload = {
                "data": (json.loads(d) if d else {}) or {},
                "metadata": _py_metadata(
                    i, t_, m_, tss, tsm, delivery_metadata, include_ms
                ),
                "time": {
                    "year": f"{utc.year:04d}", "month": f"{utc.month:02d}",
                    "day": f"{utc.day:02d}", "hour": f"{utc.hour:02d}",
                    "minute": f"{utc.minute:02d}", "second": f"{utc.second:02d}",
                    "date": utc.strftime("%Y-%m-%d"),
                    "datetime": utc.strftime("%Y-%m-%dT%H:%M:%S"),
                    "unix": str(int(utc.timestamp())),
                    "rfc3339": utc.strftime("%Y-%m-%dT%H:%M:%S") + "Z",
                    "rfc3339_nano": nano,
                },
            }
            out.append(evaluate_partition_key(template, payload, i or ""))
        return pd.Series(out)

    return _key


def format_pubsub(
    df: DataFrame,
    *,
    ts: Column,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """pubsub.Message frame: data + metadata as attributes."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    return df.select("event_id", F.col("data"), meta.alias("attributes"))


def format_azure_servicebus(
    df: DataFrame,
    *,
    ts: Column,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """azservicebus.Message frame: body + metadata as application
    properties."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    return df.select(
        "event_id",
        F.col("data").alias("body"),
        meta.alias("application_properties"),
    )


def format_rabbitmq(
    df: DataFrame,
    *,
    exchange: str,
    ts: Column,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """amqp Publishing frame: routing key = event topic, content-type
    application/json, metadata as headers."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    return df.select(
        "event_id",
        F.lit(exchange).alias("exchange"),
        F.col("topic").alias("routing_key"),
        F.lit("application/json").alias("content_type"),
        meta.alias("headers"),
        F.col("data").alias("body"),
    )


def format_kafka(
    df: DataFrame,
    *,
    topic: str,
    ts: Column,
    partition_key_template: str = "",
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """kafka.Message frame, directly consumable by Spark's Kafka sink:
    key (JMESPath template / event-id fallback), value = raw data,
    headers = content-type + metadata (array<struct<key,value binary>>
    — the Kafka writer's headers contract)."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    headers = F.concat(
        F.array(
            F.struct(
                F.lit("content-type").alias("key"),
                F.lit("application/json").cast("binary").alias("value"),
            )
        ),
        F.transform(
            F.map_entries(meta),
            lambda e: F.struct(
                e["key"].alias("key"), e["value"].cast("binary").alias("value")
            ),
        ),
    )
    return df.select(
        "event_id",
        F.lit(topic).alias("topic"),
        _partition_key(
            partition_key_template, F.col("data"), F.col("event_id"),
            F.col("topic"), F.col("metadata"), ts,
            delivery_metadata, include_ms_timestamp,
        ).alias("key"),
        F.col("data").alias("value"),
        headers.alias("headers"),
    )
