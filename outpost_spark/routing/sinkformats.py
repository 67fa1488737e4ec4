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
    O(n^2) per row — kept only for callers merging ONE flat array whose
    internal duplicates are arbitrary; the layered merge below is the
    hot-path form (measured 5x cheaper at 600k rows: the nested
    exists/slice lambda stack drops out of efficient evaluation)."""
    rev = F.reverse(entries)
    dedup = F.filter(
        rev,
        lambda e, i: ~F.exists(
            F.slice(rev, F.lit(1), i), lambda p: p["key"] == e["key"]
        ),
    )
    return F.array_sort(dedup)


def _layered_entries(layers: list[Column]) -> Column:
    """Merge entry-array LAYERS with later-layer-wins priority, LINEAR
    per row: each layer's keys are unique within itself (maps / distinct
    literals), so an earlier entry survives iff no later layer contains
    its key — one ``map_contains_key`` probe per later layer instead of
    the O(n^2) generic keep-last scan."""
    key_arrays = [
        F.transform(l, lambda e: e["key"]) for l in layers
    ]

    def _absent(later_keys):
        # closure factory: F.filter inspects the callback's ARITY, so a
        # defaulted second parameter would be fed the element index
        def fn(e):
            c = ~F.array_contains(later_keys[0], e["key"])
            for ks in later_keys[1:]:
                c = c & ~F.array_contains(ks, e["key"])
            return c

        return fn

    parts = []
    for i, layer in enumerate(layers):
        later = key_arrays[i + 1 :]
        parts.append(F.filter(layer, _absent(later)) if later else layer)
    return F.concat(*parts)


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
    # each layer's keys are unique (literal sets / a map's entries), so
    # the linear layered merge applies; one final sort for Go
    # json.Marshal key order
    merged = F.array_sort(_layered_entries([system, delivery, event_entries]))
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


# ── webhook / webhook-standard / hookdeck (r06: the last 3 of 10) ──────


def _sig_content_expr(template: str, *, body: Column, event_id: Column,
                      topic: Column, ts: Column) -> Column:
    """Plan-time expansion of the signature CONTENT template into a
    concat of Columns (destwebhook/signature.go placeholder set)."""
    import re as _re

    reprs = {
        "{{.Body}}": body,
        "{{.EventID}}": event_id.cast("string"),
        "{{.Topic}}": topic.cast("string"),
        "{{.Timestamp.Unix}}": F.unix_timestamp(ts).cast("string"),
        "{{.Timestamp.UnixMilli}}": F.floor(ts.cast("double") * 1000)
        .cast("long")
        .cast("string"),
    }
    pat = "|".join(_re.escape(k) for k in reprs)
    parts: list[Column] = []
    pos = 0
    for m in _re.finditer(pat, template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(reprs[m.group(0)])
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def _sig_header_expr(template: str, sigs: list[Column]) -> Column:
    """Plan-time expansion of the signature HEADER template over the
    per-secret signature Columns.  Supports the two template families
    the reference ships: ``...{{.Signatures | join "SEP"}}...`` (default
    'v0=...') and the Standard Webhooks range form
    ``v1,{{index .Signatures 0}}{{range slice .Signatures 1}} v1,{{.}}{{end}}``."""
    import re as _re

    m = _re.fullmatch(r'(.*)\{\{\.Signatures \| join "([^"]*)"\}\}(.*)', template)
    if m:
        joined: Column = sigs[0]
        for s in sigs[1:]:
            joined = F.concat(joined, F.lit(m.group(2)), s)
        return F.concat(F.lit(m.group(1)), joined, F.lit(m.group(3)))
    m = _re.fullmatch(
        r"(.*)\{\{index \.Signatures 0\}\}"
        r"\{\{range slice \.Signatures 1\}\}(.*)\{\{\.\}\}\{\{end\}\}",
        template,
    )
    if m:
        out = F.concat(F.lit(m.group(1)), sigs[0])
        for s in sigs[1:]:
            out = F.concat(out, F.lit(m.group(2)), s)
        return out
    raise ValueError(f"unsupported signature header template: {template!r}")


def _signature_expr(
    *,
    body: Column,
    event_id: Column,
    topic: Column,
    ts: Column,
    secrets: list[str],
    content_template: str = "{{.Body}}",
    header_template: str = 'v0={{.Signatures | join ","}}',
    algorithm: str = "hmac-sha256",
    encoding: str = "hex",
    secret_safe: bool = False,
) -> Column:
    from outpost_spark.functions.sinkfns import hmac_expr, hmac_udf

    content = _sig_content_expr(
        content_template, body=body, event_id=event_id, topic=topic, ts=ts
    )
    mk = hmac_udf if secret_safe else hmac_expr
    sigs = [
        mk(k, content, algorithm=algorithm, encoding=encoding)
        for k in secrets
    ]
    return _sig_header_expr(header_template, sigs)


_WEBHOOK_SYSTEM_KEYS = ("event-id", "timestamp", "topic")


def _prefixed_meta_entries(meta: Column, prefix: str, overrides) -> Column:
    """Metadata map -> header entries: unknown keys always get the
    prefix; the three system keys follow their configured directive
    (destwebhook.go resolveMetadataHeaderName — ``overrides`` maps a
    system key to None (disabled) or a pinned header name)."""
    for k in overrides or {}:
        if k not in _WEBHOOK_SYSTEM_KEYS:
            raise ValueError(f"only system keys {_WEBHOOK_SYSTEM_KEYS} take directives, got {k!r}")
    disabled = [k for k, v in (overrides or {}).items() if v is None]
    pinned = {k: v for k, v in (overrides or {}).items() if v is not None}

    def name_of(e):
        name = F.concat(F.lit(prefix), e["key"])
        for k, v in pinned.items():
            name = F.when(e["key"] == F.lit(k), F.lit(v)).otherwise(name)
        return name

    kept = F.filter(
        F.map_entries(meta),
        lambda e: ~e["key"].isin(disabled) if disabled else F.lit(True),
    )
    return F.transform(
        kept,
        lambda e: F.struct(
            F.lower(name_of(e)).alias("key"), e["value"].alias("value")
        ),
    )


def format_webhook(
    df: DataFrame,
    *,
    url: str,
    ts: Column,
    secrets: list[str] | None = None,
    header_prefix: str = "x-outpost-",
    custom_headers: dict[str, str] | None = None,
    header_overrides: dict[str, str | None] | None = None,
    signature_content_template: str = "{{.Body}}",
    signature_header_template: str = 'v0={{.Signatures | join ","}}',
    algorithm: str = "hmac-sha256",
    encoding: str = "hex",
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
    secret_safe: bool = False,
) -> DataFrame:
    """HTTP webhook request frame (destwebhook.go:733-780): body = raw
    event data; headers = content-type < custom headers < prefixed
    metadata (system keys honoring disable/pin directives) < signature.
    Header names are emitted lowercase — Go's http.Header canonicalizes
    on read, so case carries no information.  With the default
    templates the whole row, signature included, is zero-Python
    (hmac_expr is a codegen HMAC over plan-time key blocks).
    ``secret_safe=True`` signs through the Arrow pandas-UDF path
    instead — identical bytes, but key material never enters a plan
    string (see sinkfns.hmac_expr's exposure note)."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    consts = {"content-type": "application/json"}
    for k, v in (custom_headers or {}).items():
        consts[k.lower()] = v  # python-side dedup keeps the layer unique
    layers = [
        F.array(
            *[
                F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
                for k, v in consts.items()
            ]
        ),
        _prefixed_meta_entries(meta, header_prefix, header_overrides),
    ]
    if secrets:
        sig_name = (header_overrides or {}).get("signature")
        sig = _signature_expr(
            body=F.col("data"), event_id=F.col("event_id"),
            topic=F.col("topic"), ts=ts, secrets=secrets,
            content_template=signature_content_template,
            header_template=signature_header_template,
            algorithm=algorithm, encoding=encoding,
            secret_safe=secret_safe,
        )
        if secret_safe:
            # a Python UDF may not appear inside the header lambdas
            # (higher-order functions reject it at analysis); evaluate
            # it as a real column first and reference that
            df = df.withColumn("__sig", sig)
            sig = F.col("__sig")
        layers.append(
            F.array(
                F.struct(
                    F.lit((sig_name or f"{header_prefix}signature").lower()).alias("key"),
                    sig.alias("value"),
                )
            )
        )
    if header_overrides:
        # pinned names can collide with prefixed metadata keys inside one
        # layer — fall back to the generic keep-last merge
        headers = F.map_from_entries(
            _sorted_entries_keep_last(F.concat(*layers))
        )
    else:
        headers = F.map_from_entries(_layered_entries(layers))
    return df.select(
        "event_id",
        F.lit(url).alias("url"),
        F.col("data").alias("body"),
        headers.alias("headers"),
    )


def format_webhook_standard(
    df: DataFrame,
    *,
    url: str,
    ts: Column,
    secrets: list[str],
    header_prefix: str = "webhook-",
    custom_headers: dict[str, str] | None = None,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """Standard Webhooks request frame (destwebhookstandard.go:577-630):
    <prefix>id = event id, <prefix>timestamp = unix seconds,
    <prefix>signature = ``v1,<base64 hmac-sha256>`` over
    ``id.timestamp.body`` (space-joined per rotated secret), merged
    metadata under the prefix EXCEPT event-id/timestamp (replaced by the
    standard headers), plus the raw event metadata un-prefixed."""
    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    consts = {"content-type": "application/json"}
    for k, v in (custom_headers or {}).items():
        consts[k.lower()] = v
    entries = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
            for k, v in consts.items()
        ]
    )
    unix = F.unix_timestamp(ts).cast("string")
    sig = _signature_expr(
        body=F.col("data"), event_id=F.col("event_id"), topic=F.col("topic"),
        ts=ts, secrets=secrets,
        content_template="{{.EventID}}.{{.Timestamp.Unix}}.{{.Body}}",
        header_template=(
            "v1,{{index .Signatures 0}}"
            "{{range slice .Signatures 1}} v1,{{.}}{{end}}"
        ),
        algorithm="hmac-sha256", encoding="base64",
    )
    std = F.array(
        F.struct(F.lit(f"{header_prefix}id").alias("key"),
                 F.col("event_id").cast("string").alias("value")),
        F.struct(F.lit(f"{header_prefix}timestamp").alias("key"),
                 unix.alias("value")),
        F.struct(F.lit(f"{header_prefix}signature").alias("key"),
                 sig.alias("value")),
    )
    prefixed = F.transform(
        F.filter(
            F.map_entries(meta),
            lambda e: ~e["key"].isin(["event-id", "timestamp"]),
        ),
        lambda e: F.struct(
            F.lower(F.concat(F.lit(header_prefix), e["key"])).alias("key"),
            e["value"].alias("value"),
        ),
    )
    raw_meta = F.transform(
        F.map_entries(
            F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>"))
        ),
        lambda e: F.struct(F.lower(e["key"]).alias("key"), e["value"].alias("value")),
    )
    return df.select(
        "event_id",
        F.lit(url).alias("url"),
        F.col("data").alias("body"),
        F.map_from_entries(
            _layered_entries([entries, std, prefixed, raw_meta])
        ).alias("headers"),
    )


def format_hookdeck(
    df: DataFrame,
    *,
    token_id: str,
    signing_key: str,
    ts: Column,
    delivery_metadata: dict[str, str] | None = None,
    include_ms_timestamp: bool = False,
) -> DataFrame:
    """Hookdeck request frame (desthookdeck/hookdeck.go:108-135):
    POST https://hkdk.events/<token>, body = raw data,
    x-hookdeck-signature = ``v0=<base64 hmac-sha256(body)>``, merged
    metadata under ``x-outpost-``."""
    from outpost_spark.functions.sinkfns import hmac_expr

    meta = _meta(df, ts, delivery_metadata, include_ms_timestamp)
    sig = F.concat(
        F.lit("v0="),
        hmac_expr(signing_key, F.col("data"), algorithm="hmac-sha256", encoding="base64"),
    )
    layers = [
        F.array(
            F.struct(F.lit("content-type").alias("key"),
                     F.lit("application/json").alias("value")),
            F.struct(F.lit("x-hookdeck-signature").alias("key"),
                     sig.alias("value")),
        ),
        F.transform(
            F.map_entries(meta),
            lambda e: F.struct(
                F.lower(F.concat(F.lit("x-outpost-"), e["key"])).alias("key"),
                e["value"].alias("value"),
            ),
        ),
    ]
    return df.select(
        "event_id",
        F.lit(f"https://hkdk.events/{token_id}").alias("url"),
        F.col("data").alias("body"),
        F.map_from_entries(_layered_entries(layers)).alias("headers"),
    )
