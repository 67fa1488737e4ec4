"""Event sources (S1/S2): publish-queue consumers as Structured Streaming
readers, plus ingest validation.

Reference: internal/mqs/queue.go:15-100 configures SQS / GCP Pub/Sub /
RabbitMQ / Azure SB / in-mem queues through gocloud.dev-style URLs; the
publish consumer decodes PublishedEvent JSON and validates it
(publishmq/messagehandler.go:26-57, apirouter/publish_handlers.go:37-87).

Spark mapping: one ``readStream`` per backend.  Kafka is the first-class
connector (the reference's Kafka destination proves the ecosystem);
SQS/PubSub/etc. would be external connector packages with the same
options surface, so here the URL parser normalizes any queue URL into
(format, options) and ``event_stream`` wires the two built-in backends
every deployment has — ``file`` (testing/replay) and ``kafka`` — leaving
other schemes as explicit errors rather than silent stubs.

Scale note: source parallelism is partition-driven (Kafka partitions /
file splits); the JSON decode + validation below are native Column
expressions, fully pipelined inside whole-stage codegen.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Event as published: id/time defaulted at ingest if missing
# (publish_handlers.go:58-66)
PUBLISHED_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("destination_id", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("eligible_for_retry", T.BooleanType()),
        T.StructField("time", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.StringType()),
    ]
)


def parse_queue_url(url: str) -> tuple[str, dict[str, str]]:
    """gocloud-style queue URL → (format, reader options).

    ``kafka://host1:9092,host2:9092/events?startingOffsets=latest`` →
    ``("kafka", {"kafka.bootstrap.servers": ..., "subscribe": "events", ...})``;
    ``file:///path/to/dir?maxFilesPerTrigger=10`` → ``("file", {...})``.
    """
    u = urlparse(url)
    opts = dict(parse_qsl(u.query))
    if u.scheme == "kafka":
        topic = u.path.lstrip("/")
        out = {"kafka.bootstrap.servers": u.netloc, "subscribe": topic}
        out.update(opts)
        return "kafka", out
    if u.scheme == "file":
        return "file", {"path": u.path, **opts}
    if u.scheme == "sqs":
        # gocloud style: sqs://queue-name?region=us-east-1[&endpoint=...]
        out = {"queueName": u.netloc or u.path.lstrip("/")}
        out.update(opts)
        return "sqs", out
    if u.scheme in ("gcppubsub", "pubsub"):
        # gocloud style: gcppubsub://projects/<p>/subscriptions/<s>[?endpoint=...]
        parts = [p for p in (u.netloc + u.path).split("/") if p]
        if (
            len(parts) != 4
            or parts[0] != "projects"
            or parts[2] != "subscriptions"
        ):
            raise ValueError(
                f"pubsub URL must be gcppubsub://projects/<p>/subscriptions/<s>,"
                f" got {url!r}"
            )
        out = {"project": parts[1], "subscription": parts[3]}
        out.update(opts)
        return "pubsub", out
    if u.scheme == "azuresb":
        # gocloud style: azuresb://<queue>?namespace=...|endpoint=...
        out = {"queue": u.netloc or u.path.lstrip("/")}
        out.update(opts)
        return "azuresb", out
    if u.scheme in ("rabbit", "rabbitmq"):
        # gocloud style: rabbit://<queue>[?serverUrl=amqp://...] — gocloud
        # takes the server from RABBIT_SERVER_URL, which the reader also
        # honors when serverUrl is absent (rabbitmq_source.py)
        out = {"queue": u.netloc or u.path.lstrip("/")}
        out.update(opts)
        return "rabbitmq", out
    raise ValueError(
        f"unsupported queue scheme {u.scheme!r}: supported here are kafka://, "
        "file://, sqs://, gcppubsub://, azuresb:// and rabbit://"
    )


def event_stream(spark: SparkSession, url: str) -> DataFrame:
    """PublishedEvent stream from a queue URL, decoded to event columns.

    The raw message body is JSON (mqs message codec, models/tasks.go:45-57);
    ``from_json`` + defaulting mirrors the publish handler: missing id →
    uuid, missing time → current timestamp (publish_handlers.go:58-66).
    """
    fmt, opts = parse_queue_url(url)
    if fmt == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .options(**{k: v for k, v in opts.items()})
            .load()
            .select(F.col("value").cast("string").alias("body"))
        )
    elif fmt == "sqs":
        from outpost_spark.sources.sqs_source import register_sqs_source

        register_sqs_source(spark)
        raw = (
            spark.readStream.format("sqs")
            .options(**opts)
            .load()
            .select(F.col("body"))
        )
    elif fmt == "pubsub":
        from outpost_spark.sources.pubsub_source import register_pubsub_source

        register_pubsub_source(spark)
        raw = (
            spark.readStream.format("pubsub")
            .options(**opts)
            .load()
            .select(F.col("body"))
        )
    elif fmt == "azuresb":
        from outpost_spark.sources.azuresb_source import register_azuresb_source

        register_azuresb_source(spark)
        raw = (
            spark.readStream.format("azuresb")
            .options(**opts)
            .load()
            .select(F.col("body"))
        )
    elif fmt == "rabbitmq":
        from outpost_spark.sources.rabbitmq_source import register_rabbitmq_source

        register_rabbitmq_source(spark)
        raw = (
            spark.readStream.format("rabbitmq")
            .options(**opts)
            .load()
            .select(F.col("body"))
        )
    else:
        path = opts.pop("path")
        reader = spark.readStream
        for k, v in opts.items():
            reader = reader.option(k, v)
        raw = reader.text(path).select(F.col("value").alias("body"))

    parsed = raw.select(
        F.from_json(F.col("body"), PUBLISHED_EVENT_SCHEMA).alias("e"), "body"
    )
    return parsed.select(
        F.coalesce(F.col("e.id"), F.expr("uuid()")).alias("event_id"),
        F.col("e.tenant_id").alias("tenant_id"),
        F.col("e.destination_id").alias("destination_id"),
        F.col("e.topic").alias("topic"),
        F.coalesce(F.col("e.eligible_for_retry"), F.lit(True)).alias(
            "eligible_for_retry"
        ),
        F.coalesce(F.to_timestamp(F.col("e.time")), F.current_timestamp()).alias(
            "event_time"
        ),
        F.coalesce(
            F.col("e.metadata"), F.create_map().cast("map<string,string>")
        ).alias("metadata"),
        F.col("e.data").alias("data"),
    )


def write_task_stream(
    df: DataFrame, url: str, checkpoint_path: str, *, trigger_seconds: int | None = None
):
    """DeliveryTask/operator-event stream -> queue sink (S6, partial scope).

    Rows are serialized to one JSON message each (the mqs codec shape,
    models/tasks.go:45-57).  ``kafka://`` writes to the URL's topic;
    ``file://`` appends JSON files (testing/replay).  Returns the
    StreamingQuery.  Per BASELINE.json the other nine provider sinks are
    out of primary scope — they would be additional ``format(...)``
    connectors behind this same URL surface.
    """
    fmt, opts = parse_queue_url(url)
    body = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    if fmt == "kafka":
        topic = opts.pop("subscribe")
        writer = (
            body.writeStream.format("kafka")
            .options(**opts)
            .option("topic", topic)
        )
    else:
        path = opts.pop("path")
        writer = body.writeStream.format("json").option("path", path)
        for k, v in opts.items():
            writer = writer.option(k, v)
    writer = writer.option("checkpointLocation", checkpoint_path)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def validate_publish(
    events: DataFrame, *, valid_topics: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Ingest validation → (valid, rejected) split.

    Pinned rules (publish_handlers.go:43-53, publishmq/messagehandler.go:32-37,
    eventhandler.go:71-75): tenant_id required; data must be a JSON *object*
    (arrays/scalars rejected); topic must be in the configured topic set
    when one is configured.  Both outputs are lazy filters over the same
    plan — usable on batch and streaming frames alike.
    """
    data = F.col("data")
    # from_json with a struct schema yields null for arrays/scalars/invalid
    # JSON but a (possibly empty) struct for any JSON object
    is_object = data.isNull() | (
        F.from_json(data, "__probe string").isNotNull() & data.rlike(r"^\s*\{")
    )
    ok = F.col("tenant_id").isNotNull() & is_object
    if valid_topics:
        ok = ok & F.col("topic").isin(valid_topics)
    flagged = events.withColumn("__valid", ok)
    valid = flagged.filter(F.col("__valid")).drop("__valid")
    rejected = flagged.filter(~F.col("__valid")).drop("__valid")
    return valid, rejected
