"""The streaming pipeline: ingest -> route -> (deliver) -> log store.

Mirrors §3.2 of the survey (publish -> fan-out -> delivery -> log):
- Routing is the SAME plan as batch (routing/match.py) lifted to
  ``readStream`` — a stream-static broadcast join against the destinations
  dimension.  Spark re-resolves the static side per micro-batch, so
  destination updates are picked up without restarts.
- The log sink is ``foreachBatch`` -> :func:`insert_many`: Structured
  Streaming's micro-batching replaces the reference's count/delay
  batcher (logmq/batchprocessor.go:96-130); ``dropDuplicates`` inside the
  insert gives idempotent replays (ST1's Redis gate becomes checkpoint +
  write-side dedup).
- Exactly-once story at scale: checkpointed offsets + deterministic
  batch dedup by attempt_id; the parquet/Delta append is the only side
  effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from outpost_spark.logstore.insert import insert_many
from outpost_spark.routing.match import match_pairs


def route_stream(events_stream: DataFrame, destinations: DataFrame) -> DataFrame:
    """Streaming routing: event stream -> DeliveryTask stream.

    Uses the aggregation-free pair join (stream-static broadcast), one task
    row per (event, matched destination), attempt=1 (tasks.go:37-43).
    The batch-only ``match_events`` array-stamping shape needs an
    aggregation and is not used on streams.
    """
    pairs = match_pairs(events_stream, destinations)
    return pairs.withColumn("attempt", F.lit(1)).withColumn("manual", F.lit(False))


def write_log_stream(
    entries_stream: DataFrame,
    events_path: str,
    attempts_path: str,
    checkpoint_path: str,
    *,
    trigger_seconds: int | None = None,
):
    """LogEntry stream -> the two month-partitioned tables via foreachBatch.

    Returns the StreamingQuery.  Each micro-batch runs the S5 InsertMany
    semantics (dedupe by attempt_id, event rows for attempt_number <= 1).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        insert_many(batch_df, events_path, attempts_path)

    writer = entries_stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
