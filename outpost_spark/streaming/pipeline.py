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


def make_log_sink(events_path: str, attempts_path: str, commits_path: str):
    """Build the idempotent foreachBatch sink function (exactly-once).

    foreachBatch gives at-least-once: after a crash between the parquet
    append and the offset commit, the same batch_id is replayed and a
    plain append would duplicate it.  The sink writes a marker file per
    committed batch_id (the parquet append itself is the transaction
    payload, the marker is the commit record — same idea as Delta's
    txn-version dedup for idempotent writes); a replayed batch_id is
    skipped entirely.  Markers are tiny and pruned with the checkpoint.
    """
    import os

    os.makedirs(commits_path, exist_ok=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(commits_path, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of an already-committed micro-batch (ST1)
        insert_many(batch_df, events_path, attempts_path)
        with open(marker, "w") as f:
            f.write("committed")

    return _sink


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
    semantics (dedupe by attempt_id, event rows for attempt_number <= 1)
    through the idempotent sink (replayed batch ids are no-ops).
    """
    import os

    sink = make_log_sink(
        events_path, attempts_path, os.path.join(checkpoint_path, "_committed")
    )
    writer = entries_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
