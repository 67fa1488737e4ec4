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
- Delivery story at scale: checkpointed offsets + per-batch commit
  markers + deterministic batch dedup by attempt_id give effective
  exactly-once for clean replays; a crash between append and marker can
  still duplicate one batch (see make_log_sink), which read-side dedup
  hides — the same eventual-dedup contract as the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from outpost_spark.logstore.insert import insert_many
from outpost_spark.routing.match import match_pairs


def route_stream(
    events_stream: DataFrame,
    destinations: DataFrame,
    *,
    filter_mode: str = "compiled_static",
) -> DataFrame:
    """Streaming routing: event stream -> DeliveryTask stream.

    Uses the aggregation-free pair join (stream-static broadcast), one task
    row per (event, matched destination), attempt=1 (tasks.go:37-43).
    The batch-only ``match_events`` array-stamping shape needs an
    aggregation and is not used on streams.

    Streaming default is ``compiled_static`` — zero Python in the hot
    path when every filter doc compiles (the reference's MatchEvent is
    likewise native per-event work, redistenantstore.go:645-667);
    uncompilable docs still interpret via the pandas UDF.  The trade:
    filter docs are compiled once at stream plan time, so a doc ADDED or
    EDITED after the stream starts will not match until restart even
    though the stream-static join re-resolves destination ROWS per batch.
    Deployments that hot-edit filters use :func:`make_routing_sink`
    (per-batch recompile, same zero-Python plan, no staleness) or
    ``filter_mode="compiled"`` (row-wise interpreter fallback, pays an
    Arrow round-trip per pair).
    """
    pairs = match_pairs(events_stream, destinations, filter_mode=filter_mode)
    return pairs.withColumn("attempt", F.lit(1)).withColumn("manual", F.lit(False))


def make_routing_sink(load_destinations, process):
    """foreachBatch routing with per-batch filter compilation.

    ``load_destinations(spark) -> DataFrame`` re-reads the destinations
    snapshot each micro-batch; ``process(routed_df, batch_id)`` consumes
    the routed DeliveryTask rows.  Because compilation happens inside the
    batch against the batch's own snapshot, this gets compiled_static's
    zero-Python plan AND picks up filter edits with no restart — the
    per-batch recompile is a driver-side collect of a small broadcast
    dimension plus Column construction, microseconds against a
    micro-batch's runtime.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dests = load_destinations(batch_df.sparkSession)
        routed = (
            match_pairs(batch_df, dests, filter_mode="compiled_static")
            .withColumn("attempt", F.lit(1))
            .withColumn("manual", F.lit(False))
        )
        process(routed, batch_id)

    return _sink


def make_log_sink(
    events_path: str,
    attempts_path: str,
    commits_path: str,
    *,
    storage: str = "parquet",
):
    """Build the idempotent-replay foreachBatch sink function.

    ``storage="txn"`` upgrades the contract to EXACTLY-ONCE per table:
    the batch lands as one atomic transaction-log commit that carries
    its own (appId, batch_id) writer-transaction record (Delta
    txnAppId/txnVersion analog, logstore/txntable.py), so a replayed
    micro-batch is a structural no-op — no marker files, and the
    duplicate-row crash window described below does not exist because
    the data and its replay marker are the same atomic commit.

    foreachBatch gives at-least-once: after a crash between the parquet
    append and the offset commit, the same batch_id is replayed and a
    plain append would duplicate it.  The sink writes a marker file per
    committed batch_id; a replayed batch_id whose marker exists is skipped.

    Durability contract (honest version): the marker is written AFTER the
    append and the two are not atomic on plain parquet — a crash inside
    that window replays the batch and duplicates its rows.  This matches
    the reference's architecture, which also tolerates duplicate rows
    (ReplacingMergeTree + fetchAndDedup read-side dedup,
    chlogstore.go:57-112); the list path's read-side dedup and the
    default exact-distinct metrics hide them until compaction.  True
    atomic commit needs a transactional table format (Delta
    txnAppId/txnVersion) — the marker protocol narrows the window to one
    tiny file write and keeps replays no-ops in the common case.

    Markers live on the CHECKPOINT filesystem (Hadoop FS API, any scheme
    Spark can reach — HDFS/S3/ABFS), not the driver's local disk, so they
    survive driver fail-over onto another node.
    """

    if storage == "txn":

        def _txn_sink(batch_df: DataFrame, batch_id: int) -> None:
            insert_many(
                batch_df,
                events_path,
                attempts_path,
                storage="txn",
                app_txn=("logsink", batch_id),
            )

        return _txn_sink

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(f"{commits_path}/batch-{batch_id}")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            return  # replay of an already-committed micro-batch (ST1)
        insert_many(batch_df, events_path, attempts_path)
        out = fs.create(hpath, False)  # atomic create, no overwrite
        try:
            out.write(bytearray(b"committed"))
        finally:
            out.close()

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


def windowed_attempt_counts(
    attempts_stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "attempt_time",
    dims: tuple[str, ...] = (),
    approx_rsd: float = 0.05,
):
    """Streaming pre-aggregation: event-time windowed attempt counts with
    late-data handling — the rollup a dashboard tails instead of
    re-scanning the fact table.

    ``withWatermark(time_col, watermark)`` bounds state: a window's
    aggregate is emitted (append mode) once the watermark passes its end,
    and rows arriving later than the watermark are DROPPED — the
    documented late-data contract; the batch metrics engine over the fact
    table remains the exact source of truth for backfills.  Out-of-order
    rows WITHIN the watermark are aggregated correctly.

    Distinct attempt counts use HLL sketches (``approx_count_distinct``)
    — exact distinct over append-mode streaming windows would require
    keeping every id in state; the sketch keeps state fixed-size per
    window x dims, the same trade the batch engine's ``approx_distinct``
    mode makes.  Output: window start/end, dims, rows, approx_attempts,
    failed_rows.
    """
    w = F.window(F.col(time_col), window)
    return (
        attempts_stream.withWatermark(time_col, watermark)
        .groupBy(w.alias("__w"), *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.approx_count_distinct("attempt_id", approx_rsd).alias("approx_attempts"),
            F.count(F.when(F.col("status") == "failed", F.lit(1))).alias("failed_rows"),
        )
        .select(
            F.col("__w.start").alias("bucket_start"),
            F.col("__w.end").alias("bucket_end"),
            *[F.col(d) for d in dims],
            "rows",
            "approx_attempts",
            "failed_rows",
        )
    )
