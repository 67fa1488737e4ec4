"""Retry timer queue (ST2) as a stateful streaming operator.

Reference semantics (internal/scheduler/scheduler.go:144-290, forked-rsmq
delayed queue; internal/deliverymq/retry.go:25-138,
messagehandler.go:199-272):
- one pending retry per RetryID = (event_id, destination_id)
  (tasks.go:70-72);
- scheduling is an **upsert**: re-scheduling replaces both timing and
  payload (a manual retry overrides a pending automatic one);
- a successful delivery cancels the pending retry;
- retry n fires after ``backoff.duration(attempt_number - 1)``;
- attempts beyond retry_max_limit schedule nothing (exhausted —
  messagehandler.go:354-364);
- messages re-delivered more than max_receive_count times go to a DLQ
  instead of firing again (scheduler.go:196-203).

Layers:
- :class:`RetryScheduler` — pure-Python core with a virtual clock: the
  executable spec for upsert/cancel/fire/DLQ semantics.
- :func:`retry_processor_factory` — StatefulProcessor keyed by
  (event_id, destination_id) using **registered processing-time timers**:
  timer re-registration implements the upsert; state deletion implements
  cancel.  RetryTask rows are emitted when timers expire, to be re-joined
  with the log store (J4 latest-attempt lookup) and fed back to delivery.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from outpost_spark.functions.backoff import DEFAULT_RETRY_MAX_LIMIT, ExponentialBackoff
from outpost_spark.streaming.state_table import VersionedStateTable

RETRY_OUTPUT_SCHEMA = (
    "event_id string, destination_id string, tenant_id string, "
    "attempt_number int, fire_at double, dlq boolean"
)


@dataclass
class RetryScheduler:
    """Pure timer-queue semantics with a virtual clock (unit-testable)."""

    backoff: ExponentialBackoff = field(default_factory=ExponentialBackoff)
    retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT
    max_receive_count: int = 5

    def __post_init__(self):
        # retry_id -> {fire_at, tenant_id, attempt_number, receive_count}
        self.pending: dict[tuple[str, str], dict] = {}
        self.dlq: list[dict] = []

    @staticmethod
    def retry_id(event_id: str, destination_id: str) -> tuple[str, str]:
        return (event_id, destination_id)

    def on_attempt(
        self,
        *,
        event_id: str,
        destination_id: str,
        tenant_id: str,
        attempt_number: int,
        success: bool,
        eligible_for_retry: bool,
        now: float,
        manual: bool = False,
    ) -> None:
        """Delivery outcome -> schedule/cancel (messagehandler.go:199-272).

        Failure schedules retry attempt_number+1 at
        now + backoff(attempt_number - 1); the write is an upsert — any
        pending entry for the same (event, destination) is replaced
        (manual retries override pending automatic ones).  Success cancels.
        """
        rid = self.retry_id(event_id, destination_id)
        if success:
            self.pending.pop(rid, None)  # cancel-on-success (:237-271)
            return
        if not eligible_for_retry:
            return
        if attempt_number > self.retry_max_limit:
            self.pending.pop(rid, None)  # exhausted — nothing further
            return
        delay = self.backoff.duration(max(attempt_number - 1, 0))
        self.pending[rid] = {
            "tenant_id": tenant_id,
            "attempt_number": attempt_number + 1,
            "fire_at": now + delay,
            "receive_count": self.pending.get(rid, {}).get("receive_count", 0),
        }

    def fire_due(self, now: float) -> list[dict]:
        """Pop and return every retry task whose timer has expired.

        Each fire counts as a receive; a message received more than
        ``max_receive_count`` times is diverted to the DLQ
        (scheduler.go:196-203) and flagged ``dlq=True``.
        """
        fired = []
        for rid in sorted(k for k, v in self.pending.items() if v["fire_at"] <= now):
            entry = self.pending.pop(rid)
            rc = entry["receive_count"] + 1
            task = {
                "event_id": rid[0],
                "destination_id": rid[1],
                "tenant_id": entry["tenant_id"],
                "attempt_number": entry["attempt_number"],
                "fire_at": entry["fire_at"],
                "receive_count": rc,
                "dlq": rc > self.max_receive_count,
            }
            if task["dlq"]:
                self.dlq.append(task)
            fired.append(task)
        return fired

    def requeue(self, task: dict, now: float) -> None:
        """Processing failed after a fire: the message returns to the queue
        keeping its receive count (so repeated failures hit the DLQ cap)."""
        rid = self.retry_id(task["event_id"], task["destination_id"])
        self.pending[rid] = {
            "tenant_id": task["tenant_id"],
            "attempt_number": task["attempt_number"],
            "fire_at": now,
            "receive_count": task["receive_count"],
        }


RETRY_STATE_SCHEMA = (
    "event_id string, destination_id string, tenant_id string, "
    "attempt_number int, fire_at double, receive_count int"
)


class RetryStateTable(VersionedStateTable):
    """Batched retry-timer state: the scale path for ST2.

    The per-key stateful APIs (``transformWithStateInPandas`` /
    ``applyInPandasWithState``) invoke Python once PER KEY with a tiny
    pandas frame — ~2.5k outcomes/s at local[32], pandas overhead, not
    I/O.  This class keeps the same upsert/cancel/fire/DLQ semantics
    (reference: internal/scheduler/scheduler.go:144-290 delayed queue,
    internal/deliverymq/retry.go:25-138) but applies each micro-batch
    as ONE set-oriented plan, entirely JVM-side:

    1. latest outcome per (event_id, destination_id) — ``max_by`` over
       (attempt_number, status), so the highest attempt governs exactly
       like the sequential fold (ties prefer 'success': cancel wins);
    2. full-outer MERGE with the pending-state table: eligible failures
       upsert (attempt+1 at now + backoff(attempt-1), receive_count
       carried over), successes / exhausted cancel, ineligible failures
       are no-ops (dropped before the reduction — the pending timer
       survives, matching RetryScheduler.on_attempt's early return);
    3. FIRE the due slice (fire_at <= now): each fire counts a receive,
       receive_count > max_receive_count diverts to DLQ
       (scheduler.go:196-203); fired entries leave the state.

    State lives as a versioned parquet table ``{path}/v=<batch_id>``
    through the :mod:`logstore.tablefs` seam (local/hdfs/s3 alike);
    fired tasks land durably under ``{path}/fired/v=<batch_id>``.  A
    re-run of batch N re-reads v=N-1 and overwrites v=N — foreachBatch
    crash-recovery is deterministic and idempotent.  Scale: both the
    merge join and the fire scan shuffle on the state key; state I/O is
    O(pending) parquet per batch, partitioned by the same key hash, so
    a 1000-executor cluster merges co-located — no driver loop, no
    per-key Python anywhere.

    Use :func:`retry_foreach_batch` to wire it under
    ``attempts.writeStream.foreachBatch(...)``.
    """

    aux_outputs = ("fired",)

    def __init__(
        self,
        spark,
        path: str,
        *,
        backoff: ExponentialBackoff | None = None,
        retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT,
        max_receive_count: int = 5,
        keep_versions: int = 3,
    ):
        super().__init__(
            spark,
            path,
            state_schema=RETRY_STATE_SCHEMA,
            keep_versions=keep_versions,
        )
        self.backoff = backoff or ExponentialBackoff()
        self.retry_max_limit = retry_max_limit
        self.max_receive_count = max_receive_count

    # ---- the batch transition ---------------------------------------------
    def apply_outcomes(
        self, batch_df, batch_id: int, now: float, requeue_df=None
    ):
        """One micro-batch of attempt outcomes -> fired RetryTask frame.

        ``batch_df`` needs (event_id, destination_id, tenant_id, status,
        attempt_number, eligible_for_retry).  Pass ``batch_df=None`` to
        tick the clock only (fire due timers with no new outcomes).

        ``requeue_df`` (optional) returns previously-FIRED tasks whose
        processing failed downstream — RetryScheduler.requeue: they
        rejoin the queue due immediately, KEEPING their receive_count so
        repeated fire-and-fail loops hit the DLQ cap.  Columns: the
        fired-frame shape (event_id, destination_id, tenant_id,
        attempt_number, receive_count).  New outcomes in the same batch
        upsert OVER a requeued entry (the outcome is newer
        information)."""
        from pyspark.sql import functions as F

        from outpost_spark.functions.backoff import backoff_delay_col

        old = self.state_before(batch_id)
        if requeue_df is not None:
            rq = requeue_df.select(
                "event_id",
                "destination_id",
                "tenant_id",
                F.col("attempt_number").cast("int"),
                F.lit(float(now)).alias("fire_at"),
                F.col("receive_count").cast("int"),
            )
            old = old.join(
                rq.select("event_id", "destination_id"),
                on=["event_id", "destination_id"],
                how="left_anti",
            ).unionByName(rq)
        if batch_df is not None:
            # RetryScheduler.on_attempt treats an INELIGIBLE failure as a
            # no-op (checked before the exhausted test: the pending timer
            # survives, nothing is scheduled).  Dropping those rows BEFORE
            # the per-key reduction reproduces the sequential fold exactly:
            # a key whose batch outcomes are all ineligible produces no
            # update row, so the merge keeps its state untouched; a key
            # with mixed outcomes is governed by its latest ACTIONABLE
            # outcome, just as the fold would end on it.
            actionable = batch_df.where(
                (F.col("status") == "success") | F.col("eligible_for_retry")
            )
            latest = (
                actionable.groupBy("event_id", "destination_id")
                .agg(
                    F.max_by(
                        F.struct(
                            "tenant_id",
                            "attempt_number",
                            "status",
                            "eligible_for_retry",
                        ),
                        F.struct(F.col("attempt_number"), F.col("status")),
                    ).alias("o")
                )
                .select("event_id", "destination_id", "o.*")
                # success cancels; an eligible attempt beyond the limit
                # is exhausted and cancels; otherwise upsert.
                .withColumn(
                    "cancel",
                    (F.col("status") == "success")
                    | (F.col("attempt_number") > F.lit(self.retry_max_limit)),
                )
            )
            j = old.alias("s").join(
                latest.alias("u"),
                on=["event_id", "destination_id"],
                how="full_outer",
            )
            upd = F.col("u.status").isNotNull()
            apply_u = upd & ~F.col("u.cancel")
            delay = backoff_delay_col(
                self.backoff,
                F.greatest(F.col("u.attempt_number") - 1, F.lit(0)),
            )
            merged = j.where(
                (~upd & F.col("s.attempt_number").isNotNull()) | apply_u
            ).select(
                "event_id",
                "destination_id",
                F.when(apply_u, F.col("u.tenant_id"))
                .otherwise(F.col("s.tenant_id"))
                .alias("tenant_id"),
                F.when(apply_u, F.col("u.attempt_number") + 1)
                .otherwise(F.col("s.attempt_number"))
                .cast("int")
                .alias("attempt_number"),
                F.when(apply_u, F.lit(float(now)) + delay)
                .otherwise(F.col("s.fire_at"))
                .cast("double")
                .alias("fire_at"),
                F.coalesce(F.col("s.receive_count"), F.lit(0))
                .cast("int")
                .alias("receive_count"),
            )
        else:
            merged = old

        due = F.col("fire_at") <= F.lit(float(now))
        fired = merged.where(due).select(
            "event_id",
            "destination_id",
            "tenant_id",
            "attempt_number",
            "fire_at",
            (F.col("receive_count") + 1).cast("int").alias("receive_count"),
            (F.col("receive_count") + 1 > F.lit(self.max_receive_count)).alias(
                "dlq"
            ),
        )
        fired_path = self.fs.join(self.path, f"fired/v={batch_id}")
        state_path = self.fs.join(self.path, f"v={batch_id}")
        # fired first, then the state claim: a crash between the two
        # re-runs the batch against v=N-1 and overwrites both outputs
        # deterministically (overwrite mode), so recovery is exact
        fired.write.mode("overwrite").parquet(fired_path)
        merged.where(~due).write.mode("overwrite").parquet(state_path)
        self._cleanup(batch_id)
        return self.spark.read.parquet(fired_path)


def retry_foreach_batch(
    spark,
    state_path: str,
    sink,
    *,
    backoff: ExponentialBackoff | None = None,
    retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT,
    max_receive_count: int = 5,
    now_fn=None,
):
    """foreachBatch adapter for :class:`RetryStateTable`: wire the raw
    attempt-outcome stream straight in —
    ``attempts.writeStream.foreachBatch(retry_foreach_batch(spark, path,
    sink)).start()`` — and ``sink(fired_df, batch_id)`` receives each
    batch's fired RetryTask frame (schema RETRY_STATE_SCHEMA + dlq)."""
    import time as _time

    table = RetryStateTable(
        spark,
        state_path,
        backoff=backoff,
        retry_max_limit=retry_max_limit,
        max_receive_count=max_receive_count,
    )

    def fn(batch_df, batch_id: int):
        now = now_fn() if now_fn is not None else _time.time()
        fired = table.apply_outcomes(batch_df, int(batch_id), now)
        sink(fired, int(batch_id))

    return fn


def retry_stream(
    outcomes_stream,
    state_path: str,
    sink,
    *,
    checkpoint: str,
    backoff: ExponentialBackoff | None = None,
    retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT,
    max_receive_count: int = 5,
    tick_rows_per_second: int = 1,
    trigger_interval: str = "1 second",
    now_fn=None,
):
    """Start the batched retry queue with a WALL-CLOCK tick source.

    ``foreachBatch`` alone only evaluates due timers when a micro-batch
    of outcomes arrives — on an idle attempt stream a due retry would
    wait for the next delivery.  The reference's scheduler is a poll
    loop that fires on TIME (internal/scheduler/scheduler.go:144-164,
    ~1 s resolution), so this adapter unions a ``rate`` tick stream
    (``tick_rows_per_second`` rows every second, nothing but a clock
    pulse) into the outcome stream before ``foreachBatch``: every
    trigger interval produces a non-empty micro-batch, tick rows are
    stripped inside the batch function, and the due slice fires against
    the real clock whether or not any outcome arrived.  Due-timer
    latency is therefore bounded by ``trigger_interval`` (+ batch
    runtime), matching the reference's poll resolution.

    ``outcomes_stream`` needs the outcome columns (event_id,
    destination_id, tenant_id, status, attempt_number,
    eligible_for_retry); extra columns are dropped.  ``sink(fired_df,
    batch_id)`` receives each batch's fired RetryTask frame exactly as
    with :func:`retry_foreach_batch`.  Returns the started
    StreamingQuery.

    Scale: the tick source adds ``tick_rows_per_second`` rows per
    trigger per QUERY (not per partition) — noise next to any real
    attempt volume; the per-batch state merge is unchanged.
    """
    import time as _time

    from pyspark.sql import functions as F

    spark = outcomes_stream.sparkSession
    table = RetryStateTable(
        spark,
        state_path,
        backoff=backoff,
        retry_max_limit=retry_max_limit,
        max_receive_count=max_receive_count,
    )
    outcome_cols = [
        "event_id",
        "destination_id",
        "tenant_id",
        "status",
        "attempt_number",
        "eligible_for_retry",
    ]
    data = outcomes_stream.select(
        F.col("event_id").cast("string"),
        F.col("destination_id").cast("string"),
        F.col("tenant_id").cast("string"),
        F.col("status").cast("string"),
        F.col("attempt_number").cast("int"),
        F.col("eligible_for_retry").cast("boolean"),
        F.lit(False).alias("__tick__"),
    )
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", int(tick_rows_per_second))
        .load()
        .select(
            F.lit(None).cast("string").alias("event_id"),
            F.lit(None).cast("string").alias("destination_id"),
            F.lit(None).cast("string").alias("tenant_id"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("int").alias("attempt_number"),
            F.lit(None).cast("boolean").alias("eligible_for_retry"),
            F.lit(True).alias("__tick__"),
        )
    )

    def fn(batch_df, batch_id: int):
        now = now_fn() if now_fn is not None else _time.time()
        outcomes = batch_df.where(~F.col("__tick__")).select(*outcome_cols)
        fired = table.apply_outcomes(outcomes, int(batch_id), now)
        sink(fired, int(batch_id))

    return (
        data.unionByName(ticks)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger_interval)
        .start()
    )


def retry_processor_factory(
    backoff: ExponentialBackoff | None = None,
    retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT,
):
    """StatefulProcessor: attempt outcomes in, RetryTask rows out on timer.

    Keyed by (event_id, destination_id).  Upsert = ``deleteTimer`` +
    ``registerTimer`` + state overwrite; cancel = ``clear`` + deleteTimer.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    bo = backoff or ExponentialBackoff()

    state_schema = StructType(
        [
            StructField("tenant_id", StringType(), True),
            StructField("attempt_number", IntegerType(), True),
            StructField("fire_at", DoubleType(), True),
        ]
    )

    class RetryProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("pending_retry", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            now_ms = timerValues.getCurrentProcessingTimeInMs()
            # Within a micro-batch, apply outcomes in attempt order — the
            # latest attempt governs the retry state regardless of the
            # post-shuffle row order inside the group.
            collected = [r for pdf in rows for r in pdf.itertuples(index=False)]
            collected.sort(key=lambda r: int(r.attempt_number))
            for r in collected:
                success = r.status == "success"
                if self.state.exists():
                    old = self.state.get()
                    if old is not None:
                        for t in self.handle.listTimers():
                            self.handle.deleteTimer(t)
                if success or not bool(r.eligible_for_retry):
                    self.state.clear()
                    continue
                n = int(r.attempt_number)
                if n > retry_max_limit:
                    self.state.clear()
                    continue
                delay_ms = int(bo.duration(max(n - 1, 0)) * 1000)
                fire_at = now_ms + delay_ms
                self.state.update((str(r.tenant_id), n + 1, float(fire_at)))
                self.handle.registerTimer(fire_at)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator["pd.DataFrame"]:
            if not self.state.exists():
                return iter(())
            tenant_id, attempt_number, fire_at = self.state.get()
            self.state.clear()
            return iter(
                [
                    pd.DataFrame(
                        [
                            {
                                "event_id": key[0],
                                "destination_id": key[1],
                                "tenant_id": tenant_id,
                                "attempt_number": int(attempt_number),
                                "fire_at": float(fire_at),
                                "dlq": False,
                            }
                        ]
                    )
                ]
            )

        def close(self) -> None:
            pass

    return RetryProcessor


def attach_retry_stream(
    attempts_stream,
    backoff: ExponentialBackoff | None = None,
    retry_max_limit: int = DEFAULT_RETRY_MAX_LIMIT,
    *,
    impl: str = "auto",
):
    """attempt outcomes -> RetryTask stream via processing-time timers.

    ``impl='tws'`` = transformWithStateInPandas registered timers;
    ``impl='apws'`` = applyInPandasWithState with ProcessingTimeTimeout
    (timeout fires the pending retry).  Same upsert/cancel semantics.
    """
    if impl == "auto":
        try:
            from google.protobuf import descriptor  # noqa: F401

            impl = "tws"
        except Exception:
            impl = "apws"
    if impl == "tws":
        processor_cls = retry_processor_factory(backoff, retry_max_limit)
        return attempts_stream.groupBy("event_id", "destination_id").transformWithStateInPandas(
            statefulProcessor=processor_cls(),
            outputStructType=RETRY_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="ProcessingTime",
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bo = backoff or ExponentialBackoff()
    state_schema = "tenant_id string, attempt_number int, fire_at double"

    def func(key, pdfs, state: GroupState):
        event_id, destination_id = key
        if state.hasTimedOut:
            # pending retry fires: emit the task, clear state (ST2 fire path)
            tenant_id, attempt_number, fire_at = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "event_id": event_id,
                        "destination_id": destination_id,
                        "tenant_id": tenant_id,
                        "attempt_number": int(attempt_number),
                        "fire_at": float(fire_at),
                        "dlq": False,
                    }
                ]
            )
            return
        now_ms = state.getCurrentProcessingTimeMs()
        pending = None
        # apply outcomes in attempt order — the latest attempt governs the
        # retry state regardless of post-shuffle row order inside the group
        collected = [r for pdf in pdfs for r in pdf.itertuples(index=False)]
        collected.sort(key=lambda r: int(r.attempt_number))
        for r in collected:
            if r.status == "success" or not bool(r.eligible_for_retry):
                pending = None  # cancel-on-success
                continue
            n = int(r.attempt_number)
            if n > retry_max_limit:
                pending = None  # exhausted
                continue
            delay_ms = int(bo.duration(max(n - 1, 0)) * 1000)
            # upsert: latest outcome replaces any pending schedule
            pending = (str(r.tenant_id), n + 1, float(now_ms + delay_ms))
        if pending is None:
            if state.exists:
                state.remove()
        else:
            state.update(pending)
            # ProcessingTimeTimeout takes a duration-from-now; re-setting it
            # on every upsert IS the timer re-registration semantics
            state.setTimeoutDuration(max(int(pending[2]) - now_ms, 1))

    return attempts_stream.groupBy("event_id", "destination_id").applyInPandasWithState(
        func, RETRY_OUTPUT_SCHEMA, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )
