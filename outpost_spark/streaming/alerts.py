"""Consecutive-failure alerting (ST3/ST4) as a stateful streaming operator.

Reference semantics (internal/alert/evaluator.go:119-157, store.go:23-66):
- keyed by (tenant_id, destination_id);
- success resets the consecutive-failure count;
- failure increments it, idempotently per attempt_id (the reference stores
  a Redis SET of attempt ids; SCARD is the count — replays never
  double-count);
- crossing a percentage threshold of the auto-disable count emits a
  signal; 100% uses >= and triggers auto-disable;
- independently, a failed attempt with attempt_number > retry_max_limit
  and eligible_for_retry emits a retries-exhausted signal, suppressed to
  one per destination per window (logmq/batchprocessor.go:55-94);
- state expires after 24h idle (alertKeyTTL — store.go:15).

Two layers:
- :class:`AlertStateMachine` — pure-Python core, unit-testable, shared by
  the streaming processor.  This is the executable spec.
- :func:`alert_processor_factory` — wraps it in a ``StatefulProcessor`` for
  ``transformWithStateInPandas``, keyed by (tenant_id, destination_id),
  with a 24h state TTL.  At scale, state lives in the RocksDB state store,
  partitioned by key — no external Redis needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from outpost_spark.functions.backoff import should_alert, threshold_failure_counts

DEFAULT_THRESHOLDS = [50, 70, 90, 100]  # evaluator.go:98
MAX_TRACKED_ATTEMPT_IDS = 10_000  # bounds state growth per destination

ALERT_OUTPUT_SCHEMA = (
    "tenant_id string, destination_id string, signal string, "
    "failures int, max_failures int, level int, attempt_id string"
)


@dataclass
class AlertStateMachine:
    """Pure consecutive-failure evaluator (mirrors Evaluator.Evaluate).

    ``exhausted_window_seconds`` is the ST4 suppression window: at most one
    exhausted-retries alert per destination within the window, regardless
    of which events exhaust; 0 means alert on every exhaustion
    (services/builder.go:378-388).
    """

    auto_disable_failure_count: int = 20
    thresholds: list[int] = field(default_factory=lambda: list(DEFAULT_THRESHOLDS))
    retry_max_limit: int = 10
    consecutive_failure_enabled: bool = True
    exhausted_retries_enabled: bool = True
    exhausted_window_seconds: float = 0.0

    def __post_init__(self):
        self.pairs = threshold_failure_counts(
            self.thresholds, self.auto_disable_failure_count
        )

    def exhausted_suppressed(
        self, now: float, last_exhausted_at: float | None
    ) -> bool:
        """Inside the per-destination suppression window?"""
        return (
            self.exhausted_window_seconds > 0
            and last_exhausted_at is not None
            and (now - last_exhausted_at) < self.exhausted_window_seconds
        )

    def evaluate(
        self,
        seen_attempt_ids: set[str],
        *,
        attempt_id: str,
        success: bool,
        attempt_number: int = 1,
        eligible_for_retry: bool = True,
        now: float = 0.0,
        last_exhausted_at: float | None = None,
    ) -> tuple[set[str], list[dict]]:
        """One attempt outcome -> (new seen-id set, emitted signals).

        The seen-id set IS the consecutive-failure count (its cardinality),
        exactly like the reference's Redis SET.  The caller tracks
        ``last_exhausted_at`` per key and refreshes it whenever an
        ``alert.attempt.exhausted_retries`` signal is emitted.
        """
        signals: list[dict] = []
        if success:
            if self.consecutive_failure_enabled:
                seen_attempt_ids = set()
            return seen_attempt_ids, signals

        if self.consecutive_failure_enabled:
            if len(seen_attempt_ids) < MAX_TRACKED_ATTEMPT_IDS:
                seen_attempt_ids = seen_attempt_ids | {attempt_id}
            count = len(seen_attempt_ids)
            level, crossed = should_alert(self.pairs, count)
            if crossed:
                signals.append(
                    {
                        "signal": (
                            "alert.destination.disabled"
                            if level == 100
                            else "alert.destination.consecutive_failure"
                        ),
                        "failures": count,
                        "max_failures": self.auto_disable_failure_count,
                        "level": level,
                        "attempt_id": attempt_id,
                    }
                )
        if (
            self.exhausted_retries_enabled
            and self.retry_max_limit > 0
            and eligible_for_retry
            and attempt_number > self.retry_max_limit
            and not self.exhausted_suppressed(now, last_exhausted_at)
        ):
            signals.append(
                {
                    "signal": "alert.attempt.exhausted_retries",
                    "failures": len(seen_attempt_ids),
                    "max_failures": self.auto_disable_failure_count,
                    "level": 0,
                    "attempt_id": attempt_id,
                }
            )
        return seen_attempt_ids, signals


def alert_processor_factory(machine: AlertStateMachine):
    """Build a StatefulProcessor class driving ``machine`` per key.

    Input rows (grouped by tenant_id, destination_id): attempt_id, status,
    attempt_number, eligible_for_retry.  Output: ALERT_OUTPUT_SCHEMA rows.
    """
    import time as _time

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    state_schema = StructType(
        [
            StructField("ids", StringType(), True),
            StructField("last_exhausted", DoubleType(), True),
        ]
    )

    class AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("cf_ids", state_schema, ttlDurationMs=24 * 3600 * 1000)

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            tenant_id, destination_id = key[0], key[1]
            seen: set[str] = set()
            last_exhausted = None
            if self.state.exists():
                stored, last_exhausted = self.state.get()
                if stored:
                    seen = set(stored.split("\x00"))
            now = _time.time()
            out = []
            for pdf in rows:
                # arrival order within a batch is preserved per key
                for r in pdf.itertuples(index=False):
                    seen, signals = machine.evaluate(
                        seen,
                        attempt_id=str(r.attempt_id),
                        success=(r.status == "success"),
                        attempt_number=int(r.attempt_number),
                        eligible_for_retry=bool(r.eligible_for_retry),
                        now=now,
                        last_exhausted_at=last_exhausted,
                    )
                    for s in signals:
                        if s["signal"] == "alert.attempt.exhausted_retries":
                            last_exhausted = now  # refresh suppression window
                        out.append(
                            {
                                "tenant_id": tenant_id,
                                "destination_id": destination_id,
                                **s,
                            }
                        )
            self.state.update(("\x00".join(sorted(seen)), last_exhausted))
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return AlertProcessor


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def attach_alert_stream(attempts_stream, machine: AlertStateMachine, *, impl: str = "auto"):
    """attempts stream -> alert signal stream.

    ``impl='tws'`` uses ``transformWithStateInPandas`` (RocksDB-backed
    value state + TTL — the scale path); ``impl='apws'`` uses
    ``applyInPandasWithState`` (GroupState — no protobuf dependency).
    ``'auto'`` picks tws when the python protobuf package exists (the TWS
    worker protocol requires it), else apws.  Semantics are identical:
    both drive the same :class:`AlertStateMachine`.
    """
    if impl == "auto":
        impl = "tws" if _protobuf_available() else "apws"
    if impl == "tws":
        processor_cls = alert_processor_factory(machine)
        return attempts_stream.groupBy("tenant_id", "destination_id").transformWithStateInPandas(
            statefulProcessor=processor_cls(),
            outputStructType=ALERT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    import time as _time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ALERT_OUTPUT_SCHEMA
    state_schema = "ids string, last_exhausted double"

    def func(key, pdfs, state: GroupState):
        tenant_id, destination_id = key
        seen: set[str] = set()
        last_exhausted = None
        if state.exists:
            stored, last_exhausted = state.get
            if stored:
                seen = set(stored.split("\x00"))
        now = _time.time()
        out = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                seen, signals = machine.evaluate(
                    seen,
                    attempt_id=str(r.attempt_id),
                    success=(r.status == "success"),
                    attempt_number=int(r.attempt_number),
                    eligible_for_retry=bool(r.eligible_for_retry),
                    now=now,
                    last_exhausted_at=last_exhausted,
                )
                for s in signals:
                    if s["signal"] == "alert.attempt.exhausted_retries":
                        last_exhausted = now  # refresh suppression window
                    out.append(
                        {"tenant_id": tenant_id, "destination_id": destination_id, **s}
                    )
        state.update(("\x00".join(sorted(seen)), last_exhausted))
        if out:
            yield pd.DataFrame(out)

    return attempts_stream.groupBy("tenant_id", "destination_id").applyInPandasWithState(
        func, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
