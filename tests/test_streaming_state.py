"""Characterization tests for the stateful layers (ST2/ST3/ST4) — ports of
the reference's semantics: alert thresholds, idempotent replay, retry
upsert/cancel/DLQ, backoff policies."""

import pytest

from outpost_spark.functions.backoff import (
    ConstantBackoff,
    ExponentialBackoff,
    ScheduledBackoff,
    should_alert,
    threshold_failure_counts,
)
from outpost_spark.streaming.alerts import AlertStateMachine
from outpost_spark.streaming.retry import RetryScheduler


# ── F11: backoff (backoff.go:12-66) ──────────────────────────────────────


def test_exponential_backoff_defaults():
    b = ExponentialBackoff()  # 30s * 2^n
    assert [b.duration(n) for n in range(4)] == [30, 60, 120, 240]


def test_constant_and_scheduled_backoff():
    assert ConstantBackoff(10).duration(7) == 10
    s = ScheduledBackoff((5, 10, 60))
    assert [s.duration(n) for n in (0, 1, 2, 3, 99)] == [5, 10, 60, 60, 60]
    assert ScheduledBackoff(()).duration(0) == 0


# ── F12: threshold math (threshold.go:23-60) ─────────────────────────────


def test_threshold_pairs_ceiling_division_and_auto_100():
    pairs = threshold_failure_counts([50, 70, 90], 20)
    assert pairs == [(50, 10), (70, 14), (90, 18), (100, 20)]
    # ceiling: 70% of 15 = 10.5 -> 11
    assert (70, 11) in threshold_failure_counts([70], 15)
    # invalid percentages dropped
    assert threshold_failure_counts([0, -5, 101], 10) == [(100, 10)]


def test_should_alert_exact_vs_gte():
    pairs = threshold_failure_counts([50, 100], 10)
    assert should_alert(pairs, 5) == (50, True)  # exact
    assert should_alert(pairs, 6) == (0, False)  # between thresholds: silent
    assert should_alert(pairs, 10) == (100, True)
    assert should_alert(pairs, 15) == (100, True)  # >= for auto-disable
    assert should_alert([], 99) == (0, False)


# ── ST3/ST4: alert state machine (evaluator.go:119-157) ──────────────────


def _run(machine, outcomes):
    seen = set()
    signals = []
    for i, ok in enumerate(outcomes):
        seen, sigs = machine.evaluate(
            seen, attempt_id=f"a{i}", success=ok, attempt_number=1
        )
        signals.extend(sigs)
    return seen, signals


def test_consecutive_failures_cross_thresholds():
    m = AlertStateMachine(auto_disable_failure_count=10, thresholds=[50, 100])
    _, sigs = _run(m, [False] * 10)
    levels = [s["level"] for s in sigs]
    assert levels == [50, 100]
    assert sigs[0]["signal"] == "alert.destination.consecutive_failure"
    assert sigs[1]["signal"] == "alert.destination.disabled"


def test_success_resets_count():
    m = AlertStateMachine(auto_disable_failure_count=4, thresholds=[100])
    seen, sigs = _run(m, [False, False, True, False, False, False])
    assert len(seen) == 3  # post-reset failures only
    assert len(sigs) == 0  # 4 consecutive never reached


def test_replayed_attempt_is_idempotent():
    m = AlertStateMachine(auto_disable_failure_count=3, thresholds=[100])
    seen = set()
    for _ in range(5):  # same attempt id replayed
        seen, sigs = m.evaluate(seen, attempt_id="same", success=False)
    assert len(seen) == 1
    assert not sigs


def test_exhausted_retries_signal():
    m = AlertStateMachine(retry_max_limit=10)
    _, sigs = m.evaluate(
        set(), attempt_id="a", success=False, attempt_number=11, eligible_for_retry=True
    )
    assert any(s["signal"] == "alert.attempt.exhausted_retries" for s in sigs)
    # not eligible -> no signal; attempt below limit -> no signal
    _, sigs = m.evaluate(
        set(), attempt_id="b", success=False, attempt_number=11, eligible_for_retry=False
    )
    assert not any(s["signal"] == "alert.attempt.exhausted_retries" for s in sigs)
    _, sigs = m.evaluate(
        set(), attempt_id="c", success=False, attempt_number=10, eligible_for_retry=True
    )
    assert not any(s["signal"] == "alert.attempt.exhausted_retries" for s in sigs)


def test_exhausted_retries_suppression_window():
    # ST4: at most one exhausted alert per destination per window; the
    # window refreshes on emission; 0 = alert on every exhaustion
    # (services/builder.go:378-388, logmq/batchprocessor.go:86-93)
    m = AlertStateMachine(retry_max_limit=10, exhausted_window_seconds=60.0)

    def exhausted(now, last):
        _, sigs = m.evaluate(
            set(), attempt_id=f"a{now}", success=False, attempt_number=11,
            eligible_for_retry=True, now=now, last_exhausted_at=last,
        )
        return any(s["signal"] == "alert.attempt.exhausted_retries" for s in sigs)

    assert exhausted(100.0, None)          # first exhaustion emits
    assert not exhausted(130.0, 100.0)     # inside the window: suppressed
    assert exhausted(161.0, 100.0)         # window elapsed: emits again
    m0 = AlertStateMachine(retry_max_limit=10)  # window 0 = no suppression
    _, sigs = m0.evaluate(
        set(), attempt_id="x", success=False, attempt_number=11,
        eligible_for_retry=True, now=130.0, last_exhausted_at=100.0,
    )
    assert any(s["signal"] == "alert.attempt.exhausted_retries" for s in sigs)


# ── ST2: retry timer queue (scheduler.go, deliverymq/retry.go) ───────────


def _fail(s, n, now, event="e1", dest="d1", manual=False):
    s.on_attempt(
        event_id=event,
        destination_id=dest,
        tenant_id="t1",
        attempt_number=n,
        success=False,
        eligible_for_retry=True,
        now=now,
        manual=manual,
    )


def test_retry_scheduled_with_backoff():
    s = RetryScheduler()
    _fail(s, 1, now=0.0)
    assert s.fire_due(29.9) == []
    fired = s.fire_due(30.0)
    assert len(fired) == 1
    assert fired[0]["attempt_number"] == 2
    assert s.pending == {}


def test_retry_upsert_replaces_pending():
    # manual retry overrides pending auto retry (messagehandler.go:226-246)
    s = RetryScheduler()
    _fail(s, 1, now=0.0)  # auto: fires at 30
    _fail(s, 3, now=1.0, manual=True)  # manual reschedule: fires at 1+120
    fired = s.fire_due(60.0)
    assert fired == []  # old timer replaced, nothing at t=30
    fired = s.fire_due(121.0)
    assert len(fired) == 1 and fired[0]["attempt_number"] == 4


def test_success_cancels_pending_retry():
    s = RetryScheduler()
    _fail(s, 1, now=0.0)
    s.on_attempt(
        event_id="e1",
        destination_id="d1",
        tenant_id="t1",
        attempt_number=2,
        success=True,
        eligible_for_retry=True,
        now=5.0,
    )
    assert s.fire_due(1e9) == []


def test_retry_exhaustion_stops_scheduling():
    s = RetryScheduler(retry_max_limit=3)
    _fail(s, 4, now=0.0)  # beyond limit
    assert s.fire_due(1e9) == []


def test_retry_per_destination_isolation():
    s = RetryScheduler()
    _fail(s, 1, now=0.0, dest="d1")
    _fail(s, 1, now=0.0, dest="d2")
    fired = s.fire_due(30.0)
    assert {f["destination_id"] for f in fired} == {"d1", "d2"}


def test_dlq_after_max_receives():
    s = RetryScheduler(max_receive_count=2)
    _fail(s, 1, now=0.0)
    t1 = s.fire_due(30.0)[0]
    s.requeue(t1, now=31.0)
    t2 = s.fire_due(31.0)[0]
    s.requeue(t2, now=32.0)
    t3 = s.fire_due(32.0)[0]
    assert [t1["dlq"], t2["dlq"], t3["dlq"]] == [False, False, True]
    assert s.dlq == [t3]
