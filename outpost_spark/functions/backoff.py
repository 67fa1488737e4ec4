"""Retry backoff policies and alert threshold math.

Reference: internal/backoff/backoff.go:12-66 (exponential / constant /
scheduled), defaults interval=30s base=2, max 10 retries
(internal/config/config.go:168-170); threshold math
internal/alert/threshold.go:23-60.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_INTERVAL_SECONDS = 30.0
DEFAULT_BASE = 2
DEFAULT_RETRY_MAX_LIMIT = 10


@dataclass(frozen=True)
class ExponentialBackoff:
    interval: float = DEFAULT_INTERVAL_SECONDS
    base: int = DEFAULT_BASE

    def duration(self, retries: int) -> float:
        """Delay before the (retries+1)-th retry; retries is 0-indexed."""
        return self.interval * (self.base**retries)


@dataclass(frozen=True)
class ConstantBackoff:
    interval: float = DEFAULT_INTERVAL_SECONDS

    def duration(self, retries: int) -> float:
        return self.interval


@dataclass(frozen=True)
class ScheduledBackoff:
    schedule: tuple[float, ...] = ()

    def duration(self, retries: int) -> float:
        """Past the schedule end, the last value repeats (backoff.go:55-66)."""
        if not self.schedule:
            return 0.0
        if retries >= len(self.schedule):
            return self.schedule[-1]
        return self.schedule[retries]


def backoff_delay_col(bo, retries_col):
    """Column-side twin of ``<policy>.duration(retries)`` — the delay
    expression the BATCHED retry path evaluates JVM-side for every key
    at once (no per-key Python).  ``retries_col`` is the 0-indexed retry
    count column; same clamp-past-the-end semantics as ScheduledBackoff."""
    from pyspark.sql import functions as F

    if isinstance(bo, ExponentialBackoff):
        return F.lit(float(bo.interval)) * F.pow(
            F.lit(float(bo.base)), retries_col.cast("double")
        )
    if isinstance(bo, ConstantBackoff):
        return F.lit(float(bo.interval))
    if isinstance(bo, ScheduledBackoff):
        if not bo.schedule:
            return F.lit(0.0)
        arr = F.array(*[F.lit(float(x)) for x in bo.schedule])
        idx = F.least(retries_col.cast("int"), F.lit(len(bo.schedule) - 1))
        return F.element_at(arr, idx + F.lit(1))
    raise TypeError(f"unsupported backoff policy {type(bo).__name__}")


def threshold_failure_counts(
    thresholds: list[int], auto_disable_failure_count: int
) -> list[tuple[int, int]]:
    """percentage thresholds -> sorted (percentage, failure_count) pairs.

    Ceiling division against the 100% denominator; invalid percentages
    dropped; 100% auto-included (threshold.go:23-60).
    """
    pairs = [
        (p, (auto_disable_failure_count * p + 99) // 100)
        for p in thresholds
        if 0 < p <= 100
    ]
    pairs.sort(key=lambda x: x[1])
    if not pairs or pairs[-1][0] != 100:
        pairs.append((100, auto_disable_failure_count))
    return pairs


def should_alert(
    pairs: list[tuple[int, int]], failures: int
) -> tuple[int, bool]:
    """Which threshold (if any) does this consecutive-failure count cross?

    100% uses >= (never miss auto-disable on a skipped count); others use
    exact equality (no duplicate alerts) — threshold.go:... shouldAlert.
    """
    for pct, count in reversed(pairs):
        if pct == 100:
            if failures >= count:
                return pct, True
        elif failures == count:
            return pct, True
    return 0, False
