"""Time-bucket expressions replicating the reference's bucket semantics.

Reference: internal/logstore/bucket/bucket.go:32-90 (truncation + advance),
internal/apirouter/metrics_handlers.go:86-116 (granularity grammar + caps),
internal/logstore/bucket/bucket.go:10-14 (ErrTooManyBuckets, 100k cap).

Semantics pinned here (all UTC):
- ``s``/``m``/``h`` x N : truncate epoch-seconds to multiples of N*unit
  (epoch-aligned), bucket.go:32-40.
- ``d`` x 1            : start of UTC day; ``d`` x N : floor epoch-days to
  multiples of N anchored 1970-01-01, bucket.go:41-48.
- ``w``                : **Sunday-based** weeks; anchor 1970-01-04 (the first
  epoch Sunday), bucket.go:49-57.  Spark's ``date_trunc('week')`` is
  Monday-based and must NOT be used.
- ``M`` x 1            : start of month; ``M`` x N : floor month-number since
  Jan 1970 to multiples of N, bucket.go:58-66.

All expressions are pure Catalyst column expressions (no UDFs) so they stay
inside whole-stage codegen and push no work to Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

_GRAN_RE = re.compile(r"^(\d+)([smhdwM])$")

# metrics_handlers.go:90-97
_MAX_VALUE = {"s": 60, "m": 60, "h": 24, "d": 31, "w": 4, "M": 12}
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 7 * 86400}

# 1970-01-04 was the first Sunday of the Unix epoch (bucket.go:49-57).
_SUNDAY_ANCHOR_DAYS = 3

MAX_BUCKETS = 100_000  # bucket/bucket.go:10-14


class TooManyBucketsError(ValueError):
    """Raised when a range/granularity pair would produce >100k slots."""


@dataclass(frozen=True)
class Granularity:
    n: int
    unit: str  # one of s m h d w M

    @property
    def fixed_seconds(self) -> int | None:
        """Bucket width in seconds for non-calendar units, else None (months)."""
        if self.unit == "M":
            return None
        return self.n * _UNIT_SECONDS[self.unit]

    def __str__(self) -> str:  # round-trips the grammar
        return f"{self.n}{self.unit}"


def parse_granularity(s: str) -> Granularity:
    """Parse ``^(\\d+)([smhdwM])$`` with per-unit caps (metrics_handlers.go:86-116)."""
    m = _GRAN_RE.match(s)
    if not m:
        raise ValueError(f"invalid granularity {s!r}")
    n, unit = int(m.group(1)), m.group(2)
    if n < 1 or n > _MAX_VALUE[unit]:
        raise ValueError(f"granularity value out of range for unit {unit}: {n}")
    return Granularity(n, unit)


def _epoch(col: Column) -> Column:
    return F.unix_timestamp(col)


def bucket_epoch_expr(col: Column, g: Granularity | str) -> Column:
    """Bucket start as epoch seconds (LongType) — the canonical comparable form."""
    if isinstance(g, str):
        g = parse_granularity(g)
    if g.unit in ("s", "m", "h"):
        step = g.n * _UNIT_SECONDS[g.unit]
        return (F.floor(_epoch(col) / step) * step).cast("long")
    if g.unit == "d":
        step_days = g.n
        days = F.floor(_epoch(col) / 86400)
        return (F.floor(days / step_days) * step_days * 86400).cast("long")
    if g.unit == "w":
        days = F.floor(_epoch(col) / 86400)
        step_days = 7 * g.n
        anchored = days - _SUNDAY_ANCHOR_DAYS
        start_day = F.floor(anchored / step_days) * step_days + _SUNDAY_ANCHOR_DAYS
        return (start_day * 86400).cast("long")
    # months: calendar arithmetic on month-number since Jan 1970 (bucket.go:58-66)
    mnum = (F.year(col) - F.lit(1970)) * 12 + F.month(col) - 1
    b = F.floor(mnum / g.n) * g.n
    start = F.make_date(
        (F.lit(1970) + F.floor(b / 12)).cast("int"),
        (b % 12 + 1).cast("int"),
        F.lit(1),
    )
    return F.unix_timestamp(start.cast("timestamp")).cast("long")


def bucket_expr(col: Column, g: Granularity | str) -> Column:
    """Bucket start as TimestampType."""
    return F.timestamp_seconds(bucket_epoch_expr(col, g))


def bucket_duration_seconds_expr(bucket_start: Column, g: Granularity | str) -> Column:
    """Seconds covered by the bucket starting at ``bucket_start``.

    Months use true calendar length (driver/rate.go:6-120): the distance to
    the next bucket start.  ``bucket_start`` must be a timestamp column.
    """
    if isinstance(g, str):
        g = parse_granularity(g)
    fixed = g.fixed_seconds
    if fixed is not None:
        return F.lit(fixed).cast("long")
    nxt = F.add_months(bucket_start, g.n).cast("timestamp")
    return (F.unix_timestamp(nxt) - F.unix_timestamp(bucket_start)).cast("long")


# ---------------------------------------------------------------------------
# Slot generation (for gap filling) — pure Python mirror of bucket.go:73-90.
# ---------------------------------------------------------------------------


def _truncate_py(ts: datetime, g: Granularity) -> datetime:
    epoch = int(ts.timestamp())
    if g.unit in ("s", "m", "h"):
        step = g.n * _UNIT_SECONDS[g.unit]
        return datetime.fromtimestamp(epoch // step * step, tz=timezone.utc)
    if g.unit == "d":
        days = epoch // 86400
        return datetime.fromtimestamp(days // g.n * g.n * 86400, tz=timezone.utc)
    if g.unit == "w":
        days = epoch // 86400
        step = 7 * g.n
        start_day = (days - _SUNDAY_ANCHOR_DAYS) // step * step + _SUNDAY_ANCHOR_DAYS
        return datetime.fromtimestamp(start_day * 86400, tz=timezone.utc)
    mnum = (ts.year - 1970) * 12 + ts.month - 1
    b = mnum // g.n * g.n
    return datetime(1970 + b // 12, b % 12 + 1, 1, tzinfo=timezone.utc)


def _advance_py(ts: datetime, g: Granularity) -> datetime:
    if g.unit != "M":
        return datetime.fromtimestamp(int(ts.timestamp()) + g.fixed_seconds, tz=timezone.utc)
    mnum = (ts.year - 1970) * 12 + ts.month - 1 + g.n
    return datetime(1970 + mnum // 12, mnum % 12 + 1, 1, tzinfo=timezone.utc)


def bucket_slots(start: datetime, end: datetime, g: Granularity | str) -> list[int]:
    """All aligned bucket starts (epoch seconds) covering [start, end).

    Mirrors bucket/fill.go slot generation; enforces the 100k-slot guardrail
    BEFORE materializing anything (the reference throws ErrTooManyBuckets —
    bucket.go:10-14 — and we must fail before any cross join at scale).
    """
    if isinstance(g, str):
        g = parse_granularity(g)
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if end.tzinfo is None:
        end = end.replace(tzinfo=timezone.utc)
    n = bucket_count(start, end, g)
    if n > MAX_BUCKETS:
        raise TooManyBucketsError(f"{n} buckets > {MAX_BUCKETS}")
    slots = []
    cur = _truncate_py(start, g)
    while cur < end:
        slots.append(int(cur.timestamp()))
        cur = _advance_py(cur, g)
    return slots


def bucket_count(start: datetime, end: datetime, g: Granularity | str) -> int:
    """O(1) slot-count estimate used for the guardrail (no iteration for fixed units)."""
    if isinstance(g, str):
        g = parse_granularity(g)
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if end.tzinfo is None:
        end = end.replace(tzinfo=timezone.utc)
    if end <= start:
        return 0
    fixed = g.fixed_seconds
    if fixed is not None:
        first = _truncate_py(start, g)
        return int((end - first).total_seconds() + fixed - 1) // fixed
    # months: count N-month slots from floor(start) through the slot
    # containing the last instant before `end` (end is exclusive)
    last = end - timedelta(microseconds=1)
    m_first = ((start.year - 1970) * 12 + start.month - 1) // g.n * g.n
    m_last = ((last.year - 1970) * 12 + last.month - 1) // g.n * g.n
    return (m_last - m_first) // g.n + 1
