"""Table-driven pins for bucket truncation semantics (bucket.go:32-90)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from outpost_spark.functions.buckets import (
    Granularity,
    bucket_count,
    bucket_epoch_expr,
    bucket_slots,
    parse_granularity,
    TooManyBucketsError,
)


def _utc(*args):
    return datetime(*args, tzinfo=timezone.utc)


def _epoch(dt):
    return int(dt.timestamp())


# (input time, granularity, expected bucket start)
CASES = [
    # s/m/h: epoch-aligned truncation (bucket.go:32-40)
    (_utc(2000, 1, 15, 12, 34, 56), "1s", _utc(2000, 1, 15, 12, 34, 56)),
    (_utc(2000, 1, 15, 12, 34, 56), "30s", _utc(2000, 1, 15, 12, 34, 30)),
    (_utc(2000, 1, 15, 12, 34, 56), "1m", _utc(2000, 1, 15, 12, 34)),
    (_utc(2000, 1, 15, 12, 34, 56), "15m", _utc(2000, 1, 15, 12, 30)),
    (_utc(2000, 1, 15, 12, 34, 56), "1h", _utc(2000, 1, 15, 12)),
    # 2h is epoch-aligned: midnight UTC is a multiple of 7200
    (_utc(2000, 1, 15, 13, 0, 1), "2h", _utc(2000, 1, 15, 12)),
    # d: start of day; multi-day anchored 1970-01-01 (bucket.go:41-48)
    (_utc(2000, 1, 15, 23, 59, 59), "1d", _utc(2000, 1, 15)),
    # 2000-01-15 is epoch day 10971; 10971 // 2 * 2 = 10970 -> Jan 14
    (_utc(2000, 1, 15, 1), "2d", _utc(2000, 1, 14)),
    # w: SUNDAY-based (anchor 1970-01-04). 2000-01-15 is a Saturday;
    # its week starts Sunday 2000-01-09 (bucket.go:49-57)
    (_utc(2000, 1, 15, 1), "1w", _utc(2000, 1, 9)),
    (_utc(2000, 1, 9, 0, 0, 0), "1w", _utc(2000, 1, 9)),
    (_utc(2000, 1, 8, 23, 59), "1w", _utc(2000, 1, 2)),
    # 2w: Jan 9 2000 is epoch day 10965; (10965-3) = 10962 = 783*14 exactly,
    # so Jan 9 is itself a 2-week boundary off the 1970-01-04 anchor
    (_utc(2000, 1, 9), "2w", _utc(2000, 1, 9)),
    (_utc(2000, 1, 22), "2w", _utc(2000, 1, 9)),
    # M: calendar months; multi-month floors month-number since Jan 1970
    (_utc(2000, 1, 31, 23, 59), "1M", _utc(2000, 1, 1)),
    # Feb 2000: month-number 361; 361//3*3=360 -> Jan 2000
    (_utc(2000, 2, 15), "3M", _utc(2000, 1, 1)),
    (_utc(2000, 4, 15), "3M", _utc(2000, 4, 1)),
]


@pytest.mark.parametrize("ts,gran,expected", CASES)
def test_bucket_epoch_expr(spark, ts, gran, expected):
    df = spark.createDataFrame([(ts,)], "t timestamp")
    got = df.select(bucket_epoch_expr(F.col("t"), gran).alias("b")).collect()[0]["b"]
    assert got == _epoch(expected), f"{gran} {ts} -> {datetime.fromtimestamp(got, tz=timezone.utc)}"


@pytest.mark.parametrize("ts,gran,expected", CASES)
def test_bucket_slots_align_with_expr(ts, gran, expected):
    # driver-side slot truncation must agree with the Column expression
    from outpost_spark.functions.buckets import _truncate_py

    assert _truncate_py(ts, parse_granularity(gran)) == expected


def test_parse_granularity_caps():
    assert parse_granularity("24h") == Granularity(24, "h")
    for bad in ("25h", "61m", "61s", "32d", "5w", "13M", "0h", "h", "1x", "-1h"):
        with pytest.raises(ValueError):
            parse_granularity(bad)


def test_bucket_count_and_guardrail():
    start, end = _utc(2000, 1, 1), _utc(2000, 2, 1)
    assert bucket_count(start, end, "1d") == 31
    assert bucket_count(start, end, "1h") == 744
    assert bucket_count(start, end, "1M") == 1
    # Sunday weeks: Jan 2000 touches weeks starting Dec 26, Jan 2, 9, 16, 23, 30
    assert len(bucket_slots(start, end, "1w")) == 6
    with pytest.raises(TooManyBucketsError):
        bucket_slots(_utc(2000, 1, 1), _utc(2010, 1, 1), "1s")


def test_slots_sequence_dense():
    slots = bucket_slots(_utc(2000, 1, 15), _utc(2000, 1, 16), "1h")
    assert len(slots) == 24
    assert slots[0] == _epoch(_utc(2000, 1, 15))
    assert slots[-1] == _epoch(_utc(2000, 1, 15, 23))
