"""Keyset pagination conformance — port of the drivertest/pagination.go
behaviors: forward/backward paging, id tiebreak on equal timestamps,
cursor + GT/LT time-filter interaction, cursor validation."""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import types as T

from outpost_spark.functions import cursor as cursor_codec
from outpost_spark.logstore.lists import ListRequest, list_events

BASE = datetime(2000, 1, 10, 12, 0, 0, tzinfo=timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("matched_destination_ids", T.ArrayType(T.StringType())),
    ]
)


@pytest.fixture(scope="module")
def events(spark):
    # 25 events one minute apart + 3 sharing one timestamp (tie on id)
    rows = [
        (f"ev_{i:03d}", "t1", "user.created", BASE + timedelta(minutes=i), ["d1"])
        for i in range(25)
    ]
    tie_t = BASE + timedelta(minutes=30)
    rows += [(f"tie_{c}", "t1", "user.created", tie_t, ["d1"]) for c in "abc"]
    df = spark.createDataFrame(rows, SCHEMA)
    df.cache().count()
    return df


def _ids(res):
    return [r["event_id"] for r in res.items]


def test_forward_paging_desc(events):
    p1 = list_events(events, ListRequest(limit=10, order="desc"))
    assert len(p1.items) == 10
    assert p1.next != "" and p1.prev == ""
    # desc: ties first (largest time), ids desc within tie
    assert _ids(p1)[:3] == ["tie_c", "tie_b", "tie_a"]
    assert _ids(p1)[3] == "ev_024"

    p2 = list_events(events, ListRequest(limit=10, order="desc", next=p1.next))
    assert len(p2.items) == 10
    assert _ids(p2)[0] == "ev_017"
    assert p2.prev != ""

    p3 = list_events(events, ListRequest(limit=10, order="desc", next=p2.next))
    assert len(p3.items) == 8  # 28 total
    assert p3.next == ""


def test_backward_paging_returns_previous_page(events):
    p1 = list_events(events, ListRequest(limit=10, order="desc"))
    p2 = list_events(events, ListRequest(limit=10, order="desc", next=p1.next))
    back = list_events(events, ListRequest(limit=10, order="desc", prev=p2.prev))
    assert _ids(back) == _ids(p1)


def test_asc_order_flips_compare(events):
    p1 = list_events(events, ListRequest(limit=5, order="asc"))
    assert _ids(p1) == [f"ev_{i:03d}" for i in range(5)]
    p2 = list_events(events, ListRequest(limit=5, order="asc", next=p1.next))
    assert _ids(p2) == [f"ev_{i:03d}" for i in range(5, 10)]


def test_tie_break_pagination_no_skip_no_dup(events):
    # page size 2 straddles the 3-way timestamp tie
    seen = []
    req = ListRequest(limit=2, order="desc")
    res = list_events(events, req)
    seen += _ids(res)
    while res.next:
        res = list_events(events, ListRequest(limit=2, order="desc", next=res.next))
        seen += _ids(res)
    assert len(seen) == 28
    assert len(set(seen)) == 28


def test_cursor_respects_time_filter(events):
    # drivertest/pagination.go:503 — cursor + time filter excludes out-of-window rows
    gte = BASE + timedelta(minutes=5)
    lte = BASE + timedelta(minutes=15)
    res = list_events(events, ListRequest(limit=5, order="desc", time_gte=gte, time_lte=lte))
    assert _ids(res) == [f"ev_{i:03d}" for i in (15, 14, 13, 12, 11)]
    res2 = list_events(
        events,
        ListRequest(limit=5, order="desc", time_gte=gte, time_lte=lte, next=res.next),
    )
    assert _ids(res2) == [f"ev_{i:03d}" for i in (10, 9, 8, 7, 6)]


def test_gt_lt_exclude_exact_timestamp(events):
    # drivertest/pagination.go:570
    res = list_events(
        events,
        ListRequest(
            limit=100,
            order="asc",
            time_gt=BASE + timedelta(minutes=5),
            time_lt=BASE + timedelta(minutes=8),
        ),
    )
    assert _ids(res) == ["ev_006", "ev_007"]


def test_invalid_cursor_rejected(events):
    with pytest.raises(cursor_codec.InvalidCursorError):
        list_events(events, ListRequest(limit=5, next="@@@"))


def test_limit_caps(events):
    res = list_events(events, ListRequest(limit=5000))
    assert len(res.items) == 28  # capped at 1000, only 28 exist


def test_duplicate_rows_hidden_and_page_stays_full(spark):
    """fetchAndDedup (chlogstore.go:57-112): duplicate ids from the
    at-least-once replay window must not surface in pages or consume limit
    slots — the page refetches until full."""
    rows = []
    for i in range(12):
        t = BASE + timedelta(minutes=i)
        rows.append((f"ev_{i:03d}", "t1", "user.created", t, ["d1"]))
        if i % 2 == 0:  # half the rows are duplicated (replayed batch)
            rows.append((f"ev_{i:03d}", "t1", "user.created", t, ["d1"]))
    df = spark.createDataFrame(rows, SCHEMA)

    walked = []
    res = list_events(df, ListRequest(order="desc", limit=4))
    walked += _ids(res)
    while res.next:
        res = list_events(df, ListRequest(order="desc", limit=4, next=res.next))
        walked += _ids(res)
    assert walked == [f"ev_{i:03d}" for i in range(11, -1, -1)]
    assert len(walked) == len(set(walked))


def test_sub_ms_timestamp_not_repeated_across_pages(spark):
    """Cursors carry unix-ms (DateTime64(3) mirror); rows with sub-ms
    components must not reappear on the next page (round-1 bug: the
    full-precision keyset predicate failed to exclude them)."""
    t0 = BASE + timedelta(seconds=5)
    rows = [
        # same millisecond, different microseconds — ids break the tie
        ("sub_a", "t1", "user.created", t0.replace(microsecond=123_400), ["d1"]),
        ("sub_b", "t1", "user.created", t0.replace(microsecond=123_900), ["d1"]),
        ("sub_c", "t1", "user.created", t0.replace(microsecond=124_500), ["d1"]),
        ("old_1", "t1", "user.created", t0 - timedelta(seconds=1), ["d1"]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    walked = []
    res = list_events(df, ListRequest(order="desc", limit=1))
    walked += _ids(res)
    for _ in range(10):
        if not res.next:
            break
        res = list_events(df, ListRequest(order="desc", limit=1, next=res.next))
        walked += _ids(res)
    assert sorted(walked) == ["old_1", "sub_a", "sub_b", "sub_c"]
    assert len(walked) == len(set(walked)), f"repeated rows: {walked}"


def test_dedup_round_exhaustion_surfaces_continuation_cursor(spark):
    """Pathological duplication: when MAX_DEDUP_ITERATIONS full fetch
    rounds can't fill a page, the short page must still carry a
    continuation cursor (at the last SCANNED position) instead of
    silently ending pagination — rows beyond the duplicate run stay
    reachable (the reference surfaces continuation via its cursor the
    same way)."""
    from datetime import timedelta

    # one id duplicated 40 times at distinct ms timestamps, newer than two
    # unique rows; limit=2 -> each round scans 3 rows, all the same id
    rows = [
        ("dup_id", "t1", "user.created", BASE + timedelta(seconds=100 + i), ["d1"])
        for i in range(40)
    ]
    rows += [
        ("uniq_a", "t1", "user.created", BASE + timedelta(seconds=2), ["d1"]),
        ("uniq_b", "t1", "user.created", BASE + timedelta(seconds=1), ["d1"]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    df.cache().count()

    p1 = list_events(df, ListRequest(limit=2, order="desc"))
    assert _ids(p1) == ["dup_id"]  # page short of the limit...
    assert p1.next != ""  # ...but pagination must continue

    # following the cursors reaches the unique tail in bounded pages
    ids, nxt = set(_ids(p1)), p1.next
    for _ in range(10):
        if not nxt:
            break
        page = list_events(df, ListRequest(limit=2, order="desc", next=nxt))
        ids.update(_ids(page))
        nxt = page.next
    assert not nxt  # terminates
    assert ids == {"dup_id", "uniq_a", "uniq_b"}
    df.unpersist()
