"""Property-based checks: cursor codec roundtrip (hypothesis) and a
full-corpus pagination walk — every page size must visit every row exactly
once, in order, forward and backward, regardless of timestamp ties."""

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from outpost_spark.functions import cursor as cursor_codec
from outpost_spark.logstore.lists import ListRequest, list_events

IDS = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x7F),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(unix_ms=st.integers(min_value=0, max_value=2**45), item_id=IDS)
def test_cursor_position_roundtrip(unix_ms, item_id):
    enc = cursor_codec.encode_position("evt", 1, unix_ms, item_id)
    assert enc.isalnum()  # base62 envelope survives URLs untouched
    got_ms, got_id = cursor_codec.decode_position(enc, "evt", 1)
    assert (got_ms, got_id) == (unix_ms, item_id)


@settings(max_examples=50, deadline=None)
@given(unix_ms=st.integers(min_value=0, max_value=2**45), item_id=IDS)
def test_cursor_rejects_wrong_resource_or_version(unix_ms, item_id):
    enc = cursor_codec.encode_position("evt", 1, unix_ms, item_id)
    with pytest.raises(Exception):
        cursor_codec.decode_position(enc, "att", 1)
    with pytest.raises(Exception):
        cursor_codec.decode_position(enc, "evt", 2)


@pytest.fixture(scope="module")
def tied_events(spark):
    # 23 rows over only 5 distinct timestamps — page boundaries are forced
    # to split inside tie groups, the hard case for keyset pagination
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"e{i:03d}", "t1", "user.created", base + timedelta(hours=i % 5), ["d1"])
        for i in range(23)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id string, tenant_id string, topic string, event_time timestamp, "
        "matched_destination_ids array<string>",
    )
    df.cache().count()
    expected = [
        r["event_id"]
        for r in df.orderBy(
            df.event_time.desc(), df.event_id.desc()
        ).collect()
    ]
    return df, expected


@pytest.mark.parametrize("limit", [1, 2, 3, 5, 7, 23, 50])
def test_forward_walk_visits_all_rows_once(tied_events, limit):
    df, expected = tied_events
    seen = []
    cursor = ""
    for _ in range(40):  # hard stop against infinite loops
        res = list_events(df, ListRequest(limit=limit, next=cursor))
        seen.extend(r["event_id"] for r in res.items)
        if not res.next:
            break
        cursor = res.next
    assert seen == expected  # no skips, no duplicates, exact order


@pytest.mark.parametrize("limit", [2, 5, 7])
def test_backward_walk_reconstructs_pages(tied_events, limit):
    df, expected = tied_events
    # walk to the end, then walk back — pages must replay in reverse
    pages = []
    cursor = ""
    while True:
        res = list_events(df, ListRequest(limit=limit, next=cursor))
        pages.append([r["event_id"] for r in res.items])
        if not res.next:
            break
        cursor = res.next
    back_cursor = res.prev
    i = len(pages) - 2
    while back_cursor and i >= 0:
        res = list_events(df, ListRequest(limit=limit, prev=back_cursor))
        assert [r["event_id"] for r in res.items] == pages[i]
        back_cursor = res.prev
        i -= 1
