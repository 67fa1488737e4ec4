"""Topic glob matching/normalization (entities.go:144-289) and the
base62 cursor codec (cursor.go:22-80)."""

import pytest

from outpost_spark.functions import cursor
from outpost_spark.functions.topic import (
    glob_to_regex,
    match_topic_pattern,
    normalize_topics,
)


# entities.go:255-289 semantics
MATCH_CASES = [
    ("user.created", "user.created", True),
    ("user.created", "user.updated", False),
    ("user.*", "user.created", True),
    ("user.*", "user.", True),  # '*' matches empty
    ("user.*", "user", False),  # but the '.' is required
    ("user.*", "account.created", False),
    ("*.created", "user.created", True),
    ("*.created", "user.updated", False),
    ("*", "anything.at.all", True),
    ("u*r.*ed", "user.created", True),  # multi-star backtracking
    ("u*r.*ed", "uxxr.zzed", True),
    ("u*r.*ed", "vser.created", False),
    ("a*b*c", "aXbYc", True),
    ("a*b*c", "ac", False),
    ("user.*", "user.a.b.c", True),  # '*' crosses separators
]


@pytest.mark.parametrize("pattern,topic,expected", MATCH_CASES)
def test_match_topic_pattern(pattern, topic, expected):
    assert match_topic_pattern(pattern, topic) is expected


def test_glob_regex_escapes_metachars():
    assert match_topic_pattern("a.b", "a.b") is True
    assert match_topic_pattern("a.b", "axb") is False  # '.' is literal
    assert match_topic_pattern("a+b*", "a+bc") is True
    assert match_topic_pattern("a+b*", "aab") is False


# entities.go:200-244
NORMALIZE_CASES = [
    (["user.created", "user.created"], ["user.created"]),
    (["user.*", "user.created"], ["user.*"]),
    (["user.created", "user.*"], ["user.*"]),
    (["*.created", "user.*"], ["*.created", "user.*"]),  # neither covers
    (["*"], ["*"]),
    (["user.created"], ["user.created"]),
    (["user.*", "user.*x", "user.created"], ["user.*"]),
]


@pytest.mark.parametrize("topics,expected", NORMALIZE_CASES)
def test_normalize_topics(topics, expected):
    assert normalize_topics(topics) == expected


def test_cursor_roundtrip():
    enc = cursor.encode("evt", 1, "946944000000::m_evt_42")
    assert cursor.decode(enc, "evt", 1) == "946944000000::m_evt_42"
    ms, item = cursor.decode_position(
        cursor.encode_position("evt", 1, 946944000000, "m_evt_42"), "evt", 1
    )
    assert (ms, item) == (946944000000, "m_evt_42")


def test_cursor_base62_alphabet_matches_go_bigint():
    # Go big.Int.Text(62) digit set: 0-9, a-z, A-Z.  "Az" encodes as:
    # bytes "Az" = 0x417a = 16762; 16762 = 4*62^2 + 22*62 + 22 -> "4mm"
    assert cursor.base62_encode("Az") == "4mm"
    assert cursor.base62_decode("4mm") == "Az"
    assert cursor.base62_encode("") == ""
    assert cursor.base62_decode(cursor.base62_encode("hello world")) == "hello world"


def test_cursor_version_and_resource_validation():
    enc = cursor.encode("evt", 2, "data")
    with pytest.raises(cursor.CursorVersionMismatchError):
        cursor.decode(enc, "evt", 1)
    with pytest.raises(cursor.InvalidCursorError):
        cursor.decode(enc, "att", 2)
    with pytest.raises(cursor.InvalidCursorError):
        cursor.decode("!!!not-base62!!!", "evt", 1)
    assert cursor.decode("", "evt", 1) == ""
