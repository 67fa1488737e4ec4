"""Filter-language conformance: the pinned corpus (108 main cases x2 via
$not inversion + 12 $not-composition cases) from the public
hookdeck/simple-json-match test suite, as mirrored in the reference
(internal/simplejsonmatch/match_test.go), extracted to
fixtures_jsonmatch.json.  Plus envelope-level MatchFilter behavior."""

import json
import os

import pytest

from outpost_spark.functions.jsonmatch import match, match_event_filter

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_jsonmatch.json")
with open(FIXTURE) as f:
    CORPUS = json.load(f)

MAIN = CORPUS["main"]
NOT = CORPUS["not"]


@pytest.mark.parametrize("i", range(len(MAIN)))
def test_main_case(i):
    c = MAIN[i]
    assert match(c["input"], c["schema"]) is c["expected"], (
        f"case {i}: match({c['input']}, {c['schema']}) != {c['expected']}"
    )


@pytest.mark.parametrize("i", range(len(MAIN)))
def test_main_case_not_inverted(i):
    c = MAIN[i]
    assert match(c["input"], {"$not": c["schema"]}) is (not c["expected"]), (
        f"case {i} inverted: input={c['input']} schema={c['schema']}"
    )


@pytest.mark.parametrize("i", range(len(NOT)))
def test_not_composition_case(i):
    c = NOT[i]
    assert match(c["input"], c["schema"]) is c["expected"], (
        f"not case {i}: match({c['input']}, {c['schema']}) != {c['expected']}"
    )


def test_match_filter_envelope():
    # entities.go:63-92 MatchFilter envelope behavior
    common = dict(
        event_id="ev1",
        topic="user.created",
        time_rfc3339="2024-01-01T00:00:00Z",
        metadata={"source": "api"},
        data='{"amount": 120, "tags": ["a", "b"]}',
    )
    assert match_event_filter(None, **common) is True
    assert match_event_filter({}, **common) is True
    assert match_event_filter({"topic": "user.created"}, **common) is True
    assert match_event_filter({"topic": "user.deleted"}, **common) is False
    assert match_event_filter({"data": {"amount": {"$gte": 100}}}, **common) is True
    assert match_event_filter({"data": {"tags": "a"}}, **common) is True
    assert match_event_filter({"metadata": {"source": "api"}}, **common) is True
    assert (
        match_event_filter({"time": {"$startsWith": "2024-01"}}, **common) is True
    )
    # invalid data JSON -> empty data -> filter on data fails
    bad = dict(common, data="not json")
    assert match_event_filter({"data": {"amount": 120}}, **bad) is False
