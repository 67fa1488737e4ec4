"""Conformance tests for the tenant/destination store surface (S8, P10,
P2/J2) — semantics pinned against matchDestinationFilter, ObfuscateValue
(registry_test.go cases), and the AttemptRecord shape."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from outpost_spark.tenantstore import (
    ListDestinationRequest,
    attempt_record,
    list_destinations,
    list_tenants,
    obfuscate_map_expr,
    obfuscate_value,
    obfuscate_value_expr,
    retrieve_destination,
    retrieve_tenant,
)

DEST_SCHEMA = (
    "id string, tenant_id string, type string, topics array<string>, "
    "config map<string,string>, credentials map<string,string>"
)


@pytest.fixture(scope="module")
def dests(spark):
    return spark.createDataFrame(
        [
            ("d1", "t1", "webhook", ["user.created", "user.deleted"], {}, {}),
            ("d2", "t1", "webhook", ["*"], {}, {}),
            ("d3", "t1", "sqs", ["user.*"], {}, {}),
            ("d4", "t2", "webhook", ["user.created"], {}, {}),
        ],
        DEST_SCHEMA,
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_list_destinations_tenant_scope(dests):
    assert _ids(list_destinations(dests, ListDestinationRequest(tenant_id="t1"))) == [
        "d1", "d2", "d3"
    ]


def test_list_destinations_type_or_semantics(dests):
    req = ListDestinationRequest(tenant_id="t1", types=["sqs", "kafka"])
    assert _ids(list_destinations(dests, req)) == ["d3"]


def test_list_destinations_topics_and_semantics(dests):
    # both topics must match → d1 (has both) and d2 (wildcard) qualify;
    # d3's glob user.* matches both too
    req = ListDestinationRequest(
        tenant_id="t1", topics=["user.created", "user.deleted"]
    )
    assert _ids(list_destinations(dests, req)) == ["d1", "d2", "d3"]
    # a topic d1 lacks → only wildcard + glob destinations remain
    req = ListDestinationRequest(tenant_id="t1", topics=["user.updated"])
    assert _ids(list_destinations(dests, req)) == ["d2", "d3"]


def test_list_destinations_wildcard_only_filter(dests):
    # filter ["*"] = wildcard-destinations-only (matchDestinationFilter)
    req = ListDestinationRequest(tenant_id="t1", topics=["*"])
    assert _ids(list_destinations(dests, req)) == ["d2"]


def test_list_destinations_ids_batch(dests):
    req = ListDestinationRequest(tenant_id="t1", ids=["d1", "d3", "dX"])
    assert _ids(list_destinations(dests, req)) == ["d1", "d3"]


def test_retrieve_destination_point_lookup(dests):
    assert retrieve_destination(dests, "t1", "d3")["type"] == "sqs"
    assert retrieve_destination(dests, "t2", "d3") is None


# ── ObfuscateValue: exact cases from registry_test.go:540-575 ──


@pytest.mark.parametrize(
    "value,expected",
    [
        ("", ""),
        ("a", "*"),
        ("abc123", "******"),
        ("123456789", "*********"),
        ("1234567890", "1234******"),
        ("abcdefghijklmnop", "abcd************"),
    ],
)
def test_obfuscate_value_python(value, expected):
    assert obfuscate_value(value) == expected


def test_obfuscate_value_expr_matches_python(spark):
    vals = ["", "a", "abc123", "123456789", "1234567890", "abcdefghijklmnop"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["m"] for r in df.select(obfuscate_value_expr(F.col("v")).alias("m")).collect()]
    assert got == [obfuscate_value(v) for v in vals]


def test_obfuscate_map_masks_only_sensitive_keys(spark):
    df = spark.createDataFrame(
        [({"secret_key": "sensitive-value-xyz", "url": "https://x.example"},)],
        "credentials map<string,string>",
    )
    out = df.select(
        obfuscate_map_expr(F.col("credentials"), ["secret_key"]).alias("c")
    ).collect()[0]["c"]
    assert out["secret_key"] == "sens" + "*" * 15
    assert out["url"] == "https://x.example"


# ── ListTenant pagination (driver.go:40-47) ──


def test_list_tenants_paginates_bidirectionally(spark):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"t{i:02d}", i, base.replace(day=1 + i)) for i in range(10)
    ]
    tenants = spark.createDataFrame(
        rows, "id string, destinations_count int, created_at timestamp"
    )
    p1 = list_tenants(tenants, limit=4)
    assert [r["id"] for r in p1.items] == ["t09", "t08", "t07", "t06"]
    p2 = list_tenants(tenants, limit=4, next=p1.next)
    assert [r["id"] for r in p2.items] == ["t05", "t04", "t03", "t02"]
    back = list_tenants(tenants, limit=4, prev=p2.prev)
    assert [r["id"] for r in back.items] == [r["id"] for r in p1.items]
    assert retrieve_tenant(tenants, "t03")["destinations_count"] == 3


# ── J2/P2: AttemptRecord struct packing + include[] shaping ──


@pytest.fixture(scope="module")
def attempts(spark):
    t = datetime(2024, 1, 15, tzinfo=timezone.utc)
    return spark.createDataFrame(
        [
            ("a1", "e1", "t1", "d1", "webhook", "success", "200", 1, False, t,
             '{"ok":true}', '{"k":1}', t, True, "user.created", {"m": "1"}),
        ],
        "attempt_id string, event_id string, tenant_id string, destination_id string, "
        "destination_type string, status string, code string, attempt_number int, "
        "manual boolean, attempt_time timestamp, response_data string, data string, "
        "event_time timestamp, eligible_for_retry boolean, topic string, "
        "metadata map<string,string>",
    )


def test_attempt_record_default_excludes_optional(attempts):
    row = attempt_record(attempts).collect()[0]
    assert "response_data" not in row.asDict()
    assert "event" not in row.asDict()
    assert row["attempt_id"] == "a1"


def test_attempt_record_include_event_and_data(attempts):
    row = attempt_record(
        attempts, include=("event", "event.data", "response_data")
    ).collect()[0]
    assert row["response_data"] == '{"ok":true}'
    ev = row["event"].asDict()
    assert ev["event_id"] == "e1"
    assert ev["time"] == datetime(2024, 1, 15)  # session tz is UTC
    assert ev["data"] == '{"k":1}'
