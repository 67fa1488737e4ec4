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


# ───────────────────── credential encryption at rest (crypto.py) ─────────────────────


@pytest.fixture(scope="module")
def secret_dests(spark):
    return spark.createDataFrame(
        [
            ("d1", "t1", {"api_key": "sk_live_abcdef123456", "user": "alice"}, '{"idx":1}'),
            ("d2", "t1", {"token": "tok_9f8e7d"}, None),
            ("d3", "t2", None, '{"idx":3}'),
        ],
        "id string, tenant_id string, credentials map<string,string>, delivery_metadata string",
    )


def test_credentials_encrypt_decrypt_roundtrip(secret_dests):
    from outpost_spark.tenantstore import (
        decrypt_destination_secrets,
        encrypt_destination_secrets,
    )

    enc = encrypt_destination_secrets(secret_dests, "s3cr3t")
    enc_rows = {r["id"]: r for r in enc.collect()}
    # sealed columns are binary, plaintext gone
    assert isinstance(enc_rows["d1"]["credentials"], (bytes, bytearray))
    assert b"sk_live" not in bytes(enc_rows["d1"]["credentials"])
    assert enc_rows["d3"]["credentials"] is None  # null passes through

    dec = decrypt_destination_secrets(enc, "s3cr3t")
    out = {r["id"]: r for r in dec.collect()}
    assert out["d1"]["credentials"] == {"api_key": "sk_live_abcdef123456", "user": "alice"}
    assert out["d2"]["credentials"] == {"token": "tok_9f8e7d"}
    assert out["d3"]["credentials"] is None
    # string-typed delivery_metadata round-trips to the ORIGINAL string by
    # default (sealed as-is -> returned verbatim, no from_json coercion)
    assert out["d1"]["delivery_metadata"] == '{"idx":1}'
    assert out["d2"]["delivery_metadata"] is None
    # an explicit per-column schema still parses it into a typed shape
    dec_md = decrypt_destination_secrets(
        enc, "s3cr3t", cols=("delivery_metadata",),
        schemas={"delivery_metadata": "map<string,int>"},
    )
    md = {r["id"]: r["delivery_metadata"] for r in dec_md.collect()}
    assert md["d1"] == {"idx": 1} and md["d3"] == {"idx": 3} and md["d2"] is None


def test_cipher_wire_format_matches_reference(secret_dests):
    """cipher.go:16-30 — output must be nonce(12) || ciphertext || tag(16),
    and a fresh random nonce per seal (same plaintext, different bytes)."""
    from outpost_spark.tenantstore import encrypt_expr

    df = secret_dests.filter(F.col("id") == "d1").select(
        encrypt_expr(F.lit("payload-xyz"), "k1").alias("a"),
        encrypt_expr(F.lit("payload-xyz"), "k1").alias("b"),
    )
    r = df.collect()[0]
    assert len(bytes(r["a"])) == 12 + len(b"payload-xyz") + 16
    assert bytes(r["a"]) != bytes(r["b"])  # random nonce per call


def test_decrypt_wrong_key_strict_raises_lenient_nulls(secret_dests):
    from outpost_spark.tenantstore import (
        decrypt_destination_secrets,
        encrypt_destination_secrets,
    )

    enc = encrypt_destination_secrets(secret_dests, "right-key")
    with pytest.raises(Exception):
        decrypt_destination_secrets(enc, "wrong-key").collect()
    lenient = decrypt_destination_secrets(enc, "wrong-key", strict=False)
    assert all(r["credentials"] is None for r in lenient.collect())
    # and the right key still works after the failed scan
    ok = decrypt_destination_secrets(enc, "right-key")
    assert {r["id"]: r["credentials"] for r in ok.collect()}["d2"] == {"token": "tok_9f8e7d"}


# ───────────────── include[] wired end-to-end into the list path ─────────────────


@pytest.fixture(scope="module")
def attempts_multi(spark):
    rows = []
    for i in range(1, 6):
        t = datetime(2024, 1, 15, 12, i, tzinfo=timezone.utc)
        rows.append(
            (f"a{i}", f"e{i}", "t1", "d1" if i % 2 else "d-gone", "webhook",
             "success", "200", 1, False, t, '{"ok":true}', '{"k":%d}' % i,
             t, True, "user.created", {"m": str(i)})
        )
    return spark.createDataFrame(
        rows,
        "attempt_id string, event_id string, tenant_id string, destination_id string, "
        "destination_type string, status string, code string, attempt_number int, "
        "manual boolean, attempt_time timestamp, response_data string, data string, "
        "event_time timestamp, eligible_for_retry boolean, topic string, "
        "metadata map<string,string>",
    )


@pytest.fixture(scope="module")
def dest_dim(spark):
    return spark.createDataFrame(
        [("d1", "t1", "webhook", ["*"], {}, {"api_key": "sk_live_abcdef123456"})],
        DEST_SCHEMA,
    )


def test_list_attempts_include_matrix(attempts_multi, dest_dim):
    from outpost_spark.logstore.lists import ListRequest, list_attempts

    # default shape: raw row, no shaping applied
    plain = list_attempts(attempts_multi, ListRequest(limit=10))
    assert "response_data" in plain.items[0].asDict()

    # include=() equivalents of the reference matrix (log_handlers.go:54-78)
    shaped = list_attempts(
        attempts_multi,
        ListRequest(limit=10),
        include=("event", "event.data", "response_data", "destination"),
        destinations_df=dest_dim,
        sensitive_credentials=["api_key"],
    )
    assert len(shaped.items) == 5
    by_id = {r["attempt_id"]: r for r in shaped.items}
    r = by_id["a1"]
    assert r["response_data"] == '{"ok":true}'
    assert r["event"]["event_id"] == "e1" and r["event"]["data"] == '{"k":1}'
    # destination expanded with obfuscated credentials
    d = r["destination"]
    assert d["id"] == "d1"
    assert d["credentials"]["api_key"].startswith("sk_l")
    assert set(d["credentials"]["api_key"][4:]) == {"*"}
    # missing destination -> NULL struct (nil destDisplay)
    assert by_id["a2"]["destination"] is None

    # event without data: nested struct has no 'data' field
    ev_only = list_attempts(attempts_multi, ListRequest(limit=10), include=("event",))
    assert "data" not in ev_only.items[0]["event"].asDict()
    assert "response_data" not in ev_only.items[0].asDict()


def test_list_attempts_include_preserves_pagination(attempts_multi):
    from outpost_spark.logstore.lists import ListRequest, list_attempts

    p1 = list_attempts(attempts_multi, ListRequest(limit=2), include=("event",))
    assert [r["attempt_id"] for r in p1.items] == ["a5", "a4"]
    p2 = list_attempts(
        attempts_multi, ListRequest(limit=2, next=p1.next), include=("event",)
    )
    assert [r["attempt_id"] for r in p2.items] == ["a3", "a2"]
    back = list_attempts(
        attempts_multi, ListRequest(limit=2, prev=p2.prev), include=("event",)
    )
    assert [r["attempt_id"] for r in back.items] == ["a5", "a4"]
