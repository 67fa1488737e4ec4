"""Routing fan-out conformance — MatchEvent semantics from
tenantstore/drivertest/match.go: topic matching, filter matching,
disabled destinations, topic-before-filter precedence."""

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from outpost_spark.routing.match import fanout_delivery_tasks, match_events

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.StringType()),
    ]
)

DEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("tenant_id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("filter", T.StringType()),
        T.StructField("disabled_at", T.TimestampType()),
    ]
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _ev(eid, tenant, topic, data=None, metadata=None):
    return (eid, tenant, topic, T0, metadata or {}, json.dumps(data or {}))


def _dest(did, tenant, topics, filter_doc=None, disabled=False):
    return (
        did,
        tenant,
        "webhook",
        topics,
        json.dumps(filter_doc) if filter_doc is not None else None,
        T0 if disabled else None,
    )


@pytest.fixture(scope="module")
def dfs(spark):
    events = spark.createDataFrame(
        [
            _ev("e1", "t1", "order.created", {"type": "premium", "amount": 120}),
            _ev("e2", "t1", "order.updated", {"type": "basic"}),
            _ev("e3", "t1", "user.created", {"nested": {"flag": True}}),
            _ev("e4", "t2", "order.created", {"type": "premium"}),
            _ev("e5", "t1", "billing.paid", {}),
        ],
        EV_SCHEMA,
    )
    dests = spark.createDataFrame(
        [
            _dest("all_topics", "t1", ["*"]),
            _dest("orders_glob", "t1", ["order.*"]),
            _dest("created_only", "t1", ["order.created", "user.created"]),
            _dest("disabled_all", "t1", ["*"], disabled=True),
            _dest("premium_filter", "t1", ["*"], {"data": {"type": "premium"}}),
            _dest(
                "topic_and_filter",
                "t1",
                ["order.updated"],
                {"data": {"type": "premium"}},
            ),
            _dest("nested_filter", "t1", ["*"], {"data": {"nested": {"flag": True}}}),
            _dest("tenant2_dest", "t2", ["*"]),
        ],
        DEST_SCHEMA,
    )
    return events, dests


def _matches(spark_out):
    return {
        r["event_id"]: sorted(r["matched_destination_ids"] or [])
        for r in spark_out.collect()
    }


def test_fanout_matrix(dfs):
    events, dests = dfs
    got = _matches(match_events(events, dests))
    # e1 order.created premium: all_topics, orders_glob, created_only, premium_filter
    assert got["e1"] == ["all_topics", "created_only", "orders_glob", "premium_filter"]
    # e2 order.updated basic: filter on topic_and_filter fails (not premium)
    assert got["e2"] == ["all_topics", "orders_glob"]
    # e3 user.created nested: created_only + nested filter + all_topics
    assert got["e3"] == ["all_topics", "created_only", "nested_filter"]
    # e4 tenant isolation
    assert got["e4"] == ["tenant2_dest"]
    # e5 unmatched topic globs still hits '*' destinations
    assert got["e5"] == ["all_topics"]


def test_disabled_destination_never_matches(dfs):
    events, dests = dfs
    got = _matches(match_events(events, dests))
    assert all("disabled_all" not in v for v in got.values())


def test_fanout_delivery_tasks_explode(dfs):
    events, dests = dfs
    tasks = fanout_delivery_tasks(match_events(events, dests))
    rows = tasks.select("event_id", "destination_id", "attempt", "manual").collect()
    per_event = {}
    for r in rows:
        per_event.setdefault(r["event_id"], []).append(r["destination_id"])
        assert r["attempt"] == 1 and r["manual"] is False
    assert sorted(per_event["e1"]) == [
        "all_topics",
        "created_only",
        "orders_glob",
        "premium_filter",
    ]
    # e5 had one match; events with zero matches produce no tasks
    assert "e4" in per_event


def test_event_with_no_destinations_keeps_empty_array(spark, dfs):
    events, dests = dfs
    lonely = spark.createDataFrame([_ev("e9", "t9", "x.y", {})], EV_SCHEMA)
    got = _matches(match_events(lonely, dests))
    assert got["e9"] == []


def test_wildcard_topic_families(spark):
    """match.go MatchByWildcardTopic: prefix/suffix/middle wildcard patterns
    are separator-agnostic; unrelated topics never overmatch."""
    events = spark.createDataFrame(
        [
            _ev("w1", "t9", "user.created"),
            _ev("w2", "t9", "order.payment.completed"),
            _ev("w3", "t9", "order.payment.failed"),
        ],
        EV_SCHEMA,
    )
    dests = spark.createDataFrame(
        [
            _dest("dest_user_family", "t9", ["user.*"]),
            _dest("dest_created_family", "t9", ["*.created"]),
            _dest("dest_order_completed_family", "t9", ["order.*.completed"]),
            _dest("dest_exact", "t9", ["user.created"]),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, dests))
    assert got["w1"] == ["dest_created_family", "dest_exact", "dest_user_family"]
    assert got["w2"] == ["dest_order_completed_family"]
    assert got["w3"] == []


def test_match_ignores_event_destination_id(spark):
    """match.go: MatchEvent matches by topic/filter only — an explicit (even
    non-existent or topic-mismatched) event.destination_id is ignored by the
    matcher; the explicit-destination path is a separate point check."""
    events = spark.createDataFrame(
        [
            ("d1", "t9", "user.created", T0, {}, "{}"),
            ("d2", "t9", "user.created", T0, {}, "{}"),
        ],
        "event_id string, tenant_id string, topic string, event_time timestamp, "
        "metadata map<string,string>, data string",
    ).withColumn("destination_id", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("not-found"))
    dests = spark.createDataFrame(
        [
            _dest("a", "t9", ["user.created"]),
            _dest("b", "t9", ["user.*"]),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, dests))
    assert got["d1"] == ["a", "b"]
    assert got["d2"] == ["a", "b"]


def test_explicit_destination_point_check(spark):
    """eventhandler.go:204-224: an explicit destination_id is point-checked
    against that destination only; missing / topic-mismatched / disabled
    explicit destinations yield an empty match; events without an explicit
    id fan out normally."""
    from pyspark.sql import functions as F

    from outpost_spark.routing.match import match_events_with_explicit

    base = spark.createDataFrame(
        [
            ("x1", "t9", "user.created", T0, {}, "{}", "a"),         # matches a only
            ("x2", "t9", "user.created", T0, {}, "{}", "missing"),   # no such dest
            ("x3", "t9", "user.created", T0, {}, "{}", "c"),         # topic mismatch
            ("x4", "t9", "user.created", T0, {}, "{}", None),        # normal fanout
            ("x5", "t9", "user.created", T0, {}, "{}", "dis"),       # disabled
        ],
        "event_id string, tenant_id string, topic string, event_time timestamp, "
        "metadata map<string,string>, data string, destination_id string",
    )
    dests = spark.createDataFrame(
        [
            _dest("a", "t9", ["user.created"]),
            _dest("b", "t9", ["user.*"]),
            _dest("c", "t9", ["order.created"]),
            _dest("dis", "t9", ["*"], disabled=True),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events_with_explicit(base, dests))
    assert got["x1"] == ["a"]
    assert got["x2"] == []
    assert got["x3"] == []
    assert got["x4"] == ["a", "b"]
    assert got["x5"] == []


@pytest.mark.slow
def test_compiled_filter_mode_matches_udf_mode(dfs):
    """P8 fast path: plan-time-compiled filter predicates produce exactly
    the same routing decisions as the UDF interpreter on the full fixture
    matrix (premium filter, nested filter, topic+filter combos)."""
    events, dests = dfs
    via_udf = _matches(match_events(events, dests, filter_mode="udf"))
    via_compiled = _matches(match_events(events, dests, filter_mode="compiled"))
    assert via_compiled == via_udf


@pytest.mark.slow
def test_compiled_static_mode_plan_has_no_python(dfs):
    """The compiled_static routing path must keep filter evaluation
    JVM-side: when every filter doc compiles, the physical plan contains no
    Python evaluation node at all.  (The default "compiled" mode carries a
    UDF fallback branch for docs added after plan time — correct under hot
    updates, but Spark extracts the UDF eagerly, so only compiled_static
    makes the zero-Python guarantee.)"""
    from outpost_spark.routing.match import match_pairs

    events, dests = dfs
    plan = (
        match_pairs(events, dests, filter_mode="compiled_static")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF", "FlatMapsInPandas"):
        assert marker not in plan, f"Python node {marker} in compiled routing plan"


def test_compiled_default_matches_docs_outside_plan_snapshot(dfs, monkeypatch):
    """Default mode must route events for filter docs the compiled chain
    never saw (hot-added destinations): the chain's fallback is the
    interpreter, not lit(False).  Simulated by forcing the plan-time
    snapshot to be empty — every doc is then 'added after plan time'."""
    from pyspark.sql import functions as F

    from outpost_spark.routing import match as M

    events, dests = dfs
    expected = {
        (r["event_id"], r["destination_id"])
        for r in M.match_pairs(events, dests, filter_mode="udf").collect()
    }
    orig = M._compiled_filter_predicate
    monkeypatch.setattr(
        M,
        "_compiled_filter_predicate",
        lambda d, **kw: orig(d.filter(F.lit(False)), **kw),
    )
    got = {
        (r["event_id"], r["destination_id"])
        for r in M.match_pairs(events, dests, filter_mode="compiled").collect()
    }
    assert got == expected  # unseen docs fall through to the interpreter
    # compiled_static with the same starved snapshot drops filtered docs
    # (its documented static contract) — pinning the difference
    static = {
        (r["event_id"], r["destination_id"])
        for r in M.match_pairs(events, dests, filter_mode="compiled_static").collect()
    }
    assert static <= expected


@pytest.mark.slow
def test_compiled_mode_nested_array_payloads(spark):
    """Events whose payloads hold nested arrays must route identically on
    the compiled and UDF paths (recursivelyMatchValue, match.go:115-185) —
    the round-1 compiled path silently dropped these."""
    events = spark.createDataFrame(
        [
            _ev("n1", "t9", "a.b", {"a": [[1], 2]}),
            _ev("n2", "t9", "a.b", {"a": [3]}),
            _ev("n3", "t9", "a.b", {"a": [[{"k": "v"}]]}),
        ],
        EV_SCHEMA,
    )
    dests = spark.createDataFrame(
        [
            _dest("want_one", "t9", ["*"], {"data": {"a": 1}}),
            _dest("want_obj", "t9", ["*"], {"data": {"a": {"k": "v"}}}),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, dests, filter_mode="compiled"))
    via_udf = _matches(match_events(events, dests, filter_mode="udf"))
    assert got == via_udf
    assert got["n1"] == ["want_one"]
    assert got["n2"] == []
    assert got["n3"] == ["want_obj"]

def test_topic_filter_precedence_before_content_filter(spark):
    """match.go 'topic filter takes precedence before content filter': a
    destination whose topics don't include the event's topic never matches,
    even when the content filter would — the filter is only consulted after
    the topic gate passes."""
    events = spark.createDataFrame(
        [_ev("p1", "t9", "order", {"type": "order.created"})], EV_SCHEMA
    )
    dests = spark.createDataFrame(
        [
            _dest(
                "dest_topic_and_filter",
                "t9",
                ["user.created"],
                {"data": {"type": "order.created"}},
            )
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, dests))
    assert got["p1"] == []


def test_match_after_destination_updated(spark):
    """match.go 'match after destination is updated': matching is pure over
    the current destinations snapshot — after a destination's topics change,
    the same event matches against the new subscription set."""
    events = spark.createDataFrame(
        [_ev("u1", "t9", "user.created"), _ev("u2", "t9", "user.updated")], EV_SCHEMA
    )
    before = spark.createDataFrame(
        [
            _dest("wildcard", "t9", ["*"]),
            _dest("mover", "t9", ["user.updated"]),
            _dest("created", "t9", ["user.created"]),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, before))
    assert got["u1"] == ["created", "wildcard"]
    assert got["u2"] == ["mover", "wildcard"]

    # upsert: mover now subscribes to user.created instead
    after = spark.createDataFrame(
        [
            _dest("wildcard", "t9", ["*"]),
            _dest("mover", "t9", ["user.created"]),
            _dest("created", "t9", ["user.created"]),
        ],
        DEST_SCHEMA,
    )
    got = _matches(match_events(events, after))
    assert got["u1"] == ["created", "mover", "wildcard"]
    assert got["u2"] == ["wildcard"]


def test_disable_then_reenable_destination(spark):
    """match.go DisableAndMatch: disabling removes a destination from the
    match set; clearing disabled_at restores it."""
    events = spark.createDataFrame([_ev("d1", "t9", "user.deleted")], EV_SCHEMA)
    enabled = spark.createDataFrame(
        [_dest("a", "t9", ["*"]), _dest("b", "t9", ["user.deleted"])], DEST_SCHEMA
    )
    disabled = spark.createDataFrame(
        [_dest("a", "t9", ["*"], disabled=True), _dest("b", "t9", ["user.deleted"])],
        DEST_SCHEMA,
    )
    assert _matches(match_events(events, enabled))["d1"] == ["a", "b"]
    assert _matches(match_events(events, disabled))["d1"] == ["b"]
    # re-enabled (disabled_at back to NULL) -> matches again
    assert _matches(match_events(events, enabled))["d1"] == ["a", "b"]


def test_delete_and_match(spark):
    """match.go DeleteAndMatch: a deleted destination (absent from the
    snapshot) never matches."""
    events = spark.createDataFrame([_ev("x1", "t9", "user.created")], EV_SCHEMA)
    full = spark.createDataFrame(
        [
            _dest("gone", "t9", ["user.created"]),
            _dest("stay", "t9", ["user.*"]),
        ],
        DEST_SCHEMA,
    )
    pruned = full.filter("id != 'gone'")
    assert _matches(match_events(events, full))["x1"] == ["gone", "stay"]
    assert _matches(match_events(events, pruned))["x1"] == ["stay"]


def test_compiled_mode_depth_overflow_routes_to_interpreter(spark):
    """Payloads nesting arrays DEEPER than the compiler's unroll bound must
    still match exactly like the reference's unbounded recursion
    (match.go:115-185): the compiled chain detects the overflow row-wise
    and hands it to the interpreter instead of silently not matching."""
    deep_hit = {"a": [[[[[[1]]]]]]}  # 6 array levels > _MAX_ARRAY_DEPTH=4
    deep_miss = {"a": [[[[[[2]]]]]]}
    events = spark.createDataFrame(
        [
            _ev("d1", "t9", "a.b", deep_hit),
            _ev("d2", "t9", "a.b", deep_miss),
            _ev("d3", "t9", "a.b", {"a": [1]}),  # shallow control
        ],
        EV_SCHEMA,
    )
    dests = spark.createDataFrame(
        [_dest("want_one", "t9", ["*"], {"data": {"a": 1}})], DEST_SCHEMA
    )
    via_udf = _matches(match_events(events, dests, filter_mode="udf"))
    got = _matches(match_events(events, dests, filter_mode="compiled"))
    assert got == via_udf
    assert got["d1"] == ["want_one"]
    assert got["d2"] == []
    assert got["d3"] == ["want_one"]


def test_compile_overflow_is_none_for_dataless_docs(spark):
    """Docs with no data schemas can never overflow — the detector returns
    None so the chain skips the wrapper (no plan growth for the common
    topic/metadata-only filters)."""
    from outpost_spark.functions.jsonmatch_compiler import compile_overflow
    from pyspark.sql import functions as F

    assert compile_overflow({"topic": "a.b"}, data_col=F.col("data")) is None
    assert (
        compile_overflow(
            {"$or": [{"topic": "x"}, {"metadata": {"k": "v"}}]}, data_col=F.col("data")
        )
        is None
    )
    assert (
        compile_overflow({"data": {"a": 1}}, data_col=F.col("data")) is not None
    )
    # data schemas nested under envelope logic ops are found too
    assert (
        compile_overflow(
            {"$not": {"$and": [{"data": {"a": {"b": 1}}}]}}, data_col=F.col("data")
        )
        is not None
    )


def test_compiled_mode_overflow_behind_object_at_cutoff(spark):
    """The depth detector must mirror the predicate's object descent: an
    OBJECT sitting exactly at the unroll cutoff still descends with a
    fresh bound, so deep arrays on its child paths are undecidable for
    the compiled predicate and must route to the interpreter."""
    # 4 outer array levels (== the unroll bound), then an object whose
    # inspected path holds 5 MORE array levels
    deep_inner_hit = {"a": [[[[{"b": [[[[[1]]]]]}]]]]}
    deep_inner_miss = {"a": [[[[{"b": [[[[[2]]]]]}]]]]}
    events = spark.createDataFrame(
        [
            _ev("o1", "t9", "a.b", deep_inner_hit),
            _ev("o2", "t9", "a.b", deep_inner_miss),
            _ev("o3", "t9", "a.b", {"a": [{"b": [1]}]}),  # shallow control
        ],
        EV_SCHEMA,
    )
    dests = spark.createDataFrame(
        [_dest("want", "t9", ["*"], {"data": {"a": {"b": 1}}})], DEST_SCHEMA
    )
    via_udf = _matches(match_events(events, dests, filter_mode="udf"))
    got = _matches(match_events(events, dests, filter_mode="compiled"))
    assert got == via_udf
    assert got["o1"] == ["want"]
    assert got["o2"] == []
    assert got["o3"] == ["want"]


def test_routing_fanout_catalog_entry_is_zero_python(spark, sf_dir):
    """The benched routing_match_fanout entry (the throughput number the
    rounds track) must run the compiled_static zero-Python plan — its
    compiled JSON filter corpus is fully compilable, so any Python node
    appearing here means the fast path silently degraded."""
    from outpost_spark.queries_catalog import _REGISTRY

    df = _REGISTRY["routing_match_fanout"][0](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF", "FlatMapsInPandas"):
        assert marker not in plan, f"Python node {marker} in fan-out entry plan"
