"""Deployment-ID namespacing: two deployments share one warehouse path.

Mirrors the reference's table-prefix isolation (chlogstore.go:34-44) and
key-prefix isolation (redistenantstore.go:98-122).
"""

from datetime import datetime, timezone

import pytest

from outpost_spark.deployment import DeploymentLayout, InvalidDeploymentID
from outpost_spark.logstore.insert import insert_many


def _entries(spark, tag):
    t = datetime(2024, 1, 15, 12, 0, tzinfo=timezone.utc)
    rows = [
        (f"{tag}-a{i}", f"{tag}-e{i}", "t1", "d1", "webhook", "success", "200",
         1, False, t, "{}", "{}", t, True, "user.created", {})
        for i in range(3)
    ]
    return spark.createDataFrame(
        rows,
        "attempt_id string, event_id string, tenant_id string, destination_id string, "
        "destination_type string, status string, code string, attempt_number int, "
        "manual boolean, attempt_time timestamp, response_data string, data string, "
        "event_time timestamp, eligible_for_retry boolean, topic string, "
        "metadata map<string,string>",
    )


def test_layout_paths_and_prefix(tmp_path):
    root = str(tmp_path / "wh")
    a = DeploymentLayout(root, "dep-a")
    default = DeploymentLayout(root)
    assert a.prefix == "dep-a_"
    assert default.prefix == ""  # empty-id branch, chlogstore.go:35-38
    assert a.events_path == f"{root}/dep-a_events"
    assert default.events_path == f"{root}/events"
    assert a.checkpoint_path("log") == f"{root}/_checkpoints/dep-a/log"
    assert a.checkpoint_path("log") != default.checkpoint_path("log")
    # '_' is legal in ids AND stream names: the directory-component layout
    # keeps ("a", "x_y") and ("a_x", "y") from sharing a checkpoint dir
    assert DeploymentLayout(root, "a").checkpoint_path("x_y") != DeploymentLayout(
        root, "a_x"
    ).checkpoint_path("y")


@pytest.mark.parametrize("bad", ["../escape", "a/b", "", " ", "_x", "a b", "a:b"])
def test_invalid_deployment_ids_rejected(bad, tmp_path):
    if bad == "":
        DeploymentLayout(str(tmp_path))  # empty means "no namespacing", allowed
        return
    with pytest.raises((InvalidDeploymentID, ValueError)):
        DeploymentLayout(str(tmp_path), bad)


def test_two_deployments_share_warehouse_without_collision(spark, tmp_path):
    root = str(tmp_path / "wh")
    a = DeploymentLayout(root, "dep-a")
    b = DeploymentLayout(root, "dep-b")

    insert_many(_entries(spark, "A"), a.events_path, a.attempts_path)
    insert_many(_entries(spark, "B"), b.events_path, b.attempts_path)

    ev_a = spark.read.parquet(a.events_path)
    ev_b = spark.read.parquet(b.events_path)
    assert {r["event_id"] for r in ev_a.collect()} == {"A-e0", "A-e1", "A-e2"}
    assert {r["event_id"] for r in ev_b.collect()} == {"B-e0", "B-e1", "B-e2"}

    # warehouse-root listing shows disjoint prefixed dirs; checkpoints dir
    # is underscore-prefixed so partition discovery on the root ignores it
    import os

    names = sorted(os.listdir(root))
    assert "dep-a_events" in names and "dep-b_events" in names
    assert "events" not in names


def test_emission_order_rotates_unwitnessed_first():
    """The driver caps correctness rows (50/round); _emit_order must put
    entries ABSENT from the latest CORRECTNESS round ahead of everything
    witnessed there, never-witnessed entries first of all, and never
    drop a registered entry (the rotation contract from round 4)."""
    import json
    import os

    from outpost_spark import queries_catalog as qc

    order = qc._emit_order()
    assert set(order) == set(qc._REGISTRY)
    root = os.path.dirname(os.path.dirname(os.path.abspath(qc.__file__)))
    hist = qc._witness_history()
    latest = max(hist.values(), default=0)
    if latest == 0:
        return  # fresh checkout: pure cost order, nothing to rotate
    latest_file = os.path.join(root, f"CORRECTNESS_r{latest:02d}.json")
    with open(latest_file) as fh:
        witnessed_latest = set(json.load(fh))
    pos = {n: i for i, n in enumerate(order)}
    stale = [n for n in order if hist.get(n, 0) < latest]
    if stale and witnessed_latest & set(order):
        max_stale = max(pos[n] for n in stale)
        min_latest = min(pos[n] for n in order if n in witnessed_latest)
        assert max_stale < min_latest, (
            "a latest-round-witnessed entry outranks a stale one"
        )
    never = [n for n in order if n not in hist]
    if never and stale != never:
        seen_before = [n for n in stale if n in hist]
        if seen_before:
            assert max(pos[n] for n in never) < min(pos[n] for n in seen_before)
