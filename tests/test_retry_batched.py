"""Batched retry-timer state table (streaming/retry.py::RetryStateTable)
— the scale path for ST2: per-micro-batch set-oriented merge instead of
per-key Python.  Semantics pinned two ways: unit transitions mirroring
the RetryScheduler suite (upsert/cancel/fire/DLQ/exhaustion — reference
internal/scheduler/scheduler.go:144-290, deliverymq/retry.go:25-138),
and randomized multi-batch PARITY against the pure-Python RetryScheduler
executable spec."""

import random

import pytest
from pyspark.sql import functions as F

from outpost_spark.functions.backoff import (
    ConstantBackoff,
    ExponentialBackoff,
    ScheduledBackoff,
    backoff_delay_col,
)
from outpost_spark.streaming.retry import RetryScheduler, RetryStateTable

OUTCOME_SCHEMA = (
    "event_id string, destination_id string, tenant_id string, "
    "status string, attempt_number int, eligible_for_retry boolean"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, OUTCOME_SCHEMA)


def outcome(eid, dest, status, n, tenant="t1", eligible=True):
    return (eid, dest, tenant, status, n, eligible)


@pytest.fixture()
def table(spark, tmp_path):
    return RetryStateTable(
        spark,
        str(tmp_path / "retry_state"),
        backoff=ExponentialBackoff(interval=30.0, base=2),
        retry_max_limit=10,
        max_receive_count=5,
    )


def _pending(table, batch_id):
    return {
        (r["event_id"], r["destination_id"]): r
        for r in table.state_before(batch_id).collect()
    }


def test_failure_schedules_with_backoff(spark, table):
    fired = table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=1000.0
    )
    assert fired.count() == 0
    st = _pending(table, 2)
    assert st[("e1", "d1")]["attempt_number"] == 2
    assert st[("e1", "d1")]["fire_at"] == 1000.0 + 30.0  # backoff(0)
    # attempt 3 failure -> retry 4 after interval * base^2
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 3)]), 2, now=2000.0
    )
    st = _pending(table, 3)
    assert st[("e1", "d1")]["attempt_number"] == 4
    assert st[("e1", "d1")]["fire_at"] == 2000.0 + 120.0


def test_upsert_replaces_pending_and_success_cancels(spark, table):
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=0.0
    )
    # re-schedule (manual retry overrides): replaces timing AND payload
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 2, tenant="t2")]), 2, now=5.0
    )
    st = _pending(table, 3)
    assert st[("e1", "d1")]["tenant_id"] == "t2"
    assert st[("e1", "d1")]["attempt_number"] == 3
    assert st[("e1", "d1")]["fire_at"] == 5.0 + 60.0
    # success cancels the pending retry
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "success", 3)]), 3, now=6.0
    )
    assert _pending(table, 4) == {}


def test_highest_attempt_governs_within_batch_ties_prefer_success(spark, table):
    # one batch carries multiple outcomes for a key: the max attempt
    # wins; equal attempts resolve to success (cancel) deterministically
    table.apply_outcomes(
        _df(
            spark,
            [
                outcome("e1", "d1", "failed", 2),
                outcome("e1", "d1", "success", 1),
                outcome("e2", "d1", "failed", 1),
                outcome("e2", "d1", "success", 1),
            ],
        ),
        1,
        now=0.0,
    )
    st = _pending(table, 2)
    assert st[("e1", "d1")]["attempt_number"] == 3  # failed@2 governs
    assert ("e2", "d1") not in st  # tie -> success -> cancel


def test_exhaustion_cancels_and_ineligible_is_noop(spark, table):
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=0.0
    )
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 11)]), 2, now=1.0
    )  # beyond retry_max_limit=10: exhausted, nothing further
    assert _pending(table, 3) == {}
    # ineligible failure with no pending state: still nothing scheduled
    table.apply_outcomes(
        _df(spark, [outcome("e2", "d2", "failed", 1, eligible=False)]),
        3,
        now=2.0,
    )
    assert _pending(table, 4) == {}
    # ineligible failure is a NO-OP, not a cancel: a pending timer
    # SURVIVES it (RetryScheduler.on_attempt returns before popping)
    table.apply_outcomes(
        _df(spark, [outcome("e2", "d2", "failed", 1)]), 4, now=3.0
    )
    table.apply_outcomes(
        _df(spark, [outcome("e2", "d2", "failed", 2, eligible=False)]),
        5,
        now=4.0,
    )
    st = _pending(table, 6)
    assert st[("e2", "d2")]["attempt_number"] == 2  # the batch-4 upsert
    # mixed same-batch outcomes: the latest ACTIONABLE one governs —
    # [failed@3 eligible, failed@4 ineligible] folds to an upsert from
    # attempt 3 (pending attempt 4), the ineligible tail is a no-op
    table.apply_outcomes(
        _df(
            spark,
            [
                outcome("e2", "d2", "failed", 3),
                outcome("e2", "d2", "failed", 4, eligible=False),
            ],
        ),
        6,
        now=5.0,
    )
    st = _pending(table, 7)
    assert st[("e2", "d2")]["attempt_number"] == 4


def test_fire_pops_and_rescheduled_entries_restart_receive_count(
    spark, tmp_path
):
    """A fire pops the entry; a LATER failure outcome re-schedules from
    scratch (receive_count restarts — same as RetryScheduler, where the
    count only survives through requeue)."""
    table = RetryStateTable(
        spark,
        str(tmp_path / "rs2"),
        backoff=ConstantBackoff(interval=10.0),
        max_receive_count=2,
    )
    for b in range(1, 4):
        table.apply_outcomes(
            _df(spark, [outcome("e1", "d1", "failed", b)]), 2 * b, now=100.0 * b
        )
        fired = table.apply_outcomes(None, 2 * b + 1, now=100.0 * b + 11.0)
        rows = fired.collect()
        assert len(rows) == 1
        assert rows[0]["receive_count"] == 1
        assert rows[0]["attempt_number"] == b + 1
        assert rows[0]["dlq"] is False
        # fired entries leave the state
        assert _pending(table, 2 * b + 2) == {}


def test_requeue_keeps_receive_count_until_dlq(spark, tmp_path):
    """Fired-but-processing-failed tasks requeue with their receive
    count (RetryScheduler.requeue): repeated fire->fail loops cross the
    max_receive_count cap and divert to the DLQ."""
    table = RetryStateTable(
        spark,
        str(tmp_path / "rs4"),
        backoff=ConstantBackoff(interval=10.0),
        max_receive_count=2,
    )
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=0.0
    )
    fired = table.apply_outcomes(None, 2, now=11.0)
    rcs = []
    for b in range(3, 6):
        fired = table.apply_outcomes(
            None, b, now=11.0 + b, requeue_df=fired
        )
        rows = fired.collect()
        assert len(rows) == 1
        rcs.append((rows[0]["receive_count"], rows[0]["dlq"]))
    assert rcs == [(2, False), (3, True), (4, True)]
    # outcomes upsert OVER a requeued entry in the same batch
    fired2 = table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "success", 9)]),
        7,
        now=100.0,
        requeue_df=fired,
    )
    assert fired2.count() == 0
    assert _pending(table, 8) == {}


def test_rerun_same_batch_is_idempotent(spark, table):
    df = _df(
        spark,
        [outcome("e1", "d1", "failed", 1), outcome("e2", "d1", "failed", 5)],
    )
    table.apply_outcomes(df, 1, now=0.0)
    f_a = sorted(
        map(tuple, table.apply_outcomes(None, 2, now=31.0).collect())
    )
    st_a = _pending(table, 3)
    # crash-recovery re-run of batch 2: same inputs, same outputs
    f_b = sorted(
        map(tuple, table.apply_outcomes(None, 2, now=31.0).collect())
    )
    assert f_a == f_b
    assert _pending(table, 3).keys() == st_a.keys()


def test_parity_with_retry_scheduler_randomized(spark, tmp_path):
    """Randomized multi-batch parity against the executable spec: same
    fired (key, attempt, receive_count, dlq) sets and same pending keys
    after every batch.  Outcomes mix success / eligible-failure /
    INELIGIBLE-failure (the no-op path); one outcome per key per batch
    keeps both models in their common semantic core."""
    rng = random.Random(42)
    bo = ExponentialBackoff(interval=10.0, base=2)
    sched = RetryScheduler(backoff=bo, retry_max_limit=6, max_receive_count=3)
    table = RetryStateTable(
        spark,
        str(tmp_path / "rs3"),
        backoff=bo,
        retry_max_limit=6,
        max_receive_count=3,
    )
    keys = [(f"e{i}", f"d{i % 3}") for i in range(12)]
    now = 0.0
    for batch_id in range(1, 9):
        now += rng.choice([5.0, 15.0, 40.0, 90.0])
        rows = []
        for eid, dest in rng.sample(keys, rng.randint(1, 8)):
            n = rng.randint(1, 8)
            status = rng.choice(["failed", "failed", "success"])
            eligible = status == "success" or rng.random() > 0.3
            rows.append(outcome(eid, dest, status, n, eligible=eligible))
        # spec: outcomes in attempt order, then fire the due slice
        for r in sorted(rows, key=lambda x: x[4]):
            sched.on_attempt(
                event_id=r[0],
                destination_id=r[1],
                tenant_id=r[2],
                attempt_number=r[4],
                success=r[3] == "success",
                eligible_for_retry=r[5],
                now=now,
            )
        want_fired = {
            (t["event_id"], t["destination_id"], t["attempt_number"],
             t["receive_count"], t["dlq"])
            for t in sched.fire_due(now)
        }
        got = table.apply_outcomes(_df(spark, rows), batch_id, now=now)
        got_fired = {
            (r["event_id"], r["destination_id"], r["attempt_number"],
             r["receive_count"], r["dlq"])
            for r in got.collect()
        }
        assert got_fired == want_fired, f"batch {batch_id}"
        got_pending = _pending(table, batch_id + 1)
        assert set(got_pending) == set(sched.pending), f"batch {batch_id}"
        for k, v in sched.pending.items():
            assert got_pending[k]["attempt_number"] == v["attempt_number"]
            assert got_pending[k]["fire_at"] == pytest.approx(v["fire_at"])


def test_retry_stream_fires_due_timer_on_idle_stream(spark, tmp_path):
    """The reference scheduler fires due retries on TIME, not traffic
    (internal/scheduler/scheduler.go:144-164 poll loop).  retry_stream's
    rate-tick union must therefore fire a scheduled retry even when the
    outcome stream goes COMPLETELY idle after the scheduling batch —
    the defect this pins: foreachBatch alone would wait forever for the
    next outcome."""
    import json
    import threading
    import time

    src = tmp_path / "outcomes"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "event_id": "e1",
                    "destination_id": "d1",
                    "tenant_id": "t1",
                    "status": "failed",
                    "attempt_number": 1,
                    "eligible_for_retry": True,
                }
            )
        )
    fired_rows: list = []
    lock = threading.Lock()

    def sink(df, batch_id):
        rows = df.collect()
        with lock:
            fired_rows.extend(rows)

    from outpost_spark.streaming.retry import retry_stream

    stream = spark.readStream.schema(OUTCOME_SCHEMA).json(str(src))
    q = retry_stream(
        stream,
        str(tmp_path / "state"),
        sink,
        checkpoint=str(tmp_path / "ckpt"),
        backoff=ConstantBackoff(interval=2.0),
        trigger_interval="1 second",
    )
    try:
        deadline = time.time() + 90.0
        while time.time() < deadline:
            with lock:
                if fired_rows:
                    break
            time.sleep(0.25)
    finally:
        q.stop()
    assert fired_rows, "due retry never fired on the idle stream"
    r = fired_rows[0]
    assert r["event_id"] == "e1"
    assert r["attempt_number"] == 2  # retry of attempt 1
    assert r["receive_count"] == 1
    assert r["dlq"] is False


def test_backoff_delay_col_matches_python(spark):
    policies = [
        ExponentialBackoff(interval=7.0, base=3),
        ConstantBackoff(interval=12.5),
        ScheduledBackoff(schedule=(1.0, 5.0, 25.0)),
        ScheduledBackoff(schedule=()),
    ]
    df = spark.range(8).select(F.col("id").cast("int").alias("retries"))
    for bo in policies:
        got = [
            r["d"]
            for r in df.select(
                backoff_delay_col(bo, F.col("retries")).alias("d")
            )
            .orderBy("retries")
            .collect()
        ]
        want = [bo.duration(i) for i in range(8)]
        assert got == pytest.approx(want), type(bo).__name__


def test_apply_outcomes_plan_has_no_cartesian_or_python(spark, table):
    """Scale claim of the batched transition: one max_by aggregate, one
    key-keyed merge join, zero Python stages, zero cartesian products in
    the fired-slice plan."""
    table.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=0.0
    )
    df = table.state_before(2)
    batch = _df(spark, [outcome("e1", "d1", "failed", 2)])
    from pyspark.sql import functions as F  # noqa: F401

    # rebuild the merge plan the way apply_outcomes does, without the
    # writes, to inspect it
    from outpost_spark.functions.backoff import backoff_delay_col

    latest = (
        batch.groupBy("event_id", "destination_id")
        .agg(
            F.max_by(
                F.struct("tenant_id", "attempt_number", "status", "eligible_for_retry"),
                F.struct(F.col("attempt_number"), F.col("status")),
            ).alias("o")
        )
        .select("event_id", "destination_id", "o.*")
    )
    j = df.alias("s").join(
        latest.alias("u"), on=["event_id", "destination_id"], how="full_outer"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


def test_due_slice_boundary_fires_at_exact_now(spark, tmp_path):
    """The due slice is ``fire_at <= now`` INCLUSIVE (VERDICT r14 #2:
    pin the wave-edge semantics the closed-loop bench leans on): a
    timer scheduled with zero backoff at now=T is due in the SAME
    apply_outcomes call, and one scheduled an epsilon later stays
    pending until the clock actually reaches it."""
    from outpost_spark.functions.backoff import ConstantBackoff

    t = RetryStateTable(
        spark,
        str(tmp_path / "boundary_state"),
        backoff=ConstantBackoff(interval=0.0),
        retry_max_limit=10,
        max_receive_count=5,
    )
    # zero delay: fire_at == now -> fires in the same call (the
    # closed-loop bench's wave structure depends on this inclusivity)
    fired = t.apply_outcomes(
        _df(spark, [outcome("e1", "d1", "failed", 1)]), 1, now=100.0
    )
    assert [(r["event_id"], r["attempt_number"]) for r in fired.collect()] == [
        ("e1", 2)
    ]
    assert _pending(t, 2) == {}

    t2 = RetryStateTable(
        spark,
        str(tmp_path / "boundary_state_eps"),
        backoff=ConstantBackoff(interval=0.5),
        retry_max_limit=10,
        max_receive_count=5,
    )
    assert (
        t2.apply_outcomes(
            _df(spark, [outcome("e2", "d1", "failed", 1)]), 1, now=100.0
        ).count()
        == 0
    )
    # a tick strictly before fire_at leaves it pending...
    assert t2.apply_outcomes(None, 2, now=100.4999).count() == 0
    # ...and the tick AT fire_at fires it (<=, not <)
    fired = t2.apply_outcomes(None, 3, now=100.5)
    assert [r["event_id"] for r in fired.collect()] == ["e2"]
    assert _pending(t2, 4) == {}
