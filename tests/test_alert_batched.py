"""Batched alert-state table (streaming/alerts.py::AlertStateTable) —
the scale path for ST3/ST4: per-micro-batch set-oriented evaluation
instead of per-key Python.  Semantics pinned two ways: unit transitions
mirroring the AlertStateMachine behaviors (threshold crossing, success
reset, replay idempotency, exhausted suppression, TTL expiry), and
randomized multi-batch PARITY against the pure-Python machine driven
sequentially — the same strategy test_retry_batched.py uses for ST2."""

import random
from collections import Counter

import pytest

from outpost_spark.streaming.alerts import (
    AlertStateMachine,
    AlertStateTable,
)

BATCH_SCHEMA = (
    "tenant_id string, destination_id string, attempt_id string, "
    "status string, attempt_number int, eligible_for_retry boolean, seq int"
)


def row(tenant, dest, aid, status, seq, n=1, eligible=True):
    return (tenant, dest, aid, status, n, eligible, seq)


def _df(spark, rows):
    return spark.createDataFrame(rows, BATCH_SCHEMA)


def _state(table, batch_id):
    return {
        (r["tenant_id"], r["destination_id"]): r
        for r in table.state_before(batch_id).collect()
    }


def _signals(df):
    return Counter(
        (
            r["tenant_id"],
            r["destination_id"],
            r["signal"],
            r["failures"],
            r["max_failures"],
            r["level"],
            r["attempt_id"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    return AlertStateTable(
        spark,
        str(tmp_path / "alert_state"),
        machine=AlertStateMachine(auto_disable_failure_count=4),
        # thresholds 50/70/90/100 of 4 -> counts 2,3,4 (70% and 90%
        # both ceil to 3; threshold_failure_counts keeps both pairs)
    )


@pytest.mark.slow
def test_threshold_crossings_across_batches(spark, table):
    # failures 1..4 arrive over two batches; crossings at 2 (50%),
    # 3 (70% — first match in descending order is 90, see below), 4 (100)
    out1 = table.apply_attempts(
        _df(spark, [row("t1", "d1", "a1", "failed", 1)]), 1, now=0.0
    )
    assert _signals(out1) == Counter()  # count 1 crosses nothing
    out2 = table.apply_attempts(
        _df(
            spark,
            [
                row("t1", "d1", "a2", "failed", 1),
                row("t1", "d1", "a3", "failed", 2),
                row("t1", "d1", "a4", "failed", 3),
            ],
        ),
        2,
        now=1.0,
    )
    m = table.machine
    # derive the expected levels from the machine itself so the test
    # stays honest about the ceil-division threshold pairs
    from outpost_spark.functions.backoff import should_alert

    want = Counter()
    for count, aid in [(2, "a2"), (3, "a3"), (4, "a4")]:
        level, crossed = should_alert(m.pairs, count)
        if crossed:
            sig = (
                "alert.destination.disabled"
                if level == 100
                else "alert.destination.consecutive_failure"
            )
            want[("t1", "d1", sig, count, 4, level, aid)] += 1
    assert _signals(out2) == want
    st = _state(table, 3)
    assert sorted(st[("t1", "d1")]["ids"]) == ["a1", "a2", "a3", "a4"]


@pytest.mark.slow
def test_success_resets_and_replay_is_idempotent(spark, table):
    table.apply_attempts(
        _df(
            spark,
            [
                row("t1", "d1", "a1", "failed", 1),
                row("t1", "d1", "a2", "failed", 2),
            ],
        ),
        1,
        now=0.0,
    )
    # replay of a2: count stays 2 — but the per-row evaluation re-emits
    # the equality threshold exactly like the sequential machine does
    out = table.apply_attempts(
        _df(spark, [row("t1", "d1", "a2", "failed", 1)]), 2, now=1.0
    )
    sigs = _signals(out)
    assert all(k[3] == 2 for k in sigs)  # count did NOT double-count
    st = _state(table, 3)
    assert sorted(st[("t1", "d1")]["ids"]) == ["a1", "a2"]
    # success resets; the trailing failure starts a fresh segment
    table.apply_attempts(
        _df(
            spark,
            [
                row("t1", "d1", "a3", "success", 1),
                row("t1", "d1", "a4", "failed", 2),
            ],
        ),
        3,
        now=2.0,
    )
    st = _state(table, 4)
    assert st[("t1", "d1")]["ids"] == ["a4"]


@pytest.mark.slow
def test_exhausted_suppression_window(spark, tmp_path):
    m = AlertStateMachine(
        auto_disable_failure_count=100,
        retry_max_limit=2,
        exhausted_window_seconds=60.0,
    )
    table = AlertStateTable(spark, str(tmp_path / "ex"), machine=m)
    batch = [
        row("t1", "d1", "x1", "failed", 1, n=3),
        row("t1", "d1", "x2", "failed", 2, n=4),  # same batch: suppressed
    ]
    out = table.apply_attempts(_df(spark, batch), 1, now=100.0)
    ex = [r for r in out.collect() if r["signal"] == "alert.attempt.exhausted_retries"]
    assert len(ex) == 1 and ex[0]["attempt_id"] == "x1"
    # inside the window: suppressed entirely
    out = table.apply_attempts(
        _df(spark, [row("t1", "d1", "x3", "failed", 1, n=5)]), 2, now=130.0
    )
    assert not [
        r for r in out.collect() if r["signal"] == "alert.attempt.exhausted_retries"
    ]
    # window elapsed: fires again
    out = table.apply_attempts(
        _df(spark, [row("t1", "d1", "x4", "failed", 1, n=5)]), 3, now=161.0
    )
    ex = [r for r in out.collect() if r["signal"] == "alert.attempt.exhausted_retries"]
    assert len(ex) == 1 and ex[0]["attempt_id"] == "x4"


def test_state_ttl_expires_idle_keys(spark, tmp_path):
    table = AlertStateTable(
        spark,
        str(tmp_path / "ttl"),
        machine=AlertStateMachine(auto_disable_failure_count=4),
        ttl_seconds=10.0,
    )
    table.apply_attempts(
        _df(spark, [row("t1", "d1", "a1", "failed", 1)]), 1, now=0.0
    )
    # within TTL the carried count continues: a2 -> count 2
    out = table.apply_attempts(
        _df(spark, [row("t1", "d1", "a2", "failed", 1)]), 2, now=5.0
    )
    assert any(k[3] == 2 for k in _signals(out))
    # idle past the TTL: the set restarts at 1
    out = table.apply_attempts(
        _df(spark, [row("t1", "d1", "a9", "failed", 1)]), 3, now=99.0
    )
    assert not _signals(out)  # count 1 crosses nothing
    st = _state(table, 4)
    assert st[("t1", "d1")]["ids"] == ["a9"]


def _spec_apply(machine, state, rows, now):
    """Drive the pure-Python machine sequentially — the executable spec."""
    signals = Counter()
    for r in sorted(rows, key=lambda x: (x[6], x[2])):  # (seq, attempt_id)
        k = (r[0], r[1])
        seen, last_ex = state.get(k, (set(), None))
        seen, sigs = machine.evaluate(
            seen,
            attempt_id=r[2],
            success=(r[3] == "success"),
            attempt_number=r[4],
            eligible_for_retry=r[5],
            now=now,
            last_exhausted_at=last_ex,
        )
        for s in sigs:
            if s["signal"] == "alert.attempt.exhausted_retries":
                last_ex = now
            signals[
                (
                    k[0],
                    k[1],
                    s["signal"],
                    s["failures"],
                    s["max_failures"],
                    s["level"],
                    s["attempt_id"],
                )
            ] += 1
        state[k] = (seen, last_ex)
    return signals


@pytest.mark.slow
@pytest.mark.parametrize("window", [0.0, 45.0])
@pytest.mark.parametrize("order_buckets", [None, 4])
def test_parity_with_state_machine_randomized(spark, tmp_path, window, order_buckets):
    """Randomized multi-batch parity against the sequential machine:
    identical signal multisets after every batch and identical carried
    id-sets, across successes, replayed attempt ids, exhausted retries,
    and (parametrized) the suppression window — in BOTH fold modes
    (single-pass whole-key window and the two-pass order-bucketed
    hot-key carry)."""
    rng = random.Random(7 if window else 11)
    m = AlertStateMachine(
        auto_disable_failure_count=5,
        retry_max_limit=6,
        exhausted_window_seconds=window,
    )
    table = AlertStateTable(
        spark, str(tmp_path / "par"), machine=m, order_buckets=order_buckets
    )
    keys = [(f"t{i % 2}", f"d{i}") for i in range(6)]
    spec_state: dict = {}
    now = 0.0
    for batch_id in range(1, 7):
        now += rng.choice([5.0, 20.0, 50.0])
        rows, used_aids = [], []
        for seq in range(rng.randint(3, 18)):
            t, d = rng.choice(keys)
            # 20% replays of an attempt id used earlier in the run
            if used_aids and rng.random() < 0.2:
                aid = rng.choice(used_aids)
            else:
                aid = f"a{batch_id}_{seq}"
                used_aids.append(aid)
            status = "success" if rng.random() < 0.25 else "failed"
            n = rng.randint(1, 8)
            rows.append(row(t, d, aid, status, seq, n=n))
        want = _spec_apply(m, spec_state, rows, now)
        got = _signals(
            table.apply_attempts(_df(spark, rows), batch_id, now=now)
        )
        assert got == want, f"batch {batch_id} (window={window})"
        st = _state(table, batch_id + 1)
        for k, (seen, last_ex) in spec_state.items():
            assert set(st[k]["ids"]) == seen, f"{k} ids, batch {batch_id}"
            if last_ex is None:
                assert st[k]["last_exhausted"] is None
            else:
                assert st[k]["last_exhausted"] == pytest.approx(last_ex)


@pytest.mark.slow
@pytest.mark.parametrize("window", [0.0, 45.0])
def test_bucketed_fold_matches_single_pass_hot_key(spark, tmp_path, window):
    """The L49 hot-key pattern: ~90% of every batch's rows hit ONE
    destination.  The single-pass plan folds that key's slice in one
    ordered-window task; order_buckets=8 splits it into 8 order-aligned
    sub-partitions and carries segment/count boundaries over bucket
    summary rows.  Both modes must emit the identical signal multiset
    and carry identical state (ids in identical fold order), across
    batches with successes, in-batch AND cross-batch replays, exhausted
    retries, and (parametrized) the suppression window."""
    rng = random.Random(99 if window else 101)
    m = AlertStateMachine(
        auto_disable_failure_count=6,
        retry_max_limit=4,
        exhausted_window_seconds=window,
    )
    t_single = AlertStateTable(spark, str(tmp_path / "single"), machine=m)
    t_bucket = AlertStateTable(
        spark, str(tmp_path / "bucket"), machine=m, order_buckets=8
    )
    hot = ("t0", "dHOT")
    cold = [(f"t{i % 3}", f"d{i}") for i in range(5)]
    now, used = 0.0, []
    for batch_id in range(1, 5):
        now += rng.choice([5.0, 30.0, 60.0])
        rows = []
        for seq in range(400):
            t, d = hot if rng.random() < 0.9 else rng.choice(cold)
            if used and rng.random() < 0.15:  # replays, incl. cross-batch
                aid = rng.choice(used)
            else:
                aid = f"a{batch_id}_{seq}"
                used.append(aid)
            status = "success" if rng.random() < 0.1 else "failed"
            rows.append(row(t, d, aid, status, seq, n=rng.randint(1, 6)))
        df = _df(spark, rows)
        got_s = _signals(t_single.apply_attempts(df, batch_id, now=now))
        got_b = _signals(t_bucket.apply_attempts(df, batch_id, now=now))
        assert got_b == got_s, f"batch {batch_id} (window={window})"
        st_s = _state(t_single, batch_id + 1)
        st_b = _state(t_bucket, batch_id + 1)
        assert set(st_b) == set(st_s)
        for k in st_s:
            assert st_b[k]["ids"] == st_s[k]["ids"], k
            assert st_b[k]["last_exhausted"] == st_s[k]["last_exhausted"], k


@pytest.mark.slow
@pytest.mark.parametrize("window", [0.0, 45.0])
def test_hybrid_fold_matches_both_pure_modes(spark, tmp_path, window):
    """hot_key_rows=N (r13): one per-key count routes only keys whose
    batch slice exceeds N rows through the bucketed fold while cold
    keys keep the single-pass whole-key windows.  On a mixed batch
    (one hot destination at ~70% of rows, several cold ones — some
    under, some just over the threshold) the hybrid must emit the
    identical signal multiset and carry identical state as BOTH pure
    modes, across batches with successes, replays, exhaustion, and the
    suppression window."""
    rng = random.Random(31 if window else 37)
    mk = lambda: AlertStateMachine(
        auto_disable_failure_count=6,
        retry_max_limit=4,
        exhausted_window_seconds=window,
    )
    t_single = AlertStateTable(spark, str(tmp_path / "s"), machine=mk())
    t_bucket = AlertStateTable(
        spark, str(tmp_path / "b"), machine=mk(), order_buckets=8
    )
    t_hybrid = AlertStateTable(
        spark, str(tmp_path / "h"), machine=mk(), order_buckets=8,
        hot_key_rows=40,
    )
    hot = ("t0", "dHOT")
    cold = [(f"t{i % 3}", f"d{i}") for i in range(4)]
    now, used = 0.0, []
    for batch_id in range(1, 5):
        now += rng.choice([5.0, 30.0, 60.0])
        rows = []
        for seq in range(300):
            t, d = hot if rng.random() < 0.7 else rng.choice(cold)
            if used and rng.random() < 0.15:
                aid = rng.choice(used)
            else:
                aid = f"a{batch_id}_{seq}"
                used.append(aid)
            status = "success" if rng.random() < 0.1 else "failed"
            rows.append(row(t, d, aid, status, seq, n=rng.randint(1, 6)))
        df = _df(spark, rows)
        got_s = _signals(t_single.apply_attempts(df, batch_id, now=now))
        got_b = _signals(t_bucket.apply_attempts(df, batch_id, now=now))
        got_h = _signals(t_hybrid.apply_attempts(df, batch_id, now=now))
        assert got_h == got_s, f"hybrid vs single, batch {batch_id}"
        assert got_h == got_b, f"hybrid vs bucketed, batch {batch_id}"
        st_s = _state(t_single, batch_id + 1)
        st_h = _state(t_hybrid, batch_id + 1)
        assert set(st_h) == set(st_s)
        for k in st_s:
            assert st_h[k]["ids"] == st_s[k]["ids"], k
            assert st_h[k]["last_exhausted"] == st_s[k]["last_exhausted"], k


@pytest.mark.slow
def test_bucketed_fold_handles_null_order_column(spark, tmp_path):
    """Rows with a NULL first order column must not vanish from the
    bucketed fold: a null __bkt would never match the (key, __bkt)
    equi-joins, silently dropping those rows from segment and state.
    They coalesce into bucket 0 — matching the single-pass window's
    nulls-first sort — so both modes stay signal- and state-identical,
    including a key whose rows are ALL null-ordered."""
    m = AlertStateMachine(auto_disable_failure_count=3, retry_max_limit=9)
    t_single = AlertStateTable(spark, str(tmp_path / "s"), machine=m)
    t_bucket = AlertStateTable(
        spark, str(tmp_path / "b"), machine=m, order_buckets=4
    )
    rows = [
        # mixed null / non-null order values on one key
        row("t1", "d1", "a1", "failed", None),
        row("t1", "d1", "a2", "failed", 5),
        row("t1", "d1", "a3", "failed", None),
        row("t1", "d1", "a4", "success", 9),
        row("t1", "d1", "a5", "failed", 12),
        # a key with ONLY null order values (null __mn/__mx too)
        row("t1", "d2", "b1", "failed", None),
        row("t1", "d2", "b2", "failed", None),
        row("t1", "d2", "b3", "failed", None),
    ]
    df = _df(spark, rows)
    got_s = _signals(t_single.apply_attempts(df, 1, now=10.0))
    got_b = _signals(t_bucket.apply_attempts(df, 1, now=10.0))
    assert got_b == got_s
    # d2's three failures cross the 100% threshold in both modes —
    # proving the null-ordered rows actually participated
    assert any(k[1] == "d2" and k[5] == 100 for k in got_b)
    st_s = _state(t_single, 2)
    st_b = _state(t_bucket, 2)
    assert set(st_b) == set(st_s)
    for k in st_s:
        assert st_b[k]["ids"] == st_s[k]["ids"], k


@pytest.mark.slow
def test_streaming_disable_feedback_stops_routing(spark, tmp_path):
    """ST3 -> routing feedback, end to end on a real stream: fail a
    destination to 100% in one micro-batch and the NEXT batch's events
    no longer route to it (reference: evaluator.go disable ->
    MatchEvent excludes disabled destinations).  The foreachBatch loop
    routes each batch against the destinations-as-of-now, evaluates
    alerts, and persists apply_disable_signals' output back to the
    store the router reads."""
    import json

    from pyspark.sql import functions as F

    from outpost_spark.routing.match import match_events
    from outpost_spark.streaming.alerts import apply_disable_signals

    dest_path = str(tmp_path / "dests")
    spark.createDataFrame(
        [
            ("d_bad", "t1", "webhook", ["*"], None, None),
            ("d_good", "t1", "webhook", ["*"], None, None),
        ],
        "id string, tenant_id string, type string, topics array<string>, "
        "filter string, disabled_at timestamp",
    ).write.parquet(dest_path)
    table = AlertStateTable(
        spark,
        str(tmp_path / "astate"),
        machine=AlertStateMachine(auto_disable_failure_count=3),
    )
    src = tmp_path / "attempts"
    src.mkdir()
    routed: dict = {}

    ATT = (
        "event_id string, tenant_id string, destination_id string, "
        "attempt_id string, status string, attempt_number int, "
        "eligible_for_retry boolean, seq int"
    )

    def fb(batch_df, bid):
        if batch_df.isEmpty():
            return
        dests = spark.read.parquet(dest_path)
        events = (
            batch_df.select(
                "event_id",
                "tenant_id",
                F.lit("user.created").alias("topic"),
                F.lit("{}").alias("data"),
                F.current_timestamp().alias("event_time"),
                F.create_map().cast("map<string,string>").alias("metadata"),
            )
            .dropDuplicates(["event_id"])
        )
        matched = match_events(events, dests)
        routed[int(bid)] = {
            (r["event_id"], d)
            for r in matched.collect()
            for d in r["matched_destination_ids"]
        }
        signals = table.apply_attempts(batch_df, int(bid) + 1, now=float(bid + 1))
        updated = apply_disable_signals(
            dests, signals, now="2024-01-01 00:00:00"
        ).localCheckpoint(eager=True)
        updated.write.mode("overwrite").parquet(dest_path)

    stream = spark.readStream.schema(ATT).json(str(src))
    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def att(eid, dest, aid, status, seq):
        return {
            "event_id": eid, "tenant_id": "t1", "destination_id": dest,
            "attempt_id": aid, "status": status, "attempt_number": 1,
            "eligible_for_retry": True, "seq": seq,
        }

    try:
        # batch 1: d_bad fails 3x consecutively (= auto-disable count)
        with open(src / "b1.json", "w") as f:
            for i in range(3):
                f.write(json.dumps(att(f"e{i}", "d_bad", f"a{i}", "failed", i)) + "\n")
            f.write(json.dumps(att("e0", "d_good", "g0", "success", 9)) + "\n")
        q.processAllAvailable()
        # batch 2: a fresh event — must route ONLY to d_good now
        with open(src / "b2.json", "w") as f:
            f.write(json.dumps(att("e_new", "d_good", "g1", "success", 0)) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    batches = sorted(routed)
    assert len(batches) == 2
    first, second = routed[batches[0]], routed[batches[1]]
    # batch 1 still fanned out to both (disable lands AFTER evaluation)
    assert {d for _, d in first} == {"d_bad", "d_good"}
    # within one trigger of the 100% signal, d_bad is out of the fan-out
    assert second == {("e_new", "d_good")}
    st = {
        r["id"]: r["disabled_at"]
        for r in spark.read.parquet(dest_path).collect()
    }
    assert st["d_bad"] is not None and st["d_good"] is None


def test_apply_attempts_plan_is_jvm_only(spark, table):
    """Scale shape: the batch transition is windows + one key-keyed
    merge join — no Python stages, no cartesian products."""
    table.apply_attempts(
        _df(spark, [row("t1", "d1", "a1", "failed", 1)]), 1, now=0.0
    )
    from pyspark.sql import functions as F  # noqa: F401

    old = table.state_before(2)
    batch = _df(spark, [row("t1", "d1", "a2", "failed", 1)])
    j = batch.join(
        old.select("tenant_id", "destination_id", "ids"),
        on=["tenant_id", "destination_id"],
        how="left",
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
