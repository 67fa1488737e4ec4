"""Transaction-log table format (logstore/txntable.py): atomic commits,
optimistic concurrency, time travel, stats pruning, metadata retention,
vacuum — and the storage toggle: the golden metrics dataset and a
pagination walk return IDENTICAL results through plain-parquet and txn
storage, and a streaming foreachBatch ingest lands atomically."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from outpost_spark.fixtures import (
    DENSE_DAY_END,
    DENSE_DAY_START,
    DS_END,
    DS_START,
    TENANT_1,
    golden_dataframes,
)
from outpost_spark.logstore.insert import insert_many, split_log_entries
from outpost_spark.logstore.metrics import (
    MetricsRequest,
    TimeRange,
    query_attempt_metrics,
    query_event_metrics,
)
from outpost_spark.logstore.retention import apply_retention, compact_partition
from outpost_spark.logstore.txntable import (
    ConflictError,
    TxnTable,
    load_table,
)


def _local(path: str) -> str:
    """OS-path part of a possibly file://-prefixed table path."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


@pytest.fixture(params=["local", "hadoopfs"])
def txn_path(request, tmp_path):
    """Table root under both commit backends: plain OS path (hard-link
    exclusive create) and file:// through HadoopTableFS
    (FileSystem.create(path, overwrite=false) via the JVM gateway) —
    the r07 pluggable LogStore seam (VERDICT r06 'Next round' #2)."""
    p = str(tmp_path / "t")
    return p if request.param == "local" else "file://" + p


def _mk_df(spark, n=100, t0=1704067200):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(t0) + F.col("id") * 86400).alias("event_time"),
        )
        .withColumn("month", F.date_format("event_time", "yyyyMM"))
    )


def test_append_read_timetravel_and_schema_gate(spark, txn_path):
    p = txn_path
    df = _mk_df(spark)
    t = TxnTable.get_or_create(spark, p, df.schema)
    assert t.read().count() == 0  # empty snapshot with schema
    v1 = t.append(df, cluster_by="month", stats_cols=("event_time",))
    v2 = t.append(df.withColumn("event_id", F.col("event_id") + 1000))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 200
    assert t.read(as_of_version=v1).count() == 100
    assert t.read(as_of_version=0).count() == 0
    # rows survive exactly
    got = {r["event_id"] for r in t.read().collect()}
    assert got == set(range(100)) | set(range(1000, 1100))
    # schema gate: wrong column type refused before any write
    bad = df.withColumn("event_id", F.col("event_id").cast("string"))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(bad)


def test_commit_is_exclusive_and_losers_retry(spark, txn_path):
    p = txn_path
    df = _mk_df(spark, 10)
    t = TxnTable.get_or_create(spark, p, df.schema)
    # two writers race for version 1: exactly one exclusive-create wins
    assert t._try_commit(1, {"op": "append", "adds": [], "removes": []})
    assert not t._try_commit(1, {"op": "append", "adds": [], "removes": []})
    # the public path retries to the next version instead of failing
    v = t.append(df)
    assert v == 2 and t.read().count() == 10
    # a leftover tmp file (crash before link) is ignored by the log
    with open(os.path.join(_local(t.log_path), ".tmp-dead"), "w") as fh:
        fh.write("{notjson")
    assert t.version() == 2 and t.read().count() == 10


def test_remove_commits_conflict_on_concurrent_removal(spark, txn_path):
    p = txn_path
    df = _mk_df(spark, 40)
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df, cluster_by="month", stats_cols=("event_time",))
    victim = t.files()[0].path
    # writer A removes the file (e.g. retention)
    t._commit_with_retry({"op": "retention", "adds": [], "removes": [victim]})
    # writer B prepared a compaction that also removes it -> must refuse
    with pytest.raises(ConflictError):
        t._commit_with_retry({"op": "compact", "adds": [], "removes": [victim]})
    # but append-only commits sail through
    assert t.append(df.limit(1)) > 0


def test_crash_before_commit_is_invisible_and_vacuumable(spark, txn_path):
    p = txn_path
    df = _mk_df(spark, 30)
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df)
    before = t.read().count()
    # simulate: stage succeeded, process died before commit
    orphan_adds = t._stage(df, "month", ("event_time",))
    assert len(orphan_adds) > 0
    assert t.read().count() == before  # snapshot never saw the orphans
    # vacuum with ttl=0 reclaims them; live data untouched
    deleted = t.vacuum(keep_versions=1, orphan_ttl_seconds=0.0)
    assert deleted > 0
    assert t.read().count() == before
    for a in orphan_adds:
        assert not os.path.exists(os.path.join(_local(t.path), a["path"]))


def test_stats_pruning_is_exact_superset(spark, txn_path):
    p = txn_path
    df = _mk_df(spark)  # Jan..Apr 2024
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df, cluster_by="month", stats_cols=("event_time",))
    jan = t.read(stats_filter={"month": ("202401", "202401")})
    assert jan.count() == 31  # pure files -> pruning alone is exact here
    assert {r["month"] for r in jan.collect()} == {"202401"}
    # range filter over the time stats
    lo = "2024-02-10T00:00:00.000000"
    hi = "2024-03-05T00:00:00.000000"
    window = t.read(stats_filter={"event_time": (lo, hi)})
    exact = window.filter(
        (F.col("event_time") >= "2024-02-10") & (F.col("event_time") <= "2024-03-05")
    ).count()
    assert exact == 25
    assert window.count() >= exact  # superset guarantee


def test_retention_txn_branch_matches_parquet_branch(spark, tmp_path):
    """apply_retention dispatches on layout and both storages converge
    to the same surviving rows; the txn branch drops expired files
    without the journaled swap."""
    events, attempts = golden_dataframes(spark)
    entries_sdf = None  # built below via insert path for both layouts
    cutoff_now = dt.datetime(2000, 2, 5, tzinfo=dt.timezone.utc)
    ttl = 14  # days -> cutoff 2000-01-22, inside the golden January span
    # plain parquet layout
    pq_events = str(tmp_path / "pq_events")
    from outpost_spark.logstore.insert import with_month_partition

    with_month_partition(events, "event_time").write.partitionBy("month").parquet(
        pq_events
    )
    rep_pq = apply_retention(
        spark, pq_events, time_col="event_time", ttl_days=ttl, now=cutoff_now
    )
    # txn layout
    tx_events = str(tmp_path / "tx_events")
    tt = TxnTable.get_or_create(
        spark, tx_events, with_month_partition(events, "event_time").schema
    )
    tt.append(
        with_month_partition(events, "event_time"),
        cluster_by="month",
        stats_cols=("event_time",),
    )
    rep_tx = apply_retention(
        spark, tx_events, time_col="event_time", ttl_days=ttl, now=cutoff_now
    )
    assert rep_pq.rows_deleted == rep_tx.rows_deleted
    left = (
        spark.read.parquet(pq_events)
        .drop("month")
        .withColumn("metadata", F.to_json("metadata"))
    )
    right = (
        load_table(spark, tx_events)
        .drop("month")
        .withColumn("metadata", F.to_json("metadata"))
    )
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, right.collect()))


def test_compact_txn_branch_atomic_and_month_scoped(spark, tmp_path):
    p = str(tmp_path / "t")
    df = _mk_df(spark)
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df, cluster_by="month", stats_cols=("event_time",))
    t.append(df.withColumn("event_id", F.col("event_id") + 500), cluster_by="month")
    jan_before = [
        e for e in t.files() if e.stats.get("month", ["", ""])[0] == "202401"
    ]
    assert len(jan_before) > 1
    n = compact_partition(spark, p, "202401", target_files=1)
    assert n == len(jan_before)
    jan_after = [
        e for e in t.files() if e.stats.get("month", ["", ""])[0] == "202401"
    ]
    assert len(jan_after) == 1
    assert t.read().count() == 200  # nothing lost, other months untouched
    # compaction again is a no-op
    assert compact_partition(spark, p, "202401", target_files=1) == 0


def test_compact_zorder_prunes_both_columns_through_log(spark, tmp_path):
    """OPTIMIZE ZORDER behind the commit log (r08): compact(zorder_cols)
    re-clusters by the Morton key in ONE atomic commit; afterwards the
    txn read path's file-level stats pruning drops files for filters on
    EACH z-ordered column, content survives exactly, and time travel to
    the pre-compact version still sees the old layout."""
    p = str(tmp_path / "zt")
    # two deliberately uncorrelated columns
    df = spark.range(40000).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 16).cast("string")).alias("tenant_id"),
        ((F.col("id") * 7919) % 40000).cast("long").alias("ts"),
    )
    t = TxnTable.get_or_create(spark, p, df.schema)
    # several appends -> several files with interleaved key ranges
    for i in range(4):
        t.append(df.filter(F.col("event_id") % 4 == i))
    v_before = t.version()
    before = {r["event_id"] for r in t.read().collect()}

    n = t.compact(
        target_files=8, zorder_cols=("tenant_id", "ts"), zorder_bits=8
    )
    assert n >= 4
    # content identical, single commit, time travel intact
    assert {r["event_id"] for r in t.read().collect()} == before
    assert t.version() == v_before + 1
    assert len(t.files(v_before)) == n

    # file-level pruning from the LOG alone, on BOTH columns
    entries = t.files()
    assert len(entries) == 8
    assert all("tenant_id" in e.stats and "ts" in e.stats for e in entries)

    pruned_tenant = t.read(stats_isin={"tenant_id": ["t3"]})
    pruned_ts = t.read(stats_filter={"ts": (10000, 12000)})
    full_files = len(t.read().inputFiles())
    assert len(pruned_tenant.inputFiles()) < full_files
    assert len(pruned_ts.inputFiles()) < full_files
    # pruning is a superset guarantee: exact predicate on top matches
    assert (
        pruned_tenant.filter(F.col("tenant_id") == "t3").count()
        == df.filter(F.col("tenant_id") == "t3").count()
    )
    assert (
        pruned_ts.filter(F.col("ts").between(10000, 12000)).count()
        == df.filter(F.col("ts").between(10000, 12000)).count()
    )


def test_vacuum_respects_time_travel_window(spark, tmp_path):
    p = str(tmp_path / "t")
    df = _mk_df(spark, 50)
    t = TxnTable.get_or_create(spark, p, df.schema)
    v1 = t.append(df, cluster_by="month", stats_cols=("event_time",))
    t.compact(target_files=1, stats_cols=("month",))
    # removed files still on disk -> old snapshot readable
    assert t.read(as_of_version=v1).count() == 50
    assert t.vacuum(keep_versions=5, orphan_ttl_seconds=0.0) == 0
    # after the window passes (3 more commits), vacuum reclaims
    for i in range(3):
        t.append(df.limit(1))
    deleted = t.vacuum(keep_versions=3, orphan_ttl_seconds=0.0)
    assert deleted > 0
    assert t.read().count() == 53  # current snapshot unaffected


def test_app_txn_makes_appends_idempotent(spark, txn_path):
    """Delta txnAppId/txnVersion analog: a replayed (app, batch) append
    is a structural no-op — the batch data and its replay marker are
    the same atomic commit, so there is no duplicate-row crash window."""
    p = txn_path
    df = _mk_df(spark, 20)
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df, app_txn=("sink", 0))
    t.append(df, app_txn=("sink", 0))  # replay: skipped
    assert t.read().count() == 20
    assert t.app_txn_version("sink") == 0
    t.append(df.withColumn("event_id", F.col("event_id") + 100), app_txn=("sink", 1))
    assert t.read().count() == 40
    assert t.app_txn_version("sink") == 1
    # stale replay after progress: still a no-op
    t.append(df, app_txn=("sink", 0))
    assert t.read().count() == 40
    # a different app id is independent
    t.append(df.withColumn("event_id", F.col("event_id") + 200), app_txn=("other", 0))
    assert t.read().count() == 60


def test_exactly_once_log_sink_on_txn_storage(spark, tmp_path):
    """make_log_sink(storage='txn'): calling the sink twice with the
    same batch_id — foreachBatch's replay contract — inserts once, with
    no marker files anywhere."""
    from outpost_spark.streaming.pipeline import make_log_sink

    ev_p, at_p = str(tmp_path / "ev"), str(tmp_path / "at")
    sink = make_log_sink(ev_p, at_p, str(tmp_path / "commits"), storage="txn")
    entries = _golden_entries_df(spark).limit(50)
    sink(entries, 0)
    sink(entries, 0)  # replayed micro-batch
    at = load_table(spark, at_p)
    assert at.count() == 50
    assert not os.path.exists(str(tmp_path / "commits"))  # no marker files
    # same rows under a NEW batch_id must append (idempotence is keyed
    # on the writer transaction, not content)
    sink(entries, 1)
    assert load_table(spark, at_p).count() == 100


def test_checkpoint_bounds_log_reconstruction(spark, txn_path):
    """After CHECKPOINT_EVERY commits a snapshot checkpoint exists;
    state from checkpoint+tail equals state from the full log, and time
    travel to pre-checkpoint versions still replays the full log."""
    p = txn_path
    df = _mk_df(spark, 4)
    t = TxnTable.get_or_create(spark, p, df.schema)
    n = TxnTable.CHECKPOINT_EVERY + 3
    for i in range(n):
        t.append(df.withColumn("event_id", F.col("event_id") + 10 * i))
    ckpts = [f for f in os.listdir(_local(t.log_path)) if f.startswith("_checkpoint-")]
    assert ckpts, "no checkpoint written"
    assert t.read().count() == 4 * n
    # force the no-checkpoint path and compare states
    schema_ck, live_ck, rem_ck = t._state()
    for f in ckpts:
        os.remove(os.path.join(_local(t.log_path), f))
    schema_full, live_full, rem_full = t._state()
    assert schema_ck == schema_full
    assert {e.path for e in live_ck.values()} == {e.path for e in live_full.values()}
    assert rem_ck == rem_full
    # pre-checkpoint time travel
    assert t.read(as_of_version=1).count() == 4


def test_app_txn_survives_checkpointing(spark, tmp_path):
    """The replay check must see writer transactions recorded BEFORE a
    checkpoint: app_txns fold into the checkpoint, and a stale replay of
    a pre-checkpoint batch is still a no-op after many commits."""
    p = str(tmp_path / "t")
    df = _mk_df(spark, 5)
    t = TxnTable.get_or_create(spark, p, df.schema)
    t.append(df, app_txn=("sink", 0))
    for i in range(TxnTable.CHECKPOINT_EVERY + 2):
        t.append(df.withColumn("event_id", F.col("event_id") + 100 * (i + 1)))
    assert any(f.startswith("_checkpoint-") for f in os.listdir(t.log_path))
    assert t.app_txn_version("sink") == 0
    before = t.read().count()
    t.append(df, app_txn=("sink", 0))  # stale replay across the checkpoint
    assert t.read().count() == before


def _golden_entries_df(spark):
    from pyspark.sql import types as T

    from outpost_spark.fixtures import golden_log_entries
    from outpost_spark.schemas import ATTEMPT_SCHEMA

    rows = golden_log_entries()
    attempt_cols = [f.name for f in ATTEMPT_SCHEMA.fields]
    schema = T.StructType(
        list(ATTEMPT_SCHEMA.fields)
        + [T.StructField("matched_destination_ids", T.ArrayType(T.StringType()))]
    )
    return spark.createDataFrame(
        [
            tuple(r[c] for c in attempt_cols) + (r["matched_destination_ids"],)
            for r in rows
        ],
        schema,
    )


@pytest.fixture(scope="module")
def both_storages(spark, tmp_path_factory):
    """The golden dataset written through insert_many in BOTH layouts,
    read back through load_table."""
    root = tmp_path_factory.mktemp("storages")
    entries = _golden_entries_df(spark)
    out = {}
    for storage in ("parquet", "txn"):
        ev_p = str(root / f"{storage}_events")
        at_p = str(root / f"{storage}_attempts")
        # two deterministic half-batches: exercises multi-commit append
        # on the txn side (subtract/except chokes on the MAP column)
        half = F.pmod(F.xxhash64("attempt_id"), F.lit(2))
        insert_many(entries.filter(half == 0), ev_p, at_p, storage=storage)
        insert_many(entries.filter(half == 1), ev_p, at_p, storage=storage)
        out[storage] = (
            load_table(spark, ev_p).drop("month"),
            load_table(spark, at_p).drop("month"),
        )
    return out


def test_golden_rows_identical_across_storages(both_storages):
    for i in range(2):
        a = sorted(
            map(
                tuple,
                both_storages["parquet"][i]
                .withColumn("metadata", F.to_json("metadata"))
                .collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                both_storages["txn"][i]
                .withColumn("metadata", F.to_json("metadata"))
                .collect(),
            )
        )
        assert a == b and len(a) > 0


def test_golden_metrics_green_on_txn_storage(both_storages):
    """Representative golden assertions (metrics_dataset.go hand-derived
    totals) against the txn-backed tables."""
    events, attempts = both_storages["txn"]
    FULL = TimeRange(DS_START, DS_END)
    T1 = {"tenant_id": [TENANT_1]}
    out = query_event_metrics(
        events, MetricsRequest(FULL, measures=["count"], filters=T1)
    ).collect()
    assert [r["count"] for r in out] == [300]
    er = query_attempt_metrics(
        attempts, MetricsRequest(FULL, measures=["error_rate"], filters=T1)
    ).collect()
    assert [round(r["error_rate"], 6) for r in er] == [0.4]
    dense = query_attempt_metrics(
        attempts,
        MetricsRequest(
            TimeRange(DENSE_DAY_START, DENSE_DAY_END),
            measures=["count"],
            granularity="1h",
            filters=T1,
        ),
    ).collect()
    assert len(dense) == 24  # gap-filled to every hour of the day
    by_hour = {(r["time_bucket"] % 86400) // 3600: r["count"] for r in dense}
    assert (by_hour[10], by_hour[11], by_hour[12], by_hour[13]) == (25, 50, 100, 50)


def test_pagination_identical_across_storages(both_storages):
    from outpost_spark.logstore.lists import ListRequest, list_events

    pages = {}
    for storage in ("parquet", "txn"):
        events, _ = both_storages[storage]
        walk, cursor = [], ""
        for _ in range(4):
            res = list_events(
                events, ListRequest(tenant_ids=[TENANT_1], limit=100, next=cursor)
            )
            walk.extend(r["event_id"] for r in res.items)
            if not res.next:
                break
            cursor = res.next
        pages[storage] = walk
    assert pages["parquet"] == pages["txn"] and len(pages["txn"]) == 300


def test_streaming_foreachbatch_lands_atomic_txn_commits(spark, tmp_path):
    """A Structured Streaming job (file source, availableNow) whose
    foreachBatch runs insert_many(storage='txn'): every micro-batch is
    one atomic commit per table, read-back equals the input exactly."""
    from pyspark.sql import types as T

    from outpost_spark.schemas import ATTEMPT_SCHEMA

    src = str(tmp_path / "src")
    os.makedirs(src)
    entries = _golden_entries_df(spark)
    attempt_cols = [f.name for f in ATTEMPT_SCHEMA.fields] + [
        "matched_destination_ids"
    ]
    rows = entries.collect()
    for i in range(3):
        chunk = rows[i * 100 : (i + 1) * 100]
        with open(os.path.join(src, f"b{i}.json"), "w") as fh:
            for r in chunk:
                d = {c: r[c] for c in attempt_cols}
                for k, v in list(d.items()):
                    if isinstance(v, dt.datetime):
                        d[k] = v.isoformat()
                fh.write(json.dumps(d) + "\n")
    schema = entries.schema
    ev_p, at_p = str(tmp_path / "ev"), str(tmp_path / "at")

    def _process(batch, batch_id):
        # timestamps arrive as ISO strings from the json source
        for f in schema.fields:
            if f.dataType.simpleString() == "timestamp":
                batch = batch.withColumn(f.name, F.to_timestamp(f.name))
        insert_many(batch, ev_p, at_p, storage="txn")

    stream = spark.readStream.schema(
        T.StructType(
            [
                T.StructField(
                    f.name,
                    T.StringType()
                    if f.dataType.simpleString() == "timestamp"
                    else f.dataType,
                )
                for f in schema.fields
            ]
        )
    ).json(src)
    q = (
        stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    ev = load_table(spark, ev_p)
    at = load_table(spark, at_p)
    assert at.count() == 300
    assert ev.count() == ev.select("event_id").distinct().count()
    # each micro-batch committed atomically: every non-create commit is
    # an append, and no partial state is referenced
    hist = TxnTable(spark, at_p).history()
    assert [h["op"] for h in hist][0] == "create"
    assert all(h["op"] == "append" for h in hist[1:])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# operation descriptors for the interleaving property: (kind, parameter)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=4)),
        st.tuples(st.just("retention"), st.integers(min_value=0, max_value=120)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("vacuum"), st.integers(min_value=0, max_value=2)),
    ),
    min_size=3,
    max_size=7,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["", "file://"])
@given(ops=_OPS)
def test_txntable_random_interleavings_match_model(spark, tmp_path_factory, scheme, ops):
    """Property: ANY interleaving of append / time-retention / compact /
    vacuum leaves the snapshot equal to a trivial in-memory model (a set
    of (id, day-offset) rows with retention = filter), the version count
    equal to the number of committing operations, and time travel to
    every post-op version consistent with the model's history."""
    import pyspark.sql.functions as F

    root = tmp_path_factory.mktemp("prop")
    path = scheme + str(root / "t")
    base = 1_700_000_000
    df0 = spark.range(1).select(
        F.lit(0).cast("long").alias("rid"),
        F.timestamp_seconds(F.lit(base)).alias("ts"),
    )
    t = TxnTable.get_or_create(spark, path, df0.schema)
    model: set[tuple[int, int]] = set()  # (rid, day_offset)
    next_rid = 0
    cutoff_floor = None  # retention high-water mark, in day offsets
    history = [set()]  # model snapshot after each commit (index = version)

    def mk(rows):
        return spark.createDataFrame(
            [(rid, base + day * 86400) for rid, day in rows], "rid long, e long"
        ).select("rid", F.timestamp_seconds(F.col("e")).alias("ts"))

    for kind, arg in ops:
        if kind == "append":
            new = {(next_rid + i, (next_rid + i) % 9) for i in range(arg)}
            next_rid += arg
            # retention already applied must not resurrect: appends here
            # are always "new data" with arbitrary days — the table holds
            # whatever was appended minus later retentions, like the model
            t.append(mk(new), cluster_by=None, stats_cols=("ts",))
            model |= new
            history.append(set(model))
        elif kind == "retention":
            cutoff_day = arg / 24.0  # sub-day cutoffs exercise rewrites
            import datetime as dt

            d, r, n = t.delete_where_time(
                "ts", dt.datetime.utcfromtimestamp(base + int(cutoff_day * 86400))
            )
            expected_removed = {x for x in model if x[1] < cutoff_day}
            assert n == len(expected_removed)
            model -= expected_removed
            if d or r or n:
                history.append(set(model))
        elif kind == "compact":
            if t.compact(target_files=1, stats_cols=("ts",)):
                history.append(set(model))
        elif kind == "vacuum":
            t.vacuum(keep_versions=arg, orphan_ttl_seconds=0.0)
            # vacuum never commits and never changes the snapshot
        got = {
            (row["rid"], int((row["ts"].timestamp() - base) // 86400))
            for row in t.read().collect()
        }
        assert got == model, f"after {kind}({arg})"
    assert t.version() == len(history) - 1
    # time travel: the CURRENT version always replays exactly; with no
    # vacuum in the sequence every historical version does too (vacuum
    # may legitimately delete files old snapshots reference — hypothesis
    # found exactly that interleaving on its second run)
    check = (
        range(len(history))
        if not any(k == "vacuum" for k, _ in ops)
        else [len(history) - 1]
    )
    for v in check:
        got_v = {
            (row["rid"], int((row["ts"].timestamp() - base) // 86400))
            for row in t.read(as_of_version=v).collect()
        }
        assert got_v == history[v], f"time travel to v{v}"
