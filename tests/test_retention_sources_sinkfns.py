"""Tests: retention/compaction maintenance (ST6), queue sources (S1/S2),
sink-side scalar functions (F6/F8/F10)."""

import json
import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from outpost_spark.functions.sinkfns import (
    evaluate_partition_key,
    generate_id,
    render_signature_template,
    sign,
    signature_header,
    signature_udf,
    verify,
)
from outpost_spark.logstore.retention import apply_retention, compact_partition
from outpost_spark.sources import event_stream, parse_queue_url, validate_publish


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_maint_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ── ST6: retention ──


def _write_months(spark, path):
    rows = []
    for m, n in (("202311", 3), ("202312", 4), ("202401", 5)):
        t0 = datetime(int(m[:4]), int(m[4:]), 10, tzinfo=timezone.utc)
        rows += [(f"{m}-{i}", t0.replace(day=10 + i)) for i in range(n)]
    df = spark.createDataFrame(rows, "id string, time timestamp")
    df.withColumn("month", F.date_format("time", "yyyyMM")).write.partitionBy(
        "month"
    ).mode("overwrite").parquet(path)


def test_retention_drops_old_months_and_trims_cutoff(spark, tmpdir):
    path = os.path.join(tmpdir, "tbl")
    _write_months(spark, path)
    # now = 2024-01-20; ttl 25 days → cutoff 2023-12-26: Nov dropped whole,
    # Dec rewritten (all Dec rows are 10th-13th < 26th → removed), Jan kept
    rep = apply_retention(
        spark,
        path,
        time_col="time",
        ttl_days=25,
        now=datetime(2024, 1, 20, tzinfo=timezone.utc),
    )
    assert rep.dropped_partitions == ["month=202311"]
    assert rep.rewritten_partition == "month=202312"
    assert rep.rows_deleted == 3 + 4
    left = spark.read.option("basePath", path).parquet(path)
    assert left.count() == 5
    assert sorted(d for d in os.listdir(path) if d.startswith("month=")) == [
        "month=202312", "month=202401"
    ]  # cutoff month dir remains (empty rewrite), newer month intact


def test_retention_noop_when_everything_recent(spark, tmpdir):
    path = os.path.join(tmpdir, "tbl2")
    _write_months(spark, path)
    rep = apply_retention(
        spark,
        path,
        time_col="time",
        ttl_days=3650,
        now=datetime(2024, 1, 20, tzinfo=timezone.utc),
    )
    assert rep.dropped_partitions == [] and rep.rows_deleted == 0
    assert spark.read.option("basePath", path).parquet(path).count() == 12


def test_compact_partition_reduces_files(spark, tmpdir):
    path = os.path.join(tmpdir, "tbl3")
    df = spark.createDataFrame(
        [(str(i), datetime(2024, 1, 10, tzinfo=timezone.utc)) for i in range(100)],
        "id string, time timestamp",
    )
    df.repartition(8).withColumn("month", F.lit("202401")).write.partitionBy(
        "month"
    ).mode("overwrite").parquet(path)
    n_before = compact_partition(spark, path, "202401", target_files=1)
    assert n_before == 8
    part = os.path.join(path, "month=202401")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(part).count() == 100


# ── S1/S2: queue URL parsing + file-backed event stream ──


def test_parse_queue_url_kafka_and_file():
    fmt, opts = parse_queue_url(
        "kafka://b1:9092,b2:9092/events?startingOffsets=latest"
    )
    assert fmt == "kafka"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "latest"
    fmt, opts = parse_queue_url("file:///tmp/q?maxFilesPerTrigger=5")
    assert fmt == "file" and opts == {"path": "/tmp/q", "maxFilesPerTrigger": "5"}
    # sqs:// is a supported scheme since r06 (sources/sqs_source.py)
    fmt, opts = parse_queue_url("sqs://queue-name?region=us-east-1")
    assert fmt == "sqs" and opts["queueName"] == "queue-name"
    with pytest.raises(ValueError):
        parse_queue_url("pubsub://projects/x/topics/y")


def test_event_stream_decodes_and_defaults(spark, tmpdir):
    src = os.path.join(tmpdir, "q")
    os.makedirs(src)
    msgs = [
        {"id": "e1", "tenant_id": "t1", "topic": "user.created",
         "time": "2024-01-01T00:00:00Z", "data": '{"k":1}'},
        {"tenant_id": "t2", "topic": "user.deleted"},  # id/time defaulted
    ]
    with open(os.path.join(src, "m.json"), "w") as f:
        for m in msgs:
            f.write(json.dumps(m) + "\n")
    stream = event_stream(spark, f"file://{src}")
    q = (
        stream.writeStream.format("memory")
        .queryName("src_out")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["tenant_id"]: r for r in spark.sql("select * from src_out").collect()}
    finally:
        q.stop()
    assert rows["t1"]["event_id"] == "e1"
    assert rows["t1"]["event_time"] == datetime(2024, 1, 1)
    assert rows["t2"]["event_id"]  # uuid defaulted
    assert rows["t2"]["eligible_for_retry"] is True
    assert rows["t2"]["event_time"] is not None


def test_write_task_stream_file_sink_roundtrip(spark, tmpdir):
    from outpost_spark.sources import write_task_stream

    src = os.path.join(tmpdir, "tin")
    os.makedirs(src)
    with open(os.path.join(src, "t.json"), "w") as f:
        f.write(json.dumps({"event_id": "e1", "destination_id": "d1", "attempt": 1}) + "\n")
    stream = spark.readStream.schema(
        "event_id string, destination_id string, attempt int"
    ).json(src)
    out = os.path.join(tmpdir, "tout")
    q = write_task_stream(stream, f"file://{out}", os.path.join(tmpdir, "tck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        json.loads(line)
        for fn in os.listdir(out)
        if fn.endswith(".json") or fn.endswith(".txt")
        for line in open(os.path.join(out, fn))
    ]
    # each row is one JSON message carrying the task fields
    payloads = [json.loads(r["value"]) for r in rows]
    assert {"event_id": "e1", "destination_id": "d1", "attempt": 1} in payloads


def test_validate_publish_splits(spark):
    df = spark.createDataFrame(
        [
            ("e1", "t1", "user.created", '{"ok":1}'),
            ("e2", "t1", "user.created", "[1,2]"),      # not an object
            ("e3", "t1", "user.created", "not-json"),   # invalid
            ("e4", None, "user.created", "{}"),         # no tenant
            ("e5", "t1", "bad.topic", "{}"),            # unknown topic
            ("e6", "t1", "user.deleted", None),         # null data ok
        ],
        "event_id string, tenant_id string, topic string, data string",
    )
    valid, rejected = validate_publish(
        df, valid_topics=["user.created", "user.deleted"]
    )
    assert sorted(r["event_id"] for r in valid.collect()) == ["e1", "e6"]
    assert sorted(r["event_id"] for r in rejected.collect()) == ["e2", "e3", "e4", "e5"]


# ── F10: signatures ──


def test_sign_hex_and_base64_roundtrip():
    sig = sign("test-secret", '1234567890.{"hello":"world"}')
    assert len(sig) == 64 and verify("test-secret", '1234567890.{"hello":"world"}', sig)
    sig64 = sign("k", "body", encoding="base64")
    assert verify("k", "body", sig64, encoding="base64")
    assert not verify("other", "body", sig64, encoding="base64")
    # algorithm selection changes the digest
    assert sign("k", "c", algorithm="hmac-sha1") != sign("k", "c")


def test_signature_templates():
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    content = render_signature_template(
        "{{.Timestamp.Unix}}.{{.Body}}", body='{"a":1}', timestamp=ts
    )
    assert content == '1704067200.{"a":1}'
    header = signature_header(
        body="b", keys=["k1", "k2"], timestamp=ts,
        content_template="{{.Timestamp.Unix}}.{{.Body}}",
    )
    s1 = sign("k1", "1704067200.b")
    s2 = sign("k2", "1704067200.b")
    assert header == f"v0={s1},{s2}"  # rotation: one sig per active secret


def test_signature_udf_batch(spark):
    df = spark.createDataFrame(
        [("e1", "user.created", '{"p":1}', 1704067200.0)],
        "event_id string, topic string, body string, ts double",
    )
    udf = signature_udf("secret", content_template="{{.Timestamp.Unix}}.{{.Body}}")
    got = df.select(
        udf(F.col("body"), F.col("event_id"), F.col("topic"), F.col("ts")).alias("sig")
    ).collect()[0]["sig"]
    assert got == sign("secret", '1704067200.{"p":1}')


# ── F6: partition keys ──


def test_partition_key_evaluate_semantics():
    payload = {"user": {"id": "u42", "score": 1.5, "vip": True}, "n": 3}
    assert evaluate_partition_key("user.id", payload, "fb") == "u42"
    assert evaluate_partition_key("", payload, "fb") == "fb"
    assert evaluate_partition_key("missing.path", payload, "fb") == "fb"
    assert evaluate_partition_key("user.score", payload, "fb") == "1.5"
    assert evaluate_partition_key("user.vip", payload, "fb") == "true"
    assert evaluate_partition_key("n", payload, "fb") == "3"


# ── F8: id generation ──


def test_generate_id_shapes():
    assert generate_id("evt_").startswith("evt_")
    u7a, u7b = generate_id(id_type="uuidv7"), generate_id(id_type="uuidv7")
    assert u7a[14] == "7" and u7b[14] == "7"
    assert u7a != u7b
    nano = generate_id(id_type="nanoid")
    assert len(nano) == 21


def test_recover_partials_restores_lost_partition(spark, tmpdir):
    """A crash between the two swap renames leaves _trash_<part> and no
    partition dir; the next maintenance run must restore the old data and
    discard staging — never double-expose or lose a partition."""
    import os

    from outpost_spark.logstore.retention import _recover_partials

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    part = os.path.join(path, "month=202401")
    trash = os.path.join(path, "_trash_month=202401")
    tmp = os.path.join(path, "_tmp_retention_month=202401")
    os.rename(part, trash)          # crash mid-swap: partition gone
    os.makedirs(tmp)                # leftover staging dir
    _recover_partials(path)
    assert os.path.isdir(part) and not os.path.exists(trash) and not os.path.exists(tmp)
    assert spark.read.parquet(path).filter(F.col("month") == "202401").count() == 5


def test_staging_dirs_invisible_to_reads_and_retention(spark, tmpdir):
    """Leftover staging dirs must not surface as bogus partitions in Spark
    partition discovery or in the retention month listing (round-1 staged
    inside the partition dir as month=...._retention_tmp, which both
    picked up)."""
    import os

    from outpost_spark.logstore.retention import _month_partitions

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    os.makedirs(os.path.join(path, "_tmp_retention_month=209901"))
    assert _month_partitions(path) == ["month=202311", "month=202312", "month=202401"]
    months = {
        str(r["month"])
        for r in spark.read.parquet(path).select("month").distinct().collect()
    }
    assert months == {"202311", "202312", "202401"}


def test_load_tables_normalizes_timestamps(spark):
    """load_tables must surface timestamps as session-UTC TIMESTAMP no
    matter how the generator encoded them (nanos or tz-less NTZ) — epoch
    functions reject TIMESTAMP_NTZ, so a raw read would break callers."""
    from outpost_spark.session import load_tables

    tabs = load_tables(spark, "/root/testdata/sf0.001", names=("events", "orders"))
    assert dict(tabs["events"].dtypes)["ts"] == "timestamp"
    assert dict(tabs["orders"].dtypes)["o_orderdate"] == "timestamp"
    # epoch extraction works (would throw on NTZ)
    tabs["events"].selectExpr("unix_micros(ts)").limit(1).collect()


def test_retention_and_compaction_through_file_scheme_uri(spark, tmpdir):
    """apply_retention + compact_partition on a file:// URI — the Hadoop
    FileSystem code path a hdfs:// / s3a:// warehouse would take."""
    path = os.path.join(tmpdir, "tbl_uri")
    _write_months(spark, path)
    uri = "file://" + path
    rep = apply_retention(
        spark,
        uri,
        time_col="time",
        ttl_days=25,
        now=datetime(2024, 1, 20, tzinfo=timezone.utc),
    )
    assert rep.dropped_partitions == ["month=202311"]
    assert rep.rewritten_partition == "month=202312"
    assert rep.rows_deleted == 3 + 4
    assert spark.read.option("basePath", uri).parquet(uri).count() == 5

    path2 = os.path.join(tmpdir, "tbl_uri2")
    df = spark.createDataFrame(
        [(str(i), datetime(2024, 1, 10, tzinfo=timezone.utc)) for i in range(100)],
        "id string, time timestamp",
    )
    df.repartition(8).withColumn("month", F.lit("202401")).write.partitionBy(
        "month"
    ).mode("overwrite").parquet(path2)
    n_before = compact_partition(spark, "file://" + path2, "202401", target_files=1)
    assert n_before == 8
    part = os.path.join(path2, "month=202401")
    assert len([f for f in os.listdir(part) if f.endswith(".parquet")]) == 1
    assert spark.read.parquet(part).count() == 100


# ── ST6: journaled swap — copy+delete (s3a-style) crash recovery ──
#
# Hadoop object-store renames are copy+delete: the source is deleted only
# after the whole copy succeeded.  The journal written by _swap_partition
# (file-size manifests of both sides) lets _recover_partials decide which
# side of a crashed swap is complete.  These tests construct every
# mid-swap crash window on disk and assert recovery converges to a
# consistent table with no staging residue.


def _staging_residue(path):
    return [
        d
        for d in os.listdir(path)
        if d.startswith(("_trash_", "_tmp_", "_swapjournal_"))
    ]


def _snapshot_rows(spark, path, month):
    return {
        r["id"]
        for r in spark.read.parquet(path).filter(F.col("month") == month).collect()
    }


def _stage_compaction(spark, path, part):
    """Stage a compacted rewrite of ``part`` + write the swap journal,
    stopping right before the first rename (the swap's point of no
    return).  Returns (tmp_name, journal_name, orig_rows)."""
    from outpost_spark.fsutil import maintenance_fs

    fs = maintenance_fs(path)
    df = spark.read.parquet(os.path.join(path, part))
    tmp_name = f"_tmp_compact_{part}"
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, tmp_name))
    journal = f"_swapjournal_{part}"
    fs.write_text(
        [journal],
        json.dumps({"orig": fs.file_sizes(part), "new": fs.file_sizes(tmp_name)}),
    )
    return tmp_name, journal


def _truncate_one_parquet(dirpath):
    """Chop the tail off one data file — a mid-copy partial state."""
    for f in sorted(os.listdir(dirpath)):
        if f.endswith(".parquet"):
            p = os.path.join(dirpath, f)
            with open(p, "r+b") as fh:
                fh.truncate(max(os.path.getsize(p) // 2, 1))
            return
    raise AssertionError("no parquet file to truncate")


def test_swap_crash_between_renames_journaled(spark, tmpdir):
    """Crash after rename #1 (partition renamed to trash, staging not yet
    renamed in): recovery must restore the original partition."""
    from outpost_spark.logstore.retention import _recover_partials

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    part = "month=202401"
    before = _snapshot_rows(spark, path, "202401")
    tmp_name, journal = _stage_compaction(spark, path, part)
    os.rename(os.path.join(path, part), os.path.join(path, f"_trash_{part}"))
    _recover_partials(path)
    assert _snapshot_rows(spark, path, "202401") == before
    assert _staging_residue(path) == []


def test_swap_crash_partial_trash_copy(spark, tmpdir):
    """Crash mid-COPY of rename #1 on a copy+delete store: trash holds a
    truncated copy, the live partition is still complete.  Recovery must
    keep the live partition and drop the partial trash — restoring the
    truncated trash over it would corrupt the table."""
    from outpost_spark.logstore.retention import _recover_partials

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    part = "month=202401"
    before = _snapshot_rows(spark, path, "202401")
    tmp_name, journal = _stage_compaction(spark, path, part)
    shutil.copytree(os.path.join(path, part), os.path.join(path, f"_trash_{part}"))
    _truncate_one_parquet(os.path.join(path, f"_trash_{part}"))
    _recover_partials(path)
    assert _snapshot_rows(spark, path, "202401") == before
    assert _staging_residue(path) == []


def test_swap_crash_partial_partition_copy(spark, tmpdir):
    """Crash mid-COPY of rename #2 (or mid-DELETE of rename #1): trash
    holds the complete original, the partition dir is a partial copy of
    the staging data.  Pre-journal recovery deleted the complete trash
    and kept the partial partition — silent data loss; the journal's
    manifests must route recovery to the trash side."""
    from outpost_spark.logstore.retention import _recover_partials

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    part = "month=202401"
    before = _snapshot_rows(spark, path, "202401")
    tmp_name, journal = _stage_compaction(spark, path, part)
    os.rename(os.path.join(path, part), os.path.join(path, f"_trash_{part}"))
    # rename #2's copy phase dies halfway through
    shutil.copytree(os.path.join(path, tmp_name), os.path.join(path, part))
    _truncate_one_parquet(os.path.join(path, part))
    shutil.rmtree(os.path.join(path, tmp_name))
    _recover_partials(path)
    assert _snapshot_rows(spark, path, "202401") == before
    assert _staging_residue(path) == []


def test_swap_completed_rolls_forward(spark, tmpdir):
    """Crash after rename #2 but before the trash delete: both sides are
    complete; the new data is live and recovery must keep it (rolling
    back would undo a finished rewrite)."""
    from outpost_spark.logstore.retention import _recover_partials

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    part = "month=202401"
    before = _snapshot_rows(spark, path, "202401")
    tmp_name, journal = _stage_compaction(spark, path, part)
    n_new_files = len(
        [f for f in os.listdir(os.path.join(path, tmp_name)) if f.endswith(".parquet")]
    )
    os.rename(os.path.join(path, part), os.path.join(path, f"_trash_{part}"))
    os.rename(os.path.join(path, tmp_name), os.path.join(path, part))
    _recover_partials(path)
    # same rows (compaction preserves content), now in the compacted layout
    assert _snapshot_rows(spark, path, "202401") == before
    data_files = [
        f
        for f in os.listdir(os.path.join(path, part))
        if f.endswith(".parquet")
    ]
    assert len(data_files) == n_new_files == 1
    assert _staging_residue(path) == []


def test_swap_crash_injected_mid_flow_through_hadoop_fs(spark, tmpdir, monkeypatch):
    """End-to-end injection through the real compact_partition flow: the
    SECOND Hadoop-FS rename throws (executor lost mid-swap).  The next
    maintenance entry point must recover and then complete its work."""
    import outpost_spark.logstore.retention as retention_mod
    from outpost_spark.fsutil import MaintenanceFS

    path = os.path.join(tmpdir, "t")
    _write_months(spark, path)
    # fragment the partition so compaction has work to do
    part_path = os.path.join(path, "month=202401")
    df = spark.read.parquet(part_path)
    df.repartition(4).write.mode("overwrite").parquet(os.path.join(tmpdir, "frag"))
    shutil.rmtree(part_path)
    os.rename(os.path.join(tmpdir, "frag"), part_path)
    before = _snapshot_rows(spark, path, "202401")

    real_rename = MaintenanceFS.rename
    calls = {"n": 0}

    def crashing_rename(self, src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash: executor lost mid-swap")
        return real_rename(self, src, dst)

    monkeypatch.setattr(MaintenanceFS, "rename", crashing_rename)
    with pytest.raises(OSError, match="injected crash"):
        compact_partition(spark, path, "202401", target_files=1)
    monkeypatch.setattr(MaintenanceFS, "rename", real_rename)
    # crashed between the renames: partition dir is gone, trash holds truth
    assert not os.path.exists(part_path)
    # the next maintenance run recovers, then compacts successfully
    n = compact_partition(spark, path, "202401", target_files=1)
    assert n >= 2  # AQE may coalesce the 4-way fragmentation write
    assert _snapshot_rows(spark, path, "202401") == before
    assert _staging_residue(path) == []
