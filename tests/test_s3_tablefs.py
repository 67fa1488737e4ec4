"""S3 conditional-PUT commit backend (logstore/tablefs.py::S3TableFS)
against moto: the full TableFS contract, the exclusive-create race
(exactly one winner under concurrency), TxnTable's log protocol running
end-to-end over s3://, and parquet footer-stats reads through ranged
GETs — the third implementation of the LogStore seam (VERDICT r07
"Next round" #3), narrowing the "plain S3 needs an external
coordinating LogStore" caveat to pre-conditional-write stores.

Spark parquet DATA I/O on s3a:// needs the hadoop-aws jars (absent in
this environment), so the data-path matrix stays on local/file://; the
commit log — the part S3 couldn't do before conditional writes — is
exercised here in full.
"""

import json
import threading

import boto3
import pytest
from moto import mock_aws

from outpost_spark.logstore.tablefs import S3TableFS, table_fs

BUCKET = "txn-test-bucket"
ROOT = f"s3://{BUCKET}/tables/t1"


@pytest.fixture()
def s3fs():
    with mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield S3TableFS(client)


def test_dispatch_routes_s3_schemes(spark):
    assert isinstance(table_fs(spark, "s3://b/t"), S3TableFS)
    assert isinstance(table_fs(spark, "s3a://b/t"), S3TableFS)
    assert not isinstance(table_fs(spark, "file:///x"), S3TableFS)
    assert not isinstance(table_fs(spark, "/x"), S3TableFS)


def test_path_algebra(s3fs):
    assert s3fs.join("s3://b/t", "_txn_log", "0.json") == "s3://b/t/_txn_log/0.json"
    assert s3fs.relpath("s3://b/t/x/y.parquet", "s3://b/t") == "x/y.parquet"
    assert s3fs.normalize_root("s3://b/t/") == "s3://b/t"
    with pytest.raises(ValueError):
        s3fs.relpath("s3://b/other/x", "s3://b/t")


def test_put_if_absent_exclusive_full_content(s3fs):
    dst = f"{ROOT}/_txn_log/{0:020d}.json"
    assert s3fs.put_if_absent(dst, b'{"v": 0}') is True
    assert s3fs.put_if_absent(dst, b'{"v": "loser"}') is False
    assert s3fs.read_json(dst) == {"v": 0}
    assert s3fs.exists(dst)
    assert s3fs.getsize(dst) == len(b'{"v": 0}')
    assert s3fs.getmtime(dst) > 0


def test_put_if_absent_race_has_exactly_one_winner(s3fs):
    dst = f"{ROOT}/_txn_log/{7:020d}.json"
    results = []
    barrier = threading.Barrier(8)

    def contend(i):
        barrier.wait()
        results.append((i, s3fs.put_if_absent(dst, json.dumps({"w": i}).encode())))

    threads = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert s3fs.read_json(dst) == {"w": winners[0]}


def test_listdir_walk_isdir_rmtree(s3fs):
    s3fs.put_atomic(f"{ROOT}/_txn_log/{0:020d}.json", b"{}")
    s3fs.put_atomic(f"{ROOT}/_txn_log/{1:020d}.json", b"{}")
    s3fs.put_atomic(f"{ROOT}/data/month=202401/part-0.parquet", b"PAR1")
    assert s3fs.isdir(f"{ROOT}/_txn_log")
    assert not s3fs.isdir(f"{ROOT}/nope")
    assert s3fs.listdir(f"{ROOT}/_txn_log") == [
        f"{0:020d}.json",
        f"{1:020d}.json",
    ]
    # "subdirectories" surface as names, like os.listdir
    assert s3fs.listdir(ROOT) == ["_txn_log", "data"]
    walked = sorted(s3fs.walk_files(ROOT))
    assert (f"{ROOT}/data/month=202401/part-0.parquet", "part-0.parquet") in walked
    assert len(walked) == 3
    # relpath over walk output (what append's manifest builder does)
    assert s3fs.relpath(walked[-1][0], ROOT).startswith("data/")
    s3fs.rmtree(f"{ROOT}/data")
    assert not s3fs.isdir(f"{ROOT}/data")
    assert len(list(s3fs.walk_files(ROOT))) == 2


def test_read_json_missing_raises_filenotfound(s3fs):
    with pytest.raises(FileNotFoundError):
        s3fs.read_json(f"{ROOT}/_txn_log/missing.json")


def test_put_atomic_overwrites(s3fs):
    dst = f"{ROOT}/_txn_log/_checkpoint-{20:020d}.json"
    s3fs.put_atomic(dst, b'{"v": 1}')
    s3fs.put_atomic(dst, b'{"v": 2}')
    assert s3fs.read_json(dst) == {"v": 2}


def test_footer_stats_via_ranged_get(s3fs, tmp_path):
    """Stats pruning works against S3: a parquet footer read through
    the ranged-GET adapter yields the same min/max as a local read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outpost_spark.logstore.txntable import _footer_stats

    local = tmp_path / "f.parquet"
    pq.write_table(
        pa.table({"event_time": [3, 1, 7], "tenant": ["a", "c", "b"]}), local
    )
    key = f"{ROOT}/data/f.parquet"
    s3fs.put_atomic(key, local.read_bytes())
    with s3fs.open_input(key) as fh:
        rows, stats = _footer_stats(fh, ("event_time", "tenant"))
    with open(local, "rb") as fh:
        rows_l, stats_l = _footer_stats(fh, ("event_time", "tenant"))
    assert (rows, stats) == (rows_l, stats_l)
    assert rows == 3 and stats["event_time"] == [1, 7]


def test_txntable_log_protocol_over_s3(spark, s3fs, monkeypatch):
    """The whole commit protocol — create, optimistic commits with one
    winner per version slot, history, checkpoint write + bounded
    reconstruction, is_txn_table — over an s3:// root (moto).  Data
    files aren't written (no hadoop-aws in-env); the log layer is the
    part conditional PUT newly enables."""
    import outpost_spark.logstore.tablefs as tablefs_mod
    from outpost_spark.logstore.txntable import TxnTable
    from pyspark.sql import types as T

    # route this test's dispatch to the moto-backed client
    monkeypatch.setattr(
        tablefs_mod, "S3TableFS", lambda *a, **k: s3fs
    )
    schema = T.StructType([T.StructField("event_id", T.StringType())])
    assert TxnTable.is_txn_table(ROOT, spark) is False
    t = TxnTable.get_or_create(spark, ROOT, schema)
    assert TxnTable.is_txn_table(ROOT, spark) is True
    assert t.version() == 0
    # double-create degrades to open (the create commit loses its race)
    t2 = TxnTable.get_or_create(spark, ROOT, schema)
    assert t2.version() == 0

    # optimistic concurrency: both handles fight for version 1
    won1 = t._try_commit(1, {"op": "append", "adds": [], "removes": []})
    won2 = t2._try_commit(1, {"op": "append", "adds": [], "removes": []})
    assert (won1, won2) == (True, False)

    for v in range(2, 25):
        assert t._try_commit(v, {"op": "append", "adds": [], "removes": []})
        t._maybe_checkpoint(v)
    assert t.version() == 24
    # a checkpoint landed (CHECKPOINT_EVERY=20) and reconstruction
    # through it matches the full-log answer
    ck = t._latest_checkpoint()
    assert ck is not None and ck[0] >= t.CHECKPOINT_EVERY - 1
    assert [h["version"] for h in t.history()] == list(range(25))
    schema_json, live, _removed = t._state()
    assert live == {} and schema_json is not None

def test_hadoop_conf_drives_commit_log_endpoint(spark, monkeypatch):
    """The s3a split-brain fix: with the S3 endpoint + credentials set
    ONLY via the session's fs.s3a.* Hadoop conf (how a MinIO cluster is
    configured), the commit log's boto3 client follows the SAME conf —
    log objects land on that endpoint, not on boto3's default chain."""
    from moto.server import ThreadedMotoServer

    monkeypatch.delenv("OUTPOST_SPARK_S3_ENDPOINT", raising=False)
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server._server.server_address[:2]
    endpoint = f"http://{host}:{port}"
    hconf = spark._jsc.hadoopConfiguration()
    keys = {
        "fs.s3a.endpoint": f"{host}:{port}",  # bare host:port, s3a style
        "fs.s3a.connection.ssl.enabled": "false",
        "fs.s3a.access.key": "conf-ak",
        "fs.s3a.secret.key": "conf-sk",
        "fs.s3a.endpoint.region": "us-east-1",
    }
    try:
        for k, v in keys.items():
            hconf.set(k, v)
        probe = boto3.client(
            "s3",
            endpoint_url=endpoint,
            aws_access_key_id="conf-ak",
            aws_secret_access_key="conf-sk",
            region_name="us-east-1",
        )
        probe.create_bucket(Bucket="minio-bkt")

        fs = table_fs(spark, "s3a://minio-bkt/tables/t1")
        assert isinstance(fs, S3TableFS)
        dst = "s3a://minio-bkt/tables/t1/_txn_log/00000000000000000000.json"
        assert fs.put_if_absent(dst, b'{"v": 0}') is True
        assert fs.put_if_absent(dst, b'{"v": 1}') is False
        assert fs.read_json(dst) == {"v": 0}
        # the log object is ON the conf-configured endpoint
        got = probe.get_object(
            Bucket="minio-bkt", Key="tables/t1/_txn_log/00000000000000000000.json"
        )
        assert json.loads(got["Body"].read()) == {"v": 0}
    finally:
        for k in keys:
            hconf.unset(k)
        server.stop()


def test_per_bucket_conf_overrides_base(spark):
    """fs.s3a.bucket.<name>.* wins over the base keys — s3a's own
    resolution order, mirrored onto the commit-log client."""
    from outpost_spark.logstore.tablefs import _s3a_client_conf

    hconf = spark._jsc.hadoopConfiguration()
    keys = {
        "fs.s3a.endpoint": "base.example:9000",
        "fs.s3a.connection.ssl.enabled": "false",
        "fs.s3a.bucket.special.endpoint": "https://special.example",
    }
    try:
        for k, v in keys.items():
            hconf.set(k, v)
        base = _s3a_client_conf(spark, "s3a://plain/t")
        assert base["endpoint_url"] == "http://base.example:9000"
        special = _s3a_client_conf(spark, "s3a://special/t")
        assert special["endpoint_url"] == "https://special.example"
    finally:
        for k in keys:
            hconf.unset(k)


def test_partial_static_credentials_fall_through_to_default_chain(spark):
    """An access key whose secret lives elsewhere (Hadoop credential
    provider, IAM) must NOT be forwarded alone — boto3 would raise
    PartialCredentialsError instead of resolving its default chain."""
    from outpost_spark.logstore.tablefs import _s3a_client_conf

    hconf = spark._jsc.hadoopConfiguration()
    try:
        hconf.set("fs.s3a.access.key", "lonely-ak")
        out = _s3a_client_conf(spark, "s3a://b/t")
        assert "access_key" not in out and "secret_key" not in out
        hconf.set("fs.s3a.secret.key", "now-sk")
        out = _s3a_client_conf(spark, "s3a://b/t")
        assert out["access_key"] == "lonely-ak"
        assert out["secret_key"] == "now-sk"
    finally:
        hconf.unset("fs.s3a.access.key")
        hconf.unset("fs.s3a.secret.key")


def test_env_endpoint_still_wins_over_conf(spark, monkeypatch):
    """OUTPOST_SPARK_S3_ENDPOINT is the explicit operator override."""
    hconf = spark._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", "http://conf.example:9000")
    monkeypatch.setenv("OUTPOST_SPARK_S3_ENDPOINT", "http://env.example:9999")
    try:
        fs = table_fs(spark, "s3a://b/t")
        assert fs._endpoint_url == "http://env.example:9999"
    finally:
        hconf.unset("fs.s3a.endpoint")
