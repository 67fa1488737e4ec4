"""Incremental ingestion with near-dup gating: batch-level gate semantics
and the end-to-end foreachBatch stream (file source, availableNow)."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from outpost_spark.streaming.ingest import DedupIndex, attach_ingest_stream

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)
OTHER = (
    "completely different text describing spark query engines, columnar io "
    "paths and the joy of vectorized execution on modern hardware stacks"
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gate_intra_batch_collapse(spark, tmpdir):
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    batch = _docs(spark, [(1, BASE), (2, BASE), (3, BASE.replace("quick", "swift")), (4, OTHER)])
    admitted, rejected = idx.gate(batch)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 4]
    rej = {r["doc_id"]: r["matched_id"] for r in rejected.collect()}
    assert rej == {2: 1, 3: 1}  # collapsed to the min-id batch-mate


def test_gate_against_existing_index(spark, tmpdir):
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    idx.build(_docs(spark, [(1, BASE), (4, OTHER)]))
    batch = _docs(spark, [(10, BASE), (11, BASE.replace("fox", "cat")), (12, "some brand new content about volcanoes and oceans under a winter sky")])
    admitted, rejected = idx.gate(batch)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [12]
    rej = {r["doc_id"]: (r["matched_id"], r["jaccard"]) for r in rejected.collect()}
    assert rej[10][0] == 1 and rej[10][1] == 1.0  # exact content -> J=1 vs indexed doc
    # 11 is a near-dup of its batch-mate 10 -> collapsed intra-batch first
    assert rej[11] == (10, None)


def test_gate_admits_everything_without_index(spark, tmpdir):
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    batch = _docs(spark, [(1, BASE), (2, OTHER)])
    admitted, rejected = idx.gate(batch)
    assert admitted.count() == 2 and rejected.count() == 0


def test_ingest_stream_two_batches_end_to_end(spark, tmpdir):
    src = os.path.join(tmpdir, "in")
    corpus = os.path.join(tmpdir, "corpus")
    rejects = os.path.join(tmpdir, "rejects")
    ck = os.path.join(tmpdir, "ck")
    os.makedirs(src)
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )

    def run_batch(rows, fname):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema(schema).json(src)
        q = (
            attach_ingest_stream(stream, idx, corpus, ck, rejects_path=rejects)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([{"doc_id": 1, "text": BASE}, {"doc_id": 2, "text": OTHER}], "b1.json")
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    ) == [1, 2]

    # batch 2: near-dup of doc 1 rejected against the index, new doc admitted
    run_batch(
        [
            {"doc_id": 10, "text": BASE.replace("quick", "swift")},
            {"doc_id": 11, "text": "entirely novel prose about glaciers, tides and the slow drift of continents"},
        ],
        "b2.json",
    )
    kept = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 2, 11]
    rej = {r["doc_id"]: r["matched_id"] for r in spark.read.parquet(rejects).collect()}
    assert rej == {10: 1}
    # admitted doc 11 is now indexed: a third batch duplicating it is rejected
    run_batch([{"doc_id": 20, "text": "entirely novel prose about glaciers, tides and the slow drift of continents"}], "b3.json")
    assert sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect()) == [1, 2, 11]


def test_gate_rejects_replayed_batch(spark, tmpdir):
    """Crash-replay contract: once a batch's survivors are indexed, running
    the same batch through the gate again admits nothing — each doc finds
    its own index row at J=1.0 (self-matches are deliberately not
    excluded from the probe)."""
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    batch = _docs(spark, [(1, BASE), (2, OTHER)])
    admitted, _ = idx.gate(batch)
    idx.append(admitted)
    re_admitted, re_rejected = idx.gate(batch)  # replay
    assert re_admitted.count() == 0
    rej = {r["doc_id"]: (r["matched_id"], r["jaccard"]) for r in re_rejected.collect()}
    assert rej == {1: (1, 1.0), 2: (2, 1.0)}


def test_gate_digest_rejects_short_doc_replay(spark, tmpdir):
    """Documents shorter than shingle_len have empty gram sets, so the
    Jaccard verify alone would score a replayed copy at 0.0 and re-admit
    it; the content digest must short-circuit those to an unconditional
    reject (both intra-batch and against the index)."""
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    # intra-batch: two exact short copies collapse to the min id
    batch = _docs(spark, [(1, "hi"), (2, "hi"), (3, "yo")])
    admitted, rejected = idx.gate(batch)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 3]
    assert {r["doc_id"]: r["matched_id"] for r in rejected.collect()} == {2: 1}
    idx.append(admitted)
    # replay: both short survivors find their own digest in the index
    re_admitted, re_rejected = idx.gate(_docs(spark, [(1, "hi"), (3, "yo")]))
    assert re_admitted.count() == 0
    rej = {r["doc_id"]: (r["matched_id"], r["jaccard"]) for r in re_rejected.collect()}
    assert rej == {1: (1, 1.0), 3: (3, 1.0)}
    # different short docs are NOT each other's duplicates
    new_admitted, _ = idx.gate(_docs(spark, [(9, "ok")]))
    assert sorted(r["doc_id"] for r in new_admitted.collect()) == [9]


def test_index_compaction_bounds_files_and_preserves_gate(spark, tmpdir):
    idx = DedupIndex(os.path.join(tmpdir, "idx"))
    idx.build(_docs(spark, [(100, BASE), (101, OTHER)]))
    for i in range(3):  # repeat-append the same buckets -> files pile up per pfx
        idx.append(_docs(spark, [(200 + i, BASE + f" tail {i}"), (300 + i, OTHER + f" tail {i}")]))
    probe = _docs(spark, [(500, BASE), (501, OTHER)])
    before_adm, before_rej = idx.gate(probe)
    before = (
        sorted(r["doc_id"] for r in before_adm.collect()),
        sorted((r["doc_id"], r["matched_id"]) for r in before_rej.collect()),
    )
    # some partition must have accumulated >1 file for the test to bite
    parts = [d for d in os.listdir(idx.path) if d.startswith("pfx=")]
    max_before = max(
        sum(1 for f in os.listdir(os.path.join(idx.path, d)) if f.endswith(".parquet"))
        for d in parts
    )
    assert max_before > 1
    report = idx.compact(spark, target_files=1)
    assert report  # something was compacted
    for d in (x for x in os.listdir(idx.path) if x.startswith("pfx=")):
        n = sum(1 for f in os.listdir(os.path.join(idx.path, d)) if f.endswith(".parquet"))
        assert n <= 1
        assert not any(f.startswith(("_tmp_", "_trash_")) for f in os.listdir(idx.path))
    after_adm, after_rej = idx.gate(probe)
    after = (
        sorted(r["doc_id"] for r in after_adm.collect()),
        sorted((r["doc_id"], r["matched_id"]) for r in after_rej.collect()),
    )
    assert before == after


def test_index_exists_uses_hadoop_fs(spark, tmpdir):
    """exists() must go through the Hadoop FileSystem API (scheme-agnostic),
    not os.path — a file:// URI that os.path.exists would reject still
    resolves."""
    p = os.path.join(tmpdir, "idx")
    idx_uri = DedupIndex("file://" + p)
    assert not idx_uri.exists(spark)
    idx_local = DedupIndex(p)
    idx_local.build(_docs(spark, [(1, BASE)]))
    assert idx_uri.exists(spark)
    assert idx_local.exists(spark)
    assert idx_local.exists()  # session-less local fallback still works


def test_index_meta_versioning(spark, tmpdir):
    """Index format/parameters are pinned in _meta.json: a pre-versioning
    index (no meta) and a parameter mismatch both fail LOUDLY instead of
    silently admitting duplicates against incompatibly-hashed rows."""
    import glob

    p = os.path.join(tmpdir, "idx")
    idx = DedupIndex(p)
    idx.build(_docs(spark, [(1, BASE)]))
    assert os.path.exists(os.path.join(p, "_meta.json"))
    # normal operation passes the check
    admitted, _ = idx.gate(_docs(spark, [(2, OTHER)]))
    idx.append(admitted)

    # same path, different LSH parameters -> refuse
    other = DedupIndex(p, bands=8, rows_per_band=2)
    with pytest.raises(ValueError, match="mismatch"):
        other.gate(_docs(spark, [(3, OTHER)]))
    with pytest.raises(ValueError, match="mismatch"):
        other.append(_docs(spark, [(3, OTHER)]))

    # legacy/partial index (data, no meta) -> refuse with rebuild hint
    os.remove(os.path.join(p, "_meta.json"))
    with pytest.raises(ValueError, match="rebuild"):
        idx.gate(_docs(spark, [(4, OTHER)]))
    # rebuild restores service
    idx.build(_docs(spark, [(1, BASE)]))
    re_admitted, _ = idx.gate(_docs(spark, [(1, BASE)]))
    assert re_admitted.count() == 0  # replay still self-rejects


@pytest.mark.slow
def test_index_compaction_through_file_scheme_uri(spark, tmpdir):
    """compact() must work on a URI path (Hadoop FS API surface — the same
    code path a hdfs:// or s3a:// deployment hits), not just bare local
    paths, and gate results must be identical before/after."""
    p = os.path.join(tmpdir, "idx")
    idx = DedupIndex("file://" + p)
    idx.build(_docs(spark, [(100, BASE), (101, OTHER)]))
    for i in range(3):
        idx.append(_docs(spark, [(200 + i, BASE + f" tail {i}"), (300 + i, OTHER + f" tail {i}")]))
    probe = _docs(spark, [(500, BASE), (501, OTHER)])
    before_adm, before_rej = idx.gate(probe)
    before = (
        sorted(r["doc_id"] for r in before_adm.collect()),
        sorted((r["doc_id"], r["matched_id"]) for r in before_rej.collect()),
    )
    parts = [d for d in os.listdir(p) if d.startswith("pfx=")]
    assert max(
        sum(1 for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet"))
        for d in parts
    ) > 1
    report = idx.compact(spark, target_files=1)
    assert report
    for d in (x for x in os.listdir(p) if x.startswith("pfx=")):
        n = sum(1 for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet"))
        assert n <= 1
    assert not any(f.startswith(("_tmp_", "_trash_")) for f in os.listdir(p))
    after_adm, after_rej = idx.gate(probe)
    after = (
        sorted(r["doc_id"] for r in after_adm.collect()),
        sorted((r["doc_id"], r["matched_id"]) for r in after_rej.collect()),
    )
    assert before == after


@pytest.mark.slow
def test_text_gate_txn_storage_crash_window_closed(spark, tmpdir):
    """storage='txn' twin of the embed gate's crash test: corpus append
    committed, crash before the index append, replay through the real
    foreachBatch closure -> no corpus duplicate, index completes, and
    subsequent batches gate against the recovered index."""
    from outpost_spark.logstore.txntable import TxnTable, load_table
    from outpost_spark.streaming.ingest import attach_ingest_stream

    corpus_path = os.path.join(tmpdir, "corpus")
    idx = DedupIndex(os.path.join(tmpdir, "idx"), storage="txn")
    idx.build(_docs(spark, [(1, BASE), (4, OTHER)]))
    assert TxnTable.is_txn_table(idx.path) and idx.exists(spark)

    captured = {}

    def fake_stream():
        class W:
            def foreachBatch(self, fn):
                captured["fn"] = fn
                return self

            def option(self, *a, **k):
                return self

        class S:
            writeStream = W()

        return S()

    attach_ingest_stream(
        fake_stream(), idx, corpus_path, os.path.join(tmpdir, "ck2")
    )
    process = captured["fn"]

    fresh = "some brand new content about volcanoes and oceans under a winter sky"
    b0 = _docs(spark, [(10, fresh)])
    process(b0, 0)
    assert {r["doc_id"] for r in load_table(spark, corpus_path).collect()} == {10}

    # batch 1: one new doc + an exact dup of 10.  Crash between corpus
    # and index appends: run only the corpus half with the sink's txn.
    newdoc = "completely different prose regarding deserts, dunes and the midday heat"
    b1 = _docs(spark, [(20, newdoc), (21, fresh)])
    admitted, _ = idx.gate(b1)
    admitted = admitted.localCheckpoint(eager=True)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [20]
    TxnTable.get_or_create(spark, corpus_path, admitted.schema).append(
        admitted, app_txn=("textgate::corpus", 1)
    )
    # CRASH: index append for batch 1 never ran.  Replay via the sink:
    process(b1, 1)
    corpus = load_table(spark, corpus_path)
    assert sorted(r["doc_id"] for r in corpus.collect()) == [10, 20]
    assert corpus.count() == 2  # no duplicate from the replay
    # index recovered: a dup of 20 now rejects
    adm3, rej3 = idx.gate(_docs(spark, [(30, newdoc)]))
    assert adm3.count() == 0
    assert {(r["doc_id"], r["matched_id"]) for r in rej3.collect()} == {(30, 20)}
    # txn compaction: pile up appends, compact per-pfx, gate unchanged
    report = idx.compact(spark, target_files=1)
    assert isinstance(report, dict)
    adm4, _ = idx.gate(_docs(spark, [(40, fresh)]))
    assert adm4.count() == 0


def test_txntable_concurrent_thread_writers_all_commit(spark, tmpdir):
    """Optimistic concurrency under real contention: 4 threads x 5
    appends race on one table; every commit lands at a distinct version
    and the snapshot holds every row exactly once."""
    import threading

    from pyspark.sql import functions as F

    from outpost_spark.logstore.txntable import TxnTable

    path = os.path.join(tmpdir, "race")
    df0 = spark.range(1).select(
        F.col("id").alias("v"), F.lit(-1).cast("long").alias("w")
    )
    t = TxnTable.get_or_create(spark, path, df0.schema)
    errs = []

    def writer(tid):
        try:
            tt = TxnTable(spark, path)
            for i in range(5):
                tt.append(
                    spark.range(1).select(
                        F.lit(tid * 100 + i).cast("long").alias("v"),
                        F.lit(tid).cast("long").alias("w"),
                    )
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.version() == 20  # create + 20 appends, no version collisions
    rows = sorted(r["v"] for r in t.read().collect())
    assert rows == sorted(tid * 100 + i for tid in range(4) for i in range(5))
