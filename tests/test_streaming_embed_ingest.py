"""Tests: incremental embedding ingestion with semantic-dup gating
(the vector twin of streaming/ingest.py's text gate)."""

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from outpost_spark.streaming.embed_ingest import (
    EmbedDedupIndex,
    attach_embed_ingest_stream,
)

DIMS = 16


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="outpost_embed_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _mk(seed=3, n=12):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, DIMS))


def _cents(base):
    return [[float(x) for x in base[i]] for i in range(4)]


def test_gate_intra_batch_and_index_hits(spark, tmpdir):
    base = _mk()
    idx = EmbedDedupIndex(os.path.join(tmpdir, "idx"), _cents(base), threshold=0.95, nprobe=2)
    corpus = _vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(8)])
    idx.build(corpus)

    near_of_5 = base[5] + 0.01  # cosine ~1 to corpus vector 5
    fresh = base[10]
    fresh_dup = fresh + 0.01    # intra-batch near-dup of 100
    batch = _vecs(
        spark,
        [
            (100, [float(x) for x in fresh]),
            (101, [float(x) for x in fresh_dup]),
            (102, [float(x) for x in near_of_5]),
            (103, [float(x) for x in base[11]]),
        ],
    )
    admitted, rejected = idx.gate(batch)
    assert {r["vec_id"] for r in admitted.collect()} == {100, 103}
    rej = {r["vec_id"]: (r["matched_id"], r["cosine"]) for r in rejected.collect()}
    assert rej[101][0] == 100 and rej[101][1] is None  # intra-batch collapse
    assert rej[102][0] == 5 and rej[102][1] >= 0.95    # index hit


def test_gate_rejects_replayed_batch_including_zero_vectors(spark, tmpdir):
    """After a batch commits to the index, replaying it admits NOTHING —
    each vector matches its own index row at cosine 1.0, and zero
    vectors (cosine 0 to everything, themselves included) are caught by
    the exact-equality clause."""
    base = _mk(seed=9)
    idx = EmbedDedupIndex(os.path.join(tmpdir, "idx"), _cents(base), threshold=0.95, nprobe=2)
    batch = _vecs(
        spark,
        [(200, [float(x) for x in base[6]]), (201, [0.0] * DIMS)],
    )
    admitted, _ = idx.gate(batch)
    assert {r["vec_id"] for r in admitted.collect()} == {200, 201}
    idx.append(admitted)
    replay_admitted, replay_rejected = idx.gate(batch)
    assert replay_admitted.count() == 0
    rej = {r["vec_id"]: r["matched_id"] for r in replay_rejected.collect()}
    assert rej == {200: 200, 201: 201}


def test_gate_zero_vector_pair_within_batch(spark, tmpdir):
    """Two zero vectors in one batch collapse to the min id via the
    equality clause (their cosine is 0, below any threshold)."""
    base = _mk(seed=5)
    idx = EmbedDedupIndex(os.path.join(tmpdir, "idx"), _cents(base))
    batch = _vecs(spark, [(300, [0.0] * DIMS), (301, [0.0] * DIMS)])
    admitted, rejected = idx.gate(batch)
    assert {r["vec_id"] for r in admitted.collect()} == {300}
    assert {(r["vec_id"], r["matched_id"]) for r in rejected.collect()} == {(301, 300)}


def test_meta_rejects_different_centroids(spark, tmpdir):
    base = _mk(seed=7)
    path = os.path.join(tmpdir, "idx")
    idx = EmbedDedupIndex(path, _cents(base))
    idx.build(_vecs(spark, [(0, [float(x) for x in base[0]])]))
    other = EmbedDedupIndex(path, _cents(base * 0.5))
    with pytest.raises(ValueError, match="mismatch"):
        other.gate(_vecs(spark, [(1, [float(x) for x in base[1]])]))


@pytest.mark.slow
def test_embed_ingest_stream_two_batches_end_to_end(spark, tmpdir):
    """File-source stream through attach_embed_ingest_stream: batch 2's
    near-dup of a batch-1 survivor is rejected by the index batch 1
    appended — cross-batch dedup through the real streaming wiring."""
    base = _mk(seed=13)
    srcdir = os.path.join(tmpdir, "src")
    os.makedirs(srcdir)
    corpus_path = os.path.join(tmpdir, "corpus")
    idx = EmbedDedupIndex(os.path.join(tmpdir, "idx"), _cents(base), nprobe=2)

    def write_batch(name, rows):
        stage = os.path.join(tmpdir, "stage")
        _vecs(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part), os.path.join(srcdir, name))

    write_batch("b1.parquet", [(400, [float(x) for x in base[4]])])
    write_batch(
        "b2.parquet",
        [
            (500, [float(x) for x in (base[4] + 0.01)]),  # near-dup of 400
            (501, [float(x) for x in base[9]]),           # genuinely new
        ],
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcdir)
    )
    q = (
        attach_embed_ingest_stream(
            stream, idx, corpus_path, os.path.join(tmpdir, "ckpt"),
            rejects_path=os.path.join(tmpdir, "rejects"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    corpus_ids = {
        r["vec_id"] for r in spark.read.parquet(corpus_path).collect()
    }
    assert corpus_ids == {400, 501}
    rejects = {
        (r["vec_id"], r["matched_id"])
        for r in spark.read.parquet(os.path.join(tmpdir, "rejects")).collect()
    }
    assert (500, 400) in rejects


@pytest.mark.slow
def test_embed_ingest_txn_storage_e2e_and_crash_window_closed(spark, tmpdir):
    """storage='txn': the same cross-batch gating end-to-end, PLUS the
    crash window the parquet mode documents as accepted — corpus
    committed, crash before the index append — replayed to convergence
    with NO corpus duplicate (per-table writer transactions)."""
    from outpost_spark.logstore.txntable import TxnTable, load_table
    from outpost_spark.streaming.embed_ingest import attach_embed_ingest_stream

    base = _mk(seed=17)
    corpus_path = os.path.join(tmpdir, "corpus")
    idx = EmbedDedupIndex(
        os.path.join(tmpdir, "idx"), _cents(base), nprobe=2, storage="txn"
    )
    # seed the index through the txn build (atomic rebuild commit)
    idx.build(_vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(6)]))
    assert TxnTable.is_txn_table(idx.path)

    # drive the foreachBatch function directly so the crash is
    # injectable: capture the closure attach_embed_ingest_stream builds
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

    attach_embed_ingest_stream(
        fake_stream(), idx, corpus_path, os.path.join(tmpdir, "ckpt2")
    )
    process = captured["fn"]

    b1 = _vecs(spark, [(700, [float(x) for x in base[7]])])
    process(b1, 0)
    assert {r["vec_id"] for r in load_table(spark, corpus_path).collect()} == {700}

    # batch 1: one new vector + a near-dup of 700.  Simulate a crash
    # between the corpus append and the index append: run only the
    # corpus half by calling process on a table where the index append
    # will be interrupted — emulate by doing the gate + corpus append
    # manually with the same app_txn the sink uses.
    b2 = _vecs(
        spark,
        [
            (800, [float(x) for x in base[8]]),
            (801, [float(x) for x in (base[7] + 0.01)]),  # dup of 700
        ],
    )
    admitted, _ = idx.gate(b2)
    admitted = admitted.localCheckpoint(eager=True)
    TxnTable.get_or_create(spark, corpus_path, admitted.schema).append(
        admitted, app_txn=("embedgate::corpus", 1)
    )
    # CRASH here: index append for batch 1 never happened.
    ids_after_crash = {
        r["vec_id"] for r in load_table(spark, corpus_path).collect()
    }
    assert ids_after_crash == {700, 800}

    # replay of batch 1 through the real sink: corpus append must no-op
    # (same writer txn), index append must complete; nothing duplicates
    process(b2, 1)
    corpus = load_table(spark, corpus_path)
    assert {r["vec_id"] for r in corpus.collect()} == {700, 800}
    assert corpus.count() == 2  # the closed window: no duplicate rows
    # index now holds batch-1 survivors: a fresh near-dup of 800 rejects
    b3 = _vecs(spark, [(900, [float(x) for x in (base[8] + 0.01)])])
    admitted3, rejected3 = idx.gate(b3)
    assert admitted3.count() == 0
    assert {(r["vec_id"], r["matched_id"]) for r in rejected3.collect()} == {
        (900, 800)
    }


# ── IVFADC prefilter on the gate (r14, VERDICT r13 task #8) ─────────────


def _gate_sets(idx, batch):
    admitted, rejected = idx.gate(batch)
    adm = frozenset(r["vec_id"] for r in admitted.collect())
    rej = frozenset(
        (r["vec_id"], r["matched_id"], r["cosine"]) for r in rejected.collect()
    )
    return adm, rej


@pytest.mark.slow
def test_pq_gate_decisions_equal_full_gate(spark, tmpdir):
    """The ADC prefilter + exact verify must reach EXACTLY the decisions
    the full-vector gate reaches on the planted stream — near-dups of
    indexed vectors, intra-batch clusters, fresh vectors, zero vectors,
    and full replays."""
    base = _mk(n=14)
    corpus_rows = [(i, [float(x) for x in base[i]]) for i in range(8)]
    corpus_rows.append((8, [0.0] * DIMS))  # an indexed zero vector
    full = EmbedDedupIndex(
        os.path.join(tmpdir, "full"), _cents(base), threshold=0.95, nprobe=2
    )
    pq = EmbedDedupIndex(
        os.path.join(tmpdir, "pq"), _cents(base), threshold=0.95, nprobe=2,
        pq_m=4, pq_k=16,
    )
    full.build(_vecs(spark, corpus_rows))
    pq.build(_vecs(spark, corpus_rows))

    batches = [
        [  # near-dup of indexed, intra-batch pair, fresh, far
            (100, [float(x) for x in base[5] + 0.01]),
            (101, [float(x) for x in base[10]]),
            (102, [float(x) for x in base[10] + 0.01]),
            (103, [float(x) for x in base[11]]),
        ],
        [  # replay of indexed rows incl. the zero vector
            (0, [float(x) for x in base[0]]),
            (8, [0.0] * DIMS),
            (104, [0.0] * DIMS),  # new zero vector: equal to indexed zero
        ],
        [(105, [float(x) for x in base[12]])],
    ]
    for rows in batches:
        batch = _vecs(spark, rows)
        assert _gate_sets(full, batch) == _gate_sets(pq, batch), rows


def test_pq_gate_e2e_append_and_replay(spark, tmpdir):
    """Admitted vectors append WITH their codes; a replayed batch then
    rejects itself through the prefilter's code-equality path."""
    base = _mk(seed=5, n=12)
    idx = EmbedDedupIndex(
        os.path.join(tmpdir, "idx"), _cents(base), threshold=0.95, nprobe=2,
        pq_m=4, pq_k=16,
    )
    idx.build(_vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(6)]))
    batch = _vecs(
        spark,
        [(200, [float(x) for x in base[7]]), (201, [0.0] * DIMS)],
    )
    admitted, _ = idx.gate(batch)
    assert {r["vec_id"] for r in admitted.collect()} == {200, 201}
    idx.append(admitted)
    # the index rows carry codes
    rows = spark.read.parquet(os.path.join(tmpdir, "idx"))
    assert "pq" in rows.columns
    assert rows.filter(F.col("pq").isNull()).count() == 0
    # replay: both reject (200 at cosine 1.0; 201 via code equality)
    admitted2, rejected2 = idx.gate(batch)
    assert admitted2.count() == 0
    rej = {r["vec_id"]: r["matched_id"] for r in rejected2.collect()}
    assert rej == {200: 200, 201: 201}


def test_pq_index_reopens_from_persisted_codebooks(spark, tmpdir):
    base = _mk(seed=7)
    path = os.path.join(tmpdir, "idx")
    idx = EmbedDedupIndex(path, _cents(base), pq_m=4, pq_k=16)
    idx.build(_vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(6)]))
    # a fresh object without codebooks lazy-loads them from _pq.json
    reopened = EmbedDedupIndex(path, _cents(base), pq_m=4, pq_k=16)
    batch = _vecs(spark, [(300, [float(x) for x in base[2] + 0.005])])
    admitted, rejected = reopened.gate(batch)
    assert admitted.count() == 0
    assert {r["matched_id"] for r in rejected.collect()} == {2}
    assert reopened.pq_codebooks == idx.pq_codebooks


def test_pq_meta_mismatch_rejected(spark, tmpdir):
    base = _mk(seed=9)
    path = os.path.join(tmpdir, "idx")
    EmbedDedupIndex(path, _cents(base), pq_m=4, pq_k=16).build(
        _vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(6)])
    )
    plain = EmbedDedupIndex(path, _cents(base))  # no pq: different meta
    with pytest.raises(ValueError, match="mismatch"):
        plain.gate(_vecs(spark, [(1, [float(x) for x in base[1]])]))


def test_pq_slack_and_param_validation(tmpdir):
    """pq_slack outside [0, threshold] is a construction-time error
    (ADVICE r14): negative slack raises the ADC bar ABOVE the exact
    threshold (guaranteed misses even at zero quantization error)."""
    cents = [[1.0] * DIMS]
    with pytest.raises(ValueError, match="pq_slack"):
        EmbedDedupIndex(tmpdir, cents, pq_m=1, pq_slack=-0.01)
    with pytest.raises(ValueError, match="pq_slack"):
        EmbedDedupIndex(tmpdir, cents, threshold=0.9, pq_m=1, pq_slack=0.95)
    with pytest.raises(ValueError, match="pq_k"):
        EmbedDedupIndex(tmpdir, cents, pq_m=1, pq_k=1)
    with pytest.raises(ValueError, match="pq_m"):
        EmbedDedupIndex(tmpdir, cents, pq_m=0)
    # boundary values are legal
    EmbedDedupIndex(tmpdir, cents, threshold=0.9, pq_m=1, pq_slack=0.9)
    EmbedDedupIndex(tmpdir, cents, threshold=0.9, pq_m=1, pq_slack=0.0)


def test_pq_build_writes_calibration(spark, tmpdir):
    """build() measures |ADC - exact| cosine error over all sample
    pairs and persists it beside the index — the number that sizes
    pq_slack for real data (ADVICE r14: 0.08 was unvalidated)."""
    base = _mk(seed=13)
    path = os.path.join(tmpdir, "idx")
    idx = EmbedDedupIndex(path, _cents(base), pq_m=4, pq_k=16)
    idx.build(_vecs(spark, [(i, [float(x) for x in base[i]]) for i in range(8)]))
    cal = idx.pq_calibration(spark)
    assert cal["sample_n"] == 8
    assert 0.0 <= cal["p99_abs_cos_err"] <= cal["max_abs_cos_err"] <= 2.0
    assert cal["pq_slack"] == idx.pq_slack
    assert cal["slack_covers_max_err"] == (idx.pq_slack >= cal["max_abs_cos_err"])
    # a reopened object reads the same record; a non-PQ index has none
    assert EmbedDedupIndex(path, _cents(base), pq_m=4, pq_k=16).pq_calibration(spark) == cal
    full = EmbedDedupIndex(os.path.join(tmpdir, "full"), _cents(base))
    full.build(_vecs(spark, [(0, [float(x) for x in base[0]])]))
    assert full.pq_calibration(spark) is None


def test_pq_slack_exceeded_fails_open_admits_duplicate(spark, tmpdir):
    """Adversarial slack sizing (VERDICT r14 task #7): when quantization
    error EXCEEDS pq_slack, the prefilter's miss must fail OPEN — the
    true near-dup is ADMITTED (a duplicate enters the corpus), never
    the reverse (a unique vector dropped).  Same geometry, slack =
    threshold -> the shortlist recovers it and the decision equals the
    full-vector gate's.

    Geometry (m=1, k=2): the indexed vector t = e1 + 0.1*e2 sits next
    to codeword e2 in L2 (its same-direction codeword is 50*e1, far
    away), so recon(t) = e2 and ADC cosine(q, recon) ~ 0 for the query
    q = 30*e1 — while exact cosine(q, t) ~ 0.995 and their codes differ
    (q encodes to 50*e1)."""
    e1 = np.zeros(DIMS); e1[0] = 1.0
    e2 = np.zeros(DIMS); e2[1] = 1.0
    t = e1 + 0.1 * e2
    q = 30.0 * e1
    assert float(q @ t / (np.linalg.norm(q) * np.linalg.norm(t))) > 0.99
    cents = [[float(x) for x in e1], [float(x) for x in e2]]
    book = [[[float(x) for x in 50.0 * e1], [float(x) for x in e2]]]
    corpus = _vecs(spark, [(0, [float(x) for x in t])])
    batch = _vecs(spark, [(100, [float(x) for x in q])])

    tight = EmbedDedupIndex(
        os.path.join(tmpdir, "tight"), cents, threshold=0.95, nprobe=1,
        pq_m=1, pq_k=2, pq_slack=0.05, pq_codebooks=book,
    )
    tight.build(corpus)
    # the calibration record FLAGS the mis-sizing before any gating
    cal = tight.pq_calibration(spark)
    assert cal["max_abs_cos_err"] > 0.05 and not cal["slack_covers_max_err"]
    admitted, rejected = tight.gate(batch)
    assert {r["vec_id"] for r in admitted.collect()} == {100}  # fails open
    assert rejected.count() == 0

    wide = EmbedDedupIndex(
        os.path.join(tmpdir, "wide"), cents, threshold=0.95, nprobe=1,
        pq_m=1, pq_k=2, pq_slack=0.95, pq_codebooks=book,
    )
    wide.build(corpus)
    admitted2, rejected2 = wide.gate(batch)
    assert admitted2.count() == 0
    rej = {(r["vec_id"], r["matched_id"]) for r in rejected2.collect()}
    assert rej == {(100, 0)}


def test_non_integral_id_column_rejected(spark, tmpdir):
    """String ids would silently null out in the assignment cast —
    build/append/gate fail loudly instead (ADVICE r14)."""
    base = _mk(seed=15)
    idx = EmbedDedupIndex(os.path.join(tmpdir, "idx"), _cents(base))
    bad = spark.createDataFrame(
        [("a", [float(x) for x in base[0]])],
        "vec_id string, embedding array<double>",
    )
    for method in (idx.build, idx.append, idx.gate):
        with pytest.raises(ValueError, match="integral id"):
            method(bad)
