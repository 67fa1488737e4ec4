"""Incremental EMBEDDING ingestion with semantic-duplicate gating — the
vector twin of :mod:`outpost_spark.streaming.ingest`.

Embeddings arrive continuously (a live encoder feeding a corpus); each
micro-batch must be checked for semantic near-duplicates against the
already-ingested vectors without rescanning them.  Same pattern as the
text gate, with IVF blocking instead of MinHash banding:

- The corpus maintains an **IVF index**: one row per vector holding its
  assignment list id (argmax-cosine centroid, BLAS-assigned) and the
  vector itself, written as parquet partitioned by a bounded hash of the
  list id (``pmod(cid, N)``).
- Each batch assigns its vectors with the SAME centroids
  (:func:`outpost_spark.ops.similarity.ivf_assign_bulk`), probes its
  ``nprobe`` nearest lists — reading only the index partitions those
  lists hash into — and drops vectors with exact cosine >= threshold
  against any indexed vector.
- Batch-internal near-dup clusters collapse to their min-id member first
  (the per-list BLAS scorer + connected components — the same operators
  the batch :func:`semantic_dedup_bulk` composes).
- Survivors append to the corpus AND the index, so the next batch sees
  them.  Replays of a committed batch reject themselves: each replayed
  vector finds its own index row at cosine 1.0 — except ZERO vectors,
  whose cosine to anything (including themselves) is 0; an exact
  array-equality clause covers them, playing the role the content digest
  plays in the text gate.

Crash-window contract (same as the text gate, :mod:`streaming.ingest`):
``_process`` appends to the corpus BEFORE the index.  A crash between
the two writes leaves corpus rows with no index rows; the replayed batch
then re-admits those vectors (nothing in the index matches them) and the
corpus holds duplicates until a batch ``semantic_dedup`` compaction.
The window is accepted on PLAIN-PARQUET storage — ordering the writes
the other way would instead DROP data on replay (index rows reject the
re-run before its corpus write), and at-least-once + downstream dedup
is this engine's standing contract (SET3).  With ``storage="txn"``
(:mod:`outpost_spark.logstore.txntable`) the window is CLOSED: each
table's append carries a per-batch writer transaction, so the replayed
batch re-derives the same admitted set against the unchanged index,
no-ops the already-committed corpus append, and completes the index
append — pinned by a crash-replay pytest.

Recall contract: a near-dup is missed only when neither member's
``nprobe`` probe set covers the other's assignment list — the measured
IVF dial (BENCH_SCALE: nprobe 2/4 -> 99.2/99.98 % planted removal at
1M vectors).  Centroids are fixed at index creation; the meta file pins
their digest so a stream with different centroids (whose list ids would
never collide correctly) is rejected loudly.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import connected_components
from outpost_spark.ops.similarity import (
    _bulk_scored_pairs,
    cosine_expr,
    ivf_assign_bulk,
)

INDEX_PARTITIONS = 64
INDEX_FORMAT = 1


class EmbedDedupIndex:
    """Parquet-backed IVF dedup index for embedding columns."""

    def __init__(
        self,
        path: str,
        centroids,
        *,
        threshold: float = 0.95,
        nprobe: int = 2,
        score_decimals: int = 6,
        storage: str = "parquet",
    ):
        if storage not in ("parquet", "txn"):
            raise ValueError(f"storage must be 'parquet' or 'txn', got {storage!r}")
        self.path = path
        self.centroids = [[float(x) for x in c] for c in centroids]
        self.threshold = threshold
        self.nprobe = nprobe
        self.score_decimals = score_decimals
        self.storage = storage

    def _txn(self, spark: SparkSession, schema=None):
        from outpost_spark.logstore.txntable import TxnTable

        if schema is not None:
            return TxnTable.get_or_create(spark, self.path, schema)
        return TxnTable(spark, self.path)

    def _assigned(self, vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        return ivf_assign_bulk(
            vecs,
            vec_col,
            self.centroids,
            id_col=id_col,
            nprobe=self.nprobe,
            score_decimals=self.score_decimals,
        )

    def _rows(self, vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """Index rows: (pfx, cid, vec_id, __v) — assignment list only."""
        return self._assigned(vecs, id_col, vec_col).select(
            F.pmod(F.col("__cids")[0], F.lit(INDEX_PARTITIONS)).alias("pfx"),
            F.col("__cids")[0].alias("cid"),
            F.col(id_col).alias("vec_id"),
            "__v",
        )

    def _meta(self) -> dict:
        digest = hashlib.md5(
            json.dumps(self.centroids).encode()
        ).hexdigest()
        return {
            "format": INDEX_FORMAT,
            "centroids_md5": digest,
            "n_centroids": len(self.centroids),
            "dim": len(self.centroids[0]) if self.centroids else 0,
            "threshold": self.threshold,
            "nprobe": self.nprobe,
            "score_decimals": self.score_decimals,
            "storage": self.storage,
        }

    def _meta_fs(self, spark: SparkSession):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/_meta.json")
        return p, p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    def _write_meta(self, spark: SparkSession) -> None:
        p, fs = self._meta_fs(spark)
        out = fs.create(p, True)
        try:
            out.write(bytearray(json.dumps(self._meta()).encode()))
        finally:
            out.close()

    def _check_meta(self, spark: SparkSession) -> None:
        """Refuse an index built with different centroids/parameters —
        its list ids would never collide correctly with this object's,
        silently voiding the dedup guarantee."""
        p, fs = self._meta_fs(spark)
        if not fs.exists(p):
            raise ValueError(
                f"embed dedup index at {self.path} has no _meta.json — "
                "rebuild it with build()"
            )
        stream = fs.open(p)
        try:
            ba = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        on_disk = json.loads(bytes(ba).decode())
        if on_disk != self._meta():
            raise ValueError(
                f"embed dedup index mismatch at {self.path}: on disk "
                f"{on_disk}, this object {self._meta()} — rebuild the "
                "index (or construct EmbedDedupIndex with the stored "
                "centroids/parameters)"
            )

    def exists(self, spark: SparkSession | None = None) -> bool:
        spark = spark or SparkSession.getActiveSession()
        if self.storage == "txn":
            from outpost_spark.logstore.txntable import TxnTable

            return TxnTable.is_txn_table(self.path) and bool(
                self._txn(spark).files()
            )
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def build(self, vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        rows = self._rows(vecs, id_col, vec_col)
        if self.storage == "txn":
            t = self._txn(vecs.sparkSession, rows.schema)
            # atomic rebuild: new files + removal of every live file in
            # ONE commit — readers see the old or the new index, never a mix
            adds = t._stage(rows, "pfx", ("pfx",))
            t._commit_with_retry(
                {
                    "op": "rebuild",
                    "adds": adds,
                    "removes": [e.path for e in t.files()],
                }
            )
        else:
            rows.write.mode("overwrite").partitionBy("pfx").parquet(self.path)
        self._write_meta(vecs.sparkSession)

    def append(
        self,
        vecs: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        app_txn: tuple[str, int] | None = None,
    ) -> None:
        """``app_txn`` (txn storage only) makes the append idempotent per
        writer transaction — the streaming gate's replay protection."""
        spark = vecs.sparkSession
        fresh = not self.exists(spark)
        if not fresh:
            self._check_meta(spark)
        rows = self._rows(vecs, id_col, vec_col)
        if self.storage == "txn":
            self._txn(spark, rows.schema).append(
                rows, cluster_by="pfx", app_txn=app_txn
            )
        else:
            rows.write.mode("append").partitionBy("pfx").parquet(self.path)
        if fresh:
            self._write_meta(spark)

    def gate(
        self, batch: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> tuple[DataFrame, DataFrame]:
        """Split a batch into (admitted, rejected_matches).

        ``admitted``: batch rows that are neither semantic near-dups of
        indexed vectors nor redundant within the batch (intra-batch
        clusters keep their min-id member).  ``rejected_matches``:
        (vec_id, matched_id, cosine) evidence rows — ``matched_id`` is
        an indexed vector for index hits, the kept batch-mate (cosine
        null) for intra-batch collapses.

        ONE assignment pass per batch: the same checkpointed assigned
        frame drives the intra-batch scorer and the index probe.  A
        duplicate verdict is ``cosine >= threshold OR exact vector
        equality`` — the equality clause is what rejects replayed ZERO
        vectors, whose cosine to their own index row is 0.
        """
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)
        assigned = self._assigned(batch, id_col, vec_col).localCheckpoint(eager=True)

        pairs = (
            _bulk_scored_pairs(
                assigned,
                id_col=id_col,
                threshold=self.threshold,
                score_decimals=self.score_decimals,
            )
            .select(
                F.least("__sid", "__tid").alias("id_a"),
                F.greatest("__sid", "__tid").alias("id_b"),
            )
            .distinct()
        )
        # exact-equality intra-batch pairs (zero vectors) — cosine misses them
        eq = (
            assigned.alias("l")
            .join(
                assigned.alias("r"),
                (F.col("l.__cids")[0] == F.col("r.__cids")[0])
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
                & (F.col("l.__v") == F.col("r.__v")),
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
            )
        )
        comp = connected_components(pairs.unionByName(eq).distinct())
        intra_losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col), F.col("component").alias("matched_id")
        )
        batch1 = batch.join(
            intra_losers.select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)

        if not self.exists(spark):
            admitted = batch1
            index_hits = None
        else:
            self._check_meta(spark)
            probes = (
                assigned.join(
                    batch1.select(F.col(id_col)), id_col, "left_semi"
                )
                .select(
                    F.col(id_col),
                    F.col("__v").alias("__bv"),
                    F.explode("__cids").alias("cid"),
                )
                .localCheckpoint(eager=True)
            )
            pfxs = [
                r["pfx"]
                for r in probes.select(
                    F.pmod(F.col("cid"), F.lit(INDEX_PARTITIONS)).alias("pfx")
                )
                .distinct()
                .collect()
            ]
            if self.storage == "txn":
                # file pruning from the commit log's pfx stats (files are
                # pfx-pure via cluster_by) — the txn twin of partition
                # pruning; the exact filter still applies on top
                index = self._txn(spark).read(
                    stats_isin={"pfx": pfxs}
                ).filter(F.col("pfx").isin(pfxs))
            else:
                index = spark.read.parquet(self.path).filter(F.col("pfx").isin(pfxs))
            # self-matches deliberately kept: they reject replayed batches
            cos = F.round(
                cosine_expr(F.col("__bv"), F.col("__v")), self.score_decimals
            )
            hits = (
                probes.join(index, "cid")
                .withColumn(
                    "cosine",
                    F.when(F.col("__bv") == F.col("__v"), F.lit(1.0)).otherwise(cos),
                )
                .filter(F.col("cosine") >= self.threshold)
                .select(
                    probes[id_col].alias(id_col),
                    index["vec_id"].alias("matched_id"),
                    "cosine",
                )
                .groupBy(id_col)
                .agg(
                    F.min_by(
                        F.struct("matched_id", "cosine"),
                        F.struct(
                            (-F.col("cosine")).alias("nc"),
                            F.col("matched_id").alias("mid"),
                        ),
                    ).alias("m")
                )
                .select(id_col, F.col("m.matched_id"), F.col("m.cosine"))
                .localCheckpoint(eager=True)
            )
            admitted = batch1.join(hits.select(id_col), id_col, "left_anti")
            index_hits = hits

        rejected = intra_losers.withColumn("cosine", F.lit(None).cast("double"))
        if index_hits is not None:
            rejected = rejected.unionByName(index_hits)
        return admitted, rejected


def attach_embed_ingest_stream(
    vecs_stream: DataFrame,
    index: EmbedDedupIndex,
    corpus_path: str,
    checkpoint_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rejects_path: str | None = None,
):
    """Wire the gate into foreachBatch: admitted vectors append to the
    corpus and to the index; rejected evidence optionally lands in an
    audit table.  Returns the DataStreamWriter (caller starts it).

    With a ``storage="txn"`` index, every write carries a per-table
    writer transaction (appId, batch_id) — logstore/txntable.py's Delta
    txnAppId/txnVersion analog — which CLOSES the corpus-append /
    index-append crash window documented in the module docstring: a
    crash between the two appends replays the batch, the gate
    re-derives the SAME admitted set (the index state is unchanged —
    its append never committed), the corpus append no-ops on its
    recorded transaction, and the index append commits.  The corpus
    never holds duplicates."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        admitted, rejected = index.gate(batch, id_col=id_col, vec_col=vec_col)
        admitted = admitted.localCheckpoint(eager=True)
        if index.storage == "txn":
            from outpost_spark.logstore.txntable import TxnTable

            spark = batch.sparkSession
            TxnTable.get_or_create(spark, corpus_path, admitted.schema).append(
                admitted, app_txn=("embedgate::corpus", batch_id)
            )
            index.append(
                admitted,
                id_col=id_col,
                vec_col=vec_col,
                app_txn=("embedgate::index", batch_id),
            )
            if rejects_path is not None:
                TxnTable.get_or_create(spark, rejects_path, rejected.schema).append(
                    rejected, app_txn=("embedgate::rejects", batch_id)
                )
            return
        admitted.write.mode("append").parquet(corpus_path)
        index.append(admitted, id_col=id_col, vec_col=vec_col)
        if rejects_path is not None:
            rejected.write.mode("append").parquet(rejects_path)

    return vecs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
