"""Incremental corpus ingestion with near-duplicate gating.

A 100 TB training corpus is not deduplicated in one batch job — documents
arrive continuously, and each increment must be checked against the
already-ingested corpus without rescanning it.  The pattern here:

- The corpus maintains a **dedup index**: one row per (LSH band bucket,
  doc) plus the doc's verification grams, written as parquet partitioned
  by a bounded hash of the bucket key (``pmod(xxhash64(bucket), N)``).
- Each micro-batch computes the same signatures for its documents, joins
  its band buckets against the index — **reading only the index
  partitions its buckets land in** (the batch's touched-partition set is
  collected first; it is bounded by N) — verifies candidates with exact
  Jaccard, and drops near-duplicates of already-ingested documents.
- Batch-internal duplicates are collapsed with the standard batch
  operator first (:func:`outpost_spark.ops.dedup.minhash_dedup_pairs` +
  components), so a batch containing five copies admits exactly one.
- Survivors are appended to the corpus AND their bucket rows to the
  index, so the next batch sees them.  foreachBatch + checkpoint gives
  at-least-once; once a batch's index append has committed, replaying it
  re-admits nothing (the gate itself rejects the replays — a content
  digest carried in the index short-circuits even documents too short to
  shingle, whose empty gram sets would otherwise self-match at J=0.0).
  A crash in the window between the corpus append and the index append
  can duplicate that one batch — the same eventual-dedup contract as the
  log sink, hidden by read-side exact dedup.  With ``storage="txn"``
  (r06) that window is CLOSED: both appends carry per-table writer
  transactions (logstore/txntable.py), so the replayed batch no-ops the
  committed corpus append and completes the index append — see
  :mod:`outpost_spark.streaming.embed_ingest` for the replay argument.

Scale notes: the per-batch index read is proportional to the batch's
bucket fan-out, not the corpus; the join shuffles (bucket, id) pairs and
broadcast-sized gram arrays for candidates only.  The index is append-only
parquet; :meth:`DedupIndex.compact` bounds the per-partition file count
with the same crash-safe staging the retention machinery uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import (
    _hash_expr_wide,
    _narrow_from_wide,
    band_keys_expr,
    connected_components,
    jaccard_expr,
    minhash_signature,
    ngram_set,
    shingle_seq,
    signature_from_basehash,
    wide_gram_hashes,
)
# (lsh_candidate_pairs is intentionally not used here: the gate derives
# intra-batch candidates from the same checkpointed bucket rows that feed
# the index probe, so the signature pipeline runs once per batch)

INDEX_PARTITIONS = 64

# On-disk index format. 3 = WIDE gram hashes (60-bit md5 / 64-bit
# xxhash64, _hash_expr_wide) so the gate's verify Jaccard matches the
# batch dedup family's collision-free unit (32-bit grams birthday-collide
# near 10^5 shingles, inflating near-threshold similarities); the minhash
# base derives from the wide value by projection, so buckets are
# unchanged vs format 2 — but gram arrays are not comparable across
# formats. Bump whenever the row schema or any hash formula changes:
# mixing formats would SILENTLY admit duplicates — the meta check below
# turns that into an explicit rebuild-required error.
INDEX_FORMAT = 3


def _bucketed_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    shingle_len: int,
    verify_ngram: int,
    hash_fn: str,
) -> DataFrame:
    """(bucket, pfx, id, grams, digest) rows for every document x band.

    Grams are stored hashed (long arrays) — they never leave Spark, and
    long intersects are far cheaper than string intersects at verify
    time.  When ``verify_ngram == shingle_len`` (the default) the hashed
    shingles double as both the signature input and the verify grams, so
    the per-shingle hash pass runs once (same fusion as
    ``ops.dedup.minhash_dedup_pairs``).  ``digest`` is a full-content
    hash: equality is an unconditional duplicate verdict, which is what
    rejects replayed or repeated documents too short to produce grams.
    """
    base = docs.select(id_col, text_col)
    digest = F.xxhash64(F.col(text_col)).alias("digest")
    if verify_ngram == shingle_len:
        hashed = base.select(
            F.col(id_col),
            wide_gram_hashes(F.col(text_col), shingle_len, hash_fn).alias("__grams"),
            digest,
        )
        sigs = hashed.withColumn(
            "minhash",
            signature_from_basehash(
                F.transform(
                    F.col("__grams"), lambda g: _narrow_from_wide(g, hash_fn)
                ),
                num_hashes,
            ),
        )
    else:
        sigs = minhash_signature(
            base, text_col, num_hashes=num_hashes, shingle_len=shingle_len, hash_fn=hash_fn
        ).select(
            F.col(id_col),
            F.array_distinct(
                F.transform(
                    ngram_set(F.col(text_col), verify_ngram),
                    lambda g: _hash_expr_wide(g, "h", hash_fn),
                )
            ).alias("__grams"),
            digest,
            F.col("minhash"),
        )
    band_keys = band_keys_expr(F.col("minhash"), bands, rows_per_band)
    return (
        sigs.withColumn("bucket", F.explode(band_keys))
        .select(
            "bucket",
            F.pmod(F.xxhash64(F.col("bucket")), F.lit(INDEX_PARTITIONS)).alias("pfx"),
            F.col(id_col).alias("doc_id"),
            F.col("__grams").alias("grams"),
            "digest",
        )
    )


class DedupIndex:
    """Parquet-backed LSH dedup index, partitioned by a bounded bucket hash.

    The LSH parameters are fixed at index creation — stream batches must
    compute signatures with the identical parameters or buckets will never
    collide, so they are carried on the index object, not per call.
    """

    def __init__(
        self,
        path: str,
        *,
        num_hashes: int = 16,
        bands: int = 4,
        rows_per_band: int = 4,
        shingle_len: int = 5,
        verify_ngram: int = 5,
        threshold: float = 0.7,
        hash_fn: str = "xxhash64",
        storage: str = "parquet",
    ):
        if storage not in ("parquet", "txn"):
            raise ValueError(f"storage must be 'parquet' or 'txn', got {storage!r}")
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.shingle_len = shingle_len
        self.verify_ngram = verify_ngram
        self.threshold = threshold
        self.hash_fn = hash_fn
        self.storage = storage

    def _txn(self, spark: SparkSession, schema=None):
        from outpost_spark.logstore.txntable import TxnTable

        if schema is not None:
            return TxnTable.get_or_create(spark, self.path, schema)
        return TxnTable(spark, self.path)

    def _rows(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return _bucketed_rows(
            docs,
            id_col,
            text_col,
            num_hashes=self.num_hashes,
            bands=self.bands,
            rows_per_band=self.rows_per_band,
            shingle_len=self.shingle_len,
            verify_ngram=self.verify_ngram,
            hash_fn=self.hash_fn,
        )

    def _meta(self) -> dict:
        return {
            "format": INDEX_FORMAT,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "rows_per_band": self.rows_per_band,
            "shingle_len": self.shingle_len,
            "verify_ngram": self.verify_ngram,
            "hash_fn": self.hash_fn,
            "storage": self.storage,
        }

    def _meta_fs(self, spark: SparkSession):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/_meta.json")
        return p, p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    def _write_meta(self, spark: SparkSession) -> None:
        import json as _json

        p, fs = self._meta_fs(spark)
        out = fs.create(p, True)
        try:
            out.write(bytearray(_json.dumps(self._meta()).encode()))
        finally:
            out.close()

    def _check_meta(self, spark: SparkSession) -> None:
        """Refuse to touch an index whose on-disk format/parameters differ.

        Bucket keys and gram hashes from a different format or LSH
        parameterization never collide correctly against this object's,
        so proceeding would silently void the dedup guarantee (replays
        and near-dups of the old corpus re-admitted).  An explicit error
        demanding a rebuild is the only safe behavior.
        """
        import json as _json

        p, fs = self._meta_fs(spark)
        if not fs.exists(p):
            raise ValueError(
                f"dedup index at {self.path} has no _meta.json (pre-versioning "
                "or partially-written index) — rebuild it with build()"
            )
        stream = fs.open(p)
        try:
            ba = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        on_disk = _json.loads(bytes(ba).decode())
        if on_disk != self._meta():
            raise ValueError(
                f"dedup index format/parameter mismatch at {self.path}: "
                f"on disk {on_disk}, this object {self._meta()} — rebuild "
                "the index (or construct DedupIndex with the stored parameters)"
            )

    def build(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        """Bootstrap the index from an existing corpus (overwrite — on
        txn storage an atomic rebuild commit)."""
        rows = self._rows(docs, id_col, text_col)
        if self.storage == "txn":
            t = self._txn(docs.sparkSession, rows.schema)
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
        self._write_meta(docs.sparkSession)

    def append(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        app_txn: tuple[str, int] | None = None,
    ) -> None:
        """``app_txn`` (txn storage only) makes the append idempotent per
        writer transaction — the streaming gate's replay protection."""
        spark = docs.sparkSession
        fresh = not self.exists(spark)
        if not fresh:
            self._check_meta(spark)
        rows = self._rows(docs, id_col, text_col)
        if self.storage == "txn":
            self._txn(spark, rows.schema).append(
                rows, cluster_by="pfx", app_txn=app_txn
            )
        else:
            rows.write.mode("append").partitionBy("pfx").parquet(self.path)
        if fresh:
            # meta lands AFTER the first data write: a crash in between
            # leaves data-without-meta, which _check_meta rejects loudly
            self._write_meta(spark)

    def exists(self, spark: SparkSession | None = None) -> bool:
        """True once the index has been created.

        Uses the Hadoop FileSystem API when a session is available so the
        check works for any warehouse scheme (hdfs://, s3a://, ...);
        plain ``os.path`` only as a session-less local fallback.
        """
        spark = spark or SparkSession.getActiveSession()
        if self.storage == "txn":
            from outpost_spark.logstore.txntable import TxnTable

            return TxnTable.is_txn_table(self.path) and bool(
                self._txn(spark).files()
            )
        if spark is None:
            return os.path.exists(self.path)
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs.exists(jpath)

    def compact(self, spark: SparkSession, *, target_files: int = 1) -> dict[str, int]:
        """Rewrite index partitions down to ``target_files`` files each.

        Append-only micro-batch writes accumulate one file per batch per
        task; without maintenance a long-running ingest degrades every
        probe.  Reuses the retention machinery's crash-safe staging
        (``_tmp_*`` write -> ``_trash_*`` swap, recovered on next run), so
        a crash mid-compaction never loses or double-exposes index rows.
        Gate results are unchanged — compaction only rewrites files.
        Directory manipulation goes through the Hadoop FileSystem API
        (outpost_spark.fsutil) like ``exists()``, so maintenance works on
        hdfs://, s3a://, file://, ... — see fsutil's rename-atomicity
        note for object stores (reference analog:
        internal/logretention/ttl.go:27-68).

        Returns {partition: input_file_count} for the rewritten partitions.
        """
        from outpost_spark.fsutil import maintenance_fs
        from outpost_spark.logstore.retention import _recover_partials, _swap_partition

        if self.storage == "txn":
            # per-pfx atomic compaction commits; pfx purity preserved so
            # the commit-log stats pruning stays exact
            t = self._txn(spark)
            report = {}
            pfxs = sorted(
                {
                    e.stats["pfx"][0]
                    for e in t.files()
                    if "pfx" in e.stats and e.stats["pfx"][0] == e.stats["pfx"][1]
                }
            )
            for p in pfxs:
                n = t.compact(
                    target_files=target_files,
                    stats_filter={"pfx": (p, p)},
                    stats_cols=("pfx",),
                )
                if n:
                    report[f"pfx={p}"] = n
            return report

        _recover_partials(self.path, spark)
        fs = maintenance_fs(self.path, spark)
        report: dict[str, int] = {}
        for part in fs.listdir():
            if not part.startswith("pfx="):
                continue
            n_files = sum(
                1
                for f in fs.list_files(part)
                if f.endswith(".parquet") and not f.startswith("_")
            )
            if n_files <= target_files:
                continue
            df = spark.read.parquet(fs.path_str(part))
            tmp = fs.path_str(f"_tmp_compact_{part}")
            df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
            _swap_partition(self.path, part, tmp, spark)
            report[part] = n_files
        return report

    def gate(
        self, batch: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> tuple[DataFrame, DataFrame]:
        """Split a batch into (admitted, rejected_matches).

        ``admitted``: batch rows that are neither near-dups of indexed
        documents nor redundant within the batch (batch-internal clusters
        keep their min-id member — matching the batch operators).
        ``rejected_matches``: (doc_id, matched_id, jaccard) evidence rows;
        ``matched_id`` is an indexed doc for index hits, or the kept
        batch-mate for intra-batch collapses (jaccard null there).

        One signature pass per batch: the same checkpointed bucket rows
        drive the intra-batch self-join AND the index probe.  Duplicate
        verdicts are ``jaccard >= threshold OR digest equality`` — the
        digest clause is what catches exact copies too short to shingle
        (empty gram sets verify at J=0.0), including replays of a
        committed batch after a crash.
        """
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)  # stream batches re-plan per action
        brows = self._rows(batch, id_col, text_col).localCheckpoint(eager=True)

        # intra-batch collapse first: min-id survivor per near-dup component
        left, right = brows.alias("l"), brows.alias("r")
        pairs = (
            left.join(
                right,
                (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .filter(
                (
                    F.round(jaccard_expr(F.col("l.grams"), F.col("r.grams")), 6)
                    >= self.threshold
                )
                | (F.col("l.digest") == F.col("r.digest"))
            )
            .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
            .distinct()
        )
        comp = connected_components(pairs)
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
            # index probe: read ONLY the partitions this batch's buckets
            # touch, reusing the checkpointed bucket rows (restricted to
            # intra-batch survivors — a semi-join, no signature recompute)
            brows1 = brows.join(
                batch1.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
            )
            pfxs = [r["pfx"] for r in brows1.select("pfx").distinct().collect()]
            if self.storage == "txn":
                # file pruning from the commit log's pfx stats (files are
                # pfx-pure via cluster_by); exact filter still applies
                index = self._txn(spark).read(
                    stats_isin={"pfx": pfxs}
                ).filter(F.col("pfx").isin(pfxs))
            else:
                index = spark.read.parquet(self.path).filter(
                    F.col("pfx").isin(pfxs)
                )
            # NOTE: self-matches (same doc_id already in the index) are NOT
            # filtered out — they are precisely what rejects a replayed
            # batch after a crash between the offset commit and here: the
            # replayed doc finds its own index row at J=1.0 (or by digest
            # for un-shingleable docs) and is dropped.
            hits = (
                brows1.alias("b")
                .join(index.alias("i"), "bucket")
                .withColumn(
                    "jaccard",
                    F.when(F.col("b.digest") == F.col("i.digest"), F.lit(1.0)).otherwise(
                        F.round(jaccard_expr(F.col("b.grams"), F.col("i.grams")), 6)
                    ),
                )
                .filter(F.col("jaccard") >= self.threshold)
                .select(
                    F.col("b.doc_id").alias(id_col),
                    F.col("i.doc_id").alias("matched_id"),
                    "jaccard",
                )
                # one evidence row per batch doc: strongest match, ties ->
                # lowest id (min_by on (-jaccard, id) stays valid for
                # string ids, where negating the id would not)
                .groupBy(id_col)
                .agg(
                    F.min_by(
                        F.struct("matched_id", "jaccard"),
                        F.struct((-F.col("jaccard")).alias("nj"), F.col("matched_id").alias("mid")),
                    ).alias("m")
                )
                .select(id_col, F.col("m.matched_id"), F.col("m.jaccard"))
                .localCheckpoint(eager=True)
            )
            admitted = batch1.join(hits.select(id_col), id_col, "left_anti")
            index_hits = hits

        rejected = intra_losers.withColumn("jaccard", F.lit(None).cast("double"))
        if index_hits is not None:
            rejected = rejected.unionByName(index_hits)
        return admitted, rejected


def attach_ingest_stream(
    docs_stream: DataFrame,
    index: DedupIndex,
    corpus_path: str,
    checkpoint_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rejects_path: str | None = None,
):
    """Wire the gate into foreachBatch: admitted docs append to the corpus
    and to the index; rejected evidence optionally lands in an audit table.

    Returns the DataStreamWriter (caller starts/awaits it — tests use
    ``trigger(availableNow=True)``).

    With a ``storage="txn"`` index, every write carries a per-table
    writer transaction (appId, batch_id), closing the corpus/index
    crash window exactly as the embedding twin does
    (:mod:`outpost_spark.streaming.embed_ingest` — see its docstring
    for the replay argument)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        admitted, rejected = index.gate(batch, id_col=id_col, text_col=text_col)
        admitted = admitted.localCheckpoint(eager=True)
        if index.storage == "txn":
            from outpost_spark.logstore.txntable import TxnTable

            spark = batch.sparkSession
            TxnTable.get_or_create(spark, corpus_path, admitted.schema).append(
                admitted, app_txn=("textgate::corpus", batch_id)
            )
            index.append(
                admitted,
                id_col=id_col,
                text_col=text_col,
                app_txn=("textgate::index", batch_id),
            )
            if rejects_path is not None:
                TxnTable.get_or_create(spark, rejects_path, rejected.schema).append(
                    rejected, app_txn=("textgate::rejects", batch_id)
                )
            return
        admitted.write.mode("append").parquet(corpus_path)
        index.append(admitted, id_col=id_col, text_col=text_col)
        if rejects_path is not None:
            rejected.write.mode("append").parquet(rejects_path)

    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
