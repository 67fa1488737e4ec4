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
  re-admits nothing (the gate itself rejects the replays).  A crash in
  the window between the corpus append and the index append can duplicate
  that one batch — the same eventual-dedup contract as the log sink,
  hidden by read-side exact dedup.

Scale notes: the per-batch index read is proportional to the batch's
bucket fan-out, not the corpus; the join shuffles (bucket, id) pairs and
broadcast-sized gram arrays for candidates only.  The index is append-only
parquet — compaction piggybacks on the retention machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import (
    band_keys_expr,
    connected_components,
    lsh_candidate_pairs,
    jaccard_expr,
    minhash_signature,
    ngram_set,
)

INDEX_PARTITIONS = 64


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
    """(bucket, pfx, id, grams) rows for every document x band."""
    sigs = minhash_signature(
        docs.select(id_col, text_col),
        text_col,
        num_hashes=num_hashes,
        shingle_len=shingle_len,
        hash_fn=hash_fn,
    )
    band_keys = band_keys_expr(F.col("minhash"), bands, rows_per_band)
    gram_arr = ngram_set(F.col(text_col), verify_ngram)
    if hash_fn == "xxhash64":
        gram_arr = F.transform(gram_arr, lambda g: F.xxhash64(g))
        grams = gram_arr.cast("array<long>")
    else:
        grams = gram_arr
    return (
        sigs.withColumn("bucket", F.explode(band_keys))
        .select(
            "bucket",
            F.pmod(F.xxhash64(F.col("bucket")), F.lit(INDEX_PARTITIONS)).alias("pfx"),
            F.col(id_col).alias("doc_id"),
            grams.alias("grams"),
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
    ):
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.shingle_len = shingle_len
        self.verify_ngram = verify_ngram
        self.threshold = threshold
        self.hash_fn = hash_fn

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

    def build(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        """Bootstrap the index from an existing corpus (overwrite)."""
        self._rows(docs, id_col, text_col).write.mode("overwrite").partitionBy(
            "pfx"
        ).parquet(self.path)

    def append(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        self._rows(docs, id_col, text_col).write.mode("append").partitionBy(
            "pfx"
        ).parquet(self.path)

    def exists(self) -> bool:
        return os.path.exists(self.path)

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
        """
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)  # stream batches re-plan per action

        # intra-batch collapse first: min-id survivor per near-dup component
        sigs = minhash_signature(
            batch.select(id_col, text_col),
            text_col,
            num_hashes=self.num_hashes,
            shingle_len=self.shingle_len,
            hash_fn=self.hash_fn,
        )
        cands = lsh_candidate_pairs(
            sigs, id_col, bands=self.bands, rows_per_band=self.rows_per_band
        )
        gram_arr = ngram_set(F.col(text_col), self.verify_ngram)
        if self.hash_fn == "xxhash64":
            gram_arr = F.transform(gram_arr, lambda g: F.xxhash64(g))
        grams = batch.select(F.col(id_col).alias("__gid"), gram_arr.alias("__grams"))
        pairs = (
            cands.join(
                grams.withColumnRenamed("__gid", "id_a").withColumnRenamed("__grams", "__ga"),
                "id_a",
            )
            .join(
                grams.withColumnRenamed("__gid", "id_b").withColumnRenamed("__grams", "__gb"),
                "id_b",
            )
            .withColumn("jaccard", F.round(jaccard_expr(F.col("__ga"), F.col("__gb")), 6))
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b")
        )
        comp = connected_components(pairs)
        intra_losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col), F.col("component").alias("matched_id")
        )
        batch1 = batch.join(
            intra_losers.select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)

        if not self.exists():
            admitted = batch1
            index_hits = None
        else:
            # index probe: read ONLY the partitions this batch's buckets touch
            brows = self._rows(batch1, id_col, text_col).localCheckpoint(eager=True)
            pfxs = [r["pfx"] for r in brows.select("pfx").distinct().collect()]
            index = spark.read.parquet(self.path).filter(F.col("pfx").isin(pfxs))
            # NOTE: self-matches (same doc_id already in the index) are NOT
            # filtered out — they are precisely what rejects a replayed
            # batch after a crash between the offset commit and here: the
            # replayed doc finds its own index row at J=1.0 and is dropped.
            hits = (
                brows.alias("b")
                .join(index.alias("i"), "bucket")
                .withColumn(
                    "jaccard",
                    F.round(jaccard_expr(F.col("b.grams"), F.col("i.grams")), 6),
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
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        admitted, rejected = index.gate(batch, id_col=id_col, text_col=text_col)
        admitted = admitted.localCheckpoint(eager=True)
        admitted.write.mode("append").parquet(corpus_path)
        index.append(admitted, id_col=id_col, text_col=text_col)
        if rejects_path is not None:
            rejected.write.mode("append").parquet(rejects_path)

    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
