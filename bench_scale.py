"""Self-relative large-scale benchmark: 10M events / ~12.6M attempts.

Reproduces the reference's metrics bench corpus (cmd/bench/metrics/README.md
"Data Distribution", deterministic modulo arithmetic):

- 2 tenants: tenant_0 (90%) / tenant_1 (10%)
- 500 destinations, 3 topics
- events spread evenly across January 2000
- chained retries: 1 event -> 1-4 attempts (~1.26 avg), 0.5% permanently failed

and runs the attempt-metrics query shapes from cmd/bench/metrics/bench_test.go
through ``query_attempt_metrics`` on the month-partitioned parquet table.

Usage:
    python bench_scale.py [--events 10000000] [--out BENCH_SCALE_r02.json]

The generated table is cached at $SPARK_GRAFT_SCALE_DIR (default
/tmp/outpost_scale_bench) keyed by the event count; delete the dir to force
regeneration.  Prints ONE JSON line; with --out also writes it to a file so
rounds can commit the measurement as an artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from outpost_spark.logstore.insert import with_month_partition  # noqa: E402
from outpost_spark.logstore.metrics import (  # noqa: E402
    MetricsRequest,
    TimeRange,
    query_attempt_metrics,
)
from outpost_spark.session import get_spark  # noqa: E402

JAN = datetime(2000, 1, 1, tzinfo=timezone.utc)
FEB = datetime(2000, 2, 1, tzinfo=timezone.utc)
TOPICS = ["order.created", "order.updated", "payment.received"]


def generate(spark, path: str, n_events: int) -> None:
    """Deterministic corpus, pure-Column generation — no driver-side rows.

    Chain length by event id % 100: 84% x1, 9% x2, 4% x3, 3% x4 (~1.26
    attempts/event, the reference's ~12.6M for 10M events).  Permanent
    failure when id % 200 == 0 (0.5%): every attempt in the chain fails;
    otherwise attempts 1..n-1 fail and the final succeeds.
    """
    span_us = int((FEB - JAN).total_seconds() * 1_000_000)
    ev = (
        spark.range(n_events)
        .withColumn(
            "tenant_id",
            F.when(F.col("id") % 10 < 9, F.lit("tenant_0")).otherwise(F.lit("tenant_1")),
        )
        .withColumn("destination_id", F.concat(F.lit("dest_"), F.col("id") % 500))
        .withColumn(
            "topic", F.element_at(F.array(*[F.lit(t) for t in TOPICS]), (F.col("id") % 3 + 1).cast("int"))
        )
        .withColumn(
            "event_time",
            F.timestamp_micros(
                (
                    F.lit(int(JAN.timestamp() * 1_000_000))
                    + (F.col("id") * F.lit(float(span_us) / n_events)).cast("long")
                ).cast("long")
            ),
        )
        .withColumn(
            "n_attempts",
            F.when(F.col("id") % 100 < 84, 1)
            .when(F.col("id") % 100 < 93, 2)
            .when(F.col("id") % 100 < 97, 3)
            .otherwise(4),
        )
        .withColumn("permanent_fail", F.col("id") % 200 == 0)
    )
    att = (
        ev.withColumn("attempt_number", F.explode(F.sequence(F.lit(1), F.col("n_attempts"))))
        .withColumn(
            "status",
            F.when(
                F.col("permanent_fail") | (F.col("attempt_number") < F.col("n_attempts")),
                F.lit("failed"),
            ).otherwise(F.lit("success")),
        )
        .withColumn("code", F.when(F.col("status") == "success", "200").otherwise("500"))
        .withColumn("manual", (F.col("attempt_number") > 1) & (F.col("id") % 97 == 0))
        .withColumn(
            "attempt_time",
            F.col("event_time") + F.make_interval(secs=(F.col("attempt_number") - 1) * 30),
        )
        .withColumn("event_id", F.concat(F.lit("evt_"), F.col("id")))
        .withColumn(
            "attempt_id", F.concat(F.lit("att_"), F.col("id"), F.lit("_"), F.col("attempt_number"))
        )
        .withColumn("destination_type", F.lit("webhook"))
        .select(
            "attempt_id", "event_id", "tenant_id", "destination_id", "destination_type",
            "topic", "status", "code", "manual", "attempt_number", "attempt_time",
        )
    )
    with_month_partition(att, "attempt_time").write.mode("overwrite").partitionBy(
        "month"
    ).parquet(path)


def bench_requests() -> dict[str, MetricsRequest]:
    """Attempt-metrics cases from cmd/bench/metrics/bench_test.go:196-280."""
    month = TimeRange(JAN, FEB)
    day = TimeRange(datetime(2000, 1, 15, tzinfo=timezone.utc), datetime(2000, 1, 16, tzinfo=timezone.utc))
    week = TimeRange(datetime(2000, 1, 10, tzinfo=timezone.utc), datetime(2000, 1, 17, tzinfo=timezone.utc))
    R = MetricsRequest
    return {
        "CountAll": R(month, ["count"]),
        "RateAll": R(month, ["rate"]),
        "SuccessfulRate": R(month, ["successful_rate"]),
        "FailedRate": R(month, ["failed_rate"]),
        "CountAndRate": R(month, ["count", "rate", "error_rate"]),
        "CountByTopic": R(month, ["count"], dimensions=["topic"]),
        "CountByDestination": R(month, ["count"], dimensions=["destination_id"]),
        "CountByTenant": R(month, ["count"], dimensions=["tenant_id"]),
        "CountByStatus": R(month, ["count"], dimensions=["status"]),
        "CountByCode": R(month, ["count"], dimensions=["code"]),
        "CountByAttemptNumber": R(month, ["count"], dimensions=["attempt_number"]),
        "Hourly_1Day": R(day, ["count"], granularity="1h"),
        "Hourly_1Week": R(week, ["count"], granularity="1h"),
        "Daily_1Month": R(month, ["count"], granularity="1d"),
        "TwoDays_1Month": R(month, ["count"], granularity="2d"),
        "Weekly_1Month": R(month, ["count"], granularity="1w"),
        "Monthly_1Month": R(month, ["count"], granularity="1M"),
        "RateHourly_1Day": R(day, ["rate", "error_rate"], granularity="1h"),
        "FilterByTopic": R(month, ["count"], filters={"topic": ["order.created"]}),
        "FilterByDestination": R(month, ["count"], filters={"destination_id": ["dest_42"]}),
        "SmallTenant": R(
            month, ["count"], granularity="1d",
            filters={"tenant_id": ["tenant_1"], "status": ["failed"]},
        ),
        # fast-path twins: exactly-once sink => distinct degenerates to count
        "CountAll_deduped": R(month, ["count"], assume_deduped=True),
        "DailyByTopic_deduped": R(
            month, ["count"], granularity="1d", dimensions=["topic"], assume_deduped=True
        ),
        # HLL twins: sketches merge in the normal partial/final agg, the id
        # exchange disappears (the 100x dashboard path)
        "CountAll_approx": R(month, ["count"], approx_distinct=True),
        "DailyByTopic_approx": R(
            month, ["count"], granularity="1d", dimensions=["topic"], approx_distinct=True
        ),
    }


def generate_documents(spark, path: str, n_docs: int) -> None:
    """Deterministic large documents corpus, pure-Column generation.

    Realistic duplication structure (a corpus where EVERYTHING repeats
    degenerates every pair op into a quadratic blowup — not the shape
    these operators run on):

    - each doc = 1 boilerplate paragraph (50 variants corpus-wide — the
      C4 shape paragraph dedup exists for) + 4 unique paragraphs of 12
      words drawn from a 2000-word vocabulary by affine mixing;
    - every 20th doc is an exact copy of its predecessor (5% planted
      dup rate for the LSH/SimHash/substring families).
    """
    base_id = F.when(F.col("id") % 20 == 1, F.col("id") - 1).otherwise(F.col("id"))

    def para(key_expr):
        # words are md5-hex of the FULL (paragraph key, word index) pair —
        # both earlier designs (small vocab, affine mixing mod 2000) let
        # the key collapse modulo the vocab size, leaving ~500 distinct
        # documents in a 50k corpus and a quadratic false-pair explosion
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda w: F.substring(
                    F.md5(F.concat_ws("_", key_expr.cast("string"), w.cast("string"))),
                    1,
                    8,
                ),
            ),
        )

    boiler = para((base_id % 50).cast("long") * 7919)
    uniques = [para(base_id * 4 + F.lit(p) + F.lit(1_000_003)) for p in range(4)]
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", boiler, *uniques).alias("text"),
    )
    docs.write.mode("overwrite").parquet(path)


def doc_cases(spark, path: str):
    """Round-3/4 document operators at scale (names -> thunks returning a
    row count; each runs the full operator plan)."""
    from outpost_spark.ops.dedup import (
        dedup_paragraphs,
        dedup_substrings,
        minhash_dedup_pairs,
        ngram_contamination,
        simhash_pairs,
    )
    from outpost_spark.ops.text import chunk_documents

    docs = spark.read.parquet(path)
    bench = docs.filter(F.col("doc_id") % 997 == 0).select("doc_id", "text")
    return {
        # 64-bit fingerprints: at 1M docs a 32-bit simhash produces ~1.3M
        # hamming<=3 birthday-collision pairs (measured); 64-bit is the
        # corpus-scale configuration (xxhash64 base, production path)
        "SimHashPairs_64": lambda: simhash_pairs(
            docs, "doc_id", "text", bits=64, max_hamming=3, bands=4, hash_fn="xxhash64"
        ).count(),
        # numpy path: Arrow-batched signatures + per-lane avalanche +
        # signature-estimate prefilter — 83 s warm at 1M docs vs 182 s
        # for the xxhash64 Column path (r04), identical planted recall
        "MinHashPairs_fast": lambda: minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.7, hash_fn="numpy"
        ).count(),
        "ParagraphDedup": lambda: dedup_paragraphs(docs, "text", "doc_id").count(),
        "SubstringDedup_s20": lambda: dedup_substrings(
            docs, "text", "doc_id", window=40, stride=20, broadcast_removed=False
        ).count(),
        "NgramContamination": lambda: ngram_contamination(
            docs, bench, n=8, hash_fn="xxhash64"
        ).count(),
        "ChunkDocuments": lambda: chunk_documents(
            docs, "text", "doc_id", max_tokens=24, overlap=6
        ).count(),
        # vectorized Misra-Gries (r06): xxhash64 tokens JVM-side, numpy
        # unique+partition fold in mapInArrow, mergeable-summaries merge
        # — 8.5-9.2x the r05 dict loop's single-thread token rate
        # (87M vs 9.5M tokens/s Zipfian), e2e 3.3 s vs 9.0 s here
        "ApproxTopTokens": lambda: _approx_top_tokens_case(docs),
        # the full training-set assembly capstone at the 1M-doc corpus
        # (VERDICT r08 stretch #10): cleaning cascade + self-trained LM
        # + split + mix + budget + shard manifests as ONE plan family
        "CurateV6_1M": lambda: _curate_v6_case(docs),
    }


def _curate_v6_case(docs) -> int:
    from outpost_spark.ops.pipeline import curate_corpus_v6

    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es")])
    d = docs.select(
        "doc_id",
        "text",
        F.element_at(langs, (F.col("doc_id") % 4 + 1).cast("int")).alias("lang"),
        F.length("text").cast("long").alias("n_chars"),
    )
    # max_ppl wide open: the synthetic md5-word corpus is all high-ppl,
    # and the bench measures the CASCADE's cost (the gate's planted
    # behavior is pytest's job); budget cut keeps ~40% of train chars
    return curate_corpus_v6(
        d, max_ppl=1e9, token_budget=200_000_000, n_shards=16
    ).count()


def _approx_top_tokens_case(docs) -> int:
    from outpost_spark.ops.text import approx_top_tokens

    rows = approx_top_tokens(docs, "text", k=20, summary_size=4096).collect()
    ns = [r["n"] for r in rows]
    assert len(rows) == 20 and ns == sorted(ns, reverse=True) and ns[0] > 0
    return len(rows)


def generate_image_corpus(spark, path: str, n_imgs: int) -> None:
    """Planted image corpus at scale: PNG noise groups, mixed PNG/JPEG
    cell groups (every third group), junk members — the same generator
    the value-oracled catalog entries use (ops/multimodal.py), written
    once so the dedup case measures DECODE+dedup, not generation."""
    from outpost_spark.ops.multimodal import planted_image_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ids = spark.range(0, n_imgs, 1, cpus * 4).select(F.col("id").alias("doc_id"))
    planted_image_corpus(ids, id_col="doc_id").write.mode("overwrite").parquet(path)


def image_dedup_case(spark, path: str) -> dict:
    """Perceptual image dedup end to end at corpus scale: real PNG +
    baseline-JPEG decode (Arrow-batched mapInPandas over the binary
    column), dHash fingerprints, pigeonhole Hamming band join, connected
    components, canonical-survivor collapse.  The decode stage is the
    Python-quarantined cost driver (the JPEG Huffman loop) — the case
    records images/s so the linear scale-out claim has a measured
    per-core rate behind it."""
    from outpost_spark.ops.multimodal import dhash_canonical_survivors

    imgs = spark.read.parquet(path)
    n = imgs.count()
    t0 = time.perf_counter()
    survivors = dhash_canonical_survivors(imgs).count()
    secs = round(time.perf_counter() - t0, 4)
    return {"secs": secs, "rows": survivors, "imgs_per_s": round(n / secs)}


def generate_video_corpus(spark, path: str, n_vids: int) -> None:
    """Planted video corpus at scale: cross-container twin groups
    (animated GIF even ids, AVI/MJPEG odd ids incl. progressive frames,
    junk members) — the same generator the value-oracled
    dedup_video_crossformat_pairs entry uses, written once so the dedup
    case measures DECODE+dedup, not generation."""
    from outpost_spark.ops.multimodal import planted_mixed_video_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ids = spark.range(0, n_vids, 1, cpus * 4).select(F.col("id").alias("doc_id"))
    planted_mixed_video_corpus(ids, id_col="doc_id").write.mode("overwrite").parquet(path)


def video_dedup_case(spark, path: str) -> dict:
    """Frame-sequence video dedup end to end at corpus scale (r13):
    GIF disposal-model + RIFF/MJPEG decode with per-frame dHash in one
    Arrow stage, the frame-aligned pigeonhole band join, match-fraction
    threshold, connected components, canonical-survivor collapse.  Both
    container codecs' Python loops are the quarantined cost driver —
    the case records videos/s (and frames/s) so the linear scale-out
    claim has a measured per-core rate behind it."""
    from outpost_spark.ops.multimodal import video_dhash_survivors

    vids = spark.read.parquet(path)
    n = vids.count()
    t0 = time.perf_counter()
    survivors = video_dhash_survivors(vids, every_k=2).count()
    secs = round(time.perf_counter() - t0, 4)
    return {"secs": secs, "rows": survivors, "vids_per_s": round(n / secs, 1)}


def generate_audio_corpus(spark, path: str, n_clips: int) -> None:
    """Planted audio corpus at scale: mixed-rate, mixed-FORMAT near-dup
    twin groups (8 kHz WAV plants; odd ids resampled to 16 kHz AND
    re-encoded as FLAC — lossless, so twins still fingerprint
    identically) + junk members — the same generator the value-oracled
    dedup_audio_cross{rate,format}_pairs entries use, written once so
    the dedup case measures DECODE (both codecs) + FFT + dedup, not
    generation.  cross_format joined in r15 (VERDICT r14 #5) so the
    100k-clip row exercises the FLAC decoder's real throughput; the
    planted survivor arithmetic is unchanged (same groups, same junk)."""
    from outpost_spark.ops.multimodal import planted_audio_dedup_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ids = spark.range(0, n_clips, 1, cpus * 4).select(F.col("id").alias("doc_id"))
    planted_audio_dedup_corpus(
        ids, id_col="doc_id", cross_rate=True, cross_format=True
    ).write.mode("overwrite").parquet(path)


def audio_dedup_case(spark, path: str) -> dict:
    """Perceptual audio dedup end to end at corpus scale (r14): WAV
    parse + Hann-rFFT spectral fingerprint in one Arrow stage, the
    Hz-anchored pigeonhole band join pairing clips ACROSS sample rates,
    connected components, canonical-survivor collapse.  The planted
    arithmetic predicts the survivor count exactly (junk members + one
    canonical per group), so the recorded row count doubles as a
    correctness witness at 100k-clip scale."""
    from outpost_spark.ops.multimodal import audio_fp_survivors

    clips = spark.read.parquet(path)
    n = clips.count()
    t0 = time.perf_counter()
    survivors = audio_fp_survivors(
        clips, max_hamming=6, fmax_hz=3800.0
    ).count()
    secs = round(time.perf_counter() - t0, 4)
    return {"secs": secs, "rows": survivors, "clips_per_s": round(n / secs, 1)}


def generate_embedding_corpus(spark, path: str, n_vecs: int, dims: int = 64) -> None:
    """Deterministic 1M-scale embedding corpus with planted near-dup
    clusters, pure-Column generation (xxhash64-derived pseudo-randoms).

    Layout: ids < n_vecs/10 are clustered — ids (2c, 2c+1) share base
    vector c with per-member noise ±0.05/dim (cosine ≈ 0.9975, well above
    the 0.95 dedup threshold); the rest are independent uniform [-1,1]
    vectors (random 64-dim cosines concentrate near 0, so cross-pair
    false positives are ~impossible).  Planted ground truth: exactly
    n_vecs/20 near-dup pairs, partner(id) = id XOR 1.
    """
    n_clustered = n_vecs // 10
    dim_seq = F.sequence(F.lit(1), F.lit(dims))
    base_seed = F.when(F.col("id") < n_clustered, F.floor(F.col("id") / 2) + n_vecs).otherwise(
        F.col("id")
    )

    def u(seed_col, d, mod, scale, shift):
        return (
            F.pmod(F.xxhash64(F.lit("embcorpus"), seed_col, d), F.lit(mod)) / scale
            + shift
        )

    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            dim_seq,
            lambda d: (
                u(base_seed, d, 2000, 1000.0, -1.0)
                + F.when(
                    F.col("id") < n_clustered,
                    u(F.col("id"), d + 100000, 100, 1000.0, -0.05),
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(path)


def embedding_cases(spark, path: str, recall_out: dict):
    """1M-embedding ANN/semantic-dedup operators at scale: BLAS-backed
    bulk paths (ivf_assign_bulk + per-list applyInPandas scoring).

    Planted recall is measured EXACTLY against the XOR-1 ground truth and
    recorded in ``recall_out``; nprobe=4 (measured curve at 100k:
    nprobe 2/4/8 -> knn recall@1 98.1/99.9/100 %, semantic-dedup removal
    99.2/99.98/— % — the standard IVF compute-for-recall dial).  The
    assertions bound recall (>=99 % knn, >=99.5 % dedup) and require
    EXACT precision (a removed singleton or a non-partner rank-1 hit at
    cosine>=0.95 would mean a scoring bug, not an IVF miss)."""
    from outpost_spark.ops.similarity import knn_join_bulk, semantic_dedup_bulk

    emb = spark.read.parquet(path)
    n_vecs = emb.count()
    n_clustered = n_vecs // 10
    # centroids: every ~707th singleton (deterministic, K ~ sqrt(N·nprobe))
    n_cents = max(64, int((2 * n_vecs) ** 0.5) // 2)
    stride = max(1, (n_vecs - n_clustered) // n_cents)
    cents = [
        list(r["v"])
        for r in emb.filter(
            (F.col("vec_id") >= n_clustered)
            & ((F.col("vec_id") - n_clustered) % stride == 0)
        )
        .orderBy("vec_id")
        .limit(n_cents)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]

    def knn_case():
        knn = knn_join_bulk(emb, "embedding", cents, k=5, nprobe=4)
        # recall@1 + precision in the same job as the row count
        agg = knn.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                (
                    (F.col("src_id") < n_clustered)
                    & (F.col("rank") == 1)
                    & (F.col("neighbor_id") == F.col("src_id").bitwiseXOR(F.lit(1)))
                ).cast("long")
            ).alias("hits"),
            F.sum(
                (
                    (F.col("rank") == 1)
                    & (F.col("score") >= 0.95)
                    & (F.col("neighbor_id") != F.col("src_id").bitwiseXOR(F.lit(1)))
                ).cast("long")
            ).alias("false_strong"),
        ).collect()[0]
        recall_out["knn_recall_at_1"] = round(agg["hits"] / n_clustered, 5)
        if agg["hits"] < 0.99 * n_clustered:
            raise AssertionError(f"recall@1 {agg['hits']}/{n_clustered} < 99%")
        if agg["false_strong"]:
            raise AssertionError(
                f"{agg['false_strong']} non-partner rank-1 hits at cosine>=0.95"
            )
        return agg["rows"]

    def semdedup_case():
        survivors = semantic_dedup_bulk(
            emb, "embedding", cents, threshold=0.95, nprobe=4
        )
        agg = survivors.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("vec_id") >= n_clustered).cast("long")).alias("singletons"),
        ).collect()[0]
        removed = n_vecs - agg["n"]
        planted = n_clustered // 2
        recall_out["semdedup_removed_frac"] = round(removed / planted, 5)
        if agg["singletons"] != n_vecs - n_clustered:
            raise AssertionError("semantic dedup removed a non-planted singleton")
        if not 0.995 * planted <= removed <= planted:
            raise AssertionError(f"removed {removed}, planted {planted}")
        return agg["n"]

    def pq_case():
        """PQ at corpus scale (VERDICT r05 task #5): train (bounded
        driver sample), encode 1M vectors (Arrow numpy, distributed),
        then query with the production shape — ADC shortlist + exact
        rerank (pq_topk_rerank) — measuring recall@10 against the exact
        dot-product top-10.  Config m=16, k=256 (the standard byte-code
        PQ; 64 float32 dims = 256 B -> 16 B codes, 16x): measured
        probing showed m=8/k=16 ADC-only recall@10 is 0.14 on this
        corpus — random near-equal-norm vectors are exactly where
        coarse codes fail — while m=16/k=256 gives 0.58 ADC-only and
        1.00 with rerank(200)."""
        from outpost_spark.ops.similarity import (
            dot_expr,
            pq_encode,
            pq_topk,
            pq_topk_rerank,
            pq_train,
        )

        books = pq_train(emb, "embedding", m=16, k=256, sample_n=8192)
        t0 = time.perf_counter()
        codes = pq_encode(emb, "embedding", books, id_col="vec_id").localCheckpoint(
            eager=True
        )
        n_codes = codes.count()
        recall_out["pq_encode_secs"] = round(time.perf_counter() - t0, 4)
        recall_out["pq_compression_ratio"] = 16.0  # 256 B -> 16 x 1 B codes
        # deterministic singleton queries spread across the corpus
        qstride = (n_vecs - n_clustered) // 8
        qids = [n_clustered + 7 + i * qstride for i in range(8)]
        qvecs = {
            r["vec_id"]: list(r["v"])
            for r in emb.filter(F.col("vec_id").isin(qids))
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
            .collect()
        }
        hits_adc, hits_rr, adc_secs, rr_secs = 0, 0, 0.0, 0.0
        for qid in qids:
            qv = qvecs[qid]
            brute = {
                r["vec_id"]
                for r in emb.select(
                    "vec_id",
                    dot_expr(
                        F.col("embedding").cast("array<double>"),
                        F.lit(qv),
                    ).alias("s"),
                )
                .orderBy(F.col("s").desc(), F.col("vec_id").asc())
                .limit(10)
                .collect()
            }
            t0 = time.perf_counter()
            adc = {r["vec_id"] for r in pq_topk(codes, qv, books, k=10).collect()}
            adc_secs += time.perf_counter() - t0
            hits_adc += len(adc & brute)
            t0 = time.perf_counter()
            rr = {
                r["vec_id"]
                for r in pq_topk_rerank(
                    codes, emb, qv, books, k=10, shortlist=200
                ).collect()
            }
            rr_secs += time.perf_counter() - t0
            hits_rr += len(rr & brute)
        recall_out["pq_adc_query_secs_avg"] = round(adc_secs / 8, 4)
        recall_out["pq_rerank_query_secs_avg"] = round(rr_secs / 8, 4)
        recall_out["pq_recall_at_10_adc"] = round(hits_adc / 80, 4)
        recall_out["pq_recall_at_10_rerank"] = round(hits_rr / 80, 4)
        if hits_rr / 80 < 0.9:
            raise AssertionError(
                f"PQ+rerank recall@10 {hits_rr}/80 below the 0.9 floor"
            )
        return n_codes

    return {
        "KnnJoinBulk": knn_case,
        "SemanticDedupBulk": semdedup_case,
        "PqTopk": pq_case,
    }


def webhook_delivery_case(spark, n_events: int = 20_000) -> dict:
    """Delivery-executor throughput: format_webhook (HMAC signed) ->
    deliver_http against an in-process multi-threaded 200-receiver,
    32 partitions of concurrent senders.  Like the moto SQS row, the
    receiver's own ceiling is measured first and reported alongside —
    the engine-side number is honest only relative to it."""
    import threading
    import urllib.request
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from outpost_spark.routing.delivery import deliver_http
    from outpost_spark.routing.sinkformats import format_webhook

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/hook"

    # receiver ceiling: raw sequential urllib POSTs from 16 threads
    probe_n, probe_done = 2000, []

    def probe(k):
        for _ in range(probe_n // 16):
            req = urllib.request.Request(url, data=b"{}", method="POST")
            urllib.request.urlopen(req, timeout=10).read()
        probe_done.append(k)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=probe, args=(i,)) for i in range(16)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    ceiling = round(probe_n / (time.perf_counter() - t0), 1)

    ev = spark.range(n_events).select(
        F.concat(F.lit("evt_"), F.col("id")).alias("event_id"),
        F.lit("user.created").alias("topic"),
        F.create_map(F.lit("k"), F.col("id").cast("string")).alias("metadata"),
        F.concat(F.lit('{"n": '), F.col("id").cast("string"), F.lit("}")).alias("data"),
    )
    frame = format_webhook(
        ev, url=url, ts=F.current_timestamp(), secrets=["whsec_bench"]
    ).repartition(32)
    t0 = time.perf_counter()
    agg = (
        deliver_http(frame, timeout=10.0)
        .groupBy("status")
        .count()
        .collect()
    )
    secs = round(time.perf_counter() - t0, 4)
    srv.shutdown()
    counts = {r["status"]: r["count"] for r in agg}
    return {
        "secs": secs,
        "rows": int(counts.get("success", 0)),
        "failed": int(counts.get("failed", 0)),
        "deliveries_per_sec": round(counts.get("success", 0) / secs, 1),
        "receiver_ceiling_req_per_sec": ceiling,
    }


def closed_loop_delivery_case(spark, root: str, n_events: int | None = None) -> dict:
    """The reference's full loop as ONE engine graph per wave (VERDICT
    r08 stretch #10): format_webhook -> concurrent deliver_http against
    a receiver that 503s 30% of FIRST attempts -> attempt_records ->
    insert_many (the real attempt log) -> batched RetryStateTable ->
    fired tasks re-deliver, waves until converged.  ALSO drives the
    requeue->DLQ path (VERDICT r10 #8): ids ending in 7 fail their
    first delivery AND then fail PROCESSING on every fire (the handler
    crash the reference's receive_count guards against,
    scheduler.go:196-203) — they requeue keeping their receive_count
    until it crosses max_receive_count=3 and diverts to the DLQ.
    Waves run until the retry state drains (hard cap only against a
    non-draining bug); convergence = every event fully ACCOUNTED —
    success, audited retry-budget exhaustion (real transport failures
    burn attempts: the reference also gives up past MaxRetries), or
    DLQ — with "lost" (outcome dropped by the engine) reported
    separately as the actual failure condition.  Measures end-to-end
    deliveries/s across all waves — signing, HTTP, logging, and
    retry-state costs together, not any tier alone."""
    import shutil
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from outpost_spark.functions.backoff import ConstantBackoff
    from outpost_spark.logstore.insert import insert_many
    from outpost_spark.routing.delivery import attempt_records, deliver_http
    from outpost_spark.routing.sinkformats import format_webhook
    from outpost_spark.streaming.retry import RetryStateTable

    n = n_events or int(os.environ.get("SPARK_GRAFT_SCALE_LOOP_EVENTS", 20_000))
    seen: dict[str, int] = {}  # eid -> server-side POST count (diagnosis)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_POST(self):
            nb = int(self.headers.get("Content-Length", 0))
            self.rfile.read(nb)
            eid = self.headers.get("x-outpost-event-id", "")
            with lock:
                first = eid not in seen
                seen[eid] = seen.get(eid, 0) + 1
            # deterministic failures: 30% of events 503 on their FIRST
            # delivery then succeed; ids ending in 7 also 503 first (to
            # enter the retry queue — their processing then poisons)
            m = int(eid.rsplit("_", 1)[-1]) % 10
            fail = first and (m < 3 or m == 7)
            body = b'{"error":"down"}' if fail else b'{"ok":true}'
            self.send_response(503 if fail else 200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/hook"

    state_path = os.path.join(root, "closed_loop_state")
    log_root = os.path.join(root, "closed_loop_log")
    for p in (state_path, log_root):
        shutil.rmtree(p, ignore_errors=True)
    table = RetryStateTable(
        spark,
        state_path,
        backoff=ConstantBackoff(interval=0.0),  # due immediately: waves
        retry_max_limit=5,
        max_receive_count=3,  # 4th fire of a requeue loop -> DLQ
        keep_versions=4,
    )
    events = spark.range(n).select(
        F.concat(F.lit("evt_"), F.col("id")).alias("event_id"),
        F.lit("dest_hook").alias("destination_id"),
        F.lit("t1").alias("tenant_id"),
        F.lit("user.created").alias("topic"),
        F.create_map(F.lit("k"), F.col("id").cast("string")).alias("metadata"),
        F.concat(F.lit('{"n": '), F.col("id").cast("string"), F.lit("}")).alias(
            "data"
        ),
        F.current_timestamp().alias("event_time"),
        F.lit(True).alias("eligible_for_retry"),
    )
    # poisoned = ids ending in 7: delivery would succeed on retry, but
    # their downstream PROCESSING fails every time a timer fires, so
    # they requeue with their receive_count until the DLQ cap
    poisoned = F.element_at(F.split(F.col("event_id"), "_"), -1).cast(
        "long"
    ) % 10 == 7
    wave = events.withColumn("attempt_number", F.lit(1))
    requeue = None
    t0 = time.perf_counter()
    total_posts = total_ok = waves = dlq_total = 0
    # waves-until-converged with a hard cap (VERDICT r14 #2): the loop
    # runs until the retry state drains; the cap only guards a
    # pathological non-draining bug, and hitting it is itself recorded
    max_waves = int(os.environ.get("SPARK_GRAFT_SCALE_LOOP_MAX_WAVES", 16))
    budget_exhausted = False
    while True:
        if waves >= max_waves:
            budget_exhausted = True
            break
        waves += 1
        outcomes = None
        if wave is not None and wave.limit(1).count() > 0:
            frame = format_webhook(
                wave,
                url=url,
                ts=F.current_timestamp(),
                secrets=["whsec_bench"],
            ).repartition(32)
            results = deliver_http(frame, timeout=10.0).select(
                "event_id", "status", "response_code", "response_data"
            )
            enriched = wave.join(results, "event_id").localCheckpoint(eager=True)
            insert_many(
                attempt_records(enriched, attempt_number_col="attempt_number"),
                os.path.join(log_root, "events"),
                os.path.join(log_root, "attempts"),
            )
            outcomes = enriched.select(
                "event_id",
                "destination_id",
                "tenant_id",
                "status",
                "attempt_number",
                "eligible_for_retry",
            )
            counts = {
                r["status"]: r["count"]
                for r in enriched.groupBy("status").count().collect()
            }
            total_posts += sum(counts.values())
            total_ok += counts.get("success", 0)
        fired = table.apply_outcomes(
            outcomes, waves, now=float(waves), requeue_df=requeue
        ).localCheckpoint(eager=True)
        dlq_total += fired.where(F.col("dlq")).count()
        live = fired.where(~F.col("dlq"))
        if live.limit(1).count() == 0:
            break
        requeue = live.where(poisoned).select(
            "event_id",
            "destination_id",
            "tenant_id",
            "attempt_number",
            "receive_count",
        )
        wave = (
            live.where(~poisoned)
            .select("event_id", "attempt_number")
            .join(events, "event_id")
        )
    secs = round(time.perf_counter() - t0, 4)
    srv.shutdown()
    attempts = spark.read.parquet(os.path.join(log_root, "attempts"))
    logged = attempts.count()
    n_poisoned = sum(1 for i in range(n) if i % 10 == 7)
    # Full per-event accounting (VERDICT r14 #2: r14's 17,999/18,000 red
    # bit went undiagnosed).  A non-poisoned event may legitimately end
    # WITHOUT a success: ~5% of posts fail at the transport layer
    # (broken keep-alive sockets under 32-thread load), and an event
    # whose 503 is followed by retry_max_limit consecutive transport
    # failures EXHAUSTS its budget — the reference gives up past
    # MaxRetries the same way (deliverymq retry schedule), with every
    # attempt in the log.  Convergence therefore means: every event is
    # accounted for as success, audited exhaustion, or DLQ — nothing
    # silently LOST (no success, yet attempts stop short of the budget).
    exhaust_at = 5 + 1  # retry_max_limit + 1: the attempt whose failure cancels
    no_success = (
        attempts.groupBy("event_id")
        .agg(
            F.sum((F.col("status") == "success").cast("int")).alias("ok"),
            F.count("*").alias("n_attempts"),
            F.max("attempt_number").alias("max_attempt"),
        )
        .where(
            (F.col("ok") == 0)
            & (
                F.element_at(F.split(F.col("event_id"), "_"), -1).cast("long")
                % 10
                != 7
            )
        )
        .collect()
    )
    exhausted = [r for r in no_success if r["max_attempt"] >= exhaust_at]
    lost = [r for r in no_success if r["max_attempt"] < exhaust_at]
    converged = (
        total_ok + len(exhausted) == n - n_poisoned
        and dlq_total == n_poisoned
        and not lost
        and not budget_exhausted
    )
    diagnosis = None
    if exhausted or lost or budget_exhausted:
        with lock:
            diagnosis = {
                "exhausted_events": [
                    {
                        "event_id": r["event_id"],
                        "logged_attempts": int(r["n_attempts"]),
                        "max_attempt_number": int(r["max_attempt"]),
                        "server_side_posts": seen.get(r["event_id"], 0),
                    }
                    for r in exhausted[:20]
                ],
                "lost_events": [
                    {
                        "event_id": r["event_id"],
                        "logged_attempts": int(r["n_attempts"]),
                        "max_attempt_number": int(r["max_attempt"]),
                        "server_side_posts": seen.get(r["event_id"], 0),
                    }
                    for r in lost[:20]
                ],
                "budget_exhausted": budget_exhausted,
                "note": (
                    "exhausted = audited retry-budget exhaustion after "
                    "repeated transport failures (legitimate at-least-once "
                    "behavior, counted toward convergence); lost = the "
                    "engine dropped an outcome (a real bug); "
                    "budget_exhausted = the wave cap fired with live timers"
                ),
            }
        print(
            f"ClosedLoopDelivery accounting: ok={total_ok}/"
            f"{n - n_poisoned}, exhausted={len(exhausted)}, "
            f"lost={len(lost)}, dlq={dlq_total}/{n_poisoned}, "
            f"converged={converged}, diagnosis={json.dumps(diagnosis)}",
            file=sys.stderr,
        )
    return {
        "secs": secs,
        "rows": total_ok,
        "deliveries": total_posts,
        "waves": waves,
        "max_waves": max_waves,
        "attempt_log_rows": logged,
        "dlq_rows": dlq_total,
        "dlq_expected": n_poisoned,
        "exhausted_rows": len(exhausted),
        "lost_rows": len(lost),
        "converged": converged,
        "diagnosis": diagnosis,
        "deliveries_per_sec": round(total_posts / secs, 1) if secs else 0.0,
    }


def retry_timer_case(spark, root: str) -> dict:
    """Stateful retry-timer layer throughput (VERDICT r07 stretch #10):
    a rate-source stream of attempt outcomes drives
    ``attach_retry_stream`` — 70% failures schedule (upsert) a
    registered timer, 30% successes cancel — and expired timers emit
    RetryTask rows.  Measures outcomes/s absorbed by the stateful
    operator and timers/s fired, putting a number on the layer the way
    routing/ingest already have one.  Per-key state is one (tenant,
    attempt, fire_at) tuple + one timer; scale-out is the shuffle
    partitioning on (event_id, destination_id)."""
    import shutil
    import threading

    from outpost_spark.functions.backoff import ExponentialBackoff
    from outpost_spark.streaming.retry import attach_retry_stream

    rps = int(os.environ.get("SPARK_GRAFT_SCALE_RETRY_RPS", 2_500))
    run_secs = float(os.environ.get("SPARK_GRAFT_SCALE_RETRY_SECS", 75.0))
    ckpt = os.path.join(root, "retry_timer_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(
            # ~20k live keys: events see repeated outcomes (schedule ->
            # reschedule/cancel churn), the actual retry-queue shape
            F.concat(F.lit("evt_"), F.col("value") % 20_000).alias("event_id"),
            F.concat(F.lit("dest_"), (F.col("value") % 500)).alias("destination_id"),
            F.concat(F.lit("tenant_"), (F.col("value") % 2)).alias("tenant_id"),
            F.when(F.col("value") % 10 < 3, F.lit("success"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            (F.col("value") % 3 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
        )
    )
    fired = []
    lock = threading.Lock()

    def _count(batch_df, _bid):
        n = batch_df.count()
        with lock:
            fired.append(n)

    # interval 2 s, base 2: attempt 1..3 -> 2/4/8 s delays, all inside
    # the run window, so the fire path is continuously exercised
    tasks = attach_retry_stream(
        src, ExponentialBackoff(interval=2.0), retry_max_limit=5
    )
    t0 = time.perf_counter()
    q = (
        tasks.writeStream.foreachBatch(_count)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        time.sleep(run_secs)
    finally:
        q.stop()
        q.awaitTermination(60)
    wall = round(time.perf_counter() - t0, 4)
    progress = [p for p in q.recentProgress if "numInputRows" in p]
    inputs = sum(int(p["numInputRows"]) for p in progress)
    # sustained = batches 1+ (batch 0 pays Python-worker + state-store
    # warm-up, same convention as the routing stream case)
    warm = progress[1:]
    warm_rows = sum(int(p["numInputRows"]) for p in warm)
    warm_secs = (
        sum(float(p["durationMs"]["triggerExecution"]) for p in warm) / 1000.0
    )
    n_fired = sum(fired)
    return {
        "secs": wall,
        "rows": n_fired,
        "outcomes_in": inputs,
        "outcomes_per_sec": round(warm_rows / warm_secs, 1) if warm_secs else 0.0,
        "timers_fired_per_sec": round(n_fired / wall, 1),
        "rate_rows_per_sec": rps,
        "batches": len(progress),
    }


def retry_timer_batched_case(spark, root: str) -> dict:
    """Batched retry-timer throughput (the ST2 scale path): the same
    outcome stream shape as ``retry_timer_case`` driven through
    ``RetryStateTable`` via foreachBatch — one set-oriented merge per
    micro-batch, zero per-key Python.  The rate is set ~20× the per-key
    path's measured ceiling; outcomes/s here is the layer's real
    capacity number."""
    import shutil
    import threading

    from outpost_spark.functions.backoff import ExponentialBackoff
    from outpost_spark.streaming.retry import retry_foreach_batch

    rps = int(os.environ.get("SPARK_GRAFT_SCALE_RETRYB_RPS", 50_000))
    run_secs = float(os.environ.get("SPARK_GRAFT_SCALE_RETRYB_SECS", 60.0))
    ckpt = os.path.join(root, "retry_batched_ckpt")
    state = os.path.join(root, "retry_batched_state")
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(
            F.concat(F.lit("evt_"), F.col("value") % 200_000).alias("event_id"),
            F.concat(F.lit("dest_"), (F.col("value") % 500)).alias(
                "destination_id"
            ),
            F.concat(F.lit("tenant_"), (F.col("value") % 2)).alias("tenant_id"),
            F.when(F.col("value") % 10 < 3, F.lit("success"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            (F.col("value") % 3 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
        )
    )
    fired = []
    lock = threading.Lock()

    def sink(fired_df, _bid):
        n = fired_df.count()
        with lock:
            fired.append(n)

    fn = retry_foreach_batch(
        spark,
        state,
        sink,
        backoff=ExponentialBackoff(interval=2.0),
        retry_max_limit=5,
    )
    t0 = time.perf_counter()
    q = (
        src.writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        time.sleep(run_secs)
    finally:
        q.stop()
        q.awaitTermination(60)
    wall = round(time.perf_counter() - t0, 4)
    progress = [p for p in q.recentProgress if "numInputRows" in p]
    inputs = sum(int(p["numInputRows"]) for p in progress)
    warm = progress[1:]
    warm_rows = sum(int(p["numInputRows"]) for p in warm)
    warm_secs = (
        sum(float(p["durationMs"]["triggerExecution"]) for p in warm) / 1000.0
    )
    n_fired = sum(fired)
    return {
        "secs": wall,
        "rows": n_fired,
        "outcomes_in": inputs,
        "outcomes_per_sec": round(warm_rows / warm_secs, 1) if warm_secs else 0.0,
        "timers_fired_per_sec": round(n_fired / wall, 1),
        "rate_rows_per_sec": rps,
        "batches": len(progress),
    }


def txn_append_case(spark, root: str, att, n_rows: int) -> dict:
    """Transaction-log table throughput at the full clone size, with a
    PHASE BREAKDOWN so a move in the engine's only write path is
    localizable (VERDICT r10 #4): ``stage_write_secs`` (the clustered
    parquet write), ``footer_stats_secs`` (per-file footer scan for the
    log's pruning stats), ``commit_secs`` (the atomic commit-log
    write).  Also measures the snapshot read and metadata-only
    retention that ride the same log."""
    import datetime as _dt
    import shutil

    from outpost_spark.logstore.insert import with_month_partition
    from outpost_spark.logstore.txntable import TxnTable

    tx_path = os.path.join(root, "txn_attempts_bench")
    shutil.rmtree(tx_path, ignore_errors=True)
    # the clone spans one month, so cluster by DAY to give retention the
    # same file-granularity the month layout has at year scale: expired
    # days drop metadata-only, the cutoff day rewrites
    att_m = with_month_partition(att, "attempt_time").withColumn(
        "day", F.date_format("attempt_time", "yyyyMMdd")
    )
    phases: dict = {}
    t0 = time.perf_counter()
    tx = TxnTable.get_or_create(spark, tx_path, att_m.schema)
    tx.append(
        att_m,
        cluster_by="day",
        stats_cols=("attempt_time",),
        phase_timings=phases,
    )
    append_secs = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    count = tx.read().count()
    snapshot_secs = round(time.perf_counter() - t0, 4)
    assert count == n_rows
    t0 = time.perf_counter()
    dropped, rewritten, deleted = tx.delete_where_time(
        "attempt_time",
        _dt.datetime(2000, 1, 16, 12, 0, 0),
        keep_stats_cols=("day",),
    )
    retention_secs = round(time.perf_counter() - t0, 4)
    return {
        "secs": append_secs,
        "rows": count,
        "phases": phases,
        "snapshot_count_secs": snapshot_secs,
        "retention_secs": retention_secs,
        "retention_dropped_files": dropped,
        "retention_rewritten_files": rewritten,
        "retention_deleted_rows": deleted,
    }


def _alert_attempt_stream(spark, rps: int, n_dests: int):
    """Attempt-outcome stream for the alert cases: high destination
    cardinality (the alert key), ~15% successes (resets), attempt
    numbers reaching past retry_max_limit (exhausted signals), unique
    attempt ids with the rate value as the fold order."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(
            F.concat(F.lit("tenant_"), F.col("value") % 8).alias("tenant_id"),
            F.concat(F.lit("dest_"), F.col("value") % n_dests).alias(
                "destination_id"
            ),
            F.concat(F.lit("att_"), F.col("value")).alias("attempt_id"),
            F.when(F.col("value") % 20 < 3, F.lit("success"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            (F.col("value") % 12 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
            F.col("value").alias("seq"),
        )
    )


def alert_stream_perkey_case(spark, root: str) -> dict:
    """Per-key alert evaluator throughput (ST3 as shipped through r10):
    ``attach_alert_stream`` invokes Python once per (tenant,
    destination) per batch — the same pandas-per-key ceiling the retry
    queue measured at ~2.5k keys/s.  This row is the BASELINE the
    batched table is judged against."""
    import shutil
    import threading

    from outpost_spark.streaming.alerts import AlertStateMachine, attach_alert_stream

    rps = int(os.environ.get("SPARK_GRAFT_SCALE_ALERT_RPS", 2_500))
    run_secs = float(os.environ.get("SPARK_GRAFT_SCALE_ALERT_SECS", 60.0))
    n_dests = int(os.environ.get("SPARK_GRAFT_SCALE_ALERT_DESTS", 50_000))
    ckpt = os.path.join(root, "alert_perkey_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    src = _alert_attempt_stream(spark, rps, n_dests).drop("seq")
    machine = AlertStateMachine(auto_disable_failure_count=20, retry_max_limit=10)
    signals = attach_alert_stream(src, machine)
    emitted = []
    lock = threading.Lock()

    def _count(batch_df, _bid):
        n = batch_df.count()
        with lock:
            emitted.append(n)

    t0 = time.perf_counter()
    q = (
        signals.writeStream.foreachBatch(_count)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        time.sleep(run_secs)
    finally:
        q.stop()
        q.awaitTermination(60)
    wall = round(time.perf_counter() - t0, 4)
    progress = [p for p in q.recentProgress if "numInputRows" in p]
    warm = progress[1:]
    warm_rows = sum(int(p["numInputRows"]) for p in warm)
    warm_secs = (
        sum(float(p["durationMs"]["triggerExecution"]) for p in warm) / 1000.0
    )
    return {
        "secs": wall,
        "rows": sum(emitted),
        "outcomes_in": sum(int(p["numInputRows"]) for p in progress),
        "outcomes_per_sec": round(warm_rows / warm_secs, 1) if warm_secs else 0.0,
        "signals_per_sec": round(sum(emitted) / wall, 1),
        "rate_rows_per_sec": rps,
        "n_destinations": n_dests,
        "batches": len(progress),
    }


def alert_stream_batched_case(spark, root: str) -> dict:
    """Batched alert evaluation (the ST3/ST4 scale path): the same
    attempt stream driven through ``AlertStateTable`` via foreachBatch
    — windows + one key-keyed merge per micro-batch, zero per-key
    Python.  The rate is set ~20× the per-key path's ceiling; the
    VERDICT bar is >=10× the per-key outcomes/s at high destination
    cardinality."""
    import shutil
    import threading

    from outpost_spark.streaming.alerts import AlertStateMachine, alert_foreach_batch

    rps = int(os.environ.get("SPARK_GRAFT_SCALE_ALERTB_RPS", 50_000))
    run_secs = float(os.environ.get("SPARK_GRAFT_SCALE_ALERTB_SECS", 60.0))
    n_dests = int(os.environ.get("SPARK_GRAFT_SCALE_ALERT_DESTS", 50_000))
    ckpt = os.path.join(root, "alert_batched_ckpt")
    state = os.path.join(root, "alert_batched_state")
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)

    src = _alert_attempt_stream(spark, rps, n_dests)
    machine = AlertStateMachine(auto_disable_failure_count=20, retry_max_limit=10)
    emitted = []
    lock = threading.Lock()

    def sink(signals_df, _bid):
        n = signals_df.count()
        with lock:
            emitted.append(n)

    fn = alert_foreach_batch(spark, state, sink, machine=machine)
    t0 = time.perf_counter()
    q = (
        src.writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        time.sleep(run_secs)
    finally:
        q.stop()
        q.awaitTermination(60)
    wall = round(time.perf_counter() - t0, 4)
    progress = [p for p in q.recentProgress if "numInputRows" in p]
    warm = progress[1:]
    warm_rows = sum(int(p["numInputRows"]) for p in warm)
    warm_secs = (
        sum(float(p["durationMs"]["triggerExecution"]) for p in warm) / 1000.0
    )
    return {
        "secs": wall,
        "rows": sum(emitted),
        "outcomes_in": sum(int(p["numInputRows"]) for p in progress),
        "outcomes_per_sec": round(warm_rows / warm_secs, 1) if warm_secs else 0.0,
        "signals_per_sec": round(sum(emitted) / wall, 1),
        "rate_rows_per_sec": rps,
        "n_destinations": n_dests,
        "batches": len(progress),
    }


def alert_hotkey_skew_case(spark, root: str) -> dict:
    """Hot-destination skew A/B for the batched alert fold (VERDICT r11
    task #2): ONE destination takes ~50% of every batch's outcomes, the
    pathological shape where the single-pass whole-key ordered window
    serializes that key's slice in one task.  The same batches run
    through two AlertStateTables — single-pass and the two-pass
    order-bucket carry (order_buckets=32) — and the emitted signal
    frames are fingerprint-compared per batch, so the row is both a
    skew measurement AND a at-scale equality witness for the bucketed
    fold."""
    import shutil

    from outpost_spark.streaming.alerts import AlertStateMachine, AlertStateTable

    n_rows = int(os.environ.get("SPARK_GRAFT_SCALE_ALERTH_ROWS", 1_200_000))
    n_batches = int(os.environ.get("SPARK_GRAFT_SCALE_ALERTH_BATCHES", 4))
    n_dests = int(os.environ.get("SPARK_GRAFT_SCALE_ALERT_DESTS", 50_000))
    machine = AlertStateMachine(auto_disable_failure_count=20, retry_max_limit=10)

    def batch(b: int):
        # even ids -> the hot destination (~50% of the batch); odds
        # spread over n_dests; ~15% successes; seq carries cross-batch
        # fold order
        return spark.range(n_rows).select(
            F.concat(F.lit("tenant_"), F.col("id") % 8).alias("tenant_id"),
            F.when(F.col("id") % 2 == 0, F.lit("dest_hot"))
            .otherwise(F.concat(F.lit("dest_"), F.col("id") % n_dests))
            .alias("destination_id"),
            F.concat(F.lit(f"att_{b}_"), F.col("id")).alias("attempt_id"),
            F.when(F.col("id") % 20 < 3, F.lit("success"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            (F.col("id") % 12 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
            (F.lit(b) * n_rows + F.col("id")).alias("seq"),
        )

    def _fingerprint(df):
        # decimal sum: overflow-free under ANSI mode at millions of rows
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    results: dict[str, dict] = {}
    # hybrid (r12 task #3): hot_key_rows at 1/10 of the batch routes
    # only dest_hot through the bucketed fold; everything else keeps
    # the single-pass plan and the extra shuffles carry just the hot
    # slice
    modes = (
        ("single_pass", dict()),
        ("bucketed", dict(order_buckets=32)),
        ("hybrid", dict(order_buckets=32, hot_key_rows=n_rows // 10)),
    )
    for mode, kw in modes:
        state = os.path.join(root, f"alert_hot_{mode}")
        shutil.rmtree(state, ignore_errors=True)
        table = AlertStateTable(spark, state, machine=machine, **kw)
        fps, t0 = [], time.perf_counter()
        for b in range(1, n_batches + 1):
            sig = table.apply_attempts(batch(b), b, now=float(b))
            fps.append(_fingerprint(sig))
        secs = round(time.perf_counter() - t0, 4)
        results[mode] = {
            "secs": secs,
            "fps": fps,
            "outcomes_per_sec": round(n_rows * n_batches / secs, 1),
        }
    equal = results["single_pass"]["fps"] == results["bucketed"]["fps"]
    hybrid_equal = results["single_pass"]["fps"] == results["hybrid"]["fps"]
    return {
        "secs": results["bucketed"]["secs"],
        "rows": sum(n for (n, _h) in results["bucketed"]["fps"]),
        "single_pass_secs": results["single_pass"]["secs"],
        "single_pass_outcomes_per_sec": results["single_pass"]["outcomes_per_sec"],
        "outcomes_per_sec": results["bucketed"]["outcomes_per_sec"],
        "speedup_vs_single_pass": round(
            results["single_pass"]["secs"] / max(results["bucketed"]["secs"], 1e-9), 3
        ),
        "hybrid_secs": results["hybrid"]["secs"],
        "hybrid_outcomes_per_sec": results["hybrid"]["outcomes_per_sec"],
        "hybrid_speedup_vs_single_pass": round(
            results["single_pass"]["secs"] / max(results["hybrid"]["secs"], 1e-9), 3
        ),
        "signals_equal": equal,
        "hybrid_signals_equal": hybrid_equal,
        "hot_share": 0.5,
        "n_destinations": n_dests,
        "batches": n_batches,
        "rows_per_batch": n_rows,
    }


def _frame_fingerprint(df):
    """(row count, order-independent xxhash64 sum) of a frame — array
    columns JSON-serialized first; decimal(38,0) sum because Spark 4
    ANSI mode overflows long sums."""
    cols = [
        F.to_json(F.struct(c)) if t.startswith("array") else F.col(c)
        for c, t in df.dtypes
    ]
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def embed_gate_pq_case(spark, epath: str) -> dict:
    """Streaming embed-gate IVFADC prefilter at scale (r14, VERDICT r13
    task #8): build the full-vector and PQ variants of EmbedDedupIndex
    over the SAME 1M-vector corpus (holding out a batch-sized singleton
    range and the odd clustered ids), gate one 20k batch — 10k planted
    near-dups of indexed partners + 10k held-out fresh singletons —
    through both, and record per-variant gate seconds plus exact
    decision equality: the at-scale witness behind the
    decision-equality pytest (tests/test_streaming_embed_ingest.py)."""
    import shutil
    import tempfile

    from outpost_spark.streaming.embed_ingest import EmbedDedupIndex

    emb = spark.read.parquet(epath)
    n_vecs = emb.count()
    n_clustered = n_vecs // 10
    n_cents = max(64, int((2 * n_vecs) ** 0.5) // 2)
    stride = max(1, (n_vecs - n_clustered) // n_cents)
    cents = [
        list(r["v"])
        for r in emb.filter(
            (F.col("vec_id") >= n_clustered)
            & ((F.col("vec_id") - n_clustered) % stride == 0)
        )
        .orderBy("vec_id")
        .limit(n_cents)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]
    b = min(10_000, n_clustered // 2)
    holdout_lo = n_clustered + 17
    batch = emb.filter(
        ((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 2 * b))
        | (
            (F.col("vec_id") >= holdout_lo)
            & (F.col("vec_id") < holdout_lo + b)
        )
    ).localCheckpoint(eager=True)
    indexed = emb.join(batch.select("vec_id"), "vec_id", "left_anti")
    work = tempfile.mkdtemp(prefix="embed_gate_pq_")
    out: dict = {}
    decisions = {}
    try:
        for name, kwargs in (
            ("full", {}),
            ("pq", {"pq_m": 16, "pq_k": 256}),
        ):
            idx = EmbedDedupIndex(
                os.path.join(work, name), cents, threshold=0.95, nprobe=2,
                **kwargs,
            )
            t0 = time.perf_counter()
            idx.build(indexed, id_col="vec_id", vec_col="embedding")
            out[f"build_{name}_secs"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            admitted, rejected = idx.gate(
                batch, id_col="vec_id", vec_col="embedding"
            )
            adm = frozenset(r["vec_id"] for r in admitted.collect())
            rej = frozenset(
                (r["vec_id"], r["matched_id"], r["cosine"])
                for r in rejected.collect()
            )
            out[f"{name}_gate_secs"] = round(time.perf_counter() - t0, 4)
            decisions[name] = (adm, rej)
            out[f"{name}_admitted"] = len(adm)
            out[f"{name}_rejected"] = len(rej)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out["decisions_equal"] = decisions["full"] == decisions["pq"]
    out["batch_rows"] = batch.count()
    out["secs"] = round(out["full_gate_secs"] + out["pq_gate_secs"], 4)
    out["rows"] = out["pq_admitted"]
    if not out["decisions_equal"]:
        raise AssertionError(f"PQ gate decisions diverged: {out}")
    return out


def retry_recovery_case(spark, root: str) -> dict:
    """Crash-recovery of the SECOND VersionedStateTable user (VERDICT
    r12 task #6): the same damaged-write protocol as
    :func:`state_recovery_case`, but over the retry-timer table — seed
    a multi-million-timer pending state, apply an outcome batch that
    upserts, cancels, AND fires due timers, damage the new state
    version exactly the way a killed write leaves it, and re-apply the
    same batch.  Records whether the re-run reproduced the identical
    fired frame and state version."""
    import shutil

    from outpost_spark.streaming.retry import RetryStateTable

    n_keys = int(os.environ.get("SPARK_GRAFT_SCALE_RECOVERY_KEYS", 2_000_000))
    n_batch = int(os.environ.get("SPARK_GRAFT_SCALE_RECOVERY_ROWS", 1_000_000))
    path = os.path.join(root, "recovery_retry_state")
    shutil.rmtree(path, ignore_errors=True)
    table = RetryStateTable(spark, path, retry_max_limit=12)

    def batch(n: int, tag_mod: int):
        # event ids overlap the seeded key space, so batch 2 upserts
        # and cancels existing timers as well as inserting new ones
        return spark.range(n).select(
            F.concat(F.lit("evt_"), (F.col("id") * tag_mod) % (2 * n_keys))
            .alias("event_id"),
            F.concat(F.lit("dest_"), F.col("id") % 50).alias("destination_id"),
            F.concat(F.lit("tenant_"), F.col("id") % 8).alias("tenant_id"),
            F.when(F.col("id") % 20 < 17, F.lit("failed"))
            .otherwise(F.lit("success"))
            .alias("status"),
            (F.col("id") % 6 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
        )

    t0 = time.perf_counter()
    table.apply_outcomes(batch(n_keys, 1), 1, now=1.0)
    seed_secs = round(time.perf_counter() - t0, 4)
    state_rows = spark.read.parquet(os.path.join(path, "v=1")).count()
    # now=1e6: every seeded timer is due — batch 2 fires the survivors
    # while its own outcomes upsert/cancel
    t0 = time.perf_counter()
    table.apply_outcomes(batch(n_batch, 3), 2, now=1e6)
    first_secs = round(time.perf_counter() - t0, 4)
    fired_path = os.path.join(path, "fired/v=2")
    state_path = os.path.join(path, "v=2")
    f1 = _frame_fingerprint(spark.read.parquet(fired_path))
    s1 = _frame_fingerprint(spark.read.parquet(state_path))

    parts = sorted(f for f in os.listdir(state_path) if f.endswith(".parquet"))
    for f in parts[::2] + ["_SUCCESS"]:
        fp = os.path.join(state_path, f)
        if os.path.exists(fp):
            os.remove(fp)

    t0 = time.perf_counter()
    table.apply_outcomes(batch(n_batch, 3), 2, now=1e6)  # re-delivery
    recovery_secs = round(time.perf_counter() - t0, 4)
    f2 = _frame_fingerprint(spark.read.parquet(fired_path))
    s2 = _frame_fingerprint(spark.read.parquet(state_path))
    return {
        "secs": recovery_secs,
        "rows": state_rows,
        "seed_secs": seed_secs,
        "first_apply_secs": first_secs,
        "fired_match": f1 == f2,
        "state_match": s1 == s2,
        "fired_rows": f1[0],
        "state_keys": n_keys,
        "batch_rows": n_batch,
        "damaged_files": len(parts[::2]) + 1,
    }


def state_recovery_case(spark, root: str) -> dict:
    """Crash-recovery of the versioned state tables at scale (VERDICT
    r11 task #6): seed an AlertStateTable with a multi-million-key
    state, apply a batch, then simulate a mid-write crash by damaging
    the new state version exactly the way a killed write leaves it
    (half the part files and the _SUCCESS marker gone) and re-apply the
    same batch — the foreachBatch re-delivery path.  Records the
    recovery wall time and whether the re-run reproduced the identical
    signal frame and state version (signals land under signals/v=N and
    state under v=N with overwrite semantics, so replays converge)."""
    import shutil

    from outpost_spark.streaming.alerts import AlertStateMachine, AlertStateTable

    n_keys = int(os.environ.get("SPARK_GRAFT_SCALE_RECOVERY_KEYS", 2_000_000))
    n_batch = int(os.environ.get("SPARK_GRAFT_SCALE_RECOVERY_ROWS", 1_000_000))
    path = os.path.join(root, "recovery_state")
    shutil.rmtree(path, ignore_errors=True)
    machine = AlertStateMachine(auto_disable_failure_count=20, retry_max_limit=10)
    table = AlertStateTable(spark, path, machine=machine)

    def batch(n: int, tag: str):
        return spark.range(n).select(
            F.concat(F.lit("tenant_"), F.col("id") % 8).alias("tenant_id"),
            F.concat(F.lit("dest_"), F.col("id") % n_keys).alias("destination_id"),
            F.concat(F.lit(f"att_{tag}_"), F.col("id")).alias("attempt_id"),
            F.when(F.col("id") % 20 < 3, F.lit("success"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            (F.col("id") % 12 + 1).cast("int").alias("attempt_number"),
            F.lit(True).alias("eligible_for_retry"),
            F.col("id").alias("seq"),
        )

    _fingerprint = _frame_fingerprint

    t0 = time.perf_counter()
    table.apply_attempts(batch(n_keys, "seed"), 1, now=1.0)
    seed_secs = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    table.apply_attempts(batch(n_batch, "b2"), 2, now=2.0)
    first_secs = round(time.perf_counter() - t0, 4)
    sig_path = os.path.join(path, "signals/v=2")
    state_path = os.path.join(path, "v=2")
    sig1 = _fingerprint(spark.read.parquet(sig_path))
    st1 = _fingerprint(spark.read.parquet(state_path))
    state_rows = st1[0]

    # the crash: a killed task set leaves a partial directory — drop
    # half the part files and the _SUCCESS marker
    parts = sorted(f for f in os.listdir(state_path) if f.endswith(".parquet"))
    for f in parts[::2] + ["_SUCCESS"]:
        fp = os.path.join(state_path, f)
        if os.path.exists(fp):
            os.remove(fp)

    t0 = time.perf_counter()
    table.apply_attempts(batch(n_batch, "b2"), 2, now=2.0)  # re-delivery
    recovery_secs = round(time.perf_counter() - t0, 4)
    sig2 = _fingerprint(spark.read.parquet(sig_path))
    st2 = _fingerprint(spark.read.parquet(state_path))
    return {
        "secs": recovery_secs,
        "rows": state_rows,
        "seed_secs": seed_secs,
        "first_apply_secs": first_secs,
        "signals_match": sig1 == sig2,
        "state_match": st1 == st2,
        "signal_rows": sig1[0],
        "state_keys": n_keys,
        "batch_rows": n_batch,
        "damaged_files": len(parts[::2]) + 1,
    }


def routing_stream_case(
    spark, root: str, *, n_batches: int = 6, events_per_batch: int = 100_000
):
    """Sustained micro-batch routing throughput (amortized-plan events/s).

    The batch entry ``routing_match_fanout`` times ONE query including
    plan compile; the streaming claim is that ``make_routing_sink``
    amortizes that per micro-batch.  This measures it: a real Structured
    Streaming file source delivers one 100k-event file per trigger into
    ``make_routing_sink`` (per-batch destination reload + filter
    recompile, zero-Python compiled_static plan).  Batch 0 pays Python
    worker + codegen warm-up; the sustained figure is batches 1+.

    Returns (sustained_events_per_sec, total_routed_rows, per_batch_secs).
    """
    import shutil

    from outpost_spark.streaming.pipeline import make_routing_sink

    evdir = os.path.join(root, "routing_stream_events")
    ddir = os.path.join(root, "routing_stream_dests")
    ckpt = os.path.join(root, "routing_stream_ckpt")
    for d in (evdir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(evdir)

    n_tenants = 1000
    topic_arr = F.array(*[F.lit(t) for t in TOPICS])

    def ev_frame(b: int):
        return spark.range(events_per_batch).select(
            F.concat(F.lit(f"evt_{b}_"), F.col("id")).alias("event_id"),
            (F.col("id") % n_tenants).cast("string").alias("tenant_id"),
            F.element_at(topic_arr, (F.col("id") % 3 + 1).cast("int")).alias("topic"),
            F.lit(JAN).alias("event_time"),
            F.create_map(F.lit("source"), F.lit("bench")).alias("metadata"),
            F.concat(
                F.lit('{"value": '), (F.col("id") % 100).cast("string"), F.lit("}")
            ).alias("data"),
        )

    # one parquet FILE per micro-batch (maxFilesPerTrigger=1)
    stage = os.path.join(root, "routing_stream_stage")
    for b in range(n_batches):
        shutil.rmtree(stage, ignore_errors=True)
        ev_frame(b).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part), os.path.join(evdir, f"batch_{b}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)

    # destination corpus: same shape as the routing_match_fanout entry —
    # one exact-topic destination per (tenant, topic), a '*' wildcard
    # disabled for even tenants, a '*' destination gated by a compiled
    # JSON filter matching one topic (1/3 of events)
    tenants = spark.range(n_tenants).select(F.col("id").cast("string").alias("tenant_id"))
    nulls = [
        F.lit(None).cast("string").alias("filter"),
        F.lit(None).cast("timestamp").alias("disabled_at"),
    ]
    d_exact = (
        tenants.crossJoin(spark.createDataFrame([(t,) for t in TOPICS], "topic string"))
        .select(
            F.concat(F.lit("d_"), F.col("topic")).alias("id"),
            "tenant_id",
            F.lit("webhook").alias("type"),
            F.array(F.col("topic")).alias("topics"),
            *nulls,
        )
    )
    d_wild = tenants.select(
        F.lit("d_wild").alias("id"),
        "tenant_id",
        F.lit("webhook").alias("type"),
        F.array(F.lit("*")).alias("topics"),
        F.lit(None).cast("string").alias("filter"),
        F.when(
            F.col("tenant_id").cast("bigint") % 2 == 0, F.lit(JAN)
        ).alias("disabled_at"),
    )
    d_filtered = tenants.select(
        F.lit("d_filtered").alias("id"),
        "tenant_id",
        F.lit("webhook").alias("type"),
        F.array(F.lit("*")).alias("topics"),
        F.lit(f'{{"topic": "{TOPICS[2]}"}}').alias("filter"),
        F.lit(None).cast("timestamp").alias("disabled_at"),
    )
    d_exact.unionByName(d_wild).unionByName(d_filtered).write.mode(
        "overwrite"
    ).parquet(ddir)

    marks: list[tuple[int, float, int]] = []

    def process(routed, batch_id: int) -> None:
        n = routed.count()
        marks.append((batch_id, time.perf_counter(), n))

    schema = (
        "event_id string, tenant_id string, topic string, event_time timestamp,"
        " metadata map<string,string>, data string"
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(evdir)
    )
    t_start = time.perf_counter()
    q = (
        src.writeStream.foreachBatch(
            make_routing_sink(lambda s: s.read.parquet(ddir), process)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    marks.sort()
    per_batch = [
        round(t - (marks[i - 1][1] if i else t_start), 3)
        for i, (_, t, _) in enumerate(marks)
    ]
    total_routed = sum(n for _, _, n in marks)
    sustained = (
        events_per_batch * (len(marks) - 1) / (marks[-1][1] - marks[0][1])
        if len(marks) > 1
        else 0.0
    )
    return round(sustained), total_routed, per_batch


class _FakeSqsStore:
    """Thread-safe in-memory queue with the SQS visibility contract —
    receive hides, delete-on-commit removes.  Lets the bench measure the
    DRIVER RECEIVE LOOP's capacity (batching, bookkeeping, micro-batch
    cycle) without an HTTP endpoint in the way."""

    def __init__(self, bodies):
        import collections
        import threading

        self.q = collections.deque(enumerate(bodies))
        self.inflight: dict = {}
        self.lock = threading.Lock()


class _FakeSqsClient:
    def __init__(self, store: _FakeSqsStore):
        self.store = store

    def get_queue_url(self, QueueName):
        return {"QueueUrl": QueueName}

    def receive_message(self, QueueUrl, MaxNumberOfMessages=10,
                        WaitTimeSeconds=0, AttributeNames=None):
        msgs = []
        with self.store.lock:
            for _ in range(MaxNumberOfMessages):
                if not self.store.q:
                    break
                i, body = self.store.q.popleft()
                h = f"h{i}"
                self.store.inflight[h] = (i, body)
                msgs.append(
                    {
                        "MessageId": f"m{i}",
                        "Body": body,
                        "ReceiptHandle": h,
                        "Attributes": {
                            "SentTimestamp": "0",
                            "ApproximateReceiveCount": "1",
                        },
                    }
                )
        return {"Messages": msgs} if msgs else {}

    def delete_message_batch(self, QueueUrl, Entries):
        with self.store.lock:
            for e in Entries:
                self.store.inflight.pop(e["ReceiptHandle"], None)
        return {}


def _drive_reader_loop(store, n_msgs, n_threads=1, batch_size=1000):
    """Drive SqsStreamReader.read()/commit() directly against an
    in-memory store — the receive LOOP's own ceiling (batch assembly,
    handle bookkeeping, delete batching), no HTTP and no micro-batch
    engine in the way.  The full streaming stack's overhead is already
    characterized by RoutingStreamSustained; multiplying the two ratios
    bounds the end-to-end SQS path."""
    import threading

    from outpost_spark.sources import sqs_source as sqs_mod

    done = [0] * n_threads

    def run(t):
        reader = sqs_mod.SqsStreamReader(
            {"queuename": "loop", "maxmessagesperbatch": str(batch_size)}
        )
        reader._sqs = _FakeSqsClient(store)
        reader._url = "loop"
        off = reader.initialOffset()
        while True:
            rows, nxt = reader.read(off)
            n = sum(1 for _ in rows)
            if n == 0:
                break
            done[t] += n
            reader.commit(nxt)
            off = nxt

    t0 = time.perf_counter()
    threads = [threading.Thread(target=run, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dt = time.perf_counter() - t0
    return {
        "events_per_sec": round(sum(done) / dt, 1),
        "rows": sum(done),
        "secs": round(dt, 4),
        "undeleted": len(store.q) + len(store.inflight),
    }


def sqs_ingest_case(spark, n_msgs: int) -> dict | None:
    """Measured events/s for the SQS ingest path (VERDICT r06 "What's
    wrong" #4: the driver-bound receive loop's ceiling was asserted,
    never measured).  Three rows separate the ceilings:

    - ``SqsLoopCapacity`` / ``SqsLoopTwoConsumers``: the reader's
      receive/commit loop driven directly against an in-memory queue
      honoring the SQS visibility contract — the CODE's per-consumer
      ceiling, and how two competing consumers on ONE queue share it.
    - ``SqsIngestMotoEndpoint``: the full readStream stack against a
      real moto HTTP endpoint, with a raw boto3 receive+delete loop
      measured alongside (``moto_raw_baseline_eps``).  Moto serves only
      a handful of calls/s, so this row measures the ENDPOINT; the
      baseline makes the Spark-side overhead attributable instead of
      conflated with it.

    Real AWS sits between: ~10 msgs per ~5-15 ms call -> ~0.7-2k
    msg/s/consumer network-bound — far below the measured loop
    capacity — so the scale-out lever is competing consumers (mechanics
    pinned in tests/test_sqs_source.py), not a faster loop."""
    try:
        import boto3
        from moto.server import ThreadedMotoServer
    except ImportError:
        return None
    import json as _json
    import logging
    import tempfile

    from outpost_spark.sources.sqs_source import register_sqs_source, send_events

    out: dict = {}
    bodies = [_json.dumps({"i": i}) for i in range(n_msgs)]
    out["SqsLoopCapacity"] = _drive_reader_loop(_FakeSqsStore(bodies), n_msgs, 1)
    out["SqsLoopTwoConsumers"] = _drive_reader_loop(
        _FakeSqsStore(bodies), n_msgs, 2
    )
    for case in ("SqsLoopCapacity", "SqsLoopTwoConsumers"):
        print(
            f"{case}: {out[case]['events_per_sec']} events/s "
            f"({out[case]['rows']} msgs in {out[case]['secs']}s, "
            f"undeleted={out[case]['undeleted']})",
            file=sys.stderr,
        )

    # ---- real HTTP endpoint (moto): full streaming stack, small N -----
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
    logging.getLogger("werkzeug").setLevel(logging.ERROR)
    register_sqs_source(spark)
    n_moto = min(n_msgs, 300)
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "sqs", region_name="us-east-1", endpoint_url=endpoint,
        aws_access_key_id="test", aws_secret_access_key="test",
    )
    try:
        client.create_queue(QueueName="raw")
        send_events({"region": "us-east-1", "endpoint": endpoint}, "raw",
                    [{"i": i} for i in range(n_moto)])
        qurl = client.get_queue_url(QueueName="raw")["QueueUrl"]
        t0 = time.perf_counter()
        got = 0
        while got < n_moto:
            r = client.receive_message(QueueUrl=qurl, MaxNumberOfMessages=10)
            msgs = r.get("Messages", [])
            if not msgs:
                break
            got += len(msgs)
            client.delete_message_batch(
                QueueUrl=qurl,
                Entries=[
                    {"Id": str(j), "ReceiptHandle": m["ReceiptHandle"]}
                    for j, m in enumerate(msgs)
                ],
            )
        raw_eps = round(got / (time.perf_counter() - t0), 1)

        client.create_queue(QueueName="moto-bench")
        send_events({"region": "us-east-1", "endpoint": endpoint},
                    "moto-bench", [{"i": i} for i in range(n_moto)])
        counts = [0]

        def _fb(df, _bid, c=counts):
            c[0] += df.count()

        ckroot = tempfile.mkdtemp(prefix="sqsbench-moto-")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("sqs")
            .option("queueName", "moto-bench")
            .option("region", "us-east-1")
            .option("endpoint", endpoint)
            .option("maxMessagesPerBatch", "100")
            .load()
            .writeStream.foreachBatch(_fb)
            .option("checkpointLocation", os.path.join(ckroot, "0"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        while counts[0] < n_moto and time.perf_counter() - t0 < 300:
            time.sleep(0.2)
        dt = time.perf_counter() - t0
        q.stop()
        out["SqsIngestMotoEndpoint"] = {
            "events_per_sec": round(counts[0] / dt, 1),
            "rows": counts[0],
            "secs": round(dt, 4),
            "moto_raw_baseline_eps": raw_eps,
        }
        print(
            f"SqsIngestMotoEndpoint: "
            f"{out['SqsIngestMotoEndpoint']['events_per_sec']} events/s "
            f"(raw boto3 loop baseline {raw_eps}/s)",
            file=sys.stderr,
        )
    finally:
        server.stop()
    return out


# Cases that measured >20 s in-session at the default corpus sizes: they
# are session-order-contaminated (VERDICT r07 "What's wrong" #3 — e.g.
# KnnJoinBulk 215 s in-session vs 54 s isolated, same binary, same
# corpus), so the orchestrator runs each in a FRESH subprocess and the
# recorded number is isolated by construction.  Everything below the
# threshold stays in-session (subprocess JVM startup would dominate).
HEAVY_CASES = frozenset(
    {
        "MinHashPairs_fast",
        "SimHashPairs_64",
        "KnnJoinBulk",
        "SemanticDedupBulk",
        "PqTopk",
        "CurateV6_1M",
        "ImageDedupMixed",
        "VideoDedupMixed",
        "AudioDedupMixed",
    }
)

# Short cases whose in-session numbers drifted 1.5-2.0x on byte-identical
# code across r10-r12 (VERDICT r12 "What's wrong" #1): their PRIMARY
# timing now comes from fresh-JVM min-of-3 probes like the heavy cases,
# restoring the instrument's ability to catch a real 1.5x move on the
# metrics/list path.
ISOLATED_CASES = frozenset(
    {
        "CountByTenant",
        "SmallTenant",
        "FilterByTopic",
        "ParagraphDedup",
        # r15 (VERDICT r14 #6): 4x same-code probe spread traced to the
        # main bench JVM (48g + 32 python workers) staying resident
        # while probe subprocesses ran — solo probes measure 1.1x
        # spread on both.  Isolated-primary + the spark.stop() before
        # the probe phase (main()) fix both the primary and the spread.
        "ChunkDocuments",
        "ApproxTopTokens",
    }
)


def _warm_python_workers(spark, cpus: str) -> None:
    """Python worker pool warm-up: without it the first mapInPandas case
    absorbs ~10 s of one-time spin-up."""
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).collect()


def run_only_case(case: str, args) -> None:
    """``--only CASE``: run exactly one doc/embedding case in this
    (fresh) process and print one JSON line — the isolation primitive
    the orchestrator drives for HEAVY_CASES."""
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/outpost_scale_bench")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # scale-bench JVMs are sized to the box (spill-aware: 32 concurrent
    # tasks decompressing 1M-doc text columns overflow the 8g default)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        f"outpost-scale-only-local[{cpus}]", shuffle_partitions=int(cpus)
    )
    _warm_python_workers(spark, cpus)
    recall: dict = {}
    reqs = bench_requests()
    if case in reqs or case == "TxnAppend":
        path = os.path.join(root, f"attempts_{args.events}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            generate(spark, path, args.events)
        att = spark.read.parquet(path)
        if case == "TxnAppend":
            out = txn_append_case(spark, root, att, att.count())
            print(json.dumps({"case": case, "recall": {}, **out}))
            return
        t0 = time.perf_counter()
        rows = len(query_attempt_metrics(att, reqs[case]).collect())
        secs = round(time.perf_counter() - t0, 4)
        print(json.dumps({"case": case, "secs": secs, "rows": rows, "recall": {}}))
        return
    if case == "ImageDedupMixed":
        n_imgs = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", 200_000))
        ipath = os.path.join(root, f"images_{n_imgs}_v3")  # v3: +TIFF noise twins (r14)
        if not os.path.exists(os.path.join(ipath, "_SUCCESS")):
            generate_image_corpus(spark, ipath, n_imgs)
        out = image_dedup_case(spark, ipath)
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case == "VideoDedupMixed":
        n_vids = int(os.environ.get("SPARK_GRAFT_SCALE_VIDEOS", 100_000))
        vpath = os.path.join(root, f"videos_{n_vids}")
        if not os.path.exists(os.path.join(vpath, "_SUCCESS")):
            generate_video_corpus(spark, vpath, n_vids)
        out = video_dedup_case(spark, vpath)
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case == "AudioDedupMixed":
        n_auds = int(os.environ.get("SPARK_GRAFT_SCALE_AUDIO", 100_000))
        # audio corpus v2: +FLAC cross-format twins (r15)
        apath = os.path.join(root, f"audio_{n_auds}_v2")
        if not os.path.exists(os.path.join(apath, "_SUCCESS")):
            generate_audio_corpus(spark, apath, n_auds)
        out = audio_dedup_case(spark, apath)
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case == "EmbedGatePQ":
        n_emb = int(os.environ.get("SPARK_GRAFT_SCALE_EMBEDDINGS", 1_000_000))
        epath = os.path.join(root, f"embeddings_{n_emb}")
        if not os.path.exists(os.path.join(epath, "_SUCCESS")):
            generate_embedding_corpus(spark, epath, n_emb)
        out = embed_gate_pq_case(spark, epath)
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    # skew / storage / streaming / state cases (VERDICT r14 #3: every
    # case in the artifact gets an --only path so attribution never
    # marks a mover "unprobeable" again)
    if case in (
        "DistinctByTenant_plain",
        "DistinctByTenant_salted",
        "TxnSnapshotCount",
        "TxnRetention",
    ):
        path = os.path.join(root, f"attempts_{args.events}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            generate(spark, path, args.events)
        att = spark.read.parquet(path)
        if case == "DistinctByTenant_plain":
            t0 = time.perf_counter()
            rows = len(
                att.groupBy("tenant_id")
                .agg(F.count_distinct("event_id").alias("n"))
                .collect()
            )
            print(json.dumps({
                "case": case, "secs": round(time.perf_counter() - t0, 4),
                "rows": rows, "recall": {},
            }))
            return
        if case == "DistinctByTenant_salted":
            from outpost_spark.ops.skew import salted_count_distinct

            t0 = time.perf_counter()
            rows = len(
                salted_count_distinct(
                    att, ["tenant_id"], "event_id", salt_buckets=64
                ).collect()
            )
            print(json.dumps({
                "case": case, "secs": round(time.perf_counter() - t0, 4),
                "rows": rows, "recall": {},
            }))
            return
        # TxnSnapshotCount / TxnRetention ride the full append case
        # (their phases only exist after an append) — secs/rows are the
        # sub-metric the artifact records for that name
        out = txn_append_case(spark, root, att, att.count())
        secs, rows = (
            (out["snapshot_count_secs"], out["rows"])
            if case == "TxnSnapshotCount"
            else (out["retention_secs"], out["retention_deleted_rows"])
        )
        out.update(secs=secs, rows=rows)
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case == "RoutingStreamSustained":
        t0 = time.perf_counter()
        sustained, routed_rows, per_batch = routing_stream_case(spark, root)
        print(json.dumps({
            "case": case, "secs": round(time.perf_counter() - t0, 4),
            "rows": routed_rows, "recall": {},
            "events_per_sec": sustained, "per_batch_secs": per_batch,
        }))
        return
    stream_runners = {
        "WebhookDelivery": lambda: webhook_delivery_case(spark),
        "RetryTimerStream": lambda: retry_timer_case(spark, root),
        "RetryTimerBatched": lambda: retry_timer_batched_case(spark, root),
        "ClosedLoopDelivery": lambda: closed_loop_delivery_case(spark, root),
        "AlertStreamPerKey": lambda: alert_stream_perkey_case(spark, root),
        "AlertStreamBatched": lambda: alert_stream_batched_case(spark, root),
        "StateRecovery": lambda: state_recovery_case(spark, root),
        "StateRecoveryRetry": lambda: retry_recovery_case(spark, root),
    }
    if case in stream_runners:
        out = stream_runners[case]()
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case.startswith("AlertHotKeySkew"):
        out = alert_hotkey_skew_case(spark, root)
        sub = {
            "AlertHotKeySkew": out["secs"],
            "AlertHotKeySkew_single_pass": out["single_pass_secs"],
            "AlertHotKeySkew_hybrid": out["hybrid_secs"],
        }
        if case not in sub:
            raise SystemExit(f"unknown --only case {case!r}")
        out["secs"] = sub[case]
        print(json.dumps({"case": case, "recall": {}, **out}))
        return
    if case in ("SqsLoopCapacity", "SqsLoopTwoConsumers"):
        sqs = sqs_ingest_case(
            spark, int(os.environ.get("SPARK_GRAFT_SCALE_SQS_MSGS", 5000))
        ) or {}
        if case not in sqs:
            raise SystemExit(f"sqs case {case!r} unavailable (moto missing?)")
        print(json.dumps({"case": case, "recall": {}, **sqs[case]}))
        return
    dpath = os.path.join(root, f"documents_{args.docs}")
    if not os.path.exists(os.path.join(dpath, "_SUCCESS")):
        generate_documents(spark, dpath, args.docs)
    thunks = doc_cases(spark, dpath)
    if case not in thunks:
        n_emb = int(os.environ.get("SPARK_GRAFT_SCALE_EMBEDDINGS", 1_000_000))
        epath = os.path.join(root, f"embeddings_{n_emb}")
        if not os.path.exists(os.path.join(epath, "_SUCCESS")):
            generate_embedding_corpus(spark, epath, n_emb)
        thunks = embedding_cases(spark, epath, recall)
    if case not in thunks:
        raise SystemExit(f"unknown --only case {case!r}")
    t0 = time.perf_counter()
    rows = thunks[case]()
    secs = round(time.perf_counter() - t0, 4)
    print(json.dumps({"case": case, "secs": secs, "rows": rows, "recall": recall}))


def _materialize_scale_ref() -> tuple[str, str] | None:
    """(rev, dir) with ``bench_scale.py`` + ``outpost_spark/`` archived
    at the A/B baseline — the latest "round N: verdict" commit, same
    convention as bench.py; ``SPARK_GRAFT_AB_REF=off`` disables,
    ``=<rev>`` overrides.  The ref side runs in its OWN subprocess off
    this tree, so head/ref numbers share the session shape (fresh JVM,
    same corpus dirs) and differ only in code."""
    import io
    import subprocess
    import tarfile
    import tempfile

    env = os.environ.get("SPARK_GRAFT_AB_REF")
    if env == "off":
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    rev = env
    if not rev:
        try:
            out = subprocess.run(
                ["git", "log", "-n1", "--grep", r"^round [0-9]*: verdict",
                 "--format=%H"],
                capture_output=True, text=True, timeout=30, cwd=repo,
            )
            lines = out.stdout.strip().splitlines()
            rev = lines[0] if lines else None
        except Exception:
            rev = None
    if not rev:
        return None
    try:
        out = subprocess.run(
            ["git", "archive", rev, "outpost_spark", "bench_scale.py"],
            capture_output=True, timeout=60, cwd=repo,
        )
        if out.returncode != 0:
            return None
        dest = tempfile.mkdtemp(prefix="bench-scale-ab-")
        with tarfile.open(fileobj=io.BytesIO(out.stdout)) as tf:
            tf.extractall(dest)
        return rev, dest
    except Exception:
        return None


def _load_prev_scale_artifact() -> dict | None:
    """The previous round's committed BENCH_SCALE_r{N}.json (highest N
    in the repo root), for round-over-round move detection.
    ``SPARK_GRAFT_PREV_SCALE=<path>`` overrides, ``=off`` disables."""
    import glob
    import re as _re

    env = os.environ.get("SPARK_GRAFT_PREV_SCALE")
    if env == "off":
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    path = env
    rnd = None
    if not path:
        cands = []
        for p in glob.glob(os.path.join(repo, "BENCH_SCALE_r*.json")):
            m = _re.search(r"r(\d+)\.json$", p)
            if m:
                cands.append((int(m.group(1)), p))
        if not cands:
            return None
        rnd, path = max(cands)
    try:
        with open(path) as f:
            out = json.load(f)
        out["_round"] = rnd
        return out
    except Exception:
        return None


def _run_case_isolated(case: str, args, *, root: str | None = None) -> dict:
    """Spawn ``--only case`` in a fresh interpreter/JVM and parse its
    JSON line.  ``root`` switches the subprocess onto an archived ref
    tree (A/B baseline side); corpus dirs are shared via
    SPARK_GRAFT_SCALE_DIR either way."""
    import subprocess

    script = (
        os.path.join(root, "bench_scale.py")
        if root
        else os.path.abspath(__file__)
    )
    cmd = [
        sys.executable,
        script,
        "--only",
        case,
        "--events",
        str(args.events),
        "--docs",
        str(args.docs),
    ]
    last = None
    for attempt in (0, 1):  # one retry: a fresh JVM can die transiently
        proc = subprocess.run(cmd, capture_output=True, text=True, check=False)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
                if out.get("case") == case:
                    if attempt:
                        out["retried"] = True
                    return out
            except ValueError:
                continue
        errpath = f"/tmp/bench_scale_only_{case}.stderr"
        with open(errpath, "w") as fh:
            fh.write(proc.stderr)
        last = RuntimeError(
            f"isolated case {case} produced no JSON "
            f"(rc={proc.returncode}, full stderr at {errpath}):\n"
            f"{proc.stderr[-4000:]}"
        )
        print(f"isolated {case} attempt {attempt} failed, rc={proc.returncode}",
              file=sys.stderr)
    raise last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", 10_000_000)))
    ap.add_argument("--docs", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", 1_000_000)))
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="run one named doc/embedding case and exit")
    ap.add_argument(
        "--no-isolate",
        action="store_true",
        help="run HEAVY_CASES in-session instead of fresh subprocesses",
    )
    args = ap.parse_args()

    if args.only:
        run_only_case(args.only, args)
        return

    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/outpost_scale_bench")
    path = os.path.join(root, f"attempts_{args.events}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # size the JVM to the box (the isolated subprocesses inherit this)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(f"outpost-scale-bench-local[{cpus}]", shuffle_partitions=int(cpus))

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        generate(spark, path, args.events)
        print(f"generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    att = spark.read.parquet(path)
    n_rows = att.count()

    _warm_python_workers(spark, cpus)

    timings: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    import gc

    isolate_early = not args.no_isolate
    deferred_short: list[str] = []
    for name, req in bench_requests().items():
        if isolate_early and name in ISOLATED_CASES:
            deferred_short.append(name)
            continue
        t0 = time.perf_counter()
        rows_out[name] = len(query_attempt_metrics(att, req).collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"{name}: {timings[name]}s ({rows_out[name]} rows)", file=sys.stderr)
        gc.collect()

    # skew probe: exact distinct event_ids per tenant (tenant_0 ~90% of
    # ~12.6M rows).  Plain vs salted measure within noise — Spark's
    # distinct rewrite already (k,x)-keys the heavy exchange, making the
    # folklore salting fix redundant here (see ops/skew.py for the plan
    # and the honest-negative-result discussion)
    from outpost_spark.ops.skew import salted_count_distinct

    t0 = time.perf_counter()
    rows_out["DistinctByTenant_plain"] = len(
        att.groupBy("tenant_id").agg(F.count_distinct("event_id").alias("n")).collect()
    )
    timings["DistinctByTenant_plain"] = round(time.perf_counter() - t0, 4)
    print(f"DistinctByTenant_plain: {timings['DistinctByTenant_plain']}s", file=sys.stderr)
    gc.collect()
    t0 = time.perf_counter()
    rows_out["DistinctByTenant_salted"] = len(
        salted_count_distinct(att, ["tenant_id"], "event_id", salt_buckets=64).collect()
    )
    timings["DistinctByTenant_salted"] = round(time.perf_counter() - t0, 4)
    print(f"DistinctByTenant_salted: {timings['DistinctByTenant_salted']}s", file=sys.stderr)
    gc.collect()

    # storage layer: transaction-log table throughput at the full clone
    # size — one append = one atomic commit; retention = metadata-only
    # drops + boundary rewrite; snapshot read from the commit log
    txa = txn_append_case(spark, root, att, n_rows)
    timings["TxnAppend"] = txa["secs"]
    rows_out["TxnAppend"] = txa["rows"]
    timings["TxnSnapshotCount"] = txa["snapshot_count_secs"]
    rows_out["TxnSnapshotCount"] = txa["rows"]
    timings["TxnRetention"] = txa["retention_secs"]
    rows_out["TxnRetention"] = txa["retention_deleted_rows"]
    print(
        f"TxnAppend: {txa['secs']}s ({n_rows} rows; phases {txa['phases']}); "
        f"snapshot count {txa['snapshot_count_secs']}s; retention "
        f"{txa['retention_secs']}s "
        f"(dropped {txa['retention_dropped_files']} files metadata-only, "
        f"rewrote {txa['retention_rewritten_files']}, "
        f"deleted {txa['retention_deleted_rows']} rows)",
        file=sys.stderr,
    )
    gc.collect()

    isolate = not args.no_isolate
    deferred: list[str] = list(deferred_short)

    dpath = os.path.join(root, f"documents_{args.docs}")
    if not os.path.exists(os.path.join(dpath, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_documents(spark, dpath, args.docs)
        print(f"documents generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for name, thunk in doc_cases(spark, dpath).items():
        if isolate and (name in HEAVY_CASES or name in ISOLATED_CASES):
            deferred.append(name)
            continue
        t0 = time.perf_counter()
        rows_out[name] = thunk()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"{name}: {timings[name]}s ({rows_out[name]} rows)", file=sys.stderr)
        gc.collect()

    n_imgs = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", 200_000))
    ipath = os.path.join(root, f"images_{n_imgs}_v3")  # v3: +TIFF noise twins (r14)
    if not os.path.exists(os.path.join(ipath, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_image_corpus(spark, ipath, n_imgs)
        print(f"images generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    img: dict | None = None
    if isolate:
        deferred.append("ImageDedupMixed")
    else:
        img = image_dedup_case(spark, ipath)
        timings["ImageDedupMixed"] = img["secs"]
        rows_out["ImageDedupMixed"] = img["rows"]
        print(
            f"ImageDedupMixed: {img['secs']}s ({img['rows']} survivors, "
            f"{img['imgs_per_s']} imgs/s)",
            file=sys.stderr,
        )

    n_vids = int(os.environ.get("SPARK_GRAFT_SCALE_VIDEOS", 100_000))
    vpath = os.path.join(root, f"videos_{n_vids}")
    if not os.path.exists(os.path.join(vpath, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_video_corpus(spark, vpath, n_vids)
        print(f"videos generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    vid: dict | None = None
    if isolate:
        deferred.append("VideoDedupMixed")
    else:
        vid = video_dedup_case(spark, vpath)
        timings["VideoDedupMixed"] = vid["secs"]
        rows_out["VideoDedupMixed"] = vid["rows"]
        print(
            f"VideoDedupMixed: {vid['secs']}s ({vid['rows']} survivors, "
            f"{vid['vids_per_s']} vids/s)",
            file=sys.stderr,
        )

    n_auds = int(os.environ.get("SPARK_GRAFT_SCALE_AUDIO", 100_000))
    # audio corpus v2: +FLAC cross-format twins (r15)
    apath = os.path.join(root, f"audio_{n_auds}_v2")
    if not os.path.exists(os.path.join(apath, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_audio_corpus(spark, apath, n_auds)
        print(f"audio generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    aud: dict | None = None
    if isolate:
        deferred.append("AudioDedupMixed")
    else:
        aud = audio_dedup_case(spark, apath)
        timings["AudioDedupMixed"] = aud["secs"]
        rows_out["AudioDedupMixed"] = aud["rows"]
        print(
            f"AudioDedupMixed: {aud['secs']}s ({aud['rows']} survivors, "
            f"{aud['clips_per_s']} clips/s)",
            file=sys.stderr,
        )

    n_emb = int(os.environ.get("SPARK_GRAFT_SCALE_EMBEDDINGS", 1_000_000))
    epath = os.path.join(root, f"embeddings_{n_emb}")
    if not os.path.exists(os.path.join(epath, "_SUCCESS")):
        t0 = time.perf_counter()
        generate_embedding_corpus(spark, epath, n_emb)
        print(f"embeddings generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    recall: dict = {}
    for name, thunk in embedding_cases(spark, epath, recall).items():
        if isolate and name in HEAVY_CASES:
            deferred.append(name)
            continue
        t0 = time.perf_counter()
        rows_out[name] = thunk()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"{name}: {timings[name]}s ({rows_out[name]} rows)", file=sys.stderr)
        gc.collect()

    egp = embed_gate_pq_case(spark, epath)
    timings["EmbedGatePQ"] = egp["secs"]
    rows_out["EmbedGatePQ"] = egp["rows"]
    print(
        f"EmbedGatePQ: pq gate {egp['pq_gate_secs']}s vs full "
        f"{egp['full_gate_secs']}s on a {egp['batch_rows']}-row batch "
        f"({egp['pq_admitted']} admitted / {egp['pq_rejected']} rejected; "
        f"decisions_equal={egp['decisions_equal']})",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    sustained, routed_rows, per_batch = routing_stream_case(spark, root)
    timings["RoutingStreamSustained"] = round(time.perf_counter() - t0, 4)
    rows_out["RoutingStreamSustained"] = routed_rows
    print(
        f"RoutingStreamSustained: {sustained} events/s (batches 1+;"
        f" per-batch secs {per_batch})",
        file=sys.stderr,
    )

    wd = webhook_delivery_case(spark)
    timings["WebhookDelivery"] = wd["secs"]
    rows_out["WebhookDelivery"] = wd["rows"]
    print(
        f"WebhookDelivery: {wd['deliveries_per_sec']} deliveries/s signed "
        f"({wd['rows']} ok, {wd['failed']} failed; receiver ceiling "
        f"{wd['receiver_ceiling_req_per_sec']} req/s)",
        file=sys.stderr,
    )

    rt = retry_timer_case(spark, root)
    timings["RetryTimerStream"] = rt["secs"]
    rows_out["RetryTimerStream"] = rt["rows"]
    print(
        f"RetryTimerStream: {rt['outcomes_per_sec']} outcomes/s in, "
        f"{rt['timers_fired_per_sec']} timers/s fired "
        f"({rt['rows']} fired over {rt['secs']}s)",
        file=sys.stderr,
    )

    cl = closed_loop_delivery_case(spark, root)
    timings["ClosedLoopDelivery"] = cl["secs"]
    rows_out["ClosedLoopDelivery"] = cl["rows"]
    print(
        f"ClosedLoopDelivery: {cl['deliveries_per_sec']} deliveries/s "
        f"end-to-end ({cl['deliveries']} posts over {cl['waves']} waves, "
        f"converged={cl['converged']})",
        file=sys.stderr,
    )

    rtb = retry_timer_batched_case(spark, root)
    timings["RetryTimerBatched"] = rtb["secs"]
    rows_out["RetryTimerBatched"] = rtb["rows"]
    print(
        f"RetryTimerBatched: {rtb['outcomes_per_sec']} outcomes/s in, "
        f"{rtb['timers_fired_per_sec']} timers/s fired "
        f"({rtb['rows']} fired over {rtb['secs']}s)",
        file=sys.stderr,
    )

    apk = alert_stream_perkey_case(spark, root)
    timings["AlertStreamPerKey"] = apk["secs"]
    rows_out["AlertStreamPerKey"] = apk["rows"]
    print(
        f"AlertStreamPerKey: {apk['outcomes_per_sec']} outcomes/s in, "
        f"{apk['signals_per_sec']} signals/s "
        f"({apk['rows']} signals over {apk['secs']}s)",
        file=sys.stderr,
    )

    alb = alert_stream_batched_case(spark, root)
    timings["AlertStreamBatched"] = alb["secs"]
    rows_out["AlertStreamBatched"] = alb["rows"]
    print(
        f"AlertStreamBatched: {alb['outcomes_per_sec']} outcomes/s in, "
        f"{alb['signals_per_sec']} signals/s "
        f"({alb['rows']} signals over {alb['secs']}s) — "
        f"{round(alb['outcomes_per_sec'] / max(apk['outcomes_per_sec'], 1), 1)}x per-key",
        file=sys.stderr,
    )

    ahk = alert_hotkey_skew_case(spark, root)
    timings["AlertHotKeySkew"] = ahk["secs"]
    rows_out["AlertHotKeySkew"] = ahk["rows"]
    timings["AlertHotKeySkew_single_pass"] = ahk["single_pass_secs"]
    rows_out["AlertHotKeySkew_single_pass"] = ahk["rows"]
    timings["AlertHotKeySkew_hybrid"] = ahk["hybrid_secs"]
    rows_out["AlertHotKeySkew_hybrid"] = ahk["rows"]
    print(
        f"AlertHotKeySkew: bucketed {ahk['outcomes_per_sec']} outcomes/s vs "
        f"single-pass {ahk['single_pass_outcomes_per_sec']} "
        f"({ahk['speedup_vs_single_pass']}x) vs hybrid "
        f"{ahk['hybrid_outcomes_per_sec']} "
        f"({ahk['hybrid_speedup_vs_single_pass']}x), one dest at 50% of "
        f"{ahk['rows_per_batch']} rows/batch, signals_equal="
        f"{ahk['signals_equal']}/{ahk['hybrid_signals_equal']}",
        file=sys.stderr,
    )

    rec = state_recovery_case(spark, root)
    timings["StateRecovery"] = rec["secs"]
    rows_out["StateRecovery"] = rec["rows"]
    print(
        f"StateRecovery: re-applied a crashed batch against a "
        f"{rec['rows']}-key state in {rec['secs']}s (first apply "
        f"{rec['first_apply_secs']}s; signals_match={rec['signals_match']}, "
        f"state_match={rec['state_match']}, {rec['damaged_files']} damaged files)",
        file=sys.stderr,
    )

    rrec = retry_recovery_case(spark, root)
    timings["StateRecoveryRetry"] = rrec["secs"]
    rows_out["StateRecoveryRetry"] = rrec["rows"]
    print(
        f"StateRecoveryRetry: re-applied a crashed outcome batch against a "
        f"{rrec['rows']}-timer state in {rrec['secs']}s (first apply "
        f"{rrec['first_apply_secs']}s; fired_match={rrec['fired_match']}, "
        f"state_match={rrec['state_match']}, {rrec['damaged_files']} damaged files)",
        file=sys.stderr,
    )

    sqs = sqs_ingest_case(
        spark, int(os.environ.get("SPARK_GRAFT_SCALE_SQS_MSGS", 5000))
    )
    if sqs:
        for case, row in sqs.items():
            timings[case] = row["secs"]
            rows_out[case] = row["rows"]


    # everything above ran in-session; everything below runs in fresh
    # subprocesses.  Compute the probeable name set, then STOP this
    # session's 48g JVM + python worker pool before any probe spawns:
    # r14's ChunkDocuments/ApproxTopTokens probes spread 4x on
    # identical code purely because this JVM stayed resident and
    # squeezed the probes' page cache (solo probes: 1.1x spread).
    probeable_names = (
        set(bench_requests())
        | set(doc_cases(spark, dpath))
        | set(embedding_cases(spark, epath, {}))
    )
    spark.stop()

    # heavy cases: fresh interpreter + JVM each, AFTER the in-session
    # sweep, so their numbers carry no session history by construction.
    # Each also runs against the archived previous-round tree (same
    # fresh-JVM shape, same corpus) — the ab block that makes any
    # round-over-round move attributable to code, not session noise.
    # MIN-OF-N per side (default 2): same-code same-session spreads up
    # to ~1.3x were observed across rounds; the min of two runs knocks
    # out the one-off JIT/page-cache outliers that single-shot A/B
    # couldn't distinguish from real moves.
    ab: dict[str, dict] = {}
    ref = _materialize_scale_ref()
    # 3/side (r14): at 2/side the heavy tier still read 1.39/0.75 on
    # byte-identical code (BENCH_SCALE_r14 SemanticDedupBulk /
    # SimHashPairs_64) — the median needs a third probe to reject a
    # single outlier run
    ab_runs = max(1, int(os.environ.get("SPARK_GRAFT_AB_RUNS", 3)))
    if ref is None:
        ab_runs = 1  # no A/B side: min-of-N buys nothing, save the time
    # short isolated cases get min-of-3 regardless: their probes cost
    # seconds, and min-of-2 sequential-per-side lacked the resolution to
    # separate a real 1.5x from session drift (VERDICT r12 #1)
    short_runs = max(
        ab_runs, int(os.environ.get("SPARK_GRAFT_AB_RUNS_ISOLATED", 3))
    )

    def _ab_probe(name: str, runs: int) -> dict:
        """Fresh-JVM probes, min-of-``runs`` per side, sides ALTERNATING
        (head, ref, head, ref, ...) so monotone machine drift — page
        cache fill, thermal, background load — cancels between the two
        sides instead of loading whichever side ran entirely last (the
        r10-r12 sequential-per-side protocol's blind spot).  Returns
        {'out': best head output, 'head', 'head_runs', 'runs_per_side'}
        plus 'ref'/'ref_runs'/'ratio' when a ref tree exists and accepts
        the case ('ref_error' when it doesn't).  The WITHIN-pair order
        swaps each iteration (head,ref / ref,head / ...) — with a fixed
        order the second side always runs against the page cache the
        first side just warmed, a systematic bias the r13 FilterByTopic
        probe exposed (head runs descending 9.7 -> 7.5 while ref,
        always second, sat at 4.5)."""
        heads: list[dict] = []
        ref_secs: list[float] = []
        ref_err = None
        for i in range(runs):
            ref_first = ref is not None and ref_err is None and i % 2 == 1
            if ref_first:
                try:
                    ref_secs.append(
                        _run_case_isolated(name, args, root=ref[1])["secs"]
                    )
                except Exception as e:  # ref tree may lack the case
                    ref_err = str(e)[:200]
            heads.append(_run_case_isolated(name, args))
            if ref is not None and ref_err is None and not ref_first:
                try:
                    ref_secs.append(
                        _run_case_isolated(name, args, root=ref[1])["secs"]
                    )
                except Exception as e:
                    ref_err = str(e)[:200]
        from statistics import median

        best = min(heads, key=lambda o: o["secs"])
        head_secs = [o["secs"] for o in heads]
        entry: dict = {
            "out": best,
            "head": best["secs"],
            "head_runs": head_secs,
            "runs_per_side": runs,
        }
        if ref_secs:
            r = min(ref_secs)
            # the RATIO is scored median/median, not min/min: under the
            # min estimator, r13's FilterByTopic read 1.663 on
            # byte-identical code because ref's min landed on its first
            # probe and head's on its last (within-session trend + a
            # min that rewards whichever side caught the trend's floor);
            # medians of side-alternating probes cancel the trend.  The
            # per-run lists stay in the artifact, and ratio_min keeps
            # the old estimator readable for cross-round comparison.
            hm, rm = median(head_secs), median(ref_secs)
            entry.update(
                ref=r,
                ref_runs=ref_secs,
                ratio=round(hm / rm, 3) if rm else None,
                ratio_min=round(best["secs"] / r, 3) if r else None,
            )
        elif ref_err is not None:
            entry["ref_error"] = ref_err
        return entry

    for name in deferred:
        probe = _ab_probe(name, short_runs if name in ISOLATED_CASES else ab_runs)
        out = probe.pop("out")
        secs = probe["head"]
        timings[name] = secs
        rows_out[name] = out["rows"]
        recall.update(out.get("recall", {}))
        if name == "ImageDedupMixed":
            img = {k: out[k] for k in ("secs", "rows", "imgs_per_s") if k in out}
        if name == "VideoDedupMixed":
            vid = {k: out[k] for k in ("secs", "rows", "vids_per_s") if k in out}
        if name == "AudioDedupMixed":
            aud = {k: out[k] for k in ("secs", "rows", "clips_per_s") if k in out}
        print(
            f"{name}: {secs}s (runs {probe['head_runs']}) "
            f"({rows_out[name]} rows) [isolated]",
            file=sys.stderr,
        )
        if ref is not None:
            ab[name] = probe
            if "ratio" in probe:
                print(
                    f"{name} A/B: head {secs}s vs ref {probe['ref']}s "
                    f"(x{probe['ratio']} median-scored, "
                    f"{probe['runs_per_side']}/side alternating)",
                    file=sys.stderr,
                )
    print(f"embedding planted recall: {recall}", file=sys.stderr)

    # ---- attribution: any case that moved >1.5x against the previous
    # round's recorded artifact gets its own min-of-N A/B probe, so the
    # artifact never again carries an unexplained 8x move (r10's
    # TxnAppend/ChunkDocuments lesson).  Cases that already carry a
    # same-session heavy A/B are marked covered; cases with no --only
    # path are marked unprobeable rather than silently skipped.
    attribution: dict[str, dict] = {}
    prev = _load_prev_scale_artifact()
    if prev:
        probeable = (
            probeable_names
            | {
                # every remaining artifact case has an --only path
                # (VERDICT r14 #3) — keep this in sync with
                # run_only_case's dispatch
                "TxnAppend",
                "TxnSnapshotCount",
                "TxnRetention",
                "DistinctByTenant_plain",
                "DistinctByTenant_salted",
                "ImageDedupMixed",
                "VideoDedupMixed",
                "AudioDedupMixed",
                "EmbedGatePQ",
                "RoutingStreamSustained",
                "WebhookDelivery",
                "RetryTimerStream",
                "RetryTimerBatched",
                "ClosedLoopDelivery",
                "AlertStreamPerKey",
                "AlertStreamBatched",
                "AlertHotKeySkew",
                "AlertHotKeySkew_single_pass",
                "AlertHotKeySkew_hybrid",
                "StateRecovery",
                "StateRecoveryRetry",
                "SqsLoopCapacity",
                "SqsLoopTwoConsumers",
            }
        )
        movers = []
        for name, secs in timings.items():
            p = prev.get("queries", {}).get(name)
            if p and p > 0 and secs > 0:
                r = secs / p
                if r > 1.5 or r < 1 / 1.5:
                    movers.append((max(r, 1 / r), name, round(r, 3)))
        movers.sort(reverse=True)
        max_probes = int(os.environ.get("SPARK_GRAFT_AB_MAX_ATTRIB", 6))
        probes_done = 0
        for _, name, r in movers:
            entry: dict = {"moved_vs_prev": r, "prev_round": prev.get("_round")}
            if name in ab:
                entry["covered_by"] = "heavy_ab"
            elif ref is None:
                entry["covered_by"] = "no_ref"
            elif name not in probeable:
                entry["covered_by"] = "unprobeable"
            elif probes_done >= max_probes:
                entry["covered_by"] = "probe_cap"
            else:
                probes_done += 1
                # alternating min-of-3 per side: a head-probe failure
                # must not throw away the move record (r11 TxnAppend
                # lesson), and a ref tree that predates the case lands
                # in 'ref_error' inside the probe
                try:
                    probe = _ab_probe(name, short_runs)
                    probe.pop("out", None)
                    entry.update(probe)
                    if "ratio" in probe:
                        print(
                            f"{name} moved x{r} vs prev; A/B head "
                            f"{probe['head']}s vs ref {probe['ref']}s "
                            f"(x{probe['ratio']}, alternating)",
                            file=sys.stderr,
                        )
                except Exception as e:
                    entry["ab_error"] = str(e)[:200]
            attribution[name] = entry

    result = {
        "metric": "scale_bench_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "rows_out": rows_out,
        "events": args.events,
        "attempt_rows": n_rows,
        "doc_rows": args.docs,
        "routing_stream_events_per_sec": sustained,
        "routing_stream_per_batch_secs": per_batch,
        "sqs_ingest": sqs,
        "embedding_rows": n_emb,
        "embedding_planted_recall": recall,
        "isolated_cases": sorted(deferred),
        "retry_timer": rt,
        "retry_timer_batched": rtb,
        "alert_stream_perkey": apk,
        "alert_stream_batched": alb,
        "alert_hotkey_skew": ahk,
        "state_recovery": rec,
        "retry_recovery": rrec,
        "txn_append": txa,
        "closed_loop_delivery": cl,
        "image_dedup": img,
        "image_rows": n_imgs,
        "video_dedup": vid,
        "video_rows": n_vids,
        "audio_dedup": aud,
        "audio_rows": n_auds,
        "embed_gate_pq": egp,
        "ab": {"ref_rev": ref[0] if ref else None, "cases": ab},
        "attribution": attribution,
        "webhook_delivery": wd,
        "cpus": int(cpus),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
