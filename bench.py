"""Benchmark harness — runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Query set mirrors the reference bench matrix (cmd/bench/metrics/
bench_test.go:13-120): count-all / rate / count+rate, count by
topic/destination/tenant, hourly over a day, daily over the month —
expressed through this engine's operators.

Protocol (r05+): each query runs TWICE; ``queries`` carries the warm
min-of-2 (matches SCALE.md's protocol, so round-over-round deltas are
attributable to plan changes rather than first-run plan-compile/codegen
noise — VERDICT r04 "What's wrong" #2/#4) and the headline ``value`` is
the warm total.

Artifact protocol (r06 fix — VERDICT r05 "What's wrong" #1): the r05
line carried BOTH warm and cold maps and outgrew the driver's tail
capture, so the driver recorded ``parsed: null``.  Now stdout gets ONE
compact line — ``{"metric","value","unit","queries"(warm),"sf"}``,
printed LAST — and the full warm/cold detail goes to
``BENCH_DETAIL.json`` on disk instead of the pipe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from outpost_spark import queries_catalog  # noqa: E402
from outpost_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "metrics_count_all",
    "metrics_rate_whole_range",
    "metrics_error_rate_daily",
    "metrics_daily_by_topic",
    "metrics_hourly_count",
    "metrics_sunday_weekly",
    "metrics_filtered_by_topic_status",
    "list_events_first_page",
    "list_events_keyset_page",
    "point_lookup_event",
    "join_broadcast_dim",
    "join_multiway_star",
    "lineitem_pricing_summary",
    "join_latest_attempt_per_key",
    "alert_consecutive_failures",
    "routing_match_fanout",
    "store_list_destinations",
    "publish_validation",
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_lsh_pairs_fast",
    "dedup_simhash_pairs",
    "dedup_paragraphs_global",
    "dedup_substrings_global",
    "dedup_ngram_contamination",
    "sample_stratified_quota",
    "text_chunk_documents",
    "embed_cosine_topk",
    "embed_ann_ivf_topk",
    "embed_knn_join",
    "embed_semantic_dedup",
    "dedup_cross_corpus_near_dups",
    "text_token_stats",
    "text_quality_score",
    # round-5 operators
    "pipeline_curate_corpus_v3",
    "embed_knn_join_bulk",
    "embed_semantic_dedup_bulk",
    "embed_pq_topk",
    "agg_count_distinct_salted",
    "sink_format_kinesis",
    "text_gopher_quality",
    "text_top_tokens_approx",
    "pack_training_sequences",
    "sample_token_budget",
    "join_asof_checkpoint",
    "join_range_windows",
    # round-6 operators
    "join_asof_bucketed",
    "text_token_stats_bpe",
    "pipeline_curate_corpus_v4",
    "sink_format_webhook",
    "sample_token_budget_bpe",
    "sample_shuffled_shards",
    "text_mojibake_stats",
    # round-7 operators
    "lm_bigram_score",
    "text_c4_filters",
    "text_fix_mojibake",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("outpost-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = queries_catalog.queries()

    # warm-up: JVM + parquet footer caches, and the Python worker pool —
    # otherwise the first Python-touching entry (the numpy MinHash path)
    # absorbs ~10 s of one-time worker spin-up that belongs to no query
    registry["metrics_count_all"](spark, sf_dir).collect()
    spark.range(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").collect()

    import gc

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry[name]
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            # release localCheckpoint blocks promptly: the dedup family
            # checkpoints (id, grams) frames, and two runs x 34 queries of
            # lingering blocks otherwise pressure the block manager enough
            # to inflate later queries' numbers
            gc.collect()
        cold[name] = round(runs[0], 4)
        warm[name] = round(min(runs), 4)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "queries_warm": warm,
                "queries_cold": cold,
                "warm_total": round(sum(warm.values()), 4),
                "cold_total": round(sum(cold.values()), 4),
                "sf": sf,
            },
            fh,
            indent=1,
        )
    # the machine-readable summary is the LAST line on stdout, compact
    # (warm map only, no whitespace) so the driver's tail capture always
    # holds the full JSON object
    print(
        json.dumps(
            {
                "metric": "catalog_bench_total",
                "value": round(sum(warm.values()), 4),
                "unit": "sec",
                "queries": warm,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
