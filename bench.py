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

A/B protocol (r07 — VERDICT r06 "What's wrong" #2): after the main loop,
``run_ab`` replays a fixed query subset against the PREVIOUS round's code
(git-archived, module-swapped, same Spark session, interleaved
ref/head/ref/head) and emits per-query head/ref warm ratios in the
summary's ``ab`` key — so a round-over-round delta is attributable:
ratio ~ 1.0 on unchanged queries means the cross-round movement was
session/environment drift, not a plan change.

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

# The bench only TIMES catalog queries — it never runs their DuckDB
# oracles — so point the oracle-fixture dir (which some entries write as
# a side effect) at a bench-private, pid-suffixed path.  Otherwise a
# bench run racing a concurrently-running oracle-parity session at a
# different SF overwrites the fixture mid-comparison (observed r12).
os.environ.setdefault(
    "OUTPOST_SPARK_ORACLE_FIXTURES", f"/tmp/outpost_spark_bench_fix_{os.getpid()}"
)

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
    "pipeline_curate_corpus_v5",
    "sample_temperature_mix",
    "sample_shard_manifest",
    "text_ngram_repetition",
    # round-13 surface (VERDICT r13 task #6): the video/audio dedup and
    # PQ-IVF entries need a per-round sf0.1 trend line, not just scale rows
    "dedup_video_nearpairs",
    "dedup_audio_fingerprint_pairs",
    "embed_pq_ivf_topk",
    "embed_pq_topk_rerank",
]


# ---------------------------------------------------------------------------
# A/B mode (VERDICT r06 "What's wrong" #2): the r05->r06 sf0.1 numbers moved
# 1.19x with the regressions concentrated in UNCHANGED code — round-over-round
# deltas measured in different sessions are confounded by environment drift.
# The fix: run the PREVIOUS round's code and HEAD interleaved in ONE Spark
# session (ref,head,ref,head per query, min-of-2 each) and report per-query
# ratios.  ratio ~ 1.0 on unchanged queries = the cross-round delta was
# session drift; ratio != 1.0 names a real plan change.
#
# Mechanics: the ref revision's outpost_spark/ tree is materialized via
# ``git archive`` into a temp dir and imported under a swapped module
# namespace; each side's full module dict is captured once and swapped
# wholesale around each timed call, so lazy in-function imports resolve to
# the right side.  Ref-side Python UDFs are registered with cloudpickle's
# pickle-by-value so workers execute ref bytecode, not whatever
# ``import outpost_spark`` resolves to on their path.
AB_QUERIES = [
    # the queries VERDICT r06 flagged as uniformly-regressed-but-unchanged,
    # plus cheap anchors — a drift-vs-plan-change verdict needs both
    "metrics_count_all",
    "list_events_first_page",
    "text_token_stats",
    "text_gopher_quality",
    "text_quality_score",
    "agg_count_distinct_salted",
    "join_asof_checkpoint",
    "pack_training_sequences",
    "dedup_substrings_global",
    "embed_pq_topk",
    "embed_knn_join_bulk",
    "pipeline_curate_corpus_v3",
    # r07 heavy entries — next round's deltas on these must be attributable
    "lm_bigram_score",
    "pipeline_curate_corpus_v5",
    # r14 additions (VERDICT r13 tasks #1/#7): the remaining 5s+ entries
    # and the throughput-critical streaming entry join the pool
    "pipeline_curate_corpus_v4",
    "dedup_minhash_lsh_pairs",
    "embed_semantic_dedup",
    "routing_match_fanout",
    # r15 additions (VERDICT r14 #4): the slow r13/r14 multimodal and
    # PQ entries — the two slowest sf0.1 queries had raw trend lines
    # only, so a move on them was never attributable
    "dedup_audio_fingerprint_pairs",
    "dedup_video_nearpairs",
    "dedup_audio_crossformat_pairs",
    "embed_pq_ivf_topk",
    # r16 addition (VERDICT r15 #4): the third-slowest r15 query had no
    # A/B slot, so its 5.3x raw swing on untouched code was unarbitrable
    "dedup_simhash_pairs",
]

# VERDICT r13 "What's wrong" #1: the v3 1.498x flag sat on a diff-empty
# path because min-of-2 with a FIXED side order lacks the resolution to
# separate a real move from within-session drift on 5-30s queries.  These
# entries get THREE interleaved pairs with the within-pair side order
# alternating (head-first on odd pairs, ref-first on even — monotone
# drift then cancels between sides instead of loading whichever side
# always ran second), and their ratio is scored from the per-side MEDIAN
# (the min-of-N estimator is biased when per-run variance trends within
# a session — the r13 FilterByTopic 1.663-on-identical-code lesson).
ISOLATED_AB = {
    "pipeline_curate_corpus_v3",
    "pipeline_curate_corpus_v4",
    "pipeline_curate_corpus_v5",
    "dedup_minhash_lsh_pairs",
    "embed_semantic_dedup",
    "dedup_substrings_global",
    # 10s+ multimodal entries: same heavy treatment from day one
    "dedup_audio_fingerprint_pairs",
    "dedup_video_nearpairs",
    # r16 (VERDICT r15 #4): 12 s raw in the r15 run — heavy-entry tier
    "dedup_simhash_pairs",
}


class _Side:
    """One code version's importable module set."""

    def __init__(self, root: str):
        self.root = root
        self.modules: dict | None = None

    def _purge(self) -> dict:
        import sys as _sys

        out = {}
        for m in list(_sys.modules):
            if m == "outpost_spark" or m.startswith("outpost_spark."):
                out[m] = _sys.modules.pop(m)
        return out

    def load(self):
        """Import this side's catalog (capturing its module dict) and
        return its query registry.  Leaves sys.modules as found."""
        import sys as _sys

        saved = self._purge()
        _sys.path.insert(0, self.root)
        try:
            import outpost_spark.queries_catalog as qc  # noqa: F401

            self.registry = qc.queries()
            self.modules = self._purge()
        finally:
            _sys.path.remove(self.root)
            _sys.modules.update(saved)
        return self.registry

    def activate(self):
        import sys as _sys

        self._purge()
        _sys.modules.update(self.modules)

    def register_by_value(self):
        try:
            from pyspark import cloudpickle
        except ImportError:
            return
        for mod in self.modules.values():
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass

    def unregister_by_value(self):
        try:
            from pyspark import cloudpickle
        except ImportError:
            return
        for mod in self.modules.values():
            try:
                cloudpickle.unregister_pickle_by_value(mod)
            except Exception:
                pass


def _resolve_ab_ref() -> str | None:
    import subprocess

    env = os.environ.get("SPARK_GRAFT_AB_REF")
    if env == "off":
        return None
    if env:
        return env
    try:
        out = subprocess.run(
            ["git", "log", "-n1", "--grep", r"^round [0-9]*: verdict",
             "--format=%H"],
            capture_output=True, text=True, timeout=30,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        rev = out.stdout.strip().splitlines()
        return rev[0] if rev else None
    except Exception:
        return None


def _materialize_rev(rev: str) -> str | None:
    """git-archive ``outpost_spark/`` at ``rev`` into a temp dir."""
    import io
    import subprocess
    import tarfile
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "archive", rev, "outpost_spark"],
            capture_output=True, timeout=60, cwd=repo,
        )
        if out.returncode != 0:
            return None
        dest = tempfile.mkdtemp(prefix="bench-ab-")
        with tarfile.open(fileobj=io.BytesIO(out.stdout)) as tf:
            tf.extractall(dest)
        return dest
    except Exception:
        return None


def run_ab(spark, sf_dir: str) -> dict | None:
    rev = _resolve_ab_ref()
    if rev is None:
        return None
    root = _materialize_rev(rev)
    if root is None:
        return None
    import gc
    import sys as _sys

    head = _Side(os.path.dirname(os.path.abspath(__file__)))
    ref = _Side(root)
    try:
        ref_reg = ref.load()
    except Exception:
        return None
    head_reg = head.load()
    ratios: dict[str, float] = {}
    detail: dict[str, dict] = {}
    from statistics import median

    for name in AB_QUERIES:
        if name not in ref_reg or name not in head_reg:
            continue  # new this round: no ref twin
        times = {"ref": [], "head": []}
        pairs = 3 if name in ISOLATED_AB else 2
        try:
            for i in range(pairs):
                order = (
                    ("head", head, head_reg), ("ref", ref, ref_reg)
                ) if i % 2 else (
                    ("ref", ref, ref_reg), ("head", head, head_reg)
                )
                for side_name, side, reg in order:
                    side.activate()
                    if side_name == "ref":
                        side.register_by_value()
                    try:
                        t0 = time.perf_counter()
                        reg[name](spark, sf_dir).collect()
                        times[side_name].append(time.perf_counter() - t0)
                    finally:
                        if side_name == "ref":
                            side.unregister_by_value()
                    gc.collect()
        except Exception as e:
            detail[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        # isolated (5s+) entries: median-of-3 per side — min-of-N is
        # biased when per-run time trends within the session; everything
        # else keeps the historical min-of-2 so ratios stay comparable
        score = median if name in ISOLATED_AB else min
        r, h = score(times["ref"]), score(times["head"])
        ratios[name] = round(h / r, 3) if r > 0 else float("nan")
        detail[name] = {
            "ref": round(r, 4),
            "head": round(h, 4),
            "ref_runs": [round(x, 4) for x in times["ref"]],
            "head_runs": [round(x, 4) for x in times["head"]],
            "score": "median" if name in ISOLATED_AB else "min",
        }
    head.activate()  # leave HEAD modules installed
    _sys.path[:] = [p for p in _sys.path if p != root]
    return {"ref_rev": rev, "ratios": ratios, "detail": detail}


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
    ab = None
    try:
        ab = run_ab(spark, sf_dir)
    except Exception:
        ab = None
    # VERDICT r15 #3: a smoke run at another SF/cpu count must not clobber
    # the committed canonical artifact — only the canonical config
    # (sf0.1 / 32 cpus) writes BENCH_DETAIL.json; any other run writes a
    # config-suffixed sibling.  SPARK_GRAFT_BENCH_DETAIL overrides both.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    detail_name = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or (
        "BENCH_DETAIL.json"
        if (sf == 0.1 and cpus == "32")
        else f"BENCH_DETAIL.sf{sf}.c{cpus}.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "queries_warm": warm,
                "queries_cold": cold,
                "warm_total": round(sum(warm.values()), 4),
                "cold_total": round(sum(cold.values()), 4),
                "sf": sf,
                "ab": ab,
            },
            fh,
            indent=1,
        )
    # the machine-readable summary is the LAST line on stdout, compact
    # (warm map only, no whitespace) so the driver's tail capture always
    # holds the full JSON object
    summary = {
        "metric": "catalog_bench_total",
        "value": round(sum(warm.values()), 4),
        "unit": "sec",
        "queries": warm,
        "sf": sf,
    }
    if ab is not None:
        # ratios only (head/ref warm min-of-2, interleaved same-session) —
        # full per-side timings live in BENCH_DETAIL.json
        summary["ab"] = {"ref_rev": ab["ref_rev"][:12], "ratios": ab["ratios"]}
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
