"""End-to-end corpus curation: the composed pipeline a training-data run
executes — quality gate -> language gate -> [paragraph-level dedup] ->
exact dedup -> near-dup collapse -> deterministic split assignment.

Each stage is one of the standalone operators from this package; the
composition exists so the whole chain is exercised (and oracle-checked)
as a single plan, the way a real curation job would run it.  The
paragraph stage (``paragraph_sep``) mirrors the C4/RefinedWeb ordering:
boilerplate paragraphs are stripped globally BEFORE document-level
near-dup detection, so two documents differing only in shared
boilerplate collapse correctly.

Scale design (100 TB):
- The quality/language gates are pure Column expressions fused into the
  scan — rejected documents never reach a shuffle.
- Paragraph dedup's first-occurrence decision runs over (hash, id, pos)
  triples; document text never enters its shuffles (see
  ``dedup.dedup_paragraphs``).
- Exact dedup shuffles surviving rows once, keyed by content digest
  (min-id-per-digest window).  Near-dup detection then operates on the
  exact-deduped corpus (strictly smaller), and its LSH join shuffles
  (bucket, id) pairs only.
- The final split stamp is a map; the survivor anti-join's right side is
  the (sparse) near-dup loser set.

Eager-execution side effect: every ``curate_corpus*`` builder
materializes its reuse joints with ``localCheckpoint(eager=True)``
(the exact-dedup frame in v1/v3, the quality slice in v5, the
``enriched``/``kept`` joints in v6) — calling a builder therefore runs
Spark jobs at construction time, before any action on the returned
frame.  ``localCheckpoint`` stores those joints in executor-local,
non-replicated storage: on a multi-node cluster an executor loss makes
them unrecoverable (no lineage to replay) — see SCALE.md for the
measured localCheckpoint-vs-persist(DISK_ONLY) decision and when to
prefer a reliable checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import (
    dedup_keep_canonical,
    dedup_paragraphs,
    dedup_substrings,
    minhash_dedup_pairs,
)
from outpost_spark.ops.sampling import hash_split
from outpost_spark.ops.text import (
    language_id_expr,
    normalize_url_expr,
    quality_score_expr,
)

DEFAULT_SPLITS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
DEFAULT_LANGS = ("en", "de", "fr", "es")


def _min_id_losers(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Ids that are NOT the minimum ``id_col`` of their ``key`` group —
    the drop side of a keep-first dedup, decided over (id, key) pairs
    ONLY (r16, guide §2.3/§8: the keep-first decision needs no payload,
    so the window shuffles a narrow projection instead of full rows; the
    caller re-attaches the decision with a broadcast left-anti join, so
    document text never enters an exchange).

    The loser set is the duplicate instances only — small at realistic
    dup rates, hence broadcast-friendly; a pathological corpus that is
    mostly duplicates would want the anti-join unhinted (ids vs text on
    the small side), the same documented tradeoff as
    ``dedup_paragraphs(broadcast_removed=False)``.
    """
    w = Window.partitionBy("__k")
    return (
        df.select(F.col(id_col), key.alias("__k"))
        .withColumn("__min", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__min"))
        .select(id_col)
    )


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    near_dup_threshold: float = 0.7,
    splits: list[tuple[str, float]] | None = None,
    split_seed: str = "curate",
    hash_fn: str = "md5",
    paragraph_sep: str | None = None,
) -> DataFrame:
    """Run the full curation chain; returns (id_col, split) for the kept
    corpus.

    ``hash_fn="xxhash64"`` switches the MinHash base hash and the split
    hash to the Spark-native production path (same pipeline shape, no SQL
    oracle).  ``paragraph_sep`` enables the paragraph-level dedup stage:
    repeated paragraphs are removed globally (first (doc, pos) occurrence
    survives), documents are rebuilt from their surviving paragraphs, and
    documents left empty are dropped — all downstream stages then operate
    on the cleaned text.
    """
    base = docs.filter(
        (quality_score_expr(F.col(text_col)) >= quality_min)
        & (language_id_expr(F.col(text_col)).isin(*langs))
    )
    if paragraph_sep is not None:
        cleaned = dedup_paragraphs(base, text_col, id_col, sep=paragraph_sep)
        base = cleaned.filter(F.col("text_clean") != "").select(
            F.col(id_col), F.col("text_clean").alias(text_col)
        )
    # materialize the gated (and paragraph-cleaned) corpus ONCE: it
    # feeds the exact-dedup decision, the MinHash gram pass and the
    # survivor anti-join, and each reference would otherwise replay the
    # whole gate/dedup chain above (same tradeoff as
    # minhash_dedup_pairs' checkpointed gram frame).
    base = base.localCheckpoint(eager=True)
    # exact canonical: min id per content digest, decided over
    # (id, 16-byte digest) pairs only and re-attached with a broadcast
    # anti-join (r16, guide §2.3/§8) — the previous window over
    # partitionBy(md5(text)) shuffled every surviving document's full
    # text by digest to make a decision that needs none of it.
    exact = base.join(
        F.broadcast(_min_id_losers(base, F.unhex(F.md5(F.col(text_col))), id_col)),
        id_col,
        "left_anti",
    )
    pairs = minhash_dedup_pairs(
        exact, id_col, text_col, threshold=near_dup_threshold, hash_fn=hash_fn
    )
    survivors = dedup_keep_canonical(exact, pairs, id_col)
    return hash_split(
        survivors, id_col, splits or DEFAULT_SPLITS, seed=split_seed, hash_fn=hash_fn
    ).select(id_col, "split")


def curate_corpus_v3(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    quality_min: float = 0.5,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    paragraph_sep: str = "\n",
    substring_window: int = 40,
    substring_stride: int = 1,
    near_dup_threshold: float = 0.7,
    splits: list[tuple[str, float]] | None = None,
    split_seed: str = "curate",
    hash_fn: str = "md5",
) -> DataFrame:
    """The full modern curation ordering — coarse-to-fine dedup
    granularity, each stage shrinking the next stage's input:

    URL dedup -> quality gate -> language gate -> global paragraph dedup
    -> global substring dedup -> exact dedup -> MinHash near-dup collapse
    -> split assignment.

    Ordering rationale: URL dedup runs FIRST (the crawl-frontier step —
    it needs no text, so duplicated fetches never even pay the gates);
    paragraph dedup strips shared boilerplate so substring dedup sees it
    once; substring dedup (Lee et al. granularity) cuts sub-paragraph
    repetition so near-dup signatures are computed over genuinely novel
    text; exact + MinHash run last on the strictly smallest corpus.
    Documents emptied by paragraph or substring cutting drop out.

    Returns (id_col, split) for the kept corpus.
    """
    base = docs
    if url_col is not None:
        # URL keep-first over (id, normalized url) pairs + broadcast
        # anti-join (r16, guide §2.3/§8): the previous window over
        # partitionBy(normalize_url(url)) shuffled every document's full
        # text by URL; the narrow pass also lets the scan prune the text
        # column entirely on the decision side.
        base = base.join(
            F.broadcast(
                _min_id_losers(base, normalize_url_expr(F.col(url_col)), id_col)
            ),
            id_col,
            "left_anti",
        )
    base = base.filter(
        (quality_score_expr(F.col(text_col)) >= quality_min)
        & (language_id_expr(F.col(text_col)).isin(*langs))
    ).select(id_col, text_col)
    # materialize the gate output ONCE (r16, guide §5): it feeds the
    # paragraph narrow pass and — through the substring stage's two
    # sides (window pass + join-back) — the paragraph rebuild twice;
    # un-checkpointed, the URL dedup + quality/language gates re-ran
    # three times per v3 evaluation (measured ~1.3 s per pass at sf0.1).
    base = base.localCheckpoint(eager=True)
    cleaned = dedup_paragraphs(base, text_col, id_col, sep=paragraph_sep)
    base = cleaned.filter(F.col("text_clean") != "").select(
        F.col(id_col), F.col("text_clean").alias(text_col)
    )
    cut = dedup_substrings(
        base, text_col, id_col, window=substring_window, stride=substring_stride
    )
    base = cut.filter(F.col("text_clean") != "").select(
        F.col(id_col), F.col("text_clean").alias(text_col)
    )
    # materialize the substring-cut corpus once (replaces the old
    # post-exact checkpoint): the exact-dedup decision, the MinHash gram
    # pass and the survivor anti-join all read it — and the exact
    # canonical decision itself is now narrow (id, 16-byte digest) +
    # broadcast anti-join instead of a window that shuffled the full
    # text by digest (r16, guide §2.3/§8).
    base = base.localCheckpoint(eager=True)
    exact = base.join(
        F.broadcast(_min_id_losers(base, F.unhex(F.md5(F.col(text_col))), id_col)),
        id_col,
        "left_anti",
    )
    pairs = minhash_dedup_pairs(
        exact, id_col, text_col, threshold=near_dup_threshold, hash_fn=hash_fn
    )
    survivors = dedup_keep_canonical(exact, pairs, id_col)
    return hash_split(
        survivors, id_col, splits or DEFAULT_SPLITS, seed=split_seed, hash_fn=hash_fn
    ).select(id_col, "split")


def curate_corpus_v5(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    max_ppl: float = 31.0,
    alpha: float = 0.4,
    splits: list[tuple[str, float]] | None = None,
    split_seed: str = "curate",
) -> DataFrame:
    """The CCNet-ordered curation chain (Wenzek et al. 2020), r07's
    completion of the v-series with the statistical LM gate:

    mojibake repair -> quality gate -> bigram-LM perplexity gate
    (self-trained on the quality-passing slice, true-perplexity
    threshold) -> exact dedup -> deterministic split assignment.

    Ordering rationale: encoding repair runs FIRST (mojibake inflates
    symbol ratios and token lengths, biasing every later gate and
    inflating the LM's vocabulary with corrupt tokens); the LM trains on
    the quality-passing slice only (CCNet trains on a trusted corpus —
    junk in the training slice would teach the model that junk is
    normal, cf. the self-scoring pathology pinned in tests/test_lm_c4);
    dedup runs after the gates on the strictly smallest corpus; the
    split stamp is a pure map.  Returns (id_col, split).

    Every stage is an independently-oracled operator (text_fix_mojibake,
    text_quality_score, lm_bigram_score, dedup_exact_documents,
    sample_hash_split); the catalog entry pins the COMPOSITION
    end-to-end against one DuckDB oracle, v3/v4's lesson applied to the
    round's LM operators.
    """
    from outpost_spark.ops.dedup import _parallelize_narrow_input
    from outpost_spark.ops.lm import perplexity_gate
    from outpost_spark.ops.text import fix_mojibake

    # the repair + quality stage is CPU-bound codegen over full text; a
    # single-file corpus scan would pin it (and the checkpoint build
    # below) to one core — same guard as the minhash signature pass
    docs = _parallelize_narrow_input(docs.select(id_col, text_col))
    fixed = fix_mojibake(docs, text_col, id_col).select(
        F.col(id_col), F.col("fixed_text").alias(text_col)
    )
    base = fixed.filter(quality_score_expr(F.col(text_col)) >= quality_min)
    # materialize the quality-passing slice ONCE: the self-scoring gate
    # reads it four times (unigram + bigram model builds, the scoring
    # bigram stream, and the gate's own re-attach join), and each read
    # would otherwise re-run the mojibake replace chain + quality gate
    # over the full corpus.  The slice is the strictly-smallest text
    # frame in the pipeline (same tradeoff as minhash_dedup_pairs'
    # checkpointed gram frame); measured 2x on the sf0.1 entry.
    base = base.localCheckpoint(eager=True)
    gated = perplexity_gate(
        base, text_col, id_col, max_ppl=max_ppl, alpha=alpha
    )
    w = Window.partitionBy(F.md5(F.col(text_col)))
    exact = (
        gated.withColumn("__cmin", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__cmin"))
        .drop("__cmin")
    )
    return hash_split(
        exact, id_col, splits or DEFAULT_SPLITS, seed=split_seed
    ).select(id_col, "split")


def curate_corpus_v6(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    weight_col: str = "n_chars",
    quality_min: float = 0.5,
    max_ppl: float = 31.0,
    alpha: float = 0.4,
    split_seed: str = "curate",
    mix_target: float = 300.0,
    mix_alpha: float = 0.5,
    token_budget: int = 120_000,
    n_shards: int = 8,
    sub_buckets: int = 64,
) -> DataFrame:
    """The full training-set assembly capstone (r08): v5's CCNet-ordered
    cleaning cascade, then the sampling/packaging chain a training job
    runs on the cleaned corpus —

    mojibake repair -> quality gate -> self-trained bigram-LM
    perplexity gate -> exact dedup -> 90/5/5 split -> KEEP train ->
    temperature-flattened language mixing (mT5/XLM-R rule) ->
    token-budget prefix cut -> deterministic shard shuffle ->
    per-shard bounded two-level manifests.

    Returns the MANIFEST table (shard, n_docs, mass, ids_checksum) —
    the artifact a training job actually consumes to verify its shards
    before the first step.  Every stage is an independently-oracled
    operator; the catalog entry pins the COMPOSITION end-to-end in one
    DuckDB oracle (the v3/v4/v5 lesson applied to the whole chain).

    Scale shape: the cascade's gates fuse into the scan, the LM model
    is a pair of vocabulary-sized count tables, the mix rate table is
    #languages rows broadcast back, the budget cut sorts only its
    boundary bucket, the shard stamp is a pure map, and the manifest's
    aggregation state is bounded by ``sub_buckets`` — no stage holds
    corpus-sized state anywhere.
    """
    from outpost_spark.ops.sampling import (
        assign_shuffled_shards,
        sample_by_token_budget,
        sample_temperature_mix,
        shard_manifest,
    )

    cleaned = curate_corpus_v5(
        docs,
        id_col=id_col,
        text_col=text_col,
        quality_min=quality_min,
        max_ppl=max_ppl,
        alpha=alpha,
        split_seed=split_seed,
    )
    train = cleaned.filter(F.col("split") == "train").select(id_col)
    # materialize the two narrow composition joints (r15, guide §5):
    # ``enriched`` (id, lang, weight) is read by the temperature mixer's
    # domain aggregate AND its final rate join, and — through ``mixed`` —
    # by the token-budget sampler's bucket-totals collect() and its kept
    # filter; ``kept`` (id, weight) is read by the shard stamp and the
    # manifest join.  Un-checkpointed, every one of those references
    # replays the v5 cleaning cascade's post-checkpoint tail (the
    # perplexity-gate joins + exact-dedup window) — the 124-Exchange
    # plan this entry used to produce.
    enriched = train.join(
        docs.select(id_col, lang_col, weight_col), id_col
    ).localCheckpoint(eager=True)
    mixed = sample_temperature_mix(
        enriched, lang_col, id_col, target_total=mix_target, alpha=mix_alpha
    )
    kept = sample_by_token_budget(
        mixed, id_col, weight_col, token_budget
    ).localCheckpoint(eager=True)
    sharded = assign_shuffled_shards(
        kept.select(id_col), id_col, n_shards=n_shards
    ).join(kept, id_col)
    return shard_manifest(
        sharded,
        "shard",
        id_col,
        weight_col=weight_col,
        sub_buckets=sub_buckets,
    )
