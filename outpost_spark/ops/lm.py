"""Corpus-trained n-gram language-model scoring — the CCNet-style
perplexity gate (Wenzek et al. 2020): train token statistics on a
reference slice of the corpus, score every document by its average
bigram log-probability, and filter/stratify on the score.

Spark-first shape: the model IS a DataFrame (token and bigram count
tables), scoring is three equi-joins on token keys plus one per-doc
aggregation — no Python anywhere, and the model never has to fit on
one machine (CCNet's KenLM does; a 100 TB corpus' bigram table does
not).  Hot-token join skew ("the" joins against half the corpus) is
the classic AQE skew-join case — these are real joins, so adaptive
splitting applies (unlike window skew, cf. ops/joins.py).

Determinism/parity: log-probs are rounded to a fixed scale and summed
as DECIMAL, so per-doc scores are independent of partition/accumulation
order and reproduce bit-for-bit in any engine with ln() — the DuckDB
oracle recomputes the whole model in SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import tokens_expr

# fixed rounding scales shared with the SQL oracle: 6 decimals on each
# bigram log-prob (kills sub-ulp ln() differences between engines),
# DECIMAL sums keep the per-doc aggregation order-independent.
_LP_SCALE = 6
_LP_DECIMAL = "decimal(24,6)"


def doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, whitespace
    tokenization (lowercased); documents with < 2 tokens contribute no
    rows.

    Built with ``zip_with(toks, toks[2:])`` — both array arguments
    evaluate ONCE PER ROW.  The previous ``transform`` +
    ``element_at(toks, i+2)`` form re-evaluated the whole
    split-and-filter tokenization PER ELEMENT inside the interpreted
    lambda (higher-order functions don't CSE the captured expression):
    O(tokens^2) splits per document, measured as 6.2 s of a 7.8 s
    sf0.1 model build.  ``zip_with`` pads the shorter side with NULL, so
    the final (w_n, NULL) pair is filtered; real tokens are never NULL
    (empties are filtered by tokens_expr)."""
    toks = tokens_expr(F.col(text_col))
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    pairs = F.zip_with(
        toks, tail, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )


class EmptyTrainingSliceError(ValueError):
    """The LM training slice produced zero tokens — no model can be
    built.  Raised (not NULL-propagated) so callers choose a policy:
    :func:`perplexity_gate` passes every document through, matching its
    own "unscoreable docs are kept" contract (ADVICE r07)."""


def train_bigram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    materialize: bool = True,
    doc_bigrams_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Token and bigram count tables from a training slice.

    Returns (unigrams(w, c1), bigrams(w1, w2, c12), n_tokens_total).
    Both aggregations are partial-combined map-side, so the shuffles are
    vocabulary-sized (distinct tokens / distinct pairs), never
    corpus-sized.  ``n_tokens_total`` is the only driver-side scalar.

    ``materialize`` (default) localCheckpoints both count tables —
    they're vocabulary-sized, and the scoring plan references unigrams
    TWICE (w1 and w2 sides) plus bigrams once, so uncached lineage would
    re-scan and re-tokenize the training text three more times at
    execution (ADVICE r06).  Together with doc_bigrams' zip_with fix
    the sf0.1 catalog entry went 7.8 -> 2.2 s warm.

    ``doc_bigrams_df`` (optional) supplies a precomputed
    :func:`doc_bigrams` frame over the SAME ``df`` — the self-scoring
    path materializes the (id, w1, w2) stream once and shares it between
    the count build here and the scoring join (r16, guide §2.4: the
    bigram tokenization was the one full-corpus subtree still executed
    twice per self-scored entry).
    """
    toks = df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    db = (
        doc_bigrams_df
        if doc_bigrams_df is not None
        else doc_bigrams(df, text_col, id_col)
    )
    bigrams = db.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if materialize:
        unigrams = unigrams.localCheckpoint(eager=True)
        bigrams = bigrams.localCheckpoint(eager=True)
    # N from the unigram table's own aggregate — one job (free against
    # the checkpointed table), and one fewer tokenization pass than a
    # separate toks.count() (ADVICE r06)
    row = unigrams.agg(F.sum("c1")).first()
    n_total = int(row[0] or 0)
    if n_total == 0:
        raise EmptyTrainingSliceError(
            "LM training slice has zero tokens — the backoff term would "
            "divide by N=0 (NULL scores non-ANSI, runtime error ANSI); "
            "pass a non-empty train_df"
        )
    return unigrams, bigrams, n_total


def bigram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None = None,
    alpha: float = 0.4,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document average bigram log-probability under a
    stupid-backoff LM (Brants et al. 2007) trained on ``train_df``
    (default: ``df`` itself — self-scoring, the CCNet bootstrap):

        S(w2 | w1) = c(w1,w2) / c(w1)          if c(w1,w2) > 0
                   = alpha * c(w2) / N          otherwise
        score(d)  = avg over d's bigrams of ln S;  ppl-like = -score

    Output: (id, n_bigrams, lm_score, lm_ppl) where lm_score is the
    rounded average log-prob (NULL for docs with < 2 tokens) and
    lm_ppl = exp(-lm_score) — TRUE perplexity, the geometric-mean
    inverse probability per bigram (higher = more surprising = more
    likely junk; same units as CCNet's published KenLM thresholds, so
    ``perplexity_gate(max_ppl=...)`` is tuned on the familiar scale —
    ADVICE r06 renamed this from the misleading negated-log value).
    Unseen w2 (zero corpus count) floors at ln(alpha * 1 / N) — the
    standard OOV clamp, shared by the oracle.

    Scale shape: the doc-bigram stream joins the count tables on token
    keys — shuffle joins by default (the model at web scale is far past
    broadcast size; pass ``broadcast_model=True`` for small reference
    models) with AQE skew splitting on hot tokens; the per-doc
    aggregation sums fixed-scale DECIMALs, so the score is independent
    of accumulation order.  Text is dropped before the first shuffle —
    only (id, w1, w2) triples move.
    """
    scored = _bigram_scores_present(
        df, text_col, id_col, train_df=train_df, alpha=alpha,
        broadcast_model=broadcast_model, materialize_bigrams=True,
    )
    # docs with < 2 tokens have no bigram rows: re-attach with NULL score
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("bigint")).alias("n_bigrams"),
            "lm_score",
            "lm_ppl",
        )
    )


def _bigram_scores_present(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None,
    alpha: float,
    broadcast_model: bool = False,
    materialize_bigrams: bool = False,
) -> DataFrame:
    """Scores for the documents that HAVE bigrams — the shared core of
    :func:`bigram_lm_score` (which left-joins the short docs back in as
    NULL rows) and :func:`perplexity_gate` (whose own left join against
    ``df`` makes that re-attach pass redundant: an absent id IS a NULL
    score, so materializing the NULL rows first just re-scans ``df``).

    ``materialize_bigrams`` (self-scoring only): localCheckpoint the
    (id, w1, w2) stream so the tokenize+zip_with+explode subtree runs
    once instead of once per consumer (r16, guide §2.4/§5).  ON for the
    standalone scorer, whose ``df`` is a raw parquet lineage (A/B 0.83);
    OFF for :func:`perplexity_gate`, whose callers (curate v5/v6) feed
    an already-checkpointed slice — there the saved recompute is cheap
    and the extra materialization measured SLOWER (v5 A/B 1.38)."""
    if train_df is None and materialize_bigrams:
        db = doc_bigrams(df, text_col, id_col).localCheckpoint(eager=True)
        unigrams, bigrams, n_total = train_bigram_counts(
            df, text_col, id_col, doc_bigrams_df=db
        )
    else:
        db = doc_bigrams(df, text_col, id_col)
        unigrams, bigrams, n_total = train_bigram_counts(
            train_df if train_df is not None else df, text_col, id_col
        )
    if broadcast_model:
        unigrams, bigrams = F.broadcast(unigrams), F.broadcast(bigrams)
    n_lit = F.lit(float(n_total))

    joined = (
        db.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c_w1"), "w1", "left")
        .join(
            unigrams.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c_w2"),
            "w2",
            "left",
        )
    )
    backoff = F.lit(alpha) * F.greatest(
        F.coalesce(F.col("c_w2").cast("double"), F.lit(0.0)), F.lit(1.0)
    ) / n_lit
    s = F.when(
        F.col("c12").isNotNull() & F.col("c_w1").isNotNull(),
        F.col("c12").cast("double") / F.col("c_w1").cast("double"),
    ).otherwise(backoff)
    lp = F.round(F.log(s), _LP_SCALE).cast(_LP_DECIMAL)
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum(lp).alias("__lp_sum")
    )
    # cast the exact DECIMAL sum to double BEFORE dividing: decimal/int
    # result scales differ across engines, double division does not
    score = F.round(
        F.col("__lp_sum").cast("double") / F.col("n_bigrams"), _LP_SCALE
    )
    # true perplexity from the already-rounded score, re-rounded at the
    # same scale: both engines exponentiate the identical rounded double
    ppl = F.round(F.exp(-score), _LP_SCALE)
    return per_doc.select(
        id_col,
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        score.alias("lm_score"),
        ppl.alias("lm_ppl"),
    )


def perplexity_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None = None,
    max_ppl: float,
    alpha: float = 0.4,
) -> DataFrame:
    """Filter documents whose LM perplexity exceeds ``max_ppl`` — CCNet's
    head/middle/tail cut reduced to its filtering core.  ``max_ppl`` is
    denominated in TRUE perplexity units (``exp`` of the negated average
    bigram log-prob — dimensionally what CCNet thresholds KenLM scores
    in), NOT a raw log value.  Documents too short to score (no bigrams)
    are kept, as CCNet does; tune with the histogram of
    ``bigram_lm_score``'s ``lm_ppl`` output.

    An EMPTY training slice (e.g. curate_corpus_v5 self-training on a
    quality-passing slice that passed nothing) is the degenerate case of
    "nothing is scoreable": every document passes through ungated, the
    same policy as too-short docs — instead of propagating
    :class:`EmptyTrainingSliceError` and crashing the pipeline on a
    corpus the earlier gates emptied (ADVICE r07)."""
    try:
        # scores for bigram-bearing docs only: the left join below maps an
        # absent id to a NULL score — identical rows to joining the full
        # bigram_lm_score output, minus its own re-attach pass over ``df``
        scored = _bigram_scores_present(
            df, text_col, id_col, train_df=train_df, alpha=alpha
        ).select(id_col, "lm_ppl")
    except EmptyTrainingSliceError:
        return df
    return (
        df.join(scored, id_col, "left")
        .filter(F.col("lm_ppl").isNull() | (F.col("lm_ppl") <= max_ppl))
        .drop("lm_ppl")
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None = None,
    alpha: float = 0.4,
    cuts: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split proper (Wenzek et al. 2020 §4.4):
    documents bucketed by LM perplexity percentile — "head" is the most
    fluent third, "tail" the most surprising, and downstream training
    mixes sample the buckets at different rates.  Completes the CCNet
    surface next to :func:`perplexity_gate`'s single-threshold cut.

    Scale shape — deliberately NOT a global ``ntile`` (a single-
    partition window is a serial bottleneck at corpus scale): the cut
    THRESHOLDS come from one exact-percentile aggregate over the
    (id, ppl) frame (CCNet itself computes cutoffs once, on a sample),
    rounded to the same 6-decimal scale the scores carry so the
    DuckDB oracle lands every boundary document in the same bucket;
    assignment is then a broadcast-free codegen comparison.  Documents
    too short to score get the explicit ``unscored`` bucket (CCNet
    keeps them out of the percentile basis).

    Output: (id, lm_ppl, ppl_bucket).
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels, got {len(cuts)} cuts / {len(labels)} labels"
        )
    scored = bigram_lm_score(
        df, text_col, id_col, train_df=train_df, alpha=alpha
    ).select(id_col, "lm_ppl")
    scored = scored.localCheckpoint(eager=True)  # scoring runs ONCE, not per use
    pcts = ", ".join(repr(c) for c in cuts)
    row = scored.filter(F.col("lm_ppl").isNotNull()).agg(
        F.expr(f"percentile(lm_ppl, array({pcts}))").alias("t")
    ).first()
    thresholds = [round(float(t), _LP_SCALE) for t in (row["t"] or [])]
    bucket = F.when(F.col("lm_ppl").isNull(), F.lit("unscored"))
    for t, lab in zip(thresholds, labels):
        bucket = bucket.when(F.col("lm_ppl") <= F.lit(t), F.lit(lab))
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return scored.select(id_col, "lm_ppl", bucket.alias("ppl_bucket"))
