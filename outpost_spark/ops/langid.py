"""Trained character-n-gram language identification — the
model-as-DataFrame pattern (:mod:`ops.lm`) applied to language ID
(VERDICT r08 task #7).

Algorithm: multinomial Naive Bayes over character n-grams, the classic
langid recipe (Cavnar & Trenkle 1994 n-gram profiles; langid.py's NB
formulation).  Everything is DataFrames:

- TRAIN: explode char n-grams of the labeled corpus, count per
  (lang, gram) — the only corpus-sized pass, map-side combined down to
  vocabulary size; select the ``top_k`` grams by total count (the
  feature set, bounded, deterministic ties); Laplace-smooth per-lang
  gram probabilities over that vocabulary into a (gram, lang, lp) GRID
  plus (lang, prior) — model-sized tables (top_k × n_langs rows), never
  collected, broadcast to the scorer.
- SCORE: per-doc n-gram counts (one groupBy, compressing repeats before
  any join) ⨝ broadcast model, sum n·lp per (doc, lang), add the prior,
  argmax.  Out-of-vocabulary grams drop (standard feature-selection
  behavior); docs with zero in-vocab grams fall back to 'und'.

Determinism across engines (the DuckDB oracle re-derives the model in
CTEs): log-probs round to 6 decimals and sum as DECIMAL(24,6) — exact,
order-independent — and the argmax tie-breaks on (score, lang), so both
engines pick the identical label bit-for-bit.

Scale: at 100 TB the gram histogram shuffles vocabulary-sized partial
counts, the scorer shuffles (doc, gram, n) triples once into a
broadcast join — text never moves after the explode, the model never
exceeds top_k × n_langs rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LP_SCALE = 6
_LP_DECIMAL = "decimal(24,6)"


def char_ngrams_expr(t: Column, n: int) -> Column:
    """All overlapping character ``n``-grams of (lowercased) ``t`` as an
    array column — pure codegen, no UDF."""
    low = F.lower(t)
    # sequence(1, stop) runs DESCENDING when stop < 1 (Spark generates
    # [1, 0]) — docs shorter than n must yield an EMPTY gram array
    idx = F.when(
        F.length(low) >= n,
        F.sequence(F.lit(1), F.length(low) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: low.substr(i, F.lit(n)))


def train_char_ngram_lid(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    n: int = 3,
    top_k: int = 2000,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Labeled corpus -> (model(gram, lang, lp), priors(lang, prior)).

    ``lp = round(ln((c(gram, lang) + 1) / (tot(lang) + V)), 6)`` over
    the selected top-``top_k`` vocabulary (V = its actual size;
    Laplace), ``prior = round(ln(n_docs(lang) / n_docs), 6)`` — both as
    the exact-decimal grid the scorer and the SQL oracle share."""
    grams = df.select(
        F.col(label_col).alias("lang"),
        F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram"),
    )
    cnt = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        # the feature cut, totals, and grid all reference cnt — one
        # tokenize+count pass instead of three (the ops/lm.py lesson)
        cnt = cnt.localCheckpoint(eager=True)
    feat = (
        cnt.groupBy("gram")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), F.asc("gram"))
        .limit(top_k)
        .select("gram")
    )
    sel = cnt.join(F.broadcast(feat), "gram")
    tot = sel.groupBy("lang").agg(F.sum("c").alias("t"))
    langs = df.groupBy(F.col(label_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    v = feat.count()  # driver scalar, <= top_k by construction
    # model grid: every (selected gram, lang) cell — crossJoin is
    # BOUNDED here (top_k × n_langs rows), it IS the model, not data
    grid = (
        feat.crossJoin(langs.select("lang"))
        .join(sel, ["gram", "lang"], "left")
        .join(tot, "lang", "left")
        .select(
            "gram",
            "lang",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("t"), F.lit(0)) + F.lit(v)).cast(
                        "double"
                    )
                ),
                _LP_SCALE,
            )
            .cast(_LP_DECIMAL)
            .alias("lp"),
        )
    )
    n_docs = df.count()
    priors = langs.select(
        "lang",
        F.round(F.log(F.col("nd").cast("double") / F.lit(float(n_docs))), _LP_SCALE)
        .cast(_LP_DECIMAL)
        .alias("prior"),
    )
    if materialize:
        grid = grid.localCheckpoint(eager=True)
        priors = priors.localCheckpoint(eager=True)
    return grid, priors


def quality_trained(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None = None,
    n: int = 3,
    top_k: int = 2000,
) -> DataFrame:
    """Self-distilled quality model: the Gopher rule set
    (ops/text.py::gopher_quality — the expensive regex battery) labels
    the training slice pass/fail, and the char-n-gram NB learns each
    class's character statistics.  The trained model is the FAST gate
    (broadcast join + argmax) for corpus-wide scoring while the rule
    battery runs on samples — the standard distillation shape for
    heuristic quality filters.  Output: (id, quality_pred) in
    {'pass', 'fail', 'und'} ('und' = no in-vocab grams)."""
    from outpost_spark.ops.text import gopher_quality

    def labeled(frame: DataFrame) -> DataFrame:
        labels = gopher_quality(frame, text_col, id_col).select(
            id_col,
            F.when(F.col("passes_gopher"), F.lit("pass"))
            .otherwise(F.lit("fail"))
            .alias("__q"),
        )
        return frame.select(id_col, text_col).join(labels, id_col)

    out = language_id_trained(
        df,
        text_col,
        id_col,
        train_df=labeled(train_df if train_df is not None else df),
        label_col="__q",
        n=n,
        top_k=top_k,
    )
    return out.select(id_col, F.col("lang_pred").alias("quality_pred"))


def language_id_trained(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    train_df: DataFrame | None = None,
    label_col: str = "lang",
    n: int = 3,
    top_k: int = 2000,
) -> DataFrame:
    """Predict (id, lang_pred) with a char-n-gram NB model trained on
    ``train_df`` (default: ``df`` itself — self-supervised from its own
    labels, the bootstrap shape used when re-labeling a corpus whose
    labels are partial or noisy)."""
    model, priors = train_char_ngram_lid(
        train_df if train_df is not None else df,
        text_col,
        label_col,
        n=n,
        top_k=top_k,
    )
    docgrams = (
        df.select(
            F.col(id_col),
            F.explode(char_ngrams_expr(F.col(text_col), n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("ng"))
    )
    scores = (
        docgrams.join(F.broadcast(model), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("ng") * F.col("lp")).alias("s"))
        .join(F.broadcast(priors), "lang")
        .select(
            id_col,
            "lang",
            (F.col("s") + F.col("prior")).alias("score"),
        )
    )
    best = scores.groupBy(id_col).agg(
        F.max_by("lang", F.struct(F.col("score"), F.col("lang"))).alias(
            "__pred"
        )
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col, F.coalesce(F.col("__pred"), F.lit("und")).alias("lang_pred")
        )
    )
