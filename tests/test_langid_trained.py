"""Trained char-n-gram language ID (ops/langid.py): model-as-DataFrame
Naive Bayes vs the stopword heuristic on PLANTED multilingual docs —
the trained model must (a) recover the training labels and (b) beat the
heuristic on text the heuristic can't see (docs with zero function
words, where character statistics still separate the languages), plus
determinism across partitionings and the und fallback."""

import random

import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.langid import (
    char_ngrams_expr,
    language_id_trained,
    train_char_ngram_lid,
)

# planted vocab: per-language CONTENT words with distinctive character
# statistics, none of them in ops.text.STOPWORDS — the heuristic scores
# zero hits on all of these and answers 'und'
VOCAB = {
    "en": ["through", "thought", "weather", "knight", "enough", "sight",
           "bright", "caught", "rhythm", "strength"],
    "de": ["schließlich", "mädchen", "straße", "größe", "zwischen",
           "schön", "natürlich", "glück", "spät", "müde"],
    "fr": ["château", "garçon", "déjà", "être", "fenêtre", "août",
           "ça", "très", "après", "même"],
    "es": ["mañana", "niño", "señor", "año", "pequeño", "montaña",
           "corazón", "acción", "según", "jamón"],
}


def _planted(spark, n_per_lang=30, words_per_doc=12, seed=7):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, words in VOCAB.items():
        for _ in range(n_per_lang):
            rows.append(
                (i, " ".join(rng.choices(words, k=words_per_doc)), lang)
            )
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_char_ngrams_expr(spark):
    rows = spark.createDataFrame(
        [("AbCd",), ("x",), ("",)], "t string"
    ).select(char_ngrams_expr(F.col("t"), 3).alias("g")).collect()
    assert rows[0]["g"] == ["abc", "bcd"]
    assert rows[1]["g"] == []
    assert rows[2]["g"] == []


def test_trained_recovers_planted_labels_heuristic_cannot(spark):
    from outpost_spark.ops.text import language_id

    docs = _planted(spark)
    truth = {r["doc_id"]: r["lang"] for r in docs.collect()}

    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id_trained(docs, "text", "doc_id", top_k=500).collect()
    }
    acc_trained = sum(pred[i] == truth[i] for i in truth) / len(truth)

    heur = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id(docs, "text", "doc_id").collect()
    }
    acc_heur = sum(heur[i] == truth[i] for i in truth) / len(truth)

    assert acc_trained == 1.0
    # the planted vocab has no function words and non-ASCII-heavy text:
    # the stopword heuristic is blind here
    assert acc_heur < 0.5
    assert acc_trained > acc_heur


def test_trained_generalizes_to_held_out_docs(spark):
    train = _planted(spark, n_per_lang=30, seed=7)
    test = _planted(spark, n_per_lang=10, seed=99)
    truth = {r["doc_id"]: r["lang"] for r in test.collect()}
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id_trained(
            test, "text", "doc_id", train_df=train, top_k=500
        ).collect()
    }
    acc = sum(pred[i] == truth[i] for i in truth) / len(truth)
    assert acc >= 0.95


@pytest.mark.slow
def test_deterministic_across_partitionings(spark):
    docs = _planted(spark)
    a = sorted(
        map(tuple, language_id_trained(docs, "text", "doc_id", top_k=300).collect())
    )
    b = sorted(
        map(
            tuple,
            language_id_trained(
                docs.repartition(13), "text", "doc_id", top_k=300
            ).collect(),
        )
    )
    assert a == b


def test_und_fallback_for_out_of_vocab_docs(spark):
    train = _planted(spark)
    # digits only: 3-grams exist but none survive the top-k cut trained
    # on letters; empty text has no grams at all
    test = spark.createDataFrame(
        [(1000, "0123456789" * 3), (1001, "")],
        "doc_id long, text string",
    )
    pred = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id_trained(
            test, "text", "doc_id", train_df=train, top_k=200
        ).collect()
    }
    assert pred[1001] == "und"
    assert pred[1000] in {"und", "en", "de", "fr", "es"}  # never crashes


def test_model_shape_is_bounded(spark):
    docs = _planted(spark)
    model, priors = train_char_ngram_lid(
        docs, "text", "lang", top_k=150
    )
    assert model.count() <= 150 * 4
    assert priors.count() == 4
    # a complete grid: every selected gram has a cell for every lang
    per_gram = model.groupBy("gram").count().select("count").distinct().collect()
    assert [r["count"] for r in per_gram] == [4]


def test_quality_trained_distills_the_gopher_gate(spark):
    """Self-distillation: the NB trained on Gopher pass/fail labels
    recovers those labels on held-out docs of the same shape — the
    fast-gate contract (score everything with the model, run the regex
    battery on samples)."""
    import random as _random

    from outpost_spark.ops.langid import quality_trained
    from outpost_spark.ops.text import gopher_quality

    rng = _random.Random(3)
    good_words = ["the", "be", "to", "of", "and", "that", "have", "with",
                  "weather", "garden", "window", "people", "moment"]
    rows = []
    for i in range(120):
        if i % 2 == 0:  # passes: 60+ normal words incl. stopwords
            rows.append((i, " ".join(rng.choices(good_words, k=70))))
        else:  # fails: symbol-heavy junk
            rows.append((i, " ".join("#" * rng.randint(2, 6) for _ in range(70))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        r["doc_id"]: "pass" if r["passes_gopher"] else "fail"
        for r in gopher_quality(docs, "text", "doc_id").collect()
    }
    assert set(truth.values()) == {"pass", "fail"}  # both classes planted
    train = docs.filter(F.col("doc_id") < 80)
    test = docs.filter(F.col("doc_id") >= 80)
    pred = {
        r["doc_id"]: r["quality_pred"]
        for r in quality_trained(
            test, "text", "doc_id", train_df=train, top_k=400
        ).collect()
    }
    acc = sum(pred[i] == truth[i] for i in pred) / len(pred)
    assert acc >= 0.95, acc


def test_trained_scoring_plan_broadcasts_the_model(spark):
    """Scale claim of the trained NB scorer: the model grid and priors
    reach the doc-gram stream as BROADCAST joins (the model is top_k x
    n_langs rows), and text never sort-merge-joins — the only exchanges
    are the doc-gram compress agg and the per-doc argmax agg."""
    docs = _planted(spark)
    plan = (
        language_id_trained(docs, "text", "doc_id", top_k=300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both model-side joins (grid on gram, priors on lang) broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    # the only sort-merge join is the final corpus x corpus id-attach
    # of the 'und' fallback — key-partitioned, correct at scale; the
    # GRAM stream itself must never sort-merge against the model
    assert plan.count("SortMergeJoin") <= 1
