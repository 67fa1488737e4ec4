"""Unit tests for the LM perplexity gate family (ops/lm.py) and the C4
rule set / mojibake repair (ops/text.py) — hand-computed stupid-backoff
scores and rule-by-rule planted documents, per ADVICE r06 (these two
modules shipped untested in the r06 snapshot; VERDICT r06 "What's
wrong" #1)."""

import math

import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.lm import (
    bigram_lm_score,
    doc_bigrams,
    perplexity_gate,
    train_bigram_counts,
)
from outpost_spark.ops.text import c4_filters, fix_mojibake, mojibake_stats


def _lp(x):
    return round(math.log(x), 6)


def test_bigram_lm_score_hand_computed(spark):
    # corpus: unigrams a:3 b:2 c:1 (N=6); bigrams (a,b):2 (b,a):1 (a,c):1
    df = spark.createDataFrame([(1, "a b a b"), (2, "a c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "text", "doc_id").collect()}
    # doc 1: S(b|a)=2/3 twice, S(a|b)=1/2
    exp1 = round((_lp(2 / 3) * 2 + _lp(1 / 2)) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["lm_score"] == pytest.approx(exp1, abs=2e-6)
    # doc 2: S(c|a)=1/3
    assert out[2]["n_bigrams"] == 1
    assert out[2]["lm_score"] == pytest.approx(_lp(1 / 3), abs=2e-6)
    # lm_ppl is TRUE perplexity (exp of the negated avg log-prob) —
    # ADVICE r06 flagged the old negated-log value as the wrong scale
    assert out[2]["lm_ppl"] == pytest.approx(3.0, abs=1e-5)
    assert out[1]["lm_ppl"] == pytest.approx(math.exp(-exp1), abs=1e-5)


def test_bigram_lm_oov_backoff_floor(spark):
    # train on "a b" (N=2, a:1 b:1); score "a z": (a,z) unseen ->
    # S = alpha * max(c(z)=0 -> 1) / N = 0.4/2 = 0.2
    train = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(9, "a z")], ["doc_id", "text"])
    row = bigram_lm_score(score, "text", "doc_id", train_df=train).first()
    assert row["lm_score"] == pytest.approx(_lp(0.2), abs=2e-6)


def test_bigram_lm_short_docs_score_null(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "text", "doc_id").collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["lm_score"] is None
    assert out[2]["n_bigrams"] == 0 and out[2]["lm_score"] is None
    assert out[3]["n_bigrams"] == 1 and out[3]["lm_score"] is not None


def test_train_empty_corpus_raises(spark):
    # ADVICE r06: n_total == 0 would divide by zero (NULL scores
    # non-ANSI, runtime error ANSI) — must fail loudly at train time
    empty = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="zero tokens"):
        train_bigram_counts(empty, "text", "doc_id")
    with pytest.raises(ValueError, match="zero tokens"):
        bigram_lm_score(
            spark.createDataFrame([(1, "a b")], ["doc_id", "text"]),
            "text",
            "doc_id",
            train_df=empty,
        )


def test_perplexity_gate_passes_through_on_empty_training_slice(spark):
    # ADVICE r07: the gate (and curate_corpus_v5, which self-trains on
    # the quality-passing slice) must NOT crash when the training slice
    # is empty — every doc passes ungated, same policy as too-short docs
    docs = spark.createDataFrame([(1, "a b c"), (2, "x y")], ["doc_id", "text"])
    empty = spark.createDataFrame([(9, "")], ["doc_id", "text"])
    out = perplexity_gate(docs, "text", "doc_id", train_df=empty, max_ppl=5.0)
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    assert out.columns == docs.columns


def test_curate_v5_empty_quality_slice_returns_empty_not_crash(spark):
    # a corpus where the quality gate passes NOTHING: v5 must return an
    # empty (doc_id, split) frame like v3 would, not raise (ADVICE r07)
    from outpost_spark.ops.pipeline import curate_corpus_v5

    junk = spark.createDataFrame(
        [(i, "@@@@ #### $$$$ %%%%") for i in range(5)], ["doc_id", "text"]
    )
    out = curate_corpus_v5(junk, quality_min=0.99)
    assert out.columns == ["doc_id", "split"]
    assert out.count() == 0


def test_doc_bigrams_adjacency(spark):
    df = spark.createDataFrame([(1, "w x y")], ["doc_id", "text"])
    rows = {(r["w1"], r["w2"]) for r in doc_bigrams(df, "text", "doc_id").collect()}
    assert rows == {("w", "x"), ("x", "y")}


def test_perplexity_gate_keeps_fluent_drops_junk(spark):
    # CCNet shape: the model trains on a TRUSTED slice (self-scoring a
    # unique junk doc would assign its bigrams probability 1); the junk
    # doc's bigrams then all fall to the OOV backoff floor
    fluent = [(i, "the cat sat on the mat") for i in range(1, 9)]
    train = spark.createDataFrame(fluent, ["doc_id", "text"])
    df = spark.createDataFrame(
        fluent + [(100, "zq xv qj wk pz vb"), (200, "short")],
        ["doc_id", "text"],
    )
    scored = {
        r["doc_id"]: r["lm_ppl"]
        for r in bigram_lm_score(df, "text", "doc_id", train_df=train).collect()
    }
    assert scored[100] > scored[1]
    cut = (scored[1] + scored[100]) / 2
    kept = {
        r["doc_id"]
        for r in perplexity_gate(
            df, "text", "doc_id", train_df=train, max_ppl=cut
        ).collect()
    }
    assert 1 in kept and 100 not in kept
    # docs too short to score are KEPT (CCNet convention)
    assert 200 in kept


def test_c4_filters_rule_by_rule(spark):
    good_line = "This is a perfectly reasonable sentence with many words."
    df = spark.createDataFrame(
        [
            # passes everything: 3 sentences across kept lines
            (1, f"{good_line}\n{good_line}\n{good_line}"),
            # line lacks terminal punctuation -> dropped -> no kept lines
            (2, "a header without terminal punctuation and enough words here"),
            # too few words per line despite punctuation
            (3, "Too short.\nAlso tiny!"),
            # javascript boilerplate line dropped, page fails min_sentences
            (4, "Please enable javascript to view this page properly today."),
            # brace -> page-level reject even though lines are fine
            (5, f"{good_line}\n{good_line}\n{good_line} {{}}"),
            # blocklist phrase -> page-level reject
            (6, f"{good_line}\n{good_line}\nBuy viagra now please okay fine."),
            # only 2 sentences -> fails min_sentences
            (7, f"{good_line}\n{good_line}"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in c4_filters(df, "text", "doc_id").collect()}
    assert out[1]["passes_c4"] and out[1]["n_kept_lines"] == 3
    assert out[2]["n_kept_lines"] == 0 and not out[2]["ok_has_lines"]
    assert out[3]["n_kept_lines"] == 0
    assert out[4]["n_kept_lines"] == 0 and not out[4]["passes_c4"]
    assert not out[5]["ok_no_brace"] and not out[5]["passes_c4"]
    assert not out[6]["ok_no_badwords"] and not out[6]["passes_c4"]
    assert not out[7]["ok_min_sentences"] and not out[7]["passes_c4"]
    # cleaned text drops the rejected lines only
    assert out[5]["clean_text"].count("\n") == 1  # 3rd line (brace) dropped


def test_c4_filters_empty_badwords_degrades(spark):
    # ADVICE r06: badwords=[] ("disable the blocklist") used to crash on
    # the None accumulator; must degrade to ok_no_badwords == True
    df = spark.createDataFrame([(1, "Buy viagra now please okay fine.")], ["doc_id", "text"])
    row = c4_filters(df, "text", "doc_id", badwords=[]).first()
    assert row["ok_no_badwords"] is True


def test_fix_mojibake_planted(spark):
    broken = "cafÃ© â€™tis Â done"
    clean = "café ’tis  done"
    df = spark.createDataFrame(
        [(1, broken), (2, "already clean text.")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df, "text", "doc_id").collect()}
    assert out[1]["fixed_text"] == clean
    assert out[1]["n_mojibake_before"] > 0
    assert out[1]["n_mojibake_after"] == 0
    assert out[2]["fixed_text"] == "already clean text."
    assert out[2]["n_mojibake_before"] == 0
    # repaired text no longer trips the detector
    n = mojibake_stats(
        fix_mojibake(df, "text", "doc_id").withColumnRenamed("fixed_text", "text"),
        "text",
        "doc_id",
    ).filter(F.col("has_mojibake")).count()
    assert n == 0


def test_ngram_repetition_planted_loops(spark):
    """Duplicate n-gram char fraction: a pure repetition loop scores
    1.0, unique text 0.0, a half-repeated doc in between; docs shorter
    than n score NULL; n=5 catches a planted 5-gram loop."""
    from outpost_spark.ops.text import ngram_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),              # all bigrams duplicated
            (2, "q w e r t y u"),            # all unique
            (3, "x y x y unique tail here"), # mixed
            (4, "single"),                   # too short for n=2
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_repetition_stats(df, "text", "doc_id", n=2).collect()}
    assert out[1]["dup_ngram_char_frac"] == 1.0
    assert out[2]["dup_ngram_char_frac"] == 0.0
    assert 0.0 < out[3]["dup_ngram_char_frac"] < 1.0
    assert out[4]["n_ngrams"] == 0 and out[4]["dup_ngram_char_frac"] is None

    loop = " ".join(["one two three four five"] * 4)
    df5 = spark.createDataFrame(
        [(1, loop), (2, "totally fresh words never repeating at all ok")],
        ["doc_id", "text"],
    )
    out5 = {
        r["doc_id"]: r
        for r in ngram_repetition_stats(df5, "text", "doc_id", n=5).collect()
    }
    # 20 tokens -> 16 five-gram windows; the loop makes most duplicated
    assert out5[1]["dup_ngram_char_frac"] > 0.4
    assert out5[2]["dup_ngram_char_frac"] == 0.0


def test_perplexity_buckets_tiers_and_unscored(spark):
    """head/middle/tail split: a corpus with one dominant fluent
    pattern puts conforming docs in head, rarer phrasing in later
    buckets, docs too short to score in 'unscored'; thresholds are
    percentiles, so the scored docs split ~evenly."""
    from outpost_spark.ops.lm import perplexity_buckets

    # three tiers sharing the hot token "the" with continuation
    # frequencies 6 / 3 / 1 — self-scoring makes singleton bigrams
    # perfectly predictable, so the tiers must CONTEND on w1
    rows = [(i, "the cat sat on the mat") for i in range(6)]
    rows += [(10 + i, "the dog sat on the rug") for i in range(3)]
    rows += [(20, "the zebra the quokka the vortex"), (21, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in perplexity_buckets(df, "text", "doc_id").collect()}
    assert out[21]["ppl_bucket"] == "unscored" and out[21]["lm_ppl"] is None
    # dominant pattern = most predictable -> head (all 6, tied ppl)
    assert all(out[i]["ppl_bucket"] == "head" for i in range(6))
    assert all(out[10 + i]["ppl_bucket"] == "middle" for i in range(3))
    # the rare-continuation doc is the most surprising -> tail
    assert out[20]["ppl_bucket"] == "tail"
    assert out[0]["lm_ppl"] < out[10]["lm_ppl"] < out[20]["lm_ppl"]


def test_top_ngram_fraction_planted_champion(spark):
    """Top-n-gram char fraction: a doc dominated by one repeated
    trigram scores near its mass share; uniform text scores one
    window's share; ties resolve by the (count, length, gram) order;
    short docs are NULL (Rae et al. 2021 App. A1.1)."""
    from outpost_spark.ops.text import top_ngram_fraction

    df = spark.createDataFrame(
        [
            # "click here now" ×4 -> champion trigram dominates
            (1, " ".join(["click here now"] * 4) + " unrelated tail"),
            (2, "q w e r t y u"),     # all trigrams unique
            (3, "a b"),               # too short for n=3
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in top_ngram_fraction(df, "text", "doc_id", n=3).collect()
    }
    # doc 1: champion "click here now" occurs 4x (len 14); windows=12
    mass1 = sum(
        len(" ".join(t))
        for t in zip(*[
            (" ".join(["click", "here", "now"] * 4) + " unrelated tail").split()[k:]
            for k in range(3)
        ])
    )
    assert out[1]["top_ngram_char_frac"] == pytest.approx(4 * 14 / mass1, abs=1e-6)
    # doc 2: 5 windows, all count 1 -> champion by (len, lex): "r t y"
    # and "t y u" tie on count+len -> lexicographically greatest wins;
    # every window has length 5, so frac = 5 / 25
    assert out[2]["top_ngram_char_frac"] == pytest.approx(5 / 25, abs=1e-6)
    assert out[3]["n_ngrams"] == 0 and out[3]["top_ngram_char_frac"] is None


def test_line_repetition_planted(spark):
    """Duplicate line fractions: a doc of one repeated line scores
    (n-1)/n by both measures, unique lines score 0, a doc whose
    repeated line is short shows count-frac > char-frac, empty/
    whitespace-only docs are NULL."""
    from outpost_spark.ops.text import line_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "click here\nclick here\nclick here\nclick here"),
            (2, "alpha\nbeta\ngamma"),
            (3, "x\nx\na genuinely long unique line of text"),
            (4, "   \n  \n"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in line_repetition_stats(df, "text", "doc_id").collect()
    }
    assert out[1]["n_segments"] == 4
    assert out[1]["dup_frac"] == pytest.approx(0.75)
    assert out[1]["dup_char_frac"] == pytest.approx(0.75)
    assert out[2]["dup_frac"] == 0.0 and out[2]["dup_char_frac"] == 0.0
    # 'x' repeats once (1 dup of 3 segments) but carries 1 of 40 chars
    assert out[3]["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[3]["dup_char_frac"] < out[3]["dup_frac"]
    assert out[4]["n_segments"] == 0 and out[4]["dup_frac"] is None


def test_fix_mojibake_roundtrip_property():
    """Property (hypothesis): for any text over printable ASCII + the
    repair table's characters, corrupt -> fix is the identity — the
    repair table inverts the UTF-8-as-cp1252 corruption it was generated
    from, including adjacent-artifact boundaries and the NBSP family.
    Pure-Python twin of the Column replace chain (same literals, same
    order, same replace-all semantics)."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from outpost_spark.ops.text import (
        _MOJIBAKE_CHARS,
        _MOJIBAKE_FIXES,
        _cp1252_mojibake,
    )

    def fix_py(s: str) -> str:
        for bad, good in _MOJIBAKE_FIXES:
            s = s.replace(bad, good)
        return s

    alphabet = string.printable[:-6] + " \n" + _MOJIBAKE_CHARS  # printable + space/newline

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=60))
    def prop(clean):
        assert fix_py(_cp1252_mojibake(clean)) == clean

    prop()
