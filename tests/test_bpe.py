"""Pure-Python byte-level BPE (ops/bpe.py) and its exact-token-budget
integration: frozen encode fixtures (token ids are STABLE data — a
vocab or algorithm drift breaks budgets silently, so it must break
loudly here), round-trip decode, training determinism, and the
sample_token_budget_bpe_exact catalog entry cross-checked against a
DuckDB cumulative-window oracle fed the same Python-computed weights."""

import duckdb
import pytest

from outpost_spark.ops.bpe import (
    BpeEncoder,
    bytes_to_unicode,
    default_encoder,
    pretokenize,
    train_bpe,
    train_bpe_merges,
)

# ── the algorithm itself ────────────────────────────────────────────────


def test_bytes_to_unicode_is_a_reversible_256_alphabet():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("A")] == "A"  # printable bytes keep their codepoint
    assert ord(m[ord(" ")]) >= 256  # space shifts out of the way


def test_pretokenize_gpt2_shape():
    assert pretokenize("I'll go") == ["I", "'ll", " go"]
    assert pretokenize("hello  world") == ["hello", " ", " world"]
    assert pretokenize("a1b2") == ["a", "1", "b", "2"]
    assert pretokenize("x=1; y_2") == ["x", "=", "1", ";", " y", "_", "2"]
    assert pretokenize("café 12 ") == ["café", " 12", " "]


def test_train_merges_on_tiny_histogram_is_classic_bpe():
    # Sennrich's worked example shape: the dominant 'low' prefix merges
    # first ('l','o') and ('o','w') tie at 16, lexicographic max wins
    merges = train_bpe_merges({"low": 5, "lower": 2, "lowest": 9}, 3)
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    enc = BpeEncoder(merges)
    assert len(enc.encode("low")) == 1
    assert enc.decode(enc.encode("lowest")) == "lowest"


def test_encoder_roundtrip_arbitrary_unicode():
    enc = default_encoder()
    for s in [
        "The quick brown fox jumps over the lazy dog.",
        "naïve café — ünïcödé ✓ 北京 🚀",
        "tabs\tnewlines\nand  runs   of spaces",
        "",
    ]:
        assert enc.decode(enc.encode(s)) == s


# frozen fixtures: ids from the committed default vocab; a drift in the
# vocab file, the byte alphabet, the pretokenizer, or the merge-order
# tie-break shows up as a diff here
FROZEN = {
    "hello world": [362, 108, 108, 111, 32, 119, 260, 108, 100],
    "the system": [365, 256, 121, 278, 101, 109],
}


def test_frozen_encode_fixtures():
    enc = default_encoder()
    for text, ids in FROZEN.items():
        assert enc.encode(text) == ids, text


def test_training_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_bpe(docs, "text", num_merges=64, max_words=5000)
    m2 = train_bpe(
        docs.repartition(7), "text", num_merges=64, max_words=5000
    )
    assert m1 == m2
    assert len(m1) >= 32  # the corpus has enough signal to train on


# ── integration: exact counts + budget sampling ─────────────────────────


def test_exact_token_counts_defaults_to_in_tree_bpe(spark):
    from outpost_spark.ops.text import exact_token_counts

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    got = {
        r["doc_id"]: r["n"]
        for r in exact_token_counts(docs, "text", "doc_id", out_col="n").collect()
    }
    enc = default_encoder()
    want = {
        r["doc_id"]: len(enc.encode(r["text"])) for r in docs.collect()
    }
    assert got == want
    assert sum(got.values()) > 0


def test_budget_exact_matches_duckdb_on_python_weights(spark):
    """sample_token_budget_bpe_exact vs a DuckDB oracle fed the SAME
    Python-computed exact weights: cross-engine check of the hash
    ordering, bucketing, and cumulative-budget cut — everything except
    the encoder, which the frozen fixtures pin."""
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["n_exact_tokens"])
        for r in queries()["sample_token_budget_bpe_exact"](spark, sf_dir).collect()
    }
    enc = default_encoder()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE w (doc_id BIGINT, n BIGINT)")
    con.executemany(
        "INSERT INTO w VALUES (?, ?)",
        [(r["doc_id"], len(enc.encode(r["text"]))) for r in docs],
    )
    def oracle(budget):
        return set(
            con.execute(
                f"""
                SELECT doc_id, n FROM (
                  SELECT doc_id, n,
                         sum(n) OVER (
                           ORDER BY CAST(('0x' || substr(md5('budget|' ||
                             CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id
                         ) AS c
                  FROM w) z
                WHERE c <= {budget}
                """
            ).fetchall()
        )

    assert got == oracle(30000)
    assert len(got) > 0
    # the catalog budget swallows all of sf0.001, so exercise the actual
    # boundary cut at a budget that bites, same weights both engines
    from outpost_spark.ops.sampling import sample_by_token_budget
    from outpost_spark.ops.text import exact_token_counts

    weighted = exact_token_counts(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "text",
        "doc_id",
        out_col="n_exact_tokens",
    )
    small = {
        (r["doc_id"], r["n_exact_tokens"])
        for r in sample_by_token_budget(
            weighted, "doc_id", "n_exact_tokens", 5000
        ).collect()
    }
    assert small == oracle(5000)
    assert 0 < len(small) < len(docs)
