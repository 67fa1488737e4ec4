"""Behavioral tests for the training-data pipeline ops — planted
duplicates/neighbors so the operators must actually find something
(guards against vacuously-passing parity checks)."""

import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)
from outpost_spark.ops.multimodal import (
    decode_image,
    documents_as_multimodal,
    extract_features,
)
from outpost_spark.ops.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from outpost_spark.ops.text import language_id, quality_score

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),  # exact dup of 1
        (3, BASE.replace("quick", "swift"), "en"),  # near dup of 1
        (4, "der hund und die katze sind nicht auf dem tisch und das ist gut", "de"),
        (5, "completely different text about spark query engines and columnar io", "en"),
        (6, "", "en"),  # empty doc edge case
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_exact_dedup_groups(docs):
    out = {r["content_hash"]: r for r in exact_dedup(docs, "text", "doc_id").collect()}
    assert any(r["copies"] == 2 and r["canonical_id"] == 1 for r in out.values())


def test_minhash_signature_properties(docs, spark):
    sigs = minhash_signature(docs, "text", num_hashes=16).collect()
    by_id = {r["doc_id"]: r["minhash"] for r in sigs}
    assert by_id[1] == by_id[2]  # identical text -> identical signature
    assert by_id[1] != by_id[5]
    assert len(set(by_id[1])) > 1  # hash functions genuinely differ
    assert by_id[6] == [1 << 32] * 16  # empty doc sentinel


def test_minhash_finds_planted_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.8
    assert not any({a, b} == {1, 5} for a, b in pairs)


def test_minhash_xxhash64_path_recall_parity(docs):
    """The Spark-native xxhash64 base hash (production path) must find the
    same verified near-dup pairs as the md5 oracle path on the planted
    corpus, and its plan must contain no md5 call."""
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    fast = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5, hash_fn="xxhash64")
    fast_pairs = {(r["id_a"], r["id_b"]) for r in fast.collect()}
    assert fast_pairs == md5_pairs
    assert (1, 2) in fast_pairs and (1, 3) in fast_pairs
    sig_plan = minhash_signature(docs, "text", hash_fn="xxhash64")._jdf.queryExecution().toString()
    assert "xxhash64" in sig_plan and "md5" not in sig_plan


def test_minhash_lane_mixing_decorrelated(spark):
    """A very common shingle with a small base hash must not dominate every
    lane (the failure mode of small affine multipliers): two documents
    sharing one common shingle but otherwise disjoint must NOT share any
    full 4-lane band."""
    common = "zzzzz"  # one shared shingle
    a = common + " aaaaaaaa bbbbbbbb cccccccc dddddddd eeeeeeee"
    b = common + " ffffffff gggggggg hhhhhhhh iiiiiiii jjjjjjjj"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
    sigs = {r["doc_id"]: r["minhash"] for r in minhash_signature(df, "text").collect()}
    shared_bands = sum(
        sigs[1][i : i + 4] == sigs[2][i : i + 4] for i in range(0, 16, 4)
    )
    assert shared_bands == 0


def test_simhash_near_dups_close_in_hamming(docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs, "text").select("doc_id", "simhash").collect()}
    assert out[1] == out[2]
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[5]).count("1")
    assert ham_near < ham_far
    assert out[6] == 0


def test_ngram_jaccard_grouping_bounds_pairs(docs):
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, group_col="lang"
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert all(a != 4 and b != 4 for a, b in ids)  # 'de' group isolated


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2] * 16),
        (1, [1.0, 0.001, 0.5, 0.2] * 16),  # near dup of 0
        (2, [-1.0, 0.3, -0.5, 0.1] * 16),
        (3, [0.9, 0.05, 0.45, 0.25] * 16),
        (4, [0.0, 1.0, -1.0, 0.7] * 16),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_cosine_topk_exact(vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    out = cosine_topk(vectors, "embedding", q, k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 3]
    assert out[0]["score"] == pytest.approx(1.0)


def test_ann_lsh_matches_brute_force_in_bucket(vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    ann = cosine_topk_lsh(vectors, "embedding", q, k=3, bits=8).collect()
    # vectors 0,1,3 share the sign pattern of the leading dims
    assert [r["vec_id"] for r in ann] == [0, 1, 3]


def test_embedding_near_dup_pairs(vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(vectors, "embedding", threshold=0.99).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.999


def test_quality_and_langid(docs):
    q = {r["doc_id"]: r["quality_score"] for r in quality_score(docs, "text", "doc_id").collect()}
    assert q[6] < q[5]  # empty doc scores below a real one
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs, "text", "doc_id").collect()}
    assert lang[1] == "en"
    assert lang[4] == "de"
    assert lang[6] == "und"


def test_multimodal_stub_and_fake_pipeline(docs):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    feats = extract_features(documents_as_multimodal(docs.filter(F.col("doc_id") <= 2)))
    rows = {r["id"]: r for r in feats.collect()}
    assert rows[1]["checksum"] == rows[2]["checksum"]  # same bytes, same digest
    assert rows[1]["n_bytes"] == len(BASE.encode())
    assert len(rows[1]["feat"]) == 4 and all(0 <= v < 1 for v in rows[1]["feat"])
