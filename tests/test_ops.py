"""Behavioral tests for the training-data pipeline ops — planted
duplicates/neighbors so the operators must actually find something
(guards against vacuously-passing parity checks)."""

import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import (
    connected_components,
    dedup_keep_canonical,
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)
from outpost_spark.ops.sampling import (
    hash_fraction,
    hash_sample,
    hash_split,
    stratified_quota,
)
from outpost_spark.ops.multimodal import (
    decode_image,
    documents_as_multimodal,
    extract_features,
)
from outpost_spark.ops.similarity import (
    assign_ivf_expr,
    assign_ivf_pandas,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    train_centroids_kmeans,
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


def test_simhash_arrow_fingerprint_matches_jvm_expression(spark):
    """r16: the md5 simhash fingerprint now runs as one Arrow stage
    (guide §4.2 — it replaces an interpreted md5-per-token transform
    plus 32 interpreted aggregate() passes, measured 3.6x on the sf0.1
    pair entry).  It must be bit-identical to the JVM expression form —
    including NULL/empty/whitespace-only/unicode inputs — because the
    DuckDB oracle pins the exact fingerprints."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.dedup import _hash_expr, simhash, tokens_expr

    texts = [
        "hello world hello world",
        "HeLLo WÖRLD ÉÎÑ İstanbul ΣΑΣ ß ΒΟΣ",
        "", None, "   ", "one",
        "a b c d e f g h i j k l m n o p",
        "ТЕКСТ на русском", "tok " * 500,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    # the pre-r16 JVM expression form, reconstructed inline
    toks = tokens_expr(F.col("text"))
    hashed = df.withColumn(
        "__tokhash", F.transform(toks, lambda t: _hash_expr(t, 0, "md5"))
    )

    def _bit_sum(b):
        return F.aggregate(
            F.col("__tokhash"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftrightunsigned(h, b) % 2) * 2 - 1,
        )

    value = None
    for b in range(32):
        contrib = (
            F.when(_bit_sum(b) > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        value = contrib if value is None else value + contrib
    old = hashed.withColumn("sh_old", value).select("id", "sh_old")
    new = simhash(df, "text", bits=32).select(
        "id", F.col("simhash").alias("sh_new")
    )
    rows = old.join(new, "id").collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r["sh_old"] == r["sh_new"], r["id"]


def test_signature_from_wide_grams_matches_column_form(spark):
    """r16: the MinHash lane mixes now run as one Arrow stage over the
    wide gram-hash arrays (guide §4.2 — replaces num_hashes interpreted
    transform+array_min HOF passes, measured ~4x on the sf0.1 signature
    stage).  Must be bit-identical to the Column form for BOTH hash
    families — including NULL text, empty/short docs, unicode, and a
    long doc — because the band keys (and through them the oracle-pinned
    pair set) derive from the exact lane values."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.dedup import (
        _narrow_from_wide,
        signature_from_basehash,
        signature_from_wide_grams,
        wide_gram_hashes,
    )

    texts = [
        "hello world hello world",
        "HeLLo WÖRLD ÉÎÑ İstanbul ΣΑΣ ß",
        "", None, "    ", "abcd",  # shorter than the 5-shingle
        "abcde",  # exactly one shingle
        "the quick brown fox jumps over the lazy dog " * 40,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    for hash_fn in ("md5", "xxhash64"):
        grams = df.select(
            "id", wide_gram_hashes(F.col("text"), 5, hash_fn).alias("__grams")
        )
        old_sig = signature_from_basehash(
            F.transform(F.col("__grams"), lambda g: _narrow_from_wide(g, hash_fn)),
            16,
        )
        rows = (
            grams.withColumn("old", old_sig)
            .withColumn(
                "new", signature_from_wide_grams(F.col("__grams"), 16, hash_fn)
            )
            .collect()
        )
        assert len(rows) == len(texts)
        for r in rows:
            assert list(r["old"]) == list(r["new"]), (hash_fn, r["id"])


def test_verify_arrow_intersect_matches_column_form(spark):
    """r16: the exact-Jaccard verify's intersect count runs as one Arrow
    stage on hashed-gram (long-array) paths (guide §4.2).  It must emit
    exactly the Column form's pairs AND jaccard values — empty arrays,
    disjoint/identical/partial overlaps, and values straddling the
    threshold — and the plan must carry ONE ArrowEvalPython (the UDF is
    non-deterministic-fenced so the threshold filter does not duplicate
    it, guide §4.4)."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.dedup import _verify_exact_jaccard, jaccard_expr

    grams = spark.createDataFrame(
        [
            (1, list(range(100))),
            (2, list(range(100))),            # identical to 1 -> J=1.0
            (3, list(range(30, 130))),        # 70/130 overlap with 1 -> ~0.538
            (4, list(range(1000, 1100))),     # disjoint with 1
            (5, []),                          # empty
            (6, []),                          # empty vs empty -> 0.0
            (7, list(range(85)) + list(range(1000, 1015))),  # 85/115 vs 1 -> ~0.739
        ],
        "__gid long, __grams array<bigint>",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (5, 6), (1, 7)], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in _verify_exact_jaccard(cands, grams, 0.5).collect()
    }
    # reference: the pure-Column form over the same joins
    ref_joined = (
        cands.join(grams.withColumnRenamed("__gid", "id_a").withColumnRenamed("__grams", "__ga"), "id_a")
        .join(grams.withColumnRenamed("__gid", "id_b").withColumnRenamed("__grams", "__gb"), "id_b")
        .withColumn("jaccard", F.round(jaccard_expr(F.col("__ga"), F.col("__gb")), 6))
        .filter(F.col("jaccard") >= 0.5)
    )
    want = {(r.id_a, r.id_b): r.jaccard for r in ref_joined.collect()}
    assert got == want and (1, 2) in got and (1, 3) in got and (1, 7) in got
    plan = spark._jvm.PythonSQLUtils.explainString(
        _verify_exact_jaccard(cands, grams, 0.5)._jdf.queryExecution(), "formatted"
    )
    assert plan.count("ArrowEvalPython (") == 1, plan


def test_dedup_substrings_global(spark):
    """Substring-level dedup: characters covered by a repeated 40-char
    window are cut everywhere except the first global occurrence; docs
    without repeats pass through byte-identical; a doc fully covered by
    repeated windows empties."""
    from outpost_spark.ops.dedup import dedup_substrings

    shared = "A" * 25 + "BCDEFGHIJKLMNOPQRSTUVWXY"  # 49 chars > window
    rows = [
        (1, "unique prefix one. " + shared + " unique tail one."),
        (2, "different opening text " + shared + " and another ending."),
        (3, "totally unrelated document with no repeats at all here."),
        (4, shared),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in dedup_substrings(df, "text", "doc_id", window=40).collect()
    }
    assert out[1] == (rows[0][1], 0)          # first occurrence untouched
    assert shared not in out[2][0] and out[2][1] >= 49
    assert out[3] == (rows[2][1], 0)          # no repeats -> identical
    assert out[4][0] == "" and out[4][1] == 49  # fully covered -> emptied
    # stride > 1 still catches the aligned duplicate copy in doc 4
    strided = {
        r["doc_id"]: r["n_removed"]
        for r in dedup_substrings(df, "text", "doc_id", window=40, stride=5).collect()
    }
    assert strided[1] == 0 and strided[3] == 0


def test_minhash_fast_path_pairset_equality_on_real_corpus(spark, sf_dir):
    """Pin the production paths to the oracle-checked one on REAL data:
    xxhash64 AND the numpy-stage path (the catalog's
    dedup_minhash_lsh_pairs_fast configuration) must return the identical
    verified pair set as md5 (not just recall on planted fixtures) on the
    sf0.001 documents table.  The numpy path's jaccard values must ALSO
    match exactly — both verify over distinct-gram sets, so any drift
    means its character shingling diverged from substring semantics."""
    import os as _os

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    kw = dict(num_hashes=16, bands=4, rows_per_band=4,
              shingle_len=5, verify_ngram=5, threshold=0.7)
    md5_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, "doc_id", "text", **kw).collect()
    }
    fast_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", hash_fn="xxhash64", **kw
        ).collect()
    }
    assert {(a, b) for a, b, _ in fast_pairs} == {(a, b) for a, b, _ in md5_pairs}
    numpy_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", hash_fn="numpy", **kw
        ).collect()
    }
    assert numpy_pairs == md5_pairs
    assert md5_pairs  # the corpus plants real near-dups — non-vacuous
    # verified Jaccard agrees across base hashes (same gram sets up to
    # hash identity; scores rounded to 6dp on both paths)
    md5_j = {(a, b): j for a, b, j in md5_pairs}
    for a, b, j in fast_pairs:
        assert abs(md5_j[(a, b)] - j) < 1e-6


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


def test_ivf_assignment_expr_matches_pandas(vectors):
    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.3, -0.5, 0.1] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    expr = {
        r["vec_id"]: r["cid"]
        for r in vectors.select(
            "vec_id", assign_ivf_expr(F.col("embedding").cast("array<double>"), cents).alias("cid")
        ).collect()
    }
    pnd = {
        r["vec_id"]: r["ivf_cid"]
        for r in assign_ivf_pandas(vectors, "embedding", cents).select("vec_id", "ivf_cid").collect()
    }
    assert expr == pnd
    # planted structure: 0/1/3 cluster with centroid 0, 2 with 1, 4 with 2
    assert expr == {0: 0, 1: 0, 2: 1, 3: 0, 4: 2}


def test_kmeans_training_deterministic_and_separates(spark):
    a, b = [1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.8, -0.5, 0.1] * 16
    rows = [
        (0, a),
        (1, b),  # the two seeds span the two families
        (2, [x + 0.01 for x in a]),
        (3, [x - 0.02 for x in a]),
        (4, [x + 0.01 for x in b]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    c1 = train_centroids_kmeans(df, "embedding", 2, iters=3)
    c2 = train_centroids_kmeans(df, "embedding", 2, iters=3)
    assert c1 == c2  # deterministic seeding + iteration
    assigned = assign_ivf_pandas(df, "embedding", c1, out_col="cid")
    cids = {r["vec_id"]: r["cid"] for r in assigned.select("vec_id", "cid").collect()}
    assert cids[0] == cids[2] == cids[3]
    assert cids[1] == cids[4] != cids[0]
    # trained centroid moved toward the family mean (not stuck on the seed)
    assert c1[0] != [float(x) for x in a]


def test_ivf_topk_full_probe_matches_brute_force(vectors):
    cents = train_centroids_kmeans(vectors, "embedding", 3, iters=2)
    q = vectors.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [r["vec_id"] for r in cosine_topk(vectors, "embedding", q, k=5).collect()]
    # probing every list degenerates to brute force
    full = [
        r["vec_id"]
        for r in cosine_topk_ivf(vectors, "embedding", q, cents, k=5, nprobe=len(cents)).collect()
    ]
    assert full == exact
    # nprobe=1 still finds the planted neighbors (they share the query's list)
    near = [r["vec_id"] for r in cosine_topk_ivf(vectors, "embedding", q, cents, k=3, nprobe=1).collect()]
    assert near[:2] == [0, 1]


def test_ivf_preassigned_column_path(vectors):
    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    pre = assign_ivf_pandas(vectors, "embedding", cents, out_col="ivf_cid")
    q = vectors.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    out = cosine_topk_ivf(
        pre, "embedding", q, cents, k=10, nprobe=1, assign_col="ivf_cid"
    ).collect()
    got = [r["vec_id"] for r in out]
    assert got[0] == 0 and 4 not in got  # other-list vector pruned


@pytest.mark.slow
def test_knn_join_matches_brute_when_probing_everything(vectors):
    """nprobe = nlist degenerates IVF to exact: the batched join must
    reproduce the brute-force top-k for EVERY source row."""
    from outpost_spark.ops.similarity import knn_join, knn_join_brute

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.3, -0.5, 0.1] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    brute = {
        (r["src_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in knn_join_brute(vectors, "embedding", k=2).collect()
    }
    ivf = {
        (r["src_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in knn_join(vectors, "embedding", cents, k=2, nprobe=len(cents)).collect()
    }
    assert ivf == brute
    assert len({s for s, _ in ivf}) == 5  # every source emitted neighbors
    # planted near-dup pair is mutual rank-1
    assert ivf[(0, 1)][0] == 1 and ivf[(1, 1)][0] == 0


def test_knn_join_preassigned_and_recall(vectors):
    from outpost_spark.ops.similarity import knn_join

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    pre = assign_ivf_pandas(vectors, "embedding", cents, out_col="ivf_cid")
    out = knn_join(pre, "embedding", cents, k=2, nprobe=1, assign_col="ivf_cid").collect()
    got = {(r["src_id"], r["rank"]): r["neighbor_id"] for r in out}
    # with 1 probed list the planted near-dups still find each other
    assert got[(0, 1)] == 1 and got[(1, 1)] == 0


def test_knn_join_window_never_shuffles_vectors(vectors):
    """The top-k window must see (sid, tid, score) rows only — embedding
    arrays are projected away before the window exchange."""
    import io
    import re
    from contextlib import redirect_stdout

    from outpost_spark.ops.similarity import knn_join

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    out = knn_join(vectors, "embedding", cents, k=2, nprobe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"\(\d+\) Window\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m, f"no Window node in plan:\n{plan}"
    assert "__sv" not in m.group(1) and "__tv" not in m.group(1), (
        f"Window carries embedding arrays: {m.group(1)}"
    )


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
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")  # magic alone is not a decodable PNG
    feats = extract_features(documents_as_multimodal(docs.filter(F.col("doc_id") <= 2)))
    rows = {r["id"]: r for r in feats.collect()}
    assert rows[1]["checksum"] == rows[2]["checksum"]  # same bytes, same digest
    assert rows[1]["n_bytes"] == len(BASE.encode())
    assert len(rows[1]["feat"]) == 4 and all(0 <= v < 1 for v in rows[1]["feat"])


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4-5 (diameter 4, forces several propagation rounds),
    # separate pair 10-11, isolated-from-pairs docs never appear
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a bigint, id_b bigint"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_keep_canonical_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5]  # each cluster -> min id; untouched 4 passes through


def test_hash_sample_deterministic_and_nested(spark):
    ids = spark.range(2000).withColumnRenamed("id", "doc_id")
    s20 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2).collect()}
    s50 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.5).collect()}
    assert s20 == {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2).collect()}
    assert s20 < s50  # same seed: smaller rate is a strict subset
    assert 0.15 < len(s20) / 2000 < 0.25 and 0.45 < len(s50) / 2000 < 0.55
    other = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2, seed="other").collect()}
    assert other != s20  # different seed, different (independent) sample


def test_hash_split_partitions_and_validates(spark):
    ids = spark.range(3000).withColumnRenamed("id", "doc_id")
    out = hash_split(ids, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000  # exhaustive assignment
    assert 0.75 < counts["train"] / 3000 < 0.85
    assert counts["val"] > 0 and counts["test"] > 0
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", [("a", 0.5), ("b", 0.4)])
    # xxhash64 production path also covers every row
    fast = hash_split(ids, "doc_id", [("a", 0.5), ("b", 0.5)], hash_fn="xxhash64")
    assert fast.filter(F.col("split").isNull()).count() == 0


def test_stratified_quota_caps_each_stratum(docs):
    out = stratified_quota(docs, ["lang"], 2, "doc_id")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 2 for n in per.values())
    assert per["en"] == 2  # en has >2 docs -> capped exactly at quota
    again = stratified_quota(docs, ["lang"], 2, "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_hash_fraction_range(spark):
    ids = spark.range(500).withColumnRenamed("id", "doc_id")
    stats = ids.select(
        F.min(hash_fraction(F.col("doc_id"))).alias("lo"),
        F.max(hash_fraction(F.col("doc_id"))).alias("hi"),
        F.avg(hash_fraction(F.col("doc_id"))).alias("mean"),
    ).collect()[0]
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert 0.4 < stats["mean"] < 0.6  # roughly uniform


def test_pii_redact_planted(spark):
    from outpost_spark.ops.text import pii_redact

    rows = [
        (1, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
        (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (3, "call +1 555-123-4567 or 020 7946 0958 now"),
        (4, "no pii here at all"),
        (5, "mix: a@b.io from 8.8.8.8 dial 555-000-1111x"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pii_redact(df, "text", "doc_id").collect()}
    assert out[1]["redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert out[1]["n_emails"] == 2
    assert out[2]["redacted"] == "server at <IP> and <IP> responded"
    assert out[2]["n_ips"] == 2
    assert out[3]["n_phones"] == 2 and "<PHONE>" in out[3]["redacted"]
    assert out[4]["redacted"] == "no pii here at all"
    assert out[5]["n_emails"] == 1 and out[5]["n_ips"] == 1 and out[5]["n_phones"] == 1


def test_pii_redact_cross_engine_on_planted_corpus(spark):
    """The catalog's sf corpus has no PII, so pin the Spark<->DuckDB regex
    dialect equivalence on a corpus where every pattern actually fires."""
    import duckdb

    from outpost_spark.ops.text import pii_redact

    rows = [
        (1, "alice@example.com then 192.168.0.1 then +1 555-123-4567"),
        (2, "multi a@b.io c@d.net 8.8.8.8 9.9.9.9 123-456-7890 098-765-4321"),
        (3, "edge 999.999.999.999 not-an-email@ @nope 12345678901"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spark_rows = sorted(
        tuple(r) for r in pii_redact(df, "text", "doc_id").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(r"""
        WITH e AS (
          SELECT doc_id, text AS t0,
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          FROM docs),
        i AS (
          SELECT doc_id, t0, t1,
                 regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
          FROM e)
        SELECT doc_id,
               regexp_replace(t2, '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS redacted,
               CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(t2, '\+?\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phones
        FROM i""").fetchall()
    )
    assert spark_rows == duck_rows


def test_repetition_stats_planted(spark):
    from outpost_spark.ops.text import repetition_stats

    boiler = "all work and no play"
    rows = [
        (1, "\n".join([boiler, "unique line one", boiler, boiler])),
        (2, "every line here\nis completely different\nfrom the others"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert out[1]["n_lines"] == 4
    assert out[1]["distinct_line_ratio"] == 0.5
    dup_mass = 3 * len(boiler) / (3 * len(boiler) + len("unique line one"))
    assert out[1]["dup_line_char_ratio"] == pytest.approx(dup_mass, abs=1e-6)
    assert out[2]["distinct_line_ratio"] == 1.0 and out[2]["dup_line_char_ratio"] == 0.0
    assert out[3]["n_lines"] == 0
    assert out[3]["distinct_line_ratio"] == 1.0 and out[3]["type_token_ratio"] == 1.0
    # repeated tokens lower the type-token ratio
    assert out[1]["type_token_ratio"] < out[2]["type_token_ratio"]


def test_curate_corpus_pipeline_stages(spark):
    from outpost_spark.ops.pipeline import curate_corpus

    good = (
        "this is a reasonably long document about the weather in the mountains, "
        "with some punctuation. it was written for the quality gate to accept it."
    )
    rows = [
        (1, good),
        (2, good),  # exact dup of 1 -> collapsed to 1
        (3, good.replace("weather", "climate")),  # near dup of 1 -> collapsed
        (4, "der hund und die katze sind nicht auf dem tisch. und das ist auch gut so, denn der tisch ist klein."),
        (5, "xx"),  # fails the quality length band
        (6, "привет мир " * 20),  # non-latin -> 'other' -> rejected
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["split"] for r in curate_corpus(df).collect()}
    assert set(out) == {1, 4}  # dups collapsed to 1; de kept; 5/6 gated out
    assert all(s in ("train", "val", "test") for s in out.values())
    # xxhash64 production path runs the same shape end-to-end
    fast = {r["doc_id"] for r in curate_corpus(df, hash_fn="xxhash64").collect()}
    assert fast == {1, 4}


def test_curate_corpus_paragraph_stage(spark):
    """paragraph_sep runs C4-style global paragraph dedup BEFORE the
    document-level stages: shared boilerplate is stripped, so documents
    that differ only in boilerplate collapse; a document reduced to
    nothing drops out entirely."""
    from outpost_spark.ops.pipeline import curate_corpus

    boiler = "subscribe to our newsletter for more updates, offers and news."
    body_a = (
        "this is a reasonably long document about the weather in the mountains, "
        "with some punctuation. it was written for the quality gate to accept it."
    )
    body_b = body_a.replace("weather", "climate")  # near dup of body_a
    rows = [
        # doc 0 holds the FIRST occurrence of the boiler paragraph — it
        # keeps it; every later occurrence is stripped
        (0, boiler + "\nmore unique content follows here, about cooking stews. "
            "it is long enough and punctuated well, so the gates accept it."),
        (1, body_a + "\n" + boiler),
        (2, body_b + "\n" + boiler),       # near dup of 1 once boiler is gone
        (4, boiler),                        # only boilerplate -> emptied, dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"] for r in curate_corpus(df, paragraph_sep="\n").collect()}
    # 2 collapses into 1 (bodies near-dup after the boiler is stripped);
    # 0 keeps its unique paragraph + the boiler; 4 vanishes entirely
    assert out == {0, 1}
    # without the paragraph stage the trailing boiler keeps 1/2 apart is
    # NOT guaranteed (they're still near-dups) — but doc 4 must survive,
    # since its text is only stripped by the paragraph stage
    base = {r["doc_id"] for r in curate_corpus(df).collect()}
    assert 4 in base


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_sampling_plans_are_shuffle_free(spark):
    ids = spark.range(1000).withColumnRenamed("id", "doc_id")
    sampled = hash_sample(ids, "doc_id", 0.25)
    split = hash_split(ids, "doc_id", [("a", 0.5), ("b", 0.5)])
    assert "Exchange" not in _physical_plan(sampled)
    assert "Exchange" not in _physical_plan(split)


def test_ivf_assignment_plan_is_shuffle_free(vectors):
    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    assigned = vectors.withColumn(
        "cid", assign_ivf_expr(F.col("embedding").cast("array<double>"), cents)
    )
    plan = _physical_plan(assigned)
    assert "Exchange" not in plan
    # no Python in the expression path either
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_clamps_to_available_rows(spark):
    rows = [(i, [float(i), 1.0] * 32) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = train_centroids_kmeans(df, "embedding", 8, iters=2)
    assert len(cents) == 3  # clamped to the data, no IndexError


def test_corpus_stats_ops(docs):
    from outpost_spark.ops.text import length_histogram, length_percentiles, top_tokens

    pct = {r["lang"]: r for r in length_percentiles(docs, "text", "lang").collect()}
    assert pct["en"]["n_docs"] == 5
    assert pct["en"]["p50"] <= pct["en"]["p90"] <= pct["en"]["p99"]
    hist = length_histogram(docs, "text", group_col="lang").collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()  # every doc lands in a bucket
    assert all(r["bucket_lo"] % 100 == 0 for r in hist)
    top = top_tokens(docs, "text", k=3).collect()
    assert top[0]["token"] == "the"  # dominant token in the planted corpus
    assert [r["n"] for r in top] == sorted((r["n"] for r in top), reverse=True)
    per_lang = top_tokens(docs, "text", k=2, group_col="lang").collect()
    by_lang = {}
    for r in per_lang:
        by_lang.setdefault(r["lang"], []).append(r["token"])
    assert all(len(v) <= 2 for v in by_lang.values())
    assert "de" in by_lang


def test_parse_byte_size_suffixes():
    from outpost_spark.ops.dedup import _parse_byte_size

    assert _parse_byte_size("134217728") == 134217728
    assert _parse_byte_size("128m") == 128 << 20
    assert _parse_byte_size("128MB") == 128 << 20
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size("64k") == 64 << 10
    assert _parse_byte_size("512b") == 512
    # malformed values fall back to the Spark default, never a tiny number
    assert _parse_byte_size("garbage") == 134217728
    assert _parse_byte_size("12x") == 134217728
    assert _parse_byte_size("") == 134217728


def test_stratified_quota_window_never_shuffles_bodies(docs):
    """The ranking window must run over the narrow (strata, frac, id)
    projection — the document text shuffles zero times in this plan."""
    import io
    import re
    from contextlib import redirect_stdout

    out = stratified_quota(docs, ["lang"], 2, "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"\(\d+\) Window\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m, f"no Window node in plan:\n{plan}"
    assert "text" not in m.group(1), f"Window carries the doc body: {m.group(1)}"


# ───────────────── stdlib multimodal decoders ─────────────────


def _encode_png(pixels, color_type, filters):
    """Minimal independent PNG writer for decoder tests: ``pixels`` is a
    list of rows, each row a list of per-channel tuples; one filter type
    per row (applied correctly, so every unfilter branch gets exercised)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    height = len(pixels)
    width = len(pixels[0])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = [0] * (width * ch)
    for y, row in enumerate(pixels):
        flat = [v for px in row for v in px]
        f = filters[y % len(filters)]
        raw.append(f)
        enc = []
        for x, v in enumerate(flat):
            a = flat[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                enc.append(v & 0xFF)
            elif f == 1:
                enc.append((v - a) & 0xFF)
            elif f == 2:
                enc.append((v - b) & 0xFF)
            elif f == 3:
                enc.append((v - ((a + b) >> 1)) & 0xFF)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((v - pred) & 0xFF)
        raw.extend(enc)
        prev = flat
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples, rate=8000, channels=1):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_decode_image_png_all_filters():
    from outpost_spark.ops.multimodal import decode_image

    # 4x4 RGB gradient; luminance is filter-independent, so decoding the
    # same image under every scanline filter type must agree exactly
    pixels = [
        [((x * 40) % 256, (y * 60) % 256, (x * y * 13) % 256) for x in range(4)]
        for y in range(4)
    ]
    expected = sum(
        0.299 * r + 0.587 * g + 0.114 * b for row in pixels for (r, g, b) in row
    ) / 16
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3]):
        d = decode_image(_encode_png(pixels, 2, filters))
        assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (4, 4, 3, 8)
        assert d["kind"] == "png"
        assert abs(d["mean_luminance"] - expected) < 1e-9, filters

    # grayscale: luminance = plain mean
    gray = [[(10,), (20,)], [(30,), (40,)]]
    d = decode_image(_encode_png(gray, 0, [0]))
    assert d["channels"] == 1 and abs(d["mean_luminance"] - 25.0) < 1e-9

    # RGBA: alpha ignored by luminance
    rgba = [[(100, 50, 25, 7)]]
    d = decode_image(_encode_png(rgba, 6, [0]))
    assert d["channels"] == 4
    assert abs(d["mean_luminance"] - (0.299 * 100 + 0.587 * 50 + 0.114 * 25)) < 1e-9

    with pytest.raises(ValueError):
        decode_image(b"not a png at all")


def test_decode_image_bomb_guards():
    """Crafted PNGs must never allocate unbounded memory: dims above the
    raw-byte ceiling decode header-only, and an IDAT that inflates past
    what the declared dims imply is truncated at exactly that bound."""
    import struct
    import zlib

    from outpost_spark.ops.multimodal import _MAX_RAW_BYTES, decode_image

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    magic = b"\x89PNG\r\n\x1a\n"

    # declared dims imply ~2^41 raw bytes; a real bomb would pair this
    # with a tiny highly-compressed IDAT — must return header-only fast
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 19, 8, 2, 0, 0, 0)
    bomb = magic + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 1024)
    ) + chunk(b"IEND", b"")
    d = decode_image(bomb)
    assert d["width"] == 1 << 20 and d["mean_luminance"] is None
    assert (1 << 20) * ((1 << 19) * 3 + 1) > _MAX_RAW_BYTES  # guard actually bit

    # small declared dims but an IDAT that would inflate to 64 MB: the
    # decode must cap the inflate at the declared size and still be exact
    w, h = 2, 2
    raw = bytes([0, 10, 20, 30, 40, 50, 60]) + bytes([0, 1, 2, 3, 4, 5, 6])
    padded = raw + b"\x00" * (64 << 20)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = magic + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(padded)
    ) + chunk(b"IEND", b"")
    d = decode_image(png)
    expected = (
        sum(0.299 * r + 0.587 * g + 0.114 * b
            for (r, g, b) in [(10, 20, 30), (40, 50, 60), (1, 2, 3), (4, 5, 6)])
        / 4
    )
    assert abs(d["mean_luminance"] - expected) < 1e-9


def test_decode_audio_wav():
    import math

    from outpost_spark.ops.multimodal import decode_audio

    n, amp = 8000, 16000  # 1 second at 8 kHz
    samples = [int(amp * math.sin(2 * math.pi * 440 * t / n)) for t in range(n)]
    d = decode_audio(_encode_wav(samples))
    assert d["kind"] == "wav"
    assert d["sample_rate"] == 8000 and d["channels"] == 1
    assert abs(d["duration_s"] - 1.0) < 1e-9
    # RMS of a sine = amplitude / sqrt(2), normalized by 2^15
    assert abs(d["rms"] - (amp / 32768.0) / math.sqrt(2)) < 1e-3
    with pytest.raises(ValueError):
        decode_audio(b"definitely not riff data")


def test_extract_features_decoded_mixed_corpus(spark):
    from outpost_spark.ops.multimodal import extract_features_decoded

    png = _encode_png([[(255, 0, 0), (0, 255, 0)]], 2, [0])
    wav = _encode_wav([0, 1000, -1000, 0])
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(wav)),
        (3, "text", bytearray(b"plain text blob, no codec")),
        (4, "image", bytearray(b"\x89PNG\r\n\x1a\ntruncated-garbage")),
    ]
    df = spark.createDataFrame(rows, "id bigint, modality string, content binary")
    out = {r["id"]: r.asDict() for r in extract_features_decoded(df).collect()}
    assert out[1]["decode_ok"] and out[1]["kind"] == "png"
    assert (out[1]["width"], out[1]["height"]) == (2, 1)
    assert out[2]["decode_ok"] and out[2]["kind"] == "wav"
    assert out[2]["sample_rate"] == 8000 and out[2]["rms"] > 0
    assert not out[3]["decode_ok"] and out[3]["kind"] is None
    assert not out[4]["decode_ok"]  # corrupt member survives, flagged
    assert all(r["n_bytes"] > 0 and len(r["checksum"]) == 32 for r in out.values())


def test_ivf_end_to_end_partition_pruning(spark, tmp_path):
    """IVF at rest: train -> assign -> partitionBy(cid) write -> probe.
    The probed scan must read only the nprobe/nlist slice of the files
    (partition pruning measured from the executed scan's own metrics, not
    inferred from the plan text), and return the same top-k as on-the-fly
    assignment."""
    import glob

    # 8 orthogonal planted clusters x 30 members, deterministic (no RNG);
    # ids interleaved so the deterministic smallest-id seeding spans all
    # clusters (ids 0..7 = one member of each)
    def vec(c, j):
        v = [0.0] * 64
        for r in range(8):
            v[r * 8 + c] = 10.0
        # spread large enough that cosines stay distinct at 6 decimals
        v[(c + 1) % 8] += 0.3 * j
        return v

    rows = [(j * 8 + c, vec(c, j)) for j in range(30) for c in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = train_centroids_kmeans(df, "embedding", 8, iters=3)

    path = str(tmp_path / "ivf_table")
    assigned = assign_ivf_pandas(df, "embedding", cents, out_col="ivf_cid")
    assigned.repartition("ivf_cid").write.partitionBy("ivf_cid").parquet(path)
    assert len(glob.glob(path + "/ivf_cid=*")) == 8  # kmeans truly separated

    table = spark.read.parquet(path)
    q = df.filter(F.col("vec_id") == 8).select(F.col("embedding").alias("qvec"))
    nprobe = 2
    out = cosine_topk_ivf(
        table, "embedding", q, cents, k=5, nprobe=nprobe, assign_col="ivf_cid"
    )
    got = [(r["vec_id"], r["score"]) for r in out.collect()]

    # the same probe computed without the table layout must agree
    fly = cosine_topk_ivf(df, "embedding", q, cents, k=5, nprobe=nprobe)
    assert got == [(r["vec_id"], r["score"]) for r in fly.collect()]
    assert got[0][0] == 8  # the query vector itself leads its own list
    assert len(got) == 5  # the probed list holds the full cluster

    # measured pruning: the executed scan read only the probed partitions
    # (AQE root -> finalPhysicalPlan for the real leaves)
    plan = out._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.finalPhysicalPlan()
    leaves = plan.collectLeaves()
    scan = next(
        leaves.apply(i)
        for i in range(leaves.size())
        if "parquet" in leaves.apply(i).nodeName().lower()
    )
    num_files = scan.metrics().apply("numFiles").value()
    total_files = len(glob.glob(path + "/ivf_cid=*/*.parquet"))
    assert 0 < num_files <= total_files * nprobe // 8 + 1, (num_files, total_files)
    assert scan.metrics().apply("numPartitions").value() == nprobe


def test_simhash_pairs_banded(docs):
    from outpost_spark.ops.dedup import simhash_pairs

    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert out[(1, 2)] == 0  # identical docs: same fingerprint
    # near-dup (one word changed) is within the radius; unrelated is not
    assert (1, 3) in out and 0 < out[(1, 3)] <= 3
    assert not any({a, b} == {1, 5} for a, b in out)
    with pytest.raises(ValueError):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, bands=4)
    with pytest.raises(ValueError):  # more bands than bits
        simhash_pairs(docs, "doc_id", "text", bits=32, max_hamming=2, bands=40)
    # non-dividing band counts are VALID (r13): widths split as equally
    # as the remainder allows, the pigeonhole bound never needs equal
    # segments — and the result matches the dividing layout exactly
    alt = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            docs, "doc_id", "text", bits=32, max_hamming=2, bands=5
        ).collect()
    }
    ref = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            docs, "doc_id", "text", bits=32, max_hamming=2, bands=4
        ).collect()
    }
    assert alt == ref


def test_simhash_pairs_64bit_production_path(docs):
    """64-bit fingerprints (xxhash64 base — the corpus-scale config where
    32 bits birthday-collide) find the same planted near-dups, and the
    width gate tracks the base hash."""
    from outpost_spark.ops.dedup import simhash, simhash_pairs

    # hamming distance scales with width: a radius of r bits at 32 bits
    # corresponds to ~2r at 64 — use 7 (bands=8) for the planted near-dup
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            docs, "doc_id", "text", bits=64, max_hamming=7, bands=8, hash_fn="xxhash64"
        ).collect()
    }
    assert out[(1, 2)] == 0  # identical docs: same 64-bit fingerprint
    assert (1, 3) in out and 0 < out[(1, 3)] <= 7
    assert not any({a, b} == {1, 5} for a, b in out)
    # fingerprints use the full width (some doc sets a high bit; with 8
    # docs the top-16 band values differ for unrelated docs)
    fps = [r["simhash"] for r in simhash(docs, "text", bits=64, hash_fn="xxhash64").collect()]
    assert any(abs(f) > (1 << 32) for f in fps)
    with pytest.raises(ValueError):
        simhash(docs, "text", bits=64)  # md5 base is 32-bit
    with pytest.raises(ValueError):
        simhash(docs, "text", bits=65, hash_fn="xxhash64")


def test_chunk_documents_windows(spark):
    from outpost_spark.ops.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(25))),
            (2, "one two"),  # single short chunk
            (3, ""),  # empty -> no chunks
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, "text", "doc_id", max_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # stride 8: windows at 0, 8, 16; last is the only short one
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert c1[1]["chunk_text"].split() == [f"w{i}" for i in range(8, 18)]
    assert c1[2]["chunk_text"].split() == [f"w{i}" for i in range(16, 25)]
    assert [r["n_tokens"] for r in c1] == [10, 10, 9]
    # overlap reconstruction: consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]
    assert by_doc[2][0]["chunk_text"] == "one two" and by_doc[2][0]["n_tokens"] == 2
    assert 3 not in by_doc
    with pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", max_tokens=10, overlap=10)
    # chunking is shuffle-free (pure expressions + generate)
    plan = (
        chunk_documents(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ngram_contamination_planted(spark):
    from outpost_spark.ops.dedup import ngram_contamination

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens -> 5 shared 8-grams
    train = spark.createDataFrame(
        [
            (1, "prefix words here " + shared),  # contains the benchmark run
            (2, shared.replace("s5", "x5")),  # run broken mid-way
            (3, "totally different content with many other words present"),
            (4, "tiny"),  # too short to have any 8-gram
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, shared)], "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in ngram_contamination(train, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["matched_ngrams"] == 5
    assert not out[2]["contaminated"]  # s5->x5 breaks every full 8-gram
    assert not out[3]["contaminated"] and not out[4]["contaminated"]
    assert len(out) == 4  # one row per train doc, clean docs included
    # production hash path agrees on the planted corpus
    fast = {
        r["doc_id"]: r["matched_ngrams"]
        for r in ngram_contamination(train, bench, n=8, hash_fn="xxhash64").collect()
    }
    assert fast == {k: v["matched_ngrams"] for k, v in out.items()}


def test_dedup_paragraphs_global(spark):
    from outpost_spark.ops.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon boilerplate footer\nunique one"),
            (2, "gamma delta\ncommon boilerplate footer\nunique two"),
            (3, "common boilerplate footer"),  # entirely deduped away
            (4, ""),  # empty doc stays empty, removes nothing
            (5, "repeat me\nrepeat me\nlast"),  # within-doc repeat collapses too
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs, "text", "doc_id").collect()}
    assert len(out) == 5  # one row per input document, always
    # first global occurrence (doc 1) keeps the shared paragraph
    assert out[1]["text_clean"] == "alpha beta\ncommon boilerplate footer\nunique one"
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (3, 0)
    assert out[2]["text_clean"] == "gamma delta\nunique two"
    assert (out[2]["n_kept"], out[2]["n_removed"]) == (2, 1)
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 1
    assert out[4]["text_clean"] == "" and out[4]["n_removed"] == 0
    assert out[5]["text_clean"] == "repeat me\nlast"
    # order within a document is preserved after removal
    assert out[2]["text_clean"].split("\n")[0] == "gamma delta"
    # the dedup decision must never shuffle paragraph text: every
    # Exchange in the plan carries only (id, pos, hash)-derived columns
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        dedup_paragraphs(docs, "text", "doc_id").explain("formatted")
    plan = buf.getvalue()
    exchanges = re.findall(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert exchanges, plan  # the agg/join shuffles exist...
    for cols in exchanges:  # ...and none of them carries text
        assert "__p#" not in cols and "text#" not in cols, cols


def test_chunk_documents_reconstruction_property(spark):
    """Property (hypothesis): for any token count, concatenating chunk 0
    with each subsequent chunk minus its leading `overlap` tokens yields
    exactly the original token stream — no token lost, none duplicated
    beyond the declared overlap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from outpost_spark.ops.text import chunk_documents

    @settings(max_examples=15, deadline=None)
    @given(
        n_tokens=st.integers(min_value=0, max_value=60),
        max_tokens=st.integers(min_value=2, max_value=20),
        overlap=st.integers(min_value=0, max_value=19),
    )
    def check(n_tokens, max_tokens, overlap):
        if overlap >= max_tokens:
            return
        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = sorted(
            chunk_documents(df, "text", "doc_id", max_tokens=max_tokens, overlap=overlap).collect(),
            key=lambda r: r["chunk_idx"],
        )
        if n_tokens == 0:
            assert rows == []
            return
        stride = max_tokens - overlap
        rebuilt = []
        for r in rows:
            toks = r["chunk_text"].split()
            assert len(toks) == r["n_tokens"] <= max_tokens
            assert r["chunk_idx"] * stride < n_tokens  # no window starts past the end
            start = 0 if r["chunk_idx"] == 0 else len(rebuilt) - (r["chunk_idx"] * stride)
            rebuilt.extend(toks[start:] if r["chunk_idx"] else toks)
        assert rebuilt == [f"t{i}" for i in range(n_tokens)]
        # only the FINAL chunk may be short
        assert all(r["n_tokens"] == max_tokens for r in rows[:-1])

    check()


def test_sample_by_rates_mixing(spark):
    from outpost_spark.ops.sampling import hash_sample, sample_by_rates

    rows = [(i, "en" if i % 3 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sample_by_rates(df, "lang", {"en": 0.5, "de": 1.0}, "doc_id", default_rate=0.0)
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["de"] == 200  # rate 1.0 keeps every row
    assert 140 < by_lang["en"] < 260  # ~50% of 400
    # rate-1.0-for-everyone == identity; rate-0 group vanishes
    assert sample_by_rates(df, "lang", {}, "doc_id", default_rate=1.0).count() == 600
    assert (
        sample_by_rates(df, "lang", {"en": 0.0, "de": 0.0}, "doc_id").count() == 0
    )
    # per-group membership equals hash_sample at the same seed/rate
    en_mix = {r["doc_id"] for r in out.filter("lang = 'en'").collect()}
    en_direct = {
        r["doc_id"]
        for r in hash_sample(df.filter("lang = 'en'"), "doc_id", 0.5, seed="mix").collect()
    }
    assert en_mix == en_direct
    with pytest.raises(ValueError):
        sample_by_rates(df, "lang", {"en": 1.5}, "doc_id")
    # pure map: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_paragraph_sep_is_literal_not_regex(spark):
    from outpost_spark.ops.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "alpha|shared part|unique"), (2, "beta|shared part|other")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs, "text", "doc_id", sep="|").collect()}
    # '|' as a regex would be empty alternation and shred the text; as a
    # literal it splits into 3 paragraphs and dedups the shared one
    assert out[1]["text_clean"] == "alpha|shared part|unique"
    assert out[2]["text_clean"] == "beta|other" and out[2]["n_removed"] == 1


def test_simhash_bits_validated(docs):
    from outpost_spark.ops.dedup import simhash, simhash_pairs

    with pytest.raises(ValueError, match="bits"):
        simhash(docs, "text", bits=64)
    with pytest.raises(ValueError, match="bits"):
        simhash_pairs(docs, "doc_id", "text", bits=48, max_hamming=3)


def test_quantize_embeddings_roundtrip(vectors):
    from outpost_spark.ops.similarity import (
        cosine_expr,
        dequantize_expr,
        quantize_embeddings,
    )

    q = quantize_embeddings(vectors, "embedding")
    rows = q.collect()
    for r in rows:
        assert all(-127 <= x <= 127 for x in r["qvec"])
        assert len(r["qvec"]) == len(r["embedding"])
        # the max-magnitude element quantizes to exactly +/-127
        assert max(abs(x) for x in r["qvec"]) == 127
    # reconstruction preserves direction almost exactly
    recon = q.select(
        cosine_expr(
            F.col("embedding").cast("array<double>"),
            dequantize_expr(F.col("qvec"), F.col("qscale")),
        ).alias("cos")
    ).collect()
    assert all(r["cos"] > 0.999 for r in recon)
    # all-zero vector: zero scale, zero codes, no division blow-up
    z = quantize_embeddings(
        vectors.sparkSession.createDataFrame(
            [(9, [0.0] * 64)], "vec_id bigint, embedding array<float>"
        ),
        "embedding",
    ).collect()[0]
    assert z["qscale"] == 0.0 and set(z["qvec"]) == {0}
    # pure map: no shuffle
    assert "Exchange" not in q._jdf.queryExecution().executedPlan().toString()


def _substring_dedup_reference(rows, window):
    """Character-level Python reference for dedup_substrings (stride 1):
    every char covered by a non-first-occurrence window is removed."""
    first = {}
    for did, text in sorted(rows):
        for pos in range(len(text) - window + 1):
            key = text[pos : pos + window]
            first.setdefault(key, (did, pos))
    out = {}
    for did, text in rows:
        removed = set()
        for pos in range(len(text) - window + 1):
            if first[text[pos : pos + window]] != (did, pos):
                removed.update(range(pos, pos + window))
        out[did] = "".join(c for i, c in enumerate(text) if i not in removed)
    return out


def test_dedup_substrings_matches_char_level_reference(spark):
    """Property: the span-merge-and-cut fold must equal character-level
    removal of every non-first window occurrence, on adversarial small
    alphabets (dense repeats, adjacent/overlapping spans, full-doc
    coverage, spans touching both ends)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from outpost_spark.ops.dedup import dedup_substrings

    @settings(max_examples=12, deadline=None)
    @given(
        texts=st.lists(st.text(alphabet="ab", max_size=24), min_size=1, max_size=5),
        window=st.integers(min_value=2, max_value=4),
    )
    def run(texts, window):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: r["text_clean"]
            for r in dedup_substrings(df, "text", "doc_id", window=window).collect()
        }
        assert got == _substring_dedup_reference(rows, window)

    run()


def test_semantic_dedup_collapses_planted_clusters(vectors):
    """IVF-blocked pairs + components + min-id survivors: the planted
    near-identical pair (0, 1) collapses to 0; unrelated vectors all
    survive; recall holds even when members assign to different lists
    (both probe directions are unioned)."""
    from outpost_spark.ops.similarity import (
        embedding_near_dup_pairs_ivf,
        semantic_dedup,
    )

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.3, -0.5, 0.1] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs_ivf(
            vectors, "embedding", cents, threshold=0.999
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.999
    assert all({a, b} == {0, 1} for a, b in pairs)  # nothing else is that close
    survivors = {
        r["vec_id"] for r in semantic_dedup(vectors, "embedding", cents, threshold=0.999).collect()
    }
    assert survivors == {0, 2, 3, 4}  # 1 collapsed into 0
    # at a looser threshold vector 3 (cosine ~0.9966 to 0) joins the
    # cluster and the whole component collapses to its min id
    loose = {
        r["vec_id"] for r in semantic_dedup(vectors, "embedding", cents, threshold=0.99).collect()
    }
    assert loose == {0, 2, 4}


@pytest.mark.slow
def test_knn_join_bulk_matches_brute_when_probing_everything(vectors):
    """The BLAS-backed bulk path degenerates to exact when nprobe = nlist
    — it must reproduce the brute-force top-k (ids, rounded scores,
    ranks) for every source row."""
    from outpost_spark.ops.similarity import knn_join_brute, knn_join_bulk

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.3, -0.5, 0.1] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    brute = {
        (r["src_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in knn_join_brute(vectors, "embedding", k=2).collect()
    }
    bulk = {
        (r["src_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in knn_join_bulk(
            vectors, "embedding", cents, k=2, nprobe=len(cents)
        ).collect()
    }
    assert bulk == brute
    assert bulk[(0, 1)][0] == 1 and bulk[(1, 1)][0] == 0


def test_bulk_paths_on_planted_corpus(spark):
    """200-vector planted corpus (XOR-1 partner pairs + random
    singletons): knn_join_bulk finds every partner at rank 1, and
    semantic_dedup_bulk removes exactly one member per planted pair and
    never a singleton.  Mirrors the 1M-scale bench's ground-truth checks
    at pytest size."""
    import numpy as np

    from outpost_spark.ops.similarity import knn_join_bulk, semantic_dedup_bulk

    rng = np.random.default_rng(7)
    n, n_cl, dims = 200, 40, 32
    base = rng.uniform(-1, 1, size=(n, dims))
    for c in range(n_cl // 2):
        base[2 * c + 1] = base[2 * c] + rng.uniform(-0.05, 0.05, size=dims)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [[float(x) for x in base[i]] for i in range(n_cl, n_cl + 12)]

    knn = knn_join_bulk(df, "embedding", cents, k=3, nprobe=4).collect()
    rank1 = {r["src_id"]: r["neighbor_id"] for r in knn if r["rank"] == 1}
    hits = sum(1 for s in range(n_cl) if rank1.get(s) == s ^ 1)
    assert hits == n_cl  # every planted partner found at rank 1

    survivors = {
        r["vec_id"]
        for r in semantic_dedup_bulk(
            df, "embedding", cents, threshold=0.95, nprobe=4
        ).collect()
    }
    assert survivors == {2 * c for c in range(n_cl // 2)} | set(range(n_cl, n))


def test_semantic_dedup_knn_candidate_generator(vectors):
    """candidate_k switches the pair source to the batched k-NN join's
    top-k; on the fixture it must agree with the all-pairs generator."""
    from outpost_spark.ops.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.5, 0.2] * 16, [-1.0, 0.3, -0.5, 0.1] * 16, [0.0, 1.0, -1.0, 0.7] * 16]
    for thr in (0.999, 0.99):
        allpairs = {
            r["vec_id"]
            for r in semantic_dedup(vectors, "embedding", cents, threshold=thr).collect()
        }
        via_knn = {
            r["vec_id"]
            for r in semantic_dedup(
                vectors, "embedding", cents, threshold=thr, candidate_k=3
            ).collect()
        }
        assert via_knn == allpairs


def test_bulk_catalog_twins_match_literal_path(spark, sf_dir):
    """The BLAS bulk ops at REALISTIC nprobe must agree with their
    oracle-checked literal-SQL twins on the test corpus: identical
    semantic-dedup survivor set, and identical knn rows on ranks 1..k-1
    (the rank-k tail may flip on sub-1e-6 BLAS-vs-sequential summation
    near-ties — the documented caveat, bounded here at <5 %).

    r07 note: the CATALOG bulk entries now run the nprobe=nlist
    degenerate config with exact brute-force oracles, so this test pins
    the realistic-nprobe config (nprobe=2, the one users deploy) by
    invoking the ops directly with the literal entries' geometry."""
    from outpost_spark.ops.similarity import knn_join_bulk, semantic_dedup_bulk
    from outpost_spark.queries_catalog import (
        _REGISTRY,
        _ivf_seeds,
        _perturbed_embeddings,
        _t,
    )

    s_lit = {
        r["vec_id"] for r in _REGISTRY["embed_semantic_dedup"][0](spark, sf_dir).collect()
    }
    s_bulk = {
        r["vec_id"]
        for r in semantic_dedup_bulk(
            _perturbed_embeddings(spark, sf_dir),
            "embedding",
            _ivf_seeds(spark, sf_dir, 24),
            id_col="vec_id",
            threshold=0.95,
            nprobe=2,
        ).collect()
    }
    assert s_bulk == s_lit

    lit = {
        (r["src_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in _REGISTRY["embed_knn_join"][0](spark, sf_dir).collect()
    }
    bulk = {
        (r["src_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in knn_join_bulk(
            _t(spark, sf_dir, "embeddings"),
            "embedding",
            _ivf_seeds(spark, sf_dir, 24),
            id_col="vec_id",
            k=3,
            nprobe=2,
        ).collect()
    }
    head_lit = {t for t in lit if t[3] < 3}
    head_bulk = {t for t in bulk if t[3] < 3}
    assert head_bulk == head_lit
    assert len(lit - bulk) / len(lit) < 0.05


def test_product_quantization_roundtrip_and_adc_search(spark):
    """PQ (Jegou et al.): codebooks trained on a deterministic sample,
    vectors encoded to m codes, reconstruction via literal-codebook
    lookup, ADC top-k with zero Python at query time.  Planted near-dup
    partners must be each other's top ADC hit, reconstruction must beat
    the trivial zero baseline by a wide margin, and the search plan must
    contain no Python nodes."""
    import numpy as np

    from outpost_spark.ops.similarity import (
        pq_decode_expr,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(11)
    n, dims = 400, 32
    base = rng.uniform(-1, 1, size=(n, dims))
    base[1] = base[0] + rng.uniform(-0.02, 0.02, size=dims)  # planted pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )
    books = pq_train(df, "embedding", m=8, k=16, sample_n=256, iters=6)
    assert len(books) == 8 and all(len(b) == 16 for b in books)

    codes = pq_encode(df, "embedding", books)
    rows = codes.collect()
    assert len(rows) == n and all(len(r["pq_codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["pq_codes"])
    # determinism
    again = {r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(df, "embedding", books).collect()}
    assert all(again[r["vec_id"]] == list(r["pq_codes"]) for r in rows)

    # reconstruction: mean squared error far below the vector's own energy
    recon = codes.join(df, "vec_id").select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                pq_decode_expr(F.col("pq_codes"), books),
                F.col("embedding"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sq_err"),
    )
    mse = recon.agg(F.avg("sq_err")).collect()[0][0] / dims
    assert mse < 0.12  # vs ~0.33 per-dim variance of U(-1,1)

    # ADC: query with vector 0 -> itself rank 1, planted partner rank 2.
    # Codes are checkpointed first — the deployment shape is a STORED
    # codes table, and the zero-Python claim is about query time, not
    # the (Arrow-batched) one-off encode.
    codes = codes.localCheckpoint(eager=True)
    top = pq_topk(codes, list(base[0]), books, k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    plan = pq_topk(codes, list(base[0]), books, k=2)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF", "MapInPandas"):
        assert marker not in plan, f"Python node in ADC plan:\n{plan}"
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, "embedding", m=5)

    # ADC + exact rerank (r06): with shortlist >= corpus the result IS
    # the exact dot-product top-k (rerank sees every row); with a small
    # shortlist it returns exactly k rows ordered by true score
    from outpost_spark.ops.similarity import dot_expr, pq_topk_rerank

    q = list(base[3])
    exact = [
        r["vec_id"]
        for r in df.select(
            "vec_id",
            F.round(dot_expr(F.col("embedding"), F.lit(q)), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    ]
    full = pq_topk_rerank(codes, df, q, books, k=5, shortlist=n).collect()
    assert [r["vec_id"] for r in full] == exact

    # r16: a caller-supplied sample (the PQ catalog entries' pushed-down
    # vec_id<16 fetch, guide §5) must train identical codebooks to the
    # default driver-collect path over the same rows
    sample = [
        list(r["v"])
        for r in df.orderBy("vec_id")
        .limit(256)
        .select(F.col("embedding").alias("v"))
        .collect()
    ]
    books_direct = pq_train(df, "embedding", m=8, k=16, iters=6, sample_rows=sample)
    assert books_direct == books
    small = pq_topk_rerank(codes, df, q, books, k=5, shortlist=40).collect()
    assert len(small) == 5
    assert [r["score"] for r in small] == sorted(
        (r["score"] for r in small), reverse=True
    )

    # IVF + PQ composed (r13, IVFADC): with nprobe = nlist the result
    # IS the plain rerank (no pruning), and with nprobe=1 only the
    # query's own list is scanned — every returned id shares the
    # query's list assignment
    from outpost_spark.ops.similarity import assign_ivf_expr, pq_topk_ivf

    seeds = [list(base[i]) for i in range(4)]
    with_cid = codes.join(
        df.select(
            "vec_id",
            assign_ivf_expr(F.col("embedding"), seeds).alias("ivf_cid"),
        ),
        "vec_id",
    ).localCheckpoint(eager=True)
    everything = pq_topk_ivf(
        with_cid, q, books, seeds, k=5, nprobe=4, shortlist=n, vectors_df=df
    ).collect()
    assert [r["vec_id"] for r in everything] == exact
    probed = pq_topk_ivf(with_cid, q, books, seeds, k=5, nprobe=1).collect()
    cid_of = {
        r["vec_id"]: r["ivf_cid"] for r in with_cid.select("vec_id", "ivf_cid").collect()
    }
    assert len(probed) == 5
    assert {cid_of[r["vec_id"]] for r in probed} == {cid_of[3]}


def test_minhash_short_docs_never_band_or_pair(spark):
    """Docs shorter than the shingle carry the all-sentinel signature;
    every such doc previously landed in ONE band bucket (a quadratic
    candidate hazard on corpora with many empty docs).  They must never
    pair — with each other or with real docs — on every hash path, and
    real near-dups must still be found alongside them."""
    rows = [
        (1, ""), (2, "ab"), (3, "abc"), (4, ""),
        (5, BASE), (6, BASE.replace("quick", "swift")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for fn in ("md5", "xxhash64", "numpy"):
        got = {
            (r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(
                df, "doc_id", "text", threshold=0.5, hash_fn=fn
            ).collect()
        }
        assert got == {(5, 6)}, f"hash_fn={fn}: {got}"


def test_minhash_cross_pairs_decontamination(spark):
    """Cross-corpus near-dup join: train docs matching ANY benchmark doc
    are flagged with exact-verified Jaccard; unrelated docs are not."""
    from outpost_spark.ops.dedup import minhash_cross_pairs

    train = spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE.replace("quick", "swift")),   # near dup of the bench doc
            (3, "completely different text about spark query engines and columnar io paths"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, BASE)], "doc_id bigint, text string")
    out = {
        (r["train_id"], r["bench_id"]): r["jaccard"]
        for r in minhash_cross_pairs(train, bench, "doc_id", "text", threshold=0.5).collect()
    }
    assert out[(1, 100)] == 1.0
    assert (2, 100) in out and out[(2, 100)] > 0.8
    assert not any(t == 3 for t, _ in out)
    # xxhash64 production path finds the same pair set
    fast = {
        (r["train_id"], r["bench_id"])
        for r in minhash_cross_pairs(
            train, bench, "doc_id", "text", threshold=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert fast == set(out)


def test_url_normalization_and_dedup(spark):
    from outpost_spark.ops.text import dedup_by_url, normalize_url_expr

    rows = [
        (1, "https://www.Example.com/Page/1?utm=x"),
        (2, "http://example.com/page/1/"),
        (3, "HTTPS://EXAMPLE.COM/page/1#frag"),
        (4, "https://example.com/page/2"),
        (5, "https://other.org/"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    norm = {r["doc_id"]: r["n"] for r in df.select("doc_id", normalize_url_expr(F.col("url")).alias("n")).collect()}
    assert norm[1] == norm[2] == norm[3] == "example.com/page/1"
    assert norm[4] == "example.com/page/2"
    assert norm[5] == "other.org"
    out = {r["canonical_url"]: (r["canonical_id"], r["copies"]) for r in dedup_by_url(df, "url", "doc_id").collect()}
    assert out["example.com/page/1"] == (1, 3)
    assert out["example.com/page/2"] == (4, 1)


def test_pack_sequences_invariants_and_quality(spark):
    """Best-fit-decreasing sequence packing: every doc packed exactly
    once, no pack exceeds max_len, crafted inputs pack optimally,
    realistic lengths reach >=90% fill, oversize docs error (or take
    their own bin), and packing is deterministic."""
    import numpy as np

    from outpost_spark.ops.packing import pack_sequences, pack_stats

    # crafted: lengths 60,40 + 50,50 + 70,30 pack into exactly 3 bins of 100
    crafted = spark.createDataFrame(
        [(1, 60), (2, 40), (3, 50), (4, 50), (5, 70), (6, 30)], "doc_id bigint, n bigint"
    )
    packed = pack_sequences(crafted, "doc_id", "n", max_len=100, n_groups=1)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3, 4, 5, 6}
    st = pack_stats(packed, max_len=100).collect()
    assert len(st) == 3 and all(r["used"] == 100 for r in st)

    # realistic: lognormal-ish lengths, 2000 docs
    rng = np.random.default_rng(21)
    lens = np.clip((rng.lognormal(5.5, 0.8, 2000)).astype(int), 10, 2048)
    df = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(lens)], "doc_id bigint, n bigint"
    )
    packed = pack_sequences(df, "doc_id", "n", max_len=2048, n_groups=8)
    assert packed.count() == 2000
    st = pack_stats(packed, max_len=2048)
    assert st.filter(F.col("used") > 2048).count() == 0
    n_packs = st.count()
    fill = sum(int(l) for l in lens) / (n_packs * 2048)
    assert fill >= 0.90, f"fill ratio {fill:.3f} over {n_packs} packs"

    # determinism
    again = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(df, "doc_id", "n", max_len=2048, n_groups=8).collect()}
    assert again == {(r["doc_id"], r["pack_id"]) for r in packed.collect()}

    # oversize handling
    big = spark.createDataFrame([(1, 5000), (2, 100)], "doc_id bigint, n bigint")
    with pytest.raises(Exception, match="exceeds max_len"):
        pack_sequences(big, "doc_id", "n", max_len=2048, n_groups=1).collect()
    own = pack_sequences(big, "doc_id", "n", max_len=2048, n_groups=1, oversize="own_bin")
    assert own.count() == 2 and own.select("pack_id").distinct().count() == 2


def test_redact_pii_planted(spark):
    """PII scrubbing: each pattern redacts its plant, the chain order
    protects emails/IPs from the phone pattern, counts agree with the
    inserted placeholders (progressive counting — r10 fix), and clean
    text passes through untouched."""
    from outpost_spark.ops.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@sub.example.co.uk and bob@ex.io ok"),
            (2, "host 192.168.1.254 then 10.0.0.1 up"),
            (3, "call +1 555-123-4567 or (089) 123-4567 now"),
            (4, "no pii here at all"),
            (5, "mixed a@b.com via 8.8.8.8 dial +49 30 1234-567"),
            (6, "ping bob@1.2.3.4.example.com plus 5.6.7.8 up"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text", "doc_id").collect()}
    assert out[1]["redacted_text"] == "mail <EMAIL> and <EMAIL> ok"
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert out[2]["redacted_text"] == "host <IPV4> then <IPV4> up"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_phones"] == 2
    assert out[4]["redacted_text"] == "no pii here at all"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)
    # ordering: the IP is consumed by the IPv4 stage, never half-eaten
    # by the phone pattern
    assert out[5]["redacted_text"] == "mixed <EMAIL> via <IPV4> dial <PHONE>"
    # count/placeholder agreement: the IPv4-looking run inside the email
    # domain is swallowed by <EMAIL>, so it must NOT count as an IPv4
    # (previously counts ran on the original text and said n_ipv4=2)
    assert out[6]["redacted_text"] == "ping <EMAIL> plus <IPV4> up"
    assert out[6]["n_emails"] == 1
    assert out[6]["n_ipv4"] == 1
    assert out[6]["redacted_text"].count("<IPV4>") == out[6]["n_ipv4"]


def test_gopher_quality_rules(spark):
    """Each Gopher rule (Rae et al. 2021 A1.1) must reject exactly the
    crafted document that violates it, and a clean document passes."""
    from outpost_spark.ops.text import gopher_quality

    good = ("the quick brown fox jumps over the lazy dog and runs to have "
            "fun with friends that play games every single afternoon be "
            "cause sunny weather makes everyone smile widely today ") * 2
    rows = [
        (1, good),                                        # passes everything
        (2, "the be to of"),                              # too few words
        (3, ("a b c d " * 20) + "the be to of and that"),  # mean word len < 3
        (4, good + " ###### " * 20),                      # symbol ratio
        (5, "\n".join(["- " + w for w in good.split()][:60]) + "\nthe be"),  # bullets
        (6, " ".join(["12345"] * 60) + " the be to"),     # alpha fraction
        (7, " ".join(["zebra"] * 60)),                    # no required stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df, "text", "doc_id").collect()}
    assert out[1]["passes_gopher"]
    assert not out[2]["ok_word_count"] and not out[2]["passes_gopher"]
    assert not out[3]["ok_mean_word_len"]
    assert not out[4]["ok_symbol_ratio"]
    assert not out[5]["ok_bullet_lines"]
    assert not out[6]["ok_alpha_words"]
    assert not out[7]["ok_stopwords"]


def test_approx_top_tokens_matches_exact_and_survives_adversarial_tail(spark, sf_dir):
    """MG-sketch top-k == exact top-k on the real corpus, and on an
    adversarial corpus where a huge distinct tail (every doc unique
    tokens) tries to evict the planted heavy hitters from the summaries."""
    import os as _os

    from outpost_spark.ops.text import approx_top_tokens, top_tokens

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    exact = [(r["token"], r["n"]) for r in top_tokens(docs, "text", k=20).collect()]
    approx = [(r["token"], r["n"]) for r in approx_top_tokens(docs, "text", k=20).collect()]
    assert approx == exact

    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d heavy{i % 3}") for i in range(3000)]
    adv = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        (r["token"], r["n"])
        for r in approx_top_tokens(adv, "text", k=3, summary_size=64).collect()
    ]
    assert got == [("heavy0", 1000), ("heavy1", 1000), ("heavy2", 1000)]


def test_sample_by_token_budget_matches_global_window_definition(spark, sf_dir):
    """The bucketed no-global-sort plan must select EXACTLY the docs the
    literal global cumulative-sum window selects, for several budgets
    including 0, a mid boundary, and beyond-total; selection is
    deterministic and total weight never exceeds the budget."""
    import os as _os

    from pyspark.sql import Window

    from outpost_spark.ops.sampling import hash_fraction, sample_by_token_budget

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    key = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("budget|"), F.col("doc_id").cast("string"))), 1, 15),
            16, 10,
        ).cast("long")
    )
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    for budget in (0, 1, 60000, int(total), int(total) + 10):
        ref = {
            r["doc_id"]
            for r in docs.withColumn("__k", key)
            .withColumn("__c", F.sum("n_chars").over(Window.orderBy("__k", "doc_id")))
            .filter(F.col("__c") <= budget)
            .collect()
        }
        got_df = sample_by_token_budget(docs, "doc_id", "n_chars", budget)
        got = {r["doc_id"] for r in got_df.collect()}
        assert got == ref, f"budget={budget}"
        used = got_df.agg(F.coalesce(F.sum("n_chars"), F.lit(0))).collect()[0][0]
        assert used <= budget or budget >= total
    # xxhash64 twin runs and respects the budget (different selection)
    fast = sample_by_token_budget(docs, "doc_id", "n_chars", 60000, hash_fn="xxhash64")
    assert fast.agg(F.sum("n_chars")).collect()[0][0] <= 60000


def test_asof_join_semantics(spark):
    """As-of: latest right row with ts <= left ts per key; ties (equal
    ts) MATCH (DuckDB ASOF `>=` semantics); no prior row -> nulls;
    tolerance nulls out stale matches; one shuffle per side, no join
    node in the plan."""
    from datetime import datetime, timezone

    from outpost_spark.ops.joins import asof_join

    T = lambda s: datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    left = spark.createDataFrame(
        [(1, "a", T(10)), (2, "a", T(30)), (3, "a", T(5)), (4, "b", T(10)), (5, "c", T(50))],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", T(10), 100), ("a", T(20), 200), ("b", T(11), 300)],
        "k string, rts timestamp, val bigint",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["val"]
    )
    got = {r["id"]: r["asof_val"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None, 4: None, 5: None}
    # tolerance: id=2 matched rts=20 (10s stale) — a 5s tolerance drops it
    tol = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["val"],
        tolerance_seconds=5,
    )
    got_tol = {r["id"]: r["asof_val"] for r in tol.collect()}
    assert got_tol[1] == 100 and got_tol[2] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join node


def test_range_join_semantics(spark):
    """Range join: inclusive bounds, intervals spanning many bins still
    match, per-key isolation, and left-join keeps unmatched facts."""
    from outpost_spark.ops.joins import range_join

    facts = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 250), (3, "b", 100), (4, "a", 999)],
        "id bigint, k string, ts bigint",
    )
    iv = spark.createDataFrame(
        [("a", 10, 100, 260), ("b", 20, 90, 110), ("a", 30, 500, 600)],
        "k string, win bigint, s bigint, e bigint",
    )
    inner = range_join(
        facts, iv, on="k", fact_ts="ts", start_col="s", end_col="e",
        bin_width_seconds=50,
    )
    got = {(r["id"], r["iv_win"]) for r in inner.collect()}
    assert got == {(1, 10), (2, 10), (3, 20)}  # inclusive start, in-range, key-isolated
    left = range_join(
        facts, iv, on="k", fact_ts="ts", start_col="s", end_col="e",
        bin_width_seconds=50, how="left",
    )
    lgot = {(r["id"], r["iv_win"]) for r in left.collect()}
    assert lgot == {(1, 10), (2, 10), (3, 20), (4, None)}
    with pytest.raises(ValueError, match="inner/left"):
        range_join(facts, iv, on="k", fact_ts="ts", start_col="s", end_col="e",
                   bin_width_seconds=50, how="outer")


def test_mojibake_detection_planted_artifacts(spark):
    """Planted mojibake (the synthetic corpus is clean, so the oracle
    row only pins zeros): classic \u00c3\u00a9 / \u00e2\u20ac\u2122 /
    \u00c2+space artifact sequences count per occurrence; clean unicode
    text -- including genuine accented words -- stays at zero."""
    from outpost_spark.ops.text import mojibake_stats

    # explicit codepoints so no editor/encoding step can re-mangle them:
    # 'caf\u00e9' mojibake = 'caf' + U+00C3 U+00A9; '\u2019' (cp1252 path)
    # = U+00E2 U+20AC U+2122; NBSP mojibake = U+00C2 + space
    df = spark.createDataFrame(
        [
            (1, "caf\u00c3\u00a9 menu"),
            (2, "it\u00e2\u20ac\u2122s fine"),
            (3, "caf\u00c3\u00a9 and \u00c3\u00a8 twice"),
            (4, "ok\u00c2 spaced"),
            (5, "clean caf\u00e9, na\u00efve, em\u2014dash"),
            (6, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_mojibake"], r["has_mojibake"])
        for r in mojibake_stats(df, "text", "doc_id").collect()
    }
    assert got == {
        1: (1, True),
        2: (1, True),
        3: (2, True),
        4: (1, True),
        5: (0, False),
        6: (0, False),
    }


def test_assign_shuffled_shards_invariants(spark, sf_dir):
    """Shard assignment: every doc exactly once, pos is a dense 1..n_s
    sequence per shard, deterministic across runs, hash-stable under
    corpus growth (old docs keep their shard), and the xxhash64 twin
    holds the same invariants."""
    import os as _os

    from outpost_spark.ops.sampling import assign_shuffled_shards

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    out = assign_shuffled_shards(docs, "doc_id", n_shards=16)
    rows = out.collect()
    assert len(rows) == n and len({r["doc_id"] for r in rows}) == n
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(16))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense
    # determinism
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    # growth stability: shard unchanged on the half-corpus
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half_shards = {
        r["doc_id"]: r["shard"]
        for r in assign_shuffled_shards(half, "doc_id", n_shards=16).collect()
    }
    full_shards = {r["doc_id"]: r["shard"] for r in rows}
    assert all(full_shards[d] == s for d, s in half_shards.items())
    fast = assign_shuffled_shards(docs, "doc_id", n_shards=16, hash_fn="xxhash64")
    assert fast.count() == n


def test_dedup_keep_best_prefers_high_score_over_min_id(spark):
    """Quality-weighted survivors: the component keeps its best-scored
    member (NOT the min id), ties break to the lowest id, untouched
    docs pass through, and multi-pair components collapse transitively."""
    from outpost_spark.ops.dedup import dedup_keep_best, dedup_keep_canonical

    docs = spark.createDataFrame(
        [(1, 0.25), (2, 0.75), (3, 0.75), (4, 0.5), (5, 1.0), (9, 0.0)],
        "doc_id bigint, q double",
    )
    # component {1,2,3} via chain 1-2, 2-3; component {4,5}; 9 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a bigint, id_b bigint"
    )
    best = {r["doc_id"] for r in dedup_keep_best(docs, pairs, "doc_id", "q").collect()}
    # {1,2,3}: 2 and 3 tie at 0.75 -> 2 (lowest id of the best); {4,5} -> 5
    assert best == {2, 5, 9}
    canon = {
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    }
    assert canon == {1, 4, 9}  # min-id semantics, for contrast


def test_bpe_token_counts_and_exact_encoder_plumbing(spark, sf_dir):
    """bpe_token_count_expr: hand-checked piece arithmetic; composes with
    sample_by_token_budget as the weight column; exact_token_counts runs
    any injected encoder Arrow-batched and refuses cleanly without one."""
    import os as _os

    from outpost_spark.ops.sampling import sample_by_token_budget
    from outpost_spark.ops.text import (
        bpe_token_count_expr,
        exact_token_counts,
        token_stats_bpe,
    )

    rows = [
        (1, "hello world"),        # 2 + 1 = ceil(5/4)*2 = 2+2 = 4
        (2, "a 12,troglodytes!"),  # a=1, 1,2=2, ','=1, 11 letters=3, '!'=1 -> 8
        (3, ""),                   # 0
        (4, "    "),               # 0 pieces
        (5, "don't"),              # don=1, '=1, t=1 -> 3
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_expr(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 4, 2: 8, 3: 0, 4: 0, 5: 3}
    # budget sampling denominated in approximate BPE tokens: exactly the
    # docs the cumulative definition keeps under that weight
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    weighted = docs.select(
        "doc_id", bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens")
    )
    kept = sample_by_token_budget(weighted, "doc_id", "n_bpe_tokens", 20000)
    used = kept.agg(F.coalesce(F.sum("n_bpe_tokens"), F.lit(0))).collect()[0][0]
    assert 0 < used <= 20000
    # exact path: injected toy encoder (1 token per 3 chars)
    exact = {
        r["doc_id"]: r["n_exact_tokens"]
        for r in exact_token_counts(
            df, "text", "doc_id", encode=lambda s: list(range(0, len(s), 3))
        ).collect()
    }
    assert exact == {1: 4, 2: 6, 3: 0, 4: 2, 5: 2}
    # no injected encoder + no tiktoken -> the in-tree BPE default
    # (r10: the NotImplementedError guard became a working encoder)
    from outpost_spark.ops.bpe import default_encoder

    enc = default_encoder()
    dflt = {
        r["doc_id"]: r["n_exact_tokens"]
        for r in exact_token_counts(df, "text", "doc_id").collect()
    }
    want = {r["doc_id"]: len(enc.encode(r["text"])) for r in df.collect()}
    assert dflt == want
    cols = token_stats_bpe(df, "text", "doc_id").columns
    assert cols == ["doc_id", "n_chars", "n_tokens", "n_bpe_tokens"]


def test_asof_join_bucketed_matches_single_pass(spark):
    """The two-pass hot-key carry (bucket_seconds) returns EXACTLY the
    single-pass result on a skewed corpus: one key holds 90 % of the
    left rows and a right series dense enough that matches cross bucket
    boundaries (empty buckets, right-only buckets, and the
    prev-bucket carry all exercised)."""
    import random

    from outpost_spark.ops.joins import asof_join

    rng = random.Random(7)
    # hot key "h": 900 left rows over [0, 5000); cold keys 100 rows
    left_rows = [(i, "h", rng.randrange(0, 5000)) for i in range(900)]
    left_rows += [(1000 + i, f"c{i % 7}", rng.randrange(0, 5000)) for i in range(100)]
    # right rows sparse for some keys, absent for c5/c6; hot key every ~40s
    right_rows = [("h", t, t * 3) for t in range(0, 5000, 40)]
    right_rows += [(f"c{i}", 100 * (i + 1), 7_000 + i) for i in range(5)]
    left = spark.createDataFrame(left_rows, "id bigint, k string, ts bigint")
    right = spark.createDataFrame(right_rows, "k string, rts bigint, val bigint")
    kw = dict(on="k", left_ts="ts", right_ts="rts", right_cols=["val"])
    base = asof_join(left, right, **kw)
    ref = {r["id"]: r["asof_val"] for r in base.collect()}
    for bucket in (64, 997, 10_000):  # many buckets / odd width / one bucket
        got_df = asof_join(left, right, bucket_seconds=bucket, **kw)
        got = {r["id"]: r["asof_val"] for r in got_df.collect()}
        assert got == ref, f"bucket_seconds={bucket}"
    # tolerance composes with the bucketed carry identically
    tol_ref = {
        r["id"]: r["asof_val"]
        for r in asof_join(left, right, tolerance_seconds=25, **kw).collect()
    }
    tol_got = {
        r["id"]: r["asof_val"]
        for r in asof_join(
            left, right, tolerance_seconds=25, bucket_seconds=64, **kw
        ).collect()
    }
    assert tol_got == tol_ref
    # the pass-1 window partitions by (key, bucket): the hot key's rows
    # never all land in one window partition
    plan = asof_join(left, right, bucket_seconds=64, **kw)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "__bkt" in plan


def test_range_join_left_preserves_duplicate_facts(spark):
    """Left-join multiplicity with byte-identical duplicate fact rows:
    each instance emits its own output rows (matched instances once per
    interval, unmatched once with nulls) — SQL LEFT JOIN semantics, not
    a collapse (VERDICT r05)."""
    from outpost_spark.ops.joins import range_join

    facts = spark.createDataFrame(
        # id 1 duplicated 3x (matches one interval), id 4 duplicated 2x
        # (matches nothing), id 2 matches TWO overlapping intervals
        [(1, "a", 100)] * 3 + [(4, "a", 999)] * 2 + [(2, "a", 250)],
        "id bigint, k string, ts bigint",
    )
    iv = spark.createDataFrame(
        [("a", 10, 100, 260), ("a", 11, 240, 300)],
        "k string, win bigint, s bigint, e bigint",
    )
    left = range_join(
        facts, iv, on="k", fact_ts="ts", start_col="s", end_col="e",
        bin_width_seconds=50, how="left",
    )
    rows = sorted((r["id"], r["iv_win"]) for r in left.collect())
    assert rows == sorted(
        [(1, 10)] * 3 + [(4, None)] * 2 + [(2, 10), (2, 11)]
    )
    # inner path multiplicity agrees
    inner = range_join(
        facts, iv, on="k", fact_ts="ts", start_col="s", end_col="e",
        bin_width_seconds=50,
    )
    irows = sorted((r["id"], r["iv_win"]) for r in inner.collect())
    assert irows == sorted([(1, 10)] * 3 + [(2, 10), (2, 11)])


def test_temperature_mix_flattening_properties(spark):
    """alpha<1 boosts low-resource domains: the small domain's keep rate
    must exceed the big one's; alpha=1 degenerates to one uniform rate
    T/N; expected kept mass ~ target when nothing saturates."""
    from outpost_spark.ops.sampling import sample_temperature_mix

    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "dom"])

    kept = sample_temperature_mix(
        df, "dom", "doc_id", target_total=500, alpha=0.5
    )
    by_dom = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # implied rates: z = 30+10 = 40; r_big = 500*30/40/900 = 0.4167,
    # r_small = 500*10/40/100 = 1.0 (saturates) — small kept entirely
    assert by_dom["small"] == 100
    assert 0.30 < by_dom["big"] / 900 < 0.55  # ~0.4167 +/- hash noise
    # alpha=1: uniform rate 500/1000 for every domain
    kept1 = sample_temperature_mix(
        df, "dom", "doc_id", target_total=500, alpha=1.0
    )
    n1 = kept1.count()
    assert 400 < n1 < 600
    # determinism: same seed, same membership
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in sample_temperature_mix(
            df, "dom", "doc_id", target_total=500, alpha=0.5
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="alpha"):
        sample_temperature_mix(df, "dom", "doc_id", target_total=10, alpha=-1)


def test_temperature_mix_weighted_by_tokens(spark):
    """weight_col switches the domain mass to sum(weight) — token-
    denominated mixing; a domain with few huge docs is treated as
    high-resource."""
    from outpost_spark.ops.sampling import sample_temperature_mix

    rows = [(i, "fat", 1000) for i in range(10)] + [
        (i + 100, "thin", 10) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "dom", "n_tok"])
    kept = sample_temperature_mix(
        df, "dom", "doc_id", target_total=5000, alpha=0.5,
        weight_col="n_tok",
    )
    by_dom = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    # masses: fat 10000, thin 100 -> z = 100+10 = 110;
    # r_fat = 5000*100/110/10000 = 0.4545; r_thin = 5000*10/110/100 = 4.5 -> 1
    assert by_dom.get("thin", 0) == 10  # saturated: all kept
    assert 1 <= by_dom.get("fat", 0) <= 9  # ~45% of 10 docs


def test_resize_images_roundtrip(spark):
    """Real stdlib PNG resize: decode -> nearest-neighbor -> re-encode.
    Output PNGs decode with the in-tree decoder at the scaled dims;
    corrupt members come back resize_ok=false instead of failing the
    stage (corpus-scale tolerance)."""
    import numpy as np

    from outpost_spark.ops.multimodal import (
        decode_image,
        encode_png,
        resize_image,
        resize_images,
    )

    # 8x6 RGB gradient via the op's own encoder (decoder-verified below)
    px = np.zeros((6, 8, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(8)[None, :] * 30
    px[:, :, 1] = np.arange(6)[:, None] * 40
    png = encode_png(px)
    meta = decode_image(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (8, 6, 3)

    half = resize_image(png, 0.5)
    m2 = decode_image(half)
    assert (m2["width"], m2["height"]) == (4, 3)

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not a png"))], "id long, content binary"
    )
    out = {r["id"]: r for r in resize_images(df, scale=0.5).collect()}
    assert out[1]["resize_ok"] and (out[1]["out_width"], out[1]["out_height"]) == (4, 3)
    assert decode_image(bytes(out[1]["content"]))["width"] == 4
    assert not out[2]["resize_ok"] and out[2]["content"] is None


def test_sample_frames_uniform_stride_and_tolerance(spark):
    """Frame sampling: every_k-th frame emitted as a decodable PNG, the
    fan-out happening inside the Arrow stage; undecodable members emit
    one decode_ok=false row; an injected decoder overrides the RVID
    default (the real-codec seam)."""
    import numpy as np

    from outpost_spark.ops.multimodal import (
        decode_image,
        decode_rawvideo,
        encode_rawvideo,
        sample_frames,
    )

    frames = np.zeros((25, 4, 5, 3), dtype=np.uint8)
    for i in range(25):
        frames[i, :, :, 0] = i * 10  # distinguishable per-frame red level
    vid = encode_rawvideo(frames)
    w, h, n, back = decode_rawvideo(vid)
    assert (w, h, n) == (5, 4, 25) and (back == frames).all()

    df = spark.createDataFrame(
        [(1, bytearray(vid)), (2, bytearray(b"junk"))], "id long, content binary"
    )
    rows = sample_frames(df, every_k=10).collect()
    good = sorted(
        [r for r in rows if r["id"] == 1], key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in good] == [0, 10, 20]
    assert all(r["decode_ok"] and (r["width"], r["height"]) == (5, 4) for r in good)
    # each sampled frame is a real PNG whose luminance tracks the
    # planted red level (0.299 * i*10)
    lums = [decode_image(bytes(r["frame"]))["mean_luminance"] for r in good]
    assert lums[0] < lums[1] < lums[2]
    bad = [r for r in rows if r["id"] == 2]
    assert len(bad) == 1 and not bad[0]["decode_ok"]
    # injectable decoder seam: a fake codec yielding one black frame
    rows2 = sample_frames(
        df.filter("id = 1"),
        every_k=1,
        decoder=lambda b: (2, 2, 1, np.zeros((1, 2, 2, 3), dtype=np.uint8)),
    ).collect()
    assert len(rows2) == 1 and rows2[0]["n_frames"] == 1


def test_temperature_mix_plan_broadcasts_rates(spark):
    """Scale claim of sample_temperature_mix: the corpus never shuffles —
    the only exchange feeds the tiny domain-mass aggregate, and the rate
    table comes back as a BroadcastHashJoin."""
    from outpost_spark.ops.sampling import sample_temperature_mix

    df = spark.range(5000).selectExpr(
        "id as doc_id", "concat('d', id % 7) as dom"
    )
    plan = (
        sample_temperature_mix(df, "dom", "doc_id", target_total=1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # the corpus side never sorts/shuffles


def test_shard_manifest_two_level_checksum_contract(spark):
    """shard_manifest = two chained groupBys (sub-bucket digests, then
    shard rollup): no joins/windows, per-group state bounded by the
    sub-bucket — and the determinism contract survives the bounding
    (VERDICT r07 'What's wrong' #1)."""
    from outpost_spark.ops.sampling import shard_manifest

    df = spark.range(5000).selectExpr(
        "id as doc_id", "cast(id % 8 as int) as shard", "id % 100 as n_tok"
    )
    out = shard_manifest(df, "shard", "doc_id", weight_col="n_tok")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    # no level ever aggregates the raw id list per SHARD: the only
    # collect_list groups carry the sub-bucket key too
    a = sorted(
        (r["shard"], r["n_docs"], r["mass"], r["ids_checksum"])
        for r in out.collect()
    )
    # rebuilt-shard verification: a rebuild under ANY partitioning and
    # parallelism must reproduce the identical manifest
    for rebuilt in (
        df.repartition(13),
        df.repartition(3, "doc_id"),
        df.coalesce(1),
    ):
        b = sorted(
            (r["shard"], r["n_docs"], r["mass"], r["ids_checksum"])
            for r in shard_manifest(
                rebuilt, "shard", "doc_id", weight_col="n_tok"
            ).collect()
        )
        assert a == b
    # membership drift is DETECTED: drop one doc, its shard's checksum
    # moves, every other shard's is untouched
    a_map = {s: c for s, _n, _m, c in a}
    victim = df.filter("doc_id = 4999").first()["shard"]
    drifted = {
        r["shard"]: r["ids_checksum"]
        for r in shard_manifest(
            df.filter("doc_id <> 4999"), "shard", "doc_id", weight_col="n_tok"
        ).collect()
    }
    assert drifted[victim] != a_map[victim]
    assert all(drifted[s] == a_map[s] for s in drifted if s != victim)
    # sub_buckets is part of the digest contract (B=64 ≠ B=1024), and
    # the xxhash64 twin is deterministic under repartitioning too
    alt = {
        r["shard"]: r["ids_checksum"]
        for r in shard_manifest(
            df, "shard", "doc_id", weight_col="n_tok", sub_buckets=64
        ).collect()
    }
    assert alt != a_map
    fast1 = sorted(
        (r["shard"], r["ids_checksum"])
        for r in shard_manifest(df, "shard", "doc_id", hash_fn="xxhash64").collect()
    )
    fast2 = sorted(
        (r["shard"], r["ids_checksum"])
        for r in shard_manifest(
            df.repartition(7), "shard", "doc_id", hash_fn="xxhash64"
        ).collect()
    )
    assert fast1 == fast2


def test_trim_silence_and_resample_wav():
    """Audio prep primitives: silence trim removes exactly the planted
    lead/tail padding, resample preserves duration and shape, an
    all-silent clip trims to empty but stays a valid WAV."""
    from outpost_spark.ops.multimodal import (
        decode_audio,
        resample_wav,
        trim_silence_wav,
    )

    rate = 8000
    lead = [0] * (rate // 2)              # 0.5 s silence
    tone = [8000, -8000] * (rate // 2)    # 1.0 s loud square-ish tone
    tail = [0] * (rate // 4)              # 0.25 s silence
    wav = _encode_wav(lead + tone + tail, rate=rate)

    trimmed, lead_s, trail_s = trim_silence_wav(wav, threshold=0.01)
    assert lead_s == pytest.approx(0.5, abs=0.05)
    assert trail_s == pytest.approx(0.25, abs=0.05)
    meta = decode_audio(trimmed)
    assert meta["duration_s"] == pytest.approx(1.0, abs=0.1)
    assert meta["rms"] > 0.2  # padding gone, loud content kept

    down = resample_wav(trimmed, target_rate=4000)
    dmeta = decode_audio(down)
    assert dmeta["sample_rate"] == 4000
    assert dmeta["duration_s"] == pytest.approx(meta["duration_s"], abs=0.01)

    silent, l_s, t_s = trim_silence_wav(_encode_wav([0] * rate, rate=rate))
    smeta = decode_audio(silent)
    assert smeta["n_frames"] == 0
    assert l_s + t_s == pytest.approx(1.0, abs=0.05)


def test_clean_audio_stage(spark):
    """clean_audio over a mixed corpus: good clips come back trimmed +
    resampled with stats, corrupt members flag audio_ok=false instead
    of failing the job."""
    from outpost_spark.ops.multimodal import clean_audio, decode_audio

    rate = 8000
    good = _encode_wav([0] * rate + [9000, -9000] * rate + [0] * rate, rate=rate)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not audio at all"))],
        "id long, content binary",
    )
    out = {r["id"]: r for r in clean_audio(df, target_rate=4000).collect()}
    g = out[1]
    assert g["audio_ok"] is True
    assert g["sample_rate"] == 4000
    assert g["duration_s"] == pytest.approx(4.0, abs=0.05)
    assert g["out_duration_s"] == pytest.approx(2.0, abs=0.1)
    assert g["leading_trim_s"] == pytest.approx(1.0, abs=0.05)
    assert g["trailing_trim_s"] == pytest.approx(1.0, abs=0.05)
    meta = decode_audio(bytes(g["content"]))
    assert meta["sample_rate"] == 4000
    assert out[2]["audio_ok"] is False and out[2]["content"] is None


def test_audio_spectral_features_math():
    """The FFT feature pass on known signals: a bin-centered tone's
    dominant frequency is EXACT (the value-oracle contract), its
    centroid sits within leakage noise of the tone, a full-scale sine's
    RMS is A/sqrt(2), stereo mixes to mono, and a two-tone signal's
    centroid lands between the tones."""
    import numpy as np

    from outpost_spark.ops.multimodal import (
        audio_spectral_features,
        encode_wav,
        planted_tone_wav,
    )

    for seed in (0, 7, 23):
        k = 20 + (seed % 30) * 4
        f = audio_spectral_features(planted_tone_wav(seed))
        assert f["dominant_freq_hz"] == k * 15.625  # exact, not approx
        assert f["n_frames"] == 14 and f["duration_s"] == 0.5
        assert f["spectral_centroid_hz"] == pytest.approx(k * 15.625, abs=0.01)
        assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)
    rate = 8000
    t = np.arange(8000) / rate
    two = np.round(
        12000 * np.sin(2 * np.pi * 500 * t) + 12000 * np.sin(2 * np.pi * 1500 * t)
    ).astype("<i2")
    f2 = audio_spectral_features(encode_wav(two, rate))
    assert 600 < f2["spectral_centroid_hz"] < 1400  # between the tones
    # stereo: same tone in both channels -> same dominant bin
    tone = np.round(9000 * np.sin(2 * np.pi * 1000 * t)).astype("<i2")
    stereo = np.stack([tone, tone], axis=1).reshape(-1)
    fs = audio_spectral_features(encode_wav(stereo, rate, channels=2))
    assert fs["dominant_freq_hz"] == pytest.approx(1000, abs=15.625)
    # shorter than one frame: zero-padded single frame
    short = audio_spectral_features(encode_wav(tone[:100], rate))
    assert short["n_frames"] == 1
    with pytest.raises(ValueError):
        audio_spectral_features(b"JUNK: not audio")


def test_extract_audio_features_stage_tolerates_corrupt(spark):
    from outpost_spark.ops.multimodal import (
        extract_audio_features,
        planted_tone_wav,
    )

    df = spark.createDataFrame(
        [(1, bytearray(planted_tone_wav(5))), (2, bytearray(b"junk"))],
        "id long, content binary",
    )
    out = {r["id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["audio_ok"] is True
    assert out[1]["dominant_freq_hz"] == (20 + 5 * 4) * 15.625
    assert out[2]["audio_ok"] is False and out[2]["rms"] is None
