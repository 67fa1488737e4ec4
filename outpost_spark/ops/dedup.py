"""Deduplication operators for large-scale training-data pipelines.

All hashing is engine-portable and deterministic: ``h_j(s) = int(md5(j||'|'||s)[:8], 16)``
— reproducible in any engine with md5 (the DuckDB oracles use the identical
formula), stable across runs/partitions, no RNG.

Scale design (100 TB):
- Signatures are computed scan-side with pure Column expressions
  (transform/aggregate over shingle arrays) — whole-stage codegen, no
  Python, no shuffle.
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, bucket): only documents sharing a band bucket meet in the shuffle.
  Bucket skew (giant near-dup clusters) is handled by AQE skew-join
  splitting; pair explosion within a bucket is bounded by verifying with
  exact Jaccard immediately after the join and by distinct-ing pairs.
- ``exact_dedup`` is a hash aggregation on a digest, not on the full text:
  group keys are 32-byte md5 values, so the shuffle moves digests + ids,
  never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_expr(s: Column, seed: int) -> Column:
    """Portable 32-bit hash: int(md5(seed || '|' || s)[:8], 16)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1, 8), 16, 10).cast(
        "long"
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: md5 digest -> canonical (min id) + copy count."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("copies")
    )


def shingle_set(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the lowercased text (JVM-side).

    Texts shorter than k yield an empty array — guarded explicitly because
    ``sequence(1, 0)`` in Spark generates a DESCENDING sequence, not an
    empty one.
    """
    t = F.lower(text)
    n = F.length(t) - (k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i.cast("int"), k))
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(
    df: DataFrame,
    text_col: str,
    *,
    num_hashes: int = 16,
    shingle_len: int = 5,
    out_col: str = "minhash",
) -> DataFrame:
    """MinHash signature: per hash j, min over shingles of h_j(shingle).

    Documents shorter than ``shingle_len`` get an empty-shingle sentinel
    signature (all 2^32) so they never collide with real content.
    """
    sh = shingle_set(F.col(text_col), shingle_len)

    def _min_hash(j: int):
        # closure factory: a default-arg lambda would be parsed as the
        # binary (element, index) HOF form and silently corrupt the seed
        return F.coalesce(
            F.array_min(F.transform(sh, lambda s: _hash_expr(s, j))),
            F.lit(1 << 32).cast("long"),
        )

    sig = F.array(*[_min_hash(j) for j in range(num_hashes)])
    return df.withColumn(out_col, sig)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    *,
    bands: int = 4,
    rows_per_band: int = 4,
    sig_col: str = "minhash",
) -> DataFrame:
    """LSH banding: docs sharing any band's bucket become candidate pairs.

    Output: (id_a, id_b) with id_a < id_b, distinct.  The band/bucket
    equi-join is the only shuffle; each side carries (bucket_key, id).
    """
    slices = []
    for b in range(bands):
        lo = b * rows_per_band + 1  # slice() is 1-indexed
        band_key = F.concat_ws(
            ":",
            F.lit(str(b)),
            F.concat_ws("_", F.slice(F.col(sig_col), lo, rows_per_band)),
        )
        slices.append(
            sigs.select(F.col(id_col).alias("__id"), band_key.alias("__bucket"))
        )
    buckets = slices[0]
    for s in slices[1:]:
        buckets = buckets.unionAll(s)
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def ngram_set(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (lowercased) — the exact-Jaccard unit."""
    return shingle_set(text, n)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays; empty∪empty -> 0.0."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_len: int = 5,
    verify_ngram: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup detection with exact verification.

    signature -> band-bucket join -> candidate pairs -> exact shingle
    Jaccard >= threshold.  The verify step re-joins the (small) candidate
    pair set against the shingle arrays, so false LSH positives never reach
    the output.
    """
    sigs = minhash_signature(
        df.select(id_col, text_col), text_col, num_hashes=num_hashes, shingle_len=shingle_len
    )
    cands = lsh_candidate_pairs(
        sigs, id_col, bands=bands, rows_per_band=rows_per_band
    )
    grams = df.select(
        F.col(id_col).alias("__gid"), ngram_set(F.col(text_col), verify_ngram).alias("__grams")
    )
    return (
        cands.join(grams.withColumnRenamed("__gid", "id_a").withColumnRenamed("__grams", "__ga"), "id_a")
        .join(grams.withColumnRenamed("__gid", "id_b").withColumnRenamed("__grams", "__gb"), "id_b")
        .withColumn("jaccard", F.round(jaccard_expr(F.col("__ga"), F.col("__gb")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empty-string safe)."""
    t = F.lower(F.trim(text))
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def simhash(
    df: DataFrame, text_col: str, *, bits: int = 32, out_col: str = "simhash"
) -> DataFrame:
    """SimHash: bit b of the output is 1 iff sum over tokens of
    (bit b of h(token) ? +1 : -1) is positive.

    Pure Column expressions: one aggregate() pass over the token array per
    document — no explode, no shuffle; near-dup docs differ in few bits
    (compare with ``bit_count(a ^ b)``).
    """
    toks = tokens_expr(F.col(text_col))
    hashes = F.transform(toks, lambda t: _hash_expr(t, 0))

    def _bit_sum(b: int):
        # closure factory: HOF lambdas must take exactly (acc, x)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, b) % 2) * 2 - 1,
        )

    bit_sums = [_bit_sum(b) for b in range(bits)]
    value = None
    for b, s in enumerate(bit_sums):
        contrib = F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        value = contrib if value is None else value + contrib
    return df.withColumn(out_col, value)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    group_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs within optional groups.

    Without LSH this is quadratic — ``group_col`` (e.g. language, length
    bucket) bounds the blow-up; for unbounded corpora use
    :func:`minhash_dedup_pairs` instead.
    """
    g = df.select(
        F.col(id_col).alias("__id"),
        ngram_set(F.col(text_col), n).alias("__grams"),
        *( [F.col(group_col).alias("__grp")] if group_col else [] ),
    )
    left, right = g.alias("l"), g.alias("r")
    cond = F.col("l.__id") < F.col("r.__id")
    if group_col:
        cond = cond & (F.col("l.__grp") == F.col("r.__grp"))
    return (
        left.join(right, cond)
        .withColumn("jaccard", F.round(jaccard_expr(F.col("l.__grams"), F.col("r.__grams")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"), F.col("jaccard")
        )
    )
