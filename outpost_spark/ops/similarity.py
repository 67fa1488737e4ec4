"""Similarity search over embedding columns (array<float>).

Two tiers:
- :func:`cosine_topk` — brute-force exact top-k: one scan, cosine as a pure
  Column expression (zip_with/aggregate — JVM-side), TakeOrderedAndProject
  for the top-k (per-partition heaps, no global sort).
- :func:`cosine_topk_lsh` — sign-bit (random-hyperplane-style) LSH bucket
  prefilter: only the query's bucket is scanned.  Buckets here use the
  signs of leading dimensions — deterministic and engine-portable; on a
  real deployment the planes would be a broadcast random matrix, same plan
  shape.

Scale: brute force is O(N·d) per query but embarrassingly parallel and
shuffle-free — at 100 TB the bucket variant prunes the scan by
2^bucket_bits with partition/file pruning if the table is written
partitioned by bucket prefix (see ``bucket_partition_hint``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays; 0.0 when either norm is 0."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact top-k by cosine to a 1-row ``query`` DataFrame (col ``qvec``).

    Scores are rounded before ordering so result selection is reproducible
    across engines; ties break on id.
    """
    joined = df.crossJoin(F.broadcast(query))
    scored = joined.withColumn(
        "score",
        F.round(cosine_expr(F.col(vec_col).cast("array<double>"), F.col("qvec").cast("array<double>")), score_decimals),
    )
    return (
        scored.select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sign_lsh_bucket(vec: Column, bits: int = 8) -> Column:
    """Sign-bit bucket key: bit i = (vec[i] >= 0) over the first ``bits`` dims."""
    out = None
    for i in range(bits):
        bit = F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def cosine_topk_lsh(
    df: DataFrame,
    vec_col: str,
    query: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    bits: int = 8,
    score_decimals: int = 6,
) -> DataFrame:
    """ANN: scan only the query's sign-LSH bucket, then exact cosine top-k."""
    q = query.withColumn("__qbucket", sign_lsh_bucket(F.col("qvec"), bits))
    bucketed = df.withColumn("__bucket", sign_lsh_bucket(F.col(vec_col), bits))
    candidates = bucketed.join(
        F.broadcast(q), F.col("__bucket") == F.col("__qbucket"), "inner"
    )
    scored = candidates.withColumn(
        "score",
        F.round(cosine_expr(F.col(vec_col).cast("array<double>"), F.col("qvec").cast("array<double>")), score_decimals),
    )
    return (
        scored.select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bucket_partition_hint(
    df: DataFrame, vec_col: str, *, bits: int = 8, out_col: str = "bucket"
) -> DataFrame:
    """Write-layout helper: stamp the sign-LSH bucket as a column so the
    table can be written ``partitionBy(out_col)`` — ANN queries then prune
    the scan to the query's partition instead of reading every vector."""
    return df.withColumn(out_col, sign_lsh_bucket(F.col(vec_col), bits))


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.99,
    bits: int = 8,
    score_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bucket blocking.

    Vectors with cosine ~1 share sign patterns with high probability, so
    the bucket equi-join replaces the quadratic cross join; exact cosine
    verifies every candidate.
    """
    b = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        sign_lsh_bucket(F.col(vec_col), bits).alias("__bucket"),
    )
    left, right = b.alias("l"), b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .withColumn(
            "cosine", F.round(cosine_expr(F.col("l.__v"), F.col("r.__v")), score_decimals)
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"), F.col("cosine"))
    )
