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

import numpy as np
import pandas as pd
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


def _centroid_lit(c) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def _centroid_norm(c) -> float:
    """Python-side centroid norm: the centroid is a plan-time constant, so
    its norm is too — saves one interpreted-HOF pass per (row x centroid).
    Same left-to-right double summation as the engines' list aggregates,
    so the rounded scores stay oracle-exact."""
    acc = 0.0
    for x in c:
        acc += float(x) * float(x)
    import math

    return math.sqrt(acc)


def _centroid_cos(vec: Column, vnorm: Column, c) -> Column:
    """Cosine(vec, centroid) with a shared precomputed ``vnorm`` column and
    a constant-folded centroid norm — one dot-product HOF per centroid
    instead of three aggregate passes."""
    denom = vnorm * F.lit(_centroid_norm(c))
    return F.when(denom > 0, dot_expr(vec, _centroid_lit(c)) / denom).otherwise(F.lit(0.0))


def centroid_scores(
    vec: Column, centroids, *, score_decimals: int = 6, vnorm: Column | None = None
) -> Column:
    """array<struct<score,negcid>> of rounded cosine from ``vec`` to each
    centroid.  Rounding before any comparison keeps argmax/top-nprobe
    selection reproducible across engines (same contract as the other
    similarity entries); ``negcid`` makes struct-max tie-break to the
    LOWEST centroid id."""
    vn = vnorm if vnorm is not None else norm_expr(vec)
    return F.array(
        *[
            F.struct(
                F.round(_centroid_cos(vec, vn, c), score_decimals).alias("score"),
                F.lit(-i).alias("negcid"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def assign_ivf_expr(
    vec: Column, centroids, *, score_decimals: int = 6, vnorm: Column | None = None
) -> Column:
    """IVF list assignment as a pure Column expression: argmax cosine over
    ``centroids`` (ties -> lowest cid).  Zero-shuffle and oracle-portable;
    plan size grows with nlist x dim, so use :func:`assign_ivf_pandas` when
    nlist is large (thousands)."""
    best = F.array_max(
        centroid_scores(vec, centroids, score_decimals=score_decimals, vnorm=vnorm)
    )
    return (-best["negcid"]).cast("int")


def assign_ivf_pandas(df: DataFrame, vec_col: str, centroids, *, out_col: str = "ivf_cid") -> DataFrame:
    """Production-scale IVF assignment: Arrow-batched numpy argmax against a
    closure-captured centroid matrix.  O(nlist x dim) flops per vector with
    no per-row Python and no shuffle; the right path once nlist x dim makes
    :func:`assign_ivf_expr`'s literal plan impractical.  Ties break to the
    lowest cid (``np.argmax`` takes the first maximum)."""
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cnorm = mat / norms[:, None]

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        v = np.asarray(list(vecs), dtype=np.float64)
        vn = np.linalg.norm(v, axis=1)
        vn[vn == 0] = 1.0
        scores = (v / vn[:, None]) @ cnorm.T
        return pd.Series(np.argmax(scores, axis=1).astype("int32"))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def probe_cids_expr(vec: Column, centroids, nprobe: int, *, score_decimals: int = 6) -> Column:
    """The ``nprobe`` nearest centroid ids to ``vec`` (score desc, cid asc)."""
    vn = norm_expr(vec)
    arr = F.array(
        *[
            F.struct(
                (-F.round(_centroid_cos(vec, vn, c), score_decimals)).alias("negscore"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.sort_array(arr), 1, nprobe), lambda s: s["cid"])


def train_centroids_kmeans(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    *,
    id_col: str = "vec_id",
    iters: int = 5,
    assign_method: str = "pandas",
):
    """Distributed Lloyd's k-means returning driver-side centroids
    (``n_centroids x dim`` floats — bounded and small by construction).

    Deterministic: seeds are the ``n_centroids`` rows with the smallest
    ``id_col`` (TakeOrdered — no global sort), and each iteration is
    assign (map-only) -> element-wise mean via ``posexplode`` +
    ``groupBy(cid, pos)`` — map-side partial aggregation reduces the
    shuffle to ~``nlist x dim`` rows per partition regardless of input
    size.  Empty clusters keep their previous centroid.
    """
    seeds = (
        df.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    if not centroids:
        return centroids
    # fewer rows than requested lists: train what the data supports
    n_centroids = len(centroids)
    dim = len(centroids[0])
    for _ in range(iters):
        if assign_method == "pandas":
            assigned = assign_ivf_pandas(df, vec_col, centroids, out_col="__cid")
        else:
            assigned = df.withColumn(
                "__cid", assign_ivf_expr(F.col(vec_col).cast("array<double>"), centroids)
            )
        means = (
            assigned.select("__cid", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("__cid", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        by_cid: dict = {}
        for r in means:
            by_cid.setdefault(r["__cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cid[i][p] for p in range(dim)] if i in by_cid else centroids[i]
            for i in range(n_centroids)
        ]
    return centroids


def cosine_topk_ivf(
    df: DataFrame,
    vec_col: str,
    query: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 2,
    score_decimals: int = 6,
    assign_col: str | None = None,
    prune_partitions: bool = True,
) -> DataFrame:
    """IVF ANN: scan only the query's ``nprobe`` nearest centroid lists,
    exact cosine top-k within them.

    At scale the inverted lists live in the table layout: write with
    ``assign_ivf_pandas(...)`` stamped and ``partitionBy`` that column,
    then pass ``assign_col`` here.  The per-row probe predicate is a JOIN
    condition (``array_contains`` against the broadcast query), which
    neither static partition pruning nor dynamic partition pruning can
    use — so with ``prune_partitions`` (default) the probe set is first
    collected from the query side (bounded: |queries| x nprobe ids,
    computed by the same ``probe_cids_expr`` so it can never disagree
    with the join predicate) and applied as a LITERAL ``isin`` filter on
    ``assign_col``.  That literal is what turns into partition pruning:
    the scan reads ``nprobe/nlist`` of the files instead of every vector
    (measured in tests/test_ops.py via the scan's numFiles metric).
    Without ``assign_col`` the assignment is computed on the fly
    (map-only, no shuffle).
    """
    q = query.withColumn(
        "__probes",
        probe_cids_expr(F.col("qvec").cast("array<double>"), centroids, nprobe, score_decimals=score_decimals),
    )
    if assign_col is not None and prune_partitions:
        probe_set = [
            r["c"] for r in q.select(F.explode("__probes").alias("c")).distinct().collect()
        ]
        df = df.filter(
            F.col(assign_col).isin(probe_set) if probe_set else F.lit(False)
        )
    if assign_col is None:
        assign_col = "__ivf_cid"
        vd = F.col(vec_col).cast("array<double>")
        # own projection: the norm is referenced once per centroid below —
        # CollapseProject keeps non-cheap exprs materialized, so the
        # aggregate() pass runs once per row, not once per (row x centroid)
        df = (
            df.withColumn("__vnorm", norm_expr(vd))
            .withColumn(
                assign_col,
                assign_ivf_expr(
                    vd, centroids, score_decimals=score_decimals, vnorm=F.col("__vnorm")
                ),
            )
            .drop("__vnorm")
        )
    cand = df.join(F.broadcast(q), F.array_contains(F.col("__probes"), F.col(assign_col)))
    scored = cand.withColumn(
        "score",
        F.round(cosine_expr(F.col(vec_col).cast("array<double>"), F.col("qvec").cast("array<double>")), score_decimals),
    )
    return (
        scored.select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    *,
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage format for
    embedding columns at corpus scale (4x smaller than float32, 8x than
    float64; ANN recall loss is negligible at 8 bits).

    q[i] = clamp(floor(v[i]/scale + 0.5), -127, 127) with
    scale = max(|v|)/127 — ``floor(x + 0.5)`` is explicit half-up
    rounding, identical in every engine (library ``round`` functions
    disagree on ties), which keeps the DuckDB oracle bit-exact.  An
    all-zero vector quantizes to zeros with scale 0.  Pure codegen map:
    no shuffle, no Python.
    """
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        mx > 0,
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / (mx / F.lit(127.0)) + F.lit(0.5))),
            ).cast("int"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.withColumn(scale_col, mx / F.lit(127.0)).withColumn(out_col, q)


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """Reconstruct the float vector: q[i] * scale (zero-scale safe)."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)
