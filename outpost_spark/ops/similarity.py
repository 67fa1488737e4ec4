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
    # ONE array literal (single py4j call, single Literal node).  The
    # ndarray form matters twice over: a Python list routes through
    # pyspark's ``lit`` list branch, which expands to
    # ``array(*[lit(x) ...])`` — dim py4j round-trips per centroid at
    # plan time and dim CreateArray children for every optimizer rule to
    # re-walk — while a 1-D float64 ndarray takes the numpy branch, one
    # JVM call yielding a single array<double> Literal leaf (identical
    # values: float64 IS the Python float).
    return F.lit(np.asarray(c, dtype=np.float64))


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


def centroid_scores(
    vec: Column, centroids, *, score_decimals: int = 6, vnorm: Column | None = None
) -> Column:
    """array<struct<score,negcid>> of rounded cosine from ``vec`` to each
    centroid.  Rounding before any comparison keeps argmax/top-nprobe
    selection reproducible across engines (same contract as the other
    similarity entries); ``negcid`` makes struct-max tie-break to the
    LOWEST centroid id.

    r15 build-cost fix: ONE ``transform`` over a folded index sequence
    against a folded literal centroid matrix / norm array, instead of a
    per-centroid expression list.  The per-centroid form registered a
    ``zip_with`` + ``aggregate`` lambda pair PER CENTROID through py4j
    (~0.6-0.9 s of driver time per plan at nlist=24, measured on
    embed_ann_ivf_topk build 1.5 s Column-API vs 0.7 s string-SQL), while
    this form registers a constant number of lambdas regardless of nlist.
    ``array(lit, …)`` of foldable rows constant-folds to a single
    array<array<double>> Literal, so the executed per-row arithmetic —
    zip_with multiply, left-to-right aggregate sum, the same rounding —
    is unchanged and the scores stay bit-identical to the oracle's.

    Raises ``ValueError`` on an empty centroid list (and so do every
    caller: :func:`assign_ivf_expr`, :func:`assign_ivf_sql`,
    :func:`probe_cids_expr`, :func:`probe_cids_sql`) — validate trained
    centroids before building expressions; the pre-r15 unrolled form
    built an empty array that surfaced only as NULL assignments
    downstream."""
    if not len(centroids):
        # sequence(0, -1) would silently generate a DESCENDING index pair
        raise ValueError("centroid_scores needs at least one centroid")
    vn = vnorm if vnorm is not None else norm_expr(vec)
    cmat = F.array(*[_centroid_lit(c) for c in centroids])
    cnorms = F.lit(np.asarray([_centroid_norm(c) for c in centroids], dtype=np.float64))

    def one(i: Column) -> Column:
        c = F.element_at(cmat, i + 1)
        denom = vn * F.element_at(cnorms, i + 1)
        cos = F.when(denom > 0, dot_expr(vec, c) / denom).otherwise(F.lit(0.0))
        return F.struct(
            F.round(cos, score_decimals).alias("score"),
            (-i).cast("int").alias("negcid"),
        )

    return F.transform(F.sequence(F.lit(0), F.lit(len(centroids) - 1)), one)


def assign_ivf_sql(
    vec_sql: str, vnorm_sql: str, centroids, *, score_decimals: int = 6
) -> Column:
    """Named-column twin of :func:`assign_ivf_expr` (keeps the historical
    name; the expression and the scores are identical).

    r15: built through the Column API with ONE array-typed Literal per
    centroid instead of generated string SQL.  The string form parsed
    fast but materialized every centroid element as its own
    Cast('…' AS DOUBLE) node — an O(nlist x dim) expression tree that
    every optimizer rule re-walked, measured as ~4.5 s of driver-side
    planning per fresh plan on embed_knn_join (24x64 centroids twice)
    against 0.3 s of execution.  A list-valued ``F.lit`` is a single
    Literal leaf, so the tree is O(nlist) and planning collapses; py4j
    round-trips stay O(nlist) (the original motivation for string SQL
    was the per-ELEMENT ``F.lit`` form, which was O(nlist x dim) trips).
    """
    return assign_ivf_expr(
        F.expr(vec_sql),
        centroids,
        score_decimals=score_decimals,
        vnorm=F.expr(vnorm_sql),
    )


def probe_cids_sql(
    vec_sql: str, vnorm_sql: str, centroids, nprobe: int, *, score_decimals: int = 6
) -> Column:
    """Named-column twin of :func:`probe_cids_expr` (same rationale as
    :func:`assign_ivf_sql`)."""
    return probe_cids_expr(
        F.expr(vec_sql),
        centroids,
        nprobe,
        score_decimals=score_decimals,
        vnorm=F.expr(vnorm_sql),
    )


def assign_ivf_expr(
    vec: Column, centroids, *, score_decimals: int = 6, vnorm: Column | None = None
) -> Column:
    """IVF list assignment as a pure Column expression: argmax cosine over
    ``centroids`` (ties -> lowest cid).  Zero-shuffle and oracle-portable;
    plan size grows with nlist x dim, so use :func:`assign_ivf_pandas` when
    nlist is large (thousands).  Raises ``ValueError`` if ``centroids``
    is empty (see :func:`centroid_scores`)."""
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


def probe_cids_expr(
    vec: Column,
    centroids,
    nprobe: int,
    *,
    score_decimals: int = 6,
    vnorm: Column | None = None,
) -> Column:
    """The ``nprobe`` nearest centroid ids to ``vec`` (score desc, cid asc).
    Pass a precomputed ``vnorm`` column to share one norm pass across the
    assignment and probe expressions.  Raises ``ValueError`` if
    ``centroids`` is empty (see :func:`centroid_scores`)."""
    scores = centroid_scores(
        vec, centroids, score_decimals=score_decimals, vnorm=vnorm
    )
    # derive (negscore, cid) from the shared scorer: -score and -negcid
    # are the exact same doubles/ints the per-centroid form built, so the
    # ascending struct sort selects identically
    arr = F.transform(
        scores,
        lambda s: F.struct(
            (-s["score"]).alias("negscore"),
            (-s["negcid"]).cast("int").alias("cid"),
        ),
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
    q = query.withColumn("__qn", norm_expr(F.col("qvec").cast("array<double>"))).withColumn(
        "__probes",
        probe_cids_sql(
            "CAST(qvec AS ARRAY<DOUBLE>)", "__qn", centroids, nprobe,
            score_decimals=score_decimals,
        ),
    ).drop("__qn")
    if assign_col is not None and prune_partitions:
        probe_set = [
            r["c"] for r in q.select(F.explode("__probes").alias("c")).distinct().collect()
        ]
        df = df.filter(
            F.col(assign_col).isin(probe_set) if probe_set else F.lit(False)
        )
    if assign_col is None:
        assign_col = "__ivf_cid"
        # own projection: the norm is referenced once per centroid below —
        # CollapseProject keeps non-cheap exprs materialized, so the
        # aggregate() pass runs once per row, not once per (row x centroid);
        # string-SQL builders keep plan construction O(1) py4j calls
        df = (
            df.withColumn("__vd", F.col(vec_col).cast("array<double>"))
            .withColumn("__vnorm", norm_expr(F.col("__vd")))
            .withColumn(
                assign_col,
                assign_ivf_sql(
                    "__vd", "__vnorm", centroids, score_decimals=score_decimals
                ),
            )
            .drop("__vd", "__vnorm")
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


def knn_join_brute(
    df: DataFrame,
    vec_col: str,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Exact batched k-NN join: every row -> its top-k neighbors, O(N^2).

    The correctness baseline for :func:`knn_join` (recall evaluation,
    small-N oracles).  Quadratic by construction — never the scale path.
    Output: (src_id, neighbor_id, score, rank), rank 1..k per source.
    """
    a = df.select(F.col(id_col).alias("__sid"), F.col(vec_col).cast("array<double>").alias("__sv"))
    b = df.select(F.col(id_col).alias("__tid"), F.col(vec_col).cast("array<double>").alias("__tv"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("__sid") != F.col("__tid"))
        .withColumn(
            "score", F.round(cosine_expr(F.col("__sv"), F.col("__tv")), score_decimals)
        )
        .select("__sid", "__tid", "score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__sid").orderBy(F.col("score").desc(), F.col("__tid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__sid").alias("src_id"),
            F.col("__tid").alias("neighbor_id"),
            "score",
            "rank",
        )
    )


def _ivf_scored_candidates(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str,
    nprobe: int,
    score_decimals: int,
    assign_col: str | None,
) -> DataFrame:
    """Shared IVF candidate generator for the batched similarity ops:
    assign every vector to its argmax-cosine list (or reuse a pre-stamped
    ``assign_col``), explode every vector to its ``nprobe`` nearest list
    ids, shuffle-hash equi-join the two sides on the list id — both
    shuffles carry (cid, id, vec) only — and score each candidate pair
    with one dot-product HOF (norms are computed ONCE per vector in the
    map stages and carried through the shuffle, 3x cheaper than dot +
    two norm passes on the hot stage).

    Returns the narrow scored frame (__sid, __tid, score) — vectors are
    projected away, so downstream top-k windows / threshold filters never
    shuffle them.
    """
    vd = F.col(vec_col).cast("array<double>")
    if assign_col is not None:
        tgt = df.select(
            F.col(assign_col).alias("__cid"),
            F.col(id_col).alias("__tid"),
            vd.alias("__tv"),
        ).withColumn("__tn", norm_expr(F.col("__tv")))
        src = (
            df.select(F.col(id_col).alias("__sid"), vd.alias("__sv"))
            .withColumn("__sn", norm_expr(F.col("__sv")))
            .withColumn(
                "__cid",
                F.explode(
                    probe_cids_sql(
                        "__sv", "__sn", centroids, nprobe,
                        score_decimals=score_decimals,
                    )
                ),
            )
        )
    else:
        # ONE centroid-scoring pass per vector (r15, guide §1.2/§5): the
        # argmax assignment IS the first probe id (both select highest
        # rounded score, ties to the lowest cid), so stamping the
        # nprobe-nearest list ids once and deriving tgt's assignment as
        # ``__cids[0]`` halves the O(nlist x dim) interpreted scoring —
        # previously tgt ran its own argmax pass AND src its own probe
        # sort over the same rows.  The stamped frame is materialized so
        # the two join sides (and any expensive upstream generator, e.g.
        # the perturbed-embeddings union) evaluate once, not twice; it
        # carries (id, vec, norm, nprobe ints) — the same columns the
        # join shuffles anyway.
        stamped = (
            df.select(F.col(id_col).alias("__id"), vd.alias("__v"))
            .withColumn("__n", norm_expr(F.col("__v")))
            .withColumn(
                "__cids",
                probe_cids_sql(
                    "__v", "__n", centroids, nprobe,
                    score_decimals=score_decimals,
                ),
            )
            .localCheckpoint(eager=True)
        )
        tgt = stamped.select(
            F.col("__cids")[0].alias("__cid"),
            F.col("__id").alias("__tid"),
            F.col("__v").alias("__tv"),
            F.col("__n").alias("__tn"),
        )
        src = stamped.select(
            F.col("__id").alias("__sid"),
            F.col("__v").alias("__sv"),
            F.col("__n").alias("__sn"),
            F.explode("__cids").alias("__cid"),
        )
    denom = F.col("__sn") * F.col("__tn")
    return (
        src.hint("shuffle_hash")
        .join(tgt, "__cid")
        .filter(F.col("__sid") != F.col("__tid"))
        .withColumn(
            "score",
            F.round(
                F.when(denom > 0, dot_expr(F.col("__sv"), F.col("__tv")) / denom)
                .otherwise(F.lit(0.0)),
                score_decimals,
            ),
        )
        .select("__sid", "__tid", "score")
    )


def knn_join(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 2,
    score_decimals: int = 6,
    assign_col: str | None = None,
) -> DataFrame:
    """Batched k-NN join via IVF: EVERY row -> its top-k neighbors in ONE
    plan — the semantic-dedup / retrieval-eval primitive.

    Eager-execution side effect: when ``assign_col`` is None the stamped
    (id, vec, norm, probe-ids) frame is ``localCheckpoint(eager=True)``'d
    at construction time — calling this function runs a Spark job before
    any action on the returned frame, and the stamped vectors live in
    executor-local non-replicated storage (see SCALE.md for the
    at-scale durability tradeoff).

    Unlike :func:`cosine_topk_ivf` (one query, driver-collected probe
    set), the probe side here is the full table, so nothing touches the
    driver:

    - target side: each vector lands in its argmax-cosine centroid list
      (``assign_col`` reuses a pre-stamped layout column; otherwise the
      assignment is computed map-only);
    - source side: each vector explodes to its ``nprobe`` nearest list
      ids;
    - one shuffle-hash equi-join on the list id — both shuffles carry
      ``(cid, id, vec)`` only;
    - exact cosine on candidates, then top-k per source through a window
      that sees ``(sid, tid, score)`` rows ONLY (vectors are projected
      away before the window exchange, same discipline as the stratified
      sampler).

    Recall follows IVF physics: a true neighbor is missed only when it
    is assigned to a list the source does not probe — raise ``nprobe``
    (or train better centroids) to trade compute for recall.  Skewed
    lists (hot centroids) are AQE's skew-join case; at extreme skew,
    re-train with more centroids.  Candidates per source are bounded by
    the probed list sizes, so the window partition never exceeds
    ``nprobe x max_list``.

    Output: (src_id, neighbor_id, score, rank), rank 1..k per source;
    sources whose probed lists hold fewer than k other vectors emit
    fewer rows.
    """
    scored = _ivf_scored_candidates(
        df,
        vec_col,
        centroids,
        id_col=id_col,
        nprobe=nprobe,
        score_decimals=score_decimals,
        assign_col=assign_col,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__sid").orderBy(F.col("score").desc(), F.col("__tid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__sid").alias("src_id"),
            F.col("__tid").alias("neighbor_id"),
            "score",
            "rank",
        )
    )


def embedding_near_dup_pairs_ivf(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nprobe: int = 2,
    score_decimals: int = 6,
    assign_col: str | None = None,
) -> DataFrame:
    """All embedding pairs with cosine >= threshold, IVF-blocked — the
    candidate generator for semantic dedup (SemDeDup-style).

    Same join shape as :func:`knn_join` (assign + nprobe-probe explode,
    shuffles carry (cid, id, vec) only), but instead of per-source top-k
    it emits every verified pair once: both probe directions are
    normalized with least/greatest so a pair is found when EITHER
    member probes the other's list (exact duplicates always share a
    list, so recall on true dups is 1 by construction).

    Output: (id_a, id_b, cosine), id_a < id_b, distinct.
    """
    scored = _ivf_scored_candidates(
        df,
        vec_col,
        centroids,
        id_col=id_col,
        nprobe=nprobe,
        score_decimals=score_decimals,
        assign_col=assign_col,
    )
    return (
        scored.filter(F.col("score") >= threshold)
        .select(
            F.least("__sid", "__tid").alias("id_a"),
            F.greatest("__sid", "__tid").alias("id_b"),
            F.col("score").alias("cosine"),
        )
        .distinct()
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nprobe: int = 2,
    score_decimals: int = 6,
    assign_col: str | None = None,
    candidate_k: int | None = None,
) -> DataFrame:
    """Semantic dedup survivors (SemDeDup, Abbas et al. 2023 shape):
    cluster embedding near-dups (IVF-blocked pairs above ``threshold``,
    connected components) and keep each component's minimum id plus every
    untouched row.

    The embedding-space analog of the MinHash pipeline: pairs frame is
    sparse relative to the corpus, components run on pairs only, and the
    survivor filter is a left-anti join against the small losers set.
    Returns the surviving ids (one column, ``id_col``).

    ``candidate_k`` selects the alternative candidate generator: the
    batched k-NN join's per-source top-k (``score >= threshold``)
    instead of ALL in-list pairs above threshold.  Top-k bounds the pair
    frame per node — the safety valve when a corpus has mega-clusters
    (c copies -> c·k rows instead of c²/2) at the cost of possibly
    splitting a component whose diameter exceeds the k-NN graph (the
    transitive closure still merges anything connected through top-k
    edges).  ``semantic_dedup_bulk`` is the corpus-scale twin.
    """
    from outpost_spark.ops.dedup import dedup_keep_canonical

    if candidate_k is not None:
        knn = knn_join(
            df,
            vec_col,
            centroids,
            id_col=id_col,
            k=candidate_k,
            nprobe=nprobe,
            score_decimals=score_decimals,
            assign_col=assign_col,
        )
        pairs = (
            knn.filter(F.col("score") >= threshold)
            .select(
                F.least("src_id", "neighbor_id").alias("id_a"),
                F.greatest("src_id", "neighbor_id").alias("id_b"),
            )
            .distinct()
        )
    else:
        pairs = embedding_near_dup_pairs_ivf(
            df,
            vec_col,
            centroids,
            id_col=id_col,
            threshold=threshold,
            nprobe=nprobe,
            score_decimals=score_decimals,
            assign_col=assign_col,
        )
    return dedup_keep_canonical(df.select(id_col), pairs, id_col)


def ivf_assign_bulk(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    nprobe: int = 1,
    score_decimals: int = 6,
) -> DataFrame:
    """BLAS-backed IVF assignment: (id, vector, top-``nprobe`` list ids)
    in one Arrow-batched ``mapInPandas`` pass.

    The literal-SQL centroid scorers (:func:`assign_ivf_sql`) are the
    right tool up to a few dozen centroids — each centroid is a plan-time
    constant and Catalyst folds its norm.  A corpus-scale IVF needs
    K ~ sqrt(N·nprobe) lists (1M vectors -> ~1400) to bound list sizes,
    where per-row interpreted scoring is O(K·dim) and the generated SQL
    text itself becomes the bottleneck.  Here each Arrow batch computes
    ALL assignments as one (batch x K) matrix product — the FAISS shape,
    ~100x the interpreted throughput at K=1400.

    Selection is deterministic: scores round to ``score_decimals`` and
    ties break to the LOWEST centroid id (the same contract as
    ``assign_ivf_expr``), via an integer composite key.

    Output: (id_col, ``__v`` array<double>, ``__cids`` array<int>,
    ``__cids[0]`` is the assignment list).  ids must be integral.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cmat = [[float(x) for x in c] for c in centroids]
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("__v", ArrayType(DoubleType(), False), False),
            StructField("__cids", ArrayType(IntegerType(), False), False),
        ]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0] = 1.0
        Cn = (C / cn[:, None]).T  # (dim, K)
        K = C.shape[0]
        scale = 10.0**score_decimals
        take = min(nprobe, K)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            vn = np.linalg.norm(V, axis=1)
            nz = vn.copy()
            nz[nz == 0] = 1.0
            S = (V / nz[:, None]) @ Cn
            S[vn == 0] = 0.0
            # composite int key: rounded score desc, centroid id asc
            comp = np.rint(S * scale).astype(np.int64) * (K + 1) - np.arange(K)
            if take < K:
                part = np.argpartition(-comp, take - 1, axis=1)[:, :take]
                order = np.take_along_axis(-comp, part, axis=1).argsort(axis=1)
                cids = np.take_along_axis(part, order, axis=1)
            else:
                cids = (-comp).argsort(axis=1)[:, :take]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__v": list(V),
                    "__cids": list(cids.astype(np.int32)),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return src.mapInPandas(gen, out_schema)


def _bulk_scored_pairs(
    assigned: DataFrame,
    *,
    id_col: str,
    per_list_k: int | None = None,
    threshold: float | None = None,
    score_decimals: int = 6,
) -> DataFrame:
    """Per-list BLAS scoring over an :func:`ivf_assign_bulk` frame.

    Each IVF list becomes one ``applyInPandas`` group holding its member
    vectors (role 't': assignment list = ``__cids[0]``) and every vector
    probing it (role 's': all ``nprobe`` lists); the group computes one
    (sources x members) matrix product and emits either every pair with
    ``score >= threshold`` or each source's top ``per_list_k`` members.
    All O(N·nprobe·listsize·dim) flops run in BLAS; only (sid, tid,
    score) candidate rows leave Python.

    Scale: a group is one list (~N/K vectors) plus its probers
    (~N·nprobe/K) — bounded by construction; hot lists are the standard
    AQE skew case, and at extreme skew the answer is more centroids.
    """
    if (per_list_k is None) == (threshold is None):
        raise ValueError("exactly one of per_list_k / threshold required")

    union = assigned.select(
        F.explode("__cids").alias("__cid"),
        F.lit("s").alias("__role"),
        F.col(id_col),
        F.col("__v"),
    ).unionByName(
        assigned.select(
            F.col("__cids")[0].alias("__cid"),
            F.lit("t").alias("__role"),
            F.col(id_col),
            F.col("__v"),
        )
    )

    def score_group(pdf):
        import numpy as np
        import pandas as pd

        t = pdf[pdf["__role"] == "t"]
        s = pdf[pdf["__role"] == "s"]
        if not len(t) or not len(s):
            return pd.DataFrame({"__sid": [], "__tid": [], "score": []}).astype(
                {"__sid": "int64", "__tid": "int64", "score": "float64"}
            )
        T = np.vstack([np.asarray(v, dtype=np.float64) for v in t["__v"]])
        S = np.vstack([np.asarray(v, dtype=np.float64) for v in s["__v"]])
        tn = np.linalg.norm(T, axis=1)
        sn = np.linalg.norm(S, axis=1)
        tz, sz = tn.copy(), sn.copy()
        tz[tz == 0] = 1.0
        sz[sz == 0] = 1.0
        M = (S / sz[:, None]) @ (T / tz[:, None]).T
        M[sn == 0, :] = 0.0
        M[:, tn == 0] = 0.0
        M = np.round(M, score_decimals)
        sids = s[id_col].to_numpy()
        tids = t[id_col].to_numpy()
        self_mask = sids[:, None] == tids[None, :]
        if threshold is not None:
            keep = (M >= threshold) & ~self_mask
            si, ti = np.nonzero(keep)
        else:
            take = min(per_list_k, M.shape[1])
            # composite key: score desc, neighbor id asc (deterministic)
            comp = np.rint(M * 10.0**score_decimals).astype(np.int64) * len(
                tids
            ) - np.argsort(np.argsort(tids))
            # min+1, NOT min: argpartition runs on -comp, and -int64.min
            # overflows back to int64.min — the self row would then rank
            # FIRST and silently steal a top-k slot before the ok-filter
            comp[self_mask] = np.iinfo(np.int64).min + 1
            idx = np.argpartition(-comp, take - 1, axis=1)[:, :take]
            si = np.repeat(np.arange(len(sids)), take)
            ti = idx.ravel()
            ok = ~self_mask[si, ti]
            si, ti = si[ok], ti[ok]
        return pd.DataFrame(
            {"__sid": sids[si], "__tid": tids[ti], "score": M[si, ti]}
        )

    return union.groupBy("__cid").applyInPandas(
        score_group, "__sid long, __tid long, score double"
    )


def knn_join_bulk(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 2,
    score_decimals: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """Corpus-scale batched k-NN join: :func:`knn_join` semantics with
    BLAS assignment + per-list matrix scoring (see :func:`ivf_assign_bulk`
    / :func:`_bulk_scored_pairs`).  The global top-k window still sees
    (sid, tid, score) rows only; per-list top-k pre-truncation bounds its
    input to ``nprobe·k`` rows per source.

    Output: (src_id, neighbor_id, score, rank) — same shape as
    :func:`knn_join` / :func:`knn_join_brute`.
    """
    assigned = ivf_assign_bulk(
        df, vec_col, centroids, id_col=id_col, nprobe=nprobe,
        score_decimals=score_decimals,
    )
    if materialize:
        assigned = assigned.localCheckpoint(eager=True)
    scored = _bulk_scored_pairs(
        assigned, id_col=id_col, per_list_k=k, score_decimals=score_decimals
    ).dropDuplicates(["__sid", "__tid"])
    from pyspark.sql import Window

    w = Window.partitionBy("__sid").orderBy(F.col("score").desc(), F.col("__tid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__sid").alias("src_id"),
            F.col("__tid").alias("neighbor_id"),
            "score",
            "rank",
        )
    )


def semantic_dedup_bulk(
    df: DataFrame,
    vec_col: str,
    centroids,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nprobe: int = 2,
    score_decimals: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """Corpus-scale :func:`semantic_dedup`: IVF-blocked near-dup pairs via
    the BLAS per-list scorer, then the same components + min-id survivor
    selection.  Returns surviving ids (one column, ``id_col``)."""
    from outpost_spark.ops.dedup import dedup_keep_canonical

    assigned = ivf_assign_bulk(
        df, vec_col, centroids, id_col=id_col, nprobe=nprobe,
        score_decimals=score_decimals,
    )
    if materialize:
        assigned = assigned.localCheckpoint(eager=True)
    pairs = (
        _bulk_scored_pairs(
            assigned, id_col=id_col, threshold=threshold,
            score_decimals=score_decimals,
        )
        .select(
            F.least("__sid", "__tid").alias("id_a"),
            F.greatest("__sid", "__tid").alias("id_b"),
        )
        .distinct()
    )
    return dedup_keep_canonical(assigned.select(id_col), pairs, id_col)


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


def pq_train(
    df: DataFrame,
    vec_col: str,
    *,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    sample_n: int = 2048,
    iters: int = 8,
    sample_rows: list | None = None,
) -> list:
    """Train product-quantization codebooks: split the vector into ``m``
    subspaces and k-means each to ``k`` centroids (Jegou et al., "Product
    Quantization for Nearest Neighbor Search").

    Training runs driver-side numpy over a DETERMINISTIC sample (the
    ``sample_n`` smallest ids — same convention as the IVF trainer):
    codebooks are m*k*dsub floats, a plan-time constant like IVF
    centroids, and PQ training is a fixed-size problem regardless of
    corpus size (the corpus-scale work is encoding, which is
    distributed).  Seeds are the first k sample rows per subspace; empty
    clusters keep their previous centroid; ties break to the lowest code.

    ``sample_rows`` (optional) supplies the training sample directly —
    a list of float vectors in ascending-id order, e.g. already fetched
    by the caller for its own query-vector needs — and skips the
    driver-side collect entirely (``sample_n`` is then ignored).  The
    default collect is a full-scan TakeOrdered job; callers that can
    express the same sample as a pushed-down id filter should prefer
    fetching it themselves (guide §5: the PQ catalog entries paid one
    full-scan sort job per plan build for a 16-row constant).

    Returns ``codebooks``: list of m lists of k centroid lists.
    """
    import numpy as np

    if sample_rows is None:
        rows = (
            df.orderBy(F.col(id_col).asc())
            .limit(sample_n)
            .select(F.col(vec_col).cast("array<double>").alias("v"))
            .collect()
        )
        sample_rows = [r["v"] for r in rows]
    X = np.asarray([list(map(float, v)) for v in sample_rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("pq_train needs a non-empty vector sample")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    kk = min(k, X.shape[0])
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:kk].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list,
    *,
    id_col: str = "vec_id",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode vectors to ``m`` one-byte-ish codes (array<int>) — the
    dim*4-byte -> m-byte storage format for embedding columns at corpus
    scale (k=16, m=8 compresses a 64-float vector 32x).

    One Arrow-batched numpy pass: per subspace, squared distances to all
    k centroids via one matrix product, argmin (first-minimum = lowest
    code, deterministic).  Narrow map, no shuffle.
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    books = [[list(map(float, c)) for c in b] for b in codebooks]
    # the id column passes through untouched — its type is whatever the
    # caller's is (long ids, string doc ids, ...), so the codes frame
    # joins back to the source without a lossy cast
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField(out_col, ArrayType(IntegerType(), False), False),
        ]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        Cs = [np.asarray(b, dtype=np.float64) for b in books]
        m = len(Cs)
        dsub = Cs[0].shape[1]
        cn = [(C**2).sum(axis=1) for C in Cs]
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            codes = np.empty((V.shape[0], m), dtype=np.int32)
            for j in range(m):
                S = V[:, j * dsub : (j + 1) * dsub]
                d2 = (S**2).sum(axis=1)[:, None] - 2.0 * (S @ Cs[j].T) + cn[j][None, :]
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(codes)})

    src = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return src.mapInPandas(gen, out_schema)


def pq_topk_ivf(
    codes_df: DataFrame,
    query_vec: list,
    codebooks: list,
    centroids,
    *,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int | None = None,
    vectors_df: DataFrame | None = None,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    assign_col: str = "ivf_cid",
    score_decimals: int = 6,
) -> DataFrame:
    """IVF + PQ — the composed 100 TB ANN architecture (Jegou et al.
    §V, IVFADC): probe the query's ``nprobe`` nearest centroid lists
    and ADC-score ONLY their m-byte codes; with ``shortlist`` and
    ``vectors_df`` set, exact-rerank the shortlist from the original
    vectors (the production default, like :func:`pq_topk_rerank`).

    The two scale levers compose: IVF pruning bounds the SCAN
    (``codes_df`` written ``partitionBy(assign_col)`` turns the literal
    probe filter into partition pruning — nprobe/nlist of the files),
    PQ bounds the BYTES (m bytes per scanned row instead of dim*4); the
    rerank reads full vectors for only ``shortlist`` rows via a
    broadcast semi-join.  The probe set is computed DRIVER-side from
    the (tiny, already-driver-resident) centroid list with the same
    rounded-cosine / lowest-cid ordering the SQL oracle derives — no
    collect, no extra job."""
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    ranked = []
    for cid, c in enumerate(centroids):
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        s = (
            round(
                sum(a * float(b) for a, b in zip(q, c)) / (qn * cn),
                score_decimals,
            )
            if qn and cn
            else 0.0
        )
        ranked.append((-s, cid))
    probes = [cid for _s, cid in sorted(ranked)[:nprobe]]
    pruned = codes_df.filter(
        F.col(assign_col).isin(probes) if probes else F.lit(False)
    )
    if shortlist is not None and vectors_df is not None:
        return pq_topk_rerank(
            pruned, vectors_df, q, codebooks, k=k, shortlist=shortlist,
            id_col=id_col, codes_col=codes_col,
        )
    return pq_topk(
        pruned, q, codebooks, k=k, id_col=id_col, codes_col=codes_col,
        score_decimals=score_decimals,
    )


def pq_decode_expr(codes: Column, codebooks: list) -> Column:
    """Reconstructed vector from PQ codes — pure Column lookup over the
    literal codebooks (plan-time constants), no Python."""
    parts = [
        F.element_at(
            F.lit([[float(x) for x in c] for c in codebooks[j]]), codes[j] + 1
        )
        for j in range(len(codebooks))
    ]
    return F.concat(*parts)


def pq_topk(
    codes_df: DataFrame,
    query_vec: list,
    codebooks: list,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    score_decimals: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — ZERO Python at
    query time: the m x k inner-product lookup table dot(q_j, C_j[c]) is
    computed driver-side (a plan-time literal), each row's score is m
    codegen `element_at` lookups summed (no vector math per row), and
    top-k is a TakeOrderedAndProject heap — shuffle-free, like
    :func:`cosine_topk`.

    Score = dot(query, reconstruction(codes)) — inner product is
    additive across subspaces, which is what makes ADC exact w.r.t. the
    quantized vectors; recall vs exact search is bounded by quantization
    error (k and m are the dials).

    Prefer :func:`pq_topk_rerank` as the production default: measured
    at 1M x 64d (BENCH_SCALE_r12), the exact rerank lifts recall@10
    from 0.575 to 1.0 for ~10% more query time — use bare ADC only
    when the original vectors are genuinely unreachable at query time.
    """
    q = [float(x) for x in query_vec]
    m = len(codebooks)
    dsub = len(q) // m
    luts = []
    for j in range(m):
        qj = q[j * dsub : (j + 1) * dsub]
        luts.append(
            [float(sum(a * b for a, b in zip(qj, c))) for c in codebooks[j]]
        )
    score = None
    for j in range(m):
        term = F.element_at(F.lit(luts[j]), F.col(codes_col)[j] + 1)
        score = term if score is None else score + term
    return (
        codes_df.select(id_col, F.round(score, score_decimals).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk_rerank(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    query_vec: list,
    codebooks: list,
    *,
    k: int = 10,
    shortlist: int = 200,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist + EXACT rerank — the standard production PQ query
    (Jegou et al. §IV: quantized distances select a candidate set, true
    distances order it).  The full-corpus scan touches only the m-byte
    codes (``pq_topk`` over ``shortlist`` candidates); original vectors
    are read for just those ``shortlist`` rows via a broadcast semi-join
    — at 100 TB the vector column is never scanned.  Recall is then
    bounded by shortlist coverage alone, not quantization resolution:
    measured at 1M x 64d (BENCH_SCALE), m=16/k=256 ADC alone gives
    recall@10 0.58 while +rerank(200) gives 1.00 at ~2 s/query.
    """
    cands = pq_topk(
        codes_df, query_vec, codebooks, k=shortlist, id_col=id_col,
        codes_col=codes_col,
    ).select(id_col)
    q = [float(x) for x in query_vec]
    return (
        vectors_df.join(F.broadcast(cands), id_col)
        .select(
            id_col,
            F.round(
                dot_expr(F.col(vec_col).cast("array<double>"), F.lit(q)), 6
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
