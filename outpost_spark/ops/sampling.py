"""Deterministic sampling and split operators for training-data pipelines.

Every operator keys off a content-independent hash fraction
``frac(id) = int(md5(seed || '|' || id)[:8], 16) / 2^32`` — uniform in
[0, 1), reproducible in any engine with md5 (the DuckDB oracles use the
identical formula), and stable under repartitioning, retries, and
incremental reprocessing: a document's sample/split membership never
changes as the corpus grows, which `df.sample()`'s partition-seeded RNG
cannot guarantee.

Scale design (100 TB):
- Sampling/splitting is a pure map — a codegen'd filter/projection, no
  shuffle, fully pushed alongside the scan.
- ``stratified_quota`` is the only shuffling operator (window per
  stratum); quota selection shuffles (stratum, frac, id) triples only —
  never document bodies — and caps each stratum before anything wide.
- ``hash_fn="xxhash64"`` swaps md5 for the Spark-native hash (one
  codegen'd call, ~10x cheaper, no SQL oracle) — same switch as the
  dedup module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column, *, seed: str = "sample", hash_fn: str = "md5") -> Column:
    """Uniform [0, 1) fraction from a stable hash of ``key`` (stringified)."""
    s = F.concat(F.lit(f"{seed}|"), key.cast("string"))
    if hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(s), F.lit(1 << 32)).cast("long")
    else:
        h = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    return h / F.lit(float(1 << 32))


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    *,
    seed: str = "sample",
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by id hash.

    Membership is decided per-id, so two runs (or two engines) agree
    row-for-row, and disjoint seeds give independent samples.
    """
    return df.filter(hash_fraction(F.col(id_col), seed=seed, hash_fn=hash_fn) < rate)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    *,
    seed: str = "split",
    hash_fn: str = "md5",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (e.g. train/val/test) by hash.

    ``splits`` is [(name, weight), ...]; weights must sum to 1.  The
    assignment column is a chained range test on the hash fraction —
    deterministic, engine-portable, and stable as the corpus grows.
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = hash_fraction(F.col(id_col), seed=seed, hash_fn=hash_fn)
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w
        branch = F.when(frac < cum, F.lit(name))
        expr = branch if expr is None else expr.when(frac < cum, F.lit(name))
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_quota(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    id_col: str,
    *,
    seed: str = "strata",
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic quota sample: at most ``quota`` rows per stratum,
    chosen by hash-fraction order (ties broken by id).

    The hash order makes the per-stratum pick a uniform random sample
    that is nevertheless reproducible across runs and engines — the
    standard way to cap over-represented languages/domains when
    assembling a training mix.

    Scale shape: the ranking window runs over a NARROW projection —
    (strata, frac, id) triples — so the per-stratum shuffle never carries
    document bodies; the winning ids (at most quota x #strata rows) are
    then semi-joined back against the full table.  That second join is
    the id-equality kind AQE converts to a broadcast at runtime when the
    winner set is small, and the extra scan of the base table is
    column-pruned — at 100 TB, re-reading (id, strata) beats shuffling
    text by orders of magnitude.

    Like every op in this module, membership is PER ID: ``id_col`` is
    assumed to be the table's key.  If duplicate physical rows share an
    id (at-least-once replay debris), all copies of a winning id survive
    — same contract as :func:`hash_sample`; run exact dedup first if the
    quota must bound physical rows.
    """
    frac = hash_fraction(F.col(id_col), seed=seed, hash_fn=hash_fn)
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__frac").asc(), F.col(id_col).asc()
    )
    winners = (
        df.select(*strata_cols, id_col)
        .withColumn("__frac", frac)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def sample_by_rates(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    *,
    default_rate: float = 1.0,
    seed: str = "mix",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-domain deterministic sampling — the corpus-mixing primitive
    (up-/down-weight sources, languages, or quality tiers when assembling
    a training mix).  Each row keeps iff its id's hash fraction is below
    its group's rate; groups absent from ``rates`` use ``default_rate``.

    Same determinism contract as :func:`hash_sample`: membership is
    per-id, so the mix is reproducible across engines/runs and stable as
    the corpus grows; disjoint seeds give independent mixes.  Pure
    codegen filter — no shuffle, pushed alongside the scan.
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    rate = None
    for k, r in rates.items():
        branch = (F.col(group_col) == k, F.lit(float(r)))
        rate = F.when(*branch) if rate is None else rate.when(*branch)
    rate_expr = F.lit(float(default_rate)) if rate is None else rate.otherwise(
        F.lit(float(default_rate))
    )
    return df.filter(
        hash_fraction(F.col(id_col), seed=seed, hash_fn=hash_fn) < rate_expr
    )
