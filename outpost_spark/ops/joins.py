"""Temporal joins Spark's optimizer has no native operator for: as-of
and range joins, re-expressed as shuffle-bounded compositions.

Both are classic time-series primitives (kdb+ ``aj``, DuckDB ``ASOF
JOIN``, pandas ``merge_asof``) that a naive Spark formulation plans as a
broadcast-nested-loop or cartesian product — the non-equi predicate
gives the optimizer nothing to hash on.  The compositions here restore
equi-join shapes:

- :func:`asof_join` — union-and-carry: tag both sides, union, one
  window per key ordered by (time, side) carrying the last right-side
  values forward, keep left rows.  ONE shuffle per side on the key, an
  in-partition sort, no join node at all.  Ties (right.ts == left.ts)
  match, like DuckDB's ``l.ts >= r.ts`` — the right-before-left tag
  ordering encodes exactly that.
- :func:`range_join` — bin-and-verify: intervals explode to the
  fixed-width time bins they overlap, facts map to their single bin,
  an equi-join on (key, bin) replaces the cartesian, and the exact
  BETWEEN predicate verifies.  Shuffle volume is facts + intervals x
  bins-per-interval; ``bin_width`` trades duplication (long intervals)
  against per-bin fan-in (dense bins) — set it near the median interval
  length.

Scale: both avoid any driver-side work and any non-equi join node;
skewed keys/bins are AQE's standard cases.  Oracles: DuckDB has native
``ASOF JOIN``, and the range oracle is the literal BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, the most recent right row of the same ``on``
    key with ``right_ts <= left_ts`` (inclusive) — all left columns plus
    ``right_cols`` (null when no prior right row exists, or when the
    match is older than ``tolerance_seconds``).

    Right (key, ts) pairs should be unique; with duplicates the carried
    values all come from one right row (the window's last at that ts),
    never mixed across rows.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r = right.select(
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    ).select(*l.columns)  # align column order for the union
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct carry: all right columns + the matched ts travel
    # together, so values can never mix across right rows
    carry = F.last(
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__r_ts").alias("ts"),
                *[F.col(f"__r_{c}").alias(c) for c in right_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    out = u.withColumn("__m", carry).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col(left_ts).cast("double") - F.col("__m.ts").cast("double")
        ) <= float(tolerance_seconds)
        out = out.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & in_tol, F.col("__m"))
        )
    return out.select(
        *lcols, *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols]
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    on: str | None,
    fact_ts: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join facts to every interval containing them (``start <= ts <=
    end``, plus key equality when ``on`` is given) without a cartesian:
    intervals explode to their overlapped fixed-width bins, facts hash to
    their single bin, the equi-join runs on (key, bin), and the exact
    BETWEEN predicate verifies.  ``how="left"`` keeps unmatched facts
    with null interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    wsec = int(bin_width_seconds)
    fbin = F.floor(F.col(fact_ts).cast("double") / wsec).cast("long")
    sbin = F.floor(F.col(start_col).cast("double") / wsec).cast("long")
    ebin = F.floor(F.col(end_col).cast("double") / wsec).cast("long")
    # interval columns renamed up front: facts and intervals may share
    # lineage (both derived from one source), and distinct names sidestep
    # Spark's ambiguous-self-join resolution entirely
    ivc = {c: f"__iv_{c}" for c in intervals.columns}
    iv = intervals.select(
        *[F.col(c).alias(n) for c, n in ivc.items()],
        F.explode(F.sequence(sbin, ebin)).alias("__ibin"),
    )
    fx = facts.withColumn("__bin", fbin)
    cond = F.col("__bin") == F.col("__ibin")
    if on:
        cond = cond & (F.col(on) == F.col(ivc[on]))
    joined = fx.join(iv, cond, how)
    between = (F.col(fact_ts) >= F.col(ivc[start_col])) & (
        F.col(fact_ts) <= F.col(ivc[end_col])
    )
    if how == "inner":
        return joined.filter(between).select(
            *facts.columns, *[F.col(ivc[c]).alias(f"iv_{c}") for c in intervals.columns]
        )
    # left: null-out interval columns for bin-collisions outside the
    # range, then collapse each fact to at most its real matches
    out = joined.select(
        *facts.columns,
        *[F.when(between, F.col(ivc[c])).alias(f"iv_{c}") for c in intervals.columns],
    ).dropDuplicates(list(facts.columns) + [f"iv_{c}" for c in intervals.columns])
    matched = out.filter(
        F.greatest(*[F.col(f"iv_{c}").isNotNull() for c in intervals.columns])
    )
    unmatched = out.join(
        matched.select(*facts.columns).distinct(), list(facts.columns), "left_anti"
    )
    return matched.unionByName(unmatched)
