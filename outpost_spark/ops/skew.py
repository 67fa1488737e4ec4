"""Salted two-stage exact distinct counts — including the honest finding.

The folklore skew fix for ``groupBy(k).agg(count_distinct(x))`` is to
salt by ``hash(x) mod S`` so a hot group key's distinct-set spreads over
S reducers.  MEASURED RESULT on this engine: **Spark already does the
equivalent internally**, so the manual rewrite is redundant.  Catalyst's
distinct-aggregate rewrite plans the heavy exchange keyed on **(k, x)**
— the distinct column participates in the partitioning, so a hot k is
spread across the cluster by x's hash and only per-partition partial
COUNTS (a handful of rows per key) move in the k-keyed merge exchange:

    HashAggregate(keys=[k], count(distinct x))
      Exchange hashpartitioning(k)            <- tiny: partial counts
        HashAggregate(keys=[k], partial_count(distinct x))
          HashAggregate(keys=[k, x])
            Exchange hashpartitioning(k, x)   <- heavy, but skew-proof

On the 10M-attempt corpus (tenant_0 owning ~90 % of ~12.6M rows) plain
and salted measure within noise of each other (BENCH_SCALE
``DistinctByTenant_plain`` vs ``_salted``) — the negative result is the
point: group-key skew in Spark hurts operators WITHOUT such a rewrite
(hot-partition window functions — which this repo's J4 path already
avoids via ``max_by`` — and non-combinable aggregates like
``collect_list``), not exact distinct counts.

:func:`salted_count_distinct` stays as the explicit, engine-portable
form of the same decomposition: per-salt distinct sets are disjoint by
construction, so the counts sum EXACTLY — equality with the plain
aggregate (nulls included) is pytest-pinned and the DuckDB oracle for
the catalog entry is the plain ``COUNT(DISTINCT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str | Column,
    *,
    salt_buckets: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group distinct count via explicit (keys, salt) partial
    distinct + sum.  Equivalent to ``count_distinct`` for every input
    (see module docstring for when — and when NOT — this rewrite earns
    its extra shuffle on this engine).

    Null semantics match ``count_distinct``: nulls hash into one salt
    bucket, where the inner ``count_distinct`` ignores them.
    """
    x = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    salt = F.pmod(F.xxhash64(x), F.lit(salt_buckets)).alias("__salt")
    partial = df.groupBy(*group_cols, salt).agg(
        F.count_distinct(x).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial").cast("long").alias(out_col)
    )
