"""Consecutive-failure alerting (ST3/ST4) as a stateful streaming operator.

Reference semantics (internal/alert/evaluator.go:119-157, store.go:23-66):
- keyed by (tenant_id, destination_id);
- success resets the consecutive-failure count;
- failure increments it, idempotently per attempt_id (the reference stores
  a Redis SET of attempt ids; SCARD is the count — replays never
  double-count);
- crossing a percentage threshold of the auto-disable count emits a
  signal; 100% uses >= and triggers auto-disable;
- independently, a failed attempt with attempt_number > retry_max_limit
  and eligible_for_retry emits a retries-exhausted signal, suppressed to
  one per destination per window (logmq/batchprocessor.go:55-94);
- state expires after 24h idle (alertKeyTTL — store.go:15).

Two layers:
- :class:`AlertStateMachine` — pure-Python core, unit-testable, shared by
  the streaming processor.  This is the executable spec.
- :func:`alert_processor_factory` — wraps it in a ``StatefulProcessor`` for
  ``transformWithStateInPandas``, keyed by (tenant_id, destination_id),
  with a 24h state TTL.  At scale, state lives in the RocksDB state store,
  partitioned by key — no external Redis needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from outpost_spark.functions.backoff import should_alert, threshold_failure_counts

DEFAULT_THRESHOLDS = [50, 70, 90, 100]  # evaluator.go:98
MAX_TRACKED_ATTEMPT_IDS = 10_000  # bounds state growth per destination

ALERT_OUTPUT_SCHEMA = (
    "tenant_id string, destination_id string, signal string, "
    "failures int, max_failures int, level int, attempt_id string"
)


@dataclass
class AlertStateMachine:
    """Pure consecutive-failure evaluator (mirrors Evaluator.Evaluate).

    ``exhausted_window_seconds`` is the ST4 suppression window: at most one
    exhausted-retries alert per destination within the window, regardless
    of which events exhaust; 0 means alert on every exhaustion
    (services/builder.go:378-388).
    """

    auto_disable_failure_count: int = 20
    thresholds: list[int] = field(default_factory=lambda: list(DEFAULT_THRESHOLDS))
    retry_max_limit: int = 10
    consecutive_failure_enabled: bool = True
    exhausted_retries_enabled: bool = True
    exhausted_window_seconds: float = 0.0

    def __post_init__(self):
        self.pairs = threshold_failure_counts(
            self.thresholds, self.auto_disable_failure_count
        )

    def exhausted_suppressed(
        self, now: float, last_exhausted_at: float | None
    ) -> bool:
        """Inside the per-destination suppression window?"""
        return (
            self.exhausted_window_seconds > 0
            and last_exhausted_at is not None
            and (now - last_exhausted_at) < self.exhausted_window_seconds
        )

    def evaluate(
        self,
        seen_attempt_ids: set[str],
        *,
        attempt_id: str,
        success: bool,
        attempt_number: int = 1,
        eligible_for_retry: bool = True,
        now: float = 0.0,
        last_exhausted_at: float | None = None,
    ) -> tuple[set[str], list[dict]]:
        """One attempt outcome -> (new seen-id set, emitted signals).

        The seen-id set IS the consecutive-failure count (its cardinality),
        exactly like the reference's Redis SET.  The caller tracks
        ``last_exhausted_at`` per key and refreshes it whenever an
        ``alert.attempt.exhausted_retries`` signal is emitted.
        """
        signals: list[dict] = []
        if success:
            if self.consecutive_failure_enabled:
                seen_attempt_ids = set()
            return seen_attempt_ids, signals

        if self.consecutive_failure_enabled:
            if len(seen_attempt_ids) < MAX_TRACKED_ATTEMPT_IDS:
                seen_attempt_ids = seen_attempt_ids | {attempt_id}
            count = len(seen_attempt_ids)
            level, crossed = should_alert(self.pairs, count)
            if crossed:
                signals.append(
                    {
                        "signal": (
                            "alert.destination.disabled"
                            if level == 100
                            else "alert.destination.consecutive_failure"
                        ),
                        "failures": count,
                        "max_failures": self.auto_disable_failure_count,
                        "level": level,
                        "attempt_id": attempt_id,
                    }
                )
        if (
            self.exhausted_retries_enabled
            and self.retry_max_limit > 0
            and eligible_for_retry
            and attempt_number > self.retry_max_limit
            and not self.exhausted_suppressed(now, last_exhausted_at)
        ):
            signals.append(
                {
                    "signal": "alert.attempt.exhausted_retries",
                    "failures": len(seen_attempt_ids),
                    "max_failures": self.auto_disable_failure_count,
                    "level": 0,
                    "attempt_id": attempt_id,
                }
            )
        return seen_attempt_ids, signals


def alert_processor_factory(machine: AlertStateMachine):
    """Build a StatefulProcessor class driving ``machine`` per key.

    Input rows (grouped by tenant_id, destination_id): attempt_id, status,
    attempt_number, eligible_for_retry.  Output: ALERT_OUTPUT_SCHEMA rows.
    """
    import time as _time

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    state_schema = StructType(
        [
            StructField("ids", StringType(), True),
            StructField("last_exhausted", DoubleType(), True),
        ]
    )

    class AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("cf_ids", state_schema, ttlDurationMs=24 * 3600 * 1000)

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            tenant_id, destination_id = key[0], key[1]
            seen: set[str] = set()
            last_exhausted = None
            if self.state.exists():
                stored, last_exhausted = self.state.get()
                if stored:
                    seen = set(stored.split("\x00"))
            now = _time.time()
            out = []
            for pdf in rows:
                # arrival order within a batch is preserved per key
                for r in pdf.itertuples(index=False):
                    seen, signals = machine.evaluate(
                        seen,
                        attempt_id=str(r.attempt_id),
                        success=(r.status == "success"),
                        attempt_number=int(r.attempt_number),
                        eligible_for_retry=bool(r.eligible_for_retry),
                        now=now,
                        last_exhausted_at=last_exhausted,
                    )
                    for s in signals:
                        if s["signal"] == "alert.attempt.exhausted_retries":
                            last_exhausted = now  # refresh suppression window
                        out.append(
                            {
                                "tenant_id": tenant_id,
                                "destination_id": destination_id,
                                **s,
                            }
                        )
            self.state.update(("\x00".join(sorted(seen)), last_exhausted))
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return AlertProcessor


ALERT_STATE_SCHEMA = (
    "tenant_id string, destination_id string, ids array<string>, "
    "last_exhausted double, updated_at double"
)


from outpost_spark.streaming.state_table import VersionedStateTable


class AlertStateTable(VersionedStateTable):
    """Batched alert evaluation: the scale path for ST3/ST4.

    The per-key stateful paths (:func:`attach_alert_stream`) invoke
    Python once per (tenant_id, destination_id) — the same ~2.5k keys/s
    pandas ceiling the retry queue measured.  This table keeps the exact
    :class:`AlertStateMachine` semantics (reference:
    internal/alert/evaluator.go:119-157, store.go:23-66) but applies
    each micro-batch as ONE set-oriented plan, entirely JVM-side:

    1. order each key's attempts by ``order_cols`` (the fold order the
       sequential evaluator gets from arrival) and segment them by the
       running success count — a segment is a maximal run with no
       success before it, so "consecutive failures" never cross one;
    2. the consecutive-failure count at each failure row = carried
       state-set size (segment 0 only) + the running count of NEW
       failure attempt_ids in its segment (idempotent per attempt_id —
       intra-batch duplicates and ids already in the carried set don't
       re-count), saturating at MAX_TRACKED_ATTEMPT_IDS;
    3. every failure row evaluates ``should_alert`` on its count
       (equality thresholds, >= at 100%) — exactly the per-row emission
       the sequential evaluator does, including re-emission on replays
       that leave the count at a threshold;
    4. exhausted-retries signals fire per failure row beyond
       retry_max_limit, suppressed to the key's FIRST such row per
       batch when a suppression window is set (all rows in a batch
       share ``now``, so the sequential fold suppresses the rest the
       same way) and to nothing when the carried ``last_exhausted``
       stamp is still inside the window;
    5. the new state per key = the failure ids of its LAST segment
       (carry included only when the batch had no success), the
       refreshed ``last_exhausted``, and ``updated_at=now`` — entries
       idle past ``ttl_seconds`` expire at the next read (the
       reference's 24 h alertKeyTTL, store.go:15).

    State lives as a versioned parquet table through the tablefs seam
    (see :class:`streaming.state_table.VersionedStateTable`); emitted
    signals land durably under ``signals/v=<batch_id>`` so a re-run of
    a crashed batch overwrites rather than duplicates.  Scale: the only
    shuffles are on (tenant_id, destination_id) — state merge, windows,
    and the final aggregate all co-locate per key; per-key state is one
    row with an id array capped at MAX_TRACKED_ATTEMPT_IDS, no Python
    anywhere in the plan.  For batches where one destination takes a
    pathological share of rows (the whole-key ordered windows would
    serialize that key in one task), ``order_buckets=N`` switches the
    fold to the two-pass hot-key carry — see :meth:`apply_attempts`.
    """

    aux_outputs = ("signals",)

    def __init__(
        self,
        spark,
        path: str,
        *,
        machine: AlertStateMachine | None = None,
        keep_versions: int = 3,
        ttl_seconds: float = 24 * 3600.0,
        order_buckets: int | None = None,
        hot_key_rows: int | None = None,
    ):
        super().__init__(
            spark,
            path,
            state_schema=ALERT_STATE_SCHEMA,
            keep_versions=keep_versions,
        )
        self.machine = machine or AlertStateMachine()
        self.ttl_seconds = ttl_seconds
        self.order_buckets = order_buckets
        self.hot_key_rows = hot_key_rows

    def apply_attempts(
        self,
        batch_df,
        batch_id: int,
        now: float,
        order_cols=("seq",),
        order_buckets: int | None = None,
        hot_key_rows: int | None = None,
    ):
        """One micro-batch of attempt rows -> emitted alert-signal frame.

        ``batch_df`` needs (tenant_id, destination_id, attempt_id,
        status, attempt_number, eligible_for_retry) plus the
        ``order_cols`` that define each key's fold order (attempt_time,
        a source offset, ...); ties break on attempt_id.  Returns the
        ALERT_OUTPUT_SCHEMA frame of signals emitted by this batch.

        ``order_buckets`` selects the hot-key carry (same two-pass trick
        as :func:`ops.joins.asof_join`'s ``bucket_seconds``): the
        single-pass plan folds each key's batch slice in ONE ordered
        window task, so a destination taking millions of rows in one
        batch serializes — the skew AQE splits for joins but not for
        windows.  With N buckets set, the first order column's per-key
        range splits into N order-aligned sub-partitions; the running
        success count and per-segment new-failure count fold within
        (key, bucket) — per-task work bounded by rows-per-bucket — and
        cross-bucket offsets carry over ONE summary row per touched
        bucket (a per-key window over at most N rows).  The first order
        column must be numeric or timestamp.  Signals and state are
        identical in both modes (pinned by a 90%-hot-key pytest and the
        AlertHotKeySkew scale row's per-batch fingerprint equality).

        MEASURED trade-off (BENCH_SCALE_r12): at one destination taking
        50% of a 1.2M-row batch the bucketed fold runs 0.46x the
        single-pass plan — its ~3 extra key-keyed shuffles cost more
        than the hot key's single-task window sort.  Leave it OFF by
        default; turn it on as the memory-safety escape hatch when one
        key's batch slice is large enough that a single window task
        materializing it risks executor OOM (tens of millions of rows),
        where bounded per-task memory is worth the shuffle overhead.

        ``hot_key_rows=N`` (r13) makes that escape hatch AUTOMATIC: one
        cheap per-key count routes only keys whose batch slice exceeds
        N rows through the bucketed fold (``order_buckets`` buckets, or
        32 when unset) while every other key keeps the single-pass
        whole-key windows — the bucketed plan's extra shuffles carry
        only the hot slice, and a batch with no pathological key pays
        just the count.  All three modes are signal- and
        state-identical (pinned by the mixed hot/cold pytest)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if order_buckets is None:
            order_buckets = self.order_buckets
        if hot_key_rows is None:
            hot_key_rows = self.hot_key_rows
        m = self.machine
        key = ["tenant_id", "destination_id"]
        ords = [F.col(c) for c in order_cols] + [F.col("attempt_id")]

        old = self.state_before(batch_id)
        if self.ttl_seconds:
            old = old.where(
                F.col("updated_at") > F.lit(float(now) - self.ttl_seconds)
            )

        b = batch_df.select(
            *key,
            F.col("attempt_id").cast("string"),
            F.col("status").cast("string"),
            F.col("attempt_number").cast("int"),
            F.col("eligible_for_retry").cast("boolean"),
            *[F.col(c) for c in order_cols],
        ).join(
            old.select(
                *key,
                F.col("ids").alias("st_ids"),
                F.col("last_exhausted").alias("st_last_ex"),
            ),
            on=key,
            how="left",
        )
        b = b.withColumn("is_fail", F.col("status") != F.lit("success"))
        is_succ = F.when(~F.col("is_fail"), 1).otherwise(0)
        carried = F.coalesce(F.size("st_ids"), F.lit(0))

        def _seg_fold(bp, n_buckets):
            """seg (running success count at each row in the fold order)
            and S (the key's final segment) for one slice of the batch's
            keys; ``n_buckets`` selects the two-pass order-bucket carry."""
            if n_buckets:
                # pass 1 setup: order-aligned range buckets of the FIRST
                # order col, per key — monotone in the fold order, so a
                # bucket boundary never splits an order tie
                ord0 = F.col(order_cols[0]).cast("double")
                rng = bp.groupBy(*key).agg(
                    F.min(ord0).alias("__mn"), F.max(ord0).alias("__mx")
                )
                bp = bp.join(rng, on=key, how="left")
                width = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets))
                # null ord0 (or an all-null key, where __mn/__mx are null
                # too) must land in bucket 0: the single-pass window sorts
                # nulls FIRST, and a null __bkt would silently drop the row
                # at the (key, __bkt) equi-joins below.  The null test must
                # come before the arithmetic — F.least SKIPS nulls, so
                # least(floor(null), N-1) would yield N-1, folding null rows
                # LAST instead of first.
                bp = bp.withColumn(
                    "__bkt",
                    F.when(
                        ord0.isNull()
                        | F.col("__mn").isNull()
                        | (F.col("__mx") <= F.col("__mn")),
                        F.lit(0),
                    )
                    .otherwise(
                        F.least(
                            F.floor((ord0 - F.col("__mn")) / width),
                            F.lit(n_buckets - 1),
                        )
                    )
                    .cast("int"),
                ).drop("__mn", "__mx")
                w_bkt = Window.partitionBy(*key, "__bkt").orderBy(*ords)
                bp = bp.withColumn(
                    "__lsucc",
                    F.sum(is_succ).over(
                        w_bkt.rowsBetween(
                            Window.unboundedPreceding, Window.currentRow
                        )
                    ),
                )
                # pass 2: carry success offsets over ONE summary row per
                # touched bucket — the per-key windows below run over at
                # most ``n_buckets`` rows
                bsum = bp.groupBy(*key, "__bkt").agg(
                    F.sum(is_succ).alias("__bsucc")
                )
                w_carry = Window.partitionBy(*key).orderBy("__bkt")
                bsum = bsum.select(
                    *key,
                    "__bkt",
                    F.coalesce(
                        F.sum("__bsucc").over(
                            w_carry.rowsBetween(Window.unboundedPreceding, -1)
                        ),
                        F.lit(0),
                    ).alias("__psucc"),
                    F.sum("__bsucc").over(Window.partitionBy(*key)).alias("S"),
                )
                bp = bp.join(bsum, on=[*key, "__bkt"], how="left")
                return bp.withColumn("seg", F.col("__psucc") + F.col("__lsucc"))
            w_key = Window.partitionBy(*key).orderBy(*ords)
            bp = bp.withColumn(
                "seg",
                F.sum(is_succ).over(
                    w_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            # S = the key's final segment (total successes in the batch)
            return bp.withColumn("S", F.max("seg").over(Window.partitionBy(*key)))

        def _cf_fold(fp, n_buckets):
            """in_state/is_new flags and the consecutive-failure rank /
            count at each failure row, for one slice of the keys."""
            # dedup groups are (key, seg, attempt_id) — bounded by the dup
            # count of one id in one segment, skew-free in every mode
            w_dup = Window.partitionBy(*key, "seg", "attempt_id").orderBy(*ords)
            fp = fp.withColumn(
                "in_state",
                (F.col("seg") == 0)
                & F.coalesce(
                    F.array_contains(F.col("st_ids"), F.col("attempt_id")),
                    F.lit(False),
                ),
            ).withColumn(
                "is_new",
                (F.row_number().over(w_dup) == 1) & ~F.col("in_state"),
            )
            if m.consecutive_failure_enabled:
                new_int = F.col("is_new").cast("int")
                if n_buckets:
                    # per-segment running new-failure count, two-pass: fold
                    # within (key, seg, bucket), carry per-bucket totals
                    # with a window over summary rows (<= n_buckets per
                    # (key, seg))
                    segsum = fp.groupBy(*key, "seg", "__bkt").agg(
                        F.sum(new_int).alias("__bnew")
                    )
                    w_segcarry = Window.partitionBy(*key, "seg").orderBy("__bkt")
                    segsum = segsum.select(
                        *key,
                        "seg",
                        "__bkt",
                        F.coalesce(
                            F.sum("__bnew").over(
                                w_segcarry.rowsBetween(
                                    Window.unboundedPreceding, -1
                                )
                            ),
                            F.lit(0),
                        ).alias("__pnew"),
                    )
                    fp = fp.join(segsum, on=[*key, "seg", "__bkt"], how="left")
                    w_seg_b = (
                        Window.partitionBy(*key, "seg", "__bkt")
                        .orderBy(*ords)
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    )
                    cf_rank = (
                        F.when(F.col("seg") == 0, carried).otherwise(F.lit(0))
                        + F.col("__pnew")
                        + F.sum(new_int).over(w_seg_b)
                    )
                else:
                    w_seg = (
                        Window.partitionBy(*key, "seg")
                        .orderBy(*ords)
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    )
                    cf_rank = F.when(F.col("seg") == 0, carried).otherwise(
                        F.lit(0)
                    ) + F.sum(new_int).over(w_seg)
                cf_count = F.least(cf_rank, F.lit(MAX_TRACKED_ATTEMPT_IDS))
            else:
                cf_rank = carried
                cf_count = carried  # the set never mutates when disabled
            return fp.withColumn("cf_rank", cf_rank).withColumn(
                "cf_count", cf_count
            )

        if hot_key_rows is not None:
            # hybrid: one cheap per-key count routes only pathological
            # keys through the bucketed fold; the extra shuffles of that
            # plan carry ONLY the hot slice.  Both slices then union into
            # the shared signal/state derivation below — the downstream
            # code is mode-blind because every aggregate there is keyed.
            nb = order_buckets or 32
            cnt = b.groupBy(*key).agg(F.count(F.lit(1)).alias("__krows"))
            b = b.join(cnt, on=key, how="left")
            hot = F.col("__krows") > F.lit(int(hot_key_rows))
            b_hot = _seg_fold(b.where(hot), nb)
            b_cold = _seg_fold(b.where(~hot), None)
            f_hot = _cf_fold(b_hot.where("is_fail"), nb)
            f_cold = _cf_fold(b_cold.where("is_fail"), None)
            sel_b = [*key, "seg", "st_ids", "st_last_ex"]
            sel_f = [
                *key,
                "attempt_id",
                "attempt_number",
                "eligible_for_retry",
                *order_cols,
                "st_last_ex",
                "seg",
                "S",
                "is_new",
                "cf_rank",
                "cf_count",
            ]
            b = b_hot.select(*sel_b).unionByName(b_cold.select(*sel_b))
            fails = f_hot.select(*sel_f).unionByName(f_cold.select(*sel_f))
        else:
            b = _seg_fold(b, order_buckets)
            fails = _cf_fold(b.where("is_fail"), order_buckets)

        # should_alert as a when-chain in the SAME order as the Python
        # loop: descending failure count, 100% with >=, others exact
        level_expr = None
        for pct, count_th in reversed(m.pairs):
            cond = (
                (F.col("cf_count") >= count_th)
                if pct == 100
                else (F.col("cf_count") == count_th)
            )
            level_expr = (
                F.when(cond, pct)
                if level_expr is None
                else level_expr.when(cond, pct)
            )
        level_col = (
            level_expr.otherwise(F.lit(0)) if level_expr is not None else F.lit(0)
        )
        fails = fails.withColumn("level", level_col)

        out_cols = [
            *key,
            F.col("signal"),
            F.col("cf_count").cast("int").alias("failures"),
            F.lit(m.auto_disable_failure_count).cast("int").alias("max_failures"),
            F.col("level").cast("int"),
            F.col("attempt_id"),
        ]
        parts = []
        if m.consecutive_failure_enabled:
            parts.append(
                fails.where(F.col("level") > 0)
                .withColumn(
                    "signal",
                    F.when(
                        F.col("level") == 100,
                        F.lit("alert.destination.disabled"),
                    ).otherwise(F.lit("alert.destination.consecutive_failure")),
                )
                .select(*out_cols)
            )
        ex_enabled = m.exhausted_retries_enabled and m.retry_max_limit > 0
        if ex_enabled:
            ex_rows = fails.where(
                F.col("eligible_for_retry")
                & (F.col("attempt_number") > F.lit(m.retry_max_limit))
            )
            if m.exhausted_window_seconds > 0:
                not_suppressed = F.col("st_last_ex").isNull() | (
                    F.lit(float(now)) - F.col("st_last_ex")
                    >= F.lit(m.exhausted_window_seconds)
                )
                sort_struct = F.struct(
                    *[F.col(c) for c in order_cols], F.col("attempt_id")
                )
                if order_buckets or hot_key_rows is not None:
                    # first-ex-row per key via a partial-aggregable min,
                    # not a whole-key ordered window; rows tying on the
                    # full sort key are exact duplicates (same attempt,
                    # same count), so any one representative is the row
                    firsts = ex_rows.groupBy(*key).agg(
                        F.min(sort_struct).alias("__first")
                    )
                    ex_rows = (
                        ex_rows.join(firsts, on=key)
                        .where(sort_struct == F.col("__first"))
                        .dropDuplicates(key)
                        .where(not_suppressed)
                        .drop("__first")
                    )
                else:
                    w_ex = Window.partitionBy(*key).orderBy(*ords)
                    ex_rows = ex_rows.withColumn(
                        "rn_ex", F.row_number().over(w_ex)
                    ).where((F.col("rn_ex") == 1) & not_suppressed)
            parts.append(
                ex_rows.withColumn(
                    "signal", F.lit("alert.attempt.exhausted_retries")
                )
                .withColumn("level", F.lit(0))
                .select(*out_cols)
            )
        signals = (
            parts[0]
            if len(parts) == 1
            else parts[0].unionByName(parts[1])
            if parts
            else self.spark.createDataFrame([], ALERT_OUTPUT_SCHEMA)
        )

        # ---- new state per key -------------------------------------------
        # ids of the final segment in fold order (idempotent adds only);
        # the cf_rank cap bounds the collect_list to MAX_TRACKED even
        # when a hot key's final segment holds millions of new failures
        # (the sequential machine stops adding at exactly that rank)
        last_ids = (
            fails.where(
                (F.col("seg") == F.col("S"))
                & F.col("is_new")
                & (F.col("cf_rank") <= F.lit(MAX_TRACKED_ATTEMPT_IDS))
            )
            .groupBy(*key)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                *[F.col(c) for c in order_cols],
                                F.col("attempt_id"),
                            )
                        )
                    ),
                    lambda x: x["attempt_id"],
                ).alias("new_ids")
            )
        )
        ex_emitted = None
        if ex_enabled:
            ex_keys = (
                signals.where(
                    F.col("signal") == "alert.attempt.exhausted_retries"
                )
                .select(*key)
                .distinct()
                .withColumn("ex_hit", F.lit(True))
            )
            ex_emitted = ex_keys
        per_key = (
            b.groupBy(*key)
            .agg(
                F.max("seg").alias("S"),
                F.first("st_ids").alias("st_ids"),
                F.first("st_last_ex").alias("st_last_ex"),
            )
            .join(last_ids, on=key, how="left")
        )
        if ex_emitted is not None:
            per_key = per_key.join(ex_emitted, on=key, how="left")
        else:
            per_key = per_key.withColumn("ex_hit", F.lit(None).cast("boolean"))
        empty_arr = F.array().cast("array<string>")
        if m.consecutive_failure_enabled:
            ids_final = F.slice(
                F.concat(
                    F.when(F.col("S") == 0, F.coalesce("st_ids", empty_arr))
                    .otherwise(empty_arr),
                    F.coalesce("new_ids", empty_arr),
                ),
                1,
                MAX_TRACKED_ATTEMPT_IDS,
            )
        else:
            ids_final = F.coalesce("st_ids", empty_arr)
        updates = per_key.select(
            *key,
            ids_final.alias("ids"),
            F.when(F.col("ex_hit"), F.lit(float(now)))
            .otherwise(F.col("st_last_ex"))
            .cast("double")
            .alias("last_exhausted"),
            F.lit(float(now)).alias("updated_at"),
        )
        new_state = old.join(
            updates.select(*key), on=key, how="left_anti"
        ).unionByName(updates)

        sig_path = self.fs.join(self.path, f"signals/v={batch_id}")
        state_path = self.fs.join(self.path, f"v={batch_id}")
        signals.write.mode("overwrite").parquet(sig_path)
        new_state.write.mode("overwrite").parquet(state_path)
        self._cleanup(batch_id)
        return self.spark.read.parquet(sig_path)


def apply_disable_signals(destinations, signals, *, now=None):
    """Auto-disable feedback: close the loop from ST3 back into routing.

    Reference: a 100% consecutive-failure signal disables the
    destination (internal/alert/evaluator.go:119-157) and MatchEvent
    excludes disabled destinations (redistenantstore.go:645-667 —
    mirrored by routing/match.py's ``disabled_at IS NULL`` predicate).
    This stamps ``disabled_at`` on every destination named by an
    ``alert.destination.disabled`` signal, idempotently (an existing
    stamp wins, so replayed signals don't move the disable time).
    Returns the updated destinations frame; persist it wherever the
    router reads destinations so the NEXT batch's fan-out excludes the
    disabled rows.  Scale: one broadcast-sized distinct on the signal
    frame left-joined onto the dims — no shuffle on the big side beyond
    the join key."""
    from pyspark.sql import functions as F

    hits = F.broadcast(
        signals.where(F.col("signal") == "alert.destination.disabled")
        .select(
            F.col("tenant_id").alias("__t"),
            F.col("destination_id").alias("__d"),
        )
        .distinct()
    )
    ts = (
        F.lit(now).cast("timestamp")
        if now is not None
        else F.current_timestamp()
    )
    return (
        destinations.join(
            hits,
            (destinations["tenant_id"] == F.col("__t"))
            & (destinations["id"] == F.col("__d")),
            "left",
        )
        .withColumn(
            "disabled_at",
            F.coalesce(
                F.col("disabled_at"),
                F.when(F.col("__d").isNotNull(), ts),
            ),
        )
        .drop("__t", "__d")
    )


def alert_foreach_batch(
    spark,
    state_path: str,
    sink,
    *,
    machine: AlertStateMachine | None = None,
    order_cols=("seq",),
    now_fn=None,
    order_buckets: int | None = None,
):
    """foreachBatch adapter for :class:`AlertStateTable` —
    ``attempts.writeStream.foreachBatch(alert_foreach_batch(spark, path,
    sink)).start()``; ``sink(signals_df, batch_id)`` receives each
    batch's emitted ALERT_OUTPUT_SCHEMA frame.  ``order_buckets``
    selects the hot-key two-pass fold (see
    :meth:`AlertStateTable.apply_attempts`)."""
    import time as _time

    table = AlertStateTable(
        spark, state_path, machine=machine, order_buckets=order_buckets
    )

    def fn(batch_df, batch_id: int):
        now = now_fn() if now_fn is not None else _time.time()
        signals = table.apply_attempts(
            batch_df, int(batch_id), now, order_cols=order_cols
        )
        sink(signals, int(batch_id))

    return fn


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def attach_alert_stream(attempts_stream, machine: AlertStateMachine, *, impl: str = "auto"):
    """attempts stream -> alert signal stream.

    ``impl='tws'`` uses ``transformWithStateInPandas`` (RocksDB-backed
    value state + TTL — the scale path); ``impl='apws'`` uses
    ``applyInPandasWithState`` (GroupState — no protobuf dependency).
    ``'auto'`` picks tws when the python protobuf package exists (the TWS
    worker protocol requires it), else apws.  Semantics are identical:
    both drive the same :class:`AlertStateMachine`.
    """
    if impl == "auto":
        impl = "tws" if _protobuf_available() else "apws"
    if impl == "tws":
        processor_cls = alert_processor_factory(machine)
        return attempts_stream.groupBy("tenant_id", "destination_id").transformWithStateInPandas(
            statefulProcessor=processor_cls(),
            outputStructType=ALERT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

    import time as _time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ALERT_OUTPUT_SCHEMA
    state_schema = "ids string, last_exhausted double"

    def func(key, pdfs, state: GroupState):
        tenant_id, destination_id = key
        seen: set[str] = set()
        last_exhausted = None
        if state.exists:
            stored, last_exhausted = state.get
            if stored:
                seen = set(stored.split("\x00"))
        now = _time.time()
        out = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                seen, signals = machine.evaluate(
                    seen,
                    attempt_id=str(r.attempt_id),
                    success=(r.status == "success"),
                    attempt_number=int(r.attempt_number),
                    eligible_for_retry=bool(r.eligible_for_retry),
                    now=now,
                    last_exhausted_at=last_exhausted,
                )
                for s in signals:
                    if s["signal"] == "alert.attempt.exhausted_retries":
                        last_exhausted = now  # refresh suppression window
                    out.append(
                        {"tenant_id": tenant_id, "destination_id": destination_id, **s}
                    )
        state.update(("\x00".join(sorted(seen)), last_exhausted))
        if out:
            yield pd.DataFrame(out)

    return attempts_stream.groupBy("tenant_id", "destination_id").applyInPandasWithState(
        func, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
