"""Event -> destination routing (the fan-out join, J3).

Reference: tenantstore MatchEvent scans a tenant's destinations applying
disabled/topic/filter predicates (redistenantstore.go:645-667, predicate
entities.go:51-59); the publish handler stamps matched ids on the event and
emits one DeliveryTask per match (publishmq/eventhandler.go:123-200).

Spark-first shape — a stream-static broadcast join:

    events ⨝_broadcast destinations  ON tenant_id
        WHERE disabled_at IS NULL
          AND topic matches destination.topics      (JVM regex, no UDF)
          AND filter matches event                  (compiled Column when
                                                     possible, else Pandas UDF)
    -> groupBy(event) -> sort_array(collect_list(destination_id))

The destinations table is a small dimension (thousands of rows) — always
broadcast, so routing shuffles nothing but the final per-event group, and
the same plan lifts to readStream unchanged (stream-static joins support
broadcast).  At 100 TB of events the only wide exchange is the final
groupBy, keyed by unique event_id — no skew (each key is unique).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from outpost_spark.functions.jsonmatch import match_event_filter
from outpost_spark.functions.topic import topic_match_any_expr


def _filter_match_fn(
    filter_json: pd.Series,
    event_id: pd.Series,
    topic: pd.Series,
    time_str: pd.Series,
    metadata_json: pd.Series,
    data: pd.Series,
) -> pd.Series:
    """Arrow-batched evaluation of simplejsonmatch filter docs.

    Used for per-row (destination-carried) filter documents where plan-time
    compilation isn't possible.  Inputs are JSON strings; an unparsable
    filter doc evaluates to no-match (the reference treats panics as false).
    """
    out = []
    for f, eid, top, ts, md, d in zip(
        filter_json, event_id, topic, time_str, metadata_json, data
    ):
        if f is None or f == "" or f == "null":
            out.append(True)
            continue
        try:
            doc = json.loads(f)
        except Exception:
            out.append(False)
            continue
        if not isinstance(doc, dict):
            out.append(False)
            continue
        try:
            md_map = json.loads(md) if md else {}
        except Exception:
            md_map = {}
        out.append(
            match_event_filter(
                doc,
                event_id=eid or "",
                topic=top or "",
                time_rfc3339=ts or "",
                metadata=md_map if isinstance(md_map, dict) else {},
                data=d,
            )
        )
    return pd.Series(out)


_filter_match_udf = None


def _get_filter_match_udf():
    """Create the Pandas UDF lazily (pandas_udf needs an active session)."""
    global _filter_match_udf
    if _filter_match_udf is None:
        _filter_match_udf = pandas_udf(_filter_match_fn, "boolean")
    return _filter_match_udf


def destination_match_predicate(
    event_topic: Column,
    dest_topics: Column,
    dest_disabled_at: Column,
    filter_pred: Column | None = None,
) -> Column:
    """entities.go:51-59: enabled ∧ topic-match ∧ filter-match."""
    pred = dest_disabled_at.isNull() & topic_match_any_expr(event_topic, dest_topics)
    if filter_pred is not None:
        pred = pred & filter_pred
    return pred


def _rfc3339(col: Column) -> Column:
    # Go formats with "2006-01-02T15:04:05Z07:00" (operators.go:318) — UTC => 'Z'
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ssX")


def _compiled_filter_predicate(destinations: DataFrame, overflow_fallback: Column | None = None):
    """Plan-time compilation of the distinct filter docs (P8 fast path).

    The destinations dimension is small by design (it broadcasts into the
    routing join), so collecting its distinct filter documents at plan time
    is cheap.  Each compilable doc becomes a native Column predicate in a
    CASE chain keyed on the filter text — evaluation stays inside
    whole-stage codegen; only rows whose doc is outside the compilable
    subset fall back to the pandas-UDF interpreter.  Returns (chain,
    any_uncompilable).

    ``overflow_fallback``: the compiled predicate unrolls nested-array
    recursion to a fixed bound while the reference recurses to any
    data-driven depth (match.go:115-185).  When provided (the 'compiled'
    mode, where the interpreter column is materialized anyway), rows
    whose payload nests arrays past the bound along an inspected path are
    routed to this fallback instead of the bounded predicate, so depth
    never changes an outcome.  When None ('compiled_static'), the bound
    is part of the mode's documented contract.
    """
    import json as _json

    from outpost_spark.functions.jsonmatch_compiler import (
        UncompilableFilter,
        compile_filter,
        compile_overflow,
    )

    docs = [
        r["filter"]
        for r in destinations.select("filter").distinct().collect()
        if r["filter"]
    ]
    chain = F.when(F.col("__dest_filter").isNull(), F.lit(True))
    any_uncompilable = False
    for fstr in docs:
        try:
            doc = _json.loads(fstr)
            if not isinstance(doc, dict):
                raise ValueError
        except (ValueError, TypeError):
            # invalid filter docs never match (match.go:10-16)
            chain = chain.when(F.col("__dest_filter") == fstr, F.lit(False))
            continue
        try:
            pred = compile_filter(
                doc,
                data_col=F.col("data"),
                topic_col=F.col("topic"),
                id_col=F.col("event_id"),
                time_col=_rfc3339(F.col("event_time")),
                metadata_col=F.col("metadata"),
            )
        except UncompilableFilter:
            any_uncompilable = True
            continue
        if overflow_fallback is not None:
            overflow = compile_overflow(doc, data_col=F.col("data"))
            if overflow is not None:
                pred = F.when(overflow, overflow_fallback).otherwise(pred)
        chain = chain.when(F.col("__dest_filter") == fstr, pred)
    return chain, any_uncompilable


def match_pairs(
    events: DataFrame,
    destinations: DataFrame,
    *,
    use_filter_udf: bool = True,
    filter_mode: str = "compiled",
) -> DataFrame:
    """(event x matched destination) pairs — the streaming-safe core join.

    ``events`` columns: event_id, tenant_id, topic, event_time, metadata
    (map<string,string>), data (JSON string).
    ``destinations`` columns: id, tenant_id, type, topics (array<string>),
    filter (JSON string or null), disabled_at (timestamp or null).

    Works identically on batch and streaming event DataFrames (stream-static
    broadcast join + filter; no aggregation).  Output: every event column
    plus ``destination_id``.

    ``filter_mode`` picks the filter-language evaluation strategy:

    - ``"compiled"`` (default): distinct filter docs snapshotted at plan
      time compile to native Column predicates; any doc OUTSIDE the
      snapshot (uncompilable, or added/edited after plan time — the
      stream-static join re-resolves destination rows per micro-batch)
      falls through to the pandas-UDF interpreter, so hot filter updates
      keep matching correctly; payloads nesting arrays deeper than the
      compiler's unroll bound are likewise routed row-wise to the
      interpreter, so depth never changes an outcome.  Cost note: the
      fallback's presence means Spark materializes the UDF column for the
      joined pairs (Python UDFs are extracted eagerly, not branch-lazily),
      so this mode pays an Arrow round-trip per pair row.
    - ``"compiled_static"``: the zero-Python scale path — unknown docs
      never match (``otherwise(False)``).  Contract: the destination
      filter set is FIXED at plan time (recompile per micro-batch — see
      ``streaming.pipeline.make_routing_sink`` — or restart the stream on
      filter changes), and nested-array recursion is bounded at the
      compiler's unroll depth (deeper payloads don't match on inspected
      paths).
    - ``"udf"``: interpret every doc in the pandas UDF.
    """
    d = destinations.select(
        F.col("id").alias("__dest_id"),
        F.col("tenant_id").alias("__dest_tenant"),
        F.col("topics").alias("__dest_topics"),
        F.col("filter").alias("__dest_filter"),
        F.col("disabled_at").alias("__dest_disabled_at"),
    )
    # inner broadcast join on the cheap JVM predicates (tenant, enabled,
    # topic glob) ...
    pairs = events.join(
        F.broadcast(d),
        (events["tenant_id"] == F.col("__dest_tenant"))
        & destination_match_predicate(
            events["topic"], F.col("__dest_topics"), F.col("__dest_disabled_at")
        ),
        "inner",
    )
    # ... then the filter-language predicate as a post-join WHERE (Python
    # UDFs are not allowed in outer-join conditions); rows with NULL/empty
    # filter docs pass without invoking Python at all.
    udf_pred = None
    if use_filter_udf or filter_mode == "compiled":
        udf_pred = _get_filter_match_udf()(
            F.col("__dest_filter"),
            F.col("event_id"),
            F.col("topic"),
            _rfc3339(F.col("event_time")),
            F.to_json(F.col("metadata")),
            F.col("data"),
        )
    if filter_mode in ("compiled", "compiled_static"):
        chain, any_uncompilable = _compiled_filter_predicate(
            destinations,
            overflow_fallback=udf_pred if filter_mode == "compiled" else None,
        )
        if filter_mode == "compiled":
            # fallback is the interpreter: a filter doc added/edited after
            # plan time (stream-static re-resolution) must match correctly,
            # not be silently dropped
            fallback = udf_pred
        else:
            # zero-Python contract — uncompilable docs still need the UDF,
            # but unknown-after-plan-time docs never match (documented)
            fallback = udf_pred if any_uncompilable else F.lit(False)
        pairs = pairs.filter(chain.otherwise(fallback))
    elif use_filter_udf:
        pairs = pairs.filter(F.col("__dest_filter").isNull() | udf_pred)
    else:
        pairs = pairs.filter(F.col("__dest_filter").isNull())

    # an event's own destination_id is ignored by the matcher (MatchEvent
    # matches by topic/filter only — drivertest/match.go:47-91); the output
    # column is the MATCHED destination
    carried = [c for c in events.columns if c != "destination_id"]
    return pairs.select(*[events[c] for c in carried], F.col("__dest_id").alias("destination_id"))


def match_events(
    events: DataFrame,
    destinations: DataFrame,
    *,
    use_filter_udf: bool = True,
    filter_mode: str = "compiled",
) -> DataFrame:
    """Stamp ``matched_destination_ids`` on each event (MatchEvent fan-in).

    Batch shape: pair join -> groupBy(event) -> sorted id array, left-joined
    back so zero-match events keep an empty array (the reference still logs
    unrouted events — eventhandler.go:139-151).
    """
    pairs = match_pairs(
        events, destinations, use_filter_udf=use_filter_udf, filter_mode=filter_mode
    )
    matched = pairs.groupBy("event_id").agg(
        F.array_sort(F.collect_list(F.col("destination_id"))).alias(
            "matched_destination_ids"
        )
    )
    return events.join(matched, on="event_id", how="left").withColumn(
        "matched_destination_ids",
        F.coalesce(F.col("matched_destination_ids"), F.array().cast("array<string>")),
    )


def match_events_with_explicit(
    events: DataFrame,
    destinations: DataFrame,
    *,
    use_filter_udf: bool = True,
    filter_mode: str = "compiled",
) -> DataFrame:
    """MatchEvent with the explicit-destination fast path.

    An event published with a ``destination_id`` is point-checked against
    only that destination (enabled ∧ topic ∧ filter —
    eventhandler.go:123-137, matchSpecificDestination :204-224); a missing
    or non-matching explicit destination yields an empty match.  Events
    without one go through the normal scan of the tenant's destinations.
    Both branches are the same broadcast pair join; the explicit branch
    adds the id-equality predicate so at most one pair survives.
    """
    if "destination_id" not in events.columns:
        return match_events(
            events, destinations, use_filter_udf=use_filter_udf, filter_mode=filter_mode
        )

    has_explicit = F.col("destination_id").isNotNull() & (F.col("destination_id") != "")
    explicit = events.filter(has_explicit)
    implicit = events.filter(~has_explicit | F.col("destination_id").isNull()).drop(
        "destination_id"
    )

    implicit_matched = match_events(
        implicit, destinations, use_filter_udf=use_filter_udf, filter_mode=filter_mode
    )

    pairs = match_pairs(
        explicit.withColumnRenamed("destination_id", "__explicit_id"),
        destinations,
        use_filter_udf=use_filter_udf,
        filter_mode=filter_mode,
    ).filter(F.col("destination_id") == F.col("__explicit_id"))
    explicit_ids = pairs.groupBy("event_id").agg(
        F.array_sort(F.collect_list("destination_id")).alias("matched_destination_ids")
    )
    explicit_matched = (
        explicit.drop("destination_id")
        .join(explicit_ids, on="event_id", how="left")
        .withColumn(
            "matched_destination_ids",
            F.coalesce(
                F.col("matched_destination_ids"), F.array().cast("array<string>")
            ),
        )
    )
    return implicit_matched.unionByName(explicit_matched)


def fanout_delivery_tasks(matched_events: DataFrame) -> DataFrame:
    """Explode matched ids into DeliveryTask rows (eventhandler.go:177-200).

    One task per (event, destination), attempt=1, manual=false
    (models/tasks.go:37-43).
    """
    return (
        matched_events.withColumn(
            "destination_id", F.explode(F.col("matched_destination_ids"))
        )
        .withColumn("attempt", F.lit(1))
        .withColumn("manual", F.lit(False))
        .drop("matched_destination_ids")
    )
