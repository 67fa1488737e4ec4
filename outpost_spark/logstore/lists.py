"""List queries: cursor (keyset) pagination over events/attempts.

Reference:
- Generic Run(): internal/pagination/pagination.go:53-155 — direction from
  next/prev, compare op = f(order, direction) (desc+forward = ``<``),
  fetch limit+1, reverse for backward, next/prev cursor construction.
- Keyset predicate: ``(time < T) OR (time = T AND id < I)``
  (chlogstore.go:309-326,890-907).
- Composite total order: ``ORDER BY time dir, id dir`` (chlogstore.go:225-226).
- Cursor payload: ``{unix_ms}::{id}`` (chlogstore.go:120-122), envelope via
  functions/cursor.py (cursor.go:22-80) — byte-compatible.
- Caps: default 100, max 1000 (log_handlers.go:41-52,256).
- Filters: tenant/event/topic/status IN, destination array overlap,
  GTE/LTE/GT/LT time range (chlogstore.go:173-245, driver/driver.go:12-17).

Scale note: the keyset predicate + month partitioning means each page reads
only the partitions that can contain the page — O(limit)-ish I/O per page —
rather than a full sort of the table.  Spark's ORDER BY + LIMIT plans as
TakeOrderedAndProject (per-partition top-k then merge on the driver), so no
global sort/shuffle happens.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from outpost_spark.functions import cursor as cursor_codec

DEFAULT_LIMIT = 100
MAX_LIMIT = 1000


@dataclass
class ListRequest:
    tenant_ids: list[str] = field(default_factory=list)
    event_ids: list[str] = field(default_factory=list)
    destination_ids: list[str] = field(default_factory=list)
    topics: list[str] = field(default_factory=list)
    statuses: list[str] = field(default_factory=list)  # attempts only
    time_gte: datetime | None = None
    time_lte: datetime | None = None
    time_gt: datetime | None = None
    time_lt: datetime | None = None
    order: str = "desc"  # user-requested order on time
    limit: int = DEFAULT_LIMIT
    next: str = ""
    prev: str = ""


@dataclass
class ListResult:
    items: list  # Rows in response order
    next: str
    prev: str


def _apply_common_filters(df: DataFrame, req: ListRequest, *, time_col: str, events: bool) -> DataFrame:
    if req.tenant_ids:
        df = df.filter(F.col("tenant_id").isin(req.tenant_ids))
    if req.event_ids:
        df = df.filter(F.col("event_id").isin(req.event_ids))
    if req.topics:
        df = df.filter(F.col("topic").isin(req.topics))
    if req.statuses and not events:
        df = df.filter(F.col("status").isin(req.statuses))
    if req.destination_ids:
        if events:
            # P4: matched ids overlap (chlogstore.go:187-190, pglogstore.go:121-125)
            df = df.filter(
                F.arrays_overlap(
                    F.col("matched_destination_ids"),
                    F.array(*[F.lit(d) for d in req.destination_ids]),
                )
            )
        else:
            df = df.filter(F.col("destination_id").isin(req.destination_ids))
    t = F.col(time_col)
    if req.time_gte is not None:
        df = df.filter(t >= F.lit(req.time_gte))
    if req.time_lte is not None:
        df = df.filter(t <= F.lit(req.time_lte))
    if req.time_gt is not None:
        df = df.filter(t > F.lit(req.time_gt))
    if req.time_lt is not None:
        df = df.filter(t < F.lit(req.time_lt))
    return df


def _ms_trunc(time_col: str):
    """Millisecond-truncated view of a timestamp column.

    The reference stores DateTime64(3) (chlogstore schema) so its ms
    cursors compare exactly; parquet keeps microseconds, so a boundary row
    with a sub-ms component would evade a full-precision keyset predicate
    built from the ms-truncated cursor and repeat on the next page.  All
    keyset comparisons and page ordering therefore run at ms precision.
    """
    return F.expr(f"timestamp_millis(unix_micros({time_col}) div 1000)")


def keyset_predicate(time_col: str, id_col: str, compare: str, unix_ms: int, item_id: str):
    """``(time < T) OR (time = T AND id < I)`` — chlogstore.go:309-326.

    Comparisons run on the ms-truncated time (see :func:`_ms_trunc`).  A
    redundant bound on the RAW column is AND-ed in so the predicate still
    reaches the parquet scan (`PushedFilters`) — expressions on a column
    don't push down, a plain column-vs-literal bound does, and
    ``trunc(t) < T  ⇔  t < T+1ms`` / ``trunc(t) > T  ⇒  t > T`` make the
    bounds exact supersets.
    """
    pos_ts = F.timestamp_millis(F.lit(unix_ms))
    t, i = F.col(time_col), F.col(id_col)
    tm = _ms_trunc(time_col)
    if compare == "<":
        pushdown_bound = t < F.timestamp_millis(F.lit(unix_ms + 1))
        return pushdown_bound & ((tm < pos_ts) | ((tm == pos_ts) & (i < F.lit(item_id))))
    pushdown_bound = t >= pos_ts
    return pushdown_bound & ((tm > pos_ts) | ((tm == pos_ts) & (i > F.lit(item_id))))


# fetchAndDedup's fetch-round cap (chlogstore.go:50) — duplicates are rare
# after the write-path dedup; this bounds pathological duplication.
MAX_DEDUP_ITERATIONS = 10


def _row_unix_ms(row, time_col: str) -> int:
    """Exact integer unix-ms of a Row timestamp (no float round-trip)."""
    import calendar

    ts = row[time_col]
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc)
    return calendar.timegm(ts.timetuple()) * 1000 + ts.microsecond // 1000


def _page(
    df: DataFrame,
    *,
    time_col: str,
    id_col: str,
    resource: str,
    version: int,
    req: ListRequest,
) -> ListResult:
    """pagination.Run (pagination.go:53-155) around keyset-limited scans.

    Mirrors fetchAndDedup (chlogstore.go:57-112): the store is append-only
    with an at-least-once replay window, so duplicate ids can surface in a
    page.  Rows are deduped by ``id_col`` keeping the first in sort order;
    if duplicates shrink a page below the limit, the cursor advances past
    the last RAW scanned row and fetches again (bounded rounds) — no
    GROUP BY / window over the whole table, each round stays a
    TakeOrderedAndProject of limit+1 rows.
    """
    limit = req.limit if req.limit and req.limit > 0 else DEFAULT_LIMIT
    limit = min(limit, MAX_LIMIT)
    order = req.order if req.order in ("asc", "desc") else "desc"
    backward = req.prev != ""
    first_page = req.next == "" and req.prev == ""

    cursor_enc = req.next or req.prev
    compare = "<"
    if (order == "desc") == backward:  # pagination.go:79-86
        compare = ">"
    sort_dir = order if not backward else ("asc" if order == "desc" else "desc")

    # sort on the ms-truncated time so page order and the ms-precision
    # cursor comparator agree (reference order is on DateTime64(3))
    tm = _ms_trunc(time_col)
    i = F.col(id_col)
    sort_cols = [tm.desc(), i.desc()] if sort_dir == "desc" else [tm.asc(), i.asc()]

    def fetch(pos: tuple[int, str] | None) -> list:
        q = df
        if pos is not None:
            q = q.filter(keyset_predicate(time_col, id_col, compare, pos[0], pos[1]))
        return q.orderBy(*sort_cols).limit(limit + 1).collect()

    pos = None
    if cursor_enc:
        pos = cursor_codec.decode_position(cursor_enc, resource, version)

    seen: set = set()
    uniq: list = []
    exhausted = False
    for _ in range(MAX_DEDUP_ITERATIONS):
        scanned = fetch(pos)
        for r in scanned:
            rid = r[id_col]
            if rid not in seen:
                seen.add(rid)
                uniq.append(r)
        if len(scanned) < limit + 1 or len(uniq) > limit:
            break
        pos = (_row_unix_ms(scanned[-1], time_col), scanned[-1][id_col])
    else:
        # every round scanned a FULL page of (mostly) duplicates and the
        # unique set never filled: more rows exist beyond ``pos``.  The
        # reference caps rounds the same way but surfaces continuation via
        # its cursor — returning has_more=False here would silently
        # truncate pagination, so the short page carries a continuation
        # cursor at the last SCANNED position (not the last returned row:
        # everything between them is a known duplicate of this page).
        exhausted = True

    has_more = len(uniq) > limit or exhausted
    rows = uniq[:limit]
    if backward:
        rows.reverse()

    def enc(row) -> str:
        return cursor_codec.encode_position(
            resource, version, _row_unix_ms(row, time_col), row[id_col]
        )

    nxt = prev = ""
    if rows:
        cont = (
            cursor_codec.encode_position(resource, version, pos[0], pos[1])
            if exhausted
            else ""
        )
        if first_page:
            if has_more:
                nxt = cont or enc(rows[-1])
        elif not backward:
            prev = enc(rows[0])
            if has_more:
                nxt = cont or enc(rows[-1])
        else:
            nxt = enc(rows[-1])
            if has_more:
                prev = cont or enc(rows[0])
    return ListResult(items=rows, next=nxt, prev=prev)


def list_events(events_df: DataFrame, req: ListRequest) -> ListResult:
    """ListEvent (driver/driver.go:33-43) — keyset-paginated scan."""
    df = _apply_common_filters(events_df, req, time_col="event_time", events=True)
    return _page(
        df, time_col="event_time", id_col="event_id", resource="evt", version=1, req=req
    )


def list_attempts(
    attempts_df: DataFrame,
    req: ListRequest,
    *,
    include: tuple[str, ...] | list[str] = (),
    destinations_df: DataFrame | None = None,
    sensitive_config: list[str] | None = None,
    sensitive_credentials: list[str] | None = None,
) -> ListResult:
    """ListAttempt — same machinery over the denormalized attempts table.

    ``include`` applies the reference's response shaping end-to-end
    (log_handlers.go:54-78 + toAPIAttempt:152-210): "event"/"event.data"
    nest the embedded event struct, "response_data" keeps the response
    body, "destination" left-joins the (broadcast, credential-obfuscated)
    destinations dimension as a nested struct — NULL when the destination
    no longer exists, like the reference's nil destDisplay.  Shaping is a
    projection before the keyset page, so the plan stays a
    TakeOrderedAndProject over limit+1 rows.
    """
    df = _apply_common_filters(attempts_df, req, time_col="attempt_time", events=False)
    if include:
        # lazy import: tenantstore.store imports this module's pagination
        from outpost_spark.tenantstore.store import (
            attempt_record,
            obfuscate_destinations,
        )

        df = attempt_record(df, include)
        if "destination" in include and destinations_df is not None:
            dd = obfuscate_destinations(
                destinations_df,
                sensitive_config=sensitive_config,
                sensitive_credentials=sensitive_credentials,
            ).alias("__d")
            dest_struct = F.when(
                F.col("__d.id").isNotNull(),
                F.struct(*[F.col(f"__d.{c}").alias(c) for c in dd.columns]),
            ).alias("destination")
            shaped = df.alias("__a")
            df = shaped.join(
                F.broadcast(dd),
                (F.col("__a.destination_id") == F.col("__d.id"))
                & (F.col("__a.tenant_id") == F.col("__d.tenant_id")),
                "left",
            ).select(F.col("__a.*"), dest_struct)
    return _page(
        df, time_col="attempt_time", id_col="attempt_id", resource="att", version=1, req=req
    )


def paginate(
    df: DataFrame,
    *,
    time_col: str,
    id_col: str,
    resource: str,
    req: ListRequest,
    version: int = 1,
) -> ListResult:
    """Generic keyset pagination over any (time, id)-ordered DataFrame."""
    return _page(df, time_col=time_col, id_col=id_col, resource=resource, version=version, req=req)


def retrieve_event(events_df: DataFrame, event_id: str, tenant_id: str | None = None):
    """Point lookup (S7, chlogstore.go:574-639) — LIMIT 1 filter scan."""
    df = events_df.filter(F.col("event_id") == event_id)
    if tenant_id is not None:
        df = df.filter(F.col("tenant_id") == tenant_id)
    rows = df.limit(1).collect()
    return rows[0] if rows else None


def retrieve_attempt(attempts_df: DataFrame, attempt_id: str, tenant_id: str | None = None):
    df = attempts_df.filter(F.col("attempt_id") == attempt_id)
    if tenant_id is not None:
        df = df.filter(F.col("tenant_id") == tenant_id)
    rows = df.limit(1).collect()
    return rows[0] if rows else None
