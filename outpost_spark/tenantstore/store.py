"""Tenant/destination store query surface (S8, P10, P2/J2).

Reference: the ``TenantStore`` interface
(internal/tenantstore/driver/driver.go:12-24) — tenants and destinations
are small dimension tables.  In Spark they are DataFrames meant to be
broadcast into stream-static joins (routing) and scanned directly for the
management API:

- ``ListTenant`` — cursor-paginated (driver.go:40-47), same keyset
  machinery as the log-store lists.
- ``ListDestination`` — tenant-scoped filter scan
  (driver.go:64-70): ``Type[]`` is OR ("matches any"), ``Topics[]`` is AND
  ("matches all", with ``["*"]`` meaning wildcard-destinations-only) —
  semantics pinned by ``matchDestinationFilter``
  (redistenantstore/destination_summary.go).
- ``RetrieveTenant`` / ``RetrieveDestination`` — point lookups.
- Credential obfuscation (P10, destregistry/baseprovider.go:14-21):
  values shorter than 10 chars become all-asterisks; longer values keep
  their first 4 chars.

Scale note: these tables are tiny relative to the fact tables (thousands
to millions of rows, not billions).  Every operation here is a narrow
filter/projection that Catalyst pushes into the scan; the DataFrames are
broadcast-joined against event streams, never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from outpost_spark.functions.topic import topic_match_any_expr
from outpost_spark.logstore.lists import ListRequest, ListResult, paginate


# ───────────────────────── tenants ─────────────────────────


def list_tenants(
    tenants_df: DataFrame,
    *,
    ids: list[str] | None = None,
    limit: int = 20,
    next: str = "",
    prev: str = "",
    order: str = "desc",
) -> ListResult:
    """ListTenant (driver/driver.go:40-47): cursor-paginated tenant scan.

    Ordered by (created_at, id) with the same keyset/limit+1/cursor flip
    machinery as the log-store lists (default page size 20).
    """
    df = tenants_df
    if ids:
        df = df.filter(F.col("id").isin(ids))
    req = ListRequest(limit=limit, next=next, prev=prev, order=order)
    return paginate(
        df, time_col="created_at", id_col="id", resource="tenant", req=req
    )


def retrieve_tenant(tenants_df: DataFrame, tenant_id: str):
    rows = tenants_df.filter(F.col("id") == tenant_id).limit(1).collect()
    return rows[0] if rows else None


# ───────────────────────── destinations ─────────────────────────


@dataclass
class ListDestinationRequest:
    """driver/driver.go:64-70."""

    tenant_id: str | None = None
    ids: list[str] = field(default_factory=list)
    types: list[str] = field(default_factory=list)  # OR — matches any
    topics: list[str] = field(default_factory=list)  # AND — matches all


def destination_filter_expr(req: ListDestinationRequest) -> Column:
    """The matchDestinationFilter predicate as a Column expression.

    - ``types``: destination type ∈ types.
    - ``topics``: a destination subscribed to ``["*"]`` always passes;
      otherwise ``["*"]`` as the *filter* rejects it (wildcard-only
      query), and any other filter requires every requested topic to
      match one of the destination's (possibly glob) topic patterns.
    """
    pred = F.lit(True)
    if req.tenant_id is not None:
        pred = pred & (F.col("tenant_id") == req.tenant_id)
    if req.ids:
        pred = pred & F.col("id").isin(req.ids)
    if req.types:
        pred = pred & F.col("type").isin(req.types)
    if req.topics:
        matches_all = F.array_contains(F.col("topics"), "*")
        if req.topics == ["*"]:
            topics_pred = matches_all
        else:
            each = [
                topic_match_any_expr(F.lit(t), F.col("topics"))
                for t in req.topics
            ]
            both = each[0]
            for e in each[1:]:
                both = both & e
            topics_pred = matches_all | both
        pred = pred & topics_pred
    return pred


def list_destinations(dests_df: DataFrame, req: ListDestinationRequest) -> DataFrame:
    """ListDestination: tenant-scoped filtered dimension scan (no pagination
    in the reference — destinations per tenant are bounded)."""
    return dests_df.filter(destination_filter_expr(req))


def retrieve_destination(dests_df: DataFrame, tenant_id: str, destination_id: str):
    rows = (
        dests_df.filter(
            (F.col("tenant_id") == tenant_id) & (F.col("id") == destination_id)
        )
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


# ───────────────────────── credential obfuscation (P10) ─────────────────────────


def obfuscate_value(value: str) -> str:
    """baseprovider.go:14-21: <10 chars → all '*'; else keep first 4."""
    if len(value) < 10:
        return "*" * len(value)
    return value[:4] + "*" * (len(value) - 4)


def obfuscate_value_expr(col: Column) -> Column:
    """The same masking rule as a native Column expression (JVM-side)."""
    return F.when(
        F.length(col) < 10, F.repeat(F.lit("*"), F.length(col))
    ).otherwise(
        F.concat(F.substring(col, 1, 4), F.repeat(F.lit("*"), F.length(col) - 4))
    )


def obfuscate_map_expr(map_col: Column, sensitive_keys: list[str]) -> Column:
    """Mask the sensitive entries of a map<string,string> column.

    Mirrors BaseProvider.ObfuscateDestination (baseprovider.go:55-93):
    non-sensitive keys pass through untouched.
    """
    keys = F.array(*[F.lit(k) for k in sensitive_keys])
    return F.transform_values(
        map_col,
        lambda k, v: F.when(
            F.array_contains(keys, k), obfuscate_value_expr(v)
        ).otherwise(v),
    )


def obfuscate_destinations(
    dests_df: DataFrame,
    *,
    sensitive_config: list[str] | None = None,
    sensitive_credentials: list[str] | None = None,
) -> DataFrame:
    """Display projection: mask sensitive config/credential map entries."""
    df = dests_df
    if sensitive_config and "config" in df.columns:
        df = df.withColumn(
            "config", obfuscate_map_expr(F.col("config"), sensitive_config)
        )
    if sensitive_credentials and "credentials" in df.columns:
        df = df.withColumn(
            "credentials",
            obfuscate_map_expr(F.col("credentials"), sensitive_credentials),
        )
    return df


# ───────────────────────── response shaping (P2 / J2) ─────────────────────────

_EVENT_COLS = (
    "event_id",
    "tenant_id",
    "destination_id",
    "topic",
    "eligible_for_retry",
    "event_time",
    "metadata",
    "data",
)

_ATTEMPT_COLS = (
    "attempt_id",
    "event_id",
    "tenant_id",
    "destination_id",
    "destination_type",
    "status",
    "code",
    "attempt_number",
    "manual",
    "attempt_time",
)


def attempt_record(
    attempts_df: DataFrame, include: tuple[str, ...] | list[str] = ()
) -> DataFrame:
    """J2/P2: AttemptRecord{attempt, event} from one denormalized row.

    The reference reconstructs the embedded event as a nested object from
    the same row (driver/driver.go:82-85, chlogstore.go:479-572) — here a
    ``struct()`` projection, no join.  ``include`` toggles the optional
    expansions (log_handlers.go:54-78): "event" adds the nested event
    struct, "event.data" keeps its payload, "response_data" keeps the
    attempt response body.
    """
    cols = [c for c in _ATTEMPT_COLS if c in attempts_df.columns]
    out = [F.col(c) for c in cols]
    if "response_data" in include and "response_data" in attempts_df.columns:
        out.append(F.col("response_data"))
    if "event" in include or "event.data" in include:
        ev_cols = [
            F.col(c).alias(c.removeprefix("event_") if c == "event_time" else c)
            for c in _EVENT_COLS
            if c in attempts_df.columns and c != "data"
        ]
        if "event.data" in include and "data" in attempts_df.columns:
            ev_cols.append(F.col("data"))
        out.append(F.struct(*ev_cols).alias("event"))
    return attempts_df.select(*out)
