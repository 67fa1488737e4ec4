"""Fixed StructType schemas for the engine's own tables.

Derived from the reference DDL + structs:
- events:   internal/migrator/migrations/clickhouse/000001_init.up.sql:5-25
            + 000002_matched_destination_ids.up.sql; struct entities.go:94-107
- attempts: 000001_init.up.sql:27-56 + 000003_attempt_destination_type.up.sql;
            struct entities.go:128-140 — denormalized: every attempt row
            embeds its event's columns so list/metrics queries are scan-only
            (join avoidance, postgres/000005_denormalize_attempts.up.sql).
- tenants / destinations: entities.go:18-40 (dimension tables).

Timestamps are millisecond-precision UTC (DateTime64(3) /
timestamptz — 000001_init.up.sql:10); Spark TimestampType with session tz
UTC covers this (micro precision >= milli).
"""

from __future__ import annotations

from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("destination_id", T.StringType(), True),
        T.StructField("matched_destination_ids", T.ArrayType(T.StringType()), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("eligible_for_retry", T.BooleanType(), True),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("data", T.StringType(), True),  # raw JSON object
    ]
)

ATTEMPT_SCHEMA = T.StructType(
    [
        T.StructField("attempt_id", T.StringType(), False),
        T.StructField("event_id", T.StringType(), False),
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("destination_id", T.StringType(), True),
        T.StructField("destination_type", T.StringType(), True),
        # ── denormalized event columns ──
        T.StructField("topic", T.StringType(), True),
        T.StructField("eligible_for_retry", T.BooleanType(), True),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("data", T.StringType(), True),
        # ── attempt fields ──
        T.StructField("status", T.StringType(), True),  # success | failed (entities.go:123-126)
        T.StructField("attempt_time", T.TimestampType(), False),
        T.StructField("code", T.StringType(), True),
        T.StructField("response_data", T.StringType(), True),  # raw JSON
        T.StructField("manual", T.BooleanType(), True),
        T.StructField("attempt_number", T.IntegerType(), True),  # 1-indexed
    ]
)

TENANT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

DESTINATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
        T.StructField("filter", T.StringType(), True),  # simplejsonmatch document (JSON)
        T.StructField("config", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("disabled_at", T.TimestampType(), True),
    ]
)
