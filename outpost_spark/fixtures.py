"""Deterministic golden datasets for conformance tests.

The metrics golden dataset replicates the *specification* of the reference
conformance fixture (internal/logstore/drivertest/metrics_dataset.go:12-97):
305 LogEntries in January 2000 with cycling dimensions and hand-derived
expected totals (count=300, error_rate=0.4, dense-day hourly buckets
25/50/100/50/25, ...).  No RNG — fully reproducible.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

TOPICS = ["user.created", "user.deleted", "user.updated"]
SPARSE_DAYS = [3, 7, 11, 22, 28]
DENSE_HOURS = [(10, 25), (11, 50), (12, 100), (13, 50), (14, 25)]

DS_START = datetime(2000, 1, 1, tzinfo=timezone.utc)
DS_END = datetime(2000, 2, 1, tzinfo=timezone.utc)
DENSE_DAY_START = datetime(2000, 1, 15, tzinfo=timezone.utc)
DENSE_DAY_END = datetime(2000, 1, 16, tzinfo=timezone.utc)

TENANT_1, TENANT_2 = "m_tenant_1", "m_tenant_2"
DEST_1_1, DEST_1_2, DEST_2_1 = "m_dest_1.1", "m_dest_1.2", "m_dest_2.1"


def golden_log_entries() -> list[dict]:
    """LogEntry rows (denormalized attempt schema) per metrics_dataset.go."""
    entries: list[dict] = []
    idx = 0

    def make(tenant: str, t: datetime) -> dict:
        nonlocal idx
        dest = DEST_1_1 if idx % 2 == 0 else DEST_1_2
        topic = TOPICS[idx % 3]
        status = "failed" if idx % 5 in (3, 4) else "success"
        codes = ("200", "201") if status == "success" else ("500", "422")
        code = codes[idx % 2]
        row = dict(
            attempt_id=f"m_att_1_{idx}",
            event_id=f"m_evt_1_{idx}",
            tenant_id=tenant,
            destination_id=dest,
            destination_type="webhook",
            topic=topic,
            eligible_for_retry=idx % 3 != 2,
            event_time=t,
            metadata={},
            data='{"k":1}',
            status=status,
            attempt_time=t + timedelta(milliseconds=1),
            code=code,
            response_data="{}",
            manual=idx % 10 == 9,
            attempt_number=1,
            matched_destination_ids=[dest],
        )
        idx += 1
        return row

    for day in SPARSE_DAYS:
        for j in range(10):
            make_t = datetime(2000, 1, day, 9 + j, tzinfo=timezone.utc)
            entries.append(make(TENANT_1, make_t))
    for hour, count in DENSE_HOURS:
        for i in range(count):
            offset = i * 3600 // count
            t = datetime(2000, 1, 15, hour, tzinfo=timezone.utc) + timedelta(seconds=offset)
            entries.append(make(TENANT_1, t))

    t2_times = [
        datetime(2000, 1, 5, 9, tzinfo=timezone.utc),
        datetime(2000, 1, 10, 9, tzinfo=timezone.utc),
        datetime(2000, 1, 15, 12, 15, tzinfo=timezone.utc),
        datetime(2000, 1, 22, 9, tzinfo=timezone.utc),
        datetime(2000, 1, 27, 9, tzinfo=timezone.utc),
    ]
    for i, t in enumerate(t2_times):
        entries.append(
            dict(
                attempt_id=f"m_att_2_{i}",
                event_id=f"m_evt_2_{i}",
                tenant_id=TENANT_2,
                destination_id=DEST_2_1,
                destination_type="webhook",
                topic=TOPICS[0],
                eligible_for_retry=True,
                event_time=t,
                metadata={},
                data='{"k":1}',
                status="success",
                attempt_time=t + timedelta(milliseconds=1),
                code="200",
                response_data="{}",
                manual=False,
                attempt_number=1,
                matched_destination_ids=[DEST_2_1],
            )
        )
    return entries


def golden_dataframes(spark):
    """(events_df, attempts_df) built through the real insert split path."""
    from pyspark.sql import types as T

    from outpost_spark.logstore.insert import split_log_entries
    from outpost_spark.schemas import ATTEMPT_SCHEMA

    rows = golden_log_entries()
    attempt_cols = [f.name for f in ATTEMPT_SCHEMA.fields]
    schema = T.StructType(
        list(ATTEMPT_SCHEMA.fields)
        + [T.StructField("matched_destination_ids", T.ArrayType(T.StringType()))]
    )
    entries_df = spark.createDataFrame(
        [
            tuple(r[c] for c in attempt_cols) + (r["matched_destination_ids"],)
            for r in rows
        ],
        schema,
    )
    events, attempts = split_log_entries(entries_df)
    return events, attempts.drop("matched_destination_ids")
