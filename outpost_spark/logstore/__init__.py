from outpost_spark.logstore.metrics import (  # noqa: F401
    MetricsRequest,
    MetricsResponse,
    TimeRange,
    query_attempt_metrics,
    query_event_metrics,
    run_attempt_metrics,
    run_event_metrics,
)
from outpost_spark.logstore.retention import (  # noqa: F401
    apply_retention,
    compact_partition,
)
from outpost_spark.logstore.insert import insert_many  # noqa: F401
from outpost_spark.logstore.lists import (  # noqa: F401
    ListRequest,
    list_attempts,
    list_events,
    paginate,
    retrieve_event,
    retrieve_attempt,
)
