from outpost_spark.streaming.alerts import AlertStateMachine, alert_processor_factory  # noqa: F401
from outpost_spark.streaming.retry import RetryScheduler, retry_processor_factory  # noqa: F401
from outpost_spark.streaming.ingest import DedupIndex, attach_ingest_stream  # noqa: F401
from outpost_spark.streaming.pipeline import route_stream, write_log_stream  # noqa: F401
