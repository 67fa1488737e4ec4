from outpost_spark.sources.readers import (  # noqa: F401
    event_stream,
    parse_queue_url,
    validate_publish,
    write_task_stream,
)
