from outpost_spark.functions.buckets import (  # noqa: F401
    Granularity,
    bucket_epoch_expr,
    bucket_expr,
    bucket_count,
    bucket_duration_seconds_expr,
    parse_granularity,
)
from outpost_spark.functions.topic import glob_to_regex, topic_match_expr, normalize_topics  # noqa: F401
