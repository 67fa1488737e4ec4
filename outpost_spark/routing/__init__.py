from outpost_spark.routing.match import (  # noqa: F401
    destination_match_predicate,
    match_events,
    match_pairs,
    fanout_delivery_tasks,
)
