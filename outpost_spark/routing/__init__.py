from outpost_spark.routing.match import (  # noqa: F401
    destination_match_predicate,
    match_events,
    match_events_with_explicit,
    match_pairs,
    fanout_delivery_tasks,
)
