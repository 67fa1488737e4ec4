from outpost_spark.tenantstore.store import (  # noqa: F401
    ListDestinationRequest,
    attempt_record,
    list_destinations,
    list_tenants,
    obfuscate_map_expr,
    obfuscate_value,
    obfuscate_value_expr,
    retrieve_destination,
    retrieve_tenant,
)
