from outpost_spark.tenantstore.crypto import (  # noqa: F401
    decrypt_destination_secrets,
    decrypt_expr,
    encrypt_destination_secrets,
    encrypt_expr,
    try_decrypt_expr,
)
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
