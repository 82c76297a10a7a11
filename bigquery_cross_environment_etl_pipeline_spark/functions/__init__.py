from .scalar import (  # noqa: F401
    epoch_default,
    fully_qualified_table_id,
    iso_format,
    org_dataset_name,
    org_table_name,
    to_json_payload,
)
