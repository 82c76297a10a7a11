"""Explicit StructType schemas.

Transcribed semantics (not code) from the reference's declared schemas:
- billing export table: reference core/utility/dataset_utils.py:250-332
  (21 fields, nested RECORD / REPEATED RECORD -> struct / array<struct>)
- job message payload: reference core/models/billing_etl_model.py:11-20
  (only org_id required)
- checkpoint log: reference core/database/billing_etl_db.py:12-61 +
  README.md:188-209 (code wins over README naming, SURVEY.md §7.4.7)
- tenant config: reference core/database/billing_etl_db.py:63-89

BigQuery FLOAT is 64-bit -> DoubleType; RECORD REPEATED key/value pairs
stay array<struct<key,value>> for faithful round-trip (they *could* be
MapType but the reference's consumers see repeated records).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _kv_array() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )


#: Destination billing-export table (reference dataset_utils.py:250-332).
BILLING_EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("billing_account_id", T.StringType()),
        T.StructField(
            "service",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("description", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "sku",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("description", T.StringType()),
                ]
            ),
        ),
        T.StructField("usage_start_time", T.TimestampType()),
        T.StructField("usage_end_time", T.TimestampType()),
        T.StructField(
            "project",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("number", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("labels", _kv_array()),
                    T.StructField("ancestry_numbers", T.StringType()),
                    T.StructField(
                        "ancestors",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("resource_name", T.StringType()),
                                    T.StructField("display_name", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("labels", _kv_array()),
        T.StructField("system_labels", _kv_array()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("location", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("region", T.StringType()),
                    T.StructField("zone", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("inherited", T.BooleanType()),
                        T.StructField("namespace", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("transaction_type", T.StringType()),
        T.StructField("seller_name", T.StringType()),
        T.StructField("export_time", T.TimestampType()),
        T.StructField("cost", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("currency_conversion_rate", T.DoubleType()),
        T.StructField(
            "usage",
            T.StructType(
                [
                    T.StructField("amount", T.DoubleType()),
                    T.StructField("unit", T.StringType()),
                    T.StructField("amount_in_pricing_units", T.DoubleType()),
                    T.StructField("pricing_unit", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "credits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("amount", T.DoubleType()),
                        T.StructField("full_name", T.StringType()),
                        T.StructField("id", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "invoice",
            T.StructType(
                [
                    T.StructField("month", T.StringType()),
                    T.StructField("publisher_type", T.StringType()),
                ]
            ),
        ),
        T.StructField("cost_type", T.StringType()),
        T.StructField(
            "adjustment_info",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("mode", T.StringType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        T.StructField("cost_at_list", T.DoubleType()),
    ]
)

#: Job message payload (reference core/models/billing_etl_model.py:11-20):
#: only org_id is required; the rest are optional routing overrides.
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("org_id", T.LongType(), nullable=True),
        T.StructField("project_id", T.StringType(), nullable=True),
        T.StructField("dataset_id", T.StringType(), nullable=True),
        T.StructField("table_id", T.StringType(), nullable=True),
        T.StructField("target_date", T.StringType(), nullable=True),
    ]
)

#: Append-only checkpoint/status log (reference billing_etl_db.py:12-61).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("org_id", T.LongType(), nullable=False),
        T.StructField("project_id", T.StringType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("end_date_time", T.TimestampType(), nullable=True),
        T.StructField("updated_at", T.TimestampType(), nullable=False),
    ]
)

STATUS_IN_PROGRESS = "IN_PROGRESS"
STATUS_SUCCESS = "SUCCESS"
STATUS_FAILED = "FAILED"
STATUS_PARTIAL = "PARTIAL_SUCCESS"
VALID_STATUSES = frozenset(
    {STATUS_IN_PROGRESS, STATUS_SUCCESS, STATUS_FAILED, STATUS_PARTIAL}
)

#: Tenant configuration (reference billing_etl_db.py:63-89, FIXTURES.md B2).
CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("org_id", T.LongType(), nullable=False),
        T.StructField("projectid", T.StringType()),
        T.StructField("billingdataset", T.StringType()),
        T.StructField("tableid", T.StringType()),
        T.StructField("pulsebillingdataset", T.StringType()),
        T.StructField("pulsetableid", T.StringType()),
        T.StructField("customerserviceaccountid", T.StringType()),
    ]
)

#: Stepper form step status (reference billing_etl_db.py:91-120).
STEP_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("stepid", T.LongType(), nullable=False),
        T.StructField("org_id", T.LongType(), nullable=False),
        T.StructField("step_completed", T.BooleanType(), nullable=False),
    ]
)

#: Multimodal asset column group: opaque payload + typed metadata
#: (north-star extension; payload decode is stubbed — see
#: operators/multimodal.py).
MULTIMODAL_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)
