"""Pub/Sub-style message ingestion (S5, U2, F5).

The reference receives an HTTP envelope ``{"message": {"data":
base64(json)}}``, base64-decodes, JSON-parses, and Pydantic-validates it,
requiring only ``org_id: int``
(reference main.py:11-52; core/models/billing_etl_model.py:19-28).

Spark-first: the whole decode+validate is a column expression pipeline —
``get_json_object`` -> ``unbase64`` -> ``from_json(schema)`` -> null
checks — so a million messages validate in one vectorized pass, batch or
streaming (the same expressions run under ``readStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MESSAGE_SCHEMA


def decode_envelopes(raw: DataFrame, envelope_col: str = "body") -> DataFrame:
    """Decode ``{"message":{"data": b64}}`` envelopes.

    Input: one string column of envelope JSON. Output: original column
    plus ``payload`` (struct per MESSAGE_SCHEMA) and ``valid`` flag.
    Malformed base64 / JSON / missing org_id all surface as
    ``valid = false`` rows rather than exceptions — the engine equivalent
    of the reference's HTTP 4xx rejects (main.py:33-38).
    """
    data_b64 = F.get_json_object(F.col(envelope_col), "$.message.data")
    # try_to_binary -> NULL on malformed base64 (unbase64 would throw and
    # kill the whole batch for one bad message)
    decoded = F.try_to_binary(data_b64, F.lit("base64")).cast("string")
    payload = F.from_json(decoded, MESSAGE_SCHEMA)
    return (
        raw.withColumn("_decoded", decoded)
        .withColumn("payload", payload)
        .withColumn(
            "valid",
            data_b64.isNotNull()
            & F.col("payload").isNotNull()
            & F.col("payload.org_id").isNotNull(),
        )
    )


def valid_messages(decoded: DataFrame) -> DataFrame:
    """U2: keep validated payloads only, flattened."""
    return decoded.filter(F.col("valid")).select("payload.*")


def rejected_messages(decoded: DataFrame) -> DataFrame:
    """The reject path (HTTP 400 equivalent)."""
    return decoded.filter(~F.col("valid"))
