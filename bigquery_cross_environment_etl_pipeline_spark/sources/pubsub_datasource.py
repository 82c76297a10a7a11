"""Custom Python DataSource (Spark 4 API): a simulated Pub/Sub
subscription emitting the reference's message envelopes.

The reference ingests HTTP-framed Pub/Sub pushes — a base64 JSON
payload inside ``{"message": {"data": ...}}`` (main.py:11-52,
decode at :29-31). Here that transport becomes a first-class Spark
*source* via the public ``pyspark.sql.datasource`` API instead of a
driver-side loop: ``spark.read.format("pubsub_sim")`` for backlog
replay (partitioned, parallel) and ``spark.readStream`` for the live
tail (micro-batched with replayable offsets). Rows come out
envelope-shaped, so the existing ``sources/pubsub.decode_envelopes``
path (unbase64 -> from_json -> validate) applies unchanged.

Scale notes: the batch reader splits the id range into
``numPartitions`` independent ``InputPartition``s — each executor
generates/fetches its slice with no driver fan-in (the real-world
analog: one partition per Pub/Sub-lite partition or backlog shard).
The stream reader is a ``SimpleDataSourceStreamReader``: offsets are
plain dicts, each micro-batch is the half-open id range
[start, start+maxBatchSize) — the same replayable half-open-window
discipline as the engine's watermark protocol (T3), so a failed batch
re-reads exactly its range. Generation is deterministic (seeded by the
id), so tests can assert exact contents.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "message_id bigint, envelope string, publish_time timestamp"

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _envelope(message_id: int) -> str:
    """Deterministic Pub/Sub push envelope for one message id (the
    exact frame shape main.py:18-31 decodes)."""
    payload = {"org_id": int(message_id) % 100 + 1}
    data = base64.b64encode(json.dumps(payload).encode()).decode()
    return json.dumps(
        {"message": {"data": data, "messageId": str(message_id)}}
    )


def _publish_time(message_id: int) -> datetime:
    return _EPOCH + timedelta(seconds=int(message_id))


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PubSubBatchReader(DataSourceReader):
    """Backlog replay: the id range split into independent slices."""

    def __init__(self, options: dict):
        self.n_messages = int(options.get("numMessages", 1000))
        self.n_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, -(-self.n_messages // self.n_partitions))
        return [
            _IdRange(lo, min(lo + step, self.n_messages))
            for lo in range(0, self.n_messages, step)
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield (i, _envelope(i), _publish_time(i))


class PubSubStreamReader(SimpleDataSourceStreamReader):
    """Live tail: micro-batches over half-open id ranges with
    replayable dict offsets (exactly-once when the sink is idempotent
    or transactional per batch id)."""

    def __init__(self, options: dict):
        self.max_batch = int(options.get("maxBatchSize", 100))
        self.available = int(options.get("numMessages", 1000))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict):
        lo = int(start["next_id"])
        hi = min(lo + self.max_batch, self.available)
        rows = [(i, _envelope(i), _publish_time(i)) for i in range(lo, hi)]
        return (iter(rows), {"next_id": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay a committed-but-lost batch: same half-open range
        return iter(
            (i, _envelope(i), _publish_time(i))
            for i in range(int(start["next_id"]), int(end["next_id"]))
        )


class PubSubSimDataSource(DataSource):
    """``format("pubsub_sim")`` — batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "pubsub_sim"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PubSubBatchReader:
        return PubSubBatchReader(self.options)

    def simpleStreamReader(self, schema) -> PubSubStreamReader:
        return PubSubStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PubSubSimDataSource)
