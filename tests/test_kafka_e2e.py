"""End-to-end Kafka bus test (K4/K6), broker-gated.

The container has no network, no broker, and no spark-sql-kafka
connector jar, so the full produce → consume → ingest → commit loop
can only run where those exist: set ``RAKAM_KAFKA_BOOTSTRAP`` to a
reachable broker (and have ``kafka-python`` plus the connector
package on the classpath — ``session.get_spark(kafka=True)`` pins
the right version).  The gate is explicit and asserted: without a
broker the e2e test SKIPS with the setup recipe as the reason, and
``test_kafka_source_unavailable_raises_actionably`` (always runs)
proves the no-connector failure mode is a clear error, not a hang.

Reference: KafkaEventStore.java:82-108 (producer keyed by
project|collection), KafkaOffsetManager.java:35-91 (bounded
consumption — covered here via maxOffsetsPerTrigger backpressure).
"""

import os
import uuid

import pytest

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper
from rakam_api_spark.streaming import StreamingIngest
from rakam_api_spark.streaming.job import to_kafka_envelopes

BOOTSTRAP = os.environ.get("RAKAM_KAFKA_BOOTSTRAP")

needs_broker = pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "Kafka e2e gate: set RAKAM_KAFKA_BOOTSTRAP=host:port with a reachable "
        "broker; requires kafka-python (producer) and the spark-sql-kafka "
        "connector (use session.get_spark(kafka=True)); no broker/network in "
        "this container"
    ),
)


def test_kafka_source_unavailable_raises_actionably(spark, warehouse, tmp_path):
    """Without the connector jar, start_kafka_stream must fail fast
    with an error naming the kafka data source — never a silent hang
    or a cryptic downstream failure (this is the failure mode every
    mis-deployed cluster hits first)."""
    if BOOTSTRAP:
        pytest.skip("broker configured: covered by the e2e test instead")
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj")
    with pytest.raises(Exception, match="(?i)kafka"):
        ing.start_kafka_stream("localhost:9092", "events", str(tmp_path / "ckpt"))


@needs_broker
def test_kafka_produce_ingest_commit_roundtrip(warehouse, tmp_path):
    """Full loop against a real broker: gateway-salted producer keys,
    maxOffsetsPerTrigger backpressure (multiple micro-batches), uuid
    dedup across the stream, epoch commits."""
    kafka = pytest.importorskip("kafka")  # kafka-python producer

    from rakam_api_spark.session import get_spark

    spark = get_spark(kafka=True)
    topic = f"rakam-e2e-{uuid.uuid4().hex[:8]}"
    events = [
        {"collection": "clicks", "properties": {"x": i}, "api": {"uuid": f"u{i}"}}
        for i in range(40)
    ]
    events.append(events[0])  # duplicate uuid: must dedup to 40
    producer = kafka.KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for key, value in to_kafka_envelopes(events, "proj"):
        producer.send(topic, key=key.encode(), value=value.encode())
    producer.flush()

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj")
    q = ing.start_kafka_stream(
        BOOTSTRAP,
        topic,
        str(tmp_path / "ckpt"),
        starting_offsets="earliest",
        trigger_available_now=True,
        max_offsets_per_trigger=10,  # backpressure: ≥4 micro-batches
    )
    q.awaitTermination(120)
    assert ing.collector.store.read("proj", "clicks").count() == 40  # deduped
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4
