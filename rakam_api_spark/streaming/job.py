"""Streaming ingest job: readStream → foreachBatch{ parse; dedup;
dynamic-schema ingest; dead-letter; push subscriptions } → parquet
collections.

Reference mapping (SURVEY.md §3.2 "Spark shape"): the gateway feeds
a bus (Kinesis/Kafka); here any Structured Streaming source works —
tests use the file source and a Kafka-shaped static frame;
production calls ``start_kafka_stream`` (same foreachBatch body, the
source frame is projected to the shared envelope ``value`` column).
Envelope format = the reference's EventList items: one JSON object
per line ``{"collection": …, "properties": {…}, "api": {"uuid": …}}``
(EventListDeserializer.java:42-186; EventContext.uuid documented
"for deduplication", Event.java:154).

Semantics:
- delivery is at-least-once from the source (the reference offers
  at-least-once with ×3 retries, AWSKinesisEventStore.java:144);
  replayed epochs are skipped via a per-epoch commit marker written
  after all collection appends succeed, so a restart that replays a
  fully-committed epoch is a no-op.  A crash *inside* an epoch
  re-processes it (at-least-once); uuid dedup then drops rows whose
  uuids were recorded by earlier *completed* epochs — current-epoch
  uuids are excluded from the anti-join so a mid-epoch retry never
  cannibalizes its own batch.
- uuid dedup *implemented for real* (the reference transports the
  uuid but never enforces it): batch-local dropDuplicates on rows
  that HAVE a uuid (uuid-less rows pass through untouched — a null
  uuid must not collapse distinct events), then a left-anti join
  against a persisted recent-uuid set that is genuinely bounded:
  reads filter to ``epoch >= current − dedup_window``, and every
  ``seen_compact_every`` epochs the set is rewritten dropping
  expired epochs (versioned directory + CURRENT pointer, atomic via
  os.replace).  No broadcast hint — the windowed set is usually
  small and AQE will broadcast it when it is, but a wide window must
  not be forced driver-side.
- parsing is pure column expressions (``from_json`` +
  ``get_json_object``): the envelope has a fixed schema; per-
  collection property schemas are inferred from a bounded driver
  sample via ``schema_of_json`` over a JSON-array literal, unioned
  with STRING fallbacks for registered fields the sample missed
  (the lenient coercion layer re-parses strings, so a fallback
  column still lands with its registered type).  No rdd round-trips
  anywhere in the batch plan (no PythonRDD / ExistingRDD scans).
- late data: accepted unconditionally into its month partition,
  like the reference's on-demand partitions
  (PostgresqlEventStore.java:103-170).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import EventCollector
from .subscriptions import SubscriptionRegistry

# EventContext fields carried by the reference envelope
# (EventListDeserializer.java:42-186).
ENVELOPE_DDL = (
    "collection STRING, api STRUCT<uuid: STRING, api_key: STRING, "
    "library: STRUCT<name: STRING, version: STRING>, api_version: STRING, "
    "upload_time: BIGINT, checksum: STRING>"
)


def parse_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Envelope lines → (collection, api struct, props_json string).

    Pure column expressions: ``from_json`` for the fixed envelope
    fields, ``get_json_object`` to carve out the free-form
    ``properties`` object as a raw JSON string (its schema is
    per-collection and resolved later).  Works on the file source
    (string ``value``) and the Kafka source (binary ``value`` — the
    cast handles both)."""
    v = F.col(value_col).cast("string")
    return df.select(
        F.from_json(v, ENVELOPE_DDL).alias("env"),
        F.get_json_object(v, "$.properties").alias("props_json"),
    ).select(
        F.col("env.collection").alias("collection"),
        F.col("env.api").alias("api"),
        "props_json",
    )


def kafka_envelope_frame(df: DataFrame) -> DataFrame:
    """Project a Kafka source frame (key/value binary, topic,
    partition, offset, …) onto the shared envelope contract: one
    string column ``value``.  The same ``process_batch`` then serves
    both buses (reference KafkaEventStore.java:82-108 publishes the
    same serialized event envelope)."""
    return df.select(F.col("value").cast("string").alias("value"))


def to_kafka_envelopes(
    events: list[dict], project: str, salt_buckets: int = 32
) -> list[tuple[str, str]]:
    """Gateway-side producer helper: event dicts → (key, value)
    pairs for a Kafka/Kinesis sink.  Key = ``project|collection|salt``
    — the reference's hot-shard-avoiding partition key
    (AWSKinesisEventStore.java:148-169 uses project|collection +
    random suffix; the salt here is a hash of the payload so retries
    land on the same shard)."""
    out = []
    for e in events:
        value = json.dumps(e)
        salt = hash(value) % salt_buckets
        out.append((f"{project}|{e.get('collection', '')}|{salt}", value))
    return out


class StreamingIngest:
    def __init__(
        self,
        collector: EventCollector,
        project: str,
        registry: SubscriptionRegistry | None = None,
        dedup_uuids: bool = True,
        dedup_window_batches: int = 100,
        seen_compact_every: int = 10,
        push_row_cap: int = 10_000,
        schema_sample_rows: int = 1_000,
    ):
        self.collector = collector
        self.project = project
        self.registry = registry or SubscriptionRegistry()
        self.dedup_uuids = dedup_uuids
        self.dedup_window = dedup_window_batches
        self.seen_compact_every = seen_compact_every
        self.push_row_cap = push_row_cap
        self.schema_sample_rows = schema_sample_rows
        self.spark = collector.spark
        base = os.path.join(collector.metastore.warehouse_dir, project)
        self._seen_base = os.path.join(base, "_seen_uuids")
        self._commit_base = os.path.join(base, "_stream_commits")
        # set when wired to a checkpointed stream: epoch ids are only
        # meaningful per checkpoint, so commit markers are namespaced
        # by it; ad-hoc process_batch calls skip marker logic
        self._commit_ns: str | None = None

    # --- core micro-batch handler --------------------------------------

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body.  ``batch_df`` has one column ``value``
        (string or binary) holding an event-envelope JSON line."""
        if self._is_committed(epoch_id):
            return  # replay of a fully-committed epoch: no-op
        spark = batch_df.sparkSession
        parsed = parse_envelope(batch_df).where(F.col("collection").isNotNull())
        if self.dedup_uuids:
            parsed = self._dedup(parsed, epoch_id)
        # one cached pass feeds the distinct-collections probe, every
        # per-collection ingest, and the post-ingest seen-uuid append
        parsed = parsed.persist()
        try:
            collections = [
                r["collection"] for r in parsed.select("collection").distinct().collect()
            ]
            for coll in sorted(collections):
                rows = parsed.where(F.col("collection") == coll)
                props = self._parse_props(rows, coll)
                if props is None:
                    continue
                report = self.collector._ingest_df(self.project, coll, props)
                if report.stored and self.registry.subs and report.valid_df is not None:
                    # push THIS batch's coerced rows only — never a
                    # re-read of the stored table (each subscriber
                    # sees each row exactly once)
                    self.registry.push(
                        self.project, report.collection, report.valid_df,
                        row_cap=self.push_row_cap,
                    )
            if self.dedup_uuids:
                # record uuids only after every collection ingested:
                # a mid-epoch crash re-processes the batch instead of
                # losing it (and dead-lettered *values* never block a
                # corrected resend — the uuid marks the stored event)
                new_uuids = (
                    parsed.select(
                        F.col("api.uuid").alias("uuid"),
                        F.lit(epoch_id).cast("long").alias("epoch"),
                    ).where(F.col("uuid").isNotNull())
                )
                self._append_seen(new_uuids)
                if self.seen_compact_every and epoch_id % self.seen_compact_every == 0:
                    self._compact_seen(spark, epoch_id)
        finally:
            parsed.unpersist()
        self._mark_committed(epoch_id)

    def _dedup(self, parsed: DataFrame, epoch_id: int) -> DataFrame:
        """uuid dedup: only rows WITH a uuid deduplicate (batch-local
        + against the windowed seen set); uuid-less rows pass through
        — grouping NULLs would collapse distinct events."""
        parsed = parsed.withColumn("__uuid", F.col("api.uuid"))
        no_uuid = parsed.where(F.col("__uuid").isNull())
        with_uuid = parsed.where(F.col("__uuid").isNotNull()).dropDuplicates(["__uuid"])
        seen = self._read_seen(parsed.sparkSession, epoch_id)
        if seen is not None:
            with_uuid = with_uuid.join(
                seen.select(F.col("uuid").alias("__seen_uuid")),
                with_uuid["__uuid"] == F.col("__seen_uuid"),
                "left_anti",
            )
        return with_uuid.unionByName(no_uuid).drop("__uuid")

    # --- per-collection property parsing (no RDD round-trips) -----------

    def _mapper_field_names(self) -> set[str]:
        """Fields the enrichment pipeline itself contributes — never
        expected on the wire, so no parse fallback needed for them."""
        names: set[str] = set()
        pipeline = self.collector.pipeline
        if pipeline is None:
            return names
        for m in pipeline.mappers:
            dep = m.dependency()
            names |= set(dep.constant_fields)
            for fields in dep.dependent_fields.values():
                names |= set(fields)
        return names

    def _parse_props(self, rows: DataFrame, collection: str) -> DataFrame | None:
        """properties JSON strings → typed DataFrame via ``from_json``.

        Schema = ``schema_of_json`` over a bounded driver sample
        (JSON-array literal, so Spark's own JSON inference merges the
        sample rows JVM-side) ∪ STRING fallbacks for registered
        client fields the sample missed — the lenient coercion layer
        (ingest/coerce.py) turns a string back into the registered
        type, so a field that only appears past the sample horizon
        still lands correctly.  The full-batch parse is one
        ``from_json`` projection: no Python rows, no re-serialize."""
        spark = rows.sparkSession
        self.collector.metastore.create_project(self.project)  # idempotent
        sample = [
            r["props_json"]
            for r in rows.where(F.col("props_json").isNotNull())
            .select("props_json").limit(self.schema_sample_rows).collect()
        ]
        sample = [s for s in sample if s.lstrip().startswith("{")]
        inner = None
        if sample:
            arr = "[" + ",".join(sample) + "]"
            ddl = spark.range(1).select(F.schema_of_json(F.lit(arr))).head()[0]
            if ddl and ddl.upper().startswith("ARRAY<STRUCT<"):
                inner = ddl[len("ARRAY<"):-len(">")]
        inferred: list[str] = []
        if inner and inner != "STRUCT<>":
            probe = rows.limit(0).select(
                F.from_json("props_json", inner).alias("p")
            ).select("p.*")
            inferred = probe.columns

        registered = self.collector.metastore.project(self.project).collections.get(collection)
        skip = self._mapper_field_names()
        fallbacks = [
            n for n in (registered.fields if registered else {})
            if n not in inferred and n not in skip and not n.startswith("$")
        ]
        if not inferred and not fallbacks:
            return None  # nothing parseable and nothing registered
        if fallbacks:
            extra = ", ".join(f"`{n}`: STRING" for n in fallbacks)
            body = inner[len("STRUCT<"):-1] if inner and inner != "STRUCT<>" else ""
            inner = f"STRUCT<{body}, {extra}>" if body else f"STRUCT<{extra}>"
        props = rows.select(F.from_json("props_json", inner).alias("p")).select("p.*")
        if fallbacks:
            # drop fallback columns that are entirely null in this
            # batch so downstream inference/mappers see the same
            # frame a sampled parse would have produced (one tiny
            # agg, only when a registered field missed the sample)
            flags = props.agg(
                *[F.max(F.col(f"`{c}`").isNotNull()).alias(c) for c in fallbacks]
            ).first()
            dead = [c for c in fallbacks if not flags[c]]
            if dead:
                props = props.drop(*dead)
            if not props.columns:
                return None
        return props

    # --- seen-uuid state (windowed, versioned, bounded) ------------------

    def _current_seen_dir(self) -> str | None:
        ptr = os.path.join(self._seen_base, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                name = f.read().strip()
            d = os.path.join(self._seen_base, name)
            return d if os.path.exists(d) else None
        return None

    def _set_current_seen(self, name: str) -> None:
        ptr = os.path.join(self._seen_base, "CURRENT")
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, ptr)  # atomic pointer swap

    def _read_seen(self, spark: SparkSession, epoch_id: int) -> DataFrame | None:
        """Windowed read of the seen set: only epochs inside
        ``dedup_window`` count, and the CURRENT epoch is excluded so
        an at-least-once replay of this epoch cannot anti-join away
        its own batch."""
        d = self._current_seen_dir()
        if d is None:
            return None
        return (
            spark.read.parquet(d)
            .where(
                (F.col("epoch") >= F.lit(epoch_id - self.dedup_window))
                & (F.col("epoch") != F.lit(epoch_id))
            )
            .select("uuid", "epoch")
        )

    def _append_seen(self, df: DataFrame) -> None:
        if df.isEmpty():
            return
        d = self._current_seen_dir()
        if d is None:
            os.makedirs(self._seen_base, exist_ok=True)
            d = os.path.join(self._seen_base, "v0")
            df.write.mode("append").parquet(d)
            self._set_current_seen("v0")
            return
        df.write.mode("append").parquet(d)

    def _compact_seen(self, spark: SparkSession, epoch_id: int) -> None:
        """Bound the state: rewrite the seen set keeping only epochs
        inside the window, into a fresh versioned dir, then swap the
        CURRENT pointer atomically and remove the old version.  State
        size is O(window × batch), independent of stream lifetime."""
        d = self._current_seen_dir()
        if d is None:
            return
        cur_name = os.path.basename(d)
        nxt_name = f"v{int(cur_name[1:]) + 1}"
        nxt = os.path.join(self._seen_base, nxt_name)
        (
            spark.read.parquet(d)
            .where(F.col("epoch") >= F.lit(epoch_id - self.dedup_window))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(nxt)
        )
        self._set_current_seen(nxt_name)
        shutil.rmtree(d, ignore_errors=True)

    # --- epoch commit markers (replay idempotence) -----------------------

    def _commit_dir(self) -> str | None:
        if self._commit_ns is None:
            return None
        return os.path.join(self._commit_base, self._commit_ns)

    def _is_committed(self, epoch_id: int) -> bool:
        d = self._commit_dir()
        return d is not None and os.path.exists(os.path.join(d, f"epoch_{epoch_id}"))

    def _mark_committed(self, epoch_id: int) -> None:
        d = self._commit_dir()
        if d is None:
            return
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"epoch_{epoch_id}"), "w") as f:
            f.write("1")

    # --- stream wiring ---------------------------------------------------

    def _start_writer(self, stream: DataFrame, checkpoint_dir: str, trigger_available_now: bool):
        import hashlib

        self._commit_ns = hashlib.md5(
            os.path.abspath(checkpoint_dir).encode()
        ).hexdigest()[:12]
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

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
        return self._start_writer(stream, checkpoint_dir, trigger_available_now)

    def start_kafka_stream(
        self,
        bootstrap_servers: str,
        topic: str,
        checkpoint_dir: str,
        starting_offsets: str = "latest",
        trigger_available_now: bool = False,
        max_offsets_per_trigger: int | None = None,
    ):
        """Kafka-bus stream (reference K4/K6: AWSKinesisEventStore /
        KafkaEventStore publish the event envelope to a topic keyed
        by project|collection).  Same foreachBatch body as the file
        bus — only the source frame projection differs.  Requires the
        spark-sql-kafka connector jar on the session classpath
        (``session.get_spark(kafka=True)``); the parse path itself is
        covered broker-free by tests via ``kafka_envelope_frame`` on
        a Kafka-shaped static frame."""
        reader = (
            self.spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        if max_offsets_per_trigger is not None:
            reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        stream = kafka_envelope_frame(reader.load())
        return self._start_writer(stream, checkpoint_dir, trigger_available_now)


def write_envelope_file(path: str, events: list[dict]) -> None:
    """Test/gateway helper: write an envelope batch as a JSON-lines
    file (atomically: temp + rename, so the file source never reads
    partial files)."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, path)
