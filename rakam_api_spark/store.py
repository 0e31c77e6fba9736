"""Event store: partitioned Parquet tables per (project, collection).

Re-expresses the reference's EventStore SPI (rakam-spi/.../plugin/
EventStore.java:10-25) and the Postgres implementation's layout
(PostgresqlEventStore.java): one table per collection inside a
project namespace, time-partitioned.

Spark mapping decisions:
- layout: ``{warehouse}/{project}/{collection}/`` parquet, hive-
  partitioned by ``_month=YYYY-MM`` derived from ``_time`` — the
  Delta-less analog of the reference's PG10 monthly RANGE partitions
  (PostgresqlEventStore.java:103-170); partitions appear implicitly
  on write (no "missing partition" retry dance needed).
- appends are atomic per micro-batch (parquet job commit), replacing
  the reference's 5000-row JDBC commit chunks
  (PostgresqlEventStore.java:186).
- dead-letter rows go to ``{project}/$invalid_schema`` —
  an event collection of its own, as in the reference
  (JsonEventDeserializer.java:85-93).
- reads merge schema across partition files so old files served
  under an evolved (wider) schema read as NULL-padded — the
  add-column-only evolution contract.

At 100 TB: the month partition column prunes scans for time-ranged
analytics; within a partition, files are sized by the writer's task
parallelism. A production deployment would add bucketing by _user
for the sessionization/funnel workloads (SPARK-19256 hive bucketing)
— noted in operator docstrings where it applies.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Metastore

INVALID_COLLECTION = "$invalid_schema"


def _safe(name: str) -> str:
    return name.replace("$", "_sys_")


def salted_repartition(df: DataFrame, key_col: str, n_partitions: int, salt_buckets: int = 32) -> DataFrame:
    """Hot-shard avoidance (reference K4: Kinesis partition key =
    `project|collection` + random(0,100000),
    AWSKinesisEventStore.java:148-169): repartition on
    (key, deterministic salt) so one dominant key value spreads over
    ``salt_buckets`` partitions instead of melting one task/shard.

    The salt is a hash of the whole row (not rand()) so the plan
    stays deterministic and retry-safe — at-least-once replays land
    identically."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    return df.repartition(n_partitions, F.col(key_col), salt)


class EventStore:
    def __init__(self, spark: SparkSession, metastore: Metastore):
        self.spark = spark
        self.metastore = metastore
        self.warehouse = metastore.warehouse_dir

    def _base_path(self, project: str, collection: str) -> str:
        return os.path.join(self.warehouse, _safe(project), _safe(collection))

    def _table_path(self, project: str, collection: str) -> str:
        """Current physical directory for a collection.  Compaction
        writes a NEW versioned directory and swaps the metastore
        pointer (one atomic JSON replace) — the Iceberg/Delta
        "current snapshot pointer" pattern — so readers never observe
        a missing or half-written table path."""
        base = self._base_path(project, collection)
        try:
            v = self.metastore.get_config(project, f"TABLE_VERSION_{collection}")
        except Exception:
            v = None
        return base if v is None else f"{base}.v{int(v)}"

    # --- write (reference K1/K2/K3) -------------------------------------

    def append(self, project: str, collection: str, df: DataFrame) -> int:
        """Append a coerced micro-batch to its collection table,
        partitioned by month(_time).  Returns the row count."""
        n = df.count()
        if n == 0:
            return 0
        self.write_batch(project, collection, df)
        return n

    def write_batch(self, project: str, collection: str, df: DataFrame) -> None:
        """The write half of :meth:`append`, with no counting action:
        the ingest hot path meters rows via ``Observation`` on the
        frame it passes in, so the batch executes exactly once
        (count + write used to be two full lineage passes)."""
        if "_time" in df.columns:
            out = df.withColumn("_month", F.date_format(F.col("_time"), "yyyy-MM"))
            partition_cols = ["_month"]
        else:
            out = df
            partition_cols = []
        writer = out.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(self._table_path(project, collection))

    def append_dead_letter(self, project: str, df: DataFrame) -> int:
        n = df.count()
        if n == 0:
            return 0
        self.write_dead_letter(project, df)
        return n

    def remove_if_fileless(self, project: str, collection: str) -> None:
        """Remove a table dir that holds no parquet files (the
        leftover of an observed zero-row write — only _SUCCESS
        markers).  Keeps ``collections_with_data``'s dir-existence
        contract honest: a collection that never stored a row leaves
        no directory behind."""
        path = self._table_path(project, collection)
        if os.path.isdir(path) and not any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        ):
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    def write_dead_letter(self, project: str, df: DataFrame) -> None:
        """Uncounted dead-letter append (the caller already knows the
        row count from its ingest Observation)."""
        df.write.mode("append").parquet(self._table_path(project, INVALID_COLLECTION))

    # --- maintenance ----------------------------------------------------

    def compact(self, project: str, collection: str, target_files_per_partition: int = 1) -> int:
        """Small-file compaction (the OPTIMIZE analog): streaming
        micro-batches write one file per trigger per partition, so a
        long-running ingest accumulates thousands of tiny files —
        the classic streaming-warehouse pathology (SURVEY.md §7 hard
        part (d)).  Rewrites each month partition into
        ``target_files_per_partition`` files in a NEW versioned
        directory, then swaps the metastore version pointer (one
        atomic file replace).  Returns the number of data files
        after compaction.

        At warehouse scale this runs per-partition (only recent
        months churn) and with Delta it would be OPTIMIZE +
        ZORDER BY (_time); the parquet fallback keeps the same
        layout contract.
        """
        path = self._table_path(project, collection)
        # raw read: keep the physical layout (incl. the _month
        # partition column, which read() projects away)
        df = self.spark.read.option("mergeSchema", "true").parquet(path)
        cur = self.metastore.get_config(project, f"TABLE_VERSION_{collection}")
        nxt = 0 if cur is None else int(cur) + 1
        out = f"{self._base_path(project, collection)}.v{nxt}"
        if "_month" in df.columns:
            (
                df.repartition(target_files_per_partition, "_month")
                .write.mode("overwrite")
                .partitionBy("_month")
                .parquet(out)
            )
        else:
            df.coalesce(target_files_per_partition).write.mode("overwrite").parquet(out)
        # atomic pointer swap (metastore JSON os.replace); a crash
        # before this line leaves the old version live, after it the
        # new one — never a missing table
        self.metastore.set_config(project, f"TABLE_VERSION_{collection}", nxt)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        n_files = 0
        for _, _, files in os.walk(out):
            n_files += sum(1 for f in files if f.endswith(".parquet"))
        return n_files

    def publish_bucketed(
        self,
        project: str,
        collection: str,
        key: str = "_user",
        n_buckets: int = 64,
        table_name: str | None = None,
    ) -> str:
        """Republish a collection as a user-bucketed analytics table
        (bucketing.write_bucketed): the maintenance companion to
        ``compact`` — ingest keeps appending to the month-partitioned
        layout, and a periodic publish gives every user-keyed
        operator (sessionization, funnel, retention, profile
        snapshot) an Exchange-free scan.  Returns the catalog table
        name to query via ``spark.table``."""
        from .bucketing import write_bucketed

        df = self.read(project, collection)
        sort_cols = (key, "_time") if "_time" in df.columns else (key,)
        name = table_name or f"{_safe(project)}_{_safe(collection)}_by_user".replace(".", "_")
        write_bucketed(
            df,
            name,
            self._base_path(project, collection) + ".bucketed",
            key=key,
            sort_cols=sort_cols,
            n_buckets=n_buckets,
        )
        return name

    def publish_rollup(
        self,
        project: str,
        collection: str,
        dims: tuple[str, ...] = ("event_type",),
        measures: dict[str, str] | None = None,
        months: list[str] | None = None,
    ) -> int:
        """Maintain a day-grain pre-aggregated rollup table beside a
        collection — the continuous-query / materialized-rollup
        pattern: segmentation-style reports read the rollup instead
        of re-scanning raw events.

        INCREMENTAL by month partition: ingest appends only to the
        current month, so ``publish_rollup(months=[...])`` recomputes
        and overwrites JUST those month partitions (dynamic partition
        overwrite — untouched months' files stay byte-identical).
        With ``months=None`` the full table is (re)built.  Returns
        the number of rollup rows written.

        ``measures`` maps output column → aggregation SQL over the
        raw rows (defaults to event count + value sum in exact
        decimal).  At 100 TB each month refresh is one partial-
        aggregated shuffle over that month's partition only — the
        read prunes on the ``_month`` partition column.
        """
        measures = measures or {
            "n_events": "CAST(COUNT(*) AS BIGINT)",
            "total_value": "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)",
        }
        raw = self.spark.read.option("mergeSchema", "true").parquet(
            self._table_path(project, collection)
        )
        if months is not None:
            raw = raw.where(F.col("_month").isin(list(months)))
        day = F.col("_time").cast("date").alias("_day")
        aggs = [F.expr(sql).alias(name) for name, sql in measures.items()]
        rollup = raw.groupBy(
            F.col("_month"), day, *[F.col(d) for d in dims]
        ).agg(*aggs)
        out = self._base_path(project, collection) + ".rollup"
        if months is None:
            # full rebuild: drop the whole table first so month
            # partitions that vanished from raw (retention delete,
            # compaction pruning) don't linger stale — dynamic
            # overwrite only touches partitions present in the new
            # aggregate
            shutil.rmtree(out, ignore_errors=True)
        # per-write option (not a session-conf flip, which would race
        # with concurrent jobs on the same SparkSession): overwrite
        # ONLY the month partitions present in this refresh — other
        # months' files are untouched
        (
            rollup.write.partitionBy("_month")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out)
        )
        return self.spark.read.parquet(out).count()

    def read_rollup(self, project: str, collection: str) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(
            self._base_path(project, collection) + ".rollup"
        )

    # --- read -----------------------------------------------------------

    def read(self, project: str, collection: str) -> DataFrame:
        """Read a collection under its current (widest) registered
        schema; files written before an ADD COLUMN read NULL for the
        new columns."""
        path = self._table_path(project, collection)
        schema = self.metastore.get_collection(project, collection)
        if not os.path.exists(path) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        ):
            # missing dir, or a dir holding only _SUCCESS markers
            # (an observed write of an empty batch): empty frame
            if schema is None:
                raise FileNotFoundError(f"no such collection: {project}.{collection}")
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.option("mergeSchema", "true").parquet(path)
        if schema is not None:
            # project onto registered schema/order; pad missing columns
            cols = []
            have = {f.name for f in df.schema.fields}
            for fld in schema.fields:
                if fld.name in have:
                    cols.append(F.col(f"`{fld.name}`").cast(fld.dataType).alias(fld.name))
                else:
                    cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            df = df.select(*cols)
        return df

    def read_dead_letter(self, project: str) -> DataFrame:
        path = self._table_path(project, INVALID_COLLECTION)
        if not os.path.exists(path):
            from .ingest.coerce import DEAD_LETTER_SCHEMA

            return self.spark.createDataFrame([], DEAD_LETTER_SCHEMA)
        return self.spark.read.parquet(path)

    def collections_with_data(self, project: str) -> list[str]:
        import re

        base = os.path.join(self.warehouse, _safe(project))
        if not os.path.exists(base):
            return []
        names = {
            re.sub(r"\.v\d+$", "", d)  # versioned dirs map to their table
            for d in os.listdir(base)
            if not d.startswith("_")
        }
        return sorted(names)
