"""Maintenance adapters for the persisted derived indexes — the
auto-indexer policy (reference M5: the auto-indexer listens for data
changes and schedules index work,
rakam-postgresql/src/main/java/org/rakam/postgresql/PostgresqlModule.java:192-242)
extended to the LLM-pipeline indexes:

- ``bm25``    — :class:`rakam_api_spark.llm.search_index.SearchIndex`
  (postings/doclens/stats),
- ``minhash`` — :class:`rakam_api_spark.llm.dedup_index.MinHashIndex`
  (sig/bands),
- ``ivf``     — the cell-partitioned vector index written by
  :func:`rakam_api_spark.llm.similarity.build_ivf_index`
  (corpus/centroids).

Each index is registered with its BASE table (any parquet path) and id
column; the planner then reports two conditions per index without
touching data-grain rows:

- **staleness** — base ids absent from the index (appends landed on
  the base since the last index write).  Healing is an O(missing)
  ``append`` — never a rebuild: BM25 appends postings, MinHash appends
  signatures/band keys, IVF assigns the new vectors to the FROZEN
  centroids and appends into their cell partitions (the standard IVF
  ingest path — cells only re-learn on an explicit rebuild).
- **fragmentation** — parquet fragment count of the append-grown
  component (postings / bands / corpus).  Healing rewrites that
  component at one file per partition via a versioned tmp+swap, the
  same shape as ``SearchIndex.repair``.

``EventStore.maintenance_plan`` folds these in as
``search_index_refresh`` / ``index_compact`` actions and
``run_maintenance`` executes them under the index's own advisory
writer lock, so index maintenance serializes with any concurrent
append exactly like table maintenance does.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("bm25", "minhash", "ivf")

# the component that grows on append (fragmentation target) and its
# hive partition column (compaction preserves the layout)
_GROWTH = {
    "bm25": ("postings", "term_prefix"),
    "minhash": ("bands", "bk_prefix"),
    "ivf": ("corpus", "cell"),
}
# the doc-grain component carrying one row per indexed id
_IDS = {
    "bm25": ("doclens", "doc_id"),
    "minhash": ("sig", "doc_id"),
    "ivf": ("corpus", "vec_id"),
}


def indexed_ids(spark: SparkSession, kind: str, path: str) -> DataFrame:
    """One-column (``id``) frame of every id the index covers — read
    from the doc-grain component (tiny next to postings/bands)."""
    comp, col = _IDS[kind]
    return spark.read.parquet(os.path.join(path, comp)).select(F.col(col).alias("id"))


def missing_ids(
    spark: SparkSession, kind: str, path: str, base: DataFrame, id_col: str
) -> DataFrame:
    """Base rows not yet indexed (left_anti on the id column) — the
    staleness set; O(base doc-grain), no posting/band scan."""
    have = indexed_ids(spark, kind, path)
    return base.join(have, base[id_col] == have["id"], "left_anti")


def fragment_count(kind: str, path: str) -> int:
    """Parquet fragment count of the append-grown component — pure
    directory metadata, the same no-data-read discipline as
    ``EventStore.table_stats``."""
    comp, _ = _GROWTH[kind]
    n = 0
    for dp, _dirs, fs in os.walk(os.path.join(path, comp)):
        n += sum(1 for f in fs if f.endswith(".parquet"))
    return n


def refresh(
    spark: SparkSession, kind: str, path: str, base: DataFrame, id_col: str
) -> int:
    """Append the missing base rows into the index; returns the number
    of newly indexed ids.  Incremental by construction — cost is
    O(missing + their postings/bands), independent of index size.

    The missing set is SNAPSHOTTED to a staging parquet before the
    append: its plan anti-joins the index's own doc-grain files, so
    appending from the lazy frame would re-list those files mid-append
    and silently resolve to an empty batch (Spark re-evaluates the
    lineage per job).  Staging breaks that self-reference — the same
    reason streaming sinks never write a source they read in the same
    job."""
    if kind == "bm25":
        cols, renamed = ("text",), "doc_id"
    elif kind == "minhash":
        cols, renamed = ("text",), "doc_id"
    elif kind == "ivf":
        cols, renamed = ("embedding",), "vec_id"
    else:
        raise ValueError(f"unknown index kind {kind!r}")
    miss = missing_ids(spark, kind, path, base, id_col).select(
        F.col(id_col).alias(renamed), *cols
    )
    staging = os.path.join(path, ".staging_refresh")
    shutil.rmtree(staging, ignore_errors=True)
    miss.write.parquet(staging)
    todo = spark.read.parquet(staging)
    try:
        if todo.isEmpty():
            return 0
        if kind == "bm25":
            from .search_index import SearchIndex

            return SearchIndex(spark, path).append(todo)
        if kind == "minhash":
            from .dedup_index import MinHashIndex

            return MinHashIndex(spark, path).append(todo)
        return _ivf_append(spark, path, todo)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _ivf_append(spark: SparkSession, path: str, new_emb: DataFrame) -> int:
    """Assign new vectors to the FROZEN centroids and append them into
    their cell partitions — the IVF steady-state ingest (centroids
    only move on an explicit ``build_ivf_index`` rebuild, mirroring
    how production IVF systems retrain offline)."""
    from .similarity import _assign_cells, _quantized_components

    new_emb = new_emb.cache()
    n = new_emb.count()
    if n == 0:
        new_emb.unpersist()
        return 0
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    comp = _quantized_components(new_emb)
    assign = _assign_cells(comp, cents)
    (
        new_emb.join(assign, "vec_id")
        .withColumnRenamed("label", "cell")
        .select("vec_id", "embedding", "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(os.path.join(path, "corpus"))
    )
    new_emb.unpersist()
    return n


def compact(spark: SparkSession, kind: str, path: str) -> int:
    """Rewrite the append-grown component at one file per hive
    partition (tmp write + atomic-ish swap, as in
    ``SearchIndex.repair``); returns the post-compaction fragment
    count.  Partition column preserved, so probe-side pruning is
    unchanged; row order inside a fragment is not part of any index
    contract (every reader re-aggregates or re-sorts)."""
    comp, part_col = _GROWTH[kind]
    target = os.path.join(path, comp)
    df = spark.read.parquet(target)
    tmp = target + ".compact"
    (
        df.repartition(F.col(part_col))
        .write.partitionBy(part_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    shutil.rmtree(target, ignore_errors=True)
    os.replace(tmp, target)
    return fragment_count(kind, path)
