"""Persisted inverted index for BM25 retrieval: build once, query
without rescanning the corpus, append new batches incrementally —
the steady-state shape of a 100 TB search index (the batch
``search.bm25_search`` stays as the index-free backfill/oracle path).

Layout under ``path``:

- ``postings/`` — (term, doc_id, tf) parquet, hive-partitioned by
  ``term_prefix`` (first hex nibble of md5(term)) so a query's term
  lookups prune to 1/16th of the index and appends parallelize.
- ``doclens/`` — (doc_id, dl) parquet.
- ``stats/``   — a single-row (n_docs, total_dl) parquet maintained
  incrementally on build/append: query-time cost is O(matching
  postings), independent of corpus size.

Scoring reuses ``search._bm25_term_score`` on the SAME integer
inputs (tf, df, dl, n_docs, total_dl), so the index path returns
BIT-IDENTICAL scores to the scan path — asserted by the lifecycle
test, which is the index's correctness gate.

Beyond-reference surface (the reference delegates search to its
warehouse); the postings layout follows the standard shared-nothing
inverted-index construction (e.g. MapReduce index building,
Dean & Ghemawat OSDI 2004 §6.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .search import QUERY_TERMS, _bm25_rank


class IndexInconsistency(RuntimeError):
    """The persisted index's components disagree (torn multi-step
    append) — scoring from it would silently diverge from the scan
    path.  ``SearchIndex.repair()`` restores consistency."""


def _postings(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def _doclens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("dl")
    )


class SearchIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._postings_path = os.path.join(path, "postings")
        self._doclens_path = os.path.join(path, "doclens")
        self._stats_path = os.path.join(path, "stats")

    # --- maintenance -----------------------------------------------------

    def _write_stats(self, n_docs: int, total_dl: int) -> None:
        self.spark.createDataFrame(
            [(n_docs, total_dl)], "n_docs long, total_dl long"
        ).coalesce(1).write.mode("overwrite").parquet(self._stats_path)

    def build(self, docs: DataFrame) -> int:
        dl = _doclens(docs).cache()
        _postings(docs).withColumn(
            "term_prefix", F.substring(F.md5("term"), 1, 1)
        ).write.partitionBy("term_prefix").mode("overwrite").parquet(self._postings_path)
        dl.write.mode("overwrite").parquet(self._doclens_path)
        row = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
        dl.unpersist()
        self._write_stats(int(row[0]), int(row[1] or 0))
        return int(row[0])

    def append(self, docs: DataFrame) -> int:
        """Index a new batch: postings/doclens append (disjoint
        doc_ids are the caller's contract, as in any LSM-style index
        ingest), stats update by pure addition — O(batch), never a
        corpus rescan.

        CRASH SAFETY: each of the three writes is job-atomic (parquet
        commit), but the sequence is not — a crash between them tears
        the index (e.g. postings reflecting the batch while
        n_docs/avgdl are stale, silently shifting every BM25 score).
        Stats are written LAST, and ``validate()`` detects any torn
        state by cross-checking stats against the doclens table; this
        method validates BEFORE appending so corruption never
        compounds, and ``repair()`` restores consistency."""
        self.validate()
        dl = _doclens(docs).cache()
        _postings(docs).withColumn(
            "term_prefix", F.substring(F.md5("term"), 1, 1)
        ).write.partitionBy("term_prefix").mode("append").parquet(self._postings_path)
        dl.write.mode("append").parquet(self._doclens_path)
        row = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
        dl.unpersist()
        old = self.stats()
        self._write_stats(old[0] + int(row[0]), old[1] + int(row[1] or 0))
        return int(row[0])

    def stats(self) -> tuple[int, int]:
        r = self.spark.read.parquet(self._stats_path).collect()[0]
        return int(r["n_docs"]), int(r["total_dl"])

    def validate(self, deep: bool = False) -> dict:
        """Cross-check the index components; raises
        :class:`IndexInconsistency` on a torn state.

        The cheap check (always): stats.(n_docs, total_dl) must equal
        the doclens aggregate — one scan of the doc-grain table (tiny
        next to postings), catching the crash-after-doclens tear.
        ``deep=True`` additionally scans postings for doc_ids absent
        from doclens (the crash-after-postings tear, which silently
        inflates df) — O(postings), for scheduled maintenance, and
        exactly what ``repair()`` prunes."""
        dl = self.spark.read.parquet(self._doclens_path)
        row = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
        got = (int(row[0]), int(row[1] or 0))
        want = self.stats()
        if got != want:
            raise IndexInconsistency(
                f"stats {want} != doclens aggregate {got}: torn append "
                "(crash between doclens and stats writes) — run repair()"
            )
        out = {"n_docs": got[0], "total_dl": got[1], "orphan_postings": None}
        if deep:
            post = self.spark.read.parquet(self._postings_path)
            orphans = post.join(dl.select("doc_id"), "doc_id", "left_anti").count()
            out["orphan_postings"] = int(orphans)
            if orphans:
                raise IndexInconsistency(
                    f"{orphans} postings reference doc_ids absent from doclens: "
                    "torn append (crash between postings and doclens writes) — "
                    "run repair()"
                )
        return out

    def repair(self) -> dict:
        """Restore consistency after a torn append: drop postings for
        doc_ids absent from doclens (the un-committed batch's rows),
        then recompute stats from doclens.  The postings rewrite is
        O(index) — the recovery path, not the hot path — and reuses
        the versioned-swap shape (write new, atomic-ish replace)."""
        dl = self.spark.read.parquet(self._doclens_path)
        post = self.spark.read.parquet(self._postings_path)
        clean = post.join(dl.select("doc_id"), "doc_id", "left_semi")
        tmp = self._postings_path + ".repair"
        (
            clean.select("term", "doc_id", "tf", "term_prefix")
            .write.partitionBy("term_prefix")
            .mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        shutil.rmtree(self._postings_path, ignore_errors=True)
        os.replace(tmp, self._postings_path)
        row = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
        self._write_stats(int(row[0]), int(row[1] or 0))
        return self.validate(deep=True)

    # --- query -----------------------------------------------------------

    def query(
        self, terms: tuple[str, ...] = QUERY_TERMS, k: int = 20, verify: bool = False
    ) -> DataFrame:
        """Top-k BM25 from the index alone.  The postings read prunes
        on ``term_prefix`` (only the queried terms' partitions scan);
        matched docs join their stored lengths; df comes from the
        same pruned postings; n_docs/avgdl from the single-row stats
        table.  Identical integer inputs → identical IEEE scores to
        the scan path.  ``verify=True`` runs the cheap consistency
        cross-check first (detects a torn append instead of serving
        silently shifted scores)."""
        if verify:
            self.validate()
        prefixes = sorted({__import__("hashlib").md5(t.encode()).hexdigest()[0] for t in terms})
        post = self.spark.read.parquet(self._postings_path).where(
            F.col("term_prefix").isin(prefixes) & F.col("term").isin(list(terms))
        )
        dfs = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        # matched docs only: pivot the ≤|terms| postings per doc into
        # the canonical tf{i} columns
        tf_cols = [
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ]
        per_doc = (
            post.groupBy("doc_id")
            .agg(*tf_cols)
            .join(self.spark.read.parquet(self._doclens_path), "doc_id")
        )
        n_docs, total_dl = self.stats()
        df_map = {r["term"]: int(r["df"]) for r in dfs.collect()}  # ≤ |terms| rows
        stats = self.spark.createDataFrame(
            [
                tuple(
                    [float(n_docs), float(total_dl) / float(n_docs)]
                    + [float(df_map.get(t, 0)) for t in terms]
                )
            ],
            "n_docs double, avgdl double, "
            + ", ".join(f"df{i} double" for i in range(len(terms))),
        )
        return _bm25_rank(per_doc, stats, len(terms), k)
