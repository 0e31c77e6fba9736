"""Persisted inverted index (llm/search_index.py): bit-identical to
the scan-based BM25, incremental append, pruned layout."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from rakam_api_spark.llm.search import QUERY_TERMS, bm25_search
from rakam_api_spark.llm.search_index import SearchIndex
from rakam_api_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def index(spark, tmp_path):
    idx = SearchIndex(spark, str(tmp_path / "sidx"))
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n = idx.build(docs)
    assert n == docs.count()
    return idx


class TestSearchIndex:
    def test_bit_identical_to_scan_path(self, spark, index):
        scan = [
            (r["doc_id"], r["dl"], r["score"]) for r in bm25_search(spark, SF, k=20).collect()
        ]
        idxr = [(r["doc_id"], r["dl"], r["score"]) for r in index.query(QUERY_TERMS, k=20).collect()]
        assert idxr == scan  # scores EXACTLY equal, same order

    def test_append_updates_results_and_stats(self, spark, index):
        n0, dl0 = index.stats()
        # a short doc stuffed with every query term ranks first
        boost = spark.createDataFrame(
            [(9_000_001, "spark join window spark join window")], "doc_id long, text string"
        )
        index.append(boost)
        n1, dl1 = index.stats()
        assert n1 == n0 + 1 and dl1 == dl0 + 6
        top = index.query(QUERY_TERMS, k=5).collect()
        assert top[0]["doc_id"] == 9_000_001

    def test_term_prefix_layout_prunes(self, index, tmp_path):
        parts = {
            p
            for p in os.listdir(os.path.join(str(tmp_path / "sidx"), "postings"))
            if p.startswith("term_prefix=")
        }
        assert len(parts) >= 2  # hex-nibble partitions exist
        # query plan carries the partition filter
        plan = index.query(QUERY_TERMS)._jdf.queryExecution().executedPlan().toString()
        assert "term_prefix" in plan

    def test_unknown_term_scores_empty(self, spark, index):
        assert index.query(("zzzznotaterm",), k=5).count() == 0


class TestTornAppendDetection:
    """The 3-step append (postings, doclens, stats) is job-atomic per
    step but not as a sequence; a crash between steps must be
    DETECTED, not served as silently shifted BM25 scores."""

    def _torn_after_doclens(self, spark, index):
        # simulate: postings+doclens of a new batch landed, crash
        # before the stats overwrite
        from rakam_api_spark.llm.search_index import _doclens, _postings

        batch = spark.createDataFrame(
            [(9_000_002, "spark join window spark join window")],
            "doc_id long, text string",
        )
        _postings(batch).withColumn(
            "term_prefix", F.substring(F.md5("term"), 1, 1)
        ).write.partitionBy("term_prefix").mode("append").parquet(
            os.path.join(index.path, "postings")
        )
        _doclens(batch).write.mode("append").parquet(os.path.join(index.path, "doclens"))

    def test_validate_detects_and_append_refuses(self, spark, index):
        from rakam_api_spark.llm.search_index import IndexInconsistency

        index.validate(deep=True)  # consistent after build
        self._torn_after_doclens(spark, index)
        with pytest.raises(IndexInconsistency, match="torn append"):
            index.validate()
        with pytest.raises(IndexInconsistency):
            index.query(QUERY_TERMS, verify=True)
        # append refuses to compound the corruption
        more = spark.createDataFrame([(9_000_003, "x y")], "doc_id long, text string")
        with pytest.raises(IndexInconsistency):
            index.append(more)

    def test_repair_restores_scan_identical_scores(self, spark, index):
        from rakam_api_spark.llm.search_index import IndexInconsistency

        self._torn_after_doclens(spark, index)
        index.repair()
        out = index.validate(deep=True)
        assert out["orphan_postings"] == 0
        # repair keeps the doclens-committed batch (doc present in
        # doclens AND postings survives; stats recomputed from doclens)
        n_docs, _ = index.stats()
        assert n_docs == 501  # 500 base + the torn batch's committed doc
        top = index.query(QUERY_TERMS, k=5, verify=True).collect()
        assert top[0]["doc_id"] == 9_000_002  # short all-term doc ranks first

    def test_orphan_postings_detected_deep(self, spark, index):
        """Crash BETWEEN postings and doclens: cheap validate passes
        (stats==doclens) but deep validate flags the orphans that
        would silently inflate df."""
        from rakam_api_spark.llm.search_index import IndexInconsistency, _postings

        batch = spark.createDataFrame(
            [(9_000_004, "spark join")], "doc_id long, text string"
        )
        _postings(batch).withColumn(
            "term_prefix", F.substring(F.md5("term"), 1, 1)
        ).write.partitionBy("term_prefix").mode("append").parquet(
            os.path.join(index.path, "postings")
        )
        index.validate()  # cheap check can't see it
        with pytest.raises(IndexInconsistency, match="orphan|absent"):
            index.validate(deep=True)
        index.repair()
        # orphans pruned: back to exactly the scan-path scores
        from rakam_api_spark.llm.search import bm25_search

        scan = [(r["doc_id"], r["score"]) for r in bm25_search(spark, SF, k=20).collect()]
        idxr = [(r["doc_id"], r["score"]) for r in index.query(QUERY_TERMS, k=20).collect()]
        assert idxr == scan
