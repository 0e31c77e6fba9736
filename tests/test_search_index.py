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
