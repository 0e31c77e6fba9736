"""Incremental MinHash-LSH dedup index: build once, probe each new
batch without re-signing the corpus (llm/dedup_index.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rakam_api_spark.llm.dedup_index import MinHashIndex
from rakam_api_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def corpus(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


@pytest.fixture()
def index(spark, corpus, tmp_path):
    base = corpus.where(F.col("doc_id") % 5 != 0)
    idx = MinHashIndex(spark, str(tmp_path / "mhidx"))
    n = idx.build(base)
    assert n == base.count()
    return idx


class TestMinHashIndex:
    def test_planted_duplicates_hit_index(self, spark, corpus, index):
        base = corpus.where(F.col("doc_id") % 5 != 0)
        # new batch: exact copies of 10 indexed docs under fresh ids
        planted = (
            base.orderBy("doc_id")
            .limit(10)
            .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        )
        decisions = index.dedup_batch(planted, threshold=0.5).collect()
        base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
        assert len(decisions) == 10
        for d in decisions:
            assert d["source"] == "index"
            assert d["est_jaccard"] == 1.0  # identical signature
            # keeper = smallest matching indexed doc; the synthetic
            # corpus itself contains exact dupes, so the keeper may be
            # an even-smaller twin of the copied doc — but it must be
            # an indexed doc no bigger than the copy's source
            assert d["duplicate_of"] in base_ids
            assert d["duplicate_of"] <= d["doc_id"] - 1_000_000

    def test_batch_internal_duplicates(self, spark, index):
        batch = spark.createDataFrame(
            [
                (2_000_001, "alpha beta gamma delta epsilon zeta eta theta"),
                (2_000_002, "alpha beta gamma delta epsilon zeta eta theta"),
                (2_000_003, "completely different words nothing shared here at all"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in index.dedup_batch(batch, threshold=0.5).collect()}
        assert 2_000_002 in rows and rows[2_000_002]["source"] == "batch"
        assert rows[2_000_002]["duplicate_of"] == 2_000_001
        assert 2_000_003 not in rows  # unique doc: no decision row

    def test_unique_docs_not_flagged(self, spark, corpus, index):
        # held-out docs (doc_id % 5 == 0) are distinct from the base
        # in this synthetic corpus only if their text is; flag rate
        # must equal the exact-duplicate rate, not 100%
        held_out = corpus.where(F.col("doc_id") % 5 == 0)
        n_held = held_out.count()
        flagged = index.dedup_batch(held_out, threshold=0.9).count()
        assert flagged < n_held

    def test_append_then_probe(self, spark, corpus, index):
        batch1 = spark.createDataFrame(
            [(3_000_001, "uniquely minted sentence for the incremental index test")],
            "doc_id long, text string",
        )
        assert index.dedup_batch(batch1, threshold=0.5).count() == 0
        index.append(batch1)
        # a copy of batch1 arriving later is caught via the INDEX path
        batch2 = batch1.select((F.col("doc_id") + 1).alias("doc_id"), "text")
        d = index.dedup_batch(batch2, threshold=0.5).collect()
        assert len(d) == 1 and d[0]["source"] == "index"
        assert d[0]["duplicate_of"] == 3_000_001

    def test_exact_verify_path(self, spark, corpus, index):
        base = corpus.where(F.col("doc_id") % 5 != 0)
        planted = (
            base.orderBy("doc_id")
            .limit(5)
            .select((F.col("doc_id") + 4_000_000).alias("doc_id"), "text")
        )
        d = index.dedup_batch(planted, threshold=0.5, verify_docs=base).collect()
        assert len(d) == 5
        for r in d:
            assert r["est_jaccard"] == 1.0  # exact jaccard of identical text

    def test_band_prefix_partitioning(self, index, tmp_path):
        import os

        parts = [
            p
            for p in os.listdir(os.path.join(str(tmp_path / "mhidx"), "bands"))
            if p.startswith("bk_prefix=")
        ]
        assert len(parts) == 16  # one dir per hex nibble
