"""Incremental MinHash-LSH dedup index: persist per-doc signatures
and band keys once, then dedup each NEW batch against the index with
cost O(|batch| + |collisions|) — never re-signing or re-shingling the
accumulated corpus.

This is the daily-ingest shape of corpus dedup at 100 TB: the corpus
signature index is ~50 bytes/doc (16 hex minhashes + set size), the
band-key table is 8 rows/doc, and a new day's batch probes it with
one equi-join on (band, band_key).  The batch-mode pair sweep
(``dedup.minhash_lsh_pairs``) stays the full-corpus backfill path;
this module is the steady-state path.

Beyond-reference surface (the reference has no dedup layer); the
index-maintenance pattern follows the MinHash/LSH construction of
Broder (1997) and the banding analysis in Mining of Massive Datasets
ch. 3.

Verification contract: the index stores signatures, not shingle
sets, so match quality against OLD docs is the SIGNATURE-estimated
Jaccard (matching slots / 16) — the standard index-only estimate;
its expected value is the true Jaccard.  Pass ``verify_docs`` (a
frame holding the old docs' text) to upgrade candidate pairs to
exact shingle Jaccard, pruned to candidates only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .dedup import BAND_SIZE, N_HASHES, _minhash_signature, word_shingles

_SIG_COLS = [f"mh{i}" for i in range(N_HASHES)]


def band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — one md5 band key per signature band
    (8 bands × 2 rows at the default geometry)."""
    n_bands = N_HASHES // BAND_SIZE
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)])
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*structs)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key")
    )


class MinHashIndex:
    """Persisted signature + band-key tables under ``path`` (parquet,
    append-mode growth; band keys carry a ``bk_prefix`` partition
    column — the first hex nibble of the band key — so a probe scans
    1/16th of the index per join task and compaction parallelizes)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._sig_path = os.path.join(path, "sig")
        self._bands_path = os.path.join(path, "bands")

    # --- build / append --------------------------------------------------

    def build(self, docs: DataFrame) -> int:
        """Full (re)build from a docs frame; returns indexed count."""
        sig = _minhash_signature(docs)
        sig.write.mode("overwrite").parquet(self._sig_path)
        stored = self.spark.read.parquet(self._sig_path)
        bands = band_keys(stored).withColumn(
            "bk_prefix", F.substring("band_key", 1, 1)
        )
        bands.write.partitionBy("bk_prefix").mode("overwrite").parquet(self._bands_path)
        return stored.count()

    def append(self, docs: DataFrame) -> int:
        """Index a new batch (append-only; caller dedups first if the
        batch's own dupes should not enter the index)."""
        sig = _minhash_signature(docs).cache()
        n = sig.count()
        sig.write.mode("append").parquet(self._sig_path)
        band_keys(sig).withColumn(
            "bk_prefix", F.substring("band_key", 1, 1)
        ).write.partitionBy("bk_prefix").mode("append").parquet(self._bands_path)
        sig.unpersist()
        return n

    def signatures(self) -> DataFrame:
        return self.spark.read.parquet(self._sig_path)

    def bands(self) -> DataFrame:
        return self.spark.read.parquet(self._bands_path)

    # --- probe -----------------------------------------------------------

    def dedup_batch(
        self,
        new_docs: DataFrame,
        threshold: float = 0.5,
        verify_docs: DataFrame | None = None,
    ) -> DataFrame:
        """Dedup decisions for a NEW batch against the index (and
        against the batch itself).

        Returns (doc_id, duplicate_of, est_jaccard, source) where
        ``source`` is 'index' or 'batch'; docs with no match ≥
        threshold are absent.  ``duplicate_of`` is the smallest
        matching doc id — with exact-dup planting that is the
        canonical keeper rule used by ``dedup.exact_dedup``.

        Plan: signatures for the batch only (Arrow kernel), band keys
        for the batch only, ONE equi-join against the persisted band
        table on (band, band_key) plus a batch-internal band
        self-join; the signature-estimate join touches only collided
        pairs.  Nothing in the accumulated corpus is re-read except
        the collided band keys and the matched docs' signatures.
        """
        new_sig = _minhash_signature(new_docs).cache()
        new_sig.count()
        nb = band_keys(new_sig)
        idx_hits = (
            nb.withColumnRenamed("doc_id", "new_id")
            .join(
                self.bands().withColumnRenamed("doc_id", "old_id"),
                ["band", "band_key"],
            )
            .select("new_id", "old_id", F.lit("index").alias("source"))
        )
        batch_hits = (
            nb.withColumnRenamed("doc_id", "new_id")
            .join(
                nb.select(
                    F.col("doc_id").alias("old_id"), "band", "band_key"
                ),
                ["band", "band_key"],
            )
            .where(F.col("old_id") < F.col("new_id"))
            .select("new_id", "old_id", F.lit("batch").alias("source"))
        )
        cand = idx_hits.unionByName(batch_hits).distinct().cache()
        # signature-estimated jaccard = matching slots / N_HASHES.
        # Prune the (corpus-sized) persisted signature table to the
        # collided old ids BEFORE the estimate join — the broadcast
        # semi-join keeps the big side as one filtered scan, so the
        # estimate stage touches O(collisions) rows, not O(corpus).
        old_ids = cand.select(F.col("old_id").alias("doc_id")).distinct()
        old_sig = (
            self.signatures()
            .join(broadcast(old_ids), "doc_id", "left_semi")
            .unionByName(new_sig.join(broadcast(old_ids), "doc_id", "left_semi"))
            .select(
                F.col("doc_id").alias("old_id"),
                *[F.col(c).alias(f"o_{c}") for c in _SIG_COLS],
            )
        )
        probe = cand.join(broadcast(new_sig.withColumnRenamed("doc_id", "new_id")), "new_id").join(
            old_sig, "old_id"
        )
        match_frac = sum(
            (F.col(c) == F.col(f"o_{c}")).cast("int") for c in _SIG_COLS
        ).cast("double") / F.lit(float(N_HASHES))
        est = probe.select(
            "new_id", "old_id", "source", match_frac.alias("est_jaccard")
        ).where(F.col("est_jaccard") >= threshold)
        if verify_docs is not None:
            est = self._verify_exact(est, new_docs, verify_docs, threshold)
        best = est.groupBy(F.col("new_id").alias("doc_id")).agg(
            F.min_by(
                F.struct(F.col("old_id"), F.col("est_jaccard"), F.col("source")),
                F.col("old_id"),
            ).alias("m")
        )
        return best.select(
            "doc_id",
            F.col("m.old_id").alias("duplicate_of"),
            F.col("m.est_jaccard").alias("est_jaccard"),
            F.col("m.source").alias("source"),
        ).orderBy("doc_id")

    def _verify_exact(
        self, est: DataFrame, new_docs: DataFrame, verify_docs: DataFrame, threshold: float
    ) -> DataFrame:
        """Upgrade signature-estimated matches to exact shingle
        Jaccard; shingles are generated for the collided docs only."""
        old_ids = est.select(F.col("old_id").alias("doc_id")).distinct()
        new_ids = est.select(F.col("new_id").alias("doc_id")).distinct()
        pool = verify_docs.unionByName(new_docs).dropDuplicates(["doc_id"])
        sh = word_shingles(pool.join(broadcast(old_ids.unionByName(new_ids).distinct()), "doc_id", "left_semi"))
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        inter = (
            est.select("new_id", "old_id", "source")
            .join(sh.select(F.col("doc_id").alias("new_id"), "shingle"), "new_id")
            .join(sh.select(F.col("doc_id").alias("old_id"), "shingle"), ["old_id", "shingle"])
            .groupBy("new_id", "old_id", "source")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.join(sizes.select(F.col("doc_id").alias("new_id"), F.col("n").alias("n1")), "new_id")
            .join(sizes.select(F.col("doc_id").alias("old_id"), F.col("n").alias("n2")), "old_id")
            .withColumn(
                "est_jaccard",
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
            )
            .where(F.col("est_jaccard") >= threshold)
            .select("new_id", "old_id", "source", "est_jaccard")
        )
