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


# --- oracle-gated incremental probe (driver gate row) --------------------

_SPLIT_ID = 250  # corpus = doc_id < 250, incoming batch = doc_id >= 250


def dedup_incremental_batch(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Oracle-gated INCREMENTAL dedup: treat docs with doc_id <
    _SPLIT_ID as the accumulated corpus and the rest as today's
    incoming batch, and compute each new doc's dedup decision
    (smallest matching prior doc at signature-estimated Jaccard ≥
    threshold) with the INDEX plan shape — batch band keys equi-join
    corpus band keys, batch-internal self-join, signature-estimate
    on collided pairs only.  The corpus side is computed in-plan here
    (so DuckDB can mirror it); :class:`MinHashIndex` serves the same
    join from its persisted tables.

    Determinism: est_jaccard = matching slots / 16 is an exact
    dyadic double; ``source`` is a pure function of old_id; the best
    match per new doc is the smallest old_id."""
    from .dedup import _docs

    docs = _docs(spark, sf_dir)
    sig = _minhash_signature(docs).cache()
    sig.count()
    bands = band_keys(sig)
    new_b = bands.where(F.col("doc_id") >= _SPLIT_ID).withColumnRenamed("doc_id", "new_id")
    old_b = bands.where(F.col("doc_id") < _SPLIT_ID).withColumnRenamed("doc_id", "old_id")
    idx_hits = new_b.join(old_b, ["band", "band_key"]).select("new_id", "old_id")
    batch_hits = (
        new_b.join(
            new_b.select(F.col("new_id").alias("old_id"), "band", "band_key"),
            ["band", "band_key"],
        )
        .where(F.col("old_id") < F.col("new_id"))
        .select("new_id", "old_id")
    )
    cand = idx_hits.unionByName(batch_hits).distinct()
    s_new = sig.select(F.col("doc_id").alias("new_id"), *_SIG_COLS)
    s_old = sig.select(
        F.col("doc_id").alias("old_id"), *[F.col(c).alias(f"o_{c}") for c in _SIG_COLS]
    )
    probe = cand.join(s_new, "new_id").join(s_old, "old_id")
    match_frac = sum(
        (F.col(c) == F.col(f"o_{c}")).cast("int") for c in _SIG_COLS
    ).cast("double") / F.lit(float(N_HASHES))
    est = probe.select("new_id", "old_id", match_frac.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )
    best = est.groupBy(F.col("new_id").alias("doc_id")).agg(
        F.min_by(F.struct("old_id", "est_jaccard"), F.col("old_id")).alias("m")
    )
    return best.select(
        "doc_id",
        F.col("m.old_id").alias("duplicate_of"),
        F.col("m.est_jaccard").alias("est_jaccard"),
        F.when(F.col("m.old_id") < _SPLIT_ID, "index").otherwise("batch").alias("source"),
    ).orderBy("doc_id")


def _incremental_oracle() -> str:
    from .dedup import _HEX

    mins = ",\n         ".join(
        f"MIN(CASE WHEN substr(h, 1, 1) = '{_HEX[i]}' THEN h END) AS r{i}"
        for i in range(N_HASHES)
    )
    dense = ", ".join(
        "COALESCE({}) AS mh{}".format(
            ", ".join(f"r{(i + k) % N_HASHES}" for k in range(N_HASHES)), i
        )
        for i in range(N_HASHES)
    )
    bands_union = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS band_key FROM sig".format(
            b=b,
            concat=" || '|' || ".join(
                f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)
            ),
        )
        for b in range(N_HASHES // BAND_SIZE)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
    )
    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM docs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
sig_raw AS (
  SELECT doc_id,
         {mins}
  FROM (SELECT doc_id, md5(shingle) AS h FROM sh) GROUP BY doc_id
),
sig AS (SELECT doc_id, {dense} FROM sig_raw),
bands AS (
  {bands_union}
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o
    ON n.band = o.band AND n.band_key = o.band_key
  WHERE n.doc_id >= {_SPLIT_ID}
    AND (o.doc_id < {_SPLIT_ID} OR (o.doc_id >= {_SPLIT_ID} AND o.doc_id < n.doc_id))
),
est AS (
  SELECT new_id, old_id,
         CAST(({match_sum}) AS DOUBLE) / {float(N_HASHES)} AS est_jaccard
  FROM cand JOIN sig a ON a.doc_id = new_id JOIN sig b ON b.doc_id = old_id
),
best AS (
  SELECT new_id AS doc_id, old_id, est_jaccard,
         row_number() OVER (PARTITION BY new_id ORDER BY old_id ASC) AS rn
  FROM est WHERE est_jaccard >= 0.5
)
SELECT doc_id, old_id AS duplicate_of, est_jaccard,
       CASE WHEN old_id < {_SPLIT_ID} THEN 'index' ELSE 'batch' END AS source
FROM best WHERE rn = 1
ORDER BY doc_id
"""


DEDUP_INCREMENTAL_ORACLE = _incremental_oracle()


QUERIES = {
    "dedup_incremental_batch": dedup_incremental_batch,
}

ORACLES = {
    "dedup_incremental_batch": DEDUP_INCREMENTAL_ORACLE,
}
